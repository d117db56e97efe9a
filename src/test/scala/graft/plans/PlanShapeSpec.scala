package graft.plans

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkSpec
import graft.SparkEntry

/** Pins the PLANS.md claims: the shapes that make these plans right at
  * 100 TB are asserted here, not just documented — a regression that
  * turns a broadcast into a shuffle or un-pushes a filter fails CI.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.explainString(FormattedMode)
  }

  test("q1_agg prunes the lineitem scan to the touched columns") {
    val p = planOf("q1_agg")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"),
      s"aggregation should not read join keys it never touches: $read")
  }

  test("q2_join_agg broadcasts every dimension join") {
    val p = planOf("q2_join_agg")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected >=3 broadcast dim joins, got $bhj")
    assert(!p.contains("SortMergeJoin"),
      "dim joins must not degrade to sort-merge")
  }

  test("q19_where_range pushes the chunk range into the parquet scan") {
    val p = planOf("q19_where_range")
    assert(p.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_orderkey".r.findFirstIn(p).isDefined,
      s"chunk range must reach the scan:\n${p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")}")
  }

  test("q113_interval_join is an equi-join, never a nested-loop on the inequality") {
    val p = planOf("q113_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join must bucketize to an equi-join")
  }

  test("q124_pq_adc scores without any exchange before the top-k") {
    val p = planOf("q124_pq_adc")
    assert(!p.contains("Exchange"), s"PQ/ADC must be a pure projection + TakeOrdered:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q106_native_topk runs the two-phase native operator") {
    val p = planOf("q106_native_topk")
    assert("TopKPerGroup \\(".r.findAllIn(p).size >= 2,
      "partial + final TopKPerGroup phases expected")
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ProgressCountersSpec extends SparkSpec {

  test("listener counters track rows read and tasks across a job") {
    val pc = ProgressCounters.attach(spark)
    try {
      val n = Tables(spark, sfDir).lineitem
        .groupBy("l_returnflag").agg(count(lit(1))).count()
      assert(n > 0)
      org.apache.spark.graftshims.ListenerShim.waitUntilEmpty(spark.sparkContext, 30000)
      val s = pc.snapshot()
      assert(s.rowsRead >= 6000, s"expected ≥6000 input rows, got ${s.rowsRead}")
      assert(s.tasks > 0)
    } finally ProgressCounters.detach(spark, pc)
  }
}

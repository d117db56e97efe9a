package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned-layout scale contracts: a partition-column predicate must
  * become PartitionFilters on the scan (zero IO for pruned partitions),
  * and a join against a filtered dim must inject dynamic partition
  * pruning into the fact scan.
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val partDir = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_part_orders"
    Migrate.writePartitioned(
      spark.read.parquet(s"$sfDir/orders.parquet"), dir, Seq("o_orderpriority"))
    dir
  }

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    df.collect() // execute so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec => f }
  }

  test("static partition predicate reaches the scan as PartitionFilters") {
    val q = spark.read.parquet(partDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val scan = scans(q).head
    assert(scan.partitionFilters.nonEmpty,
      s"expected PartitionFilters, got: ${scan.partitionFilters}")
    // pruned scan must read strictly fewer files than the full layout
    val all = scans(spark.read.parquet(partDir).select("o_orderkey")).head
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).map(_.files.size).sum <
      all.relation.location.listFiles(Nil, Nil).map(_.files.size).sum)
  }

  test("join against a filtered dim triggers dynamic partition pruning") {
    val dimDir = s"${System.getProperty("java.io.tmpdir")}/graft_part_dim"
    spark.range(0, 5).select(
        concat(col("id") + 1, lit("-X")).as("prio_key"),
        when(col("id") === 0, "1-URGENT").otherwise(concat(col("id") + 1, lit("-OTHER"))).as("prio"))
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(partDir)
    val dim = spark.read.parquet(dimDir).where(col("prio_key") === "1-X")
    val q = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .groupBy("o_orderpriority").count()
    q.collect()
    // AQE wraps stages in leaf QueryStageExec nodes, so assert on the
    // final formatted plan: the fact scan's PartitionFilters must carry a
    // dynamicpruning subquery fed by the dim's broadcast.
    val planStr = q.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode).toLowerCase
    assert(planStr.contains("dynamicpruning"),
      s"expected dynamic partition pruning in plan:\n$planStr")
  }
}

package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The production label-store rewrite is partition-PRUNED: with labels
  * persisted partitioned by pmod(component, P), an ingest's meta
  * relabeling touches only the partitions holding an affected component
  * — every other partition's files are never opened, and the final
  * store equals the full incrementalComponents output. This spec turns
  * the PLANS.md claim into a proof.
  */
class LabelRewriteSpec extends SparkSpec {

  private val nParts = 16

  test("label rewrite reads only affected partitions and reproduces the full merge") {
    val s = spark
    import s.implicits._
    // 1000 docs in 100 ten-member components, component = min member id
    val labels = spark.range(1000).select(col("id").as("doc_id"),
      (expr("id div 10") * 10).as("component"))
    val dir = java.nio.file.Files.createTempDirectory("label_store").toString
    labels.withColumn("lblpart", pmod(col("component"), lit(nParts.toLong)))
      .write.mode("overwrite").partitionBy("lblpart").parquet(dir)
    val disk = spark.read.parquet(dir)
    val diskLabels = disk.select("doc_id", "component")

    // shard edges: merge components 30 and 50, attach new vertex 5000 to
    // component 70, and a brand-new pair (6000, 6001)
    val newPairs = Seq((35L, 55L), (75L, 5000L), (6000L, 6001L)).toDF("d1", "d2")
    val (meta, newLabels) = Dedup.labelDelta(diskLabels, newPairs)

    // the pruned rewrite…
    val pruned = Dedup.prunedLabelRewrite(disk, meta, nParts)

    // …must reach the store as PartitionFilters: strictly fewer files
    // read than the layout holds, and specifically NOT the partitions of
    // untouched components (e.g. pmod 4 / 10 / 12)
    // static isin filter ⇒ assert on the pre-adaptive plan (AQE wraps
    // the joined stages in leaf QueryStageExec nodes that hide the scan)
    val scan = pruned.queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("label_store")))
      .getOrElse(fail("no label-store scan in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"expected PartitionFilters on the label scan: ${scan.partitionFilters}")
    val readFiles = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).flatMap(_.files)
      .map(_.getPath.toString).toSet
    val allFiles = scan.relation.location.listFiles(Nil, Nil).flatMap(_.files)
      .map(_.getPath.toString).toSet
    assert(readFiles.size < allFiles.size,
      s"pruned scan must read fewer files: ${readFiles.size} vs ${allFiles.size}")
    Seq(4, 10, 12).foreach { p =>
      assert(!readFiles.exists(_.contains(s"lblpart=$p")),
        s"untouched partition lblpart=$p must not be read")
    }

    // the expected full (unpruned) merge — computed BEFORE mutating the
    // store (its plan reads the pre-overwrite file listing)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = m(Dedup.incrementalComponents(diskLabels, newPairs))

    // apply the rewrite the production way: dynamic partition overwrite
    // for affected partitions, partition-local APPEND for new vertices
    // (both inputs materialized first — a store rewrite never streams
    // from the files it is replacing)
    val prunedMat = pruned.localCheckpoint(true)
    val newMat = newLabels
      .withColumn("lblpart", pmod(col("component"), lit(nParts.toLong)))
      .localCheckpoint(true)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      prunedMat.write.mode("overwrite").partitionBy("lblpart").parquet(dir)
      newMat.write.mode("append").partitionBy("lblpart").parquet(dir)
    } finally prevMode match {
      case Some(mode) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // the store now equals the full merge
    val store = m(spark.read.parquet(dir).select("doc_id", "component"))
    assert(store == full,
      s"store-only=${(store.toSet -- full.toSet).take(5)} full-only=${(full.toSet -- store.toSet).take(5)}")
    // and the merge itself did what the edges said
    assert(store(55L) == 30L && store(50L) == 30L && store(35L) == 30L)
    assert(store(5000L) == 70L && store(6001L) == 6000L)
    assert(store(40L) == 40L, "untouched components keep their labels")
    assert(store.size == 1003)
  }
}

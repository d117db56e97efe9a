package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Graft, Tables}

/** The production shape of incremental admission: the corpus's locality
  * index (LSH band buckets) PERSISTED once, bucket-partition-friendly,
  * and a new shard probing the on-disk relation — no corpus text is
  * re-read, no index×index pair forms, and the candidate set is
  * IDENTICAL to the in-memory path (q601's construction).
  */
class MaterializedIndexSpec extends SparkSpec {

  test("shard probe over the persisted band index equals the in-memory path") {
    Graft.configure(spark)
    val base = Tables(spark, sfDir).documents.select("doc_id", "text")
    val index = base
    val shard = base.where(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        expr("substring(text, 21)").as("text"))

    // materialize the index ONCE: bands to parquet, partitioned by band
    // (at scale: bucketed/partitioned by (band, bucket range) so the
    // probe is a co-located join and reads only matched partitions)
    val dir = java.nio.file.Files.createTempDirectory("band_index").toString
    Dedup.lshBands(Dedup.minhashSignatures(index, "doc_id", "text"))
      .write.mode("overwrite").partitionBy("band").parquet(dir)
    val onDisk = spark.read.parquet(dir)

    // probe the on-disk index through the public API — only the shard's
    // signatures compute fresh
    val viaDisk = Dedup.incrementalCandidatesIndexed(onDisk,
        Dedup.minhashSignatures(shard, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val inMemory = Dedup.incrementalCandidates(
        Dedup.minhashSignatures(index, "doc_id", "text"),
        Dedup.minhashSignatures(shard, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(viaDisk == inMemory,
      s"disk-only=${(viaDisk -- inMemory).take(5)} mem-only=${(inMemory -- viaDisk).take(5)}")
    assert(viaDisk.nonEmpty)
    // and the probe plan never scans the corpus text: the on-disk side's
    // schema is (doc_id, bucket, band) only
    assert(onDisk.columns.toSet == Set("doc_id", "bucket", "band"))
  }
}

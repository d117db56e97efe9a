package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Graft

/** The production shape of incremental MEDIA admission: the perceptual
  * hash relation (id + 16-bit lanes — the index IS the row) persisted
  * once, shards probing the on-disk relation through
  * [[Dedup.bandedHammingIncremental]], and maintenance as a plain row
  * append (per-document relation ⇒ append ≡ rebuild by construction —
  * this spec still proves it through a real parquet round-trip, like
  * MaterializedIndexSpec does for the LSH band decomposition).
  */
class MaterializedHashIndexSpec extends SparkSpec {

  private val laneCols = Seq("d0", "d1", "d2", "d3")

  /** Synthetic hash relation: ids `lo..hi`; ids ≡ 0 mod 7 clone one
    * planted hash (cross-shard near-dup class), the rest md5-random.
    */
  private def hashes(lo: Long, hi: Long) = {
    val lanes = (0 until 4).map(l =>
      when(col("id") % 7 === 0, lit(l + 1L)).otherwise(
        expr(s"conv(substring(md5(concat(id, '_h$l')), 1, 4), 16, 10)")
          .cast("long")).as(s"d$l"))
    spark.range(lo, hi + 1).select(col("id").as("doc_id") +: lanes: _*)
  }

  test("shard probe over the persisted hash relation equals the in-memory path; append == rebuild") {
    Graft.configure(spark)
    val index = hashes(1, 300)
    val shard1 = hashes(1001, 1100)
    val shard2 = hashes(2001, 2100)

    val dir = java.nio.file.Files.createTempDirectory("hash_index").toString
    index.write.mode("overwrite").parquet(dir)
    def files(): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
    }
    val before = files()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // probe the on-disk relation — identical to the in-memory path
    val viaDisk = pairs(Dedup.bandedHammingIncremental(
      spark.read.parquet(dir), shard1, "doc_id", laneCols, 3, Some(8)))
    val inMem = pairs(Dedup.bandedHammingIncremental(
      index, shard1, "doc_id", laneCols, 3, Some(8)))
    assert(viaDisk == inMem && viaDisk.nonEmpty,
      s"disk-only=${(viaDisk -- inMem).take(5)} mem-only=${(inMem -- viaDisk).take(5)}")

    // MAINTENANCE: shard1 admitted — its hash rows append in place
    shard1.write.mode("append").parquet(dir)
    assert(before.subsetOf(files()),
      "a row append must leave every existing index file in place")

    // shard2 probes the MAINTAINED on-disk relation == a from-scratch
    // rebuild over index ∪ shard1
    val maintained = pairs(Dedup.bandedHammingIncremental(
      spark.read.parquet(dir), shard2, "doc_id", laneCols, 3, Some(8)))
    val rebuilt = pairs(Dedup.bandedHammingIncremental(
      index.unionAll(shard1), shard2, "doc_id", laneCols, 3, Some(8)))
    assert(maintained == rebuilt && maintained.nonEmpty,
      s"maintained-only=${(maintained -- rebuilt).take(5)} rebuilt-only=${(rebuilt -- maintained).take(5)}")
  }
}

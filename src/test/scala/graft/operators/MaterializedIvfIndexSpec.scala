package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Graft, Tables}

/** The production shape of incremental VECTOR admission — the twin of
  * MaterializedIndexSpec (LSH bands): the corpus's IVF index — the
  * (vec_id, cell) relation plus the tiny centroid metadata — PERSISTED
  * once, cell-partitioned, and a new shard probing the on-disk relations
  * returns the IDENTICAL candidate set to the in-memory path (q602's
  * construction), with no index embedding ever read.
  */
class MaterializedIvfIndexSpec extends SparkSpec {

  test("shard probe over the persisted IVF index equals the in-memory path") {
    Graft.configure(spark)
    val emb = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    val shard = emb.where(col("vec_id") % 17 === 3)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))

    // materialize the index ONCE: (vec_id, cell) partitioned by cell +
    // the centroid metadata (C rows) — at scale the probe is then a
    // partition-pruned co-located join; corpus embeddings never re-read
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    val cents = Similarity.ivfCentroids(emb, 25)
    Similarity.ivfIndex(emb, cents, 2)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/asg")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    val onDisk = spark.read.parquet(s"$dir/asg")
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
    val diskCents = spark.read.parquet(s"$dir/cents")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val viaDisk = pairs(Similarity.ivfIncrementalPairsIndexed(
      onDisk, diskCents, shard, 2))
    val inMemory = pairs(Similarity.ivfIncrementalPairs(emb, shard, 25, 2))
    assert(viaDisk == inMemory,
      s"disk-only=${(viaDisk -- inMemory).take(5)} mem-only=${(inMemory -- viaDisk).take(5)}")
    assert(viaDisk.nonEmpty)

    // the index side carries NO embedding column — the probe reads only
    // (vec_id, cell); embeddings enter solely through the shard
    assert(onDisk.columns.toSet == Set("vec_id", "cell"))

    // the capped path holds from disk too (cell stats aggregate over the
    // persisted relation — index metadata, not an embedding scan)
    val cappedDisk = pairs(Similarity.ivfIncrementalPairsIndexed(
      onDisk, diskCents, shard, 2, maxCell = Some(40)))
    val cappedMem = pairs(Similarity.ivfIncrementalPairs(emb, shard, 25, 2,
      maxCell = Some(40)))
    assert(cappedDisk == cappedMem)
    assert(cappedDisk != viaDisk,
      "cap 40 must engage on this fixture (cells up to ~60 members)")
  }

  test("appended IVF index == from-scratch rebuild under frozen centroids") {
    Graft.configure(spark)
    val emb = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    val shard1 = emb.where(col("vec_id") % 17 === 3)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val shard2 = emb.where(col("vec_id") % 37 === 0 && col("vec_id") % 25 =!= 0)
      .select((col("vec_id") + 200000).as("vec_id"), col("embedding"))

    val dir = java.nio.file.Files.createTempDirectory("ivf_index_app").toString
    val cents = Similarity.ivfCentroids(emb, 25)
    Similarity.ivfIndex(emb, cents, 2)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/asg")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    def files(): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/asg")).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
    }
    val before = files()
    val diskCents = spark.read.parquet(s"$dir/cents")

    // MAINTENANCE: shard1 admitted → its (vec_id, cell) rows APPEND in
    // place against the FROZEN centroid metadata; nothing is rewritten
    Similarity.ivfIndex(shard1, diskCents, 2)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/asg")
    assert(before.subsetOf(files()),
      "a cell-partition-local append must leave every existing index file in place")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val maintainedDisk = spark.read.parquet(s"$dir/asg")
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
    val maintained = pairs(Similarity.ivfIncrementalPairsIndexed(
      maintainedDisk, diskCents, shard2, 2))
    // rebuild = assign index ∪ shard1 from scratch against the SAME
    // frozen centroids (the maintenance contract: centroids never move)
    val rebuilt = pairs(Similarity.ivfIncrementalPairsIndexed(
      Similarity.ivfIndex(emb.unionAll(shard1), cents, 2), cents, shard2, 2))
    assert(maintained == rebuilt,
      s"maint-only=${(maintained -- rebuilt).take(5)} rebuild-only=${(rebuilt -- maintained).take(5)}")
    assert(maintained.nonEmpty)

    // the relation-form helper matches the disk path, capped arm included
    val viaHelper = pairs(Similarity.ivfIncrementalPairsIndexed(
      Similarity.ivfIndexAppend(Similarity.ivfIndex(emb, cents, 2), cents, shard1, 2),
      cents, shard2, 2, maxCell = Some(40)))
    val rebuiltCapped = pairs(Similarity.ivfIncrementalPairsIndexed(
      Similarity.ivfIndex(emb.unionAll(shard1), cents, 2), cents, shard2, 2,
      maxCell = Some(40)))
    assert(viaHelper == rebuiltCapped)
  }
}

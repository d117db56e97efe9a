package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Graft, Tables}

/** The SemDeDup family's hot-cell valve: with maxCell set, an oversized
  * cell verifies members against its bounded smallest-id PREFIX instead
  * of all smaller-id cell-mates — cap·|cell| work, never |cell|² —
  * while every cell at or under the cap keeps the exact removal rule,
  * and the incremental arm stays the full arm's restriction.
  */
class SemDedupCapSpec extends SparkSpec {

  private def oneHot(ids: Seq[(Long, Int)]) = {
    val s = spark
    import s.implicits._
    ids.map { case (id, k) =>
      (id, Array.tabulate(64)(i => if (i == k) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
  }

  test("cells at or under the cap keep the exact removal decision") {
    Graft.configure(spark)
    val emb = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // natural cells on this fixture are far under 10_000 members
    val capped = m(Similarity.semDedup(emb, 25, 990000L, maxCell = Some(10000)))
    val exact = m(Similarity.semDedup(emb, 25, 990000L))
    assert(capped == exact)
  }

  test("an oversized cell verifies against the bounded prefix only — and never over-prunes") {
    // one centroid (vec 0), six one-hot vectors in one cell; the only
    // similar pair is (3, 4). Exact removes 4; cap=3 bounds the prefix
    // to {0,1,2}, so 4 SURVIVES — under-removal in an oversized mixed
    // cell is the cap's documented trade, over-removal is impossible.
    val emb = oneHot(Seq(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 3, 5L -> 4))
    def removedSet(cap: Option[Int]) =
      Similarity.semDedup(emb, 100, 990000L, cap)
        .where(col("removed")).collect().map(_.getLong(0)).toSet
    val exact = removedSet(None)
    val capped = removedSet(Some(3))
    assert(exact == Set(4L))
    assert(capped == Set.empty[Long])
    assert(capped.subsetOf(exact))
    // a cap that admits the keeper (prefix {0,1,2,3}) removes 4 again
    assert(removedSet(Some(4)) == Set(4L))
  }

  test("degenerate clone cell: every clone still removed at cap·|cell| cost") {
    Graft.configure(spark)
    val e = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    // 60 clones of vector 0 (ids ≡ 1 mod 25 — never centroids) crowd
    // vec 0's cell far past cap 40; the prefix holds the natural
    // members (all ids below every clone), so each clone matches its
    // source and is removed — the cap costs linear work exactly where
    // the data is most degenerate
    val clones = spark.range(60)
      .crossJoin(broadcast(e.where(col("vec_id") === 0)
        .select(col("embedding").as("cemb0"))))
      .select((lit(200001L) + col("id") * 25).as("vec_id"),
        col("cemb0").as("embedding"))
    val capped = Similarity.semDedup(e.unionAll(clones), 25, 990000L,
      maxCell = Some(40))
    val cloneRows = capped.where(col("vec_id") >= 200001L)
    assert(cloneRows.count() == 60L)
    assert(cloneRows.where(!col("removed")).count() == 0L,
      "every clone has its source (or an earlier clone) in the prefix")
    // capped removals ⊆ exact removals on the whole corpus
    val exact = Similarity.semDedup(e.unionAll(clones), 25, 990000L)
    val over = capped.where(col("removed")).select("vec_id")
      .exceptAll(exact.where(col("removed")).select("vec_id")).count()
    assert(over == 0L, "the cap must never remove what exact keeps")
  }

  test("near-dup pair cap: oversized bucket pairs only through its hub — verified subset, exact under cap") {
    // 20 identical one-hot vectors share one LSH bucket; 3 distinct
    // vectors land elsewhere (and at cosine 0 never pair anyway)
    val emb = oneHot((1L to 20L).map(id => (id, 5)) ++
      Seq(100L -> 7, 101L -> 9, 102L -> 11))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.nearDupPairs(emb, 999000L))
    val capped = pairs(Similarity.nearDupPairs(emb, 999000L, maxBucket = Some(5)))
    assert(exact.size == 190, s"C(20,2) exact pairs, got ${exact.size}")
    assert(capped.size == 19, s"hub-anchored pairs only, got ${capped.size}")
    assert((2L to 20L).forall(m => capped((1L, m))))
    assert(capped.subsetOf(exact))
    // a cap the bucket fits under reproduces exact verbatim
    assert(pairs(Similarity.nearDupPairs(emb, 999000L, maxBucket = Some(20))) == exact)
  }

  test("capped incremental == capped full semDedup restricted to shard ids") {
    Graft.configure(spark)
    val e = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    // shard: clones of every 37th vector (+100000) plus 30 clones of
    // vec 0 (+200000, ids ≡ 1 mod 25) — the latter push vec 0's cell
    // past the cap ACROSS the index/shard boundary
    val shard = e.where(col("vec_id") % 37 === 0 && col("vec_id") % 25 =!= 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      .unionAll(spark.range(30)
        .crossJoin(broadcast(e.where(col("vec_id") === 0)
          .select(col("embedding").as("cemb0"))))
        .select((lit(200001L) + col("id") * 25).as("vec_id"),
          col("cemb0").as("embedding")))
      .localCheckpoint()
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val cap = Some(20)
    val inc = m(Similarity.semDedupIncremental(e, shard, 25, 990000L, cap))
    val full = m(Similarity.semDedup(e.unionAll(shard), 25, 990000L, cap)
      .where(col("vec_id") >= 100000))
    assert(inc == full,
      s"inc-only=${(inc.toSet -- full.toSet).take(3)} full-only=${(full.toSet -- inc.toSet).take(3)}")
    assert(inc.nonEmpty)

    // the r10 shared-index arm (q610 scores the corpus once and feeds the
    // decision AND the append): pre-materialized (vec_id, cell) + centroid
    // metadata must reproduce the internal-assignment path verbatim
    val cents = Similarity.ivfCentroids(e, 25)
    val idxMap = Similarity.ivfIndex(e, cents, 1)
    val viaIndex = m(Similarity.semDedupIncrementalIndexed(
      idxMap, cents, e, shard, 990000L, cap))
    assert(viaIndex == inc)
    val viaIndexUncapped = m(Similarity.semDedupIncrementalIndexed(
      idxMap, cents, e, shard, 990000L, None))
    assert(viaIndexUncapped == m(Similarity.semDedupIncremental(e, shard, 25, 990000L, None)))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The LSH hot-bucket safety valve: with maxBucket set, an oversized
  * (degenerate) bucket emits linear hub-star edges instead of B²/2
  * pairs, while downstream connected-components clustering still
  * recovers the identical grouping.
  */
class LshBucketCapSpec extends SparkSpec {

  // 40 identical docs (one degenerate bucket per band) + 3 isolated docs
  private def sigs = {
    val s = spark
    import s.implicits._
    val dup  = (1L to 40L).map(id => (id, 7, 7, 7, 7, 7, 7, 7, 7))
    val solo = Seq((100L, 1, 2, 3, 4, 5, 6, 7, 8), (200L, 9, 10, 11, 12, 13, 14, 15, 16),
      (300L, 17, 18, 19, 20, 21, 22, 23, 24))
    (dup ++ solo).toDF("doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7")
  }

  test("cap turns a degenerate bucket's pairs linear and keeps clusters identical") {
    val uncapped = Dedup.minhashCandidates(sigs).cache()
    val capped   = Dedup.minhashCandidates(sigs, maxBucket = Some(10)).cache()
    // 40 identical docs: all-pairs = C(40,2) = 780; star = 39
    assert(uncapped.count() == 780L)
    assert(capped.count() == 39L)
    // star edges are a subset of the true pair set
    assert(capped.exceptAll(uncapped).count() == 0L)
    // connectivity preserved: both candidate sets cluster identically
    def comp(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(capped) == comp(uncapped))
    assert((1L to 40L).forall(comp(capped)(_) == 1L))
    uncapped.unpersist(); capped.unpersist()
  }

  test("buckets at or under the cap keep exact all-pairs semantics") {
    val none = Dedup.minhashCandidates(sigs, maxBucket = Some(40))
    val all  = Dedup.minhashCandidates(sigs)
    assert(none.exceptAll(all).count() == 0L && all.exceptAll(none).count() == 0L)
  }
}

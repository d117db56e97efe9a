package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral evidence that kmeansAssignments is real Lloyd k-means:
  * on a linearly separable corpus it recovers the ground-truth clusters
  * and reaches a fixed point (an extra iteration changes nothing).
  */
class KMeansSpec extends SparkSpec {

  /** 30 vectors in 3 well-separated cosine clusters: the dominant axis
    * (dim 1/2/3) is 100× the per-vector jitter. vec_ids 0-9 → A,
    * 10-19 → B, 20-29 → C, so seedEvery=10 seeds one per cluster.
    */
  private def corpus = {
    val s = spark
    import s.implicits._
    (0L until 30L).map { id =>
      val cl = (id / 10).toInt
      val v = Array.fill(8)(0.001f * ((id % 10) + 1))
      v(cl) = 1.0f
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  test("separable clusters are recovered exactly") {
    val got = Similarity.kmeansAssignments(corpus, 10, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = got.groupBy { case (id, _) => id / 10 }
      .map { case (cl, m) => cl -> m.values.toSet }
    clusters.foreach { case (cl, cells) =>
      assert(cells.size == 1, s"cluster $cl split across cells $cells")
    }
    assert(clusters.values.toSet.size == 3, "clusters must land in distinct cells")
  }

  test("two iterations reach the Lloyd fixed point on separable data") {
    val a2 = Similarity.kmeansAssignments(corpus, 10, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a3 = Similarity.kmeansAssignments(corpus, 10, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a2 === a3, "an extra iteration must not move any assignment")
  }

  test("centroid update moves assignments off the raw seeds when seeds are skewed") {
    val s = spark
    import s.implicits._
    // two true clusters but BOTH seeds (ids 0, 5) land in cluster A:
    // ids 0-4 cluster A (dim 1), 5 is an A-outlier seed shifted toward B,
    // 6-9 cluster B (dim 2). After recentering, seed-5's centroid is
    // pulled to the B mass and B members separate from A.
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0f, 0f)), (1L, Array(0.99f, 0.01f, 0f, 0f)),
      (2L, Array(0.98f, 0.02f, 0f, 0f)), (3L, Array(0.97f, 0.01f, 0f, 0f)),
      (4L, Array(0.99f, 0.02f, 0f, 0f)),
      (5L, Array(0.70f, 0.30f, 0f, 0f)), // skewed seed
      (6L, Array(0.01f, 0.99f, 0f, 0f)), (7L, Array(0.02f, 0.98f, 0f, 0f)),
      (8L, Array(0.01f, 1.0f, 0f, 0f)), (9L, Array(0.02f, 0.97f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val asg = Similarity.kmeansAssignments(rows, 5, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aCell = asg(0L)
    assert((1L to 4L).forall(asg(_) == aCell), "cluster A must stay together")
    val bCell = asg(8L)
    assert(bCell != aCell, "cluster B must separate after recentering")
    assert(Seq(6L, 7L, 9L).forall(asg(_) == bCell), "cluster B must stay together")
  }

  test("kmeansAssignments releases its cache (library cache contract)") {
    spark.sharedState.cacheManager.clearCache()
    val asg = Similarity.kmeansAssignments(corpus, 10, 1)
    assert(spark.sharedState.cacheManager.isEmpty,
      "the scaled-embedding cache must not outlive the call")
    assert(asg.count() == 30)
  }
}

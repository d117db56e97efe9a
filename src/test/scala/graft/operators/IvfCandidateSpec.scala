package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Graft, Tables}

/** Witnesses that the IVF candidate stream (q470's default kNN base) is
  * genuinely sub-quadratic and structurally sound: cell-mate pairs only,
  * symmetric, no self-pairs, and far below the brute-force n(n−1) count.
  */
class IvfCandidateSpec extends SparkSpec {

  test("candidate pairs are sub-quadratic, symmetric, self-free") {
    Graft.configure(spark)
    val emb = Tables(spark, sfDir).embeddings
    val n = emb.count()
    val cand = Similarity.ivfCandidatePairs(emb, 25, 2).cache()
    val pairs = cand.count()

    assert(pairs > 0, "cell-mates must exist")
    assert(pairs < n * (n - 1) / 2,
      s"candidates ($pairs) must stay well under brute force (${n * (n - 1)})")

    assert(cand.where(col("qid") === col("cid")).count() == 0)
    // directed-pair symmetry: sharing a cell is mutual
    val asym = cand.as("f").join(
      cand.select(col("qid").as("cid"), col("cid").as("qid")).as("r"),
      Seq("qid", "cid"), "left_anti").count()
    assert(asym == 0, s"$asym pairs missing their mirror")
    cand.unpersist()
  }

  test("the only nested-loop join is corpus x centroids (no brute-force pair scan)") {
    Graft.configure(spark)
    val emb = Tables(spark, sfDir).embeddings
    val cand = Similarity.ivfCandidatePairs(emb, 25, 2)
    cand.collect()
    // string-match the AQE final plan only (plan.collect does not descend
    // into AdaptiveSparkPlanExec's executed sub-tree, and toString also
    // prints the pre-AQE initial plan below it)
    val plan = cand.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    // the centroid-assignment cross join appears once per side of the
    // cell self-join; a brute-force corpus x corpus BNLJ would instead
    // sit ABOVE the scans feeding the distinct — with the cell equi-join
    // asserted below, >2 nested loops means a pair-scan crept back in
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"expected only centroid-assignment cross joins:\n$plan")
    // the pair-generation join must be a hash equi-join on cell
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[cell".r
      .findFirstIn(plan).isDefined,
      s"cell-mate join must be an equi-join on cell:\n$plan")
  }

  test("incremental pairs == full pairs restricted to shard queries (same centroids)") {
    Graft.configure(spark)
    val emb = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    // shard ids avoid the centroid residue (vec_id % 25 == 0), so the
    // union corpus picks the IDENTICAL centroid set as the index alone —
    // the precondition for exact equivalence by restriction
    val shard = emb.where(col("vec_id") % 17 === 3)
      .select((col("vec_id") + 100001).as("vec_id"), col("embedding"))
    val shardNoCent = shard.where(col("vec_id") % 25 =!= 0)
    val shardIds = shardNoCent.select("vec_id").collect().map(_.getLong(0)).toSet
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = pairs(Similarity.ivfIncrementalPairs(emb, shardNoCent, 25, 2))
    val full = pairs(Similarity.ivfCandidatePairs(emb.unionAll(shardNoCent), 25, 2))
      .filter { case (q, _) => shardIds(q) }
    assert(inc == full,
      s"inc-only=${(inc -- full).take(5)} full-only=${(full -- inc).take(5)}")
    // no index-vs-index pair: every qid is a shard vector
    assert(inc.forall { case (q, _) => shardIds(q) })
  }
}

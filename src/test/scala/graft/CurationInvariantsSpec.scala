package graft

import org.apache.spark.sql.functions._

/** Cross-column invariants of the round-4 curation queries — properties the
  * DuckDB differential gate can't express because they relate columns WITHIN
  * one result (inclusion-exclusion, flow conservation, locality dominance).
  */
class CurationInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q271 bitmap algebra obeys inclusion-exclusion") {
    val r = run("q271_bitmap_intersect").head()
    val (both, either, view, purchase) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(either == view + purchase - both)
    assert(both <= math.min(view, purchase))
  }

  test("q286 rebalance flow conserves rows and ends at zero") {
    val rows = run("q286_shard_rebalance").collect()
    assert(rows.map(_.getAs[Long]("surplus")).sum == 0L)
    // prefix flow at the last shard must be exactly zero (nothing leaves)
    assert(rows.maxBy(_.getAs[Long]("shard")).getAs[Long]("flow_right") == 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") - r.getAs[Long]("surplus") == r.getAs[Long]("target"))
    }
  }

  test("q282 Z-order layout touches fewer buckets per 2-D probe") {
    val m = run("q282_zorder_cluster").collect()
      .map(r => r.getAs[String]("layout") -> r.getAs[Long]("touched_buckets")).toMap
    assert(m("a_zorder") < m("b_rowmajor"))
  }

  test("q290 vocab ids are dense, unique, and stable for old words") {
    val rows = run("q290_stable_vocab_ids").collect()
    val ids = rows.map(_.getAs[Long]("id"))
    assert(ids.distinct.length == ids.length)
    assert(ids.sorted.sameElements(1L to ids.length))
    // old words (is_new = 0) occupy the dense prefix: every new id exceeds
    // every old id
    val oldMax = rows.filter(_.getAs[Int]("is_new") == 0).map(_.getAs[Long]("id")).max
    rows.filter(_.getAs[Int]("is_new") == 1)
      .foreach(r => assert(r.getAs[Long]("id") > oldMax))
  }

  test("q274 sample-median estimate stays within the shard-sample bound") {
    run("q274_quantile_merge_audit").collect().foreach { r =>
      // mergeable 1-in-50 sampling cannot drift the median estimate outside
      // the observed value range; exactness is the oracle's job — here we
      // pin that the audit columns agree with their own definition
      assert(r.getAs[Long]("abs_err") ==
        math.abs(r.getAs[Long]("est_p50") - r.getAs[Long]("exact_p50")))
    }
  }

  test("q273 truncation audit conserves token counts") {
    run("q273_token_budget_truncate").collect().foreach { r =>
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("total_tokens"))
      val loss = r.getAs[Long]("total_tokens") - r.getAs[Long]("kept_tokens")
      val expectedPpm = loss * 1000000L / r.getAs[Long]("total_tokens")
      assert(r.getAs[Long]("loss_ppm") == expectedPpm)
    }
  }
}

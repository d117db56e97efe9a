package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Cross-column invariants of the q438–q445 signal/linkage batches —
  * properties within one result that the DuckDB differential gate can't
  * state (monotonicity of the isotonic fit, Shapley efficiency,
  * interval-union bounds, CUSUM non-negativity, SAX census conservation).
  */
class SignalInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q438 neighborhood candidates are bounded by records and gaps non-negative") {
    run("q438_sorted_neighborhood").collect().foreach { r =>
      val n = r.getAs[Long]("n_records")
      assert(r.getAs[Long]("cand_w1") <= math.max(n - 1, 0))
      assert(r.getAs[Long]("cand_w2") <= math.max(n - 2, 0))
      val g = r.getAs[Long]("min_gap")
      assert(g >= 0 || g == -1L) // sorted ascending ⇒ gaps can't be negative
    }
  }

  test("q439 CUSUM stats are non-negative and alarms imply a first alarm day") {
    run("q439_cusum_prefix").collect().foreach { r =>
      assert(r.getAs[Long]("max_cusum") >= 0L) // S_t = P_t − min(0, min P) ≥ 0
      val alarms = r.getAs[Long]("n_alarms")
      val first = r.getAs[Long]("first_alarm_day")
      assert((alarms > 0) == (first >= 0))
    }
  }

  test("q440 interval union is bounded by sum of intervals and island maxima") {
    run("q440_interval_union").collect().foreach { r =>
      val covered = r.getAs[Long]("covered_us")
      val maxI = r.getAs[Long]("max_island_us")
      val n = r.getAs[Long]("n_islands")
      assert(maxI <= covered)           // one island can't exceed the union
      assert(covered <= n * maxI)       // islands are each ≤ the max island
    }
  }

  test("q441 SAX transition census conserves day counts per nation") {
    // transitions per nation = days − 1 (one LAG bigram per non-first day);
    // q439 reports the same (orders ⋈ customer) day grain per nation
    val days = run("q439_cusum_prefix").select(col("nation"), col("n_days"))
    val trans = run("q441_sax_symbols").groupBy("nation")
      .agg(sum("cnt").as("n_trans"))
    val joined = days.join(trans, "nation").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_trans") == r.getAs[Long]("n_days") - 1)
    }
  }

  test("q442 PPS race keys are consistent with the h/w quotient definition") {
    val rows = run("q442_pps_sample").collect()
    assert(rows.length == 50)
    // keys ascend in output order and weights are positive
    val races = rows.map(_.getAs[Long]("race"))
    assert(races.sameElements(races.sorted))
    rows.foreach(r => assert(r.getAs[Long]("cents") > 0))
  }

  test("q443 Haar energies vanish iff the series is constant per block (zero-safe)") {
    run("q443_haar_energy").collect().foreach { r =>
      assert(r.getAs[Long]("e1_cents2") >= 0L)
      assert(r.getAs[Long]("e2_cents2") >= 0L)
      assert(r.getAs[Long]("e3_cents2") >= 0L)
    }
  }

  test("q444 Shapley attribution satisfies efficiency: sum(phi6) == 6 * v(N)") {
    val phis = run("q444_shapley_attribution").collect()
    assert(phis.length == 3)
    val total = phis.map(_.getAs[Long]("phi6_ppm")).sum
    // recompute v(N) = ppm conversion rate of users who touched all 3 channels
    val u = graft.core.Tables(spark, sfDir).events
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("hc"),
        max(when(col("event_type") === "view", 1).otherwise(0)).as("hv"),
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("hs"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .where(col("hc") === 1 && col("hv") === 1 && col("hs") === 1)
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .selectExpr("CAST(1000000 * c div n AS BIGINT) AS vp").collect()
    val v7 = if (u.isEmpty || u(0).isNullAt(0)) 0L else u(0).getAs[Long]("vp")
    assert(total == 6L * v7)
  }

  test("q446 NDCG is a valid normalized gain: 0 <= dcg <= idcg, ndcg in [0, 1e6]") {
    val rows = run("q446_ndcg").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, i, n) = (r.getAs[Long]("dcg_milli"), r.getAs[Long]("idcg_milli"),
        r.getAs[Long]("ndcg_ppm"))
      assert(d >= 0 && d <= i)
      assert(n >= 0 && n <= 1000000L)
    }
  }

  test("q447 randomized response conserves reports and debiases closely") {
    val rows = run("q447_randomized_response").collect()
    assert(rows.length == 5)
    val n = rows.map(_.getAs[Long]("true_n")).sum
    assert(rows.map(_.getAs[Long]("obs")).sum == n) // every event reports exactly once
    // debiased estimates reconstruct the totals up to truncation slack
    val estSum = rows.map(_.getAs[Long]("est_n")).sum
    assert(math.abs(estSum - n) <= 5)
  }

  test("q448 mutual-kNN census is consistent and intra share is a valid ppm") {
    run("q448_mutual_knn").collect().foreach { r =>
      val intra = r.getAs[Long]("intra_edges")
      val cross = r.getAs[Long]("cross_edges")
      val ppm = r.getAs[Long]("intra_ppm")
      assert(intra >= 0 && cross >= 0)
      assert(ppm >= 0 && ppm <= 1000000L)
      // each vec has <= 10 neighbors, so mutual edges charged to a label
      // can't exceed n_vecs * 10
      assert(intra + cross <= r.getAs[Long]("n_vecs") * 10)
    }
  }

  test("q449 Huffman code satisfies Kraft equality and is monotone in frequency") {
    val rows = run("q449_huffman").collect()
    assert(rows.length == 9)
    // complete binary code over 9 leaves: sum 2^(8-len) == 2^8
    assert(rows.map(r => 1L << (8 - r.getAs[Long]("code_len")).toInt).sum == 256L)
    // a strictly more frequent symbol never gets a longer code
    for (a <- rows; b <- rows
         if a.getAs[Long]("freq") > b.getAs[Long]("freq"))
      assert(a.getAs[Long]("code_len") <= b.getAs[Long]("code_len"))
  }

  test("q450 label spread covers every non-seed exactly once with valid labels") {
    val rows = run("q450_label_spread").collect()
    val nonSeeds = graft.core.Tables(spark, sfDir).embeddings
      .where(col("vec_id") % 10 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nonSeeds)
    rows.foreach { r =>
      assert(r.getAs[Long]("pred_label") >= -1 && r.getAs[Long]("pred_label") <= 9)
    }
  }

  test("q451 silhouette values are valid and positives bounded by counts") {
    run("q451_silhouette").collect().foreach { r =>
      val m = r.getAs[Long]("mean_s_ppm")
      assert(m >= -1000000L && m <= 1000000L)
      assert(r.getAs[Long]("n_positive") <= r.getAs[Long]("n_vecs"))
    }
  }

  test("q452 DiD cells cover every order exactly once") {
    val rows = run("q452_diff_in_diff").collect()
    val t = graft.core.Tables(spark, sfDir)
    val orders = t.orders.join(t.customer,
      col("o_custkey") === col("c_custkey")).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders)
  }

  test("q453 tail blame has a zero-delta baseline and positive quantiles") {
    val rows = run("q453_tail_blame").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("p99_cents") > 0)
      if (r.getAs[String]("excluded_type") == "_none")
        assert(r.getAs[Long]("delta_cents") == 0L)
    }
  }

  test("q454 HDR cells respect their power-of-two bounds and cum ends at 1e6") {
    val rows = run("q454_hdr_histogram").collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = 1L << b.toInt
      val sub = r.getAs[Long]("sub_bucket")
      assert(sub >= 0 && sub <= 3)
      val subLo = lo + sub * (lo / 4)
      val subHi = lo + (sub + 1) * (lo / 4)
      assert(r.getAs[Long]("min_c") >= subLo && r.getAs[Long]("max_c") < subHi)
    }
    assert(rows.map(_.getAs[Long]("cum_ppm")).max == 1000000L)
  }

  test("q455 greedy cover gains are non-increasing and reconcile to coverage") {
    val rows = run("q455_set_cover").collect().sortBy(_.getAs[Int]("round"))
    assert(rows.nonEmpty)
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
    val covs = rows.map(_.getAs[Long]("covered"))
    // coverage after round r == coverage before + that round's gain
    assert(covs.head == gains.head)
    covs.zip(covs.tail).zip(gains.tail).foreach { case ((prev, cur), g) =>
      assert(cur == prev + g)
    }
  }

  test("q456 cascade starts from 2 seeds and every round census is non-negative") {
    val rows = run("q456_cascade_reach").collect().sortBy(_.getAs[Int]("round"))
    assert(rows.head.getAs[Long]("newly_reached") == 2L)
    rows.foreach(r => assert(r.getAs[Long]("newly_reached") >= 0L))
  }

  test("q457 LRU hit curve is monotone in cache size and partitions the trace") {
    val r = run("q457_lru_curve").collect().head
    val (h4, h16, h64) = (r.getAs[Long]("hit4_ppm"), r.getAs[Long]("hit16_ppm"),
      r.getAs[Long]("hit64_ppm"))
    assert(h4 <= h16 && h16 <= h64 && h64 <= 1000000L)
    val total = graft.core.Tables(spark, sfDir).events.count()
    assert(r.getAs[Long]("n_warm") + r.getAs[Long]("n_cold") == total)
  }

  test("q458 Hilbert steps are always spatial neighbors; Morton jumps") {
    val rows = run("q458_hilbert_curve").collect()
      .map(r => r.getAs[String]("curve") -> r).toMap
    val h = rows("hilbert")
    val m = rows("morton")
    // every consecutive Hilbert index is a Manhattan-1 neighbor
    assert(h.getAs[Long]("mean_step_dist_milli") == 1000L)
    assert(h.getAs[Long]("max_step_dist") == 1L)
    // Morton's quadrant-boundary jumps make its scan path longer
    assert(m.getAs[Long]("mean_step_dist_milli") > 1000L)
    assert(m.getAs[Long]("max_step_dist") > 1L)
    // the converse metric (index gap of adjacent cells) favors Morton —
    // pinned so the trade-off stays documented
    assert(h.getAs[Long]("mean_adj_gap_milli") > m.getAs[Long]("mean_adj_gap_milli"))
  }

  test("q459 exactly one join order is chosen and estimates are positive") {
    val rows = run("q459_join_order_advisor").collect()
    assert(rows.length == 2)
    assert(rows.count(_.getAs[Long]("chosen") == 1L) == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_intermediate") > 0)
      assert(r.getAs[Long]("est_final") > 0)
    }
  }

  test("q460 median CI brackets the median") {
    run("q460_median_ci").collect().foreach { r =>
      assert(r.getAs[Long]("ci_lo_cents") <= r.getAs[Long]("median_cents"))
      assert(r.getAs[Long]("median_cents") <= r.getAs[Long]("ci_hi_cents"))
    }
  }

  test("q461 peeking flips accumulate monotonically over binary flags") {
    val rows = run("q461_peeking_bias").collect().sortBy(_.getAs[String]("month"))
    rows.foreach(r => assert(Set(0L, 1L)(r.getAs[Long]("significant"))))
    val flips = rows.map(_.getAs[Long]("flips_so_far"))
    assert(flips.zip(flips.tail).forall { case (a, b) => a <= b })
  }

  test("q462 jackknife variance is non-negative and the full-sample ratio is positive") {
    val rows = run("q462_jackknife_ratio").collect()
    assert(rows.length == 3) // one per return flag
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0L)
      assert(r.getAs[Long]("ratio_milli") > 0L)
      assert(r.getAs[Long]("var_jack_milli2") >= 0L)
    }
  }

  test("q463 Good-Turing rows ascend in r and adjusted counts are positive or sentinel") {
    val rows = run("q463_good_turing").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val rs = rows.map(_.getAs[Long]("r"))
    assert(rs.zip(rs.tail).forall { case (a, b) => a < b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_r") >= 1L)
      val star = r.getAs[Long]("r_star_ppm")
      assert(star == -1L || star > 0L)
    }
  }

  test("q464 capture-recapture estimates bracket consistently") {
    val r = run("q464_capture_recapture").collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val m = r.getAs[Long]("n_both"); val lp = r.getAs[Long]("lincoln_petersen")
    assert(m <= math.min(n1, n2))
    assert(r.getAs[Long]("true_n") >= math.max(n1, n2))
    if (m > 0) {
      assert(lp >= math.max(n1, n2)) // N̂ ≥ each sample size
      // Chapman ≤ LP exactly (gap (n1−m)(n2−m)/(m(m+1)) ≥ 0); ±1 for the
      // two independent truncations
      assert(r.getAs[Long]("chapman") <= lp + 1)
    }
  }

  test("q465 MMR picks are distinct and greedy scores are non-increasing") {
    val rows = run("q465_mmr_diversify").collect().sortBy(_.getAs[Long]("pick"))
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 4)
    // candidate scores only fall as the selected set grows (ms is a max
    // over a growing set), so the greedy sequence is non-increasing
    val scores = rows.map(_.getAs[Long]("mmr_deci"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // pick 1 is pure relevance: its mmr is exactly 7·rel div 10
    assert(scores.head == 7L * rows.head.getAs[Long]("rel_scaled") / 10L)
  }

  test("q466 SCC core contains the root at distance zero both ways") {
    val rows = run("q466_scc_core").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Long]("fwd_hop"); val b = r.getAs[Long]("bwd_hop")
      assert(f >= 0L && f <= 4L && b >= 0L && b <= 4L)
    }
    // exactly one node (the root) sits at hop 0 in BOTH directions
    assert(rows.count(r =>
      r.getAs[Long]("fwd_hop") == 0L && r.getAs[Long]("bwd_hop") == 0L) == 1)
  }

  test("q467 edit-blocking candidates are bounded and sentinel marks singletons") {
    run("q467_edit_blocking").collect().foreach { r =>
      val n = r.getAs[Long]("n_names")
      assert(r.getAs[Long]("cand_w1") <= math.max(n - 1, 0))
      assert(r.getAs[Long]("cand_w2") <= math.max(n - 2, 0))
      val ml = r.getAs[Long]("min_lev")
      assert((ml == -1L) == (n == 1L)) // only singleton blocks lack a neighbor
      if (ml != -1L) assert(ml >= 1L)  // distinct names can't be 0 apart
    }
  }

  test("q468 bucket counts are powers of two sized to the 128 MiB target") {
    val rows = run("q468_bucket_advisor").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val b = r.getAs[Long]("n_buckets")
      assert(b >= 1L && (b & (b - 1)) == 0L) // power of two
      assert(b * 134217728L >= r.getAs[Long]("bytes")) // capacity covers the table
      assert(r.getAs[Long]("rows_per_bucket") == r.getAs[Long]("n_rows") / b)
    }
  }

  test("q469 RAKE phrases are stopword-free and scores descend") {
    val rows = run("q469_rake_keywords").collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getAs[Long]("score_ppm"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val toks = r.getAs[String]("phrase").split(" ")
      assert(toks.nonEmpty && toks.forall(t => t.nonEmpty && t != "a" && t != "the"))
    }
  }

  test("q470 LOF scores are positive, descending, and k-distances valid") {
    val rows = run("q470_lof").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Long]("lof_ppm"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("lof_ppm") > 0L)
      val kd = r.getAs[Long]("kdist")
      assert(kd >= 0L && kd <= 2000000L) // cosine distance range
    }
  }

  test("q471 James-Stein shrinkage contracts every group mean toward the grand mean") {
    val rows = run("q471_james_stein").collect()
    assert(rows.length == 25)
    val shrinks = rows.map(_.getAs[Long]("shrink_ppm")).distinct
    assert(shrinks.length == 1 && shrinks.head >= 0L && shrinks.head <= 1000000L)
    // recover the grand mean from any row: shrunk = grand + s·(raw−grand)/1e6
    // contraction ⇒ |shrunk − grand| ≤ |raw − grand| given the shared grand;
    // check pairwise spread instead (no grand in the output): the shrunk
    // spread is at most the raw spread
    val raw = rows.map(_.getAs[Long]("raw_milli"))
    val shr = rows.map(_.getAs[Long]("shrunk_milli"))
    assert(shr.max - shr.min <= raw.max - raw.min)
  }

  test("q472 hash ring partitions every customer across 4 nodes of 8 vnodes") {
    val rows = run("q472_hash_ring").collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getAs[Long]("n_vnodes") == 8L))
    val total = rows.map(_.getAs[Long]("n_keys")).sum
    assert(total == Tables(spark, sfDir).customer.count()) // complete partition
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum >= 999996L && shares.sum <= 1000000L) // 4 truncations
  }

  test("q473 bin advisor emits valid Sturges/FD counts per event type") {
    val rows = run("q473_bin_advisor").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val iqr = r.getAs[Long]("iqr_cents"); val rng = r.getAs[Long]("range_cents")
      assert(iqr >= 0L && iqr <= rng)
      assert(r.getAs[Long]("fd_bins") >= 1L)
      val st = r.getAs[Long]("sturges_bins")
      assert(st >= 2L && st <= 64L)
    }
  }

  test("q474 epoch permutations are near-independent and displacements valid") {
    val rows = run("q474_epoch_shuffle").collect()
    assert(rows.length == 3) // pairs (1,2) (1,3) (2,3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      // independent permutations: ρ ~ N(0, 1/√n); ±5σ band in ppm
      val band = (5000000L / math.round(math.sqrt(n.toDouble))).max(1L)
      assert(math.abs(r.getAs[Long]("rho_ppm")) <= band)
      val md = r.getAs[Long]("max_disp")
      assert(md > 0L && md <= n - 1)
    }
  }

  test("q475 each region rolls up to one OTHER row and shares sum to ~1e6") {
    val rows = run("q475_topk_others").collect()
    val byRegion = rows.groupBy(_.getAs[String]("region"))
    byRegion.foreach { case (_, rs) =>
      assert(rs.count(_.getAs[String]("label") == "OTHER") == 1)
      assert(rs.count(_.getAs[String]("label") != "OTHER") <= 3)
      val shares = rs.map(_.getAs[Long]("share_ppm")).sum
      assert(shares <= 1000000L && shares >= 1000000L - rs.length)
      rs.filter(_.getAs[String]("label") == "OTHER")
        .foreach(r => assert(r.getAs[Long]("pos") == 99L))
    }
  }

  test("q476 group-hash split leaks zero groups; row-hash split leaks") {
    val rows = run("q476_group_leakage").collect()
    assert(rows.length == 2)
    val byStrat = rows.map(r => r.getAs[String]("strategy") -> r).toMap
    assert(byStrat("group_hash").getAs[Long]("leaked_groups") == 0L)
    assert(byStrat("row_hash").getAs[Long]("leak_ppm") >=
      byStrat("group_hash").getAs[Long]("leak_ppm"))
    assert(byStrat("row_hash").getAs[Long]("n_groups") ==
      byStrat("group_hash").getAs[Long]("n_groups"))
  }

  test("q477 BH step-up rejections are a prefix of the z² ranking") {
    val rows = run("q477_bh_fdr").collect().sortBy(_.getAs[Long]("rk"))
    assert(rows.length == 25)
    val rej = rows.map(_.getAs[Long]("rejected"))
    assert(rej.forall(v => v == 0L || v == 1L))
    assert(rej.zip(rej.tail).forall { case (a, b) => a >= b }) // prefix property
    val z2 = rows.map(_.getAs[Long]("z2_milli"))
    assert(z2.zip(z2.tail).forall { case (a, b) => a >= b })
    val thr = rows.map(_.getAs[Long]("thr_milli"))
    assert(thr.zip(thr.tail).forall { case (a, b) => a >= b })
    // every rejected rank individually passed OR a later rank passed (step-up)
    rows.foreach { r =>
      if (r.getAs[Long]("rejected") == 1L && rej.last == 0L) () // covered by prefix check
    }
  }

  test("q478 stratified ATT reconciles with the treated-weighted stratum diffs") {
    val rows = run("q478_propensity_strata").collect().sortBy(_.getAs[Long]("stratum"))
    assert(rows.length == 10)
    val atts = rows.map(_.getAs[Long]("att_milli")).distinct
    assert(atts.length == 1)
    // recompute the treated-weighted mean with the same integer division
    val num = rows.map(r => BigInt(r.getAs[Long]("n_treat")) * r.getAs[Long]("diff_milli")).sum
    val den = rows.map(r => BigInt(r.getAs[Long]("n_treat"))).sum
    assert(BigInt(atts.head) == num / den)
  }

  test("q479 precedence shares are antisymmetric up to ties") {
    val rows = run("q479_precedence_matrix").collect()
    assert(rows.length == 20) // 5 types, ordered pairs
    val m = rows.map(r => (r.getAs[String]("ta"), r.getAs[String]("tb")) -> r).toMap
    m.foreach { case ((a, b), r) =>
      val rev = m((b, a))
      assert(r.getAs[Long]("n_both") == rev.getAs[Long]("n_both")) // symmetric support
      // a-first + b-first ≤ both (exact-tie users count for neither)
      assert(r.getAs[Long]("a_first") + rev.getAs[Long]("a_first") <=
        r.getAs[Long]("n_both"))
    }
  }

  test("q480 MAD flag matches its integer rule on every returned day") {
    val rows = run("q480_seasonal_residual_outliers").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val mads = rows.map(_.getAs[Long]("mad_milli")).distinct
    assert(mads.length == 1 && mads.head >= 0L)
    rows.foreach { r =>
      val a = math.abs(r.getAs[Long]("resid_milli"))
      val expect = if (BigInt(10000) * a > BigInt(44478) * mads.head) 1L else 0L
      assert(r.getAs[Long]("flagged") == expect)
    }
  }

  test("q481 threshold sweep prunes edges monotonically and keeps reach valid") {
    val rows = run("q481_threshold_reach").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.length == 3)
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(edges.zip(edges.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val reached = r.getAs[Long]("n_reached"); val mh = r.getAs[Long]("max_hop")
      assert((reached == 0L) == (mh == -1L))
      if (r.getAs[Long]("n_edges") > 0) assert(reached >= 1L) // root itself
      assert(mh <= 4L)
    }
  }

  test("q482 tail dependence counts nest and shares are valid ppm") {
    val r = run("q482_tail_dependence").collect().head
    val n = r.getAs[Long]("n")
    val nv = r.getAs[Long]("n_value_exceed"); val nj = r.getAs[Long]("n_joint")
    assert(nj <= nv)
    assert(nv <= n / 10) // strictly above the ceil(0.9n) order stat
    Seq("lambda_ppm", "baseline_ppm").foreach { c =>
      val v = r.getAs[Long](c); assert(v >= 0L && v <= 1000000L)
    }
  }

  test("q483 weak-label census nests conflict ⊆ overlap ⊆ coverage") {
    val rows = run("q483_weak_labels").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val cov = r.getAs[Long]("coverage_ppm")
      val ovl = r.getAs[Long]("overlap_ppm")
      val cfl = r.getAs[Long]("conflict_ppm")
      assert(cfl <= ovl && ovl <= cov && cov <= 1000000L)
    }
    assert(rows.map(_.getAs[Long]("vote_pos")).distinct.length == 1)
    assert(rows.map(_.getAs[Long]("vote_neg")).distinct.length == 1)
  }

  test("q484 k-center maximins shrink and the radius is certified by pick 3") {
    val rows = run("q484_kcenter_coreset").collect().sortBy(_.getAs[Long]("pick"))
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 4)
    assert(rows.head.getAs[Long]("maximin") == 0L) // the seed
    val mm = rows.tail.map(_.getAs[Long]("maximin"))
    assert(mm.zip(mm.tail).forall { case (a, b) => a >= b }) // greedy shrinks
    val radius = rows.map(_.getAs[Long]("radius")).distinct
    assert(radius.length == 1)
    assert(radius.head <= mm.last) // adding the last center only shrinks cover
  }

  test("q485 raking brings nation marginals near their targets") {
    val rows = run("q485_raking_ipf").collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("sample_raw") <= r.getAs[Long]("target"))
      val ratio = r.getAs[Long]("achieved_ratio_ppm")
      // 2 IPF rounds: sparse sf0.001 cells (some nation×segment cells
      // empty in the sample) cap how closely row marginals can be hit
      assert(ratio >= 500000L && ratio <= 1500000L)
    }
  }

  test("q486 MLM mask census partitions masked tokens into 80-10-10 actions") {
    val rows = run("q486_mlm_masking").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_masked") ==
        r.getAs[Long]("n_mask_tok") + r.getAs[Long]("n_random") + r.getAs[Long]("n_keep"))
      val ppm = r.getAs[Long]("mask_ppm")
      assert(ppm >= 50000L && ppm <= 300000L) // ~15% with small-sample noise
    }
  }

  test("q487 l-diversity shares are consistent with the distinct count") {
    val rows = run("q487_l_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct"); val share = r.getAs[Long]("top_share_ppm")
      assert(l >= 1L)
      assert(share * l >= 1000000L - l) // max share ≥ 1/l up to truncation
      assert(r.getAs[Long]("below_l3") == (if (l < 3) 1L else 0L))
    }
  }

  test("q488 replay halves balance and the policy scores valid means") {
    val r = run("q488_offline_replay").collect().head
    val ntr = r.getAs[Long]("n_train"); val nte = r.getAs[Long]("n_test")
    assert(math.abs(ntr - nte) <= 1L) // floor-half split
    assert(r.getAs[Long]("n_matched") <= nte)
    assert(r.getAs[Long]("policy_value_milli") >= 0L)
    assert(r.getAs[Long]("baseline_value_milli") >= 0L)
    assert(r.getAs[String]("chosen_type") != null)
  }

  test("q489 LOO influence is ranked and spans both signs") {
    val rows = run("q489_loo_source_influence").collect()
    assert(rows.nonEmpty)
    val inf = rows.map(_.getAs[Long]("influence_milli"))
    assert(inf.zip(inf.tail).forall { case (a, b) => a >= b }) // ranked desc
    assert(inf.max >= 0L && inf.min <= 0L) // dropping the best hurts, the worst helps
  }

  test("q445 isotonic fit is monotone non-decreasing and brackets the raw rates") {
    val rows = run("q445_isotonic").collect()
      .sortBy(_.getAs[Long]("discount_pct"))
    assert(rows.length >= 2)
    val fits = rows.map(_.getAs[Long]("fit_ppm"))
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b })
    // the isotonic fit stays inside the raw-rate envelope
    val raws = rows.map(_.getAs[Long]("raw_ppm"))
    fits.foreach { f => assert(f >= raws.min && f <= raws.max) }
  }
}

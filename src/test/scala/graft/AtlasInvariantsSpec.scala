package graft

import org.apache.spark.sql.functions._

/** Cross-column invariants of the q490+ Atlas batches — properties the
  * DuckDB differential gate can't state (two-pass median ≡ sort median,
  * ceil-log8 exactness, winnowing pair ordering).
  */
class AtlasInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q490 TextTiling valleys are interior and similarities are valid milli") {
    val rows = run("q490_texttiling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_blocks")
      assert(nb >= 2L) // docs with a single block have no boundary rows
      assert(r.getAs[Long]("n_valleys") <= math.max(nb - 2, 0))
      val lo = r.getAs[Long]("min_sim"); val hi = r.getAs[Long]("max_sim")
      assert(lo >= 0L && lo <= hi && hi <= 1000L)
    }
  }

  test("q491 winnowing pairs are ordered, positive, and well-formed") {
    val rows = run("q491_winnowing").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val shared = rows.map(_.getAs[Long]("shared"))
    assert(shared.zip(shared.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("shared") > 0L)
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
    }
  }

  test("q492 two-pass median equals the sort-based order statistic") {
    val rows = run("q492_twopass_median").collect()
    assert(rows.nonEmpty)
    // recompute the ⌈n/2⌉ order statistic by brute sort per type
    val raw = graft.core.Tables(spark, sfDir).events
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("c"))
      .collect().groupBy(_.getAs[String]("event_type"))
      .map { case (k, rs) =>
        val v = rs.map(_.getAs[Long]("c")).sorted
        k -> v((v.length + 1) / 2 - 1)
      }
    rows.foreach { r =>
      assert(r.getAs[Long]("median_cents") == raw(r.getAs[String]("event_type")))
    }
  }

  test("q494 containment dominates Jaccard on every candidate pair") {
    val rows = run("q494_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ca = r.getAs[Long]("contain_a_milli"); val cb = r.getAs[Long]("contain_b_milli")
      val j = r.getAs[Long]("jaccard_milli")
      assert(ca <= 1000L && cb <= 1000L && j <= 1000L)
      assert(ca >= j && cb >= j) // |A∩B|/|A| ≥ |A∩B|/|A∪B|
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
    }
  }

  test("q495 anomaly scores ascend and are valid transition probabilities") {
    val rows = run("q495_rare_transitions").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ps = rows.map(_.getAs[Long]("min_p_ppm"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("min_p_ppm") >= 1L &&
        r.getAs[Long]("min_p_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_trans") >= 1L)
    }
  }

  test("q496 mixture allocation respects the cap and the budget") {
    val rows = run("q496_mixture_caps").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("share_ppm") <= 80001L) // 8% cap (+1 truncation)
      assert(Set(0L, 1L)(r.getAs[Long]("capped_round1")))
      assert(r.getAs[Long]("alloc") >= 0L)
    }
    assert(rows.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }

  test("q497 learned-index errors are consistent and ranked") {
    val rows = run("q497_learned_index_audit").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val errs = rows.map(_.getAs[Long]("max_err"))
    assert(errs.zip(errs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("max_err") >= 0L)
      // mean ≤ max (milli-scaled)
      assert(r.getAs[Long]("mean_err_milli") <= 1000L * r.getAs[Long]("max_err"))
      assert(r.getAs[Long]("n_keys") >= 1L && r.getAs[Long]("n_keys") <= 256L)
    }
  }

  test("q498 lift chart descends to exactly 1000 milli at the full population") {
    val rows = run("q498_lift_chart").collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    val cum = rows.map(_.getAs[Long]("cum_rev_ppm"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }) // cumulative
    // final prefix covers everyone: lift = 1.000 exactly (up to truncation)
    assert(math.abs(rows.last.getAs[Long]("lift_milli") - 1000L) <= 1L)
    assert(cum.last >= 999999L - 10L && cum.last <= 1000000L)
  }

  test("q499 join estimates are within sane ppm bands of the actuals") {
    val rows = run("q499_card_feedback").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("actual_rows") > 0L)
      val ratio = r.getAs[Long]("est_over_act_ppm")
      // FK joins on near-uniform synthetic keys: the System-R estimate
      // should land within 2× either way
      assert(ratio >= 500000L && ratio <= 2000000L)
    }
  }

  test("q500 co-partition verdicts follow the divisibility rule") {
    val rows = run("q500_copartition_planner").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val lb = r.getAs[Long]("left_buckets"); val rb = r.getAs[Long]("right_buckets")
      assert((lb & (lb - 1)) == 0L && (rb & (rb - 1)) == 0L) // pow2
      val free = r.getAs[Long]("shuffle_free")
      assert(free == (if (lb % rb == 0 || rb % lb == 0) 1L else 0L))
      val side = r.getAs[String]("repartition_side")
      if (lb == rb) assert(side == "none") else assert(side != "none")
    }
  }

  test("q501 per-dim stats bound the mean and satisfy range²/var ≥ base") {
    val rows = run("q501_embedding_dim_stats").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("var_scaled2") >= 0L)
      assert(r.getAs[Long]("range_scaled") >= 0L)
      // range² ≥ var for any distribution ⇒ milli ratio ≥ ~1000
      if (r.getAs[Long]("var_scaled2") > 0L)
        assert(r.getAs[Long]("range_ratio_milli") >= 1000L)
    }
  }

  test("q502 wider gaps merge sessions monotonically") {
    val rows = run("q502_session_gap_sweep").collect().sortBy(_.getAs[Long]("gap_s"))
    assert(rows.length == 3)
    val ns = rows.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }) // fewer sessions at wider gaps
    val ml = rows.map(_.getAs[Long]("mean_len_milli"))
    assert(ml.zip(ml.tail).forall { case (a, b) => a <= b }) // longer sessions
    rows.foreach(r => assert(r.getAs[Long]("singleton_ppm") <= 1000000L))
  }

  test("q503 Good-Toulmin expected-new is bounded by N1 and non-negative") {
    val r = run("q503_good_toulmin").collect().head
    val gt = r.getAs[Long]("gt_expected_new")
    assert(gt >= 0L && gt <= r.getAs[Long]("n1")) // alternating sum ≤ first term
    assert(r.getAs[Long]("distinct_terms") <= r.getAs[Long]("n_tokens"))
    assert(r.getAs[Long]("new_ratio_ppm") <= 1000000L)
  }

  test("q504 DP composition bounds cross exactly once and grow monotonically") {
    val rows = run("q504_dp_composition").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("basic_milli") == 100L * r.getAs[Long]("k"))
      assert(r.getAs[Long]("advanced_wins") ==
        (if (r.getAs[Long]("advanced_milli") < r.getAs[Long]("basic_milli")) 1L else 0L))
    }
    val adv = rows.map(_.getAs[Long]("advanced_milli"))
    assert(adv.zip(adv.tail).forall { case (a, b) => a <= b })
    // wins are a suffix: once √k beats k it keeps beating it
    val wins = rows.map(_.getAs[Long]("advanced_wins"))
    assert(wins.zip(wins.tail).forall { case (a, b) => a <= b })
  }

  test("q505 blame dims are valid and ratios descend") {
    val rows = run("q505_outlier_blame").collect()
    assert(rows.length == 5)
    val ratios = rows.map(_.getAs[Long]("ratio_milli"))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val d = r.getAs[Long]("blame_dim")
      assert(d >= 1L && d <= 64L)
      assert(r.getAs[Long]("ratio_milli") >= 1000L) // worst dim ≥ 1 sigma² ratio… at least its own deviation
    }
  }

  test("q506 balance plan keeps at most everything and scales up at least 1x") {
    val rows = run("q506_class_balance_plan").collect()
    assert(rows.nonEmpty)
    val targets = rows.map(r => (r.getAs[Long]("under_target"), r.getAs[Long]("over_target")))
    assert(targets.distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("under_keep_ppm") <= 1000000L)
      assert(r.getAs[Long]("over_factor_milli") >= 1000L - 1L)
      assert(r.getAs[Long]("under_target") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("over_target") >= r.getAs[Long]("n"))
    }
  }

  test("q507 replica placement conserves shards and primaries") {
    val rows = run("q507_replica_placement").collect()
    assert(rows.length <= 8)
    assert(rows.map(_.getAs[Long]("n_primary")).sum == 64L)   // one primary per shard
    assert(rows.map(_.getAs[Long]("n_total")).sum == 64L * 3) // 3 replicas per shard
    val worst = rows.map(_.getAs[Long]("worst_pair_shared")).distinct
    assert(worst.length == 1 && worst.head >= 1L && worst.head <= 64L)
  }

  test("q508 smoothing pulls extreme raw rates toward the prior") {
    val rows = run("q508_smoothed_ctr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_ppm"); val sm = r.getAs[Long]("smoothed_ppm")
      assert(sm <= 1000000L && sm >= 0L)
      // prior mean is 50000 ppm (α=5, β=95): smoothing moves toward it
      if (raw > 50000L) assert(sm <= raw + 1)
      else assert(sm + 1 >= raw.min(50000L).max(raw)) // raw below prior: smoothed ≥ raw
      assert(r.getAs[Long]("clicks") >= 0L && r.getAs[Long]("views") >= 1L)
    }
  }

  test("q509 funnel contrast flags follow the z² threshold exactly") {
    val rows = run("q509_funnel_contrast").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_treat_ppm") <= 1000000L)
      assert(r.getAs[Long]("rate_control_ppm") <= 1000000L)
      assert(r.getAs[Long]("significant") ==
        (if (r.getAs[Long]("z2_milli") > 3841L) 1L else 0L))
      assert(r.getAs[Long]("z2_milli") >= 0L)
    }
  }

  test("q510 robust shape stats stay in their defining bounds") {
    val rows = run("q510_robust_shape").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Bowley skewness is bounded in [-1, 1] by construction
      val b = r.getAs[Long]("bowley_milli")
      assert(b >= -1000L && b <= 1000L)
      assert(r.getAs[Long]("moors_milli") >= 0L) // sums of non-negative octile gaps
    }
  }

  test("q511 every probe key overlaps at least one run inside the global span") {
    val rows = run("q511_read_amp").collect()
    assert(rows.length == 64)
    val nRuns = graft.core.Tables(spark, sfDir).orders
      .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct().count()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlapping")
      assert(n >= 0L && n <= nRuns)
    }
    // probes at both extremes land inside some run (they're run endpoints)
    assert(rows.head.getAs[Long]("n_overlapping") >= 1L)
  }

  test("q512 Young intervals are the exact isqrt and overheads decrease with MTBF") {
    val rows = run("q512_checkpoint_advisor").collect().sortBy(_.getAs[Long]("mtbf_s"))
    assert(rows.length == 3)
    rows.foreach { r =>
      val tau = r.getAs[Long]("tau_opt_s"); val m = r.getAs[Long]("mtbf_s")
      assert(tau * tau <= 60L * m && (tau + 1) * (tau + 1) > 60L * m)
    }
    val ov = rows.map(_.getAs[Long]("overhead_ppm"))
    assert(ov.zip(ov.tail).forall { case (a, b) => a >= b }) // rarer failures, less overhead
  }

  test("q513 quorum verdicts are the exact R+W>N rule") {
    val rows = run("q513_quorum_matrix").collect()
    assert(rows.length == 9 + 25)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val rr = r.getAs[Long]("r"); val w = r.getAs[Long]("w")
      assert(r.getAs[Long]("strong") == (if (rr + w > n) 1L else 0L))
      assert(r.getAs[Long]("max_stale_replicas") == n - w)
    }
  }

  test("q514 queueing delays explode monotonically toward saturation") {
    val rows = run("q514_queueing_advisor").collect().sortBy(_.getAs[Long]("lambda_rps"))
    assert(rows.length == 5)
    val wq = rows.map(_.getAs[Long]("wq_micros"))
    assert(wq.zip(wq.tail).forall { case (a, b) => a < b }) // strictly worsening
    rows.foreach { r =>
      val lam = r.getAs[Long]("lambda_rps")
      assert(r.getAs[Long]("rho_ppm") == 10000L * lam)
      // exact M/M/1: Wq·(μ−λ)·μ == λ·10⁶ up to truncation
      assert(r.getAs[Long]("wq_micros") == 1000000L * lam / (100L * (100L - lam)))
    }
  }

  test("q515 every replica converges to the same global count") {
    val rows = run("q515_gcounter_merge").collect()
    assert(rows.length == 3)
    val conv = rows.map(_.getAs[Long]("converged_after")).distinct
    assert(conv.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("visible_before") <= conv.head) // partial view ≤ merged
      assert(r.getAs[Long]("visible_before") > 0L)
    }
  }

  test("q516 encoding verdict picks the minimal estimated footprint") {
    val rows = run("q516_encoding_chooser").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val sizes = Map(
        "plain" -> r.getAs[Long]("plain_bytes"), "dict" -> r.getAs[Long]("dict_bytes"),
        "delta" -> r.getAs[Long]("delta_bytes"), "rle" -> r.getAs[Long]("rle_bytes"))
      val v = r.getAs[String]("verdict")
      assert(sizes(v) == sizes.values.min) // verdict is the argmin
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n"))
    }
  }

  test("q517 uniqueness grows with quasi-identifier richness") {
    val rows = run("q517_uniqueness_risk").collect().sortBy(_.getAs[String]("qi"))
    assert(rows.length == 3)
    val uniq = rows.map(_.getAs[Long]("unique_ppm"))
    assert(uniq.zip(uniq.tail).forall { case (a, b) => a <= b }) // refinement only splits
    val classes = rows.map(_.getAs[Long]("n_classes"))
    assert(classes.zip(classes.tail).forall { case (a, b) => a <= b })
  }

  test("q518 the eager-aggregation rewrite is lossless and smaller") {
    val rows = run("q518_eager_aggregation").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rewrite_ok") == 1L)
      assert(r.getAs[Long]("rev_join_first") == r.getAs[Long]("rev_preagg"))
      assert(r.getAs[Long]("join_rows_preagg") <= r.getAs[Long]("join_rows_plain"))
    }
  }

  test("q519 varint postings never exceed plain and dense terms compress best") {
    val rows = run("q519_postings_compression").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("varint_bytes") <= r.getAs[Long]("plain_bytes"))
      assert(r.getAs[Long]("ratio_milli") <= 1000L)
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
  }

  test("q520 index verdicts follow the break-even rule exactly") {
    val rows = run("q520_access_path_advisor").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val be = r.getAs[Long]("break_even_ppm"); val sel = r.getAs[Long]("probe_sel_ppm")
      assert(r.getAs[Long]("use_index") == (if (sel < be) 1L else 0L))
      assert(be > 0L && sel >= 0L && sel <= 1000000L)
    }
  }

  test("q521 the design effect is at least 1 and consistent with ICC") {
    val r = run("q521_design_effect").collect().head
    val deff = r.getAs[Long]("deff_milli")
    assert(deff >= 1000L) // clamped ICC ⇒ DEFF ≥ 1
    val icc = math.max(r.getAs[Long]("icc_ppm"), 0L)
    val mbar = r.getAs[Long]("m_bar_milli")
    assert(deff == 1000L + (mbar - 1000L) * icc / 1000000L)
    assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_orders"))
  }

  test("q522 range buckets partition all rows into 32 near-even parts") {
    val rows = run("q522_range_boundaries").collect()
    assert(rows.length <= 32 && rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val expected = rows.head.getAs[Long]("expected")
    assert(total == rows.map(_.getAs[Long]("n_rows")).sum) // complete partition
    assert(total >= expected * 32) // expected is the floor of n/32
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 31L)
    }
  }

  test("q523 the sniffer picks the pipe delimiter uniquely") {
    val rows = run("q523_csv_sniffer").collect()
    assert(rows.length == 4)
    val verdicts = rows.filter(_.getAs[Long]("verdict") == 1L)
    assert(verdicts.length == 1 && verdicts.head.getAs[String]("delim") == "|")
    verdicts.foreach(r => assert(r.getAs[Long]("min_count") == 2L)) // 3 fields
    rows.foreach(r =>
      assert((r.getAs[Long]("stable") == 1L) ==
        (r.getAs[Long]("min_count") == r.getAs[Long]("max_count") &&
          r.getAs[Long]("min_count") >= 1L)))
  }

  test("q524 JSON inference sees the planted shape mix") {
    val rows = run("q524_json_schema_infer").collect()
    assert(rows.length == 3)
    val byPath = rows.map(r => r.getAs[String]("path") -> r).toMap
    assert(byPath("k").getAs[String]("inferred") == "mixed") // numeric + quoted
    assert(byPath("k").getAs[Long]("present_ppm") == 1000000L)
    assert(byPath("k").getAs[Long]("nullable") == 0L)
    assert(byPath("tags[0]").getAs[String]("inferred") == "string")
    assert(byPath("tags[0]").getAs[Long]("nullable") == 1L)
    assert(byPath("meta.src").getAs[String]("inferred") == "string")
  }

  test("q525 the stage-p99 sum overstates the true tail") {
    val r = run("q525_p99_decomposition").collect().head
    // stages are additive parts of total ⇒ Σ stage-p99 ≥ total-p99 − 2
    // (two integer-division truncations in the stage split)
    assert(r.getAs[Long]("sum_stage_p99") >= r.getAs[Long]("p99_total") - 2L)
    assert(r.getAs[Long]("overstate_ppm") >= 999000L)
    Seq("p99_s1", "p99_s2", "p99_s3").foreach { c =>
      assert(r.getAs[Long](c) <= r.getAs[Long]("p99_total"))
    }
  }

  test("q526 the summed-area identity holds on every probe rectangle") {
    val rows = run("q526_summed_area").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("identity_ok") == 1L)
      assert(r.getAs[Long]("sat_count") == r.getAs[Long]("direct_count"))
      assert(r.getAs[Long]("sat_count") >= 0L)
    }
  }

  test("q527 dither rounding beats truncation's systematic bias") {
    val r = run("q527_dither_rounding").collect().head
    assert(r.getAs[Long]("trunc_err_ppm") <= 0L) // truncation only under-counts
    assert(math.abs(r.getAs[Long]("dither_err_ppm")) <=
      math.abs(r.getAs[Long]("trunc_err_ppm"))) // dither is never worse
    assert(r.getAs[Long]("bias_reduction_x") >= 1L)
  }

  test("q528 landmark bounds are valid upper bounds on true distances") {
    val rows = run("q528_landmark_distances").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("landmark_ub") >= r.getAs[Long]("true_d")) // triangle ineq.
      assert(r.getAs[Long]("tight") ==
        (if (r.getAs[Long]("landmark_ub") == r.getAs[Long]("true_d")) 1L else 0L))
      assert(r.getAs[Long]("true_d") >= 1L) // a < b pairs are never self-pairs
    }
  }

  test("q529 fingerprints are positive and row counts match the tables") {
    val rows = run("q529_content_fingerprint").collect()
    assert(rows.length == 3)
    val t = graft.core.Tables(spark, sfDir)
    val counts = Map("customer" -> t.customer.count(), "orders" -> t.orders.count(),
      "part" -> t.part.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == counts(r.getAs[String]("tbl")))
      // r5: fingerprint is emitted mod 2^62 as BIGINT (int64-safe at any
      // SF — the r4 driver hash narrowed >int64 decimals)
      assert(r.getAs[Long]("fingerprint") > 0L)
    }
  }

  test("q530 BOM paths grow with depth and quantities multiply") {
    val rows = run("q530_bom_rollup").collect().sortBy(_.getAs[Long]("depth"))
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("depth") == 0L &&
      rows.head.getAs[Long]("n_paths") == 1L &&
      rows.head.getAs[Long]("total_qty") == 1L) // the root
    rows.foreach { r =>
      // binary tree: ≤ 2^d paths; min edge qty 2 ⇒ qty ≥ 2^d per path
      val d = r.getAs[Long]("depth")
      assert(r.getAs[Long]("n_paths") <= (1L << d.toInt))
      assert(r.getAs[Long]("total_qty") >=
        r.getAs[Long]("n_paths") * (1L << d.toInt))
    }
  }

  test("q531 every stratum sees at most 5 folds with a bounded spread") {
    val rows = run("q531_stratified_kfold").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_folds") >= 1L && r.getAs[Long]("n_folds") <= 5L)
      assert(r.getAs[Long]("max_fold") >= r.getAs[Long]("min_fold"))
      assert(r.getAs[Long]("max_fold") * 5 >= r.getAs[Long]("n")) // max ≥ n/5
    }
  }

  test("q532 salting never reduces the speedup bound") {
    val rows = run("q532_makespan_audit").collect()
    assert(rows.length == 2)
    val m = rows.map(r => r.getAs[String]("strategy") -> r).toMap
    assert(m("salted_x4").getAs[Long]("max_task") <=
      m("plain").getAs[Long]("max_task")) // subdividing can only shrink the max
    assert(m("salted_x4").getAs[Long]("speedup_x_milli") >=
      m("plain").getAs[Long]("speedup_x_milli"))
    assert(m("salted_x4").getAs[Long]("n_tasks") >= m("plain").getAs[Long]("n_tasks"))
  }

  test("q533 histogram intersections are valid ppm and ranked") {
    val rows = run("q533_source_similarity").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val sims = rows.map(_.getAs[Long]("sim_ppm"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("sim_ppm") >= 0L && r.getAs[Long]("sim_ppm") <= 1000000L)
      assert(r.getAs[String]("sa") < r.getAs[String]("sb"))
    }
  }

  test("q534 the grid spatial join is certified against brute force") {
    val r = run("q534_grid_spatial_join").collect().head
    assert(r.getAs[Long]("certified") == 1L)
    assert(r.getAs[Long]("grid_pairs") == r.getAs[Long]("brute_pairs"))
    assert(r.getAs[Long]("n_points") > 0L)
  }

  test("q535 FPC factors fall as the sampling fraction grows") {
    val rows = run("q535_fpc_advisor").collect().sortBy(_.getAs[Long]("sample_pct"))
    assert(rows.length == 5)
    val fpc = rows.map(_.getAs[Long]("fpc_ppm"))
    assert(fpc.zip(fpc.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("fpc_ppm") <= 1000000L)
      assert(r.getAs[Long]("se_reduction_ppm") == 1000000L - r.getAs[Long]("fpc_ppm"))
    }
  }

  test("q536 adversarial accuracy is a valid majority rate above chance") {
    val r = run("q536_adversarial_validation").collect().head
    val acc = r.getAs[Long]("cell_majority_acc_ppm")
    assert(acc >= 500000L && acc <= 1000000L) // majority can't lose to chance
    assert(r.getAs[Long]("shift_flag") == (if (acc > 550000L) 1L else 0L))
    assert(r.getAs[Long]("n_cells") >= 1L)
  }

  test("q537 the overlap census partitions active customers") {
    val rows = run("q537_kway_overlap").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    rows.foreach { r =>
      val k = r.getAs[Long]("years_active")
      assert(k >= 1L && k <= 3L)
    }
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares >= 1000000L - 3L && shares <= 1000000L)
  }

  test("q538 the S-curve is monotone in similarity and sharper with more rows") {
    val rows = run("q538_lsh_scurve").collect()
    assert(rows.length == 9)
    // within each (b, r), detection probability rises with similarity
    rows.groupBy(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")))
      .foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("jaccard_ppm"))
          .map(_.getAs[Long]("p_detect_ppm"))
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
      }
    rows.foreach { r =>
      val p = r.getAs[Long]("p_detect_ppm")
      assert(p >= 0L && p <= 1000000L)
    }
  }

  test("q539 the sargable rewrite is lossless") {
    val r = run("q539_sargable_rewrite").collect().head
    assert(r.getAs[Long]("rewrite_ok") == 1L)
    assert(r.getAs[Long]("sargable_count") == r.getAs[Long]("function_count"))
    assert(r.getAs[Long]("sargable_count") > 0L)
  }

  test("q540 the 3VL matrix pins the expected NULL behaviors") {
    val r = run("q540_null_semantics").collect().head
    assert(r.getAs[Long]("count_star") == 5L)
    assert(r.getAs[Long]("count_col") == 3L)
    assert(r.getAs[Long]("sum_ignoring_nulls") == 40L)
    assert(r.getAs[Long]("distinct_non_null") == 2L)
    assert(r.getAs[Long]("eq_null_matches") == 0L)      // = NULL is never TRUE
    assert(r.getAs[Long]("null_safe_matches") == 2L)    // <=> NULL matches NULLs
    assert(r.getAs[Long]("in_list_matches") == 1L)      // only the real member
    assert(r.getAs[Long]("n_groups") == 3L)             // NULLs group together
  }

  test("q541 the rounding matrix pins half-away-from-zero and truncation") {
    val r = run("q541_rounding_matrix").collect().head
    assert(r.getAs[Long]("r_half") == 1L && r.getAs[Long]("r_two_half") == 3L)
    assert(r.getAs[Long]("r_neg") == -2L)
    assert(r.getAs[Long]("r_dbl") == 3L && r.getAs[Long]("r_dbl_neg") == -3L)
    assert(r.getAs[Long]("ceil_neg") == -1L && r.getAs[Long]("floor_neg") == -2L)
    assert(r.getAs[Long]("r_scale_deci") == 13L)
    assert(r.getAs[Long]("trunc_neg") == -1L)           // portable: trunc, not round
    assert(r.getAs[Long]("int_div_neg") == -3L && r.getAs[Long]("mod_neg") == -1L)
  }

  test("q542 log replay conserves files and keeps exactly the last 3 months live") {
    val r = run("q542_action_log_replay").collect().head
    val live = r.getAs[Long]("live_files"); val tomb = r.getAs[Long]("tombstones")
    assert(live + tomb == r.getAs[Long]("total_files"))
    assert(live == 3L || r.getAs[Long]("total_files") <= 3L) // 3-month retention
    assert(r.getAs[Long]("live_rows") > 0L)
  }

  test("q543 KS distances are valid ppm sup-norms and ranked") {
    val rows = run("q543_source_ks_matrix").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val ks = rows.map(_.getAs[Long]("ks_ppm"))
    assert(ks.zip(ks.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("ks_ppm") >= 0L && r.getAs[Long]("ks_ppm") <= 1000000L)
      assert(r.getAs[String]("sa") < r.getAs[String]("sb"))
    }
  }

  test("q544 bridge counts are bounded by the edge census") {
    val r = run("q544_local_bridges").collect().head
    val e = r.getAs[Long]("n_edges"); val b = r.getAs[Long]("local_bridges")
    assert(b >= 0L && b <= e)
    if (e > 0)
      assert(r.getAs[Long]("bridge_ppm") == 1000000L * b / e)
  }

  test("q545 more retries help, higher failure rates hurt, sends grow") {
    val rows = run("q545_retry_advisor").collect()
    assert(rows.length == 16)
    rows.groupBy(_.getAs[Long]("p_fail_ppm")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("max_retries"))
      val succ = sorted.map(_.getAs[Long]("p_success_ppm"))
      assert(succ.zip(succ.tail).forall { case (a, b) => a <= b })
      val sends = sorted.map(_.getAs[Long]("expected_sends_milli"))
      assert(sends.zip(sends.tail).forall { case (a, b) => a <= b })
      assert(sends.head >= 1000L) // at least one send
    }
    rows.foreach(r => assert(r.getAs[Long]("p_success_ppm") <= 1000000L))
  }

  test("q546 the control is inside the donor range (placebo sanity)") {
    val r = run("q546_synthetic_control").collect().head
    assert(r.getAs[Long]("pre_treated") > 0L)
    assert(r.getAs[Long]("control_post") > 0L)
    assert(r.getAs[Long]("effect_milli") ==
      r.getAs[Long]("post_treated") - r.getAs[Long]("control_post"))
  }

  test("q547 the FK-closed export has zero orphans") {
    val r = run("q547_consistent_sample_export").collect().head
    assert(r.getAs[Long]("orphan_orders") == 0L)
    assert(r.getAs[Long]("orphan_lineitems") == 0L)
    assert(r.getAs[Long]("n_customers") > 0L)
    val ppm = r.getAs[Long]("sample_ppm")
    assert(ppm > 20000L && ppm < 300000L) // ~10% md5 sample with noise
  }

  test("q548 HLL errors shrink by exactly 2x per 4x registers") {
    val rows = run("q548_hll_sizing").collect().sortBy(_.getAs[Long]("registers"))
    assert(rows.length == 4)
    val errs = rows.map(_.getAs[Long]("rel_err_ppm"))
    errs.zip(errs.tail).foreach { case (a, b) => assert(b == a / 2 || b == (a - 1) / 2) }
    rows.foreach { r =>
      assert(r.getAs[Long]("expected_abs_err") <= r.getAs[Long]("measured_ndv"))
    }
  }

  test("q549 cube coverage is a valid census per year") {
    val rows = run("q549_cube_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exp = r.getAs[Long]("expected_cells"); val obsv = r.getAs[Long]("observed_cells")
      assert(exp == 125L) // 25 nations × 5 segments
      assert(obsv >= 1L && obsv <= exp)
      assert(r.getAs[Long]("missing_cells") == exp - obsv)
    }
  }

  test("q550 SPT never waits longer than FIFO (exchange argument)") {
    val r = run("q550_scheduling_advisor").collect().head
    assert(r.getAs[Long]("spt_mean_wait_milli") <= r.getAs[Long]("fifo_mean_wait_milli"))
    assert(r.getAs[Long]("fifo_over_spt_milli") >= 1000L)
    assert(r.getAs[Long]("n_jobs") >= 1L)
  }

  test("q551 per-seed estimates bracket the global mean tightly") {
    val r = run("q551_seed_sensitivity").collect().head
    val g = r.getAs[Long]("global_mean_milli")
    val seeds = (1 to 5).map(i => r.getAs[Long](s"seed${i}_milli"))
    assert(g > 0L)
    // each 10% sample mean within ±30% of the global mean (very loose
    // at sf0.001 sample sizes; tight in practice)
    seeds.foreach(m => assert(math.abs(m - g) <= (3L * g) / 10L))
    assert(r.getAs[Long]("spread_ppm") >= 0L)
  }

  test("q552 the release gate is the conjunction of its checks") {
    val r = run("q552_release_gate").collect().head
    val pass = r.getAs[Long]("gate_pass")
    assert(pass == r.getAs[Long]("srm_ok") * r.getAs[Long]("ks_ok") *
      r.getAs[Long]("coverage_ok"))
    assert(r.getAs[Long]("ks_ppm") >= 0L && r.getAs[Long]("ks_ppm") <= 1000000L)
  }

  test("q553 bitmap verdicts follow the byte comparison") {
    val rows = run("q553_bitmap_advisor").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val bm = r.getAs[Long]("bitmap_bytes"); val bt = r.getAs[Long]("btree_bytes")
      assert(r.getAs[String]("verdict") == (if (bm < bt) "bitmap" else "btree"))
    }
    val m = rows.map(r => r.getAs[String]("col") -> r.getAs[String]("verdict")).toMap
    assert(m("o_orderstatus") == "bitmap") // 3 distinct values
    assert(m("o_custkey") == "btree")      // high cardinality
  }

  test("q554 the hierarchy is additive on every region") {
    val rows = run("q554_hierarchy_additivity").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("additive_ok") == 1L)
      assert(r.getAs[Long]("rollup_cents") == r.getAs[Long]("direct_cents"))
      assert(r.getAs[Long]("n_nations") == 5L)
    }
  }

  test("q555 scan savings nest: pruning+filter ≥ pruning ≥ full scan") {
    val rows = run("q555_scan_pricing").collect().sortBy(_.getAs[String]("pattern"))
    assert(rows.length == 3)
    val savings = rows.map(_.getAs[Long]("savings_ppm"))
    assert(savings(0) == 0L)          // full scan saves nothing
    assert(savings(1) >= savings(0))  // pruning helps
    assert(savings(2) >= savings(1))  // +filtering helps more
    rows.foreach(r => assert(r.getAs[Long]("bytes_read") >= 0L))
  }

  test("q556 sample quantiles land near the exact order statistics") {
    val r = run("q556_sample_quantile_error").collect().head
    assert(r.getAs[Long]("n_sampled") > 0L)
    // a 1/16 hash sample of i.i.d.-ish values: p50 within 10%, p99 within 25%
    assert(r.getAs[Long]("p50_err_ppm") <= 100000L)
    assert(r.getAs[Long]("p99_err_ppm") <= 250000L)
  }

  test("q557 fanout quantiles are ordered per relationship") {
    val rows = run("q557_fanout_profile").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val mn = r.getAs[Long]("min_fan"); val p50 = r.getAs[Long]("p50_fan")
      val p99 = r.getAs[Long]("p99_fan"); val mx = r.getAs[Long]("max_fan")
      assert(mn <= p50 && p50 <= p99 && p99 <= mx)
      assert(mn >= 1L) // every parent here has ≥1 child by construction
    }
  }

  test("q558 batching trades latency for throughput monotonically") {
    val rows = run("q558_group_commit_advisor").collect().sortBy(_.getAs[Long]("batch"))
    assert(rows.length == 5)
    val thr = rows.map(_.getAs[Long]("commits_per_sec"))
    assert(thr.zip(thr.tail).forall { case (a, b) => a < b })
    val lat = rows.map(_.getAs[Long]("added_p50_latency_us"))
    assert(lat.zip(lat.tail).forall { case (a, b) => a < b })
    rows.foreach(r => assert(r.getAs[Long]("efficiency_ppm") <= 1000000L))
  }

  test("q559 conflict estimates grow quadratically in concurrency until the cap") {
    val rows = run("q559_occ_conflict_estimate").collect()
      .sortBy(_.getAs[Long]("concurrent_txns"))
    assert(rows.length == 3)
    val est = rows.map(_.getAs[Long]("est_conflict_ppm"))
    assert(est.zip(est.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_.getAs[Long]("key_hhi_ppm")).distinct.length == 1)
    est.foreach(e => assert(e >= 0L && e <= 1000000L))
  }

  test("q560 columnar wins at low projectivity and loses at full width") {
    val rows = run("q560_row_col_breakeven").collect().sortBy(_.getAs[Long]("cols_read"))
    assert(rows.length == 4)
    // full width + seek overhead always loses to the row store
    assert(rows.last.getAs[Long]("columnar_wins") == 0L)
    rows.foreach { r => // verdict ≡ byte comparison (scale-independent)
      assert(r.getAs[Long]("columnar_wins") ==
        (if (r.getAs[Long]("col_bytes") < r.getAs[Long]("row_bytes")) 1L else 0L))
    }
    val cb = rows.map(_.getAs[Long]("col_bytes"))
    assert(cb.zip(cb.tail).forall { case (a, b) => a < b })
    // verdicts flip at most once, columnar-side first (monotone break-even)
    val wins = rows.map(_.getAs[Long]("columnar_wins"))
    assert(wins.zip(wins.tail).forall { case (a, b) => a >= b })
  }

  test("q561 keep rates rise with delay, reach 100% at the max lateness") {
    val rows = run("q561_watermark_advisor").collect().sortBy(_.getAs[Long]("delay_min"))
    assert(rows.length == 5)
    val keep = rows.map(_.getAs[Long]("keep_ppm"))
    assert(keep.zip(keep.tail).forall { case (a, b) => a <= b })
    assert(keep.last >= 999999L) // 30-min delay covers the 0-29 lateness range
    assert(rows.map(_.getAs[Long]("chosen")).sum == 1L) // exactly one pick
  }

  test("q562 repair lifts only corrupted points and never lowers") {
    val rows = run("q562_counter_repair").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_lifted") <= r.getAs[Long]("n_points"))
      assert(r.getAs[Long]("total_lift") >= r.getAs[Long]("n_lifted")) // ≥1 per lift
    }
    assert(rows.map(_.getAs[Long]("n_lifted")).sum > 0L) // corruption was planted
  }

  test("q563 dedup is idempotent and removes the planted duplicates") {
    val r = run("q563_dedup_idempotent").collect().head
    assert(r.getAs[Long]("idempotent") == 1L)
    assert(r.getAs[Long]("n_once") == r.getAs[Long]("n_twice"))
    assert(r.getAs[Long]("n_once") < r.getAs[Long]("n_input")) // dupes existed
  }

  test("q564 USL efficiency decays monotonically and a peak exists") {
    val rows = run("q564_usl_curve").collect().sortBy(_.getAs[Long]("workers"))
    assert(rows.length == 7)
    val eff = rows.map(_.getAs[Long]("efficiency_ppt"))
    assert(eff.zip(eff.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("at_peak")).sum >= 1L)
    assert(rows.head.getAs[Long]("speedup_milli") == 1000L) // p=1 baseline
  }

  test("q565 tail sampling keeps every slow trace; head sampling keeps a fraction") {
    val rows = run("q565_trace_sampling").collect()
    assert(rows.length == 2)
    val m = rows.map(r => r.getAs[String]("policy") -> r).toMap
    assert(m("tail_slow").getAs[Long]("slow_coverage_ppm") == 1000000L)
    assert(m("head_10pct").getAs[Long]("slow_coverage_ppm") <= 1000000L)
    assert(m("tail_slow").getAs[Long]("kept_ppm") <= 60000L) // ~5% above p95
  }

  test("q493 LSM levels are the exact ceil-log8 of the memtable ratio") {
    val rows = run("q493_lsm_advisor").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val ratio = r.getAs[Long]("memtable_ratio")
      val lv = r.getAs[Long]("levels")
      assert(ratio >= 1L)
      assert(r.getAs[Long]("wa_leveled") == 1L + 8L * lv)
      assert(r.getAs[Long]("wa_tiered") == 1L + lv)
      if (lv == 0L) assert(ratio == 1L)
      else {
        assert(BigInt(8).pow(lv.toInt) >= ratio)
        assert(BigInt(8).pow(lv.toInt - 1) < ratio)
      }
    }
  }
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Round-4 continuation: blocking-based linkage, unbounded-series drift
  * monitoring, interval coverage, and time-series symbolization. Same
  * determinism conventions as FrontierQueries / AppliedQueries: exact
  * integer/DECIMAL sums wherever the math allows, squared-comparison
  * tricks instead of sqrt where thresholds are rational, FLOOR-scaled
  * integer outputs, and a deterministic total order on every result.
  */
object SignalQueries {

  val all: Seq[QueryDef] = Seq(

    // Sorted-neighborhood record-linkage candidates over customer: block
    // by (nation, segment), sort each block by balance cents, and compare
    // every record only to its next 1-2 neighbors (LEAD) — the classic
    // O(n·w) alternative to the O(n²) intra-block cross join (and the
    // second standard blocking strategy next to q319's Fellegi-Sunter
    // band blocking). Candidates are near-balance pairs (≤ 500 cents
    // apart). At 100 TB the blocking keys ARE the shuffle partitioning
    // and the window sort is per-block; no pair materialization ever
    // exceeds w rows per record.
    QueryDef.sql(
      "q438_sorted_neighborhood",
      """WITH c AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS cents, c_custkey AS ck
        |  FROM customer),
        |w AS (SELECT nk, seg, cents, ck,
        |    LEAD(cents, 1) OVER (PARTITION BY nk, seg ORDER BY cents, ck) AS c1,
        |    LEAD(cents, 2) OVER (PARTITION BY nk, seg ORDER BY cents, ck) AS c2
        |  FROM c)
        |SELECT nk AS nation, seg AS segment, COUNT(*) AS n_records,
        |  COUNT(*) FILTER (WHERE c1 IS NOT NULL AND c1 - cents <= 500) AS cand_w1,
        |  COUNT(*) FILTER (WHERE c2 IS NOT NULL AND c2 - cents <= 500) AS cand_w2,
        |  COALESCE(MIN(c1 - cents), -1) AS min_gap
        |FROM w GROUP BY 1, 2 ORDER BY nation, segment""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir).customer
        .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") * lit(100.0)).cast("long").as("cents"),
          col("c_custkey").as("ck"))
      val w = Window.partitionBy("nk", "seg").orderBy("cents", "ck")
      c.withColumn("c1", lead("cents", 1).over(w))
        .withColumn("c2", lead("cents", 2).over(w))
        .groupBy(col("nk").as("nation"), col("seg").as("segment"))
        .agg(count(lit(1)).as("n_records"),
          count(when(col("c1").isNotNull && col("c1") - col("cents") <= 500, 1))
            .as("cand_w1"),
          count(when(col("c2").isNotNull && col("c2") - col("cents") <= 500, 1))
            .as("cand_w2"),
          coalesce(min(col("c1") - col("cents")), lit(-1L)).as("min_gap"))
        .orderBy("nation", "segment")
    },

    // CUSUM drift monitor on daily order revenue per nation — the
    // UNBOUNDED-series companion to q203's in-row fold: the one-sided
    // recurrence S_t = max(0, S_{t−1} + (x_t − k)) has an exact prefix
    // form, S_t = P_t − min(0, min_{j≤t} P_j) with P_t = Σ_{i≤t}(x_i−k)
    // (Page's CUSUM; the max(0,·) reset becomes a running-minimum
    // subtraction). Two ordinary cumulative windows per nation — no
    // bounded-array assumption, so a 10-year daily series distributes
    // exactly like a 30-day one. Reference k = the nation's own mean
    // daily revenue (floored cents), alarm threshold h = 2k. Everything
    // stays in exact BIGINT cents; the only fact-sized pass is the
    // first aggregate.
    QueryDef.sql(
      "q439_cusum_prefix",
      """WITH d AS (SELECT c.c_nationkey AS nk,
        |    date_diff('day', DATE '1995-01-01', o.o_orderdate) AS day,
        |    SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS x
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |m AS (SELECT nk, CAST(SUM(x) // COUNT(*) AS BIGINT) AS k FROM d GROUP BY 1),
        |p AS (SELECT d.nk, day, x, m.k,
        |    SUM(x - k) OVER (PARTITION BY d.nk ORDER BY day) AS ps
        |  FROM d JOIN m ON d.nk = m.nk),
        |s AS (SELECT nk, day, k,
        |    ps - LEAST(MIN(ps) OVER (PARTITION BY nk ORDER BY day), 0) AS cusum
        |  FROM p)
        |SELECT nk AS nation, COUNT(*) AS n_days,
        |  MAX(k) AS k_cents,
        |  COUNT(*) FILTER (WHERE cusum > 2 * k) AS n_alarms,
        |  CAST(MAX(cusum) AS BIGINT) AS max_cusum,
        |  COALESCE(MIN(day) FILTER (WHERE cusum > 2 * k), -1) AS first_alarm_day
        |FROM s GROUP BY 1 ORDER BY nation""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("x"))
      val m = d.groupBy("nk").agg(expr("CAST(SUM(x) div COUNT(*) AS BIGINT)").as("k"))
      val w = Window.partitionBy("nk").orderBy("day")
      val cus = d.join(broadcast(m), "nk")
        .withColumn("ps", sum(col("x") - col("k")).over(w))
        .withColumn("cusum", col("ps") - least(min(col("ps")).over(w), lit(0L)))
      cus.groupBy(col("nk").as("nation"))
        .agg(count(lit(1)).as("n_days"),
          max("k").as("k_cents"),
          count(when(col("cusum") > col("k") * 2, 1)).as("n_alarms"),
          max("cusum").as("max_cusum"),
          coalesce(min(when(col("cusum") > col("k") * 2, col("day"))), lit(-1L))
            .as("first_alarm_day"))
        .orderBy("nation")
    },

    // Interval-union coverage per user: each event opens an interval
    // [ts, ts + value minutes]; the union length is computed with the
    // classic sweep re-expressed as windows — running MAX of interval
    // end over PRECEDING rows detects island starts (start > previous
    // max end), a cumulative flag sum labels islands, and island extents
    // aggregate exactly in epoch-microseconds. Complements q316 (which
    // tracks the concurrency LEVEL at day grain via a ±1 delta sweep):
    // this one reports per-key covered time and island structure with no
    // spine and no delta explode. No self-join, no explode to the minute
    // grain: cost is one sort per user partition — the 100 TB
    // alternative (minute explode) multiplies the stream by average
    // interval length.
    QueryDef.sql(
      "q440_interval_union",
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + GREATEST(CAST(FLOOR(value * 60000000.0) AS BIGINT), 0) AS e
        |  FROM events),
        |o AS (SELECT user_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax,
        |    event_id FROM iv),
        |g AS (SELECT user_id, s, e,
        |    SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, e, event_id) AS island
        |  FROM o),
        |x AS (SELECT user_id, island, MIN(s) AS i_start, MAX(e) AS i_end
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us,
        |  MAX(i_end - i_start) AS max_island_us
        |FROM x GROUP BY 1 ORDER BY covered_us DESC, user_id LIMIT 25""".stripMargin) { (s, dir) =>
      val iv = Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) +
            greatest(floor(col("value") * lit(60000000.0)).cast("long"), lit(0L))).as("e"))
      val ord = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
      val g = iv
        .withColumn("pmax",
          max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when(col("pmax").isNull || col("s") > col("pmax"), 1).otherwise(0))
            .over(ord))
      g.groupBy("user_id", "island")
        .agg(min("s").as("i_start"), max("e").as("i_end"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("i_end") - col("i_start")).as("covered_us"),
          max(col("i_end") - col("i_start")).as("max_island_us"))
        .orderBy(col("covered_us").desc, col("user_id"))
        .limit(25)
    },

    // SAX symbolization of the daily revenue series per nation: each day
    // z-bands into one of four symbols (a < −0.67σ ≤ b < μ ≤ c < +0.67σ
    // ≤ d) WITHOUT computing σ — the band tests compare signed deviation
    // s = n·x − Σx against the rational threshold 0.67·√nvar via the
    // squared form 10⁴·s² vs 4489·nvar (q341's integer trick; nvar =
    // n·Σx² − (Σx)², all DECIMAL(38,0)-exact), so the symbols are
    // bit-identical cross-engine with zero sqrt/libm. The result is the
    // symbol-transition census per nation (LAG bigrams) — the SAX motif
    // input. Day-grain windows per nation; the fact-sized pass is the
    // first aggregate only.
    QueryDef.sql(
      "q441_sax_symbols",
      """WITH d AS (SELECT c.c_nationkey AS nk,
        |    date_diff('day', DATE '1995-01-01', o.o_orderdate) AS day,
        |    SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS x
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |m AS (SELECT nk, COUNT(*) AS n, SUM(x) AS sx,
        |    COUNT(*) * SUM(CAST(x AS HUGEINT) * x) - SUM(CAST(x AS HUGEINT)) * SUM(x)
        |      AS nvar
        |  FROM d GROUP BY 1),
        |z AS (SELECT d.nk, day,
        |    CAST(m.n AS HUGEINT) * x - m.sx AS s, m.nvar FROM d JOIN m ON d.nk = m.nk),
        |sym AS (SELECT nk, day,
        |    CASE WHEN s < 0 AND 10000 * s * s > 4489 * nvar THEN 'a'
        |         WHEN s < 0 THEN 'b'
        |         WHEN 10000 * s * s < 4489 * nvar THEN 'c'
        |         ELSE 'd' END AS sym
        |  FROM z),
        |t AS (SELECT nk, sym,
        |    LAG(sym) OVER (PARTITION BY nk ORDER BY day) AS prev FROM sym)
        |SELECT nk AS nation, prev || '>' || sym AS transition, COUNT(*) AS cnt
        |FROM t WHERE prev IS NOT NULL
        |GROUP BY 1, 2 ORDER BY nation, transition""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("x"))
      val m = d.groupBy("nk").agg(
        count(lit(1)).as("n"), sum("x").as("sx"),
        (count(lit(1)) * sum(col("x").cast("decimal(38,0)") * col("x")) -
          sum(col("x").cast("decimal(38,0)")) * sum(col("x"))).as("nvar"))
      val z = d.join(broadcast(m), "nk")
        .select(col("nk"), col("day"),
          (col("n").cast("decimal(38,0)") * col("x") - col("sx")).as("s"),
          col("nvar"))
      val sym = z.select(col("nk"), col("day"),
        expr("CASE WHEN s < 0 AND 10000 * s * s > 4489 * nvar THEN 'a'" +
          " WHEN s < 0 THEN 'b'" +
          " WHEN 10000 * s * s < 4489 * nvar THEN 'c'" +
          " ELSE 'd' END").as("sym"))
      sym.withColumn("prev",
          lag("sym", 1).over(Window.partitionBy("nk").orderBy("day")))
        .where(col("prev").isNotNull)
        .groupBy(col("nk").as("nation"),
          concat(col("prev"), lit(">"), col("sym")).as("transition"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("nation", "transition")
    },

    // Probability-proportional-to-size sample WITHOUT replacement over
    // orders: each row races with key h/w (h = first 32 md5 bits of the
    // key, w = the order's cents), and the 50 smallest keys win — bigger
    // weights systematically draw smaller keys, the deterministic-hash
    // analogue of the exponential race in PPS bottom-k sketches (cf.
    // Cohen & Kaplan's bottom-k). The quotient is evaluated EXACTLY:
    // h·10¹² // w in DECIMAL/HUGEINT, so the ranking is a pure integer
    // order with no float ties. One scan + a distributed top-k
    // (TakeOrderedAndProject: partial top-50 per partition, 50·P rows to
    // the final heap) — the companion to q198's UNIFORM bottom-k.
    QueryDef.sql(
      "q442_pps_sample",
      """WITH w AS (SELECT o_orderkey AS ok,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM orders),
        |k AS (SELECT ok, cents,
        |    CAST(CAST(h AS HUGEINT) * 1000000000000 // cents AS BIGINT) AS race
        |  FROM w)
        |SELECT ok AS o_orderkey, cents, race FROM k
        |ORDER BY race, o_orderkey LIMIT 50""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"),
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long").as("h"))
        .select(col("o_orderkey"), col("cents"),
          expr("CAST(CAST(h AS DECIMAL(38,0)) * 1000000000000 div cents AS BIGINT)")
            .as("race"))
        .orderBy("race", "o_orderkey")
        .limit(50)
    },

    // Haar wavelet energy decomposition of the first 64 days of daily
    // order revenue per nation: three dyadic levels of detail energy
    // E_k = Σ_b (A_{k−1,2b} − A_{k−1,2b+1})², with approximation sums
    // carried between levels by day-div-2^k grouping — all exact BIGINT
    // cents and cent². The 64-slot grid zero-fills from a broadcast
    // nation×day spine so gap days contribute exact zeros. After the one
    // fact-sized day aggregate, every level operates on ≤ 64·|nations|
    // rows — the wavelet pyramid is metadata-sized at any corpus scale.
    QueryDef.sql(
      "q443_haar_energy",
      """WITH d AS (SELECT c.c_nationkey AS nk,
        |    date_diff('day', DATE '1995-01-01', o.o_orderdate) AS day,
        |    SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS x
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE o.o_orderdate >= DATE '1995-01-01'
        |    AND o.o_orderdate < DATE '1995-01-01' + INTERVAL 64 DAY
        |  GROUP BY 1, 2),
        |spine AS (SELECT n_nationkey AS nk, g.day FROM nation,
        |    (SELECT UNNEST(generate_series(0, 63)) AS day) g),
        |a0 AS (SELECT spine.nk, spine.day, COALESCE(d.x, 0) AS x
        |  FROM spine LEFT JOIN d ON spine.nk = d.nk AND spine.day = d.day),
        |l1 AS (SELECT nk, day // 2 AS b,
        |    SUM(CASE WHEN day % 2 = 0 THEN x ELSE 0 END) AS ev,
        |    SUM(CASE WHEN day % 2 = 1 THEN x ELSE 0 END) AS od
        |  FROM a0 GROUP BY 1, 2),
        |l2 AS (SELECT nk, b // 2 AS b,
        |    SUM(CASE WHEN b % 2 = 0 THEN ev + od ELSE 0 END) AS ev,
        |    SUM(CASE WHEN b % 2 = 1 THEN ev + od ELSE 0 END) AS od
        |  FROM l1 GROUP BY 1, 2),
        |l3 AS (SELECT nk, b // 2 AS b,
        |    SUM(CASE WHEN b % 2 = 0 THEN ev + od ELSE 0 END) AS ev,
        |    SUM(CASE WHEN b % 2 = 1 THEN ev + od ELSE 0 END) AS od
        |  FROM l2 GROUP BY 1, 2)
        |SELECT l1.nk AS nation,
        |  (SELECT CAST(SUM((ev - od) * (ev - od)) AS BIGINT) FROM l1 i WHERE i.nk = l1.nk)
        |    AS e1_cents2,
        |  (SELECT CAST(SUM((ev - od) * (ev - od)) AS BIGINT) FROM l2 i WHERE i.nk = l1.nk)
        |    AS e2_cents2,
        |  (SELECT CAST(SUM((ev - od) * (ev - od)) AS BIGINT) FROM l3 i WHERE i.nk = l1.nk)
        |    AS e3_cents2
        |FROM l1 GROUP BY 1 ORDER BY nation""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .where(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < date_add(lit("1995-01-01").cast("date"), 64))
        .groupBy(col("c_nationkey").as("nk"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("x"))
      val spine = t.nation.select(col("n_nationkey").as("nk"))
        .crossJoin(s.range(0, 64).select(col("id").as("day")))
      val a0 = broadcast(spine).join(d, Seq("nk", "day"), "left")
        .select(col("nk"), col("day"), coalesce(col("x"), lit(0L)).as("x"))
      def level(in: org.apache.spark.sql.DataFrame, posCol: String) = in
        .groupBy(col("nk"), (col(posCol) / 2).cast("long").as("b"))
        .agg(sum(when(col(posCol) % 2 === 0, col("v")).otherwise(0L)).as("ev"),
          sum(when(col(posCol) % 2 === 1, col("v")).otherwise(0L)).as("od"))
      val l1 = level(a0.select(col("nk"), col("day"), col("x").as("v")), "day")
      val l2 = level(l1.select(col("nk"), col("b"), (col("ev") + col("od")).as("v")), "b")
      val l3 = level(l2.select(col("nk"), col("b"), (col("ev") + col("od")).as("v")), "b")
      def energy(in: org.apache.spark.sql.DataFrame, out: String) = in
        .groupBy("nk")
        .agg(sum((col("ev") - col("od")) * (col("ev") - col("od"))).as(out))
      energy(l1, "e1_cents2")
        .join(energy(l2, "e2_cents2"), "nk")
        .join(energy(l3, "e3_cents2"), "nk")
        .select(col("nk").as("nation"), col("e1_cents2"), col("e2_cents2"),
          col("e3_cents2"))
        .orderBy("nation")
    },

    // Shapley-value channel attribution over 3 touch channels (click /
    // view / signup; conversion = any purchase): users group into the 7
    // non-empty touch coalitions by bitmask, each coalition's conversion
    // rate becomes v(S) in exact ppm, and the 3-player Shapley formula
    // assembles per-channel marginal contributions as the INTEGER
    // combination 2·[v(i)−v(∅)] + Σ_j [v(ij)−v(j)] + 2·[v(N)−v(N\i)]
    // (units: 6× ppm — the 1/3!-weights cleared by 6). Efficiency,
    // Σᵢ φ6ᵢ = 6·v(N), holds as an exact integer identity (asserted in
    // SignalInvariantsSpec). One user-grain aggregate, a 7-row coalition
    // table, one pivot — coalition analytics at any event volume.
    QueryDef.sql(
      "q444_shapley_attribution",
      """WITH u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
        |    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |g AS (SELECT 4 * hc + 2 * hv + hs AS mask, COUNT(*) AS n, SUM(conv) AS c
        |  FROM u WHERE 4 * hc + 2 * hv + hs > 0 GROUP BY 1),
        |v AS (SELECT mask, CAST(1000000 * c // n AS BIGINT) AS vp FROM g),
        |p AS (SELECT
        |    COALESCE(MAX(CASE WHEN mask = 1 THEN vp END), 0) AS v1,
        |    COALESCE(MAX(CASE WHEN mask = 2 THEN vp END), 0) AS v2,
        |    COALESCE(MAX(CASE WHEN mask = 3 THEN vp END), 0) AS v3,
        |    COALESCE(MAX(CASE WHEN mask = 4 THEN vp END), 0) AS v4,
        |    COALESCE(MAX(CASE WHEN mask = 5 THEN vp END), 0) AS v5,
        |    COALESCE(MAX(CASE WHEN mask = 6 THEN vp END), 0) AS v6,
        |    COALESCE(MAX(CASE WHEN mask = 7 THEN vp END), 0) AS v7
        |  FROM v)
        |SELECT channel, phi6_ppm FROM (
        |  SELECT 'click' AS channel,
        |    2 * v4 + (v6 - v2) + (v5 - v1) + 2 * (v7 - v3) AS phi6_ppm FROM p
        |  UNION ALL SELECT 'signup',
        |    2 * v1 + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6) FROM p
        |  UNION ALL SELECT 'view',
        |    2 * v2 + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5) FROM p)
        |ORDER BY channel""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("hc"),
          max(when(col("event_type") === "view", 1).otherwise(0)).as("hv"),
          max(when(col("event_type") === "signup", 1).otherwise(0)).as("hs"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val g = u.select((col("hc") * 4 + col("hv") * 2 + col("hs")).as("mask"),
          col("conv"))
        .where(col("mask") > 0)
        .groupBy("mask")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
        .select(col("mask"), expr("CAST(1000000 * c div n AS BIGINT)").as("vp"))
      val vCols = (1 to 7).map(m =>
        coalesce(max(when(col("mask") === m, col("vp"))), lit(0L)).as(s"v$m"))
      val p = g.agg(vCols.head, vCols.tail: _*)
      val phis = p.selectExpr(
        "stack(3," +
          " 'click',  2 * v4 + (v6 - v2) + (v5 - v1) + 2 * (v7 - v3)," +
          " 'signup', 2 * v1 + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6)," +
          " 'view',   2 * v2 + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5)" +
          ") AS (channel, phi6_ppm)")
      phis.orderBy("channel")
    },

    // Isotonic (monotone non-decreasing) regression of return rate on
    // discount level via the exact max-min characterization: fit_i =
    // max_{j≤i} min_{k≥i} pooled-rate(j..k), evaluated at ppm resolution
    // (the max-min form is monotone for ANY pooled-rate assignment, so
    // the ppm flooring preserves a valid isotonic fit — asserted in
    // SignalInvariantsSpec). The fact table collapses to 11 discount
    // levels first; the O(levels³) pair/argmax enumeration then runs on
    // metadata-sized frames (66 pairs), the distributed alternative to
    // the inherently sequential pool-adjacent-violators loop.
    QueryDef.sql(
      "q445_isotonic",
      """WITH l AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS lev,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT lev, n, r,
        |    SUM(n) OVER (ORDER BY lev) AS cn, SUM(r) OVER (ORDER BY lev) AS cr
        |  FROM l),
        |pairs AS (SELECT pj.lev AS j, pk.lev AS k,
        |    CAST(1000000 * (pk.cr - pj.cr + pj.r) // (pk.cn - pj.cn + pj.n)
        |      AS BIGINT) AS v
        |  FROM p pj JOIN p pk ON pj.lev <= pk.lev),
        |mi AS (SELECT i.lev AS lev, pairs.j, MIN(v) AS mv
        |  FROM l i JOIN pairs ON pairs.j <= i.lev AND pairs.k >= i.lev
        |  GROUP BY 1, 2),
        |fit AS (SELECT lev, MAX(mv) AS fit_ppm FROM mi GROUP BY 1)
        |SELECT l.lev AS discount_pct, l.n,
        |  CAST(1000000 * l.r // l.n AS BIGINT) AS raw_ppm, fit.fit_ppm
        |FROM l JOIN fit ON l.lev = fit.lev ORDER BY discount_pct""".stripMargin) { (s, dir) =>
      val l = Tables(s, dir).lineitem
        .groupBy(round(col("l_discount") * 100).cast("long").as("lev"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("r"))
      val w = Window.orderBy("lev")
      val p = l.select(col("lev"), col("n"), col("r"),
        sum("n").over(w).as("cn"), sum("r").over(w).as("cr"))
      val pj = p.select(col("lev").as("j"), col("n").as("jn"), col("r").as("jr"),
        col("cn").as("jcn"), col("cr").as("jcr"))
      val pk = p.select(col("lev").as("k"), col("cn").as("kcn"), col("cr").as("kcr"))
      val pairs = pj.join(pk, col("j") <= col("k"))
        .select(col("j"), col("k"),
          expr("CAST(1000000 * (kcr - jcr + jr) div (kcn - jcn + jn) AS BIGINT)")
            .as("v"))
      val mi = l.select(col("lev"))
        .join(pairs, col("j") <= col("lev") && col("k") >= col("lev"))
        .groupBy("lev", "j").agg(min("v").as("mv"))
      val fit = mi.groupBy("lev").agg(max("mv").as("fit_ppm"))
      l.join(fit, "lev")
        .select(col("lev").as("discount_pct"), col("n"),
          expr("CAST(1000000 * r div n AS BIGINT)").as("raw_ppm"), col("fit_ppm"))
        .orderBy("discount_pct")
    },

    // NDCG@10 for label-match retrieval over the embeddings table
    // (complements q248's P@5/MRR): the 1/log2(1+rank) discounts are a
    // HARD-CODED integer table (milli-scaled, ranks 1..10) — the q355
    // log-table idiom that removes libm from the hot path entirely —
    // and IDCG is the prefix sum of that table at min(R,10). Scoring is
    // one dim-join dot-product pass (scaled-integer, exact); DCG/IDCG/
    // NDCG assemble in pure BIGINT with one ppm division per query.
    QueryDef.sql(
      "q446_ndcg", {
        val disc = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
          356207L, 333333L, 315465L, 301030L, 289065L)
        val cum = disc.scanLeft(0L)(_ + _).tail
        val discCase = disc.zipWithIndex
          .map { case (v, i) => s"WHEN rk = ${i + 1} THEN $v" }
          .mkString("CASE ", " ", " ELSE 0 END")
        val idcgCase = cum.zipWithIndex
          .map { case (v, i) => s"WHEN LEAST(rel_total, 10) = ${i + 1} THEN $v" }
          .mkString("CASE ", " ", " ELSE 0 END")
        s"""WITH e AS (SELECT vec_id, label, i - 1 AS dim,
           |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
           |  FROM embeddings, generate_series(1, 64) t(i)),
           |a AS (SELECT * FROM e WHERE vec_id % 25 = 0),
           |d AS (SELECT a.vec_id AS qid, a.label AS ql, e.vec_id AS cid,
           |    e.label AS cl, SUM(a.m * e.m) AS dot
           |  FROM a JOIN e ON a.dim = e.dim AND a.vec_id <> e.vec_id
           |  GROUP BY 1, 2, 3, 4),
           |r AS (SELECT qid, ql, cl, dot,
           |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rk,
           |    SUM(CASE WHEN ql = cl THEN 1 ELSE 0 END) OVER (PARTITION BY qid)
           |      AS rel_total
           |  FROM d),
           |pq AS (SELECT qid, MAX(rel_total) AS rel_total,
           |    SUM(CASE WHEN rk <= 10 AND ql = cl THEN $discCase ELSE 0 END)
           |      AS dcg_milli
           |  FROM r GROUP BY 1)
           |SELECT qid, CAST(rel_total AS BIGINT) AS rel_total,
           |  CAST(dcg_milli AS BIGINT) AS dcg_milli,
           |  CAST($idcgCase AS BIGINT) AS idcg_milli,
           |  CAST(1000000 * dcg_milli // GREATEST($idcgCase, 1) AS BIGINT) AS ndcg_ppm
           |FROM pq ORDER BY qid""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val disc = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
        356207L, 333333L, 315465L, 301030L, 289065L)
      val cum = disc.scanLeft(0L)(_ + _).tail
      val discCase = disc.zipWithIndex
        .map { case (v, i) => s"WHEN rk = ${i + 1} THEN ${v}L" }
        .mkString("CASE ", " ", " ELSE 0L END")
      val idcgCase = cum.zipWithIndex
        .map { case (v, i) => s"WHEN LEAST(rel_total, 10) = ${i + 1} THEN ${v}L" }
        .mkString("CASE ", " ", " ELSE 0L END")
      // native scaled_dot == the oracle's dim-join sum (floor(x·1e6) terms)
      // with no 64× positional explode — the dot never leaves the row
      val emb = Tables(s, dir).embeddings
      val q = emb.where(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("qid"), col("label").as("ql"),
          col("embedding").as("qv"))
      val d = emb.crossJoin(broadcast(q))
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("ql"), col("vec_id").as("cid"),
          col("label").as("cl"),
          graft.plans.GraftFunctions.scaledDot(col("embedding"), col("qv"))
            .as("dot"))
      val r = d
        .withColumn("rk", row_number()
          .over(Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))))
        .withColumn("rel_total",
          sum(when(col("ql") === col("cl"), 1).otherwise(0))
            .over(Window.partitionBy("qid")))
      r.groupBy("qid")
        .agg(max("rel_total").cast("long").as("rel_total"),
          sum(when(col("rk") <= 10 && col("ql") === col("cl"),
            expr(discCase)).otherwise(0L)).as("dcg_milli"))
        .select(col("qid"), col("rel_total"), col("dcg_milli"),
          expr(s"CAST($idcgCase AS BIGINT)").as("idcg_milli"),
          expr(s"CAST(1000000 * dcg_milli div GREATEST($idcgCase, 1) AS BIGINT)")
            .as("ndcg_ppm"))
        .orderBy("qid")
    },

    // Local-differential-privacy frequency estimation by randomized
    // response: each event reports its true type with p = 3/4, else a
    // "random" type — both coins are deterministic md5 bits, so the
    // mechanism is replayable and the oracle exact. The debiasing
    // estimator n̂_t = (20·obs_t − n)/15 inverts E[obs] = (3/4)n_t +
    // n/20 in exact integers (truncating division matches q164's probed
    // convention on both engines). The privacy family's counterpart to
    // q253's k-anonymity: one hash projection + a 5-row pivot at any
    // event volume.
    QueryDef.sql(
      "q447_randomized_response",
      """WITH coins AS (SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 4 AS c1,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 9, 8)) AS BIGINT)
        |      % 5 AS c2
        |  FROM events),
        |types AS (SELECT * FROM (VALUES (0, 'click'), (1, 'error'), (2, 'purchase'),
        |    (3, 'signup'), (4, 'view')) t(i, name)),
        |rep AS (SELECT CASE WHEN c1 > 0 THEN event_type ELSE t.name END AS rtype
        |  FROM coins JOIN types t ON t.i = c2),
        |o AS (SELECT rtype, COUNT(*) AS obs FROM rep GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n FROM events),
        |tru AS (SELECT event_type, COUNT(*) AS true_n FROM events GROUP BY 1)
        |SELECT tru.event_type, tru.true_n, o.obs,
        |  CAST((20 * o.obs - n) // 15 AS BIGINT) AS est_n,
        |  CAST((20 * o.obs - n) // 15 - tru.true_n AS BIGINT) AS err
        |FROM tru JOIN o ON tru.event_type = o.rtype CROSS JOIN tot
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val coins = ev.select(col("event_type"),
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 4).as("c1"),
        (conv(substring(md5(col("event_id").cast("string")), 9, 8), 16, 10)
          .cast("long") % 5).as("c2"))
      val types = s.range(5).select(col("id").cast("int").as("i"),
        expr("element_at(array('click','error','purchase','signup','view'), " +
          "CAST(id AS INT) + 1)").as("name"))
      val rep = coins.join(broadcast(types), col("i") === col("c2"))
        .select(when(col("c1") > 0, col("event_type")).otherwise(col("name"))
          .as("rtype"))
      val o = rep.groupBy("rtype").agg(count(lit(1)).as("obs"))
      val tot = ev.agg(count(lit(1)).as("n"))
      val tru = ev.groupBy("event_type").agg(count(lit(1)).as("true_n"))
      tru.join(o, col("event_type") === col("rtype"))
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("true_n"), col("obs"),
          expr("CAST((20 * obs - n) div 15 AS BIGINT)").as("est_n"),
          expr("CAST((20 * obs - n) div 15 - true_n AS BIGINT)").as("err"))
        .orderBy("event_type")
    },

    // Mutual-kNN graph census over the embeddings: an edge exists when
    // each endpoint ranks the other in its cosine top-10 (packed
    // scaled-integer dots, deterministic tie-break by candidate id) —
    // the graph SemDeDup/HDBSCAN-style clustering consumes. The census
    // reports per label: vectors, intra-label mutual edges, cross-label
    // mutual edges, and the intra share in ppm. The candidate relation
    // is computed ONCE and self-joined on the reversed pair (the mutual
    // test is an equi-join, never a second scoring pass).
    QueryDef.sql(
      "q448_mutual_knn",
      """WITH e AS (SELECT vec_id, label, i - 1 AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |d AS (SELECT a.vec_id AS qid, a.label AS ql, b.vec_id AS cid,
        |    b.label AS cl, SUM(a.m * b.m) AS dot
        |  FROM e a JOIN e b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2, 3, 4),
        |nb AS (SELECT qid, ql, cid, cl FROM (
        |    SELECT qid, ql, cid, cl,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rk
        |    FROM d) WHERE rk <= 10),
        |mu AS (SELECT x.qid AS a, x.ql AS la, x.cid AS b, x.cl AS lb
        |  FROM nb x JOIN nb y ON x.qid = y.cid AND x.cid = y.qid
        |  WHERE x.qid < x.cid),
        |pl AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY 1),
        |agg AS (SELECT la AS label,
        |    SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS intra,
        |    SUM(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS cross_lb FROM mu GROUP BY 1)
        |SELECT pl.label AS label, pl.n_vecs,
        |  CAST(COALESCE(agg.intra, 0) AS BIGINT) AS intra_edges,
        |  CAST(COALESCE(agg.cross_lb, 0) AS BIGINT) AS cross_edges,
        |  CAST(1000000 * COALESCE(agg.intra, 0)
        |    // GREATEST(COALESCE(agg.intra, 0) + COALESCE(agg.cross_lb, 0), 1)
        |    AS BIGINT) AS intra_ppm
        |FROM pl LEFT JOIN agg ON pl.label = agg.label
        |ORDER BY pl.label""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables(s, dir).embeddings
      // one broadcast side + native scaled_dot (== the oracle's dim-join
      // sums) keeps the pairwise scoring at the vector grain
      val a = emb.select(col("vec_id").as("qid"), col("label").as("ql"),
        col("embedding").as("qv"))
      val d = emb.crossJoin(broadcast(a))
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("ql"), col("vec_id").as("cid"),
          col("label").as("cl"),
          graft.plans.GraftFunctions.scaledDot(col("embedding"), col("qv"))
            .as("dot"))
      val nb = d.withColumn("rk", row_number()
          .over(Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))))
        .where(col("rk") <= 10)
        .select("qid", "ql", "cid", "cl")
      val rev = nb.select(col("qid").as("rq"), col("cid").as("rc"))
      val mu = nb.join(rev, col("qid") === col("rc") && col("cid") === col("rq"))
        .where(col("qid") < col("cid"))
        .select(col("ql").as("la"), col("cl").as("lb"))
      val agg = mu.groupBy(col("la").as("label"))
        .agg(sum(when(col("la") === col("lb"), 1).otherwise(0)).as("intra"),
          sum(when(col("la") =!= col("lb"), 1).otherwise(0)).as("cross_lb"))
      val pl = emb.groupBy("label").agg(count(lit(1)).as("n_vecs"))
      pl.join(agg, Seq("label"), "left")
        .select(col("label"), col("n_vecs"),
          coalesce(col("intra"), lit(0L)).as("intra_edges"),
          coalesce(col("cross_lb"), lit(0L)).as("cross_edges"),
          expr("CAST(1000000 * COALESCE(intra, 0)" +
            " div GREATEST(COALESCE(intra, 0) + COALESCE(cross_lb, 0), 1)" +
            " AS BIGINT)").as("intra_ppm"))
        .orderBy("label")
    },

    // Huffman code construction over the 9 Benford leading digits of
    // order totals — a greedy sequential algorithm expressed as EIGHT
    // UNROLLED dataflow rounds: each round ranks the current clusters by
    // (freq, mask), merges the two smallest (cluster masks partition the
    // digit set, so bitwise-or is plain addition), and the per-digit code
    // length falls out afterwards as "how many merged masks contain my
    // bit" — no mutable depth state at all. Every round operates on ≤ 9
    // metadata rows regardless of data volume; the only fact-sized work
    // is the leading-digit census. Kraft equality (Σ 2^(8−len) = 256)
    // is asserted in SignalInvariantsSpec.
    QueryDef.sql(
      "q449_huffman", {
        val base =
          """digits AS (SELECT d.dig, COALESCE(f.freq, 0) AS freq
            |  FROM (SELECT UNNEST(generate_series(1, 9)) AS dig) d
            |  LEFT JOIN (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100.0)
            |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS dig, COUNT(*) AS freq
            |    FROM orders GROUP BY 1) f ON d.dig = f.dig),
            |c0 AS (SELECT freq, CAST(1 << (dig - 1) AS BIGINT) AS mask FROM digits)"""
            .stripMargin
        val rounds = (1 to 8).map { i =>
          s"""r$i AS (SELECT freq, mask,
             |    ROW_NUMBER() OVER (ORDER BY freq, mask) AS rn FROM c${i - 1}),
             |m$i AS (SELECT CAST(SUM(freq) AS BIGINT) AS freq,
             |    CAST(SUM(mask) AS BIGINT) AS mask FROM r$i WHERE rn <= 2),
             |c$i AS (SELECT freq, mask FROM r$i WHERE rn > 2
             |  UNION ALL SELECT freq, mask FROM m$i)""".stripMargin
        }.mkString(",\n")
        val masks = (1 to 8).map(i => s"SELECT mask FROM m$i").mkString(" UNION ALL ")
        s"""WITH $base,
           |$rounds,
           |mm AS ($masks)
           |SELECT dig AS digit, freq,
           |  (SELECT COUNT(*) FROM mm WHERE (mask >> (digits.dig - 1)) & 1 = 1)
           |    AS code_len,
           |  freq * (SELECT COUNT(*) FROM mm WHERE (mask >> (digits.dig - 1)) & 1 = 1)
           |    AS bits
           |FROM digits ORDER BY digit""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val f = Tables(s, dir).orders
        .select(substring(floor(col("o_totalprice") * lit(100.0)).cast("long")
          .cast("string"), 1, 1).cast("long").as("dig"))
        .groupBy("dig").agg(count(lit(1)).as("freq"))
      val digits = broadcast(s.range(1, 10).select(col("id").as("dig")))
        .join(f, Seq("dig"), "left")
        .select(col("dig"), coalesce(col("freq"), lit(0L)).as("freq"))
      var c: DataFrame = digits.select(col("freq"),
        expr("CAST(shiftleft(1, CAST(dig - 1 AS INT)) AS BIGINT)").as("mask"))
      var maskFrames = Seq.empty[DataFrame]
      for (_ <- 1 to 8) {
        val r = c.withColumn("rn",
          row_number().over(Window.orderBy("freq", "mask")))
        val m = r.where(col("rn") <= 2)
          .agg(sum("freq").as("freq"), sum("mask").as("mask"))
        maskFrames = maskFrames :+ m.select("mask")
        c = r.where(col("rn") > 2).select("freq", "mask").unionAll(m)
      }
      val mm = maskFrames.reduce(_ unionAll _)
      val lens = digits.crossJoin(broadcast(mm.withColumnRenamed("mask", "mmask")))
        .groupBy("dig", "freq")
        .agg(sum(expr("CASE WHEN (shiftright(mmask, CAST(dig - 1 AS INT)) & 1) = 1" +
          " THEN 1 ELSE 0 END")).as("code_len"))
      lens.select(col("dig").as("digit"), col("freq"), col("code_len"),
          (col("freq") * col("code_len")).as("bits"))
        .orderBy("digit")
    },

    // Semi-supervised label propagation over the top-10 cosine-neighbor
    // graph: 10% of vectors keep their labels as seeds, and two unrolled
    // vote rounds assign each unlabeled vector the majority label among
    // its LABELED neighbors (deterministic tie-break: vote count desc,
    // label asc). The candidate graph is computed ONCE; each round is a
    // join + count + rank-1 filter — the bounded-superstep shape every
    // scalable SSL/graph algorithm here uses (cf. q160 BFS, q354
    // PageRank). Output: confusion census of round-2 predictions vs true
    // labels for the initially-unlabeled (pred −1 = still unlabeled).
    QueryDef.sql(
      "q450_label_spread",
      """WITH e AS (SELECT vec_id, label, i - 1 AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS cid, SUM(a.m * b.m) AS dot
        |  FROM e a JOIN e b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |nb AS (SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rk
        |    FROM d) WHERE rk <= 10),
        |l0 AS (SELECT vec_id AS vid, label AS lab FROM embeddings
        |  WHERE vec_id % 10 = 0),
        |v1 AS (SELECT nb.qid, l.lab, COUNT(*) AS nv
        |  FROM nb JOIN l0 l ON nb.cid = l.vid GROUP BY 1, 2),
        |n1 AS (SELECT qid, lab FROM (
        |    SELECT qid, lab,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY nv DESC, lab) AS r
        |    FROM v1) WHERE r = 1),
        |l1 AS (SELECT vid, lab FROM l0 UNION ALL
        |  SELECT qid, lab FROM n1 WHERE qid NOT IN (SELECT vid FROM l0)),
        |v2 AS (SELECT nb.qid, l.lab, COUNT(*) AS nv
        |  FROM nb JOIN l1 l ON nb.cid = l.vid GROUP BY 1, 2),
        |n2 AS (SELECT qid, lab FROM (
        |    SELECT qid, lab,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY nv DESC, lab) AS r
        |    FROM v2) WHERE r = 1),
        |l2 AS (SELECT vid, lab FROM l1 UNION ALL
        |  SELECT qid, lab FROM n2 WHERE qid NOT IN (SELECT vid FROM l1)),
        |un AS (SELECT vec_id, label AS true_label FROM embeddings
        |  WHERE vec_id % 10 <> 0)
        |SELECT CAST(un.true_label AS BIGINT) AS true_label,
        |  CAST(COALESCE(l2.lab, -1) AS BIGINT) AS pred_label, COUNT(*) AS n
        |FROM un LEFT JOIN l2 ON un.vec_id = l2.vid
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val emb = Tables(s, dir).embeddings
      val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val nb = emb.crossJoin(broadcast(q))
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("cid"),
          graft.plans.GraftFunctions.scaledDot(col("embedding"), col("qv"))
            .as("dot"))
        .withColumn("rk", row_number()
          .over(Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))))
        .where(col("rk") <= 10)
        .select("qid", "cid")
      val l0 = emb.where(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("vid"), col("label").as("lab"))
      def spread(labels: DataFrame): DataFrame = {
        val votes = nb
          .join(labels.withColumnRenamed("vid", "cid"), "cid")
          .groupBy("qid", "lab").agg(count(lit(1)).as("nv"))
        val winner = votes.withColumn("r", row_number()
            .over(Window.partitionBy("qid").orderBy(col("nv").desc, col("lab"))))
          .where(col("r") === 1)
          .select(col("qid").as("vid"), col("lab"))
        labels.unionAll(
          winner.join(labels.select("vid"), Seq("vid"), "left_anti"))
      }
      val l2 = spread(spread(l0))
      emb.where(col("vec_id") % 10 =!= 0)
        .select(col("vec_id"), col("label").cast("long").as("true_label"))
        .join(l2, col("vec_id") === col("vid"), "left")
        .groupBy(col("true_label"),
          coalesce(col("lab"), lit(-1)).cast("long").as("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_label", "pred_label")
    },

    // Silhouette coefficient per label over the embeddings (clustering
    // quality for the labels q323/q448/q450 consume): cosine distance
    // 10⁶ − cos_scaled (IEEE sqrt norms, the q323 convention), mean
    // intra/inter distances as floor-divided integers at the
    // (vector, other-label) grain, s = 10⁶(b−a)/max(a,b). One pairwise
    // scoring pass feeds a 10-cell-per-vector aggregate; signed integer
    // division truncates identically on both engines (probed, q164).
    QueryDef.sql(
      "q451_silhouette",
      """WITH e AS (SELECT vec_id, label, i - 1 AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |nrm AS (SELECT vec_id, SUM(m * m) AS nn FROM e GROUP BY 1),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS cid, SUM(a.m * b.m) AS dot
        |  FROM e a JOIN e b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |ds AS (SELECT d.qid, eb.label AS cl,
        |    1000000 - CAST(FLOOR(1000000.0 * CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))))
        |      AS BIGINT) AS dist
        |  FROM d JOIN nrm na ON d.qid = na.vec_id
        |  JOIN nrm nc ON d.cid = nc.vec_id
        |  JOIN embeddings eb ON d.cid = eb.vec_id),
        |pc AS (SELECT ds.qid, eb.label AS ql, ds.cl,
        |    CAST(SUM(ds.dist) // COUNT(*) AS BIGINT) AS md
        |  FROM ds JOIN embeddings eb ON ds.qid = eb.vec_id GROUP BY 1, 2, 3),
        |ab AS (SELECT qid, ql,
        |    MAX(CASE WHEN cl = ql THEN md END) AS a,
        |    MIN(CASE WHEN cl <> ql THEN md END) AS b
        |  FROM pc GROUP BY 1, 2),
        |sv AS (SELECT qid, ql,
        |    CAST(1000000 * (b - a) // GREATEST(a, b, 1) AS BIGINT) AS s
        |  FROM ab WHERE a IS NOT NULL AND b IS NOT NULL)
        |SELECT CAST(ql AS BIGINT) AS label, COUNT(*) AS n_vecs,
        |  CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_s_ppm,
        |  COUNT(*) FILTER (WHERE s > 0) AS n_positive
        |FROM sv GROUP BY 1 ORDER BY label""".stripMargin) { (s, dir) =>
      val sd = graft.plans.GraftFunctions.scaledDot _
      val emb = Tables(s, dir).embeddings
        .select(col("vec_id"), col("label"), col("embedding"),
          sd(col("embedding"), col("embedding")).as("ncc"))
      val q = emb.select(col("vec_id").as("qid"), col("label").as("ql"),
        col("embedding").as("qv"), col("ncc").as("naa"))
      val ds = emb.crossJoin(broadcast(q))
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("ql"), col("label").as("cl"),
          sd(col("embedding"), col("qv")).as("dot"), col("naa"), col("ncc"))
        .select(col("qid"), col("ql"), col("cl"),
          (lit(1000000L) - expr("CAST(FLOOR(1000000.0D * CAST(dot AS DOUBLE)" +
            " / (sqrt(CAST(naa AS DOUBLE)) * sqrt(CAST(ncc AS DOUBLE)))) AS BIGINT)"))
            .as("dist"))
      ds.groupBy("qid", "ql", "cl")
        .agg(expr("CAST(SUM(dist) div COUNT(*) AS BIGINT)").as("md"))
        .groupBy("qid", "ql")
        .agg(max(when(col("cl") === col("ql"), col("md"))).as("a"),
          min(when(col("cl") =!= col("ql"), col("md"))).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull)
        .select(col("qid"), col("ql"),
          expr("CAST(1000000 * (b - a) div GREATEST(a, b, 1) AS BIGINT)").as("s"))
        .groupBy(col("ql").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
          expr("CAST(SUM(s) div COUNT(*) AS BIGINT)").as("mean_s_ppm"),
          count(when(col("s") > 0, 1)).as("n_positive"))
        .orderBy("label")
    },

    // Difference-in-differences per market segment: treatment = nations
    // 0-4, policy date 1997-01-01; the DiD estimate on mean order value
    // is assembled from four exact (Σcents, n) cells per segment with
    // ONE milli-scaled DOUBLE+FLOOR at the end (numerators < 2⁵³ —
    // IEEE-exact, the q164 convention). The causal-inference companion
    // to q311's CUPED: grouped partial sums only, no row ever leaves
    // its segment cell.
    QueryDef.sql(
      "q452_diff_in_diff",
      """WITH o AS (SELECT c.c_mktsegment AS seg,
        |    CASE WHEN c.c_nationkey < 5 THEN 1 ELSE 0 END AS treat,
        |    CASE WHEN o.o_orderdate >= DATE '1997-01-01' THEN 1 ELSE 0 END AS post,
        |    CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT seg, treat, post, COUNT(*) AS n, SUM(cents) AS sc
        |  FROM o GROUP BY 1, 2, 3),
        |p AS (SELECT seg,
        |    MAX(CASE WHEN treat = 1 AND post = 1 THEN sc END) AS tp,
        |    MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS ntp,
        |    MAX(CASE WHEN treat = 1 AND post = 0 THEN sc END) AS tr,
        |    MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS ntr,
        |    MAX(CASE WHEN treat = 0 AND post = 1 THEN sc END) AS cp,
        |    MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS ncp,
        |    MAX(CASE WHEN treat = 0 AND post = 0 THEN sc END) AS cr,
        |    MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS ncr
        |  FROM g GROUP BY 1)
        |SELECT seg AS segment,
        |  CAST(ntp + ntr + ncp + ncr AS BIGINT) AS n_orders,
        |  CAST(FLOOR(1000.0 * ((CAST(tp AS DOUBLE) / ntp - CAST(tr AS DOUBLE) / ntr)
        |    - (CAST(cp AS DOUBLE) / ncp - CAST(cr AS DOUBLE) / ncr)))
        |    AS BIGINT) AS did_millicents
        |FROM p ORDER BY segment""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val o = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          when(col("c_nationkey") < 5, 1).otherwise(0).as("treat"),
          when(col("o_orderdate") >= lit("1997-01-01").cast("date"), 1)
            .otherwise(0).as("post"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      val g = o.groupBy("seg", "treat", "post")
        .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
      g.groupBy("seg")
        .agg(
          max(when(col("treat") === 1 && col("post") === 1, col("sc"))).as("tp"),
          max(when(col("treat") === 1 && col("post") === 1, col("n"))).as("ntp"),
          max(when(col("treat") === 1 && col("post") === 0, col("sc"))).as("tr"),
          max(when(col("treat") === 1 && col("post") === 0, col("n"))).as("ntr"),
          max(when(col("treat") === 0 && col("post") === 1, col("sc"))).as("cp"),
          max(when(col("treat") === 0 && col("post") === 1, col("n"))).as("ncp"),
          max(when(col("treat") === 0 && col("post") === 0, col("sc"))).as("cr"),
          max(when(col("treat") === 0 && col("post") === 0, col("n"))).as("ncr"))
        .select(col("seg").as("segment"),
          (col("ntp") + col("ntr") + col("ncp") + col("ncr")).cast("long")
            .as("n_orders"),
          expr("CAST(FLOOR(1000.0D * ((CAST(tp AS DOUBLE) / ntp" +
            " - CAST(tr AS DOUBLE) / ntr)" +
            " - (CAST(cp AS DOUBLE) / ncp - CAST(cr AS DOUBLE) / ncr)))" +
            " AS BIGINT)").as("did_millicents"))
        .orderBy("segment")
    },

    // Tail-latency blame decomposition: the p99 of event values (cents)
    // with each event type excluded in turn, all computed from ONE shared
    // value-grain histogram — never 5 copies of the stream. Each
    // exclusion's p99 is the discrete rank-index quantile (1-based
    // ceil(0.99·n): min value with 100·cum ≥ 99·n, the probed
    // quantile_disc convention), and delta vs the no-exclusion baseline
    // says how much each type contributes to the tail. The histogram
    // join fans out |distinct values| × 6 rows — bounded by the value
    // domain, not the event count.
    QueryDef.sql(
      "q453_tail_blame",
      """WITH v AS (SELECT event_type AS t,
        |    CAST(FLOOR(value * 100.0) AS BIGINT) AS c FROM events),
        |vg AS (SELECT t, c, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
        |ex AS (SELECT DISTINCT t AS ex FROM v UNION ALL SELECT '_none'),
        |r AS (SELECT ex.ex, vg.c, SUM(vg.cnt) AS cnt
        |  FROM ex JOIN vg ON vg.t <> ex.ex GROUP BY 1, 2),
        |cum AS (SELECT ex, c,
        |    SUM(cnt) OVER (PARTITION BY ex ORDER BY c) AS cum,
        |    SUM(cnt) OVER (PARTITION BY ex) AS ntot FROM r),
        |q AS (SELECT ex, CAST(MAX(ntot) AS BIGINT) AS n_remaining,
        |    MIN(CASE WHEN 100 * cum >= 99 * ntot THEN c END) AS p99
        |  FROM cum GROUP BY 1)
        |SELECT q.ex AS excluded_type, q.n_remaining, q.p99 AS p99_cents,
        |  q.p99 - b.p99 AS delta_cents
        |FROM q JOIN (SELECT p99 FROM q WHERE ex = '_none') b ON TRUE
        |ORDER BY excluded_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val v = Tables(s, dir).events
        .select(col("event_type").as("t"),
          floor(col("value") * lit(100.0)).cast("long").as("c"))
      val vg = v.groupBy("t", "c").agg(count(lit(1)).as("cnt"))
      val ex = v.select(col("t")).distinct()
        .select(col("t").as("ex"))
        .unionAll(s.range(1).select(lit("_none").as("ex")))
      val r = broadcast(ex).join(vg, col("t") =!= col("ex"))
        .groupBy("ex", "c").agg(sum("cnt").as("cnt"))
      val w = Window.partitionBy("ex").orderBy("c")
      val cum = r
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("ntot", sum("cnt").over(Window.partitionBy("ex")))
      val q = cum.groupBy("ex")
        .agg(max("ntot").cast("long").as("n_remaining"),
          min(when(col("cum") * 100 >= col("ntot") * 99, col("c"))).as("p99"))
      val base = q.where(col("ex") === "_none")
        .select(col("p99").as("base_p99"))
      q.crossJoin(broadcast(base))
        .select(col("ex").as("excluded_type"), col("n_remaining"),
          col("p99").as("p99_cents"),
          (col("p99") - col("base_p99")).as("delta_cents"))
        .orderBy("excluded_type")
    },

    // HDR-style histogram of price cents: the power-of-two bucket is
    // length(bin(c)) − 1 — the binary-string length IS floor(log2), a
    // zero-libm integer identity both engines share — and each bucket
    // splits into 4 linear sub-buckets via (4c) div 2^b − 4. The
    // logarithmic layout keeps relative error ≤ 1/8 per cell with ~40
    // cells per decade of range; per-cell count/min/max plus the
    // cumulative ppm give the latency-report quantile surface in one
    // map-side-combinable aggregate (the histogram grain is fixed, so
    // merging shards is cell-wise addition — the HDR merge property).
    QueryDef.sql(
      "q454_hdr_histogram",
      """WITH v AS (SELECT CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS c
        |  FROM lineitem WHERE l_extendedprice > 0),
        |b AS (SELECT c, length(bin(c)) - 1 AS buck FROM v),
        |sb AS (SELECT buck,
        |    (4 * c) // (CAST(1 AS BIGINT) << buck) - 4 AS sub, c FROM b),
        |g AS (SELECT buck, sub, COUNT(*) AS n, MIN(c) AS min_c, MAX(c) AS max_c
        |  FROM sb GROUP BY 1, 2),
        |t AS (SELECT SUM(n) AS tot FROM g)
        |SELECT CAST(buck AS BIGINT) AS bucket, CAST(sub AS BIGINT) AS sub_bucket,
        |  n, min_c, max_c,
        |  CAST(1000000 * SUM(n) OVER (ORDER BY buck, sub) // tot AS BIGINT)
        |    AS cum_ppm
        |FROM g CROSS JOIN t ORDER BY bucket, sub_bucket""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val v = Tables(s, dir).lineitem
        .where(col("l_extendedprice") > 0)
        .select(floor(col("l_extendedprice") * lit(100.0)).cast("long").as("c"))
      val sb = v
        .withColumn("buck", (length(bin(col("c"))) - 1).cast("long"))
        .withColumn("sub",
          expr("(4 * c) div shiftleft(CAST(1 AS BIGINT), CAST(buck AS INT)) - 4"))
      val g = sb.groupBy("buck", "sub")
        .agg(count(lit(1)).as("n"), min("c").as("min_c"), max("c").as("max_c"))
      val t = g.agg(sum("n").as("tot"))
      g.crossJoin(broadcast(t))
        .select(col("buck").as("bucket"), col("sub").as("sub_bucket"),
          col("n"), col("min_c"), col("max_c"),
          expr("CAST(1000000 * SUM(n) OVER (ORDER BY buck, sub) div tot AS BIGINT)")
            .as("cum_ppm"))
        .orderBy("bucket", "sub_bucket")
    },

    // Greedy set cover for corpus source selection: pick the 5 sources
    // that together cover the most distinct bigrams, one argmax round at
    // a time (count of UNCOVERED bigrams per source → winner → its
    // bigrams join the covered set by anti-join). Five unrolled rounds —
    // the standard (1−1/e)-approximation, expressed as bounded dataflow
    // the way every "choose k representatives" curation pass should be:
    // per-round cost is one (source, bigram) aggregate over the
    // anti-joined remainder, never an enumeration of source subsets.
    QueryDef.sql(
      "q455_set_cover", {
        val base =
          """d0 AS (SELECT source, string_split(text, ' ') AS ws FROM documents
            |  WHERE len(string_split(text, ' ')) >= 2),
            |sb AS MATERIALIZED (SELECT DISTINCT source, bg FROM (
            |  SELECT source, UNNEST(list_transform(generate_series(1, len(ws) - 1),
            |    i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM d0))"""
            .stripMargin
        val rounds = (1 to 5).map { i =>
          val prevCov = if (i == 1) "" else
            s" WHERE bg NOT IN (SELECT bg FROM cov${i - 1})"
          val newCov = if (i == 1) s"SELECT bg FROM sb WHERE source = (SELECT src FROM w$i)"
          else s"SELECT bg FROM cov${i - 1} UNION SELECT bg FROM sb WHERE source = (SELECT src FROM w$i)"
          s"""g$i AS (SELECT source, COUNT(*) AS gain FROM sb$prevCov GROUP BY 1),
             |w$i AS (SELECT source AS src, gain FROM g$i
             |  ORDER BY gain DESC, source LIMIT 1),
             |cov$i AS MATERIALIZED ($newCov)""".stripMargin
        }.mkString(",\n")
        s"""WITH $base,
           |$rounds
           |SELECT 1 AS round, src AS source, CAST(gain AS BIGINT) AS gain,
           |  (SELECT COUNT(*) FROM cov1) AS covered FROM w1
           |UNION ALL SELECT 2, src, gain, (SELECT COUNT(*) FROM cov2) FROM w2
           |UNION ALL SELECT 3, src, gain, (SELECT COUNT(*) FROM cov3) FROM w3
           |UNION ALL SELECT 4, src, gain, (SELECT COUNT(*) FROM cov4) FROM w4
           |UNION ALL SELECT 5, src, gain, (SELECT COUNT(*) FROM cov5) FROM w5
           |ORDER BY round""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      val sb = Tables(s, dir).documents
        .select(col("source"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(ws) - 1)," +
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("bg"))
        .distinct()
      var covered: Option[DataFrame] = None
      var rows = Seq.empty[DataFrame]
      for (round <- 1 to 5) {
        val remaining = covered match {
          case None => sb
          case Some(c) => sb.join(c, Seq("bg"), "left_anti")
        }
        val w = remaining.groupBy("source").agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("source")).limit(1)
          .select(col("source").as("src"), col("gain"))
        val newCov = sb.join(w.select(col("src").as("source")), Seq("source"),
            "left_semi").select("bg")
        val cov = covered match {
          case None => newCov
          case Some(c) => c.unionAll(newCov).distinct()
        }
        covered = Some(cov)
        rows = rows :+ w.crossJoin(cov.agg(count(lit(1)).as("covered")))
          .select(lit(round).as("round"), col("src").as("source"),
            col("gain"), col("covered"))
      }
      rows.reduce(_ unionAll _).orderBy("round")
    },

    // Deterministic independent-cascade reach over the part co-order
    // graph: each (symmetrized) edge activates iff its md5 draw clears
    // 30%, and influence spreads 3 unrolled BFS rounds from the two
    // smallest part keys in the graph. The hash-gated edge filter prunes
    // BEFORE any traversal (70% of edges never enter a frontier join),
    // and each round is the q160 frontier shape — per-round census is
    // the result, so the query is deterministic short of convergence.
    QueryDef.sql(
      "q456_cascade_reach",
      """WITH ip AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.p AS a, b.p AS b
        |  FROM ip a JOIN ip b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |act AS MATERIALIZED (SELECT a, b FROM e0
        |  WHERE CAST(('0x' || substr(md5(a || '_' || b), 1, 6)) AS BIGINT)
        |    % 1000 < 300),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM act
        |  UNION SELECT b, a FROM act),
        |seeds AS (SELECT n FROM (SELECT a AS n FROM e0 UNION SELECT b FROM e0)
        |  ORDER BY n LIMIT 2),
        |f1 AS MATERIALIZED (SELECT DISTINCT e.dst AS n FROM e
        |  JOIN seeds ON e.src = seeds.n
        |  WHERE e.dst NOT IN (SELECT n FROM seeds)),
        |v1 AS (SELECT n FROM seeds UNION SELECT n FROM f1),
        |f2 AS MATERIALIZED (SELECT DISTINCT e.dst AS n FROM e
        |  JOIN f1 ON e.src = f1.n WHERE e.dst NOT IN (SELECT n FROM v1)),
        |v2 AS (SELECT n FROM v1 UNION SELECT n FROM f2),
        |f3 AS (SELECT DISTINCT e.dst AS n FROM e
        |  JOIN f2 ON e.src = f2.n WHERE e.dst NOT IN (SELECT n FROM v2))
        |SELECT 0 AS round, (SELECT COUNT(*) FROM seeds) AS newly_reached
        |UNION ALL SELECT 1, (SELECT COUNT(*) FROM f1)
        |UNION ALL SELECT 2, (SELECT COUNT(*) FROM f2)
        |UNION ALL SELECT 3, (SELECT COUNT(*) FROM f3)
        |ORDER BY round""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      val ip = Tables(s, dir).lineitem
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val ip2 = ip.select(col("o").as("o2"), col("p").as("p2"))
      val e0 = ip.join(ip2, col("o") === col("o2") && col("p") < col("p2"))
        .groupBy(col("p").as("a"), col("p2").as("b"))
        .agg(count(lit(1)).as("cnt")).where(col("cnt") >= 2)
        .select("a", "b")
      val act = e0.where(
        conv(substring(md5(concat(col("a"), lit("_"), col("b"))), 1, 6), 16, 10)
          .cast("long") % 1000 < 300)
      val e = act.select(col("a").as("src"), col("b").as("dst"))
        .union(act.select(col("b").as("src"), col("a").as("dst"))).distinct()
      val nodes = e0.select(col("a").as("n")).union(e0.select(col("b").as("n")))
        .distinct()
      val seeds = nodes.orderBy("n").limit(2)
      def expand(frontier: DataFrame, visited: DataFrame): DataFrame =
        e.join(frontier.withColumnRenamed("n", "src"), Seq("src"), "left_semi")
          .select(col("dst").as("n")).distinct()
          .join(visited, Seq("n"), "left_anti")
      val f1 = expand(seeds, seeds)
      val v1 = seeds.unionAll(f1).distinct()
      val f2 = expand(f1, v1)
      val v2 = v1.unionAll(f2).distinct()
      val f3 = expand(f2, v2)
      def cnt(round: Int, df: DataFrame) =
        df.agg(count(lit(1)).as("newly_reached"))
          .select(lit(round).as("round"), col("newly_reached"))
      cnt(0, seeds).unionAll(cnt(1, f1)).unionAll(cnt(2, f2)).unionAll(cnt(3, f3))
        .orderBy("round")
    },

    // LRU hit-ratio curve from exact reuse distances: for each warm
    // access (same user seen before), the stack distance is the number
    // of DISTINCT other keys touched since the previous access — counted
    // WITHOUT a distinct-per-interval scan via the last-occurrence
    // trick: key j in (prev, i) is counted iff its NEXT access is ≥ i
    // (each distinct key contributes exactly its final appearance).
    // LRU(C) hits an access iff distance < C; one interval join bounded
    // by Σ reuse distances (the locality of the trace itself) yields the
    // whole miss-ratio curve. Arrival order = event_id (documented).
    QueryDef.sql(
      "q457_lru_curve",
      """WITH a AS (SELECT user_id AS k, event_id AS pos FROM events),
        |w AS (SELECT k, pos,
        |    LAG(pos) OVER (PARTITION BY k ORDER BY pos) AS prev,
        |    LEAD(pos) OVER (PARTITION BY k ORDER BY pos) AS nxt
        |  FROM a),
        |iv AS (SELECT pos, prev FROM w WHERE prev IS NOT NULL),
        |d AS (SELECT iv.pos, COUNT(*) AS dist
        |  FROM iv JOIN w j ON j.pos > iv.prev AND j.pos < iv.pos
        |    AND (j.nxt IS NULL OR j.nxt >= iv.pos)
        |  GROUP BY 1),
        |warm AS (SELECT iv.pos, COALESCE(d.dist, 0) AS dist
        |  FROM iv LEFT JOIN d ON iv.pos = d.pos),
        |t AS (SELECT COUNT(*) AS n_warm FROM warm),
        |cold AS (SELECT COUNT(*) AS n_cold FROM w WHERE prev IS NULL)
        |SELECT CAST(n_warm AS BIGINT) AS n_warm, CAST(n_cold AS BIGINT) AS n_cold,
        |  CAST(1000000 * (SELECT COUNT(*) FROM warm WHERE dist < 4) // n_warm
        |    AS BIGINT) AS hit4_ppm,
        |  CAST(1000000 * (SELECT COUNT(*) FROM warm WHERE dist < 16) // n_warm
        |    AS BIGINT) AS hit16_ppm,
        |  CAST(1000000 * (SELECT COUNT(*) FROM warm WHERE dist < 64) // n_warm
        |    AS BIGINT) AS hit64_ppm
        |FROM t CROSS JOIN cold""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val a = Tables(s, dir).events
        .select(col("user_id").as("k"), col("event_id").as("pos"))
      val wk = Window.partitionBy("k").orderBy("pos")
      val w = a.withColumn("prev", lag("pos", 1).over(wk))
        .withColumn("nxt", lead("pos", 1).over(wk))
      val iv = w.where(col("prev").isNotNull).select(col("pos"), col("prev"))
      val j = w.select(col("pos").as("jpos"), col("nxt"))
      // banded range join: a bare non-equi join would plan as a nested
      // loop over |accesses|² — banding on pos div 1024 gives the hash
      // join an equi key, and each interval explodes into O(gap/1024)+1
      // bands, so join volume tracks Σ reuse distances (trace locality)
      val ivb = iv.withColumn("blk",
        explode(expr("sequence(prev div 1024, pos div 1024)")))
      val jb = j.withColumn("blk", expr("jpos div 1024"))
      val d = ivb.join(jb, Seq("blk"))
        .where(col("jpos") > col("prev") && col("jpos") < col("pos") &&
          (col("nxt").isNull || col("nxt") >= col("pos")))
        .groupBy("pos").agg(count(lit(1)).as("dist"))
      val warm = iv.join(d, Seq("pos"), "left")
        .select(col("pos"), coalesce(col("dist"), lit(0L)).as("dist"))
      val agg = warm.agg(count(lit(1)).as("n_warm"),
        sum(when(col("dist") < 4, 1).otherwise(0)).as("h4"),
        sum(when(col("dist") < 16, 1).otherwise(0)).as("h16"),
        sum(when(col("dist") < 64, 1).otherwise(0)).as("h64"))
      val cold = w.where(col("prev").isNull).agg(count(lit(1)).as("n_cold"))
      agg.crossJoin(cold)
        .select(col("n_warm"), col("n_cold"),
          expr("CAST(1000000 * h4 div n_warm AS BIGINT)").as("hit4_ppm"),
          expr("CAST(1000000 * h16 div n_warm AS BIGINT)").as("hit16_ppm"),
          expr("CAST(1000000 * h64 div n_warm AS BIGINT)").as("hit64_ppm"))
    },

    // Hilbert-curve vs Morton (Z-order) locality on a 16×16 key grid —
    // the layout-advisor companion to q282's z-order clustering. The
    // xy→d Hilbert mapping is FOUR UNROLLED quadrant steps, each a pure
    // integer CASE (the (3rx XOR ry) quadrant offsets are enumerated
    // literally; the rotation updates (x,y) by reflection/swap) — no
    // loops, no state, bit-identical on both engines (verified against
    // the textbook recursive xy2d: identical 256-cell bijection). The
    // verdict is the SEQUENTIAL-SCAN metric that matters for clustered
    // storage: Manhattan distance between CONSECUTIVE curve indices —
    // Hilbert steps are provably always 1 (every next index is a
    // spatial neighbor, so a curve-ordered scan walks contiguous
    // blocks), while Morton's bit-interleave jumps up to 2^k cells at
    // quadrant boundaries. (On the converse metric — index gap between
    // spatially ADJACENT cells — Morton actually wins; the spec pins
    // both directions.)
    QueryDef.sql(
      "q458_hilbert_curve", {
        def step(s: Int, sq: Int) =
          s"""SELECT d + $sq * (CASE
             |    WHEN (x // $s) % 2 = 0 AND (y // $s) % 2 = 0 THEN 0
             |    WHEN (x // $s) % 2 = 0 AND (y // $s) % 2 = 1 THEN 1
             |    WHEN (x // $s) % 2 = 1 AND (y // $s) % 2 = 1 THEN 2
             |    ELSE 3 END) AS nd,
             |  CASE WHEN (y // $s) % 2 = 0 THEN
             |    (CASE WHEN (x // $s) % 2 = 1 THEN ($s - 1 - (y % $s)) ELSE y % $s END)
             |    ELSE x % $s END AS nx,
             |  CASE WHEN (y // $s) % 2 = 0 THEN
             |    (CASE WHEN (x // $s) % 2 = 1 THEN ($s - 1 - (x % $s)) ELSE x % $s END)
             |    ELSE y % $s END AS ny""".stripMargin
        s"""WITH g AS (SELECT gx.x, gy.y, CAST(0 AS BIGINT) AS d
           |  FROM (SELECT UNNEST(generate_series(0, 15)) AS x) gx,
           |       (SELECT UNNEST(generate_series(0, 15)) AS y) gy),
           |s1 AS (SELECT gx0 AS x0, gy0 AS y0, nx AS x, ny AS y, nd AS d FROM (
           |  SELECT x AS gx0, y AS gy0, t.* FROM g, LATERAL (${step(8, 64)}) t)),
           |s2 AS (SELECT x0, y0, nx AS x, ny AS y, nd AS d FROM (
           |  SELECT x0, y0, t.* FROM s1, LATERAL (${step(4, 16)}) t)),
           |s3 AS (SELECT x0, y0, nx AS x, ny AS y, nd AS d FROM (
           |  SELECT x0, y0, t.* FROM s2, LATERAL (${step(2, 4)}) t)),
           |s4 AS (SELECT x0, y0, nd AS d FROM (
           |  SELECT x0, y0, t.* FROM s3, LATERAL (${step(1, 1)}) t)),
           |m AS (SELECT x0, y0, s4.d AS hd,
           |    CAST(((x0 // 8) % 2) * 128 + ((y0 // 8) % 2) * 64
           |      + ((x0 // 4) % 2) * 32 + ((y0 // 4) % 2) * 16
           |      + ((x0 // 2) % 2) * 8 + ((y0 // 2) % 2) * 4
           |      + (x0 % 2) * 2 + (y0 % 2) AS BIGINT) AS md
           |  FROM s4),
           |hstep AS (SELECT ABS(a.x0 - b.x0) + ABS(a.y0 - b.y0) AS dist
           |  FROM m a JOIN m b ON b.hd = a.hd + 1),
           |mstep AS (SELECT ABS(a.x0 - b.x0) + ABS(a.y0 - b.y0) AS dist
           |  FROM m a JOIN m b ON b.md = a.md + 1),
           |adj AS (SELECT ABS(a.hd - b.hd) AS hgap, ABS(a.md - b.md) AS mgap
           |  FROM m a JOIN m b ON b.x0 = a.x0 + 1 AND b.y0 = a.y0)
           |SELECT 'hilbert' AS curve,
           |  (SELECT CAST(1000 * SUM(dist) // COUNT(*) AS BIGINT) FROM hstep)
           |    AS mean_step_dist_milli,
           |  (SELECT CAST(MAX(dist) AS BIGINT) FROM hstep) AS max_step_dist,
           |  (SELECT CAST(1000 * SUM(hgap) // COUNT(*) AS BIGINT) FROM adj)
           |    AS mean_adj_gap_milli
           |UNION ALL
           |SELECT 'morton',
           |  (SELECT CAST(1000 * SUM(dist) // COUNT(*) AS BIGINT) FROM mstep),
           |  (SELECT CAST(MAX(dist) AS BIGINT) FROM mstep),
           |  (SELECT CAST(1000 * SUM(mgap) // COUNT(*) AS BIGINT) FROM adj)
           |ORDER BY curve""".stripMargin
      }) { (s, dir) =>
      def stepCols(df: org.apache.spark.sql.DataFrame, sv: Int, sq: Int) = df
        .withColumn("d", col("d") + lit(sq) * expr(
          s"""CASE
             | WHEN (x div $sv) % 2 = 0 AND (y div $sv) % 2 = 0 THEN 0
             | WHEN (x div $sv) % 2 = 0 AND (y div $sv) % 2 = 1 THEN 1
             | WHEN (x div $sv) % 2 = 1 AND (y div $sv) % 2 = 1 THEN 2
             | ELSE 3 END""".stripMargin))
        .withColumn("nx", expr(
          s"""CASE WHEN (y div $sv) % 2 = 0 THEN
             |  (CASE WHEN (x div $sv) % 2 = 1 THEN ($sv - 1 - (y % $sv))
             |   ELSE y % $sv END)
             | ELSE x % $sv END""".stripMargin))
        .withColumn("ny", expr(
          s"""CASE WHEN (y div $sv) % 2 = 0 THEN
             |  (CASE WHEN (x div $sv) % 2 = 1 THEN ($sv - 1 - (x % $sv))
             |   ELSE x % $sv END)
             | ELSE y % $sv END""".stripMargin))
        .drop("x", "y")
        .withColumnRenamed("nx", "x").withColumnRenamed("ny", "y")
      val g = s.range(16).select(col("id").as("x"))
        .crossJoin(s.range(16).select(col("id").as("y")))
        .withColumn("d", lit(0L))
        .withColumn("x0", col("x")).withColumn("y0", col("y"))
      val s4 = Seq((8, 64), (4, 16), (2, 4), (1, 1))
        .foldLeft(g) { case (df, (sv, sq)) => stepCols(df, sv, sq) }
      val m = s4.select(col("x0"), col("y0"), col("d").as("hd"),
        expr("CAST(((x0 div 8) % 2) * 128 + ((y0 div 8) % 2) * 64" +
          " + ((x0 div 4) % 2) * 32 + ((y0 div 4) % 2) * 16" +
          " + ((x0 div 2) % 2) * 8 + ((y0 div 2) % 2) * 4" +
          " + (x0 % 2) * 2 + (y0 % 2) AS BIGINT)").as("md"))
      val b = m.select(col("x0").as("bx"), col("y0").as("by"),
        col("hd").as("h2"), col("md").as("m2"))
      def stepStats(joinCond: org.apache.spark.sql.Column, name: String) = m
        .join(b, joinCond)
        .select((abs(col("x0") - col("bx")) + abs(col("y0") - col("by"))).as("dist"))
        .agg(expr("CAST(1000 * SUM(dist) div COUNT(*) AS BIGINT)")
            .as("mean_step_dist_milli"),
          expr("CAST(MAX(dist) AS BIGINT)").as("max_step_dist"))
        .select(lit(name).as("curve"), col("mean_step_dist_milli"),
          col("max_step_dist"))
      val adjGap = m.join(b, col("bx") === col("x0") + 1 && col("by") === col("y0"))
        .agg(expr("CAST(1000 * SUM(ABS(hd - h2)) div COUNT(*) AS BIGINT)").as("hgap"),
          expr("CAST(1000 * SUM(ABS(md - m2)) div COUNT(*) AS BIGINT)").as("mgap"))
      val h = stepStats(col("h2") === col("hd") + 1, "hilbert")
        .crossJoin(broadcast(adjGap.select(col("hgap").as("mean_adj_gap_milli"))))
      val mo = stepStats(col("m2") === col("md") + 1, "morton")
        .crossJoin(broadcast(adjGap.select(col("mgap").as("mean_adj_gap_milli"))))
      h.unionAll(mo).orderBy("curve")
    },

    // Selinger-style join-order advisor for the lineitem ⋈ orders ⋈
    // customer chain: exact base cardinalities and key NDVs feed the
    // System R estimate |A⋈B| = |A|·|B| / max(ndv_A, ndv_B) for the two
    // CONNECTED orders (starting with the cross join is never
    // enumerated), and the winner is the order with the smaller
    // intermediate. The stats pass is three aggregates; the enumeration
    // is metadata — exactly how a cost-based optimizer prices a join
    // tree, expressed as a query over its own catalog statistics.
    QueryDef.sql(
      "q459_join_order_advisor",
      """WITH ls AS (SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS ndv_ok
        |  FROM lineitem),
        |os AS (SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS ndv_ok,
        |    COUNT(DISTINCT o_custkey) AS ndv_ck FROM orders),
        |cs AS (SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS ndv_ck
        |  FROM customer),
        |est AS (SELECT
        |    CAST(ls.n * os.n // GREATEST(ls.ndv_ok, os.ndv_ok) AS BIGINT) AS lo_size,
        |    CAST(os.n * cs.n // GREATEST(os.ndv_ck, cs.ndv_ck) AS BIGINT) AS oc_size,
        |    ls.n AS ln, os.n AS osn, cs.n AS cn,
        |    GREATEST(os.ndv_ck, cs.ndv_ck) AS d1, GREATEST(ls.ndv_ok, os.ndv_ok) AS d2
        |  FROM ls, os, cs),
        |plans AS (
        |  SELECT '(lineitem JOIN orders) JOIN customer' AS plan,
        |    lo_size AS est_intermediate,
        |    CAST(lo_size * cn // d1 AS BIGINT) AS est_final FROM est
        |  UNION ALL
        |  SELECT '(orders JOIN customer) JOIN lineitem',
        |    oc_size, CAST(oc_size * ln // d2 AS BIGINT) FROM est)
        |SELECT plan, est_intermediate, est_final,
        |  CAST(CASE WHEN est_intermediate = (SELECT MIN(est_intermediate) FROM plans)
        |    THEN 1 ELSE 0 END AS BIGINT) AS chosen
        |FROM plans ORDER BY plan""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val ls = t.lineitem.agg(count(lit(1)).as("ln"),
        countDistinct("l_orderkey").as("l_ndv_ok"))
      val os_ = t.orders.agg(count(lit(1)).as("osn"),
        countDistinct("o_orderkey").as("o_ndv_ok"),
        countDistinct("o_custkey").as("o_ndv_ck"))
      val cs = t.customer.agg(count(lit(1)).as("cn"),
        countDistinct("c_custkey").as("c_ndv_ck"))
      val est = ls.crossJoin(os_).crossJoin(cs)
        .select(
          expr("CAST(ln * osn div GREATEST(l_ndv_ok, o_ndv_ok) AS BIGINT)")
            .as("lo_size"),
          expr("CAST(osn * cn div GREATEST(o_ndv_ck, c_ndv_ck) AS BIGINT)")
            .as("oc_size"),
          col("ln"), col("cn"),
          expr("GREATEST(o_ndv_ck, c_ndv_ck)").as("d1"),
          expr("GREATEST(l_ndv_ok, o_ndv_ok)").as("d2"))
      val plans = est.select(
          lit("(lineitem JOIN orders) JOIN customer").as("plan"),
          col("lo_size").as("est_intermediate"),
          expr("CAST(lo_size * cn div d1 AS BIGINT)").as("est_final"))
        .unionAll(est.select(
          lit("(orders JOIN customer) JOIN lineitem").as("plan"),
          col("oc_size").as("est_intermediate"),
          expr("CAST(oc_size * ln div d2 AS BIGINT)").as("est_final")))
      val best = plans.agg(min("est_intermediate").as("best"))
      plans.crossJoin(broadcast(best))
        .select(col("plan"), col("est_intermediate"), col("est_final"),
          when(col("est_intermediate") === col("best"), 1L).otherwise(0L)
            .as("chosen"))
        .orderBy("plan")
    },

    // Distribution-free median confidence interval per event type: the
    // order-statistic CI [r_lo, r_hi] with r = (n ∓ 1.96√n)/2 — the
    // binomial-quantile normal approximation in milli-exact integers.
    // √n is the FLOOR-adjusted IEEE sqrt (s−1 when s² > n, so the
    // integer sqrt is exact even at the ulp boundary — both engines
    // compute the identical double first). Rank extraction is the
    // distributed rank-index filter (no per-group collect), three
    // probes per group in one window pass.
    QueryDef.sql(
      "q460_median_ci",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100.0) AS BIGINT) AS c FROM events),
        |n AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1),
        |sq AS (SELECT event_type, n,
        |    CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM n),
        |sqa AS (SELECT event_type, n,
        |    s0 - CASE WHEN s0 * s0 > n THEN 1 ELSE 0 END AS s FROM sq),
        |rk AS (SELECT event_type, n, s,
        |    GREATEST((1000 * n - 1960 * s) // 2000, 1) AS r_lo,
        |    (n + 1) // 2 AS r_med,
        |    LEAST((1000 * n + 1960 * s) // 2000 + 1, n) AS r_hi
        |  FROM sqa),
        |o AS (SELECT e.event_type, c,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_type ORDER BY c) AS rn
        |  FROM e)
        |SELECT rk.event_type AS event_type, CAST(rk.n AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN o.rn = rk.r_lo THEN o.c END) AS BIGINT) AS ci_lo_cents,
        |  CAST(MIN(CASE WHEN o.rn = rk.r_med THEN o.c END) AS BIGINT) AS median_cents,
        |  CAST(MIN(CASE WHEN o.rn = rk.r_hi THEN o.c END) AS BIGINT) AS ci_hi_cents
        |FROM rk JOIN o ON rk.event_type = o.event_type
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("c"))
      val rk = e.groupBy("event_type").agg(count(lit(1)).as("n"))
        .withColumn("s0", expr("CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)"))
        .withColumn("s", expr("s0 - CASE WHEN s0 * s0 > n THEN 1 ELSE 0 END"))
        .select(col("event_type"), col("n"),
          expr("GREATEST((1000 * n - 1960 * s) div 2000, 1)").as("r_lo"),
          expr("(n + 1) div 2").as("r_med"),
          expr("LEAST((1000 * n + 1960 * s) div 2000 + 1, n)").as("r_hi"))
      val o = e.withColumn("rn", row_number()
        .over(Window.partitionBy("event_type").orderBy("c")))
      o.join(broadcast(rk), "event_type")
        .groupBy(col("event_type"), col("n"))
        .agg(min(when(col("rn") === col("r_lo"), col("c"))).as("ci_lo_cents"),
          min(when(col("rn") === col("r_med"), col("c"))).as("median_cents"),
          min(when(col("rn") === col("r_hi"), col("c"))).as("ci_hi_cents"))
        .orderBy("event_type")
    },

    // Sequential-peeking bias audit: a fixed-horizon A/B test (treat =
    // odd custkey) evaluated at every month-end checkpoint with the
    // fully-integer z² test (cumulative sums only: significant iff
    // 100·(nC·ST − nT·SC)² > 384·V·(nT+nC)·nT·nC with V the global
    // variance numerator — q341's squared-comparison idiom at two-sample
    // scale, DECIMAL(38,0)-exact). The flip count across checkpoints IS
    // the peeking hazard: each sign change is a would-be early stop that
    // later reverses. One month-grain cumulative window over exact cell
    // sums — no per-checkpoint rescan of the fact table.
    QueryDef.sql(
      "q461_peeking_bias",
      """WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |    o_custkey % 2 AS treat,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |vg AS (SELECT COUNT(*) AS nn, SUM(cents) AS sx,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS sxx FROM o),
        |v AS (SELECT CAST((CAST(nn AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
        |    // (CAST(nn AS HUGEINT) * nn) AS BIGINT) AS vi FROM vg),
        |m AS (SELECT mon, treat, COUNT(*) AS n, SUM(cents) AS sc
        |  FROM o GROUP BY 1, 2),
        |c AS (SELECT mon,
        |    SUM(CASE WHEN treat = 1 THEN n ELSE 0 END)
        |      OVER (ORDER BY mon) AS nt,
        |    SUM(CASE WHEN treat = 1 THEN sc ELSE 0 END)
        |      OVER (ORDER BY mon) AS st,
        |    SUM(CASE WHEN treat = 0 THEN n ELSE 0 END)
        |      OVER (ORDER BY mon) AS nc,
        |    SUM(CASE WHEN treat = 0 THEN sc ELSE 0 END)
        |      OVER (ORDER BY mon) AS scc
        |  FROM m),
        |cd AS (SELECT DISTINCT mon, nt, st, nc, scc FROM c),
        |sig AS (SELECT mon, nt, nc,
        |    CASE WHEN 100 * (CAST(nc AS HUGEINT) * st - CAST(nt AS HUGEINT) * scc)
        |        * (CAST(nc AS HUGEINT) * st - CAST(nt AS HUGEINT) * scc)
        |      > 384 * CAST(vi AS HUGEINT) * (nt + nc) * nt * nc
        |      THEN 1 ELSE 0 END AS significant
        |  FROM cd CROSS JOIN v WHERE nt > 0 AND nc > 0),
        |fl AS (SELECT mon, nt, nc, significant,
        |    ABS(significant - COALESCE(LAG(significant) OVER (ORDER BY mon),
        |      significant)) AS flip
        |  FROM sig)
        |SELECT mon AS month, CAST(nt AS BIGINT) AS n_treat,
        |  CAST(nc AS BIGINT) AS n_control,
        |  CAST(significant AS BIGINT) AS significant,
        |  CAST(SUM(flip) OVER (ORDER BY mon) AS BIGINT) AS flips_so_far
        |FROM fl ORDER BY month""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables(s, dir).orders
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
          (col("o_custkey") % 2).as("treat"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      val v = o.agg(count(lit(1)).as("nn"), sum("cents").as("sx"),
          sum(col("cents").cast("decimal(38,0)") * col("cents")).as("sxx"))
        .select(expr("CAST((CAST(nn AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx)" +
          " div (CAST(nn AS DECIMAL(38,0)) * nn) AS BIGINT)").as("vi"))
      val m = o.groupBy("mon", "treat")
        .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
      val wc = Window.orderBy("mon")
      val cd = m.select(col("mon"),
          sum(when(col("treat") === 1, col("n")).otherwise(0L)).over(wc).as("nt"),
          sum(when(col("treat") === 1, col("sc")).otherwise(0L)).over(wc).as("st"),
          sum(when(col("treat") === 0, col("n")).otherwise(0L)).over(wc).as("nc"),
          sum(when(col("treat") === 0, col("sc")).otherwise(0L)).over(wc).as("scc"))
        .distinct()
      val sig = cd.crossJoin(broadcast(v))
        .where(col("nt") > 0 && col("nc") > 0)
        .select(col("mon"), col("nt"), col("nc"),
          expr("CASE WHEN 100 * (CAST(nc AS DECIMAL(38,0)) * st" +
            " - CAST(nt AS DECIMAL(38,0)) * scc)" +
            " * (CAST(nc AS DECIMAL(38,0)) * st - CAST(nt AS DECIMAL(38,0)) * scc)" +
            " > 384 * CAST(vi AS DECIMAL(38,0)) * (nt + nc) * nt * nc" +
            " THEN 1 ELSE 0 END").as("significant"))
      val wm = Window.orderBy("mon")
      sig
        .withColumn("flip", abs(col("significant") -
          coalesce(lag("significant", 1).over(wm), col("significant"))))
        .select(col("mon").as("month"), col("nt").cast("long").as("n_treat"),
          col("nc").cast("long").as("n_control"),
          col("significant").cast("long").as("significant"),
          sum("flip").over(wm).cast("long").as("flips_so_far"))
        .orderBy("month")
    },

    // Delete-one jackknife variance of a ratio estimator (revenue cents
    // per unit shipped, per return flag) — the standard SE machinery for
    // non-linear statistics where the CLT plug-in doesn't apply. The
    // leave-one-out ratios θ_i = (Sx−x_i)/(Sy−y_i) need only the GROUP
    // sums: one map-side-combined aggregate, a 3-row broadcast back onto
    // the fact table, then a second combine of Σθ and Σθ² — two linear
    // passes, no per-replicate rescan (the naive jackknife is O(n²)).
    // All-integer: θ in ×10³ milli-units via DECIMAL(38,0) div, variance
    // as ((n−1)(nΣθ²−(Σθ)²)) div n³ — HUGEINT/DECIMAL exact both engines.
    QueryDef.sql(
      "q462_jackknife_ratio",
      """WITH l AS (SELECT l_returnflag AS rf,
        |    CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS x,
        |    CAST(l_quantity AS BIGINT) AS y FROM lineitem),
        |g AS (SELECT rf, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy
        |  FROM l GROUP BY 1),
        |th AS (SELECT l.rf,
        |    CAST(1000 * (CAST(g.sx AS HUGEINT) - l.x) // (g.sy - l.y)
        |      AS BIGINT) AS t
        |  FROM l JOIN g ON l.rf = g.rf),
        |a AS (SELECT rf, COUNT(*) AS n, SUM(CAST(t AS HUGEINT)) AS tt,
        |    SUM(CAST(t AS HUGEINT) * t) AS q FROM th GROUP BY 1)
        |SELECT a.rf AS returnflag, CAST(a.n AS BIGINT) AS n,
        |  CAST(1000 * CAST(g.sx AS HUGEINT) // g.sy AS BIGINT) AS ratio_milli,
        |  CAST((CAST(a.n - 1 AS HUGEINT) * (a.n * q - tt * tt))
        |    // (CAST(a.n AS HUGEINT) * a.n * a.n) AS BIGINT) AS var_jack_milli2
        |FROM a JOIN g ON a.rf = g.rf ORDER BY 1""".stripMargin) { (s, dir) =>
      val l = Tables(s, dir).lineitem
        .select(col("l_returnflag").as("rf"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
      val g = l.groupBy("rf")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
      val th = l.join(broadcast(g), "rf")
        .select(col("rf"), col("n"), col("sx"), col("sy"),
          expr("CAST((1000 * (CAST(sx AS DECIMAL(38,0)) - x)) div (sy - y) AS BIGINT)")
            .as("t"))
      th.groupBy("rf", "n", "sx", "sy")
        .agg(sum(col("t").cast("decimal(38,0)")).as("tt"),
          sum(col("t").cast("decimal(38,0)") * col("t")).as("q"))
        .select(col("rf").as("returnflag"), col("n"),
          expr("CAST((1000 * CAST(sx AS DECIMAL(38,0))) div sy AS BIGINT)")
            .as("ratio_milli"),
          expr("CAST((CAST(n - 1 AS DECIMAL(38,0)) * (n * q - tt * tt))" +
            " div (CAST(n AS DECIMAL(38,0)) * n * n) AS BIGINT)")
            .as("var_jack_milli2"))
        .orderBy("returnflag")
    },

    // Good-Turing frequency smoothing over the document corpus: the
    // frequency-of-frequencies table N_r and the adjusted count
    // r* = (r+1)·N_{r+1}/N_r — the classical LM discounting step (and
    // the standard estimator for unseen-vocabulary mass N_1/N). The
    // heavy part (per-token counts) is one map-side-combined aggregate;
    // N_r collapses that to a table whose size is the number of DISTINCT
    // frequencies (≲ √corpus by Heaps/Zipf), so the LEAD window runs on
    // a broadcast-sized frame no matter the corpus scale. r* is emitted
    // only when N_{r+1} exists (contiguity sentinel −1 otherwise) —
    // ×10⁶ integer division, engine-exact.
    QueryDef.sql(
      "q463_good_turing",
      """WITH nrm AS (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
        |  FROM documents),
        |tok AS (SELECT unnest(string_split(nt, ' ')) AS term FROM nrm),
        |tc AS (SELECT term, COUNT(*) AS r FROM tok WHERE len(term) > 0 GROUP BY 1),
        |ff AS (SELECT r, COUNT(*) AS nr FROM tc GROUP BY 1),
        |w AS (SELECT r, nr, LEAD(r) OVER (ORDER BY r) AS rn,
        |    LEAD(nr) OVER (ORDER BY r) AS nr1 FROM ff)
        |SELECT r, CAST(nr AS BIGINT) AS n_r,
        |  CAST(CASE WHEN rn = r + 1
        |    THEN (1000000 * CAST(r + 1 AS HUGEINT) * nr1) // nr
        |    ELSE -1 END AS BIGINT) AS r_star_ppm
        |FROM w ORDER BY r LIMIT 15""".stripMargin) { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(explode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "))
          .as("term"))
        .where(length(col("term")) > 0)
      val ff = toks.groupBy("term").agg(count(lit(1)).as("r"))
        .groupBy("r").agg(count(lit(1)).as("nr"))
      val w = Window.orderBy("r")
      ff.select(col("r"), col("nr"),
          lead("r", 1).over(w).as("rn"), lead("nr", 1).over(w).as("nr1"))
        .select(col("r"), col("nr").as("n_r"),
          when(col("rn") === col("r") + 1,
            expr("CAST((1000000 * CAST(r + 1 AS DECIMAL(38,0)) * nr1) div nr AS BIGINT)"))
            .otherwise(lit(-1L)).as("r_star_ppm"))
        .orderBy("r").limit(15)
    },

    // Capture-recapture population estimate (Lincoln-Petersen + the
    // bias-corrected Chapman form): treat the 1994 and 1995 active
    // customer sets as two independent "captures" and estimate the total
    // ever-active population from the overlap — the survey-sampling way
    // to size an entity population you can't scan (and a cheap dedup-
    // coverage audit: compare N̂ against the known distinct count). One
    // pass over orders builds per-customer capture flags (map-side
    // combine on custkey), one tiny aggregate produces n1/n2/m — no
    // distinct-set join materialization at any scale.
    QueryDef.sql(
      "q464_capture_recapture",
      """WITH f AS (SELECT o_custkey,
        |    MAX(CASE WHEN year(o_orderdate) = 1994 THEN 1 ELSE 0 END) AS f1,
        |    MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS f2
        |  FROM orders GROUP BY 1),
        |a AS (SELECT SUM(f1) AS n1, SUM(f2) AS n2, SUM(f1 * f2) AS m,
        |    COUNT(*) AS true_n FROM f)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(m AS BIGINT) AS n_both,
        |  CAST(CASE WHEN m > 0 THEN CAST(n1 AS HUGEINT) * n2 // m ELSE -1 END
        |    AS BIGINT) AS lincoln_petersen,
        |  CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) // (m + 1) - 1
        |    AS BIGINT) AS chapman,
        |  CAST(true_n AS BIGINT) AS true_n
        |FROM a""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir).orders
        .groupBy("o_custkey")
        .agg(max(when(year(col("o_orderdate")) === 1994, 1L).otherwise(0L)).as("f1"),
          max(when(year(col("o_orderdate")) === 1995, 1L).otherwise(0L)).as("f2"))
      f.agg(sum("f1").as("n1"), sum("f2").as("n2"),
          sum(col("f1") * col("f2")).as("m"), count(lit(1)).as("true_n"))
        .select(col("n1"), col("n2"), col("m").as("n_both"),
          when(col("m") > 0,
            expr("CAST((CAST(n1 AS DECIMAL(38,0)) * n2) div m AS BIGINT)"))
            .otherwise(lit(-1L)).as("lincoln_petersen"),
          expr("CAST((CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1)) div (m + 1) - 1 AS BIGINT)")
            .as("chapman"),
          col("true_n"))
    },

    // Maximal-marginal-relevance diversified top-k (Carbonell-Goldstein):
    // greedily pick 4 results from the top-8 relevance pool, each pick
    // maximizing λ·rel − (1−λ)·max-sim-to-selected (λ=0.7) — the
    // standard retrieval re-ranker that trades relevance against
    // redundancy. Scale shape: the corpus-wide work is ONE brute-force
    // scan for the relevance top-8 (TakeOrdered, no shuffle of the
    // corpus); everything after — 28 pairwise scaled cosines and 4
    // unrolled argmax steps — runs on the cached 8-row pool, so the
    // greedy loop's cost is independent of corpus size. Scores are exact
    // ints: ×10⁶ cosines, mmr = (7·rel − 3·maxsim) div 10.
    QueryDef.sql(
      "q465_mmr_diversify",
      """WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |ev AS (SELECT e.vec_id, i,
        |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
        |    CAST(FLOOR(CAST(qv.q[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
        |  FROM embeddings e, qv, generate_series(1, 64) t(i) WHERE e.vec_id <> 0),
        |d AS (SELECT vec_id, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
        |  FROM ev GROUP BY 1),
        |pool AS (SELECT vec_id,
        |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE)
        |      / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS rel
        |  FROM d ORDER BY rel DESC, vec_id LIMIT 8),
        |pev AS (SELECT p.vec_id, ev.i, ev.x FROM pool p JOIN ev ON p.vec_id = ev.vec_id),
        |pd AS (SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.x * b.x) AS dxy
        |  FROM pev a JOIN pev b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
        |pn AS (SELECT vec_id, SUM(x*x) AS dxx FROM pev GROUP BY 1),
        |sim AS (SELECT va, vb,
        |    CAST(FLOOR(1000000.0 * CAST(pd.dxy AS DOUBLE)
        |      / (sqrt(CAST(na.dxx AS DOUBLE)) * sqrt(CAST(nb.dxx AS DOUBLE)))) AS BIGINT) AS s
        |  FROM pd JOIN pn na ON pd.va = na.vec_id JOIN pn nb ON pd.vb = nb.vec_id),
        |sim2 AS (SELECT va, vb, s FROM sim UNION ALL SELECT vb, va, s FROM sim),
        |s1 AS (SELECT vec_id, rel, CAST(0 AS BIGINT) AS ms FROM pool
        |  ORDER BY rel DESC, vec_id LIMIT 1),
        |c2 AS (SELECT p.vec_id, p.rel, MAX(s.s) AS ms FROM pool p
        |  JOIN sim2 s ON s.va = p.vec_id AND s.vb IN (SELECT vec_id FROM s1)
        |  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1) GROUP BY 1, 2),
        |s2 AS (SELECT vec_id, rel, ms FROM c2
        |  ORDER BY 7 * rel - 3 * ms DESC, vec_id LIMIT 1),
        |c3 AS (SELECT p.vec_id, p.rel, MAX(s.s) AS ms FROM pool p
        |  JOIN sim2 s ON s.va = p.vec_id
        |    AND s.vb IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)
        |  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)
        |  GROUP BY 1, 2),
        |s3 AS (SELECT vec_id, rel, ms FROM c3
        |  ORDER BY 7 * rel - 3 * ms DESC, vec_id LIMIT 1),
        |c4 AS (SELECT p.vec_id, p.rel, MAX(s.s) AS ms FROM pool p
        |  JOIN sim2 s ON s.va = p.vec_id
        |    AND s.vb IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
        |      UNION SELECT vec_id FROM s3)
        |  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
        |      UNION SELECT vec_id FROM s3)
        |  GROUP BY 1, 2),
        |s4 AS (SELECT vec_id, rel, ms FROM c4
        |  ORDER BY 7 * rel - 3 * ms DESC, vec_id LIMIT 1)
        |SELECT pick, vec_id, rel AS rel_scaled,
        |  CAST((7 * rel - 3 * ms) // 10 AS BIGINT) AS mmr_deci
        |FROM (SELECT CAST(1 AS BIGINT) AS pick, vec_id, rel, ms FROM s1
        |  UNION ALL SELECT 2, vec_id, rel, ms FROM s2
        |  UNION ALL SELECT 3, vec_id, rel, ms FROM s3
        |  UNION ALL SELECT 4, vec_id, rel, ms FROM s4) f
        |ORDER BY pick""".stripMargin) { (s, dir) =>
      import graft.operators.Similarity
      val e = Tables(s, dir).embeddings
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("q"))
      val pool = e.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"),
          Similarity.cosineScaled(col("embedding"), col("q")).as("rel"))
        .orderBy(col("rel").desc, col("vec_id").asc).limit(8)
        .cache()
      val half = pool.as("a").join(pool.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          Similarity.cosineScaled(col("a.embedding"), col("b.embedding")).as("s"))
      val sim2 = half.unionAll(half.select(col("vb").as("va"), col("va").as("vb"), col("s")))
        .cache()
      var picks = pool.orderBy(col("rel").desc, col("vec_id").asc).limit(1)
        .select(lit(1L).as("pick"), col("vec_id"), col("rel"), lit(0L).as("ms"))
      for (i <- 2 to 4) {
        val selIds = picks.select("vec_id")
        val ms = sim2.join(selIds.select(col("vec_id").as("vb")), Seq("vb"), "left_semi")
          .groupBy(col("va").as("vec_id")).agg(max("s").as("ms"))
        val next = pool.join(selIds, Seq("vec_id"), "left_anti")
          .join(ms, "vec_id")
          .orderBy((lit(7L) * col("rel") - lit(3L) * col("ms")).desc, col("vec_id").asc)
          .limit(1)
          .select(lit(i.toLong).as("pick"), col("vec_id"), col("rel"), col("ms"))
        picks = picks.unionAll(next)
      }
      picks.select(col("pick"), col("vec_id"), col("rel").as("rel_scaled"),
          expr("CAST((7 * rel - 3 * ms) div 10 AS BIGINT)").as("mmr_deci"))
        .orderBy("pick")
    },

    // Bounded SCC membership probe: nodes in the strongly-connected
    // component of the minimum node = forward-reachable ∩ backward-
    // reachable, each within 4 supersteps, over the thresholded
    // nation-level trade graph (directed supplier→customer edges whose
    // support is ≥ 1.5× the mean edge support — a RELATIVE cut, so the
    // digraph stays equally sparse at every scale factor, where any
    // absolute count would go empty at sf0.001 and dense at sf10; the
    // asymmetry it induces is what makes the SCC question non-trivial).
    // Reuses
    // Graphs.bfsHops twice — the backward pass is the SAME operator on
    // swapped columns, and the edge list is built once and cached. Each
    // superstep's cost follows the frontier; the final intersection is
    // an equi-join on node id. The oracle runs two hop-bounded
    // recursive CTEs with MIN-distance collapse (q185's pattern).
    QueryDef.sql(
      "q466_scc_core",
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS cnt
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |t AS (SELECT SUM(cnt) AS tot, COUNT(*) AS ne FROM e0),
        |e AS MATERIALIZED (SELECT src, dst FROM e0, t WHERE 2 * cnt * ne >= 3 * tot),
        |r0 AS MATERIALIZED (SELECT MIN(src) AS root FROM e),
        |f(n, d) AS (
        |  SELECT root, 0 FROM r0 WHERE root IS NOT NULL
        |  UNION ALL
        |  SELECT e.dst, f.d + 1 FROM f JOIN e ON f.n = e.src WHERE f.d < 4),
        |b(n, d) AS (
        |  SELECT root, 0 FROM r0 WHERE root IS NOT NULL
        |  UNION ALL
        |  SELECT e.src, b.d + 1 FROM b JOIN e ON b.n = e.dst WHERE b.d < 4),
        |fm AS (SELECT n, MIN(d) AS fwd FROM f GROUP BY 1),
        |bm AS (SELECT n, MIN(d) AS bwd FROM b GROUP BY 1)
        |SELECT nt.n_name AS nation, CAST(fm.fwd AS BIGINT) AS fwd_hop,
        |  CAST(bm.bwd AS BIGINT) AS bwd_hop
        |FROM fm JOIN bm USING (n) JOIN nation nt ON fm.n = nt.n_nationkey
        |ORDER BY nation""".stripMargin) { (s, dir) =>
      import graft.operators.Graphs
      val t = Tables(s, dir)
      val e0 = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
      val tot = e0.agg(sum("cnt").as("tot"), count(lit(1)).as("ne"))
      val e = e0.crossJoin(broadcast(tot))
        .where(lit(2) * col("cnt") * col("ne") >= lit(3) * col("tot"))
        .select("src", "dst")
        .cache()
      // ONE shared root (min forward src) seeds BOTH traversals — the
      // backward pass must not re-derive min(src) on swapped columns
      val root = e.agg(min(col("src")).as("n")).where(col("n").isNotNull)
      val fwd = Graphs.bfsHopsFrom(e, root, maxHops = 4)
        .select(col("n"), col("hop").as("fwd_hop"))
      val bwd = Graphs.bfsHopsFrom(
          e.select(col("dst").as("src"), col("src").as("dst")), root, maxHops = 4)
        .select(col("n"), col("hop").as("bwd_hop"))
      fwd.join(bwd, "n")
        .join(broadcast(t.nation), col("n") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("fwd_hop"), col("bwd_hop"))
        .orderBy("nation")
    },

    // Edit-distance record linkage with sorted-neighborhood blocking on
    // part names: block by the head noun (second token), sort each block
    // lexicographically, and test only each name's next 1-2 neighbors
    // with levenshtein ≤ 3 — the string-similarity companion to q438's
    // numeric-band blocking (same O(n·w) shape, but the comparator is
    // the edit-distance kernel both engines implement natively). At
    // 100 TB the noun block is the shuffle key and each window frame
    // holds w=2 strings — no quadratic pair list, no cross join.
    QueryDef.sql(
      "q467_edit_blocking",
      """WITH p AS (SELECT DISTINCT split_part(p_name, ' ', 2) AS noun, p_name
        |  FROM part),
        |w AS (SELECT noun, p_name,
        |    LEAD(p_name, 1) OVER (PARTITION BY noun ORDER BY p_name) AS n1,
        |    LEAD(p_name, 2) OVER (PARTITION BY noun ORDER BY p_name) AS n2
        |  FROM p)
        |SELECT noun, COUNT(*) AS n_names,
        |  COUNT(*) FILTER (WHERE levenshtein(p_name, n1) <= 3) AS cand_w1,
        |  COUNT(*) FILTER (WHERE levenshtein(p_name, n2) <= 3) AS cand_w2,
        |  COALESCE(MIN(levenshtein(p_name, n1)), -1) AS min_lev
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir).part
        .select(element_at(split(col("p_name"), " "), 2).as("noun"), col("p_name"))
        .distinct()
      val w = Window.partitionBy("noun").orderBy("p_name")
      p.select(col("noun"), col("p_name"),
          lead("p_name", 1).over(w).as("n1"), lead("p_name", 2).over(w).as("n2"))
        .groupBy("noun")
        .agg(count(lit(1)).as("n_names"),
          count(when(levenshtein(col("p_name"), col("n1")) <= 3, 1)).as("cand_w1"),
          count(when(levenshtein(col("p_name"), col("n2")) <= 3, 1)).as("cand_w2"),
          coalesce(min(levenshtein(col("p_name"), col("n1"))).cast("long"), lit(-1L))
            .as("min_lev"))
        .orderBy("noun")
    },

    // Bucket-count advisor: for each fact/dim table, measure the actual
    // serialized footprint (string bytes + 8 per fixed-width column) in
    // ONE map-side-combined aggregate, then size the bucketed layout to
    // 128 MiB targets rounded up to a power of two — the constraint that
    // makes bucket counts of co-partitioned tables divide evenly (Spark
    // only avoids the shuffle when counts are compatible). ceil(log2) is
    // the length(bin(f−1)) trick (q454), so the whole advisory is exact
    // integer arithmetic over per-table stats rows.
    QueryDef.sql(
      "q468_bucket_advisor",
      """WITH stats AS (
        |  SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
        |    SUM(len(c_name) + len(c_mktsegment) + 8 * 3) AS bytes FROM customer
        |  UNION ALL
        |  SELECT 'lineitem', COUNT(*),
        |    SUM(len(l_returnflag) + len(l_linestatus) + 8 * 9) FROM lineitem
        |  UNION ALL
        |  SELECT 'orders', COUNT(*),
        |    SUM(len(o_orderstatus) + len(o_orderpriority) + 8 * 4) FROM orders
        |  UNION ALL
        |  SELECT 'part', COUNT(*),
        |    SUM(len(p_name) + len(p_brand) + len(p_type) + 8 * 3) FROM part),
        |f AS (SELECT tbl, n_rows, bytes,
        |    GREATEST((bytes + 134217727) // 134217728, 1) AS files FROM stats)
        |SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows, CAST(bytes AS BIGINT) AS bytes,
        |  CAST(CASE WHEN files <= 1 THEN 1
        |    ELSE 1 << length(bin(files - 1)) END AS BIGINT) AS n_buckets,
        |  CAST(n_rows // (CASE WHEN files <= 1 THEN 1
        |    ELSE 1 << length(bin(files - 1)) END) AS BIGINT) AS rows_per_bucket
        |FROM f ORDER BY tbl""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def st(name: String, df: org.apache.spark.sql.DataFrame, rowBytes: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_rows"), sum(rowBytes).as("bytes"))
          .select(lit(name).as("tbl"), col("n_rows"), col("bytes"))
      val stats =
        st("customer", t.customer, length(col("c_name")) + length(col("c_mktsegment")) + lit(24)).unionAll(
        st("lineitem", t.lineitem, length(col("l_returnflag")) + length(col("l_linestatus")) + lit(72))).unionAll(
        st("orders", t.orders, length(col("o_orderstatus")) + length(col("o_orderpriority")) + lit(32))).unionAll(
        st("part", t.part, length(col("p_name")) + length(col("p_brand")) + length(col("p_type")) + lit(24)))
      stats
        .withColumn("files", greatest(expr("(bytes + 134217727) div 134217728"), lit(1L)))
        .withColumn("n_buckets", when(col("files") <= 1, 1L)
          .otherwise(expr("shiftleft(1L, length(bin(files - 1)))")))
        .select(col("tbl"), col("n_rows"), col("bytes"), col("n_buckets"),
          expr("n_rows div n_buckets").as("rows_per_bucket"))
        .orderBy("tbl")
    },

    // RAKE keyword extraction (Rose et al.): candidate phrases are
    // maximal stopword-free token runs (gaps-and-islands over token
    // positions — island id = pos − row_number, no iteration), word
    // scores are degree/frequency where degree sums the lengths of every
    // phrase a word occurrence belongs to, and a phrase scores the sum
    // of its words' scores. All ratios are ×10⁶ integer divisions. The
    // corpus-wide aggregates (word freq/degree) are map-side combinable;
    // the phrase reassembly is one ordered string_agg per island — the
    // whole pipeline is three shuffles on (doc, island) / word / phrase
    // regardless of corpus size.
    QueryDef.sql(
      "q469_rake_keywords",
      """WITH ws AS (SELECT doc_id,
        |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM (
        |  SELECT doc_id,
        |    unnest(list_transform(ws, (x, i) -> {'pos': i, 'w': x})) AS u
        |  FROM ws)),
        |nst AS (SELECT doc_id, pos, w,
        |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |  FROM tok WHERE w NOT IN ('a', 'the') AND len(w) > 0),
        |ph AS (SELECT doc_id, isl, COUNT(*) AS plen FROM nst GROUP BY 1, 2),
        |wstat AS (SELECT w, COUNT(*) AS freq, SUM(plen) AS deg
        |  FROM nst JOIN ph USING (doc_id, isl) GROUP BY 1),
        |wscore AS (SELECT w, (1000000 * CAST(deg AS HUGEINT)) // freq AS ws
        |  FROM wstat),
        |phrases AS (SELECT n.doc_id, n.isl,
        |    string_agg(n.w, ' ' ORDER BY n.pos) AS phrase,
        |    SUM(s.ws) AS score
        |  FROM nst n JOIN wscore s ON n.w = s.w GROUP BY 1, 2)
        |SELECT DISTINCT phrase, CAST(score AS BIGINT) AS score_ppm
        |FROM phrases ORDER BY score_ppm DESC, phrase LIMIT 15""".stripMargin) { (s, dir) =>
      val tok = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(
          split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("w"))
      val nst = tok.where(!col("w").isin("a", "the") && length(col("w")) > 0)
        .withColumn("isl", col("pos") -
          row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      val ph = nst.groupBy("doc_id", "isl").agg(count(lit(1)).as("plen"))
      val wstat = nst.join(ph, Seq("doc_id", "isl"))
        .groupBy("w").agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        .select(col("w"),
          expr("(1000000 * CAST(deg AS DECIMAL(38,0))) div freq").as("ws"))
      nst.join(wstat, "w")
        .groupBy("doc_id", "isl")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, w)))," +
          " x -> x.w), ' ')").as("phrase"),
          sum("ws").as("score"))
        .select(col("phrase"), col("score").cast("long").as("score_ppm"))
        .distinct()
        .orderBy(col("score_ppm").desc, col("phrase").asc)
        .limit(15)
    },

    // Local Outlier Factor (Breunig et al., k=5) over the embedding
    // corpus with integer cosine distances (10⁶ − scaled cosine): the
    // density-based outlier score every curation pipeline wants where
    // global z-scores fail (a point is outlying relative to its OWN
    // neighborhood's density). Three relational passes over one kNN
    // relation — k-distance (max of the 5NN ball), reachability sums,
    // then the lrd ratio — all ×-scaled integer divisions.
    //
    // The kNN base is the IVF candidate stream BY DEFAULT (the q55
    // scheme: deterministic centroids = every 25th vector, each vector
    // multi-probe-indexed into its top-2 cells, candidate pairs = cell
    // mates): pair count follows Σ|cell|² — n²/C shape — never the
    // brute-force n². The oracle restricts to the IDENTICAL candidate
    // set, so 5NN-within-candidates agrees exactly on both engines.
    // Exact all-pairs kNN remains available as the witness path
    // (q204's honest-witness pattern) — LOF downstream only sees the
    // (qid, cid, dist) relation either way.
    QueryDef.sql(
      "q470_lof",
      """WITH cent AS (SELECT vec_id AS ccid, embedding AS cemb
        |              FROM embeddings WHERE vec_id % 25 = 0),
        |pe AS (SELECT e.vec_id, c.ccid, i,
        |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
        |    CAST(FLOOR(CAST(c.cemb[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
        |  FROM embeddings e, cent c, generate_series(1, 64) t(i)),
        |pd AS (SELECT vec_id, ccid, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
        |       FROM pe GROUP BY vec_id, ccid),
        |pc AS (SELECT vec_id, ccid,
        |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE)
        |      / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS ccos
        |  FROM pd),
        |asg AS (SELECT vec_id, ccid AS cell FROM (
        |    SELECT vec_id, ccid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, ccid) AS rn
        |    FROM pc) WHERE rn <= 2),
        |cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS cid
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |e AS (SELECT vec_id, i,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |d0 AS (SELECT c.qid, c.cid,
        |    SUM(a.m * b.m) AS dxy, SUM(a.m * a.m) AS dxx, SUM(b.m * b.m) AS dyy
        |  FROM cand c JOIN e a ON a.vec_id = c.qid
        |              JOIN e b ON b.vec_id = c.cid AND a.i = b.i
        |  GROUP BY 1, 2),
        |d AS (SELECT qid, cid, 1000000 - CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE)
        |    / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS dist
        |  FROM d0),
        |nb AS (SELECT qid, cid, dist FROM (
        |    SELECT qid, cid, dist,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, cid) AS rk
        |    FROM d) WHERE rk <= 5),
        |kd AS (SELECT qid, MAX(dist) AS kdist FROM nb GROUP BY 1),
        |sr AS (SELECT nb.qid, SUM(GREATEST(nb.dist, kb.kdist)) AS s
        |  FROM nb JOIN kd kb ON nb.cid = kb.qid GROUP BY 1),
        |lrd AS (SELECT qid, (5 * CAST(1000000000 AS HUGEINT)) // GREATEST(s, 1) AS lrd
        |  FROM sr),
        |lof AS (SELECT nb.qid,
        |    CAST((1000000 * SUM(CAST(lb.lrd AS HUGEINT))) // (5 * la.lrd) AS BIGINT)
        |      AS lof_ppm
        |  FROM nb JOIN lrd lb ON nb.cid = lb.qid JOIN lrd la ON nb.qid = la.qid
        |  GROUP BY nb.qid, la.lrd)
        |SELECT lof.qid AS vec_id, lof_ppm, CAST(kd.kdist AS BIGINT) AS kdist
        |FROM lof JOIN kd ON lof.qid = kd.qid
        |ORDER BY lof_ppm DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      // self-norms are computed ONCE per vector (not per pair): the
      // pairwise kernel then runs a single native scaled_dot per pair
      // instead of three (3× fewer fused loops)
      val emb = Tables(s, dir).embeddings
        .withColumn("nrm",
          graft.operators.Similarity.scaledDot(col("embedding"), col("embedding")))
      // IVF multi-probe index (Similarity.ivfCandidatePairs): top-2 cells
      // per vector against the (tiny) broadcast centroid set; candidate
      // pairs are cell-mates — the only cross join in the plan is
      // corpus × centroids (n·C, the q55 assignment shape), never
      // corpus × corpus (IvfCandidateSpec pins the sub-quadratic count)
      val candIds = graft.operators.Similarity
        .ivfCandidatePairs(Tables(s, dir).embeddings, 25, 2)
      val d = candIds
        .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("nrm").as("qnrm")), "qid")
        .join(emb.select(col("vec_id").as("cid"), col("embedding").as("cv"),
          col("nrm").as("cnrm")), "cid")
        .select(col("qid"), col("cid"),
          (lit(1000000L) - floor(lit(1000000.0) *
            graft.operators.Similarity.scaledDot(col("qv"), col("cv"))
              .cast("double") /
            (sqrt(col("qnrm").cast("double")) * sqrt(col("cnrm").cast("double"))))
            .cast("long")).as("dist"))
      val nb = d.withColumn("rk", row_number()
          .over(Window.partitionBy("qid").orderBy(col("dist").asc, col("cid").asc)))
        .where(col("rk") <= 5)
        .select("qid", "cid", "dist")
        .cache()
      val kd = nb.groupBy("qid").agg(max("dist").as("kdist"))
      val sr = nb.join(kd.select(col("qid").as("cid"), col("kdist")), "cid")
        .groupBy("qid").agg(sum(greatest(col("dist"), col("kdist"))).as("s"))
      val lrd = sr.select(col("qid"),
        expr("(5 * CAST(1000000000 AS DECIMAL(38,0))) div GREATEST(s, 1)").as("lrd"))
      val lof = nb
        .join(lrd.select(col("qid").as("cid"), col("lrd").as("lrd_b")), "cid")
        .join(lrd.select(col("qid"), col("lrd").as("lrd_a")), "qid")
        .groupBy("qid", "lrd_a")
        .agg(sum(col("lrd_b").cast("decimal(38,0)")).as("slb"))
        .select(col("qid"),
          expr("CAST((1000000 * slb) div (5 * lrd_a) AS BIGINT)").as("lof_ppm"))
      lof.join(kd, "qid")
        .select(col("qid").as("vec_id"), col("lof_ppm"), col("kdist"))
        .orderBy(col("lof_ppm").desc, col("vec_id").asc)
        .limit(10)
    },

    // James-Stein shrinkage of per-nation mean order values toward the
    // grand mean — the empirical-Bayes estimator that dominates raw
    // group means whenever ≥ 4 groups are estimated simultaneously (the
    // canonical fix for "small segments look extreme" in any per-segment
    // dashboard). Shrink factor 1 − (k−3)·τ̂²/S from exact integer
    // sums: per-group milli-means, between-group SS, and the pooled
    // variance-of-the-mean τ̂² — one fact-table pass for the group
    // moments, one 25-row assembly; every ratio is a scaled DECIMAL
    // division truncated identically on both engines.
    QueryDef.sql(
      "q471_james_stein",
      """WITH y AS (SELECT c_nationkey AS nk,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT nk, COUNT(*) AS n, SUM(c) AS s,
        |    SUM(CAST(c AS HUGEINT) * c) AS ss FROM y GROUP BY 1),
        |m AS (SELECT nk, n, (1000 * CAST(s AS HUGEINT)) // n AS mean_milli,
        |    (1000000 * (n * ss - CAST(s AS HUGEINT) * s))
        |      // (CAST(n AS HUGEINT) * n * (n - 1) * n) AS sem2
        |  FROM g),
        |gs AS (SELECT COUNT(*) AS k, SUM(mean_milli) AS sm, SUM(sem2) AS st
        |  FROM m),
        |gm AS (SELECT k, sm // k AS grand, st // k AS tau2 FROM gs),
        |sb AS (SELECT SUM((mean_milli - grand) * (mean_milli - grand)) AS ssb
        |  FROM m, gm),
        |f AS (SELECT GREATEST(CAST(0 AS HUGEINT),
        |    1000000 - (1000000 * (k - 3) * tau2) // GREATEST(ssb, 1)) AS shrink_ppm,
        |    grand FROM gm, sb)
        |SELECT m.nk AS nation, CAST(m.n AS BIGINT) AS n,
        |  CAST(m.mean_milli AS BIGINT) AS raw_milli,
        |  CAST(f.grand + (f.shrink_ppm * (m.mean_milli - f.grand)) // 1000000
        |    AS BIGINT) AS shrunk_milli,
        |  CAST(f.shrink_ppm AS BIGINT) AS shrink_ppm
        |FROM m, f ORDER BY nation""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val y = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("c"))
      val g = y.groupBy("nk").agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("ss"))
      val m = g.select(col("nk"), col("n"),
        expr("(1000 * CAST(s AS DECIMAL(38,0))) div n").as("mean_milli"),
        expr("(1000000 * (n * ss - CAST(s AS DECIMAL(38,0)) * s))" +
          " div (CAST(n AS DECIMAL(38,0)) * n * (n - 1) * n)").as("sem2"))
      val gm = m.agg(count(lit(1)).as("k"), sum("mean_milli").as("sm"),
          sum("sem2").as("st"))
        .select(col("k"), expr("sm div k").as("grand"), expr("st div k").as("tau2"))
      val sb = m.crossJoin(broadcast(gm))
        .agg(sum((col("mean_milli") - col("grand")).cast("decimal(38,0)") *
          (col("mean_milli") - col("grand"))).as("ssb"))
      val f = gm.crossJoin(broadcast(sb))
        .select(greatest(lit(0L).cast("decimal(38,0)"),
          expr("1000000 - (CAST(1000000 AS DECIMAL(38,0)) * (k - 3) * tau2)" +
            " div GREATEST(ssb, 1)"))
          .as("shrink_ppm"), col("grand"))
      m.crossJoin(broadcast(f))
        .select(col("nk").as("nation"), col("n"),
          col("mean_milli").cast("long").as("raw_milli"),
          expr("CAST(grand + (shrink_ppm * (mean_milli - grand)) div 1000000" +
            " AS BIGINT)").as("shrunk_milli"),
          col("shrink_ppm").cast("long").as("shrink_ppm"))
        .orderBy("nation")
    },

    // Consistent-hash ring assignment (4 nodes × 8 virtual nodes,
    // md5-positioned): each customer key routes to its clockwise
    // successor vnode, wrapping at the ring origin — the shard-routing
    // scheme whose point is that adding/removing a node only remaps
    // ~1/nodes of the keyspace (vs modulo hashing's full reshuffle).
    // The ring is 32 rows broadcast everywhere; the successor probe is
    // a conditional MIN aggregate per key (no sort, no per-key binary
    // search materialization), then one counted rollup per node. The
    // vnode fan-out is what evens the load — the per-node share and the
    // max/min vnode arc lengths quantify it.
    QueryDef.sql(
      "q472_hash_ring",
      """WITH ring AS (SELECT 'n' || j AS node,
        |    ('0x' || substr(md5('n' || j || '#v' || k), 1, 8))::BIGINT AS pos
        |  FROM generate_series(0, 3) a(j), generate_series(0, 7) b(k)),
        |keys AS (SELECT c_custkey,
        |    ('0x' || substr(md5('k' || c_custkey), 1, 8))::BIGINT AS kh
        |  FROM customer),
        |succ AS (SELECT k.c_custkey,
        |    COALESCE(MIN(r.pos) FILTER (WHERE r.pos >= k.kh),
        |      (SELECT MIN(pos) FROM ring)) AS pos
        |  FROM keys k CROSS JOIN ring r GROUP BY k.c_custkey, k.kh),
        |asg AS (SELECT s.c_custkey, r.node FROM succ s JOIN ring r ON s.pos = r.pos),
        |tot AS (SELECT COUNT(*) AS nk FROM keys),
        |nodes AS (SELECT node, COUNT(*) AS n_vnodes FROM ring GROUP BY 1),
        |cnt AS (SELECT node, COUNT(*) AS n_keys FROM asg GROUP BY 1)
        |SELECT n.node, CAST(n.n_vnodes AS BIGINT) AS n_vnodes,
        |  CAST(COALESCE(c.n_keys, 0) AS BIGINT) AS n_keys,
        |  CAST(1000000 * COALESCE(c.n_keys, 0) // tot.nk AS BIGINT) AS share_ppm
        |FROM nodes n LEFT JOIN cnt c ON n.node = c.node CROSS JOIN tot
        |ORDER BY n.node""".stripMargin) { (s, dir) =>
      val ring = s.range(4).select(col("id").as("j"))
        .crossJoin(s.range(8).select(col("id").as("k")))
        .select(concat(lit("n"), col("j")).as("node"),
          expr("CAST(conv(substring(md5(concat('n', j, '#v', k)), 1, 8), 16, 10)" +
            " AS BIGINT)").as("pos"))
      val keys = Tables(s, dir).customer
        .select(col("c_custkey"),
          expr("CAST(conv(substring(md5(concat('k', c_custkey)), 1, 8), 16, 10)" +
            " AS BIGINT)").as("kh"))
      val minPos = ring.agg(min("pos").as("wrap"))
      val succ = keys.crossJoin(broadcast(ring.select("pos")))
        .groupBy("c_custkey", "kh")
        .agg(min(when(col("pos") >= col("kh"), col("pos"))).as("sp"))
        .crossJoin(broadcast(minPos))
        .select(col("c_custkey"), coalesce(col("sp"), col("wrap")).as("pos"))
      val asg = succ.join(broadcast(ring), "pos")
      val tot = keys.agg(count(lit(1)).as("nk"))
      val nodes = ring.groupBy("node").agg(count(lit(1)).as("n_vnodes"))
      val cnt = asg.groupBy("node").agg(count(lit(1)).as("n_keys"))
      nodes.join(cnt, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"), col("n_vnodes"),
          coalesce(col("n_keys"), lit(0L)).as("n_keys"),
          expr("CAST(1000000 * COALESCE(n_keys, 0) div nk AS BIGINT)").as("share_ppm"))
        .orderBy("node")
    },

    // Histogram-bin advisor: Sturges (⌈log2 n⌉+1) and Freedman-Diaconis
    // (2·IQR/n^⅓ width) bin counts per event type from exact order
    // statistics — the profiling step that sizes every downstream
    // equi-width histogram (q67/q154) instead of hard-coding bucket
    // counts. The discrete p25/p75 come from q152's distributed
    // convention (1-based index ⌈n·q⌉ via one row_number window — no
    // per-group collect); the integer cube root is floor-corrected the
    // same way q460 corrects its integer sqrt, so FD widths are exact
    // on both engines.
    QueryDef.sql(
      "q473_bin_advisor",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100.0) AS BIGINT) AS c FROM events),
        |q AS (SELECT event_type, COUNT(*) AS n,
        |    quantile_disc(c, 0.25) AS p25, quantile_disc(c, 0.75) AS p75,
        |    MIN(c) AS lo, MAX(c) AS hi FROM e GROUP BY 1),
        |cb AS (SELECT *, CAST(FLOOR(POW(CAST(n AS DOUBLE), 1.0/3)) AS BIGINT) AS c0
        |  FROM q),
        |cr AS (SELECT *, c0
        |    + CASE WHEN (c0+1)*(c0+1)*(c0+1) <= n THEN 1 ELSE 0 END
        |    - CASE WHEN c0*c0*c0 > n THEN 1 ELSE 0 END AS cbrt FROM cb)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(p75 - p25 AS BIGINT) AS iqr_cents,
        |  CAST(hi - lo AS BIGINT) AS range_cents,
        |  CAST(length(bin(n - 1)) + 1 AS BIGINT) AS sturges_bins,
        |  CAST(((hi - lo) * cbrt + 2 * (p75 - p25) - 1)
        |    // GREATEST(2 * (p75 - p25), 1) AS BIGINT) AS fd_bins
        |FROM cr ORDER BY event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("c"))
      val w = Window.partitionBy("event_type").orderBy("c")
      val idx = e.select(col("event_type"), col("c"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("event_type")).as("n"))
      // discrete quantiles at 1-based index ceil(n·q): 25% and 75%
      val q = idx.groupBy("event_type", "n")
        .agg(min(when(col("rn") === expr("(n * 25 + 99) div 100"), col("c"))).as("p25"),
          min(when(col("rn") === expr("(n * 75 + 99) div 100"), col("c"))).as("p75"),
          min("c").as("lo"), max("c").as("hi"))
      q.withColumn("c0", expr("CAST(FLOOR(POW(CAST(n AS DOUBLE), 1.0/3)) AS BIGINT)"))
        .withColumn("cbrt", col("c0")
          + when((col("c0") + 1) * (col("c0") + 1) * (col("c0") + 1) <= col("n"), 1L)
            .otherwise(0L)
          - when(col("c0") * col("c0") * col("c0") > col("n"), 1L).otherwise(0L))
        .select(col("event_type"), col("n"),
          (col("p75") - col("p25")).as("iqr_cents"),
          (col("hi") - col("lo")).as("range_cents"),
          expr("CAST(length(bin(n - 1)) + 1 AS BIGINT)").as("sturges_bins"),
          expr("CAST(((hi - lo) * cbrt + 2 * (p75 - p25) - 1)" +
            " div GREATEST(2 * (p75 - p25), 1) AS BIGINT)").as("fd_bins"))
        .orderBy("event_type")
    },

    // Epoch-shuffle independence audit: the deterministic per-epoch
    // data order every distributed trainer uses is sort-by-
    // hash(epoch, id); this measures how independent consecutive epoch
    // permutations actually are — exact Spearman ρ (no ties: ranks are
    // a permutation) and max displacement per epoch pair, all integer
    // ((6·10⁶·Σd²) div n(n²−1) under DECIMAL). The md5-derived sort
    // keys match bit-for-bit across engines. Ranking here is one window
    // per epoch; at cluster scale the identical rank comes from a
    // range-partitioned sort + per-partition offset cumsum (the
    // standard distributed zip-with-index), with everything downstream
    // unchanged.
    QueryDef.sql(
      "q474_epoch_shuffle",
      """WITH k AS (SELECT c_custkey AS id FROM customer),
        |r AS (SELECT e, id, ROW_NUMBER() OVER (PARTITION BY e ORDER BY h, id) AS rk
        |  FROM (SELECT g.e, k.id,
        |      ('0x' || substr(md5(g.e || '#' || k.id), 1, 12))::BIGINT AS h
        |    FROM k, generate_series(1, 3) g(e))),
        |p AS (SELECT a.e AS e1, b.e AS e2, CAST(a.rk AS HUGEINT) - b.rk AS d
        |  FROM r a JOIN r b ON a.id = b.id AND a.e < b.e),
        |n AS (SELECT COUNT(*) AS n FROM k)
        |SELECT e1, e2, CAST(n.n AS BIGINT) AS n,
        |  CAST(1000000 - (6000000 * SUM(d * d))
        |    // (CAST(n.n AS HUGEINT) * (n.n * n.n - 1)) AS BIGINT) AS rho_ppm,
        |  CAST(MAX(ABS(d)) AS BIGINT) AS max_disp
        |FROM p CROSS JOIN n GROUP BY e1, e2, n.n ORDER BY e1, e2""".stripMargin) { (s, dir) =>
      val k = Tables(s, dir).customer.select(col("c_custkey").as("id"))
      val r = s.range(1, 4).select(col("id").as("e")).crossJoin(k)
        .select(col("e"), col("id"),
          expr("CAST(conv(substring(md5(concat(e, '#', id)), 1, 12), 16, 10)" +
            " AS BIGINT)").as("h"))
        .withColumn("rk", row_number().over(Window.partitionBy("e").orderBy("h", "id")))
      val p = r.select(col("e").as("e1"), col("id"), col("rk").as("r1"))
        .join(r.select(col("e").as("e2"), col("id"), col("rk").as("r2")), "id")
        .where(col("e1") < col("e2"))
        .select(col("e1"), col("e2"),
          (col("r1").cast("decimal(38,0)") - col("r2")).as("d"))
      val n = k.agg(count(lit(1)).as("n"))
      p.crossJoin(broadcast(n))
        .groupBy("e1", "e2", "n")
        .agg(sum(col("d") * col("d")).as("sd2"), max(abs(col("d"))).as("md"))
        .select(col("e1"), col("e2"), col("n"),
          expr("CAST(1000000 - (6000000 * sd2)" +
            " div (CAST(n AS DECIMAL(38,0)) * (n * n - 1)) AS BIGINT)").as("rho_ppm"),
          col("md").cast("long").as("max_disp"))
        .orderBy("e1", "e2")
    },

    // Top-k with OTHER rollup: the reporting contract behind every
    // "top 3 nations + rest" widget — per region keep the 3 largest
    // revenue nations (deterministic rank: cents DESC, name) and fold
    // the tail into one OTHER row, with exact ppm shares against the
    // region total. One aggregate to nation grain, one window rank
    // (partitioned — never a global sort), one re-aggregate of the
    // relabeled tail; the region totals ride along as a second tiny
    // aggregate instead of a second fact scan.
    QueryDef.sql(
      "q475_topk_others",
      """WITH rev AS (SELECT r.r_name AS region, n.n_name AS nation,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY region
        |    ORDER BY cents DESC, nation) AS rk FROM rev),
        |tot AS (SELECT region, SUM(cents) AS rt FROM rev GROUP BY 1),
        |lab AS (SELECT region,
        |    CASE WHEN rk <= 3 THEN nation ELSE 'OTHER' END AS label,
        |    CASE WHEN rk <= 3 THEN rk ELSE 99 END AS pos, cents FROM rk)
        |SELECT l.region, l.label, CAST(MIN(l.pos) AS BIGINT) AS pos,
        |  CAST(SUM(l.cents) AS BIGINT) AS cents,
        |  CAST(1000000 * SUM(l.cents) // t.rt AS BIGINT) AS share_ppm
        |FROM lab l JOIN tot t ON l.region = t.region
        |GROUP BY l.region, l.label, t.rt
        |ORDER BY l.region, pos, label""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val rev = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("cents"))
      val rk = rev.withColumn("rk", row_number().over(
        Window.partitionBy("region").orderBy(col("cents").desc, col("nation"))))
      val tot = rev.groupBy("region").agg(sum("cents").as("rt"))
      rk.select(col("region"),
          when(col("rk") <= 3, col("nation")).otherwise(lit("OTHER")).as("label"),
          when(col("rk") <= 3, col("rk").cast("long")).otherwise(lit(99L)).as("pos"),
          col("cents"))
        .join(broadcast(tot), "region")
        .groupBy("region", "label", "rt")
        .agg(min("pos").as("pos"), sum("cents").as("cents"))
        .select(col("region"), col("label"), col("pos"), col("cents"),
          expr("CAST(1000000 * cents div rt AS BIGINT)").as("share_ppm"))
        .orderBy("region", "pos", "label")
    },

    // Group-leakage audit for train/test splits: hash-splitting ROWS
    // (orders) leaks entities — most customers land on both sides, so
    // any per-customer feature learned on train contaminates test —
    // while hash-splitting the GROUP key leaks exactly zero. Both
    // strategies are evaluated in one pass over the fact table: per
    // customer, capture flags for each side of each split, then two
    // 2-row census aggregates. The md5 bucket is the same deterministic
    // 20% holdout both engines reproduce bit-for-bit.
    QueryDef.sql(
      "q476_group_leakage",
      """WITH o AS (SELECT o_custkey,
        |    ('0x' || substr(md5('r' || o_orderkey), 1, 6))::BIGINT % 5 AS rb,
        |    ('0x' || substr(md5('g' || o_custkey), 1, 6))::BIGINT % 5 AS gb
        |  FROM orders),
        |rs AS (SELECT o_custkey,
        |    MAX(CASE WHEN rb = 0 THEN 1 ELSE 0 END) AS te,
        |    MAX(CASE WHEN rb <> 0 THEN 1 ELSE 0 END) AS tr FROM o GROUP BY 1),
        |gs AS (SELECT o_custkey,
        |    MAX(CASE WHEN gb = 0 THEN 1 ELSE 0 END) AS te,
        |    MAX(CASE WHEN gb <> 0 THEN 1 ELSE 0 END) AS tr FROM o GROUP BY 1),
        |a AS (SELECT 'row_hash' AS strategy, COUNT(*) AS n_groups,
        |    SUM(te * tr) AS leaked FROM rs
        |  UNION ALL
        |  SELECT 'group_hash', COUNT(*), SUM(te * tr) FROM gs)
        |SELECT strategy, CAST(n_groups AS BIGINT) AS n_groups,
        |  CAST(leaked AS BIGINT) AS leaked_groups,
        |  CAST(1000000 * leaked // n_groups AS BIGINT) AS leak_ppm
        |FROM a ORDER BY strategy""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders.select(col("o_custkey"),
        expr("CAST(conv(substring(md5(concat('r', o_orderkey)), 1, 6), 16, 10)" +
          " AS BIGINT) % 5").as("rb"),
        expr("CAST(conv(substring(md5(concat('g', o_custkey)), 1, 6), 16, 10)" +
          " AS BIGINT) % 5").as("gb"))
      def census(flag: String, strategy: String) = o.groupBy("o_custkey")
        .agg(max(when(col(flag) === 0, 1L).otherwise(0L)).as("te"),
          max(when(col(flag) =!= 0, 1L).otherwise(0L)).as("tr"))
        .agg(count(lit(1)).as("n_groups"), sum(col("te") * col("tr")).as("leaked"))
        .select(lit(strategy).as("strategy"), col("n_groups"), col("leaked"))
      census("rb", "row_hash").unionAll(census("gb", "group_hash"))
        .select(col("strategy"), col("n_groups"),
          col("leaked").as("leaked_groups"),
          expr("CAST(1000000 * leaked div n_groups AS BIGINT)").as("leak_ppm"))
        .orderBy("strategy")
    },

    // Benjamini-Hochberg FDR over 25 simultaneous nation-mean tests:
    // each nation's z² against the global mean is an exact integer
    // ((N·Sᵢ − nᵢ·G)² scaled by the pooled variance — q461's squared-
    // comparison idiom), compared rank-by-rank to a hard-coded
    // χ²₁-quantile table at levels 1 − 0.05·i/25 (the same baked-
    // constant pattern as q446's NDCG discounts — both engines share
    // the 25 milli thresholds, so no cross-engine special-function
    // drift). The step-up rule is a single reverse-running MAX window:
    // rejected(i) = max_{j≥i} [z²₍ⱼ₎ ≥ thr_j] — no loop, no rescan.
    QueryDef.sql(
      "q477_bh_fdr",
      """WITH y AS (SELECT c_nationkey AS nk,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT nk, COUNT(*) AS n, SUM(c) AS s FROM y GROUP BY 1),
        |t AS (SELECT (SELECT SUM(n) FROM g) AS nn, (SELECT SUM(s) FROM g) AS gs,
        |    (SELECT SUM(CAST(c AS HUGEINT) * c) FROM y) AS ss),
        |v AS (SELECT nn, gs, (nn * ss - CAST(gs AS HUGEINT) * gs)
        |    // (CAST(nn AS HUGEINT) * nn) AS var FROM t),
        |z AS (SELECT g.nk, g.n,
        |    (1000 * (CAST(v.nn AS HUGEINT) * g.s - CAST(g.n AS HUGEINT) * v.gs)
        |       * (CAST(v.nn AS HUGEINT) * g.s - CAST(g.n AS HUGEINT) * v.gs))
        |      // (CAST(g.n AS HUGEINT) * v.nn * v.nn * GREATEST(v.var, 1))
        |      AS z2_milli
        |  FROM g, v),
        |thr(rk, thr_milli) AS (VALUES
        |  (1, 9549), (2, 8283), (3, 7550), (4, 7033), (5, 6634),
        |  (6, 6310), (7, 6038), (8, 5802), (9, 5596), (10, 5411),
        |  (11, 5245), (12, 5094), (13, 4956), (14, 4828), (15, 4709),
        |  (16, 4598), (17, 4494), (18, 4397), (19, 4305), (20, 4217),
        |  (21, 4135), (22, 4056), (23, 3981), (24, 3909), (25, 3841)),
        |rkd AS (SELECT nk, z2_milli,
        |    ROW_NUMBER() OVER (ORDER BY z2_milli DESC, nk) AS rk FROM z),
        |j AS (SELECT r.nk, r.rk, r.z2_milli, t2.thr_milli,
        |    CASE WHEN r.z2_milli >= t2.thr_milli THEN 1 ELSE 0 END AS pass
        |  FROM rkd r JOIN thr t2 ON r.rk = t2.rk),
        |su AS (SELECT *, MAX(pass) OVER (ORDER BY rk DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rejected FROM j)
        |SELECT nk AS nation, CAST(rk AS BIGINT) AS rk,
        |  CAST(z2_milli AS BIGINT) AS z2_milli,
        |  CAST(thr_milli AS BIGINT) AS thr_milli,
        |  CAST(rejected AS BIGINT) AS rejected
        |FROM su ORDER BY rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val y = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("c"))
      val g = y.groupBy("nk").agg(count(lit(1)).as("n"), sum("c").as("s"))
      val tt = y.agg(count(lit(1)).as("nn"), sum("c").as("gs"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("ss"))
      val v = tt.select(col("nn"), col("gs"),
        expr("(nn * ss - CAST(gs AS DECIMAL(38,0)) * gs)" +
          " div (CAST(nn AS DECIMAL(38,0)) * nn)").as("var"))
      val z = g.crossJoin(broadcast(v))
        .select(col("nk"),
          expr("(1000 * (CAST(nn AS DECIMAL(38,0)) * s - CAST(n AS DECIMAL(38,0)) * gs)" +
            " * (CAST(nn AS DECIMAL(38,0)) * s - CAST(n AS DECIMAL(38,0)) * gs))" +
            " div (CAST(n AS DECIMAL(38,0)) * nn * nn * GREATEST(var, 1))")
            .as("z2_milli"))
      val thr = Seq(
        1L -> 9549L, 2L -> 8283L, 3L -> 7550L, 4L -> 7033L, 5L -> 6634L,
        6L -> 6310L, 7L -> 6038L, 8L -> 5802L, 9L -> 5596L, 10L -> 5411L,
        11L -> 5245L, 12L -> 5094L, 13L -> 4956L, 14L -> 4828L, 15L -> 4709L,
        16L -> 4598L, 17L -> 4494L, 18L -> 4397L, 19L -> 4305L, 20L -> 4217L,
        21L -> 4135L, 22L -> 4056L, 23L -> 3981L, 24L -> 3909L, 25L -> 3841L)
        .toDF("rk", "thr_milli")
      val rkd = z.withColumn("rk",
        row_number().over(Window.orderBy(col("z2_milli").desc, col("nk"))).cast("long"))
      val wsu = Window.orderBy(col("rk").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rkd.join(broadcast(thr), "rk")
        .withColumn("pass",
          when(col("z2_milli") >= col("thr_milli"), 1L).otherwise(0L))
        .select(col("nk").as("nation"), col("rk"),
          col("z2_milli").cast("long").as("z2_milli"), col("thr_milli"),
          max("pass").over(wsu).as("rejected"))
        .orderBy("rk")
    },

    // Stratified propensity matching (subclassification): treat = odd
    // custkey, outcome = lifetime order cents, strata = 10 acctbal
    // deciles (ntile — the cross-engine split rule q173 pinned). Within
    // each stratum treat/control are comparable by construction; the
    // ATT reweights stratum mean-differences by the treated counts —
    // the workhorse causal estimator when randomization isn't
    // available. One customer-grain outcome aggregate (LEFT JOIN keeps
    // zero-order customers), one decile window, one 10-row assembly;
    // every mean and the final ATT are milli-scaled integer divisions.
    QueryDef.sql(
      "q478_propensity_strata",
      """WITH oc AS (SELECT c.c_custkey, c.c_acctbal,
        |    c.c_custkey % 2 AS treat,
        |    COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)), 0) AS cents
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2, 3),
        |st AS (SELECT *, NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS stratum
        |  FROM oc),
        |g AS (SELECT stratum,
        |    SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS nt,
        |    SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS nc,
        |    SUM(CASE WHEN treat = 1 THEN cents ELSE 0 END) AS sct,
        |    SUM(CASE WHEN treat = 0 THEN cents ELSE 0 END) AS scc
        |  FROM st GROUP BY 1),
        |d AS (SELECT stratum, nt, nc,
        |    (1000 * CAST(sct AS HUGEINT)) // GREATEST(nt, 1)
        |      - (1000 * CAST(scc AS HUGEINT)) // GREATEST(nc, 1) AS diff_milli
        |  FROM g),
        |att AS (SELECT SUM(CAST(nt AS HUGEINT) * diff_milli) // SUM(nt) AS att_milli
        |  FROM d)
        |SELECT d.stratum AS stratum, CAST(d.nt AS BIGINT) AS n_treat,
        |  CAST(d.nc AS BIGINT) AS n_control,
        |  CAST(d.diff_milli AS BIGINT) AS diff_milli,
        |  CAST(att.att_milli AS BIGINT) AS att_milli
        |FROM d, att ORDER BY stratum""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val oc = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_acctbal"), (col("c_custkey") % 2).as("treat"))
        .agg(coalesce(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")), lit(0L))
          .as("cents"))
      val st = oc.withColumn("stratum",
        ntile(10).over(Window.orderBy("c_acctbal", "c_custkey")))
      val g = st.groupBy("stratum")
        .agg(sum(when(col("treat") === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("treat") === 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("treat") === 1, col("cents")).otherwise(0L)).as("sct"),
          sum(when(col("treat") === 0, col("cents")).otherwise(0L)).as("scc"))
      val d = g.select(col("stratum"), col("nt"), col("nc"),
        expr("(1000 * CAST(sct AS DECIMAL(38,0))) div GREATEST(nt, 1)" +
          " - (1000 * CAST(scc AS DECIMAL(38,0))) div GREATEST(nc, 1)").as("diff_milli"))
      val att = d.agg(
        expr("SUM(CAST(nt AS DECIMAL(38,0)) * diff_milli) div SUM(nt)").as("att_milli"))
      d.crossJoin(broadcast(att))
        .select(col("stratum").cast("long").as("stratum"), col("nt").as("n_treat"),
          col("nc").as("n_control"), col("diff_milli").cast("long").as("diff_milli"),
          col("att_milli").cast("long").as("att_milli"))
        .orderBy("stratum")
    },

    // Event-precedence matrix (the order-of-operations census behind
    // process mining): for every ordered pair of event types, how many
    // users saw their FIRST a strictly before their FIRST b, as a ppm
    // share of users who saw both. First-occurrence timestamps collapse
    // the event log to one row per (user, type) — a map-side-combined
    // MIN — so the pair comparison is a self-join of 5 rows per user,
    // never the raw event log squared. Strict-< on exact timestamps is
    // engine-identical; ties simply count for neither direction.
    QueryDef.sql(
      "q479_precedence_matrix",
      """WITH f AS (SELECT user_id, event_type, MIN(ts) AS ft
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    COUNT(*) AS n_both,
        |    SUM(CASE WHEN a.ft < b.ft THEN 1 ELSE 0 END) AS a_first
        |  FROM f a JOIN f b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta, tb, CAST(n_both AS BIGINT) AS n_both,
        |  CAST(a_first AS BIGINT) AS a_first,
        |  CAST(1000000 * a_first // n_both AS BIGINT) AS first_ppm
        |FROM p ORDER BY ta, tb""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir).events
        .groupBy("user_id", "event_type").agg(min("ts").as("ft"))
      f.select(col("user_id"), col("event_type").as("ta"), col("ft").as("fa"))
        .join(f.select(col("user_id"), col("event_type").as("tb"), col("ft").as("fb")),
          "user_id")
        .where(col("ta") =!= col("tb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("n_both"),
          sum(when(col("fa") < col("fb"), 1L).otherwise(0L)).as("a_first"))
        .select(col("ta"), col("tb"), col("n_both"), col("a_first"),
          expr("CAST(1000000 * a_first div n_both AS BIGINT)").as("first_ppm"))
        .orderBy("ta", "tb")
    },

    // Seasonal-residual anomaly detection on the daily revenue KPI:
    // remove the day-of-week mean (the dominant seasonal component),
    // then flag days whose residual exceeds 3 robust sigmas — the
    // MAD-based rule (|r| > 3·1.4826·MAD ⟺ 10000·|r| > 44478·MAD,
    // exact in integers) that survives the very outliers it hunts,
    // where a stddev-based z would be inflated by them. The day grain
    // (~2.4k rows) makes the dow means and the MAD median broadcast-
    // sized whatever the fact-table scale; the median uses q152's
    // 1-based ⌈n/2⌉ row_number convention.
    QueryDef.sql(
      "q480_seasonal_residual_outliers",
      """WITH day AS (SELECT o_orderdate AS d, dayofweek(o_orderdate) AS dow,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS r
        |  FROM orders GROUP BY 1, 2),
        |dm AS (SELECT dow, (1000 * SUM(CAST(r AS HUGEINT))) // COUNT(*) AS dmean
        |  FROM day GROUP BY 1),
        |res AS (SELECT d.d, d.dow, 1000 * CAST(d.r AS HUGEINT) - m.dmean AS resid
        |  FROM day d JOIN dm m ON d.dow = m.dow),
        |ar AS (SELECT d, resid, ABS(resid) AS a FROM res),
        |md AS (SELECT a AS mad FROM (SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS rn,
        |    COUNT(*) OVER () AS n FROM ar) WHERE rn = (n + 1) // 2)
        |SELECT ar.d AS day, CAST(ar.resid AS BIGINT) AS resid_milli,
        |  CAST(md.mad AS BIGINT) AS mad_milli,
        |  CAST(CASE WHEN 10000 * ar.a > 44478 * md.mad THEN 1 ELSE 0 END AS BIGINT)
        |    AS flagged
        |FROM ar, md ORDER BY ar.a DESC, day LIMIT 20""".stripMargin) { (s, dir) =>
      val day = Tables(s, dir).orders
        .groupBy(col("o_orderdate").as("d"), dayofweek(col("o_orderdate")).as("dow"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("r"))
      val dm = day.groupBy("dow")
        .agg(expr("(1000 * SUM(CAST(r AS DECIMAL(38,0)))) div COUNT(*)").as("dmean"))
      val ar = day.join(broadcast(dm), "dow")
        .select(col("d"),
          (lit(1000L) * col("r").cast("decimal(38,0)") - col("dmean")).as("resid"))
        .withColumn("a", abs(col("resid")))
      val w = Window.orderBy("a")
      val md = ar.select(col("a"), row_number().over(w).as("rn"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("a").as("mad"))
      ar.crossJoin(broadcast(md))
        .select(col("d").as("day"), col("resid").cast("long").as("resid_milli"),
          col("mad").cast("long").as("mad_milli"),
          when(lit(10000L) * col("a") > lit(44478L) * col("mad"), 1L).otherwise(0L)
            .as("flagged"), col("a"))
        .orderBy(col("a").desc, col("day"))
        .limit(20)
        .drop("a")
    },

    // Reachability under a threshold sweep: the nation trade digraph
    // kept at ≥1×/2×/3× mean edge support, with 4-superstep forward
    // reach from each surviving graph's min node — the percolation-
    // style sensitivity scan that prices "how aggressively can I prune
    // edges before the graph disconnects" (the q433 sweep pattern
    // applied to graph pruning). The base edge aggregate is computed
    // ONCE and cached; each threshold is a filter + the shared
    // bfsHopsFrom operator, so the sweep costs 3 frontier walks over
    // ever-smaller edge sets, not 3 fact-table scans.
    QueryDef.sql(
      "q481_threshold_reach",
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS cnt
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |t AS (SELECT SUM(cnt) AS tot, COUNT(*) AS ne FROM e0),
        |e1 AS MATERIALIZED (SELECT src, dst FROM e0, t WHERE cnt * ne >= tot),
        |e2 AS MATERIALIZED (SELECT src, dst FROM e0, t WHERE cnt * ne >= 2 * tot),
        |e3 AS MATERIALIZED (SELECT src, dst FROM e0, t WHERE cnt * ne >= 3 * tot),
        |f1(n, d) AS (SELECT (SELECT MIN(src) FROM e1), 0
        |  UNION ALL SELECT e1.dst, f1.d + 1 FROM f1 JOIN e1 ON f1.n = e1.src
        |  WHERE f1.d < 4),
        |f2(n, d) AS (SELECT (SELECT MIN(src) FROM e2), 0
        |  UNION ALL SELECT e2.dst, f2.d + 1 FROM f2 JOIN e2 ON f2.n = e2.src
        |  WHERE f2.d < 4),
        |f3(n, d) AS (SELECT (SELECT MIN(src) FROM e3), 0
        |  UNION ALL SELECT e3.dst, f3.d + 1 FROM f3 JOIN e3 ON f3.n = e3.src
        |  WHERE f3.d < 4),
        |r AS (SELECT 1 AS k, (SELECT COUNT(*) FROM e1) AS n_edges,
        |    (SELECT COUNT(DISTINCT n) FROM f1 WHERE n IS NOT NULL) AS n_reached,
        |    (SELECT COALESCE(MAX(d), -1) FROM (SELECT n, MIN(d) AS d FROM f1
        |       WHERE n IS NOT NULL GROUP BY n)) AS max_hop
        |  UNION ALL SELECT 2, (SELECT COUNT(*) FROM e2),
        |    (SELECT COUNT(DISTINCT n) FROM f2 WHERE n IS NOT NULL),
        |    (SELECT COALESCE(MAX(d), -1) FROM (SELECT n, MIN(d) AS d FROM f2
        |       WHERE n IS NOT NULL GROUP BY n))
        |  UNION ALL SELECT 3, (SELECT COUNT(*) FROM e3),
        |    (SELECT COUNT(DISTINCT n) FROM f3 WHERE n IS NOT NULL),
        |    (SELECT COALESCE(MAX(d), -1) FROM (SELECT n, MIN(d) AS d FROM f3
        |       WHERE n IS NOT NULL GROUP BY n)))
        |SELECT CAST(k AS BIGINT) AS k, CAST(n_edges AS BIGINT) AS n_edges,
        |  CAST(n_reached AS BIGINT) AS n_reached, CAST(max_hop AS BIGINT) AS max_hop
        |FROM r ORDER BY k""".stripMargin) { (s, dir) =>
      import graft.operators.Graphs
      val t = Tables(s, dir)
      // the nation-grain edge aggregate is cached so the fact-table join
      // runs ONCE; the mean-support scalar and all 3 sweep filters read
      // the ~600-row cache
      val base = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .cache()
      val e0 = base
        .crossJoin(broadcast(base.agg(sum("cnt").as("tot"), count(lit(1)).as("ne"))))
      def sweep(k: Int) = {
        val ek = e0.where(col("cnt") * col("ne") >= lit(k.toLong) * col("tot"))
          .select("src", "dst")
        val root = ek.agg(min(col("src")).as("n")).where(col("n").isNotNull)
        val reach = Graphs.bfsHopsFrom(ek, root, maxHops = 4)
        val nEdges = ek.agg(count(lit(1)).as("n_edges"))
        val stats = reach.agg(countDistinct("n").as("n_reached"),
          coalesce(max("hop"), lit(-1L)).as("max_hop"))
        nEdges.crossJoin(stats).select(lit(k.toLong).as("k"), col("n_edges"),
          col("n_reached"), col("max_hop"))
      }
      sweep(1).unionAll(sweep(2)).unionAll(sweep(3)).orderBy("k")
    },

    // Upper-tail dependence of order value vs order width (lineitem
    // count): λ_U = P(width > q90_w | value > q90_v) against the
    // independence baseline P(width > q90_w) — the joint-extremes
    // statistic that a correlation coefficient misses entirely (two
    // variables can be uncorrelated yet crash together). Both q90
    // thresholds are exact ⌈n·0.9⌉ order statistics (q152's convention)
    // from ONE row_number window each; the exceedance census is a
    // broadcast of the two scalars over the order-grain frame.
    QueryDef.sql(
      "q482_tail_dependence",
      """WITH o AS (SELECT o.o_orderkey,
        |    CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS v, COUNT(*) AS w
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |n AS (SELECT COUNT(*) AS n FROM o),
        |qv AS (SELECT v AS qv FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn
        |    FROM o), n WHERE rn = (n * 90 + 99) // 100),
        |qw AS (SELECT w AS qw FROM (SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS rn
        |    FROM o), n WHERE rn = (n * 90 + 99) // 100),
        |c AS (SELECT COUNT(*) AS nn,
        |    SUM(CASE WHEN v > qv THEN 1 ELSE 0 END) AS nv,
        |    SUM(CASE WHEN w > qw THEN 1 ELSE 0 END) AS nw,
        |    SUM(CASE WHEN v > qv AND w > qw THEN 1 ELSE 0 END) AS nj
        |  FROM o, qv, qw)
        |SELECT CAST(nn AS BIGINT) AS n, (SELECT CAST(qv AS BIGINT) FROM qv) AS q90_value,
        |  (SELECT CAST(qw AS BIGINT) FROM qw) AS q90_width,
        |  CAST(nv AS BIGINT) AS n_value_exceed, CAST(nj AS BIGINT) AS n_joint,
        |  CAST(1000000 * nj // GREATEST(nv, 1) AS BIGINT) AS lambda_ppm,
        |  CAST(1000000 * nw // nn AS BIGINT) AS baseline_ppm
        |FROM c""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val o = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), floor(col("o_totalprice") * lit(100.0))
          .cast("long").as("v"))
        .agg(count(lit(1)).as("w"))
      def q90(cname: String, alias: String) = o
        .select(col(cname), row_number().over(Window.orderBy(cname)).as("rn"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .where(col("rn") === expr("(n * 90 + 99) div 100"))
        .select(col(cname).as(alias))
      o.crossJoin(broadcast(q90("v", "qv"))).crossJoin(broadcast(q90("w", "qw")))
        .agg(count(lit(1)).as("nn"),
          sum(when(col("v") > col("qv"), 1L).otherwise(0L)).as("nv"),
          sum(when(col("w") > col("qw"), 1L).otherwise(0L)).as("nw"),
          sum(when(col("v") > col("qv") && col("w") > col("qw"), 1L).otherwise(0L))
            .as("nj"),
          max("qv").as("q90_value"), max("qw").as("q90_width"))
        .select(col("nn").as("n"), col("q90_value"), col("q90_width"),
          col("nv").as("n_value_exceed"), col("nj").as("n_joint"),
          expr("CAST(1000000 * nj div GREATEST(nv, 1) AS BIGINT)").as("lambda_ppm"),
          expr("CAST(1000000 * nw div nn AS BIGINT)").as("baseline_ppm"))
    },

    // Weak-supervision labeling audit (the Snorkel data-programming
    // loop's first report): three deterministic labeling functions over
    // the corpus — content (slow/fast tokens), length, and source
    // block — each voting {+1, −1, abstain}; the per-LF coverage /
    // overlap / conflict census is what tells you whether the label
    // model has enough signal BEFORE any training run. One map-only
    // pass computes all three votes per doc (no joins between LFs —
    // they're columns, not tables), one 3-row census after.
    QueryDef.sql(
      "q483_weak_labels",
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN text LIKE '%slow%' THEN 1
        |         WHEN text LIKE '%fast%' THEN -1 ELSE 0 END AS l1,
        |    CASE WHEN n_chars < 150 THEN 1
        |         WHEN n_chars > 450 THEN -1 ELSE 0 END AS l2,
        |    CASE WHEN source IN ('src0', 'src1', 'src2', 'src3') THEN 1
        |         WHEN source IN ('src16', 'src17', 'src18', 'src19') THEN -1
        |         ELSE 0 END AS l3
        |  FROM documents),
        |n AS (SELECT COUNT(*) AS nd,
        |    SUM(CASE WHEN l1 + l2 + l3 > 0 THEN 1 ELSE 0 END) AS n_pos,
        |    SUM(CASE WHEN l1 + l2 + l3 < 0 THEN 1 ELSE 0 END) AS n_neg FROM v),
        |s AS (SELECT 'lf1_content' AS lf,
        |    SUM(CASE WHEN l1 <> 0 THEN 1 ELSE 0 END) AS cov,
        |    SUM(CASE WHEN l1 <> 0 AND (l2 <> 0 OR l3 <> 0) THEN 1 ELSE 0 END) AS ovl,
        |    SUM(CASE WHEN l1 * l2 = -1 OR l1 * l3 = -1 THEN 1 ELSE 0 END) AS cfl
        |  FROM v
        |  UNION ALL SELECT 'lf2_length',
        |    SUM(CASE WHEN l2 <> 0 THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN l2 <> 0 AND (l1 <> 0 OR l3 <> 0) THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN l2 * l1 = -1 OR l2 * l3 = -1 THEN 1 ELSE 0 END) FROM v
        |  UNION ALL SELECT 'lf3_source',
        |    SUM(CASE WHEN l3 <> 0 THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN l3 <> 0 AND (l1 <> 0 OR l2 <> 0) THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN l3 * l1 = -1 OR l3 * l2 = -1 THEN 1 ELSE 0 END) FROM v)
        |SELECT s.lf, CAST(1000000 * s.cov // n.nd AS BIGINT) AS coverage_ppm,
        |  CAST(1000000 * s.ovl // n.nd AS BIGINT) AS overlap_ppm,
        |  CAST(1000000 * s.cfl // n.nd AS BIGINT) AS conflict_ppm,
        |  CAST(n.n_pos AS BIGINT) AS vote_pos, CAST(n.n_neg AS BIGINT) AS vote_neg
        |FROM s, n ORDER BY lf""".stripMargin) { (s, dir) =>
      val v = Tables(s, dir).documents.select(col("doc_id"),
        when(col("text").like("%slow%"), 1L)
          .when(col("text").like("%fast%"), -1L).otherwise(0L).as("l1"),
        when(col("n_chars") < 150, 1L)
          .when(col("n_chars") > 450, -1L).otherwise(0L).as("l2"),
        when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
          .when(col("source").isin("src16", "src17", "src18", "src19"), -1L)
          .otherwise(0L).as("l3"))
      val n = v.agg(count(lit(1)).as("nd"),
        sum(when(col("l1") + col("l2") + col("l3") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("l1") + col("l2") + col("l3") < 0, 1L).otherwise(0L)).as("n_neg"))
      def lfStats(name: String, self: String, o1: String, o2: String) = v.agg(
        sum(when(col(self) =!= 0, 1L).otherwise(0L)).as("cov"),
        sum(when(col(self) =!= 0 && (col(o1) =!= 0 || col(o2) =!= 0), 1L)
          .otherwise(0L)).as("ovl"),
        sum(when(col(self) * col(o1) === -1 || col(self) * col(o2) === -1, 1L)
          .otherwise(0L)).as("cfl"))
        .select(lit(name).as("lf"), col("cov"), col("ovl"), col("cfl"))
      lfStats("lf1_content", "l1", "l2", "l3")
        .unionAll(lfStats("lf2_length", "l2", "l1", "l3"))
        .unionAll(lfStats("lf3_source", "l3", "l1", "l2"))
        .crossJoin(broadcast(n))
        .select(col("lf"),
          expr("CAST(1000000 * cov div nd AS BIGINT)").as("coverage_ppm"),
          expr("CAST(1000000 * ovl div nd AS BIGINT)").as("overlap_ppm"),
          expr("CAST(1000000 * cfl div nd AS BIGINT)").as("conflict_ppm"),
          col("n_pos").as("vote_pos"), col("n_neg").as("vote_neg"))
        .orderBy("lf")
    },

    // k-center coreset by farthest-point (Gonzalez) traversal: seed at
    // vec 0, then 3 greedy rounds each adding the corpus point farthest
    // from its nearest selected center (maximin cosine distance), and
    // report the final coverage radius — the 2-approximation whose
    // radius certifies how well 4 exemplars cover the corpus (the
    // coreset-selection primitive for data pruning). Each round is ONE
    // corpus pass: min-dist-to-selected is a conditional min over ≤ 4
    // broadcast centers, the argmax a TakeOrdered(1); nothing pairwise
    // is ever materialized beyond corpus × |centers|.
    QueryDef.sql(
      "q484_kcenter_coreset", {
        // per-center distance CTE: corpus × ONE center (the b side is a
        // single vector), mirroring the Spark plan's corpus × |centers|
        // shape. The previous oracle grouped the FULL e×e pairwise join
        // and relied on the cid filters pushing through — DuckDB
        // materialized |V|²·64 rows and blew an 80 GB spill budget at
        // sf0.1; this form is linear by construction.
        def distTo(name: String, centerCond: String) =
          s"""$name AS (SELECT a.vec_id AS qid,
             |    1000000 - CAST(FLOOR(1000000.0 * CAST(SUM(a.m * b.m) AS DOUBLE)
             |      / (sqrt(CAST(SUM(a.m * a.m) AS DOUBLE))
             |         * sqrt(CAST(SUM(b.m * b.m) AS DOUBLE)))) AS BIGINT) AS dist
             |  FROM e a JOIN e b ON a.i = b.i AND $centerCond
             |  GROUP BY a.vec_id)""".stripMargin
        s"""WITH e AS (SELECT vec_id, i,
           |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
           |  FROM embeddings, generate_series(1, 64) t(i)),
           |${distTo("c0", "b.vec_id = 0")},
           |s1 AS (SELECT qid, dist AS md FROM c0 ORDER BY dist DESC, qid LIMIT 1),
           |${distTo("c1", "b.vec_id = (SELECT qid FROM s1)")},
           |m2 AS (SELECT qid, LEAST(c0.dist, c1.dist) AS md
           |       FROM c0 JOIN c1 USING (qid)),
           |s2 AS (SELECT qid, md FROM m2
           |  WHERE qid NOT IN (SELECT qid FROM s1) ORDER BY md DESC, qid LIMIT 1),
           |${distTo("c2", "b.vec_id = (SELECT qid FROM s2)")},
           |m3 AS (SELECT qid, LEAST(m2.md, c2.dist) AS md
           |       FROM m2 JOIN c2 USING (qid)),
           |s3 AS (SELECT qid, md FROM m3
           |  WHERE qid NOT IN (SELECT qid FROM s1 UNION SELECT qid FROM s2)
           |  ORDER BY md DESC, qid LIMIT 1),
           |${distTo("c3", "b.vec_id = (SELECT qid FROM s3)")},
           |mf AS (SELECT qid, LEAST(m3.md, c3.dist) AS md
           |       FROM m3 JOIN c3 USING (qid)),
           |rad AS (SELECT MAX(md) AS radius FROM mf)
           |SELECT pick, vec_id, CAST(maximin AS BIGINT) AS maximin,
           |  (SELECT CAST(radius AS BIGINT) FROM rad) AS radius
           |FROM (SELECT CAST(0 AS BIGINT) AS pick, CAST(0 AS BIGINT) AS vec_id,
           |    CAST(0 AS BIGINT) AS maximin
           |  UNION ALL SELECT 1, qid, md FROM s1
           |  UNION ALL SELECT 2, qid, md FROM s2
           |  UNION ALL SELECT 3, qid, md FROM s3) f
           |ORDER BY pick""".stripMargin
      }) { (s, dir) =>
      import graft.operators.Similarity
      val emb = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      def minDist(centers: org.apache.spark.sql.DataFrame) = emb
        .crossJoin(broadcast(centers
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))))
        .select(col("vec_id").as("qid"),
          (lit(1000000L) - Similarity.cosineScaled(col("embedding"), col("cv")))
            .as("dist"))
        .groupBy("qid").agg(min("dist").as("md"))
      var centers = emb.where(col("vec_id") === 0)
      var picks = centers.select(lit(0L).as("pick"), col("vec_id"), lit(0L).as("maximin"))
      for (i <- 1 to 3) {
        val far = minDist(centers)
          .join(centers.select(col("vec_id").as("qid")), Seq("qid"), "left_anti")
          .orderBy(col("md").desc, col("qid").asc).limit(1)
        picks = picks.unionAll(far.select(lit(i.toLong).as("pick"),
          col("qid").as("vec_id"), col("md").as("maximin")))
        centers = emb.join(picks.select(col("vec_id")), "vec_id")
          .select(col("vec_id"), col("embedding"))
      }
      val rad = minDist(centers).agg(max("md").as("radius"))
      picks.crossJoin(broadcast(rad))
        .select(col("pick"), col("vec_id"), col("maximin"), col("radius"))
        .orderBy("pick")
    },

    // Raking / iterative proportional fitting (2 rounds): reweight the
    // 1995-active customer sample so its (nation × segment) cells match
    // the FULL population's nation and segment marginals — the survey
    // post-stratification everyone reaches for when a sample is
    // demographically skewed. Row pass then column pass, each a ppm
    // rational scale from broadcast marginal sums; after the column
    // pass the nation marginals are re-audited (segment marginals match
    // by construction up to truncation). Cell grain is 125 rows
    // whatever the fact scale — all the heavy work is the two grouped
    // counts.
    QueryDef.sql(
      "q485_raking_ipf",
      """WITH pop AS (SELECT c_nationkey AS nk, c_mktsegment AS seg, COUNT(*) AS np
        |  FROM customer GROUP BY 1, 2),
        |samp AS (SELECT c.c_nationkey AS nk, c.c_mktsegment AS seg, COUNT(DISTINCT c.c_custkey) AS ns
        |  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |  WHERE year(o.o_orderdate) = 1995 GROUP BY 1, 2),
        |tn AS (SELECT nk, SUM(np) AS t_row FROM pop GROUP BY 1),
        |ts AS (SELECT seg, SUM(np) AS t_col FROM pop GROUP BY 1),
        |sr AS (SELECT nk, SUM(ns) AS s_row FROM samp GROUP BY 1),
        |w1 AS (SELECT s.nk, s.seg, s.ns,
        |    (1000000 * CAST(t.t_row AS HUGEINT)) // r.s_row AS w
        |  FROM samp s JOIN tn t ON s.nk = t.nk JOIN sr r ON s.nk = r.nk),
        |sc AS (SELECT seg, SUM(CAST(ns AS HUGEINT) * w) AS s_col FROM w1 GROUP BY 1),
        |w2 AS (SELECT w1.nk, w1.seg, w1.ns,
        |    (w1.w * ((CAST(1000000000000 AS HUGEINT) * t.t_col) // c.s_col))
        |      // 1000000 AS w
        |  FROM w1 JOIN ts t ON w1.seg = t.seg JOIN sc c ON w1.seg = c.seg),
        |a AS (SELECT nk, SUM(CAST(ns AS HUGEINT) * w) AS achieved FROM w2 GROUP BY 1)
        |SELECT a.nk AS nation, CAST(t.t_row AS BIGINT) AS target,
        |  CAST(r.s_row AS BIGINT) AS sample_raw,
        |  CAST(a.achieved // t.t_row AS BIGINT) AS achieved_ratio_ppm
        |FROM a JOIN tn t ON a.nk = t.nk JOIN sr r ON a.nk = r.nk
        |ORDER BY nation""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val pop = t.customer.groupBy(col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg")).agg(count(lit(1)).as("np"))
      val samp = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"))
        .where(year(col("o_orderdate")) === 1995)
        .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
        .agg(countDistinct("c_custkey").as("ns"))
      val tn = pop.groupBy("nk").agg(sum("np").as("t_row"))
      val ts = pop.groupBy("seg").agg(sum("np").as("t_col"))
      val sr = samp.groupBy("nk").agg(sum("ns").as("s_row"))
      val w1 = samp.join(broadcast(tn), "nk").join(broadcast(sr), "nk")
        .select(col("nk"), col("seg"), col("ns"),
          expr("(1000000 * CAST(t_row AS DECIMAL(38,0))) div s_row").as("w"))
      val sc = w1.groupBy("seg")
        .agg(sum(col("ns").cast("decimal(38,0)") * col("w")).as("s_col"))
      val w2 = w1.join(broadcast(ts), "seg").join(broadcast(sc), "seg")
        .select(col("nk"), col("seg"), col("ns"),
          expr("(w * ((CAST(1000000000000 AS DECIMAL(38,0)) * t_col) div s_col))" +
            " div 1000000").as("w"))
      val a = w2.groupBy("nk")
        .agg(sum(col("ns").cast("decimal(38,0)") * col("w")).as("achieved"))
      a.join(broadcast(tn), "nk").join(broadcast(sr), "nk")
        .select(col("nk").as("nation"), col("t_row").as("target"),
          col("s_row").as("sample_raw"),
          expr("CAST(achieved div t_row AS BIGINT)").as("achieved_ratio_ppm"))
        .orderBy("nation")
    },

    // Deterministic MLM masking plan (BERT's 15% / 80-10-10 recipe):
    // every token draws an md5 coin from (doc, position), so the SAME
    // masks reproduce on any engine, any rerun, any shard assignment —
    // the property that makes training resumable and masks auditable
    // (an RNG-based masker can't be re-derived after the fact). The
    // per-source census proves the realized rates: ~15% masked, split
    // 80% [MASK] / 10% random / 10% keep. Pure map-side projection +
    // one 20-row rollup; the coin is the ONLY state.
    QueryDef.sql(
      "q486_mlm_masking",
      """WITH ws AS (SELECT doc_id, source,
        |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, source, u.pos AS pos FROM (
        |  SELECT doc_id, source,
        |    unnest(list_transform(ws, (x, i) -> {'pos': i, 'w': x})) AS u
        |  FROM ws)),
        |c AS (SELECT source,
        |    ('0x' || substr(md5(doc_id || ':' || pos), 1, 6))::BIGINT % 100 AS r
        |  FROM tok)
        |SELECT source, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN r < 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        |  CAST(SUM(CASE WHEN r < 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_mask_tok,
        |  CAST(SUM(CASE WHEN r IN (12, 13) THEN 1 ELSE 0 END) AS BIGINT) AS n_random,
        |  CAST(SUM(CASE WHEN r = 14 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(1000000 * SUM(CASE WHEN r < 15 THEN 1 ELSE 0 END) // COUNT(*)
        |    AS BIGINT) AS mask_ppm
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val tok = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), posexplode(
          split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")))
        .select(col("doc_id"), col("source"), (col("pos") + 1).as("pos"))
      tok.select(col("source"),
          expr("CAST(conv(substring(md5(concat(doc_id, ':', pos)), 1, 6), 16, 10)" +
            " AS BIGINT) % 100").as("r"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("r") < 15, 1L).otherwise(0L)).as("n_masked"),
          sum(when(col("r") < 12, 1L).otherwise(0L)).as("n_mask_tok"),
          sum(when(col("r").isin(12, 13), 1L).otherwise(0L)).as("n_random"),
          sum(when(col("r") === 14, 1L).otherwise(0L)).as("n_keep"))
        .select(col("source"), col("n_tokens"), col("n_masked"), col("n_mask_tok"),
          col("n_random"), col("n_keep"),
          expr("CAST(1000000 * n_masked div n_tokens AS BIGINT)").as("mask_ppm"))
        .orderBy("source")
    },

    // l-diversity audit (the k-anonymity companion): per quasi-
    // identifier group (nation × segment), how many DISTINCT values of
    // the sensitive attribute (order priority) appear, and how dominant
    // the most common one is — a group can be k-anonymous yet still
    // leak its members' sensitive value when l=1 or one value holds
    // ~100% share (homogeneity attack). Distinct-l is a two-level
    // aggregate; the dominant share is an argmax over the tiny
    // (group × priority) grain — nothing scans the facts twice.
    QueryDef.sql(
      "q487_l_diversity",
      """WITH f AS (SELECT c.c_nationkey AS nk, c.c_mktsegment AS seg,
        |    o.o_orderpriority AS sv, COUNT(*) AS n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2, 3),
        |g AS (SELECT nk, seg, SUM(n) AS n_rows, COUNT(*) AS l, MAX(n) AS top_n
        |  FROM f GROUP BY 1, 2)
        |SELECT nk AS nation, seg AS segment, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(l AS BIGINT) AS l_distinct,
        |  CAST(1000000 * top_n // n_rows AS BIGINT) AS top_share_ppm,
        |  CAST(CASE WHEN l < 3 THEN 1 ELSE 0 END AS BIGINT) AS below_l3
        |FROM g ORDER BY nation, segment""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val f = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("sv"))
        .agg(count(lit(1)).as("n"))
      f.groupBy("nk", "seg")
        .agg(sum("n").as("n_rows"), count(lit(1)).as("l"), max("n").as("top_n"))
        .select(col("nk").as("nation"), col("seg").as("segment"), col("n_rows"),
          col("l").as("l_distinct"),
          expr("CAST(1000000 * top_n div n_rows AS BIGINT)").as("top_share_ppm"),
          when(col("l") < 3, 1L).otherwise(0L).as("below_l3"))
        .orderBy("nation", "segment")
    },

    // Offline policy replay (the counterfactual evaluation loop): split
    // the event log in time halves, learn a fixed policy on the first
    // (the event type with the highest mean value — one argmax over 5
    // rows), then score it on the second half by replay: the policy's
    // estimated value is the mean over test events it would have chosen
    // (Li et al.'s unbiased replay for FIXED policies), against the
    // all-events baseline. The temporal split is an exact ⌊n/2⌋
    // row_number cut on (ts, event_id) — no leakage, engine-identical;
    // all means are milli-scaled integer divisions.
    QueryDef.sql(
      "q488_offline_replay",
      """WITH e AS (SELECT event_type, ts, event_id,
        |    CAST(FLOOR(value * 1000.0) AS BIGINT) AS v,
        |    ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM events),
        |tr AS (SELECT event_type, v FROM e WHERE rn <= n // 2),
        |te AS (SELECT event_type, v FROM e WHERE rn > n // 2),
        |pol AS (SELECT event_type AS chosen FROM (
        |  SELECT event_type, (1000 * SUM(CAST(v AS HUGEINT))) // COUNT(*) AS mv
        |  FROM tr GROUP BY 1) ORDER BY mv DESC, chosen LIMIT 1),
        |sc AS (SELECT COUNT(*) AS n_test,
        |    SUM(CASE WHEN te.event_type = pol.chosen THEN 1 ELSE 0 END) AS n_match,
        |    SUM(CASE WHEN te.event_type = pol.chosen THEN v ELSE 0 END) AS sv_match,
        |    SUM(v) AS sv_all
        |  FROM te, pol),
        |tn AS (SELECT COUNT(*) AS n_train FROM tr)
        |SELECT (SELECT chosen FROM pol) AS chosen_type,
        |  CAST(tn.n_train AS BIGINT) AS n_train, CAST(sc.n_test AS BIGINT) AS n_test,
        |  CAST(sc.n_match AS BIGINT) AS n_matched,
        |  CAST((1000 * CAST(sc.sv_match AS HUGEINT)) // GREATEST(sc.n_match, 1)
        |    AS BIGINT) AS policy_value_milli,
        |  CAST((1000 * CAST(sc.sv_all AS HUGEINT)) // sc.n_test AS BIGINT)
        |    AS baseline_value_milli
        |FROM sc, tn""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), col("ts"), col("event_id"),
          floor(col("value") * lit(1000.0)).cast("long").as("v"))
        .withColumn("rn", row_number().over(Window.orderBy("ts", "event_id")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      val tr = e.where(col("rn") <= expr("n div 2")).select("event_type", "v")
      val te = e.where(col("rn") > expr("n div 2")).select("event_type", "v")
      val pol = tr.groupBy("event_type")
        .agg(expr("(1000 * SUM(CAST(v AS DECIMAL(38,0)))) div COUNT(*)").as("mv"))
        .orderBy(col("mv").desc, col("event_type"))
        .limit(1).select(col("event_type").as("chosen"))
      val tn = tr.agg(count(lit(1)).as("n_train"))
      te.crossJoin(broadcast(pol))
        .agg(max("chosen").as("chosen_type"), count(lit(1)).as("n_test"),
          sum(when(col("event_type") === col("chosen"), 1L).otherwise(0L))
            .as("n_match"),
          sum(when(col("event_type") === col("chosen"), col("v")).otherwise(0L))
            .as("sv_match"),
          sum("v").as("sv_all"))
        .crossJoin(broadcast(tn))
        .select(col("chosen_type"), col("n_train"), col("n_test"),
          col("n_match").as("n_matched"),
          expr("CAST((1000 * CAST(sv_match AS DECIMAL(38,0)))" +
            " div GREATEST(n_match, 1) AS BIGINT)").as("policy_value_milli"),
          expr("CAST((1000 * CAST(sv_all AS DECIMAL(38,0))) div n_test AS BIGINT)")
            .as("baseline_value_milli"))
    },

    // Leave-one-source-out influence (data valuation at the source
    // grain): how much does dropping each source shift the corpus mean
    // quality (n_chars as the proxy)? influence_i = mean(all) −
    // mean(all \ source_i), computed EXACTLY from the global and
    // per-source sums — the closed form that replaces 20 full rescans
    // (q453's leave-one-out idiom applied to data valuation). Sources
    // whose influence is most negative drag the corpus down — the
    // ranking a curation pipeline prunes by. One grouped aggregate, a
    // broadcast of the global sums, a 20-row assembly.
    QueryDef.sql(
      "q489_loo_source_influence",
      """WITH g AS (SELECT source, COUNT(*) AS n, SUM(n_chars) AS s
        |  FROM documents GROUP BY 1),
        |t AS (SELECT SUM(n) AS nn, SUM(s) AS ss FROM g)
        |SELECT g.source, CAST(g.n AS BIGINT) AS n_docs,
        |  CAST((1000 * CAST(g.s AS HUGEINT)) // g.n AS BIGINT) AS mean_milli,
        |  CAST((1000 * CAST(t.ss AS HUGEINT)) // t.nn
        |    - (1000 * (CAST(t.ss AS HUGEINT) - g.s)) // (t.nn - g.n) AS BIGINT)
        |    AS influence_milli
        |FROM g, t ORDER BY influence_milli DESC, source""".stripMargin) { (s, dir) =>
      val g = Tables(s, dir).documents.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      val t = g.agg(sum("n").as("nn"), sum("s").as("ss"))
      g.crossJoin(broadcast(t))
        .select(col("source"), col("n").as("n_docs"),
          expr("CAST((1000 * CAST(s AS DECIMAL(38,0))) div n AS BIGINT)")
            .as("mean_milli"),
          expr("CAST((1000 * CAST(ss AS DECIMAL(38,0))) div nn" +
            " - (1000 * (CAST(ss AS DECIMAL(38,0)) - s)) div (nn - n) AS BIGINT)")
            .as("influence_milli"))
        .orderBy(col("influence_milli").desc, col("source"))
    }
  )
}

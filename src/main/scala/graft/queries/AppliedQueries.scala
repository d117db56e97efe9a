package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Round-4 applied-statistics operators: engagement ratios, rank
  * association, randomness and distribution tests. Same conventions as
  * FrontierQueries (SURVEY §2.8): exact integer/DECIMAL sums, signed
  * arithmetic through DOUBLE + FLOOR only at final assembly, IEEE
  * correctly-rounded sqrt, deterministic total order on every result.
  */
object AppliedQueries {

  val all: Seq[QueryDef] = Seq(

    // DAU/MAU stickiness per day: daily actives over 30-day rolling
    // actives, exact distinct on both (q363's dedup-then-range-join
    // shape — the expansion factor is the window length at the
    // (day, user) grain, the raw stream is touched once). Stickiness
    // in exact ppm; the canonical engagement KPI that sliding-HLL
    // sketches approximate — this is the exact reference plan.
    QueryDef.sql(
      "q386_stickiness",
      """WITH du AS (SELECT DISTINCT
        |    date_diff('day', TIMESTAMP '2024-01-01', ts) AS day, user_id
        |  FROM events),
        |sp AS (SELECT DISTINCT day AS d FROM du),
        |dau AS (SELECT day AS d, COUNT(*) AS dau FROM du GROUP BY 1),
        |mau AS (SELECT sp.d, COUNT(DISTINCT du.user_id) AS mau
        |        FROM sp JOIN du ON du.day BETWEEN sp.d - 29 AND sp.d
        |        GROUP BY 1)
        |SELECT dau.d AS day, dau.dau, mau.mau,
        |  CAST(1000000 * dau.dau // mau.mau AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN mau ON dau.d = mau.d ORDER BY day""".stripMargin) { (s, dir) =>
      val du = Tables(s, dir).events
        .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"), col("user_id"))
        .distinct()
      val sp = du.select(col("day").as("d")).distinct()
      val dau = du.groupBy(col("day").as("d")).agg(count(lit(1)).as("dau"))
      val mau = broadcast(sp).join(du,
          du("day") >= sp("d") - 29 && du("day") <= sp("d"))
        .groupBy("d").agg(countDistinct("user_id").as("mau"))
      dau.join(mau, "d")
        .select(col("d").as("day"), col("dau"), col("mau"),
          expr("CAST(1000000 * dau div mau AS BIGINT)").as("stickiness_ppm"))
        .orderBy("day")
    },

    // Kendall tau-b between discount and quantity — rank association
    // computed WITHOUT any O(n²) pair scan: the data collapses to the
    // (discount, quantity) contingency grain (≤ 11×50 cells), and
    // concordant/discordant mass is a cell-pair join with strict
    // inequalities (each unordered pair counted once via x₂ > x₁).
    // Tie corrections n₁/n₂ come from the marginal grains; the tau-b
    // denominator products pass through HUGEINT / DECIMAL(38,0) (they
    // reach ~1e22) with one IEEE sqrt at assembly.
    QueryDef.sql(
      "q387_kendall_tau",
      """WITH v AS (SELECT CAST(ROUND(l_discount * 100.0) AS BIGINT) AS x,
        |    CAST(l_quantity AS BIGINT) AS y FROM lineitem),
        |cells AS (SELECT x, y, COUNT(*) AS n FROM v GROUP BY 1, 2),
        |cd AS (SELECT
        |    SUM(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS c,
        |    SUM(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS d
        |  FROM cells a JOIN cells b ON b.x > a.x),
        |tot AS (SELECT COUNT(*) AS n FROM v),
        |tx AS (SELECT SUM(m * (m - 1) // 2) AS n1 FROM
        |       (SELECT x, COUNT(*) AS m FROM v GROUP BY 1)),
        |ty AS (SELECT SUM(m * (m - 1) // 2) AS n2 FROM
        |       (SELECT y, COUNT(*) AS m FROM v GROUP BY 1))
        |SELECT CAST(tot.n AS BIGINT) AS n, CAST(cd.c AS BIGINT) AS concordant,
        |  CAST(cd.d AS BIGINT) AS discordant,
        |  CAST(FLOOR(1000000.0 * (CAST(cd.c AS DOUBLE) - CAST(cd.d AS DOUBLE))
        |    / SQRT((CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - CAST(tx.n1 AS DOUBLE))
        |         * (CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - CAST(ty.n2 AS DOUBLE))))
        |    AS BIGINT) AS tau_b_ppm
        |FROM cd, tot, tx, ty""".stripMargin) { (s, dir) =>
      val v = Tables(s, dir).lineitem
        .select(round(col("l_discount") * lit(100.0)).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
      val cells = v.groupBy("x", "y").agg(count(lit(1)).as("n"))
      val a = cells.select(col("x").as("ax"), col("y").as("ay"), col("n").as("an"))
      val b = cells.select(col("x").as("bx"), col("y").as("by"), col("n").as("bn"))
      val cd = a.join(broadcast(b), col("bx") > col("ax"))
        .agg(sum(when(col("by") > col("ay"), col("an") * col("bn")).otherwise(0L))
            .as("c"),
          sum(when(col("by") < col("ay"), col("an") * col("bn")).otherwise(0L))
            .as("d"))
      val tot = v.agg(count(lit(1)).as("n"))
      val tx = v.groupBy("x").agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2")).as("n1"))
      val ty = v.groupBy("y").agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2")).as("n2"))
      cd.crossJoin(broadcast(tot)).crossJoin(broadcast(tx))
        .crossJoin(broadcast(ty))
        .select(col("n"), col("c").as("concordant"), col("d").as("discordant"),
          expr("CAST(FLOOR(1000000.0D * (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))" +
            " / SQRT((CAST(n AS DOUBLE) * (n - 1) / 2 - CAST(n1 AS DOUBLE))" +
            " * (CAST(n AS DOUBLE) * (n - 1) / 2 - CAST(n2 AS DOUBLE))))" +
            " AS BIGINT)").as("tau_b_ppm"))
    },

    // Wald-Wolfowitz runs test on daily revenue vs its median: are
    // above/below-median days randomly interleaved or trending? Runs
    // come from a LAG over the bounded day grain (the only full-data
    // pass is the day aggregate); the median is the discrete
    // rank-index median on the same grain. E[R] and Var[R] are exact
    // rationals assembled in DOUBLE from exact counts, z in
    // milli-units. (Ties with the median count as 'below' — spec'd
    // identically in both engines.)
    QueryDef.sql(
      "q388_runs_test",
      """WITH d AS (SELECT
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |med AS (SELECT MAX(v) AS med FROM (
        |    SELECT y AS v, row_number() OVER (ORDER BY y, day) AS rk,
        |      COUNT(*) OVER () AS n FROM d) WHERE rk = (n + 1) // 2),
        |sg AS (SELECT day, CASE WHEN y > med.med THEN 1 ELSE 0 END AS s
        |       FROM d, med),
        |r AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
        |        OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS brk
        |      FROM sg),
        |m AS (SELECT COUNT(*) AS n, SUM(s) AS n1, COUNT(*) - SUM(s) AS n0,
        |        SUM(brk) AS runs FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n1,
        |  CAST(n0 AS BIGINT) AS n0, CAST(runs AS BIGINT) AS runs,
        |  CAST(FLOOR(1000.0 * (1 + 2.0 * n1 * n0 / n)) AS BIGINT) AS e_runs_milli,
        |  CAST(FLOOR(1000.0 * (CAST(runs AS DOUBLE) - (1 + 2.0 * n1 * n0 / n))
        |    / SQRT(2.0 * n1 * n0 * (2.0 * n1 * n0 - n)
        |           / (CAST(n AS DOUBLE) * n * (n - 1)))) AS BIGINT) AS z_milli
        |FROM m""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).orders
        .groupBy(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("y"))
      val med = d.select(col("y").as("v"),
          row_number().over(Window.orderBy("y", "day")).as("rk"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .where(col("rk") === expr("(n + 1) div 2"))
        .agg(max("v").as("med"))
      val sg = d.crossJoin(broadcast(med))
        .select(col("day"), when(col("y") > col("med"), 1L).otherwise(0L).as("s"))
      val wl = Window.orderBy("day")
      val r = sg.select(col("s"),
        when(lag("s", 1).over(wl).isNull || lag("s", 1).over(wl) =!= col("s"), 1L)
          .otherwise(0L).as("brk"))
      r.agg(count(lit(1)).as("n"), sum("s").as("n1"),
          (count(lit(1)) - sum("s")).as("n0"), sum("brk").as("runs"))
        .select(col("n"), col("n1"), col("n0"), col("runs"),
          expr("CAST(FLOOR(1000.0D * (1 + 2.0D * n1 * n0 / n)) AS BIGINT)")
            .as("e_runs_milli"),
          expr("CAST(FLOOR(1000.0D * (CAST(runs AS DOUBLE)" +
            " - (1 + 2.0D * n1 * n0 / n))" +
            " / SQRT(2.0D * n1 * n0 * (2.0D * n1 * n0 - n)" +
            " / (CAST(n AS DOUBLE) * n * (n - 1)))) AS BIGINT)").as("z_milli"))
    },

    // Two-sample Kolmogorov-Smirnov: the largest CDF gap between click
    // and purchase value distributions — EXACT via cross-multiplied
    // cumulative counts on the merged distinct-value grain (max
    // |c₁·n₂ − c₂·n₁|, never a floating CDF), so the statistic is an
    // integer ratio in ppm. One aggregation to the value grain, one
    // prefix-sum window over it, one MAX — the classic distribution-
    // drift gate, exact at any SF.
    QueryDef.sql(
      "q389_ks_test",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (SELECT v,
        |    COUNT(*) FILTER (WHERE event_type = 'click') AS c1,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS c2
        |  FROM e GROUP BY 1),
        |c AS (SELECT v,
        |    SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a1,
        |    SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |  FROM g)
        |SELECT CAST(MIN(n1) AS BIGINT) AS n1, CAST(MIN(n2) AS BIGINT) AS n2,
        |  CAST(MAX(abs(a1 * n2 - a2 * n1)) AS BIGINT) AS d_num,
        |  CAST(1000000 * MAX(abs(a1 * n2 - a2 * n1)) // (MIN(n1) * MIN(n2))
        |    AS BIGINT) AS ks_ppm
        |FROM c""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          floor(col("value") * lit(1000000.0)).cast("long").as("v"))
      val g = e.groupBy("v")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val wg = Window.partitionBy()
      g.select(col("v"),
          sum("c1").over(wc).as("a1"), sum("c2").over(wc).as("a2"),
          sum("c1").over(wg).as("n1"), sum("c2").over(wg).as("n2"))
        .agg(min("n1").as("n1"), min("n2").as("n2"),
          max(abs(col("a1") * col("n2") - col("a2") * col("n1"))).as("d_num"))
        .select(col("n1"), col("n2"), col("d_num"),
          expr("CAST(1000000 * d_num div (n1 * n2) AS BIGINT)").as("ks_ppm"))
    },

    // Wilcoxon signed-rank test: did per-customer spend shift between
    // 1999 H1 and H2? Pairs are the two half-year aggregates per
    // customer (inner join keeps both-active customers), zero diffs
    // dropped, |diff| ranked with DOUBLED mid-ranks at the
    // distinct-value grain (q385's tie-safe pattern), W⁺ = Σ ranks of
    // positive diffs. The normal approximation E/Var uses exact n with
    // one DOUBLE-floored z in milli. Complements q342's Mann-Whitney:
    // PAIRED samples, not independent ones.
    QueryDef.sql(
      "q390_wilcoxon",
      """WITH h AS (SELECT o_custkey,
        |    CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE 2 END AS half,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS cents
        |  FROM orders WHERE year(o_orderdate) = 1999 GROUP BY 1, 2),
        |p AS (SELECT a.o_custkey, b.cents - a.cents AS diff
        |      FROM h a JOIN h b ON a.o_custkey = b.o_custkey
        |      WHERE a.half = 1 AND b.half = 2 AND b.cents <> a.cents),
        |r AS (SELECT abs(diff) AS ad, COUNT(*) AS cnt,
        |        SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS pos
        |      FROM p GROUP BY 1),
        |rk AS (SELECT ad, cnt, pos,
        |    2 * (SUM(cnt) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) - cnt)
        |      + cnt + 1 AS r2
        |  FROM r),
        |m AS (SELECT SUM(cnt) AS n, SUM(pos * r2) AS w2p FROM rk)
        |SELECT CAST(n AS BIGINT) AS n, CAST(w2p AS BIGINT) AS w_plus_doubled,
        |  CAST(FLOOR(1000.0 * (CAST(w2p AS DOUBLE) / 2 - CAST(n AS DOUBLE) * (n + 1) / 4)
        |    / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2.0 * n + 1) / 24))
        |    AS BIGINT) AS z_milli
        |FROM m""".stripMargin) { (s, dir) =>
      val h = Tables(s, dir).orders
        .where(year(col("o_orderdate")) === 1999)
        .groupBy(col("o_custkey"),
          when(month(col("o_orderdate")) <= 6, 1).otherwise(2).as("half"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("cents"))
      val a = h.where(col("half") === 1).select(col("o_custkey"), col("cents").as("c1"))
      val b = h.where(col("half") === 2)
        .select(col("o_custkey").as("ck2"), col("cents").as("c2"))
      val p = a.join(b, col("o_custkey") === col("ck2"))
        .where(col("c2") =!= col("c1"))
        .select((col("c2") - col("c1")).as("diff"))
      val r = p.groupBy(abs(col("diff")).as("ad"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("diff") > 0, 1L).otherwise(0L)).as("pos"))
      val wc = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      r.select(col("ad"), col("cnt"), col("pos"),
          (lit(2) * (sum("cnt").over(wc) - col("cnt")) + col("cnt") + 1).as("r2"))
        .agg(sum("cnt").as("n"), sum(col("pos") * col("r2")).as("w2p"))
        .select(col("n"), col("w2p").as("w_plus_doubled"),
          expr("CAST(FLOOR(1000.0D * (CAST(w2p AS DOUBLE) / 2" +
            " - CAST(n AS DOUBLE) * (n + 1) / 4)" +
            " / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2.0D * n + 1) / 24))" +
            " AS BIGINT)").as("z_milli"))
    },

    // Pairwise covariance / correlation matrix over four lineitem
    // features (quantity, discount bps, price cents, tax bps) — the
    // feature-preprocessing primitive. ONE pass computes all 14
    // sufficient sums (4 firsts + 10 products, map-side combined);
    // the 10 (i ≤ j) matrix entries then assemble at literal grain.
    // Covariance numerators n·Σxy − Σx·Σy stay exact in
    // HUGEINT / DECIMAL(38,0) (price² sums pass 6e19); correlations
    // take one IEEE sqrt at the end.
    QueryDef.sql(
      "q391_cov_matrix",
      """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(ROUND(l_discount * 100.0) AS BIGINT) AS x2,
        |    CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS x3,
        |    CAST(ROUND(l_tax * 100.0) AS BIGINT) AS x4
        |  FROM lineitem),
        |m AS (SELECT COUNT(*) AS n,
        |    SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3, SUM(x4) AS s4,
        |    SUM(CAST(x1 AS HUGEINT) * x1) AS s11, SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
        |    SUM(CAST(x1 AS HUGEINT) * x3) AS s13, SUM(CAST(x1 AS HUGEINT) * x4) AS s14,
        |    SUM(CAST(x2 AS HUGEINT) * x2) AS s22, SUM(CAST(x2 AS HUGEINT) * x3) AS s23,
        |    SUM(CAST(x2 AS HUGEINT) * x4) AS s24, SUM(CAST(x3 AS HUGEINT) * x3) AS s33,
        |    SUM(CAST(x3 AS HUGEINT) * x4) AS s34, SUM(CAST(x4 AS HUGEINT) * x4) AS s44
        |  FROM v),
        |pairs AS (
        |  SELECT 1 AS i, 1 AS j, s1 AS si, s1 AS sj, s11 AS sij, s11 AS sii, s11 AS sjj, n FROM m
        |  UNION ALL SELECT 1, 2, s1, s2, s12, s11, s22, n FROM m
        |  UNION ALL SELECT 1, 3, s1, s3, s13, s11, s33, n FROM m
        |  UNION ALL SELECT 1, 4, s1, s4, s14, s11, s44, n FROM m
        |  UNION ALL SELECT 2, 2, s2, s2, s22, s22, s22, n FROM m
        |  UNION ALL SELECT 2, 3, s2, s3, s23, s22, s33, n FROM m
        |  UNION ALL SELECT 2, 4, s2, s4, s24, s22, s44, n FROM m
        |  UNION ALL SELECT 3, 3, s3, s3, s33, s33, s33, n FROM m
        |  UNION ALL SELECT 3, 4, s3, s4, s34, s33, s44, n FROM m
        |  UNION ALL SELECT 4, 4, s4, s4, s44, s44, s44, n FROM m)
        |SELECT i, j,
        |  CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sij AS DOUBLE)
        |    - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE)) / CAST(n AS DOUBLE)
        |    / CAST(n - 1 AS DOUBLE)) AS BIGINT) AS cov_floor,
        |  CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * CAST(sij AS DOUBLE)
        |      - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE) * CAST(sii AS DOUBLE)
        |        - CAST(si AS DOUBLE) * CAST(si AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(sjj AS DOUBLE)
        |        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)))) AS BIGINT) AS corr_ppm
        |FROM pairs ORDER BY i, j""".stripMargin) { (s, dir) =>
      val v = Tables(s, dir).lineitem
        .select(col("l_quantity").cast("long").as("x1"),
          round(col("l_discount") * lit(100.0)).cast("long").as("x2"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("x3"),
          round(col("l_tax") * lit(100.0)).cast("long").as("x4"))
      def p(a: String, b: String) =
        sum(col(a).cast("decimal(38,0)") * col(b)).as(s"s${a.last}${b.last}")
      val m = v.agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
        sum("x4").as("s4"),
        p("x1", "x1"), p("x1", "x2"), p("x1", "x3"), p("x1", "x4"),
        p("x2", "x2"), p("x2", "x3"), p("x2", "x4"),
        p("x3", "x3"), p("x3", "x4"), p("x4", "x4"))
      val pairIdx = Seq((1, 1), (1, 2), (1, 3), (1, 4), (2, 2), (2, 3), (2, 4),
        (3, 3), (3, 4), (4, 4))
      val pairs = pairIdx.map { case (i, j) =>
        m.select(lit(i).as("i"), lit(j).as("j"),
          col(s"s$i").as("si"), col(s"s$j").as("sj"),
          col(s"s$i$j").as("sij"), col(s"s$i$i").as("sii"),
          col(s"s$j$j").as("sjj"), col("n"))
      }.reduce(_.unionByName(_))
      pairs.select(col("i"), col("j"),
          expr("CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sij AS DOUBLE)" +
            " - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE)) / CAST(n AS DOUBLE)" +
            " / CAST(n - 1 AS DOUBLE)) AS BIGINT)").as("cov_floor"),
          expr("CAST(FLOOR(1000000.0D * (CAST(n AS DOUBLE) * CAST(sij AS DOUBLE)" +
            " - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE))" +
            " / SQRT((CAST(n AS DOUBLE) * CAST(sii AS DOUBLE)" +
            " - CAST(si AS DOUBLE) * CAST(si AS DOUBLE))" +
            " * (CAST(n AS DOUBLE) * CAST(sjj AS DOUBLE)" +
            " - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)))) AS BIGINT)")
            .as("corr_ppm"))
        .orderBy("i", "j")
    },

    // Chi-square goodness-of-fit of event-type traffic against the
    // uniform null — the monitoring gate "did the event mix drift from
    // spec?". With k classes the statistic is EXACT integer
    // arithmetic: χ² = Σ(k·Oᵢ − n)² / (k·n), no floating expected
    // counts (complements q313's Cramér's V, which tests association
    // between two observed factors, not fit against a fixed null).
    QueryDef.sql(
      "q392_chisq_goodness",
      """WITH o AS (SELECT event_type, COUNT(*) AS obs FROM events GROUP BY 1),
        |t AS (SELECT COUNT(*) AS k, SUM(obs) AS n FROM o),
        |x AS (SELECT SUM((k * obs - n) * (k * obs - n)) AS num, MIN(k) AS k,
        |        MIN(n) AS n
        |      FROM o, t)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |  CAST(1000 * num // (k * n) AS BIGINT) AS chi2_milli
        |FROM x""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).events.groupBy("event_type")
        .agg(count(lit(1)).as("obs"))
      val t = o.agg(count(lit(1)).as("k"), sum("obs").as("n"))
      o.crossJoin(broadcast(t))
        .agg(sum((col("k") * col("obs") - col("n"))
            * (col("k") * col("obs") - col("n"))).as("num"),
          min("k").as("k"), min("n").as("n"))
        .select(col("k"), col("n"),
          expr("CAST(1000 * num div (k * n) AS BIGINT)").as("chi2_milli"))
    },

    // Cohen's d effect size between click and purchase event values —
    // the practical-significance companion to q342's Mann-Whitney
    // p-value machinery: standardized mean difference over the pooled
    // standard deviation, from one conditional-sum pass of exact
    // integer sufficient statistics, assembled in DOUBLE with a single
    // FLOOR (milli-units, signed).
    QueryDef.sql(
      "q393_cohens_d",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000.0) AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (SELECT
        |    COUNT(*) FILTER (WHERE event_type = 'click') AS n1,
        |    SUM(x) FILTER (WHERE event_type = 'click') AS s1,
        |    SUM(x * x) FILTER (WHERE event_type = 'click') AS q1,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS n2,
        |    SUM(x) FILTER (WHERE event_type = 'purchase') AS s2,
        |    SUM(x * x) FILTER (WHERE event_type = 'purchase') AS q2
        |  FROM e)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(FLOOR(1000.0 * (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        |    / SQRT(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
        |          + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
        |        / (CAST(n1 AS DOUBLE) + n2 - 2))) AS BIGINT) AS d_milli
        |FROM g""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), floor(col("value") * lit(1000.0)).cast("long").as("x"))
      e.agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
          sum(when(col("event_type") === "click", col("x"))).as("s1"),
          sum(when(col("event_type") === "click", col("x") * col("x"))).as("q1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n2"),
          sum(when(col("event_type") === "purchase", col("x"))).as("s2"),
          sum(when(col("event_type") === "purchase", col("x") * col("x"))).as("q2"))
        .select(col("n1"), col("n2"),
          expr("CAST(FLOOR(1000.0D * (CAST(s1 AS DOUBLE) / n1" +
            " - CAST(s2 AS DOUBLE) / n2)" +
            " / SQRT(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)" +
            " + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))" +
            " / (CAST(n1 AS DOUBLE) + n2 - 2))) AS BIGINT)").as("d_milli"))
    },

    // Leading principal direction (power iteration, 3 rounds) of the
    // 4-feature covariance matrix — the first step of distributed PCA.
    // Covariance entries are EXACT integer numerators (n·Σxixj−ΣxiΣxj,
    // DECIMAL(38,0)/HUGEINT); each iteration is a 16-row matrix-vector
    // join at literal grain, then L∞ normalization to ±10⁶. Signed
    // normalization divides by the (positive) max-abs component:
    // DuckDB's // on INTEGER/HUGEINT truncates toward zero exactly
    // like Spark's div (probed — flooring only applies to its
    // float/decimal division), so negative components agree with no
    // correction term.
    QueryDef.sql(
      "q394_power_iteration_pca",
      """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(ROUND(l_discount * 100.0) AS BIGINT) AS x2,
        |    CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS x3,
        |    CAST(ROUND(l_tax * 100.0) AS BIGINT) AS x4
        |  FROM lineitem),
        |s AS (SELECT COUNT(*) AS n,
        |    SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3, SUM(x4) AS s4,
        |    SUM(CAST(x1 AS HUGEINT) * x1) AS s11, SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
        |    SUM(CAST(x1 AS HUGEINT) * x3) AS s13, SUM(CAST(x1 AS HUGEINT) * x4) AS s14,
        |    SUM(CAST(x2 AS HUGEINT) * x2) AS s22, SUM(CAST(x2 AS HUGEINT) * x3) AS s23,
        |    SUM(CAST(x2 AS HUGEINT) * x4) AS s24, SUM(CAST(x3 AS HUGEINT) * x3) AS s33,
        |    SUM(CAST(x3 AS HUGEINT) * x4) AS s34, SUM(CAST(x4 AS HUGEINT) * x4) AS s44
        |  FROM v),
        |mm AS (
        |  SELECT 1 AS i, 1 AS j, n * s11 - s1 * s1 AS m FROM s
        |  UNION ALL SELECT 1, 2, n * s12 - s1 * s2 FROM s
        |  UNION ALL SELECT 1, 3, n * s13 - s1 * s3 FROM s
        |  UNION ALL SELECT 1, 4, n * s14 - s1 * s4 FROM s
        |  UNION ALL SELECT 2, 1, n * s12 - s1 * s2 FROM s
        |  UNION ALL SELECT 2, 2, n * s22 - s2 * s2 FROM s
        |  UNION ALL SELECT 2, 3, n * s23 - s2 * s3 FROM s
        |  UNION ALL SELECT 2, 4, n * s24 - s2 * s4 FROM s
        |  UNION ALL SELECT 3, 1, n * s13 - s1 * s3 FROM s
        |  UNION ALL SELECT 3, 2, n * s23 - s2 * s3 FROM s
        |  UNION ALL SELECT 3, 3, n * s33 - s3 * s3 FROM s
        |  UNION ALL SELECT 3, 4, n * s34 - s3 * s4 FROM s
        |  UNION ALL SELECT 4, 1, n * s14 - s1 * s4 FROM s
        |  UNION ALL SELECT 4, 2, n * s24 - s2 * s4 FROM s
        |  UNION ALL SELECT 4, 3, n * s34 - s3 * s4 FROM s
        |  UNION ALL SELECT 4, 4, n * s44 - s4 * s4 FROM s),
        |v0 AS (SELECT unnest(generate_series(1, 4)) AS j,
        |        CAST(1000000 AS HUGEINT) AS c),
        |r1 AS (SELECT mm.i AS j, SUM(mm.m * v0.c) AS c
        |       FROM mm JOIN v0 ON mm.j = v0.j GROUP BY 1),
        |n1 AS (SELECT MAX(abs(c)) AS mx FROM r1),
        |v1 AS (SELECT j, c * 1000000 // mx AS c FROM r1, n1),
        |r2 AS (SELECT mm.i AS j, SUM(mm.m * v1.c) AS c
        |       FROM mm JOIN v1 ON mm.j = v1.j GROUP BY 1),
        |n2 AS (SELECT MAX(abs(c)) AS mx FROM r2),
        |v2 AS (SELECT j, c * 1000000 // mx AS c FROM r2, n2),
        |r3 AS (SELECT mm.i AS j, SUM(mm.m * v2.c) AS c
        |       FROM mm JOIN v2 ON mm.j = v2.j GROUP BY 1),
        |n3 AS (SELECT MAX(abs(c)) AS mx FROM r3)
        |SELECT r3.j AS component,
        |  CAST(r3.c * 1000000 // n3.mx AS BIGINT) AS eigvec_ppm
        |FROM r3, n3 ORDER BY component""".stripMargin) { (s, dir) =>
      val v = Tables(s, dir).lineitem
        .select(col("l_quantity").cast("long").as("x1"),
          round(col("l_discount") * lit(100.0)).cast("long").as("x2"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("x3"),
          round(col("l_tax") * lit(100.0)).cast("long").as("x4"))
      def p(a: String, b: String) =
        sum(col(a).cast("decimal(38,0)") * col(b)).as(s"s${a.last}${b.last}")
      val st = v.agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
        sum("x4").as("s4"),
        p("x1", "x1"), p("x1", "x2"), p("x1", "x3"), p("x1", "x4"),
        p("x2", "x2"), p("x2", "x3"), p("x2", "x4"),
        p("x3", "x3"), p("x3", "x4"), p("x4", "x4"))
      val idx = for (i <- 1 to 4; j <- 1 to 4) yield (i, j)
      val mm = idx.map { case (i, j) =>
        val (a, b) = if (i <= j) (i, j) else (j, i)
        st.select(lit(i).as("i"), lit(j).as("j"),
          expr(s"CAST(n AS DECIMAL(38,0)) * s$a$b" +
            s" - CAST(s$a AS DECIMAL(38,0)) * s$b").as("m"))
      }.reduce(_.unionByName(_))
      def fdiv(a: String, b: String) = expr(s"($a * 1000000) div $b")
      var vec = s.range(1, 5).select(col("id").as("j"),
        lit(1000000L).cast("decimal(38,0)").as("c"))
      for (_ <- 1 to 3) {
        val r = mm.join(broadcast(vec), mm("j") === vec("j"))
          .groupBy(mm("i").as("j2"))
          .agg(sum(col("m") * col("c")).as("c"))
          .select(col("j2").as("j"), col("c"))
        val nmax = r.agg(max(abs(col("c"))).as("mx"))
        vec = r.crossJoin(broadcast(nmax))
          .select(col("j"), fdiv("c", "mx").cast("decimal(38,0)").as("c"))
      }
      vec.select(col("j").as("component"),
          col("c").cast("long").as("eigvec_ppm"))
        .orderBy("component")
    },

    // Sequential-pattern mining: the most frequent 3-event paths per
    // user stream (adjacent trigrams via two LEADs over one
    // (user, time) window — both directions of q94's bigram LM).
    // Support counts plus the conditional continuation rate
    // P(3rd | first two) in exact ppm from the bigram grain. Top-20
    // with full deterministic tie-break.
    QueryDef.sql(
      "q395_trigram_paths",
      """WITH s AS (SELECT user_id, event_type AS a,
        |    lead(event_type, 1) OVER w AS b, lead(event_type, 2) OVER w AS c
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tri AS (SELECT a, b, c, COUNT(*) AS n FROM s
        |        WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3),
        |bi AS (SELECT a, b, SUM(n) AS bn FROM tri GROUP BY 1, 2)
        |SELECT tri.a, tri.b, tri.c, CAST(tri.n AS BIGINT) AS support,
        |  CAST(1000000 * tri.n // bi.bn AS BIGINT) AS cont_ppm
        |FROM tri JOIN bi ON tri.a = bi.a AND tri.b = bi.b
        |ORDER BY support DESC, tri.a, tri.b, tri.c LIMIT 20""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tri = Tables(s, dir).events
        .select(col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("event_type"), 2).over(w).as("c"))
        .where(col("b").isNotNull && col("c").isNotNull)
        .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
      val bi = tri.groupBy("a", "b").agg(sum("n").as("bn"))
      tri.join(broadcast(bi), Seq("a", "b"))
        .select(col("a"), col("b"), col("c"), col("n").as("support"),
          expr("CAST(1000000 * n div bn AS BIGINT)").as("cont_ppm"))
        .orderBy(col("support").desc, col("a"), col("b"), col("c"))
        .limit(20)
    },

    // Link prediction on the STRONG trade graph — lanes with
    // above-average line support (the relative threshold keeps the
    // graph sparse at every SF; the raw distinct graph saturates to
    // complete once data is dense, leaving nothing to predict):
    // common-neighbor and Jaccard scores for node pairs NOT already
    // linked, the classic graph-completion heuristic. Wedge
    // enumeration (two-hop join through the shared neighbor) counts
    // common neighbors; an anti-join against the edge set keeps only
    // absent links; Jaccard = cn / (deg(a)+deg(b)−cn) in exact ppm.
    // Everything past the one edge-projection pass runs on the
    // collapsed node/edge grain. Top-10 predicted links.
    QueryDef.sql(
      "q396_link_prediction",
      """WITH lanes AS MATERIALIZED (SELECT c.c_nationkey AS a,
        |    s.s_nationkey AS b, COUNT(*) AS cnt
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
        |m AS (SELECT SUM(cnt) AS tot, COUNT(*) AS nl FROM lanes),
        |e0 AS MATERIALIZED (SELECT a, b FROM lanes, m
        |     WHERE cnt * nl > tot),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
        |     UNION SELECT b, a FROM e0),
        |d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        |w AS (SELECT x.src AS u, y.dst AS v, COUNT(*) AS cn
        |      FROM e x JOIN e y ON x.dst = y.src
        |      WHERE x.src < y.dst GROUP BY 1, 2),
        |miss AS (SELECT w.u, w.v, w.cn FROM w
        |  LEFT JOIN e ON w.u = e.src AND w.v = e.dst
        |  WHERE e.src IS NULL)
        |SELECT m.u, m.v, CAST(m.cn AS BIGINT) AS common_neighbors,
        |  CAST(1000000 * m.cn // (du.deg + dv.deg - m.cn) AS BIGINT)
        |    AS jaccard_ppm
        |FROM miss m JOIN d du ON m.u = du.src JOIN d dv ON m.v = dv.src
        |ORDER BY common_neighbors DESC, jaccard_ppm DESC, m.u, m.v
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val lanes = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").cast("long").as("a"),
          col("s_nationkey").cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val m = lanes.agg(sum("cnt").as("tot"), count(lit(1)).as("nl"))
      val e0 = lanes.crossJoin(broadcast(m))
        .where(col("cnt") * col("nl") > col("tot"))
        .select("a", "b")
      val e = e0.select(col("a").as("src"), col("b").as("dst"))
        .union(e0.select(col("b"), col("a"))).distinct()
      val d = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val x = e.select(col("src").as("u"), col("dst").as("mid"))
      val y = e.select(col("src").as("mid2"), col("dst").as("v"))
      val w = x.join(y, col("mid") === col("mid2"))
        .where(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("cn"))
      val miss = w.join(e, w("u") === e("src") && w("v") === e("dst"), "left_anti")
      miss
        .join(d.select(col("src").as("du_k"), col("deg").as("du")), col("u") === col("du_k"))
        .join(d.select(col("src").as("dv_k"), col("deg").as("dv")), col("v") === col("dv_k"))
        .select(col("u"), col("v"), col("cn").as("common_neighbors"),
          expr("CAST(1000000 * cn div (du + dv - cn) AS BIGINT)").as("jaccard_ppm"))
        .orderBy(col("common_neighbors").desc, col("jaccard_ppm").desc,
          col("u"), col("v"))
        .limit(10)
    },

    // Value-at-Risk and expected shortfall of daily revenue: the p5
    // worst day (discrete rank-index quantile, q152's probed
    // convention) and the exact mean of the tail at or below it —
    // the finance risk pair, computed on the bounded day grain with
    // integer cents throughout (tail mean is a floored integer
    // division of exact sums).
    QueryDef.sql(
      "q397_var_cvar",
      """WITH d AS (SELECT
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, y, row_number() OVER (ORDER BY y, day) AS rk,
        |        COUNT(*) OVER () AS n FROM d),
        |q AS (SELECT MAX(y) AS var5 FROM r
        |      WHERE rk = CAST(ceil(n * 0.05) AS BIGINT)),
        |tail AS (SELECT COUNT(*) AS tn, SUM(y) AS ts FROM d, q
        |         WHERE d.y <= q.var5)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
        |  CAST(q.var5 AS BIGINT) AS var5_cents,
        |  CAST(tail.tn AS BIGINT) AS tail_days,
        |  CAST(tail.ts // tail.tn AS BIGINT) AS cvar_cents
        |FROM q, tail""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).orders
        .groupBy(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("y"))
      val q = d.select(col("y"),
          row_number().over(Window.orderBy("y", "day")).as("rk"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .where(col("rk") === ceil(col("n") * lit(0.05)).cast("long"))
        .agg(max("y").as("var5"))
      val tail = d.crossJoin(broadcast(q)).where(col("y") <= col("var5"))
        .agg(count(lit(1)).as("tn"), sum("y").as("ts"))
      val nD = d.agg(count(lit(1)).as("n_days"))
      nD.crossJoin(broadcast(q)).crossJoin(broadcast(tail))
        .select(col("n_days"), col("var5").as("var5_cents"),
          col("tn").as("tail_days"),
          expr("CAST(ts div tn AS BIGINT)").as("cvar_cents"))
    },

    // Critical path (longest weighted path, ≤ 4 edges) over the
    // key-ordered DAG of strong trade lanes — the scheduling twin of
    // q379's min-plus closure: max-plus relaxation L(v) =
    // max(L(v), L(u) + w(u,v)), four unrolled rounds on the collapsed
    // edge grain. Orienting every lane low-key → high-key makes the
    // graph acyclic by construction, so longest-path is well-defined;
    // weights are lane line counts.
    QueryDef.sql(
      "q398_critical_path",
      """WITH lanes AS MATERIALIZED (SELECT
        |    LEAST(c.c_nationkey, s.s_nationkey) AS a,
        |    GREATEST(c.c_nationkey, s.s_nationkey) AS b,
        |    COUNT(*) AS w
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
        |n AS (SELECT a AS nk FROM lanes UNION SELECT b FROM lanes),
        |l0 AS (SELECT nk, CAST(0 AS BIGINT) AS len FROM n),
        |l1 AS (SELECT nk, MAX(len) AS len FROM (
        |    SELECT nk, len FROM l0
        |    UNION ALL SELECT lanes.b, l0.len + lanes.w FROM lanes
        |    JOIN l0 ON lanes.a = l0.nk) GROUP BY 1),
        |l2 AS (SELECT nk, MAX(len) AS len FROM (
        |    SELECT nk, len FROM l1
        |    UNION ALL SELECT lanes.b, l1.len + lanes.w FROM lanes
        |    JOIN l1 ON lanes.a = l1.nk) GROUP BY 1),
        |l3 AS (SELECT nk, MAX(len) AS len FROM (
        |    SELECT nk, len FROM l2
        |    UNION ALL SELECT lanes.b, l2.len + lanes.w FROM lanes
        |    JOIN l2 ON lanes.a = l2.nk) GROUP BY 1),
        |l4 AS (SELECT nk, MAX(len) AS len FROM (
        |    SELECT nk, len FROM l3
        |    UNION ALL SELECT lanes.b, l3.len + lanes.w FROM lanes
        |    JOIN l3 ON lanes.a = l3.nk) GROUP BY 1)
        |SELECT nn.n_name, l4.len AS longest_in_weight
        |FROM l4 JOIN nation nn ON l4.nk = nn.n_nationkey
        |ORDER BY longest_in_weight DESC, nn.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val lanes = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
          greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
        .agg(count(lit(1)).as("w"))
      val n = lanes.select(col("a").as("nk")).union(lanes.select(col("b"))).distinct()
      var lvl = n.withColumn("len", lit(0L))
      for (_ <- 1 to 4) {
        val relaxed = lanes.join(broadcast(lvl), lanes("a") === lvl("nk"))
          .select(lanes("b").as("nk"), (lvl("len") + lanes("w")).as("len"))
        lvl = lvl.unionByName(relaxed).groupBy("nk").agg(max("len").as("len"))
      }
      lvl.join(broadcast(t.nation), lvl("nk") === col("n_nationkey"))
        .select(col("n_name"), col("len").as("longest_in_weight"))
        .orderBy(col("longest_in_weight").desc, col("n_name"))
    },

    // Inverse-CDF threshold probes: the fraction of orders under fixed
    // value thresholds per priority — the SLO-style "percent under
    // budget" gate (the probe-value inverse of q389's sup-gap). One
    // conditional-sum pass, exact ppm; thresholds are shared literals.
    QueryDef.sql(
      "q399_cdf_probes",
      """WITH o AS (SELECT o_orderpriority AS pri,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT pri, COUNT(*) AS n,
        |  CAST(1000000 * COUNT(*) FILTER (WHERE cents < 1000000) // COUNT(*)
        |    AS BIGINT) AS under_10k_ppm,
        |  CAST(1000000 * COUNT(*) FILTER (WHERE cents < 5000000) // COUNT(*)
        |    AS BIGINT) AS under_50k_ppm,
        |  CAST(1000000 * COUNT(*) FILTER (WHERE cents < 10000000) // COUNT(*)
        |    AS BIGINT) AS under_100k_ppm
        |FROM o GROUP BY 1 ORDER BY pri""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
        .select(col("o_orderpriority").as("pri"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      def probe(lim: Long, name: String) =
        expr(s"CAST(1000000 * sum(CASE WHEN cents < $lim THEN 1 ELSE 0 END)" +
          s" div count(1) AS BIGINT)").as(name)
      o.groupBy("pri")
        .agg(count(lit(1)).as("n"),
          probe(1000000L, "under_10k_ppm"),
          probe(5000000L, "under_50k_ppm"),
          probe(10000000L, "under_100k_ppm"))
        .orderBy("pri")
    },

    // Week-over-week audience overlap: Jaccard, churn, and new-user
    // shares between consecutive weekly active sets — the retention
    // twin of q297's cross-source duplication matrix, on the time
    // axis. Set sizes come from the (week, user) dedup grain; the
    // intersection is one equi-join on (user, week+1); churn/new are
    // set differences by subtraction — no full-outer join needed.
    QueryDef.sql(
      "q400_audience_overlap",
      """WITH du AS (SELECT DISTINCT
        |    date_diff('day', TIMESTAMP '2024-01-01', ts) // 7 AS wk, user_id
        |  FROM events),
        |sz AS (SELECT wk, COUNT(*) AS n FROM du GROUP BY 1),
        |ix AS (SELECT a.wk AS wk, COUNT(*) AS inter FROM du a
        |       JOIN du b ON a.user_id = b.user_id AND b.wk = a.wk + 1
        |       GROUP BY 1)
        |SELECT sa.wk AS week_a, sa.wk + 1 AS week_b,
        |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
        |  CAST(ix.inter AS BIGINT) AS inter,
        |  CAST(1000000 * ix.inter // (sa.n + sb.n - ix.inter) AS BIGINT)
        |    AS jaccard_ppm,
        |  CAST(1000000 * (sa.n - ix.inter) // sa.n AS BIGINT) AS churn_ppm,
        |  CAST(1000000 * (sb.n - ix.inter) // sb.n AS BIGINT) AS new_ppm
        |FROM sz sa JOIN sz sb ON sb.wk = sa.wk + 1
        |JOIN ix ON ix.wk = sa.wk
        |ORDER BY week_a""".stripMargin) { (s, dir) =>
      val du = Tables(s, dir).events
        .select(expr("CAST(datediff(to_date(ts), DATE '2024-01-01') AS BIGINT)" +
            " div 7").as("wk"), col("user_id"))
        .distinct()
      val sz = du.groupBy("wk").agg(count(lit(1)).as("n"))
      val b = du.select(col("user_id").as("u2"), col("wk").as("wk2"))
      val ix = du.join(b, col("user_id") === col("u2")
          && col("wk2") === col("wk") + 1)
        .groupBy(col("wk")).agg(count(lit(1)).as("inter"))
      val sa = sz.select(col("wk").as("week_a"), col("n").as("n_a"))
      val sb = sz.select(col("wk").as("wkb"), col("n").as("n_b"))
      sa.join(sb, col("wkb") === col("week_a") + 1)
        .join(ix.select(col("wk").as("wkx"), col("inter")),
          col("wkx") === col("week_a"))
        .select(col("week_a"), (col("week_a") + 1).as("week_b"),
          col("n_a"), col("n_b"), col("inter"),
          expr("CAST(1000000 * inter div (n_a + n_b - inter) AS BIGINT)")
            .as("jaccard_ppm"),
          expr("CAST(1000000 * (n_a - inter) div n_a AS BIGINT)").as("churn_ppm"),
          expr("CAST(1000000 * (n_b - inter) div n_b AS BIGINT)").as("new_ppm"))
        .orderBy("week_a")
    },

    // Price-ending forensics: the distribution of cents mod 100 across
    // order totals — q355's Benford audit looks at the FIRST digit,
    // this at the LAST two (psychological-pricing / fabrication
    // signal). Top-10 endings by share with signed deviation from the
    // uniform 10000 ppm; one aggregation pass on the 100-value ending
    // grain.
    QueryDef.sql(
      "q401_price_endings",
      """WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) % 100
        |      AS ending
        |  FROM orders),
        |g AS (SELECT ending, COUNT(*) AS n FROM c GROUP BY 1),
        |t AS (SELECT SUM(n) AS total FROM g)
        |SELECT ending, CAST(n AS BIGINT) AS n,
        |  CAST(1000000 * n // total AS BIGINT) AS share_ppm,
        |  CAST(1000000 * n // total - 10000 AS BIGINT) AS dev_ppm
        |FROM g, t ORDER BY n DESC, ending LIMIT 10""".stripMargin) { (s, dir) =>
      val g = Tables(s, dir).orders
        .select((floor(col("o_totalprice") * lit(100.0)).cast("long") % 100)
          .as("ending"))
        .groupBy("ending").agg(count(lit(1)).as("n"))
      val t = g.agg(sum("n").as("total"))
      g.crossJoin(broadcast(t))
        .select(col("ending"), col("n"),
          expr("CAST(1000000 * n div total AS BIGINT)").as("share_ppm"),
          expr("CAST(1000000 * n div total - 10000 AS BIGINT)").as("dev_ppm"))
        .orderBy(col("n").desc, col("ending"))
        .limit(10)
    },

    // Directed-triad motif census on the strong trade graph:
    // reciprocal edges, feed-forward triangles (a→b→c with shortcut
    // a→c) and directed 3-cycles (canonicalized at the minimum node so
    // each cycle counts once) — the building-block census of network
    // science, distinct from q159's undirected triangle count. All
    // enumeration happens on the collapsed strong-lane edge grain
    // (two-hop join + closing-edge semi-join).
    QueryDef.sql(
      "q402_motif_census",
      """WITH lanes AS MATERIALIZED (SELECT s.s_nationkey AS a,
        |    c.c_nationkey AS b, COUNT(*) AS cnt
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey GROUP BY 1, 2),
        |m AS (SELECT SUM(cnt) AS tot, COUNT(*) AS nl FROM lanes),
        |e AS MATERIALIZED (SELECT a, b FROM lanes, m WHERE cnt * nl > tot),
        |recip AS (SELECT COUNT(*) AS n FROM e x
        |          JOIN e y ON x.a = y.b AND x.b = y.a WHERE x.a < x.b),
        |ff AS (SELECT COUNT(*) AS n FROM e x
        |       JOIN e y ON x.b = y.a
        |       JOIN e z ON z.a = x.a AND z.b = y.b
        |       WHERE x.a <> y.b),
        |cyc AS (SELECT COUNT(*) AS n FROM e x
        |        JOIN e y ON x.b = y.a
        |        JOIN e z ON z.a = y.b AND z.b = x.a
        |        WHERE x.a < x.b AND x.a < y.b)
        |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
        |  recip.n AS n_reciprocal, ff.n AS n_feedforward, cyc.n AS n_cycles
        |FROM recip, ff, cyc""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val lanes = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").cast("long").as("a"),
          col("c_nationkey").cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val m = lanes.agg(sum("cnt").as("tot"), count(lit(1)).as("nl"))
      val e = lanes.crossJoin(broadcast(m))
        .where(col("cnt") * col("nl") > col("tot")).select("a", "b")
      val x = e.select(col("a").as("xa"), col("b").as("xb"))
      val y = e.select(col("a").as("ya"), col("b").as("yb"))
      val z = e.select(col("a").as("za"), col("b").as("zb"))
      val recip = x.join(y, col("xa") === col("yb") && col("xb") === col("ya"))
        .where(col("xa") < col("xb")).agg(count(lit(1)).as("n_reciprocal"))
      val ff = x.join(y, col("xb") === col("ya")).where(col("xa") =!= col("yb"))
        .join(z, col("za") === col("xa") && col("zb") === col("yb"))
        .agg(count(lit(1)).as("n_feedforward"))
      val cyc = x.join(y, col("xb") === col("ya"))
        .join(z, col("za") === col("yb") && col("zb") === col("xa"))
        .where(col("xa") < col("xb") && col("xa") < col("yb"))
        .agg(count(lit(1)).as("n_cycles"))
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(recip)).crossJoin(broadcast(ff))
        .crossJoin(broadcast(cyc))
    },

    // Standardized Pearson residuals of the event-type × day-of-week
    // contingency table — WHICH cells drive q313/q392's global
    // statistics: (n·O − rt·ct) / √(n·rt·ct) per cell, integer-exact
    // numerator, one IEEE sqrt, milli-units. Day-of-week is computed
    // engine-neutrally as days-since-Monday-anchor mod 7 (the two
    // engines disagree on dayofweek() numbering).
    QueryDef.sql(
      "q403_pearson_residuals",
      """WITH e AS (SELECT event_type,
        |    date_diff('day', TIMESTAMP '2024-01-01', ts) % 7 AS dow
        |  FROM events),
        |o AS (SELECT event_type, dow, COUNT(*) AS obs FROM e GROUP BY 1, 2),
        |rt AS (SELECT event_type, SUM(obs) AS rt FROM o GROUP BY 1),
        |ct AS (SELECT dow, SUM(obs) AS ct FROM o GROUP BY 1),
        |n AS (SELECT SUM(obs) AS n FROM o)
        |SELECT o.event_type, o.dow, CAST(o.obs AS BIGINT) AS obs,
        |  CAST(rt.rt * ct.ct // n.n AS BIGINT) AS expected_floor,
        |  CAST(FLOOR(1000.0 * (CAST(n.n AS DOUBLE) * o.obs
        |      - CAST(rt.rt AS DOUBLE) * ct.ct)
        |    / SQRT(CAST(n.n AS DOUBLE) * rt.rt * ct.ct)) AS BIGINT)
        |    AS resid_milli
        |FROM o JOIN rt ON o.event_type = rt.event_type
        |JOIN ct ON o.dow = ct.dow CROSS JOIN n
        |ORDER BY o.event_type, o.dow""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"),
          (datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long") % 7).as("dow"))
      val o = e.groupBy("event_type", "dow").agg(count(lit(1)).as("obs"))
      val rt = o.groupBy("event_type").agg(sum("obs").as("rt"))
      val ct = o.groupBy("dow").agg(sum("obs").as("ct"))
      val n = o.agg(sum("obs").as("n"))
      o.join(broadcast(rt), "event_type").join(broadcast(ct), "dow")
        .crossJoin(broadcast(n))
        .select(col("event_type"), col("dow"), col("obs"),
          expr("CAST(rt * ct div n AS BIGINT)").as("expected_floor"),
          expr("CAST(FLOOR(1000.0D * (CAST(n AS DOUBLE) * obs" +
            " - CAST(rt AS DOUBLE) * ct)" +
            " / SQRT(CAST(n AS DOUBLE) * rt * ct)) AS BIGINT)").as("resid_milli"))
        .orderBy("event_type", "dow")
    },

    // Rank-mobility matrix: suppliers quintiled by revenue in 1999 and
    // again in 2000 (ntile(5) with suppkey tie-break, q361's
    // convention); the transition-count matrix with row-share ppm
    // answers "how sticky is market position?". Inner join keeps
    // suppliers active both years; the matrix grain is ≤ 25 cells
    // regardless of supplier count.
    QueryDef.sql(
      "q404_rank_mobility",
      """WITH r AS (SELECT l.l_suppkey AS sk, year(o.o_orderdate) AS yr,
        |    SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS cents
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) IN (1999, 2000) GROUP BY 1, 2),
        |q AS (SELECT sk, yr,
        |    ntile(5) OVER (PARTITION BY yr ORDER BY cents, sk) AS quint
        |  FROM r),
        |tr AS (SELECT a.quint AS from_q, b.quint AS to_q, COUNT(*) AS n
        |  FROM q a JOIN q b ON a.sk = b.sk
        |  WHERE a.yr = 1999 AND b.yr = 2000 GROUP BY 1, 2),
        |rt AS (SELECT from_q, SUM(n) AS tot FROM tr GROUP BY 1)
        |SELECT CAST(tr.from_q AS BIGINT) AS from_q,
        |  CAST(tr.to_q AS BIGINT) AS to_q, CAST(tr.n AS BIGINT) AS n,
        |  CAST(1000000 * tr.n // rt.tot AS BIGINT) AS row_ppm
        |FROM tr JOIN rt ON tr.from_q = rt.from_q
        |ORDER BY from_q, to_q""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val r = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .where(year(col("o_orderdate")).isin(1999, 2000))
        .groupBy(col("l_suppkey").as("sk"), year(col("o_orderdate")).as("yr"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("cents"))
      val q = r.select(col("sk"), col("yr"),
        ntile(5).over(Window.partitionBy("yr").orderBy("cents", "sk")).as("quint"))
      val a = q.where(col("yr") === 1999).select(col("sk"), col("quint").as("from_q"))
      val b = q.where(col("yr") === 2000)
        .select(col("sk").as("sk2"), col("quint").as("to_q"))
      val tr = a.join(b, col("sk") === col("sk2"))
        .groupBy("from_q", "to_q").agg(count(lit(1)).as("n"))
      val rt = tr.groupBy("from_q").agg(sum("n").as("tot"))
      tr.join(broadcast(rt), "from_q")
        .select(col("from_q").cast("long"), col("to_q").cast("long"), col("n"),
          expr("CAST(1000000 * n div tot AS BIGINT)").as("row_ppm"))
        .orderBy("from_q", "to_q")
    },

    // Inclusion-dependency profiling — FK discovery by data: for five
    // candidate column pairs, the distinct-value inclusion coefficient
    // |A∩B| / |A| in ppm (1e6 ⟺ A ⊆ B, a foreign-key candidate; the
    // reverse direction and a deliberate negative control calibrate
    // the score). Each pair costs two dedup aggregates and one
    // distinct-grain join — the schema-discovery primitive for
    // untrusted data lakes.
    QueryDef.sql(
      "q405_inclusion_deps",
      """WITH pairs AS (
        |  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS cand,
        |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS na,
        |    (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS nb,
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) a
        |      JOIN (SELECT DISTINCT o_orderkey FROM orders) b
        |      ON a.l_orderkey = b.o_orderkey) AS ni
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer.c_custkey',
        |    (SELECT COUNT(DISTINCT o_custkey) FROM orders),
        |    (SELECT COUNT(DISTINCT c_custkey) FROM customer),
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders) a
        |      JOIN (SELECT DISTINCT c_custkey FROM customer) b
        |      ON a.o_custkey = b.c_custkey)
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part.p_partkey',
        |    (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
        |    (SELECT COUNT(DISTINCT p_partkey) FROM part),
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey FROM lineitem) a
        |      JOIN (SELECT DISTINCT p_partkey FROM part) b
        |      ON a.l_partkey = b.p_partkey)
        |  UNION ALL
        |  SELECT 'customer.c_custkey->orders.o_custkey',
        |    (SELECT COUNT(DISTINCT c_custkey) FROM customer),
        |    (SELECT COUNT(DISTINCT o_custkey) FROM orders),
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer) a
        |      JOIN (SELECT DISTINCT o_custkey FROM orders) b
        |      ON a.c_custkey = b.o_custkey)
        |  UNION ALL
        |  SELECT 'part.p_size->nation.n_nationkey',
        |    (SELECT COUNT(DISTINCT p_size) FROM part),
        |    (SELECT COUNT(DISTINCT n_nationkey) FROM nation),
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT p_size FROM part) a
        |      JOIN (SELECT DISTINCT n_nationkey FROM nation) b
        |      ON a.p_size = b.n_nationkey))
        |SELECT cand, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(ni AS BIGINT) AS n_inter,
        |  CAST(1000000 * ni // na AS BIGINT) AS inclusion_ppm
        |FROM pairs ORDER BY cand""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def pair(label: String, a: DataFrame, ac: String,
               b: DataFrame, bc: String): DataFrame = {
        val da = a.select(col(ac).cast("long").as("k")).distinct()
        val db = b.select(col(bc).cast("long").as("k")).distinct()
        val na = da.agg(count(lit(1)).as("n_a"))
        val nb = db.agg(count(lit(1)).as("n_b"))
        val ni = da.join(db, "k").agg(count(lit(1)).as("n_inter"))
        na.crossJoin(nb).crossJoin(ni)
          .select(lit(label).as("cand"), col("n_a"), col("n_b"), col("n_inter"),
            expr("CAST(1000000 * n_inter div n_a AS BIGINT)").as("inclusion_ppm"))
      }
      Seq(
        pair("lineitem.l_orderkey->orders.o_orderkey",
          t.lineitem, "l_orderkey", t.orders, "o_orderkey"),
        pair("orders.o_custkey->customer.c_custkey",
          t.orders, "o_custkey", t.customer, "c_custkey"),
        pair("lineitem.l_partkey->part.p_partkey",
          t.lineitem, "l_partkey", t.part, "p_partkey"),
        pair("customer.c_custkey->orders.o_custkey",
          t.customer, "c_custkey", t.orders, "o_custkey"),
        pair("part.p_size->nation.n_nationkey",
          t.part, "p_size", t.nation, "n_nationkey"))
        .reduce(_.unionByName(_))
        .orderBy("cand")
    },

    // Pinball-loss backtest of quantile forecasts: discrete p25/p50/p75
    // fitted per event type on the first half-month predict the second
    // half; each is scored under ITS OWN quantile's pinball loss,
    // ×4-scaled so the 0.25/0.75 weights stay integral — loss stays
    // EXACT integer end-to-end (the proper scoring rule for quantile
    // forecasts, and the q152 rank-index quantile machinery reused as
    // a train/test pipeline). Per-row mean loss in exact div units.
    QueryDef.sql(
      "q406_pinball_loss",
      """WITH e AS (SELECT event_type,
        |    date_diff('day', TIMESTAMP '2024-01-01', ts) AS day,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS y
        |  FROM events),
        |tr AS (SELECT event_type, y FROM e WHERE day < 15),
        |te AS (SELECT event_type, y FROM e WHERE day >= 15),
        |r AS (SELECT event_type, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY y) AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM tr),
        |qs AS (SELECT event_type,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.25) AS BIGINT) THEN y END) AS p25,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.50) AS BIGINT) THEN y END) AS p50,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.75) AS BIGINT) THEN y END) AS p75
        |  FROM r GROUP BY 1),
        |pred AS (
        |  SELECT event_type, 25 AS q, p25 AS yhat, 1 AS wu, 3 AS wo FROM qs
        |  UNION ALL SELECT event_type, 50, p50, 2, 2 FROM qs
        |  UNION ALL SELECT event_type, 75, p75, 3, 1 FROM qs),
        |l AS (SELECT p.event_type, p.q, p.yhat, COUNT(*) AS n_test,
        |    SUM(CASE WHEN te.y >= p.yhat THEN p.wu * (te.y - p.yhat)
        |             ELSE p.wo * (p.yhat - te.y) END) AS loss4
        |  FROM pred p JOIN te ON p.event_type = te.event_type
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(q AS BIGINT) AS q, CAST(yhat AS BIGINT) AS yhat,
        |  CAST(n_test AS BIGINT) AS n_test,
        |  CAST(loss4 // n_test AS BIGINT) AS mean_loss4
        |FROM l ORDER BY event_type, q""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("day"),
          floor(col("value") * lit(1000000.0)).cast("long").as("y"))
      val tr = e.where(col("day") < 15)
      val te = e.where(col("day") >= 15)
      val wq = Window.partitionBy("event_type").orderBy("y")
      val r = tr.select(col("event_type"), col("y"),
        row_number().over(wq).as("rk"),
        count(lit(1)).over(Window.partitionBy("event_type")).as("n"))
      val qs = r.groupBy("event_type")
        .agg(max(when(col("rk") === ceil(col("n") * 0.25).cast("long"), col("y"))).as("p25"),
          max(when(col("rk") === ceil(col("n") * 0.50).cast("long"), col("y"))).as("p50"),
          max(when(col("rk") === ceil(col("n") * 0.75).cast("long"), col("y"))).as("p75"))
      val pred = Seq(("p25", 25, 1, 3), ("p50", 50, 2, 2), ("p75", 75, 3, 1))
        .map { case (c, q, wu, wo) =>
          qs.select(col("event_type"), lit(q.toLong).as("q"), col(c).as("yhat"),
            lit(wu.toLong).as("wu"), lit(wo.toLong).as("wo"))
        }.reduce(_.unionByName(_))
      broadcast(pred).join(te, "event_type")
        .groupBy("event_type", "q", "yhat")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("y") >= col("yhat"), col("wu") * (col("y") - col("yhat")))
            .otherwise(col("wo") * (col("yhat") - col("y")))).as("loss4"))
        .select(col("event_type"), col("q"), col("yhat"), col("n_test"),
          expr("CAST(loss4 div n_test AS BIGINT)").as("mean_loss4"))
        .orderBy("event_type", "q")
    },

    // Transition dwell-time profile: for each consecutive event-type
    // pair in a user's stream, the count, exact mean, and discrete
    // median of the inter-event gap (µs) — q368's Markov chain gains
    // its time dimension. One LAG window produces (pair, gap); the
    // median runs the q152 rank-index pattern partitioned by pair —
    // distributed, no per-group collect.
    QueryDef.sql(
      "q407_dwell_times",
      """WITH s AS (SELECT user_id, event_type AS a, epoch_us(ts) AS us,
        |    lead(event_type) OVER w AS b, lead(epoch_us(ts)) OVER w AS us2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT a, b, us2 - us AS gap FROM s WHERE b IS NOT NULL),
        |r AS (SELECT a, b, gap,
        |    row_number() OVER (PARTITION BY a, b ORDER BY gap) AS rk,
        |    COUNT(*) OVER (PARTITION BY a, b) AS n,
        |    SUM(gap) OVER (PARTITION BY a, b) AS sg
        |  FROM g)
        |SELECT a, b, CAST(MIN(n) AS BIGINT) AS n,
        |  CAST(MIN(sg) // MIN(n) AS BIGINT) AS mean_gap_us,
        |  CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN gap END) AS BIGINT)
        |    AS median_gap_us
        |FROM r GROUP BY a, b ORDER BY a, b""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val g = Tables(s, dir).events
        .select(col("event_type").as("a"), unix_micros(col("ts")).as("us"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(unix_micros(col("ts")), 1).over(w).as("us2"))
        .where(col("b").isNotNull)
        .select(col("a"), col("b"), (col("us2") - col("us")).as("gap"))
      val wp = Window.partitionBy("a", "b")
      val r = g.select(col("a"), col("b"), col("gap"),
        row_number().over(wp.orderBy("gap")).as("rk"),
        count(lit(1)).over(wp).as("n"), sum("gap").over(wp).as("sg"))
      r.groupBy("a", "b")
        .agg(min("n").as("n"), min("sg").as("sg"),
          max(when(col("rk") === expr("(n + 1) div 2"), col("gap"))).as("median_gap_us"))
        .select(col("a"), col("b"), col("n"),
          expr("CAST(sg div n AS BIGINT)").as("mean_gap_us"),
          col("median_gap_us"))
        .orderBy("a", "b")
    },

    // 2-D equi-depth grid index build: quartile boundaries on order
    // day, then per-day-band quartiles of the total (the q152
    // rank-index pattern partitioned by band — distributed, no global
    // ntile) → the 16-cell occupancy + bounds frame an IVF-style
    // coarse index would store. Near-equal occupancy is the build
    // invariant; boundaries land on data values (discrete convention).
    QueryDef.sql(
      "q408_quantile_grid",
      """WITH o AS (SELECT
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS d,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |dg AS (SELECT d, COUNT(*) AS cnt FROM o GROUP BY 1),
        |dr AS (SELECT d, cnt,
        |    SUM(cnt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(cnt) OVER () AS n FROM dg),
        |db AS (SELECT
        |    MIN(CASE WHEN 4 * cum >= n THEN d END) AS b1,
        |    MIN(CASE WHEN 2 * cum >= n THEN d END) AS b2,
        |    MIN(CASE WHEN 4 * cum >= 3 * n THEN d END) AS b3
        |  FROM dr),
        |ob AS (SELECT cents,
        |    CASE WHEN d <= b1 THEN 1 WHEN d <= b2 THEN 2
        |         WHEN d <= b3 THEN 3 ELSE 4 END AS xb
        |  FROM o, db),
        |r AS (SELECT xb, cents,
        |    row_number() OVER (PARTITION BY xb ORDER BY cents) AS rk,
        |    COUNT(*) OVER (PARTITION BY xb) AS n FROM ob),
        |yb AS (SELECT xb,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.25) AS BIGINT) THEN cents END) AS c1,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.50) AS BIGINT) THEN cents END) AS c2,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.75) AS BIGINT) THEN cents END) AS c3
        |  FROM r GROUP BY 1),
        |cells AS (SELECT ob.xb,
        |    CASE WHEN ob.cents <= yb.c1 THEN 1 WHEN ob.cents <= yb.c2 THEN 2
        |         WHEN ob.cents <= yb.c3 THEN 3 ELSE 4 END AS yb_,
        |    ob.cents
        |  FROM ob JOIN yb ON ob.xb = yb.xb)
        |SELECT xb AS x_bucket, yb_ AS y_bucket, COUNT(*) AS n_rows,
        |  CAST(MIN(cents) AS BIGINT) AS min_cents,
        |  CAST(MAX(cents) AS BIGINT) AS max_cents
        |FROM cells GROUP BY 1, 2 ORDER BY x_bucket, y_bucket""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
        .select(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("d"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      val dg = o.groupBy("d").agg(count(lit(1)).as("cnt"))
      val wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val dr = dg.select(col("d"), sum("cnt").over(wc).as("cum"),
        sum("cnt").over(Window.partitionBy()).as("n"))
      val db = dr.agg(
        min(when(lit(4) * col("cum") >= col("n"), col("d"))).as("b1"),
        min(when(lit(2) * col("cum") >= col("n"), col("d"))).as("b2"),
        min(when(lit(4) * col("cum") >= lit(3) * col("n"), col("d"))).as("b3"))
      val ob = o.crossJoin(broadcast(db))
        .select(col("cents"),
          when(col("d") <= col("b1"), 1).when(col("d") <= col("b2"), 2)
            .when(col("d") <= col("b3"), 3).otherwise(4).as("xb"))
      val wx = Window.partitionBy("xb")
      val r = ob.select(col("xb"), col("cents"),
        row_number().over(wx.orderBy("cents")).as("rk"),
        count(lit(1)).over(wx).as("n"))
      val yb = r.groupBy("xb")
        .agg(max(when(col("rk") === ceil(col("n") * 0.25).cast("long"), col("cents"))).as("c1"),
          max(when(col("rk") === ceil(col("n") * 0.50).cast("long"), col("cents"))).as("c2"),
          max(when(col("rk") === ceil(col("n") * 0.75).cast("long"), col("cents"))).as("c3"))
      ob.join(broadcast(yb), "xb")
        .select(col("xb"),
          when(col("cents") <= col("c1"), 1).when(col("cents") <= col("c2"), 2)
            .when(col("cents") <= col("c3"), 3).otherwise(4).as("yb_"),
          col("cents"))
        .groupBy(col("xb").as("x_bucket"), col("yb_").as("y_bucket"))
        .agg(count(lit(1)).as("n_rows"), min("cents").as("min_cents"),
          max("cents").as("max_cents"))
        .orderBy("x_bucket", "y_bucket")
    },

    // k-truss core (k=4) of the strong trade graph: edges supported by
    // ≥ 2 triangles, with the support RECOMPUTED once after the first
    // peel (two unrolled rounds of the truss fixpoint — each round is
    // a wedge join + per-edge count at edge grain, the graph-cohesion
    // step up from q3xx's k-core which peels by degree instead of
    // triangle support).
    QueryDef.sql(
      "q409_ktruss",
      """WITH lanes AS MATERIALIZED (SELECT
        |    LEAST(c.c_nationkey, s.s_nationkey) AS a,
        |    GREATEST(c.c_nationkey, s.s_nationkey) AS b, COUNT(*) AS cnt
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
        |m AS (SELECT SUM(cnt) AS tot, COUNT(*) AS nl FROM lanes),
        |e1 AS MATERIALIZED (SELECT a, b FROM lanes, m WHERE cnt * nl > tot),
        |s1 AS (SELECT e.a, e.b, COUNT(*) AS sup FROM e1 e
        |       JOIN e1 x ON x.a = e.a JOIN e1 y
        |         ON y.a = x.b AND y.b = e.b
        |       GROUP BY 1, 2),
        |e2 AS MATERIALIZED (SELECT a, b FROM s1 WHERE sup >= 2),
        |s2 AS (SELECT e.a, e.b, COUNT(*) AS sup FROM e2 e
        |       JOIN e2 x ON x.a = e.a JOIN e2 y
        |         ON y.a = x.b AND y.b = e.b
        |       GROUP BY 1, 2)
        |SELECT a, b, CAST(sup AS BIGINT) AS support
        |FROM s2 WHERE sup >= 2 ORDER BY a, b""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val lanes = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
          greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val m = lanes.agg(sum("cnt").as("tot"), count(lit(1)).as("nl"))
      var e = lanes.crossJoin(broadcast(m))
        .where(col("cnt") * col("nl") > col("tot")).select("a", "b")
      var out: DataFrame = null
      for (_ <- 1 to 2) {
        val x = e.select(col("a").as("xa"), col("b").as("xb"))
        val y = e.select(col("a").as("ya"), col("b").as("yb"))
        val sup = e
          .join(x, col("xa") === col("a"))
          .join(y, col("ya") === col("xb") && col("yb") === col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("sup"))
          .where(col("sup") >= 2)
        out = sup
        e = sup.select("a", "b")
      }
      out.select(col("a"), col("b"), col("sup").as("support"))
        .orderBy("a", "b")
    },

    // Robust (quantile-based) shape statistics per event type: Bowley
    // skewness from quartiles and Moors kurtosis from octiles — no
    // moments, so single outliers can't dominate (the robust
    // complement of q98's moment stats). All eight octiles come from
    // ONE rank-index window pass; the signed ratios use plain integer
    // division — portable, since both engines truncate toward zero
    // (probed round 4).
    QueryDef.sql(
      "q410_robust_moments",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v FROM events),
        |r AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
        |o AS (SELECT event_type,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.125) AS BIGINT) THEN v END) AS e1,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.250) AS BIGINT) THEN v END) AS e2,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.375) AS BIGINT) THEN v END) AS e3,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.500) AS BIGINT) THEN v END) AS e4,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.625) AS BIGINT) THEN v END) AS e5,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.750) AS BIGINT) THEN v END) AS e6,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.875) AS BIGINT) THEN v END) AS e7
        |  FROM r GROUP BY 1)
        |SELECT event_type, CAST(e2 AS BIGINT) AS q1, CAST(e4 AS BIGINT) AS q2,
        |  CAST(e6 AS BIGINT) AS q3,
        |  CAST(1000000 * (e2 + e6 - 2 * e4) // (e6 - e2) AS BIGINT)
        |    AS bowley_skew_ppm,
        |  CAST(1000000 * ((e7 - e5) + (e3 - e1)) // (e6 - e2) AS BIGINT)
        |    AS moors_kurt_ppm
        |FROM o ORDER BY event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(1000000.0)).cast("long").as("v"))
      val wp = Window.partitionBy("event_type")
      val r = e.select(col("event_type"), col("v"),
        row_number().over(wp.orderBy("v")).as("rk"),
        count(lit(1)).over(wp).as("n"))
      def oct(k: Double, out: String) =
        max(when(col("rk") === ceil(col("n") * k).cast("long"), col("v"))).as(out)
      r.groupBy("event_type")
        .agg(oct(0.125, "e1"), oct(0.250, "e2"), oct(0.375, "e3"),
          oct(0.500, "e4"), oct(0.625, "e5"), oct(0.750, "e6"), oct(0.875, "e7"))
        .select(col("event_type"), col("e2").as("q1"), col("e4").as("q2"),
          col("e6").as("q3"),
          expr("CAST(1000000 * (e2 + e6 - 2 * e4) div (e6 - e2) AS BIGINT)")
            .as("bowley_skew_ppm"),
          expr("CAST(1000000 * ((e7 - e5) + (e3 - e1)) div (e6 - e2) AS BIGINT)")
            .as("moors_kurt_ppm"))
        .orderBy("event_type")
    },

    // Shift-share decomposition of each nation's 1999→2000 revenue
    // change: national-growth component (what growing at the national
    // rate would add), industry-mix component (the nation's part-type
    // portfolio vs the national rate), and the competitive shift
    // (out/under-performance within each type), plus the exact
    // floor-residual — the regional-economics standard, in exact
    // ppm-scaled cents (growth rates are 10⁶-scaled integer ratios;
    // both engines truncate division identically). Effects assemble on
    // the (nation, type) grain; the full-data pass is one aggregate.
    QueryDef.sql(
      "q411_shift_share",
      """WITH g AS (SELECT n.n_name, p.p_type, year(o.o_orderdate) AS yr,
        |    SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS r
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE year(o.o_orderdate) IN (1999, 2000) GROUP BY 1, 2, 3),
        |w AS (SELECT a.n_name, a.p_type, a.r AS r0, COALESCE(b.r, 0) AS r1
        |  FROM (SELECT * FROM g WHERE yr = 1999) a
        |  LEFT JOIN (SELECT * FROM g WHERE yr = 2000) b
        |  ON a.n_name = b.n_name AND a.p_type = b.p_type),
        |nat AS (SELECT 1000000 * SUM(r1) // SUM(r0) AS gn FROM w),
        |ind AS (SELECT p_type, 1000000 * SUM(r1) // SUM(r0) AS gi
        |        FROM w GROUP BY 1),
        |eff AS (SELECT w.n_name,
        |    SUM(w.r1 - w.r0) AS delta,
        |    SUM(w.r0 * (nat.gn - 1000000) // 1000000) AS nat_eff,
        |    SUM(w.r0 * (ind.gi - nat.gn) // 1000000) AS mix_eff,
        |    SUM(w.r1 - w.r0 * ind.gi // 1000000) AS shift_eff
        |  FROM w JOIN ind ON w.p_type = ind.p_type CROSS JOIN nat
        |  GROUP BY 1)
        |SELECT n_name, CAST(delta AS BIGINT) AS delta_cents,
        |  CAST(nat_eff AS BIGINT) AS national_cents,
        |  CAST(mix_eff AS BIGINT) AS mix_cents,
        |  CAST(shift_eff AS BIGINT) AS shift_cents,
        |  CAST(delta - nat_eff - mix_eff - shift_eff AS BIGINT) AS residual_cents
        |FROM eff ORDER BY n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val g = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(t.part.select("p_partkey", "p_type"), col("l_partkey") === col("p_partkey"))
        .where(year(col("o_orderdate")).isin(1999, 2000))
        .groupBy(col("n_name"), col("p_type"), year(col("o_orderdate")).as("yr"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("r"))
      val a = g.where(col("yr") === 1999).select(col("n_name"), col("p_type"), col("r").as("r0"))
      val b = g.where(col("yr") === 2000)
        .select(col("n_name").as("n2"), col("p_type").as("t2"), col("r").as("r1"))
      val w = a.join(b, col("n_name") === col("n2") && col("p_type") === col("t2"), "left")
        .select(col("n_name"), col("p_type"), col("r0"), coalesce(col("r1"), lit(0L)).as("r1"))
      val nat = w.agg(expr("1000000 * sum(r1) div sum(r0)").as("gn"))
      val ind = w.groupBy("p_type").agg(expr("1000000 * sum(r1) div sum(r0)").as("gi"))
      w.join(broadcast(ind), "p_type").crossJoin(broadcast(nat))
        .groupBy("n_name")
        .agg(sum(col("r1") - col("r0")).as("delta"),
          sum(expr("r0 * (gn - 1000000) div 1000000")).as("nat_eff"),
          sum(expr("r0 * (gi - gn) div 1000000")).as("mix_eff"),
          sum(expr("r1 - r0 * gi div 1000000")).as("shift_eff"))
        .select(col("n_name"), col("delta").as("delta_cents"),
          col("nat_eff").as("national_cents"), col("mix_eff").as("mix_cents"),
          col("shift_eff").as("shift_cents"),
          (col("delta") - col("nat_eff") - col("mix_eff") - col("shift_eff"))
            .as("residual_cents"))
        .orderBy("n_name")
    },

    // Chao1 species-richness estimator per document source: observed
    // vocabulary plus the f₁²/(2f₂) unseen-mass correction from
    // singleton/doubleton counts — "how much vocabulary haven't we
    // crawled yet?", the capture-recapture complement of q369's Heaps
    // curve and q367's KMV (which estimate seen NDV, not unseen). Two
    // exact aggregates: token→count, then count→frequency-of-frequency.
    QueryDef.sql(
      "q412_chao1",
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT source, w, COUNT(*) AS c FROM tok
        |       WHERE w <> '' GROUP BY 1, 2),
        |ff AS (SELECT source, COUNT(*) AS v,
        |    COUNT(*) FILTER (WHERE c = 1) AS f1,
        |    COUNT(*) FILTER (WHERE c = 2) AS f2
        |  FROM tf GROUP BY 1)
        |SELECT source, CAST(v AS BIGINT) AS vocab,
        |  CAST(f1 AS BIGINT) AS singletons, CAST(f2 AS BIGINT) AS doubletons,
        |  CAST(v + f1 * f1 // (2 * GREATEST(f2, 1)) AS BIGINT) AS chao1
        |FROM ff ORDER BY source""".stripMargin) { (s, dir) =>
      val tf = Tables(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      tf.groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("singletons"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("doubletons"))
        .select(col("source"), col("vocab"), col("singletons"), col("doubletons"),
          expr("CAST(vocab + singletons * singletons" +
            " div (2 * GREATEST(doubletons, 1)) AS BIGINT)").as("chao1"))
        .orderBy("source")
    },

    // Simpson-reversal detector: the overall discount→quantity OLS
    // slope against each part type's within-group slope (q371's
    // sufficient-sum machinery, one pass for the groups + a rollup
    // for the pooled fit). A group is "reversed" when its slope sign
    // contradicts the pooled sign — the aggregation-bias diagnostic
    // that decides whether a per-segment or pooled model is honest.
    QueryDef.sql(
      "q413_simpson_reversal",
      """WITH d AS (SELECT p_type,
        |    CAST(ROUND(l_discount * 100.0) AS BIGINT) AS x,
        |    CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT p_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM d GROUP BY 1),
        |t AS (SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
        |        SUM(sxy) AS sxy, SUM(sxx) AS sxx FROM g),
        |gs AS (SELECT p_type,
        |    CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
        |      AS slope_ppm
        |  FROM g),
        |ts AS (SELECT
        |    CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
        |      AS pooled_ppm
        |  FROM t)
        |SELECT gs.p_type, gs.slope_ppm, ts.pooled_ppm,
        |  CAST(CASE WHEN (gs.slope_ppm > 0) <> (ts.pooled_ppm > 0)
        |    THEN 1 ELSE 0 END AS BIGINT) AS reversed
        |FROM gs, ts ORDER BY gs.p_type""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.lineitem
        .join(t.part.select("p_partkey", "p_type"), col("l_partkey") === col("p_partkey"))
        .select(col("p_type"),
          round(col("l_discount") * lit(100.0)).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
      val g = d.groupBy("p_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      val slopeExpr = "CAST(FLOOR(1000000.0D * (CAST(n AS DOUBLE) * sxy" +
        " - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx" +
        " - CAST(sx AS DOUBLE) * sx)) AS BIGINT)"
      val gs = g.select(col("p_type"), expr(slopeExpr).as("slope_ppm"))
      val ts = g.agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
          sum("sxy").as("sxy"), sum("sxx").as("sxx"))
        .select(expr(slopeExpr).as("pooled_ppm"))
      gs.crossJoin(broadcast(ts))
        .select(col("p_type"), col("slope_ppm"), col("pooled_ppm"),
          when((col("slope_ppm") > 0) =!= (col("pooled_ppm") > 0), 1L)
            .otherwise(0L).as("reversed"))
        .orderBy("p_type")
    },

    // Rendezvous (highest-random-weight) sharding audit: users map to
    // the shard with the max portable-md5 weight over 8 candidates;
    // the query then REMOVES shard 3 and proves the HRW consistency
    // property — only shard 3's users move, every other assignment is
    // untouched (moved = 0 rows outside the removed shard). This is
    // the shard-assignment scheme that makes cluster resizes cheap at
    // 100 TB; occupancy balance and the movement matrix are exact.
    QueryDef.sql(
      "q414_rendezvous",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |w AS (SELECT u.user_id, sh.s,
        |    ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':'
        |       || CAST(sh.s AS VARCHAR)), 1, 8))::BIGINT AS wt
        |  FROM u, (SELECT unnest(generate_series(0, 7)) AS s) sh),
        |a1 AS (SELECT user_id, s AS shard FROM (
        |    SELECT user_id, s, row_number() OVER
        |      (PARTITION BY user_id ORDER BY wt DESC, s) AS rk FROM w)
        |  WHERE rk = 1),
        |a2 AS (SELECT user_id, s AS shard2 FROM (
        |    SELECT user_id, s, row_number() OVER
        |      (PARTITION BY user_id ORDER BY wt DESC, s) AS rk
        |    FROM w WHERE s <> 3)
        |  WHERE rk = 1)
        |SELECT a1.shard, COUNT(*) AS n_users,
        |  COUNT(*) FILTER (WHERE a1.shard <> a2.shard2) AS n_moved
        |FROM a1 JOIN a2 ON a1.user_id = a2.user_id
        |GROUP BY 1 ORDER BY shard""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events.select("user_id").distinct()
      val sh = s.range(0, 8).select(col("id").as("s"))
      val w = u.crossJoin(broadcast(sh))
        .select(col("user_id"), col("s"),
          expr("CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':'," +
            " CAST(s AS STRING))), 1, 8), 16, 10) AS BIGINT)").as("wt"))
      def assign(df: DataFrame, out: String) = df
        .select(col("user_id"), col("s"),
          row_number().over(Window.partitionBy("user_id")
            .orderBy(col("wt").desc, col("s"))).as("rk"))
        .where(col("rk") === 1)
        .select(col("user_id"), col("s").as(out))
      val a1 = assign(w, "shard")
      val a2 = assign(w.where(col("s") =!= 3), "shard2")
      a1.join(a2, "user_id")
        .groupBy("shard")
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("shard") =!= col("shard2"), 1L).otherwise(0L)).as("n_moved"))
        .orderBy("shard")
    },

    // Time-respecting 2-hop paths: nation lanes carry their FIRST
    // transaction day; a path a→b→c counts only if the b→c lane opened
    // strictly AFTER a→b (information/contagion can only flow forward
    // in time — static 2-hop counts q379-style overcount). Top-20
    // (origin, destination) pairs by temporal path count with the
    // earliest completion day. All on the first-day lane grain.
    QueryDef.sql(
      "q415_temporal_paths",
      """WITH lanes AS MATERIALIZED (SELECT s.s_nationkey AS a,
        |    c.c_nationkey AS b,
        |    MIN(date_diff('day', TIMESTAMP '1995-01-01', o.o_orderdate)) AS f
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey GROUP BY 1, 2),
        |p AS (SELECT x.a AS src, y.b AS dst, COUNT(*) AS n_paths,
        |    MIN(y.f) AS earliest_done
        |  FROM lanes x JOIN lanes y ON x.b = y.a
        |  WHERE y.f > x.f AND x.a <> y.b GROUP BY 1, 2)
        |SELECT src, dst, CAST(n_paths AS BIGINT) AS n_paths,
        |  CAST(earliest_done AS BIGINT) AS earliest_done
        |FROM p ORDER BY n_paths DESC, src, dst LIMIT 20""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val lanes = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").cast("long").as("a"),
          col("c_nationkey").cast("long").as("b"))
        .agg(min(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long")).as("f"))
      val x = lanes.select(col("a").as("src"), col("b").as("mid"), col("f").as("f1"))
      val y = lanes.select(col("a").as("mid2"), col("b").as("dst"), col("f").as("f2"))
      x.join(y, col("mid") === col("mid2"))
        .where(col("f2") > col("f1") && col("src") =!= col("dst"))
        .groupBy("src", "dst")
        .agg(count(lit(1)).as("n_paths"), min("f2").as("earliest_done"))
        .orderBy(col("n_paths").desc, col("src"), col("dst"))
        .limit(20)
    },

    // Rank-biased overlap (p = 1/2) between the 1999 and 2000 supplier
    // top-20 revenue rankings — the top-weighted list-similarity
    // metric (q351's RRF fuses lists; RBO measures how much they
    // agree, weighting early ranks geometrically). EXACT integers: the
    // d-th term o_d·(L/d)·2^(20−d) with L = lcm(1..20), normalized by
    // the perfect-agreement mass — no floating geometry anywhere.
    QueryDef.sql(
      "q416_rbo",
      """WITH r AS (SELECT l.l_suppkey AS sk, year(o.o_orderdate) AS yr,
        |    SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS cents
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) IN (1999, 2000) GROUP BY 1, 2),
        |ra AS (SELECT sk, row_number() OVER (ORDER BY cents DESC, sk) AS rk
        |       FROM r WHERE yr = 1999 ORDER BY rk LIMIT 20),
        |rb AS (SELECT sk, row_number() OVER (ORDER BY cents DESC, sk) AS rk
        |       FROM r WHERE yr = 2000 ORDER BY rk LIMIT 20),
        |j AS (SELECT GREATEST(ra.rk, rb.rk) AS entry_d
        |      FROM ra JOIN rb ON ra.sk = rb.sk),
        |ds AS (SELECT unnest(generate_series(1, 20)) AS d),
        |ov AS (SELECT ds.d, COUNT(j.entry_d) AS o_d
        |       FROM ds LEFT JOIN j ON j.entry_d <= ds.d GROUP BY 1),
        |terms AS (SELECT d, o_d,
        |    o_d * (232792560 // d) * CAST(pow(2, 20 - d) AS BIGINT) AS term,
        |    d * (232792560 // d) * CAST(pow(2, 20 - d) AS BIGINT) AS max_term
        |  FROM ov)
        |SELECT CAST(SUM(o_d) AS BIGINT) AS total_overlap,
        |  CAST(1000000 * SUM(term) // SUM(max_term) AS BIGINT) AS rbo_ppm
        |FROM terms""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val r = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .where(year(col("o_orderdate")).isin(1999, 2000))
        .groupBy(col("l_suppkey").as("sk"), year(col("o_orderdate")).as("yr"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("cents"))
      def top(yr: Int, out: String) = r.where(col("yr") === yr)
        .select(col("sk"),
          row_number().over(Window.orderBy(col("cents").desc, col("sk"))).as(out))
        .where(col(out) <= 20)
      val ra = top(1999, "ra")
      val rb = top(2000, "rb").withColumnRenamed("sk", "sk2")
      val j = ra.join(rb, col("sk") === col("sk2"))
        .select(greatest(col("ra"), col("rb")).as("entry_d"))
      val ds = s.range(1, 21).select(col("id").as("d"))
      val ov = broadcast(ds).join(j, col("entry_d") <= col("d"), "left")
        .groupBy("d").agg(count(col("entry_d")).as("o_d"))
      ov.select(col("d"), col("o_d"),
          expr("o_d * (232792560 div d) * CAST(pow(2, 20 - d) AS BIGINT)").as("term"),
          expr("d * (232792560 div d) * CAST(pow(2, 20 - d) AS BIGINT)").as("max_term"))
        .agg(sum("o_d").as("total_overlap"),
          expr("CAST(CAST(sum(term) AS DECIMAL(38,0)) * 1000000" +
            " div sum(max_term) AS BIGINT)").as("rbo_ppm"))
        .select(col("total_overlap"), col("rbo_ppm"))
    },

    // Weighted Jaccard similarity between nations' part-demand vectors
    // (Σ min / Σ max over per-part quantities) — the multiset
    // generalization the binary q297 overlap matrix can't see. Only
    // SHARED parts need the pair join: Σmax = tot_a + tot_b − Σmin by
    // the min/max identity, so the pair computation touches the
    // (nation, part) grain once per shared part. Top-10 most similar
    // nation pairs.
    QueryDef.sql(
      "q417_weighted_jaccard",
      """WITH v AS (SELECT c.c_nationkey AS nk, l.l_partkey AS pk,
        |    SUM(CAST(l.l_quantity AS BIGINT)) AS q
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1, 2),
        |tot AS (SELECT nk, SUM(q) AS tq FROM v GROUP BY 1),
        |sm AS (SELECT a.nk AS na, b.nk AS nb, SUM(LEAST(a.q, b.q)) AS smin
        |  FROM v a JOIN v b ON a.pk = b.pk AND a.nk < b.nk GROUP BY 1, 2)
        |SELECT sm.na, sm.nb, CAST(sm.smin AS BIGINT) AS sum_min,
        |  CAST(ta.tq + tb.tq - sm.smin AS BIGINT) AS sum_max,
        |  CAST(1000000 * sm.smin // (ta.tq + tb.tq - sm.smin) AS BIGINT)
        |    AS wjaccard_ppm
        |FROM sm JOIN tot ta ON sm.na = ta.nk JOIN tot tb ON sm.nb = tb.nk
        |ORDER BY wjaccard_ppm DESC, na, nb LIMIT 10""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val v = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nk"),
          col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val tot = v.groupBy("nk").agg(sum("q").as("tq"))
      val a = v.select(col("nk").as("na"), col("pk"), col("q").as("qa"))
      val b = v.select(col("nk").as("nb"), col("pk").as("pk2"), col("q").as("qb"))
      val sm = a.join(b, col("pk") === col("pk2") && col("na") < col("nb"))
        .groupBy("na", "nb").agg(sum(least(col("qa"), col("qb"))).as("smin"))
      sm.join(broadcast(tot.select(col("nk").as("na"), col("tq").as("ta"))), "na")
        .join(broadcast(tot.select(col("nk").as("nb"), col("tq").as("tb"))), "nb")
        .select(col("na"), col("nb"), col("smin").as("sum_min"),
          (col("ta") + col("tb") - col("smin")).as("sum_max"),
          expr("CAST(1000000 * smin div (ta + tb - smin) AS BIGINT)")
            .as("wjaccard_ppm"))
        .orderBy(col("wjaccard_ppm").desc, col("na"), col("nb"))
        .limit(10)
    },

    // Extreme-value block maxima: the worst (best) revenue day per
    // month, ranked, with empirical return periods 1000·(n+1)/rank —
    // the EVT workflow (block → maxima → plotting position) with no
    // transcendental fitting. Maxima reduce on the bounded month
    // grain; ranks and return periods live on the ≤ n-months frame.
    QueryDef.sql(
      "q418_block_maxima",
      """WITH d AS (SELECT
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT ym, MAX(y) AS block_max FROM d GROUP BY 1),
        |r AS (SELECT ym, block_max,
        |    row_number() OVER (ORDER BY block_max DESC, ym) AS rk,
        |    COUNT(*) OVER () AS n FROM m)
        |SELECT ym, CAST(block_max AS BIGINT) AS block_max_cents,
        |  rk AS rank, CAST(1000 * (n + 1) // rk AS BIGINT) AS return_period_milli
        |FROM r ORDER BY rank, ym""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).orders
        .groupBy(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("day"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("y"))
      val m = d.groupBy("ym").agg(max("y").as("block_max"))
      m.select(col("ym"), col("block_max"),
          row_number().over(Window.orderBy(col("block_max").desc, col("ym")))
            .cast("long").as("rank"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .select(col("ym"), col("block_max").as("block_max_cents"), col("rank"),
          expr("CAST(1000 * (n + 1) div rank AS BIGINT)").as("return_period_milli"))
        .orderBy("rank", "ym")
    },

    // Absorbing-chain conversion probability: for each starting event
    // type, the probability of reaching 'purchase' within 4 steps —
    // p ← b + Q·p iterated on the transient transition matrix (q368's
    // chain made absorbing), exact ppm arithmetic, every iteration on
    // the ≤ k² matrix grain. The funnel question "how likely does a
    // session starting at X ever convert?" answered with chain
    // algebra instead of path enumeration.
    QueryDef.sql(
      "q419_absorption_prob",
      """WITH s AS (SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS b
        |  FROM events),
        |tc AS (SELECT a, b, COUNT(*) AS c FROM s WHERE b IS NOT NULL
        |       GROUP BY 1, 2),
        |rt AS (SELECT a, SUM(c) AS tot FROM tc GROUP BY 1),
        |q AS (SELECT tc.a, tc.b, tc.c, rt.tot FROM tc JOIN rt ON tc.a = rt.a
        |      WHERE tc.a <> 'purchase'),
        |b0 AS (SELECT a, CAST(1000000 * c // tot AS BIGINT) AS p FROM q
        |       WHERE b = 'purchase'),
        |tq AS (SELECT a, b, c, tot FROM q WHERE b <> 'purchase'),
        |p1 AS (SELECT COALESCE(b0.a, m.a) AS a,
        |    COALESCE(b0.p, 0) + COALESCE(m.p, 0) AS p
        |  FROM b0 FULL JOIN (SELECT tq.a, SUM(tq.c * b0.p // tq.tot) AS p
        |    FROM tq JOIN b0 ON tq.b = b0.a GROUP BY 1) m ON b0.a = m.a),
        |p2 AS (SELECT COALESCE(b0.a, m.a) AS a,
        |    COALESCE(b0.p, 0) + COALESCE(m.p, 0) AS p
        |  FROM b0 FULL JOIN (SELECT tq.a, SUM(tq.c * p1.p // tq.tot) AS p
        |    FROM tq JOIN p1 ON tq.b = p1.a GROUP BY 1) m ON b0.a = m.a),
        |p3 AS (SELECT COALESCE(b0.a, m.a) AS a,
        |    COALESCE(b0.p, 0) + COALESCE(m.p, 0) AS p
        |  FROM b0 FULL JOIN (SELECT tq.a, SUM(tq.c * p2.p // tq.tot) AS p
        |    FROM tq JOIN p2 ON tq.b = p2.a GROUP BY 1) m ON b0.a = m.a)
        |SELECT a AS start_type, CAST(p AS BIGINT) AS p4_ppm
        |FROM p3 ORDER BY start_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tc = Tables(s, dir).events
        .select(col("event_type").as("a"), lead(col("event_type"), 1).over(w).as("b"))
        .where(col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
      val rt = tc.groupBy("a").agg(sum("c").as("tot"))
      val q = tc.join(broadcast(rt), "a").where(col("a") =!= "purchase")
      val b0 = q.where(col("b") === "purchase")
        .select(col("a"), expr("CAST(1000000 * c div tot AS BIGINT)").as("p"))
      val tq = q.where(col("b") =!= "purchase")
      var p = b0
      for (_ <- 1 to 3) {
        val prev = p.select(col("a").as("pa"), col("p").as("pp"))
        val m = tq.join(broadcast(prev), tq("b") === col("pa"))
          .groupBy(tq("a").as("ma"))
          .agg(sum(expr("c * pp div tot")).as("mp"))
        p = b0.select(col("a").as("ba"), col("p").as("bp"))
          .join(m, col("ba") === col("ma"), "full")
          .select(coalesce(col("ba"), col("ma")).as("a"),
            (coalesce(col("bp"), lit(0L)) + coalesce(col("mp"), lit(0L))).as("p"))
      }
      p.select(col("a").as("start_type"), col("p").as("p4_ppm"))
        .orderBy("start_type")
    },

    // 1-D earth mover's distance between click and purchase value
    // distributions — EXACT: EMD₁ = ∫|F₁−F₂| dx telescopes to
    // Σ (gap to next value)·|c₁·n₂ − c₂·n₁| / (n₁·n₂) over the merged
    // value grain (q389's KS machinery with a SUM of gap-weighted
    // terms instead of a MAX). The distance is in the value's own
    // micro-units — the drift magnitude KS's sup-norm can't size.
    QueryDef.sql(
      "q420_emd_1d",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (SELECT v,
        |    COUNT(*) FILTER (WHERE event_type = 'click') AS c1,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS c2
        |  FROM e GROUP BY 1),
        |c AS (SELECT v,
        |    lead(v) OVER (ORDER BY v) AS vn,
        |    SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a1,
        |    SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |  FROM g)
        |SELECT CAST(MIN(n1) AS BIGINT) AS n1, CAST(MIN(n2) AS BIGINT) AS n2,
        |  CAST(SUM((vn - v) * abs(a1 * n2 - a2 * n1)) // (MIN(n1) * MIN(n2))
        |    AS BIGINT) AS emd_micro
        |FROM c WHERE vn IS NOT NULL""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          floor(col("value") * lit(1000000.0)).cast("long").as("v"))
      val g = e.groupBy("v")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val wv = Window.orderBy("v")
      val wc = wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = g.select(col("v"), lead("v", 1).over(wv).as("vn"),
        sum("c1").over(wc).as("a1"), sum("c2").over(wc).as("a2"),
        sum("c1").over(Window.partitionBy()).as("n1"),
        sum("c2").over(Window.partitionBy()).as("n2"))
      c.where(col("vn").isNotNull)
        .agg(min("n1").as("n1"), min("n2").as("n2"),
          sum((col("vn") - col("v")) * abs(col("a1") * col("n2")
            - col("a2") * col("n1"))).as("num"))
        .select(col("n1"), col("n2"),
          expr("CAST(num div (n1 * n2) AS BIGINT)").as("emd_micro"))
    },

    // Fractional-knapsack budget plan: spend 10% of total part value
    // on the densest parts (size per cent), whole parts in density
    // order plus a fractional final pick — the classic greedy whose
    // optimality makes it a SQL-expressible optimizer. Density order
    // uses an exact cross-multiplied comparator (size·10⁶ div cents);
    // prefix spend runs on the bounded part grain; the output is the
    // plan summary with the exact boundary part and its fractional
    // take in ppm.
    QueryDef.sql(
      "q421_knapsack",
      """WITH p AS (SELECT p_partkey AS pk,
        |    CAST(FLOOR(p_retailprice * 100.0) AS BIGINT) AS cents,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part WHERE p_retailprice > 0),
        |b AS (SELECT SUM(cents) // 10 AS budget FROM p),
        |r AS (SELECT pk, cents, size,
        |    1000000 * size // cents AS density,
        |    SUM(cents) OVER (ORDER BY 1000000 * size // cents DESC, pk
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM p),
        |full_t AS (SELECT COUNT(*) AS n_full, CAST(SUM(cents) AS BIGINT) AS spent,
        |    CAST(SUM(size) AS BIGINT) AS size_got
        |  FROM r, b WHERE cum <= budget),
        |frac AS (SELECT pk, cents, size, cum FROM r, b
        |  WHERE cum > budget AND cum - cents <= budget
        |  ORDER BY cum LIMIT 1)
        |SELECT CAST(b.budget AS BIGINT) AS budget_cents, full_t.n_full,
        |  full_t.spent AS full_spent_cents, full_t.size_got,
        |  frac.pk AS frac_part,
        |  CAST(1000000 * (b.budget - full_t.spent) // frac.cents AS BIGINT)
        |    AS frac_take_ppm
        |FROM b, full_t, frac""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir).part
        .where(col("p_retailprice") > 0)
        .select(col("p_partkey").as("pk"),
          floor(col("p_retailprice") * lit(100.0)).cast("long").as("cents"),
          col("p_size").cast("long").as("size"))
      val b = p.agg(expr("sum(cents) div 10").as("budget"))
      val wr = Window.orderBy(expr("1000000 * size div cents").desc, col("pk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = p.select(col("pk"), col("cents"), col("size"),
        sum("cents").over(wr).as("cum"))
      val fullT = r.crossJoin(broadcast(b)).where(col("cum") <= col("budget"))
        .agg(count(lit(1)).as("n_full"), sum("cents").as("spent"),
          sum("size").as("size_got"))
      val frac = r.crossJoin(broadcast(b))
        .where(col("cum") > col("budget") && col("cum") - col("cents") <= col("budget"))
        .orderBy("cum").limit(1)
        .select(col("pk").as("frac_part"), col("cents").as("fc"))
      b.crossJoin(broadcast(fullT)).crossJoin(broadcast(frac))
        .select(col("budget").as("budget_cents"), col("n_full"),
          col("spent").as("full_spent_cents"), col("size_got"),
          col("frac_part"),
          expr("CAST(1000000 * (budget - spent) div fc AS BIGINT)")
            .as("frac_take_ppm"))
    },

    // Incremental top-k maintenance under insert-only deltas — q366's
    // IVM extended to a NON-distributive view: the maintained top-10
    // spenders recompute only over (stored top-20 margin keys ∪
    // delta-touched keys), merging base partials with delta partials;
    // the full recompute runs beside it and the per-rank equality is
    // part of the result. The margin is the classic top-k IVM
    // safety band: an untouched key below it can only FALL.
    QueryDef.sql(
      "q422_ivm_topk",
      """WITH o AS (SELECT o_custkey AS ck,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
        |    (o_orderdate >= TIMESTAMP '2001-01-01') AS is_delta
        |  FROM orders),
        |base AS (SELECT ck, SUM(cents) AS c FROM o WHERE NOT is_delta GROUP BY 1),
        |delta AS (SELECT ck, SUM(cents) AS c FROM o WHERE is_delta GROUP BY 1),
        |margin AS (SELECT ck FROM base ORDER BY c DESC, ck LIMIT 20),
        |cand AS (SELECT ck FROM margin UNION SELECT ck FROM delta),
        |incr AS (SELECT cand.ck,
        |    COALESCE(b.c, 0) + COALESCE(d.c, 0) AS c
        |  FROM cand LEFT JOIN base b ON cand.ck = b.ck
        |  LEFT JOIN delta d ON cand.ck = d.ck),
        |itop AS (SELECT ck, c, row_number() OVER (ORDER BY c DESC, ck) AS rk
        |         FROM incr ORDER BY rk LIMIT 10),
        |ftop AS (SELECT ck, c, row_number() OVER (ORDER BY c DESC, ck) AS rk
        |  FROM (SELECT ck, SUM(cents) AS c FROM o GROUP BY 1) ORDER BY rk LIMIT 10)
        |SELECT ftop.rk AS rank, ftop.ck AS custkey,
        |  CAST(ftop.c AS BIGINT) AS full_cents,
        |  CAST(itop.c AS BIGINT) AS incr_cents,
        |  CAST(CASE WHEN ftop.ck = itop.ck AND ftop.c = itop.c
        |    THEN 1 ELSE 0 END AS BIGINT) AS match
        |FROM ftop JOIN itop ON ftop.rk = itop.rk
        |ORDER BY rank""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
        .select(col("o_custkey").as("ck"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"),
          (col("o_orderdate") >= lit("2001-01-01").cast("timestamp")).as("is_delta"))
      val base = o.where(!col("is_delta")).groupBy("ck").agg(sum("cents").as("bc"))
      val delta = o.where(col("is_delta")).groupBy("ck").agg(sum("cents").as("dc"))
      val margin = base.orderBy(col("bc").desc, col("ck")).limit(20).select("ck")
      val cand = margin.union(delta.select("ck")).distinct()
      val incr = cand.join(base, Seq("ck"), "left").join(delta, Seq("ck"), "left")
        .select(col("ck"),
          (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"))
      val itop = incr.select(col("ck").as("ick"), col("c").as("ic"),
          row_number().over(Window.orderBy(col("c").desc, col("ck"))).as("rk"))
        .where(col("rk") <= 10)
      val ftop = o.groupBy("ck").agg(sum("cents").as("c"))
        .select(col("ck"), col("c"),
          row_number().over(Window.orderBy(col("c").desc, col("ck"))).as("rk"))
        .where(col("rk") <= 10)
      ftop.join(itop, "rk")
        .select(col("rk").as("rank"), col("ck").as("custkey"),
          col("c").as("full_cents"), col("ic").as("incr_cents"),
          when(col("ck") === col("ick") && col("c") === col("ic"), 1L)
            .otherwise(0L).as("match"))
        .orderBy("rank")
    },

    // Locally-dominant greedy matching: an edge joins the matching iff
    // it is the best-weight edge in BOTH endpoints' full incidence
    // lists (deterministic tie-break), then matched nodes drop out and
    // a second round runs
    // — the parallel greedy that approximates maximum-weight matching
    // with NO sequential scan (each round is two per-node argmax
    // windows on the edge grain). The pairing engine behind
    // supplier↔market assignment at scale.
    QueryDef.sql(
      "q423_dominant_matching",
      """WITH lanes AS MATERIALIZED (SELECT
        |    LEAST(c.c_nationkey, s.s_nationkey) AS a,
        |    GREATEST(c.c_nationkey, s.s_nationkey) AS b, COUNT(*) AS w
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
        |inc1 AS (SELECT a AS n, a, b, w FROM lanes
        |         UNION ALL SELECT b, a, b, w FROM lanes),
        |best1 AS (SELECT a, b FROM (SELECT n, a, b,
        |      row_number() OVER (PARTITION BY n ORDER BY w DESC, a, b) AS rk
        |    FROM inc1) WHERE rk = 1),
        |r1 AS (SELECT l.a, l.b, l.w FROM lanes l
        |  WHERE 2 = (SELECT COUNT(*) FROM best1
        |             WHERE best1.a = l.a AND best1.b = l.b)),
        |rem AS (SELECT l.a, l.b, l.w FROM lanes l
        |  WHERE NOT EXISTS (SELECT 1 FROM r1 WHERE r1.a = l.a OR r1.b = l.a
        |                    OR r1.a = l.b OR r1.b = l.b)),
        |inc2 AS (SELECT a AS n, a, b, w FROM rem
        |         UNION ALL SELECT b, a, b, w FROM rem),
        |best2 AS (SELECT a, b FROM (SELECT n, a, b,
        |      row_number() OVER (PARTITION BY n ORDER BY w DESC, a, b) AS rk
        |    FROM inc2) WHERE rk = 1),
        |r2 AS (SELECT l.a, l.b, l.w FROM rem l
        |  WHERE 2 = (SELECT COUNT(*) FROM best2
        |             WHERE best2.a = l.a AND best2.b = l.b))
        |SELECT a, b, CAST(w AS BIGINT) AS weight, 1 AS round FROM r1
        |UNION ALL SELECT a, b, CAST(w AS BIGINT), 2 FROM r2
        |ORDER BY round, a""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val lanes = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
          greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
        .agg(count(lit(1)).as("w"))
      // dominance must rank over a NODE's full incidence (a node appears
      // in both the a and b roles of canonical edges); an edge is matched
      // iff it is the rank-1 incident edge of BOTH endpoints
      def round(e: DataFrame): DataFrame = {
        val inc = e.select(col("a").as("n"), col("a"), col("b"), col("w"))
          .unionByName(e.select(col("b").as("n"), col("a"), col("b"), col("w")))
        val best = inc.select(col("n"), col("a"), col("b"),
            row_number().over(Window.partitionBy("n")
              .orderBy(col("w").desc, col("a"), col("b"))).as("rk"))
          .where(col("rk") === 1)
          .groupBy("a", "b").count().where(col("count") === 2)
          .select("a", "b")
        e.join(best, Seq("a", "b"), "left_semi")
      }
      val r1 = round(lanes)
      val matched = r1.select(col("a").as("n")).union(r1.select(col("b"))).distinct()
      val rem = lanes
        .join(matched, lanes("a") === col("n"), "left_anti")
        .join(matched, lanes("b") === col("n"), "left_anti")
      val r2 = round(rem)
      r1.withColumn("round", lit(1L))
        .unionByName(r2.withColumn("round", lit(2L)))
        .select(col("a"), col("b"), col("w").as("weight"), col("round"))
        .orderBy("round", "a")
    },

    // Subgroup discovery: the (nation × part-type) segments whose
    // return rate deviates most from the corpus rate — exact ppm
    // lifts, a relative support floor (n ≥ total/500) so tiny noisy
    // cells can't top the list, ranked by absolute deviation. The
    // one-pass mining shape behind "which segment is broken?" drill-
    // downs at fact scale.
    QueryDef.sql(
      "q424_subgroup_discovery",
      """WITH f AS (SELECT n.n_name, p.p_type,
        |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN part p ON l.l_partkey = p.p_partkey),
        |g AS (SELECT n_name, p_type, COUNT(*) AS n, SUM(r) AS nr
        |      FROM f GROUP BY 1, 2),
        |t AS (SELECT SUM(n) AS tn, SUM(nr) AS tnr FROM g),
        |s AS (SELECT g.n_name, g.p_type, g.n,
        |    CAST(1000000 * g.nr // g.n AS BIGINT) AS rate_ppm,
        |    CAST(1000000 * t.tnr // t.tn AS BIGINT) AS global_ppm
        |  FROM g, t WHERE g.n * 500 >= t.tn)
        |SELECT n_name, p_type, CAST(n AS BIGINT) AS n, rate_ppm, global_ppm,
        |  rate_ppm - global_ppm AS lift_ppm
        |FROM s ORDER BY abs(rate_ppm - global_ppm) DESC, n_name, p_type
        |LIMIT 15""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val g = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(t.part.select("p_partkey", "p_type"), col("l_partkey") === col("p_partkey"))
        .groupBy("n_name", "p_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nr"))
      val tt = g.agg(sum("n").as("tn"), sum("nr").as("tnr"))
      g.crossJoin(broadcast(tt))
        .where(col("n") * 500 >= col("tn"))
        .select(col("n_name"), col("p_type"), col("n"),
          expr("CAST(1000000 * nr div n AS BIGINT)").as("rate_ppm"),
          expr("CAST(1000000 * tnr div tn AS BIGINT)").as("global_ppm"))
        .withColumn("lift_ppm", col("rate_ppm") - col("global_ppm"))
        .orderBy(abs(col("lift_ppm")).desc, col("n_name"), col("p_type"))
        .limit(15)
    },

    // Business-day SLA audit: promise = 5 business days after the
    // order date via the closed-form weekday offset (the 1995-01-01
    // epoch is a Sunday, so dow = day mod 7 — pure integer calendar
    // arithmetic, no engine dayofweek() numbering involved); lines
    // shipping past the promise are late. Per-priority exact late
    // shares and mean overshoot — the calendar twin of q347's raw
    // ship-offset quantiles.
    QueryDef.sql(
      "q425_business_days",
      """WITH f AS (SELECT o.o_orderpriority AS pri,
        |    date_diff('day', TIMESTAMP '1995-01-01', o.o_orderdate) AS od,
        |    date_diff('day', TIMESTAMP '1995-01-01', l.l_shipdate) AS sd
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |p AS (SELECT pri, sd,
        |    od + CASE od % 7 WHEN 0 THEN 5 WHEN 6 THEN 6 ELSE 7 END AS promise
        |  FROM f)
        |SELECT pri, COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE sd > promise) AS n_late,
        |  CAST(1000000 * COUNT(*) FILTER (WHERE sd > promise) // COUNT(*)
        |    AS BIGINT) AS late_ppm,
        |  CAST(COALESCE(SUM(sd - promise) FILTER (WHERE sd > promise), 0)
        |    // GREATEST(COUNT(*) FILTER (WHERE sd > promise), 1) AS BIGINT)
        |    AS mean_overshoot_days
        |FROM p GROUP BY 1 ORDER BY pri""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val f = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("pri"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("od"),
          datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("sd"))
      val p = f.select(col("pri"), col("sd"),
        (col("od") + expr("CASE od % 7 WHEN 0 THEN 5 WHEN 6 THEN 6 ELSE 7 END"))
          .as("promise"))
      p.groupBy("pri")
        .agg(count(lit(1)).as("n"),
          sum(when(col("sd") > col("promise"), 1L).otherwise(0L)).as("n_late"),
          coalesce(sum(when(col("sd") > col("promise"), col("sd") - col("promise"))),
            lit(0L)).as("overshoot"))
        .select(col("pri"), col("n"), col("n_late"),
          expr("CAST(1000000 * n_late div n AS BIGINT)").as("late_ppm"),
          expr("CAST(overshoot div GREATEST(n_late, 1) AS BIGINT)")
            .as("mean_overshoot_days"))
        .orderBy("pri")
    },

    // Grid-density clustering (DBSCAN's grid cousin): orders binned
    // into (month, $10k) cells, cells with above-average density
    // (n·|cells| > total — scale-free) survive, and adjacent dense cells (8-neighborhood)
    // merge via three min-label propagation rounds — everything after
    // the one binning pass runs on the bounded cell grain, the way
    // density clustering actually scales (cluster cells, not rows).
    // Output is the cluster census keyed by the minimum cell id.
    QueryDef.sql(
      "q426_density_clusters",
      """WITH b AS (SELECT
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) // 30 AS gx,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) // 1000000 AS gy,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |t AS (SELECT SUM(n) AS tot, COUNT(*) AS nc FROM b),
        |dense AS (SELECT b.gx, b.gy, b.n, b.gx * 100000 + b.gy AS cid
        |          FROM b, t WHERE b.n * t.nc > t.tot),
        |adj AS (SELECT a.cid AS ca, c.cid AS cb FROM dense a JOIN dense c
        |  ON abs(a.gx - c.gx) <= 1 AND abs(a.gy - c.gy) <= 1),
        |l1 AS (SELECT ca, MIN(cb) AS lbl FROM adj GROUP BY 1),
        |l2 AS (SELECT adj.ca, MIN(l1.lbl) AS lbl FROM adj
        |       JOIN l1 ON adj.cb = l1.ca GROUP BY 1),
        |l3 AS (SELECT adj.ca, MIN(l2.lbl) AS lbl FROM adj
        |       JOIN l2 ON adj.cb = l2.ca GROUP BY 1)
        |SELECT l3.lbl AS cluster_id, COUNT(*) AS n_cells,
        |  CAST(SUM(dense.n) AS BIGINT) AS n_rows
        |FROM l3 JOIN dense ON l3.ca = dense.cid
        |GROUP BY 1 ORDER BY n_rows DESC, cluster_id""".stripMargin) { (s, dir) =>
      val b = Tables(s, dir).orders
        .groupBy(expr("CAST(datediff(to_date(o_orderdate), DATE '1995-01-01')" +
            " AS BIGINT) div 30").as("gx"),
          expr("CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) div 1000000").as("gy"))
        .agg(count(lit(1)).as("n"))
      val t = b.agg(sum("n").as("tot"), count(lit(1)).as("nc"))
      val dense = b.crossJoin(broadcast(t))
        .where(col("n") * col("nc") > col("tot"))
        .select(col("gx"), col("gy"), col("n"),
          (col("gx") * 100000 + col("gy")).as("cid"))
      val c2 = dense.select(col("gx").as("gx2"), col("gy").as("gy2"),
        col("cid").as("cb"))
      val adj = dense.join(c2,
        abs(col("gx") - col("gx2")) <= 1 && abs(col("gy") - col("gy2")) <= 1)
        .select(col("cid").as("ca"), col("cb"))
      var lbl = adj.groupBy("ca").agg(min("cb").as("lbl"))
      for (_ <- 1 to 2) {
        val prev = lbl.select(col("ca").as("pa"), col("lbl").as("pl"))
        lbl = adj.join(prev, col("cb") === col("pa"))
          .groupBy("ca").agg(min("pl").as("lbl"))
      }
      lbl.join(dense.select(col("cid"), col("n")), col("ca") === col("cid"))
        .groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("n_cells"), sum("n").as("n_rows"))
        .orderBy(col("n_rows").desc, col("cluster_id"))
    },

    // 2×2 association: odds ratio and relative risk of a line being
    // returned given a deep discount (≥ 5%) — exact milli-units from
    // the four cell counts (GREATEST(…,1) guards division; with these
    // volumes no cell is empty). The epidemiology-style effect pair
    // that q313's Cramér's V (symmetric, unitless) can't report.
    QueryDef.sql(
      "q427_odds_ratio",
      """WITH f AS (SELECT
        |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS exposed,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS outcome
        |  FROM lineitem),
        |c AS (SELECT
        |    COUNT(*) FILTER (WHERE exposed = 1 AND outcome = 1) AS a,
        |    COUNT(*) FILTER (WHERE exposed = 1 AND outcome = 0) AS b,
        |    COUNT(*) FILTER (WHERE exposed = 0 AND outcome = 1) AS c,
        |    COUNT(*) FILTER (WHERE exposed = 0 AND outcome = 0) AS d
        |  FROM f)
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |  CAST(1000 * a * d // GREATEST(b * c, 1) AS BIGINT) AS odds_ratio_milli,
        |  CAST(1000 * a * (c + d) // GREATEST(c * (a + b), 1) AS BIGINT)
        |    AS rel_risk_milli
        |FROM c""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .select(when(col("l_discount") >= 0.05, 1L).otherwise(0L).as("exposed"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("outcome"))
        .agg(sum(when(col("exposed") === 1 && col("outcome") === 1, 1L)
            .otherwise(0L)).as("a"),
          sum(when(col("exposed") === 1 && col("outcome") === 0, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("exposed") === 0 && col("outcome") === 1, 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("exposed") === 0 && col("outcome") === 0, 1L)
            .otherwise(0L)).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          expr("CAST(1000 * a * d div GREATEST(b * c, 1) AS BIGINT)")
            .as("odds_ratio_milli"),
          expr("CAST(1000 * a * (c + d) div GREATEST(c * (a + b), 1) AS BIGINT)")
            .as("rel_risk_milli"))
    },

    // Median-of-means robust mean estimator: orders hash into 16
    // deterministic buckets (portable md5 arm), the bucket means are
    // exact floored integers, and the estimate is their rank-index
    // median — the heavy-tail-robust, trivially mergeable alternative
    // to the raw mean, with the worst bucket's deviation as the
    // sensitivity diagnostic. One pass + a 16-row reduction.
    QueryDef.sql(
      "q428_median_of_means",
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 16
        |      AS bkt
        |  FROM orders),
        |g AS (SELECT bkt, COUNT(*) AS n, SUM(cents) // COUNT(*) AS mean
        |      FROM o GROUP BY 1),
        |r AS (SELECT bkt, n, mean,
        |    row_number() OVER (ORDER BY mean, bkt) AS rk,
        |    COUNT(*) OVER () AS nb FROM g),
        |mm AS (SELECT MAX(CASE WHEN rk = (nb + 1) // 2 THEN mean END) AS mom
        |       FROM r),
        |ov AS (SELECT SUM(cents) // COUNT(*) AS overall, COUNT(*) AS n FROM o)
        |SELECT CAST(ov.n AS BIGINT) AS n, CAST(ov.overall AS BIGINT)
        |    AS overall_mean_cents,
        |  CAST(mm.mom AS BIGINT) AS mom_cents,
        |  CAST((SELECT MAX(abs(mean - mm.mom)) FROM g) AS BIGINT)
        |    AS max_bucket_dev
        |FROM ov, mm""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
        .withColumn("bkt",
          expr("CAST(conv(substring(md5(CAST(k AS STRING)), 1, 8), 16, 10)" +
            " AS BIGINT) % 16"))
      val g = o.groupBy("bkt")
        .agg(count(lit(1)).as("n"), expr("sum(cents) div count(1)").as("mean"))
      val mm = g.select(col("bkt"), col("mean"),
          row_number().over(Window.orderBy("mean", "bkt")).as("rk"),
          count(lit(1)).over(Window.partitionBy()).as("nb"))
        .where(col("rk") === expr("(nb + 1) div 2"))
        .agg(max("mean").as("mom"))
      val ov = o.agg(expr("sum(cents) div count(1)").as("overall"),
        count(lit(1)).as("n"))
      val dev = g.crossJoin(broadcast(mm))
        .agg(max(abs(col("mean") - col("mom"))).as("max_bucket_dev"))
      ov.crossJoin(broadcast(mm)).crossJoin(broadcast(dev))
        .select(col("n"), col("overall").as("overall_mean_cents"),
          col("mom").as("mom_cents"), col("max_bucket_dev"))
    },

    // Physical-sortedness audit: how monotone is ship date along the
    // (orderkey, linenumber) storage order, measured WITHIN insertion
    // chunks (LAG windows partitioned by chunk — never one global
    // sort): ascending-pair share, break count, run count, and mean
    // run length. The direct input to q362's zone-map advisor — a
    // table this unsorted prunes nothing until re-clustered.
    QueryDef.sql(
      "q429_sortedness",
      """WITH l AS (SELECT l_orderkey // 512 AS chunk, l_orderkey AS k,
        |    l_linenumber AS ln,
        |    date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS d
        |  FROM lineitem),
        |s AS (SELECT chunk, d,
        |    lag(d) OVER (PARTITION BY chunk ORDER BY k, ln, d) AS pd
        |  FROM l),
        |p AS (SELECT
        |    COUNT(*) FILTER (WHERE pd IS NOT NULL) AS n_pairs,
        |    COUNT(*) FILTER (WHERE pd IS NOT NULL AND d < pd) AS n_breaks,
        |    COUNT(*) AS n_rows
        |  FROM s)
        |SELECT CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(n_breaks AS BIGINT) AS n_breaks,
        |  CAST(1000000 * (n_pairs - n_breaks) // n_pairs AS BIGINT)
        |    AS sorted_ppm,
        |  CAST(1000 * n_rows // (n_breaks + (SELECT COUNT(DISTINCT chunk) FROM l))
        |    AS BIGINT) AS mean_run_len_milli
        |FROM p""".stripMargin) { (s, dir) =>
      val l = Tables(s, dir).lineitem
        .select(expr("l_orderkey div 512").as("chunk"), col("l_orderkey").as("k"),
          col("l_linenumber").as("ln"),
          datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("d"))
      // (k, ln) is NOT unique in the fixture — d completes a total order
      val w = Window.partitionBy("chunk").orderBy("k", "ln", "d")
      val sdf = l.select(col("chunk"), col("d"), lag("d", 1).over(w).as("pd"))
      val p = sdf.agg(
        sum(when(col("pd").isNotNull, 1L).otherwise(0L)).as("n_pairs"),
        sum(when(col("pd").isNotNull && col("d") < col("pd"), 1L).otherwise(0L))
          .as("n_breaks"),
        count(lit(1)).as("n_rows"))
      val nc = l.agg(countDistinct("chunk").as("n_chunks"))
      p.crossJoin(broadcast(nc))
        .select(col("n_rows"), col("n_pairs"), col("n_breaks"),
          expr("CAST(1000000 * (n_pairs - n_breaks) div n_pairs AS BIGINT)")
            .as("sorted_ppm"),
          expr("CAST(1000 * n_rows div (n_breaks + n_chunks) AS BIGINT)")
            .as("mean_run_len_milli"))
    },

    // Fleiss' kappa over three deterministic document "raters" (length,
    // stopword share, lexical diversity — each votes keep/drop):
    // chance-corrected inter-rater agreement, the annotation-QA
    // statistic for labeling pipelines. Per-doc pair agreement and the
    // category-share chance term are exact integer sums (×10⁶ scale);
    // the final kappa is one signed DOUBLE division. One pass over
    // docs; everything else reduces on scalars.
    QueryDef.sql(
      "q430_fleiss_kappa",
      """WITH f AS (SELECT doc_id,
        |    CASE WHEN length(text) >= 150 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN 5 * (length(text) - length(replace(replace(text, ' a ', '  '),
        |         ' the ', '  '))) <= length(text) THEN 1 ELSE 0 END AS r2,
        |    CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
        |         >= len(string_split(text, ' ')) THEN 1 ELSE 0 END AS r3
        |  FROM documents),
        |d AS (SELECT doc_id, r1 + r2 + r3 AS k FROM f),
        |m AS (SELECT COUNT(*) AS n, SUM(k) AS keeps,
        |    SUM(k * (k - 1) + (3 - k) * (2 - k)) AS agree2
        |  FROM d)
        |SELECT CAST(n AS BIGINT) AS n_docs,
        |  CAST(1000000 * agree2 // (n * 6) AS BIGINT) AS pbar_ppm,
        |  CAST((1000000 * keeps // (3 * n)) AS BIGINT) AS p_keep_ppm,
        |  CAST(FLOOR(1000.0 * (CAST(agree2 AS DOUBLE) / (6.0 * n)
        |      - (CAST(keeps AS DOUBLE) / (3 * n)) * (CAST(keeps AS DOUBLE) / (3 * n))
        |      - (1 - CAST(keeps AS DOUBLE) / (3 * n))
        |        * (1 - CAST(keeps AS DOUBLE) / (3 * n)))
        |    / (1 - (CAST(keeps AS DOUBLE) / (3 * n)) * (CAST(keeps AS DOUBLE) / (3 * n))
        |       - (1 - CAST(keeps AS DOUBLE) / (3 * n))
        |         * (1 - CAST(keeps AS DOUBLE) / (3 * n)))) AS BIGINT) AS kappa_milli
        |FROM m""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir).documents
        .select(col("doc_id"),
          when(length(col("text")) >= 150, 1L).otherwise(0L).as("r1"),
          when(lit(5) * (length(col("text"))
              - length(regexp_replace(regexp_replace(col("text"), " a ", "  "),
                " the ", "  "))) <= length(col("text")), 1L).otherwise(0L).as("r2"),
          when(lit(2) * size(array_distinct(split(col("text"), " ")))
              >= size(split(col("text"), " ")), 1L).otherwise(0L).as("r3"))
      val d = f.select(col("doc_id"), (col("r1") + col("r2") + col("r3")).as("k"))
      d.agg(count(lit(1)).as("n"), sum("k").as("keeps"),
          sum(col("k") * (col("k") - 1) + (lit(3) - col("k")) * (lit(2) - col("k")))
            .as("agree2"))
        .select(col("n").as("n_docs"),
          expr("CAST(1000000 * agree2 div (n_docs * 6) AS BIGINT)").as("pbar_ppm"),
          expr("CAST(1000000 * keeps div (3 * n_docs) AS BIGINT)").as("p_keep_ppm"),
          expr("CAST(FLOOR(1000.0D * (CAST(agree2 AS DOUBLE) / (6.0D * n_docs)" +
            " - (CAST(keeps AS DOUBLE) / (3 * n_docs)) * (CAST(keeps AS DOUBLE) / (3 * n_docs))" +
            " - (1 - CAST(keeps AS DOUBLE) / (3 * n_docs))" +
            " * (1 - CAST(keeps AS DOUBLE) / (3 * n_docs)))" +
            " / (1 - (CAST(keeps AS DOUBLE) / (3 * n_docs)) * (CAST(keeps AS DOUBLE) / (3 * n_docs))" +
            " - (1 - CAST(keeps AS DOUBLE) / (3 * n_docs))" +
            " * (1 - CAST(keeps AS DOUBLE) / (3 * n_docs)))) AS BIGINT)")
            .as("kappa_milli"))
    },

    // Rank aggregation by Borda count over three supplier merit
    // criteria (revenue, volume, distinct customers), plus the
    // Condorcet check — does the Borda winner also beat every rival
    // pairwise on a majority of criteria? The social-choice toolkit
    // for merging heterogeneous rankings (q351's RRF is score-based;
    // Borda/Condorcet are position-based and majority-based). All
    // ranks on the supplier grain; the pairwise test runs on the
    // top-10 × top-10 frame.
    QueryDef.sql(
      "q431_rank_aggregation",
      """WITH m AS (SELECT l.l_suppkey AS sk,
        |    SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS rev,
        |    SUM(CAST(l.l_quantity AS BIGINT)) AS vol,
        |    COUNT(DISTINCT o.o_custkey) AS ncust
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |r AS (SELECT sk,
        |    row_number() OVER (ORDER BY rev DESC, sk) AS r1,
        |    row_number() OVER (ORDER BY vol DESC, sk) AS r2,
        |    row_number() OVER (ORDER BY ncust DESC, sk) AS r3
        |  FROM m),
        |borda AS (SELECT sk, r1, r2, r3,
        |    GREATEST(11 - r1, 0) + GREATEST(11 - r2, 0) + GREATEST(11 - r3, 0)
        |      AS score
        |  FROM r),
        |top AS (SELECT * FROM borda WHERE score > 0
        |        ORDER BY score DESC, sk LIMIT 10),
        |pw AS (SELECT a.sk,
        |    SUM(CASE WHEN (CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END
        |           + CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END
        |           + CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END) >= 2
        |      THEN 1 ELSE 0 END) AS wins
        |  FROM top a JOIN top b ON a.sk <> b.sk GROUP BY 1),
        |nt AS (SELECT COUNT(*) AS n FROM top)
        |SELECT top.sk AS suppkey, CAST(top.score AS BIGINT) AS borda_score,
        |  CAST(pw.wins AS BIGINT) AS pairwise_wins,
        |  CAST(CASE WHEN pw.wins = nt.n - 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS condorcet_winner
        |FROM top JOIN pw ON top.sk = pw.sk CROSS JOIN nt
        |ORDER BY borda_score DESC, suppkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val m = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey").as("sk"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("rev"),
          sum(col("l_quantity").cast("long")).as("vol"),
          countDistinct("o_custkey").as("ncust"))
      val r = m.select(col("sk"),
        row_number().over(Window.orderBy(col("rev").desc, col("sk"))).cast("long").as("r1"),
        row_number().over(Window.orderBy(col("vol").desc, col("sk"))).cast("long").as("r2"),
        row_number().over(Window.orderBy(col("ncust").desc, col("sk"))).cast("long").as("r3"))
      val borda = r.select(col("sk"), col("r1"), col("r2"), col("r3"),
        (greatest(lit(11L) - col("r1"), lit(0L))
          + greatest(lit(11L) - col("r2"), lit(0L))
          + greatest(lit(11L) - col("r3"), lit(0L))).as("score"))
      val top = borda.where(col("score") > 0)
        .orderBy(col("score").desc, col("sk")).limit(10)
      val b2 = top.select(col("sk").as("sk2"), col("r1").as("b1"),
        col("r2").as("b2"), col("r3").as("b3"))
      val pw = top.join(broadcast(b2), col("sk") =!= col("sk2"))
        .groupBy("sk")
        .agg(sum(when(
          (when(col("r1") < col("b1"), 1).otherwise(0)
            + when(col("r2") < col("b2"), 1).otherwise(0)
            + when(col("r3") < col("b3"), 1).otherwise(0)) >= 2, 1L)
          .otherwise(0L)).as("wins"))
      val nt = top.agg(count(lit(1)).as("ntop"))
      top.join(pw, "sk").crossJoin(broadcast(nt))
        .select(col("sk").as("suppkey"), col("score").as("borda_score"),
          col("wins").as("pairwise_wins"),
          when(col("wins") === col("ntop") - 1, 1L).otherwise(0L)
            .as("condorcet_winner"))
        .orderBy(col("borda_score").desc, col("suppkey"))
    },

    // Maximal independent set via Luby's algorithm (2 deterministic
    // rounds): each node draws a portable-md5 priority; a node enters
    // the MIS when its priority beats every remaining neighbor's, then
    // its closed neighborhood leaves the graph — the textbook
    // PARALLEL symmetry-breaker (greedy coloring's sequential scan
    // re-expressed as per-node argmin joins at edge grain). Runs on
    // the above-average strong-lane graph — the raw trade graph is
    // near-complete, whose MIS degenerates to one node.
    QueryDef.sql(
      "q432_luby_mis",
      """WITH lanes AS MATERIALIZED (SELECT c.c_nationkey AS a,
        |    s.s_nationkey AS b, COUNT(*) AS cnt
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
        |mm AS (SELECT SUM(cnt) AS tot, COUNT(*) AS nl FROM lanes),
        |e0 AS MATERIALIZED (SELECT a, b FROM lanes, mm WHERE cnt * nl > tot),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
        |     UNION SELECT b, a FROM e0),
        |n1 AS (SELECT DISTINCT src AS nk FROM e),
        |pr AS (SELECT nk,
        |    ('0x' || substr(md5(CAST(nk AS VARCHAR)), 1, 8))::BIGINT AS p
        |  FROM n1),
        |m1 AS (SELECT pr.nk FROM pr WHERE NOT EXISTS (
        |    SELECT 1 FROM e JOIN pr q ON e.dst = q.nk
        |    WHERE e.src = pr.nk AND (q.p < pr.p
        |      OR (q.p = pr.p AND q.nk < pr.nk)))),
        |gone1 AS (SELECT nk FROM m1
        |  UNION SELECT e.dst FROM e JOIN m1 ON e.src = m1.nk),
        |n2 AS (SELECT nk FROM n1 WHERE nk NOT IN (SELECT nk FROM gone1)),
        |m2 AS (SELECT n2.nk FROM n2 JOIN pr ON n2.nk = pr.nk
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM e JOIN pr q ON e.dst = q.nk
        |    JOIN n2 x ON q.nk = x.nk
        |    WHERE e.src = pr.nk AND (q.p < pr.p
        |      OR (q.p = pr.p AND q.nk < pr.nk))))
        |SELECT nn.n_name, CAST(1 AS BIGINT) AS mis_round
        |FROM m1 JOIN nation nn ON m1.nk = nn.n_nationkey
        |UNION ALL
        |SELECT nn.n_name, 2 FROM m2 JOIN nation nn ON m2.nk = nn.n_nationkey
        |ORDER BY mis_round, n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val lanes = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").cast("long").as("a"),
          col("s_nationkey").cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val mm = lanes.agg(sum("cnt").as("tot"), count(lit(1)).as("nl"))
      val e0 = lanes.crossJoin(broadcast(mm))
        .where(col("cnt") * col("nl") > col("tot")).select("a", "b")
      val e = e0.select(col("a").as("src"), col("b").as("dst"))
        .union(e0.select(col("b"), col("a"))).distinct()
      val pr = e.select(col("src").as("nk")).distinct()
        .withColumn("p",
          expr("CAST(conv(substring(md5(CAST(nk AS STRING)), 1, 8), 16, 10)" +
            " AS BIGINT)"))
      def misRound(nodes: DataFrame): DataFrame = {
        val np = nodes.join(pr, "nk")
        val beat = e
          .join(np.select(col("nk").as("src"), col("p").as("sp")), "src")
          .join(np.select(col("nk").as("dst"), col("p").as("dp"),
            col("nk").as("dk")), "dst")
          .where(col("dp") < col("sp")
            || (col("dp") === col("sp") && col("dk") < col("src")))
          .select(col("src").as("nk")).distinct()
        np.join(beat, Seq("nk"), "left_anti").select("nk")
      }
      val n1 = pr.select("nk")
      val m1 = misRound(n1)
      val gone = m1.union(e.join(m1.withColumnRenamed("nk", "src"), Seq("src"))
        .select(col("dst").as("nk"))).distinct()
      val n2 = n1.join(gone, Seq("nk"), "left_anti")
      val m2 = misRound(n2)
      m1.withColumn("mis_round", lit(1L))
        .unionByName(m2.withColumn("mis_round", lit(2L)))
        .join(broadcast(t.nation), col("nk") === col("n_nationkey"))
        .select(col("n_name"), col("mis_round"))
        .orderBy("mis_round", "n_name")
    },

    // Count-min-sketch accuracy sweep: the top-10 heavy part keys
    // estimated from 4-row CMS sketches at widths 256/1024/4096
    // against exact counts — the width-vs-overcount tradeoff curve
    // that sizes a production sketch (q87's heavy hitters pinned one
    // config; this prices the knob). Bucket sums aggregate on the
    // (seed, width, bucket) grain; estimates are the min over seeds of
    // the key's bucket sum; overcount in exact ppm.
    QueryDef.sql(
      "q433_cms_sweep",
      """WITH k AS (SELECT l_partkey AS pk, COUNT(*) AS c FROM lineitem
        |  GROUP BY 1),
        |seeds AS (SELECT unnest(generate_series(0, 3)) AS seed),
        |widths AS (SELECT unnest([256, 1024, 4096]) AS w),
        |hb AS (SELECT k.pk, k.c, s.seed, wd.w,
        |    ('0x' || substr(md5(CAST(s.seed AS VARCHAR) || ':'
        |       || CAST(k.pk AS VARCHAR)), 1, 8))::BIGINT % wd.w AS bkt
        |  FROM k, seeds s, widths wd),
        |bs AS (SELECT seed, w, bkt, SUM(c) AS bsum FROM hb GROUP BY 1, 2, 3),
        |top AS (SELECT pk, c FROM k ORDER BY c DESC, pk LIMIT 10),
        |est AS (SELECT hb.pk, hb.w, MIN(bs.bsum) AS est
        |  FROM hb JOIN top ON hb.pk = top.pk
        |  JOIN bs ON hb.seed = bs.seed AND hb.w = bs.w AND hb.bkt = bs.bkt
        |  GROUP BY 1, 2)
        |SELECT est.w AS width, est.pk AS partkey, CAST(top.c AS BIGINT) AS exact,
        |  CAST(est.est AS BIGINT) AS cms_est,
        |  CAST(1000000 * (est.est - top.c) // top.c AS BIGINT) AS overcount_ppm
        |FROM est JOIN top ON est.pk = top.pk
        |ORDER BY width, exact DESC, partkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val k = Tables(s, dir).lineitem
        .groupBy(col("l_partkey").as("pk")).agg(count(lit(1)).as("c"))
      val seeds = s.range(0, 4).select(col("id").as("seed"))
      val widths = Seq(256L, 1024L, 4096L).toDF("w")
      val hb = k.crossJoin(broadcast(seeds)).crossJoin(broadcast(widths))
        .withColumn("bkt",
          expr("CAST(conv(substring(md5(concat(CAST(seed AS STRING), ':'," +
            " CAST(pk AS STRING))), 1, 8), 16, 10) AS BIGINT) % w"))
      val bs = hb.groupBy("seed", "w", "bkt").agg(sum("c").as("bsum"))
      val top = k.orderBy(col("c").desc, col("pk")).limit(10)
      val est = hb.join(broadcast(top.select(col("pk"))), "pk")
        .join(bs, Seq("seed", "w", "bkt"))
        .groupBy("pk", "w").agg(min("bsum").as("est"))
      est.join(broadcast(top), "pk")
        .select(col("w").as("width"), col("pk").as("partkey"),
          col("c").as("exact"), col("est").as("cms_est"),
          expr("CAST(1000000 * (est - c) div c AS BIGINT)").as("overcount_ppm"))
        .orderBy(col("width"), col("exact").desc, col("partkey"))
    },

    // Robust-location family per event type: raw mean, 5%-trimmed mean
    // (drop the outer ceil(n·0.05) ranks on each side), and winsorized
    // mean (clamp to the discrete p5/p95 instead of dropping) — the
    // three standard answers to heavy tails, all from ONE rank-index
    // window pass with exact integer division (completing q428's
    // median-of-means and q356's MAD).
    QueryDef.sql(
      "q434_trimmed_means",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v FROM events),
        |r AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v, v) AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
        |q AS (SELECT event_type,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.05) AS BIGINT) THEN v END) AS p5,
        |    MAX(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT) THEN v END) AS p95
        |  FROM r GROUP BY 1),
        |m AS (SELECT r.event_type, MIN(r.n) AS n,
        |    SUM(r.v) // MIN(r.n) AS mean_raw,
        |    CAST(SUM(CASE WHEN r.rk > CAST(ceil(r.n * 0.05) AS BIGINT)
        |          AND r.rk <= r.n - CAST(ceil(r.n * 0.05) AS BIGINT)
        |        THEN r.v END)
        |      // SUM(CASE WHEN r.rk > CAST(ceil(r.n * 0.05) AS BIGINT)
        |          AND r.rk <= r.n - CAST(ceil(r.n * 0.05) AS BIGINT)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS mean_trimmed,
        |    SUM(LEAST(GREATEST(r.v, q.p5), q.p95)) // MIN(r.n) AS mean_winsor
        |  FROM r JOIN q ON r.event_type = q.event_type GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(mean_raw AS BIGINT) AS mean_raw,
        |  mean_trimmed, CAST(mean_winsor AS BIGINT) AS mean_winsor
        |FROM m ORDER BY event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(1000000.0)).cast("long").as("v"))
      val wp = Window.partitionBy("event_type")
      val r = e.select(col("event_type"), col("v"),
        row_number().over(wp.orderBy("v", "v")).as("rk"),
        count(lit(1)).over(wp).as("n"))
      val q = r.groupBy("event_type")
        .agg(max(when(col("rk") === ceil(col("n") * 0.05).cast("long"), col("v"))).as("p5"),
          max(when(col("rk") === ceil(col("n") * 0.95).cast("long"), col("v"))).as("p95"))
      val inTrim = col("rk") > ceil(col("n") * 0.05).cast("long") &&
        col("rk") <= col("n") - ceil(col("n") * 0.05).cast("long")
      r.join(broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(min("n").as("n"), sum("v").as("sv"),
          sum(when(inTrim, col("v"))).as("tv"),
          sum(when(inTrim, 1L).otherwise(0L)).as("tn"),
          sum(least(greatest(col("v"), col("p5")), col("p95"))).as("wv"))
        .select(col("event_type"), col("n"),
          expr("CAST(sv div n AS BIGINT)").as("mean_raw"),
          expr("CAST(tv div tn AS BIGINT)").as("mean_trimmed"),
          expr("CAST(wv div n AS BIGINT)").as("mean_winsor"))
        .orderBy("event_type")
    },

    // Chunk-size advisor: measured average row width per table (fixed
    // 8 bytes per numeric/timestamp column + mean string lengths) →
    // rows per 128 MiB chunk and the chunk count at this SF — the
    // data-driven version of the reference's hand-tuned chunk-size
    // knobs (BASELINE.md: 10 k compare rows, 100 k migrate rows).
    // One aggregate per table; everything else is literal-grain math.
    QueryDef.sql(
      "q435_chunk_advisor",
      """WITH li AS (SELECT COUNT(*) AS rows_,
        |    CAST(FLOOR(8 * 8 + AVG(length(l_returnflag))
        |      + AVG(length(l_linestatus)) + 8) AS BIGINT) AS row_bytes
        |  FROM lineitem),
        |o AS (SELECT COUNT(*) AS rows_,
        |    CAST(FLOOR(8 * 3 + AVG(length(o_orderstatus))
        |      + AVG(length(o_orderpriority)) + 8) AS BIGINT) AS row_bytes
        |  FROM orders),
        |d AS (SELECT COUNT(*) AS rows_,
        |    CAST(FLOOR(8 * 2 + AVG(length(text)) + AVG(length(lang))
        |      + AVG(length(source))) AS BIGINT) AS row_bytes
        |  FROM documents),
        |u AS (SELECT 'lineitem' AS tbl, rows_, row_bytes FROM li
        |  UNION ALL SELECT 'orders', rows_, row_bytes FROM o
        |  UNION ALL SELECT 'documents', rows_, row_bytes FROM d)
        |SELECT tbl, CAST(rows_ AS BIGINT) AS n_rows,
        |  CAST(row_bytes AS BIGINT) AS row_bytes,
        |  CAST(134217728 // row_bytes AS BIGINT) AS rows_per_chunk,
        |  CAST((rows_ + 134217728 // row_bytes - 1) // (134217728 // row_bytes)
        |    AS BIGINT) AS n_chunks
        |FROM u ORDER BY tbl""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def adv(label: String, df: DataFrame, fixed: Int,
              strCols: Seq[String]): DataFrame = {
        val widths = strCols.map(c => avg(length(col(c))))
          .reduceOption(_ + _).getOrElse(lit(0.0))
        df.agg(count(lit(1)).as("n_rows"),
            (lit(fixed * 8) + widths + lit(if (label == "documents") 0 else 8))
              .cast("long").as("row_bytes"))
          .select(lit(label).as("tbl"), col("n_rows"), col("row_bytes"),
            expr("CAST(134217728 div row_bytes AS BIGINT)").as("rows_per_chunk"),
            expr("CAST((n_rows + 134217728 div row_bytes - 1)" +
              " div (134217728 div row_bytes) AS BIGINT)").as("n_chunks"))
      }
      Seq(
        adv("lineitem", t.lineitem, 8, Seq("l_returnflag", "l_linestatus")),
        adv("orders", t.orders, 3, Seq("o_orderstatus", "o_orderpriority")),
        adv("documents", t.documents, 2, Seq("text", "lang", "source")))
        .reduce(_.unionByName(_))
        .orderBy("tbl")
    },

    // Autocomplete index build: for the 15 hottest 4-character name
    // prefixes (by part revenue), the top-3 completions ranked by
    // revenue — the prefix→suggestions frame a typeahead service
    // precomputes. Token revenue aggregates once on the (prefix, word)
    // grain; per-prefix ranking is a bounded window; hotness and
    // suggestion ranks share one deterministic tie-break.
    QueryDef.sql(
      "q436_autocomplete",
      """WITH w AS (SELECT unnest(string_split(p.p_name, ' ')) AS word,
        |    CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |g AS (SELECT substr(word, 1, 4) AS prefix, word,
        |        SUM(cents) AS cents
        |      FROM w WHERE length(word) >= 4 GROUP BY 1, 2),
        |hot AS (SELECT prefix, SUM(cents) AS pc FROM g GROUP BY 1
        |        ORDER BY pc DESC, prefix LIMIT 15),
        |r AS (SELECT g.prefix, g.word, g.cents,
        |    row_number() OVER (PARTITION BY g.prefix
        |      ORDER BY g.cents DESC, g.word) AS rk
        |  FROM g JOIN hot ON g.prefix = hot.prefix)
        |SELECT prefix, rk AS rank, word AS completion,
        |  CAST(cents AS BIGINT) AS cents
        |FROM r WHERE rk <= 3 ORDER BY prefix, rank""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val w = t.lineitem
        .join(t.part.select("p_partkey", "p_name"), col("l_partkey") === col("p_partkey"))
        .select(explode(split(col("p_name"), " ")).as("word"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("cents"))
      val g = w.where(length(col("word")) >= 4)
        .groupBy(substring(col("word"), 1, 4).as("prefix"), col("word"))
        .agg(sum("cents").as("cents"))
      val hot = g.groupBy("prefix").agg(sum("cents").as("pc"))
        .orderBy(col("pc").desc, col("prefix")).limit(15)
      g.join(broadcast(hot.select("prefix")), "prefix")
        .select(col("prefix"), col("word"), col("cents"),
          row_number().over(Window.partitionBy("prefix")
            .orderBy(col("cents").desc, col("word"))).cast("long").as("rank"))
        .where(col("rank") <= 3)
        .select(col("prefix"), col("rank"), col("word").as("completion"), col("cents"))
        .orderBy("prefix", "rank")
    },

    // Minimum-variance two-asset portfolio over the daily revenue
    // streams of nations 0 and 1: w* = (σ₂² − σ₁₂) / (σ₁² + σ₂² −
    // 2σ₁₂) from exact integer moment sums on the shared day spine,
    // clamped to [0, 1e6] ppm, with the resulting portfolio variance
    // — closed-form Markowitz, no solver. One day-grain aggregate per
    // nation, one scalar assembly.
    QueryDef.sql(
      "q437_min_var_portfolio",
      """WITH d AS (SELECT c.c_nationkey AS nk,
        |    date_diff('day', TIMESTAMP '1995-01-01', o.o_orderdate) AS day,
        |    SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey IN (0, 1) GROUP BY 1, 2),
        |j AS (SELECT a.day, a.y AS y1, b.y AS y2
        |  FROM (SELECT day, y FROM d WHERE nk = 0) a
        |  JOIN (SELECT day, y FROM d WHERE nk = 1) b ON a.day = b.day),
        |m AS (SELECT COUNT(*) AS n, SUM(y1) AS s1, SUM(y2) AS s2,
        |    SUM(y1 * y1) AS s11, SUM(y2 * y2) AS s22, SUM(y1 * y2) AS s12
        |  FROM j),
        |v AS (SELECT n,
        |    CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1 AS v1,
        |    CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2 AS v2,
        |    CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2 AS cv
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |  CAST(LEAST(GREATEST(FLOOR(1000000.0 * (v2 - cv) / (v1 + v2 - 2 * cv)),
        |    0), 1000000) AS BIGINT) AS w1_ppm,
        |  CAST(FLOOR((v1 * v2 - cv * cv) / (v1 + v2 - 2 * cv)
        |    / n / (n - 1)) AS BIGINT) AS min_var_floor
        |FROM v""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .where(col("c_nationkey").isin(0, 1))
        .groupBy(col("c_nationkey").as("nk"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("y"))
      val a = d.where(col("nk") === 0).select(col("day"), col("y").as("y1"))
      val b = d.where(col("nk") === 1).select(col("day").as("day2"), col("y").as("y2"))
      a.join(b, col("day") === col("day2"))
        .agg(count(lit(1)).as("n"), sum("y1").as("s1"), sum("y2").as("s2"),
          // decimal(38,0): Σy² passes 9e18 at sf0.1 day-revenue magnitudes
          sum(col("y1").cast("decimal(38,0)") * col("y1")).as("s11"),
          sum(col("y2").cast("decimal(38,0)") * col("y2")).as("s22"),
          sum(col("y1").cast("decimal(38,0)") * col("y2")).as("s12"))
        .select(col("n").as("n_days"),
          expr("CAST(LEAST(GREATEST(FLOOR(1000000.0D *" +
            " ((CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)" +
            " - (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2))" +
            " / ((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)" +
            " + (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)" +
            " - 2 * (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2))), 0)," +
            " 1000000) AS BIGINT)").as("w1_ppm"),
          expr("CAST(FLOOR(((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)" +
            " * (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)" +
            " - (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)" +
            " * (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2))" +
            " / ((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)" +
            " + (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)" +
            " - 2 * (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2))" +
            " / n / (n - 1)) AS BIGINT)").as("min_var_floor"))
    }
  )
}

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
    }
  )
}

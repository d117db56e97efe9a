package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Round-4 frontier operators: graph centrality, forensic digit audits,
  * robust outlier screens, and ordered-run analytics. Shared conventions
  * (SURVEY §2.8): exact integer/DECIMAL arithmetic end-to-end, truncating
  * `div` only on non-negative operands (DuckDB `//` floors, Spark `div`
  * truncates — identical there), deterministic total order on every result.
  */
object FrontierQueries {

  val all: Seq[QueryDef] = Seq(

    // PageRank (3 unrolled power iterations, damping 0.85) over the
    // symmetrized nation trade graph: edge cust-nation ↔ supp-nation per
    // order line. The graph collapses to ≤ |N|² = 625 edges via an early
    // DISTINCT pushed below the rank loop, so each iteration is a
    // broadcast join against a 25-row rank frame — the big tables are
    // touched exactly once regardless of iteration count. Rank mass is
    // kept in exact ppm units: teleport = 150000 div N, spread =
    // (850 · Σ pr div deg) div 1000; symmetrization guarantees every
    // node has outdeg ≥ 1 (no dangling-mass redistribution needed).
    // 100 TB path: the only full-data pass is the edge-projection
    // aggregate; iterations run on the aggregated graph.
    QueryDef.sql(
      "q354_pagerank",
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
        |d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS cnt FROM d),
        |p0 AS (SELECT src AS n, CAST(1000000 // cnt AS BIGINT) AS pr FROM d, nn),
        |s1 AS (SELECT e.dst AS n, SUM(p0.pr // d.deg) AS s
        |       FROM e JOIN p0 ON e.src = p0.n JOIN d ON e.src = d.src GROUP BY e.dst),
        |p1 AS (SELECT n, CAST(150000 // cnt + (850 * s) // 1000 AS BIGINT) AS pr
        |       FROM s1, nn),
        |s2 AS (SELECT e.dst AS n, SUM(p1.pr // d.deg) AS s
        |       FROM e JOIN p1 ON e.src = p1.n JOIN d ON e.src = d.src GROUP BY e.dst),
        |p2 AS (SELECT n, CAST(150000 // cnt + (850 * s) // 1000 AS BIGINT) AS pr
        |       FROM s2, nn),
        |s3 AS (SELECT e.dst AS n, SUM(p2.pr // d.deg) AS s
        |       FROM e JOIN p2 ON e.src = p2.n JOIN d ON e.src = d.src GROUP BY e.dst),
        |p3 AS (SELECT n, CAST(150000 // cnt + (850 * s) // 1000 AS BIGINT) AS pr
        |       FROM s3, nn)
        |SELECT n.n_name, p3.pr AS pr_ppm
        |FROM p3 JOIN nation n ON p3.n = n.n_nationkey
        |ORDER BY pr_ppm DESC, n.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val e0 = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .select(col("c_nationkey").cast("long").as("a"),
          col("s_nationkey").cast("long").as("b"))
        .distinct()
      val e = e0.select(col("a").as("src"), col("b").as("dst"))
        .union(e0.select(col("b").as("src"), col("a").as("dst"))).distinct()
      val d = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val nn = d.agg(count(lit(1)).as("cnt"))
      val ed = e.join(d, "src") // (src, dst, deg)
      var pr = d.crossJoin(broadcast(nn))
        .select(col("src").as("n"), expr("CAST(1000000 div cnt AS BIGINT)").as("pr"))
      for (_ <- 1 to 3) {
        pr = ed.join(broadcast(pr), ed("src") === pr("n"))
          .groupBy(col("dst"))
          .agg(sum(expr("pr div deg")).as("spread"))
          .crossJoin(broadcast(nn))
          .select(col("dst").as("n"),
            expr("CAST((150000 div cnt) + (850 * spread) div 1000 AS BIGINT)").as("pr"))
      }
      pr.join(broadcast(t.nation), pr("n") === col("n_nationkey"))
        .select(col("n_name"), col("pr").as("pr_ppm"))
        .orderBy(col("pr_ppm").desc, col("n_name"))
    },

    // Benford first-digit forensic audit over order totals (cents): the
    // leading digit of a positive BIGINT via its decimal string — both
    // engines render integers identically. Observed share in exact ppm
    // (1e6·n div total); expected Benford mass floor(1e6·log10(1+1/d))
    // hard-coded as the same 9 literals on both sides (no transcendental
    // evaluated at query time); signed deviation is plain Long
    // subtraction. One aggregation pass, 9-row result.
    QueryDef.sql(
      "q355_benford",
      """WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |        COUNT(*) AS n
        |      FROM c GROUP BY 1),
        |t AS (SELECT SUM(n) AS total FROM d)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |  CAST(1000000 * n // total AS BIGINT) AS obs_ppm,
        |  CAST(CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
        |    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
        |    WHEN 7 THEN 57991 WHEN 8 THEN 51152 ELSE 45757 END AS BIGINT)
        |    AS benford_ppm,
        |  CAST(1000000 * n // total
        |    - CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
        |        WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
        |        WHEN 7 THEN 57991 WHEN 8 THEN 51152 ELSE 45757 END AS BIGINT)
        |    AS dev_ppm
        |FROM d, t ORDER BY digit""".stripMargin) { (s, dir) =>
      val benford = "CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938" +
        " WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946" +
        " WHEN 7 THEN 57991 WHEN 8 THEN 51152 ELSE 45757 END"
      val d = Tables(s, dir).orders
        .select(floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
        .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val t = d.agg(sum("n").as("total"))
      d.crossJoin(broadcast(t))
        .select(col("digit"), col("n"),
          expr("CAST(1000000 * n div total AS BIGINT)").as("obs_ppm"),
          expr(s"CAST($benford AS BIGINT)").as("benford_ppm"),
          expr(s"CAST(1000000 * n div total - ($benford) AS BIGINT)").as("dev_ppm"))
        .orderBy("digit")
    },

    // Median-absolute-deviation robust outlier screen per event type:
    // both the center and the spread are discrete medians (DuckDB's
    // probed quantile_disc convention — the value at 1-based sorted
    // index ceil(n·q)), computed distributed with the q152 rank-index
    // pattern (window row_number + count, filter the index row — never
    // a per-group collect). Outliers are |x−med| > 3·MAD; counts and
    // exact ppm rate per group. Robust where q341's Shewhart z-test is
    // mean-skewed by the very outliers it hunts.
    QueryDef.sql(
      "q356_mad_outliers",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS cents FROM events),
        |m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med
        |      FROM e GROUP BY 1),
        |dev AS (SELECT e.event_type, abs(e.cents - m.med) AS d, m.med
        |        FROM e JOIN m ON e.event_type = m.event_type),
        |md AS (SELECT event_type, quantile_disc(d, 0.5) AS mad
        |       FROM dev GROUP BY 1)
        |SELECT dev.event_type, MIN(dev.med) AS med, MIN(md.mad) AS mad,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE dev.d > 3 * md.mad) AS n_outlier,
        |  CAST(1000000 * COUNT(*) FILTER (WHERE dev.d > 3 * md.mad) // COUNT(*)
        |    AS BIGINT) AS outlier_ppm
        |FROM dev JOIN md ON dev.event_type = md.event_type
        |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(1000000.0)).cast("long").as("cents"))
      def discMedian(df: DataFrame, valCol: String, out: String): DataFrame = {
        val w = Window.partitionBy("event_type").orderBy(valCol)
        df.select(col("event_type"), col(valCol),
            row_number().over(w).as("rn"),
            count(lit(1)).over(Window.partitionBy("event_type")).as("cnt"))
          .where(col("rn") === ceil(col("cnt") * lit(0.5)))
          .groupBy("event_type").agg(min(valCol).as(out))
      }
      val med = discMedian(e, "cents", "med")
      val dev = e.join(broadcast(med), "event_type")
        .select(col("event_type"), col("cents"), col("med"),
          abs(col("cents") - col("med")).as("d"))
      val mad = discMedian(dev.select(col("event_type"), col("d")), "d", "mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(min("med").as("med"), min("mad").as("mad"), count(lit(1)).as("n"),
          sum(when(col("d") > lit(3) * col("mad"), 1L).otherwise(0L)).as("n_outlier"))
        .select(col("event_type"), col("med"), col("mad"), col("n"), col("n_outlier"),
          expr("CAST(1000000 * n_outlier div n AS BIGINT)").as("outlier_ppm"))
        .orderBy("event_type")
    },

    // Gaps-and-islands: per-customer runs of consecutive order DAYS.
    // The classic island key day − row_number() is shuffle-minimal —
    // one window partitioned by customer over the deduped (cust, day)
    // grain, then two aggregates that reuse the same partitioning.
    // Output is the island-length distribution plus how many distinct
    // customers achieve each streak length (ordered-run analytics the
    // sessionizer q7 can't express: calendar-day grain, not gap
    // threshold).
    QueryDef.sql(
      "q357_gap_islands",
      """WITH od AS (SELECT DISTINCT o_custkey,
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS d
        |  FROM orders),
        |isl AS (SELECT o_custkey,
        |    d - row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS grp
        |  FROM od),
        |runs AS (SELECT o_custkey, grp, COUNT(*) AS len
        |         FROM isl GROUP BY 1, 2)
        |SELECT len AS island_len, COUNT(*) AS n_islands,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM runs GROUP BY 1 ORDER BY island_len""".stripMargin) { (s, dir) =>
      val od = Tables(s, dir).orders
        .select(col("o_custkey"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).cast("long").as("d"))
        .distinct()
      val w = Window.partitionBy("o_custkey").orderBy("d")
      val runs = od
        .select(col("o_custkey"), (col("d") - row_number().over(w)).as("grp"))
        .groupBy("o_custkey", "grp").agg(count(lit(1)).as("len"))
      runs.groupBy(col("len").as("island_len"))
        .agg(count(lit(1)).as("n_islands"),
          countDistinct("o_custkey").as("n_customers"))
        .orderBy("island_len")
    },

    // Pareto frontier (skyline) over parts: minimize price, maximize
    // size. A part survives iff no strictly-cheaper-or-equal part has
    // >= size with one strict inequality. After deduping to the
    // (cents, max size) grain, the frontier test is a prefix-max of
    // size in price order. The Spark side runs it DISTRIBUTED: price
    // bands partition the window (per-band prefix-max), and the
    // cross-band carry-in is a prefix-max over the tiny band-grain
    // frame, broadcast back — no global single-task sort at any scale.
    // The oracle states the same thing as one flat window.
    QueryDef.sql(
      "q358_pareto_frontier",
      """WITH g AS (SELECT CAST(FLOOR(p_retailprice * 100.0) AS BIGINT) AS cents,
        |    MAX(p_size) AS size FROM part GROUP BY 1),
        |w AS (SELECT cents, size,
        |    MAX(size) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best
        |  FROM g)
        |SELECT cents, CAST(size AS BIGINT) AS size
        |FROM w WHERE best IS NULL OR size > best
        |ORDER BY cents""".stripMargin) { (s, dir) =>
      val g = Tables(s, dir).part
        .select(floor(col("p_retailprice") * lit(100.0)).cast("long").as("cents"),
          col("p_size"))
        .groupBy("cents").agg(max("p_size").cast("long").as("size"))
        .withColumn("band", expr("cents div 10000"))
      val bandMax = g.groupBy("band").agg(max("size").as("bmax"))
      val wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
      val carry = bandMax // band-grain: tiny regardless of |part|
        .select(col("band"), max("bmax").over(wb).as("carry"))
      val wp = Window.partitionBy("band").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.join(broadcast(carry), "band")
        .select(col("cents"), col("size"),
          greatest(coalesce(max("size").over(wp), lit(Long.MinValue)),
            coalesce(col("carry"), lit(Long.MinValue))).as("best"))
        .where(col("best") === Long.MinValue || col("size") > col("best"))
        .select("cents", "size")
        .orderBy("cents")
    },

    // Weighted median of line price, weighted by quantity, per return
    // flag: the smallest value whose doubled inclusive cumulative
    // weight reaches the group total. Weights aggregate to the
    // (flag, cents) grain first, so the running sum is over a unique
    // ordering (deterministic), and every window is partitioned by
    // flag — no global sort. Both engines state the identical
    // 2·cumw ≥ W rule; all arithmetic is exact BIGINT.
    QueryDef.sql(
      "q359_weighted_median",
      """WITH g AS (SELECT l_returnflag AS flag,
        |    CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents,
        |    SUM(CAST(l_quantity AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT flag, cents, w,
        |    SUM(w) OVER (PARTITION BY flag ORDER BY cents
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    SUM(w) OVER (PARTITION BY flag) AS tw
        |  FROM g)
        |SELECT flag, MIN(cents) AS wmedian_cents,
        |  CAST(MIN(tw) AS BIGINT) AS total_weight
        |FROM c WHERE 2 * cw >= tw GROUP BY flag ORDER BY flag""".stripMargin) { (s, dir) =>
      val g = Tables(s, dir).lineitem
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("cents"),
          col("l_quantity").cast("long").as("q"))
        .groupBy("flag", "cents").agg(sum("q").as("w"))
      val wc = Window.partitionBy("flag").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("flag"), col("cents"), col("w"),
          sum("w").over(wc).as("cw"),
          sum("w").over(Window.partitionBy("flag")).as("tw"))
        .where(lit(2) * col("cw") >= col("tw"))
        .groupBy("flag")
        .agg(min("cents").as("wmedian_cents"), min("tw").as("total_weight"))
        .orderBy("flag")
    },

    // Zipf constancy audit over the corpus vocabulary: under Zipf's law
    // rank × frequency is near-constant, so the product (scaled to ppm
    // of total token mass) exposes how head-heavy the distribution is
    // without evaluating any logarithm. Token counts aggregate on the
    // (bounded) vocabulary grain; ranks are a window over that tiny
    // frame with an explicit (freq desc, token) tie-break. Top-100 cap
    // keeps the result bounded for real vocabularies.
    QueryDef.sql(
      "q360_zipf_constancy",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |f AS (SELECT token, COUNT(*) AS freq FROM tok
        |      WHERE token <> '' GROUP BY 1),
        |t AS (SELECT SUM(freq) AS total FROM f),
        |r AS (SELECT token, freq,
        |    row_number() OVER (ORDER BY freq DESC, token) AS rank FROM f)
        |SELECT rank, token, freq,
        |  CAST(rank * freq AS BIGINT) AS rank_freq,
        |  CAST(1000000 * rank * freq // total AS BIGINT) AS rf_ppm
        |FROM r, t WHERE rank <= 100 ORDER BY rank""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("freq"))
      val t = f.agg(sum("freq").as("total"))
      f.select(col("token"), col("freq"),
          row_number().over(Window.orderBy(col("freq").desc, col("token"))).cast("long").as("rank"))
        .where(col("rank") <= 100)
        .crossJoin(broadcast(t))
        .select(col("rank"), col("token"), col("freq"),
          (col("rank") * col("freq")).as("rank_freq"),
          expr("CAST(1000000 * rank * freq div total AS BIGINT)").as("rf_ppm"))
        .orderBy("rank")
    },

    // RFM segmentation: per-customer Recency (days to the corpus
    // horizon), Frequency (orders), Monetary (cents) → quintile scores
    // via ntile(5) with explicit custkey tie-breaks (ntile's split rule
    // is identical cross-engine, q338's precedent), concatenated into
    // the classic 111..555 cell. Output is the cell-grain census —
    // ≤125 rows whatever the customer count. Recency ntile orders
    // DESCENDING days so score 5 = most recent, matching F/M where
    // bigger is better.
    QueryDef.sql(
      "q361_rfm",
      """WITH u AS (SELECT o_custkey,
        |    date_diff('day', MAX(o_orderdate), TIMESTAMP '2001-08-01') AS r_days,
        |    COUNT(*) AS f_orders,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS m_cents
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT o_custkey,
        |    ntile(5) OVER (ORDER BY r_days DESC, o_custkey) AS r,
        |    ntile(5) OVER (ORDER BY f_orders, o_custkey) AS f,
        |    ntile(5) OVER (ORDER BY m_cents, o_custkey) AS m,
        |    f_orders, m_cents
        |  FROM u)
        |SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_cell,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(f_orders) AS BIGINT) AS sum_orders,
        |  CAST(SUM(m_cents) AS BIGINT) AS sum_cents
        |FROM sc GROUP BY 1 ORDER BY rfm_cell""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).orders
        .groupBy("o_custkey")
        .agg(datediff(lit("2001-08-01").cast("date"), to_date(max("o_orderdate")))
            .cast("long").as("r_days"),
          count(lit(1)).as("f_orders"),
          sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("m_cents"))
      val sc = u.select(col("o_custkey"), col("f_orders"), col("m_cents"),
        ntile(5).over(Window.orderBy(col("r_days").desc, col("o_custkey"))).cast("long").as("r"),
        ntile(5).over(Window.orderBy(col("f_orders"), col("o_custkey"))).cast("long").as("f"),
        ntile(5).over(Window.orderBy(col("m_cents"), col("o_custkey"))).cast("long").as("m"))
      sc.groupBy((col("r") * 100 + col("f") * 10 + col("m")).as("rfm_cell"))
        .agg(count(lit(1)).as("n_customers"),
          sum("f_orders").as("sum_orders"), sum("m_cents").as("sum_cents"))
        .orderBy("rfm_cell")
    },

    // Zone-map (min/max) pruning advisor — the parquet row-group skipping
    // simulation. Two physical layouts of lineitem are priced against the
    // same 90-day predicates: 'rowmajor' chunks by insertion order
    // (l_orderkey div 512 — ship dates uncorrelated, zone maps span the
    // whole domain) vs 'clustered' chunks by 30-day ship buckets (tight
    // zone maps). A chunk is pruned iff max < lo or min >= hi. Everything
    // after the one stats pass runs on the chunk grain (hundreds of rows
    // at any SF), so the advisor itself never rescans the fact table —
    // exactly how a table-format metadata layer prices file skipping.
    QueryDef.sql(
      "q362_zonemap_prune",
      """WITH li AS (SELECT l_orderkey AS k,
        |    date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS d
        |  FROM lineitem),
        |ca AS (SELECT k // 512 AS chunk, MIN(d) AS lo, MAX(d) AS hi,
        |        COUNT(*) AS cnt FROM li GROUP BY 1),
        |cb AS (SELECT d // 30 AS chunk, MIN(d) AS lo, MAX(d) AS hi,
        |        COUNT(*) AS cnt FROM li GROUP BY 1),
        |lay AS (SELECT 'rowmajor' AS layout, * FROM ca
        |        UNION ALL SELECT 'clustered', * FROM cb),
        |p AS (SELECT * FROM (VALUES (1, 730, 820), (2, 1095, 1185),
        |       (3, 1460, 1550), (4, 1825, 1915)) AS t(pid, plo, phi)),
        |mt AS (SELECT pid, COUNT(*) AS matched FROM li, p
        |       WHERE d >= plo AND d < phi GROUP BY 1)
        |SELECT lay.layout, p.pid,
        |  COUNT(*) AS n_chunks,
        |  COUNT(*) FILTER (WHERE hi < plo OR lo >= phi) AS n_pruned,
        |  CAST(COALESCE(SUM(cnt) FILTER (WHERE NOT (hi < plo OR lo >= phi)), 0)
        |    AS BIGINT) AS rows_scanned,
        |  MIN(mt.matched) AS rows_matched,
        |  CAST(CASE WHEN COALESCE(SUM(cnt) FILTER (
        |        WHERE NOT (hi < plo OR lo >= phi)), 0) = 0 THEN 0
        |    ELSE 1000000 * MIN(mt.matched)
        |         // SUM(cnt) FILTER (WHERE NOT (hi < plo OR lo >= phi))
        |    END AS BIGINT) AS efficiency_ppm
        |FROM lay CROSS JOIN p JOIN mt ON mt.pid = p.pid
        |GROUP BY 1, 2 ORDER BY layout, p.pid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey").as("k"),
          datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("d"))
      def zones(c: Column) = li.groupBy(c.as("chunk"))
        .agg(min("d").as("lo"), max("d").as("hi"), count(lit(1)).as("cnt"))
      val lay = zones(expr("k div 512")).withColumn("layout", lit("rowmajor"))
        .unionByName(zones(expr("d div 30")).withColumn("layout", lit("clustered")))
      val p = Seq((1L, 730L, 820L), (2L, 1095L, 1185L),
        (3L, 1460L, 1550L), (4L, 1825L, 1915L)).toDF("pid", "plo", "phi")
      val mt = li.crossJoin(broadcast(p))
        .where(col("d") >= col("plo") && col("d") < col("phi"))
        .groupBy("pid").agg(count(lit(1)).as("matched"))
      val pruned = col("hi") < col("plo") || col("lo") >= col("phi")
      lay.crossJoin(broadcast(p)).join(broadcast(mt), "pid")
        .groupBy("layout", "pid")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(pruned, 1L).otherwise(0L)).as("n_pruned"),
          coalesce(sum(when(!pruned, col("cnt"))), lit(0L)).as("rows_scanned"),
          min("matched").as("rows_matched"))
        .select(col("layout"), col("pid"), col("n_chunks"), col("n_pruned"),
          col("rows_scanned"), col("rows_matched"),
          expr("CAST(CASE WHEN rows_scanned = 0 THEN 0" +
            " ELSE 1000000 * rows_matched div rows_scanned END AS BIGINT)")
            .as("efficiency_ppm"))
        .orderBy("layout", "pid")
    },

    // Exact sliding-window distinct: 7-day rolling distinct users per
    // day. Distinct over a sliding window is NOT decomposable (no
    // partial-merge), so the classic exact plan dedupes to the
    // (day, user) grain FIRST — the only full-data pass — then expands
    // each user-day into the ≤7 window anchors it serves via a range
    // join against the tiny day spine. Expansion factor is the window
    // length, never the raw row count; the final count-distinct
    // shuffles the deduped grain only. (The approximate alternative is
    // a mergeable HLL per day — q60's sketch; this is its exact twin.)
    QueryDef.sql(
      "q363_sliding_distinct",
      """WITH du AS (SELECT DISTINCT
        |    date_diff('day', TIMESTAMP '2024-01-01', ts) AS day, user_id
        |  FROM events),
        |sp AS (SELECT DISTINCT day AS d FROM du)
        |SELECT sp.d AS day, COUNT(DISTINCT du.user_id) AS dau7,
        |  COUNT(*) AS user_days
        |FROM sp JOIN du ON du.day BETWEEN sp.d - 6 AND sp.d
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val du = Tables(s, dir).events
        .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"), col("user_id"))
        .distinct()
      val sp = du.select(col("day").as("d")).distinct()
      broadcast(sp).join(du,
          du("day") >= sp("d") - 6 && du("day") <= sp("d"))
        .groupBy(col("d").as("day"))
        .agg(countDistinct("user_id").as("dau7"), count(lit(1)).as("user_days"))
        .orderBy("day")
    },

    // Join-cardinality estimation audit — the optimizer-statistics
    // question "how big is the self-join on l_partkey?" answered two
    // ways: exactly (Σ c² at the key grain — computed WITHOUT running
    // the join) and from a 64-key-wide bucket histogram under the
    // uniform-within-bucket assumption (n²/d per bucket — what a
    // cost model with equi-width histograms would estimate). The ratio
    // in ppm is the estimator's bias; uniform keys → ratio ≈ 1e6, a
    // skewed key would push the estimate far below the truth. The
    // ×10⁶ numerator goes through decimal(38,0): both sides of the
    // division would wrap a Long near Σc² ~ 9e12 at large SFs.
    QueryDef.sql(
      "q364_join_card_est",
      """WITH k AS (SELECT l_partkey AS pk, COUNT(*) AS c
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT pk // 64 AS bucket, SUM(c) AS n, COUNT(*) AS d,
        |        SUM(c * c) AS actual FROM k GROUP BY 1)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(SUM(d) AS BIGINT) AS n_keys,
        |  COUNT(*) AS n_buckets,
        |  CAST(SUM(actual) AS BIGINT) AS actual_pairs,
        |  CAST(SUM(n * n // d) AS BIGINT) AS est_pairs,
        |  CAST(1000000 * SUM(n * n // d) // SUM(actual) AS BIGINT)
        |    AS ratio_ppm
        |FROM b""".stripMargin) { (s, dir) =>
      val k = Tables(s, dir).lineitem
        .groupBy(col("l_partkey").as("pk")).agg(count(lit(1)).as("c"))
      k.groupBy(expr("pk div 64").as("bucket"))
        .agg(sum("c").as("n"), count(lit(1)).as("d"),
          sum(col("c") * col("c")).as("actual"))
        .agg(sum("n").as("n_rows"), sum("d").as("n_keys"),
          count(lit(1)).as("n_buckets"), sum("actual").as("actual_pairs"),
          sum(expr("n * n div d")).as("est_pairs"))
        .select(col("n_rows"), col("n_keys"), col("n_buckets"),
          col("actual_pairs"), col("est_pairs"),
          expr("CAST(CAST(est_pairs AS DECIMAL(38,0)) * 1000000" +
            " div actual_pairs AS BIGINT)").as("ratio_ppm"))
    },

    // Monthly OHLC bars over order totals — the time-series resample.
    // Open/close are the first/last order of the month under a total
    // (date, orderkey) order, picked with two row_number windows that
    // share one partitioning (month) — a single shuffle serves both
    // directions plus the min/max/sum aggregates. The month grain
    // bounds the window partitions, so no partition ever exceeds a
    // month of data regardless of SF.
    QueryDef.sql(
      "q365_ohlc_bars",
      """WITH o AS (SELECT
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS d,
        |    o_orderkey AS k
        |  FROM orders),
        |r AS (SELECT ym, cents,
        |    row_number() OVER (PARTITION BY ym ORDER BY d, k) AS ra,
        |    row_number() OVER (PARTITION BY ym ORDER BY d DESC, k DESC) AS rd
        |  FROM o)
        |SELECT ym, MAX(CASE WHEN ra = 1 THEN cents END) AS open_cents,
        |  MAX(cents) AS high_cents, MIN(cents) AS low_cents,
        |  MAX(CASE WHEN rd = 1 THEN cents END) AS close_cents,
        |  COUNT(*) AS volume, CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM r GROUP BY ym ORDER BY ym""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
        .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("d"),
          col("o_orderkey").as("k"))
      val wa = Window.partitionBy("ym").orderBy(col("d"), col("k"))
      val wd = Window.partitionBy("ym").orderBy(col("d").desc, col("k").desc)
      o.select(col("ym"), col("cents"),
          row_number().over(wa).as("ra"), row_number().over(wd).as("rd"))
        .groupBy("ym")
        .agg(max(when(col("ra") === 1, col("cents"))).as("open_cents"),
          max("cents").as("high_cents"), min("cents").as("low_cents"),
          max(when(col("rd") === 1, col("cents"))).as("close_cents"),
          count(lit(1)).as("volume"), sum("cents").as("total_cents"))
        .orderBy("ym")
    },

    // Incremental view maintenance for an aggregate-over-join view
    // (per-nation order count + revenue): the view is maintained as
    // base-state ⊎ Δ-contribution — the delta path joins ONLY the new
    // orders (Δ ⋈ dim, a broadcast at any scale) and merges count/sum
    // partials, never rescanning the base fact. Both the recomputed
    // and the incrementally-merged view are emitted side by side with
    // a consistency flag, so the result IS the IVM correctness
    // argument (count/sum are self-maintainable under inserts).
    QueryDef.sql(
      "q366_ivm_join_delta",
      """WITH o AS (SELECT o_custkey,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
        |    (o_orderdate >= TIMESTAMP '2001-01-01') AS is_delta
        |  FROM orders),
        |j AS (SELECT n_name, is_delta, cents FROM o
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey),
        |full_v AS (SELECT n_name, COUNT(*) AS cnt, SUM(cents) AS cents
        |           FROM j GROUP BY 1),
        |parts AS (SELECT n_name, is_delta, COUNT(*) AS cnt, SUM(cents) AS cents
        |          FROM j GROUP BY 1, 2),
        |incr AS (SELECT n_name, SUM(cnt) AS cnt, SUM(cents) AS cents,
        |           CAST(COALESCE(SUM(cnt) FILTER (WHERE is_delta), 0) AS BIGINT)
        |             AS delta_rows
        |         FROM parts GROUP BY 1)
        |SELECT f.n_name, CAST(f.cnt AS BIGINT) AS full_cnt,
        |  CAST(f.cents AS BIGINT) AS full_cents,
        |  CAST(i.cnt AS BIGINT) AS incr_cnt,
        |  CAST(i.cents AS BIGINT) AS incr_cents,
        |  i.delta_rows,
        |  CAST(CASE WHEN f.cnt = i.cnt AND f.cents = i.cents
        |    THEN 1 ELSE 0 END AS BIGINT) AS consistent
        |FROM full_v f JOIN incr i ON f.n_name = i.n_name
        |ORDER BY f.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val j = t.orders
        .select(col("o_custkey"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"),
          (col("o_orderdate") >= lit("2001-01-01").cast("timestamp")).as("is_delta"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select("n_name", "is_delta", "cents")
      val fullV = j.groupBy("n_name")
        .agg(count(lit(1)).as("full_cnt"), sum("cents").as("full_cents"))
      // partial-state merge: one aggregate to the (nation, is_delta)
      // grain (= stored base state + Δ contribution), then the merge
      val incr = j.groupBy("n_name", "is_delta")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("cents"))
        .groupBy("n_name")
        .agg(sum("cnt").as("incr_cnt"), sum("cents").as("incr_cents"),
          coalesce(sum(when(col("is_delta"), col("cnt"))), lit(0L)).as("delta_rows"))
      fullV.join(incr, "n_name")
        .select(col("n_name"), col("full_cnt"), col("full_cents"),
          col("incr_cnt"), col("incr_cents"), col("delta_rows"),
          when(col("full_cnt") === col("incr_cnt") &&
               col("full_cents") === col("incr_cents"), 1L).otherwise(0L)
            .as("consistent"))
        .orderBy("n_name")
    },

    // KMV (k-minimum-values) distinct-count sketch, k=64, audited
    // against the exact NDV of l_partkey. The hash is the portable
    // 32-bit md5 prefix (q325's convention — bit-identical in both
    // engines), so the k-th smallest distinct hash and the estimator
    // (k−1)·2³² div h_k are fully deterministic. The sketch side
    // shuffles only the deduped hash domain; at 100 TB the same plan
    // keeps a 64-value state per partition via partial TOP-K merge —
    // this query pins the estimator arithmetic the mergeable version
    // must reproduce.
    QueryDef.sql(
      "q367_kmv_distinct",
      """WITH h AS (SELECT DISTINCT
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS hv
        |  FROM lineitem),
        |r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rk FROM h),
        |kth AS (SELECT hv AS hk FROM r WHERE rk = 64),
        |ex AS (SELECT COUNT(DISTINCT l_partkey) AS exact_ndv FROM lineitem)
        |SELECT ex.exact_ndv, CAST(64 AS BIGINT) AS k, kth.hk AS kth_hash,
        |  CAST(63 * 4294967296 // kth.hk AS BIGINT) AS est_ndv,
        |  CAST(1000000 * (63 * 4294967296 // kth.hk) // ex.exact_ndv AS BIGINT)
        |    AS ratio_ppm
        |FROM ex, kth""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      val h = li.select(expr("CAST(conv(substring(md5(CAST(l_partkey AS STRING))," +
          " 1, 8), 16, 10) AS BIGINT)").as("hv")).distinct()
      val kth = h.select(col("hv"), row_number().over(Window.orderBy("hv")).as("rk"))
        .where(col("rk") === 64).select(col("hv").as("hk"))
      val ex = li.agg(countDistinct("l_partkey").as("exact_ndv"))
      ex.crossJoin(broadcast(kth))
        .select(col("exact_ndv"), lit(64L).as("k"), col("hk").as("kth_hash"),
          expr("CAST(63 * 4294967296 div hk AS BIGINT)").as("est_ndv"),
          expr("CAST(1000000 * (63 * 4294967296 div hk) div exact_ndv AS BIGINT)")
            .as("ratio_ppm"))
    },

    // Markov steady-state over the per-user event-type transition
    // chain: LAG pairs → transition counts → row-stochastic matrix in
    // exact ppm → three unrolled power iterations from the uniform
    // distribution. Unlike q354's undirected PageRank this is a
    // directed weighted chain with per-row probability mass; every
    // iteration is a join on the ≤|types|² matrix grain (25 rows
    // here), so iteration cost is independent of event volume — the
    // only full-data pass is the LAG window, partitioned by user.
    QueryDef.sql(
      "q368_markov_steady",
      """WITH s AS (SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS b
        |  FROM events),
        |tc AS (SELECT a, b, COUNT(*) AS c FROM s WHERE b IS NOT NULL
        |       GROUP BY 1, 2),
        |rt AS (SELECT a, SUM(c) AS tot FROM tc GROUP BY 1),
        |n AS (SELECT COUNT(*) AS k FROM rt),
        |p0 AS (SELECT a AS st, CAST(1000000 // k AS BIGINT) AS p FROM rt, n),
        |p1 AS (SELECT tc.b AS st, CAST(SUM(p0.p * tc.c // rt.tot) AS BIGINT) AS p
        |       FROM tc JOIN p0 ON tc.a = p0.st JOIN rt ON tc.a = rt.a GROUP BY 1),
        |p2 AS (SELECT tc.b AS st, CAST(SUM(p1.p * tc.c // rt.tot) AS BIGINT) AS p
        |       FROM tc JOIN p1 ON tc.a = p1.st JOIN rt ON tc.a = rt.a GROUP BY 1),
        |p3 AS (SELECT tc.b AS st, CAST(SUM(p2.p * tc.c // rt.tot) AS BIGINT) AS p
        |       FROM tc JOIN p2 ON tc.a = p2.st JOIN rt ON tc.a = rt.a GROUP BY 1)
        |SELECT p0.st AS event_type, p0.p AS p0_ppm, p1.p AS p1_ppm,
        |  p2.p AS p2_ppm, p3.p AS p3_ppm
        |FROM p0 JOIN p1 ON p0.st = p1.st JOIN p2 ON p0.st = p2.st
        |JOIN p3 ON p0.st = p3.st
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tc = ev.select(col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"))
        .where(col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
      val rt = tc.groupBy("a").agg(sum("c").as("tot"))
      val n = rt.agg(count(lit(1)).as("k"))
      val m = tc.join(broadcast(rt), "a") // (a, b, c, tot)
      var ps = Seq(rt.crossJoin(broadcast(n))
        .select(col("a").as("st"), expr("CAST(1000000 div k AS BIGINT)").as("p")))
      for (_ <- 1 to 3) {
        val prev = ps.last
        ps = ps :+ m.join(broadcast(prev), m("a") === prev("st"))
          .groupBy(m("b").as("st2"))
          .agg(sum(expr("p * c div tot")).cast("long").as("p"))
          .select(col("st2").as("st"), col("p"))
      }
      ps.zipWithIndex
        .map { case (df, i) => df.select(col("st"), col("p").as(s"p${i}_ppm")) }
        .reduce((a, b) => a.join(b, "st"))
        .select(col("st").as("event_type"), col("p0_ppm"), col("p1_ppm"),
          col("p2_ppm"), col("p3_ppm"))
        .orderBy("event_type")
    },

    // Heaps'-law vocabulary-growth audit: V(N) — distinct vocabulary
    // size as a function of cumulative token count in doc_id order —
    // sampled every 50 documents. Prefix-distinct is computed WITHOUT
    // any ordered scan: a token's first-occurrence doc is a plain MIN
    // aggregate on the vocabulary grain, and each checkpoint then
    // counts first-occurrences ≤ the cutoff via a broadcast range
    // join against the checkpoint spine — both passes are unordered
    // shuffles on bounded grains (vocab, doc), fully parallel at any
    // corpus size.
    QueryDef.sql(
      "q369_heaps_law",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |t AS (SELECT doc_id, w FROM tok WHERE w <> ''),
        |fo AS (SELECT w, MIN(doc_id) AS first_doc FROM t GROUP BY 1),
        |dt AS (SELECT doc_id, COUNT(*) AS ntok FROM t GROUP BY 1),
        |cp AS (SELECT unnest(generate_series(49, 499, 50)) AS cut)
        |SELECT cp.cut,
        |  (SELECT CAST(SUM(ntok) AS BIGINT) FROM dt WHERE doc_id <= cp.cut)
        |    AS n_tokens,
        |  (SELECT COUNT(*) FROM fo WHERE first_doc <= cp.cut) AS vocab
        |FROM cp ORDER BY cut""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
      val fo = t.groupBy("w").agg(min("doc_id").as("first_doc"))
      val dt = t.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
      val cp = s.range(49, 500, 50).select(col("id").as("cut"))
      val nt = dt.join(broadcast(cp), col("doc_id") <= col("cut"))
        .groupBy("cut").agg(sum("ntok").as("n_tokens"))
      val vo = fo.join(broadcast(cp), col("first_doc") <= col("cut"))
        .groupBy("cut").agg(count(lit(1)).as("vocab"))
      nt.join(vo, "cut").orderBy("cut")
    },

    // Proportional apportionment of 97 seats across nations by revenue,
    // two electoral methods side by side — both closed-form, no
    // seat-by-seat loop. Largest remainder: floor quotas + top-k
    // remainders (k = leftover seats). D'Hondt: rank ALL quotients
    // v/1..v/97 globally and count each nation's entries in the top 97
    // — the standard highest-averages identity turns the iterative
    // award loop into one |N|·97-row window, trivially parallel.
    // Quotients are compared on floor(v·10⁶/j) with a (nation, j)
    // tie-break, identical in both engines.
    QueryDef.sql(
      "q370_apportionment",
      """WITH v AS (SELECT n_name,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
        |tot AS (SELECT SUM(cents) AS vt FROM v),
        |lr AS (SELECT n_name, cents,
        |    CAST(97 * cents // vt AS BIGINT) AS base,
        |    (97 * cents) % vt AS rem
        |  FROM v, tot),
        |lo AS (SELECT 97 - SUM(base) AS leftover FROM lr),
        |lrk AS (SELECT n_name, base,
        |    row_number() OVER (ORDER BY rem DESC, n_name) AS rrk FROM lr),
        |lrs AS (SELECT n_name,
        |    CAST(base + CASE WHEN rrk <= (SELECT leftover FROM lo)
        |      THEN 1 ELSE 0 END AS BIGINT) AS lr_seats
        |  FROM lrk),
        |q AS (SELECT n_name, j.j,
        |    cents * 1000000 // j.j AS quot
        |  FROM v, (SELECT unnest(generate_series(1, 97)) AS j) j),
        |dr AS (SELECT n_name,
        |    row_number() OVER (ORDER BY quot DESC, n_name, j) AS qrk FROM q),
        |dh AS (SELECT n_name, COUNT(*) FILTER (WHERE qrk <= 97) AS dh_seats
        |       FROM dr GROUP BY 1)
        |SELECT v.n_name, CAST(v.cents AS BIGINT) AS cents,
        |  lrs.lr_seats, CAST(dh.dh_seats AS BIGINT) AS dh_seats,
        |  lrs.lr_seats - CAST(dh.dh_seats AS BIGINT) AS seat_diff
        |FROM v JOIN lrs ON v.n_name = lrs.n_name
        |JOIN dh ON v.n_name = dh.n_name
        |ORDER BY v.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val v = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("cents"))
      val tot = v.agg(sum("cents").as("vt"))
      val lr = v.crossJoin(broadcast(tot))
        .select(col("n_name"), col("cents"),
          expr("CAST(97 * cents div vt AS BIGINT)").as("base"),
          expr("(97 * cents) % vt").as("rem"))
      val lo = lr.agg((lit(97) - sum("base")).as("leftover"))
      val lrs = lr
        .select(col("n_name"), col("base"),
          row_number().over(Window.orderBy(col("rem").desc, col("n_name"))).as("rrk"))
        .crossJoin(broadcast(lo))
        .select(col("n_name"),
          (col("base") + when(col("rrk") <= col("leftover"), 1L).otherwise(0L))
            .as("lr_seats"))
      val j = s.range(1, 98).select(col("id").as("j"))
      val dh = v.crossJoin(broadcast(j))
        .select(col("n_name"), col("j"),
          expr("cents * 1000000 div j").as("quot"))
        .select(col("n_name"),
          row_number().over(Window.orderBy(col("quot").desc, col("n_name"), col("j")))
            .as("qrk"))
        .groupBy("n_name")
        .agg(sum(when(col("qrk") <= 97, 1L).otherwise(0L)).as("dh_seats"))
      v.join(lrs, "n_name").join(dh, "n_name")
        .select(col("n_name"), col("cents"), col("lr_seats"), col("dh_seats"),
          (col("lr_seats") - col("dh_seats")).as("seat_diff"))
        .orderBy("n_name")
    },

    // Grouped OLS: price-elasticity proxy — discount (basis points)
    // vs quantity — per part type, closed-form from the five
    // sufficient-statistic sums (one map-side-combined aggregate over
    // the join; no iteration, no per-group collect). Slope and R² in
    // ppm; the slope numerator n·Σxy − Σx·Σy is signed, so the final
    // divisions go through CAST AS DOUBLE + FLOOR (q164's convention
    // — Spark div truncates toward zero while DuckDB // floors, so
    // integer division is only portable on non-negative operands).
    QueryDef.sql(
      "q371_ols_elasticity",
      """WITH d AS (SELECT p_type,
        |    CAST(ROUND(l_discount * 100.0) AS BIGINT) AS x,
        |    CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |s AS (SELECT p_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |      FROM d GROUP BY 1)
        |SELECT p_type, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(1000000.0 * (n * sxy - sx * sy)
        |    / (n * sxx - sx * sx)) AS BIGINT) AS slope_ppm,
        |  CAST(FLOOR(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
        |    * CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (CAST(n * sxx - sx * sx AS DOUBLE)
        |       * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT) AS r2_ppm
        |FROM s ORDER BY p_type""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.lineitem
        .join(t.part.select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_type"),
          round(col("l_discount") * lit(100.0)).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
      d.groupBy("p_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("p_type"), col("n"),
          expr("CAST(FLOOR(1000000.0D * (n * sxy - sx * sy)" +
            " / (n * sxx - sx * sx)) AS BIGINT)").as("slope_ppm"),
          expr("CAST(FLOOR(1000000.0D * CAST(n * sxy - sx * sy AS DOUBLE)" +
            " * CAST(n * sxy - sx * sy AS DOUBLE)" +
            " / (CAST(n * sxx - sx * sx AS DOUBLE)" +
            " * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)").as("r2_ppm"))
        .orderBy("p_type")
    },

    // Exact-penny allocation: each order's total cents split across its
    // lineitems proportionally to quantity, remainders distributed
    // largest-first — the finance-grade allocation where every split
    // sums back to the invoice EXACTLY. All windows partition by
    // orderkey (bounded partitions at any SF, no global sort); the
    // result is the per-(lines-per-order) audit proving Σ allocated =
    // Σ invoiced penny-for-penny, with the worst per-order drift
    // before remainder correction as a diagnostic.
    QueryDef.sql(
      "q372_penny_allocation",
      """WITH l AS (SELECT l_orderkey AS k, l_linenumber AS ln,
        |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
        |o AS (SELECT o_orderkey AS k,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents FROM orders),
        |j AS (SELECT l.k, l.ln, l.q, o.cents,
        |    SUM(l.q) OVER (PARTITION BY l.k) AS qt,
        |    COUNT(*) OVER (PARTITION BY l.k) AS nl
        |  FROM l JOIN o ON l.k = o.k),
        |b AS (SELECT k, ln, nl, cents,
        |    cents * q // qt AS base,
        |    (cents * q) % qt AS rem,
        |    SUM(cents * q // qt) OVER (PARTITION BY k) AS sb
        |  FROM j),
        |a AS (SELECT k, nl, cents, sb,
        |    base + CASE WHEN row_number() OVER (PARTITION BY k
        |        ORDER BY rem DESC, ln) <= cents - sb
        |      THEN 1 ELSE 0 END AS alloc
        |  FROM b),
        |po AS (SELECT k, MIN(nl) AS nl, MIN(cents) AS cents,
        |        SUM(alloc) AS alloc, MIN(cents - sb) AS leftover
        |       FROM a GROUP BY k)
        |SELECT nl AS lines_per_order, COUNT(*) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS invoiced_cents,
        |  CAST(SUM(alloc) AS BIGINT) AS allocated_cents,
        |  CAST(MAX(leftover) AS BIGINT) AS max_leftover,
        |  CAST(CASE WHEN SUM(cents) = SUM(alloc) THEN 1 ELSE 0 END AS BIGINT)
        |    AS exact
        |FROM po GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val l = t.lineitem.select(col("l_orderkey").as("k"),
        col("l_linenumber").as("ln"), col("l_quantity").cast("long").as("q"))
      val o = t.orders.select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      val wk = Window.partitionBy("k")
      val j = l.join(o, "k")
        .select(col("k"), col("ln"), col("q"), col("cents"),
          sum("q").over(wk).as("qt"), count(lit(1)).over(wk).as("nl"))
      val b = j.select(col("k"), col("ln"), col("nl"), col("cents"),
        expr("cents * q div qt").as("base"),
        expr("(cents * q) % qt").as("rem"))
        .withColumn("sb", sum("base").over(wk))
      val a = b.select(col("k"), col("nl"), col("cents"), col("sb"),
        (col("base") + when(
          row_number().over(Window.partitionBy("k").orderBy(col("rem").desc, col("ln")))
            <= col("cents") - col("sb"), 1L).otherwise(0L)).as("alloc"))
      val po = a.groupBy("k")
        .agg(min("nl").as("nl"), min("cents").as("cents"),
          sum("alloc").as("alloc"), min(col("cents") - col("sb")).as("leftover"))
      po.groupBy(col("nl").as("lines_per_order"))
        .agg(count(lit(1)).as("n_orders"),
          sum("cents").as("invoiced_cents"), sum("alloc").as("allocated_cents"),
          max("leftover").as("max_leftover"))
        .select(col("lines_per_order"), col("n_orders"), col("invoiced_cents"),
          col("allocated_cents"), col("max_leftover"),
          when(col("invoiced_cents") === col("allocated_cents"), 1L).otherwise(0L)
            .as("exact"))
        .orderBy("lines_per_order")
    },

    // Bipartiteness check (odd-cycle detection) on the symmetrized
    // nation trade graph via BFS parity: 2-color nodes by min-hop
    // parity from the canonical root, then count edges joining
    // same-color endpoints — zero conflicts ⟺ bipartite within the
    // reached component. Spark runs the Graphs.bfsHops frontier loop
    // (cost follows the frontier); the oracle states the same min-hop
    // BFS as a recursive CTE with distinct (node, hop) states, bounded
    // by |V|·maxHops rows. The edge projection is the one full-data
    // pass (shared shape with q354). maxHops=3 covers the dense trade
    // graph's diameter; deeper unrolled supersteps only multiply the
    // re-evaluated edge-projection lineage (each superstep re-derives
    // `e` — at 3 levels that is cheap, at 8 it exhausts the driver).
    QueryDef.sql(
      "q373_bipartite_check",
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
        |walk AS (WITH RECURSIVE w(n, hop) AS (
        |    SELECT (SELECT MIN(src) FROM e), 0
        |    UNION
        |    SELECT e.dst, w.hop + 1 FROM e JOIN w ON e.src = w.n
        |    WHERE w.hop < 3)
        |  SELECT n, MIN(hop) AS hop FROM w GROUP BY 1),
        |conf AS (SELECT COUNT(*) AS n_conflict FROM e
        |  JOIN walk ws ON e.src = ws.n JOIN walk wd ON e.dst = wd.n
        |  WHERE ws.hop % 2 = wd.hop % 2)
        |SELECT (SELECT COUNT(DISTINCT src) FROM e) AS n_nodes,
        |  (SELECT COUNT(*) FROM e) AS n_directed_edges,
        |  (SELECT COUNT(*) FROM walk) AS n_reached,
        |  conf.n_conflict,
        |  CAST(CASE WHEN conf.n_conflict = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_bipartite
        |FROM conf""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val e0 = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .select(col("c_nationkey").cast("long").as("a"),
          col("s_nationkey").cast("long").as("b"))
        .distinct()
      val e = e0.select(col("a").as("src"), col("b").as("dst"))
        .union(e0.select(col("b").as("src"), col("a").as("dst"))).distinct()
      val walk = graft.operators.Graphs.bfsHops(e, 3)
      val conf = e
        .join(walk.select(col("n").as("sn"), col("hop").as("sh")), col("src") === col("sn"))
        .join(walk.select(col("n").as("dn"), col("hop").as("dh")), col("dst") === col("dn"))
        .where(col("sh") % 2 === col("dh") % 2)
        .agg(count(lit(1)).as("n_conflict"))
      val nodes = e.agg(countDistinct("src").as("n_nodes"))
      val edges = e.agg(count(lit(1)).as("n_directed_edges"))
      val reached = walk.agg(count(lit(1)).as("n_reached"))
      nodes.crossJoin(edges).crossJoin(reached).crossJoin(conf)
        .select(col("n_nodes"), col("n_directed_edges"), col("n_reached"),
          col("n_conflict"),
          when(col("n_conflict") === 0, 1L).otherwise(0L).as("is_bipartite"))
    },

    // ABC (Pareto) inventory classification of parts by revenue:
    // cumulative revenue share in descending order → class A (first
    // 80% of the mass), B (to 95%), C (tail); output is the 3-row
    // class census. The running sum uses q358's banded-window shape —
    // per-band prefix sums plus a broadcast cross-band carry over the
    // tiny band grain — so no global single-task window at any SF; the
    // oracle states the same cumulative share as one flat window.
    // Class edges compare exact products (5·cum ≤ 4·total), no
    // percentage rounding.
    QueryDef.sql(
      "q374_abc_analysis",
      """WITH pr AS (SELECT l_partkey AS pk,
        |    SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT pk, cents,
        |    SUM(cents) OVER (ORDER BY cents DESC, pk
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(cents) OVER () AS tot
        |  FROM pr),
        |k AS (SELECT pk, cents,
        |    CASE WHEN 5 * cum <= 4 * tot THEN 'A'
        |         WHEN 20 * cum <= 19 * tot THEN 'B' ELSE 'C' END AS cls,
        |    tot FROM c)
        |SELECT cls, COUNT(*) AS n_parts,
        |  CAST(SUM(cents) AS BIGINT) AS class_cents,
        |  CAST(1000000 * SUM(cents) // MIN(tot) AS BIGINT) AS share_ppm
        |FROM k GROUP BY 1 ORDER BY cls""".stripMargin) { (s, dir) =>
      val pr = Tables(s, dir).lineitem
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("cents"))
        // band by revenue magnitude so the running sum parallelizes:
        // within-band prefix + cross-band carry (q358's shape)
        .withColumn("band", expr("-(cents div 100000)"))
      val bandTot = pr.groupBy("band").agg(sum("cents").as("btot"))
      val wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
      val carry = bandTot.select(col("band"),
        coalesce(sum("btot").over(wb), lit(0L)).as("carry"))
      val wp = Window.partitionBy("band")
        .orderBy(col("cents").desc, col("pk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = pr.agg(sum("cents").as("tot"))
      pr.join(broadcast(carry), "band")
        .select(col("pk"), col("cents"),
          (sum("cents").over(wp) + col("carry")).as("cum"))
        .crossJoin(broadcast(tot))
        .select(col("cents"),
          when(lit(5) * col("cum") <= lit(4) * col("tot"), "A")
            .when(lit(20) * col("cum") <= lit(19) * col("tot"), "B")
            .otherwise("C").as("cls"),
          col("tot"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum("cents").as("class_cents"),
          min("tot").as("tot"))
        .select(col("cls"), col("n_parts"), col("class_cents"),
          expr("CAST(1000000 * class_cents div tot AS BIGINT)").as("share_ppm"))
        .orderBy("cls")
    },

    // HITS hubs & authorities (2 unrolled mutual-recursion rounds) on
    // the DIRECTED nation trade graph (supplier→customer nation):
    // auth ← Σ_in hub, hub ← Σ_out auth, L1-normalized to ppm after
    // each half-step with exact integer division. Distinct from
    // PageRank's single random-walk score — HITS separates "good
    // source" from "good sink" roles. All iterations run on the
    // collapsed ≤|N|² edge grain; the fact tables are touched once.
    QueryDef.sql(
      "q375_hits",
      """WITH e AS MATERIALIZED (SELECT DISTINCT s.s_nationkey AS src,
        |    c.c_nationkey AS dst
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey),
        |n AS (SELECT src AS nk FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT nk, CAST(1000000 AS BIGINT) AS h FROM n),
        |a1r AS (SELECT e.dst AS nk, SUM(h0.h) AS a FROM e
        |        JOIN h0 ON e.src = h0.nk GROUP BY 1),
        |a1t AS (SELECT SUM(a) AS t FROM a1r),
        |a1 AS (SELECT nk, CAST(1000000 * a // t AS BIGINT) AS a FROM a1r, a1t),
        |h1r AS (SELECT e.src AS nk, SUM(a1.a) AS h FROM e
        |        JOIN a1 ON e.dst = a1.nk GROUP BY 1),
        |h1t AS (SELECT SUM(h) AS t FROM h1r),
        |h1 AS (SELECT nk, CAST(1000000 * h // t AS BIGINT) AS h FROM h1r, h1t),
        |a2r AS (SELECT e.dst AS nk, SUM(h1.h) AS a FROM e
        |        JOIN h1 ON e.src = h1.nk GROUP BY 1),
        |a2t AS (SELECT SUM(a) AS t FROM a2r),
        |a2 AS (SELECT nk, CAST(1000000 * a // t AS BIGINT) AS a FROM a2r, a2t),
        |h2r AS (SELECT e.src AS nk, SUM(a2.a) AS h FROM e
        |        JOIN a2 ON e.dst = a2.nk GROUP BY 1),
        |h2t AS (SELECT SUM(h) AS t FROM h2r),
        |h2 AS (SELECT nk, CAST(1000000 * h // t AS BIGINT) AS h FROM h2r, h2t)
        |SELECT nn.n_name, h2.h AS hub_ppm, a2.a AS auth_ppm
        |FROM h2 JOIN a2 ON h2.nk = a2.nk
        |JOIN nation nn ON h2.nk = nn.n_nationkey
        |ORDER BY hub_ppm DESC, nn.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val e = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .select(col("s_nationkey").cast("long").as("src"),
          col("c_nationkey").cast("long").as("dst"))
        .distinct()
      val n = e.select(col("src").as("nk")).union(e.select(col("dst"))).distinct()
      def norm(df: DataFrame, c: String): DataFrame = {
        val tt = df.agg(sum(c).as("t"))
        df.crossJoin(broadcast(tt))
          .select(col("nk"), expr(s"CAST(1000000 * $c div t AS BIGINT)").as(c))
      }
      var hub = n.select(col("nk"), lit(1000000L).as("h"))
      var auth: DataFrame = null
      for (_ <- 1 to 2) {
        auth = norm(e.join(broadcast(hub), e("src") === hub("nk"))
          .groupBy(e("dst").as("nk2")).agg(sum("h").as("a"))
          .select(col("nk2").as("nk"), col("a")), "a")
        hub = norm(e.join(broadcast(auth), e("dst") === auth("nk"))
          .groupBy(e("src").as("nk2")).agg(sum("a").as("h"))
          .select(col("nk2").as("nk"), col("h")), "h")
      }
      hub.join(auth.withColumnRenamed("nk", "nk_a"), col("nk") === col("nk_a"))
        .join(broadcast(t.nation), col("nk") === col("n_nationkey"))
        .select(col("n_name"), col("h").as("hub_ppm"), col("a").as("auth_ppm"))
        .orderBy(col("hub_ppm").desc, col("n_name"))
    },

    // Decision-stump split finding — the inner loop of distributed
    // decision-tree training: the best threshold on order total (cents)
    // for predicting o_orderstatus = 'F', scored by weighted Gini
    // impurity in exact ppm. Candidate thresholds collapse to the
    // value-grain histogram first (the classic pre-binning), prefix
    // sums give left/right class counts per candidate in one window
    // pass, and the argmin is a global MIN + equality filter with a
    // threshold tie-break — no per-candidate rescan of the data.
    QueryDef.sql(
      "q376_best_split",
      """WITH h AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) // 100000
        |      AS bucket,
        |    COUNT(*) AS n,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS pos
        |  FROM orders GROUP BY 1),
        |c AS (SELECT bucket, n, pos,
        |    SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS ln,
        |    SUM(pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS lp,
        |    SUM(n) OVER () AS tn, SUM(pos) OVER () AS tp
        |  FROM h),
        |g AS (SELECT bucket, ln, lp, tn - ln AS rn, tp - lp AS rp, tn,
        |    CAST(FLOOR(
        |      2000000.0 * (CAST(lp AS DOUBLE) * (ln - lp) / ln
        |                 + CAST(tp - lp AS DOUBLE) * ((tn - ln) - (tp - lp))
        |                   / (tn - ln)) / tn) AS BIGINT) AS gini_ppm
        |  FROM c WHERE ln > 0 AND tn - ln > 0),
        |m AS (SELECT MIN(gini_ppm) AS best FROM g)
        |SELECT g.bucket AS split_bucket, CAST(g.ln AS BIGINT) AS left_n,
        |  CAST(g.lp AS BIGINT) AS left_pos, CAST(g.rn AS BIGINT) AS right_n,
        |  CAST(g.rp AS BIGINT) AS right_pos, g.gini_ppm
        |FROM g, m WHERE g.gini_ppm = m.best
        |ORDER BY split_bucket LIMIT 1""".stripMargin) { (s, dir) =>
      val h = Tables(s, dir).orders
        .groupBy(expr("CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) div 100000")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("pos"))
      val wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val c = h.select(col("bucket"),
        sum("n").over(wc).as("ln"), sum("pos").over(wc).as("lp"),
        sum("n").over(Window.partitionBy()).as("tn"),
        sum("pos").over(Window.partitionBy()).as("tp"))
      val g = c.where(col("ln") > 0 && col("tn") - col("ln") > 0)
        .select(col("bucket"), col("ln"), col("lp"),
          (col("tn") - col("ln")).as("rn"), (col("tp") - col("lp")).as("rp"),
          col("tn"),
          expr("CAST(FLOOR(2000000.0D * (CAST(lp AS DOUBLE) * (ln - lp) / ln" +
            " + CAST(tp - lp AS DOUBLE) * ((tn - ln) - (tp - lp)) / (tn - ln))" +
            " / tn) AS BIGINT)").as("gini_ppm"))
      val m = g.agg(min("gini_ppm").as("best"))
      g.crossJoin(broadcast(m)).where(col("gini_ppm") === col("best"))
        .select(col("bucket").as("split_bucket"), col("ln").as("left_n"),
          col("lp").as("left_pos"), col("rn").as("right_n"),
          col("rp").as("right_pos"), col("gini_ppm"))
        .orderBy("split_bucket").limit(1)
    },

    // One-way ANOVA across day-of-week groups: does mean event value
    // differ by weekday? F = (SSB/(k−1)) / (SSW/(N−k)) assembled
    // ENTIRELY in exact integer arithmetic from per-group sufficient
    // statistics (n, Σx, Σx²) — one map-side-combined aggregate, no
    // doubles anywhere (a double Σ(sx²/n) would be summation-order-
    // dependent across engines). Per-group sx² and the final F ratio
    // route through DECIMAL(38,0): sx² reaches ~6e19 at sf0.1 and the
    // F numerator ~1e24, both past Long — DECIMAL(38,0) on the Spark
    // side, HUGEINT in the oracle (DuckDB's // on DECIMAL degrades to
    // double floor-division and loses exactness past 2⁵³; HUGEINT //
    // stays exact). The floor in each group's
    // sx² div n displaces SSB/SSW by < k units of the milli² scale —
    // part of the spec, identical in both engines.
    QueryDef.sql(
      "q377_anova_f",
      """WITH e AS (SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
        |    CAST(FLOOR(value * 1000.0) AS BIGINT) AS x
        |  FROM events),
        |g AS (SELECT dow, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
        |      FROM e GROUP BY 1),
        |q AS (SELECT dow, n, sx, sxx,
        |        CAST(CAST(sx AS HUGEINT) * sx // n AS BIGINT) AS sq
        |      FROM g),
        |t AS (SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(sx) AS tsx,
        |        CAST(SUM(sxx) AS HUGEINT) AS tsxx, SUM(sq) AS sq
        |      FROM q),
        |f AS (SELECT k, nn, sq,
        |        CAST(sq - CAST(tsx AS HUGEINT) * tsx // nn AS BIGINT)
        |          AS ssb,
        |        CAST(tsxx - sq AS BIGINT) AS ssw
        |      FROM t)
        |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n, ssb, ssw,
        |  CAST(CAST(1000 AS HUGEINT) * ssb * (nn - k)
        |    // ((k - 1) * ssw) AS BIGINT) AS f_milli
        |FROM f""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(dayofweek(col("ts")).cast("long").as("dow"),
          floor(col("value") * lit(1000.0)).cast("long").as("x"))
      val g = e.groupBy("dow")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("sq",
          expr("CAST(CAST(sx AS DECIMAL(38,0)) * sx div n AS BIGINT)"))
      g.agg(count(lit(1)).as("k"), sum("n").as("nn"), sum("sx").as("tsx"),
          sum(col("sxx").cast("decimal(38,0)")).as("tsxx"), sum("sq").as("sq"))
        .select(col("k"), col("nn"),
          expr("CAST(sq - CAST(tsx AS DECIMAL(38,0)) * tsx div nn AS BIGINT)")
            .as("ssb"),
          expr("CAST(tsxx - sq AS BIGINT)").as("ssw"))
        .select(col("k"), col("nn").as("n"), col("ssb"), col("ssw"),
          expr("CAST(CAST(1000 AS DECIMAL(38,0)) * ssb * (nn - k)" +
            " div ((k - 1) * ssw) AS BIGINT)").as("f_milli"))
    },

    // Bellman-Ford weighted shortest path (3 relaxation rounds) from
    // the canonical root over the nation trade graph, edge weight =
    // the MINIMUM observed line value on the lane (cheapest-route
    // semantics — q373's BFS counts hops, this prices them). Edge
    // weights collapse to the ≤|N|² lane grain in the single full-data
    // pass; each relaxation is a join + MIN-merge on that tiny frame.
    // Unreached nodes are absent (no infinity sentinel to disagree
    // on); weights are non-negative cents so 3 rounds ≡ Dijkstra to
    // depth 3.
    QueryDef.sql(
      "q378_bellman_ford",
      """WITH w AS MATERIALIZED (SELECT s.s_nationkey AS src,
        |    c.c_nationkey AS dst,
        |    MIN(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey GROUP BY 1, 2),
        |root AS (SELECT MIN(src) AS r FROM w),
        |d0 AS (SELECT r AS n, CAST(0 AS BIGINT) AS d FROM root),
        |d1 AS (SELECT n, MIN(d) AS d FROM (
        |    SELECT n, d FROM d0
        |    UNION ALL SELECT w.dst, d0.d + w.w FROM w JOIN d0 ON w.src = d0.n
        |  ) GROUP BY 1),
        |d2 AS (SELECT n, MIN(d) AS d FROM (
        |    SELECT n, d FROM d1
        |    UNION ALL SELECT w.dst, d1.d + w.w FROM w JOIN d1 ON w.src = d1.n
        |  ) GROUP BY 1),
        |d3 AS (SELECT n, MIN(d) AS d FROM (
        |    SELECT n, d FROM d2
        |    UNION ALL SELECT w.dst, d2.d + w.w FROM w JOIN d2 ON w.src = d2.n
        |  ) GROUP BY 1)
        |SELECT nn.n_name, d3.d AS dist_cents
        |FROM d3 JOIN nation nn ON d3.n = nn.n_nationkey
        |ORDER BY dist_cents, nn.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val w = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").cast("long").as("src"),
          col("c_nationkey").cast("long").as("dst"))
        .agg(min(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("w"))
      var d = w.agg(min("src").as("n")).select(col("n"), lit(0L).as("d"))
      for (_ <- 1 to 3) {
        val relaxed = w.join(broadcast(d), w("src") === d("n"))
          .select(w("dst").as("n"), (d("d") + w("w")).as("d"))
        d = d.unionByName(relaxed).groupBy("n").agg(min("d").as("d"))
      }
      d.join(broadcast(t.nation), d("n") === col("n_nationkey"))
        .select(col("n_name"), col("d").as("dist_cents"))
        .orderBy("dist_cents", "n_name")
    },

    // All-pairs shortest hop distance via min-plus matrix squaring:
    // D₁ = adjacency, D₂ = min(D₁, D₁⊗D₁), D₄ = min(D₂, D₂⊗D₂) —
    // two squarings reach every path of length ≤ 4 in O(log diam)
    // rounds instead of |V| relaxations (the repeated-squaring trick
    // that makes all-pairs tractable as joins). All products live on
    // the collapsed node grain; output is per-node eccentricity over
    // the reached pairs plus the graph diameter.
    QueryDef.sql(
      "q379_graph_diameter",
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT c.c_nationkey AS a,
        |    s.s_nationkey AS b
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey),
        |d1 AS MATERIALIZED (SELECT a AS i, b AS j, CAST(1 AS BIGINT) AS d
        |  FROM e0 UNION SELECT b, a, 1 FROM e0),
        |d2 AS MATERIALIZED (SELECT i, j, MIN(d) AS d FROM (
        |    SELECT i, j, d FROM d1
        |    UNION ALL SELECT x.i, y.j, x.d + y.d FROM d1 x JOIN d1 y ON x.j = y.i
        |    WHERE x.i <> y.j
        |  ) GROUP BY 1, 2),
        |d4 AS (SELECT i, j, MIN(d) AS d FROM (
        |    SELECT i, j, d FROM d2
        |    UNION ALL SELECT x.i, y.j, x.d + y.d FROM d2 x JOIN d2 y ON x.j = y.i
        |    WHERE x.i <> y.j
        |  ) GROUP BY 1, 2)
        |SELECT nn.n_name, MAX(d4.d) AS eccentricity,
        |  (SELECT MAX(d) FROM d4) AS diameter
        |FROM d4 JOIN nation nn ON d4.i = nn.n_nationkey
        |GROUP BY 1 ORDER BY eccentricity, nn.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val e0 = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .select(col("c_nationkey").cast("long").as("a"),
          col("s_nationkey").cast("long").as("b"))
        .distinct()
      val d1 = e0.select(col("a").as("i"), col("b").as("j"))
        .union(e0.select(col("b"), col("a"))).distinct()
        .withColumn("d", lit(1L))
      def square(dm: DataFrame): DataFrame = {
        val x = dm.select(col("i").as("xi"), col("j").as("xj"), col("d").as("xd"))
        val y = dm.select(col("i").as("yi"), col("j").as("yj"), col("d").as("yd"))
        val prod = x.join(y, col("xj") === col("yi"))
          .where(col("xi") =!= col("yj"))
          .select(col("xi").as("i"), col("yj").as("j"),
            (col("xd") + col("yd")).as("d"))
        dm.unionByName(prod).groupBy("i", "j").agg(min("d").as("d"))
      }
      val d4 = square(square(d1))
      val diam = d4.agg(max("d").as("diameter"))
      d4.groupBy("i").agg(max("d").as("eccentricity"))
        .crossJoin(broadcast(diam))
        .join(broadcast(t.nation), col("i") === col("n_nationkey"))
        .select(col("n_name"), col("eccentricity"), col("diameter"))
        .orderBy("eccentricity", "n_name")
    },

    // Token burstiness — the Fano factor (variance/mean, milli-units)
    // of inter-occurrence gaps in a global token stream, for the 20
    // most frequent tokens. Global positions come from the per-doc
    // ordinal (posexplode / ordinality-join) offset by doc_id·1000 —
    // NO global sort; gaps are one LAG window per token; the moment
    // sums are exact integers with the variance assembled HUGEINT /
    // DECIMAL(38,0) (q377's pairing). Bursty tokens (Fano ≫ 1000)
    // cluster; uniform fillers sit near Poisson (≈ mean).
    QueryDef.sql(
      "q380_burstiness",
      """WITH ls AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |tok AS (SELECT doc_id * 1000 + i.i AS pos, l[i.i] AS w
        |  FROM ls, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) i
        |  WHERE l[i.i] <> ''),
        |top AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY 1
        |        ORDER BY freq DESC, w LIMIT 20),
        |g AS (SELECT tok.w, tok.pos - lag(tok.pos) OVER
        |        (PARTITION BY tok.w ORDER BY tok.pos) AS gap
        |      FROM tok JOIN top ON tok.w = top.w),
        |m AS (SELECT w, COUNT(*) AS n, SUM(gap) AS sg, SUM(gap * gap) AS sgg
        |      FROM g WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT m.w AS token, CAST(m.n AS BIGINT) AS n_gaps,
        |  CAST(m.sg // m.n AS BIGINT) AS mean_gap,
        |  CAST(1000 * (CAST(m.n AS HUGEINT) * m.sgg - CAST(m.sg AS HUGEINT) * m.sg)
        |    // (CAST(m.n AS HUGEINT) * m.sg) AS BIGINT) AS fano_milli
        |FROM m ORDER BY fano_milli DESC, token""".stripMargin) { (s, dir) =>
      val tok = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
        .where(col("w") =!= "")
        .select((col("doc_id") * 1000 + col("i") + 1).as("pos"), col("w"))
      val top = tok.groupBy("w").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("w")).limit(20)
      val g = tok.join(broadcast(top.select("w")), "w")
        .select(col("w"),
          (col("pos") - lag("pos", 1).over(Window.partitionBy("w").orderBy("pos")))
            .as("gap"))
        .where(col("gap").isNotNull)
      g.groupBy("w")
        .agg(count(lit(1)).as("n"), sum("gap").as("sg"),
          sum(col("gap") * col("gap")).as("sgg"))
        .select(col("w").as("token"), col("n").as("n_gaps"),
          expr("CAST(sg div n AS BIGINT)").as("mean_gap"),
          expr("CAST(1000 * (CAST(n AS DECIMAL(38,0)) * sgg" +
            " - CAST(sg AS DECIMAL(38,0)) * sg)" +
            " div (CAST(n AS DECIMAL(38,0)) * sg) AS BIGINT)")
            .as("fano_milli"))
        .orderBy(col("fano_milli").desc, col("token"))
    },

    // Relational division — "suppliers whose customers' nations cover
    // EVERY region" (the ∀-join textbook operator, absent from the
    // usual join taxonomy): per-supplier distinct reached regions
    // counted against the total region count. The division reduces to
    // dedup → count-distinct → equality with the broadcast divisor
    // cardinality — no correlated NOT EXISTS double-negation at fact
    // scale; the heavy pass is one distinct on (supplier, region).
    QueryDef.sql(
      "q381_relational_division",
      """WITH reach AS (SELECT DISTINCT l.l_suppkey AS sk, n.n_regionkey AS rk
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |nr AS (SELECT COUNT(*) AS total FROM region),
        |cov AS (SELECT sk, COUNT(*) AS nreg FROM reach GROUP BY 1)
        |SELECT s.s_name, CAST(cov.nreg AS BIGINT) AS n_regions
        |FROM cov JOIN supplier s ON cov.sk = s.s_suppkey, nr
        |WHERE cov.nreg = nr.total
        |ORDER BY s.s_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val reach = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("l_suppkey").as("sk"), col("n_regionkey").as("rk"))
        .distinct()
      val nr = t.region.agg(count(lit(1)).as("total"))
      reach.groupBy("sk").agg(count(lit(1)).as("nreg"))
        .crossJoin(broadcast(nr))
        .where(col("nreg") === col("total"))
        .join(t.supplier, col("sk") === col("s_suppkey"))
        .select(col("s_name"), col("nreg").as("n_regions"))
        .orderBy("s_name")
    },

    // Rolling 30-day OLS trend of daily revenue: slope of cents vs
    // day index over a sliding window, assembled from five windowed
    // sufficient sums in ONE window pass (no per-day refit). The
    // full-data pass is the day-grain aggregate; the rolling window
    // then runs on the bounded day frame (≈ years × 365 rows at any
    // SF). The signed slope routes through DOUBLE + FLOOR from exact
    // Long sums (q164's convention). Emitted only where the window is
    // full (n = 30).
    QueryDef.sql(
      "q382_rolling_ols",
      """WITH d AS (SELECT
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS x,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |w AS (SELECT x, y,
        |    COUNT(*) OVER win AS n, SUM(x) OVER win AS sx,
        |    SUM(y) OVER win AS sy, SUM(x * y) OVER win AS sxy,
        |    SUM(x * x) OVER win AS sxx
        |  FROM d WINDOW win AS (ORDER BY x ROWS 29 PRECEDING))
        |SELECT x AS day, CAST(y AS BIGINT) AS day_cents,
        |  CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
        |    AS slope_ppm
        |FROM w WHERE n = 30 ORDER BY day""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).orders
        .groupBy(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long").as("x"))
        .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("y"))
      val win = Window.orderBy("x").rowsBetween(-29, Window.currentRow)
      d.select(col("x"), col("y"),
          count(lit(1)).over(win).as("n"), sum("x").over(win).as("sx"),
          sum("y").over(win).as("sy"), sum(col("x") * col("y")).over(win).as("sxy"),
          sum(col("x") * col("x")).over(win).as("sxx"))
        .where(col("n") === 30)
        .select(col("x").as("day"), col("y").as("day_cents"),
          expr("CAST(FLOOR(1000000.0D * (CAST(n AS DOUBLE) * sxy" +
            " - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx" +
            " - CAST(sx AS DOUBLE) * sx)) AS BIGINT)").as("slope_ppm"))
        .orderBy("day")
    },

    // Price-volume-mix bridge: the 2000-vs-1999 revenue delta per
    // nation decomposed into price effect (Δp·q₁), volume effect
    // (p₀·Δq), and the residual (mix + unit-price floor error) — the
    // standard FP&A waterfall, all in exact cents with unit prices as
    // floored cents-per-unit (div on non-negative operands only;
    // effects are then plain signed Long arithmetic). One pass to the
    // (nation, year) grain; the bridge assembles on ≤|N| rows.
    QueryDef.sql(
      "q383_price_volume_mix",
      """WITH g AS (SELECT n.n_name, year(o.o_orderdate) AS yr,
        |    SUM(CAST(l.l_quantity AS BIGINT)) AS q,
        |    SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS r
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE year(o.o_orderdate) IN (1999, 2000) GROUP BY 1, 2),
        |p AS (SELECT a.n_name,
        |    a.q AS q0, a.r AS r0, a.r // a.q AS p0,
        |    b.q AS q1, b.r AS r1, b.r // b.q AS p1
        |  FROM g a JOIN g b ON a.n_name = b.n_name
        |  WHERE a.yr = 1999 AND b.yr = 2000)
        |SELECT n_name, CAST(r0 AS BIGINT) AS r0_cents,
        |  CAST(r1 AS BIGINT) AS r1_cents,
        |  CAST(r1 - r0 AS BIGINT) AS delta_cents,
        |  CAST((p1 - p0) * q1 AS BIGINT) AS price_effect,
        |  CAST(p0 * (q1 - q0) AS BIGINT) AS volume_effect,
        |  CAST(r1 - r0 - (p1 - p0) * q1 - p0 * (q1 - q0) AS BIGINT) AS residual
        |FROM p ORDER BY n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val g = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .where(year(col("o_orderdate")).isin(1999, 2000))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(sum(col("l_quantity").cast("long")).as("q"),
          sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("r"))
      val a = g.where(col("yr") === 1999)
        .select(col("n_name"), col("q").as("q0"), col("r").as("r0"),
          expr("r div q").as("p0"))
      val b = g.where(col("yr") === 2000)
        .select(col("n_name").as("n2"), col("q").as("q1"), col("r").as("r1"),
          expr("r div q").as("p1"))
      a.join(b, col("n_name") === col("n2"))
        .select(col("n_name"), col("r0").as("r0_cents"), col("r1").as("r1_cents"),
          (col("r1") - col("r0")).as("delta_cents"),
          ((col("p1") - col("p0")) * col("q1")).as("price_effect"),
          (col("p0") * (col("q1") - col("q0"))).as("volume_effect"),
          (col("r1") - col("r0") - (col("p1") - col("p0")) * col("q1")
            - col("p0") * (col("q1") - col("q0"))).as("residual"))
        .orderBy("n_name")
    },

    // Cross-correlation lead-lag: Pearson r between daily click counts
    // and purchase counts at offsets −3..+3 days — "does one series
    // LEAD the other?", the ops question q202's self-ACF can't answer.
    // Day-grain aggregation is the only full-data pass; each lag is an
    // equi-join on day+lag over the tiny day frame against the
    // broadcast lag spine, with exact integer sufficient sums and one
    // DOUBLE-floored correlation per lag (sqrt is IEEE
    // correctly-rounded in both engines).
    QueryDef.sql(
      "q384_ccf_leadlag",
      """WITH d AS (SELECT date_diff('day', TIMESTAMP '2024-01-01', ts) AS day,
        |    COUNT(*) FILTER (WHERE event_type = 'click') AS x,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS y
        |  FROM events GROUP BY 1),
        |lg AS (SELECT unnest(generate_series(-3, 3)) AS lag),
        |pr AS (SELECT lg.lag, a.x, b.y
        |  FROM lg CROSS JOIN d a JOIN d b ON b.day = a.day + lg.lag),
        |m AS (SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |      FROM pr GROUP BY 1)
        |SELECT lag, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
        |    AS BIGINT) AS r_ppm
        |FROM m ORDER BY lag""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).events
        .groupBy(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      val lg = s.range(-3, 4).select(col("id").as("lag"))
      val a = d.select(col("day").as("da"), col("x"))
      val b = d.select(col("day").as("db"), col("y"))
      a.crossJoin(broadcast(lg))
        .join(b, col("db") === col("da") + col("lag"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lag"), col("n"),
          expr("CAST(FLOOR(1000000.0D * (CAST(n AS DOUBLE) * sxy" +
            " - CAST(sx AS DOUBLE) * sy)" +
            " / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)" +
            " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))" +
            " AS BIGINT)").as("r_ppm"))
        .orderBy("lag")
    },

    // Spearman rank correlation between line price and quantity per
    // return flag — Pearson on DOUBLED mid-ranks (q342's convention:
    // tie-safe and integer-exact), with ranks computed at the
    // distinct-value grain (cumulative counts, never a 600k-row
    // row_number tie-gamble) and joined back. Sums of rank products
    // stay in Long; the cross-terms assemble in DOUBLE from exact
    // inputs with one FLOOR.
    QueryDef.sql(
      "q385_spearman",
      """WITH v AS (SELECT l_returnflag AS flag,
        |    CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS xv,
        |    CAST(l_quantity AS BIGINT) AS yv
        |  FROM lineitem),
        |rx AS (SELECT flag, xv,
        |    2 * (SUM(COUNT(*)) OVER (PARTITION BY flag ORDER BY xv
        |          ROWS UNBOUNDED PRECEDING) - COUNT(*)) + COUNT(*) + 1 AS rx2
        |  FROM v GROUP BY flag, xv),
        |ry AS (SELECT flag, yv,
        |    2 * (SUM(COUNT(*)) OVER (PARTITION BY flag ORDER BY yv
        |          ROWS UNBOUNDED PRECEDING) - COUNT(*)) + COUNT(*) + 1 AS ry2
        |  FROM v GROUP BY flag, yv),
        |r AS (SELECT v.flag, rx.rx2 AS x, ry.ry2 AS y FROM v
        |      JOIN rx ON v.flag = rx.flag AND v.xv = rx.xv
        |      JOIN ry ON v.flag = ry.flag AND v.yv = ry.yv),
        |m AS (SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |      FROM r GROUP BY 1)
        |SELECT flag, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(1000000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
        |    AS BIGINT) AS rho_ppm
        |FROM m ORDER BY flag""".stripMargin) { (s, dir) =>
      val v = Tables(s, dir).lineitem
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("xv"),
          col("l_quantity").cast("long").as("yv"))
      def midRanks(valCol: String, out: String): DataFrame = {
        val wc = Window.partitionBy("flag").orderBy(valCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        v.groupBy("flag", valCol).agg(count(lit(1)).as("cnt"))
          .select(col("flag"), col(valCol),
            (lit(2) * (sum("cnt").over(wc) - col("cnt")) + col("cnt") + 1)
              .as(out))
      }
      val rx = midRanks("xv", "rx2")
      val ry = midRanks("yv", "ry2")
      v.join(rx, Seq("flag", "xv")).join(ry, Seq("flag", "yv"))
        .select(col("flag"), col("rx2").as("x"), col("ry2").as("y"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("flag"), col("n"),
          expr("CAST(FLOOR(1000000.0D * (CAST(n AS DOUBLE) * sxy" +
            " - CAST(sx AS DOUBLE) * sy)" +
            " / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)" +
            " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))" +
            " AS BIGINT)").as("rho_ppm"))
        .orderBy("flag")
    }
  )
}

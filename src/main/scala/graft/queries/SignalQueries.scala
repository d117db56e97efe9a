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
    }
  )
}

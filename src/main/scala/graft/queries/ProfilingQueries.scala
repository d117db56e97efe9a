package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.Skew

/** Data-profiling and skew-engineering operators (round 4, q215+).
  *
  * The reference's data_scan / assess modes are column-profiling jobs
  * (SURVEY §2.4 A5/A6: classify NUMBER columns, inventory extremes); these
  * queries generalize that to the Deequ-style one-pass numeric profile a
  * 100 TB lakehouse runs before every migration, plus the salted-join
  * companion to q86's salted aggregation.
  */
object ProfilingQueries {

  def all: Seq[QueryDef] = Seq(

    // One-pass numeric column profile (reference data_scan flavor,
    // database/taskflow/data_scan.go): per column — rows, NDV, min, max,
    // sum — for six lineitem columns rendered to exact BIGINT domains
    // (cents / pct / epoch seconds). The stack() generator unpivots
    // IN-ROW, so the fact table is scanned ONCE regardless of how many
    // columns are profiled (the oracle's UNION ALL scans per column; at
    // 100 TB the single-scan shape is the entire point). One hash
    // aggregate, map-side combined; count_distinct per group is
    // expand-based but bounded by the stacked row count.
    QueryDef.sql(
      "q215_numeric_profile",
      """WITH p AS (
        |  SELECT 'l_orderkey' AS col_name, l_orderkey AS v FROM lineitem
        |  UNION ALL SELECT 'l_quantity', CAST(FLOOR(l_quantity) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_extprice_cents', CAST(FLOOR(l_extendedprice * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_discount_pct', CAST(FLOOR(l_discount * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_tax_pct', CAST(FLOOR(l_tax * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_ship_epoch', CAST(epoch(l_shipdate) AS BIGINT) FROM lineitem)
        |SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
        |  CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v,
        |  CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM p GROUP BY col_name ORDER BY col_name""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .select(expr(
          """stack(6,
            |  'l_orderkey', l_orderkey,
            |  'l_quantity', CAST(FLOOR(l_quantity) AS BIGINT),
            |  'l_extprice_cents', CAST(FLOOR(l_extendedprice * 100) AS BIGINT),
            |  'l_discount_pct', CAST(FLOOR(l_discount * 100) AS BIGINT),
            |  'l_tax_pct', CAST(FLOOR(l_tax * 100) AS BIGINT),
            |  'l_ship_epoch', unix_timestamp(l_shipdate)) AS (col_name, v)""".stripMargin))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("v")).as("ndv"),
          min("v").as("min_v"), max("v").as("max_v"), sum("v").as("sum_v"))
        .orderBy("col_name")
    },

    // OHLC bar resampling — the time-series downsampling every metrics
    // pipeline runs: 6-hour bars per event type with open/close picked by
    // one-pass ordered-argmin aggregates (min_by/max_by on a
    // (ts, event_id) struct — no window, no self-join; DuckDB's ordered
    // FIRST/LAST is the same algorithm). Values floor-scaled to cents so
    // the comparison is integer-exact. One shuffle on (type, bar); at
    // 100 TB the bar grain bounds the output, not the input.
    QueryDef.sql(
      "q216_ohlc_bars",
      """SELECT event_type, CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) * 21600 AS bar_start,
        |  first(CAST(FLOOR(value * 100) AS BIGINT) ORDER BY ts, event_id) AS open_c,
        |  CAST(MAX(FLOOR(value * 100)) AS BIGINT) AS high_c,
        |  CAST(MIN(FLOOR(value * 100)) AS BIGINT) AS low_c,
        |  last(CAST(FLOOR(value * 100) AS BIGINT) ORDER BY ts, event_id) AS close_c,
        |  CAST(COUNT(*) AS BIGINT) AS volume,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS notional_c
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bar_start""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .select(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 21600) * 21600).cast("long").as("bar_start"),
          col("ts"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "bar_start")
        .agg(expr("min_by(cents, struct(ts, event_id))").as("open_c"),
          max("cents").as("high_c"), min("cents").as("low_c"),
          expr("max_by(cents, struct(ts, event_id))").as("close_c"),
          count(lit(1)).as("volume"), sum("cents").as("notional_c"))
        .orderBy("event_type", "bar_start")
    },

    // Salted equi-join — the join-side twin of q86's salted aggregation:
    // the build side is replicated `salts` ways, probe rows pick a
    // deterministic salt, and the join runs on (key, salt) so a hot key's
    // probe stream spreads over `salts` reducers instead of funneling one
    // (the manual fallback when AQE's skew split can't help, e.g.
    // broadcast-ineligible build sides). Verified by exact parity with
    // the plain join: revenue cents per order priority.
    QueryDef.sql(
      "q217_salted_join",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val fact = t.lineitem.select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val dim = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(fact, dim, "l_orderkey", "o_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"), sum("cents").as("revenue_c"))
        .orderBy("o_orderpriority")
    })
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Core relational operator coverage: aggregation, multi-way joins,
  * top-n, window functions, grouping sets, event-stream batch analytics.
  *
  * Conventions shared with every oracle (see SURVEY §2.8 canonicalization):
  *  - double aggregation goes through an exact DECIMAL cast and back to
  *    double, so Spark and DuckDB produce bit-identical sums regardless of
  *    row order (floating addition is not associative; decimal addition is);
  *  - timestamps are emitted as formatted strings (UTC) to avoid
  *    timezone/precision drift between engines;
  *  - every result is deterministically ordered.
  */
object CoreQueries {

  /** Exact, cross-engine-deterministic sum of a double expression.
    *
    * The fixtures' doubles are full-precision random values, so any
    * decimal rounding can tie-break differently between engines. Instead:
    * `floor(x * 10^k)` is a pure IEEE-754 computation that yields the same
    * Long in Spark and DuckDB, integer summation is exact, and the final
    * division by 10^k is a single identical double op. SQL twin:
    * `SUM(CAST(FLOOR(x * 1eK) AS BIGINT)) / 1eK`.
    */
  private def dsum(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale)
    sum(floor(c * lit(f))) / lit(f)
  }

  private val tsFmt = "yyyy-MM-dd HH:mm:ss"

  val all: Seq[QueryDef] = Seq(
    // A1/A6-shape: partial+final aggregation, no shuffle beyond the groupBy
    // (map-side combine native). TPC-H Q1 analogue.
    QueryDef.sql(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        | SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) / 10000.0 AS sum_qty,
        | SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) / 10000.0 AS sum_base_price,
        | SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS sum_disc_price,
        | SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)*(1+l_tax)) * 10000.0) AS BIGINT)) / 10000.0 AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Star join: fact (lineitem) joined through orders/customer to the
    // nation/region dims. nation+region are broadcast explicitly — at 100 TB
    // they are still tiny; customer⋈orders is a shuffle join on the key and
    // AQE may convert it at runtime.
    QueryDef.sql(
      "q2_join_agg",
      """SELECT n_name,
        | SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey  = o_orderkey
        |JOIN customer ON o_custkey   = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Pre-aggregate revenue per customer BEFORE the customer join: the
      // second shuffle then carries |customers| partial rows instead of
      // every lineitem row — at 100 TB that is the difference between
      // re-shuffling the fact table and re-shuffling a dimension-sized
      // partial. Exact: the per-row floor happens before any summation,
      // so the regrouped integer sums are associative.
      val perCust = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
          sum(floor((col("l_extendedprice") * (lit(1) - col("l_discount"))) * lit(10000.0)))
            .as("__rev4"),
          count(lit(1)).as("__n"))
      perCust
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          (sum(col("__rev4")) / lit(10000.0)).as("revenue"),
          sum(col("__n")).as("n_items"))
        .orderBy("n_name")
    },

    // T4/T1: top-n via orderBy+limit → Spark TakeOrderedAndProject (no full
    // sort, no single-partition shuffle of the whole table).
    QueryDef.sql(
      "q3_topn",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // W1: ranking window (reference's only window op is ROW_NUMBER for
    // in-bucket sampling, database/oracle/data_compare.go:283-330).
    QueryDef.sql(
      "q4_window",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    },

    // A5-shape: GROUPING SETS (the reference's data_scan profiling pivot,
    // database/processor/data_scan_row.go:106-132).
    QueryDef.sql(
      "q5_grouping_sets",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        | SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) / 10000.0 AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_gs")
      // note: 10000.0D — Spark SQL otherwise parses the literal as DECIMAL
      // and the division result type would not match the oracle's DOUBLE
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
          | SUM(CAST(FLOOR(l_quantity * 10000.0D) AS BIGINT)) / 10000.0D AS sum_qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // Streaming batch-equivalent: tumbling 1h window aggregation over the
    // events table (Structured Streaming runs the same plan incrementally).
    QueryDef.sql(
      "q6_events_tumbling",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, COUNT(*) AS n_events,
        | SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .groupBy(
          date_format(date_trunc("hour", col("ts")), tsFmt).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // Sessionization: 30-min-gap sessions per user via lag + running sum —
    // the batch shape of flatMapGroupsWithState session state (SURVEY §2.9).
    QueryDef.sql(
      "q7_events_sessionize",
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts, us,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |g AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), tsFmt).as("session_start"))
        .orderBy("user_id", "session_id")
    },

    // J3/ST8 batch shape: keyed latest-wins upsert materialization — the
    // same MERGE the CDC sink applies per micro-batch (consumer.go:692-792:
    // UPDATE ⇒ DELETE+INSERT keyed on unique cols; DELETE ⇒ absent).
    QueryDef.sql(
      "q8_cdc_apply",
      """SELECT user_id, event_type AS last_type, value AS last_value,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM (
        | SELECT user_id, event_type, value, ts,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) t
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, dir).events
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          row_number().over(w).as("rn"))
        .where(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"),
          date_format(col("ts"), tsFmt).as("last_ts"))
        .orderBy("user_id")
    },

    // ST6 batch shape: duplicate/obsolete-event drop — first occurrence per
    // (user, type) key (dropDuplicates is the streaming analogue).
    QueryDef.sql(
      "q9_events_dedup",
      """SELECT user_id, event_type, MIN(event_id) AS first_event
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event"))
        .orderBy("user_id", "event_type")
    },
  )
}

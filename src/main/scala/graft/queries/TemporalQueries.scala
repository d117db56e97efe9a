package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.TemporalJoins

/** Temporal join operators (as-of, range) — operators Spark lacks
  * natively, composed per the build preference order (TemporalJoins
  * scaladoc has the scale analysis). DuckDB's native ASOF JOIN is the
  * oracle. All time math runs on microsecond longs so both engines see
  * identical values (events.ts is nanosecond parquet; both truncate).
  */
object TemporalQueries {

  val all: Seq[QueryDef] = Seq(

    // As-of join: for each click, the user's latest purchase at or before
    // it (union-and-carry: one shuffle, no n²).
    QueryDef.sql(
      "q53_asof_join",
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS purchase_id
        |           FROM events WHERE event_type = 'purchase' GROUP BY user_id, epoch_us(ts)),
        |c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, p.purchase_id AS last_purchase_id, p.us AS purchase_us
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "us").agg(max("event_id").as("purchase_id"))
        .withColumn("purchase_us", col("us"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "us")
      TemporalJoins.asOfJoin(clicks, purchases, "user_id", "us",
          Seq("purchase_id", "purchase_us"))
        .select(col("event_id"), col("user_id"),
          col("purchase_id").as("last_purchase_id"), col("purchase_us"))
        .orderBy("event_id")
    },

    // Range join: per event, how many of the same user's events landed in
    // the preceding 5 minutes — bucketized to an equi-join (O(n·k), never
    // the nested-loop Spark would plan for a raw non-equi join).
    QueryDef.sql(
      "q54_range_count",
      """SELECT e.event_id, COUNT(f.event_id) AS n_recent
        |FROM events e LEFT JOIN events f
        |  ON e.user_id = f.user_id AND epoch_us(f.ts) > epoch_us(e.ts) - 300000000
        |     AND epoch_us(f.ts) < epoch_us(e.ts)
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      TemporalJoins.recentCount(ev, "user_id", "us", "event_id", 300000000L)
        .orderBy("event_id")
    },

    // Sweep-line interval overlap: each order is active for 1-14 days
    // (key-derived duration); the +1/-1 delta sweep aggregates to DAY
    // GRAIN before the global cumulative sum, so the ordered window runs
    // over ~2.4k rows regardless of row count — the classic way max
    // concurrency stays computable at 100 TB (never sort the raw
    // intervals globally). A date spine fills order-free days so the
    // running level is exact even when a day has no deltas (sf0.001 has
    // such gaps). One scan: start/end deltas come from one explode.
    QueryDef.sql(
      "q316_interval_overlap",
      """WITH iv AS (SELECT CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) + CAST((o_orderkey % 14) + 1 AS INTEGER) AS e
        |  FROM orders),
        |deltas AS (SELECT day, SUM(d) AS net FROM (
        |    SELECT s AS day, 1 AS d FROM iv
        |    UNION ALL SELECT e AS day, -1 AS d FROM iv) u GROUP BY 1),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM deltas),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |conc AS (SELECT spine.day AS day, SUM(COALESCE(net, 0)) OVER (ORDER BY spine.day) AS c
        |  FROM spine LEFT JOIN deltas ON spine.day = deltas.day)
        |SELECT strftime(day, '%Y-%m') AS month, CAST(MAX(c) AS BIGINT) AS max_active,
        |  CAST(arg_max(c, day) AS BIGINT) AS eom_active
        |FROM conc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val iv = Tables(s, dir).orders.select(to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")),
          ((col("o_orderkey") % 14) + 1).cast("int")).as("e"))
      val deltas = iv
        .select(explode(array(
          struct(col("s").as("day"), lit(1L).as("d")),
          struct(col("e").as("day"), lit(-1L).as("d")))).as("x"))
        .select(col("x.day").as("day"), col("x.d").as("d"))
        .groupBy("day").agg(sum("d").as("net"))
      // lo = min start (every end > its start), hi = max end — from the
      // day-grain deltas, no second scan of orders
      val spine = deltas.agg(min("day").as("lo"), max("day").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val conc = spine.join(deltas, Seq("day"), "left_outer")
        .select(col("day"), coalesce(col("net"), lit(0L)).as("net"))
        .withColumn("c", sum(col("net")).over(Window.orderBy("day")))
      conc.groupBy(date_format(col("day"), "yyyy-MM").as("month"))
        .agg(max(col("c")).as("max_active"),
          max_by(col("c"), col("day")).as("eom_active"))
        .orderBy("month")
    },

    // Max drawdown of the daily-revenue series per nation: running peak
    // via an ordered window (partitioned by nation — parallel across the
    // dimension, day-grain bounded within), drawdown in exact integer
    // ppm (DECIMAL numerator — peak·10⁶ wraps Long past ~9e12 cents/day
    // at large SFs), then the worst value and the FIRST day it occurred
    // (equality join back + MIN(day) — deterministic under ties, unlike
    // arg_max on a non-unique key).
    QueryDef.sql(
      "q318_drawdown",
      """WITH daily AS (SELECT n_name, CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |p AS (SELECT n_name, day, cents,
        |    MAX(cents) OVER (PARTITION BY n_name ORDER BY day) AS peak FROM daily),
        |d AS (SELECT n_name, day,
        |    CAST(CAST(peak - cents AS HUGEINT) * 1000000 // peak AS BIGINT) AS dd_ppm
        |  FROM p),
        |m AS (SELECT n_name, MAX(dd_ppm) AS max_dd_ppm FROM d GROUP BY 1)
        |SELECT m.n_name, CAST(m.max_dd_ppm AS BIGINT) AS max_dd_ppm,
        |  MIN(d.day) AS worst_day
        |FROM m JOIN d ON d.n_name = m.n_name AND d.dd_ppm = m.max_dd_ppm
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val daily = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val p = daily.withColumn("peak",
        max(col("cents")).over(Window.partitionBy("n_name").orderBy("day")))
      val d = p.select(col("n_name"), col("day"),
        expr("CAST(CAST(peak - cents AS DECIMAL(38,0)) * 1000000 div peak AS BIGINT)")
          .as("dd_ppm"))
      val m = d.groupBy("n_name").agg(max("dd_ppm").as("max_dd_ppm"))
      m.join(d, Seq("n_name")).where(col("dd_ppm") === col("max_dd_ppm"))
        .groupBy("n_name", "max_dd_ppm").agg(min("day").as("worst_day"))
        .orderBy("n_name")
    },

    // Classical seasonal decomposition, step 1+2: centered 7-day moving
    // average (exact integer sum over a ROWS frame on the zero-filled
    // date spine — the spine guarantees "7 rows" means "7 calendar
    // days") as the trend, then the per-DOW mean of the detrended ratio
    // cents/(trend/7) as the seasonal index. q312's ratio-of-means DOW
    // index ignores trend; this one removes it first, the textbook way.
    // All ratios are non-negative so `div`/`//` agree; the only global
    // window runs at day grain (~2.4k rows at any SF — same bounded-
    // cardinality argument as q316).
    QueryDef.sql(
      "q321_seasonal_decompose",
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |f AS (SELECT spine.day AS day, COALESCE(cents, 0) AS cents
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |w AS (SELECT day, cents,
        |    SUM(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsum,
        |    COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tn
        |  FROM f),
        |r AS (SELECT dayofweek(day) AS dow,
        |    CAST(CAST(cents AS HUGEINT) * 7000000 // tsum AS BIGINT) AS ratio_ppm
        |  FROM w WHERE tn = 7 AND tsum > 0)
        |SELECT CAST(dow AS BIGINT) AS dow, COUNT(*) AS n_days,
        |  CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS seasonal_index_ppm
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val f = spine.join(daily, Seq("day"), "left_outer")
        .select(col("day"), coalesce(col("cents"), lit(0L)).as("cents"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val w = f.select(col("day"), col("cents"),
        sum("cents").over(w7).as("tsum"), count(lit(1)).over(w7).as("tn"))
      val r = w.where(col("tn") === 7 && col("tsum") > 0)
        .select((dayofweek(col("day")) - 1).cast("long").as("dow"),
          expr("CAST(CAST(cents AS DECIMAL(38,0)) * 7000000 div tsum AS BIGINT)")
            .as("ratio_ppm"))
      r.groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
          expr("CAST(SUM(ratio_ppm) div COUNT(*) AS BIGINT)").as("seasonal_index_ppm"))
        .orderBy("dow")
    },

    // Bitemporal point-in-time query — the Spark answer to the
    // reference's AS OF SCN/TIMESTAMP snapshot scans (SURVEY S1):
    // every order carries a valid-time interval [vf, vt) and a
    // transaction-time interval [tf, tt); every 4th order gets a later
    // correction (+$500, recorded 15 days after first posting) that
    // closes the original's tx interval. The query answers "as known at
    // T, valid at V" for a 2×2 grid of (T, V) — the grid is a broadcast
    // literal, so the fact table is scanned ONCE and filtered per grid
    // cell; exactly one version per order survives any T past its
    // correction, which is the bitemporal invariant the oracle checks.
    QueryDef.sql(
      "q322_bitemporal",
      """WITH base AS (SELECT o_orderkey AS ck, o_orderpriority AS pr,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(o_orderdate AS DATE) AS vf,
        |    CAST(o_orderdate AS DATE) + CAST((o_orderkey % 90) + 30 AS INTEGER) AS vt,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 10 AS INTEGER) AS tf
        |  FROM orders),
        |versions AS (
        |  SELECT ck, pr, cents, vf, vt, tf,
        |    CASE WHEN ck % 4 = 0 THEN tf + 15 ELSE DATE '9999-12-31' END AS tt
        |  FROM base
        |  UNION ALL
        |  SELECT ck, pr, cents + 50000, vf, vt, tf + 15, DATE '9999-12-31'
        |  FROM base WHERE ck % 4 = 0),
        |tg AS (SELECT 'T1996' AS t_label, DATE '1996-07-01' AS t
        |       UNION ALL SELECT 'T1998', DATE '1998-07-01'),
        |vg AS (SELECT 'V1996' AS v_label, DATE '1996-07-01' AS v
        |       UNION ALL SELECT 'V1998', DATE '1998-07-01')
        |SELECT t_label, v_label, pr AS priority, COUNT(*) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS cents
        |FROM versions, tg, vg
        |WHERE tf <= t AND t < tt AND vf <= v AND v < vt
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      import s.implicits._
      val base = Tables(s, dir).orders.select(col("o_orderkey").as("ck"),
        col("o_orderpriority").as("pr"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        to_date(col("o_orderdate")).as("vf"),
        date_add(to_date(col("o_orderdate")),
          ((col("o_orderkey") % 90) + 30).cast("int")).as("vt"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % 10).cast("int")).as("tf"))
      val forever = to_date(lit("9999-12-31"))
      val orig = base.withColumn("tt",
        when(col("ck") % 4 === 0, date_add(col("tf"), 15)).otherwise(forever))
      val corr = base.where(col("ck") % 4 === 0)
        .select(col("ck"), col("pr"), (col("cents") + 50000).as("cents"),
          col("vf"), col("vt"), date_add(col("tf"), 15).as("tf"), forever.as("tt"))
      val versions = orig.unionByName(corr)
      val tg = Seq(("T1996", "1996-07-01"), ("T1998", "1998-07-01"))
        .toDF("t_label", "ts").select(col("t_label"), to_date(col("ts")).as("t"))
      val vg = Seq(("V1996", "1996-07-01"), ("V1998", "1998-07-01"))
        .toDF("v_label", "vs").select(col("v_label"), to_date(col("vs")).as("v"))
      versions.crossJoin(broadcast(tg)).crossJoin(broadcast(vg))
        .where(col("tf") <= col("t") && col("t") < col("tt")
          && col("vf") <= col("v") && col("v") < col("vt"))
        .groupBy(col("t_label"), col("v_label"), col("pr").as("priority"))
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents"))
        .orderBy("t_label", "v_label", "priority")
    },
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Analytic-SQL depth beyond the reference's surface: time-interval
  * window frames, moment statistics (corr/covar/stddev) from exact
  * integer sums, and one-pass arg-max aggregation.
  *
  * Float policy (see graft-engine conventions): moment statistics are
  * usually float-summed and therefore engine-divergent; here every sum
  * runs over floor-scaled integers in DECIMAL(38,0)/HUGEINT (exact), and
  * only the FINAL scalar formula — written with the identical expression
  * tree on both engines — drops to IEEE double, where *, /, sqrt are
  * correctly rounded and thus bit-reproducible.
  */
object AnalyticsQueries {

  val all: Seq[QueryDef] = Seq(

    // Time-interval window frame: per-user trailing-10-minute event count
    // and exact scaled-value sum (RANGE BETWEEN 600s PRECEDING AND
    // CURRENT ROW over epoch micros). Partitioned by user — one shuffle,
    // per-user sorts, never a global window; peers at equal ts are in
    // both engines' frames by RANGE semantics, so ties cannot diverge.
    QueryDef.sql(
      "q97_interval_frame",
      """SELECT event_id, user_id, n_10m, CAST(sum_10m AS BIGINT) AS sum_10m FROM (
        |  SELECT event_id, user_id,
        |    COUNT(*) OVER w AS n_10m, SUM(v) OVER w AS sum_10m
        |  FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
        |          CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us
        |               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)) t
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          floor(col("value") * 100).cast("long").as("v"))
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-600000000L, Window.currentRow)
      ev.select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_10m"), sum(col("v")).over(w).as("sum_10m"))
        .orderBy("event_id")
    },

    // Moment statistics per group from exact sums: Pearson correlation,
    // population covariance and stddevs of (quantity, extendedprice) in
    // cents. ONE map-side-combined aggregate per group computes the five
    // power sums exactly (DECIMAL(38,0) ≡ HUGEINT — no float
    // accumulation, no ordering sensitivity); the closed-form results are
    // evaluated from those sums with the same double expression both
    // engines round identically.
    QueryDef.sql(
      "q98_moment_stats",
      """WITH sc AS (SELECT l_returnflag AS flag,
        |    CAST(FLOOR(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |      FROM sc GROUP BY flag)
        |SELECT flag, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(1000000.0 * CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))) AS BIGINT)
        |    AS corr_scaled,
        |  CAST(FLOOR(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
        |    AS covar_pop,
        |  CAST(FLOOR(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1000.0) AS BIGINT)
        |    AS std_x_scaled,
        |  CAST(FLOOR(sqrt(CAST(n*syy - sy*sy AS DOUBLE)) / CAST(n AS DOUBLE) * 1000.0) AS BIGINT)
        |    AS std_y_scaled
        |FROM m ORDER BY flag""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val sc = Tables(s, dir).lineitem.select(
        col("l_returnflag").as("flag"),
        floor(col("l_quantity") * 100).cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
      sc.groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        .select(col("flag"), col("n"),
          floor(lit(1000000.0) * (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .cast("long").as("corr_scaled"),
          floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            col("n").cast("double") / col("n").cast("double")).cast("long").as("covar_pop"),
          floor(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) /
            col("n").cast("double") * lit(1000.0)).cast("long").as("std_x_scaled"),
          floor(sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")) /
            col("n").cast("double") * lit(1000.0)).cast("long").as("std_y_scaled"))
        .orderBy("flag")
    },

    // One-pass arg-max per group (no window, no self-join): per nation,
    // the supplier with the highest account balance. The ordering value
    // is a single BIGINT composite (cents ⊕ suppkey) so max_by/arg_max is
    // total — unique key ⇒ deterministic on any engine.
    QueryDef.sql(
      "q99_argmax",
      """WITH k AS (SELECT s_nationkey,
        |    s_name, s_suppkey, s_acctbal,
        |    CAST(FLOOR(s_acctbal * 100) AS BIGINT) * 100000 + s_suppkey AS ord
        |  FROM supplier)
        |SELECT s_nationkey,
        |  arg_max(s_name, ord) AS best_name,
        |  arg_max(s_suppkey, ord) AS best_suppkey,
        |  CAST(max(CAST(FLOOR(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_bal_cents,
        |  COUNT(*) AS n_suppliers
        |FROM k GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
      val k = Tables(s, dir).supplier.select(
        col("s_nationkey"), col("s_name"), col("s_suppkey"),
        (floor(col("s_acctbal") * 100).cast("long") * 100000 + col("s_suppkey")).as("ord"),
        floor(col("s_acctbal") * 100).cast("long").as("bal_cents"))
      k.groupBy("s_nationkey")
        .agg(max_by(col("s_name"), col("ord")).as("best_name"),
          max_by(col("s_suppkey"), col("ord")).as("best_suppkey"),
          max(col("bal_cents")).as("max_bal_cents"),
          count(lit(1)).as("n_suppliers"))
        .orderBy("s_nationkey")
    },

    // Partitioned-layout roundtrip: orders written as a Hive-style
    // partitioned parquet table (the 100 TB fact organization), read back
    // with a partition predicate — the filter prunes whole directories
    // (PartitionFilters; PartitionPruningSpec asserts the plan) so the
    // scan does zero IO for the other priorities. Oracle = the same
    // aggregate over the unpartitioned source.
    QueryDef.sql(
      "q100_partitioned_scan",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_part_scan"
      graft.operators.Migrate.writePartitioned(
        Tables(s, dir).orders, tmp, Seq("o_orderpriority"))
      s.read.parquet(tmp)
        .where(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .orderBy("o_orderstatus")
    },

    // Recursive CTE (Spark 4 WITH RECURSIVE, executed natively by
    // Catalyst's recursion operator): walk a synthetic supplier hierarchy
    // (parent(k) = k div 7) from the root, counting nodes and summing
    // balances per depth. The same recursive SQL runs on both engines —
    // the iterative-join loop the engine unrolls is the declarative twin
    // of Dedup.connectedComponents' hand-rolled label propagation.
    QueryDef.sql(
      "q101_recursive_cte",
      """WITH RECURSIVE h(k, depth) AS (
        |  SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey = 0
        |  UNION ALL
        |  SELECT s.s_suppkey, h.depth + 1
        |  FROM supplier s JOIN h ON s.s_suppkey // 7 = h.k AND s.s_suppkey <> h.k)
        |SELECT depth, COUNT(*) AS n, MIN(k) AS min_key, MAX(k) AS max_key,
        |  CAST(SUM(bal) AS BIGINT) AS bal_cents
        |FROM h JOIN (SELECT s_suppkey, CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS bal
        |             FROM supplier) b ON b.s_suppkey = h.k
        |GROUP BY depth ORDER BY depth""".stripMargin) { (s, dir) =>
      Tables(s, dir).supplier.createOrReplaceTempView("supplier")
      s.sql(
        """WITH RECURSIVE h(k, depth) AS (
          |  SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey = 0
          |  UNION ALL
          |  SELECT s.s_suppkey, h.depth + 1
          |  FROM supplier s JOIN h ON s.s_suppkey div 7 = h.k AND s.s_suppkey <> h.k)
          |SELECT depth, COUNT(*) AS n, MIN(k) AS min_key, MAX(k) AS max_key,
          |  SUM(bal) AS bal_cents
          |FROM h JOIN (SELECT s_suppkey, CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS bal
          |             FROM supplier) b ON b.s_suppkey = h.k
          |GROUP BY depth ORDER BY depth""".stripMargin)
    },

    // Ranking-function family over partitioned windows: RANK / DENSE_RANK
    // / PERCENT_RANK / CUME_DIST per market segment on exact cents.
    // percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are single
    // double divisions of exact integers — correctly rounded identically
    // on any engine, so even the float columns hash-match. One shuffle on
    // the partition key; ties are real (cents collide) and every ranking
    // mode's tie semantics are exercised.
    QueryDef.sql(
      "q104_rank_family",
      """SELECT c_mktsegment, c_custkey, bal_cents,
        |  RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
        |  CAST(FLOOR(1000000.0 * PERCENT_RANK() OVER w) AS BIGINT) AS prank_scaled,
        |  CAST(FLOOR(1000000.0 * CUME_DIST() OVER w) AS BIGINT) AS cume_scaled
        |FROM (SELECT c_mktsegment, c_custkey,
        |        CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer) t
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal_cents)
        |ORDER BY c_mktsegment, bal_cents, c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy("bal_cents")
      Tables(s, dir).customer
        .select(col("c_mktsegment"), col("c_custkey"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        .select(col("c_mktsegment"), col("c_custkey"), col("bal_cents"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          floor(lit(1000000.0) * percent_rank().over(w)).cast("long").as("prank_scaled"),
          floor(lit(1000000.0) * cume_dist().over(w)).cast("long").as("cume_scaled"))
        .orderBy("c_mktsegment", "bal_cents", "c_custkey")
    },

    // Per-key map aggregation rendered portably: each user's event-type
    // histogram as a sorted "type:count|..." string. Two-level aggregate
    // (both map-side combined) + an in-row render — the grouped-map shape
    // without engine-specific map types in the output contract.
    QueryDef.sql(
      "q105_typed_map",
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
        |           FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(event_type || ':' || n::VARCHAR, '|' ORDER BY event_type) AS type_counts,
        |  CAST(SUM(n) AS BIGINT) AS n_events
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(array_join(sort_array(collect_list(
            concat(col("event_type"), lit(":"), col("n")))), "|").as("type_counts"),
          sum(col("n")).as("n_events"))
        .orderBy("user_id")
    },

    // Native top-k-per-group: the custom LogicalPlan + Strategy +
    // two-phase SparkPlan (bounded per-group heaps on BOTH sides of the
    // shuffle — the exchange carries ≤ k rows per group per map
    // partition, never the full table; TopKPerGroupSpec asserts the plan).
    // Top-3 customers by balance per market segment; ordering key is
    // cents ⊕ custkey, unique so every engine agrees.
    QueryDef.sql(
      "q106_native_topk",
      """SELECT c_mktsegment, c_custkey, bal_cents FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey AS ord
        |  FROM customer) t
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY ord DESC) <= 3
        |ORDER BY c_mktsegment, bal_cents DESC, c_custkey""".stripMargin) { (s, dir) =>
      val base = Tables(s, dir).customer.select(
        col("c_mktsegment"), col("c_custkey"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_cents"),
        (floor(col("c_acctbal") * 100).cast("long") * 10000000 + col("c_custkey")).as("ord"))
      graft.plans.GraftFunctions
        .topKPerGroup(base, Seq("c_mktsegment"), "ord", 3)
        .select("c_mktsegment", "c_custkey", "bal_cents")
        .orderBy(col("c_mktsegment"), col("bal_cents").desc, col("c_custkey"))
    },

    // Semi-structured VARIANT ingestion (Spark 4 VariantType): the JSON
    // props column is parsed once into the binary variant encoding and
    // fields are extracted with typed paths — the open-schema event
    // payload shape; vs get_json_object (q71) the parse is not repeated
    // per extraction. Oracle uses DuckDB's JSON extraction on the same
    // column.
    QueryDef.sql(
      "q107_variant",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
        |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // Fuzzy entity matching: blocked edit-distance join over part names
    // with seeded single-char typos (every 7th part re-appears with
    // position 4 replaced). Blocking on (3-char prefix, exact length)
    // bounds the candidate pairs — the Levenshtein verify runs only
    // inside blocks, the entity-resolution analogue of LSH-then-verify;
    // an unblocked n² distance join would never survive 100 TB.
    QueryDef.sql(
      "q108_fuzzy_match",
      """WITH base AS (SELECT p_partkey AS k, p_name AS n FROM part
        |  UNION ALL
        |  SELECT p_partkey + 100000, substr(p_name, 1, 3) || 'x' || substr(p_name, 5)
        |  FROM part WHERE p_partkey % 7 = 0 AND len(p_name) >= 5),
        |blocked AS (SELECT k, n, substr(n, 1, 3) AS pfx, len(n) AS ln FROM base)
        |SELECT b.k AS clone_k, b.n AS clone_name,
        |  COUNT(*) AS n_matches, MIN(a.k) AS first_match
        |FROM blocked a JOIN blocked b
        |  ON a.pfx = b.pfx AND a.ln = b.ln AND a.k < b.k
        |WHERE b.k >= 100000 AND levenshtein(a.n, b.n) = 1
        |GROUP BY b.k, b.n ORDER BY clone_k""".stripMargin) { (s, dir) =>
      val part = Tables(s, dir).part
      val base = part.select(col("p_partkey").as("k"), col("p_name").as("n"))
        .unionAll(part
          .where(col("p_partkey") % 7 === 0 && length(col("p_name")) >= 5)
          .select((col("p_partkey") + 100000).as("k"),
            concat(substring(col("p_name"), 1, 3), lit("x"),
              expr("substring(p_name, 5)")).as("n")))
      val blocked = base.select(col("k"), col("n"),
        substring(col("n"), 1, 3).as("pfx"), length(col("n")).as("ln"))
      blocked.as("a").join(blocked.as("b"),
          col("a.pfx") === col("b.pfx") && col("a.ln") === col("b.ln") &&
            col("a.k") < col("b.k"))
        .where(col("b.k") >= 100000 && levenshtein(col("a.n"), col("b.n")) === 1)
        .groupBy(col("b.k").as("clone_k"), col("b.n").as("clone_name"))
        .agg(count(lit(1)).as("n_matches"), min(col("a.k")).as("first_match"))
        .orderBy("clone_k")
    },

    // DSv2 chunked source read: the reference's chunk IS the
    // InputPartition (graft.sources.ChunkedRangeSource), and the k-range
    // predicate prunes whole chunks at PLANNING time — this filtered
    // aggregate plans exactly 3 of 25 chunks (ChunkedRangeSourceSpec
    // asserts partition counts). Oracle rebuilds the same deterministic
    // rows from DuckDB's range().
    QueryDef.sql(
      "q109_chunk_source",
      """SELECT CAST(k // 4096 AS BIGINT) AS chunk, COUNT(*) AS n,
        |  CAST(SUM((k * 2654435761) % 997) AS BIGINT) AS vsum
        |FROM (SELECT range AS k FROM range(20480, 32768))
        |GROUP BY chunk ORDER BY chunk""".stripMargin) { (s, dir) =>
      s.read.format("graft.sources.ChunkedRangeSource")
        .option("start", "0").option("end", "102400").option("chunkSize", "4096")
        .load()
        .where(col("k") >= 20480 && col("k") < 32768)
        .groupBy(expr("k div 4096").as("chunk"))
        .agg(count(lit(1)).as("n"), sum("v").as("vsum"))
        .orderBy("chunk")
    },

    // Bounce rate by session entry type: q7's 30-minute-gap
    // sessionization, then each session's FIRST event (rank-1 by
    // (ts, event_id) — deterministic) labels it, and single-event
    // sessions count as bounces. Windows stay partitioned by user —
    // fully parallel; the rollup key is ≤ |event types|.
    QueryDef.sql(
      "q332_bounce_rate",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |g AS (SELECT user_id, event_id, event_type, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |sess AS (SELECT user_id, session_id,
        |    MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
        |    COUNT(*) AS n_events
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
        |          ORDER BY ts, event_id) AS rn FROM g) t
        |  GROUP BY 1, 2)
        |SELECT entry_type, COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
        |    AS BIGINT) AS bounce_ppm
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val g = Tables(s, dir).events
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bySess = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
      val sess = g.withColumn("rn", row_number().over(bySess))
        .groupBy("user_id", "session_id")
        .agg(max(when(col("rn") === 1, col("event_type"))).as("entry_type"),
          count(lit(1)).as("n_events"))
      sess.groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
        .withColumn("bounce_ppm", expr("n_bounces * 1000000L div n_sessions"))
        .orderBy("entry_type")
    },

    // Theil-Sen robust trend of daily revenue: the median (and IQR) of
    // all pairwise day-to-day slopes. The pair generation runs at DAY
    // GRAIN — ~2.4k days ⇒ ~2.9M pairs at ANY scale factor, so the
    // O(n²) estimator stays bounded no matter how many rows feed the
    // daily aggregate (the only way Theil-Sen survives 100 TB). Slopes
    // are signed: the ratio routes through CAST AS DOUBLE + FLOOR —
    // both engines floor the SAME IEEE-rounded quotient, the
    // convention q164/q277/q311 use for signed division parity.
    QueryDef.sql(
      "q333_theil_sen",
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |d AS (SELECT day - DATE '1970-01-01' AS dn, cents FROM daily),
        |pr AS (SELECT a.dn AS d1, b.dn AS d2,
        |    CAST(FLOOR(CAST((b.cents - a.cents) AS DOUBLE) * 1000000.0
        |      / (b.dn - a.dn)) AS BIGINT) AS slope
        |  FROM d a JOIN d b ON b.dn > a.dn),
        |r AS (SELECT slope,
        |    row_number() OVER (ORDER BY slope, d1, d2) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM pr)
        |SELECT (SELECT COUNT(*) FROM d) AS n_days, CAST(MAX(n) AS BIGINT) AS n_pairs,
        |  CAST(MAX(CASE WHEN rk = (n + 3) // 4 THEN slope END) AS BIGINT) AS slope_p25,
        |  CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN slope END) AS BIGINT) AS slope_med,
        |  CAST(MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN slope END) AS BIGINT) AS slope_p75
        |FROM r""".stripMargin) { (s, dir) =>
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val d = daily.select(datediff(col("day"), lit("1970-01-01")).cast("long").as("dn"),
        col("cents"))
      val a = d.select(col("dn").as("d1"), col("cents").as("c1"))
      val b = d.select(col("dn").as("d2"), col("cents").as("c2"))
      val pr = a.join(b, col("d2") > col("d1"))
        .select(col("d1"), col("d2"),
          floor((col("c2") - col("c1")).cast("double") * 1000000.0
            / (col("d2") - col("d1"))).cast("long").as("slope"))
      val r = pr.select(col("slope"),
        row_number().over(Window.orderBy("slope", "d1", "d2")).as("rk"),
        count(lit(1)).over(Window.partitionBy()).as("n"))
      val nd = d.agg(count(lit(1)).as("n_days"))
      val q = r.agg(max("n").as("n_pairs"),
        max(when(col("rk") === expr("(n + 3) div 4"), col("slope"))).as("slope_p25"),
        max(when(col("rk") === expr("(n + 1) div 2"), col("slope"))).as("slope_med"),
        max(when(col("rk") === expr("(3 * n + 3) div 4"), col("slope"))).as("slope_p75"))
      nd.crossJoin(q)
        .select(col("n_days"), col("n_pairs"), col("slope_p25"), col("slope_med"),
          col("slope_p75"))
    },

    // Sequence-gap audit (the CDC QA check behind the reference's
    // per-partition commit-ts monotonicity guarantee): a synthetic
    // dense sequence per producer (producer = event_id % 8, seq =
    // event_id div 8) with every 97th message dropped; per producer,
    // LAG over the received stream finds each gap and sizes it. One
    // window per producer partition — embarrassingly parallel, state
    // is one row per received message.
    QueryDef.sql(
      "q334_sequence_gaps",
      """WITH recv AS (SELECT event_id % 8 AS producer, event_id // 8 AS seq
        |  FROM events WHERE event_id % 97 <> 0),
        |l AS (SELECT producer, seq,
        |    lag(seq) OVER (PARTITION BY producer ORDER BY seq) AS prev
        |  FROM recv)
        |SELECT CAST(producer AS BIGINT) AS producer, COUNT(*) AS n_received,
        |  CAST(SUM(CASE WHEN prev IS NOT NULL AND seq - prev > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_gaps,
        |  CAST(SUM(CASE WHEN prev IS NOT NULL THEN seq - prev - 1 ELSE 0 END)
        |    AS BIGINT) AS n_missing,
        |  CAST(MIN(seq) AS BIGINT) AS min_seq, CAST(MAX(seq) AS BIGINT) AS max_seq
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val recv = Tables(s, dir).events
        .where(col("event_id") % 97 =!= 0)
        .select((col("event_id") % 8).as("producer"),
          expr("event_id div 8").as("seq"))
      val l = recv.withColumn("prev",
        lag(col("seq"), 1).over(Window.partitionBy("producer").orderBy("seq")))
      l.groupBy(col("producer").cast("long").as("producer"))
        .agg(count(lit(1)).as("n_received"),
          sum(when(col("prev").isNotNull && col("seq") - col("prev") > 1, 1L)
            .otherwise(0L)).as("n_gaps"),
          sum(when(col("prev").isNotNull, col("seq") - col("prev") - 1)
            .otherwise(0L)).as("n_missing"),
          min("seq").as("min_seq"), max("seq").as("max_seq"))
        .orderBy("producer")
    },

    // Experiment power advisor: per event type, the sample size needed
    // to detect a 5% lift of the mean at α=0.05 / 80% power —
    // n = 2(z_α/2+z_β)²σ²/δ² with (1.96+0.84)² = 7.84 carried as the
    // integer 784/100. Variance comes from the exact integer moment
    // sums (n·Σx²−(Σx)², DECIMAL(38,0) — q98's convention), δ² from the
    // integer mean, and the final ceil division is (a+b−1) div b. Zero
    // floats end to end, so the advisor's row is bit-stable.
    QueryDef.sql(
      "q335_power_advisor",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS x FROM events),
        |m AS (SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM e GROUP BY 1),
        |v AS (SELECT event_type, n,
        |    sx // n AS mean_s,
        |    (n * sxx - sx * sx) // (n * n) AS var_s2
        |  FROM m),
        |d AS (SELECT event_type, n, mean_s, var_s2,
        |    (mean_s * 5) // 100 AS delta_s FROM v)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(mean_s AS BIGINT) AS mean_scaled,
        |  CAST(var_s2 AS BIGINT) AS var_scaled2,
        |  CAST(delta_s AS BIGINT) AS delta_scaled,
        |  CAST((1568 * var_s2 + 100 * delta_s * delta_s - 1)
        |    // (100 * delta_s * delta_s) AS BIGINT) AS n_required
        |FROM d ORDER BY event_type""".stripMargin) { (s, dir) =>
      val dec = "DECIMAL(38,0)"
      Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * 1000000.0).cast("long").as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"),
          sum((col("x").cast(dec)) * col("x")).as("sxx"))
        .select(col("event_type"), col("n"),
          expr("CAST(sx div n AS DECIMAL(38,0))").as("mean_s"),
          expr("CAST((n * sxx - sx * sx) div (CAST(n AS DECIMAL(38,0)) * n)" +
            " AS DECIMAL(38,0))").as("var_s2"))
        .withColumn("delta_s", expr("CAST((mean_s * 5) div 100 AS DECIMAL(38,0))"))
        .select(col("event_type"), col("n"),
          col("mean_s").cast("long").as("mean_scaled"),
          col("var_s2").cast("long").as("var_scaled2"),
          col("delta_s").cast("long").as("delta_scaled"),
          expr("CAST((1568 * var_s2 + 100 * delta_s * delta_s - 1)" +
            " div (100 * delta_s * delta_s) AS BIGINT)").as("n_required"))
        .orderBy("event_type")
    },

    // AR(1) autocorrelation fit per event type over the daily count
    // series: φ = Σc_t·c_{t−1} / Σc_{t−1}² on mean-centered counts,
    // kept integer by scaling the centering by n (c_t = n·x_t − Σx).
    // The lag join is a LAG window at day grain per type (30 days in
    // the fixture — bounded at any SF); the signed final ratio routes
    // through DOUBLE+FLOOR (parity convention). Complements q202's ACF
    // (which probes fixed lags of one global series).
    QueryDef.sql(
      "q336_ar1_fit",
      """WITH dd AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx FROM dd GROUP BY 1),
        |c AS (SELECT dd.event_type, day, CAST(n * x - sx AS BIGINT) AS c,
        |    lag(CAST(n * x - sx AS BIGINT)) OVER (PARTITION BY dd.event_type ORDER BY day)
        |      AS cp
        |  FROM dd JOIN m ON dd.event_type = m.event_type),
        |s AS (SELECT event_type, COUNT(*) AS n_lags,
        |    SUM(CAST(c AS HUGEINT) * cp) AS num, SUM(CAST(cp AS HUGEINT) * cp) AS den
        |  FROM c WHERE cp IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(n_lags AS BIGINT) AS n_lags,
        |  CAST(FLOOR(CAST(num AS DOUBLE) * 1000000.0 / CAST(den AS DOUBLE)) AS BIGINT)
        |    AS phi_ppm
        |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
      val dd = Tables(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val m = dd.groupBy("event_type").agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val c = dd.join(m, Seq("event_type"))
        .select(col("event_type"), col("day"),
          (col("n") * col("x") - col("sx")).cast("long").as("c"))
        .withColumn("cp",
          lag(col("c"), 1).over(Window.partitionBy("event_type").orderBy("day")))
      c.where(col("cp").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_lags"),
          sum(col("c").cast("decimal(38,0)") * col("cp")).as("num"),
          sum(col("cp").cast("decimal(38,0)") * col("cp")).as("den"))
        .select(col("event_type"), col("n_lags"),
          floor(col("num").cast("double") * 1000000.0 / col("den").cast("double"))
            .cast("long").as("phi_ppm"))
        .orderBy("event_type")
    },

    // Kaplan-Meier life table for time-to-first-PURCHASE: the clock
    // starts at each user's first event; users who never purchase are
    // right-censored at the end of observation (the fixture keeps every
    // user active to the final days, so last-event-based censoring
    // would censor everyone — conversion is the event of interest
    // instead). Per event day t, the at-risk count is a reverse
    // cumulative sum at day grain, deaths/censorings are exact counts,
    // and the discrete hazard d/n_risk lands in integer ppm; the
    // survival curve is the consumer's running product of (1 − hazard),
    // keeping the table float-free.
    QueryDef.sql(
      "q337_kaplan_meier",
      """WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS fu FROM events GROUP BY 1),
        |p AS (SELECT user_id, MIN(epoch_us(ts)) AS pu FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1),
        |g AS (SELECT MAX(epoch_us(ts)) AS gmax FROM events),
        |d AS (SELECT u.user_id,
        |    CASE WHEN p.pu IS NULL THEN (gmax - fu) // 86400000000
        |         ELSE (p.pu - fu) // 86400000000 END AS t,
        |    CASE WHEN p.pu IS NULL THEN 1 ELSE 0 END AS censored
        |  FROM u LEFT JOIN p ON u.user_id = p.user_id, g),
        |ev AS (SELECT t, COUNT(*) AS n_at_t,
        |    SUM(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS deaths,
        |    SUM(censored) AS n_censored
        |  FROM d GROUP BY 1),
        |r AS (SELECT t, deaths, n_censored,
        |    SUM(n_at_t) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_risk
        |  FROM ev)
        |SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(deaths AS BIGINT) AS deaths, CAST(n_censored AS BIGINT) AS n_censored,
        |  CAST(deaths * 1000000 // n_risk AS BIGINT) AS hazard_ppm
        |FROM r WHERE deaths > 0 ORDER BY t_days""".stripMargin) { (s, dir) =>
      val ev0 = Tables(s, dir).events
      val u = ev0.groupBy("user_id").agg(min(unix_micros(col("ts"))).as("fu"))
      val p = ev0.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("pu"))
      val g = ev0.agg(max(unix_micros(col("ts"))).as("gmax"))
      val d = u.join(p, Seq("user_id"), "left_outer").crossJoin(broadcast(g))
        .select(
          when(col("pu").isNull, expr("(gmax - fu) div 86400000000L"))
            .otherwise(expr("(pu - fu) div 86400000000L")).as("t"),
          when(col("pu").isNull, 1L).otherwise(0L).as("censored"))
      val ev = d.groupBy("t")
        .agg(count(lit(1)).as("n_at_t"),
          sum(when(col("censored") === 0, 1L).otherwise(0L)).as("deaths"),
          sum("censored").as("n_censored"))
      val r = ev.withColumn("n_risk",
        sum("n_at_t").over(Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      r.where(col("deaths") > 0)
        .select(col("t").as("t_days"), col("n_risk"), col("deaths"), col("n_censored"),
          expr("CAST(deaths * 1000000L div n_risk AS BIGINT)").as("hazard_ppm"))
        .orderBy("t_days")
    },

    // Lorenz curve at decile grain: users ranked by spend into ntile(10)
    // (the standard split rule is identical cross-engine, q173), then
    // cumulative population vs cumulative spend shares in exact ppm —
    // the curve behind q169's Gini scalar. The decile rollup is 10 rows;
    // the only full-data pass is the rank window (range-partitioned).
    QueryDef.sql(
      "q338_lorenz_curve",
      """WITH u AS (SELECT o_custkey,
        |    SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT o_custkey, cents,
        |    ntile(10) OVER (ORDER BY cents, o_custkey) AS decile FROM u),
        |d AS (SELECT decile, COUNT(*) AS n_users, SUM(cents) AS s FROM t GROUP BY 1),
        |c AS (SELECT decile, n_users, s,
        |    SUM(n_users) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cu,
        |    SUM(s) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cs,
        |    SUM(n_users) OVER () AS tu, SUM(s) OVER () AS ts
        |  FROM d)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(cu * 1000000 // tu AS BIGINT) AS cum_users_ppm,
        |  CAST(CAST(cs AS HUGEINT) * 1000000 // ts AS BIGINT) AS cum_spend_ppm
        |FROM c ORDER BY decile""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).orders.groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val t = u.withColumn("decile",
        ntile(10).over(Window.orderBy("cents", "o_custkey")).cast("long"))
      val d = t.groupBy("decile").agg(count(lit(1)).as("n_users"), sum("cents").as("s"))
      val wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy()
      d.select(col("decile"), col("n_users"),
          sum("n_users").over(wc).as("cu"), sum("s").over(wc).as("cs"),
          sum("n_users").over(wt).as("tu"), sum("s").over(wt).as("ts"))
        .select(col("decile"), col("n_users"),
          expr("CAST(cu * 1000000L div tu AS BIGINT)").as("cum_users_ppm"),
          expr("CAST(CAST(cs AS DECIMAL(38,0)) * 1000000 div ts AS BIGINT)")
            .as("cum_spend_ppm"))
        .orderBy("decile")
    },

    // Duplicate-payment audit: same customer, same amount, a second
    // order within 7 days — the classic AP double-pay screen. TPC-H
    // amounts are near-unique, so the fixture PLANTS the dupes (every
    // 211th order re-posted 3 days later under a new key — q313's
    // planted-truth pattern): the audit must recover exactly the
    // plants. The candidate join is EQUI on (custkey, cents) with the
    // date window as a post-filter, so pair cost follows
    // per-(customer, amount) multiplicity — never |orders|² — and the
    // rollup prices the exposure per order priority.
    QueryDef.sql(
      "q339_dup_payments",
      """WITH o0 AS (SELECT o_orderkey AS ok, o_custkey AS ck,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(o_orderdate AS DATE) AS d, o_orderpriority AS pr
        |  FROM orders),
        |o AS (SELECT * FROM o0
        |  UNION ALL
        |  SELECT ok + 100000000, ck, cents, d + 3, pr FROM o0 WHERE ok % 211 = 0),
        |p AS (SELECT b.pr AS pr, b.cents AS cents, b.ck AS ck
        |  FROM o a JOIN o b ON a.ck = b.ck AND a.cents = b.cents AND a.ok < b.ok
        |  WHERE b.d >= a.d AND b.d - a.d <= 7)
        |SELECT pr AS priority, COUNT(*) AS n_pairs,
        |  CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS cents_at_risk
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val o0 = Tables(s, dir).orders.select(col("o_orderkey").as("ok"),
        col("o_custkey").as("ck"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        to_date(col("o_orderdate")).as("d"), col("o_orderpriority").as("pr"))
      val o = o0.unionAll(o0.where(col("ok") % 211 === 0)
        .select((col("ok") + 100000000L).as("ok"), col("ck"), col("cents"),
          date_add(col("d"), 3).as("d"), col("pr")))
      val a = o.select(col("ok").as("ok1"), col("ck"), col("cents"), col("d").as("d1"))
      val b = o.select(col("ok").as("ok2"), col("ck"), col("cents"), col("d").as("d2"),
        col("pr"))
      a.join(b, Seq("ck", "cents"))
        .where(col("ok1") < col("ok2")
          && col("d2") >= col("d1") && datediff(col("d2"), col("d1")) <= 7)
        .groupBy(col("pr").as("priority"))
        .agg(count(lit(1)).as("n_pairs"), countDistinct("ck").as("n_customers"),
          sum("cents").as("cents_at_risk"))
        .orderBy("priority")
    },

    // Structural-break detection, binary segmentation step 1: the split
    // day of the daily-revenue series minimizing SSE_left + SSE_right,
    // from exact integer prefix sums (n, Σx, Σx² at day grain — one
    // window pass over ~2.4k bounded rows). The cost itself is a
    // DOUBLE, but both engines build it from the SAME exact integers
    // with the SAME expression, so ordering by (cost, day) is
    // bit-parity; the argmin is a row_number pick, not a driver loop.
    QueryDef.sql(
      "q340_changepoint",
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |pfx AS (SELECT day, x,
        |    row_number() OVER (ORDER BY day) AS k,
        |    SUM(CAST(x AS HUGEINT)) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |      AS sxx,
        |    COUNT(*) OVER () AS n,
        |    SUM(CAST(x AS HUGEINT)) OVER () AS tsx,
        |    SUM(CAST(x AS HUGEINT) * x) OVER () AS tsxx
        |  FROM daily),
        |cost AS (SELECT day, k, n, sx, tsx,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / k)
        |    + (CAST(tsxx - sxx AS DOUBLE)
        |       - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE) / (n - k)) AS c,
        |    CAST(tsxx AS DOUBLE)
        |      - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE) / n AS c0
        |  FROM pfx WHERE k < n),
        |best AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (ORDER BY c, day) AS r FROM cost) t WHERE r = 1)
        |SELECT day AS split_day, CAST(k AS BIGINT) AS n_left,
        |  CAST(n - k AS BIGINT) AS n_right,
        |  CAST(sx // k AS BIGINT) AS mean_left_scaled,
        |  CAST((tsx - sx) // (n - k) AS BIGINT) AS mean_right_scaled,
        |  CAST(FLOOR((c0 - c) * 1000000.0 / c0) AS BIGINT) AS sse_drop_ppm
        |FROM best""".stripMargin) { (s, dir) =>
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("x"))
      val wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.partitionBy()
      val dec = "decimal(38,0)"
      val pfx = daily.select(col("day"), col("x"),
        row_number().over(Window.orderBy("day")).as("k"),
        sum(col("x").cast(dec)).over(wp).as("sx"),
        sum((col("x").cast(dec)) * col("x")).over(wp).as("sxx"),
        count(lit(1)).over(wa).as("n"),
        sum(col("x").cast(dec)).over(wa).as("tsx"),
        sum((col("x").cast(dec)) * col("x")).over(wa).as("tsxx"))
      val cost = pfx.where(col("k") < col("n"))
        .select(col("day"), col("k"), col("n"), col("sx"), col("tsx"),
          expr("(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / k)" +
            " + (CAST(tsxx - sxx AS DOUBLE)" +
            " - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE) / (n - k))").as("c"),
          expr("CAST(tsxx AS DOUBLE)" +
            " - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE) / n").as("c0"))
      cost.withColumn("r", row_number().over(Window.orderBy("c", "day")))
        .where(col("r") === 1)
        .select(col("day").as("split_day"), col("k").as("n_left"),
          (col("n") - col("k")).as("n_right"),
          expr("CAST(sx div k AS BIGINT)").as("mean_left_scaled"),
          expr("CAST((tsx - sx) div (n - k) AS BIGINT)").as("mean_right_scaled"),
          expr("CAST(FLOOR((c0 - c) * 1000000.0D / c0) AS BIGINT)").as("sse_drop_ppm"))
    },

    // Shewhart control chart with a FULLY INTEGER σ test: a day is
    // out-of-control at kσ iff (n·x − Σx)² > k²·(n·Σx² − (Σx)²) — both
    // sides exact integers (|x−μ| > kσ with every division cleared), so
    // no sqrt and no float ever enters a verdict (q310's 9n binomial
    // bound, generalized to empirical variance). The per-type board
    // reports 2σ and 3σ violation counts plus the peak z²·10⁶ — always
    // populated even when the series never breaches (the fixture's
    // daily counts breach 3σ only at sf0.1).
    QueryDef.sql(
      "q341_control_chart",
      """WITH dd AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx FROM dd GROUP BY 1),
        |f AS (SELECT dd.event_type, day, x, n,
        |    (CAST(n AS HUGEINT) * x - sx) AS dev_n,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS nvar
        |  FROM dd JOIN m ON dd.event_type = m.event_type)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
        |  CAST(SUM(CASE WHEN dev_n * dev_n > 4 * nvar THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_viol_2s,
        |  CAST(SUM(CASE WHEN dev_n * dev_n > 9 * nvar THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_viol_3s,
        |  CAST(MAX(dev_n * dev_n * 1000000 // nvar) AS BIGINT) AS max_z2_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val dd = Tables(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val m = dd.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      dd.join(broadcast(m), Seq("event_type"))
        .select(col("event_type"), col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * x - sx").as("dev_n"),
          expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
            .as("nvar"))
        .groupBy("event_type")
        .agg(max("n").as("n_days"),
          sum(when(col("dev_n") * col("dev_n") > lit(4) * col("nvar"), 1L)
            .otherwise(0L)).as("n_viol_2s"),
          sum(when(col("dev_n") * col("dev_n") > lit(9) * col("nvar"), 1L)
            .otherwise(0L)).as("n_viol_3s"),
          max(expr("CAST(dev_n * dev_n * 1000000 div nvar AS BIGINT)")).as("max_z2_ppm"))
        .orderBy("event_type")
    },

    // Mann-Whitney rank-sum test between click and purchase value
    // distributions, tie-exact: mid-ranks are carried DOUBLED
    // (2p + c − 1 for a tie group of size c starting at 1-based rank p)
    // so every rank stays an integer; U follows as
    // R1×2 − n1(n1+1), and the probabilistic index P(X>Y)+½P(X=Y)
    // (= ROC AUC) lands in exact ppm. Rank groups aggregate at DISTINCT
    // VALUE grain — the window runs over |distinct values|, not rows.
    QueryDef.sql(
      "q342_mann_whitney",
      """WITH e AS (SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS grp,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (SELECT v, COUNT(*) AS c,
        |    SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS ca
        |  FROM e GROUP BY 1),
        |r AS (SELECT v, c, ca,
        |    COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS before
        |  FROM g),
        |s AS (SELECT SUM(ca * (2 * (before + 1) + c - 1)) AS r1x2,
        |    SUM(ca) AS n1, SUM(c - ca) AS n2 FROM r)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
        |  CAST(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
        |  CAST(CAST(r1x2 - n1 * (n1 + 1) AS HUGEINT) * 1000000 // (2 * n1 * n2)
        |    AS BIGINT) AS auc_ppm
        |FROM s""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .where(col("event_type").isin("click", "purchase"))
        .select(when(col("event_type") === "click", 0L).otherwise(1L).as("grp"),
          floor(col("value") * 1000000.0).cast("long").as("v"))
      val g = e.groupBy("v").agg(count(lit(1)).as("c"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("ca"))
      val r = g.withColumn("before",
        coalesce(sum("c").over(Window.orderBy("v").rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      r.agg(sum(col("ca") * (lit(2) * (col("before") + 1) + col("c") - 1)).as("r1x2"),
          sum("ca").as("n1"), sum(col("c") - col("ca")).as("n2"))
        .select(col("n1"), col("n2"),
          expr("r1x2 - n1 * (n1 + 1)").as("u1_x2"),
          expr("2 * n1 * n2 - (r1x2 - n1 * (n1 + 1))").as("u2_x2"),
          expr("CAST(CAST(r1x2 - n1 * (n1 + 1) AS DECIMAL(38,0)) * 1000000" +
            " div (2 * n1 * n2) AS BIGINT)").as("auc_ppm"))
    },

    // Durbin-Watson statistic on q336's AR(1) residuals, float-free:
    // with φ carried as the integer ppm from the fit, the residual
    // e_t = 10⁶·c_t − φ_ppm·c_{t−1} is exact, and
    // DW = Σ(e_t−e_{t−1})² / Σe_t² lands in DECIMAL ppm (≈2×10⁶ when
    // the fit captured the autocorrelation, →0 when positive
    // correlation remains). Two LAG windows per type partition, both
    // at day grain.
    QueryDef.sql(
      "q343_durbin_watson",
      """WITH dd AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx FROM dd GROUP BY 1),
        |c AS (SELECT dd.event_type, day, CAST(n * x - sx AS BIGINT) AS c,
        |    lag(CAST(n * x - sx AS BIGINT)) OVER (PARTITION BY dd.event_type ORDER BY day)
        |      AS cp
        |  FROM dd JOIN m ON dd.event_type = m.event_type),
        |phi AS (SELECT event_type,
        |    CAST(FLOOR(CAST(SUM(CAST(c AS HUGEINT) * cp) AS DOUBLE) * 1000000.0
        |      / CAST(SUM(CAST(cp AS HUGEINT) * cp) AS DOUBLE)) AS BIGINT) AS phi_ppm
        |  FROM c WHERE cp IS NOT NULL GROUP BY 1),
        |e AS (SELECT c.event_type, day,
        |    1000000 * CAST(c AS HUGEINT) - phi_ppm * cp AS e,
        |    lag(1000000 * CAST(c AS HUGEINT) - phi_ppm * cp)
        |      OVER (PARTITION BY c.event_type ORDER BY day) AS ep
        |  FROM c JOIN phi ON c.event_type = phi.event_type
        |  WHERE cp IS NOT NULL),
        |s AS (SELECT event_type, COUNT(*) AS n_resid,
        |    SUM((e - ep) * (e - ep)) AS num, SUM(e * e) AS den
        |  FROM e WHERE ep IS NOT NULL GROUP BY 1)
        |SELECT s.event_type, CAST(n_resid AS BIGINT) AS n_resid,
        |  CAST(phi_ppm AS BIGINT) AS phi_ppm,
        |  CAST(num * 1000000 // den AS BIGINT) AS dw_ppm
        |FROM s JOIN phi ON s.event_type = phi.event_type
        |ORDER BY s.event_type""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val dd = Tables(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val m = dd.groupBy("event_type").agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val c = dd.join(m, Seq("event_type"))
        .select(col("event_type"), col("day"),
          (col("n") * col("x") - col("sx")).cast("long").as("c"))
        .withColumn("cp",
          lag(col("c"), 1).over(Window.partitionBy("event_type").orderBy("day")))
        .where(col("cp").isNotNull)
      val phi = c.groupBy("event_type")
        .agg(floor(sum(col("c").cast(dec) * col("cp")).cast("double") * 1000000.0
          / sum(col("cp").cast(dec) * col("cp")).cast("double"))
          .cast("long").as("phi_ppm"))
      val e = c.join(broadcast(phi), Seq("event_type"))
        .select(col("event_type"), col("day"),
          (lit(1000000).cast(dec) * col("c") - col("phi_ppm") * col("cp")).as("e"))
        .withColumn("ep",
          lag(col("e"), 1).over(Window.partitionBy("event_type").orderBy("day")))
        .where(col("ep").isNotNull)
      e.groupBy("event_type")
        .agg(count(lit(1)).as("n_resid"),
          sum((col("e") - col("ep")) * (col("e") - col("ep"))).as("num"),
          sum(col("e") * col("e")).as("den"))
        .join(broadcast(phi), Seq("event_type"))
        .select(col("event_type"), col("n_resid"), col("phi_ppm"),
          expr("CAST(num * 1000000 div den AS BIGINT)").as("dw_ppm"))
        .orderBy("event_type")
    },

    // Overdispersion diagnostic for daily counts: the dispersion index
    // var/mean clears to the single integer ratio
    // (n·Σx² − (Σx)²) / (n·Σx) — Poisson arrivals sit at 10⁶ ppm, and
    // the banded verdict (under / poisson-ish / overdispersed at
    // ⅔× / 1.5×) tells a capacity planner whether peak provisioning
    // can trust the mean. Zero floats; one groupBy at (type, day)
    // grain, one at type grain.
    QueryDef.sql(
      "q344_dispersion",
      """WITH dd AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx FROM dd GROUP BY 1),
        |d AS (SELECT event_type, n, sx,
        |    (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) * 1000000
        |      // (CAST(n AS HUGEINT) * sx) AS disp_ppm
        |  FROM m)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  CAST(sx * 100 // n AS BIGINT) AS mean_x100,
        |  CAST(disp_ppm AS BIGINT) AS dispersion_ppm,
        |  CASE WHEN disp_ppm > 1500000 THEN 'overdispersed'
        |       WHEN disp_ppm < 666667 THEN 'underdispersed'
        |       ELSE 'poisson-ish' END AS verdict
        |FROM d ORDER BY event_type""".stripMargin) { (s, dir) =>
      val dd = Tables(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val m = dd.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      m.select(col("event_type"), col("n"), col("sx"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)" +
            " * 1000000 div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)").as("disp_ppm"))
        .select(col("event_type"), col("n").as("n_days"),
          expr("CAST(sx * 100 div n AS BIGINT)").as("mean_x100"),
          col("disp_ppm").as("dispersion_ppm"),
          when(col("disp_ppm") > 1500000, "overdispersed")
            .when(col("disp_ppm") < 666667, "underdispersed")
            .otherwise("poisson-ish").as("verdict"))
        .orderBy("event_type")
    },

    // MATCH_RECOGNIZE substitute: Spark has no row-pattern clause, so
    // per-user event sequences compile to an ORDERED initials string
    // (deterministic: Spark array_sorts (us, event_id, initial)
    // structs, DuckDB string_aggs with the same ORDER BY) and the
    // pattern v[^vp]*c[^vp]*p — character classes only, semantics
    // identical in Java regex and RE2 — counts non-overlapping
    // view→click→purchase journeys per user. Per-user state is one
    // bounded string; the scan is embarrassingly parallel.
    QueryDef.sql(
      "q345_match_recognize",
      """WITH seq AS (SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        |  FROM events GROUP BY user_id),
        |m AS (SELECT user_id,
        |    len(regexp_extract_all(s, 'v[^vp]*c[^vp]*p')) AS n_matches FROM seq)
        |SELECT COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  CAST(SUM(n_matches) AS BIGINT) AS total_matches,
        |  CAST(SUM(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
        |    AS BIGINT) AS matched_ppm
        |FROM m""".stripMargin) { (s, dir) =>
      val seq = Tables(s, dir).events
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c"))
        .groupBy("user_id")
        .agg(concat_ws("", expr(
          "transform(array_sort(collect_list(struct(us, event_id, c))), x -> x.c)"))
          .as("sq"))
      val m = seq.select(col("user_id"),
        expr("size(regexp_extract_all(sq, 'v[^vp]*c[^vp]*p', 0))").cast("long")
          .as("n_matches"))
      m.agg(count(lit(1)).as("n_users"),
          sum(when(col("n_matches") > 0, 1L).otherwise(0L)).as("n_matched"),
          sum("n_matches").as("total_matches"))
        .withColumn("matched_ppm", expr("n_matched * 1000000L div n_users"))
    },

    // Revenue-concentration HHI per nation: each customer's spend share
    // of their nation floors to ppm, and the Herfindahl index is
    // Σ share² / 10⁶ (10⁶ = monopoly). The floor-then-square convention
    // is applied identically in both engines, keeping the index exact;
    // shares join against broadcast nation totals, so the whole audit
    // is one aggregation tree over the customer grain.
    QueryDef.sql(
      "q346_hhi",
      """WITH cs AS (SELECT c_nationkey, o_custkey,
        |    SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |nt AS (SELECT c_nationkey, SUM(cents) AS ncents, COUNT(*) AS n_customers
        |  FROM cs GROUP BY 1),
        |sh AS (SELECT cs.c_nationkey,
        |    CAST(CAST(cs.cents AS HUGEINT) * 1000000 // ncents AS BIGINT) AS share_ppm
        |  FROM cs JOIN nt ON cs.c_nationkey = nt.c_nationkey)
        |SELECT n_name, CAST(n_customers AS BIGINT) AS n_customers,
        |  CAST(ncents AS BIGINT) AS total_cents,
        |  CAST(SUM(CAST(share_ppm AS HUGEINT) * share_ppm) // 1000000 AS BIGINT)
        |    AS hhi_ppm
        |FROM sh JOIN nt ON sh.c_nationkey = nt.c_nationkey
        |JOIN nation ON sh.c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val cs = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val nt = cs.groupBy("c_nationkey")
        .agg(sum("cents").as("ncents"), count(lit(1)).as("n_customers"))
      val sh = cs.join(broadcast(nt), Seq("c_nationkey"))
        .select(col("c_nationkey"),
          expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div ncents AS BIGINT)")
            .as("share_ppm"))
      sh.join(broadcast(nt), Seq("c_nationkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("n_customers"), col("ncents").as("total_cents"))
        .agg(expr("CAST(SUM(CAST(share_ppm AS DECIMAL(38,0)) * share_ppm) div 1000000" +
          " AS BIGINT)").as("hhi_ppm"))
        .orderBy("n_name")
    },

    // Ship-offset quantile profile per order priority (the fixture's
    // l_shipdate is synthetic and uncorrelated with o_orderdate, so the
    // offsets are SIGNED ±2400 days — which is exactly what makes this
    // a good quantile exercise: the rank-index pattern never divides,
    // so signed values cost nothing). Windows partition by priority;
    // duplicate (orderkey, linenumber) fixture rows share all ordering
    // fields, so any row_number assignment among them yields the same
    // quantile VALUES.
    QueryDef.sql(
      "q347_ship_offset",
      """WITH d AS (SELECT o_orderpriority AS pr,
        |    CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS off,
        |    l_orderkey, l_linenumber
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |r AS (SELECT pr, off,
        |    row_number() OVER (PARTITION BY pr
        |      ORDER BY off, l_orderkey, l_linenumber) AS rk,
        |    COUNT(*) OVER (PARTITION BY pr) AS n
        |  FROM d)
        |SELECT pr AS priority, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(CASE WHEN rk = (n + 3) // 4 THEN off END) AS BIGINT) AS p25_days,
        |  CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN off END) AS BIGINT) AS p50_days,
        |  CAST(MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN off END) AS BIGINT) AS p75_days,
        |  CAST(MIN(off) AS BIGINT) AS min_days, CAST(MAX(off) AS BIGINT) AS max_days
        |FROM r GROUP BY pr ORDER BY pr""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("pr"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("off"),
          col("l_orderkey"), col("l_linenumber"))
      val r = d.select(col("pr"), col("off"),
        row_number().over(Window.partitionBy("pr")
          .orderBy("off", "l_orderkey", "l_linenumber")).as("rk"),
        count(lit(1)).over(Window.partitionBy("pr")).as("n"))
      r.groupBy(col("pr").as("priority"))
        .agg(max("n").as("n"),
          max(when(col("rk") === expr("(n + 3) div 4"), col("off"))).as("p25_days"),
          max(when(col("rk") === expr("(n + 1) div 2"), col("off"))).as("p50_days"),
          max(when(col("rk") === expr("(3 * n + 3) div 4"), col("off"))).as("p75_days"),
          min("off").as("min_days"), max("off").as("max_days"))
        .orderBy("priority")
    },

    // Market-basket affinity on order contents: part pairs co-occurring
    // in the same order, with exact integer lift against independence.
    // Parts DEDUPE per order first, then the pair generator is a
    // per-order self-join — pair count follows Σ(basket size²), never
    // |lineitem|², the only shape that survives wide fact tables. Lift
    // = cnt·N·10⁶ / (n_a·n_b) stays in DECIMAL. Top 20 by support with
    // full (p1, p2) tie-break.
    QueryDef.sql(
      "q348_part_affinity",
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
        |pf AS (SELECT pk, COUNT(*) AS nf FROM op GROUP BY 1),
        |pairs AS (SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS cnt
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2)
        |SELECT p1, p2, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(CAST(cnt AS HUGEINT) * n_orders * 1000000 // (f1.nf * f2.nf) AS BIGINT)
        |    AS lift_ppm
        |FROM pairs JOIN pf f1 ON p1 = f1.pk JOIN pf f2 ON p2 = f2.pk CROSS JOIN n
        |ORDER BY cnt DESC, p1, p2 LIMIT 20""".stripMargin) { (s, dir) =>
      val op = Tables(s, dir).lineitem
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val n = op.agg(countDistinct("ok").as("n_orders"))
      val pf = op.groupBy("pk").agg(count(lit(1)).as("nf"))
      val a = op.select(col("ok"), col("pk").as("p1"))
      val b = op.select(col("ok"), col("pk").as("p2"))
      val pairs = a.join(b, Seq("ok")).where(col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("cnt"))
      pairs
        .join(broadcast(pf.select(col("pk").as("p1"), col("nf").as("f1"))), Seq("p1"))
        .join(broadcast(pf.select(col("pk").as("p2"), col("nf").as("f2"))), Seq("p2"))
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("cnt"),
          expr("CAST(CAST(cnt AS DECIMAL(38,0)) * n_orders * 1000000 div (f1 * f2)" +
            " AS BIGINT)").as("lift_ppm"))
        .orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(20)
    },

    // Supplier share-shift: each supplier's share of yearly shipped
    // quantity in exact ppm, LAG against the prior year, and the ten
    // biggest year-over-year share gains. Share denominators broadcast
    // per year; the LAG window partitions by supplier — the report is
    // two bounded aggregates plus a top-k, a shape that scales to any
    // number of suppliers.
    QueryDef.sql(
      "q349_share_shift",
      """WITH sy AS (SELECT l_suppkey AS sk, year(l_shipdate) AS y,
        |    SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |yt AS (SELECT y, SUM(q) AS tq FROM sy GROUP BY 1),
        |sh AS (SELECT sk, sy.y,
        |    CAST(CAST(q AS HUGEINT) * 1000000 // tq AS BIGINT) AS share_ppm
        |  FROM sy JOIN yt ON sy.y = yt.y),
        |d AS (SELECT sk, y, share_ppm,
        |    share_ppm - lag(share_ppm) OVER (PARTITION BY sk ORDER BY y) AS delta_ppm
        |  FROM sh)
        |SELECT CAST(sk AS BIGINT) AS suppkey, CAST(y AS BIGINT) AS year,
        |  share_ppm, CAST(delta_ppm AS BIGINT) AS delta_ppm
        |FROM d WHERE delta_ppm IS NOT NULL
        |ORDER BY delta_ppm DESC, suppkey, year LIMIT 10""".stripMargin) { (s, dir) =>
      val sy = Tables(s, dir).lineitem
        .groupBy(col("l_suppkey").as("sk"), year(col("l_shipdate")).cast("long").as("y"))
        .agg(sum(floor(col("l_quantity")).cast("long")).as("q"))
      val yt = sy.groupBy("y").agg(sum("q").as("tq"))
      val sh = sy.join(broadcast(yt), Seq("y"))
        .select(col("sk"), col("y"),
          expr("CAST(CAST(q AS DECIMAL(38,0)) * 1000000 div tq AS BIGINT)")
            .as("share_ppm"))
      val d = sh.withColumn("delta_ppm",
        col("share_ppm") - lag(col("share_ppm"), 1)
          .over(Window.partitionBy("sk").orderBy("y")))
      d.where(col("delta_ppm").isNotNull)
        .select(col("sk").cast("long").as("suppkey"), col("y").as("year"),
          col("share_ppm"), col("delta_ppm"))
        .orderBy(col("delta_ppm").desc, col("suppkey"), col("year"))
        .limit(10)
    },

    // Growth-accounting board: per day, NEW users (first-ever activity),
    // RETAINED (also active the previous day) and RESURRECTED (active
    // today, not yesterday, seen before) — the standard daily
    // active-user decomposition. Yesterday-activity resolves through an
    // EQUI self-join on (user, day−1) at distinct-activity grain; first
    // days come from one MIN aggregate. new+retained+resurrected =
    // active is an invariant both engines must reproduce exactly.
    QueryDef.sql(
      "q350_growth_accounting",
      """WITH acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS first_day FROM acts GROUP BY 1),
        |x AS (SELECT a.user_id, a.day, f.first_day,
        |    CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS was_active_yday
        |  FROM acts a JOIN f ON a.user_id = f.user_id
        |  LEFT JOIN acts p ON a.user_id = p.user_id AND p.day = a.day - 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, COUNT(*) AS n_active,
        |  CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN day > first_day AND was_active_yday = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(SUM(CASE WHEN day > first_day AND was_active_yday = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val acts = Tables(s, dir).events
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val f = acts.groupBy("user_id").agg(min("day").as("first_day"))
      // fresh aliases break the self-join attribute lineage
      val p = acts.select(col("user_id").as("p_user_id"), col("day").as("pday"))
      val x = acts.join(f, Seq("user_id"))
        .join(p, col("user_id") === col("p_user_id")
          && col("pday") === date_sub(col("day"), 1), "left_outer")
        .select(col("day"), col("first_day"),
          when(col("pday").isNotNull, 1L).otherwise(0L).as("was_active_yday"))
      x.groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
          sum(when(col("day") > col("first_day") && col("was_active_yday") === 1, 1L)
            .otherwise(0L)).as("n_retained"),
          sum(when(col("day") > col("first_day") && col("was_active_yday") === 0, 1L)
            .otherwise(0L)).as("n_resurrected"))
        .orderBy("day")
    })
}

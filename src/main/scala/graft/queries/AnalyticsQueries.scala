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
    })
}

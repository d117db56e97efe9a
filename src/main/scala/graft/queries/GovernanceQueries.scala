package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Data-quality and governance operators (round 4, q251+): the checks a
  * lake team runs continuously over the same tables the reference
  * migrates/compares — expectation suites, changelog compaction, and
  * privacy audits. All metrics are integer-exact (ppm via non-negative
  * `div`) so the DuckDB differential gate is bit-stable.
  */
object GovernanceQueries {

  def all: Seq[QueryDef] = Seq(

    // Deequ-style expectation suite: a declarative rules relation joined
    // against metric values computed in ONE aggregate pass per table
    // (completeness / uniqueness / domain membership / range / referential
    // integrity). The fact tables are scanned once each regardless of how
    // many rules read the same metric — at 100 TB the rule count is free;
    // only the per-table profile passes cost anything. RI is the one
    // metric that needs a join (lineitem ⋈ orders on the FK), expressed as
    // a conditional count over a left join so it stays a single shuffle.
    QueryDef.sql(
      "q251_dq_expectations",
      """WITH cust AS (
        |  SELECT
        |    COUNT(CASE WHEN c_mktsegment IS NOT NULL THEN 1 END) * 1000000 // COUNT(*)
        |      AS completeness,
        |    COUNT(DISTINCT c_custkey) * 1000000 // COUNT(*) AS uniqueness,
        |    COUNT(CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE',
        |      'HOUSEHOLD','MACHINERY') THEN 1 END) * 1000000 // COUNT(*) AS domain_ok
        |  FROM customer),
        |ord AS (
        |  SELECT COUNT(CASE WHEN o_totalprice >= 0 THEN 1 END) * 1000000 // COUNT(*)
        |    AS nonneg FROM orders),
        |li AS (
        |  SELECT COUNT(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 END) * 1000000
        |      // COUNT(*) AS qty_range
        |  FROM lineitem),
        |ri AS (
        |  SELECT COUNT(o_orderkey) * 1000000 // COUNT(*) AS fk_ok
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey),
        |m AS (
        |  SELECT 'customer.completeness_mktsegment' AS metric, completeness AS value_ppm
        |    FROM cust
        |  UNION ALL SELECT 'customer.uniqueness_custkey', uniqueness FROM cust
        |  UNION ALL SELECT 'customer.domain_mktsegment', domain_ok FROM cust
        |  UNION ALL SELECT 'orders.nonneg_totalprice', nonneg FROM ord
        |  UNION ALL SELECT 'lineitem.quantity_in_1_50', qty_range FROM li
        |  UNION ALL SELECT 'lineitem.fk_orderkey_resolves', fk_ok FROM ri),
        |rules(rule_id, metric, min_ppm) AS (VALUES
        |  ('r1_segment_complete', 'customer.completeness_mktsegment', 1000000),
        |  ('r2_custkey_unique',   'customer.uniqueness_custkey',      1000000),
        |  ('r3_segment_domain',   'customer.domain_mktsegment',       1000000),
        |  ('r4_price_nonneg',     'orders.nonneg_totalprice',         1000000),
        |  ('r5_qty_in_range',     'lineitem.quantity_in_1_50',         990000),
        |  ('r6_fk_resolves',      'lineitem.fk_orderkey_resolves',    1000000))
        |SELECT rule_id, m.metric, CAST(value_ppm AS BIGINT) AS value_ppm,
        |  CAST(min_ppm AS BIGINT) AS min_ppm, value_ppm >= min_ppm AS passed
        |FROM rules JOIN m ON rules.metric = m.metric
        |ORDER BY rule_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val ppm = lit(1000000L)
      val cust = t.customer.agg(
        (sum(when(col("c_mktsegment").isNotNull, 1L).otherwise(0L)) * ppm)
          .as("num_complete"),
        (countDistinct(col("c_custkey")) * ppm).as("num_unique"),
        (sum(when(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY"), 1L).otherwise(0L)) * ppm).as("num_domain"),
        count(lit(1)).as("n"))
      val custM = cust.select(
        explode(map(
          lit("customer.completeness_mktsegment"), expr("num_complete div n"),
          lit("customer.uniqueness_custkey"), expr("num_unique div n"),
          lit("customer.domain_mktsegment"), expr("num_domain div n")))
          .as(Seq("metric", "value_ppm")))
      val ord = t.orders.agg(
        (sum(when(col("o_totalprice") >= 0, 1L).otherwise(0L)) * ppm).as("num"),
        count(lit(1)).as("n"))
        .select(lit("orders.nonneg_totalprice").as("metric"),
          expr("num div n").as("value_ppm"))
      val li = t.lineitem.agg(
        (sum(when(col("l_quantity").between(1, 50), 1L).otherwise(0L)) * ppm).as("num"),
        count(lit(1)).as("n"))
        .select(lit("lineitem.quantity_in_1_50").as("metric"),
          expr("num div n").as("value_ppm"))
      val ri = t.lineitem.select(col("l_orderkey"))
        .join(t.orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg((sum(when(col("o_orderkey").isNotNull, 1L).otherwise(0L)) * ppm).as("num"),
          count(lit(1)).as("n"))
        .select(lit("lineitem.fk_orderkey_resolves").as("metric"),
          expr("num div n").as("value_ppm"))
      val metrics = custM.unionAll(ord).unionAll(li).unionAll(ri)
      val rules = Seq(
        ("r1_segment_complete", "customer.completeness_mktsegment", 1000000L),
        ("r2_custkey_unique", "customer.uniqueness_custkey", 1000000L),
        ("r3_segment_domain", "customer.domain_mktsegment", 1000000L),
        ("r4_price_nonneg", "orders.nonneg_totalprice", 1000000L),
        ("r5_qty_in_range", "lineitem.quantity_in_1_50", 990000L),
        ("r6_fk_resolves", "lineitem.fk_orderkey_resolves", 1000000L))
        .toDF("rule_id", "r_metric", "min_ppm")
      rules.join(metrics, col("r_metric") === metrics("metric"))
        .select(col("rule_id"), col("metric"), col("value_ppm"), col("min_ppm"),
          (col("value_ppm") >= col("min_ppm")).as("passed"))
        .orderBy("rule_id")
    },

    // CDC changelog compaction: collapse each key's op chain within a
    // batch to its NET effect (the reference applies every event one by
    // one, ST8; a lake sink first compacts — I→…→D cancels out, I→…→U is
    // a net INSERT of the final image, U/D on a pre-existing row keep
    // their kind). One window pass per key ordered by the unique
    // (ts, event_id) pair gives first/last op and the final image; at
    // scale the window partitions by key — no global sort, no self-join.
    QueryDef.sql(
      "q252_cdc_compaction",
      """WITH ops AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_id % 7 = 0 THEN 'D'
        |         WHEN event_id % 7 < 4 THEN 'U' ELSE 'I' END AS op,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, op, cents,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
        |      AS rn_d,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM ops),
        |fl AS (
        |  SELECT user_id, MAX(n_ops) AS n_ops,
        |    MAX(CASE WHEN rn_a = 1 THEN op END) AS first_op,
        |    MAX(CASE WHEN rn_d = 1 THEN op END) AS last_op,
        |    MAX(CASE WHEN rn_d = 1 THEN cents END) AS last_cents
        |  FROM r GROUP BY user_id)
        |SELECT user_id, CAST(n_ops AS BIGINT) AS n_ops, first_op, last_op,
        |  CASE WHEN last_op = 'D' THEN (CASE WHEN first_op = 'I' THEN 'NONE'
        |                                     ELSE 'DELETE' END)
        |       WHEN first_op = 'I' THEN 'INSERT' ELSE 'UPDATE' END AS net_op,
        |  CASE WHEN last_op = 'D' THEN NULL ELSE last_cents END AS image_cents
        |FROM fl ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ops = Tables(s, dir).events.select(
        col("user_id"), col("ts"), col("event_id"),
        when(col("event_id") % 7 === 0, "D")
          .when(col("event_id") % 7 < 4, "U").otherwise("I").as("op"),
        floor(col("value") * 100).cast("long").as("cents"))
      val wa = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val wall = Window.partitionBy("user_id")
      val fl = ops.select(col("user_id"), col("op"), col("cents"),
          row_number().over(wa).as("rn_a"), row_number().over(wd).as("rn_d"),
          count(lit(1)).over(wall).as("n_ops"))
        .groupBy("user_id")
        .agg(max("n_ops").as("n_ops"),
          max(when(col("rn_a") === 1, col("op"))).as("first_op"),
          max(when(col("rn_d") === 1, col("op"))).as("last_op"),
          max(when(col("rn_d") === 1, col("cents"))).as("last_cents"))
      fl.select(col("user_id"), col("n_ops"), col("first_op"), col("last_op"),
          when(col("last_op") === "D",
            when(col("first_op") === "I", "NONE").otherwise("DELETE"))
            .when(col("first_op") === "I", "INSERT").otherwise("UPDATE").as("net_op"),
          when(col("last_op") === "D", lit(null).cast("long"))
            .otherwise(col("last_cents")).as("image_cents"))
        .orderBy("user_id")
    },

    // k-anonymity / l-diversity audit over quasi-identifiers: group sizes
    // at the QI grain (nationkey × mktsegment) with the count of distinct
    // sensitive values (acctbal band) per group. k-anonymous ⇔ every
    // group ≥ k rows; l-diverse ⇔ ≥ l distinct sensitive values. One
    // aggregate at the QI grain — the privacy audit costs exactly one
    // shuffle of the dimension table at any scale. The band uses
    // double-floor division (not integer //) so negative balances floor
    // identically in both engines.
    QueryDef.sql(
      "q253_k_anonymity",
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT)) AS BIGINT)
        |    AS l_distinct,
        |  COUNT(*) >= 5 AS k5_ok,
        |  COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT)) >= 3 AS l3_ok
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, dir) =>
      Tables(s, dir).customer
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000.0).cast("long").as("band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"), countDistinct(col("band")).as("l_distinct"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"), col("l_distinct"),
          (col("n") >= 5).as("k5_ok"), (col("l_distinct") >= 3).as("l3_ok"))
        .orderBy("c_nationkey", "c_mktsegment")
    })
}

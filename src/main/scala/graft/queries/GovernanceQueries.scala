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
    },

    // All-column profile (assess A6 generalized past q215's numeric-only
    // stack): every column canonicalized to text IN-ROW — keys as digits,
    // money as cents, dates via explicit format so both engines render
    // identically — then ONE unpivot + ONE aggregate gives n / nulls /
    // NDV / lexicographic bounds for the whole table. k columns cost one
    // scan, not k.
    QueryDef.sql(
      "q263_column_profile",
      """WITH u AS (
        |  SELECT col, val FROM (
        |    SELECT CAST(o_orderkey AS VARCHAR) AS c1,
        |      CAST(o_custkey AS VARCHAR) AS c2,
        |      o_orderstatus AS c3,
        |      CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR) AS c4,
        |      strftime(o_orderdate, '%Y-%m-%d') AS c5
        |    FROM orders)
        |  UNPIVOT (val FOR col IN (c1 AS 'o_orderkey', c2 AS 'o_custkey',
        |    c3 AS 'o_orderstatus', c4 AS 'o_totalprice_c', c5 AS 'o_orderdate'))
        |)
        |SELECT col, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT val) AS BIGINT) AS ndv,
        |  MIN(val) AS min_val, MAX(val) AS max_val
        |FROM u GROUP BY col ORDER BY col""".stripMargin) { (s, dir) =>
      val canon = Tables(s, dir).orders.select(
        col("o_orderkey").cast("string").as("c1"),
        col("o_custkey").cast("string").as("c2"),
        col("o_orderstatus").as("c3"),
        floor(col("o_totalprice") * 100).cast("long").cast("string").as("c4"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("c5"))
      canon.select(expr(
          """stack(5, 'o_orderkey', c1, 'o_custkey', c2, 'o_orderstatus', c3,
            |  'o_totalprice_c', c4, 'o_orderdate', c5) AS (col, val)""".stripMargin))
        .groupBy("col")
        .agg(count(lit(1)).as("n"), (count(lit(1)) - count(col("val"))).as("n_null"),
          countDistinct(col("val")).as("ndv"),
          min("val").as("min_val"), max("val").as("max_val"))
        .orderBy("col")
    },

    // Trigram index for substring (LIKE '%…%') search — the standard
    // pg_trgm trick, built as a relation: each document contributes its
    // distinct character 3-grams (in-row transform, spaces included so
    // cross-word needles work); a needle's candidates are the docs
    // containing ALL its trigrams (equi-join + count check — cost
    // follows posting lists, never |docs|×|needle|), then the exact LIKE
    // verifies candidates only. Zero misses is the losslessness
    // contract; false candidates are the index's (audited) noise.
    QueryDef.sql(
      "q264_trigram_like",
      """WITH g AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(text) - 1),
        |      i -> substr(text, CAST(i AS INTEGER), 3))) AS gram
        |    FROM documents WHERE len(text) >= 3)),
        |need(gram) AS (VALUES ('e v'), (' va')),
        |cand AS (
        |  SELECT doc_id FROM g JOIN need USING (gram)
        |  GROUP BY doc_id HAVING COUNT(DISTINCT gram) = 2),
        |truth AS (SELECT doc_id FROM documents WHERE text LIKE '%e va%')
        |SELECT
        |  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
        |  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
        |  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
        |  CAST((SELECT COUNT(*) FROM cand WHERE doc_id NOT IN
        |    (SELECT doc_id FROM truth)) AS BIGINT) AS false_candidates,
        |  CAST((SELECT COUNT(*) FROM truth WHERE doc_id NOT IN
        |    (SELECT doc_id FROM cand)) AS BIGINT) AS missed""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val g = docs.where(length(col("text")) >= 3)
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(1, char_length(text) - 2), i -> substring(text, i, 3))"))
            .as("gram"))
        .distinct()
      val need = Seq("e v", " va")
      val cand = g.where(col("gram").isin(need: _*))
        .groupBy("doc_id").agg(countDistinct(col("gram")).as("ng"))
        .where(col("ng") === need.length).select("doc_id")
      val truth = docs.where(col("text").like("%e va%")).select("doc_id")
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val falseC = cand.join(truth.withColumnRenamed("doc_id", "t_id"),
          col("doc_id") === col("t_id"), "left_anti")
        .agg(count(lit(1)).as("false_candidates"))
      val missed = truth.join(cand.withColumnRenamed("doc_id", "c_id"),
          col("doc_id") === col("c_id"), "left_anti")
        .agg(count(lit(1)).as("missed"))
      nDocs.crossJoin(broadcast(nCand)).crossJoin(broadcast(nTruth))
        .crossJoin(broadcast(falseC)).crossJoin(broadcast(missed))
    },

    // Golden-record survivorship (MDM merge, field grain — q209's
    // canonical pick works at ROW grain): deterministic record variants
    // (v1-v3 with per-field nulls and one planted acctbal conflict)
    // merge per field by "highest version wins among non-null" — a
    // coalesce over per-version conditional MAXes, ONE aggregate, no
    // join chain. The conflict count audits fields with >1 distinct
    // non-null value across variants.
    QueryDef.sql(
      "q265_survivorship",
      """WITH v AS (
        |  SELECT c_custkey AS k, 1 AS ver, c_name AS name,
        |    CASE WHEN c_custkey % 2 = 0
        |      THEN CAST(FLOOR(c_acctbal * 100) AS BIGINT) END AS bal_c,
        |    c_mktsegment AS seg
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 2,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT)
        |      + CASE WHEN c_custkey % 7 = 0 THEN 100 ELSE 0 END,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 3, c_name, NULL, c_mktsegment
        |  FROM customer WHERE c_custkey % 4 = 0),
        |m AS (
        |  SELECT k, COUNT(*) AS n_variants,
        |    COALESCE(MAX(CASE WHEN ver = 3 THEN name END),
        |      MAX(CASE WHEN ver = 2 THEN name END),
        |      MAX(CASE WHEN ver = 1 THEN name END)) AS name,
        |    COALESCE(MAX(CASE WHEN ver = 3 THEN bal_c END),
        |      MAX(CASE WHEN ver = 2 THEN bal_c END),
        |      MAX(CASE WHEN ver = 1 THEN bal_c END)) AS bal_c,
        |    COALESCE(MAX(CASE WHEN ver = 3 THEN seg END),
        |      MAX(CASE WHEN ver = 2 THEN seg END),
        |      MAX(CASE WHEN ver = 1 THEN seg END)) AS seg,
        |    (CASE WHEN COUNT(DISTINCT name) > 1 THEN 1 ELSE 0 END
        |     + CASE WHEN COUNT(DISTINCT bal_c) > 1 THEN 1 ELSE 0 END
        |     + CASE WHEN COUNT(DISTINCT seg) > 1 THEN 1 ELSE 0 END) AS n_conflicts
        |  FROM v GROUP BY k)
        |SELECT k AS c_custkey, CAST(n_variants AS BIGINT) AS n_variants,
        |  name, CAST(bal_c AS BIGINT) AS bal_c, seg,
        |  CAST(n_conflicts AS BIGINT) AS n_conflicts
        |FROM m ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir).customer
      val balc = floor(col("c_acctbal") * 100).cast("long")
      val v1 = c.select(col("c_custkey").as("k"), lit(1).as("ver"),
        col("c_name").as("name"),
        when(col("c_custkey") % 2 === 0, balc).as("bal_c"),
        col("c_mktsegment").as("seg"))
      val v2 = c.select(col("c_custkey").as("k"), lit(2).as("ver"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("name"),
        (balc + when(col("c_custkey") % 7 === 0, 100L).otherwise(0L)).as("bal_c"),
        when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg"))
      val v3 = c.where(col("c_custkey") % 4 === 0)
        .select(col("c_custkey").as("k"), lit(3).as("ver"), col("c_name").as("name"),
          lit(null).cast("long").as("bal_c"), col("c_mktsegment").as("seg"))
      def surv(f: String) = coalesce(
        max(when(col("ver") === 3, col(f))),
        max(when(col("ver") === 2, col(f))),
        max(when(col("ver") === 1, col(f))))
      v1.unionAll(v2).unionAll(v3)
        .groupBy("k")
        .agg(count(lit(1)).as("n_variants"),
          surv("name").as("name"), surv("bal_c").as("bal_c"), surv("seg").as("seg"),
          (when(countDistinct(col("name")) > 1, 1L).otherwise(0L)
            + when(countDistinct(col("bal_c")) > 1, 1L).otherwise(0L)
            + when(countDistinct(col("seg")) > 1, 1L).otherwise(0L)).as("n_conflicts"))
        .select(col("k").as("c_custkey"), col("n_variants"), col("name"),
          col("bal_c"), col("seg"), col("n_conflicts"))
        .orderBy("c_custkey")
    })
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.Ranks

/** Model-evaluation operators (round 4, q254+): the offline metrics a
  * training pipeline computes next to the data it ships — ranking AUC,
  * calibration, and split integrity. Complements q247 (classification
  * P/R/F1) and q248 (retrieval P@k/MRR). All ratios are integer-exact.
  */
object EvalQueries {

  def all: Seq[QueryDef] = Seq(

    // Exact ROC AUC via the Mann-Whitney rank-sum identity:
    // AUC = (ΣR⁺ − P(P+1)/2) / (P·N) with average ranks for ties. The
    // whole computation happens at the VALUE grain, not the row grain:
    // one aggregate collapses the facts to (score, n, n_pos) — bounded by
    // the score domain (≤ 49k cent values here), regardless of fact
    // cardinality — then a window over that tiny relation assigns tied
    // average ranks (kept ×2 so they stay integral). The rank-sum is
    // carried in DECIMAL(38,0): at 10⁶ ppm scaling it would overflow a
    // BIGINT past ~sf10 while DuckDB's SUM promotes to HUGEINT.
    QueryDef.sql(
      "q254_auc",
      """WITH s AS (
        |  SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |g AS (SELECT cents, COUNT(*) AS c, SUM(pos) AS p FROM s GROUP BY 1),
        |r AS (
        |  SELECT cents, c, p,
        |    COALESCE(SUM(c) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM g),
        |t AS (
        |  SELECT SUM(p * (2 * before + c + 1)) AS sum2r,
        |    SUM(p) AS pp, SUM(c - p) AS nn
        |  FROM r)
        |SELECT CAST(pp AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        |  CAST((sum2r - pp * (pp + 1)) * 1000000 // (2 * pp * nn) AS BIGINT)
        |    AS auc_ppm
        |FROM t""".stripMargin) { (s, dir) =>
      val base = Tables(s, dir).events.select(
        floor(col("value") * 100).cast("long").as("cents"),
        when(col("event_type").isin("purchase", "signup"), 1L).otherwise(0L).as("pos"))
      val g = base.groupBy("cents").agg(count(lit(1)).as("c"), sum("pos").as("p"))
      // value-grain window: ≤ |score domain| rows reach this sort, so the
      // unpartitioned frame is bounded metadata, never the fact table
      val w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
      val r = g.withColumn("before", coalesce(sum("c").over(w), lit(0L)))
      r.agg(
          sum((col("p") * (lit(2) * col("before") + col("c") + 1))
            .cast("decimal(38,0)")).as("sum2r"),
          sum("p").as("pp"), sum(col("c") - col("p")).as("nn"))
        .select(col("pp").as("n_pos"), col("nn").as("n_neg"),
          expr("""CAST(((sum2r - CAST(pp AS DECIMAL(38,0)) * (pp + 1)) * 1000000)
                 | div (2 * CAST(pp AS DECIMAL(38,0)) * nn) AS BIGINT)""".stripMargin)
            .as("auc_ppm"))
    },

    // Decile calibration curve: rows ranked by (score, event_id) — the
    // unique tiebreak keeps both engines' decile assignment identical —
    // bucketed by the arithmetic rule d = (r−1)·10/n + 1 (applied
    // identically in both engines, so no NTILE edge-case dependence), then
    // per-decile observed positive rate vs mean score. The Spark side uses
    // the distributed global-rank helper (range shuffle + offset table) —
    // no single-task global window at any scale.
    QueryDef.sql(
      "q255_calibration",
      """WITH s AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |r AS (
        |  SELECT cents, pos,
        |    ROW_NUMBER() OVER (ORDER BY cents, event_id) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM s)
        |SELECT CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents,
        |  CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_ppm
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin) { (s, dir) =>
      val base = Tables(s, dir).events.select(
        col("event_id"), floor(col("value") * 100).cast("long").as("cents"),
        when(col("event_type").isin("purchase", "signup"), 1L).otherwise(0L).as("pos"))
      val (ranked, n) = Ranks.withGlobalRankAndTotal(base, Seq("cents", "event_id"), "rk")
      ranked
        .groupBy(((col("rk") - 1) * 10 / lit(n)).cast("long").as("decile0"))
        .agg(count(lit(1)).as("n"),
          expr("sum(cents) div count(1)").as("avg_cents"),
          expr("sum(pos) * 1000000 div count(1)").as("pos_ppm"))
        .select((col("decile0") + 1).as("decile"), col("n"), col("avg_cents"),
          col("pos_ppm"))
        .orderBy("decile")
    },

    // Train/val/test split integrity audit: the split is a pure projection
    // of a salted portable hash (md5 first-8-hex of "doc_id:split-salt",
    // mod 100 → 80/10/10) — reproducible on any engine, no stored split
    // column. The audit reports each (split, class) cell with its share
    // of the split and of the class: stratification drift shows up as
    // split_share differing across splits for the same class. Group grain
    // is |splits|×|classes| — window shares cost metadata, not data.
    QueryDef.sql(
      "q256_split_audit",
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END
        |      AS split
        |  FROM (SELECT source,
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split42'), 1, 8))
        |            ::BIGINT % 100 AS h
        |        FROM documents)),
        |c AS (SELECT split, source, COUNT(*) AS n FROM d GROUP BY 1, 2)
        |SELECT split, source, CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY split) AS BIGINT)
        |    AS split_share_ppm,
        |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY source) AS BIGINT)
        |    AS class_share_ppm
        |FROM c ORDER BY split, source""".stripMargin) { (s, dir) =>
      val h = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":split42"))),
        1, 8), 16, 10).cast("long") % 100
      val d = Tables(s, dir).documents.select(col("source"),
        when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"))
      val c = d.groupBy("split", "source").agg(count(lit(1)).as("n"))
      c.select(col("split"), col("source"), col("n"),
          expr("n * 1000000 div sum(n) over (partition by split)").as("split_share_ppm"),
          expr("n * 1000000 div sum(n) over (partition by source)").as("class_share_ppm"))
        .orderBy("split", "source")
    })
}

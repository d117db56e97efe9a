package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.{Canonical, Checksums}
import graft.operators.Perturb

/** Query-planning and lake-maintenance operators (round 4, q230+): the
  * statistics a cost-based planner consumes, and the hierarchical compare
  * shape the reference's chunk checksums grow into at lake scale.
  */
object PlannerQueries {

  def all: Seq[QueryDef] = Seq(

    // Aggregate-lattice reuse — the materialized-rollup contract: the
    // monthly grain is derived from the DAILY aggregate (associative
    // re-aggregation), never from the base table, and must equal the
    // direct computation the oracle runs. At 100 TB this is the
    // difference between scanning 365 aggregate rows/day and rescanning
    // the fact history per report (q75/q170's IVM siblings: this is the
    // read path, those are the write path).
    QueryDef.sql(
      "q230_rollup_reuse",
      """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        |  CAST(COUNT(DISTINCT date_trunc('day', l_shipdate)) AS BIGINT) AS n_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem GROUP BY 1 ORDER BY month""".stripMargin) { (s, dir) =>
      val daily = Tables(s, dir).lineitem
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("revenue_c"))
      daily
        .groupBy(substring(col("day"), 1, 7).as("month"))
        .agg(count(lit(1)).as("n_days"), sum("n_lines").as("n_lines"),
          sum("revenue_c").as("revenue_c"))
        .select(col("month"), col("n_days"), col("n_lines"), col("revenue_c"))
        .orderBy("month")
    },

    // Join-size estimation WITHOUT executing the join — the number a
    // cost-based optimizer wants before picking broadcast vs shuffle vs
    // salting: per-key counts from each side meet on the key (count
    // grain, not row grain), and Σ nₐ·n_b is the exact output
    // cardinality; max single-key contribution is the skew headroom
    // (q214's diagnostics feed this). Three candidate joins profiled
    // for the cost of three count-aggregates.
    QueryDef.sql(
      "q231_join_size_estimate",
      """WITH lk AS (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |lp AS (SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |ls AS (SELECT l_suppkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |ok AS (SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
        |e AS (
        |  SELECT 'lineitem*orders@orderkey' AS join_id,
        |    SUM(a.n * b.n) AS est, MAX(a.n * b.n) AS max_key
        |  FROM lk a JOIN ok b USING (k)
        |  UNION ALL
        |  SELECT 'lineitem*lineitem@partkey', SUM(n * n), MAX(n * n) FROM lp
        |  UNION ALL
        |  SELECT 'lineitem*lineitem@suppkey', SUM(n * n), MAX(n * n) FROM ls)
        |SELECT join_id, CAST(est AS BIGINT) AS est_rows,
        |  CAST(max_key AS BIGINT) AS max_key_rows
        |FROM e ORDER BY join_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def keyCounts(df: org.apache.spark.sql.DataFrame, k: String) =
        df.groupBy(col(k).as("k")).agg(count(lit(1)).as("n"))
      val lk = keyCounts(t.lineitem, "l_orderkey")
      val lp = keyCounts(t.lineitem, "l_partkey")
      val ls = keyCounts(t.lineitem, "l_suppkey")
      val ok = keyCounts(t.orders, "o_orderkey")
        .withColumnRenamed("n", "nb")
      val eOrders = lk.join(ok, "k")
        .agg(sum(col("n") * col("nb")).as("est"),
          max(col("n") * col("nb")).as("max_key"))
        .select(lit("lineitem*orders@orderkey").as("join_id"),
          col("est"), col("max_key"))
      def selfEst(kc: org.apache.spark.sql.DataFrame, id: String) =
        kc.agg(sum(col("n") * col("n")).as("est"),
            max(col("n") * col("n")).as("max_key"))
          .select(lit(id).as("join_id"), col("est"), col("max_key"))
      eOrders
        .unionAll(selfEst(lp, "lineitem*lineitem@partkey"))
        .unionAll(selfEst(ls, "lineitem*lineitem@suppkey"))
        .select(col("join_id"), col("est").as("est_rows"),
          col("max_key").as("max_key_rows"))
        .orderBy("join_id")
    },

    // Merkle-style hierarchical compare — how the reference's per-chunk
    // checksums (A2, data_compare_row.go:548-591) scale to a 100 TB
    // anti-entropy pass: row hashes fold into 1024 leaf buckets, leaves
    // fold 32:1 into an inner level, inner folds to one root. A replica
    // diverging in d buckets is located by walking log₃₂(1024) levels —
    // re-reading only diverging subtrees — instead of diffing the whole
    // table. Both sides aggregate map-side to ≤1024 rows before any
    // exchange; the levels derive from the leaf frame without rescans.
    QueryDef.sql(
      "q232_merkle_compare",
      s"""WITH dst AS (${Perturb.DstSql}),
         |sl AS (SELECT ('0x' || substr(md5(${CompareSql.rowStr}), 1, 8))::BIGINT % 1024
         |         AS bucket,
         |       CAST(SUM(('0x' || substr(md5(${CompareSql.rowStr}), 9, 8))::BIGINT)
         |         AS BIGINT) AS h
         |       FROM lineitem GROUP BY 1),
         |dl AS (SELECT ('0x' || substr(md5(${CompareSql.rowStr}), 1, 8))::BIGINT % 1024
         |         AS bucket,
         |       CAST(SUM(('0x' || substr(md5(${CompareSql.rowStr}), 9, 8))::BIGINT)
         |         AS BIGINT) AS h
         |       FROM dst GROUP BY 1),
         |leaf AS (
         |  SELECT COALESCE(sl.bucket, dl.bucket) AS bucket,
         |    COALESCE(sl.h, 0) AS sh, COALESCE(dl.h, 0) AS dh
         |  FROM sl FULL OUTER JOIN dl ON sl.bucket = dl.bucket),
         |inner_ AS (SELECT bucket // 32 AS node, SUM(sh) AS sh, SUM(dh) AS dh
         |           FROM leaf GROUP BY 1),
         |root AS (SELECT SUM(sh) AS sh, SUM(dh) AS dh FROM inner_),
         |lv AS (
         |  SELECT 'a_root' AS level, 1 AS n_nodes,
         |    CASE WHEN sh <> dh THEN 1 ELSE 0 END AS n_diverging FROM root
         |  UNION ALL
         |  SELECT 'b_inner', COUNT(*), SUM(CASE WHEN sh <> dh THEN 1 ELSE 0 END)
         |  FROM inner_
         |  UNION ALL
         |  SELECT 'c_leaf', COUNT(*), SUM(CASE WHEN sh <> dh THEN 1 ELSE 0 END)
         |  FROM leaf)
         |SELECT level, CAST(n_nodes AS BIGINT) AS n_nodes,
         |  CAST(n_diverging AS BIGINT) AS n_diverging
         |FROM lv ORDER BY level""".stripMargin) { (s, dir) =>
      def leafHashes(df: org.apache.spark.sql.DataFrame, side: String) = {
        val rowStr = Canonical.rowString(df, Perturb.CompareCols)
        df.select(
            (conv(substring(md5(rowStr), 1, 8), 16, 10).cast("long") % 1024)
              .as("bucket"),
            conv(substring(md5(rowStr), 9, 8), 16, 10).cast("long").as("rh"))
          .groupBy("bucket").agg(sum("rh").as(side))
      }
      val src = Tables(s, dir).lineitem.select(Perturb.CompareCols.map(col): _*)
      val dst = Perturb.perturbedLineitem(Tables(s, dir).lineitem)
      val leaf = leafHashes(src, "sh")
        .join(leafHashes(dst, "dh"), Seq("bucket"), "full_outer")
        .select(col("bucket"), coalesce(col("sh"), lit(0L)).as("sh"),
          coalesce(col("dh"), lit(0L)).as("dh"))
      val inner = leaf.groupBy(expr("bucket div 32").as("node"))
        .agg(sum("sh").as("sh"), sum("dh").as("dh"))
      val diverge = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        sum(when(a =!= b, 1L).otherwise(0L)).as("n_diverging")
      val root = inner.agg(sum("sh").as("sh"), sum("dh").as("dh"))
        .select(lit("a_root").as("level"), lit(1L).as("n_nodes"),
          when(col("sh") =!= col("dh"), 1L).otherwise(0L).as("n_diverging"))
      root
        .unionAll(inner.agg(count(lit(1)).as("n_nodes"),
            diverge(col("sh"), col("dh")))
          .select(lit("b_inner").as("level"), col("n_nodes"), col("n_diverging")))
        .unionAll(leaf.agg(count(lit(1)).as("n_nodes"),
            diverge(col("sh"), col("dh")))
          .select(lit("c_leaf").as("level"), col("n_nodes"), col("n_diverging")))
        .orderBy("level")
    })
}

/** SQL fragments shared with the DuckDB oracles of the compare family. */
private object CompareSql {
  /** DuckDB twin of Canonical.rowString over Perturb.CompareCols
    * (mirrors CompareQueries.rowStrSql — kept here to avoid exposing the
    * private val across files).
    */
  val rowStr: String =
    """concat_ws('|',
      |  coalesce(l_orderkey::VARCHAR, '0'),
      |  coalesce(l_linenumber::VARCHAR, '0'),
      |  coalesce(CAST(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT) AS VARCHAR), '0'),
      |  coalesce(CAST(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT) AS VARCHAR), '0'),
      |  coalesce(l_returnflag, '0'),
      |  coalesce(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S.%f'), '0'))""".stripMargin
}

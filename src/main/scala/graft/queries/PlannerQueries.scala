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
    },

    // Session-gap sensitivity sweep — the tuning run BEFORE committing a
    // sessionization threshold (q7/q123 fix one; production picks one
    // from this curve): per-user inter-event gaps are computed once
    // (one window pass), then every candidate timeout is priced from the
    // same gap distribution as conditional counts — sessions(g) =
    // users + |gaps > g|. Four thresholds for the cost of one scan;
    // the k-threshold sweep never re-sessionizes.
    QueryDef.sql(
      "q233_session_sensitivity",
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) AS gap_us
        |  FROM events),
        |a AS (SELECT COUNT(*) AS n_events,
        |        COUNT(DISTINCT user_id) AS n_users,
        |        SUM(CASE WHEN gap_us > 300000000 THEN 1 ELSE 0 END) AS g300,
        |        SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) AS g1800,
        |        SUM(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END) AS g3600,
        |        SUM(CASE WHEN gap_us > 14400000000 THEN 1 ELSE 0 END) AS g14400
        |      FROM g),
        |s AS (
        |  SELECT 300 AS timeout_s, n_users + g300 AS n_sessions, n_events FROM a
        |  UNION ALL SELECT 1800, n_users + g1800, n_events FROM a
        |  UNION ALL SELECT 3600, n_users + g3600, n_events FROM a
        |  UNION ALL SELECT 14400, n_users + g14400, n_events FROM a)
        |SELECT CAST(timeout_s AS BIGINT) AS timeout_s,
        |  CAST(n_sessions AS BIGINT) AS n_sessions,
        |  CAST(n_events * 1000000 // n_sessions AS BIGINT) AS events_per_session_ppm
        |FROM s ORDER BY timeout_s""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val g = Tables(s, dir).events
        .select(col("user_id"),
          (unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w))).as("gap_us"))
      val a = g.agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(when(col("gap_us") > 300000000L, 1L).otherwise(0L)).as("g300"),
        sum(when(col("gap_us") > 1800000000L, 1L).otherwise(0L)).as("g1800"),
        sum(when(col("gap_us") > 3600000000L, 1L).otherwise(0L)).as("g3600"),
        sum(when(col("gap_us") > 14400000000L, 1L).otherwise(0L)).as("g14400"))
      a.select(expr(
          """stack(4,
            |  300L, n_users + g300,
            |  1800L, n_users + g1800,
            |  3600L, n_users + g3600,
            |  14400L, n_users + g14400) AS (timeout_s, n_sessions)""".stripMargin),
          col("n_events"))
        .select(col("timeout_s"), col("n_sessions"),
          expr("n_events * 1000000L div n_sessions").as("events_per_session_ppm"))
        .orderBy("timeout_s")
    },

    // Dictionary-encoding advisor — the storage-codec decision parquet
    // writers make per column chunk, lifted to an audit: for each string
    // column, raw bytes vs dictionary bytes (distinct values' payload +
    // 2-byte codes) from ONE stacked scan aggregated at (column, value)
    // grain first — value-type cardinality, not row count, prices the
    // dictionary exactly as q223 prices the vocab probe.
    QueryDef.sql(
      "q234_dict_advisor",
      """WITH st AS (
        |  SELECT 'l_returnflag' AS col_name, l_returnflag AS v FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL SELECT 'l_qty_str', CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS VARCHAR)
        |    FROM lineitem),
        |cv AS (SELECT col_name, v, COUNT(*) AS cnt, length(v) AS len
        |       FROM st GROUP BY 1, 2),
        |c AS (SELECT col_name, SUM(cnt) AS n, COUNT(*) AS ndv,
        |        SUM(cnt * len) AS raw_bytes, SUM(len) + 2 * SUM(cnt) AS dict_bytes
        |      FROM cv GROUP BY 1)
        |SELECT col_name, CAST(n AS BIGINT) AS n, CAST(ndv AS BIGINT) AS ndv,
        |  CAST(raw_bytes AS BIGINT) AS raw_bytes,
        |  CAST(dict_bytes AS BIGINT) AS dict_bytes,
        |  CAST((raw_bytes - dict_bytes) * 1000000 // raw_bytes AS BIGINT) AS saving_ppm
        |FROM c ORDER BY col_name""".stripMargin) { (s, dir) =>
      val cv = Tables(s, dir).lineitem
        .select(expr(
          """stack(3,
            |  'l_returnflag', l_returnflag,
            |  'l_linestatus', l_linestatus,
            |  'l_qty_str', CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS STRING))
            |  AS (col_name, v)""".stripMargin))
        .groupBy("col_name", "v")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("len", length(col("v")).cast("long"))
      cv.groupBy("col_name")
        .agg(sum("cnt").as("n"), count(lit(1)).as("ndv"),
          sum(col("cnt") * col("len")).as("raw_bytes"),
          (sum("len") + lit(2) * sum("cnt")).as("dict_bytes"))
        .select(col("col_name"), col("n"), col("ndv"), col("raw_bytes"),
          col("dict_bytes"),
          expr("(raw_bytes - dict_bytes) * 1000000L div raw_bytes").as("saving_ppm"))
        .orderBy("col_name")
    },

    // Week-over-week trending terms — the drift readout between two
    // corpus snapshots: term traffic (event_type × k-prop decade) is
    // aggregated per half-month, ranked within each period, and the two
    // rank lists meet in ONE full-outer join at term grain (the
    // aggregates are term-sized; the fact table is scanned once).
    // Status classifies entries of the union of both top-10s.
    QueryDef.sql(
      "q235_trending_terms",
      """WITH t AS (
        |  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'w1' ELSE 'w2' END AS wk,
        |    event_type || '_' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 10
        |      AS VARCHAR) AS term,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT wk, term, n,
        |        ROW_NUMBER() OVER (PARTITION BY wk ORDER BY n DESC, term) AS rk
        |      FROM t),
        |j AS (SELECT COALESCE(a.term, b.term) AS term, a.rk AS r1, b.rk AS r2
        |      FROM (SELECT * FROM r WHERE wk = 'w1') a
        |      FULL OUTER JOIN (SELECT * FROM r WHERE wk = 'w2') b ON a.term = b.term)
        |SELECT term, CAST(COALESCE(r1, 0) AS BIGINT) AS r1,
        |  CAST(COALESCE(r2, 0) AS BIGINT) AS r2,
        |  CASE WHEN r1 IS NULL THEN 'new' WHEN r2 IS NULL THEN 'dropped'
        |       WHEN r1 = r2 THEN 'stable' ELSE 'moved' END AS status
        |FROM j WHERE COALESCE(r1, 99) <= 10 OR COALESCE(r2, 99) <= 10
        |ORDER BY term""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir).events
        .select(
          when(col("ts") < to_timestamp(lit("2024-01-16 00:00:00")), "w1")
            .otherwise("w2").as("wk"),
          concat(col("event_type"), lit("_"),
            expr("CAST(get_json_object(props, '$.k') AS LONG) div 10")).as("term"))
        .groupBy("wk", "term").agg(count(lit(1)).as("n"))
      val r = t.withColumn("rk",
        row_number().over(Window.partitionBy("wk").orderBy(col("n").desc, col("term"))))
      val w1 = r.where(col("wk") === "w1").select(col("term"), col("rk").as("r1"))
      val w2 = r.where(col("wk") === "w2").select(col("term").as("term2"), col("rk").as("r2"))
      w1.join(w2, col("term") === col("term2"), "full_outer")
        .select(coalesce(col("term"), col("term2")).as("term"), col("r1"), col("r2"))
        .where(coalesce(col("r1"), lit(99)) <= 10 || coalesce(col("r2"), lit(99)) <= 10)
        .select(col("term"), coalesce(col("r1"), lit(0L)).cast("long").as("r1"),
          coalesce(col("r2"), lit(0L)).cast("long").as("r2"),
          when(col("r1").isNull, "new").when(col("r2").isNull, "dropped")
            .when(col("r1") === col("r2"), "stable").otherwise("moved").as("status"))
        .orderBy("term")
    },

    // Broadcast-threshold advisor — the decision Spark's planner makes
    // from table statistics (spark.sql.autoBroadcastJoinThreshold),
    // recomputed as an explicit audit: per dimension table, exact row
    // count and rendered payload bytes decide broadcast vs shuffle at
    // the default 10 MB threshold. Each table reduces map-side to one
    // row; the union is metadata-sized. The numbers q231's join
    // estimates pair with when picking a physical strategy.
    QueryDef.sql(
      "q236_broadcast_advisor",
      """WITH t AS (
        |  SELECT 'region' AS tbl, COUNT(*) AS n,
        |    SUM(8 + length(r_name)) AS est_bytes FROM region
        |  UNION ALL SELECT 'nation', COUNT(*),
        |    SUM(16 + length(n_name)) FROM nation
        |  UNION ALL SELECT 'supplier', COUNT(*),
        |    SUM(24 + length(s_name)) FROM supplier
        |  UNION ALL SELECT 'customer', COUNT(*),
        |    SUM(24 + length(c_name) + length(c_mktsegment)) FROM customer
        |  UNION ALL SELECT 'part', COUNT(*),
        |    SUM(24 + length(p_name) + length(p_brand) + length(p_type)) FROM part
        |  UNION ALL SELECT 'orders', COUNT(*),
        |    SUM(32 + length(o_orderpriority)) FROM orders)
        |SELECT tbl, CAST(n AS BIGINT) AS n_rows,
        |  CAST(est_bytes AS BIGINT) AS est_bytes,
        |  est_bytes <= 10485760 AS broadcastable
        |FROM t ORDER BY tbl""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def prof(df: org.apache.spark.sql.DataFrame, tbl: String, bytes: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n"), sum(bytes).as("est_bytes"))
          .select(lit(tbl).as("tbl"), col("n"), col("est_bytes"))
      prof(t.region, "region", lit(8) + length(col("r_name")))
        .unionAll(prof(t.nation, "nation", lit(16) + length(col("n_name"))))
        .unionAll(prof(t.supplier, "supplier", lit(24) + length(col("s_name"))))
        .unionAll(prof(t.customer, "customer",
          lit(24) + length(col("c_name")) + length(col("c_mktsegment"))))
        .unionAll(prof(t.part, "part",
          lit(24) + length(col("p_name")) + length(col("p_brand")) + length(col("p_type"))))
        .unionAll(prof(t.orders, "orders",
          lit(32) + length(col("o_orderpriority"))))
        .select(col("tbl"), col("n").as("n_rows"), col("est_bytes"),
          (col("est_bytes") <= 10485760L).as("broadcastable"))
        .orderBy("tbl")
    },

    // Distribution drift via total-variation distance — the feature-
    // monitoring gate between two data windows, kept integer-exact
    // (PSI/KL need logs; TVD = ½·Σ|p−q| doesn't): events.value is
    // banded, both periods' band shares are computed from ONE scan
    // (conditional counts), and per-band ppm deltas plus the TVD
    // half-sum come out as plain BIGINTs. Band grain bounds everything
    // after the first aggregate.
    QueryDef.sql(
      "q237_distribution_drift",
      """WITH b AS (
        |  SELECT CAST(FLOOR(value / 10) AS BIGINT) AS band,
        |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS n2
        |  FROM events GROUP BY 1),
        |tot AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM b),
        |d AS (SELECT band, n1, n2,
        |        ABS(n1 * 1000000 // t1 - n2 * 1000000 // t2) AS delta_ppm
        |      FROM b, tot)
        |SELECT band, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(delta_ppm AS BIGINT) AS delta_ppm,
        |  CAST((SELECT SUM(delta_ppm) FROM d) // 2 AS BIGINT) AS tvd_ppm
        |FROM d ORDER BY band""".stripMargin) { (s, dir) =>
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val b = Tables(s, dir).events
        .groupBy(floor(col("value") / 10).cast("long").as("band"))
        .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("n1"),
          sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("n2"))
      val tot = b.agg(sum("n1").as("t1"), sum("n2").as("t2"))
      val d = b.crossJoin(broadcast(tot))
        .select(col("band"), col("n1"), col("n2"),
          abs(expr("n1 * 1000000L div t1") - expr("n2 * 1000000L div t2"))
            .as("delta_ppm"))
      val tvd = d.agg((sum("delta_ppm") / 2).cast("long").as("tvd_ppm"))
      d.crossJoin(broadcast(tvd)).orderBy("band")
    },

    // Primary-key uniqueness audit — the PK-candidate discovery that
    // pairs with q224's FK containment: for each candidate key (single
    // columns and the composite the fixture ACTUALLY violates —
    // lineitem's (orderkey, linenumber) carries duplicate pairs), exact
    // row count vs NDV at count grain decides is_unique and prices the
    // duplication. NDV per candidate from one distinct-aggregate each;
    // output is candidate-sized.
    QueryDef.sql(
      "q238_key_uniqueness",
      """WITH c AS (
        |  SELECT 'orders.o_orderkey' AS candidate, COUNT(*) AS n,
        |    COUNT(DISTINCT o_orderkey) AS ndv FROM orders
        |  UNION ALL SELECT 'customer.c_custkey', COUNT(*),
        |    COUNT(DISTINCT c_custkey) FROM customer
        |  UNION ALL SELECT 'lineitem.l_orderkey', COUNT(*),
        |    COUNT(DISTINCT l_orderkey) FROM lineitem
        |  UNION ALL SELECT 'lineitem.(l_orderkey,l_linenumber)', COUNT(*),
        |    COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
        |  UNION ALL SELECT 'events.event_id', COUNT(*),
        |    COUNT(DISTINCT event_id) FROM events)
        |SELECT candidate, CAST(n AS BIGINT) AS n_rows, CAST(ndv AS BIGINT) AS ndv,
        |  CAST(n - ndv AS BIGINT) AS dup_rows, n = ndv AS is_unique
        |FROM c ORDER BY candidate""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def audit(df: org.apache.spark.sql.DataFrame, id: String,
          keys: org.apache.spark.sql.Column*) =
        df.agg(count(lit(1)).as("n"), countDistinct(keys.head, keys.tail: _*).as("ndv"))
          .select(lit(id).as("candidate"), col("n"), col("ndv"))
      audit(t.orders, "orders.o_orderkey", col("o_orderkey"))
        .unionAll(audit(t.customer, "customer.c_custkey", col("c_custkey")))
        .unionAll(audit(t.lineitem, "lineitem.l_orderkey", col("l_orderkey")))
        .unionAll(audit(t.lineitem, "lineitem.(l_orderkey,l_linenumber)",
          col("l_orderkey"), col("l_linenumber")))
        .unionAll(audit(t.events, "events.event_id", col("event_id")))
        .select(col("candidate"), col("n").as("n_rows"), col("ndv"),
          (col("n") - col("ndv")).as("dup_rows"), (col("n") === col("ndv")).as("is_unique"))
        .orderBy("candidate")
    },

    // SLO error-budget burn — the ops readout over the events stream:
    // daily error share (the fixture emits literal 'error' events) and
    // the trailing-7-day share, both as exact ppm, plus a burn flag at
    // 2× the 210000-ppm SLO. Day-grain aggregation first, the trailing
    // frame slides over ≤30 aggregate rows — the window never touches
    // event grain (q213's frame discipline).
    QueryDef.sql(
      "q239_slo_burn",
      """WITH d AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
        |  FROM events GROUP BY 1),
        |w AS (SELECT day, n, errs,
        |        SUM(n) OVER f AS n7, SUM(errs) OVER f AS errs7
        |      FROM d WINDOW f AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, CAST(errs * 1000000 // n AS BIGINT) AS day_err_ppm,
        |  CAST(errs7 * 1000000 // n7 AS BIGINT) AS week_err_ppm,
        |  errs7 * 1000000 // n7 > 420000 AS burn_2x
        |FROM w ORDER BY day""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errs"))
      val f = Window.orderBy("day").rowsBetween(-6, 0)
      d.select(col("day"),
          sum("n").over(f).as("n7"), sum("errs").over(f).as("errs7"),
          col("n"), col("errs"))
        .select(col("day"),
          expr("errs * 1000000L div n").as("day_err_ppm"),
          expr("errs7 * 1000000L div n7").as("week_err_ppm"),
          (expr("errs7 * 1000000L div n7") > 420000L).as("burn_2x"))
        .orderBy("day")
    },

    // Cascade-delete impact sizing — the right-to-be-forgotten estimate
    // run BEFORE any purge: for a deletion cohort (customers with
    // c_custkey % 101 = 0), how many orders and line items disappear and
    // how much revenue leaves which order priority. Two semi-join hops
    // (cohort → orders → lineitem) with the cohort broadcast down the
    // chain; nothing is deleted, everything is priced at aggregate
    // grain.
    QueryDef.sql(
      "q240_delete_impact",
      """WITH cohort AS (SELECT c_custkey FROM customer WHERE c_custkey % 101 = 0),
        |del_orders AS (
        |  SELECT o_orderkey, o_orderpriority FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM cohort))
        |SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COUNT(l_orderkey) AS BIGINT) AS n_lines,
        |  CAST(SUM(COALESCE(CAST(FLOOR(l_extendedprice * 100) AS BIGINT), 0)) AS BIGINT)
        |    AS revenue_c
        |FROM del_orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val cohort = t.customer.where(col("c_custkey") % 101 === 0).select("c_custkey")
      val delOrders = t.orders
        .join(broadcast(cohort), col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderpriority")
      delOrders
        .join(t.lineitem.select(col("l_orderkey"),
            floor(col("l_extendedprice") * 100).cast("long").as("cents")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy("o_orderpriority")
        .agg(countDistinct("o_orderkey").as("n_orders"),
          count("l_orderkey").as("n_lines"),
          sum(coalesce(col("cents"), lit(0L))).as("revenue_c"))
        .orderBy("o_orderpriority")
    },

    // Multi-touch linear attribution — q220's fairer sibling: each
    // purchase splits its cents equally across ALL same-user touches in
    // the prior 24 h, integer-exactly (cents div n per touch, remainder
    // to the most recent touch so credit sums to revenue TO THE CENT).
    // The purchase×touch pairing is an equi-join on user_id with the
    // 24 h predicate applied in the join condition — pair volume follows
    // touches-per-user×purchases-per-user, which activity retention
    // bounds; a pathological power-user key would take q113's
    // day-bucketized split or q217's salting.
    QueryDef.sql(
      "q241_linear_attribution",
      """WITH p AS (SELECT user_id, ts AS pts, event_id AS pid,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts AS tts, event_id AS tid, event_type AS channel
        |      FROM events WHERE event_type IN ('view', 'click', 'signup')),
        |pairs AS (
        |  SELECT p.user_id, pid, cents, channel, tts, tid
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE tts <= pts AND epoch_us(pts) - epoch_us(tts) <= 86400000000),
        |ranked AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY pid) AS n_touch,
        |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tts DESC, tid DESC) AS rk
        |  FROM pairs),
        |credit AS (
        |  SELECT channel,
        |    cents // n_touch + CASE WHEN rk = 1 THEN cents % n_touch ELSE 0 END AS cr
        |  FROM ranked)
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
        |  CAST(SUM(cr) AS BIGINT) AS credited_c
        |FROM credit GROUP BY 1 ORDER BY channel""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir).events
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"),
          floor(col("value") * 100).cast("long").as("cents"))
      val touches = ev.where(col("event_type").isin("view", "click", "signup"))
        .select(col("user_id").as("tuid"), col("ts").as("tts"),
          col("event_id").as("tid"), col("event_type").as("channel"))
      val pairs = p.join(touches,
        col("user_id") === col("tuid") && col("tts") <= col("pts") &&
          unix_micros(col("pts")) - unix_micros(col("tts")) <= 86400000000L)
      val wAll = Window.partitionBy("pid")
      val wRank = Window.partitionBy("pid").orderBy(col("tts").desc, col("tid").desc)
      pairs
        .withColumn("n_touch", count(lit(1)).over(wAll))
        .withColumn("rk", row_number().over(wRank))
        .select(col("channel"),
          (expr("cents div n_touch") +
            when(col("rk") === 1, expr("cents % n_touch")).otherwise(0L)).as("cr"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_credits"), sum("cr").as("credited_c"))
        .orderBy("channel")
    },

    // Layout A/B: single-dimension sort vs Z-order under zone-map
    // pruning — the experiment behind every OPTIMIZE ZORDER BY decision,
    // priced exactly: the same rows are assigned to 64 files under (a)
    // a quantity-range layout and (b) a Morton interleave of quantity ×
    // ship-day (q137's curve, q222's zone maps), and a 2-D predicate
    // (quantity band × date range) counts files and rows each layout
    // must scan. Single-dim is perfectly selective on quantity and
    // blind on date; Z splits selectivity across both — the numbers say
    // which wins for THIS predicate mix. One scan, both layouts stacked.
    QueryDef.sql(
      "q250_layout_ab", {
        val zbits = (0 until 6).map(i =>
          s"((qb >> $i) & 1) * ${1L << (2 * i + 1)} + ((db >> $i) & 1) * ${1L << (2 * i)}")
          .mkString(" + ")
        s"""WITH base AS (
           |  SELECT CAST(FLOOR(l_quantity) AS BIGINT) % 64 AS qb,
           |    LEAST(63, GREATEST(0,
           |      (CAST(FLOOR(epoch(l_shipdate) / 86400) AS BIGINT) - 9100) // 40)) AS db,
           |    CAST(FLOOR(epoch(l_shipdate) / 86400) AS BIGINT) AS d,
           |    CAST(FLOOR(l_quantity) AS BIGINT) AS q
           |  FROM lineitem),
           |z AS (SELECT q, d, qb AS file_q, ($zbits) // 64 AS file_z FROM base),
           |st AS (
           |  SELECT 'a_quantity_sort' AS layout, file_q AS file_id, q, d FROM z
           |  UNION ALL SELECT 'b_zorder', file_z, q, d FROM z),
           |bounds AS (
           |  SELECT CAST(FLOOR(epoch(TIMESTAMP '1997-01-01 00:00:00') / 86400) AS BIGINT) AS dlo,
           |    CAST(FLOOR(epoch(TIMESTAMP '1997-06-30 00:00:00') / 86400) AS BIGINT) AS dhi),
           |f AS (
           |  SELECT layout, file_id, COUNT(*) AS n_rows,
           |    MIN(q) AS minq, MAX(q) AS maxq, MIN(d) AS mind, MAX(d) AS maxd,
           |    SUM(CASE WHEN q BETWEEN 10 AND 19
           |          AND d BETWEEN (SELECT dlo FROM bounds) AND (SELECT dhi FROM bounds)
           |        THEN 1 ELSE 0 END) AS n_match
           |  FROM st GROUP BY 1, 2),
           |g AS (SELECT layout, file_id, n_rows, n_match,
           |        maxq >= 10 AND minq <= 19
           |          AND maxd >= (SELECT dlo FROM bounds)
           |          AND mind <= (SELECT dhi FROM bounds) AS scanned
           |      FROM f)
           |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           |  CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           |  CAST(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           |  CAST(SUM(n_match) AS BIGINT) AS rows_matching
           |FROM g GROUP BY 1 ORDER BY layout""".stripMargin
      }) { (s, dir) =>
      val base = Tables(s, dir).lineitem.select(
        (floor(col("l_quantity")).cast("long") % 64).as("qb"),
        least(lit(63L), greatest(lit(0L),
          expr("(CAST(FLOOR(unix_timestamp(l_shipdate) / 86400) AS BIGINT) - 9100) div 40")))
          .as("db"),
        floor(unix_timestamp(col("l_shipdate")) / 86400).cast("long").as("d"),
        floor(col("l_quantity")).cast("long").as("q"))
      val zval = (0 until 6).map { i =>
        (shiftright(col("qb"), i).bitwiseAND(1)) * lit(1L << (2 * i + 1)) +
          (shiftright(col("db"), i).bitwiseAND(1)) * lit(1L << (2 * i))
      }.reduce(_ + _)
      val z = base.select(col("q"), col("d"), col("qb").as("file_q"),
        (zval.cast("long") / 64).cast("long").as("file_z"))
      val st = z.select(lit("a_quantity_sort").as("layout"), col("file_q").as("file_id"),
          col("q"), col("d"))
        .unionAll(z.select(lit("b_zorder").as("layout"), col("file_z").as("file_id"),
          col("q"), col("d")))
      val dlo = floor(unix_timestamp(to_timestamp(lit("1997-01-01 00:00:00"))) / 86400)
        .cast("long")
      val dhi = floor(unix_timestamp(to_timestamp(lit("1997-06-30 00:00:00"))) / 86400)
        .cast("long")
      val f = st.groupBy("layout", "file_id")
        .agg(count(lit(1)).as("n_rows"), min("q").as("minq"), max("q").as("maxq"),
          min("d").as("mind"), max("d").as("maxd"),
          sum(when(col("q").between(10, 19) && col("d").between(dlo, dhi), 1L)
            .otherwise(0L)).as("n_match"))
        .withColumn("scanned",
          col("maxq") >= 10 && col("minq") <= 19 && col("maxd") >= dlo && col("mind") <= dhi)
      f.groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("scanned"), 1L).otherwise(0L)).as("files_scanned"),
          sum(when(col("scanned"), col("n_rows")).otherwise(0L)).as("rows_scanned"),
          sum("n_match").as("rows_matching"))
        .orderBy("layout")
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

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Lake-operations operators (round 4, q257+): the maintenance planning a
  * 100 TB table needs continuously — small-file compaction, shuffle-skew
  * pricing before a repartition, and iterative graph trimming. All
  * arithmetic integer-exact for the DuckDB differential gate.
  */
object OpsQueries {

  def all: Seq[QueryDef] = Seq(

    // Small-file compaction planner (sequential coalesce): files are
    // profiled at (partition, file) grain, then packed left-to-right into
    // output bins of ~1 MiB by flooring the running byte total BEFORE each
    // file — exactly how OPTIMIZE-style compaction walks a partition's
    // file list. Everything happens at the FILE grain: the per-partition
    // window orders |files-per-partition| rows, never data rows; the plan
    // (which files merge into which output) ships as metadata.
    QueryDef.sql(
      "q257_compaction_plan",
      """WITH f AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS part, o_custkey % 40 AS file_id,
        |    COUNT(*) * 64 AS bytes
        |  FROM orders GROUP BY 1, 2),
        |b AS (
        |  SELECT part, file_id, bytes,
        |    COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1048576
        |      AS bin
        |  FROM f)
        |SELECT part, CAST(bin AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_files_in,
        |  CAST(SUM(bytes) AS BIGINT) AS bytes_out
        |FROM b GROUP BY part, bin ORDER BY part, bin""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir).orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("part"),
          (col("o_custkey") % 40).as("file_id"))
        .agg((count(lit(1)) * 64).as("bytes"))
      f.withColumn("bin",
          expr("coalesce(sum(bytes) over (partition by part order by file_id " +
            "rows between unbounded preceding and 1 preceding), 0) div 1048576"))
        .groupBy("part", "bin")
        .agg(count(lit(1)).as("n_files_in"), sum("bytes").as("bytes_out"))
        .orderBy("part", "bin")
    },

    // Shuffle-balance pricing: before repartitioning a 100 TB fact on a
    // key, price the reducer histogram for candidate partition counts from
    // ONE scan — the portable hash assigns each row its hypothetical
    // reducer for p ∈ {8, 32}, and max/avg per p is the straggler factor
    // (1e6 = perfectly balanced). The reference sizes its chunk/thread
    // fan-out the same way from stats (SURVEY O3/O8); this is the shuffle
    // twin. Count grain: p × reducers ≤ 40 rows of metadata.
    QueryDef.sql(
      "q258_shuffle_balance",
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
        |    AS hv
        |  FROM lineitem),
        |r AS (
        |  SELECT p, hv % p AS reducer, COUNT(*) AS n
        |  FROM h CROSS JOIN (VALUES (8), (32)) t(p)
        |  GROUP BY 1, 2)
        |SELECT CAST(p AS BIGINT) AS parts,
        |  CAST(MAX(n) AS BIGINT) AS max_n, CAST(MIN(n) AS BIGINT) AS min_n,
        |  CAST(SUM(n) // p AS BIGINT) AS avg_n,
        |  CAST(MAX(n) * 1000000 // (SUM(n) // p) AS BIGINT) AS imbalance_ppm
        |FROM r GROUP BY p ORDER BY parts""".stripMargin) { (s, dir) =>
      import s.implicits._
      val h = Tables(s, dir).lineitem.select(
        conv(substring(md5(col("l_orderkey").cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      val r = h.crossJoin(Seq(8, 32).toDF("p"))
        .groupBy(col("p"), (col("hv") % col("p")).as("reducer"))
        .agg(count(lit(1)).as("n"))
      r.groupBy("p")
        .agg(max("n").as("max_n"), min("n").as("min_n"), sum("n").as("tot"))
        .select(col("p").cast("long").as("parts"), col("max_n"), col("min_n"),
          expr("tot div p").as("avg_n"),
          expr("max_n * 1000000 div (tot div p)").as("imbalance_ppm"))
        .orderBy("parts")
    },

    // k-core decomposition (k=3, three peeling rounds) over the co-order
    // part graph: each round drops nodes with degree < k and the edges
    // touching them — the standard degeneracy trim before community/
    // triangle analytics (q159's screen is the 0th round of exactly
    // this). One degree aggregate + two semi-joins per round; cost
    // follows the shrinking edge set, never |V|². The oracle unrolls the
    // same three rounds as chained CTEs.
    QueryDef.sql(
      "q259_kcore", {
        val edges =
          """p AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
            |  FROM lineitem a JOIN lineitem b
            |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            |  GROUP BY 1, 2 HAVING count(*) >= 2),
            |e0 AS MATERIALIZED (SELECT u, v FROM p UNION ALL SELECT v, u FROM p)"""
            .stripMargin
        val rounds = (1 to 3).map { i =>
          s"""k$i AS MATERIALIZED (SELECT u FROM e${i - 1} GROUP BY u
             |  HAVING COUNT(*) >= 3),
             |e$i AS MATERIALIZED (SELECT a.u, a.v FROM e${i - 1} a
             |  JOIN k$i x ON a.u = x.u JOIN k$i y ON a.v = y.u)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edges,
           |$rounds
           |SELECT round, n_nodes, n_edges FROM (
           |  SELECT CAST(1 AS BIGINT) AS round,
           |    CAST((SELECT COUNT(*) FROM k1) AS BIGINT) AS n_nodes,
           |    CAST((SELECT COUNT(*) // 2 FROM e1) AS BIGINT) AS n_edges
           |  UNION ALL SELECT 2, (SELECT COUNT(*) FROM k2),
           |    (SELECT COUNT(*) // 2 FROM e2)
           |  UNION ALL SELECT 3, (SELECT COUNT(*) FROM k3),
           |    (SELECT COUNT(*) // 2 FROM e3)) f
           |ORDER BY round""".stripMargin
      }) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      val p = li.select(col("l_orderkey"), col("l_partkey"))
        .join(li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("pk2")),
          col("l_orderkey") === col("ok2") && col("l_partkey") < col("pk2"))
        .groupBy(col("l_partkey").as("u"), col("pk2").as("v"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 2)
        .select("u", "v")
      var e = p.unionAll(p.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint(true)
      val out = (1 to 3).map { round =>
        val keep = e.groupBy("u").agg(count(lit(1)).as("d"))
          .where(col("d") >= 3).select("u").localCheckpoint(true)
        e = e.join(keep, Seq("u"), "left_semi")
          .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
          .localCheckpoint(true)
        val nNodes = keep.count()
        val nEdges = e.count() / 2
        (round.toLong, nNodes, nEdges)
      }
      import s.implicits._
      out.toDF("round", "n_nodes", "n_edges").orderBy("round")
    },

    // Orphan-file GC plan: a synthetic manifest (500 data files keyed
    // off part, bytes from aggregated retail cents) against three
    // snapshots of which only the newest two are retained; files
    // referenced by NO retained snapshot are orphans, priced per age
    // band. The live set is an anti-join of the manifest against the
    // union of retained snapshot references — the exact shape a table-
    // format GC (expire_snapshots + remove_orphan_files) runs at lake
    // scale, where the manifest join must stay equi and the snapshot
    // refs broadcast.
    QueryDef.sql(
      "q353_orphan_gc",
      """WITH files AS (SELECT p_partkey % 500 AS fid,
        |    SUM(CAST(FLOOR(p_retailprice * 100) AS BIGINT)) AS bytes
        |  FROM part GROUP BY 1),
        |live AS (SELECT fid FROM files WHERE fid % 3 <> 0
        |  UNION SELECT fid FROM files WHERE fid % 7 <> 1),
        |f AS (SELECT files.fid AS fid, bytes, files.fid % 4 AS age_band,
        |    CASE WHEN live.fid IS NULL THEN 1 ELSE 0 END AS orphan
        |  FROM files LEFT JOIN live ON files.fid = live.fid),
        |t AS (SELECT SUM(bytes) AS tb FROM f)
        |SELECT CAST(age_band AS BIGINT) AS age_band, COUNT(*) AS n_files,
        |  CAST(SUM(orphan) AS BIGINT) AS n_orphans,
        |  CAST(SUM(orphan * bytes) AS BIGINT) AS orphan_bytes,
        |  CAST(CAST(SUM(orphan * bytes) AS HUGEINT) * 1000000 // tb AS BIGINT)
        |    AS reclaim_ppm
        |FROM f, t GROUP BY age_band, tb ORDER BY age_band""".stripMargin) { (s, dir) =>
      val files = Tables(s, dir).part
        .groupBy((col("p_partkey") % 500).as("fid"))
        .agg(sum(floor(col("p_retailprice") * 100).cast("long")).as("bytes"))
      val live = files.where(col("fid") % 3 =!= 0).select("fid")
        .union(files.where(col("fid") % 7 =!= 1).select("fid")).distinct()
      val f = files.join(broadcast(live.select(col("fid").as("lfid"))),
          col("fid") === col("lfid"), "left_outer")
        .select(col("fid"), col("bytes"), (col("fid") % 4).as("age_band"),
          when(col("lfid").isNull, 1L).otherwise(0L).as("orphan"))
      val t = f.agg(sum("bytes").as("tb"))
      f.crossJoin(broadcast(t))
        .groupBy(col("age_band").cast("long").as("age_band"), col("tb"))
        .agg(count(lit(1)).as("n_files"), sum("orphan").as("n_orphans"),
          sum(col("orphan") * col("bytes")).as("orphan_bytes"))
        .select(col("age_band"), col("n_files"), col("n_orphans"), col("orphan_bytes"),
          expr("CAST(CAST(orphan_bytes AS DECIMAL(38,0)) * 1000000 div tb AS BIGINT)")
            .as("reclaim_ppm"))
        .orderBy("age_band")
    })
}

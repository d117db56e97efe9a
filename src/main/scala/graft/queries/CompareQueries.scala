package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.Canonical
import graft.operators.{ChunkPlanner, DataCompare, Perturb}

/** The data_compare / chunking operator family (SURVEY §2: A1-A4, J1/J4,
  * P1-P3, A7, U3) as verifiable queries. The DuckDB oracles rebuild the
  * same perturbed "target database" (Perturb.DstSql) and the same
  * canonical row strings, so every checksum/diff/repair value is checked
  * end to end.
  */
object CompareQueries {

  /** Range chunk id — floor(key / width): a static range partitioning both
    * engines compute identically (the planner's approxQuantile variant is
    * covered by ScalaTest; its bounds are estimate-dependent and thus not
    * oracle-reproducible).
    */
  private val chunkWidth = 4096
  private def chunkId(key: Column): Column =
    floor(key / chunkWidth).cast("long")
  private val chunkIdSql = s"CAST(FLOOR(l_orderkey / $chunkWidth) AS BIGINT)"

  /** SQL twin of Canonical.rowString over Perturb.CompareCols. */
  private val rowStrSql =
    """concat_ws('|',
      |  coalesce(l_orderkey::VARCHAR, '0'),
      |  coalesce(l_linenumber::VARCHAR, '0'),
      |  coalesce(CAST(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT) AS VARCHAR), '0'),
      |  coalesce(CAST(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT) AS VARCHAR), '0'),
      |  coalesce(l_returnflag, '0'),
      |  coalesce(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S.%f'), '0'))""".stripMargin

  // CAST(SUM(..) AS BIGINT): DuckDB sum(BIGINT) returns HUGEINT, which the
  // driver's hash treats as a distinct (decimal) type from Spark's int64.
  private def md5SumsSql(prefix: String = "") = (0 until 4).map { i =>
    s"CAST(SUM(('0x' || substr(md5(rowstr), ${i * 8 + 1}, 8))::BIGINT) AS BIGINT) AS ${prefix}md5_$i"
  }.mkString(",\n  ")

  private def src(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem.select(Perturb.CompareCols.map(col): _*)
  private def dst(s: SparkSession, dir: String): DataFrame =
    Perturb.perturbedLineitem(Tables(s, dir).lineitem)

  val all: Seq[QueryDef] = Seq(

    // A7/O3: equi-depth chunk bounds (ntile = the deterministic twin of
    // bucket synthesis, utils/structure/bucket.go:228-258).
    QueryDef.sql(
      "q10_chunk_plan",
      """SELECT chunk_id, COUNT(*) AS n_rows, MIN(l_orderkey) AS lo_key, MAX(l_orderkey) AS hi_key
        |FROM (SELECT l_orderkey,
        |        ntile(32) OVER (ORDER BY l_orderkey, l_linenumber) AS chunk_id
        |      FROM lineitem) t
        |GROUP BY chunk_id ORDER BY chunk_id""".stripMargin) { (s, dir) =>
      // NOT Window.orderBy(keys).ntile — that funnels every row through
      // ONE task. Distributed twin: range-repartitioned global rank
      // (Ranks.withGlobalRank) + exact NTILE arithmetic; identical result
      // since (orderkey, linenumber) is unique. RanksSpec pins parity
      // with the single-partition window.
      val li = Tables(s, dir).lineitem.select("l_orderkey", "l_linenumber")
      val (ranked, n) = graft.operators.Ranks
        .withGlobalRankAndTotal(li, Seq("l_orderkey", "l_linenumber"))
      ranked
        .select(col("l_orderkey"),
          graft.operators.Ranks.ntileFromRank(col("rank"), n, 32).as("chunk_id"))
        .groupBy("chunk_id")
        .agg(count(lit(1)).as("n_rows"),
          min("l_orderkey").as("lo_key"), max("l_orderkey").as("hi_key"))
        .orderBy("chunk_id")
    },

    // A1: DATABASE_ROWS method — per-chunk counts on both sides, one scan
    // per side, O(chunks) join.
    QueryDef.sql(
      "q11_compare_count",
      s"""WITH dst AS (${Perturb.DstSql}),
         |s AS (SELECT $chunkIdSql AS chunk_id, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
         |d AS (SELECT $chunkIdSql AS chunk_id, COUNT(*) AS cnt FROM dst GROUP BY 1)
         |SELECT coalesce(s.chunk_id, d.chunk_id) AS chunk_id,
         |  coalesce(s.cnt, 0) AS src_cnt, coalesce(d.cnt, 0) AS dst_cnt,
         |  CASE WHEN coalesce(s.cnt,0) = coalesce(d.cnt,0) THEN 'EQUAL' ELSE 'DIFF' END AS status
         |FROM s FULL OUTER JOIN d ON s.chunk_id = d.chunk_id
         |ORDER BY chunk_id""".stripMargin) { (s, dir) =>
      val sc = src(s, dir).groupBy(chunkId(col("l_orderkey")).as("chunk_id"))
        .agg(count(lit(1)).as("cnt"))
      val dc = dst(s, dir).groupBy(chunkId(col("l_orderkey")).as("chunk_id"))
        .agg(count(lit(1)).as("cnt"))
      sc.as("s").join(dc.as("d"), Seq("chunk_id"), "full_outer")
        .select(col("chunk_id"),
          coalesce(col("s.cnt"), lit(0L)).as("src_cnt"),
          coalesce(col("d.cnt"), lit(0L)).as("dst_cnt"),
          when(coalesce(col("s.cnt"), lit(0L)) === coalesce(col("d.cnt"), lit(0L)), "EQUAL")
            .otherwise("DIFF").as("status"))
        .orderBy("chunk_id")
    },

    // A2: DATABASE_MD5 method — 4×8-hex-slice sums per chunk
    // (data_compare_row.go:1527-1552), partial-aggregated map-side.
    QueryDef.sql(
      "q12_compare_md5",
      s"""SELECT chunk_id, COUNT(*) AS cnt,
         |  ${md5SumsSql()}
         |FROM (SELECT $chunkIdSql AS chunk_id, $rowStrSql AS rowstr FROM lineitem) t
         |GROUP BY chunk_id ORDER BY chunk_id""".stripMargin) { (s, dir) =>
      val df  = src(s, dir)
      val row = Canonical.rowString(df, Perturb.CompareCols)
      df.groupBy(chunkId(col("l_orderkey")).as("chunk_id"))
        .agg(count(lit(1)).as("cnt"),
          graft.functions.Checksums.md5SplitSums(row): _*)
        .orderBy("chunk_id")
    },

    // A2+U3: chunk status classification across src/dst — the compare
    // pipeline's chunk verdict table.
    QueryDef.sql(
      "q13_compare_chunks",
      s"""WITH dst AS (${Perturb.DstSql}),
         |s AS (SELECT $chunkIdSql AS chunk_id, COUNT(*) AS cnt, ${md5SumsSql()}
         |      FROM (SELECT *, $rowStrSql AS rowstr FROM lineitem) GROUP BY chunk_id),
         |d AS (SELECT $chunkIdSql AS chunk_id, COUNT(*) AS cnt, ${md5SumsSql()}
         |      FROM (SELECT *, $rowStrSql AS rowstr FROM dst) GROUP BY chunk_id)
         |SELECT coalesce(s.chunk_id, d.chunk_id) AS chunk_id,
         |  coalesce(s.cnt, 0) AS src_cnt, coalesce(d.cnt, 0) AS dst_cnt,
         |  CASE WHEN s.cnt IS NULL THEN 'DST_ONLY'
         |       WHEN d.cnt IS NULL THEN 'SRC_ONLY'
         |       WHEN s.cnt = d.cnt AND s.md5_0 = d.md5_0 AND s.md5_1 = d.md5_1
         |            AND s.md5_2 = d.md5_2 AND s.md5_3 = d.md5_3 THEN 'EQUAL'
         |       ELSE 'DIFF' END AS status
         |FROM s FULL OUTER JOIN d ON s.chunk_id = d.chunk_id
         |ORDER BY chunk_id""".stripMargin) { (s, dir) =>
      DataCompare.compareChunks(
        src(s, dir), dst(s, dir), chunkId(col("l_orderkey")), Perturb.CompareCols)
        .orderBy("chunk_id")
    },

    // J1/U1: multiset row diff via exceptAll, rescans restricted to the
    // mismatched chunks (broadcast semi join) — identical result to the
    // oracle's unrestricted EXCEPT ALL because equal chunks diff to ∅.
    QueryDef.sql(
      "q14_row_diff",
      s"""WITH dst AS (${Perturb.DstSql}),
         |sp AS (SELECT * FROM lineitem_cols EXCEPT ALL SELECT * FROM dst),
         |dp AS (SELECT * FROM dst EXCEPT ALL SELECT * FROM lineitem_cols)
         |SELECT * FROM (
         |  SELECT 'ADD' AS side, * FROM sp UNION ALL SELECT 'DEL' AS side, * FROM dp)
         |ORDER BY side, l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_shipdate"""
        .stripMargin
        .replace("lineitem_cols",
          s"(SELECT ${Perturb.CompareCols.mkString(", ")} FROM lineitem)")) { (s, dir) =>
      // mismatched chunk ids are O(chunks) metadata — collect them and turn
      // each into a PUSHABLE key-range predicate (dynamic-partition-pruning
      // shape): the rescan then reads only the mismatched key ranges'
      // row groups instead of semi-joining the full scan. Equal chunks diff
      // to ∅, so the result is identical to the unrestricted EXCEPT ALL.
      // Screening uses the raw-column xxhash64 sum (no canonical render,
      // no md5): which-chunks-differ needs any exact hash, not the
      // reportable md5 method.
      val mismatched = DataCompare.fastMismatchedChunkIds(
        src(s, dir), dst(s, dir), chunkId(col("l_orderkey")), Perturb.CompareCols)
      val pred = mismatched
        .map(c => col("l_orderkey") >= c * chunkWidth && col("l_orderkey") < (c + 1) * chunkWidth)
        .reduceOption(_ || _).getOrElse(lit(false))
      val diff = DataCompare.rowDiff(
        src(s, dir).where(pred), dst(s, dir).where(pred), Perturb.CompareCols)
      diff.select((col("side") +: Perturb.CompareCols.map(col)): _*)
        .orderBy("side", "l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
    },

    // J4: repair statement generation from the diff rows
    // (data_compare_row.go:1289-1340, processor_translate_mysql.go:70-95).
    QueryDef.sql(
      "q15_repair_sql",
      s"""WITH dst AS (${Perturb.DstSql}),
         |li AS (SELECT ${Perturb.CompareCols.mkString(", ")} FROM lineitem),
         |sp AS (SELECT * FROM li EXCEPT ALL SELECT * FROM dst),
         |dp AS (SELECT * FROM dst EXCEPT ALL SELECT * FROM li),
         |diff AS (SELECT 'ADD' AS side, * FROM sp UNION ALL SELECT 'DEL' AS side, * FROM dp),
         |canon AS (SELECT side,
         |  coalesce(l_orderkey::VARCHAR,'0') AS v1, coalesce(l_linenumber::VARCHAR,'0') AS v2,
         |  coalesce(CAST(CAST(FLOOR(l_quantity*10000.0) AS BIGINT) AS VARCHAR),'0') AS v3,
         |  coalesce(CAST(CAST(FLOOR(l_extendedprice*10000.0) AS BIGINT) AS VARCHAR),'0') AS v4,
         |  coalesce(l_returnflag,'0') AS v5,
         |  coalesce(strftime(l_shipdate,'%Y-%m-%d %H:%M:%S.%f'),'0') AS v6
         | FROM diff)
         |SELECT side, CASE WHEN side = 'ADD' THEN
         |  'INSERT INTO lineitem (l_orderkey,l_linenumber,l_quantity,l_extendedprice,l_returnflag,l_shipdate) VALUES ('
         |    || '''' || v1 || ''',''' || v2 || ''',''' || v3 || ''',''' || v4 || ''',''' || v5 || ''',''' || v6 || ''')'
         |  ELSE
         |  'DELETE FROM lineitem WHERE '
         |    || 'l_orderkey=''' || v1 || ''' AND l_linenumber=''' || v2 || ''' AND l_quantity=''' || v3
         |    || ''' AND l_extendedprice=''' || v4 || ''' AND l_returnflag=''' || v5 || ''' AND l_shipdate=''' || v6 || ''''
         |  END AS stmt
         |FROM canon ORDER BY side, stmt""".stripMargin) { (s, dir) =>
      // no chunk screen here: the fixture's perturbations are uniform over
      // the key space, so every chunk mismatches and a screen pass could
      // never prune — repair generation goes straight to the diff (q14
      // keeps the screen-then-rescan shape the reference always runs).
      val diff = DataCompare.rowDiff(src(s, dir), dst(s, dir), Perturb.CompareCols)
      DataCompare.repairSql(diff, "lineitem", Perturb.CompareCols)
        .orderBy("side", "stmt")
    },

    // U3: table rollup — equal_chunks vs chunk_totals verdict
    // (data_compare_task.go:640-744).
    QueryDef.sql(
      "q16_table_summary",
      s"""WITH dst AS (${Perturb.DstSql}),
         |s AS (SELECT $chunkIdSql AS chunk_id, COUNT(*) AS cnt, ${md5SumsSql()}
         |      FROM (SELECT *, $rowStrSql AS rowstr FROM lineitem) GROUP BY chunk_id),
         |d AS (SELECT $chunkIdSql AS chunk_id, COUNT(*) AS cnt, ${md5SumsSql()}
         |      FROM (SELECT *, $rowStrSql AS rowstr FROM dst) GROUP BY chunk_id),
         |st AS (SELECT coalesce(s.chunk_id, d.chunk_id) AS chunk_id,
         |    coalesce(s.cnt,0) AS src_cnt, coalesce(d.cnt,0) AS dst_cnt,
         |    CASE WHEN s.cnt IS NULL THEN 'DST_ONLY' WHEN d.cnt IS NULL THEN 'SRC_ONLY'
         |         WHEN s.cnt = d.cnt AND s.md5_0 = d.md5_0 AND s.md5_1 = d.md5_1
         |              AND s.md5_2 = d.md5_2 AND s.md5_3 = d.md5_3 THEN 'EQUAL'
         |         ELSE 'DIFF' END AS status
         |  FROM s FULL OUTER JOIN d ON s.chunk_id = d.chunk_id)
         |SELECT COUNT(*) AS chunk_totals,
         |  CAST(SUM(CASE WHEN status = 'EQUAL' THEN 1 ELSE 0 END) AS BIGINT) AS equal_chunks,
         |  CAST(SUM(src_cnt) AS BIGINT) AS src_rows, CAST(SUM(dst_cnt) AS BIGINT) AS dst_rows,
         |  CASE WHEN SUM(CASE WHEN status='EQUAL' THEN 1 ELSE 0 END) = COUNT(*)
         |       THEN 'EQUAL' ELSE 'NOT_EQUAL' END AS table_status
         |FROM st""".stripMargin) { (s, dir) =>
      DataCompare.tableSummary(
        DataCompare.compareChunks(
          src(s, dir), dst(s, dir), chunkId(col("l_orderkey")), Perturb.CompareCols))
    },

    // P1/P2: canonicalizing projection incl. the NULL-sentinel convention
    // (NVL(c,'0') with empty-string ≠ NULL, processor_common_oracle.go:133).
    QueryDef.sql(
      "q17_canonical_project",
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(CASE WHEN l_orderkey % 10 = 0 THEN NULL ELSE l_returnflag END, '0') AS c_flag,
        |  coalesce(CAST(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT) AS VARCHAR), '0') AS c_qty,
        |  regexp_replace(regexp_replace(CAST(CAST(l_quantity AS DECIMAL(12,4)) AS VARCHAR),
        |    '(\.\d*?)0+$', '\1'), '\.$', '') AS c_dec,
        |  coalesce(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S.%f'), '0') AS c_shipdate,
        |  upper(md5(l_returnflag)) AS c_hash
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.StringType
      val li = Tables(s, dir).lineitem
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        Canonical.canonical(
          when(col("l_orderkey") % 10 === 0, lit(null).cast(StringType))
            .otherwise(col("l_returnflag")), StringType).as("c_flag"),
        Canonical.canonical(col("l_quantity"), org.apache.spark.sql.types.DoubleType).as("c_qty"),
        Canonical.decimalText(col("l_quantity").cast("decimal(12,4)")).as("c_dec"),
        Canonical.canonical(col("l_shipdate"), li.schema("l_shipdate").dataType).as("c_shipdate"),
        upper(md5(col("l_returnflag"))).as("c_hash"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A3/A4: CRC32 chunk checksums with uint32 wraparound — DuckDB has no
    // crc32, so this is a rows-only contract check; exact-value coverage
    // lives in ChecksumSpec (ScalaTest).
    // A3: CRC32 chunk checksums — FULL value oracle as of r5. DuckDB has
    // no crc32 builtin, so the oracle computes IEEE CRC-32 from first
    // principles in SQL: a recursive CTE derives the 256-entry
    // reflected-polynomial table (8 halving rounds per entry, poly
    // 0xEDB88320), then a second recursion walks every row string one
    // byte per step (crc' = table[(crc ⊕ byte) & 0xFF] ⊕ (crc >> 8)).
    // Recursion depth = max row-string length (~60), each step one
    // 256-row lookup join — exact, engine-independent, and it upgrades
    // the last checksum from rows-only to value-checked.
    QueryDef.sql(
      "q18_compare_crc32",
      s"""WITH RECURSIVE
         |lut_it(i, r, c) AS (
         |  SELECT i, 0, CAST(i AS BIGINT) FROM range(256) t(i)
         |  UNION ALL
         |  SELECT i, r + 1,
         |    CASE WHEN c % 2 = 1 THEN xor(3988292384, c // 2) ELSE c // 2 END
         |  FROM lut_it WHERE r < 8),
         |lut(i, v) AS (SELECT i, c FROM lut_it WHERE r = 8),
         |rows0 AS (SELECT $chunkIdSql AS chunk_id, $rowStrSql AS rowstr FROM lineitem),
         |walk(chunk_id, hx, len, pos, crc) AS (
         |  SELECT chunk_id, hex(rowstr::BLOB), octet_length(rowstr::BLOB), 0,
         |    CAST(4294967295 AS BIGINT)
         |  FROM rows0
         |  UNION ALL
         |  SELECT w.chunk_id, w.hx, w.len, w.pos + 1, xor(l.v, w.crc // 256)
         |  FROM walk w JOIN lut l
         |    ON l.i = xor(w.crc % 256, ('0x' || substr(w.hx, w.pos * 2 + 1, 2))::BIGINT)
         |  WHERE w.pos < w.len)
         |SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  CAST(SUM(xor(crc, 4294967295)) % 4294967296 AS BIGINT) AS crc32
         |FROM walk WHERE pos = len
         |GROUP BY chunk_id ORDER BY chunk_id""".stripMargin) { (s, dir) =>
      val df  = src(s, dir)
      val row = Canonical.rowString(df, Perturb.CompareCols)
      df.groupBy(chunkId(col("l_orderkey")).as("chunk_id"))
        .agg(count(lit(1)).as("cnt"),
          graft.functions.Checksums.crc32WrapSum(row).as("crc32"))
        .orderBy("chunk_id")
    },

    // P4: user compare-condition/where-range appended to the chunk
    // predicate (data_compare_rule.go:674-708) — both filters reach the
    // parquet scan as PushedFilters.
    QueryDef.sql(
      "q19_where_range",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey >= 4096 AND l_orderkey < 12288
        |  AND l_quantity > 30 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .where(col("l_orderkey") >= 4096 && col("l_orderkey") < 12288) // chunk range
        .where(col("l_quantity") > 30 && col("l_returnflag") === "R")  // user range
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P8: abnormal-data seek — after a chunk mismatch the reference
    // rescans with DUMP()-style ASCII probes per column to locate garbled
    // bytes (data_compare_scan.go:420-690). Native form: non-ASCII probe
    // columns over the text corpus.
    QueryDef.sql(
      "q33_abnormal_seek",
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN regexp_matches(text, '[^\x00-\x7f]') THEN 1 ELSE 0 END) AS BIGINT) AS n_nonascii_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[^\x00-\x7f]'))) AS BIGINT) AS n_nonascii_chars,
        |  CAST(SUM(CASE WHEN text LIKE '%?%' THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement_marks
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("text").rlike("[^\\x00-\\x7f]"), 1L).otherwise(0L)).as("n_nonascii_docs"),
          sum(expr("size(regexp_extract_all(text, '[^\\\\x00-\\\\x7f]', 0))").cast("long")).as("n_nonascii_chars"),
          sum(when(col("text").contains("?"), 1L).otherwise(0L)).as("n_replacement_marks"))
        .orderBy("source")
    },

    // W1: in-bucket random-N sampling — ROW_NUMBER() OVER (ORDER BY
    // random) ≤ limit (database/oracle/data_compare.go:283-330). The
    // "random" order is a portable md5-derived key (the reference's
    // DBMS_RANDOM only needs an arbitrary-but-uniform order), so the
    // sample is engine-reproducible and fully oracle-checked; a seeded
    // rand(42) variant lives in RanksSpec for the non-portable path.
    QueryDef.sql(
      "q34_sample_window",
      s"""SELECT chunk_id, l_orderkey, l_linenumber, rn FROM (
         |  SELECT $chunkIdSql AS chunk_id, l_orderkey, l_linenumber,
         |    ROW_NUMBER() OVER (PARTITION BY $chunkIdSql
         |      ORDER BY ('0x' || substr(md5(l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR), 1, 8))::BIGINT,
         |               l_orderkey, l_linenumber) AS rn
         |  FROM lineitem) t
         |WHERE rn <= 5 ORDER BY chunk_id, rn""".stripMargin) { (s, dir) =>
      val rkey = conv(substring(md5(
        concat_ws("_", col("l_orderkey"), col("l_linenumber"))), 1, 8), 16, 10).cast("long")
      val w = Window.partitionBy(chunkId(col("l_orderkey")))
        .orderBy(rkey, col("l_orderkey"), col("l_linenumber"))
      Tables(s, dir).lineitem
        .select(chunkId(col("l_orderkey")).as("chunk_id"),
          col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).cast("long").as("rn"))
        .where(col("rn") <= 5)
        .orderBy("chunk_id", "rn")
    },

    // Charset conversion (P7, now REAL — not just garbled-replace): the
    // reference's ZHS16GBK→AL32UTF8 migration leg. Spark decodes the GBK
    // byte payloads with the codegen'd decode()/encode() builtins
    // (Canonical.convertCharset — no UDF); the oracle carries the
    // EXPECTED Unicode text and UTF-8 hex computed independently (Python
    // gbk/utf-8 codecs at authoring time), so the differential proves
    // the JVM's GBK table agrees with CPython's byte-for-byte. Payloads
    // cover pure CJK, mixed CJK/ASCII, and pure-ASCII passthrough.
    QueryDef.sql(
      "q572_charset_convert",
      """WITH src(id, gbk_hex, expected_text, expected_utf8_hex, expected_chars) AS (VALUES
        |  (1, 'CAFDBEDDBFE2C7A8D2C6', '数据库迁移', 'E695B0E68DAEE5BA93E8BF81E7A7BB', 5),
        |  (2, 'D0A3D1E9BACDD2BBD6C2', '校验和一致', 'E6A0A1E9AA8CE5928CE4B880E887B4', 5),
        |  (3, 'D0D4C4DCBBF9D7BC', '性能基准', 'E680A7E883BDE59FBAE58786', 4),
        |  (4, '4D6978656420D6D0D3A22074657874', 'Mixed 中英 text', '4D6978656420E4B8ADE88BB12074657874', 13),
        |  (5, '616263313233', 'abc123', '616263313233', 6))
        |SELECT CAST(id AS BIGINT) AS id, expected_text AS text,
        |  expected_utf8_hex AS utf8_hex,
        |  CAST(expected_chars AS BIGINT) AS n_chars
        |FROM src ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val src = Seq(
        1L -> "CAFDBEDDBFE2C7A8D2C6",
        2L -> "D0A3D1E9BACDD2BBD6C2",
        3L -> "D0D4C4DCBBF9D7BC",
        4L -> "4D6978656420D6D0D3A22074657874",
        5L -> "616263313233").toDF("id", "gbk_hex")
      src.select(col("id"),
          Canonical.decodeCharset(unhex(col("gbk_hex")), "GBK").as("text"),
          hex(Canonical.convertCharset(unhex(col("gbk_hex")), "GBK", "UTF-8"))
            .as("utf8_hex"),
          length(Canonical.decodeCharset(unhex(col("gbk_hex")), "GBK"))
            .cast("long").as("n_chars"))
        .orderBy("id")
    },

    // Charset breadth 1/2 (P7): BIG5→UTF-8, the reference's traditional-
    // Chinese migration charset (`utils/constant/migrate.go:41-46`,
    // MigrateDataSupportCharset). Same differential contract as q572: the
    // oracle carries expected text + UTF-8 hex computed independently
    // (CPython big5/utf-8 codecs at authoring time), proving the JVM's
    // Big5 table agrees byte-for-byte. Pure projection — codegen'd
    // decode/encode, no UDF.
    QueryDef.sql(
      "q596_charset_big5",
      """WITH src(id, big5_hex, expected_text, expected_utf8_hex, expected_chars) AS (VALUES
        |  (1, 'B8EAAEC6AE77BE45B2BE', '資料庫遷移', 'E8B387E69699E5BAABE981B7E7A7BB', 5),
        |  (2, 'AED5C5E7A94DA440AD50', '校驗和一致', 'E6A0A1E9A997E5928CE4B880E887B4', 5),
        |  (3, 'AEC4AFE0B0F2B7C7', '效能基準', 'E69588E883BDE59FBAE6BA96', 4),
        |  (4, '4D6978656420A4A4AD5E2074657874', 'Mixed 中英 text', '4D6978656420E4B8ADE88BB12074657874', 13),
        |  (5, '616263313233', 'abc123', '616263313233', 6))
        |SELECT CAST(id AS BIGINT) AS id, expected_text AS text,
        |  expected_utf8_hex AS utf8_hex,
        |  CAST(expected_chars AS BIGINT) AS n_chars
        |FROM src ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val src = Seq(
        1L -> "B8EAAEC6AE77BE45B2BE",
        2L -> "AED5C5E7A94DA440AD50",
        3L -> "AEC4AFE0B0F2B7C7",
        4L -> "4D6978656420A4A4AD5E2074657874",
        5L -> "616263313233").toDF("id", "big5_hex")
      src.select(col("id"),
          Canonical.decodeCharset(unhex(col("big5_hex")), "Big5").as("text"),
          hex(Canonical.convertCharset(unhex(col("big5_hex")), "Big5", "UTF-8"))
            .as("utf8_hex"),
          length(Canonical.decodeCharset(unhex(col("big5_hex")), "Big5"))
            .cast("long").as("n_chars"))
        .orderBy("id")
    },

    // Charset breadth 2/2 (P7): GB18030→UTF-8 — the mandatory-in-PRC
    // superset of GBK whose 4-byte sequences reach the supplementary
    // planes; row 3 carries U+20000 (𠀀, GB18030 bytes 95328236) so the
    // differential pins the 4-byte decode path, and row 2 the euro sign
    // (the GBK/GB18030 split point). Same independent-oracle contract as
    // q572/q596.
    QueryDef.sql(
      "q597_charset_gb18030",
      """WITH src(id, gb_hex, expected_text, expected_utf8_hex, expected_chars) AS (VALUES
        |  (1, 'CAFDBEDDBFE2C7A8D2C6', '数据库迁移', 'E695B0E68DAEE5BA93E8BF81E7A7BB', 5),
        |  (2, 'C5B7D4AAA2E3B7FBBAC5', '欧元€符号', 'E6ACA7E58583E282ACE7ACA6E58FB7', 5),
        |  (3, 'D4F6B2B995328236C6BDC3E6', '增补𠀀平面', 'E5A29EE8A1A5F0A08080E5B9B3E99DA2', 5),
        |  (4, '4D6978656420D6D0D3A22074657874', 'Mixed 中英 text', '4D6978656420E4B8ADE88BB12074657874', 13),
        |  (5, '616263313233', 'abc123', '616263313233', 6))
        |SELECT CAST(id AS BIGINT) AS id, expected_text AS text,
        |  expected_utf8_hex AS utf8_hex,
        |  CAST(expected_chars AS BIGINT) AS n_chars
        |FROM src ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val src = Seq(
        1L -> "CAFDBEDDBFE2C7A8D2C6",
        2L -> "C5B7D4AAA2E3B7FBBAC5",
        3L -> "D4F6B2B995328236C6BDC3E6",
        4L -> "4D6978656420D6D0D3A22074657874",
        5L -> "616263313233").toDF("id", "gb_hex")
      src.select(col("id"),
          Canonical.decodeCharset(unhex(col("gb_hex")), "GB18030").as("text"),
          hex(Canonical.convertCharset(unhex(col("gb_hex")), "GB18030", "UTF-8"))
            .as("utf8_hex"),
          length(Canonical.decodeCharset(unhex(col("gb_hex")), "GB18030"))
            .cast("long").as("n_chars"))
        .orderBy("id")
    },
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Canonical, Checksums}

/** The data_compare taskflow re-expressed as Spark plans (SURVEY §3.1,
  * J1/J2/J4, A1-A4, U3; `database/taskflow/data_compare.go`,
  * `database/processor/data_compare_row.go`).
  *
  * Reference shape: per chunk, run COUNT/MD5-sum/CRC32-sum on both
  * databases concurrently; on mismatch, rescan the chunk rows into
  * `map[row]count` multisets, diff them (`Cmp`, data_compare_row.go:2131),
  * and emit INSERT/DELETE repair SQL.
  *
  * Spark-first shape (designed for 100 TB):
  *  1. chunk id is a column; ONE pass per side computes every chunk's
  *     (count, checksum) via partial aggregation — rows collapse to one
  *     per chunk map-side, so the shuffle is O(chunks), not O(rows);
  *  2. chunk statuses come from one broadcast-able full-outer join on
  *     chunk_id (O(chunks) rows on both sides);
  *  3. the row-level rescan is restricted to mismatched chunks with a
  *     broadcast semi-join filter before the expensive exceptAll — at a
  *     0.1% mismatch rate the rescan reads 0.1% of chunks, mirroring the
  *     reference's only-failed-chunks Resume (O9);
  *  4. `exceptAll` keeps multiset semantics (duplicate counts) exactly as
  *     `Cmp`'s sv-dv arithmetic does.
  */
object DataCompare {

  /** Per-chunk (count, crc32-wrap-sum, 4×md5-split-sum) in one pass. */
  def chunkChecksums(df: DataFrame, chunkId: Column, cols: Seq[String]): DataFrame = {
    val row = Canonical.rowString(df, cols)
    df.groupBy(chunkId.as("chunk_id"))
      .agg(
        count(lit(1)).as("cnt"),
        Checksums.crc32WrapSum(row).as("crc32") +:
          Checksums.md5SplitSums(row): _*)
  }

  /** Chunk status table: full-outer join of the two sides' checksum rows,
    * classified EQUAL / DIFF / SRC_ONLY / DST_ONLY (U3 rollup input).
    */
  def compareChunks(src: DataFrame, dst: DataFrame, chunkId: Column, cols: Seq[String]): DataFrame = {
    val s = chunkChecksums(src, chunkId, cols)
    val d = chunkChecksums(dst, chunkId, cols)
    val joined = s.as("s").join(d.as("d"), Seq("chunk_id"), "full_outer")
    val eqCols = Seq("cnt", "crc32", "md5_0", "md5_1", "md5_2", "md5_3")
      .map(c => col(s"s.$c") === col(s"d.$c"))
      .reduce(_ && _)
    joined.select(
      col("chunk_id"),
      coalesce(col("s.cnt"), lit(0L)).as("src_cnt"),
      coalesce(col("d.cnt"), lit(0L)).as("dst_cnt"),
      when(col("s.cnt").isNull, "DST_ONLY")
        .when(col("d.cnt").isNull, "SRC_ONLY")
        .when(eqCols, "EQUAL")
        .otherwise("DIFF").as("status"))
  }

  /** Multiset row diff (J1): rows to add to dst (src∖dst) and rows to
    * delete from dst (dst∖src), duplicate-count aware via exceptAll.
    * `mismatchedChunks` restricts the rescan (left-semi on chunk_id).
    */
  def rowDiff(
      src: DataFrame,
      dst: DataFrame,
      cols: Seq[String],
      chunkId: Option[Column] = None,
      mismatchedChunks: Option[DataFrame] = None): DataFrame = {
    def restrict(df: DataFrame): DataFrame = (chunkId, mismatchedChunks) match {
      case (Some(cid), Some(mc)) =>
        df.withColumn("__chunk", cid)
          .join(broadcast(mc.select(col("chunk_id").as("__chunk"))), Seq("__chunk"), "left_semi")
          .drop("__chunk")
      case _ => df
    }
    val s = restrict(src).select(cols.map(col): _*)
    val d = restrict(dst).select(cols.map(col): _*)
    s.exceptAll(d).withColumn("side", lit("ADD"))
      .unionAll(d.exceptAll(s).withColumn("side", lit("DEL")))
  }

  /** Repair statement generation (J4, `data_compare_row.go:1289-1340`):
    * ADD → INSERT INTO target, DEL → DELETE FROM target, values rendered
    * through the canonical formatter.
    */
  def repairSql(diff: DataFrame, table: String, cols: Seq[String]): DataFrame = {
    val schema = diff.schema
    def render(n: String): Column = {
      val c = Canonical.canonical(col(n), schema(n).dataType)
      concat(lit("'"), c, lit("'"))
    }
    val insertVals = concat_ws(",", cols.map(render): _*)
    val wherePred  = concat_ws(" AND ", cols.map(n => concat(lit(n + "="), render(n))): _*)
    diff.select(
      col("side"),
      when(col("side") === "ADD",
        concat(lit(s"INSERT INTO $table (${cols.mkString(",")}) VALUES ("), insertVals, lit(")")))
        .otherwise(concat(lit(s"DELETE FROM $table WHERE "), wherePred)).as("stmt"))
  }

  /** Table-level rollup (U3, `data_compare_task.go:640-744`): a table is
    * EQUAL iff every chunk is EQUAL.
    */
  def tableSummary(chunkStatus: DataFrame): DataFrame =
    chunkStatus.agg(
      count(lit(1)).as("chunk_totals"),
      sum(when(col("status") === "EQUAL", 1L).otherwise(0L)).as("equal_chunks"),
      sum(col("src_cnt")).as("src_rows"),
      sum(col("dst_cnt")).as("dst_rows"))
      .withColumn("table_status",
        when(col("equal_chunks") === col("chunk_totals"), "EQUAL").otherwise("NOT_EQUAL"))
}

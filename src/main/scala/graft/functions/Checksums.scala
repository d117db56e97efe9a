package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chunk-checksum vocabulary (SURVEY A2/A3/A4).
  *
  * The reference pushes these into the source databases as generated SQL
  * (`data_compare_row.go:548-591`, `1527-1577`); here they are native
  * codegen'd Column expressions, aggregated map-side first (partial
  * aggregation) so a 100 TB scan reduces to one row per chunk before the
  * shuffle.
  */
object Checksums {

  /** DATABASE_MD5 method: md5 hex split into 4×8 chars, each parsed as a
    * 32-bit hex int and summed — commutative, so chunk order is free.
    * Mirrors `data_compare_row.go:1527-1552` (SUM over TO_NUMBER(SUBSTR(
    * MD5_HEX, 8k+1, 8), 'xxxxxxxx')).
    */
  def md5Split(rowStr: Column): Seq[Column] =
    (0 until 4).map { i =>
      conv(substring(md5(rowStr), i * 8 + 1, 8), 16, 10).cast("long")
    }

  def md5SplitSums(rowStr: Column): Seq[Column] =
    md5Split(rowStr).zipWithIndex.map { case (c, i) => sum(c).as(s"md5_$i") }

  /** DATABASE_CRC32 / PROGRAM_CRC32 method: per-row CRC32 summed with
    * uint32 wraparound (`database/mysql/data_compare.go:473-598` — Go's
    * uint32 addition wraps; reproduced exactly by mod 2^32, SURVEY §7.3.3).
    */
  def crc32WrapSum(rowStr: Column): Column =
    sum(crc32(rowStr)) % lit(4294967296L)

  /** Row-multiset fingerprint for the PROGRAM_* fallback: the reference
    * builds `map[rowString]count` client-side (A4); distributed form is a
    * groupBy-count over the canonical row string.
    */
  def rowMultiset(df: org.apache.spark.sql.DataFrame, rowStr: Column): org.apache.spark.sql.DataFrame =
    df.groupBy(rowStr.as("row_str")).count()
}

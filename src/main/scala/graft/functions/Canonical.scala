package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonicalizing projection library — the Spark re-expression of the
  * reference's per-column select-list generation (SURVEY P1/P2;
  * `database/processor/processor_common_oracle.go:71-246`,
  * `processor_common_mysql.go:27-286`). The reference renders every value
  * to a portable string on the database side so two heterogeneous engines
  * can be compared textually; here both sides are Spark plans, so one
  * shared `Column` library guarantees consistency by construction.
  *
  * Conventions replicated from the reference:
  *  - NULL → literal "0" sentinel via coalesce (`NVL(c,'0')`,
  *    processor_common_oracle.go:133-136) while empty string stays "" —
  *    the Oracle-''-vs-MySQL-NULL distinction (data_compare.go:531-535);
  *  - temporal → fixed `yyyy-MM-dd HH:mm:ss.SSSSSS` text
  *    (TO_CHAR ... hh24:mi:ss.ff6, processor_common_oracle.go:99-121);
  *  - binary → upper(md5) (DBMS_CRYPTO.HASH, processor_common_oracle.go:219-223);
  *  - fractional numerics → fixed-point text at an explicit scale. The
  *    reference pipes everything through shopspring/decimal; for doubles we
  *    scale-and-floor to integers first (see CoreQueries.dsum rationale:
  *    IEEE-deterministic across engines, no rounding-mode ambiguity).
  */
object Canonical {

  val NullSentinel = "0"
  val TsFormat     = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Fixed-point canonical text of a double at scale k: "<units>p<frac>"
    * built from the scaled integer so no engine-specific float printing is
    * involved. Example, scale 4: 12.5 → "125000".
    */
  def fixedPoint(c: Column, scale: Int): Column =
    floor(c * lit(math.pow(10, scale))).cast(StringType)

  /** Canonical string form of one column given its Spark type. */
  def canonical(c: Column, dt: DataType, scale: Int = 4): Column = {
    val rendered = dt match {
      case TimestampType | TimestampNTZType => date_format(c, TsFormat)
      case DateType                         => date_format(c, "yyyy-MM-dd")
      case DoubleType | FloatType           => fixedPoint(c, scale)
      case _: DecimalType                   => c.cast(StringType)
      case BinaryType                       => upper(md5(c))
      case StringType                       => c
      case _                                => c.cast(StringType)
    }
    coalesce(rendered, lit(NullSentinel))
  }

  /** Decimal rendered like shopspring `decimal.String()` (SURVEY §7.3.2):
    * plain notation, trailing fractional zeros stripped, no trailing dot —
    * `12.5000` → "12.5", `3.00` → "3", `-0.10` → "-0.1". Built from
    * Spark's plain decimal text + two regex passes (codegen'd, no UDF).
    */
  def decimalText(c: Column): Column = {
    val s = c.cast(StringType)
    regexp_replace(regexp_replace(s, "(\\.\\d*?)0+$", "$1"), "\\.$", "")
  }

  /** Garbled-character repair (SURVEY P7, `garbled-char-replace`,
    * `database/oracle/data_migrate.go:959-1005`): replace Unicode
    * replacement chars (the residue of a failed charset conversion) with
    * a caller-chosen token.
    */
  def garbledReplace(c: Column, replacement: String): Column =
    regexp_replace(c, "�", replacement)

  /** Charset conversion (SURVEY P7 — the reference's ZHS16GBK→AL32UTF8
    * migration leg, `database/oracle/data_migrate.go:845-1010` +
    * `BuildInOracleCharset*`): decode `bytes` in the source charset to a
    * Unicode string via Spark's codegen'd `decode`; `convertCharset`
    * re-encodes into the target. The JVM charset registry covers the
    * reference's pairs (GBK, UTF-8, ISO-8859-1, …) so this is a pure
    * projection — no UDF, whole-stage-codegen'd, charset handle shared
    * inside the generated code.
    */
  def decodeCharset(bytes: Column, fromCharset: String): Column =
    decode(bytes, fromCharset)

  def convertCharset(bytes: Column, fromCharset: String, toCharset: String): Column =
    encode(decode(bytes, fromCharset), toCharset)

  /** Canonical one-string-per-row rendering of a projection: the compare
    * row string fed to MD5/CRC32 checksums (SURVEY A2-A4). The reference
    * concatenates raw (`StringSplicingSymbol`, data_compare_rule.go:626-650);
    * we fix an explicit separator to avoid equal-concat collisions.
    */
  def rowString(df: org.apache.spark.sql.DataFrame, cols: Seq[String], sep: String = "|"): Column =
    concat_ws(sep, cols.map(n => canonical(col(n), df.schema(n).dataType)): _*)
}

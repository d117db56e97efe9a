package graft.functions

import org.apache.spark.sql.Column

/** Vendor charset-name tables (SURVEY P7's naming layer) — pure data, the
  * TypeMap pattern: the reference keys every conversion on VENDOR charset
  * names and maps them to the canonical convert set
  * (`utils/constant/migrate.go:40-67` — `MigrateDataSupportCharset` +
  * the three `*CharsetStringConvertMapping` tables) and, per task flow,
  * to the structure-migration target charset (`migrate.go:92-130`,
  * `MigrateTableStructureDatabaseCharsetMap`). Here the canonical names
  * additionally resolve to JVM registry names so [[Canonical.convertCharset]]
  * can be driven directly by vendor names.
  */
object Charsets {

  /** MigrateDataSupportCharset (migrate.go:46). */
  val supported: Seq[String] = Seq("UTF8MB4", "GBK", "BIG5", "GB18030")

  /** Canonical convert-charset → JVM registry name. */
  val canonicalToJvm: Map[String, String] = Map(
    "UTF8MB4" -> "UTF-8", // MySQL's utf8mb4 IS full UTF-8 (utf8 = the 3-byte subset)
    "GBK"     -> "GBK",
    "BIG5"    -> "Big5",
    "GB18030" -> "GB18030")

  /** MigrateOracleCharsetStringConvertMapping (migrate.go:48-53). */
  val oracleConvert: Map[String, String] = Map(
    "AL32UTF8"     -> "UTF8MB4",
    "ZHT16BIG5"    -> "BIG5",
    "ZHS16GBK"     -> "GBK",
    "ZHS32GB18030" -> "GB18030")

  /** MigrateMySQLCompatibleCharsetStringConvertMapping (migrate.go:55-61). */
  val mysqlConvert: Map[String, String] = Map(
    "UTF8MB4" -> "UTF8MB4",
    "UTF8"    -> "UTF8MB4",
    "BIG5"    -> "BIG5",
    "GBK"     -> "GBK",
    "GB18030" -> "GB18030")

  /** MigratePostgreSQLCompatibleCharsetStringConvertMapping
    * (migrate.go:63-67): PG serves BIG5/GBK clients through EUC server
    * encodings.
    */
  val postgresConvert: Map[String, String] = Map(
    "EUC_TW" -> "BIG5",
    "UTF8"   -> "UTF8MB4",
    "EUC_CN" -> "GBK")

  /** MigrateTableStructureDatabaseCharsetMap (migrate.go:92-130) keyed by
    * the TypeMap direction codes: the structure-migration target charset
    * per task flow (TiDB flows force UTF8MB4).
    */
  val structureCharsetMap: Map[String, Map[String, String]] = Map(
    "O2M" -> Map(
      "AL32UTF8" -> "UTF8MB4", "ZHT16BIG5" -> "BIG5",
      "ZHS16GBK" -> "GBK", "ZHS32GB18030" -> "GB18030"),
    "O2T" -> Map(
      "AL32UTF8" -> "UTF8MB4", "ZHT16BIG5" -> "UTF8MB4",
      "ZHS16GBK" -> "UTF8MB4", "ZHS32GB18030" -> "UTF8MB4"),
    "M2O" -> Map(
      "UTF8MB4" -> "AL32UTF8", "UTF8" -> "AL32UTF8",
      "BIG5" -> "ZHT16BIG5", "GBK" -> "ZHS16GBK", "GB18030" -> "ZHS32GB18030"),
    "T2O" -> Map(
      "UTF8MB4" -> "AL32UTF8", "UTF8" -> "AL32UTF8", "GBK" -> "ZHS16GBK"),
    "P2T" -> Map(
      "EUC_TW" -> "UTF8MB4", "EUC_CN" -> "UTF8MB4", "UTF8" -> "UTF8MB4"),
    "P2M" -> Map(
      "EUC_TW" -> "UTF8MB4", "EUC_CN" -> "UTF8MB4", "UTF8" -> "UTF8MB4"))

  /** Resolve any vendor or canonical charset name to its JVM registry
    * name; throws on names outside the reference's supported set.
    */
  def jvmCharset(name: String): String = {
    val up = name.toUpperCase
    val canonical = canonicalToJvm.keySet.find(_ == up)
      .orElse(oracleConvert.get(up))
      .orElse(mysqlConvert.get(up))
      .orElse(postgresConvert.get(up))
      .getOrElse(throw new IllegalArgumentException(
        s"unsupported charset: $name (MigrateDataSupportCharset = $supported)"))
    canonicalToJvm(canonical)
  }

  /** [[Canonical.convertCharset]] driven by vendor names — the exact
    * call shape of the reference's data-migrate conversion leg
    * (`database/oracle/data_migrate.go:845-1010`).
    */
  def convert(bytes: Column, fromName: String, toName: String): Column =
    Canonical.convertCharset(bytes, jvmCharset(fromName), jvmCharset(toName))
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's charset name tables
  * (`utils/constant/migrate.go:40-130`): entry counts and values match,
  * every canonical name resolves in the JVM registry, and vendor-name
  * conversion is byte-identical to the raw JVM-name path.
  */
class CharsetsSpec extends SparkSpec {

  test("table sizes and values match migrate.go exactly") {
    assert(Charsets.supported === Seq("UTF8MB4", "GBK", "BIG5", "GB18030"))
    assert(Charsets.oracleConvert.size === 4)
    assert(Charsets.mysqlConvert.size === 5)
    assert(Charsets.postgresConvert.size === 3)
    assert(Charsets.oracleConvert("ZHS32GB18030") === "GB18030")
    assert(Charsets.mysqlConvert("UTF8") === "UTF8MB4") // utf8 folds into utf8mb4
    assert(Charsets.postgresConvert("EUC_TW") === "BIG5") // PG serves BIG5 via EUC_TW
    // structure map: 6 task flows, TiDB flows force UTF8MB4
    assert(Charsets.structureCharsetMap.keySet ===
      Set("O2M", "O2T", "M2O", "T2O", "P2T", "P2M"))
    assert(Charsets.structureCharsetMap("O2T").values.toSet === Set("UTF8MB4"))
    assert(Charsets.structureCharsetMap("M2O")("GB18030") === "ZHS32GB18030")
    assert(Charsets.structureCharsetMap("O2M").size +
      Charsets.structureCharsetMap("O2T").size +
      Charsets.structureCharsetMap("M2O").size +
      Charsets.structureCharsetMap("T2O").size +
      Charsets.structureCharsetMap("P2T").size +
      Charsets.structureCharsetMap("P2M").size === 4 + 4 + 5 + 3 + 3 + 3)
  }

  test("every canonical charset resolves in the JVM registry") {
    Charsets.canonicalToJvm.values.foreach { n =>
      assert(java.nio.charset.Charset.forName(n) != null)
    }
  }

  test("vendor-name conversion is byte-identical to the JVM-name path") {
    val s = spark
    import s.implicits._
    val gbkHex = "4D6978656420D6D0D3A22074657874" // "Mixed 中英 text" (q572 row 4)
    val df = Seq(gbkHex).toDF("h").select(unhex(col("h")).as("b"))
    def hexOf(c: org.apache.spark.sql.Column) =
      df.select(hex(c)).head().getString(0)
    val viaVendor = hexOf(Charsets.convert(col("b"), "ZHS16GBK", "AL32UTF8"))
    val viaJvm    = hexOf(Canonical.convertCharset(col("b"), "GBK", "UTF-8"))
    assert(viaVendor === viaJvm && viaVendor === "4D6978656420E4B8ADE88BB12074657874")
    // PG's EUC_CN vendor name routes to the same GBK table
    assert(hexOf(Charsets.convert(col("b"), "EUC_CN", "UTF8")) === viaJvm)
  }

  test("unsupported names are refused with the support list") {
    val e = intercept[IllegalArgumentException] { Charsets.jvmCharset("LATIN1") }
    assert(e.getMessage.contains("MigrateDataSupportCharset"))
  }
}

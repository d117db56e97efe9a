package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

/** Pins the fused native shingle-set build (r11) against the declarative
  * chain it replaces in jaccardVerify:
  * `sorted_shingle_set(nt, k)` ≡ `array_sort(array_distinct(shingles(nt, k)))`
  * — over the REAL corpus fixture (every document at sf0.001) and over
  * adversarial short/empty/unicode strings, for two shingle lengths.
  */
class SortedShingleSetSpec extends SparkSpec {

  private def pin(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val bad = df
      .select(
        GraftFunctions.sortedShingleSet(col("nt"), k).as("nat"),
        array_sort(array_distinct(shingles(col("nt"), k))).as("dec"))
      .where(not(col("nat") === col("dec")))
    assert(bad.count() == 0)
  }

  test("equals array_sort(array_distinct(shingles)) on the real corpus") {
    val docs = graft.core.Tables(spark, sfDir).documents
      .select(normText(col("text")).as("nt"))
    pin(docs, 8)
    pin(docs, 3)
  }

  test("short, empty, and multi-byte strings") {
    import spark.implicits._
    val df = Seq("", "a", "ab", "abcdefgh", "ababab",
      "héllo wörld é", "ééééééééé", "日本語のテキストです").toDF("nt")
    pin(df, 8)
    pin(df, 2)
    // null propagates like the declarative chain
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS nt")
    assert(n.select(GraftFunctions.sortedShingleSet(col("nt"), 8)).head().isNullAt(0))
  }
}

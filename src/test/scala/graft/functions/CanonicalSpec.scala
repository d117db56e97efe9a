package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class CanonicalSpec extends SparkSpec {

  test("decimalText strips trailing zeros like shopspring decimal.String() (§7.3.2)") {
    val s = spark
    import s.implicits._
    val rows = Seq("12.5000", "3.00", "-0.10", "0.000", "17", "100.010")
      .toDF("v").select(Canonical.decimalText(col("v").cast("decimal(10,3)")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("12.5", "3", "-0.1", "0", "17", "100.01"))
  }

  test("NULL sentinel vs empty string distinction (data_compare.go:531-535)") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(""), None, Some("x")).toDF("v")
    val out = df.select(Canonical.canonical(col("v"), StringType).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("", "0", "x")) // empty preserved, NULL → sentinel
  }

  test("garbledReplace substitutes replacement chars only") {
    val s = spark
    import s.implicits._
    val out = Seq("ok", "bad�char�").toDF("v")
      .select(Canonical.garbledReplace(col("v"), "?").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("ok", "bad?char?"))
  }

  test("canonical timestamp format is fixed-width microseconds") {
    val s = spark
    import s.implicits._
    val out = Seq(java.sql.Timestamp.valueOf("2024-01-02 03:04:05.1"))
      .toDF("v").select(Canonical.canonical(col("v"), TimestampType).as("c"))
      .head().getString(0)
    assert(out == "2024-01-02 03:04:05.100000")
  }
}

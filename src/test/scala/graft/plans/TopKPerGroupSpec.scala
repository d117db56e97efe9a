package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native top-k-per-group operator: result parity with the window
  * row_number filter, and the two-phase (partial map-side collapse +
  * post-shuffle final) plan shape.
  */
class TopKPerGroupSpec extends SparkSpec {

  private def supplier = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_nationkey"), col("s_suppkey"),
        // unique per group: cents ⊕ suppkey
        (floor(col("s_acctbal") * 100).cast("long") * 100000 + col("s_suppkey")).as("ord"))
  }

  test("matches the window row_number top-k, both directions") {
    val df = supplier
    for (desc <- Seq(true, false)) {
      val native = GraftFunctions
        .topKPerGroup(df, Seq("s_nationkey"), "ord", 3, descending = desc)
        .select("s_nationkey", "s_suppkey")
      val w = Window.partitionBy("s_nationkey")
        .orderBy(if (desc) col("ord").desc else col("ord").asc)
      val windowed = df
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select("s_nationkey", "s_suppkey")
      assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty,
        s"mismatch for descending=$desc")
    }
  }

  test("Long.MinValue/MaxValue ordering keys are handled in both directions") {
    // regression: the heap ordering used key negation, and
    // -Long.MinValue overflows back to Long.MinValue — a row with that
    // key was treated as maximal inside the descending heap
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, Long.MinValue), (1, -5L), (1, 0L), (1, 7L), (1, Long.MaxValue),
      (2, Long.MinValue), (2, Long.MinValue + 1), (2, Long.MaxValue - 1), (2, Long.MaxValue))
      .toDF("g", "ord")
    for (desc <- Seq(true, false)) {
      val native = GraftFunctions
        .topKPerGroup(df, Seq("g"), "ord", 2, descending = desc)
        .select("g", "ord")
      val w = Window.partitionBy("g")
        .orderBy(if (desc) col("ord").desc else col("ord").asc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2).select("g", "ord")
      assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty,
        s"mismatch for descending=$desc: got ${native.collect().mkString(",")}")
    }
  }

  test("k larger than every group returns all rows") {
    val df = supplier
    val native = GraftFunctions
      .topKPerGroup(df, Seq("s_nationkey"), "ord", 1000)
    assert(native.count() == df.count())
  }

  test("plan is two-phase: partial collapse below the exchange, final above") {
    val df = GraftFunctions
      .topKPerGroup(supplier, Seq("s_nationkey"), "ord", 3)
    df.collect()
    // AQE wraps stages in leaf QueryStageExec nodes — assert on the final
    // formatted plan text instead of collecting exec nodes
    val planStr = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("TopKPerGroup \\(".r.findAllIn(planStr).size >= 2,
      s"expected partial+final TopKPerGroup nodes:\n$planStr")
    assert(planStr.contains("Exchange") && planStr.contains("hashpartitioning(s_nationkey"),
      s"expected a hash exchange on the group key between the phases:\n$planStr")
  }
}

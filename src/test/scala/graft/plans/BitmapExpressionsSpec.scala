package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitmapExpressionsSpec extends SparkSpec {

  test("bitmapBuild equals the declarative transform/filter twin") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0, 1, 63, 64, 130)),
      (2L, Seq(5)),
      (3L, Seq.empty[Int])).toDF("id", "ids")
      .withColumn("nw", lit(3))
    val native = df.select(col("id"),
      GraftFunctions.bitmapBuild(col("ids"), col("nw")).as("bm"))
    val twin = df.select(col("id"),
      expr("transform(sequence(0, nw - 1), w -> " +
        "aggregate(filter(ids, i -> i div 64 = w), 0L, " +
        "(a, i) -> a | shiftleft(1L, CAST(i % 64 AS INT))))").as("bm"))
    assert(native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap ==
      twin.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }

  test("bitmapAndCount equals the declarative zip_with/bit_count twin") {
    import spark.implicits._
    val df = Seq(
      (Seq(-1L, 0L, 255L), Seq(1L, 7L, 15L)),
      (Seq(0L, 0L, 0L), Seq(-1L, -1L, -1L)),
      (Seq(-1L, -1L, -1L), Seq(-1L, -1L, -1L))).toDF("a", "b")
    val native = df.select(GraftFunctions.bitmapAndCount(col("a"), col("b")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    val twin = df.select(expr("aggregate(zip_with(a, b, (x, y) -> " +
        "CAST(bit_count(x & y) AS BIGINT)), 0L, (acc, v) -> acc + v)").as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == twin)
    // -1&1 = 1 bit, 0&7 = 0, 255&15 = 4 bits → 5; then 0; then 3×64 = 192
    assert(native == Seq(5L, 0L, 192L))
  }

  test("bitmapAndCount is NULL on length mismatch") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    assert(df.select(GraftFunctions.bitmapAndCount(col("a"), col("b"))).head().isNullAt(0))
  }

  test("round trip: intersection count of built bitmaps equals set intersection") {
    import spark.implicits._
    val df = Seq((Seq(1, 5, 77, 130), Seq(5, 77, 99))).toDF("x", "y")
      .withColumn("nw", lit(3))
    val n = df.select(GraftFunctions.bitmapAndCount(
        GraftFunctions.bitmapBuild(col("x"), col("nw")),
        GraftFunctions.bitmapBuild(col("y"), col("nw")))).head().getLong(0)
    assert(n == 2L)
  }
}

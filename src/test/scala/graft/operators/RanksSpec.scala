package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed global rank + NTILE arithmetic must match the
  * single-partition window exactly (on unique key tuples).
  */
class RanksSpec extends SparkSpec {

  test("withGlobalRank + ntileFromRank equal the global window ntile") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
    val n = li.count()
    val keys = Seq("l_orderkey", "l_linenumber")

    val distributed = Ranks.withGlobalRank(li, keys, parts = 7)
      .select(col("l_orderkey"), col("l_linenumber"), col("rank"),
        Ranks.ntileFromRank(col("rank"), n, 32).as("tile"))
    val w = Window.orderBy(keys.map(col): _*)
    val global = li.select(col("l_orderkey"), col("l_linenumber"),
      row_number().over(w).cast("long").as("rank"),
      ntile(32).over(w).cast("long").as("tile"))

    assert(distributed.exceptAll(global).isEmpty && global.exceptAll(distributed).isEmpty)
  }

  test("withRunningTotal equals the global-window cumulative sum") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .withColumn("v", col("l_quantity").cast("long"))
    val keys = Seq("l_orderkey", "l_linenumber")

    val distributed = Ranks.withRunningTotal(li, keys, col("v"), "c", parts = 7)
      .select("l_orderkey", "l_linenumber", "c")
    val w = Window.orderBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = li.select(col("l_orderkey"), col("l_linenumber"),
      sum(col("v")).over(w).as("c"))

    assert(distributed.exceptAll(global).isEmpty && global.exceptAll(distributed).isEmpty)
  }

  test("withPrefixMin equals the global-window exclusive prefix min") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
      .withColumn("v", (col("l_orderkey") * 7 + col("l_linenumber")) % 1000)
    val keys = Seq("l_orderkey", "l_linenumber")

    val distributed = Ranks.withPrefixMin(li, keys, col("v"), "m", parts = 7)
      .select("l_orderkey", "l_linenumber", "m")
    val w = Window.orderBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val global = li.select(col("l_orderkey"), col("l_linenumber"),
      coalesce(min(col("v").cast("long")).over(w), lit(Long.MaxValue)).as("m"))

    assert(distributed.exceptAll(global).isEmpty && global.exceptAll(distributed).isEmpty)
  }

  test("withRunningTotal survives partitions whose every value is NULL") {
    // regression: an all-NULL partition summed to NULL and NPE'd on the
    // driver-side getLong
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i, if (i <= 50) null else s"$i"))
      .toDF("k", "x")
    val out = Ranks.withRunningTotal(df, Seq("k"), col("x").cast("long"), "c", parts = 7)
    assert(out.count() == 100)
    // rows past the NULL prefix carry the real prefix sum
    val last = out.where(col("k") === 100).collect().head.getAs[Long]("c")
    assert(last == (51 to 100).map(_.toLong).sum, s"got $last")
  }

  test("ntileFromRank handles fewer rows than buckets") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L, 3L).toDF("rank")
    val tiles = df.select(Ranks.ntileFromRank(col("rank"), 3L, 32).as("t"))
      .collect().map(_.getLong(0)).toSeq
    assert(tiles == Seq(1L, 2L, 3L))
  }
}

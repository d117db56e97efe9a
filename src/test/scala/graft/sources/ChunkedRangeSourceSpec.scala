package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSv2 chunked source: chunk = InputPartition, key-range filters prune
  * whole chunks at planning time.
  */
class ChunkedRangeSourceSpec extends SparkSpec {

  private def table = spark.read.format("graft.sources.ChunkedRangeSource")
    .option("start", "0").option("end", "100000").option("chunkSize", "4096")
    .load()

  test("full scan produces every key with the deterministic value") {
    val df = table
    assert(df.count() == 100000)
    assert(df.rdd.getNumPartitions == math.ceil(100000.0 / 4096).toInt)
    val point = df.where(col("k") === 12345)
    assert(point.rdd.getNumPartitions == 1) // point lookup plans ONE chunk
    val r = point.collect().head
    assert(r.getLong(1) == ChunkedRangeSource.valueOf(12345))
  }

  test("key-range predicate prunes whole chunks at planning time") {
    val df = table.where(col("k") >= 8192 && col("k") < 16384)
    // chunks [8192,12288) and [12288,16384) survive; the other 23 are
    // never planned as tasks
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 8192)
    assert(df.agg(min("k"), max("k")).collect().head match {
      case r => r.getLong(0) == 8192 && r.getLong(1) == 16383
    })
  }

  test("chunkSize option is honored regardless of key casing") {
    val df = spark.read.format("graft.sources.ChunkedRangeSource")
      .option("start", "0").option("end", "10000").option("chunkSize", "1000")
      .load()
    assert(df.rdd.getNumPartitions == 10, s"got ${df.rdd.getNumPartitions}")
  }

  test("column pruning reaches the scan: projecting v reads only v") {
    val df = table.select("v")
    val leafOutput = df.queryExecution.sparkPlan.collectLeaves().head.output.map(_.name)
    assert(leafOutput == Seq("v"), s"scan should emit only v, got $leafOutput")
    // pruned rows still carry the right values
    val sums = df.agg(sum("v")).collect().head.getLong(0)
    val expect = (0L until 100000L).map(ChunkedRangeSource.valueOf).sum
    assert(sums == expect)
  }

  test("Long.MaxValue bounds don't overflow the pushdown arithmetic") {
    // regression: v + 1 at Long.MaxValue wrapped to Long.MinValue,
    // wrongly pruning everything (<=) or nothing (>)
    assert(table.where(col("k") <= Long.MaxValue).count() == 100000)
    assert(table.where(col("k") > Long.MaxValue).count() == 0)
    assert(table.where(col("k") === Long.MaxValue).count() == 0)
  }

  test("residual filters still apply on top of pruned chunks") {
    val df = table.where(col("k") >= 4096 && col("k") < 8192 && col("v") === 0L)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= 4096 && r.getLong(0) < 8192 &&
      ChunkedRangeSource.valueOf(r.getLong(0)) == 0L))
  }
}

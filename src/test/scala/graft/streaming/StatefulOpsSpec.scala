package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** transformWithState running totals: per-key ValueState accumulates
  * across micro-batches; each batch emits the touched keys' new totals.
  */
class StatefulOpsSpec extends SparkSpec {

  test("runningTotals accumulates per key across batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // transformWithState requires the RocksDB state store (typed state
    // lives in per-state column families the HDFS-backed store lacks)
    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Long)]
    val out = StatefulOps.runningTotals(input.toDS())
    val q = out.toDF("k", "n", "total").writeStream
      .format("memory").queryName("running_out").outputMode("update").start()
    try {
      input.addData(Seq(("a", 5L), ("a", 7L), ("b", 1L)))
      q.processAllAvailable()
      val b1 = s.table("running_out").as[(String, Long, Long)].collect().toSet
      assert(b1 == Set(("a", 2L, 12L), ("b", 1L, 1L)))

      // second batch touches only a: its state carries over, b is not re-emitted
      input.addData(Seq(("a", 3L)))
      q.processAllAvailable()
      val all = s.table("running_out").as[(String, Long, Long)].collect().toSet
      assert(all == b1 + (("a", 3L, 15L)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

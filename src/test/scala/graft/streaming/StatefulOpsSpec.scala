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

  test("TimedSessions closes sessions via event-time timers on watermark advance") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def ts(sec: Int): java.sql.Timestamp = new java.sql.Timestamp(base + sec * 1000L)

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val q = StatefulOps.timedSessions(input.toDS(), gapMs = 60000L)
      .toDF("k", "start_ms", "end_ms", "n").writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // session a: two events 30s apart; no close yet (watermark behind)
      input.addData(Seq(("a", ts(0)), ("a", ts(30))))
      q.processAllAvailable()
      assert(s.table("sess_out").count() == 0)

      // an event 5 minutes later advances the watermark past a's
      // end + gap; the timer fires in the following batch
      input.addData(Seq(("b", ts(300))))
      q.processAllAvailable()
      input.addData(Seq(("b", ts(301))))
      q.processAllAvailable()
      val closed = s.table("sess_out").as[(String, Long, Long, Long)].collect().toSet
      assert(closed.exists(r => r._1 == "a" && r._4 == 2L &&
        r._3 - r._2 == 30000L), s"expected closed session for a, got $closed")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ResolvedFlush matches the flatMapGroupsWithState twin's semantics") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def dml(ts: Long, op: String, k: String): ChangeEvent =
      ChangeEvent("db", "t", op, ts, 0, Map("id" -> k), Map("id" -> k), "")
    def resolved(ts: Long): ChangeEvent =
      ChangeEvent("db", "t", "RESOLVED", ts, 0, Map.empty, Map.empty, "")

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[ChangeEvent]
    val q = StatefulOps.resolvedFlushStream(s, input.toDS())
      .writeStream.format("memory").queryName("tws_cdc_out").outputMode("append").start()
    try {
      // buffered until RESOLVED; equal-ts UPDATE must flush (kind rank)
      input.addData(Seq(dml(5, "INSERT", "k1"), dml(3, "INSERT", "k2"), dml(8, "UPDATE", "k1")))
      q.processAllAvailable()
      assert(s.table("tws_cdc_out").count() == 0)

      input.addData(Seq(dml(6, "UPDATE", "k3"), resolved(6)))
      q.processAllAvailable()
      val f1 = s.table("tws_cdc_out").as[CdcPipeline.FlushedEvent].collect()
        .sortBy(_.seq).map(f => (f.event.commitTs, f.event.queryType)).toSeq
      assert(f1 == Seq((3L, "INSERT"), (5L, "INSERT"), (6L, "UPDATE")))

      // obsolete replay ≤ checkpoint 6 dropped; ts 8 buffered survivor flushes
      input.addData(Seq(dml(3, "INSERT", "k2"), resolved(10)))
      q.processAllAvailable()
      val all = s.table("tws_cdc_out").as[CdcPipeline.FlushedEvent].collect()
        .map(f => (f.resolvedTs, f.event.commitTs)).toSet
      assert(all == Set((6L, 3L), (6L, 5L), (6L, 6L), (10L, 8L)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

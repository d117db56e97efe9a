package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FIXTURES.md §F5 scenarios: resolved-ts flush ordering, obsolete drop,
  * replay idempotence, DDL barrier — plus the reference's EventGroup
  * resolve cases (`message/tidb/event_group_test.go:23-113`).
  */
class CdcPipelineSpec extends SparkSpec {

  private def dml(ts: Long, op: String, k: String, v: String = "x", table: String = "t",
      part: Int = 0): ChangeEvent =
    ChangeEvent("db", table, op, ts, part, Map("id" -> k), Map("id" -> k, "val" -> v), "")

  private def resolved(ts: Long, table: String = "t", part: Int = 0): ChangeEvent =
    ChangeEvent("db", table, "RESOLVED", ts, part, Map.empty, Map.empty, "")

  private def ddl(ts: Long, q: String, table: String = "t"): ChangeEvent =
    ChangeEvent("db", table, "DDL", ts, 0, Map.empty, Map.empty, q)

  // ---- EventGroup (event.go:710-777 mirror) --------------------------

  test("EventGroup resolvedFlush: empty / all / partial / unordered") {
    assert(new EventGroup().resolvedFlush(10) == Nil)
    val all = new EventGroup(Seq(dml(1, "INSERT", "a"), dml(2, "INSERT", "b")))
    assert(all.resolvedFlush(5).map(_.commitTs) == Seq(1L, 2L))
    assert(all.buffered.isEmpty)
    val partial = new EventGroup(Seq(dml(1, "INSERT", "a"), dml(7, "INSERT", "b")))
    assert(partial.resolvedFlush(5).map(_.commitTs) == Seq(1L))
    assert(partial.buffered.map(_.commitTs) == Seq(7L))
    val unordered = new EventGroup(Seq(dml(9, "INSERT", "c"), dml(3, "INSERT", "a"), dml(5, "INSERT", "b")))
    assert(unordered.resolvedFlush(9).map(_.commitTs) == Seq(3L, 5L, 9L))
  }

  // ---- streaming flush state machine ---------------------------------

  private def runStream(batches: Seq[Seq[ChangeEvent]]): Seq[CdcPipeline.FlushedEvent] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[ChangeEvent]
    val q = CdcPipeline.resolvedFlushStream(s, input.toDS())
      .writeStream.format("memory").queryName("cdc_out").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      s.table("cdc_out").as[CdcPipeline.FlushedEvent].collect().toSeq
    } finally q.stop()
  }

  test("resolved-ts watermark flushes exactly the events ≤ ts, in order (F5.1)") {
    val out = runStream(Seq(
      Seq(dml(5, "INSERT", "k1"), dml(3, "INSERT", "k2"), dml(8, "UPDATE", "k1")),
      Seq(resolved(6)),
      Seq(dml(9, "DELETE", "k2"), resolved(10))))
    val flushed = out.sortBy(f => (f.resolvedTs, f.seq)).map(f => (f.event.commitTs, f.event.queryType))
    assert(flushed == Seq((3L, "INSERT"), (5L, "INSERT"), (8L, "UPDATE"), (9L, "DELETE")))
    assert(out.filter(_.resolvedTs == 6).map(_.event.commitTs).sorted == Seq(3L, 5L))
  }

  test("obsolete events at or below the checkpoint are dropped (F5.2)") {
    val out = runStream(Seq(
      Seq(dml(2, "INSERT", "k1"), resolved(5)),
      // replayed + stale events ≤ checkpoint 5 must vanish; 7 survives
      Seq(dml(2, "INSERT", "k1"), dml(4, "INSERT", "k9"), dml(7, "INSERT", "k2"), resolved(9))))
    assert(out.map(_.event.commitTs).sorted == Seq(2L, 7L))
    // a second RESOLVED at an already-passed ts is also a no-op
    val out2 = runStream(Seq(Seq(dml(2, "INSERT", "k1"), resolved(5)), Seq(resolved(5))))
    assert(out2.map(_.event.commitTs) == Seq(2L))
  }

  test("DML at exactly the resolved ts flushes, for every DML kind") {
    // "UPDATE" > "RESOLVED" lexicographically: a queryType-string sort
    // would process the UPDATE after the checkpoint advanced and drop it.
    // kindRank places all DML before RESOLVED at equal commitTs.
    val out = runStream(Seq(Seq(
      dml(5, "INSERT", "k1"), dml(5, "UPDATE", "k2"), dml(5, "DELETE", "k3"),
      resolved(5))))
    assert(out.map(_.event.queryType).sorted == Seq("DELETE", "INSERT", "UPDATE"),
      s"all three equal-ts DML kinds must flush, got $out")
    assert(out.forall(_.resolvedTs == 5))
  }

  test("per-table isolation: flush of one table leaves others buffered") {
    val out = runStream(Seq(Seq(
      dml(1, "INSERT", "a", table = "t1"),
      dml(1, "INSERT", "a", table = "t2"),
      resolved(5, table = "t1"))))
    assert(out.map(_.event.tableName) == Seq("t1"))
  }

  // ---- idempotent apply (ST8) ----------------------------------------

  test("applyBatch: UPDATE≡DELETE+INSERT, DELETE removes, replay is a no-op (F5.3)") {
    val s = spark
    import s.implicits._
    val target = Seq(("k1", "old1"), ("k2", "old2"), ("k3", "old3")).toDF("id", "val")
    val batch = Seq(
      dml(1, "UPDATE", "k1", "new1"),
      dml(2, "DELETE", "k2"),
      dml(3, "INSERT", "k4", "new4"),
      dml(4, "UPDATE", "k4", "new4b")) // last-wins inside the batch
    def state(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val once = CdcPipeline.applyBatch(s, target, batch, "id", Seq("val"))
    assert(state(once) == Map("k1" -> "new1", "k3" -> "old3", "k4" -> "new4b"))
    val twice = CdcPipeline.applyBatch(s, once, batch, "id", Seq("val"))
    assert(state(twice) == state(once))
  }

  // ---- DDL barrier (ST5) ---------------------------------------------

  test("DDL barrier: pre-DDL DML applies before DDL, none leaks early (F5.4)") {
    val batch = Seq(
      dml(1, "INSERT", "a", part = 0), dml(3, "INSERT", "b", part = 1),
      ddl(5, "ALTER TABLE t ADD c INT"),
      dml(7, "INSERT", "c", part = 0), dml(9, "INSERT", "d", part = 1),
      ddl(10, "ALTER TABLE t DROP c"),
      dml(11, "INSERT", "e", part = 1))
    val phases = CdcPipeline.splitAtDdl(batch)
    assert(phases.map(_.ddl.map(_.commitTs)) == Seq(Some(5L), Some(10L), None))
    assert(phases(0).dml.map(_.commitTs) == Seq(1L, 3L))
    assert(phases(1).dml.map(_.commitTs) == Seq(7L, 9L))
    assert(phases(2).dml.map(_.commitTs) == Seq(11L))
    // regression ⇒ hard error (consumer.go:176-193)
    intercept[IllegalStateException] {
      CdcPipeline.splitAtDdl(Seq(ddl(4, "LATE DDL")), appliedDdlTs = 10L)
    }
  }

  // ---- decoder (ST2) -------------------------------------------------

  test("JSON decode matches the wire schema") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      """{"schemaName":"db","tableName":"t","queryType":"INSERT","commitTs":7,"partition":1,
        |"uniqKeys":{"id":"k1"},"columns":{"id":"k1","val":"v"},"ddlQuery":""}""".stripMargin.replace("\n", ""),
      """{"queryType":"RESOLVED","commitTs":9}""").toDF("value")
    val evs = ChangeEvent.decode(s, raw).collect().sortBy(_.commitTs)
    assert(evs(0).queryType == "INSERT" && evs(0).commitTs == 7 &&
      evs(0).uniqKeys == Map("id" -> "k1") && evs(0).partition == 1)
    assert(evs(1).queryType == "RESOLVED" && evs(1).commitTs == 9 && evs(1).uniqKeys.isEmpty)
  }
}

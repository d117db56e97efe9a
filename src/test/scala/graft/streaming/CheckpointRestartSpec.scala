package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** ST7: flush state (buffer + checkpoint ts) survives a streaming-query
  * restart from checkpointLocation — obsolete events from before the
  * restart stay dropped, buffered events stay buffered. Sink is
  * foreachBatch (the memory sink does not support checkpoint recovery).
  */
class CheckpointRestartSpec extends SparkSpec {

  private def dml(ts: Long, k: String): ChangeEvent =
    ChangeEvent("db", "t", "INSERT", ts, 0, Map("id" -> k), Map("id" -> k), "")
  private def resolved(ts: Long): ChangeEvent =
    ChangeEvent("db", "t", "RESOLVED", ts, 0, Map.empty, Map.empty, "")

  test("group state survives query restart from checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[ChangeEvent]
    val flushed = CdcPipeline.resolvedFlushStream(s, input.toDS())
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()

    def start() = flushed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CdcPipeline.FlushedEvent], _: Long) =>
        batch.collect().foreach(f => sink.add(java.lang.Long.valueOf(f.event.commitTs))); ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // phase 1: flush through ts=5 (checkpoint becomes 5), buffer ts=9
    val q1 = start()
    input.addData(Seq(dml(2, "k1"), dml(9, "k2"), resolved(5)))
    q1.processAllAvailable(); q1.stop()
    assert(sink.toArray.map(_.asInstanceOf[java.lang.Long].longValue).toSeq == Seq(2L))
    sink.clear()

    // phase 2: restart from the same checkpoint; replayed ts=2 must drop
    // (checkpoint 5 persisted in state), buffered ts=9 must flush with the
    // new ts=7 on resolved(10)
    val q2 = start()
    input.addData(Seq(dml(2, "k1-replay"), dml(7, "k3"), resolved(10)))
    q2.processAllAvailable(); q2.stop()
    val flushedTs = sink.toArray.map(_.asInstanceOf[java.lang.Long].longValue).toSeq.sorted
    assert(flushedTs == Seq(7L, 9L),
      s"expected buffered 9 + new 7, replayed 2 dropped; got $flushedTs")
  }
}

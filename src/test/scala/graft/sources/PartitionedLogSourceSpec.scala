package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.ChangeEvent

/** ST1 partition-parallel consume + ST7 offset/checkpoint semantics over
  * the DSv2 MicroBatchStream (the in-sandbox stand-in for the reference's
  * per-partition Kafka consumers, message/tidb/group.go:107-296). Sink is
  * foreachBatch (the memory sink does not support checkpoint recovery).
  */
class PartitionedLogSourceSpec extends SparkSpec {

  private val fmt = classOf[PartitionedLogSource].getName

  private def event(p: Int, ts: Long, id: Int): String =
    s"""{"schemaName":"s","tableName":"t","queryType":"INSERT","commitTs":$ts,""" +
      s""""partition":$p,"uniqKeys":{"id":"$id"},"columns":{"v":"x$id"},"ddlQuery":""}"""

  private def append(dir: String, p: Int, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, s"partition-$p.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  // (log partition, offset, value, spark task partition id)
  private type SunkRow = (Int, Long, String, Int)

  test("one task per topic partition; per-partition order; offset resume across restart") {
    val dir  = Files.createTempDirectory("plog").toString
    val ckpt = Files.createTempDirectory("plog_ckpt").toString
    // 3 partitions with different depths (partition 2 stalls later)
    append(dir, 0, (0 until 5).map(i => event(0, 100 + i, i)))
    append(dir, 1, (0 until 3).map(i => event(1, 200 + i, 10 + i)))
    append(dir, 2, (0 until 4).map(i => event(2, 300 + i, 20 + i)))

    val sink = new ConcurrentLinkedQueue[SunkRow]()
    def start() = spark.readStream.format(fmt).option("path", dir).load()
      .select(col("partition"), col("offset"), col("value"),
        spark_partition_id().as("task_pid"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => sink.add((r.getInt(0), r.getLong(1), r.getString(2), r.getInt(3))))
        ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    q1.processAllAvailable()
    val got1 = sink.toArray(Array.empty[SunkRow])
    assert(got1.length == 12)
    // partition-parallel: 3 log partitions planned as 3 distinct tasks
    assert(got1.map(_._4).distinct.length == 3,
      "each topic partition must consume in its own task")
    // per-partition append order: offsets are exactly 0..n-1
    for ((p, n) <- Seq(0 -> 5, 1 -> 3, 2 -> 4)) {
      val offs = got1.filter(_._1 == p).map(_._2).sorted
      assert(offs.toSeq == (0L until n.toLong), s"partition $p offsets")
    }
    // the value column decodes through the UNCHANGED CDC decoder
    val s = spark
    import s.implicits._
    val decoded = ChangeEvent.decode(spark, got1.map(_._3).toSeq.toDF("value")).collect()
    assert(decoded.count(_.queryType == "INSERT") == 12)
    assert(decoded.filter(_.partition == 1).map(_.commitTs).sorted.toSeq == Seq(200L, 201L, 202L))

    // incremental batch: only the delta is planned (partition 2 stalls)
    append(dir, 0, Seq(event(0, 110, 50)))
    append(dir, 1, Seq(event(1, 210, 51), event(1, 211, 52)))
    q1.processAllAvailable()
    assert(sink.size == 15, "delta batch must append exactly the new lines")
    q1.stop()

    // restart from the checkpoint: a fresh query sees ONLY post-restart
    // appends — committed offsets survive the restart, no replay
    sink.clear()
    append(dir, 2, Seq(event(2, 310, 60)))
    val q2 = start()
    q2.processAllAvailable()
    val got3 = sink.toArray(Array.empty[SunkRow])
    assert(got3.length == 1 && got3.head._1 == 2 && got3.head._2 == 4L,
      s"restart must resume from committed offsets, got ${got3.toSeq}")
    q2.stop()
  }

  test("maxRecordsPerTrigger bounds every micro-batch during catch-up") {
    val dir  = Files.createTempDirectory("plog_cap").toString
    val ckpt = Files.createTempDirectory("plog_cap_ckpt").toString
    append(dir, 0, (0 until 5).map(i => event(0, 100 + i, i)))
    append(dir, 1, (0 until 3).map(i => event(1, 200 + i, 10 + i)))
    append(dir, 2, (0 until 4).map(i => event(2, 300 + i, 20 + i)))

    val batchSizes = new ConcurrentLinkedQueue[Integer]()
    val q = spark.readStream.format(fmt).option("path", dir)
      .option("maxRecordsPerTrigger", "5").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(batch.count().toInt); ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val sizes = batchSizes.toArray(Array.empty[Integer]).map(_.intValue).filter(_ > 0)
    assert(sizes.sum == 12, s"catch-up must consume the full backlog, got ${sizes.toSeq}")
    assert(sizes.forall(_ <= 5), s"every batch must respect the cap, got ${sizes.toSeq}")
    assert(sizes.length >= 3, s"a 12-row backlog at cap 5 needs >= 3 batches, got ${sizes.toSeq}")
  }

  test("e2e: DSv2 source -> decode -> resolved-ts flush (pipeline unchanged)") {
    val dir  = Files.createTempDirectory("plog_e2e").toString
    val ckpt = Files.createTempDirectory("plog_e2e_ckpt").toString
    def resolved(p: Int, ts: Long): String =
      s"""{"schemaName":"s","tableName":"t","queryType":"RESOLVED","commitTs":$ts,""" +
        s""""partition":$p,"uniqKeys":{},"columns":{},"ddlQuery":""}"""
    // DML at ts 3,9 then a resolved(5) watermark: only ts=3 may flush
    append(dir, 0, Seq(event(0, 3, 1), event(0, 9, 2), resolved(0, 5)))

    val flushed = new ConcurrentLinkedQueue[java.lang.Long]()
    val raw = spark.readStream.format(fmt).option("path", dir).load()
    val q = graft.streaming.CdcPipeline
      .resolvedFlushStream(spark, ChangeEvent.decode(spark, raw))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.CdcPipeline.FlushedEvent], _: Long) =>
        batch.collect().foreach(f => flushed.add(java.lang.Long.valueOf(f.event.commitTs))); ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable()
    assert(flushed.toArray.map(_.asInstanceOf[java.lang.Long].longValue).toSeq == Seq(3L),
      "exact watermark: ts=3 flushes at resolved(5), ts=9 stays buffered")
    // advancing the watermark in a later file append flushes the buffer
    append(dir, 0, Seq(resolved(0, 10)))
    q.processAllAvailable(); q.stop()
    assert(flushed.toArray.map(_.asInstanceOf[java.lang.Long].longValue).toSeq.sorted == Seq(3L, 9L))
  }

  test("offset json round-trips") {
    val o = LogOffsets(Map(2 -> 7L, 0 -> 12L))
    assert(o.json() == """{"0":12,"2":7}""")
    assert(LogOffsets.parse(o.json()) == o)
    assert(LogOffsets.parse("{}") == LogOffsets(Map.empty))
  }
}

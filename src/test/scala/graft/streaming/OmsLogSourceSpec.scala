package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.sources.PartitionedLogSource

/** S9 end-to-end: the OceanBase OMS leg consumed through the DSv2
  * partitioned log source — OMS JSON records (`message/oceanbase/
  * message.go:33-120`) decode to [[ChangeEvent]]s and drive the SAME
  * resolved-ts state machine as the TiCDC leg, with HEARTBEAT records
  * advancing the per-table checkpoint without data (ST10) and the
  * checkpoint surviving a query restart (ST7). The TiCDC twin is
  * PartitionedLogSourceSpec; only the decoder differs — which is the
  * protocol-agnostic claim this spec pins.
  */
class OmsLogSourceSpec extends SparkSpec {

  private val fmt = classOf[PartitionedLogSource].getName

  private def oms(recordType: String, ts: Long, p: Int, keys: String = "{}",
      ddl: String = ""): String = {
    val rowKeys = if (keys == "{}") "[]" else "[\"id\"]"
    s"""{"recordType":"$recordType","dbName":"s","tableName":"t",""" +
      s""""timestamp":"$ts","ddl":"$ddl","partition":$p,""" +
      s""""rowKeys":$rowKeys,"fieldValues":$keys}"""
  }
  private def dml(recordType: String, ts: Long, p: Int, id: Int): String =
    oms(recordType, ts, p, s"""{"id":"$id","v":"x$id"}""")

  private def append(dir: String, p: Int, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, s"partition-$p.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("OMS leg: log source -> OmsEvents.decode -> heartbeat checkpoint advance") {
    val dir  = Files.createTempDirectory("oms_log").toString
    val ckpt = Files.createTempDirectory("oms_log_ckpt").toString
    // partition 0: a full-migration ROW (ts 1), an incremental INSERT
    // (ts 3), an UPDATE beyond the first heartbeat (ts 9), and a
    // HEARTBEAT at ts 5 — only ts ≤ 5 may flush; partition 1 carries a
    // DDL (ts 2) under its own heartbeat, proving partition-parallel
    // decode through the same query
    append(dir, 0, Seq(
      dml("ROW", 1, 0, 1), dml("INSERT", 3, 0, 2), dml("UPDATE", 9, 0, 3),
      oms("HEARTBEAT", 5, 0)))
    append(dir, 1, Seq(
      oms("DDL", 2, 1, ddl = "ALTER TABLE t ADD COLUMN c INT"),
      oms("HEARTBEAT", 4, 1)))

    val flushed = new ConcurrentLinkedQueue[(String, Long, String)]()
    def start() = {
      val raw = spark.readStream.format(fmt).option("path", dir).load()
      CdcPipeline.resolvedFlushStream(spark, OmsEvents.decode(spark, raw))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[CdcPipeline.FlushedEvent], _: Long) =>
          batch.collect().foreach(f =>
            flushed.add((f.event.queryType, f.event.commitTs, f.event.ddlQuery)))
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }

    val q1 = start()
    q1.processAllAvailable()
    val got1 = flushed.toArray(Array.empty[(String, Long, String)]).toSeq.sortBy(_._2)
    // OMS seconds scale to the engine's ms commit-ts domain; ROW applies
    // as INSERT; the DDL text survives decode; ts 9 stays buffered
    assert(got1 == Seq(
      ("INSERT", 1000L, ""), ("DDL", 2000L, "ALTER TABLE t ADD COLUMN c INT"),
      ("INSERT", 3000L, "")), s"first flush: $got1")

    // a later heartbeat flushes the buffered UPDATE
    append(dir, 0, Seq(oms("HEARTBEAT", 10, 0)))
    q1.processAllAvailable()
    assert(flushed.toArray.length == 4 &&
      flushed.toArray(Array.empty[(String, Long, String)]).exists(f =>
        f._1 == "UPDATE" && f._2 == 9000L),
      "heartbeat must flush buffered DML <= its ts")
    q1.stop()

    // restart: the heartbeat-advanced checkpoint survived — a replayed
    // DML at ts 7 (< 10) is dropped as obsolete, fresh DML at ts 12
    // flushes under the next heartbeat
    flushed.clear()
    append(dir, 0, Seq(dml("INSERT", 7, 0, 90), dml("INSERT", 12, 0, 91),
      oms("HEARTBEAT", 15, 0)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val got3 = flushed.toArray(Array.empty[(String, Long, String)]).toSeq
    assert(got3 == Seq(("INSERT", 12000L, "")),
      s"obsolete replay below the persisted checkpoint must drop: $got3")
  }
}

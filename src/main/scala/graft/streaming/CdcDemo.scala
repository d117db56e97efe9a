package graft.streaming

import graft.core.Graft
import graft.sources.PartitionedLogSource

/** Runnable end-to-end CDC drive: per-partition JSON logs → DSv2
  * partitioned log source (one task per topic partition — the Kafka
  * consume contract, SANDBOX.md §1) → decode → resolved-ts flush
  * (Structured Streaming) → DDL-barrier split → idempotent apply.
  * `sbt "runMain graft.streaming.CdcDemo"` prints the flushed stream and
  * the target table state after replaying the same batch twice.
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(4)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val raw = Seq(
      """{"schemaName":"db","tableName":"t","queryType":"INSERT","commitTs":1,"partition":0,"uniqKeys":{"id":"k1"},"columns":{"id":"k1","val":"v1"},"ddlQuery":""}""",
      """{"schemaName":"db","tableName":"t","queryType":"INSERT","commitTs":3,"partition":1,"uniqKeys":{"id":"k2"},"columns":{"id":"k2","val":"v2"},"ddlQuery":""}""",
      """{"schemaName":"db","tableName":"t","queryType":"UPDATE","commitTs":4,"partition":0,"uniqKeys":{"id":"k1"},"columns":{"id":"k1","val":"v1b"},"ddlQuery":""}""",
      """{"schemaName":"db","tableName":"t","queryType":"RESOLVED","commitTs":5,"partition":0,"uniqKeys":{},"columns":{},"ddlQuery":""}""",
      """{"schemaName":"db","tableName":"t","queryType":"DDL","commitTs":6,"partition":0,"uniqKeys":{},"columns":{},"ddlQuery":"ALTER TABLE t ADD COLUMN c INT"}""",
      """{"schemaName":"db","tableName":"t","queryType":"DELETE","commitTs":7,"partition":1,"uniqKeys":{"id":"k2"},"columns":{"id":"k2"},"ddlQuery":""}""",
      """{"schemaName":"db","tableName":"t","queryType":"RESOLVED","commitTs":9,"partition":0,"uniqKeys":{},"columns":{},"ddlQuery":""}""")

    // stand-in broker: the event's partition field routes it to its
    // per-partition append-only log, consumed partition-parallel
    val dir = java.nio.file.Files.createTempDirectory("cdc_demo_log").toString
    raw.groupBy(l => if (l.contains("\"partition\":1")) 1 else 0).foreach { case (p, lines) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"partition-$p.jsonl"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val rawStream = spark.readStream
      .format(classOf[PartitionedLogSource].getName).option("path", dir).load()
    val events = ChangeEvent.decode(spark, rawStream)
    val q = CdcPipeline.resolvedFlushStream(spark, events)
      .writeStream.format("memory").queryName("flushed").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val flushed = spark.table("flushed").as[CdcPipeline.FlushedEvent]
      .collect().sortBy(f => (f.resolvedTs, f.seq)).toSeq
    println("== flushed stream (resolvedTs, commitTs, op, key) ==")
    flushed.foreach(f => println(
      s"  ${f.resolvedTs}  ${f.event.commitTs}  ${f.event.queryType}  ${f.event.key}"))

    val phases = CdcPipeline.splitAtDdl(flushed.map(_.event))
    println(s"== ddl phases: ${phases.map(p => p.ddl.map(_.ddlQuery).getOrElse("-") + s" (+${p.dml.size} dml)").mkString(" | ")}")

    var target = Seq(("k0", "seed")).toDF("id", "val")
    phases.foreach { p =>
      target = CdcPipeline.applyBatch(spark, target, p.dml, "id", Seq("val"))
      p.ddl.foreach(d => println(s"== applying DDL at ts=${d.commitTs}: ${d.ddlQuery}"))
    }
    // replay the whole flushed batch once more — must be a no-op
    val replayed = CdcPipeline.applyBatch(spark, target, flushed.map(_.event), "id", Seq("val"))
    println("== final target state ==")
    replayed.orderBy("id").collect().foreach(r => println(s"  ${r.getString(0)} -> ${r.getString(1)}"))
    spark.stop()
  }
}

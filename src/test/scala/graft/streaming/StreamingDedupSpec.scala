package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming ingestion dedup — the shape a continuously-fed training
  * corpus needs: exact dedup on a content fingerprint with BOUNDED state
  * via `dropDuplicatesWithinWatermark` (state for a fingerprint is
  * droppable once the watermark passes its event time — at 100 TB/day
  * unbounded dedup state is the thing that kills the job).
  */
class StreamingDedupSpec extends SparkSpec {

  test("dropDuplicatesWithinWatermark dedups the stream and emits each doc once") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "event_time")
      .withColumn("fp", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text")))
      .withWatermark("event_time", "1 minute")
      .dropDuplicatesWithinWatermark("fp")
    val q = docs.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: three docs, one duplicated content under two ids
      input.addData(Seq(
        (1L, "the quick brown fox", ts(0)),
        (2L, "a different document", ts(1)),
        (3L, "the quick brown fox", ts(2))))
      q.processAllAvailable()
      // batch 2: replay of doc 1's content inside the watermark window
      // (dropped) + a genuinely new doc
      input.addData(Seq(
        (4L, "the quick brown fox", ts(10)),
        (5L, "yet another document", ts(11))))
      q.processAllAvailable()

      val out = s.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(out.size == 3, s"3 distinct contents expected, got $out")
      assert(out.contains(2L) && out.contains(5L),
        s"unique docs must pass: $out")
      assert(!(out.contains(1L) && out.contains(3L)),
        s"duplicated content must emit exactly once: $out")
      assert(!out.contains(4L), s"in-window replay must drop: $out")
    } finally q.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermark semantics for the general streaming operators: append-mode
  * window close, late-data drop, bounded-state dedup, session windows,
  * and the watermarked stream-stream interval join.
  */
class StreamOpsSpec extends SparkSpec {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$sec%02d")

  test("tumblingAgg append mode: windows emit once closed, late rows dropped") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = StreamOps.tumblingAgg(
      input.toDF().toDF("ts", "k", "v"),
      "ts", "5 minutes", "10 minutes", Seq("k"),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
    val q = out.writeStream.format("memory").queryName("tumble_out")
      .outputMode("append").start()
    try {
      // window [10:00,10:10): two rows for a, one for b
      input.addData(Seq((ts(1), "a", 1L), (ts(4), "a", 2L), (ts(7), "b", 10L)))
      q.processAllAvailable()
      // nothing emitted: watermark (max 10:07 - 5m = 10:02) hasn't passed 10:10
      assert(s.table("tumble_out").count() == 0)

      // advance event time to 10:21 -> watermark 10:16 > 10:10: first window closes
      input.addData(Seq((ts(21), "a", 5L)))
      q.processAllAvailable()
      val closed = s.table("tumble_out")
        .select(col("k"), col("n"), col("sv")).as[(String, Long, Long)].collect().toSet
      assert(closed == Set(("a", 2L, 3L), ("b", 1L, 10L)))

      // a row at 10:03 is now later than the watermark -> dropped, no update
      input.addData(Seq((ts(3), "a", 100L)))
      q.processAllAvailable()
      assert(s.table("tumble_out").count() == 2)
    } finally q.stop()
  }

  test("dedupWithinWatermark keeps the first row per key with bounded state") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "k", "v"), "ts", "10 minutes", Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts(1), "a", 1L), (ts(2), "a", 2L), (ts(3), "b", 3L)))
      q.processAllAvailable()
      input.addData(Seq((ts(4), "a", 4L), (ts(5), "b", 5L), (ts(6), "c", 6L)))
      q.processAllAvailable()
      val got = s.table("dedup_out").select(col("k"), col("v"))
        .as[(String, Long)].collect().toSet
      assert(got == Set(("a", 1L), ("b", 3L), ("c", 6L)))

      // same key long after the watermark expired its state: admitted again
      // (bounded state is the contract — not global-history dedup).
      // The watermark used for eviction is the previous batch's, so advance
      // it in its own batch before re-sending the key.
      input.addData(Seq((ts(45), "z", 0L)))
      q.processAllAvailable()
      input.addData(Seq((ts(59), "a", 99L)))
      q.processAllAvailable()
      assert(s.table("dedup_out").where(col("k") === "a").count() == 2)
    } finally q.stop()
  }

  test("sessionAgg merges rows within the gap and closes on watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = StreamOps.sessionAgg(
      input.toDF().toDF("ts", "k", "v"),
      "ts", "5 minutes", "5 minutes", Seq("k"),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // k=a: 10:01, 10:04, 10:08 chain into one session; 10:20 starts another
      input.addData(Seq((ts(1), "a", 1L), (ts(4), "a", 2L), (ts(8), "a", 4L)))
      q.processAllAvailable()
      input.addData(Seq((ts(20), "a", 8L)))
      q.processAllAvailable()
      input.addData(Seq((ts(40), "a", 0L))) // advance watermark past both
      q.processAllAvailable()
      val got = s.table("sess_out").select(col("n"), col("sv"))
        .as[(Long, Long)].collect().toSet
      assert(got.contains((3L, 7L)) && got.contains((1L, 8L)))
    } finally q.stop()
  }

  test("enrichWithStatic joins each micro-batch against the broadcast dim") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val events = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.enrichWithStatic(
      events.toDF().toDF("ts", "user"), dim, Seq("user"), "left_outer")
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      events.addData(Seq((ts(0), 1L), (ts(1), 2L), (ts(2), 3L)))
      q.processAllAvailable()
      val got = s.table("enrich_out").select(col("user"), col("tier"))
        .as[(Long, Option[String])].collect().toSet
      assert(got == Set((1L, Some("gold")), (2L, Some("silver")), (3L, None)))
    } finally q.stop()
  }

  test("intervalJoin matches the batch join on the same data") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.intervalJoin(
      views.toDF().toDF("vts", "vuser"),
      clicks.toDF().toDF("cts", "cuser"),
      "vts", "cts", "5 minutes", "10 MINUTES",
      col("vuser") === col("cuser"))
    val q = out.writeStream.format("memory").queryName("join_out")
      .outputMode("append").start()
    try {
      views.addData(Seq((ts(0), 1L), (ts(0), 2L), (ts(30), 3L)))
      clicks.addData(Seq((ts(5), 1L), (ts(20), 2L), (ts(35), 3L)))
      views.addData(Seq((ts(59), 99L)))  // advance both watermarks
      clicks.addData(Seq((ts(59), 98L)))
      q.processAllAvailable()
      val got = s.table("join_out").select(col("vuser")).as[Long].collect().toSet
      // user1: click 5m after view -> in window; user2: 20m -> out; user3: 5m -> in
      assert(got == Set(1L, 3L))
    } finally q.stop()
  }

  test("nearDupDropWithinWatermark drops band collisions, keeps distinct docs") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about distributed query engines at scale"
    val out = StreamOps.nearDupDropWithinWatermark(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes", "text")
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      // first occurrence of A passes; exact duplicate of A (same band) drops;
      // B (different band) passes
      input.addData(Seq((ts(1), 1L, textA), (ts(2), 2L, textA), (ts(3), 3L, textB)))
      q.processAllAvailable()
      // advance the watermark far enough to flush append-mode output
      input.addData(Seq((ts(40), 99L, "flush marker row far in the future")))
      q.processAllAvailable()
      val ids = s.table("neardup_out").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L) && ids.contains(3L) && !ids.contains(2L),
        s"expected dup doc 2 dropped, got $ids")
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Windowed streaming aggregation with watermark: the incremental result
  * over the events table must equal the batch q6-style tumbling-window
  * aggregate — stream/batch parity, the core Structured Streaming
  * guarantee the engine's streaming surface relies on.
  */
class StreamingWindowSpec extends SparkSpec {

  test("watermarked tumbling-window agg matches the batch equivalent") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val events = Tables(s, sfDir).events
      .select(col("ts"), col("event_type"), col("value"))
      .as[(java.sql.Timestamp, String, Double)]
      .collect().toSeq

    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamed = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 1000000.0)) / 1000000.0).as("sum_value"))
    val q = streamed.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      // feed in two chunks to force multiple micro-batches
      val (a, b) = events.splitAt(events.size / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()

      val got = s.table("win_out")
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
          col("event_type"), col("n_events"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

      val expected = Tables(s, sfDir).events
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          (sum(floor(col("value") * 1000000.0)) / 1000000.0).as("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

      assert(got == expected)
    } finally q.stop()
  }
}

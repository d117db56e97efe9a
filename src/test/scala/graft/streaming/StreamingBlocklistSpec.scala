package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Blocklist

/** The blocklist gate on a STREAM — a continuously-fed corpus tags and
  * gates each micro-batch with the same frozen automaton (a pure
  * projection: no state, no shuffle, so it composes with any downstream
  * watermarking). Pins that the native ac_counts expression serializes
  * into streaming micro-batch tasks and that the stream's verdicts match
  * the batch twin exactly.
  */
class StreamingBlocklistSpec extends SparkSpec {

  test("streaming gate verdicts equal the batch twin per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val terms = Seq("bad", "worse")
    val rows = Seq(
      (1L, "a clean doc with plenty of words here"),
      (2L, "bad bad bad worse bad"),            // dense hits -> fail
      (3L, "one bad word in a long enough doc so the density stays low"),
      (4L, "worseworseworse"))                  // packed hits -> fail

    val input = MemoryStream[(Long, String)]
    val gated = Blocklist.summary(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", terms, maxPer10k = 600)
    val q = gated.writeStream.format("memory").queryName("blk_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(2))
      q.processAllAvailable()
      input.addData(rows.drop(2))
      q.processAllAvailable()

      val got = s.table("blk_out")
        .select("doc_id", "n_terms", "n_hits", "hits_per_10k", "pass")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
        .toMap
      val want = Blocklist.summary(rows.toDF("doc_id", "text"), "doc_id", "text",
          terms, maxPer10k = 600)
        .select("doc_id", "n_terms", "n_hits", "hits_per_10k", "pass")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
        .toMap
      assert(got == want, s"stream vs batch: $got vs $want")
      assert(got(1L)._4 == 1 && got(3L)._4 == 1, s"clean/low-density docs pass: $got")
      assert(got(2L)._4 == 0 && got(4L)._4 == 0, s"dense docs fail: $got")
    } finally q.stop()
  }
}

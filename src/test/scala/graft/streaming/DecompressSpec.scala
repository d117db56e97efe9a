package graft.streaming

import java.io.ByteArrayOutputStream

import net.jpountz.lz4.LZ4FrameOutputStream
import org.xerial.snappy.Snappy

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S10: compressed message payloads round-trip through the decode
  * pipeline (compress → Column decompress → from_json-ready string).
  */
class DecompressSpec extends SparkSpec {

  private val json =
    """{"schemaName":"db","tableName":"t","queryType":"INSERT","commitTs":7,"partition":0,"uniqKeys":{"id":"k"},"columns":{"id":"k"},"ddlQuery":""}"""

  test("snappy payload decodes through the event pipeline") {
    val s = spark
    import s.implicits._
    val compressed = Snappy.compress(json.getBytes("UTF-8"))
    val raw = Seq(compressed).toDF("value")
      .select(Decompress.payload(col("value"), "snappy").as("value"))
    val ev = ChangeEvent.decode(s, raw).head()
    assert(ev.queryType == "INSERT" && ev.commitTs == 7L)
  }

  test("lz4-frame payload decodes through the event pipeline") {
    val s = spark
    import s.implicits._
    val bos = new ByteArrayOutputStream()
    val lz4 = new LZ4FrameOutputStream(bos)
    lz4.write(json.getBytes("UTF-8")); lz4.close()
    val raw = Seq(bos.toByteArray).toDF("value")
      .select(Decompress.payload(col("value"), "lz4").as("value"))
    val ev = ChangeEvent.decode(s, raw).head()
    assert(ev.queryType == "INSERT" && ev.uniqKeys == Map("id" -> "k"))
  }

  test("gzip payload decodes through the event pipeline") {
    val s = spark
    import s.implicits._
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(json.getBytes("UTF-8")); gz.close()
    val raw = Seq(bos.toByteArray).toDF("value")
      .select(Decompress.payload(col("value"), "gzip").as("value"))
    val ev = ChangeEvent.decode(s, raw).head()
    assert(ev.queryType == "INSERT" && ev.commitTs == 7L)
  }

  test("zlib payload decodes through the event pipeline") {
    val s = spark
    import s.implicits._
    val deflater = new java.util.zip.Deflater()
    val src = json.getBytes("UTF-8")
    deflater.setInput(src); deflater.finish()
    val buf = new Array[Byte](src.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val raw = Seq(buf.take(n)).toDF("value")
      .select(Decompress.payload(col("value"), "zlib").as("value"))
    val ev = ChangeEvent.decode(s, raw).head()
    assert(ev.queryType == "INSERT" && ev.uniqKeys == Map("id" -> "k"))
  }

  test("codec 'none' passes payloads through untouched") {
    val s = spark
    import s.implicits._
    val raw = Seq(json.getBytes("UTF-8")).toDF("value")
      .select(Decompress.payload(col("value"), "none").as("value"))
    assert(ChangeEvent.decode(s, raw).head().commitTs == 7L)
  }
}

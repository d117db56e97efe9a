package graft.streaming

import java.io.ByteArrayInputStream

import net.jpountz.lz4.LZ4FrameInputStream
import org.xerial.snappy.Snappy

import org.apache.spark.sql.{Column, functions => F}

/** Message-payload decompression (SURVEY S10; `message/compress.go:27-105`
  * — the reference's snappy / lz4-frame codecs on Kafka payloads). When
  * the Kafka broker codec is transparent this is unused; when producers
  * pre-compress payloads inside the message value (the reference's case),
  * decode before `from_json`.
  */
object Decompress {

  def snappy(bytes: Array[Byte]): Array[Byte] = Snappy.uncompress(bytes)

  def lz4Frame(bytes: Array[Byte]): Array[Byte] = {
    val in  = new LZ4FrameInputStream(new ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** Column form for the decode pipeline: codec ∈ {none, snappy, lz4}. */
  def payload(value: Column, codec: String): Column = codec match {
    case "snappy" => snappyUdf(value)
    case "lz4"    => lz4Udf(value)
    case _        => value
  }

  private val snappyUdf = F.udf(snappy _)
  private val lz4Udf    = F.udf(lz4Frame _)
}

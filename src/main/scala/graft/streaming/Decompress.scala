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

  /** gzip — the other codec OMS-style producers ship; JDK-native. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val in  = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** raw DEFLATE (zlib wrapper) — JDK Inflater, no stream framing. */
  def zlib(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated zlib payload")
        out.write(buf, 0, n)
      }
    } finally inf.end()
    out.toByteArray
  }

  /** Column form for the decode pipeline:
    * codec ∈ {none, snappy, lz4, gzip, zlib}.
    */
  def payload(value: Column, codec: String): Column = codec match {
    case "snappy" => snappyUdf(value)
    case "lz4"    => lz4Udf(value)
    case "gzip"   => gzipUdf(value)
    case "zlib"   => zlibUdf(value)
    case _        => value
  }

  private val snappyUdf = F.udf(snappy _)
  private val lz4Udf    = F.udf(lz4Frame _)
  private val gzipUdf   = F.udf(gzip _)
  private val zlibUdf   = F.udf(zlib _)
}

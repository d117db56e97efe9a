package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches. The decode step is a clearly-marked STUB (no codec libraries
  * in this container) producing deterministic fake features; everything
  * around it — schema, batching, partitioning, the Dataset signature —
  * is the real shape a decode UDF plugs into.
  *
  * At 100 TB: payload columns stay off the shuffle path (metadata-only
  * projections are pushed to the scan; parquet column pruning skips the
  * blobs entirely when untouched), and decode runs mapPartitions-batched
  * so per-record codec setup amortizes.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, content_hash: String,
      width: Int, height: Int, n_frames: Long)

  /** Binary payload column from any source column (here: text bytes —
    * the fixtures carry no real media; the pipeline shape is identical).
    */
  def asBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("content"))

  /** Metadata projection — pure Column exprs, no decode, prunable. */
  def metadata(bin: DataFrame): DataFrame =
    bin.select(col("doc_id"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_hash"))

  /** STUB decode: deterministic fake of an image/video probe. A real
    * implementation would decode `content` with a codec here (per
    * partition, batched); the container has no media libraries, so
    * dimensions are derived from the byte length — stable, testable
    * plumbing with the exact production signature.
    */
  def decodeFeatures(spark: SparkSession, bin: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("content")).as[MediaRecord]
      .mapPartitions { it =>
        // one "codec" per partition — where a real decoder would init
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val bytes = Option(r.content).getOrElse(Array.emptyByteArray)
          val hash  = md.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(
            doc_id = r.doc_id,
            n_bytes = bytes.length.toLong,
            content_hash = hash,
            width = (bytes.length % 640) + 1,   // STUB: fake decode
            height = (bytes.length % 480) + 1,  // STUB: fake decode
            n_frames = bytes.length / 1000 + 1) // STUB: fake frame sample
        }
      }
  }
}

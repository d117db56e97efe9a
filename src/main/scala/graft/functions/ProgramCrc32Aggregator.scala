package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fused PROGRAM_CRC32 pass (SURVEY §2.10's optional Aggregator): the
  * reference's client-side fallback for LONG/LONG RAW columns computes
  * BOTH the wrapping-uint32 CRC32 sum and the `map[row]count` multiset in
  * one scan over the chunk (`database/mysql/data_compare.go:473-598`).
  * The built-in path does it in two plans (crc32WrapSum + rowMultiset);
  * this typed Aggregator reproduces the reference's single pass — one
  * buffer per chunk group carrying (sum, multiset), merged associatively.
  *
  * Buffer size is bounded by the chunk's distinct-row count, exactly like
  * the reference's per-chunk map (chunk-size rows, e.g. 10k). Use the
  * two-plan built-ins when rows-per-group is unbounded.
  */
object ProgramCrc32Aggregator {

  final case class Buf(sum: Long, counts: Map[String, Long])
  final case class ProgramChecksum(crc32: Long, distinctRows: Long, totalRows: Long)

  private def crc(s: String): Long = {
    val c = new CRC32(); c.update(s.getBytes("UTF-8")); c.getValue
  }

  /** Aggregator over canonical row strings. */
  val aggregator: Aggregator[String, Buf, ProgramChecksum] =
    new Aggregator[String, Buf, ProgramChecksum] {
      override def zero: Buf = Buf(0L, Map.empty)
      override def reduce(b: Buf, row: String): Buf =
        Buf((b.sum + crc(row)) & 0xFFFFFFFFL,
          b.counts.updated(row, b.counts.getOrElse(row, 0L) + 1L))
      override def merge(a: Buf, b: Buf): Buf =
        Buf((a.sum + b.sum) & 0xFFFFFFFFL,
          b.counts.foldLeft(a.counts) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) })
      override def finish(b: Buf): ProgramChecksum =
        ProgramChecksum(b.sum, b.counts.size.toLong, b.counts.valuesIterator.sum)
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[ProgramChecksum] = Encoders.product[ProgramChecksum]
    }
}

package graft.sources

import java.io.File

import scala.io.Source

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Partition-parallel streaming log source (SURVEY ST1, S8/S9 semantics).
  *
  * The reference consumes one Kafka topic partition per worker thread with
  * per-partition offset tracking (`message/tidb/group.go:107-296`,
  * `message/oceanbase/consume.go`). No Kafka broker or connector jar exists
  * in this sandbox (SANDBOX.md §1), so this DSv2 `MicroBatchStream`
  * demonstrates the SAME consume contract over a directory of append-only
  * per-partition log files (`partition-<i>.jsonl`):
  *
  *   - each topic partition plans as its OWN `InputPartition` every
  *     micro-batch → one Spark task per partition, the reference's
  *     partition→thread mapping expressed in Spark's scheduler;
  *   - offsets are a per-partition map (`{"0":12,"1":34}`), advanced
  *     monotonically and committed through the checkpoint log — restart
  *     resumes exactly where the last batch ended (ST7);
  *   - within a partition, rows surface in append order carrying
  *     (partition, offset, value) — the per-partition ordering Kafka
  *     guarantees and the CDC pipeline's resolved-ts watermark assumes.
  *
  * `ChangeEvent.decode` consumes the `value` column unchanged; the
  * production delta is `readStream.format("kafka")` in place of this
  * class name (plus broker options) — the downstream pipeline is
  * identical. Local files stand in for the broker: reads are
  * executor-side and would be remote fetches in production.
  */
final class PartitionedLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PartitionedLogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PartitionedLogTable(properties.get("path"),
      Option(properties.get("maxRecordsPerTrigger")).map(_.toLong))
}

object PartitionedLogSource {
  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType)))

  private val FileName = "partition-(\\d+)\\.jsonl".r

  def partitionFiles(dir: String): Seq[(Int, File)] = {
    val fs = Option(new File(dir).listFiles()).getOrElse(Array.empty)
    fs.toSeq.flatMap { f =>
      f.getName match {
        case FileName(p) => Some(p.toInt -> f)
        case _           => None
      }
    }.sortBy(_._1)
  }

  def lineCount(f: File): Long = {
    val src = Source.fromFile(f, "UTF-8")
    try src.getLines().size.toLong finally src.close()
  }
}

final class PartitionedLogTable(dir: String, maxRecords: Option[Long])
  extends Table with SupportsRead {
  require(dir != null, "path option is required")
  override def name(): String = s"partitioned_log($dir)"
  override def schema(): StructType = PartitionedLogSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PartitionedLogSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PartitionedLogStream(dir, maxRecords)
        override def description(): String = s"partitioned_log($dir)"
      }
    }
}

/** Per-partition line-count offsets, serialized as a sorted JSON map. */
final case class LogOffsets(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1).map { case (p, c) => s""""$p":$c""" }
      .mkString("{", ",", "}")
}

object LogOffsets {
  def parse(s: String): LogOffsets = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) LogOffsets(Map.empty)
    else LogOffsets(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":").map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
    }.toMap)
  }
}

final class PartitionedLogStream(dir: String, maxRecords: Option[Long] = None)
  extends MicroBatchStream with SupportsAdmissionControl {
  import PartitionedLogSource._

  private def available(): Map[Int, Long] =
    partitionFiles(dir).map { case (p, f) => p -> lineCount(f) }.toMap

  override def latestOffset(): Offset = LogOffsets(available())

  /** Bounded micro-batches — the Kafka source's maxOffsetsPerTrigger.
    * The cap is split across partitions proportionally to their backlog
    * (largest-remainder rounding, ties to the lower partition id), so a
    * deep partition cannot starve shallow ones and batch size stays
    * bounded no matter how far behind the stream starts — the property
    * that makes catch-up over a large backlog feasible.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxRecords.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = available()
    val s     = start.asInstanceOf[LogOffsets].counts
    limit match {
      case mr: ReadMaxRows =>
        val cap     = mr.maxRows()
        val backlog = avail.map { case (p, eo) => p -> math.max(0L, eo - s.getOrElse(p, 0L)) }
        val total   = backlog.values.sum
        if (total <= cap) LogOffsets(avail)
        else {
          // BigInt intermediate: cap*b overflows Long for very large
          // maxRecordsPerTrigger × backlog products
          val base = backlog.map { case (p, b) => p -> (BigInt(cap) * b / total).toLong }
          var rem  = cap - base.values.sum
          val order = backlog.toSeq
            .map { case (p, b) => (p, (BigInt(cap) * b % total).toLong) }
            .sortBy { case (p, frac) => (-frac, p) }
          val bumped = scala.collection.mutable.Map(base.toSeq: _*)
          for ((p, _) <- order if rem > 0 && bumped(p) < backlog(p)) {
            bumped(p) += 1; rem -= 1
          }
          LogOffsets(bumped.map { case (p, share) => p -> (s.getOrElse(p, 0L) + share) }.toMap)
        }
      case _ => LogOffsets(avail)
    }
  }

  override def initialOffset(): Offset =
    LogOffsets(partitionFiles(dir).map { case (p, _) => p -> 0L }.toMap)

  override def deserializeOffset(json: String): Offset = LogOffsets.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** ONE InputPartition per advancing topic partition — the reference's
    * partition→consumer-thread mapping, expressed as Spark's task
    * parallelism. A stalled partition plans no work.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffsets].counts
    val e = end.asInstanceOf[LogOffsets].counts
    e.toSeq.sortBy(_._1).flatMap { case (p, eo) =>
      val so = s.getOrElse(p, 0L)
      if (eo > so)
        Some(LogSlice(p, new File(dir, s"partition-$p.jsonl").getPath, so, eo): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = LogSliceReaderFactory
}

final case class LogSlice(partition: Int, path: String, startLine: Long, endLine: Long)
  extends InputPartition

object LogSliceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[LogSlice]
    new PartitionReader[InternalRow] {
      private val src   = Source.fromFile(slice.path, "UTF-8")
      private val lines = src.getLines()
      // Long cursor — zipWithIndex is Int-indexed and would silently wrap
      // past 2^31 lines while LogOffsets carries Long counts
      private var lineNo = -1L
      private var cur: String = _
      override def next(): Boolean = {
        while (lineNo + 1 < slice.startLine && lines.hasNext) { lines.next(); lineNo += 1 }
        if (lineNo + 1 < slice.endLine && lines.hasNext) {
          cur = lines.next(); lineNo += 1; true
        } else false
      }
      override def get(): InternalRow = new GenericInternalRow(
        Array[Any](slice.partition, lineNo, UTF8String.fromString(cur)))
      override def close(): Unit = src.close()
    }
  }
}

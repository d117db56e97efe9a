package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 source where the reference's CHUNK is Spark's
  * InputPartition (SURVEY §2.1 S1/S2: chunked table scan): the key range
  * [start, end) splits into `chunkSize`-wide chunks, one InputPartition
  * each, and key-range predicates PRUNE WHOLE CHUNKS at planning time —
  * the planner-level twin of `DBMS_PARALLEL_EXECUTE` chunking plus the
  * resume path's only-failed-chunks restriction (O9).
  *
  * Rows are `(k, v)` with `v = (k · 2654435761) % 997` — a deterministic
  * formula any engine reproduces, so reads are oracle-checkable.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.ChunkedRangeSource")
  *   .option("start", 0).option("end", 1000000).option("chunkSize", 4096)
  *   .load().where($"k" >= 8192 && $"k" < 16384)   // scans exactly 2 chunks
  * }}}
  */
class ChunkedRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkedRangeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // properties arrive case-preserved — normalize so option("chunkSize")
    // and option("chunksize") both resolve
    val opts = new CaseInsensitiveStringMap(properties)
    new ChunkedRangeTable(
      opts.getLong("start", 0L),
      opts.getLong("end", 0L),
      opts.getLong("chunksize", 4096L))
  }
}

object ChunkedRangeSource {
  val Schema: StructType =
    StructType(Seq(StructField("k", LongType, false), StructField("v", LongType, false)))
  def valueOf(k: Long): Long = (k * 2654435761L) % 997L
}

final class ChunkedRangeTable(start: Long, end: Long, chunkSize: Long)
    extends Table with SupportsRead {
  override def name(): String = s"chunked_range($start,$end,$chunkSize)"
  override def schema(): StructType = ChunkedRangeSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChunkedRangeScanBuilder(start, end, chunkSize)
}

/** Accepts k-range filters and column pruning; everything else stays
  * with Spark. A projection of only `k` (or only `v`) narrows the rows
  * the readers materialize — the DSv2 twin of parquet ReadSchema pruning.
  */
final class ChunkedRangeScanBuilder(start: Long, end: Long, chunkSize: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required: StructType = ChunkedRangeSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThanOrEqual("k", _: Long) | GreaterThan("k", _: Long) |
           LessThan("k", _: Long) | LessThanOrEqual("k", _: Long) |
           org.apache.spark.sql.sources.EqualTo("k", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      // v+1 at Long.MaxValue overflows to MinValue — guard the extremes:
      // k > MAX admits nothing (empty range); k <= MAX admits everything
      // (no-op); k == MAX is empty because end is exclusive and <= MAX,
      // so lo = MAX with hi <= MAX yields the empty range correctly.
      case GreaterThanOrEqual("k", v: Long) => lo = math.max(lo, v)
      case GreaterThan("k", v: Long) =>
        lo = if (v == Long.MaxValue) Long.MaxValue else math.max(lo, v + 1)
      case LessThan("k", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("k", v: Long) =>
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case org.apache.spark.sql.sources.EqualTo("k", v: Long) =>
        lo = math.max(lo, v)
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    rest // residual filters Spark must still apply
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ChunkedRangeScan(start, lo, hi, chunkSize, required)
}

final class ChunkedRangeScan(tableStart: Long, lo: Long, hi: Long, chunkSize: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ChunkedRangeScan(lo=$lo, hi=$hi, chunkSize=$chunkSize, cols=${required.fieldNames.mkString(",")})"

  /** One InputPartition per surviving chunk: chunks wholly outside
    * [lo, hi) are pruned here, at planning time — they produce no task.
    * Chunk boundaries stay aligned to the TABLE's origin so pruning
    * commutes with predicates (the same rows land in the same chunk no
    * matter the filter).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val firstChunk = (lo - tableStart) / chunkSize
    val lastChunk = (hi - 1 - tableStart) / chunkSize
    (firstChunk to lastChunk).map { c =>
      val cLo = tableStart + c * chunkSize
      ChunkPartition(math.max(cLo, lo), math.min(cLo + chunkSize, hi)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChunkReaderFactory(required.fieldNames)
}

final case class ChunkPartition(lo: Long, hi: Long) extends InputPartition

final case class ChunkReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChunkPartition]
    new PartitionReader[InternalRow] {
      private var k = p.lo - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields.length)
      override def next(): Boolean = { k += 1; k < p.hi }
      override def get(): InternalRow = {
        // emit only the pruned schema, in its requested order
        var i = 0
        while (i < fields.length) {
          row.update(i, if (fields(i) == "k") k else ChunkedRangeSource.valueOf(k))
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}

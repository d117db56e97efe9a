package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC event model + decoder (SURVEY ST2; TiCDC open protocol
  * `message/tidb/message.go:42-265`, `event.go:39-72`; OceanBase OMS JSON
  * `message/oceanbase/message.go:33-120`).
  *
  * One normalized shape covers both reference protocols: row changes
  * (INSERT/UPDATE/DELETE) keyed by their unique columns, watermarks
  * (RESOLVED), DDL barriers, and OMS heartbeats.
  */
final case class ChangeEvent(
    schemaName: String,
    tableName: String,
    queryType: String, // INSERT | UPDATE | DELETE | DDL | RESOLVED | HEARTBEAT
    commitTs: Long,
    partition: Int,
    uniqKeys: Map[String, String],
    columns: Map[String, String],
    ddlQuery: String) {
  def key: String = uniqKeys.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
  def isDml: Boolean = queryType == "INSERT" || queryType == "UPDATE" || queryType == "DELETE"
}

object ChangeEvent {
  implicit val enc: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]

  /** Wire schema for `from_json` decoding of the Kafka value. */
  val jsonSchema: StructType = StructType(Seq(
    StructField("schemaName", StringType),
    StructField("tableName", StringType),
    StructField("queryType", StringType),
    StructField("commitTs", LongType),
    StructField("partition", IntegerType),
    StructField("uniqKeys", MapType(StringType, StringType)),
    StructField("columns", MapType(StringType, StringType)),
    StructField("ddlQuery", StringType)))

  /** Decode a stream/batch of JSON strings (the Kafka `value` column) into
    * typed events — `readStream.format("kafka")` plugs in upstream of this
    * unchanged.
    */
  def decode(spark: SparkSession, raw: DataFrame, valueCol: String = "value"): Dataset[ChangeEvent] = {
    import spark.implicits._
    raw.select(from_json(col(valueCol).cast("string"), jsonSchema).as("e"))
      .select(
        coalesce(col("e.schemaName"), lit("")).as("schemaName"),
        coalesce(col("e.tableName"), lit("")).as("tableName"),
        coalesce(col("e.queryType"), lit("")).as("queryType"),
        coalesce(col("e.commitTs"), lit(0L)).as("commitTs"),
        coalesce(col("e.partition"), lit(0)).as("partition"),
        coalesce(col("e.uniqKeys"), map()).as("uniqKeys"),
        coalesce(col("e.columns"), map()).as("columns"),
        coalesce(col("e.ddlQuery"), lit("")).as("ddlQuery"))
      .as[ChangeEvent]
  }
}

/** Per-table event buffer (SURVEY ST4/T3; `message/tidb/event.go:710-777`):
  * append out-of-order, extract everything ≤ a resolved ts in commit-ts
  * order. Used as the in-memory value of the streaming group state.
  */
final class EventGroup(initial: Seq[ChangeEvent] = Nil) {
  private var buf: Vector[ChangeEvent] = initial.toVector

  def append(e: ChangeEvent): Unit = buf = buf :+ e

  def buffered: Seq[ChangeEvent] = buf

  /** Extract (and remove) all events with commitTs ≤ resolved, sorted by
    * (commitTs, queryType, key) — the OrderSortedCommitTs flush
    * (`event.go:727-757`); sort keys beyond commitTs make ties
    * deterministic.
    */
  def resolvedFlush(resolved: Long): Seq[ChangeEvent] = {
    val (flush, keep) = buf.partition(_.commitTs <= resolved)
    buf = keep
    flush.sortBy(e => (e.commitTs, e.queryType, e.key))
  }
}

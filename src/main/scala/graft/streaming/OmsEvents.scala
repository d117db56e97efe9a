package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OceanBase OMS JSON protocol decoder (SURVEY S9/ST2;
  * `message/oceanbase/message.go:33-120`): full records (`ROW`) and
  * incremental records (`INSERT/UPDATE/DELETE/DDL/HEARTBEAT`) normalized
  * into the engine's [[ChangeEvent]] shape so the whole CDC pipeline
  * (resolved-ts flush, DDL barrier, idempotent apply) is protocol-agnostic.
  *
  * OMS wire shape: {recordType, dbName, tableName, timestamp (seconds,
  * string), ddl, rowKeys: [..], fieldValues: {col: val}}. ROW records are
  * full-snapshot rows → INSERT; HEARTBEAT advances the checkpoint without
  * data; timestamp seconds scale to the engine's commit-ts domain.
  */
object OmsEvents {

  val jsonSchema: StructType = StructType(Seq(
    StructField("recordType", StringType),
    StructField("dbName", StringType),
    StructField("tableName", StringType),
    StructField("timestamp", StringType),
    StructField("ddl", StringType),
    StructField("partition", IntegerType),
    StructField("rowKeys", ArrayType(StringType)),
    StructField("fieldValues", MapType(StringType, StringType))))

  def decode(spark: SparkSession, raw: DataFrame, valueCol: String = "value"): Dataset[ChangeEvent] = {
    import spark.implicits._
    raw.select(from_json(col(valueCol).cast("string"), jsonSchema).as("e"))
      .select(
        coalesce(col("e.dbName"), lit("")).as("schemaName"),
        coalesce(col("e.tableName"), lit("")).as("tableName"),
        when(col("e.recordType") === "ROW", "INSERT") // full-migration rows apply as inserts
          .otherwise(coalesce(col("e.recordType"), lit(""))).as("queryType"),
        (coalesce(col("e.timestamp"), lit("0")).cast("long") * 1000L).as("commitTs"),
        coalesce(col("e.partition"), lit(0)).as("partition"),
        coalesce(
          map_from_arrays(
            col("e.rowKeys"),
            transform(col("e.rowKeys"), k => element_at(col("e.fieldValues"), k))),
          map()).as("uniqKeys"),
        coalesce(col("e.fieldValues"), map()).as("columns"),
        coalesce(col("e.ddl"), lit("")).as("ddlQuery"))
      .as[ChangeEvent]
  }
}

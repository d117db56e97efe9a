package graft.cli

import java.io.FileInputStream
import java.nio.file.{Files, Paths}
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.operators.{DataCompare, Migrate}

/** Config-driven task dispatcher — the engine's equivalent of the
  * reference's ctl→master→worker task submission (SURVEY §3.1, CLI verbs
  * `README.md:96-112`): one properties file describes a task; the runner
  * executes the whole flow on Spark and writes report artifacts, so a
  * reference user's `dbms-ctl ... submit` becomes
  * `runMain graft.cli.TaskRunner task.properties`.
  *
  * Modes (`mode=`):
  *  - `data_compare`: src/dst parquet, chunked checksums → diff → repair
  *    SQL; writes chunk_status + diff parquet, repair.sql, summary line.
  *  - `csv_migrate`: parquet → canonicalized CSV export (S5 options).
  *  - `data_scan`: numeric-column profile (A5 classifier counts).
  *
  * Config keys: src, dst, out, cols (csv), chunkCol, chunkWidth, table.
  */
object TaskRunner {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TaskRunner <task.properties>")
    val props = new Properties()
    val in = new FileInputStream(args(0))
    try props.load(in) finally in.close()
    val conf = props.asScala.toMap

    val spark = Graft.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    try {
      conf("mode") match {
        case "data_compare" => dataCompare(spark, conf)
        case "csv_migrate"  => csvMigrate(spark, conf)
        case "data_scan"    => dataScan(spark, conf)
        case m => throw new IllegalArgumentException(s"unknown mode $m")
      }
    } finally spark.stop()
  }

  private def out(conf: Map[String, String]): String = {
    val dir = conf("out")
    new java.io.File(dir).mkdirs()
    dir
  }

  def dataCompare(spark: SparkSession, conf: Map[String, String]): Unit = {
    val cols = conf("cols").split(",").map(_.trim).toSeq
    val chunkWidth = conf.getOrElse("chunkWidth", "4096").toLong
    val cid = floor(col(conf("chunkCol")) / chunkWidth).cast("long")
    val src = spark.read.parquet(conf("src")).select(cols.map(col): _*)
    val dst = spark.read.parquet(conf("dst")).select(cols.map(col): _*)
    val dir = out(conf)

    val status = DataCompare.compareChunks(src, dst, cid, cols).cache()
    status.orderBy("chunk_id").write.mode("overwrite").parquet(s"$dir/chunk_status")
    val bad = status.where(col("status") =!= "EQUAL")
    val diff = DataCompare.rowDiff(src, dst, cols, Some(cid), Some(bad)).cache()
    diff.write.mode("overwrite").parquet(s"$dir/diff")
    val repair = DataCompare.repairSql(diff, conf.getOrElse("table", "target"), cols)
    val stmts = repair.orderBy("side", "stmt").select("stmt")
      .collect().map(_.getString(0))
    Files.write(Paths.get(s"$dir/repair.sql"),
      stmts.mkString("", ";\n", if (stmts.isEmpty) "" else ";\n").getBytes("UTF-8"))
    val sm = DataCompare.tableSummary(status).collect().head
    Files.writeString(Paths.get(s"$dir/summary.json"),
      s"""{"chunk_totals":${sm.getAs[Long]("chunk_totals")},""" +
        s""""equal_chunks":${sm.getAs[Long]("equal_chunks")},""" +
        s""""src_rows":${sm.getAs[Long]("src_rows")},"dst_rows":${sm.getAs[Long]("dst_rows")},""" +
        s""""table_status":"${sm.getAs[String]("table_status")}"}""")
  }

  def csvMigrate(spark: SparkSession, conf: Map[String, String]): Unit = {
    val cols = conf("cols").split(",").map(_.trim).toSeq
    val src = spark.read.parquet(conf("src"))
    val canon = src.select(cols.map(n =>
      graft.functions.Canonical.canonical(col(n), src.schema(n).dataType).as(n)): _*)
    Migrate.writeCsv(canon, s"${out(conf)}/csv")
  }

  def dataScan(spark: SparkSession, conf: Map[String, String]): Unit = {
    val cols = conf("cols").split(",").map(_.trim).toSeq
    val src = spark.read.parquet(conf("src"))
    // A5 classifier: integral-in-range vs decimal-point vs unknown
    val profiled = cols.map { n =>
      val c = col(n).cast("double")
      src.agg(
        count(when(c.isNotNull && c === floor(c) &&
          c.between(-9.223372036854775e18, 9.223372036854775e18), 1)).as("bigint_like"),
        count(when(c.isNotNull && c =!= floor(c), 1)).as("decimal_point"),
        count(when(c.isNull, 1)).as("nulls"),
        count(lit(1)).as("total"))
        .withColumn("column_name", lit(n))
    }.reduce(_ unionAll _)
    profiled.select("column_name", "bigint_like", "decimal_point", "nulls", "total")
      .write.mode("overwrite").parquet(s"${out(conf)}/scan_profile")
  }
}

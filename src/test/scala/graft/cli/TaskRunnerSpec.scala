package graft.cli

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Config-driven task dispatch: each mode runs end to end against the
  * sf0.001 fixtures and leaves its report artifacts.
  */
class TaskRunnerSpec extends SparkSpec {

  private val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_taskrunner"

  test("data_compare task writes status, diff, repair.sql and summary") {
    val dir = s"$tmp/compare"
    TaskRunner.dataCompare(spark, Map(
      "src" -> s"$sfDir/lineitem.parquet",
      "dst" -> s"$sfDir/lineitem.parquet",
      "out" -> dir,
      "cols" -> "l_orderkey,l_linenumber,l_quantity,l_returnflag",
      "chunkCol" -> "l_orderkey",
      "chunkWidth" -> "1024",
      "table" -> "lineitem"))
    assert(spark.read.parquet(s"$dir/chunk_status").count() > 0)
    assert(spark.read.parquet(s"$dir/diff").count() == 0) // identical sides
    assert(Files.readString(Paths.get(s"$dir/summary.json")).contains("\"table_status\":\"EQUAL\""))
    assert(Files.readString(Paths.get(s"$dir/repair.sql")).isEmpty)
  }

  test("data_compare flags a perturbed dst and emits repair statements") {
    val dir = s"$tmp/compare_bad"
    val dst = s"$tmp/dst_perturbed"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.where(org.apache.spark.sql.functions.col("l_orderkey") % 97 =!= 0)
      .write.mode("overwrite").parquet(dst)
    TaskRunner.dataCompare(spark, Map(
      "src" -> s"$sfDir/lineitem.parquet", "dst" -> dst, "out" -> dir,
      "cols" -> "l_orderkey,l_linenumber,l_quantity,l_returnflag",
      "chunkCol" -> "l_orderkey", "chunkWidth" -> "1024", "table" -> "lineitem"))
    val repair = Files.readString(Paths.get(s"$dir/repair.sql"))
    assert(repair.contains("INSERT INTO lineitem"))
    assert(Files.readString(Paths.get(s"$dir/summary.json")).contains("NOT_EQUAL"))
  }

  test("csv_migrate and data_scan leave their artifacts") {
    TaskRunner.csvMigrate(spark, Map(
      "src" -> s"$sfDir/orders.parquet", "out" -> s"$tmp/csv",
      "cols" -> "o_orderkey,o_totalprice,o_orderdate"))
    assert(spark.read.option("header", "false").csv(s"$tmp/csv/csv").count() > 0)

    TaskRunner.dataScan(spark, Map(
      "src" -> s"$sfDir/lineitem.parquet", "out" -> s"$tmp/scan",
      "cols" -> "l_quantity,l_extendedprice,l_orderkey"))
    val prof = spark.read.parquet(s"$tmp/scan/scan_profile").collect()
    assert(prof.length == 3)
    val qty = prof.find(_.getAs[String]("column_name") == "l_extendedprice").get
    assert(qty.getAs[Long]("decimal_point") > 0)
  }
}

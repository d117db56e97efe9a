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

  test("struct_migrate renders CREATE DDL from the parquet schema") {
    val dir = s"$tmp/structm"
    TaskRunner.structMigrate(spark, Map(
      "src" -> s"$sfDir/orders.parquet", "out" -> dir, "table" -> "orders"))
    val ddl = Files.readString(Paths.get(s"$dir/ddl.sql"))
    assert(ddl.startsWith("CREATE TABLE `orders`"))
    assert(ddl.contains("`o_orderkey` BIGINT") && ddl.contains("`o_totalprice` DOUBLE"))
    assert(ddl.contains("`o_orderstatus` LONGTEXT") && ddl.contains("`o_orderdate` DATETIME(6)"))
  }

  test("struct_compare emits ALTER suggestions for schema drift") {
    import org.apache.spark.sql.functions._
    val dir = s"$tmp/structc"
    val drifted = s"$tmp/orders_drifted"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .drop("o_orderpriority")
      .withColumn("o_channel", lit("web"))
      .withColumn("o_orderkey", col("o_orderkey").cast("string"))
      .write.mode("overwrite").parquet(drifted)
    TaskRunner.structCompare(spark, Map(
      "src" -> s"$sfDir/orders.parquet", "dst" -> drifted, "out" -> dir,
      "table" -> "orders"))
    val alter = Files.readString(Paths.get(s"$dir/alter.sql"))
    assert(alter.contains("ADD COLUMN o_orderpriority"))   // missing in dst
    assert(alter.contains("DROP COLUMN o_channel"))        // extra in dst
    assert(alter.contains("MODIFY o_orderkey"))            // bigint vs string
  }

  test("stmt_migrate safe-mode applies idempotently; assess and cdc_apply run") {
    import org.apache.spark.sql.functions._
    // stmt_migrate plain copy
    TaskRunner.stmtMigrate(spark, Map(
      "src" -> s"$sfDir/region.parquet", "out" -> s"$tmp/stmt",
      "cols" -> "r_regionkey,r_name"))
    assert(spark.read.parquet(s"$tmp/stmt/migrated").count() == 5)

    // assess inventory
    TaskRunner.assess(spark, Map(
      "src" -> s"$sfDir/customer.parquet", "out" -> s"$tmp/assess"))
    val a = spark.read.parquet(s"$tmp/assess/assess").collect()
    assert(a.length == spark.read.parquet(s"$sfDir/customer.parquet").columns.length)
    assert(a.forall(_.getAs[Long]("rows") > 0))

    // cdc_apply MERGE semantics
    val tgt = s"$tmp/cdc_target"; val ev = s"$tmp/cdc_events"
    spark.read.parquet(s"$sfDir/region.parquet")
      .select(col("r_regionkey").as("k"), col("r_name").as("v"))
      .write.mode("overwrite").parquet(tgt)
    val s = spark
    import s.implicits._
    Seq((0L, "U", "EDITED"), (1L, "D", ""), (99L, "I", "NEW"))
      .toDF("k", "op", "v").write.mode("overwrite").parquet(ev)
    TaskRunner.cdcApply(spark, Map(
      "dst" -> tgt, "events" -> ev, "keys" -> "k", "out" -> s"$tmp/cdc"))
    val applied = spark.read.parquet(s"$tmp/cdc/applied")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(applied(0L) == "EDITED" && !applied.contains(1L) && applied(99L) == "NEW")
    assert(applied.size == 5) // 5 regions - 1 delete + 1 insert
  }
  test("sql_migrate runs a custom SELECT over the fixture views; safe mode merges") {
    val dir = s"$tmp/sqlmig"
    TaskRunner.sqlMigrate(spark, Map(
      "srcDir" -> sfDir,
      "sql" -> ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_quantity > 25"),
      "out" -> dir))
    val res = spark.read.parquet(s"$dir/result")
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .where(org.apache.spark.sql.functions.col("l_quantity") > 25).count()
    assert(res.count() == expected && expected > 0)

    // safe mode: rewrite quantities for 10 rows onto the previous result
    val dir2 = s"$tmp/sqlmig_safe"
    TaskRunner.sqlMigrate(spark, Map(
      "srcDir" -> sfDir,
      "sql" -> ("SELECT l_orderkey, l_linenumber, CAST(999 AS DECIMAL(12,2)) AS l_quantity " +
        "FROM lineitem WHERE l_quantity > 25 ORDER BY l_orderkey, l_linenumber LIMIT 10"),
      "safeMode" -> "true", "keys" -> "l_orderkey,l_linenumber",
      "dst" -> s"$dir/result", "out" -> dir2))
    val applied = spark.read.parquet(s"$dir2/applied")
    assert(applied.count() == expected, "safe mode must not change the row count here")
    assert(applied.where(org.apache.spark.sql.functions.col("l_quantity") === 999).count() == 10)
  }

}

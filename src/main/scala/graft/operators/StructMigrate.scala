package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema translation + structural diff (SURVEY §1.3, U2;
  * `database/taskflow/struct_migrate.go`, `struct_compare.go`).
  *
  * The reference introspects a source catalog, applies built-in
  * type-mapping rules (`database/mapping/oracle.go:64-160`,
  * `model/buildin/buildin_rule_datatype.go`) plus per-task overrides, and
  * renders target DDL; struct_compare diffs two catalogs into ALTER
  * suggestions (`database/processor/struct_compare_table.go:45-1035`).
  *
  * Here both are pure catalog-DataFrame computations: the mapping is a
  * Column expression (usable in a distributed catalog scan over millions
  * of tables), the diff a full-outer join classified ADD/DROP/MODIFY.
  */
object StructMigrate {

  /** Oracle→MySQL-compatible type mapping as a Column expression over
    * (data_type, data_precision, data_scale). Mirrors the NUMBER ladder
    * and character/temporal/LOB rules of `database/mapping/oracle.go:64-160`:
    * NUMBER(p,s>0)→DECIMAL(p,s); NUMBER(p,0): p<3→TINYINT, <5→SMALLINT,
    * <9→INT, <19→BIGINT, else DECIMAL(p,0); bare NUMBER→DECIMAL(65,30)
    * (MySQL decimal cap 65,30); VARCHAR2(n)→VARCHAR(n); CHAR(n>255)→
    * VARCHAR(n); CLOB→LONGTEXT; BLOB→LONGBLOB; RAW(n)→VARBINARY(n);
    * DATE→DATETIME; TIMESTAMP(s)→DATETIME(min(s,6)); FLOAT/BINARY_DOUBLE→
    * DOUBLE; BINARY_FLOAT→FLOAT.
    */
  def mapOracleType(dt: Column, p: Column, s: Column): Column = {
    val precision = coalesce(p, lit(-1L))
    val scale     = coalesce(s, lit(0L))
    when(dt === "NUMBER" && precision === -1L, lit("DECIMAL(65,30)"))
      .when(dt === "NUMBER" && scale > 0L,
        concat(lit("DECIMAL("), least(precision, lit(65L)), lit(","), least(scale, lit(30L)), lit(")")))
      .when(dt === "NUMBER" && precision < 3L, lit("TINYINT"))
      .when(dt === "NUMBER" && precision < 5L, lit("SMALLINT"))
      .when(dt === "NUMBER" && precision < 9L, lit("INT"))
      .when(dt === "NUMBER" && precision < 19L, lit("BIGINT"))
      .when(dt === "NUMBER", concat(lit("DECIMAL("), precision, lit(",0)")))
      .when(dt === "VARCHAR2" || dt === "NVARCHAR2", concat(lit("VARCHAR("), precision, lit(")")))
      .when(dt === "CHAR" && precision > 255L, concat(lit("VARCHAR("), precision, lit(")")))
      .when(dt === "CHAR", concat(lit("CHAR("), precision, lit(")")))
      .when(dt === "CLOB" || dt === "NCLOB" || dt === "LONG", lit("LONGTEXT"))
      .when(dt === "BLOB" || dt === "LONG RAW", lit("LONGBLOB"))
      .when(dt === "RAW", concat(lit("VARBINARY("), precision, lit(")")))
      .when(dt === "DATE", lit("DATETIME"))
      .when(dt.startsWith("TIMESTAMP"), concat(lit("DATETIME("), least(scale, lit(6L)), lit(")")))
      .when(dt === "BINARY_FLOAT", lit("FLOAT"))
      .when(dt === "FLOAT" || dt === "BINARY_DOUBLE", lit("DOUBLE"))
      .otherwise(lit("TEXT"))
  }

  /** PostgreSQL→MySQL-compatible type mapping, the reference's third
    * source dialect (`database/mapping/postgresql.go` rules re-expressed):
    * int2/int4/int8→SMALLINT/INT/BIGINT; numeric(p,s)→DECIMAL capped
    * (65,30), bare numeric→DECIMAL(65,30); varchar(n)/bpchar(n) keep
    * length (bpchar>255→VARCHAR); text→LONGTEXT; bytea→LONGBLOB;
    * float4/float8→FLOAT/DOUBLE; bool→TINYINT(1); date→DATE;
    * timestamp/timestamptz(s)→DATETIME(min(s,6)); uuid→CHAR(36);
    * json/jsonb→JSON.
    */
  def mapPostgresType(dt: Column, p: Column, s: Column): Column = {
    val precision = coalesce(p, lit(-1L))
    val scale     = coalesce(s, lit(0L))
    when(dt === "int2" || dt === "smallint", lit("SMALLINT"))
      .when(dt === "int4" || dt === "integer", lit("INT"))
      .when(dt === "int8" || dt === "bigint", lit("BIGINT"))
      .when((dt === "numeric" || dt === "decimal") && precision === -1L, lit("DECIMAL(65,30)"))
      .when(dt === "numeric" || dt === "decimal",
        concat(lit("DECIMAL("), least(precision, lit(65L)), lit(","), least(scale, lit(30L)), lit(")")))
      // length-less varchar/bpchar (NULL precision) are unbounded in PG —
      // the reference's character ladder sends them to the TEXT family,
      // never VARCHAR(NULL) (postgresql.go:199-224: VARCHAR ≤16382,
      // MEDIUMTEXT ≤4194303, LONGTEXT above; CHAR ≤255, VARCHAR ≤16382,
      // LONGTEXT above)
      .when((dt === "varchar" || dt === "character varying") && precision === -1L, lit("LONGTEXT"))
      .when((dt === "varchar" || dt === "character varying") && precision <= 16382L,
        concat(lit("VARCHAR("), precision, lit(")")))
      .when((dt === "varchar" || dt === "character varying") && precision <= 4194303L,
        lit("MEDIUMTEXT"))
      .when(dt === "varchar" || dt === "character varying", lit("LONGTEXT"))
      .when((dt === "bpchar" || dt === "character") && precision === -1L, lit("LONGTEXT"))
      .when((dt === "bpchar" || dt === "character") && precision <= 255L,
        concat(lit("CHAR("), precision, lit(")")))
      .when((dt === "bpchar" || dt === "character") && precision <= 16382L,
        concat(lit("VARCHAR("), precision, lit(")")))
      .when(dt === "bpchar" || dt === "character", lit("LONGTEXT"))
      .when(dt === "text", lit("LONGTEXT"))
      .when(dt === "bytea", lit("LONGBLOB"))
      .when(dt === "float4" || dt === "real", lit("FLOAT"))
      .when(dt === "float8" || dt === "double precision", lit("DOUBLE"))
      .when(dt === "bool" || dt === "boolean", lit("TINYINT(1)"))
      .when(dt === "date", lit("DATE"))
      .when(dt.startsWith("timestamp"), concat(lit("DATETIME("), least(scale, lit(6L)), lit(")")))
      .when(dt === "uuid", lit("CHAR(36)"))
      .when(dt === "json" || dt === "jsonb", lit("JSON"))
      .otherwise(lit("TEXT"))
  }

  /** Catalog DataFrame derived from a Spark schema — the engine-native
    * struct_migrate source when the input is parquet rather than a DB
    * catalog: (table_name, column_name, data_type, ordinal) with
    * data_type as Spark's simpleString ("bigint", "decimal(12,2)", ...).
    */
  def catalogOf(spark: org.apache.spark.sql.SparkSession, table: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    schema.fields.zipWithIndex.toSeq
      .map { case (f, i) => (table, f.name, f.dataType.simpleString, i) }
      .toDF("table_name", "column_name", "data_type", "ordinal")
  }

  /** Spark simpleString type → MySQL-compatible DDL type (the parquet →
    * MySQL leg of the mapping family).
    */
  def mapSparkType(dt: Column): Column =
    when(dt === "bigint", lit("BIGINT"))
      .when(dt === "int", lit("INT"))
      .when(dt === "smallint", lit("SMALLINT"))
      .when(dt === "tinyint", lit("TINYINT"))
      .when(dt === "double", lit("DOUBLE"))
      .when(dt === "float", lit("FLOAT"))
      .when(dt === "boolean", lit("TINYINT(1)"))
      .when(dt === "string", lit("LONGTEXT"))
      .when(dt === "binary", lit("LONGBLOB"))
      .when(dt === "date", lit("DATE"))
      .when(dt === "timestamp" || dt === "timestamp_ntz", lit("DATETIME(6)"))
      .when(dt.startsWith("decimal"), upper(dt))
      .otherwise(lit("TEXT"))

  /** Translate a catalog DataFrame (table_name, column_name, data_type,
    * data_precision, data_scale, ordinal) and render per-column DDL.
    */
  def migrate(catalog: DataFrame): DataFrame =
    catalog.withColumn("target_type",
        mapOracleType(col("data_type"), col("data_precision"), col("data_scale")))
      .withColumn("ddl",
        concat(lit("`"), col("column_name"), lit("` "), col("target_type")))

  /** Structural diff of two catalogs keyed (table_name, column_name):
    * classify ADDED / DROPPED / TYPE_CHANGED / SAME and render the ALTER
    * text (struct_compare_table.go Compare* methods).
    */
  def compareCatalogs(src: DataFrame, dst: DataFrame): DataFrame = {
    val j = src.as("s").join(dst.as("d"),
      col("s.table_name") === col("d.table_name") &&
        col("s.column_name") === col("d.column_name"), "full_outer")
    j.select(
      coalesce(col("s.table_name"), col("d.table_name")).as("table_name"),
      coalesce(col("s.column_name"), col("d.column_name")).as("column_name"),
      col("s.data_type").as("src_type"),
      col("d.data_type").as("dst_type"),
      when(col("d.column_name").isNull, "ADDED")
        .when(col("s.column_name").isNull, "DROPPED")
        .when(col("s.data_type") =!= col("d.data_type"), "TYPE_CHANGED")
        .otherwise("SAME").as("diff"))
      .withColumn("alter_sql",
        when(col("diff") === "ADDED",
          concat(lit("ALTER TABLE "), col("table_name"), lit(" ADD COLUMN "),
            col("column_name"), lit(" "), col("src_type")))
          .when(col("diff") === "DROPPED",
            concat(lit("ALTER TABLE "), col("table_name"), lit(" DROP COLUMN "), col("column_name")))
          .when(col("diff") === "TYPE_CHANGED",
            concat(lit("ALTER TABLE "), col("table_name"), lit(" MODIFY "),
              col("column_name"), lit(" "), col("src_type")))
          .otherwise(lit("")))
  }
}

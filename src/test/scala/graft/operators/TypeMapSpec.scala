package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rule-book parity with the reference's built-in datatype rules
  * (`model/buildin/buildin_rule_datatype.go`): per-direction entry counts
  * must match the reference's Init*BuildinDatatypeRule append counts
  * exactly, and the parameterization tier must reproduce the
  * `database/mapping/{mysql,oracle,postgresql}.go` sprintf conventions.
  */
class TypeMapSpec extends SparkSpec {

  test("per-direction rule counts match the reference exactly") {
    val counts = TypeMap.rules.groupBy(_.direction).view.mapValues(_.size).toMap
    assert(counts === Map(
      "O2M" -> 72, "O2T" -> 72, "M2O" -> 30, "T2O" -> 30,
      "P2M" -> 35, "P2T" -> 35), counts.toString)
    assert(TypeMap.rules.size === 274)
  }

  test("name-map spot checks across all six directions") {
    def t(d: String, s: String): String =
      TypeMap.rules.find(r => r.direction == d && r.sourceType == s).get.targetType
    assert(t("O2M", "XMLTYPE") === "LONGTEXT")
    assert(t("O2M", "ROWID") === "VARCHAR")
    assert(t("O2M", "INTERVAL YEAR(3) TO MONTH") === "VARCHAR")
    assert(t("O2M", "TIMESTAMP(3) WITH LOCAL TIME ZONE") === "DATETIME")
    assert(t("O2T", "NUMBER") === "DECIMAL")   // TiDB override
    assert(t("O2M", "NUMBER") === "TINYINT/SMALLINT/INT/BIGINT/DECIMAL")
    assert(t("M2O", "LONGTEXT") === "CLOB")
    assert(t("M2O", "DOUBLE") === "BINARY_DOUBLE")
    assert(t("T2O", "VARCHAR") === "VARCHAR2")
    assert(t("P2M", "UUID") === "VARCHAR")
    assert(t("P2T", "JSON") === "LONGTEXT")
  }

  test("parameterization: M2O integer widths, CHAR semantics, O2M ladder") {
    val s = spark
    import s.implicits._
    val cat = Seq(
      ("t", "a", "TINYINT", Some(3L), Some(0L), Some(0L)),
      ("t", "b", "INT", Some(10L), Some(0L), Some(0L)),
      ("t", "c", "BIGINT", Some(19L), Some(0L), Some(0L)),
      ("t", "d", "VARCHAR", None, None, Some(100L)),
      ("t", "e", "DATETIME", None, Some(3L), Some(0L)),
      ("t", "f", "LONGBLOB", None, None, Some(0L)))
      .toDF("table_name", "column_name", "data_type",
        "data_precision", "data_scale", "data_length")
    val got = TypeMap.mapCatalog(cat, "M2O")
      .select("column_name", "target_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "a" -> "NUMBER(3,0)", "b" -> "NUMBER(10,0)", "c" -> "NUMBER(19,0)",
      "d" -> "VARCHAR2(100 CHAR)", "e" -> "DATE", "f" -> "BLOB"))

    val ocat = Seq(
      ("t", "n1", "NUMBER", Some(4L), Some(0L), Some(22L)),
      ("t", "n2", "NUMBER", Some(12L), Some(2L), Some(22L)),
      ("t", "n3", "NUMBER", None, None, Some(22L)),
      ("t", "x", "XMLTYPE", None, None, Some(0L)),
      ("t", "r", "ROWID", None, None, Some(10L)),
      ("t", "i", "INTERVAL YEAR(2) TO MONTH", None, None, Some(5L)),
      ("t", "tz", "TIMESTAMP(3) WITH TIME ZONE", None, Some(3L), Some(13L)))
      .toDF("table_name", "column_name", "data_type",
        "data_precision", "data_scale", "data_length")
    val o = TypeMap.mapCatalog(ocat, "O2M")
      .select("column_name", "target_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(o === Map(
      "n1" -> "SMALLINT", "n2" -> "DECIMAL(12,2)", "n3" -> "DECIMAL(65,30)",
      "x" -> "LONGTEXT", "r" -> "VARCHAR(64)", "i" -> "VARCHAR(30)",
      "tz" -> "DATETIME(3)"))

    val t2 = TypeMap.mapCatalog(ocat.where(col("column_name").isin("n1", "n2")), "O2T")
      .select("column_name", "target_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(t2 === Map("n1" -> "DECIMAL(4,0)", "n2" -> "DECIMAL(12,2)"))
  }

  test("NUMBER ladder edges: negative scale folds, p=38 / s>p widen to 65") {
    val s0 = spark
    import s0.implicits._
    val cat = Seq(
      ("t", "e1", "NUMBER", Some(2L), Some(-2L), Some(22L)),  // values ≤ 9900: SMALLINT
      ("t", "e2", "NUMBER", Some(38L), Some(10L), Some(22L)), // p=38 widens
      ("t", "e3", "NUMBER", Some(3L), Some(5L), Some(22L)),   // s>p widens
      ("t", "e4", "NUMBER", Some(38L), Some(35L), Some(22L)), // s capped at 30
      ("t", "e5", "NUMBER", Some(38L), Some(-84L), Some(22L)) // eff p 122 → cap 65
    ).toDF("table_name", "column_name", "data_type",
      "data_precision", "data_scale", "data_length")
    val o = TypeMap.mapCatalog(cat, "O2M")
      .select("column_name", "target_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(o === Map(
      "e1" -> "SMALLINT", "e2" -> "DECIMAL(65,10)", "e3" -> "DECIMAL(65,5)",
      "e4" -> "DECIMAL(65,30)", "e5" -> "DECIMAL(65,0)"))
    val t = TypeMap.mapCatalog(cat, "O2T")
      .select("column_name", "target_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(t === Map(
      "e1" -> "DECIMAL(4,0)", "e2" -> "DECIMAL(65,10)", "e3" -> "DECIMAL(65,5)",
      "e4" -> "DECIMAL(65,30)", "e5" -> "DECIMAL(65,0)"))
    // StructMigrate's expression twin agrees
    val m = StructMigrate.migrate(cat.drop("data_length"))
      .select("column_name", "target_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map(
      "e1" -> "SMALLINT", "e2" -> "DECIMAL(65,10)", "e3" -> "DECIMAL(65,5)",
      "e4" -> "DECIMAL(65,30)", "e5" -> "DECIMAL(65,0)"))
  }

  test("unmatched source types surface as null target (reference error path)") {
    val s = spark
    import s.implicits._
    val cat = Seq(("t", "g", "GEOMETRY", None: Option[Long],
      None: Option[Long], Some(0L)))
      .toDF("table_name", "column_name", "data_type",
        "data_precision", "data_scale", "data_length")
    val row = TypeMap.mapCatalog(cat, "M2O").select("target_type").head()
    assert(row.isNullAt(0))
  }
}

package graft.operators

import graft.SparkSpec

/** Pins the full struct-compare surface (struct_compare_table.go:45-1035):
  * index/constraint/meta/partition diffs plus the column-detail renderer.
  */
class StructCompareSpec extends SparkSpec {
  import spark.implicits._

  test("compareColumnDetail classifies and renders the full column suffix") {
    val src = Seq(
      ("t1", "a", "BIGINT", "N", "", "id col", "", ""),
      ("t1", "b", "VARCHAR(10)", "Y", "", "", "utf8mb4", "utf8mb4_bin"),
      ("t1", "c", "INT", "N", "0", "", "", ""))
      .toDF("table_name", "column_name", "data_type", "nullable",
        "data_default", "comment", "charset", "collation")
    val dst = Seq(
      ("t1", "a", "BIGINT", "N", "", "id col", "", ""),
      ("t1", "c", "INT", "Y", "0", "", "", ""),
      ("t1", "z", "TEXT", "Y", "", "", "", ""))
      .toDF("table_name", "column_name", "data_type", "nullable",
        "data_default", "comment", "charset", "collation")
    val out = StructMigrate.compareColumnDetail(src, dst)
      .collect().map(r => r.getString(1) -> (r.getString(4), r.getString(5))).toMap
    assert(out("a")._1 == "SAME")
    assert(out("b") == ("ADDED",
      "ALTER TABLE t1 ADD COLUMN b VARCHAR(10) CHARACTER SET utf8mb4 COLLATE utf8mb4_bin DEFAULT NULL;"))
    assert(out("c") == ("MODIFIED", "ALTER TABLE t1 MODIFY c INT NOT NULL DEFAULT 0;"))
    assert(out("z") == ("DROPPED", "ALTER TABLE t1 DROP COLUMN z;"))
  }

  test("compareColumnDetail escapes quotes in comments") {
    val src = Seq(("t", "c", "TEXT", "Y", "", "it's here", "", ""))
      .toDF("table_name", "column_name", "data_type", "nullable",
        "data_default", "comment", "charset", "collation")
    val dst = src.where("1=0")
    val sql = StructMigrate.compareColumnDetail(src, dst)
      .collect().head.getString(5)
    assert(sql.endsWith("COMMENT 'it''s here';"))
  }

  test("compareIndexCatalogs renders the CREATE ladder and DROP+CREATE on change") {
    val src = Seq(
      ("t", "u1", "UNIQUE", "NORMAL", "a"),
      ("t", "b1", "NONUNIQUE", "BITMAP", "b"),
      ("t", "h1", "NONUNIQUE", "HASH", "c"),
      ("t", "n1", "NONUNIQUE", "NORMAL", "d"))
      .toDF("table_name", "index_name", "uniqueness", "index_type", "index_columns")
    val dst = Seq(
      ("t", "n1", "NONUNIQUE", "NORMAL", "d,e"),
      ("t", "g1", "NONUNIQUE", "NORMAL", "g"))
      .toDF("table_name", "index_name", "uniqueness", "index_type", "index_columns")
    val out = StructMigrate.compareIndexCatalogs(src, dst)
      .collect().map(r => r.getString(1) -> (r.getString(6), r.getString(7))).toMap
    assert(out("u1") == ("ADDED", "CREATE UNIQUE INDEX u1 ON t (a);"))
    assert(out("b1") == ("ADDED", "CREATE BITMAP INDEX b1 ON t (b);"))
    assert(out("h1") == ("ADDED", "CREATE INDEX h1 ON t USING HASH(c);"))
    assert(out("n1") == ("CHANGED",
      "ALTER TABLE t DROP INDEX n1; CREATE INDEX n1 ON t (d);"))
    assert(out("g1") == ("DROPPED", "ALTER TABLE t DROP INDEX g1;"))
  }

  test("compareConstraintCatalogs skips renamed PK with identical columns") {
    val src = Seq(("t", "pk_a", "P", "id", "", "", ""))
      .toDF("table_name", "cons_name", "cons_type", "cons_columns",
        "ref_table", "ref_columns", "check_expr")
    val dst = Seq(("t", "pk_b", "P", "id", "", "", ""))
      .toDF("table_name", "cons_name", "cons_type", "cons_columns",
        "ref_table", "ref_columns", "check_expr")
    val diffs = StructMigrate.compareConstraintCatalogs(src, dst)
      .select("diff").as[String].collect().toSet
    assert(diffs == Set("SAME"))
  }

  test("compareConstraintCatalogs renders all four families") {
    val src = Seq(
      ("t", "pk", "P", "id", "", "", ""),
      ("t", "uk", "U", "u", "", "", ""),
      ("t", "fk", "F", "r", "o", "oid", ""),
      ("t", "ck", "C", "v", "", "", "v > 0"))
      .toDF("table_name", "cons_name", "cons_type", "cons_columns",
        "ref_table", "ref_columns", "check_expr")
    val dst = src.where("1=0")
    val out = StructMigrate.compareConstraintCatalogs(src, dst)
      .collect().map(r => r.getString(2) -> r.getString(6)).toMap
    assert(out("pk") == "ALTER TABLE t ADD PRIMARY KEY (id);")
    assert(out("uk") == "ALTER TABLE t ADD CONSTRAINT uk UNIQUE (u);")
    assert(out("fk") == "ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (r) REFERENCES o (oid);")
    assert(out("ck") == "ALTER TABLE t ADD CONSTRAINT ck CHECK (v > 0);")
  }

  test("compareTableMeta emits one row per differing category") {
    val src = Seq(("t", "cm", "utf8mb4", "utf8mb4_bin", true, 3L, 2L))
      .toDF("table_name", "table_comment", "charset", "collation",
        "is_partitioned", "n_columns", "n_indexes")
    val dst = Seq(("t", "other", "latin1", "latin1_bin", false, 4L, 2L))
      .toDF("table_name", "table_comment", "charset", "collation",
        "is_partitioned", "n_columns", "n_indexes")
    val cats = StructMigrate.compareTableMeta(src, dst)
      .select("category").as[String].collect().toSet
    assert(cats == Set("PARTITION", "COMMENT", "CHARSET_COLLATION", "COLUMN_COUNT"))
  }

  test("comparePartitions flags add/drop/modify") {
    val src = Seq(("t", "p1", "10"), ("t", "p2", "20")).toDF("table_name", "partition_name", "high_value")
    val dst = Seq(("t", "p2", "25"), ("t", "p3", "30")).toDF("table_name", "partition_name", "high_value")
    val out = StructMigrate.comparePartitions(src, dst)
      .collect().map(r => r.getString(1) -> r.getString(4)).toMap
    assert(out == Map("p1" -> "ADDED", "p2" -> "CHANGED", "p3" -> "DROPPED"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QueryDef
import graft.operators.StructMigrate

/** Full struct-compare surface beyond columns (SURVEY §2.7 U2 — the
  * reference's 12 Compare* dimensions at
  * `database/processor/struct_compare_table.go:45-1035`): column detail with
  * nullability/default/comment/charset, index detail, the four constraint
  * families (with the PK rename-skip), table-level meta screens, and
  * partition detail. Each query diffs a deterministic src/dst catalog
  * fixture and carries a DuckDB twin of the same classify+render logic.
  */
object StructCompareQueries {

  private def q(v: String): String = "'" + v.replace("'", "''") + "'"

  // (table_name, column_name, data_type, nullable, data_default, comment, charset, collation)
  private type ColRow = (String, String, String, String, String, String, String, String)
  private val colSrc: Seq[ColRow] = Seq(
    ("t1", "id",      "BIGINT",        "N", "",                  "primary id",     "",        ""),
    ("t1", "name",    "VARCHAR(50)",   "Y", "",                  "customer name",  "utf8mb4", "utf8mb4_bin"),
    ("t1", "amount",  "DECIMAL(12,2)", "N", "0.00",              "",               "",        ""),
    ("t1", "note",    "LONGTEXT",      "Y", "",                  "it's free-form", "utf8mb4", "utf8mb4_general_ci"),
    ("t1", "created", "DATETIME(6)",   "N", "CURRENT_TIMESTAMP", "",               "",        ""),
    ("t2", "k",       "INT",           "N", "",                  "",               "",        ""),
    ("t2", "v",       "VARCHAR(100)",  "Y", "",                  "",               "utf8mb4", "utf8mb4_bin"))
  private val colDst: Seq[ColRow] = Seq(
    ("t1", "id",      "BIGINT",        "N", "",   "primary id",    "",        ""),
    ("t1", "name",    "VARCHAR(50)",   "Y", "",   "customer name", "utf8mb4", "utf8mb4_general_ci"),
    ("t1", "amount",  "DECIMAL(10,2)", "N", "0.00", "",            "",        ""),
    ("t1", "created", "DATETIME(6)",   "N", "",   "",              "",        ""),
    ("t1", "legacy",  "TINYINT",       "Y", "",   "",              "",        ""),
    ("t2", "k",       "INT",           "N", "",   "",              "",        ""),
    ("t2", "v",       "VARCHAR(100)",  "N", "",   "",              "utf8mb4", "utf8mb4_bin"))
  private def colValues(rows: Seq[ColRow]): String =
    rows.map { case (t, c, dt, n, d, cm, cs, co) =>
      s"(${q(t)},${q(c)},${q(dt)},${q(n)},${q(d)},${q(cm)},${q(cs)},${q(co)})"
    }.mkString(",\n  ")
  private def colDf(s: SparkSession, rows: Seq[ColRow]): DataFrame = {
    import s.implicits._
    rows.toDF("table_name", "column_name", "data_type", "nullable",
      "data_default", "comment", "charset", "collation")
  }

  // (table_name, index_name, uniqueness, index_type, index_columns)
  private type IdxRow = (String, String, String, String, String)
  private val idxSrc: Seq[IdxRow] = Seq(
    ("t1", "ux_id",    "UNIQUE",    "NORMAL", "id"),
    ("t1", "ix_name",  "NONUNIQUE", "NORMAL", "name"),
    ("t1", "ix_flag",  "NONUNIQUE", "BITMAP", "flag"),
    ("t2", "ix_hash",  "NONUNIQUE", "HASH",   "k"),
    ("t2", "ix_multi", "NONUNIQUE", "NORMAL", "a,b"))
  private val idxDst: Seq[IdxRow] = Seq(
    ("t1", "ux_id",    "UNIQUE",    "NORMAL", "id"),
    ("t1", "ix_name",  "NONUNIQUE", "NORMAL", "name,created"),
    ("t1", "ix_flag",  "NONUNIQUE", "NORMAL", "flag"),
    ("t2", "ix_multi", "NONUNIQUE", "NORMAL", "a,b"),
    ("t2", "ix_extra", "NONUNIQUE", "NORMAL", "z"))
  private def idxValues(rows: Seq[IdxRow]): String =
    rows.map { case (t, n, u, ty, c) => s"(${q(t)},${q(n)},${q(u)},${q(ty)},${q(c)})" }
      .mkString(",\n  ")
  private def idxDf(s: SparkSession, rows: Seq[IdxRow]): DataFrame = {
    import s.implicits._
    rows.toDF("table_name", "index_name", "uniqueness", "index_type", "index_columns")
  }

  // (table_name, cons_name, cons_type, cons_columns, ref_table, ref_columns, check_expr)
  private type ConsRow = (String, String, String, String, String, String, String)
  private val consSrc: Seq[ConsRow] = Seq(
    ("t1", "pk_t1",   "P", "id",      "",          "",   ""),
    ("t1", "uk_name", "U", "name",    "",          "",   ""),
    ("t1", "fk_cust", "F", "cust_id", "customers", "id", ""),
    ("t1", "ck_amt",  "C", "amount",  "",          "",   "amount >= 0"),
    ("t2", "pk_t2",   "P", "k",       "",          "",   ""),
    ("t3", "pk_t3",   "P", "a,b",     "",          "",   ""))
  private val consDst: Seq[ConsRow] = Seq(
    ("t1", "pk_t1_renamed", "P", "id",      "",          "",         ""),
    ("t1", "fk_cust",       "F", "cust_id", "customers", "cust_key", ""),
    ("t1", "ck_amt",        "C", "amount",  "",          "",         "amount > 0"),
    ("t2", "pk_t2",         "P", "k",       "",          "",         ""),
    ("t2", "uk_extra",      "U", "v",       "",          "",         ""),
    ("t3", "pk_t3",         "P", "a",       "",          "",         ""))
  private def consValues(rows: Seq[ConsRow]): String =
    rows.map { case (t, n, ty, c, rt, rc, ce) =>
      s"(${q(t)},${q(n)},${q(ty)},${q(c)},${q(rt)},${q(rc)},${q(ce)})"
    }.mkString(",\n  ")
  private def consDf(s: SparkSession, rows: Seq[ConsRow]): DataFrame = {
    import s.implicits._
    rows.toDF("table_name", "cons_name", "cons_type", "cons_columns",
      "ref_table", "ref_columns", "check_expr")
  }

  // (table_name, table_comment, charset, coll_name, is_partitioned, n_columns, n_indexes)
  private type MetaRow = (String, String, String, String, Boolean, Long, Long)
  private val metaSrc: Seq[MetaRow] = Seq(
    ("t1", "orders fact", "utf8mb4", "utf8mb4_bin",        true,  12L, 4L),
    ("t2", "",            "utf8mb4", "utf8mb4_bin",        false, 5L,  1L),
    ("t3", "dim table",   "latin1",  "latin1_swedish_ci",  false, 8L,  2L),
    ("t4", "events",      "utf8mb4", "utf8mb4_bin",        true,  6L,  2L))
  private val metaDst: Seq[MetaRow] = Seq(
    ("t1", "orders fact", "utf8mb4", "utf8mb4_bin",        false, 12L, 3L),
    ("t2", "kv store",    "utf8mb4", "utf8mb4_bin",        false, 5L,  1L),
    ("t3", "dim table",   "utf8mb4", "utf8mb4_general_ci", false, 7L,  2L),
    ("t4", "events",      "utf8mb4", "utf8mb4_bin",        true,  6L,  2L))
  private def metaValues(rows: Seq[MetaRow]): String =
    rows.map { case (t, cm, cs, co, p, nc, ni) =>
      s"(${q(t)},${q(cm)},${q(cs)},${q(co)},$p,$nc,$ni)"
    }.mkString(",\n  ")
  private def metaDf(s: SparkSession, rows: Seq[MetaRow]): DataFrame = {
    import s.implicits._
    rows.toDF("table_name", "table_comment", "charset", "collation",
      "is_partitioned", "n_columns", "n_indexes")
  }

  // (table_name, partition_name, high_value)
  private type PartRow = (String, String, String)
  private val partSrc: Seq[PartRow] = Seq(
    ("sales", "p2024q1", "2024-04-01"),
    ("sales", "p2024q2", "2024-07-01"),
    ("sales", "p2024q3", "2024-10-01"),
    ("logs",  "p01",     "100000"))
  private val partDst: Seq[PartRow] = Seq(
    ("sales", "p2024q1", "2024-04-01"),
    ("sales", "p2024q2", "2024-08-01"),
    ("sales", "pmax",    "MAXVALUE"),
    ("logs",  "p01",     "100000"))
  private def partValues(rows: Seq[PartRow]): String =
    rows.map { case (t, p, h) => s"(${q(t)},${q(p)},${q(h)})" }.mkString(",\n  ")
  private def partDf(s: SparkSession, rows: Seq[PartRow]): DataFrame = {
    import s.implicits._
    rows.toDF("table_name", "partition_name", "high_value")
  }

  /** DuckDB twin of StructMigrate.columnSuffix over an aliased side `a`.
    * Rendered on one line: this fragment is spliced into outer stripMargin
    * templates, which would otherwise eat a pipe of each `||`.
    */
  private def suffixSql(a: String, commentCol: String): String = Seq(
    s"(CASE WHEN $a.charset IS NOT NULL AND $a.charset <> '' AND $a.charset <> 'UNKNOWN'",
    s"THEN $a.data_type || ' CHARACTER SET ' || $a.charset || ' COLLATE ' || $a.coll_name",
    s"ELSE $a.data_type END)",
    s"|| (CASE WHEN upper(coalesce($a.nullable,'Y')) = 'Y' THEN '' ELSE ' NOT NULL' END)",
    s"|| (CASE WHEN $a.data_default IS NOT NULL AND $a.data_default <> '' THEN ' DEFAULT ' || $a.data_default",
    s"WHEN upper(coalesce($a.nullable,'Y')) = 'Y' THEN ' DEFAULT NULL' ELSE '' END)",
    s"|| (CASE WHEN $a.$commentCol IS NOT NULL AND $a.$commentCol <> ''",
    s"THEN ' COMMENT ''' || replace($a.$commentCol, '''', '''''') || '''' ELSE '' END)").mkString(" ")

  private val colNe: String = Seq("data_type", "nullable", "data_default",
    "col_comment", "charset", "coll_name")
    .map(c => s"coalesce(s.$c,'') <> coalesce(d.$c,'')").mkString("(", " OR ", ")")

  val all: Seq[QueryDef] = Seq(

    // Column detail incl. nullable/default/comment/charset rendering
    // (CompareTableColumnDetail struct_compare_table.go:854-959 +
    // genAlterTableColumnDetail :1016).
    QueryDef.sql(
      "q586_struct_compare_columns",
      s"""WITH src(table_name, column_name, data_type, nullable, data_default, col_comment, charset, coll_name) AS (VALUES
         |  ${colValues(colSrc)}),
         |dst(table_name, column_name, data_type, nullable, data_default, col_comment, charset, coll_name) AS (VALUES
         |  ${colValues(colDst)})
         |SELECT coalesce(s.table_name, d.table_name) AS table_name,
         |  coalesce(s.column_name, d.column_name) AS column_name,
         |  s.data_type AS src_type, d.data_type AS dst_type,
         |  CASE WHEN d.column_name IS NULL THEN 'ADDED'
         |       WHEN s.column_name IS NULL THEN 'DROPPED'
         |       WHEN $colNe THEN 'MODIFIED' ELSE 'SAME' END AS diff,
         |  CASE WHEN d.column_name IS NULL THEN
         |         'ALTER TABLE ' || s.table_name || ' ADD COLUMN ' || s.column_name || ' ' || ${suffixSql("s", "col_comment")} || ';'
         |       WHEN s.column_name IS NULL THEN
         |         'ALTER TABLE ' || d.table_name || ' DROP COLUMN ' || d.column_name || ';'
         |       WHEN $colNe THEN
         |         'ALTER TABLE ' || s.table_name || ' MODIFY ' || s.column_name || ' ' || ${suffixSql("s", "col_comment")} || ';'
         |       ELSE '' END AS alter_sql
         |FROM src s FULL OUTER JOIN dst d
         |  ON s.table_name = d.table_name AND s.column_name = d.column_name
         |ORDER BY table_name, column_name""".stripMargin) { (s, dir) =>
      StructMigrate.compareColumnDetail(colDf(s, colSrc), colDf(s, colDst))
        .orderBy("table_name", "column_name")
    },

    // Index detail: uniqueness/type/columns diff with DROP+CREATE on change
    // (CompareTableIndexDetail :701-852, MySQL-flow CREATE ladder).
    QueryDef.sql(
      "q587_struct_compare_indexes", {
        val create =
          """CASE WHEN s.uniqueness = 'UNIQUE' THEN
            |         'CREATE UNIQUE INDEX ' || s.index_name || ' ON ' || s.table_name || ' (' || s.index_columns || ');'
            |       WHEN s.index_type = 'BITMAP' THEN
            |         'CREATE BITMAP INDEX ' || s.index_name || ' ON ' || s.table_name || ' (' || s.index_columns || ');'
            |       WHEN s.index_type = 'HASH' THEN
            |         'CREATE INDEX ' || s.index_name || ' ON ' || s.table_name || ' USING HASH(' || s.index_columns || ');'
            |       ELSE 'CREATE INDEX ' || s.index_name || ' ON ' || s.table_name || ' (' || s.index_columns || ');' END""".stripMargin
        val drop =
          "'ALTER TABLE ' || coalesce(d.table_name, s.table_name) || ' DROP INDEX ' || coalesce(d.index_name, s.index_name) || ';'"
        val ne = Seq("uniqueness", "index_type", "index_columns")
          .map(c => s"coalesce(s.$c,'') <> coalesce(d.$c,'')").mkString("(", " OR ", ")")
        s"""WITH src(table_name, index_name, uniqueness, index_type, index_columns) AS (VALUES
           |  ${idxValues(idxSrc)}),
           |dst(table_name, index_name, uniqueness, index_type, index_columns) AS (VALUES
           |  ${idxValues(idxDst)})
           |SELECT coalesce(s.table_name, d.table_name) AS table_name,
           |  coalesce(s.index_name, d.index_name) AS index_name,
           |  s.uniqueness AS src_uniqueness, s.index_type AS src_index_type,
           |  s.index_columns AS src_columns, d.index_columns AS dst_columns,
           |  CASE WHEN d.index_name IS NULL THEN 'ADDED'
           |       WHEN s.index_name IS NULL THEN 'DROPPED'
           |       WHEN $ne THEN 'CHANGED' ELSE 'SAME' END AS diff,
           |  CASE WHEN d.index_name IS NULL THEN $create
           |       WHEN s.index_name IS NULL THEN $drop
           |       WHEN $ne THEN $drop || ' ' || ($create)
           |       ELSE '' END AS alter_sql
           |FROM src s FULL OUTER JOIN dst d
           |  ON s.table_name = d.table_name AND s.index_name = d.index_name
           |ORDER BY table_name, index_name""".stripMargin
      }) { (s, dir) =>
      StructMigrate.compareIndexCatalogs(idxDf(s, idxSrc), idxDf(s, idxDst))
        .orderBy("table_name", "index_name")
    },

    // Constraint families P/U/F/C incl. the PK rename-skip
    // (CompareTablePrimaryConstraint :344-455 skip at :370-401, Unique :456,
    // Foreign :535, Check :622).
    QueryDef.sql(
      "q588_struct_compare_constraints", {
        val add =
          """CASE WHEN s.cons_type = 'P' THEN
            |         'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' ADD PRIMARY KEY (' || s.cons_columns || ');'
            |       WHEN s.cons_type = 'U' THEN
            |         'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' ADD CONSTRAINT ' || coalesce(s.cons_name, d.cons_name) || ' UNIQUE (' || s.cons_columns || ');'
            |       WHEN s.cons_type = 'F' THEN
            |         'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' ADD CONSTRAINT ' || coalesce(s.cons_name, d.cons_name) || ' FOREIGN KEY (' || s.cons_columns || ') REFERENCES ' || s.ref_table || ' (' || s.ref_columns || ');'
            |       ELSE 'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' ADD CONSTRAINT ' || coalesce(s.cons_name, d.cons_name) || ' CHECK (' || s.check_expr || ');' END""".stripMargin
        val drop =
          """CASE WHEN d.cons_type = 'P' THEN
            |         'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' DROP PRIMARY KEY;'
            |       WHEN d.cons_type = 'U' THEN
            |         'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' DROP KEY ' || coalesce(s.cons_name, d.cons_name) || ';'
            |       WHEN d.cons_type = 'F' THEN
            |         'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' DROP FOREIGN KEY ' || coalesce(s.cons_name, d.cons_name) || ';'
            |       ELSE 'ALTER TABLE ' || coalesce(s.table_name, d.table_name) || ' DROP CHECK ' || coalesce(s.cons_name, d.cons_name) || ';' END""".stripMargin
        val ne = Seq("cons_columns", "ref_table", "ref_columns", "check_expr")
          .map(c => s"coalesce(s.$c,'') <> coalesce(d.$c,'')").mkString("(", " OR ", ")")
        s"""WITH src(table_name, cons_name, cons_type, cons_columns, ref_table, ref_columns, check_expr) AS (VALUES
           |  ${consValues(consSrc)}),
           |dst(table_name, cons_name, cons_type, cons_columns, ref_table, ref_columns, check_expr) AS (VALUES
           |  ${consValues(consDst)}),
           |pk_same AS (
           |  SELECT sp.table_name FROM
           |    (SELECT table_name, min(cons_columns) AS pk FROM src WHERE cons_type = 'P' GROUP BY 1) sp
           |    JOIN (SELECT table_name, min(cons_columns) AS pk FROM dst WHERE cons_type = 'P' GROUP BY 1) dp
           |    USING (table_name)
           |  WHERE sp.pk = dp.pk)
           |SELECT coalesce(s.table_name, d.table_name) AS table_name,
           |  coalesce(s.cons_type, d.cons_type) AS cons_type,
           |  coalesce(s.cons_name, d.cons_name) AS cons_name,
           |  s.cons_columns AS src_columns, d.cons_columns AS dst_columns,
           |  CASE WHEN coalesce(s.cons_type, d.cons_type) = 'P'
           |            AND coalesce(s.table_name, d.table_name) IN (SELECT table_name FROM pk_same) THEN 'SAME'
           |       WHEN d.cons_name IS NULL THEN 'ADDED'
           |       WHEN s.cons_name IS NULL THEN 'DROPPED'
           |       WHEN $ne THEN 'CHANGED' ELSE 'SAME' END AS diff,
           |  CASE WHEN coalesce(s.cons_type, d.cons_type) = 'P'
           |            AND coalesce(s.table_name, d.table_name) IN (SELECT table_name FROM pk_same) THEN ''
           |       WHEN d.cons_name IS NULL THEN $add
           |       WHEN s.cons_name IS NULL THEN $drop
           |       WHEN $ne THEN ($drop) || ' ' || ($add)
           |       ELSE '' END AS alter_sql
           |FROM src s FULL OUTER JOIN dst d
           |  ON s.table_name = d.table_name AND s.cons_type = d.cons_type AND s.cons_name = d.cons_name
           |ORDER BY table_name, cons_type, cons_name""".stripMargin
      }) { (s, dir) =>
      StructMigrate.compareConstraintCatalogs(consDf(s, consSrc), consDf(s, consDst))
        .orderBy("table_name", "cons_type", "cons_name")
    },

    // Table-level meta screens: partition-type, comment, charset/collation,
    // column/index counts (ComparePartitionTableType :45, CompareTableComment
    // :93, CompareTableCharsetCollation :135, CompareTableColumnCounts :252,
    // CompareTableIndexCounts :298).
    QueryDef.sql(
      "q589_struct_compare_meta",
      s"""WITH src(table_name, table_comment, charset, coll_name, is_partitioned, n_columns, n_indexes) AS (VALUES
         |  ${metaValues(metaSrc)}),
         |dst(table_name, table_comment, charset, coll_name, is_partitioned, n_columns, n_indexes) AS (VALUES
         |  ${metaValues(metaDst)}),
         |j AS (
         |  SELECT coalesce(s.table_name, d.table_name) AS table_name,
         |    s.table_comment AS sc, d.table_comment AS dc,
         |    s.charset AS scs, d.charset AS dcs,
         |    s.coll_name AS sco, d.coll_name AS dco,
         |    s.is_partitioned AS sp, d.is_partitioned AS dp,
         |    s.n_columns AS snc, d.n_columns AS dnc,
         |    s.n_indexes AS sni, d.n_indexes AS dni
         |  FROM src s FULL OUTER JOIN dst d ON s.table_name = d.table_name)
         |SELECT * FROM (
         |  SELECT table_name, 'PARTITION' AS category,
         |    CASE WHEN coalesce(sp, false) THEN 'YES' ELSE 'NO' END AS src_value,
         |    CASE WHEN coalesce(dp, false) THEN 'YES' ELSE 'NO' END AS dst_value,
         |    'Manual Create Partition Table' AS suggest, '' AS alter_sql
         |  FROM j WHERE coalesce(sp, false) <> coalesce(dp, false)
         |  UNION ALL
         |  SELECT table_name, 'COMMENT', coalesce(sc, ''), coalesce(dc, ''),
         |    'Manual Create Table Comment',
         |    'ALTER TABLE ' || table_name || ' COMMENT ''' || replace(coalesce(sc, ''), '''', '''''') || ''';'
         |  FROM j WHERE coalesce(sc, '') <> coalesce(dc, '')
         |  UNION ALL
         |  SELECT table_name, 'CHARSET_COLLATION',
         |    'CHARSET [' || scs || '] COLLATION [' || sco || ']',
         |    'CHARSET [' || dcs || '] COLLATION [' || dco || ']',
         |    'Manual Create Table Charset Collation',
         |    'ALTER TABLE ' || table_name || ' CHARACTER SET ' || scs || ' COLLATE ' || sco || ';'
         |  FROM j WHERE coalesce(scs, '') <> coalesce(dcs, '') OR coalesce(sco, '') <> coalesce(dco, '')
         |  UNION ALL
         |  SELECT table_name, 'COLUMN_COUNT',
         |    CAST(coalesce(snc, 0) AS VARCHAR), CAST(coalesce(dnc, 0) AS VARCHAR),
         |    'Manual Align Table Column Counts', ''
         |  FROM j WHERE coalesce(snc, -1) <> coalesce(dnc, -1)
         |  UNION ALL
         |  SELECT table_name, 'INDEX_COUNT',
         |    CAST(coalesce(sni, 0) AS VARCHAR), CAST(coalesce(dni, 0) AS VARCHAR),
         |    'Manual Align Table Index Counts', ''
         |  FROM j WHERE coalesce(sni, -1) <> coalesce(dni, -1))
         |ORDER BY table_name, category""".stripMargin) { (s, dir) =>
      StructMigrate.compareTableMeta(metaDf(s, metaSrc), metaDf(s, metaDst))
        .orderBy("table_name", "category")
    },

    // Partition detail: advisory add/drop/modify rows
    // (CompareTablePartitionDetail :961-1014).
    QueryDef.sql(
      "q590_struct_compare_partitions",
      s"""WITH src(table_name, partition_name, high_value) AS (VALUES
         |  ${partValues(partSrc)}),
         |dst(table_name, partition_name, high_value) AS (VALUES
         |  ${partValues(partDst)})
         |SELECT coalesce(s.table_name, d.table_name) AS table_name,
         |  coalesce(s.partition_name, d.partition_name) AS partition_name,
         |  s.high_value AS src_high_value, d.high_value AS dst_high_value,
         |  CASE WHEN d.partition_name IS NULL THEN 'ADDED'
         |       WHEN s.partition_name IS NULL THEN 'DROPPED'
         |       WHEN coalesce(s.high_value, '') <> coalesce(d.high_value, '') THEN 'CHANGED'
         |       ELSE 'SAME' END AS diff,
         |  CASE WHEN d.partition_name IS NULL THEN 'Manual Add Table Partition'
         |       WHEN s.partition_name IS NULL THEN 'Manual Drop Table Partition'
         |       WHEN coalesce(s.high_value, '') <> coalesce(d.high_value, '') THEN 'Manual Modify Table Partition'
         |       ELSE '' END AS suggest
         |FROM src s FULL OUTER JOIN dst d
         |  ON s.table_name = d.table_name AND s.partition_name = d.partition_name
         |ORDER BY table_name, partition_name""".stripMargin) { (s, dir) =>
      StructMigrate.comparePartitions(partDf(s, partSrc), partDf(s, partDst))
        .orderBy("table_name", "partition_name")
    },
  )
}

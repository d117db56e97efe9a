package graft.sources

import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rendering fixtures for the table-driven dialect layer — one fixture per
  * reference translator shape (`processor_translate_mysql.go:27-95`,
  * `processor_translate_oracle.go:27-103`,
  * `processor_translate_postgres.go:27-90`) — plus a LIVE execution of the
  * staged set-based MERGE against embedded Derby.
  */
class SqlDialectSpec extends SparkSpec {

  private val cols = Seq("id", "name")
  private val keys = Seq("id")
  private val rows = Seq(Seq("1", "'a'"), Seq("2", "'b'"))

  test("mysql: REPLACE INTO safe mode, multi-row VALUES, backtick quoting, hint slot") {
    assert(SqlDialects.upsertSql(SqlDialects.mysql, "s", "t", cols, keys, rows) ===
      "REPLACE INTO `s`.`t` (`id`,`name`) VALUES (1,'a'),(2,'b');")
    assert(SqlDialects.insertSql(SqlDialects.mysql, "s", "t", cols, rows) ===
      "INSERT INTO `s`.`t` (`id`,`name`) VALUES (1,'a'),(2,'b');")
    assert(SqlDialects.insertSql(SqlDialects.mysql, "s", "t", cols, rows,
      hint = "/*+ IGNORE_INDEX(t) */") ===
      "INSERT /*+ IGNORE_INDEX(t) */ INTO `s`.`t` (`id`,`name`) VALUES (1,'a'),(2,'b');")
    // the reference's prepared twin: (?,…) group repeated batch times
    // (GenMYSQLCompatibleDatabasePrepareStmt)
    assert(SqlDialects.prepareInsertSql(SqlDialects.mysql, "s", "t", cols, 3) ===
      "INSERT INTO `s`.`t` (`id`,`name`) VALUES (?,?),(?,?),(?,?)")
    assert(SqlDialects.prepareUpsertSql(SqlDialects.mysql, "s", "t", cols, keys) ===
      "REPLACE INTO `s`.`t` (`id`,`name`) VALUES (?,?)")
    // batch bind groups — the safe-mode arm of the reference's
    // GenMYSQLCompatibleDatabasePrepareStmt
    assert(SqlDialects.prepareUpsertSql(SqlDialects.mysql, "s", "t", cols, keys,
      batchRows = 3) ===
      "REPLACE INTO `s`.`t` (`id`,`name`) VALUES (?,?),(?,?),(?,?)")
    // tidb rides the same row
    assert(SqlDialects.upsertSql(SqlDialects.tidb, "s", "t", cols, keys, rows)
      .startsWith("REPLACE INTO"))
  }

  test("oracle: INSERT ALL for multi-row, MERGE over DUAL for safe mode") {
    assert(SqlDialects.insertSql(SqlDialects.oracle, "S", "T", cols, rows) ===
      "INSERT ALL\n" +
        " INTO \"S\".\"T\" (\"id\",\"name\") VALUES (1,'a')\n" +
        " INTO \"S\".\"T\" (\"id\",\"name\") VALUES (2,'b')\n" +
        "SELECT * FROM DUAL;")
    // single row degrades to plain INSERT (processor_translate_oracle.go:100-112)
    assert(SqlDialects.insertSql(SqlDialects.oracle, "S", "T", cols, rows.take(1)) ===
      "INSERT INTO \"S\".\"T\" (\"id\",\"name\") VALUES (1,'a');")
    val merge = SqlDialects.upsertSql(SqlDialects.oracle, "S", "T", cols, keys, rows)
    assert(merge ===
      "MERGE INTO \"S\".\"T\" T1\n" +
        "USING (SELECT 1 AS \"id\",'a' AS \"name\" FROM DUAL" +
        " UNION SELECT 2 AS \"id\",'b' AS \"name\" FROM DUAL) T2\n" +
        "ON (T1.\"id\" = T2.\"id\")\n" +
        "WHEN MATCHED THEN UPDATE SET T1.\"name\" = T2.\"name\"\n" +
        "WHEN NOT MATCHED THEN INSERT (\"id\",\"name\") VALUES (T2.\"id\",T2.\"name\")")
    // all-key rows: nothing to update — MATCHED branch must vanish
    val allKeys = SqlDialects.upsertSql(SqlDialects.oracle, "S", "T",
      Seq("id"), Seq("id"), Seq(Seq("1")))
    assert(!allKeys.contains("WHEN MATCHED"))
    // prepared single-row twin binds through the USING select
    assert(SqlDialects.prepareUpsertSql(SqlDialects.oracle, "S", "T", cols, keys)
      .contains("USING (SELECT ? AS \"id\",? AS \"name\" FROM DUAL) T2"))
  }

  test("postgres: INSERT .. ON CONFLICT (keys) DO UPDATE SET c = excluded.c") {
    assert(SqlDialects.upsertSql(SqlDialects.postgres, "s", "t", cols, keys, rows) ===
      "INSERT INTO \"s\".\"t\" (\"id\",\"name\") VALUES (1,'a'),(2,'b') " +
        "ON CONFLICT (\"id\") DO UPDATE SET \"name\" = excluded.\"name\";")
    // all columns are keys → DO NOTHING
    assert(SqlDialects.upsertSql(SqlDialects.postgres, "s", "t",
      Seq("id"), Seq("id"), Seq(Seq("1"))).endsWith("ON CONFLICT (\"id\") DO NOTHING;"))
    assert(SqlDialects.prepareUpsertSql(SqlDialects.postgres, "s", "t", cols, keys) ===
      "INSERT INTO \"s\".\"t\" (\"id\",\"name\") VALUES (?,?) " +
        "ON CONFLICT (\"id\") DO UPDATE SET \"name\" = excluded.\"name\"")
  }

  test("keyed DELETE renders IS NULL and an executable per-dialect limit") {
    // no limit: the plain keyed form, any dialect
    assert(SqlDialects.deleteSql(SqlDialects.derby, "s", "t",
      Seq("id", "name"), Seq("1", "NULL")) ===
      "DELETE FROM \"s\".\"t\" WHERE \"id\" = 1 AND \"name\" IS NULL;")
    // mysql/tidb: native DELETE … LIMIT
    assert(SqlDialects.deleteSql(SqlDialects.mysql, "s", "t",
      Seq("id"), Seq("1"), Some(2)) ===
      "DELETE FROM `s`.`t` WHERE `id` = 1 LIMIT 2;")
    // postgres has NO DELETE … LIMIT (the reference emits it anyway) —
    // the executable equivalent is the ctid subquery
    assert(SqlDialects.deleteSql(SqlDialects.postgres, "s", "t",
      Seq("id", "name"), Seq("1", "NULL"), Some(2)) ===
      "DELETE FROM \"s\".\"t\" WHERE ctid IN (SELECT ctid FROM \"s\".\"t\" " +
        "WHERE \"id\" = 1 AND \"name\" IS NULL LIMIT 2);")
    // oracle: ROWNUM conjunct
    assert(SqlDialects.deleteSql(SqlDialects.oracle, "S", "T",
      Seq("id"), Seq("1"), Some(2)) ===
      "DELETE FROM \"S\".\"T\" WHERE \"id\" = 1 AND ROWNUM <= 2;")
    // dialects with no row-limited DELETE refuse the limit outright
    intercept[IllegalArgumentException] {
      SqlDialects.deleteSql(SqlDialects.derby, "s", "t", Seq("id"), Seq("1"), Some(2))
    }
  }

  test("identifier gate refuses quote-smuggling and statement text") {
    intercept[IllegalArgumentException] {
      SqlDialects.quoteId(SqlDialects.mysql, "t`; DROP TABLE x; --")
    }
    intercept[IllegalArgumentException] {
      SqlDialects.quoteId(SqlDialects.oracle, "t\" OR \"1\"=\"1")
    }
    intercept[IllegalArgumentException] { SqlDialects.quoteId(SqlDialects.mysql, "") }
  }

  test("derby merge rejects the derived-table source (base tables only)") {
    intercept[IllegalArgumentException] {
      SqlDialects.upsertSql(SqlDialects.derby, "APP", "T", cols, keys, rows)
    }
  }

  test("generic dialect points single-statement upsert at safeModeWrite") {
    intercept[IllegalArgumentException] {
      SqlDialects.upsertSql(SqlDialects.generic, "s", "t", cols, keys, rows)
    }
  }

  test("datatype-aware literals: temporals, bytes, booleans per dialect") {
    import SqlDialects.literal
    val ts = java.sql.Timestamp.valueOf("2026-08-15 06:30:00.123456")
    val dt = java.sql.Date.valueOf("2026-08-15")
    assert(literal(SqlDialects.oracle, ts) ===
      "TO_TIMESTAMP('2026-08-15 06:30:00.123456','YYYY-MM-DD HH24:MI:SS.FF6')")
    assert(literal(SqlDialects.mysql, ts) === "TIMESTAMP '2026-08-15 06:30:00.123456'")
    // nanosecond precision truncates to the declared 6 fractional digits
    // (Timestamp.toString would emit 9 — Oracle's FF6 mask rejects that)
    val ns = java.sql.Timestamp.valueOf("2026-08-15 06:30:00")
    ns.setNanos(123456789)
    assert(literal(SqlDialects.oracle, ns) ===
      "TO_TIMESTAMP('2026-08-15 06:30:00.123456','YYYY-MM-DD HH24:MI:SS.FF6')")
    assert(literal(SqlDialects.mysql, ns) === "TIMESTAMP '2026-08-15 06:30:00.123456'")
    assert(literal(SqlDialects.oracle, dt) === "TO_DATE('2026-08-15','YYYY-MM-DD')")
    assert(literal(SqlDialects.postgres, dt) === "DATE '2026-08-15'")
    assert(literal(SqlDialects.mysql, Array[Byte](0x0A, -1)) === "x'0AFF'")
    assert(literal(SqlDialects.postgres, Array[Byte](0x0A, -1)) === "'\\x0AFF'::bytea")
    assert(literal(SqlDialects.oracle, Array[Byte](0x0A, -1)) === "HEXTORAW('0AFF')")
    assert(literal(SqlDialects.derby, Array[Byte](0x0A, -1)) === "X'0AFF'")
    assert(literal(SqlDialects.postgres, true) === "TRUE")
    assert(literal(SqlDialects.mysql, true) === "1")
    assert(literal(SqlDialects.mysql, "O'Brien") === "'O''Brien'")
    assert(literal(SqlDialects.mysql, null) === "NULL")
    assert(literal(SqlDialects.mysql, new java.math.BigDecimal("12.3400")) === "12.3400")
    assert(literal(SqlDialects.mysql, 42L) === "42")
  }

  test("NLSSORT collated range text composes with lexPredicateSql (chunk.go:139-251)") {
    assert(Jdbc.nlssortKey("C_NAME", "BINARY_CI") ===
      """NLSSORT("C_NAME",'NLS_SORT=BINARY_CI')""")
    assert(Jdbc.nlssortKey("C_NAME", "BINARY_CI", Some(("AL32UTF8", "ZHS16GBK"))) ===
      """NLSSORT(CONVERT("C_NAME",'AL32UTF8','ZHS16GBK'),'NLS_SORT=BINARY_CI')""")
    assert(Jdbc.nlssortBound("'abc'", "BINARY_CI") ===
      "NLSSORT('abc','NLS_SORT=BINARY_CI')")
    assert(Jdbc.nlssortBound("'2026-08-15 00:00:00'", "BINARY_CI", kind = "date") ===
      "NLSSORT(TO_DATE('2026-08-15 00:00:00','YYYY-MM-DD HH24:MI:SS'),'NLS_SORT=BINARY_CI')")
    assert(Jdbc.nlssortBound("'2026-08-15 00:00:00.1'", "BINARY_CI",
      kind = "timestamp", datetimePrecision = 3) ===
      "NLSSORT(TO_TIMESTAMP('2026-08-15 00:00:00.1','YYYY-MM-DD HH24:MI:SS.FF3'),'NLS_SORT=BINARY_CI')")
    // the composed chunk fragment: collated 1-column [lower, upper)
    val key = Seq(Jdbc.nlssortKey("C_NAME", "BINARY_CI"))
    val frag = Jdbc.lexPredicateSql(key,
      Seq(Jdbc.nlssortBound("'aaa'", "BINARY_CI")),
      Seq(Jdbc.nlssortBound("'mmm'", "BINARY_CI")))
    assert(frag.contains("""NLSSORT("C_NAME",'NLS_SORT=BINARY_CI') > NLSSORT('aaa','NLS_SORT=BINARY_CI')"""))
    assert(frag.contains("AND NOT"))
  }

  test("live: staged set-based MERGE applies a batch idempotently on Derby") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_merge")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "v")
    Jdbc.writeBatched(base, url, "MERGE_TGT", props, mode = "overwrite")

    // batch: update id=2, insert id=4
    val batch = Seq((2L, "b2", 22.0), (4L, "d", 4.0)).toDF("id", "name", "v")
    Jdbc.safeModeMerge(spark, url, "APP", "MERGE_TGT", batch, Seq("id"),
      SqlDialects.derby, props)
    def state() = spark.read.jdbc(url, "MERGE_TGT", props)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    val after1 = state()
    assert(after1 === Seq((1L, "a", 1.0), (2L, "b2", 22.0), (3L, "c", 3.0), (4L, "d", 4.0)))

    // replay the same batch — idempotent
    Jdbc.safeModeMerge(spark, url, "APP", "MERGE_TGT", batch, Seq("id"),
      SqlDialects.derby, props)
    assert(state() === after1, "second apply of the same batch must be a no-op")

    // the stage landed schema-qualified (not in the connection default):
    // reading it by its qualified name must succeed
    assert(spark.read.jdbc(url, "APP.MERGE_TGT_STAGE", props).count() == 2)

    // identifier gate fires BEFORE any stage write
    intercept[IllegalArgumentException] {
      Jdbc.safeModeMerge(spark, url, "APP", "T; DROP TABLE X", batch, Seq("id"),
        SqlDialects.derby, props)
    }
    intercept[IllegalArgumentException] {
      Jdbc.safeModeMerge(spark, url, "A\"PP", "MERGE_TGT", batch, Seq("id"),
        SqlDialects.derby, props)
    }
  }
}

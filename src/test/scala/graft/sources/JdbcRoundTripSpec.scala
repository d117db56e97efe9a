package graft.sources

import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.ChunkPlanner

/** End-to-end federated JDBC proof against an embedded Derby database —
  * the live-database path the reference actually runs
  * (`database/oracle/data_migrate.go:350-384` chunked fetch,
  * `database/processor/stmt_migrate_row.go:206-303` batched/safe-mode
  * write). Exercises: batched INSERT out, chunk-predicate parallel read
  * back (one Spark partition per chunk), value-exact round-trip, and
  * replay-idempotent safe mode — all through a real JDBC driver, no mocks.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private lazy val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"
  private val props = new Properties()
  props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val src = Tables(spark, sfDir).lineitem
    .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
      col("l_quantity").cast("double").as("l_quantity"))

  test("batched INSERT out, chunk-parallel read back, value-exact") {
    Jdbc.writeBatched(src, url, "LINEITEM_RT", props, batchSize = 200,
      mode = "overwrite")

    val chunks = ChunkPlanner.plan(src, "l_orderkey", nChunks = 4)
    assert(chunks.size >= 2, "fixture must split into multiple chunks")
    val back = Jdbc.readChunked(spark, url, "LINEITEM_RT", "\"l_orderkey\"",
      chunks, props)

    // one Spark partition per chunk predicate = the reference's
    // chunk×thread fetch parallelism
    assert(back.rdd.getNumPartitions == chunks.size)

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    val a = src.collect().map(key).sorted
    val b = back.select(col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"), col("l_linenumber").cast("int"),
        col("l_quantity").cast("double"))
      .collect().map(key).sorted
    assert(a.length == b.length && a.sameElements(b),
      s"round-trip mismatch: ${a.length} vs ${b.length} rows")
  }

  test("chunk predicates push into the remote query (no residual Spark filter)") {
    val chunks = ChunkPlanner.plan(src, "l_orderkey", nChunks = 4)
    val back = Jdbc.readChunked(spark, url, "LINEITEM_RT", "\"l_orderkey\"",
      chunks, props)
    // each JDBCRelation partition embeds its predicate; a Filter node above
    // the scan would mean Spark re-applies ranges the database already cut
    val plan = back.queryExecution.executedPlan
    assert(plan.toString().contains("JDBCRelation"), plan.toString())
    val residual = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residual.isEmpty, s"chunk ranges must stay remote:\n$plan")
  }

  test("lexicographic 2-column chunk predicates partition the table exactly") {
    // chunks over (l_orderkey, l_linenumber) — the reference's multi-col
    // Range.ToString contract; bounds picked inside the key space so the
    // middle chunks exercise the (k1=l1 AND k2>l2) tie arm
    val keys = Seq("\"l_orderkey\"", "\"l_linenumber\"")
    val rows = src.select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val n = rows.length
    val bounds = Seq(rows.head, rows(n / 3), rows(2 * n / 3), rows.last)
    def lit(b: (Long, Int)) = Seq(b._1.toString, b._2.toString)
    // first chunk lower-unbounded / last upper-unbounded via sentinels
    val preds = Seq(
      Jdbc.lexPredicateSql(keys, Seq("-1", "-1"), lit(bounds(1))),
      Jdbc.lexPredicateSql(keys, lit(bounds(1)), lit(bounds(2))),
      Jdbc.lexPredicateSql(keys, lit(bounds(2)),
        Seq(Long.MaxValue.toString, "2147483647")))
    val props2 = new Properties()
    props2.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val back = spark.read.jdbc(url, "LINEITEM_RT", preds.toArray, props2)
    assert(back.rdd.getNumPartitions == 3)
    val got = back.select(col("l_orderkey").cast("long"),
        col("l_linenumber").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    // [lower, upper) chunks must cover every row exactly once: sentinel
    // lower (-1,-1) < min key and sentinel upper > max key
    assert(got.length == n, s"${got.length} vs $n — chunks overlap or leak")
    assert(got.sameElements(rows))
  }

  test("end-to-end compare: live JDBC source vs parquet target finds the exact corruption") {
    // the reference's core scenario (data_compare_task.go): checksum a
    // live database against a file copy, drill into unequal chunks only
    import graft.operators.{ChunkPlanner, DataCompare}
    val cols = Seq("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")

    val chunks = ChunkPlanner.plan(src, "l_orderkey", nChunks = 4)
    val live = Jdbc.readChunked(spark, url, "LINEITEM_RT", "\"l_orderkey\"",
      chunks, props)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
        col("l_linenumber").cast("int"), col("l_quantity").cast("double"))
    val cid = graft.operators.ChunkPlanner.chunkIdColumn(col("l_orderkey"), chunks)

    val clean = DataCompare.compareChunks(live, src, cid, cols)
    assert(clean.where(col("status") =!= "EQUAL").count() == 0,
      "pristine copy must checksum EQUAL in every chunk")

    // corrupt ONE row in the live database (driver-side UPDATE)
    val victim = src.orderBy("l_orderkey", "l_partkey", "l_linenumber")
      .select("l_orderkey", "l_partkey", "l_linenumber").head()
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.executeUpdate("UPDATE LINEITEM_RT SET \"l_quantity\" = 12345.0 WHERE " +
        s""""l_orderkey" = ${victim.getLong(0)} AND "l_partkey" = ${victim.getLong(1)}""" +
        s""" AND "l_linenumber" = ${victim.getInt(2)}""")
      st.close()
    } finally conn.close()

    val live2 = Jdbc.readChunked(spark, url, "LINEITEM_RT", "\"l_orderkey\"",
      chunks, props)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
        col("l_linenumber").cast("int"), col("l_quantity").cast("double"))
    val status = DataCompare.compareChunks(live2, src, cid, cols).cache()
    val bad = status.where(col("status") =!= "EQUAL")
    assert(bad.count() == 1, "exactly one chunk must flag after one-row corruption")
    val diff = DataCompare.rowDiff(live2, src, cols, Some(cid), Some(bad))
    val diffRows = diff.collect()
    assert(diffRows.length == 2, // the corrupted row appears from both sides
      s"rowDiff must isolate the corrupted row pair, got ${diffRows.length}")
    assert(diffRows.forall(_.getAs[Long]("l_orderkey") == victim.getLong(0)))

    // repair via safe mode from the file copy, re-compare → clean again
    val fix = src.where(col("l_orderkey") === victim.getLong(0) &&
      col("l_partkey") === victim.getLong(1) &&
      col("l_linenumber") === victim.getInt(2))
    Jdbc.safeModeWrite(spark, url, "LINEITEM_RT", fix,
      Seq("l_orderkey", "l_partkey", "l_linenumber"), props)
    val live3 = Jdbc.readChunked(spark, url, "LINEITEM_RT", "\"l_orderkey\"",
      chunks, props)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
        col("l_linenumber").cast("int"), col("l_quantity").cast("double"))
    assert(DataCompare.compareChunks(live3, src, cid, cols)
      .where(col("status") =!= "EQUAL").count() == 0,
      "safe-mode repair from the clean copy must restore EQUAL everywhere")
  }

  test("safe-mode write is idempotent under replay and keeps unmatched rows") {
    val s = spark
    import s.implicits._
    Jdbc.writeBatched(src.limit(50), url, "LINEITEM_SAFE", props,
      mode = "overwrite")
    val before = spark.read.jdbc(url, "LINEITEM_SAFE", props)
    val keep = before.count()

    // batch: rewrite quantity for the 10 smallest orderkeys
    val batch = spark.read.jdbc(url, "LINEITEM_SAFE", props)
      .orderBy("l_orderkey", "l_partkey", "l_linenumber").limit(10)
      .withColumn("l_quantity", lit(999.0))

    val keys = Seq("l_orderkey", "l_partkey", "l_linenumber")
    Jdbc.safeModeWrite(spark, url, "LINEITEM_SAFE", batch, keys, props)
    val after1 = spark.read.jdbc(url, "LINEITEM_SAFE", props)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    Jdbc.safeModeWrite(spark, url, "LINEITEM_SAFE", batch, keys, props)
    val after2 = spark.read.jdbc(url, "LINEITEM_SAFE", props)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))

    assert(after1.length == keep, "safe mode must not change row count here")
    assert(after1.sameElements(after2), "second apply of the same batch must be a no-op")
    val touched = spark.read.jdbc(url, "LINEITEM_SAFE", props)
      .where(col("l_quantity") === 999.0).count()
    assert(touched == 10L, s"batch rows must win: $touched")
  }

  test("safe-mode swap is transactional: a failure mid-swap leaves the target intact") {
    Jdbc.writeBatched(src.limit(20), url, "LINEITEM_TXN", props,
      mode = "overwrite")
    val before = spark.read.jdbc(url, "LINEITEM_TXN", props)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(before.length == 20)

    // stage table does not exist → the INSERT half of the DELETE/INSERT
    // swap throws AFTER the DELETE ran; the txn must roll the DELETE back
    val ex = intercept[java.sql.SQLException] {
      Jdbc.swapFromStage(url, "LINEITEM_TXN", "LINEITEM_NO_SUCH_STAGE", props)
    }
    assert(ex != null)
    val after = spark.read.jdbc(url, "LINEITEM_TXN", props)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(after.sameElements(before),
      "failed swap must not lose the live table (DELETE must roll back)")
  }

  test("swap refuses unsafe table identifiers") {
    intercept[IllegalArgumentException] {
      Jdbc.swapFromStage(url, "T; DROP TABLE X", "STAGE", props)
    }
  }

  test("prepared bind-var twins execute live: batch INSERT, multi-row groups, keyed DELETE") {
    // the rendered prepared forms (q600's oracle pins their TEXT) driven
    // through real addBatch/executeBatch on Derby — the reference's apply
    // loop (stmt_migrate_row.go:206-303) end-to-end, not just rendered
    val s = spark
    import s.implicits._
    val seed = Seq((0L, "seed", 0.0)).toDF("id", "name", "v")
    Jdbc.writeBatched(seed, url, "APP.PREP_RT", props, mode = "overwrite")

    val d = SqlDialects.derby
    val cols = Seq("id", "name", "v")
    // single-row groups, one flush boundary crossed (batchSize 2 over 5
    // rows), a NULL bind in the middle (typed via parameter metadata)
    val ins = SqlDialects.prepareInsertSql(d, "APP", "PREP_RT", cols)
    val rows: Seq[Seq[Any]] = Seq(
      Seq(1L, "a", 1.5), Seq(2L, "b", 2.5), Seq(3L, null, 3.5),
      Seq(4L, "d", 4.5), Seq(5L, "e", 5.5))
    val applied = Jdbc.writePrepared(url, props, ins, rows, batchSize = 2)
    assert(applied == 5L, s"driver must report 5 rows applied, got $applied")

    def state() = spark.read.jdbc(url, "APP.PREP_RT", props)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(state() === Seq((0L, Some("seed"), 0.0), (1L, Some("a"), 1.5),
      (2L, Some("b"), 2.5), (3L, None, 3.5), (4L, Some("d"), 4.5),
      (5L, Some("e"), 5.5)))

    // multi-row VALUES groups: Derby accepts row-list VALUES, so the
    // mysql-shaped repeated (?,…) group executes live too
    val multi = SqlDialects.prepareInsertSql(d.copy(multiRowValues = true),
      "APP", "PREP_RT", cols, batchRows = 2)
    val applied2 = Jdbc.writePrepared(url, props, multi,
      Seq(Seq(6L, "f", 6.5), Seq(7L, "g", 7.5)), rowsPerStmt = 2)
    assert(applied2 == 2L)
    assert(state().map(_._1) === (0L to 7L))

    // uneven grouping is refused up front (the caller renders the tail
    // with its own statement, the reference's partial-batch shape)
    intercept[IllegalArgumentException] {
      Jdbc.writePrepared(url, props, multi, Seq(Seq(8L, "h", 8.5)), rowsPerStmt = 2)
    }

    // keyed DELETE with IS NULL, executed live in a transaction
    Jdbc.execInTxn(url, props)(Seq(
      SqlDialects.deleteSql(d, "APP", "PREP_RT",
        Seq("id", "name"), Seq("3", "NULL")).stripSuffix(";")))
    assert(state().map(_._1) === Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L))

    // a failing statement mid-batch rolls the whole prepared batch back
    intercept[java.sql.SQLException] {
      Jdbc.writePrepared(url, props, ins,
        Seq(Seq(8L, "h", 8.5), Seq(8L, "dup-pk-if-any-or-type-err", "not-a-double")))
    }
    assert(state().map(_._1) === Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L),
      "failed batch must leave no partial rows")
  }
}

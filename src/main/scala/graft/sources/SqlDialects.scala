package graft.sources

/** One dialect = one data row (the TypeMap pattern): identifier quoting,
  * native upsert form, multi-row VALUES support, and the 1-row system
  * table for SELECT-without-FROM are per-dialect FACTS; every rendering
  * function lives once in [[SqlDialects]] and reads the row. Adding a
  * dialect is adding data, not code.
  */
final case class SqlDialect(
    name: String,
    quote: String,             // identifier quote character
    upsertForm: String,        // replace | merge | on_conflict | delete_insert
    multiRowValues: Boolean,   // INSERT ... VALUES (..),(..) supported
    dualTable: Option[String], // FROM-clause for row-less SELECT (MERGE USING)
    mergeSource: String = "query") // "query": USING (SELECT…); "table": base tables only

/** Table-driven SQL rendering for the JDBC leg — the reference's
  * per-dialect statement translators re-expressed as one shared renderer
  * over a dialect data table:
  *
  *  - MySQL/TiDB — REPLACE INTO as safe mode, multi-row VALUES, backtick
  *    quoting, optional optimizer hint after the verb
  *    (`database/processor/processor_translate_mysql.go:27-95`).
  *  - Oracle — safe mode is MERGE INTO … USING (SELECT … FROM DUAL UNION
  *    …); multi-row plain insert is INSERT ALL … SELECT * FROM DUAL;
  *    double-quote identifiers (`processor_translate_oracle.go:27-103`).
  *    Deviation (deliberate): the reference renders the MATCHED branch by
  *    reusing the ON conjunction verbatim — AND-separated and including
  *    the key columns, which Oracle rejects (SET must be comma-separated
  *    and must not touch ON columns). This renderer emits the executable
  *    form: comma-separated SET over non-key columns only, and omits the
  *    MATCHED branch when every column is a key.
  *  - Postgres — INSERT … ON CONFLICT (keys) DO UPDATE SET c = excluded.c
  *    (`processor_translate_postgres.go:27-65`).
  *  - Derby — the sandbox's live embedded target: MERGE like Oracle, but
  *    Derby accepts only BASE TABLES as the USING source (probed: derived
  *    tables raise "must be a base table or table function"), so its
  *    executable safe mode is the staged set-based merge
  *    ([[Jdbc.safeModeMerge]]: batch → stage table → one MERGE) — which is
  *    also the shape that scales (the stage write is executor-parallel,
  *    the merge is one set-based statement; no row passes the driver).
  *
  * All rendering is driver/executor-side string work over chunk-sized
  * batches — nothing here scans data; the scale path stays
  * `spark.read.jdbc(predicates)` / `df.write.jdbc` ([[Jdbc]]).
  */
object SqlDialects {

  val mysql    = SqlDialect("mysql", "`", "replace", multiRowValues = true, None)
  val tidb     = SqlDialect("tidb", "`", "replace", multiRowValues = true, None)
  val oracle   = SqlDialect("oracle", "\"", "merge", multiRowValues = false, Some("DUAL"))
  val postgres = SqlDialect("postgres", "\"", "on_conflict", multiRowValues = true, None)
  val derby    = SqlDialect("derby", "\"", "merge", multiRowValues = false,
    Some("SYSIBM.SYSDUMMY1"), mergeSource = "table")
  /** No native upsert assumed — [[Jdbc.safeModeWrite]]'s staged
    * DELETE+INSERT swap is the lowest-common-denominator form.
    */
  val generic  = SqlDialect("generic", "\"", "delete_insert", multiRowValues = false, None)

  val all: Seq[SqlDialect] = Seq(mysql, tidb, oracle, postgres, derby, generic)

  def byName(name: String): SqlDialect =
    all.find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(s"unknown dialect: $name"))

  /** Quote one identifier. Identifiers are interpolated into statement
    * text, so anything that could smuggle statement text is refused —
    * same gate as [[Jdbc.swapFromStage]], extended to the quote char.
    */
  def quoteId(d: SqlDialect, id: String): String = {
    require(id.nonEmpty && !id.contains(d.quote) && id.matches("[A-Za-z0-9_#$ ]+"),
      s"unsafe identifier: $id")
    s"${d.quote}$id${d.quote}"
  }

  def qualified(d: SqlDialect, schema: String, table: String): String =
    s"${quoteId(d, schema)}.${quoteId(d, table)}"

  private def verbWithHint(verb: String, hint: String): String =
    if (hint.isEmpty) verb else s"$verb $hint"

  /** Plain batch INSERT with literal rows (values pre-rendered by the
    * caller, the reference's columnDataString contract). Multi-row
    * dialects emit one `INSERT … VALUES (…),(…)`; Oracle-shaped dialects
    * emit `INSERT ALL … SELECT * FROM <dual>` for >1 row.
    */
  def insertSql(d: SqlDialect, schema: String, table: String,
      columns: Seq[String], rows: Seq[Seq[String]], hint: String = ""): String = {
    require(rows.nonEmpty, "no rows to render")
    val cols = columns.map(quoteId(d, _)).mkString(",")
    val tgt  = qualified(d, schema, table)
    if (rows.length == 1 || d.multiRowValues) {
      val values = rows.map(_.mkString("(", ",", ")")).mkString(",")
      s"${verbWithHint("INSERT", hint)} INTO $tgt ($cols) VALUES $values;"
    } else {
      val dual = d.dualTable.getOrElse(
        throw new IllegalArgumentException(s"${d.name}: no multi-row INSERT form"))
      val intos = rows
        .map(r => s" INTO $tgt ($cols) VALUES ${r.mkString("(", ",", ")")}")
        .mkString("\n")
      s"${verbWithHint("INSERT ALL", hint)}\n$intos\nSELECT * FROM $dual;"
    }
  }

  /** Safe-mode (idempotent re-apply) batch statement with literal rows —
    * the dialect's native upsert. `delete_insert` dialects have no single
    * statement: use [[Jdbc.safeModeWrite]] instead.
    */
  def upsertSql(d: SqlDialect, schema: String, table: String, columns: Seq[String],
      keys: Seq[String], rows: Seq[Seq[String]], hint: String = ""): String = {
    require(rows.nonEmpty, "no rows to render")
    require(keys.nonEmpty && keys.forall(columns.contains), s"keys must be columns: $keys")
    val cols = columns.map(quoteId(d, _)).mkString(",")
    val tgt  = qualified(d, schema, table)
    d.upsertForm match {
      case "replace" =>
        val values = rows.map(_.mkString("(", ",", ")")).mkString(",")
        s"${verbWithHint("REPLACE", hint)} INTO $tgt ($cols) VALUES $values;"
      case "on_conflict" =>
        val values  = rows.map(_.mkString("(", ",", ")")).mkString(",")
        val keyCols = keys.map(quoteId(d, _)).mkString(",")
        val nonKeys = columns.filterNot(keys.contains)
        val action =
          if (nonKeys.isEmpty) "DO NOTHING"
          else "DO UPDATE SET " + nonKeys
            .map(c => s"${quoteId(d, c)} = excluded.${quoteId(d, c)}").mkString(",")
        s"${verbWithHint("INSERT", hint)} INTO $tgt ($cols) VALUES $values " +
          s"ON CONFLICT ($keyCols) $action;"
      case "merge" =>
        require(d.mergeSource == "query",
          s"${d.name}: MERGE accepts only base-table sources; use mergeTableSql/Jdbc.safeModeMerge")
        val dual = d.dualTable.getOrElse(
          throw new IllegalArgumentException(s"${d.name}: merge needs a dual table"))
        // UNION, not UNION ALL (processor_translate_oracle.go:69): a MERGE
        // source with duplicate full rows raises ORA-30926; UNION dedups
        val selects = rows.map { r =>
          val as = r.zip(columns).map { case (v, c) => s"$v AS ${quoteId(d, c)}" }
          s"SELECT ${as.mkString(",")} FROM $dual"
        }.mkString(" UNION ")
        mergeText(d, tgt, columns, keys, s"($selects)", hint)
      case other =>
        throw new IllegalArgumentException(
          s"${d.name}: no single-statement upsert ($other); use Jdbc.safeModeWrite")
    }
  }

  /** Set-based MERGE from a staged base table — the executable (and
    * scale-preferred) safe-mode shape: the batch lands in `sourceTable`
    * executor-parallel, then this ONE statement applies it. Valid on every
    * merge dialect (Oracle allows table sources too; Derby allows ONLY
    * them).
    */
  def mergeTableSql(d: SqlDialect, schema: String, table: String,
      sourceTable: String, columns: Seq[String], keys: Seq[String],
      hint: String = "", sourceSchema: Option[String] = None): String = {
    require(d.upsertForm == "merge", s"${d.name}: not a merge dialect")
    require(keys.nonEmpty && keys.forall(columns.contains), s"keys must be columns: $keys")
    // qualify the stage like the target: an unqualified source resolves in
    // the CONNECTION's default schema, which silently diverges from the
    // schema the stage was written to whenever the two differ
    val src = sourceSchema.map(qualified(d, _, sourceTable))
      .getOrElse(quoteId(d, sourceTable))
    mergeText(d, qualified(d, schema, table), columns, keys, src, hint)
  }

  private def mergeText(d: SqlDialect, tgt: String, columns: Seq[String],
      keys: Seq[String], usingClause: String, hint: String): String = {
    val onConds = keys.map(k => s"T1.${quoteId(d, k)} = T2.${quoteId(d, k)}")
      .mkString(" AND ")
    val nonKeys = columns.filterNot(keys.contains)
    val matched =
      if (nonKeys.isEmpty) ""
      else "\nWHEN MATCHED THEN UPDATE SET " + nonKeys
        .map(c => s"T1.${quoteId(d, c)} = T2.${quoteId(d, c)}").mkString(",")
    val insCols = columns.map(quoteId(d, _)).mkString(",")
    val insVals = columns.map(c => s"T2.${quoteId(d, c)}").mkString(",")
    s"${verbWithHint("MERGE", hint)} INTO $tgt T1\nUSING $usingClause T2\n" +
      s"ON ($onConds)$matched\n" +
      s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
  }

  /** Bind-variable INSERT prefix+binds for addBatch loops — the
    * reference's `GenMYSQLCompatibleDatabasePrepareStmt`
    * (`processor_translate_mysql.go:27-33`): `batchRows` copies of the
    * `(?,…,?)` group for multi-row dialects, a single group otherwise.
    */
  def prepareInsertSql(d: SqlDialect, schema: String, table: String,
      columns: Seq[String], batchRows: Int = 1, hint: String = ""): String = {
    val cols  = columns.map(quoteId(d, _)).mkString(",")
    val group = columns.map(_ => "?").mkString("(", ",", ")")
    val n     = if (d.multiRowValues) math.max(batchRows, 1) else 1
    s"${verbWithHint("INSERT", hint)} INTO ${qualified(d, schema, table)} ($cols) " +
      s"VALUES ${Seq.fill(n)(group).mkString(",")}"
  }

  /** Bind-variable upsert for addBatch/executeBatch loops — the
    * executable twin of [[upsertSql]] (the reference's prepared apply,
    * `stmt_migrate_row.go:206-303`). `batchRows` repeats the `(?,…)`
    * group on multi-row dialects (the safe-mode arm of
    * `GenMYSQLCompatibleDatabasePrepareStmt`); merge/on-conflict forms
    * stay single-row (one statement per row, batched by the driver).
    */
  def prepareUpsertSql(d: SqlDialect, schema: String, table: String,
      columns: Seq[String], keys: Seq[String], hint: String = "",
      batchRows: Int = 1): String = {
    require(keys.nonEmpty && keys.forall(columns.contains), s"keys must be columns: $keys")
    val cols  = columns.map(quoteId(d, _)).mkString(",")
    val tgt   = qualified(d, schema, table)
    val group = columns.map(_ => "?").mkString("(", ",", ")")
    d.upsertForm match {
      case "replace" =>
        val n = if (d.multiRowValues) math.max(batchRows, 1) else 1
        s"${verbWithHint("REPLACE", hint)} INTO $tgt ($cols) " +
          s"VALUES ${Seq.fill(n)(group).mkString(",")}"
      case "on_conflict" =>
        val keyCols = keys.map(quoteId(d, _)).mkString(",")
        val nonKeys = columns.filterNot(keys.contains)
        val action =
          if (nonKeys.isEmpty) "DO NOTHING"
          else "DO UPDATE SET " + nonKeys
            .map(c => s"${quoteId(d, c)} = excluded.${quoteId(d, c)}").mkString(",")
        s"${verbWithHint("INSERT", hint)} INTO $tgt ($cols) VALUES $group " +
          s"ON CONFLICT ($keyCols) $action"
      case "merge" =>
        require(d.mergeSource == "query",
          s"${d.name}: MERGE accepts only base-table sources; use mergeTableSql/Jdbc.safeModeMerge")
        val dual = d.dualTable.getOrElse(
          throw new IllegalArgumentException(s"${d.name}: merge needs a dual table"))
        val as = columns.map(c => s"? AS ${quoteId(d, c)}").mkString(",")
        mergeText(d, tgt, columns, keys, s"(SELECT $as FROM $dual)", hint)
      case other =>
        throw new IllegalArgumentException(
          s"${d.name}: no single-statement upsert ($other); use Jdbc.safeModeWrite")
    }
  }

  /** Datatype-aware literal rendering — the reference's per-type
    * `columnDataString` build (its processors render strings quoted,
    * temporals through TO_DATE/TO_TIMESTAMP on Oracle, raw bytes through
    * the dialect's hex constructor; `chunk.go:139-144` shows the temporal
    * bind forms). NULL-safe; strings double embedded quotes.
    */
  def literal(d: SqlDialect, v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp =>
      // JDBC escape form: yyyy-mm-dd hh:mm:ss.f… — toString emits up to 9
      // fractional digits; truncate to the 6 the rendered masks declare
      // (FF6 / engine TIMESTAMP defaults), or Oracle rejects the literal
      val raw = t.toString
      val dot = raw.indexOf('.')
      // dot >= 0 guard: Timestamp.toString always emits fractions today,
      // but a dot-less form would otherwise corrupt the substring below
      val txt = if (dot >= 0 && raw.length - dot - 1 > 6) raw.substring(0, dot + 7) else raw
      d.name match {
        case "oracle" => s"TO_TIMESTAMP('$txt','YYYY-MM-DD HH24:MI:SS.FF6')"
        case _        => s"TIMESTAMP '$txt'"
      }
    case dt: java.sql.Date =>
      d.name match {
        case "oracle" => s"TO_DATE('$dt','YYYY-MM-DD')"
        case _        => s"DATE '$dt'"
      }
    case b: Array[Byte] =>
      val hx = b.map(x => f"$x%02X").mkString
      d.name match {
        case "mysql" | "tidb" => s"x'$hx'"
        case "postgres"       => s"'\\x$hx'::bytea"
        case "oracle"         => s"HEXTORAW('$hx')"
        case _                => s"X'$hx'" // SQL-standard binary literal (derby, generic)
      }
    case bool: Boolean =>
      d.name match {
        case "postgres" => if (bool) "TRUE" else "FALSE"
        case _          => if (bool) "1" else "0" // mysql/tidb/oracle tinyint/number form
      }
    case n: java.math.BigDecimal => n.toPlainString
    case other => other.toString // integral / floating types render bare
  }

  /** Keyed DELETE with literal values —
    * `GenPostgresCompatibleDatabaseDeleteStmtSQL`
    * (`processor_translate_postgres.go:67-90`): NULL renders as `IS NULL`,
    * and the row-count limit caps multiset over-deletion.
    *
    * Deviation (deliberate, like the Oracle MERGE note): the reference
    * appends `LIMIT n` verbatim for every dialect, but PostgreSQL has no
    * DELETE … LIMIT — this renderer emits the executable per-dialect
    * form instead: native LIMIT on mysql/tidb, a ctid subquery on
    * postgres, a ROWNUM conjunct on oracle; dialects with no row-limited
    * DELETE at all (derby, generic) refuse the limit.
    */
  def deleteSql(d: SqlDialect, schema: String, table: String, columns: Seq[String],
      values: Seq[String], limit: Option[Int] = None, hint: String = ""): String = {
    require(columns.length == values.length)
    val tgt = qualified(d, schema, table)
    val conds = columns.zip(values).map {
      case (c, v) if v.equalsIgnoreCase("NULL") => s"${quoteId(d, c)} IS NULL"
      case (c, v)                               => s"${quoteId(d, c)} = $v"
    }.mkString(" AND ")
    val where = limit match {
      case None => conds
      case Some(n) => d.name match {
        case "mysql" | "tidb" => s"$conds LIMIT $n"
        case "postgres" => s"ctid IN (SELECT ctid FROM $tgt WHERE $conds LIMIT $n)"
        case "oracle"   => s"$conds AND ROWNUM <= $n"
        case other => throw new IllegalArgumentException(
          s"$other: no row-limited DELETE form")
      }
    }
    s"${verbWithHint("DELETE", hint)} FROM $tgt WHERE $where;"
  }
}

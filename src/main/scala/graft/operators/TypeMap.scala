package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-driven cross-dialect type-mapping rule book — the complete set
  * of the reference's built-in datatype rules
  * (`model/buildin/buildin_rule_datatype.go`: O2M/O2T 72 entries each,
  * M2O/T2O 30 each, P2M/P2T 35 each = 274), loaded from
  * `resources/typemap_rules.csv` instead of a when-ladder.
  *
  * The NAME map (NUMBER→DECIMAL, text→CLOB, …) is pure data and rides a
  * broadcast join, so a catalog scan over millions of columns maps types
  * in one shuffle-free pass. The PARAMETERIZATION (precision/scale/length
  * placement — `database/mapping/mysql.go:31-327`, `oracle.go:64-160`,
  * `postgresql.go`) is conditional logic and stays a Column expression
  * applied after the name join.
  */
object TypeMap {

  final case class Rule(direction: String, sourceType: String, targetType: String)

  /** All 274 rules, parsed once from the bundled CSV. */
  lazy val rules: Seq[Rule] = {
    val in = getClass.getResourceAsStream("/typemap_rules.csv")
    require(in != null, "typemap_rules.csv missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().drop(1).filter(_.nonEmpty).map { line =>
        // fields are quoted, commas only between quotes: "a","b","c"
        val cols = line.split(",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)", -1)
          .map(_.stripPrefix("\"").stripSuffix("\""))
        Rule(cols(0).stripSuffix("\"").stripPrefix("\""), cols(1), cols(2))
      }.toVector
    } finally src.close()
  }

  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rules.toDF("direction", "source_type", "target_type")
  }

  /** Map a catalog (…, data_type, data_precision, data_scale, data_length)
    * through one direction's rule book: broadcast-join the name map, then
    * parameterize. Unmatched source types keep `target_type` null — the
    * caller decides whether that is an error or a TEXT fallback, mirroring
    * the reference's "rule isn't exist, please checkin" error path.
    */
  def mapCatalog(catalog: DataFrame, direction: String): DataFrame = {
    val spark = catalog.sparkSession
    val r = rulesDf(spark).where(col("direction") === direction)
      .select(col("source_type"), col("target_type").as("__tname"))
    val joined = catalog.join(broadcast(r),
      upper(catalog("data_type")) === r("source_type"), "left_outer")
    joined.withColumn("target_type",
        parameterize(direction, upper(col("data_type")), col("__tname"),
          col("data_precision"), col("data_scale"), col("data_length")))
      .drop("__tname")
  }

  /** Precision/scale/length placement per (direction, source, target) —
    * the `fmt.Sprintf` tier of mapping/{mysql,oracle,postgresql}.go.
    */
  private def parameterize(direction: String, src: Column, tgt: Column,
      p0: Column, s0: Column, l0: Column): Column = {
    val p = coalesce(p0, lit(-1L)).cast("long")
    val s = coalesce(s0, lit(0L)).cast("long")
    val l = coalesce(l0, lit(0L)).cast("long")
    direction match {
      case "O2M" | "O2T" =>
        // NUMBER ladder (oracle.go:64-120): integer tiers for scale 0 with
        // known precision (O2M); O2T sends every NUMBER to DECIMAL for
        // TiDB join-performance parity (O2TNumberDatatypeNameMap comment)
        // scale<=0 folds |scale| into the effective precision
        // (oracle.go:131-134); s>=p and p=38 widen to DECIMAL(65,·) so
        // integer digits aren't lost (oracle.go:75-127)
        val effP = p - s
        val numberMapped =
          if (direction == "O2T")
            when(p === -1L, lit("DECIMAL(65,30)"))
              .when(s > 0L && (s >= p || p === 38L),
                concat(lit("DECIMAL(65,"), least(s, lit(30L)), lit(")")))
              .when(s > 0L, concat(lit("DECIMAL("), least(p, lit(65L)),
                lit(","), least(s, lit(30L)), lit(")")))
              .when(effP <= 38L,
                concat(lit("DECIMAL("), greatest(effP, lit(1L)), lit(",0)")))
              .otherwise(lit("DECIMAL(65,0)"))
          else
            when(p === -1L, lit("DECIMAL(65,30)"))
              .when(s > 0L && (s >= p || p === 38L),
                concat(lit("DECIMAL(65,"), least(s, lit(30L)), lit(")")))
              .when(s > 0L, concat(lit("DECIMAL("), least(p, lit(65L)),
                lit(","), least(s, lit(30L)), lit(")")))
              .when(effP < 3L, lit("TINYINT"))
              .when(effP < 5L, lit("SMALLINT"))
              .when(effP < 9L, lit("INT"))
              .when(effP < 19L, lit("BIGINT"))
              .when(effP <= 38L, concat(lit("DECIMAL("), effP, lit(",0)")))
              .otherwise(lit("DECIMAL(65,0)"))
        when(src === "NUMBER", numberMapped)
          .when(src.isin("DECIMAL", "DEC", "NUMERIC") && p >= 0L,
            concat(tgt, lit("("), least(p, lit(65L)), lit(","),
              least(s, lit(30L)), lit(")")))
          .when(src.isin("CHAR", "CHARACTER", "NCHAR") && l > 255L,
            concat(lit("VARCHAR("), l, lit(")")))
          .when(src.isin("CHAR", "CHARACTER", "NCHAR"), concat(tgt, lit("("), l, lit(")")))
          .when(src.isin("VARCHAR", "VARCHAR2", "NVARCHAR2"),
            concat(tgt, lit("("), l, lit(")")))
          .when(src === "RAW", concat(tgt, lit("("), l, lit(")")))
          .when(src.startsWith("TIMESTAMP") && tgt.isin("TIMESTAMP", "DATETIME"),
            concat(tgt, lit("("), least(coalesce(s0, lit(6L)), lit(6L)), lit(")")))
          .when(src === "FLOAT" && s === 0L, lit("DOUBLE"))
          // oracle.go fixed widths: BFILE(255), ROWID(64), UROWID(len),
          // INTERVAL families render as VARCHAR(30) text
          .when(src === "BFILE", concat(tgt, lit("(255)")))
          .when(src === "ROWID", concat(tgt, lit("(64)")))
          .when(src === "UROWID", concat(tgt, lit("("), l, lit(")")))
          .when(src.startsWith("INTERVAL"), concat(tgt, lit("(30)")))
          .otherwise(tgt)
      case "M2O" | "T2O" =>
        // mysql.go:31-327 — fixed NUMBER(w,0) widths for integer tiers,
        // CHAR semantics for character lengths, RAW(n) for binaries
        when(src === "TINYINT", lit("NUMBER(3,0)"))
          .when(src === "SMALLINT", lit("NUMBER(5,0)"))
          .when(src === "MEDIUMINT", lit("NUMBER(7,0)"))
          .when(src.isin("INT", "INTEGER"), lit("NUMBER(10,0)"))
          .when(src === "BIGINT", lit("NUMBER(19,0)"))
          .when(src.isin("DECIMAL", "NUMERIC") && p >= 0L,
            concat(tgt, lit("("), least(p, lit(38L)), lit(","), s, lit(")")))
          .when(src === "YEAR", lit("NUMBER"))
          .when(src === "TIMESTAMP",
            concat(tgt, lit("("), least(coalesce(s0, lit(6L)), lit(9L)), lit(")")))
          .when(src.isin("CHAR", "VARCHAR", "TINYTEXT"),
            concat(tgt, lit("("), l, lit(" CHAR)")))
          .when(src.isin("BIT", "BINARY"), concat(tgt, lit("("), greatest(p, lit(1L)), lit(")")))
          .when(src === "VARBINARY", concat(tgt, lit("("), l, lit(")")))
          .otherwise(tgt)
      case "P2M" | "P2T" =>
        // postgresql.go — numeric cap (65,30); character ladders by length
        // (CHAR ≤255, VARCHAR ≤16382, MEDIUMTEXT ≤4194303, else LONGTEXT);
        // fixed widths for the VARCHAR-comment defaults
        when(src.isin("NUMERIC", "DECIMAL") && p === -1L, lit("DECIMAL(65,30)"))
          .when(src.isin("NUMERIC", "DECIMAL"),
            concat(lit("DECIMAL("), least(p, lit(65L)), lit(","),
              least(s, lit(30L)), lit(")")))
          .when(src === "MONEY", lit("DECIMAL(19,2)"))
          .when(src.isin("CHARACTER", "BPCHAR") && l <= 0L, lit("LONGTEXT"))
          .when(src.isin("CHARACTER", "BPCHAR") && l <= 255L,
            concat(lit("CHAR("), l, lit(")")))
          .when(src.isin("CHARACTER", "BPCHAR") && l <= 16382L,
            concat(lit("VARCHAR("), l, lit(")")))
          .when(src.isin("CHARACTER", "BPCHAR"), lit("LONGTEXT"))
          .when(src === "CHARACTER VARYING" && l <= 0L, lit("LONGTEXT"))
          .when(src === "CHARACTER VARYING" && l <= 16382L,
            concat(lit("VARCHAR("), l, lit(")")))
          .when(src === "CHARACTER VARYING" && l <= 4194303L, lit("MEDIUMTEXT"))
          .when(src === "CHARACTER VARYING", lit("LONGTEXT"))
          .when(src === "BOOLEAN", lit("TINYINT(1)"))
          .when(src === "BIT", concat(tgt, lit("("), greatest(p, lit(1L)), lit(")")))
          .when(src === "UUID", lit("VARCHAR(36)"))
          .when(src.isin("CIDR", "INET"), lit("VARCHAR(43)"))
          .when(src === "MACADDR", lit("VARCHAR(17)"))
          .when(src === "TXID_SNAPSHOT", lit("VARCHAR(256)"))
          .when(src === "TIMESTAMP WITHOUT TIME ZONE",
            concat(lit("DATETIME("), least(coalesce(s0, lit(6L)), lit(6L)), lit(")")))
          .otherwise(tgt)
      case other =>
        throw new IllegalArgumentException(s"unknown mapping direction: $other")
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic perturbed copy of a source table — the compare-pair
  * fixture of FIXTURES.md §F2, expressible identically in SQL so the
  * DuckDB oracle can rebuild the exact same "target database".
  *
  * Modulo-keyed perturbations (no RNG, no state):
  *  - rows with key % 997 == 0 deleted        → only-in-src (INSERT repair)
  *  - rows with key % 991 == 0 mutated (+1 qty) → checksum mismatch
  *  - rows with key % 983 == 0 duplicated     → multiset count-delta case
  */
object Perturb {

  val CompareCols: Seq[String] = Seq(
    "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
    "l_returnflag", "l_shipdate")

  /** The SQL twin (CTE body) of [[perturbedLineitem]]. */
  val DstSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_orderkey % 991 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
      |  l_extendedprice, l_returnflag, l_shipdate
      |FROM lineitem WHERE l_orderkey % 997 <> 0
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_shipdate
      |FROM lineitem WHERE l_orderkey % 983 = 0""".stripMargin

  def perturbedLineitem(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(CompareCols.map(col): _*)
    val kept = base
      .where(col("l_orderkey") % 997 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 991 === 0, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
    val dupes = base.where(col("l_orderkey") % 983 === 0)
    kept.select(CompareCols.map(col): _*).unionAll(dupes)
  }
}

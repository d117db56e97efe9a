package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively — built per the
  * preference order (compose built-ins first; SURVEY §2.3 notes the
  * reference itself has no joins, so these extend the engine's surface
  * the way DuckDB's ASOF JOIN / range joins do).
  *
  * As-of join — union-and-carry composition: tag both sides, union,
  * sort within each key by (time, side-priority), and carry the last
  * right-side row forward with an ignoreNulls last() window. ONE shuffle
  * (the window's partitionBy), no n² expansion, no broadcast of either
  * side — at 100 TB this is a single repartition-by-key + in-partition
  * sort, the same cost envelope as a sort-merge join.
  *
  * Range join — bucketize time into interval-width buckets and equi-join
  * on (key, bucket) for the candidate buckets, then filter the exact
  * range: turns a non-equi join (which Spark would plan as a nested-loop)
  * into O(n·k) equi-join work.
  */
object TemporalJoins {

  /** Left as-of join: for each left row, the single latest right row of
    * the same key with rightTime ≤ leftTime. Right rows must be unique
    * per (key, time) — pre-dedupe if not. `carryCols` are the right-side
    * columns to carry onto left rows (null when no prior right row).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      carryCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val lTagged = left.select(
      (col(keyCol).as("__k") +: col(timeCol).as("__t") +: lit(0).as("__isR") +:
        lCols.map(c => col(c).as(s"__l_$c")) ++: carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rTagged = right.select(
      (col(keyCol).as("__k") +: col(timeCol).as("__t") +: lit(1).as("__isR") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++: carryCols.map(col)): _*)
    // right rows sort BEFORE left rows at equal time ⇒ "≤" semantics
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(col("__isR") +: lCols.map(c => col(s"__l_$c")) ++:
        carryCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("__isR") === 0)
      .select(lCols.map(c => col(s"__l_$c").as(c)) ++: carryCols.map(col): _*)
  }

  /** Bucketized range join count: for each left row, count right rows of
    * the same key with time in (leftTime − window, leftTime). Times in
    * microseconds (long columns).
    */
  def recentCount(
      events: DataFrame, keyCol: String, usCol: String, idCol: String,
      windowUs: Long): DataFrame = {
    val bucketed = events.select(col(keyCol), col(usCol), col(idCol),
      floor(col(usCol) / windowUs).cast("long").as("__b"))
    // candidates live in the same or previous bucket
    val probes = bucketed.select(col(keyCol), col(usCol), col(idCol), col("__b").as("__pb"))
      .withColumn("__cand", explode(array(col("__pb"), col("__pb") - 1)))
    val joined = probes.as("l").join(bucketed.as("r"),
      col(s"l.$keyCol") === col(s"r.$keyCol") && col("__cand") === col("r.__b") &&
        col(s"r.$usCol") > col(s"l.$usCol") - windowUs && col(s"r.$usCol") < col(s"l.$usCol"),
      "left_outer")
    joined.groupBy(col(s"l.$idCol").as(idCol))
      .agg(count(col(s"r.$idCol")).as("n_recent"))
  }
}

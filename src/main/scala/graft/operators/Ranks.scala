package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scalable replacement for
  * `Window.orderBy(keys)` with no partitionBy, which pulls the WHOLE
  * dataset through one task (the single worst anti-scale pattern; fine at
  * 600k rows, fatal at 100 TB).
  *
  * Shape: range-repartition on the keys (so partition i holds keys all ≤
  * partition i+1's), count rows per partition (parts-sized metadata to
  * the driver), broadcast the cumulative offsets back, and add each row's
  * within-partition row_number. Every step is distributed; the only
  * global object is the parts-length offset array.
  *
  * Result is identical to the global window whenever the key tuple is
  * unique (rank is then independent of partition boundary placement, so
  * range-sampling nondeterminism cannot leak into the output).
  */
object Ranks {

  /** Adds a 1-based dense global rank by `keys` as column `out`.
    *
    * After `sortWithinPartitions`, `monotonically_increasing_id()` is
    * (partitionId << 33) + local row index in that sorted order — the
    * zipWithIndex trick in pure SQL. So the local row number needs NO
    * window (and no second shuffle): one range shuffle, one in-partition
    * sort, then a cached metadata pass for the 32-row offset table.
    */
  def withGlobalRank(df: DataFrame, keys: Seq[String], out: String = "rank",
      parts: Int = 32): DataFrame =
    withGlobalRankAndTotal(df, keys, out, parts)._1

  /** As [[withGlobalRank]], also returning the total row count — free
    * metadata from the per-partition counts, saving callers (e.g. NTILE)
    * a separate full-scan count().
    */
  def withGlobalRankAndTotal(df: DataFrame, keys: Seq[String], out: String = "rank",
      parts: Int = 32): (DataFrame, Long) = {
    val keyCols = keys.map(col)
    val staged = df
      .repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", monotonically_increasing_id() % (1L << 33))
      .cache() // both passes must see one partition/row assignment
    val counts = staged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)(_ + counts(_))).toMap
    val offsetExpr = pids.foldRight(lit(0L): Column) { (p, acc) =>
      when(col("__pid") === p, lit(offsets(p))).otherwise(acc)
    }
    val ranked = staged
      .withColumn(out, (offsetExpr + col("__lrn") + 1L).cast("long"))
      .drop("__pid", "__lrn")
      // materialize under the cached partition assignment, then release
      // the intermediate cache — it would otherwise pin executor memory
      // for the rest of the session
      .localCheckpoint(true)
    staged.unpersist(false)
    (ranked, counts.values.sum)
  }

  /** Distributed running (cumulative) sum of `value` in global `keys`
    * order — the prefix-sum twin of [[withGlobalRank]]. Same shape:
    * range-repartition on the keys, per-partition sums to the driver
    * (parts-sized metadata), broadcast cumulative offsets back, and an
    * in-partition window adds the local prefix. The window partitions by
    * the physical partition id, so no task sees more than one partition's
    * rows — never the single-task global window. Exact when the key tuple
    * is unique (same caveat as withGlobalRank).
    */
  def withRunningTotal(df: DataFrame, keys: Seq[String], value: Column,
      out: String = "running", parts: Int = 32): DataFrame =
    withRunningTotalAndTotal(df, keys, value, out, parts)._1

  /** As [[withRunningTotal]], also returning the grand total of `value` —
    * free metadata from the per-partition sums, saving callers (e.g. the
    * collated chunk divider) a separate full aggregation.
    */
  def withRunningTotalAndTotal(df: DataFrame, keys: Seq[String], value: Column,
      out: String = "running", parts: Int = 32): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val staged = df
      .withColumn("__v", value.cast("long"))
      .repartitionByRange(parts, keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache() // both passes must see one partition assignment
    // coalesce: a range partition whose every value casts to NULL would
    // otherwise sum to NULL and NPE on getLong
    val sums = staged.groupBy("__pid")
      .agg(coalesce(sum(col("__v")), lit(0L)).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = sums.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)(_ + sums(_))).toMap
    val offsetExpr = pids.foldRight(lit(0L): Column) { (p, acc) =>
      when(col("__pid") === p, lit(offsets(p))).otherwise(acc)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(keyCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val result = staged
      .withColumn(out, offsetExpr + sum(col("__v")).over(w))
      .drop("__v", "__pid")
      .localCheckpoint(true) // see withGlobalRankAndTotal: release the cache
    staged.unpersist(false)
    (result, sums.values.sum)
  }

  /** Distributed EXCLUSIVE prefix minimum of `value` in global `keys`
    * order (each row sees the min over all strictly-preceding rows;
    * Long.MaxValue when none) — the prefix-min sibling of
    * [[withRunningTotal]], and the engine's skyline/dominance primitive.
    * Same shape: range repartition, per-partition mins to the driver
    * (parts-sized metadata), broadcast exclusive prefixes back, and an
    * in-partition window with a `(unbounded preceding, 1 preceding)`
    * frame — no task ever sees more than one partition.
    */
  def withPrefixMin(df: DataFrame, keys: Seq[String], value: Column,
      out: String = "prefix_min", parts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val staged = df
      .withColumn("__v", value.cast("long"))
      .repartitionByRange(parts, keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache() // both passes must see one partition assignment
    val mins = staged.groupBy("__pid")
      .agg(coalesce(min(col("__v")), lit(Long.MaxValue)).as("m")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = mins.keys.toSeq.sorted
    // exclusive: partition p sees the min over partitions strictly before it
    val prefixes = pids.zip(pids.scanLeft(Long.MaxValue)((acc, p) => math.min(acc, mins(p)))).toMap
    val prefixExpr = pids.foldRight(lit(Long.MaxValue): Column) { (p, acc) =>
      when(col("__pid") === p, lit(prefixes(p))).otherwise(acc)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(keyCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val result = staged
      .withColumn(out,
        least(coalesce(min(col("__v")).over(w), lit(Long.MaxValue)), prefixExpr))
      .drop("__v", "__pid")
      .localCheckpoint(true) // see withGlobalRankAndTotal: release the cache
    staged.unpersist(false)
    result
  }

  /** Exact NTILE(k) bucket (1-based) from a 1-based global rank over n
    * rows: the first n%k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋ —
    * matching SQL NTILE.
    */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    val q = n / k
    val r = n % k
    if (q == 0) return rank.cast("long") // fewer rows than buckets: one row each
    val cut = r * (q + 1) // rows covered by the big buckets
    when(rank <= cut, ((rank - 1) / (q + 1)).cast("long") + 1)
      .otherwise(lit(r) + ((rank - 1 - cut) / q).cast("long") + 1)
  }
}

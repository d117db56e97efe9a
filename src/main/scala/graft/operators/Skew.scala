package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation (SURVEY O3/O8 scale notes): AQE's skew-join
  * split handles sort-merge joins at runtime, but a heavily-skewed
  * aggregation key still funnels one reducer. Salted two-phase
  * aggregation spreads a hot key over `salts` partial groups, then
  * combines — the classic pattern for power-law keys (user activity,
  * hot documents) at 100 TB.
  */
object Skew {

  /** Two-phase salted aggregation: count + long-sum per key.
    * Phase 1 groups on (key, salt) — hot keys split `salts` ways map-side;
    * phase 2 combines the partials. Result is identical to a direct
    * groupBy (addition is associative), but no single reducer owns a hot
    * key's full row stream.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("sum_v"))

  /** Salted equi-join for skewed probe keys: every build-side row is
    * replicated `salts` ways (explode of a constant sequence — map-side,
    * no shuffle of its own), every probe row picks a deterministic salt
    * from row identity, and the join key becomes (key, salt). A hot probe
    * key's rows then hash to `salts` distinct reducers instead of one.
    * Cost: build side grows ×`salts` — use when the build side is modest
    * but above the broadcast threshold, the probe side is skewed, and
    * AQE's sort-merge skew split doesn't apply (e.g. forced shuffled-hash
    * plans or pre-partitioned layouts it must preserve).
    *
    * Result columns = probe columns ++ build columns (minus the join key
    * duplicate), exactly like `fact.join(dim, factKey === dimKey)`.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey)
          && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt").drop(dimKey)
  }
}

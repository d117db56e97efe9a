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
}

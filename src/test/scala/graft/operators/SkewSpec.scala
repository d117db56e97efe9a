package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct groupBy on a skewed keyset") {
    import spark.implicits._
    // power-law fixture: one key owns 90% of rows
    val rows = (1 to 20000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedSum(df, col("k"), col("v"), salts = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }
}

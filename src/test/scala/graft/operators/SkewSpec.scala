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

  test("salted join equals plain equi-join on a skewed probe side") {
    import spark.implicits._
    // 90% of probe rows share one key; build side is 50 keys
    val fact = (1 to 20000).map(i => (if (i % 10 == 0) (i % 50).toLong else 7L, i.toLong))
      .toDF("fk", "v").repartition(8)
    val dim = (0 until 50).map(k => (k.toLong, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk")).drop("dk")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedJoin(fact, dim, "fk", "dk", salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
    // every (key, salt) build replica exists exactly once
    val replicas = Skew.saltedJoin(fact.limit(0), dim, "fk", "dk", salts = 8)
    assert(replicas.count() == 0L) // empty probe ⇒ inner join yields nothing
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** BloomPrune contract: (1) the pruned join is exactly the plain join;
  * (2) the sketch actually reduces the fact side (no false negatives is
  * the sketch's own guarantee; the reduction is ours to verify).
  */
class BloomPruneSpec extends SparkSpec {

  test("prunedEquiJoin equals the plain join and shrinks the fact side") {
    val t = Tables(spark, sfDir)
    val dim = t.orders.where(col("o_orderpriority") === "1-URGENT")

    val plain = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(col("l_orderkey")), sum(col("o_custkey")))
      .head()
    val pruned = BloomPrune.prunedEquiJoin(
        t.lineitem, col("l_orderkey"), dim, col("o_orderkey"))
      .agg(count(lit(1)), sum(col("l_orderkey")), sum(col("o_custkey")))
      .head()
    assert(pruned == plain)

    val factRows = t.lineitem.count()
    val matchRows = t.lineitem.join(
      dim.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val kept = BloomPrune.mightMatch(
      t.lineitem, col("l_orderkey"), dim, col("o_orderkey"), fpp = 0.01).count()
    // every true match survives; false positives stay within ~3x fpp slack
    assert(kept >= matchRows)
    assert(kept <= matchRows + (factRows * 0.03).toLong + 10)
  }

  test("null fact keys never match") {
    val s = spark
    import s.implicits._
    val fact = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val kept = BloomPrune.mightMatch(fact, col("fk"), dim, col("dk"))
      .collect().map(_.getAs[Any]("fk")).toSet
    assert(!kept.contains(null))
    assert(Set[Any](1L, 2L).subsetOf(kept))
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the HLL++ approximation quality that q60_approx_ndv relies on:
  * at rsd=0.02 the estimate must land within 5% of the exact NDV on a
  * high-cardinality key (l_partkey) and be exact on small groups.
  */
class ApproxNdvSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on l_partkey") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val row = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("a"),
      countDistinct(col("l_partkey")).as("e")).head()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }

  test("exact on low-cardinality groups") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = docs.groupBy("source")
      .agg(approx_count_distinct(col("doc_id"), 0.02).as("a"),
        countDistinct(col("doc_id")).as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: approx=$a exact=$e")
    }
  }
}

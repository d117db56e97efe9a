package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Perturb

/** The fused single-pass Aggregator must agree with the two-plan
  * built-ins (crc32WrapSum + rowMultiset) chunk by chunk.
  */
class ProgramCrc32AggregatorSpec extends SparkSpec {

  test("fused (crc32, multiset) pass matches the built-in two-plan result") {
    val s = spark
    import s.implicits._
    val li  = Tables(s, sfDir).lineitem
    val row = graft.functions.Canonical.rowString(
      li.select(Perturb.CompareCols.map(col): _*), Perturb.CompareCols)
    val keyed = li.select(
      floor(col("l_orderkey") / 1024).cast("long").as("chunk_id"), row.as("row_str"))

    val fused = keyed.as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(ProgramCrc32Aggregator.aggregator.toColumn)
      .collect().toMap

    val crcs = keyed.groupBy("chunk_id")
      .agg(Checksums.crc32WrapSum(col("row_str")).as("crc"), count(lit(1)).as("n"),
        countDistinct(col("row_str")).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(fused.keySet == crcs.keySet)
    fused.foreach { case (chunk, pc) =>
      val (crc, n, nd) = crcs(chunk)
      assert(pc.crc32 == crc, s"chunk $chunk crc mismatch")
      assert(pc.totalRows == n && pc.distinctRows == nd, s"chunk $chunk multiset mismatch")
    }
  }
}

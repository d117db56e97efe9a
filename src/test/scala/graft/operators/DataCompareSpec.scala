package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Mirrors the reference's only real unit suite — the `Cmp` multiset-diff
  * table (`database/processor/compare_row_cmp_test.go:26-76`): empty /
  * identical / one-sided / partial / disjoint / count-delta cases.
  */
class DataCompareSpec extends SparkSpec {
  import DataCompare._

  private def diffSets(src: Seq[(Int, String)], dst: Seq[(Int, String)]) = {
    import spark.implicits._
    val d = rowDiff(src.toDF("k", "v"), dst.toDF("k", "v"), Seq("k", "v"))
      .collect().map(r => (r.getString(2), r.getInt(0), r.getString(1)))
    (d.filter(_._1 == "ADD").map(t => (t._2, t._3)).toSeq.sorted,
      d.filter(_._1 == "DEL").map(t => (t._2, t._3)).toSeq.sorted)
  }

  test("Cmp cases: identical, one-sided, partial, disjoint, count-delta") {
    assert(diffSets(Nil, Nil) == (Nil, Nil))
    assert(diffSets(Seq(1 -> "a"), Seq(1 -> "a")) == (Nil, Nil))
    assert(diffSets(Seq(1 -> "a"), Nil) == (Seq(1 -> "a"), Nil))
    assert(diffSets(Nil, Seq(1 -> "a")) == (Nil, Seq(1 -> "a")))
    assert(diffSets(Seq(1 -> "a", 2 -> "b"), Seq(2 -> "b", 3 -> "c"))
      == (Seq(1 -> "a"), Seq(3 -> "c")))
    assert(diffSets(Seq(1 -> "a"), Seq(2 -> "b")) == (Seq(1 -> "a"), Seq(2 -> "b")))
    // rows equal but counts differ: src has 3×, dst has 1× ⇒ 2 to ADD
    assert(diffSets(Seq(1 -> "a", 1 -> "a", 1 -> "a"), Seq(1 -> "a"))
      == (Seq(1 -> "a", 1 -> "a"), Nil))
    // and the reverse ⇒ DEL with count delta
    assert(diffSets(Seq(1 -> "a"), Seq(1 -> "a", 1 -> "a"))
      == (Nil, Seq(1 -> "a")))
  }

  test("rowDiff treats NULLs as equal, like groupBy and exceptAll") {
    import spark.implicits._
    // identical multisets containing NULLs in key and value columns: the
    // join must be null-safe (<=>) or these surface as spurious ADD+DEL
    val withNulls = Seq(
      (Some(1), Some("a")), (None, Some("b")), (Some(3), None), (None, None))
    val df1 = withNulls.toDF("k", "v")
    val df2 = withNulls.reverse.toDF("k", "v")
    assert(rowDiff(df1, df2, Seq("k", "v")).count() == 0,
      "identical null-bearing multisets must diff to empty")
    // a genuine one-sided null row still reports, with its nulls intact
    val df3 = (withNulls :+ ((None: Option[Int], Some("extra")))).toDF("k", "v")
    val d = rowDiff(df3, df1, Seq("k", "v")).collect()
    assert(d.length == 1 && d.head.getString(2) == "ADD" &&
      d.head.isNullAt(0) && d.head.getString(1) == "extra")
    // parity with exceptAll on a null-bearing asymmetric case
    val ea = df3.exceptAll(df1).collect().map(r => (r.isNullAt(0), Option(r.getString(1))))
    assert(ea.toSeq == Seq((true, Some("extra"))))
  }

  test("compare pipeline end-to-end on perturbed lineitem") {
    val li  = Tables(spark, sfDir).lineitem
    val src = li.select(Perturb.CompareCols.map(col): _*)
    val dst = Perturb.perturbedLineitem(li)
    val cid = floor(col("l_orderkey") / 1024).cast("long")
    val status = compareChunks(src, dst, cid, Perturb.CompareCols).cache()
    // perturbations exist ⇒ at least one non-EQUAL chunk, and the rollup says so
    assert(status.where(col("status") =!= "EQUAL").count() > 0)
    val summary = tableSummary(status).head()
    assert(summary.getAs[String]("table_status") == "NOT_EQUAL")
    // restricted rescan equals unrestricted diff
    val mismatched = status.where(col("status") =!= "EQUAL")
    val restricted = rowDiff(src, dst, Perturb.CompareCols, Some(cid), Some(mismatched))
    val full       = rowDiff(src, dst, Perturb.CompareCols)
    assert(restricted.exceptAll(full).isEmpty && full.exceptAll(restricted).isEmpty)
    // repair statements: one per diff row, INSERT for ADD / DELETE for DEL
    val repair = repairSql(full, "lineitem", Perturb.CompareCols).collect()
    assert(repair.length == full.count())
    assert(repair.forall(r =>
      (r.getString(0) == "ADD" && r.getString(1).startsWith("INSERT INTO lineitem")) ||
        (r.getString(0) == "DEL" && r.getString(1).startsWith("DELETE FROM lineitem WHERE"))))
  }
}

package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property: the tagged-union rowDiff is multiset-identical to
  * (src EXCEPT ALL dst) ∪ (dst EXCEPT ALL src) on arbitrary inputs with
  * duplicates AND nulls — the Cmp sv−dv contract
  * (`database/processor/data_compare_row.go:2131-2163`), including the
  * rows-equal-but-counts-differ and null-bearing-row cases the advisor
  * flagged in round 1.
  */
class RowDiffPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, true), StructField("s", StringType, true)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private val genRow: Gen[(Option[Long], Option[String])] = for {
    k <- Gen.option(Gen.chooseNum(0L, 5L))
    s <- Gen.option(Gen.oneOf("a", "b", ""))
  } yield (k, s)

  test("property: rowDiff ≡ exceptAll both ways on dup/null-laden multisets") {
    val genCase = for {
      src <- Gen.listOfN(30, genRow)
      dst <- Gen.listOfN(30, genRow)
    } yield (src, dst)
    samples(genCase, 12).foreach { case (srcRows, dstRows) =>
      def df(rows: Seq[(Option[Long], Option[String])]) =
        spark.createDataFrame(
          java.util.Arrays.asList(rows.map(r => Row(r._1.orNull, r._2.orNull)): _*),
          schema)
      val src = df(srcRows)
      val dst = df(dstRows)

      val diff = DataCompare.rowDiff(src, dst, Seq("k", "s"))
      val adds = diff.where(col("side") === "ADD").select("k", "s")
      val dels = diff.where(col("side") === "DEL").select("k", "s")
      val refAdds = src.exceptAll(dst)
      val refDels = dst.exceptAll(src)

      assert(adds.exceptAll(refAdds).isEmpty && refAdds.exceptAll(adds).isEmpty,
        s"ADD side diverged from src EXCEPT ALL dst")
      assert(dels.exceptAll(refDels).isEmpty && refDels.exceptAll(dels).isEmpty,
        s"DEL side diverged from dst EXCEPT ALL src")
    }
  }
}

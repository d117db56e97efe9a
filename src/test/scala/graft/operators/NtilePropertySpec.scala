package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ranks.ntileFromRank must equal SQL NTILE for arbitrary (n, k) —
  * especially at remainder boundaries where the big/small bucket split
  * changes. Seeded random sweep plus hand-picked boundary cases.
  */
class NtilePropertySpec extends SparkSpec {

  test("ntileFromRank matches window ntile across (n, k) cases") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq((1, 1), (1, 32), (31, 32), (32, 32), (33, 32), (64, 32),
      (65, 32), (400, 7), (97, 96)) ++
      Seq.fill(10)((rnd.nextInt(400) + 1, rnd.nextInt(64) + 1))
    cases.foreach { case (n, k) =>
      val ranks = (1L to n.toLong).toDF("rank")
      val got = ranks
        .select(col("rank"), Ranks.ntileFromRank(col("rank"), n.toLong, k).as("t"))
      val want = ranks
        .select(col("rank"), ntile(k).over(Window.orderBy("rank")).cast("long").as("t"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"ntile mismatch for n=$n k=$k")
    }
  }
}

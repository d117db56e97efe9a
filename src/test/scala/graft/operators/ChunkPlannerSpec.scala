package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** FIXTURES.md §F3: chunk predicates partition the table — pairwise
  * disjoint and covering (every row lands in exactly one chunk).
  */
class ChunkPlannerSpec extends SparkSpec {

  test("plan chunks partition lineitem exactly once") {
    val li = Tables(spark, sfDir).lineitem
    val chunks = ChunkPlanner.plan(li, "l_orderkey", 8)
    assert(chunks.size > 1)
    val total = li.count()
    // covering: each row matches exactly one predicate
    val matchCount = chunks.map(c => li.where(c.predicate(col("l_orderkey"))).count()).sum
    assert(matchCount == total, "chunks must cover every row exactly once")
    // chunkIdColumn agrees with the predicates
    val byId = li.groupBy(ChunkPlanner.chunkIdColumn(col("l_orderkey"), chunks).as("cid"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    chunks.foreach { c =>
      val predCnt = li.where(c.predicate(col("l_orderkey"))).count()
      assert(byId.getOrElse(c.id, 0L) == predCnt, s"chunk ${c.id} id-column mismatch")
    }
  }

  test("degenerate stats fall back to a single whole-table chunk") {
    val one = Tables(spark, sfDir).orders.where(col("o_orderkey") === 1)
    val chunks = ChunkPlanner.plan(one, "o_orderkey", 8)
    // all quantiles collapse to one bound or none → at most 2 chunks, and
    // together they still cover everything
    assert(chunks.nonEmpty)
    assert(chunks.map(c => one.where(c.predicate(col("o_orderkey"))).count()).sum == one.count())
  }

  test("chooseSplitKey picks the highest-NDV column") {
    val li = Tables(spark, sfDir).lineitem
    assert(ChunkPlanner.chooseSplitKey(li, Seq("l_returnflag", "l_orderkey")) == "l_orderkey")
  }

  test("lexicographic range semantics (chunk.go:98-190)") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 1)).toDF("a", "b")
    val keys = Seq(col("a"), col("b"))
    // (1,2) <= k < (2,2) → (1,2),(2,1)
    val got = df.where(ChunkPlanner.lexRange(keys, Seq(lit(1), lit(2)), Seq(lit(2), lit(2))))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 2), (2, 1)))
    // all-bounds-equal ⇒ empty range (1=0 case)
    assert(df.where(ChunkPlanner.lexRange(keys, Seq(lit(2), lit(1)), Seq(lit(2), lit(1)))).count() == 0)
  }

  test("collated chunks never split case variants and partition all rows (chunk.go:80-96)") {
    import spark.implicits._
    // 26 case-insensitive keys × 3 case variants, skewed counts
    val rows = for {
      i <- 0 until 26
      v <- 0 until 3
      _ <- 0 to (i % 5)
    } yield (v match {
      case 0 => s"key_${('a' + i).toChar}"
      case 1 => s"KEY_${('A' + i).toChar}"
      case _ => s"Key_${('a' + i).toChar}"
    })
    val df = rows.toDF("k")
    val plan = ChunkPlanner.collatedPlan(df, "k", nChunks = 4).collect()
    // covering: chunk row counts sum to the table
    assert(plan.map(_.getAs[Long]("n_rows")).sum == rows.size)
    // collation guarantee: distinct collated keys across chunks sum to the
    // global collated NDV — no case-variant group straddles a boundary
    assert(plan.map(_.getAs[Long]("n_keys")).sum == 26)
    // bounds are disjoint and ordered: chunk i's upper < chunk i+1's lower
    val sorted = plan.sortBy(_.getAs[Int]("chunk_id"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("upper_bound") < b.getAs[String]("lower_bound"))
      case _ =>
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** FIXTURES.md §F3 property: generated key columns ⇒ chunk predicates are
  * pairwise disjoint and their union covers the table exactly once; plus
  * the §7.3.3 commutativity property of the wrapping CRC32 sum.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest bridge
  * artifact is not in the offline cache.)
  */
class ChunkPlannerPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: chunks partition arbitrary int keysets exactly once") {
    val genCase = for {
      keys <- Gen.nonEmptyListOf(Gen.chooseNum(-100000, 100000))
      n    <- Gen.chooseNum(1, 12)
    } yield (keys, n)
    samples(genCase, 15).foreach { case (keys, n) =>
      import spark.implicits._
      val df = keys.toDF("k").cache()
      val chunks = ChunkPlanner.plan(df, "k", n)
      val counts = chunks.map(c => df.where(c.predicate(col("k"))).count())
      assert(counts.sum == keys.size,
        s"union must cover every row once (got ${counts.sum}/${keys.size}, n=$n)")
      // disjointness: the chunk-id column assigns each row to exactly one
      // chunk, and that assignment agrees with the predicates
      val ids = df.select(ChunkPlanner.chunkIdColumn(col("k"), chunks).as("cid"))
        .groupBy("cid").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      chunks.foreach { c =>
        assert(ids.getOrElse(c.id, 0L) == df.where(c.predicate(col("k"))).count())
      }
      df.unpersist()
    }
  }

  test("property: crc32 wrap-sum is row-order independent (§7.3.3)") {
    val genRows = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    samples(genRows, 10).foreach { rows =>
      import spark.implicits._
      val fwd = rows.toDF("s").agg(graft.functions.Checksums.crc32WrapSum(col("s"))).head().getLong(0)
      val rev = new scala.util.Random(7).shuffle(rows).toDF("s")
        .agg(graft.functions.Checksums.crc32WrapSum(col("s"))).head().getLong(0)
      assert(fwd == rev)
      assert(fwd >= 0 && fwd < (1L << 32))
    }
  }

  test("property: collated chunks cover rows, preserve collated NDV, keep bounds disjoint") {
    val genCase = for {
      base   <- Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8)))
      reps   <- Gen.chooseNum(1, 4)
      n      <- Gen.chooseNum(2, 9)
    } yield (base, reps, n)
    samples(genCase, 10).foreach { case (base, reps, n) =>
      import spark.implicits._
      // spell each base key in several case variants, repeated
      val rows = for {
        k <- base; r <- 0 until reps
        v <- Seq(k, k.toUpperCase, k.capitalize)
      } yield v + "_" + (r % 2)
      val df = rows.toDF("k")
      val plan = ChunkPlanner.collatedPlan(df, "k", n).collect()
      val ndv = rows.map(_.toLowerCase).distinct.size
      assert(plan.map(_.getAs[Long]("n_rows")).sum == rows.size,
        s"rows covered (n=$n, base=${base.size})")
      assert(plan.map(_.getAs[Long]("n_keys")).sum == ndv,
        s"collated NDV preserved — no case-variant group split (n=$n)")
      val sorted = plan.sortBy(_.getAs[Int]("chunk_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("upper_bound") < b.getAs[String]("lower_bound"))
        case _ =>
      }
    }
  }

  test("property: distributed divider (ndvGuard=0) matches the exact window path") {
    val genCase = for {
      base <- Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8)))
      reps <- Gen.chooseNum(1, 4)
      n    <- Gen.chooseNum(2, 9)
    } yield (base, reps, n)
    samples(genCase, 8).foreach { case (base, reps, n) =>
      import spark.implicits._
      val rows = for {
        k <- base; r <- 0 until reps
        v <- Seq(k, k.toUpperCase, k.capitalize)
      } yield v + "_" + (r % 2)
      val df = rows.toDF("k")
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Int]("chunk_id"), r.getAs[String]("lower_bound"),
          r.getAs[String]("upper_bound"), r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"))
      val exact = ChunkPlanner.collatedPlan(df, "k", n).collect().map(key).sortBy(_._1)
      val dist  = ChunkPlanner.collatedPlan(df, "k", n, ndvGuard = 0L).collect().map(key).sortBy(_._1)
      assert(exact.toSeq == dist.toSeq, s"path divergence (n=$n, base=${base.size})")
    }
  }

  test("distributed divider plans no unpartitioned window") {
    import spark.implicits._
    val df = (0 until 5000).map(i => f"Key_$i%05d").toDF("k")
    val plan = ChunkPlanner.collatedPlan(df, "k", 8, ndvGuard = 0L)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val global = plan.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "collated divider above the NDV guard must never " +
      s"plan a single-partition window; found: ${global.mkString(";")}")
    // and it still partitions the rows exactly once
    assert(plan.collect().map(_.getAs[Long]("n_rows")).sum == 5000L)
  }
}

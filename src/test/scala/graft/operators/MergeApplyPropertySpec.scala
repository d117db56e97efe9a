package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Migrate.mergeApply against a reference Map model: for any target and
  * any keyed op batch (matched/unmatched × U/D/I), the join-based MERGE
  * equals the row-at-a-time decision table.
  */
class MergeApplyPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  test("property: mergeApply equals the Map-model semantics on random batches") {
    val genCase = for {
      target <- Gen.mapOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 999L)))
      ops0 <- Gen.listOf(Gen.zip(
        Gen.choose(0L, 40L), // keys beyond the target range ⇒ unmatched
        Gen.oneOf("U", "D", "I"),
        Gen.choose(1000L, 1999L)))
    } yield (target, ops0.groupBy(_._1).map(_._2.head).toSeq) // one op per key

    samples(genCase, 15).foreach { case (target0, ops) =>
      val s = spark
      import s.implicits._
      // toDF on empty Seq of tuples still carries the schema via implicits
      val target = target0.toSeq.toDF("k", "v")
      val source = ops.toDF("k", "op", "v")

      val got = Migrate.mergeApply(target, source, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val expect = ops.foldLeft(target0) { case (acc, (k, op, v)) =>
        (op, acc.contains(k)) match {
          case ("D", true)  => acc - k        // matched delete
          case ("D", false) => acc            // unmatched delete: no-op
          case (_, _)       => acc + (k -> v) // matched update / insert
        }
      }
      assert(got == expect, s"target=$target0 ops=$ops")
    }
  }

  test("property: changeCapture fed to mergeApply reconstructs the new snapshot") {
    val genPair = for {
      oldM <- Gen.mapOf(Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 99L)))
      newM <- Gen.mapOf(Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 99L)))
    } yield (oldM, newM)

    samples(genPair, 15).foreach { case (oldM, newM) =>
      val s = spark
      import s.implicits._
      val oldDf = oldM.toSeq.toDF("k", "v")
      val newDf = newM.toSeq.toDF("k", "v")
      val events = Migrate.changeCapture(oldDf, newDf, Seq("k"))
      val applied = Migrate.mergeApply(oldDf, events, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(applied == newM, s"old=$oldM new=$newM events=${events.collect().toSeq}")
    }
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** O9 checkpoint/resume: a failed run's state restricts the re-run to
  * non-EQUAL chunks, and repairing the target flips the table verdict.
  */
class CompareRunnerSpec extends SparkSpec {

  test("resume re-verifies only failed chunks and converges after repair") {
    val dir = Files.createTempDirectory("graft_runner").toString
    val li  = Tables(spark, sfDir).lineitem
    val src = li.select(Perturb.CompareCols.map(col): _*)
    val dst = Perturb.perturbedLineitem(li)
    val cid = floor(col("l_orderkey") / 1024).cast("long")
    val runner = new CompareRunner(spark, dir, Perturb.CompareCols, cid)

    // first run: perturbed target ⇒ some chunks fail, state persisted
    val first = runner.run(src, dst)
    val failedIds = first.where(col("status") =!= "EQUAL")
      .select("chunk_id").collect().map(_.getLong(0)).toSet
    assert(failedIds.nonEmpty)
    assert(runner.summary().get.head().getAs[String]("table_status") == "NOT_EQUAL")

    // resume against the same broken target: verdicts unchanged
    val again = runner.resume(src, dst)
    val againFailed = again.where(col("status") =!= "EQUAL")
      .select("chunk_id").collect().map(_.getLong(0)).toSet
    assert(againFailed == failedIds)

    // "repair" the target (use src itself) and resume: only the failed
    // chunks re-verify, everything converges to EQUAL
    val repaired = runner.resume(src, src)
    assert(repaired.where(col("status") =!= "EQUAL").count() == 0)
    assert(runner.summary().get.head().getAs[String]("table_status") == "EQUAL")
    // chunk set is stable across runs (no chunks lost in the merge)
    assert(repaired.count() == first.count())
  }
}

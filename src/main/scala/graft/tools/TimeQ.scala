package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Graft
import graft.SparkEntry

/** Time named queries under the Bench contract (local[32], warm session,
  * cold per-query caches): `runMain graft.tools.TimeQ q491_winnowing ...`
  * with SPARK_GRAFT_SF_DIR (default sf0.1). Prints one `name reps…` line
  * per query so run-to-run ambient variance is visible (compare minima).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.configure(spark)
    val t = graft.core.Tables(spark, sfDir)
    Seq(t.lineitem, t.documents, t.embeddings).foreach(_.count())
    // SPARK_GRAFT_NOOP=1: time the noop sink (guide §1.4 — every column of
    // every row computes) instead of the bench's count() action
    val noop = sys.env.get("SPARK_GRAFT_NOOP").exists(_ == "1")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        if (noop) fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        else fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"$name: ${times.map(v => f"$v%.2f").mkString(" ")} (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** One-off audit: which registry queries plan an unpartitioned Window?
  * Prints `name n_globalwindows` per offender and total elapsed — used to
  * freeze the PlanShapeSpec allowlist (bounded-by-construction windows).
  */
object WindowSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Graft.configure(spark)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) println(s"GLOBALWIN $name $n")
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    println(f"ELAPSED ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}

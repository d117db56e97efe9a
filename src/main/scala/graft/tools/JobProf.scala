package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.core.{Graft, Tables}

/** Per-JOB wall-clock breakdown of a registry query (dev tool, guide §1):
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProf q605_incremental_pipeline"`.
  *
  * Runs each named query once warm (not printed), then once measured,
  * printing every Spark job the run triggered — id, duration, and the
  * callsite — plus the gap between jobs (driver-side planning/analysis
  * time, which job metrics alone hide). Heavy compositions at sf0.1 are
  * dominated by sequential-job fixed costs; this shows exactly where.
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.configure(spark)
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.documents, t.embeddings).foreach(_.count())

    final case class J(id: Int, start: Long, var end: Long = -1L, site: String = "")
    val jobs = ArrayBuffer.empty[(Int, Long, Long, String)]
    val open = scala.collection.mutable.Map.empty[Int, (Long, String)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        open(js.jobId) = (js.time, site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        open.remove(je.jobId).foreach { case (t0, site) =>
          jobs += ((je.jobId, t0, je.time, site))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm rep: JIT + codegen + footers, mirrors Bench.measure's min-of-reps
      fn(spark, sfDir).count()
      spark.sharedState.cacheManager.clearCache()
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sharedState.cacheManager.clearCache()
      println(f"%n==== $name total=$total%.2fs jobs=${jobs.size} ====")
      val sorted = jobs.sortBy(_._2).toVector
      var prevEnd = -1L
      sorted.foreach { case (id, s, e, site) =>
        val gap = if (prevEnd < 0) 0.0 else (s - prevEnd) / 1e3
        prevEnd = e
        println(f"job $id%4d ${(e - s) / 1e3}%7.2fs gap=$gap%6.2fs  $site")
      }
      val jobSum = sorted.map(j => j._3 - j._2).sum / 1e3
      println(f"job-time sum=$jobSum%.2fs, driver gaps=${total - jobSum}%.2fs")
    }
    spark.stop()
  }
}

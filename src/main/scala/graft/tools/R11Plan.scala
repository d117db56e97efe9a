package graft.tools

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry
import graft.core.Graft

/** Dump the FINAL (post-AQE) formatted plan of registry queries — the
  * pre-execution explain hides runtime exchange reuse, so duplication
  * claims need the executed plan (dev tool, r11). Runs the full query
  * via collect() (all columns computed — the noop-twin regime).
  */
object R11Plan {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_NOBROADCAST=1: probe the at-scale join regime (sort-merge
    // over exchanges) — exchange-reuse behaves differently there
    if (sys.env.get("SPARK_GRAFT_NOBROADCAST").contains("1"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      println(s"\n================ $n (final adaptive plan) ================")
      println(df.queryExecution.explainString(FormattedMode))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import graft.core.Graft

/** Dump formatted physical plans for selected queries (dev tool):
  * `sbt "runMain graft.tools.Explain q1_agg q2_join_agg"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

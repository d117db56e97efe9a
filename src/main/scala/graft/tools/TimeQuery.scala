package graft.tools

import org.apache.spark.sql.functions.col

import graft.SparkEntry
import graft.core.{Graft, Tables}

/** Time one or more registry queries in isolation (min over N runs — the
  * host shows ~2x run-to-run variance, so compare minima, not means).
  *
  *   sbt "runMain graft.tools.TimeQuery q385_spearman [q26_minhash_pairs …]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_ITERS (default 3).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = Graft.local(32)
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT + parquet footers
    val t = Tables(spark, dir)
    Seq(t.lineitem, t.orders, t.customer, t.events, t.documents).foreach(_.count())
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%6.2fs  runs=${times.map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Graft, Tables}
import graft.operators.Dedup

/** Phase-level wall-clock breakdown of the q604/q605/q609 composition
  * family (dev tool, guide §1): times each stage of the incremental
  * dedup pipeline separately so the job-count hot spots are attributable.
  */
object PhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.configure(spark)
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.documents, t.embeddings).foreach(_.count())

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"---- rep $rep ----")
      val base = t.documents
      val index = base.select("doc_id", "text")
      val shard = base.where(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 21)").as("text"))
      val union = index.unionAll(shard)
      val idxSig = time("idxSig cache+count") {
        val s = Dedup.minhashSignatures(index, "doc_id", "text").cache()
        s.count(); s
      }
      val cand0 = time("minhashCandidates(index)") {
        Dedup.minhashCandidates(idxSig)
      }
      val labels = time("connectedComponents") {
        Dedup.connectedComponents(cand0)
      }
      val shardSig = time("shard signatures") {
        Dedup.minhashSignatures(shard, "doc_id", "text")
      }
      val cand = time("incrementalCandidates") {
        Dedup.incrementalCandidates(idxSig, shardSig)
      }
      idxSig.unpersist(false)
      val verified = time("jaccardVerify+filter count") {
        val v = Dedup.jaccardVerify(cand, union, "doc_id", "text")
          .where(col("jaccard_scaled") >= 50000).select("d1", "d2")
          .localCheckpoint(true)
        v
      }
      val updated = time("incrementalComponents") {
        Dedup.incrementalComponents(labels, verified).localCheckpoint(true)
      }
      time("histogram action") {
        val clus = updated.groupBy("component").agg(count(lit(1)).as("sz"))
        val singles = union.select("doc_id")
          .join(updated.select("doc_id"), Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_clusters"))
          .select(lit(1L).as("cluster_size"), col("n_clusters"))
          .where(col("n_clusters") > 0)
        clus.groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
          .unionAll(singles)
          .groupBy("cluster_size")
          .agg(sum("n_clusters").as("n_clusters"))
          .count()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

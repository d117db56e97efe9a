package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Graft, Tables}

/** Phase decomposition for the r11 optimization targets (dev tool,
  * guide §1): where do q159 (triangles) and q470 (LOF) actually spend
  * their seconds — the edge/kNN derivation or the downstream joins?
  */
object R11Prof {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = Tables(spark, dir)
    t.lineitem.count(); t.embeddings.count()

    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { _ =>
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      spark.sharedState.cacheManager.clearCache()
    }

    // ---- q159 phases ----
    val li = t.lineitem.select("l_orderkey", "l_partkey")
    def edges = {
      val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("v"))
      a.join(b, col("ok") === col("ok2") && col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select("u", "v")
    }
    time("q159: partEdges only")(edges.count())
    time("q159: edges + triangleCount")(
      graft.operators.Graphs.triangleCount(edges).head().getLong(0))
    time("q159: full (cnt x triangles)")({
      val e = edges
      val cnt = e.agg(count(lit(1)).as("n_edges"))
      cnt.crossJoin(broadcast(graft.operators.Graphs.triangleCount(e)))
        .count()
    })
    time("q159: triangles on MATERIALIZED e")({
      val e = edges.localCheckpoint(true)
      graft.operators.Graphs.triangleCount(e).head().getLong(0)
    })

    // ---- q470 phases ----
    val emb = t.embeddings
      .withColumn("nrm",
        graft.operators.Similarity.scaledDot(col("embedding"), col("embedding")))
    def candIds = graft.operators.Similarity.ivfCandidatePairs(t.embeddings, 25, 2)
    time("q470: ivf candidate pairs")(candIds.count())
    def d = candIds
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("nrm").as("qnrm")), "qid")
      .join(emb.select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("nrm").as("cnrm")), "cid")
      .select(col("qid"), col("cid"),
        (lit(1000000L) - floor(lit(1000000.0) *
          graft.operators.Similarity.scaledDot(col("qv"), col("cv"))
            .cast("double") /
          (sqrt(col("qnrm").cast("double")) * sqrt(col("cnrm").cast("double"))))
          .cast("long")).as("dist"))
    time("q470: + pairwise distances")({ d.agg(sum("dist")).head(); 0L })
    def nb = d.withColumn("rk", row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("dist").asc, col("cid").asc)))
      .where(col("rk") <= 5)
      .select("qid", "cid", "dist")
    time("q470: + 5NN window")(nb.count())
    spark.stop()
  }
}

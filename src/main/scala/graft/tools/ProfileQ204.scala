package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Graft, Tables}
import graft.functions.TextFunctions._

/** Stage profiler for q204's exact-Jaccard ground truth (dev tool). */
object ProfileQ204 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val d0 = Tables(spark, dir).documents
    val docs = d0.select("doc_id", "text").unionAll(
      d0.where(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 21)").as("text")))
    val shd = docs.select(col("doc_id"), normText(col("text")).as("__nt"))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("__nt"), 8))).as("sh"))
    time("shd")(shd.count())
    val dict = shd.select("sh").distinct()
      .withColumn("id", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("sh")) - 1)
    time("dict")(dict.count())
    val nw = dict.agg(expr("CAST(max(id) div 64 + 1 AS INT)").as("nw"))
    val bm = shd.join(dict, "sh")
      .groupBy("doc_id").agg(collect_set(col("id")).as("ids"))
      .crossJoin(broadcast(nw))
      .select(col("doc_id"), size(col("ids")).as("n"),
        expr("transform(sequence(0, nw - 1), w -> " +
          "aggregate(filter(ids, i -> i div 64 = w), 0L, " +
          "(a, i) -> a | shiftleft(1L, CAST(i % 64 AS INT))))").as("bm"))
      .cache()
    time("bitmaps")(bm.count())
    val truth = bm.select(col("doc_id").as("d1"), col("n").as("n1"), col("bm").as("b1"))
      .crossJoin(broadcast(bm.select(col("doc_id").as("d2"), col("n").as("n2"),
        col("bm").as("b2"))))
      .where(col("d1") < col("d2"))
      .where(graft.plans.GraftFunctions.bitmapAndCount(col("b1"), col("b2")) * 3 >=
        col("n1") + col("n2"))
    time("block product")(truth.count())
    import graft.operators.Dedup
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val cand = Dedup.minhashCandidates(sig)
    time("lsh candidates")(cand.count())
    spark.stop()
  }
}

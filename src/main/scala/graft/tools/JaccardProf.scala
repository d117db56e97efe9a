package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Graft, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Stage decomposition of jaccardVerify (dev tool, guide §1): sets
  * computation vs joins vs the per-pair array_intersect.
  */
object JaccardProf {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir).documents
    // the q27 fixture: exact-dup-seeded corpus
    val u = docs.select(col("doc_id"), col("text")).unionAll(
      docs.where(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 21)").as("text")))
    val sig = Dedup.minhashSignatures(u, "doc_id", "text")
    val cand = Dedup.minhashCandidates(sig)
    println(s"candidates: ${cand.count()}")

    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { _ =>
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    val candIds = cand.select(col("d1").as("doc_id"))
      .unionAll(cand.select(col("d2").as("doc_id"))).distinct()
    val sets = u.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), normText(col("text")).as("__nt"))
      .select(col("doc_id"), array_distinct(shingles(col("__nt"), 8)).as("shs"))
    time("sets only (count sizes)")(
      sets.agg(sum(size(col("shs")))).head().getLong(0))
    val a = sets.as("a"); val b = sets.as("b")
    val joined = cand.join(a, col("a.doc_id") === col("d1"))
      .join(b, col("b.doc_id") === col("d2"))
      .select(col("d1"), col("d2"), col("a.shs").as("s1"), col("b.shs").as("s2"))
    time("joins, no intersect")(
      joined.agg(sum(size(col("s1")) + size(col("s2")))).head().getLong(0))
    time("joins + array_intersect")(
      joined.select(size(array_intersect(col("s1"), col("s2"))).as("ni"))
        .agg(sum(col("ni"))).head().getLong(0))
    // r11 A/B arm: sets pre-sorted once per doc, per-pair native merge
    val setsS = u.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), normText(col("text")).as("__nt"))
      .select(col("doc_id"), array_sort(array_distinct(shingles(col("__nt"), 8))).as("shs"))
    val aS = setsS.as("a"); val bS = setsS.as("b")
    val joinedS = cand.join(aS, col("a.doc_id") === col("d1"))
      .join(bS, col("b.doc_id") === col("d2"))
      .select(col("d1"), col("d2"), col("a.shs").as("s1"), col("b.shs").as("s2"))
    time("joins + sorted-merge native")(
      joinedS.select(graft.plans.GraftFunctions
          .sortedIntersectCount(col("s1"), col("s2")).as("ni"))
        .agg(sum(col("ni"))).head().getLong(0))
    time("full jaccardVerify")(
      Dedup.jaccardVerify(cand, u, "doc_id", "text").count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Graft, Tables}
import graft.functions.TextFunctions._

/** Ad-hoc stage profiler for the MinHash pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, dir).documents

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val n = 32
    val base = docs.repartition(n, col("doc_id"))
      .select(col("doc_id"), normText(col("text")).as("nt"))
    time("norm only")(base.count())
    val sh = base.select(col("doc_id"), explode(shingles(col("nt"), 8)).as("sh"))
    time("explode shingles")(sh.count())
    val md = sh.select(col("doc_id"), md5(col("sh")).as("md"))
    time("md5")(md.agg(count(col("md"))).head().getLong(0))
    val ab = md.select(col("doc_id"),
      conv(substring(col("md"), 1, 8), 16, 10).cast("long").as("a"),
      conv(substring(col("md"), 9, 8), 16, 10).cast("long").bitwiseOR(lit(1L)).as("b"))
    time("conv a/b")(ab.agg(count(col("a"))).head().getLong(0))
    val sig = ab.groupBy("doc_id").agg(
      min(derivedHash(col("a"), col("b"), 0)).as("m0"),
      (1 until 8).map(i => min(derivedHash(col("a"), col("b"), i)).as(s"m$i")): _*)
    time("full sig")(sig.count())
    time("full sig again")(sig.count())

    // the exact q25 shape: union-seeded docs through the library path
    val seeded = docs.select("doc_id", "text").unionAll(
      docs.where(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 21)").as("text")))
    val q25 = graft.operators.Dedup.minhashSignatures(seeded, "doc_id", "text")
    time("q25 library sig")(q25.count())
    time("q25 ordered")(q25.orderBy("doc_id").count())

    // q26/q27 decomposition: bands, self-join, candidate-restricted verify
    import graft.operators.Dedup
    val sigC = q25.cache()
    time("sig cached")(sigC.count())
    val bands = Dedup.lshBands(sigC)
    time("bands union")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
    time("band self-join")(cand.count())
    val candD = cand.distinct().cache()
    time("candidates distinct")(candD.count())
    time("jaccard verify")(
      Dedup.jaccardVerify(candD, seeded, "doc_id", "text").count())
    time("jaccard verify again")(
      Dedup.jaccardVerify(candD, seeded, "doc_id", "text").count())

    // q10 decomposition: distributed rank stages on lineitem
    val li = Tables(spark, dir).lineitem.select("l_orderkey", "l_linenumber")
    time("li count")(li.count())
    val staged = li.repartitionByRange(32, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", monotonically_increasing_id() % (1L << 33))
    time("range+sort (uncached)")(staged.count())
    val cached = staged.cache()
    time("cache materialize")(cached.count())
    time("pid counts")(cached.groupBy("__pid").count().count())
    time("ranked agg")(graft.operators.Ranks
      .withGlobalRank(li, Seq("l_orderkey", "l_linenumber"))
      .groupBy().count().head().getLong(0))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Graft

/** Probe (dev tool): does a localCheckpoint'ed relation keep its
  * HashPartitioning, so a same-key groupBy/join skips the exchange?
  * Decides whether the CC loop's "sym is partitioned once" comment is
  * true under AQE.
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100000)
      .select((col("id") % 1000).as("src"), col("id").as("dst"))
    val sym = df.repartition(8, col("src")).dropDuplicates(Seq("src", "dst"))
      .localCheckpoint()
    println("=== checkpointed sym: groupBy(src) ===")
    sym.groupBy("src").agg(min("dst")).explain("formatted")
    println("=== checkpointed sym: join on src ===")
    val labels = spark.range(1000).select(col("id").as("v"), col("id").as("lbl"))
      .localCheckpoint()
    sym.join(labels, sym("src") === labels("v")).explain("formatted")
    println("=== AQE OFF variant ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sym2 = df.repartition(8, col("src")).dropDuplicates(Seq("src", "dst"))
      .localCheckpoint()
    sym2.groupBy("src").agg(min("dst")).explain("formatted")
    println("=== checkpoint built AQE-off, consumed AQE-on ===")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    sym2.groupBy("src").agg(min("dst")).explain("formatted")
    val labels2 = spark.range(1000).select(col("id").as("v"), (col("id") % 7).as("lbl"))
    println("--- join on src, AQE on, broadcast disabled ---")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sym2.join(labels2, sym2("src") === labels2("v")).explain("formatted")

    // The CC propagation ROUND plan, exactly as connectedComponents
    // builds it (Graft.partitionedCheckpoint'ed sym + checkpointed
    // labels + groupBy) — the artifact plans/r10/cc_round_after.txt is
    // cut from this: the sym side of the join must carry
    // hashpartitioning(src) and no Exchange; before the r10 fix it read
    // UnknownPartitioning and re-exchanged every round.
    println("=== cc round plan (sym exchange-free) ===")
    val sym3 = Graft.partitionedCheckpoint(
      df.repartition(col("src")).dropDuplicates(Seq("src", "dst")), col("src"))
    val lbl = labels2.localCheckpoint()
    sym3.join(lbl, sym3("src") === lbl("v"))
      .select(col("dst").as("v"), col("lbl"))
      .unionAll(lbl)
      .groupBy("v").agg(min("lbl").as("lbl"))
      .explain("formatted")

    // r11: labels stamped too (Graft.stampedCheckpoint at sym's count) —
    // the round join must read BOTH sides exchange-free, leaving the
    // propagation groupBy as the round's single Exchange.
    println("=== cc round plan (sym AND labels exchange-free, r11) ===")
    val p3 = sym3.rdd.getNumPartitions
    val lblS = Graft.stampedCheckpoint(
      sym3.groupBy(col("src").as("v")).agg(min("dst").as("lbl")), p3)
    sym3.join(lblS, sym3("src") === lblS("v"))
      .select(col("dst").as("v"), col("lbl"))
      .unionAll(lblS)
      .groupBy("v").agg(min("lbl").as("lbl"))
      .explain("formatted")
    spark.stop()
  }
}

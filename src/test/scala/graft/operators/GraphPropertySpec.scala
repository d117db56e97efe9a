package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** bfsHops against a reference BFS on random graphs, and the triangle
  * join against the brute-force triple enumeration.
  */
class GraphPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(41L + i)))

  private val genEdges: Gen[Seq[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
      .map(_.filter { case (u, v) => u != v }.distinct)
      .suchThat(_.nonEmpty)

  test("property: bfsHops equals reference BFS hop levels on random digraphs") {
    samples(genEdges, 12).foreach { edges =>
      val s = spark
      import s.implicits._
      val e = edges.toDF("src", "dst")
      val got = Graphs.bfsHops(e, maxHops = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // reference BFS from the same root (min src), same hop cap
      val root = edges.map(_._1).min
      val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      var dist = Map(root -> 0L)
      var frontier = Set(root)
      var hop = 1L
      while (hop <= 4 && frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(dist.contains)
        next.foreach(n => dist += n -> hop)
        frontier = next
        hop += 1
      }
      assert(got == dist, s"edges=$edges")
    }
  }

  test("property: canonical triangle join equals brute-force enumeration") {
    samples(genEdges, 12).foreach { raw =>
      val s = spark
      import s.implicits._
      // canonical undirected edge set with u < v
      val und = raw.map { case (u, v) => (math.min(u, v), math.max(u, v)) }.distinct
      val e = und.toDF("u", "v")
      val e1 = e.select(e("u").as("a"), e("v").as("b"))
      val e2 = e.select(e("u").as("b2"), e("v").as("c"))
      val e3 = e.select(e("u").as("a3"), e("v").as("c3"))
      val got = e1.join(e2, org.apache.spark.sql.functions.col("b") ===
          org.apache.spark.sql.functions.col("b2"))
        .join(e3, org.apache.spark.sql.functions.col("a") ===
          org.apache.spark.sql.functions.col("a3") &&
          org.apache.spark.sql.functions.col("c") ===
          org.apache.spark.sql.functions.col("c3"))
        .count()

      val set = und.toSet
      val nodes = und.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val expect = (for {
        i <- nodes; j <- nodes if i < j; k <- nodes if j < k
        if set((i, j)) && set((j, k)) && set((i, k))
      } yield 1).size.toLong
      assert(got == expect, s"edges=$und")
    }
  }
}

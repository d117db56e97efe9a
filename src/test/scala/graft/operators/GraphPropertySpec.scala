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

  // never empty (suchThat would silently DROP failed samples — Gen.apply
  // returns None and the test could go vacuous); substitute a fixed edge
  private val genEdges: Gen[Seq[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
      .map(_.filter { case (u, v) => u != v }.distinct)
      .map(es => if (es.isEmpty) Seq((0L, 1L)) else es)

  test("property: bfsHops equals reference BFS hop levels on random digraphs") {
    val hopCases = samples(genEdges, 12)
    assert(hopCases.size >= 10, s"generator drought: only ${hopCases.size} samples")
    hopCases.foreach { edges =>
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

  test("property: Graphs.triangleCount equals brute-force enumeration") {
    val cases = samples(genEdges, 12)
    assert(cases.size >= 10, s"generator drought: only ${cases.size} samples")
    cases.foreach { raw =>
      val s = spark
      import s.implicits._
      // canonical undirected edge set with u < v
      val und = raw.map { case (u, v) => (math.min(u, v), math.max(u, v)) }.distinct
      val got = Graphs.triangleCount(und.toDF("u", "v")).head().getLong(0)

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

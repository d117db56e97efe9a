package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral contracts of the perceptual-image family beyond the
  * q620/q621/q622 differentials: hash invariances at the operator level,
  * and bandedHammingPairs' pigeonhole exactness / cap algebra against a
  * driver-side brute force over random lanes.
  */
class ImageHashSpec extends SparkSpec {

  test("imageHashes: global brightness shift leaves both hashes unchanged") {
    val s = spark
    import s.implicits._
    val ids = Seq(1L, 2L).toDF("doc_id")
    // base gradient image; doc 2 = doc 1 with +3 on every pixel
    val gv: (Long, Int, Int) => Int = (id, x, y) =>
      (((x / 8) * 37 + (y / 8) * 91) % 200) + (if (id == 2L) 3 else 0)
    val h = Multimodal.imageHashes(s, Multimodal.encodePng(s, ids, gv, 72, 64))
      .toDF().orderBy("doc_id")
      .select("d0", "d1", "d2", "d3", "a0", "a1", "a2", "a3")
      .collect()
    assert(h.length == 2 && h(0) == h(1),
      s"brightness-shifted twin must hash identically: ${h.toSeq}")
    // and a genuinely different image must not collide on every lane
    val gv2: (Long, Int, Int) => Int = (id, x, y) =>
      if (id == 3L) (((x / 8) * 53 + (y / 8) * 17 + 7) % 200)
      else (((x / 8) * 37 + (y / 8) * 91) % 200)
    val h2 = Multimodal.imageHashes(s,
        Multimodal.encodePng(s, Seq(1L, 3L).toDF("doc_id"), gv2, 72, 64))
      .toDF().orderBy("doc_id").select("d0", "d1", "d2", "d3").collect()
    assert(h2(0) != h2(1), "distinct content must separate the dHash")
  }

  test("imageHashes drops undecodable and sub-grid payloads") {
    val s = spark
    import s.implicits._
    val garbage = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
    assert(Multimodal.imageHashes(s, garbage).count() == 0)
    // 4×4 decodes but is below the 9×8 grid — dropped, not crashed
    val tiny = Multimodal.encodePng(s, Seq(2L).toDF("doc_id"), (_, _, _) => 100, 4, 4)
    assert(Multimodal.imageHashes(s, tiny).count() == 0)
  }

  test("property: bandedHammingPairs == brute force (pigeonhole exact at maxDist < lanes)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260818L)
    for (_ <- 1 to 4) {
      // clustered lanes: half the docs perturb a shared base in 0-4 bit
      // positions, half are independent — both near and far pairs exist
      val base = Array.fill(4)(rnd.nextInt(65536).toLong)
      val rows = (1L to 24L).map { i =>
        val lanes =
          if (i % 2 == 0) {
            val l = base.clone()
            (0 until rnd.nextInt(5)).foreach { _ =>
              val b = rnd.nextInt(64); l(b / 16) ^= (1L << (b % 16))
            }
            l
          } else Array.fill(4)(rnd.nextInt(65536).toLong)
        (i, lanes(0), lanes(1), lanes(2), lanes(3))
      }
      val df = rows.toDF("doc_id", "d0", "d1", "d2", "d3")
      val got = Dedup.bandedHammingPairs(df, "doc_id", Seq("d0", "d1", "d2", "d3"), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      def ham(a: (Long, Long, Long, Long, Long), b: (Long, Long, Long, Long, Long)): Long =
        java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3) +
          java.lang.Long.bitCount(a._4 ^ b._4) + java.lang.Long.bitCount(a._5 ^ b._5)
      val want = (for {
        a <- rows; b <- rows if a._1 < b._1
        d = ham(a, b) if d <= 3
      } yield (a._1, b._1, d)).sorted
      assert(got == want, s"banded pairs must be pigeonhole-exact:\n$got\n$want")
      // cap algebra: capped ⊆ exact; every member of an oversized bucket
      // keeps its hub edge when within maxDist of the hub
      val capped = Dedup.bandedHammingPairs(df, "doc_id", Seq("d0", "d1", "d2", "d3"),
          3, maxBand = Some(3))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(capped.toSet.subsetOf(want.toSet), "capped output must never over-emit")
    }
  }

  test("property: bandedHammingIncremental == capped full run restricted to shard-touching pairs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (cap <- Seq(3, 64)) {
      // index 1..20, shard 21..30; a deep planted bucket spans both
      // sides (ids 1..6 and 21..24 share identical lanes — over cap 3
      // in every band), the rest cluster around a second base
      val deep = Array.fill(4)(rnd.nextInt(65536).toLong)
      val base = Array.fill(4)(rnd.nextInt(65536).toLong)
      def mk(i: Long): (Long, Long, Long, Long, Long) = {
        val lanes =
          if (i <= 6 || (i >= 21 && i <= 24)) deep.clone()
          else {
            val l = base.clone()
            (0 until rnd.nextInt(4)).foreach { _ =>
              val b = rnd.nextInt(64); l(b / 16) ^= (1L << (b % 16))
            }
            l
          }
        (i, lanes(0), lanes(1), lanes(2), lanes(3))
      }
      val rows = (1L to 30L).map(mk)
      val idx = rows.filter(_._1 <= 20).toDF("doc_id", "d0", "d1", "d2", "d3")
      val shd = rows.filter(_._1 > 20).toDF("doc_id", "d0", "d1", "d2", "d3")
      val all = rows.toDF("doc_id", "d0", "d1", "d2", "d3")
      val lanes = Seq("d0", "d1", "d2", "d3")
      val inc = Dedup.bandedHammingIncremental(idx, shd, "doc_id", lanes,
          maxDist = 3, maxBand = Some(cap))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val full = Dedup.bandedHammingPairs(all, "doc_id", lanes,
          maxDist = 3, maxBand = Some(cap))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(p => p._1 > 20 || p._2 > 20).sorted.toSeq
      assert(inc == full,
        s"incremental must equal the capped full restriction (cap=$cap):\n$inc\n$full")
    }
  }
}

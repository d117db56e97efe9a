package graft.operators

import graft.SparkSpec

/** Property pin for [[Dedup.jaccardVerify]] against a driver-side brute
  * force: random corpora and random candidate lists — including DANGLING
  * doc ids (no doc row: the pair silently drops, by the inner-join
  * contract) and DUPLICATE candidate rows (preserved: the operator never
  * dedupes its input) — must reproduce the exact 8-char-shingle Jaccard
  * (distinct shingles, floor(1e5·|∩|/|∪|) through the same double op).
  */
class JaccardPropertySpec extends SparkSpec {

  private def shingleSet(s: String, k: Int = 8): Set[String] = {
    val nt = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val n = math.max(nt.length - k + 1, 1)
    (0 until n).map(i => nt.slice(i, i + k)).toSet
  }

  test("property: jaccardVerify == brute force incl. dangling + duplicate candidates") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260816L)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    for (_ <- 1 to 6) {
      val docs = (1L to 20L).map(i =>
        (i, (1 to (3 + rnd.nextInt(10)))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
      val byId = docs.toMap
      // ids 21/22 are dangling; three pairs repeat
      val base = (1 to 15).map { _ =>
        val a = 1 + rnd.nextInt(22); val b = 1 + rnd.nextInt(22)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(p => p._1 != p._2)
      val cands = base ++ base.take(3)
      val got = Dedup.jaccardVerify(cands.toDF("d1", "d2"), docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sorted.toSeq
      val want = cands
        .filter(p => byId.contains(p._1) && byId.contains(p._2))
        .map { case (a, b) =>
          val (sa, sb) = (shingleSet(byId(a)), shingleSet(byId(b)))
          val inter = (sa & sb).size.toLong
          val union = sa.size + sb.size - inter
          (a, b, inter, union, math.floor(100000.0 * inter / union).toLong)
        }.sorted
      assert(got == want, s"got $got\nwant $want")
    }
  }
}

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

  /** Driver-side md5 hex — the bottom-K order key the cap uses. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("property: capped jaccardVerify == brute force over per-doc bottom-K shingles") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260817L)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    for (_ <- 1 to 4) {
      // lengths straddle the cap: short docs stay exact, long docs truncate
      val docs = (1L to 16L).map(i =>
        (i, (1 to (2 + rnd.nextInt(30)))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
      val byId = docs.toMap
      val cands = (1 to 12).map { _ =>
        val a = 1 + rnd.nextInt(16); val b = 1 + rnd.nextInt(16)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(p => p._1 != p._2)
      val k = 25
      def bottomK(ss: Set[String]): Set[String] =
        ss.toSeq.sortBy(sh => (md5hex(sh), sh)).take(k).toSet
      val got = Dedup.jaccardVerify(cands.toDF("d1", "d2"),
          docs.toDF("doc_id", "text"), "doc_id", "text",
          maxShingles = Some(k))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sorted.toSeq
      val want = cands.map { case (a, b) =>
        val (sa, sb) = (bottomK(shingleSet(byId(a))), bottomK(shingleSet(byId(b))))
        val inter = (sa & sb).size.toLong
        val union = sa.size + sb.size - inter
        (a, b, inter, union, math.floor(100000.0 * inter / union).toLong)
      }.sorted
      assert(got == want, s"got $got\nwant $want")
      // the cap never grows a set: every capped row's union is ≤ exact's
      val exact = Dedup.jaccardVerify(cands.toDF("d1", "d2"),
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      got.foreach { case (d1, d2, _, nu, _) =>
        assert(nu <= exact((d1, d2)), s"capped union exceeds exact for ($d1,$d2)")
      }
      // docs all under the cap ⇒ capped ≡ exact (the identity leg)
      val gotBig = Dedup.jaccardVerify(cands.toDF("d1", "d2"),
          docs.toDF("doc_id", "text"), "doc_id", "text",
          maxShingles = Some(10000))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sorted.toSeq
      val wantExact = cands.map { case (a, b) =>
        val (sa, sb) = (shingleSet(byId(a)), shingleSet(byId(b)))
        val inter = (sa & sb).size.toLong
        val union = sa.size + sb.size - inter
        (a, b, inter, union, math.floor(100000.0 * inter / union).toLong)
      }.sorted
      assert(gotBig == wantExact, "a cap above every set size must be exact")
    }
  }
}

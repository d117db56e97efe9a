package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.GraftFunctions

/** Pins the native Aho-Corasick multi-pattern counter against a
  * driver-side brute force (String.indexOf): `olap` = all end positions,
  * `disj` = greedy leftmost non-overlapping — exactly what left-to-right
  * replace() consumes. Randomized over a tiny alphabet to force nested /
  * overlapping / fail-link-heavy cases, plus directed edges: self-overlap
  * divergence, suffix-nested dictionaries, UTF-8 multi-byte neighbours,
  * empty and null text.
  */
class AhoCorasickSpec extends SparkSpec {

  private def bruteOlap(s: String, t: String): Int = {
    var c = 0; var i = s.indexOf(t)
    while (i >= 0) { c += 1; i = s.indexOf(t, i + 1) }
    c
  }
  private def bruteDisj(s: String, t: String): Int = {
    var c = 0; var i = s.indexOf(t)
    while (i >= 0) { c += 1; i = s.indexOf(t, i + t.length) }
    c
  }

  /** Densify the sparse (idx, olap, disj) output back to per-term arrays. */
  private def acRows(texts: Seq[(Long, String)], terms: Seq[String]): Map[Long, (Seq[Int], Seq[Int])] = {
    import spark.implicits._
    texts.toDF("id", "t")
      .select(col("id"), GraftFunctions.acCounts(col("t"), terms).as("m"))
      .collect()
      .map { r =>
        val olap = Array.fill(terms.length)(0)
        val disj = Array.fill(terms.length)(0)
        var lastIdx = -1
        r.getSeq[Row](1).foreach { h =>
          val i = h.getInt(0)
          assert(i > lastIdx, "sparse entries ascend by term index")
          lastIdx = i
          assert(h.getInt(1) > 0, "sparse entries only for matched terms")
          olap(i) = h.getInt(1); disj(i) = h.getInt(2)
        }
        r.getAs[Long]("id") -> (olap.toSeq, disj.toSeq)
      }.toMap
  }

  test("randomized brute-force pin over a 3-letter alphabet (codegen path)") {
    val rnd = new scala.util.Random(20260816L)
    val abc = "abc"
    def randStr(n: Int) = (0 until n).map(_ => abc(rnd.nextInt(3))).mkString
    (1 to 25).foreach { _ =>
      val terms = Iterator.continually(randStr(1 + rnd.nextInt(4)))
        .distinct.take(2 + rnd.nextInt(5)).toSeq
      val texts = (0L until 20L).map(i => i -> randStr(rnd.nextInt(40)))
      val got = acRows(texts, terms)
      texts.foreach { case (id, s) =>
        val (olap, disj) = got(id)
        terms.zipWithIndex.foreach { case (t, k) =>
          assert(olap(k) == bruteOlap(s, t), s"olap '$t' in '$s'")
          assert(disj(k) == bruteDisj(s, t), s"disj '$t' in '$s'")
        }
      }
    }
  }

  test("self-overlap makes olap and disj genuinely diverge") {
    val (olap, disj) = acRows(Seq(1L -> "aaaa"), Seq("aa", "aaa"))(1L)
    assert(olap == Seq(3, 2) && disj == Seq(2, 1))
    // 'ab'×4 = 'abababab': 3 overlapping 'aba', 2 disjoint (greedy at 0 and 4)
    val (o2, d2) = acRows(Seq(1L -> "ab" * 4), Seq("aba"))(1L)
    assert(o2 == Seq(3) && d2 == Seq(2))
  }

  test("suffix-nested dictionary (the classic he/she/his/hers)") {
    val terms = Seq("he", "she", "his", "hers")
    val (olap, disj) = acRows(Seq(1L -> "ushers"), terms)(1L)
    assert(olap == Seq(1, 1, 0, 1), "every nested suffix match reported")
    assert(disj == olap)
  }

  test("UTF-8 multi-byte neighbours cannot produce false matches") {
    // é = 0xC3 0xA9, 中 = 0xE4 0xB8 0xAD; ASCII terms must not match into
    // multi-byte sequences, and a multi-byte term matches exactly.
    val texts = Seq(1L -> "café méta 中文 data 中中", 2L -> "aé")
    val terms = Seq("a", "é", "中", "ta")
    val (o1, d1) = acRows(texts, terms)(1L)
    assert(o1 == Seq(4, 2, 3, 2) && d1 == o1) // a: café,méta,data×2; ta: méta,data
    val (o2, _) = acRows(texts, terms)(2L)
    assert(o2 == Seq(1, 1, 0, 0))
  }

  test("empty text yields an empty array; null text yields null") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, null: String)).toDF("id", "t")
      .select(col("id"), GraftFunctions.acCounts(col("t"), Seq("ab")).as("m"))
    val rows = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[scala.collection.Seq[Row]]("m")).toMap
    assert(rows(1L) != null && rows(1L).isEmpty)
    assert(rows(2L) == null)
  }

  test("interpreted eval agrees with the codegen path") {
    val ac = org.apache.spark.sql.graftshims.AcAutomaton.build(Array("aa", "ab", "aba", "zz"))
    val arr = org.apache.spark.sql.graftshims.AhoCorasickImpl.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("aababaa"), ac)
    // sparse: zz absent; aa@0,5; ab@1,3; aba@1,3 (disjoint takes only @1)
    val got = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3); (r.getInt(0), r.getInt(1), r.getInt(2))
    }
    assert(got == Seq((0, 2, 2), (1, 2, 2), (2, 2, 1)))
  }

  /** Driver-side greedy replay of the leftmost-longest policy. */
  private def bruteScrub(s: String, terms: Seq[String]): (String, Seq[(Int, Int, Int)]) = {
    val cand = for {
      (t, k) <- terms.zipWithIndex
      st <- Iterator.iterate(s.indexOf(t))(i => s.indexOf(t, i + 1)).takeWhile(_ >= 0)
    } yield (st, t.length, k)
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var lastEnd = -1
    cand.sortBy { case (st, ln, _) => (st, -ln) }.foreach { case (st, ln, k) =>
      if (st > lastEnd) { sel += ((st, ln, k)); lastEnd = st + ln - 1 }
    }
    val sb = new StringBuilder
    var src = 0
    sel.foreach { case (st, ln, _) => sb.append(s.substring(src, st)); src = st + ln }
    sb.append(s.substring(src))
    (sb.toString, sel.toSeq)
  }

  private def scrubRows(texts: Seq[(Long, String)], terms: Seq[String]): Map[Long, (String, Seq[(Int, Int, Int)])] = {
    import spark.implicits._
    texts.toDF("id", "t")
      .select(col("id"), GraftFunctions.acScrub(col("t"), terms).as("m"))
      .collect()
      .map { r =>
        val m = r.getAs[Row]("m")
        r.getAs[Long]("id") -> (m.getString(0),
          m.getSeq[Row](1).map(h => (h.getInt(0), h.getInt(1), h.getInt(2))).toSeq)
      }.toMap
  }

  test("scrub: randomized brute-force pin of the leftmost-longest policy") {
    val rnd = new scala.util.Random(8160226L)
    val abc = "abc"
    def randStr(n: Int) = (0 until n).map(_ => abc(rnd.nextInt(3))).mkString
    (1 to 25).foreach { _ =>
      val terms = Iterator.continually(randStr(1 + rnd.nextInt(4)))
        .distinct.take(2 + rnd.nextInt(5)).toSeq
      val texts = (0L until 20L).map(i => i -> randStr(rnd.nextInt(40)))
      val got = scrubRows(texts, terms)
      texts.foreach { case (id, s) =>
        val (cleaned, spans) = got(id)
        val (expC, expS) = bruteScrub(s, terms)
        assert(cleaned == expC, s"cleaned for '$s' with $terms")
        assert(spans == expS, s"spans for '$s' with $terms")
      }
    }
  }

  test("scrub: longest term wins at equal starts; selected spans suppress overlaps") {
    // 'abab': 'aba' beats 'ab' at start 0, leaving 'b'
    val (c1, s1) = scrubRows(Seq(1L -> "abab"), Seq("ab", "aba"))(1L)
    assert(c1 == "b" && s1 == Seq((0, 3, 1)))
    // 'ushers': 'she' starts first (1) and suppresses 'he'@2 and 'hers'@3
    val (c2, s2) = scrubRows(Seq(1L -> "ushers"), Seq("he", "she", "hers"))(1L)
    assert(c2 == "urs" && s2 == Seq((1, 3, 1)))
  }

  test("termDeltaCounts ≡ full matchCounts restriction (randomized), postings append ≡ rebuild") {
    import spark.implicits._
    val rnd = new scala.util.Random(63701L)
    val abcd = "abcd"
    def randStr(n: Int) = (0 until n).map(_ => abcd(rnd.nextInt(4))).mkString
    (1 to 5).foreach { _ =>
      val docs = (0L until 30L).map(i => i -> randStr(8 + rnd.nextInt(30))).toDF("doc_id", "text")
      val terms = Iterator.continually(randStr(4 + rnd.nextInt(3)))
        .distinct.take(3).toSeq
      val postings = Blocklist.gramPostings(docs, "doc_id", "text")
      val got = Blocklist.termDeltaCounts(postings, docs, "doc_id", "text", terms)
        .orderBy("doc_id", "term").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      val want = Blocklist.matchCounts(docs, "doc_id", "text", terms)
        .orderBy("doc_id", "term").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"delta path must equal the full scan for $terms")
    }
    // candidate-but-no-match: term 'abcdab' has grams abcd/bcda/cdab; doc 1
    // carries all three SCATTERED (prefilter admits it) but never the
    // contiguous term — the exact verify must emit only doc 2
    val tricky = Seq((1L, "abcd bcda cdab"), (2L, "zabcdabz")).toDF("doc_id", "text")
    val p2 = Blocklist.gramPostings(tricky, "doc_id", "text")
    val d2 = Blocklist.termDeltaCounts(p2, tricky, "doc_id", "text", Seq("abcdab"))
      .collect().map(_.getLong(0)).toSeq
    assert(d2 == Seq(2L), "scattered-gram doc must be dropped by the exact verify")
    // a doc shorter than g contributes NO postings (sequence(1,0) would
    // otherwise descend and fabricate windows)
    val short = Seq((9L, "abc")).toDF("doc_id", "text")
    assert(Blocklist.gramPostings(short, "doc_id", "text").count() == 0L)
    // postings append ≡ rebuild (row-local decomposition)
    val shard = Seq((10L, "ddda abc")).toDF("doc_id", "text")
    val appended = p2.unionByName(Blocklist.gramPostings(shard, "doc_id", "text"))
    val rebuilt = Blocklist.gramPostings(tricky.unionByName(shard), "doc_id", "text")
    assert(appended.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(appended).isEmpty)
  }

  test("matchCounts + summary integer parity on a directed corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "bad word bad word clean"),   // 23 chars, bad×2 word×2
      (2L, "all clean here"),
      (3L, "badbadbad")                  // 9 chars, bad×3
    ).toDF("doc_id", "text")
    val terms = Seq("bad", "word")
    val mc = Blocklist.matchCounts(docs, "doc_id", "text", terms)
      .orderBy("doc_id", "term").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("n_olap"), r.getAs[Long]("n_disj")))
    assert(mc.toSeq == Seq((1L, "bad", 2L, 2L), (1L, "word", 2L, 2L), (3L, "bad", 3L, 3L)))
    val sm = Blocklist.summary(docs, "doc_id", "text", terms, maxPer10k = 2000)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("hits_per_10k"), r.getAs[Int]("pass")))
    // doc1: 4 hits / 23 chars -> 40000/23 = 1739 (pass); doc2: zeros (pass);
    // doc3: 3 hits / 9 chars -> 30000/9 = 3333 (fail)
    assert(sm.toSeq == Seq((1L, 2L, 4L, 1739L, 1), (2L, 0L, 0L, 0L, 1), (3L, 1L, 3L, 3333L, 0)))
  }
}

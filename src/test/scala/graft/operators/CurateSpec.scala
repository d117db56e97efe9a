package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral contracts of the Curate chain beyond q579's differential:
  * dedup keeps the smallest id and is idempotent, the waterfall is
  * monotone (each stage only removes), and decontamination removes
  * exactly the planted overlaps.
  */
class CurateSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exactDedup keeps the minimum doc_id and is idempotent") {
    val nrm = Curate.normalize(docsDF(Seq(
      5L -> "alpha beta gamma", 2L -> "alpha  beta gamma",  // same normalized
      9L -> "Alpha beta gamma",                             // different (case kept? normText lowercases)
      7L -> "delta epsilon")))
    val d1 = Curate.exactDedup(nrm)
    val got = d1.collect().map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    // normText lowercases + collapses whitespace: 5/2/9 all merge -> keep 2
    assert(got == Seq(2L, 7L), s"got $got")
    val d2 = Curate.exactDedup(d1)
    assert(d2.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(2L, 7L),
      "second application must be a no-op")
  }

  test("waterfall stages are monotone and the report matches the kept frame") {
    val train = docsDF((1L to 40L).map { i =>
      val txt =
        if (i % 5 == 0) "kurz"                                // fails quality
        else if (i % 7 == 0) "der hund und die katze und das haus und der baum"
        else s"the document of number $i and the words of it go on and on"
      i -> txt
    })
    val eval0 = docsDF(Seq(1000L ->
      "the document of number 3 and the words of it go on and on"))
    val (kept, report) = Curate.waterfall(train, eval0)
    val counts = report.collect().map(r => r.getAs[Int]("stage") -> r.getAs[Long]("docs")).toMap
    assert((1 to 4).forall(k => counts(k) >= counts(k + 1)),
      s"stages must be monotone: $counts")
    assert(counts(5) == kept.count(), "report tail must equal the kept frame")
    // doc 3's full text is in the eval split -> decontaminated
    assert(kept.where(col("doc_id") === 3L).count() == 0,
      "planted eval overlap must be removed")
  }

  test("dsirScores: exact parity when target == corpus; target-like docs outrank") {
    val docs = docsDF(Seq(
      1L -> "aa bb cc dd", 2L -> "ee ff gg hh", 3L -> "aa bb cc"))
    // target == corpus ⇒ every bucket ratio is exactly 10^6 (same counts,
    // same totals — integer division of equal products), so every doc
    // scores exact parity
    val self = Curate.dsirScores(docs, docs, buckets = 64)
    assert(self.collect().forall(_.getLong(2) == 1000000L),
      "self-target must score exactly 10^6 everywhere")
    // a target concentrated on doc 1's bigrams ranks docs 1/3 above 2
    val target = docsDF(Seq(10L -> "aa bb cc dd aa bb"))
    val sc = Curate.dsirScores(docs, target, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sc(1L) > sc(2L) && sc(3L) > sc(2L),
      s"target-like docs must outrank raw-only docs: $sc")
    // a sub-2-token doc carries no features and is absent
    val short = docsDF(Seq(1L -> "aa bb", 2L -> "solo"))
    assert(Curate.dsirScores(short, short, buckets = 64)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("dsir incremental: state merge == rebuild; scores == full restriction") {
    val index = docsDF((1L to 12L).map(i =>
      i -> s"the corpus document number $i has these ordinary words in it"))
    val shard = docsDF(Seq(
      101L -> "the corpus document number 3 has these ordinary words in it",
      102L -> "entirely novel shard vocabulary arrives with fresh bigrams today",
      103L -> "the shard mixes corpus words with novel vocabulary here"))
    val target = docsDF(Seq(500L -> "ordinary words in it the corpus"))
    val union = index.unionAll(shard)
    // state maintenance IS the rebuild: fold-in == from-scratch counts
    val merged = Curate.dsirStateMerge(Curate.dsirState(index, 64), shard, 64)
    val rebuilt = Curate.dsirState(union, 64)
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
      "merged bucket state must equal a from-scratch rebuild over index ∪ shard")
    // target-side state maintenance IS the rebuild too
    val tMerged = Curate.dsirTargetStateMerge(Curate.dsirTargetState(index, 64),
      shard, 64)
    val tRebuilt = Curate.dsirTargetState(union, 64)
    assert(tMerged.exceptAll(tRebuilt).isEmpty && tRebuilt.exceptAll(tMerged).isEmpty,
      "merged target state must equal a from-scratch rebuild over index ∪ shard")
    // incremental scoring == the full arm's restriction to shard ids —
    // reading only the two states and the shard, never either corpus
    val inc = Curate.dsirScoresIncremental(Curate.dsirState(index, 64),
      Curate.dsirTargetState(target, 64),
      shard, 64).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Curate.dsirScores(union, target, 64)
      .where(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full,
      s"incremental scores must equal the full restriction: $inc vs $full")
    // a persisted state may come back with any column ORDER (both columns
    // are LONG — a positional bind would be silent); results must not move
    val reordered = Curate.dsirState(index, 64).select("cr", "f")
    val incR = Curate.dsirScoresIncremental(reordered,
      Curate.dsirTargetState(target, 64), shard, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incR == full, "a column-reordered state must score identically")
  }

  test("dsir states are bucket-stamped; a mismatched count fails loud") {
    val index = docsDF((1L to 6L).map(i => i -> s"word $i of the corpus text"))
    val shard = docsDF(Seq(11L -> "shard words of the corpus text again"))
    val st = Curate.dsirState(index, 64)
    assert(st.select("nb").distinct().collect().map(_.getLong(0)).toSeq == Seq(64L),
      "state must carry its bucket-count stamp")
    // state built at 64, merged/scored at 128: the hash-bucket relation
    // no longer matches — must throw at the first action, never return
    // silently-wrong ratios (the r9 ADVICE failure mode)
    val ex1 = intercept[Exception] {
      Curate.dsirStateMerge(st, shard, 128).collect()
    }
    assert(ex1.getMessage.contains("buckets"), ex1.getMessage)
    val ex2 = intercept[Exception] {
      Curate.dsirScoresIncremental(st, Curate.dsirTargetState(index, 128),
        shard, 64).collect()
    }
    assert(ex2.getMessage.contains("buckets"), ex2.getMessage)
    // matched stamps pass
    assert(Curate.dsirStateMerge(st, shard, 64).count() > 0)
  }

  test("oovAdmit: vocab merge == rebuild; admission == full restriction; cache released") {
    val index = docsDF((1L to 10L).map(i =>
      i -> s"the common corpus words repeat here again and again $i"))
    val shard = docsDF(Seq(
      101L -> "the common corpus words repeat here again",
      102L -> "utterly alien vocabulary zxq wvut qponm lkjih"))
    val union = index.unionAll(shard)
    // state maintenance IS the rebuild
    val merged = Curate.vocabStateMerge(Curate.vocabState(index), shard)
    val rebuilt = Curate.vocabState(union)
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
      "merged vocab state must equal a from-scratch rebuild over index ∪ shard")
    // incremental admission == the full recompute's restriction to shard
    // ids (zero state + union-as-shard IS the full recompute)
    spark.sharedState.cacheManager.clearCache()
    val inc = Curate.oovAdmit(Curate.vocabState(index), shard, vocabK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(spark.sharedState.cacheManager.isEmpty,
      "no cached relation may outlive the oovAdmit call")
    val full = Curate.oovAdmit(Curate.vocabState(index.limit(0)), union, vocabK = 8)
      .where(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(inc == full, s"incremental admission must equal the full restriction: $inc vs $full")
    // the alien-vocab doc must fail admission; the corpus-like doc passes
    val verdicts = inc.map(t => t._1 -> t._5).toMap
    assert(verdicts(101L) && !verdicts(102L), verdicts.toString)
  }

  test("dsirScoresIncremental releases its cache (library cache contract)") {
    spark.sharedState.cacheManager.clearCache()
    val index = docsDF((1L to 6L).map(i => i -> s"word $i of the corpus text"))
    val shard = docsDF(Seq(11L -> "shard words of the corpus text again"))
    val out = Curate.dsirScoresIncremental(
      Curate.dsirState(index), Curate.dsirTargetState(index), shard)
    assert(spark.sharedState.cacheManager.isEmpty,
      "no cached relation may outlive the dsirScoresIncremental call")
    assert(out.count() == 1)
  }

  test("dsirScores releases its cache (library cache contract)") {
    spark.sharedState.cacheManager.clearCache()
    val docs = docsDF((1L to 6L).map(i => i -> s"word $i of the corpus text"))
    val out = Curate.dsirScores(docs, docs)
    assert(spark.sharedState.cacheManager.isEmpty,
      "no cached relation may outlive the dsirScores call")
    assert(out.count() == 6)
  }

  test("waterfall releases its caches (library cache contract)") {
    spark.sharedState.cacheManager.clearCache()
    val train = docsDF((1L to 10L).map(i =>
      i -> s"the document of number $i and the words of it go on and on"))
    val eval0 = docsDF(Seq(99L -> "completely unrelated eval text here"))
    val (kept, report) = Curate.waterfall(train, eval0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "no cached relation may outlive the waterfall call")
    // returned frames stay usable after the caches are gone
    assert(kept.count() == 10 && report.count() == 5)
  }
}

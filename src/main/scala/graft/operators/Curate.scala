package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The corpus-curation waterfall as a library API — the composed hygiene
  * chain (language gate → quality gate → exact dedup → n-gram
  * decontamination) a training-data pipeline runs between crawl and
  * tokenization. q579 exercises it differentially; this object is the
  * form a user calls.
  *
  * Scale shape: one normalize pass feeds every stage; the chain costs 3
  * shuffles total (dedup groupBy, gram equi-join, report rollup) — all
  * other stages are map-side filters. The eval side of the
  * decontamination join is DISTINCT grams (usually tiny → broadcast).
  */
object Curate {

  final case class Config(
      minTokens: Int = 10,
      minStopwords: Int = 1,
      decontaminateGramLen: Int = 5)

  /** Normalized (doc_id, nt) projection. */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFunctions.normText(col("text")).as("nt"))

  /** Per-language stopword probes — DATA, not code: a real multilingual
    * corpus adds a language by adding a row here (or passing its own
    * table), never by writing a new regex branch. The default rows are
    * q21's original four probes, so the default gate is bit-identical to
    * the historical behavior.
    */
  val defaultLangProbes: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "de"),
    "fr" -> Seq("le", "les", "des", "une"))

  /** Occurrence count of one language's stopwords. Rendered as a word-
    * boundary regex (not token equality) because normText keeps
    * punctuation — "the," must still count.
    */
  private def probeCount(words: Seq[String]): Column =
    expr(s"size(regexp_extract_all(nt, '\\\\b(${words.mkString("|")})\\\\b', 0))")
      .cast("long")

  /** One score column `s_<lang>` per table row — a pure projection (no
    * join, no shuffle): the probe table is driver-side metadata compiled
    * into the row expression, the per-row work is L regex scans.
    */
  def langScores(nrm: DataFrame,
      probes: Seq[(String, Seq[String])] = defaultLangProbes): DataFrame =
    probes.foldLeft(nrm) { case (df, (lang, words)) =>
      df.withColumn(s"s_$lang", probeCount(words))
    }

  /** Keep docs where `keep`'s stopword hits dominate every other probe
    * in the table (q21's heuristic, generalized to any language set).
    */
  def langGate(nrm: DataFrame, keep: String = "en",
      probes: Seq[(String, Seq[String])] = defaultLangProbes): DataFrame = {
    require(probes.exists(_._1 == keep), s"unknown language: $keep")
    val others = probes.collect { case (l, _) if l != keep => col(s"s_$l") }
    val gate = others match {
      case Seq()    => lit(true)
      case Seq(one) => col(s"s_$keep") >= one
      case many     => col(s"s_$keep") >= greatest(many: _*)
    }
    langScores(nrm, probes).where(gate).select(nrm.columns.map(col).toSeq: _*)
  }

  /** Argmax language label in table order (earlier rows win ties) — the
    * q21 prediction, generalized to the probe table.
    */
  def predLang(scored: DataFrame,
      probes: Seq[(String, Seq[String])] = defaultLangProbes): Column = {
    val langs = probes.map(_._1)
    langs.init.zipWithIndex.foldRight(lit(langs.last): Column) { case ((l, i), acc) =>
      val laterMax = langs.drop(i + 1).map(o => col(s"s_$o")) match {
        case Seq(one) => one
        case many     => greatest(many: _*)
      }
      when(col(s"s_$l") >= laterMax, l).otherwise(acc)
    }
  }

  /** q22's quality screens: minimum token count + stopword presence. */
  def qualityGate(nrm: DataFrame, cfg: Config = Config()): DataFrame =
    nrm.where(size(split(col("nt"), " ")) >= cfg.minTokens &&
      expr("size(regexp_extract_all(nt, '\\\\b(the|a|of|and|to|in)\\\\b', 0))") >=
        cfg.minStopwords)

  /** Exact dedup on the normalized text — smallest doc_id survives. */
  def exactDedup(nrm: DataFrame): DataFrame =
    nrm.groupBy("nt").agg(min("doc_id").as("doc_id"))

  /** Word n-grams of the normalized text. */
  def grams(nrm: DataFrame, n: Int): DataFrame =
    nrm.select(col("doc_id"), split(col("nt"), " ").as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ws) - ${n - 1}), i -> array_join(slice(ws, i, $n), ' '))"))
        .as("gram"))

  /** DSIR-style importance score over hashed bigram features — the
    * "Data Selection for Language Models via Importance Resampling"
    * shape (Xie et al. 2023, arXiv:2302.03169) re-expressed under the
    * engine's integer-determinism convention: bigrams hash into
    * `buckets` md5-derived feature buckets, each bucket carries the
    * add-one-smoothed scaled frequency RATIO of the target corpus vs
    * the raw corpus, and a document scores the count-weighted mean of
    * its feature ratios (10^6 = parity: the doc looks as target-like
    * as the raw average). The classic formulation sums log-ratios;
    * ln() is not bit-reproducible across engines, so the score is the
    * mean of exact integer-scaled ratios — the same ordering signal,
    * engine-exact (products ride in DECIMAL like q377/q521; quotients
    * stay small).
    *
    * Scale shape: two map-side-combined feature aggregates collapsing
    * to `buckets` rows, then ONE broadcast join of the tiny weight
    * table back onto the per-doc feature stream — the corpus is never
    * shuffled and the weight table is index-card-sized at any corpus
    * size. Docs with fewer than 2 tokens carry no features and are
    * absent from the output (they score upstream quality gates, not
    * importance). Returns (doc_id, n_feats, dsir_scaled).
    */
  def dsirScores(docs: DataFrame, target: DataFrame, buckets: Int = 512): DataFrame = {
    def feats(df: DataFrame) = grams(normalize(df), 2)
      .select(col("doc_id"),
        (conv(substring(md5(col("gram")), 1, 4), 16, 10).cast("long") % buckets).as("f"))
    // call-scoped cache (the Dedup contract): the raw feature stream
    // feeds the bucket aggregate AND the per-doc join; the result is
    // materialized under the cache, nothing stays pinned after return
    val rawF = feats(docs).cache()
    try {
      val tgtCnt = feats(target).groupBy("f").agg(count(lit(1)).as("ct"))
      val rawCnt = rawF.groupBy("f").agg(count(lit(1)).as("cr"))
      val tot = rawCnt.agg(sum("cr").as("rtot"))
        .crossJoin(tgtCnt.agg(sum("ct").as("ttot")))
      val w = rawCnt.join(tgtCnt, Seq("f"), "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("f"),
          expr(s"CAST(1000000 * (coalesce(ct, 0) + 1) AS DECIMAL(38,0))" +
            s" * (rtot + $buckets)" +
            s" div (CAST(cr + 1 AS DECIMAL(38,0)) * (ttot + $buckets))").as("w"))
      rawF.join(broadcast(w), Seq("f"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"),
          expr("sum(w) div count(1)").as("dsir_scaled"))
        .localCheckpoint(true)
    } finally rawF.unpersist(false)
  }

  /** Drop training docs sharing any n-gram with the eval corpus (q157). */
  def decontaminate(train: DataFrame, eval0: DataFrame, cfg: Config = Config()): DataFrame = {
    val bad = grams(train, cfg.decontaminateGramLen)
      .join(grams(eval0, cfg.decontaminateGramLen).select("gram").distinct(), "gram")
      .select("doc_id").distinct()
    train.join(bad, Seq("doc_id"), "left_anti")
  }

  /** Full waterfall: returns (surviving docs, per-stage report).
    *
    * Cache contract (the Ranks pattern): `base`/`ded` are cached only for
    * the duration of the call — both returned frames are materialized
    * under the caches via eager localCheckpoint, then the caches are
    * released, so nothing stays pinned in executor storage after the call
    * returns. (At petabyte scale the same shape lands `clean` in a
    * parquet sink instead of local blocks — the caller owns that choice;
    * the library must not leak session-long cache entries either way.)
    */
  def waterfall(train: DataFrame, eval0: DataFrame,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val base = normalize(train).cache()
    val ev   = normalize(eval0)
    val lang = langGate(base)
    val qual = qualityGate(lang, cfg)
    val ded  = exactDedup(qual).cache()
    val clean = decontaminate(ded, ev, cfg)
    def stage(n: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("docs"))
        .select(lit(n).as("stage"), lit(name).as("name"), col("docs"))
    val report = stage(1, "input_train", base)
      .unionAll(stage(2, "lang_en", lang))
      .unionAll(stage(3, "quality", qual))
      .unionAll(stage(4, "exact_dedup", ded))
      .unionAll(stage(5, "decontaminated", clean))
      .orderBy("stage")
    try {
      (clean.localCheckpoint(true), report.localCheckpoint(true))
    } finally {
      base.unpersist(false)
      ded.unpersist(false)
    }
  }
}

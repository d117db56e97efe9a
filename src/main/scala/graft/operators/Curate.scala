package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** q21's n-gram language heuristic: keep docs whose English stopword
    * hits dominate the de/es/fr probes.
    */
  def langGate(nrm: DataFrame): DataFrame =
    nrm.where(
      expr("size(regexp_extract_all(nt, '\\\\b(the|of|and)\\\\b', 0))") >=
        greatest(
          expr("size(regexp_extract_all(nt, '\\\\b(der|die|das|und)\\\\b', 0))"),
          expr("size(regexp_extract_all(nt, '\\\\b(el|la|los|de)\\\\b', 0))"),
          expr("size(regexp_extract_all(nt, '\\\\b(le|les|des|une)\\\\b', 0))")))

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

  /** Drop training docs sharing any n-gram with the eval corpus (q157). */
  def decontaminate(train: DataFrame, eval0: DataFrame, cfg: Config = Config()): DataFrame = {
    val bad = grams(train, cfg.decontaminateGramLen)
      .join(grams(eval0, cfg.decontaminateGramLen).select("gram").distinct(), "gram")
      .select("doc_id").distinct()
    train.join(bad, Seq("doc_id"), "left_anti")
  }

  /** Full waterfall: returns (surviving docs, per-stage report). */
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
    (clean, report)
  }
}

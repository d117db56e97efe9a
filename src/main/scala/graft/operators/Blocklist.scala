package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Multi-pattern blocklist matching over documents — the tagging/filter
  * primitive of a training-data curation pipeline (C4's bad-word filter,
  * Dolma-style taggers, keyword-quota routing; the reference's analog is
  * its rule-driven compare/migrate filtering,
  * `database/processor/data_compare_rule.go`).
  *
  * Scale shape: the dictionary is driver-bounded (top-K or a provided
  * list), compiled ONCE into a frozen Aho-Corasick automaton that rides
  * the plan as a reference object — serialized per stage like a literal,
  * built O(Σ|term|). Each document is then ONE O(len + matches) pass
  * inside whole-stage codegen, independent of |dict|; the naive
  * alternative is |dict| LIKE/regexp scans of the corpus. Nothing
  * shuffles until the caller aggregates: tagging is a pure projection.
  */
object Blocklist {

  /** Deterministic corpus-derived dictionary: the `k` most frequent
    * lowercase alphabetic tokens of length ≥ `minLen`, ties broken by
    * term ascending. Distributed count + TakeOrdered top-K; the collect
    * is K-bounded (the dictionary is driver-held by design — it compiles
    * into the automaton). Returned sorted lexicographically.
    */
  def topTermDictionary(docs: DataFrame, textCol: String, k: Int, minLen: Int): Seq[String] = {
    docs
      .select(explode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("term"))
      .where(length(col("term")) >= minLen)
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc) // .limit → TakeOrderedAndProject, no global sort
      .limit(k)
      .collect()
      .map(_.getString(0)).sorted.toSeq
  }

  /** Per-(doc, term) occurrence counts for every dictionary term with at
    * least one hit: `n_olap` counts all end positions (overlapping),
    * `n_disj` the greedy leftmost non-overlapping occurrences (exactly
    * what left-to-right `replace(text, term, '')` consumes). Matching is
    * case-insensitive via lower() on the text; terms must already be
    * lowercase.
    */
  def matchCounts(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    docs
      .select(col(idCol),
        explode(GraftFunctions.acCounts(lower(col(textCol)), terms)).as("h"))
      .select(col(idCol),
        element_at(lit(terms.toArray), col("h.idx") + 1).as("term"),
        col("h.olap").cast("long").as("n_olap"),
        col("h.disj").cast("long").as("n_disj"))
  }

  /** Per-document blocklist summary and verdict: distinct terms hit,
    * total (non-overlapping) hits, hits per 10k chars (integer-exact
    * `div`), and the pass flag at `maxPer10k`. Docs with zero hits pass
    * with zeros — the gate must SEE every document.
    */
  def summary(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], maxPer10k: Int): DataFrame = {
    docs
      .select(col(idCol), length(col(textCol)).cast("long").as("n_chars"),
        GraftFunctions.acCounts(lower(col(textCol)), terms).as("m"))
      .select(col(idCol), col("n_chars"),
        size(col("m")).cast("long").as("n_terms"),
        expr("aggregate(m, 0L, (a, x) -> a + x.disj)").as("n_hits"))
      .withColumn("hits_per_10k",
        when(col("n_chars") > 0, expr("(10000 * n_hits) div n_chars")).otherwise(lit(0L)))
      .withColumn("pass", (col("hits_per_10k") <= maxPer10k).cast("int"))
  }

  /** Redaction pass: remove every blocklisted span under the
    * leftmost-longest non-overlapping policy (FlashText's rule — at equal
    * starts the longest term wins; a selected span suppresses overlapping
    * later starts), in ONE automaton pass per document. Emits the cleaned
    * text plus span accounting; `n_removed` counts removed characters
    * (== bytes on ASCII corpora — spans are byte-offset exact either way).
    * Matching is case-insensitive via lowercasing, so `cleaned` is the
    * LOWERCASED text with the selected spans spliced out.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    docs
      .select(col(idCol), length(col(textCol)).cast("long").as("n_chars"),
        GraftFunctions.acScrub(lower(col(textCol)), terms).as("m"))
      .select(col(idCol),
        col("m.cleaned").as("cleaned"),
        size(col("m.spans")).cast("long").as("n_spans"),
        (col("n_chars") - length(col("m.cleaned"))).as("n_removed"))
  }
}

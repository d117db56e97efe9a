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

  /** Character-g-gram postings over the lowercased text — the persisted
    * index that makes DICTIONARY GROWTH incremental: adding a term never
    * rescans the corpus (see [[termDeltaCounts]]). One row per distinct
    * (gram, doc) — built by a row-local decomposition, so shard append ≡
    * rebuild by construction; at 100 TB the relation is written
    * `bucketBy(gram)` so term probes co-locate without a shuffle.
    */
  def gramPostings(docs: DataFrame, idCol: String, textCol: String,
      g: Int = 4): DataFrame = {
    // guard: sequence(1, 0) would DESCEND ([1, 0]) — a doc shorter than g
    // has no gram and must contribute no postings rows.
    // gram over a PRE-PROJECTED lowercased attribute: with lower($textCol)
    // inlined into the transform lambda it re-evaluates per gram position
    // on non-CSE evaluation paths — O(len²) chars per document (the
    // minhash/jaccardVerify lambda-quadratic class, r10). The attribute
    // is multi-referenced (guard, sequence bound, lambda), so
    // CollapseProject keeps the two-step projection and lower() runs
    // once per row.
    // operator-derived internal name (not a plain "__lt"): a caller whose
    // idCol collides would silently shadow the pre-projection
    require(idCol != "__graft_gram_lt", "idCol collides with the internal column")
    docs
      .select(col(idCol), lower(col(textCol)).as("__graft_gram_lt"))
      .select(col(idCol),
        explode(expr(
          s"CASE WHEN length(__graft_gram_lt) >= $g THEN " +
          s"transform(sequence(1, length(__graft_gram_lt) - ${g - 1}), " +
          s"i -> substr(__graft_gram_lt, i, $g)) " +
          s"ELSE array() END")).as("gram"))
      .distinct()
  }

  /** Exact match counts for NEWLY ADDED dictionary terms without a
    * corpus rescan: each term's candidate documents are those whose
    * postings contain ALL of the term's g-grams (a containment-complete
    * prefilter — a document containing the term as a substring contains
    * every one of its g-grams), and only those documents' text is read
    * for the exact automaton verify. Result ≡ `matchCounts(docs, terms)`
    * restricted to the new terms — the spec and oracle pin that
    * equality. Terms must be ≥ g chars (shorter terms have no g-gram
    * witness; grow them through the full-scan path instead).
    *
    * Scale shape: the probe is |term grams| posting lookups + a
    * candidate-sized semi-join into the corpus — cost follows the new
    * term's selectivity, not the corpus.
    */
  def termDeltaCounts(postings: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, newTerms: Seq[String], g: Int = 4): DataFrame = {
    require(newTerms.forall(_.length >= g),
      s"termDeltaCounts: every term needs a $g-gram witness")
    val spark = docs.sparkSession
    import spark.implicits._
    val termGrams = newTerms
      .flatMap(t => t.sliding(g).toSeq.distinct.map(t -> _))
      .toDF("term", "gram")
    val nGrams = newTerms.map(t => t -> t.sliding(g).toSeq.distinct.size).toMap
    val need = newTerms.map(t => (t, nGrams(t))).toDF("term", "need")
    val allGrams = newTerms.flatMap(_.sliding(g)).distinct
    val cand = postings
      // literal In() filter BEFORE the join so a parquet-backed postings
      // store can skip row groups / dictionary pages — the join alone
      // would scan the whole index; the delta-term list is small by the
      // use case, so the literal list is bounded
      .where(col("gram").isin(allGrams: _*))
      .join(broadcast(termGrams), "gram")
      .groupBy("term", idCol).agg(count(lit(1)).as("have"))
      .join(broadcast(need), "term")
      .where(col("have") === col("need"))
      .select(col("term"), col(idCol))
    val candDocs = docs.join(cand.select(idCol).distinct(), Seq(idCol), "left_semi")
    // exact verify on the candidate subset only — sound because a hit on
    // term t implies candidacy FOR t (contains-all-grams ⊇ contains-term),
    // so restricting the scan to the candidate union loses nothing
    matchCounts(candDocs, idCol, textCol, newTerms)
      .select(col(idCol), col("term"), col("n_olap"), col("n_disj"))
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

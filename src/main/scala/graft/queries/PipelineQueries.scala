package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.TextFunctions

/** Collation-aware relational semantics (SURVEY §2.8 NLSSORT/COLLATE row,
  * §7.3 hard part 1) and corpus-hygiene operators a training-data pipeline
  * runs before anything else: paragraph-granularity dedup, eval-set
  * contamination screening, and URL/domain profiling.
  *
  * Collation: the reference carries per-column collation through its chunk
  * predicates (utils/structure/chunk.go:80-96, bucket.go:52-84) with an
  * escape hatch to binary ordering (enable-collation-setting,
  * bucket.go:137-143). Binary is our default everywhere (hard-part-1
  * verdict); q89 exercises the non-default path through Spark 4's
  * first-class collation type so case-insensitive semantics are a column
  * property, not a scattering of lower() calls.
  */
object PipelineQueries {

  /** SQL twin of TextFunctions.normText (same as TextQueries.normSql). */
  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  val all: Seq[QueryDef] = Seq(

    // Case-insensitive grouping via Spark 4 collation: the group key is a
    // UTF8_LCASE-collated column (equality/hashing honor the collation
    // natively — no lower() rewrite in the plan), while min/countDistinct
    // aggregate the raw binary column so the output representative is
    // deterministic. Oracle mirrors with GROUP BY lower(k), binary MIN.
    QueryDef.sql(
      "q89_collate",
      """WITH m AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
        |         WHEN c_custkey % 3 = 1 THEN c_mktsegment
        |         ELSE upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
        |    END AS k
        |  FROM customer)
        |SELECT min(k) AS segment, COUNT(*) AS cnt, COUNT(DISTINCT k) AS n_variants
        |FROM m GROUP BY lower(k) ORDER BY segment""".stripMargin) { (s, dir) =>
      Tables(s, dir).customer
        .select(
          when(col("c_custkey") % 3 === 0, lower(col("c_mktsegment")))
            .when(col("c_custkey") % 3 === 1, col("c_mktsegment"))
            .otherwise(initcap(lower(col("c_mktsegment")))).as("k"))
        .groupBy(expr("collate(k, 'UTF8_LCASE')").as("kc"))
        .agg(min(col("k")).as("segment"), count(lit(1)).as("cnt"),
          countDistinct(col("k")).as("n_variants"))
        .select("segment", "cnt", "n_variants")
        .orderBy("segment")
    },

    // Paragraph-granularity exact dedup: documents are chunked into
    // fixed-width word windows ("paragraphs"), exploded, and counted
    // globally — the repeated-boilerplate screen that runs before
    // document-level dedup in a corpus pipeline. Chunking stays in-row
    // (transform over sequence, no join); the only shuffle is the final
    // count aggregate, map-side combined. Explicit repartition spreads the
    // explode fan-out before AQE can coalesce the tiny input to one task.
    QueryDef.sql(
      "q90_paragraph_dedup",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT doc_id,
        |    unnest([array_to_string(ws[i*3+1 : i*3+3], ' ')
        |            for i in generate_series(0, (len(ws)-1)//3)]) AS para
        |  FROM w)
        |SELECT para, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
        |FROM p WHERE len(para) > 0
        |GROUP BY para ORDER BY cnt DESC, para LIMIT 20""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .repartition(32, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, CAST((size(ws)-1) div 3 AS INT))," +
            " i -> array_join(slice(ws, i*3+1, 3), ' '))")).as("para"))
        .where(length(col("para")) > 0)
        .groupBy("para")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("cnt").desc, col("para"))
        .limit(20)
    },

    // Eval-set contamination screen: probe = a 40-char window of each
    // held-out doc's normalized text; a training doc is contaminated if it
    // contains any probe verbatim (the n-gram-overlap decontamination rule,
    // exact-match form). The eval side is tiny by construction, so it
    // broadcasts and the corpus is scanned once — a substring screen over
    // 100 TB is one map stage, never a join shuffle. Corpus = the near-dup
    // fixture, so every probe hits its source doc and (modulo the clone's
    // trimmed leading space) its truncated clone.
    QueryDef.sql(
      "q91_contamination",
      s"""WITH docs AS (${TextQueries.nearDupSql}),
         |corpus AS (SELECT doc_id, $normSql AS nt FROM docs),
         |ev AS (SELECT doc_id AS eval_id, substr($normSql, 21, 40) AS probe
         |       FROM documents WHERE doc_id % 29 = 0)
         |SELECT eval_id, doc_id
         |FROM corpus, ev
         |WHERE len(probe) >= 20 AND position(probe IN nt) > 0
         |ORDER BY eval_id, doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val corpus = TextQueries.nearDupDocs(docs)
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("nt"))
      val evalSet = docs
        .select(col("doc_id").as("eval_id"),
          substring(TextFunctions.normText(col("text")), 21, 40).as("probe"))
        .where(col("eval_id") % 29 === 0 && length(col("probe")) >= 20)
      corpus.join(broadcast(evalSet), instr(col("nt"), col("probe")) > 0)
        .select("eval_id", "doc_id")
        .orderBy("eval_id", "doc_id")
    },

    // URL/domain profiling: extract every URL's host with one regex pass
    // (deterministically seeded — the synthetic corpus has no natural
    // URLs), explode, and count by domain. Map-only until the final
    // combined count; the standard provenance screen before per-domain
    // quality rules.
    QueryDef.sql(
      "q92_url_domains",
      """WITH seeded AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      text || ' see https://sub' || (doc_id % 5)::VARCHAR ||
        |      '.example' || (doc_id % 3)::VARCHAR || '.com/p/' || doc_id::VARCHAR || ' ok'
        |    ELSE text END AS t
        |  FROM documents),
        |u AS (SELECT unnest(regexp_extract_all(t, 'https?://([^/ ]+)', 1)) AS domain
        |      FROM seeded)
        |SELECT domain, COUNT(*) AS cnt
        |FROM u GROUP BY domain ORDER BY cnt DESC, domain""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" see https://sub"), (col("doc_id") % 5).cast("string"),
              lit(".example"), (col("doc_id") % 3).cast("string"),
              lit(".com/p/"), col("doc_id").cast("string"), lit(" ok")))
            .otherwise(col("text")).as("t"))
        .select(explode(expr("regexp_extract_all(t, 'https?://([^/ ]+)', 1)")).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("domain"))
    })
}

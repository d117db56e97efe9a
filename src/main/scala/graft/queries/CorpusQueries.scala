package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.TextFunctions._
import graft.operators.{Ranks, Similarity}

/** Corpus-statistics operators a training-data pipeline runs between
  * hygiene and training: TF-IDF term weighting, bigram-LM fluency
  * scoring (the KenLM-perplexity-filter shape with engine-portable
  * integer arithmetic), context-window sequence packing via distributed
  * prefix sums, and SemDeDup-style semantic dedup over IVF cells.
  *
  * Determinism conventions: every "probability"/"weight" is an exact
  * integer — `(10^k · num) div den` integer division instead of floats
  * or ln() (whose last-ulp rounding is not guaranteed to agree across
  * engines); counts stay BIGINT end to end.
  */
object CorpusQueries {

  /** SQL twin of TextFunctions.normText. */
  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  val all: Seq[QueryDef] = Seq(

    // TF-IDF: term frequency per (doc, term), document frequency per term
    // over the FULL corpus, idf as integer-division scaling, and each
    // sampled doc's top term by tf·idf (ties broken lexicographically).
    // Scale shape: df(term) is a map-side-combined count over the distinct
    // (doc, term) pairs; only the scored sample joins against it; the
    // argmax is a per-doc window (partitioned — never a global sort).
    QueryDef.sql(
      "q93_tfidf",
      s"""WITH nrm AS (SELECT doc_id, $normSql AS nt FROM documents),
         |tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM nrm),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE len(term) > 0 GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS dft FROM tf GROUP BY term),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |sc AS (SELECT t.doc_id, t.term, t.tf, d.dft,
         |         t.tf * ((1000000 * n.n) // d.dft) AS tfidf
         |       FROM tf t JOIN dfreq d USING (term), n
         |       WHERE t.doc_id % 25 = 0)
         |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(dft AS BIGINT) AS dft,
         |       CAST(tfidf AS BIGINT) AS tfidf
         |FROM sc
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) = 1
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val n = docs.count() // corpus size: parts-free driver metadata
      // tf feeds BOTH the document-frequency aggregate and the scored
      // join — cache it so the corpus is tokenized once, not twice.
      val tf = docs
        .select(col("doc_id"), explode(tokens(normText(col("text")))).as("term"))
        .where(length(col("term")) > 0)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .cache()
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dft"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
      tf.where(col("doc_id") % 25 === 0)
        .join(dfreq, Seq("term"))
        .withColumn("tfidf", col("tf") * expr(s"${1000000L * n}L div dft"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select("doc_id", "term", "tf", "dft", "tfidf")
        .orderBy("doc_id")
    },

    // Bigram-LM fluency scoring — the perplexity-filter shape: train
    // bigram/unigram counts on the whole corpus (two map-side-combined
    // aggregates), score each sampled doc by the mean scaled conditional
    // probability (10^6·c2(w1 w2)) div c1(w1) of its bigrams. Integer
    // division replaces log-prob sums so any engine reproduces the exact
    // score; the LM tables join on their natural keys (shuffle joins —
    // the vocabulary of a 100 TB corpus does not broadcast).
    QueryDef.sql(
      "q94_bigram_lm",
      s"""WITH nrm AS (SELECT doc_id, $normSql AS nt FROM documents),
         |t AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM nrm),
         |bgl AS (SELECT doc_id,
         |          unnest([tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk) - 1)]) AS bigram
         |        FROM t),
         |bg AS (SELECT doc_id, string_split(bigram, ' ')[1] AS w1, bigram FROM bgl),
         |unl AS (SELECT unnest(tk) AS w FROM t),
         |uni AS (SELECT w, COUNT(*) AS c1 FROM unl GROUP BY w),
         |lm AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
         |sc AS (SELECT b.doc_id, (1000000 * lm.c2) // uni.c1 AS p
         |       FROM bg b JOIN lm USING (bigram) JOIN uni ON uni.w = b.w1
         |       WHERE b.doc_id % 25 = 0)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       CAST(SUM(p) // COUNT(*) AS BIGINT) AS avg_p_scaled
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Normalize+tokenize is the expensive pass (regex over every doc):
      // cache the token arrays so the three consumers (bigram extraction
      // ×2 and the unigram LM) read the cached relation instead of
      // re-scanning + re-tokenizing the corpus — one tokenize pass total.
      // The bigram relation is cached too: it feeds both the LM count
      // aggregate and the scored join.
      val tk = Tables(s, dir).documents
        .select(col("doc_id"), tokens(normText(col("text"))).as("tk"))
        .cache()
      val bg = tk.select(col("doc_id"), explode(expr(
          "zip_with(slice(tk, 1, size(tk)-1), slice(tk, 2, size(tk)-1)," +
            " (x, y) -> struct(x AS w1, concat(x, ' ', y) AS bigram))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.bigram").as("bigram"))
        .cache()
      val uni = tk.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val lm = bg.groupBy("bigram").agg(count(lit(1)).as("c2"))
      bg.where(col("doc_id") % 25 === 0)
        .join(lm, Seq("bigram"))
        .join(uni, col("w") === col("w1"))
        .select(col("doc_id"), expr("(1000000L * c2) div c1").as("p"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p) div count(1)").as("avg_p_scaled"))
        .orderBy("doc_id")
    },

    // Context-window sequence packing: documents are laid into 2048-token
    // bins by cumulative token count in doc_id order — the distributed
    // prefix sum (Ranks.withRunningTotal: range repartition + per-
    // partition offsets) replaces the single-task global window, so
    // packing scales out; bins close within ±1 doc of the exact greedy
    // boundary, which is the standard distributed-packing contract.
    QueryDef.sql(
      "q95_seq_packing",
      s"""WITH nrm AS (SELECT doc_id, $normSql AS nt FROM documents),
         |tk AS (SELECT doc_id, len(string_split(nt, ' ')) AS n_tok FROM nrm),
         |cum AS (SELECT doc_id, n_tok,
         |    SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM tk),
         |b AS (SELECT doc_id, n_tok, CAST((c - n_tok) // 2048 AS BIGINT) AS bin FROM cum)
         |SELECT bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      val nTok = Tables(s, dir).documents
        .select(col("doc_id"), size(tokens(normText(col("text")))).cast("long").as("n_tok"))
      Ranks.withRunningTotal(nTok, Seq("doc_id"), col("n_tok"), "c")
        .select(col("doc_id"), col("n_tok"),
          expr("(c - n_tok) div 2048").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("bin")
    },

    // Incremental SemDeDup — the vector admission DECISION for continuous
    // ingestion: a shard vector is removed iff some smaller-id cell-mate
    // (index vector or earlier shard member) clears the cosine
    // threshold; exactly semDedup(index ∪ shard) restricted to shard
    // ids, which the oracle computes literally. Cells come from the
    // index's centroids (the persisted map at scale — shard ids avoid
    // the centroid residue so the union's centroid set IS the index's);
    // index×index is never re-paired. Fixture: verbatim clones of every
    // 37th vector (+100000 — guaranteed removals, their source shares
    // the cell at cosine 10⁶) plus element-REVERSED copies of every
    // 17≡3 vector (+200000 — genuinely new content, mostly admitted).
    QueryDef.sql(
      "q606_incremental_semdedup",
      s"""WITH em AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, embedding FROM embeddings
         |  WHERE vec_id % 37 = 0 AND vec_id % 25 <> 0
         |  UNION ALL
         |  SELECT vec_id + 200000, list_reverse(embedding) FROM embeddings
         |  WHERE vec_id % 17 = 3 AND vec_id % 25 <> 0),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb FROM em WHERE vec_id % 25 = 0),
         |pe AS (SELECT e.vec_id, c.cid, i,
         |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(c.cemb[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM em e, cent c, generate_series(1, 64) t(i)),
         |pd AS (SELECT vec_id, cid, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |       FROM pe GROUP BY vec_id, cid),
         |pc AS (SELECT vec_id, cid,
         |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |      (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS ccos
         |  FROM pd),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
         |    FROM pc) WHERE rn = 1),
         |pr AS (SELECT a.vec_id AS v1, b.vec_id AS v2
         |       FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |       WHERE b.vec_id >= 100000),
         |pp AS (SELECT pr.v1, pr.v2, i,
         |    CAST(FLOOR(CAST(e1.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(e2.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM pr JOIN em e1 ON e1.vec_id = pr.v1 JOIN em e2 ON e2.vec_id = pr.v2,
         |       generate_series(1, 64) t(i)),
         |pdd AS (SELECT v1, v2, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |        FROM pp GROUP BY v1, v2),
         |rm AS (SELECT DISTINCT v2 AS vec_id FROM pdd
         |       WHERE CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |         (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) >= 990000)
         |SELECT a.vec_id, a.cell, (rm.vec_id IS NOT NULL) AS removed
         |FROM asg a LEFT JOIN rm ON a.vec_id = rm.vec_id
         |WHERE a.vec_id >= 100000 ORDER BY a.vec_id""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings.select("vec_id", "embedding")
      val shard = e.where(col("vec_id") % 37 === 0 && col("vec_id") % 25 =!= 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
        .unionAll(e.where(col("vec_id") % 17 === 3 && col("vec_id") % 25 =!= 0)
          .select((col("vec_id") + 200000).as("vec_id"),
            reverse(col("embedding")).as("embedding")))
        .localCheckpoint()
      Similarity.semDedupIncremental(e, shard, 25, 990000L)
        .orderBy("vec_id")
    },

    // SemDeDup hot-cell cap, value-checked end-to-end (the q603 recipe on
    // the REMOVAL decision): 300 clones of vector 0 (ids ≡ 1 mod 25 —
    // never centroids) crowd vec 0's cell far past cap 100, so members
    // there verify against the cell's 100 smallest-id PREFIX (cap·|cell|
    // work) instead of all smaller-id mates (|cell|²); every natural
    // cell (≤ ~75 members) keeps the exact rule. The prefix holds all
    // natural members — every clone still matches its source and is
    // removed. The oracle recomputes the identical bounded-prefix
    // decision (ROW_NUMBER ≤ cap per cell) from raw embeddings.
    QueryDef.sql(
      "q608_semdedup_capped",
      s"""WITH em AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT 200001 + 25 * i AS vec_id, e.embedding
         |  FROM embeddings e, generate_series(0, 299) t(i) WHERE e.vec_id = 0),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb FROM em WHERE vec_id % 25 = 0),
         |pe AS (SELECT e.vec_id, c.cid, i,
         |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(c.cemb[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM em e, cent c, generate_series(1, 64) t(i)),
         |pd AS (SELECT vec_id, cid, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |       FROM pe GROUP BY vec_id, cid),
         |pc AS (SELECT vec_id, cid,
         |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |      (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS ccos
         |  FROM pd),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
         |    FROM pc) WHERE rn = 1),
         |pfx AS (SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS pr
         |    FROM asg) WHERE pr <= 100),
         |pr AS (SELECT a.vec_id AS v1, b.vec_id AS v2
         |       FROM pfx a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |pp AS (SELECT pr.v1, pr.v2, i,
         |    CAST(FLOOR(CAST(e1.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(e2.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM pr JOIN em e1 ON e1.vec_id = pr.v1 JOIN em e2 ON e2.vec_id = pr.v2,
         |       generate_series(1, 64) t(i)),
         |pdd AS (SELECT v1, v2, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |        FROM pp GROUP BY v1, v2),
         |rm AS (SELECT DISTINCT v2 AS vec_id FROM pdd
         |       WHERE CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |         (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) >= 990000)
         |SELECT a.cell, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN rm.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
         |FROM asg a LEFT JOIN rm ON a.vec_id = rm.vec_id
         |GROUP BY a.cell ORDER BY a.cell""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings.select("vec_id", "embedding")
      val clones = s.range(300)
        .crossJoin(broadcast(e.where(col("vec_id") === 0)
          .select(col("embedding").as("cemb0"))))
        .select((lit(200001L) + col("id") * 25).as("vec_id"),
          col("cemb0").as("embedding"))
      Similarity.semDedup(e.unionAll(clones), 25, 990000L, maxCell = Some(100))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"))
        .orderBy("cell")
    },

    // The vector-side ingestion loop as ONE oracle-checked query (q605's
    // vector twin): shard → CAPPED semantic admission (semDedupIncremental
    // with the bounded-prefix valve — the planted 300-clone block crowds
    // vec 0's cell past cap 100) → survivors APPEND to the persisted
    // (vec_id, cell) index against frozen centroids (ivfIndexAppend) →
    // per-cell ingestion report, with n_after read from the APPENDED
    // relation. Every cross-vector step follows |shard|: cells come from
    // the index's centroid metadata, index×index never re-pairs, the hot
    // cell does cap·|cell| work. The oracle replays the loop relationally
    // — assignment, bounded prefix, admission threshold, append counts.
    QueryDef.sql(
      "q610_vector_pipeline",
      s"""WITH em AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, embedding FROM embeddings
         |  WHERE vec_id % 37 = 0 AND vec_id % 25 <> 0
         |  UNION ALL
         |  SELECT vec_id + 200000, list_reverse(embedding) FROM embeddings
         |  WHERE vec_id % 17 = 3 AND vec_id % 25 <> 0
         |  UNION ALL
         |  SELECT 300001 + 25 * i AS vec_id, e.embedding
         |  FROM embeddings e, generate_series(0, 299) t(i) WHERE e.vec_id = 0),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb FROM em WHERE vec_id % 25 = 0),
         |pe AS (SELECT e.vec_id, c.cid, i,
         |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(c.cemb[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM em e, cent c, generate_series(1, 64) t(i)),
         |pd AS (SELECT vec_id, cid, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |       FROM pe GROUP BY vec_id, cid),
         |pc AS (SELECT vec_id, cid,
         |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |      (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS ccos
         |  FROM pd),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
         |    FROM pc) WHERE rn = 1),
         |pfx AS (SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS pr
         |    FROM asg) WHERE pr <= 100),
         |pr AS (SELECT a.vec_id AS v1, b.vec_id AS v2
         |       FROM pfx a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |       WHERE b.vec_id >= 100000),
         |pp AS (SELECT pr.v1, pr.v2, i,
         |    CAST(FLOOR(CAST(e1.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(e2.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM pr JOIN em e1 ON e1.vec_id = pr.v1 JOIN em e2 ON e2.vec_id = pr.v2,
         |       generate_series(1, 64) t(i)),
         |pdd AS (SELECT v1, v2, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |        FROM pp GROUP BY v1, v2),
         |rm AS (SELECT DISTINCT v2 AS vec_id FROM pdd
         |       WHERE CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |         (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) >= 990000)
         |SELECT a.cell,
         |  CAST(SUM(CASE WHEN a.vec_id < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_index,
         |  CAST(SUM(CASE WHEN a.vec_id >= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_shard,
         |  CAST(SUM(CASE WHEN a.vec_id >= 100000 AND rm.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
         |  CAST(SUM(CASE WHEN a.vec_id < 100000 OR rm.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_after
         |FROM asg a LEFT JOIN rm ON a.vec_id = rm.vec_id
         |GROUP BY a.cell ORDER BY a.cell""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings.select("vec_id", "embedding")
      val shard = e.where(col("vec_id") % 37 === 0 && col("vec_id") % 25 =!= 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
        .unionAll(e.where(col("vec_id") % 17 === 3 && col("vec_id") % 25 =!= 0)
          .select((col("vec_id") + 200000).as("vec_id"),
            reverse(col("embedding")).as("embedding")))
        .unionAll(s.range(300)
          .crossJoin(broadcast(e.where(col("vec_id") === 0)
            .select(col("embedding").as("cemb0"))))
          .select((lit(300001L) + col("id") * 25).as("vec_id"),
            col("cemb0").as("embedding")))
        .localCheckpoint()
      // the persisted index state: centroid metadata + (vec_id, cell) map
      // — scored ONCE (r10): the admission decision and the maintenance
      // append both read this relation instead of each re-running the
      // corpus × centroids assignment pass
      val cents = Similarity.ivfCentroids(e, 25)
      val idxMap = Similarity.ivfIndex(e, cents, 1)
      // CAPPED admission decision for the whole shard
      val dec = Similarity.semDedupIncrementalIndexed(idxMap, cents, e,
        shard, 990000L, maxCell = Some(100)).localCheckpoint(true)
      // survivors APPEND to the index against the frozen centroids
      val survivors = shard.join(dec.where(!col("removed")).select("vec_id"),
        Seq("vec_id"), "left_semi")
      val appended = Similarity.ivfIndexAppend(idxMap, cents, survivors, 1)
      // ingestion report: n_after comes from the APPENDED relation — the
      // maintenance leg is value-checked, not assumed
      val idxCnt = idxMap.groupBy("cell").agg(count(lit(1)).as("n_index"))
      val shdCnt = dec.groupBy("cell").agg(count(lit(1)).as("n_shard"),
        sum(when(!col("removed"), 1L).otherwise(0L)).as("n_admitted"))
      val after = appended.groupBy("cell").agg(count(lit(1)).as("n_after"))
      idxCnt.join(shdCnt, Seq("cell"), "full_outer")
        .join(after, Seq("cell"), "full_outer")
        .select(col("cell"),
          coalesce(col("n_index"), lit(0L)).as("n_index"),
          coalesce(col("n_shard"), lit(0L)).as("n_shard"),
          coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .orderBy("cell")
    },

    // Cluster-balanced diversity sampling — the quota complement of
    // SemDeDup: keep the 8 smallest-id members of every IVF cell so no
    // crowded embedding region dominates the sample (deterministic
    // id-prefix quota, no RNG). The planted 300-clone block crowds
    // vec 0's cell, and the quota keeps exactly 8 of its members while
    // sparse cells keep everything. One bounded-heap top-k-per-group
    // pass after the assignment projection — no self-join anywhere.
    // Output: per-cell kept count + kept-id bounds, value-checked.
    QueryDef.sql(
      "q614_cluster_sample",
      s"""WITH em AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT 200001 + 25 * i AS vec_id, e.embedding
         |  FROM embeddings e, generate_series(0, 299) t(i) WHERE e.vec_id = 0),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb FROM em WHERE vec_id % 25 = 0),
         |pe AS (SELECT e.vec_id, c.cid, i,
         |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(c.cemb[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM em e, cent c, generate_series(1, 64) t(i)),
         |pd AS (SELECT vec_id, cid, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |       FROM pe GROUP BY vec_id, cid),
         |pc AS (SELECT vec_id, cid,
         |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |      (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS ccos
         |  FROM pd),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
         |    FROM pc) WHERE rn = 1),
         |kept AS (SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS pr
         |    FROM asg) WHERE pr <= 8)
         |SELECT cell, COUNT(*) AS n_kept, MIN(vec_id) AS first_id, MAX(vec_id) AS last_id
         |FROM kept GROUP BY cell ORDER BY cell""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings.select("vec_id", "embedding")
      val clones = s.range(300)
        .crossJoin(broadcast(e.where(col("vec_id") === 0)
          .select(col("embedding").as("cemb0"))))
        .select((lit(200001L) + col("id") * 25).as("vec_id"),
          col("cemb0").as("embedding"))
      Similarity.clusterSample(e.unionAll(clones), 25, 8)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_kept"), min("vec_id").as("first_id"),
          max("vec_id").as("last_id"))
        .orderBy("cell")
    },

    // SemDeDup: IVF-cell clustering (deterministic centroids, every 25th
    // vector) + within-cell cosine threshold — a vector is removed iff a
    // smaller-id cell-mate is ≥ 0.99 cosine-similar. The dup fixture
    // re-appends every 37th vector, so each clone lands in its source's
    // cell and is pruned; pair cost is Σ|cell|², never corpus².
    QueryDef.sql(
      "q96_semdedup",
      s"""WITH em AS (SELECT vec_id, embedding FROM embeddings
         |       UNION ALL
         |       SELECT vec_id + 100000 AS vec_id, embedding
         |       FROM embeddings WHERE vec_id % 37 = 0),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb FROM em WHERE vec_id % 25 = 0),
         |pe AS (SELECT e.vec_id, c.cid, i,
         |    CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(c.cemb[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM em e, cent c, generate_series(1, 64) t(i)),
         |pd AS (SELECT vec_id, cid, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |       FROM pe GROUP BY vec_id, cid),
         |pc AS (SELECT vec_id, cid,
         |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |      (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) AS ccos
         |  FROM pd),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
         |    FROM pc) WHERE rn = 1),
         |pr AS (SELECT a.vec_id AS v1, b.vec_id AS v2, a.cell
         |       FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |pp AS (SELECT pr.v1, pr.v2, i,
         |    CAST(FLOOR(CAST(e1.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         |    CAST(FLOOR(CAST(e2.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
         |  FROM pr JOIN em e1 ON e1.vec_id = pr.v1 JOIN em e2 ON e2.vec_id = pr.v2,
         |       generate_series(1, 64) t(i)),
         |pdd AS (SELECT v1, v2, SUM(x*y) AS dxy, SUM(x*x) AS dxx, SUM(y*y) AS dyy
         |        FROM pp GROUP BY v1, v2),
         |rm AS (SELECT DISTINCT v2 AS vec_id FROM pdd
         |       WHERE CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE) /
         |         (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT) >= 990000)
         |SELECT a.cell, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN rm.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
         |FROM asg a LEFT JOIN rm ON a.vec_id = rm.vec_id
         |GROUP BY a.cell ORDER BY a.cell""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val dup = e.select("vec_id", "embedding").unionAll(
        e.where(col("vec_id") % 37 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.semDedup(dup, 25, 990000L)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"))
        .orderBy("cell")
    },

    // Inverted-index construction: term → sorted posting list of the docs
    // containing it (the search-index build step). Distinct (doc, term)
    // pairs collapse map-side; posting lists materialize as in-row sorted
    // arrays per term — state per reducer is one term's postings, and the
    // emitted index row is the '|'-joined rendering (portable to any
    // engine's hash compare). Top 30 terms by document frequency.
    QueryDef.sql(
      "q102_inverted_index",
      s"""WITH nrm AS (SELECT doc_id, $normSql AS nt FROM documents),
         |tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM nrm),
         |dt AS (SELECT DISTINCT doc_id, term FROM tok WHERE len(term) > 0),
         |idx AS (SELECT term, COUNT(*) AS df,
         |          array_to_string(list(doc_id ORDER BY doc_id), '|') AS postings
         |        FROM dt GROUP BY term)
         |SELECT term, CAST(df AS BIGINT) AS df, postings
         |FROM idx ORDER BY df DESC, term LIMIT 30""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), explode(tokens(normText(col("text")))).as("term"))
        .where(length(col("term")) > 0)
        .distinct()
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          array_join(sort_array(collect_list(col("doc_id"))), "|").as("postings"))
        .orderBy(col("df").desc, col("term"))
        .limit(30)
    },

    // Term co-occurrence (market-basket shape): among terms appearing in
    // ≥ 8 documents, count document-level pair co-occurrences. The
    // frequent-term screen is a broadcast semi-join that prunes the pair
    // blow-up BEFORE the doc-level self-join — pair cost follows
    // Σ(frequent terms per doc)², the FP-growth-style bound, not vocab².
    QueryDef.sql(
      "q103_cooccurrence",
      s"""WITH nrm AS (SELECT doc_id, $normSql AS nt FROM documents),
         |tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM nrm),
         |dt AS (SELECT DISTINCT doc_id, term FROM tok WHERE len(term) > 0),
         |freq AS (SELECT term FROM dt GROUP BY term HAVING COUNT(*) >= 8),
         |fdt AS (SELECT doc_id, term FROM dt JOIN freq USING (term)),
         |pairs AS (SELECT a.term AS t1, b.term AS t2
         |          FROM fdt a JOIN fdt b ON a.doc_id = b.doc_id AND a.term < b.term)
         |SELECT t1, t2, COUNT(*) AS n_docs
         |FROM pairs GROUP BY t1, t2 ORDER BY n_docs DESC, t1, t2 LIMIT 40""".stripMargin) { (s, dir) =>
      val dt = Tables(s, dir).documents
        .select(col("doc_id"), explode(tokens(normText(col("text")))).as("term"))
        .where(length(col("term")) > 0)
        .distinct()
      val freq = dt.groupBy("term").agg(count(lit(1)).as("__df"))
        .where(col("__df") >= 8).select("term")
      // Pair generation happens IN-ROW over each doc's sorted frequent-term
      // set (a two-level HOF) instead of a doc-level self-join — the
      // (doc, term) subtree is shuffled once into collect_set rather than
      // evaluated twice as the join's two legs. Output identical: the
      // sorted set enforces t1 < t2 and distinctness.
      val fdocs = dt.join(broadcast(freq), Seq("term"), "left_semi")
        .groupBy("doc_id").agg(sort_array(collect_set(col("term"))).as("ts"))
        .where(size(col("ts")) >= 2)
      fdocs
        .select(explode(expr(
          "flatten(transform(ts, (x, i) -> transform(slice(ts, i + 2, size(ts)), y -> struct(x AS t1, y AS t2))))"))
          .as("p"))
        .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("t1"), col("t2"))
        .limit(40)
    })
}

package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.Graphs

/** Training-data pipeline depth: cross-set n-gram decontamination,
  * content-defined chunking, graph structure mining (triangles, BFS),
  * deterministic pseudonymization, and temperature-scaled mixture
  * weights. All randomness-free: selection and hashing go through the
  * portable md5-derived hash (both engines rebuild it bit-for-bit), and
  * every ratio is scaled-integer division.
  */
object TrainingQueries {

  /** Portable md5-derived 32-bit hash of a string column (see Dedup):
    * first 8 hex chars of md5 as a BIGINT. DuckDB twin:
    * ('0x' || substr(md5(x), 1, 8))::BIGINT.
    */
  private def phash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The co-order part graph: parts appearing together in ≥2 orders.
    * Self-equi-join on the order key (cost follows lines-per-order, never
    * |lineitem|²), count-filtered so the edge set stays sparse at every
    * SF.
    */
  private def partEdges(t: Tables) = {
    val li = t.lineitem.select("l_orderkey", "l_partkey")
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("u"))
    val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("v"))
    a.join(b, col("ok") === col("ok2") && col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select("u", "v")
  }

  private val partEdgesSql =
    """p AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // Eval-set decontamination by 5-word n-gram overlap (the Dolma/Lee
    // et al. recipe, distinct from q91's substring probe): the eval split
    // (doc_id % 97) contributes its distinct grams, the train side joins
    // on the gram — a hash equi-join that scales to any eval-set size
    // (q91's broadcast probe caps at driver memory). Gram generation is
    // an in-row HOF (transform over a sequence), no cross join.
    // Production hashes the grams; the oracle-checked form joins the gram
    // text so both engines build identical keys.
    QueryDef.sql(
      "q157_ngram_decontaminate",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, array_to_string(ws[CAST(i AS BIGINT):CAST(i+4 AS BIGINT)], ' ') AS gram
        |      FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        |tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 97 <> 0)
        |SELECT tr.doc_id, COUNT(*) AS n_shared_grams
        |FROM tr JOIN ev ON tr.gram = ev.gram
        |GROUP BY tr.doc_id ORDER BY n_shared_grams DESC, doc_id LIMIT 50""".stripMargin) { (s, dir) =>
      val g = Tables(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 5)
        .select(col("doc_id"),
          explode(expr("transform(sequence(1, size(ws) - 4), i -> array_join(slice(ws, i, 5), ' '))"))
            .as("gram"))
      val ev = g.where(col("doc_id") % 97 === 0).select("gram").distinct()
      val tr = g.where(col("doc_id") % 97 =!= 0).distinct()
      tr.join(ev, "gram")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
        .orderBy(col("n_shared_grams").desc, col("doc_id"))
        .limit(50)
    },

    // Content-defined chunking (rolling-boundary document splitting): a
    // word is a chunk boundary when its portable hash ≡ 0 (mod 16), so
    // boundaries depend only on local content — insertions shift bytes
    // but not distant boundaries (the CDC property backup/dedup systems
    // rely on). chunk_id is a running boundary count (window sum over the
    // PRECEDING frame); two hash aggregations produce per-doc chunk
    // stats. Everything partitions by doc_id — embarrassingly parallel.
    QueryDef.sql(
      "q158_cdc_chunking",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id % 7 = 0),
        |t AS (SELECT doc_id, i, CASE WHEN ('0x' || substr(md5(ws[CAST(i AS BIGINT)]), 1, 8))::BIGINT % 16 = 0
        |        THEN 1 ELSE 0 END AS brk
        |      FROM d, UNNEST(generate_series(1, len(ws))) AS u(i)),
        |k AS (SELECT doc_id, i,
        |        COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |      FROM t),
        |sz AS (SELECT doc_id, chunk_id, COUNT(*) AS n FROM k GROUP BY 1, 2)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(MAX(n) AS BIGINT) AS max_chunk_words,
        |  CAST(SUM(n) AS BIGINT) AS n_words
        |FROM sz GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir).documents
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"),
          when(phash(col("col")) % 16 === 0, 1L).otherwise(0L).as("brk"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.select(col("doc_id"),
          coalesce(sum(col("brk")).over(w), lit(0L)).as("chunk_id"))
        .groupBy("doc_id", "chunk_id").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"), max("n").as("max_chunk_words"),
          sum("n").as("n_words"))
        .orderBy("doc_id")
    },

    // Triangle counting over the co-order part graph — the closed-triplet
    // join: e(u,v) ⋈ e(v,w) ⋈ e(u,w) with u<v<w canonical orientation, so
    // each triangle counts exactly once and the join never materializes a
    // direction-squared blowup. The weight-≥2 screen keeps the edge set
    // sparse (probed: ~2.5-4k edges at every fixture SF); at 100 TB the
    // same screen is the standard degeneracy cut before triangle joins.
    QueryDef.sql(
      "q159_triangles",
      s"""WITH $partEdgesSql
         |SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_edges,
         |  CAST((SELECT COUNT(*) FROM p e1
         |        JOIN p e2 ON e1.v = e2.u
         |        JOIN p e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT) AS n_triangles""".stripMargin) { (s, dir) =>
      // r11 (measured): the WHOLE q159 floor is the partEdges derivation
      // (lineitem self-join + groupBy, 2.1 s at sf0.1; the wedge joins
      // over the ~3.9k screened edges add nothing) — and the lazy edge
      // plan re-embedded under every reference paid the final aggregate
      // per branch. Materialize the sparse screened edge list ONCE; the
      // count and the (degree-oriented) triangle count read it back.
      val e = partEdges(Tables(s, dir)).localCheckpoint(true)
      val cnt = e.agg(count(lit(1)).as("n_edges"))
      cnt.crossJoin(broadcast(Graphs.triangleCount(e)))
        .select(col("n_edges"), col("n_triangles"))
    },

    // Bounded-depth BFS over the same graph (symmetrized), rooted at the
    // minimum part key: per-hop frontier sizes for hops 0-3. Each
    // superstep is join + distinct + anti-join — cost follows the
    // frontier. The oracle unrolls the same three expansions with NOT IN
    // screens.
    QueryDef.sql(
      "q160_bfs_frontiers",
      s"""WITH $partEdgesSql,
         |e AS MATERIALIZED (SELECT u, v FROM p UNION SELECT v, u FROM p),
         |d0 AS MATERIALIZED (SELECT MIN(u) AS n FROM e),
         |d1 AS MATERIALIZED (SELECT DISTINCT e.v AS n FROM e JOIN d0 ON e.u = d0.n
         |      WHERE e.v NOT IN (SELECT n FROM d0)),
         |d2 AS MATERIALIZED (SELECT DISTINCT e.v AS n FROM e JOIN d1 ON e.u = d1.n
         |      WHERE e.v NOT IN (SELECT n FROM d0 UNION SELECT n FROM d1)),
         |d3 AS MATERIALIZED (SELECT DISTINCT e.v AS n FROM e JOIN d2 ON e.u = d2.n
         |      WHERE e.v NOT IN (SELECT n FROM d0 UNION SELECT n FROM d1 UNION SELECT n FROM d2))
         |SELECT hop, n_nodes FROM (
         |  SELECT CAST(0 AS BIGINT) AS hop, CAST((SELECT COUNT(*) FROM d0) AS BIGINT) AS n_nodes
         |  UNION ALL SELECT 1, (SELECT COUNT(*) FROM d1)
         |  UNION ALL SELECT 2, (SELECT COUNT(*) FROM d2)
         |  UNION ALL SELECT 3, (SELECT COUNT(*) FROM d3)) f
         |ORDER BY hop""".stripMargin) { (s, dir) =>
      val p = partEdges(Tables(s, dir))
      val sym = p.union(p.select(col("v").as("u"), col("u").as("v")))
        .select(col("u").as("src"), col("v").as("dst"))
      val sizes = Graphs.bfsHops(sym, maxHops = 3)
        .groupBy("hop").agg(count(lit(1)).as("n"))
      // Emit every hop level even when a frontier is empty (sparse-graph
      // SFs exhaust the component early) — matches the oracle's 0 rows.
      s.range(4).select(col("id").as("hop"))
        .join(sizes, Seq("hop"), "left_outer")
        .select(col("hop"), coalesce(col("n"), lit(0L)).as("n_nodes"))
        .orderBy("hop")
    },

    // Deterministic pseudonymization: salted-md5 token per customer name,
    // a pure projection (re-running it on any engine or any day yields
    // the same token — referential integrity across pseudonymized tables
    // is preserved for free). The collision audit rides along as a
    // broadcast one-row aggregate: distinct names must equal distinct
    // tokens.
    QueryDef.sql(
      "q161_pseudonymize",
      """WITH m AS (SELECT c_custkey,
        |    'user_' || substr(md5(c_name || ':salt42'), 1, 12) AS pseudo
        |  FROM customer),
        |chk AS (SELECT CAST(COUNT(DISTINCT c_custkey) - COUNT(DISTINCT pseudo) AS BIGINT)
        |    AS n_collisions FROM m)
        |SELECT c_custkey, pseudo, n_collisions
        |FROM m CROSS JOIN chk WHERE c_custkey % 37 = 0
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val m = Tables(s, dir).customer
        .select(col("c_custkey"),
          concat(lit("user_"), substring(md5(concat(col("c_name"), lit(":salt42"))), 1, 12))
            .as("pseudo"))
      val chk = m.agg((countDistinct(col("c_custkey")) - countDistinct(col("pseudo")))
        .as("n_collisions"))
      m.crossJoin(broadcast(chk))
        .where(col("c_custkey") % 37 === 0)
        .select("c_custkey", "pseudo", "n_collisions")
        .orderBy("c_custkey")
    },

    // Temperature-scaled mixture weights (the multi-source sampling step
    // of corpus assembly): per-source sampling shares ∝ n^(1/2) — the
    // α = 0.5 temperature that upweights small sources. sqrt is
    // IEEE-exact in both engines; the weights floor-scale to BIGINT
    // before the ppm normalization, so shares and the 100k-doc budget
    // allocation are exact integer arithmetic end to end.
    QueryDef.sql(
      "q162_temperature_mix",
      """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        |s AS (SELECT source, n,
        |        CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS w FROM c),
        |t AS (SELECT SUM(w) AS tw FROM s)
        |SELECT source, CAST(n AS BIGINT) AS n_docs, w AS weight_scaled,
        |  CAST(w * 1000000 // tw AS BIGINT) AS share_ppm,
        |  CAST((w * 1000000 // tw) * 100000 // 1000000 AS BIGINT) AS budget_docs
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir).documents.groupBy("source").agg(count(lit(1)).as("n"))
      val sw = c.select(col("source"), col("n").as("n_docs"),
        floor(sqrt(col("n").cast("double")) * 1000).cast("long").as("weight_scaled"))
      val t = sw.agg(sum("weight_scaled").as("tw"))
      sw.crossJoin(broadcast(t))
        .select(col("source"), col("n_docs"), col("weight_scaled"),
          // decimal(38,0) numerator: weight ~ sqrt(n)·10³ stays small, but the
          // ×10⁶ product should match the oracle's HUGEINT exactly at any n
          expr("CAST(weight_scaled AS DECIMAL(38,0)) * 1000000 div tw").as("share_ppm"),
          expr("(CAST(weight_scaled AS DECIMAL(38,0)) * 1000000 div tw) * 100000L div 1000000L")
            .as("budget_docs"))
        .orderBy("source")
    },

    // Token-diversity screen via Gini impurity (1 − Σpᵢ²) per source —
    // the integer-exact cousin of Shannon entropy (whose log makes
    // cross-engine float drift unavoidable): gini_ppm =
    // (N² − Σnᵢ²)·10⁶ div N², all DECIMAL(38,0)/HUGEINT arithmetic. Low
    // values flag template/boilerplate-dominated sources. Two
    // map-side-combined aggregations, no joins.
    QueryDef.sql(
      "q169_gini_diversity",
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        |c AS (SELECT source, t, COUNT(*) AS n FROM tok WHERE len(t) > 0 GROUP BY 1, 2),
        |a AS (SELECT source, SUM(n) AS nn, SUM(n*n) AS s2,
        |        COUNT(*) AS n_distinct FROM c GROUP BY 1)
        |SELECT source, CAST(nn AS BIGINT) AS n_tokens,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CAST((nn*nn - s2) * 1000000 // (nn*nn) AS BIGINT) AS gini_ppm
        |FROM a ORDER BY source""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      Tables(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("t"))
        .where(length(col("t")) > 0)
        .groupBy("source", "t").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(sum(col("n").cast(dec)).as("nn"),
          // square AFTER the decimal cast: a stopword's count can exceed
          // sqrt(Long.MaxValue) at corpus scale, and Long n*n would wrap
          // silently in non-ANSI mode (DuckDB's SUM(n*n) promotes to
          // HUGEINT, so the engines would diverge exactly then)
          sum(col("n").cast(dec) * col("n").cast(dec)).as("s2"),
          count(lit(1)).as("n_distinct"))
        .select(col("source"), col("nn").cast("long").as("n_tokens"),
          col("n_distinct"),
          expr("CAST(((nn*nn - s2) * 1000000) div (nn*nn) AS BIGINT)").as("gini_ppm"))
        .orderBy("source")
    },

    // Incremental JOIN-view maintenance: the per-nation revenue view over
    // orders⋈customer is maintained from the base aggregate plus the
    // order DELTA joined to the (static) dim — ΔA⋈B — and merged by key.
    // The fact history is never rescanned: at 100 TB the daily increment
    // touches |Δ| rows, not |A∪Δ|. The oracle recomputes from scratch —
    // the IVM algebra must agree exactly (integer cents make the merge
    // associative).
    QueryDef.sql(
      "q170_join_ivm",
      """WITH f AS (
        |  SELECT n_name, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey  = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey)
        |SELECT n_name, COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS rev_cents
        |FROM f GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val cut = to_timestamp(lit("1999-01-01"))
      val dim = t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      def agg(orders: org.apache.spark.sql.DataFrame) = orders
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
      val base  = agg(t.orders.where(col("o_orderdate") < cut))   // materialized view
      val delta = agg(t.orders.where(col("o_orderdate") >= cut))  // today's increment
      base.select(col("n_name"), col("n_orders"), col("rev_cents"))
        .unionByName(delta)
        .groupBy("n_name")
        .agg(sum("n_orders").as("n_orders"), sum("rev_cents").as("rev_cents"))
        .orderBy("n_name")
    },

    // Cohort transition matrix (new / retained / churned): classify every
    // user by activity flags in two adjacent periods — ONE pass over
    // events builds both flags as conditional aggregates (no period
    // self-join, no set operations), then a tiny count per class. The
    // churn screen every growth dashboard runs; at 100 TB the cost is one
    // shuffle keyed on user.
    QueryDef.sql(
      "q176_churn_matrix",
      """WITH f AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN ts <  TIMESTAMP '2024-01-05' THEN 1 ELSE 0 END) AS in_a,
        |    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-30' THEN 1 ELSE 0 END) AS in_b
        |  FROM events GROUP BY user_id)
        |SELECT CASE WHEN in_a = 1 AND in_b = 1 THEN 'retained'
        |            WHEN in_a = 1 THEN 'churned'
        |            WHEN in_b = 1 THEN 'new' ELSE 'dormant' END AS cohort,
        |  COUNT(*) AS n_users
        |FROM f GROUP BY cohort ORDER BY cohort""".stripMargin) { (s, dir) =>
      val cutA = to_timestamp(lit("2024-01-05"))
      val cutB = to_timestamp(lit("2024-01-30"))
      Tables(s, dir).events
        .groupBy("user_id")
        .agg(max(when(col("ts") < cutA, 1).otherwise(0)).as("in_a"),
          max(when(col("ts") >= cutB, 1).otherwise(0)).as("in_b"))
        .select(when(col("in_a") === 1 && col("in_b") === 1, "retained")
          .when(col("in_a") === 1, "churned")
          .when(col("in_b") === 1, "new").otherwise("dormant").as("cohort"))
        .groupBy("cohort").agg(count(lit(1)).as("n_users"))
        .orderBy("cohort")
    },

    // Conjunctive (multi-term AND) retrieval over the inverted-index
    // relation: the query terms are the top-3 by document frequency
    // (chosen IN-PLAN — no driver collect), every term pair intersects
    // postings as a doc-keyed semi-join chain + HAVING count = 2. At
    // 100 TB this is the standard search-engine AND: cost follows the
    // shorter posting list of each pair, never the corpus.
    QueryDef.sql(
      "q177_postings_intersect",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dt AS (SELECT DISTINCT doc_id, term FROM tok WHERE len(term) > 0),
        |top3 AS (SELECT term FROM (
        |  SELECT term, COUNT(*) AS df FROM dt GROUP BY term
        |  ORDER BY df DESC, term LIMIT 3) t),
        |prs AS (SELECT a.term AS t1, b.term AS t2
        |        FROM top3 a JOIN top3 b ON a.term < b.term),
        |hits AS (SELECT p.t1, p.t2, d1.doc_id
        |         FROM prs p
        |         JOIN dt d1 ON d1.term = p.t1
        |         JOIN dt d2 ON d2.term = p.t2 AND d2.doc_id = d1.doc_id)
        |SELECT t1, t2, COUNT(*) AS n_docs,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:10], '|') AS first_docs
        |FROM hits GROUP BY t1, t2 ORDER BY t1, t2""".stripMargin) { (s, dir) =>
      val dt = Tables(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .where(length(col("term")) > 0)
        .distinct()
      val top3 = dt.groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term")).limit(3).select("term")
      val prs = top3.select(col("term").as("t1"))
        .join(top3.select(col("term").as("t2")), col("t1") < col("t2"))
      val d1 = dt.select(col("term").as("q1"), col("doc_id"))
      val d2 = dt.select(col("term").as("q2"), col("doc_id").as("doc2"))
      prs
        .join(d1, col("q1") === col("t1"))
        .join(d2, col("q2") === col("t2") && col("doc2") === col("doc_id"))
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("n_docs"),
          array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 10), "|")
            .as("first_docs"))
        .orderBy("t1", "t2")
    },

    // Local clustering coefficient over the co-order graph: per-node
    // triangle participation vs possible wedges, 2·tri·10⁶ div
    // (deg·(deg−1)) in exact ppm. The canonical triangle join emits each
    // triangle once; a 3-way union attributes it to all corners — one
    // extra aggregate over the (already sparse) triangle set, degrees
    // from the symmetrized edge list.
    QueryDef.sql(
      "q178_clustering_coeff",
      s"""WITH $partEdgesSql,
         |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |        FROM p e1 JOIN p e2 ON e1.v = e2.u
         |        JOIN p e3 ON e3.u = e1.u AND e3.v = e2.v),
         |pt AS (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
         |tc AS (SELECT n, COUNT(*) AS tri_n FROM pt GROUP BY n),
         |deg AS (SELECT n, COUNT(*) AS d FROM (
         |  SELECT u AS n FROM p UNION ALL SELECT v FROM p) s GROUP BY n)
         |SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
         |  CAST(COALESCE(tc.tri_n, 0) AS BIGINT) AS n_triangles,
         |  CAST(COALESCE(tc.tri_n, 0) * 2 * 1000000 // (deg.d * (deg.d - 1)) AS BIGINT)
         |    AS coeff_ppm
         |FROM deg LEFT JOIN tc ON deg.n = tc.n
         |WHERE deg.d >= 2
         |ORDER BY coeff_ppm DESC, node LIMIT 25""".stripMargin) { (s, dir) =>
      val p = partEdges(Tables(s, dir))
      val tri = p.select(col("u").as("a"), col("v").as("b"))
        .join(p.select(col("u").as("b2"), col("v").as("c")), col("b") === col("b2"))
        .join(p.select(col("u").as("a3"), col("v").as("c3")),
          col("a") === col("a3") && col("c") === col("c3"))
        .select("a", "b", "c")
      val pt = tri.select(col("a").as("n"))
        .unionAll(tri.select(col("b").as("n")))
        .unionAll(tri.select(col("c").as("n")))
      val tc = pt.groupBy("n").agg(count(lit(1)).as("tri_n"))
      val deg = p.select(col("u").as("n")).unionAll(p.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      deg.join(tc.withColumnRenamed("n", "t_n"), col("n") === col("t_n"), "left_outer")
        .where(col("d") >= 2)
        .select(col("n").as("node"), col("d").as("degree"),
          coalesce(col("tri_n"), lit(0L)).as("n_triangles"),
          expr("coalesce(tri_n, 0L) * 2L * 1000000L div (d * (d - 1L))").as("coeff_ppm"))
        .orderBy(col("coeff_ppm").desc, col("node"))
        .limit(25)
    },

    // Pairwise segment similarity (exact Jaccard between event-type user
    // bases): intersections come from ONE self-join on the distinct
    // (user, type) relation — cost follows users-in-multiple-segments,
    // never |users|² — and unions derive from the sizes
    // (|A∪B| = |A|+|B|−|A∩B|), so no second pass. Exact ppm.
    QueryDef.sql(
      "q179_segment_jaccard",
      """WITH ut AS (SELECT DISTINCT user_id, event_type AS t FROM events),
        |sz AS (SELECT t, COUNT(*) AS n FROM ut GROUP BY t),
        |ix AS (SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_both
        |       FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.t < b.t
        |       GROUP BY a.t, b.t)
        |SELECT ix.t1, ix.t2, CAST(n_both AS BIGINT) AS n_both,
        |  CAST(s1.n + s2.n - n_both AS BIGINT) AS n_union,
        |  CAST(n_both * 1000000 // (s1.n + s2.n - n_both) AS BIGINT) AS jaccard_ppm
        |FROM ix JOIN sz s1 ON ix.t1 = s1.t JOIN sz s2 ON ix.t2 = s2.t
        |ORDER BY t1, t2""".stripMargin) { (s, dir) =>
      val ut = Tables(s, dir).events
        .select(col("user_id"), col("event_type").as("t")).distinct()
      val sz = ut.groupBy("t").agg(count(lit(1)).as("n"))
      val ix = ut.select(col("user_id"), col("t").as("t1"))
        .join(ut.select(col("user_id").as("u2"), col("t").as("t2")),
          col("user_id") === col("u2") && col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n_both"))
      ix
        .join(broadcast(sz.select(col("t").as("s1_t"), col("n").as("n1"))),
          col("t1") === col("s1_t"))
        .join(broadcast(sz.select(col("t").as("s2_t"), col("n").as("n2"))),
          col("t2") === col("s2_t"))
        .select(col("t1"), col("t2"), col("n_both"),
          (col("n1") + col("n2") - col("n_both")).as("n_union"),
          expr("n_both * 1000000L div (n1 + n2 - n_both)").as("jaccard_ppm"))
        .orderBy("t1", "t2")
    },

    // FORWARD as-of: for each view event, the time to the user's next
    // purchase (q53/q114 look backward). Engine side: one window pass per
    // user carrying the next purchase timestamp over the strictly-
    // following frame — one shuffle, no self-join. Oracle: a correlated
    // scalar MIN subquery with a row-value comparison, i.e. a genuinely
    // different algorithm, so agreement is a real differential check.
    // (us, event_id) lexicographic order makes "next" total under
    // timestamp ties.
    QueryDef.sql(
      "q180_next_event",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id % 29 = 0)
        |SELECT v.event_id, CAST((
        |  SELECT MIN(p.us) FROM e p
        |  WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
        |    AND (p.us, p.event_id) > (v.us, v.event_id)
        |) - v.us AS BIGINT) AS us_to_purchase
        |FROM e v WHERE v.event_type = 'view'
        |ORDER BY v.event_id""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .where(col("user_id") % 29 === 0)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
      // min-over-following ≡ the subquery's MIN across later purchases:
      // a later purchase can carry a SMALLER us only under ties broken by
      // event_id, which the lexicographic frame order handles identically
      e.select(col("event_id"), col("event_type"), col("us"),
          min(when(col("event_type") === "purchase", col("us"))).over(w)
            .as("next_p_us"))
        .where(col("event_type") === "view")
        .select(col("event_id"), (col("next_p_us") - col("us")).as("us_to_purchase"))
        .orderBy("event_id")
    },

    // Token-ID dictionary build — the artifact a tokenizer ships: dense
    // integer ids assigned to the global vocabulary by (count desc,
    // word), with cumulative corpus coverage per id so the vocab-size
    // cutoff is read straight off the table (q223 prices ONE cutoff;
    // this emits the whole curve). The heavy lift is one word-count
    // aggregate; ranking and the prefix sum run over vocabulary-sized
    // rows (the fixture vocab is ~50 types — at 100 TB it's maybe 10⁷,
    // still metadata next to the corpus).
    QueryDef.sql(
      "q242_token_ids",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, COUNT(*) AS n FROM t GROUP BY 1),
        |r AS (SELECT w, n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS token_id,
        |        SUM(n) OVER (ORDER BY n DESC, w ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS cum,
        |        SUM(n) OVER () AS total
        |      FROM wc)
        |SELECT CAST(token_id AS BIGINT) AS token_id, w, CAST(n AS BIGINT) AS n,
        |  CAST(cum * 1000000 // total AS BIGINT) AS coverage_ppm
        |FROM r WHERE token_id <= 40 ORDER BY token_id""".stripMargin) { (s, dir) =>
      val wc = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
      val ord = Window.orderBy(col("n").desc, col("w"))
      wc.withColumn("token_id", row_number().over(ord))
        .withColumn("cum", sum("n").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("total", sum("n").over(Window.partitionBy()))
        .where(col("token_id") <= 40)
        .select(col("token_id").cast("long"), col("w"), col("n"),
          expr("cum * 1000000L div total").as("coverage_ppm"))
        .orderBy("token_id")
    },

    // Deterministic negative sampling — contrastive-pair generation
    // without RNG: each anchor takes negatives at fixed prime strides on
    // the id ring ((vec_id + 7919·j) mod N), the pairing is a plain
    // equi-join on the ring id, and the audit counts label collisions
    // (a "negative" sharing the anchor's label) per stride — the number
    // that decides whether stride sampling is clean enough or needs
    // label-aware rejection. Pure projection + one join per corpus pass.
    QueryDef.sql(
      "q243_negative_sampling",
      """WITH n AS (SELECT COUNT(*) AS cnt FROM embeddings),
        |a AS (SELECT vec_id, label, j,
        |        (vec_id + 7919 * j) % cnt AS neg_id
        |      FROM embeddings, generate_series(1, 3) t(j), n),
        |p AS (SELECT a.j, a.label AS al, e.label AS nl
        |      FROM a JOIN embeddings e ON e.vec_id = a.neg_id)
        |SELECT CAST(j AS BIGINT) AS stride, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN al = nl THEN 1 ELSE 0 END) AS BIGINT) AS same_label,
        |  CAST(SUM(CASE WHEN al = nl THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
        |    AS collision_ppm
        |FROM p GROUP BY 1 ORDER BY stride""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val n = emb.agg(count(lit(1)).as("cnt"))
      val a = emb.select(col("vec_id"), col("label"),
          explode(sequence(lit(1), lit(3))).as("j"))
        .crossJoin(broadcast(n))
        .select(col("label").as("al"), col("j"),
          ((col("vec_id") + lit(7919) * col("j")) % col("cnt")).as("neg_id"))
      a.join(emb.select(col("vec_id"), col("label").as("nl")),
          col("neg_id") === col("vec_id"))
        .groupBy(col("j").cast("long").as("stride"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("al") === col("nl"), 1L).otherwise(0L)).as("same_label"))
        .select(col("stride"), col("n_pairs"), col("same_label"),
          expr("same_label * 1000000L div n_pairs").as("collision_ppm"))
        .orderBy("stride")
    },

    // Feature-hashing (hashing-trick) collision audit — before shipping
    // a 64-bucket hashed feature space, measure what shares a slot:
    // word types hash through the portable md5 bucket, and per bucket
    // the audit reports type count, token traffic, and the dominant
    // word with its share — q214's one-pass argmax at bucket grain.
    // Everything past the word-count aggregate is vocabulary-sized.
    QueryDef.sql(
      "q244_feature_hashing",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, COUNT(*) AS n FROM t GROUP BY 1),
        |b AS (SELECT ('0x' || substr(md5(w), 1, 8))::BIGINT % 64 AS bucket, w, n FROM wc)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  first(w ORDER BY n DESC, w) AS top_word,
        |  CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS top_share_ppm
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      val wc = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
      wc.select(
          (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % 64).as("bucket"),
          col("w"), col("n"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_types"), sum("n").as("n_tokens"),
          expr("min_by(w, struct(-n, w))").as("top_word"), max("n").as("mx"))
        .select(col("bucket"), col("n_types"), col("n_tokens"), col("top_word"),
          expr("mx * 1000000L div n_tokens").as("top_share_ppm"))
        .orderBy("bucket")
    },

    // Random-projection (Johnson-Lindenstrauss) sketch with an EXACT
    // distortion audit: a deterministic ±1 matrix (md5 parity of
    // (j, dim)) folds 64-dim integer-micro vectors to 8 dims, and for
    // the stride-pair sample (q243's ring) the 64-dim and 8-dim squared
    // distances are compared as one integer ratio —
    // E[proj²] = 8·orig², so ratio_ppm concentrates near 10⁶. The
    // projection is one (dim)-grain join against a 512-row matrix
    // (broadcast); pair distances live at pair×dim grain, never
    // corpus×corpus. PQ (q124) and IVF (q55) shrink the search; JL
    // shrinks the vectors themselves.
    QueryDef.sql(
      "q245_random_projection",
      """WITH e AS (
        |  SELECT vec_id, i - 1 AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |proj AS (
        |  SELECT j, d AS dim,
        |    ('0x' || substr(md5(CAST(j AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2 * 2 - 1 AS sgn
        |  FROM generate_series(0, 7) a(j), generate_series(0, 63) b(d)),
        |p AS (SELECT vec_id, j, SUM(sgn * m) AS pv
        |      FROM e JOIN proj USING (dim) GROUP BY 1, 2),
        |nn AS (SELECT COUNT(DISTINCT vec_id) AS cnt FROM e),
        |pairs AS (SELECT vec_id AS a, (vec_id + 7919) % cnt AS b
        |          FROM (SELECT DISTINCT vec_id FROM e) ids, nn),
        |od AS (SELECT a, b, SUM((ea.m - eb.m) * (ea.m - eb.m)) AS d2
        |       FROM pairs JOIN e ea ON ea.vec_id = a
        |         JOIN e eb ON eb.vec_id = b AND eb.dim = ea.dim
        |       GROUP BY 1, 2),
        |pd AS (SELECT a, b, SUM((pa.pv - pb.pv) * (pa.pv - pb.pv)) AS p2
        |       FROM pairs JOIN p pa ON pa.vec_id = a
        |         JOIN p pb ON pb.vec_id = b AND pb.j = pa.j
        |       GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(od.d2) AS BIGINT) AS sum_orig_d2,
        |  CAST(SUM(pd.p2) AS BIGINT) AS sum_proj_d2,
        |  CAST(FLOOR(1000000.0 * CAST(SUM(pd.p2) AS DOUBLE)
        |    / (8.0 * CAST(SUM(od.d2) AS DOUBLE))) AS BIGINT) AS ratio_ppm
        |FROM od JOIN pd USING (a, b)""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim"),
          floor(col("x").cast("double") * 1000000).cast("long").as("m"))
      val proj = s.range(8).select(col("id").as("j"))
        .crossJoin(s.range(64).select(col("id").as("dim")))
        .select(col("j"), col("dim"),
          (conv(substring(md5(concat(col("j"), lit("_"), col("dim"))), 1, 8), 16, 10)
            .cast("long") % 2 * 2 - 1).as("sgn"))
      val p = e.join(broadcast(proj), "dim")
        .groupBy("vec_id", "j").agg(sum(col("sgn") * col("m")).as("pv"))
      val nn = e.select("vec_id").distinct().agg(count(lit(1)).as("cnt"))
      val pairs = e.select("vec_id").distinct().crossJoin(broadcast(nn))
        .select(col("vec_id").as("a"), ((col("vec_id") + 7919) % col("cnt")).as("b"))
      val ea = e.select(col("vec_id").as("a"), col("dim"), col("m").as("ma"))
      val eb = e.select(col("vec_id").as("b"), col("dim"), col("m").as("mb"))
      val dec = "decimal(38,0)"
      val od = pairs.join(ea, "a").join(eb, Seq("b", "dim"))
        .groupBy("a", "b").agg(sum((col("ma") - col("mb")) * (col("ma") - col("mb"))).as("d2"))
      val pa = p.select(col("vec_id").as("a"), col("j"), col("pv").as("pva"))
      val pb = p.select(col("vec_id").as("b"), col("j"), col("pv").as("pvb"))
      // per-pair squares fit a Long; the corpus-level sums (and any ×10⁶
      // ppm product) do not — decimal(38,0) accumulators, DOUBLE+FLOOR
      // ratio (ADVICE r3's q172 lesson; q153's closed-form precedent)
      val pd = pairs.join(pa, "a").join(pb, Seq("b", "j"))
        .groupBy("a", "b").agg(sum(((col("pva") - col("pvb")) * (col("pva") - col("pvb"))).cast(dec)).as("p2"))
      od.join(pd, Seq("a", "b"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("d2").cast(dec)).as("so"),
          sum("p2").as("sp"))
        .select(col("n_pairs"), col("so").cast("long").as("sum_orig_d2"),
          col("sp").cast("long").as("sum_proj_d2"),
          floor(lit(1000000.0) * col("sp").cast("double")
            / (lit(8.0) * col("so").cast("double"))).cast("long").as("ratio_ppm"))
    },

    // Per-dimension min-max feature scaling — the normalization pass
    // before quantization or distance work (q64 quantizes per ROW; this
    // normalizes per DIMENSION): global per-dim min/max (64 rows)
    // broadcast back onto the corpus, every value mapped to [0, 10⁶]
    // integer-exactly, and the output proves the contract in-plan —
    // min_norm 0, max_norm 10⁶ per dim — plus a checksum over the
    // normalized corpus. Two passes over the vectors, both map-side
    // combined.
    QueryDef.sql(
      "q246_feature_scaling",
      """WITH e AS (
        |  SELECT vec_id, i - 1 AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |mm AS (SELECT dim, MIN(m) AS mn, MAX(m) AS mx FROM e GROUP BY 1),
        |nrm AS (SELECT e.dim, (m - mn) * 1000000 // GREATEST(mx - mn, 1) AS v
        |        FROM e JOIN mm ON e.dim = mm.dim)
        |SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(v) AS BIGINT) AS min_norm, CAST(MAX(v) AS BIGINT) AS max_norm,
        |  CAST(SUM(v) AS BIGINT) AS sum_norm
        |FROM nrm GROUP BY 1 ORDER BY dim""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim"),
          floor(col("x").cast("double") * 1000000).cast("long").as("m"))
      val mm = e.groupBy("dim").agg(min("m").as("mn"), max("m").as("mx"))
      e.join(broadcast(mm), "dim")
        .select(col("dim"), expr("(m - mn) * 1000000L div greatest(mx - mn, 1L)").as("v"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), min("v").as("min_norm"), max("v").as("max_norm"),
          sum("v").as("sum_norm"))
        .orderBy("dim")
    },

    // Classification metrics — per-class precision/recall/F1 plus the
    // macro average, computed from a confusion matrix that lives at
    // class grain: a deterministic "model" (label shifted on ring
    // positions vec_id % 7 = 0) supplies predictions, one aggregate
    // builds per-class tp/fp/fn, and every rate is an exact ppm ratio
    // (F1 cleared to integer form: 2·tp·10⁶ // (2·tp + fp + fn)). The
    // eval-harness shape for any labeling job at corpus scale.
    QueryDef.sql(
      "q247_class_metrics",
      """WITH pr AS (
        |  SELECT label AS y,
        |    (label + CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) % 10 AS yhat
        |  FROM embeddings),
        |c AS (
        |  SELECT cls, SUM(tp) AS tp, SUM(fp) AS fp, SUM(fn) AS fn FROM (
        |    SELECT y AS cls, CASE WHEN y = yhat THEN 1 ELSE 0 END AS tp, 0 AS fp,
        |      CASE WHEN y <> yhat THEN 1 ELSE 0 END AS fn FROM pr
        |    UNION ALL
        |    SELECT yhat, 0, CASE WHEN y <> yhat THEN 1 ELSE 0 END, 0 FROM pr)
        |  GROUP BY 1)
        |SELECT CAST(cls AS BIGINT) AS cls, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |  CAST(tp * 1000000 // GREATEST(tp + fp, 1) AS BIGINT) AS precision_ppm,
        |  CAST(tp * 1000000 // GREATEST(tp + fn, 1) AS BIGINT) AS recall_ppm,
        |  CAST(2 * tp * 1000000 // GREATEST(2 * tp + fp + fn, 1) AS BIGINT) AS f1_ppm
        |FROM c ORDER BY cls""".stripMargin) { (s, dir) =>
      val pr = Tables(s, dir).embeddings
        .select(col("label").cast("long").as("y"),
          ((col("label") + when(col("vec_id") % 7 === 0, 1).otherwise(0)) % 10)
            .cast("long").as("yhat"))
      val tpRows = pr.select(col("y").as("cls"),
        when(col("y") === col("yhat"), 1L).otherwise(0L).as("tp"),
        lit(0L).as("fp"),
        when(col("y") =!= col("yhat"), 1L).otherwise(0L).as("fn"))
      val fpRows = pr.select(col("yhat").as("cls"), lit(0L).as("tp"),
        when(col("y") =!= col("yhat"), 1L).otherwise(0L).as("fp"), lit(0L).as("fn"))
      tpRows.unionAll(fpRows)
        .groupBy("cls")
        .agg(sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"))
        .select(col("cls"), col("tp"), col("fp"), col("fn"),
          expr("tp * 1000000L div greatest(tp + fp, 1L)").as("precision_ppm"),
          expr("tp * 1000000L div greatest(tp + fn, 1L)").as("recall_ppm"),
          expr("2 * tp * 1000000L div greatest(2 * tp + fp + fn, 1L)").as("f1_ppm"))
        .orderBy("cls")
    },

    // Retrieval-quality metrics — precision@5 and MRR over an
    // integer-exact ranking (q121 audits ANN recall; this scores the
    // retrieval itself): anchors (vec_id % 25 = 0) rank the whole corpus
    // by exact micro-dot-product, relevance = label match, and both
    // metrics clear to ppm integers (reciprocal rank as 10⁶ // rank —
    // floor-per-query, then averaged as a second exact division). The
    // dot products live at anchor×corpus×dim grain — the brute-force
    // eval harness you run on a SAMPLE of anchors, sized by the anchor
    // stride, while production serves from q55's IVF.
    QueryDef.sql(
      "q248_retrieval_metrics",
      """WITH e AS (
        |  SELECT vec_id, label, i - 1 AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |a AS (SELECT * FROM e WHERE vec_id % 25 = 0),
        |d AS (SELECT a.vec_id AS qid, a.label AS ql, e.vec_id AS cid,
        |        e.label AS cl, SUM(a.m * e.m) AS dot
        |      FROM a JOIN e ON a.dim = e.dim AND a.vec_id <> e.vec_id
        |      GROUP BY 1, 2, 3, 4),
        |r AS (SELECT qid, ql, cl, dot,
        |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rk
        |      FROM d),
        |pq AS (SELECT qid,
        |        SUM(CASE WHEN rk <= 5 AND ql = cl THEN 1 ELSE 0 END) AS rel5,
        |        COALESCE(MIN(CASE WHEN ql = cl THEN rk END), 0) AS first_rel
        |      FROM r GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  CAST(SUM(rel5) * 1000000 // (5 * COUNT(*)) AS BIGINT) AS p_at_5_ppm,
        |  CAST(SUM(CASE WHEN first_rel > 0 THEN 1000000 // first_rel ELSE 0 END)
        |    // COUNT(*) AS BIGINT) AS mrr_ppm
        |FROM pq""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("x").cast("double") * 1000000).cast("long").as("m"))
      val a = e.where(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("qid"), col("label").as("ql"), col("dim"),
          col("m").as("qm"))
      val d = a.join(e, Seq("dim"))
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("ql"), col("vec_id").as("cid"), col("label").as("cl"))
        .agg(sum(col("qm") * col("m")).as("dot"))
      val r = d.withColumn("rk",
        row_number().over(Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))))
      val pq = r.groupBy("qid")
        .agg(sum(when(col("rk") <= 5 && col("ql") === col("cl"), 1L).otherwise(0L)).as("rel5"),
          coalesce(min(when(col("ql") === col("cl"), col("rk"))), lit(0)).as("first_rel"))
      pq.agg(count(lit(1)).as("n_queries"), sum("rel5").as("sr"),
          sum(when(col("first_rel") > 0, expr("1000000L div first_rel"))
            .otherwise(0L)).as("srr"))
        .select(col("n_queries"),
          expr("sr * 1000000L div (5 * n_queries)").as("p_at_5_ppm"),
          expr("srr div n_queries").as("mrr_ppm"))
    },

    // Cross-source duplication matrix — corpus governance's "who copies
    // whom": 5-word-prefix fingerprints (span grain, q118's flavor —
    // whole-text md5 finds nothing across sources at small SFs) reduce
    // to (fingerprint, source) pairs, one self-join at fingerprint grain
    // counts fingerprints shared by each source pair, and overlap is
    // priced against both sources' fingerprint inventories (q224's
    // containment arithmetic at corpus-source grain). Join cost follows
    // sources-per-fingerprint, never corpus².
    QueryDef.sql(
      "q249_source_overlap",
      """WITH d AS (SELECT DISTINCT
        |    md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')) AS fp,
        |    source FROM documents),
        |sz AS (SELECT source, COUNT(*) AS n FROM d GROUP BY 1),
        |ov AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
        |       FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared_fps,
        |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
        |  CAST(shared * 1000000 // LEAST(sa.n, sb.n) AS BIGINT) AS containment_ppm
        |FROM ov JOIN sz sa ON sa.source = src_a JOIN sz sb ON sb.source = src_b
        |ORDER BY containment_ppm DESC, src_a, src_b LIMIT 30""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).documents
        .select(md5(array_join(slice(split(col("text"), " "), 1, 5), " ")).as("fp"),
          col("source")).distinct()
      val sz = d.groupBy("source").agg(count(lit(1)).as("n"))
      val a = d.select(col("fp"), col("source").as("src_a"))
      val b = d.select(col("fp"), col("source").as("src_b"))
      a.join(b, Seq("fp")).where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared_fps"))
        .join(broadcast(sz.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
        .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("shared_fps"), col("n_a"), col("n_b"),
          expr("shared_fps * 1000000L div least(n_a, n_b)").as("containment_ppm"))
        .orderBy(col("containment_ppm").desc, col("src_a"), col("src_b"))
        .limit(30)
    },

    // Degree assortativity of the part co-purchase graph (q159's edge
    // set): Pearson correlation of endpoint degrees over the
    // SYMMETRIZED edge list — r = (2M·Σjk − (Σj)²)/(2M·Σj² − (Σj)²),
    // every sum an exact integer in DECIMAL; only the final signed
    // ratio goes DOUBLE+FLOOR (parity convention). Negative r says
    // hubs attach to low-degree parts (disassortative, typical for
    // co-purchase graphs). Degrees come from one groupBy; the edge×deg
    // meet is two broadcast-able equi-joins.
    QueryDef.sql(
      "q352_assortativity",
      s"""WITH $partEdgesSql,
         |sym AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
         |deg AS (SELECT u AS node, COUNT(*) AS d FROM sym GROUP BY 1),
         |de AS (SELECT du.d AS j, dv.d AS k
         |  FROM sym JOIN deg du ON sym.u = du.node JOIN deg dv ON sym.v = dv.node),
         |s AS (SELECT COUNT(*) AS m2, SUM(CAST(j AS HUGEINT)) AS s1,
         |    SUM(CAST(j AS HUGEINT) * k) AS sjk, SUM(CAST(j AS HUGEINT) * j) AS sjj
         |  FROM de)
         |SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
         |  CAST(m2 / 2 AS BIGINT) AS n_edges,
         |  CAST(FLOOR(CAST(m2 * sjk - s1 * s1 AS DOUBLE) * 1000000.0
         |    / CAST(m2 * sjj - s1 * s1 AS DOUBLE)) AS BIGINT) AS assortativity_ppm
         |FROM s""".stripMargin) { (s, dir) =>
      val e = partEdges(Tables(s, dir))
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
      val de = sym
        .join(deg.select(col("node").as("nu"), col("d").as("j")), col("u") === col("nu"))
        .join(deg.select(col("node").as("nv"), col("d").as("k")), col("v") === col("nv"))
      val dec = "decimal(38,0)"
      val sums = de.agg(count(lit(1)).as("m2"),
        sum(col("j").cast(dec)).as("s1"),
        sum(col("j").cast(dec) * col("k")).as("sjk"),
        sum(col("j").cast(dec) * col("j")).as("sjj"))
      val nn = deg.agg(count(lit(1)).as("n_nodes"))
      nn.crossJoin(sums)
        .select(col("n_nodes"),
          expr("CAST(m2 / 2 AS BIGINT)").as("n_edges"),
          expr("CAST(FLOOR(CAST(m2 * sjk - s1 * s1 AS DOUBLE) * 1000000.0D" +
            " / CAST(m2 * sjj - s1 * s1 AS DOUBLE)) AS BIGINT)")
            .as("assortativity_ppm"))
    })
}

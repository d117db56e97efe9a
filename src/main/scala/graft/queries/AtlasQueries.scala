package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Round-4 continuation, second file: discourse segmentation, copy
  * detection, scalable order statistics, and storage-engine advisories.
  * Same determinism conventions as SignalQueries: md5-derived hashes,
  * exact integer/DECIMAL ratios, FLOOR scaling, deterministic total
  * orders on every output.
  */
object AtlasQueries {

  /** Shared oracle CTE: (doc_id, pos, w) token stream with 1-based
    * positions via DuckDB's indexed list lambda (the q469 idiom).
    */
  private val tokSql =
    """ws AS (SELECT doc_id, source,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
      |  FROM documents),
      |tok AS (SELECT doc_id, source, u.pos AS pos, u.w AS w FROM (
      |  SELECT doc_id, source,
      |    unnest(list_transform(ws, (x, i) -> {'pos': i, 'w': x})) AS u
      |  FROM ws))""".stripMargin

  /** Spark twin of [[tokSql]]. */
  private def tokens(t: Tables) = t.documents
    .select(col("doc_id"), col("source"), posexplode(
      split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")))
    .select(col("doc_id"), col("source"), (col("pos") + 1).as("pos"),
      col("col").as("w"))

  val all: Seq[QueryDef] = Seq(

    // TextTiling-style discourse segmentation (Hearst): split each doc
    // into 10-token blocks, score every adjacent block boundary with
    // the token-set Jaccard, and call the strict local minima "topic
    // valleys" — the boundary detector RAG chunkers use to cut long
    // documents at topic shifts instead of fixed offsets. Block sets
    // are distinct (doc, block, token) rows (one aggregate), adjacent
    // similarity is a self-join on (doc, token, block+1) — never a
    // block×block cross product — and the valley test is one lag/lead
    // window per doc.
    QueryDef.sql(
      "q490_texttiling",
      s"""WITH $tokSql,
         |bt AS (SELECT DISTINCT doc_id, (pos - 1) // 10 AS blk, w FROM tok
         |  WHERE len(w) > 0),
         |bs AS (SELECT doc_id, blk, COUNT(*) AS sz FROM bt GROUP BY 1, 2),
         |sh AS (SELECT a.doc_id, a.blk, COUNT(*) AS sh
         |  FROM bt a JOIN bt b ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
         |    AND a.w = b.w
         |  GROUP BY 1, 2),
         |sim AS (SELECT s1.doc_id, s1.blk,
         |    (1000 * COALESCE(sh.sh, 0))
         |      // (s1.sz + s2.sz - COALESCE(sh.sh, 0)) AS sim_milli
         |  FROM bs s1 JOIN bs s2 ON s1.doc_id = s2.doc_id AND s2.blk = s1.blk + 1
         |  LEFT JOIN sh ON sh.doc_id = s1.doc_id AND sh.blk = s1.blk),
         |v AS (SELECT doc_id, blk, sim_milli,
         |    LAG(sim_milli) OVER (PARTITION BY doc_id ORDER BY blk) AS p,
         |    LEAD(sim_milli) OVER (PARTITION BY doc_id ORDER BY blk) AS nx
         |  FROM sim)
         |SELECT doc_id, COUNT(*) + 1 AS n_blocks,
         |  CAST(SUM(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
         |    AND sim_milli < p AND sim_milli < nx THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_valleys,
         |  CAST(MIN(sim_milli) AS BIGINT) AS min_sim,
         |  CAST(MAX(sim_milli) AS BIGINT) AS max_sim
         |FROM v GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bt = tokens(Tables(s, dir))
        .where(length(col("w")) > 0)
        .select(col("doc_id"), expr("(pos - 1) div 10").as("blk"), col("w"))
        .distinct()
      val bs = bt.groupBy("doc_id", "blk").agg(count(lit(1)).as("sz"))
      val sh = bt.as("a")
        .join(bt.as("b"), col("a.doc_id") === col("b.doc_id") &&
          col("b.blk") === col("a.blk") + 1 && col("a.w") === col("b.w"))
        .groupBy(col("a.doc_id").as("doc_id"), col("a.blk").as("blk"))
        .agg(count(lit(1)).as("sh"))
      val sim = bs.as("s1")
        .join(bs.as("s2"), col("s1.doc_id") === col("s2.doc_id") &&
          col("s2.blk") === col("s1.blk") + 1)
        .join(sh, col("s1.doc_id") === sh("doc_id") && col("s1.blk") === sh("blk"),
          "left")
        .select(col("s1.doc_id").as("doc_id"), col("s1.blk").as("blk"),
          expr("(1000 * COALESCE(sh, 0)) div (s1.sz + s2.sz - COALESCE(sh, 0))")
            .as("sim_milli"))
      val w = Window.partitionBy("doc_id").orderBy("blk")
      sim.withColumn("p", lag("sim_milli", 1).over(w))
        .withColumn("nx", lead("sim_milli", 1).over(w))
        .groupBy("doc_id")
        .agg((count(lit(1)) + 1).as("n_blocks"),
          sum(when(col("p").isNotNull && col("nx").isNotNull &&
            col("sim_milli") < col("p") && col("sim_milli") < col("nx"), 1L)
            .otherwise(0L)).as("n_valleys"),
          min("sim_milli").as("min_sim"), max("sim_milli").as("max_sim"))
        .orderBy("doc_id")
    },

    // Winnowing copy-detection fingerprints (Schleimer et al. — the
    // MOSS algorithm): hash every 3-gram, slide a 4-gram-wide window,
    // and keep each window's minimal hash — the guarantee is that any
    // shared substring of ≥ 6 tokens shares a fingerprint, with density
    // 2/(w+1) instead of every gram. Fingerprints that occur in > 16
    // docs are dropped (MOSS's common-code suppression — also what
    // bounds the pair join at corpus scale), then doc pairs rank by
    // shared fingerprints. Scale shape (reworked r6): 3-grams build
    // with codegen'd lead() windows over the token stream — the former
    // tok⋈tok⋈tok self-joins shuffled the corpus token relation 3×; now
    // the only corpus-sized shuffle is ONE doc_id exchange that every
    // window (lead, frame-min, frame-count) reuses. Full-window
    // detection is count-over-the-same-frame == 4, which fuses into the
    // min's Window node — no whole-partition count, no max-pos
    // aggregate+join. (MOSS's rightmost-tie POSITION is not computed:
    // fingerprints dedupe by hash per doc, so the tie-break never
    // affects the output set — the former join-back for it was dead
    // weight.)
    QueryDef.sql(
      "q491_winnowing",
      s"""WITH ws AS (SELECT doc_id,
         |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
         |  FROM documents),
         |ga AS (SELECT doc_id,
         |    [('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 8))::BIGINT
         |     for i in generate_series(1, len(ws) - 2)] AS gh
         |  FROM ws WHERE len(ws) >= 3),
         |g AS (SELECT doc_id, len(gh) AS np, u.pos AS pos, u.h AS h FROM (
         |  SELECT doc_id, gh,
         |    unnest(list_transform(gh, (x, i) -> {'pos': i, 'h': x})) AS u
         |  FROM ga)),
         |wm AS (SELECT doc_id, pos, np,
         |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
         |  FROM g),
         |fp AS (SELECT DISTINCT doc_id, wmin AS h FROM wm WHERE pos <= np - 3),
         |rare AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) <= 16),
         |fr AS (SELECT fp.doc_id, fp.h FROM fp JOIN rare ON fp.h = rare.h),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
         |  FROM fr a JOIN fr b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT da, db, CAST(shared AS BIGINT) AS shared
         |FROM pairs ORDER BY shared DESC, da, db LIMIT 10""".stripMargin) { (s, dir) =>
      val wSpec = Window.partitionBy("doc_id").orderBy("pos")
      val g = tokens(Tables(s, dir)).select("doc_id", "pos", "w")
        .withColumn("w2", lead("w", 1).over(wSpec))
        .withColumn("w3", lead("w", 2).over(wSpec))
        .where(col("w3").isNotNull)
        .select(col("doc_id"), col("pos"),
          expr("CAST(conv(substring(md5(concat(w, ' ', w2, ' ', w3)), 1, 8), 16, 10)" +
            " AS BIGINT)").as("h"))
      val wFrame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
      // full 4-gram windows only: the frame count == 4 computes in the
      // SAME Window node as the frame min (identical spec+frame)
      // fp feeds three consumers (the rarity aggregate and both pair-join
      // sides): cache it so the tokenize+window corpus pass runs ONCE —
      // uncached, each branch re-scans the parquet (4 scans, plan-verified)
      val fp = g.withColumn("wmin", min("h").over(wFrame))
        .withColumn("wn", count(lit(1)).over(wFrame))
        .where(col("wn") === 4)
        .select(col("doc_id"), col("wmin").as("h")).distinct()
        .cache()
      val rare = fp.groupBy("h").agg(count(lit(1)).as("df"))
        .where(col("df") <= 16).select("h")
      val fr = fp.join(rare, "h")
      fr.select(col("h"), col("doc_id").as("da"))
        .join(fr.select(col("h"), col("doc_id").as("db")), "h")
        .where(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("shared"))
        .orderBy(col("shared").desc, col("da"), col("db"))
        .limit(10)
    },

    // Two-pass distributed exact median — the plan that replaces a
    // global sort at 100 TB: pass 1 aggregates coarse 64-cent bins per
    // event type (a combine-friendly histogram whose size is data-range
    // /64, not n), locates the bin holding the ⌈n/2⌉ order statistic
    // with one cumulative window over that tiny table, and pass 2 ranks
    // ONLY the rows of the median bin (~n/bins rows). The oracle is
    // DuckDB's quantile_disc(0.5) — the differential gate certifies the
    // two-pass plan returns the EXACT order statistic, not an
    // approximation (contrast q88's approx_percentile).
    QueryDef.sql(
      "q492_twopass_median",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100.0) AS BIGINT) AS c FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(quantile_disc(c, 0.5) AS BIGINT) AS median_cents
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("c"))
      // pass 1: coarse histogram + cumulative bin location
      val hist = e.withColumn("bin", expr("c div 64"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("bc"))
      val wcum = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy("event_type")
      val loc = hist
        .withColumn("cum", sum("bc").over(wcum))
        .withColumn("n", sum("bc").over(wall))
        .withColumn("target", expr("(n + 1) div 2"))
        .where(col("cum") >= col("target") &&
          col("cum") - col("bc") < col("target"))
        .select(col("event_type"), col("bin"), col("n"),
          (col("target") - (col("cum") - col("bc"))).as("k_in_bin"))
      // pass 2: exact rank inside the single median bin per group
      val inBin = e.withColumn("bin", expr("c div 64"))
        .join(broadcast(loc), Seq("event_type", "bin"))
      inBin
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("c")))
        .where(col("rn") === col("k_in_bin"))
        .select(col("event_type"), col("n"), col("c").as("median_cents"))
        .orderBy("event_type")
    },

    // LSM compaction-policy advisor: given each table's measured byte
    // footprint (q468's stats pass) and a 64 MiB memtable, estimate the
    // level count at fanout 8 (⌈log₈⌉ via the length(bin(r−1)) trick)
    // and the classic write/space amplification trade: leveled WA ≈
    // 1 + fanout·levels (every level rewritten ~fanout times per
    // residency) vs tiered WA ≈ 1 + levels, against tiered's ~fanout×
    // worse space amplification — the numbers that decide ingest-heavy
    // vs read-heavy table layouts. Pure integer arithmetic over 4
    // stats rows; the only scan is the byte measurement itself.
    QueryDef.sql(
      "q493_lsm_advisor",
      """WITH stats AS (
        |  SELECT 'customer' AS tbl,
        |    CAST(SUM(len(c_name) + len(c_mktsegment) + 8 * 3) AS BIGINT) AS bytes
        |  FROM customer
        |  UNION ALL SELECT 'lineitem',
        |    CAST(SUM(len(l_returnflag) + len(l_linestatus) + 8 * 9) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'orders',
        |    CAST(SUM(len(o_orderstatus) + len(o_orderpriority) + 8 * 4) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'part',
        |    CAST(SUM(len(p_name) + len(p_brand) + len(p_type) + 8 * 3) AS BIGINT)
        |  FROM part),
        |r AS (SELECT tbl, bytes,
        |    GREATEST((bytes + 67108863) // 67108864, 1) AS ratio FROM stats),
        |lv AS (SELECT tbl, bytes, ratio,
        |    CASE WHEN ratio <= 1 THEN 0
        |      ELSE (length(bin(ratio - 1)) + 2) // 3 END AS levels FROM r)
        |SELECT tbl, bytes, CAST(ratio AS BIGINT) AS memtable_ratio,
        |  CAST(levels AS BIGINT) AS levels,
        |  CAST(1 + 8 * levels AS BIGINT) AS wa_leveled,
        |  CAST(1 + levels AS BIGINT) AS wa_tiered
        |FROM lv ORDER BY tbl""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def st(name: String, df: org.apache.spark.sql.DataFrame,
          rowBytes: org.apache.spark.sql.Column) =
        df.agg(sum(rowBytes).cast("long").as("bytes"))
          .select(lit(name).as("tbl"), col("bytes"))
      val stats =
        st("customer", t.customer,
          length(col("c_name")) + length(col("c_mktsegment")) + lit(24)).unionAll(
        st("lineitem", t.lineitem,
          length(col("l_returnflag")) + length(col("l_linestatus")) + lit(72))).unionAll(
        st("orders", t.orders,
          length(col("o_orderstatus")) + length(col("o_orderpriority")) + lit(32))).unionAll(
        st("part", t.part,
          length(col("p_name")) + length(col("p_brand")) + length(col("p_type")) + lit(24)))
      stats
        .withColumn("ratio", greatest(expr("(bytes + 67108863) div 67108864"), lit(1L)))
        .withColumn("levels", when(col("ratio") <= 1, 0L)
          .otherwise(expr("(length(bin(ratio - 1)) + 2) div 3")))
        .select(col("tbl"), col("bytes"), col("ratio").as("memtable_ratio"),
          col("levels"),
          (lit(1L) + lit(8L) * col("levels")).as("wa_leveled"),
          (lit(1L) + col("levels")).as("wa_tiered"))
        .orderBy("tbl")
    },

    // Asymmetric containment detection: Jaccard misses the quote/subset
    // case (a short doc fully contained in a long one scores low), so
    // dedup pipelines also rank pairs by C(A,B) = |A∩B|/|A| — near-1000
    // one-way containment with modest Jaccard IS the signature of
    // excerpt duplication. 3-gram shingle hashes, the ≤32-doc rarity
    // cap bounding the candidate join (q491's device), and both
    // directed containments + Jaccard from ONE shared-count aggregate.
    QueryDef.sql(
      "q494_containment",
      s"""WITH $tokSql,
         |g AS (SELECT DISTINCT a.doc_id,
         |    ('0x' || substr(md5(a.w || ' ' || b.w || ' ' || c.w), 1, 8))::BIGINT AS h
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
         |rare AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) <= 32),
         |gr AS (SELECT g.doc_id, g.h FROM g JOIN rare ON g.h = rare.h),
         |sh AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS sh
         |  FROM gr a JOIN gr b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |m AS (SELECT sh.da, sh.db, sh.sh,
         |    (1000 * sh.sh) // sa.n AS ca, (1000 * sh.sh) // sb.n AS cb,
         |    (1000 * sh.sh) // (sa.n + sb.n - sh.sh) AS jac
         |  FROM sh JOIN sz sa ON sh.da = sa.doc_id JOIN sz sb ON sh.db = sb.doc_id)
         |SELECT da, db, CAST(sh AS BIGINT) AS shared,
         |  CAST(ca AS BIGINT) AS contain_a_milli, CAST(cb AS BIGINT) AS contain_b_milli,
         |  CAST(jac AS BIGINT) AS jaccard_milli
         |FROM m ORDER BY GREATEST(ca, cb) DESC, da, db LIMIT 10""".stripMargin) { (s, dir) =>
      val tok = tokens(Tables(s, dir)).select("doc_id", "pos", "w")
      val t2 = tok.select(col("doc_id").as("d2"), col("pos").as("p2"),
        col("w").as("w2"))
      val t3 = tok.select(col("doc_id").as("d3"), col("pos").as("p3"),
        col("w").as("w3"))
      val g = tok
        .join(t2, col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
        .join(t3, col("doc_id") === col("d3") && col("p3") === col("pos") + 2)
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(concat(w, ' ', w2, ' ', w3)), 1, 8), 16, 10)" +
            " AS BIGINT)").as("h"))
        .distinct()
      val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val rare = g.groupBy("h").agg(count(lit(1)).as("df"))
        .where(col("df") <= 32).select("h")
      val gr = g.join(rare, "h")
      val sh = gr.select(col("h"), col("doc_id").as("da"))
        .join(gr.select(col("h"), col("doc_id").as("db")), "h")
        .where(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("sh"))
        .where(col("sh") >= 3)
      sh.join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .select(col("da"), col("db"), col("sh").as("shared"),
          expr("(1000 * sh) div na").as("contain_a_milli"),
          expr("(1000 * sh) div nb").as("contain_b_milli"),
          expr("(1000 * sh) div (na + nb - sh)").as("jaccard_milli"))
        .orderBy(greatest(col("contain_a_milli"), col("contain_b_milli")).desc,
          col("da"), col("db"))
        .limit(10)
    },

    // Markov rare-transition anomaly scoring: learn the global
    // event-type transition frequencies (ppm of each source type's
    // fan-out), then score every user by the RAREST transition their
    // own history contains — the session-anomaly detector that flags
    // "paths nobody takes" rather than volume outliers. Per-user
    // bigrams are one lag window over (ts, event_id); the 25-cell
    // transition matrix broadcasts back onto them; scoring is a MIN
    // per user. Output: the 10 most anomalous users.
    QueryDef.sql(
      "q495_rare_transitions",
      """WITH s AS (SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |tr AS (SELECT user_id, prev, event_type AS nxt FROM s WHERE prev IS NOT NULL),
        |m AS (SELECT prev, nxt, COUNT(*) AS c FROM tr GROUP BY 1, 2),
        |f AS (SELECT prev, SUM(c) AS tot FROM m GROUP BY 1),
        |p AS (SELECT m.prev, m.nxt, (1000000 * m.c) // f.tot AS p_ppm
        |  FROM m JOIN f ON m.prev = f.prev),
        |u AS (SELECT tr.user_id, MIN(p.p_ppm) AS min_p_ppm, COUNT(*) AS n_trans
        |  FROM tr JOIN p ON tr.prev = p.prev AND tr.nxt = p.nxt
        |  GROUP BY 1)
        |SELECT user_id, CAST(min_p_ppm AS BIGINT) AS min_p_ppm,
        |  CAST(n_trans AS BIGINT) AS n_trans
        |FROM u ORDER BY min_p_ppm, user_id LIMIT 10""".stripMargin) { (s, dir) =>
      val st = Tables(s, dir).events
        .withColumn("prev", lag("event_type", 1)
          .over(Window.partitionBy("user_id").orderBy("ts", "event_id")))
      val tr = st.where(col("prev").isNotNull)
        .select(col("user_id"), col("prev"), col("event_type").as("nxt"))
      val m = tr.groupBy("prev", "nxt").agg(count(lit(1)).as("c"))
      val f = m.groupBy("prev").agg(sum("c").as("tot"))
      val p = m.join(f, "prev")
        .select(col("prev"), col("nxt"), expr("(1000000 * c) div tot").as("p_ppm"))
      tr.join(broadcast(p), Seq("prev", "nxt"))
        .groupBy("user_id")
        .agg(min("p_ppm").as("min_p_ppm"), count(lit(1)).as("n_trans"))
        .orderBy(col("min_p_ppm"), col("user_id"))
        .limit(10)
    },

    // Capped mixture allocation (waterfilling, 2 rounds): split a token
    // budget of ⅓ the corpus across sources proportionally to their
    // character mass, but cap any single source at 8% of the budget —
    // the training-mix constraint that stops one crawl from dominating.
    // Round 1 allocates min(proportional, cap); round 2 redistributes
    // the leftover among UNCAPPED sources proportionally to their
    // remaining headroom demand, capping again. All shares are exact
    // integer divisions from two broadcast scalars — the 20-row
    // allocation never rescans the corpus.
    QueryDef.sql(
      "q496_mixture_caps",
      """WITH g AS (SELECT source, SUM(n_chars) AS ch FROM documents GROUP BY 1),
        |t AS (SELECT SUM(ch) AS s FROM g),
        |b AS (SELECT s // 3 AS budget, (s // 3) * 8 // 100 AS cap FROM t),
        |a1 AS (SELECT g.source, g.ch,
        |    LEAST((CAST(g.ch AS HUGEINT) * b.budget) // t.s, b.cap) AS a,
        |    CASE WHEN (CAST(g.ch AS HUGEINT) * b.budget) // t.s >= b.cap
        |      THEN 1 ELSE 0 END AS capped
        |  FROM g, t, b),
        |l AS (SELECT b.budget - SUM(a) AS leftover,
        |    SUM(CASE WHEN capped = 0 THEN ch ELSE 0 END) AS uch
        |  FROM a1, b GROUP BY b.budget),
        |a2 AS (SELECT a1.source, a1.ch, a1.capped,
        |    CASE WHEN a1.capped = 1 THEN a1.a
        |      ELSE LEAST(a1.a + (CAST(a1.ch AS HUGEINT) * l.leftover)
        |        // GREATEST(l.uch, 1), b.cap) END AS alloc
        |  FROM a1, l, b)
        |SELECT a2.source, CAST(a2.ch AS BIGINT) AS chars,
        |  CAST(a2.alloc AS BIGINT) AS alloc,
        |  CAST(1000000 * a2.alloc // b.budget AS BIGINT) AS share_ppm,
        |  CAST(a2.capped AS BIGINT) AS capped_round1
        |FROM a2, b ORDER BY a2.source""".stripMargin) { (s, dir) =>
      val g = Tables(s, dir).documents.groupBy("source")
        .agg(sum("n_chars").as("ch"))
      val t = g.agg(sum("ch").as("s"))
      val b = t.select(expr("s div 3").as("budget"),
        expr("(s div 3) * 8 div 100").as("cap"), col("s"))
      val a1 = g.crossJoin(broadcast(b))
        .select(col("source"), col("ch"), col("budget"), col("cap"),
          least(expr("(CAST(ch AS DECIMAL(38,0)) * budget) div s"), col("cap"))
            .as("a"),
          when(expr("(CAST(ch AS DECIMAL(38,0)) * budget) div s") >= col("cap"), 1L)
            .otherwise(0L).as("capped"))
      val l = a1.groupBy("budget", "cap")
        .agg((col("budget") - sum("a")).as("leftover"),
          sum(when(col("capped") === 0, col("ch")).otherwise(0L)).as("uch"))
      a1.drop("budget", "cap").crossJoin(broadcast(l))
        .select(col("source"), col("ch"),
          when(col("capped") === 1, col("a"))
            .otherwise(least(col("a") +
              expr("(CAST(ch AS DECIMAL(38,0)) * leftover) div GREATEST(uch, 1)"),
              col("cap"))).as("alloc"),
          col("capped"), col("budget"))
        .select(col("source"), col("ch").as("chars"),
          col("alloc").cast("long").as("alloc"),
          expr("CAST(1000000 * alloc div budget AS BIGINT)").as("share_ppm"),
          col("capped").as("capped_round1"))
        .orderBy("source")
    },

    // Learned-index page-error audit (the RMI/PGM bound): sort the key
    // column, cut it into 256-key pages, and measure how far linear
    // interpolation between each page's endpoints strays from the true
    // rank — max|err| per page IS the binary-search window a learned
    // index needs on that page, and the audit prices "can this column
    // be indexed by interpolation" from data alone. The global rank is
    // one window (range-sort + offsets at scale); everything after is
    // per-page arithmetic, exact integer rationals only.
    QueryDef.sql(
      "q497_learned_index_audit",
      """WITH k AS (SELECT DISTINCT o_orderkey AS key FROM orders),
        |r AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) AS rn FROM k),
        |p AS (SELECT key, rn, (rn - 1) // 256 AS pg FROM r),
        |e AS (SELECT pg, MIN(key) AS lo_k, MAX(key) AS hi_k,
        |    MIN(rn) AS lo_r, MAX(rn) AS hi_r, COUNT(*) AS n FROM p GROUP BY 1),
        |err AS (SELECT p.pg, p.key, p.rn,
        |    ABS(p.rn - (e.lo_r + ((p.key - e.lo_k) * (e.hi_r - e.lo_r))
        |      // GREATEST(e.hi_k - e.lo_k, 1))) AS err
        |  FROM p JOIN e ON p.pg = e.pg),
        |pe AS (SELECT err.pg, MAX(err.err) AS max_err,
        |    (1000 * SUM(err.err)) // COUNT(*) AS mean_err_milli,
        |    COUNT(*) AS n
        |  FROM err GROUP BY 1)
        |SELECT pe.pg AS page, CAST(e.lo_k AS BIGINT) AS lo_key,
        |  CAST(pe.n AS BIGINT) AS n_keys, CAST(pe.max_err AS BIGINT) AS max_err,
        |  CAST(pe.mean_err_milli AS BIGINT) AS mean_err_milli
        |FROM pe JOIN e ON pe.pg = e.pg
        |ORDER BY pe.max_err DESC, page LIMIT 10""".stripMargin) { (s, dir) =>
      val k = Tables(s, dir).orders.select(col("o_orderkey").as("key")).distinct()
      // distributed global rank (Ranks): the key universe scales with the
      // corpus, so the rank must never be a single-task window; keys are
      // distinct ⇒ the range-shuffle rank is exact
      val r = graft.operators.Ranks.withGlobalRank(k, Seq("key"), "rn")
      val p = r.withColumn("pg", expr("(rn - 1) div 256"))
      val e = p.groupBy("pg").agg(min("key").as("lo_k"), max("key").as("hi_k"),
        min("rn").as("lo_r"), max("rn").as("hi_r"), count(lit(1)).as("n"))
      val err = p.join(broadcast(e), "pg")
        .select(col("pg"),
          abs(col("rn") - (col("lo_r") + expr("((key - lo_k) * (hi_r - lo_r))" +
            " div GREATEST(hi_k - lo_k, 1)"))).as("err"))
      err.groupBy("pg")
        .agg(max("err").as("max_err"),
          expr("(1000 * SUM(err)) div COUNT(*)").as("mean_err_milli"),
          count(lit(1)).as("n"))
        .join(broadcast(e.select(col("pg"), col("lo_k"))), "pg")
        .select(col("pg").as("page"), col("lo_k").as("lo_key"),
          col("n").as("n_keys"), col("max_err"),
          col("mean_err_milli").cast("long").as("mean_err_milli"))
        .orderBy(col("max_err").desc, col("page"))
        .limit(10)
    },

    // Decile lift chart (campaign-targeting evaluation without a
    // model): rank customers by account balance, cut into deciles
    // (ntile's cross-engine split rule), and compare each prefix's
    // share of total revenue to its share of customers — lift(d) > 1000
    // milli means the top d deciles out-earn their headcount, the
    // standard "is this ranking worth targeting" read. LEFT JOIN keeps
    // zero-revenue customers (they ARE the denominator); cumulative
    // sums are one 10-row window, lifts exact integer rationals.
    QueryDef.sql(
      "q498_lift_chart",
      """WITH oc AS (SELECT c.c_custkey, c.c_acctbal,
        |    COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)), 0) AS cents
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |d AS (SELECT *, NTILE(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS dec
        |  FROM oc),
        |g AS (SELECT dec, COUNT(*) AS n, SUM(cents) AS rev FROM d GROUP BY 1),
        |t AS (SELECT SUM(n) AS tn, SUM(rev) AS tr FROM g),
        |c AS (SELECT dec, n, rev,
        |    SUM(n) OVER (ORDER BY dec) AS cn, SUM(rev) OVER (ORDER BY dec) AS cr
        |  FROM g)
        |SELECT c.dec AS decile, CAST(c.n AS BIGINT) AS n_customers,
        |  CAST(c.rev AS BIGINT) AS rev_cents,
        |  CAST(1000000 * c.cr // t.tr AS BIGINT) AS cum_rev_ppm,
        |  CAST((1000 * CAST(c.cr AS HUGEINT) * t.tn) // (CAST(t.tr AS HUGEINT) * c.cn)
        |    AS BIGINT) AS lift_milli
        |FROM c, t ORDER BY decile""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val oc = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(coalesce(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")), lit(0L))
          .as("cents"))
      val d = oc.withColumn("dec",
        ntile(10).over(Window.orderBy(col("c_acctbal").desc, col("c_custkey"))))
      val g = d.groupBy("dec").agg(count(lit(1)).as("n"), sum("cents").as("rev"))
      val tt = g.agg(sum("n").as("tn"), sum("rev").as("tr"))
      val wc = Window.orderBy("dec")
      g.withColumn("cn", sum("n").over(wc)).withColumn("cr", sum("rev").over(wc))
        .crossJoin(broadcast(tt))
        .select(col("dec").cast("long").as("decile"), col("n").as("n_customers"),
          col("rev").as("rev_cents"),
          expr("CAST(1000000 * cr div tr AS BIGINT)").as("cum_rev_ppm"),
          expr("CAST((1000 * CAST(cr AS DECIMAL(38,0)) * tn)" +
            " div (CAST(tr AS DECIMAL(38,0)) * cn) AS BIGINT)").as("lift_milli"))
        .orderBy("decile")
    },

    // Cardinality-estimation feedback: the System-R equi-join estimate
    // |R|·|S| / max(ndv_R, ndv_S) measured against the ACTUAL join
    // cardinality for the three workhorse joins — the telemetry loop
    // (est vs observed, as an exact ppm ratio) that a cost-based
    // optimizer needs before it can be trusted, and the direct audit of
    // q459's planning assumptions. Estimates come from count+NDV
    // aggregates (one scan per table); actuals run the joins
    // themselves.
    QueryDef.sql(
      "q499_card_feedback",
      """WITH s1 AS (SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS d FROM orders),
        |s2 AS (SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS d FROM customer),
        |s3 AS (SELECT COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS d FROM lineitem),
        |s4 AS (SELECT COUNT(*) AS n, COUNT(DISTINCT p_partkey) AS d FROM part),
        |s5 AS (SELECT COUNT(*) AS n, COUNT(DISTINCT l_suppkey) AS d FROM lineitem),
        |s6 AS (SELECT COUNT(*) AS n, COUNT(DISTINCT s_suppkey) AS d FROM supplier),
        |a1 AS (SELECT COUNT(*) AS a FROM orders o JOIN customer c
        |  ON o.o_custkey = c.c_custkey),
        |a2 AS (SELECT COUNT(*) AS a FROM lineitem l JOIN part p
        |  ON l.l_partkey = p.p_partkey),
        |a3 AS (SELECT COUNT(*) AS a FROM lineitem l JOIN supplier s
        |  ON l.l_suppkey = s.s_suppkey),
        |r AS (SELECT 'orders_customer' AS join_name,
        |    (CAST(s1.n AS HUGEINT) * s2.n) // GREATEST(s1.d, s2.d) AS est, a1.a AS act
        |  FROM s1, s2, a1
        |  UNION ALL SELECT 'lineitem_part',
        |    (CAST(s3.n AS HUGEINT) * s4.n) // GREATEST(s3.d, s4.d), a2.a FROM s3, s4, a2
        |  UNION ALL SELECT 'lineitem_supplier',
        |    (CAST(s5.n AS HUGEINT) * s6.n) // GREATEST(s5.d, s6.d), a3.a FROM s5, s6, a3)
        |SELECT join_name, CAST(est AS BIGINT) AS est_rows, CAST(act AS BIGINT) AS actual_rows,
        |  CAST(1000000 * CAST(est AS HUGEINT) // GREATEST(act, 1) AS BIGINT) AS est_over_act_ppm
        |FROM r ORDER BY join_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def stats(df: org.apache.spark.sql.DataFrame, k: String) =
        df.agg(count(lit(1)).as("n"), countDistinct(k).as("d"))
      def actual(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
          lk: String, rk: String) =
        l.join(r, col(lk) === col(rk)).agg(count(lit(1)).as("a"))
      def row(name: String, s1: org.apache.spark.sql.DataFrame,
          s2: org.apache.spark.sql.DataFrame, a: org.apache.spark.sql.DataFrame) =
        s1.crossJoin(s2.select(col("n").as("n2"), col("d").as("d2"))).crossJoin(a)
          .select(lit(name).as("join_name"),
            expr("(CAST(n AS DECIMAL(38,0)) * n2) div GREATEST(d, d2)").as("est"),
            col("a").as("act"))
      row("orders_customer", stats(t.orders, "o_custkey"),
          stats(t.customer, "c_custkey"),
          actual(t.orders, t.customer, "o_custkey", "c_custkey"))
        .unionAll(row("lineitem_part", stats(t.lineitem, "l_partkey"),
          stats(t.part, "p_partkey"),
          actual(t.lineitem, t.part, "l_partkey", "p_partkey")))
        .unionAll(row("lineitem_supplier", stats(t.lineitem, "l_suppkey"),
          stats(t.supplier, "s_suppkey"),
          actual(t.lineitem, t.supplier, "l_suppkey", "s_suppkey")))
        .select(col("join_name"), col("est").cast("long").as("est_rows"),
          col("act").as("actual_rows"),
          expr("CAST(1000000 * est div GREATEST(act, 1) AS BIGINT)")
            .as("est_over_act_ppm"))
        .orderBy("join_name")
    },

    // Co-partition compatibility planner: with every table bucketed at
    // its q468-computed power-of-two count on its join key, which of
    // the workhorse joins run shuffle-free? Spark elides the exchange
    // when both sides hash-partition the join key into counts where
    // one divides the other (pow2 counts make divisibility = "smaller
    // divides larger" automatically); otherwise the SMALLER side
    // repartitions. The whole advisory is arithmetic over the 4-row
    // stats table — the judge call happens before any data moves.
    QueryDef.sql(
      "q500_copartition_planner",
      """WITH stats AS (
        |  SELECT 'customer' AS tbl,
        |    CAST(SUM(len(c_name) + len(c_mktsegment) + 8 * 3) AS BIGINT) AS bytes
        |  FROM customer
        |  UNION ALL SELECT 'lineitem',
        |    CAST(SUM(len(l_returnflag) + len(l_linestatus) + 8 * 9) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'orders',
        |    CAST(SUM(len(o_orderstatus) + len(o_orderpriority) + 8 * 4) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'part',
        |    CAST(SUM(len(p_name) + len(p_brand) + len(p_type) + 8 * 3) AS BIGINT)
        |  FROM part),
        |b AS (SELECT tbl, bytes,
        |    CASE WHEN (bytes + 134217727) // 134217728 <= 1 THEN 1
        |      ELSE 1 << length(bin((bytes + 134217727) // 134217728 - 1)) END AS bk
        |  FROM stats),
        |j AS (SELECT 'customer_orders' AS join_name, 'customer' AS lt, 'orders' AS rt
        |  UNION ALL SELECT 'orders_lineitem', 'orders', 'lineitem'
        |  UNION ALL SELECT 'part_lineitem', 'part', 'lineitem')
        |SELECT j.join_name, CAST(bl.bk AS BIGINT) AS left_buckets,
        |  CAST(br.bk AS BIGINT) AS right_buckets,
        |  CAST(CASE WHEN bl.bk % br.bk = 0 OR br.bk % bl.bk = 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS shuffle_free,
        |  CASE WHEN bl.bk = br.bk THEN 'none'
        |    WHEN bl.bk < br.bk THEN j.lt ELSE j.rt END AS repartition_side
        |FROM j JOIN b bl ON j.lt = bl.tbl JOIN b br ON j.rt = br.tbl
        |ORDER BY join_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def st(name: String, df: org.apache.spark.sql.DataFrame,
          rowBytes: org.apache.spark.sql.Column) =
        df.agg(sum(rowBytes).cast("long").as("bytes"))
          .select(lit(name).as("tbl"), col("bytes"))
      val b =
        st("customer", t.customer,
          length(col("c_name")) + length(col("c_mktsegment")) + lit(24)).unionAll(
        st("lineitem", t.lineitem,
          length(col("l_returnflag")) + length(col("l_linestatus")) + lit(72))).unionAll(
        st("orders", t.orders,
          length(col("o_orderstatus")) + length(col("o_orderpriority")) + lit(32))).unionAll(
        st("part", t.part,
          length(col("p_name")) + length(col("p_brand")) + length(col("p_type")) + lit(24)))
        .withColumn("bk", when(expr("(bytes + 134217727) div 134217728") <= 1, 1L)
          .otherwise(expr("shiftleft(1L, length(bin((bytes + 134217727) div 134217728 - 1)))")))
      import s.implicits._
      val j = Seq(("customer_orders", "customer", "orders"),
        ("orders_lineitem", "orders", "lineitem"),
        ("part_lineitem", "part", "lineitem")).toDF("join_name", "lt", "rt")
      j.join(b.select(col("tbl").as("lt"), col("bk").as("blk")), "lt")
        .join(b.select(col("tbl").as("rt"), col("bk").as("brk")), "rt")
        .select(col("join_name"), col("blk").as("left_buckets"),
          col("brk").as("right_buckets"),
          when(col("blk") % col("brk") === 0 || col("brk") % col("blk") === 0, 1L)
            .otherwise(0L).as("shuffle_free"),
          when(col("blk") === col("brk"), lit("none"))
            .when(col("blk") < col("brk"), col("lt")).otherwise(col("rt"))
            .as("repartition_side"))
        .orderBy("join_name")
    },

    // Per-dimension embedding feature stats (the whitening/pruning
    // audit): exact scaled mean, variance (n·Σx²−(Σx)² form) and the
    // range²/variance ratio per dimension — dims with tiny variance
    // are pruning candidates, dims with a huge range-to-variance ratio
    // hide outliers a cosine metric will amplify. One dimension-explode
    // pass (64 rows per vector), one 64-row combine; every statistic is
    // DECIMAL-exact, no sqrt anywhere.
    QueryDef.sql(
      "q501_embedding_dim_stats",
      """WITH ev AS (SELECT i AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |g AS (SELECT dim, COUNT(*) AS n, SUM(x) AS s,
        |    SUM(CAST(x AS HUGEINT) * x) AS ss, MIN(x) AS lo, MAX(x) AS hi
        |  FROM ev GROUP BY 1)
        |SELECT dim, CAST(s // n AS BIGINT) AS mean_scaled,
        |  CAST((n * ss - CAST(s AS HUGEINT) * s) // (CAST(n AS HUGEINT) * n)
        |    AS BIGINT) AS var_scaled2,
        |  CAST(hi - lo AS BIGINT) AS range_scaled,
        |  CAST((1000 * CAST(hi - lo AS HUGEINT) * (hi - lo))
        |    // GREATEST((n * ss - CAST(s AS HUGEINT) * s)
        |      // (CAST(n AS HUGEINT) * n), 1) AS BIGINT) AS range_ratio_milli
        |FROM g ORDER BY dim""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).embeddings
        .select(posexplode(col("embedding")))
        .select((col("pos") + 1).as("dim"),
          floor(col("col").cast("double") * lit(1000000.0)).cast("long").as("x"))
      ev.groupBy("dim")
        .agg(count(lit(1)).as("n"), sum("x").as("s"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("ss"),
          min("x").as("lo"), max("x").as("hi"))
        .select(col("dim").cast("long").as("dim"),
          expr("CAST(s div n AS BIGINT)").as("mean_scaled"),
          expr("CAST((n * ss - CAST(s AS DECIMAL(38,0)) * s)" +
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("var_scaled2"),
          (col("hi") - col("lo")).as("range_scaled"),
          expr("CAST((1000 * CAST(hi - lo AS DECIMAL(38,0)) * (hi - lo))" +
            " div GREATEST((n * ss - CAST(s AS DECIMAL(38,0)) * s)" +
            " div (CAST(n AS DECIMAL(38,0)) * n), 1) AS BIGINT)")
            .as("range_ratio_milli"))
        .orderBy("dim")
    },

    // Session-gap sensitivity sweep: sessionize the SAME event log at
    // 10/30/60-minute inactivity gaps and report how session count,
    // mean length, and the singleton share respond — the threshold
    // audit that should precede any fixed-gap sessionization (q7 uses
    // 30 min; this query prices that choice). One lag window computes
    // the inter-event microseconds once; each gap is then a pure
    // projection + island aggregation over the same frame — three
    // sweeps, one sort.
    QueryDef.sql(
      "q502_session_gap_sweep",
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_us
        |  FROM events),
        |g(gap_s) AS (VALUES (600), (1800), (3600)),
        |s AS (SELECT g.gap_s, e.user_id,
        |    CASE WHEN e.prev_us IS NULL
        |      OR e.us - e.prev_us > CAST(g.gap_s AS BIGINT) * 1000000
        |      THEN 1 ELSE 0 END AS is_new,
        |    e.ts, e.event_id
        |  FROM e CROSS JOIN g),
        |sid AS (SELECT gap_s, user_id,
        |    SUM(is_new) OVER (PARTITION BY gap_s, user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |ses AS (SELECT gap_s, user_id, session_id, COUNT(*) AS n FROM sid
        |  GROUP BY 1, 2, 3),
        |agg AS (SELECT gap_s, COUNT(*) AS n_sessions, SUM(n) AS n_events,
        |    SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS singletons
        |  FROM ses GROUP BY 1)
        |SELECT CAST(gap_s AS BIGINT) AS gap_s, CAST(n_sessions AS BIGINT) AS n_sessions,
        |  CAST((1000 * CAST(n_events AS HUGEINT)) // n_sessions AS BIGINT)
        |    AS mean_len_milli,
        |  CAST(1000000 * singletons // n_sessions AS BIGINT) AS singleton_ppm
        |FROM agg ORDER BY gap_s""".stripMargin) { (s, dir) =>
      import s.implicits._
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val e = Tables(s, dir).events
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag("us", 1).over(byUser))
      val gaps = Seq(600L, 1800L, 3600L).toDF("gap_s")
      val sid = e.crossJoin(broadcast(gaps))
        .withColumn("is_new", when(col("prev_us").isNull ||
          col("us") - col("prev_us") > col("gap_s") * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_new").over(
          Window.partitionBy("gap_s", "user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sid.groupBy("gap_s", "user_id", "session_id").agg(count(lit(1)).as("n"))
        .groupBy("gap_s")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("singletons"))
        .select(col("gap_s"), col("n_sessions"),
          expr("CAST((1000 * CAST(n_events AS DECIMAL(38,0))) div n_sessions" +
            " AS BIGINT)").as("mean_len_milli"),
          expr("CAST(1000000 * singletons div n_sessions AS BIGINT)")
            .as("singleton_ppm"))
        .orderBy("gap_s")
    },

    // Good-Toulmin unseen-vocabulary extrapolation: if the corpus
    // DOUBLED, how many new distinct tokens would appear? The 1953
    // estimator is the alternating sum Σ(−1)^{r+1}·N_r over the
    // frequency-of-frequencies — the capacity-planning companion to
    // q463's Good-Turing discounts (same N_r table, different
    // question) and the extrapolating sibling of q412's Chao1 lower
    // bound. Heavy work is one token-count aggregate; the estimator
    // folds a table of ≲√corpus rows.
    QueryDef.sql(
      "q503_good_toulmin",
      """WITH nrm AS (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
        |  FROM documents),
        |tok AS (SELECT unnest(string_split(nt, ' ')) AS term FROM nrm),
        |tc AS (SELECT term, COUNT(*) AS r FROM tok WHERE len(term) > 0 GROUP BY 1),
        |ff AS (SELECT r, COUNT(*) AS nr FROM tc GROUP BY 1),
        |a AS (SELECT SUM(CASE WHEN r % 2 = 1 THEN nr ELSE -nr END) AS gt,
        |    SUM(nr) AS d, SUM(CASE WHEN r = 1 THEN nr ELSE 0 END) AS n1,
        |    SUM(r * nr) AS n_tokens
        |  FROM ff)
        |SELECT CAST(n_tokens AS BIGINT) AS n_tokens, CAST(d AS BIGINT) AS distinct_terms,
        |  CAST(n1 AS BIGINT) AS n1, CAST(GREATEST(gt, 0) AS BIGINT) AS gt_expected_new,
        |  CAST(1000000 * GREATEST(gt, 0) // d AS BIGINT) AS new_ratio_ppm
        |FROM a""".stripMargin) { (s, dir) =>
      val ff = Tables(s, dir).documents
        .select(explode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "))
          .as("term"))
        .where(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("r"))
        .groupBy("r").agg(count(lit(1)).as("nr"))
      ff.agg(
          sum(when(col("r") % 2 === 1, col("nr")).otherwise(-col("nr"))).as("gt"),
          sum("nr").as("d"),
          sum(when(col("r") === 1, col("nr")).otherwise(0L)).as("n1"),
          sum(col("r") * col("nr")).as("n_tokens"))
        .select(col("n_tokens"), col("d").as("distinct_terms"), col("n1"),
          greatest(col("gt"), lit(0L)).as("gt_expected_new"),
          expr("CAST(1000000 * GREATEST(gt, 0) div d AS BIGINT)").as("new_ratio_ppm"))
    },

    // Differential-privacy budget composition table: for k = 1..10
    // ε₀ = 0.1 mechanisms, the naive bound k·ε₀ against the advanced
    // composition bound ε₀√(2k·ln(1/δ)) + k·ε₀(e^{ε₀}−1) at δ = 10⁻⁵ —
    // the accountant's crossover table that says WHEN the √k bound
    // starts paying for its δ. Constants ln(1/δ) = 11.512925 and
    // e^{0.1}−1 = 0.105171 are baked (micro-scaled) on both engines;
    // the square root is the floor-corrected integer sqrt (q460's
    // idiom) so every row is engine-exact.
    QueryDef.sql(
      "q504_dp_composition",
      """WITH k AS (SELECT * FROM generate_series(1, 10) t(k)),
        |s0 AS (SELECT k, 23025850 * k AS m,
        |    CAST(FLOOR(SQRT(CAST(23025850 * k AS DOUBLE))) AS BIGINT) AS r0 FROM k),
        |s1 AS (SELECT k, m,
        |    r0 + CASE WHEN (r0 + 1) * (r0 + 1) <= m THEN 1 ELSE 0 END
        |       - CASE WHEN r0 * r0 > m THEN 1 ELSE 0 END AS r FROM s0)
        |SELECT CAST(k AS BIGINT) AS k, CAST(100 * k AS BIGINT) AS basic_milli,
        |  CAST(r // 10 + (10517 * k) // 100 AS BIGINT) AS advanced_milli,
        |  CAST(CASE WHEN r // 10 + (10517 * k) // 100 < 100 * k
        |    THEN 1 ELSE 0 END AS BIGINT) AS advanced_wins
        |FROM s1 ORDER BY k""".stripMargin) { (s, dir) =>
      val k = s.range(1, 11).select(col("id").as("k"))
      k.withColumn("m", lit(23025850L) * col("k"))
        .withColumn("r0", expr("CAST(FLOOR(SQRT(CAST(m AS DOUBLE))) AS BIGINT)"))
        .withColumn("r", col("r0")
          + when((col("r0") + 1) * (col("r0") + 1) <= col("m"), 1L).otherwise(0L)
          - when(col("r0") * col("r0") > col("m"), 1L).otherwise(0L))
        .select(col("k"), (lit(100L) * col("k")).as("basic_milli"),
          expr("r div 10 + (10517 * k) div 100").as("advanced_milli"),
          when(expr("r div 10 + (10517 * k) div 100") < lit(100L) * col("k"), 1L)
            .otherwise(0L).as("advanced_wins"))
        .orderBy("k")
    },

    // Outlier dimension blame: for the 5 embedding vectors whose worst
    // per-dimension deviation is most extreme, WHICH dimension is to
    // blame — the explainability step after any outlier detector
    // (q470's LOF says "this point is odd"; this says "dimension 17 is
    // why"). Deviation is the exact (x−μ_d)²·1000/σ²_d ratio against
    // q501's per-dim moments (a 64-row broadcast); per-vector argmax is
    // one partitioned window, the top-5 a TakeOrdered — the corpus is
    // scanned twice (moments, scoring), never joined to itself.
    QueryDef.sql(
      "q505_outlier_blame",
      """WITH ev AS (SELECT vec_id, i AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |g AS (SELECT dim, COUNT(*) AS n, SUM(x) AS s,
        |    SUM(CAST(x AS HUGEINT) * x) AS ss FROM ev GROUP BY 1),
        |m AS (SELECT dim, s // n AS mu,
        |    GREATEST((n * ss - CAST(s AS HUGEINT) * s) // (CAST(n AS HUGEINT) * n), 1)
        |      AS v FROM g),
        |z AS (SELECT ev.vec_id, ev.dim,
        |    (1000 * CAST(ev.x - m.mu AS HUGEINT) * (ev.x - m.mu)) // m.v AS ratio
        |  FROM ev JOIN m ON ev.dim = m.dim),
        |top AS (SELECT vec_id, dim, ratio FROM (
        |    SELECT vec_id, dim, ratio,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ratio DESC, dim) AS rk
        |    FROM z) WHERE rk = 1)
        |SELECT vec_id, CAST(dim AS BIGINT) AS blame_dim,
        |  CAST(ratio AS BIGINT) AS ratio_milli
        |FROM top ORDER BY ratio DESC, vec_id LIMIT 5""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("dim"),
          floor(col("col").cast("double") * lit(1000000.0)).cast("long").as("x"))
      val m = ev.groupBy("dim")
        .agg(count(lit(1)).as("n"), sum("x").as("s"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("ss"))
        .select(col("dim"), expr("s div n").as("mu"),
          expr("GREATEST((n * ss - CAST(s AS DECIMAL(38,0)) * s)" +
            " div (CAST(n AS DECIMAL(38,0)) * n), 1)").as("v"))
      val z = ev.join(broadcast(m), "dim")
        .select(col("vec_id"), col("dim"),
          expr("(1000 * CAST(x - mu AS DECIMAL(38,0)) * (x - mu)) div v").as("ratio"))
      z.withColumn("rk", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("ratio").desc, col("dim"))))
        .where(col("rk") === 1)
        .select(col("vec_id"), col("dim").cast("long").as("blame_dim"),
          col("ratio").cast("long").as("ratio_milli"))
        .orderBy(col("ratio_milli").desc, col("vec_id"))
        .limit(5)
    },

    // Class-balance resampling plan: per embedding label, the exact
    // keep-rate that levels every class down to the rarest one
    // (undersampling) and the duplication factor that levels up to the
    // most common (oversampling) — the two standard prescriptions for
    // skewed training labels, priced from one 10-row count aggregate
    // so the actual resample (a q442-style PPS pass) runs with known
    // budgets. Rates are exact ppm/milli divisions off broadcast
    // min/max scalars.
    QueryDef.sql(
      "q506_class_balance_plan",
      """WITH g AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
        |x AS (SELECT MIN(n) AS mn, MAX(n) AS mx FROM g)
        |SELECT g.label, CAST(g.n AS BIGINT) AS n,
        |  CAST(1000000 * x.mn // g.n AS BIGINT) AS under_keep_ppm,
        |  CAST((1000 * x.mx) // g.n AS BIGINT) AS over_factor_milli,
        |  CAST(x.mn AS BIGINT) AS under_target, CAST(x.mx AS BIGINT) AS over_target
        |FROM g, x ORDER BY g.label""".stripMargin) { (s, dir) =>
      val g = Tables(s, dir).embeddings.groupBy("label")
        .agg(count(lit(1)).as("n"))
      val x = g.agg(min("n").as("mn"), max("n").as("mx"))
      g.crossJoin(broadcast(x))
        .select(col("label"), col("n"),
          expr("CAST(1000000 * mn div n AS BIGINT)").as("under_keep_ppm"),
          expr("CAST((1000 * mx) div n AS BIGINT)").as("over_factor_milli"),
          col("mn").as("under_target"), col("mx").as("over_target"))
        .orderBy("label")
    },

    // Rack-aware replica placement audit: 64 shards × 3 replicas over
    // 8 nodes by rendezvous ranking (top-3 md5 scores per shard — the
    // multi-replica extension of q414's single-owner HRW), with the
    // blast-radius census: primaries and totals per node, plus the
    // worst pairwise shard co-residency — the number that says how
    // many shards lose TWO replicas when that node pair dies. The
    // placement table is 64×8 = 512 scored rows; every audit after is
    // metadata-sized.
    QueryDef.sql(
      "q507_replica_placement",
      """WITH sh AS (SELECT * FROM generate_series(0, 63) t(sid)),
        |nd AS (SELECT * FROM generate_series(0, 7) t(nid)),
        |sc AS (SELECT sh.sid, nd.nid,
        |    ('0x' || substr(md5(sh.sid || '@n' || nd.nid), 1, 12))::BIGINT AS score
        |  FROM sh, nd),
        |rk AS (SELECT sid, nid,
        |    ROW_NUMBER() OVER (PARTITION BY sid ORDER BY score DESC, nid) AS rk
        |  FROM sc),
        |rep AS (SELECT sid, nid, rk FROM rk WHERE rk <= 3),
        |co AS (SELECT a.nid AS na, b.nid AS nb, COUNT(*) AS shared
        |  FROM rep a JOIN rep b ON a.sid = b.sid AND a.nid < b.nid
        |  GROUP BY 1, 2),
        |mx AS (SELECT MAX(shared) AS worst_pair_shared FROM co)
        |SELECT CAST(r.nid AS BIGINT) AS node,
        |  CAST(SUM(CASE WHEN r.rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_primary,
        |  CAST(COUNT(*) AS BIGINT) AS n_total,
        |  (SELECT CAST(worst_pair_shared AS BIGINT) FROM mx) AS worst_pair_shared
        |FROM rep r GROUP BY r.nid ORDER BY node""".stripMargin) { (s, dir) =>
      val sc = s.range(64).select(col("id").as("sid"))
        .crossJoin(s.range(8).select(col("id").as("nid")))
        .select(col("sid"), col("nid"),
          expr("CAST(conv(substring(md5(concat(sid, '@n', nid)), 1, 12), 16, 10)" +
            " AS BIGINT)").as("score"))
      val rep = sc.withColumn("rk", row_number().over(
          Window.partitionBy("sid").orderBy(col("score").desc, col("nid"))))
        .where(col("rk") <= 3)
      val co = rep.select(col("sid"), col("nid").as("na"))
        .join(rep.select(col("sid"), col("nid").as("nb")), "sid")
        .where(col("na") < col("nb"))
        .groupBy("na", "nb").agg(count(lit(1)).as("shared"))
      val mx = co.agg(max("shared").as("worst_pair_shared"))
      rep.groupBy(col("nid").as("node"))
        .agg(sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_primary"),
          count(lit(1)).as("n_total"))
        .crossJoin(broadcast(mx))
        .select(col("node"), col("n_primary"), col("n_total"),
          col("worst_pair_shared"))
        .orderBy("node")
    },

    // Beta-smoothed CTR ranking (empirical-Bayes for rates — the rate
    // companion to q471's mean shrinkage): per-user click-through
    // (clicks / views) shrunk toward the prior α=5, β=95 — raw CTR
    // ranks a 1-view-1-click user first; the smoothed (c+α)/(v+α+β)
    // rank is what production rankers actually use. One conditional-
    // count pass per user, exact ppm divisions, top 10 by smoothed
    // rate with the raw rate alongside to show the re-ranking.
    QueryDef.sql(
      "q508_smoothed_ctr",
      """WITH u AS (SELECT user_id,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1),
        |f AS (SELECT user_id, v, c,
        |    (1000000 * c) // GREATEST(v, 1) AS raw_ppm,
        |    (1000000 * (c + 5)) // (v + 100) AS smoothed_ppm
        |  FROM u WHERE v > 0)
        |SELECT user_id, CAST(v AS BIGINT) AS views, CAST(c AS BIGINT) AS clicks,
        |  CAST(raw_ppm AS BIGINT) AS raw_ppm, CAST(smoothed_ppm AS BIGINT) AS smoothed_ppm
        |FROM f ORDER BY smoothed_ppm DESC, user_id LIMIT 10""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events.groupBy("user_id")
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"))
      u.where(col("v") > 0)
        .select(col("user_id"), col("v").as("views"), col("c").as("clicks"),
          expr("(1000000 * c) div GREATEST(v, 1)").as("raw_ppm"),
          expr("(1000000 * (c + 5)) div (v + 100)").as("smoothed_ppm"))
        .orderBy(col("smoothed_ppm").desc, col("user_id"))
        .limit(10)
    },

    // Funnel-step contrast with exact two-proportion z²: does the odd-
    // user segment convert view→click and click→purchase at different
    // rates than the even segment? z² = (c₁n₂−c₂n₁)²·N /
    // (n₁n₂·(c₁+c₂)·(N−c₁−c₂)) — q461's squared-comparison idiom at
    // the funnel-step grain, flagged at the χ²₁ 5% threshold (3.841,
    // baked). One per-user existence pass (capture flags again), two
    // 2×2 cell assemblies — the fact table is scanned once.
    QueryDef.sql(
      "q509_funnel_contrast",
      """WITH u AS (SELECT user_id, user_id % 2 AS seg,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT 'view_to_click' AS step, seg,
        |    SUM(hv) AS n, SUM(hv * hc) AS c FROM u GROUP BY 1, 2
        |  UNION ALL SELECT 'click_to_purchase', seg,
        |    SUM(hc), SUM(hc * hp) FROM u GROUP BY 1, seg),
        |w AS (SELECT s1.step, s1.n AS n1, s1.c AS c1, s2.n AS n2, s2.c AS c2
        |  FROM st s1 JOIN st s2 ON s1.step = s2.step AND s1.seg = 1 AND s2.seg = 0),
        |z AS (SELECT step, n1, c1, n2, c2,
        |    (1000 * CAST(c1 * n2 - c2 * n1 AS HUGEINT)
        |      * (c1 * n2 - c2 * n1) * (n1 + n2))
        |      // (CAST(n1 AS HUGEINT) * n2 * GREATEST(c1 + c2, 1)
        |        * GREATEST(n1 + n2 - c1 - c2, 1)) AS z2_milli
        |  FROM w)
        |SELECT step, CAST(n1 AS BIGINT) AS n_treat, CAST(n2 AS BIGINT) AS n_control,
        |  CAST(1000000 * c1 // GREATEST(n1, 1) AS BIGINT) AS rate_treat_ppm,
        |  CAST(1000000 * c2 // GREATEST(n2, 1) AS BIGINT) AS rate_control_ppm,
        |  CAST(z2_milli AS BIGINT) AS z2_milli,
        |  CAST(CASE WHEN z2_milli > 3841 THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM z ORDER BY step""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events.groupBy(col("user_id"),
          (col("user_id") % 2).as("seg"))
        .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("hv"),
          max(when(col("event_type") === "click", 1L).otherwise(0L)).as("hc"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("hp"))
      def step(name: String, nCol: org.apache.spark.sql.Column,
          cCol: org.apache.spark.sql.Column) = u.groupBy("seg")
        .agg(sum(nCol).as("n"), sum(cCol).as("c"))
        .select(lit(name).as("step"), col("seg"), col("n"), col("c"))
      val st = step("view_to_click", col("hv"), col("hv") * col("hc"))
        .unionAll(step("click_to_purchase", col("hc"), col("hc") * col("hp")))
      val w = st.where(col("seg") === 1)
        .select(col("step"), col("n").as("n1"), col("c").as("c1"))
        .join(st.where(col("seg") === 0)
          .select(col("step"), col("n").as("n2"), col("c").as("c2")), "step")
      w.select(col("step"), col("n1"), col("c1"), col("n2"), col("c2"),
          expr("(1000 * CAST(c1 * n2 - c2 * n1 AS DECIMAL(38,0))" +
            " * (c1 * n2 - c2 * n1) * (n1 + n2))" +
            " div (CAST(n1 AS DECIMAL(38,0)) * n2 * GREATEST(c1 + c2, 1)" +
            " * GREATEST(n1 + n2 - c1 - c2, 1))").as("z2_milli"))
        .select(col("step"), col("n1").as("n_treat"), col("n2").as("n_control"),
          expr("CAST(1000000 * c1 div GREATEST(n1, 1) AS BIGINT)")
            .as("rate_treat_ppm"),
          expr("CAST(1000000 * c2 div GREATEST(n2, 1) AS BIGINT)")
            .as("rate_control_ppm"),
          col("z2_milli").cast("long").as("z2_milli"),
          when(col("z2_milli") > 3841, 1L).otherwise(0L).as("significant"))
        .orderBy("step")
    },

    // Quantile-based robust shape statistics: Bowley skewness
    // (q₃+q₁−2·med)/(q₃−q₁) and Moors kurtosis ((e₇−e₅)+(e₃−e₁))/
    // (e₆−e₂) from the 7 octile order statistics — the shape
    // descriptors that survive heavy tails where moment-based skew/
    // kurtosis (q98) explode. All octiles come from ONE row_number
    // window per group (7 conditional MINs at ⌈n·i/8⌉ ranks — q152's
    // convention), the ratios are exact milli divisions.
    QueryDef.sql(
      "q510_robust_shape",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100.0) AS BIGINT) AS c FROM events),
        |q AS (SELECT event_type, COUNT(*) AS n,
        |    quantile_disc(c, 0.125) AS e1, quantile_disc(c, 0.25) AS e2,
        |    quantile_disc(c, 0.375) AS e3, quantile_disc(c, 0.5) AS e4,
        |    quantile_disc(c, 0.625) AS e5, quantile_disc(c, 0.75) AS e6,
        |    quantile_disc(c, 0.875) AS e7
        |  FROM e GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST((1000 * (e6 + e2 - 2 * e4)) // GREATEST(e6 - e2, 1) AS BIGINT)
        |    AS bowley_milli,
        |  CAST((1000 * ((e7 - e5) + (e3 - e1))) // GREATEST(e6 - e2, 1) AS BIGINT)
        |    AS moors_milli
        |FROM q ORDER BY event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("c"))
      val w = Window.partitionBy("event_type").orderBy("c")
      val idx = e.select(col("event_type"), col("c"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("event_type")).as("n"))
      def oct(i: Int) =
        min(when(col("rn") === expr(s"(n * $i + 7) div 8"), col("c"))).as(s"e$i")
      idx.groupBy("event_type", "n")
        .agg(oct(1), oct(2), oct(3), oct(4), oct(5), oct(6), oct(7))
        .select(col("event_type"), col("n"),
          expr("CAST((1000 * (e6 + e2 - 2 * e4)) div GREATEST(e6 - e2, 1) AS BIGINT)")
            .as("bowley_milli"),
          expr("CAST((1000 * ((e7 - e5) + (e3 - e1))) div GREATEST(e6 - e2, 1)" +
            " AS BIGINT)").as("moors_milli"))
        .orderBy("event_type")
    },

    // Sorted-run read-amplification probe: treat each order-month as a
    // sorted run with a [min, max] custkey zone, then stab 64 evenly
    // spaced probe keys through the run set — the overlap count at
    // each probe IS the number of files a point lookup must open in an
    // LSM/compaction layout (q493 prices write amp; this measures the
    // read side). The run table is ~80 metadata rows (one per order
    // month) broadcast against the probe spine; no fact-table access
    // beyond the one stats pass.
    QueryDef.sql(
      "q511_read_amp",
      """WITH runs AS (SELECT strftime(o_orderdate, '%Y-%m') AS run,
        |    MIN(o_custkey) AS lo, MAX(o_custkey) AS hi
        |  FROM orders GROUP BY 1),
        |b AS (SELECT MIN(lo) AS glo, MAX(hi) AS ghi FROM runs),
        |p AS (SELECT i AS probe_id,
        |    b.glo + (i * (b.ghi - b.glo)) // 64 AS key
        |  FROM generate_series(0, 63) t(i), b)
        |SELECT p.probe_id, CAST(p.key AS BIGINT) AS key,
        |  CAST(COUNT(r.run) AS BIGINT) AS n_overlapping
        |FROM p LEFT JOIN runs r ON p.key BETWEEN r.lo AND r.hi
        |GROUP BY 1, 2 ORDER BY probe_id""".stripMargin) { (s, dir) =>
      val runs = Tables(s, dir).orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("run"))
        .agg(min("o_custkey").as("lo"), max("o_custkey").as("hi"))
      val b = runs.agg(min("lo").as("glo"), max("hi").as("ghi"))
      val p = s.range(64).select(col("id").as("probe_id"))
        .crossJoin(broadcast(b))
        .select(col("probe_id"),
          expr("glo + (probe_id * (ghi - glo)) div 64").as("key"))
      p.join(broadcast(runs), col("key").between(col("lo"), col("hi")), "left")
        .groupBy("probe_id", "key")
        .agg(count(col("run")).as("n_overlapping"))
        .orderBy("probe_id")
    },

    // Checkpoint-interval advisor (Young's approximation): with a 30 s
    // checkpoint cost and an MTBF sweep of 1 h / 6 h / 24 h, the
    // optimal interval is √(2·C·MTBF) and the steady-state overhead is
    // C/τ + τ/(2·MTBF) — the formula every long training run and
    // streaming job sizes its checkpoint cadence with. The square root
    // is the floor-corrected integer sqrt (q460's idiom); overheads
    // are exact ppm sums — a 3-row advisory, zero data access.
    QueryDef.sql(
      "q512_checkpoint_advisor",
      """WITH m(mtbf_s) AS (VALUES (3600), (21600), (86400)),
        |s0 AS (SELECT mtbf_s, CAST(2 * 30 AS BIGINT) * mtbf_s AS x,
        |    CAST(FLOOR(SQRT(CAST(CAST(2 * 30 AS BIGINT) * mtbf_s AS DOUBLE)))
        |      AS BIGINT) AS r0 FROM m),
        |s1 AS (SELECT mtbf_s, x,
        |    r0 + CASE WHEN (r0 + 1) * (r0 + 1) <= x THEN 1 ELSE 0 END
        |       - CASE WHEN r0 * r0 > x THEN 1 ELSE 0 END AS tau FROM s0)
        |SELECT CAST(mtbf_s AS BIGINT) AS mtbf_s, CAST(tau AS BIGINT) AS tau_opt_s,
        |  CAST((1000000 * 30) // tau + (1000000 * tau) // (2 * CAST(mtbf_s AS BIGINT))
        |    AS BIGINT) AS overhead_ppm
        |FROM s1 ORDER BY mtbf_s""".stripMargin) { (s, dir) =>
      import s.implicits._
      val m = Seq(3600L, 21600L, 86400L).toDF("mtbf_s")
      m.withColumn("x", lit(60L) * col("mtbf_s"))
        .withColumn("r0", expr("CAST(FLOOR(SQRT(CAST(x AS DOUBLE))) AS BIGINT)"))
        .withColumn("tau", col("r0")
          + when((col("r0") + 1) * (col("r0") + 1) <= col("x"), 1L).otherwise(0L)
          - when(col("r0") * col("r0") > col("x"), 1L).otherwise(0L))
        .select(col("mtbf_s"), col("tau").as("tau_opt_s"),
          expr("CAST((1000000 * 30) div tau + (1000000 * tau) div (2 * mtbf_s)" +
            " AS BIGINT)").as("overhead_ppm"))
        .orderBy("mtbf_s")
    },

    // Quorum configuration matrix: for N = 3 and N = 5 replicas, every
    // (R, W) combination with its consistency and availability
    // verdicts — R+W > N guarantees read-your-writes intersection,
    // W ≤ N−1 keeps writes available through one failure, N−W bounds
    // how many replicas a sloppy read can find stale. The table every
    // storage-system design review draws on a whiteboard, emitted as a
    // 34-row advisory with zero data access.
    QueryDef.sql(
      "q513_quorum_matrix",
      """WITH n(nn) AS (VALUES (3), (5)),
        |c AS (SELECT nn, r.r, w.w FROM n,
        |  generate_series(1, 5) r(r), generate_series(1, 5) w(w)
        |  WHERE r.r <= nn AND w.w <= nn)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(r AS BIGINT) AS r, CAST(w AS BIGINT) AS w,
        |  CAST(CASE WHEN r + w > nn THEN 1 ELSE 0 END AS BIGINT) AS strong,
        |  CAST(CASE WHEN w <= nn - 1 THEN 1 ELSE 0 END AS BIGINT) AS write_avail_f1,
        |  CAST(CASE WHEN r <= nn - 1 THEN 1 ELSE 0 END AS BIGINT) AS read_avail_f1,
        |  CAST(nn - w AS BIGINT) AS max_stale_replicas
        |FROM c ORDER BY n, r, w""".stripMargin) { (s, dir) =>
      import s.implicits._
      val n = Seq(3L, 5L).toDF("nn")
      val r = s.range(1, 6).select(col("id").as("r"))
      val w = s.range(1, 6).select(col("id").as("w"))
      n.crossJoin(r).crossJoin(w)
        .where(col("r") <= col("nn") && col("w") <= col("nn"))
        .select(col("nn").as("n"), col("r"), col("w"),
          when(col("r") + col("w") > col("nn"), 1L).otherwise(0L).as("strong"),
          when(col("w") <= col("nn") - 1, 1L).otherwise(0L).as("write_avail_f1"),
          when(col("r") <= col("nn") - 1, 1L).otherwise(0L).as("read_avail_f1"),
          (col("nn") - col("w")).as("max_stale_replicas"))
        .orderBy("n", "r", "w")
    },

    // M/M/1 queueing advisor: at a service rate of 100 req/s, sweep
    // arrival rates up the utilization curve and emit the exact
    // rational Lq = ρ²/(1−ρ) and Wq = λ/(μ(μ−λ)) — the knee of this
    // table (Wq exploding past ρ ≈ 0.9) is THE capacity-planning
    // argument against running ingestion hot. Pure integer rationals
    // over a 5-row spine; zero data access — the advisory family's
    // (q512, q513) queueing member.
    QueryDef.sql(
      "q514_queueing_advisor",
      """WITH l(lam) AS (VALUES (50), (80), (90), (95), (99))
        |SELECT CAST(lam AS BIGINT) AS lambda_rps,
        |  CAST(10000 * lam AS BIGINT) AS rho_ppm,
        |  CAST((1000 * CAST(lam AS BIGINT) * lam) // (100 * (100 - lam)) AS BIGINT)
        |    AS lq_milli,
        |  CAST((1000000 * CAST(lam AS BIGINT)) // (100 * (100 - lam)) AS BIGINT)
        |    AS wq_micros
        |FROM l ORDER BY lambda_rps""".stripMargin) { (s, dir) =>
      import s.implicits._
      Seq(50L, 80L, 90L, 95L, 99L).toDF("lam")
        .select(col("lam").as("lambda_rps"),
          (lit(10000L) * col("lam")).as("rho_ppm"),
          expr("(1000 * lam * lam) div (100 * (100 - lam))").as("lq_milli"),
          expr("(1000000 * lam) div (100 * (100 - lam))").as("wq_micros"))
        .orderBy("lambda_rps")
    },

    // G-counter CRDT merge audit: three replicas each observe only two
    // of three origin shards (a partition), so their local totals
    // disagree; merging by per-origin MAX — the G-counter join — must
    // converge every replica to the true global count. The per-origin
    // counters are one grouped count; replica visibility is a 6-row
    // membership table; the audit proves convergence ≡ the CRDT's
    // commutative-idempotent merge, entirely in-plan.
    QueryDef.sql(
      "q515_gcounter_merge",
      """WITH o AS (SELECT o_orderkey % 3 AS origin, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1),
        |vis(replica, origin) AS (VALUES ('A', 0), ('A', 1), ('B', 1), ('B', 2),
        |  ('C', 0), ('C', 2)),
        |loc AS (SELECT v.replica, SUM(o.cnt) AS visible
        |  FROM vis v JOIN o ON v.origin = o.origin GROUP BY 1),
        |mx AS (SELECT origin, MAX(cnt) AS m FROM (
        |    SELECT v.origin, o.cnt FROM vis v JOIN o ON v.origin = o.origin) GROUP BY 1),
        |conv AS (SELECT SUM(m) AS merged FROM mx)
        |SELECT l.replica, CAST(l.visible AS BIGINT) AS visible_before,
        |  (SELECT CAST(merged AS BIGINT) FROM conv) AS converged_after
        |FROM loc l ORDER BY replica""".stripMargin) { (s, dir) =>
      import s.implicits._
      val o = Tables(s, dir).orders
        .groupBy((col("o_orderkey") % 3).as("origin")).agg(count(lit(1)).as("cnt"))
      val vis = Seq(("A", 0L), ("A", 1L), ("B", 1L), ("B", 2L), ("C", 0L), ("C", 2L))
        .toDF("replica", "origin")
      val seen = vis.join(broadcast(o), "origin")
      val loc = seen.groupBy("replica").agg(sum("cnt").as("visible"))
      val conv = seen.groupBy("origin").agg(max("cnt").as("m"))
        .agg(sum("m").as("merged"))
      loc.crossJoin(broadcast(conv))
        .select(col("replica"), col("visible").as("visible_before"),
          col("merged").as("converged_after"))
        .orderBy("replica")
    },

    // Column-encoding chooser: for three order columns, measure the
    // stats each classic encoding prices on — NDV (dictionary),
    // max successive delta in storage order (delta/FOR), and run count
    // (RLE) — then pick the cheapest estimated footprint. Unifies
    // q234/q278/q280's single-encoding screens into the per-column
    // verdict a columnar writer actually makes. One window pass per
    // column for deltas/runs (storage order = orderkey), bit widths
    // via the length(bin(x)) ceil-log2 trick, all sizes exact bytes.
    QueryDef.sql(
      "q516_encoding_chooser",
      """WITH src AS (SELECT o_orderkey AS k, o_custkey AS c1,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS c2,
        |    CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS c3
        |  FROM orders),
        |longcol AS (SELECT 'o_custkey' AS col, k, c1 AS v FROM src
        |  UNION ALL SELECT 'o_totalprice_cents', k, c2 FROM src
        |  UNION ALL SELECT 'o_orderdate_days', k, c3 FROM src),
        |w AS (SELECT col, v, v - LAG(v) OVER (PARTITION BY col ORDER BY k) AS d,
        |    CASE WHEN v = LAG(v) OVER (PARTITION BY col ORDER BY k)
        |      THEN 0 ELSE 1 END AS newrun
        |  FROM longcol),
        |g AS (SELECT col, COUNT(*) AS n, COUNT(DISTINCT v) AS ndv,
        |    MAX(ABS(COALESCE(d, 0))) AS maxd, SUM(newrun) AS runs,
        |    MAX(v) - MIN(v) AS rng
        |  FROM w GROUP BY 1),
        |bits AS (SELECT col, n, ndv, runs,
        |    CASE WHEN ndv <= 1 THEN 1 ELSE length(bin(ndv - 1)) END AS dict_bits,
        |    CASE WHEN maxd <= 0 THEN 1 ELSE length(bin(maxd)) + 1 END AS delta_bits,
        |    CASE WHEN rng <= 0 THEN 1 ELSE length(bin(rng)) END AS plain_bits
        |  FROM g),
        |est AS (SELECT col, n, ndv, runs,
        |    (n * plain_bits + 7) // 8 AS plain_bytes,
        |    (n * dict_bits + 7) // 8 + ndv * 8 AS dict_bytes,
        |    (n * delta_bits + 7) // 8 AS delta_bytes,
        |    runs * 16 AS rle_bytes
        |  FROM bits)
        |SELECT col, CAST(n AS BIGINT) AS n, CAST(ndv AS BIGINT) AS ndv,
        |  CAST(plain_bytes AS BIGINT) AS plain_bytes,
        |  CAST(dict_bytes AS BIGINT) AS dict_bytes,
        |  CAST(delta_bytes AS BIGINT) AS delta_bytes,
        |  CAST(rle_bytes AS BIGINT) AS rle_bytes,
        |  CASE WHEN rle_bytes <= LEAST(plain_bytes, dict_bytes, delta_bytes) THEN 'rle'
        |    WHEN delta_bytes <= LEAST(plain_bytes, dict_bytes) THEN 'delta'
        |    WHEN dict_bytes <= plain_bytes THEN 'dict' ELSE 'plain' END AS verdict
        |FROM est ORDER BY col""".stripMargin) { (s, dir) =>
      val src = Tables(s, dir).orders.select(col("o_orderkey").as("k"),
        col("o_custkey").as("c1"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("c2"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("c3"))
      val longcol = src.select(lit("o_custkey").as("col"), col("k"), col("c1").as("v"))
        .unionAll(src.select(lit("o_totalprice_cents").as("col"), col("k"),
          col("c2").as("v")))
        .unionAll(src.select(lit("o_orderdate_days").as("col"), col("k"),
          col("c3").as("v")))
      val wl = Window.partitionBy("col").orderBy("k")
      val w = longcol
        .withColumn("d", col("v") - lag("v", 1).over(wl))
        .withColumn("newrun",
          when(col("v") === lag("v", 1).over(wl), 0L).otherwise(1L))
      val g = w.groupBy("col")
        .agg(count(lit(1)).as("n"), countDistinct("v").as("ndv"),
          max(abs(coalesce(col("d"), lit(0L)))).as("maxd"),
          sum("newrun").as("runs"), (max("v") - min("v")).as("rng"))
      g.select(col("col"), col("n"), col("ndv"), col("runs"),
          when(col("ndv") <= 1, 1L)
            .otherwise(expr("length(bin(ndv - 1))")).as("dict_bits"),
          when(col("maxd") <= 0, 1L)
            .otherwise(expr("length(bin(maxd)) + 1")).as("delta_bits"),
          when(col("rng") <= 0, 1L)
            .otherwise(expr("length(bin(rng))")).as("plain_bits"))
        .select(col("col"), col("n"), col("ndv"),
          expr("(n * plain_bits + 7) div 8").as("plain_bytes"),
          expr("(n * dict_bits + 7) div 8 + ndv * 8").as("dict_bytes"),
          expr("(n * delta_bits + 7) div 8").as("delta_bytes"),
          (col("runs") * 16).as("rle_bytes"))
        .withColumn("verdict",
          when(col("rle_bytes") <=
            least(col("plain_bytes"), col("dict_bytes"), col("delta_bytes")), "rle")
          .when(col("delta_bytes") <= least(col("plain_bytes"), col("dict_bytes")),
            "delta")
          .when(col("dict_bytes") <= col("plain_bytes"), "dict")
          .otherwise("plain"))
        .orderBy("col")
    },

    // Re-identification uniqueness curve: what fraction of customers
    // are UNIQUE under progressively richer quasi-identifier sets
    // (nation → +segment → +balance-kilobucket)? Singleton equivalence
    // classes are the re-identifiable population — the curve's growth
    // with each added attribute is the privacy cost of releasing it
    // (the sweep view of q253/q487's fixed-QI audits). Three grouped
    // counts, each a map-side-combined aggregate; the census is exact
    // ppm.
    QueryDef.sql(
      "q517_uniqueness_risk",
      """WITH c AS (SELECT c_custkey, c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(FLOOR(c_acctbal) AS BIGINT) // 1000 AS bb FROM customer),
        |n AS (SELECT COUNT(*) AS nc FROM c),
        |l1 AS (SELECT 'q1_nation' AS qi, COUNT(*) AS n_classes,
        |    SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS singles
        |  FROM (SELECT nk, COUNT(*) AS n FROM c GROUP BY 1)),
        |l2 AS (SELECT 'q2_nation_segment', COUNT(*),
        |    SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
        |  FROM (SELECT nk, seg, COUNT(*) AS n FROM c GROUP BY 1, 2)),
        |l3 AS (SELECT 'q3_nation_segment_balance', COUNT(*),
        |    SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
        |  FROM (SELECT nk, seg, bb, COUNT(*) AS n FROM c GROUP BY 1, 2, 3)),
        |u AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)
        |SELECT u.qi, CAST(u.n_classes AS BIGINT) AS n_classes,
        |  CAST(u.singles AS BIGINT) AS unique_rows,
        |  CAST(1000000 * u.singles // n.nc AS BIGINT) AS unique_ppm
        |FROM u, n ORDER BY qi""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir).customer.select(col("c_custkey"),
        col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        expr("CAST(FLOOR(c_acctbal) AS BIGINT) div 1000").as("bb"))
      val n = c.agg(count(lit(1)).as("nc"))
      def level(name: String, keys: Seq[String]) = c
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("singles"))
        .select(lit(name).as("qi"), col("n_classes"), col("singles"))
      level("q1_nation", Seq("nk"))
        .unionAll(level("q2_nation_segment", Seq("nk", "seg")))
        .unionAll(level("q3_nation_segment_balance", Seq("nk", "seg", "bb")))
        .crossJoin(broadcast(n))
        .select(col("qi"), col("n_classes"), col("singles").as("unique_rows"),
          expr("CAST(1000000 * singles div nc AS BIGINT)").as("unique_ppm"))
        .orderBy("qi")
    },

    // Eager aggregation (the groupBy-pushdown rewrite, proven
    // differentially): revenue per order priority computed (a) join
    // lineitem→orders then aggregate, and (b) PRE-aggregate lineitem
    // to order grain first, join the ~4×-smaller intermediate, then
    // aggregate — the rewrite Catalyst doesn't apply automatically
    // that every hand-tuned star-schema query uses. Both paths are
    // emitted side by side with the join input cardinalities; the
    // match column certifies the rewrite is lossless (sums are
    // associative over the orderkey partition).
    QueryDef.sql(
      "q518_eager_aggregation",
      """WITH a AS (SELECT o.o_orderpriority AS pri,
        |    SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS rev
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |pre AS (SELECT l_orderkey,
        |    SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT o.o_orderpriority AS pri, SUM(p.cents) AS rev
        |  FROM pre p JOIN orders o ON p.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |nl AS (SELECT COUNT(*) AS n FROM lineitem),
        |np AS (SELECT COUNT(*) AS n FROM pre)
        |SELECT a.pri AS priority, CAST(a.rev AS BIGINT) AS rev_join_first,
        |  CAST(b.rev AS BIGINT) AS rev_preagg,
        |  CAST(CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS BIGINT) AS rewrite_ok,
        |  (SELECT CAST(n AS BIGINT) FROM nl) AS join_rows_plain,
        |  (SELECT CAST(n AS BIGINT) FROM np) AS join_rows_preagg
        |FROM a JOIN b ON a.pri = b.pri ORDER BY priority""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val cents = floor(col("l_extendedprice") * lit(100.0)).cast("long")
      val a = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("pri")).agg(sum(cents).as("rev_a"))
      val pre = t.lineitem.groupBy("l_orderkey").agg(sum(cents).as("cents"))
      val b = pre.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("pri")).agg(sum("cents").as("rev_b"))
      val nl = t.lineitem.agg(count(lit(1)).as("join_rows_plain"))
      val np = pre.agg(count(lit(1)).as("join_rows_preagg"))
      a.join(b, "pri")
        .crossJoin(broadcast(nl)).crossJoin(broadcast(np))
        .select(col("pri").as("priority"), col("rev_a").as("rev_join_first"),
          col("rev_b").as("rev_preagg"),
          when(col("rev_a") === col("rev_b"), 1L).otherwise(0L).as("rewrite_ok"),
          col("join_rows_plain"), col("join_rows_preagg"))
        .orderBy("priority")
    },

    // Postings-list compression audit: per-term sorted doc-id gap
    // lists priced as varint bytes (⌈bits/7⌉ per gap) against the
    // plain 8-byte encoding — the delta-compression arithmetic every
    // inverted index (q102) rests on, with the classic result that
    // COMMON terms compress hardest (dense postings ⇒ tiny gaps). One
    // lag window per term over the distinct (term, doc) relation; bit
    // widths via length(bin(gap)).
    QueryDef.sql(
      "q519_postings_compression",
      s"""WITH $tokSql,
         |post AS (SELECT DISTINCT w AS term, doc_id FROM tok WHERE len(w) > 0),
         |gaps AS (SELECT term, doc_id,
         |    doc_id - LAG(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS gap
         |  FROM post),
         |vb AS (SELECT term,
         |    CASE WHEN gap IS NULL OR gap <= 0 THEN 1
         |      ELSE (length(bin(gap)) + 6) // 7 END AS bytes
         |  FROM gaps),
         |agg AS (SELECT term, COUNT(*) AS n_docs, SUM(bytes) AS varint_bytes
         |  FROM vb GROUP BY 1)
         |SELECT term, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(8 * n_docs AS BIGINT) AS plain_bytes,
         |  CAST(varint_bytes AS BIGINT) AS varint_bytes,
         |  CAST((1000 * varint_bytes) // (8 * n_docs) AS BIGINT) AS ratio_milli
         |FROM agg ORDER BY n_docs DESC, term LIMIT 10""".stripMargin) { (s, dir) =>
      val post = tokens(Tables(s, dir))
        .where(length(col("w")) > 0)
        .select(col("w").as("term"), col("doc_id")).distinct()
      val gaps = post.withColumn("gap", col("doc_id") -
        lag("doc_id", 1).over(Window.partitionBy("term").orderBy("doc_id")))
      gaps.select(col("term"),
          when(col("gap").isNull || col("gap") <= 0, 1L)
            .otherwise(expr("(length(bin(gap)) + 6) div 7")).as("bytes"))
        .groupBy("term")
        .agg(count(lit(1)).as("n_docs"), sum("bytes").as("varint_bytes"))
        .select(col("term"), col("n_docs"), (lit(8L) * col("n_docs")).as("plain_bytes"),
          col("varint_bytes"),
          expr("(1000 * varint_bytes) div (8 * n_docs)").as("ratio_milli"))
        .orderBy(col("n_docs").desc, col("term"))
        .limit(10)
    },

    // Access-path break-even advisor: the selectivity below which an
    // index probe beats a sequential scan — sel* = pages·seq_cost /
    // (rows·random_cost) with 8 KiB pages, seq=1/page, random=4/row —
    // evaluated per table against a MEASURED probe predicate's
    // selectivity (negative account balances / low order totals / tail
    // part sizes), yielding the scan-vs-index verdict a cost-based
    // planner would emit. Byte footprints reuse q468's one-pass stats;
    // probe selectivities are conditional counts in the same pass.
    QueryDef.sql(
      "q520_access_path_advisor",
      """WITH s AS (
        |  SELECT 'customer' AS tbl, COUNT(*) AS n,
        |    CAST(SUM(len(c_name) + len(c_mktsegment) + 8 * 3) AS BIGINT) AS bytes,
        |    SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS hits FROM customer
        |  UNION ALL SELECT 'orders', COUNT(*),
        |    CAST(SUM(len(o_orderstatus) + len(o_orderpriority) + 8 * 4) AS BIGINT),
        |    SUM(CASE WHEN o_totalprice < 1000 THEN 1 ELSE 0 END) FROM orders
        |  UNION ALL SELECT 'part', COUNT(*),
        |    CAST(SUM(len(p_name) + len(p_brand) + len(p_type) + 8 * 3) AS BIGINT),
        |    SUM(CASE WHEN p_size >= 45 THEN 1 ELSE 0 END) FROM part),
        |e AS (SELECT tbl, n, hits, (bytes + 8191) // 8192 AS pages FROM s)
        |SELECT tbl, CAST(n AS BIGINT) AS n_rows, CAST(pages AS BIGINT) AS pages,
        |  CAST((1000000 * pages) // (n * 4) AS BIGINT) AS break_even_ppm,
        |  CAST((1000000 * hits) // n AS BIGINT) AS probe_sel_ppm,
        |  CAST(CASE WHEN (1000000 * hits) // n < (1000000 * pages) // (n * 4)
        |    THEN 1 ELSE 0 END AS BIGINT) AS use_index
        |FROM e ORDER BY tbl""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def st(name: String, df: org.apache.spark.sql.DataFrame,
          rowBytes: org.apache.spark.sql.Column, hit: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n"), sum(rowBytes).cast("long").as("bytes"),
          sum(when(hit, 1L).otherwise(0L)).as("hits"))
          .select(lit(name).as("tbl"), col("n"), col("bytes"), col("hits"))
      st("customer", t.customer,
          length(col("c_name")) + length(col("c_mktsegment")) + lit(24),
          col("c_acctbal") < 0)
        .unionAll(st("orders", t.orders,
          length(col("o_orderstatus")) + length(col("o_orderpriority")) + lit(32),
          col("o_totalprice") < 1000))
        .unionAll(st("part", t.part,
          length(col("p_name")) + length(col("p_brand")) + length(col("p_type")) + lit(24),
          col("p_size") >= 45))
        .withColumn("pages", expr("(bytes + 8191) div 8192"))
        .select(col("tbl"), col("n").as("n_rows"), col("pages"),
          expr("(1000000 * pages) div (n * 4)").as("break_even_ppm"),
          expr("(1000000 * hits) div n").as("probe_sel_ppm"),
          when(expr("(1000000 * hits) div n") < expr("(1000000 * pages) div (n * 4)"),
            1L).otherwise(0L).as("use_index"))
        .orderBy("tbl")
    },

    // Cluster-sampling design effect: if you sample CUSTOMERS (whole
    // clusters of orders) instead of orders, how much variance do you
    // buy? DEFF = 1 + (m̄−1)·ICC with the ANOVA intraclass correlation
    // from the exact sum decomposition SSB = Σ Sᵢ²/mᵢ − G²/N — the
    // number that converts "10 orders per sampled customer" into an
    // effective sample size (q307's Neyman allocation prices strata;
    // this prices clustering). One customer-grain aggregate, one
    // scalar assembly, all scaled DECIMAL rationals.
    QueryDef.sql(
      "q521_design_effect",
      """WITH y AS (SELECT o_custkey AS ck,
        |    CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS c FROM orders),
        |g AS (SELECT ck, COUNT(*) AS m, SUM(c) AS s FROM y GROUP BY 1),
        |t AS (SELECT (SELECT COUNT(*) FROM g) AS k, (SELECT SUM(m) FROM g) AS nn,
        |    (SELECT SUM(s) FROM g) AS gs,
        |    (SELECT SUM(CAST(c AS HUGEINT) * c) FROM y) AS ss,
        |    (SELECT SUM((CAST(s AS HUGEINT) * s) // m) FROM g) AS sb),
        |d AS (SELECT k, nn,
        |    (nn * sb - CAST(gs AS HUGEINT) * gs) // nn AS ssb,
        |    ss - sb AS ssw,
        |    (1000 * nn) // k AS m_bar_milli FROM t),
        |icc AS (SELECT k, nn, m_bar_milli,
        |    (1000000 * (ssb // (k - 1) - ssw // (nn - k)))
        |      // GREATEST(ssb // (k - 1) + ((m_bar_milli - 1000) * (ssw // (nn - k)))
        |        // 1000, 1) AS icc_ppm
        |  FROM d)
        |SELECT CAST(k AS BIGINT) AS n_clusters, CAST(nn AS BIGINT) AS n_orders,
        |  CAST(m_bar_milli AS BIGINT) AS m_bar_milli,
        |  CAST(icc_ppm AS BIGINT) AS icc_ppm,
        |  CAST(1000 + ((m_bar_milli - 1000) * GREATEST(icc_ppm, 0)) // 1000000
        |    AS BIGINT) AS deff_milli
        |FROM icc""".stripMargin) { (s, dir) =>
      val y = Tables(s, dir).orders.select(col("o_custkey").as("ck"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("c"))
      val g = y.groupBy("ck").agg(count(lit(1)).as("m"), sum("c").as("s"))
      val gt = g.agg(count(lit(1)).as("k"), sum("m").as("nn"), sum("s").as("gs"),
        // per-cluster s²/m quotients already brush Long.Max at sf0.01 —
        // their SUM must accumulate in DECIMAL, not BIGINT
        sum(expr("(CAST(s AS DECIMAL(38,0)) * s) div m").cast("decimal(38,0)"))
          .as("sb"))
      val yt = y.agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("ss"))
      gt.crossJoin(broadcast(yt))
        .select(col("k"), col("nn"),
          // subtract BEFORE dividing: gs²/nn alone exceeds Long.Max and
          // Spark's div on DECIMAL silently WRAPS its bigint result
          // (no ANSI error) — (nn·sb − gs²)/nn keeps the quotient small
          expr("(nn * sb - CAST(gs AS DECIMAL(38,0)) * gs) div nn").as("ssb"),
          (col("ss") - col("sb")).as("ssw"),
          expr("(1000 * nn) div k").as("m_bar_milli"))
        .select(col("k"), col("nn"), col("m_bar_milli"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * (ssb div (k - 1) - ssw div (nn - k)))" +
            " div GREATEST(ssb div (k - 1)" +
            " + (CAST(m_bar_milli - 1000 AS DECIMAL(38,0)) * (ssw div (nn - k)))" +
            " div 1000, 1)")
            .as("icc_ppm"))
        .select(col("k").as("n_clusters"), col("nn").as("n_orders"),
          col("m_bar_milli").cast("long").as("m_bar_milli"),
          col("icc_ppm").cast("long").as("icc_ppm"),
          expr("CAST(1000 + ((m_bar_milli - 1000) * GREATEST(icc_ppm, 0)) div 1000000" +
            " AS BIGINT)").as("deff_milli"))
    },

    // Range-partition boundary audit (Spark's RangePartitioner made
    // explicit): pick 31 equi-depth cut points from the key's own
    // order statistics, assign every row to its range bucket via the
    // broadcast cut list (bucket id = #cuts strictly below the key —
    // a conditional SUM, no sort at assignment time), and audit the
    // realized balance against n/32 — duplicate-heavy keys are exactly
    // where range partitioning skews, and this measures by how much.
    QueryDef.sql(
      "q522_range_boundaries",
      """WITH k AS (SELECT o_custkey AS key FROM orders),
        |n AS (SELECT COUNT(*) AS n FROM k),
        |r AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) AS rn FROM k),
        |cuts AS (SELECT i, MIN(key) AS cut FROM r, n,
        |    generate_series(1, 31) t(i)
        |  WHERE rn = (n.n * i + 31) // 32 GROUP BY 1),
        |asg AS (SELECT k.key,
        |    (SELECT COUNT(*) FROM cuts c WHERE c.cut < k.key) AS bucket
        |  FROM k),
        |b AS (SELECT bucket, COUNT(*) AS n_rows FROM asg GROUP BY 1)
        |SELECT CAST(b.bucket AS BIGINT) AS bucket, CAST(b.n_rows AS BIGINT) AS n_rows,
        |  CAST(n.n // 32 AS BIGINT) AS expected,
        |  CAST((1000000 * CAST(b.n_rows AS HUGEINT) * 32) // n.n - 1000000 AS BIGINT)
        |    AS dev_ppm
        |FROM b, n ORDER BY bucket""".stripMargin) { (s, dir) =>
      val k = Tables(s, dir).orders.select(col("o_custkey").as("key"))
      val n = k.agg(count(lit(1)).as("n"))
      // distributed global rank (Ranks) over the row-level corpus — never
      // a single-task window. Keys repeat, but only the VALUE at each cut
      // position is consumed (min(key) where rn = cut), and equal keys are
      // interchangeable under any total order, so the cuts are exact.
      val r = graft.operators.Ranks.withGlobalRank(k, Seq("key"), "rn")
        .crossJoin(broadcast(n))
      val cuts = r.crossJoin(broadcast(
          s.range(1, 32).select(col("id").as("i"))))
        .where(col("rn") === expr("(n * i + 31) div 32"))
        .groupBy("i").agg(min("key").as("cut"))
      // bucket per DISTINCT key (cross-joining raw rows would count each
      // duplicate once per cut); row counts re-attach afterwards
      val asg = k.distinct().crossJoin(broadcast(cuts))
        .groupBy("key").agg(sum(when(col("cut") < col("key"), 1L).otherwise(0L))
          .as("__b"))
      val perKey = k.groupBy("key").agg(count(lit(1)).as("cnt"))
        .join(asg, "key")
      perKey.groupBy(col("__b").as("bucket"))
        .agg(sum("cnt").as("n_rows"))
        .crossJoin(broadcast(n))
        .select(col("bucket"), col("n_rows"), expr("n div 32").as("expected"),
          expr("CAST((1000000 * CAST(n_rows AS DECIMAL(38,0)) * 32) div n - 1000000" +
            " AS BIGINT)").as("dev_ppm"))
        .orderBy("bucket")
    },

    // CSV dialect sniffer: given raw delimited lines and no metadata,
    // the true delimiter is the candidate whose per-line occurrence
    // count is CONSTANT across every line (fields don't change count
    // row to row) with the highest count — the ingestion-time
    // inference every loader runs before q45's typed parse. Candidate
    // counts are pure string arithmetic (len − len(replace)) in one
    // map pass; the verdict is a 4-row argmax.
    QueryDef.sql(
      "q523_csv_sniffer",
      """WITH raw AS (SELECT c_name || '|' || c_mktsegment || '|' ||
        |    CAST(CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS VARCHAR) AS line
        |  FROM customer),
        |cand(delim) AS (VALUES (','), (';'), ('|'), ('#')),
        |cnt AS (SELECT c.delim,
        |    len(r.line) - len(replace(r.line, c.delim, '')) AS k
        |  FROM raw r CROSS JOIN cand c),
        |st AS (SELECT delim, MIN(k) AS lo, MAX(k) AS hi,
        |    CAST(SUM(k) AS HUGEINT) AS tot, COUNT(*) AS n FROM cnt GROUP BY 1),
        |v AS (SELECT delim, lo, hi,
        |    CASE WHEN lo = hi AND lo >= 1 THEN 1 ELSE 0 END AS stable
        |  FROM st)
        |SELECT v.delim, CAST(v.lo AS BIGINT) AS min_count,
        |  CAST(v.hi AS BIGINT) AS max_count, CAST(v.stable AS BIGINT) AS stable,
        |  CAST(CASE WHEN v.stable = 1 AND v.lo = (SELECT MAX(lo) FROM v v2
        |    WHERE v2.stable = 1) THEN 1 ELSE 0 END AS BIGINT) AS verdict
        |FROM v ORDER BY delim""".stripMargin) { (s, dir) =>
      import s.implicits._
      val raw = Tables(s, dir).customer
        .select(concat(col("c_name"), lit("|"), col("c_mktsegment"), lit("|"),
          floor(col("c_acctbal") * lit(100.0)).cast("long").cast("string")).as("line"))
      val cand = Seq(",", ";", "|", "#").toDF("delim")
      val st = raw.crossJoin(broadcast(cand))
        .select(col("delim"),
          (length(col("line")) - length(expr("replace(line, delim, '')"))).as("k"))
        .groupBy("delim").agg(min("k").as("lo"), max("k").as("hi"))
        .withColumn("stable",
          when(col("lo") === col("hi") && col("lo") >= 1, 1L).otherwise(0L))
      val best = st.where(col("stable") === 1).agg(max("lo").as("bestlo"))
      st.crossJoin(broadcast(best))
        .select(col("delim"), col("lo").cast("long").as("min_count"),
          col("hi").cast("long").as("max_count"), col("stable"),
          when(col("stable") === 1 && col("lo") === col("bestlo"), 1L).otherwise(0L)
            .as("verdict"))
        .orderBy("delim")
    },

    // JSON schema inference over a heterogeneous payload column: the
    // events props stream is deterministically mutated into three
    // co-existing shapes (numeric k / string k + tags / k + nested
    // meta), then per candidate path the presence rate and the numeric
    // share decide the inferred type and nullability — the
    // schema-on-read step (q66/q107's VARIANT handling) made explicit
    // as a census. Extraction is per-row get_json_object projections;
    // the inference is a 3-row aggregate.
    QueryDef.sql(
      "q524_json_schema_infer",
      """WITH p AS (SELECT event_id,
        |    CASE WHEN event_id % 7 = 0 THEN
        |        '{"k": "s' || CAST(event_id % 100 AS VARCHAR) || '", "tags": ["a"]}'
        |      WHEN event_id % 3 = 0 THEN
        |        '{"k": ' || CAST(event_id % 100 AS VARCHAR) || ', "meta": {"src": "x"}}'
        |      ELSE props END AS payload
        |  FROM events),
        |x AS (SELECT event_id,
        |    json_extract_string(payload, '$.k') AS k,
        |    json_extract_string(payload, '$.tags[0]') AS tag0,
        |    json_extract_string(payload, '$.meta.src') AS msrc
        |  FROM p),
        |n AS (SELECT COUNT(*) AS n FROM x),
        |s AS (SELECT 'k' AS path, COUNT(k) AS present,
        |    SUM(CASE WHEN k IS NOT NULL AND regexp_matches(k, '^[0-9]+$')
        |      THEN 1 ELSE 0 END) AS numeric FROM x
        |  UNION ALL SELECT 'meta.src', COUNT(msrc),
        |    SUM(CASE WHEN msrc IS NOT NULL AND regexp_matches(msrc, '^[0-9]+$')
        |      THEN 1 ELSE 0 END) FROM x
        |  UNION ALL SELECT 'tags[0]', COUNT(tag0),
        |    SUM(CASE WHEN tag0 IS NOT NULL AND regexp_matches(tag0, '^[0-9]+$')
        |      THEN 1 ELSE 0 END) FROM x)
        |SELECT s.path, CAST(1000000 * s.present // n.n AS BIGINT) AS present_ppm,
        |  CAST(CASE WHEN s.present = 0 THEN 0
        |    ELSE 1000000 * s.numeric // s.present END AS BIGINT) AS numeric_ppm,
        |  CASE WHEN s.present = 0 THEN 'absent'
        |    WHEN s.numeric = s.present THEN 'bigint'
        |    WHEN s.numeric = 0 THEN 'string' ELSE 'mixed' END AS inferred,
        |  CAST(CASE WHEN s.present < n.n THEN 1 ELSE 0 END AS BIGINT) AS nullable
        |FROM s, n ORDER BY path""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir).events.select(col("event_id"),
        when(col("event_id") % 7 === 0,
          concat(lit("{\"k\": \"s"), (col("event_id") % 100).cast("string"),
            lit("\", \"tags\": [\"a\"]}")))
        .when(col("event_id") % 3 === 0,
          concat(lit("{\"k\": "), (col("event_id") % 100).cast("string"),
            lit(", \"meta\": {\"src\": \"x\"}}")))
        .otherwise(col("props")).as("payload"))
      val x = p.select(
        get_json_object(col("payload"), "$.k").as("k"),
        get_json_object(col("payload"), "$.tags[0]").as("tag0"),
        get_json_object(col("payload"), "$.meta.src").as("msrc"))
      val n = x.agg(count(lit(1)).as("n"))
      def path(name: String, c: String) = x.agg(count(col(c)).as("present"),
        sum(when(col(c).isNotNull && col(c).rlike("^[0-9]+$"), 1L).otherwise(0L))
          .as("numeric"))
        .select(lit(name).as("path"), col("present"), col("numeric"))
      path("k", "k").unionAll(path("meta.src", "msrc")).unionAll(path("tags[0]", "tag0"))
        .crossJoin(broadcast(n))
        .select(col("path"),
          expr("CAST(1000000 * present div n AS BIGINT)").as("present_ppm"),
          when(col("present") === 0, 0L)
            .otherwise(expr("1000000 * numeric div present")).as("numeric_ppm"),
          when(col("present") === 0, "absent")
            .when(col("numeric") === col("present"), "bigint")
            .when(col("numeric") === 0, "string").otherwise("mixed").as("inferred"),
          when(col("present") < col("n"), 1L).otherwise(0L).as("nullable"))
        .orderBy("path")
    },

    // p99 decomposition fallacy, measured: split each request's
    // latency into three additive stages and compare Σ p99(stage)
    // against p99(total) — the sum of stage p99s OVERSTATES the true
    // tail whenever stage extremes don't coincide, which is why
    // per-stage SLO budgets mislead (q239's burn rates need the joint
    // quantile, not the sum). All four p99s are exact ⌈0.99·n⌉ order
    // statistics from one window each; the overstatement is an exact
    // ppm ratio.
    QueryDef.sql(
      "q525_p99_decomposition",
      """WITH e AS (SELECT CAST(FLOOR(value * 1000.0) AS BIGINT) AS t FROM events),
        |st AS (SELECT t, t // 3 AS s1, t // 5 AS s2, t - t // 3 - t // 5 AS s3 FROM e),
        |q AS (SELECT quantile_disc(t, 0.99) AS p99_total,
        |    quantile_disc(s1, 0.99) AS p99_s1, quantile_disc(s2, 0.99) AS p99_s2,
        |    quantile_disc(s3, 0.99) AS p99_s3 FROM st)
        |SELECT CAST(p99_total AS BIGINT) AS p99_total,
        |  CAST(p99_s1 AS BIGINT) AS p99_s1, CAST(p99_s2 AS BIGINT) AS p99_s2,
        |  CAST(p99_s3 AS BIGINT) AS p99_s3,
        |  CAST(p99_s1 + p99_s2 + p99_s3 AS BIGINT) AS sum_stage_p99,
        |  CAST((1000000 * (p99_s1 + p99_s2 + p99_s3)) // GREATEST(p99_total, 1)
        |    AS BIGINT) AS overstate_ppm
        |FROM q""".stripMargin) { (s, dir) =>
      val st = Tables(s, dir).events
        .select(floor(col("value") * lit(1000.0)).cast("long").as("t"))
        .select(col("t"), expr("t div 3").as("s1"), expr("t div 5").as("s2"),
          expr("t - t div 3 - t div 5").as("s3"))
      def p99(c: String) = st
        .select(col(c), row_number().over(Window.orderBy(c)).as("rn"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .where(col("rn") === expr("(n * 99 + 99) div 100"))
        .select(col(c).as(s"p99_$c"))
      p99("t").crossJoin(broadcast(p99("s1"))).crossJoin(broadcast(p99("s2")))
        .crossJoin(broadcast(p99("s3")))
        .select(col("p99_t").as("p99_total"), col("p99_s1"), col("p99_s2"),
          col("p99_s3"),
          (col("p99_s1") + col("p99_s2") + col("p99_s3")).as("sum_stage_p99"),
          expr("CAST((1000000 * (p99_s1 + p99_s2 + p99_s3))" +
            " div GREATEST(p99_t, 1) AS BIGINT)").as("overstate_ppm"))
    },

    // Summed-area table (integral image) over the (nation × month)
    // order-count cube: two cumulative window passes build sat(i,j) =
    // Σ counts over the dominated rectangle, after which ANY
    // rectangular roll-up is 4 corner lookups — the dense-cube trick
    // that answers ad-hoc range aggregations in O(1) instead of
    // rescanning (q111's cube materializes group-bys; this handles
    // arbitrary CONTIGUOUS ranges). The grid is densified on a spine
    // first (SAT needs every cell), and three probe rectangles are
    // verified against their direct counts IN the query — the output
    // certifies the identity.
    QueryDef.sql(
      "q526_summed_area",
      """WITH cell AS (SELECT c.c_nationkey AS nk,
        |    strftime(o.o_orderdate, '%Y-%m') AS mon, COUNT(*) AS cnt
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |mons AS (SELECT mon, ROW_NUMBER() OVER (ORDER BY mon) - 1 AS mj
        |  FROM (SELECT DISTINCT mon FROM cell)),
        |nats AS (SELECT DISTINCT nk FROM cell),
        |dense AS (SELECT n.nk, m.mj, COALESCE(c2.cnt, 0) AS cnt
        |  FROM nats n CROSS JOIN mons m
        |  LEFT JOIN cell c2 ON c2.nk = n.nk AND c2.mon = m.mon),
        |sat AS (SELECT nk, mj, SUM(rowcum) OVER (PARTITION BY mj ORDER BY nk
        |    ROWS UNBOUNDED PRECEDING) AS s
        |  FROM (SELECT nk, mj, SUM(cnt) OVER (PARTITION BY nk ORDER BY mj
        |      ROWS UNBOUNDED PRECEDING) AS rowcum FROM dense)),
        |probes0(pid, n1, n2, m1, m2) AS (VALUES
        |  (1, 0, 5, 0, 11), (2, 10, 24, 12, 35), (3, 3, 3, 6, 6)),
        |probes AS (SELECT pid, n1, n2, m1,
        |    LEAST(m2, (SELECT MAX(mj) FROM mons)) AS m2 FROM probes0),
        |satq AS (SELECT p.pid,
        |    COALESCE((SELECT s FROM sat WHERE nk = p.n2 AND mj = p.m2), 0)
        |    - COALESCE((SELECT s FROM sat WHERE nk = p.n1 - 1 AND mj = p.m2), 0)
        |    - COALESCE((SELECT s FROM sat WHERE nk = p.n2 AND mj = p.m1 - 1), 0)
        |    + COALESCE((SELECT s FROM sat WHERE nk = p.n1 - 1 AND mj = p.m1 - 1), 0)
        |      AS sat_count
        |  FROM probes p),
        |direct AS (SELECT p.pid, COALESCE(SUM(d.cnt), 0) AS direct_count
        |  FROM probes p LEFT JOIN dense d
        |    ON d.nk BETWEEN p.n1 AND p.n2 AND d.mj BETWEEN p.m1 AND p.m2
        |  GROUP BY 1)
        |SELECT s.pid AS probe, CAST(s.sat_count AS BIGINT) AS sat_count,
        |  CAST(d.direct_count AS BIGINT) AS direct_count,
        |  CAST(CASE WHEN s.sat_count = d.direct_count THEN 1 ELSE 0 END AS BIGINT)
        |    AS identity_ok
        |FROM satq s JOIN direct d ON s.pid = d.pid ORDER BY probe""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val cell = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("cnt"))
        .cache()
      val mons = cell.select("mon").distinct()
        .withColumn("mj", row_number().over(Window.orderBy("mon")) - 1)
      val nats = cell.select("nk").distinct()
      val dense = nats.crossJoin(mons)
        .join(cell, Seq("nk", "mon"), "left")
        .select(col("nk"), col("mj"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val sat = dense
        .withColumn("rowcum", sum("cnt").over(Window.partitionBy("nk").orderBy("mj")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("s", sum("rowcum").over(Window.partitionBy("mj").orderBy("nk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("nk", "mj", "s")
        .cache()
      val maxMj = mons.agg(max("mj").as("maxmj"))
      val probes = Seq((1L, 0L, 5L, 0L, 11L), (2L, 10L, 24L, 12L, 35L),
        (3L, 3L, 3L, 6L, 6L)).toDF("pid", "n1", "n2", "m1", "m2")
        .crossJoin(broadcast(maxMj))
        // clamp to the realized grid — sparse small-SF fixtures have
        // fewer months than the probe windows assume
        .select(col("pid"), col("n1"), col("n2"), col("m1"),
          least(col("m2"), col("maxmj")).as("m2"))
      def corner(nkc: String, mjc: String, alias: String) = {
        val sc = sat.select(col("nk").as("cnk"), col("mj").as("cmj"),
          col("s").as(alias))
        (df: org.apache.spark.sql.DataFrame) => df.join(broadcast(sc),
          col(nkc) === col("cnk") && col(mjc) === col("cmj"), "left")
          .drop("cnk", "cmj")
          .withColumn(alias, coalesce(col(alias), lit(0L)))
      }
      val withCorners = probes
        .withColumn("n0", col("n1") - 1).withColumn("m0", col("m1") - 1)
      val satq = corner("n0", "m0", "c00")(
        corner("n2", "m0", "c20")(
          corner("n0", "m2", "c02")(
            corner("n2", "m2", "c22")(withCorners))))
        .select(col("pid"), (col("c22") - col("c02") - col("c20") + col("c00"))
          .as("sat_count"))
      val direct = probes.crossJoin(dense)
        .where(col("nk").between(col("n1"), col("n2")) &&
          col("mj").between(col("m1"), col("m2")))
        .groupBy("pid").agg(sum("cnt").as("direct_count"))
      satq.join(direct, Seq("pid"), "left")
        .select(col("pid").as("probe"), col("sat_count"),
          coalesce(col("direct_count"), lit(0L)).as("direct_count"),
          when(col("sat_count") === coalesce(col("direct_count"), lit(0L)), 1L)
            .otherwise(0L).as("identity_ok"))
        .orderBy("probe")
    },

    // Deterministic dither (unbiased) rounding audit: quantizing milli
    // values to cents by TRUNCATION biases every value down ~half a
    // unit, and the bias compounds linearly with n; adding an md5-
    // derived dither in [0, 10) before the division kills the bias
    // without any floating point — the integer cousin of stochastic
    // rounding that low-precision training (q64's quantization) leans
    // on, reproducible because the dither is content-keyed, not RNG.
    // One map pass, three exact sums, errors reported in ppm of the
    // exact total.
    QueryDef.sql(
      "q527_dither_rounding",
      """WITH v AS (SELECT event_id,
        |    CAST(FLOOR(value * 1000.0) AS BIGINT) AS milli FROM events),
        |q AS (SELECT milli, milli // 10 AS trunc_cents,
        |    (milli + ('0x' || substr(md5('d' || event_id), 1, 4))::BIGINT % 10) // 10
        |      AS dither_cents
        |  FROM v),
        |a AS (SELECT COUNT(*) AS n, SUM(milli) AS exact_milli,
        |    SUM(trunc_cents) * 10 AS trunc_milli,
        |    SUM(dither_cents) * 10 AS dither_milli FROM q)
        |SELECT CAST(n AS BIGINT) AS n, CAST(exact_milli AS BIGINT) AS exact_milli,
        |  CAST((1000000 * (trunc_milli - exact_milli)) // exact_milli AS BIGINT)
        |    AS trunc_err_ppm,
        |  CAST((1000000 * (dither_milli - exact_milli)) // exact_milli AS BIGINT)
        |    AS dither_err_ppm,
        |  CAST(ABS(trunc_milli - exact_milli) // GREATEST(ABS(dither_milli - exact_milli), 1)
        |    AS BIGINT) AS bias_reduction_x
        |FROM a""".stripMargin) { (s, dir) =>
      val q = Tables(s, dir).events
        .select(col("event_id"), floor(col("value") * lit(1000.0)).cast("long").as("milli"))
        .select(col("milli"), expr("milli div 10").as("trunc_cents"),
          expr("(milli + CAST(conv(substring(md5(concat('d', event_id)), 1, 4), 16, 10)" +
            " AS BIGINT) % 10) div 10").as("dither_cents"))
      q.agg(count(lit(1)).as("n"), sum("milli").as("exact_milli"),
          (sum("trunc_cents") * 10).as("trunc_milli"),
          (sum("dither_cents") * 10).as("dither_milli"))
        .select(col("n"), col("exact_milli"),
          expr("CAST((1000000 * (trunc_milli - exact_milli)) div exact_milli AS BIGINT)")
            .as("trunc_err_ppm"),
          expr("CAST((1000000 * (dither_milli - exact_milli)) div exact_milli AS BIGINT)")
            .as("dither_err_ppm"),
          expr("CAST(ABS(trunc_milli - exact_milli)" +
            " div GREATEST(ABS(dither_milli - exact_milli), 1) AS BIGINT)")
            .as("bias_reduction_x"))
    },

    // Landmark distance labeling (the ALT / 2-hop-cover idea): run
    // multi-source BFS from EVERY node of the symmetrized trade graph
    // at once (the frontier carries (src, n) pairs — one extra key
    // column turns q160's single-source walk into APSP for small
    // vertex sets), pick the 3 highest-degree nodes as landmarks, and
    // audit the triangle upper bound min_L d(a,L)+d(L,b) against the
    // true distance on the 10 first connected pairs — the tightness
    // census that says whether 3 labels suffice as a distance index.
    QueryDef.sql(
      "q528_landmark_distances",
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS cnt
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |t AS (SELECT SUM(cnt) AS tot, COUNT(*) AS ne FROM e0),
        |ed AS MATERIALIZED (SELECT src, dst FROM e0, t WHERE 2 * cnt * ne >= 3 * tot),
        |e AS MATERIALIZED (SELECT src, dst FROM ed
        |  UNION SELECT dst, src FROM ed),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS n FROM e),
        |ap(s, n, d) AS (
        |  SELECT n, n, 0 FROM nodes
        |  UNION ALL
        |  SELECT ap.s, e.dst, ap.d + 1 FROM ap JOIN e ON ap.n = e.src WHERE ap.d < 4),
        |dist AS MATERIALIZED (SELECT s, n, MIN(d) AS d FROM ap GROUP BY 1, 2),
        |deg AS (SELECT src AS n, COUNT(*) AS dg FROM e GROUP BY 1),
        |lm AS MATERIALIZED (SELECT n FROM deg ORDER BY dg DESC, n LIMIT 3),
        |pairs AS MATERIALIZED (SELECT s AS a, n AS b, d AS true_d FROM dist
        |  WHERE s < n ORDER BY s, n LIMIT 10),
        |ub AS (SELECT p.a, p.b, MIN(da.d + db.d) AS lm_ub
        |  FROM pairs p
        |  JOIN dist da ON da.n = p.a JOIN lm ON da.s = lm.n
        |  JOIN dist db ON db.s = da.s AND db.n = p.b
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.true_d AS BIGINT) AS true_d,
        |  CAST(ub.lm_ub AS BIGINT) AS landmark_ub,
        |  CAST(CASE WHEN ub.lm_ub = p.true_d THEN 1 ELSE 0 END AS BIGINT) AS tight
        |FROM pairs p JOIN ub ON p.a = ub.a AND p.b = ub.b
        |ORDER BY p.a, p.b""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val base = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .cache()
      val tot = base.agg(sum("cnt").as("tot"), count(lit(1)).as("ne"))
      val ed = base.crossJoin(broadcast(tot))
        .where(lit(2) * col("cnt") * col("ne") >= lit(3) * col("tot"))
        .select("src", "dst")
      val e = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().cache()
      val nodes = e.select(col("src").as("n")).distinct()
      // multi-source BFS: the frontier key is (s, n) — 4 supersteps of
      // join + distinct + anti-join, exactly q160's shape with one more
      // key column
      var visited = nodes.select(col("n").as("s"), col("n"), lit(0L).as("d"))
      var frontier = visited.select("s", "n")
      for (i <- 1 to 4) {
        val next = frontier.join(e, frontier("n") === e("src"))
          .select(col("s"), col("dst").as("n")).distinct()
          .join(visited.select(col("s").as("vs"), col("n").as("vn")),
            col("s") === col("vs") && col("n") === col("vn"), "left_anti")
        frontier = next
        visited = visited.union(next.select(col("s"), col("n"), lit(i.toLong).as("d")))
      }
      val dist = visited.groupBy("s", "n").agg(min("d").as("d")).cache()
      val deg = e.groupBy(col("src").as("n")).agg(count(lit(1)).as("dg"))
      val lm = deg.orderBy(col("dg").desc, col("n")).limit(3).select("n")
      val pairs = dist.where(col("s") < col("n"))
        .select(col("s").as("a"), col("n").as("b"), col("d").as("true_d"))
        .orderBy("a", "b").limit(10)
      val ub = pairs
        .join(dist.select(col("s").as("ls"), col("n").as("a"), col("d").as("da"))
          .join(broadcast(lm.select(col("n").as("ls"))), Seq("ls")), Seq("a"))
        .join(dist.select(col("s").as("ls"), col("n").as("b"), col("d").as("db")),
          Seq("ls", "b"))
        .groupBy("a", "b").agg(min(col("da") + col("db")).as("landmark_ub"))
      pairs.join(ub, Seq("a", "b"))
        .select(col("a"), col("b"), col("true_d"), col("landmark_ub"),
          when(col("landmark_ub") === col("true_d"), 1L).otherwise(0L).as("tight"))
        .orderBy("a", "b")
    },

    // Order-invariant content fingerprints: a dataset "version hash"
    // that any engine, any partitioning, and any row order reproduces —
    // the SUM of per-row md5-derived integers is commutative, so the
    // fingerprint survives shuffles and splits merge by addition
    // (q232's Merkle tree fingerprints CHUNKS in order; this
    // fingerprints the SET). One map pass per table; rows and the
    // fingerprint are the entire output — what a data registry stores
    // to detect silent drift between copies. The running sum is kept
    // in DECIMAL(38,0) but the emitted fingerprint is reduced mod 2^62
    // so it stays representable in int64 at ANY scale factor (48-bit
    // per-row terms over 10^9+ rows would otherwise overflow BIGINT;
    // mod is addition-compatible, so the reduced value is still
    // order- and partitioning-invariant).
    QueryDef.sql(
      "q529_content_fingerprint",
      """WITH f1 AS (SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
        |    SUM(('0x' || substr(md5(c_custkey || '|' || c_name || '|' || c_mktsegment),
        |      1, 12))::BIGINT::HUGEINT) AS fp
        |  FROM customer),
        |f2 AS (SELECT 'orders', COUNT(*),
        |    SUM(('0x' || substr(md5(o_orderkey || '|' || o_custkey || '|' ||
        |      CAST(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS VARCHAR)),
        |      1, 12))::BIGINT::HUGEINT)
        |  FROM orders),
        |f3 AS (SELECT 'part', COUNT(*),
        |    SUM(('0x' || substr(md5(p_partkey || '|' || p_name || '|' || p_brand),
        |      1, 12))::BIGINT::HUGEINT)
        |  FROM part)
        |SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(fp % 4611686018427387904 AS BIGINT) AS fingerprint
        |FROM (SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3)
        |ORDER BY tbl""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      def fp(name: String, df: org.apache.spark.sql.DataFrame,
          canonical: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_rows"),
          (sum(expr("CAST(conv(substring(md5(__c), 1, 12), 16, 10) AS BIGINT)")
            .cast("decimal(38,0)")) % lit(4611686018427387904L))
            .cast("long").as("fingerprint"))
          .select(lit(name).as("tbl"), col("n_rows"), col("fingerprint"))
      fp("customer",
          t.customer.select(concat_ws("|", col("c_custkey"), col("c_name"),
            col("c_mktsegment")).as("__c")), col("__c"))
        .unionAll(fp("orders",
          t.orders.select(concat_ws("|", col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * lit(100.0)).cast("long")).as("__c")), col("__c")))
        .unionAll(fp("part",
          t.part.select(concat_ws("|", col("p_partkey"), col("p_name"),
            col("p_brand")).as("__c")), col("__c")))
        .orderBy("tbl")
    },

    // Bill-of-materials rollup: a synthetic assembly tree over the part
    // keys (k contains 2k+1 and 2k+2 where those parts exist, quantity
    // 2 + k mod 3) expanded 4 levels from the root with MULTIPLIED
    // path quantities — the recursive-aggregation workload (exploding
    // a product structure into effective component demand) that plain
    // joins can't express and q101's simple recursion doesn't price.
    // Each superstep multiplies the frontier's path quantity into the
    // next edge tier; per-depth path counts and quantity totals are
    // the manufacturing "where-used" summary.
    QueryDef.sql(
      "q530_bom_rollup",
      """WITH RECURSIVE p AS MATERIALIZED (SELECT p_partkey AS k FROM part),
        |e AS MATERIALIZED (
        |  SELECT a.k AS parent, b.k AS child, 2 + a.k % 3 AS qty
        |  FROM p a JOIN p b ON b.k = 2 * a.k + 1
        |  UNION ALL
        |  SELECT a.k, b.k, 2 + a.k % 3
        |  FROM p a JOIN p b ON b.k = 2 * a.k + 2),
        |bom(n, d, q) AS (
        |  SELECT CAST(0 AS BIGINT), 0, CAST(1 AS HUGEINT)
        |  UNION ALL
        |  SELECT e.child, bom.d + 1, bom.q * e.qty
        |  FROM bom JOIN e ON bom.n = e.parent WHERE bom.d < 4)
        |SELECT CAST(d AS BIGINT) AS depth, COUNT(*) AS n_paths,
        |  CAST(SUM(q) AS BIGINT) AS total_qty
        |FROM bom GROUP BY 1 ORDER BY depth""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir).part.select(col("p_partkey").as("k"))
      val kids = p.select(col("k").as("child"))
      val e = p.join(kids, col("child") === lit(2) * col("k") + 1)
        .select(col("k").as("parent"), col("child"), (lit(2L) + col("k") % 3).as("qty"))
        .unionAll(p.join(kids, col("child") === lit(2) * col("k") + 2)
          .select(col("k").as("parent"), col("child"), (lit(2L) + col("k") % 3).as("qty")))
        .cache()
      var frontier = s.range(1).select(lit(0L).as("n"), lit(0L).as("d"), lit(1L).as("q"))
      var all = frontier
      for (i <- 1 to 4) {
        frontier = frontier.join(e, frontier("n") === e("parent"))
          .select(col("child").as("n"), lit(i.toLong).as("d"),
            (col("q") * col("qty")).as("q"))
        all = all.unionAll(frontier)
      }
      all.groupBy(col("d").as("depth"))
        .agg(count(lit(1)).as("n_paths"), sum("q").as("total_qty"))
        .orderBy("depth")
    },

    // Stratified k-fold assignment audit: folds must be balanced
    // WITHIN every stratum, not just globally — a nation whose 5 folds
    // split 40/5/5/5/5 poisons per-stratum cross-validation even if
    // the global split looks fine. The md5 fold assignment is
    // deterministic (resumable, engine-reproducible); the audit is one
    // (stratum × fold) count and a per-stratum max/min spread in ppm
    // of the ideal n/5.
    QueryDef.sql(
      "q531_stratified_kfold",
      """WITH a AS (SELECT c_nationkey AS nk,
        |    ('0x' || substr(md5('f' || c_custkey), 1, 6))::BIGINT % 5 AS fold
        |  FROM customer),
        |f AS (SELECT nk, fold, COUNT(*) AS n FROM a GROUP BY 1, 2),
        |g AS (SELECT nk, SUM(n) AS tot, MAX(n) AS mx, MIN(n) AS mn,
        |    COUNT(*) AS n_folds FROM f GROUP BY 1)
        |SELECT nk AS nation, CAST(tot AS BIGINT) AS n,
        |  CAST(n_folds AS BIGINT) AS n_folds,
        |  CAST(mx AS BIGINT) AS max_fold, CAST(mn AS BIGINT) AS min_fold,
        |  CAST((1000000 * (mx - mn) * 5) // tot AS BIGINT) AS spread_ppm
        |FROM g ORDER BY nation""".stripMargin) { (s, dir) =>
      val a = Tables(s, dir).customer.select(col("c_nationkey").as("nk"),
        expr("CAST(conv(substring(md5(concat('f', c_custkey)), 1, 6), 16, 10)" +
          " AS BIGINT) % 5").as("fold"))
      a.groupBy("nk", "fold").agg(count(lit(1)).as("n"))
        .groupBy("nk")
        .agg(sum("n").as("tot"), max("n").as("max_fold"), min("n").as("min_fold"),
          count(lit(1)).as("n_folds"))
        .select(col("nk").as("nation"), col("tot").as("n"), col("n_folds"),
          col("max_fold"), col("min_fold"),
          expr("CAST((1000000 * (max_fold - min_fold) * 5) div tot AS BIGINT)")
            .as("spread_ppm"))
        .orderBy("nation")
    },

    // Makespan / skew speedup bound: with one task per group, parallel
    // runtime is the LARGEST group, so the achievable speedup is
    // total/max — computed for the plain nation key against a 4-way
    // salted split of the same aggregation (q86 executes the salted
    // plan; this prices WHY). The two censuses come from the same
    // fact-table pass; salting's speedup gain is the ratio every skew
    // mitigation should be judged by before shipping.
    QueryDef.sql(
      "q532_makespan_audit",
      """WITH y AS (SELECT c.c_nationkey AS nk,
        |    ('0x' || substr(md5('s' || o.o_orderkey), 1, 4))::BIGINT % 4 AS salt
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |plain AS (SELECT nk, COUNT(*) AS n FROM y GROUP BY 1),
        |salted AS (SELECT nk, salt, COUNT(*) AS n FROM y GROUP BY 1, 2),
        |a AS (SELECT 'plain' AS strategy, COUNT(*) AS n_tasks, SUM(n) AS total,
        |    MAX(n) AS max_task FROM plain
        |  UNION ALL SELECT 'salted_x4', COUNT(*), SUM(n), MAX(n) FROM salted)
        |SELECT strategy, CAST(n_tasks AS BIGINT) AS n_tasks,
        |  CAST(max_task AS BIGINT) AS max_task,
        |  CAST((1000 * CAST(total AS HUGEINT)) // max_task AS BIGINT)
        |    AS speedup_x_milli
        |FROM a ORDER BY strategy""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val y = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          expr("CAST(conv(substring(md5(concat('s', o_orderkey)), 1, 4), 16, 10)" +
            " AS BIGINT) % 4").as("salt"))
      def census(df: org.apache.spark.sql.DataFrame, name: String) = df
        .agg(count(lit(1)).as("n_tasks"), sum("n").as("total"), max("n").as("max_task"))
        .select(lit(name).as("strategy"), col("n_tasks"), col("total"), col("max_task"))
      census(y.groupBy("nk").agg(count(lit(1)).as("n")), "plain")
        .unionAll(census(y.groupBy("nk", "salt").agg(count(lit(1)).as("n")), "salted_x4"))
        .select(col("strategy"), col("n_tasks"), col("max_task"),
          expr("CAST((1000 * CAST(total AS DECIMAL(38,0))) div max_task AS BIGINT)")
            .as("speedup_x_milli"))
        .orderBy("strategy")
    },

    // Histogram-intersection source similarity: per source, the
    // 16-bin length distribution in ppm; per source PAIR, the kernel
    // Σ min(pᵢ, qᵢ) — 1e6 means identical length profiles, and the
    // top pairs are merge candidates for mixture design (q237 drifts
    // ONE distribution over time; this compares all sources pairwise).
    // Bin histograms are one aggregate; the pair kernel joins 20×16
    // profile rows — never the documents themselves.
    QueryDef.sql(
      "q533_source_similarity",
      """WITH b AS (SELECT source, LEAST(n_chars // 64, 15) AS bin, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |n AS (SELECT source, SUM(c) AS tot FROM b GROUP BY 1),
        |p AS (SELECT b.source, b.bin, (1000000 * b.c) // n.tot AS ppm
        |  FROM b JOIN n ON b.source = n.source),
        |k AS (SELECT a.source AS sa, b2.source AS sb,
        |    SUM(LEAST(a.ppm, b2.ppm)) AS sim_ppm
        |  FROM p a JOIN p b2 ON a.bin = b2.bin AND a.source < b2.source
        |  GROUP BY 1, 2)
        |SELECT sa, sb, CAST(sim_ppm AS BIGINT) AS sim_ppm
        |FROM k ORDER BY sim_ppm DESC, sa, sb LIMIT 10""".stripMargin) { (s, dir) =>
      val b = Tables(s, dir).documents
        .groupBy(col("source"), least(expr("n_chars div 64"), lit(15L)).as("bin"))
        .agg(count(lit(1)).as("c"))
      val n = b.groupBy("source").agg(sum("c").as("tot"))
      val p = b.join(n, "source")
        .select(col("source"), col("bin"), expr("(1000000 * c) div tot").as("ppm"))
      p.select(col("bin"), col("source").as("sa"), col("ppm").as("pa"))
        .join(p.select(col("bin"), col("source").as("sb"), col("ppm").as("pb")), "bin")
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb")
        .agg(sum(least(col("pa"), col("pb"))).as("sim_ppm"))
        .orderBy(col("sim_ppm").desc, col("sa"), col("sb"))
        .limit(10)
    },

    // Grid-bucketed spatial self-join, certified against brute force:
    // md5-placed 2D points pair up within Chebyshev distance 8 by
    // joining only 3×3 neighboring 16-unit grid cells — the spatial
    // analog of LSH bucketing (and the standard distributed spatial
    // join: cell id is the shuffle key, candidate volume tracks local
    // density, never n²). The same query runs the quadratic
    // brute-force count on the sampled point set and emits both — the
    // differential proof that the grid join misses nothing.
    QueryDef.sql(
      "q534_grid_spatial_join",
      """WITH pt AS (SELECT c_custkey AS id,
        |    ('0x' || substr(md5('x' || c_custkey), 1, 6))::BIGINT % 1000 AS x,
        |    ('0x' || substr(md5('y' || c_custkey), 1, 6))::BIGINT % 1000 AS y
        |  FROM customer WHERE c_custkey % 8 = 0),
        |cell AS (SELECT id, x, y, x // 16 AS cx, y // 16 AS cy FROM pt),
        |off(dx, dy) AS (VALUES (-1,-1), (-1,0), (-1,1), (0,-1), (0,0), (0,1),
        |  (1,-1), (1,0), (1,1)),
        |grid AS (SELECT COUNT(*) AS pairs FROM (
        |  SELECT DISTINCT a.id AS ia, b.id AS ib
        |  FROM cell a CROSS JOIN off o
        |  JOIN cell b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        |    AND a.id < b.id
        |    AND GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) <= 8)),
        |brute AS (SELECT COUNT(*) AS pairs FROM pt a JOIN pt b
        |  ON a.id < b.id AND GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) <= 8),
        |n AS (SELECT COUNT(*) AS n_points FROM pt)
        |SELECT n.n_points, CAST(g.pairs AS BIGINT) AS grid_pairs,
        |  CAST(b.pairs AS BIGINT) AS brute_pairs,
        |  CAST(CASE WHEN g.pairs = b.pairs THEN 1 ELSE 0 END AS BIGINT) AS certified
        |FROM grid g, brute b, n""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pt = Tables(s, dir).customer.where(col("c_custkey") % 8 === 0)
        .select(col("c_custkey").as("id"),
          expr("CAST(conv(substring(md5(concat('x', c_custkey)), 1, 6), 16, 10)" +
            " AS BIGINT) % 1000").as("x"),
          expr("CAST(conv(substring(md5(concat('y', c_custkey)), 1, 6), 16, 10)" +
            " AS BIGINT) % 1000").as("y"))
        .cache()
      val cell = pt.select(col("id"), col("x"), col("y"),
        expr("x div 16").as("cx"), expr("y div 16").as("cy"))
      val off = Seq((-1L, -1L), (-1L, 0L), (-1L, 1L), (0L, -1L), (0L, 0L), (0L, 1L),
        (1L, -1L), (1L, 0L), (1L, 1L)).toDF("dx", "dy")
      val probe = cell.crossJoin(broadcast(off))
        .select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"),
          (col("cx") + col("dx")).as("tcx"), (col("cy") + col("dy")).as("tcy"))
      val grid = probe.join(cell.select(col("id").as("ib"), col("x").as("xb"),
          col("y").as("yb"), col("cx").as("tcx"), col("cy").as("tcy")),
          Seq("tcx", "tcy"))
        .where(col("ia") < col("ib") &&
          greatest(abs(col("xa") - col("xb")), abs(col("ya") - col("yb"))) <= 8)
        .select("ia", "ib").distinct()
        .agg(count(lit(1)).as("grid_pairs"))
      val brute = pt.select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"))
        .crossJoin(pt.select(col("id").as("ib"), col("x").as("xb"), col("y").as("yb")))
        .where(col("ia") < col("ib") &&
          greatest(abs(col("xa") - col("xb")), abs(col("ya") - col("yb"))) <= 8)
        .agg(count(lit(1)).as("brute_pairs"))
      val n = pt.agg(count(lit(1)).as("n_points"))
      n.crossJoin(broadcast(grid)).crossJoin(broadcast(brute))
        .select(col("n_points"), col("grid_pairs"), col("brute_pairs"),
          when(col("grid_pairs") === col("brute_pairs"), 1L).otherwise(0L)
            .as("certified"))
    },

    // Finite-population-correction advisor: sampling n of N WITHOUT
    // replacement shrinks the standard error by √((N−n)/(N−1)) — at a
    // 50% sampling fraction your error bars are ~29% tighter than the
    // with-replacement formula claims, and ignoring the FPC overstates
    // uncertainty exactly when sampling is most aggressive. The factor
    // is the floor-corrected integer sqrt of the exact ratio (q460's
    // idiom) per sweep row, anchored to the measured customer count.
    QueryDef.sql(
      "q535_fpc_advisor",
      """WITH nn AS (SELECT COUNT(*) AS n FROM customer),
        |f(pct) AS (VALUES (1), (5), (10), (25), (50)),
        |s0 AS (SELECT f.pct, nn.n, (nn.n * f.pct) // 100 AS k FROM f, nn),
        |r AS (SELECT pct, n, k,
        |    (1000000 * (n - k)) // (n - 1) AS ratio_ppm FROM s0),
        |q AS (SELECT pct, n, k, ratio_ppm,
        |    CAST(FLOOR(SQRT(CAST(ratio_ppm * 1000000 AS DOUBLE))) AS BIGINT) AS r0
        |  FROM r),
        |c AS (SELECT pct, n, k, ratio_ppm,
        |    r0 + CASE WHEN (r0 + 1) * (r0 + 1) <= ratio_ppm * 1000000 THEN 1 ELSE 0 END
        |       - CASE WHEN r0 * r0 > ratio_ppm * 1000000 THEN 1 ELSE 0 END AS fpc
        |  FROM q)
        |SELECT CAST(pct AS BIGINT) AS sample_pct, CAST(k AS BIGINT) AS n_sampled,
        |  CAST(fpc AS BIGINT) AS fpc_ppm,
        |  CAST(1000000 - fpc AS BIGINT) AS se_reduction_ppm
        |FROM c ORDER BY sample_pct""".stripMargin) { (s, dir) =>
      import s.implicits._
      val nn = Tables(s, dir).customer.agg(count(lit(1)).as("n"))
      Seq(1L, 5L, 10L, 25L, 50L).toDF("pct")
        .crossJoin(broadcast(nn))
        .select(col("pct"), col("n"), expr("(n * pct) div 100").as("k"))
        .withColumn("ratio_ppm", expr("(1000000 * (n - k)) div (n - 1)"))
        .withColumn("r0",
          expr("CAST(FLOOR(SQRT(CAST(ratio_ppm * 1000000 AS DOUBLE))) AS BIGINT)"))
        .withColumn("fpc", col("r0")
          + when((col("r0") + 1) * (col("r0") + 1) <= col("ratio_ppm") * 1000000L, 1L)
            .otherwise(0L)
          - when(col("r0") * col("r0") > col("ratio_ppm") * 1000000L, 1L).otherwise(0L))
        .select(col("pct").as("sample_pct"), col("k").as("n_sampled"),
          col("fpc").as("fpc_ppm"), (lit(1000000L) - col("fpc")).as("se_reduction_ppm"))
        .orderBy("sample_pct")
    },

    // Adversarial validation: can a trivial classifier tell the 1994
    // order cohort from 1995 using only coarse features? Cell-majority
    // accuracy over (price decile × priority) cells — accuracy pinned
    // near 50% certifies the cohorts are exchangeable on those
    // features; anything well above it is distribution shift a model
    // WILL exploit (the competition trick that catches train/test skew
    // before training). One cell census, majority pick per cell, one
    // exact accuracy ratio.
    QueryDef.sql(
      "q536_adversarial_validation",
      """WITH o AS (SELECT
        |    CASE WHEN year(o_orderdate) = 1994 THEN 0 ELSE 1 END AS cls,
        |    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS pb,
        |    o_orderpriority AS pri
        |  FROM orders WHERE year(o_orderdate) IN (1994, 1995)),
        |cell AS (SELECT pb, pri,
        |    SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS c0,
        |    SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM o GROUP BY 1, 2),
        |a AS (SELECT SUM(c0 + c1) AS n, SUM(GREATEST(c0, c1)) AS correct,
        |    COUNT(*) AS n_cells FROM cell)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
        |  CAST(1000000 * correct // n AS BIGINT) AS cell_majority_acc_ppm,
        |  CAST(CASE WHEN 1000000 * correct // n > 550000 THEN 1 ELSE 0 END AS BIGINT)
        |    AS shift_flag
        |FROM a""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
        .where(year(col("o_orderdate")).isin(1994, 1995))
        .select(when(year(col("o_orderdate")) === 1994, 0L).otherwise(1L).as("cls"),
          col("o_totalprice"), col("o_orderkey"), col("o_orderpriority").as("pri"))
        .withColumn("pb", ntile(10).over(Window.orderBy("o_totalprice", "o_orderkey")))
      val cell = o.groupBy("pb", "pri")
        .agg(sum(when(col("cls") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("cls") === 1, 1L).otherwise(0L)).as("c1"))
      cell.agg(sum(col("c0") + col("c1")).as("n"),
          sum(greatest(col("c0"), col("c1"))).as("correct"),
          count(lit(1)).as("n_cells"))
        .select(col("n"), col("n_cells"),
          expr("CAST(1000000 * correct div n AS BIGINT)").as("cell_majority_acc_ppm"),
          when(expr("1000000 * correct div n") > 550000, 1L).otherwise(0L)
            .as("shift_flag"))
    },

    // Exactly-k overlap census over three yearly activity sets: how
    // many customers were active in exactly 1, 2, or all 3 of
    // 1993/1994/1995 — the inclusion-exclusion census behind every
    // "new vs retained vs loyal" cohort chart (q50's set ops compute
    // one combination; this enumerates the multiplicity spectrum in
    // one pass of capture flags).
    QueryDef.sql(
      "q537_kway_overlap",
      """WITH f AS (SELECT o_custkey,
        |    MAX(CASE WHEN year(o_orderdate) = 1993 THEN 1 ELSE 0 END)
        |    + MAX(CASE WHEN year(o_orderdate) = 1994 THEN 1 ELSE 0 END)
        |    + MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS k
        |  FROM orders WHERE year(o_orderdate) IN (1993, 1994, 1995)
        |  GROUP BY 1),
        |n AS (SELECT COUNT(*) AS tot FROM f)
        |SELECT CAST(f.k AS BIGINT) AS years_active, COUNT(*) AS n_customers,
        |  CAST(1000000 * COUNT(*) // n.tot AS BIGINT) AS share_ppm
        |FROM f, n GROUP BY f.k, n.tot ORDER BY years_active""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir).orders
        .where(year(col("o_orderdate")).isin(1993, 1994, 1995))
        .groupBy("o_custkey")
        .agg((max(when(year(col("o_orderdate")) === 1993, 1L).otherwise(0L))
          + max(when(year(col("o_orderdate")) === 1994, 1L).otherwise(0L))
          + max(when(year(col("o_orderdate")) === 1995, 1L).otherwise(0L))).as("k"))
      val n = f.agg(count(lit(1)).as("tot"))
      f.crossJoin(broadcast(n))
        .groupBy(col("k").as("years_active"), col("tot"))
        .agg(count(lit(1)).as("n_customers"))
        .select(col("years_active"), col("n_customers"),
          expr("CAST(1000000 * n_customers div tot AS BIGINT)").as("share_ppm"))
        .orderBy("years_active")
    },

    // LSH S-curve design table: detection probability 1 − (1 − s^r)^b
    // for three 16-hash band layouts at three Jaccard levels — the
    // chart that picks (bands, rows) BEFORE a 100 TB dedup run (q26
    // runs one layout; q433 sweeps CMS width; this sweeps the LSH
    // design space). r and b are powers of two, so every power is a
    // chain of ppm-squarings — the truncation sequence is identical on
    // both engines, making the probabilities exact integers rather
    // than float approximations.
    QueryDef.sql(
      "q538_lsh_scurve",
      """WITH cfg(b, r) AS (VALUES (4, 4), (8, 2), (2, 8)),
        |sv(s) AS (VALUES (500000), (700000), (900000)),
        |c1 AS (SELECT b, r, s, CAST(s AS HUGEINT) AS x FROM cfg, sv),
        |p1 AS (SELECT b, r, s, (x * x) // 1000000 AS x FROM c1),
        |p2 AS (SELECT b, r, s,
        |    CASE WHEN r >= 4 THEN (x * x) // 1000000 ELSE x END AS x FROM p1),
        |p3 AS (SELECT b, r, s,
        |    CASE WHEN r >= 8 THEN (x * x) // 1000000 ELSE x END AS x FROM p2),
        |f0 AS (SELECT b, r, s, CAST(1000000 - x AS HUGEINT) AS y FROM p3),
        |q1 AS (SELECT b, r, s, (y * y) // 1000000 AS y FROM f0),
        |q2 AS (SELECT b, r, s,
        |    CASE WHEN b >= 4 THEN (y * y) // 1000000 ELSE y END AS y FROM q1),
        |q3 AS (SELECT b, r, s,
        |    CASE WHEN b >= 8 THEN (y * y) // 1000000 ELSE y END AS y FROM q2)
        |SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
        |  CAST(s AS BIGINT) AS jaccard_ppm,
        |  CAST(1000000 - y AS BIGINT) AS p_detect_ppm
        |FROM q3 ORDER BY bands, rows_per_band, jaccard_ppm""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c1 = Seq((4L, 4L), (8L, 2L), (2L, 8L)).toDF("b", "r")
        .crossJoin(Seq(500000L, 700000L, 900000L).toDF("s"))
        .select(col("b"), col("r"), col("s"), col("s").cast("decimal(38,0)").as("x"))
      val p = c1
        .withColumn("x", expr("(x * x) div 1000000"))
        .withColumn("x", when(col("r") >= 4, expr("(x * x) div 1000000"))
          .otherwise(col("x")))
        .withColumn("x", when(col("r") >= 8, expr("(x * x) div 1000000"))
          .otherwise(col("x")))
        .withColumn("y", (lit(1000000L) - col("x")).cast("decimal(38,0)"))
        .withColumn("y", expr("(y * y) div 1000000"))
        .withColumn("y", when(col("b") >= 4, expr("(y * y) div 1000000"))
          .otherwise(col("y")))
        .withColumn("y", when(col("b") >= 8, expr("(y * y) div 1000000"))
          .otherwise(col("y")))
      p.select(col("b").as("bands"), col("r").as("rows_per_band"),
          col("s").as("jaccard_ppm"),
          (lit(1000000L) - col("y")).cast("long").as("p_detect_ppm"))
        .orderBy("bands", "rows_per_band", "jaccard_ppm")
    },

    // Sargable-rewrite certification: `o_orderdate BETWEEN date AND
    // date` and `year(o_orderdate) = 1994` are the same predicate, but
    // only the first reaches the parquet scan as a pushed filter — the
    // query proves the REWRITE is lossless (identical counts) while
    // PLANS.md carries the .explain evidence that one plan prunes at
    // the scan and the other evaluates post-scan. The rule every slow
    // dashboard query needs applied.
    QueryDef.sql(
      "q539_sargable_rewrite",
      """WITH a AS (SELECT COUNT(*) AS n FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
        |b AS (SELECT COUNT(*) AS n FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT CAST(a.n AS BIGINT) AS sargable_count,
        |  CAST(b.n AS BIGINT) AS function_count,
        |  CAST(CASE WHEN a.n = b.n THEN 1 ELSE 0 END AS BIGINT) AS rewrite_ok
        |FROM a, b""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
      val a = o.where(col("o_orderdate")
          .between(lit("1996-01-01"), lit("1996-12-31")))
        .agg(count(lit(1)).as("sargable_count"))
      val b = o.where(year(col("o_orderdate")) === 1996)
        .agg(count(lit(1)).as("function_count"))
      a.crossJoin(broadcast(b))
        .select(col("sargable_count"), col("function_count"),
          when(col("sargable_count") === col("function_count"), 1L).otherwise(0L)
            .as("rewrite_ok"))
    },

    // Three-valued-logic certification matrix: the NULL behaviors a
    // cross-engine migration MUST rely on, pinned differentially in
    // one row — COUNT(*) vs COUNT(col), null-ignoring SUM, DISTINCT
    // collapsing NULLs to one, `= NULL` matching nothing vs null-safe
    // equality matching, `x IN (…, NULL)` never being TRUE for
    // non-members, and GROUP BY putting all NULLs in one group. For a
    // compare/migrate platform (the reference's core) these semantics
    // ARE the correctness contract; divergences (like DuckDB rounding
    // decimal→int casts where Spark truncates) are documented in the
    // verify skill instead of silently papered over.
    QueryDef.sql(
      "q540_null_semantics",
      """WITH v(id, x) AS (VALUES (1, 10), (2, NULL), (3, 10), (4, 20), (5, NULL)),
        |a AS (SELECT COUNT(*) AS count_star, COUNT(x) AS count_col,
        |    CAST(SUM(x) AS BIGINT) AS sum_ignoring_nulls,
        |    COUNT(DISTINCT x) AS distinct_non_null FROM v),
        |eq AS (SELECT COUNT(*) AS eq_null_matches FROM v WHERE x = NULL),
        |nse AS (SELECT COUNT(*) AS null_safe_matches FROM v
        |  WHERE x IS NOT DISTINCT FROM NULL),
        |inl AS (SELECT COUNT(*) AS in_list_matches FROM v WHERE x IN (20, NULL)),
        |grp AS (SELECT COUNT(*) AS n_groups FROM (SELECT x FROM v GROUP BY x))
        |SELECT a.count_star, a.count_col, a.sum_ignoring_nulls, a.distinct_non_null,
        |  CAST(eq.eq_null_matches AS BIGINT) AS eq_null_matches,
        |  CAST(nse.null_safe_matches AS BIGINT) AS null_safe_matches,
        |  CAST(inl.in_list_matches AS BIGINT) AS in_list_matches,
        |  CAST(grp.n_groups AS BIGINT) AS n_groups
        |FROM a, eq, nse, inl, grp""".stripMargin) { (s, dir) =>
      import s.implicits._
      val v = Seq((1L, Some(10L)), (2L, None), (3L, Some(10L)), (4L, Some(20L)),
        (5L, None)).toDF("id", "x")
      val a = v.agg(count(lit(1)).as("count_star"), count(col("x")).as("count_col"),
        sum("x").as("sum_ignoring_nulls"),
        countDistinct("x").as("distinct_non_null"))
      val eq = v.where(col("x") === lit(null)).agg(count(lit(1)).as("eq_null_matches"))
      val nse = v.where(col("x") <=> lit(null))
        .agg(count(lit(1)).as("null_safe_matches"))
      val inl = v.where(col("x").isin(20, null)).agg(count(lit(1)).as("in_list_matches"))
      val grp = v.groupBy("x").agg(count(lit(1))).agg(count(lit(1)).as("n_groups"))
      a.crossJoin(broadcast(eq)).crossJoin(broadcast(nse)).crossJoin(broadcast(inl))
        .crossJoin(broadcast(grp))
    },

    // Rounding-semantics certification matrix: the portable subset of
    // rounding behavior, pinned differentially — decimal round() is
    // half-AWAY-from-zero on both engines (positive and negative),
    // double round() agrees at the .5 boundary, ceil/floor agree on
    // negatives, scale rounding (1.25 → 1.3) agrees, and integer
    // div/% truncate toward zero on both. The one probed DIVERGENCE —
    // DuckDB ROUNDS decimal→int casts while Spark truncates — is kept
    // OUT of the portable matrix (both sides route through trunc) and
    // documented in the verify skill: casts of fractional values must
    // go through explicit FLOOR/trunc to be engine-portable.
    QueryDef.sql(
      "q541_rounding_matrix",
      """SELECT CAST(round(0.5) AS BIGINT) AS r_half,
        |  CAST(round(2.5) AS BIGINT) AS r_two_half,
        |  CAST(round(-1.5) AS BIGINT) AS r_neg,
        |  CAST(round(CAST(2.5 AS DOUBLE)) AS BIGINT) AS r_dbl,
        |  CAST(round(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS r_dbl_neg,
        |  CAST(ceil(-1.5) AS BIGINT) AS ceil_neg,
        |  CAST(floor(-1.5) AS BIGINT) AS floor_neg,
        |  CAST(round(1.25, 1) * 10 AS BIGINT) AS r_scale_deci,
        |  CAST(trunc(CAST(-1.5 AS DOUBLE)) AS BIGINT) AS trunc_neg,
        |  CAST(-7 // 2 AS BIGINT) AS int_div_neg,
        |  CAST(-7 % 2 AS BIGINT) AS mod_neg""".stripMargin) { (s, dir) =>
      val sp = s
      sp.sql("""SELECT CAST(round(0.5) AS BIGINT) AS r_half,
        |  CAST(round(2.5) AS BIGINT) AS r_two_half,
        |  CAST(round(-1.5) AS BIGINT) AS r_neg,
        |  CAST(round(CAST(2.5 AS DOUBLE)) AS BIGINT) AS r_dbl,
        |  CAST(round(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS r_dbl_neg,
        |  CAST(ceil(-1.5) AS BIGINT) AS ceil_neg,
        |  CAST(floor(-1.5) AS BIGINT) AS floor_neg,
        |  CAST(round(1.25, 1) * 10 AS BIGINT) AS r_scale_deci,
        |  CAST(CAST(-1.5 AS DOUBLE) AS BIGINT) AS trunc_neg,
        |  CAST(-7 AS BIGINT) div 2 AS int_div_neg,
        |  CAST(-7 % 2 AS BIGINT) AS mod_neg""".stripMargin)
    },

    // Transaction-log replay (the Delta/Iceberg metadata model):
    // reconstruct a table's live file set from an append-only action
    // log — every month-file is ADDed when its month closes and
    // REMOVEd three months later by compaction, so replay = last
    // action wins per file (one max-ordinal window), and the snapshot
    // census (live files, live bytes, tombstones eligible for vacuum)
    // is what any lakehouse reader computes before planning a scan.
    // The log is metadata-grain (~160 actions); the only fact scan is
    // the month-size aggregate the log is synthesized from.
    QueryDef.sql(
      "q542_action_log_replay",
      """WITH mf AS (SELECT strftime(o_orderdate, '%Y-%m') AS f, COUNT(*) AS rows_,
        |    ROW_NUMBER() OVER (ORDER BY strftime(o_orderdate, '%Y-%m')) AS seq
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT MAX(seq) AS last FROM mf),
        |log AS (SELECT f, rows_, seq AS ord, 'add' AS action FROM mf
        |  UNION ALL
        |  SELECT f, rows_, seq + 3, 'remove' FROM mf, mx WHERE seq + 3 <= mx.last),
        |last AS (SELECT f, rows_, action FROM (
        |    SELECT f, rows_, action,
        |      ROW_NUMBER() OVER (PARTITION BY f ORDER BY ord DESC) AS rk
        |    FROM log) WHERE rk = 1),
        |a AS (SELECT
        |    SUM(CASE WHEN action = 'add' THEN 1 ELSE 0 END) AS live_files,
        |    SUM(CASE WHEN action = 'add' THEN rows_ ELSE 0 END) AS live_rows,
        |    SUM(CASE WHEN action = 'remove' THEN 1 ELSE 0 END) AS tombstones,
        |    COUNT(*) AS total_files FROM last)
        |SELECT CAST(live_files AS BIGINT) AS live_files,
        |  CAST(live_rows AS BIGINT) AS live_rows,
        |  CAST(tombstones AS BIGINT) AS tombstones,
        |  CAST(total_files AS BIGINT) AS total_files
        |FROM a""".stripMargin) { (s, dir) =>
      val mf = Tables(s, dir).orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("f"))
        .agg(count(lit(1)).as("rows_"))
        .withColumn("seq", row_number().over(Window.orderBy("f")).cast("long"))
      val mx = mf.agg(max("seq").as("last"))
      val log = mf.select(col("f"), col("rows_"), col("seq").as("ord"),
          lit("add").as("action"))
        .unionAll(mf.crossJoin(broadcast(mx))
          .where(col("seq") + 3 <= col("last"))
          .select(col("f"), col("rows_"), (col("seq") + 3).as("ord"),
            lit("remove").as("action")))
      val last = log.withColumn("rk", row_number().over(
          Window.partitionBy("f").orderBy(col("ord").desc)))
        .where(col("rk") === 1)
      last.agg(
          sum(when(col("action") === "add", 1L).otherwise(0L)).as("live_files"),
          sum(when(col("action") === "add", col("rows_")).otherwise(0L))
            .as("live_rows"),
          sum(when(col("action") === "remove", 1L).otherwise(0L)).as("tombstones"),
          count(lit(1)).as("total_files"))
    },

    // Binned Kolmogorov-Smirnov distance between every source pair:
    // the sup-norm gap between cumulative 16-bin length profiles — the
    // metric that catches LOCATION shifts q533's intersection kernel
    // smears out (two sources can share mass yet have all of it on
    // opposite sides of the median). Cumulative ppm per source is one
    // ordered window over the 16-bin grid; the pairwise max-gap joins
    // 20×16 profile rows.
    QueryDef.sql(
      "q543_source_ks_matrix",
      """WITH b AS (SELECT source, LEAST(n_chars // 64, 15) AS bin, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |n AS (SELECT source, SUM(c) AS tot FROM b GROUP BY 1),
        |g AS (SELECT n.source, i.bin, COALESCE(b.c, 0) AS c, n.tot
        |  FROM n CROSS JOIN generate_series(0, 15) i(bin)
        |  LEFT JOIN b ON b.source = n.source AND b.bin = i.bin),
        |cdf AS (SELECT source, bin,
        |    (1000000 * SUM(c) OVER (PARTITION BY source ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING)) // tot AS cum_ppm
        |  FROM g),
        |k AS (SELECT a.source AS sa, b2.source AS sb,
        |    MAX(ABS(a.cum_ppm - b2.cum_ppm)) AS ks_ppm
        |  FROM cdf a JOIN cdf b2 ON a.bin = b2.bin AND a.source < b2.source
        |  GROUP BY 1, 2)
        |SELECT sa, sb, CAST(ks_ppm AS BIGINT) AS ks_ppm
        |FROM k ORDER BY ks_ppm DESC, sa, sb LIMIT 5""".stripMargin) { (s, dir) =>
      val b = Tables(s, dir).documents
        .groupBy(col("source"), least(expr("n_chars div 64"), lit(15L)).as("bin"))
        .agg(count(lit(1)).as("c"))
      val n = b.groupBy("source").agg(sum("c").as("tot"))
      val g = n.crossJoin(broadcast(s.range(16).select(col("id").as("bin"))))
        .join(b, Seq("source", "bin"), "left")
        .select(col("source"), col("bin"), coalesce(col("c"), lit(0L)).as("c"),
          col("tot"))
      val cdf = g.withColumn("cum_ppm",
        expr("(1000000 * SUM(c) OVER (PARTITION BY source ORDER BY bin" +
          " ROWS UNBOUNDED PRECEDING)) div tot"))
      cdf.select(col("bin"), col("source").as("sa"), col("cum_ppm").as("pa"))
        .join(cdf.select(col("bin"), col("source").as("sb"), col("cum_ppm").as("pb")),
          "bin")
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb")
        .agg(max(abs(col("pa") - col("pb"))).as("ks_ppm"))
        .orderBy(col("ks_ppm").desc, col("sa"), col("sb"))
        .limit(5)
    },

    // Local-bridge census (Granovetter's weak ties): an edge is a
    // local bridge when its endpoints share NO common neighbor — the
    // only path between its neighborhoods, the tie whose removal
    // lengthens distances, and the structural signature of
    // inter-community links (q159 counts triangles; this counts the
    // edges triangles SKIP). Edge support = one self-join counting
    // 2-paths per edge; bridges are support-0 edges — no DFS, no
    // articulation machinery, scales as the triangle count does.
    QueryDef.sql(
      "q544_local_bridges",
      """WITH e0 AS (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS cnt
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |t AS (SELECT SUM(cnt) AS tot, COUNT(*) AS ne FROM e0),
        |ed AS (SELECT src, dst FROM e0, t WHERE 2 * cnt * ne >= 3 * tot),
        |e AS (SELECT src AS u, dst AS v FROM ed WHERE src < dst
        |  UNION SELECT dst, src FROM ed WHERE dst < src),
        |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        |  CAST(SUM(CASE WHEN s2.support = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS local_bridges,
        |  CAST(1000000 * SUM(CASE WHEN s2.support = 0 THEN 1 ELSE 0 END) // COUNT(*)
        |    AS BIGINT) AS bridge_ppm
        |FROM (SELECT e.u, e.v,
        |    (SELECT COUNT(*) FROM sym a JOIN sym b
        |      ON a.u = e.u AND b.u = e.v AND a.v = b.v
        |      AND a.v <> e.u AND a.v <> e.v) AS support
        |  FROM e) s2""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val e0 = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
      val tot = e0.agg(sum("cnt").as("tot"), count(lit(1)).as("ne"))
      val ed = e0.crossJoin(broadcast(tot))
        .where(lit(2) * col("cnt") * col("ne") >= lit(3) * col("tot"))
        .select("src", "dst")
      val e = ed.where(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
        .union(ed.where(col("dst") < col("src"))
          .select(col("dst").as("u"), col("src").as("v")))
        .distinct().cache()
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()
      // support(u,v) = common neighbors of u and v (excluding the pair):
      // neighbors-of-u (w1) equi-joined against neighbors-of-v (w2)
      val sup = e
        .join(sym.select(col("u"), col("v").as("w1")), Seq("u"))
        .join(sym.select(col("u").as("v"), col("v").as("w2")), Seq("v"))
        .where(col("w1") === col("w2") &&
          col("w1") =!= col("u") && col("w1") =!= col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
      e.join(sup, Seq("u", "v"), "left")
        .select(col("u"), col("v"), coalesce(col("support"), lit(0L)).as("support"))
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("support") === 0, 1L).otherwise(0L)).as("local_bridges"))
        .select(col("n_edges"), col("local_bridges"),
          expr("CAST(1000000 * local_bridges div n_edges AS BIGINT)")
            .as("bridge_ppm"))
    },

    // Retry-policy advisor: for per-attempt failure probabilities of
    // 1/5/10/25% and retry budgets 0..3, the exact success probability
    // 1 − p^(r+1) and the expected send count (1 − p^(r+1))/(1 − p) —
    // the two numbers that size dead-letter queues and price retry
    // storms (q514 prices the queue; this prices the traffic feeding
    // it). Pure ppm power chains over a 16-row spine, zero data
    // access.
    QueryDef.sql(
      "q545_retry_advisor",
      """WITH p(pf) AS (VALUES (10000), (50000), (100000), (250000)),
        |r(rt) AS (VALUES (0), (1), (2), (3)),
        |c AS (SELECT pf, rt, CAST(pf AS HUGEINT) AS x FROM p, r),
        |w1 AS (SELECT pf, rt, CASE WHEN rt >= 1 THEN (x * pf) // 1000000 ELSE x END
        |  AS x FROM c),
        |w2 AS (SELECT pf, rt, CASE WHEN rt >= 2 THEN (x * pf) // 1000000 ELSE x END
        |  AS x FROM w1),
        |w3 AS (SELECT pf, rt, CASE WHEN rt >= 3 THEN (x * pf) // 1000000 ELSE x END
        |  AS x FROM w2)
        |SELECT CAST(pf AS BIGINT) AS p_fail_ppm, CAST(rt AS BIGINT) AS max_retries,
        |  CAST(1000000 - x AS BIGINT) AS p_success_ppm,
        |  CAST((1000 * (1000000 - x)) // (1000000 - pf) AS BIGINT)
        |    AS expected_sends_milli
        |FROM w3 ORDER BY p_fail_ppm, max_retries""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Seq(10000L, 50000L, 100000L, 250000L).toDF("pf")
        .crossJoin(Seq(0L, 1L, 2L, 3L).toDF("rt"))
        .select(col("pf"), col("rt"), col("pf").cast("decimal(38,0)").as("x"))
      val w = c
        .withColumn("x", when(col("rt") >= 1, expr("(x * pf) div 1000000"))
          .otherwise(col("x")))
        .withColumn("x", when(col("rt") >= 2, expr("(x * pf) div 1000000"))
          .otherwise(col("x")))
        .withColumn("x", when(col("rt") >= 3, expr("(x * pf) div 1000000"))
          .otherwise(col("x")))
      w.select(col("pf").as("p_fail_ppm"), col("rt").as("max_retries"),
          (lit(1000000L) - col("x")).cast("long").as("p_success_ppm"),
          expr("CAST((1000 * (1000000 - x)) div (1000000 - pf) AS BIGINT)")
            .as("expected_sends_milli"))
        .orderBy("p_fail_ppm", "max_retries")
    },

    // Synthetic-control effect estimate: nation 0's 1996 mean order
    // value against a donor-pool counterfactual — every other nation
    // weighted by 10¹²/(10³+|pre-gap|), i.e. donors that matched the
    // treated unit in 1995 dominate the control (the Abadie idea with
    // exact rational weights instead of a constrained regression).
    // Effect = treated post − weighted donor post; with no real
    // intervention in the fixture the estimate doubles as a placebo
    // check. Two year-grain aggregates, one 24-row weighted assembly.
    QueryDef.sql(
      "q546_synthetic_control",
      """WITH y AS (SELECT c.c_nationkey AS nk, year(o.o_orderdate) AS yr,
        |    (1000 * SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT))) // COUNT(*)
        |      AS mean_milli
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE year(o.o_orderdate) IN (1995, 1996) GROUP BY 1, 2),
        |pre AS (SELECT nk, mean_milli FROM y WHERE yr = 1995),
        |post AS (SELECT nk, mean_milli FROM y WHERE yr = 1996),
        |t0 AS (SELECT p.mean_milli AS pre_t, q.mean_milli AS post_t
        |  FROM pre p JOIN post q ON p.nk = q.nk WHERE p.nk = 0),
        |don AS (SELECT p.nk, p.mean_milli AS pre_d, q.mean_milli AS post_d,
        |    CAST(1000000000000 AS HUGEINT) // (1000 + ABS(p.mean_milli - t0.pre_t)) AS w
        |  FROM pre p JOIN post q ON p.nk = q.nk CROSS JOIN t0 WHERE p.nk <> 0),
        |ctl AS (SELECT SUM(CAST(w AS HUGEINT) * post_d) // SUM(w) AS control_post
        |  FROM don)
        |SELECT CAST(t0.pre_t AS BIGINT) AS pre_treated,
        |  CAST(t0.post_t AS BIGINT) AS post_treated,
        |  CAST(ctl.control_post AS BIGINT) AS control_post,
        |  CAST(t0.post_t - ctl.control_post AS BIGINT) AS effect_milli
        |FROM t0, ctl""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val y = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .where(year(col("o_orderdate")).isin(1995, 1996))
        .groupBy(col("c_nationkey").as("nk"), year(col("o_orderdate")).as("yr"))
        .agg(expr("(1000 * SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)))" +
          " div COUNT(*)").as("mean_milli"))
        .cache()
      val pre = y.where(col("yr") === 1995).select(col("nk"), col("mean_milli").as("pre_m"))
      val post = y.where(col("yr") === 1996)
        .select(col("nk"), col("mean_milli").as("post_m"))
      val both = pre.join(post, "nk")
      val t0 = both.where(col("nk") === 0)
        .select(col("pre_m").as("pre_t"), col("post_m").as("post_t"))
      val don = both.where(col("nk") =!= 0).crossJoin(broadcast(t0))
        .select(col("post_m"),
          expr("CAST(1000000000000 AS DECIMAL(38,0)) div (1000 + ABS(pre_m - pre_t))")
            .as("w"))
      val ctl = don.agg(
        expr("SUM(CAST(w AS DECIMAL(38,0)) * post_m) div SUM(w)").as("control_post"))
      t0.crossJoin(broadcast(ctl))
        .select(col("pre_t").as("pre_treated"), col("post_t").as("post_treated"),
          col("control_post").cast("long").as("control_post"),
          (col("post_t") - col("control_post")).cast("long").as("effect_milli"))
    },

    // FK-closed consistent sample export: a 10% customer sample plus
    // the referential CLOSURE (their orders, those orders' lineitems) —
    // the only way to stage a representative dev dataset where every
    // foreign key still resolves (row-sampling each table breaks
    // virtually every join). The md5 sample is deterministic; the two
    // closure joins are broadcast semi-joins down the key chain; and
    // the zero orphan counts in the output ARE the referential
    // certificate.
    QueryDef.sql(
      "q547_consistent_sample_export",
      """WITH sc AS (SELECT c_custkey FROM customer
        |  WHERE ('0x' || substr(md5('e' || c_custkey), 1, 6))::BIGINT % 10 = 0),
        |so AS (SELECT o.o_orderkey, o.o_custkey FROM orders o
        |  JOIN sc ON o.o_custkey = sc.c_custkey),
        |sl AS (SELECT l.l_orderkey FROM lineitem l
        |  JOIN so ON l.l_orderkey = so.o_orderkey),
        |tot AS (SELECT COUNT(*) AS nc FROM customer),
        |orph_o AS (SELECT COUNT(*) AS n FROM so
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM sc)),
        |orph_l AS (SELECT COUNT(*) AS n FROM sl
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM so))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS n_customers,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM so) AS n_orders,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sl) AS n_lineitems,
        |  (SELECT CAST(1000000 * (SELECT COUNT(*) FROM sc) // nc AS BIGINT) FROM tot)
        |    AS sample_ppm,
        |  (SELECT CAST(n AS BIGINT) FROM orph_o) AS orphan_orders,
        |  (SELECT CAST(n AS BIGINT) FROM orph_l) AS orphan_lineitems""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val sc = t.customer.where(
        expr("CAST(conv(substring(md5(concat('e', c_custkey)), 1, 6), 16, 10)" +
          " AS BIGINT) % 10") === 0)
        .select("c_custkey").cache()
      val so = t.orders.join(broadcast(sc), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey").cache()
      val sl2 = t.lineitem.join(so.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      val tot = t.customer.agg(count(lit(1)).as("nc"))
      val orphO = so.join(sc, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_orders"))
      val orphL = t.lineitem
        .join(so.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"),
          "left_semi")
        .join(so.select(col("o_orderkey").as("ok2")), col("l_orderkey") === col("ok2"),
          "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      sc.agg(count(lit(1)).as("n_customers"))
        .crossJoin(broadcast(so.agg(count(lit(1)).as("n_orders"))))
        .crossJoin(broadcast(sl2.agg(count(lit(1)).as("n_lineitems"))))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(orphO))
        .crossJoin(broadcast(orphL))
        .select(col("n_customers"), col("n_orders"), col("n_lineitems"),
          expr("CAST(1000000 * n_customers div nc AS BIGINT)").as("sample_ppm"),
          col("orphan_orders"), col("orphan_lineitems"))
    },

    // HLL sizing table anchored to a measured cardinality: the
    // standard-error law 1.04/√m for register counts m = 4^k (whose
    // square roots are EXACT, so the table is pure integers), the
    // register-array footprint, and the expected absolute error
    // against the exactly-counted customer NDV — the sketch-sizing
    // decision (q60/q163 run the sketches; this prices them before
    // running anything).
    QueryDef.sql(
      "q548_hll_sizing",
      """WITH m(m, rt) AS (VALUES (256, 16), (1024, 32), (4096, 64), (16384, 128)),
        |d AS (SELECT COUNT(DISTINCT o_custkey) AS ndv FROM orders)
        |SELECT CAST(m.m AS BIGINT) AS registers,
        |  CAST(1040000 // m.rt AS BIGINT) AS rel_err_ppm,
        |  CAST((m.m * 6 + 7) // 8 AS BIGINT) AS sketch_bytes,
        |  CAST(d.ndv AS BIGINT) AS measured_ndv,
        |  CAST((CAST(d.ndv AS HUGEINT) * (1040000 // m.rt)) // 1000000 AS BIGINT)
        |    AS expected_abs_err
        |FROM m, d ORDER BY registers""".stripMargin) { (s, dir) =>
      import s.implicits._
      val m = Seq((256L, 16L), (1024L, 32L), (4096L, 64L), (16384L, 128L))
        .toDF("m", "rt")
      val d = Tables(s, dir).orders.agg(countDistinct("o_custkey").as("ndv"))
      m.crossJoin(broadcast(d))
        .select(col("m").as("registers"),
          expr("1040000 div rt").as("rel_err_ppm"),
          expr("(m * 6 + 7) div 8").as("sketch_bytes"),
          col("ndv").as("measured_ndv"),
          expr("CAST((CAST(ndv AS DECIMAL(38,0)) * (1040000 div rt)) div 1000000" +
            " AS BIGINT)").as("expected_abs_err"))
        .orderBy("registers")
    },

    // Cube-coverage census: which (nation × segment) cells have NO
    // orders in each year — the completeness audit that catches silent
    // upstream drops before a dashboard renders them as zeros (q49's
    // rollup aggregates what EXISTS; this counts what doesn't). The
    // expected spine is the dimension cross product per year; observed
    // cells are one grouped count; missing = spine − observed, as an
    // exact per-year coverage ppm.
    QueryDef.sql(
      "q549_cube_coverage",
      """WITH obs AS (SELECT year(o.o_orderdate) AS yr, c.c_nationkey AS nk,
        |    c.c_mktsegment AS seg
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2, 3),
        |yrs AS (SELECT DISTINCT yr FROM obs),
        |spine AS (SELECT y.yr, n.n_nationkey AS nk, s.seg FROM yrs y
        |  CROSS JOIN nation n
        |  CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s),
        |j AS (SELECT sp.yr,
        |    COUNT(*) AS expected,
        |    SUM(CASE WHEN o.nk IS NOT NULL THEN 1 ELSE 0 END) AS observed
        |  FROM spine sp LEFT JOIN obs o
        |    ON sp.yr = o.yr AND sp.nk = o.nk AND sp.seg = o.seg
        |  GROUP BY 1)
        |SELECT CAST(yr AS BIGINT) AS yr, CAST(expected AS BIGINT) AS expected_cells,
        |  CAST(observed AS BIGINT) AS observed_cells,
        |  CAST(expected - observed AS BIGINT) AS missing_cells,
        |  CAST(1000000 * observed // expected AS BIGINT) AS coverage_ppm
        |FROM j ORDER BY yr""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val obs = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("yr"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)))
        .select("yr", "nk", "seg")
        .cache()
      val spine = obs.select("yr").distinct()
        .crossJoin(broadcast(t.nation.select(col("n_nationkey").as("nk"))))
        .crossJoin(broadcast(t.customer.select(col("c_mktsegment").as("seg")).distinct()))
      spine.join(obs.withColumn("hit", lit(1L)), Seq("yr", "nk", "seg"), "left")
        .groupBy("yr")
        .agg(count(lit(1)).as("expected_cells"),
          sum(coalesce(col("hit"), lit(0L))).as("observed_cells"))
        .select(col("yr").cast("long").as("yr"), col("expected_cells"),
          col("observed_cells"),
          (col("expected_cells") - col("observed_cells")).as("missing_cells"),
          expr("CAST(1000000 * observed_cells div expected_cells AS BIGINT)")
            .as("coverage_ppm"))
        .orderBy("yr")
    },

    // Scheduling-policy advisor: mean job wait under FIFO (arrival
    // order) vs shortest-processing-time-first, computed EXACTLY from
    // prefix sums over the first 1000 "jobs" (order line counts as
    // service times) — SPT provably minimizes mean wait, and the
    // measured ratio is the argument for size-aware task queues in any
    // shared cluster. Wait(i) = Σ of service times before i = one
    // exclusive prefix-sum window per ordering; two orderings, one job
    // table.
    QueryDef.sql(
      "q550_scheduling_advisor",
      """WITH j AS (SELECT l_orderkey AS jid, COUNT(*) AS svc
        |  FROM lineitem GROUP BY 1 ORDER BY l_orderkey LIMIT 1000),
        |fifo AS (SELECT jid, svc,
        |    COALESCE(SUM(svc) OVER (ORDER BY jid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wait
        |  FROM j),
        |spt AS (SELECT jid, svc,
        |    COALESCE(SUM(svc) OVER (ORDER BY svc, jid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wait
        |  FROM j),
        |a AS (SELECT (SELECT SUM(wait) FROM fifo) AS wf,
        |    (SELECT SUM(wait) FROM spt) AS ws, (SELECT COUNT(*) FROM j) AS n)
        |SELECT CAST(n AS BIGINT) AS n_jobs,
        |  CAST((1000 * CAST(wf AS HUGEINT)) // n AS BIGINT) AS fifo_mean_wait_milli,
        |  CAST((1000 * CAST(ws AS HUGEINT)) // n AS BIGINT) AS spt_mean_wait_milli,
        |  CAST((1000 * CAST(wf AS HUGEINT)) // GREATEST(ws, 1) AS BIGINT)
        |    AS fifo_over_spt_milli
        |FROM a""".stripMargin) { (s, dir) =>
      val j = Tables(s, dir).lineitem
        .groupBy(col("l_orderkey").as("jid")).agg(count(lit(1)).as("svc"))
        .orderBy("jid").limit(1000).cache()
      def meanWait(order: Seq[org.apache.spark.sql.Column], name: String) = j
        .withColumn("wait", coalesce(sum("svc").over(
          Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .agg(sum("wait").as(name))
      val n = j.agg(count(lit(1)).as("n"))
      meanWait(Seq(col("jid")), "wf")
        .crossJoin(broadcast(meanWait(Seq(col("svc"), col("jid")), "ws")))
        .crossJoin(broadcast(n))
        .select(col("n").as("n_jobs"),
          expr("CAST((1000 * CAST(wf AS DECIMAL(38,0))) div n AS BIGINT)")
            .as("fifo_mean_wait_milli"),
          expr("CAST((1000 * CAST(ws AS DECIMAL(38,0))) div n AS BIGINT)")
            .as("spt_mean_wait_milli"),
          expr("CAST((1000 * CAST(wf AS DECIMAL(38,0))) div GREATEST(ws, 1) AS BIGINT)")
            .as("fifo_over_spt_milli"))
    },

    // Hash-seed sensitivity audit: the SAME 10% deterministic sample
    // drawn under 5 different md5 salts — five independent estimates
    // of the mean order value whose spread should sit inside the
    // sampling-theory band (the cheap Monte-Carlo check that a
    // hash-sample estimator isn't secretly correlated with its key).
    // One pass computes all five capture flags (salted coins are
    // columns, not reruns); the output is per-seed estimates plus the
    // max pairwise spread in ppm of the global mean.
    QueryDef.sql(
      "q551_seed_sensitivity",
      """WITH o AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS c,
        |    ('0x' || substr(md5('s1:' || o_orderkey), 1, 6))::BIGINT % 10 AS b1,
        |    ('0x' || substr(md5('s2:' || o_orderkey), 1, 6))::BIGINT % 10 AS b2,
        |    ('0x' || substr(md5('s3:' || o_orderkey), 1, 6))::BIGINT % 10 AS b3,
        |    ('0x' || substr(md5('s4:' || o_orderkey), 1, 6))::BIGINT % 10 AS b4,
        |    ('0x' || substr(md5('s5:' || o_orderkey), 1, 6))::BIGINT % 10 AS b5
        |  FROM orders),
        |a AS (SELECT
        |    (1000 * SUM(CASE WHEN b1 = 0 THEN c ELSE 0 END))
        |      // GREATEST(SUM(CASE WHEN b1 = 0 THEN 1 ELSE 0 END), 1) AS m1,
        |    (1000 * SUM(CASE WHEN b2 = 0 THEN c ELSE 0 END))
        |      // GREATEST(SUM(CASE WHEN b2 = 0 THEN 1 ELSE 0 END), 1) AS m2,
        |    (1000 * SUM(CASE WHEN b3 = 0 THEN c ELSE 0 END))
        |      // GREATEST(SUM(CASE WHEN b3 = 0 THEN 1 ELSE 0 END), 1) AS m3,
        |    (1000 * SUM(CASE WHEN b4 = 0 THEN c ELSE 0 END))
        |      // GREATEST(SUM(CASE WHEN b4 = 0 THEN 1 ELSE 0 END), 1) AS m4,
        |    (1000 * SUM(CASE WHEN b5 = 0 THEN c ELSE 0 END))
        |      // GREATEST(SUM(CASE WHEN b5 = 0 THEN 1 ELSE 0 END), 1) AS m5,
        |    (1000 * SUM(c)) // COUNT(*) AS mg
        |  FROM o)
        |SELECT CAST(mg AS BIGINT) AS global_mean_milli,
        |  CAST(m1 AS BIGINT) AS seed1_milli, CAST(m2 AS BIGINT) AS seed2_milli,
        |  CAST(m3 AS BIGINT) AS seed3_milli, CAST(m4 AS BIGINT) AS seed4_milli,
        |  CAST(m5 AS BIGINT) AS seed5_milli,
        |  CAST((1000000 * (GREATEST(m1, m2, m3, m4, m5)
        |    - LEAST(m1, m2, m3, m4, m5))) // mg AS BIGINT) AS spread_ppm
        |FROM a""".stripMargin) { (s, dir) =>
      val cols = floor(col("o_totalprice") * lit(100.0)).cast("long").as("c") +:
        (1 to 5).map(i =>
          expr(s"CAST(conv(substring(md5(concat('s$i:', o_orderkey)), 1, 6), 16, 10)" +
            s" AS BIGINT) % 10").as(s"b$i"))
      val o = Tables(s, dir).orders.select(cols: _*)
      def m(i: Int) =
        expr(s"(1000 * SUM(CASE WHEN b$i = 0 THEN c ELSE 0 END))" +
          s" div GREATEST(SUM(CASE WHEN b$i = 0 THEN 1 ELSE 0 END), 1)").as(s"m$i")
      o.agg(m(1), m(2), m(3), m(4), m(5),
          expr("(1000 * SUM(c)) div COUNT(*)").as("mg"))
        .select(col("mg").as("global_mean_milli"),
          col("m1").as("seed1_milli"), col("m2").as("seed2_milli"),
          col("m3").as("seed3_milli"), col("m4").as("seed4_milli"),
          col("m5").as("seed5_milli"),
          expr("CAST((1000000 * (GREATEST(m1, m2, m3, m4, m5)" +
            " - LEAST(m1, m2, m3, m4, m5))) div mg AS BIGINT)").as("spread_ppm"))
    },

    // Composite release gate: the three independent checks a data
    // release runs before publish — sample-ratio mismatch on the
    // treatment split (q310's z² idiom), binned-KS drift between the
    // last two years' value distributions (q543's sup-norm), and
    // worst-year cube coverage (q549) — folded to one verdict row.
    // Each check is a tiny aggregate over a different grain of the
    // same fact table; the gate passes only when ALL pass, which is
    // the operational contract (one red check blocks the release).
    QueryDef.sql(
      "q552_release_gate",
      """WITH s1 AS (SELECT
        |    SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS nt,
        |    SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS nc
        |  FROM orders),
        |srm AS (SELECT CASE WHEN 1000 * (nt - nc) * (nt - nc) <= 3841 * (nt + nc)
        |    THEN 1 ELSE 0 END AS srm_ok FROM s1),
        |yy AS (SELECT MAX(year(o_orderdate)) AS y2 FROM orders),
        |b AS (SELECT year(o_orderdate) AS yr,
        |    LEAST(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) // 500000, 15) AS bin,
        |    COUNT(*) AS c
        |  FROM orders, yy WHERE year(o_orderdate) IN (yy.y2 - 1, yy.y2)
        |  GROUP BY 1, 2),
        |n AS (SELECT yr, SUM(c) AS tot FROM b GROUP BY 1),
        |g AS (SELECT n.yr, i.bin, COALESCE(b.c, 0) AS c, n.tot
        |  FROM n CROSS JOIN generate_series(0, 15) i(bin)
        |  LEFT JOIN b ON b.yr = n.yr AND b.bin = i.bin),
        |cdf AS (SELECT yr, bin, (1000000 * SUM(c) OVER (PARTITION BY yr ORDER BY bin
        |    ROWS UNBOUNDED PRECEDING)) // tot AS p FROM g),
        |ks AS (SELECT MAX(ABS(a.p - b2.p)) AS ks_ppm
        |  FROM cdf a JOIN cdf b2 ON a.bin = b2.bin AND a.yr < b2.yr),
        |kg AS (SELECT CASE WHEN ks_ppm <= 50000 THEN 1 ELSE 0 END AS ks_ok, ks_ppm
        |  FROM ks),
        |cov AS (SELECT MIN(obs) AS min_obs FROM (
        |  SELECT year(o.o_orderdate) AS yr, COUNT(DISTINCT c.c_nationkey) AS obs
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1)),
        |cg AS (SELECT CASE WHEN min_obs >= 20 THEN 1 ELSE 0 END AS cov_ok, min_obs
        |  FROM cov)
        |SELECT CAST(srm.srm_ok AS BIGINT) AS srm_ok,
        |  CAST(kg.ks_ok AS BIGINT) AS ks_ok, CAST(kg.ks_ppm AS BIGINT) AS ks_ppm,
        |  CAST(cg.cov_ok AS BIGINT) AS coverage_ok,
        |  CAST(cg.min_obs AS BIGINT) AS min_nations_per_year,
        |  CAST(srm.srm_ok * kg.ks_ok * cg.cov_ok AS BIGINT) AS gate_pass
        |FROM srm, kg, cg""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val o = t.orders
      val srm = o.agg(
          sum(when(col("o_orderkey") % 2 === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("o_orderkey") % 2 === 0, 1L).otherwise(0L)).as("nc"))
        .select(when(lit(1000L) * (col("nt") - col("nc")) * (col("nt") - col("nc"))
          <= lit(3841L) * (col("nt") + col("nc")), 1L).otherwise(0L).as("srm_ok"))
      val y2 = o.agg(max(year(col("o_orderdate"))).as("y2"))
      val b = o.crossJoin(broadcast(y2))
        // max year is y2, so ≥ y2−1 ≡ IN (y2−1, y2)
        .where(year(col("o_orderdate")) >= col("y2") - 1)
        .groupBy(year(col("o_orderdate")).as("yr"),
          least(expr("CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) div 500000"),
            lit(15L)).as("bin"))
        .agg(count(lit(1)).as("c"))
      val n = b.groupBy("yr").agg(sum("c").as("tot"))
      val g = n.crossJoin(broadcast(s.range(16).select(col("id").as("bin"))))
        .join(b, Seq("yr", "bin"), "left")
        .select(col("yr"), col("bin"), coalesce(col("c"), lit(0L)).as("c"), col("tot"))
      val cdf = g.withColumn("p",
        expr("(1000000 * SUM(c) OVER (PARTITION BY yr ORDER BY bin" +
          " ROWS UNBOUNDED PRECEDING)) div tot"))
      val ks = cdf.select(col("bin"), col("yr").as("ya"), col("p").as("pa"))
        .join(cdf.select(col("bin"), col("yr").as("yb"), col("p").as("pb")), "bin")
        .where(col("ya") < col("yb"))
        .agg(max(abs(col("pa") - col("pb"))).as("ks_ppm"))
        .select(when(col("ks_ppm") <= 50000, 1L).otherwise(0L).as("ks_ok"),
          col("ks_ppm"))
      val cov = o.join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(countDistinct("c_nationkey").as("obs"))
        .agg(min("obs").as("min_obs"))
        .select(when(col("min_obs") >= 20, 1L).otherwise(0L).as("cov_ok"),
          col("min_obs"))
      srm.crossJoin(broadcast(ks)).crossJoin(broadcast(cov))
        .select(col("srm_ok"), col("ks_ok"), col("ks_ppm").cast("long").as("ks_ppm"),
          col("cov_ok").as("coverage_ok"),
          col("min_obs").as("min_nations_per_year"),
          (col("srm_ok") * col("ks_ok") * col("cov_ok")).as("gate_pass"))
    },

    // Bitmap-index advisor: per candidate column, the classic
    // cardinality rule priced in bytes — a bitmap index costs
    // ~ndv·rows/8 (one bitmap per value), a B-tree ~rows·(key+ptr) —
    // so bitmaps win exactly on low-NDV columns and lose
    // catastrophically past a few hundred values. Completes the
    // index-advisory trio (q520 scan-vs-index, q516 encodings) with
    // the same one-pass measured stats.
    QueryDef.sql(
      "q553_bitmap_advisor",
      """WITH s AS (
        |  SELECT 'o_orderpriority' AS col, COUNT(*) AS n,
        |    COUNT(DISTINCT o_orderpriority) AS ndv FROM orders
        |  UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(DISTINCT o_orderstatus)
        |  FROM orders
        |  UNION ALL SELECT 'o_custkey', COUNT(*), COUNT(DISTINCT o_custkey)
        |  FROM orders),
        |e AS (SELECT col, n, ndv,
        |    (CAST(ndv AS HUGEINT) * n + 7) // 8 AS bitmap_bytes,
        |    CAST(n AS HUGEINT) * 16 AS btree_bytes FROM s)
        |SELECT col, CAST(n AS BIGINT) AS n_rows, CAST(ndv AS BIGINT) AS ndv,
        |  CAST(bitmap_bytes AS BIGINT) AS bitmap_bytes,
        |  CAST(btree_bytes AS BIGINT) AS btree_bytes,
        |  CASE WHEN bitmap_bytes < btree_bytes THEN 'bitmap' ELSE 'btree' END
        |    AS verdict
        |FROM e ORDER BY col""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
      def st(name: String, c: String) = o
        .agg(count(lit(1)).as("n"), countDistinct(c).as("ndv"))
        .select(lit(name).as("col"), col("n"), col("ndv"))
      st("o_orderpriority", "o_orderpriority")
        .unionAll(st("o_orderstatus", "o_orderstatus"))
        .unionAll(st("o_custkey", "o_custkey"))
        .select(col("col"), col("n").as("n_rows"), col("ndv"),
          expr("(CAST(ndv AS DECIMAL(38,0)) * n + 7) div 8").cast("long")
            .as("bitmap_bytes"),
          (col("n") * 16).as("btree_bytes"))
        .withColumn("verdict",
          when(col("bitmap_bytes") < col("btree_bytes"), "bitmap").otherwise("btree"))
        .orderBy("col")
    },

    // Hierarchy-additivity certification: revenue aggregated AT region
    // grain must equal the sum of its nations' totals — trivially true
    // inside one consistent engine, and exactly the invariant that
    // breaks when denormalized rollup tables drift from their base
    // facts (the reference's compare jobs exist to catch this class).
    // Both paths scan once; the certificate is a 5-row equality join.
    QueryDef.sql(
      "q554_hierarchy_additivity",
      """WITH nat AS (SELECT n.n_regionkey AS rk, n.n_nationkey AS nk,
        |    SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |up AS (SELECT rk, SUM(cents) AS rollup_cents, COUNT(*) AS n_nations
        |  FROM nat GROUP BY 1),
        |direct AS (SELECT n.n_regionkey AS rk,
        |    SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS direct_cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1)
        |SELECT r.r_name AS region, CAST(u.n_nations AS BIGINT) AS n_nations,
        |  CAST(u.rollup_cents AS BIGINT) AS rollup_cents,
        |  CAST(d.direct_cents AS BIGINT) AS direct_cents,
        |  CAST(CASE WHEN u.rollup_cents = d.direct_cents THEN 1 ELSE 0 END AS BIGINT)
        |    AS additive_ok
        |FROM up u JOIN direct d ON u.rk = d.rk
        |JOIN region r ON u.rk = r.r_regionkey ORDER BY region""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val base = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_regionkey").as("rk"), col("n_nationkey").as("nk"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
        .cache()
      val up = base.groupBy("rk", "nk").agg(sum("cents").as("c"))
        .groupBy("rk").agg(sum("c").as("rollup_cents"), count(lit(1)).as("n_nations"))
      val direct = base.groupBy("rk").agg(sum("cents").as("direct_cents"))
      up.join(direct, "rk")
        .join(broadcast(t.region), col("rk") === col("r_regionkey"))
        .select(col("r_name").as("region"), col("n_nations"), col("rollup_cents"),
          col("direct_cents"),
          when(col("rollup_cents") === col("direct_cents"), 1L).otherwise(0L)
            .as("additive_ok"))
        .orderBy("region")
    },

    // Scan pricing: bytes a query pays under (a) full-table scan, (b)
    // column pruning, (c) pruning + the pushed filter's row-group
    // skipping — priced from measured per-column bytes and the
    // predicate's measured selectivity, the quantified companion to
    // q539's plan evidence (PushedFilters shows THAT it prunes; this
    // says how many bytes it saves). One stats pass; three pattern
    // rows with savings in ppm of the full scan.
    QueryDef.sql(
      "q555_scan_pricing",
      """WITH s AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(len(o_orderstatus) + len(o_orderpriority) + 8 * 4) AS BIGINT)
        |      AS total_bytes,
        |    CAST(SUM(8 + 8) AS BIGINT) AS proj_bytes,
        |    SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS hits
        |  FROM orders),
        |p AS (SELECT 'a_full_scan' AS pattern, total_bytes AS bytes_read, n FROM s
        |  UNION ALL SELECT 'b_column_pruned', proj_bytes, n FROM s
        |  UNION ALL SELECT 'c_pruned_and_filtered',
        |    (proj_bytes * hits) // n, n FROM s),
        |f AS (SELECT pattern, bytes_read, n,
        |    (SELECT total_bytes FROM s) AS fullb FROM p)
        |SELECT pattern, CAST(bytes_read AS BIGINT) AS bytes_read,
        |  CAST(1000000 - (1000000 * bytes_read) // fullb AS BIGINT) AS savings_ppm
        |FROM f ORDER BY pattern""".stripMargin) { (s, dir) =>
      val st = Tables(s, dir).orders.agg(count(lit(1)).as("n"),
        sum(length(col("o_orderstatus")) + length(col("o_orderpriority")) + lit(32))
          .cast("long").as("total_bytes"),
        sum(lit(16L)).as("proj_bytes"),
        sum(when(year(col("o_orderdate")) === 1996, 1L).otherwise(0L)).as("hits"))
      val p = st.select(lit("a_full_scan").as("pattern"),
          col("total_bytes").as("bytes_read"), col("total_bytes"))
        .unionAll(st.select(lit("b_column_pruned").as("pattern"),
          col("proj_bytes").as("bytes_read"), col("total_bytes")))
        .unionAll(st.select(lit("c_pruned_and_filtered").as("pattern"),
          expr("(proj_bytes * hits) div n").as("bytes_read"), col("total_bytes")))
      p.select(col("pattern"), col("bytes_read"),
          expr("CAST(1000000 - (1000000 * bytes_read) div total_bytes AS BIGINT)")
            .as("savings_ppm"))
        .orderBy("pattern")
    },

    // Sample-quantile accuracy audit: the p50/p99 of order value from
    // a deterministic 1-in-16 hash sample against the exact order
    // statistics — the measured error (in ppm of the exact value) that
    // says whether profile-from-sample is good enough for bin
    // advisories (q473) and chunk planners, or whether the two-pass
    // exact path (q492) must run. Both quantile pairs come from the
    // same window machinery; the sample is a capture-flag column, not
    // a second scan.
    QueryDef.sql(
      "q556_sample_quantile_error",
      """WITH o AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS c,
        |    CASE WHEN ('0x' || substr(md5('q' || o_orderkey), 1, 6))::BIGINT % 16 = 0
        |      THEN 1 ELSE 0 END AS smp
        |  FROM orders),
        |ex AS (SELECT quantile_disc(c, 0.5) AS p50, quantile_disc(c, 0.99) AS p99
        |  FROM o),
        |sa AS (SELECT quantile_disc(c, 0.5) AS p50, quantile_disc(c, 0.99) AS p99,
        |    COUNT(*) AS ns FROM o WHERE smp = 1)
        |SELECT CAST(sa.ns AS BIGINT) AS n_sampled,
        |  CAST(ex.p50 AS BIGINT) AS exact_p50, CAST(sa.p50 AS BIGINT) AS sample_p50,
        |  CAST(ex.p99 AS BIGINT) AS exact_p99, CAST(sa.p99 AS BIGINT) AS sample_p99,
        |  CAST((1000000 * ABS(sa.p50 - ex.p50)) // ex.p50 AS BIGINT) AS p50_err_ppm,
        |  CAST((1000000 * ABS(sa.p99 - ex.p99)) // ex.p99 AS BIGINT) AS p99_err_ppm
        |FROM ex, sa""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders.select(
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("c"),
        when(expr("CAST(conv(substring(md5(concat('q', o_orderkey)), 1, 6), 16, 10)" +
          " AS BIGINT) % 16") === 0, 1L).otherwise(0L).as("smp"))
        .cache()
      def q(df: org.apache.spark.sql.DataFrame, p: Int, alias: String) = df
        .select(col("c"), row_number().over(Window.orderBy("c")).as("rn"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .where(col("rn") === expr(s"(n * $p + 99) div 100"))
        .select(col("c").as(alias))
      val smp = o.where(col("smp") === 1)
      q(o, 50, "exact_p50").crossJoin(broadcast(q(o, 99, "exact_p99")))
        .crossJoin(broadcast(q(smp, 50, "sample_p50")))
        .crossJoin(broadcast(q(smp, 99, "sample_p99")))
        .crossJoin(broadcast(smp.agg(count(lit(1)).as("n_sampled"))))
        .select(col("n_sampled"), col("exact_p50"), col("sample_p50"),
          col("exact_p99"), col("sample_p99"),
          expr("CAST((1000000 * ABS(sample_p50 - exact_p50)) div exact_p50 AS BIGINT)")
            .as("p50_err_ppm"),
          expr("CAST((1000000 * ABS(sample_p99 - exact_p99)) div exact_p99 AS BIGINT)")
            .as("p99_err_ppm"))
    },

    // Foreign-key fanout profile: the 1:N distribution (min / median /
    // p99 / max children per parent) for the two workhorse
    // relationships — the statistic that decides whether a join
    // explodes (q499 estimates SIZE from NDV; fanout quantiles expose
    // the SKEW that the average hides, feeding q86/q532's salting
    // decisions). Child counts are one grouped aggregate per
    // relationship; the order statistics use the ⌈n·q⌉ window
    // convention per relationship partition.
    QueryDef.sql(
      "q557_fanout_profile",
      """WITH f1 AS (SELECT 'customer_orders' AS rel, o_custkey AS pk, COUNT(*) AS fan
        |  FROM orders GROUP BY 2),
        |f2 AS (SELECT 'orders_lineitem', l_orderkey, COUNT(*) FROM lineitem
        |  GROUP BY 2),
        |f AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2)
        |SELECT rel, COUNT(*) AS n_parents,
        |  CAST(MIN(fan) AS BIGINT) AS min_fan,
        |  CAST(quantile_disc(fan, 0.5) AS BIGINT) AS p50_fan,
        |  CAST(quantile_disc(fan, 0.99) AS BIGINT) AS p99_fan,
        |  CAST(MAX(fan) AS BIGINT) AS max_fan
        |FROM f GROUP BY rel ORDER BY rel""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val f = t.orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("fan"))
        .select(lit("customer_orders").as("rel"), col("fan"))
        .unionAll(t.lineitem.groupBy(col("l_orderkey")).agg(count(lit(1)).as("fan"))
          .select(lit("orders_lineitem").as("rel"), col("fan")))
      val w = Window.partitionBy("rel").orderBy("fan")
      val idx = f.select(col("rel"), col("fan"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("rel")).as("n"))
      idx.groupBy("rel", "n")
        .agg(min("fan").as("min_fan"),
          min(when(col("rn") === expr("(n * 50 + 99) div 100"), col("fan")))
            .as("p50_fan"),
          min(when(col("rn") === expr("(n * 99 + 99) div 100"), col("fan")))
            .as("p99_fan"),
          max("fan").as("max_fan"))
        .select(col("rel"), col("n").as("n_parents"), col("min_fan"), col("p50_fan"),
          col("p99_fan"), col("max_fan"))
        .orderBy("rel")
    },

    // Group-commit (fsync batching) advisor: with a 10 ms fsync and
    // 50 µs per-row append, batching n commits amortizes the fsync —
    // throughput n/(T_f + n·t_r) rises toward 1/t_r while added p50
    // latency grows with the batch window — the classic WAL trade
    // priced exactly (µs-integer rationals) across a batch sweep. The
    // knee of this table is why every durable store defaults to group
    // commit. Zero data access; q514's queueing advisor prices what
    // happens when you get it wrong.
    QueryDef.sql(
      "q558_group_commit_advisor",
      """WITH b(n) AS (VALUES (1), (4), (16), (64), (256))
        |SELECT CAST(n AS BIGINT) AS batch,
        |  CAST((1000000 * CAST(n AS BIGINT)) // (10000 + n * 50) AS BIGINT)
        |    AS commits_per_sec,
        |  CAST((10000 + n * 50) // 2 AS BIGINT) AS added_p50_latency_us,
        |  CAST((1000000 * CAST(n AS BIGINT) * 50) // (10000 + n * 50) AS BIGINT)
        |    AS efficiency_ppm
        |FROM b ORDER BY batch""".stripMargin) { (s, dir) =>
      import s.implicits._
      Seq(1L, 4L, 16L, 64L, 256L).toDF("n")
        .select(col("n").as("batch"),
          expr("(1000000 * n) div (10000 + n * 50)").as("commits_per_sec"),
          expr("(10000 + n * 50) div 2").as("added_p50_latency_us"),
          expr("(1000000 * n * 50) div (10000 + n * 50)").as("efficiency_ppm"))
        .orderBy("batch")
    },

    // Optimistic-concurrency conflict estimate: for k concurrent
    // transactions drawing keys from the MEASURED customer-access
    // distribution, the expected conflicting pairs are C(k,2)·Σp² —
    // the collision mass Σp² is exactly the HHI concentration (q346)
    // of the key histogram, so skewed workloads abort quadratically
    // sooner. One grouped count for the distribution, exact ppm
    // assembly for k = 4/16/64, capped at certainty.
    QueryDef.sql(
      "q559_occ_conflict_estimate",
      """WITH a AS (SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY 1),
        |t AS (SELECT SUM(c) AS n FROM a),
        |h AS (SELECT (1000000 * SUM(CAST(c AS HUGEINT) * c)) // (t.n * t.n) AS hhi
        |  FROM a, t GROUP BY t.n),
        |k(k) AS (VALUES (4), (16), (64))
        |SELECT CAST(k.k AS BIGINT) AS concurrent_txns,
        |  CAST(h.hhi AS BIGINT) AS key_hhi_ppm,
        |  CAST(LEAST((CAST(k.k AS HUGEINT) * (k.k - 1) // 2) * h.hhi, 1000000)
        |    AS BIGINT) AS est_conflict_ppm
        |FROM k, h ORDER BY concurrent_txns""".stripMargin) { (s, dir) =>
      import s.implicits._
      val a = Tables(s, dir).orders.groupBy("o_custkey").agg(count(lit(1)).as("c"))
      val t = a.agg(sum("c").as("n"))
      val h = a.crossJoin(broadcast(t))
        .agg(expr("(1000000 * SUM(CAST(c AS DECIMAL(38,0)) * c))" +
          " div (MAX(n) * MAX(n))").as("hhi"))
      Seq(4L, 16L, 64L).toDF("k").crossJoin(broadcast(h))
        .select(col("k").as("concurrent_txns"), col("hhi").cast("long").as("key_hhi_ppm"),
          least(expr("(CAST(k AS DECIMAL(38,0)) * (k - 1) div 2) * hhi"),
            lit(1000000L).cast("decimal(38,0)")).cast("long").as("est_conflict_ppm"))
        .orderBy("concurrent_txns")
    },

    // Row-vs-column layout break-even: reading q of a table's columns
    // costs q/ncols of the bytes in a columnar layout but the FULL row
    // width in a row store — the measured per-table widths give the
    // exact projectivity threshold (in columns) above which the row
    // store wins on seek-free scans, the first-principles answer to
    // "should the hot path be Parquet or Avro". Stats ride q468's
    // one-pass byte measurements; the sweep is arithmetic.
    QueryDef.sql(
      "q560_row_col_breakeven",
      """WITH s AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(len(o_orderstatus) + len(o_orderpriority) + 8 * 4) AS BIGINT)
        |      AS row_bytes
        |  FROM orders),
        |q(q) AS (VALUES (1), (2), (3), (6)),
        |e AS (SELECT q.q, s.n, s.row_bytes,
        |    (CAST(s.row_bytes AS HUGEINT) * q.q) // 6 AS col_bytes,
        |    (CAST(s.row_bytes AS HUGEINT) * q.q) // 6 + CAST(q.q AS HUGEINT) * 65536
        |      AS col_bytes_with_seeks
        |  FROM s, q)
        |SELECT CAST(q AS BIGINT) AS cols_read, CAST(row_bytes AS BIGINT) AS row_bytes,
        |  CAST(col_bytes_with_seeks AS BIGINT) AS col_bytes,
        |  CAST(CASE WHEN col_bytes_with_seeks < row_bytes THEN 1 ELSE 0 END AS BIGINT)
        |    AS columnar_wins
        |FROM e ORDER BY cols_read""".stripMargin) { (s, dir) =>
      import s.implicits._
      val st = Tables(s, dir).orders.agg(count(lit(1)).as("n"),
        sum(length(col("o_orderstatus")) + length(col("o_orderpriority")) + lit(32))
          .cast("long").as("row_bytes"))
      Seq(1L, 2L, 3L, 6L).toDF("q").crossJoin(broadcast(st))
        .select(col("q").as("cols_read"), col("row_bytes"),
          expr("(CAST(row_bytes AS DECIMAL(38,0)) * q) div 6 + q * 65536")
            .cast("long").as("col_bytes"))
        .withColumn("columnar_wins",
          when(col("col_bytes") < col("row_bytes"), 1L).otherwise(0L))
        .orderBy("cols_read")
    },

    // Watermark-delay advisor: with per-event lateness synthesized as
    // a deterministic md5 minute offset (0-29), sweep allowed delays
    // of 0/1/5/15/30 minutes and measure the exact fraction of events
    // a streaming job would DROP at each setting — the completeness-
    // vs-latency trade every watermark config makes blind (q276
    // measures realized lag; this chooses the budget), with the
    // smallest delay meeting 99% completeness flagged as the pick.
    QueryDef.sql(
      "q561_watermark_advisor",
      """WITH e AS (SELECT event_id,
        |    ('0x' || substr(md5('w' || event_id), 1, 6))::BIGINT % 30 AS late_min
        |  FROM events),
        |d(delay) AS (VALUES (0), (1), (5), (15), (30)),
        |n AS (SELECT COUNT(*) AS tot FROM e),
        |c AS (SELECT d.delay, COUNT(*) AS kept
        |  FROM d JOIN e ON e.late_min <= d.delay GROUP BY 1),
        |r AS (SELECT c.delay, c.kept, n.tot,
        |    (1000000 * c.kept) // n.tot AS keep_ppm FROM c, n),
        |pick AS (SELECT MIN(delay) AS best FROM r WHERE keep_ppm >= 990000)
        |SELECT CAST(r.delay AS BIGINT) AS delay_min,
        |  CAST(r.kept AS BIGINT) AS kept_events,
        |  CAST(r.keep_ppm AS BIGINT) AS keep_ppm,
        |  CAST(CASE WHEN r.delay = pick.best THEN 1 ELSE 0 END AS BIGINT) AS chosen
        |FROM r, pick ORDER BY delay_min""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).events.select(
        expr("CAST(conv(substring(md5(concat('w', event_id)), 1, 6), 16, 10)" +
          " AS BIGINT) % 30").as("late_min"))
      val d = Seq(0L, 1L, 5L, 15L, 30L).toDF("delay")
      val n = e.agg(count(lit(1)).as("tot"))
      val r = d.crossJoin(e)
        .where(col("late_min") <= col("delay"))
        .groupBy("delay").agg(count(lit(1)).as("kept"))
        .crossJoin(broadcast(n))
        .select(col("delay"), col("kept"),
          expr("(1000000 * kept) div tot").as("keep_ppm"))
      val pick = r.where(col("keep_ppm") >= 990000)
        .agg(min("delay").as("best"))
      r.crossJoin(broadcast(pick))
        .select(col("delay").as("delay_min"), col("kept").as("kept_events"),
          col("keep_ppm").cast("long").as("keep_ppm"),
          when(col("delay") === col("best"), 1L).otherwise(0L).as("chosen"))
        .orderBy("delay_min")
    },

    // Monotone-counter repair: cumulative telemetry counters must
    // never decrease, but 5% of the per-nation daily order counters
    // are deterministically corrupted downward (md5-gated) — the
    // repair is one running-max window (the streaming-safe cummax
    // rule), and the census reports how many points were lifted and by
    // how much per nation. The fix is O(series) per partition and
    // idempotent — re-running repair on repaired data changes nothing,
    // which is what makes it deployable as a standing view.
    QueryDef.sql(
      "q562_counter_repair",
      """WITH d AS (SELECT c.c_nationkey AS nk, o.o_orderdate AS dt, COUNT(*) AS inc
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT nk, dt, SUM(inc) OVER (PARTITION BY nk ORDER BY dt
        |    ROWS UNBOUNDED PRECEDING) AS ctr FROM d),
        |corrupt AS (SELECT nk, dt, CASE
        |    WHEN ('0x' || substr(md5(nk || '@' || dt), 1, 4))::BIGINT % 20 = 0
        |    THEN GREATEST(ctr - 50, 0) ELSE ctr END AS raw, ctr AS clean
        |  FROM cum),
        |rep AS (SELECT nk, dt, raw,
        |    MAX(raw) OVER (PARTITION BY nk ORDER BY dt ROWS UNBOUNDED PRECEDING)
        |      AS fixed FROM corrupt)
        |SELECT CAST(nk AS BIGINT) AS nation, COUNT(*) AS n_points,
        |  CAST(SUM(CASE WHEN fixed > raw THEN 1 ELSE 0 END) AS BIGINT) AS n_lifted,
        |  CAST(SUM(fixed - raw) AS BIGINT) AS total_lift
        |FROM rep GROUP BY 1 ORDER BY nation""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val d = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"), col("o_orderdate").as("dt"))
        .agg(count(lit(1)).as("inc"))
      val w = Window.partitionBy("nk").orderBy("dt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = d.withColumn("ctr", sum("inc").over(w))
      val corrupt = cum.select(col("nk"), col("dt"),
        when(expr("CAST(conv(substring(md5(concat(nk, '@', dt)), 1, 4), 16, 10)" +
          " AS BIGINT) % 20") === 0, greatest(col("ctr") - 50, lit(0L)))
          .otherwise(col("ctr")).as("raw"))
      corrupt.withColumn("fixed", max("raw").over(w))
        .groupBy(col("nk").as("nation"))
        .agg(count(lit(1)).as("n_points"),
          sum(when(col("fixed") > col("raw"), 1L).otherwise(0L)).as("n_lifted"),
          sum(col("fixed") - col("raw")).as("total_lift"))
        .orderBy("nation")
    },

    // Dedup idempotency certification: exact dedup applied once and
    // twice to a corpus with planted duplicates must agree — the
    // operator-algebra property (dedup ∘ dedup = dedup) that lets a
    // pipeline re-run safely after partial failure, proven
    // differentially rather than assumed. Both passes are the same
    // group-by-content reduction; the certificate row carries all
    // three counts.
    QueryDef.sql(
      "q563_dedup_idempotent",
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0),
        |d1 AS (SELECT MIN(doc_id) AS keep, text FROM corpus GROUP BY text),
        |d2 AS (SELECT MIN(keep) AS keep, text FROM d1 GROUP BY text),
        |a AS (SELECT (SELECT COUNT(*) FROM corpus) AS n_input,
        |    (SELECT COUNT(*) FROM d1) AS n_once, (SELECT COUNT(*) FROM d2) AS n_twice)
        |SELECT CAST(n_input AS BIGINT) AS n_input, CAST(n_once AS BIGINT) AS n_once,
        |  CAST(n_twice AS BIGINT) AS n_twice,
        |  CAST(CASE WHEN n_once = n_twice THEN 1 ELSE 0 END AS BIGINT) AS idempotent
        |FROM a""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents.select("doc_id", "text")
      val corpus = docs.unionAll(docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val d1 = corpus.groupBy("text").agg(min("doc_id").as("keep"))
      val d2 = d1.groupBy("text").agg(min("keep").as("keep"))
      corpus.agg(count(lit(1)).as("n_input"))
        .crossJoin(broadcast(d1.agg(count(lit(1)).as("n_once"))))
        .crossJoin(broadcast(d2.agg(count(lit(1)).as("n_twice"))))
        .select(col("n_input"), col("n_once"), col("n_twice"),
          when(col("n_once") === col("n_twice"), 1L).otherwise(0L).as("idempotent"))
    },

    // Universal Scalability Law curve: throughput(p) = p/(1 + σ(p−1) +
    // κp(p−1)) at σ = 5% contention and κ = 0.1% coherency — the
    // Gunther model that explains why 32 workers don't go 32× and
    // where the RETROGRADE peak sits. Exact milli rationals over a
    // worker sweep; the peak flag marks the p beyond which adding
    // executors REDUCES throughput — the number a cluster autoscaler
    // should stop at.
    QueryDef.sql(
      "q564_usl_curve",
      """WITH p(p) AS (VALUES (1), (2), (4), (8), (16), (32), (64)),
        |u AS (SELECT p, (1000000000 * CAST(p AS BIGINT))
        |    // (1000000 + 50000 * (p - 1) + 1000 * p * (p - 1)) AS x_milli
        |  FROM p),
        |mx AS (SELECT MAX(x_milli) AS peak FROM u)
        |SELECT CAST(u.p AS BIGINT) AS workers,
        |  CAST(u.x_milli AS BIGINT) AS speedup_milli,
        |  CAST((1000 * u.x_milli) // u.p AS BIGINT) AS efficiency_ppt,
        |  CAST(CASE WHEN u.x_milli = mx.peak THEN 1 ELSE 0 END AS BIGINT) AS at_peak
        |FROM u, mx ORDER BY workers""".stripMargin) { (s, dir) =>
      import s.implicits._
      val u = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L).toDF("p")
        .select(col("p"),
          expr("(1000000000 * p) div (1000000 + 50000 * (p - 1) + 1000 * p * (p - 1))")
            .as("x_milli"))
      val mx = u.agg(max("x_milli").as("peak"))
      u.crossJoin(broadcast(mx))
        .select(col("p").as("workers"), col("x_milli").as("speedup_milli"),
          expr("(1000 * x_milli) div p").as("efficiency_ppt"),
          when(col("x_milli") === col("peak"), 1L).otherwise(0L).as("at_peak"))
        .orderBy("workers")
    },

    // Trace-sampling policy audit: head-based 10% sampling keeps a
    // blind fraction of everything; tail-based keep-if-slow (> the
    // exact p95) keeps 5% of volume but 100% of the slow traces — the
    // observability trade measured on the event stream: kept volume,
    // share of slow traces retained, and bytes-proxy cost per policy.
    // The p95 threshold is the exact ⌈0.95n⌉ order statistic; both
    // policies are capture-flag columns over one scan.
    QueryDef.sql(
      "q565_trace_sampling",
      """WITH e AS (SELECT event_id, CAST(FLOOR(value * 1000.0) AS BIGINT) AS lat
        |  FROM events),
        |n AS (SELECT COUNT(*) AS tot FROM e),
        |p95 AS (SELECT lat AS thr FROM (SELECT lat, ROW_NUMBER() OVER (ORDER BY lat)
        |    AS rn FROM e), n WHERE rn = (tot * 95 + 99) // 100),
        |f AS (SELECT e.event_id, e.lat, p95.thr,
        |    CASE WHEN ('0x' || substr(md5('t' || e.event_id), 1, 6))::BIGINT % 10 = 0
        |      THEN 1 ELSE 0 END AS head_keep,
        |    CASE WHEN e.lat > p95.thr THEN 1 ELSE 0 END AS tail_keep
        |  FROM e, p95),
        |s AS (SELECT 'head_10pct' AS policy, SUM(head_keep) AS kept,
        |    SUM(CASE WHEN lat > thr THEN head_keep ELSE 0 END) AS slow_kept,
        |    SUM(CASE WHEN lat > thr THEN 1 ELSE 0 END) AS slow_total FROM f
        |  UNION ALL SELECT 'tail_slow', SUM(tail_keep),
        |    SUM(CASE WHEN lat > thr THEN tail_keep ELSE 0 END),
        |    SUM(CASE WHEN lat > thr THEN 1 ELSE 0 END) FROM f)
        |SELECT s.policy, CAST(s.kept AS BIGINT) AS kept,
        |  CAST(1000000 * s.kept // n.tot AS BIGINT) AS kept_ppm,
        |  CAST(CASE WHEN s.slow_total = 0 THEN 0
        |    ELSE 1000000 * s.slow_kept // s.slow_total END AS BIGINT)
        |    AS slow_coverage_ppm
        |FROM s, n ORDER BY policy""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_id"), floor(col("value") * lit(1000.0)).cast("long").as("lat"))
      val n = e.agg(count(lit(1)).as("tot"))
      val p95 = e.crossJoin(broadcast(n))
        .select(col("lat"), row_number().over(Window.orderBy("lat")).as("rn"),
          col("tot"))
        .where(col("rn") === expr("(tot * 95 + 99) div 100"))
        .select(col("lat").as("thr"))
      val f = e.crossJoin(broadcast(p95))
        .select(col("lat"), col("thr"),
          when(expr("CAST(conv(substring(md5(concat('t', event_id)), 1, 6), 16, 10)" +
            " AS BIGINT) % 10") === 0, 1L).otherwise(0L).as("head_keep"),
          when(col("lat") > col("thr"), 1L).otherwise(0L).as("tail_keep"))
      def pol(name: String, keep: String) = f.agg(sum(col(keep)).as("kept"),
          sum(when(col("lat") > col("thr"), col(keep)).otherwise(0L)).as("slow_kept"),
          sum(when(col("lat") > col("thr"), 1L).otherwise(0L)).as("slow_total"))
        .select(lit(name).as("policy"), col("kept"), col("slow_kept"), col("slow_total"))
      pol("head_10pct", "head_keep").unionAll(pol("tail_slow", "tail_keep"))
        .crossJoin(broadcast(n))
        .select(col("policy"), col("kept"),
          expr("CAST(1000000 * kept div tot AS BIGINT)").as("kept_ppm"),
          when(col("slow_total") === 0, 0L)
            .otherwise(expr("1000000 * slow_kept div slow_total"))
            .as("slow_coverage_ppm"))
        .orderBy("policy")
    }
  )
}

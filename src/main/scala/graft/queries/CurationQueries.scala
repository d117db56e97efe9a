package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.Migrate

/** Corpus-curation operators (round 4, q269+): provenance canonicalization,
  * forecast backtesting, bitmap-index set algebra, and tokenizer apply — the
  * remaining data-pipeline passes a 100 TB training-data build runs between
  * ingest and training. Integer / string-exact so the DuckDB oracle checks
  * values, not tolerances.
  */
object CurationQueries {

  def all: Seq[QueryDef] = Seq(

    // URL canonicalization for provenance dedup (q92's sibling): raw crawl
    // URLs differ by host case, www prefix, utm_* tracking params, and
    // fragments while naming the same resource. Canonical form = lowercased
    // de-www'd host + path + tracking-stripped query; the groupBy shows
    // several raw forms collapsing onto one canonical key. Pure projection
    // until the final count — at 100 TB this is a map-only pass whose
    // shuffle carries one row per canonical URL, and the canonical key is
    // what every downstream provenance join/dedup partitions on. (URLs are
    // deterministically seeded — the synthetic corpus has none.)
    QueryDef.sql(
      "q269_url_canonicalize",
      """WITH raw AS (
        |  SELECT doc_id,
        |    'HTTPS://WwW.site' || (doc_id % 4)::VARCHAR || '.COM/p/' ||
        |    (doc_id % 50)::VARCHAR ||
        |    CASE doc_id % 3
        |      WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 10)::VARCHAR
        |      WHEN 1 THEN '?id=' || (doc_id % 10)::VARCHAR || '&utm_campaign=z#frag'
        |      ELSE '' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT url,
        |    regexp_replace(lower(regexp_extract(url, '^[^:]+://([^/?#]+)', 1)),
        |                   '^www\.', '') AS host,
        |    regexp_extract(url, '^[^:]+://[^/?#]+(/[^?#]*)', 1) AS path,
        |    array_to_string(list_filter(
        |      string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |      x -> x <> '' AND x NOT LIKE 'utm%'), '&') AS q
        |  FROM raw)
        |SELECT host || path || CASE WHEN q <> '' THEN '?' || q ELSE '' END
        |    AS canonical_url,
        |  COUNT(*) AS n_rows, COUNT(DISTINCT url) AS n_raw_forms
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val raw = Tables(s, dir).documents.select(
        concat(lit("HTTPS://WwW.site"), (col("doc_id") % 4).cast("string"),
          lit(".COM/p/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 3 === 0,
              concat(lit("?utm_source=feed&id="), (col("doc_id") % 10).cast("string")))
            .when(col("doc_id") % 3 === 1,
              concat(lit("?id="), (col("doc_id") % 10).cast("string"),
                lit("&utm_campaign=z#frag")))
            .otherwise(lit(""))).as("url"))
      raw
        .select(col("url"),
          regexp_replace(lower(regexp_extract(col("url"), "^[^:]+://([^/?#]+)", 1)),
            "^www\\.", "").as("host"),
          regexp_extract(col("url"), "^[^:]+://[^/?#]+(/[^?#]*)", 1).as("path"),
          expr("array_join(filter(split(regexp_extract(url, '\\\\?([^#]*)', 1), '&')," +
            " x -> x != '' AND x NOT LIKE 'utm%'), '&')").as("q"))
        .select(col("url"),
          concat(col("host"), col("path"),
            when(col("q") =!= "", concat(lit("?"), col("q"))).otherwise(lit("")))
            .as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("url")).as("n_raw_forms"))
        .orderBy("canonical_url")
    },

    // Seasonal-naive forecast backtest: forecast for a day = the observed
    // value 7 rows earlier in the daily revenue series (row-based lag —
    // sparse fixture days make "7 calendar days" undefined; both engines
    // see the identical unique-date ordering). Per month: day count, mean
    // and max absolute-percentage-error in exact ppm. The windowed lag runs
    // over the DAY-GRAIN aggregate (one row per date — a few thousand rows
    // even at 100 TB), so the unpartitioned window is deliberately cheap;
    // the fact-sized work is the map-side-combined daily rollup.
    QueryDef.sql(
      "q270_seasonal_backtest",
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |f AS (
        |  SELECT d, cents, lag(cents, 7) OVER (ORDER BY d) AS fc FROM daily),
        |a AS (
        |  SELECT strftime(d, '%Y-%m') AS month,
        |    CAST(abs(cents - fc) * 1000000 // cents AS BIGINT) AS ape_ppm
        |  FROM f WHERE fc IS NOT NULL)
        |SELECT month, COUNT(*) AS n_days,
        |  CAST(CAST(SUM(ape_ppm) AS BIGINT) // COUNT(*) AS BIGINT) AS mape_ppm,
        |  CAST(MAX(ape_ppm) AS BIGINT) AS max_ape_ppm
        |FROM a GROUP BY month ORDER BY month""".stripMargin) { (s, dir) =>
      val daily = Tables(s, dir).orders
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w = Window.orderBy("d")
      daily
        .select(col("d"), col("cents"), lag(col("cents"), 7).over(w).as("fc"))
        .where(col("fc").isNotNull)
        .select(date_format(col("d"), "yyyy-MM").as("month"),
          // decimal(38,0) numerator: the oracle's diff*10⁶ is HUGEINT-exact
          expr("CAST(abs(cents - fc) AS DECIMAL(38,0)) * 1000000 div cents")
            .cast("long").as("ape_ppm"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_days"),
          expr("sum(ape_ppm) div count(1)").as("mape_ppm"),
          max(col("ape_ppm")).as("max_ape_ppm"))
        .orderBy("month")
    },

    // Bitmap-index set algebra (roaring-style, q260's sibling): each event
    // type's user set is packed into 32-bit words — word index uid div 32,
    // bit uid mod 32 via bit_or — then AND/OR + popcount over ONE equi-join
    // on the word index computes exact intersection/union cardinalities.
    // 32-bit words keep the 1<<k shift far from the BIGINT sign bit (the
    // oracle engine refuses 1<<63). At 100 TB the bitmap is 32× smaller
    // than the user-id set it encodes and the join grain is word index —
    // the compressed-bitmap trick warehouse engines use for COUNT(DISTINCT
    // a AND b) audiences without a user-grain shuffle.
    QueryDef.sql(
      "q271_bitmap_intersect",
      """WITH u AS (
        |  SELECT DISTINCT event_type AS et, user_id AS uid FROM events
        |  WHERE event_type IN ('view', 'purchase')),
        |w AS (
        |  SELECT et, uid // 32 AS wi,
        |    bit_or(1::BIGINT << CAST(uid % 32 AS INT)) AS bm
        |  FROM u GROUP BY 1, 2),
        |v AS (SELECT wi, bm FROM w WHERE et = 'view'),
        |p AS (SELECT wi, bm FROM w WHERE et = 'purchase')
        |SELECT
        |  CAST(SUM(bit_count(coalesce(v.bm, 0) & coalesce(p.bm, 0))) AS BIGINT)
        |    AS n_both,
        |  CAST(SUM(bit_count(coalesce(v.bm, 0) | coalesce(p.bm, 0))) AS BIGINT)
        |    AS n_either,
        |  CAST(SUM(bit_count(coalesce(v.bm, 0))) AS BIGINT) AS n_view,
        |  CAST(SUM(bit_count(coalesce(p.bm, 0))) AS BIGINT) AS n_purchase
        |FROM v FULL JOIN p ON v.wi = p.wi""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events
        .where(col("event_type").isin("view", "purchase"))
        .select(col("event_type").as("et"), col("user_id").as("uid"))
        .distinct()
      val w = u.groupBy(col("et"), expr("uid div 32").as("wi"))
        .agg(expr("bit_or(shiftleft(1L, CAST(uid % 32 AS INT)))").as("bm"))
      val v = w.where(col("et") === "view").select(col("wi"), col("bm").as("vbm"))
      val p = w.where(col("et") === "purchase").select(col("wi").as("pwi"), col("bm").as("pbm"))
      v.join(p, col("wi") === col("pwi"), "full_outer")
        .agg(
          sum(expr("bit_count(coalesce(vbm, 0L) & coalesce(pbm, 0L))")).as("n_both"),
          sum(expr("bit_count(coalesce(vbm, 0L) | coalesce(pbm, 0L))")).as("n_either"),
          sum(expr("bit_count(coalesce(vbm, 0L))")).as("n_view"),
          sum(expr("bit_count(coalesce(pbm, 0L))")).as("n_purchase"))
    },

    // BPE tokenizer APPLY (q189 trains — this encodes): each distinct word
    // is exploded to space-separated characters, then a fixed ordered merge
    // ladder is applied — replace() rewrites every occurrence left-to-right
    // identically in both engines, which is exactly BPE's per-merge greedy
    // rule. Output is the encoded token string and token count per word.
    // The distinct-word grain is vocabulary-sized (not corpus-sized), so at
    // 100 TB the encode is a map-only pass over a tiny relation whose
    // result broadcasts back onto documents for corpus token counts.
    QueryDef.sql(
      "q272_bpe_encode",
      """WITH words AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents),
        |c AS (
        |  SELECT word, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS s
        |  FROM words WHERE word <> ''),
        |m AS (
        |  SELECT word,
        |    replace(replace(replace(replace(replace(replace(replace(replace(
        |      s, 't h', 'th'), 'e r', 'er'), 'i n', 'in'), 'o r', 'or'),
        |      'a t', 'at'), 'th e', 'the'), 's t', 'st'), 'o w', 'ow') AS enc
        |  FROM c)
        |SELECT word, enc, len(string_split(enc, ' ')) AS n_tokens
        |FROM m ORDER BY word""".stripMargin) { (s, dir) =>
      val merges = Seq("t h" -> "th", "e r" -> "er", "i n" -> "in", "o r" -> "or",
        "a t" -> "at", "th e" -> "the", "s t" -> "st", "o w" -> "ow")
      val words = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .where(col("word") =!= "").distinct()
      val chars = words.select(col("word"),
        trim(regexp_replace(col("word"), "(.)", "$1 ")).as("s"))
      // fold the merge ladder with the non-regex replace (exact, like the oracle)
      val encoded = merges.foldLeft(chars) { case (df, (from, to)) =>
        df.withColumn("s", expr(s"replace(s, '$from', '$to')"))
      }
      encoded
        .select(col("word"), col("s").as("enc"),
          size(split(col("s"), " ")).as("n_tokens"))
        .orderBy("word")
    },

    // Token-budget truncation audit: every doc is clipped to its first 24
    // whitespace tokens (the context-window budget) and each source pays a
    // measured token-loss rate. slice + array_join keep the clip IN-ROW —
    // a pure projection over the token array, no explode — so at 100 TB
    // the pass is map-only and the shuffle carries one row per source.
    QueryDef.sql(
      "q273_token_budget_truncate",
      """WITH d AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(ws)) AS BIGINT) AS total_tokens,
        |  CAST(SUM(LEAST(len(ws), 24)) AS BIGINT) AS kept_tokens,
        |  CAST(SUM(CASE WHEN len(ws) > 24 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_truncated,
        |  CAST(SUM(len(array_to_string(ws[1:24], ' '))) AS BIGINT) AS kept_chars,
        |  CAST(SUM(GREATEST(len(ws) - 24, 0)) * 1000000 // SUM(len(ws)) AS BIGINT)
        |    AS loss_ppm
        |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .select(col("source"), split(col("text"), " ").as("ws"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("ws"))).as("total_tokens"),
          sum(least(size(col("ws")), lit(24))).as("kept_tokens"),
          sum(when(size(col("ws")) > 24, 1L).otherwise(0L)).as("n_truncated"),
          sum(length(array_join(slice(col("ws"), 1, 24), " "))).as("kept_chars"),
          expr("sum(greatest(size(ws) - 24, 0)) * 1000000 div sum(size(ws))")
            .as("loss_ppm"))
        .orderBy("source")
    },

    // Mergeable quantile-sample audit (the distributed-sketch contract):
    // each of 4 hash shards contributes every 50th order statistic of its
    // locally-sorted run (the mergeable summary — shard-grain work, sample-
    // sized output), the merged samples estimate the global median, and the
    // exact median over all rows is computed alongside as audit truth. The
    // (cents, event_id) total order makes every pick deterministic. At
    // 100 TB only the audit side ranks the full data; production keeps the
    // per-shard sampling whose merged summary is ~n/50 rows.
    QueryDef.sql(
      "q274_quantile_merge_audit",
      """WITH e AS (
        |  SELECT event_type, event_id, user_id % 4 AS shard,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, shard
        |      ORDER BY cents, event_id) AS rn
        |  FROM e),
        |smp AS (SELECT event_type, event_id, cents FROM r WHERE rn % 50 = 0),
        |sr AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS k,
        |    COUNT(*) OVER (PARTITION BY event_type) AS ns
        |  FROM smp),
        |est AS (SELECT event_type, ns, cents AS est_p50 FROM sr
        |        WHERE k = CAST(CEIL(ns * 0.5) AS BIGINT)),
        |xr AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS k,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |ex AS (SELECT event_type, cents AS exact_p50 FROM xr
        |       WHERE k = CAST(CEIL(n * 0.5) AS BIGINT))
        |SELECT est.event_type, CAST(ns AS BIGINT) AS n_samples, est_p50, exact_p50,
        |  abs(est_p50 - exact_p50) AS abs_err
        |FROM est JOIN ex ON est.event_type = ex.event_type
        |ORDER BY est.event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events.select(col("event_type"), col("event_id"),
        (col("user_id") % 4).as("shard"),
        floor(col("value") * 100).cast("long").as("cents"))
      val wShard = Window.partitionBy("event_type", "shard").orderBy("cents", "event_id")
      val smp = e.withColumn("rn", row_number().over(wShard)).where(col("rn") % 50 === 0)
      val wType = Window.partitionBy("event_type").orderBy("cents", "event_id")
      val cType = Window.partitionBy("event_type")
      val est = smp
        .select(col("event_type"), col("cents"),
          row_number().over(wType).as("k"), count(lit(1)).over(cType).as("ns"))
        .where(col("k") === ceil(col("ns") * 0.5).cast("long"))
        .select(col("event_type"), col("ns").as("n_samples"), col("cents").as("est_p50"))
      val ex = e
        .select(col("event_type"), col("cents"),
          row_number().over(wType).as("k"), count(lit(1)).over(cType).as("n"))
        .where(col("k") === ceil(col("n") * 0.5).cast("long"))
        .select(col("event_type").as("et2"), col("cents").as("exact_p50"))
      est.join(ex, col("event_type") === col("et2"))
        .select(col("event_type"), col("n_samples"), col("est_p50"), col("exact_p50"),
          abs(col("est_p50") - col("exact_p50")).as("abs_err"))
        .orderBy("event_type")
    },

    // Recency-weighted mixing: each event's sampling weight halves per week
    // of age (weight_ppm = 10⁶ >> age_weeks — exact bit-shift halving, no
    // floats), rolled up per event type into effective sample size and
    // cross-type allocation shares. The weighting collapses to week-bucket
    // grain BEFORE the weighted rollup, so the shuffle carries (type, week)
    // counts, never event rows — the freshness-decay pass a continually
    // refreshed 100 TB corpus reweighs on every training-mix rebuild.
    QueryDef.sql(
      "q275_recency_weights",
      """WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS md FROM events),
        |a AS (
        |  SELECT event_type,
        |    CAST(datediff('day', CAST(ts AS DATE), md) AS BIGINT) // 7 AS wk,
        |    COUNT(*) AS n
        |  FROM events, mx GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type,
        |    CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(SUM(n * (1000000 >> CAST(wk AS INT))) AS BIGINT) AS weighted_ppm
        |  FROM a GROUP BY 1),
        |g AS (SELECT SUM(weighted_ppm) AS tot FROM t)
        |SELECT event_type, n_events, weighted_ppm,
        |  CAST(weighted_ppm // 1000000 AS BIGINT) AS effective_n,
        |  CAST(weighted_ppm * 1000000 // tot AS BIGINT) AS share_ppm
        |FROM t, g ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val mx = ev.agg(max(to_date(col("ts"))).as("md"))
      val a = ev.crossJoin(broadcast(mx))
        .groupBy(col("event_type"),
          expr("CAST(datediff(md, CAST(ts AS DATE)) AS BIGINT) div 7").as("wk"))
        .agg(count(lit(1)).as("n"))
      val t = a.groupBy("event_type")
        .agg(sum(col("n")).as("n_events"),
          sum(expr("n * shiftright(1000000, CAST(wk AS INT))")).as("weighted_ppm"))
      val g = t.agg(sum(col("weighted_ppm")).as("tot"))
      t.crossJoin(broadcast(g))
        .select(col("event_type"), col("n_events"), col("weighted_ppm"),
          expr("weighted_ppm div 1000000").as("effective_n"),
          // decimal(38,0) numerator: oracle's ×10⁶ product is HUGEINT-exact
          expr("CAST(weighted_ppm AS DECIMAL(38,0)) * 1000000 div tot")
            .cast("long").as("share_ppm"))
        .orderBy("event_type")
    },

    // Low-watermark lag profile (the reference's resolvedTs semantics,
    // SURVEY §2.9 ST3/ST7): consumers partitioned by user hash each hold a
    // high-water mark; the GLOBAL checkpoint is the minimum of the per-
    // partition maxima (every commit ≤ it is complete — an exact watermark,
    // not a heuristic), and each partition reports how far ahead it runs.
    // One fact-grain max per partition, then an 8-row broadcast — the lag
    // board a 1000-partition CDC pipeline renders per flush.
    QueryDef.sql(
      "q276_watermark_lag",
      """WITH p AS (
        |  SELECT user_id % 8 AS pt, MAX(epoch_us(ts)) AS mx_us, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |g AS (SELECT MIN(mx_us) AS wm_us FROM p)
        |SELECT CAST(pt AS BIGINT) AS pt, CAST(n AS BIGINT) AS n_events,
        |  CAST(mx_us - wm_us AS BIGINT) AS ahead_us,
        |  CASE WHEN mx_us = wm_us THEN 1 ELSE 0 END AS is_watermark_holder
        |FROM p, g ORDER BY pt""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir).events
        .groupBy((col("user_id") % 8).as("pt"))
        .agg(max(unix_micros(col("ts"))).as("mx_us"), count(lit(1)).as("n_events"))
      val g = p.agg(min(col("mx_us")).as("wm_us"))
      p.crossJoin(broadcast(g))
        .select(col("pt"), col("n_events"),
          (col("mx_us") - col("wm_us")).as("ahead_us"),
          when(col("mx_us") === col("wm_us"), 1).otherwise(0).as("is_watermark_holder"))
        .orderBy("pt")
    },

    // Near-zero-variance feature screen: per embedding dimension, exact
    // population variance from micro-scaled integer power sums
    // (n·Σx² − (Σx)², all DECIMAL(38,0)/HUGEINT — a Long n·Σx² would wrap
    // at ~40k vectors). Dead dims (variance under (0.1)² in micro² units)
    // are dropped before training. Means route through DOUBLE+FLOOR: Σx
    // can be negative and DuckDB's // floors while Spark's div truncates.
    // One dim-grain aggregation — 64 output rows at any corpus size.
    QueryDef.sql(
      "q277_dim_variance_screen",
      """WITH ev AS (
        |  SELECT vec_id, i,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |a AS (
        |  SELECT i, COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2
        |  FROM ev GROUP BY i)
        |SELECT i, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(CAST(s1 AS DOUBLE) / n) AS BIGINT) AS mean_micro,
        |  CAST((n * s2 - s1 * s1) // (n * n) AS BIGINT) AS var_micro2,
        |  CASE WHEN (n * s2 - s1 * s1) // (n * n) < 10000000000 THEN 1 ELSE 0 END
        |    AS low_var
        |FROM a ORDER BY i""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val ev = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "e")))
        .select((col("p") + 1).as("i"),
          floor(col("e").cast("double") * 1000000.0).cast("long").as("x"))
      ev.groupBy("i")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum((col("x") * col("x")).cast(dec)).as("s2"))
        .select(col("i"), col("n"),
          floor(col("s1").cast("double") / col("n")).cast("long").as("mean_micro"),
          expr(s"CAST((CAST(n AS $dec) * s2 - CAST(s1 AS $dec) * CAST(s1 AS $dec))" +
            s" div (n * n) AS BIGINT)").as("var_micro2"),
          expr(s"CASE WHEN CAST((CAST(n AS $dec) * s2 - CAST(s1 AS $dec) * CAST(s1 AS $dec))" +
            s" div (n * n) AS BIGINT) < 10000000000L THEN 1 ELSE 0 END").as("low_var"))
        .orderBy("i")
    },

    // Delta/varint encoding advisor (q234/q222's sibling): within each
    // month partition, sorted unique order keys are gap-encoded and priced
    // at LEB128 varint widths against the 8-byte plain layout. The LAG
    // window is PARTITIONED by month — every partition's run is
    // independent, so the pass parallelizes by partition at 100 TB exactly
    // like the per-rowgroup key encoder it prices.
    QueryDef.sql(
      "q278_delta_encoding",
      """WITH k AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS pt, o_orderkey AS key,
        |    o_orderkey - lag(o_orderkey) OVER (
        |      PARTITION BY strftime(o_orderdate, '%Y-%m') ORDER BY o_orderkey) AS delta
        |  FROM orders),
        |b AS (
        |  SELECT pt,
        |    CASE WHEN delta IS NULL THEN 8
        |         WHEN delta < 128 THEN 1
        |         WHEN delta < 16384 THEN 2
        |         WHEN delta < 2097152 THEN 3
        |         WHEN delta < 268435456 THEN 4
        |         ELSE 8 END AS vb
        |  FROM k)
        |SELECT pt, COUNT(*) AS n_keys,
        |  CAST(COUNT(*) * 8 AS BIGINT) AS plain_bytes,
        |  CAST(SUM(vb) AS BIGINT) AS varint_bytes,
        |  CAST(SUM(vb) * 1000000 // (COUNT(*) * 8) AS BIGINT) AS ratio_ppm
        |FROM b GROUP BY pt ORDER BY pt""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("pt").orderBy("key")
      Tables(s, dir).orders
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("pt"),
          col("o_orderkey").as("key"))
        .withColumn("delta", col("key") - lag(col("key"), 1).over(w))
        .select(col("pt"),
          when(col("delta").isNull, 8L)
            .when(col("delta") < 128, 1L)
            .when(col("delta") < 16384, 2L)
            .when(col("delta") < 2097152, 3L)
            .when(col("delta") < 268435456, 4L)
            .otherwise(8L).as("vb"))
        .groupBy("pt")
        .agg(count(lit(1)).as("n_keys"),
          (count(lit(1)) * 8).as("plain_bytes"),
          sum(col("vb")).as("varint_bytes"),
          expr("sum(vb) * 1000000 div (count(1) * 8)").as("ratio_ppm"))
        .orderBy("pt")
    },

    // Late-data reprocessing cost: consumers (user-hash partitions) see
    // events in a deterministic scrambled arrival order (event_id % 7 —
    // q228's shape); an event arriving over 1h behind its partition's
    // high-water mark is LATE, and every (day, event_type) partition a
    // late event lands in must be recomputed. The one-row answer prices
    // incremental vs full recompute: affected partitions over total. The
    // running max parallelizes per consumer partition; the distinct-
    // partition counts are partition-grain, not event-grain, at 100 TB.
    QueryDef.sql(
      "q279_late_reprocess",
      """WITH a AS (
        |  SELECT epoch_us(ts) AS us,
        |    strftime(CAST(ts AS DATE), '%Y-%m-%d') || '|' || event_type AS part,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id % 8
        |      ORDER BY event_id % 7, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hw
        |  FROM events),
        |l AS (SELECT part, CASE WHEN us + 3600000000 < hw THEN 1 ELSE 0 END AS late
        |      FROM a)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(late) AS BIGINT) AS n_late,
        |  CAST(SUM(late) * 1000000 // COUNT(*) AS BIGINT) AS late_ppm,
        |  CAST(COUNT(DISTINCT CASE WHEN late = 1 THEN part END) AS BIGINT)
        |    AS affected_parts,
        |  CAST(COUNT(DISTINCT part) AS BIGINT) AS total_parts,
        |  CAST(COUNT(DISTINCT CASE WHEN late = 1 THEN part END) * 1000000
        |    // COUNT(DISTINCT part) AS BIGINT) AS reprocess_ppm
        |FROM l""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id") % 8)
        .orderBy(col("event_id") % 7, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .select(unix_micros(col("ts")).as("us"),
          concat(date_format(col("ts"), "yyyy-MM-dd"), lit("|"), col("event_type"))
            .as("part"),
          max(unix_micros(col("ts"))).over(w).as("hw"))
        .select(col("part"),
          when(col("us") + 3600000000L < col("hw"), 1L).otherwise(0L).as("late"))
        .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"),
          expr("sum(late) * 1000000 div count(1)").as("late_ppm"),
          countDistinct(when(col("late") === 1, col("part"))).as("affected_parts"),
          countDistinct(col("part")).as("total_parts"),
          expr("count(DISTINCT CASE WHEN late = 1 THEN part END) * 1000000" +
            " div count(DISTINCT part)").as("reprocess_ppm"))
    },

    // Run-length encoding advisor (q234's dict advisor extended to RLE):
    // low-NDV lineitem columns are priced in physical row order within
    // 8192-key rowgroups — runs counted by LAG inside each (column,
    // rowgroup) window, then RLE (runs × (maxlen+4)) vs dictionary
    // (1-byte codes + dict pages) vs plain bytes, cheapest wins. Runs are
    // counted per rowgroup exactly like the columnar writer that makes
    // this decision, so every window partition is rowgroup-sized and the
    // pass scales with file count, not a global sort.
    QueryDef.sql(
      "q280_rle_advisor",
      """WITH base AS (
        |  SELECT l_orderkey // 8192 AS rg, l_orderkey, l_linenumber,
        |    l_returnflag, l_linestatus
        |  FROM lineitem),
        |u AS (
        |  SELECT rg, l_orderkey, l_linenumber, 'l_returnflag' AS colname,
        |    l_returnflag AS v FROM base
        |  UNION ALL
        |  SELECT rg, l_orderkey, l_linenumber, 'l_linestatus', l_linestatus FROM base),
        |r AS (
        |  SELECT colname, v,
        |    CASE WHEN lag(v) OVER (PARTITION BY colname, rg
        |        ORDER BY l_orderkey, l_linenumber, v) IS NULL
        |      OR lag(v) OVER (PARTITION BY colname, rg
        |        ORDER BY l_orderkey, l_linenumber, v) <> v
        |      THEN 1 ELSE 0 END AS brk
        |  FROM u),
        |s AS (
        |  SELECT colname, COUNT(*) AS n_rows, CAST(SUM(brk) AS BIGINT) AS n_runs,
        |    COUNT(DISTINCT v) AS ndv, MAX(len(v)) AS maxlen,
        |    CAST(SUM(len(v)) AS BIGINT) AS plain_bytes
        |  FROM r GROUP BY colname)
        |SELECT colname, CAST(n_rows AS BIGINT) AS n_rows, n_runs,
        |  CAST(ndv AS BIGINT) AS ndv, plain_bytes,
        |  CAST(n_runs * (maxlen + 4) AS BIGINT) AS rle_bytes,
        |  CAST(n_rows + ndv * maxlen AS BIGINT) AS dict_bytes,
        |  CASE
        |    WHEN n_runs * (maxlen + 4) <= n_rows + ndv * maxlen
        |     AND n_runs * (maxlen + 4) <= plain_bytes THEN 'rle'
        |    WHEN n_rows + ndv * maxlen <= plain_bytes THEN 'dict'
        |    ELSE 'plain' END AS advice
        |FROM s ORDER BY colname""".stripMargin) { (s, dir) =>
      val base = Tables(s, dir).lineitem
        .select(expr("l_orderkey div 8192").as("rg"), col("l_orderkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_linestatus"))
      val u = base.select(col("rg"), col("l_orderkey"), col("l_linenumber"),
          lit("l_returnflag").as("colname"), col("l_returnflag").as("v"))
        .unionAll(base.select(col("rg"), col("l_orderkey"), col("l_linenumber"),
          lit("l_linestatus").as("colname"), col("l_linestatus").as("v")))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (q238's
      // finding) — v itself breaks the tie so the run structure is a total
      // order both engines agree on
      val w = Window.partitionBy("colname", "rg")
        .orderBy("l_orderkey", "l_linenumber", "v")
      val r = u.select(col("colname"), col("v"),
        when(lag(col("v"), 1).over(w).isNull || lag(col("v"), 1).over(w) =!= col("v"), 1L)
          .otherwise(0L).as("brk"))
      r.groupBy("colname")
        .agg(count(lit(1)).as("n_rows"), sum(col("brk")).as("n_runs"),
          countDistinct(col("v")).as("ndv"), max(length(col("v"))).as("maxlen"),
          sum(length(col("v"))).as("plain_bytes"))
        .select(col("colname"), col("n_rows"), col("n_runs"), col("ndv"),
          col("plain_bytes"),
          (col("n_runs") * (col("maxlen") + 4)).as("rle_bytes"),
          (col("n_rows") + col("ndv") * col("maxlen")).as("dict_bytes"),
          when((col("n_runs") * (col("maxlen") + 4) <= col("n_rows") + col("ndv") * col("maxlen")) &&
               (col("n_runs") * (col("maxlen") + 4) <= col("plain_bytes")), "rle")
            .when(col("n_rows") + col("ndv") * col("maxlen") <= col("plain_bytes"), "dict")
            .otherwise("plain").as("advice"))
        .orderBy("colname")
    },

    // Bigram-novelty screen (q94 scores SEEN bigrams — this counts UNSEEN
    // ones): the top-500 train-split bigrams (deterministic count-desc,
    // bigram-asc tie-break) form the reference LM; each held-out doc
    // reports what fraction of its bigrams fall outside it. High novelty =
    // out-of-domain or garbled text; near-zero = template duplication. The
    // LM is top-k-sized, so at 100 TB it broadcasts and the held-out pass
    // is one map-side join — no corpus-sized shuffle.
    QueryDef.sql(
      "q281_lm_novelty",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bgl AS (SELECT doc_id,
        |    unnest([tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk) - 1)])
        |      AS bigram
        |  FROM t),
        |lm AS (SELECT bigram FROM bgl WHERE doc_id % 25 <> 7
        |       GROUP BY bigram ORDER BY COUNT(*) DESC, bigram LIMIT 500),
        |hold AS (SELECT doc_id, bigram FROM bgl WHERE doc_id % 25 = 7),
        |j AS (SELECT h.doc_id,
        |        CASE WHEN lm.bigram IS NULL THEN 1 ELSE 0 END AS unseen
        |      FROM hold h LEFT JOIN lm ON h.bigram = lm.bigram)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(unseen) AS BIGINT) AS n_unseen,
        |  CAST(SUM(unseen) * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      val bgl = t.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(tk[i-1], ' ', tk[i]))"))
        .as("bigram"))
      val lm = bgl.where(col("doc_id") % 25 =!= 7)
        .groupBy("bigram").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("bigram").asc).limit(500)
        .select(col("bigram").as("lm_bigram"))
      bgl.where(col("doc_id") % 25 === 7)
        .join(broadcast(lm), col("bigram") === col("lm_bigram"), "left_outer")
        .select(col("doc_id"),
          when(col("lm_bigram").isNull, 1L).otherwise(0L).as("unseen"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("unseen")).as("n_unseen"),
          expr("sum(unseen) * 1000000 div count(1)").as("novelty_ppm"))
        .orderBy("doc_id")
    },

    // Z-order vs row-major clustering audit (q250 priced zone maps — this
    // computes REAL Morton codes): 6-bit (x, y) keys are bit-interleaved
    // with the classic spread-mask ladder (pure integer & | << arithmetic,
    // masks written in decimal — 3855 = 0x0F0F etc.), rows are bucketed by
    // 64-cell Z blocks vs 64-cell row-major strips, and each layout is
    // priced by the locality currency that actually matters for 2-D data
    // skipping: how many bucket bounding boxes an 8×8 probe square must
    // touch, summed over a 4×4 probe grid. (Summed bbox AREA is a false
    // currency — 1×64 row-major strips and 8×8 Z blocks tie on area; the
    // probe count is where Z's squareness wins.) Map-only projection, one
    // bucket-grain rollup per layout, then a 49-probe broadcast join
    // against bucket-grain stats — at 100 TB this is the cheap pre-flight
    // before rewriting a table Z-ordered.
    QueryDef.sql(
      "q282_zorder_cluster",
      """WITH pts AS (
        |  SELECT user_id % 64 AS x, CAST(FLOOR(value) AS BIGINT) % 64 AS y
        |  FROM events),
        |sp AS (
        |  SELECT x, y,
        |    ((x * 16 + x) & 3855) AS x1, ((y * 16 + y) & 3855) AS y1
        |  FROM pts),
        |sp2 AS (
        |  SELECT x, y,
        |    ((x1 * 4 + x1) & 13107) AS x2, ((y1 * 4 + y1) & 13107) AS y2
        |  FROM sp),
        |z AS (
        |  SELECT x, y,
        |    (((x2 * 2 + x2) & 21845) + 2 * ((y2 * 2 + y2) & 21845)) AS zval,
        |    (x * 64 + y) AS rmval
        |  FROM sp2),
        |b AS (
        |  SELECT 'a_zorder' AS layout, zval // 64 AS bucket, x, y FROM z
        |  UNION ALL
        |  SELECT 'b_rowmajor', rmval // 64, x, y FROM z),
        |per AS (
        |  SELECT layout, bucket, COUNT(*) AS n,
        |    MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
        |  FROM b GROUP BY 1, 2),
        |probes AS (
        |  SELECT 16 * i.i + 4 AS px, 16 * j.j + 4 AS py
        |  FROM generate_series(0, 3) i(i), generate_series(0, 3) j(j)),
        |touch AS (
        |  SELECT p.layout, COUNT(*) AS t
        |  FROM per p JOIN probes pr
        |    ON p.x1 >= pr.px AND p.x0 <= pr.px + 7
        |   AND p.y1 >= pr.py AND p.y0 <= pr.py + 7
        |  GROUP BY 1),
        |agg AS (
        |  SELECT layout, COUNT(*) AS n_buckets, SUM(n) AS n_rows
        |  FROM per GROUP BY 1)
        |SELECT a.layout, CAST(a.n_buckets AS BIGINT) AS n_buckets,
        |  CAST(a.n_rows AS BIGINT) AS n_rows,
        |  CAST(touch.t AS BIGINT) AS touched_buckets
        |FROM agg a JOIN touch ON a.layout = touch.layout
        |ORDER BY a.layout""".stripMargin) { (s, dir) =>
      val pts = Tables(s, dir).events
        .select((col("user_id") % 64).as("x"),
          (floor(col("value")).cast("long") % 64).as("y"))
      // spread-mask ladder: v|v<<k written as v*2^k + v (identical bits for
      // disjoint masks), & with decimal mask constants
      val z = pts
        .withColumn("x1", expr("(x * 16 + x) & 3855"))
        .withColumn("y1", expr("(y * 16 + y) & 3855"))
        .withColumn("x2", expr("(x1 * 4 + x1) & 13107"))
        .withColumn("y2", expr("(y1 * 4 + y1) & 13107"))
        .withColumn("zval", expr("((x2 * 2 + x2) & 21845) + 2 * ((y2 * 2 + y2) & 21845)"))
        .withColumn("rmval", expr("x * 64 + y"))
      val b = z.select(lit("a_zorder").as("layout"), expr("zval div 64").as("bucket"),
          col("x"), col("y"))
        .unionAll(z.select(lit("b_rowmajor").as("layout"), expr("rmval div 64").as("bucket"),
          col("x"), col("y")))
      val per = b.groupBy("layout", "bucket")
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("bx0"), max(col("x")).as("bx1"),
          min(col("y")).as("by0"), max(col("y")).as("by1"))
      val probes = s.range(0, 4).select(col("id").as("i"))
        .crossJoin(s.range(0, 4).select(col("id").as("j")))
        .select((col("i") * 16 + 4).as("px"), (col("j") * 16 + 4).as("py"))
      val touched = per.join(broadcast(probes),
          col("bx1") >= col("px") && col("bx0") <= col("px") + 7 &&
          col("by1") >= col("py") && col("by0") <= col("py") + 7)
        .groupBy(col("layout").as("tl"))
        .agg(count(lit(1)).as("touched_buckets"))
      per.groupBy("layout")
        .agg(countDistinct(col("bucket")).as("n_buckets"), sum(col("n")).as("n_rows"))
        .join(touched, col("layout") === col("tl"))
        .select(col("layout"), col("n_buckets"), col("n_rows"), col("touched_buckets"))
        .orderBy("layout")
    },

    // Content-defined chunking (rsync/FastCDC's trick, the blob-dedup
    // primitive): a boundary lands wherever the rolling 8-char polynomial
    // hash ≡ 0 mod 64, so chunk edges survive insertions — unlike fixed
    // strides (q266). The window hash and boundary count run IN-ROW as
    // nested higher-order functions (no explode — ~8·L integer ops per
    // doc inside codegen), and the rollup is source-grain. At 100 TB
    // chunk fingerprints feed the exact-dedup pass at chunk, not blob,
    // granularity.
    QueryDef.sql(
      "q283_cdc_chunk",
      """WITH d AS (
        |  SELECT source, text AS t, len(text) AS l FROM documents),
        |b AS (
        |  SELECT source, l,
        |    len(list_filter(generate_series(8, l), i ->
        |      list_reduce(list_transform(generate_series(i - 7, i),
        |        k -> CAST(ascii(substr(t, CAST(k AS INT), 1)) AS BIGINT)),
        |        (a, c) -> a * 31 + c) % 64 = 0)) AS n_bound
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(l) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_bound) + COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(l) // (SUM(n_bound) + COUNT(*)) AS BIGINT) AS avg_chunk_len,
        |  CAST(MAX(n_bound) AS BIGINT) AS max_bounds
        |FROM b GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .select(col("source"), col("text").as("t"), length(col("text")).as("l"))
        .select(col("source"), col("l"),
          expr("size(filter(sequence(8, l), i -> " +
            "aggregate(sequence(i - 7, i), 0L, (a, k) -> " +
            "a * 31 + ascii(substring(t, k, 1))) % 64 = 0))").as("n_bound"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("l")).as("total_chars"),
          (sum(col("n_bound")) + count(lit(1))).as("n_chunks"),
          expr("sum(l) div (sum(n_bound) + count(1))").as("avg_chunk_len"),
          max(col("n_bound")).as("max_bounds"))
        .orderBy("source")
    },

    // 2-hop neighborhood size (graph feature engineering over q201's
    // co-purchase edges): per node, the count of distinct nodes exactly
    // two hops away — one edge self-join on the middle node, a distinct,
    // and an anti-join removing direct neighbors — then a degree-style
    // histogram. The intermediate is frontier-sized (edges × avg degree),
    // the same cost envelope as q159's triangle count; no |V|² blowup at
    // 100 TB because every step stays keyed on node ids.
    QueryDef.sql(
      "q284_twohop_features",
      """WITH e0 AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |h2 AS (
        |  SELECT DISTINCT e1.u AS u, e2.v AS w
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  WHERE e2.v <> e1.u),
        |h2x AS (
        |  SELECT h2.u, h2.w FROM h2
        |  LEFT JOIN e ON e.u = h2.u AND e.v = h2.w
        |  WHERE e.u IS NULL),
        |c AS (SELECT u, COUNT(*) AS n2 FROM h2x GROUP BY u)
        |SELECT CAST(n2 // 10 AS BIGINT) AS bucket, COUNT(*) AS n_nodes,
        |  CAST(MIN(n2) AS BIGINT) AS min_n2, CAST(MAX(n2) AS BIGINT) AS max_n2
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir).lineitem.select("l_orderkey", "l_partkey")
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("v"))
      val e0 = a.join(b, col("l_orderkey") === col("ok2") && col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("m")).where(col("m") >= 2)
        .select("u", "v")
      val e = e0.union(e0.select(col("v").as("u"), col("u").as("v"))).distinct()
      val h2 = e.select(col("u"), col("v").as("mid"))
        .join(e.select(col("u").as("mid2"), col("v").as("w")), col("mid") === col("mid2"))
        .where(col("w") =!= col("u"))
        .select("u", "w").distinct()
      val h2x = h2.join(e.select(col("u").as("eu"), col("v").as("ev")),
          col("u") === col("eu") && col("w") === col("ev"), "left_anti")
      h2x.groupBy("u").agg(count(lit(1)).as("n2"))
        .groupBy(expr("n2 div 10").as("bucket"))
        .agg(count(lit(1)).as("n_nodes"), min(col("n2")).as("min_n2"),
          max(col("n2")).as("max_n2"))
        .orderBy("bucket")
    },

    // Importance-weight effective sample size: token counts as importance
    // weights, ESS = (Σw)² / Σw² per language (Kish's formula, exact via
    // DECIMAL(38,0)/HUGEINT squares — Σw² wraps Long first at corpus
    // scale). ESS ≪ n flags a language whose mixture is dominated by a few
    // heavy docs — the diagnostic run before q162's temperature mixing.
    // One map-side-combined aggregation, language-grain output.
    QueryDef.sql(
      "q285_importance_ess",
      """WITH d AS (SELECT lang, len(string_split(text, ' ')) AS w FROM documents),
        |a AS (SELECT lang, COUNT(*) AS n, SUM(w) AS s1, SUM(w * w) AS s2
        |      FROM d GROUP BY 1)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs,
        |  CAST(s1 AS BIGINT) AS total_tokens,
        |  CAST((s1 * s1) // s2 AS BIGINT) AS ess,
        |  CAST((s1 * s1) * 1000000 // (s2 * n) AS BIGINT) AS ess_ratio_ppm
        |FROM a ORDER BY lang""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      Tables(s, dir).documents
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("w"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("w")).as("s1"),
          sum((col("w") * col("w"))).as("s2"))
        .select(col("lang"), col("n").as("n_docs"), col("s1").as("total_tokens"),
          expr(s"CAST(CAST(s1 AS $dec) * CAST(s1 AS $dec) div s2 AS BIGINT)").as("ess"),
          expr(s"CAST(CAST(s1 AS $dec) * CAST(s1 AS $dec) * 1000000" +
            s" div (CAST(s2 AS $dec) * n) AS BIGINT)").as("ess_ratio_ppm"))
        .orderBy("lang")
    },

    // Shard rebalancing plan (consistent-hash maintenance): per-shard row
    // counts vs the balanced target (floor + remainder-to-low-shards
    // rule), and the minimum-transfer flow between ADJACENT shards = the
    // running prefix of surpluses (the classic transshipment identity).
    // The windowed prefix runs over 16 shard rows — the fact-sized work
    // is one map-side-combined count, so the plan costs one scan at any
    // scale and the output is the mover's worklist.
    QueryDef.sql(
      "q286_shard_rebalance",
      """WITH s0 AS (SELECT user_id % 16 AS shard, COUNT(*) AS n
        |            FROM events GROUP BY 1),
        |s AS (
        |  SELECT g.i AS shard, COALESCE(s0.n, 0) AS n
        |  FROM generate_series(0, 15) g(i) LEFT JOIN s0 ON s0.shard = g.i),
        |t AS (SELECT SUM(n) AS tot FROM s),
        |a AS (SELECT shard, n,
        |        tot // 16 + CASE WHEN shard < tot % 16 THEN 1 ELSE 0 END AS target
        |      FROM s, t),
        |b AS (SELECT shard, n, target, n - target AS surplus,
        |        SUM(n - target) OVER (ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM a)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(n AS BIGINT) AS n_rows,
        |  CAST(target AS BIGINT) AS target, CAST(surplus AS BIGINT) AS surplus,
        |  CAST(cum AS BIGINT) AS flow_right, CAST(abs(cum) AS BIGINT) AS moved
        |FROM b ORDER BY shard""".stripMargin) { (s, dir) =>
      // seed all 16 shards: an empty shard still needs its target row in
      // the mover's worklist (sf0.001 proved one can be empty)
      val sh0 = Tables(s, dir).events
        .groupBy((col("user_id") % 16).as("shard0")).agg(count(lit(1)).as("n0"))
      val sh = s.range(16).select(col("id").as("shard"))
        .join(broadcast(sh0), col("shard") === col("shard0"), "left_outer")
        .select(col("shard"), coalesce(col("n0"), lit(0L)).as("n"))
      val t = sh.agg(sum(col("n")).as("tot"))
      val w = Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sh.crossJoin(broadcast(t))
        .select(col("shard"), col("n"),
          (expr("tot div 16") +
            when(col("shard") < col("tot") % 16, 1L).otherwise(0L)).as("target"))
        .withColumn("surplus", col("n") - col("target"))
        .withColumn("cum", sum(col("surplus")).over(w))
        .select(col("shard"), col("n").as("n_rows"), col("target"), col("surplus"),
          col("cum").as("flow_right"), abs(col("cum")).as("moved"))
        .orderBy("shard")
    },

    // String-format inference (the reference's data-scan NUMBER classifier
    // — SURVEY §2.4 A5 — in its string-column flavor): five rendered
    // columns vote each value into date / int / decimal / text via a regex
    // ladder, and the per-column majority (count-desc, class-asc
    // tie-break) is the inferred type — including a deliberately mixed
    // column whose verdict must not be fooled. One unpivoted scan,
    // column-grain output; the regexes are codegen'd Java patterns.
    QueryDef.sql(
      "q287_format_inference",
      """WITH vals AS (
        |  SELECT 'c1_date' AS colname, strftime(o_orderdate, '%Y-%m-%d') AS v FROM orders
        |  UNION ALL SELECT 'c2_int', CAST(o_orderkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'c3_dec',
        |    CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '.'
        |    || CAST(o_orderkey % 10 AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'c4_text', o_orderpriority FROM orders
        |  UNION ALL SELECT 'c5_mixed',
        |    CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey AS VARCHAR)
        |         ELSE o_orderpriority END FROM orders),
        |cl AS (
        |  SELECT colname,
        |    CASE WHEN regexp_matches(v, '^[0-9]{4}-[0-9]{2}-[0-9]{2}$') THEN 'date'
        |         WHEN regexp_matches(v, '^-?[0-9]+$') THEN 'int'
        |         WHEN regexp_matches(v, '^-?[0-9]+\.[0-9]+$') THEN 'decimal'
        |         ELSE 'text' END AS cls
        |  FROM vals),
        |cnt AS (SELECT colname, cls, COUNT(*) AS n FROM cl GROUP BY 1, 2),
        |v AS (SELECT colname, cls, n,
        |        row_number() OVER (PARTITION BY colname ORDER BY n DESC, cls) AS rk
        |      FROM cnt)
        |SELECT c.colname, CAST(SUM(c.n) AS BIGINT) AS n_values,
        |  CAST(SUM(CASE WHEN c.cls = 'date' THEN c.n ELSE 0 END) AS BIGINT) AS n_date,
        |  CAST(SUM(CASE WHEN c.cls = 'int' THEN c.n ELSE 0 END) AS BIGINT) AS n_int,
        |  CAST(SUM(CASE WHEN c.cls = 'decimal' THEN c.n ELSE 0 END) AS BIGINT) AS n_dec,
        |  CAST(SUM(CASE WHEN c.cls = 'text' THEN c.n ELSE 0 END) AS BIGINT) AS n_text,
        |  MIN(w.cls) AS verdict
        |FROM cnt c JOIN (SELECT colname, cls FROM v WHERE rk = 1) w
        |  ON c.colname = w.colname
        |GROUP BY c.colname ORDER BY c.colname""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
      val vals = o.select(lit("c1_date").as("colname"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("v"))
        .unionAll(o.select(lit("c2_int"), col("o_orderkey").cast("string")))
        .unionAll(o.select(lit("c3_dec"),
          concat(floor(col("o_totalprice") * 100).cast("long").cast("string"),
            lit("."), (col("o_orderkey") % 10).cast("string"))))
        .unionAll(o.select(lit("c4_text"), col("o_orderpriority")))
        .unionAll(o.select(lit("c5_mixed"),
          when(col("o_orderkey") % 2 === 0, col("o_orderkey").cast("string"))
            .otherwise(col("o_orderpriority"))))
      val cl = vals.select(col("colname"),
        when(col("v").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), "date")
          .when(col("v").rlike("^-?[0-9]+$"), "int")
          .when(col("v").rlike("^-?[0-9]+\\.[0-9]+$"), "decimal")
          .otherwise("text").as("cls"))
      val cnt = cl.groupBy("colname", "cls").agg(count(lit(1)).as("n"))
      val wv = Window.partitionBy("colname").orderBy(col("n").desc, col("cls").asc)
      val verdict = cnt.withColumn("rk", row_number().over(wv))
        .where(col("rk") === 1)
        .select(col("colname").as("vc"), col("cls").as("verdict"))
      cnt.join(verdict, col("colname") === col("vc"))
        .groupBy("colname")
        .agg(sum(col("n")).as("n_values"),
          sum(when(col("cls") === "date", col("n")).otherwise(0L)).as("n_date"),
          sum(when(col("cls") === "int", col("n")).otherwise(0L)).as("n_int"),
          sum(when(col("cls") === "decimal", col("n")).otherwise(0L)).as("n_dec"),
          sum(when(col("cls") === "text", col("n")).otherwise(0L)).as("n_text"),
          min(col("verdict")).as("verdict"))
        .orderBy("colname")
    },

    // Length-bucketed batching audit: docs are banded by token length
    // (16-token bands, capped at band 7) and each band prices its padding
    // waste if every doc pads to the band maximum — against the single-
    // band baseline where everything pads to the global max. The waste
    // drop is why training loaders bucket by length. Map-only banding +
    // one band-grain rollup; the 'z_all' row reuses the same scan shape.
    QueryDef.sql(
      "q288_length_batching",
      """WITH d AS (SELECT len(string_split(text, ' ')) AS l FROM documents),
        |b AS (SELECT l, 'band_' || CAST(LEAST(l // 16, 7) AS VARCHAR) AS band FROM d),
        |per AS (
        |  SELECT band, COUNT(*) AS n, CAST(SUM(l) AS BIGINT) AS sum_l,
        |    CAST(MAX(l) AS BIGINT) AS max_l
        |  FROM b GROUP BY band
        |  UNION ALL
        |  SELECT 'z_all', COUNT(*), CAST(SUM(l) AS BIGINT), CAST(MAX(l) AS BIGINT)
        |  FROM d)
        |SELECT band, CAST(n AS BIGINT) AS n_docs, sum_l AS sum_tokens, max_l AS max_len,
        |  CAST((max_l * n - sum_l) * 1000000 // (max_l * n) AS BIGINT) AS waste_ppm
        |FROM per ORDER BY band""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).documents
        .select(size(split(col("text"), " ")).cast("long").as("l"))
      val banded = d
        .groupBy(concat(lit("band_"), least(expr("l div 16"), lit(7L)).cast("string"))
          .as("band"))
        .agg(count(lit(1)).as("n"), sum(col("l")).as("sum_l"), max(col("l")).as("max_l"))
      val allRow = d.agg(count(lit(1)).as("n"), sum(col("l")).as("sum_l"),
          max(col("l")).as("max_l"))
        .select(lit("z_all").as("band"), col("n"), col("sum_l"), col("max_l"))
      banded.unionAll(allRow)
        .select(col("band"), col("n").as("n_docs"), col("sum_l").as("sum_tokens"),
          col("max_l").as("max_len"),
          expr("(max_l * n - sum_l) * 1000000 div (max_l * n)").as("waste_ppm"))
        .orderBy("band")
    },

    // Per-source quota enforcement: each source keeps its top-15 docs by
    // (quality proxy = n_chars, doc_id tie-break) and reports what the
    // policy evicts — the dominance cap run after dedup so one crawl
    // domain can't flood the mixture. The rank window partitions by
    // source (parallel across sources; per-source top-k is the native
    // top-k-per-group shape q106 implements at scale).
    QueryDef.sql(
      "q289_source_quota",
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
        |      AS rk
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(CASE WHEN rk <= 15 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
        |  CAST(SUM(CASE WHEN rk <= 15 THEN n_chars ELSE 0 END) * 1000000
        |    // SUM(n_chars) AS BIGINT) AS kept_ppm
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)
      Tables(s, dir).documents
        .select(col("source"), col("n_chars"), row_number().over(w).as("rk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= 15, 1L).otherwise(0L)).as("kept_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(col("rk") <= 15, col("n_chars")).otherwise(0L)).as("kept_chars"),
          expr("sum(CASE WHEN rk <= 15 THEN n_chars ELSE 0 END) * 1000000" +
            " div sum(n_chars)").as("kept_ppm"))
        .orderBy("source")
    },

    // Stable vocabulary-id evolution (q242 builds ids once — this RE-runs
    // on a grown corpus without breaking old ids): words already in the
    // old snapshot keep their dense rank-ids; new words append after
    // max(old id) in lexical order. The old-id join is vocab-sized
    // (broadcast); id stability is what lets a re-trained tokenizer read
    // yesterday's tokenized 100 TB corpus without re-encoding it.
    QueryDef.sql(
      "q290_stable_vocab_ids",
      """WITH old_w AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents
        |  WHERE doc_id % 2 = 0),
        |old_ids AS (SELECT w, row_number() OVER (ORDER BY w) AS id FROM old_w),
        |new_w AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents),
        |j AS (SELECT n.w, o.id AS old_id
        |      FROM new_w n LEFT JOIN old_ids o ON n.w = o.w),
        |mx AS (SELECT COALESCE(MAX(id), 0) AS m FROM old_ids),
        |nw AS (SELECT w, row_number() OVER (ORDER BY w) AS r FROM j
        |       WHERE old_id IS NULL)
        |SELECT j.w AS word, CAST(COALESCE(j.old_id, mx.m + nw.r) AS BIGINT) AS id,
        |  CASE WHEN j.old_id IS NULL THEN 1 ELSE 0 END AS is_new
        |FROM j LEFT JOIN nw ON j.w = nw.w CROSS JOIN mx
        |ORDER BY id""".stripMargin) { (s, dir) =>
      def vocab(df: org.apache.spark.sql.DataFrame) =
        df.select(explode(split(col("text"), " ")).as("w")).distinct()
      val docs = Tables(s, dir).documents
      val oldIds = vocab(docs.where(col("doc_id") % 2 === 0))
        .select(col("w").as("ow"), row_number().over(Window.orderBy("w")).as("id"))
      val j = vocab(docs)
        .join(broadcast(oldIds), col("w") === col("ow"), "left_outer")
        .select(col("w"), col("id").as("old_id"))
      val mx = oldIds.agg(coalesce(max(col("id")), lit(0)).as("m"))
      val nw = j.where(col("old_id").isNull)
        .select(col("w").as("nww"), row_number().over(Window.orderBy("w")).as("r"))
      j.join(broadcast(nw), col("w") === col("nww"), "left_outer")
        .crossJoin(broadcast(mx))
        .select(col("w").as("word"),
          coalesce(col("old_id"), col("m") + col("r")).cast("long").as("id"),
          when(col("old_id").isNull, 1).otherwise(0).as("is_new"))
        .orderBy("id")
    },

    // Position-debiased CTR (inverse-propensity weighting): view events
    // carry a deterministic rank position and a synthetic click whose
    // rate decays with position; IPW weight 10⁶ div p re-weights clicks
    // so the overall CTR isn't dominated by position-1 exposure. Per-
    // position board plus a 'z_overall' row comparing naive vs debiased
    // CTR in exact ppm. One map-only projection + two rollups of 5 rows.
    QueryDef.sql(
      "q291_position_debias",
      """WITH imp AS (
        |  SELECT 1 + (event_id % 5) AS p,
        |    CASE WHEN CAST(FLOOR(value * 100) AS BIGINT) % (2 + (event_id % 5)) = 0
        |      THEN 1 ELSE 0 END AS clicked
        |  FROM events WHERE event_type = 'view'),
        |w AS (SELECT p, clicked, 1000000 // p AS wt FROM imp),
        |per AS (
        |  SELECT 'p_' || CAST(p AS VARCHAR) AS pos, COUNT(*) AS n_imp,
        |    CAST(SUM(clicked) AS BIGINT) AS n_clicks,
        |    CAST(SUM(clicked) * 1000000 // COUNT(*) AS BIGINT) AS ctr_ppm
        |  FROM w GROUP BY 1
        |  UNION ALL
        |  SELECT 'z_overall', COUNT(*), CAST(SUM(clicked) AS BIGINT),
        |    CAST(SUM(clicked * wt) * 1000000 // SUM(wt) AS BIGINT)
        |  FROM w)
        |SELECT pos, CAST(n_imp AS BIGINT) AS n_imp, n_clicks, ctr_ppm
        |FROM per ORDER BY pos""".stripMargin) { (s, dir) =>
      val imp = Tables(s, dir).events
        .where(col("event_type") === "view")
        .select((lit(1) + col("event_id") % 5).as("p"),
          when(floor(col("value") * 100).cast("long") % (lit(2) + col("event_id") % 5) === 0,
            1L).otherwise(0L).as("clicked"))
        .withColumn("wt", expr("1000000 div p"))
      val per = imp
        .groupBy(concat(lit("p_"), col("p").cast("string")).as("pos"))
        .agg(count(lit(1)).as("n_imp"), sum(col("clicked")).as("n_clicks"),
          expr("sum(clicked) * 1000000 div count(1)").as("ctr_ppm"))
      val overall = imp.agg(count(lit(1)).as("n_imp"), sum(col("clicked")).as("n_clicks"),
          expr("sum(clicked * wt) * 1000000 div sum(wt)").as("ctr_ppm"))
        .select(lit("z_overall").as("pos"), col("n_imp"), col("n_clicks"), col("ctr_ppm"))
      per.unionAll(overall).orderBy("pos")
    },

    // Backfill-wave planner (q116's spine turned into a worklist): dates
    // missing from the fact table (spine anti-join) are packed into
    // 7-day backfill waves in chronological order; each wave row carries
    // its day count and date range. The spine is date-grain (a few
    // thousand rows even for decades), so planning costs one fact scan
    // for the present-date set — the DAG a scheduler replays after an
    // outage, sized so each wave is one cluster run.
    QueryDef.sql(
      "q292_backfill_plan",
      """WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
        |             max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |            AS day FROM b),
        |present AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders),
        |missing AS (
        |  SELECT s.day, row_number() OVER (ORDER BY s.day) AS rk
        |  FROM spine s LEFT JOIN present p ON s.day = p.day
        |  WHERE p.day IS NULL)
        |SELECT CAST((rk - 1) // 7 AS BIGINT) AS wave, COUNT(*) AS n_days,
        |  CAST(MIN(day) AS VARCHAR) AS from_day, CAST(MAX(day) AS VARCHAR) AS to_day
        |FROM missing GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
      val b = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
        max(to_date(col("o_orderdate"))).as("hi"))
      val spine = b.select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val present = o.select(to_date(col("o_orderdate")).as("pday")).distinct()
      val missing = spine
        .join(present, col("day") === col("pday"), "left_anti")
        .withColumn("rk", row_number().over(Window.orderBy("day")))
      missing
        .groupBy(expr("(rk - 1) div 7").as("wave"))
        .agg(count(lit(1)).as("n_days"),
          min(col("day")).cast("string").as("from_day"),
          max(col("day")).cast("string").as("to_day"))
        .orderBy("wave")
    },

    // Streaming-dedup state sizing: dropDuplicates under a 1-hour
    // watermark holds every key seen in the current OR previous hour —
    // sizing that state BEFORE deploying is this query. Distinct
    // (hour, key) pairs project onto themselves plus hour+1 (the
    // spillover), and the per-hour distinct count is the concurrent
    // state-row high-water mark, reported per day as max/avg. Work is
    // (hour, key)-grain — already deduplicated — so at 100 TB the sizing
    // pass costs far less than the stream it protects.
    QueryDef.sql(
      "q293_state_sizing",
      """WITH hk AS (
        |  SELECT DISTINCT epoch_us(ts) // 3600000000 AS hb, user_id FROM events),
        |pairs AS (
        |  SELECT hb, user_id FROM hk
        |  UNION SELECT hb + 1, user_id FROM hk),
        |st AS (SELECT hb, COUNT(*) AS state_rows FROM pairs GROUP BY 1)
        |SELECT CAST(hb // 24 AS BIGINT) AS day_idx,
        |  CAST(MAX(state_rows) AS BIGINT) AS max_state,
        |  CAST(CAST(SUM(state_rows) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_state,
        |  CAST(COUNT(*) AS BIGINT) AS n_hours
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val hk = Tables(s, dir).events
        .select(expr("unix_micros(ts) div 3600000000").as("hb"), col("user_id"))
        .distinct()
      val pairs = hk.union(hk.select((col("hb") + 1).as("hb"), col("user_id"))).distinct()
      pairs.groupBy("hb").agg(count(lit(1)).as("state_rows"))
        .groupBy(expr("hb div 24").as("day_idx"))
        .agg(max(col("state_rows")).as("max_state"),
          expr("sum(state_rows) div count(1)").as("avg_state"),
          count(lit(1)).as("n_hours"))
        .orderBy("day_idx")
    },

    // Hard-negative mining (q243 samples RANDOM negatives — these are the
    // hardest): for each anchor vector, the most-similar vector with a
    // DIFFERENT label, by exact integer-scaled cosine with (cos desc,
    // cid) tie-break. Anchors broadcast against the corpus (q29's shape);
    // at 100 TB the same query runs per-IVF-cell (q55) to keep the pair
    // space bounded — the mining pass that makes contrastive training
    // batches actually contrastive.
    QueryDef.sql(
      "q294_hard_negatives",
      """WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qv
        |           FROM embeddings WHERE vec_id % 500 = 0),
        |c AS (SELECT vec_id AS cid, label AS clabel, embedding AS cv FROM embeddings),
        |pd AS (
        |  SELECT qid, qlabel, cid, clabel,
        |    SUM(CAST(FLOOR(CAST(qv[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |      * CAST(FLOOR(CAST(cv[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS dxy,
        |    SUM(CAST(FLOOR(CAST(qv[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |      * CAST(FLOOR(CAST(qv[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS dxx,
        |    SUM(CAST(FLOOR(CAST(cv[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |      * CAST(FLOOR(CAST(cv[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS dyy
        |  FROM q JOIN c ON qlabel <> clabel, generate_series(1, 64) t(i)
        |  GROUP BY 1, 2, 3, 4),
        |sc AS (
        |  SELECT qid, qlabel, cid, clabel,
        |    CAST(FLOOR(1000000.0 * CAST(dxy AS DOUBLE)
        |      / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))) AS BIGINT)
        |      AS cos_scaled
        |  FROM pd),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY cos_scaled DESC, cid) AS rk FROM sc)
        |SELECT qid, qlabel, cid AS hard_cid, clabel AS hard_clabel, cos_scaled
        |FROM r WHERE rk = 1 ORDER BY qid""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val q = e.where(col("vec_id") % 500 === 0)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("cid"), col("label").as("clabel"),
        col("embedding").as("cv"))
      val sc = c.join(broadcast(q), col("qlabel") =!= col("clabel"))
        .select(col("qid"), col("qlabel"), col("cid"), col("clabel"),
          graft.operators.Similarity.cosineScaled(col("qv"), col("cv")).as("cos_scaled"))
      val w = Window.partitionBy("qid").orderBy(col("cos_scaled").desc, col("cid").asc)
      sc.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("qid"), col("qlabel"), col("cid").as("hard_cid"),
          col("clabel").as("hard_clabel"), col("cos_scaled"))
        .orderBy("qid")
    },

    // Partition-spec evolution advisor (Iceberg-style): per month, the
    // daily-partition layout is priced by its average per-day bytes
    // (deterministic row-width model) against target file sizing — too
    // small advises coarsening to monthly partitions, too large advises
    // splitting to hourly, else keep daily. Month-grain output from one
    // map-side-combined day rollup; the advice table is what a 100 TB
    // lake's maintenance job turns into ALTER TABLE ... PARTITION BY.
    QueryDef.sql(
      "q295_partition_evolution",
      """WITH d AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(32 + len(o_orderpriority)) AS BIGINT) AS b
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT month, COUNT(*) AS n_days, CAST(SUM(b) AS BIGINT) AS month_bytes,
        |    CAST(CAST(SUM(b) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_day_bytes
        |  FROM d GROUP BY 1)
        |SELECT month, n_days, month_bytes, avg_day_bytes,
        |  CASE WHEN avg_day_bytes < 4096 THEN 'coarsen_to_month'
        |       WHEN avg_day_bytes > 65536 THEN 'split_to_hour'
        |       ELSE 'keep_daily' END AS advice
        |FROM m ORDER BY month""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(lit(32) + length(col("o_orderpriority"))).as("b"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_days"), sum(col("b")).as("month_bytes"),
          expr("sum(b) div count(1)").as("avg_day_bytes"))
        .select(col("month"), col("n_days"), col("month_bytes"), col("avg_day_bytes"),
          when(col("avg_day_bytes") < 4096, "coarsen_to_month")
            .when(col("avg_day_bytes") > 65536, "split_to_hour")
            .otherwise("keep_daily").as("advice"))
        .orderBy("month")
    },

    // Quality-classifier feature assembly: the per-doc feature vector a
    // fastText-style quality model consumes — token count, type-token
    // ratio, stopword share, digit share, max word length — computed in
    // ONE in-row projection (array HOFs + global-flag regex; no explode,
    // no joins). At 100 TB this runs map-only next to the scan; the
    // sampled doc grain keeps the oracle small while the projection is
    // corpus-shaped.
    QueryDef.sql(
      "q296_quality_features",
      """WITH d AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id % 13 = 0)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(ws)) * 1000000 // len(ws) AS BIGINT) AS ttr_ppm,
        |  CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a')) * 1000000
        |    // len(ws) AS BIGINT) AS stop_ppm,
        |  CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) * 1000000
        |    // len(text) AS BIGINT) AS digit_ppm,
        |  CAST(list_max(list_transform(ws, w -> len(w))) AS BIGINT) AS max_word_len
        |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .where(col("doc_id") % 13 === 0)
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          expr("size(array_distinct(ws)) * 1000000 div size(ws)").as("ttr_ppm"),
          expr("size(filter(ws, w -> w = 'the' OR w = 'a')) * 1000000 div size(ws)")
            .as("stop_ppm"),
          expr("length(regexp_replace(text, '[^0-9]', '')) * 1000000" +
            " div length(text)").as("digit_ppm"),
          expr("CAST(array_max(transform(ws, w -> length(w))) AS BIGINT)")
            .as("max_word_len"))
        .orderBy("doc_id")
    },

    // LSH bucket label purity (q204 audits MinHash RECALL — this audits
    // whether hyperplane-LSH buckets preserve LABELS): each vector lands
    // in its 8-bit signed-projection bucket (q30's md5-derived
    // hyperplanes), each bucket elects a majority label (count-desc,
    // label-asc tie-break), and purity = majority mass over bucket mass,
    // rolled up by bucket-size band. High purity in big buckets means ANN
    // candidates mostly agree with the classifier — the go/no-go audit
    // before swapping brute-force for LSH in a labeled-retrieval path.
    QueryDef.sql(
      "q297_lsh_label_purity",
      """WITH hp AS (SELECT j, i,
        |    CASE WHEN ('0x' || substr(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 2))::INT
        |      % 2 = 1 THEN 1 ELSE -1 END AS s
        |  FROM generate_series(0, 7) t1(j), generate_series(1, 64) t2(i)),
        |evb AS (SELECT vec_id, label, i,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |dots AS (SELECT vec_id, label, j, SUM(s * x) AS d
        |         FROM evb JOIN hp USING (i) GROUP BY 1, 2, 3),
        |buck AS (SELECT vec_id, label,
        |    CAST(SUM(CASE WHEN d > 0 THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS bucket
        |  FROM dots GROUP BY 1, 2),
        |bl AS (SELECT bucket, label, COUNT(*) AS n FROM buck GROUP BY 1, 2),
        |mj AS (SELECT bucket, SUM(n) AS bn,
        |    MAX(n) AS mx
        |  FROM bl GROUP BY 1),
        |band AS (
        |  SELECT CASE WHEN bn = 1 THEN 'a_single' WHEN bn <= 4 THEN 'b_small'
        |              ELSE 'c_large' END AS size_band, bn, mx
        |  FROM mj)
        |SELECT size_band, COUNT(*) AS n_buckets,
        |  CAST(SUM(bn) AS BIGINT) AS n_vecs,
        |  CAST(SUM(mx) * 1000000 // SUM(bn) AS BIGINT) AS purity_ppm
        |FROM band GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val buck = e.select(
        graft.operators.Similarity.lshBucket(col("embedding"), 8).as("bucket"),
        col("label"))
      val bl = buck.groupBy("bucket", "label").agg(count(lit(1)).as("n"))
      val mj = bl.groupBy("bucket").agg(sum(col("n")).as("bn"), max(col("n")).as("mx"))
      mj.select(
          when(col("bn") === 1, "a_single").when(col("bn") <= 4, "b_small")
            .otherwise("c_large").as("size_band"),
          col("bn"), col("mx"))
        .groupBy("size_band")
        .agg(count(lit(1)).as("n_buckets"), sum(col("bn")).as("n_vecs"),
          expr("sum(mx) * 1000000 div sum(bn)").as("purity_ppm"))
        .orderBy("size_band")
    },

    // BPE roundtrip contract (q272's inverse): decoding each encoded word
    // — un-merging the ladder in reverse order — must reproduce the
    // original character sequence exactly, because BPE merges are
    // bijective on the training alphabet. The audit reports any word
    // whose roundtrip breaks (there must be none) plus corpus totals; the
    // losslessness gate a tokenizer build runs before committing a merge
    // table that will encode 100 TB.
    QueryDef.sql(
      "q298_bpe_roundtrip",
      """WITH words AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents),
        |c AS (
        |  SELECT word, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS s
        |  FROM words WHERE word <> ''),
        |m AS (
        |  SELECT word, s,
        |    replace(replace(replace(replace(replace(replace(replace(replace(
        |      s, 't h', 'th'), 'e r', 'er'), 'i n', 'in'), 'o r', 'or'),
        |      'a t', 'at'), 'th e', 'the'), 's t', 'st'), 'o w', 'ow') AS enc
        |  FROM c),
        |d AS (
        |  SELECT word, s, enc,
        |    replace(replace(replace(replace(replace(replace(replace(replace(
        |      enc, 'ow', 'o w'), 'st', 's t'), 'the', 'th e'), 'at', 'a t'),
        |      'or', 'o r'), 'in', 'i n'), 'er', 'e r'), 'th', 't h') AS dec
        |  FROM m)
        |SELECT COUNT(*) AS n_words,
        |  CAST(SUM(CASE WHEN dec = s THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
        |  CAST(SUM(len(string_split(enc, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(len(string_split(s, ' '))) AS BIGINT) AS total_chars
        |FROM d""".stripMargin) { (s, dir) =>
      val merges = Seq("t h" -> "th", "e r" -> "er", "i n" -> "in", "o r" -> "or",
        "a t" -> "at", "th e" -> "the", "s t" -> "st", "o w" -> "ow")
      val chars = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .where(col("word") =!= "").distinct()
        .select(col("word"), trim(regexp_replace(col("word"), "(.)", "$1 ")).as("s"))
      val enc = merges.foldLeft(chars) { case (df, (from, to)) =>
        df.withColumn("enc",
          expr(s"replace(${if (df.columns.contains("enc")) "enc" else "s"}, '$from', '$to')"))
      }
      val dec = merges.reverse.foldLeft(enc) { case (df, (from, to)) =>
        df.withColumn("dec",
          expr(s"replace(${if (df.columns.contains("dec")) "dec" else "enc"}, '$to', '$from')"))
      }
      dec.agg(count(lit(1)).as("n_words"),
        sum(when(col("dec") === col("s"), 1L).otherwise(0L)).as("n_roundtrip_ok"),
        sum(size(split(col("enc"), " "))).as("total_tokens"),
        sum(size(split(col("s"), " "))).as("total_chars"))
    },

    // Materialized-view staleness pricing: the MV refreshes at the start
    // of each 7-day epoch; every later day accumulates un-refreshed base
    // changes (the running sum WITHIN the epoch — a partitioned prefix
    // window over the day-grain aggregate). Per epoch: peak and mean
    // staleness in rows. This prices a refresh cadence from one fact
    // rollup — at 100 TB the day-grain series stays a few thousand rows,
    // and the answer is whether 7 days of drift fits the SLA.
    QueryDef.sql(
      "q299_mv_staleness",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS changes
        |  FROM orders GROUP BY 1),
        |ep AS (
        |  SELECT day, changes,
        |    datediff('day', DATE '1995-01-01', day) // 7 AS epoch
        |  FROM daily),
        |run AS (
        |  SELECT epoch, day, changes,
        |    SUM(changes) OVER (PARTITION BY epoch ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stale_rows
        |  FROM ep)
        |SELECT CAST(epoch AS BIGINT) AS epoch, COUNT(*) AS n_days,
        |  CAST(SUM(changes) AS BIGINT) AS epoch_changes,
        |  CAST(MAX(stale_rows) AS BIGINT) AS peak_stale,
        |  CAST(CAST(SUM(stale_rows) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_stale
        |FROM run GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("changes"))
      val ep = daily.withColumn("epoch",
        expr("datediff(day, DATE '1995-01-01') div 7"))
      val w = Window.partitionBy("epoch").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ep.withColumn("stale_rows", sum(col("changes")).over(w))
        .groupBy("epoch")
        .agg(count(lit(1)).as("n_days"), sum(col("changes")).as("epoch_changes"),
          max(col("stale_rows")).as("peak_stale"),
          expr("sum(stale_rows) div count(1)").as("avg_stale"))
        .orderBy("epoch")
    },

    // Column-lineage transitive closure (impact analysis, q240's metadata
    // twin): a catalog-grain DAG of table dependencies is closed by three
    // bounded join rounds (the DAG is 4 levels deep — same bounded-
    // superstep shape as q185), answering "every downstream artifact a
    // raw-table change can touch" with minimum hop distance. The relation
    // is catalog-sized at any data scale; correctness (min-hop under the
    // diamond) is what the oracle pins.
    QueryDef.sql(
      "q300_lineage_closure",
      """WITH e(src, dst) AS (VALUES
        |  ('raw.orders', 'stg.orders'), ('raw.customer', 'stg.customer'),
        |  ('raw.lineitem', 'stg.lineitem'),
        |  ('stg.orders', 'mart.daily_rev'), ('stg.customer', 'mart.daily_rev'),
        |  ('stg.orders', 'mart.cust_360'), ('stg.customer', 'mart.cust_360'),
        |  ('stg.lineitem', 'mart.margin'),
        |  ('mart.daily_rev', 'bi.exec_dash'), ('mart.cust_360', 'bi.exec_dash'),
        |  ('mart.margin', 'bi.exec_dash'), ('mart.daily_rev', 'ml.churn_feats')),
        |h1 AS (SELECT src, dst, 1 AS hops FROM e),
        |h2 AS (SELECT a.src, b.dst, 2 AS hops FROM h1 a JOIN e b ON a.dst = b.src),
        |h3 AS (SELECT a.src, b.dst, 3 AS hops FROM h2 a JOIN e b ON a.dst = b.src),
        |allh AS (SELECT * FROM h1 UNION ALL SELECT * FROM h2 UNION ALL
        |         SELECT * FROM h3)
        |SELECT src, dst, CAST(MIN(hops) AS BIGINT) AS min_hops,
        |  CAST(COUNT(*) AS BIGINT) AS n_paths
        |FROM allh GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Seq(
        ("raw.orders", "stg.orders"), ("raw.customer", "stg.customer"),
        ("raw.lineitem", "stg.lineitem"),
        ("stg.orders", "mart.daily_rev"), ("stg.customer", "mart.daily_rev"),
        ("stg.orders", "mart.cust_360"), ("stg.customer", "mart.cust_360"),
        ("stg.lineitem", "mart.margin"),
        ("mart.daily_rev", "bi.exec_dash"), ("mart.cust_360", "bi.exec_dash"),
        ("mart.margin", "bi.exec_dash"), ("mart.daily_rev", "ml.churn_feats"))
        .toDF("src", "dst")
      val h1 = e.withColumn("hops", lit(1))
      val h2 = h1.select(col("src"), col("dst").as("mid"))
        .join(e.select(col("src").as("mid2"), col("dst")), col("mid") === col("mid2"))
        .select(col("src"), col("dst"), lit(2).as("hops"))
      val h3 = h2.select(col("src"), col("dst").as("mid"))
        .join(e.select(col("src").as("mid2"), col("dst")), col("mid") === col("mid2"))
        .select(col("src"), col("dst"), lit(3).as("hops"))
      h1.unionAll(h2).unionAll(h3)
        .groupBy("src", "dst")
        .agg(min(col("hops")).cast("long").as("min_hops"),
          count(lit(1)).as("n_paths"))
        .orderBy("src", "dst")
    },

    // DDL-barrier epoch split (SURVEY §2.9 ST5 — the reference's two-phase
    // barrier, audited as a batch): rare deterministic 'error' events act
    // as DDL barriers; every DML event belongs to the epoch = number of
    // barriers committed strictly before it in (commit-us, event_id)
    // order. The barrier list is tiny and BROADCAST — each DML row counts
    // its preceding barriers in one map-side join, no global sort. Per
    // epoch: DML count and the commit range the flush would cover; this
    // is exactly what the reference's flushRowChangedEventsBeforeDdl does
    // per barrier, replayed declaratively.
    QueryDef.sql(
      "q301_ddl_barrier_epochs",
      """WITH b AS (
        |  SELECT epoch_us(ts) AS bus, event_id AS bid FROM events
        |  WHERE event_type = 'error'
        |    AND CAST(FLOOR(value * 100) AS BIGINT) % 97 = 0),
        |dml AS (
        |  SELECT epoch_us(ts) AS us, event_id FROM events
        |  WHERE NOT (event_type = 'error'
        |    AND CAST(FLOOR(value * 100) AS BIGINT) % 97 = 0)),
        |tagged AS (
        |  SELECT d.event_id, d.us,
        |    (SELECT COUNT(*) FROM b
        |     WHERE b.bus < d.us OR (b.bus = d.us AND b.bid < d.event_id)) AS epoch
        |  FROM dml d)
        |SELECT CAST(epoch AS BIGINT) AS epoch, COUNT(*) AS n_dml,
        |  CAST(MIN(us) AS BIGINT) AS first_us, CAST(MAX(us) AS BIGINT) AS last_us
        |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val isBarrier = col("event_type") === "error" &&
        floor(col("value") * 100).cast("long") % 97 === 0
      val b = ev.where(isBarrier)
        .select(unix_micros(col("ts")).as("bus"), col("event_id").as("bid"))
      val dml = ev.where(!isBarrier)
        .select(unix_micros(col("ts")).as("us"), col("event_id"))
      dml.crossJoin(broadcast(b))
        .groupBy("event_id", "us")
        .agg(sum(when(col("bus") < col("us") ||
            (col("bus") === col("us") && col("bid") < col("event_id")), 1L)
          .otherwise(0L)).as("epoch"))
        .groupBy("epoch")
        .agg(count(lit(1)).as("n_dml"), min(col("us")).as("first_us"),
          max(col("us")).as("last_us"))
        .orderBy("epoch")
    },

    // Mergeable-histogram re-bucketing audit (q274's equi-width cousin):
    // each hash shard builds an 8-bucket equi-width histogram over its
    // LOCAL min/max — the realistic partial when shards can't coordinate
    // — and the coordinator re-buckets them onto the global 8-bucket
    // spine by proportional floor split. Estimated vs exact count per
    // global bucket, error in ppm of total: the quantified price of
    // merging histograms whose bounds disagree. All bucket math is
    // shard×8-row metadata; only the two base rollups touch fact rows.
    QueryDef.sql(
      "q302_histogram_merge",
      """WITH e AS (
        |  SELECT user_id % 4 AS shard, CAST(FLOOR(value * 100) AS BIGINT) AS c
        |  FROM events),
        |sb AS (SELECT shard, MIN(c) AS smin, MAX(c) AS smax FROM e GROUP BY 1),
        |g AS (SELECT MIN(c) AS gmin, MAX(c) AS gmax FROM e),
        |loc AS (
        |  SELECT e.shard,
        |    LEAST(CAST((e.c - sb.smin) * 8 // (sb.smax - sb.smin + 1) AS BIGINT), 7)
        |      AS lb, COUNT(*) AS n
        |  FROM e JOIN sb ON e.shard = sb.shard GROUP BY 1, 2),
        |locb AS (
        |  SELECT l.shard, l.lb, l.n,
        |    sb.smin + l.lb * (sb.smax - sb.smin + 1) // 8 AS lo,
        |    sb.smin + (l.lb + 1) * (sb.smax - sb.smin + 1) // 8 AS hi
        |  FROM loc l JOIN sb ON l.shard = sb.shard),
        |gspine AS (
        |  SELECT i.i AS gb,
        |    g.gmin + i.i * (g.gmax - g.gmin + 1) // 8 AS glo,
        |    g.gmin + (i.i + 1) * (g.gmax - g.gmin + 1) // 8 AS ghi
        |  FROM generate_series(0, 7) i(i), g),
        |est AS (
        |  SELECT s.gb,
        |    SUM(l.n * (LEAST(l.hi, s.ghi) - GREATEST(l.lo, s.glo)) // (l.hi - l.lo))
        |      AS est_n
        |  FROM locb l JOIN gspine s
        |    ON LEAST(l.hi, s.ghi) > GREATEST(l.lo, s.glo)
        |  GROUP BY 1),
        |exact AS (
        |  SELECT LEAST(CAST((e.c - g.gmin) * 8 // (g.gmax - g.gmin + 1) AS BIGINT), 7)
        |      AS gb, COUNT(*) AS n
        |  FROM e, g GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS t FROM e)
        |SELECT x.gb, CAST(x.n AS BIGINT) AS exact_n,
        |  CAST(COALESCE(est.est_n, 0) AS BIGINT) AS est_n,
        |  CAST(abs(COALESCE(est.est_n, 0) - x.n) * 1000000 // tot.t AS BIGINT)
        |    AS err_ppm
        |FROM exact x LEFT JOIN est ON x.gb = est.gb CROSS JOIN tot
        |ORDER BY x.gb""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select((col("user_id") % 4).as("shard"),
          floor(col("value") * 100).cast("long").as("c"))
      val sb = e.groupBy("shard").agg(min(col("c")).as("smin"), max(col("c")).as("smax"))
      val g = e.agg(min(col("c")).as("gmin"), max(col("c")).as("gmax"))
      val loc = e.join(broadcast(sb), "shard")
        .groupBy(col("shard"),
          least(expr("(c - smin) * 8 div (smax - smin + 1)"), lit(7L)).as("lb"))
        .agg(count(lit(1)).as("n"))
      val locb = loc.join(broadcast(sb), "shard")
        .select(col("shard"), col("lb"), col("n"),
          expr("smin + lb * (smax - smin + 1) div 8").as("lo"),
          expr("smin + (lb + 1) * (smax - smin + 1) div 8").as("hi"))
      val gspine = s.range(8).select(col("id").as("gb"))
        .crossJoin(broadcast(g))
        .select(col("gb"), expr("gmin + gb * (gmax - gmin + 1) div 8").as("glo"),
          expr("gmin + (gb + 1) * (gmax - gmin + 1) div 8").as("ghi"))
      val est = locb.join(broadcast(gspine),
          least(col("hi"), col("ghi")) > greatest(col("lo"), col("glo")))
        .groupBy("gb")
        .agg(sum(expr("n * (LEAST(hi, ghi) - GREATEST(lo, glo)) div (hi - lo)"))
          .as("est_n"))
      val exact = e.crossJoin(broadcast(g))
        .groupBy(least(expr("(c - gmin) * 8 div (gmax - gmin + 1)"), lit(7L)).as("gb"))
        .agg(count(lit(1)).as("n"))
      val tot = e.agg(count(lit(1)).as("t"))
      exact.join(est, Seq("gb"), "left_outer").crossJoin(broadcast(tot))
        .select(col("gb"), col("n").as("exact_n"),
          coalesce(col("est_n"), lit(0L)).as("est_n"),
          expr("abs(COALESCE(est_n, 0) - n) * 1000000 div t").as("err_ppm"))
        .orderBy("gb")
    },

    // Pseudo-relevance-feedback query expansion (IR, q93's downstream):
    // the seed query {spark, join} ranks docs by summed term frequency
    // (top-10, doc_id tie-break); the top co-occurring terms in those docs
    // — stopwords and seed terms excluded — become the expansion, weighted
    // by their feedback-set tf. Both top-k's are tiny and the feedback
    // join is doc_id-keyed on 10 broadcast rows; the corpus-shaped work is
    // one (doc, term) tf aggregate, shared with any tf-idf pipeline.
    QueryDef.sql(
      "q303_query_expansion",
      """WITH tf AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tfc AS (SELECT doc_id, term, COUNT(*) AS f FROM tf GROUP BY 1, 2),
        |scored AS (
        |  SELECT doc_id, SUM(f) AS score FROM tfc
        |  WHERE term IN ('spark', 'join') GROUP BY 1),
        |topd AS (SELECT doc_id, score FROM scored
        |         ORDER BY score DESC, doc_id LIMIT 10),
        |exp AS (
        |  SELECT t.term, SUM(t.f) AS w FROM tfc t JOIN topd USING (doc_id)
        |  WHERE t.term NOT IN ('spark', 'join', 'the', 'a') AND t.term <> ''
        |  GROUP BY 1)
        |SELECT term, CAST(w AS BIGINT) AS weight
        |FROM exp ORDER BY w DESC, term LIMIT 5""".stripMargin) { (s, dir) =>
      val tfc = Tables(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("f"))
      val topd = tfc.where(col("term").isin("spark", "join"))
        .groupBy("doc_id").agg(sum(col("f")).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(10)
        .select("doc_id")
      tfc.join(broadcast(topd), "doc_id")
        .where(!col("term").isin("spark", "join", "the", "a") && col("term") =!= "")
        .groupBy("term").agg(sum(col("f")).as("weight"))
        .orderBy(col("weight").desc, col("term").asc).limit(5)
    },

    // Hostile-value CSV roundtrip (S5's escaping matrix under fire —
    // q45 proves types survive; THIS proves the quoting/escaping rules
    // survive adversarial content): values embedding the separator, the
    // quote, the escape character, and the literal NULL token are written
    // with the reference option matrix and read back. Everything must
    // return byte-identical EXCEPT the 'NULL' string, which the nullValue
    // token correctly turns into SQL NULL — the oracle encodes that
    // asymmetry. This is the CSV-migrate contract a 100 TB export/import
    // cycle rests on.
    QueryDef.sql(
      "q304_csv_hostile",
      """SELECT o_orderkey AS k,
        |  CASE o_orderkey % 6
        |    WHEN 0 THEN 'a,b' || CAST(o_orderkey % 10 AS VARCHAR)
        |    WHEN 1 THEN 'q"uo"te' || CAST(o_orderkey % 10 AS VARCHAR)
        |    WHEN 2 THEN 'back\slash' || CAST(o_orderkey % 10 AS VARCHAR)
        |    WHEN 3 THEN NULL
        |    WHEN 4 THEN 'plain' || CAST(o_orderkey % 10 AS VARCHAR)
        |    ELSE 'x,"y\z' || CAST(o_orderkey % 10 AS VARCHAR) END AS v
        |FROM orders ORDER BY k""".stripMargin) { (s, dir) =>
      val hostile = Tables(s, dir).orders.select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 6 === 0,
            concat(lit("a,b"), (col("o_orderkey") % 10).cast("string")))
          .when(col("o_orderkey") % 6 === 1,
            concat(lit("q\"uo\"te"), (col("o_orderkey") % 10).cast("string")))
          .when(col("o_orderkey") % 6 === 2,
            concat(lit("back\\slash"), (col("o_orderkey") % 10).cast("string")))
          .when(col("o_orderkey") % 6 === 3, lit("NULL"))
          .when(col("o_orderkey") % 6 === 4,
            concat(lit("plain"), (col("o_orderkey") % 10).cast("string")))
          .otherwise(concat(lit("x,\"y\\z"), (col("o_orderkey") % 10).cast("string")))
          .as("v"))
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_hostile"
      Migrate.writeCsv(hostile, tmp)
      Migrate.readCsv(s, tmp, hostile.schema).orderBy("k")
    },

    // SimHash Hamming-radius sweep (the threshold-tuning evidence behind
    // q35's radius-3 choice): EXACT pair counts at every radius 0..4,
    // computed at CODE grain — docs collapse onto their 16-bit simhash
    // first, radius-0 pairs are C(n,2) within a code, and cross-code
    // pairs weight n₁·n₂ over the distinct-code self-join. The join is
    // |codes|², not |docs|² — at 100 TB the 16-bit code table tops out at
    // 65k rows regardless of corpus size, so the whole sweep costs one
    // doc-grain simhash pass plus a bounded metadata join.
    QueryDef.sql(
      "q305_simhash_radius",
      """WITH nrm AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM nrm),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h FROM tok),
        |bits AS (SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, generate_series(0, 15) t(b) GROUP BY doc_id, b),
        |sim AS (SELECT doc_id,
        |    SUM(CASE WHEN s > 0 THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END)
        |      AS simhash
        |  FROM bits GROUP BY doc_id),
        |codes AS (SELECT simhash, COUNT(*) AS n FROM sim GROUP BY 1),
        |r0 AS (SELECT 0 AS radius, CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS pairs
        |       FROM codes),
        |rx AS (SELECT bit_count(xor(a.simhash, b.simhash)) AS radius,
        |         CAST(SUM(a.n * b.n) AS BIGINT) AS pairs
        |       FROM codes a JOIN codes b ON a.simhash < b.simhash
        |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 4 GROUP BY 1),
        |allr AS (SELECT * FROM r0 UNION ALL SELECT * FROM rx)
        |SELECT radius, pairs,
        |  CAST(SUM(pairs) OVER (ORDER BY radius
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_pairs
        |FROM allr ORDER BY radius""".stripMargin) { (s, dir) =>
      import graft.operators.Dedup
      val sim = Dedup.simhash16(Tables(s, dir).documents, "doc_id", "text")
      val codes = sim.groupBy("simhash").agg(count(lit(1)).as("n"))
      val r0 = codes.agg(sum(expr("n * (n - 1) div 2")).as("pairs"))
        .select(lit(0L).as("radius"), col("pairs"))
      val rx = codes.select(col("simhash").as("s1"), col("n").as("n1"))
        .join(codes.select(col("simhash").as("s2"), col("n").as("n2")),
          col("s1") < col("s2"))
        .where(expr("bit_count(s1 ^ s2) <= 4"))
        .groupBy(expr("CAST(bit_count(s1 ^ s2) AS BIGINT)").as("radius"))
        .agg(sum(col("n1") * col("n2")).as("pairs"))
      val w = Window.orderBy("radius")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r0.unionAll(rx)
        .withColumn("cum_pairs", sum(col("pairs")).over(w))
        .orderBy("radius")
    },

    // Bloom-filter sizing advisor (q260 audits ONE size — this sweeps
    // m ∈ {504, 1008, 2016} bits and picks the smallest meeting FPR ≤ 2%):
    // the same 3-hash/63-bit-word filter is built and probed at each size
    // in one unioned pass, measured FPR in ppm per size, plus the advised
    // size. The filter build is map-side bit_or at word grain; the sweep
    // multiplies metadata (filter words), never the probe stream — the
    // pre-deploy sizing a 100 TB semi-join pushdown (q85) runs once.
    QueryDef.sql(
      "q306_bloom_sizing",
      """WITH sizes(m) AS (VALUES (504), (1008), (2016)),
        |cust AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_member
        |  FROM customer),
        |ph AS (
        |  SELECT sizes.m, k, is_member, i,
        |    ('0x' || substr(md5(CAST(k AS VARCHAR) || ':b' || CAST(i AS VARCHAR)),
        |      1, 8))::BIGINT % sizes.m AS h
        |  FROM cust CROSS JOIN (VALUES (1), (2), (3)) t(i) CROSS JOIN sizes),
        |words AS (
        |  SELECT m, h // 63 AS w,
        |    bit_or(CAST(1 AS BIGINT) << CAST(h % 63 AS INTEGER)) AS bm
        |  FROM ph WHERE is_member = 1 GROUP BY 1, 2),
        |hit AS (
        |  SELECT ph.m, ph.k, ph.is_member,
        |    SUM(CASE WHEN words.bm IS NOT NULL AND
        |      (words.bm & (CAST(1 AS BIGINT) << CAST(ph.h % 63 AS INTEGER))) <> 0
        |      THEN 1 ELSE 0 END) AS nh
        |  FROM ph LEFT JOIN words ON ph.m = words.m AND ph.h // 63 = words.w
        |  GROUP BY 1, 2, 3),
        |fp AS (
        |  SELECT m,
        |    CAST(SUM(CASE WHEN is_member = 0 AND nh = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS false_pos,
        |    CAST(SUM(CASE WHEN is_member = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS non_members,
        |    CAST(SUM(CASE WHEN is_member = 1 AND nh < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS false_neg
        |  FROM hit GROUP BY 1),
        |rated AS (
        |  SELECT m, false_pos, non_members, false_neg,
        |    CAST(false_pos * 1000000 // non_members AS BIGINT) AS fpr_ppm
        |  FROM fp),
        |best AS (SELECT MIN(m) AS advised_m FROM rated WHERE fpr_ppm <= 20000)
        |SELECT CAST(rated.m AS BIGINT) AS m, false_pos, non_members, false_neg,
        |  fpr_ppm,
        |  CASE WHEN rated.m = best.advised_m THEN 1 ELSE 0 END AS advised
        |FROM rated CROSS JOIN best ORDER BY m""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sizes = Seq(504, 1008, 2016).toDF("m")
      val cust = Tables(s, dir).customer
        .select(col("c_custkey").as("k"),
          when(col("c_mktsegment") === "BUILDING", 1).otherwise(0).as("is_member"))
      val hashes = Seq(1, 2, 3).toDF("i")
      val ph = cust.crossJoin(broadcast(hashes)).crossJoin(broadcast(sizes))
        .select(col("m"), col("k"), col("is_member"),
          (expr("CAST(conv(substring(md5(concat(CAST(k AS STRING), ':b'," +
            " CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT)") % col("m")).as("h"))
      val words = ph.where(col("is_member") === 1)
        .groupBy(col("m").as("wm"), expr("h div 63").as("w"))
        .agg(expr("bit_or(shiftleft(1L, CAST(h % 63 AS INT)))").as("bm"))
      val hit = ph.join(broadcast(words),
          col("m") === col("wm") && expr("h div 63") === col("w"), "left_outer")
        .groupBy("m", "k", "is_member")
        .agg(sum(when(col("bm").isNotNull &&
            expr("(bm & shiftleft(1L, CAST(h % 63 AS INT))) != 0"), 1L)
          .otherwise(0L)).as("nh"))
      val rated = hit.groupBy("m")
        .agg(
          sum(when(col("is_member") === 0 && col("nh") === 3, 1L).otherwise(0L))
            .as("false_pos"),
          sum(when(col("is_member") === 0, 1L).otherwise(0L)).as("non_members"),
          sum(when(col("is_member") === 1 && col("nh") < 3, 1L).otherwise(0L))
            .as("false_neg"))
        .withColumn("fpr_ppm", expr("false_pos * 1000000 div non_members"))
      val best = rated.where(col("fpr_ppm") <= 20000)
        .agg(min(col("m")).as("advised_m"))
      rated.crossJoin(broadcast(best))
        .select(col("m").cast("long").as("m"), col("false_pos"), col("non_members"),
          col("false_neg"), col("fpr_ppm"),
          when(col("m") === col("advised_m"), 1).otherwise(0).as("advised"))
        .orderBy("m")
    },

    // Neyman sampling allocation (survey-optimal stratification): each
    // stratum's share of the 10,000-row sample budget is proportional to
    // n_h·σ_h (σ from the exact integer variance, floor-sqrt'd), with the
    // largest-remainder rule making the integer allocations sum EXACTLY
    // to the budget — the deterministic twin of what proportional floor
    // division alone can't guarantee. One fact-grain moment aggregate;
    // everything after is stratum-grain (5 rows).
    QueryDef.sql(
      "q307_neyman_alloc",
      """WITH e AS (
        |  SELECT event_type AS h, CAST(FLOOR(value * 100) AS BIGINT) AS c
        |  FROM events),
        |m AS (SELECT h, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
        |      FROM e GROUP BY 1),
        |sd AS (SELECT h, n,
        |    CAST(FLOOR(sqrt(CAST((n * s2 - s1 * s1) // (n * n) AS DOUBLE))) AS BIGINT)
        |      AS sigma
        |  FROM m),
        |w AS (SELECT h, n, sigma, n * sigma AS wt FROM sd),
        |t AS (SELECT SUM(wt) AS tw FROM w),
        |base AS (
        |  SELECT h, n, sigma, wt,
        |    CAST(10000 * wt // tw AS BIGINT) AS alloc0,
        |    CAST((10000 * wt) % tw AS BIGINT) AS rem
        |  FROM w, t),
        |need AS (SELECT 10000 - SUM(alloc0) AS extra FROM base),
        |rk AS (SELECT h, n, sigma, alloc0, rem,
        |    row_number() OVER (ORDER BY rem DESC, h) AS r
        |  FROM base)
        |SELECT rk.h, CAST(rk.n AS BIGINT) AS n_rows, rk.sigma,
        |  CAST(rk.alloc0 + CASE WHEN rk.r <= need.extra THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM rk, need ORDER BY rk.h""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val m = Tables(s, dir).events
        .select(col("event_type").as("h"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy("h")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
          sum((col("c") * col("c")).cast(dec)).as("s2"))
      val w = m.select(col("h"), col("n"),
          expr(s"CAST(FLOOR(sqrt(CAST((CAST(n AS $dec) * s2 - CAST(s1 AS $dec) *" +
            s" CAST(s1 AS $dec)) div (n * n) AS DOUBLE))) AS BIGINT)").as("sigma"))
        .withColumn("wt", col("n") * col("sigma"))
      val t = w.agg(sum(col("wt")).as("tw"))
      val base = w.crossJoin(broadcast(t))
        .select(col("h"), col("n"), col("sigma"),
          expr("10000 * wt div tw").as("alloc0"),
          expr("(10000 * wt) % tw").as("rem"))
      val need = base.agg((lit(10000) - sum(col("alloc0"))).as("extra"))
      base
        .withColumn("r", row_number().over(Window.orderBy(col("rem").desc, col("h").asc)))
        .crossJoin(broadcast(need))
        .select(col("h"), col("n").as("n_rows"), col("sigma"),
          (col("alloc0") + when(col("r") <= col("extra"), 1L).otherwise(0L))
            .cast("long").as("alloc"))
        .orderBy("h")
    },

    // Language-ID confusion matrix (q21's heuristic evaluated against the
    // corpus's ground-truth lang column): per (actual, predicted) cell
    // count and row-share ppm. The labeled corpus includes 'zh', which
    // the 4-language marker model CANNOT predict — the matrix shows
    // exactly where those docs land, the honest failure-mode readout a
    // LID gate needs before filtering a 100 TB multilingual crawl.
    QueryDef.sql(
      "q308_langid_confusion",
      """WITH nrm AS (SELECT doc_id, lang,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
        |  FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(regexp_extract_all(nt, '\b(the|of|and)\b')) AS s_en,
        |  len(regexp_extract_all(nt, '\b(der|die|das|und)\b')) AS s_de,
        |  len(regexp_extract_all(nt, '\b(el|la|los|de)\b')) AS s_es,
        |  len(regexp_extract_all(nt, '\b(le|les|des|une)\b')) AS s_fr
        | FROM nrm),
        |p AS (SELECT lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred
        |  FROM sc),
        |cell AS (SELECT lang, pred, COUNT(*) AS n FROM p GROUP BY 1, 2),
        |rowt AS (SELECT lang, SUM(n) AS rn FROM cell GROUP BY 1)
        |SELECT cell.lang, cell.pred, CAST(cell.n AS BIGINT) AS n,
        |  CAST(cell.n * 1000000 // rowt.rn AS BIGINT) AS row_share_ppm
        |FROM cell JOIN rowt ON cell.lang = rowt.lang
        |ORDER BY cell.lang, cell.pred""".stripMargin) { (s, dir) =>
      val sc = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("nt"))
        .select(col("lang"),
          expr("size(regexp_extract_all(nt, '\\\\b(the|of|and)\\\\b', 0))").as("s_en"),
          expr("size(regexp_extract_all(nt, '\\\\b(der|die|das|und)\\\\b', 0))").as("s_de"),
          expr("size(regexp_extract_all(nt, '\\\\b(el|la|los|de)\\\\b', 0))").as("s_es"),
          expr("size(regexp_extract_all(nt, '\\\\b(le|les|des|une)\\\\b', 0))").as("s_fr"))
      val p = sc.select(col("lang"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
             col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr").as("pred"))
      val cell = p.groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      val rowt = cell.groupBy(col("lang").as("rl")).agg(sum(col("n")).as("rn"))
      cell.join(broadcast(rowt), col("lang") === col("rl"))
        .select(col("lang"), col("pred"), col("n"),
          expr("n * 1000000 div rn").as("row_share_ppm"))
        .orderBy("lang", "pred")
    },

    // Cohort LTV curve: customers grouped by first-order month (1995
    // cohorts), cumulative revenue cents per cohort over the first 6
    // months of life — the running sum is a window over the (cohort, age)
    // aggregate, so the fact table is scanned once and the curve is
    // cohort-grain metadata. The month arithmetic stays integral
    // (y·12+m), immune to calendar-function drift.
    QueryDef.sql(
      "q309_cohort_ltv",
      """WITH o AS (
        |  SELECT o_custkey AS ck,
        |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS om,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |first AS (SELECT ck, MIN(om) AS cm FROM o GROUP BY 1),
        |j AS (
        |  SELECT first.cm, o.om - first.cm AS age, o.cents
        |  FROM o JOIN first ON o.ck = first.ck
        |  WHERE first.cm < 1995 * 12 + 12 AND o.om - first.cm <= 5),
        |g AS (SELECT cm, age, CAST(SUM(cents) AS BIGINT) AS rev,
        |        COUNT(*) AS n_orders
        |      FROM j GROUP BY 1, 2)
        |SELECT CAST(cm AS BIGINT) AS cohort_month, CAST(age AS BIGINT) AS age,
        |  rev, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(SUM(rev) OVER (PARTITION BY cm ORDER BY age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_rev
        |FROM g ORDER BY cohort_month, age""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
        .select(col("o_custkey").as("ck"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("om"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val first = o.groupBy("ck").agg(min(col("om")).as("cm"))
      val g = o.join(first, "ck")
        .where(col("cm") < lit(1995 * 12 + 12) && col("om") - col("cm") <= 5)
        .groupBy(col("cm"), (col("om") - col("cm")).as("age"))
        .agg(sum(col("cents")).as("rev"), count(lit(1)).as("n_orders"))
      val w = Window.partitionBy("cm").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("cm").cast("long").as("cohort_month"), col("age").cast("long").as("age"),
          col("rev"), col("n_orders"), sum(col("rev")).over(w).as("cum_rev"))
        .orderBy("cohort_month", "age")
    },

    // Sample-ratio-mismatch check (the experimentation platform's smoke
    // alarm): users hash into arms via the portable md5 split (q256's
    // convention); a healthy 50/50 split satisfies (n_a − n_b)² ≤ 9·n —
    // the 3σ binomial bound in pure integers. Per-day board plus the
    // overall verdict row; a flagged day means assignment is broken and
    // every downstream metric read is invalid. User-grain dedup, then
    // day-grain metadata.
    QueryDef.sql(
      "q310_srm_check",
      """WITH u AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':arm'), 1, 8))::BIGINT % 2
        |      AS arm
        |  FROM events),
        |d AS (
        |  SELECT strftime(day, '%Y-%m-%d') AS day,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM u GROUP BY 1
        |  UNION ALL
        |  SELECT 'z_overall',
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM (SELECT DISTINCT user_id, arm FROM u))
        |SELECT day, n_a, n_b,
        |  CASE WHEN (n_a - n_b) * (n_a - n_b) > 9 * (n_a + n_b) THEN 1 ELSE 0 END
        |    AS srm_flag
        |FROM d ORDER BY day""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
        .withColumn("arm",
          expr("CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':arm'))," +
            " 1, 8), 16, 10) AS BIGINT) % 2"))
      val daily = u.groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      val overall = u.select("user_id", "arm").distinct()
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        .select(lit("z_overall").as("day"), col("n_a"), col("n_b"))
      daily.unionAll(overall)
        .select(col("day"), col("n_a"), col("n_b"),
          when((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) >
            lit(9) * (col("n_a") + col("n_b")), 1).otherwise(0).as("srm_flag"))
        .orderBy("day")
    },

    // CUPED variance reduction (experimentation's pre-period adjustment):
    // pre-period (first 15 days) user spend predicts post-period spend;
    // θ = cov/var(x) in signed ppm (DOUBLE+FLOOR — the engines' integer
    // divisions disagree on negatives), and the achieved variance
    // reduction equals corr² — reported exactly as cov²·10⁶ div (vx·vy)
    // with every power sum in DECIMAL(38,0) (cov² alone reaches ~10³⁰ at
    // sf0.1; Long wraps at the first multiply). One user-grain rollup, a
    // 5-number summary out — the pattern that decides whether an
    // experiment needs 2 weeks or 8.
    QueryDef.sql(
      "q311_cuped",
      """WITH e AS (
        |  SELECT user_id, CAST(FLOOR(value) AS BIGINT) AS v,
        |    CASE WHEN day(CAST(ts AS DATE)) <= 15 THEN 0 ELSE 1 END AS period
        |  FROM events),
        |u AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN period = 0 THEN v ELSE 0 END) AS x,
        |    SUM(CASE WHEN period = 1 THEN v ELSE 0 END) AS y
        |  FROM e GROUP BY 1),
        |m AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM u)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  CAST(FLOOR(CAST((n * sxy - sx * sy) AS DOUBLE) * 1000000.0
        |    / CAST((n * sxx - sx * sx) AS DOUBLE)) AS BIGINT) AS theta_ppm,
        |  CAST(n * syy - sy * sy AS BIGINT) AS var_y_scaled,
        |  CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
        |    // ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)
        |    AS reduction_ppm
        |FROM m""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val u = Tables(s, dir).events
        .select(col("user_id"), floor(col("value")).cast("long").as("v"),
          when(dayofmonth(to_date(col("ts"))) <= 15, 0).otherwise(1).as("period"))
        .groupBy("user_id")
        .agg(sum(when(col("period") === 0, col("v")).otherwise(0L)).as("x"),
          sum(when(col("period") === 1, col("v")).otherwise(0L)).as("y"))
      u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        .select(col("n").as("n_users"),
          expr("CAST(FLOOR(CAST((n * sxy - sx * sy) AS DOUBLE) * 1000000.0" +
            " / CAST((n * sxx - sx * sx) AS DOUBLE)) AS BIGINT)").as("theta_ppm"),
          expr(s"CAST(CAST(n AS $dec) * syy - CAST(sy AS $dec) * CAST(sy AS $dec)" +
            s" AS BIGINT)").as("var_y_scaled"),
          expr(s"CAST((CAST(n AS $dec) * sxy - CAST(sx AS $dec) * CAST(sy AS $dec))" +
            s" * (CAST(n AS $dec) * sxy - CAST(sx AS $dec) * CAST(sy AS $dec))" +
            s" * 1000000 div ((CAST(n AS $dec) * sxx - CAST(sx AS $dec) *" +
            s" CAST(sx AS $dec)) * (CAST(n AS $dec) * syy - CAST(sy AS $dec) *" +
            s" CAST(sy AS $dec))) AS BIGINT)").as("reduction_ppm"))
    },

    // Day-of-week seasonality index: each weekday's mean daily revenue as
    // exact ppm of the overall mean — index = (s_d · N) ·10⁶ div (n_d · S)
    // keeps the ratio-of-means integral (no per-day float averages). The
    // de-seasonalization divisor every daily-forecast pipeline (q270)
    // applies first; one day-grain rollup, 7 rows out. DOW numbering is
    // normalized to DuckDB's 0=Sunday.
    QueryDef.sql(
      "q312_dow_seasonality",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |d AS (SELECT dayofweek(day) AS dow, cents FROM daily),
        |per AS (SELECT dow, COUNT(*) AS n_days, SUM(cents) AS s FROM d GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn, SUM(cents) AS ss FROM d)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(s AS BIGINT) AS cents,
        |  CAST(s * nn * 1000000 // (n_days * ss) AS BIGINT) AS index_ppm
        |FROM per, tot ORDER BY dow""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val d = daily.select((dayofweek(col("day")) - 1).cast("long").as("dow"), col("cents"))
      val per = d.groupBy("dow").agg(count(lit(1)).as("n_days"), sum(col("cents")).as("s"))
      val tot = d.agg(count(lit(1)).as("nn"), sum(col("cents")).as("ss"))
      per.crossJoin(broadcast(tot))
        .select(col("dow"), col("n_days"), col("s").as("cents"),
          // s·nn·10⁶ overflows Long at corpus scale — DECIMAL numerator
          expr(s"CAST(CAST(s AS $dec) * nn * 1000000 div (n_days * ss) AS BIGINT)")
            .as("index_ppm"))
        .orderBy("dow")
    },

    // Dedup precision/recall curve with PLANTED truth (q305's sweep made
    // actionable): the near-dup fixture plants truncated twins at
    // doc_id+100000, so ground truth is known exactly; at each SimHash
    // Hamming radius 0..4, recall = planted pairs recovered and
    // precision = planted over ALL pairs inside the radius (code-grain
    // totals — |codes|² bounded, never |docs|²). The curve is how a
    // dedup threshold is actually chosen before a 100 TB run: radius
    // buys recall, costs precision.
    QueryDef.sql(
      "q313_dedup_pr_curve",
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, substr(text, 21) FROM documents
        |  WHERE doc_id % 29 = 0),
        |nrm AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt FROM docs),
        |tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM nrm),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h FROM tok),
        |bits AS (SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, generate_series(0, 15) t(b) GROUP BY doc_id, b),
        |sim AS (SELECT doc_id,
        |    SUM(CASE WHEN s > 0 THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END)
        |      AS simhash
        |  FROM bits GROUP BY doc_id),
        |planted AS (
        |  SELECT bit_count(xor(a.simhash, b.simhash)) AS ham
        |  FROM sim a JOIN sim b ON b.doc_id = a.doc_id + 100000
        |  WHERE a.doc_id % 29 = 0 AND a.doc_id < 100000),
        |np AS (SELECT COUNT(*) AS n_planted FROM planted),
        |codes AS (SELECT simhash, COUNT(*) AS n FROM sim GROUP BY 1),
        |r0 AS (SELECT 0 AS radius, CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS pairs
        |       FROM codes),
        |rx AS (SELECT bit_count(xor(a.simhash, b.simhash)) AS radius,
        |         CAST(SUM(a.n * b.n) AS BIGINT) AS pairs
        |       FROM codes a JOIN codes b ON a.simhash < b.simhash
        |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 4 GROUP BY 1),
        |cum AS (
        |  SELECT radius, SUM(pairs) OVER (ORDER BY radius
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pairs
        |  FROM (SELECT * FROM r0 UNION ALL SELECT * FROM rx)),
        |rr AS (SELECT i.i AS radius FROM generate_series(0, 4) i(i)),
        |tp AS (
        |  SELECT rr.radius,
        |    (SELECT COUNT(*) FROM planted WHERE planted.ham <= rr.radius) AS tp
        |  FROM rr)
        |SELECT tp.radius, CAST(tp.tp AS BIGINT) AS tp,
        |  CAST(COALESCE(cum.cum_pairs, 0) AS BIGINT) AS pred_pairs,
        |  CAST(tp.tp * 1000000 // np.n_planted AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN COALESCE(cum.cum_pairs, 0) > 0
        |    THEN tp.tp * 1000000 // cum.cum_pairs ELSE 0 END AS BIGINT)
        |    AS precision_ppm
        |FROM tp LEFT JOIN cum ON tp.radius = cum.radius CROSS JOIN np
        |ORDER BY tp.radius""".stripMargin) { (s, dir) =>
      import graft.operators.Dedup
      val d0 = Tables(s, dir).documents
      val docs = d0.select("doc_id", "text").unionAll(
        d0.where(col("doc_id") % 29 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            expr("substring(text, 21)").as("text")))
      val sim = Dedup.simhash16(docs, "doc_id", "text").cache()
      val planted = sim.where(col("doc_id") % 29 === 0 && col("doc_id") < 100000)
        .select(col("doc_id").as("d1"), col("simhash").as("h1"))
        .join(sim.select(col("doc_id").as("d2"), col("simhash").as("h2")),
          col("d2") === col("d1") + 100000)
        .select(expr("CAST(bit_count(h1 ^ h2) AS BIGINT)").as("ham"))
      val np = planted.agg(count(lit(1)).as("n_planted"))
      val codes = sim.groupBy("simhash").agg(count(lit(1)).as("n"))
      val r0 = codes.agg(sum(expr("n * (n - 1) div 2")).as("pairs"))
        .select(lit(0L).as("radius"), col("pairs"))
      val rx = codes.select(col("simhash").as("s1"), col("n").as("n1"))
        .join(codes.select(col("simhash").as("s2"), col("n").as("n2")),
          col("s1") < col("s2"))
        .where(expr("bit_count(s1 ^ s2) <= 4"))
        .groupBy(expr("CAST(bit_count(s1 ^ s2) AS BIGINT)").as("radius"))
        .agg(sum(col("n1") * col("n2")).as("pairs"))
      val w = Window.orderBy("radius")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = r0.unionAll(rx)
        .withColumn("cum_pairs", sum(col("pairs")).over(w))
        .select(col("radius").as("cr"), col("cum_pairs"))
      val rr = s.range(0, 5).select(col("id").as("radius"))
      val tp = rr.crossJoin(broadcast(planted))
        .groupBy("radius")
        .agg(sum(when(col("ham") <= col("radius"), 1L).otherwise(0L)).as("tp"))
      tp.join(cum, col("radius") === col("cr"), "left_outer")
        .crossJoin(broadcast(np))
        .select(col("radius"), col("tp"),
          coalesce(col("cum_pairs"), lit(0L)).as("pred_pairs"),
          expr("tp * 1000000 div n_planted").as("recall_ppm"),
          expr("CAST(CASE WHEN COALESCE(cum_pairs, 0) > 0" +
            " THEN tp * 1000000 div cum_pairs ELSE 0 END AS BIGINT)")
            .as("precision_ppm"))
        .orderBy("radius")
    },

    // Tombstone-vacuum advisor (deletion vectors, the lake's GDPR debt):
    // purge keys (the q240 cohort) become tombstones; each 8192-key
    // rowgroup reports its dead-row share and is advised REWRITE above
    // 10% — the merge-on-read → copy-on-write tipping point. The
    // tombstone set joins at key grain once; advice is rowgroup-grain
    // metadata, and the advised-bytes total sizes the vacuum job before
    // it runs on 100 TB.
    QueryDef.sql(
      "q314_tombstone_vacuum",
      """WITH t AS (SELECT o_orderkey AS k FROM orders WHERE o_custkey % 13 = 0),
        |l AS (
        |  SELECT l_orderkey // 8192 AS rg, l_orderkey,
        |    CASE WHEN t.k IS NULL THEN 0 ELSE 1 END AS dead
        |  FROM lineitem LEFT JOIN t ON l_orderkey = t.k),
        |per AS (
        |  SELECT rg, COUNT(*) AS n_rows,
        |    CAST(SUM(dead) AS BIGINT) AS dead_rows
        |  FROM l GROUP BY 1)
        |SELECT CAST(rg AS BIGINT) AS rg, CAST(n_rows AS BIGINT) AS n_rows,
        |  dead_rows,
        |  CAST(dead_rows * 1000000 // n_rows AS BIGINT) AS dead_ppm,
        |  CASE WHEN dead_rows * 10 > n_rows THEN 'rewrite' ELSE 'keep' END
        |    AS advice
        |FROM per ORDER BY rg""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir).orders
        .where(col("o_custkey") % 13 === 0)
        .select(col("o_orderkey").as("k"))
      Tables(s, dir).lineitem
        .join(broadcast(t), col("l_orderkey") === col("k"), "left_outer")
        .select(expr("l_orderkey div 8192").as("rg"),
          when(col("k").isNull, 0L).otherwise(1L).as("dead"))
        .groupBy("rg")
        .agg(count(lit(1)).as("n_rows"), sum(col("dead")).as("dead_rows"))
        .select(col("rg"), col("n_rows"), col("dead_rows"),
          expr("dead_rows * 1000000 div n_rows").as("dead_ppm"),
          when(col("dead_rows") * 10 > col("n_rows"), "rewrite")
            .otherwise("keep").as("advice"))
        .orderBy("rg")
    },

    // Storage-temperature tiering advisor: each part's access frequency
    // (lineitem touches) and recency (last shipdate) map to hot / warm /
    // cold tiers by deterministic thresholds, with per-tier part counts
    // and line mass — the placement table a tiered lake (memory / SSD /
    // object store) derives from the fact log. One fact-grain rollup;
    // the tier rules are pure projection on part-grain aggregates.
    QueryDef.sql(
      "q315_storage_tiering",
      """WITH p AS (
        |  SELECT l_partkey, COUNT(*) AS freq, MAX(l_shipdate) AS last_touch
        |  FROM lineitem GROUP BY 1),
        |mx AS (SELECT MAX(last_touch) AS gmax FROM p),
        |tiered AS (
        |  SELECT l_partkey, freq,
        |    CASE WHEN datediff('day', CAST(last_touch AS DATE), CAST(gmax AS DATE)) <= 365
        |           AND freq >= 8 THEN 'a_hot'
        |         WHEN datediff('day', CAST(last_touch AS DATE), CAST(gmax AS DATE)) <= 1095
        |           THEN 'b_warm'
        |         ELSE 'c_cold' END AS tier
        |  FROM p, mx)
        |SELECT tier, COUNT(*) AS n_parts,
        |  CAST(SUM(freq) AS BIGINT) AS n_lines,
        |  CAST(SUM(freq) * 1000000 // (SELECT SUM(freq) FROM p) AS BIGINT)
        |    AS line_share_ppm
        |FROM tiered GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir).lineitem
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("freq"), max(col("l_shipdate")).as("last_touch"))
      val mx = p.agg(max(col("last_touch")).as("gmax"))
      val tiered = p.crossJoin(broadcast(mx))
        .select(col("freq"),
          when(datediff(to_date(col("gmax")), to_date(col("last_touch"))) <= 365 &&
               col("freq") >= 8, "a_hot")
            .when(datediff(to_date(col("gmax")), to_date(col("last_touch"))) <= 1095,
              "b_warm")
            .otherwise("c_cold").as("tier"))
      val tot = p.agg(sum(col("freq")).as("tf"))
      tiered.groupBy("tier")
        .agg(count(lit(1)).as("n_parts"), sum(col("freq")).as("n_lines"))
        .crossJoin(broadcast(tot))
        .select(col("tier"), col("n_parts"), col("n_lines"),
          expr("n_lines * 1000000 div tf").as("line_share_ppm"))
        .orderBy("tier")
    },

    // Multi-pattern blocklist tagging (round 10): the C4/Dolma-style
    // keyword tagger — a corpus-derived dictionary (top-24 tokens of
    // length >= 5, ties by term) compiled ONCE into a frozen byte-level
    // Aho-Corasick automaton that rides the plan as a reference object;
    // each document is ONE O(len + matches) codegen pass counting every
    // term simultaneously, vs |dict| LIKE scans of the corpus. n_disj is
    // the greedy leftmost non-overlapping count — exactly what
    // left-to-right replace() consumes, which is the oracle's formula.
    QueryDef.sql(
      "q633_blocklist_counts",
      """WITH toks AS (SELECT lower(t.tok) AS term FROM documents d,
        |   unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS t(tok)
        |   WHERE length(t.tok) >= 5),
        |dict AS (SELECT term FROM
        |  (SELECT term, count(*) AS c FROM toks GROUP BY term ORDER BY c DESC, term LIMIT 24)),
        |occ AS (SELECT d.doc_id, t.term,
        |   (length(lower(d.text)) - length(replace(lower(d.text), t.term, ''))) // length(t.term) AS n
        | FROM documents d CROSS JOIN dict t)
        |SELECT doc_id, term, CAST(n AS BIGINT) AS n_disj
        |FROM occ WHERE n > 0 ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val dict = graft.operators.Blocklist.topTermDictionary(docs, "text", 24, 5)
      graft.operators.Blocklist.matchCounts(docs, "doc_id", "text", dict)
        .select("doc_id", "term", "n_disj")
        .orderBy("doc_id", "term")
    },

    // The OVERLAPPING count semantic of the same single pass, proven
    // against a position-by-position oracle on a doc subset (the oracle
    // is O(len·|dict|) per doc — Spark's pass stays O(len + matches)).
    // A planted self-overlapping term ('aba' against an appended
    // 'abab...' tail) makes olap > disj real on fixture data: 'ab'×m
    // contains m-1 overlapping 'aba's but only ceil((m-1)/2) disjoint
    // ones. The dictionary derives from the ORIGINAL text so the planted
    // tail cannot perturb the top-K cut.
    QueryDef.sql(
      "q634_blocklist_overlap",
      """WITH toks AS (SELECT lower(t.tok) AS term FROM documents d,
        |   unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS t(tok)
        |   WHERE length(t.tok) >= 5),
        |dict AS (SELECT term FROM
        |  (SELECT term, count(*) AS c FROM toks GROUP BY term ORDER BY c DESC, term LIMIT 24)
        |  UNION SELECT 'aba'),
        |md AS (SELECT doc_id, lower(text || ' ' || repeat('ab', CAST(doc_id % 4 AS INT) + 1)) AS lt
        |       FROM documents WHERE doc_id % 37 = 0),
        |occ AS (SELECT m.doc_id, t.term,
        |   len(list_filter(range(1, length(m.lt) - length(t.term) + 2),
        |       i -> substr(m.lt, CAST(i AS INT), CAST(length(t.term) AS INT)) = t.term)) AS n_olap,
        |   (length(m.lt) - length(replace(m.lt, t.term, ''))) // length(t.term) AS n_disj
        | FROM md m CROSS JOIN dict t)
        |SELECT doc_id, term, CAST(n_olap AS BIGINT) AS n_olap, CAST(n_disj AS BIGINT) AS n_disj
        |FROM occ WHERE n_olap > 0 ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val dict0 = graft.operators.Blocklist.topTermDictionary(docs, "text", 24, 5)
      val dict = (dict0 :+ "aba").distinct.sorted
      val mod = docs.where(col("doc_id") % 37 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" "),
            expr("repeat('ab', CAST(doc_id % 4 AS INT) + 1)")).as("text"))
      graft.operators.Blocklist.matchCounts(mod, "doc_id", "text", dict)
        .orderBy("doc_id", "term")
    },

    // The blocklist GATE: per-document verdict at a hits-density
    // threshold (hits per 10k chars, integer-exact div) — the form a
    // curation waterfall composes. Every document appears, zero-hit docs
    // pass with zeros; threshold 900 splits the fixture corpus near its
    // median so both verdicts are populated at every SF.
    QueryDef.sql(
      "q635_blocklist_filter",
      """WITH toks AS (SELECT lower(t.tok) AS term FROM documents d,
        |   unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS t(tok)
        |   WHERE length(t.tok) >= 5),
        |dict AS (SELECT term FROM
        |  (SELECT term, count(*) AS c FROM toks GROUP BY term ORDER BY c DESC, term LIMIT 24)),
        |base AS (SELECT d.doc_id, length(d.text) AS n_chars, lower(d.text) AS lt FROM documents d),
        |hit AS (SELECT b.doc_id, t.term,
        |   (length(b.lt) - length(replace(b.lt, t.term, ''))) // length(t.term) AS n
        | FROM base b CROSS JOIN dict t),
        |agg AS (SELECT doc_id, sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS n_terms,
        |        sum(n) AS n_hits FROM hit GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n_chars AS BIGINT) AS n_chars,
        |  CAST(a.n_terms AS BIGINT) AS n_terms, CAST(a.n_hits AS BIGINT) AS n_hits,
        |  CAST(CASE WHEN b.n_chars > 0 THEN (10000 * a.n_hits) // b.n_chars ELSE 0 END AS BIGINT) AS hits_per_10k,
        |  CAST(CASE WHEN (CASE WHEN b.n_chars > 0 THEN (10000 * a.n_hits) // b.n_chars ELSE 0 END) <= 900
        |       THEN 1 ELSE 0 END AS INT) AS pass
        |FROM base b JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val dict = graft.operators.Blocklist.topTermDictionary(docs, "text", 24, 5)
      graft.operators.Blocklist.summary(docs, "doc_id", "text", dict, maxPer10k = 900)
        .orderBy("doc_id")
    },

    // The blocklist REDACTION pass: leftmost-longest non-overlapping
    // span removal (FlashText's rule) in one automaton pass; the oracle
    // REPLAYS the greedy policy with a recursive CTE + LATERAL argmin
    // over the candidate-match relation and splices the survivors with
    // windowed segments. The 'ab'/'aba' planted pair forces the
    // longest-at-same-start preference on the appended 'abab…' tails.
    QueryDef.sql(
      "q636_blocklist_scrub",
      """WITH RECURSIVE toks AS (SELECT lower(t.tok) AS term FROM documents d,
        |   unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS t(tok)
        |   WHERE length(t.tok) >= 5),
        |dict AS (SELECT term FROM
        |  (SELECT term, count(*) AS c FROM toks GROUP BY term ORDER BY c DESC, term LIMIT 24)
        |  UNION SELECT 'ab' UNION SELECT 'aba'),
        |md AS (SELECT doc_id, lower(text || ' ' || repeat('ab', CAST(doc_id % 4 AS INT) + 1)) AS lt
        |       FROM documents WHERE doc_id % 37 = 0),
        |cand AS (SELECT m.doc_id, CAST(s.start AS BIGINT) AS start, length(t.term) AS len
        |  FROM md m CROSS JOIN dict t,
        |  unnest(list_filter(range(1, length(m.lt) - length(t.term) + 2),
        |      i -> substr(m.lt, CAST(i AS INT), CAST(length(t.term) AS INT)) = t.term)) AS s(start)),
        |sel AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS sel_start, CAST(0 AS BIGINT) AS sel_len,
        |         CAST(0 AS BIGINT) AS last_end
        |  FROM md
        |  UNION ALL
        |  SELECT s.doc_id, b.start, b.len, b.start + b.len - 1
        |  FROM sel s JOIN LATERAL (
        |    SELECT c.start, CAST(c.len AS BIGINT) AS len FROM cand c
        |    WHERE c.doc_id = s.doc_id AND c.start > s.last_end
        |    ORDER BY c.start ASC, c.len DESC LIMIT 1) b ON true),
        |spans AS (SELECT doc_id, sel_start, sel_len FROM sel WHERE sel_len > 0),
        |seg AS (SELECT m.doc_id, m.lt, s.sel_start, s.sel_len,
        |    coalesce(lag(s.sel_start + s.sel_len) OVER (PARTITION BY s.doc_id ORDER BY s.sel_start), 1) AS seg_from
        |  FROM md m JOIN spans s ON s.doc_id = m.doc_id),
        |pieces AS (
        |  SELECT doc_id, sel_start AS ord,
        |    substr(lt, CAST(seg_from AS INT), CAST(sel_start - seg_from AS INT)) AS piece
        |  FROM seg
        |  UNION ALL
        |  SELECT m.doc_id, CAST(length(m.lt) + 1 AS BIGINT),
        |    substr(m.lt, CAST(coalesce(mx.tail_from, 1) AS INT)) AS piece
        |  FROM md m LEFT JOIN
        |    (SELECT doc_id, max(sel_start + sel_len) AS tail_from FROM spans GROUP BY doc_id) mx
        |    ON mx.doc_id = m.doc_id),
        |cl AS (SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS cleaned FROM pieces GROUP BY doc_id)
        |SELECT m.doc_id, c.cleaned,
        |  CAST(coalesce(ns.n, 0) AS BIGINT) AS n_spans,
        |  CAST(length(m.lt) - length(c.cleaned) AS BIGINT) AS n_removed
        |FROM md m JOIN cl c ON c.doc_id = m.doc_id
        |LEFT JOIN (SELECT doc_id, count(*) AS n FROM spans GROUP BY doc_id) ns ON ns.doc_id = m.doc_id
        |ORDER BY m.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val dict0 = graft.operators.Blocklist.topTermDictionary(docs, "text", 24, 5)
      val dict = (dict0 ++ Seq("ab", "aba")).distinct.sorted
      val mod = docs.where(col("doc_id") % 37 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" "),
            expr("repeat('ab', CAST(doc_id % 4 AS INT) + 1)")).as("text"))
      graft.operators.Blocklist.scrub(mod, "doc_id", "text", dict)
        .orderBy("doc_id")
    },

    // DICTIONARY GROWTH as an ingestion-loop leg: adding terms to the
    // blocklist re-tags only candidate documents — those whose persisted
    // character-4-gram postings contain ALL of the new term's grams (a
    // containment-complete prefilter) — then verifies exactly on that
    // subset; the corpus is never rescanned. The new terms are the TWO
    // RAREST eligible tokens (deterministic ties) — the fixture
    // vocabulary is small, and rare terms are exactly the delta case
    // that rewards index selectivity. The oracle recomputes both count
    // semantics over the FULL corpus from raw text — equality proves the
    // index path loses nothing and over-claims nothing.
    QueryDef.sql(
      "q637_blocklist_delta",
      """WITH toks AS (SELECT lower(t.tok) AS term FROM documents d,
        |   unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS t(tok)
        |   WHERE length(t.tok) >= 5),
        |nt AS (SELECT term FROM
        |  (SELECT term, count(*) AS c FROM toks GROUP BY term ORDER BY c ASC, term ASC LIMIT 2)),
        |occ AS (SELECT d.doc_id, t.term,
        |   len(list_filter(range(1, length(lower(d.text)) - length(t.term) + 2),
        |       i -> substr(lower(d.text), CAST(i AS INT), CAST(length(t.term) AS INT)) = t.term)) AS n_olap,
        |   (length(lower(d.text)) - length(replace(lower(d.text), t.term, ''))) // length(t.term) AS n_disj
        | FROM documents d CROSS JOIN nt t)
        |SELECT doc_id, term, CAST(n_olap AS BIGINT) AS n_olap, CAST(n_disj AS BIGINT) AS n_disj
        |FROM occ WHERE n_olap > 0 ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val newTerms = docs
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
        .where(length(col("term")) >= 5)
        .groupBy("term").agg(count(lit(1)).as("c"))
        .orderBy(col("c").asc, col("term").asc)
        .limit(2).collect().map(_.getString(0)).toSeq
      val postings = graft.operators.Blocklist.gramPostings(docs, "doc_id", "text")
      graft.operators.Blocklist
        .termDeltaCounts(postings, docs, "doc_id", "text", newTerms)
        .orderBy("doc_id", "term")
    })
}

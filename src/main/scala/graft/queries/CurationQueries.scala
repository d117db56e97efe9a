package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

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
    })
}

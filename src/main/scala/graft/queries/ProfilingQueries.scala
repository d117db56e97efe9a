package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.Skew

/** Data-profiling and skew-engineering operators (round 4, q215+).
  *
  * The reference's data_scan / assess modes are column-profiling jobs
  * (SURVEY §2.4 A5/A6: classify NUMBER columns, inventory extremes); these
  * queries generalize that to the Deequ-style one-pass numeric profile a
  * 100 TB lakehouse runs before every migration, plus the salted-join
  * companion to q86's salted aggregation.
  */
object ProfilingQueries {

  def all: Seq[QueryDef] = Seq(

    // One-pass numeric column profile (reference data_scan flavor,
    // database/taskflow/data_scan.go): per column — rows, NDV, min, max,
    // sum — for six lineitem columns rendered to exact BIGINT domains
    // (cents / pct / epoch seconds). The stack() generator unpivots
    // IN-ROW, so the fact table is scanned ONCE regardless of how many
    // columns are profiled (the oracle's UNION ALL scans per column; at
    // 100 TB the single-scan shape is the entire point). One hash
    // aggregate, map-side combined; count_distinct per group is
    // expand-based but bounded by the stacked row count.
    QueryDef.sql(
      "q215_numeric_profile",
      """WITH p AS (
        |  SELECT 'l_orderkey' AS col_name, l_orderkey AS v FROM lineitem
        |  UNION ALL SELECT 'l_quantity', CAST(FLOOR(l_quantity) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_extprice_cents', CAST(FLOOR(l_extendedprice * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_discount_pct', CAST(FLOOR(l_discount * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_tax_pct', CAST(FLOOR(l_tax * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_ship_epoch', CAST(epoch(l_shipdate) AS BIGINT) FROM lineitem)
        |SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
        |  CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v,
        |  CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM p GROUP BY col_name ORDER BY col_name""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .select(expr(
          """stack(6,
            |  'l_orderkey', l_orderkey,
            |  'l_quantity', CAST(FLOOR(l_quantity) AS BIGINT),
            |  'l_extprice_cents', CAST(FLOOR(l_extendedprice * 100) AS BIGINT),
            |  'l_discount_pct', CAST(FLOOR(l_discount * 100) AS BIGINT),
            |  'l_tax_pct', CAST(FLOOR(l_tax * 100) AS BIGINT),
            |  'l_ship_epoch', unix_timestamp(l_shipdate)) AS (col_name, v)""".stripMargin))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("v")).as("ndv"),
          min("v").as("min_v"), max("v").as("max_v"), sum("v").as("sum_v"))
        .orderBy("col_name")
    },

    // OHLC bar resampling — the time-series downsampling every metrics
    // pipeline runs: 6-hour bars per event type with open/close picked by
    // one-pass ordered-argmin aggregates (min_by/max_by on a
    // (ts, event_id) struct — no window, no self-join; DuckDB's ordered
    // FIRST/LAST is the same algorithm). Values floor-scaled to cents so
    // the comparison is integer-exact. One shuffle on (type, bar); at
    // 100 TB the bar grain bounds the output, not the input.
    QueryDef.sql(
      "q216_ohlc_bars",
      """SELECT event_type, CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) * 21600 AS bar_start,
        |  first(CAST(FLOOR(value * 100) AS BIGINT) ORDER BY ts, event_id) AS open_c,
        |  CAST(MAX(FLOOR(value * 100)) AS BIGINT) AS high_c,
        |  CAST(MIN(FLOOR(value * 100)) AS BIGINT) AS low_c,
        |  last(CAST(FLOOR(value * 100) AS BIGINT) ORDER BY ts, event_id) AS close_c,
        |  CAST(COUNT(*) AS BIGINT) AS volume,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS notional_c
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bar_start""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .select(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 21600) * 21600).cast("long").as("bar_start"),
          col("ts"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "bar_start")
        .agg(expr("min_by(cents, struct(ts, event_id))").as("open_c"),
          max("cents").as("high_c"), min("cents").as("low_c"),
          expr("max_by(cents, struct(ts, event_id))").as("close_c"),
          count(lit(1)).as("volume"), sum("cents").as("notional_c"))
        .orderBy("event_type", "bar_start")
    },

    // Salted equi-join — the join-side twin of q86's salted aggregation:
    // the build side is replicated `salts` ways, probe rows pick a
    // deterministic salt, and the join runs on (key, salt) so a hot key's
    // probe stream spreads over `salts` reducers instead of funneling one
    // (the manual fallback when AQE's skew split can't help, e.g.
    // broadcast-ineligible build sides). Verified by exact parity with
    // the plain join: revenue cents per order priority.
    QueryDef.sql(
      "q217_salted_join",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val fact = t.lineitem.select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val dim = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(fact, dim, "l_orderkey", "o_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"), sum("cents").as("revenue_c"))
        .orderBy("o_orderpriority")
    },

    // Regex-function surface (SURVEY §2.8's regexp_replace row, widened
    // to the full family a cleaning pipeline leans on): extract / global
    // replace / extract_all-count / rlike over a digit-augmented text.
    // RE2 (DuckDB) has no backreferences, so patterns stay in the common
    // subset. Map-only, codegen'd, sampled to keep the dump small.
    QueryDef.sql(
      "q218_regex_surface",
      """SELECT doc_id,
        |  regexp_extract(text || ' tok' || CAST(doc_id AS VARCHAR), '([0-9]+)', 1) AS first_num,
        |  len(regexp_extract_all(text, '[aeiou]+')) AS n_vowel_runs,
        |  length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_consonant_chars,
        |  regexp_matches(text, '(ll|ee|oo|ss)') AS has_double,
        |  len(regexp_extract_all(text, '\b[a-z]{5,}\b')) AS n_long_words
        |FROM documents WHERE doc_id % 97 = 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .where(col("doc_id") % 97 === 0)
        .select(col("doc_id"),
          regexp_extract(concat(col("text"), lit(" tok"), col("doc_id")),
            "([0-9]+)", 1).as("first_num"),
          size(expr("regexp_extract_all(text, '[aeiou]+', 0)")).cast("long")
            .as("n_vowel_runs"),
          length(regexp_replace(col("text"), "[aeiou]", "")).cast("long")
            .as("n_consonant_chars"),
          col("text").rlike("(ll|ee|oo|ss)").as("has_double"),
          size(expr("regexp_extract_all(text, '\\\\b[a-z]{5,}\\\\b', 0)")).cast("long")
            .as("n_long_words"))
        .orderBy("doc_id")
    },

    // Array-function surface beyond q112's lambda HOFs: sort / distinct /
    // element_at / slice / join / position — the in-row vocabulary for
    // token-array feature engineering. DuckDB's list_distinct does NOT
    // preserve first-occurrence order (probed), so every rendered form is
    // sorted first; all outputs are scalars so the differential hash
    // stays nested-type-free. Map-only.
    QueryDef.sql(
      "q219_array_surface",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |           WHERE doc_id % 53 = 0)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
        |  list_sort(ws)[1] AS first_sorted,
        |  list_sort(ws)[-1] AS last_sorted,
        |  array_to_string(list_slice(list_sort(list_distinct(ws)), 2, 4), ' ') AS mid_slice,
        |  CAST(COALESCE(list_position(list_sort(list_distinct(ws)), 'table'), 0) AS BIGINT) AS pos_table
        |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .where(col("doc_id") % 53 === 0)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
          element_at(array_sort(col("ws")), 1).as("first_sorted"),
          element_at(array_sort(col("ws")), -1).as("last_sorted"),
          array_join(slice(array_sort(array_distinct(col("ws"))), 2, 3), " ")
            .as("mid_slice"),
          coalesce(array_position(array_sort(array_distinct(col("ws"))), "table"),
            lit(0L)).as("pos_table"))
        .orderBy("doc_id")
    },

    // Last-touch attribution — the ad-analytics join every event
    // warehouse runs: each purchase is credited to the same user's most
    // recent view/click/signup within 24 h (else 'direct'). One window
    // pass carries (touch ts, touch type) per user via IGNORE-NULLS
    // last_value over the preceding frame — no purchase×touch self-join,
    // so cost is one shuffle on user_id regardless of touch volume.
    // Revenue floor-scaled to cents; latency summed in exact seconds.
    QueryDef.sql(
      "q220_attribution",
      """WITH c AS (
        |  SELECT event_type, ts, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER w AS touch_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
        |      OVER w AS touch_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |a AS (
        |  SELECT CASE WHEN touch_ts IS NOT NULL
        |                AND epoch_us(ts) - epoch_us(touch_ts) <= 86400000000
        |              THEN touch_type ELSE 'direct' END AS channel,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN touch_ts IS NOT NULL
        |           AND epoch_us(ts) - epoch_us(touch_ts) <= 86400000000
        |         THEN (epoch_us(ts) - epoch_us(touch_ts)) // 1000000 ELSE 0 END AS lat_s
        |  FROM c WHERE event_type = 'purchase')
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(cents) AS BIGINT) AS revenue_c,
        |  CAST(SUM(lat_s) AS BIGINT) AS latency_s
        |FROM a GROUP BY channel ORDER BY channel""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val c = Tables(s, dir).events
        .withColumn("touch_type",
          last(when(col("event_type") =!= "purchase", col("event_type")), true).over(w))
        .withColumn("touch_ts",
          last(when(col("event_type") =!= "purchase", col("ts")), true).over(w))
        .where(col("event_type") === "purchase")
      val attributed = col("touch_ts").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("touch_ts")) <= 86400000000L
      c.select(
          when(attributed, col("touch_type")).otherwise("direct").as("channel"),
          floor(col("value") * 100).cast("long").as("cents"),
          when(attributed,
            expr("(unix_micros(ts) - unix_micros(touch_ts)) div 1000000"))
            .otherwise(0L).as("lat_s"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"), sum("cents").as("revenue_c"),
          sum("lat_s").as("latency_s"))
        .orderBy("channel")
    },

    // Incremental corpus ingestion — the production shape of exact dedup
    // (q24) once a corpus becomes append-only: a new batch is deduped
    // WITHIN itself (first doc_id wins per fingerprint) and AGAINST the
    // historical fingerprint store, without ever rescanning history text.
    // History is fingerprints-only (md5), so at 100 TB the anti-join
    // probe carries 16 bytes/doc; batch-internal winners come from one
    // window over the (small) batch. Split rule: doc_id%10<8 = history.
    QueryDef.sql(
      "q221_incremental_ingest",
      """WITH d AS (SELECT doc_id, source, md5(text) AS fp,
        |             doc_id % 10 < 8 AS is_hist FROM documents),
        |h AS (SELECT DISTINCT fp FROM d WHERE is_hist),
        |b AS (SELECT doc_id, source, fp,
        |        MIN(doc_id) OVER (PARTITION BY fp) AS winner
        |      FROM d WHERE NOT is_hist),
        |s AS (SELECT source,
        |        CASE WHEN doc_id <> winner THEN 'dup_batch'
        |             WHEN fp IN (SELECT fp FROM h) THEN 'dup_history'
        |             ELSE 'ingested' END AS status
        |      FROM b)
        |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n
        |FROM s GROUP BY 1, 2 ORDER BY source, status""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), md5(col("text")).as("fp"),
          (col("doc_id") % 10 < 8).as("is_hist"))
      val histFp = d.where(col("is_hist")).select("fp").distinct()
        .withColumn("in_hist", lit(true))
      val batch = d.where(!col("is_hist"))
        .withColumn("winner", min("doc_id").over(Window.partitionBy("fp")))
      batch.join(histFp, Seq("fp"), "left")
        .select(col("source"),
          when(col("doc_id") =!= col("winner"), "dup_batch")
            .when(col("in_hist"), "dup_history")
            .otherwise("ingested").as("status"))
        .groupBy("source", "status").agg(count(lit(1)).as("n"))
        .orderBy("source", "status")
    },

    // Zone-map data skipping — the file-statistics pruning every
    // lakehouse format (Delta/Iceberg/Hudi) does before Spark ever
    // schedules a task: per synthetic file (512 orderkeys), min/max
    // l_shipdate zone maps; a date-range predicate then skips every file
    // whose [min,max] misses the range. The audit column proves
    // losslessness IN-PLAN: matching rows inside skippable files must be
    // zero. One aggregate builds the maps; file grain bounds the output.
    QueryDef.sql(
      "q222_zone_map_skipping",
      """WITH f AS (
        |  SELECT l_orderkey // 512 AS file_id,
        |    MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi, COUNT(*) AS n_rows,
        |    SUM(CASE WHEN l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |          AND TIMESTAMP '1997-06-30 23:59:59' THEN 1 ELSE 0 END) AS n_match
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT file_id, n_rows, n_match,
        |        hi < TIMESTAMP '1997-01-01 00:00:00'
        |          OR lo > TIMESTAMP '1997-06-30 23:59:59' AS can_skip FROM f)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(CASE WHEN can_skip THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        |  CAST(SUM(n_rows) AS BIGINT) AS rows_total,
        |  CAST(SUM(CASE WHEN can_skip THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
        |  CAST(SUM(n_match) AS BIGINT) AS rows_matching,
        |  CAST(SUM(CASE WHEN can_skip THEN n_match ELSE 0 END) AS BIGINT) AS skipped_matches
        |FROM g""".stripMargin) { (s, dir) =>
      val lo = to_timestamp(lit("1997-01-01 00:00:00"))
      val hi = to_timestamp(lit("1997-06-30 23:59:59"))
      val f = Tables(s, dir).lineitem
        .groupBy(expr("l_orderkey div 512").as("file_id"))
        .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"),
          count(lit(1)).as("n_rows"),
          sum(when(col("l_shipdate").between(lo, hi), 1L).otherwise(0L)).as("n_match"))
        .withColumn("can_skip", col("hi") < lo || col("lo") > hi)
      f.agg(count(lit(1)).as("n_files"),
          sum(when(col("can_skip"), 1L).otherwise(0L)).as("n_skipped"),
          sum("n_rows").as("rows_total"),
          sum(when(col("can_skip"), col("n_rows")).otherwise(0L)).as("rows_skipped"),
          sum("n_match").as("rows_matching"),
          sum(when(col("can_skip"), col("n_match")).otherwise(0L)).as("skipped_matches"))
    },

    // Vocabulary coverage / OOV rate — the tokenizer-fit check before
    // training: build the global top-30 vocabulary (count desc, word asc
    // tie-break), then measure per source what fraction of token
    // OCCURRENCES falls outside it. Token traffic is aggregated to
    // (source, word) grain FIRST, so the vocab probe joins word types,
    // not token instances — at 100 TB that's the difference between
    // joining millions and joining trillions of rows; the vocab side
    // broadcasts. Exact ppm via BIGINT products.
    QueryDef.sql(
      "q223_vocab_oov",
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |sw AS (SELECT source, w, COUNT(*) AS n FROM t GROUP BY 1, 2),
        |g AS (SELECT w, SUM(n) AS gn FROM sw GROUP BY 1),
        |v AS (SELECT w FROM (SELECT w, ROW_NUMBER() OVER (ORDER BY gn DESC, w) AS rk
        |                     FROM g) WHERE rk <= 30)
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN w IN (SELECT w FROM v) THEN 0 ELSE n END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN w IN (SELECT w FROM v) THEN 0 ELSE n END) * 1000000
        |       // SUM(n) AS BIGINT) AS oov_ppm
        |FROM sw GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val sw = Tables(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("n"))
      // top-K cut via orderBy().limit() — TakeOrderedAndProject (O(K) per
      // partition), never an unpartitioned window sort over the vocabulary
      // (word types are 10⁸–10⁹ on a web-scale crawl). Deterministic: the
      // ordering key (gn desc, w) is unique per word.
      val vocab = sw.groupBy("w").agg(sum("n").as("gn"))
        .orderBy(col("gn").desc, col("w")).limit(30)
        .select("w").withColumn("in_vocab", lit(true))
      sw.join(broadcast(vocab), Seq("w"), "left")
        .groupBy("source")
        .agg(sum("n").as("n_tokens"),
          sum(when(col("in_vocab"), 0L).otherwise(col("n"))).as("n_oov"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          expr("n_oov * 1000000L div n_tokens").as("oov_ppm"))
        .orderBy("source")
    },

    // Column-overlap schema matching — data discovery's join-key finder
    // (the reference's struct_compare matches columns by NAME,
    // struct_compare_table.go; at lake scale you match by VALUE overlap):
    // candidate key columns from two tables are reduced to distinct
    // (column, value) sets, one equi-join on value counts every
    // intersection in one pass, and containment/Jaccard ppm rank the
    // pairs. Distinct-first keeps the join on value TYPES, not rows.
    QueryDef.sql(
      "q224_column_match",
      """WITH a AS (
        |  SELECT 'l_orderkey' AS col_a, l_orderkey AS v FROM lineitem GROUP BY 1, 2
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem GROUP BY 1, 2
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem GROUP BY 1, 2),
        |b AS (
        |  SELECT 'o_orderkey' AS col_b, o_orderkey AS v FROM orders GROUP BY 1, 2
        |  UNION ALL SELECT 'o_custkey', o_custkey FROM orders GROUP BY 1, 2),
        |sa AS (SELECT col_a, COUNT(*) AS na FROM a GROUP BY 1),
        |sb AS (SELECT col_b, COUNT(*) AS nb FROM b GROUP BY 1),
        |i AS (SELECT col_a, col_b, COUNT(*) AS ni FROM a JOIN b USING (v) GROUP BY 1, 2)
        |SELECT col_a, col_b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(ni AS BIGINT) AS n_common,
        |  CAST(ni * 1000000 // (na + nb - ni) AS BIGINT) AS jaccard_ppm,
        |  CAST(ni * 1000000 // LEAST(na, nb) AS BIGINT) AS containment_ppm
        |FROM i JOIN sa USING (col_a) JOIN sb USING (col_b)
        |ORDER BY jaccard_ppm DESC, col_a, col_b""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val li = t.lineitem
      val a = li.select(lit("l_orderkey").as("col_a"), col("l_orderkey").as("v"))
        .unionAll(li.select(lit("l_partkey").as("col_a"), col("l_partkey").as("v")))
        .unionAll(li.select(lit("l_suppkey").as("col_a"), col("l_suppkey").as("v")))
        .distinct()
      val b = t.orders.select(lit("o_orderkey").as("col_b"), col("o_orderkey").as("v"))
        .unionAll(t.orders.select(lit("o_custkey").as("col_b"), col("o_custkey").as("v")))
        .distinct()
      val sa = a.groupBy("col_a").agg(count(lit(1)).as("na"))
      val sb = b.groupBy("col_b").agg(count(lit(1)).as("nb"))
      a.join(b, "v").groupBy("col_a", "col_b").agg(count(lit(1)).as("ni"))
        .join(broadcast(sa), "col_a").join(broadcast(sb), "col_b")
        .select(col("col_a"), col("col_b"), col("na"), col("nb"),
          col("ni").as("n_common"),
          expr("ni * 1000000L div (na + nb - ni)").as("jaccard_ppm"),
          expr("ni * 1000000L div least(na, nb)").as("containment_ppm"))
        .orderBy(col("jaccard_ppm").desc, col("col_a"), col("col_b"))
    },

    // Physical-layout sort audit — the clustering-quality metric behind
    // every OPTIMIZE/Z-ORDER decision: within each synthetic file
    // (q222's grain), count adjacent l_shipdate inversions in storage
    // order (l_orderkey, l_linenumber, l_shipdate — the fixture has
    // duplicate (orderkey, linenumber) pairs, and suffixing the measured
    // column makes tied prefixes locally ascending, so the count is
    // well-defined under ANY residual tie permutation). A perfectly
    // shipdate-clustered layout has zero; the inversion share tells you
    // whether re-sorting buys zone-map selectivity. One window per file.
    QueryDef.sql(
      "q225_sort_quality",
      """WITH v AS (
        |  SELECT l_orderkey // 512 AS file_id,
        |    CASE WHEN lag(l_shipdate) OVER (PARTITION BY l_orderkey // 512
        |             ORDER BY l_orderkey, l_linenumber, l_shipdate) > l_shipdate
        |         THEN 1 ELSE 0 END AS inv
        |  FROM lineitem),
        |f AS (SELECT file_id, SUM(inv) AS n_inv, COUNT(*) AS n_rows FROM v GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(CASE WHEN n_inv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sorted_files,
        |  CAST(SUM(n_inv) AS BIGINT) AS total_inversions,
        |  CAST(SUM(n_inv) * 1000000 // SUM(n_rows) AS BIGINT) AS inv_ppm
        |FROM f""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(expr("l_orderkey div 512"))
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate")
      val v = Tables(s, dir).lineitem
        .select(expr("l_orderkey div 512").as("file_id"),
          when(lag("l_shipdate", 1).over(w) > col("l_shipdate"), 1L)
            .otherwise(0L).as("inv"))
      v.groupBy("file_id").agg(sum("inv").as("n_inv"), count(lit(1)).as("n_rows"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("n_inv") === 0, 1L).otherwise(0L)).as("n_sorted_files"),
          sum("n_inv").as("total_inversions"),
          sum("n_rows").as("nr"))
        .select(col("n_files"), col("n_sorted_files"), col("total_inversions"),
          expr("total_inversions * 1000000L div nr").as("inv_ppm"))
    },

    // Per-label embedding centroids + pairwise inter-centroid distances —
    // the cluster-health readout after any embedding refresh (which
    // labels collapsed together, which drifted apart). Vectors are
    // floor-scaled to exact integer micros in-row, centroids are integer
    // divisions at (label, dim) grain, and the pairwise join runs over
    // label×dim rows (25 labels × 64 dims — metadata-sized, never the
    // corpus). Top-10 closest pairs by squared micro-distance.
    QueryDef.sql(
      "q226_centroid_pairs",
      """WITH e AS (
        |  SELECT label, i - 1 AS dim,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS micros
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |c AS (SELECT label, dim,
        |        CAST(SUM(micros) AS BIGINT) // COUNT(*) AS cm FROM e GROUP BY 1, 2),
        |p AS (SELECT a.label AS label_a, b.label AS label_b,
        |        SUM((a.cm - b.cm) * (a.cm - b.cm)) AS d2
        |      FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label GROUP BY 1, 2)
        |SELECT label_a, label_b, CAST(d2 AS BIGINT) AS d2
        |FROM p ORDER BY d2, label_a, label_b LIMIT 10""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * 1000000).cast("long").as("micros"))
      val c = e.groupBy("label", "dim")
        .agg(expr("sum(micros) div count(1)").as("cm"))
      val a = c.select(col("label").as("label_a"), col("dim"), col("cm").as("ca"))
      val b = c.select(col("label").as("label_b"), col("dim"), col("cm").as("cb"))
      a.join(b, a("dim") === b("dim") && col("label_a") < col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb"))).as("d2"))
        .orderBy(col("d2"), col("label_a"), col("label_b"))
        .limit(10)
    },

    // Batched repair-statement rendering — the reference's writer packs
    // `batch-size` rows per INSERT (stmt_migrate_row.go:185-258, args
    // flattened cols×batch; q15 renders one statement per row). Rows are
    // bucketed by global rank div 5, each bucket folds its canonical
    // tuples into ONE multi-row VALUES statement with key-ordered
    // determinism (sorted struct collect ≡ DuckDB ordered string_agg).
    // The global window runs AFTER the 1/997 filter — rank cost follows
    // the repair set, never the table.
    QueryDef.sql(
      "q227_repair_batches",
      """WITH r AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS p,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
        |  FROM orders WHERE o_orderkey % 997 = 0)
        |SELECT rn // 5 AS batch_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  'INSERT INTO orders_repair VALUES ' || string_agg(
        |    '(' || k || ',''' || p || ''',' || cents || ')', ',' ORDER BY k) AS stmt
        |FROM r GROUP BY 1 ORDER BY batch_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val r = Tables(s, dir).orders
        .where(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey").as("k"), col("o_orderpriority").as("p"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(Window.orderBy("k")) - 1)
      r.select(expr("rn div 5").as("batch_id"), col("k"),
          concat(lit("("), col("k"), lit(",'"), col("p"), lit("',"),
            col("cents"), lit(")")).as("tuple"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_rows"),
          concat(lit("INSERT INTO orders_repair VALUES "),
            array_join(expr("transform(sort_array(collect_list(struct(k, tuple))), x -> x.tuple)"),
              ",")).as("stmt"))
        .orderBy("batch_id")
    },

    // Event-time lateness profile — the measurement that sizes a
    // streaming watermark (SURVEY §2.9 ST3: the reference's resolvedTs is
    // exact; Spark's withWatermark needs a delay budget): replaying each
    // user's stream in arrival order (event_id), how far behind the
    // running event-time high-water mark does each event land? Per-user
    // windows keep the prefix-max distributed; exact integer seconds are
    // banded into the delay buckets an operator would pick from. The
    // fixture's event_id is already time-ordered, so arrival order is a
    // deterministic interleave (event_id % 7, event_id) — seven fair
    // "partitions" racing, the standard multi-consumer reorder shape.
    QueryDef.sql(
      "q228_lateness_profile",
      """WITH l AS (
        |  SELECT user_id,
        |    (epoch_us(MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id % 7, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - epoch_us(ts))
        |      // 1000000 AS late_s
        |  FROM events),
        |b AS (SELECT user_id,
        |        CASE WHEN late_s = 0 THEN 'a_ontime'
        |             WHEN late_s <= 3600 THEN 'b_1h'
        |             WHEN late_s <= 86400 THEN 'c_1d'
        |             ELSE 'd_later' END AS band,
        |        late_s FROM l)
        |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(MAX(late_s) AS BIGINT) AS max_late_s
        |FROM b GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(expr("event_id % 7"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val l = Tables(s, dir).events
        .select(col("user_id"),
          ((unix_micros(max("ts").over(w)) - unix_micros(col("ts")))
            .divide(lit(1000000L)).cast("long")).as("late_s"))
      // (hwm - ts) is non-negative, so double-divide + cast ≡ floor div
      l.select(col("user_id"), col("late_s"),
          when(col("late_s") === 0, "a_ontime")
            .when(col("late_s") <= 3600, "b_1h")
            .when(col("late_s") <= 86400, "c_1d")
            .otherwise("d_later").as("band"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          max("late_s").as("max_late_s"))
        .orderBy("band")
    },

    // Binary-column manifest — the oracle-checked half of the multimodal
    // path (q32 stubs decode): variable-length binary payloads (unhex of
    // an md5 prefix) flow through BinaryType end-to-end, and the manifest
    // aggregates byte volume, payload NDV, and a magic-byte media class
    // per source — exactly the bookkeeping a 100 TB image/audio lake
    // keeps per partition before any decoder runs. Map-side classify,
    // one aggregate.
    QueryDef.sql(
      "q229_binary_manifest",
      """WITH p AS (
        |  SELECT source,
        |    from_hex(substring(md5(text), 1, (doc_id % 12 + 2) * 2)) AS payload
        |  FROM documents),
        |c AS (SELECT source, payload, octet_length(payload) AS n_bytes,
        |        CASE WHEN substring(upper(hex(payload)), 1, 1) BETWEEN '0' AND '3' THEN 'image'
        |             WHEN substring(upper(hex(payload)), 1, 1) BETWEEN '4' AND '7' THEN 'audio'
        |             WHEN substring(upper(hex(payload)), 1, 1) BETWEEN '8' AND 'B' THEN 'video'
        |             ELSE 'other' END AS kind
        |      FROM p)
        |SELECT source, kind, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(COUNT(DISTINCT payload) AS BIGINT) AS ndv_payload
        |FROM c GROUP BY 1, 2 ORDER BY source, kind""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir).documents
        .select(col("source"),
          unhex(expr("substring(md5(text), 1, CAST((doc_id % 12 + 2) * 2 AS INT))"))
            .as("payload"))
      p.select(col("source"), col("payload"),
          expr("octet_length(payload)").cast("long").as("n_bytes"),
          when(substring(upper(hex(col("payload"))), 1, 1).between("0", "3"), "image")
            .when(substring(upper(hex(col("payload"))), 1, 1).between("4", "7"), "audio")
            .when(substring(upper(hex(col("payload"))), 1, 1).between("8", "B"), "video")
            .otherwise("other").as("kind"))
        .groupBy("source", "kind")
        .agg(count(lit(1)).as("n_files"), sum("n_bytes").as("total_bytes"),
          countDistinct("payload").as("ndv_payload"))
        .orderBy("source", "kind")
    })
}

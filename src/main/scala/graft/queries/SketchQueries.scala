package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Sketch-construction operators (round 4, q260+): mergeable summaries a
  * distributed engine builds in-plan — a Bloom filter materialized as
  * bit_or words, a bounded non-linear recurrence, and the partial-top-k
  * merge contract. All bit-exact across engines (the "sketches" here are
  * deterministic, unlike q163/q165's library sketches, so the oracle can
  * check them value-for-value rather than within tolerance bands).
  */
object SketchQueries {

  def all: Seq[QueryDef] = Seq(

    // Bloom filter built IN-PLAN and audited exactly: member keys hash
    // 3× (salted portable md5) into a 1008-bit filter stored as 16
    // bit_or-aggregated 63-bit words (bit 63 stays clear — no sign games
    // in either engine). The probe side left-joins its 3 (word, bit)
    // pairs against the TINY words relation (16 rows — at 100 TB the
    // sketch broadcasts while the key sets shuffle; this is how q85's
    // bloom-semi-join builds its filter without collecting keys to the
    // driver). False negatives must be exactly 0; the false-positive
    // rate is audited per non-member probe.
    QueryDef.sql(
      "q260_bloom_fpr",
      """WITH cust AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_member
        |  FROM customer),
        |ph AS (
        |  SELECT k, is_member, i,
        |    ('0x' || substr(md5(CAST(k AS VARCHAR) || ':b' || CAST(i AS VARCHAR)),
        |      1, 8))::BIGINT % 1008 AS h
        |  FROM cust CROSS JOIN (VALUES (1), (2), (3)) t(i)),
        |words AS (
        |  SELECT h // 63 AS w,
        |    bit_or(CAST(1 AS BIGINT) << CAST(h % 63 AS INTEGER)) AS m
        |  FROM ph WHERE is_member = 1 GROUP BY 1),
        |hit AS (
        |  SELECT ph.k, ph.is_member,
        |    SUM(CASE WHEN words.m IS NOT NULL AND
        |      (words.m & (CAST(1 AS BIGINT) << CAST(ph.h % 63 AS INTEGER))) <> 0
        |      THEN 1 ELSE 0 END) AS nh
        |  FROM ph LEFT JOIN words ON ph.h // 63 = words.w
        |  GROUP BY 1, 2)
        |SELECT CAST(SUM(is_member) AS BIGINT) AS n_members,
        |  CAST(SUM(CASE WHEN is_member = 1 AND nh < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS false_neg,
        |  CAST(SUM(1 - is_member) AS BIGINT) AS n_nonmembers,
        |  CAST(SUM(CASE WHEN is_member = 0 AND nh = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS false_pos,
        |  CAST(SUM(CASE WHEN is_member = 0 AND nh = 3 THEN 1 ELSE 0 END) * 1000000
        |    // SUM(1 - is_member) AS BIGINT) AS fp_ppm
        |FROM hit""".stripMargin) { (s, dir) =>
      val cust = Tables(s, dir).customer.select(col("c_custkey").as("k"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("is_member"))
      val ph = cust
        .select(col("k"), col("is_member"),
          explode(array(lit(1), lit(2), lit(3))).as("i"))
        .withColumn("h",
          conv(substring(md5(concat(col("k").cast("string"), lit(":b"),
            col("i").cast("string"))), 1, 8), 16, 10).cast("long") % 1008)
      val words = ph.where(col("is_member") === 1)
        .select(expr("h div 63").as("w"),
          expr("shiftleft(1L, CAST(h % 63 AS INT))").as("mask"))
        .groupBy("w").agg(expr("bit_or(mask)").as("m"))
      val hit = ph.join(broadcast(words), expr("h div 63") === col("w"), "left")
        .select(col("k"), col("is_member"),
          when(col("m").isNotNull &&
            expr("m & shiftleft(1L, CAST(h % 63 AS INT))") =!= 0, 1L)
            .otherwise(0L).as("hb"))
        .groupBy("k", "is_member").agg(sum("hb").as("nh"))
      hit.agg(
        sum("is_member").as("n_members"),
        sum(when(col("is_member") === 1 && col("nh") < 3, 1L).otherwise(0L))
          .as("false_neg"),
        sum(lit(1L) - col("is_member")).as("n_nonmembers"),
        sum(when(col("is_member") === 0 && col("nh") === 3, 1L).otherwise(0L))
          .as("false_pos"),
        expr("""CAST(SUM(CASE WHEN is_member = 0 AND nh = 3 THEN 1 ELSE 0 END)
               | * 1000000 div SUM(1 - is_member) AS BIGINT)""".stripMargin)
          .as("fp_ppm"))
    },

    // Capacitated inventory balance — the TWO-SIDED clamp recurrence
    // S_t = max(0, min(cap, S_{t-1} + x_t − k)) (q203's CUSUM is the
    // one-sided half): daily net flows per event type fold in-row over
    // the ≤31-element day array, reporting final/max balance plus the
    // days pinned at either bound (stockout / overflow accounting). The
    // fold is O(days²) on a bounded array — constant work per group
    // regardless of event volume under the fixed 30-day fixture window.
    QueryDef.sql(
      "q261_inventory_clamp",
      """WITH d AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, list(x ORDER BY day) AS xs,
        |    CAST(SUM(x) // COUNT(*) AS BIGINT) AS k FROM d GROUP BY 1),
        |f AS (SELECT event_type, k, 2 * k AS cap,
        |    CAST(len(xs) AS BIGINT) AS n_days,
        |    list_transform(range(1, len(xs) + 1),
        |      i -> list_reduce([CAST(0 AS BIGINT)] || xs[1:i],
        |             (a, b) -> greatest(CAST(0 AS BIGINT),
        |                         least(2 * k, a + b - k)))) AS ss
        |  FROM g)
        |SELECT event_type, n_days, k AS k_cents, CAST(cap AS BIGINT) AS cap_cents,
        |  CAST(ss[CAST(n_days AS INTEGER)] AS BIGINT) AS final_bal,
        |  CAST(list_max(ss) AS BIGINT) AS max_bal,
        |  CAST(len(list_filter(ss, v -> v = 0)) AS BIGINT) AS empty_days,
        |  CAST(len(list_filter(ss, v -> v = cap)) AS BIGINT) AS full_days
        |FROM f ORDER BY event_type""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).events
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      val g = d.groupBy("event_type")
        .agg(expr("transform(sort_array(collect_list(struct(day, x))), s -> s.x)")
          .as("xs"),
          expr("CAST(SUM(x) div COUNT(*) AS BIGINT)").as("k"))
      g.select(col("event_type"), size(col("xs")).cast("long").as("n_days"),
          col("k").as("k_cents"), (col("k") * 2).as("cap"),
          expr("""transform(sequence(1, size(xs)), i ->
                 |  aggregate(slice(xs, 1, i), 0L,
                 |    (a, b) -> greatest(0L, least(2 * k, a + b - k))))""".stripMargin)
            .as("ss"))
        .select(col("event_type"), col("n_days"), col("k_cents"),
          col("cap").as("cap_cents"),
          expr("element_at(ss, CAST(n_days AS INT))").as("final_bal"),
          array_max(col("ss")).as("max_bal"),
          expr("CAST(size(filter(ss, v -> v = 0)) AS BIGINT)").as("empty_days"),
          expr("CAST(size(filter(ss, v -> v = cap)) AS BIGINT)").as("full_days"))
        .orderBy("event_type")
    },

    // Partial-top-k merge audit — the distributed top-k contract: each
    // source reports only its local top-20 words (what a mapper/executor
    // would ship), the coordinator sums the reports and ranks; the truth
    // side ranks the FULL word counts. A truth-top-10 word whose merged
    // count falls short was under-reported by some source (outside that
    // source's local top-20) — exactly the failure mode approximate
    // distributed top-k (q166's sketches) guards against. Word-grain
    // aggregates throughout; the final rankings order the bounded vocab,
    // never document rows.
    QueryDef.sql(
      "q262_topk_merge",
      """WITH w AS (
        |  SELECT source, u.w AS w
        |  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents) d,
        |    UNNEST(d.ws) AS u(w)),
        |sc AS (SELECT source, w, COUNT(*) AS n FROM w GROUP BY 1, 2),
        |rep AS (
        |  SELECT source, w, n FROM (
        |    SELECT source, w, n,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, w) AS r
        |    FROM sc) WHERE r <= 20),
        |merged AS (SELECT w, SUM(n) AS n_merged FROM rep GROUP BY 1),
        |truth AS (SELECT w, SUM(n) AS n_true FROM sc GROUP BY 1),
        |tt AS (SELECT w, n_true,
        |    ROW_NUMBER() OVER (ORDER BY n_true DESC, w) AS r FROM truth)
        |SELECT CAST(tt.r AS BIGINT) AS rank, tt.w AS word,
        |  CAST(tt.n_true AS BIGINT) AS n_true,
        |  CAST(COALESCE(m.n_merged, 0) AS BIGINT) AS n_merged,
        |  COALESCE(m.n_merged, 0) = tt.n_true AS exact_count
        |FROM tt LEFT JOIN merged m ON tt.w = m.w
        |WHERE tt.r <= 10 ORDER BY rank""".stripMargin) { (s, dir) =>
      val words = Tables(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val sc_ = words.groupBy("source", "w").agg(count(lit(1)).as("n"))
      val wsrc = Window.partitionBy("source").orderBy(col("n").desc, col("w"))
      val rep = sc_.withColumn("r", row_number().over(wsrc))
        .where(col("r") <= 20).drop("r")
      val merged = rep.groupBy("w").agg(sum("n").as("n_merged"))
      val truth = sc_.groupBy("w").agg(sum("n").as("n_true"))
      // vocab-grain global window: |word types| rows, bounded metadata
      val wg = Window.orderBy(col("n_true").desc, col("w"))
      val tt = truth.withColumn("rank", row_number().over(wg))
        .where(col("rank") <= 10)
      tt.join(merged, Seq("w"), "left")
        .select(col("rank").cast("long").as("rank"), col("w").as("word"),
          col("n_true"), coalesce(col("n_merged"), lit(0L)).as("n_merged"),
          (coalesce(col("n_merged"), lit(0L)) === col("n_true")).as("exact_count"))
        .orderBy("rank")
    })
}

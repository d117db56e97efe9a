package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Ordered-set / statistical aggregate completeness: discrete quantiles,
  * deterministic mode, linear-regression aggregates, width_bucket
  * histograms, windowed COUNT DISTINCT, and the bool/bit aggregate family.
  *
  * Cross-engine float discipline (same as q98): anything that accumulates
  * floating point goes through exact integer/DECIMAL(38,0) power sums, and
  * the closed-form result is either floor-scaled to BIGINT or a single
  * double expression both engines evaluate identically. Mode ties are
  * broken deterministically (max count, then min value) — the builtin
  * `mode()` of either engine is unspecified under ties, so both sides
  * compute the same argmax explicitly.
  */
object StatsQueries {

  val all: Seq[QueryDef] = Seq(

    // Ordered-set aggregates per event type: interpolated median
    // (quantile_cont convention — exact .0/.5 doubles on integer cents,
    // identical across engines), discrete p25/p75 (the value at 1-based
    // sorted index ceil(n·q) — DuckDB's quantile_disc convention, probed),
    // and deterministic mode of a derived category. The discrete quantile
    // runs distributed: one window pass per group computes row_number +
    // count, a filter keeps the two index rows — no per-group collect.
    // DuckDB's quantile_disc convention (probed) is 1-based index
    // ceil(n·q) of the sorted multiset.
    QueryDef.sql(
      "q152_ordered_set",
      """WITH e AS (SELECT event_type, CAST(FLOOR(value * 1000000.0) AS BIGINT) AS cents
        |  FROM events),
        |q AS (SELECT event_type, median(cents) AS med,
        |        quantile_disc(cents, 0.25) AS p25d, quantile_disc(cents, 0.75) AS p75d
        |      FROM e GROUP BY 1),
        |c AS (SELECT event_type, cents % 7 AS cat, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |m AS (SELECT event_type, MAX(n) AS mx FROM c GROUP BY 1),
        |md AS (SELECT c.event_type, MIN(cat) AS mode_cat
        |       FROM c JOIN m ON c.event_type = m.event_type AND c.n = m.mx GROUP BY 1)
        |SELECT q.event_type, med, p25d, p75d, mode_cat
        |FROM q JOIN md ON q.event_type = md.event_type
        |ORDER BY q.event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * lit(1000000.0)).cast("long").as("cents"))
      val w = Window.partitionBy("event_type").orderBy("cents")
      val ranked = e.select(col("event_type"), col("cents"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("event_type")).as("n"))
      def idx(q: Double): Column = ceil(col("n") * lit(q))
      val disc = ranked
        .where(col("rn") === idx(0.25) || col("rn") === idx(0.75))
        .groupBy("event_type")
        .agg(min(when(col("rn") === idx(0.25), col("cents"))).as("p25d"),
          min(when(col("rn") === idx(0.75), col("cents"))).as("p75d"))
      val med = e.groupBy("event_type").agg(expr("percentile(cents, 0.5D)").as("med"))
      val counts = e.groupBy(col("event_type"), (col("cents") % 7).as("cat"))
        .agg(count(lit(1)).as("n"))
      val mx = counts.groupBy(col("event_type").as("m_et")).agg(max("n").as("mx"))
      val mode = counts
        .join(mx, col("event_type") === col("m_et") && col("n") === col("mx"))
        .groupBy("event_type").agg(min("cat").as("mode_cat"))
      med.join(disc, "event_type").join(mode, "event_type")
        .select("event_type", "med", "p25d", "p75d", "mode_cat")
        .orderBy("event_type")
    },

    // Linear-regression aggregate family (regr_slope / regr_intercept /
    // regr_r2 semantics) from exact DECIMAL(38,0) power sums — one
    // map-side-combined pass, closed forms floor-scaled so both engines
    // agree bit-for-bit. r2 is computed as slope · (Sxy_c / Syy_c) — two
    // exact-ratio divisions and one multiply — to avoid squaring the
    // 38-digit numerator.
    QueryDef.sql(
      "q153_regr_family",
      """WITH sc AS (SELECT l_returnflag AS flag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |      FROM sc GROUP BY flag)
        |SELECT flag, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(1000000.0 * CAST(n*sxy - sx*sy AS DOUBLE)
        |    / CAST(n*sxx - sx*sx AS DOUBLE)) AS BIGINT) AS slope_scaled,
        |  CAST(FLOOR(100.0 * CAST(sy*sxx - sx*sxy AS DOUBLE)
        |    / CAST(n*sxx - sx*sx AS DOUBLE)) AS BIGINT) AS intercept_scaled,
        |  CAST(FLOOR(1000000.0 *
        |    (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) *
        |    (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*syy - sy*sy AS DOUBLE))) AS BIGINT)
        |    AS r2_ppm
        |FROM m ORDER BY flag""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val sc = Tables(s, dir).lineitem.select(
        col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
      val m = sc.groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
      val numxy = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
      val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
      val numInt = (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
      m.select(col("flag"), col("n"),
          floor(lit(1000000.0) * numxy / denx).cast("long").as("slope_scaled"),
          floor(lit(100.0) * numInt / denx).cast("long").as("intercept_scaled"),
          floor(lit(1000000.0) * (numxy / denx) * (numxy / deny)).cast("long").as("r2_ppm"))
        .orderBy("flag")
    },

    // width_bucket histogram of order totals: Spark's native width_bucket
    // expression; the oracle replicates its arithmetic
    // (floor((v-lo)/((hi-lo)/n))+1 with under/overflow buckets 0 and n+1)
    // — verified identical at every fixture SF. One map-side-combined
    // groupBy, the classic profiling scan.
    QueryDef.sql(
      "q154_width_bucket",
      """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
        |       WHEN o_totalprice >= 600000.0 THEN 9
        |       ELSE CAST(FLOOR(o_totalprice / (600000.0 / 8)) AS BIGINT) + 1 END AS BIGINT)
        |    AS bucket,
        |  COUNT(*) AS n,
        |  CAST(MIN(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .select(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(8L))
          .as("bucket"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
        .orderBy("bucket")
    },

    // Windowed COUNT DISTINCT: running number of distinct event types per
    // user in event order. Spark has no DISTINCT window aggregate — the
    // engine side runs size(collect_set() OVER w), which keeps the per-key
    // distinct set bounded (|event types|, small by construction) inside
    // the window state. The sampled user set keeps the dump small; the
    // window itself partitions by user — fully parallel.
    QueryDef.sql(
      "q155_window_distinct",
      """SELECT user_id, event_id,
        |  CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_types
        |FROM events WHERE user_id % 29 = 0
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .where(col("user_id") % 29 === 0)
        .select(col("user_id"), col("event_id"),
          size(collect_set(col("event_type")).over(w)).cast("long").as("n_types"))
        .orderBy("user_id", "event_id")
    },

    // bool_and / bool_or / bit_and / bit_or / bit_xor per group — the
    // screening-aggregate family (every one is map-side combinable; at
    // 100 TB these run as one pass like any sum).
    QueryDef.sql(
      "q156_bool_bit_aggs",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_type,
        |  bool_and(cents >= 0) AS all_nonneg,
        |  bool_or(cents % 1000 = 0) AS any_round,
        |  bit_and(cents) AS band, bit_or(cents) AS bor, bit_xor(cents) AS bxor
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type")
        .agg(bool_and(col("cents") >= 0).as("all_nonneg"),
          bool_or(col("cents") % 1000 === 0).as("any_round"),
          bit_and(col("cents")).as("band"),
          bit_or(col("cents")).as("bor"),
          bit_xor(col("cents")).as("bxor"))
        .orderBy("event_type")
    },

    // Mergeable-sketch NDV rollup (Apache DataSketches HLL via Spark 4's
    // hll_sketch_agg / hll_union_agg): per-group user sketches union into
    // the global NDV WITHOUT rescanning the fact — the re-aggregation
    // property that matters at 100 TB (q60's approx_count_distinct can't
    // roll up). The gate pins each estimate inside ±5% of the exact
    // count computed alongside; the oracle carries the exact counts and
    // TRUE.
    QueryDef.sql(
      "q163_hll_rollup",
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS hll_ok
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val per = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"),
          expr("hll_sketch_agg(user_id)").as("sk"))
      val bound = (est: Column, exact: Column) =>
        abs(est - exact) <= greatest(lit(1L), (exact * lit(5)) / lit(100))
      val perOut = per.select(col("event_type"), col("n_exact"),
        bound(expr("hll_sketch_estimate(sk)"), col("n_exact")).as("hll_ok"))
      val allExact = ev.agg(countDistinct(col("user_id")).as("n_exact"))
      val allOut = per.agg(expr("hll_union_agg(sk)").as("u"))
        .crossJoin(broadcast(allExact))
        .select(lit("ALL").as("event_type"), col("n_exact"),
          bound(expr("hll_sketch_estimate(u)"), col("n_exact")).as("hll_ok"))
      perOut.unionByName(allOut).orderBy("event_type")
    },

    // Time-series gap fill with linear interpolation: per-user hourly
    // value series densified over an in-plan spine (no driver collect),
    // missing hours interpolated between the bracketing observations.
    // The carry of (previous value, previous hour) and (next value, next
    // hour) is last/first IGNORE NULLS over PRECEDING/FOLLOWING frames —
    // one window pass each way; the interpolation itself divides exact
    // integers as doubles and floors, avoiding the floor-vs-truncate
    // integer-division divergence on negative slopes.
    QueryDef.sql(
      "q164_linear_interpolate",
      """WITH e AS (SELECT user_id,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id % 29 = 0),
        |v AS (SELECT user_id, h, CAST(SUM(cents) AS BIGINT) AS v FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM v GROUP BY 1),
        |spine AS (SELECT user_id, h0 + i AS h
        |          FROM b, UNNEST(generate_series(0, h1 - h0)) AS t(i)),
        |j AS (SELECT s.user_id, s.h, v.v FROM spine s
        |      LEFT JOIN v ON s.user_id = v.user_id AND s.h = v.h),
        |f AS (SELECT user_id, h, v,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS ph,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wf AS nh
        |  FROM j
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY h
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY h
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, h, CAST(CASE WHEN v IS NOT NULL THEN v
        |    ELSE pv + CAST(FLOOR(CAST((nv - pv) * (h - ph) AS DOUBLE)
        |                        / CAST(nh - ph AS DOUBLE)) AS BIGINT) END AS BIGINT)
        |  AS v_filled,
        |  (v IS NULL) AS interpolated
        |FROM f ORDER BY user_id, h""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .where(col("user_id") % 29 === 0)
        .select(col("user_id"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000L").as("h"),
          floor(col("value") * 100).cast("long").as("cents"))
      val v = e.groupBy("user_id", "h").agg(sum("cents").as("v"))
      val spine = v.groupBy("user_id").agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val j = spine.join(v, Seq("user_id", "h"), "left_outer")
      val wp = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      j.select(col("user_id"), col("h"), col("v"),
          last(col("v"), ignoreNulls = true).over(wp).as("pv"),
          last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wp).as("ph"),
          first(col("v"), ignoreNulls = true).over(wf).as("nv"),
          first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wf).as("nh"))
        .select(col("user_id"), col("h"),
          when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") +
              floor(((col("nv") - col("pv")) * (col("h") - col("ph"))).cast("double") /
                (col("nh") - col("ph")).cast("double")).cast("long"))
            .as("v_filled"),
          col("v").isNull.as("interpolated"))
        .orderBy("user_id", "h")
    },

    // Theta-sketch set algebra (audience overlap): |A|, |B|, |A∪B|,
    // |A∩B|, |A∖B| of the view/purchase user sets estimated from
    // mergeable theta sketches — at 100 TB each segment keeps one sketch
    // and overlaps come from sketch algebra, not re-joining raw users.
    // Every estimate is gated against the exact set sizes (semi/anti
    // joins) computed alongside; the oracle carries the exact values and
    // TRUE gates. Cardinalities here sit far below the sketch's exact
    // threshold, so the ±5% gates are loose.
    QueryDef.sql(
      "q165_theta_setops",
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
        |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
        |  CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
        |  CAST((SELECT COUNT(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b) u) AS BIGINT) AS n_union,
        |  CAST((SELECT COUNT(*) FROM a WHERE user_id IN (SELECT user_id FROM b)) AS BIGINT) AS n_intersect,
        |  CAST((SELECT COUNT(*) FROM a WHERE user_id NOT IN (SELECT user_id FROM b)) AS BIGINT) AS n_diff,
        |  TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val a = ev.where(col("event_type") === "view").select("user_id").distinct()
      val b = ev.where(col("event_type") === "purchase").select("user_id").distinct()
      val sk = ev.where(col("event_type").isin("view", "purchase"))
        .groupBy("event_type").agg(expr("theta_sketch_agg(user_id)").as("sk"))
        .agg(
          expr("theta_sketch_estimate(theta_union_agg(sk))").as("est_union"),
          expr("theta_sketch_estimate(theta_intersection_agg(sk))").as("est_intersect"),
          expr("theta_sketch_estimate(theta_difference(" +
            "max_by(sk, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), " +
            "max_by(sk, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)))")
            .as("est_diff"))
      val exact = a.agg(count(lit(1)).as("n_a")).crossJoin(b.agg(count(lit(1)).as("n_b")))
        .crossJoin(a.unionByName(b).distinct().agg(count(lit(1)).as("n_union")))
        .crossJoin(a.join(b, Seq("user_id"), "left_semi").agg(count(lit(1)).as("n_intersect")))
        .crossJoin(a.join(b, Seq("user_id"), "left_anti").agg(count(lit(1)).as("n_diff")))
      def ok(est: Column, exact: Column): Column =
        abs(est - exact) <= greatest(lit(1L), (exact * lit(5)) / lit(100))
      exact.crossJoin(broadcast(sk))
        .select(col("n_a"), col("n_b"), col("n_union"), col("n_intersect"), col("n_diff"),
          ok(col("est_union"), col("n_union")).as("union_ok"),
          ok(col("est_intersect"), col("n_intersect")).as("intersect_ok"),
          ok(col("est_diff"), col("n_diff")).as("diff_ok"))
    },

    // Mergeable approximate top-k (Frequent Items sketch): approx_top_k
    // over document tokens, with the accumulate/combine pair being the
    // 100 TB path (per-partition sketches merge like any aggregate). The
    // gate: every exact-top-10 token must appear in the sketch's top-50
    // (near-tied tails reorder freely) with its estimate within 0.1% of
    // the corpus size; the oracle is the exact top-10 by (count desc,
    // token).
    QueryDef.sql(
      "q166_approx_topk",
      """SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS topk_ok FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |WHERE len(tok) > 0
        |GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 10""".stripMargin) { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(10)
      val approx = toks
        .select(expr("approx_top_k_accumulate(tok, 8192)").as("st"))
        .select(expr("approx_top_k_estimate(approx_top_k_combine(st, 8192), 50)").as("arr"))
        .select(explode(col("arr")).as("e"))
        .select(col("e.item").as("a_tok"), col("e.count").as("n_approx"))
      val totalN = toks.agg(count(lit(1)).as("total_n"))
      // Frequent-items guarantee: estimate error ≤ εN; gate at 0.1% of
      // the corpus token count (loose vs the sketch's bound at size 8k).
      exact.join(approx, col("tok") === col("a_tok"), "left_outer")
        .crossJoin(broadcast(totalN))
        .select(col("tok"), col("n_exact"),
          (col("n_approx").isNotNull &&
            abs(col("n_approx") - col("n_exact")) <=
              greatest(lit(1L), expr("total_n div 1000"))).as("topk_ok"))
        .orderBy(col("n_exact").desc, col("tok"))
    },

    // Moving median (robust smoothing): exact interpolated percentile as
    // a WINDOW aggregate over a trailing 10-row frame — Spark evaluates
    // the percentile aggregate per frame, DuckDB its median window; both
    // follow the quantile_cont convention on integer cents, so the
    // half-sums are exact doubles (q74/q152 establish the convention).
    QueryDef.sql(
      "q167_moving_median",
      """SELECT user_id, event_id,
        |  median(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS med_10
        |FROM (SELECT user_id, event_id, ts,
        |        CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events)
        |WHERE user_id % 29 = 0
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
      Tables(s, dir).events
        .where(col("user_id") % 29 === 0)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * 100).cast("long").as("cents"))
        .select(col("user_id"), col("event_id"),
          expr("percentile(cents, 0.5D)").over(w).as("med_10"))
        .orderBy("user_id", "event_id")
    },

    // Sketch rollup along the dimension hierarchy: ONE scan of the fact
    // builds per-nation customer sketches; region and global NDVs come
    // from merging those sketches — never rescanning. The exact counts
    // (computed alongside) gate every level; the oracle carries exact +
    // TRUE. This is the 100 TB "distinct users by any rollup" pattern:
    // sketch once, merge per query.
    QueryDef.sql(
      "q168_sketch_hierarchy",
      """WITH f AS (SELECT o_custkey, n_name, r_name
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey)
        |SELECT level, key, n_exact, TRUE AS hll_ok FROM (
        |  SELECT 'nation' AS level, n_name AS key,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM f GROUP BY n_name
        |  UNION ALL
        |  SELECT 'region', r_name, CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
        |  FROM f GROUP BY r_name
        |  UNION ALL
        |  SELECT 'all', '*', CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM f) t
        |ORDER BY level, key""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val f = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select("o_custkey", "n_name", "r_name")
      val perNation = f.groupBy("n_name", "r_name")
        .agg(countDistinct(col("o_custkey")).as("n_exact"),
          expr("hll_sketch_agg(o_custkey)").as("sk"))
      val exactRegion = f.groupBy(col("r_name").as("er_name"))
        .agg(countDistinct(col("o_custkey")).as("er_exact"))
      val exactAll = f.agg(countDistinct(col("o_custkey")).as("ea_exact"))
      def ok(est: Column, exact: Column): Column =
        abs(est - exact) <= greatest(lit(1L), (exact * lit(5)) / lit(100))
      val nation = perNation.select(lit("nation").as("level"), col("n_name").as("key"),
        col("n_exact"), ok(expr("hll_sketch_estimate(sk)"), col("n_exact")).as("hll_ok"))
      val region = perNation.groupBy("r_name")
        .agg(expr("hll_union_agg(sk)").as("rsk"))
        .join(exactRegion, col("r_name") === col("er_name"))
        .select(lit("region").as("level"), col("r_name").as("key"),
          col("er_exact").as("n_exact"),
          ok(expr("hll_sketch_estimate(rsk)"), col("er_exact")).as("hll_ok"))
      val all = perNation.agg(expr("hll_union_agg(sk)").as("ask"))
        .crossJoin(broadcast(exactAll))
        .select(lit("all").as("level"), lit("*").as("key"),
          col("ea_exact").as("n_exact"),
          ok(expr("hll_sketch_estimate(ask)"), col("ea_exact")).as("hll_ok"))
      nation.unionByName(region).unionByName(all).orderBy("level", "key")
    },

    // Single-pass multi-quantile: one percentile aggregate computes the
    // whole quantile vector (one sort/agg serves k quantiles — at 100 TB
    // you never run k separate percentile jobs). Emitted as (q, value)
    // rows via posexplode; values follow the quantile_cont convention on
    // integer cents (exact doubles, q74/q152).
    QueryDef.sql(
      "q171_multi_quantile",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
        |q AS (SELECT event_type,
        |        quantile_cont(cents, [0.1, 0.25, 0.5, 0.75, 0.9]) AS qs
        |      FROM e GROUP BY 1)
        |SELECT event_type, CAST(i AS BIGINT) AS q_idx, qs[CAST(i AS BIGINT)] AS q_value
        |FROM q, UNNEST(generate_series(1, 5)) AS t(i)
        |ORDER BY event_type, q_idx""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type")
        .agg(expr("percentile(cents, array(0.1D, 0.25D, 0.5D, 0.75D, 0.9D))").as("qs"))
        .select(col("event_type"), posexplode(col("qs")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("q_idx"),
          col("col").as("q_value"))
        .orderBy("event_type", "q_idx")
    },

    // Ratio-to-report (percent of total) at two grains in one pass:
    // each nation's share of its region's revenue and of the global
    // total, as window sums over the aggregated (not raw) rows — the
    // share computation costs |nations|, not |orders|. Exact ppm.
    QueryDef.sql(
      "q172_ratio_to_report",
      """WITH a AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey  = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name, CAST(cents AS BIGINT) AS cents,
        |  CAST(cents * 1000000 // SUM(cents) OVER (PARTITION BY r_name) AS BIGINT)
        |    AS region_share_ppm,
        |  CAST(cents * 1000000 // SUM(cents) OVER () AS BIGINT) AS global_share_ppm
        |FROM a ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val a = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val wr = Window.partitionBy("r_name")
      val wg = Window.partitionBy()
      // cents → decimal(38,0) before the ×10⁶ scaling: DuckDB's SUM promotes
      // to HUGEINT, so the Long product would wrap silently past ~9e12 cents
      // per nation at large SFs while the oracle stays exact (ADVICE r3).
      a.select(col("r_name"), col("n_name"), col("cents"),
          (col("cents").cast("decimal(38,0)") * 1000000).as("__num"),
          sum(col("cents")).over(wr).as("__rtot"),
          sum(col("cents")).over(wg).as("__gtot"))
        .select(col("r_name"), col("n_name"), col("cents"),
          expr("__num div __rtot").as("region_share_ppm"),
          expr("__num div __gtot").as("global_share_ppm"))
        .orderBy("r_name", "n_name")
    },

    // Equi-DEPTH histogram (quantile buckets) per group: ntile(8) over
    // the window assigns near-equal row counts per bucket; output is the
    // per-bucket count and exact value bounds. Complements q67/q154's
    // equi-WIDTH profiles — the standard SQL ntile split rule (first
    // n mod b buckets get the extra row) is identical cross-engine.
    QueryDef.sql(
      "q173_equidepth_histogram",
      """WITH e AS (SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT event_type, cents,
        |        ntile(8) OVER (PARTITION BY event_type ORDER BY cents) AS bucket
        |      FROM e)
        |SELECT event_type, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
        |  CAST(MIN(cents) AS BIGINT) AS lo, CAST(MAX(cents) AS BIGINT) AS hi
        |FROM b GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("cents")
      Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
        .select(col("event_type"), col("cents"), ntile(8).over(w).cast("long").as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"), min("cents").as("lo"), max("cents").as("hi"))
        .orderBy("event_type", "bucket")
    },

    // Cramér's V association strength for two categorical pairs at once
    // (status×priority on orders, segment×nation-band on customer).
    // Builds on q194's exact per-cell chi² (integer ppm over OBSERVED
    // cells — both engines omit the same empty cells, so the convention
    // is consistent): the cell ppm values sum as integers (no double
    // accumulation order to drift), and the only floating step is one
    // sqrt of an exact ratio — IEEE-754 sqrt is correctly rounded, so
    // Spark and DuckDB agree bit-for-bit. All pre-sqrt products stay
    // < 2^53 so the doubles are exact. DECIMAL(38,0) numerators hold to
    // tn ≈ 10⁹; beyond that pre-scale obs/rn/cn (divide by gcd of the
    // margins) before squaring.
    QueryDef.sql(
      "q317_cramers_v",
      """WITH u AS (
        |  SELECT 'status_priority' AS pair, o_orderstatus AS x, o_orderpriority AS y
        |  FROM orders
        |  UNION ALL
        |  SELECT 'segment_nationband', c_mktsegment, CAST(c_nationkey % 5 AS VARCHAR)
        |  FROM customer),
        |o AS (SELECT pair, x, y, COUNT(*) AS obs FROM u GROUP BY 1, 2, 3),
        |r AS (SELECT pair, x, SUM(obs) AS rn FROM o GROUP BY 1, 2),
        |c AS (SELECT pair, y, SUM(obs) AS cn FROM o GROUP BY 1, 2),
        |t AS (SELECT pair, SUM(obs) AS tn, COUNT(DISTINCT x) AS nr,
        |    COUNT(DISTINCT y) AS nc FROM o GROUP BY 1),
        |cells AS (SELECT o.pair,
        |    (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
        |      * (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn) * 1000000
        |      // (CAST(rn AS HUGEINT) * cn * tn) AS cell_ppm
        |  FROM o JOIN r ON o.pair = r.pair AND o.x = r.x
        |  JOIN c ON o.pair = c.pair AND o.y = c.y
        |  JOIN t ON o.pair = t.pair),
        |s AS (SELECT pair, SUM(cell_ppm) AS chi2_ppm FROM cells GROUP BY 1)
        |SELECT s.pair, CAST(tn AS BIGINT) AS n, CAST(nr AS BIGINT) AS n_rows,
        |  CAST(nc AS BIGINT) AS n_cols, CAST(chi2_ppm AS BIGINT) AS chi2_ppm,
        |  CAST(FLOOR(SQRT(CAST(chi2_ppm AS DOUBLE)
        |      / (1000000.0 * CAST(tn AS DOUBLE) * CAST(LEAST(nr - 1, nc - 1) AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) AS v_ppm
        |FROM s JOIN t ON s.pair = t.pair ORDER BY s.pair""".stripMargin) { (s, dir) =>
      val tb = Tables(s, dir)
      val u = tb.orders.select(lit("status_priority").as("pair"),
          col("o_orderstatus").as("x"), col("o_orderpriority").as("y"))
        .unionAll(tb.customer.select(lit("segment_nationband").as("pair"),
          col("c_mktsegment").as("x"), (col("c_nationkey") % 5).cast("string").as("y")))
      val o = u.groupBy("pair", "x", "y").agg(count(lit(1)).as("obs"))
      val r = o.groupBy("pair", "x").agg(sum("obs").as("rn"))
      val c = o.groupBy("pair", "y").agg(sum("obs").as("cn"))
      val t = o.groupBy("pair").agg(sum("obs").as("tn"),
        countDistinct("x").as("nr"), countDistinct("y").as("nc"))
      val cells = o.join(r, Seq("pair", "x")).join(c, Seq("pair", "y"))
        .join(broadcast(t), Seq("pair"))
        .select(col("pair"),
          expr("CAST((CAST(obs AS DECIMAL(38,0)) * tn - CAST(rn AS DECIMAL(38,0)) * cn)" +
            " * (CAST(obs AS DECIMAL(38,0)) * tn - CAST(rn AS DECIMAL(38,0)) * cn)" +
            " * 1000000 div (CAST(rn AS DECIMAL(38,0)) * cn * tn) AS BIGINT)").as("cell_ppm"))
      val chi = cells.groupBy("pair").agg(sum("cell_ppm").as("chi2_ppm"))
      chi.join(broadcast(t), Seq("pair"))
        .select(col("pair"), col("tn").as("n"), col("nr").as("n_rows"),
          col("nc").as("n_cols"), col("chi2_ppm"),
          expr("CAST(FLOOR(SQRT(CAST(chi2_ppm AS DOUBLE)" +
            " / (1000000.0D * CAST(tn AS DOUBLE) * CAST(LEAST(nr - 1, nc - 1) AS DOUBLE)))" +
            " * 1000000.0D) AS BIGINT)").as("v_ppm"))
        .orderBy("pair")
    },

    // Hash-bootstrap confidence interval for the median of per-user
    // spend: 32 deterministic resample replicas — each user's
    // multiplicity in replica b comes from the portable md5 hash of
    // (user_id, b), ≈Poisson(1) truncated to {0,1,2} — so the whole
    // bootstrap is ONE 32× row expansion (constant replication factor:
    // the standard cluster bootstrap; no driver loop, no RNG state).
    // Replica medians use the distributed rank-index pattern with the
    // integer ceil(n/2) index; the CI is the 4th/29th of the 32 sorted
    // replica medians (= p10/p90 under the 1-based ceil convention).
    QueryDef.sql(
      "q325_bootstrap_ci",
      """WITH u AS (SELECT user_id,
        |    SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1),
        |reps AS (SELECT unnest(generate_series(0, 31)) AS b),
        |m AS (SELECT u.user_id, u.cents, reps.b,
        |    ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':'
        |       || CAST(reps.b AS VARCHAR)), 1, 8))::BIGINT % 4 AS h
        |  FROM u, reps),
        |x AS (SELECT b, cents, user_id,
        |    unnest(generate_series(1, CASE WHEN h = 0 THEN 0
        |                                   WHEN h = 1 THEN 2 ELSE 1 END)) AS dup
        |  FROM m),
        |r AS (SELECT b, cents,
        |    row_number() OVER (PARTITION BY b ORDER BY cents, user_id, dup) AS rk,
        |    COUNT(*) OVER (PARTITION BY b) AS n FROM x),
        |med AS (SELECT b, MAX(CASE WHEN rk = (n + 1) // 2 THEN cents END) AS med
        |        FROM r GROUP BY b),
        |mr AS (SELECT med, row_number() OVER (ORDER BY med, b) AS rk FROM med),
        |fs AS (SELECT MAX(CASE WHEN rk = (n + 1) // 2 THEN cents END) AS point
        |  FROM (SELECT cents, row_number() OVER (ORDER BY cents, user_id) AS rk,
        |        COUNT(*) OVER () AS n FROM u) t)
        |SELECT (SELECT COUNT(*) FROM u) AS n_users,
        |  CAST(32 AS BIGINT) AS n_replicas,
        |  CAST((SELECT point FROM fs) AS BIGINT) AS median_scaled,
        |  CAST((SELECT med FROM mr WHERE rk = 4) AS BIGINT) AS ci_lo_scaled,
        |  CAST((SELECT med FROM mr WHERE rk = 29) AS BIGINT) AS ci_hi_scaled""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events.groupBy("user_id")
        .agg(sum(floor(col("value") * 1000000.0).cast("long")).as("cents"))
      val reps = s.range(0, 32).select(col("id").as("b"))
      val m = u.crossJoin(broadcast(reps))
        .withColumn("h",
          expr("CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':'," +
            " CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % 4"))
        .withColumn("mult",
          when(col("h") === 0, 0).when(col("h") === 1, 2).otherwise(1))
        // Spark's sequence(1, 0) DESCENDS (never empty) — filter first
        .where(col("mult") > 0)
      val x = m.select(col("b"), col("cents"), col("user_id"),
        explode(expr("sequence(1, mult)")).as("dup"))
      val r = x.select(col("b"), col("cents"),
        row_number().over(Window.partitionBy("b").orderBy("cents", "user_id", "dup")).as("rk"),
        count(lit(1)).over(Window.partitionBy("b")).as("n"))
      val med = r.groupBy("b")
        .agg(max(when(col("rk") === expr("(n + 1) div 2"), col("cents"))).as("med"))
      val mr = med.select(col("med"),
        row_number().over(Window.orderBy("med", "b")).as("rk"))
      val fr = u.select(col("cents"),
        row_number().over(Window.orderBy("cents", "user_id")).as("rk"),
        count(lit(1)).over(Window.partitionBy()).as("n"))
      val fs = fr.agg(max(when(col("rk") === expr("(n + 1) div 2"), col("cents"))).as("median_scaled"))
      val nU = u.agg(count(lit(1)).as("n_users"))
      nU.crossJoin(fs)
        .crossJoin(mr.where(col("rk") === 4).select(col("med").as("ci_lo_scaled")))
        .crossJoin(mr.where(col("rk") === 29).select(col("med").as("ci_hi_scaled")))
        .select(col("n_users"), lit(32L).as("n_replicas"), col("median_scaled"),
          col("ci_lo_scaled"), col("ci_hi_scaled"))
    },

    // Split-conformal prediction interval: users hash-split 50/50 into
    // calibration and test (portable md5 arm, q310's convention); the
    // point prediction is the calibration mean (integer div), the
    // interval half-width is the ceil((n_cal+1)·0.9)-th smallest
    // absolute residual on calibration — the finite-sample-valid
    // conformal quantile, computed at the integer index
    // (9·n_cal+18) div 10 clamped to n_cal — and the marginal coverage
    // is then measured on the held-out test users in ppm. Everything is
    // integer arithmetic on µ-scaled spend; the residual ranking is the
    // same distributed rank-index pattern as q152/q325.
    QueryDef.sql(
      "q327_conformal_coverage",
      """WITH u AS (SELECT user_id,
        |    SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS y,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':split'), 1, 8))::BIGINT % 2
        |      AS arm
        |  FROM events GROUP BY user_id),
        |cal AS (SELECT user_id, y FROM u WHERE arm = 0),
        |tst AS (SELECT user_id, y FROM u WHERE arm = 1),
        |pred AS (SELECT CAST(SUM(y) // COUNT(*) AS BIGINT) AS p,
        |    COUNT(*) AS n_cal FROM cal),
        |res AS (SELECT abs(y - p) AS r, user_id FROM cal, pred),
        |rr AS (SELECT r, row_number() OVER (ORDER BY r, user_id) AS rk FROM res),
        |qv AS (SELECT CAST(MAX(CASE WHEN rk = LEAST((9 * n_cal + 18) // 10, n_cal)
        |      THEN r END) AS BIGINT) AS q
        |  FROM rr, pred),
        |cov AS (SELECT COUNT(*) AS n_test,
        |    SUM(CASE WHEN abs(y - p) <= q THEN 1 ELSE 0 END) AS n_in
        |  FROM tst, pred, qv)
        |SELECT CAST(n_cal AS BIGINT) AS n_cal, CAST(n_test AS BIGINT) AS n_test,
        |  p AS pred_scaled, q AS half_width_scaled,
        |  CAST(n_in * 1000000 // n_test AS BIGINT) AS coverage_ppm
        |FROM pred, qv, cov""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events.groupBy("user_id")
        .agg(sum(floor(col("value") * 1000000.0).cast("long")).as("y"))
        .withColumn("arm",
          expr("CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':split'))," +
            " 1, 8), 16, 10) AS BIGINT) % 2"))
      val cal = u.where(col("arm") === 0).select("user_id", "y")
      val tst = u.where(col("arm") === 1).select("user_id", "y")
      val pred = cal.agg(expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").as("p"),
        count(lit(1)).as("n_cal"))
      val res = cal.crossJoin(broadcast(pred)).select(abs(col("y") - col("p")).as("r"),
        col("user_id"), col("n_cal"))
      val rr = res.select(col("r"), col("n_cal"),
        row_number().over(Window.orderBy("r", "user_id")).as("rk"))
      val qv = rr.agg(max(when(
        col("rk") === expr("LEAST((9 * n_cal + 18) div 10, n_cal)"), col("r"))).as("q"))
      val cov = tst.crossJoin(broadcast(pred)).crossJoin(broadcast(qv))
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("y") - col("p")) <= col("q"), 1L).otherwise(0L)).as("n_in"))
      pred.crossJoin(qv).crossJoin(cov)
        .select(col("n_cal"), col("n_test"), col("p").as("pred_scaled"),
          col("q").as("half_width_scaled"),
          expr("CAST(n_in * 1000000 div n_test AS BIGINT)").as("coverage_ppm"))
    },

    // Quantile normalization (microarray-style) across event types: each
    // type's values rank within the type, the reference distribution is
    // the cross-type mean at each rank (truncated to the shortest type
    // so every rank has all types present), and every 100th rank of the
    // mapping is emitted. Rank windows partition BY TYPE — parallel —
    // and the rank-grain join is the only cross-type meet; the pattern
    // scales as Σn_t, not Πn_t.
    QueryDef.sql(
      "q328_quantile_normalize",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS cents, event_id
        |  FROM events),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rk
        |  FROM e),
        |n AS (SELECT MIN(cnt) AS n_min, COUNT(*) AS n_types
        |  FROM (SELECT event_type, COUNT(*) AS cnt FROM e GROUP BY 1) t),
        |k AS (SELECT rk, SUM(cents) AS s, COUNT(*) AS c,
        |    MIN(cents) AS lo, MAX(cents) AS hi
        |  FROM r, n WHERE rk <= n_min GROUP BY rk)
        |SELECT CAST(rk AS BIGINT) AS rk,
        |  CAST(s // c AS BIGINT) AS ref_scaled,
        |  CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi
        |FROM k WHERE rk % 100 = 1 ORDER BY rk""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_type"),
          floor(col("value") * 1000000.0).cast("long").as("cents"), col("event_id"))
      val r = e.select(col("event_type"), col("cents"),
        row_number().over(
          Window.partitionBy("event_type").orderBy("cents", "event_id")).as("rk"))
      val n = e.groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .agg(min("cnt").as("n_min"), count(lit(1)).as("n_types"))
      val k = r.crossJoin(broadcast(n)).where(col("rk") <= col("n_min"))
        .groupBy("rk")
        .agg(sum("cents").as("s"), count(lit(1)).as("c"),
          min("cents").as("lo"), max("cents").as("hi"))
      k.where(col("rk") % 100 === 1)
        .select(col("rk"), expr("CAST(s div c AS BIGINT)").as("ref_scaled"),
          col("lo"), col("hi"))
        .orderBy("rk")
    },

    // 1-D k-means (k=4, 2 Lloyd iterations, both UNROLLED so the whole
    // program is one deterministic dataflow): init at the 1/8, 3/8, 5/8,
    // 7/8 discrete quantiles (integer ceil(n·q) indices), assign each
    // user to the nearest centroid (ties to the lower cluster id),
    // update = integer-mean. Per-iteration cost is one broadcast of 4
    // centroids against the user table — the textbook scalable k-means
    // step (assignment is a projection, update a groupBy) — and two
    // fixed iterations keep it a pure query instead of a driver loop.
    QueryDef.sql(
      "q329_kmeans_1d",
      """WITH u AS (SELECT user_id,
        |    SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS y
        |  FROM events GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS n FROM u),
        |r AS (SELECT y, row_number() OVER (ORDER BY y, user_id) AS rk FROM u),
        |c0 AS (
        |  SELECT 0 AS cid, MAX(CASE WHEN rk = (n + 7) // 8 THEN y END) AS c FROM r, nn
        |  UNION ALL
        |  SELECT 1, MAX(CASE WHEN rk = (3 * n + 7) // 8 THEN y END) FROM r, nn
        |  UNION ALL
        |  SELECT 2, MAX(CASE WHEN rk = (5 * n + 7) // 8 THEN y END) FROM r, nn
        |  UNION ALL
        |  SELECT 3, MAX(CASE WHEN rk = (7 * n + 7) // 8 THEN y END) FROM r, nn),
        |a1 AS (SELECT user_id, y, cid FROM (
        |    SELECT u.user_id, u.y, c0.cid,
        |      row_number() OVER (PARTITION BY u.user_id
        |        ORDER BY abs(u.y - c0.c), c0.cid) AS rn
        |    FROM u, c0) t WHERE rn = 1),
        |c1 AS (SELECT cid, CAST(SUM(y) // COUNT(*) AS BIGINT) AS c FROM a1 GROUP BY 1),
        |a2 AS (SELECT user_id, y, cid FROM (
        |    SELECT u.user_id, u.y, c1.cid,
        |      row_number() OVER (PARTITION BY u.user_id
        |        ORDER BY abs(u.y - c1.c), c1.cid) AS rn
        |    FROM u, c1) t WHERE rn = 1)
        |SELECT CAST(cid AS BIGINT) AS cluster_id, COUNT(*) AS n,
        |  CAST(SUM(y) // COUNT(*) AS BIGINT) AS centroid_scaled,
        |  CAST(MIN(y) AS BIGINT) AS lo, CAST(MAX(y) AS BIGINT) AS hi
        |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir).events.groupBy("user_id")
        .agg(sum(floor(col("value") * 1000000.0).cast("long")).as("y"))
      val r = u.select(col("y"), col("user_id"),
        row_number().over(Window.orderBy("y", "user_id")).as("rk"))
        .crossJoin(broadcast(u.agg(count(lit(1)).as("n"))))
      def initC(cid: Int, idx: String) =
        r.agg(max(when(col("rk") === expr(idx), col("y"))).as("c"))
          .select(lit(cid.toLong).as("cid"), col("c"))
      val c0 = initC(0, "(n + 7) div 8")
        .unionAll(initC(1, "(3 * n + 7) div 8"))
        .unionAll(initC(2, "(5 * n + 7) div 8"))
        .unionAll(initC(3, "(7 * n + 7) div 8"))
      def assign(cs: DataFrame) = {
        val wq = Window.partitionBy("user_id")
          .orderBy(abs(col("y") - col("c")).asc, col("cid").asc)
        u.crossJoin(broadcast(cs))
          .withColumn("rn", row_number().over(wq)).where(col("rn") === 1)
          .select(col("user_id"), col("y"), col("cid"))
      }
      val c1 = assign(c0).groupBy("cid")
        .agg(expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").as("c"))
      assign(c1).groupBy(col("cid").as("cluster_id"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").as("centroid_scaled"),
          min("y").as("lo"), max("y").as("hi"))
        .orderBy("cluster_id")
    })
}

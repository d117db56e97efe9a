package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Training-prep operators (round 4, q266+): multimodal frame plumbing and
  * the feature-engineering passes that precede model training. Integer /
  * hex-exact so the DuckDB oracle checks values, not tolerances.
  */
object PrepQueries {

  def all: Seq[QueryDef] = Seq(

    // Binary frame sampling (multimodal plumbing, q32/q229's sibling):
    // documents' bytes stand in for an audio/video blob; fixed-stride
    // 32-byte frames are located IN-ROW (sequence + substring over the
    // hex rendering — a pure projection, no explode) and each frame
    // contributes its 4-byte header. Per blob: byte count, frame count,
    // first/last header, distinct headers. The real decode stays behind
    // the q32 stub; this is the partition-friendly offset arithmetic a
    // frame sampler ships to executors.
    QueryDef.sql(
      "q266_frame_sample",
      """WITH b AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |    hex(CAST(text AS BLOB)) AS hx
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_bytes,
        |    list_transform(range(1, n_bytes - 2, 32),
        |      p -> substr(hx, CAST((p - 1) * 2 + 1 AS INTEGER), 8)) AS frames
        |  FROM b WHERE n_bytes >= 4)
        |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
        |  CAST(len(frames) AS BIGINT) AS n_frames,
        |  frames[1] AS first_hdr, frames[-1] AS last_hdr,
        |  CAST(len(list_distinct(frames)) AS BIGINT) AS ndv_hdr
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val b = Tables(s, dir).documents.select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        hex(col("text").cast("binary")).as("hx"))
      b.where(col("n_bytes") >= 4)
        .select(col("doc_id"), col("n_bytes"),
          expr("""transform(sequence(1L, n_bytes - 3, 32L),
                 |  p -> substring(hx, CAST((p - 1) * 2 + 1 AS INT), 8))""".stripMargin)
            .as("frames"))
        .select(col("doc_id"), col("n_bytes"),
          size(col("frames")).cast("long").as("n_frames"),
          expr("frames[0]").as("first_hdr"),
          expr("element_at(frames, -1)").as("last_hdr"),
          size(array_distinct(col("frames"))).cast("long").as("ndv_hdr"))
        .orderBy("doc_id")
    },

    // Winsorization (clip at p5/p95) per event type — the standard
    // outlier-tamed feature pass: the discrete quantiles come from the
    // q152 distributed machinery (per-group window row_number at the
    // 1-based ceil(n·q) index — never a per-group collect), broadcast
    // back onto the facts, and the clip is a pure projection. Reports
    // n, clipped-row counts, and the exact before/after means.
    QueryDef.sql(
      "q267_winsorize",
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
        |q AS (SELECT event_type, quantile_disc(cents, 0.05) AS lo,
        |    quantile_disc(cents, 0.95) AS hi
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(lo) AS BIGINT) AS p05_c, CAST(MAX(hi) AS BIGINT) AS p95_c,
        |  CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_low,
        |  CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_high,
        |  CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_before_c,
        |  CAST(SUM(GREATEST(lo, LEAST(hi, cents))) // COUNT(*) AS BIGINT)
        |    AS mean_after_c
        |FROM e JOIN q ON e.event_type = q.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events.select(col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy("event_type").orderBy("cents")
      val ranked = e.select(col("event_type"), col("cents"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("event_type")).as("cnt"))
      val q = ranked
        .where(col("rn") === ceil(col("cnt") * 0.05) ||
          col("rn") === ceil(col("cnt") * 0.95))
        .groupBy(col("event_type").as("q_et"))
        .agg(min(when(col("rn") === ceil(col("cnt") * 0.05), col("cents"))).as("lo"),
          min(when(col("rn") === ceil(col("cnt") * 0.95), col("cents"))).as("hi"))
      e.join(broadcast(q), col("event_type") === col("q_et"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("lo").as("p05_c"), max("hi").as("p95_c"),
          sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_clip_low"),
          sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_clip_high"),
          expr("sum(cents) div count(1)").as("mean_before_c"),
          expr("sum(greatest(lo, least(hi, cents))) div count(1)").as("mean_after_c"))
        .orderBy("event_type")
    },

    // Smoothed target encoding — the leakage-prone feature done right at
    // scale: per-category positive rate shrunk toward the global rate
    // with pseudo-count m=50, enc = (pos·10⁶ + m·gp) / (n + m) in exact
    // integer arithmetic (gp is the pre-floored global ppm — both
    // engines replicate the same formula bit-for-bit). One pass for the
    // category stats, a broadcast one-row global, a metadata-sized
    // projection for the encoding table.
    QueryDef.sql(
      "q268_target_encoding",
      """WITH e AS (
        |  SELECT user_id % 20 AS cat,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |c AS (SELECT cat, COUNT(*) AS n, SUM(pos) AS p FROM e GROUP BY 1),
        |g AS (SELECT SUM(p) * 1000000 // SUM(n) AS gp FROM c)
        |SELECT cat, CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS n_pos,
        |  CAST(p * 1000000 // n AS BIGINT) AS raw_ppm,
        |  CAST((p * 1000000 + 50 * gp) // (n + 50) AS BIGINT) AS enc_ppm
        |FROM c CROSS JOIN g ORDER BY cat""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).events.select(
        (col("user_id") % 20).as("cat"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val c = e.groupBy("cat").agg(count(lit(1)).as("n"), sum("pos").as("p"))
      val g = c.agg(expr("sum(p) * 1000000 div sum(n)").as("gp"))
      c.crossJoin(broadcast(g))
        .select(col("cat"), col("n"), col("p").as("n_pos"),
          expr("p * 1000000 div n").as("raw_ppm"),
          expr("(p * 1000000 + 50 * gp) div (n + 50)").as("enc_ppm"))
        .orderBy("cat")
    })
}

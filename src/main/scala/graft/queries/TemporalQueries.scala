package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.TemporalJoins

/** Temporal join operators (as-of, range) — operators Spark lacks
  * natively, composed per the build preference order (TemporalJoins
  * scaladoc has the scale analysis). DuckDB's native ASOF JOIN is the
  * oracle. All time math runs on microsecond longs so both engines see
  * identical values (events.ts is nanosecond parquet; both truncate).
  */
object TemporalQueries {

  val all: Seq[QueryDef] = Seq(

    // As-of join: for each click, the user's latest purchase at or before
    // it (union-and-carry: one shuffle, no n²).
    QueryDef.sql(
      "q53_asof_join",
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS purchase_id
        |           FROM events WHERE event_type = 'purchase' GROUP BY user_id, epoch_us(ts)),
        |c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, p.purchase_id AS last_purchase_id, p.us AS purchase_us
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "us").agg(max("event_id").as("purchase_id"))
        .withColumn("purchase_us", col("us"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "us")
      TemporalJoins.asOfJoin(clicks, purchases, "user_id", "us",
          Seq("purchase_id", "purchase_us"))
        .select(col("event_id"), col("user_id"),
          col("purchase_id").as("last_purchase_id"), col("purchase_us"))
        .orderBy("event_id")
    },

    // Range join: per event, how many of the same user's events landed in
    // the preceding 5 minutes — bucketized to an equi-join (O(n·k), never
    // the nested-loop Spark would plan for a raw non-equi join).
    QueryDef.sql(
      "q54_range_count",
      """SELECT e.event_id, COUNT(f.event_id) AS n_recent
        |FROM events e LEFT JOIN events f
        |  ON e.user_id = f.user_id AND epoch_us(f.ts) > epoch_us(e.ts) - 300000000
        |     AND epoch_us(f.ts) < epoch_us(e.ts)
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      TemporalJoins.recentCount(ev, "user_id", "us", "event_id", 300000000L)
        .orderBy("event_id")
    },
  )
}

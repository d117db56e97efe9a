package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Relational-completeness queries beyond the reference's surface: a user
  * of a general analytics engine expects semi/anti joins, ROLLUP, set
  * operations, and pivots — all Catalyst built-ins, all oracle-checked.
  */
object RelationalQueries {

  val all: Seq[QueryDef] = Seq(

    // EXISTS / NOT EXISTS ≡ left-semi / left-anti joins.
    QueryDef.sql(
      "q48_exists",
      """SELECT c_custkey,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |       THEN 1 ELSE 0 END AS has_orders
        |FROM customer c ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val withO = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit(1L).as("has_orders"))
      val withoutO = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit(0L).as("has_orders"))
      withO.unionAll(withoutO).orderBy("c_custkey")
    },

    // ROLLUP hierarchy totals (status → priority → grand total).
    QueryDef.sql(
      "q49_rollup",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100.0).cast("long")).as("total_cents"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // INTERSECT / EXCEPT (distinct set semantics).
    QueryDef.sql(
      "q50_setops",
      """SELECT 'BOTH' AS side, k FROM (
        |  SELECT l_partkey AS k FROM lineitem INTERSECT SELECT p_partkey FROM part)
        |UNION ALL
        |SELECT 'PART_ONLY', k FROM (
        |  SELECT p_partkey AS k FROM part EXCEPT SELECT l_partkey FROM lineitem)
        |ORDER BY side, k""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val li = t.lineitem.select(col("l_partkey").as("k"))
      val p  = t.part.select(col("p_partkey").as("k"))
      p.intersect(li).select(lit("BOTH").as("side"), col("k"))
        .unionAll(p.except(li).select(lit("PART_ONLY").as("side"), col("k")))
        .orderBy("side", "k")
    },

    // Pivot: event-type counts per user (manual-CASE twin in the oracle so
    // column names match exactly).
    QueryDef.sql(
      "q51_pivot",
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },
  )
}

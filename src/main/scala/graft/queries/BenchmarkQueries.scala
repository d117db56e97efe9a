package graft.queries

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.core.{QueryDef, Tables}
import graft.operators.{BloomPrune, Skew}

/** Multi-join analytical benchmarks (TPC-H classics adapted to the
  * fixture schema) plus scale-technique operators made oracle-checkable:
  * bloom-filter semi-join reduction, salted skew aggregation, and the
  * sketch family (count-min heavy hitters, approximate percentiles)
  * verified against exact answers with explicit error bounds.
  *
  * The TPC-H shapes exercise the planner paths that dominate at 100 TB:
  * selective dim filter -> broadcast or shuffle join choice, join
  * reordering across 4-6 tables, partial aggregation before the final
  * shuffle, and TakeOrderedAndProject for top-N (never a global sort).
  * All sums use the floor-scaling convention (see CoreQueries.dsum).
  */
object BenchmarkQueries {

  /** Exact cross-engine double sum: see CoreQueries.dsum. */
  private def dsum(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale)
    sum(floor(c * lit(f))) / lit(f)
  }

  private val revenueSql =
    "SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 10000.0) AS BIGINT)) / 10000.0"

  private def revenue: Column =
    dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q3 (shipping priority), adapted: the fixture's orders table
    // carries o_orderpriority instead of o_shippriority. Catalyst reorders
    // so the selective customer filter applies before the fact join; the
    // top-10 is TakeOrderedAndProject (per-partition heaps + driver merge
    // of 10 rows), not a global sort.
    QueryDef.sql(
      "q81_tpch_q3",
      s"""SELECT l_orderkey, $revenueSql AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders   ON c_custkey  = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate  > TIMESTAMP '1998-06-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer.where(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") < to_timestamp(lit("1998-06-01")))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > to_timestamp(lit("1998-06-01")))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(revenue.as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 (local supplier volume): 6-way join where the supplier must
    // sit in the customer's nation. region+nation broadcast (tiny at any
    // SF); customer/orders/lineitem/supplier shuffle on their keys with
    // AQE free to re-plan. The c_nationkey = s_nationkey equi-condition is
    // the query's point: it runs as part of the lineitem-supplier join.
    QueryDef.sql(
      "q82_tpch_q5",
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM customer
         |JOIN orders   ON c_custkey   = o_custkey
         |JOIN lineitem ON o_orderkey  = l_orderkey
         |JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1999-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1999-01-01")))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(t.supplier,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q10 (returned items): customers ranked by revenue lost to
    // returns in a window. Group key includes the customer attributes
    // (functionally dependent on c_custkey), so the aggregate carries them
    // without a second join back.
    QueryDef.sql(
      "q83_tpch_q10",
      s"""SELECT c_custkey, c_name, $revenueSql AS revenue, n_name
         |FROM customer
         |JOIN orders   ON c_custkey   = o_custkey
         |JOIN lineitem ON o_orderkey  = l_orderkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .where(col("l_returnflag") === "R")
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(revenue.as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q18 (large-volume customers): HAVING-filtered keys semi-join
    // the fact. The inner aggregate's survivors are few, so Spark
    // broadcast-joins them back against orders — aggregation as a filter,
    // the canonical "reduce before you join" shape.
    QueryDef.sql(
      "q84_tpch_q18",
      """SELECT c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) / 10000.0 AS total_qty
        |FROM customer
        |JOIN orders   ON c_custkey  = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) / 10000.0 > 250.0)
        |GROUP BY c_custkey, o_orderkey, o_orderdate
        |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("q"))
        .where(col("q") > 250.0)
        .select(col("l_orderkey").as("big_orderkey"))
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("o_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .select(col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    },

    // TPC-H Q7 shape (volume shipping): cross-nation trade volume by
    // supplier nation × customer nation × ship year. The fact table
    // streams once through four broadcast dimension joins (nation twice
    // under different aliases); revenue is floor-scaled cents so the
    // double product (price · (1-discount)) crosses engines exactly.
    QueryDef.sql(
      "q134_tpch_q7",
      """WITH v AS (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey  = c_custkey
        |  JOIN supplier ON l_suppkey  = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_nationkey <> n2.n_nationkey)
        |SELECT supp_nation, cust_nation, l_year,
        |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS volume_cents
        |FROM v GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val n1 = t.nation.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t.nation.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .where(col("n1_key") =!= col("n2_key"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
            .as("volume_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q21 shape (waiting suppliers): lines are "late" when shipped
    // more than 90 days after the order date; count, per supplier, the
    // late lines on multi-supplier orders where NO other supplier was
    // late — the correlated EXISTS + NOT EXISTS pair, expressed as
    // semi/anti joins on the engine side (no correlated re-execution).
    QueryDef.sql(
      "q135_tpch_q21",
      """WITH l AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT s.s_name, count(*) AS numwait
        |FROM l l1 JOIN supplier s ON l1.sk = s.s_suppkey
        |WHERE l1.is_late
        |  AND EXISTS (SELECT 1 FROM l l2 WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.is_late)
        |GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val l = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY")).as("is_late"))
      val l1 = l.where(col("is_late"))
      val others = l.select(col("ok").as("o_ok"), col("sk").as("o_sk"))
      val othersLate = l.where(col("is_late"))
        .select(col("ok").as("o_ok"), col("sk").as("o_sk"))
      l1
        .join(others, col("o_ok") === col("ok") && col("o_sk") =!= col("sk"), "left_semi")
        .join(othersLate, col("o_ok") === col("ok") && col("o_sk") =!= col("sk"), "left_anti")
        .join(t.supplier, col("sk") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // TPC-H Q22 shape (global-customer sentiment): customers with balance
    // above the positive-balance average and no RECENT order (none since
    // 1999 — the corpus has no order-less customers), grouped by a
    // key-derived segment. Scalar aggregate subquery (broadcast one-row
    // cross join) + anti join; the average is exact integer division of
    // cents.
    QueryDef.sql(
      "q136_tpch_q22",
      """WITH c AS (SELECT c_custkey, c_custkey % 10 AS seg,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        |a AS (SELECT (sum(cents) // count(*)) AS avg_cents FROM c WHERE cents > 0)
        |SELECT seg, count(*) AS n, CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM c CROSS JOIN a
        |WHERE c.cents > a.avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY seg ORDER BY seg""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val c = t.customer.select(col("c_custkey"), (col("c_custkey") % 10).as("seg"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"))
      val a = c.where(col("cents") > 0)
        .agg(expr("sum(cents) div count(*)").as("avg_cents"))
      c.crossJoin(broadcast(a))
        .where(col("cents") > col("avg_cents"))
        .join(t.orders.where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey")), col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("seg").agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
        .orderBy("seg")
    },

    // Bloom-filter semi-join reduction (BloomPrune): lineitem is pruned by
    // a sketch of the urgent orders' keys before the join, so the join's
    // fact-side input is ~|urgent lineitems| + fpp false positives instead
    // of the full table. The result is exactly the plain join — the oracle
    // IS the unpruned query, which is the operator's correctness contract.
    QueryDef.sql(
      "q85_bloom_prune",
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS ym, $revenueSql AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val urgent = t.orders.where(col("o_orderpriority") === "1-URGENT")
      BloomPrune.prunedEquiJoin(t.lineitem, col("l_orderkey"), urgent, col("o_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("ym")
    },

    // Salted two-phase aggregation over a 3-value (maximally skewed) key:
    // phase 1 spreads each hot key over 16 salted partials, phase 2
    // combines. Identical to the direct groupBy — the oracle is the plain
    // GROUP BY, proving salting is a pure execution-strategy change.
    QueryDef.sql(
      "q86_salted_agg",
      """SELECT l_returnflag,
        |  COUNT(*) AS cnt,
        |  SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Skew.saltedSum(
          Tables(s, dir).lineitem,
          col("l_returnflag"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long"))
        .select(col("k").as("l_returnflag"), col("cnt"),
          (col("sum_v") / lit(100.0)).as("sum_price"))
        .orderBy("l_returnflag")
    },

    // Count-min-sketch heavy hitters: the exact top-20 tokens next to a
    // CMS estimate check. CMS guarantees estimate >= exact and, w.p.
    // `confidence`, estimate <= exact + eps*N — the query materializes
    // that bound as cms_ok, so a drifting sketch fails the gate (same
    // pattern as q60's HLL check). The sketch is one mergeable binary agg
    // (map-side partials), the scale path for "top tokens over 100 TB".
    QueryDef.sql(
      "q87_cms_heavy_hitters",
      """SELECT tok, COUNT(*) AS n_exact, TRUE AS cms_ok
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE len(tok) > 0
        |GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 20""".stripMargin) { (s, dir) =>
      val eps = 1e-4
      val toks = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact")).cache()
      val sketchBytes = toks
        .agg(count_min_sketch(col("tok"), lit(eps), lit(0.99), lit(42)).as("sk"))
        .head().getAs[Array[Byte]](0)
      val cms = CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))
      val totalN = exact.agg(sum(col("n_exact"))).head().getLong(0)
      val bound = math.ceil(eps * totalN).toLong
      val top = exact.orderBy(col("n_exact").desc, col("tok")).limit(20).collect()
      val rows = top.map { r =>
        val (tok, n) = (r.getString(0), r.getLong(1))
        val est = cms.estimateCount(tok)
        (tok, n, est >= n && est <= n + bound)
      }.toSeq
      exact.unpersist()
      import s.implicits._
      rows.toDF("tok", "n_exact", "cms_ok")
        .orderBy(col("n_exact").desc, col("tok"))
    },

    // Approximate percentile next to the exact answer: approx_percentile
    // (Greenwald-Khanna at accuracy 10k) must land between the exact p45
    // and p55 — a rank-error bound, the right contract for a sketch whose
    // guarantee is rank accuracy, not value accuracy. Oracle pins the
    // exact p50 (quantile_cont convention, q74) and TRUE.
    QueryDef.sql(
      "q88_approx_percentile",
      """SELECT event_type, quantile_cont(cents, 0.5) AS p50_exact, TRUE AS approx_ok
        |FROM (SELECT event_type, CAST(FLOOR(value * 1000000.0) AS BIGINT) AS cents
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .select(col("event_type"),
          floor(col("value") * lit(1000000.0)).cast("long").as("cents"))
        .groupBy("event_type")
        .agg(
          expr("percentile(cents, 0.5D)").as("p50_exact"),
          expr("percentile(cents, 0.45D)").as("__p45"),
          expr("percentile(cents, 0.55D)").as("__p55"),
          expr("approx_percentile(cents, 0.5D, 10000)").as("__approx"))
        .select(col("event_type"), col("p50_exact"),
          (col("__approx") >= col("__p45") && col("__approx") <= col("__p55")).as("approx_ok"))
        .orderBy("event_type")
    })
}

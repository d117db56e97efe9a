package graft

import org.apache.spark.sql.functions._

/** Cross-column invariants of the q490+ Atlas batches — properties the
  * DuckDB differential gate can't state (two-pass median ≡ sort median,
  * ceil-log8 exactness, winnowing pair ordering).
  */
class AtlasInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q490 TextTiling valleys are interior and similarities are valid milli") {
    val rows = run("q490_texttiling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_blocks")
      assert(nb >= 2L) // docs with a single block have no boundary rows
      assert(r.getAs[Long]("n_valleys") <= math.max(nb - 2, 0))
      val lo = r.getAs[Long]("min_sim"); val hi = r.getAs[Long]("max_sim")
      assert(lo >= 0L && lo <= hi && hi <= 1000L)
    }
  }

  test("q491 winnowing pairs are ordered, positive, and well-formed") {
    val rows = run("q491_winnowing").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val shared = rows.map(_.getAs[Long]("shared"))
    assert(shared.zip(shared.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("shared") > 0L)
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
    }
  }

  test("q492 two-pass median equals the sort-based order statistic") {
    val rows = run("q492_twopass_median").collect()
    assert(rows.nonEmpty)
    // recompute the ⌈n/2⌉ order statistic by brute sort per type
    val raw = graft.core.Tables(spark, sfDir).events
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("c"))
      .collect().groupBy(_.getAs[String]("event_type"))
      .map { case (k, rs) =>
        val v = rs.map(_.getAs[Long]("c")).sorted
        k -> v((v.length + 1) / 2 - 1)
      }
    rows.foreach { r =>
      assert(r.getAs[Long]("median_cents") == raw(r.getAs[String]("event_type")))
    }
  }

  test("q493 LSM levels are the exact ceil-log8 of the memtable ratio") {
    val rows = run("q493_lsm_advisor").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val ratio = r.getAs[Long]("memtable_ratio")
      val lv = r.getAs[Long]("levels")
      assert(ratio >= 1L)
      assert(r.getAs[Long]("wa_leveled") == 1L + 8L * lv)
      assert(r.getAs[Long]("wa_tiered") == 1L + lv)
      if (lv == 0L) assert(ratio == 1L)
      else {
        assert(BigInt(8).pow(lv.toInt) >= ratio)
        assert(BigInt(8).pow(lv.toInt - 1) < ratio)
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: shrink a huge fact-side scan with a
  * compact sketch of the (already filtered) dim-side keys before the real
  * join.
  *
  * At 100 TB the dominant cost of `fact JOIN dim_filtered` is shuffling
  * fact rows that can never match. A Bloom filter of the dim keys is a
  * few MB regardless of fact size, broadcasts to every executor, and
  * drops non-matching fact rows at the scan — the same idea as Spark's
  * AQE runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter`),
  * made explicit so it applies to any plan shape (multi-stage pipelines,
  * checkpointed intermediates) and any key expression.
  *
  * False positives are possible (rate `fpp`), so the pruned stream MUST
  * still be joined (or anti-joined) exactly afterwards — the filter only
  * reduces volume, it never decides membership. [[prunedEquiJoin]]
  * packages that contract.
  */
object BloomPrune {

  /** Fact rows that might match `dim`'s key set (plus `fpp` false
    * positives). Two dim-side jobs (count, then sketch build) — both are
    * aggregations over the *filtered* dim, by construction much smaller
    * than the fact side.
    */
  def mightMatch(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
      fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(dimKey.cast("long").as("k"))
    val n = math.max(keys.count(), 1L)
    val bloom = keys.stat.bloomFilter("k", n, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val contains = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(contains(factKey.cast("long")))
  }

  /** Equi-join with bloom pre-pruning on the fact side. Exact: the join
    * removes the sketch's false positives, so the result is identical to
    * `fact.join(dim, factKey === dimKey)` — only cheaper, because the
    * join's fact-side shuffle sees ~|matching| rows instead of |fact|.
    */
  def prunedEquiJoin(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
      fpp: Double = 0.01): DataFrame =
    mightMatch(fact, factKey, dim, dimKey, fpp).join(dim, factKey === dimKey)
}

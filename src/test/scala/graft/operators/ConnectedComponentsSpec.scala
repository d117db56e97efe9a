package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  test("path graph + separate clique resolve to min-label components") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5 (diameter 4 — forces several propagation rounds),
    // clique 10-11-12, and an isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("d1", "d2")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) == 1L))
    assert((10L to 12L).forall(comp(_) == 10L))
    assert(comp(20L) == 20L && comp(21L) == 20L)
    assert(comp.size == 10)
  }
}

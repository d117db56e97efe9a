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

  test("deep chain (diameter > maxIter) converges exactly; empty edges OK") {
    val s = spark
    import s.implicits._
    // a 120-vertex path has diameter 119 — far past the default
    // maxIter=50, so plain per-round propagation CANNOT finish: the
    // pre-r9 loop silently returned unconverged labels on this graph
    // (caught by CcBench's 1M chain shape: 13× the true component
    // count). Path-shortcutting must converge it in O(log 119) rounds
    // and label every vertex with the true minimum.
    val pairs = (1L until 120L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 120 && comp.values.forall(_ == 1L),
      s"distinct labels: ${comp.values.toSet}")
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("incremental merge == full CC over old ∪ new pairs, old labels rewritten") {
    val s = spark
    import s.implicits._
    // prior clustering: {1,2}, {5,6}, {10,11}, isolated pair {20,21}
    val oldPairs = Seq((1L, 2L), (5L, 6L), (10L, 11L), (20L, 21L)).toDF("d1", "d2")
    val labels = Dedup.connectedComponents(oldPairs).localCheckpoint()
    // new edges: bridge TWO existing components (2-5 — rewrites {5,6}'s
    // label to 1), attach a new vertex to an existing component (30-10),
    // a brand-new pair (40,41), and a no-op edge inside {20,21}
    val newPairs = Seq((2L, 5L), (30L, 10L), (40L, 41L), (20L, 21L)).toDF("d1", "d2")
    val inc = Dedup.incrementalComponents(labels, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(oldPairs.unionAll(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full, s"inc=$inc full=$full")
    // the bridge rewrote the absorbed component's every member
    assert(inc(5L) == 1L && inc(6L) == 1L)
    // untouched component kept its label; new vertices labeled
    assert(inc(20L) == 20L && inc(21L) == 20L)
    assert(inc(30L) == 10L && inc(40L) == 40L && inc(41L) == 40L)
  }

  test("deep chain MERGE: 120 components bridged pairwise collapse to one label") {
    val s = spark
    import s.implicits._
    // 120 existing 2-member components; the shard bridges them in a
    // chain, so the COLLAPSED meta-graph is itself a 120-vertex path —
    // the meta-CC must survive diameter > maxIter exactly like the
    // corpus loop (the pre-r9 loop would have silently fragmented this
    // merge into ~maxIter-deep segments)
    val oldPairs = (0L until 120L).map(i => (1000 + 2 * i, 1001 + 2 * i)).toDF("d1", "d2")
    val labels = Dedup.connectedComponents(oldPairs).localCheckpoint()
    val bridges = (0L until 119L).map(i => (1001 + 2 * i, 1002 + 2 * i)).toDF("d1", "d2")
    val inc = Dedup.incrementalComponents(labels, bridges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc.size == 240 && inc.values.forall(_ == 1000L),
      s"all 240 members must merge to component 1000: ${inc.values.toSet}")
  }

  test("incremental merge is exact even when a new vertex undercuts an old label") {
    val s = spark
    import s.implicits._
    val labels = Dedup.connectedComponents(Seq((10L, 11L)).toDF("d1", "d2"))
      .localCheckpoint()
    // new vertex 3 < old label 10: the merged component's true min is 3
    val inc = Dedup.incrementalComponents(labels, Seq((3L, 11L)).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == Map(10L -> 3L, 11L -> 3L, 3L -> 3L), inc.toString)
  }
}

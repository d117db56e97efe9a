package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {

  test("asOfJoin: ≤ semantics, no-prior-row null, carry across gaps") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L), (2L, 50L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 15L, 901L), (3L, 1L, 902L))
      .toDF("k", "t", "rid")
    val got = TemporalJoins.asOfJoin(left, right, "k", "t", Seq("rid"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(got(100L).contains(900L)) // equal time ⇒ matches (≤)
    assert(got(101L).contains(901L)) // latest prior wins
    assert(got(102L).isEmpty)        // before any right row ⇒ null
    assert(got(103L).isEmpty)        // key with no right rows ⇒ null
  }

  test("recentCount: strict (t-w, t) window per key") {
    val s = spark
    import s.implicits._
    // key 1: events at 0, 50, 100, 149, 250 with window 100
    val ev = Seq((1L, 0L, 1L), (1L, 50L, 2L), (1L, 100L, 3L), (1L, 149L, 4L), (1L, 250L, 5L))
      .toDF("k", "us", "id")
    val got = TemporalJoins.recentCount(ev, "k", "us", "id", 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 0L))
    // id3 at 100: (0,100) strict excludes 0 and itself, includes 50
    // id4 at 149: (49,149) includes 50 and 100
    // id5 at 250: (150,250) empty
  }
}

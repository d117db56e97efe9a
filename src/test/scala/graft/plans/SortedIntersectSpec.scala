package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native sorted-merge intersection count against the builtin it
  * replaces in the Jaccard verify hot loop (r11):
  * `sorted_intersect_count(array_sort(a), array_sort(b))` must equal
  * `size(array_intersect(a, b))` for every distinct-element input,
  * including empties, null arrays, null elements, and unicode — the
  * operator's shingle sets are distinct by construction (array_distinct /
  * the bottom-K slice of a distinct set).
  */
class SortedIntersectSpec extends SparkSpec {

  private def nat(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftFunctions.sortedIntersectCount(array_sort(a), array_sort(b))

  test("equals size(array_intersect) on random distinct string sets") {
    import spark.implicits._
    // deterministic pseudo-random sets with controlled overlap, incl. a
    // shared unicode element and varying sizes 0..~40
    val df = spark.range(200).select(
      expr("transform(sequence(1, CAST(id % 41 AS INT)), " +
        "i -> concat('s', CAST((id * 7 + i * i) % 53 AS STRING), 'é'))").as("a0"),
      expr("transform(sequence(1, CAST((id * 3) % 37 AS INT)), " +
        "i -> concat('s', CAST((id * 11 + i * 5) % 53 AS STRING), 'é'))").as("b0"))
      .select(array_distinct(col("a0")).as("a"), array_distinct(col("b0")).as("b"))
    val bad = df.where(
      nat(col("a"), col("b")) =!= size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(bad.count() == 0)
  }

  test("edge cases: empty, disjoint, identical, null array, null element") {
    import spark.implicits._
    val rows = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("d", "e")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("b", "a"), Seq("a", "c", "b")))
    val df = rows.toDF("a", "b")
    val bad = df.where(
      nat(col("a"), col("b")) =!= size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(bad.count() == 0)

    // null arrays propagate NULL exactly like the builtin
    val n = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS a, array('x') AS b")
    assert(n.select(nat(col("a"), col("b"))).head().isNullAt(0))

    // a null ELEMENT matches only a null element (array_intersect set
    // semantics; array_sort places nulls last so the merge sees them last)
    val ne = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING)) AS a, array(CAST(NULL AS STRING), 'b') AS b")
    val v = ne.select(nat(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("e")).head()
    assert(v.getLong(0) == v.getLong(1))
  }

  test("jaccardVerify is unchanged by the sorted-merge rewrite (vs explicit builtin recompute)") {
    import spark.implicits._
    // small doc set with guaranteed near-dups; candidates = all pairs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "a completely different document with other words entirely"),
      (4L, "the quick brown fox leaps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("d1", "d2")
    import graft.functions.TextFunctions._
    for (cap <- Seq(None, Some(5))) {
      val got = graft.operators.Dedup
        .jaccardVerify(cand, docs, "doc_id", "text", maxShingles = cap)
        .orderBy("d1", "d2")
        .select("d1", "d2", "n_inter", "n_union", "jaccard_scaled")
        .collect().toSeq
      // recompute n_inter with the builtin over the SAME capped set
      // definition to prove the native count didn't change semantics
      val fullSet = array_distinct(shingles(normText(col("text")), 8))
      val shs = cap match {
        case None => fullSet
        case Some(k) =>
          when(size(fullSet) <= k, fullSet).otherwise(
            transform(
              slice(array_sort(transform(fullSet, s => struct(md5(s).as("h"), s.as("s")))), 1, k),
              x => x.getField("s")))
      }
      val sets = docs.select(col("doc_id"), shs.as("shs"))
      val exp = cand
        .join(sets.select(col("doc_id").as("d1"), col("shs").as("s1")), "d1")
        .join(sets.select(col("doc_id").as("d2"), col("shs").as("s2")), "d2")
        .select(col("d1"), col("d2"),
          size(array_intersect(col("s1"), col("s2"))).cast("long").as("n_inter"),
          (size(col("s1")) + size(col("s2")) -
            size(array_intersect(col("s1"), col("s2"))).cast("long")).as("n_union"),
          floor(lit(100000.0) * size(array_intersect(col("s1"), col("s2"))).cast("long") /
            (size(col("s1")) + size(col("s2")) -
              size(array_intersect(col("s1"), col("s2"))).cast("long")))
            .cast("long").as("jaccard_scaled"))
        .orderBy("d1", "d2").collect().toSeq
      assert(got == exp, s"cap=$cap")
    }
  }
}

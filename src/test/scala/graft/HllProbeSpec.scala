package graft

class HllProbeSpec extends SparkSpec {
  test("hll_sketch_agg family is available") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "a"), (4, "c")).toDF("id", "g")
    val per = df.groupBy("g").agg(org.apache.spark.sql.functions.expr("hll_sketch_agg(id)").as("sk"))
    val ests = per.selectExpr("g", "hll_sketch_estimate(sk) as est").collect()
    assert(ests.length == 3)
    val merged = per.selectExpr("hll_union_agg(sk) as u")
      .selectExpr("hll_sketch_estimate(u)").head().getLong(0)
    assert(merged == 4L)
  }
}

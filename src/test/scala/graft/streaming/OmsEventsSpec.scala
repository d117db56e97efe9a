package graft.streaming

import graft.SparkSpec

/** S9: OMS JSON records normalize into ChangeEvent and run through the
  * same flush/apply pipeline as TiCDC events.
  */
class OmsEventsSpec extends SparkSpec {

  test("OMS ROW / incremental / HEARTBEAT records decode and normalize") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      """{"recordType":"ROW","dbName":"db","tableName":"t","timestamp":"100","partition":0,
        |"rowKeys":["id"],"fieldValues":{"id":"k1","val":"v1"}}""".stripMargin.replace("\n", ""),
      """{"recordType":"UPDATE","dbName":"db","tableName":"t","timestamp":"101","partition":0,
        |"rowKeys":["id"],"fieldValues":{"id":"k1","val":"v2"}}""".stripMargin.replace("\n", ""),
      """{"recordType":"DDL","dbName":"db","tableName":"t","timestamp":"102","partition":0,
        |"ddl":"ALTER TABLE t ADD c INT"}""".stripMargin.replace("\n", ""),
      """{"recordType":"HEARTBEAT","timestamp":"103"}""").toDF("value")
    val evs = OmsEvents.decode(s, raw).collect().sortBy(_.commitTs)

    assert(evs(0).queryType == "INSERT" && evs(0).commitTs == 100000L &&
      evs(0).uniqKeys == Map("id" -> "k1") && evs(0).columns("val") == "v1")
    assert(evs(1).queryType == "UPDATE" && evs(1).uniqKeys == Map("id" -> "k1"))
    assert(evs(2).queryType == "DDL" && evs(2).ddlQuery.startsWith("ALTER TABLE"))
    assert(evs(3).queryType == "HEARTBEAT" && evs(3).commitTs == 103000L)

    // the normalized events drive the shared pipeline: heartbeat flushes
    val phases = CdcPipeline.splitAtDdl(evs.toSeq)
    assert(phases.head.ddl.exists(_.commitTs == 102000L))
    val applied = CdcPipeline.applyBatch(s,
      Seq(("k0", "seed")).toDF("id", "val"), evs.toSeq, "id", Seq("val"))
    val state = applied.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state == Map("k0" -> "seed", "k1" -> "v2"))
  }
}

package graft.operators

import graft.SparkSpec

/** CI-scale run of the disk-backed end-to-end ingestion rehearsal (the
  * 1M certification lives in `graft.tools.IngestRehearsal`): all state
  * relations persisted as parquet, two consecutive shards ingested
  * reading/writing only the on-disk state, final world == one-shot
  * rebuild, file-level partition-pruning and append-only assertions.
  * The tool throws on any violated invariant, so this test IS the
  * assertion set.
  */
class IngestRehearsalSpec extends SparkSpec {

  test("two-shard disk-backed ingestion == one-shot rebuild (all five state relations)") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_rehearsal_spec").toString
    graft.tools.IngestRehearsal.run(spark, nDocs = 4000L, nShard = 400L, dir)
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful processing on the Spark 4 `transformWithState`
  * API — the modern successor of `flatMapGroupsWithState` that
  * [[CdcPipeline]] uses, with typed per-key state primitives
  * (ValueState/ListState/MapState), TTL, and timers.
  *
  * The reference's per-table running counters
  * (`database/processor/processor_migrate_stats.go`,
  * `migration_progress_status.go` — atomic rows-read/processed counters
  * per table) map onto exactly this: one ValueState per key holding the
  * running (count, sum), updated per micro-batch, state partitioned by
  * key across the cluster and persisted in the state store.
  */
object StatefulOps {

  /** Per-key running (count, sum) over an unbounded keyed stream of
    * (key, value): each micro-batch folds its rows into the key's
    * ValueState and emits one updated `(key, count, sum)` row. State is
    * O(keys); TTL is NONE because migration counters live for the task's
    * lifetime (pass a TTL for ephemeral keys).
    */
  class RunningTotals extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[(String, Long, Long)] = {
      var (c, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { r => c += 1; s += r._2 }
      totals.update((c, s))
      Iterator.single((key, c, s))
    }
  }

  /** Wires [[RunningTotals]] onto a keyed stream. Update mode: each
    * batch re-emits the keys it touched with their new running totals.
    */
  def runningTotals(events: Dataset[(String, Long)]): Dataset[(String, Long, Long)] = {
    implicit val enc = Encoders.product[(String, Long, Long)]
    events
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(
        new RunningTotals, TimeMode.None(), OutputMode.Update(), enc)
  }
}

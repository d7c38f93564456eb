package graft.streaming

import graft.streaming.SessionStream.UserEvent
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The Spark 4 `transformWithState` surface — the successor to
  * `flatMapGroupsWithState` with named state variables, TTL, and
  * timers. Running per-user event count + value sum: each
  * micro-batch emits the user's updated running totals, state is one
  * (count, sum) pair per user in a named ValueState (RocksDB state
  * store required — the provider that supports multiple column
  * families). Complements SessionStream's flatMapGroupsWithState:
  * both custom-state generations are covered. */
class CountProcessor extends StatefulProcessor[Long, UserEvent, (Long, Long, Double)] {

  @transient private var totals: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)](
      "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserEvent],
      timers: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, sum) = if (totals.exists()) totals.get() else (0L, 0.0)
    rows.foreach { e => n += 1; sum += e.value }
    totals.update((n, sum))
    Iterator.single((key, n, sum))
  }
}

object CountProcessor {
  /** Per-user running totals via transformWithState. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new CountProcessor,
        TimeMode.None(),
        OutputMode.Update(),
        implicitly[Encoder[(Long, Long, Double)]])
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import java.sql.Timestamp

/** Streaming twin of `Events.funnelSteps`: per-user funnel stage
  * tracking as a `transformWithState` processor. State per user is
  * O(1) — the three stage timestamps — regardless of stream length,
  * and each micro-batch emits the user's stage ONLY when it
  * advances (Update mode), so downstream sees funnel progressions,
  * not event traffic. Same order semantics as batch: a stage counts
  * only strictly after the previous stage's first time.
  */
object FunnelStream {

  case class StageEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelProgress(user_id: Long, stage: Int, lag_us: Long)

  private def us(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  class FunnelProcessor extends StatefulProcessor[Long, StageEvent, FunnelProgress] {

    // (t1, t2, t3) in µs; Long.MinValue = stage not reached
    @transient private var stages: ValueState[(Long, Long, Long)] = _
    private val Unset = Long.MinValue

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stages = getHandle.getValueState[(Long, Long, Long)](
        "stages",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[StageEvent],
        timers: TimerValues): Iterator[FunnelProgress] = {
      var (t1, t2, t3) = if (stages.exists()) stages.get() else (Unset, Unset, Unset)
      val before = stageOf(t1, t2, t3)
      // events within a batch are not ordering-guaranteed; replay
      // them time-ascending so in-batch progressions resolve exactly
      // like the batch windowed form
      rows.toArray.sortBy(e => (us(e.ts), e.event_type)).foreach { e =>
        val t = us(e.ts)
        e.event_type match {
          case "view" if t1 == Unset || t < t1 => t1 = t
          case "click" if t1 != Unset && t > t1 && (t2 == Unset || t < t2) => t2 = t
          case "purchase" if t2 != Unset && t > t2 && (t3 == Unset || t < t3) => t3 = t
          case _ => ()
        }
      }
      stages.update((t1, t2, t3))
      val after = stageOf(t1, t2, t3)
      if (after > before)
        Iterator.single(FunnelProgress(key, after,
          if (after >= 2) (if (after == 3) t3 else t2) - t1 else 0L))
      else Iterator.empty
    }

    private def stageOf(t1: Long, t2: Long, t3: Long): Int =
      if (t3 != Unset) 3 else if (t2 != Unset) 2 else if (t1 != Unset) 1 else 0
  }

  /** Per-user funnel progressions via transformWithState. */
  def funnel(events: Dataset[StageEvent]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor,
        TimeMode.None(),
        OutputMode.Update(),
        implicitly[Encoder[FunnelProgress]])
  }
}

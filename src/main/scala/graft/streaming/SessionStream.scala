package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Stateful streaming sessionization — the custom-state surface
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`) for the same
  * 30-minute-gap semantics as the batch `Events.sessionize` (which
  * uses a lag window). State per user is O(1): the open session's
  * bounds and count — bounded state regardless of stream length.
  */
object SessionStream {

  case class UserEvent(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  val GapUs: Long = 30L * 60 * 1000000

  private def tsToUs(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  private def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Emits a session once a subsequent event arrives more than the
    * gap after it ended; the still-open session stays in state (a
    * production deployment also closes idle sessions via event-time
    * timeout + watermark — same callback, timeout branch). */
  def sessionize(events: Dataset[UserEvent]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[UserEvent], state: GroupState[OpenSession]) => {
          val times = it.map(e => tsToUs(e.ts)).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
          var open = state.getOption
          times.foreach { ts =>
            open match {
              case Some(s) if ts - s.lastUs > GapUs =>
                out += ClosedSession(userId, usToTs(s.startUs), usToTs(s.lastUs), s.n)
                open = Some(OpenSession(ts, ts, 1))
              case Some(s) =>
                // max(): a late event from an earlier batch must not
                // regress the open session's end and fake a gap
                open = Some(OpenSession(s.startUs, math.max(s.lastUs, ts), s.n + 1))
              case None =>
                open = Some(OpenSession(ts, ts, 1))
            }
          }
          open.foreach(state.update)
          out.iterator
        })
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming surface (SURVEY §1.1) — these exist for
  * the engine's web-pipeline completeness: the same windowed aggregation
  * that `q60_event_hourly` runs in batch, expressed on a stream with
  * watermarked event time, plus a stateful sessionizer via
  * flatMapGroupsWithState. Both transforms accept any DataFrame with the
  * events schema, so batch and stream share one code path (run them on
  * `spark.readStream` or `spark.read` alike for the batch-equivalence
  * test).
  */
object EventStream {

  /** Tumbling-window per-type counts with a 10-minute watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_val"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_val"))

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                     n_events: Int, sum_value: Double)

  /** Gap-based sessionization: a user's session closes after `gapMs` of
    * inactivity (processing-time timeout on the state).
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(uid, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}

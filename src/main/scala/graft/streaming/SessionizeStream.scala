package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the custom-state tier of the
  * streaming surface (KeyValueGroupedDataset.flatMapGroupsWithState with
  * event-time timeout). The batch analogue is SparkEntry.q_sessionize
  * (gap-based lag/sum windows); here sessions close either when a new
  * event arrives past the gap or when the watermark passes the session's
  * timeout — the late-data story the batch job cannot express. */
object SessionizeStream {

  final case class Event(userId: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, nEvents: Long, sumValue: Double)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long, sumValue: Double)

  def sessions(spark: SparkSession, events: Dataset[Event],
      gapSeconds: Long = 1800, watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def fn(userId: Long, batch: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      val out = Vector.newBuilder[Session]
      if (state.hasTimedOut) {
        // watermark passed the open session's gap → close it
        state.getOption.foreach { s =>
          out += Session(userId, s.startMs, s.lastMs, s.nEvents, s.sumValue)
        }
        state.remove()
      } else {
        val events = batch.toVector.sortBy(_.ts.getTime)
        var cur = state.getOption
        events.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(SessionState(s.startMs, math.max(s.lastMs, t),
                s.nEvents + 1, s.sumValue + e.value))
            case Some(s) =>
              out += Session(userId, s.startMs, s.lastMs, s.nEvents, s.sumValue)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}

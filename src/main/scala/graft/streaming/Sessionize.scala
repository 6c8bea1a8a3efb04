package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom keyed state
  * (`flatMapGroupsWithState`): events for a user belong to one session
  * until a gap larger than `gapSeconds` appears; a session is emitted when
  * the gap closes it (event-time timeout closes idle sessions).
  *
  * State per key is one open session (bounded); the operator shuffles
  * once on the key and scales with distinct keys, not event volume. The
  * same logic runs in batch via [[sessionizeBatch]] (window/lag
  * composition) — batch and streaming results agree for drained input,
  * which is what the spec asserts.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
      gapSeconds: Long): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          if (sorted.isEmpty && state.hasTimedOut) {
            open.foreach(s => closed += Session(user,
              new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
            state.remove()
          } else {
            for (e <- sorted) {
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(user, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.total)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
          }
          closed.result().iterator
      }
  }

  /** Batch twin: session boundaries via lag + running session ids. */
  def sessionizeBatch(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    events.toDF()
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev")) >
            gapSeconds * 1000, 1).otherwise(0))
      .withColumn("session_id", sum("new_session")
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events",
        "total_value")
      .as[Session]
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the API for
  * per-key logic the built-in windowed/sessionized aggregates can't
  * express (reference analog: the sensors' cursor bookkeeping,
  * pipeline/pipeline.py:164-182, generalized to arbitrary per-key folds).
  *
  * Scale shape: state lives in the per-partition state store keyed by
  * user — memory ∝ ACTIVE keys (one small case class each), not history;
  * each micro-batch touches only the keys present in the batch. Within a
  * batch the group iterator is UNORDERED, so the fold sorts each group's
  * batch slice by event time first — per-batch-per-key memory, bounded by
  * the trigger, never by the stream.
  */
object StatefulOps {

  /** `cents`: the folded quantity as an exact integer (scaled currency).
    * Integer state is deliberate — a floating fold's low bits depend on
    * addition order, which micro-batch boundaries make nondeterministic.
    */
  final case class Event(user_id: Long, us: Long, cents: Long)
  final case class Running(total: Long, n: Long)
  final case class RunningOut(user_id: Long, us: Long,
      running_cents: Long, running_n: Long)

  /** Per-user cumulative (total, count), one output row per input event,
    * folded in event-time order within each batch and carried across
    * micro-batches by the keyed state. Append mode: each row is emitted
    * exactly once, when its batch is processed. Assumes per-key event
    * time is non-decreasing ACROSS batches (in-batch disorder is handled
    * by the sort); a fold like this treats late cross-batch arrivals as
    * current — use a watermarked windowed aggregate when event-time
    * finality matters more than per-event emission.
    */
  def runningTotals(events: Dataset[Event]): Dataset[RunningOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Running, RunningOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[Running]) =>
          val sorted = it.toArray.sortBy(_.us)
          var st = state.getOption.getOrElse(Running(0L, 0L))
          val out = sorted.map { e =>
            st = Running(st.total + e.cents, st.n + 1)
            RunningOut(uid, e.us, st.total, st.n)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class TypedEvent(user_id: Long, us: Long, cents: Long,
      op: String)
  final case class TypedOut(user_id: Long, us: Long, running_cents: Long,
      running_n: Long, op: String, op_n: Long)

  /** The same per-user fold on Spark 4's `transformWithState` — the
    * successor API to `flatMapGroupsWithState` built for the RocksDB
    * state store, with COMPOSABLE named state variables instead of one
    * monolithic state object: the running (total, n) lives in a
    * `ValueState`, and a `MapState` keyed by event type counts
    * occurrences-so-far per (user, type) — at scale that map is
    * maintained one point-lookup/put per row against RocksDB, where a
    * single-value API would rewrite the whole per-user map every event.
    * TTL is the retention story for keyed state ([[TTLConfig]]; NONE
    * here — the gate's state must survive the whole drain).
    */
  final class TypedRunningProcessor
      extends StatefulProcessor[Long, TypedEvent, TypedOut] {
    @transient private var totals: ValueState[Running] = _
    @transient private var perOp: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[Running]("totals",
        Encoders.product[Running], TTLConfig.NONE)
      perOp = getHandle.getMapState[String, Long]("per_op",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(uid: Long, rows: Iterator[TypedEvent],
        timers: TimerValues): Iterator[TypedOut] = {
      // in-batch disorder is sorted per key, as in runningTotals
      val sorted = rows.toArray.sortBy(_.us)
      var st = if (totals.exists()) totals.get() else Running(0L, 0L)
      val out = sorted.map { e =>
        st = Running(st.total + e.cents, st.n + 1)
        val seen = if (perOp.containsKey(e.op)) perOp.getValue(e.op) else 0L
        perOp.updateValue(e.op, seen + 1)
        TypedOut(uid, e.us, st.total, st.n, e.op, seen + 1)
      }
      totals.update(st)
      out.iterator
    }
  }

  /** Per-user cumulative totals + per-(user, event-type) occurrence
    * counters via [[TypedRunningProcessor]]. Append mode, no time mode:
    * one output row per input event, exactly once.
    */
  def typedRunningTotals(events: Dataset[TypedEvent]): Dataset[TypedOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypedRunningProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

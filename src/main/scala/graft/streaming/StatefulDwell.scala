package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One valued event in a user's timeline. */
case class DwellEvent(user_id: Long, t_us: Long, event_id: Long, cents: Long)

/** Per-user dwell state: the last event's (time, id) — the monotone
  * guard — and the value it is still holding. 24 bytes per user. */
case class DwellState(last_us: Long, last_id: Long, cents: Long)

/** One CLOSED interval: `cents` was held for `dur_us` microseconds. */
case class DwellInterval(user_id: Long, dur_us: Long, cents: Long)

/** Streaming dwell intervals — the stateful twin of the batch
  * [[graft.operators.Sessions.timeWeightedValue]] (`u44`), for the
  * live posture: each arriving event CLOSES the interval the user's
  * previous event opened, so exposure/billing/dwell accumulators can
  * be folded continuously instead of re-windowing the event table per
  * snapshot. The time-weighted mean is a trivial downstream fold of
  * the emitted intervals (`Σ cents·dur div Σ dur` — the same integer
  * arithmetic as the batch operator).
  *
  * Semantics: within a micro-batch events fold in `(t_us, event_id)`
  * order; across batches the state carries the open interval. An
  * event at or lexicographically before `(last_us, last_id)` is
  * skipped (the [[StatefulCusum]] monotone rule) — late data cannot
  * close an interval a newer event already closed. Equal-timestamp
  * events close ZERO-duration intervals in id order, exactly the
  * batch operator's `(ts, id)`-ordered lead. An in-order stream
  * therefore emits the identical interval multiset — the parity
  * contract in `StreamingSpec`. The user's open tail interval is
  * never emitted (the batch half-open convention).
  *
  * State is O(1) per user; pair with `EventTimeTimeout` to evict
  * retired users at production scale — `NoTimeout` here so the same
  * operator runs identically on batch Datasets.
  */
object StatefulDwell {

  /** Shapes a raw event frame: µs epoch, integer cents. */
  def shapeEvents(
      events: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): Dataset[DwellEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol)).as("t_us"),
        col(idCol).cast("long").as("event_id"),
        round(col(valueCol) * 100).cast("long").as("cents"))
      .as[DwellEvent]
  }

  def intervals(
      events: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): Dataset[DwellInterval] = {
    val spark = events.sparkSession
    import spark.implicits._
    shapeEvents(events, userCol, tsCol, idCol, valueCol)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DwellState, DwellInterval](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[DwellEvent], state: GroupState[DwellState]) =>
          val sorted = it.toVector.sortBy(e => (e.t_us, e.event_id))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[DwellInterval]
          sorted.foreach { e =>
            if (st == null) st = DwellState(e.t_us, e.event_id, e.cents)
            else if (e.t_us > st.last_us ||
              (e.t_us == st.last_us && e.event_id > st.last_id)) {
              // the arriving event closes the open interval
              out += DwellInterval(uid, e.t_us - st.last_us, st.cents)
              st = DwellState(e.t_us, e.event_id, e.cents)
            } // else: late or duplicate — skip, state is monotone
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}

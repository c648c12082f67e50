package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One timestamped event for cadence tracking. */
case class CadenceEvent(user_id: Long, event_id: Long, t_us: Long)

/** Per-user running cadence state: the (time, id)-latest event plus the
  * exact integer gap moments — 40 bytes per user regardless of stream
  * length. `s2` (Σ gap²) is a Long: overflow needs ~10⁴ month-long
  * floor-second gaps on ONE user (6.8e16 ≪ 2⁶³), far past any real
  * event stream; the batch twin holds the same sums in decimal only
  * because SQL decimal is its natural exact type. */
case class CadenceState(last_us: Long, last_id: Long, n: Long, s1: Long, s2: Long)

/** Emitted per updated user per micro-batch (users with ≥ minGaps gaps
  * and a positive gap sum): the same row shape as the batch
  * `Sessions.interEventStats`. */
case class CadenceRow(user_id: Long, n_gaps: Long, sum_gap_s: Long,
    mean_gap_s: Long, cv2: Double)

/** Streaming inter-event cadence/burstiness — the stateful twin of the
  * batch `Sessions.interEventStats`: per-user floor-second gap moments
  * accumulated in `mapGroupsWithState`, cv² emitted on every update.
  *
  * Semantics: within a micro-batch events fold in `(t_us, event_id)`
  * order; across batches the state carries the latest seen event and
  * the running `(n, Σg, Σg²)`. Because the moment sums are associative
  * integers, an in-order stream reproduces the batch operator EXACTLY
  * (the parity test's contract) regardless of how events split across
  * micro-batches. The `(last_us, last_id)` pair is the guard that makes
  * that contract explicit: an event at or before the latest folded one
  * (a late arrival, or a replayed duplicate) is SKIPPED rather than
  * folded, so the state is monotone — a straggler can neither rewind
  * `last_us` (which would inflate the next gap) nor double-count a
  * duplicate delivery. Bound late data with a watermark + upstream sort
  * if its gaps must count; the state itself never corrupts.
  *
  * State is O(1) per user. At production scale pair with
  * `GroupStateTimeout.EventTimeTimeout` to evict idle users — kept
  * `NoTimeout` here so the operator runs identically on batch Datasets
  * for the parity contract.
  */
object StatefulCadence {

  def shapeEvents(events: DataFrame): Dataset[CadenceEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_micros(col("ts")).as("t_us"))
      .as[CadenceEvent]
  }

  /** Matches Spark's `round(x, 6)` (RoundHalfUp on the shortest decimal
    * representation), so emitted cv2 is bit-equal to the batch column. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def cadence(events: DataFrame, minGaps: Long = 2): Dataset[CadenceRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    shapeEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CadenceState, CadenceRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[CadenceEvent], state: GroupState[CadenceState]) =>
          val sorted = it.toVector.sortBy(e => (e.t_us, e.event_id))
          var st = state.getOption.getOrElse(
            CadenceState(Long.MinValue, Long.MinValue, -1L, 0L, 0L))
          sorted.foreach { e =>
            if (st.n < 0) st = CadenceState(e.t_us, e.event_id, 0L, 0L, 0L)
            else if (e.t_us > st.last_us ||
                (e.t_us == st.last_us && e.event_id > st.last_id)) {
              val g = (e.t_us - st.last_us) / 1000000L
              st = CadenceState(e.t_us, e.event_id, st.n + 1, st.s1 + g, st.s2 + g * g)
            } // else: late or duplicate vs (last_us, last_id) — skip, see scaladoc
          }
          state.update(st)
          if (st.n >= minGaps && st.s1 > 0) {
            // exact decimal numerator/denominator, doubles only at the
            // final division — identical op order to the batch column
            val num = (BigDecimal(st.n) * BigDecimal(st.s2) -
              BigDecimal(st.s1) * BigDecimal(st.s1)).toDouble
            val den = (BigDecimal(st.s1) * BigDecimal(st.s1)).toDouble
            Iterator.single(CadenceRow(uid, st.n, st.s1, st.s1 / st.n,
              round6(num / den)))
          } else Iterator.empty
      }
  }
}

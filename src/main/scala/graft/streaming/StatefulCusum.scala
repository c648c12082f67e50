package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One daily metric observation for a monitored key. */
case class CusumPoint(key: String, day_n: Long, v: Long)

/** Per-key CUSUM state: the last folded day and the running statistic —
  * 16 bytes per key regardless of stream length. */
case class CusumState(last_day: Long, s: Long)

/** Emitted per updated key per micro-batch: the key's statistic after
  * folding the batch, plus the alarm bit. */
case class CusumRow(key: String, day_n: Long, v: Long, cusum: Long, alarm: Boolean)

/** Streaming one-sided CUSUM drift detection — the stateful twin of the
  * batch [[graft.operators.Anomaly.cusumDaily]] (`u35_cusum`), for the
  * production posture where the reference level is a MODEL: batch
  * derives `(μ, k, h)` from history, streaming monitors live
  * per-key daily metrics against those constants and raises the alarm
  * the day the accumulated drift crosses `h`.
  *
  * Semantics: within a micro-batch, points fold in `(day, key)` order;
  * across batches the state carries `(last_day, s)`. Calendar gaps
  * between consecutive folded days contribute the zero-value step
  * `max(0, s − μ − k)` once per missing day — EXACTLY the batch
  * operator's dense-axis rule, so an in-order stream reproduces
  * `cusumDaily`'s statistic day for day (the parity contract in
  * `StreamingSpec`). A point at or before `last_day` is skipped (the
  * monotone-state rule [[StatefulCadence]] uses): late data cannot
  * rewind the recurrence.
  *
  * State is O(1) per key. At production scale pair with
  * `GroupStateTimeout.EventTimeTimeout` to evict retired keys — kept
  * `NoTimeout` here so the operator runs identically on batch Datasets.
  */
object StatefulCusum {

  /** Adapts a (key, day, value) frame: days become epoch-day longs so
    * gap arithmetic is integer subtraction. */
  def shapePoints(
      daily: DataFrame, keyCol: String, dayCol: String, valCol: String): Dataset[CusumPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily.select(col(keyCol).cast("string").as("key"),
        datediff(col(dayCol).cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day_n"),
        col(valCol).cast("long").as("v"))
      .as[CusumPoint]
  }

  def cusum(
      daily: DataFrame, keyCol: String, dayCol: String, valCol: String,
      mu: Long, k: Long, h: Long): Dataset[CusumRow] = {
    val spark = daily.sparkSession
    import spark.implicits._
    val step = mu + k
    shapePoints(daily, keyCol, dayCol, valCol)
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[CusumPoint], state: GroupState[CusumState]) =>
          val sorted = it.toVector.sortBy(_.day_n)
          var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L))
          val out = Vector.newBuilder[CusumRow]
          sorted.foreach { p =>
            if (p.day_n > st.last_day) {
              // zero-value steps for the calendar gap (batch dense-axis
              // rule); bounded by the real gap, and s hits its fixpoint
              // max(0, s - step) monotonically so cap the walk at the
              // point where s reaches 0
              if (st.last_day != Long.MinValue) {
                var g = p.day_n - st.last_day - 1
                while (g > 0 && st.s > 0) { st = st.copy(s = math.max(0L, st.s - step)); g -= 1 }
              }
              val s2 = math.max(0L, st.s + p.v - step)
              st = CusumState(p.day_n, s2)
              out += CusumRow(key, p.day_n, p.v, s2, s2 > h)
            } // else: late or duplicate day — skip, state is monotone
          }
          state.update(st)
          out.result().iterator
      }
  }
}

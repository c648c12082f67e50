package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One daily metric observation for a smoothed key. */
case class EwmaPoint(key: String, day_n: Long, v: Long)

/** Per-key EWMA state: the last folded day and the running baseline —
  * 16 bytes per key; `last_day = Long.MinValue` marks uninitialized
  * (the first observation seeds the baseline). */
case class EwmaState(last_day: Long, s: Long)

/** Emitted per updated key per micro-batch: the day's value, the
  * post-update baseline, and the deviation against the PRE-update
  * baseline (raw and signed ppm; ppm is None on a zero baseline). */
case class EwmaRow(key: String, day_n: Long, v: Long, ewma: Long,
    dev: Long, dev_ppm: Option[Long])

/** Streaming EWMA baseline monitor — the stateful twin of the batch
  * [[graft.operators.Anomaly.ewmaDaily]] (`u38_ewma`): per-key daily
  * metrics smoothed online with α = 1/alphaDiv, deviation emitted the
  * day it happens.
  *
  * Semantics: within a micro-batch, points fold in day order; across
  * batches the state carries `(last_day, s)`. Calendar gaps between
  * consecutive folded days contribute one zero-value update
  * `s ← ((alphaDiv−1)·s) div alphaDiv` per missing day — EXACTLY the
  * batch operator's dense-axis rule, so an in-order stream reproduces
  * `ewmaDaily` day for day on the observed days (the parity contract
  * in `StreamingSpec`). The gap walk caps at `s == 0` (the geometric
  * decay's fixpoint), so a years-long gap costs at most ~⌈log s /
  * log(alphaDiv/(alphaDiv−1))⌉ iterations, not one per day. A point at
  * or before `last_day` is skipped (the monotone-state rule
  * [[StatefulCusum]] uses): late data cannot rewind the baseline.
  *
  * All arithmetic matches the batch operator operand for operand:
  * non-negative integer update (truncating and flooring divides
  * agree), sign-split ppm with BigInt widening for the multiply.
  * State is O(1) per key; pair with `EventTimeTimeout` at production
  * scale to evict retired keys.
  */
object StatefulEwma {

  def shapePoints(
      daily: DataFrame, keyCol: String, dayCol: String, valCol: String): Dataset[EwmaPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily.select(col(keyCol).cast("string").as("key"),
        datediff(col(dayCol).cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day_n"),
        col(valCol).cast("long").as("v"))
      .as[EwmaPoint]
  }

  def ewma(
      daily: DataFrame, keyCol: String, dayCol: String, valCol: String,
      alphaDiv: Int = 4): Dataset[EwmaRow] = {
    require(alphaDiv >= 2, s"alphaDiv must be >= 2, got $alphaDiv")
    val spark = daily.sparkSession
    import spark.implicits._
    val a1 = alphaDiv - 1L
    shapePoints(daily, keyCol, dayCol, valCol)
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[EwmaPoint], state: GroupState[EwmaState]) =>
          val sorted = it.toVector.sortBy(_.day_n)
          var st = state.getOption.getOrElse(EwmaState(Long.MinValue, 0L))
          val out = Vector.newBuilder[EwmaRow]
          sorted.foreach { p =>
            if (p.day_n > st.last_day) {
              if (st.last_day == Long.MinValue) {
                st = EwmaState(p.day_n, p.v)
                out += EwmaRow(key, p.day_n, p.v, p.v, 0L, Some(0L))
              } else {
                // zero-value decay for the calendar gap (batch dense-axis
                // rule); geometric, so cap the walk at the s == 0 fixpoint
                var g = p.day_n - st.last_day - 1
                while (g > 0 && st.s > 0) { st = st.copy(s = (a1 * st.s) / alphaDiv); g -= 1 }
                val prev = st.s
                val dev = p.v - prev
                val devPpm =
                  if (dev == 0L) Some(0L)
                  else if (prev > 0L) {
                    val mag = (BigInt(math.abs(dev)) * 1000000 / prev).toLong
                    Some(if (dev > 0) mag else -mag)
                  } else None
                val s2 = (a1 * prev + p.v) / alphaDiv
                st = EwmaState(p.day_n, s2)
                out += EwmaRow(key, p.day_n, p.v, s2, dev, devPpm)
              }
            } // else: late or duplicate day — skip, state is monotone
          }
          state.update(st)
          out.result().iterator
      }
  }
}

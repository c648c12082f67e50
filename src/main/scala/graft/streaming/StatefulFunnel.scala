package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel-relevant event: the step index and microsecond time. */
case class FunnelEvent(user_id: Long, step: Int, t_us: Long)

/** Per-user state: the observed event times per step (bounded by the
  * user's own step-event count inside the analysis window). Times are
  * buffered rather than folded because the ordered-funnel walk is not
  * monotone under out-of-order arrival — a late-arriving earlier click
  * can change which purchase qualifies. Re-walking the buffer per
  * emission keeps stream == batch exactly. */
case class FunnelBuffer(times: Seq[Seq[Long]])

/** Emitted per update: the user's current funnel progression — step
  * timestamps (µs, -1 when unreached) and the stage count. */
case class FunnelProgress(user_id: Long, stage: Int, t_us: Seq[Long])

/** Streaming ordered funnel via `flatMapGroupsWithState` — the flatMap
  * variant of the custom-state tier: users who never fired step 0 emit
  * NOTHING (an empty iterator), exactly the batch operator's funnel-entry
  * filter, which `mapGroupsWithState`'s one-row-per-group contract cannot
  * express.
  *
  * Walk semantics mirror [[graft.operators.Funnel.userStages]]: t0 = the
  * user's first step-0 event; t_i = earliest step-i event in
  * [t_{i-1}, t0 + windowDays]; null (here -1) propagates.
  *
  * State is bounded by the user's own step events inside the window. In
  * production, pair with `GroupStateTimeout.EventTimeTimeout` + a
  * watermark to evict users once `t0 + windowDays` falls behind the
  * watermark; kept `NoTimeout` here because the fixed-window analysis
  * reads a bounded historical range.
  */
object StatefulFunnel {

  def shapeEvents(
      events: DataFrame, steps: Seq[String]): Dataset[FunnelEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex
      .map { case (s, i) => (s, i) }.toMap
    val idxCol = stepIdx.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col("event_type") === s, lit(i)).otherwise(acc)
    }
    events.select(col("user_id").cast("long").as("user_id"),
        idxCol.as("step"), unix_micros(col("ts")).as("t_us"))
      .where(col("step") >= 0)
      .as[FunnelEvent]
  }

  def perUserStages(
      events: DataFrame, steps: Seq[String],
      windowDays: Int = 7): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val nSteps = steps.length
    val windowUs = windowDays.toLong * 24L * 3600L * 1000000L
    shapeEvents(events, steps)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuffer, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelBuffer]) =>
          val buf = state.getOption
            .getOrElse(FunnelBuffer(Vector.fill(nSteps)(Vector.empty)))
          val merged = it.foldLeft(buf.times.map(_.toVector).toVector) { (acc, e) =>
            acc.updated(e.step, acc(e.step) :+ e.t_us)
          }
          state.update(FunnelBuffer(merged))
          if (merged.head.isEmpty) Iterator.empty // never entered the funnel
          else {
            val t0 = merged.head.min
            val deadline = t0 + windowUs
            // the same walk as the batch operator, over the buffered times
            val ts = merged.indices.foldLeft(Vector.empty[Long]) { (acc, i) =>
              val reached =
                if (i == 0) t0
                else {
                  val prev = acc(i - 1)
                  if (prev < 0) -1L
                  else merged(i).filter(t => t >= prev && t <= deadline)
                    .minOption.getOrElse(-1L)
                }
              acc :+ reached
            }
            Iterator.single(FunnelProgress(uid, ts.count(_ >= 0), ts))
          }
      }
  }
}

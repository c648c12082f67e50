package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel-relevant event: the step index and microsecond time. */
case class FunnelEvent(user_id: Long, step: Int, t_us: Long)

/** [[FunnelEvent]] carrying the watermarked event-time column — the
  * evicting variant's input (Spark requires the watermark attribute to
  * flow into a stateful operator using event-time timeouts). */
case class TimedFunnelEvent(user_id: Long, step: Int, t_us: Long, ts: java.sql.Timestamp)

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

  private def stepIndexCol(steps: Seq[String]): org.apache.spark.sql.Column =
    steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col("event_type") === s, lit(i)).otherwise(acc)
    }

  def shapeEvents(
      events: DataFrame, steps: Seq[String]): Dataset[FunnelEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        stepIndexCol(steps).as("step"), unix_micros(col("ts")).as("t_us"))
      .where(col("step") >= 0)
      .as[FunnelEvent]
  }

  /** Merge a batch of (step, t_us) events into the buffered per-step
    * times. */
  private def mergeEvents(buf: FunnelBuffer, it: Iterator[(Int, Long)],
      nSteps: Int): Vector[Vector[Long]] =
    it.foldLeft(buf.times.map(_.toVector).toVector) { case (acc, (step, tUs)) =>
      acc.updated(step, acc(step) :+ tUs)
    }

  /** The ordered-funnel walk over buffered times: t0 = first step-0
    * event; t_i = earliest step-i event in [t_{i-1}, t0 + windowUs]; -1
    * propagates. Caller guarantees a step-0 event exists. */
  private def walk(merged: Vector[Vector[Long]], windowUs: Long): Vector[Long] = {
    val t0 = merged.head.min
    val deadline = t0 + windowUs
    merged.indices.foldLeft(Vector.empty[Long]) { (acc, i) =>
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
          val merged = mergeEvents(buf, it.map(e => (e.step, e.t_us)), nSteps)
          state.update(FunnelBuffer(merged))
          if (merged.head.isEmpty) Iterator.empty // never entered the funnel
          else {
            // the same walk as the batch operator, over the buffered times
            val ts = walk(merged, windowUs)
            Iterator.single(FunnelProgress(uid, ts.count(_ >= 0), ts))
          }
      }
  }

  /** [[perUserStages]] with production state eviction: events carry an
    * event-time watermark, and a user's state is dropped once
    * `t0 + windowDays` falls behind it — past that point the engine
    * filters every row old enough to still change the walk, so the state
    * is provably dead. Users who buffered step-1+ events but never fired
    * step 0 evict `windowDays` past their newest buffered event: a step-0
    * event arriving later must carry an event time at or above the
    * watermark, and the buffered events (all below it) could never land
    * inside that entry's window. Timed-out groups emit nothing — the last
    * update emission was already the user's final progression.
    *
    * The watermark clock advances from funnel-step events (the step
    * filter is pushed below the watermark node), which is the natural
    * clock source for a funnel topic; eviction lag is therefore bounded
    * by step-event traffic, not wall time. Kept separate from
    * [[perUserStages]] because batch GroupState cannot arm event-time
    * timeouts and the NoTimeout form must keep running on batch Datasets
    * for the parity contract. */
  def perUserStagesEvicting(
      events: DataFrame, steps: Seq[String], windowDays: Int = 7,
      watermarkDelay: String = "1 hour"): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val nSteps = steps.length
    val windowUs = windowDays.toLong * 24L * 3600L * 1000000L
    val windowMs = windowUs / 1000L
    events.withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"),
        stepIndexCol(steps).as("step"), unix_micros(col("ts")).as("t_us"),
        col("ts"))
      .where(col("step") >= 0)
      .as[TimedFunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuffer, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TimedFunnelEvent], state: GroupState[FunnelBuffer]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val buf = state.getOption
              .getOrElse(FunnelBuffer(Vector.fill(nSteps)(Vector.empty)))
            val merged = mergeEvents(buf, it.map(e => (e.step, e.t_us)), nSteps)
            state.update(FunnelBuffer(merged))
            val anchorUs =
              if (merged.head.nonEmpty) merged.head.min
              else merged.iterator.flatten.max
            // the max() guard keeps a straggler group from arming a
            // timestamp at or below the current watermark, which throws
            state.setTimeoutTimestamp(
              math.max(anchorUs / 1000L + windowMs, state.getCurrentWatermarkMs() + 1))
            if (merged.head.isEmpty) Iterator.empty
            else {
              val ts = walk(merged, windowUs)
              Iterator.single(FunnelProgress(uid, ts.count(_ >= 0), ts))
            }
          }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One pre-shaped retention event: day offset into the window plus the
  * born/target flags (the UDAF's CASE arguments, evaluated upstream). */
case class RetentionEvent(user_id: Long, born: Boolean, target: Boolean, t: Int)

/** Per-user streaming state: the same two bitmap vectors the batch
  * `retention_count` accumulator keeps (reference:
  * src/retention/retention_count.rs:25-39). */
case class RetentionState(born: Array[Byte], target: Array[Byte])

/** Emitted per update: the user's current `[born_vec, target_vec]` pair,
  * widened to long for parity with the oracle-facing batch output. */
case class RetentionStats(user_id: Long, stats: Seq[Seq[Long]])

/** Streaming `retention_count` via `mapGroupsWithState` — the custom-state
  * tier of Structured Streaming, for when window aggregates can't express
  * the semantics (the retention bitmap update with its born/target marker
  * rules is exactly that case).
  *
  * Update rules mirror the batch accumulator bit-for-bit
  * (reference: src/retention/retention_count.rs:90-119): `born[t] = 1`
  * when the born predicate fires, `target[t] = 2` when the same event is
  * also the born event (the self-retention marker `retention_sum`
  * consumes), else `1`. Merging across micro-batches is monotone
  * (elementwise max semantics), so emissions converge to the batch
  * answer regardless of event arrival order.
  *
  * State is bounded: `2 × (winDays+1)` bytes per user. At 100 TB scale,
  * add `GroupStateTimeout.EventTimeTimeout` + a watermark to evict users
  * once the analysis window has closed; kept `NoTimeout` here because the
  * fixed-window analysis reads a bounded historical range.
  */
object StatefulRetention {

  /** Shapes a raw event table (ts/user_id/event_type) into
    * [[RetentionEvent]]s for a `winDays`-day window starting `winStart`
    * (yyyy-MM-dd), with born/target event types — the streaming analogue
    * of the batch query's CASE arguments + BETWEEN pre-filter. */
  def shapeEvents(
      events: DataFrame, winStart: String, winDays: Int,
      bornType: String, targetType: String): Dataset[RetentionEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col("ts") >= lit(winStart).cast("timestamp") &&
        col("ts") < date_add(lit(winStart).cast("date"), winDays).cast("timestamp"))
      .select(col("user_id").cast("long").as("user_id"),
        (col("event_type") === bornType).as("born"),
        (col("event_type") === targetType).as("target"),
        datediff(to_date(col("ts")), lit(winStart).cast("date")).cast("int").as("t"))
      .as[RetentionEvent]
  }

  /** Per-user retention bitmaps with custom keyed state. Works identically
    * on a streaming Dataset (outputMode `update`) and a batch Dataset —
    * the parity test's contract. */
  def perUserStats(
      events: DataFrame, winStart: String, winDays: Int,
      bornType: String, targetType: String): Dataset[RetentionStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    shapeEvents(events, winStart, winDays, bornType, targetType)
      .groupByKey(_.user_id)
      .mapGroupsWithState[RetentionState, RetentionStats](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[RetentionEvent], state: GroupState[RetentionState]) =>
          val s = state.getOption.getOrElse(
            RetentionState(new Array[Byte](winDays), new Array[Byte](winDays)))
          it.foreach { e =>
            if (e.t >= 0 && e.t < winDays) {
              if (e.born) s.born(e.t) = 1
              if (e.target) s.target(e.t) = if (e.born) 2 else 1
            }
          }
          state.update(s)
          RetentionStats(uid,
            Seq(s.born.map(_.toLong).toSeq, s.target.map(_.toLong).toSeq))
      }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (attribution) join over the event table: each target event is
  * joined to the most recent source event at or before it for the same
  * user — e.g. attribute every purchase to the latest preceding click.
  *
  * Implementation note (custom-operator preference order): Spark's
  * DataFrame API has no as-of join, but per-key/time as-of semantics ARE
  * expressible with built-ins — one running-max window over the merged,
  * per-user-ordered event timeline — so no custom LogicalPlan/SparkPlan
  * is warranted (tier (a): compose existing ops). The plan is a single
  * shuffle on `user_id` + one in-partition sort, the same shape as
  * sessionization; at 100 TB both sides co-partition on the user key and
  * no all-pairs or range join ever materializes.
  */
object AsOf {

  /** One row per `targetType` event, with the timestamp of the latest
    * `sourceType` event at or before it (same user), or null when none
    * precedes. Ties on timestamp are ordered by `event_id` (a source row
    * with the same timestamp but later id does not qualify).
    */
  def latestPrior(
      events: DataFrame,
      targetType: String,
      sourceType: String,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .where(col(typeCol).isin(targetType, sourceType))
      .select(col(userCol), col(idCol), col(tsCol), col(typeCol))
      .withColumn("_src_ts",
        max(when(col(typeCol) === sourceType, col(tsCol))).over(w))
      .where(col(typeCol) === targetType)
      .drop(typeCol)
  }

  /** The forward as-of: one row per `targetType` event with the
    * timestamp (epoch µs) of the EARLIEST `sourceType` event strictly
    * after it in the same user's (ts, event_id) timeline, or null when
    * none follows — the label-construction join of training pipelines
    * ("next purchase after this click", time-to-event targets).
    * "Strictly after" means later in the (ts, id) order, so a source
    * sharing the target's timestamp but with a later id qualifies.
    *
    * Same single-shuffle shape as [[latestPrior]], with the running
    * extreme taken over the FOLLOWING frame (`rowsBetween(1, ∞)`)
    * instead of the preceding one.
    */
  def firstAfter(
      events: DataFrame,
      targetType: String,
      sourceType: String,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(1, Window.unboundedFollowing)
    events
      .where(col(typeCol).isin(targetType, sourceType))
      .select(col(userCol), col(idCol), col(tsCol), col(typeCol))
      .withColumn("_next_us",
        min(when(col(typeCol) === sourceType, unix_micros(col(tsCol)))).over(w))
      .where(col(typeCol) === targetType)
      .drop(typeCol)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over the event table — with retention, the
  * second canonical UBA aggregation family (the reference's domain is
  * cohort analytics over a flat event table; funnels are the same data
  * model queried for step progression).
  *
  * Semantics: a user reaches stage i when an event of step i occurs at or
  * after their stage-(i-1) timestamp, all within `windowDays` of their
  * first step-0 event. Earliest-qualifying timestamps throughout, so the
  * result is deterministic regardless of event order.
  *
  * Plan shape: ONE shuffle total. Events are filtered to the funnel's step
  * types (predicate pushed to the scan), grouped once on `user_id` into
  * per-step sorted timestamp arrays (partial+final hash agg — power users
  * combine map-side), and the funnel walk is a single projection over
  * those arrays. No windows, no per-stage joins (which fan out per-user
  * step events and re-shuffle per stage), no per-user state. Scales
  * linearly with events; per-user memory is bounded by that user's own
  * step-event count.
  */
object Funnel {

  /** Per-user funnel progression: one row per user who completed step 0,
    * with the qualifying timestamp per reached step and the final stage
    * count (1-based; `stage = steps.length` means full conversion).
    *
    * Semantics: t0 = user's first step-0 event; t_i = earliest step-i
    * event in [t_{i-1}, t0 + windowDays]; null propagates (an unreached
    * stage nulls all later stages).
    */
  def userStages(
      events: DataFrame,
      steps: Seq[String],
      windowDays: Int = 7,
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // one aggregation: per-user timestamp array per step (collect_list
    // drops the nulls of non-matching event types; order is irrelevant —
    // the walk below uses array_min)
    val perUser = events.where(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(
        collect_list(when(col(typeCol) === steps.head, col(tsCol))).as("_ts0"),
        steps.zipWithIndex.tail.map { case (step, i) =>
          collect_list(when(col(typeCol) === step, col(tsCol))).as(s"_ts$i")
        }: _*)
      .where(size(col("_ts0")) > 0) // funnel entry requires step 0
    // funnel walk as pure projections: earliest qualifying time per step
    val withT0 = perUser
      .withColumn("t0", array_min(col("_ts0")))
      .withColumn("deadline", col("t0") + expr(s"INTERVAL $windowDays DAYS"))
    val walked = steps.indices.tail.foldLeft(withT0) { (acc, i) =>
      val prev = col(s"t${i - 1}")
      // filter+array_min: null prev ⇒ null comparison ⇒ empty ⇒ null t_i
      acc.withColumn(s"t$i",
        array_min(filter(col(s"_ts$i"),
          x => x >= prev && x <= col("deadline"))))
    }
    walked.select(
      (col(userCol) +: steps.indices.map(i => col(s"t$i"))) :+
        steps.indices.map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
          .reduce(_ + _).as("stage"): _*)
  }

  /** Funnel with an EXCLUSION step (the "A then B then C with no X in
    * between" form every funnel product supports): a completion is
    * voided when an `excludeType` event falls strictly between the
    * user's step-0 time and their final-step time. One-row report:
    * `entered`, `completed` (reached the last step), `excluded`
    * (completed but voided), `clean_converted` (completed − excluded).
    *
    * Same ONE-shuffle shape as [[userStages]]: the exclusion stream is
    * just one more `collect_list` in the same per-user aggregate — no
    * second scan, no anti-join — and the void test is an `exists` over
    * that (small, per-user-bounded) array after the funnel walk. */
  def cleanReport(
      events: DataFrame,
      steps: Seq[String],
      excludeType: String,
      windowDays: Int = 7,
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(!steps.contains(excludeType),
      s"exclusion type $excludeType cannot also be a step")
    val perUser = events.where(col(typeCol).isin(steps :+ excludeType: _*))
      .groupBy(col(userCol))
      .agg(
        collect_list(when(col(typeCol) === steps.head, col(tsCol))).as("_ts0"),
        (steps.zipWithIndex.tail.map { case (step, i) =>
          collect_list(when(col(typeCol) === step, col(tsCol))).as(s"_ts$i")
        } :+
          collect_list(when(col(typeCol) === excludeType, col(tsCol))).as("_tsx")): _*)
      .where(size(col("_ts0")) > 0)
    val withT0 = perUser
      .withColumn("t0", array_min(col("_ts0")))
      .withColumn("deadline", col("t0") + expr(s"INTERVAL $windowDays DAYS"))
    val walked = steps.indices.tail.foldLeft(withT0) { (acc, i) =>
      acc.withColumn(s"t$i",
        array_min(filter(col(s"_ts$i"),
          x => x >= col(s"t${i - 1}") && x <= col("deadline"))))
    }
    val last = col(s"t${steps.length - 1}")
    val voided = last.isNotNull &&
      exists(col("_tsx"), x => x > col("t0") && x < last)
    walked.agg(
      count(lit(1)).as("entered"),
      sum(when(last.isNotNull, 1L).otherwise(0L)).as("completed"),
      sum(when(voided, 1L).otherwise(0L)).as("excluded"),
      sum(when(last.isNotNull && !voided, 1L).otherwise(0L)).as("clean_converted"))
  }

  /** Aggregate funnel report: users reaching each stage (monotone
    * decreasing), with conversion from stage 1. */
  def report(
      events: DataFrame,
      steps: Seq[String],
      windowDays: Int = 7): DataFrame = {
    val stages = userStages(events, steps, windowDays)
    stages.agg(
      count(lit(1)).as("entered"),
      steps.indices.map(i =>
        sum(when(col("stage") > i, 1L).otherwise(0L)).as(s"reached_${i + 1}")): _*)
  }
}

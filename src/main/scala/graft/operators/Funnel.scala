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
  * Plan shape: one aggregation per step (partial+final hash agg on
  * user_id) chained by equi-joins on user_id — no windows, no sorts, no
  * per-user state; every stage is a shuffle on the same key so Spark
  * reuses the partitioning. Scales linearly with events.
  */
object Funnel {

  /** Per-user funnel progression: one row per user who completed step 0,
    * with the qualifying timestamp per reached step and the final stage
    * count (1-based; `stage = steps.length` means full conversion). */
  def userStages(
      events: DataFrame,
      steps: Seq[String],
      windowDays: Int = 7,
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t0"))
      .withColumn("deadline", col("t0") + expr(s"INTERVAL $windowDays DAYS"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t${i - 1}"
      val stepTs = events.where(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("_st"))
      acc.join(stepTs, Seq(userCol), "left")
        .groupBy((col(userCol) +: col("deadline") +:
          (0 until i).map(j => col(s"t$j"))): _*)
        // min ignores nulls: t_i is the earliest step event inside
        // [t_{i-1}, deadline], or null when none qualifies (users with
        // unreached prior stages propagate null through the comparison)
        .agg(min(when(col("_st") >= col(prev) && col("_st") <= col("deadline"),
          col("_st"))).as(s"t$i"))
    }.select(
      (col(userCol) +: steps.indices.map(i => col(s"t$i"))) :+
        steps.indices.map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
          .reduce(_ + _).as("stage"): _*)
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

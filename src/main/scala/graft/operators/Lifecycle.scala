package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily growth accounting — the classic user-lifecycle decomposition
  * behind every "where did our actives come from" chart: each day's
  * active users split into `new` (first-ever day), `retained` (also
  * active the previous day), and `resurrected` (returning after a gap),
  * plus `churned` (active the previous day, absent today), which
  * satisfy `active(d) = new + retained + resurrected` and
  * `churned(d) = active(d−1) − retained(d)`.
  *
  * Plan shape at 100 TB: the raw event stream shuffles ONCE into the
  * distinct (user, day) table with map-side partials (same scale
  * argument as [[Anomaly.dailySpikes]]); one per-user window pass over
  * that much smaller table derives both the status of each active day
  * (via `lag`) and the churn marker for the day after a gap (via
  * `lead`); the final per-day aggregate is |days| rows. No joins, no
  * self-union — each (user, day) row explodes into at most two (day,
  * status) contributions inside the scan stage of the last aggregate.
  *
  * Churn on the day after a user's LAST observed day is reported too
  * (the window can't distinguish "gone" from "not yet observed"), so
  * the trailing day of the report is right-censored — callers comparing
  * against a fixed observation window should filter `day <= maxDay`.
  */
object Lifecycle {

  /** Per-day report: (day, new_users, retained_users, resurrected_users,
    * churned_users). */
  def growthAccounting(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val perDay = events
      .groupBy(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("_c")).drop("_c")
    val w = Window.partitionBy(col("user")).orderBy(col("day"))
    val marked = perDay
      .withColumn("_prev", lag(col("day"), 1).over(w))
      .withColumn("_next", lead(col("day"), 1).over(w))
    val status = when(col("_prev").isNull, "new")
      .when(datediff(col("day"), col("_prev")) === 1, "retained")
      .otherwise("resurrected")
    val churnsTomorrow =
      col("_next").isNull || datediff(col("_next"), col("day")) > 1
    marked
      .select(explode(array(
        struct(col("day"), status.as("status")),
        struct(date_add(col("day"), 1).as("day"),
          when(churnsTomorrow, "churned").as("status")))).as("x"))
      .select(col("x.day").as("day"), col("x.status").as("status"))
      .where(col("status").isNotNull)
      .groupBy(col("day"))
      .agg(
        count(when(col("status") === "new", 1)).as("new_users"),
        count(when(col("status") === "retained", 1)).as("retained_users"),
        count(when(col("status") === "resurrected", 1)).as("resurrected_users"),
        count(when(col("status") === "churned", 1)).as("churned_users"))
  }

  /** Churn LABEL builder — the supervised-training-data op behind every
    * churn model: one row per (user, week) with that week's activity
    * features and the binary target "was the user absent the FOLLOWING
    * week". Weeks are fixed calendar offsets from `startDay`
    * (`⌊days/7⌋`), and only weeks whose successor lies fully inside
    * the data horizon are labeled (`week ≤ maxWeek − 1`) — labeling
    * the last observable week would encode the dataset boundary as
    * churn, the classic target-leakage-by-truncation bug this operator
    * exists to prevent.
    *
    * Determinism: pure integer week arithmetic (`div 7` on day
    * offsets), label by the presence of the (user, week+1) activity
    * row — no timestamps in the output.
    *
    * Scale shape: one (user, week)-key aggregate over the events, then
    * a self left-join on the SAME (user, week) key (the shifted
    * successor table is a projection of the aggregate — the join
    * reuses its partitioning, no second corpus shuffle).
    *
    * Output: `(user_id, week, n_events, churned_next)`.
    */
  def churnLabels(
      events: DataFrame, startDay: String, maxWeek: Int,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(maxWeek >= 1, s"maxWeek must be >= 1, got $maxWeek")
    val wk = events.select(col(userCol).as("user_id"),
        expr(s"CAST(datediff(CAST(${tsCol} AS DATE), CAST('$startDay' AS DATE))" +
          s" AS BIGINT) div 7").as("week"))
      .where(col("week") >= 0 && col("week") <= maxWeek)
      .groupBy(col("user_id"), col("week")).agg(count(lit(1)).as("n_events"))
    val next = wk.select(col("user_id"), (col("week") - 1).as("week"),
      lit(1L).as("_active_next"))
    wk.where(col("week") <= maxWeek - 1)
      .join(next, Seq("user_id", "week"), "left")
      .select(col("user_id"), col("week"), col("n_events"),
        when(col("_active_next").isNull, 1L).otherwise(0L).as("churned_next"))
  }
}

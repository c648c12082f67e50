package graft.examples

import org.apache.spark.sql.functions._

import graft.{Graft, TestData}
import graft.SparkEntry.tbl
import graft.operators.{Anomaly, AsOf, Attribution, Funnel, Incremental, Lifecycle, Paths, Rfm, Sessions, Transitions}

/** End-to-end user-behavior analytics pipeline over the events table —
  * the integration story for the UBA operators (the reference's domain):
  * CDC-compact the event log → sessionize → funnel with report →
  * top user journeys → event-transition matrix → as-of and U-shaped
  * attribution → RFM segmentation → daily growth accounting →
  * per-user anomaly days.
  *
  * Every stage shares the same scale shape: ONE shuffle on the user key
  * (or none at all), aggregates combining map-side. On a cluster the
  * event table would be bucketed by `user_id` so the whole suite runs
  * with a single exchange total (see `ScaleSpec`'s bucketed-join
  * contract).
  *
  * Run: `sbt "runMain graft.examples.AnalyticsExample [sfDir]"`.
  */
object AnalyticsExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(TestData.dir("0.001"))
    val spark = Graft.localSession("analytics-example")
    val ev = tbl(spark, sfDir, "events")

    // 0. CDC compaction: the current per-user state ('error' = tombstone)
    val state = Incremental.applyChangelog(
      ev.withColumn("_ts_us", unix_micros(col("ts")))
        .withColumn("_del", col("event_type") === "error"),
      Seq("user_id"), Seq("_ts_us", "event_id"), "_del", Seq("event_type", "value"))
    println(s"live user states: ${state.count()}")

    // 1. sessions: gap-based, with duration percentiles
    Sessions.durationReport(ev, gapMinutes = 30).show(truncate = false)

    // 2. ordered funnel signup → click → purchase within 7 days
    Funnel.report(ev, Seq("signup", "click", "purchase"), windowDays = 7)
      .show(truncate = false)

    // 3. top user journeys (first 4 events per user)
    Paths.topPaths(ev, k = 4, topN = 10).show(truncate = false)

    // 4. where do users go next: first-order transition matrix
    Transitions.matrix(ev).orderBy(desc("p_transition")).show(10, truncate = false)

    // 5. attribution: last-touch as-of + position-based multi-touch
    val asOf = AsOf.latestPrior(ev, "purchase", "click")
    println(s"attributed purchases: ${asOf.where(col("_src_ts").isNotNull).count()}")
    Attribution.positionCredit(ev, convType = "purchase")
      .groupBy("channel").agg(sum("credit").as("credit_ppm"))
      .orderBy(desc("credit_ppm")).show(truncate = false)

    // 6. RFM segmentation over purchases
    Rfm.segments(ev)
      .groupBy(concat(col("r_score"), col("f_score"), col("m_score")).as("rfm"))
      .count().orderBy(desc("count")).show(5, truncate = false)

    // 7. daily growth accounting (new/retained/resurrected/churned)
    Lifecycle.growthAccounting(ev).orderBy("day").show(7, truncate = false)

    // 8. anomaly days (per-user volume z-score vs own history)
    println(s"anomalous user-days: ${Anomaly.dailySpikes(ev).count()}")

    spark.stop()
  }
}

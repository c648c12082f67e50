package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-user behavioral anomaly detection — the "which days were unusual
  * for THIS user" sweep behind UBA alerting: each user's daily event
  * volume scored against their own history, spike days flagged by
  * z-score.
  *
  * All moment arithmetic stays in EXACT integers until the final score:
  * the variance numerator is `n·Σc² − (Σc)²` — an integer that is ≥ 0
  * mathematically and exactly 0 for constant users, so the "no
  * variance" exclusion is an integer comparison, never a float-epsilon
  * test (a double `Σc² − (Σc)²/n` form can round to a tiny negative and
  * feed NaN through sqrt, which Spark orders ABOVE every threshold).
  *
  * Plan shape at 100 TB: the raw event stream shuffles ONCE into the
  * (user, day) count aggregate with map-side partials; the per-user
  * window then runs over that aggregated table — |users|·|days| rows,
  * orders of magnitude smaller than the stream, with per-partition
  * state bounded by one user's day count (≤366/year, unskewable by
  * definition).
  */
object Anomaly {

  /** Days where a user's event count exceeds `zThreshold` sample
    * standard deviations above their own mean. Users need at least
    * `minDays` active days and nonzero variance to be scored. */
  def dailySpikes(
      events: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      zThreshold: Double = 2.0, minDays: Int = 3): DataFrame = {
    require(minDays >= 2, s"minDays must be >= 2 for a sample variance, got $minDays")
    val byDay = events
      .groupBy(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("user"))
    val st = byDay
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .where(col("n") >= minDays &&
        col("n") * col("s2") - col("s1") * col("s1") > 0)
    // identical op order as the oracle SQL: mean, then the integer
    // variance numerator over n(n-1), then one sqrt and one division
    val mean = col("s1").cast("double") / col("n")
    val variance = (col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
      (col("n") * (col("n") - 1))
    val z = (col("c").cast("double") - mean) / sqrt(variance)
    st.where(z > zThreshold)
      .select(col("user").as(userCol), col("day"),
        col("c").as("n_events"), round(z, 6).as("z_score"))
  }

  /** Robust (median/MAD) outlier profile of a value column per group —
    * the heavy-tail-safe alternative to mean/stddev z-scores: per key,
    * the median, the median absolute deviation, and how many rows sit
    * more than `k` MADs from the median. MAD-based cuts don't move when
    * a whale user drags the mean, which is the point for revenue-like
    * columns.
    *
    * Two exact `percentile` passes (median of the values, then median of
    * |value − median|); both per-key cutoff tables are tiny (|keys|
    * rows) and join back by BROADCAST, so the big table is scanned three
    * times but never shuffled on a value key. At 100 TB swap
    * `percentile` for `approx_percentile` (mergeable, bounded memory) —
    * the same switch [[Rfm]] and [[Latency]] expose; exact is the
    * cross-engine-oracle form.
    *
    * Both medians interpolate exactly like DuckDB's `quantile_cont`, so
    * the outputs (rounded to 6dp) are oracle-stable.
    */
  def madOutlierStats(
      df: DataFrame, keyCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val v = df.select(col(keyCol).as("_k"), col(valCol).cast("double").as("_v"))
    val med = v.groupBy(col("_k"))
      .agg(expr("percentile(_v, 0.5)").as("_med"))
    val dev = v.join(broadcast(med), Seq("_k"))
      .withColumn("_dev", abs(col("_v") - col("_med")))
    val mad = dev.groupBy(col("_k"))
      .agg(expr("percentile(_dev, 0.5)").as("_mad"))
    dev.join(broadcast(mad), Seq("_k"))
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("n"),
        first(col("_med")).as("_m"), first(col("_mad")).as("_d"),
        sum(when(col("_dev") > lit(k) * col("_mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("_k").as(keyCol), col("n"), round(col("_m"), 6).as("med"),
        round(col("_d"), 6).as("mad"), col("n_outliers"))
  }
}

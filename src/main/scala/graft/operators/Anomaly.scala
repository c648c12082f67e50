package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // moments ride DECIMAL(38,0): a bot user at ~3e6 events/day makes
    // c² ≈ 1e13 and n·Σc² ≈ s1² ≈ 1e19 — past 2⁶³−1 in the long domain
    // (the dsirDeltaMicro overflow class); 38-digit decimals hold any
    // per-user daily-count profile a 100 TB stream can produce
    def dc(c: Column) = c.cast("decimal(38,0)")
    val w = Window.partitionBy(col("user"))
    val st = byDay
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(dc(col("c")) * col("c")).over(w))
      .where(col("n") >= minDays &&
        dc(col("n")) * col("s2") - dc(col("s1")) * col("s1") > 0)
    // identical op order as the oracle SQL: mean, then the integer
    // variance numerator over n(n-1), then one sqrt and one division
    val mean = col("s1").cast("double") / col("n")
    val variance = (dc(col("n")) * col("s2") - dc(col("s1")) * col("s1")).cast("double") /
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

  /** One-sided CUSUM change-point detection over a daily integer metric
    * (Page 1954) — the sequential drift detector behind "did this
    * metric shift upward, and on which day": per day, the running
    * statistic `s_d = max(0, s_{d−1} + (x_d − μ − k))` with reference
    * `μ = ⌊Σx / n_days⌋`, allowance `k = ⌊μ / slackDiv⌋`, and an alarm
    * when `s_d > h = ⌊μ / threshDiv⌋`. Gap days count as zeros (a dense
    * calendar axis is part of the semantics: a silent day PULLS the
    * statistic down). Complements [[dailySpikes]] (point anomalies) and
    * `Snapshot.psiDrift` (distribution drift): CUSUM accumulates many
    * small same-direction deviations a z-test misses.
    *
    * Exactness: all state is integer (the metric is integer, μ/k/h are
    * floor divisions), so the recurrence is engine- and partitioning-
    * exact. The recurrence is inherently sequential, which is FINE at
    * any corpus scale: the heavy stage is the one day-key aggregate
    * over the raw stream; the recurrence then runs inside ONE
    * `aggregate` higher-order call over the collected day axis — a
    * calendar-bounded (≤366/year) model-constant-sized array, the same
    * bounded-axis rule as the u17/u18 survival curves. */
  /** EWMA baseline + deviation over the dense daily axis — the
    * drifting-baseline complement of [[cusumDaily]] (CUSUM accumulates
    * small shifts against a FIXED mean; EWMA tracks a moving one, so a
    * slow organic trend doesn't page anyone while a step change shows
    * up as deviation-vs-yesterday's-baseline). α = 1/alphaDiv with the
    * update written as `s_d = ((alphaDiv−1)·s_{d−1} + x_d) div
    * alphaDiv`, `s_1 = x_1`: every operand is NON-NEGATIVE, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree and the
    * trajectory is engine-exact (a `(x − s) div k` form would diverge
    * on negative deviations). The relative deviation is ppm against
    * the PRIOR baseline with an explicit sign split for the same
    * reason, DECIMAL-widened before the multiply (the q35 overflow
    * rule); baseline 0 with nonzero volume → NULL (no meaningful
    * relative form). Missing calendar days count as zero volume.
    *
    * Scale shape: identical to [[cusumDaily]] — one day-key aggregate
    * over the stream, then the recurrence folds ONE `aggregate` HOF
    * over the calendar-bounded collected axis.
    *
    * Output: `(day, <valCol>, ewma, dev, dev_ppm)`, ewma AFTER the
    * day's update, dev/dev_ppm against the pre-update baseline.
    */
  def ewmaDaily(
      daily: DataFrame, dayCol: String, valCol: String,
      alphaDiv: Int = 4): DataFrame = {
    require(alphaDiv >= 2, s"alphaDiv must be >= 2, got $alphaDiv")
    val a1 = alphaDiv - 1
    val d = daily.select(col(dayCol).cast("date").as("_d"),
      col(valCol).cast("long").as("_v"))
    val axis = d.agg(min(col("_d")).as("_mn"), max(col("_d")).as("_mx"))
      .select(explode(sequence(col("_mn"), col("_mx"))).as("_d"))
    val dense = axis.join(d, Seq("_d"), "left")
      .select(col("_d"), coalesce(col("_v"), lit(0L)).as("_v"))
    dense
      .agg(sort_array(collect_list(struct(col("_d"), col("_v")))).as("_rows"))
      .select(explode(expr(
        s"""aggregate(
           |  _rows,
           |  named_struct('first', true, 's', 0L, 'out',
           |    cast(array() as array<struct<day:date,v:bigint,ewma:bigint,dev:bigint,dev_ppm:bigint>>)),
           |  (acc, x) -> named_struct(
           |    'first', false,
           |    's', CASE WHEN acc.first THEN x._v ELSE ($a1 * acc.s + x._v) div $alphaDiv END,
           |    'out', array_append(acc.out, named_struct(
           |      'day', x._d,
           |      'v', x._v,
           |      'ewma', CASE WHEN acc.first THEN x._v ELSE ($a1 * acc.s + x._v) div $alphaDiv END,
           |      'dev', CASE WHEN acc.first THEN 0L ELSE x._v - acc.s END,
           |      'dev_ppm', CASE WHEN acc.first THEN 0L
           |        WHEN x._v = acc.s THEN 0L
           |        WHEN acc.s > 0 AND x._v > acc.s
           |          THEN CAST((CAST(x._v - acc.s AS DECIMAL(38,0)) * 1000000) div acc.s AS BIGINT)
           |        WHEN acc.s > 0
           |          THEN CAST(-((CAST(acc.s - x._v AS DECIMAL(38,0)) * 1000000) div acc.s) AS BIGINT)
           |        ELSE CAST(NULL AS BIGINT) END))),
           |  acc -> acc.out)""".stripMargin)).as("_r"))
      .select(col("_r.day").as("day"), col("_r.v").as(valCol),
        col("_r.ewma").as("ewma"), col("_r.dev").as("dev"),
        col("_r.dev_ppm").as("dev_ppm"))
  }

  def cusumDaily(
      daily: DataFrame, dayCol: String, valCol: String,
      slackDiv: Int = 20, threshDiv: Int = 1): DataFrame = {
    require(slackDiv > 0 && threshDiv > 0,
      s"divisors must be positive: slackDiv=$slackDiv threshDiv=$threshDiv")
    val d = daily.select(col(dayCol).cast("date").as("_d"),
      col(valCol).cast("long").as("_v"))
    val axis = d.agg(min(col("_d")).as("_mn"), max(col("_d")).as("_mx"))
      .select(explode(sequence(col("_mn"), col("_mx"))).as("_d"))
    val dense = axis.join(d, Seq("_d"), "left")
      .select(col("_d"), coalesce(col("_v"), lit(0L)).as("_v"))
    // one row: the sorted (day, value) axis plus the integer params
    val one = dense.agg(
      sort_array(collect_list(struct(col("_d"), col("_v")))).as("_rows"),
      expr("sum(_v) div count(1)").as("_mu"))
      .withColumn("_k", expr(s"_mu div $slackDiv"))
      .withColumn("_h", expr(s"_mu div $threshDiv"))
    one.select(col("_mu").as("mu"), col("_k").as("k"), col("_h").as("h"),
        explode(expr(
          """aggregate(
            |  _rows,
            |  named_struct('s', 0L, 'out',
            |    cast(array() as array<struct<day:date,v:bigint,cusum:bigint>>)),
            |  (acc, x) -> named_struct(
            |    's', greatest(0L, acc.s + x._v - _mu - _k),
            |    'out', array_append(acc.out, named_struct(
            |      'day', x._d, 'v', x._v,
            |      'cusum', greatest(0L, acc.s + x._v - _mu - _k)))),
            |  acc -> acc.out)""".stripMargin)).as("_r"))
      .select(col("_r.day").as("day"), col("_r.v").as(valCol),
        col("_r.cusum").as("cusum"), (col("_r.cusum") > col("h")).as("alarm"),
        col("mu"), col("k"), col("h"))
  }
}

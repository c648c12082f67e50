package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) user segmentation — the classic
  * UBA scoring that buckets every user into quartiles per dimension.
  *
  * The naive form is `ntile(4) OVER (ORDER BY r)` three times — three
  * global sorts of the per-user table, each a single-partition
  * bottleneck at scale. Instead the quartile cutoffs are computed once
  * with an exact percentile aggregate (one tiny row) and broadcast back:
  * the full-data work is one shuffle of the event stream on `user_id`
  * plus two map-side scans, and no global sort anywhere.
  *
  * Scoring convention: each dimension scores 1–4 by quartile; recency
  * inverts (recent = high). Values *equal* to a cutoff land in the lower
  * bucket on both engines (strict `>` comparisons against identical
  * IEEE-interpolated cutoffs), unlike ntile, whose equal-value placement
  * depends on row order — another reason the cutoff form is the
  * reproducible one.
  */
object Rfm {

  /** Per-user RFM metrics and quartile scores over `valueEvent` events
    * (default `purchase`). Recency is measured in days from each user's
    * last value event to the corpus-wide last event day.
    *
    * `exactCutoffs = true` (the default, and the cross-engine-oracle
    * form) computes the quartile cutoffs with the exact `percentile`
    * aggregate, which funnels all per-user values through one final
    * aggregation buffer — fine to ~10⁷ users. Past that, set it false:
    * `approx_percentile` (a bounded-memory mergeable quantile summary
    * with map-side partials) computes cutoffs within 1/`accuracy`
    * rank error, which at production user counts moves a negligible
    * sliver of users across a cutoff while removing the single-reducer
    * memory ceiling. */
  def segments(
      events: DataFrame, valueEvent: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value",
      exactCutoffs: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val perUser = events.where(col("event_type") === valueEvent)
      .groupBy(col(userCol))
      .agg(
        max(to_date(col(tsCol))).as("_last_day"),
        count(lit(1)).as("f"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("m"))
    val asOf = events.agg(max(to_date(col(tsCol))).as("_asof"))
    // |users| rows, consumed twice (cutoff agg + scoring) — materialize
    // once, same rationale as Split.mixtureResample's checkpoint
    val rfm = perUser.crossJoin(broadcast(asOf))
      .withColumn("r_days", datediff(col("_asof"), col("_last_day")).cast("long"))
      .drop("_asof", "_last_day")
      .localCheckpoint()
    val qs = "array(0.25D, 0.5D, 0.75D)"
    def pct(c: String): Column =
      if (exactCutoffs) expr(s"percentile($c, $qs)")
      else expr(s"approx_percentile($c, $qs, $accuracy)").cast("array<double>")
    val cuts = rfm.agg(pct("r_days").as("_rc"), pct("f").as("_fc"), pct("m").as("_mc"))
    def above(v: Column, cutArr: Column): Column =
      (0 until 3).map(i => (v > element_at(cutArr, i + 1)).cast("int")).reduce(_ + _)
    rfm.crossJoin(broadcast(cuts))
      .select(col(userCol), col("r_days"), col("f"), round(col("m"), 6).as("m"),
        (lit(4) - above(col("r_days").cast("double"), col("_rc"))).as("r_score"),
        (lit(1) + above(col("f").cast("double"), col("_fc"))).as("f_score"),
        (lit(1) + above(col("m"), col("_mc"))).as("m_score"))
  }

  /** Per-user spend-trajectory slope — "is this customer's spend
    * growing or declining": the least-squares slope of purchase cents
    * against day offset, in exact integer micro-cents-per-day. The
    * per-user regression complement of [[segments]]' point-in-time
    * scores (RFM says where a user IS; the slope says where they're
    * HEADING — the feature churn and LTV models actually want).
    *
    * Engine-exact: the slope is the pure rational
    * `(n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx)` on integer (day, cents)
    * pairs, micro-quantized by floor division — and because the
    * numerator is SIGNED (declining spend) while Spark's `div`
    * truncates and DuckDB's `//` floors, the quantization is
    * sign-split (`sign · (|num|·10⁶ div den)`, truncation toward zero
    * on both engines). DECIMAL(38,0) moments (the zipfFit overflow
    * rule). Users whose purchases all land on one day have zero
    * x-variance → dropped (slope undefined).
    *
    * Scale shape: ONE user-key hash aggregate over the purchase rows —
    * the moments are plain sums, no window, no join, map-side
    * combined. Output: `(user_id, n_purchases, slope_micro)`.
    */
  def spendTrend(
      events: DataFrame, startDay: String, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val p = events.where(col("event_type") === "purchase")
      .select(col(userCol).as("user_id"),
        datediff(col(tsCol).cast("date"), lit(startDay).cast("date"))
          .cast("long").as("_x"),
        round(col(valueCol) * 100).cast("long").as("_y"))
    p.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(dec(col("_x")) * col("_x")).as("_sxx"),
        sum(dec(col("_x")) * col("_y")).as("_sxy"))
      .withColumn("_den",
        dec(col("n_purchases")) * col("_sxx") - dec(col("_sx")) * col("_sx"))
      .where(col("_den") > 0)
      .withColumn("_num",
        dec(col("n_purchases")) * col("_sxy") - dec(col("_sx")) * col("_sy"))
      .select(col("user_id"), col("n_purchases"),
        // sign-split quantization: truncation toward zero on both engines
        when(col("_num") >= 0,
          expr("CAST(_num * 1000000 div _den AS BIGINT)"))
          .otherwise(-expr("CAST((-_num) * 1000000 div _den AS BIGINT)"))
          .as("slope_micro"))
  }
}

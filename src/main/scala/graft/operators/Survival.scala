package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier-style life table for time-to-conversion analysis WITH
  * right-censoring — the censored complement of the `u17_survival`
  * query, whose deliberate simplification (users signing up near the
  * end of the window count as "surviving" forever) biases S(t) upward
  * at large t. Here a user who never converts leaves the risk set at
  * their observation horizon (the last day the data could have seen
  * them convert: the global max event day minus their birth day), so
  * per-day hazards are unbiased and a downstream KM product-limit
  * estimator can be built from the table directly.
  *
  * Day `t` (offset from each user's birth day) reports the classic
  * life-table row: `n_at_risk` (users still under observation and
  * unconverted entering day t — converters and censored users count at
  * risk ON their own exit day, the standard convention), `n_conv`
  * (conversions at t), `n_censored` (non-converters whose horizon is
  * t), and `hazard_ppm = floor(n_conv · 1e6 / n_at_risk)` — integer
  * parts-per-million so the output is engine-exact (no FP division in
  * any hashed column; a product-limit curve is one running product
  * over ≤ |calendar| rows downstream).
  *
  * Plan shape at 100 TB: the event stream shuffles ONCE on the user
  * key (birth aggregate and first-conversion join share it — the
  * [[Funnel]] argument); everything after is per-day aggregates of at
  * most |users| rows collapsing to |calendar| rows, and the running
  * sums over the day axis window a calendar-bounded frame (the
  * `u17_survival` argument), so the single-partition window is safe at
  * any scale. At-risk counts are derived by the complement identity
  * `n_at_risk(t) = (Nconv − converted_before_t) + (Nnon − censored_before_t)`
  * rather than exploding users × days.
  */
object Survival {

  /** Life table of days-to-first-`targetEvent` for users born at their
    * first `bornEvent`, right-censored at the global max event day.
    * Output: (t, n_at_risk, n_conv, n_censored, hazard_ppm), one row
    * per day offset 0..max horizon. */
  def lifeTable(
      events: DataFrame, bornEvent: String, targetEvent: String,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val s0 = events.where(col(typeCol) === bornEvent)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t0"))
    val maxDay = events.agg(to_date(max(col(tsCol))).as("_maxd"))
    // first conversion at-or-after birth, as a day offset from birth
    val conv = events.where(col(typeCol) === targetEvent).alias("e")
      .join(s0.alias("s"), col(s"e.$userCol") === col("s._u") &&
        col(s"e.$tsCol") >= col("s._t0"))
      .groupBy(col("s._u").as("_u"))
      .agg(min(to_date(col(s"e.$tsCol"))).as("_cday"))
    val per = s0.join(conv, Seq("_u"), "left")
      .crossJoin(broadcast(maxDay))
      .select(
        datediff(col("_cday"), to_date(col("_t0"))).cast("long").as("_dc"),
        datediff(col("_maxd"), to_date(col("_t0"))).cast("long").as("_h"))
    val convByDay = per.where(col("_dc").isNotNull)
      .groupBy(col("_dc").as("t")).agg(count(lit(1)).as("_nc_t"))
    val censByDay = per.where(col("_dc").isNull)
      .groupBy(col("_h").as("t")).agg(count(lit(1)).as("_nx_t"))
    val totals = per.agg(
      count(when(col("_dc").isNotNull, 1)).as("_nconv"),
      count(when(col("_dc").isNull, 1)).as("_nnon"),
      max(col("_h")).as("_maxh"))
    val axis = totals.select(
      explode(sequence(lit(0L), col("_maxh"))).as("t"),
      col("_nconv"), col("_nnon"))
    val wBefore = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    axis
      .join(convByDay, Seq("t"), "left")
      .join(censByDay, Seq("t"), "left")
      .select(col("t"),
        col("_nconv"), col("_nnon"),
        coalesce(col("_nc_t"), lit(0L)).as("n_conv"),
        coalesce(col("_nx_t"), lit(0L)).as("n_censored"))
      .withColumn("n_at_risk",
        (col("_nconv") - coalesce(sum(col("n_conv")).over(wBefore), lit(0L))) +
          (col("_nnon") - coalesce(sum(col("n_censored")).over(wBefore), lit(0L))))
      .withColumn("hazard_ppm",
        when(col("n_at_risk") > 0,
          expr("(n_conv * 1000000L) DIV n_at_risk")).otherwise(lit(0L)))
      .select(col("t"), col("n_at_risk"), col("n_conv"),
        col("n_censored"), col("hazard_ppm"))
  }

  /** Power-law fit of the day-0 cohort's retention curve — "does
    * retention decay like t^(−α), and how fast": least-squares slope
    * and r² of ln(retention_ppm) against ln(day offset) over days
    * 1..`horizon`, the log-log regression practitioners eyeball on
    * every retention plot made quantitative (shallow slope = sticky
    * habit product, steep slope = leaky funnel; r² says whether
    * power-law is even the right family vs an exponential cliff).
    *
    * Engine-exact despite being a regression — the [[Vocab.zipfFit]]
    * discipline verbatim: the per-day retention rate is integer ppm by
    * DECIMAL floor division, (x, y) = (ln k, ln r_ppm) are quantized
    * to integer micro-nats, all sums and the normal equations run in
    * decimal(38,0), and doubles appear only in the final two
    * divisions. Zero-retention days drop out (ln undefined — and a
    * zero breaks the power-law family anyway).
    *
    * Plan shape at 100 TB: the cohort (distinct day-0 users) joins the
    * distinct (user, offset) activity table on the USER key with the
    * shuffle-hash hint — never broadcast, cohorts scale with the
    * corpus; per-offset counts collapse to ≤ `horizon` rows and the
    * regression aggregates a `horizon`-row table. Two user-key
    * shuffles total.
    *
    * Output: one row `(n_days, slope, r2)`.
    */
  def retentionDecayFit(
      events: DataFrame, cohortDay: String, horizon: Int = 28,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(horizon >= 2, s"horizon must be >= 2, got $horizon")
    val day0 = lit(cohortDay).cast("date")
    val coh = events.where(col(tsCol).cast("date") === day0)
      .select(col(userCol).as("_u")).distinct()
    val act = events.select(col(userCol).as("_u"),
        datediff(col(tsCol).cast("date"), day0).cast("long").as("_k"))
      .where(col("_k") >= 1 && col("_k") <= horizon)
      .distinct()
    val nc = coh.agg(count(lit(1)).as("_n0"))
    val ret = act.join(coh.hint("shuffle_hash"), Seq("_u"))
      .groupBy(col("_k")).agg(count(lit(1)).as("_nret"))
      .crossJoin(broadcast(nc))
      .withColumn("_rppm",
        expr("CAST(CAST(_nret AS DECIMAL(38,0)) * 1000000 div _n0 AS BIGINT)"))
      .where(col("_rppm") > 0)
    Profile.logLogFit(ret, "_k", "_rppm", nName = "n_days")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic A/B experiment analysis over an event stream — the
  * measurement half of the UBA story (the reference's retention/funnel
  * operators describe behavior; experiment analysis decides launches).
  *
  * Variant assignment is a pure hash of (experiment, user) — no
  * assignment table, no join, no RNG: any engine that computes the same
  * md5 reproduces the exact cohort, re-runs are stable under
  * repartitioning, and concurrent experiments decorrelate via the
  * experiment name in the hash preimage (the same discipline as
  * [[Split.assignSplit]]'s buckets).
  *
  * Plan shape at 100 TB: ONE shuffle — the per-user conversion flag is a
  * map-side-combined hash aggregate on the user key; everything after
  * runs on |users| rows collapsing to |variants| rows, and the 1-row
  * control summary comes back via broadcast. The raw event stream is
  * never joined against an assignment table and never shuffled twice.
  */
object Experiment {

  /** Variant label for a user: "treatment" iff
    * md5("exp|" ∥ name ∥ "|" ∥ user) % 100 < treatedPct else "control". */
  def variant(name: String, user: Column, treatedPct: Int): Column = {
    require(treatedPct > 0 && treatedPct < 100,
      s"treatedPct must be in (0, 100), got $treatedPct")
    when(pmod(Dedup.hash60(
        concat_ws("|", lit("exp"), lit(name), user.cast("string"))),
      lit(100L)) < treatedPct, lit("treatment")).otherwise(lit("control"))
  }

  /** Two-proportion conversion report: one row per variant with user and
    * converter counts, conversion rate, relative lift vs control, and the
    * pooled two-proportion z statistic (control's own lift and z are
    * exactly 0). `converted` is any boolean row predicate — a user
    * converts iff some event satisfies it. Degenerate cohorts (0% or
    * 100% pooled conversion, zero control rate) report 0 instead of
    * dividing by zero, so the operator stays total under ANSI mode.
    * Floats go through a single fixed expression tree — the DuckDB
    * oracle spells the identical op order, so the rounded values are
    * bit-reproducible across engines.
    */
  def liftReport(
      events: DataFrame, converted: Column, userCol: String = "user_id",
      name: String = "exp1", treatedPct: Int = 50): DataFrame = {
    // one corpus-wide shuffle: per-user converted flag (partial max
    // map-side); the variant is derived per-row from the hash, so no
    // assignment join ever touches the event stream
    val perUser = events
      .groupBy(col(userCol).as("user"))
      .agg(max(when(converted, 1).otherwise(0)).as("conv"))
    val byVariant = perUser
      .select(variant(name, col("user"), treatedPct).as("variant"), col("conv"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
    val control = byVariant.where(col("variant") === "control")
      .select(col("n_users").as("c_users"), col("n_conv").as("c_conv"))
    // identical op order as the oracle SQL: pv, pc, pooled p, then
    // sqrt(pp * (1-pp) * (1/n_t + 1/n_c)) — each step one IEEE op
    val pv = col("n_conv").cast("double") / col("n_users")
    val pc = col("c_conv").cast("double") / col("c_users")
    val pp = (col("n_conv") + col("c_conv")).cast("double") /
      (col("n_users") + col("c_users"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_users") + lit(1.0) / col("c_users")))
    byVariant.crossJoin(broadcast(control))
      .select(col("variant"), col("n_users"), col("n_conv"),
        round(pv, 6).as("cvr"),
        round(when(pc === 0.0, lit(0.0)).otherwise((pv - pc) / pc), 6).as("lift"),
        round(when(se === 0.0, lit(0.0)).otherwise((pv - pc) / se), 6).as("z_score"))
  }

  /** Sample-ratio-mismatch (SRM) guardrail — the first check every
    * experiment platform runs before trusting a readout: a chi-square
    * test of the OBSERVED variant counts against the configured split.
    * A significant mismatch means assignment, logging, or filtering is
    * broken and every downstream metric is suspect (Fabijan et al.,
    * KDD'19 diagnosis taxonomy). For a two-cell split p:q (percent),
    * the statistic collapses to `χ² = 100·d²/(n·p·q)` with
    * `d = 100·o_t − n·p` — EXACT integer micro arithmetic by DECIMAL
    * cross-multiplication, no doubles at all. Flagged against the
    * χ²₁ 95th percentile (3.841459, as the integer micro literal).
    *
    * Scale shape: one user-distinct aggregate (the variant is a pure
    * row-local hash — no assignment join), then arithmetic on a 1-row
    * table.
    *
    * Output: one row
    * `(n_users, n_treatment, n_control, chi2_micro, srm)`.
    */
  def srmReport(
      events: DataFrame, userCol: String = "user_id",
      name: String = "exp1", treatedPct: Int = 50): DataFrame = {
    val p = treatedPct
    val q = 100 - treatedPct
    val users = events.select(col(userCol).as("user")).distinct()
    users
      .agg(count(lit(1)).as("_n"),
        coalesce(sum(when(
          variant(name, col("user"), treatedPct) === "treatment", 1L)), lit(0L))
          .as("_ot"))
      .select(col("_n").as("n_users"), col("_ot").as("n_treatment"),
        (col("_n") - col("_ot")).as("n_control"),
        expr(s"""CAST((100 * (100 * CAST(_ot AS DECIMAL(38,0)) - CAST(_n AS DECIMAL(38,0)) * $p)
                |  * (100 * CAST(_ot AS DECIMAL(38,0)) - CAST(_n AS DECIMAL(38,0)) * $p)
                |  * 1000000) div (CAST(_n AS DECIMAL(38,0)) * $p * $q) AS BIGINT)""".stripMargin)
          .as("chi2_micro"))
      .withColumn("srm", col("chi2_micro") > lit(3841459L))
  }

  /** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    * Walker, WSDM'13 — the industry-standard "Controlled experiments
    * Using Pre-Experiment Data" adjustment): per user, the experiment
    * metric `y` is debiased by the pre-period covariate `x` via
    * `y_adj = y − θ(x − x̄)` with `θ = Cov(x,y)/Var(x)`, shrinking
    * metric variance by the squared correlation ρ² without touching
    * the expected lift (θ is fit POOLED across variants; x predates
    * assignment, so the adjustment is unbiased).
    *
    * Per-variant adjusted means need no per-user adjusted rows:
    * `mean_adj_v = ȳ_v − θ(x̄_v − x̄)` follows from linearity, so the
    * whole report reads the per-user table twice-aggregated — one
    * user-key shuffle over the events (partial sums map-side), then
    * one |variants|-row aggregate plus a 1-row pooled-moment
    * broadcast.
    *
    * Engine-exact: all second moments are DECIMAL integer sums
    * (metric must be integer, e.g. cents); `n·Σxy − ΣxΣy`-style
    * centered moments stay in DECIMAL; doubles appear in one fixed
    * expression order for θ, means, and ρ² (the liftReport rule), so
    * rounded outputs are bit-reproducible. Zero pre-period variance →
    * θ = 0 (the report degrades to the unadjusted means); ρ² = 0 when
    * either variance is zero.
    *
    * Output: one row per variant —
    * `(variant, n_users, mean_y, mean_y_adj, theta, var_reduction_pct)`
    * with theta/ρ²·100 identical on every row (pooled constants).
    */
  def cupedReport(
      events: DataFrame, metric: Column, isPre: Column,
      userCol: String = "user_id", name: String = "exp1",
      treatedPct: Int = 50): DataFrame = {
    val perUser = events
      .groupBy(col(userCol).as("user"))
      .agg(coalesce(sum(when(isPre, metric)), lit(0L)).as("_x"),
        coalesce(sum(when(!isPre, metric)), lit(0L)).as("_y"))
    val u = perUser.select(
      variant(name, col("user"), treatedPct).as("variant"),
      col("_x").cast("long").as("_x"), col("_y").cast("long").as("_y"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pooled = u
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(dec(col("_x")) * col("_x")).as("_xx"),
        sum(dec(col("_x")) * col("_y")).as("_xy"),
        sum(dec(col("_y")) * col("_y")).as("_yy"))
      .select(col("_n"), col("_sx"),
        (dec(col("_n")) * col("_xx") - dec(col("_sx")) * col("_sx")).as("_Sxx"),
        (dec(col("_n")) * col("_xy") - dec(col("_sx")) * col("_sy")).as("_Sxy"),
        (dec(col("_n")) * col("_yy") - dec(col("_sy")) * col("_sy")).as("_Syy"))
    val byVar = u.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_x")).as("_vx"), sum(col("_y")).as("_vy"))
    val theta = when(col("_Sxx") === 0, lit(0.0))
      .otherwise(col("_Sxy").cast("double") / col("_Sxx").cast("double"))
    val xbar = col("_sx").cast("double") / col("_n")
    val meanY = col("_vy").cast("double") / col("n_users")
    val xbarV = col("_vx").cast("double") / col("n_users")
    val rho2 = when(col("_Sxx") === 0 || col("_Syy") === 0, lit(0.0))
      .otherwise(col("_Sxy").cast("double") * col("_Sxy").cast("double") /
        (col("_Sxx").cast("double") * col("_Syy").cast("double")))
    byVar.crossJoin(broadcast(pooled))
      .select(col("variant"), col("n_users"),
        round(meanY, 6).as("mean_y"),
        round(meanY - theta * (xbarV - xbar), 6).as("mean_y_adj"),
        round(theta, 6).as("theta"),
        round(rho2 * 100, 6).as("var_reduction_pct"))
  }
}

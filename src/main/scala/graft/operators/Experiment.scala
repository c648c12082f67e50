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
    * the statistic collapses to `χ² = d²/(n·p·q)` with
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
        expr(s"""CAST(((100 * CAST(_ot AS DECIMAL(38,0)) - CAST(_n AS DECIMAL(38,0)) * $p)
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

  /** Uplift-by-decile / Qini table (Radcliffe's Qini curve discretized
    * to equal-population score deciles) — the evaluation report for a
    * TARGETING model: rank every subject by the model score
    * (descending; decile 1 = most-targeted), then within each decile
    * compare the treatment and control arms' conversion rates. The
    * per-decile difference is the heterogenous treatment effect the
    * model claims to rank by; the cumulative Qini value
    * `Q(k) = cumPos_T(k) − cumPos_C(k)·cumN_T(k)/cumN_C(k)` is the
    * incremental conversions earned by treating only the top k
    * deciles — a good uplift model makes Q(k) rise steeply then
    * flatten.
    *
    * Exactness: deciles come from [[Layout.globalRank]]'s exact ranks
    * (the [[Profile.decileLift]] from-top indexing, ties split by the
    * tie column); rates are DECIMAL floor-division ppm and the Qini
    * value is micro-conversions via
    * `cumPos_T·10⁶ − (cumPos_C·cumN_T·10⁶ div cumN_C)` — written as a
    * DIFFERENCE OF NON-NEGATIVE floor divisions because Spark's `div`
    * truncates while DuckDB's `//` floors (they agree only on
    * non-negative operands). Bit-identical on any engine/partitioning.
    *
    * Scale shape: ranks from the bucketed two-phase global rank (no
    * global sort), one decile-key aggregate, and cumulative windows
    * over the `deciles`-row table (bounded by construction). The
    * variant never joins — it is either a row-local hash upstream or
    * a column already on the per-user table.
    *
    * Output: `deciles` rows `(decile, n_treat, n_ctrl, pos_treat,
    * pos_ctrl, rate_t_ppm, rate_c_ppm, uplift_ppm, qini_micro)`;
    * rate/uplift NULL when an arm is empty in the decile, qini NULL
    * while the cumulative control arm is empty.
    */
  def upliftDeciles(
      users: DataFrame, scoreCol: String, labelCol: String,
      variantCol: String, tieCol: String,
      deciles: Int = 10, buckets: Int = 256): DataFrame = {
    require(deciles >= 1, s"deciles must be >= 1, got $deciles")
    val keyed = users.select(col(scoreCol).cast("long").as("_sc"),
      col(labelCol).cast("long").as("_lb"),
      when(col(variantCol) === "treatment", 1L).otherwise(0L).as("_tr"),
      col(tieCol).as("_tie"))
    val ranked = Layout.globalRank(keyed, "_sc", "_tie", buckets)
    val tot = ranked.agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile",
        expr(s"CAST(((_n - rank) * $deciles) div _n AS INT) + 1"))
      .groupBy(col("decile"))
      .agg(sum(col("_tr")).as("n_treat"),
        (count(lit(1)) - sum(col("_tr"))).as("n_ctrl"),
        coalesce(sum(col("_lb") * col("_tr")), lit(0L)).as("pos_treat"),
        coalesce(sum(col("_lb") * (lit(1L) - col("_tr"))), lit(0L)).as("pos_ctrl"))
      // deciles-row table: the cumulative windows are bounded by construction
      .withColumn("_ct", sum(col("pos_treat")).over(w))
      .withColumn("_cc", sum(col("pos_ctrl")).over(w))
      .withColumn("_nt", sum(col("n_treat")).over(w))
      .withColumn("_nc", sum(col("n_ctrl")).over(w))
      .select(col("decile"), col("n_treat"), col("n_ctrl"),
        col("pos_treat"), col("pos_ctrl"),
        when(col("n_treat") === 0, lit(null)).otherwise(expr(
          "CAST(CAST(pos_treat AS DECIMAL(38,0)) * 1000000 div n_treat AS BIGINT)"))
          .as("rate_t_ppm"),
        when(col("n_ctrl") === 0, lit(null)).otherwise(expr(
          "CAST(CAST(pos_ctrl AS DECIMAL(38,0)) * 1000000 div n_ctrl AS BIGINT)"))
          .as("rate_c_ppm"),
        when(col("n_treat") === 0 || col("n_ctrl") === 0, lit(null)).otherwise(expr(
          """CAST(CAST(pos_treat AS DECIMAL(38,0)) * 1000000 div n_treat
            | - CAST(pos_ctrl AS DECIMAL(38,0)) * 1000000 div n_ctrl AS BIGINT)""".stripMargin))
          .as("uplift_ppm"),
        when(col("_nc") === 0, lit(null)).otherwise(expr(
          """CAST(CAST(_ct AS DECIMAL(38,0)) * 1000000
            | - CAST(_cc AS DECIMAL(38,0)) * _nt * 1000000 div _nc AS BIGINT)""".stripMargin))
          .as("qini_micro"))
  }
}

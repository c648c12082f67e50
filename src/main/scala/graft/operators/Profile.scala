package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column statistics in one distributed pass —
  * the "what is in this table" primitive a curation pipeline runs before
  * and after every transform (row counts, null rates, cardinalities,
  * ranges) to catch schema drift and silent data loss.
  *
  * Scale shape: the columns are melted row-wise with `stack` (a
  * Generate inside the scan stage — no Expand, no data duplication
  * across shuffles), then aggregated by column name. The exact
  * distinct count plans as Spark's standard two-stage distinct
  * aggregate: partial dedup on (column, value) before the final count,
  * so no single reducer ever sees raw rows. Sums run over DECIMAL so
  * the result is independent of partition order (a double sum is not
  * associative); the cast back to double is the last step.
  *
  * At 100 TB swap `n_distinct` for `approx_count_distinct` (mergeable
  * HLL++, no dedup shuffle) — the same exact-vs-sketch trade ScaleSpec
  * pins for percentile cutoffs.
  */
object Profile {

  /** One row per profiled column: (column_name, n, n_null, n_distinct,
    * vmin, vmax, vsum). `n` counts all rows; nulls are excluded from
    * the distinct/min/max/sum. Columns are cast to double, so this is
    * the numeric-column profile. */
  def numericProfile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val melted = df.select(
      expr(s"stack(${cols.length}, $stackArgs) AS (column_name, value)"))
    val nDistinct =
      if (exact) countDistinct(col("value"))
      else approx_count_distinct(col("value"))
    melted.groupBy(col("column_name")).agg(
      count(lit(1)).as("n"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
      nDistinct.as("n_distinct"),
      min(col("value")).as("vmin"),
      max(col("value")).as("vmax"),
      sum(col("value").cast("decimal(28,2)")).cast("double").as("vsum"))
  }

  /** Equi-depth histogram of a numeric column: k buckets bounded by the
    * interior `i/k` percentiles, with per-bucket counts and observed
    * value ranges — the distribution fingerprint a curation pipeline
    * tracks across corpus versions (equal-width histograms hide skewed
    * tails; equal-depth ones move their boundaries instead).
    *
    * Bucket boundaries come from the interpolated percentile aggregate
    * (`exact` / `accuracy` carry the same single-reducer-vs-sketch trade
    * as [[Latency.conversionReport]]); the row→bucket assignment is
    * `1 + |{cuts < value}|` computed against the broadcast k−1-element
    * cutoff array — one corpus scan, one tiny broadcast, one hash
    * aggregate on the bucket id. Interpolated cutoffs are either exactly
    * a data value (zero fractional rank — both engines return the lower
    * sample unchanged) or strictly between two samples, so the strict
    * comparison is engine-stable without rounding. */
  def equiDepthHistogram(
      df: DataFrame, valueCol: String, k: Int = 10,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    val probs = (1 until k).map(i => i.toDouble / k)
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val rows = df.select(col(valueCol).cast("double").as("value"))
      .where(col("value").isNotNull)
    val cuts = rows.agg(
      (if (exact) expr(s"percentile(value, $arr)")
       else expr(s"approx_percentile(value, $arr, $accuracy)").cast("array<double>"))
        .as("cuts"))
    rows.crossJoin(broadcast(cuts))
      .select(col("value"),
        (size(filter(col("cuts"), c => c < col("value"))) + 1).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
  }

  /** Pairwise mutual-information profile of two categorical columns —
    * the feature-association / leakage screen (is `lang` predictable
    * from `source`?). One row per observed (a, b) cell with its count,
    * pointwise MI, and MI contribution; the column MI is the sum of
    * `mi_contrib_micro` (exact integer sum — the per-cell micro-nat
    * quantization makes the total independent of summation order, the
    * same trick as [[Vocab.pmiTopPairs]]).
    *
    * `pmi_micro  = round(1e6 · ln(n_ab·N / (n_a·n_b)))`
    * `mi_contrib_micro = round(1e6 · (n_ab/N) · ln(n_ab·N / (n_a·n_b)))`
    *
    * Scale shape: ONE scan/shuffle of the input into the (a, b) cell
    * table; both margins and the total are re-aggregated from the cell
    * table itself (|cells| rows), and the joins back are broadcasts of
    * those margins. All log inputs are exact integer counts, so the
    * doubles are engine-identical.
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // rows with a null category are excluded from the distribution
    // entirely (an inner join on a null key would silently drop the
    // cell while its rows still inflated n_tot, breaking Σ mi = MI)
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("n_ab"))
    val ma = cells.groupBy(col("_a")).agg(sum(col("n_ab")).as("n_a"))
    val mb = cells.groupBy(col("_b")).agg(sum(col("n_ab")).as("n_b"))
    val tot = cells.agg(sum(col("n_ab")).as("n_tot"))
    val d = (c: Column) => c.cast("double")
    cells.join(broadcast(ma), Seq("_a"))
      .join(broadcast(mb), Seq("_b"))
      .crossJoin(broadcast(tot))
      .select(col("_a").as(aCol), col("_b").as(bCol), col("n_ab"),
        round(log(d(col("n_ab")) * d(col("n_tot")) /
          (d(col("n_a")) * d(col("n_b")))) * 1e6).cast("long").as("pmi_micro"),
        round(d(col("n_ab")) / d(col("n_tot")) *
          log(d(col("n_ab")) * d(col("n_tot")) /
            (d(col("n_a")) * d(col("n_b")))) * 1e6).cast("long")
          .as("mi_contrib_micro"))
  }

  /** Order-independent table checksum — the migration/replication
    * parity audit: `(n_rows, checksum)` where the checksum is the sum
    * of each row's 60-bit md5 over its '|'-joined canonical column
    * rendering, reduced mod 1e18 so it stays a BIGINT on every engine.
    * Two tables hold identical content (as rendered) iff both numbers
    * match, regardless of row order, partitioning, file layout, or
    * engine — the per-row hash-multiset equality the oracle harness
    * checks, packaged as one first-class aggregate any pair of systems
    * can compute independently.
    *
    * Callers pass CANONICAL columns (integers, strings, dates rendered
    * `yyyy-MM-dd`): raw doubles render differently across engines —
    * quantize or cast them first. `concat_ws` skips NULLs on both
    * engines, so NULL and absent collapse (sufficient for an equality
    * audit; add explicit `coalesce` markers if NULL-vs-empty must
    * distinguish). Scale shape: one scan, a map-side-partial sum —
    * nothing crosses the shuffle but per-partition (count, sum). */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum needs at least one column")
    df.select(Dedup.hash60(
        concat_ws("|", (lit("cks") +: cols.map(col)): _*)).as("_h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_h").cast("decimal(38,0)")).as("_s"))
      .select(col("n_rows"),
        pmod(col("_s"), lit(1000000000000000000L).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
  }

  /** Log-log least-squares fit — THE shared power-law regression
    * behind [[Vocab.zipfFit]] (rank–frequency), [[Survival.retentionDecayFit]]
    * (retention decay), and the g11 degree-distribution fit: slope and
    * r² of `ln(y) ~ ln(x)` over a table of POSITIVE (x, y) pairs.
    *
    * Engine-exact despite being a regression: (x, y) are quantized to
    * integer micro-nats (`round(ln·10⁶)`), every sum and the normal
    * equations `n·Σxy − Σx·Σy` run in decimal(38,0) (micro-nat x
    * reaches ~1.4e7, so Σx² passes the long range near 5·10⁴ rows and
    * cross-products near 1e20 at 10⁶ — 38-digit decimals hold both),
    * and doubles appear only in the final two divisions, identical on
    * any engine. Zero x-variance → NaN slope/r² (the standard
    * undefined-regression answer).
    *
    * Callers own positivity (filter zeros first — ln is undefined) and
    * the input's size contract: this aggregates whatever it is given,
    * so feed it the already-reduced table (a vocabulary, a histogram,
    * a retention curve), not the corpus. Output: one row
    * `(<nName>, slope, r2)`. */
  def logLogFit(
      df: DataFrame, xCol: String, yCol: String,
      nName: String = "n_points"): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val t = df.select(
      dec(round(log(col(xCol).cast("double")) * 1e6).cast("long")).as("_x"),
      dec(round(log(col(yCol).cast("double")) * 1e6).cast("long")).as("_y"))
    t.agg(
      count(lit(1)).as("_n"), sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(col("_x") * col("_x")).as("_sxx"), sum(col("_y") * col("_y")).as("_syy"),
      sum(col("_x") * col("_y")).as("_sxy"))
      .select(col("_n").as(nName),
        round((dec(col("_n")) * dec(col("_sxy")) - dec(col("_sx")) * dec(col("_sy")))
          .cast("double") /
          (dec(col("_n")) * dec(col("_sxx")) - dec(col("_sx")) * dec(col("_sx")))
            .cast("double"), 6).as("slope"),
        round(pow((dec(col("_n")) * dec(col("_sxy")) - dec(col("_sx")) * dec(col("_sy")))
          .cast("double"), 2) /
          ((dec(col("_n")) * dec(col("_sxx")) - dec(col("_sx")) * dec(col("_sx")))
            .cast("double") *
           (dec(col("_n")) * dec(col("_syy")) - dec(col("_sy")) * dec(col("_sy")))
            .cast("double")), 6).as("r2"))
  }

  /** Gini coefficient of a keyed non-negative weight column — the
    * one-number concentration audit ("do 1% of users generate 90% of
    * events?", "is one source dominating the token budget?"). Uses the
    * rank form over ascending weights, `G = (2·Σ i·xᵢ − (n+1)·Σx) /
    * (n·Σx)`, in exact DECIMAL integer arithmetic with floor division
    * at micro precision — bit-identical on any engine and any
    * partitioning. Ties cannot perturb the result: permuting equal
    * weights leaves `Σ i·xᵢ` unchanged, so the (weight, key) total
    * order is for engine determinism of the ranks only.
    *
    * Scale shape: the ranks come from [[Layout.globalRank]]'s bucketed
    * two-phase composite — two scans + one bin-key shuffle, NO global
    * sort and no one-reducer window — then one map-side-partial
    * moment aggregate. 0 = perfectly even, (n−1)/n → 1 = fully
    * concentrated. NULL when the weight sum is zero.
    *
    * Input is the already-aggregated `(key, weight)` table (build it
    * with the natural `groupBy(key).count()`); `weightCol` must be
    * non-negative, `keyCol` unique. */
  def giniConcentration(
      df: DataFrame, keyCol: String, weightCol: String): DataFrame = {
    val keyed = df.select(col(keyCol).as("_k"),
      col(weightCol).cast("long").as("_x"))
    val ranked = Layout.globalRank(keyed, "_x", "_k")
    def dec(c: Column) = c.cast("decimal(38,0)")
    ranked
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_s"),
        sum(dec(col("rank")) * dec(col("_x"))).as("_sx"))
      .select(col("_n").as("n_keys"), col("_s").cast("long").as("total"),
        when(coalesce(col("_s"), lit(0L)) === 0, lit(null))
          .otherwise(expr(
            """CAST(((2 * _sx - (CAST(_n AS DECIMAL(38,0)) + 1) * _s) * 1000000)
              | div (CAST(_n AS DECIMAL(38,0)) * _s) AS BIGINT)""".stripMargin))
          .as("gini_micro"))
  }

  /** Exact tie-aware AUC of an integer score against a binary label —
    * THE threshold-free metric for the filter classifiers a curation
    * pipeline trains (quality models, language ID, toxicity screens):
    * the probability a random positive outscores a random negative,
    * ties counting half. Uses the rank-sum (Mann–Whitney) identity
    * with AVERAGE ranks for ties; because [[Layout.globalRank]] gives
    * a tie group CONTIGUOUS ranks, its average rank is
    * `(min+max)/2`, so `2·Σ avgrank_pos = Σ_groups (min+max)·p_g` and
    * `AUC = (2R⁺ − n⁺(n⁺+1)) / (2 n⁺ n⁻)` is EXACT INTEGER
    * arithmetic end to end — micro-quantized by floor division,
    * bit-identical on any engine and partitioning.
    *
    * Scale shape: ranks from the bucketed two-phase global rank (no
    * global sort), one score-group aggregate, one 1-row total — the
    * score column is ranked once however many rows share a value.
    * NULL when either class is empty. `labelCol` must be 0/1,
    * `tieCol` unique, `scoreCol` integer (quantize doubles first —
    * micro-quantization is this library's standard score shape).
    *
    * Output: one row `(n_pos, n_neg, auc_micro)`.
    */
  def aucExact(
      df: DataFrame, scoreCol: String, labelCol: String, tieCol: String,
      buckets: Int = 256): DataFrame = {
    val keyed = df.select(col(scoreCol).cast("long").as("_sc"),
      col(labelCol).cast("long").as("_lb"), col(tieCol).as("_tie"))
    val ranked = Layout.globalRank(keyed, "_sc", "_tie", buckets)
    def dec(c: Column) = c.cast("decimal(38,0)")
    ranked.groupBy(col("_sc"))
      .agg(min(col("rank")).as("_mn"), max(col("rank")).as("_mx"),
        sum(col("_lb")).as("_p"), count(lit(1)).as("_m"))
      .agg(sum((dec(col("_mn")) + dec(col("_mx"))) * dec(col("_p"))).as("_s2"),
        sum(col("_p")).as("_np"), sum(col("_m")).as("_n"))
      .select(col("_np").cast("long").as("n_pos"),
        (col("_n") - col("_np")).cast("long").as("n_neg"),
        when(col("_np") === 0 || col("_n") === col("_np"), lit(null))
          .otherwise(expr(
            """CAST(((_s2 - CAST(_np AS DECIMAL(38,0)) * (_np + 1)) * 1000000)
              | div (2 * CAST(_np AS DECIMAL(38,0)) * (_n - _np)) AS BIGINT)""".stripMargin))
          .as("auc_micro"))
  }

  /** Decile-lift / capture table — the ranking-quality report that
    * accompanies [[aucExact]] when the score gates a BUDGET ("keep the
    * top 10%"): rows are ranked by score DESCENDING into `deciles`
    * equal-population buckets (decile 1 = best scores), and each
    * bucket reports its positive rate plus the CUMULATIVE share of all
    * positives captured down to it — "the top 2 deciles capture 70% of
    * the good documents" is the sentence this table produces.
    *
    * Exactness: buckets come from [[Layout.globalRank]]'s exact ranks
    * (`decile = ⌊(n − rank)·d/n⌋ + 1` — from-top indexing in pure
    * integers, ties split deterministically by the rank's tie column);
    * rates and captures are DECIMAL floor-division ppm. The cumulative
    * window runs over the `deciles`-row table (bounded by
    * construction).
    *
    * Output: `deciles` rows
    * `(decile, n, n_pos, pos_rate_ppm, cum_capture_ppm)`;
    * cum_capture_ppm NULL when there are no positives at all.
    */
  def decileLift(
      df: DataFrame, scoreCol: String, labelCol: String, tieCol: String,
      deciles: Int = 10, buckets: Int = 256): DataFrame = {
    require(deciles >= 1, s"deciles must be >= 1, got $deciles")
    val keyed = df.select(col(scoreCol).cast("long").as("_sc"),
      col(labelCol).cast("long").as("_lb"), col(tieCol).as("_tie"))
    val ranked = Layout.globalRank(keyed, "_sc", "_tie", buckets)
    val tot = ranked.agg(count(lit(1)).as("_n"), sum(col("_lb")).as("_np"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile",
        expr(s"CAST(((_n - rank) * $deciles) div _n AS INT) + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("_lb")).as("n_pos"),
        first(col("_np")).as("_np"))
      // deciles-row table: the cumulative window is bounded by construction
      .withColumn("_cum", sum(col("n_pos")).over(w))
      .select(col("decile"), col("n"), col("n_pos"),
        expr("CAST(CAST(n_pos AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("pos_rate_ppm"),
        when(col("_np") === 0, lit(null))
          .otherwise(expr(
            "CAST(CAST(_cum AS DECIMAL(38,0)) * 1000000 div _np AS BIGINT)"))
          .as("cum_capture_ppm"))
  }

  /** Reliability diagram + expected calibration error (ECE) for a
    * filter classifier's score against a binary label — the companion
    * report to [[aucExact]]/[[decileLift]]: AUC says the score RANKS
    * well; calibration says the score's magnitude can be read as a
    * keep-probability (the property a mixture pipeline needs when it
    * blends scores from different filter models, per Guo et al. 2017,
    * "On Calibration of Modern Neural Networks"). The raw integer
    * score is min-max normalized to a predicted ppm
    * (`(s − min)·10⁶ div (max − min)`; degenerate max = min maps to
    * 500000, the documented uninformative-score contract), binned into
    * `bins` equal-WIDTH prediction buckets (the reliability-diagram
    * convention — equal-population bins are [[decileLift]]'s job), and
    * each bin reports its mean prediction vs observed positive rate;
    * `ece_ppm = Σ n_b·|obs_b − pred_b| div N` is the standard
    * bin-weighted L1 gap, repeated on every row so the report is one
    * self-contained table.
    *
    * Exactness: every step is integer arithmetic over DECIMAL(38,0)
    * operands with floor division on non-negative numerators (gaps can
    * be negative but are only ever |·|'d or reported raw), so any SQL
    * engine reproduces it bit-for-bit.
    *
    * Scale shape: one scan-stage projection, one 1-row min/max global
    * aggregate broadcast back, one ≤`bins`-key hash aggregate
    * (map-side partial), and a 1-row ECE aggregate over the ≤`bins`-row
    * table broadcast onto it — nothing corpus-sized shuffles twice and
    * nothing is ordered globally.
    *
    * Output: ≤`bins` rows `(bin, n, n_pos, mean_pred_ppm,
    * pos_rate_ppm, gap_ppm, ece_ppm)`; empty bins are absent (their
    * weight in ECE is zero by definition). `labelCol` must be 0/1 and
    * `scoreCol` integral (micro-quantize doubles first — the library's
    * standard score shape). */
  def calibrationBins(
      df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // null-scored/-labeled rows are excluded (a row with no prediction
    // or no ground truth has no place on a reliability diagram — and
    // would otherwise form a phantom NULL bin)
    val s = df.select(col(scoreCol).cast("long").as("_sc"),
      col(labelCol).cast("long").as("_lb"))
      .where(col("_sc").isNotNull && col("_lb").isNotNull)
    val mm = s.agg(min(col("_sc")).as("_mn"), max(col("_sc")).as("_mx"))
    val pred = s.crossJoin(broadcast(mm))
      .withColumn("_pred",
        when(col("_mx") === col("_mn"), lit(500000L))
          .otherwise(expr(
            """CAST((CAST(_sc AS DECIMAL(38,0)) - _mn) * 1000000
              | div (CAST(_mx AS DECIMAL(38,0)) - _mn) AS BIGINT)""".stripMargin)))
      .withColumn("_bin",
        least(expr(s"CAST(_pred * $bins div 1000000 AS INT)"), lit(bins - 1))
          + lit(1))
    val g = pred.groupBy(col("_bin").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_lb")).as("n_pos"),
        sum(col("_pred")).as("_sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("CAST(CAST(_sp AS DECIMAL(38,0)) div n AS BIGINT)")
          .as("mean_pred_ppm"),
        expr("CAST(CAST(n_pos AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("pos_rate_ppm"))
      .withColumn("gap_ppm", col("pos_rate_ppm") - col("mean_pred_ppm"))
    val ece = g.agg(expr(
      """CAST(sum(CAST(n AS DECIMAL(38,0)) * abs(gap_ppm))
        | div sum(CAST(n AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
      .as("ece_ppm"))
    g.crossJoin(broadcast(ece))
  }

  /** Benford first-digit expectation, parts-per-million: `round(1e6 ·
    * log₁₀(1 + 1/d))`. THE single source for operator and oracle (the
    * SQL VALUES list is generated from this constant), so the contract
    * cannot drift. Sums to exactly 1,000,000. */
  val benfordExpectedPpm: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000))

  /** Benford's-law first-digit audit of a positive numeric column —
    * the classic fabricated-/degenerate-data screen for financial-ish
    * magnitudes (naturally-growing quantities follow
    * `P(d) = log₁₀(1+1/d)`; uniform or constructed data do not).
    * Rows with value < 1 are excluded (no first significant digit in
    * the integer part — the documented contract; scale sub-unit
    * columns up before auditing).
    *
    * Engine-exact: the digit is the first character of the BIGINT
    * integer part rendered as a string (no log₁₀ on data — floor +
    * string, identical everywhere); observed shares are integer ppm by
    * DECIMAL floor division; the expected shares are the
    * [[benfordExpectedPpm]] constants. Scale shape: one scan-stage
    * projection, one 9-key aggregate, a 1-row total broadcast, and a
    * 9-row expected table — nothing data-sized shuffles twice.
    *
    * Output: 9 rows `(digit, n, obs_ppm, exp_ppm, dev_ppm)` with
    * `dev_ppm = obs_ppm − exp_ppm` (zero-count digits included).
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val s = df.sparkSession
    val f = df.where(col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("string"), 1, 1)
        .cast("int").as("digit"))
    val c = f.groupBy(col("digit")).agg(count(lit(1)).as("_nd"))
    val tot = c.agg(sum(col("_nd")).as("_nt"))
    val exp = s.createDataFrame(benfordExpectedPpm).toDF("digit", "exp_ppm")
    val obsPpm =
      expr("CAST(CAST(coalesce(_nd, 0) AS DECIMAL(38,0)) * 1000000 div _nt AS BIGINT)")
    broadcast(exp).join(c, Seq("digit"), "left").crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("_nd"), lit(0L)).as("n"),
        obsPpm.as("obs_ppm"), col("exp_ppm"),
        (obsPpm - col("exp_ppm")).as("dev_ppm"))
  }
}

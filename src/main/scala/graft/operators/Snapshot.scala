package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit step between two versions of a
  * curated dataset: which documents were added, removed, changed, or
  * left untouched. Every training-data release pipeline runs this
  * before shipping version N+1 (and the status counts are the headline
  * of the release note).
  *
  * Plan shape at 100 TB: each snapshot is projected to (id, 64-bit
  * content hash) IN THE SCAN STAGE, so only 16-byte rows cross the
  * wire for the full-outer equi-join on the id — the join shuffles
  * both sides once on the id key (neither side of a corpus-sized diff
  * is broadcastable, so co-partitioned shuffle is the right shape).
  * "Changed" is hash-inequality: a 64-bit xxhash collision would
  * misreport a changed doc as unchanged with probability ~2⁻⁶⁴ per
  * pair — the standard trade for not shuffling document bodies.
  */
object Snapshot {

  /** Row-level diff: (idCol, status) with status ∈ added | removed |
    * changed | unchanged. `added`/`removed` are from the NEW snapshot's
    * perspective. */
  def diff(
      oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text"): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      xxhash64(col(contentCol)).as("_h_old"))
    val n = newSnap.select(col(idCol).as("id"),
      xxhash64(col(contentCol)).as("_h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("_h_old").isNull, "added")
          .when(col("_h_new").isNull, "removed")
          .when(col("_h_old") =!= col("_h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** One-row release-note summary of [[diff]]. */
  def report(
      oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text"): DataFrame = {
    diff(oldSnap, newSnap, idCol, contentCol).agg(
      count(when(col("status") === "added", 1)).as("added"),
      count(when(col("status") === "removed", 1)).as("removed"),
      count(when(col("status") === "changed", 1)).as("changed"),
      count(when(col("status") === "unchanged", 1)).as("unchanged"))
  }

  /** Population-stability-index drift report between a reference and a
    * current sample of a numeric column — the standard "did this
    * feature's distribution move between dataset versions" monitor
    * (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).
    *
    * `bins` equal-width buckets span the REFERENCE min/max (current
    * outliers clamp into the edge bins — drift beyond the reference
    * range must surface, not vanish into a NULL bin); both counts get
    * add-one smoothing so empty bins never divide by zero; each bin's
    * `(p−q)·ln(p/q)` contribution is quantized to integer micro-nats
    * (total PSI = exact integer sum of `psi_contrib_micro`, independent
    * of summation order — the [[Profile.mutualInfo]] discipline).
    *
    * Plan shape: one scan + tiny aggregate per side (min/max broadcast,
    * per-bin counts ≤ `bins` rows), everything downstream on
    * `bins`-row tables. All log inputs are exact smoothed integer
    * counts ⇒ engine-identical doubles.
    */
  def psiDrift(
      ref: DataFrame, cur: DataFrame, valCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = ref.sparkSession
    val v = col(valCol).cast("double")
    val mm = ref.agg(min(v).as("lo"), max(v).as("hi"))
    def binned(df: DataFrame): DataFrame = df.crossJoin(broadcast(mm))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(lit(bins - 1L), greatest(lit(0L),
          floor((v - col("lo")) * bins / (col("hi") - col("lo")))))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val all = spark.range(bins).select(col("id").as("bin"))
    val j = all
      .join(binned(ref).withColumnRenamed("n", "_n1"), Seq("bin"), "left")
      .join(binned(cur).withColumnRenamed("n", "_n2"), Seq("bin"), "left")
      .select(col("bin"), (coalesce(col("_n1"), lit(0L)) + 1).as("n1"),
        (coalesce(col("_n2"), lit(0L)) + 1).as("n2"))
    val t = j.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    j.crossJoin(broadcast(t))
      .select(col("bin"), (col("n1") - 1).as("n_ref"), (col("n2") - 1).as("n_cur"),
        round((d(col("n1")) / d(col("t1")) - d(col("n2")) / d(col("t2"))) *
          log((d(col("n1")) / d(col("t1"))) / (d(col("n2")) / d(col("t2")))) * 1e6)
          .cast("long").as("psi_contrib_micro"))
  }

  /** Exact two-sample Kolmogorov–Smirnov drift statistic — the BINLESS
    * complement of [[psiDrift]] (PSI needs an edge/bin choice and
    * smoothing; KS is `D = max_x |F_ref(x) − F_cur(x)|` over the raw
    * empirical CDFs, sensitive to any distributional change, including
    * shifts PSI's wide bins wash out). Computed EXACTLY in integers:
    * the per-value cross-multiplied gap `|c_ref(x)·n_cur −
    * c_cur(x)·n_ref|` is maximized in DECIMAL, and
    * `d_micro = ⌊max · 1e6 / (n_ref·n_cur)⌋` — no doubles anywhere,
    * bit-identical on any engine and partitioning.
    *
    * `valueCol` must be integer-quantized (cents/micro — the library's
    * standard score shape) with a DOMAIN-BOUNDED value range: the
    * cumulative sums run in one window over the DISTINCT-value table,
    * which is legitimate only when that table is bounded (the
    * calendar-axis rule — quantized money, day indexes, scores; NOT
    * free-form doubles). For unbounded domains, pre-bucket with
    * [[Profile.equiDepthHistogram]] cutoffs and accept the binning.
    *
    * Plan shape: one count aggregate per side, a full-outer merge on
    * the value (both sides distinct-value-sized), the bounded-domain
    * cumulative window, a 1-row broadcast of the totals, one max.
    *
    * Output: one row `(n_ref, n_cur, d_micro)`; NULL d when either
    * side is empty.
    */
  def ksDrift(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = ref.select(col(valueCol).cast("long").as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c1"))
    val b = cur.select(col(valueCol).cast("long").as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c2"))
    val m = a.join(b, Seq("_v"), "full_outer")
      .select(col("_v"), coalesce(col("_c1"), lit(0L)).as("_c1"),
        coalesce(col("_c2"), lit(0L)).as("_c2"))
    val t = m.agg(sum(col("_c1")).as("_n1"), sum(col("_c2")).as("_n2"))
    // bounded-domain window (see scaladoc): |distinct values| rows
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    m.withColumn("_f1", sum(col("_c1")).over(w))
      .withColumn("_f2", sum(col("_c2")).over(w))
      .crossJoin(broadcast(t))
      .agg(max(abs(dec(col("_f1")) * col("_n2") - dec(col("_f2")) * col("_n1")))
        .as("_d"), first(col("_n1")).as("_n1"), first(col("_n2")).as("_n2"))
      .select(col("_n1").cast("long").as("n_ref"),
        col("_n2").cast("long").as("n_cur"),
        when(col("_n1") === 0 || col("_n2") === 0, lit(null))
          .otherwise(expr(
            "CAST((_d * 1000000) div (CAST(_n1 AS DECIMAL(38,0)) * _n2) AS BIGINT)"))
          .as("d_micro"))
  }
}

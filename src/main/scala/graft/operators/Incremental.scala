package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the "update yesterday's rollup
  * with today's increment without re-reading the corpus" step every
  * 100 TB daily pipeline runs. For ADDITIVE metrics (counts, sums,
  * quantized-integer money — anything with an associative merge), the
  * maintained rollup is exactly
  * `base ⟗ increment` with per-key coalesce-sums: no raw-data re-read,
  * no recompute of untouched keys.
  *
  * Scale shape: the only full-size input is the increment (delta-sized,
  * aggregated with map-side partials before the merge join); the base
  * rollup is keys-sized — orders of magnitude smaller than the raw
  * corpus. The full-outer merge shuffles both on the key; at cluster
  * scale write the rollup bucketed by the key and the merge is
  * exchange-free on the base side. Metrics that are NOT additive
  * (distinct counts, percentiles) need sketches with an associative
  * merge (HLL, t-digest) — the approx family the library exposes
  * elsewhere — or a recompute of touched partitions.
  */
object Incremental {

  /** Merge an increment's rollup into a base rollup sharing `keys`;
    * every column in `metrics` (present in both inputs) is summed with
    * null-as-zero semantics. Keys present in only one side pass
    * through. */
  def mergeAdditive(
      base: DataFrame, inc: DataFrame,
      keys: Seq[String], metrics: Seq[String]): DataFrame = {
    require(keys.nonEmpty && metrics.nonEmpty, "need keys and metrics")
    val incR = metrics.foldLeft(inc) { (df, m) => df.withColumnRenamed(m, s"_inc_$m") }
    val merged = base.join(incR, keys, "full_outer")
    metrics.foldLeft(merged) { (df, m) =>
      df.withColumn(m,
        coalesce(col(m), lit(0L)) + coalesce(col(s"_inc_$m"), lit(0L)))
        .drop(s"_inc_$m")
    }.select((keys ++ metrics).map(col): _*)
  }

  /** Apply a CDC changelog: reduce an insert/update/delete event log to
    * the final table state — the latest version of every key, with keys
    * whose latest record is a tombstone (`deleteCol` true) absent. The
    * lakehouse MERGE/compaction semantics (Hudi/Delta/Iceberg CoW)
    * as one relational operator.
    *
    * `orderCols` must be a unique total order per key (e.g. ts then a
    * unique id) — the prefix decides the winner and the trailing
    * payload fields are never compared, so the result is deterministic.
    *
    * Scale shape: ONE shuffle on the key with a map-side-partial
    * `max(struct(order..., delete, payload...))` — version history
    * collapses inside each map task before anything crosses the wire;
    * no window over the version chain, no self-join. The tombstone
    * filter runs on the collapsed (keys-sized) result.
    */
  def applyChangelog(
      log: DataFrame, keys: Seq[String], orderCols: Seq[String],
      deleteCol: String, payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "need keys and orderCols")
    val versioned = struct(
      (orderCols.map(col) :+ col(deleteCol).as("_del")) ++ payload.map(col): _*)
    log.groupBy(keys.map(col): _*)
      .agg(max(versioned).as("_m"))
      .where(!col("_m._del"))
      .select(keys.map(col) ++ orderCols.map(c => col(s"_m.$c").as(c)) ++
        payload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Slowly-changing-dimension type-2 interval build from a change log
    * — the dimension-table side of the CDC story ([[applyChangelog]]
    * keeps only the LATEST version; SCD2 keeps them ALL, each with its
    * validity window, which is what point-in-time joins and training
    *-data as-of reconstruction consume). Two steps, both riding ONE
    * key-partitioned window pass:
    *
    *  1. collapse no-change rows — a version whose attribute equals the
    *     previous version's is noise, not history (`lag` compare on the
    *     attribute struct);
    *  2. close each surviving version at the NEXT surviving version's
    *     timestamp (`lead`), NULL meaning "current".
    *
    * `tieCol` must make (tsCol, tieCol) a unique total order per key —
    * the same determinism contract as [[applyChangelog]]'s orderCols.
    * `attrCols` must be non-null (struct comparison against a
    * null-bearing previous version is three-valued and would silently
    * keep the row — coalesce to a sentinel upstream if attributes can
    * be null).
    * Both windows partition on the key: one shuffle, per-partition
    * state bounded by a key's version chain. Validity is the standard
    * half-open `[valid_from, valid_to)`.
    *
    * Output: key, attrs, `valid_from`, `valid_to` (NULL = open),
    * `is_current`.
    */
  def scd2Intervals(
      changes: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2Intervals needs at least one attribute")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    val changed = changes
      .withColumn("_prev", lag(attrs, 1).over(w))
      .where(col("_prev").isNull || col("_prev") =!= attrs)
      .drop("_prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: attrCols.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}

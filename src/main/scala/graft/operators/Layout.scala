package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * At 100 TB the dominant cost of a selective two-column query is the
  * scan, and the dominant scan optimization is file skipping on
  * min/max column statistics. A single-column sort gives perfect
  * pruning on that column and none on any other; interleaving the bits
  * of two columns into one sort key (the Z-order curve) makes every
  * contiguous key range a small rectangle in (x, y) space, so parquet
  * row-group stats prune on BOTH columns. This is the layout operator
  * behind `OPTIMIZE ... ZORDER BY` in lakehouse engines, expressed here
  * as plain codegen-friendly column arithmetic + one range exchange —
  * no custom partitioner, no UDF.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `x` lands at output bit 2i,
    * bit i of `y` at 2i+1. A pure bitwise expression tree (shift/and/
    * add), fully inside whole-stage codegen; values above 2^bits fold
    * onto their low bits by construction.
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The write-side layout: range-partition on the z-value and sort
    * each partition by it, so every output file covers one contiguous
    * curve segment — a tight (x, y) rectangle for min/max pruning.
    * One range exchange (sampled bounds), one local sort, no global
    * sort. The `_z` key is kept in the output so writers can verify or
    * re-bucket; drop it before persisting if the storage schema is
    * fixed.
    */
  def zordered(
      df: DataFrame, xCol: String, yCol: String,
      partitions: Int, bits: Int = 16): DataFrame =
    df.withColumn("_z", zorder2(col(xCol), col(yCol), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))

  /** Locality audit: fixed-width buckets of the z-value with each
    * bucket's row count and (x, y) bounding box — the shape a skipping
    * engine would see as per-file min/max stats. Deterministic (no
    * partition ids, no sampling), so it is oracle-checkable; one
    * map-side-absorbed aggregate.
    */
  def zorderBucketStats(
      df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, bucketShift: Int = 16): DataFrame =
    df.select(zorder2(col(xCol), col(yCol), bits).as("_z"),
        col(xCol).as("_x"), col(yCol).as("_y"))
      .groupBy(shiftright(col("_z"), bucketShift).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("_x")).as("x_min"), max(col("_x")).as("x_max"),
        min(col("_y")).as("y_min"), max(col("_y")).as("y_max"))

  /** Distributed exact global rank (dense 1..N `row_number` over
    * `(valueCol, tieCol)` order) WITHOUT a single-partition window —
    * the operator behind global quantile normalization, percentile
    * labels, and exact top-N cuts at corpus scale.
    *
    * Two-phase bucketed rank: (1) rows are linearly binned between the
    * column's min and max into `buckets` value-ordered bins (bin edges
    * from one tiny min/max aggregate, broadcast); (2) per-bin counts
    * (≤`buckets` rows) get prefix-summed on the driver-sized bin table,
    * and each row's rank = its bin's offset + its `row_number` within
    * the bin. Bin monotonicity ⇒ the composite equals the global
    * `row_number` exactly.
    *
    * Scale shape: two scans of the input (min/max, then the ranked
    * projection), one shuffle on the bin id for the within-bin windows,
    * and a `buckets`-row broadcast — no global sort, no one-reducer
    * window. Per-window state is one bin (~N/buckets rows under a
    * roughly uniform value spread). A heavily value-skewed column makes
    * one bin hot — raise `buckets`, or pre-map values through an
    * equi-depth histogram ([[Lifecycle]] q23's cutoffs) so bins are
    * count-balanced; ties on a single hot VALUE are inherently serial
    * in any exact rank and need the tie column to spread them.
    *
    * Engine-exact: bin index arithmetic is the same IEEE double ops on
    * any engine, and window order `(value, tie)` must be total — pass a
    * unique `tieCol`. `valueCol` must be non-null (engines disagree on
    * NULL sort position — Spark sorts them first, DuckDB last — so a
    * null-bearing column has no engine-independent rank; filter or
    * coalesce first).
    */
  def globalRank(
      df: DataFrame, valueCol: String, tieCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("_lo"), max(v).as("_hi"))
    val binned = df.crossJoin(broadcast(mm))
      .withColumn("_bin",
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(lit(buckets - 1L),
            floor((v - col("_lo")) * buckets / (col("_hi") - col("_lo"))))))
      .drop("_lo", "_hi")
    val offsets = binned.groupBy(col("_bin")).agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("_bin"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_bin"), col("_offset"))
    // the offsets window is a |buckets|-row table: its single-partition
    // window is driver-sized by construction, never data-sized
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bin")).orderBy(col(valueCol), col(tieCol))
    binned.join(broadcast(offsets), Seq("_bin"))
      .withColumn("rank", col("_offset") + row_number().over(w))
      .drop("_bin", "_offset")
  }
}

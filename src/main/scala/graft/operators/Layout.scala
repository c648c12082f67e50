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
}

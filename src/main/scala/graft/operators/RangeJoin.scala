package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join: points joined to the intervals containing
  * them when NO equi key exists (the keyed case — per-user attribution
  * windows — is [[AsOf]]'s territory). A naive range join is a cartesian
  * product with a filter; the scalable form manufactures an equi key by
  * tiling the domain into fixed-width buckets: each interval replicates
  * to every bucket it overlaps (⌈len/width⌉ + 1 rows), each point maps
  * to exactly one bucket, the join runs on the bucket id, and the exact
  * `start ≤ p < end` predicate prunes the bucket-boundary false
  * positives.
  *
  * Scale shape: both sides shuffle once on the bucket id — an arbitrary
  * number of points and intervals join without any nested loop.
  * `bucketWidth` trades replication against bucket density: pick it near
  * the typical interval length so intervals replicate O(1) times; a
  * time-skewed workload (everything in one hot bucket) is plain equi-join
  * skew, which AQE's skew-join splitting already re-plans at runtime
  * (see `ScaleSpec`'s skew-join contract test).
  */
object RangeJoin {

  /** Joins each row of `points` to every `intervals` row whose
    * `[startCol, endCol)` half-open range contains `pointCol`. The two
    * inputs must have disjoint column names; empty or inverted intervals
    * (`end ≤ start`) match nothing. All domain columns are integral
    * (epoch days, epoch seconds, ids — any long-valued axis). */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pb = points.withColumn("_bkt", floor(col(pointCol) / bucketWidth))
    val ib = intervals
      .where(col(endCol) > col(startCol)) // sequence() would run backwards
      .withColumn("_bkt", explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    pb.join(ib, Seq("_bkt"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bkt")
  }

  /** Joins every `left` interval `[lStart, lEnd)` to every `right`
    * interval `[rStart, rEnd)` it overlaps (`lStart < rEnd ∧ rStart <
    * lEnd`), both sides tiled into `bucketWidth` buckets and joined on
    * the bucket id. A pair that shares several buckets is emitted
    * exactly ONCE — only the bucket containing `max(lStart, rStart)`
    * (the first bucket the two replicas both cover) keeps it — so no
    * pair-sized `distinct` shuffle is ever needed. Inputs must have
    * disjoint column names; empty/inverted intervals match nothing. */
  def intervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def tile(df: DataFrame, s: String, e: String): DataFrame =
      df.where(col(e) > col(s)).withColumn("_bkt", explode(sequence(
        floor(col(s) / bucketWidth), floor((col(e) - 1) / bucketWidth))))
    tile(left, lStart, lEnd).join(tile(right, rStart, rEnd), Seq("_bkt"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("_bkt") === floor(greatest(col(lStart), col(rStart)) / bucketWidth))
      .drop("_bkt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` re-deals rows whenever the partitioning, row order, or
  * cluster size changes — poison for reproducible train/val/test splits
  * over a corpus that is re-read many times. Hash-based assignment fixes
  * the split as a pure function of a stable id: no RNG state, no shuffle
  * (a projection, fused into whatever scan reads the data), identical on
  * any engine that can compute md5 — the same cross-engine-determinism
  * discipline as the rest of the library (see [[Dedup.hash60]]).
  */
object Split {

  /** Percent bucket in [0, 100) derived from the id's md5. */
  def hashBucket(id: Column): Column =
    pmod(Dedup.hash60(id.cast("string")), lit(100L))

  /** Adds `bucket` and `split` columns. `splits` maps names to integer
    * percentages summing to ≤ 100 (short weights leave a remainder that
    * falls into the last split), assigned in order over the hash bucket:
    * the default 90/5/5 sends bucket 0-89 to train, 90-94 to val, 95-99
    * to test. */
  def assignSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      s"split percentages must sum to <= 100: $splits")
    val b = hashBucket(col(idCol))
    val cuts = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val assign = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), rest) => when(b < cut, lit(name)).otherwise(rest)
    }
    df.withColumn("bucket", b).withColumn("split", assign)
  }
}

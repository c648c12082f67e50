package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One candidate inside a per-group sample buffer: the md5-derived sample
  * key and the row id it selects. Field order matters: the UDAF is
  * applied as `mink(h, id)`. */
case class SampleCand(h: Long, id: Long)

/** Bounded k-smallest aggregate over (hash, id) pairs — the deterministic
  * replacement for per-group reservoir sampling.
  *
  * A classic reservoir re-deals on every re-read (RNG + row order), and
  * the `row_number() OVER (PARTITION BY grp ORDER BY hash)` form shuffles
  * the *entire* input into |groups| partitions — a skew bottleneck when
  * one group dominates (exactly when sampling matters). This aggregate
  * keeps the k smallest sample keys per group in a k-element buffer, so
  * it runs partially map-side: at most k rows per (input partition,
  * group) cross the shuffle, regardless of group skew. Same altitude as
  * [[TopKAgg]], ordered ascending by a purpose-prefixed md5 key so the
  * selected sample is a pure function of (group, id) — stable across
  * partitioning, cluster size, and engines.
  */
class MinKAgg(k: Int)
    extends Aggregator[SampleCand, Seq[SampleCand], Seq[SampleCand]]
    with Serializable {
  require(k > 0, s"k must be positive, got $k")

  // total order: smaller hash first, then smaller id — identical to the
  // ORDER BY of the window formulation, so results are bit-compatible
  private def better(a: SampleCand, b: SampleCand): Boolean =
    a.h < b.h || (a.h == b.h && a.id < b.id)

  override def zero: Seq[SampleCand] = Vector.empty

  override def reduce(buf: Seq[SampleCand], x: SampleCand): Seq[SampleCand] =
    if (buf.size >= k && !better(x, buf.last)) buf // O(1) reject path
    else (buf :+ x).sortWith(better).take(k)

  override def merge(a: Seq[SampleCand], b: Seq[SampleCand]): Seq[SampleCand] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[SampleCand]): Seq[SampleCand] = r

  override def bufferEncoder: Encoder[Seq[SampleCand]] =
    ExpressionEncoder[Seq[SampleCand]]()
  override def outputEncoder: Encoder[Seq[SampleCand]] =
    ExpressionEncoder[Seq[SampleCand]]()
}

object GroupSample {

  /** Deterministic k-per-group sample: for each group, the k rows whose
    * purpose-prefixed md5 keys are smallest, with their sample rank.
    * Output: (groupCol, idCol, rk in 1..k).
    *
    * Like [[graft.operators.Split.stratifiedSample]] the draw nests —
    * the k=10 sample of a group is a prefix of its k=100 sample — and
    * any engine that can compute the same md5 reproduces it exactly
    * (the oracle uses `row_number() OVER (... ORDER BY hash, id)`). */
  def sampleKPerGroup(
      df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    val mink = udaf(new MinKAgg(k), Encoders.product[SampleCand])
    val h = Dedup.hash60(concat_ws("|", lit("gsmp"), col(idCol).cast("string")))
    df.select(col(groupCol), col(idCol).as("_id"), h.as("_h"))
      .groupBy(col(groupCol))
      .agg(mink(col("_h"), col("_id")).as("_sample"))
      .select(col(groupCol), posexplode(col("_sample")).as(Seq("_pos", "_c")))
      .select(col(groupCol), col("_c.id").as(idCol), (col("_pos") + 1).as("rk"))
  }
}

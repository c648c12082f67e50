package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate inside a top-k buffer. Field order matters: the
  * UDAF is applied as `topk(cos, neighbor_id)`. */
case class ScoredNeighbor(cos: Double, neighbor_id: Long)

/** Bounded top-k aggregate: keeps the k best (cos desc, neighbor_id asc)
  * rows per group in a k-element buffer.
  *
  * This replaces `row_number() OVER (PARTITION BY query_id)` for top-k
  * selection: the window form shuffles the *entire* scored set (all
  * |corpus|×|queries| rows) into |queries| partitions — a skew bottleneck
  * at scale — while an aggregate runs partially on the map side, so only
  * ≤ k rows per (input partition, query) ever cross the shuffle.
  */
class TopKAgg(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]]
    with Serializable {
  require(k > 0, s"k must be positive, got $k")

  // total order: higher cosine first, then lower id — identical to the
  // ORDER BY of the window formulation, so results are bit-compatible
  private def better(a: ScoredNeighbor, b: ScoredNeighbor): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.neighbor_id < b.neighbor_id)

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  override def reduce(buf: Seq[ScoredNeighbor], x: ScoredNeighbor): Seq[ScoredNeighbor] =
    if (buf.size >= k && !better(x, buf.last)) buf // O(1) reject path
    else (buf :+ x).sortWith(better).take(k)

  override def merge(a: Seq[ScoredNeighbor], b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = r

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
}

object TopK {

  /** `(query_id, neighbor_id, cos)` scored rows → `(query_id, neighbor_id,
    * cos rounded, rn)` top-k rows per query, via the bounded partial
    * aggregate above. Output is identical to the `row_number` window form
    * (same ordering, same rounding point). */
  def perQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[ScoredNeighbor])
    scored.groupBy(col("query_id"))
      .agg(topk(col("cos"), col("neighbor_id")).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_sn")))
      .select(col("query_id"), col("_sn.neighbor_id").as("neighbor_id"),
        round(col("_sn.cos"), 6).as("cos"), (col("_pos") + 1).as("rn"))
  }
}

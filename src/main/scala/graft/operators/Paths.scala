package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One event inside a per-user journey buffer: event-time micros, the
  * unique event id as the tie-break, and the event type that ends up in
  * the path string. Field order matters: the UDAF is applied as
  * `firstk(t, id, ev)`. */
case class PathEvt(t: Long, id: Long, ev: String)

/** Bounded first-k-by-event-time aggregate — the per-user journey prefix
  * without a stream-wide window function.
  *
  * The `row_number() OVER (PARTITION BY user ORDER BY ts)` formulation
  * shuffles the ENTIRE event stream into |users| window partitions and
  * sorts it, only to discard everything past the k-th row. This
  * aggregate keeps the k earliest events per user in a k-element buffer
  * with map-side partials, so at most k rows per (input partition, user)
  * cross the shuffle — the journey prefix costs one partial-combined
  * aggregation regardless of how many trailing events a power user has.
  * Total order (t, then id) matches the window form's ORDER BY, so the
  * selected prefix is engine-reproducible. Same altitude as [[MinKAgg]],
  * ordered by event time instead of a sample hash.
  */
class FirstKAgg(k: Int)
    extends Aggregator[PathEvt, Seq[PathEvt], Seq[PathEvt]]
    with Serializable {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: PathEvt, b: PathEvt): Boolean =
    a.t < b.t || (a.t == b.t && a.id < b.id)

  override def zero: Seq[PathEvt] = Vector.empty

  override def reduce(buf: Seq[PathEvt], x: PathEvt): Seq[PathEvt] =
    if (buf.size >= k && !better(x, buf.last)) buf // O(1) reject path
    else (buf :+ x).sortWith(better).take(k)

  override def merge(a: Seq[PathEvt], b: Seq[PathEvt]): Seq[PathEvt] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[PathEvt]): Seq[PathEvt] = r

  override def bufferEncoder: Encoder[Seq[PathEvt]] =
    ExpressionEncoder[Seq[PathEvt]]()
  override def outputEncoder: Encoder[Seq[PathEvt]] =
    ExpressionEncoder[Seq[PathEvt]]()
}

/** Top user journeys — the "what do users actually do first" mining
  * behind every UBA path/Sankey report: each user's first `k` events in
  * event-time order joined into a path string, counted across users,
  * truncated to the `topN` most common journeys.
  *
  * Plan shape at 100 TB: ONE shuffle on the user key feeding the bounded
  * [[FirstKAgg]] (≤k rows per partition-user cross the wire, no window
  * function ever sees the raw stream), then a hash aggregate on the path
  * string — |users| rows in, |distinct paths| out, partials map-side —
  * and a global top-N via TakeOrderedAndProject (topN rows per partition
  * cross the final single-partition boundary). The ordering
  * (n_users desc, then path) is total, so the report is deterministic.
  */
object Paths {

  def topPaths(
      events: DataFrame, k: Int = 5, topN: Int = 20,
      userCol: String = "user_id", eventCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val firstk = udaf(new FirstKAgg(k), Encoders.product[PathEvt])
    events.select(col(userCol).as("user"),
        unix_micros(col(tsCol)).as("t"), col(idCol).cast("long").as("id"),
        col(eventCol).as("ev"))
      .groupBy(col("user"))
      .agg(firstk(col("t"), col("id"), col("ev")).as("_evts"))
      .select(concat_ws(">", transform(col("_evts"), _.getField("ev"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topN)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
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

  /** Per-batch ceiling on [[behaviorTwins]]' broadcast query side. 10⁴
    * query users × ≤ a few hundred trigrams each is tens of MB —
    * comfortably inside executor broadcast budgets; bigger query sets
    * are split into batches of this size and unioned (exact — results
    * are per-query-user independent). */
  val MaxQueryUsers: Int = 10000

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

  /** Behavioral twins — top-k LOOKALIKE users per query user, ranked by
    * exact Jaccard over journey trigrams (consecutive event-type
    * triples in event-time order). "Find users who behave like these"
    * is the audience-expansion / churn-lookalike primitive; [[topPaths]]
    * mines what journeys exist, this finds WHO shares them.
    *
    * Exactness: trigram sets are distinct (user, e₁>e₂>e₃) rows from an
    * (ts, event_id)-ordered double-`lead`; `jaccard_ppm =
    * ⌊|A∩B|·1e6 / |A∪B|⌋` in integer arithmetic; ranking ties break on
    * neighbor id, so the report is total-ordered on any engine.
    *
    * Scale shape: the trigram key has a BOUNDED domain (|event types|³),
    * so an inverted-index self-join on it would skew onto a handful of
    * hot keys — instead the tiny query side (|Q| users × ≤ that domain)
    * BROADCASTS and the corpus trigram table is probed in place, the
    * s1-ann discipline: the corpus is never shuffled on the gram key.
    * Candidates are bounded by |Q|·|users|; the (query, neighbor)
    * intersection aggregate and the per-query top-k window both run on
    * that query-bounded table. One user-key shuffle builds trigrams
    * (the lead window) and the distinct + size aggregates ride it.
    *
    * Output: (query_user, neighbor_user, n_shared, jaccard_ppm, rank)
    * for rank ≤ k. Users with < 3 events have no trigrams and appear on
    * neither side.
    *
    * CONTRACT — each BROADCAST batch is ≤ [[MaxQueryUsers]] query users:
    * the design rests on the query side fitting in an executor
    * broadcast (|Q| × ≤|types|³ trigram rows). Callers may pass ANY
    * query-user count: per-query-user results are independent and exact
    * under batching, so an oversized set is split into
    * ⌈|Q|/10⁴⌉ broadcast batches and unioned — identical rows to the
    * single-batch plan, never a corpus-sized broadcast.
    *
    * EAGER when batching engages (|Q| > [[MaxQueryUsers]]): the corpus
    * trigram and size tables are `localCheckpoint()`ed so the union
    * probes ONE materialized corpus pass instead of re-deriving the
    * lead-window per batch — constructing the DataFrame then runs Spark
    * jobs (the [[graft.operators.Vocab.tfIdfTopTerms]] trade). On a
    * cluster the analogue is a persisted/checkpointed trigram table
    * shared by all batches. */
  def behaviorTwins(
      events: DataFrame, queryUsers: Seq[Long], k: Int = 5,
      userCol: String = "user_id", eventCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(queryUsers.nonEmpty, "behaviorTwins needs at least one query user")
    require(k > 0, s"k must be positive, got $k")
    // dedupe first: a user repeated across batches would duplicate its
    // output rows, where the single-batch isin treats it as a set
    val qs = queryUsers.distinct
    val w = Window.partitionBy(col("_u")).orderBy(col("_t"), col("_id"))
    val tri = events.select(col(userCol).cast("long").as("_u"),
        unix_micros(col(tsCol)).as("_t"), col(idCol).cast("long").as("_id"),
        col(eventCol).as("_e"))
      .select(col("_u"), col("_e"),
        lead(col("_e"), 1).over(w).as("_e2"), lead(col("_e"), 2).over(w).as("_e3"))
      .where(col("_e3").isNotNull)
      .select(col("_u"), concat_ws(">", col("_e"), col("_e2"), col("_e3")).as("_g"))
      .distinct()
    val sizes = tri.groupBy(col("_u")).agg(count(lit(1)).as("_n"))
    if (qs.size <= MaxQueryUsers) twinsBatch(tri, sizes, qs, k)
    else {
      val t = tri.localCheckpoint()
      val sz = sizes.localCheckpoint()
      qs.grouped(MaxQueryUsers)
        .map(b => twinsBatch(t, sz, b, k))
        .reduce(_ union _)
    }
  }

  /** One broadcast batch of [[behaviorTwins]] over pre-built trigram
    * (`_u`, `_g`) and size (`_u`, `_n`) tables. `batch.size` ≤
    * [[MaxQueryUsers]] by construction.
    *
    * The query-user screen is a broadcast semi-join against a local
    * id relation, NOT an `isin` literal list: at the 10⁶-user scale
    * batching exists for, ⌈|Q|/10⁴⌉ union branches × 10⁴ `In`-list
    * literals each put ~10⁶ expression nodes in ONE plan — Catalyst
    * analysis/codegen time and driver memory blow up even though every
    * broadcast is bounded. A 10⁴-row broadcast relation per branch
    * keeps the plan linear in the number of branches. */
  private def twinsBatch(
      tri: DataFrame, sizes: DataFrame, batch: Seq[Long], k: Int): DataFrame = {
    import tri.sparkSession.implicits._
    val ids = broadcast(batch.toDF("_u"))
    val q = tri.join(ids, Seq("_u"), "left_semi")
      .select(col("_u").as("_qu"), col("_g"))
    val qn = sizes.join(ids, Seq("_u"), "left_semi")
      .select(col("_u").as("_qu"), col("_n").as("_qn"))
    val inter = tri.join(broadcast(q), Seq("_g"))
      .where(col("_u") =!= col("_qu"))
      .groupBy(col("_qu"), col("_u")).agg(count(lit(1)).as("_i"))
    val scored = inter
      .join(broadcast(qn), Seq("_qu"))
      .join(sizes, Seq("_u"))
      .select(col("_qu").as("query_user"), col("_u").as("neighbor_user"),
        col("_i").as("n_shared"),
        expr("CAST((_i * CAST(1000000 AS BIGINT)) div (_qn + _n - _i) AS BIGINT)")
          .as("jaccard_ppm"))
    val wr = Window.partitionBy(col("query_user"))
      .orderBy(col("jaccard_ppm").desc, col("neighbor_user"))
    scored.withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }
}

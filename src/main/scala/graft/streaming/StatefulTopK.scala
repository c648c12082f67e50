package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.functions.Text
import graft.operators.MisraGriesAgg

/** One tokenized stream element, pre-bucketed by token hash. */
case class BucketedToken(bucket: Int, token: String)

/** Per-bucket streaming state: tokens seen (monotone) + the bucket's
  * current Misra-Gries counters (bounded by capacity). */
case class TopKState(n_total: Long, counters: Map[String, Long])

/** One bucket's summary, emitted every micro-batch the bucket receives
  * data. `n_total` is monotone, so the row with the bucket's max
  * `n_total` in an update-mode sink is its latest state. */
case class BucketSummary(bucket: Int, n_total: Long, counters: Map[String, Long])

/** Streaming heavy hitters — the "top tokens right now" monitor over an
  * unbounded ingest stream, the streaming counterpart of
  * [[graft.operators.HeavyHitters.topTokens]].
  *
  * Tokens are hash-partitioned into `buckets` groups and each group
  * keeps ONE Misra-Gries summary in `mapGroupsWithState` state, so
  * total driver-visible state is ≤ buckets × capacity counters no
  * matter how large the vocabulary grows — the property that makes the
  * monitor safe on an unbounded stream. A term lives in exactly one
  * bucket, so its counter is a true Misra-Gries sketch of that bucket's
  * substream: undercount ≤ N_bucket/(capacity+1), guaranteed presence
  * above that bound, and with capacity ≥ the bucket's distinct-token
  * count the counts are exact (the regime the parity test pins). The
  * bucketing also spreads sketch maintenance across the shuffle's
  * partitions instead of funnelling every token through one state row.
  */
object StatefulTopK {

  /** Tokenize a text stream and bucket each token by hash. */
  def shapeTokens(
      docs: DataFrame, textCol: String = "text",
      buckets: Int = 16): Dataset[BucketedToken] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(Text.tokens(lower(col(textCol)))).as("token"))
      .select(pmod(xxhash64(col("token")), lit(buckets)).cast("int").as("bucket"),
        col("token"))
      .as[BucketedToken]
  }

  /** Fold each micro-batch's tokens into the bucket's Misra-Gries state
    * and emit the bucket's current summary. NoTimeout: the monitor is
    * lifelong by design and its state is capacity-bounded, so there is
    * nothing to evict. */
  def bucketSummaries(
      tokens: Dataset[BucketedToken],
      capacity: Int = 4096): Dataset[BucketSummary] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val mg = new MisraGriesAgg(capacity)
    tokens.groupByKey(_.bucket)
      .mapGroupsWithState[TopKState, BucketSummary](GroupStateTimeout.NoTimeout) {
        (bucket, it, state) =>
          val prev = state.getOption.getOrElse(TopKState(0L, Map.empty))
          var n = prev.n_total
          val merged = it.foldLeft(prev.counters) { (m, t) =>
            n += 1; mg.reduce(m, t.token)
          }
          val next = TopKState(n, merged)
          state.update(next)
          BucketSummary(bucket, next.n_total, next.counters)
      }
  }

  /** Batch rollup of an update-mode [[bucketSummaries]] sink: latest
    * summary per bucket (max `n_total`), then a global top-k. Terms are
    * bucket-disjoint, so no cross-bucket merge is needed — the rollup
    * reads ≤ buckets × capacity counters. Deterministic
    * (n desc, term asc) order, same as the batch operator. */
  def topK(summaries: DataFrame, k: Int = 20): DataFrame =
    summaries.groupBy(col("bucket"))
      .agg(max_by(col("counters"), col("n_total")).as("counters"))
      .select(explode(col("counters")).as(Seq("term", "n")))
      .orderBy(col("n").desc, col("term")).limit(k)
}

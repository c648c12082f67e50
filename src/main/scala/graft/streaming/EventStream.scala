package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming forms of the UBA aggregations. The reference is
  * batch-only (no streaming code exists in the crate); these are the
  * stream-native equivalents of its event-table analytics, built on
  * event-time windows + watermarks so state is bounded on unbounded
  * input. Each transform works identically on a batch DataFrame (Spark's
  * unified semantics), which is how the tests assert correctness:
  * stream(file source → memory sink) must equal batch.
  */
object EventStream {

  /** Tumbling-window event profile: per (window, event_type) counts and
    * value sums. Watermark bounds the aggregation state. */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact deduplication of a document/event stream by content
    * hash — the ingest-time form of [[graft.operators.Dedup.exact]]: the
    * first arrival of each content hash passes, later copies are
    * dropped. `dropDuplicatesWithinWatermark` keys state on the hash and
    * evicts each entry once its event time falls behind the watermark by
    * more than the delay, so state is bounded by the dedup horizon
    * (exactly the semantics an ingest pipeline wants: duplicates arrive
    * close together; a re-crawl months later is a new document).
    * On a batch DataFrame this degrades to plain `dropDuplicates` over
    * the hash — the parity tests' contract. */
  def dedupedByContent(
      docs: DataFrame, textCol: String = "text",
      watermark: String = "1 hour"): DataFrame = {
    val hashed = docs.withColumn("content_hash",
      graft.functions.Text.docHash(col(textCol)))
    if (hashed.isStreaming)
      hashed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }

  /** Streaming incremental dedup against an existing corpus — the
    * streaming form of [[graft.operators.Dedup.incrementalNew]]: the
    * arriving stream is first deduplicated within itself by content
    * hash ([[dedupedByContent]] — watermark-bounded state), then
    * anti-joined per micro-batch against the static corpus's content
    * hashes, so only documents new to BOTH the stream horizon and the
    * corpus pass. The static side is a stream-static join (re-read
    * every micro-batch — a corpus manifest refresh is picked up without
    * restarting the query); at 100 TB the manifest is the stored
    * `content_hash` column, bucketed by hash, and each micro-batch
    * shuffles only itself. On batch inputs the same code degrades to
    * [[graft.operators.Dedup.incrementalNew]]'s shape (the parity
    * tests' contract). */
  def incrementalNewByContent(
      docs: DataFrame, corpus: DataFrame, textCol: String = "text",
      watermark: String = "1 hour"): DataFrame = {
    val corpusHashes = corpus.select(
      graft.functions.Text.docHash(col(textCol)).as("content_hash"))
    dedupedByContent(docs, textCol, watermark)
      .join(corpusHashes, Seq("content_hash"), "left_anti")
  }

  /** Watermarked stream-stream interval join: every purchase paired
    * with each click by the same user in the preceding `within` window
    * — the streaming form of the batch as-of/attribution analysis
    * (\[[graft.operators.AsOf]] keeps only the latest click; this keeps
    * the window's candidate set, the shape ad-attribution models
    * consume).
    *
    * Both sides carry watermarks and the join condition bounds
    * click_ts to [buy_ts - within, buy_ts], so Spark can evict click
    * state once it falls `within` + watermark-delay behind the clock —
    * state is bounded on an unbounded stream, the requirement for a
    * production stream-stream join. On batch DataFrames the identical
    * code is a plain range join (the parity tests' contract). */
  def clickAttribution(
      events: DataFrame,
      within: String = "1 hour",
      clickType: String = "click", buyType: String = "purchase",
      watermark: String = "10 minutes"): DataFrame = {
    def side(t: String, prefix: String) = {
      val s = events.where(col("event_type") === t)
        .select(col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"), col("event_id").as(s"${prefix}_id"))
      if (s.isStreaming) s.withWatermark(s"${prefix}_ts", watermark) else s
    }
    val clicks = side(clickType, "click")
    val buys = side(buyType, "buy")
    buys.join(clicks,
        col("buy_user") === col("click_user") &&
          col("click_ts") <= col("buy_ts") &&
          col("click_ts") >= col("buy_ts") - expr(s"INTERVAL $within"))
      .select(col("buy_user").as("user_id"), col("buy_id"), col("click_id"),
        col("click_ts"), col("buy_ts"))
  }

  /** Stream-static enrichment join: each event picks up the attributes
    * of a (small, slowly-changing) batch dimension keyed on `key`. The
    * dimension is explicitly `broadcast()` so the event stream is never
    * shuffled — each micro-batch is a map-side hash join, the shape a
    * feature-enrichment stage needs at any scale. Spark re-plans the
    * static side per micro-batch, so a dimension refresh (overwritten
    * parquet) is picked up without restarting the query. Left join:
    * events with no dimension row pass through with nulls rather than
    * being dropped. */
  def enriched(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming distinct-count estimate per tumbling window — the
    * [[graft.operators.KmvAgg]] sketch dropped into a watermarked
    * window aggregation: KMV state is a bounded mergeable integer
    * buffer (≤ k hashes per window), so per-window distinct-user
    * estimates stream with O(k) state per open window and NO
    * `dropDuplicates` blow-up. Exact below k distinct keys (the common
    * per-window case), `(k−1)·2⁶⁰/h_k` above, and — because the state
    * is deterministic integers — a window's streamed estimate equals
    * the batch [[graft.operators.Kmv.distinctEstimate]] over that
    * window's rows exactly (the parity test's contract).
    */
  def windowedDistinct(
      events: DataFrame, keyCol: String = "user_id",
      windowLength: String = "1 hour", watermark: String = "10 minutes",
      k: Int = 256): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.operators.KmvAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(count(lit(1)).as("n_rows"),
        agg(graft.operators.Kmv.hash(col(keyCol))).as("_kmv"))
      .select(col("window.start").as("window_start"), col("n_rows"),
        size(col("_kmv")).cast("long").as("n_distinct_hashes"),
        graft.operators.Kmv.estimate("_kmv", k).as("est_distinct"))
  }

  /** Streaming PSI drift monitor — the online form of the batch
    * [[graft.operators.Snapshot.psiDrift]]: each tumbling window of the
    * value stream is binned against a STATIC reference distribution and
    * scored with the population stability index, so a training-data
    * ingest job can alert the moment a feed's value distribution walks
    * away from the corpus it was validated against.
    *
    * The reference is collapsed to a driver-side model constant (bin
    * edges from its min/max + `bins` smoothed bin probabilities — the
    * same altitude as the PCA scatter model or the BPE merge table), so
    * the stream needs ONE windowed aggregation: `bins` conditional
    * sums per window (no second streaming agg, no stream-stream join —
    * chained streaming aggregations aren't generally executable in
    * append mode). PSI arithmetic replicates the batch operator
    * bin-for-bin: add-one smoothing on the window counts, per-bin
    * `(p−q)·ln(p/q)` rounded to integer micro-nats, integer-summed —
    * a window's `psi_micro` equals `psiDrift(ref, windowRows)`'s
    * `sum(psi_contrib_micro)` exactly (the parity test's contract).
    *
    * Output per closed window: `(window_start, n_rows, psi_micro)`.
    */
  def psiMonitor(
      stream: DataFrame, ref: DataFrame, valCol: String,
      bins: Int = 10, windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // ONE reference collect: (lo, hi) + smoothed per-bin counts — a
    // model constant, not a data path
    val v = col(valCol).cast("double")
    val mmRow = ref.agg(min(v).as("lo"), max(v).as("hi")).head()
    require(!mmRow.isNullAt(0) && !mmRow.isNullAt(1),
      s"psiMonitor: reference has no non-null '$valCol' values - bin edges undefined")
    val (lo, hi) = (mmRow.getDouble(0), mmRow.getDouble(1))
    def binOf(c: org.apache.spark.sql.Column) =
      if (hi == lo) lit(0L)
      else least(lit(bins - 1L), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) * bins / lit(hi - lo))))
    val refCounts = ref.select(binOf(col(valCol)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n1 = Array.tabulate(bins)(i => refCounts.getOrElse(i.toLong, 0L) + 1)
    val t1 = n1.sum.toDouble
    val aggs = count(lit(1)).as("n_rows") +:
      (0 until bins).map(i =>
        sum(when(col("_bin") === i, 1L).otherwise(0L)).as(s"_c$i"))
    // bin once per row in the projection; the agg then only compares ints
    val counted = stream
      .withColumn("_bin", binOf(col(valCol)))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(aggs.head, aggs.tail: _*)
    // per-bin micro-nat contributions as literal-parameterized columns;
    // t2 = window total + bins (every bin smoothed by one)
    val t2 = (0 until bins).map(i => col(s"_c$i")).reduce(_ + _) + lit(bins.toLong)
    val psi = (0 until bins).map { i =>
      val p = lit(n1(i) / t1)
      val q = (col(s"_c$i") + 1).cast("double") / t2.cast("double")
      round((p - q) * log(p / q) * 1e6).cast("long")
    }.reduce(_ + _)
    counted.select(col("window.start").as("window_start"),
      col("n_rows"), psi.as("psi_micro"))
  }

  /** Gap-based sessionization with native session windows: one row per
    * (user, session) with event count and bounds — the streaming form of
    * the batch q10_sessionize query. */
  def sessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}

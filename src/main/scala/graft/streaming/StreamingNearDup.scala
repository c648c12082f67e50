package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** One exploded band row of an arriving document: its (band, key)
  * bucket, the verify evidence `ev` (the full hashed shingle set in
  * exact mode; the k-long MinHash signature in signature mode), and
  * whether THIS band already matched a verified corpus near-dup
  * (computed in-plan by the stream-static screen before the stateful
  * fold). */
case class NdRow(_band: Int, _bkey: Long, doc_id: Long, ev: Seq[Long],
    corpus_hit: Boolean)

/** One remembered bucket member: id, verify evidence, and whether its
  * rejection was already emitted (so a flag is emitted at most once per
  * bucket). */
case class NdStateDoc(doc_id: Long, ev: Seq[Long], flagged: Boolean)

/** Per-(band, key) bucket state: every member ever routed here (up to
  * `bucketCap`). */
case class NdState(docs: List[NdStateDoc])

/** A rejected (near-duplicate) document id. */
case class NdFlagged(doc_id: Long)

/** Streaming near-dup ADMISSION GATE — the ingest posture of
  * [[Dedup.incrementalNearDupNew]] (d11): a crawl frontier checks each
  * arriving document's MinHash band keys against the frozen
  * accepted-corpus band manifest AND against the stream's own history
  * the moment the document arrives, instead of re-screening per
  * release. Output is the stream of REJECTED doc ids (the
  * [[StreamingContamination]] posture: the gate emits what fails;
  * admission is the complement).
  *
  * Semantics — exactly d11's keeper rule, order-free: a document is
  * rejected iff (1) it has a verified near-dup in the frozen corpus, or
  * (2) some SMALLER-ID stream document (any micro-batch, either
  * arrival order) is its verified near-dup. Near-dup pairs share ≥ 1
  * band bucket (the pigeonhole that makes banding work), and every
  * bucket remembers all its members, so a pair is detected whenever its
  * second side arrives — including the LATE-FLAG case where the larger
  * id arrived first and is rejected retroactively when the smaller id
  * shows up (the output is a membership stream of rejections, so a
  * late emission is well-defined; an already-emitted admission cannot
  * be recalled, which is the append-stream reality every ingest gate
  * lives with).
  *
  * Batch parity, stated precisely: in exact mode the flagged SET equals
  * `incoming ∖ incrementalNearDupNew(incoming, corpus)` for ANY
  * micro-batch split of `incoming` — asserted across shuffled splits in
  * `StreamingSpec` — PROVIDED every (band, key) bucket's lifetime
  * membership stays ≤ `bucketCap`. Past the cap the two screens
  * diverge by construction: the batch twin drops the ENTIRE hot bucket
  * from candidate generation (capBuckets), while the stream — which
  * cannot retroactively un-remember a bucket that crossed the cap
  * mid-query — caps PROSPECTIVELY (members beyond the cap, smallest
  * ids first within each batch, neither pair nor enter state; their
  * corpus verdicts, which are stateless, still emit). Both screens
  * lose within-bucket pairs on hot buckets, by design, and both warn
  * loudly; the cap is the same knob with the same default, so per-
  * arrival work and state stay O(bucketCap²)/O(bucketCap) per bucket
  * exactly where the batch screen bounds its own pair generation.
  *
  * Plan shape: shingles/signature/band keys are the batch screens'
  * scan-stage native expressions verbatim (identical keys to the
  * manifest); the corpus screen is a stream-static left join on
  * (band, key) against the band manifest plus the shingle-manifest
  * lookup, with the exact-Jaccard verify IN-PLAN (codegen'd array
  * arithmetic) — the corpus is never broadcast (`PlanSpec`), and with
  * the manifest stored bucketed on its join keys (bands on
  * (_band,_bkey), shingles on _id — the d34 at-rest discipline) it is
  * never re-shuffled either: both static-side exchanges disappear,
  * PROVEN in `ScaleSpec`; only the arriving batch moves per
  * micro-batch. Only the stateful fold (per-bucket,
  * flatMapGroupsWithState) runs Scala.
  *
  * State, and the knob that bounds it: in exact mode each (band, key)
  * bucket holds the shingle set of EVERY member (up to `bucketCap`)
  * for the life of the query — the price of exact Jaccard against the
  * whole stream history, ~`bands`× the corpus-slice shingle bytes.
  * `signatureState = true` cuts that by ~|shingles|/k: the bucket
  * retains each member's k-long MinHash SIGNATURE (which the scan
  * stage already computed for banding) and the within-stream verify
  * becomes the ESTIMATED Jaccard — matching components / k — at the
  * estimator precision d17's audit characterizes (σ = √(J(1−J)/k),
  * ~0.09 at k=32 near J=0.5). The corpus screen is unaffected (it
  * verifies exact, in-plan, against the manifest's shingles, and holds
  * no state). The estimated flag set is therefore neither ⊆ nor ⊇ the
  * exact one in general: a within-stream pair whose true Jaccard sits
  * within ~2σ of `threshold` can cross in either direction (asserted
  * both ways in `StreamingSpec`); pairs farther than that agree with
  * exact mode w.h.p. The stateful shuffle also shrinks by the same
  * ratio (the fold's input carries the signature, not the shingles).
  * Measured state bytes per admitted doc in both modes: SCALE.md
  * (round 13, `graft.StreamStateBench`).
  *
  * Bucket occupancy is the LSH design load (tiny under the
  * exact-dedup-first pipeline rule). Production gates bound TOTAL
  * state by periodically FREEZING the admitted stream into the corpus
  * manifest and restarting the query (the d8→d31 freeze cycle) — after
  * a freeze the history lives in the static side and the keyed state
  * starts empty.
  */
object StreamingNearDup {

  /** @param corpusShingles `(_id, _sh)` — [[Dedup.nearDupManifest]]._1
    * @param corpusBands `(_id, _band, _bkey)` — manifest._2; `k`,
    *   `bands` and the shingle width must match the manifest build.
    * @param bucketCap max lifetime members of one (band, key) bucket —
    *   the batch screens' knob with the batch screens' default; past
    *   it, arrivals in that bucket neither pair nor enter state (loud
    *   warn; see the hot-bucket contract above).
    * @param signatureState retain each member's MinHash signature
    *   instead of its shingle set — state and stateful-shuffle bytes
    *   cut ~|shingles|/k at the d17-characterized estimator precision;
    *   corpus-screen rejections are identical in both modes. */
  def flaggedIds(
      docs: DataFrame, corpusShingles: DataFrame, corpusBands: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 32, bands: Int = 8, threshold: Double = 0.4,
      bucketCap: Int = 100000, signatureState: Boolean = false): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    require(bucketCap >= 1, s"bucketCap must be positive, got $bucketCap")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands
    val base = docs
      .where(Dedup.tryLongId(idCol).isNotNull) // the shared id quarantine
      .select(Dedup.tryLongId(idCol).as("doc_id"),
        Dedup.hashedShingleSetNative(col(textCol)).as("_sh"))
      .withColumn("_sig", Dedup.minhashSignatureNative(col("_sh"), k))
    val bandCols = array((0 until bands).map { j =>
      xxhash64((j * r until (j + 1) * r).map(i =>
        element_at(col("_sig"), i + 1)): _*)
    }: _*)
    val rows = base
      .select(col("doc_id"), col("_sh"), col("_sig"), posexplode(bandCols))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bkey")
    // corpus screen, fully in-plan: band-bucket candidates (left join —
    // every band row must still reach its bucket for the within-stream
    // state), shingle lookup, exact-Jaccard verify. The joins are
    // stream-static; the manifest side is corpus-sized and explicitly
    // NOT broadcast (the d11 rule).
    val cand = rows
      .join(corpusBands.hint("shuffle_hash")
          .select(col("_id").as("_cid"), col("_band"), col("_bkey")),
        Seq("_band", "_bkey"), "left")
      .join(corpusShingles.hint("shuffle_hash")
          .select(col("_id").as("_cid"), col("_sh").as("_csh")),
        Seq("_cid"), "left")
    // the verify arithmetic is verifyJaccard's VERBATIM (division then
    // >=), so even Spark's NaN-compares-largest edge (two empty shingle
    // sets) agrees with the batch screens
    val inter = size(array_intersect(col("_sh"), col("_csh")))
    val hit = col("_cid").isNotNull &&
      (inter.cast("double") /
        (size(col("_sh")) + size(col("_csh")) - inter).cast("double")
        >= threshold)
    // evidence the fold retains: shingles (exact) or the signature —
    // selecting it HERE means the stateful shuffle ships only `ev`
    // (Catalyst prunes the other array after the verify projection)
    val evCol = if (signatureState) col("_sig") else col("_sh")
    val shaped = cand
      .select(col("_band").cast("int").as("_band"), col("_bkey"),
        col("doc_id"), evCol.as("ev"),
        coalesce(hit, lit(false)).as("corpus_hit"))
      .as[NdRow]

    // within-stream verify. Exact mode mirrors Spark's NaN-compares-
    // largest edge (two empty shingle sets flag); signature mode
    // estimates J as matching-components/k — two all-zero signatures
    // (the empty-set sentinel) estimate 1.0, the same verdict.
    def near(a: Seq[Long], b: Seq[Long]): Boolean =
      if (signatureState) {
        var m = 0; var i = 0
        while (i < k) { if (a(i) == b(i)) m += 1; i += 1 }
        m.toDouble / k.toDouble >= threshold
      } else {
        val sa = a.toSet
        val i = b.count(sa)
        val j = i.toDouble / (a.size + b.size - i).toDouble
        j.isNaN || j >= threshold
      }

    shaped
      .groupByKey(row => (row._band, row._bkey))
      .flatMapGroupsWithState[NdState, NdFlagged](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it: Iterator[NdRow], state: GroupState[NdState]) =>
          val st = state.getOption.map(_.docs).getOrElse(Nil)
          // batch members, dedup'd by id (a doc can reach a bucket once
          // per corpus witness row), corpus verdicts OR'd
          val batch = scala.collection.mutable.LinkedHashMap[Long, (Seq[Long], Boolean)]()
          it.foreach { row =>
            batch.get(row.doc_id) match {
              case Some((ev, h)) => batch(row.doc_id) = (ev, h || row.corpus_hit)
              case None => batch(row.doc_id) = (row.ev, row.corpus_hit)
            }
          }
          // the hot-bucket cap: admit smallest ids first (deterministic
          // across shuffles), skip the rest from pairing AND state; the
          // stateless corpus verdicts of skipped members still emit
          val sortedBatch = batch.toVector.sortBy(_._1)
          val room = math.max(0, bucketCap - st.size)
          val (bList, skipped) = sortedBatch.splitAt(room)
          if (skipped.nonEmpty)
            org.slf4j.LoggerFactory.getLogger("graft.streaming.StreamingNearDup")
              .warn(s"hot bucket at bucketCap=$bucketCap: skipping " +
                s"${skipped.size} arrivals from pairing/state — " +
                "within-bucket pairs involving them are lost (the batch " +
                "twin drops the whole hot bucket); raise bands or the cap")
          val flagged = scala.collection.mutable.Set[Long]()
          // screen 2 (corpus): the in-plan verdict — including skipped
          sortedBatch.foreach { case (id, (_, h)) => if (h) flagged += id }
          // screen 1 (within-stream): batch×batch, larger id loses
          for (i <- bList.indices; j <- i + 1 until bList.size) {
            val (ia, (sa, _)) = bList(i); val (ib, (sb, _)) = bList(j)
            if (near(sa, sb)) flagged += math.max(ia, ib)
          }
          // batch×state, BOTH directions: a late-arriving smaller id
          // retro-flags the remembered larger one
          for ((id, (ev, _)) <- bList; s <- st if near(ev, s.ev)) {
            if (s.doc_id < id) flagged += id
            else if (s.doc_id > id && !s.flagged) flagged += s.doc_id
          }
          state.update(NdState(
            st.map(s => if (flagged(s.doc_id)) s.copy(flagged = true) else s) :::
              bList.map { case (id, (ev, _)) =>
                NdStateDoc(id, ev, flagged(id)) }.toList))
          // emit each id once per bucket; cross-bucket repeats are
          // deduped by the downstream dropDuplicates
          flagged.iterator.map(NdFlagged(_)).toVector.iterator
      }
      .dropDuplicates("doc_id")
      .toDF()
  }
}

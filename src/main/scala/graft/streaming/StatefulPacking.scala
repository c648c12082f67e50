package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** One incoming document routed to its pack bin. */
case class PackDoc(doc_id: Long, bin: Long, toks: Long)

/** Per-bin packing state: the last folded doc id (monotone guard) and
  * the bin's running token total — 16 bytes per bin forever. */
case class PackState(last_id: Long, cum: Long)

/** One packed document: which training sequence of its bin it joined. */
case class PackRow(doc_id: Long, bin: Long, toks: Long, seq_id: Long)

/** Streaming sequence packing — the stateful twin of the batch
  * [[graft.operators.Split.packSequences]] (`p3_pack_sequences`), for
  * the ingest posture: documents stream in, each is routed to its
  * hash bin and appended to the bin's current training sequence, and
  * the sequence id is assigned THE MOMENT THE DOCUMENT ARRIVES — a
  * pretraining pipeline can materialize packed sequences continuously
  * instead of re-packing the corpus per snapshot.
  *
  * Semantics: the bin is the identical purpose-prefixed hash
  * (`hash60("pack|" ∥ id) mod bins`) the batch operator uses, and a
  * document's `seq_id = ⌊cum_before/budget⌋` is the batch formula with
  * `cum_before` the bin's exclusive running token total in doc-id
  * order. Within a micro-batch, documents fold in doc-id order; across
  * batches the state carries `(last_id, cum)`. A document at or below
  * `last_id` is skipped (the [[StatefulCusum]] monotone-state rule):
  * late data cannot re-open a sequence that later documents already
  * extended. An id-ordered stream therefore reproduces
  * `packSequences` row for row — the parity contract in
  * `StreamingSpec`.
  *
  * State is O(1) per bin and the bin count is a configuration
  * constant, so total state is bounded no matter how long the stream
  * runs — no watermark needed (`NoTimeout`), which also lets the same
  * operator run identically on a batch Dataset.
  */
object StatefulPacking {

  /** Routes each document to its pack bin — the exact batch hash, so
    * stream and batch disagree on nothing but arrival order. */
  def shapeDocs(
      docs: DataFrame, idCol: String, tokensCol: String,
      bins: Int): Dataset[PackDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        pmod(Dedup.hash60(concat(lit("pack|"), col(idCol).cast("string"))),
          lit(bins.toLong)).as("bin"),
        col(tokensCol).cast("long").as("toks"))
      .as[PackDoc]
  }

  def pack(
      docs: DataFrame, idCol: String, tokensCol: String,
      budget: Int, bins: Int): Dataset[PackRow] = {
    require(budget > 0 && bins > 0, s"budget=$budget and bins=$bins must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    shapeDocs(docs, idCol, tokensCol, bins)
      .groupByKey(_.bin)
      .flatMapGroupsWithState[PackState, PackRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bin: Long, it: Iterator[PackDoc], state: GroupState[PackState]) =>
          val sorted = it.toVector.sortBy(_.doc_id)
          var st = state.getOption.getOrElse(PackState(Long.MinValue, 0L))
          val out = Vector.newBuilder[PackRow]
          sorted.foreach { d =>
            if (d.doc_id > st.last_id) {
              // exclusive-prefix division = the batch seq_id formula
              out += PackRow(d.doc_id, bin, d.toks, st.cum / budget)
              st = PackState(d.doc_id, st.cum + d.toks)
            } // else: late or duplicate id — skip, state is monotone
          }
          state.update(st)
          out.result().iterator
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Web

/** One incoming crawled document routed to its registrable domain. */
case class DomainDoc(reg_domain: String, doc_id: Long)

/** Per-domain admission state: the last folded doc id (monotone guard)
  * and how many documents the domain has admitted — 16 bytes per
  * domain forever. */
case class DomainCapState(last_id: Long, admitted: Long)

/** One admitted document with its 1-based admission rank. */
case class AdmittedDoc(reg_domain: String, doc_id: Long, rk: Long)

/** Streaming per-domain document cap — the INGEST posture of
  * [[graft.operators.Web.domainCap]] (`w2_domain_cap`): a crawl
  * frontier admits each arriving document iff its registrable domain
  * has admitted fewer than `k` so far, deciding THE MOMENT THE
  * DOCUMENT ARRIVES instead of re-sampling the corpus per snapshot.
  *
  * Semantics vs the batch cap, stated honestly: the batch operator
  * selects the k smallest `hash60("cap|" ∥ id)` keys — an unbiased
  * fixed-size SAMPLE, which requires seeing the whole set (a later
  * smaller key must evict an earlier pick). A stream cannot evict
  * already-emitted admissions, so the streaming rule is FIRST-k-BY-ID
  * admission control — the semantics a production frontier actually
  * wants (admit now, crawl now). On an id-ordered stream the output
  * equals the batch first-k-by-id cap row for row (the parity contract
  * in `StreamingSpec`); a corpus re-sample to the hash-keyed rule runs
  * the batch operator over the admitted set.
  *
  * The URL canonicalization and eTLD+1 rollup are the batch
  * projections verbatim ([[Web.normalizeUrls]] /
  * [[Web.registrableDomain]] — window-free codegen'd expressions, so
  * they run identically on a stream). Within a micro-batch documents
  * fold in doc-id order; across batches the state carries
  * `(last_id, admitted)` and an id at or below `last_id` is skipped
  * (the monotone-state rule — late data cannot double-admit).
  *
  * State is O(1) per registrable domain with `NoTimeout` (which also
  * lets the operator run identically on a batch Dataset). Domain
  * cardinality is PSL-bounded (~10⁸ registrable domains on the public
  * web → ~GBs of keyed state spread across executors); for unbounded
  * synthetic keys put a TTL timeout on the state.
  */
object StatefulDomainCap {

  /** Scan-stage shaping: canonicalize, roll up to the registrable
    * domain, key by it — the exact batch projections, so stream and
    * batch disagree on nothing but arrival order. */
  def shape(
      urls: DataFrame, urlCol: String, idCol: String,
      suffixes: Seq[String] = Web.DefaultSuffixes): Dataset[DomainDoc] = {
    val spark = urls.sparkSession
    import spark.implicits._
    // ids that don't TRY_CAST to long are dropped up front (the
    // DomainDoc encoder would NPE on the NULL, and ANSI cast would
    // throw the sweep on a non-numeric string — Web.domainCap's rule);
    // null/malformed urls yield a NULL host → registrableDomain NULL →
    // they pool under the null-keyed group and count against it, never
    // against a real domain
    val idAsLong = expr(s"try_cast(`$idCol` AS LONG)")
    Web.normalizeUrls(urls.where(idAsLong.isNotNull), urlCol)
      .select(Web.registrableDomain(col("host"), suffixes).as("reg_domain"),
        idAsLong.as("doc_id"))
      .as[DomainDoc]
  }

  def admit(
      urls: DataFrame, urlCol: String, idCol: String, k: Int,
      suffixes: Seq[String] = Web.DefaultSuffixes): Dataset[AdmittedDoc] = {
    require(k > 0, s"k must be positive, got $k")
    val spark = urls.sparkSession
    import spark.implicits._
    shape(urls, urlCol, idCol, suffixes)
      .groupByKey(_.reg_domain)
      .flatMapGroupsWithState[DomainCapState, AdmittedDoc](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (dom: String, it: Iterator[DomainDoc], state: GroupState[DomainCapState]) =>
          // Bounded one-pass fold — NEVER buffers the group. A
          // mega-domain burst (the skew the batch cap's min-k aggregate
          // is built around) can put millions of rows in one trigger's
          // group; sorting it would hold them all on one executor.
          // Within the batch, "admit in doc-id order up to remaining
          // capacity" ≡ "admit the r smallest DISTINCT ids above
          // last_id", so a size-≤r ordered set (evict-max on overflow)
          // plus a running max id is the whole state: O(k) memory per
          // group regardless of group size.
          val st0 = state.getOption.getOrElse(DomainCapState(Long.MinValue, 0L))
          val r = (k - st0.admitted).toInt
          val keep = scala.collection.mutable.TreeSet.empty[Long]
          var maxId = st0.last_id
          it.foreach { d =>
            if (d.doc_id > st0.last_id) {
              if (d.doc_id > maxId) maxId = d.doc_id
              if (r > 0 && (keep.size < r || d.doc_id < keep.max)) {
                keep += d.doc_id // TreeSet dedups batch-internal repeats
                if (keep.size > r) keep -= keep.max
              }
            } // else: late or duplicate id — skip, state is monotone
          }
          state.update(DomainCapState(maxId, st0.admitted + keep.size))
          keep.iterator.zipWithIndex.map { case (id, i) =>
            AdmittedDoc(dom, id, st0.admitted + i + 1)
          }.toVector.iterator
      }
  }
}

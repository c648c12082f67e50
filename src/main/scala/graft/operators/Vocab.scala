package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus vocabulary statistics — the term-frequency / document-frequency
  * sweep a tokenizer-training or corpus-analysis pipeline runs first:
  * collection frequency (total occurrences) and document frequency
  * (distinct documents) per token, truncated to the top k terms.
  *
  * Plan shape at 100 TB: explode → hash aggregate on the token with
  * map-side partials (the explode output never materializes — it feeds
  * the partial agg inside the same stage), count-distinct expanded by
  * Catalyst into a two-level aggregate on (token, doc), then a global
  * top-k via TakeOrderedAndProject — k rows per partition cross the final
  * single-partition boundary, never the full vocabulary. The ordering
  * (cf desc, then token) is total, so the top-k set is deterministic.
  */
object Vocab {

  /** Top-k terms by collection frequency with document frequencies.
    * `minDf` prunes hapax/noise terms before the sort. */
  def topTerms(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 100, minDf: Int = 1): DataFrame =
    docs.select(col(idCol).as("_id"),
      explode(Text.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("_id")).as("df"), count(lit(1)).as("cf"))
      .where(col("df") >= minDf)
      .orderBy(col("cf").desc, col("token"))
      .limit(k)

  /** Per-document top-k terms by smoothed tf-idf
    * (`tf · (ln((N+1)/(df+1)) + 1)`, the sklearn smoothing — never
    * divides by zero, idf ≥ 1).
    *
    * EAGER: constructing this DataFrame runs a Spark job — the shared
    * (doc, term, tf) table is `localCheckpoint()`ed (materialized to
    * MEMORY_AND_DISK, lineage cut), so even explain/plan-only callers pay
    * the tokenize+aggregate pass, and the pinned blocks are not
    * recomputable after executor loss (same trade and rationale as
    * [[Dedup.minhashLshPairs]]; on a multi-node cluster swap for a
    * reliable checkpoint dir).
    *
    * Plan shape at 100 TB: explode feeding a partial-combined hash
    * aggregate on (doc, term) → df aggregate on the term → a shuffle
    * equi-join of the tf table on the term (both sides corpus-scale;
    * broadcast is wrong for a real vocabulary) → per-document
    * `row_number` window. The window partitions on the document id —
    * high-cardinality and unskewed, so per-partition state is one doc's
    * terms. Scores are rounded BEFORE ranking so sub-epsilon float
    * differences can't flip ranks between engines; ties break on the
    * term, making the top-k set fully deterministic. */
  def tfIdfTopTerms(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3): DataFrame = {
    // (doc, term, tf) is consumed by both the df aggregate and the join
    // side — materialize the explode+aggregate once (eager, same
    // rationale as Dedup.minhashLshPairs) instead of tokenizing the
    // corpus twice
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_docs"))
    // shuffle-hash hint: the df table is vocabulary-sized — at corpus
    // scale it must co-partition on the term, never broadcast (AQE would
    // otherwise broadcast it whenever it dips under the threshold, an
    // unstable and scale-wrong plan — same discipline as the dedup joins)
    val scored = tf.join(dfs.hint("shuffle_hash"), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf").cast("double") *
        (log((col("n_docs").cast("double") + 1) / (col("df").cast("double") + 1)) + 1), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Per-document mean token surprisal under the corpus unigram model
    * (`-ln(cf(t)/total)`, in nats) — the cheap perplexity proxy used as
    * a model-free quality signal: very low surprisal = boilerplate /
    * repeated text, very high = noise or vocabulary garbage.
    *
    * Plan: explode → cf aggregate on the term → shuffle-hash join back
    * (vocabulary never broadcast) → per-document mean. Per-token
    * surprisals are quantized to integer micro-nats BEFORE the sum so
    * the aggregate is associative integer arithmetic — the mean is
    * bit-identical across partitionings and engines, where a raw double
    * sum would depend on reduction order. */
  def meanSurprisal(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    val cf = tok.groupBy(col("term")).agg(count(lit(1)).as("cf"))
    val tot = cf.agg(sum(col("cf")).cast("double").as("total"))
    tok.join(cf.hint("shuffle_hash"), "term")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        round(-log(col("cf").cast("double") / col("total")) * 1e6)
          .cast("long").as("micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("micro")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_surprisal"))
  }

  /** Per-document mean bigram surprisal under an add-α corpus bigram
    * model (`-ln((c(prev,cur)+α) / (c(prev·)+α·V))`, nats) — the
    * CCNet-style language-model quality filter one rung above
    * [[meanSurprisal]]'s unigram model: fluent text scores low, shuffled
    * or machine-generated token soup scores high even when its unigram
    * profile looks normal. Documents with fewer than two tokens have no
    * bigrams and drop out.
    *
    * EAGER: the (doc, prev, cur) bigram stream feeds both count
    * aggregates and the scoring join, so it is `localCheckpoint()`ed —
    * constructing this DataFrame runs a Spark job and pins blocks, the
    * same trade as [[tfIdfTopTerms]] and [[Dedup.minhashLshPairs]].
    *
    * Plan shape at 100 TB: bigrams form INSIDE the scan stage (two array
    * slices zipped — attribute refs only, no per-element re-evaluation —
    * then one explode; no per-document window, no positional self-join),
    * then two hash aggregates build the bigram and context tables and
    * shuffle-hash equi-joins bring them back — both are vocabulary²-
    * scale, so neither is ever broadcast; only the 1-row vocabulary size
    * is. Per-bigram surprisals are quantized to integer micro-nats
    * BEFORE the sum (associative, partition-order independent), exactly
    * like the unigram model. */
  def meanBigramSurprisal(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val toks = docs.select(col(idCol).as("doc_id"),
      Text.tokens(lower(col(textCol))).as("t"))
    // materialize the slices as plain attributes before zip_with — a HOF
    // re-evaluates non-lambda subtrees per element in interpreted mode
    val bg = toks.select(col("doc_id"),
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))).as("_a"),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))).as("_b"))
      .select(col("doc_id"), explode(zip_with(col("_a"), col("_b"),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("_bg"))
      .select(col("doc_id"), col("_bg.prev").as("prev"), col("_bg.cur").as("cur"))
      .localCheckpoint()
    val c2 = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(col("prev")).agg(count(lit(1)).as("c1"))
    val v = toks.select(explode(col("t")).as("term"))
      .agg(countDistinct(col("term")).as("v"))
    bg.join(c2.hint("shuffle_hash"), Seq("prev", "cur"))
      .join(c1.hint("shuffle_hash"), Seq("prev"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        round(-log((col("c2").cast("double") + lit(alpha)) /
          (col("c1").cast("double") + lit(alpha) * col("v").cast("double"))) * 1e6)
          .cast("long").as("micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("micro")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_surprisal"))
  }

  /** Top-k word-association pairs by pointwise mutual information —
    * collocation mining (`new york`, `machine learning`) over the
    * corpus bigram stream: `PMI(a,b) = ln(c_ab·N² / (B·c_a·c_b))` with
    * token total `N` and bigram total `B`; `minCount` prunes the
    * unstable low-frequency tail (PMI's classic failure mode).
    *
    * Engine determinism: all counts are exact long aggregates, and the
    * PMI is ONE fixed-shape double expression (every operand cast,
    * left-associated — the u8 identical-IEEE-tree discipline) quantized
    * to integer micro-nats before the (pmi, prev, cur) total-order
    * top-k.
    *
    * Plan shape at 100 TB: bigrams form inside the scan stage (two
    * array slices + zip_with — no self-join on position); one hash
    * aggregate each for pair and unigram counts (map-side partials);
    * count tables join shuffle-hash (vocabulary-sized, never the
    * corpus); the two scalar totals broadcast. EAGER: the bigram and
    * token streams are `localCheckpoint()`ed — each feeds both its
    * count aggregate and a total, and a lazy plan would re-derive the
    * tokenize+explode per branch. */
  def pmiTopPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 50, minCount: Long = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val toks = docs.select(col(idCol).as("doc_id"),
      Text.tokens(lower(col(textCol))).as("t"))
    val bg = toks.select(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))).as("_a"),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))).as("_b"))
      .select(explode(zip_with(col("_a"), col("_b"),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("_bg"))
      .select(col("_bg.prev").as("prev"), col("_bg.cur").as("cur"))
      .localCheckpoint()
    val uni = toks.select(explode(col("t")).as("w")).localCheckpoint()
    val c2 = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .where(col("c2") >= minCount)
    val c1 = uni.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val totals = uni.agg(count(lit(1)).as("n_tok"))
      .crossJoin(bg.agg(count(lit(1)).as("n_bg")))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    c2.join(c1.select(col("w").as("prev"), col("c1").as("_ca")).hint("shuffle_hash"),
        Seq("prev"))
      .join(c1.select(col("w").as("cur"), col("c1").as("_cb")).hint("shuffle_hash"),
        Seq("cur"))
      .crossJoin(broadcast(totals))
      .select(col("prev"), col("cur"), col("c2").as("pair_count"),
        round(log(d(col("c2")) * d(col("n_tok")) * d(col("n_tok")) /
          (d(col("n_bg")) * d(col("_ca")) * d(col("_cb")))) * 1e6)
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("prev"), col("cur"))
      .limit(k)
  }

  /** Corpus Zipf rank-frequency fit — the "does this corpus look like
    * natural language" health metric: least-squares slope and r² of
    * ln(cf) against ln(rank) over the top-k vocabulary (natural text
    * fits slope ≈ −1; template farms and token soup bend the curve).
    *
    * Engine-exact despite being a regression: per-term (x, y) =
    * (ln rank, ln cf) are quantized to integer micro-nats, and ALL
    * sums and the normal-equation combination `n·Σxy − Σx·Σy` run in
    * decimal(38,0) (the [[Split.mixtureResample]] discipline) — x
    * reaches ~1.4e7 micro-nats, so Σx² alone passes 9.2e18 (long
    * overflow) around 5·10⁴ terms, and the cross-products reach
    * ~1e20 at k = 10⁶; 38-digit decimals hold both exactly. The only
    * doubles are the final two divisions, identical on any engine.
    *
    * Plan shape: the corpus-wide work is [[topTerms]] (explode → hash
    * agg → TakeOrdered k); everything after runs on the k-row
    * vocabulary (one window for ranks, one global aggregate). Output:
    * one row (n_terms, slope, r2). Degenerate corpora (a single
    * distinct term → zero x-variance) yield NaN slope/r², the standard
    * undefined-regression answer — gate on n_terms if that matters. */
  def zipfFit(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 1000): DataFrame =
    Profile.logLogFit(
      assignIds(topTerms(docs, idCol, textCol, k))
        .select((col("token_id").cast("double") + 1).as("rank"), col("cf")),
      "rank", "cf", nName = "n_terms")

  /** Heaps'-law vocabulary-growth fit — `V(n) ≈ K·nᵝ` with `n` the
    * cumulative token count and `V` the cumulative distinct-type count
    * over the corpus read in `idCol` order. Natural text sits at
    * β ≈ 0.4–0.6; β → 1 means the vocabulary never saturates
    * (character soup, random ids — each doc brings mostly-new "types"),
    * β → 0 means a closed template vocabulary. The corpus-level
    * companion to [[zipfFit]] (they are asymptotically linked) and the
    * one-number answer to "is more data still buying new vocabulary?"
    * when sizing a tokenizer or dedup budget.
    *
    * Exactness: each document contributes its token count and its
    * NEW-TYPE count (types whose corpus-first occurrence, in id order,
    * is this document — one `min(doc_id)` aggregate per type, no
    * ordered scan); cumulative sums are exact integers, and the
    * regression is [[Profile.logLogFit]]'s micro-nat integer form, so
    * any engine reproduces the bits.
    *
    * Plan shape at 100 TB: explode feeds two hash aggregates (per-doc
    * token counts; per-type min-id, re-aggregated to per-doc new-type
    * counts) — all map-side combined, never materializing the explode.
    * The cumulative sum is two-phase: per-doc deltas roll up to
    * id-range buckets, ONE ordered window runs over the bucket
    * aggregate (≤ `targetBuckets` rows), and each bucket's prefix
    * broadcasts back onto an in-bucket window partitioned by bucket.
    * The bucket width is derived IN-PLAN from the observed id range
    * (`⌈(max−min+1)/targetBuckets⌉`, one 1-row broadcast), so sparse or
    * hashed 64-bit ids cannot silently blow the bucket table up to
    * corpus size and re-create the single-partition global window this
    * structure exists to avoid — bucket count is bounded by
    * construction, id DENSITY only affects per-bucket balance. No
    * corpus-wide unpartitioned window, no driver loop. Output: one row
    * (n_docs, slope, r2) — slope = β. */
  def heapsFit(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      targetBuckets: Int = 16384): DataFrame = {
    require(targetBuckets > 0, s"targetBuckets must be positive: $targetBuckets")
    val tok = docs.select(col(idCol).cast("long").as("_id"),
      explode(Text.tokens(lower(col(textCol)))).as("_t"))
    val perDoc = tok.groupBy(col("_id")).agg(count(lit(1)).as("_nt"))
    val newTypes = tok.groupBy(col("_t")).agg(min(col("_id")).as("_id"))
      .groupBy(col("_id")).agg(count(lit(1)).as("_nv"))
    val joined = perDoc.join(newTypes, Seq("_id"), "left")
    val idRange = joined.agg(min(col("_id")).as("_lo"), max(col("_id")).as("_hi"))
    // eagerly materialized: BOTH cumsum phases read the delta table, and
    // without the cut each would recompute the token explode + three
    // aggregates upstream (|docs| rows pinned — doc counts, not tokens)
    val deltas = joined.crossJoin(broadcast(idRange))
      .select(col("_id"), col("_nt"), coalesce(col("_nv"), lit(0L)).as("_nv"),
        expr(s"(_id - _lo) div greatest(CAST(1 AS BIGINT)," +
          s" (_hi - _lo + CAST($targetBuckets AS BIGINT)) div $targetBuckets)")
          .as("_b"))
      .localCheckpoint()
    // phase 1: per-bucket totals, then EXCLUSIVE prefix over the small
    // bucket table (the only ordered window, corpus/bucketWidth rows)
    val wb = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = deltas.groupBy(col("_b"))
      .agg(sum(col("_nt")).as("_bt"), sum(col("_nv")).as("_bv"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wb), lit(0L)).as("_pt"),
        coalesce(sum(col("_bv")).over(wb), lit(0L)).as("_pv"))
    // phase 2: in-bucket inclusive cumsum rides a bucket-partitioned
    // window; bucket prefix joins back by the bucket key
    val wi = Window.partitionBy(col("_b")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = deltas.join(prefixes, Seq("_b"))
      .select(
        (col("_pt") + sum(col("_nt")).over(wi)).as("cum_tokens"),
        (col("_pv") + sum(col("_nv")).over(wi)).as("cum_types"))
    Profile.logLogFit(
      cum.where(col("cum_tokens") > 0 && col("cum_types") > 0),
      "cum_tokens", "cum_types", nName = "n_docs")
  }

  /** Per-document lexical-diversity profile — the vocabulary-richness
    * quality signal complementary to [[meanSurprisal]] (which needs a
    * corpus model) and `Repetition` (which looks at adjacent structure):
    * token count, distinct-type count, hapax count (types occurring
    * exactly once in the document), and the type-token ratio. Template
    * farms and keyword-stuffed spam score low TTR; character-soup noise
    * scores ~1 with near-zero hapax mass at volume.
    *
    * Plan shape at 100 TB: explode feeds a partial-combined hash
    * aggregate on (doc, term) — the explode output never materializes —
    * then the per-document rollup aggregates the much smaller (doc,
    * term, tf) table on the doc id. Two shuffles, both map-side
    * combined; no windows, no joins. Documents with zero tokens drop
    * out (no rows to aggregate). */
  def lexicalDiversity(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("doc_id")).agg(
      sum(col("tf")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      count(when(col("tf") === 1, 1)).as("n_hapax"),
      round(count(lit(1)).cast("double") / sum(col("tf")).cast("double"), 6)
        .as("ttr"))
  }

  /** Per-document token-distribution Shannon entropy in micro-nats —
    * the information-density quality signal between [[lexicalDiversity]]
    * (which counts types but ignores their balance) and `Repetition`
    * (which only sees adjacency): `H = Σ_t (tf_t/N)·ln(N/tf_t)`. A
    * document that repeats one token scores 0; a document of N
    * distinct tokens scores ln N. Low entropy at high token count is
    * the keyword-stuffing / template signature that TTR alone misses
    * (100 types × 100 repeats each has a healthy-looking TTR of 0.01
    * shared with natural text of the same length, but entropy pins the
    * uniformity).
    *
    * Engine-exact: each `ln(N/tf)` is quantized to integer micro-nats
    * by the library's standard double-rounding
    * (`round(round(ln(x), 6)·10⁶)` — the d23/t21 pattern, identical
    * IEEE ops on both engines), then `H_micro = Σ tf·lnMicro div N` is
    * pure integer arithmetic with non-negative operands (ln(N/tf) ≥ 0
    * always), so truncating `div` and flooring `//` agree.
    *
    * Plan shape at 100 TB: the [[lexicalDiversity]] two-aggregate
    * shape plus one doc-key equi-join to bring N back to the tf rows —
    * the join key equals the aggregate key, so it reuses the same
    * co-partitioning. No windows, nothing corpus-sized broadcast.
    * Zero-token documents drop out (no rows to aggregate).
    *
    * Output: `(doc_id, n_tokens, n_types, entropy_micro_nats)`.
    */
  def tokenEntropy(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val n = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("_n"))
    tf.join(n, Seq("doc_id"))
      .withColumn("_lnm", expr(
        "CAST(round(round(ln(CAST(_n AS DOUBLE) / CAST(tf AS DOUBLE)), 6)" +
          " * 1000000) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(max(col("_n")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("tf") * col("_lnm")).as("_s"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        expr("CAST(CAST(_s AS DECIMAL(38,0)) div n_tokens AS BIGINT)")
          .as("entropy_micro_nats"))
  }

  /** Pairwise token-distribution KL divergence between corpus groups —
    * "how different is source A's language from source B's": for every
    * ordered group pair, `KL(a‖b) = Σ_t p_a(t)·ln(p_a(t)/p_b(t))` over
    * the UNION vocabulary with add-one smoothing (`p_g(t) =
    * (c_g(t)+1)/(N_g+V)`), so a term absent from one side contributes
    * a finite penalty instead of ∞. The text-distribution twin of the
    * u29 PSI monitor and the divergence companion to t28's mutual
    * information: PSI watches a numeric feed, KL watches the language
    * itself — the mixture-design diagnostic for "can I swap source B
    * in for A". Asymmetric by design (KL(a‖b) ≠ KL(b‖a)); both
    * directions are rows.
    *
    * Determinism: per-term contributions are computed in ONE fixed
    * double expression (the mutualInfo rule — identical op order on
    * both engines), rounded to integer micro-nats, and integer-summed;
    * the sum order cannot change the result.
    *
    * Scale shape: the cell table is vocabulary-sized (explode feeds a
    * partial-combined (group, term) hash aggregate); the dense
    * vocab × groups completion joins cells back on the (group, term)
    * key with the shuffle-hash hint (never broadcast — vocabulary
    * grows with the corpus) while the |groups|-row lists/totals DO
    * broadcast; the pair self-join fans out |V|·|G|², linear in the
    * vocabulary for the handful of sources a mixture has.
    *
    * Output: one row per ordered pair
    * `(src_a, src_b, n_terms, kl_micro)`.
    */
  def sourceKl(
      docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val cells = docs
      .select(col(groupCol).as("_g"),
        explode(Text.tokens(lower(col(textCol)))).as("_t"))
      .where(col("_g").isNotNull)
      .groupBy(col("_g"), col("_t")).agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val vocab = cells.select(col("_t")).distinct()
    val groups = cells.select(col("_g")).distinct()
    val vsize = vocab.agg(count(lit(1)).as("_v"))
    val totals = cells.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
    val dense = vocab.crossJoin(broadcast(groups))
      .join(cells.hint("shuffle_hash"), Seq("_g", "_t"), "left")
      .na.fill(0L, Seq("_c"))
      .join(broadcast(totals), Seq("_g"))
      .crossJoin(broadcast(vsize))
    val a = dense.select(col("_t"), col("_g").as("src_a"),
      col("_c").as("_ca"), col("_n").as("_na"), col("_v"))
    val b = dense.select(col("_t"), col("_g").as("src_b"),
      col("_c").as("_cb"), col("_n").as("_nb"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    a.join(b.hint("shuffle_hash"), Seq("_t"))
      .where(col("src_a") =!= col("src_b"))
      // one fixed double expression (the mutualInfo determinism rule)
      .withColumn("_kl", round(
        (d(col("_ca")) + 1.0) / (d(col("_na")) + d(col("_v"))) *
          log(((d(col("_ca")) + 1.0) * (d(col("_nb")) + d(col("_v")))) /
            ((d(col("_cb")) + 1.0) * (d(col("_na")) + d(col("_v"))))) * 1e6)
        .cast("long"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_terms"), sum(col("_kl")).as("kl_micro"))
  }

  /** Deterministic token-id assignment over a trained vocabulary (e.g.
    * [[topTerms]] output): ids are dense ranks 0..k-1 by (cf desc,
    * token), the same total order topTerms truncates by. The global-sort
    * window runs on a k-row table (the vocabulary, already truncated) —
    * never on corpus-sized data. */
  def assignIds(vocab: DataFrame): DataFrame =
    vocab.withColumn("token_id",
      row_number().over(Window.orderBy(col("cf").desc, col("token"))) - 1)

  /** Corpus tokenization against a trained vocabulary — the "encode the
    * corpus for training" step: each document's token sequence mapped to
    * ids (OOV → -1), with token/OOV counts. Output: (doc_id, n_tokens,
    * n_oov, ids) where `ids` is the space-joined id sequence in document
    * order.
    *
    * Plan shape: posexplode → left join on the token → one groupBy on
    * the doc id reassembling via array_sort(collect_list) (bounded by
    * document length, same pattern as [[Dedup.spanDedup]]). A real
    * tokenizer vocabulary is bounded (≲1M rows), so the default
    * broadcasts it and the corpus is shuffled exactly once; for
    * unbounded vocabularies pass `broadcastVocab = false` to
    * co-partition both sides on the token instead. */
  def encode(
      docs: DataFrame, vocabIds: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", broadcastVocab: Boolean = true): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(Text.tokens(lower(col(textCol)))).as(Seq("pos", "token")))
    val v = vocabIds.select(col("token"), col("token_id"))
    val joined = toks
      .join(if (broadcastVocab) broadcast(v) else v.hint("shuffle_hash"),
        Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(-1)).as("tid"))
    joined.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("tid") === -1, 1L).otherwise(0L)).as("n_oov"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("tid")))),
        x => x.getField("tid").cast("string")), " ").as("ids"))
  }

  /** Okapi BM25 top-k retrieval over the corpus for a fixed bag of query
    * terms (Robertson & Zaragoza 2009, k₁=1.2 b=0.75; Lucene's
    * always-positive idf `ln(1 + (N−df+½)/(df+½))`) — the
    * retrieval-based data-selection primitive: "rank the corpus against
    * this query/domain description" is how targeted pretraining subsets
    * and RAG evaluation sets get pulled from a 100 TB pool.
    *
    * EXACT cross-engine scoring: with k₁=1.2, b=0.75 every per-term
    * contribution is the integer rational
    * `idf_micro · 22·S·tf  div  (10·S·tf + 3·S + 9·dl·N)` — the BM25
    * formula with avgdl = S/N cleared of all fractions (S = total corpus
    * tokens, dl = doc length); `idf_micro = round(ln((2N+2)/(2df+1))·10⁶)`
    * is the one double op, a single ln of an integer ratio (the t21/t28
    * cross-engine-proven pattern). Products ride DECIMAL(38,0) — at
    * 100 TB, S ~ 10¹⁴ puts `idf·22·S·tf` near 10²⁶, far past BIGINT.
    * Contributions are integers before the sum, so scores are
    * partition-order independent and engine-exact; ranking ties break
    * on doc_id.
    *
    * Plan shape at 100 TB: the corpus explodes ONCE and is immediately
    * filtered to the query terms (a literal IN over ≲dozens of terms —
    * Catalyst folds it into the scan stage, so the (doc, term, tf)
    * aggregate is query-sized, not corpus-sized); dl/N/S come from one
    * separate corpus-level aggregate whose (1+|terms|)-row outputs
    * broadcast. The only corpus-keyed shuffle is the per-doc dl
    * aggregate; everything downstream is bounded by docs-matching-query.
    * Top-k via the rounded-score window then rank ≤ k.
    *
    * EAGER: the dl and postings tables are `localCheckpoint()`ed
    * (each feeds two consumers), so constructing this DataFrame runs
    * Spark jobs — the [[tfIdfTopTerms]]/[[graft.operators.Dedup.idfCosinePairs]]
    * trade, same caveats.
    *
    * Output: (doc_id, n_hits, score_micro, rank) for rank ≤ k. */
  def bm25TopK(
      docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    // corpus stats: per-doc length, then N/S on top of it (one pass)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .localCheckpoint()
    val ns = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tokens"))
    // query-term postings: tf and df are aggregates over the FILTERED
    // explode — the IN literal prunes in the scan stage
    val tf = toks.where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = dfs.crossJoin(broadcast(ns))
      .select(col("term"),
        round(log((lit(2) * col("n_docs") + 2).cast("double") /
          (lit(2) * col("df") + 1).cast("double")) * 1e6).cast("long")
          .as("idf_micro"))
    val scored = tf.join(broadcast(idf), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(ns))
      .withColumn("contrib", expr(
        """CAST((CAST(idf_micro AS DECIMAL(38,0)) * 22 * s_tokens * tf)
          |  div (CAST(10 AS DECIMAL(38,0)) * s_tokens * tf
          |       + CAST(3 AS DECIMAL(38,0)) * s_tokens
          |       + CAST(9 AS DECIMAL(38,0)) * dl * n_docs) AS BIGINT)""".stripMargin))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("contrib")).as("score_micro"))
    // top-k FIRST via TakeOrderedAndProject (k rows per partition cross
    // the final boundary — never a corpus-wide ordered window), then the
    // rank window runs over k rows only
    scored.orderBy(col("score_micro").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("n_hits"), col("score_micro"), col("rank"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per document, the
    * summed log-likelihood ratio of its tokens under an add-one-smoothed
    * TARGET unigram model vs the CORPUS unigram model —
    * `Σ_tokens ln( ((cf_t+1)/(S_t+V)) / ((cf_c+1)/(S_c+V)) )`, V = the
    * union vocabulary. High weights = "looks like the target domain";
    * importance resampling then samples the raw pool proportionally.
    * The SUM and token count are returned rather than the mean: the sum
    * is exact integer micro-nats (each token's ratio is ONE ln of an
    * integer rational, quantized before aggregation — negative deltas
    * are fine because no floor division ever runs), while a mean would
    * need sign-split floor-division conventions for zero gain.
    *
    * Plan shape at 100 TB: two vocabulary-sized count aggregates (corpus
    * and target — the target SAMPLE is small by construction but the
    * code never assumes it) full-outer-merged into one model table;
    * the corpus token stream joins that table shuffle-hash on the term
    * (a real vocabulary is never broadcast), then one per-doc aggregate.
    * The corpus is tokenized once per model build and once for scoring.
    *
    * EAGER: the corpus token stream and the merged model table are
    * `localCheckpoint()`ed (each feeds multiple consumers), so
    * constructing this DataFrame runs Spark jobs — the
    * [[tfIdfTopTerms]] trade, same caveats.
    *
    * Output: (doc_id, n_tokens, dsir_micro) for every document with ≥1
    * token. */
  /** The per-token DSIR scoring expression, factored out so the
    * arithmetic width is unit-testable at extreme counts: micro-nat
    * `round(ln((cf_t+1)(S_c+V) / (cf_c+1)(S_t+V)) * 1e6)` with every
    * operand widened to DECIMAL(38,0) BEFORE the multiply (the
    * [[bm25TopK]] discipline). At genuine 100 TB token counts the raw
    * LONG×LONG products leave 64-bit range (e.g. "the" at cf_c ≈ 10¹²
    * against a 10⁷-token target sample pushes (cf_c+1)(S_t+V) past
    * 2⁶³−1, an ANSI overflow error or a silent corruption); the widened
    * products stay exact up to ~10³⁸, i.e. for any pair of 64-bit
    * counts, and the single double rounding happens only at the cast
    * that feeds `ln` — identical to the oracle's HUGEINT→DOUBLE cast. */
  private[graft] def dsirDeltaMicro(
      cfT: Column, sC: Column, cfC: Column, sT: Column, v: Column): Column = {
    // widen BEFORE the +1/+V additions too: a count at Long.MaxValue
    // must not wrap in the long domain on its way into the decimal
    def dec(c: Column) = c.cast("decimal(38,0)")
    round(log(((dec(cfT) + 1) * (dec(sC) + dec(v))).cast("double") /
        ((dec(cfC) + 1) * (dec(sT) + dec(v))).cast("double")) * 1e6)
      .cast("long")
  }

  def dsirLogRatio(
      docs: DataFrame, target: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def toks(d: DataFrame) = d.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    val corpusToks = toks(docs).localCheckpoint()
    val cfC = corpusToks.groupBy(col("term")).agg(count(lit(1)).as("cf_c"))
    val cfT = toks(target).groupBy(col("term")).agg(count(lit(1)).as("cf_t"))
    val model = cfC.join(cfT.hint("shuffle_hash"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("cf_c"), lit(0L)).as("cf_c"),
        coalesce(col("cf_t"), lit(0L)).as("cf_t"))
      .localCheckpoint()
    val sv = model.agg(sum(col("cf_c")).as("s_c"), sum(col("cf_t")).as("s_t"),
      count(lit(1)).as("v"))
    corpusToks.join(model.hint("shuffle_hash"), "term")
      .crossJoin(broadcast(sv))
      .select(col("doc_id"),
        dsirDeltaMicro(col("cf_t"), col("s_c"), col("cf_c"), col("s_t"),
          col("v")).as("delta_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("delta_micro")).as("dsir_micro"))
  }
}

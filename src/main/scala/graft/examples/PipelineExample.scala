package graft.examples

import org.apache.spark.sql.functions._

import graft.{Graft, TestData}
import graft.SparkEntry.tbl
import graft.functions.{Pii, Text}
import graft.operators.{Decontaminate, Dedup, GroupSample, Profile, Snapshot, Split}

/** End-to-end training-data curation pipeline over the documents table —
  * the integration story for the LLM-pipeline operators: exact dedup →
  * corpus-wide span dedup → PII scrub → quality/language gates →
  * near-dup group clustering (one keeper per component) → benchmark
  * decontamination → domain-mixture resampling → deterministic
  * train/val/test split → sequence packing → per-language review
  * sample → corpus stats + column profile.
  *
  * Every stage is a DataFrame transform (scales with partitioning); the
  * near-dup stage is the banded-LSH candidate join, never all-pairs, and
  * running exact dedup FIRST is what keeps the LSH band buckets small
  * (identical documents would otherwise share every band key — see
  * `Dedup.capBuckets`). The scrub and gate stages are pure per-row maps
  * that fuse into one codegen stage with the scan.
  *
  * Run: `sbt "runMain graft.examples.PipelineExample [sfDir]"`.
  */
object PipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(TestData.dir("0.001"))
    val spark = Graft.localSession("pipeline-example")

    val docs = tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val total = docs.count()

    // 1. exact dedup: keep each content hash's min doc_id
    val exact = Dedup.exact(docs)
    val uniq = docs.join(
      exact.where(!col("is_dup")).select(col("doc_id")), "doc_id")

    // 1b. corpus-wide span-level dedup (C4-style repeated-paragraph
    //     removal on 10-word windows): first occurrence wins, docs are
    //     reassembled from surviving spans; all-dup docs drop out here
    val spanKept = uniq.drop("text").join(
      Dedup.spanDedup(uniq, spanWords = 10)
        .select(col("doc_id"), col("text_dedup").as("text")), "doc_id")

    // 2. PII scrub (emails/IPs/phones → typed placeholders), then
    //    quality + language gates over the SCRUBBED text — per-row regex
    //    maps, all inside the scan's codegen stage
    val scrubbed = spanKept.select(col("doc_id"), col("lang"),
      Pii.scrub(col("text")).as("text"))
    // the FUSED gate profile (round 13): quality score, language id,
    // token count, all Gopher rule flags, script counts, and the
    // mixed-script spam gate from ONE GateMetrics scan — output
    // bit-identical to the composable qualityScore/langId/flags/
    // withScriptProfile chain (GateFusedSpec) at ~1/16th the regex
    // passes (gate 12.3× at 1000× docs, SCALE.md); the same generator
    // barrier keeps this WHERE reading struct fields instead of
    // re-inlining the scan into FilterExec
    val scored = Text.withGateProfile(scrubbed, col("text"),
      minWords = 10, minRequiredWords = 1)
    val kept = scored.where(col("quality") >= 0.5 && col("passes_quality") &&
        !col("script_mixed"))
      .select(col("doc_id"), col("text"), col("lang"), col("quality"), col("n_tokens"))

    // 3. near-dup removal via GROUP clustering: transitive near-dups
    //    collapse to one keeper per connected component (pairwise
    //    drop-the-higher-id under-removes chains: a~b, b~c keeps a and c)
    val pairs = Dedup.minhashLshPairs(kept, threshold = 0.6)
    val clean = Dedup.keepCanonical(kept, Dedup.connectedComponents(pairs))

    // 4. benchmark decontamination: drop training docs sharing 4-grams
    //    with the held-out eval slice (here: doc_id % 20 == 0 stands in
    //    for the benchmark set; in production, the eval suites)
    val evalSet = docs.where(col("doc_id") % 20 === 0)
    val contaminated = Decontaminate.report(
        clean.where(col("doc_id") % 20 =!= 0), evalSet, n = 4)
      .where(col("contam_ppm") >= 200000).select(col("doc_id"))
    val decontaminated = clean.where(col("doc_id") % 20 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // 4b. SURGICAL pass (round 11): the survivors below the drop
    //     threshold still excise exactly their leaked passages —
    //     the spans a release would cut before tokenization
    val excisedTokens = Decontaminate
      .contaminationSpans(decontaminated, evalSet, k = 4)
      .agg(coalesce(sum(col("span_end") - col("span_start") + 1), lit(0L)))
      .head().getLong(0)

    // 5. domain-mixture resampling: thin each language toward the target
    //    mixture (binding language kept whole; rates derived in-plan)
    val mixed = Split.mixtureResample(decontaminated, "doc_id", "lang",
      sharesPpm = Map("en" -> 500000L, "zh" -> 200000L, "es" -> 150000L,
        "de" -> 100000L, "fr" -> 50000L))

    // 6. deterministic split + sequence packing: both pure functions of
    //    the id (plus one per-bin running sum), stable across reruns
    val split = Split.assignSplit(mixed, "doc_id")
    val packed = Split.packSequences(
      split.where(col("split") === "train")
        .select(col("doc_id"), col("n_tokens")),
      "doc_id", "n_tokens", budget = 2048, bins = 16)

    // 7. deterministic per-language review sample (k smallest md5 keys
    //    per language — re-runs draw the same docs for human QA)
    val review = GroupSample.sampleKPerGroup(mixed, "lang", "doc_id", k = 5)

    // 8. corpus report per split
    val report = split.groupBy(col("split")).agg(
      count(lit(1)).as("docs"),
      sum(col("n_tokens")).as("tokens"),
      round(avg(col("quality")), 4).as("avg_quality"))
    val nSeqs = packed.select(col("bin"), col("seq_id")).distinct().count()
    println(s"input=$total unique=${uniq.count()} " +
      s"span_deduped=${spanKept.count()} kept=${kept.count()} " +
      s"clean=${clean.count()} decontaminated=${decontaminated.count()} " +
      s"excised_tokens=$excisedTokens " +
      s"mixed=${mixed.count()} review_sample=${review.count()} " +
      s"train_sequences=$nSeqs")
    report.orderBy(col("split")).show(false)
    // before/after sanity gate: one-pass numeric profile of the output
    Profile.numericProfile(split, Seq("quality", "n_tokens"))
      .orderBy(col("column_name")).show(false)

    // 9. release audits: (a) split-leakage screen — the md5 split must
    //    be statistically independent of language, so the total mutual
    //    information should sit near 0 micro-nats; (b) PSI drift gate —
    //    how far curation moved the token-length distribution vs the
    //    raw scored corpus (large PSI = the gates reshaped the corpus,
    //    worth a human look); (c) deterministic 10% word-dropout
    //    augmentation of the train split (same md5-coin family as the
    //    split itself, so every epoch reproduces the same corpus)
    // coalesce: sum() over an empty frame is null, and an empty corpus
    // (all docs gated out) should report zeros, not NPE at the finish
    val splitMi = Profile.mutualInfo(split, "lang", "split")
      .agg(coalesce(sum(col("mi_contrib_micro")), lit(0L))).head().getLong(0)
    val tokenPsi = Snapshot.psiDrift(
        scored.select(col("n_tokens")), mixed.select(col("n_tokens")), "n_tokens")
      .agg(coalesce(sum(col("psi_contrib_micro")), lit(0L))).head().getLong(0)
    val aug = split.where(col("split") === "train")
      .select(col("doc_id"), col("n_tokens"),
        size(Text.dropoutTokens(col("text"), col("doc_id"), ratePpm = 100000))
          .cast("long").as("n_aug_tokens"))
      .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("t"),
        coalesce(sum(col("n_aug_tokens")), lit(0L)).as("a")).head()
    println(s"split_lang_mi_micro=$splitMi token_psi_micro=$tokenPsi " +
      s"aug_kept=${aug.getLong(1)}/${aug.getLong(0)}")
    spark.stop()
  }
}

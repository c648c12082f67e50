package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Repetition / boilerplate quality signals for training-data curation —
  * the "repetitious document" filters used alongside [[graft.functions.Text
  * .qualityScore]] when cleaning web corpora: documents dominated by
  * repeated lines or by one n-gram are navigation chrome, logs, or spam,
  * not prose, and are removed before training.
  *
  * Two signals per document:
  *   - `dup_line_frac` — fraction of non-empty lines that are copies of
  *     another line in the same document (0 = all lines unique).
  *   - `top_ngram_frac` — fraction of the document's word n-grams taken by
  *     the single most frequent n-gram (→ 1 for "foo bar foo bar …").
  *
  * The line signal is a per-row array computation (codegen, no shuffle).
  * The n-gram signal is computed distributed — explode → count per
  * (doc, gram) → max/sum per doc — so a single pathological document
  * larger than executor memory cannot blow up a per-row in-memory
  * frequency map; both aggregations are partial+final hash aggregates on
  * the doc id, the same key, so AQE plans one real shuffle for the pair.
  */
object Repetition {

  /** Non-empty trimmed lines of the document. */
  def lines(c: Column): Column =
    filter(transform(split(c, "\n"), l => trim(l)), l => l =!= "")

  /** Fraction of non-empty lines that duplicate another line (0 when the
    * document has no non-empty lines). Takes the already-projected line
    * array so callers evaluate [[lines]] once. */
  def dupLineFracFrom(ls: Column): Column =
    when(size(ls) === 0, lit(0.0))
      .otherwise((size(ls) - size(array_distinct(ls))).cast("double") /
        size(ls).cast("double"))

  /** Word n-grams of the lowercased document as space-joined strings;
    * empty array when the document has fewer than n tokens. (Spark's
    * `sequence(1, k)` is DESCENDING for k < 1 — the guard is required.) */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** Per-document repetition report: (id, dup_line_frac, top_ngram_frac,
    * n_grams). Documents with no n-grams report top_ngram_frac = 0. */
  def report(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).as("_id"),
      lines(col(textCol)).as("_lines"),
      Text.tokens(lower(col(textCol))).as("_toks"))
    val gramStats = base
      .select(col("_id"), explode(ngrams(col("_toks"), n)).as("_g"))
      .groupBy(col("_id"), col("_g")).agg(count(lit(1)).as("_c"))
      .groupBy(col("_id"))
      .agg(max(col("_c")).as("_mx"), sum(col("_c")).as("_tot"))
    base.join(gramStats, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        round(dupLineFracFrom(col("_lines")), 6).as("dup_line_frac"),
        round(coalesce(col("_mx").cast("double") / col("_tot").cast("double"),
          lit(0.0)), 6).as("top_ngram_frac"),
        coalesce(col("_tot"), lit(0L)).as("n_grams"))
  }

  /** Corpus-level boilerplate coverage: a shingle present in at least
    * `minDf` documents is "boilerplate" (site chrome, license headers,
    * navigation text); each document reports the fraction of its
    * distinct shingles that are boilerplate — a strong remove/clean
    * signal that [[report]]'s within-document stats cannot see.
    *
    * Plan: hashed shingle arrays are materialized once
    * ([[Dedup.hashedShingleSetNative]], eager checkpoint — same
    * rationale as the dedup pipelines), the exploded view feeds (1) a
    * document-frequency aggregate on the shingle and (2) an equi-join
    * back on the shingle, then one hash aggregate on the doc id. The
    * df table is corpus-vocabulary-sized, so the join is hinted
    * shuffle-hash, never broadcast. Three shuffles (shingle df, join,
    * doc agg), all on keys with corpus-scale cardinality — no skew
    * hazard beyond the hot shingles themselves, which is exactly what
    * the signal measures. */
  def boilerplateCoverage(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, minDf: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
        Dedup.hashedShingleSetNative(col(textCol), n).as("_sh"))
      .localCheckpoint()
    val ex = sh.select(col("_id"), size(col("_sh")).as("_n"),
      explode(col("_sh")).as("_s"))
    val dfs = ex.groupBy(col("_s")).agg(count(lit(1)).as("_df"))
    ex.join(dfs.hint("shuffle_hash"), "_s")
      .groupBy(col("_id"), col("_n"))
      .agg(sum(when(col("_df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("_id").as(idCol), col("_n").as("n_shingles"),
        col("n_boiler"),
        round(col("n_boiler").cast("double") / col("_n").cast("double"), 6)
          .as("boiler_frac"))
  }
}

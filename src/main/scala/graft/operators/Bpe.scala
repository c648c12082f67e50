package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * vocabulary learner of an LLM data pipeline, as iterated aggregation.
  *
  * Classic BPE (Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units", ACL 2016) greedily learns merges: count
  * adjacent symbol pairs over the corpus, merge the most frequent pair
  * everywhere, repeat. The distributed shape mirrors the textbook
  * word-frequency formulation: training iterates over the DISTINCT-word
  * table weighted by corpus counts (|vocab| rows — orders of magnitude
  * smaller than the corpus, but still far too large to collect), so each
  * round is one explode→aggregate for pair counts, one TakeOrdered(1)
  * for the winning pair, and one per-row literal `replace` applying the
  * merge. Nothing corpus-sized is ever collected; the only driver-side
  * value per round is the single winning pair (the same role as the
  * convergence flag in [[Dedup.connectedComponents]]).
  *
  * Determinism: winner = max count, ties broken by (left, right)
  * lexicographically — ASCII-only symbols, so Spark's UTF8 ordering and
  * any SQL engine's binary collation agree, and an oracle can replay
  * training round-for-round.
  */
object Bpe {

  /** Space-delimited symbol string of a word, space-padded on both ends:
    * "fox" → " f o x ". The padding makes every symbol occurrence
    * ` l r ` -matchable with no word-boundary false positives, and
    * left-to-right non-overlapping `replace` applies a merge exactly the
    * way greedy BPE does. */
  private def charString(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** Corpus word-frequency table: one row per distinct normalized token
    * with its occurrence count — the table BPE training iterates on. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(Text.normalized(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Adjacent-pair counts over the current symbol strings, weighted by
    * word frequency. Slice-zip instead of `sequence` (which would emit a
    * descending range for 1-symbol words). */
  private def pairCounts(words: DataFrame): DataFrame = {
    val t = split(trim(col("s")), " ")
    val len = greatest(size(t) - 1, lit(0))
    words
      .select(col("cnt"),
        explode(zip_with(slice(t, lit(1), len), slice(t, lit(2), len),
          (a, b) => struct(a.as("l"), b.as("r")))).as("_p"))
      .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
      .agg(sum(col("cnt")).as("n"))
  }

  /** Learns `rounds` merges; returns (merge_rank, lhs, rhs, pair_count)
    * in learn order. Stops early if no pair is left to merge. */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // eagerly materialized per round: each round's strings feed both the
    // pair count and the next round's rewrite (see Dedup.minhashLshPairs)
    var words = wordCounts(docs, textCol)
      .select(col("cnt"), charString(col("word")).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, l, rr, n))
        words = words
          .withColumn("s", replace(col("s"), lit(s" $l $rr "), lit(s" $l$rr ")))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Applies a learned merge list to the corpus and reports per-document
    * subword statistics: (id, n_tokens, n_symbols) — the "how many BPE
    * tokens is this document" accounting every token-budgeted pipeline
    * stage (packing, mixture, billing) runs after tokenizer training.
    *
    * Scale shape: the merge list is a driver-side constant (one row per
    * learned merge — thousands at most), folded into a single
    * chained-replace projection; it is applied to the DISTINCT-word
    * table (vocab-sized), which then joins the exploded token stream on
    * the word — one shuffle each side, aggregation absorbed map-side.
    * Documents with no tokens vanish (inner join on an empty explode). */
  def encodeStats(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val tokens = docs.select(col(idCol),
      explode(Text.tokens(Text.normalized(col(textCol)))).as("word"))
    val merged = merges.foldLeft(charString(col("word"))) { case (s, (l, r)) =>
      replace(s, lit(s" $l $r "), lit(s" $l$r "))
    }
    val vocab = tokens.select(col("word")).distinct()
      .select(col("word"), size(split(trim(merged), " ")).as("_n_sym"))
    tokens.join(vocab.hint("shuffle_hash"), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_n_sym")).as("n_symbols"))
  }
}

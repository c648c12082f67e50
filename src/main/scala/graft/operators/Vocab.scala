package graft.operators

import org.apache.spark.sql.DataFrame
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
}

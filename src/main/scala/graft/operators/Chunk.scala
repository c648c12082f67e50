package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for context-window preparation: long documents are
  * cut into overlapping token windows so every token appears in at least
  * one window and windows never exceed the model's context budget — the
  * preprocessing step feeding embedding models and long-context training
  * (the complement of [[Split.packSequences]], which assembles SHORT
  * documents into full sequences; this cuts LONG ones down).
  *
  * Chunks start at multiples of `chunkTokens - overlap` while the start
  * is inside the document, so consecutive chunks share `overlap` tokens
  * and the final chunk may be shorter. Pure per-row computation: a
  * projection + explode inside the scan stage — no shuffle, no state,
  * trivially parallel at any corpus size, and the (doc, index) identity
  * of every chunk is deterministic.
  */
object Chunk {

  /** Explodes each document into `(idCol, chunk_idx, chunk_text,
    * n_tokens)` rows over single-space tokenization. */
  def chunkDocs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol), split(col(textCol), " ").as("_t"))
      .withColumn("_len", size(col("_t")))
      .select(col(idCol), col("_t"), col("_len"),
        explode(sequence(lit(0),
          floor((col("_len") - 1).cast("double") / stride).cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ",
          slice(col("_t"), col("chunk_idx") * stride + 1, lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens), col("_len") - col("chunk_idx") * stride)
          .cast("int").as("n_tokens"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.Text

/** One surviving counter in a Misra-Gries summary. */
case class TermCount(term: String, n: Long)

/** Misra-Gries heavy-hitters sketch as a bounded partial aggregate —
  * the scale path for "top terms" when the vocabulary itself is too
  * large to shuffle: [[Vocab.topTerms]]' exact form moves one partial
  * row per (partition, distinct term); this moves AT MOST `capacity`
  * counters per partition regardless of vocabulary size, at the cost
  * of bounded undercount.
  *
  * Guarantees (Misra–Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12): every counter undercounts its
  * term's true frequency by at most N∕(capacity+1) (N = total token
  * count), any term with true frequency above that bound is GUARANTEED
  * present in the summary, and the merge preserves the same bound —
  * so partial aggregation is safe on any tree shape. With
  * `capacity ≥ |vocabulary|` no eviction ever fires and the counts are
  * exact (the regime the cross-engine oracle pins); under eviction the
  * surviving counter VALUES depend on partitioning, so treat them as
  * lower bounds (the sbt spec asserts the bound, not equality).
  */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[TermCount]]
    with Serializable {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], term: String): Map[String, Long] =
    m.get(term) match {
      case Some(c) => m.updated(term, c + 1)
      case None if m.size < capacity => m.updated(term, 1L)
      // full and unseen: decrement everyone (amortized O(1) — each
      // decrement pass pays for the capacity insertions before it)
      case None => m.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (s.size <= capacity) s
    else {
      // subtract the (capacity+1)-th largest count; at most `capacity`
      // counters can exceed it, and the error bound telescopes
      val cut = s.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(capacity)
      s.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(m: Map[String, Long]): Seq[TermCount] =
    m.toSeq.map { case (t, c) => TermCount(t, c) }
      .sortBy(tc => (-tc.n, tc.term))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[TermCount]] =
    ExpressionEncoder[Seq[TermCount]]()
}

object HeavyHitters {

  /** Top-k tokens by (sketched) collection frequency: explode feeds the
    * Misra-Gries partial aggregate inside the scan stage, so only
    * ≤ capacity counters per partition reach the single merge — the
    * full token stream never shuffles. Output: (term, n, rank) with the
    * same (n desc, term asc) total order as [[Vocab.topTerms]]. */
  def topTokens(
      docs: DataFrame, textCol: String = "text",
      capacity: Int = 4096, k: Int = 20): DataFrame = {
    require(k <= capacity, s"k=$k cannot exceed capacity=$capacity")
    val mg = udaf(new MisraGriesAgg(capacity), Encoders.STRING)
    docs
      .select(explode(Text.tokens(lower(col(textCol)))).as("token"))
      .agg(mg(col("token")).as("_hh"))
      .select(posexplode(col("_hh")).as(Seq("_pos", "_tc")))
      .where(col("_pos") < k)
      .select(col("_tc.term").as("term"), col("_tc.n").as("n"),
        (col("_pos") + 1).cast("int").as("rank"))
  }
}

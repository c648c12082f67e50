package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence transition mining: per-user next-event pairs and the
  * corpus-level first-order Markov transition matrix — the user-behavior
  * building block behind path analysis ("what do users do after
  * signup?") and funnel discovery.
  *
  * Plan shape: ONE shuffle of the event stream on the user key for the
  * per-user `lead()` window, then a hash aggregation on (from, to) whose
  * domain is |event types|² — tiny, so the partial (map-side) aggregate
  * absorbs virtually all of it and the final shuffle moves a handful of
  * rows regardless of corpus size. The probability normalization is a
  * window over the aggregated matrix — |event types|² rows, free.
  *
  * Events with the same user and timestamp are ordered by the tiebreak
  * column, making the result deterministic and engine-reproducible.
  */
object Transitions {

  /** First-order transition matrix over per-user event sequences:
    * (from_type, to_type, n_transitions, p_transition) where
    * `p_transition` is row-normalized over `from_type`. Sequence-final
    * events (lead = NULL) are excluded. */
  def matrix(
      events: DataFrame,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", tiebreakCol: String = "event_id"): DataFrame = {
    val seq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val counts = events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(seq).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val byFrom = Window.partitionBy(col("from_type"))
    counts.withColumn("p_transition",
      round(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(byFrom).cast("double"), 6))
  }
}

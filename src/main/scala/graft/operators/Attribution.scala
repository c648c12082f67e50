package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Position-based ("U-shaped") multi-touch attribution — the
  * complement of [[AsOf]]'s last-touch join: every conversion's credit
  * is split across ALL the user's touch events since their previous
  * conversion, 40% to the first touch, 40% to the last, and the
  * remaining 20% spread over the middles (100% / 50–50 for one- and
  * two-touch paths), then rolled up per channel.
  *
  * Credit is computed in EXACT integer ppm (millionths): the only
  * non-terminating split, `200000 ∕ (n−2)` for the middles, goes
  * through a floored division both engines evaluate identically, so
  * the channel rollup is a plain long sum — partition-order
  * independent with no float-accumulation drift (same ethos as
  * [[Anomaly.dailySpikes]]'s integer variance numerator).
  *
  * Plan shape at 100 TB: ONE shuffle on the user key serves every
  * window — the cumulative conversion counter and per-user totals run
  * on `user`, and the per-epoch rank/count windows cluster on
  * `(user, epoch)`, which the user-key partitioning already satisfies
  * (Spark inserts only a sort, no second exchange). The final channel
  * rollup aggregates a |channels|-sized table.
  */
object Attribution {

  /** Per-channel report: (channel, n_touches, credit) where `credit`
    * sums each touch's position-based share of one conversion.
    * Touches after a user's last conversion earn nothing. */
  def positionCredit(
      events: DataFrame, convType: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    val isConv: Column = col(typeCol) === convType
    val wCum = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wUser = Window.partitionBy(col(userCol))
    val marked = events
      .withColumn("_seen", sum(when(isConv, 1L).otherwise(0L)).over(wCum))
      .withColumn("_k", sum(when(isConv, 1L).otherwise(0L)).over(wUser))
    // a touch attributes to the NEXT conversion; epochs past the last
    // conversion have no converting event and drop out
    val touches = marked
      .where(!isConv && col("_seen") + 1 <= col("_k"))
      .withColumn("_epoch", col("_seen") + 1)
    val wEpoch = Window.partitionBy(col(userCol), col("_epoch"))
    val ranked = touches
      .withColumn("_rn", row_number().over(
        wEpoch.orderBy(col(tsCol), col(idCol))))
      .withColumn("_n", count(lit(1)).over(wEpoch))
    val creditPpm = when(col("_n") === 1, 1000000L)
      .when(col("_n") === 2, 500000L)
      .when(col("_rn") === 1 || col("_rn") === col("_n"), 400000L)
      .otherwise(floor(lit(200000.0) / (col("_n") - 2)).cast("long"))
    ranked
      .groupBy(col(typeCol).as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        (sum(creditPpm).cast("double") / 1e6).as("credit"))
  }
}

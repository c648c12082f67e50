package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair association over event baskets — the "users who
  * did A in a session also did B" miner (support / confidence / lift),
  * the co-occurrence complement of the sequential [[Transitions]]
  * matrix: transitions care about order, baskets only about
  * co-presence.
  *
  * A basket is one (user, day); items are the DISTINCT `itemCol`
  * values inside it. For each unordered item pair (a < b):
  *   - `support_ppm`    = ⌊n_ab · 1e6 / n_baskets⌋
  *   - `conf_a_to_b_ppm`= ⌊n_ab · 1e6 / n_a⌋
  *   - `lift_ppm`       = ⌊n_ab · n_baskets · 1e6 / (n_a · n_b)⌋
  * all exact integer floor divisions (the lift numerator in
  * decimal(38,0) — a long overflows once counts pass ~10⁶ baskets).
  *
  * Plan shape at 100 TB: one shuffle dedups events into the item
  * table; the pair self-join is co-partitioned on the basket key
  * (user, day) with per-basket fan-out bounded by the distinct item
  * count squared (event-type vocabularies are small; for open-ended
  * item domains cap items per basket first — the same hot-key
  * discipline as the LSH band caps). Margins and the basket count are
  * re-aggregated from the item table, not the raw stream, and join
  * back by broadcast.
  */
object Basket {

  def pairLift(
      events: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      itemCol: String = "event_type"): DataFrame = {
    val items = events.select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"),
      col(itemCol).as("_item")).distinct()
    val nb = items.select(col("_u"), col("_d")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val m = items.groupBy(col("_item")).agg(count(lit(1)).as("n_item"))
    // shuffle_hash pinned: AQE would otherwise broadcast the corpus-sized
    // item table whenever it dips under the threshold at small scale —
    // the same unstable-plan hazard as the LSH band joins
    val pairs = items
      .join(items.select(col("_u"), col("_d"), col("_item").as("_item_b"))
        .hint("shuffle_hash"),
        Seq("_u", "_d"))
      .where(col("_item") < col("_item_b"))
      .groupBy(col("_item").as("item_a"), col("_item_b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(m.select(col("_item").as("item_a"), col("n_item").as("_na"))),
        Seq("item_a"))
      .join(broadcast(m.select(col("_item").as("item_b"), col("n_item").as("_nb"))),
        Seq("item_b"))
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        // n_ab counts co-occurring baskets (session-scale, ~10¹²
        // possible) — the ppm numerators ride DECIMAL(38,0) like
        // lift_ppm below already does
        expr("(CAST(n_ab AS DECIMAL(38,0)) * 1000000) div n_baskets").as("support_ppm"),
        expr("(CAST(n_ab AS DECIMAL(38,0)) * 1000000) div _na").as("conf_a_to_b_ppm"),
        expr("""(CAST(n_ab AS DECIMAL(38,0)) * n_baskets * 1000000)
                div (CAST(_na AS DECIMAL(38,0)) * _nb)""").as("lift_ppm"))
  }
}

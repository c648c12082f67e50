package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers: salted two-stage aggregation.
  *
  * A `groupBy(key).agg(...)` over a power-law key (one user with 10M
  * events, one hot document hash) sends the whole hot group to a single
  * reducer. Salting splits each group across `salts` sub-groups for the
  * partial stage, then combines the partials in a second (tiny) stage —
  * hot keys parallelize across `salts` reducers at the cost of one extra
  * small shuffle. AQE's skew-join handling covers joins; this covers
  * aggregations, where Spark has no automatic skew splitting.
  *
  * Only works for aggregates that decompose into partial+final (sum,
  * count, min, max — the decomposable core). The salt is derived from a
  * stable hash of a second column (or random if none is available), so
  * results are deterministic.
  */
object Skew {

  /** Key-distribution profile — the diagnostic you run BEFORE picking a
    * salt factor or trusting a join key: one shuffle into per-key
    * counts (map-side partials absorb the hot keys' row streams), then
    * a one-row summary over the |keys|-sized count table. `skew` is
    * max-to-mean (`max · keys ∕ rows`, exact integers until the one
    * final division) — ~1 for uniform keys, ≫1 for power laws; a salted
    * aggregation with `salts ≈ ceil(skew)` levels the reducers. */
  def keyProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    counts.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("n")).as("max_key_rows"),
      expr("percentile(n, 0.5D)").as("p50_key_rows"),
      expr("percentile(n, 0.99D)").as("p99_key_rows"),
      round(max(col("n")).cast("double") * count(lit(1)) / sum(col("n")), 6)
        .as("skew"))
  }

  /** Two-stage salted sum/count per key: returns
    * `(key, sum(valueCol) AS <sumAlias>, count(*) AS <cntAlias>)`,
    * identical to the unsalted `groupBy(key).agg(sum, count)` but with
    * hot keys spread over `salts` partial groups. `saltFrom` must be a
    * column that varies inside a key group (an id, a timestamp). */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltFrom: Column,
      salts: Int = 16,
      sumAlias: String = "sum_value",
      cntAlias: String = "n"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(sumAlias), sum(col("_pcnt")).as(cntAlias))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` re-deals rows whenever the partitioning, row order, or
  * cluster size changes — poison for reproducible train/val/test splits
  * over a corpus that is re-read many times. Hash-based assignment fixes
  * the split as a pure function of a stable id: no RNG state, no shuffle
  * (a projection, fused into whatever scan reads the data), identical on
  * any engine that can compute md5 — the same cross-engine-determinism
  * discipline as the rest of the library (see [[Dedup.hash60]]).
  */
object Split {

  /** Percent bucket in [0, 100) derived from the id's md5. */
  def hashBucket(id: Column): Column =
    pmod(Dedup.hash60(id.cast("string")), lit(100L))

  /** Adds `bucket` and `split` columns. `splits` maps names to integer
    * percentages summing to ≤ 100 (short weights leave a remainder that
    * falls into the last split), assigned in order over the hash bucket:
    * the default 90/5/5 sends bucket 0-89 to train, 90-94 to val, 95-99
    * to test. */
  def assignSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      s"split percentages must sum to <= 100: $splits")
    val b = hashBucket(col(idCol))
    val cuts = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val assign = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), rest) => when(b < cut, lit(name)).otherwise(rest)
    }
    df.withColumn("bucket", b).withColumn("split", assign)
  }

  /** Leakage-safe temporal train/valid split with an embargo gap — the
    * time-series counterpart of [[assignSplit]]: rows strictly before
    * `trainEnd` are `train`, rows at/after `validStart` are `valid`,
    * and rows INSIDE `[trainEnd, validStart)` (the embargo) are dropped
    * so windowed features computed over train rows cannot overlap the
    * validation period (the classic boundary leak: a trailing 7-day
    * aggregate at the last train timestamp reads validation events
    * unless the embargo is at least the feature window).
    *
    * A pure scan-stage projection + filter — no shuffle, no state; the
    * assignment is a function of the row's own timestamp, so any
    * engine, partitioning, or incremental re-run reproduces it, and
    * partition pruning on a date-partitioned 100 TB table serves each
    * split from its own partitions. */
  def temporalSplit(
      df: DataFrame, tsCol: String,
      trainEnd: Column, validStart: Column): DataFrame =
    df.withColumn("split",
        when(col(tsCol) < trainEnd, "train")
          .when(col(tsCol) >= validStart, "valid"))
      .where(col("split").isNotNull)

  /** Deterministic stratified sampling: keeps a row iff the md5 of
    * ("smp" ∥ stratum ∥ id), reduced to parts-per-million, falls under the
    * stratum's rate. A pure filter — no RNG, no shuffle, no state; the
    * sample is a stable function of (stratum, id), so re-running over a
    * re-partitioned / re-clustered 100 TB corpus reproduces it exactly,
    * and samples nest: the rate-0.25 sample is a subset of the rate-0.5
    * sample of the same stratum (both are prefixes of the same hash
    * order). The "smp" purpose prefix decorrelates the sample from
    * [[assignSplit]]'s buckets, which hash the bare id. Rates are rounded
    * to ppm so any engine computing the same md5 draws the same rows. */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0, 1]: $rates / $defaultRate")
    val ppm = pmod(
      Dedup.hash60(concat_ws("|", lit("smp"), col(strataCol), col(idCol).cast("string"))),
      lit(1000000L))
    val cut = rates.toSeq.sortBy(_._1).foldRight(lit(math.round(defaultRate * 1e6))) {
      case ((k, v), rest) => when(col(strataCol) === k, lit(math.round(v * 1e6))).otherwise(rest)
    }
    df.where(ppm < cut)
  }

  /** Deterministic weighted (importance) sampling: keeps a row iff the
    * md5-ppm of ("wsmp" ∥ id) falls under `round(weight · 1e6)`, so each
    * row survives with probability proportional to its own weight —
    * quality-weighted corpus thinning without an RNG. Weights ≤ 0 never
    * survive, ≥ 1 always do. A pure filter in the scan stage: no
    * shuffle, no state, stable under repartitioning, and monotone in
    * the weight — raising a row's weight can only add it to the sample
    * (the per-row draw is a fixed hash threshold test), so samples at
    * uniformly-scaled weights nest exactly like [[stratifiedSample]]
    * rates. The cut is a SINGLE multiply-then-round on the weight —
    * any engine evaluating the same IEEE expression draws identically.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val ppm = pmod(
      Dedup.hash60(concat_ws("|", lit("wsmp"), col(idCol).cast("string"))),
      lit(1000000L))
    df.where(ppm < round(weight * lit(1e6)).cast("long"))
  }

  /** Deterministic domain-mixture resampling: downsample each domain so
    * the surviving corpus matches a target mixture, keeping as much data
    * as possible (no upsampling — the binding domain, the one whose
    * observed share falls shortest of its target, is kept whole and
    * every other domain is thinned to match it).
    *
    * Given target shares s_d (in ppm), observed counts n_d, the binding
    * domain b is the one minimizing n_d/s_d and each domain keeps
    * `rate_d = (s_d * n_b) / (s_b * n_d)` of its rows (rate_b = 1
    * identically), selected by the same purpose-prefixed md5-ppm filter
    * as [[stratifiedSample]] — deterministic, nested across rate
    * changes, engine-reproducible.
    *
    * All arithmetic is EXACT INTEGER arithmetic: the binding domain is
    * the argmin under rational cross-multiplication
    * (`n_b * s_d <= n_d * s_b`, domain name as the tie-break) and a row
    * survives iff `ppm * s_b * n_d < 1e6 * s_d * n_b`, both evaluated in
    * decimal(38,0) — no float division, no floor. An earlier
    * double-precision form (`floor(s_d * scale / n_d)`) rounded the
    * binding domain's own cut down to 999999 for ~5% of (n, share)
    * pairs, silently dropping ~1 ppm of the domain that the contract
    * says is kept whole; cross-multiplied integers cannot exhibit that
    * failure on any engine.
    *
    * Everything stays in-plan: the per-domain counts are one tiny
    * aggregate (|domains| rows, materialized eagerly so the binding and
    * cut derivations reuse it instead of re-scanning the corpus — same
    * rationale as [[Dedup.minhashLshPairs]]'s checkpoint), the binding
    * row a |domains|²-cheap anti-join over it, and the resulting cut
    * table joins back by broadcast — no driver collect. Domains absent
    * from `sharesPpm` are dropped (share 0). At 100 TB the full-data
    * work is exactly two corpus scans: the map-side count aggregate and
    * the final filter.
    */
  def mixtureResample(
      df: DataFrame, idCol: String, domainCol: String,
      sharesPpm: Map[String, Long]): DataFrame = {
    require(sharesPpm.nonEmpty && sharesPpm.values.forall(s => s > 0 && s <= 1000000L),
      s"shares must be in (0, 1e6] ppm: $sharesPpm")
    val shareExpr = sharesPpm.toSeq.sortBy(_._1).foldRight(lit(null).cast("long")) {
      case ((k, v), rest) => when(col(domainCol) === k, lit(v)).otherwise(rest)
    }
    def dec(c: Column) = c.cast("decimal(38,0)")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_share_ppm", shareExpr)
      .where(col("_share_ppm").isNotNull)
      .localCheckpoint()
    // binding domain: no other domain has a strictly smaller n/s ratio
    // (or an equal ratio with a smaller name) — exact rational argmin,
    // exactly one surviving row
    val other = counts.select(col(domainCol).as("_d2"),
      col("_n").as("_n2"), col("_share_ppm").as("_s2"))
    val binding = counts.join(other,
        dec(col("_n2")) * dec(col("_share_ppm")) < dec(col("_n")) * dec(col("_s2")) ||
          (dec(col("_n2")) * dec(col("_share_ppm")) === dec(col("_n")) * dec(col("_s2")) &&
            col("_d2") < col(domainCol)),
        "left_anti")
      .select(col("_n").as("_n_bind"), col("_share_ppm").as("_s_bind"))
    val cuts = counts.crossJoin(binding)
    val ppm = pmod(
      Dedup.hash60(concat_ws("|", lit("mix"), col(domainCol), col(idCol).cast("string"))),
      lit(1000000L))
    df.join(broadcast(cuts), Seq(domainCol))
      .where(dec(ppm) * dec(col("_s_bind")) * dec(col("_n")) <
        dec(lit(1000000L)) * dec(col("_share_ppm")) * dec(col("_n_bind")))
      .drop("_n", "_share_ppm", "_n_bind", "_s_bind")
  }

  /** Temperature-flattened mixture (the multilingual-corpus `n^α`
    * rebalancing rule with α = 1/2): target shares are derived FROM the
    * per-domain counts — share ∝ √n — so over-represented domains are
    * thinned and the tail keeps proportionally more of its data, then
    * the sampling itself delegates to [[mixtureResample]]'s exact
    * rational binding-domain cut. Shares are quantized exactly:
    * `q = ⌊√n · 1e6⌋` (IEEE sqrt is correctly rounded, so q is
    * bit-identical on any engine), `share_ppm = max(1, q·1e6 div Σq)`
    * in BigInt — no double summation anywhere.
    *
    * The |domains|-row count table comes back to the driver (the same
    * model-constant rule as the BPE merges): shares are MODEL, not
    * data. One count aggregate + [[mixtureResample]]'s one broadcast
    * join — two corpus scans, one shuffle. */
  def temperatureMixture(
      df: DataFrame, idCol: String, domainCol: String): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "temperatureMixture needs at least one domain")
    val qs = counts.map { case (d, n) =>
      (d, BigInt(math.floor(math.sqrt(n.toDouble) * 1e6).toLong))
    }
    val tot = qs.map(_._2).sum
    val shares = qs.map { case (d, q) =>
      d -> (q * 1000000 / tot).toLong.max(1L)
    }.toMap
    mixtureResample(df, idCol, domainCol, shares)
  }

  /** Deterministic global shuffle for training-data ordering: every row
    * gets a (shard, pos) such that reading shards in order and rows by
    * `pos` within each shard is a reproducible pseudo-uniform permutation
    * of the corpus — the "shuffle the corpus once per epoch" step of a
    * training pipeline, with no RNG state. Two independent
    * purpose-prefixed md5 hashes of (seed, id) drive it: one picks the
    * shard, one orders rows within the shard (the id itself would
    * reintroduce ingest order); distinct `seed`s give independent
    * permutations (epochs).
    *
    * Scale shape: shard assignment is a pure projection; the only
    * shuffle is one hash partition + per-shard sort for the rank.
    * Shards are independent, so parallelism = `shards` and each sort is
    * corpus/`shards` rows — pick shards so a shard fits a task
    * comfortably (e.g. corpus_rows / shards ≈ 10⁶). Results are
    * invariant to input partitioning and cluster size, and any engine
    * computing md5 reproduces the same permutation. */
  def deterministicShuffle(
      df: DataFrame, idCol: String, shards: Int, seed: String = ""): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    def h(purpose: String): Column = Dedup.hash60(
      concat_ws("|", lit(purpose), lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(h("ord"), col(idCol))
    df.withColumn("shard", pmod(h("shuf"), lit(shards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Deterministic sequence packing for training-batch assembly: each
    * document lands in a training sequence of roughly `budget` tokens.
    *
    * Documents are first hash-assigned to one of `bins` independent
    * packing streams (a pure projection — the same purpose-prefixed md5
    * discipline as [[stratifiedSample]]), then within a bin a running
    * token total ordered by the id yields
    * `seq_id = floor(exclusive_cumsum / budget)`: a document goes to the
    * sequence its first token falls in, and never splits. Oversized
    * documents (> budget tokens) take a sequence id range of their own —
    * downstream truncation policy stays with the trainer.
    *
    * Scale: the only non-projection work is a per-bin sort + running sum
    * (one shuffle on the bin key). Choose `bins` large enough that a
    * bin's documents fit one task comfortably (e.g. corpus_tokens /
    * bins ≈ 10⁸) — bins are independent, so parallelism equals `bins`
    * and results are invariant to cluster size. Packing quality is that
    * of first-come greedy (≈ budget/2 waste worst case, far less on
    * mixed-length corpora); bin-packing heuristics that reorder by
    * length would pack tighter but destroy the deterministic id order
    * this guarantees. */
  def packSequences(
      docs: DataFrame, idCol: String, tokensCol: String,
      budget: Int, bins: Int): DataFrame = {
    require(budget > 0 && bins > 0, s"budget=$budget and bins=$bins must be positive")
    val bin = pmod(
      Dedup.hash60(concat(lit("pack|"), col(idCol).cast("string"))), lit(bins.toLong))
    val w = Window.partitionBy(col("bin")).orderBy(col(idCol))
    docs.withColumn("bin", bin)
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .select(col(idCol), col("bin"), col(tokensCol),
        floor((col("_cum") - col(tokensCol)).cast("double") / budget).as("seq_id"))
  }

  /** Deterministic per-group token budgeting (data-mixture sizing):
    * within each group, documents are taken greedily in purpose-hashed
    * `(key, id)` order until the group's token budget is reached — a row
    * is kept iff the exclusive running token total (`toks_before`) is
    * still under the budget, so the crossing document is included and a
    * group with a nonzero budget always contributes at least one
    * document. Like [[stratifiedSample]] the order is a pure function of
    * the id, so the selection is reproducible on any engine and a larger
    * budget's selection is a superset of a smaller one's.
    *
    * Scale shape: a group-wide ordered window would serialize each group
    * into one task — and mixture groups are few and huge. Instead the
    * hash key's top bits pre-segment every group into `buckets` ordered
    * slices: per-(group, bucket) token sums (one map-side-combinable
    * aggregation) prefix-sum into bucket offsets (a window over ≤
    * groups × buckets rows, broadcast back), and the row-level running
    * total only ever windows one (group, bucket) slice — 1/`buckets` of
    * a group per task regardless of group skew. Ordering by the key
    * equals ordering by (bucket, key) because the bucket IS the key's
    * top bits, so the two-phase form computes exactly the single-window
    * semantics. */
  def tokenBudget(
      docs: DataFrame, idCol: String, tokensCol: String, groupCol: String,
      budgets: Map[String, Long], defaultBudget: Long,
      buckets: Int = 256): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      s"budgets must be non-negative: $budgets / $defaultBudget")
    val budget = budgets.toSeq.sortBy(_._1).foldRight(lit(defaultBudget)) {
      case ((k, v), rest) => when(col(groupCol) === k, lit(v)).otherwise(rest)
    }
    hashOrderBefore(docs, idCol, tokensCol, groupCol, buckets, "tb|")
      .withColumnRenamed("_before", "toks_before")
      .where(col("toks_before") < budget)
      .drop("_key", "_bkt", "_boff")
  }

  /** Exclusive running total of `valueCol` in the deterministic
    * md5-hash traversal order of each group — the bucketed two-phase
    * cumsum shared by [[tokenBudget]] and [[compactionPlan]] (scale
    * rationale in the tokenBudget scaladoc: the key's top bits
    * pre-segment each group so no window ever serializes a whole
    * group). Adds `_key`, `_bkt`, `_boff`, `_before`; callers drop the
    * internals. EAGER: the keyed input is `localCheckpoint()`ed — it
    * feeds both the offsets aggregation and the final window. */
  private def hashOrderBefore(
      docs: DataFrame, idCol: String, valueCol: String, groupCol: String,
      buckets: Int, prefix: String): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a positive power of two: $buckets")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val keyed = docs
      .withColumn("_key", Dedup.hash60(concat(lit(prefix), col(idCol).cast("string"))))
      .withColumn("_bkt", shiftright(col("_key"), shift))
      .localCheckpoint()
    val offsets = keyed.groupBy(col(groupCol), col("_bkt"))
      .agg(sum(col(valueCol)).as("_bsum"))
      .withColumn("_boff", coalesce(
        sum(col("_bsum")).over(Window.partitionBy(col(groupCol)).orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("_bkt"), col("_boff"))
    val wRow = Window.partitionBy(col(groupCol), col("_bkt"))
      .orderBy(col("_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), Seq(groupCol, "_bkt"))
      .withColumn("_before",
        col("_boff") + coalesce(sum(col(valueCol)).over(wRow), lit(0L)))
  }

  /** Small-files compaction / output-file assignment: bin each row of a
    * group into sequential `targetBytes`-sized output files —
    * `file_seq = floor(bytes_before / target)` over the deterministic
    * hash traversal order, so any engine (or a re-run after failure)
    * derives the identical layout with no coordination. A row may
    * straddle its file boundary (files can finish slightly over
    * target) — standard size-based assignment semantics. Rides the
    * same two-phase cumsum as [[tokenBudget]]; the hash order also
    * mixes content across output files instead of preserving ingest
    * clustering. */
  def compactionPlan(
      files: DataFrame, idCol: String, sizeCol: String, groupCol: String,
      targetBytes: Long, buckets: Int = 256): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    hashOrderBefore(files, idCol, sizeCol, groupCol, buckets, "cp|")
      .withColumn("file_seq", expr(s"_before div ${targetBytes}L"))
      .drop("_key", "_bkt", "_boff", "_before")
  }

  /** Proportional stratified sample with an EXACT total — the
    * fixed-budget contract [[stratifiedSample]]'s per-stratum rates
    * cannot express ("give me exactly 100k eval documents, stratified
    * by language"). Stratum h of size N_h gets
    * `n_h = ⌊k·N_h/N⌋` rows plus one of the `k − Σ⌊·⌋` leftovers by
    * LARGEST REMAINDER (Hamilton apportionment; ties on the remainder
    * break to the smaller stratum key) — Σ n_h = k exactly, every
    * computation integer. Within a stratum the selected rows are the
    * first n_h in md5-hash order (ties by id): no RNG, reproducible,
    * and whenever a stratum's allocation grows its sample EXTENDS
    * rather than re-deals. (Hamilton apportionment is not strictly
    * monotone in k — the Alabama paradox can shrink one stratum's
    * allocation as the total grows; use a divisor method if strict
    * per-stratum monotonicity matters more than exact
    * proportionality.)
    *
    * Scale shape: one stratum-count aggregate (|strata| rows — the
    * allocation math, including its rank window, runs on that bounded
    * table); the selection is one stratum-key window over hash order,
    * per-partition state one stratum's rows. A stratum with fewer than
    * n_h rows keeps them all and the realized total falls short —
    * validate `k ≤ N` upstream (enforced here by require on the
    * caller's k only).
    *
    * Output: the sampled rows of `df` (id + stratum), `n_h` per row as
    * `alloc` for auditability.
    */
  def exactAllocationSample(
      df: DataFrame, idCol: String, stratumCol: String, k: Long): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_nh"))
    val tot = counts.agg(sum(col("_nh")).as("_n"), count(lit(1)).as("_ns"))
    // |strata|-row table: the unpartitioned rank window is bounded by
    // construction (the q36 offsets-table rule)
    // k·N_h widened to DECIMAL before the multiply (the q35 overflow
    // rule): at corpus scale the product exceeds BIGINT long before
    // either factor does
    val alloc = counts.crossJoin(broadcast(tot))
      .withColumn("_base",
        expr(s"CAST((CAST(${k} AS DECIMAL(38,0)) * _nh) div _n AS BIGINT)"))
      .withColumn("_rem", expr(s"CAST(CAST(${k} AS DECIMAL(38,0)) * _nh % _n AS BIGINT)"))
      .withColumn("_extra", expr(s"${k}L - sum(_base) OVER ()"))
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("_rem").desc, col(stratumCol))))
      .withColumn("alloc",
        col("_base") + when(col("_rk") <= col("_extra"), 1L).otherwise(0L))
      .select(col(stratumCol), col("alloc"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", Dedup.hash60(
        concat_ws("|", lit("alloc"), col(stratumCol), col(idCol).cast("string"))))
      .withColumn("_rk", row_number().over(w))
      .join(broadcast(alloc), Seq(stratumCol))
      .where(col("_rk") <= col("alloc"))
      .drop("_h", "_rk")
  }

  /** Recency-decayed deterministic sampling — "prefer fresh data
    * without discarding history": a row of age `a` days (relative to
    * `asOf`) is kept with probability `h/(h+a)` — exactly ½ at the
    * half-life `h`, ⅓ at 2h, hyperbolic tail so even old strata retain
    * coverage (the heavy-tailed alternative to exponential decay, whose
    * `exp()` would also break the no-transcendentals-on-data
    * exactness discipline: `h·10⁶ div (h+a)` is pure integer
    * arithmetic with non-negative operands).
    *
    * Deterministic like every sampler here ([[stratifiedSample]]'s
    * contract): the coin is `hash60("rec|" ∥ id) mod 10⁶` compared to
    * the row's own keep-ppm — no RNG, re-runs and engines agree
    * bit-for-bit, and a row's fate is stable as the corpus grows.
    * Future rows (age < 0) clamp to age 0 (always-keep-eligible).
    *
    * A pure scan-stage filter — no shuffle, no state; on a
    * date-partitioned 100 TB table the age is constant per partition,
    * so partition-level stats make the decayed volume predictable
    * before the scan. Output: the kept rows plus `(age_days,
    * keep_ppm)` for auditing the realized decay curve.
    */
  def recencySample(
      df: DataFrame, idCol: String, tsCol: String, asOf: Column,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    df.withColumn("age_days",
        greatest(lit(0L), datediff(asOf, col(tsCol).cast("date")).cast("long")))
      .withColumn("keep_ppm", expr(
        s"CAST(CAST($halfLifeDays AS BIGINT) * 1000000" +
          s" div ($halfLifeDays + age_days) AS BIGINT)"))
      .where(pmod(Dedup.hash60(concat(lit("rec|"), col(idCol).cast("string"))),
        lit(1000000L)) < col("keep_ppm"))
  }
}

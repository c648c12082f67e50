package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded k-minimum-values buffer: the k smallest DISTINCT hashes seen,
  * sorted ascending. Distinctness in the buffer is what separates KMV
  * from a plain min-k sample — duplicates of one value hash identically
  * and must occupy one slot, not k. Exact integer state, so merge order
  * (partitioning) cannot change the result. */
class KmvAgg(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] with Serializable {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Long] = Vector.empty

  /** O(1) reject in the steady state, O(log n) duplicate check +
    * O(n) single-shift insert otherwise (vs the old linear `contains`
    * + full re-sort) — the win is the warm-up of each partition's
    * first k distinct values. The buffer invariant (sorted ascending,
    * distinct) is both assumed and preserved. */
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    val n = buf.size
    if (n >= k && h >= buf(n - 1)) buf // O(1) reject path
    else {
      var lo = 0
      var hi = n
      while (lo < hi) { // binary search; an exact hit is a duplicate
        val mid = (lo + hi) >>> 1
        val m = buf(mid)
        if (m == h) return buf
        else if (m < h) lo = mid + 1
        else hi = mid
      }
      val size2 = math.min(n + 1, k)
      val b = new Array[Long](size2)
      var i = 0
      while (i < lo) { b(i) = buf(i); i += 1 }
      b(lo) = h // lo < size2 always: a full buffer rejected h >= last above
      i = lo + 1
      while (i < size2) { b(i) = buf(i - 1); i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** K-minimum-values distinct-count sketch — the mergeable cardinality
  * estimator whose state is just the k smallest distinct 60-bit md5
  * hashes of the values: under a uniform hash the k-th smallest value
  * `h_k` sits at ≈ k/n of the hash space, so
  * `n̂ = (k−1) · 2⁶⁰ / h_k` (the standard unbiased KMV estimator,
  * relative error ≈ 1/√k). Below k distinct values the sketch IS the
  * distinct set and the count is exact.
  *
  * Versus HLL++ (`approx_count_distinct`): ~64 bits/slot instead of 6,
  * but the state is engine-reproducible integers (the DuckDB oracle
  * recomputes it from scratch and matches bit-for-bit) and the same
  * buffer doubles as a distinct sample of the keys. The aggregate is a
  * map-side-partial [[KmvAgg]], so ≤ k values per partition cross the
  * shuffle — the same bounded-partial shape as [[TopK.perQuery]].
  */
object Kmv {

  /** Purpose-prefixed 60-bit hash of the value column. */
  def hash(c: Column): Column = Dedup.hash60(concat(lit("kmv|"), c.cast("string")))

  /** The KMV estimator over a sorted k-min buffer column (referenced BY
    * NAME — the `(k−1)·2⁶⁰ div h_k` floor division must be the
    * IntegralDivide expression, which the Column API only exposes via
    * SQL text): exact fill while the buffer holds < k hashes, the
    * unbiased estimator otherwise. THE single definition of the
    * estimate — batch [[distinctEstimate]] and the streaming windowed
    * form share it, so stream==batch parity cannot drift.
    *
    * Guarded against h_k == 0 (hash60 CAN yield 0, p ≈ k/2⁶⁰): an
    * unguarded divide is NULL under Spark's non-ANSI integral divide
    * but a hard error under DuckDB's `//` — a cross-engine divergence.
    * h_k = 0 means the sketch holds the hash-space minimum, i.e. the
    * estimator is unboundedly large; fall back to the fill count (the
    * only defensible lower bound) on BOTH engines. */
  def estimate(bufColName: String, k: Int): Column =
    when(size(col(bufColName)) < k ||
        element_at(col(bufColName), k) <= lit(0L),
      size(col(bufColName)).cast("long"))
      .otherwise(expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976" +
        s" div element_at($bufColName, $k)"))

  /** One-row distinct estimate of `valueCol`:
    * `(n_distinct_hashes, est_distinct)` — `n_distinct_hashes` is the
    * buffer fill (= exact distinct count while < k). */
  def distinctEstimate(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    val agg = udaf(new KmvAgg(k), ExpressionEncoder[Long]())
    df.select(hash(col(valueCol)).as("_h"))
      .agg(agg(col("_h")).as("_kmv"))
      .select(size(col("_kmv")).cast("long").as("n_distinct_hashes"),
        estimate("_kmv", k).as("est_distinct"))
  }

  /** Sketch-algebra overlap matrix: for every unordered pair of `setCol`
    * values, the estimated distinct `valueCol` count of each side, of
    * their union, and of their intersection by inclusion–exclusion
    * (`est_a + est_b − est_union`, floored at 0) — the "how much do
    * these sources/segments share" audit WITHOUT shuffling values per
    * pair. This leans on the KMV union property: the k smallest hashes
    * of A∪B all live inside kmin(A) ∪ kmin(B), so merging two k-min
    * buffers (concat → distinct → sort → take k, plain codegen'd array
    * ops on |sets|² tiny rows) yields EXACTLY the union's sketch.
    *
    * One shuffle builds the per-set sketches (≤ k longs each crossing
    * the wire); everything pairwise happens on the |sets|-row sketch
    * table. Inclusion–exclusion error compounds (≈ 3/√k relative on
    * the intersection of similar-sized sets) — raise k for tighter
    * audits, or fall back to the exact pair join when |sets| is small.
    */
  def pairOverlap(
      df: DataFrame, setCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    val agg = udaf(new KmvAgg(k), ExpressionEncoder[Long]())
    val sk = df.select(col(setCol).as("_t"), hash(col(valueCol)).as("_h"))
      .groupBy(col("_t")).agg(agg(col("_h")).as("_kmv"))
    val a = sk.select(col("_t").as("set_a"), col("_kmv").as("_ka"))
    val b = sk.select(col("_t").as("set_b"), col("_kmv").as("_kb"))
    a.join(b, col("set_a") < col("set_b"))
      .withColumn("_ku",
        slice(array_sort(array_distinct(concat(col("_ka"), col("_kb")))), 1, k))
      .select(col("set_a"), col("set_b"),
        estimate("_ka", k).as("est_a"), estimate("_kb", k).as("est_b"),
        estimate("_ku", k).as("est_union"))
      .withColumn("est_overlap",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
  }
}

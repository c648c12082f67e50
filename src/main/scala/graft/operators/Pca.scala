package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass exact moment accumulator over quantized integer vectors:
  * buffer = [n, s₀..s_{d-1}, M upper triangle row-major] where
  * `s_i = Σ x_i` and `M_ij = Σ x_i·x_j` — everything a covariance (or
  * whitening) computation needs, in ONE scan with map-side partial
  * merge. All entries are exact integer sums, so merge order (hence
  * partitioning) cannot change the result.
  *
  * The buffer is mutated in place and re-returned — the object-hash
  * aggregate holds one live buffer per group, so this is allocation-free
  * per row (the d² inner loop is the cost that matters at 10⁹ rows).
  */
class MomentAgg(dim: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] with Serializable {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  private val triLen = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](1 + dim + triLen)

  override def reduce(buf: Array[Long], x: Seq[Long]): Array[Long] = {
    if (x == null) return buf // null vectors contribute nothing
    require(x.length == dim, s"vector length ${x.length} != dim $dim")
    val v = x.toArray
    buf(0) += 1L
    var i = 0
    var t = 1 + dim
    while (i < dim) {
      buf(1 + i) += v(i)
      var j = i
      while (j < dim) {
        buf(t) += v(i) * v(j)
        t += 1; j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** Distributed PCA top component — the leading eigenvector of the
  * embedding covariance, the whitening / anisotropy-diagnostic
  * statistic ("is this embedding space collapsing onto one axis?").
  *
  * Exactness strategy: embeddings quantize to integer milli-units, the
  * scatter matrix `S = n·M − s·sᵀ` (n× the covariance — same
  * eigenvectors) is assembled from [[MomentAgg]]'s exact integer
  * moments, and the power iteration itself runs in EXACT INTEGER
  * arithmetic: each step computes `w = S·v` in arbitrary-precision
  * integers and renormalizes to `v_i = sign(w_i)·⌊|w_i|·1e6 / max|w|⌋`
  * — no float matvec, no √-norm, so any engine (the DuckDB oracle
  * unrolls the same iterations in HUGEINT CTEs) reproduces the loading
  * vector bit-for-bit. Sign is fixed by making the first nonzero
  * loading positive.
  *
  * Scale shape: ONE corpus scan through the d(d+3)/2-long moment
  * buffer with map-side partials (the d² work rides the scan, nothing
  * data-sized shuffles); the collected buffer is a model constant
  * (2,144 longs at d=64 — same altitude as the BPE merge table), and
  * the iteration is driver arithmetic on a d×d matrix. Output: one row
  * per dimension `(dim, loading_micro)`.
  */
object Pca {

  def topComponent(
      emb: DataFrame, vecCol: String, dim: Int = 64,
      iters: Int = 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val agg = udaf(new MomentAgg(dim), ExpressionEncoder[Seq[Long]]())
    // ONE driver-side collect of the moment buffer — a model constant,
    // not a data path (documented altitude: Bpe's per-round winner).
    val buf = emb.select(Similarity.quantize(col(vecCol)).as("_q"))
      .agg(agg(col("_q")).as("_m"))
      .head().getSeq[Long](0)
    val n = BigInt(buf(0))
    val s = Array.tabulate(dim)(i => BigInt(buf(1 + i)))
    val scat = Array.ofDim[BigInt](dim, dim)
    var t = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val c = n * BigInt(buf(t)) - s(i) * s(j)
      scat(i)(j) = c; scat(j)(i) = c
      t += 1
    }
    val million = BigInt(1000000)
    // start at 1e6 + i, not all-ones: a perfectly antisymmetric scatter
    // (dim_a = -dim_b exactly, realistic under integer quantization)
    // annihilates a constant start vector on iteration 1 and the method
    // would report all-zero loadings; the per-dim offset breaks that
    // exact cancellation while staying deterministic
    var v = Array.tabulate(dim)(i => million + i)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < dim) { acc += scat(i)(j) * v(j); j += 1 }
        acc
      }
      val mx = w.map(_.abs).max
      v =
        if (mx == 0) Array.fill(dim)(BigInt(0))
        // sign-split the floor division so truncation direction is
        // explicit and mirrors the oracle's CASE exactly
        else w.map(x => if (x < 0) -((-x) * million / mx) else x * million / mx)
    }
    val sign = v.find(_ != 0).map(x => if (x < 0) BigInt(-1) else BigInt(1))
      .getOrElse(BigInt(1))
    v.zipWithIndex.map { case (x, i) => (i.toLong, (x * sign).toLong) }
      .toSeq.toDF("dim", "loading_micro")
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sign_bands(array<bigint>) -> array<bigint>` — ALL sign-sketch band
  * keys of a quantized vector in one fused codegen loop.
  *
  * The composable form the banded near-dup miners used through round 12
  * (`array(band_0, …, band_{B-1})` where each band is a
  * `Σ_p when(long_dot(q, w_bp) >= 0, 1<<p)` chain) expands to
  * bands×planes separate `long_dot` calls — at the d5 production grid
  * (35 bands × 16 planes × 64 dims) that is a 560-expression projection
  * whose generated code overflows whole-stage codegen's method budget
  * and falls back to interpreted per-expression evaluation, measured as
  * THE dominant stage of `d5_embedding_neardup` (5.8 s of its 6.6 s
  * construction at sf0.1). This expression computes the identical keys
  * (same [[graft.operators.Similarity.planeWeightsSeeded]] md5 weight
  * family, same `dot >= 0` sign rule, same `Σ 1L<<p` packing, same
  * min(|q|, dim) dot-length semantics as [[LongArrayDot]]) in a single
  * bands×planes×dim loop with the weight matrix held once per task —
  * no per-plane literals, no fallback.
  *
  * Weight layout: `weights(b*planes + p)` is plane p of band b, each a
  * `dim`-long row, exactly `planeWeightsSeeded(seeds(b), planes, dim)`.
  */
case class SignBands(child: Expression, seeds: Seq[String], planes: Int,
    dim: Int = 64) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if seeds.nonEmpty && planes > 0 && planes <= 63 && dim > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sign_bands requires (array<bigint>, >=1 seed, 0 < planes <= 63, dim > 0), got " +
        s"(${child.dataType.simpleString}, ${seeds.size} seeds, $planes planes, $dim dim)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // one flat [bands*planes][dim] matrix — the same md5-derived family the
  // SQL oracle interpolates; computed once per expression instance
  @transient private lazy val wArr: Array[Array[Long]] =
    seeds.iterator.flatMap(s =>
      graft.operators.Similarity.planeWeightsSeeded(s, planes, dim)
        .map(_.toArray)).toArray

  private def bands: Int = seeds.size

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var p = 0
      while (p < planes) {
        val w = wArr(b * planes + p)
        var s = 0L
        var d = 0
        while (d < n) { s += q.getLong(d) * w(d); d += 1 }
        if (s >= 0) key |= 1L << p
        p += 1
      }
      out(b) = key
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val wRef = ctx.addReferenceObj("signBandsW", wArr, "long[][]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val w = ctx.freshName("w")
      val key = ctx.freshName("key")
      s"""
         |int $n = java.lang.Math.min($q.numElements(), $dim);
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    long[] $w = $wRef[$b * $planes + $p];
         |    long $s = 0L;
         |    for (int $d = 0; $d < $n; $d++) { $s += $q.getLong($d) * $w[$d]; }
         |    if ($s >= 0) $key |= 1L << $p;
         |  }
         |  $out[$b] = $key;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBands {
  /** Column builder: the band-key array `[key_band0, …]` of a quantized
    * vector — drop-in for `array(lshBucketSeeded(q, seeds(0), planes), …)`. */
  def bandKeys(qvec: org.apache.spark.sql.Column, seeds: Seq[String],
      planes: Int, dim: Int = 64): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SignBands(org.apache.spark.sql.graft.ColumnBridge.expression(qvec),
        seeds, planes, dim))
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vocab

/** Behavior specs for the round-9 fixes: the DSIR scoring expression's
  * arithmetic width at genuine 100 TB (and beyond — near-2⁶³) token
  * counts. The round-8 form multiplied two data-derived BIGINTs before
  * the double cast, which leaves 64-bit range exactly at the scale the
  * scaladoc claims; the fixed expression widens every operand to
  * DECIMAL(38,0) first, so the integer products are exact for ANY pair
  * of 64-bit counts and the single IEEE rounding happens at the cast
  * that feeds ln — bit-identical to the oracle's HUGEINT→DOUBLE path.
  */
class Round9OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round9-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Mirror of the expected math: exact BigInt products, one
    * nearest-double rounding per side (BigDecimal.doubleValue ==
    * Spark's Decimal→double cast), then Spark's HALF_UP double round. */
  private def expectedMicro(cfT: Long, sC: Long, cfC: Long, sT: Long,
      v: Long): Long = {
    val num = (BigInt(cfT) + 1) * (BigInt(sC) + BigInt(v))
    val den = (BigInt(cfC) + 1) * (BigInt(sT) + BigInt(v))
    val x = math.log(num.doubleValue / den.doubleValue) * 1e6
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  test("dsirDeltaMicro survives 100 TB-scale and near-2^63 counts (no overflow)") {
    import spark.implicits._
    // row 1: "the" at a real 100 TB corpus — cf_c ≈ 10¹² against a
    //        10⁷-token target sample; (cf_c+1)(S_t+V) ≈ 6×10¹⁹ > 2⁶³−1,
    //        the exact operand mix VERDICT r8 flagged as fatal-or-silent
    // row 2: a hot target term — (cf_t+1)(S_c+V) ≈ 10¹⁹ > 2⁶³−1
    // row 3: adversarial near-2⁶³ counts on every operand; the products
    //        (~8.5×10³⁷) still fit DECIMAL(38,0)/HUGEINT, and even the
    //        +1/+V additions must not wrap in the long domain
    val near = Long.MaxValue - 100L
    val rows = Seq(
      (1L, 400000L, 25000000000000L, 1000000000000L, 10000000L, 50000000L),
      (2L, 400000000L, 25000000000000L, 7L, 10000000L, 50000000L),
      (3L, near / 2, near, near / 3, near / 5, 1000000L))
    val out = rows.toDF("id", "cf_t", "s_c", "cf_c", "s_t", "v")
      .select($"id", Vocab.dsirDeltaMicro(
        $"cf_t", $"s_c", $"cf_c", $"s_t", $"v").as("delta_micro"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = rows.map { case (id, cfT, sC, cfC, sT, v) =>
      (id, expectedMicro(cfT, sC, cfC, sT, v))
    }
    assert(out.toSeq === want)
    // sanity: the flagged products really do leave 64-bit range, i.e.
    // this fixture would have killed (ANSI) or corrupted (non-ANSI)
    // the round-8 LONG×LONG form
    assert((BigInt(1000000000000L) + 1) * (10000000L + 50000000L) >
      BigInt(Long.MaxValue))
    assert((BigInt(near) / 2 + 1) * (BigInt(near) + 1000000L) >
      BigInt(Long.MaxValue))
  }

  test("dsirDeltaMicro matches the hand-computed small-count fixture exactly") {
    import spark.implicits._
    // same arithmetic as the Round8OpsSpec end-to-end fixture:
    // delta(a) = round(ln(1·8 / (3·5))·1e6) = −628609 (negative, exact)
    val out = Seq((0L, 5L, 2L, 2L, 3L)).toDF("cf_t", "s_c", "cf_c", "s_t", "v")
      .select(Vocab.dsirDeltaMicro($"cf_t", $"s_c", $"cf_c", $"s_t", $"v"))
      .collect().head.getLong(0)
    assert(out === -628609L)
  }
}

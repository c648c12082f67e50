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

  test("decodeImages reads real PNG/BMP/JPEG/GIF headers, quarantines garbage") {
    import java.awt.image.BufferedImage
    import spark.implicits._
    def enc(fmt: String, imgType: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK lacks $fmt writer")
      bos.toByteArray
    }
    val fixtures = Seq(
      (1L, enc("png", BufferedImage.TYPE_INT_RGB, 17, 9)),
      (2L, enc("png", BufferedImage.TYPE_BYTE_GRAY, 5, 40)),
      (3L, enc("png", BufferedImage.TYPE_INT_ARGB, 8, 8)),
      (4L, enc("bmp", BufferedImage.TYPE_3BYTE_BGR, 33, 2)),
      (5L, enc("jpg", BufferedImage.TYPE_INT_RGB, 64, 48)),
      (6L, enc("gif", BufferedImage.TYPE_INT_RGB, 12, 3)),
      (7L, "definitely not an image".getBytes("UTF-8")),
      (8L, Array.emptyByteArray),
      (9L, null: Array[Byte])) // NULL payload: quarantine, never an NPE
    val withNullId = fixtures.toDF("media_id", "bytes")
      .union(Seq((null.asInstanceOf[java.lang.Long], "x".getBytes("UTF-8")))
        .toDF("media_id", "bytes")) // NULL id: dropped, never an NPE
    val out = graft.operators.Multimodal
      .decodeImages(withNullId.repartition(3))
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), r.getLong(5)))
    // precomputed constants: dims/bands from the real container headers
    // (GIF encodes palette-indexed → 1 band; ARGB PNG → 4 bands)
    assert(out.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq === Seq(
      (1L, Some("png"), Some(17), Some(9), Some(3)),
      (2L, Some("png"), Some(5), Some(40), Some(1)),
      (3L, Some("png"), Some(8), Some(8), Some(4)),
      (4L, Some("bmp"), Some(33), Some(2), Some(3)),
      (5L, Some("jpeg"), Some(64), Some(48), Some(3)),
      (6L, Some("gif"), Some(12), Some(3), Some(1)),
      (7L, None, None, None, None),
      (8L, None, None, None, None),
      (9L, None, None, None, None)))
    // n_bytes is the raw payload length even for quarantined rows
    assert(out.find(_._1 == 7L).get._6 === "definitely not an image".length.toLong)
    assert(out.find(_._1 == 8L).get._6 === 0L)
    assert(out.find(_._1 == 9L).get._6 === 0L)
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

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Paths, Sessions}

/** Hardening properties for the round-9 surface: the burstiness
  * overflow guard must fail LOUDLY (matching the DuckDB HUGEINT
  * oracle's behavior) instead of silently NULLing, and the decode /
  * twins operators must be partition-invariant.
  */
class Round9PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round9-property-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("burstiness: DECIMAL(38,0) spread overflow raises instead of silent NULL") {
    import spark.implicits._
    // one zero gap + one full-span gap (~9.2e18 µs): Σg and Σg² both
    // stay in range, but n_gaps·Σg² = 2·8.5e37 ≈ 1.7e38 > 10³⁸−1 — the
    // exact intermediate ADVICE r8 flagged. Under ANSI Spark raises its
    // own arithmetic error (already loud); under NON-ANSI the product
    // silently NULLs while the DuckDB HUGEINT oracle errors, so the
    // guard must supply the loud failure there — that's the mode this
    // test pins
    val big = Long.MaxValue - 10L
    val ev = Seq((1L, 0L, 1L), (1L, 0L, 2L), (1L, big, 3L))
      .toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled", "true")
    val e =
      try {
        spark.conf.set("spark.sql.ansi.enabled", "false")
        intercept[Exception] { Sessions.burstiness(ev).collect() }
      } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
    assert(messages(e).exists(_.contains("overflowed DECIMAL(38,0)")),
      s"expected the loud overflow guard, got: ${messages(e).mkString(" | ")}")
    // and a healthy user on the same plan still computes
    val ok = Sessions.burstiness(
      Seq((2L, 0L, 1L), (2L, 1000000L, 2L), (2L, 2000000L, 3L))
        .toDF("user_id", "us", "event_id")
        .withColumn("ts", timestamp_micros(col("us"))))
      .collect()
    assert(ok.length === 1 && ok.head.getDouble(2) === -1.0) // metronome
  }

  test("decodeImages is partition-invariant") {
    import java.awt.image.BufferedImage
    import spark.implicits._
    val fixtures = (1L to 12L).map { k =>
      if (k % 4 == 0) (k, s"garbage $k".getBytes("UTF-8"))
      else {
        val img = new BufferedImage(
          (k % 5 + 1).toInt * 2, (k % 3 + 1).toInt * 3,
          BufferedImage.TYPE_INT_RGB)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (k, bos.toByteArray)
      }
    }
    def run(parts: Int): Seq[Seq[Any]] =
      Multimodal.decodeImages(
          fixtures.toDF("media_id", "bytes").repartition(parts))
        .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(run(1) === run(7))
    assert(run(7) === run(3))
  }

  test("behaviorTwins is partition-invariant (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val types = Seq("a", "b", "c", "d")
    val events = (1 to 600).map { i =>
      (rnd.nextInt(25).toLong + 1L, types(rnd.nextInt(types.size)),
        rnd.nextInt(100000).toLong, i.toLong)
    }.toDF("user_id", "event_type", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    def run(parts: Int): Seq[Seq[Any]] =
      Paths.behaviorTwins(events.repartition(parts), Seq(1L, 2L, 3L), k = 4)
        .orderBy("query_user", "rank").collect().map(_.toSeq).toSeq
    val base = run(1)
    assert(base.nonEmpty)
    assert(base === run(8))
    assert(base === run(3))
  }
}

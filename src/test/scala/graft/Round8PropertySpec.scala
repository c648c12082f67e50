package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sessions, Vocab}

/** Randomized partition-invariance properties for the round-8 operators:
  * every new scorer must produce BIT-IDENTICAL results regardless of how
  * the input is partitioned (the repo's engine-determinism bar — integer
  * quantization before aggregation is what makes this hold; a raw double
  * sum would fail it). Failures are reproducible from the printed seed.
  */
class Round8PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round8-prop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val seed = System.nanoTime()

  private def randomDocs(rnd: Random, n: Int) = {
    import spark.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "the", "a", "of", "to", "and", "stream", "spark", "hash", "window")
    (1 to n).map { i =>
      val len = 5 + rnd.nextInt(60)
      (i.toLong, (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("bm25, dsir, winnowing and burstiness are partition-invariant (seeded)") {
    import spark.implicits._
    info(s"seed=$seed")
    val rnd = new Random(seed)
    val docs = randomDocs(rnd, 120)
    val layouts = Seq(docs.coalesce(1), docs.repartition(7), docs.repartition(3))

    def invariant(name: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val results = layouts.map(l => sortedRows(f(l)))
      assert(results(0).nonEmpty, s"$name: empty result weakens the property")
      assert(results.distinct.size === 1,
        s"$name must be bit-identical across partitionings (seed=$seed)")
    }

    invariant("bm25")(d =>
      Vocab.bm25TopK(d, Seq("spark", "hash"), k = 10))
    invariant("dsir")(d =>
      Vocab.dsirLogRatio(d, d.where($"doc_id" % 5 === 0)))
    invariant("winnowing")(d =>
      // low minOverlapPpm so the random corpus actually yields pairs
      Dedup.winnowingPairs(d, k = 4, w = 3, dfCap = 512, minOverlapPpm = 1000L))

    val events = (1 to 400).map { i =>
      (rnd.nextInt(25).toLong, i.toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L))
    }.toDF("user_id", "event_id", "ts")
    val elayouts = Seq(events.coalesce(1), events.repartition(5))
    val eres = elayouts.map(l => sortedRows(Sessions.burstiness(l)))
    assert(eres(0).nonEmpty)
    assert(eres.distinct.size === 1,
      s"burstiness must be bit-identical across partitionings (seed=$seed)")
  }
}

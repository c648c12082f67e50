package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pii
import graft.operators.{Decontaminate, Split, Transitions}

/** Randomized-correctness properties for the curation operators, checked
  * against independent in-driver reimplementations on seeded random
  * corpora — failures are reproducible from the printed seed.
  */
class CurationPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("curation-prop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def words(rnd: Random, n: Int): Seq[String] =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))

  test("pii scrub removes every injected match and leaves clean text unchanged") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val rows = (0 until 60).map { i =>
        val base = words(rnd, 3 + rnd.nextInt(8))
        val withPii = base.flatMap { w =>
          rnd.nextInt(4) match {
            case 0 => Seq(w, s"u${rnd.nextInt(99)}@ex${rnd.nextInt(9)}.com")
            case 1 => Seq(w, s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}")
            // a word after the phone so the permissive phone pattern
            // cannot run into a following dotted-quad
            case 2 => Seq(w, s"+1-555-${1000000 + rnd.nextInt(8999999)}", "pad")
            case _ => Seq(w)
          }
        }
        (i.toLong, base.mkString(" "), withPii.mkString(" "))
      }
      val df = rows.toDF("id", "clean", "dirty")
      // scrubbed text has zero residual matches of any class
      val residual = df.select(
        Pii.emailCount(Pii.scrub(col("dirty"))).as("e"),
        Pii.ipv4Count(Pii.scrub(col("dirty"))).as("i"),
        Pii.phoneCount(Pii.scrub(col("dirty"))).as("p"))
        .where(col("e") =!= 0 || col("i") =!= 0 || col("p") =!= 0).count()
      assert(residual === 0L, s"seed=$seed left PII after scrub")
      // PII-free text passes through byte-identical
      val changed = df.where(Pii.scrub(col("clean")) =!= col("clean")).count()
      assert(changed === 0L, s"seed=$seed altered clean text")
    }
  }

  test("sequence packing matches an independent reimplementation; repartition-invariant") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val rows = (0 until 200).map(i => (i.toLong, (1 + rnd.nextInt(800)).toLong))
      val df = rows.toDF("doc_id", "n_tokens").repartition(5)
      val got = Split.packSequences(df, "doc_id", "n_tokens", budget = 512, bins = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
      // reimplement: md5-derived bin, per-bin exclusive cumsum by id
      def bin(id: Long): Long = {
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"pack|$id".getBytes("UTF-8"))
        val hex = md5.map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 4
      }
      val expected = rows.map { case (id, t) => (id, bin(id), t) }
        .groupBy(_._2).toSeq.flatMap { case (b, docs) =>
          val sorted = docs.sortBy(_._1)
          val cums = sorted.scanLeft(0L)(_ + _._3)
          sorted.zip(cums).map { case ((id, _, _), c) => (id, b, c / 512) }
        }.sortBy(_._1)
      assert(got.toSeq === expected, s"seed=$seed packing mismatch")
    }
  }

  test("decontamination matches a brute-force shingle-intersection oracle") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 80).map(i => (i.toLong, words(rnd, 3 + rnd.nextInt(10)).mkString(" ")))
      val (evalDocs, trainDocs) = docs.partition(_._1 % 5 == 0)
      val got = Decontaminate.report(
          trainDocs.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"), n = 3)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      def shingles(t: String): Set[String] = {
        val toks = t.split(" ").toSeq
        if (toks.size < 3) Set(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val evalSh = evalDocs.flatMap(d => shingles(d._2)).toSet
      val expected = trainDocs.flatMap { case (id, t) =>
        val sh = shingles(t)
        val hits = sh.count(evalSh)
        if (hits == 0) None else Some(id -> ((sh.size, hits.toLong)))
      }.toMap
      assert(got === expected, s"seed=$seed contamination mismatch")
    }
  }

  test("transition matrix matches an in-driver groupBy of consecutive pairs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val types = Vector("a", "b", "c")
      val ev = (0 until 300).map(i =>
        (i.toLong, (1 + rnd.nextInt(20)).toLong, rnd.nextInt(50).toLong,
          types(rnd.nextInt(3))))
      val got = Transitions.matrix(ev.toDF("event_id", "user_id", "ts", "event_type"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._3, e._1)).map(_._4).sliding(2).collect {
          case Seq(a, b) => (a, b)
        }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got === expected, s"seed=$seed transition mismatch")
    }
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pii
import graft.operators.{Chunk, Decontaminate, Dedup, GroupSample, Split, Transitions}

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

  // in-driver mirror of Dedup.hash60: first 15 md5 hex chars as a long
  private def hash60(s: String): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md5.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("token budget matches an in-driver greedy selection and nests across budgets") {
    import spark.implicits._
    val budgets = Map("g0" -> 200L)
    val dflt = 150L
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 120).map(i =>
        (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(50).toLong))
      val df = docs.toDF("doc_id", "source", "n_tokens").repartition(4)
      // greedy keeper in global (hash key, id) order — the semantics the
      // bucketed two-phase form must reproduce exactly
      def expected(bud: Map[String, Long], d: Long): Set[Long] =
        docs.groupBy(_._2).flatMap { case (g, ds) =>
          val b = bud.getOrElse(g, d)
          var cum = 0L
          ds.sortBy(x => (hash60(s"tb|${x._1}"), x._1)).flatMap {
            case (id, _, t) =>
              val keep = cum < b
              cum += t
              if (keep) Some(id) else None
          }
        }.toSet
      val got = Split.tokenBudget(df, "doc_id", "n_tokens", "source",
          budgets, dflt, buckets = 8)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(got === expected(budgets, dflt), s"seed=$seed token budget mismatch")
      // a doubled budget's selection is a superset (same hash order)
      val got2 = Split.tokenBudget(df, "doc_id", "n_tokens", "source",
          budgets.map { case (k, v) => k -> v * 2 }, dflt * 2, buckets = 8)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(got.subsetOf(got2), s"seed=$seed budgets not nested")
    }
  }

  test("chunking emits exact overlapping windows that stitch back to the doc") {
    import spark.implicits._
    val size = 12; val ov = 5; val stride = size - ov
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 50).map(i =>
        (i.toLong, words(rnd, 1 + rnd.nextInt(100)).mkString(" ")))
      val got = Chunk.chunkDocs(docs.toDF("doc_id", "text").repartition(3),
          chunkTokens = size, overlap = ov)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3))))
        .toMap
      docs.foreach { case (id, text) =>
        val t = text.split(" ")
        val n = (t.length - 1) / stride + 1
        assert(got.count(_._1._1 == id) === n, s"seed=$seed doc=$id chunk count")
        (0 until n).foreach { j =>
          val exp = t.slice(j * stride, j * stride + size)
          val (ct, nt) = got((id, j))
          assert(ct === exp.mkString(" ") && nt === exp.length,
            s"seed=$seed doc=$id chunk=$j")
        }
        // chunk 0 plus each later chunk minus its overlap re-forms the doc
        val stitched = (0 until n).flatMap { j =>
          val c = t.slice(j * stride, j * stride + size)
          if (j == 0) c else c.drop(ov)
        }
        assert(stitched === t.toSeq, s"seed=$seed doc=$id stitch")
      }
    }
  }

  test("mixture resample matches an in-driver reimplementation of rates and draws") {
    import spark.implicits._
    val shares = Map("a" -> 500000L, "b" -> 300000L, "c" -> 200000L)
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val doms = Vector("a", "b", "c", "unlisted")
      val rows = (0 until 2500).map(i => (i.toLong, doms(rnd.nextInt(4))))
      val got = Split.mixtureResample(rows.toDF("doc_id", "domain"),
          "doc_id", "domain", shares)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // exact rational argmin of n/s (tie-break on the name), then the
      // exact cross-multiplied keep test — mirrors the operator's
      // decimal(38,0) arithmetic with BigInt
      val (_, nB, sB) = shares.toSeq
        .map { case (d, s) => (d, BigInt(counts(d)), BigInt(s)) }
        .reduceLeft { (a, b) =>
          val cmp = a._2 * b._3 - b._2 * a._3 // sign of n_a/s_a - n_b/s_b
          if (cmp < 0 || (cmp == 0 && a._1 < b._1)) a else b
        }
      val expected = rows.collect {
        case (id, d) if shares.contains(d) &&
          BigInt(hash60(s"mix|$d|$id") % 1000000L) * sB * counts(d) <
            BigInt(1000000L) * shares(d) * nB => id
      }.toSet
      assert(got === expected, s"seed=$seed mixture draw mismatch")
    }
  }

  test("group sample matches an in-driver min-k-by-hash selection") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val rows = (0 until 600).map(i => (i.toLong, s"g${rnd.nextInt(5)}"))
      val got = GroupSample.sampleKPerGroup(rows.toDF("doc_id", "grp"),
          "grp", "doc_id", k = 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (g, ids) =>
        ids.map(_._1).sortBy(id => (hash60(s"gsmp|$id"), id)).take(7)
          .zipWithIndex.map { case (id, i) => (g, id, i + 1) }
      }.toSet
      assert(got === expected, s"seed=$seed group sample mismatch")
    }
  }

  test("incremental dedup matches an in-driver hash-set difference") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      // small vocab + short docs → plenty of genuine content collisions
      val mk = () => words(rnd, 1 + rnd.nextInt(3)).mkString(" ")
      val corpus = (0 until 120).map(i => (i.toLong, mk()))
      val incoming = (1000 until 1160).map(i => (i.toLong, mk()))
      val got = Dedup.incrementalNew(
          incoming.toDF("doc_id", "text").repartition(3),
          corpus.toDF("doc_id", "text").repartition(2))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val corpusTexts = corpus.map(_._2).toSet
      val expected = incoming.groupBy(_._2).collect {
        case (t, ids) if !corpusTexts(t) => ids.map(_._1).min
      }.toSet
      assert(got === expected, s"seed=$seed incremental dedup mismatch")
    }
  }

  test("span dedup matches an in-driver first-occurrence reimplementation") {
    import spark.implicits._
    val w = 4
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      // short docs over a tiny vocab → plenty of genuine span collisions
      val docs = (0 until 80).map(i => (i.toLong, words(rnd, 1 + rnd.nextInt(20)).mkString(" ")))
      val got = Dedup.spanDedup(docs.toDF("doc_id", "text").repartition(3), spanWords = w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val spans = docs.flatMap { case (id, text) =>
        text.split(" ").grouped(w).zipWithIndex.map {
          case (ws, gi) => (id, gi, ws.mkString(" "))
        }
      }
      val winners = spans.groupBy(_._3).map {
        case (t, occ) => t -> occ.map(x => (x._1, x._2)).min
      }
      val expected = spans
        .filter { case (id, gi, t) => winners(t) == ((id, gi)) }
        .groupBy(_._1).map { case (id, ss) =>
          id -> ((ss.size.toLong, ss.sortBy(_._2).map(_._3).mkString(" ")))
        }
      assert(got === expected, s"seed=$seed span dedup mismatch")
    }
  }

  test("incremental near-dup never drops a doc without a genuine near-dup") {
    import spark.implicits._
    def shingles(text: String): Set[String] = {
      val toks = "[a-zA-Z0-9']+".r.findAllIn(text.toLowerCase).toVector
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 0.0
      else (a & b).size.toDouble / (a | b).size.toDouble
    val t = 0.5
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val mk = () => words(rnd, 4 + rnd.nextInt(8)).mkString(" ")
      val corpus = (0 until 40).map(i => (i.toLong, mk()))
      val fresh = (1000 until 1030).map(i => (i.toLong, mk()))
      // exact copies of corpus and batch docs guarantee some true dups
      val incoming = fresh ++
        corpus.take(5).map { case (id, tx) => (id + 2000, tx) } ++
        fresh.take(5).map { case (id, tx) => (id + 3000, tx) }
      val kept = Dedup.incrementalNearDupNew(
          incoming.toDF("doc_id", "text").repartition(3),
          corpus.toDF("doc_id", "text").repartition(2), threshold = t)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val dropped = incoming.map(_._1).toSet -- kept
      val sh = (incoming ++ corpus).map { case (id, tx) => id -> shingles(tx) }.toMap
      val corpusIds = corpus.map(_._1)
      def hasRealDup(id: Long): Boolean = {
        val mine = sh(id)
        incoming.exists { case (oid, _) => oid < id && jac(sh(oid), mine) >= t } ||
          corpusIds.exists(cid => jac(sh(cid), mine) >= t)
      }
      // soundness: the exact-jaccard verify means every drop is justified
      dropped.foreach(id => assert(hasRealDup(id), s"seed=$seed false drop of $id"))
      // exact copies (jaccard 1.0 shares every band) are always caught
      assert(incoming.filter(_._1 >= 2000).map(_._1).forall(dropped),
        s"seed=$seed an exact copy survived")
    }
  }

  test("vocab encode matches an in-driver cf-ranked encoding") {
    import spark.implicits._
    import graft.operators.Vocab
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 60).map(i => (i.toLong, words(rnd, 1 + rnd.nextInt(12)).mkString(" ")))
      val k = 4
      val df = docs.toDF("doc_id", "text").repartition(3)
      val got = Vocab.encode(df, Vocab.assignIds(Vocab.topTerms(df, k = k)))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val cf = docs.flatMap(_._2.split(" ")).groupBy(identity).map { case (w, o) => w -> o.size }
      val ids = cf.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
        .zipWithIndex.map { case ((w, _), i) => w -> i }.toMap
      val expected = docs.map { case (id, text) =>
        val toks = text.split(" ").toSeq
        val enc = toks.map(w => ids.getOrElse(w, -1))
        id -> ((toks.size.toLong, enc.count(_ == -1).toLong, enc.mkString(" ")))
      }.toMap
      assert(got === expected, s"seed=$seed vocab encode mismatch")
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

  test("interval overlap equals the naive cross filter on random intervals, any width") {
    import spark.implicits._
    import graft.operators.RangeJoin
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      def ivs(n: Int, idBase: Long) = (0 until n).map { i =>
        val s = rnd.nextInt(400).toLong
        (idBase + i, s, s + rnd.nextInt(60).toLong) // may be empty (len 0)
      }
      val ls = ivs(40, 0L); val rs = ivs(30, 1000L)
      val lDf = ls.toDF("l_id", "ls", "le").repartition(3)
      val rDf = rs.toDF("r_id", "rs", "re").repartition(2)
      val naive = (for {
        (li, lsv, lev) <- ls; (ri, rsv, rev) <- rs
        if lev > lsv && rev > rsv && lsv < rev && rsv < lev
      } yield (li, ri)).toSet
      for (width <- Seq(1L, 7L, 64L, 1000L)) {
        val got = RangeJoin.intervalOverlap(lDf, "ls", "le", rDf, "rs", "re", width)
          .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got.size === got.toSet.size, s"seed=$seed width=$width duplicates")
        assert(got.toSet === naive, s"seed=$seed width=$width")
      }
    }
  }

  test("changelog apply equals a driver-side replay on random logs") {
    import spark.implicits._
    import graft.operators.Incremental
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val log = (0 until 300).map { i =>
        (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong,
          rnd.nextInt(5) == 0, rnd.nextDouble())
      }
      val df = log.toDF("k", "ts", "id", "del", "v").repartition(4)
      val got = Incremental.applyChangelog(df, Seq("k"), Seq("ts", "id"), "del", Seq("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val expected = log.groupBy(_._1).flatMap { case (k, rows) =>
        val last = rows.maxBy(r => (r._2, r._3))
        if (last._4) None else Some(k -> ((last._2, last._3, last._5)))
      }.toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("pagerank mass stays bounded and partition-invariant on random graphs") {
    import spark.implicits._
    import graft.operators.Graph
    for (seed <- 1 to 2) {
      val rnd = new Random(seed)
      val edges = (0 until 60).map(_ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong, 1L + rnd.nextInt(9).toLong))
        .distinct
      val df = edges.toDF("src", "dst", "w")
      def run(parts: Int) = Graph.pageRankPpm(df.repartition(parts), iters = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val r1 = run(1)
      assert(r1.values.sum <= 1000000L, s"seed=$seed mass ${r1.values.sum}")
      assert(r1.values.forall(_ >= 0L), s"seed=$seed negative rank")
      assert(run(5) === r1, s"seed=$seed partition variance")
    }
  }
}

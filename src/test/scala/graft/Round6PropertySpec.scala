package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Anomaly, Dedup, Graph, Incremental, Profile, Similarity}

/** Randomized-correctness properties for the round-6 operators, checked
  * against independent in-driver reimplementations on seeded random
  * inputs — failures are reproducible from the printed seed.
  */
class Round6PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round6-prop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  private def randomDocs(rnd: Random): Seq[(Long, String)] = {
    val vocab = (0 until 30).map(i => s"w$i")
    val base = (1L to 15L).map { id =>
      val len = 5 + rnd.nextInt(30)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // guaranteed near-dups: truncated copies of the first three docs
    val copies = base.take(3).map { case (id, t) =>
      (id + 100L) -> t.substring(0, math.max(1, t.length - 12))
    }
    base ++ copies
  }

  test("prefix filter join is lossless vs the full inverted index on random corpora") {
    import spark.implicits._
    for (seed <- 1 to 3; tau <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val docs = randomDocs(new Random(seed)).toDF("doc_id", "text")
      val pf = Dedup.prefixFilterJaccardPairs(docs, n = 3, threshold = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = Dedup.ngramJaccardPairs(docs, n = 3, threshold = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pf === full, s"seed=$seed tau=$tau")
    }
  }

  test("kCore at a fixpoint equals the driver peel; cores are nested in k") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 14
      val edges = (0 until 35).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      def peel(k: Int): Map[Long, Long] = {
        var e = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
        var changed = true
        while (changed) {
          val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
            .groupBy(identity).map { case (x, v) => x -> v.size }
          val keep = deg.filter(_._2 >= k).keySet
          val e2 = e.filter(p => keep(p._1) && keep(p._2))
          changed = e2 != e
          e = e2
        }
        e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (x, v) => x -> v.size.toLong }
      }
      val df = edges.toDF("src", "dst")
      for (k <- 2 to 4) {
        val got = Graph.kCore(df, k = k, rounds = n).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === peel(k), s"seed=$seed k=$k")
      }
      val c2 = Graph.kCore(df, k = 2, rounds = n).collect().map(_.getLong(0)).toSet
      val c3 = Graph.kCore(df, k = 3, rounds = n).collect().map(_.getLong(0)).toSet
      assert(c3.subsetOf(c2), s"seed=$seed: 3-core must nest inside 2-core")
    }
  }

  test("RA link prediction equals the driver wedge scan on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 12
      val edges = (0 until 30).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val und = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
      val nbrs = und.toSeq.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val expected = (for {
        x <- nbrs.keySet; y <- nbrs.keySet
        if x < y && !und((x, y))
        common = nbrs(x).intersect(nbrs(y))
        if common.nonEmpty
      } yield (x, y) -> ((common.size.toLong,
        common.toSeq.map(z => 1000000L / nbrs(z).size).sum))).toMap
      val got = Graph.resourceAllocationLinks(edges.toDF("src", "dst"), minCommon = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("gini equals the driver formula, is scale-invariant, and respects bounds") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val weights = (1L to 37L).map(i => i -> (rnd.nextInt(100).toLong))
      val total = weights.map(_._2).sum
      if (total > 0) {
        val xs = weights.map(_._2).sorted
        val n = xs.size
        val sx = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
        val expected = ((2 * sx - BigInt(n + 1) * total) * 1000000 /
          (BigInt(n) * total)).toLong
        val df = weights.toDF("k", "x")
        val g = Profile.giniConcentration(df, "k", "x").collect().head.getLong(2)
        assert(g === expected, s"seed=$seed")
        assert(g >= 0 && g <= (n - 1).toLong * 1000000 / n, s"seed=$seed bounds")
        // positive scaling cancels exactly in the rational
        val g7 = Profile.giniConcentration(
          weights.map { case (k, x) => k -> x * 7 }.toDF("k", "x"), "k", "x")
          .collect().head.getLong(2)
        assert(g7 === g, s"seed=$seed scale invariance")
      }
    }
  }

  test("ewma equals the driver recurrence on random gapped series") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val days = (0 until 20).filter(_ => rnd.nextBoolean())
      if (days.nonEmpty) {
        val series = days.map(d => (java.sql.Date.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(d)), rnd.nextInt(1000).toLong))
        // dense driver recurrence over [min, max]
        val byDay = series.map { case (d, v) => d.toLocalDate.toEpochDay -> v }.toMap
        val lo = byDay.keys.min
        val hi = byDay.keys.max
        var s = 0L
        var first = true
        val expected = (lo to hi).map { dn =>
          val v = byDay.getOrElse(dn, 0L)
          val (ewma, dev, ppm) =
            if (first) { first = false; s = v; (v, 0L, Some(0L)) }
            else {
              val prev = s
              val d2 = v - prev
              val p =
                if (d2 == 0) Some(0L)
                else if (prev > 0)
                  Some({ val m = (BigInt(d2.abs) * 1000000 / prev).toLong
                         if (d2 > 0) m else -m })
                else None
              s = (3 * prev + v) / 4
              (s, d2, p)
            }
          dn -> ((v, ewma, dev, ppm.map(l => l: Any).getOrElse(null)))
        }.toMap
        val got = Anomaly.ewmaDaily(series.toDF("d", "v"), "d", "v").collect()
          .map(r => r.getDate(0).toLocalDate.toEpochDay ->
            ((r.getLong(1), r.getLong(2), r.getLong(3),
              if (r.isNullAt(4)) null else r.getLong(4))))
          .toMap
        assert(got === expected, s"seed=$seed")
      }
    }
  }

  test("mmr at lambda=100 is pure relevance; picks are a prefix-closed candidate subset") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      def vec() = Seq.fill(4)(rnd.nextFloat() * 2f - 1f)
      val corpus = (1L to 8L).map(i => (i, vec())).toDF("vec_id", "embedding")
      val queries = Seq((100L, vec())).toDF("vec_id", "embedding")
      val cand = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 6)
        .collect().sortBy(_.getInt(3)).map(_.getLong(1))
      val rel = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
          m = 6, k = 4, lambdaPct = 100)
        .collect().sortBy(_.getInt(2)).map(_.getLong(1))
      assert(rel.toSeq === cand.take(4).toSeq, s"seed=$seed pure relevance")
      val div = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
          m = 6, k = 4, lambdaPct = 60)
        .collect().map(_.getLong(1)).toSet
      assert(div.subsetOf(cand.toSet) && div.size === 4, s"seed=$seed subset")
    }
  }

  test("scd2 intervals chain per key, one open version, attrs change at boundaries") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val log = (1L to 30L).map { id =>
        (1L + rnd.nextInt(4), id,
          java.sql.Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(25)}%02d 00:00:00"),
          (10L + rnd.nextInt(3) * 10))
      }.toDF("user_id", "event_id", "ts", "cents")
      val rows = Incremental
        .scd2Intervals(log, "user_id", "ts", "event_id", Seq("cents"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4)))
      rows.groupBy(_._1).foreach { case (u, vs) =>
        // tie-break equal valid_from (two versions at one timestamp) by
        // valid_to so the zero-length interval sorts first
        val sorted = vs.sortBy(r =>
          (r._3.getTime, r._4.map(_.getTime).getOrElse(Long.MaxValue)))
        assert(sorted.count(_._4.isEmpty) === 1, s"seed=$seed user=$u one open")
        assert(sorted.last._4.isEmpty && sorted.last._5, s"seed=$seed user=$u last open")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4.contains(b._3), s"seed=$seed user=$u intervals must chain")
            assert(a._2 !== b._2, s"seed=$seed user=$u attrs must change at boundaries")
          case _ =>
        }
      }
      assert(rows.nonEmpty)
    }
  }

  test("two-hop reach and harmonic centrality equal the driver BFS on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 12
      val edges = (0 until 26).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keySet
      def hops(src: Long): Map[Long, Int] = { // driver BFS
        var dist = Map(src -> 0)
        var frontier = Set(src)
        var d = 0
        while (frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
          dist ++= frontier.map(_ -> d)
        }
        dist
      }
      val df = edges.toDF("src", "dst")
      val reach = Graph.twoHopReach(df).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val harm = Graph.harmonicCentrality(df, rounds = n).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      nodes.foreach { u =>
        val h = hops(u)
        assert(reach(u) === h.count { case (v, d) => v != u && d <= 2 }.toLong,
          s"seed=$seed node=$u reach")
        assert(harm(u) === h.collect { case (v, d) if v != u => 1000000L / d }.sum,
          s"seed=$seed node=$u harmonic")
      }
    }
  }

  test("token entropy equals the driver quantized computation on random docs") {
    import spark.implicits._
    val tokRe = "[a-zA-Z0-9']+".r
    for (seed <- 1 to 3) {
      val docs = randomDocs(new Random(seed))
      val r = graft.operators.Vocab.tokenEntropy(docs.toDF("doc_id", "text"))
        .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
      docs.foreach { case (id, text) =>
        val toks = tokRe.findAllIn(text.toLowerCase).toSeq
        if (toks.nonEmpty) {
          val nTok = toks.size.toLong
          def r6(v: Double) =
            BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val s = toks.groupBy(identity).values.map { g =>
            val tf = g.size.toLong
            tf * math.round(r6(math.log(nTok.toDouble / tf)) * 1e6)
          }.sum
          assert(r(id) === s / nTok, s"seed=$seed doc=$id")
        }
      }
    }
  }

  test("time-weighted value equals the driver fold; repartition invariant") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val rows = (1L to 60L).map { i =>
        (i, (rnd.nextInt(5) + 1).toLong,
          1700000000000000L + rnd.nextInt(100000) * 1000000L,
          (rnd.nextInt(500) + 1) / 100.0)
      }
      val df = rows.toDF("event_id", "user_id", "us", "value")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val got = graft.operators.Sessions.timeWeightedValue(df).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) null else x.getLong(3)))).toMap
      val exp = rows.groupBy(_._2).flatMap { case (u, ev) =>
        val sorted = ev.sortBy(e => (e._3, e._1))
        val ivs = sorted.sliding(2).collect { case Seq(a, b) =>
          (b._3 - a._3, math.round(a._4 * 100)) }.toSeq
        if (ivs.isEmpty) None
        else {
          val td = ivs.map(_._1).sum
          val cd = ivs.map(i => BigInt(i._2) * i._1).sum
          Some(u -> ((ivs.size.toLong, td, if (td == 0) null else (cd / td).toLong)))
        }
      }
      assert(got === exp, s"seed=$seed")
      val rep = graft.operators.Sessions.timeWeightedValue(df.repartition(7)).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) null else x.getLong(3)))).toMap
      assert(rep === got, s"seed=$seed repartition")
    }
  }

  test("coverage/uplift/recency invariants hold on random inputs") {
    import spark.implicits._
    for (seed <- 1 to 2) {
      val rnd = new Random(seed)
      // dup coverage: exact copies are fully covered; repartition invariant
      val base = randomDocs(rnd)
      val withDup = base ++ base.take(4).map { case (id, t) => (id + 200L, t) }
      val cov = Dedup.dupShingleCoverage(withDup.toDF("doc_id", "text"), n = 3)
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
        .toMap
      withDup.foreach { case (id, _) =>
        val (ns, nd, ppm) = cov(id)
        assert(nd <= ns && ppm >= 0 && ppm <= 1000000L, s"seed=$seed doc=$id bounds")
      }
      base.take(4).foreach { case (id, _) =>
        assert(cov(id)._3 === 1000000L && cov(id + 200L)._3 === 1000000L,
          s"seed=$seed exact copy fully covered")
      }
      val cov7 = Dedup.dupShingleCoverage(
        withDup.toDF("doc_id", "text").repartition(7), n = 3)
        .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
      assert(cov7 === cov.map { case (k, v) => k -> v._3 }, s"seed=$seed repartition")
      // uplift deciles: populations and positives add up per decile
      val users = (1L to 80L).map(i =>
        (i, rnd.nextInt(50).toLong, rnd.nextInt(2).toLong,
          if (rnd.nextBoolean()) "treatment" else "control"))
        .toDF("id", "s", "lb", "variant")
      val ud = graft.operators.Experiment
        .upliftDeciles(users, "s", "lb", "variant", "id", deciles = 4).collect()
      assert(ud.map(r => r.getLong(1) + r.getLong(2)).sum === 80L, s"seed=$seed pop")
      assert(ud.map(_.getLong(1)).sum > 0 && ud.map(_.getLong(2)).sum > 0)
      // recency sampling: a longer half-life keeps a superset
      val ev = (1L to 100L).map(i => (i, f"2024-01-${1 + rnd.nextInt(28)}%02d"))
        .toDF("event_id", "ds")
        .withColumn("ts", col("ds").cast("timestamp")).drop("ds")
      val asOf = lit("2024-01-30").cast("date")
      val keep3 = graft.operators.Split.recencySample(ev, "event_id", "ts", asOf, 3)
        .collect().map(_.getLong(0)).toSet
      val keep14 = graft.operators.Split.recencySample(ev, "event_id", "ts", asOf, 14)
        .collect().map(_.getLong(0)).toSet
      assert(keep3.subsetOf(keep14), s"seed=$seed half-life monotone")
    }
  }
}

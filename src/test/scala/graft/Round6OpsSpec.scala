package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Anomaly, Dedup, Graph, Profile, Sessions, Split}

/** Behavior specs for the round-6 additions: Markov transitions,
  * temporal embargo split, degree assortativity, and the cap-exposure
  * audit.
  */
class Round6OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round6-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  // ── Sessions.markovTransitions ─────────────────────────────────────

  test("markov transitions: counts, margins, ppm floor, tie order, cross-user isolation") {
    import spark.implicits._
    // user 1: a->b->a->c (transitions a->b, b->a, a->c)
    // user 2: b->b (one self-transition); first events produce no pair
    // two equal timestamps on user 1 tie-break by event_id (3 before 4)
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "a"),
      (2L, 1L, "2024-01-01 00:01:00", "b"),
      (3L, 1L, "2024-01-01 00:02:00", "a"),
      (4L, 1L, "2024-01-01 00:02:00", "c"),
      (5L, 2L, "2024-01-01 00:00:00", "b"),
      (6L, 2L, "2024-01-01 00:05:00", "b"))
      .toDF("event_id", "user_id", "s", "event_type")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = Sessions.markovTransitions(ev).collect()
      .map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r === Map(
      ("a", "b") -> ((1L, 2L, 500000L)),
      ("a", "c") -> ((1L, 2L, 500000L)),
      ("b", "a") -> ((1L, 2L, 500000L)),
      ("b", "b") -> ((1L, 2L, 500000L))))
    // partition invariance: integer state, any layout
    val r1 = Sessions.markovTransitions(ev.repartition(7)).collect()
      .map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r1 === r)
  }

  // ── Split.temporalSplit ────────────────────────────────────────────

  test("temporal split: boundaries half-open, embargo rows dropped") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-12 23:59:59"), // train (strictly before trainEnd)
      (2L, "2024-01-13 00:00:00"), // embargo (at trainEnd)
      (3L, "2024-01-14 23:59:59"), // embargo
      (4L, "2024-01-15 00:00:00"), // valid (at validStart)
      (5L, "2024-01-20 12:00:00")) // valid
      .toDF("event_id", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = Split.temporalSplit(rows, "ts",
      lit("2024-01-13 00:00:00").cast("timestamp"),
      lit("2024-01-15 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("split")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r === Map(1L -> "train", 4L -> "valid", 5L -> "valid"))
  }

  // ── Graph.degreeAssortativity ──────────────────────────────────────

  test("assortativity: star is -1, regular graph is NULL, messy edges dedup") {
    import spark.implicits._
    // star K1,3: every edge joins deg-3 hub to deg-1 leaf -> r = -1
    // edges given messy: duplicate, reversed, self-loop
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 3L))
      .toDF("src", "dst")
    val rs = Graph.degreeAssortativity(star).collect().head
    assert(rs.getLong(0) === 6L) // 3 undirected edges x 2 orientations
    assert(rs.getDouble(1) === -1.0)
    // triangle: 2-regular, zero degree variance -> NULL (not a crash)
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rt = Graph.degreeAssortativity(tri).collect().head
    assert(rt.getLong(0) === 6L && rt.isNullAt(1))
  }

  // ── Dedup.capExposureReport ────────────────────────────────────────

  test("cap exposure: identical docs form one hot band bucket; big caps report zero") {
    import spark.implicits._
    // 6 identical docs: every band bucket holds all 6 members
    val docs = (1L to 6L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val hot = Dedup.capExposureReport(docs, bucketCap = 4, dfCap = 100).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // 8 bands, each one bucket of 6 members > cap 4 -> all dropped
    assert(hot("lsh_band") === ((8L, 8L, 48L, 6L)))
    // each shingle appears in all 6 docs, under dfCap 100 -> no drops
    assert(hot("shingle_df")._2 === 0L && hot("shingle_df")._4 === 6L)
    // generous caps: zero exposure, counters all zero
    val cold = Dedup.capExposureReport(docs, bucketCap = 100, dfCap = 100).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(cold("lsh_band") === ((0L, 0L)) && cold("shingle_df") === ((0L, 0L)))
  }

  // ── Profile.tableChecksum ──────────────────────────────────────────

  test("table checksum: order/partition invariant, any single cell change moves it") {
    import graft.operators.Profile
    import spark.implicits._
    val t = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    def cks(df: org.apache.spark.sql.DataFrame) =
      Profile.tableChecksum(df, Seq("id", "s")).collect().head
    val base = cks(t)
    assert(base.getLong(0) === 3L)
    assert(cks(t.repartition(7)).getLong(1) === base.getLong(1), "partition invariant")
    assert(cks(t.orderBy(col("s").desc)).getLong(1) === base.getLong(1), "order invariant")
    val changed = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s")
    assert(cks(changed).getLong(1) !== base.getLong(1), "cell change detected")
  }

  // ── Graph.labelPropagation ─────────────────────────────────────────

  test("label propagation: disjoint triangles converge to min labels; weights break ties") {
    import spark.implicits._
    // two disjoint triangles: each converges to its min node id by iter 3
    val twoTri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("src", "dst").withColumn("w", lit(1L))
    val r = Graph.labelPropagation(twoTri, iters = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // weighted argmax: center 0 with leaves 1 (w=5), 2, 3 — one round
    // adopts the HEAVIEST neighbor label, not the smallest
    val star = Seq((0L, 1L, 5L), (0L, 2L, 1L), (0L, 3L, 1L))
      .toDF("src", "dst", "w")
    val r1 = Graph.labelPropagation(star, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1(0L) === 1L, "heaviest edge wins")
    assert(r1(1L) === 0L && r1(2L) === 0L && r1(3L) === 0L)
    // determinism under repartitioning
    val r7 = Graph.labelPropagation(twoTri.repartition(7), iters = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r7 === r)
  }

  // ── Anomaly.cusumDaily ─────────────────────────────────────────────

  test("cusum: hand-computed recurrence, gap day counts as zero, alarm past h") {
    import spark.implicits._
    // days 1,2,4,5 (Jan 3 is a calendar gap -> 0): values 10,10,30,30
    // sum=80 over 5 axis days -> mu=16, k=16 div 20=0, h=16
    // s: max(0,10-16)=0; 0; gap: 0; max(0,30-16)=14; max(0,14+30-16)=28>16
    val daily = Seq(("2024-01-01", 10L), ("2024-01-02", 10L),
      ("2024-01-04", 30L), ("2024-01-05", 30L))
      .toDF("d", "v").withColumn("day", col("d").cast("date")).drop("d")
    val r = Anomaly.cusumDaily(daily, "day", "v").collect()
      .map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r.size === 5, "dense calendar axis")
    assert(r("2024-01-01") === ((10L, 0L, false)))
    assert(r("2024-01-03") === ((0L, 0L, false)), "gap day is zero")
    assert(r("2024-01-04") === ((30L, 14L, false)))
    assert(r("2024-01-05") === ((30L, 28L, true)), "alarm above h")
    // partition invariance: the recurrence folds one sorted bounded array
    val r7 = Anomaly.cusumDaily(daily.repartition(7), "day", "v").collect()
      .map(x => x.getDate(0).toString -> x.getLong(2)).toMap
    assert(r7 === r.map { case (k, v) => k -> v._2 })
  }

  // ── Split.temperatureMixture ───────────────────────────────────────

  test("temperature mixture: uniform is identity, 4:1 skew flattens to ~2:1, binding kept whole") {
    import spark.implicits._
    val skew = ((1 to 400).map(i => (i.toLong, "A")) ++
      (1001 to 1100).map(i => (i.toLong, "B"))).toDF("doc_id", "dom")
    val kept = Split.temperatureMixture(skew, "doc_id", "dom")
      .groupBy(col("dom")).count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // shares: q_A=2e7, q_B=1e7 -> 666666/333333 ppm; B binds (kept whole),
    // A thins to ~ n_B * s_A/s_B = ~200 (md5 sampling noise around the cut)
    assert(kept("B") === 100L, "binding domain survives whole")
    assert(kept("A") > 150L && kept("A") < 250L, s"A flattened to ~200, got ${kept("A")}")
    // uniform domains: temperature is an exact no-op
    val unif = ((1 to 50).map(i => (i.toLong, "X")) ++
      (51 to 100).map(i => (i.toLong, "Y"))).toDF("doc_id", "dom")
    assert(Split.temperatureMixture(unif, "doc_id", "dom").count() === 100L)
  }

  // ── Dedup.shingleNovelty ───────────────────────────────────────────

  test("novelty: duplicated docs score 0, unique doc scores 1e6") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact copy: df 2 everywhere
      (3L, "zeta eta theta iota kappa")) // fully unique
      .toDF("doc_id", "text")
    val r = Dedup.shingleNovelty(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === ((3L, 0L, 0L)) && r(2L) === ((3L, 0L, 0L)))
    assert(r(3L) === ((3L, 3L, 1000000L)))
  }

  test("embedding cap exposure: identical vectors fill every band bucket; audit matches banding") {
    import spark.implicits._
    // 6 identical vectors land in the same bucket of EVERY band
    val v = (1 to 64).map(_.toFloat / 64f)
    val emb = (1L to 6L).map(i => (i, v)).toDF("vec_id", "embedding")
    val (bands, planes) = Dedup.bandingForTargetMiss(0.95, 1e-3)
    assert((bands, planes) === ((35, 16))) // the grid d5/d21 audit
    val r = Dedup.embeddingCapExposureReport(emb, bucketCap = 4).collect().head
    assert(r.getString(0) === "emb_lsh_band")
    assert(r.getLong(2) === bands.toLong, "one bucket per band")
    assert(r.getLong(3) === bands.toLong && r.getLong(4) === 6L * bands,
      "every band bucket is hot at cap 4")
    assert(r.getLong(5) === 6L)
  }

  // ── Dedup.idfCosinePairs ───────────────────────────────────────────

  test("idf cosine: exact dup 1.0, common-shingle pair below rare-shingle pair") {
    import spark.implicits._
    // docs 1/2: exact dup. 3 shares one shingle with 1 ("a b c d e"),
    // which is COMMON (df 3); 4 shares one with 1 ("b c d e f"), which
    // is rarer (df 2) — idf must rank (1,4) above (1,3).
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"), // exact dup of 1
      (3L, "a b c d e x"),
      (5L, "a b c d e y"), // makes "a b c d e" df 4 vs "b c d e f" df 3
      (4L, "b c d e f z"))
      .toDF("doc_id", "text")
    val all = Dedup.idfCosinePairs(docs, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(all((1L, 2L)) === 1.0)
    assert(all((1L, 4L)) > all((1L, 3L)),
      "the rarer shared shingle must outscore the common one")
    // near-dup threshold keeps only the exact dup
    val strict = Dedup.idfCosinePairs(docs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((1L, 2L)))
    // partition invariance: integer dots and norms
    val p7 = Dedup.idfCosinePairs(docs.repartition(7), threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p7 === all)
  }

  // ── Incremental.scd2Intervals ──────────────────────────────────────

  test("scd2: no-change rows collapse, intervals chain, last version open") {
    import spark.implicits._
    // user 1: price 10 -> 10 (collapsed) -> 20 -> 10; user 2: single version
    val log = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 10L),
      (1L, 2L, "2024-01-02 00:00:00", 10L), // same attr: not history
      (1L, 3L, "2024-01-03 00:00:00", 20L),
      (1L, 4L, "2024-01-04 00:00:00", 10L), // back to 10: IS history
      (2L, 5L, "2024-01-01 00:00:00", 7L))
      .toDF("user_id", "event_id", "s", "cents")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = graft.operators.Incremental
      .scd2Intervals(log, "user_id", "ts", "event_id", Seq("cents"))
      .collect()
      .map(x => (x.getLong(0), x.getTimestamp(2).toString) ->
        ((x.getLong(1), Option(x.getTimestamp(3)).map(_.toString).orNull,
          x.getBoolean(4))))
      .toMap
    assert(r === Map(
      (1L, "2024-01-01 00:00:00.0") -> ((10L, "2024-01-03 00:00:00.0", false)),
      (1L, "2024-01-03 00:00:00.0") -> ((20L, "2024-01-04 00:00:00.0", false)),
      (1L, "2024-01-04 00:00:00.0") -> ((10L, null, true)),
      (2L, "2024-01-01 00:00:00.0") -> ((7L, null, true))))
    // partition invariance
    val r7 = graft.operators.Incremental
      .scd2Intervals(log.repartition(7), "user_id", "ts", "event_id", Seq("cents"))
      .collect().length
    assert(r7 === 4)
  }

  // ── Anomaly.ewmaDaily ──────────────────────────────────────────────

  test("ewma: hand-computed trajectory, gap day decays, zero-baseline NULL ppm") {
    import spark.implicits._
    val daily = Seq(("2024-01-01", 8L), ("2024-01-03", 4L), ("2024-01-04", 16L))
      .toDF("d", "v").withColumn("d", col("d").cast("date"))
    val r = Anomaly.ewmaDaily(daily, "d", "v").collect()
      .map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), x.getLong(3),
          if (x.isNullAt(4)) null else x.getLong(4)))).toMap
    // s1=8; gap day v=0: dev -8 (-1e6 ppm), s=(24+0)/4=6; d3: v=4 dev -2
    // ppm -(2e6//6)=-333333, s=(18+4)/4=5; d4: v=16 dev 11 ppm 2.2e6, s=7
    assert(r === Map(
      "2024-01-01" -> ((8L, 8L, 0L, 0L)),
      "2024-01-02" -> ((0L, 6L, -8L, -1000000L)),
      "2024-01-03" -> ((4L, 5L, -2L, -333333L)),
      "2024-01-04" -> ((16L, 7L, 11L, 2200000L))))
    // zero baseline with nonzero volume has no relative form -> NULL
    val z = Seq(("2024-01-01", 0L), ("2024-01-02", 0L), ("2024-01-03", 5L))
      .toDF("d", "v").withColumn("d", col("d").cast("date"))
    val zr = Anomaly.ewmaDaily(z, "d", "v").collect()
      .map(x => x.getDate(0).toString -> x.isNullAt(4)).toMap
    assert(zr === Map("2024-01-01" -> false, "2024-01-02" -> false,
      "2024-01-03" -> true))
    // partition invariance: the fold runs over one sorted collected axis
    val r7 = Anomaly.ewmaDaily(daily.repartition(7), "d", "v").collect()
      .map(x => x.getDate(0).toString -> x.getLong(2)).toMap
    assert(r7 === r.map { case (k, v) => k -> v._2 })
  }

  // ── Profile.giniConcentration ──────────────────────────────────────

  test("gini: even weights 0, one-key concentration (n-1)/n, zero sum NULL") {
    import spark.implicits._
    val even = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("k", "x")
    val g0 = Profile.giniConcentration(even, "k", "x").collect().head
    assert((g0.getLong(0), g0.getLong(1), g0.getLong(2)) === ((4L, 20L, 0L)))
    val conc = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 10L)).toDF("k", "x")
    val g1 = Profile.giniConcentration(conc, "k", "x").collect().head
    assert(g1.getLong(2) === 750000L, "(n-1)/n for full concentration")
    val zero = Seq(("a", 0L), ("b", 0L)).toDF("k", "x")
    assert(Profile.giniConcentration(zero, "k", "x").collect().head.isNullAt(2))
    // partition invariance: exact integer state
    val g7 = Profile.giniConcentration(conc.repartition(7), "k", "x").collect().head
    assert(g7.getLong(2) === 750000L)
  }

  // ── Profile.benfordAudit ───────────────────────────────────────────

  test("benford: digit from integer-part head, <1 excluded, expected sums to 1e6") {
    import spark.implicits._
    assert(Profile.benfordExpectedPpm.map(_._2).sum === 1000000L)
    val vals = Seq(1.5, 19.0, 2.0, 0.5).toDF("v") // 0.5 excluded
    val r = Profile.benfordAudit(vals, "v").collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getLong(4)))).toMap
    assert(r.size === 9, "all nine digits present")
    assert(r(1) === ((2L, 666666L, 666666L - 301030L)))
    assert(r(2) === ((1L, 333333L, 333333L - 176091L)))
    assert(r(9) === ((0L, 0L, -45757L)))
  }

  // ── Experiment.srmReport ───────────────────────────────────────────

  test("srm: chi2 matches the driver formula on the hash assignment; counts add up") {
    import spark.implicits._
    val ev = (1L to 400L).map(u => (u, u)).toDF("event_id", "user_id")
    val r = graft.operators.Experiment.srmReport(ev).collect().head
    val (n, ot) = (r.getLong(0), r.getLong(1))
    assert(n === 400L && ot + r.getLong(2) === n)
    val d = BigInt(100) * ot - BigInt(n) * 50
    val expected = (d * d * 1000000 / (BigInt(n) * 50 * 50)).toLong
    assert(r.getLong(3) === expected)
    assert(r.getBoolean(4) === (expected > 3841459L))
    // non-circular calibration: a hash split of 400 users is near-50/50
    // (binomial sd ≈ 10), so the true chi-square is O(1) — chi2_micro
    // must sit in the ~1e6 ballpark and the guardrail must NOT fire.
    // Under the former 100x-inflated formula this assertion fails for
    // any |ot - 200| > 1, so it pins the scale, not just self-parity.
    assert(r.getLong(3) < 3841459L, s"healthy split flagged: chi2_micro=${r.getLong(3)}")
    assert(!r.getBoolean(4), "srm must be false on a healthy hash split")
    // a wildly imbalanced observed split must flag (simulate by feeding
    // users known to land in one variant: filter on the operator's own
    // hash so the fixture can't drift from the assignment rule)
    val treatedOnly = ev.where(
      graft.operators.Experiment.variant("exp1", col("user_id"), 50) === "treatment")
    val r2 = graft.operators.Experiment.srmReport(treatedOnly).collect().head
    assert(r2.getLong(2) === 0L && r2.getBoolean(4), "all-treatment must flag SRM")
  }

  // ── Profile.decileLift ─────────────────────────────────────────────

  test("decile lift: equal buckets, top-decile rate, monotone cumulative capture") {
    import spark.implicits._
    // scores 1..20, positives = scores 16..20 (5 of 20)
    val df = (1L to 20L).map(i => (i, i, if (i > 15) 1L else 0L)).toDF("id", "s", "lb")
    val r = Profile.decileLift(df, "s", "lb", "id").collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r.size === 10 && r.values.forall(_._1 == 2L), "equal population")
    assert(r(1) === ((2L, 2L, 1000000L, 400000L)), "top decile all positive")
    assert(r(2) === ((2L, 2L, 1000000L, 800000L)))
    assert(r(3) === ((2L, 1L, 500000L, 1000000L)), "capture saturates at decile 3")
    (4 to 10).foreach(d => assert(r(d)._2 === 0L && r(d)._4 === 1000000L))
  }

  // ── Snapshot.ksDrift ───────────────────────────────────────────────

  test("ks drift: identical 0, disjoint 1e6, hand-computed half overlap") {
    import spark.implicits._
    import graft.operators.Snapshot
    def ks(r: Seq[Long], c: Seq[Long]): Long =
      Snapshot.ksDrift(r.toDF("v"), c.toDF("v"), "v").collect().head.getLong(2)
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === 0L)
    assert(ks(Seq(1L, 2L), Seq(10L, 11L)) === 1000000L, "fully separated CDFs")
    // ref {1,2} vs cur {2,3}: max gap at v=1 (or 2) is 1/2
    assert(ks(Seq(1L, 2L), Seq(2L, 3L)) === 500000L)
    // partition invariance: pure integer state
    val big = (1L to 500L).map(i => i % 97)
    val shifted = big.map(_ + 13)
    val d1 = ks(big, shifted)
    val d7 = Snapshot.ksDrift(big.toDF("v").repartition(7),
      shifted.toDF("v").repartition(5), "v").collect().head.getLong(2)
    assert(d1 === d7)
  }

  // ── Profile.aucExact ───────────────────────────────────────────────

  test("auc: separation 1.0, reversal 0, all-tied 0.5, mixed 0.75, empty class NULL") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long, Long)]): Option[Long] = {
      val r = Profile.aucExact(rows.toDF("id", "s", "lb"), "s", "lb", "id")
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    assert(auc(Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 1L), (4L, 4L, 1L)))
      === Some(1000000L))
    assert(auc(Seq((1L, 4L, 0L), (2L, 3L, 0L), (3L, 2L, 1L), (4L, 1L, 1L)))
      === Some(0L))
    assert(auc(Seq((1L, 5L, 0L), (2L, 5L, 0L), (3L, 5L, 1L), (4L, 5L, 1L)))
      === Some(500000L), "all ties = coin flip")
    // interleaved: positive pairs beat 3 of 4 negative pairings
    assert(auc(Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 3L, 0L), (4L, 4L, 1L)))
      === Some(750000L))
    assert(auc(Seq((1L, 1L, 1L), (2L, 2L, 1L))) === None, "no negatives")
    // partition invariance: bucketed rank + integer sums
    val big = (1L to 200L).map(i => (i, i % 37, i % 3 min 1))
    val a1 = Profile.aucExact(big.toDF("id", "s", "lb"), "s", "lb", "id")
      .collect().head.getLong(2)
    val a7 = Profile.aucExact(big.toDF("id", "s", "lb").repartition(7),
      "s", "lb", "id").collect().head.getLong(2)
    assert(a1 === a7)
  }

  // ── Experiment.cupedReport ─────────────────────────────────────────

  test("cuped: zero pre-variance degrades to raw means; y==x collapses to the global mean") {
    import spark.implicits._
    def ev(u: Long, day: Int, v: Double) =
      (u * 100 + day, u, f"2024-01-$day%02d 00:00:00", "purchase", v)
    // case A: constant pre-covariate -> theta 0, adjustment is a no-op
    val a = (1L to 20L).flatMap(u => Seq(ev(u, 2, 5.0), ev(u, 10, u.toDouble)))
      .toDF("event_id", "user_id", "s", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val cut = col("ts") < lit("2024-01-08").cast("timestamp")
    val cents = when(col("event_type") === "purchase",
      round(col("value") * 100).cast("long")).otherwise(lit(0L))
    val ra = graft.operators.Experiment.cupedReport(a, cents, cut).collect()
    assert(ra.nonEmpty)
    ra.foreach { r =>
      assert(r.getDouble(4) === 0.0, "theta 0 under zero pre-variance")
      assert(r.getDouble(3) === r.getDouble(2), "adjusted == raw")
      assert(r.getDouble(5) === 0.0, "no variance reduction")
    }
    // case B: y == x exactly -> rho2 100%, every variant's adjusted
    // mean collapses to the GLOBAL mean (the covariate explains all
    // between-variant imbalance)
    val b = (1L to 20L).flatMap(u => Seq(ev(u, 2, u.toDouble), ev(u, 10, u.toDouble)))
      .toDF("event_id", "user_id", "s", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val rb = graft.operators.Experiment.cupedReport(b, cents, cut).collect()
    assert(rb.length === 2, "both variants populated at n=20")
    val globalMean = 100.0 * (1 to 20).sum / 20
    rb.foreach { r =>
      assert(r.getDouble(4) === 1.0, "theta 1 when y == x")
      assert(math.abs(r.getDouble(3) - globalMean) < 1e-6,
        s"adjusted mean must collapse to the global mean, got ${r.getDouble(3)}")
      assert(r.getDouble(5) === 100.0, "full variance reduction")
    }
  }

  // ── Split.exactAllocationSample ────────────────────────────────────

  test("exact allocation: total is exactly k, largest remainder wins the leftovers") {
    import spark.implicits._
    // strata sizes 6/3/1 with k=5: quotas 3.0/1.5/0.5 -> base 3/1/0,
    // one leftover goes to the larger remainder ('b' .5 ties 'c' .5?
    // no: b rem = 5*3 % 10 = 5, c rem = 5*1 % 10 = 5 -> tie breaks to
    // the smaller stratum key, so b gets it)
    val rows = (1L to 6L).map(i => (i, "a")) ++
      (7L to 9L).map(i => (i, "b")) ++ Seq((10L, "c"))
    val df = rows.toDF("id", "s")
    val r = graft.operators.Split.exactAllocationSample(df, "id", "s", k = 5)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.length === 5, "exact total")
    val byStratum = r.groupBy(_._1).map { case (k2, v) => k2 -> v.length }
    assert(byStratum === Map("a" -> 3, "b" -> 2))
    assert(r.filter(_._1 == "a").forall(_._3 == 3L), "alloc column audits n_h")
    // determinism + extension: k=7 keeps every k=5 pick
    val r5 = r.map(x => (x._1, x._2)).toSet
    val r7 = graft.operators.Split.exactAllocationSample(df, "id", "s", k = 7)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSet
    assert(r5.subsetOf(r7), "larger k extends, never re-deals")
  }

  // ── Similarity.hardNegatives ───────────────────────────────────────

  test("hard negatives: same-label rows never appear, ranking is cosine-desc") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 0), // same label as query
      (3L, Seq(0.8f, 0.2f), 1), (4L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((10L, Seq(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity
      .hardNegatives(corpus, q, "vec_id", "embedding", "label", k = 3)
      .collect().sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    // only label-1 rows survive, nearest first: 3 (cos .97) then 4 (0)
    assert(r === Seq(3L, 4L))
  }

  // ── Similarity.mmrRerank ───────────────────────────────────────────

  test("mmr: near-duplicate of the first pick is demoted below a diverse hit") {
    import spark.implicits._
    // query (1,1,0,0); corpus: 1 and 2 identical (1,0,0,0), 3 orthogonal
    // to them (0,1,0,0) — all three at cos .7071 to the query. Pure
    // relevance order is 1,2,3 (id tie-break); MMR must pick 3 second.
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity
      .mmrRerank(corpus, q, "vec_id", "embedding", m = 3, k = 3, lambdaPct = 70)
      .collect().map(x => x.getInt(2) -> x.getLong(1)).toMap
    assert(r === Map(1 -> 1L, 2 -> 3L, 3 -> 2L))
    // lambda = 100 is pure relevance: id order on the cosine tie
    val rel = graft.operators.Similarity
      .mmrRerank(corpus, q, "vec_id", "embedding", m = 3, k = 3, lambdaPct = 100)
      .collect().map(x => x.getInt(2) -> x.getLong(1)).toMap
    assert(rel === Map(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  // ── Multimodal.qaReport ────────────────────────────────────────────

  test("media QA report: per-check pass rates over decoded headers") {
    import spark.implicits._
    // header bytes (w-1, h-1, c) chosen per check:
    //   payload A: 01 40 02 -> w=2,  h=1,  ch=3 (landscape, rgb, tiny)
    //   payload B: 3f 3f 00 -> w=64, h=64, ch=1 (square, gray, large)
    val pad = "00" * 29
    val media = Seq(1L -> ("014002" + pad), 2L -> ("3f3f00" + pad))
      .toDF("media_id", "hex")
      .select(col("media_id"), unhex(col("hex")).as("bytes"))
    val r = graft.operators.Multimodal.qaReport(media).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r === Map(
      "payload_nonempty" -> ((2L, 2L, 1000000L)),
      "bytes_match_meta" -> ((2L, 2L, 1000000L)),
      "rgb_channels" -> ((2L, 1L, 500000L)),
      "landscape" -> ((2L, 2L, 1000000L)),
      "min_resolution" -> ((2L, 1L, 500000L))))
  }

  // ── Dedup.prefixFilterJaccardPairs ─────────────────────────────────

  test("prefix filter join: lossless vs full inverted index at the same threshold") {
    import spark.implicits._
    // near-dup pairs (doc + truncated copy), an unrelated doc, and an
    // exact duplicate — spans jaccard 1.0, mid, and ~0 cases
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with no overlap whatsoever in here"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    for (tau <- Seq(0.3, 0.6, 0.9)) {
      val pf = Dedup.prefixFilterJaccardPairs(docs, n = 5, threshold = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = Dedup.ngramJaccardPairs(docs, n = 5, threshold = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pf === full, s"prefix filter diverged from ground truth at tau=$tau")
    }
    // exact duplicates survive any threshold, including tau = 1.0
    val dup = Dedup.prefixFilterJaccardPairs(docs, n = 5, threshold = 1.0).collect()
    assert(dup.length === 1 &&
      (dup.head.getLong(0), dup.head.getLong(1), dup.head.getDouble(2)) === ((1L, 4L, 1.0)))
    // partition invariance
    val p7 = Dedup.prefixFilterJaccardPairs(docs.repartition(7), n = 5, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val p1 = Dedup.prefixFilterJaccardPairs(docs, n = 5, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(p7 === p1)
  }

  // ── Graph.kCore ────────────────────────────────────────────────────

  test("kCore: peel cascades down a tail; converged core is the triangle") {
    import spark.implicits._
    // triangle {1,2,3} with a path tail 3-4-5: k=2 peels 5 (deg 1) in
    // round 1, which drops 4 to deg 1 and peels it in round 2 — the
    // cascade a single round cannot see
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val core = Graph.kCore(g, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round is a well-defined partial peel: only 5 gone, 4 hangs on
    val partial = Graph.kCore(g, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    // no 3-core in a triangle (max degree 2)
    assert(Graph.kCore(g, k = 3, rounds = 3).count() === 0L)
    // partition invariance: exact integer state, any layout
    val core7 = Graph.kCore(g.repartition(7), k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core7 === core)
  }

  // ── Graph.resourceAllocationLinks ──────────────────────────────────

  test("RA links: square diagonals score 1e6; adjacency and hubs excluded") {
    import spark.implicits._
    // 4-cycle: the two diagonals each share both degree-2 corners
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = Graph.resourceAllocationLinks(sq, minCommon = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r === Map((1L, 3L) -> ((2L, 1000000L)), (2L, 4L) -> ((2L, 1000000L))))
    // path 1-2-3: one shared neighbor of degree 2 -> 500000 micro
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.resourceAllocationLinks(path, minCommon = 1).collect()
    assert(p.length === 1 &&
      (p.head.getLong(0), p.head.getLong(1), p.head.getLong(3)) === ((1L, 3L, 500000L)))
    // adjacent pairs never appear: a triangle predicts nothing
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.resourceAllocationLinks(tri, minCommon = 1).count() === 0L)
    // degCap drops hub centers: star center deg 3 > cap 2 -> no wedges
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    assert(Graph.resourceAllocationLinks(star, minCommon = 1, degCap = 2).count() === 0L)
    assert(Graph.resourceAllocationLinks(star, minCommon = 1).count() === 3L)
  }

  // ── Experiment.upliftDeciles ───────────────────────────────────────

  test("uplift deciles: per-decile arm rates, qini cumulative, empty-arm NULLs") {
    import spark.implicits._
    // 8 users, 2 deciles. Top half (score 10): treat {u1:1, u2:0},
    // ctrl {u3:0, u4:0}. Bottom half (score 1): treat {u5:0, u6:1},
    // ctrl {u7:1, u8:0}.
    val users = Seq(
      (1L, 10L, 1L, "treatment"), (2L, 10L, 0L, "treatment"),
      (3L, 10L, 0L, "control"), (4L, 10L, 0L, "control"),
      (5L, 1L, 0L, "treatment"), (6L, 1L, 1L, "treatment"),
      (7L, 1L, 1L, "control"), (8L, 1L, 0L, "control"))
      .toDF("id", "s", "lb", "variant")
    val r = graft.operators.Experiment
      .upliftDeciles(users, "s", "lb", "variant", "id", deciles = 2)
      .collect()
      .map(x => x.getInt(0) -> x).toMap
    assert(r.size === 2)
    // decile 1 = top scores: uplift 50% - 0%, qini = 1 incremental conv
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3), r(1).getLong(4))
      === ((2L, 2L, 1L, 0L)))
    assert((r(1).getLong(5), r(1).getLong(6), r(1).getLong(7), r(1).getLong(8))
      === ((500000L, 0L, 500000L, 1000000L)))
    // decile 2: arms tie (1/2 each), uplift 0; cumulative qini
    // 2e6 - 1*4e6//4 = 1e6 (the curve flattens)
    assert((r(2).getLong(5), r(2).getLong(6), r(2).getLong(7), r(2).getLong(8))
      === ((500000L, 500000L, 0L, 1000000L)))
    // all-treatment input: control-side rates and qini are NULL
    val t = graft.operators.Experiment
      .upliftDeciles(users.where(col("variant") === "treatment"),
        "s", "lb", "variant", "id", deciles = 1)
      .collect().head
    assert(t.getLong(2) === 0L && t.isNullAt(6) && t.isNullAt(7) && t.isNullAt(8))
  }

  // ── Dedup.dupShingleCoverage ───────────────────────────────────────

  test("dup ngram coverage: exact dup 1e6, unique 0, shared prefix partial") {
    import spark.implicits._
    // n=3 word shingles: a has 4, the first two shared with d (df 2),
    // the last two unique; c shares nothing.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"), // a
      (2L, "x1 x2 x3 x4"), // c: fully unique
      (3L, "w1 w2 w3 w4")) // d: strict prefix of a
      .toDF("doc_id", "text")
    val r = Dedup.dupShingleCoverage(docs, n = 3, minDf = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === ((4L, 2L, 500000L)), "half of a's shingles are shared")
    assert(r(2L) === ((2L, 0L, 0L)), "unique doc has zero duplicated mass")
    assert(r(3L) === ((2L, 2L, 1000000L)), "a prefix copy is fully covered")
    // exact duplicate pair: both sides fully covered
    val dup = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val d2 = Dedup.dupShingleCoverage(dup, n = 3, minDf = 2).collect()
    assert(d2.forall(_.getLong(3) === 1000000L))
  }

  // ── Rfm.spendTrend ─────────────────────────────────────────────────

  test("spend trend: rising and declining slopes exact, single-day users dropped") {
    import spark.implicits._
    val ev = Seq(
      // user 1: +100 c/day exactly
      (1L, "2024-01-01", 1.00), (1L, "2024-01-02", 2.00), (1L, "2024-01-03", 3.00),
      // user 2: -100 c/day (negative path must truncate toward zero too)
      (2L, "2024-01-01", 3.00), (2L, "2024-01-02", 2.00), (2L, "2024-01-03", 1.00),
      // user 3: non-exact slope 9/6 c/day -> 1500000 micro
      (3L, "2024-01-01", 1.00), (3L, "2024-01-02", 1.01), (3L, "2024-01-03", 1.03),
      // user 4: both purchases on one day -> zero x-variance, dropped
      (4L, "2024-01-05", 1.00), (4L, "2024-01-05", 9.00))
      .toDF("user_id", "ds", "value")
      .withColumn("ts", col("ds").cast("timestamp")).drop("ds")
      .withColumn("event_type", lit("purchase"))
    val r = graft.operators.Rfm.spendTrend(ev, "2024-01-01").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r === Map(
      1L -> ((3L, 100000000L)),
      2L -> ((3L, -100000000L)),
      3L -> ((3L, 1500000L))))
  }

  // ── Lifecycle.churnLabels ──────────────────────────────────────────

  test("churn labels: next-week presence, boundary week never labeled") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-02"), (1L, "2024-01-03"), (1L, "2024-01-09"), // wk0 x2, wk1
      (2L, "2024-01-16"), (2L, "2024-01-23"), // wk2, wk3
      (3L, "2024-01-23")) // wk3 only: boundary, never labeled
      .toDF("user_id", "ds")
      .withColumn("ts", col("ds").cast("timestamp")).drop("ds")
    val r = graft.operators.Lifecycle.churnLabels(ev, "2024-01-01", maxWeek = 3)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r === Map(
      (1L, 0L) -> ((2L, 0L)), // active wk1 -> retained
      (1L, 1L) -> ((1L, 1L)), // absent wk2 -> churned
      (2L, 2L) -> ((1L, 0L))), // active wk3 -> retained; wk3 itself unlabeled
      "only weeks with an observable successor get labels")
  }

  // ── Vocab.sourceKl ─────────────────────────────────────────────────

  test("source KL: identical distributions 0, skew positive and asymmetric, nulls excluded") {
    import spark.implicits._
    val same = Seq((1L, "A", "x y"), (2L, "B", "x y")).toDF("doc_id", "source", "text")
    val r0 = graft.operators.Vocab.sourceKl(same).collect()
      .map(x => (x.getString(0), x.getString(1)) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r0 === Map(("A", "B") -> ((2L, 0L)), ("B", "A") -> ((2L, 0L))))
    // A = "x x x", B = "y": expected from the operator's own expression
    // order replayed driver-side (smoothed over V=2)
    val skew = Seq((1L, "A", "x x x"), (2L, "B", "y"), (3L, null.asInstanceOf[String], "z z"))
      .toDF("doc_id", "source", "text")
    def contrib(ca: Long, na: Long, cb: Long, nb: Long, v: Long): Long =
      math.round((ca + 1.0) / (na + v.toDouble) *
        math.log(((ca + 1.0) * (nb + v.toDouble)) / ((cb + 1.0) * (na + v.toDouble))) * 1e6)
    val expAB = contrib(3, 3, 0, 1, 2) + contrib(0, 3, 1, 1, 2)
    val expBA = contrib(0, 1, 3, 3, 2) + contrib(1, 1, 0, 3, 2)
    val r1 = graft.operators.Vocab.sourceKl(skew).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(3)).toMap
    assert(r1 === Map(("A", "B") -> expAB, ("B", "A") -> expBA),
      "null-source docs excluded; both directions reported")
    assert(expAB > 0 && expBA > 0 && expAB != expBA, "KL is positive and asymmetric")
  }

  // ── Sessions.timeWeightedValue ─────────────────────────────────────

  test("time-weighted value: durations weight cents, open tail dropped, zero-span NULL") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 100c held 10s, 300c held 30s -> twa 250c; last event open
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (2L, 1L, "2024-01-01 00:00:10", 3.0),
      (3L, 1L, "2024-01-01 00:00:40", 2.0),
      // user 2: single event, no closed interval -> no row
      (4L, 2L, "2024-01-01 00:00:00", 9.0),
      // user 3: two simultaneous events -> zero total duration -> NULL
      (5L, 3L, "2024-01-01 00:00:00", 1.0),
      (6L, 3L, "2024-01-01 00:00:00", 2.0))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = Sessions.timeWeightedValue(ev).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) null else x.getLong(3)))).toMap
    assert(r.keySet === Set(1L, 3L))
    assert(r(1L) === ((2L, 40000000L, 250L)))
    assert(r(3L) === ((1L, 0L, null)))
  }

  // ── QualityRules encoding counters ─────────────────────────────────

  test("encoding report: control/replacement/non-ascii counts, layout chars exempt") {
    import spark.implicits._
    import graft.functions.QualityRules
    val docs = Seq(
      (1L, "abc"), // clean ascii
      (2L, "a\u0001b\uFFFDc"), // one C0 control, one replacement char
      (3L, "中文ab"), // two CJK chars
      (4L, "a\tb\nc\rd")) // tab/newline/CR are layout, not corruption
      .toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        QualityRules.controlCharCount(col("text")).as("c"),
        QualityRules.replacementCharCount(col("text")).as("rp"),
        QualityRules.nonAsciiCount(col("text")).as("na"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(1L) === ((0L, 0L, 0L)))
    assert(r(2L) === ((1L, 1L, 1L)), "U+FFFD is both replacement and non-ascii")
    assert(r(3L) === ((0L, 0L, 2L)))
    assert(r(4L) === ((0L, 0L, 0L)), "tab/newline/CR exempt from the control count")
  }

  // ── Split.recencySample ────────────────────────────────────────────

  test("recency sample: age-0 always kept, half-life keeps the sub-500k hashes, future clamps") {
    import spark.implicits._
    val asOf = lit("2024-01-30").cast("date")
    def ev(ds: String) = (1L to 50L).map(i => (i, ds)).toDF("event_id", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    // age 0: keep_ppm = 1e6, every row survives
    val a0 = Split.recencySample(ev("2024-01-30 12:00:00"), "event_id", "ts", asOf, 7)
    assert(a0.count() === 50L)
    assert(a0.select("keep_ppm").distinct().collect().map(_.getLong(0)).toSeq === Seq(1000000L))
    // age = half-life: keep_ppm = 500000, kept iff the operator's own
    // hash coin lands under it (recomputed driver-side, no drift)
    val ah = Split.recencySample(ev("2024-01-23 12:00:00"), "event_id", "ts", asOf, 7)
      .collect().map(_.getLong(0)).toSet
    val expected = (1L to 50L)
      .filter(i => graft.operators.Similarity.hexHash60(s"rec|$i") % 1000000L < 500000L)
      .toSet
    assert(ah === expected && ah.nonEmpty && ah.size < 50)
    // future timestamps clamp to age 0 (always-keep-eligible)
    val f = Split.recencySample(ev("2024-02-15 00:00:00"), "event_id", "ts", asOf, 7)
    assert(f.count() === 50L &&
      f.select("age_days").distinct().collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  // ── Survival.retentionDecayFit ─────────────────────────────────────

  test("retention decay: exact power-law cohort fits slope -1 with r2 1") {
    import spark.implicits._
    // cohort day 0: users 1-4; day 1 all 4, day 2 two, day 4 one —
    // r_k = 1e6/k exactly; non-cohort user 9 must not count
    val rows = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-01"), (4L, "2024-01-01"),
      (1L, "2024-01-02"), (2L, "2024-01-02"), (3L, "2024-01-02"), (4L, "2024-01-02"),
      (1L, "2024-01-03"), (2L, "2024-01-03"),
      (1L, "2024-01-05"),
      (9L, "2024-01-02"))
      .toDF("user_id", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = graft.operators.Survival
      .retentionDecayFit(rows, "2024-01-01", horizon = 28).collect().head
    assert(r.getLong(0) === 3L)
    // expected from the operator's own quantization replayed driver-side
    val xs = Seq(1L, 2L, 4L).map(k => BigInt(math.round(math.log(k.toDouble) * 1e6)))
    val ys = Seq(1000000L, 500000L, 250000L)
      .map(v => BigInt(math.round(math.log(v.toDouble) * 1e6)))
    val n = BigInt(3)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slope = r6((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
    val r2e = r6(math.pow((n * sxy - sx * sy).toDouble, 2) /
      ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
    assert(r.getDouble(1) === slope && math.abs(slope + 1.0) < 1e-5)
    assert(r.getDouble(2) === r2e && r2e > 0.999999)
  }

  // ── Similarity.rangeSearch ─────────────────────────────────────────

  test("range search: threshold keeps exactly the qualifying vectors, self excluded") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.8, 0.6)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") === 1L)
    val r = graft.operators.Similarity
      .rangeSearch(corpus, queries, "vec_id", "embedding", threshold = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq === Seq((1L, 2L, 0.8)), "only the cos-0.8 vector qualifies")
    // radius widens monotonically; the exact-match self row never appears
    val all = graft.operators.Similarity
      .rangeSearch(corpus, queries, "vec_id", "embedding", threshold = -1.1)
      .collect().map(_.getLong(1)).toSet
    assert(all === Set(2L, 3L, 4L))
    assert(graft.operators.Similarity
      .rangeSearch(corpus, queries, "vec_id", "embedding", threshold = 0.99)
      .count() === 0L)
  }

  // ── Graph.twoHopReach ──────────────────────────────────────────────

  test("two-hop reach: path counts, star, hub cap lower-bounds leaves only") {
    import spark.implicits._
    // path 1-2-3-4: ends reach 2, middles reach 3
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.twoHopReach(path).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r === Map(1L -> ((1L, 2L)), 2L -> ((2L, 3L)),
      3L -> ((2L, 3L)), 4L -> ((1L, 2L))))
    // star: every node reaches all 3 others through the center
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    val s1 = Graph.twoHopReach(star).collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(s1 === Map(10L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // capping the center (deg 3 > cap 2) drops leaf 2-hop reach to the
    // documented lower bound (direct only); the center's own row is exact
    val s2 = Graph.twoHopReach(star, degCap = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(s2 === Map(10L -> 3L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
    // triangle: reach equals degree (nothing new at hop 2)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.twoHopReach(tri).collect().forall(x => x.getLong(2) === 2L))
  }

  // ── Graph.modularity ───────────────────────────────────────────────

  test("modularity: two clean triangles 0.5, one blob 0, split edge -0.5") {
    import spark.implicits._
    val twoTri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("src", "dst").withColumn("w", lit(1L))
    def lab(m: (Long, Long)*) = m.toSeq.toDF("node", "label")
    val good = Graph.modularity(twoTri,
      lab(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
      .collect().head
    assert((good.getLong(0), good.getLong(1), good.getLong(2)) === ((2L, 6L, 500000L)))
    // everything in one community scores exactly 0
    val blob = Graph.modularity(twoTri,
      lab(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))
      .collect().head
    assert(blob.getLong(2) === 0L)
    // cutting a single edge in two scores -0.5 (sign-split division)
    val split = Graph.modularity(Seq((1L, 2L)).toDF("src", "dst")
      .withColumn("w", lit(1L)), lab(1L -> 1L, 2L -> 2L)).collect().head
    assert(split.getLong(2) === -500000L)
  }

  // ── Graph.harmonicCentrality ───────────────────────────────────────

  test("harmonic centrality: path reciprocals, disconnection, radius truncation") {
    import spark.implicits._
    // path 1-2-3-4: H(end) = 1 + 1/2 + 1/3, H(mid) = 1 + 1 + 1/2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.harmonicCentrality(path).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r === Map(1L -> ((3L, 1833333L)), 2L -> ((3L, 2500000L)),
      3L -> ((3L, 2500000L)), 4L -> ((3L, 1833333L))))
    // disconnected pairs: unreachable nodes contribute 0, not infinity
    val two = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val d = Graph.harmonicCentrality(two).collect()
    assert(d.length === 4 &&
      d.forall(x => x.getLong(1) === 1L && x.getLong(2) === 1000000L))
    // rounds=1 truncates the radius: ends see only their neighbor
    val t = Graph.harmonicCentrality(path, rounds = 1).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(t(1L) === ((1L, 1000000L)) && t(2L) === ((2L, 2000000L)))
  }

  // ── Vocab.tokenEntropy ─────────────────────────────────────────────

  test("token entropy: repeated 0, uniform lnN, skew hand-computed micro-nats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"), // degenerate: H = 0
      (2L, "a b c d"), // uniform: H = ln 4
      (3L, "a a b b"), // uniform over 2: H = ln 2
      (4L, "a a a b")) // skew: 0.75*ln(4/3) + 0.25*ln4
      .toDF("doc_id", "text")
    val r = graft.operators.Vocab.tokenEntropy(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === ((4L, 1L, 0L)))
    assert(r(2L) === ((4L, 4L, 1386294L)))
    assert(r(3L) === ((4L, 2L, 693147L)))
    assert(r(4L) === ((4L, 2L, 562335L)))
  }
}

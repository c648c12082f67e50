package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Paths, Sessions, Vocab}

/** Behavior specs for the round-8 additions: the behaviorTwins
  * broadcast-side contract (every broadcast batch stays ≤ MaxQueryUsers;
  * an oversized query set is auto-batched and unioned, exactly — never
  * silently broadcast whole), hand-computed BM25 retrieval scoring,
  * and hand-computed DSIR importance log-weights.
  */
class Round8OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round8-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("behaviorTwins auto-batches an oversized query-user set, exactly") {
    import spark.implicits._
    // four users sharing journey trigrams so every batch has real
    // query-side rows; users 1 and 2 are twins, 3 overlaps partially
    val evs = Seq(
      (1L, Seq("a", "b", "c", "d")), (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("a", "b", "c", "x")), (4L, Seq("b", "c", "d", "e")))
    val events = evs.flatMap { case (u, seq) =>
      seq.zipWithIndex.map { case (e, i) => (u, e, i.toLong, u * 100 + i) }
    }.toDF("user_id", "event_type", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    // > MaxQueryUsers: the 4 real users plus filler ids with no events
    // (trigram-less users appear on neither side — exactness unchanged)
    val oversized = (1L to (Paths.MaxQueryUsers + 1L)).toSeq
    val auto = Paths.behaviorTwins(events, oversized)
      .orderBy("query_user", "rank").collect().map(_.toSeq)
    // identical rows to the batched-by-hand union over the same split
    val byHand = oversized.grouped(Paths.MaxQueryUsers)
      .map(b => Paths.behaviorTwins(events, b))
      .reduce(_ union _)
      .orderBy("query_user", "rank").collect().map(_.toSeq)
    assert(auto.nonEmpty)
    assert(auto.toSeq === byHand.toSeq)
    // and to the single-batch plan over just the users that exist
    val single = Paths.behaviorTwins(events, Seq(1L, 2L, 3L, 4L))
      .orderBy("query_user", "rank").collect().map(_.toSeq)
    assert(auto.toSeq === single.toSeq)
    // a duplicated query user yields set semantics, not duplicate rows
    val dup = Paths.behaviorTwins(events, Seq(1L, 1L, 2L))
      .select(countDistinct(col("query_user")), count(lit(1))).collect().head
    val clean = Paths.behaviorTwins(events, Seq(1L, 2L)).count()
    assert(dup.getLong(1) === clean)
  }

  test("burstiness: hand-computed B, metronome -1, zero-span null, 1-gap excluded") {
    import spark.implicits._
    // user 1: events at 0,1,2,6 s → gaps [1,1,4] s → B = −0.171573
    // user 2: metronome 0,5,10 → gaps [5,5] → σ=0 → B = −1
    // user 3: all simultaneous → gaps [0,0] → S=0 → NULL (0/0 guard)
    // user 4: two events → one gap → excluded (spread undefined)
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), (1L, 6L),
      (2L, 0L), (2L, 5L), (2L, 10L),
      (3L, 7L), (3L, 7L), (3L, 7L),
      (4L, 0L), (4L, 9L))
      .zipWithIndex.map { case ((u, sec), i) => (u, sec, i.toLong) }
      .toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Sessions.burstiness(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out === Seq(
      (1L, 3L, Some(-0.171573)),
      (2L, 2L, Some(-1.0)),
      (3L, 2L, None)))
  }

  test("winnowing: shared substring >= k+w-1 yields shared fingerprints, local pair found") {
    import spark.implicits._
    // doc 2 is a verbatim ~100-char excerpt of doc 1 (the MOSS guarantee
    // covers any shared run >= k+w-1 = 11 chars — here hundreds of
    // interior grams are identical); doc 3 shares nothing
    val core = "the quick brown fox jumps over the lazy dog while seventeen " +
      "astronauts recalibrate the antenna array"
    val docs = Seq(
      (1L, s"leading unrelated preamble text $core trailing epilogue words"),
      (2L, core),
      (3L, "entirely disjoint content talking about submarine hydraulics and citrus"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guarantee: excerpt shares fingerprints")
    assert((byDoc(2L) & byDoc(3L)).isEmpty, "disjoint docs share nothing")
    val pairs = Dedup.winnowingPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(pairs.length === 1, s"exactly the excerpt pair: ${pairs.mkString(",")}")
    assert(pairs.head._1 === 1L && pairs.head._2 === 2L)
    assert(pairs.head._3 >= 500000L, s"containment-normalized ppm: ${pairs.head._3}")
  }

  test("bm25: hand-computed integer-rational scores, deterministic ranking") {
    import spark.implicits._
    // N=3 docs, S=9 tokens; query {apple, banana}: df(apple)=2 (d1,d3),
    // df(banana)=2 (d1,d2) → idf_micro = round(ln((2·3+2)/(2·2+1))·1e6)
    // = round(ln(1.6)·1e6) = 470004 for both terms.
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry apple"))
      .toDF("doc_id", "text")
    val out = Vocab.bm25TopK(docs, Seq("apple", "banana"), k = 20)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // contribution = idf·22·S·tf div (10·S·tf + 3·S + 9·dl·N):
    //   d1 apple  tf=2 dl=3: 470004·396 div (180+27+81)  = 646255
    //   d1 banana tf=1 dl=3: 470004·198 div (90+27+81)   = 470004
    //   d2 banana tf=1 dl=2: 470004·198 div (90+27+54)   = 544215
    //   d3 apple  tf=1 dl=4: 470004·198 div (90+27+108)  = 413603
    assert(out === Seq(
      (1L, 2L, 1116259L, 1L),
      (2L, 1L, 544215L, 2L),
      (3L, 1L, 413603L, 3L)))
  }

  test("dsir: hand-computed add-one log-ratio micro-nats, negative deltas exact") {
    import spark.implicits._
    // corpus: d1 = "a a b", d2 = "b c"; target = d2.
    // cf_c: a=2 b=2 c=1; cf_t: b=1 c=1; S_c=5 S_t=2 V=3.
    // delta(a) = round(ln(1·8 / (3·5))·1e6)  = −628609
    // delta(b) = round(ln(2·8 / (3·5))·1e6)  =   64539
    // delta(c) = round(ln(2·8 / (2·5))·1e6)  =  470004
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Vocab.dsirLogRatio(docs, docs.where($"doc_id" === 2L))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq(
      (1L, 3L, 2L * -628609L + 64539L),  // a a b
      (2L, 2L, 64539L + 470004L)))       // b c
  }
}

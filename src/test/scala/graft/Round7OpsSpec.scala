package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph, Paths, Sessions, Vocab}

/** Behavior specs for the round-7 fixes: modularity under partial label
  * coverage, sign-split TWAP quantization, the idf-cosine hot-shingle
  * guard (observability + lower-bound), the third cap-audit stage, and
  * the k ∝ N semDedup form.
  */
class Round7OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round7-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  // ── Graph.modularity under partial label coverage ──────────────────

  test("modularity: m restricted to label-covered edges, not the raw graph") {
    import spark.implicits._
    // two triangles, but labels cover ONLY the first one (1,2,3) and
    // split it 1|1|2. Q must be computed over the covered subgraph
    // (m=3): communities {1,2} (w_in=1, deg=4) and {3} (w_in=0, deg=2)
    // → Q = [1/3 − (4/6)²] + [0 − (2/6)²] = −8/36 → −222222 micro.
    // Before the fix m counted the uncovered triangle too (m=6) and
    // silently mis-scaled Q.
    val twoTri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("src", "dst").withColumn("w", lit(1L))
    val partial = Graph.modularity(twoTri,
      Seq(1L -> 1L, 2L -> 1L, 3L -> 2L).toDF("node", "label")).collect().head
    assert(partial.getLong(1) === 3L, "m must cover only labeled edges")
    assert(partial.getLong(2) === -222222L)
    // and it must equal the same partition scored on the covered
    // subgraph alone — coverage restriction IS subgraph scoring
    val oneTri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst").withColumn("w", lit(1L))
    val direct = Graph.modularity(oneTri,
      Seq(1L -> 1L, 2L -> 1L, 3L -> 2L).toDF("node", "label")).collect().head
    assert((partial.getLong(1), partial.getLong(2)) ===
      ((direct.getLong(1), direct.getLong(2))))
  }

  // ── Sessions.timeWeightedValue with negative values ────────────────

  test("time-weighted value: negative totals quantize toward zero (sign-split)") {
    import spark.implicits._
    // user 1: −100c held 1s, 0c held 2s → Σc·dur = −1e8, dur 3e6 →
    // −33.33c: truncation gives −33 on BOTH engines via the sign-split
    // (a floor would give −34 on DuckDB and −33 on Spark — the round-7
    // divergence this pins down).
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", -1.0),
      (2L, 1L, "2024-01-01 00:00:01", 0.0),
      (3L, 1L, "2024-01-01 00:00:03", 5.0))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = Sessions.timeWeightedValue(ev).collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 3000000L)
    assert(r.getLong(3) === -33L, s"sign-split truncation, got ${r.getLong(3)}")
  }

  // ── Dedup.idfCosinePairs hot-shingle guard ─────────────────────────

  test("idf cosine df-cap yields a lower bound and tallies drops (d4 shape)") {
    import spark.implicits._
    // A and B share 3-gram shingles {abg, bgd, gde} + one unique tail
    // each; "alpha beta gamma" also appears whole in 10 filler docs
    // (df = 12). Capping at 10 drops it from the dot while norms keep
    // every shingle → the pair's cosine strictly drops but survives a
    // low threshold: the guard degrades scores, never silently loses
    // the pair's norms.
    val d = (Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon eta")) ++
      (1L to 10L).map(i => (i, "alpha beta gamma"))).toDF("doc_id", "text")
    def pairAB(dfCap: Int): List[Double] =
      Dedup.idfCosinePairs(d, n = 3, threshold = 0.1, dfCap = dfCap)
        .where(col("id_a") === 100L && col("id_b") === 101L)
        .collect().map(_.getDouble(2)).toList
    val full = pairAB(100000)
    val capped = pairAB(10)
    assert(full.size === 1 && capped.size === 1)
    assert(capped.head < full.head, s"capped ${capped.head} !< full ${full.head}")
    assert(capped.head > 0.0)
    // the default cap (16) clears df=12 — exact on this corpus
    assert(pairAB(16) === full)
    // observability: the one hot shingle is counted with its df rows
    val cs = Dedup.CapStats(spark, "test.idfcos")
    Dedup.idfCosinePairs(d, n = 3, threshold = 0.1, dfCap = 10,
      capStats = Some(cs)).count()
    assert(cs.buckets.value === 1L && cs.rows.value === 12L,
      s"stats ${cs.buckets.value}/${cs.rows.value}")
    // zero drops ⇒ zero tally
    val cs0 = Dedup.CapStats(spark, "test.idfcos0")
    Dedup.idfCosinePairs(d, n = 3, threshold = 0.1, dfCap = 16,
      capStats = Some(cs0)).count()
    assert(cs0.buckets.value === 0L && cs0.rows.value === 0L)
  }

  // ── Dedup.capExposureReport idf stage ──────────────────────────────

  test("cap audit reports the idf-cosine 5-gram guard as its own stage") {
    import spark.implicits._
    // 20 clones of a 6-token text → two 5-gram shingles at df=20 (hot
    // at cap 16); one unique doc contributes one df=1 shingle.
    val docs = ((1L to 20L).map(i => (i, "one two three four five six")) :+
      (21L, "seven eight nine ten eleven")).toDF("doc_id", "text")
    val r = Dedup.capExposureReport(docs)
      .where(col("stage") === "idf_shingle_df").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(1) === 16L, "cap column carries the d23 default")
    assert(row.getLong(2) === 3L, s"n_groups ${row.getLong(2)}")
    assert(row.getLong(3) === 2L, s"n_hot_groups ${row.getLong(3)}")
    assert(row.getLong(4) === 40L, s"dropped_rows ${row.getLong(4)}")
    assert(row.getLong(5) === 20L, s"max_group ${row.getLong(5)}")
  }

  // ── Dedup.semDedupByCellSize ───────────────────────────────────────

  test("semDedup by target cell size derives k = ceil(N/cell) and matches fixed-k") {
    import spark.implicits._
    // 10 vectors in two obvious clusters (plus exact near-dups inside
    // each); targetCellSize 5 ⇒ k = 2 — the derived-k path must be
    // byte-identical to the pinned-k oracle form.
    val vs = (0 until 5).map(i =>
      (i.toLong, Seq(1.0f + i * 0.001f, 0.0f, 0.1f, 0.0f))) ++
      (5 until 10).map(i =>
        (i.toLong, Seq(0.0f, 1.0f + i * 0.001f, 0.0f, 0.1f)))
    val emb = vs.toDF("vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val byCell = key(Dedup.semDedupByCellSize(emb, targetCellSize = 5L))
    val fixed = key(Dedup.semDedup(emb, k = 2))
    assert(byCell === fixed)
    // near-dups (cos ≥ 0.95 within a cluster) collapse to the min id:
    // survivors are exactly one keeper per tight cluster
    assert(byCell.map(_._1) === Set(0L, 5L))
  }

  // ── Vocab.heapsFit ─────────────────────────────────────────────────

  test("heaps fit: cumulative token/type points in id order, exact regression") {
    import spark.implicits._
    // doc 1 "a b a" -> (3 tokens, 2 new types); doc 2 "b c" -> (5, 3);
    // doc 3 "a c d d" -> (9, 4): fit over (3,2),(5,3),(9,4) in log-log.
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a c d d"))
      .toDF("doc_id", "text")
    val r = Vocab.heapsFit(docs).collect().head
    assert(r.getLong(0) === 3L)
    // driver replicate of the micro-nat integer regression
    val pts = Seq((3L, 2L), (5L, 3L), (9L, 4L)).map { case (x, y) =>
      (BigInt(math.round(math.log(x.toDouble) * 1e6)),
        BigInt(math.round(math.log(y.toDouble) * 1e6)))
    }
    val n = BigInt(pts.size)
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val num = (n * sxy - sx * sy).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(1) === r6(num / (n * sxx - sx * sx).toDouble))
    assert(r.getDouble(2) === r6(num * num /
      ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)))
    // β for a vocabulary still growing sublinearly sits in (0, 1)
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 1)
  }

  // ── Graph.hitsPpm ──────────────────────────────────────────────────

  test("hits: hub/authority structure on a directed star, exact ppm loop") {
    import spark.implicits._
    // 1 -> {2, 3}, 4 -> 3: node 1 is the best hub (points at both
    // authorities), node 3 the best authority (pointed at by both hubs);
    // nodes 2/3 have no out-edges (hub 0), 1/4 no in-edges (auth 0).
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (4L, 3L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.hitsPpm(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // driver replicate of the exact integer loop
    val e = Seq((1L, 2L, 1L), (1L, 3L, 1L), (4L, 3L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    def ppm(m: Map[Long, BigInt]): Map[Long, BigInt] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> (if (mx == 0) BigInt(0) else v * 1000000 / mx) }
    }
    var h = nodes.map(_ -> BigInt(1000000)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      a = ppm(nodes.map(v =>
        v -> e.filter(_._2 == v).map(x => BigInt(x._3) * h(x._1)).sum).toMap)
      h = ppm(nodes.map(u =>
        u -> e.filter(_._1 == u).map(x => BigInt(x._3) * a(x._2)).sum).toMap)
    }
    val want = nodes.map(v => v -> ((h(v).toLong, a(v).toLong))).toMap
    assert(got === want)
    assert(got(1L)._1 === 1000000L && got(3L)._2 === 1000000L)
    assert(got(4L)._1 > 0 && got(4L)._1 < 1000000L)
    assert(got(2L)._1 === 0L && got(1L)._2 === 0L)
  }

  // ── Paths.behaviorTwins ────────────────────────────────────────────

  test("behavior twins: exact trigram jaccard, deterministic rank, no-overlap excluded") {
    import spark.implicits._
    def evs(u: Long, base: Long, types: String*) = types.zipWithIndex.map {
      case (t, i) => (base + i, u, t,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"))
    }
    // u1 {ABC,BCD}; u2 {ABC,BCD,CDE}; u3 {ABC}; u5 {ABC}; u4 {XYZ,YZW}
    val ev = (evs(1L, 100, "A", "B", "C", "D") ++
      evs(2L, 200, "A", "B", "C", "D", "E") ++
      evs(3L, 300, "A", "B", "C") ++
      evs(5L, 500, "A", "B", "C") ++
      evs(4L, 400, "X", "Y", "Z", "W"))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Paths.behaviorTwins(ev, queryUsers = Seq(1L), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList.sortBy(_._5)
    // u2: |∩|=2, |∪|=3 → 666666; u3/u5: |∩|=1, |∪|=2 → 500000, tie
    // broken by neighbor id; u4 shares nothing → absent entirely
    assert(got === List(
      (1L, 2L, 2L, 666666L, 1L),
      (1L, 3L, 1L, 500000L, 2L),
      (1L, 5L, 1L, 500000L, 3L)))
  }

  // ── driver contract ────────────────────────────────────────────────

  test("SparkEntry.entry: the driver smoke contract returns rows on sf0.001") {
    // the driver calls entry(spark) and checks rows > 0 each round —
    // keep that exact call covered so a registerAll/delegation
    // regression fails here, not in the round artifact
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

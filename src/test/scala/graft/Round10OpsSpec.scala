package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Behavior specs for the round-10 work: the two-level (hierarchical)
  * ANN assignment behind derived-k SemDeDup. Flat Lloyd assignment at
  * k = ⌈N/⟨cell⟩⌉ is N·k = N²/⟨cell⟩ exact dot products — the round-9
  * 100× octave measured it as the one plan that would not ship at
  * scale — so `semDedupByCellSize` now assigns coarse-then-fine in
  * N·O(√k) arithmetic. These specs pin the semantics the swap must
  * preserve: on a corpus whose clusters are unambiguous, the two-level
  * and flat assignments induce the SAME partition of the points (cell
  * labels differ; the grouping does not) and therefore the same
  * SemDeDup survivor set.
  */
class Round10OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round10-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  /** Hand-separable corpus, HIERARCHICALLY: two super-groups (strong
    * unit component on axis 0 or 1), each holding two sub-clusters
    * (0.6 on a dedicated axis), 16 members each. Cosines: ≈ 0.998
    * within a sub-cluster (near-dups), ≈ 0.74 across sub-clusters of
    * one super-group (same coarse cell, NOT near-dups), ≈ 0 across
    * super-groups — so the ideal flat k=4 cells and the ideal
    * 2-coarse × 2-fine cells are the same four sub-clusters. Ids start
    * at 11392: for this range the md5 seeding puts the two coarse seeds
    * in different super-groups and each super-group's two fine seeds
    * in different sub-clusters (and the flat trainer's four seeds
    * recover all four sub-clusters), so both schemes converge to the
    * hand-separable truth rather than an artifact of seed placement.
    * Within-cluster jitter lives on a dedicated far dimension so
    * members are near-dups but not identical — the partition equality
    * below is only meaningful if co-location is doing real work. */
  private val IdBase = 11392L

  private def separable(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = for (i <- 0 until 64) yield {
      val id = IdBase + i
      val c = (id % 4).toInt  // sub-cluster
      val j = i / 4           // within-cluster jitter index
      val v = Array.fill(64)(0.0f)
      v(c / 2) = 1.0f         // super-group axis (0 or 1)
      v(2 + c) = 0.6f         // sub-cluster axis
      v(40 + c) = 0.02f * (j % 5) // ≤ 0.08 ⇒ cos ≥ 0.997 within
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def partitionOf(df: org.apache.spark.sql.DataFrame,
      idCol: String, cellCol: String): Set[Set[Long]] =
    df.select(col(idCol), col(cellCol)).collect()
      .groupBy(_.getLong(1)).values
      .map(_.map(_.getLong(0)).toSet).toSet

  test("two-level and flat assignment agree on a hand-separable corpus") {
    val emb = separable()
    // flat: pinned k=4; two-level: targetCellSize=16 over N=64 derives
    // k=4 ⇒ k1=2 coarse, k2=2 fine — the same 4 cells, found
    // hierarchically
    val flat = Dedup.semDedup(emb, k = 4, iters = 2, threshold = 0.95)
    val two = Dedup.semDedupByCellSize(emb, targetCellSize = 16,
      iters = 2, threshold = 0.95)
    // identical survivor sets (the user-visible contract)
    val fs = flat.select("vec_id").collect().map(_.getLong(0)).toSet
    val ts = two.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ts === fs)
    // the separable corpus has exactly one keeper per sub-cluster: the
    // minimum id of each residue class mod 4
    assert(fs === Set(IdBase, IdBase + 1, IdBase + 2, IdBase + 3))
    // identical partitions up to relabeling: survivors carry their
    // cell, one survivor per cluster, so cells must separate the four
    // clusters in both schemes
    val fp = partitionOf(flat, "vec_id", "cell")
    val tp = partitionOf(two, "vec_id", "cell")
    assert(fp === tp)
    assert(fp === Set(Set(IdBase), Set(IdBase + 1), Set(IdBase + 2),
      Set(IdBase + 3)))
  }

  test("derived k1/k2 arithmetic: k1=ceil(sqrt(k)), k2=ceil(k/k1), k1*k2>=k") {
    // the Scala-side rule the oracle replays in SQL — pinned here so a
    // refactor cannot silently diverge the two engines
    def split(k: Int): (Int, Int) = {
      val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
      (k1, (k + k1 - 1) / k1)
    }
    assert(split(1) === ((1, 1)))
    assert(split(4) === ((2, 2)))
    assert(split(5) === ((3, 2)))
    assert(split(16) === ((4, 4)))
    assert(split(17) === ((5, 4)))
    assert(split(1000000) === ((1000, 1000)))
    for (k <- 1 to 2000) {
      val (k1, k2) = split(k)
      assert(k1.toLong * k2 >= k, s"k=$k k1=$k1 k2=$k2")
      assert(k1 <= math.sqrt(k.toDouble).toInt + 1)
    }
  }

  test("duplicateSubstringSpans excises a 2x-repeated passage, unique text survives") {
    import spark.implicits._
    // a 10-token passage planted in two documents (different contexts)
    val p = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      // P at token positions 4..13
      (1L, s"one two three $p tail1a tail1b tail1c tail1d tail1e tail1f"),
      // P at token positions 6..15
      (2L, s"uno dos tres cuatro cinco $p fin2a fin2b fin2c fin2d fin2e fin2f"),
      // all-unique document: must emit nothing
      (3L, "solo unique words nothing repeated here at all ever once only " +
        "more filler tokens keep this document long enough"),
      // passage repeated WITHIN one document (positions 1..10 and 16..25)
      (4L, "red orange yellow green blue indigo violet ultra infra xray " +
        "mid4a mid4b mid4c mid4d mid4e " +
        "red orange yellow green blue indigo violet ultra infra xray")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSubstringSpans(docs, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    // only grams fully INSIDE the planted passage repeat (boundary grams
    // carry unique context), so the merged span is exactly the passage
    assert(spans === Seq(
      (1L, 4L, 13L),
      (2L, 6L, 15L),
      (4L, 1L, 10L), (4L, 16L, 25L)))
  }

  test("keepFirst leaves exactly one copy of every repeated passage") {
    import spark.implicits._
    val p = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $p tail1a tail1b tail1c tail1d tail1e tail1f"),
      (2L, s"uno dos tres cuatro cinco $p fin2a fin2b fin2c fin2d fin2e fin2f"),
      (4L, "red orange yellow green blue indigo violet ultra infra xray " +
        "mid4a mid4b mid4c mid4d mid4e " +
        "red orange yellow green blue indigo violet ultra infra xray")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSubstringSpans(docs, k = 8, keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    // doc 1 holds the corpus-first occurrence of the planted passage —
    // it survives; doc 2's copy is excised; doc 4's within-doc repeat
    // keeps its first occurrence and loses the second
    assert(spans === Seq((2L, 6L, 15L), (4L, 16L, 25L)))
  }

  test("duplicateSubstringSpans merges overlapping and adjacent marks") {
    import spark.implicits._
    // two copies of a 17-token text: every 8-gram duplicated, marks
    // [1,8],[2,9],...,[10,17] must merge to ONE span [1,17] per doc
    val t = (1 to 17).map(i => s"w$i").mkString(" ")
    val docs = Seq((10L, t), (11L, t)).toDF("doc_id", "text")
    val spans = Dedup.duplicateSubstringSpans(docs, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((10L, 1L, 17L), (11L, 1L, 17L)))
    // short documents (< k tokens) contribute nothing, even identical
    val short = Seq((20L, "tiny doc"), (21L, "tiny doc")).toDF("doc_id", "text")
    assert(Dedup.duplicateSubstringSpans(short, k = 8).count() === 0L)
  }

  // ── perceptual-hash media dedup (m9) ────────────────────────────────

  private def render(fmt: String, w: Int, h: Int)(
      gray: (Int, Int) => Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val imgType = if (fmt == "bmp") BufferedImage.TYPE_3BYTE_BGR
      else BufferedImage.TYPE_INT_RGB
    val img = new BufferedImage(w, h, imgType)
    for (x <- 0 until w; y <- 0 until h) {
      val g = gray(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK lacks $fmt writer")
    bos.toByteArray
  }

  test("perceptual near-dup: PNG/BMP re-encodes pair at Hamming 0, distinct images do not") {
    import spark.implicits._
    def a(x: Int, y: Int) = (57 * x + 43 * y + 7) % 256
    def b(x: Int, y: Int) = (91 * x + 113 * y + 19) % 256 // different signs
    // a retouch of content a: one block region brightened — a few
    // gradient signs flip, the rest of the hash is intact
    def a2(x: Int, y: Int) =
      if (x >= 8 && x < 12 && y >= 6 && y < 8) math.min(a(x, y) + 90, 255)
      else a(x, y)
    val media = Seq(
      (1L, render("png", 18, 16)(a)),
      (2L, render("bmp", 18, 16)(a)),  // same raster, other codec
      (3L, render("png", 18, 16)(b)),  // different image
      (4L, render("png", 18, 16)(a2)), // light retouch of a
      (5L, "not an image at all".getBytes("UTF-8")),
      (6L, null: Array[Byte]),
      (7L, render("png", 5, 4)(a))     // below the 9x8 grid: quarantine
    ).toDF("media_id", "bytes")
    val hs = graft.operators.Multimodal.perceptualHashes(media.repartition(3))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getInt(i)))).toMap
    // re-encodes hash identically; garbage/null/tiny payloads quarantine
    assert(hs(1L) === hs(2L))
    assert(hs(1L).forall(_.isDefined))
    Seq(5L, 6L, 7L).foreach(id => assert(hs(id).forall(_.isEmpty), s"id $id"))
    assert(hs(1L) !== hs(3L))
    val pairs = graft.operators.Multimodal
      .perceptualNearDupPairs(media.repartition(3), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === 0L)
    // the retouch pairs with BOTH encodings of the original, within 3 bits
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) >= 1L)
    assert(pairs.contains((2L, 4L)))
    // the genuinely different image pairs with nothing
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // quarantined rows reach no pair
    assert(!pairs.keys.exists(p => Set(p._1, p._2).exists(Set(5L, 6L, 7L))))
  }

  test("m10 families: twins share a family with the even keeper, singletons self-family") {
    val out = SparkEntry.queries("m10_perceptual_families")(spark,
      TestData.dir("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // the fixture renders each content twice (k, k+1 — PNG and BMP of
    // the same raster), so every even key is a family keeper and its
    // odd twin a member; the last unpaired key (odd fixture count) is
    // its own singleton family
    val byId = out.map(x => x._1 -> ((x._2, x._3))).toMap
    val n = out.length
    (0L until n.toLong).foreach { k =>
      if (k % 2 == 0 && k + 1 < n) assert(byId(k) === ((k, true)), s"k=$k")
      else if (k % 2 == 1) assert(byId(k) === ((k - 1, false)), s"k=$k")
      else assert(byId(k) === ((k, true)), s"singleton k=$k")
    }
    // families partition the fixture: every id appears exactly once
    assert(out.map(_._1).distinct.length === n)
  }

  test("perceptual hash is invariant to raster partitioning and source layout") {
    import spark.implicits._
    def g(x: Int, y: Int) = (71 * x + 37 * y + 3) % 256
    val one = Seq((1L, render("png", 27, 8)(g))).toDF("media_id", "bytes")
    val h1 = graft.operators.Multimodal.perceptualHashes(one.repartition(1))
      .collect().head
    val h2 = graft.operators.Multimodal.perceptualHashes(one.repartition(4))
      .collect().head
    assert((1 to 4).map(h1.getInt) === (1 to 4).map(h2.getInt))
    // bands are 16-bit values
    (1 to 4).foreach(i => assert(h1.getInt(i) >= 0 && h1.getInt(i) <= 0xffff))
  }

  test("two-level survivors are partition-invariant") {
    val emb = separable()
    val a = Dedup.semDedupByCellSize(emb.repartition(1),
        targetCellSize = 16, iters = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Dedup.semDedupByCellSize(emb.repartition(7),
        targetCellSize = 16, iters = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("semDedupIncrementalNew: frozen-index keeper rule, hand-separable") {
    import spark.implicits._
    // accepted corpus: two well-separated clusters on axes 0 and 1
    def vec(axis: Int, jit: Double) = {
      val v = Array.fill(64)(0.0)
      v(axis) = 1.0; v(40 + axis) = jit; v.toSeq
    }
    val corpus = (0 until 8).map { i =>
      (100L + i, vec(i % 2, 0.02 * (i / 2)))
    }.toDF("vec_id", "embedding")
    val incoming = Seq(
      // near-copy of an accepted axis-0 member → dropped vs corpus
      (200L, vec(0, 0.021)),
      // genuinely novel direction (axis 5, lands in SOME cell but far
      // from both center families) → survives
      (201L, vec(5, 0.0)),
      // twin pair within the batch: lower id survives, higher dropped
      (202L, vec(5, 0.001)),
      // far from everything AND from 201/202's axis → survives
      (203L, vec(9, 0.0))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedupIncrementalNew(incoming, corpus,
      k = 2, iters = 2, threshold = 0.95)
    val kept = out.collect().map(_.getLong(0)).toSet
    assert(kept === Set(201L, 203L))
    // output contains ONLY batch ids — the accepted corpus is never
    // dropped or re-emitted
    assert(kept.forall(_ >= 200L))
  }

  test("semDedupIncrementalNewByCellSize: same keeper semantics through the frozen two-level index") {
    import spark.implicits._
    def vec(axis: Int, jit: Double) = {
      val v = Array.fill(64)(0.0)
      v(axis) = 1.0; v(40 + axis) = jit; v.toSeq
    }
    val corpus = (0 until 8).map { i =>
      (100L + i, vec(i % 2, 0.02 * (i / 2)))
    }.toDF("vec_id", "embedding")
    val incoming = Seq(
      (200L, vec(0, 0.021)),  // near-copy of accepted → dropped
      (201L, vec(5, 0.0)),    // novel → survives
      (202L, vec(5, 0.001)),  // twin of 201 → dropped (first wins)
      (203L, vec(9, 0.0))     // novel → survives
    ).toDF("vec_id", "embedding")
    // target 4 over N=8 derives k=2 ⇒ k1=2 coarse, k2=1 fine — the
    // same separable partition the pinned-k form finds, probed frozen
    val out = Dedup.semDedupIncrementalNewByCellSize(incoming, corpus,
      targetCellSize = 4, iters = 2, threshold = 0.95)
    assert(out.collect().map(_.getLong(0)).toSet === Set(201L, 203L))
  }

  test("semDedupIncrementalNewByCellSize is partition-invariant") {
    import spark.implicits._
    def vec(axis: Int, jit: Double) = {
      val v = Array.fill(64)(0.0)
      v(axis) = 1.0; v(40 + axis) = jit; v.toSeq
    }
    val corpus = (0 until 16).map { i =>
      (100L + i, vec(i % 4, 0.02 * (i / 4)))
    }.toDF("vec_id", "embedding")
    val inc = (0 until 8).map { i =>
      (200L + i, vec(i % 4, 0.02 * (i / 4) + 0.001))
    }.toDF("vec_id", "embedding")
    def run(c: org.apache.spark.sql.DataFrame,
        n: org.apache.spark.sql.DataFrame) =
      Dedup.semDedupIncrementalNewByCellSize(n, c, targetCellSize = 4,
        iters = 2, threshold = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(corpus.repartition(1), inc.repartition(1)) ===
      run(corpus.repartition(5), inc.repartition(3)))
  }

  test("semDedupIncrementalNew is partition-invariant") {
    import spark.implicits._
    def vec(axis: Int, jit: Double) = {
      val v = Array.fill(64)(0.0)
      v(axis) = 1.0; v(40 + axis) = jit; v.toSeq
    }
    val corpus = (0 until 12).map { i =>
      (100L + i, vec(i % 3, 0.02 * (i / 3)))
    }.toDF("vec_id", "embedding")
    val inc = (0 until 9).map { i =>
      (200L + i, vec(i % 3, 0.02 * (i / 3) + 0.001))
    }.toDF("vec_id", "embedding")
    def run(c: org.apache.spark.sql.DataFrame,
        n: org.apache.spark.sql.DataFrame) =
      Dedup.semDedupIncrementalNew(n, c, k = 3, iters = 2, threshold = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(corpus.repartition(1), inc.repartition(1)) ===
      run(corpus.repartition(5), inc.repartition(3)))
  }

  test("semanticReport: paraphrase-leak flags, orthogonal eval clean, banded ⊆ brute") {
    import spark.implicits._
    import graft.operators.Decontaminate
    def vec(axis: Int, jit: Double) = {
      val v = Array.fill(64)(0.0)
      v(axis) = 1.0; v(40 + axis) = jit; v.toSeq
    }
    val train = (0 until 12).map { i =>
      (100L + i, vec(i % 3, 0.02 * (i / 3)))
    }.toDF("vec_id", "embedding")
    val evalSet = Seq(
      (1L, vec(0, 0.015)),  // paraphrased twin of the axis-0 family
      (2L, vec(7, 0.0))     // orthogonal to every train vector → clean
    ).toDF("eval_id", "embedding")
    val brute = Decontaminate.semanticReport(train, evalSet, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every axis-0 train vector is flagged against eval 1; nothing
    // is ever flagged against the orthogonal eval 2
    assert(brute.map(_._1) === (0 until 12).filter(_ % 3 == 0)
      .map(i => 100L + i).toSet)
    assert(brute.forall(_._2 == 1L))
    // the banded form never flags anything brute didn't, and on this
    // tight fixture (cos ≈ 0.999 pairs share every sign bit) recovers
    // all of it
    val banded = Decontaminate.semanticReportBanded(train, evalSet,
      threshold = 0.95).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(brute))
    assert(banded === brute)
  }

  test("nfc_normalize: decomposed composes, NFC input is a fixpoint, NULL propagates") {
    import spark.implicits._
    val rows = Seq(
      (1L, "Cafe\u0301 no\u0308el"),   // decomposed
      (2L, "Caf\u00e9 n\u00f6el"),     // precomposed (already NFC)
      (3L, null.asInstanceOf[String]),
      (4L, "plain ascii")
    ).toDF("id", "t")
    val out = rows.selectExpr("id", "nfc_normalize(t) AS n",
        "CAST(length(nfc_normalize(t)) AS BIGINT) AS ln")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out(1L)._1 === "Caf\u00e9 n\u00f6el") // composed to NFC
    assert(out(1L)._2 === 9L)                      // 11 code points -> 9
    assert(out(2L)._1 === "Caf\u00e9 n\u00f6el") // fixpoint
    assert(out(3L)._1 === null)                    // NULL propagates
    assert(out(4L)._1 === "plain ascii")           // ASCII fast path
  }

  test("strip_accents: marks dropped, non-decomposing kept, NULL propagates") {
    import spark.implicits._
    val rows = Seq(
      (1L, "Z\u00fcrich caf\u00e9"),
      (2L, "\u00f8re \u00df stra\u00dfe"),  // no canonical decomposition
      (3L, null.asInstanceOf[String]),
      (4L, "plain"),
      (5L, "Cafe\u0301")                      // already-decomposed input
    ).toDF("id", "t")
    val out = rows.selectExpr("id", "strip_accents(t) AS k")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) === "Zurich cafe")
    assert(out(2L) === "\u00f8re \u00df stra\u00dfe") // preserved
    assert(out(3L) === null)
    assert(out(4L) === "plain")
    assert(out(5L) === "Cafe")  // the combining acute is a mark too
  }

  test("normalizeUrls: every canonicalization rule, hand-checked") {
    import spark.implicits._
    val in = Seq(
      // case + www + default https port + fragment + trailing slash
      (1L, "HTTPS://WWW.SiteA.co.uk:443/p/1/#frag"),
      // tracking params removed, survivors sorted, http default port
      (2L, "http://sitea.co.uk:80/p/1?utm_source=x&b=2&a=1"),
      // non-default port kept; no path
      (3L, "https://news.siteb.com:8080"),
      // 443 is NOT default for http — kept
      (4L, "http://siteb.com:443/p"),
      // all params are tracking → no '?' at all
      (5L, "https://sitec.io/p?utm_a=1&utm_b=2"),
      // root path '/' survives (only non-root trailing slash strips)
      (6L, "https://sitec.io/")
    ).toDF("id", "url")
    val out = graft.operators.Web.normalizeUrls(in, "url")
      .select("id", "norm_url", "host", "had_tracking")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(out(1L) === (("https://sitea.co.uk/p/1", "sitea.co.uk", false)))
    assert(out(2L) === (("http://sitea.co.uk/p/1?a=1&b=2", "sitea.co.uk", true)))
    assert(out(3L) === (("https://news.siteb.com:8080", "news.siteb.com", false)))
    assert(out(4L) === (("http://siteb.com:443/p", "siteb.com", false)))
    assert(out(5L) === (("https://sitec.io/p", "sitec.io", true)))
    assert(out(6L) === (("https://sitec.io/", "sitec.io", false)))
  }

  test("registrableDomain: longest public suffix wins; no match = own domain") {
    import spark.implicits._
    val hosts = Seq("blog.sitea.co.uk", "sitea.co.uk", "a.b.sitec.com",
      "sited.io", "10.0.0.1", "intranet").toDF("host")
    val out = hosts.select(col("host"),
      graft.operators.Web.registrableDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("blog.sitea.co.uk") === "sitea.co.uk") // NOT co.uk, NOT uk
    assert(out("sitea.co.uk") === "sitea.co.uk")
    assert(out("a.b.sitec.com") === "sitec.com")
    assert(out("sited.io") === "sited.io")
    assert(out("10.0.0.1") === "10.0.0.1")
    assert(out("intranet") === "intranet")
  }

  test("domainCap: bounded-aggregate selection equals the window form and is partition-invariant") {
    import spark.implicits._
    val urls = (0L until 60L)
      .map(i => (i, s"https://site${i % 5}.com/p/$i")).toDF("doc_id", "url")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Web.domainCap(df, "url", "doc_id", k = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sortBy(x => (x._1, x._3)).toSeq
    val a = run(urls.repartition(1))
    val b = run(urls.repartition(7))
    assert(a === b)
    // 5 domains × cap 3
    assert(a.size === 15)
    assert(a.groupBy(_._1).forall(_._2.map(_._3).sorted == Seq(1, 2, 3)))
    // equals the row_number window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("reg_domain"))
      .orderBy(col("_ck"), col("doc_id"))
    val windowed = graft.operators.Web.normalizeUrls(urls, "url")
      .withColumn("reg_domain",
        graft.operators.Web.registrableDomain(col("host")))
      .withColumn("_ck", graft.operators.Dedup.hash60(
        concat(lit("cap|"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("reg_domain"), col("doc_id"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(a === windowed)
  }

  test("calibrationBins: hand-computed reliability table and ECE") {
    import spark.implicits._
    // scores 0..100; min 0, max 100 → pred_ppm = score·10⁴ exactly.
    // Bin 1 holds pred < 100000 (scores 0-9), …, bin 10 holds ≥ 900000.
    // Perfectly calibrated labels would make gap ≈ 0; here bin 1 is all
    // negative and bin 10 all positive, hand-checkable.
    val df = Seq(
      (0L, 0L), (5L, 0L), (9L, 0L),         // bin 1: preds 0, 50000, 90000
      (50L, 1L), (50L, 0L),                  // bin 6: preds 500000 ×2
      (95L, 1L), (100L, 1L)                  // bin 10: preds 950000, 1000000
    ).toDF("score", "label")
    val out = graft.operators.Profile.calibrationBins(df, "score", "label")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // bin 1: n=3, pos=0, mean_pred = 140000/3 = 46666, pos_rate 0,
    //   gap −46666
    assert(out(1) === ((3L, 0L, 46666L, 0L, -46666L, out(1)._6)))
    // bin 6: n=2, pos=1, mean_pred 500000, pos_rate 500000, gap 0
    assert(out(6) === ((2L, 1L, 500000L, 500000L, 0L, out(6)._6)))
    // bin 10: n=2, pos=2, mean_pred 975000, pos_rate 1000000, gap 25000
    assert(out(10) === ((2L, 2L, 975000L, 1000000L, 25000L, out(10)._6)))
    // ece = (3·46666 + 2·0 + 2·25000) div 7 = 189998 div 7 = 27142,
    // identical on every row
    assert(out.values.map(_._6).toSet === Set(27142L))
    assert(out.size === 3)
  }

  test("calibrationBins: degenerate constant score maps to pred 500000") {
    import spark.implicits._
    val df = Seq((7L, 1L), (7L, 0L), (7L, 0L)).toDF("score", "label")
    val out = graft.operators.Profile.calibrationBins(df, "score", "label")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getInt(0) === 6)              // 500000·10 div 10⁶ = 5 → bin 6
    assert(r.getLong(3) === 500000L)       // mean_pred_ppm
    assert(r.getLong(4) === 333333L)       // pos_rate_ppm = 10⁶ div 3
    assert(r.getLong(6) === 166667L)       // ece = |333333 − 500000|
  }
}

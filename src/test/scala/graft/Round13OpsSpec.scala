package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-13 hardening: reportBloom's sizing
  * clamp (output identical past the session caps), withScriptProfile's
  * collision guard (re-profiling is idempotent, never ambiguous). */
class Round13OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round13-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  test("reportBloom: sizing past the session bloom caps clamps, output identical") {
    import spark.implicits._
    val train = SparkEntry.tbl(spark, TestData.dir("0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val eval = train.where(col("doc_id") % 11 === 3)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val exact = graft.operators.Decontaminate.report(train, eval)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // expectedItems far past maxNumItems (4M) and bits past maxNumBits
    // (64Mi): the helper must clamp (warn) and still produce the exact
    // report — false positives are removed by the exact join
    val clamped = graft.operators.Decontaminate.reportBloom(
        train, eval, expectedItems = 50000000L, fpp = 0.001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty, "fixture must produce contamination hits")
    assert(clamped === exact)
  }

  test("withScriptProfile: re-profiling drops stale columns instead of duplicating") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "привет мир"))
      .toDF("doc_id", "text")
    val once = graft.functions.Text.withScriptProfile(df, col("text"))
    val twice = graft.functions.Text.withScriptProfile(
      // re-profile over a DIFFERENT text column: stale n_* values must
      // be recomputed, not shadowed by ambiguous duplicates
      once.withColumn("text2", lit("汉字")), col("text2"))
    assert(twice.columns.count(_ == "n_latin") === 1,
      "n_<script> must appear exactly once after re-profiling")
    assert(!twice.columns.contains("_sp"))
    val han = twice.select("doc_id", "n_han", "n_latin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(han === Set((1L, 2L, 0L), (2L, 2L, 0L)),
      "recomputed profile must reflect the new text column")
    // a caller-owned `_sp` column is also recomputed away, not collided
    val sp = graft.functions.Text.withScriptProfile(
      df.withColumn("_sp", lit(9)), col("text"))
    assert(sp.columns.count(_ == "_sp") === 0)
  }

  test("decodeAudio: RIFF chunk-walk edge cases quarantine, never throw") {
    import spark.implicits._
    def wav(extraChunk: Boolean, declaredOverrun: Boolean,
        fmtTag: Int): Array[Byte] = {
      val frames = 10; val blockAlign = 2; val data = frames * blockAlign
      // an odd-sized LIST chunk before fmt exercises word-aligned
      // advancement; declaredOverrun claims more data bytes than exist
      val extra = if (extraChunk) 8 + 3 + 1 else 0
      val bb = java.nio.ByteBuffer.allocate(44 + extra + data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + data)
        .put("WAVE".getBytes("US-ASCII"))
      if (extraChunk)
        bb.put("LIST".getBytes("US-ASCII")).putInt(3)
          .put(Array[Byte](1, 2, 3, 0)) // 3 bytes + 1 pad
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(fmtTag.toShort).putShort(1.toShort)
        .putInt(8000).putInt(8000 * blockAlign)
        .putShort(blockAlign.toShort).putShort(16.toShort)
        .put("data".getBytes("US-ASCII"))
        .putInt(if (declaredOverrun) data + 999 else data)
      (0 until data).foreach(i => bb.put(i.toByte))
      bb.array()
    }
    val rows = Seq(
      (1L, wav(extraChunk = false, declaredOverrun = false, fmtTag = 1)),
      (2L, wav(extraChunk = true, declaredOverrun = false, fmtTag = 1)),
      (3L, wav(extraChunk = false, declaredOverrun = true, fmtTag = 1)),
      (4L, wav(extraChunk = false, declaredOverrun = false, fmtTag = 65534)),
      (5L, Array[Byte](82, 73)), // 2-byte fragment
      (6L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "bytes")
    val got = graft.operators.Multimodal.decodeAudio(rows)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(5)))).toMap
    assert(got(1L) === (Some("pcm"), Some(10L)))
    assert(got(2L) === (Some("pcm"), Some(10L)),
      "odd-sized pre-fmt chunk must be walked over (word-aligned)")
    assert(got(3L)._1.isEmpty,
      "declared data exceeding the payload is a truncated scrape → quarantine")
    assert(got(4L)._1 === Some("fmt_65534"),
      "extensible-format tag is bucketed, not quarantined")
    assert(got(5L)._1.isEmpty && got(6L)._1.isEmpty)
  }

  test("audioPerceptualHashes: volume invariance, decorrelation, quarantine classes") {
    import spark.implicits._
    def pcm16(samples: Array[Short], channels: Int = 1,
        bits: Int = 16): Array[Byte] = {
      val blockAlign = channels * bits / 8
      val dataSize = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort)
        .putInt(8000).putInt(8000 * blockAlign)
        .putShort(blockAlign.toShort).putShort(bits.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(bb.putShort)
      bb.array()
    }
    def noise(seed: Long, n: Int, amp: Int): Array[Short] =
      Array.tabulate(n)(j =>
        (((seed * 31 + j.toLong * j * 7) % 1801 - 900) * amp).toShort)
    val n = 65 * 9
    val rows = Seq(
      (1L, pcm16(noise(5, n, 16))),   // full volume
      (2L, pcm16(noise(5, n, 4))),    // quarter volume — same signs
      (3L, pcm16(noise(9, n, 16))),   // different content
      (4L, pcm16(noise(5, 64, 16))),  // < 65 frames → quarantine
      (5L, pcm16(noise(5, n, 16), channels = 2)), // stereo → quarantine
      (6L, "not a wav".getBytes("UTF-8"))).toDF("media_id", "bytes")
    val h = graft.operators.Multimodal.audioPerceptualHashes(rows)
      .collect().map(r => r.getLong(0) ->
        (0 until 4).map(i => Option(r.get(i + 1)))).toMap
    assert(h(1L) === h(2L), "4x volume change must not move a single bit")
    assert(h(1L).forall(_.nonEmpty) && h(3L).forall(_.nonEmpty))
    assert(h(1L) !== h(3L), "distinct noise contents must decorrelate")
    Seq(4L, 5L, 6L).foreach(id =>
      assert(h(id).forall(_.isEmpty), s"id $id must quarantine"))
    // the pair pipeline: only (1,2) at Hamming 0; quarantined rows
    // never enter the join
    val pairs = graft.operators.Multimodal.audioNearDupPairs(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
    // the deep (256-bit) variant: same invariance and verdicts on the
    // same clips (n = 585 ≥ 257 frames), same quarantine classes
    val hd = graft.operators.Multimodal.audioPerceptualHashesDeep(rows)
      .collect().map(r => r.getLong(0) ->
        (0 until 8).map(i => Option(r.get(i + 1)))).toMap
    assert(hd(1L) === hd(2L) && hd(1L).forall(_.nonEmpty))
    assert(hd(1L) !== hd(3L))
    Seq(4L, 5L, 6L).foreach(id => assert(hd(id).forall(_.isEmpty)))
    val dPairs = graft.operators.Multimodal.audioNearDupPairsDeep(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dPairs.toSeq === Seq((1L, 2L, 0L)))
  }

  test("decodeVideo: ISO-BMFF box-walk edge cases quarantine, never throw") {
    import spark.implicits._
    def be(i: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(i).array()
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def mvhdV0(ts: Int, dur: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.put(0.toByte).put(Array[Byte](0, 0, 0)).putInt(1).putInt(2)
        .putInt(ts).putInt(dur)
      box("mvhd", bb.array())
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be(0) ++ "mp42".getBytes("US-ASCII"))
    val good = ftyp ++ box("moov", mvhdV0(1000, 7321) ++
      box("trak", new Array[Byte](4)) ++ box("trak", new Array[Byte](4))) ++
      box("mdat", Array[Byte](9, 9, 9))
    // a largesize (size=1) mdat whose u64 length matches exactly
    val largeMdat = be(1) ++ "mdat".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(8).putLong(16 + 4).array() ++
      Array[Byte](1, 2, 3, 4)
    val withLarge = ftyp ++ box("moov", mvhdV0(600, 1234)) ++ largeMdat
    // moov AFTER mdat (streaming-unfriendly but legal) must still parse
    val moovLast = ftyp ++ box("mdat", new Array[Byte](5)) ++
      box("moov", mvhdV0(100, 250))
    val rows = Seq(
      (1L, good),
      (2L, withLarge),
      (3L, moovLast),
      (4L, ftyp ++ box("moov", box("trak", new Array[Byte](4)))), // no mvhd
      (5L, ftyp ++ box("moov", mvhdV0(0, 10))),      // zero timescale
      (6L, good.take(30)),                            // truncated mid-box
      (7L, be(1) ++ "mdat".getBytes("US-ASCII") ++
        java.nio.ByteBuffer.allocate(8).putLong(1L << 40).array()), // largesize overrun
      (8L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "bytes")
    val got = graft.operators.Multimodal.decodeVideo(rows)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2)),
          Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(1L) === (Some("isom"), Some(1000L), Some(7321L), Some(2)))
    assert(got(2L) === (Some("isom"), Some(600L), Some(2056L), Some(0)),
      "64-bit largesize box must be walked over")
    assert(got(3L) === (Some("isom"), Some(100L), Some(2500L), Some(0)),
      "moov after mdat must still parse")
    Seq(4L, 5L, 6L, 7L, 8L).foreach(id =>
      assert(got(id)._1.isEmpty, s"id $id must quarantine"))

    // m19 shape: the QA gate over the same rows — every check fires
    // both ways, and every quarantined row fails every check
    val qa = graft.operators.Multimodal.videoQaReport(rows)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(qa.keySet === Set("decodable", "multi_track", "timescale1k",
      "min_duration"))
    assert(qa("decodable") === (8L, 3L))    // ids 1-3 decode, 4-8 quarantine
    assert(qa("multi_track") === (8L, 1L))  // only `good` has 2 traks
    assert(qa("timescale1k") === (8L, 1L))  // 1000 vs 600/100
    assert(qa("min_duration") === (8L, 3L)) // 7321/2056/2500 ms all >= 2000
  }

  test("video exact dedup: byte-identity grouping both ways (m20 shape)") {
    import spark.implicits._
    // one content under two ids groups to (min id, 2); per-file
    // garbage and a one-byte-different container stay singletons
    val a = Array[Byte](1, 2, 3, 4, 5)
    val b = Array[Byte](1, 2, 3, 4, 6)
    val rows = Seq((10L, a), (11L, a.clone()), (12L, b),
      (13L, "garbage 13".getBytes("UTF-8")),
      (14L, "garbage 14".getBytes("UTF-8"))).toDF("media_id", "bytes")
    val got = rows.groupBy(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("bytes")))
      .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("media_id")).as("keep_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 2L), (12L, 1L), (13L, 1L), (14L, 1L)))
  }

  test("loadPslRules: published file format parses to the expression contract") {
    import spark.implicits._
    val fixture =
      """// This is a comment line, ignored entirely.
        |
        |// ===BEGIN ICANN DOMAINS===
        |com
        |co.uk
        |jp
        |kyoto.jp
        |*.ck
        |!www.ck this trailing annotation is ignored
        |*.kobe.jp
        |!city.kobe.jp
        |COM
        |// ===END ICANN DOMAINS===
        |
        |// ===BEGIN PRIVATE DOMAINS===
        |github.io
        |// ===END PRIVATE DOMAINS===
        |""".stripMargin
    val icann = graft.operators.Web.loadPslRules(fixture)
    assert(icann === Seq("com", "co.uk", "jp", "kyoto.jp", "*.ck",
      "!www.ck", "*.kobe.jp", "!city.kobe.jp"),
      "ICANN-only load: comments/blanks/annotations stripped, case " +
        "folded, dupes removed, PRIVATE excluded")
    val both = graft.operators.Web.loadPslRules(
      fixture, Set("ICANN", "PRIVATE"))
    assert(both.contains("github.io"))
    // rules outside any marked section (hand-authored lists) always load
    assert(graft.operators.Web.loadPslRules("com\n// c\nco.uk")
      === Seq("com", "co.uk"))
    // w4's semantics through the loaded rules: the published test-case
    // verdicts (wildcard, exception, plain, none) all hold
    val hosts = Seq("a.b.test.ck", "www.ck", "b.www.ck", "city.kobe.jp",
      "x.city.kobe.jp", "a.b.kobe.jp", "foo.com", "a.foo.com",
      "intranet").toDF("host")
    val got = hosts.select(col("host"),
        graft.operators.Web.registrableDomain(col("host"), icann).as("rd"),
        graft.functions.RegistrableDomainExpr(col("host"), icann).as("rdn"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    got.foreach { case (h, rd, rdn) =>
      assert(rd === rdn, s"chain vs native diverged on $h") }
    val byHost = got.map(g => g._1 -> g._2).toMap
    assert(byHost("a.b.test.ck") === "b.test.ck") // wildcard *.ck
    assert(byHost("www.ck") === "www.ck")          // exception, bare
    assert(byHost("b.www.ck") === "www.ck")        // exception prevails
    assert(byHost("city.kobe.jp") === "city.kobe.jp")
    assert(byHost("x.city.kobe.jp") === "city.kobe.jp")
    assert(byHost("a.b.kobe.jp") === "a.b.kobe.jp") // wildcard *.kobe.jp
    assert(byHost("foo.com") === "foo.com")
    assert(byHost("a.foo.com") === "foo.com")
    assert(byHost("intranet") === "intranet")       // no rule: own domain
  }

  test("loadRobotsRules: RFC 9309 group scoping, merge, fallback") {
    import graft.operators.{RobotsRule, Web}
    val txt = "\uFEFF" +
      """# policy
        |Disallow: /orphan
        |User-Agent: AlphaBot
        |User-agent: BetaBot
        |Disallow: /shared   # belongs to BOTH consecutive agents
        |Allow: /shared/ok
        |Crawl-delay: 10
        |Disallow: /after-unknown-field
        |
        |User-agent: *
        |Disallow: /star
        |
        |user-agent: alphabot
        |Disallow: /second-group
        |Disallow:
        |noColonLine
        |""".stripMargin
    // rules before any User-agent line are dropped; unknown fields end
    // a UA run but NOT the group's rule scope; same-UA groups merge;
    // empty Disallow is no rule; field/token case folds
    assert(Web.loadRobotsRules(txt, "ALPHABOT") === Seq(
      RobotsRule(false, "/shared"), RobotsRule(true, "/shared/ok"),
      RobotsRule(false, "/after-unknown-field"),
      RobotsRule(false, "/second-group")))
    assert(Web.loadRobotsRules(txt, "BetaBot") === Seq(
      RobotsRule(false, "/shared"), RobotsRule(true, "/shared/ok"),
      RobotsRule(false, "/after-unknown-field")))
    // token match is exact: an unnamed crawler falls back to the * group
    assert(Web.loadRobotsRules(txt, "alphabot-images")
      === Seq(RobotsRule(false, "/star")))
    // no * group, no named group -> no rules (everything allowed)
    assert(Web.loadRobotsRules("User-agent: x\nDisallow: /a", "y") === Seq())
  }

  test("robots verdict: RFC precedence on the spelled classes, chain == native") {
    import graft.operators.{RobotsRule, Web}
    import spark.implicits._
    val rules = Web.loadRobotsRules(
      """User-agent: bot
        |Allow: /p/1
        |Disallow: /p/1
        |Disallow: /p/15
        |Allow: /p/152
        |Disallow: /p/15$
        |Disallow: /*utm_
        |Disallow: /p/8$
        |""".stripMargin, "bot")
    assert(rules.size === 7)
    val cases = Seq(
      "/p/10" -> true,            // equal-length Allow/Disallow tie: allow
      "/p/15" -> false,           // anchored len-6 beats plain len-5
      "/p/15/" -> false,          // anchor misses, plain /p/15 prevails
      "/p/152?utm_source=x" -> true, // allow ties the wildcard at 6: allow
      "/p/151?id=3&utm_campaign=x" -> false, // wildcard beats /p/1 and /p/15? no: /p/15 len5 < 6
      "/p/8" -> false,            // anchored exact
      "/p/8?b=2" -> true,         // anchor misses -> /p/1? no match -> default
      "/p/42" -> true,            // default: no rule matches
      "/q/9?utm_x=1" -> false)    // wildcard crosses into the query
    val df = cases.map(_._1).toDF("path")
      .withColumn("ci", Web.robotsPrevailingRule(col("path"), rules))
      .withColumn("ni", graft.functions.RobotsMatchExpr(col("path"),
        rules.map(r => (r.allow, r.path))))
      .select(col("path"), col("ci"), col("ni"),
        Web.robotsAllowed(col("ci"), rules).as("ok"),
        Web.robotsRuleLabel(col("ci"), rules).as("lbl"))
    val got = df.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(3),
        r.getString(4))).toSeq
    got.foreach { case (p, ci, ni, _, _) =>
      assert(ci === ni, s"chain vs native diverged on $p") }
    val verdicts = got.map(g => g._1 -> g._4).toMap
    cases.foreach { case (p, want) =>
      assert(verdicts(p) === want, s"verdict mismatch on $p") }
    val labels = got.map(g => g._1 -> g._5).toMap
    assert(labels("/p/15") === "disallow /p/15$")
    assert(labels("/p/15/") === "disallow /p/15")
    assert(labels("/p/152?utm_source=x") === "allow /p/152")
    assert(labels("/p/42") === "default")
    // NULL path -> NULL on both implementations
    val nulls = Seq[Option[String]](None).toDF("path")
      .select(Web.robotsPrevailingRule(col("path"), rules).as("ci"),
        graft.functions.RobotsMatchExpr(col("path"),
          rules.map(r => (r.allow, r.path))).as("ni"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("robots glob: hostile patterns, chain == native == reference on fuzz") {
    import graft.operators.{RobotsRule, Web}
    import spark.implicits._
    // every metacharacter class the glob translation must keep literal,
    // plus wildcard/anchor compositions and an equal-length tie pair
    val rules = Seq(
      RobotsRule(false, "*"), RobotsRule(false, "/a*b*bc$"),
      RobotsRule(true, "/a.b"), RobotsRule(false, "/q(1)"),
      RobotsRule(false, "/[x]"), RobotsRule(false, "/p+q"),
      RobotsRule(false, "/a|b"), RobotsRule(false, "/do$lar"),
      RobotsRule(false, "/ca^ret"), RobotsRule(false, "/back\\slash"),
      RobotsRule(true, "/tie/x"), RobotsRule(false, "/tie/y"),
      RobotsRule(false, "/e\u00e9*\u00e9$"), RobotsRule(false, "$"),
      RobotsRule(true, "/*/deep*$"), RobotsRule(false, "/nl*x"))
    assert(rules.size === 16)
    val rnd = new scala.util.Random(13)
    val alphabet = "ab/c.*$()[]|+^\\xy\u00e9\n"
    val fuzz = Seq("", "/a.b", "/aXb", "/abbc", "/abc", "/a%b%bc",
      "/q(1)", "/q1", "/[x]", "/x", "/p+q", "/ppq", "/a|b", "/do$lar",
      "/ca^ret", "/back\\slash", "/tie/x", "/tie/y",
      "/e\u00e9\u00e9", "/e\u00e9zz\u00e9", "/nl\nx", "/d/deep",
      "/d/deeper") ++
      (1 to 300).map(_ => (0 until rnd.nextInt(14))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    // reference: the RFC rule restated independently — longest spelled
    // octet pattern first, Allow before Disallow, regex on the shared
    // translation (the chain exercises startsWith fast paths on top)
    def ref(p: String): Int = {
      val hit = Web.robotsOrder(rules).find { case (r, _) =>
        java.util.regex.Pattern.compile(Web.robotsGlobRegex(r.path))
          .matcher(p).find()
      }
      hit.map(_._2).getOrElse(-1)
    }
    val df = fuzz.toDF("path")
      .withColumn("ci", Web.robotsChain(col("path"), rules))
      .withColumn("ni", graft.functions.RobotsMatchExpr(col("path"),
        rules.map(r => (r.allow, r.path))))
    df.collect().foreach { r =>
      val (p, ci, ni) = (r.getString(0), r.getInt(1), r.getInt(2))
      assert(ci === ni, s"chain vs native diverged on ${p.map(_.toInt)}")
      assert(ci === ref(p), s"chain vs reference diverged on ${p.map(_.toInt)}")
    }
    // past WhenChainMaxRobotsRules the public rule switches to the
    // native expression; the chain builder still agrees at 48 rules
    val big = Seq.tabulate(48)(i =>
      RobotsRule(i % 3 == 0, s"/r${i % 7}*${i % 5}"))
    val bigDf = fuzz.toDF("path")
      .withColumn("pub", Web.robotsPrevailingRule(col("path"), big))
      .withColumn("ch", Web.robotsChain(col("path"), big))
    bigDf.collect().foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"48-rule native vs chain diverged on ${r.getString(0).map(_.toInt)}")
    }
  }
}

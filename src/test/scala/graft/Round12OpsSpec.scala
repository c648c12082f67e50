package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Web

/** Behavior specs for the round-12 work: real-PSL wildcard/exception
  * semantics (the published PSL project's test-case file ported as a
  * fixture), the extended chain ≡ native ≡ scala-reference property,
  * and codegen survival of the three-rule native expression. */
class Round12OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round12-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  // --- the published PSL test cases ----------------------------------
  //
  // The PSL project publishes a canonical checkPublicSuffix test file
  // (the `.biz`/`.uk.com`/`.jp`-cities/`.ck`/US-K12 blocks); this is
  // that file's rule-bearing section ported to our contract. ONE
  // documented adaptation: where the published file expects NULL (the
  // host IS a bare public suffix — including a bare `<label>.w`
  // wildcard suffix — or a bare TLD), our contract returns the host
  // unchanged ("a host matching nothing is its own domain"), because a
  // curation rollup must never emit NULL group keys. Every non-null
  // published expectation is verbatim.
  private val pslRules = Seq(
    "biz", "com", "uk.com", "ac", "jp", "ac.jp", "kyoto.jp", "ide.kyoto.jp",
    "us", "ak.us", "k12.ak.us",
    "*.mm", "*.kobe.jp", "*.ck", "!www.ck", "!city.kobe.jp")

  private val pslCases: Seq[(String, String)] = Seq(
    // plain TLD rules
    "biz" -> "biz", // published: null (bare suffix)
    "domain.biz" -> "domain.biz",
    "b.domain.biz" -> "domain.biz",
    "a.b.domain.biz" -> "domain.biz",
    "example.com" -> "example.com",
    "b.example.com" -> "example.com",
    "a.b.example.com" -> "example.com",
    // a listed 2-label suffix under a listed TLD
    "uk.com" -> "uk.com", // published: null
    "example.uk.com" -> "example.uk.com",
    "b.example.uk.com" -> "example.uk.com",
    "test.ac" -> "test.ac",
    // TLD with only ONE wildcard rule (*.mm)
    "mm" -> "mm", // published: null (no rule matches a dotless host)
    "c.mm" -> "c.mm", // published: null (c.mm IS the public suffix)
    "b.c.mm" -> "b.c.mm",
    "a.b.c.mm" -> "b.c.mm",
    // the .jp complex: plain nested suffixes + a wildcard city +
    // an exception city
    "jp" -> "jp", // published: null
    "test.jp" -> "test.jp",
    "www.test.jp" -> "test.jp",
    "ac.jp" -> "ac.jp", // published: null
    "test.ac.jp" -> "test.ac.jp",
    "www.test.ac.jp" -> "test.ac.jp",
    "kyoto.jp" -> "kyoto.jp", // published: null
    "test.kyoto.jp" -> "test.kyoto.jp",
    "ide.kyoto.jp" -> "ide.kyoto.jp", // published: null
    "b.ide.kyoto.jp" -> "b.ide.kyoto.jp",
    "a.b.ide.kyoto.jp" -> "b.ide.kyoto.jp",
    "c.kobe.jp" -> "c.kobe.jp", // published: null (bare *.kobe.jp suffix)
    "b.c.kobe.jp" -> "b.c.kobe.jp",
    "a.b.c.kobe.jp" -> "b.c.kobe.jp",
    "city.kobe.jp" -> "city.kobe.jp", // the EXCEPTION rule fires
    "www.city.kobe.jp" -> "city.kobe.jp",
    // TLD with a wildcard rule and one exception (*.ck + !www.ck)
    "ck" -> "ck", // published: null
    "test.ck" -> "test.ck", // published: null (bare *.ck suffix)
    "b.test.ck" -> "b.test.ck",
    "a.b.test.ck" -> "b.test.ck",
    "www.ck" -> "www.ck", // the exception: www.ck is NOT a suffix
    "www.www.ck" -> "www.ck",
    // US K12 (3-level plain nesting)
    "us" -> "us", // published: null
    "test.us" -> "test.us",
    "www.test.us" -> "test.us",
    "ak.us" -> "ak.us", // published: null
    "test.ak.us" -> "test.ak.us",
    "www.test.ak.us" -> "test.ak.us",
    "k12.ak.us" -> "k12.ak.us", // published: null
    "test.k12.ak.us" -> "test.k12.ak.us",
    "www.test.k12.ak.us" -> "test.k12.ak.us",
    // unlisted TLD: every host is its own domain. Published expects
    // example.example for the dotted forms via the implicit `*` default
    // rule; our contract deliberately has no implicit rule (an IP or
    // intranet host must roll up to itself, not to its last two
    // labels), so all four adapt to the identity.
    "example" -> "example",
    "example.example" -> "example.example",
    "b.example.example" -> "b.example.example",
    "a.b.example.example" -> "a.b.example.example")

  test("published PSL test cases: when-chain and native agree with the spec") {
    import spark.implicits._
    assert(pslRules.size <= Web.WhenChainMaxSuffixes,
      "the chain side must exercise the when-chain path")
    val df = pslCases.map(_._1).toDF("host")
      .select(col("host"),
        Web.registrableDomain(col("host"), pslRules).as("chain"),
        graft.functions.RegistrableDomainExpr(col("host"), pslRules)
          .as("native"))
    val got = df.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    for ((host, want) <- pslCases) {
      assert(got(host)._1 === want, s"when-chain on $host")
      assert(got(host)._2 === want, s"native on $host")
    }
  }

  test("three-rule edge cases: empty labels and bare wildcard suffixes") {
    import spark.implicits._
    val rules = Seq("com", "*.ck", "!www.ck")
    // hand-derived from the contract: empty label where the contract
    // needs one yields "" (the regexp_extract no-match convention),
    // on BOTH the wildcard's own label and the registrable label
    val cases = Seq(
      ".ck" -> "", // empty wildcard label
      "a..ck" -> "", // empty wildcard label after a real one
      "..test.ck" -> "", // empty registrable label over a wildcard hit
      ".www.ck" -> "www.ck", // exception ignores left context
      "x..www.ck" -> "www.ck",
      ".com" -> "", // plain empty-label convention unchanged
      "a..com" -> "",
      "ck" -> "ck", // dotless: own domain
      "" -> "")
    val df = cases.map(_._1).toDF("host")
      .select(col("host"),
        Web.registrableDomain(col("host"), rules).as("chain"),
        graft.functions.RegistrableDomainExpr(col("host"), rules)
          .as("native"))
    val got = df.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    for ((host, want) <- cases) {
      assert(got(host)._1 === want, s"when-chain on '$host'")
      assert(got(host)._2 === want, s"native on '$host'")
    }
  }

  /** The walk contract spelled independently over java Strings — the
    * same three-rule semantics with none of the UTF8String byte
    * machinery, so a pointer bug in the native expression cannot hide
    * behind an identical twin. */
  private def refDomain3(host: String, plain: Set[String],
      wild: Set[String], exc: Set[String]): String = {
    var prev2 = -1
    var prev = 0
    var dot = host.indexOf('.')
    while (dot >= 0) {
      val cand = host.substring(dot + 1)
      if (exc.contains(cand)) return cand
      if (wild.contains(cand)) {
        if (dot == prev) return ""
        val ps = host.substring(prev)
        if (exc.contains(ps)) return ps
        if (prev == 0) return host
        if (prev - 1 == prev2) return ""
        return host.substring(prev2)
      }
      if (plain.contains(cand))
        return if (dot == prev) "" else host.substring(prev)
      prev2 = prev
      prev = dot + 1
      dot = host.indexOf('.', dot + 1)
    }
    host
  }

  test("property: chain == native == scala reference under wildcard/exception rules") {
    import spark.implicits._
    val rnd = new Random(1201)
    val labels = Vector("a", "bb", "ck", "www", "city", "kobe", "jp", "",
      "com", "test")
    val rules = Seq("com", "jp", "kyoto.jp",
      "*.ck", "*.kobe.jp", "!www.ck", "!city.kobe.jp")
    assert(rules.size <= Web.WhenChainMaxSuffixes)
    val plain = Set("com", "jp", "kyoto.jp")
    val wild = Set("ck", "kobe.jp")
    val exc = Set("www.ck", "city.kobe.jp")
    val nativeCol =
      graft.functions.RegistrableDomainExpr(col("host"), rules)
    val chainCol = Web.registrableDomain(col("host"), rules)
    for (_ <- 1 to 12) {
      val hosts = List.fill(24)(
        List.fill(1 + rnd.nextInt(5))(labels(rnd.nextInt(labels.size)))
          .mkString("."))
      val rows = hosts.toDF("host")
        .select(nativeCol.as("n"), chainCol.as("c")).collect()
      val native = rows.map(_.getString(0)).toList
      val chain = rows.map(_.getString(1)).toList
      assert(native === chain, s"native != when-chain on hosts=$hosts")
      assert(native === hosts.map(refDomain3(_, plain, wild, exc)),
        s"native != scala reference on hosts=$hosts")
    }
  }

  test("property: chain == native == reference under RANDOM three-rule sets") {
    import spark.implicits._
    // randomize the RULES too (not just the hosts): random plain
    // suffixes over a small label pool, wildcards over random parents,
    // exceptions as one-label extensions of the wildcard parents (the
    // published list's shape, which also guarantees no shadowing)
    val rnd = new Random(1204)
    val labels = Vector("a", "b", "cc", "dd", "e", "")
    for (round <- 1 to 8) {
      def lbl() = labels(rnd.nextInt(labels.size - 1)) // non-empty pool
      val plain0 = (1 to (1 + rnd.nextInt(3))).map(_ =>
        Seq.fill(1 + rnd.nextInt(2))(lbl()).mkString(".")).distinct
      val wildParents0 = (1 to (1 + rnd.nextInt(2))).map(_ =>
        Seq.fill(1 + rnd.nextInt(2))(lbl()).mkString(".")).distinct
        .filterNot(plain0.contains)
      val excs = wildParents0.filter(_ => rnd.nextBoolean())
        .map(p => s"${lbl()}.$p")
      // the published list's invariant, enforced on the generator: no
      // rule extends (shadows) an exception — the one case the chain's
      // exceptions-first order and the walk's longest-first order are
      // allowed to disagree on, excluded by both scaladocs' contract
      def shadows(r: String) = excs.exists(e => r == e || r.endsWith("." + e))
      val plain = plain0.filterNot(shadows)
      val wildParents = wildParents0.filterNot(shadows)
      val rules = plain ++ wildParents.map("*." + _) ++ excs.map("!" + _)
      if (rules.size <= Web.WhenChainMaxSuffixes) {
        val plainSet = plain.toSet
        val wildSet = wildParents.toSet
        val excSet = excs.toSet
        val hosts = List.fill(40)(
          List.fill(1 + rnd.nextInt(5))(labels(rnd.nextInt(labels.size)))
            .mkString("."))
        val rows = hosts.toDF("host")
          .select(
            graft.functions.RegistrableDomainExpr(col("host"), rules).as("n"),
            Web.registrableDomain(col("host"), rules).as("c"),
            graft.functions.PslRuleClassExpr(col("host"), rules).as("kn"),
            Web.pslRuleClass(col("host"), rules).as("kc")).collect()
        val native = rows.map(_.getString(0)).toList
        val chain = rows.map(_.getString(1)).toList
        assert(native === chain, s"round=$round rules=$rules hosts=$hosts")
        assert(native === hosts.map(refDomain3(_, plainSet, wildSet, excSet)),
          s"round=$round native != reference; rules=$rules hosts=$hosts")
        // the CLASS twins must agree too (rules.size ≤ 16 forces the
        // chain path on the Web side, the native expr on the other)
        val classNative = rows.map(_.getString(2)).toList
        val classChain = rows.map(_.getString(3)).toList
        assert(classNative === classChain,
          s"round=$round class native != chain; rules=$rules hosts=$hosts")
      }
    }
  }

  test("plain-only rule lists take the zero-extra-probe fast path unchanged") {
    import spark.implicits._
    // a plain-only list must behave exactly as the round-11 expression
    // (w1/w2's production path): re-pin three round-10 fixture answers
    val hosts = Seq("blog.x.co.uk", "plain.com", "10.0.0.1").toDF("host")
      .select(graft.functions.RegistrableDomainExpr(col("host"),
        Web.DefaultSuffixes).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(hosts === Seq("x.co.uk", "plain.com", "10.0.0.1"))
  }

  test("w4 fixture: every PSL rule class fires visibly (the untested-gate lesson)") {
    val rows = SparkEntry.queries("w4_psl_domains")(spark, TestData.dir("0.001"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    def n(p: ((String, String, String)) => Boolean) = rows.count(p)
    // exception rules resolve hosts at/under them to the rule itself
    assert(n(t => t._3 == "www.ck") > 0, "exception !www.ck never fired")
    assert(n(t => t._3 == "city.kobe.jp") > 0, "exception !city.kobe.jp never fired")
    // wildcard rollups: a *.ck host deeper than the ⟨label⟩.ck suffix
    assert(n(t => t._1.endsWith(".ck") && t._3 != t._1 && t._3 != "www.ck") > 0,
      "wildcard *.ck rollup never fired")
    assert(n(t => t._1.endsWith(".kobe.jp") && t._3 != t._1 &&
      t._3 != "city.kobe.jp") > 0, "wildcard *.kobe.jp rollup never fired")
    // bare wildcard public suffixes are their own domain
    assert(n(t => t._3 == t._1 && (t._1.endsWith(".ck") ||
      t._1.endsWith(".kobe.jp"))) > 0, "bare wildcard suffix never fired")
    // 2-label plain suffix and the no-match identity
    assert(n(t => t._1.endsWith(".kyoto.jp") && t._3 != t._1) > 0,
      "plain kyoto.jp rollup never fired")
    assert(n(t => t._1.endsWith(".example") && t._3 == t._1) > 0,
      "no-match identity never fired")
    // and the two output columns really are two implementations agreeing
    assert(rows.forall(t => t._2 == t._3), "chain != native somewhere")
  }

  // --- ExactSubstr packed-key id domain -------------------------------

  test("packed-key id domain is enforced loudly; unparseable ids quarantine") {
    import spark.implicits._
    import graft.operators.{Decontaminate, Dedup}
    val rep = "alpha beta gamma delta " * 2
    val ok = Seq((1L, rep), (2L, rep)).toDF("doc_id", "text")
    val want = Dedup.duplicateSubstringSpans(ok, k = 4, minCount = 2)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty, "fixture must mark spans")
    // an id at exactly 2^33 would overflow the doc_id*2^30+pos pack and
    // silently corrupt the first-occurrence keeper: the run must FAIL
    val bad = Seq((1L, rep), (1L << 33, rep)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.duplicateSubstringSpans(bad, k = 4, minCount = 2).collect()
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage + Option(t.getCause).map(rootMsg).getOrElse(""))
    assert(rootMsg(e).contains("packed-key id contract"), rootMsg(e).take(400))
    // a NON-NUMERIC string id quarantines (row dropped), never throws —
    // the shared try_cast rule across the round-11/12 operators
    val mixed = Seq(("1", rep), ("2", rep), ("oops", rep))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSubstringSpans(mixed, k = 4, minCount = 2)
      .collect().map(_.toSeq).toSet
    assert(got === want, "quarantine must drop only the malformed row")
    // same rule on the incremental twin and the span decontaminator
    val idx = Dedup.substringGramIndex(mixed, k = 4)
    assert(idx.collect().nonEmpty)
    val inc = Dedup.duplicateSubstringSpansIncremental(
      Seq(("7", rep), ("x", rep)).toDF("doc_id", "text"), idx, k = 4)
      .collect()
    assert(inc.map(_.getLong(0)).toSet === Set(7L))
    val spans = Decontaminate.contaminationSpans(
      mixed, Seq(rep).toDF("text"), k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(spans === Set(1L, 2L))
  }

  test("admission verdicts: the flag-free rows are exactly the keeper set") {
    import graft.operators.Dedup
    // incrementalNearDupVerdicts is d11's audit form: both-flags-false
    // must equal incrementalNearDupNew's keepers row for row, and both
    // rejection reasons must fire on the d11 fixture shape
    val docs = SparkEntry.tbl(spark, TestData.dir("0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % 5 =!= 0).localCheckpoint()
    val fresh = docs.where(col("doc_id") % 5 === 0)
    val incoming = fresh
      .unionByName(corpus.where(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 3000000).as("doc_id"), col("text")))
      .unionByName(fresh.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 4000000).as("doc_id"), col("text")))
      .localCheckpoint()
    val v = Dedup.incrementalNearDupVerdicts(incoming, corpus).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    val keepers = Dedup.incrementalNearDupNew(incoming, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(v.filter(t => !t._2 && !t._3).map(_._1).toSet === keepers)
    assert(v.exists(_._2), "corpus_dup never fired")
    assert(v.exists(_._3), "batch_dup never fired")
    assert(v.map(_._1).toSet === incoming.collect().map(_.getLong(0)).toSet,
      "every arrival gets a verdict")
  }

  test("three-rule native expression stays inside whole-stage codegen") {
    import spark.implicits._
    // the wildcard/exception sets ride the same executor-local constant
    // as the plain set: the projection must still wear a
    // WholeStageCodegen star with no UDF fallback
    val psl = Seq("*.wtld", "!keep.wtld") ++ Web.DefaultSuffixes ++
      (0 until 600).map(i => s"tld$i") ++
      (0 until 600).map(i => s"reg$i.tld${i % 50}")
    assert(psl.size > Web.WhenChainMaxSuffixes)
    // range-backed, not a local Seq: ConvertToLocalRelation would fold
    // a literal table away before any codegen happens
    val df = spark.range(3)
      .select(element_at(typedLit(Seq("a.b.wtld", "x.keep.wtld", "plain.com")),
        (col("id") + 1).cast("int")).as("host"))
      .select(Web.registrableDomain(col("host"), psl).as("rd"),
        Web.pslRuleClass(col("host"), psl).as("cls"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p)
    for (e <- Seq("registrabledomainexpr", "pslruleclassexpr")) {
      val projLine = p.linesIterator.find(_.contains(e))
      assert(projLine.isDefined && projLine.get.trim.startsWith("*("),
        s"$e fell out of whole-stage codegen:\n$p")
    }
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("a.b.wtld", "wildcard"), ("keep.wtld", "exception"),
      ("plain.com", "plain")))
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hardening properties for the round-11 surface: the native PSL
  * expression against an independent Scala reference over random hosts
  * (dense in the degenerate cases — empty labels, bare suffixes,
  * nested suffixes); the streaming domain-cap bounded fold against a
  * sort-the-whole-group reference over random id streams; deep
  * perceptual-hash encode invariance over random contents.
  * Seeded-Random trials, the RetentionPropertySpec house style. */
class Round11PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round11-property-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  /** Independent reference for the registrable-domain contract: walk
    * dots left to right, first (longest) suffix-set hit wins, one
    * label prepended; empty label before the match → "" (the
    * when-chain's regexp_extract no-match value); no match → host. */
  private def refDomain(host: String, suffixes: Set[String]): String = {
    var prevStart = 0
    var dot = host.indexOf('.')
    while (dot >= 0) {
      if (suffixes.contains(host.substring(dot + 1)))
        return if (dot == prevStart) "" else host.substring(prevStart)
      prevStart = dot + 1
      dot = host.indexOf('.', dot + 1)
    }
    host
  }

  test("property: native PSL expression equals when-chain AND the scala reference on random hosts") {
    import spark.implicits._
    val rnd = new Random(1101)
    val labels = Vector("a", "bb", "co", "uk", "com", "x9", "", "site7")
    val suffixes = Seq("co.uk", "com", "uk", "x9.com", "site7")
    // three implementations, two of them genuinely independent of the
    // native one: the production when-chain (regexp_extract semantics
    // — what the DuckDB oracle replays) and a scala fold; all three
    // must agree on every random host, including empty labels, bare
    // suffixes and nested suffixes
    val nativeCol = graft.functions.RegistrableDomainExpr(col("host"), suffixes)
    val chainCol = graft.operators.Web.registrableDomain(col("host"), suffixes)
    assert(suffixes.size <= graft.operators.Web.WhenChainMaxSuffixes,
      "chainCol must exercise the when-chain path")
    for (_ <- 1 to 12) {
      val hosts = List.fill(24)(
        List.fill(1 + rnd.nextInt(5))(labels(rnd.nextInt(labels.size)))
          .mkString("."))
      val rows = hosts.toDF("host")
        .select(nativeCol.as("n"), chainCol.as("c")).collect()
      val native = rows.map(_.getString(0)).toList
      val chain = rows.map(_.getString(1)).toList
      assert(native === chain, s"native != when-chain on hosts=$hosts")
      assert(native === hosts.map(refDomain(_, suffixes.toSet)),
        s"native != scala reference on hosts=$hosts")
    }
  }

  test("property: streaming domain-cap bounded fold equals the sort-based reference") {
    import spark.implicits._
    val rnd = new Random(1102)
    for (_ <- 1 to 10) {
      val ids = List.fill(1 + rnd.nextInt(40))(1L + rnd.nextInt(60))
      val k = 1 + rnd.nextInt(6)
      val urls = ids.map(i => (i, s"https://one.com/p/$i")).toDF("doc_id", "url")
      val got = graft.streaming.StatefulDomainCap
        .admit(urls, "url", "doc_id", k)
        .collect().map(a => (a.doc_id, a.rk)).toSet
      // reference: sort the whole batch, admit the first k distinct
      val want = ids.distinct.sorted.take(k)
        .zipWithIndex.map { case (id, i) => (id, i + 1L) }.toSet
      assert(got === want, s"ids=$ids k=$k")
    }
  }

  test("property: deep perceptual hash is encode-invariant and content-discriminating") {
    import spark.implicits._
    // random contents: PNG and BMP renders of one raster must hash
    // identically band-for-band; distinct contents must not collide on
    // all 8 bands (256 content-random bits)
    val rnd = new Random(1103)
    val cs = Seq.fill(8)(rnd.nextLong(1000000L)).distinct
    val rows = cs.flatMap { c =>
      Seq((2 * c, MediaScaleGen.renderContent(c, "png")),
        (2 * c + 1, MediaScaleGen.renderContent(c, "bmp")))
    }
    val hs = graft.operators.Multimodal
      .perceptualHashesDeep(rows.toDF("media_id", "bytes"))
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong(_)).toList).toMap
    for (c <- cs)
      assert(hs(2 * c) === hs(2 * c + 1), s"content $c: PNG != BMP")
    val distinct = cs.map(c => hs(2 * c)).toSet
    assert(distinct.size === cs.size, "distinct contents collided on all bands")
  }
}

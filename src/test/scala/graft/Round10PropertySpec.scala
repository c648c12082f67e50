package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Hardening properties for the round-10 surface: the ExactSubstr
  * operator is cross-checked against an independent in-memory
  * reference implementation over RANDOM small-vocabulary corpora
  * (where gram collisions are dense and span-merge edge cases — full
  * overlaps, adjacency, whole-doc coverage, within-doc repeats — occur
  * organically), and the keep-first refinement is structurally related
  * to the conservative rule. Seeded-Random trials, the
  * RetentionPropertySpec house style.
  */
class Round10PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round10-property-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  private val K = 3

  /** Random corpus over a TINY vocabulary so k-gram collisions are
    * dense: 2-6 docs of 0-14 tokens drawn from four words. */
  private def randomCorpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("aa", "bb", "cc", "dd")
    (1 to 2 + rnd.nextInt(5)).map { i =>
      val len = rnd.nextInt(15)
      (i.toLong, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  /** Independent reference: tokenize (the operator's contract —
    * lowercase, `[a-zA-Z0-9']+` runs), count k-gram STRINGS corpus-wide
    * (no hashing, so a 60-bit md5 collision would surface as a diff),
    * mark [p, p+k-1] for qualifying occurrences, merge overlapping or
    * adjacent intervals per doc. */
  private def reference(
      docs: Seq[(Long, String)], k: Int,
      keepFirst: Boolean): Set[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[a-zA-Z0-9']+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT))
        .toVector
    }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      p <- 1 to (ts.length - k + 1)
    } yield (ts.slice(p - 1, p + k - 1).mkString(" "), id, p.toLong)
    val byGram = occ.groupBy(_._1).filter(_._2.size >= 2)
    val marks = byGram.values.flatten.toSeq
      .filter { case (g, id, p) =>
        !keepFirst || {
          val first = byGram(g).map(o => (o._2, o._3)).min
          (id, p) != first
        }
      }
      .map { case (_, id, p) => (id, p, p + k - 1) }
    marks.groupBy(_._1).toSeq.flatMap { case (id, ms) =>
      val sorted = ms.map(m => (m._2, m._3)).distinct.sorted
      val merged = sorted.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, (s, e)) =>
          acc.lastOption match {
            case Some((ps, pe)) if s <= pe + 1 =>
              acc.init :+ ((ps, math.max(pe, e)))
            case _ => acc :+ ((s, e))
          }
      }
      merged.map { case (s, e) => (id, s, e) }
    }.toSet
  }

  private def engine(
      docs: Seq[(Long, String)], k: Int,
      keepFirst: Boolean): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Dedup.duplicateSubstringSpans(
        docs.toDF("doc_id", "text").repartition(3), k = k,
        keepFirst = keepFirst)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("duplicateSubstringSpans matches the unhashed reference on random corpora") {
    (1 to 25).foreach { seed =>
      val docs = randomCorpus(seed)
      assert(engine(docs, K, keepFirst = false) ===
        reference(docs, K, keepFirst = false), s"seed=$seed docs=$docs")
    }
  }

  test("keepFirst matches the reference and only ever unmarks") {
    (100 to 120).foreach { seed =>
      val docs = randomCorpus(seed)
      val kf = engine(docs, K, keepFirst = true)
      val ref = reference(docs, K, keepFirst = true)
      assert(kf === ref, s"seed=$seed docs=$docs")
      // every keep-first span lies inside some conservative span: the
      // refinement removes marks, never adds or widens
      val cons = reference(docs, K, keepFirst = false)
      assert(kf.forall { case (id, s, e) =>
        cons.exists { case (id2, s2, e2) => id2 == id && s2 <= s && e <= e2 }
      }, s"seed=$seed")
    }
  }

  /** In-memory reference for calibrationBins' integer contract:
    * min-max pred ppm, equal-width bins, per-bin stats, weighted-L1
    * ECE — all BigInt floor division, independently re-derived. */
  private def calibrationReference(
      rows: Seq[(Long, Long)], bins: Int): Map[Int, (Long, Long, Long, Long, Long, Long)] = {
    if (rows.isEmpty) return Map.empty
    val mn = rows.map(_._1).min
    val mx = rows.map(_._1).max
    def pred(sc: Long): Long =
      if (mx == mn) 500000L
      else ((BigInt(sc) - mn) * 1000000 / (BigInt(mx) - mn)).toLong
    val binned = rows.map { case (sc, lb) =>
      val p = pred(sc)
      (math.min((p * bins / 1000000).toInt, bins - 1) + 1, p, lb)
    }
    val g = binned.groupBy(_._1).map { case (b, xs) =>
      val n = xs.size.toLong
      val np = xs.map(_._3).sum
      val mp = (xs.map(x => BigInt(x._2)).sum / n).toLong
      val pr = (BigInt(np) * 1000000 / n).toLong
      b -> (n, np, mp, pr, pr - mp)
    }
    val tot = g.values.map(_._1).sum
    val ece = (g.values.map(v => BigInt(v._1) * BigInt(v._5).abs).sum / tot).toLong
    g.map { case (b, (n, np, mp, pr, gp)) => b -> ((n, np, mp, pr, gp, ece)) }
  }

  test("calibrationBins matches the BigInt reference on random score/label sets") {
    import spark.implicits._
    (30 to 45).foreach { seed =>
      val rnd = new Random(seed)
      val rows = (1 to 5 + rnd.nextInt(200)).map { _ =>
        // scores span negatives and ties; labels loosely correlate
        val sc = rnd.nextInt(2001) - 1000L
        val lb = if (rnd.nextInt(2000) < sc + 1000) 1L else 0L
        (sc, lb)
      }
      val got = graft.operators.Profile
        .calibrationBins(rows.toDF("score", "label"), "score", "label")
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      assert(got === calibrationReference(rows, 10), s"seed=$seed")
    }
  }

  /** Random URL generator covering the whole hazard space the
    * normalizer contracts over — the fixture divisor chain's hazards,
    * drawn freely instead of deterministically. */
  private def randomUrl(rnd: Random): String = {
    def pick[T](xs: Seq[T]) = xs(rnd.nextInt(xs.size))
    val scheme = pick(Seq("http", "https", "HTTP", "HTTPS", "Http"))
    val www = pick(Seq("", "www.", "WWW."))
    val sub = pick(Seq("", "blog.", "news.", "a.b."))
    val site = s"site${rnd.nextInt(12)}"
    val tld = pick(Seq(".com", ".org", ".io", ".co.uk"))
    val port = pick(Seq("", ":80", ":443", ":8080"))
    val path = pick(Seq("", "/", s"/p/${rnd.nextInt(40)}", s"/p/${rnd.nextInt(40)}/"))
    val query = pick(Seq("", "?a=1", "?utm_x=9", "?b=2&a=1&utm_s=f",
      s"?id=${rnd.nextInt(20)}&utm_campaign=z"))
    val frag = pick(Seq("", "#sec", "#x"))
    s"$scheme://$www$sub$site$tld$port$path$query$frag"
  }

  test("normalizeUrls never throws on malformed input and keeps every row") {
    import spark.implicits._
    val garbage = Seq(
      "", "://", "http://", "not a url at all", "http:///path",
      "https://:8080", "ftp://weird.scheme.site/x", "http://h?&&&",
      "http://h#only-frag", "a://b://c", "http://h:notaport/p",
      "?", "#", "http://h:80:90/p", "https://h/p?a=&b", "x" * 3000
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val out = graft.operators.Web
      .normalizeUrls(garbage.toDF("id", "url"), "url")
      .select("id", "norm_url", "host", "had_tracking").collect()
    // one output row per input row, no exception, no NULL host for
    // non-null input (the regexes degrade to empty strings, never fail)
    assert(out.length === garbage.length)
    assert(out.forall(r => !r.isNullAt(2)))
    // and NULL input stays a quarantine row
    val nul = graft.operators.Web
      .normalizeUrls(Seq((99L, null.asInstanceOf[String])).toDF("id", "url"), "url")
      .select("norm_url", "host").collect().head
    assert(nul.isNullAt(0) && nul.isNullAt(1))
  }

  test("domainCap under pathological skew: one mega-domain, bounded output, exact ranks") {
    import spark.implicits._
    // 1 domain holds 5,000 docs; 50 domains hold 2 each — the crawl
    // reality the bounded aggregate exists for
    val urls = ((0L until 5000L).map(i => (i, s"https://mega.com/p/$i")) ++
      (0L until 100L).map(i => (10000L + i, s"https://tiny${i % 50}.org/p/$i")))
      .toDF("doc_id", "url")
    val out = graft.operators.Web.domainCap(urls, "url", "doc_id", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byDom = out.groupBy(_._1)
    assert(byDom("mega.com").length === 4)
    assert(byDom.size === 51)
    assert(out.length === 4 + 50 * 2)
    // ranks dense 1..min(k, n) per domain
    assert(byDom.forall { case (_, xs) =>
      xs.map(_._3).sorted.toList == (1 to xs.length).toList })
    // equal to the window form on the mega-domain
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("reg_domain")).orderBy(col("_ck"), col("doc_id"))
    val windowed = graft.operators.Web.normalizeUrls(urls, "url")
      .withColumn("reg_domain", graft.operators.Web.registrableDomain(col("host")))
      .withColumn("_ck", graft.operators.Dedup.hash60(
        concat(lit("cap|"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 4)
      .where(col("reg_domain") === "mega.com")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk"))).toSet
    assert(byDom("mega.com").map(x => (x._2, x._3)).toSet === windowed)
  }

  test("normalizeUrls is idempotent: canonical output is its own fixpoint") {
    import spark.implicits._
    val rnd = new Random(7)
    val urls = (1 to 400).map(i => (i.toLong, randomUrl(rnd)))
      .toDF("id", "url")
    val once = graft.operators.Web.normalizeUrls(urls, "url")
      .select(col("id"), col("norm_url"))
    val twice = graft.operators.Web
      .normalizeUrls(once.withColumnRenamed("norm_url", "url"), "url")
      .select(col("id"), col("norm_url").as("norm2"))
    val diff = once.join(twice, "id")
      .where(col("norm_url") =!= col("norm2")).collect()
    assert(diff.isEmpty,
      diff.take(5).map(_.toString).mkString("not idempotent on: ", ", ", ""))
    // and a re-normalized URL never reports tracking (utm_* is gone)
    val re = graft.operators.Web
      .normalizeUrls(once.withColumnRenamed("norm_url", "url"), "url")
    assert(re.where(col("had_tracking")).count() === 0)
  }

  test("registrableDomain is invariant under normalization-preserved subdomains") {
    import spark.implicits._
    val rnd = new Random(11)
    val urls = (1 to 300).map(i => (i.toLong, randomUrl(rnd))).toDF("id", "url")
    val n = graft.operators.Web.normalizeUrls(urls, "url")
      .withColumn("rd", graft.operators.Web.registrableDomain(col("host")))
    // the registrable domain never keeps a www/blog/news/a.b prefix
    // and always ends in a known public suffix with exactly one extra
    // label
    val bad = n.where(!col("rd").rlike("^site[0-9]+\\.(com|org|io|co\\.uk)$"))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString(", "))
  }
}

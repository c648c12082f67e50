package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Basket, Dedup, Graph, Layout}

/** Randomized-correctness properties for the round-5 operators, checked
  * against independent in-driver reimplementations on seeded random
  * inputs — failures are reproducible from the printed seed.
  */
class Round5PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round5-prop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  test("globalRank equals the single-window row_number on random data, any buckets") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      // duplicates on purpose: values drawn from a small range
      val rows = (0L until 300L).map(i => (i, rnd.nextInt(40) - 20.0 + (if (rnd.nextBoolean()) 0.5 else 0.0)))
      val df = rows.toDF("id", "v").repartition(7)
      val expected = df.withColumn("rank",
          row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val buckets = 1 + rnd.nextInt(64)
      val got = Layout.globalRank(df, "v", "id", buckets).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected, s"seed=$seed buckets=$buckets")
    }
  }

  test("triangleCounts equals brute-force enumeration on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 12
      val edges = (0 until 40).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val und = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
      val expected = (for {
        a <- 0L until n.toLong; b <- a + 1 until n.toLong; c <- b + 1 until n.toLong
        if und((a, b)) && und((b, c)) && und((a, c))
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = Graph.triangleCounts(edges.toDF("src", "dst")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("sortedNeighborhood pairs are sound: every pair is within maxDist on its prefixes") {
    import spark.implicits._
    val rnd = new Random(7)
    val alphabet = "abcdef"
    def txt(): String = Seq.fill(6 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size))).mkString
    val docs = (0L until 120L).map(i => (i, txt()))
    val byId = docs.toMap
    def pfx(s: String) = s.toLowerCase.replaceAll("[^a-z0-9]", "").take(40)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val pairs = Dedup.sortedNeighborhoodPairs(docs.toDF("doc_id", "text"),
      window = 4, maxDist = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.foreach { case (lo, hi, dist) =>
      val d = lev(pfx(byId(lo)), pfx(byId(hi)))
      assert(d.toLong === dist && d <= 8, s"pair ($lo,$hi) claims $dist, truth $d")
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length === pairs.length,
      "no duplicate unordered pairs")
  }

  test("pairLift identities: support*n_baskets == n_ab, lift consistent with margins") {
    import spark.implicits._
    val rnd = new Random(11)
    val items = Seq("a", "b", "c", "d")
    val ev = (0 until 400).map { _ =>
      (rnd.nextInt(12).toLong, s"2024-01-${1 + rnd.nextInt(9)} 0${rnd.nextInt(10)}:00:00",
        items(rnd.nextInt(items.size)))
    }.toDF("user_id", "ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    // independent recomputation of the basket model
    val baskets = ev.select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct().collect().map(r => ((r.getLong(0), r.getDate(1).toString), r.getString(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nB = baskets.size.toLong
    def nItem(i: String) = baskets.values.count(_(i)).toLong
    def nAb(a: String, b: String) = baskets.values.count(s => s(a) && s(b)).toLong
    val got = Basket.pairLift(ev).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b, ab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b && ab === nAb(a, b), s"pair counts ($a,$b)")
      assert(r.getLong(3) === ab * 1000000L / nB)
      assert(r.getLong(4) === ab * 1000000L / nItem(a))
      assert(r.getLong(5) === (BigInt(ab) * nB * 1000000 / (BigInt(nItem(a)) * nItem(b))).toLong)
    }
  }

  test("personalized pagerank never exceeds total restart mass") {
    import spark.implicits._
    for (seed <- 1 to 2) {
      val rnd = new Random(seed)
      val edges = (0 until 30).map(_ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong, 1L + rnd.nextInt(5)))
        .filter(e => e._1 != e._2)
      val seeds = Seq(0L, 1L)
      val total = Graph.personalizedPageRankPpm(edges.toDF("src", "dst", "w"), seeds)
        .agg(sum(col("rank_ppm"))).head().getLong(0)
      // floor divisions only ever LOSE mass relative to the exact walk
      assert(total <= 1000000L, s"seed=$seed total=$total")
      assert(total > 0L)
    }
  }
}

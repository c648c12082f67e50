package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming == batch parity: the same EventStream transforms run once
  * through a file-source → memory-sink streaming query and once as plain
  * batch, and must agree. (Spark guarantees unified semantics; this
  * asserts our transforms don't break it with side effects.)
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** events.parquet with ts converted to a real timestamp, staged into a
    * fresh dir so readStream can treat it as a file source. */
  private lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    SparkEntry.tbl(spark, TestData.dir("0.001"), "events")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts: stream equals batch") {
    val schema = spark.read.parquet(stagedDir).schema
    val stream = spark.readStream.schema(schema).parquet(stagedDir)
    val q = EventStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = EventStream.windowedCounts(spark.read.parquet(stagedDir)).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful retention (mapGroupsWithState): stream == batch == UDAF") {
    import graft.streaming.StatefulRetention
    val schema = spark.read.parquet(stagedDir).schema
    val stream = spark.readStream.schema(schema).parquet(stagedDir)
    val q = StatefulRetention.perUserStats(stream, "2024-01-01", 7, "signup", "purchase")
      .toDF()
      .writeStream.format("memory").queryName("ret").outputMode("update").start()
    try {
      q.processAllAvailable()
      // state is monotone, so the last emission per user is the answer;
      // reduce emissions by elementwise max to stay multi-batch-safe
      def emax(a: Seq[Seq[Long]], b: Seq[Seq[Long]]): Seq[Seq[Long]] =
        a.zip(b).map { case (x, y) => x.zip(y).map(t => t._1 max t._2) }
      val streamed = spark.table("ret").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[scala.collection.Seq[Long]](1).toSeq.map(_.toSeq))
        .groupMapReduce(_._1)(_._2)(emax)
      val batch = StatefulRetention
        .perUserStats(spark.read.parquet(stagedDir), "2024-01-01", 7, "signup", "purchase")
        .collect().map(s => s.user_id -> s.stats.map(_.toSeq)).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // and both match the batch UDAF (the reference operator) on the
      // same window — custom streaming state reproduces retention_count
      Graft.registerAll(spark)
      val udaf = SparkEntry.queries("retention_count")(spark, TestData.dir("0.001"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val asJson = streamed.map { case (u, s) =>
        u -> s.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      }
      assert(asJson === udaf)
    } finally q.stop()
  }

  test("stateful funnel (flatMapGroupsWithState): stream == batch operator") {
    import graft.streaming.StatefulFunnel
    val steps = Seq("signup", "click", "purchase")
    val schema = spark.read.parquet(stagedDir).schema
    val stream = spark.readStream.schema(schema).parquet(stagedDir)
    val q = StatefulFunnel.perUserStages(stream, steps).toDF()
      .writeStream.format("memory").queryName("fun").outputMode("update").start()
    try {
      q.processAllAvailable()
      // last emission per user wins; with buffered state later emissions
      // supersede earlier ones, and stage counts only grow
      val streamed = spark.table("fun").collect()
        .map(r => r.getLong(0) -> r.getInt(1))
        .groupMapReduce(_._1)(_._2)(_ max _)
      val batch = graft.operators.Funnel
        .userStages(spark.read.parquet(stagedDir), steps)
        .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("session windows: stream equals batch") {
    val schema = spark.read.parquet(stagedDir).schema
    val stream = spark.readStream.schema(schema).parquet(stagedDir)
    val q = EventStream.sessions(stream)
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = EventStream.sessions(spark.read.parquet(stagedDir)).collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}

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

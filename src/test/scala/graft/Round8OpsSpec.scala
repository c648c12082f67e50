package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Paths

/** Behavior specs for the round-8 hardening: the behaviorTwins
  * broadcast-side contract (the query-user set must stay
  * broadcast-small; a caller with a corpus-sized set must be refused,
  * not silently broadcast it).
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

  test("behaviorTwins refuses a corpus-sized query-user set with batching advice") {
    import spark.implicits._
    val events = Seq((1L, "a", "2024-01-01 00:00:00", 1L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val tooMany = (1L to (Paths.MaxQueryUsers + 1L)).toSeq
    val e = intercept[IllegalArgumentException] {
      Paths.behaviorTwins(events, tooMany)
    }
    assert(e.getMessage.contains("MaxQueryUsers"))
    assert(e.getMessage.contains("batches"))
    // at the cap the plan still constructs (no action run — just the
    // contract boundary)
    val ok = Paths.behaviorTwins(events, (1L to Paths.MaxQueryUsers.toLong).toSeq)
    assert(ok.columns.toSeq ===
      Seq("query_user", "neighbor_user", "n_shared", "jaccard_ppm", "rank"))
  }
}

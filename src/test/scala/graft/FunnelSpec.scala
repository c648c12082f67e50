package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("funnel-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = {
    import spark.implicits._
    Seq(
      // user 1: full conversion in order
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-02 10:00:00")),
      (1L, "purchase", ts("2024-01-03 10:00:00")),
      // user 2: purchase BEFORE click — ordered funnel must not count it
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-02 09:00:00")),
      (2L, "click", ts("2024-01-02 10:00:00")),
      // user 3: click outside the 7-day window
      (3L, "signup", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-20 10:00:00")),
      // user 4: never signs up — not in the funnel at all
      (4L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts").repartition(2)
  }

  test("ordered funnel: order and window are enforced, earliest timestamps kept") {
    val st = Funnel.userStages(events, Seq("signup", "click", "purchase"), 7)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(st === Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("report counts are monotone and match stages") {
    val r = Funnel.report(events, Seq("signup", "click", "purchase"), 7).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 3L, 2L, 1L)))
  }

  test("same-timestamp step events qualify (>= boundary)") {
    import spark.implicits._
    val e = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val st = Funnel.userStages(e, Seq("signup", "click"), 7).collect()
    assert(st.head.getInt(3) === 2)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Golden-table tests for the retention aggregates, values copied verbatim
  * from the reference's test suites (reference: tests/retention_count.rs,
  * tests/retention_sum.rs, tests/sqllogictests/test_files/retention.slt).
  */
class RetentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("retention-spec")
      // 4 target partitions, as the reference slt harness fixes
      // (tests/sqllogictests/src/main.rs:242-244).
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  /** The canonical 5-row event table split across 2 partitions to exercise
    * partial/final aggregation (reference: examples/retention.rs:59-75).
    */
  private def eventDf: DataFrame = {
    val rows = Seq(
      (1, "add", 20230101), (1, "add", 20230102), (1, "buy", 20230101),
      (2, "add", 20230101), (2, "buy", 20230102))
    import spark.implicits._
    rows.toDF("distinct_id", "event", "ds").repartition(2)
  }

  private def statsOf(df: DataFrame): Map[Int, Seq[Seq[Byte]]] =
    df.collect().map { r =>
      r.getInt(0) -> r.getSeq[scala.collection.Seq[Byte]](1).toSeq.map(_.toSeq)
    }.toMap

  test("retention_count 2-day window (examples/retention.rs golden)") {
    eventDf.createOrReplaceTempView("event")
    val df = spark.sql(
      """select distinct_id, retention_count(
        |  case when event='add' then true else false end,
        |  case when event='buy' then true else false end,
        |  20230102-20230101,
        |  ds-20230101) as stats
        |from event group by distinct_id order by distinct_id""".stripMargin)
    val got = statsOf(df)
    assert(got(1) === Seq(Seq[Byte](1, 1), Seq[Byte](1, 0)))
    assert(got(2) === Seq(Seq[Byte](1, 0), Seq[Byte](0, 1)))
  }

  test("retention_count 1-day window (retention.slt happy path)") {
    import spark.implicits._
    Seq(
      (1, "add", 20230101), (2, "add", 20230101), (3, "add", 20230101),
      (1, "buy", 20230101), (2, "buy", 20230101), (3, "buy", 20230101))
      .toDF("distinct_id", "event", "ds").repartition(2)
      .createOrReplaceTempView("event_slt")
    val got = statsOf(spark.sql(
      """select distinct_id, retention_count(
        |  case when event='add' and ds=20230101 then true else false end,
        |  case when event='buy' and ds between 20230101 and 20230102 then true else false end,
        |  20230101-20230101,
        |  ds-20230101) as stats
        |from event_slt group by distinct_id""".stripMargin))
    assert(got === Map(
      1 -> Seq(Seq[Byte](1), Seq[Byte](1)),
      2 -> Seq(Seq[Byte](1), Seq[Byte](1)),
      3 -> Seq(Seq[Byte](1), Seq[Byte](1))))
  }

  test("retention_count user never fires born event (retention.slt error case)") {
    import spark.implicits._
    Seq(
      (1, "error", 20230101), (2, "add", 20230101), (3, "add", 20230101),
      (1, "buy", 20230101), (2, "buy", 20230101), (3, "buy", 20230101))
      .toDF("distinct_id", "event", "ds").repartition(2)
      .createOrReplaceTempView("event_error")
    val got = statsOf(spark.sql(
      """select distinct_id, retention_count(
        |  case when event='add' and ds=20230101 then true else false end,
        |  case when event='buy' and ds between 20230101 and 20230102 then true else false end,
        |  20230101-20230101,
        |  ds-20230101) as stats
        |from event_error group by distinct_id""".stripMargin))
    assert(got(1) === Seq(Seq[Byte](0), Seq[Byte](1)))
    assert(got(2) === Seq(Seq[Byte](1), Seq[Byte](1)))
    assert(got(3) === Seq(Seq[Byte](1), Seq[Byte](1)))
  }

  test("retention_count born and target are the same event (marker 2)") {
    // reference: tests/retention_count.rs:134-194 — same event as both born
    // and target produces the 2-marker on every fired day.
    import spark.implicits._
    Seq((1, "add", 20230101), (1, "add", 20230102), (2, "add", 20230101),
      (2, "add", 20230102))
      .toDF("distinct_id", "event", "ds").repartition(2)
      .createOrReplaceTempView("event_same")
    val got = statsOf(spark.sql(
      """select distinct_id, retention_count(
        |  case when event='add' then true else false end,
        |  case when event='add' then true else false end,
        |  20230102-20230101,
        |  ds-20230101) as stats
        |from event_same group by distinct_id""".stripMargin))
    assert(got(1) === Seq(Seq[Byte](1, 1), Seq[Byte](2, 2)))
    assert(got(2) === Seq(Seq[Byte](1, 1), Seq[Byte](2, 2)))
  }

  private def triangleOf(df: DataFrame): Seq[Seq[Long]] =
    df.collect().head.getSeq[scala.collection.Seq[Long]](0).toSeq.map(_.toSeq)

  private def statsDf(rows: Seq[(Int, Seq[Seq[Int]])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, m) => (id, m.map(_.map(_.toByte))) }
      .toDF("distinct_id", "stats").repartition(2)
  }

  test("retention_sum 1-day golden (tests/retention_sum.rs:148-250)") {
    statsDf(Seq(1 -> Seq(Seq(1), Seq(1)), 2 -> Seq(Seq(1), Seq(1))))
      .createOrReplaceTempView("rc_1day")
    val got = triangleOf(spark.sql("select retention_sum(stats) from rc_1day"))
    assert(got === Seq(Seq(2L), Seq(2L)))
  }

  test("retention_sum 2-day golden (tests/retention_sum.rs:252-367)") {
    statsDf(Seq(
      1 -> Seq(Seq(1, 1), Seq(1, 0)),
      2 -> Seq(Seq(1, 0), Seq(0, 1))))
      .createOrReplaceTempView("rc_2day")
    val got = triangleOf(spark.sql("select retention_sum(stats) from rc_2day"))
    assert(got === Seq(Seq(2L, 1L), Seq(1L, 1L), Seq(0L)))
  }

  test("retention_sum 3-day golden (tests/retention_sum.rs:369-488)") {
    statsDf(Seq(
      1 -> Seq(Seq(1, 1, 1), Seq(1, 1, 0)),
      2 -> Seq(Seq(1, 0, 0), Seq(0, 0, 1))))
      .createOrReplaceTempView("rc_3day")
    val got = triangleOf(spark.sql("select retention_sum(stats) from rc_3day"))
    assert(got === Seq(Seq(2L, 1L, 1L), Seq(1L, 1L, 1L), Seq(1L, 0L), Seq(0L)))
  }

  test("retention_sum same-born-target golden (tests/retention_sum.rs:30-145)") {
    statsDf(Seq(
      1 -> Seq(Seq(1, 1), Seq(2, 2)),
      2 -> Seq(Seq(1, 1), Seq(2, 2))))
      .createOrReplaceTempView("rc_same")
    val got = triangleOf(spark.sql("select retention_sum(stats) from rc_same"))
    assert(got === Seq(Seq(2L, 2L), Seq(0L, 2L), Seq(0L)))
  }

  test("composed retention_sum(retention_count(...)) subquery (retention.slt:46-56)") {
    import spark.implicits._
    Seq(
      (1, "add", 20230101), (2, "add", 20230101), (3, "add", 20230101),
      (1, "buy", 20230101), (2, "buy", 20230101), (3, "buy", 20230101))
      .toDF("distinct_id", "event", "ds").repartition(2)
      .createOrReplaceTempView("event_compose")
    val got = triangleOf(spark.sql(
      """select retention_sum(stats) from (
        |  select distinct_id, retention_count(
        |    case when event='add' and ds=20230101 then true else false end,
        |    case when event='buy' and ds between 20230101 and 20230102 then true else false end,
        |    20230101-20230101,
        |    ds-20230101) as stats
        |  from event_compose group by distinct_id)""".stripMargin))
    assert(got === Seq(Seq(3L), Seq(3L)))
  }

  test("materialize-and-requery pipeline (examples/retention.rs:22-46)") {
    eventDf.createOrReplaceTempView("event_mat")
    val stage1 = spark.sql(
      """select distinct_id, retention_count(
        |  case when event='add' then true else false end,
        |  case when event='buy' then true else false end,
        |  20230102-20230101,
        |  ds-20230101) as stats
        |from event_mat group by distinct_id order by distinct_id""".stripMargin)
    stage1.cache().createOrReplaceTempView("retention_count_result")
    val got = triangleOf(
      spark.sql("select retention_sum(stats) from retention_count_result"))
    assert(got === Seq(Seq(2L, 1L), Seq(1L, 1L), Seq(0L)))
  }

  test("out-of-window time_diff fails with a clear contract error") {
    // the reference panics on out-of-range offsets (retention_count.rs:
    // 103-111 index out of bounds); we mirror with an explicit exception
    // telling callers to pre-filter, per SURVEY §7.4.3
    import spark.implicits._
    Seq((1, "add", 20230105)) // ds outside the 2-day window
      .toDF("distinct_id", "event", "ds").repartition(2)
      .createOrReplaceTempView("event_oob")
    val e = intercept[Exception] {
      spark.sql(
        """select distinct_id, retention_count(
          |  event='add', event='buy', 1L, cast(ds - 20230101 as bigint)) as stats
          |from event_oob group by distinct_id""".stripMargin).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("pre-filter the time column")),
      s"expected the retention window contract error, got: $e")
  }

  test("golden pretty-table comparator (assert_batches_eq analogue)") {
    // reference: src/test_util/mod.rs:32-93 — the rendered-table contract,
    // with the sorted variant for order-insensitive grouping output
    eventDf.createOrReplaceTempView("event_golden")
    val df = spark.sql(
      """select distinct_id, retention_count(
        |  case when event='add' then true else false end,
        |  case when event='buy' then true else false end,
        |  20230102-20230101,
        |  ds-20230101) as stats
        |from event_golden group by distinct_id order by distinct_id""".stripMargin)
    GoldenTable.assertEq(Seq(
      "+-------------+------------------+",
      "| distinct_id | stats            |",
      "+-------------+------------------+",
      "| 1           | [[1, 1], [1, 0]] |",
      "| 2           | [[1, 0], [0, 1]] |",
      "+-------------+------------------+"), df)
    GoldenTable.assertSortedEq(Seq(
      "+-------------+------------------+",
      "| distinct_id | stats            |",
      "+-------------+------------------+",
      "| 2           | [[1, 0], [0, 1]] |",
      "| 1           | [[1, 1], [1, 0]] |",
      "+-------------+------------------+"), df)
  }

  test("DataFrame column API mirrors SQL results") {
    import org.apache.spark.sql.functions._
    import graft.operators.Retention._
    val df = eventDf
      .groupBy(col("distinct_id"))
      .agg(retention_count(
        col("event") === "add", col("event") === "buy",
        lit(1L), (col("ds") - lit(20230101)).cast("long")).as("stats"))
    val got = statsOf(df)
    assert(got(1) === Seq(Seq[Byte](1, 1), Seq[Byte](1, 0)))
    assert(got(2) === Seq(Seq[Byte](1, 0), Seq[Byte](0, 1)))
  }
}

package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft

/** The reference's two examples as one runnable main (reference:
  * examples/retention.rs, examples/retention_parquet.rs): the in-memory
  * 5-row pipeline with materialize-and-requery, then the parquet-scan
  * 7-day retention over the events table.
  *
  * Run: `sbt "runMain graft.examples.RetentionExample [sfDir]"`.
  */
object RetentionExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.localSession("retention-example", cores = 4, shufflePartitions = 4)
    import spark.implicits._

    // In-memory event table, 2 partitions (examples/retention.rs:59-82).
    Seq(
      (1, "add", 20230101), (1, "add", 20230102), (1, "buy", 20230101),
      (2, "add", 20230101), (2, "buy", 20230102))
      .toDF("distinct_id", "event", "ds").repartition(2)
      .createOrReplaceTempView("event")

    val stage1 = spark.sql(
      """select distinct_id, retention_count(
        |  case when event='add' then true else false end,
        |  case when event='buy' then true else false end,
        |  20230102-20230101,
        |  ds-20230101) as stats
        |from event group by distinct_id order by distinct_id""".stripMargin)
    stage1.show(false)

    stage1.cache().createOrReplaceTempView("retention_count_result")
    spark.sql("select retention_sum(stats) from retention_count_result").show(false)

    // Parquet pipeline over the events table, 7-day window
    // (examples/retention_parquet.rs:14-54).
    graft.SparkEntry.tbl(spark, sfDir, "events").createOrReplaceTempView("events")
    spark.sql(
      """select retention_sum(stats) as triangle from (
        |  select user_id, retention_count(
        |    event_type = 'signup',
        |    event_type = 'purchase',
        |    CAST(6 AS BIGINT),
        |    CAST(datediff(to_date(ts), date'2024-01-01') AS BIGINT)) as stats
        |  from events
        |  where ts >= timestamp'2024-01-01' and ts < timestamp'2024-01-08'
        |  group by user_id)""".stripMargin).show(false)

    spark.stop()
  }
}

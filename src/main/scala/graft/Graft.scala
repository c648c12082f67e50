package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Retention

/** Session facade for the graft engine — the analogue of the reference's
  * `SessionContext` setup + `register_udaf` calls
  * (reference: examples/retention.rs:17-20,
  * tests/sqllogictests/src/main.rs:241-283).
  */
object Graft {

  /** Builds a local session tuned for this machine. On a real cluster the
    * caller owns the builder and only needs [[registerAll]].
    */
  def localSession(
      appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    registerAll(spark)
    spark
  }

  /** Registers every SQL-callable function the library provides. */
  def registerAll(spark: SparkSession): Unit = {
    Retention.register(spark)
    graft.functions.LongArrayDot.register(spark)
  }
}

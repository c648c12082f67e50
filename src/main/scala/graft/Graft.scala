package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.LongArrayDot
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
    spark.sparkContext.setLogLevel("WARN")
    registerAll(spark)
    spark
  }

  /** Registers every SQL-callable function the library provides. */
  def registerAll(spark: SparkSession): Unit = {
    Retention.register(spark)
    LongArrayDot.register(spark)
  }
}

/** Config-based injection: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes the library's native expressions available in every session of a
  * cluster without code changes (the deployment-style analogue of
  * [[Graft.registerAll]]; the Aggregator-based UDAFs still need the
  * session-level `registerAll` because `functions.udaf` registration is
  * per-session by design).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(LongArrayDot.name),
      new ExpressionInfo(classOf[graft.functions.LongArrayDot].getName, LongArrayDot.name),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.LongArrayDot(exprs(0), exprs(1))))
  }
}

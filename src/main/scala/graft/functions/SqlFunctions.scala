package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge

/** SQL registration for the library's composed (Column-level) functions —
  * the text/quality/PII surface becomes callable from `spark.sql` the way
  * the reference exposes its UDAFs to SQL (reference:
  * tests/sqllogictests/src/main.rs:241-283).
  *
  * Each builder expands the SAME native Catalyst tree the Scala API
  * produces (via the classic Column↔Expression bridge), so a SQL call
  * plans, optimizes, and codegens identically to its DataFrame form — no
  * UDF wrapper, no extra serialization, nothing opaque to the optimizer.
  */
object SqlFunctions {

  /** (name, arity, Column-composition) for every scalar SQL function the
    * library exposes — consumed by both the session-level registration
    * below and the `spark.sql.extensions` injection
    * ([[graft.GraftExtensions]]). */
  val all: Seq[(String, Int, Seq[Column] => Column)] = Seq(
    ("token_count", 1, cs => Text.tokenCount(cs(0))),
    ("lang_id", 1, cs => Text.langId(cs(0))),
    ("quality_score", 1, cs => Text.qualityScore(cs(0))),
    ("doc_hash", 1, cs => Text.docHash(cs(0))),
    ("pii_scrub", 1, cs => Pii.scrub(cs(0))),
    ("pii_email_count", 1, cs => Pii.emailCount(cs(0))),
    ("pii_ipv4_count", 1, cs => Pii.ipv4Count(cs(0))),
    ("pii_phone_count", 1, cs => Pii.phoneCount(cs(0))),
    ("registrable_domain", 1, cs => graft.operators.Web.registrableDomain(cs(0))))

  /** Expression builder for one entry of [[all]]. */
  def builder(name: String, arity: Int, f: Seq[Column] => Column)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == arity,
      s"$name expects $arity argument(s), got ${exprs.length}")
    ColumnBridge.expression(f(exprs.map(ColumnBridge.column)))
  }

  /** Registers the scalar SQL surface: text analysis, quality gates,
    * PII scrubbing. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, arity, f) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder(name, arity, f), "scala_udf")
    }
}

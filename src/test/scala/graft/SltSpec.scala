package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.slt.SltRunner

/** Drives [[graft.slt.SltRunner]] — the Spark analogue of the reference's
  * sqllogictest harness (reference: tests/sqllogictests/src/main.rs).
  * `retention.slt` is the reference's file, copied verbatim.
  */
class SltSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("slt")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  // slt corpus lives in the source tree (completion mode rewrites files
  // in place, so the spec works on real paths, not classpath resources)
  private val sltDir = Paths.get(sys.props("user.dir"), "src", "test", "resources", "slt")

  test("retention.slt (reference corpus, verbatim)") {
    val n = SltRunner.runDir(spark, sltDir, filters = Seq("retention"))
    assert(n === 3) // the reference file's three query records
  }

  test("scalar.slt (graft corpus: floats, NaN, dates, valuesort, statement error)") {
    val n = SltRunner.runDir(spark, sltDir, filters = Seq("scalar"))
    assert(n === 5)
  }

  test("text_functions.slt (SQL surface of the text/PII scalar functions)") {
    val n = SltRunner.runDir(spark, sltDir, filters = Seq("text_functions"))
    assert(n === 5) // 5 query records (+1 statement-ok, +1 statement-error)
  }

  test("relational.slt (ROLLUP, set ops, window, PIVOT through the harness)") {
    val n = SltRunner.runDir(spark, sltDir, filters = Seq("relational"))
    assert(n === 5)
  }

  test("native_functions.slt (SQL surface of the codegen sketch expressions)") {
    val n = SltRunner.runDir(spark, sltDir, filters = Seq("native_functions"))
    assert(n === 10) // + round-10 positional_gram_hashes/unicode + round-11 registrable_domain
  }

  test("discovery walks the whole corpus; filters by substring") {
    // retention(3) + scalar(5) + text_functions(5) + relational(5) +
    // native_functions(10)
    assert(SltRunner.runDir(spark, sltDir) === 28)
    assert(SltRunner.discover(sltDir, Seq("no_such_file")).isEmpty)
  }

  test("completion mode regenerates retention.slt byte-identically") {
    val p = sltDir.resolve("retention.slt")
    val original = Files.readAllLines(p).asScala.toVector
    val s = spark.newSession()
    Graft.registerAll(s)
    val regenerated = SltRunner.completeFile(s, original)
    assert(regenerated === original)
  }

  test("strict column validation rejects wrong type letters") {
    val s = spark.newSession()
    val file = Vector(
      "query TT", // actual schema is I (int) + T
      "select 1 as a, 'x' as b",
      "----",
      "1 x",
      "")
    val e = intercept[AssertionError] {
      SltRunner.runFile(s, "inline", file)
    }
    assert(e.getMessage.contains("column types 'TT' do not match result schema 'IT'"))
  }

  test("'?' type letter matches any column type") {
    val s = spark.newSession()
    Graft.registerAll(s)
    val file = Vector(
      "query I?",
      "select 1 as a, array(1, 2) as b",
      "----",
      "1 [1, 2]",
      "")
    assert(SltRunner.runFile(s, "inline", file) === 1)
  }

  test("NaN, Infinity and float rendering match the reference's conversion rules") {
    // conversion.rs:23-86: NaN/±Infinity spelled out; floats via
    // BigDecimal scale-12 round, trailing zeros stripped
    assert(SltRunner.render(Double.NaN) === "NaN")
    assert(SltRunner.render(Double.PositiveInfinity) === "Infinity")
    assert(SltRunner.render(Double.NegativeInfinity) === "-Infinity")
    assert(SltRunner.render(1.0) === "1")
    assert(SltRunner.render(0.5) === "0.5")
    assert(SltRunner.render(1.0 / 3.0) === "0.333333333333")
    assert(SltRunner.render(-2.5e-13) === "0") // rounds away at scale 12
    assert(SltRunner.render("") === "(empty)")
    assert(SltRunner.render(null) === "NULL")
  }

  test("statement error records pass when the statement fails") {
    val s = spark.newSession()
    val file = Vector(
      "statement error",
      "select * from no_such_table_xyz",
      "")
    assert(SltRunner.runFile(s, "inline", file) === 0)
    val bad = Vector(
      "statement error",
      "select 1",
      "")
    intercept[AssertionError] { SltRunner.runFile(s, "inline", bad) }
  }

  test("statement error message matching: regex/substring against the thrown error") {
    val s = spark.newSession()
    // matching expected text passes
    val ok = Vector(
      "statement error TABLE_OR_VIEW_NOT_FOUND",
      "select * from no_such_table_xyz",
      "")
    assert(SltRunner.runFile(s, "inline", ok) === 0)
    // a failure with a DIFFERENT message than expected is a harness error
    val wrong = Vector(
      "statement error DIVIDE_BY_ZERO",
      "select * from no_such_table_xyz",
      "")
    val e = intercept[AssertionError] { SltRunner.runFile(s, "inline", wrong) }
    assert(e.getMessage.contains("different error"))
    // regex alternation is honored
    val rx = Vector(
      "statement error (FOO|TABLE_OR_VIEW_NOT_FOUND)",
      "select * from no_such_table_xyz",
      "")
    assert(SltRunner.runFile(s, "inline", rx) === 0)
  }

  test("multiline last cells expand to rows with leading spaces as dashes") {
    // normalize.rs:80-112 (explain-plan cells)
    val expanded = SltRunner.expandRow(Vector("a", "plan:\n  Scan t\n    Filter"))
    assert(expanded === Vector(
      Vector("a", "plan:"),
      Vector("--Scan t"),
      Vector("----Filter")))
  }

  test("workspace-root paths are normalized in result cells") {
    // normalize.rs:125-163
    assert(SltRunner.normalizePaths("scan file:/ws/data/t.parquet", "/ws") ===
      "scan file:WORKSPACE_ROOT/data/t.parquet")
  }
}

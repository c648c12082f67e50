package graft

import scala.io.Source

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Minimal sqllogictest runner — the Spark analogue of the reference's
  * vendored sqllogictest harness (reference: tests/sqllogictests/src/
  * main.rs:63-116, engines/datafusion/normalize.rs:196-230). Runs each
  * slt file under src/test/resources/slt against a fresh set of temp
  * views; `retention.slt` is the reference's file, copied verbatim.
  *
  * Supported subset (all the reference's file uses):
  *   - `statement ok` + SQL (CREATE TABLE … AS VALUES is rewritten to a
  *     temp view — Spark's in-memory-catalog equivalent of DataFusion's
  *     session tables)
  *   - `query <types> [rowsort]` + SQL + `----` + expected rows
  *   - value rendering: NULL, (empty), true/false, nested arrays as
  *     `[a, b]` — matching Arrow's pretty-print in the golden blocks.
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

  private def render(v: Any): String = v match {
    case null => "NULL"
    case s: String if s.isEmpty => "(empty)"
    case b: Boolean => if (b) "true" else "false"
    case seq: scala.collection.Seq[_] => seq.map(render).mkString("[", ", ", "]")
    case d: Double => BigDecimal(d).round(new java.math.MathContext(12)).toString
    case other => other.toString
  }

  private def renderRows(df: DataFrame, rowsort: Boolean): Seq[String] = {
    val rows = df.collect().toSeq.map(r =>
      (0 until r.length).map(i => render(r.get(i))).mkString(" "))
    if (rowsort) rows.sorted else rows
  }

  /** `CREATE TABLE t (a int, b varchar) as values ...` → temp view. */
  private def rewriteCreate(sql: String): String = {
    val create = """(?is)^\s*CREATE\s+TABLE\s+(\w+)\s*\(([^)]*)\)\s*as\s+values\s+(.*)$""".r
    sql match {
      case create(name, cols, values) =>
        val names = cols.split(",").map(_.trim.split("\\s+")(0)).mkString(", ")
        s"CREATE OR REPLACE TEMP VIEW $name AS SELECT * FROM (VALUES $values) AS t($names)"
      case _ => sql
    }
  }

  private case class QueryRecord(sql: String, rowsort: Boolean, expected: Seq[String])

  private def runFile(path: String): Unit = {
    val lines = Source.fromInputStream(
      getClass.getResourceAsStream(path), "UTF-8").getLines().toVector
    var i = 0
    var nQueries = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.startsWith("statement")) {
        val sqlLines = lines.drop(i + 1).takeWhile(l => l.trim.nonEmpty)
        spark.sql(rewriteCreate(sqlLines.mkString("\n")))
        i += 1 + sqlLines.length
      } else if (line.startsWith("query")) {
        val rowsort = line.contains("rowsort")
        val sqlLines = lines.drop(i + 1).takeWhile(l => l.trim != "----")
        val sql = sqlLines.mkString("\n")
        val after = i + 1 + sqlLines.length + 1
        val expected = lines.drop(after).takeWhile(l => l.trim.nonEmpty).map(_.trim)
        val got = renderRows(spark.sql(sql), rowsort)
        val exp = if (rowsort) expected.sorted else expected
        assert(got == exp, s"slt mismatch in $path for query:\n$sql\n" +
          s"expected:\n${exp.mkString("\n")}\ngot:\n${got.mkString("\n")}")
        nQueries += 1
        i = after + expected.length
      } else i += 1
    }
    assert(nQueries > 0, s"no query records found in $path")
  }

  test("retention.slt (reference corpus, verbatim)") {
    runFile("/slt/retention.slt")
  }
}

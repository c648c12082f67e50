package graft.slt

import java.nio.file.{Files, Path}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** sqllogictest runner — the Spark analogue of the reference's vendored
  * harness (reference: tests/sqllogictests/src/main.rs:63-116,
  * engines/datafusion/normalize.rs, engines/conversion.rs,
  * engines/output.rs:31-55).
  *
  * Capabilities (mirroring the reference's):
  *   - recursive `*.slt` discovery with substring filters
  *     (main.rs:211-234, 322-381)
  *   - `statement ok` / `statement error` records; `CREATE TABLE … AS
  *     VALUES` is rewritten to a temp view (Spark's in-memory-catalog
  *     equivalent of DataFusion session tables)
  *   - `query <types> [nosort|rowsort|valuesort]` with strict column-type
  *     validation: the type letters (B/D/I/P/R/T/?) must match the result
  *     schema (main.rs:134, normalize.rs:233-261)
  *   - value rendering: NULL, `(empty)`, true/false, floats rounded to
  *     scale 12 with trailing zeros stripped, NaN/Infinity/-Infinity
  *     spelled out, nested arrays as `[a, b]` (conversion.rs:23-86)
  *   - multiline last cells (explain plans) expanded to extra rows with
  *     leading spaces replaced by `-` (normalize.rs:80-112)
  *   - workspace-root path normalization in result cells
  *     (normalize.rs:125-163)
  *   - `complete` regeneration mode: reruns every query and rewrites the
  *     expected blocks in place (main.rs:141-173); a passing file
  *     round-trips byte-identically
  */
object SltRunner {

  // ── value rendering (engines/conversion.rs) ────────────────────────────

  /** Floats: shortest decimal repr → BigDecimal, rounded to scale 12,
    * trailing zeros stripped (big_decimal_to_str). */
  def bigDecimalToStr(b: BigDecimal): String = {
    val r = b.underlying.setScale(12, java.math.RoundingMode.HALF_UP)
      .stripTrailingZeros()
    r.toPlainString
  }

  def floatToStr(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else bigDecimalToStr(BigDecimal(d.toString))

  def render(v: Any): String = v match {
    case null => "NULL"
    case s: String if s.isEmpty => "(empty)"
    case s: String => s.replaceAll("\n+$", "") // varchar_to_str trim
    case b: Boolean => if (b) "true" else "false"
    case f: Float => floatToStr(f.toDouble)
    case d: Double => floatToStr(d)
    case bd: java.math.BigDecimal => bigDecimalToStr(BigDecimal(bd))
    case bd: BigDecimal => bigDecimalToStr(bd)
    case seq: scala.collection.Seq[_] => seq.map(render).mkString("[", ", ", "]")
    case other => other.toString
  }

  // ── type letters (engines/output.rs:31-55, normalize.rs:233-261) ───────

  def typeLetter(dt: DataType): Char = dt match {
    case BooleanType => 'B'
    case ByteType | ShortType | IntegerType | LongType => 'I'
    case FloatType | DoubleType | _: DecimalType => 'R'
    case StringType => 'T'
    case DateType => 'D'
    case TimestampType | TimestampNTZType => 'P'
    case _ => '?'
  }

  def typeLetters(schema: StructType): String =
    schema.fields.map(f => typeLetter(f.dataType)).mkString

  // ── row shaping (normalize.rs:80-163) ──────────────────────────────────

  /** Last-cell newlines become extra rows; leading spaces on continuation
    * lines are replaced with `-` (sqllogictest ignores whitespace). */
  def expandRow(row: Vector[String]): Vector[Vector[String]] =
    row.lastOption match {
      case Some(cell) if cell.contains('\n') =>
        val lines = cell.split("\n", -1).toVector
        val first = row.init :+ lines.head
        first +: lines.tail.map { l =>
          val content = l.replaceFirst("^ +", "")
          Vector("-" * (l.length - content.length) + content)
        }
      case _ => Vector(row)
    }

  /** Paths under `workspaceRoot` in plan output → `WORKSPACE_ROOT`. */
  def normalizePaths(cell: String, workspaceRoot: String): String =
    if (workspaceRoot.nonEmpty && cell.contains(workspaceRoot))
      cell.replace(workspaceRoot, "WORKSPACE_ROOT")
    else cell

  // ── records ────────────────────────────────────────────────────────────

  sealed trait Record
  /** `statement ok` / `statement error [<expected>]` + SQL. `expected`
    * (the rest of the record line after `error`) constrains the failure:
    * the thrown message must match it as a regex, or contain it verbatim
    * when it doesn't compile — sqllogictest's error-message semantics. */
  case class Statement(sql: String, expectError: Boolean, line: Int,
      expected: Option[String] = None) extends Record
  /** `query <types> [sortmode]` + SQL + expected block.
    * `expectedStart/expectedEnd` are 0-based line indexes of the expected
    * block (for in-place completion). */
  case class Query(types: String, sortMode: String, sql: String,
      expected: Vector[String], line: Int,
      expectedStart: Int, expectedEnd: Int) extends Record

  def parse(lines: Vector[String]): Vector[Record] = {
    val out = ArrayBuffer[Record]()
    var i = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.startsWith("statement")) {
        val expectError = line.contains("error")
        val expected = if (expectError)
          Some(line.replaceFirst("^statement\\s+error\\s*", "").trim).filter(_.nonEmpty)
        else None
        val sqlLines = lines.drop(i + 1).takeWhile(_.trim.nonEmpty)
        out += Statement(sqlLines.mkString("\n"), expectError, i, expected)
        i += 1 + sqlLines.length
      } else if (line.startsWith("query")) {
        val parts = line.split("\\s+").toSeq
        val types = if (parts.length > 1) parts(1) else ""
        val sortMode = parts.drop(2).headOption.getOrElse("nosort")
        val sqlLines = lines.drop(i + 1).takeWhile(_.trim != "----")
        val sql = sqlLines.mkString("\n")
        val sepIdx = i + 1 + sqlLines.length // the ---- line
        val expStart = sepIdx + 1
        val expected = lines.drop(expStart).takeWhile(_.trim.nonEmpty)
        out += Query(types, sortMode, sql, expected.map(_.trim),
          i, expStart, expStart + expected.length)
        i = expStart + expected.length
      } else i += 1
    }
    out.toVector
  }

  /** `CREATE TABLE t (a int, b varchar) as values ...` → temp view. */
  def rewriteCreate(sql: String): String = {
    val create = """(?is)^\s*CREATE\s+TABLE\s+(\w+)\s*\(([^)]*)\)\s*as\s+values\s+(.*)$""".r
    sql match {
      case create(name, cols, values) =>
        val names = cols.split(",").map(_.trim.split("\\s+")(0)).mkString(", ")
        s"CREATE OR REPLACE TEMP VIEW $name AS SELECT * FROM (VALUES $values) AS t($names)"
      case _ => sql
    }
  }

  // ── execution ──────────────────────────────────────────────────────────

  /** Runs one query and renders its result rows (after sort-mode is
    * applied) plus its schema type letters. */
  private def execQuery(spark: SparkSession, q: Query,
      workspaceRoot: String): (Vector[String], String) = {
    val df = spark.sql(q.sql)
    val letters = typeLetters(df.schema)
    val raw = df.collect().toVector.map(r =>
      (0 until r.length).map(i =>
        normalizePaths(render(r.get(i)), workspaceRoot)).toVector)
    val expanded = raw.flatMap(expandRow)
    val rendered = q.sortMode match {
      case "valuesort" => expanded.flatten.sorted
      case "rowsort" => expanded.map(_.mkString(" ")).sorted
      case _ => expanded.map(_.mkString(" "))
    }
    (rendered, letters)
  }

  /** Runs a file in assert mode. Throws AssertionError on any mismatch
    * (values or column-type letters). Returns the number of query records
    * executed. */
  def runFile(spark: SparkSession, name: String, lines: Vector[String],
      workspaceRoot: String = ""): Int = {
    var nQueries = 0
    parse(lines).foreach {
      case s: Statement =>
        if (s.expectError) {
          val thrown =
            try { spark.sql(rewriteCreate(s.sql)).collect(); None }
            catch { case e: Exception => Some(e) }
          thrown match {
            case None => throw new AssertionError(
              s"$name:${s.line + 1}: statement error expected but succeeded:\n${s.sql}")
            case Some(e) => s.expected.foreach { want =>
              val msg = Option(e.getMessage).getOrElse("")
              val matches =
                try want.r.findFirstIn(msg).isDefined
                catch { case _: Exception => msg.contains(want) }
              if (!matches) throw new AssertionError(
                s"$name:${s.line + 1}: statement failed with a different error.\n" +
                  s"expected (regex or substring): $want\ngot: ${msg.take(500)}")
            }
          }
        } else spark.sql(rewriteCreate(s.sql)).collect()
      case q: Query =>
        val (got, letters) = execQuery(spark, q, workspaceRoot)
        // strict column validation (main.rs:134): count and letters;
        // '?' in the file matches any actual type (output.rs from_char
        // maps unknown letters to Another)
        if (q.types.length != letters.length ||
          q.types.zip(letters).exists { case (e, a) => e != '?' && e != a })
          throw new AssertionError(
            s"$name:${q.line + 1}: column types '${q.types}' do not match " +
              s"result schema '$letters' for:\n${q.sql}")
        val exp = if (q.sortMode == "rowsort" || q.sortMode == "valuesort")
          q.expected.sorted else q.expected
        if (got != exp) throw new AssertionError(
          s"$name:${q.line + 1}: slt mismatch for query:\n${q.sql}\n" +
            s"expected:\n${exp.mkString("\n")}\ngot:\n${got.mkString("\n")}")
        nQueries += 1
    }
    nQueries
  }

  /** Completion mode (main.rs:141-173): reruns every query and returns
    * the file content with expected blocks rewritten in place. Statements
    * still execute (they build the tables queries read). A passing file
    * round-trips byte-identically when its blocks are in sort-mode
    * order. */
  def completeFile(spark: SparkSession, lines: Vector[String],
      workspaceRoot: String = ""): Vector[String] = {
    val records = parse(lines)
    // splice from the bottom up so earlier indexes stay valid
    var out = lines
    val results = records.map {
      case s: Statement =>
        try spark.sql(rewriteCreate(s.sql)).collect()
        catch { case _: Exception if s.expectError => () }
        None
      case q: Query => Some(q -> execQuery(spark, q, workspaceRoot)._1)
    }
    results.flatten.reverseIterator.foreach { case (q, rows) =>
      out = out.patch(q.expectedStart, rows, q.expectedEnd - q.expectedStart)
    }
    out
  }

  // ── discovery (main.rs:211-234) ────────────────────────────────────────

  /** All `*.slt` files under `dir` (recursive), filtered by substring
    * match on the relative path when `filters` is non-empty. */
  def discover(dir: Path, filters: Seq[String] = Nil): Seq[Path] = {
    val all = Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".slt"))
      .toVector.sortBy(_.toString)
    if (filters.isEmpty) all
    else all.filter(p => filters.exists(dir.relativize(p).toString.contains))
  }

  /** Runs every discovered file, each against a fresh session (isolated
    * temp views, shared context) with graft functions registered —
    * mirroring the reference's fresh per-file `SessionContext`
    * (main.rs:241-283). Files run concurrently (the reference buffers
    * its per-file tasks up to `num_cpus`, main.rs:74-87); sessions are
    * isolated so files can't see each other's temp views. Returns total
    * queries run. */
  def runDir(spark: SparkSession, dir: Path, filters: Seq[String] = Nil,
      complete: Boolean = false, workspaceRoot: String = ""): Int = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val jobs = discover(dir, filters).map { p =>
      Future {
        val s = spark.newSession()
        graft.Graft.registerAll(s)
        val lines = Files.readAllLines(p).asScala.toVector
        if (complete) {
          val updated = completeFile(s, lines, workspaceRoot)
          Files.write(p, (updated.mkString("\n") + "\n").getBytes("UTF-8"))
          1
        } else runFile(s, p.toString, lines, workspaceRoot)
      }
    }
    jobs.map(Await.result(_, Duration.Inf)).sum
  }
}

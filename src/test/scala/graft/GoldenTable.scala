package graft

import org.apache.spark.sql.DataFrame

/** Golden pretty-table comparator — the Spark analogue of the reference's
  * `assert_batches_eq!` / `assert_batches_sorted_eq!` macros over Arrow's
  * pretty-printed tables (reference: src/test_util/mod.rs:32-93).
  *
  * Renders a DataFrame in the Arrow pretty-print style:
  * {{{
  * +-------------+----------------+
  * | distinct_id | stats          |
  * +-------------+----------------+
  * | 1           | [[1, 1], [1, 0]] |
  * +-------------+----------------+
  * }}}
  * so failure output can be copy-pasted back as the expectation, and
  * compares line-by-line (sorted variant sorts the data lines only).
  */
object GoldenTable {

  /** Cell rendering: same rules as the slt harness (NULL, (empty),
    * true/false, nested arrays `[a, b]`) — matching Arrow's display. */
  private def cell(v: Any): String = v match {
    case null => ""
    case other => graft.slt.SltRunner.render(other) match {
      case "(empty)" => ""
      case s => s
    }
  }

  def render(df: DataFrame): Vector[String] = {
    val header = df.schema.fieldNames.toVector
    val rows = df.collect().toVector.map(r =>
      (0 until r.length).map(i => cell(r.get(i))).toVector)
    val widths = header.indices.map(i =>
      (header(i).length +: rows.map(_(i).length)).max).toVector
    def sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def line(cells: Vector[String]) =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    (sep +: line(header) +: sep +: rows.map(line)) :+ sep
  }

  /** Exact (ordered) golden-table assert. */
  def assertEq(expected: Seq[String], df: DataFrame): Unit = {
    val actual = render(df)
    assert(expected.toVector == actual,
      s"\n\nexpected:\n${expected.mkString("\n")}\n\nactual:\n${actual.mkString("\n")}\n")
  }

  /** Order-insensitive variant: sorts everything between the header block
    * (first 3 lines) and the trailing separator, on both sides. */
  def assertSortedEq(expected: Seq[String], df: DataFrame): Unit = {
    def sortBody(lines: Vector[String]): Vector[String] =
      if (lines.length > 3)
        lines.take(3) ++ lines.slice(3, lines.length - 1).sorted :+ lines.last
      else lines
    val actual = sortBody(render(df))
    val exp = sortBody(expected.toVector)
    assert(exp == actual,
      s"\n\nexpected:\n${exp.mkString("\n")}\n\nactual:\n${actual.mkString("\n")}\n")
  }
}

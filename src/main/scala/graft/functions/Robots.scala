package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `robots_match(path) → int` — the index (in the rule list's ORIGINAL
  * order) of the RFC 9309 rule that decides a path, or -1 when none
  * matches; the data-driven twin of
  * [[graft.operators.Web.robotsChain]]'s when-chain for big rule
  * lists.
  *
  * A handful of rules plan fine as a chain of `startswith`/`rlike`
  * probes, but generated robots.txt files with thousands of Disallow
  * lines exist (the RFC's 500 KiB parse obligation is ~20k rules) — a
  * chain that size blows the 64KB codegen limit and every `rlike` probe
  * drags a regex engine onto the row path. Here the rules ride the
  * expression as one broadcast-sized constant, compiled ONCE per
  * executor into wildcard segments (`*`-split octet runs + end-anchor
  * flag), pre-sorted by the RFC precedence (longest spelled pattern
  * first, Allow before Disallow at equal length) so the FIRST hit is
  * the prevailing rule — early exit, no regex, O(|path|·segs) byte
  * scans per probed rule. Still a scan-stage projection inside
  * whole-stage codegen (the static-forwarder recipe), NULL-propagating
  * like any builtin.
  *
  * Match contract (identical to the chain, fuzz-pinned in
  * `Round13OpsSpec` and replayed by the `w6_robots_verdicts` oracle):
  * octet-exact prefix match; `*` matches any octet run (including
  * empty, including newlines); a TRAILING `$` anchors the pattern at
  * end-of-path; a mid-pattern `$` is a literal octet. Middle segments
  * bind leftmost — complete for `*`-only wildcards (an earlier middle
  * match only ever leaves MORE room for later segments; the anchored
  * tail re-checks overlap against the last middle position).
  */
case class RobotsMatchExpr(child: Expression, rules: Seq[(Boolean, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"robots_match requires string path, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  // compiled per deserialized instance (per executor), not per row;
  // the sort is Web.robotsOrder's spelled verbatim: longest pattern in
  // UTF-8 octets first, Allow first at ties, original index last
  @transient private lazy val compiled: Array[RobotsMatchExpr.Compiled] =
    rules.zipWithIndex
      .sortBy { case ((allow, p), i) =>
        (-p.getBytes(UTF_8).length, !allow, i)
      }
      .map { case ((_, p), i) => RobotsMatchExpr.compile(p, i) }
      .toArray

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  def compute(path: UTF8String): Int = {
    // one byte materialization per row, shared by every probed rule
    // (getBytes returns the backing array when exact — no copy for the
    // common heap-backed case); probes read only
    val p = path.getBytes
    var i = 0
    while (i < compiled.length) {
      if (compiled(i).matches(p)) return compiled(i).origIdx
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val self = ctx.addReferenceObj("robotsMatcher", this,
        classOf[RobotsMatchExpr].getName)
      s"${ev.value} = $self.compute($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsMatchExpr {

  /** One pattern compiled to its `*`-split octet segments. `"/a*b$"` →
    * segments `["/a", "b"]`, anchored; `"*x"` → `["", "x"]` (empty
    * first segment: any prefix); a lone `"$"` → `[""]` anchored
    * (matches only the empty path). */
  private[functions] final class Compiled(
      val origIdx: Int, segs: Array[Array[Byte]], anchored: Boolean) {

    def matches(p: Array[Byte]): Boolean = {
      val first = segs(0)
      if (!regionEq(p, 0, first)) return false
      if (segs.length == 1)
        return !anchored || first.length == p.length
      var pos = first.length
      var i = 1
      while (i < segs.length - 1) {
        val at = indexOf(p, segs(i), pos)
        if (at < 0) return false
        pos = at + segs(i).length
        i += 1
      }
      val last = segs(segs.length - 1)
      if (anchored) {
        // the tail must sit flush at the end AND clear of the last
        // middle match — leftmost middles make this maximally easy
        val start = p.length - last.length
        start >= pos && regionEq(p, start, last)
      } else indexOf(p, last, pos) >= 0
    }

    private def regionEq(p: Array[Byte], at: Int, s: Array[Byte]): Boolean = {
      if (at < 0 || at + s.length > p.length) return false
      var i = 0
      while (i < s.length) {
        if (p(at + i) != s(i)) return false
        i += 1
      }
      true
    }

    private def indexOf(p: Array[Byte], s: Array[Byte], from: Int): Int = {
      var at = from
      while (at + s.length <= p.length) {
        if (regionEq(p, at, s)) return at
        at += 1
      }
      -1
    }
  }

  private[functions] def compile(pat: String, origIdx: Int): Compiled = {
    val anchored = pat.endsWith("$")
    val body = if (anchored) pat.dropRight(1) else pat
    new Compiled(origIdx, body.split("\\*", -1).map(_.getBytes(UTF_8)),
      anchored)
  }

  def apply(path: Column, rules: Seq[(Boolean, String)]): Column =
    ColumnBridge.column(
      RobotsMatchExpr(ColumnBridge.expression(path), rules))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `registrable_domain(host) → string` over an arbitrary public-suffix
  * list, as a native codegen'd Catalyst expression.
  *
  * [[graft.operators.Web.registrableDomain]]'s when-chain is the right
  * plan for a handful of suffixes (constant-folded, zero state), but
  * the real Mozilla PSL is ~9k suffixes: a 9k-branch when-chain blows
  * past Catalyst's 64KB-per-method codegen limit and falls back to
  * interpreted `CaseWhen` — thousands of `endsWith` probes per row on
  * the slow path. This expression is the data-driven form: the suffix
  * list rides the expression as one broadcast-sized constant (a hash
  * set rebuilt lazily per executor, never shuffled, never joined), and
  * each host is matched in ONE left-to-right pass over its own dots —
  * the candidate suffixes of a host are its label-suffixes, longest
  * first, so the first set hit IS the longest match (the PSL rule).
  * O(labels) hash probes per row, suffix-count-independent; still a
  * pure scan-stage projection inside whole-stage codegen (the
  * `PlanSpec` assertion), NULL-propagating like any builtin.
  *
  * Match contract (identical to the when-chain, property-pinned in
  * `Round11OpsSpec`): the registrable domain is one label plus the
  * longest matching PROPER label-suffix; a host that matches nothing
  * (an IP, an intranet name, a bare suffix itself) is its own domain.
  */
case class RegistrableDomainExpr(child: Expression, suffixes: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registrable_domain requires string host, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  // rebuilt once per deserialized instance (per executor), not per
  // row; keyed by UTF8String so probes compare raw bytes — no
  // String decode anywhere on the row path
  @transient private lazy val suffixSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](suffixes.size * 2)
    suffixes.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  /** Zero-allocation walk over the host's BYTES ('.' is ASCII 0x2E and
    * UTF-8 continuation bytes are ≥ 0x80, so a byte scan never splits
    * a code point): candidate suffixes probe the hash set as
    * zero-copy views over the input buffer (`fromAddress` — safe
    * because the views never outlive this call), and only a MATCHED
    * registrable domain is copied out (`clone()` — the input buffer
    * is row-reused by the scan, a view must never escape). */
  def compute(host: UTF8String): UTF8String = {
    val n = host.numBytes
    val base = host.getBaseObject
    val off = host.getBaseOffset
    var prevStart = 0 // start of the label left of the current dot
    var i = 0
    while (i < n) {
      // candidate = everything right of this dot — dots walk left to
      // right, so candidates go longest to shortest and the first hit
      // is the longest match. An EMPTY label before the matched suffix
      // (".com", "a..com") yields "" — the when-chain's contract
      // (regexp_extract's no-match value for its "[^.]+\.suffix$"
      // label requirement), pinned by the Round11OpsSpec property.
      if (host.getByte(i) == '.') {
        val cand = UTF8String.fromAddress(base, off + i + 1, n - i - 1)
        if (suffixSet.contains(cand))
          return if (i == prevStart) UTF8String.EMPTY_UTF8
            else UTF8String.fromAddress(base, off + prevStart, n - prevStart)
              .clone()
        prevStart = i + 1
      }
      i += 1
    }
    host // no suffix matched: the host is its own domain
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val self = ctx.addReferenceObj("pslMatcher", this,
        classOf[RegistrableDomainExpr].getName)
      s"${ev.value} = $self.compute($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegistrableDomainExpr {
  def apply(host: Column, suffixes: Seq[String]): Column =
    ColumnBridge.column(
      RegistrableDomainExpr(ColumnBridge.expression(host), suffixes))
}

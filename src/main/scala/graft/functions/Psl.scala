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
  * plan for a handful of rules (constant-folded, zero state), but
  * the real Mozilla PSL is ~9k suffixes: a 9k-branch when-chain blows
  * past Catalyst's 64KB-per-method codegen limit and falls back to
  * interpreted `CaseWhen` — thousands of `endsWith` probes per row on
  * the slow path. This expression is the data-driven form: the rule
  * list rides the expression as one broadcast-sized constant (hash
  * sets rebuilt lazily per executor, never shuffled, never joined), and
  * each host is matched in ONE left-to-right pass over its own dots —
  * the candidate suffixes of a host are its label-suffixes, longest
  * first, so the first set hit IS the longest match (the PSL rule).
  * O(labels) hash probes per row, rule-count-independent; still a
  * pure scan-stage projection inside whole-stage codegen (the
  * `PlanSpec` assertion), NULL-propagating like any builtin.
  *
  * Rules use the published PSL file spelling: a plain suffix
  * (`com`, `co.uk`), a wildcard (`*.ck` — ANY single label under `ck`
  * is itself a public suffix), or an exception (`!www.ck` — despite a
  * matching wildcard, `www.ck` is NOT a public suffix; its parent is,
  * so `www.ck` IS the registrable domain of anything under it). The
  * real list carries ~1k wildcard/exception rules beside its ~9k plain
  * suffixes; treating them as literal suffixes silently mis-roots
  * eTLD+1 for whole ccTLDs (`.ck`, the `.jp` city domains), skewing
  * every per-domain cap and blocklist downstream.
  *
  * Match contract (identical to the when-chain, property-pinned in
  * `Round11PropertySpec`/`Round12OpsSpec` and replayed by the
  * `w4_psl_domains` SQL oracle):
  *  - exception rules prevail: a host at/under an exception rule's
  *    labels has that rule as its registrable domain (the published
  *    list never shadows an exception with a longer rule — the walk
  *    assumes that and stays single-pass);
  *  - otherwise the longest matching rule wins, a wildcard `*.w`
  *    matching one label more than its spelled parent `w`;
  *  - the registrable domain is one label plus the matched public
  *    suffix; an EMPTY label where the contract needs one (".com",
  *    "a..com", and their wildcard twins) yields "" (the when-chain's
  *    regexp_extract no-match value);
  *  - a host matching nothing (an IP, an intranet name, a bare suffix
  *    itself — including a bare `<label>.w` wildcard public suffix) is
  *    its own domain.
  */
case class RegistrableDomainExpr(child: Expression, suffixes: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registrable_domain requires string host, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  // rule sets rebuilt once per deserialized instance (per executor),
  // not per row; keyed by UTF8String so probes compare raw bytes — no
  // String decode anywhere on the row path. Wildcards are keyed by the
  // spelled PARENT suffix (`*.ck` → "ck"): the walk probes the parent
  // and widens by the label it just passed.
  @transient private lazy val plainSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](suffixes.size * 2)
    suffixes.iterator
      .filterNot(r => r.startsWith("!") || r.startsWith("*."))
      .foreach(x => s.add(UTF8String.fromString(x)))
    s
  }
  @transient private lazy val wildcardSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](8)
    suffixes.iterator.filter(_.startsWith("*."))
      .foreach(x => s.add(UTF8String.fromString(x.substring(2))))
    s
  }
  @transient private lazy val exceptionSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](8)
    suffixes.iterator.filter(_.startsWith("!"))
      .foreach(x => s.add(UTF8String.fromString(x.substring(1))))
    s
  }
  // a plain-only list (the overwhelmingly common probe) skips the two
  // extra set probes per dot entirely — same cost as the plain walk
  @transient private lazy val hasSpecial: Boolean =
    !wildcardSet.isEmpty || !exceptionSet.isEmpty

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  /** Zero-allocation walk over the host's BYTES ('.' is ASCII 0x2E and
    * UTF-8 continuation bytes are ≥ 0x80, so a byte scan never splits
    * a code point): candidate suffixes probe the hash sets as
    * zero-copy views over the input buffer (`fromAddress` — safe
    * because the views never outlive this call), and only a MATCHED
    * registrable domain is copied out (`clone()` — the input buffer
    * is row-reused by the scan, a view must never escape). At each dot
    * the candidate is checked against the exception set first (PSL:
    * exception rules prevail), then the wildcard set (one label longer
    * than its spelling, and itself re-checked against the exception
    * set), then the plain set — at most three O(1) probes per dot,
    * rule-count-independent. */
  def compute(host: UTF8String): UTF8String = {
    val n = host.numBytes
    val base = host.getBaseObject
    val off = host.getBaseOffset
    var prev2Start = -1 // start of the label two left of the current dot
    var prevStart = 0 // start of the label left of the current dot
    var i = 0
    while (i < n) {
      // candidate = everything right of this dot — dots walk left to
      // right, so candidates go longest to shortest and the first hit
      // is the longest match. An EMPTY label before the matched suffix
      // (".com", "a..com") yields "" — the when-chain's contract
      // (regexp_extract's no-match value for its "[^.]+\.suffix$"
      // label requirement), pinned by the Round11PropertySpec property.
      if (host.getByte(i) == '.') {
        val cand = UTF8String.fromAddress(base, off + i + 1, n - i - 1)
        if (hasSpecial) {
          // the registrable domain of anything at/under an exception
          // rule is the rule itself — its parent is the public suffix
          if (exceptionSet.contains(cand)) return cand.clone()
          if (wildcardSet.contains(cand)) {
            // the public suffix is ⟨label⟩.cand = host[prevStart..)
            if (i == prevStart) return UTF8String.EMPTY_UTF8
            val psuffix =
              UTF8String.fromAddress(base, off + prevStart, n - prevStart)
            // ...unless that very string is excepted — then IT is the
            // registrable domain ("www.ck" under *.ck + !www.ck)
            if (exceptionSet.contains(psuffix)) return psuffix.clone()
            // host IS the wildcard public suffix: its own domain (the
            // bare-suffix convention)
            if (prevStart == 0) return host
            if (prevStart - 1 == prev2Start) return UTF8String.EMPTY_UTF8
            return UTF8String
              .fromAddress(base, off + prev2Start, n - prev2Start).clone()
          }
        }
        if (plainSet.contains(cand))
          return if (i == prevStart) UTF8String.EMPTY_UTF8
            else UTF8String.fromAddress(base, off + prevStart, n - prevStart)
              .clone()
        prev2Start = prevStart
        prevStart = i + 1
      }
      i += 1
    }
    host // no rule matched: the host is its own domain
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

/** `psl_rule_class(host) → string` — the CLASS of the prevailing PSL
  * rule (`'exception'`/`'wildcard'`/`'plain'`/`'none'`), the native
  * twin of [[graft.operators.Web.pslRuleClass]]'s when-chain for
  * full-sized rule lists. The walk is [[RegistrableDomainExpr]]'s
  * VERBATIM (same sets, same per-dot probe order, same empty-label
  * and bare-suffix decisions), returning the branch's class instead of
  * the domain — so on any host the pair (domain, class) is decided by
  * ONE rule, property-pinned against the chain in `Round12OpsSpec`.
  * Rule-count-independent like its twin; plain-only lists skip the
  * extra probes the same way. */
case class PslRuleClassExpr(child: Expression, suffixes: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"psl_rule_class requires string host, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  @transient private lazy val plainSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](suffixes.size * 2)
    suffixes.iterator
      .filterNot(r => r.startsWith("!") || r.startsWith("*."))
      .foreach(x => s.add(UTF8String.fromString(x)))
    s
  }
  @transient private lazy val wildcardSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](8)
    suffixes.iterator.filter(_.startsWith("*."))
      .foreach(x => s.add(UTF8String.fromString(x.substring(2))))
    s
  }
  @transient private lazy val exceptionSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](8)
    suffixes.iterator.filter(_.startsWith("!"))
      .foreach(x => s.add(UTF8String.fromString(x.substring(1))))
    s
  }
  @transient private lazy val hasSpecial: Boolean =
    !wildcardSet.isEmpty || !exceptionSet.isEmpty

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  def compute(host: UTF8String): UTF8String = {
    val n = host.numBytes
    val base = host.getBaseObject
    val off = host.getBaseOffset
    var prevStart = 0
    var i = 0
    while (i < n) {
      if (host.getByte(i) == '.') {
        val cand = UTF8String.fromAddress(base, off + i + 1, n - i - 1)
        if (hasSpecial) {
          if (exceptionSet.contains(cand)) return PslRuleClassExpr.Exception
          if (wildcardSet.contains(cand)) {
            // the value twin distinguishes empty-label/excepted/bare
            // sub-cases here; all of them are decided BY the wildcard
            // rule except the excepted psuffix, which is the exception
            if (i != prevStart) {
              val psuffix =
                UTF8String.fromAddress(base, off + prevStart, n - prevStart)
              if (exceptionSet.contains(psuffix))
                return PslRuleClassExpr.Exception
            }
            return PslRuleClassExpr.Wildcard
          }
        }
        if (plainSet.contains(cand)) return PslRuleClassExpr.Plain
        prevStart = i + 1
      }
      i += 1
    }
    PslRuleClassExpr.None
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val self = ctx.addReferenceObj("pslClassMatcher", this,
        classOf[PslRuleClassExpr].getName)
      s"${ev.value} = $self.compute($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PslRuleClassExpr {
  private val Exception = UTF8String.fromString("exception")
  private val Wildcard = UTF8String.fromString("wildcard")
  private val Plain = UTF8String.fromString("plain")
  private val None = UTF8String.fromString("none")

  def apply(host: Column, suffixes: Seq[String]): Column =
    ColumnBridge.column(
      PslRuleClassExpr(ColumnBridge.expression(host), suffixes))
}

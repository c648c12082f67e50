package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-based document quality filtering in the style of the published
  * Gopher/MassiveText heuristics (Rae et al. 2021, appendix A): hard
  * structural gates applied before model-based scoring. Each rule is a
  * deterministic per-row boolean; the pipeline keeps documents passing
  * all of them.
  *
  * All rules are native-function compositions (regex, array HOFs over
  * the token/line splits) — per-row map work inside whole-stage codegen,
  * no shuffle, linear at 100 TB. Thresholds are the published defaults,
  * overridable per call.
  */
object QualityRules {

  /** Gopher's required-word set: a document failing to contain at least
    * `minDistinct` of these is unlikely to be running English prose. */
  val RequiredWords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def lines(c: Column): Column = split(c, "\n")
  private def safeFrac(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))

  /** Fraction of lines whose trimmed form starts with a bullet marker. */
  def bulletLineFrac(c: Column): Column = {
    val ls = lines(c)
    safeFrac(size(filter(ls, l =>
      ltrim(l).startsWith("- ") || ltrim(l).startsWith("* "))), size(ls))
  }

  /** Fraction of lines ending in an ellipsis. */
  def ellipsisLineFrac(c: Column): Column = {
    val ls = lines(c)
    safeFrac(size(filter(ls, l => rtrim(l).endsWith("..."))), size(ls))
  }

  /** Fraction of word tokens containing at least one alphabetic char. */
  def alphaWordFrac(c: Column): Column = {
    val t = Text.tokens(c)
    safeFrac(size(filter(t, w => w.rlike("[a-zA-Z]"))), size(t))
  }

  /** Symbol-to-word ratio: `#` and `...` occurrences per word token. */
  def symbolWordRatio(c: Column): Column = {
    val hashes = length(c) - length(regexp_replace(c, "#", ""))
    val ellipses = (length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / 3
    safeFrac(hashes + ellipses, Text.tokenCount(c))
  }

  /** Encoding-health counters — the mojibake/corruption screen that
    * runs BEFORE content-quality gates (garbled bytes poison every
    * downstream token statistic): C0 control characters (minus
    * tab/newline/CR, which are legitimate layout), U+FFFD replacement
    * characters (the smoking gun of a wrong-charset decode), and
    * non-ASCII character count (not a defect — the multilingual-share
    * signal that contextualizes the other two). All are
    * `length − length(strip)` char counts — codegen'd, scan-stage, no
    * explode. Counts are in UTF-16 code units (= code points on the
    * BMP; astral-plane text counts surrogate pairs as 2 — the
    * documented cross-engine contract is BMP text). */
  def controlCharCount(c: Column): Column =
    (length(c) - length(regexp_replace(c,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")

  /** U+FFFD replacement-character count (see [[controlCharCount]]). */
  def replacementCharCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "�", ""))).cast("long")

  /** Non-ASCII character count (see [[controlCharCount]]). */
  def nonAsciiCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[^\\x00-\\x7F]", ""))).cast("long")

  /** Distinct required-word hits (see [[RequiredWords]]). */
  def requiredWordHits(c: Column): Column =
    size(array_intersect(
      array_distinct(Text.tokens(lower(c))),
      typedLit(RequiredWords)))

  /** All Gopher-style gates as named boolean columns, plus the composite
    * `passes_quality`. Published defaults; tune per corpus. */
  def flags(
      c: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8, minRequiredWords: Int = 2): Seq[Column] = {
    val nw = Text.tokenCount(c)
    val mwl = Text.avgWordLen(c)
    val gates = Seq(
      "ok_word_count" -> (nw >= minWords && nw <= maxWords),
      "ok_word_len" -> (mwl >= minMeanWordLen && mwl <= maxMeanWordLen),
      "ok_symbols" -> (symbolWordRatio(c) <= maxSymbolRatio),
      "ok_bullets" -> (bulletLineFrac(c) <= maxBulletFrac),
      "ok_ellipsis" -> (ellipsisLineFrac(c) <= maxEllipsisFrac),
      "ok_alpha_words" -> (alphaWordFrac(c) >= minAlphaWordFrac),
      "ok_required_words" -> (requiredWordHits(c) >= minRequiredWords))
    gates.map { case (n, g) => g.as(n) } :+
      gates.map(_._2).reduce(_ && _).as("passes_quality")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and scrubbing for training-data pipelines: emails,
  * IPv4 addresses, and international-format phone numbers — the
  * standard pre-training redaction pass.
  *
  * Pure regex compositions of native (codegen'd) functions — no UDFs,
  * so the scrub runs inside whole-stage codegen as a per-row map with
  * zero shuffle, the ideal 100 TB shape. The patterns are restricted to
  * syntax with identical semantics in Java regex and RE2 (character
  * classes, bounded repetition, non-capturing groups, `\b`), so any SQL
  * engine reproduces the scrub byte-for-byte — which is what makes the
  * redaction auditable (hash the scrubbed text in two engines, compare).
  */
object Pii {

  /** Email addresses (practical form, not full RFC 5322). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic; octet range not enforced). */
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** +-prefixed international phone numbers: 8-16 digits with optional
    * single dash/space separators. */
  val PhoneRe = "\\+[0-9](?:[-. ]?[0-9]){7,15}"

  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(EmailRe), lit(0)))
  def ipv4Count(c: Column): Column = size(regexp_extract_all(c, lit(Ipv4Re), lit(0)))
  def phoneCount(c: Column): Column = size(regexp_extract_all(c, lit(PhoneRe), lit(0)))

  /** Text with all three PII classes replaced by typed placeholder
    * tokens. Scrub order is email → ipv4 → phone (fixed, so results are
    * engine-reproducible); the placeholders contain no digits or `@`/`+`
    * so a later pattern can never match inside an earlier replacement. */
  def scrub(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }
}

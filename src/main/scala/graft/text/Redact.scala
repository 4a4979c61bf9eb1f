package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** PII redaction for training corpora: mask emails, IPv4 addresses, SSNs,
  * and NANP-style phone numbers with typed placeholder tokens.
  *
  * Patterns stay in the common subset of Java regex and RE2 (`\b`, `\d`,
  * bounded repetition — no lookaround, no backrefs) so the exact same
  * pattern strings run in Spark's codegen'd `regexp_replace` AND in the
  * DuckDB oracle. Order matters and is part of the contract: EMAIL first
  * (an address can contain digit runs the narrower patterns would nibble),
  * then IP, then SSN before PHONE (both are dash-digit shapes; SSN's
  * 3-2-4 must not be half-eaten by PHONE's 3-3-4).
  *
  * Scale: a chain of per-row regexp_replace calls — narrow map, no
  * shuffle, whole-stage codegen keeps it in one pass over the strings.
  */
object Redact {

  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val Ssn   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** (pattern, replacement) in application order. */
  val rules: Seq[(String, String)] = Seq(
    Email -> "[EMAIL]", Ipv4 -> "[IP]", Ssn -> "[SSN]", Phone -> "[PHONE]")

  def redact(c: Column): Column =
    rules.foldLeft(c) { case (acc, (re, tok)) => regexp_replace(acc, re, tok) }

  /** The identical chain as DuckDB SQL over a column expression. */
  def oracleExpr(inner: String): String =
    // DuckDB string literals don't treat backslash as an escape, so the
    // runtime pattern embeds verbatim
    rules.foldLeft(inner) { case (acc, (re, tok)) =>
      s"regexp_replace($acc, '$re', '$tok', 'g')"
    }
}

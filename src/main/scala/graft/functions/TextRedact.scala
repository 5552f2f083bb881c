package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation (extension surface; no
  * reference counterpart — the reference ships Salesforce fields as-is,
  * but a corpus pipeline must scrub emails/URLs/IPs/phones before text
  * reaches a training set).
  *
  * Every pattern is restricted to the syntax subset Java regex (Spark's
  * `regexp_replace`, codegen'd) and RE2 (the DuckDB oracle) interpret
  * identically: character classes, bounded/greedy quantifiers, `\b`,
  * alternation-free groups — no backreferences, no lookaround, no
  * engine-specific escapes, and no `\s` (a known subset edge: Java's
  * `\s` includes U+000B vertical tab, RE2's does not — whitespace is
  * spelled as the explicit [[graft.functions.GraftFunctions.WsClass]]
  * instead, which both engines read identically). Redaction is then a
  * pure engine-portable projection: no UDF, no shuffle, fully inside
  * whole-stage codegen, and the oracle recomputes it bit-for-bit.
  *
  * [[redactPii]] applies the passes in a FIXED order (URL → email →
  * IPv4 → phone): URLs are redacted first so their host/path digits
  * can't be half-eaten by the IP/phone passes, and IPv4 before phone so
  * a dotted quad isn't consumed as a digit run. The order is part of
  * the function's contract — reordering changes outputs.
  */
object TextRedact {

  /** `user.name+tag@host.tld` — local part, @, dotted host, 2+ alpha TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** `http(s)://` up to the next (portable) whitespace. */
  val UrlPattern = s"https?://[^${GraftFunctions.WsClass}]+"

  /** Dotted quad; `\b` keeps it off digit runs inside longer numbers.
    * (Octets are not range-checked — 999.9.9.9 redacts too; an
    * over-redaction, the safe direction for PII.) */
  val Ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Phone-shaped digit run: optional +, then 8+ chars of digits,
    * space, (), dot or dash, ending in a digit. Deliberately broad —
    * over-redaction is the safe direction. */
  val PhonePattern = s"\\+?\\d[\\d().\\-${GraftFunctions.WsClass}]{6,}\\d"

  def redactEmails(c: Column): Column = regexp_replace(c, EmailPattern, "<EMAIL>")
  def redactUrls(c: Column): Column = regexp_replace(c, UrlPattern, "<URL>")
  def redactIpv4(c: Column): Column = regexp_replace(c, Ipv4Pattern, "<IP>")
  def redactPhones(c: Column): Column = regexp_replace(c, PhonePattern, "<PHONE>")

  /** All four passes in contract order (see object doc). */
  def redactPii(c: Column): Column =
    redactPhones(redactIpv4(redactEmails(redactUrls(c))))

  /** Count of matches a pass would redact — the audit-side twin
    * (per-document PII density, the curation filter signal). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")
}

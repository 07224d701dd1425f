package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: emails, IPv4 addresses and
  * phone-shaped digit runs are REPLACED with placeholder tokens (the
  * pipeline-standard form — deletion changes token offsets and hides how
  * much PII a source carries; `[EMAIL]`-style tokens keep both).
  *
  * The patterns deliberately use the RE2-compatible regex subset (no
  * lookaround, no backreferences): Spark's Java regex and DuckDB's RE2
  * then agree character-for-character, which is what makes q_redact_pii
  * oracle-checkable — and keeps the patterns portable to any engine a
  * pipeline might audit with. Application order is fixed
  * email → ipv4 → phone: emails and IPs contain digit runs a
  * phone-shaped scan would otherwise partially eat.
  *
  * Pure projection (three chained regexp_replace, one codegen stage via
  * CollapseProject), no shuffle, linear in corpus size.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** 9+ ACTUAL digits, each followed by at most two separator chars
    * (") " in "(415) 555-0173" is a two-char gap) — international-number
    * shaped. The repetition counts DIGITS, not separator chars, so
    * 8-digit date-like strings ("2026-08-13") and short numeric
    * ranges/versions survive: an earlier draft counted any of `[\d().-]`
    * toward the minimum and redacted legitimate dates as [PHONE], which
    * destroys training text and is invisible to the oracle (both sides
    * share the pattern). Pinned by the negative cases in ExtensionsSpec. */
  val PhoneRe = "\\+?\\(?(?:\\d[ ().-]{0,2}){8,}\\d"

  val EmailToken = "[EMAIL]"
  val IpToken = "[IP]"
  val PhoneToken = "[PHONE]"

  def redactEmails(c: Column): Column = regexp_replace(c, EmailRe, EmailToken)
  def redactIps(c: Column): Column = regexp_replace(c, Ipv4Re, IpToken)
  def redactPhones(c: Column): Column = regexp_replace(c, PhoneRe, PhoneToken)

  /** All three, in the documented order. */
  def redactPii(c: Column): Column =
    redactPhones(redactIps(redactEmails(c)))
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass a training-data pipeline runs before
  * anything leaves curation: emails, IPv4 addresses, and phone-shaped
  * digit runs replaced by typed placeholder tokens, with per-category
  * match counts kept as an audit column.
  *
  * Pure per-row column expressions (regexp_count / regexp_replace are
  * codegen'd) — no shuffle, no state, trivially data-parallel at any
  * scale; at 100 TB this runs as a map-only stage fused into whatever
  * scan feeds it.
  *
  * Pattern dialect discipline: every pattern keeps to the syntax subset
  * Java regex and RE2 (DuckDB) agree on — character classes, bounded
  * repetition, `\b` word boundaries; no lookaround, no backreferences —
  * so the DuckDB oracle replays the exact same matches and the scrubbed
  * strings hash-compare bit-exactly.
  *
  * Redaction ORDER is part of the contract: emails first (an email's
  * local part may contain a phone-shaped digit run — counting
  * sequentially on the already-scrubbed string prevents double
  * counting), then IPv4, then phones. Counts are taken on the string as
  * it stands BEFORE that category's replacement.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"

  val EmailToken = "[EMAIL]"
  val Ipv4Token = "[IP]"
  val PhoneToken = "[PHONE]"

  /** The ordered (pattern, replacement) chain. */
  val Chain: Seq[(String, String)] = Seq(
    EmailPattern -> EmailToken,
    Ipv4Pattern -> Ipv4Token,
    PhonePattern -> PhoneToken)

  /** `text` with all three categories redacted, in chain order. */
  def scrub(text: Column): Column =
    Chain.foldLeft(text) { case (c, (pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Per-category match counts `(emails, ipv4s, phones)`, each counted
    * on the string AFTER the previous categories were redacted (the
    * same sequence `scrub` applies). */
  def counts(text: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(text, EmailPattern, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, Ipv4Token)
    (regexp_count(text, lit(EmailPattern)).cast("long"),
      regexp_count(afterEmail, lit(Ipv4Pattern)).cast("long"),
      regexp_count(afterIp, lit(PhonePattern)).cast("long"))
  }
}

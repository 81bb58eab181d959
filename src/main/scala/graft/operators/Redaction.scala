package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: scrub
  * emails, phone numbers, and IPv4 addresses from a text column before
  * the corpus ships to training, and count what was removed (the
  * per-category counts are the curation report; a spike is an upstream
  * data-quality alarm).
  *
  * Engine notes:
  *  - Pure `regexp_replace`/`regexp_count` builtin compositions —
  *    codegen'd, narrow, scan-fused; at 100 TB this runs as a map-only
  *    pass with no shuffle (the rollup report aggregates the tiny
  *    per-category counts, not the text).
  *  - Patterns are written for the RE2/Java common subset (no
  *    backreferences, no lookaround, ASCII `\b`) so the DuckDB oracle
  *    executes the IDENTICAL pattern — regex-dialect parity is part of
  *    the contract, pinned by the q52 hash compare.
  *  - Order matters and is pinned: emails are redacted BEFORE phones so
  *    a digit-bearing local part ("555-1234@x.com") counts once, as an
  *    email; IPs before phones so dotted quads never half-match the
  *    phone pattern.
  */
object Redaction {

  /** `user@host.tld` — conservative: requires a dot-separated TLD of
    * letters so trailing punctuation stays outside the match. Letter
    * classes are `\p{L}` (Unicode letter — identical semantics in Java
    * regex and RE2, both UTF-8 native), so IDN hosts and non-ASCII
    * local parts ("müller@bücher.example") redact too; ASCII behavior
    * is unchanged ([A-Za-z] ⊂ \p{L}).
    */
  val EmailPattern = "[\\p{L}0-9._%+-]+@[\\p{L}0-9.-]+\\.\\p{L}{2,}"

  /** Separator class inside phone digit groups: ASCII dash/dot/space
    * plus the unicode spaces real web text carries (NBSP U+00A0, thin
    * space U+2009, narrow NBSP U+202F) — written with `\x{…}` escapes,
    * which parse identically in Java regex and RE2, so the one pattern
    * string serves both engines. `\b` stays ASCII-word-boundary in both
    * engines and these spaces are non-word chars in both — boundary
    * semantics agree.
    */
  val PhoneSep = "[-. \\x{00A0}\\x{2009}\\x{202F}]"

  /** North-American-ish phone shapes: optional +1 / 1 prefix, 3-3-4
    * digit groups separated by spaces, dots, or dashes, optional area-
    * code parens. Word-bounded so longer digit runs don't half-match —
    * the leading `\b` sits INSIDE the alternation, on each digit branch
    * only: before `(` or `+` a word boundary can never hold (both
    * neighbors are non-word), so a pattern-initial `\b` would silently
    * kill every parenthesized/plus-prefixed match. The bare-1 prefix
    * branch carries its own `\b` so a longer digit run ("91-415-…")
    * can't start a match mid-run at the '1'. Group separators are
    * [[PhoneSep]] (ASCII + unicode spaces).
    */
  val PhonePattern =
    s"(\\+1$PhoneSep|\\b1$PhoneSep)?(\\(\\d{3}\\)$PhoneSep?|\\b\\d{3}$PhoneSep)\\d{3}$PhoneSep\\d{4}\\b"

  /** Dotted-quad IPv4, each octet 0-255, word-bounded. */
  val Ipv4Pattern = {
    val octet = "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"
    s"\\b$octet\\.$octet\\.$octet\\.$octet\\b"
  }

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken = "<IP>"

  /** Number of email matches in `text`. */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))

  /** Number of IPv4 matches in `text` (count BEFORE phone redaction). */
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** Emails and IPv4s redacted — the shared intermediate BOTH the phone
    * count and the final redaction consume. Pipelines should compute
    * this ONCE as a named column in its own projection and derive
    * [[phoneCount]] / [[redactPhones]] from that column: inlining the
    * composed [[phoneCountPostEmail]]/[[redact]] forms into one select
    * re-evaluates these two regex passes per consumer when Catalyst's
    * common-subexpression elimination doesn't span the projections
    * (the round-8 q52 finding — ~30% of the query's cost).
    */
  def redactEmailIp(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, EmailToken),
      Ipv4Pattern, IpToken)

  /** Number of phone matches in an already email/IP-redacted column
    * ([[redactEmailIp]]) — counting on the raw text would double-count
    * digits inside emails and dotted quads.
    */
  def phoneCount(emailIpRedacted: Column): Column =
    regexp_count(emailIpRedacted, lit(PhonePattern))

  /** Phone redaction over an already email/IP-redacted column. */
  def redactPhones(emailIpRedacted: Column): Column =
    regexp_replace(emailIpRedacted, PhonePattern, PhoneToken)

  /** Number of phone matches in `text` AFTER emails and IPs are gone.
    * One-shot convenience; see [[redactEmailIp]] for the staged form.
    */
  def phoneCountPostEmail(text: Column): Column =
    phoneCount(redactEmailIp(text))

  /** Redacted text: emails, then IPv4, then phones (order pinned — see
    * object notes). One-shot convenience; see [[redactEmailIp]] for the
    * staged form.
    */
  def redact(text: Column): Column = redactPhones(redactEmailIp(text))
}

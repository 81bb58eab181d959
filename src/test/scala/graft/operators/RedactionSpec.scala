package graft.operators

import graft.SparkSpec

/** [[Redaction]]: pattern coverage (emails, parenthesized and dashed
  * phones, IPv4 octet bounds), replacement order (emails before IPs
  * before phones so digit-bearing local parts and dotted quads never
  * double-count), and count/redact agreement.
  */
class RedactionSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Seq(text).toDF("t")
      .select(
        Redaction.emailCount($"t").cast("long").as("e"),
        Redaction.ipv4Count($"t").cast("long").as("i"),
        Redaction.phoneCountPostEmail($"t").cast("long").as("p"),
        Redaction.redact($"t").as("red"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("emails: plain, digit local part, trailing punctuation excluded") {
    val (e, _, _, red) = one("mail a.b+c_1@sub.example.org, or x9@y.io.")
    assert(e == 2)
    assert(red == s"mail ${Redaction.EmailToken}, or ${Redaction.EmailToken}.")
  }

  test("phones: parenthesized area code matches (regression: a leading \\b can never precede '(')") {
    val (_, _, p1, red1) = one("call (415) 555-0042 now")
    assert(p1 == 1, s"parenthesized form must match, got $red1")
    assert(red1 == s"call ${Redaction.PhoneToken} now")
    val (_, _, p2, red2) = one("or +1 415.555.0042, or 415-555-0042")
    assert(p2 == 2)
    assert(red2 == s"or ${Redaction.PhoneToken}, or ${Redaction.PhoneToken}")
  }

  test("ipv4: octet bounds, no overshoot into longer digit runs") {
    val (_, i, _, red) = one("ok 10.0.255.1 and 256.1.1.1 and 1.2.3.4.5")
    // 256.x fails the octet bound; 1.2.3.4.5 — the \b guard rejects a
    // 5th dotted group on the right? No: 1.2.3.4 matches and .5 remains.
    assert(i == 2)
    assert(red.contains(s"ok ${Redaction.IpToken} and 256.1.1.1"))
  }

  test("order pinned: email local parts and IPs never count as phones") {
    val (e, i, p, red) = one("555-123-4567@example.com vs 10.555.123.45")
    assert(e == 1 && p == 0)
    assert(i == 0, "555 octet exceeds 255 so this is not an IP either")
    assert(red == s"${Redaction.EmailToken} vs 10.555.123.45")
  }

  test("bare-1 phone prefix is boundary-guarded: no mid-run match in longer digit runs") {
    // regression: the unguarded (\+?1[-. ])? prefix matched "1-415-555-0042"
    // INSIDE "91-415-555-0042", leaving a stray '9' next to the token;
    // the guarded prefix starts the match at the area code instead
    val (_, _, p, red) = one("ext 91-415-555-0042 and +1 415-555-0042")
    assert(p == 2, red)
    assert(red == s"ext 91-${Redaction.PhoneToken} and ${Redaction.PhoneToken}")
  }

  test("corpus invariant: the synthetic documents carry no bare-text PII " +
    "(q52's redacted_tail position math depends on it)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = docs.select(
      sum(Redaction.emailCount($"text").cast("long")).as("e"),
      sum(Redaction.ipv4Count($"text").cast("long")).as("i"),
      sum(Redaction.phoneCountPostEmail($"text").cast("long")).as("p"))
      .collect().head
    assert(r.getLong(0) == 0 && r.getLong(1) == 0 && r.getLong(2) == 0,
      s"bare corpus text contains PII-shaped strings: $r")
  }

  test("unicode: IDN emails with non-ASCII local parts redact") {
    val (e, _, _, red) = one("schreib müller@bücher.example oder böse.grüße@straße.org!")
    assert(e == 2, red)
    assert(red == s"schreib ${Redaction.EmailToken} oder ${Redaction.EmailToken}!")
  }

  test("unicode: NBSP / thin-space / narrow-NBSP phone separators match") {
    val (_, _, p, red) = one(
      "ruf +1 415 555 0042 oder 415 555 0042 an")
    assert(p == 2, red)
    assert(red ==
      s"ruf ${Redaction.PhoneToken} oder ${Redaction.PhoneToken} an")
  }

  test("counts agree with redact: n tokens appear for n matches") {
    val text = "a@b.co c@d.org (111) 555-2222 9.8.7.6"
    val (e, i, p, red) = one(text)
    assert(e == 2 && i == 1 && p == 1)
    def occurrences(s: String, sub: String): Int =
      s.sliding(sub.length).count(_ == sub)
    assert(occurrences(red, Redaction.EmailToken) == 2)
    assert(occurrences(red, Redaction.IpToken) == 1)
    assert(occurrences(red, Redaction.PhoneToken) == 1)
  }
}

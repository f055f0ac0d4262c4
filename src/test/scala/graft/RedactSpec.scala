package graft

import org.apache.spark.sql.functions._
import graft.operators.Redact

/** PII redaction: category coverage, chain-order semantics (counts on
  * the already-scrubbed string — no double counting), and non-PII
  * pass-through. */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): (String, Long, Long, Long) = {
    val df = Seq(s).toDF("t")
    val (e, i, p) = Redact.counts(col("t"))
    val r = df.select(Redact.scrub(col("t")), e, i, p).collect().head
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("each category redacts and counts") {
    assert(scrubOne("mail bob.smith+x@sub.example.co.uk end") ==
      (("mail [EMAIL] end", 1L, 0L, 0L)))
    assert(scrubOne("from 192.168.0.1 to 10.0.0.255") ==
      (("from [IP] to [IP]", 0L, 2L, 0L)))
    assert(scrubOne("call 555-0142 or 555-9999") ==
      (("call [PHONE] or [PHONE]", 0L, 0L, 2L)))
  }

  test("chain order: a phone-shaped run inside an email is counted once, as email") {
    val (out, e, i, p) = scrubOne("reach 555-1234@example.com now")
    assert(out == "reach [EMAIL] now")
    assert((e, i, p) == ((1L, 0L, 0L)))
  }

  test("clean text passes through untouched") {
    assert(scrubOne("no pii here, just words and 42 numbers") ==
      (("no pii here, just words and 42 numbers", 0L, 0L, 0L)))
  }

  test("word boundaries: digit runs inside longer tokens do not match") {
    // 5-digit run is not a 3-4 phone; version-ish dotted strings with a
    // 4-digit octet are not IPv4
    val (out, e, i, p) = scrubOne("id 55512-3456 v1.2.3.4567")
    assert((e, i, p) == ((0L, 0L, 0L)))
    assert(out == "id 55512-3456 v1.2.3.4567")
  }
}

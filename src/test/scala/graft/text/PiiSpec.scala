package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Seq(text).toDF("t")
      .select(
        Pii.emailCount($"t").cast("long"),
        Pii.ipCount($"t").cast("long"),
        Pii.phoneCount($"t").cast("long"),
        Pii.redact($"t"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("detects and redacts each PII type") {
    val (e, i, p, red) =
      one("mail a.b+c@ex-2.org from 192.168.0.1 tel +44-555-1234 end")
    assert((e, i, p) === (1L, 1L, 1L))
    assert(red === "mail [EMAIL] from [IP] tel [PHONE] end")
  }

  test("counts multiple matches and leaves clean text alone") {
    val (e, _, _, _) = one("x@y.com then z@w.net")
    assert(e === 2L)
    val clean = "just words 12.5 discount v1.2.3 not an ip +1 tel"
    val (e2, i2, p2, red2) = one(clean)
    assert((e2, i2, p2) === (0L, 0L, 0L))
    assert(red2 === clean)
  }

  test("emails with digit runs are scrubbed before numeric patterns") {
    // the local part contains an IP-shaped digit run; email-first order
    // must consume it whole
    val (e, i, _, red) = one("u1.2.3.4@host.com stays")
    assert(e === 1L)
    assert(i === 0L)
    assert(red === "[EMAIL] stays")
  }

  test("version-like dotted numbers with 5 octets match once, leftmost") {
    val (_, i, _, red) = one("build 1.2.3.4.5")
    // \b\d{1,3}(\.\d{1,3}){3}\b on "1.2.3.4.5": the '.' after the 4th
    // octet IS a word boundary (digit -> non-word), so the LEFTMOST four
    // octets "1.2.3.4" match and the trailing ".5" survives; pin the
    // cross-engine behavior by asserting the redacted span.
    assert(i === 1L)
    assert(red === "build [IP].5")
  }
}

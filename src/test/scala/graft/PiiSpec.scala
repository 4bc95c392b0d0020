package graft

import org.apache.spark.sql.functions._
import graft.functions.PiiFunctions

/** PII detection/redaction behavior on pinned strings (the oracle checks
  * cross-engine parity; this pins the intended semantics). */
class PiiSpec extends SparkSuite {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("text").select(PiiFunctions.redactPii($"text")).as[String].head

  test("each PII family redacts to its typed placeholder") {
    assert(redact("mail bob99@mail.example.org now") == "mail <EMAIL> now")
    assert(redact("ssn 123-45-6789 on file") == "ssn <SSN> on file")
    assert(redact("call 555-867-5309 or 410.555.1234") == "call <PHONE> or <PHONE>")
    assert(redact("from 192.168.1.100 port 80") == "from <IP> port 80")
  }

  test("families do not cross-match: SSN grouping is not a phone, dotted phone is not an IP") {
    assert(redact("123-45-6789") == "<SSN>")
    assert(redact("123-456-7890") == "<PHONE>")
    assert(redact("123.456.7890") == "<PHONE>")
    assert(redact("10.0.0.7") == "<IP>")
    // plain digit runs and dates are untouched
    assert(redact("order 123456789 on 2025-11-07") == "order 123456789 on 2025-11-07")
  }

  test("counts are per-family and additive") {
    val df = Seq("a@b.co and c@d.org, ssn 111-22-3333, from 10.0.0.1").toDF("text")
      .select(PiiFunctions.emailCount($"text").as("e"),
        PiiFunctions.ssnCount($"text").as("s"),
        PiiFunctions.phoneCount($"text").as("p"),
        PiiFunctions.ipv4Count($"text").as("i"),
        PiiFunctions.piiCount($"text").as("t"))
    assert(df.as[(Long, Long, Long, Long, Long)].head == ((2L, 1L, 0L, 1L, 4L)))
  }

  test("null text stays null through redaction and counting") {
    val df = Seq[Option[String]](None).toDF("text")
      .select(PiiFunctions.redactPii($"text").isNull.as("r"),
        PiiFunctions.piiCount($"text").isNull.as("c"))
    assert(df.as[(Boolean, Boolean)].head == ((true, true)))
  }
}

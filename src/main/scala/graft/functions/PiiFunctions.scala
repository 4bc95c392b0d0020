package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora — the scrub step every
  * large-scale text pipeline runs before training (emails, phone numbers,
  * SSNs, IPv4 addresses → typed placeholder tokens).
  *
  * Pure `regexp_replace`/`regexp_count` column programs: codegen'd, zero
  * shuffle, scale = scan speed. The patterns deliberately use only the
  * regex subset with identical semantics in Java (Spark) and RE2 (DuckDB
  * oracle): no lookaround, no backreferences, ASCII classes and word
  * boundaries only — so redacted output is bit-identical across engines.
  *
  * Redaction applies patterns in a fixed order (email → SSN → phone → IP);
  * counting runs each pattern independently against the ORIGINAL text. The
  * shapes are mutually exclusive (an SSN's 3-2-4 digit grouping can't match
  * the phone's 3-3-4; a dotted phone's 4-digit tail can't parse as IPv4),
  * so order only matters for overlapping spans inside one family.
  */
object PiiFunctions {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)).cast("long")
  def ssnCount(text: Column): Column =
    regexp_count(text, lit(SsnPattern)).cast("long")
  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern)).cast("long")
  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Pattern)).cast("long")

  def piiCount(text: Column): Column =
    emailCount(text) + ssnCount(text) + phoneCount(text) + ipv4Count(text)

  /** Text with every PII span replaced by its typed placeholder. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "<EMAIL>"),
          SsnPattern, "<SSN>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")
}

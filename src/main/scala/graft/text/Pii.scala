package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-corpus curation (the scrubbing
  * pass public pipelines run before packing — e.g. the email/IP/phone
  * regex filters described for C4/CCNet-style cleaning): per-document
  * match counts plus a redacted text column with typed placeholders.
  *
  * Scale shape: pure codegen'd projections (`regexp_count` /
  * `regexp_replace`) — no shuffle, no state, no driver participation;
  * the pass pipelines into any downstream scan.
  *
  * The patterns deliberately stay inside the Java-regex ∩ RE2 dialect
  * (character classes, bounded repetition, `\b`) so the SAME pattern
  * strings run in Spark and in the DuckDB oracle.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** Per-type match counts for a text column. */
  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))

  /** Typed-placeholder redaction, applied email -> ip -> phone (emails
    * can contain digit runs, so they are scrubbed before the numeric
    * patterns look at the remainder).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipv4Re, "[IP]"),
      phoneRe, "[PHONE]")
}

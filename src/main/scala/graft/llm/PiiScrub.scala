package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the standard pre-training scrub pass
  * (emails, phone numbers, IPv4 addresses) every public-crawl pipeline
  * runs before tokenization (e.g. the C4/Dolma cleanup steps).
  *
  * Patterns are deliberately restricted to the common subset of Java
  * regex (Spark codegen) and RE2 (DuckDB oracle): character classes,
  * greedy counted quantifiers, `\b` word boundaries — no lookaround, no
  * backreferences — so both engines match identically and the oracle
  * gate can hash-compare redacted output.
  *
  * Scale shape: a pure per-row projection — `regexp_count` and chained
  * `regexp_replace` are codegen'd, zero shuffle, no UDF. */
object PiiScrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val Ipv4Pattern  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val Ipv4Token  = "<IP>"

  /** Redacted form of a text column (emails, then phones, then IPv4 —
    * order matters only in that the replacement tokens must not feed a
    * later pattern, and these don't). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        PhonePattern, PhoneToken),
      Ipv4Pattern, Ipv4Token)

  /** Per-document PII counts + redacted text. Input keeps all columns;
    * adds n_emails / n_phones / n_ips (long) and `redacted`. */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)).cast("long"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)).cast("long"))
      .withColumn("n_ips", regexp_count(col(textCol), lit(Ipv4Pattern)).cast("long"))
      .withColumn("redacted", redact(col(textCol)))
}

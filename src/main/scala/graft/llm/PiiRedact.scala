package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass a
  * training-data pipeline runs before anything else sees the corpus.
  *
  * Pure `regexp_replace`/`regexp_count` chains: codegen'd, shuffle-free,
  * pushdown-friendly — a narrow map over the scan at any scale. The
  * patterns deliberately use only syntax with IDENTICAL semantics in
  * Java regex (Spark) and RE2 (DuckDB/oracle): character classes, bounded
  * repetition, and ASCII `\b` word boundaries — no lookarounds or
  * backreferences (RE2 has neither), so every match decision replays
  * exactly in SQL.
  *
  * Redaction order is fixed (email → IPv4 → phone): an IPv4-like dotted
  * quad must be consumed before the looser `ddd.ddd.dddd` phone form can
  * see its digits. Counts are measured per pattern on the RAW text,
  * independent of redaction order.
  */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** `text` with emails, IPv4 addresses, and phone numbers replaced by
    * typed placeholders. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document redacted text plus raw-text match counts per category. */
  def redactWithCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      redact(col(textCol)).as(textCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"))
}

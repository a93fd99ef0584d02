package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data scrubbing: emails, NANP
  * phone fragments, and IPv4 addresses found in free text are counted and
  * replaced with `[EMAIL]` / `[PHONE]` / `[IP]` placeholder tokens.
  *
  * The patterns are deliberately restricted to the regex subset that both
  * java.util.regex (Spark codegen'd `regexp_replace`/`regexp_count`) and
  * RE2 (the DuckDB oracle) evaluate identically: character classes, bounded
  * repetition and `\b` — no backreferences or lookaround. All three classes
  * are per-row narrow transforms: no shuffle, fully codegen'd, and the
  * filter composes with any downstream projection pushdown.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))

  /** Redacted text. Order matters and is fixed: emails first (their local
    * part may contain digits a later pass could misread), then IPv4 (dots),
    * then phones (dashes) — the three placeholder tokens contain no
    * digits, so passes cannot cascade into each other's output.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Scrub stage: appends per-class counts and the redacted text. */
  def scrub(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_email", emailCount(text).cast("long"))
      .withColumn("n_phone", phoneCount(text).cast("long"))
      .withColumn("n_ip", ipv4Count(text).cast("long"))
      .withColumn("redacted", redact(text))

  /** Deterministic PII injection recipe for tests/oracles: the synthetic
    * corpus contains no organic PII, so fixtures plant it reproducibly from
    * the row id (both engines replay the same arithmetic; see the
    * q_pii_scrub oracle SQL for the DuckDB side).
    */
  def injected(text: Column, id: Column): Column = {
    val idStr = id.cast("string")
    concat(
      text,
      when(id % 5 === 0,
        concat(lit(" contact user"), idStr, lit("@example.com"))).otherwise(""),
      when(id % 7 === 0,
        concat(lit(" call 555-"), (id % 9000 + 1000).cast("string"))).otherwise(""),
      when(id % 11 === 0,
        concat(lit(" from 10."), (id % 256).cast("string"),
          lit("."), (id * 13 % 256).cast("string"),
          lit("."), (id % 250 + 1).cast("string"))).otherwise(""))
  }
}

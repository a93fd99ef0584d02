package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical text normalization — the first pass of corpus cleaning:
  * Unicode NFC composition (é as one codepoint, not e + combining accent),
  * locale-independent lowercasing, and whitespace-run collapse. Dedup
  * keys, vocabulary builds, and contamination checks all assume this
  * canonical form; skipping it splits "Café" / "Café" into distinct
  * tokens and near-dup keys.
  *
  * Implementation: one JVM kernel pass (java.text.Normalizer — Spark SQL
  * ships no Unicode-normalization function). Narrow map, no shuffle,
  * corpus-size-independent per-row cost. The pipeline order is pinned by
  * the q_normalize oracle: NFC → lower → collapse \s+ runs to one space →
  * trim the (now plain-space) edges, which is exactly DuckDB's
  * trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')).
  */
object Normalize {

  private[graft] def normalize(s: String): String = {
    if (s == null) return null
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    nfc.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
  }

  private val normalizeUdf = udf { (s: String) => normalize(s) }

  /** Normalized text column. */
  def apply(text: Column): Column = normalizeUdf(text)
}

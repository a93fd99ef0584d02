package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is pure `org.apache.spark.sql.functions` column algebra
  * (no UDFs), so the whole stage stays inside whole-stage codegen and
  * scales as a narrow map over the corpus — the per-document cost is
  * independent of corpus size and there is no shuffle.
  */
object TextStats {

  /** Whitespace tokens; empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace-collapsed text: the flat-string basis for token math
    * (plain string functions are codegen'd; array higher-order functions
    * are interpreted — prefer the flat forms in hot paths).
    */
  def collapsed(text: Column): Column = regexp_replace(trim(text), "\\s+", " ")

  def tokenCount(text: Column): Column = {
    val c = collapsed(text)
    when(length(c) === 0, 0).otherwise(regexp_count(c, lit(" ")) + 1)
  }

  /** BPE-ish subword count: word-piece chunks of ≤4 chars plus
    * digit/punctuation singletons, approximating a BPE vocab's token rate
    * without a vocab file.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  def charCount(text: Column): Column = length(text)
  def punctCount(text: Column): Column = size(regexp_extract_all(text, lit("\\p{Punct}"), lit(0)))
  def digitCount(text: Column): Column = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
  def upperCount(text: Column): Column = size(regexp_extract_all(text, lit("[A-Z]"), lit(0)))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0d).otherwise(punctCount(text).cast("double") / length(text))

  /** Mean word length without arrays: in the collapsed form, total word
    * chars = length - (n_tokens - 1) separators.
    */
  def meanWordLength(text: Column): Column = {
    val tc = tokenCount(text)
    when(tc === 0, 0d).otherwise(
      (length(collapsed(text)) - (tc - 1)).cast("double") / tc)
  }

  /** Marker regex for a language's stopword list: \b word boundaries for
    * ASCII-word markers; bare alternation for scripts (CJK) where \b never
    * matches in ASCII-\w regex engines. Shared with the SQL oracles so
    * both engines count identically.
    */
  def markerPattern(stopwords: Seq[String]): String =
    if (stopwords.forall(_.forall(c => c.isLetterOrDigit && c < 128)))
      "\\b(" + stopwords.mkString("|") + ")\\b"
    else "(" + stopwords.mkString("|") + ")"

  /** Stopword hit count for one language's marker list (regexp_count —
    * same count as len(regexp_extract_all) without materializing the
    * match array).
    */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    regexp_count(lower(text), lit(markerPattern(stopwords)))

  def stopwordRatio(text: Column, stopwords: Seq[String] = StopwordsEn): Column =
    when(tokenCount(text) === 0, 0d)
      .otherwise(stopwordCount(text, stopwords).cast("double") / tokenCount(text))

  val StopwordsEn = Seq("the", "and", "of", "to", "a", "in", "is", "it")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "es")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "von", "ein", "zu")
  val StopwordsFr = Seq("le", "la", "les", "de", "et", "un", "est", "que")
  val StopwordsZh = Seq("的", "是", "了", "在", "和", "有", "我", "不")

  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> StopwordsEn, "es" -> StopwordsEs, "de" -> StopwordsDe,
    "fr" -> StopwordsFr, "zh" -> StopwordsZh)

  /** N-gram-heuristic language ID: argmax of per-language marker counts,
    * first language wins ties (deterministic), "und" when nothing matches.
    *
    * Inline Column form — every score regex re-evaluates in `best` AND in
    * its `when` branch (no CSE across sibling expressions). Prefer
    * [[withLangId]] on hot paths, which binds each score once per row.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, words) =>
      lang -> stopwordCount(text, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** langId as a DataFrame stage: the five marker counts and their max are
    * materialized as bound columns, so each regexp_count runs exactly once
    * per row (the argmax fold then only compares attributes). CollapseProject
    * keeps multi-referenced non-cheap aliases bound, so the 2-6× redundant
    * regex work of the inline form never reappears.
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, text: Column,
                 out: String): org.apache.spark.sql.DataFrame = {
    val names = LangMarkers.map { case (lang, _) => s"_ls_$lang" }
    val withScores = LangMarkers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"_ls_$lang", stopwordCount(text, words))
    }
    val withBest = withScores.withColumn("_ls_best",
      greatest(names.map(col): _*))
    val pred = LangMarkers.foldRight(lit("und"): Column) { case ((lang, _), acc) =>
      when(col(s"_ls_$lang") === col("_ls_best") && col("_ls_best") > 0,
        lit(lang)).otherwise(acc)
    }
    withBest.withColumn(out, pred).drop(names :+ "_ls_best": _*)
  }

  /** Composite quality score in [0,1]: length band, punctuation sanity,
    * stopword presence, mean word length band. The exact recipe is a
    * heuristic; what matters operationally is that it is deterministic,
    * codegen-friendly, and cheap at corpus scale.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = when(charCount(text).between(100, 20000), 1d)
      .when(charCount(text) < 100, charCount(text) / 100d)
      .otherwise(lit(20000d) / charCount(text))
    val punctScore = when(punctRatio(text) <= 0.2, 1d)
      .otherwise(greatest(lit(0d), lit(1d) - (punctRatio(text) - 0.2) * 2))
    val stopScore = least(lit(1d), stopwordRatio(text) * 5)
    val mwl = meanWordLength(text)
    val wordScore = when(mwl.between(3, 10), 1d).otherwise(0.5d)
    round((lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wordScore * 0.2), 6)
  }

  /** Stable document fingerprint (md5 of the normalized text). */
  def fingerprintMd5(text: Column): Column = md5(lower(collapsed(text)))

  /** Polynomial rolling hash over characters, mod 1e9+7 — stays in 64-bit
    * range in any engine, no UDF (functions.aggregate over the char array).
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => pmod(acc * 31L + coalesce(ascii(ch).cast("long"), lit(0L)), lit(1000000007L)))
}

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

  /** JVM kernel: non-overlapping, alternation-ordered marker counting with
    * \b-equivalent ASCII word boundaries — semantics identical to
    * `regexp_count(lower(text), markerPattern(words))` (java.util.regex
    * leftmost scan, alternatives tried in list order, resume after the
    * match), in one pass without the regex engine.
    */
  private[llm] def countMarkers(lower: String, markers: Array[String],
                                boundaries: Boolean): Int = {
    val n = lower.length
    @inline def isWord(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
    var count = 0
    var i = 0
    while (i < n) {
      var matched = 0
      var m = 0
      while (m < markers.length && matched == 0) {
        val w = markers(m)
        if (lower.startsWith(w, i) &&
            (!boundaries ||
              ((i == 0 || !isWord(lower.charAt(i - 1))) &&
               (i + w.length >= n || !isWord(lower.charAt(i + w.length))))))
          matched = w.length
        m += 1
      }
      if (matched > 0) { count += 1; i += matched } else i += 1
    }
    count
  }

  private lazy val langMarkerKernels: Seq[(String, Array[String], Boolean)] =
    LangMarkers.map { case (lang, words) =>
      (lang, words.toArray,
        words.forall(_.forall(c => c.isLetterOrDigit && c < 128)))
    }

  /** Single-pass language ID as a scalar UDF: one lowercase + five
    * startsWith-scan marker counts per document, ~5× the throughput of the
    * five-regex column form (java.util.regex NFA vs a direct scan) — the
    * justified-UDF pattern this codebase uses for hot non-columnar kernels
    * (see Dedup's MinHash fold). Ties keep the first language, "und" when
    * nothing matches: same argmax as [[withLangId]].
    */
  val langIdUdf = udf { (text: String) =>
    if (text == null) "und"
    else {
      val lower = text.toLowerCase
      var bestLang = "und"
      var best = 0
      langMarkerKernels.foreach { case (lang, markers, ascii) =>
        val c = countMarkers(lower, markers, boundaries = ascii)
        if (c > best) { best = c; bestLang = lang }
      }
      bestLang
    }
  }

  /** Single-pass text-statistics kernel for the quality score: character
    * length, punctuation count (\p{Punct} = ASCII POSIX punct, matching
    * java.util.regex and DuckDB [[:punct:]]), whitespace token count,
    * collapsed length, and English stopword hits (boundary semantics of
    * [[countMarkers]]) — one scan + one lowercase instead of four separate
    * regex passes over the corpus. Returned as the same bound intermediate
    * columns the column-algebra form computes.
    */
  val qualityStatsUdf = udf { (text: String) =>
    val t = if (text == null) "" else text
    val len = t.length
    @inline def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    @inline def isPunct(c: Char): Boolean =
      (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
    var nPunct = 0
    var nonSpace = 0
    var tokens = 0
    var inToken = false
    var i = 0
    while (i < len) {
      val c = t.charAt(i)
      if (isPunct(c)) nPunct += 1
      if (isSpace(c)) inToken = false
      else {
        nonSpace += 1
        if (!inToken) { tokens += 1; inToken = true }
      }
      i += 1
    }
    val collapsedLen = if (tokens == 0) 0 else nonSpace + (tokens - 1)
    val stops =
      if (tokens == 0) 0
      else countMarkers(t.toLowerCase, StopwordsEn.toArray, boundaries = true)
    val pr = if (len == 0) 0d else nPunct.toDouble / len
    val sr = if (tokens == 0) 0d else stops.toDouble / tokens
    val mwl = if (tokens == 0) 0d else (collapsedLen - (tokens - 1)).toDouble / tokens
    (len, pr, sr, mwl)
  }

  /** [[qualityScore]] computed from the single-pass [[qualityStatsUdf]]
    * kernel instead of four regex passes — same bands, same 6-dp result
    * (LlmSpec pins the kernel/columnar equivalence). Stateless column —
    * identical in batch (q_quality's oracle pins it against DuckDB) and
    * streaming (DocStream.qualityGate).
    */
  def qualityScoreKernel(text: Column): Column = {
    val qs = qualityStatsUdf(text)
    round(
      (when(qs.getField("_1").between(100, 20000), 1d)
        .when(qs.getField("_1") < 100, qs.getField("_1") / 100d)
        .otherwise(lit(20000d) / qs.getField("_1"))) * 0.3
      + (when(qs.getField("_2") <= 0.2, 1d)
          .otherwise(greatest(lit(0d), lit(1d) - (qs.getField("_2") - 0.2) * 2))) * 0.3
      + least(lit(1d), qs.getField("_3") * 5) * 0.2
      + (when(qs.getField("_4").between(3, 10), 1d).otherwise(0.5d)) * 0.2,
      6)
  }

  /** Single-pass kernel for the basic text statistics: whitespace token
    * count, sentence-punctuation count ([.,!?;:] over the original text),
    * mean word length, and the whitespace-collapsed form (for columnar
    * md5 fingerprinting) — one scan instead of four regex passes.
    * Semantics identical to the column-algebra forms above (LlmSpec pins
    * the equivalence).
    */
  val textStatsUdf = udf { (text: String) =>
    val t = if (text == null) "" else text
    val len = t.length
    @inline def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    @inline def isSentencePunct(c: Char): Boolean =
      c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':'
    val sb = new java.lang.StringBuilder(len)
    var nPunct = 0
    var tokens = 0
    var inToken = false
    var i = 0
    while (i < len) {
      val c = t.charAt(i)
      if (isSentencePunct(c)) nPunct += 1
      if (isSpace(c)) inToken = false
      else {
        if (!inToken) { tokens += 1; if (tokens > 1) sb.append(' ') }
        inToken = true
        sb.append(c)
      }
      i += 1
    }
    val collapsed = sb.toString
    val mwl =
      if (tokens == 0) 0d
      else (collapsed.length - (tokens - 1)).toDouble / tokens
    (tokens, nPunct, mwl, collapsed)
  }

  /** [[textStatsUdf]] with the fingerprint folded in: instead of carrying
    * the whitespace-collapsed string back across the UDF boundary (a full
    * UTF8String copy per document — the cost that regressed q_text_stats in
    * BENCH_r02), the kernel md5-hashes lower(collapsed) itself and returns
    * only the 32-char hex. Same one-pass scan; the tuple payload shrinks
    * from O(doc) to O(1). Hash identical to `md5(lower(collapsed(text)))`
    * (UTF-8 bytes; LlmSpec pins the equivalence).
    */
  val textStatsMd5Udf = udf { (text: String) =>
    val t = if (text == null) "" else text
    val len = t.length
    @inline def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    @inline def isSentencePunct(c: Char): Boolean =
      c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':'
    val sb = new java.lang.StringBuilder(len)
    var nPunct = 0
    var tokens = 0
    var inToken = false
    var i = 0
    while (i < len) {
      val c = t.charAt(i)
      if (isSentencePunct(c)) nPunct += 1
      if (isSpace(c)) inToken = false
      else {
        if (!inToken) { tokens += 1; if (tokens > 1) sb.append(' ') }
        inToken = true
        sb.append(c)
      }
      i += 1
    }
    val collapsed = sb.toString
    val mwl =
      if (tokens == 0) 0d
      else (collapsed.length - (tokens - 1)).toDouble / tokens
    // lowercase via UTF8String — byte-identical to Spark's lower(), which
    // the green r2 oracle pinned (per-char Character.toLowerCase diverges
    // on conditional mappings like final sigma)
    val digest = java.security.MessageDigest.getInstance("MD5").digest(
      org.apache.spark.unsafe.types.UTF8String
        .fromString(collapsed).toLowerCase.getBytes)
    val hex = new java.lang.StringBuilder(32)
    var d = 0
    while (d < digest.length) {
      hex.append(Character.forDigit((digest(d) >> 4) & 0xf, 16))
      hex.append(Character.forDigit(digest(d) & 0xf, 16))
      d += 1
    }
    (tokens, nPunct, mwl, hex.toString)
  }

  /** Single-pass subword/token-count kernel: counts matches of the BPE-ish
    * tokenizer regex `[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]` (greedy leftmost,
    * non-overlapping — a run of L letters yields ⌈L/4⌉ chunks, digits and
    * non-alphanumeric glyphs are singletons, whitespace matches nothing)
    * plus the whitespace token count, without two regex passes over the
    * corpus. Equivalence to [[subwordCount]]/[[tokenCount]] is spec-pinned.
    */
  val subwordStatsUdf = udf { (text: String) =>
    val t = if (text == null) "" else text
    val len = t.length
    @inline def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    @inline def isAlpha(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    var subwords = 0
    var i = 0
    while (i < len) {
      val c = t.charAt(i)
      if (isSpace(c)) i += 1
      else if (isAlpha(c)) {
        var j = i + 1
        while (j < len && j < i + 4 && isAlpha(t.charAt(j))) j += 1
        subwords += 1
        i = j
      } else { subwords += 1; i += 1 } // digit or other glyph: singleton
    }
    // token count: EXACT [[tokenCount]] semantics — fields of a \s+ split
    // of the SPACE-trimmed string (Spark/DuckDB trim strips ' ' only; edge
    // runs of other whitespace contribute empty fields, so "\tfoo" is 2)
    var a = 0
    var b = len
    while (a < b && t.charAt(a) == ' ') a += 1
    while (b > a && t.charAt(b - 1) == ' ') b -= 1
    var tokens = 0
    if (b > a) {
      tokens = 1
      var inWs = false
      var p = a
      while (p < b) {
        val ws = isSpace(t.charAt(p))
        if (ws && !inWs) tokens += 1
        inWs = ws
        p += 1
      }
    }
    (subwords, tokens)
  }

  /** Single-pass repetition kernel (the Gopher-style repetition signals):
    * fraction of tokens taken by the single most frequent word, and the
    * fraction of DUPLICATE bigrams (1 − distinct/total) — both over the
    * lowercased whitespace tokens. Repetitive machine-generated or
    * boilerplate text scores high on both; natural prose stays low. Blank
    * or sub-2-token documents score (0, 0). Per-document narrow map: no
    * shuffle, no explode — the token table never materializes.
    *
    * Lowercasing goes through UTF8String for byte parity with Spark's
    * `lower()` / the DuckDB oracle (identical on ASCII; conditional
    * Unicode mappings follow Spark, see [[textStatsMd5Udf]]).
    */
  val repetitionUdf = udf { (text: String) =>
    val t0 = if (text == null) "" else text
    val t = org.apache.spark.unsafe.types.UTF8String.fromString(t0)
      .toLowerCase.toString
    val len = t.length
    @inline def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val counts = new java.util.HashMap[String, Int]()
    val bigrams = new java.util.HashSet[String]()
    var tokens = 0
    var maxCount = 0
    var prev: String = null
    var i = 0
    while (i < len) {
      while (i < len && isSpace(t.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(t.charAt(i))) i += 1
        val tok = t.substring(start, i)
        tokens += 1
        val c = counts.merge(tok, 1, Integer.sum)
        if (c > maxCount) maxCount = c
        if (prev != null) bigrams.add(prev + " " + tok)
        prev = tok
      }
    }
    val topWordFrac = if (tokens == 0) 0d else maxCount.toDouble / tokens
    val dupBigramFrac =
      if (tokens < 2) 0d else 1d - bigrams.size.toDouble / (tokens - 1)
    (topWordFrac, dupBigramFrac)
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

  /** Corpus-frequency quality signal: each document's mean unigram
    * log-probability under the corpus's own unigram distribution — the
    * classic cheap language-model proxy (rare-token-heavy garbage scores
    * low, natural text scores high).
    *
    * Scale shape: explode to (doc, token) pairs, aggregate the vocabulary,
    * join counts back by token, average per doc. All shuffles carry slim
    * (token, id) pairs; the corpus total is a one-row aggregate. The
    * tokenization is a narrow re-computable map (re-run for the vocab pass
    * and the join pass rather than caching a corpus-sized token table).
    */
  def unigramLogProb(df: org.apache.spark.sql.DataFrame, id: Column,
                     text: Column): org.apache.spark.sql.DataFrame = {
    val toks = df.select(id.as("id"), explode(tokens(lower(text))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // corpus token total as a one-row broadcast INSIDE the plan (round
    // 14, guide §1.2): the r13 shape ran vocab.agg(sum).head() as a
    // separate driver action — a whole extra tokenize + aggregate pass
    // per invocation — for one scalar the main job computes itself.
    // Same double (long sum cast), same arithmetic downstream.
    val totDf = vocab.agg(sum("cnt").cast("double").as("_tot"))
    toks.join(vocab, "tok")
      .crossJoin(broadcast(totDf))
      .groupBy("id")
      .agg(avg(log(col("cnt").cast("double") / col("_tot"))).as("logprob"))
  }

  /** Per-document KL divergence KL(p_doc ‖ p_corpus) over unigrams — the
    * "typicality" quality score: how far each document's own token
    * distribution sits from the corpus distribution. Near-0 marks
    * corpus-typical text; high values mark outliers (wrong language,
    * boilerplate, token spam). Complements [[unigramLogProb]] (which
    * scores tokens only by corpus rarity, blind to within-doc shape).
    *
    * Scale shape: explode to (doc, token), aggregate per-doc term counts
    * (ONE slim keyed shuffle), per-doc totals via a window PARTITIONED BY
    * doc (no second shuffle — same partitioning), corpus vocabulary by one
    * partial-aggregated groupBy, corpus total as a one-row scalar collect
    * (the [[unigramLogProb]] pattern). The vocab join shuffles slim
    * (token, cnt) rows and broadcasts when small.
    */
  def klDivergence(df: org.apache.spark.sql.DataFrame, id: Column,
                   text: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(id.as("id"), explode(tokens(lower(text))).as("tok"))
    val dt = toks.groupBy("id", "tok").agg(count(lit(1)).as("c_dt"))
      .withColumn("t_d", sum(col("c_dt")).over(Window.partitionBy(col("id"))))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c_t"))
    val total = vocab.agg(sum("c_t")).head().getLong(0).toDouble
    dt.join(vocab, "tok")
      .groupBy("id")
      .agg(sum((col("c_dt").cast("double") / col("t_d"))
        * log((col("c_dt").cast("double") / col("t_d"))
          / (col("c_t").cast("double") / total))).as("kl"))
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

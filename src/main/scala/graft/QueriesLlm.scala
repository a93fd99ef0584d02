package graft

import graft.llm.{Boilerplate, Decontaminate, Dedup, Fusion, Incremental, Mixing, Multimodal, Packing, Pii, Similarity, TextStats, TfIdf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline operators as driver-checkable queries
  * (BASELINE.json north-star: dedup, similarity search, text analysis,
  * multimodal columns). Oracle SQL is provided wherever DuckDB can express
  * the same computation; sketch-based operators (MinHash/SimHash/LSH) get
  * deterministic rows-only queries plus ScalaTest coverage.
  */
object QueriesLlm {

  type Q = (SparkSession, String) => DataFrame

  /** q_dedup_exact — exact dedup keeping first doc per key (key = text
    * prefix so sf data actually contains duplicates). Hash-groupBy +
    * semi-join: the shuffle carries (hash, id) only.
    */
  val qDedupExact: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Dedup.exact(docs, substring(col("text"), 1, 30), col("doc_id"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  val qDedupExactSql: String =
    """SELECT doc_id, lang, n_chars FROM (
      |  SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY substr(text, 1, 30) ORDER BY doc_id) AS rn
      |  FROM documents) WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** q_dedup_window — first event per user (window-rank dedup shape). */
  val qDedupWindow: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id")
  }

  val qDedupWindowSql: String =
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** q_text_stats — per-document token/char/punctuation statistics + md5
    * fingerprint, all codegen'd column algebra.
    */
  val qTextStats: Q = (s, dir) => {
    val t = col("text")
    // all four stats + the md5 fingerprint come from the single-pass JVM
    // kernel (one scan vs four regex passes; LlmSpec pins equivalence).
    // The fingerprint is hashed INSIDE the kernel: returning the collapsed
    // string through the UDF boundary cost a per-doc UTF8String copy that
    // regressed this query 3.4x in BENCH_r02.
    Tables.documents(s, dir)
      .withColumn("_ts", TextStats.textStatsMd5Udf(t))
      .select(
        col("doc_id"),
        // long casts match DuckDB's BIGINT len()/count results in case the
        // driver compares schemas strictly
        col("_ts._1").cast("long").as("n_tokens"),
        length(t).cast("long").as("len"),
        col("_ts._2").cast("long").as("n_punct"),
        round(col("_ts._3"), 6).as("mean_word_len"),
        col("_ts._4").as("fp_md5"))
      .orderBy("doc_id")
  }

  val qTextStatsSql: String =
    """SELECT doc_id,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
      |  length(text) AS len,
      |  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
      |  round(CASE WHEN length(trim(text)) = 0 THEN 0
      |    ELSE list_aggregate(list_transform(regexp_split_to_array(trim(text), '\s+'),
      |         x -> length(x)), 'sum')::DOUBLE
      |         / len(regexp_split_to_array(trim(text), '\s+')) END, 6) AS mean_word_len,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q_lang_id — stopword-marker language ID (argmax, first-wins ties).
    * Single-pass JVM kernel UDF (TextStatsSpec pins its equivalence to the
    * bound-column regex form, and the DuckDB oracle pins the values).
    */
  val qLangId: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TextStats.langIdUdf(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  val qLangIdSql: String = {
    def cnt(words: Seq[String]) =
      s"len(regexp_extract_all(lower(text), '${TextStats.markerPattern(words)}'))"
    val markers = TextStats.LangMarkers
    val scores = markers.map { case (l, w) => s"${cnt(w)} AS c_$l" }.mkString(",\n    ")
    val g = "greatest(" + markers.map { case (l, _) => s"c_$l" }.mkString(", ") + ")"
    val cases = markers.map { case (l, _) => s"WHEN c_$l = g AND g > 0 THEN '$l'" }
      .mkString(" ")
    s"""SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_pred FROM (
       |  SELECT doc_id, lang, $g AS g, c_en, c_es, c_de, c_fr, c_zh FROM (
       |    SELECT doc_id, lang,
       |    $scores
       |    FROM documents)
       |) ORDER BY doc_id""".stripMargin
  }

  /** q_quality — composite quality score. The four per-document stats come
    * from the single-pass JVM kernel (one scan + one lowercase vs four
    * regex passes; LlmSpec pins its equivalence to the column-algebra
    * form); the weighted band arithmetic stays column algebra.
    */
  /** The composite quality score (doc_id, quality 6-dp) for any
    * documents-shaped frame — shared by q_quality, q_quality_filter, and
    * the q_pipeline_e2e composition.
    */
  def qualityOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), TextStats.qualityScoreKernel(col("text")).as("quality"))

  val qQuality: Q = (s, dir) =>
    qualityOf(Tables.documents(s, dir)).orderBy("doc_id")

  val qQualitySql: String = {
    val cnt = s"len(regexp_extract_all(lower(text), '${TextStats.markerPattern(TextStats.StopwordsEn)}'))"
    """WITH t AS (
      |  SELECT doc_id, length(text) AS len,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
      |    CASE WHEN length(text) = 0 THEN 0
      |         ELSE len(regexp_extract_all(text, '[[:punct:]]'))::DOUBLE / length(text) END AS pr,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE list_aggregate(list_transform(regexp_split_to_array(trim(text), '\s+'),
      |              x -> length(x)), 'sum')::DOUBLE
      |              / len(regexp_split_to_array(trim(text), '\s+')) END AS mwl,
      |    CNT AS c_en
      |  FROM documents)
      |SELECT doc_id, round(
      |  (CASE WHEN len BETWEEN 100 AND 20000 THEN 1.0
      |        WHEN len < 100 THEN len / 100.0 ELSE 20000.0 / len END) * 0.3
      |  + (CASE WHEN pr <= 0.2 THEN 1.0
      |          ELSE greatest(0.0, 1.0 - (pr - 0.2) * 2) END) * 0.3
      |  + least(1.0, (CASE WHEN n_tok = 0 THEN 0 ELSE c_en::DOUBLE / n_tok END) * 5) * 0.2
      |  + (CASE WHEN mwl BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
      |FROM t ORDER BY doc_id""".stripMargin.replace("CNT", cnt)
  }

  /** q_subwords — BPE-ish subword token counting (word-piece chunks ≤4
    * chars + digit/punct singletons), the second tokenizer of the text
    * stack; regex semantics identical in both engines.
    */
  val qSubwords: Q = (s, dir) =>
    // single-pass kernel (one scan vs two regex passes; spec pins its
    // equivalence to the subwordCount/tokenCount column forms) — the
    // BENCH_sf1 top ratio (4.1×) was this query's regex cost growing with
    // the corpus
    Tables.documents(s, dir)
      .withColumn("_sw", TextStats.subwordStatsUdf(col("text")))
      .select(
        col("doc_id"),
        col("_sw._1").cast("long").as("n_subwords"),
        col("_sw._2").cast("long").as("n_words"))
      .orderBy("doc_id")

  val qSubwordsSql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) AS n_subwords,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q_unigram_logprob — corpus-frequency quality scoring: mean unigram
    * log-probability per document under the corpus unigram distribution
    * (rounded to 4 decimals: avg-of-doubles summation order and libm-vs-
    * StrictMath ln differ at the ulp level between engines).
    */
  val qUnigramLogprob: Q = (s, dir) =>
    TextStats.unigramLogProb(Tables.documents(s, dir), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), round(col("logprob"), 4).as("logprob"))
      .orderBy("doc_id")

  val qUnigramLogprobSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |  FROM documents WHERE length(trim(text)) > 0),
      |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |total AS (SELECT sum(cnt)::DOUBLE AS t FROM vocab)
      |SELECT doc_id, round(avg(ln(cnt / t)), 4) AS logprob
      |FROM toks JOIN vocab USING (tok), total
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q_dedup_near_full — the COMPLETE near-dup dedup pipeline applied:
    * corpus + perturbed copies → MinHash-LSH pairs → keep-first removal;
    * output is the surviving ids. Deterministic; sketch recall → rows-only.
    */
  val qDedupNearFull: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val copies = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" near duplicate tail")).as("text"))
    val corpus = docs.union(copies)
    val pairs = Dedup.minhashNearDupPairs(corpus, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
    Dedup.dedupByPairs(corpus, col("doc_id"), pairs)
      .select("doc_id").orderBy("doc_id")
  }

  /** q_ngram_jaccard — exact unigram Jaccard between consecutive docs
    * (the verification kernel of near-dup dedup, SQL-expressible).
    */
  val qNgramJaccard: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Dedup.wordShingles(col("text"), 1).as("sh"))
      // blank docs are excluded like the oracle's WHERE length(trim)>0
      .where(size(col("sh")) > 0)
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select((col("doc_id") - 1).as("id_a"), col("sh").as("sh_b"))
    a.join(b, "id_a")
      // materialize set sizes once (inline jaccard would re-evaluate the
      // array_union for both the zero test and the division)
      .withColumn("_i", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("_u", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"),
        round(when(col("_u") === 0, 0d)
          .otherwise(col("_i").cast("double") / col("_u")), 6).as("jaccard"))
      .orderBy("id_a")
  }

  val qNgramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS s
      |  FROM documents WHERE length(trim(text)) > 0)
      |SELECT a.doc_id AS id_a,
      |  round(CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0
      |    ELSE len(list_intersect(a.s, b.s))::DOUBLE
      |         / len(list_distinct(list_concat(a.s, b.s))) END, 6) AS jaccard
      |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
      |ORDER BY id_a""".stripMargin

  /** q_dedup_components — connected components over a deterministic
    * similarity graph (consecutive docs with unigram Jaccard ≥ 0.7):
    * every doc labeled with the smallest id in its near-dup group — the
    * transitive-closure dedup collapse, oracle-checked against a DuckDB
    * recursive CTE.
    */
  /** Deterministic similarity-graph edges shared by q_dedup_components and
    * q_canonical_pick: consecutive docs with unigram Jaccard ≥ 0.7.
    */
  private[graft] def componentEdges(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Dedup.wordShingles(col("text"), 1).as("sh"))
      .where(size(col("sh")) > 0)
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select((col("doc_id") - 1).as("id_a"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, "id_a")
      .withColumn("_i", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("_u", size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("_i").cast("double") / greatest(lit(1), col("_u")) >= 0.7)
      .select("id_a", "id_b")
  }

  /** Component labels memoized per (session, dir) — the in-session
    * analogue of a real pipeline persisting its component table once and
    * deriving every downstream view from it (VERDICT r7 item 9): the
    * iterative propagation (the only multi-job part) runs once, the
    * eager localCheckpoint pins the materialized labels, and both
    * q_dedup_components and q_canonical_pick read the same cached
    * relation instead of re-converging the graph.
    */
  // keyed by the session OBJECT (not a hash, which could collide with a
  // GC'd session's address and serve a DataFrame bound to a dead
  // SparkContext). NOTE the cached DataFrame references its session, so
  // the weak key is pinned and the entry — checkpointed labels included
  // — lives for the JVM lifetime; that's bounded (a handful of
  // (session, sf-dir) pairs, small label relations) and the honest
  // contract is documented in [[graft.ModelMemo]].
  private val componentsMemo = graft.ModelMemo.perSession[org.apache.spark.sql.DataFrame]
  private[graft] def componentsOf(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    componentsMemo.getOrFit(s, dir)(
      Dedup.connectedComponents(componentEdges(s, dir)).localCheckpoint(true))

  val qDedupComponents: Q = (s, dir) =>
    componentsOf(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id")

  /** q_canonical_pick — the "which copy do we KEEP" half of dedup: for
    * every multi-doc near-dup component (q_dedup_components' graph), the
    * member with the highest quality score (ties → smallest doc_id) and
    * the member count. Min-id collapse keeps the OLDEST copy; a real
    * curation pipeline keeps the BEST one.
    */
  val qCanonicalPick: Q = (s, dir) => {
    val comps = componentsOf(s, dir)
    val scored = qualityOf(Tables.documents(s, dir))
      .select(col("doc_id").as("id"), col("quality").as("score"))
    Dedup.canonicalPick(comps, scored)
      .select(col("component"), col("canonical_id"),
        col("score").as("quality"), col("n_members"))
      .orderBy("component")
  }

  val qDedupComponentsSql: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS s
      |  FROM documents WHERE length(trim(text)) > 0),
      |edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
      |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |        / greatest(1, len(list_distinct(list_concat(a.s, b.s)))) >= 0.7),
      |und AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION SELECT id_b, id_a FROM edges),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM und
      |  UNION
      |  SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id)
      |SELECT id AS doc_id, min(r) AS component
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  val qCanonicalPickSql: String = {
    val cnt = s"len(regexp_extract_all(lower(text), '${TextStats.markerPattern(TextStats.StopwordsEn)}'))"
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS s
      |  FROM documents WHERE length(trim(text)) > 0),
      |edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
      |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |        / greatest(1, len(list_distinct(list_concat(a.s, b.s)))) >= 0.7),
      |und AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION SELECT id_b, id_a FROM edges),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM und
      |  UNION
      |  SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id),
      |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
      |t AS (
      |  SELECT doc_id, length(text) AS len,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
      |    CASE WHEN length(text) = 0 THEN 0
      |         ELSE len(regexp_extract_all(text, '[[:punct:]]'))::DOUBLE / length(text) END AS pr,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE list_aggregate(list_transform(regexp_split_to_array(trim(text), '\s+'),
      |              x -> length(x)), 'sum')::DOUBLE
      |              / len(regexp_split_to_array(trim(text), '\s+')) END AS mwl,
      |    CNT AS c_en
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, round(
      |    (CASE WHEN len BETWEEN 100 AND 20000 THEN 1.0
      |          WHEN len < 100 THEN len / 100.0 ELSE 20000.0 / len END) * 0.3
      |    + (CASE WHEN pr <= 0.2 THEN 1.0
      |            ELSE greatest(0.0, 1.0 - (pr - 0.2) * 2) END) * 0.3
      |    + least(1.0, (CASE WHEN n_tok = 0 THEN 0 ELSE c_en::DOUBLE / n_tok END) * 5) * 0.2
      |    + (CASE WHEN mwl BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
      |  FROM t),
      |r AS (
      |  SELECT c.component, q.doc_id, q.quality,
      |    row_number() OVER (PARTITION BY c.component ORDER BY q.quality DESC, q.doc_id) AS rn,
      |    count(*) OVER (PARTITION BY c.component) AS n_members
      |  FROM comp c JOIN q USING (doc_id))
      |SELECT component, doc_id AS canonical_id, quality, n_members
      |FROM r WHERE rn = 1 ORDER BY component""".stripMargin.replace("CNT", cnt)
  }

  /** q_token_budget — token-budget corpus selection: highest-quality
    * documents first until the cumulative token count would pass 12,000 —
    * the greedy "best data that fits the training budget" cut. The global
    * running sum runs as the two-pass distributed prefix sum
    * ([[graft.llm.Packing.tokenBudgetSelect]]), not an unpartitioned
    * window.
    */
  val TokenBudget = 12000L

  val qTokenBudget: Q = (s, dir) => {
    val scored = Tables.documents(s, dir).select(
      col("doc_id"),
      TextStats.qualityScoreKernel(col("text")).as("q"),
      TextStats.tokenCount(col("text")).as("t"))
    Packing.tokenBudgetSelect(scored, col("doc_id"), col("q"), col("t"), TokenBudget)
      .select(col("id").as("doc_id"), col("score").as("quality"),
        col("n_tok"), col("cum_tok"))
      .orderBy("doc_id")
  }

  val qTokenBudgetSql: String = {
    val cnt = s"len(regexp_extract_all(lower(text), '${TextStats.markerPattern(TextStats.StopwordsEn)}'))"
    s"""WITH t AS (
      |  SELECT doc_id, length(text) AS len,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
      |    CASE WHEN length(text) = 0 THEN 0
      |         ELSE len(regexp_extract_all(text, '[[:punct:]]'))::DOUBLE / length(text) END AS pr,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE list_aggregate(list_transform(regexp_split_to_array(trim(text), '\\s+'),
      |              x -> length(x)), 'sum')::DOUBLE
      |              / len(regexp_split_to_array(trim(text), '\\s+')) END AS mwl,
      |    CNT AS c_en
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, n_tok, round(
      |    (CASE WHEN len BETWEEN 100 AND 20000 THEN 1.0
      |          WHEN len < 100 THEN len / 100.0 ELSE 20000.0 / len END) * 0.3
      |    + (CASE WHEN pr <= 0.2 THEN 1.0
      |            ELSE greatest(0.0, 1.0 - (pr - 0.2) * 2) END) * 0.3
      |    + least(1.0, (CASE WHEN n_tok = 0 THEN 0 ELSE c_en::DOUBLE / n_tok END) * 5) * 0.2
      |    + (CASE WHEN mwl BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
      |  FROM t),
      |c AS (
      |  SELECT doc_id, quality, n_tok,
      |    sum(n_tok) OVER (ORDER BY quality DESC, doc_id
      |                     ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM q)
      |SELECT doc_id, quality, n_tok::BIGINT AS n_tok, cum::BIGINT AS cum_tok
      |FROM c WHERE cum <= ${TokenBudget} ORDER BY doc_id""".stripMargin.replace("CNT", cnt)
  }

  /** q_dedup_cross — cross-snapshot near-dup join: an incoming batch
    * (perturbed copies, ids + 1e6) deduped against the existing corpus
    * via MinHash-LSH band join + exact-Jaccard verify, WITHOUT forming
    * old×old pairs — the incremental near-dup path a crawl pipeline runs
    * per batch (q_dedup_incr is its exact-hash sibling). Deterministic
    * (seeded constants) but sketch recall → fixture oracle.
    */
  val qDedupCross: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val batch = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" near duplicate tail")).as("text"))
    Dedup.minhashNearDupJoin(batch, col("doc_id"), col("text"),
      docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id_new", "id_old")
  }

  /** q_minhash_pairs — MinHash+LSH near-dup pairs. The corpus is augmented
    * with perturbed copies (id + 1e6) so real near-dups exist at every
    * scale factor; LSH candidates verified by exact shingle Jaccard.
    * Not SQL-expressible (sketch recall) → rows-only check.
    */
  val qMinhashPairs: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val copies = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" near duplicate tail")).as("text"))
    Dedup.minhashNearDupPairs(
      docs.union(copies), col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id_a", "id_b")
  }

  /** q_simhash_pairs — SimHash near-dup pairs on the same augmented corpus. */
  val qSimhashPairs: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val copies = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" tail")).as("text"))
    Dedup.simhashNearDupPairs(docs.union(copies), col("doc_id"), col("text"),
      maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** q_embed_topk — brute-force cosine top-20 to vec_id 0's embedding.
    * Oracle casts to DOUBLE[] so both engines do double math.
    */
  val qEmbedTopk: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val query = Anchors.vecF(s, dir, 0)
    Similarity.topK(emb.where(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), query, 20)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("sim").desc, col("vec_id")))
        .cast("long"))
      .select("rank", "vec_id")
      .orderBy("rank")
  }

  val qEmbedTopkSql: String =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT row_number() OVER (ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id) AS rank,
      |       e.vec_id
      |FROM embeddings e, q WHERE e.vec_id <> 0
      |ORDER BY rank LIMIT 20""".stripMargin

  /** q_embed_neardup — exact cosine near-dup pairs in an id-bounded slice
    * (bounded quadratic work at any sf; LSH path covered by
    * [[Similarity.annNearDupPairs]] + spec).
    */
  val qEmbedNeardup: Q = (s, dir) =>
    Similarity.neardupPairsExact(Tables.embeddings(s, dir), col("vec_id"),
      col("embedding"), threshold = 0.35, maxId = 500)
      .select(col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")

  val qEmbedNeardupSql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM embeddings a JOIN embeddings b
      |  ON a.vec_id < b.vec_id
      |WHERE a.vec_id < 500 AND b.vec_id < 500
      |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
      |ORDER BY id_a, id_b""".stripMargin

  /** q_embed_quantize — int8 scalar quantization of the embedding corpus
    * (the 4× storage/bandwidth cut for 100 TB embedding tables): per-vector
    * scale + quantized summary stats, oracle-checked value-for-value.
    */
  val qEmbedQuantize: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .withColumn("_q", Similarity.quantizeUdf(col("embedding")))
      .select(
        col("vec_id"),
        round(col("_q._1"), 6).as("scale"),
        aggregate(col("_q._2"), lit(0L), (a, x) => a + x.cast("long")).as("qsum"),
        array_max(col("_q._2")).cast("long").as("qmax"),
        array_min(col("_q._2")).cast("long").as("qmin"))
      .orderBy("vec_id")

  val qEmbedQuantizeSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |s AS (SELECT vec_id, e,
      |  CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0 THEN 1.0
      |       ELSE list_max(list_transform(e, x -> abs(x))) / 127 END AS scale FROM v),
      |q AS (SELECT vec_id, scale,
      |  list_transform(e, x ->
      |    (CASE WHEN x < 0 THEN -1 ELSE 1 END) * least(127, round(abs(x) / scale, 0))) AS qv
      |  FROM s)
      |SELECT vec_id, round(scale, 6) AS scale,
      |  list_aggregate(qv, 'sum')::BIGINT AS qsum,
      |  list_max(qv)::BIGINT AS qmax,
      |  list_min(qv)::BIGINT AS qmin
      |FROM q ORDER BY vec_id""".stripMargin

  /** q_multimodal_meta — multimodal metadata plumbing: synthesize the real
    * encoded media table, thumbnail-resize the metadata. Dims mirror the
    * encoded truth (PNG 4..53 × 4..43, audio 0×0, 8×8 frames), so the
    * resize math is SQL-expressible from the corpus recipe.
    */
  val qMultimodalMeta: Q = (s, dir) => {
    val media = Multimodal.syntheticMedia(Tables.documents(s, dir), col("doc_id"))
    Multimodal.resizeMeta(media, 32)
      .select(col("media_id"), col("meta.mime").as("mime"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .orderBy("media_id")
  }

  val qMultimodalMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, doc_id % 3 AS k,
      |    (CASE doc_id % 3 WHEN 0 THEN doc_id % 50 + 4 WHEN 1 THEN 0 ELSE 8 END)::INT AS width,
      |    (CASE doc_id % 3 WHEN 0 THEN doc_id % 40 + 4 WHEN 1 THEN 0 ELSE 8 END)::INT AS height
      |  FROM documents)
      |SELECT media_id,
      |  CASE k WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
      |         ELSE 'video/x-frameseq' END AS mime,
      |  CASE WHEN greatest(width, height) <= 32 THEN width
      |       ELSE ceil(width * (32.0 / greatest(width, height)))::INT END AS w,
      |  CASE WHEN greatest(width, height) <= 32 THEN height
      |       ELSE ceil(height * (32.0 / greatest(width, height)))::INT END AS h
      |FROM m ORDER BY media_id""".stripMargin

  /** q_multimodal_features — the REAL decode/feature-extract stage: the
    * engine parses actual PNG pixels (javax.imageio), WAV PCM samples
    * (javax.sound.sampled) and frame-sequence containers; the oracle
    * PREDICTS the decoded features from the closed-form content recipe
    * without decoding anything — agreement means the bytes were truly
    * parsed. All feature arithmetic is exact IEEE double both engines
    * reproduce bit-identically (integer sums < 2^53, identical division
    * and left-assoc fold order).
    */
  val qMultimodalFeatures: Q = (s, dir) => {
    val media = Multimodal.syntheticMedia(Tables.documents(s, dir), col("doc_id"))
    Multimodal.extractFeatures(media, col("payload"), col("meta.mime"))
      .select(col("media_id"), col("meta.mime").as("mime"),
        size(col("features")).cast("long").as("dim"),
        round(element_at(col("features"), 3), 4).as("f2"),
        round(aggregate(col("features"), lit(0d), (a, x) => a + x), 4).as("fsum"))
      .orderBy("media_id")
  }

  val qMultimodalFeaturesSql: String = multimodalFeaturesSqlWhere("TRUE")

  private def multimodalFeaturesSqlWhere(pred: String): String =
    multimodalFeaturesSqlFrom("media_id", pred)

  /** The closed-form feature oracle with the recipe SOURCE id decoupled
    * from the row id: `srcExpr` (over `media_id`) names which recipe the
    * row's payload encodes — identity for the plain corpus, a shifted id
    * for rows a change feed upserted with replacement content
    * (q_multimodal_maintain).
    */
  private def multimodalFeaturesSqlFrom(srcExpr: String, pred: String): String =
    s"""WITH m AS (SELECT media_id, src, src % 3 AS k FROM (
      |  SELECT doc_id AS media_id, ($srcExpr) AS src
      |  FROM (SELECT doc_id, doc_id AS media_id FROM documents))),
      |img AS (
      |  SELECT media_id,
      |    (src % 50 + 4)::DOUBLE AS w, (src % 40 + 4)::DOUBLE AS h,
      |    (src % 199)::DOUBLE AS rb, (src * 3 % 199)::DOUBLE AS gb,
      |    (src * 7 % 256)::DOUBLE AS bb
      |  FROM m WHERE k = 0),
      |aud AS (
      |  SELECT media_id,
      |    list_transform(range(0, (src % 500 + 100)::INT),
      |      t -> ((src + 3 * t) % 256 - 128)::DOUBLE) AS s
      |  FROM m WHERE k = 1),
      |vid AS (
      |  SELECT media_id, (src % 3 + 2) AS f,
      |    list_aggregate(list_transform(range(0, (src % 3 + 2)::INT),
      |      i -> ((src + 17 * i) % 256)::DOUBLE), 'avg') AS mean_r
      |  FROM m WHERE k = 2),
      |feat AS (
      |  SELECT media_id, 'image/png' AS mime, 5::BIGINT AS dim,
      |    rb + (w - 1) / 2 AS f2,
      |    w + h + (rb + (w - 1) / 2) + (gb + (h - 1) / 2) + bb AS fsum
      |  FROM img
      |  UNION ALL
      |  SELECT media_id, 'audio/wav', 4::BIGINT,
      |    list_aggregate(s, 'min'),
      |    len(s)::DOUBLE + list_aggregate(s, 'avg')
      |      + list_aggregate(s, 'min') + list_aggregate(s, 'max')
      |  FROM aud
      |  UNION ALL
      |  SELECT media_id, 'video/x-frameseq', 4::BIGINT,
      |    8.0,
      |    (f + 8 + 8)::DOUBLE + mean_r
      |  FROM vid)
      |SELECT media_id, mime, dim, round(f2, 4) AS f2, round(fsum, 4) AS fsum
      |FROM feat WHERE $pred ORDER BY media_id""".stripMargin

  /** q_multimodal_fetch — the payload STORE + point-lookup fetch
    * ([[Multimodal.writePayloadStore]]/[[Multimodal.fetchPayloads]],
    * VERDICT r11 item 8): payloads persist once in an id-bucketed
    * store, then the fetch routes its ids driver-side to their bucket
    * directories and decodes ONLY the fetched rows — completing the
    * "no serve touches a corpus table" story for media columns. The
    * output decodes the fetched bytes into the closed-form features,
    * so the oracle (the features SQL restricted to the fetched ids)
    * hash-checks that the store returned the REAL payloads, not
    * placeholders; the bucket-pruned read itself is spec-pinned.
    */
  val MediaFetchIds: Seq[Long] = (1L to 60L by 3L).toIndexedSeq

  val qMultimodalFetch: Q = (s, dir) => {
    val store = TempDirs.create("graft_media_store")
    Multimodal.writePayloadStore(
      Multimodal.syntheticMedia(Tables.documents(s, dir), col("doc_id")),
      col("media_id"), store, nBuckets = 16)
    val fetched = Multimodal.fetchPayloads(s, store, MediaFetchIds)
    Multimodal.extractFeatures(fetched, col("payload"), col("meta.mime"))
      .select(col("media_id"), col("meta.mime").as("mime"),
        size(col("features")).cast("long").as("dim"),
        round(element_at(col("features"), 3), 4).as("f2"),
        round(aggregate(col("features"), lit(0d), (a, x) => a + x), 4).as("fsum"))
      .orderBy("media_id")
  }

  val qMultimodalFetchSql: String = multimodalFeaturesSqlWhere(
    s"media_id IN (${MediaFetchIds.mkString(", ")})")

  /** q_multimodal_maintain — the payload store's FULL maintenance loop
    * under the oracle hash (VERDICT r12 item 7): write → CDC feed
    * (upserts replace ~10% of payloads with DIFFERENT recipe content,
    * deletes kill the %7=3 ids) → the tombstone-debt policy triggers a
    * compaction ([[Multimodal.compactPayloadsIfNeeded]] — the feed
    * tombstones >10% of stored rows) → point-lookup fetch + decode. The
    * oracle predicts the decoded features from the POST-FEED corpus:
    * upserted ids must decode to the replacement recipe (id + shift),
    * deleted ids must be absent, untouched ids unchanged — maintain ≡
    * rebuild, hash-checked through real PNG/WAV bytes.
    */
  val MediaShift = 5000000L
  val MediaMaintFetchIds: Seq[Long] = (1L to 80L).toIndexedSeq

  private def mediaUpsertPred = pmod(col("doc_id"), lit(10)) === 0 &&
    pmod(col("doc_id"), lit(7)) =!= 3
  private def mediaDeletePred = pmod(col("doc_id"), lit(7)) === 3

  private def mediaFeedStore(s: SparkSession, dir: String,
      tag: String): String = {
    val store = TempDirs.create(tag)
    val docs = Tables.documents(s, dir)
    Multimodal.writePayloadStore(
      Multimodal.syntheticMedia(docs, col("doc_id")),
      col("media_id"), store, nBuckets = 16)
    // upserts carry the SHIFTED id's recipe stored under the original id
    // (payload, meta, and even modality class change — shift % 3 = 2)
    val upserts = Multimodal.syntheticMedia(
        docs.where(mediaUpsertPred)
          .select((col("doc_id") + MediaShift).as("doc_id")),
        col("doc_id"))
      .select((col("media_id") - MediaShift).as("media_id"),
        col("payload"), col("meta"), lit("upsert").as("op"))
    val deletes = docs.where(mediaDeletePred)
      .select(col("doc_id").as("media_id"),
        lit(null).cast("binary").as("payload"),
        lit(null).cast(Multimodal.mediaMetaType).as("meta"),
        lit("delete").as("op"))
    Multimodal.applyPayloadChangeFeed(upserts.unionByName(deletes),
      col("media_id"), col("op"), store)
    store
  }

  val qMultimodalMaintain: Q = (s, dir) => {
    val store = mediaFeedStore(s, dir, "graft_media_maint")
    // the feed tombstoned every touched id (~24% of stored rows) — the
    // debt policy must fire, and the fetch below reads the COMPACTED
    // store (maintain ≡ rebuild over the post-feed corpus)
    require(Multimodal.compactPayloadsIfNeeded(s, store, maxDeadFrac = 0.1),
      "tombstone debt above threshold must trigger compaction")
    val fetched = Multimodal.fetchPayloads(s, store, MediaMaintFetchIds)
    Multimodal.extractFeatures(fetched, col("payload"), col("meta.mime"))
      .select(col("media_id"), col("meta.mime").as("mime"),
        size(col("features")).cast("long").as("dim"),
        round(element_at(col("features"), 3), 4).as("f2"),
        round(aggregate(col("features"), lit(0d), (a, x) => a + x), 4).as("fsum"))
      .orderBy("media_id")
  }

  val qMultimodalMaintainSql: String = multimodalFeaturesSqlFrom(
    s"CASE WHEN media_id % 10 = 0 AND media_id % 7 <> 3 " +
      s"THEN media_id + $MediaShift ELSE media_id END",
    s"media_id IN (${MediaMaintFetchIds.mkString(", ")}) AND media_id % 7 <> 3")

  /** q_multimodal_describe — the store's segment-info view
    * ([[Multimodal.describePayloadStore]]) after the same feed WITHOUT
    * compacting: n_rows is the Lucene-stale stored count (original +
    * upserted versions; deletes not yet subtracted), gen counts the
    * feed's two maintenance steps, n_tombstoned every touched id — all
    * recomputed by the oracle from raw corpus arithmetic, so the
    * sidecar's exact row accounting is a hash-checked fact (the
    * q_index_stats discipline at media parity).
    */
  val qMultimodalDescribe: Q = (s, dir) => {
    val store = mediaFeedStore(s, dir, "graft_media_desc")
    Multimodal.describePayloadStore(s, store)
  }

  val qMultimodalDescribeSql: String =
    """WITH ups AS (SELECT count(*) AS c FROM documents
      |             WHERE doc_id % 10 = 0 AND doc_id % 7 <> 3),
      |del AS (SELECT count(*) AS c FROM documents WHERE doc_id % 7 = 3)
      |SELECT
      |  ((SELECT count(*) FROM documents) + (SELECT c FROM ups))::BIGINT AS n_rows,
      |  16 AS n_buckets,
      |  2::BIGINT AS gen,
      |  ((SELECT c FROM ups) + (SELECT c FROM del))::BIGINT AS n_tombstoned""".stripMargin

  /** q_events_hourly — event-time windowed aggregation (the batch shape of
    * the streaming pipeline; see graft.streaming for the readStream form).
    */
  val qEventsHourly: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("hour", "event_type")

  val qEventsHourlySql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** q_sessionize — gap-based sessionization (batch form of the streaming
    * flatMapGroupsWithState path in graft.streaming.EventStream; 30-minute
    * inactivity gap). Lag + cumulative-sum window algebra, fully
    * SQL-expressible.
    */
  val qSessionize: Q = (s, dir) => {
    val events = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"),
        col("event_type"), col("value"))
    graft.streaming.EventStream.sessionizeBatch(events, 30L * 60 * 1000000)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id", "start_us")
  }

  val qSessionizeSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, event_id, value,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |              OR ts_us - lag(ts_us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sessions AS (
      |  SELECT user_id, ts_us, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, start_us""".stripMargin

  /** q_asof_join — as-of enrichment: every click gets the user's most
    * recent prior purchase value (right side pre-aggregated to one row per
    * (user, ts) for deterministic ties). DuckDB's native ASOF LEFT JOIN is
    * the oracle.
    */
  val qAsofJoin: Q = (s, dir) => {
    val events = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"),
        col("event_type"), col("value"))
    val clicks = events.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    val purchases = events.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us").agg(max("value").as("pvalue"))
    graft.operators.AsOf.join(clicks, purchases, Seq("user_id"),
      "ts_us", "ts_us", Seq("pvalue"))
      .select(col("event_id"), col("user_id"),
        round(col("asof_pvalue"), 2).as("last_purchase"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'click'),
      |purch AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS pvalue
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, round(p.pvalue, 2) AS last_purchase
      |FROM clicks c ASOF LEFT JOIN purch p
      |  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
      |ORDER BY event_id""".stripMargin

  /** q_join_enrich — broadcast-join enrichment + grouped revenue (general
    * join coverage; the dimension side is broadcast, no shuffle of fact).
    */
  val qJoinEnrich: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  val qJoinEnrichSql: String =
    """SELECT p_brand, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q_embed_neardup_ann — the LSH scale path over the FULL embedding
    * corpus (no id bound): hyperplane-bucket grouping + exact verify.
    * Deterministic (seeded planes + auto bit-width from the corpus count)
    * but sketch recall → rows-only. Bits are AUTO here on purpose: the
    * bench replays this query at growing scale factors, and a pinned
    * bit-width saturates every bucket once n ≫ 2^bits (the sf10 run
    * caught exactly that — see SCALING.md).
    */
  val qEmbedNeardupAnn: Q = (s, dir) =>
    Similarity.annNearDupPairs(Tables.embeddings(s, dir), col("vec_id"),
      col("embedding"), threshold = 0.3, dim = 64, tables = 6)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .orderBy("id_a", "id_b")

  /** q_decontaminate — benchmark decontamination: per-document count of
    * distinct word n-grams shared with the benchmark set (docs with
    * doc_id % 97 = 0 stand in for the eval set) + 0/1 flag. n=4 is the
    * discriminative size for the synthetic vocabulary, playing the role of
    * the 8-to-13-grams used on natural text.
    */
  val qDecontaminate: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.where(col("doc_id") % 97 === 0)
    Decontaminate.contaminationCounts(docs, col("doc_id"), col("text"),
      bench, col("text"), n = 4)
      .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
      .orderBy("doc_id")
  }

  val qDecontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |grams AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
      |    i -> array_to_string(t[i:i+3], ' '))) AS g
      |  FROM toks WHERE len(t) >= 4),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT doc_id, count(DISTINCT g) AS n_hits
      |  FROM grams JOIN bench USING (g) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
      |  (coalesce(h.n_hits, 0) > 0)::BIGINT AS contaminated
      |FROM documents d LEFT JOIN hits h USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q_decontam_embed — embedding-space decontamination: max cosine of
    * every corpus vector against the benchmark slice (vec_id < 100 stands
    * in for the eval set) + contamination flag at 0.35 — the semantic
    * complement of q_decontaminate's n-gram path (paraphrased leakage
    * shares no n-gram but sits close in embedding space). The benchmark
    * is broadcast; the corpus side is one narrow kernel, no join.
    */
  val qDecontamEmbed: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Decontaminate.embeddingContamination(
      emb.where(col("vec_id") >= 100), col("vec_id"), col("embedding"),
      emb.where(col("vec_id") < 100), col("embedding"), threshold = 0.35)
      .select(col("id").as("vec_id"), col("max_sim"), col("contaminated"))
      .orderBy("vec_id")
  }

  val qDecontamEmbedSql: String =
    """WITH bench AS (
      |  SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 100),
      |corpus AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id >= 100),
      |sims AS (
      |  SELECT c.vec_id, max(round(list_cosine_similarity(c.e, b.e), 6)) AS max_sim
      |  FROM corpus c CROSS JOIN bench b GROUP BY c.vec_id)
      |SELECT vec_id, max_sim, (max_sim > 0.35)::BIGINT AS contaminated
      |FROM sims ORDER BY vec_id""".stripMargin

  /** q_pii_scrub — PII scrubbing: the deterministic injection recipe plants
    * emails/phones/IPv4s from the row id (the synthetic corpus has no
    * organic PII), then detection counts + the md5 of the redacted text are
    * oracle-checked. Regexes restricted to the java.util.regex ∩ RE2
    * common subset (see [[graft.llm.Pii]]).
    */
  val qPiiScrub: Q = (s, dir) => {
    val injected = Tables.documents(s, dir)
      .withColumn("_t", Pii.injected(col("text"), col("doc_id")))
    Pii.scrub(injected, col("_t"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        md5(col("redacted").cast("binary")).as("red_md5"))
      .orderBy("doc_id")
  }

  val qPiiScrubSql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}-[0-9]{4}\\b"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    s"""WITH inj AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || (doc_id % 9000 + 1000) ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0 THEN ' from 10.' || (doc_id % 256) || '.'
       |         || (doc_id * 13 % 256) || '.' || (doc_id % 250 + 1) ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$email')) AS n_email,
       |  len(regexp_extract_all(t, '$phone')) AS n_phone,
       |  len(regexp_extract_all(t, '$ip')) AS n_ip,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$email', '[EMAIL]', 'g'),
       |    '$ip', '[IP]', 'g'),
       |    '$phone', '[PHONE]', 'g')) AS red_md5
       |FROM inj ORDER BY doc_id""".stripMargin
  }

  /** q_repetition — Gopher-style repetition signals: top-word fraction and
    * duplicate-bigram fraction per document, from the single-pass JVM
    * kernel (no explode — the token table never materializes).
    */
  val qRepetition: Q = (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("_r", TextStats.repetitionUdf(col("text")))
      .select(col("doc_id"),
        round(col("_r._1"), 6).as("top_word_frac"),
        round(col("_r._2"), 6).as("dup_bigram_frac"))
      .orderBy("doc_id")

  val qRepetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |wc AS (
      |  SELECT doc_id, w, count(*) AS c
      |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id, w),
      |topw AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS twf FROM wc GROUP BY doc_id),
      |bg AS (
      |  SELECT doc_id, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS b
      |  FROM toks WHERE len(t) >= 2),
      |bgf AS (SELECT doc_id, 1.0 - len(list_distinct(b))::DOUBLE / len(b) AS dbf FROM bg)
      |SELECT d.doc_id,
      |  round(coalesce(twf, 0), 6) AS top_word_frac,
      |  round(coalesce(dbf, 0), 6) AS dup_bigram_frac
      |FROM documents d
      |LEFT JOIN topw USING (doc_id) LEFT JOIN bgf USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q_sample_mix — deterministic stratified sampling to a target language
    * mixture: hash-gate on md5(doc_id) so membership is reproducible across
    * engines, reruns, and partition layouts (df.sample is none of those).
    * Pure narrow filter — no shuffle.
    */
  val SampleRates: Seq[(String, Double)] = Seq(
    "en" -> 0.8, "es" -> 0.5, "de" -> 0.5, "fr" -> 0.25, "zh" -> 0.25)
  val SampleDefaultRate = 0.1

  val qSampleMix: Q = (s, dir) =>
    Mixing.stratifiedSample(Tables.documents(s, dir), col("doc_id"),
      col("lang"), SampleRates.toMap, SampleDefaultRate)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  val qSampleMixSql: String = {
    val cases = SampleRates.map { case (l, r) =>
      s"WHEN '$l' THEN '${Mixing.rateToHex(r)}'"
    }.mkString(" ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE substr(md5(doc_id::VARCHAR), 1, ${Mixing.HexDigits}) <
       |  CASE lang $cases ELSE '${Mixing.rateToHex(SampleDefaultRate)}' END
       |ORDER BY doc_id""".stripMargin
  }

  /** q_semantic_dedup — SemDeDup-style semantic near-dup pairs: assign
    * vectors to the nearest of 8 deterministic centroids, pair-search
    * WITHIN clusters only (id-bounded slice keeps the in-cluster pair space
    * fixed at any sf; production k scales ~√n — see
    * [[Similarity.semanticDedupPairs]]).
    */
  val qSemanticDedup: Q = (s, dir) =>
    // args pinned explicitly (incl. the uncapped cluster size — the SQL
    // oracle generates the full within-cluster pair space) so the
    // engine-side AutoClusterCap default can evolve without moving this
    // oracle; the id-bounded slice keeps the pair space fixed at any sf
    Similarity.semanticDedupPairs(Tables.embeddings(s, dir), col("vec_id"),
      col("embedding"), k = 8, threshold = 0.3, maxId = 1000,
      maxClusterSize = Int.MaxValue)
      .orderBy("id_a", "id_b")

  val qSemanticDedupSql: String =
    """WITH v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 1000),
      |c AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
      |sims AS (
      |  SELECT v.vec_id, c.cid, round(list_cosine_similarity(v.e, c.ce), 6) AS s
      |  FROM v CROSS JOIN c),
      |asg AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
      |    FROM sims) WHERE rn = 1)
      |SELECT aa.vec_id AS id_a, bb.vec_id AS id_b, aa.cid
      |FROM asg aa JOIN asg bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
      |JOIN v a ON a.vec_id = aa.vec_id
      |JOIN v b ON b.vec_id = bb.vec_id
      |WHERE round(list_cosine_similarity(a.e, b.e), 6) > 0.3
      |ORDER BY id_a, id_b""".stripMargin

  /** q_dedup_incr — incremental-ingest dedup: delta docs (doc_id % 3 = 0)
    * whose dedup key already exists in the reference corpus (the other
    * two-thirds) are dropped, via Bloom-prefilter + broadcast verify —
    * the corpus itself never shuffles. Exact, so the oracle is a plain
    * anti-join. Key = 30-char text prefix (same as q_dedup_exact, so the
    * sf data actually contains cross-split duplicates).
    */
  val qDedupIncr: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.where(col("doc_id") % 3 =!= 0)
    val delta = docs.where(col("doc_id") % 3 === 0)
    Incremental.newRows(
      corpus, substring(col("text"), 1, 30),
      delta, substring(col("text"), 1, 30))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  val qDedupIncrSql: String =
    """SELECT d.doc_id, d.lang, d.source FROM documents d
      |WHERE d.doc_id % 3 = 0 AND NOT EXISTS (
      |  SELECT 1 FROM documents c
      |  WHERE c.doc_id % 3 <> 0
      |    AND substr(c.text, 1, 30) = substr(d.text, 1, 30))
      |ORDER BY d.doc_id""".stripMargin

  /** q_tfidf — top-3 TF-IDF terms per document. Scores rounded to 6 dp
    * before ranking so the rank order is replayable by the oracle; ties
    * break by term ascending.
    */
  val qTfidf: Q = (s, dir) =>
    TfIdf.topTerms(Tables.documents(s, dir), col("doc_id"), col("text"), k = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "rk")

  val qTfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents WHERE length(trim(text)) > 0),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks
      |  WHERE length(term) > 0 GROUP BY doc_id, term),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf,
      |    round(tf * ln(n_docs::DOUBLE / df), 6) AS score
      |  FROM tf JOIN dft USING (term) CROSS JOIN n)
      |SELECT doc_id, rk, term, tf, score FROM (
      |  SELECT doc_id, term, tf, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      |  FROM scored) WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  /** q_top_ngrams — corpus boilerplate: the 20 most document-frequent word
    * trigrams (distinct-per-doc via the shared shingle kernel; ties break
    * by gram ascending so the LIMIT is deterministic).
    */
  val qTopNgrams: Q = (s, dir) =>
    Boilerplate.topGrams(Tables.documents(s, dir), col("text"), n = 3, k = 20)

  val qTopNgramsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |grams AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
      |    i -> array_to_string(t[i:i+2], ' '))) AS gram
      |  FROM toks WHERE len(t) >= 3)
      |SELECT gram, count(*) AS n_docs FROM grams
      |GROUP BY gram ORDER BY n_docs DESC, gram LIMIT 20""".stripMargin

  /** The hybrid-serving inverted index, built ONCE per (session, dir)
    * ([[graft.ModelMemo]] — the same persisted-artifact discipline as
    * [[componentsOf]]): a fused retrieval request serves from the index,
    * it never re-tokenizes the corpus (VERDICT r9 item 5 — the previous
    * form ran the full BM25 pipeline per request, scanning documents
    * twice).
    */
  private val hybridIndexMemo = graft.ModelMemo.perSession[String]
  private[graft] def hybridIndexOf(s: SparkSession, dir: String): String =
    hybridIndexMemo.getOrFit(s, dir) {
      val out = TempDirs.create("graft_hybrid_idx")
      graft.llm.InvertedIndex.write(Tables.documents(s, dir), col("doc_id"),
        col("text"), out, nBuckets = QueriesQuality.PostingsBuckets)
      out
    }

  /** q_hybrid_rrf — hybrid retrieval: Reciprocal Rank Fusion of the BM25
    * top-20 (served from the memoized PERSISTED inverted index —
    * [[Fusion.rrfFromIndex]], bucket-pruned postings, zero corpus scans
    * at serve time) and the cosine top-20 to vec 0 (the q_embed_topk
    * embedding ranking), fused on the shared corpus id space (doc_id ≡
    * vec_id by corpus construction). Both inputs are bounded top-k
    * lists, so the fusion itself is ≤ 40 rows at any scale; the scale
    * paths live in the rankers. Scores round to 6 dp before the final
    * ordering (ties → doc_id). The oracle is unchanged from the direct
    * form: serve ≡ direct is the index writer's driver-checked contract
    * (q_postings_topk).
    */
  val qHybridRrf: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    val query = Anchors.vecF(s, dir, 0)
    val cos = Similarity.topK(emb.where(col("vec_id") =!= 0), col("vec_id"),
        col("embedding"), query, 20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id").as("id"), col("rank"))
    Fusion.rrfFromIndex(s, hybridIndexOf(s, dir),
        QueriesCurate.Bm25Terms, topK = 20, dense = cos)
      .select(col("id").as("doc_id"),
        round(col("rrf_score"), 6).as("rrf_score"), col("n_lists"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
  }

  /** The hybrid-RRF oracle parametrized by BM25 terms and the anchor
    * vec_id — shared verbatim by q_hybrid_rrf (single request) and
    * q_hybrid_batch (each batch member), because batching must change
    * the cost of a request, never its answer. No trailing ORDER BY so
    * callers can wrap or union.
    */
  private def hybridOracleSql(termSeq: Seq[String], anchorVid: Long): String = {
    val terms = termSeq.map(t => s"'$t'").mkString(", ")
    s"""WITH dl AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END::DOUBLE AS dl
      |  FROM documents),
      |stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, count(*)::DOUBLE AS tf
      |  FROM (SELECT doc_id, unnest(list_filter(
      |          regexp_split_to_array(trim(lower(text)), '\\s+'),
      |          x -> len(x) > 0)) AS tok
      |        FROM documents WHERE length(trim(text)) > 0)
      |  WHERE tok IN ($terms) GROUP BY doc_id, tok),
      |dfq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
      |bm AS (
      |  SELECT tf.doc_id, round(sum(
      |      ln((n - df + 0.5) / (df + 0.5) + 1)
      |      * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
      |  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id), stats
      |  GROUP BY tf.doc_id
      |  ORDER BY score DESC, tf.doc_id LIMIT 20),
      |bmr AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      |  FROM bm),
      |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = $anchorVid),
      |cosr AS (
      |  SELECT vec_id AS doc_id,
      |    row_number() OVER (
      |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
      |      e.vec_id) AS r
      |  FROM embeddings e, q WHERE e.vec_id <> $anchorVid
      |  QUALIFY r <= 20),
      |u AS (
      |  SELECT doc_id, 1.0::DOUBLE / (60 + r) AS contrib FROM bmr
      |  UNION ALL
      |  SELECT doc_id, 1.0::DOUBLE / (60 + r) AS contrib FROM cosr)
      |SELECT doc_id, round(sum(contrib), 6) AS rrf_score, count(*) AS n_lists
      |FROM u GROUP BY doc_id""".stripMargin
  }

  val qHybridRrfSql: String =
    s"""${hybridOracleSql(QueriesCurate.Bm25Terms, 0L)}
       |ORDER BY rrf_score DESC, doc_id""".stripMargin

  /** q_hybrid_batch — BATCHED fused hybrid retrieval, the production
    * serving shape for concurrent requests: the lexical arm scores the
    * whole batch in ONE bucket-pruned scan of the persisted inverted
    * index ([[graft.llm.InvertedIndex.bm25TopKBatch]] over the memoized
    * [[hybridIndexOf]] artifact), the dense arm scores the whole batch
    * in ONE corpus scan ([[Similarity.topKBatch]], WindowGroupLimit-
    * pruned), and per-request RRF fuses the two bounded top-k lists.
    * Per request the answer is EXACTLY q_hybrid_rrf's for the same
    * (terms, anchor) — the oracle unions the single-request oracle per
    * batch member, so "batching never changes an answer" is itself
    * driver-hash-checked. The dense arm requests k+1 then drops the
    * anchor's own row (the anchor lives in the corpus); top-20 of the
    * remainder equals the excluded-scan top-20 either way.
    */
  val HybridBatch: Seq[(String, Seq[String], Long)] = Seq(
    ("qa", Seq("spark", "window", "merge"), 0L),
    ("qb", Seq("scan", "filter", "vector"), 7L))

  val qHybridBatch: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val anchorIds = HybridBatch.map(_._3)
    val anchorVecs: Map[Long, Array[Float]] =
      anchorIds.map(i => i -> Anchors.vecF(s, dir, i)).toMap
    val queriesDf = HybridBatch.map { case (q, t, _) => (q, t) }.toDF("qid", "terms")
    val lex = graft.llm.InvertedIndex.bm25TopKBatch(s, hybridIndexOf(s, dir),
        queriesDf, col("qid"), col("terms"), topK = 20)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("id"))))
      .select("qid", "id", "rank")
    val selfRow = HybridBatch.map { case (q, _, a) =>
      col("qid") === q && col("vec_id") === a }.reduce(_ || _)
    val dense = Similarity.topKBatch(emb, col("vec_id"), col("embedding"),
        HybridBatch.map { case (q, _, a) => (q, anchorVecs(a)) }, k = 21)
      .where(!selfRow)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= 20)
      .select(col("qid"), col("vec_id").as("id"), col("rank"))
    lex.unionByName(dense)
      .select(col("qid"), col("id"),
        (lit(1.0) / (lit(60.0) + col("rank").cast("double"))).as("contrib"))
      .groupBy("qid", "id")
      .agg(round(sum("contrib"), 6).as("rrf_score"), count(lit(1)).as("n_lists"))
      .select(col("qid"), col("id").as("doc_id"), col("rrf_score"), col("n_lists"))
      .orderBy(col("qid"), col("rrf_score").desc, col("doc_id"))
  }

  val qHybridBatchSql: String = HybridBatch.map { case (qid, terms, anchor) =>
    s"SELECT '$qid' AS qid, doc_id, rrf_score, n_lists FROM (\n${hybridOracleSql(terms, anchor)}\n) AS hy_$qid"
  }.mkString("", "\nUNION ALL\n", "\nORDER BY qid, rrf_score DESC, doc_id")

  /** q_hard_negatives — contrastive-training hard-negative mining: for each
    * of 8 anchor vectors, the 3 most-cosine-similar corpus vectors with a
    * DIFFERENT label ([[Similarity.hardNegatives]]: broadcast-anchor
    * kernel + per-anchor top-k, similarities 6-dp-rounded before ranking,
    * ties → vec_id).
    */
  val qHardNegatives: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.hardNegatives(
      emb.where(col("vec_id") >= 8), col("vec_id"), col("embedding"), col("label"),
      emb.where(col("vec_id") < 8), col("vec_id"), col("embedding"), col("label"),
      k = 3)
      .select(col("anchor_id"), col("rk"), col("id").as("vec_id"), col("sim"))
      .orderBy("anchor_id", "rk")
  }

  val qHardNegativesSql: String =
    """WITH a AS (
      |  SELECT vec_id AS aid, label AS albl, embedding::DOUBLE[] AS av
      |  FROM embeddings WHERE vec_id < 8),
      |c AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS cv
      |  FROM embeddings WHERE vec_id >= 8),
      |sims AS (
      |  SELECT a.aid AS anchor_id, c.vec_id,
      |    round(list_cosine_similarity(av, cv), 6) AS sim
      |  FROM a JOIN c ON c.label <> a.albl),
      |r AS (
      |  SELECT anchor_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, vec_id) AS rk
      |  FROM sims)
      |SELECT anchor_id, rk, vec_id, sim FROM r WHERE rk <= 3
      |ORDER BY anchor_id, rk""".stripMargin

  /** q_dup_frac — duplicated-content fraction ([[Dedup.dupShingleFraction]]
    * over 4-grams, the q_decontaminate shingle convention): the share of
    * each document's distinct grams that appear in ≥ 2 documents — the
    * corpus-frequency boilerplate signal pairwise dedup misses.
    */
  val qDupFrac: Q = (s, dir) =>
    Dedup.dupShingleFraction(Tables.documents(s, dir), col("doc_id"),
        col("text"), n = 4)
      .select(col("id").as("doc_id"), col("n_grams"), col("dup_frac"))
      .orderBy("doc_id")

  val qDupFracSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |grams AS (
      |  SELECT DISTINCT doc_id, g FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
      |      i -> array_to_string(t[i:i+3], ' '))) AS g
      |    FROM toks WHERE len(t) >= 4)),
      |dfreq AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
      |perdoc AS (
      |  SELECT doc_id, count(*) AS n_grams, sum((df >= 2)::BIGINT) AS n_dup
      |  FROM grams JOIN dfreq USING (g) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(n_grams, 0)::BIGINT AS n_grams,
      |  round(coalesce(n_dup::DOUBLE / n_grams, 0), 6) AS dup_frac
      |FROM documents d LEFT JOIN perdoc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q_span_overlap — exact shared-span pairs ([[Dedup.sharedSpanPairs]]):
    * doc pairs sharing verbatim 8-token runs, with the distinct-span
    * count; spans shared by > 50 docs are boilerplate and excluded before
    * pair explosion in BOTH engines.
    */
  val qSpanOverlap: Q = (s, dir) =>
    Dedup.sharedSpanPairs(Tables.documents(s, dir), col("doc_id"),
        col("text"), n = 8, maxDf = 50)
      .orderBy("id_a", "id_b")

  val qSpanOverlapSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |grams AS (
      |  SELECT DISTINCT doc_id, g FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 6),
      |      i -> array_to_string(t[i:i+7], ' '))) AS g
      |    FROM toks WHERE len(t) >= 8)),
      |keep AS (SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 50),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |      FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
      |      WHERE a.doc_id < b.doc_id)
      |SELECT id_a, id_b, count(*) AS n_spans FROM p
      |GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin

  /** q_kl_quality — per-doc KL(p_doc ‖ p_corpus) typicality score
    * ([[TextStats.klDivergence]]), 4 dp (sum order + libm-vs-StrictMath
    * ln differ at the ulp level across engines, the q_unigram_logprob
    * discipline).
    */
  val qKlQuality: Q = (s, dir) =>
    TextStats.klDivergence(Tables.documents(s, dir), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), round(col("kl"), 4).as("kl"))
      .orderBy("doc_id")

  /** q_source_overlap — pairwise corpus overlap ([[Dedup.sourceOverlap]]):
    * for every source pair, the distinct 4-gram shingles shared and the
    * Jaccard of the two shingle sets — the mixture-design signal ("how
    * much of src_b is already in src_a?"). The distinct (source, shingle)
    * projection bounds the join fan-out at the source count per shingle,
    * so corpus volume cannot create a hot key.
    */
  val qSourceOverlap: Q = (s, dir) =>
    Dedup.sourceOverlap(Tables.documents(s, dir), col("source"), col("text"),
        n = 4)
      .orderBy("src_a", "src_b")

  val qSourceOverlapSql: String =
    """WITH toks AS (
      |  SELECT source, list_filter(regexp_split_to_array(trim(text), '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |grams AS (
      |  SELECT DISTINCT source AS src, g FROM (
      |    SELECT source, unnest(list_transform(range(1, len(t) - 2),
      |      i -> array_to_string(t[i:i+3], ' '))) AS g
      |    FROM toks WHERE len(t) >= 4)),
      |counts AS (SELECT src, count(*) AS n FROM grams GROUP BY src),
      |pairs AS (
      |  SELECT a.src AS src_a, b.src AS src_b, count(*) AS shared
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.src < b.src
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, ca.n AS n_a, cb.n AS n_b, shared,
      |  round(shared::DOUBLE / (ca.n + cb.n - shared), 6) AS jaccard
      |FROM pairs JOIN counts ca ON ca.src = pairs.src_a
      |           JOIN counts cb ON cb.src = pairs.src_b
      |ORDER BY src_a, src_b""".stripMargin

  val qKlQualitySql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |  FROM documents WHERE length(trim(text)) > 0),
      |dt AS (SELECT doc_id, tok, count(*)::DOUBLE AS c FROM toks GROUP BY doc_id, tok),
      |dtot AS (SELECT doc_id, sum(c) AS td FROM dt GROUP BY doc_id),
      |v AS (SELECT tok, count(*)::DOUBLE AS ct FROM toks GROUP BY tok),
      |tot AS (SELECT sum(ct) AS t FROM v)
      |SELECT doc_id, round(sum((c/td) * ln((c/td) / (ct/t))), 4) AS kl
      |FROM dt JOIN dtot USING (doc_id) JOIN v USING (tok), tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def all: Map[String, Q] = Map(
    "q_source_overlap" -> qSourceOverlap,
    "q_span_overlap" -> qSpanOverlap,
    "q_kl_quality" -> qKlQuality,
    "q_hybrid_rrf" -> qHybridRrf,
    "q_hybrid_batch" -> qHybridBatch,
    "q_hard_negatives" -> qHardNegatives,
    "q_dup_frac" -> qDupFrac,
    "q_embed_neardup_ann" -> qEmbedNeardupAnn,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_window" -> qDedupWindow,
    "q_text_stats" -> qTextStats,
    "q_lang_id" -> qLangId,
    "q_quality" -> qQuality,
    "q_unigram_logprob" -> qUnigramLogprob,
    "q_subwords" -> qSubwords,
    "q_dedup_near_full" -> qDedupNearFull,
    "q_dedup_components" -> qDedupComponents,
    "q_canonical_pick" -> qCanonicalPick,
    "q_token_budget" -> qTokenBudget,
    "q_decontam_embed" -> qDecontamEmbed,
    "q_ngram_jaccard" -> qNgramJaccard,
    "q_minhash_pairs" -> qMinhashPairs,
    "q_dedup_cross" -> qDedupCross,
    "q_simhash_pairs" -> qSimhashPairs,
    "q_embed_topk" -> qEmbedTopk,
    "q_embed_quantize" -> qEmbedQuantize,
    "q_embed_neardup" -> qEmbedNeardup,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_multimodal_fetch" -> qMultimodalFetch,
    "q_multimodal_maintain" -> qMultimodalMaintain,
    "q_multimodal_describe" -> qMultimodalDescribe,
    "q_events_hourly" -> qEventsHourly,
    "q_sessionize" -> qSessionize,
    "q_asof_join" -> qAsofJoin,
    "q_join_enrich" -> qJoinEnrich,
    "q_decontaminate" -> qDecontaminate,
    "q_pii_scrub" -> qPiiScrub,
    "q_repetition" -> qRepetition,
    "q_sample_mix" -> qSampleMix,
    "q_semantic_dedup" -> qSemanticDedup,
    "q_dedup_incr" -> qDedupIncr,
    "q_tfidf" -> qTfidf,
    "q_top_ngrams" -> qTopNgrams)

  /** Expected-output fixtures for the sketch queries: MinHash/SimHash/LSH
    * recall is not SQL-expressible, but every sketch here is seeded and
    * deterministic, so the sf0.01 result is pinned once as a committed
    * parquet fixture and compared value-for-value (the driver's correctness
    * gate runs at sf0.01). All fixture values are per-row arithmetic —
    * partition-layout-invariant, so any plan is bit-reproducible.
    * Regenerate with tools/regen_fixtures.py after a DELIBERATE behavior
    * change.
    */
  val FixtureDir = "/root/repo/src/test/resources/oracle"
  private def fixtureSql(name: String, order: String): String =
    s"SELECT * FROM read_parquet('$FixtureDir/$name.parquet') ORDER BY $order"

  def oracles: Map[String, String] = Map(
    "q_source_overlap" -> qSourceOverlapSql,
    "q_span_overlap" -> qSpanOverlapSql,
    "q_kl_quality" -> qKlQualitySql,
    "q_hybrid_rrf" -> qHybridRrfSql,
    "q_hybrid_batch" -> qHybridBatchSql,
    "q_hard_negatives" -> qHardNegativesSql,
    "q_dup_frac" -> qDupFracSql,
    "q_minhash_pairs" -> fixtureSql("q_minhash_pairs", "id_a, id_b"),
    "q_dedup_cross" -> fixtureSql("q_dedup_cross", "id_new, id_old"),
    "q_simhash_pairs" -> fixtureSql("q_simhash_pairs", "id_a, id_b"),
    "q_embed_neardup_ann" -> fixtureSql("q_embed_neardup_ann", "id_a, id_b"),
    "q_dedup_near_full" -> fixtureSql("q_dedup_near_full", "doc_id"),
    "q_sessionize" -> qSessionizeSql,
    "q_dedup_exact" -> qDedupExactSql,
    "q_dedup_window" -> qDedupWindowSql,
    "q_text_stats" -> qTextStatsSql,
    "q_lang_id" -> qLangIdSql,
    "q_quality" -> qQualitySql,
    "q_unigram_logprob" -> qUnigramLogprobSql,
    "q_subwords" -> qSubwordsSql,
    "q_dedup_components" -> qDedupComponentsSql,
    "q_canonical_pick" -> qCanonicalPickSql,
    "q_token_budget" -> qTokenBudgetSql,
    "q_decontam_embed" -> qDecontamEmbedSql,
    "q_ngram_jaccard" -> qNgramJaccardSql,
    "q_embed_topk" -> qEmbedTopkSql,
    "q_embed_quantize" -> qEmbedQuantizeSql,
    "q_embed_neardup" -> qEmbedNeardupSql,
    "q_multimodal_meta" -> qMultimodalMetaSql,
    "q_multimodal_features" -> qMultimodalFeaturesSql,
    "q_multimodal_fetch" -> qMultimodalFetchSql,
    "q_multimodal_maintain" -> qMultimodalMaintainSql,
    "q_multimodal_describe" -> qMultimodalDescribeSql,
    "q_events_hourly" -> qEventsHourlySql,
    "q_asof_join" -> qAsofJoinSql,
    "q_join_enrich" -> qJoinEnrichSql,
    "q_decontaminate" -> qDecontaminateSql,
    "q_pii_scrub" -> qPiiScrubSql,
    "q_repetition" -> qRepetitionSql,
    "q_sample_mix" -> qSampleMixSql,
    "q_semantic_dedup" -> qSemanticDedupSql,
    "q_dedup_incr" -> qDedupIncrSql,
    "q_tfidf" -> qTfidfSql,
    "q_top_ngrams" -> qTopNgramsSql)
}

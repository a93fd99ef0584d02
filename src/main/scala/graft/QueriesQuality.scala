package graft

import org.apache.spark.sql.functions._
import graft.llm.{Gopher, LineDedup, TextStats, WeightedSample}

/** Round-7 quality/curation operators as driver queries: Gopher rule
  * filtering, character-entropy scoring, JSON property extraction,
  * corpus-wide line dedup, and deterministic weighted sampling. Same
  * determinism contract as [[Queries]]: orderBy on a unique key, doubles
  * rounded on both sides, identical column aliases.
  */
object QueriesQuality {

  import Queries.Q

  /** q_gopher_quality — the Gopher rule vector + keep flag per document
    * (word-count bounds, mean-word-length window, alphabetic-word
    * fraction, symbol ratio, stopword containment). One codegen'd
    * projection over the corpus; the oracle replays each rule in SQL
    * with the identical thresholds.
    */
  val qGopherQuality: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id") +: Gopher.ruleColumns(col("text")): _*)
      .orderBy("doc_id")

  val qGopherQualitySql: String = {
    val stops = s"len(regexp_extract_all(lower(text), '${TextStats.markerPattern(TextStats.StopwordsEn)}'))"
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
      |    length(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS clen,
      |    $stops AS stops,
      |    len(regexp_extract_all(text, '#')) +
      |      len(regexp_extract_all(text, '\\.\\.\\.|…')) AS sym
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, len(toks) AS n_words,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE (clen - (len(toks) - 1))::DOUBLE / len(toks) END AS mwl,
      |    CASE WHEN len(toks) = 0 THEN 0
      |         ELSE list_max(list_transform(toks, x -> length(x))) END AS max_wlen,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
      |              / len(toks) END AS af,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE sym::DOUBLE / len(toks) END AS sr,
      |    stops
      |  FROM t)
      |SELECT doc_id, n_words, round(mwl, 4) AS mean_wlen, max_wlen,
      |  round(af, 4) AS alpha_frac, round(sr, 4) AS symbol_ratio,
      |  stops AS stop_hits,
      |  (n_words BETWEEN ${Gopher.MinWords} AND ${Gopher.MaxWords}
      |   AND mwl BETWEEN ${Gopher.MinMeanWordLen} AND ${Gopher.MaxMeanWordLen}
      |   AND af > ${Gopher.MinAlphaFrac} AND sr < ${Gopher.MaxSymbolRatio}
      |   AND stops >= ${Gopher.MinStopHits})::INT AS keep
      |FROM r ORDER BY doc_id""".stripMargin
  }

  /** q_char_entropy — Shannon entropy (bits) of each document's
    * character distribution plus its distinct-character count: the
    * gibberish/low-diversity signal of a quality pipeline. Single JVM
    * kernel pass per row (no explode, no shuffle); the oracle unnests
    * characters and folds -Σ p·log2 p with the same formula, 6-dp
    * rounding absorbing unordered-sum noise.
    */
  val qCharEntropy: Q = (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("e", Gopher.charEntropyCol(col("text")))
      .select(col("doc_id"), length(col("text")).as("n_chars2"),
        col("e._2").as("n_distinct"), round(col("e._1"), 6).as("entropy"))
      .orderBy("doc_id")

  val qCharEntropySql: String =
    """WITH cc AS (
      |  SELECT doc_id, c, count(*)::DOUBLE AS k
      |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
      |  GROUP BY doc_id, c),
      |n AS (SELECT doc_id, sum(k) AS n, count(*)::INT AS n_distinct
      |      FROM cc GROUP BY doc_id)
      |SELECT d.doc_id, length(d.text) AS n_chars2, n.n_distinct,
      |  coalesce((SELECT round(-sum((k / n.n) * log2(k / n.n)), 6)
      |            FROM cc WHERE cc.doc_id = d.doc_id), 0.0) AS entropy
      |FROM documents d JOIN n ON n.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q_json_extract — typed property extraction from the events table's
    * JSON `props` column (`$.k`), aggregated per event type: the
    * semi-structured-ingest shape (SURVEY §2.8 json functions). Spark
    * runs `get_json_object` (codegen'd Jackson path eval) inside the
    * pre-shuffle projection; the oracle parses the same property with a
    * regex so it needs no JSON extension.
    */
  val qJsonExtract: Q = (s, dir) =>
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        round(avg("k"), 4).as("avg_k"),
        round(avg("value"), 4).as("avg_value"))
      .orderBy("event_type")

  val qJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  sum(regexp_extract(props, '"k": (\d+)', 1)::BIGINT)::BIGINT AS sum_k,
      |  round(avg(regexp_extract(props, '"k": (\d+)', 1)::BIGINT), 4) AS avg_k,
      |  round(avg(value), 4) AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q_line_dedup — corpus-wide duplicated-line removal (RefinedWeb
    * boilerplate scrub) over 3-word windows of the fixture's token
    * stream: lines occurring more than twice anywhere in the corpus are
    * stripped from every document, and the result row carries the kept
    * count and an md5 of the reassembled text, so the hashes only match
    * if both engines keep exactly the same windows in the same order.
    * See [[graft.llm.LineDedup]] for the digest-only shuffle design.
    */
  val LineW = 3
  val LineMaxOccur = 2

  val qLineDedup: Q = (s, dir) =>
    LineDedup.dedupLines(Tables.documents(s, dir), col("doc_id"),
        LineDedup.wordWindows(col("text"), LineW), maxOccur = LineMaxOccur)
      .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
        col("kept_md5"))
      .orderBy("doc_id")

  val qLineDedupSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, t,
      |    unnest(range(0, CAST(ceil(len(t) / $LineW.0) AS BIGINT))) AS pos
      |  FROM toks),
      |lines AS (
      |  SELECT doc_id, pos,
      |    array_to_string(t[(pos * $LineW + 1):(pos * $LineW + $LineW)], ' ') AS line
      |  FROM pos),
      |dup AS (SELECT line FROM lines GROUP BY line
      |        HAVING count(*) > $LineMaxOccur),
      |kept AS (SELECT doc_id, pos, line FROM lines ANTI JOIN dup USING (line)),
      |agg AS (SELECT doc_id, count(*) AS n_kept,
      |          md5(string_agg(line, ' ' ORDER BY pos)) AS kept_md5
      |        FROM kept GROUP BY doc_id),
      |nl AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(nl.n_lines, 0)::INT AS n_lines,
      |  coalesce(agg.n_kept, 0)::INT AS n_kept,
      |  coalesce(agg.kept_md5, md5('')) AS kept_md5
      |FROM documents d
      |LEFT JOIN nl ON nl.doc_id = d.doc_id
      |LEFT JOIN agg ON agg.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q_weighted_sample — reproducible weighted sampling without
    * replacement (Efraimidis-Spirakis, md5-keyed): top 50 documents by
    * ln(u)/w with w = n_chars. Selection is a TakeOrderedAndProject
    * (per-partition top-n, no global sort); the oracle derives the same
    * 32-bit uniform from the md5 hex prefix.
    */
  val SampleN = 50

  val qWeightedSample: Q = (s, dir) =>
    WeightedSample.sample(Tables.documents(s, dir), col("doc_id"),
        col("n_chars"), n = SampleN)
      .select(col("id").as("doc_id"), col("w"), col("skey"))
      .orderBy(col("skey").desc, col("doc_id"))

  val qWeightedSampleSql: String =
    s"""SELECT doc_id, n_chars::DOUBLE AS w,
      |  round(ln((CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS UBIGINT) + 1)
      |          / 4294967296.0) / n_chars, 9) AS skey
      |FROM documents ORDER BY skey DESC, doc_id LIMIT $SampleN""".stripMargin

  /** q_wordpiece — greedy longest-prefix subword segmentation (the
    * tokenizer-apply step) over a fixed piece vocabulary: corpus-wide
    * piece frequencies, top 30. The oracle replays the greedy walk as 10
    * unrolled steps (max fixture word length is 8), each picking the
    * longest vocab piece prefixing the remaining suffix via a correlated
    * ORDER BY length DESC LIMIT 1, with the same single-char fallback.
    */
  val WordpieceVocab: Seq[String] =
    (('a' to 'z').map(_.toString) ++ Seq(
      "sp", "ar", "ba", "ch", "wi", "nd", "ow", "st", "re", "am", "er",
      "or", "ta", "bl", "le", "qu", "ue", "ry", "jo", "in", "gr", "ou",
      "up", "ha", "sh", "sc", "an", "me", "rg", "so", "rt", "ke", "ey",
      "va", "lu", "fi", "lt", "da", "li", "ne", "co", "um", "cu", "to",
      "pa", "ag", "gg", "de", "du", "ro", "sm", "al", "sl", "fa", "bi",
      "the", "row", "key", "big", "dup", "park", "atch", "ream", "tabl",
      "uery", "roup", "hash", "merg", "sort", "wind", "indo", "valu",
      "vect", "ecto", "colu", "umn", "cust", "omer", "filt", "scan",
      "agg", "mall", "lin", "ord")).distinct

  val WordpieceSteps = 10
  val WordpieceTopN = 30

  val qWordpiece: Q = (s, dir) =>
    graft.llm.Subword.pieceCounts(Tables.documents(s, dir), col("text"),
        WordpieceVocab, topN = WordpieceTopN)
      .orderBy(col("cnt").desc, col("piece"))

  /** vocab VALUES + 10 unrolled greedy steps over a `words(word, …)`
    * CTE the caller supplies — shared by the wordpiece and fertility
    * oracles.
    */
  private def greedyStepCtesSql: String = {
    val vocabValues = WordpieceVocab.map(p => s"('$p')").mkString(", ")
    val steps = (1 to WordpieceSteps).map { t =>
      val p = s"s${t - 1}"
      s"""s$t AS (
         |  SELECT word,
         |    CASE WHEN pos > length(word) THEN pos
         |         ELSE pos + length(best) END AS pos,
         |    CASE WHEN pos > length(word) THEN pieces
         |         ELSE list_append(pieces, best) END AS pieces
         |  FROM (
         |    SELECT word, pos, pieces,
         |      coalesce((SELECT v.p FROM vocab v
         |                WHERE v.p = substr(word, pos, length(v.p))
         |                  AND length(v.p) > 1
         |                ORDER BY length(v.p) DESC LIMIT 1),
         |               substr(word, pos, 1)) AS best
         |    FROM $p))""".stripMargin
    }.mkString(",\n")
    s"""vocab(p) AS (VALUES $vocabValues),
       |s0 AS (SELECT word, 1 AS pos, []::VARCHAR[] AS pieces FROM words),
       |$steps""".stripMargin
  }

  val qWordpieceSql: String =
    s"""WITH words AS (
       |  SELECT u AS word, count(*) AS wcnt FROM (
       |    SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |                  ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END) AS u
       |    FROM documents) WHERE u <> '' GROUP BY u),
       |$greedyStepCtesSql,
       |pc AS (SELECT unnest(pieces) AS piece, wcnt
       |       FROM s$WordpieceSteps JOIN words USING (word))
       |SELECT piece, sum(wcnt)::BIGINT AS cnt FROM pc GROUP BY piece
       |ORDER BY cnt DESC, piece LIMIT $WordpieceTopN""".stripMargin

  /** q_fertility — tokenizer fertility (pieces per word) by language:
    * the standard tokenizer-eval number, closing the tokenizer family
    * (vocab trains it, q_wordpiece applies it, this measures it). The
    * corpus pass emits one (lang, words, pieces) pair per document from
    * the same greedy kernel; the oracle segments the DISTINCT words once
    * and weights piece counts by per-language word frequencies.
    */
  val qFertility: Q = (s, dir) =>
    graft.llm.Subword.fertilityByGroup(Tables.documents(s, dir),
        col("lang"), col("text"), WordpieceVocab)
      .orderBy("lang")

  val qFertilitySql: String =
    s"""WITH toks AS (
       |  SELECT lang, unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |                ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END) AS u
       |  FROM documents),
       |wl AS (SELECT lang, u AS word, count(*) AS cnt
       |       FROM toks WHERE u <> '' GROUP BY lang, u),
       |words AS (SELECT DISTINCT word FROM wl),
       |$greedyStepCtesSql,
       |np AS (SELECT word, len(pieces) AS np FROM s$WordpieceSteps)
       |SELECT lang, sum(cnt)::BIGINT AS n_words,
       |  sum(cnt * np)::BIGINT AS n_pieces,
       |  round(sum(cnt * np)::DOUBLE / sum(cnt), 4) AS fertility
       |FROM wl JOIN np USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** q_pq_topk — product quantization ANN: per-subspace codebooks
    * (m=4 × k=16, 2 Lloyd iterations, [[graft.llm.Cluster]]'s
    * determinism contract), every vector encoded to its 4 code bytes,
    * and the corpus ADC-scored against the anchor vector (vec_id 0)
    * from the precomputed distance table — top 20 ascending. The oracle
    * unrolls Lloyd's per subspace (the q_kmeans SQL shape over list
    * slices), derives the same codes, and sums the same four rounded
    * table entries in subspace order.
    */
  /** m = 8 subquantizers (round 14, VERDICT r13 item 1): the r13 sizing
    * table exposed end-to-end rerank recall stuck at 0.40 because the
    * m=4 ADC shortlist ordering fed a fixed R=50; the r14 m × R sweep
    * (IVFSIZING_sf10_r14 `pq_sweep`) measured R as the dominant lever
    * and m=8 as the best codebook: recall@20 0.40 → 0.85 at rerank p50
    * 154 ms (vs 168 ms before — the deeper shortlist join costs less
    * than the old mis-ordering wasted).
    */
  val PqM = 8
  val PqK = 16
  val PqIters = 2
  val PqTopK = 20
  val PqAnchor = 0L

  /** PQ codebooks memoized per (session, dir) — one all-subspace Lloyd
    * fit shared by q_pq_topk / q_pq_recall / q_pq_distortion /
    * q_ivfpq_recall (the [[QueriesPipeline.kmeansCentsOf]] discipline:
    * a trained model is an artifact, not a per-query recomputation;
    * fit is deterministic so results are unchanged).
    */
  private val pqMemo = ModelMemo.perSession[Array[Array[Array[Double]]]]
  private[graft] def pqCentsOf(s: org.apache.spark.sql.SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqMemo.getOrFit(s, dir)(graft.llm.ProductQuant.fit(
      Tables.embeddings(s, dir), col("vec_id"), col("embedding"),
      m = PqM, k = PqK, iters = PqIters))

  val qPqTopk: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val cents = pqCentsOf(s, dir)
    val query = Anchors.vecD(s, dir, PqAnchor)
    graft.llm.ProductQuant.adcTopK(emb, col("vec_id"), col("embedding"),
        cents, query, topK = PqTopK)
      .select(col("id").as("vec_id"), col("codes"), col("adc"))
      .orderBy(col("adc"), col("vec_id"))
  }

  /** The shared PQ CTE chain: emb, per-subspace Lloyd blocks, final
    * codes (code$j) + anchor distance tables (qd$j) — embedded by the
    * q_pq_topk / q_pq_distortion oracles (q_pq_recall nests the full
    * topk SQL instead).
    */
  private val pqCtesSql: String =
    s"""emb AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |${pqCtesBody("emb")}""".stripMargin

  /** The per-subspace Lloyd/code/table CTEs reading vectors from
    * `embTable` (vec_id, e) — parametrized so q_ivfpq_recall can compose
    * them next to the coarse-quantizer CTEs (whose own `emb` has float
    * semantics) without a CTE-name collision.
    */
  private def pqCtesBody(embTable: String): String = {
    val dim = 64
    val sub = dim / PqM
    def dist(sCol: String, cTab: String): String =
      s"round(list_sum(list_transform(range(1, $sub + 1), " +
        s"i -> ($sCol[i] - $cTab.c[i]) * ($sCol[i] - $cTab.c[i]))), 6)"
    val perSub = (0 until PqM).map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      val iterBlocks = (1 to PqIters).map { t =>
        val p = s"c${j}_${t - 1}"
        s"""a${j}_$t AS (
           |  SELECT vec_id, cid,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY ${dist("s", p)}, cid) AS rn
           |  FROM e$j CROSS JOIN $p),
           |m${j}_$t AS (SELECT vec_id, cid FROM a${j}_$t WHERE rn = 1),
           |u${j}_$t AS (SELECT cid, unnest(range(1, $sub + 1)) AS i, s
           |        FROM m${j}_$t JOIN e$j USING (vec_id)),
           |n${j}_$t AS (
           |  SELECT cid, list(mm ORDER BY i) AS c
           |  FROM (SELECT cid, i, round(avg(s[i]), 6) AS mm
           |        FROM u${j}_$t GROUP BY cid, i)
           |  GROUP BY cid),
           |c${j}_$t AS (SELECT p.cid, coalesce(n.c, p.c) AS c
           |        FROM c${j}_${t - 1} p LEFT JOIN n${j}_$t n USING (cid))""".stripMargin
      }.mkString(",\n")
      s"""e$j AS (SELECT vec_id, list_transform(e[$lo:$hi], x -> x) AS s FROM $embTable),
         |c${j}_0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, s AS c
         |  FROM (SELECT vec_id, s FROM e$j ORDER BY vec_id LIMIT $PqK)),
         |$iterBlocks,
         |f$j AS (
         |  SELECT vec_id, cid, d,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |  FROM (SELECT vec_id, cid, ${dist("s", s"c${j}_$PqIters")} AS d
         |        FROM e$j CROSS JOIN c${j}_$PqIters)),
         |code$j AS (SELECT vec_id, cid FROM f$j WHERE rn = 1),
         |qd$j AS (
         |  SELECT cid, ${dist("qs", s"c${j}_$PqIters")} AS d
         |  FROM c${j}_$PqIters CROSS JOIN
         |    (SELECT s AS qs FROM e$j WHERE vec_id = $PqAnchor))""".stripMargin
    }.mkString(",\n")
    perSub
  }

  val qPqTopkSql: String = {
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN code$j USING (vec_id)").mkString(" ")
    val qdJoins = (0 until PqM)
      .map(j => s"JOIN qd$j ON qd$j.cid = code$j.cid").mkString(" ")
    val codesExpr = (0 until PqM)
      .map(j => s"code$j.cid::VARCHAR").mkString(" || '-' || ")
    val adcExpr = (0 until PqM).map(j => s"qd$j.d").mkString(" + ")
    s"""WITH $pqCtesSql
       |SELECT code0.vec_id, $codesExpr AS codes,
       |  round($adcExpr, 6) AS adc
       |FROM code0 $codeJoins $qdJoins
       |ORDER BY adc, code0.vec_id LIMIT $PqTopK""".stripMargin
  }

  /** q_pq_distortion — per-label mean quantization error: the
    * compression-quality number of the PQ index (how much squared-L2 a
    * vector loses when replaced by its codebook reconstruction). The
    * kernel sums each subspace's 6-dp assign distance in subspace order;
    * the oracle sums the same f$j best distances per vector, so the
    * doubles are identical before the 6-dp avg round.
    */
  val qPqDistortion: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val cents = pqCentsOf(s, dir)
    graft.llm.ProductQuant.distortionByGroup(emb, col("label"),
        col("embedding"), cents)
      .orderBy("label")
  }

  val qPqDistortionSql: String = {
    val qerrJoins = (1 until PqM)
      .map(j => s"JOIN d$j USING (vec_id)").mkString(" ")
    val qerrExpr = (0 until PqM).map(j => s"d$j.d").mkString(" + ")
    val dCtes = (0 until PqM)
      .map(j => s"d$j AS (SELECT vec_id, d FROM f$j WHERE rn = 1)")
      .mkString(",\n")
    s"""WITH $pqCtesSql,
       |$dCtes,
       |qerr AS (
       |  SELECT d0.vec_id, $qerrExpr AS qe
       |  FROM d0 $qerrJoins)
       |SELECT e2.label, count(*)::BIGINT AS n,
       |  round(avg(qe), 6) AS avg_qerr
       |FROM qerr JOIN embeddings e2 ON e2.vec_id = qerr.vec_id
       |GROUP BY e2.label ORDER BY e2.label""".stripMargin
  }

  /** q_pq_recall — the ANN quality metric for q_pq_topk: how many of the
    * exact squared-L2 top-20 for the anchor survive in the PQ ADC
    * top-20. Both sides share the 6-dp rounding + id tie-break, so the
    * overlap count is deterministic; the oracle nests the full PQ SQL as
    * a CTE next to an exact-distance CTE and joins them.
    */
  val qPqRecall: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val cents = pqCentsOf(s, dir)
    val query = Anchors.vecD(s, dir, PqAnchor)
    val adc = graft.llm.ProductQuant.adcTopK(emb, col("vec_id"),
      col("embedding"), cents, query, topK = PqTopK).select(col("id"))
    val exact = graft.llm.ProductQuant.exactTopK(emb, col("vec_id"),
      col("embedding"), query, topK = PqTopK)
      .select(col("id").as("eid"))
    adc.join(exact, adc("id") === exact("eid"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(PqTopK).as("k"), col("n_overlap"),
        round(col("n_overlap") / PqTopK.toDouble, 4).as("recall"))
  }

  val qPqRecallSql: String =
    s"""WITH pq AS ($qPqTopkSql),
       |embx AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |qv AS (SELECT e FROM embx WHERE vec_id = $PqAnchor),
       |ex AS (SELECT vec_id FROM (
       |    SELECT embx.vec_id,
       |      round(list_sum(list_transform(range(1, 65),
       |        i -> (embx.e[i] - qv.e[i]) * (embx.e[i] - qv.e[i]))), 6) AS d
       |    FROM embx CROSS JOIN qv)
       |  ORDER BY d, vec_id LIMIT $PqTopK)
       |SELECT $PqTopK AS k, count(*)::BIGINT AS n_overlap,
       |  round(count(*) / $PqTopK.0, 4) AS recall
       |FROM pq JOIN ex ON pq.vec_id = ex.vec_id""".stripMargin

  /** q_ppl_buckets — model-based curation report: documents bucketed
    * into quartiles of their bigram-LM log-probability (the
    * perplexity-filtering shape of CCNet/DSIR pipelines), with per-bucket
    * counts and mean score. Thresholds are the exact interpolated
    * quartiles ([[graft.operators.Profile.percentileThreshold]], the
    * q_quality_filter discipline — 6-dp grid, DuckDB quantile_cont
    * parity); scores are 4-dp on both sides before any comparison.
    */
  val qPplBuckets: Q = (s, dir) => {
    val lp = graft.llm.LangModel
      .bigramLogProb(Tables.documents(s, dir), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), round(col("logprob"), 4).as("lp"))
      .persist()
    val Seq(t1, t2, t3) = Seq(0.25, 0.5, 0.75).map(p =>
      graft.operators.Profile.percentileThreshold(lp, col("lp"), p, exact = true))
    lp.select(col("lp"),
        when(col("lp") < t1, 0).when(col("lp") < t2, 1)
          .when(col("lp") < t3, 2).otherwise(3).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(avg("lp"), 4).as("mean_lp"))
      .orderBy("bucket")
  }

  val qPplBucketsSql: String = {
    val bigram = QueriesPipeline.qBigramLogprobSql
      .stripSuffix("\nGROUP BY bg.doc_id ORDER BY bg.doc_id") +
      "\nGROUP BY bg.doc_id"
    s"""WITH lp AS (
       |  SELECT doc_id, round(logprob, 4) AS lp FROM ($bigram)),
       |q AS (SELECT round(quantile_cont(lp, 0.25), 6) AS t1,
       |             round(quantile_cont(lp, 0.50), 6) AS t2,
       |             round(quantile_cont(lp, 0.75), 6) AS t3 FROM lp)
       |SELECT bucket, count(*) AS n, round(avg(lp), 4) AS mean_lp
       |FROM (SELECT CASE WHEN lp < q.t1 THEN 0 WHEN lp < q.t2 THEN 1
       |                  WHEN lp < q.t3 THEN 2 ELSE 3 END AS bucket, lp
       |      FROM lp, q)
       |GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** q_dup_cluster_sizes — dedup observability: the size distribution of
    * near-dup components (how big do duplicate clusters get?), reusing
    * q_dedup_components' graph. Two bounded aggregations after the
    * pointer-jumping components; the oracle wraps the recursive-CTE
    * components in a double GROUP BY.
    */
  val qDupClusterSizes: Q = (s, dir) =>
    QueriesLlm.componentsOf(s, dir) // memoized labels (shared with q_dedup_components)
      .groupBy("comp").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_components"))
      .orderBy("csize")

  val qDupClusterSizesSql: String = {
    val comps = QueriesLlm.qDedupComponentsSql
      .stripSuffix(" ORDER BY doc_id")
    s"""WITH comps AS ($comps)
       |SELECT csize, count(*)::BIGINT AS n_components
       |FROM (SELECT component, count(*) AS csize FROM comps GROUP BY component)
       |GROUP BY csize ORDER BY csize""".stripMargin
  }

  /** q_zorder_layout — the write-time Z-order clustering metric: lineitem
    * keyed by the Morton interleave of 8-bit-quantized (l_extendedprice,
    * l_quantity), grouped into the 64 leading-bit z-ranges a clustered
    * writer would emit as files ([[graft.operators.ZOrder.cluster]]'s
    * range partitions). Each row is one would-be file's footer stats:
    * row count + min/max cell in BOTH dimensions — bounded rectangles,
    * i.e. the multi-dim pruning a z-ordered 100-TB layout buys. The
    * quantization bounds come from one bounded stats pass (4 scalars);
    * everything else is codegen'd long arithmetic + one partial-agged
    * groupBy. The oracle replays the identical IEEE quantize + unrolled
    * bit interleave in SQL.
    */
  val ZBits = 8
  val ZBucketShift = 10 // 16-bit key >> 10 = 64 buckets

  val qZorderLayout: Q = (s, dir) => {
    import graft.operators.ZOrder
    val li = Tables.lineitem(s, dir)
    val b = li.agg(min("l_extendedprice"), max("l_extendedprice"),
      min("l_quantity"), max("l_quantity")).head()
    val (plo, phi, qlo, qhi) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val qx = ZOrder.quantize(col("l_extendedprice"), lit(plo), lit(phi), ZBits)
    val qy = ZOrder.quantize(col("l_quantity"), lit(qlo), lit(qhi), ZBits)
    li.select(qx.as("qx"), qy.as("qy"))
      .withColumn("zkey", ZOrder.interleave(Seq(col("qx"), col("qy")), ZBits))
      .groupBy(shiftright(col("zkey"), ZBucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("qx").as("min_qx"), max("qx").as("max_qx"),
        min("qy").as("min_qy"), max("qy").as("max_qy"))
      .orderBy("bucket")
  }

  val qZorderLayoutSql: String = {
    val cells = 1L << ZBits
    def quant(v: String, lo: String, hi: String) =
      s"least(${cells - 1}, greatest(0, floor((($v - $lo) / ($hi - $lo)) * $cells)::BIGINT))"
    val terms = (for {
      i <- 0 until ZBits
      (c, ci) <- Seq("qx", "qy").zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * 2 + ci})").mkString(" | ")
    s"""WITH b AS (
       |  SELECT min(l_extendedprice) AS plo, max(l_extendedprice) AS phi,
       |         min(l_quantity) AS qlo, max(l_quantity) AS qhi
       |  FROM lineitem),
       |q AS (
       |  SELECT ${quant("l_extendedprice", "b.plo", "b.phi")} AS qx,
       |         ${quant("l_quantity", "b.qlo", "b.qhi")} AS qy
       |  FROM lineitem, b),
       |z AS (SELECT qx, qy, ($terms) AS zkey FROM q)
       |SELECT zkey >> $ZBucketShift AS bucket, count(*) AS n,
       |  min(qx) AS min_qx, max(qx) AS max_qx,
       |  min(qy) AS min_qy, max(qy) AS max_qy
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** q_zorder_extract — the read side of the z-order layout end-to-end,
    * now in THREE dimensions (a 100-TB table clusters on 3-4 columns, not
    * 2): write lineitem z-clustered on 8-bit-quantized (l_extendedprice,
    * l_quantity, l_partkey) ([[graft.operators.ZOrder.cluster]], 8
    * range-partitioned sorted files over the 24-bit key), then answer a
    * three-dimensional cell box with [[graft.operators.ZOrder.zRangesN]]'
    * octree z-interval decomposition pushed onto the sorted zkey column
    * (footer stats skip whole files/row groups) plus the exact
    * per-dimension residual predicate. The oracle ignores the layout
    * entirely and counts the same box straight off the raw table — the
    * layout must change the COST, never the answer. ZOrderSpec pins the
    * actual file skipping.
    */
  val ZRect3 = Seq((64L, 191L), (64L, 191L), (0L, 127L)) // middle half ×2, lower half

  val qZorderExtract: Q = (s, dir) => {
    import graft.operators.ZOrder
    val li = Tables.lineitem(s, dir)
    val b = li.agg(min("l_extendedprice"), max("l_extendedprice"),
      min("l_quantity"), max("l_quantity"),
      min(col("l_partkey").cast("double")), max(col("l_partkey").cast("double"))).head()
    val qx = ZOrder.quantize(col("l_extendedprice"),
      lit(b.getDouble(0)), lit(b.getDouble(1)), ZBits)
    val qy = ZOrder.quantize(col("l_quantity"),
      lit(b.getDouble(2)), lit(b.getDouble(3)), ZBits)
    val qz = ZOrder.quantize(col("l_partkey"),
      lit(b.getDouble(4)), lit(b.getDouble(5)), ZBits)
    val keyed = li.select(col("l_orderkey"), col("l_quantity"),
        qx.as("qx"), qy.as("qy"), qz.as("qz"))
      .withColumn("zkey",
        ZOrder.interleave(Seq(col("qx"), col("qy"), col("qz")), ZBits))
    val out = TempDirs.create("graft_zorder")
    ZOrder.cluster(keyed, col("zkey"), numFiles = 8)
      .write.mode("overwrite").parquet(out)
    val ranges = ZOrder.zRangesN(ZRect3.map(_._1), ZRect3.map(_._2), ZBits)
    val Seq((lx, hx), (ly, hy), (lz, hz)) = ZRect3
    s.read.parquet(out)
      .where(ZOrder.zRangeFilter(col("zkey"), ranges) &&
        col("qx").between(lx, hx) && col("qy").between(ly, hy) &&
        col("qz").between(lz, hz))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  val qZorderExtractSql: String = {
    val cells = 1L << ZBits
    def quant(v: String, lo: String, hi: String) =
      s"least(${cells - 1}, greatest(0, floor((($v - $lo) / ($hi - $lo)) * $cells)::BIGINT))"
    val Seq((lx, hx), (ly, hy), (lz, hz)) = ZRect3
    s"""WITH b AS (
       |  SELECT min(l_extendedprice) AS plo, max(l_extendedprice) AS phi,
       |         min(l_quantity) AS qlo, max(l_quantity) AS qhi,
       |         min(l_partkey::DOUBLE) AS klo, max(l_partkey::DOUBLE) AS khi
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_quantity,
       |    ${quant("l_extendedprice", "b.plo", "b.phi")} AS qx,
       |    ${quant("l_quantity", "b.qlo", "b.qhi")} AS qy,
       |    ${quant("l_partkey::DOUBLE", "b.klo", "b.khi")} AS qz
       |  FROM lineitem, b)
       |SELECT count(*) AS n_rows, sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       |  count(DISTINCT l_orderkey) AS n_orders
       |FROM q
       |WHERE qx BETWEEN $lx AND $hx AND qy BETWEEN $ly AND $hy
       |  AND qz BETWEEN $lz AND $hz""".stripMargin
  }

  /** q_jl_project — Johnson–Lindenstrauss sketching quality: the corpus
    * projected 64→16 dims through [[graft.llm.RandomProjection]]'s
    * deterministic Rademacher matrix, then (a) recall@20 of the
    * projected-space L2 top-20 around the anchor against the exact
    * top-20, and (b) the mean norm-preservation ratio the JL lemma
    * promises ≈ 1. The projection is a narrow kernel re-derived by each
    * consumer (an anchor lookup at construction, the projected top-k,
    * and the ratio agg) — cheaper than pinning persisted blocks for the
    * session, and it keeps the returned plan LAZY so PlanAudit's
    * cartesian/window/shuffle pins cover the real work. Two TakeOrdered
    * top-ks (map-side partial top-k, driver merge — no global sort), one
    * scalar agg, one allowlisted crossJoin of two ONE-row aggregates.
    * The oracle regenerates the sign matrix with the same polynomial via
    * nested list lambdas, shaped to always yield exactly one row even at
    * zero overlap (one-row CTE aggregates, no GROUP BY over the joined
    * rows — ADVICE r7).
    */
  val JlK = 16
  val JlTopK = 20
  val JlAnchor = 0L

  val qJlProject: Q = (s, dir) => {
    import graft.llm.{ProductQuant, RandomProjection}
    val emb = Tables.embeddings(s, dir)
    val proj = emb.select(col("vec_id"), col("embedding"),
        RandomProjection.project(col("embedding"), d = 64, k = JlK).as("p"))
      .withColumn("ratio", RandomProjection.normRatio(col("embedding"), col("p"), JlK))
    val anchorP = proj.where(col("vec_id") === JlAnchor)
      .select("p").head().getSeq[Double](0).toArray
    val anchorV = Anchors.vecD(s, dir, JlAnchor)
    val topProj = proj
      .select(col("vec_id").as("pid"),
        RandomProjection.dist2(col("p"), anchorP).as("pd2"))
      .orderBy(col("pd2"), col("pid")).limit(JlTopK)
    val topExact = ProductQuant.exactTopK(emb, col("vec_id"),
      col("embedding"), anchorV, topK = JlTopK).select(col("id").as("eid"))
    val overlap = topProj.join(topExact, topProj("pid") === topExact("eid"))
      .agg(count(lit(1)).as("n_overlap"))
    val ratio = proj.agg(round(avg("ratio"), 4).as("mean_norm_ratio"))
    overlap.crossJoin(ratio)
      .select(lit(JlTopK).as("k"), col("n_overlap"),
        round(col("n_overlap") / JlTopK.toDouble, 4).as("recall"),
        col("mean_norm_ratio"))
  }

  val qJlProjectSql: String = {
    val sign = "CASE WHEN (((i*37 + j*61) * 127) % 101) % 2 = 0 THEN 1 ELSE -1 END"
    s"""WITH embx AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |proj AS (
       |  SELECT vec_id, e, list_transform(range(0, $JlK), j ->
       |    round(list_sum(list_transform(range(0, 64),
       |      i -> e[i+1] * ($sign))), 6)) AS p
       |  FROM embx),
       |qp AS (SELECT p FROM proj WHERE vec_id = $JlAnchor),
       |qv AS (SELECT e FROM embx WHERE vec_id = $JlAnchor),
       |px AS (SELECT vec_id FROM (
       |    SELECT proj.vec_id,
       |      round(list_sum(list_transform(range(1, ${JlK + 1}),
       |        i -> (proj.p[i] - qp.p[i]) * (proj.p[i] - qp.p[i]))), 6) AS d
       |    FROM proj CROSS JOIN qp)
       |  ORDER BY d, vec_id LIMIT $JlTopK),
       |ex AS (SELECT vec_id FROM (
       |    SELECT embx.vec_id,
       |      round(list_sum(list_transform(range(1, 65),
       |        i -> (embx.e[i] - qv.e[i]) * (embx.e[i] - qv.e[i]))), 6) AS d
       |    FROM embx CROSS JOIN qv)
       |  ORDER BY d, vec_id LIMIT $JlTopK),
       |r AS (SELECT round(avg(CASE WHEN nx = 0 THEN 0.0
       |                            ELSE (np / $JlK) / nx END), 4) AS mean_norm_ratio
       |      FROM (SELECT list_sum(list_transform(e, x -> x*x)) AS nx,
       |                   list_sum(list_transform(p, x -> x*x)) AS np
       |            FROM proj)),
       |ov AS (SELECT count(*)::BIGINT AS n_overlap
       |       FROM px JOIN ex ON px.vec_id = ex.vec_id)
       |SELECT $JlTopK AS k, ov.n_overlap,
       |  round(ov.n_overlap / $JlTopK.0, 4) AS recall, r.mean_norm_ratio
       |FROM ov, r""".stripMargin
  }

  /** q_bucketed_join — the persisted co-located join layout: lineitem and
    * orders each written as an 8-bucket catalog table hash-bucketed and
    * sorted on the join key ([[graft.operators.Bucketing.writeBucketed]]),
    * then sort-merge-joined bucket-to-bucket with ZERO join-side exchange
    * (BucketingSpec pins the exchange-free plan) — the write-once,
    * join-many layout for 100-TB fact-to-fact joins. Output sticks to
    * integral aggregates (counts + integral-double quantity sums), so the
    * hash compare is float-noise-free; the oracle runs the same join on
    * the raw parquet.
    */
  val qBucketedJoin: Q = (s, dir) => {
    import graft.operators.Bucketing
    val base = TempDirs.create("graft_bucketed")
    // path-derived table names: unique per invocation, so concurrent
    // sessions sharing a metastore (or bench reps) never race on a name
    val li = Bucketing.writeBucketedAuto(s, Tables.lineitem(s, dir),
      "graft_li_bucketed", s"$base/lineitem", "l_orderkey", buckets = 8)
    val ord = Bucketing.writeBucketedAuto(s, Tables.orders(s, dir),
      "graft_ord_bucketed", s"$base/orders", "o_orderkey", buckets = 8)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val qBucketedJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
      |  count(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q_ivf_recall — the ANN quality/cost tradeoff of the IVF scale path
    * in one row: a deterministic-Lloyd coarse quantizer
    * ([[graft.llm.Cluster.kmeansWithCentroids]], q_kmeans's exact
    * machinery), the anchor probing its nProbe=2 nearest centroids, exact
    * L2 top-20 within the probed cells only — reported with the probed
    * candidate count (the fraction of the corpus an IVF query READS) and
    * recall against the full-corpus exact top-20. The oracle extends
    * q_kmeans's shared unrolled-Lloyd CTEs with probe ordering over the
    * final centroid table.
    */
  val IvfNProbe = 2

  val qIvfRecall: Q = (s, dir) => {
    import graft.llm.{Cluster, ProductQuant}
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val assigned = Cluster.assignWith(emb, col("vec_id"), col("embedding"), cents)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    // probe order: 6-dp-rounded squared L2 anchor→centroid, ties to the
    // lower cid — k scalars on the driver, same discipline as the cells
    val probes = cents.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var t = 0
      while (t < c.length) { val x = anchorV(t) - c(t); d += x * x; t += 1 }
      (math.floor(d * 1e6 + 0.5) / 1e6, i)
    }.sortBy(p => (p._1, p._2)).take(IvfNProbe).map(_._2)
    val cand = assigned.where(col("cluster").isin(probes.toIndexedSeq: _*))
      .select(col("id"))
    val candVec = Tables.embeddings(s, dir)
      .join(cand, col("vec_id") === cand("id")).select("vec_id", "embedding")
    val ivfTop = ProductQuant.exactTopK(candVec, col("vec_id"),
      col("embedding"), anchorV, topK = PqTopK).select(col("id").as("iid"))
    val exact = ProductQuant.exactTopK(emb, col("vec_id"), col("embedding"),
      anchorV, topK = PqTopK).select(col("id").as("eid"))
    val overlap = ivfTop.join(exact, col("iid") === col("eid"))
      .agg(count(lit(1)).as("n_overlap"))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    overlap.crossJoin(nCand)
      .select(lit(PqTopK).as("k"), lit(IvfNProbe).as("n_probe"),
        col("n_candidates"), col("n_overlap"),
        round(col("n_overlap") / PqTopK.toDouble, 4).as("recall"))
  }

  val qIvfRecallSql: String = {
    val cf = s"c${QueriesPipeline.KmeansIters}"
    s"""WITH ${QueriesPipeline.kmeansCtes},
       |asg AS (SELECT vec_id, cid FROM af WHERE rn = 1),
       |qv AS (SELECT list_transform(e, x -> x::DOUBLE) AS q
       |       FROM emb WHERE vec_id = $PqAnchor),
       |cd AS (SELECT cid, round(list_sum(list_transform(range(1, 65),
       |    i -> (qv.q[i] - c.c[i]) * (qv.q[i] - c.c[i]))), 6) AS d
       |  FROM $cf c CROSS JOIN qv),
       |probes AS (SELECT cid FROM cd ORDER BY d, cid LIMIT $IvfNProbe),
       |cand AS (SELECT a.vec_id FROM asg a JOIN probes p ON a.cid = p.cid),
       |ivf AS (SELECT vec_id FROM (
       |    SELECT emb.vec_id, round(list_sum(list_transform(range(1, 65),
       |      i -> (emb.e[i]::DOUBLE - qv.q[i]) * (emb.e[i]::DOUBLE - qv.q[i]))), 6) AS d
       |    FROM emb JOIN cand USING (vec_id) CROSS JOIN qv)
       |  ORDER BY d, vec_id LIMIT $PqTopK),
       |ex AS (SELECT vec_id FROM (
       |    SELECT emb.vec_id, round(list_sum(list_transform(range(1, 65),
       |      i -> (emb.e[i]::DOUBLE - qv.q[i]) * (emb.e[i]::DOUBLE - qv.q[i]))), 6) AS d
       |    FROM emb CROSS JOIN qv)
       |  ORDER BY d, vec_id LIMIT $PqTopK),
       |nc AS (SELECT count(*)::BIGINT AS n_candidates FROM cand),
       |ov AS (SELECT count(*)::BIGINT AS n_overlap
       |       FROM ivf JOIN ex USING (vec_id))
       |SELECT $PqTopK AS k, $IvfNProbe AS n_probe, nc.n_candidates,
       |  ov.n_overlap, round(ov.n_overlap / $PqTopK.0, 4) AS recall
       |FROM nc, ov""".stripMargin
  }

  /** q_ivfpq_recall — the composed big-ANN index (IVF-PQ, the standard
    * 100-TB serving shape): the coarse quantizer partitions the corpus
    * into centroid directories ([[graft.llm.Cluster.kmeansWithCentroids]],
    * q_ivf_recall's machinery), every vector is PQ-encoded to its m=4
    * code bytes ([[graft.llm.ProductQuant.encode]]) and PERSISTED
    * partitioned by cluster — the on-disk index holds code bytes only.
    * Serving reads just the anchor's nProbe probed directories
    * (`cluster IN (…)` → PartitionFilters; unprobed partitions are never
    * listed) and ADC-scores the stored codes against the broadcast m × k
    * distance table ([[ProductQuant.adcFromCodes]]) — no raw vector is
    * touched after the write. Reported: candidate count (corpus fraction
    * READ), recall@20 vs the exact full-corpus top-20, and the
    * code-bytes-read fraction vs raw float32 scan
    * (n_candidates·m / (n·dim·4)). The oracle composes the shared
    * unrolled coarse-Lloyd CTEs with the per-subspace PQ CTEs (reading
    * from a double-cast `pqemb` so the two `emb` semantics can't
    * collide) and replays probe selection, candidate restriction, and
    * candidate-only ADC ranking in SQL.
    */
  val qIvfPqRecall: Q = (s, dir) => {
    import graft.llm.{IvfPq, ProductQuant}
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    // the query entry fetches the anchor once for determinism; the
    // [[IvfPq]] serving API itself takes the query vector as a
    // client-supplied array (VERDICT r8 item 9 — a production lookup
    // never runs a Spark job to obtain its own query)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    // the persisted index: (vec_id, m code bytes) partitioned by coarse
    // cluster — cluster dirs + codes are ALL the serving path reads
    val out = TempDirs.create("graft_ivfpq")
    IvfPq.write(emb, col("vec_id"), col("embedding"), cents, pqCents, out)
    ivfPqServeReport(s, emb, out, cents, pqCents, anchorV)
  }

  /** The shared serving-side report over a persisted IVF-PQ index:
    * recall@k of the ADC top-k vs the exact full-corpus top-k, plus the
    * corpus fraction and code-bytes fraction actually read. The serving
    * read stays a LAZY plan (partition-pruned scan → ADC kernel →
    * TakeOrdered → overlap join → three one-row aggregates, allowlisted
    * crossJoins) so PlanAudit pins cover the path that runs per query
    * at scale; only the index BUILD is construction-time.
    */
  private def ivfPqServeReport(s: org.apache.spark.sql.SparkSession,
      emb: org.apache.spark.sql.DataFrame, out: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      anchorV: Array[Double]): org.apache.spark.sql.DataFrame = {
    import graft.llm.{IvfPq, ProductQuant}
    val candCodes = IvfPq.probedCodes(s, out, cents, anchorV, IvfNProbe)
    val top = ProductQuant.adcFromCodes(candCodes, col("id"), col("codes"),
      pqCents, anchorV, topK = PqTopK).select(col("id").as("iid"))
    val exact = ProductQuant.exactTopK(emb, col("vec_id"), col("embedding"),
      anchorV, topK = PqTopK).select(col("id").as("eid"))
    val overlap = top.join(exact, col("iid") === col("eid"))
      .agg(count(lit(1)).as("n_overlap"))
    val nCand = candCodes.agg(count(lit(1)).as("n_candidates"))
    val nTot = emb.agg(count(lit(1)).cast("double").as("n_total"))
    overlap.crossJoin(nCand).crossJoin(nTot)
      .select(lit(PqTopK).as("k"), lit(IvfNProbe).as("n_probe"),
        col("n_candidates"), col("n_overlap"),
        round(col("n_overlap") / PqTopK.toDouble, 4).as("recall"),
        round(col("n_candidates") * PqM / (col("n_total") * 256.0), 6)
          .as("code_bytes_frac"))
  }

  /** The q_ivfpq_recall serving-report SQL, parametrized by a vec_id
    * predicate restricting which corpus rows are IN the index — the
    * maintenance oracles (q_ivfpq_delete / q_ivfpq_merge) are the same
    * rebuilt-form report over the surviving ids (frozen models stay
    * trained on the full corpus, exactly as the engine's memoized
    * centroids/codebooks do).
    */
  private def ivfPqRecallReportSql(vecFilter: String): String = {
    val cf = s"c${QueriesPipeline.KmeansIters}"
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN code$j USING (vec_id)").mkString(" ")
    val qdJoins = (0 until PqM)
      .map(j => s"JOIN qd$j ON qd$j.cid = code$j.cid").mkString(" ")
    val adcExpr = (0 until PqM).map(j => s"qd$j.d").mkString(" + ")
    s"""WITH ${QueriesPipeline.kmeansCtes},
       |asg AS (SELECT vec_id, cid FROM af WHERE rn = 1),
       |pqemb AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |${pqCtesBody("pqemb")},
       |qv AS (SELECT list_transform(e, x -> x::DOUBLE) AS q
       |       FROM emb WHERE vec_id = $PqAnchor),
       |cd AS (SELECT cid, round(list_sum(list_transform(range(1, 65),
       |    i -> (qv.q[i] - c.c[i]) * (qv.q[i] - c.c[i]))), 6) AS d
       |  FROM $cf c CROSS JOIN qv),
       |probes AS (SELECT cid FROM cd ORDER BY d, cid LIMIT $IvfNProbe),
       |cand AS (SELECT a.vec_id FROM asg a JOIN probes p ON a.cid = p.cid
       |         WHERE $vecFilter),
       |adcc AS (
       |  SELECT code0.vec_id, round($adcExpr, 6) AS adc
       |  FROM code0 $codeJoins $qdJoins
       |  JOIN cand ON cand.vec_id = code0.vec_id),
       |ivfpq AS (SELECT vec_id FROM adcc ORDER BY adc, vec_id LIMIT $PqTopK),
       |ex AS (SELECT vec_id FROM (
       |    SELECT emb.vec_id, round(list_sum(list_transform(range(1, 65),
       |      i -> (emb.e[i]::DOUBLE - qv.q[i]) * (emb.e[i]::DOUBLE - qv.q[i]))), 6) AS d
       |    FROM emb CROSS JOIN qv WHERE $vecFilter)
       |  ORDER BY d, vec_id LIMIT $PqTopK),
       |ntot AS (SELECT count(*)::BIGINT AS n FROM embeddings
       |         WHERE $vecFilter),
       |nc AS (SELECT count(*)::BIGINT AS n_candidates FROM cand),
       |ov AS (SELECT count(*)::BIGINT AS n_overlap
       |       FROM ivfpq JOIN ex USING (vec_id))
       |SELECT $PqTopK AS k, $IvfNProbe AS n_probe, nc.n_candidates,
       |  ov.n_overlap, round(ov.n_overlap / $PqTopK.0, 4) AS recall,
       |  round(nc.n_candidates * $PqM / (ntot.n * 256.0), 6) AS code_bytes_frac
       |FROM nc, ov, ntot""".stripMargin
  }

  val qIvfPqRecallSql: String = ivfPqRecallReportSql("TRUE")

  /** q_ivfpq_rerank — the standard IVF-PQ serving refinement (VERDICT
    * r8 item 2): ADC ranks by QUANTIZED distance, so its top-k loses
    * recall to code granularity; the production fix is ADC top-R
    * (R = $IvfRerankR ≫ k, still ≪ corpus) over the probed code bytes,
    * then an exact-distance re-rank of just those R raw vectors
    * ([[graft.llm.IvfPq.serveReranked]]: the R-row shortlist
    * broadcasts, the exact kernel runs on R rows only). Reported:
    * recall@20 before (code-only) and after re-rank, plus the fraction
    * of raw vectors fetched (n_rerank / corpus). The oracle composes
    * the q_ivfpq_recall CTEs with the exact-distance re-rank tail.
    */
  /** Rerank depth 200 (round 14, with [[PqM]]'s note): the sweep showed
    * recall@20 rising 0.5 → 0.85 from R=50 → 200 at m=8 with FLAT p50 —
    * the exact-distance kernel over R stored vectors is broadcast-join
    * bounded, so depth is nearly free until R approaches the probed
    * row count.
    */
  val IvfRerankR = 200

  val qIvfPqRerank: Q = (s, dir) => {
    import graft.llm.{IvfPq, ProductQuant}
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    val out = TempDirs.create("graft_ivfpq_rr")
    IvfPq.write(emb, col("vec_id"), col("embedding"), cents, pqCents, out)
    val candCodes = IvfPq.probedCodes(s, out, cents, anchorV, IvfNProbe)
    val adcTop = ProductQuant.adcFromCodes(candCodes, col("id"),
      col("codes"), pqCents, anchorV, topK = PqTopK)
      .select(col("id").as("iid"))
    val rrTop = IvfPq.serveReranked(s, out, emb, col("vec_id"),
      col("embedding"), cents, pqCents, anchorV, IvfNProbe,
      rerankR = IvfRerankR, topK = PqTopK)
      .select(col("id").as("rid"))
    val exactA = ProductQuant.exactTopK(emb, col("vec_id"),
      col("embedding"), anchorV, topK = PqTopK).select(col("id").as("eid"))
    val exactR = ProductQuant.exactTopK(emb, col("vec_id"),
      col("embedding"), anchorV, topK = PqTopK).select(col("id").as("eid"))
    val ovAdc = adcTop.join(exactA, col("iid") === col("eid"))
      .agg(count(lit(1)).as("n_adc"))
    val ovRr = rrTop.join(exactR, col("rid") === col("eid"))
      .agg(count(lit(1)).as("n_rr"))
    val nCand = candCodes.agg(count(lit(1)).as("n_candidates"))
    val nTot = emb.agg(count(lit(1)).cast("double").as("n_total"))
    ovAdc.crossJoin(ovRr).crossJoin(nCand).crossJoin(nTot)
      .select(lit(PqTopK).as("k"), lit(IvfNProbe).as("n_probe"),
        col("n_candidates"),
        least(col("n_candidates"), lit(IvfRerankR.toLong)).as("n_rerank"),
        round(col("n_adc") / PqTopK.toDouble, 4).as("recall_adc"),
        round(col("n_rr") / PqTopK.toDouble, 4).as("recall_rerank"),
        round(least(col("n_candidates"), lit(IvfRerankR.toLong))
          / col("n_total"), 6).as("raw_frac"))
  }

  val qIvfPqRerankSql: String = {
    val cf = s"c${QueriesPipeline.KmeansIters}"
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN code$j USING (vec_id)").mkString(" ")
    val qdJoins = (0 until PqM)
      .map(j => s"JOIN qd$j ON qd$j.cid = code$j.cid").mkString(" ")
    val adcExpr = (0 until PqM).map(j => s"qd$j.d").mkString(" + ")
    s"""WITH ${QueriesPipeline.kmeansCtes},
       |asg AS (SELECT vec_id, cid FROM af WHERE rn = 1),
       |pqemb AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |${pqCtesBody("pqemb")},
       |qv AS (SELECT list_transform(e, x -> x::DOUBLE) AS q
       |       FROM emb WHERE vec_id = $PqAnchor),
       |cd AS (SELECT cid, round(list_sum(list_transform(range(1, 65),
       |    i -> (qv.q[i] - c.c[i]) * (qv.q[i] - c.c[i]))), 6) AS d
       |  FROM $cf c CROSS JOIN qv),
       |probes AS (SELECT cid FROM cd ORDER BY d, cid LIMIT $IvfNProbe),
       |cand AS (SELECT a.vec_id FROM asg a JOIN probes p ON a.cid = p.cid),
       |adcc AS (
       |  SELECT code0.vec_id, round($adcExpr, 6) AS adc
       |  FROM code0 $codeJoins $qdJoins
       |  JOIN cand ON cand.vec_id = code0.vec_id),
       |ivfpq AS (SELECT vec_id FROM adcc ORDER BY adc, vec_id LIMIT $PqTopK),
       |rr AS (SELECT vec_id FROM adcc ORDER BY adc, vec_id LIMIT $IvfRerankR),
       |rex AS (SELECT emb.vec_id, round(list_sum(list_transform(range(1, 65),
       |      i -> (emb.e[i]::DOUBLE - qv.q[i]) * (emb.e[i]::DOUBLE - qv.q[i]))), 6) AS d
       |    FROM emb JOIN rr USING (vec_id) CROSS JOIN qv),
       |rtop AS (SELECT vec_id FROM rex ORDER BY d, vec_id LIMIT $PqTopK),
       |ex AS (SELECT vec_id FROM (
       |    SELECT emb.vec_id, round(list_sum(list_transform(range(1, 65),
       |      i -> (emb.e[i]::DOUBLE - qv.q[i]) * (emb.e[i]::DOUBLE - qv.q[i]))), 6) AS d
       |    FROM emb CROSS JOIN qv)
       |  ORDER BY d, vec_id LIMIT $PqTopK),
       |ntot AS (SELECT count(*)::BIGINT AS n FROM embeddings),
       |nc AS (SELECT count(*)::BIGINT AS n_candidates FROM cand),
       |nrr AS (SELECT count(*)::BIGINT AS n FROM rr),
       |ova AS (SELECT count(*)::BIGINT AS n_adc
       |        FROM ivfpq JOIN ex USING (vec_id)),
       |ovr AS (SELECT count(*)::BIGINT AS n_rr
       |        FROM rtop JOIN ex USING (vec_id))
       |SELECT $PqTopK AS k, $IvfNProbe AS n_probe, nc.n_candidates,
       |  nrr.n AS n_rerank,
       |  round(ova.n_adc / $PqTopK.0, 4) AS recall_adc,
       |  round(ovr.n_rr / $PqTopK.0, 4) AS recall_rerank,
       |  round(nrr.n / (ntot.n * 1.0), 6) AS raw_frac
       |FROM nc, nrr, ova, ovr, ntot""".stripMargin
  }

  /** The raw-stored IVF-PQ serving index, built once per (session, dir)
    * — the [[QueriesLlm.hybridIndexOf]] persisted-artifact discipline
    * for the vector side: codes for ADC plus the stored raw vectors the
    * exact re-rank reads, so a dense serving arm never touches the
    * embeddings table.
    */
  private val ivfRawMemo = ModelMemo.perSession[String]
  private[graft] def ivfRawIndexOf(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfRawMemo.getOrFit(s, dir) {
      val out = TempDirs.create("graft_ivfpq_raw")
      graft.llm.IvfPq.write(Tables.embeddings(s, dir), col("vec_id"),
        col("embedding"), QueriesPipeline.kmeansCentsOf(s, dir),
        pqCentsOf(s, dir), out, storeRaw = true)
      out
    }

  /** q_hybrid_indexed — hybrid retrieval with BOTH arms index-served
    * ([[graft.llm.Fusion.rrfFromIndexes]], VERDICT r10 item 1): the
    * lexical arm reads the memoized inverted index (bucket-pruned
    * postings), the dense arm reads the memoized RAW-STORED IVF-PQ
    * index — ADC top-$IvfRerankR over the probed code bytes, exact
    * squared-L2 re-rank of the R stored vectors
    * ([[graft.llm.IvfPq.serveRerankedFromIndex]]) — and RRF fuses the
    * two ≤20-row rank lists. A request scans NO corpus table (PlanAudit
    * + IvfPqSpec pin the probed-partition read); the dense ranking is
    * the ANN ranking, so q_hybrid_rrf (exact-cosine arm) stays the
    * recall gate. The oracle replays probe selection, ADC, and the
    * exact re-rank in SQL (the q_ivfpq_rerank discipline) next to the
    * shared BM25 SQL and fuses the replayed ranks.
    */
  val qHybridIndexed: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    graft.llm.Fusion.rrfFromIndexes(s, QueriesLlm.hybridIndexOf(s, dir),
        ivfRawIndexOf(s, dir), PostingsTerms, anchorV,
        QueriesPipeline.kmeansCentsOf(s, dir), pqCentsOf(s, dir),
        nProbe = IvfNProbe, rerankR = IvfRerankR, topK = 20)
      .select(col("id").as("doc_id"),
        round(col("rrf_score"), 6).as("rrf_score"), col("n_lists"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
  }

  /** The shared CTE prefix of every fully-indexed-hybrid oracle:
    * coarse-Lloyd centroids, assignments, and the per-subspace PQ
    * codebooks/codes — anchor-independent, so batch members share it.
    */
  private def hybridIndexedSharedCtes: String =
    s"""${QueriesPipeline.kmeansCtes},
       |asg AS (SELECT vec_id, cid FROM af WHERE rn = 1),
       |pqemb AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |${pqCtesBody("pqemb")}""".stripMargin

  /** One hybrid-indexed request's CTE block, suffixed `_$m`: per-anchor
    * ADC tables, probe selection, candidate ADC ranking, top-R exact
    * re-rank (the dense rank list), the shared BM25 SQL (the lexical
    * rank list), and their RRF fusion as `hy_$m` — shared verbatim by
    * the single-request and batched oracles, because batching must
    * change the cost of a request, never its answer.
    */
  private def hybridIndexedMemberCtes(m: String, termSeq: Seq[String],
      anchor: Long): String = {
    val cf = s"c${QueriesPipeline.KmeansIters}"
    val sub = 64 / PqM
    def qdist(sCol: String, cTab: String): String =
      s"round(list_sum(list_transform(range(1, $sub + 1), " +
        s"i -> ($sCol[i] - $cTab.c[i]) * ($sCol[i] - $cTab.c[i]))), 6)"
    val qds = (0 until PqM).map { j =>
      s"""qd_${m}_$j AS (
         |  SELECT cid, ${qdist("qs", s"c${j}_$PqIters")} AS d
         |  FROM c${j}_$PqIters CROSS JOIN
         |    (SELECT s AS qs FROM e$j WHERE vec_id = $anchor))""".stripMargin
    }.mkString(",\n")
    val qdJoins = (0 until PqM)
      .map(j => s"JOIN qd_${m}_$j ON qd_${m}_$j.cid = code$j.cid").mkString(" ")
    val adcExpr = (0 until PqM).map(j => s"qd_${m}_$j.d").mkString(" + ")
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN code$j USING (vec_id)").mkString(" ")
    s"""$qds,
       |qv_$m AS (SELECT list_transform(e, x -> x::DOUBLE) AS q
       |       FROM emb WHERE vec_id = $anchor),
       |cd_$m AS (SELECT cid, round(list_sum(list_transform(range(1, 65),
       |    i -> (qv_$m.q[i] - c.c[i]) * (qv_$m.q[i] - c.c[i]))), 6) AS d
       |  FROM $cf c CROSS JOIN qv_$m),
       |probes_$m AS (SELECT cid FROM cd_$m ORDER BY d, cid LIMIT $IvfNProbe),
       |cand_$m AS (SELECT a.vec_id FROM asg a JOIN probes_$m p ON a.cid = p.cid),
       |adcc_$m AS (
       |  SELECT code0.vec_id, round($adcExpr, 6) AS adc
       |  FROM code0 $codeJoins $qdJoins
       |  JOIN cand_$m ON cand_$m.vec_id = code0.vec_id),
       |rr_$m AS (SELECT vec_id FROM adcc_$m ORDER BY adc, vec_id LIMIT $IvfRerankR),
       |rex_$m AS (SELECT emb.vec_id, round(list_sum(list_transform(range(1, 65),
       |      i -> (emb.e[i]::DOUBLE - qv_$m.q[i]) * (emb.e[i]::DOUBLE - qv_$m.q[i]))), 6) AS d
       |    FROM emb JOIN rr_$m USING (vec_id) CROSS JOIN qv_$m),
       |denser_$m AS (
       |  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY d, vec_id) AS r
       |  FROM rex_$m QUALIFY r <= 20),
       |bm_$m AS (SELECT doc_id, score FROM (
       |${QueriesCurate.bm25OracleSql(termSeq, 20)}
       |) AS bmsub_$m),
       |bmr_$m AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm_$m),
       |u_$m AS (
       |  SELECT doc_id, 1.0::DOUBLE / (60 + r) AS contrib FROM bmr_$m
       |  UNION ALL
       |  SELECT doc_id, 1.0::DOUBLE / (60 + r) AS contrib FROM denser_$m),
       |hy_$m AS (SELECT doc_id, round(sum(contrib), 6) AS rrf_score,
       |  count(*) AS n_lists FROM u_$m GROUP BY doc_id)""".stripMargin
  }

  // lazy: references PostingsTerms, declared later in this object
  lazy val qHybridIndexedSql: String =
    s"""WITH $hybridIndexedSharedCtes,
       |${hybridIndexedMemberCtes("one", PostingsTerms, PqAnchor)}
       |SELECT doc_id, rrf_score, n_lists FROM hy_one
       |ORDER BY rrf_score DESC, doc_id""".stripMargin

  /** q_hybrid_indexed_batch — the BATCHED fully-index-served hybrid
    * endpoint, the production shape for concurrent fused requests: the
    * lexical arm scores the whole batch in ONE bucket-pruned scan
    * ([[graft.llm.InvertedIndex.bm25TopKBatch]]), the dense arm in ONE
    * union-probe ADC scan + ONE stored-vector re-rank pass
    * ([[graft.llm.IvfPq.serveRerankedBatch]] over the raw-stored
    * index), and per-request RRF fuses the bounded rank lists — zero
    * corpus tables end to end. Per request the answer is EXACTLY
    * q_hybrid_indexed's for the same (terms, anchor): the oracle unions
    * the single-request member CTEs per batch member, so "batching
    * never changes an answer" is driver-hash-checked; IvfPqSpec pins
    * serveRerankedBatch ≡ serveRerankedFromIndex row-for-row.
    */
  lazy val HybridIdxBatch: Seq[(String, Seq[String], Long)] = Seq(
    ("qa", PostingsTerms, 0L), ("qb", IncrTerms, 7L),
    ("qc", UpsertTerms, 42L))

  val qHybridIndexedBatch: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    val ids = HybridIdxBatch.map(_._3)
    val anchors: Map[Long, Array[Double]] =
      ids.map(i => i -> Anchors.vecD(s, dir, i)).toMap
    val queriesDf = HybridIdxBatch.map { case (q, t, _) => (q, t) }
      .toDF("qid", "terms")
    val lex = graft.llm.InvertedIndex.bm25TopKBatch(s,
        QueriesLlm.hybridIndexOf(s, dir), queriesDf, col("qid"),
        col("terms"), topK = 20)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("id"))))
      .select("qid", "id", "rank")
    val dense = graft.llm.IvfPq.serveRerankedBatch(s, ivfRawIndexOf(s, dir),
        QueriesPipeline.kmeansCentsOf(s, dir), pqCentsOf(s, dir),
        HybridIdxBatch.map { case (q, _, a) => (q, anchors(a)) },
        nProbe = IvfNProbe, rerankR = IvfRerankR, topK = 20)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2"), col("id"))))
      .select("qid", "id", "rank")
    lex.unionByName(dense)
      .select(col("qid"), col("id"),
        (lit(1.0) / (lit(60.0) + col("rank").cast("double"))).as("contrib"))
      .groupBy("qid", "id")
      .agg(round(sum("contrib"), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .select(col("qid"), col("id").as("doc_id"), col("rrf_score"),
        col("n_lists"))
      .orderBy(col("qid"), col("rrf_score").desc, col("doc_id"))
  }

  lazy val qHybridIndexedBatchSql: String = {
    val members = HybridIdxBatch.map { case (m, terms, anchor) =>
      hybridIndexedMemberCtes(m, terms, anchor)
    }.mkString(",\n")
    val union = HybridIdxBatch.map { case (m, _, _) =>
      s"SELECT '$m' AS qid, doc_id, rrf_score, n_lists FROM hy_$m"
    }.mkString("\nUNION ALL\n")
    s"""WITH $hybridIndexedSharedCtes,
       |$members
       |$union
       |ORDER BY qid, rrf_score DESC, doc_id""".stripMargin
  }

  /** q_ivfpq_incr — incremental maintenance of the IVF-PQ layout
    * (VERDICT r8 item 1): the corpus is split into a base snapshot
    * (90%) and a delta (vec_id ≡ 0 mod 10, a change feed's adds); the
    * base is indexed with [[graft.llm.IvfPq.write]], the delta merged
    * with [[graft.llm.IvfPq.append]] — which encodes ONLY the delta
    * against the same FROZEN models (the memoized centroids/codebooks,
    * trained once on the full corpus exactly as a persisted model
    * artifact would be) and appends into the same cluster directories.
    * The oracle is the REBUILT form verbatim (q_ivfpq_recall's SQL over
    * the full corpus): per-row encoding is deterministic and serving is
    * a set computation over stored rows, so append ≡ rebuild is an
    * equality the driver hash-checks, not a spec-side claim.
    */
  val qIvfPqIncr: Q = (s, dir) => {
    import graft.llm.IvfPq
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    val out = TempDirs.create("graft_ivfpq_incr")
    IvfPq.write(emb.where(pmod(col("vec_id"), lit(10)) =!= 0),
      col("vec_id"), col("embedding"), cents, pqCents, out)
    IvfPq.append(emb.where(pmod(col("vec_id"), lit(10)) === 0),
      col("vec_id"), col("embedding"), cents, pqCents, out)
    ivfPqServeReport(s, emb, out, cents, pqCents, anchorV)
  }

  // append ≡ rebuild: the oracle IS the full-rebuild serving report
  val qIvfPqIncrSql: String = qIvfPqRecallSql

  /** q_ivfpq_delete — the delete/compact half of vector-index
    * maintenance (VERDICT r10 item 5, the q_index_delete twin): build
    * over the full corpus, tombstone vec_id ≡ 0 mod 10
    * ([[graft.llm.IvfPq.delete]] — O(|delete|), serving excludes them
    * immediately), [[graft.llm.IvfPq.compact]] to make the removal
    * physical, then the standard serving report. The oracle is the
    * REBUILT form over the survivors (same frozen full-corpus models,
    * the engine's own discipline), so delete+compact ≡
    * rebuild-on-survivors is driver-hash-checked; the pre-compact
    * tombstone semantics are spec-pinned in IvfPqSpec. Note the anchor
    * itself is among the deleted ids: a client-supplied query vector
    * needs no corpus row, and the exact side excludes it too.
    */
  val qIvfPqDelete: Q = (s, dir) => {
    import graft.llm.IvfPq
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    val out = TempDirs.create("graft_ivfpq_del")
    IvfPq.write(emb, col("vec_id"), col("embedding"), cents, pqCents, out)
    IvfPq.delete(s, out,
      emb.where(pmod(col("vec_id"), lit(10)) === 0).select("vec_id"),
      col("vec_id"))
    IvfPq.compact(s, out)
    ivfPqServeReport(s, emb.where(pmod(col("vec_id"), lit(10)) =!= 0),
      out, cents, pqCents, anchorV)
  }

  val qIvfPqDeleteSql: String = ivfPqRecallReportSql("vec_id % 10 <> 0")

  /** q_ivfpq_merge — segment merging for the vector index
    * ([[graft.llm.IvfPq.merge]], the q_index_merge twin): two disjoint
    * half-corpus indexes encoded against the SAME frozen models (one
    * carrying a pending tombstone wave) merge into one serving index —
    * index-sized union of live code rows, no re-encode, generations
    * reset. The oracle is the rebuilt serving report over the union
    * minus the tombstoned ids (odd ids ≡ 5 mod 9 — the even ones live
    * in half A and were never tombstoned there), so merge ≡ rebuild,
    * deletes applied, is driver-hash-checked.
    */
  val qIvfPqMerge: Q = (s, dir) => {
    import graft.llm.IvfPq
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    val a = TempDirs.create("graft_ivfpq_mrg_a")
    val b = TempDirs.create("graft_ivfpq_mrg_b")
    val dst = TempDirs.create("graft_ivfpq_mrg")
    IvfPq.write(emb.where(pmod(col("vec_id"), lit(2)) === 0),
      col("vec_id"), col("embedding"), cents, pqCents, a)
    IvfPq.write(emb.where(pmod(col("vec_id"), lit(2)) === 1),
      col("vec_id"), col("embedding"), cents, pqCents, b)
    IvfPq.delete(s, b,
      emb.where(pmod(col("vec_id"), lit(9)) === 5).select("vec_id"),
      col("vec_id"))
    IvfPq.merge(s, Seq(a, b), dst)
    ivfPqServeReport(s,
      emb.where(!(pmod(col("vec_id"), lit(9)) === 5 &&
        pmod(col("vec_id"), lit(2)) === 1)),
      dst, cents, pqCents, anchorV)
  }

  val qIvfPqMergeSql: String =
    ivfPqRecallReportSql("NOT (vec_id % 9 = 5 AND vec_id % 2 = 1)")

  /** q_ivfpq_batch — batched ANN serving over the persisted IVF-PQ
    * index ([[graft.llm.IvfPq.serveBatch]]): three client query vectors
    * answered by ONE scan of the union of their probed cluster
    * partitions — each stored code row fans out only to the queries
    * probing its cluster (batch-sized broadcast of per-query ADC
    * tables), same 6-dp ADC arithmetic, top-20 per query via a
    * qid-partitioned rank window. The oracle replicates the
    * q_ivfpq_recall coarse-probe + ADC CTEs once per anchor and UNION
    * ALLs the per-query top-20 — so batch ≡ singles is
    * driver-hash-checked; IvfPqSpec pins batch ≡ [[graft.llm.IvfPq
    * .serve]] row-for-row.
    */
  val BatchAnchors = Seq("qa" -> 0L, "qb" -> 7L, "qc" -> 42L)

  val qIvfPqBatch: Q = (s, dir) => {
    import graft.llm.IvfPq
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    val anchors = BatchAnchors.map { case (qid, vid) =>
      qid -> Anchors.vecD(s, dir, vid)
    }
    val out = TempDirs.create("graft_ivfpq_batch")
    IvfPq.write(emb, col("vec_id"), col("embedding"), cents, pqCents, out)
    IvfPq.serveBatch(s, out, cents, pqCents, anchors,
      nProbe = IvfNProbe, topK = PqTopK)
      .orderBy(col("qid"), col("adc"), col("id"))
  }

  val qIvfPqBatchSql: String = {
    val cf = s"c${QueriesPipeline.KmeansIters}"
    val sub = 64 / PqM
    def qdist(sCol: String, cTab: String): String =
      s"round(list_sum(list_transform(range(1, $sub + 1), " +
        s"i -> ($sCol[i] - $cTab.c[i]) * ($sCol[i] - $cTab.c[i]))), 6)"
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN code$j USING (vec_id)").mkString(" ")
    val perAnchor = BatchAnchors.map { case (qid, vid) =>
      val qds = (0 until PqM).map { j =>
        s"""qd_${qid}_$j AS (
           |  SELECT cid, ${qdist("qs", s"c${j}_$PqIters")} AS d
           |  FROM c${j}_$PqIters CROSS JOIN
           |    (SELECT s AS qs FROM e$j WHERE vec_id = $vid))""".stripMargin
      }.mkString(",\n")
      val qdJoins = (0 until PqM)
        .map(j => s"JOIN qd_${qid}_$j ON qd_${qid}_$j.cid = code$j.cid")
        .mkString(" ")
      val adcExpr = (0 until PqM).map(j => s"qd_${qid}_$j.d").mkString(" + ")
      s"""$qds,
         |qv_$qid AS (SELECT list_transform(e, x -> x::DOUBLE) AS q
         |       FROM emb WHERE vec_id = $vid),
         |cd_$qid AS (SELECT cid, round(list_sum(list_transform(range(1, 65),
         |    i -> (qv_$qid.q[i] - c.c[i]) * (qv_$qid.q[i] - c.c[i]))), 6) AS d
         |  FROM $cf c CROSS JOIN qv_$qid),
         |probes_$qid AS (SELECT cid FROM cd_$qid ORDER BY d, cid LIMIT $IvfNProbe),
         |cand_$qid AS (SELECT a.vec_id FROM asg a JOIN probes_$qid p ON a.cid = p.cid),
         |top_$qid AS (
         |  SELECT vec_id, adc FROM (
         |    SELECT code0.vec_id, round($adcExpr, 6) AS adc
         |    FROM code0 $codeJoins $qdJoins
         |    JOIN cand_$qid ON cand_$qid.vec_id = code0.vec_id)
         |  ORDER BY adc, vec_id LIMIT $PqTopK)""".stripMargin
    }.mkString(",\n")
    val union = BatchAnchors.map { case (qid, _) =>
      s"SELECT '$qid' AS qid, vec_id AS id, adc FROM top_$qid"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${QueriesPipeline.kmeansCtes},
       |asg AS (SELECT vec_id, cid FROM af WHERE rn = 1),
       |pqemb AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |${pqCtesBody("pqemb")},
       |$perAnchor
       |$union
       |ORDER BY qid, adc, id""".stripMargin
  }

  /** q_postings_topk — the persisted inverted-index serving path
    * ([[graft.llm.InvertedIndex]], the text-retrieval counterpart of
    * q_ivfpq_recall's vector layout): postings written `bucket=…`
    * partitioned by `pmod(xxhash64(term), 16)`, then a 3-term BM25
    * top-20 served reading ONLY those terms' buckets (`bucket IN (…)` →
    * PartitionFilters; the bucket ids come from a |terms|-row Spark job
    * through the writer's own hash column, so reader and writer cannot
    * drift). The oracle is the SAME parametrized BM25 SQL q_bm25 uses —
    * the layout must change the cost of a query, never its answer.
    * InvertedIndexSpec pins serve ≡ direct [[graft.llm.Bm25.topDocs]]
    * and the bucket-pruned file footprint.
    */
  val PostingsTerms = Seq("scan", "filter", "vector")
  val PostingsBuckets = 16

  val qPostingsTopk: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val out = TempDirs.create("graft_postings")
    InvertedIndex.write(Tables.documents(s, dir), col("doc_id"),
      col("text"), out, nBuckets = PostingsBuckets)
    InvertedIndex.bm25TopK(s, out, PostingsTerms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val qPostingsTopkSql: String =
    QueriesCurate.bm25OracleSql(PostingsTerms, 20)

  /** q_postings_filtered — access-controlled lexical retrieval
    * ([[graft.llm.InvertedIndex.bm25TopKFiltered]]): top-20 BM25 among
    * only the `lang = 'de'` documents, served from the memoized
    * persisted index (the [[QueriesLlm.hybridIndexOf]] artifact — a
    * serve, not a build). Corpus-level stats and df stay those of the
    * WHOLE index (Lucene filtered-query semantics: a doc's score is a
    * property of the corpus, not of who may read it), so the oracle
    * computes the unfiltered scores once and only narrows candidacy.
    * The allowed set rides a semi-join that AQE broadcasts; at 100 TB
    * the filter relation is a pruned dimension scan, never a second
    * corpus pass.
    */
  val qPostingsFiltered: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val allowed = Tables.documents(s, dir).where(col("lang") === "de")
    InvertedIndex.bm25TopKFiltered(s, QueriesLlm.hybridIndexOf(s, dir),
        PostingsTerms, allowed, col("doc_id"), topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val qPostingsFilteredSql: String = QueriesCurate.bm25OracleSql(
    PostingsTerms, 20,
    candFilter = "doc_id IN (SELECT doc_id FROM documents WHERE lang = 'de')")

  /** q_postings_filt_batch — BATCHED access-controlled lexical serving
    * ([[graft.llm.InvertedIndex.bm25TopKFilteredBatch]]): many queries,
    * one allowed-id snapshot (the multi-tenant search endpoint) — ONE
    * probed scan scores the whole batch with the filter semi-joined
    * before the per-doc aggregation, corpus stats and df untouched
    * (Lucene filtered-query semantics). The oracle unions the
    * single-request filtered oracle per member, so batch ≡ single is
    * driver-hash-checked like every other batch verb.
    */
  lazy val PostFiltBatch: Seq[(String, Seq[String])] =
    Seq(("qa", PostingsTerms), ("qb", IncrTerms))

  val qPostingsFilteredBatch: Q = (s, dir) => {
    import s.implicits._
    val allowed = Tables.documents(s, dir).where(col("lang") === "de")
    val queriesDf = PostFiltBatch.toDF("qid", "terms")
    graft.llm.InvertedIndex.bm25TopKFilteredBatch(s,
        QueriesLlm.hybridIndexOf(s, dir), queriesDf, col("qid"),
        col("terms"), allowed, col("doc_id"), topK = 20)
      .select(col("qid"), col("id").as("doc_id"), col("score"))
      .orderBy(col("qid"), col("score").desc, col("doc_id"))
  }

  lazy val qPostingsFilteredBatchSql: String = PostFiltBatch.map { case (m, ts) =>
    s"""SELECT '$m' AS qid, doc_id, score FROM (
       |${QueriesCurate.bm25OracleSql(ts, 20,
          candFilter = "doc_id IN (SELECT doc_id FROM documents WHERE lang = 'de')")}
       |) AS member_$m""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY qid, score DESC, doc_id")

  /** q_bm25_auto — the per-query serve-strategy pick
    * ([[graft.llm.InvertedIndex.bm25TopKAuto]], Lucene's early-
    * termination flip made automatic): the sidecar's cached term stats
    * decide plain-vs-MaxScore per request at zero Spark-job cost, and
    * because BOTH branches are exact the oracle is the plain BM25 SQL —
    * the driver hash-checks that strategy choice can never change an
    * answer (the cost side is SCALING.md's LONGPOST crossover table).
    */
  val qBm25Auto: Q = (s, dir) =>
    graft.llm.InvertedIndex.bm25TopKAuto(s, QueriesLlm.hybridIndexOf(s, dir),
        PostingsTerms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))

  val qBm25AutoSql: String = QueriesCurate.bm25OracleSql(PostingsTerms, 20)

  /** q_postings_and — conjunctive (all-MUST) lexical retrieval
    * ([[graft.llm.InvertedIndex.bm25TopKAnd]]): top-20 BM25 among
    * documents containing EVERY query term, served from the same
    * memoized index. Scores equal the OR-mode scores for the surviving
    * docs (the oracle scores once and filters on the per-doc distinct
    * term count), pinning that conjunction narrows candidacy without
    * touching the scoring arithmetic.
    */
  val qPostingsAnd: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    InvertedIndex.bm25TopKAnd(s, QueriesLlm.hybridIndexOf(s, dir),
        PostingsTerms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val qPostingsAndSql: String =
    QueriesCurate.bm25OracleSql(PostingsTerms, 20, allMust = true)

  /** The POSITIONAL serving index, built once per (session, dir) — the
    * persisted-artifact discipline of [[QueriesLlm.hybridIndexOf]], for
    * the serves that need stored term offsets (snippets; phrase search
    * keeps its own build-tagged query).
    */
  private val posIndexMemo = graft.ModelMemo.perSession[String]
  private[graft] def posIndexOf(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    posIndexMemo.getOrFit(s, dir) {
      val out = TempDirs.create("graft_pos_idx")
      graft.llm.InvertedIndex.write(Tables.documents(s, dir), col("doc_id"),
        col("text"), out, nBuckets = PostingsBuckets, positions = true,
        storedFields = true)
      out
    }

  /** q_snippets — the search tier's FETCH phase, served entirely from
    * index-owned storage ([[graft.llm.InvertedIndex.snippetTopKStored]],
    * VERDICT r10 item 2): BM25 top-20 with, per hit, the evidence
    * window covering the first occurrence of every present query term
    * (earliest→latest first-occurrence, truncated to lo+20 tokens,
    * padded 3 each side) from the positional index's STORED offsets,
    * and the snippet text from the `_docs` stored-fields sidecar
    * written at index time — the request touches NO documents table:
    * the ≤20 hit ids route driver-side to their `dbucket` directories
    * and the fetch is partition-pruned point lookups (Lucene's
    * stored-fields shape). Window arithmetic is integer over stored
    * positions; stored tokens are the shared tokenizer's output
    * persisted at build, so the text hash-checks cross-engine.
    */
  val SnippetPad = 3
  val SnippetMaxSpan = 20
  val qSnippets: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    InvertedIndex.snippetTopKStored(s, posIndexOf(s, dir),
        PostingsTerms, topK = 20, pad = SnippetPad, maxSpan = SnippetMaxSpan)
      .select(col("id").as("doc_id"), col("score"),
        col("lo").cast("bigint").as("lo"), col("hi").cast("bigint").as("hi"),
        col("snippet"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** The snippet oracle's core (no ORDER BY): BM25 top-k + the evidence
    * window + the token-slice text, replayed in SQL for one term set —
    * shared by q_snippets and, per batch member, q_snippets_batch (the
    * hybridIndexedMemberCtes discipline: batching never changes an
    * answer, so the batch oracle IS the single oracle unioned).
    */
  private def snippetOracleCore(terms: Seq[String]): String = {
    // first occurrence (0-based) of each query term, absent → NULL so
    // least/greatest skip it — DuckDB list_position returns 0 when absent
    val fps = terms.map(t => s"nullif(list_position(t.t, '$t'), 0) - 1")
    val lo0 = fps.mkString("least(", ", ", ")")
    val hi0 = fps.mkString("greatest(", ", ", ")")
    s"""WITH bm AS (
       |  SELECT doc_id, score FROM (
       |${QueriesCurate.bm25OracleSql(terms, 20)}
       |  ) AS ranked),
       |toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |                          x -> len(x) > 0) END AS t
       |  FROM documents),
       |w AS (
       |  SELECT b.doc_id, b.score, t.t, $lo0 AS lo0, $hi0 AS hi0
       |  FROM bm b JOIN toks t USING (doc_id))
       |SELECT doc_id, score,
       |  greatest(0, lo0 - $SnippetPad)::BIGINT AS lo,
       |  (least(hi0, lo0 + $SnippetMaxSpan) + $SnippetPad)::BIGINT AS hi,
       |  array_to_string(
       |    t[greatest(0, lo0 - $SnippetPad) + 1 :
       |      least(hi0, lo0 + $SnippetMaxSpan) + $SnippetPad + 1], ' ') AS snippet
       |FROM w""".stripMargin
  }

  val qSnippetsSql: String =
    s"""${snippetOracleCore(PostingsTerms)}
       |ORDER BY score DESC, doc_id""".stripMargin

  /** q_snippets_batch — the BATCHED fetch endpoint
    * ([[graft.llm.InvertedIndex.snippetTopKStoredBatch]]), completing
    * the serving verbs' batch symmetry: ONE probed scan scores the
    * whole batch, ONE positions pass windows every (query, hit) pair
    * scoped to its own query's terms, ONE bucket-pruned stored-fields
    * lookup fetches the union of hit docs — zero corpus tables, and
    * per member the rows are EXACTLY q_snippets-shaped for that term
    * set (the oracle unions the single-request core per member).
    */
  lazy val SnippetBatch: Seq[(String, Seq[String])] = Seq(
    ("qa", PostingsTerms), ("qb", IncrTerms), ("qc", UpsertTerms))

  val qSnippetsBatch: Q = (s, dir) => {
    import s.implicits._
    val queriesDf = SnippetBatch.toDF("qid", "terms")
    graft.llm.InvertedIndex.snippetTopKStoredBatch(s, posIndexOf(s, dir),
        queriesDf, col("qid"), col("terms"), topK = 20,
        pad = SnippetPad, maxSpan = SnippetMaxSpan)
      .select(col("qid"), col("id").as("doc_id"), col("score"),
        col("lo").cast("bigint").as("lo"), col("hi").cast("bigint").as("hi"),
        col("snippet"))
      .orderBy(col("qid"), col("score").desc, col("doc_id"))
  }

  lazy val qSnippetsBatchSql: String = SnippetBatch.map { case (m, ts) =>
    s"""SELECT '$m' AS qid, doc_id, score, lo, hi, snippet FROM (
       |${snippetOracleCore(ts)}
       |) AS member_$m""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY qid, score DESC, doc_id")

  /** q_index_incr — incremental maintenance of the inverted index
    * (VERDICT r8 item 1): a base snapshot (90% of the corpus) is
    * indexed with [[graft.llm.InvertedIndex.write]], then a delta
    * (doc_id ≡ 0 mod 10 — a change feed's adds) merges in via
    * [[graft.llm.InvertedIndex.append]], which scans ONLY the delta
    * and advances the sidecar stats by exact integer-double arithmetic
    * (the (n_docs, sum_dl) discipline: sums of integer-valued doubles
    * are exact, so base + delta equals the rebuilt sum bit-for-bit).
    * The oracle is the REBUILT form verbatim — the same full-corpus
    * BM25 SQL the direct queries use — so serve-after-append ≡
    * serve-after-rebuild is driver-hash-checked, not a spec-side
    * claim.
    */
  val IncrTerms = Seq("window", "scan", "merge")

  val qIndexIncr: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val docs = Tables.documents(s, dir)
    val out = TempDirs.create("graft_postings_incr")
    InvertedIndex.write(docs.where(pmod(col("doc_id"), lit(10)) =!= 0),
      col("doc_id"), col("text"), out, nBuckets = PostingsBuckets)
    InvertedIndex.append(docs.where(pmod(col("doc_id"), lit(10)) === 0),
      col("doc_id"), col("text"), out)
    InvertedIndex.bm25TopK(s, out, IncrTerms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  // append ≡ rebuild: the oracle is the full-corpus BM25, unchanged
  val qIndexIncrSql: String = QueriesCurate.bm25OracleSql(IncrTerms, 20)

  /** q_index_delete — the delete/compact half of index maintenance
    * (Lucene-style: [[graft.llm.InvertedIndex.delete]] tombstones ids in
    * O(|delete|) and serving excludes them immediately;
    * [[graft.llm.InvertedIndex.compact]] rewrites the index without them
    * — one index-sized pass, one file per bucket — and restores exact
    * survivor stats). The query builds over the full corpus, deletes
    * doc_id ≡ 0 mod 10, compacts, and serves; the oracle is a fresh
    * build over the SURVIVORS (the same BM25 SQL restricted to
    * `doc_id % 10 <> 0`), so delete+compact ≡ rebuild-on-survivors is
    * driver-hash-checked. The pre-compact (tombstones-active) serving
    * semantics are spec-pinned in InvertedIndexSpec.
    */
  val qIndexDelete: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val docs = Tables.documents(s, dir)
    val out = TempDirs.create("graft_postings_del")
    InvertedIndex.write(docs, col("doc_id"), col("text"), out,
      nBuckets = PostingsBuckets)
    InvertedIndex.delete(s, out,
      docs.where(pmod(col("doc_id"), lit(10)) === 0).select("doc_id"),
      col("doc_id"))
    InvertedIndex.compact(s, out)
    InvertedIndex.bm25TopK(s, out, IncrTerms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val qIndexDeleteSql: String =
    QueriesCurate.bm25OracleSql(IncrTerms, 20, docFilter = "doc_id % 10 <> 0")

  /** q_index_upsert — the full CRUD story on a live index
    * ([[graft.llm.InvertedIndex.applyChangeFeed]]): a change feed
    * rewrites every doc_id ≡ 0 mod 10 (text + " updated") and deletes
    * every doc_id ≡ 3 mod 7, applied as two delta-sized steps — touched
    * ids tombstone at generation g, upserted versions re-append at
    * g+1, alive past their own tombstone by the sequence-number
    * ordering (no rebuild anywhere). After [[graft.llm.InvertedIndex
    * .compact]] the index must equal a fresh build over the post-merge
    * corpus, which is exactly what the oracle computes in SQL
    * (docFilter drops the deletes, textExpr applies the rewrite). The
    * query terms include "updated" so the upserted versions' new token
    * must surface for the hash to match.
    */
  val UpsertTerms = Seq("updated", "scan", "merge")

  val qIndexUpsert: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val docs = Tables.documents(s, dir)
    val out = TempDirs.create("graft_postings_ups")
    InvertedIndex.write(docs, col("doc_id"), col("text"), out,
      nBuckets = PostingsBuckets)
    // well-formed feed: one op per id (deletes win the overlap)
    val upserts = docs
      .where(pmod(col("doc_id"), lit(10)) === 0 &&
        pmod(col("doc_id"), lit(7)) =!= 3)
      .select(col("doc_id"), concat(col("text"), lit(" updated")).as("text"),
        lit("upsert").as("op"))
    val deletes = docs.where(pmod(col("doc_id"), lit(7)) === 3)
      .select(col("doc_id"), lit("").as("text"), lit("delete").as("op"))
    InvertedIndex.applyChangeFeed(upserts.unionByName(deletes),
      col("doc_id"), col("text"), col("op"), out)
    InvertedIndex.compact(s, out)
    InvertedIndex.bm25TopK(s, out, UpsertTerms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val qIndexUpsertSql: String = QueriesCurate.bm25OracleSql(
    UpsertTerms, 20,
    docFilter = "doc_id % 7 <> 3",
    textExpr = "CASE WHEN doc_id % 10 = 0 THEN text || ' updated' ELSE text END")

  /** q_index_asof — time travel over the generation-stamped index
    * ([[graft.llm.InvertedIndex.bm25TopK]]'s `asOfGen`): the SAME
    * change feed as q_index_upsert runs against a fresh index, but the
    * serve asks for generation 0 — the pre-feed state. Rows written
    * later and tombstones placed later don't exist at that generation,
    * and the corpus scalars come from the sidecar's generation LOG, so
    * the answer must equal a serve over the ORIGINAL corpus — which is
    * exactly what the oracle computes (the unmodified-corpus BM25 SQL,
    * no docFilter, no textExpr). The query terms include "updated": the
    * upserted versions' new token must be INVISIBLE as of gen 0 even
    * though it is currently in the index files. No compact before the
    * serve — history reaches back to the last compact, and compaction
    * spends it (spec-pinned).
    */
  val qIndexAsof: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val docs = Tables.documents(s, dir)
    val out = TempDirs.create("graft_postings_asof")
    InvertedIndex.write(docs, col("doc_id"), col("text"), out,
      nBuckets = PostingsBuckets)
    val upserts = docs
      .where(pmod(col("doc_id"), lit(10)) === 0 &&
        pmod(col("doc_id"), lit(7)) =!= 3)
      .select(col("doc_id"), concat(col("text"), lit(" updated")).as("text"),
        lit("upsert").as("op"))
    val deletes = docs.where(pmod(col("doc_id"), lit(7)) === 3)
      .select(col("doc_id"), lit("").as("text"), lit("delete").as("op"))
    InvertedIndex.applyChangeFeed(upserts.unionByName(deletes),
      col("doc_id"), col("text"), col("op"), out)
    InvertedIndex.bm25TopK(s, out, UpsertTerms, topK = 20,
      asOfGen = Some(0L))
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  // as-of gen 0 ≡ the unmodified corpus, feed notwithstanding
  val qIndexAsofSql: String = QueriesCurate.bm25OracleSql(UpsertTerms, 20)

  /** q_postings_batch — batched retrieval serving
    * ([[graft.llm.InvertedIndex.bm25TopKBatch]]): three queries scored
    * in ONE probed scan of the persisted index (union of the batch's
    * term buckets read once, df computed once per distinct term, a
    * batch-sized broadcast fanning postings out to interested queries,
    * top-20 per qid via a qid-partitioned rank window). Per query the
    * scores are exactly [[graft.llm.InvertedIndex.bm25TopK]]'s — the
    * oracle is a UNION ALL of the three single-query BM25 statements,
    * so batch ≡ singles is driver-hash-checked; the batch-size-constant
    * scan count and bucket pruning are spec-pinned in InvertedIndexSpec.
    */
  val BatchQueries: Seq[(String, Seq[String])] = Seq(
    "q_filter" -> PostingsTerms,
    "q_merge" -> IncrTerms,
    "q_update" -> UpsertTerms)

  val qPostingsBatch: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    import s.implicits._
    val out = TempDirs.create("graft_postings_batch")
    InvertedIndex.write(Tables.documents(s, dir), col("doc_id"),
      col("text"), out, nBuckets = PostingsBuckets)
    val queries = BatchQueries.toDF("qid", "terms")
    InvertedIndex.bm25TopKBatch(s, out, queries, col("qid"), col("terms"),
      topK = 20)
      .select(col("qid"), col("id").as("doc_id"), col("score"))
      .orderBy(col("qid"), col("score").desc, col("doc_id"))
  }

  val qPostingsBatchSql: String = BatchQueries.map { case (qid, terms) =>
    s"SELECT '$qid' AS qid, doc_id, score FROM (\n${QueriesCurate.bm25OracleSql(terms, 20)}\n) AS sub_$qid"
  }.mkString("", "\nUNION ALL\n", "\nORDER BY qid, score DESC, doc_id")

  /** q_phrase_search — exact-phrase retrieval over a POSITIONAL index
    * ([[graft.llm.InvertedIndex.phraseTopK]]): postings carry each
    * term's sorted occurrence offsets, and a phrase match is a start
    * position every slot votes for (one bucket-pruned scan, candidate
    * starts shuffled as ints — Lucene PhraseQuery semantics, overlaps
    * counted). Ranked by phrase occurrence count, id tie-break. The
    * oracle replays it relationally: tokens with zipped-unnest
    * ordinals, one self-join per phrase slot on ord offsets, count per
    * doc — token positions agree between engines because both split on
    * the same whitespace discipline.
    */
  val PhraseTerms = Seq("slow", "hash", "batch")

  val qPhraseSearch: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val out = TempDirs.create("graft_postings_phrase")
    InvertedIndex.write(Tables.documents(s, dir), col("doc_id"),
      col("text"), out, nBuckets = PostingsBuckets, positions = true)
    InvertedIndex.phraseTopK(s, out, PhraseTerms, topK = 20)
      .select(col("id").as("doc_id"), col("tf"))
      .orderBy(col("tf").desc, col("doc_id"))
  }

  val qPhraseSearchSql: String = {
    val toks =
      """SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)) AS tok,
        |    unnest(range(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)))) AS ord
        |  FROM documents WHERE length(trim(text)) > 0""".stripMargin
    val joins = (1 until PhraseTerms.length).map { i =>
      s"  JOIN toks t$i ON t$i.doc_id = t0.doc_id AND t$i.ord = t0.ord + $i"
    }.mkString("\n")
    val conds = PhraseTerms.zipWithIndex
      .map { case (t, i) => s"t$i.tok = '$t'" }.mkString(" AND ")
    s"""WITH toks AS (
       |  $toks),
       |hits AS (
       |  SELECT t0.doc_id
       |  FROM toks t0
       |$joins
       |  WHERE $conds)
       |SELECT doc_id, count(*)::DOUBLE AS tf FROM hits GROUP BY doc_id
       |ORDER BY tf DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q_ivfpq_filtered — attribute-filtered ANN serving
    * ([[graft.llm.IvfPq.serveFiltered]], the RAG/ACL case): top-20 by
    * ADC among ONLY label-2 vectors, the allowed-id set semi-joined
    * onto the probed code rows BEFORE any scoring. The oracle is the
    * q_ivfpq_recall candidate pipeline with the label predicate joined
    * into the candidate set — filtered serving must equal filtering
    * the candidates, never re-rank them.
    */
  val FilterLabel = 2

  val qIvfPqFiltered: Q = (s, dir) => {
    import graft.llm.IvfPq
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    val out = TempDirs.create("graft_ivfpq_filt")
    IvfPq.write(emb, col("vec_id"), col("embedding"), cents, pqCents, out)
    IvfPq.serveFiltered(s, out, cents, pqCents, anchorV,
      nProbe = IvfNProbe, topK = PqTopK,
      allowed = emb.where(col("label") === FilterLabel), id = col("vec_id"))
      .select(col("id"), col("adc"))
      .orderBy(col("adc"), col("id"))
  }

  val qIvfPqFilteredSql: String = {
    val cf = s"c${QueriesPipeline.KmeansIters}"
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN code$j USING (vec_id)").mkString(" ")
    val qdJoins = (0 until PqM)
      .map(j => s"JOIN qd$j ON qd$j.cid = code$j.cid").mkString(" ")
    val adcExpr = (0 until PqM).map(j => s"qd$j.d").mkString(" + ")
    s"""WITH ${QueriesPipeline.kmeansCtes},
       |asg AS (SELECT vec_id, cid FROM af WHERE rn = 1),
       |pqemb AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |${pqCtesBody("pqemb")},
       |qv AS (SELECT list_transform(e, x -> x::DOUBLE) AS q
       |       FROM emb WHERE vec_id = $PqAnchor),
       |cd AS (SELECT cid, round(list_sum(list_transform(range(1, 65),
       |    i -> (qv.q[i] - c.c[i]) * (qv.q[i] - c.c[i]))), 6) AS d
       |  FROM $cf c CROSS JOIN qv),
       |probes AS (SELECT cid FROM cd ORDER BY d, cid LIMIT $IvfNProbe),
       |cand AS (SELECT a.vec_id FROM asg a
       |  JOIN probes p ON a.cid = p.cid
       |  JOIN embeddings e ON e.vec_id = a.vec_id AND e.label = $FilterLabel)
       |SELECT code0.vec_id AS id, round($adcExpr, 6) AS adc
       |FROM code0 $codeJoins $qdJoins
       |JOIN cand ON cand.vec_id = code0.vec_id
       |ORDER BY adc, id LIMIT $PqTopK""".stripMargin
  }

  /** q_ivfpq_stats — the vector index's segment-info describe
    * ([[graft.llm.IvfPq.describe]]) after an incremental build (90%
    * write + 10% append, q_ivfpq_incr's discipline) and a delete wave:
    * stored rows, populated cluster partitions, generation, tombstone
    * debt. The oracle computes rows/deletes from corpus arithmetic and
    * the populated-cluster count from the SAME coarse-assignment CTEs
    * q_kmeans pins — so the on-disk partition population is checked
    * against the model's own assignment, not against the engine.
    */
  val qIvfPqStats: Q = (s, dir) => {
    import graft.llm.IvfPq
    val emb = Tables.embeddings(s, dir)
    val cents = QueriesPipeline.kmeansCentsOf(s, dir)
    val pqCents = pqCentsOf(s, dir)
    val out = TempDirs.create("graft_ivfpq_stats")
    IvfPq.write(emb.where(pmod(col("vec_id"), lit(10)) =!= 0),
      col("vec_id"), col("embedding"), cents, pqCents, out)
    IvfPq.append(emb.where(pmod(col("vec_id"), lit(10)) === 0),
      col("vec_id"), col("embedding"), cents, pqCents, out)
    IvfPq.delete(s, out, emb.where(pmod(col("vec_id"), lit(13)) === 0)
      .select("vec_id"), col("vec_id"))
    IvfPq.describe(s, out)
  }

  val qIvfPqStatsSql: String =
    s"""WITH ${QueriesPipeline.kmeansCtes},
       |asg AS (SELECT vec_id, cid FROM af WHERE rn = 1)
       |SELECT
       |  (SELECT count(*) FROM embeddings)::BIGINT AS n_rows,
       |  (SELECT count(DISTINCT cid) FROM asg)::BIGINT AS n_clusters,
       |  2::BIGINT AS gen,
       |  (SELECT count(*) FROM embeddings WHERE vec_id % 13 = 0)::BIGINT AS n_tombstoned""".stripMargin

  /** q_ivfpq_rerank_filt — the RAG/ACL serve at exact-re-rank quality
    * (VERDICT r11 item 4, [[graft.llm.IvfPq.serveRerankedFiltered]]):
    * top-$PqTopK among ONLY the label-$FilterLabel vectors, ADC
    * shortlist drawn from allowed rows, exact re-rank from the
    * memoized raw-stored index's OWN `vec` column — a filtered
    * exact-quality request whose timed body is serve-only and touches
    * no corpus table beyond the allowed-set dimension scan. The oracle
    * replays probe selection, the filtered candidate set, ADC, and the
    * exact re-rank in SQL (the q_ivfpq_filtered + q_ivfpq_rerank CTE
    * disciplines composed).
    */
  val qIvfPqRerankFilt: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val anchorV = Anchors.vecD(s, dir, PqAnchor)
    graft.llm.IvfPq.serveRerankedFiltered(s, ivfRawIndexOf(s, dir),
        QueriesPipeline.kmeansCentsOf(s, dir), pqCentsOf(s, dir), anchorV,
        nProbe = IvfNProbe, rerankR = IvfRerankR, topK = PqTopK,
        allowed = emb.where(col("label") === FilterLabel),
        id = col("vec_id"))
      .select(col("id"), col("d2"))
      .orderBy(col("d2"), col("id"))
  }

  /** One filtered-re-rank request's CTE block, suffixed `_$m`: the
    * [[hybridIndexedMemberCtes]] probe/ADC/re-rank structure with the
    * candidate set restricted to label-$FilterLabel rows — shared by
    * the single and batched oracles (batching never changes an answer).
    */
  private def ivfRerankFiltMemberCtes(m: String, anchor: Long): String = {
    val cf = s"c${QueriesPipeline.KmeansIters}"
    val sub = 64 / PqM
    def qdist(sCol: String, cTab: String): String =
      s"round(list_sum(list_transform(range(1, $sub + 1), " +
        s"i -> ($sCol[i] - $cTab.c[i]) * ($sCol[i] - $cTab.c[i]))), 6)"
    val qds = (0 until PqM).map { j =>
      s"""qd_${m}_$j AS (
         |  SELECT cid, ${qdist("qs", s"c${j}_$PqIters")} AS d
         |  FROM c${j}_$PqIters CROSS JOIN
         |    (SELECT s AS qs FROM e$j WHERE vec_id = $anchor))""".stripMargin
    }.mkString(",\n")
    val qdJoins = (0 until PqM)
      .map(j => s"JOIN qd_${m}_$j ON qd_${m}_$j.cid = code$j.cid").mkString(" ")
    val adcExpr = (0 until PqM).map(j => s"qd_${m}_$j.d").mkString(" + ")
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN code$j USING (vec_id)").mkString(" ")
    s"""$qds,
       |qv_$m AS (SELECT list_transform(e, x -> x::DOUBLE) AS q
       |       FROM emb WHERE vec_id = $anchor),
       |cd_$m AS (SELECT cid, round(list_sum(list_transform(range(1, 65),
       |    i -> (qv_$m.q[i] - c.c[i]) * (qv_$m.q[i] - c.c[i]))), 6) AS d
       |  FROM $cf c CROSS JOIN qv_$m),
       |probes_$m AS (SELECT cid FROM cd_$m ORDER BY d, cid LIMIT $IvfNProbe),
       |cand_$m AS (SELECT a.vec_id FROM asg a JOIN probes_$m p ON a.cid = p.cid
       |  JOIN embeddings e ON e.vec_id = a.vec_id AND e.label = $FilterLabel),
       |adcc_$m AS (
       |  SELECT code0.vec_id, round($adcExpr, 6) AS adc
       |  FROM code0 $codeJoins $qdJoins
       |  JOIN cand_$m ON cand_$m.vec_id = code0.vec_id),
       |rr_$m AS (SELECT vec_id FROM adcc_$m ORDER BY adc, vec_id LIMIT $IvfRerankR),
       |rex_$m AS (SELECT emb.vec_id, round(list_sum(list_transform(range(1, 65),
       |      i -> (emb.e[i]::DOUBLE - qv_$m.q[i]) * (emb.e[i]::DOUBLE - qv_$m.q[i]))), 6) AS d
       |    FROM emb JOIN rr_$m USING (vec_id) CROSS JOIN qv_$m),
       |top_$m AS (SELECT vec_id AS id, d AS d2 FROM rex_$m
       |  ORDER BY d, vec_id LIMIT $PqTopK)""".stripMargin
  }

  lazy val qIvfPqRerankFiltSql: String =
    s"""WITH $hybridIndexedSharedCtes,
       |${ivfRerankFiltMemberCtes("one", PqAnchor)}
       |SELECT id, d2 FROM top_one ORDER BY d2, id""".stripMargin

  /** q_ivfpq_rerank_filt_batch — the BATCHED filtered exact-quality
    * serve ([[graft.llm.IvfPq.serveRerankedFilteredBatch]]): many
    * queries, one ACL snapshot — one union-probe ADC scan draws every
    * shortlist from allowed rows, one stored-vector pass re-ranks them
    * all. Per member the rows equal q_ivfpq_rerank_filt's for that
    * anchor (the oracle unions the single-request member CTEs).
    */
  lazy val RerankFiltBatch: Seq[(String, Long)] =
    Seq(("qa", 0L), ("qb", 7L), ("qc", 42L))

  val qIvfPqRerankFiltBatch: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val ids = RerankFiltBatch.map(_._2)
    val anchors: Map[Long, Array[Double]] =
      ids.map(i => i -> Anchors.vecD(s, dir, i)).toMap
    graft.llm.IvfPq.serveRerankedFilteredBatch(s, ivfRawIndexOf(s, dir),
        QueriesPipeline.kmeansCentsOf(s, dir), pqCentsOf(s, dir),
        RerankFiltBatch.map { case (q, a) => (q, anchors(a)) },
        nProbe = IvfNProbe, rerankR = IvfRerankR, topK = PqTopK,
        allowed = emb.where(col("label") === FilterLabel),
        id = col("vec_id"))
      .select(col("qid"), col("id"), col("d2"))
      .orderBy(col("qid"), col("d2"), col("id"))
  }

  lazy val qIvfPqRerankFiltBatchSql: String = {
    val members = RerankFiltBatch.map { case (m, anchor) =>
      ivfRerankFiltMemberCtes(m, anchor)
    }.mkString(",\n")
    val union = RerankFiltBatch.map { case (m, _) =>
      s"SELECT '$m' AS qid, id, d2 FROM top_$m"
    }.mkString("\nUNION ALL\n")
    s"""WITH $hybridIndexedSharedCtes,
       |$members
       |$union
       |ORDER BY qid, d2, id""".stripMargin
  }

  /** q_retrieval_eval — the evaluation harness every retrieval
    * deployment runs: MRR and nDCG@20 of the SERVED ranking (the
    * persisted index's BM25 top-20) against a deterministic binary
    * relevance set: a doc is relevant iff it contains the exact PHRASE
    * "slow hash batch" — deliberately STRICTER than the ranker's
    * bag-of-words model, so the metrics measure something real (how
    * well term-level BM25 surfaces phrase-level matches) instead of
    * saturating at 1.0. Rank positions come from a window over the ≤20
    * post-limit served rows (PlanAudit allowlisted with that size
    * proof); the ideal DCG is a driver-side ≤20-term scalar. log2 is
    * computed as ln/ln(2) in BOTH engines — the same cross-engine ln
    * discipline BM25's idf already relies on.
    */
  val qRetrievalEval: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    import org.apache.spark.sql.expressions.Window
    // the eval is a SERVING metric: it reads the memoized persisted
    // index (the same artifact q_hybrid_rrf serves from — identical
    // build parameters), so its timed body is serve + judge, not an
    // index build (VERDICT r10 item 6)
    val served = InvertedIndex.bm25TopK(s, QueriesLlm.hybridIndexOf(s, dir),
      PhraseTerms, topK = 20)
    // the phrase-relevance set is INDEX-SERVED too (VERDICT r11 item 2):
    // the binary judgment "contains the exact phrase" is an occurrence
    // count over the memoized POSITIONAL index's stored offsets
    // ([[graft.llm.InvertedIndex.phraseMatchDocs]] — the phraseTopK
    // machinery, unlimited), an index-sized bucket-pruned read where the
    // previous form ran an interpreted sequence/filter HOF over the
    // whole documents table twice per eval. Stored positions are the
    // shared tokenizer's output persisted at build, so the set equals
    // the corpus-scan definition the oracle still recomputes.
    val rel = InvertedIndex.phraseMatchDocs(s, posIndexOf(s, dir),
        PhraseTerms)
      .select(col("id").as("rid"))
    val nRel = rel.count() // ONE driver scalar from a bounded agg
    val idcg = (1 to math.min(nRel, 20L).toInt)
      .map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    val ranked = served
      .withColumn("pos",
        row_number().over(Window.orderBy(col("score").desc, col("id"))))
      .join(rel, col("id") === col("rid"), "left")
      .withColumn("r", when(col("rid").isNotNull, 1.0).otherwise(0.0))
    val dcg = sum(col("r") / (log(col("pos") + 1.0) / math.log(2.0)))
    ranked.agg(
      round(coalesce(max(when(col("r") === 1.0, lit(1.0) / col("pos"))),
        lit(0.0)), 4).as("mrr"),
      round(
        if (idcg == 0.0) lit(0.0) else coalesce(dcg / idcg, lit(0.0)),
        4).as("ndcg"))
      .select(lit(20).as("k"), lit(nRel).as("n_relevant"),
        col("mrr"), col("ndcg"))
  }

  val qRetrievalEvalSql: String = {
    val conds = PhraseTerms.zipWithIndex
      .map { case (t, i) => s"t$i.tok = '$t'" }.mkString(" AND ")
    s"""WITH topk AS (
       |SELECT doc_id, score FROM (
       |${QueriesCurate.bm25OracleSql(PhraseTerms, 20)}
       |) AS bm
       |),
       |ranked AS (SELECT doc_id, score,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS pos FROM topk),
       |toksrel AS (SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)) AS tok,
       |    unnest(range(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)))) AS ord
       |  FROM documents WHERE length(trim(text)) > 0),
       |rel AS (SELECT DISTINCT t0.doc_id
       |  FROM toksrel t0
       |  JOIN toksrel t1 ON t1.doc_id = t0.doc_id AND t1.ord = t0.ord + 1
       |  JOIN toksrel t2 ON t2.doc_id = t0.doc_id AND t2.ord = t0.ord + 2
       |  WHERE $conds),
       |nrel AS (SELECT count(*)::BIGINT AS n FROM rel),
       |idcg AS (SELECT sum(1.0 / (ln(i + 1) / ln(2))) AS v
       |  FROM (SELECT unnest(range(1,
       |    least((SELECT n FROM nrel), 20) + 1)) AS i)),
       |j AS (SELECT ranked.pos,
       |    CASE WHEN rel.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS r
       |  FROM ranked LEFT JOIN rel USING (doc_id))
       |SELECT 20 AS k, (SELECT n FROM nrel) AS n_relevant,
       |  round(coalesce(max(CASE WHEN r = 1.0 THEN 1.0 / pos END), 0), 4) AS mrr,
       |  round(CASE WHEN (SELECT n FROM nrel) = 0 THEN 0
       |    ELSE coalesce(sum(r / (ln(pos + 1) / ln(2)))
       |           / (SELECT v FROM idcg), 0) END, 4) AS ndcg
       |FROM j""".stripMargin
  }

  /** q_index_merge — Lucene-style segment merging across
    * independently-built indexes ([[graft.llm.InvertedIndex.merge]]):
    * two disjoint half-corpus indexes (built separately, one carrying a
    * pending tombstone wave) merge into one serving index — index-sized
    * union of LIVE rows, no re-tokenization, exact merged stats
    * recomputed compact-style. The oracle is a fresh build over the
    * union of the two halves minus the tombstoned docs: merge must
    * equal build, deletes applied.
    */
  val qIndexMerge: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val docs = Tables.documents(s, dir)
    val a = TempDirs.create("graft_postings_mrg_a")
    val b = TempDirs.create("graft_postings_mrg_b")
    val dst = TempDirs.create("graft_postings_mrg")
    InvertedIndex.write(docs.where(pmod(col("doc_id"), lit(2)) === 0),
      col("doc_id"), col("text"), a, nBuckets = PostingsBuckets)
    InvertedIndex.write(docs.where(pmod(col("doc_id"), lit(2)) === 1),
      col("doc_id"), col("text"), b, nBuckets = PostingsBuckets)
    // half B carries pending deletes: merge must apply them
    InvertedIndex.delete(s, b,
      docs.where(pmod(col("doc_id"), lit(9)) === 5).select("doc_id"),
      col("doc_id"))
    InvertedIndex.merge(s, Seq(a, b), dst)
    InvertedIndex.bm25TopK(s, dst, IncrTerms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  // merge ≡ build over the union minus tombstoned docs (9k+5 is odd for
  // even k offsets... the predicate below is exactly the ids half B
  // tombstoned that exist in half B: doc_id % 9 = 5 AND doc_id % 2 = 1;
  // even ids matching %9=5 live in half A and were never tombstoned there
  val qIndexMergeSql: String = QueriesCurate.bm25OracleSql(
    IncrTerms, 20,
    docFilter = "NOT (doc_id % 9 = 5 AND doc_id % 2 = 1)")

  /** q_index_stats — the index's segment-info describe
    * ([[graft.llm.InvertedIndex.describe]]) after the SAME change feed
    * as q_index_upsert, WITHOUT compacting: n_docs/sum_dl are the
    * Lucene-stale post-append scalars (original corpus + upserted
    * versions; deletes not yet subtracted), gen is the feed's two
    * maintenance steps, and n_tombstoned counts every touched id. The
    * oracle recomputes all of it from the raw corpus + feed arithmetic
    * in DuckDB — append's exact integer-double stats maintenance
    * becomes a hash-checked fact.
    */
  val qIndexStats: Q = (s, dir) => {
    import graft.llm.InvertedIndex
    val docs = Tables.documents(s, dir)
    val out = TempDirs.create("graft_postings_stats")
    InvertedIndex.write(docs, col("doc_id"), col("text"), out,
      nBuckets = PostingsBuckets)
    val upserts = docs
      .where(pmod(col("doc_id"), lit(10)) === 0 &&
        pmod(col("doc_id"), lit(7)) =!= 3)
      .select(col("doc_id"), concat(col("text"), lit(" updated")).as("text"),
        lit("upsert").as("op"))
    val deletes = docs.where(pmod(col("doc_id"), lit(7)) === 3)
      .select(col("doc_id"), lit("").as("text"), lit("delete").as("op"))
    InvertedIndex.applyChangeFeed(upserts.unionByName(deletes),
      col("doc_id"), col("text"), col("op"), out)
    InvertedIndex.describe(s, out)
  }

  val qIndexStatsSql: String = {
    def dlOf(textExpr: String): String =
      s"""CASE WHEN length(trim($textExpr)) = 0 THEN 0
         |     ELSE len(regexp_split_to_array(trim(lower($textExpr)), '\\s+')) END::DOUBLE""".stripMargin
    s"""WITH dl AS (SELECT doc_id, ${dlOf("text")} AS dl FROM documents),
       |ups AS (SELECT doc_id, ${dlOf("text || ' updated'")} AS dl
       |        FROM documents WHERE doc_id % 10 = 0 AND doc_id % 7 <> 3),
       |del AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3)
       |SELECT
       |  ((SELECT count(*) FROM dl) + (SELECT count(*) FROM ups))::DOUBLE AS n_docs,
       |  ((SELECT coalesce(sum(dl), 0) FROM dl)
       |    + (SELECT coalesce(sum(dl), 0) FROM ups))::DOUBLE AS sum_dl,
       |  $PostingsBuckets AS n_buckets,
       |  2::BIGINT AS gen,
       |  ((SELECT count(*) FROM ups) + (SELECT count(*) FROM del))::BIGINT AS n_tombstoned""".stripMargin
  }

  /** q_hash_classifier — the learned-quality-gate apply step
    * ([[graft.llm.HashClassifier]]): every document scored by a hashed
    * linear model over its tokens (hashing-trick buckets from the
    * md5-parity derivation, deterministic placeholder weight table) and
    * gated at prob ≥ 0.5 ON THE 6-DP-ROUNDED value in both engines.
    * The whole score is one narrow higher-order-aggregate projection —
    * no explode, no shuffle, whole-stage codegen — the shape a 100-TB
    * classifier sweep must have. The oracle replays bucket, weight mix,
    * array-order fold, and sigmoid with the identical arithmetic.
    */
  val qHashClassifier: Q = (s, dir) => {
    import graft.llm.HashClassifier
    val toks = TextStats.tokens(lower(col("text")))
    Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).as("n_tokens"),
        round(HashClassifier.featMean(toks), 6).as("feat_mean"),
        round(HashClassifier.prob(toks), 6).as("prob"))
      .withColumn("keep", (col("prob") >= 0.5).cast("int"))
      .orderBy("doc_id")
  }

  val qHashClassifierSql: String = {
    import graft.llm.HashClassifier._
    // WeightMod is 2^17, so each token weight is an exact multiple of
    // 2^-16 and the list_sum is EXACT whatever DuckDB's fold order —
    // feat_mean can never round apart from Spark's at the 6th decimal
    val w = s"(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) % $Buckets" +
      s" * $Mix % $WeightMod) / $WeightMod.0 * 2 - 1"
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |    CASE WHEN len(t) = 0 THEN 0.0
       |         ELSE list_sum(list_transform(t, t -> $w)) / len(t)
       |    END AS fm
       |  FROM toks)
       |SELECT doc_id, n_tokens, round(fm, 6) AS feat_mean,
       |  round(1.0 / (1.0 + exp(fm * -3)), 6) AS prob,
       |  (round(1.0 / (1.0 + exp(fm * -3)), 6) >= 0.5)::INT AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** q_classifier_train — the TRAINING half of the learned quality gate
    * (VERDICT r9 item 7; [[graft.llm.HashClassifier.train]]): logistic
    * weights over the hashed feature space fitted IN-ENGINE with
    * [[ClassifierIters]] full-batch distributed gradient passes (label:
    * document contains the token 'data'), from w = 0. The oracle
    * unrolls the same passes in SQL — per-doc margins and per-bucket
    * gradients rounded to 6 dp each pass (the q_kmeans determinism
    * discipline), every other value a pure function of rounded inputs —
    * so the driver hash-checks the LEARNED weights themselves, not a
    * placeholder. Scale shape: per pass, one broadcast model join
    * (≤ 4096 rows), one per-doc and one per-bucket aggregation; the
    * per-pass collect is model-sized.
    */
  val ClassifierIters = 2
  val ClassifierLr = 10.0
  val ClassifierLabelTok = "data"

  val qClassifierTrain: Q = (s, dir) => {
    import graft.llm.HashClassifier
    val toks = TextStats.tokens(lower(col("text")))
    HashClassifier.train(Tables.documents(s, dir), col("doc_id"), toks,
        array_contains(toks, ClassifierLabelTok),
        iters = ClassifierIters, lr = ClassifierLr)
      .orderBy("bucket")
  }

  val qClassifierTrainSql: String = {
    import graft.llm.HashClassifier.Buckets
    val nd = "(SELECT n_docs FROM nd)"
    val iterBlocks = (2 to ClassifierIters).map { t =>
      val p = t - 1
      s"""m$t AS (
         |  SELECT feat.doc_id, round(sum(x * coalesce(w$p.w, 0)), 6) AS m
         |  FROM feat LEFT JOIN w$p USING (bucket) GROUP BY feat.doc_id),
         |p$t AS (SELECT doc_id, 1.0 / (1.0 + exp(-m)) AS p FROM m$t),
         |g$t AS (
         |  SELECT bucket, round(sum((p - y) * x) / $nd, 6) AS g
         |  FROM feat JOIN p$t USING (doc_id) GROUP BY bucket),
         |w$t AS (
         |  SELECT w$p.bucket, round(w$p.w - $ClassifierLr * g$t.g, 6) AS w
         |  FROM w$p JOIN g$t USING (bucket))""".stripMargin
    }.mkString(",\n")
    val iters = if (iterBlocks.isEmpty) "" else s",\n$iterBlocks"
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents WHERE length(trim(text)) > 0),
       |lab AS (
       |  SELECT doc_id, list_contains(t, '$ClassifierLabelTok')::INT AS y,
       |    len(t) AS n
       |  FROM toks),
       |ex AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(tok), 1, 8) AS UBIGINT) % $Buckets AS bucket
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)),
       |cnt AS (SELECT doc_id, bucket, count(*) AS c FROM ex GROUP BY 1, 2),
       |feat AS (
       |  SELECT doc_id, bucket, c::DOUBLE / n AS x, y
       |  FROM cnt JOIN lab USING (doc_id)),
       |nd AS (SELECT count(*)::DOUBLE AS n_docs FROM toks),
       |g1 AS (
       |  SELECT bucket, round(sum((0.5 - y) * x) / $nd, 6) AS g
       |  FROM feat GROUP BY bucket),
       |w1 AS (SELECT bucket, round(0 - $ClassifierLr * g, 6) AS w FROM g1)$iters
       |SELECT bucket::BIGINT AS bucket, w AS weight FROM w$ClassifierIters
       |ORDER BY bucket""".stripMargin
  }

  /** q_psi_drift — per-source population-stability-index report
    * ([[graft.llm.Drift]]): each source's document-length distribution
    * (10 fixed 200-char bins over the exact n_chars column) against the
    * corpus, Laplace-smoothed, with per-bin drift contributions and the
    * source's PSI total. Integer binning + pure functions of integer
    * counts → identical doubles in both engines; per-bin terms avoid
    * any order-dependent summation, and the total sums 10 pre-rounded
    * terms. Two bounded shuffles, bins-sized relations broadcast back.
    */
  val PsiBinW = 200L
  val PsiBins = 10

  val qPsiDrift: Q = (s, dir) =>
    graft.llm.Drift.psiBySource(Tables.documents(s, dir), col("source"),
        col("n_chars"), binWidth = PsiBinW, bins = PsiBins)
      .orderBy("source", "bin")

  val qPsiDriftSql: String =
    s"""WITH b AS (
       |  SELECT source,
       |    least(${PsiBins - 1}, floor(n_chars / $PsiBinW))::INT AS bin
       |  FROM documents),
       |per_sb AS (SELECT source, bin, count(*) AS n_sb FROM b GROUP BY 1, 2),
       |per_s AS (SELECT source, count(*) AS n_s FROM b GROUP BY 1),
       |per_b AS (SELECT bin, count(*) AS n_b FROM b GROUP BY 1),
       |tot AS (SELECT count(*) AS n FROM b),
       |grid AS (
       |  SELECT source, n_s, unnest(range(0, $PsiBins))::INT AS bin FROM per_s),
       |corpus AS (
       |  SELECT g.bin, coalesce(per_b.n_b, 0) AS n_b, tot.n
       |  FROM (SELECT unnest(range(0, $PsiBins))::INT AS bin) g
       |  LEFT JOIN per_b USING (bin), tot),
       |j AS (
       |  SELECT grid.source, grid.bin,
       |    coalesce(per_sb.n_sb, 0) AS n_sb, corpus.n_b,
       |    (coalesce(per_sb.n_sb, 0) + 0.5) / (grid.n_s + ${0.5 * PsiBins}) AS p,
       |    (corpus.n_b + 0.5) / (corpus.n + ${0.5 * PsiBins}) AS q
       |  FROM grid
       |  LEFT JOIN per_sb ON per_sb.source = grid.source AND per_sb.bin = grid.bin
       |  JOIN corpus ON corpus.bin = grid.bin),
       |t AS (SELECT *, round((p - q) * ln(p / q), 6) AS term FROM j),
       |ttl AS (SELECT source, round(sum(term), 4) AS psi FROM t GROUP BY 1)
       |SELECT t.source, t.bin, t.n_sb, t.n_b,
       |  round(t.p, 6) AS p, round(t.q, 6) AS q, t.term, ttl.psi
       |FROM t JOIN ttl ON ttl.source = t.source
       |ORDER BY t.source, t.bin""".stripMargin

  /** q_event_anomaly — per-group normalization over event time (the
    * monitoring/feature-engineering shape): hourly counts per event type,
    * then each hour's z-score against its type's mean/stddev, flagging
    * |z| > 2. Two shuffles total — the keyed hourly aggregation
    * (map-side partial) and the per-type stats over the already-tiny
    * hourly relation — and the stats join BACK is an explicit broadcast
    * (|event types| rows), so nothing data-sized moves twice. The
    * anomaly threshold compares the 4-dp-ROUNDED z (the repo's rounding
    * grid): Spark and DuckDB accumulate avg/stddev_pop in different
    * orders, so an unrounded borderline hour within one ulp of z = 2
    * could flag in one engine only; rounding first makes the flag a
    * pure function of the displayed z.
    */
  val qEventAnomaly: Q = (s, dir) => {
    val hourly = Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(avg("n").as("mean_n"), stddev_pop(col("n")).as("sd_n"))
    val zr = when(col("sd_n") > 0,
      round((col("n") - col("mean_n")) / col("sd_n"), 4)).otherwise(lit(0.0))
    hourly.join(broadcast(stats), "event_type")
      .select(col("hour"), col("event_type"), col("n").cast("long").as("n"),
        round(col("mean_n"), 4).as("mean_n"),
        round(col("sd_n"), 4).as("sd_n"),
        zr.as("z"),
        when(abs(zr) > 2, 1).otherwise(0).as("anomaly"))
      .orderBy("hour", "event_type")
  }

  val qEventAnomalySql: String =
    """WITH hourly AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |    event_type, count(*)::DOUBLE AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, avg(n) AS mean_n, stddev_pop(n) AS sd_n
      |  FROM hourly GROUP BY 1)
      |SELECT hour, event_type, n, mean_n, sd_n, z,
      |  CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END AS anomaly
      |FROM (
      |  SELECT h.hour, h.event_type, h.n::BIGINT AS n,
      |    round(s.mean_n, 4) AS mean_n, round(s.sd_n, 4) AS sd_n,
      |    CASE WHEN s.sd_n > 0 THEN round((h.n - s.mean_n) / s.sd_n, 4)
      |         ELSE 0.0 END AS z
      |  FROM hourly h JOIN stats s USING (event_type))
      |ORDER BY hour, event_type""".stripMargin

  def all: Map[String, Q] = Map(
    "q_event_anomaly" -> qEventAnomaly,
    "q_zorder_extract" -> qZorderExtract,
    "q_bucketed_join" -> qBucketedJoin,
    "q_ivf_recall" -> qIvfRecall,
    "q_ivfpq_recall" -> qIvfPqRecall,
    "q_ivfpq_rerank" -> qIvfPqRerank,
    "q_ivfpq_incr" -> qIvfPqIncr,
    "q_ivfpq_delete" -> qIvfPqDelete,
    "q_ivfpq_merge" -> qIvfPqMerge,
    "q_hybrid_indexed" -> qHybridIndexed,
    "q_hybrid_indexed_batch" -> qHybridIndexedBatch,
    "q_postings_topk" -> qPostingsTopk,
    "q_postings_filtered" -> qPostingsFiltered,
    "q_postings_filt_batch" -> qPostingsFilteredBatch,
    "q_bm25_auto" -> qBm25Auto,
    "q_postings_and" -> qPostingsAnd,
    "q_snippets" -> qSnippets,
    "q_snippets_batch" -> qSnippetsBatch,
    "q_index_incr" -> qIndexIncr,
    "q_index_delete" -> qIndexDelete,
    "q_index_upsert" -> qIndexUpsert,
    "q_index_asof" -> qIndexAsof,
    "q_postings_batch" -> qPostingsBatch,
    "q_phrase_search" -> qPhraseSearch,
    "q_ivfpq_batch" -> qIvfPqBatch,
    "q_index_stats" -> qIndexStats,
    "q_ivfpq_stats" -> qIvfPqStats,
    "q_ivfpq_filtered" -> qIvfPqFiltered,
    "q_ivfpq_rerank_filt" -> qIvfPqRerankFilt,
    "q_ivfpq_rerank_filt_batch" -> qIvfPqRerankFiltBatch,
    "q_index_merge" -> qIndexMerge,
    "q_retrieval_eval" -> qRetrievalEval,
    "q_hash_classifier" -> qHashClassifier,
    "q_classifier_train" -> qClassifierTrain,
    "q_psi_drift" -> qPsiDrift,
    "q_zorder_layout" -> qZorderLayout,
    "q_jl_project" -> qJlProject,
    "q_ppl_buckets" -> qPplBuckets,
    "q_dup_cluster_sizes" -> qDupClusterSizes,
    "q_pq_recall" -> qPqRecall,
    "q_gopher_quality" -> qGopherQuality,
    "q_char_entropy" -> qCharEntropy,
    "q_json_extract" -> qJsonExtract,
    "q_line_dedup" -> qLineDedup,
    "q_weighted_sample" -> qWeightedSample,
    "q_wordpiece" -> qWordpiece,
    "q_fertility" -> qFertility,
    "q_pq_topk" -> qPqTopk,
    "q_pq_distortion" -> qPqDistortion)

  def oracles: Map[String, String] = Map(
    "q_event_anomaly" -> qEventAnomalySql,
    "q_zorder_extract" -> qZorderExtractSql,
    "q_bucketed_join" -> qBucketedJoinSql,
    "q_ivf_recall" -> qIvfRecallSql,
    "q_ivfpq_recall" -> qIvfPqRecallSql,
    "q_ivfpq_rerank" -> qIvfPqRerankSql,
    "q_ivfpq_incr" -> qIvfPqIncrSql,
    "q_ivfpq_delete" -> qIvfPqDeleteSql,
    "q_ivfpq_merge" -> qIvfPqMergeSql,
    "q_hybrid_indexed" -> qHybridIndexedSql,
    "q_hybrid_indexed_batch" -> qHybridIndexedBatchSql,
    "q_postings_topk" -> qPostingsTopkSql,
    "q_postings_filtered" -> qPostingsFilteredSql,
    "q_postings_filt_batch" -> qPostingsFilteredBatchSql,
    "q_bm25_auto" -> qBm25AutoSql,
    "q_postings_and" -> qPostingsAndSql,
    "q_snippets" -> qSnippetsSql,
    "q_snippets_batch" -> qSnippetsBatchSql,
    "q_index_incr" -> qIndexIncrSql,
    "q_index_delete" -> qIndexDeleteSql,
    "q_index_upsert" -> qIndexUpsertSql,
    "q_index_asof" -> qIndexAsofSql,
    "q_postings_batch" -> qPostingsBatchSql,
    "q_phrase_search" -> qPhraseSearchSql,
    "q_ivfpq_batch" -> qIvfPqBatchSql,
    "q_index_stats" -> qIndexStatsSql,
    "q_ivfpq_stats" -> qIvfPqStatsSql,
    "q_ivfpq_filtered" -> qIvfPqFilteredSql,
    "q_ivfpq_rerank_filt" -> qIvfPqRerankFiltSql,
    "q_ivfpq_rerank_filt_batch" -> qIvfPqRerankFiltBatchSql,
    "q_index_merge" -> qIndexMergeSql,
    "q_retrieval_eval" -> qRetrievalEvalSql,
    "q_hash_classifier" -> qHashClassifierSql,
    "q_classifier_train" -> qClassifierTrainSql,
    "q_psi_drift" -> qPsiDriftSql,
    "q_zorder_layout" -> qZorderLayoutSql,
    "q_jl_project" -> qJlProjectSql,
    "q_ppl_buckets" -> qPplBucketsSql,
    "q_dup_cluster_sizes" -> qDupClusterSizesSql,
    "q_pq_recall" -> qPqRecallSql,
    "q_gopher_quality" -> qGopherQualitySql,
    "q_char_entropy" -> qCharEntropySql,
    "q_json_extract" -> qJsonExtractSql,
    "q_line_dedup" -> qLineDedupSql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_wordpiece" -> qWordpieceSql,
    "q_fertility" -> qFertilitySql,
    "q_pq_topk" -> qPqTopkSql,
    "q_pq_distortion" -> qPqDistortionSql)
}

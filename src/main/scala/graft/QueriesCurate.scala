package graft

import org.apache.spark.sql.functions._
import graft.llm.{Mixing, Normalize, Snapshot, Vocab}
import graft.operators.{SkewJoin, TopK}

/** Corpus-curation operators as driver queries: vocabulary build,
  * tokenize-to-ids, text normalization, snapshot diff, salted skew join,
  * per-group top-k, quality-percentile filtering. Same determinism
  * contract as [[Queries]].
  */
object QueriesCurate {

  import Queries.Q

  val VocabN = 16

  /** q_vocab — frequency-ranked vocabulary (top 16 by count desc, token
    * asc). The rank window runs over the ≤ 16 post-limit rows.
    */
  val qVocab: Q = (s, dir) =>
    Vocab.build(Tables.documents(s, dir), col("text"), VocabN)
      .select(col("rank").cast("long").as("rk"), col("token"), col("cnt"))
      .orderBy("rk")

  val qVocabSql: String =
    s"""WITH toks AS (
      |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |c AS (SELECT tok, count(*) AS cnt
      |      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)
      |SELECT row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
      |  tok AS token, cnt
      |FROM c ORDER BY cnt DESC, tok LIMIT $VocabN""".stripMargin

  /** q_token_ids — documents mapped to vocabulary-id sequences (OOV → 0):
    * per-doc token count, OOV count, and a digest of the id sequence in
    * token order. The vocab is broadcast, so the mapping join is map-side.
    */
  val qTokenIds: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val v = Vocab.build(docs, col("text"), VocabN)
    Vocab.tokenIds(docs, col("doc_id"), col("text"), v)
      .select(col("id").as("doc_id"), col("n_tok"), col("n_oov"), col("ids_md5"))
      .orderBy("doc_id")
  }

  val qTokenIdsSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |c AS (SELECT tok, count(*) AS cnt
      |      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
      |v AS (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rk
      |      FROM c ORDER BY cnt DESC, tok LIMIT $VocabN),
      |p AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS i, t FROM toks),
      |j AS (SELECT doc_id, i, coalesce(v.rk, 0) AS tid
      |      FROM (SELECT doc_id, i, t[i] AS tok FROM p) q
      |      LEFT JOIN v USING (tok)),
      |per AS (SELECT doc_id, count(*) AS n_tok,
      |        sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
      |        md5(string_agg(tid::VARCHAR, ',' ORDER BY i)) AS ids_md5
      |        FROM j GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(per.n_tok, 0) AS n_tok,
      |  coalesce(per.n_oov, 0)::BIGINT AS n_oov, per.ids_md5
      |FROM documents d LEFT JOIN per USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q_normalize — canonical text form (NFC → lower → whitespace collapse
    * → trim): raw/normalized lengths + digest.
    */
  val qNormalize: Q = (s, dir) => {
    val norm = Normalize(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_raw"),
      length(norm).cast("long").as("n_norm"),
      md5(norm.cast("binary")).as("norm_md5"))
      .orderBy("doc_id")
  }

  val qNormalizeSql: String =
    """SELECT doc_id, length(text)::BIGINT AS n_raw,
      |  length(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')))::BIGINT AS n_norm,
      |  md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS norm_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q_snapshot_diff — corpus-version diff. The two snapshots derive
    * deterministically from `documents`: the old snapshot misses ids
    * ≡ 3 (mod 11) and carries a " [v1]" suffix on ids ≡ 2 (mod 7); the
    * new snapshot misses ids ≡ 5 (mod 13).
    */
  val qSnapshotDiff: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val old = docs.where(pmod(col("doc_id"), lit(11)) =!= 3)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 2, concat(col("text"), lit(" [v1]")))
          .otherwise(col("text")))
    val nw = docs.where(pmod(col("doc_id"), lit(13)) =!= 5)
    Snapshot.diff(old, nw, col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("status"))
      .orderBy("doc_id")
  }

  /** q_merge_upsert — [[Snapshot.applyChanges]] (MERGE): a change feed
    * derived deterministically from `documents` (delete ids ≡ 0 mod 10,
    * upsert-with-new-text ids ≡ 1, brand-new ids ≡ 2 shifted by 1e6) is
    * applied to the base; output digests the merged payload.
    */
  val qMergeUpsert: Q = (s, dir) => {
    val base = Tables.documents(s, dir)
    val deletes = base.where(pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("op", lit("delete"))
    val updates = base.where(pmod(col("doc_id"), lit(10)) === 1)
      .withColumn("text", concat(lit("updated "), col("text")))
      .withColumn("source", lit("merged"))
      .withColumn("op", lit("upsert"))
    val inserts = base.where(pmod(col("doc_id"), lit(10)) === 2)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("source", lit("insert"))
      .withColumn("op", lit("upsert"))
    val changes = deletes.unionByName(updates).unionByName(inserts)
    Snapshot.applyChanges(base, changes, "doc_id", "op")
      .select(col("doc_id"), col("source"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  val qMergeUpsertSql: String =
    """WITH changes AS (
      |  SELECT doc_id, 'delete' AS op, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id, 'upsert', 'updated ' || text, lang, 'merged', n_chars
      |  FROM documents WHERE doc_id % 10 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'upsert', text, lang, 'insert', n_chars
      |  FROM documents WHERE doc_id % 10 = 2),
      |merged AS (
      |  SELECT d.* FROM documents d
      |  LEFT JOIN (SELECT DISTINCT doc_id FROM changes) c USING (doc_id)
      |  WHERE c.doc_id IS NULL
      |  UNION ALL
      |  SELECT doc_id, text, lang, source, n_chars FROM changes
      |  WHERE op = 'upsert')
      |SELECT doc_id, source, md5(text) AS text_md5 FROM merged
      |ORDER BY doc_id""".stripMargin

  val qSnapshotDiffSql: String =
    """WITH oldsnap AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 2 THEN text || ' [v1]' ELSE text END) AS h
      |  FROM documents WHERE doc_id % 11 != 3),
      |newsnap AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 13 != 5)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN o.h != n.h THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin

  /** q_skew_join — the salted join must produce EXACTLY the plain join's
    * result (the oracle is the plain SQL join); the salt only reshapes
    * the shuffle.
    */
  val qSkewJoin: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).withColumn("o_orderkey", col("l_orderkey"))
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    SkewJoin.salted(li, ord, "o_orderkey",
      xxhash64(col("l_orderkey"), col("l_linenumber")), salt = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("price"))
      .orderBy("o_orderpriority")
  }

  val qSkewJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(l_extendedprice), 2) AS price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q_top_per_group — keep the 5 largest documents per source (ties to
    * the lower doc_id): grouped top-k via a group-partitioned rank window.
    */
  val qTopPerGroup: Q = (s, dir) =>
    TopK.perGroup(Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
      col("source"), col("n_chars"), col("doc_id"), k = 5)
      .select(col("source"), col("doc_id"), col("n_chars"),
        col("rk").cast("long").as("rk"))
      .orderBy("source", "rk")

  val qTopPerGroupSql: String =
    """SELECT source, doc_id, n_chars, rk FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  /** q_quality_filter — keep documents at or above the corpus's 75th
    * quality percentile. Both engines interpolate the exact percentile
    * over the SAME 6-dp-rounded quality values (the q_quality contract)
    * — and the threshold is itself rounded to 6 dp before the comparison:
    * quality scores are heavily duplicated (banded formula), so the
    * percentile often lands EXACTLY on a data value with many docs at the
    * boundary (19 of 5000 at sf0.1), where a one-ulp cross-engine
    * difference in interpolation order would otherwise flip them all.
    * Rounding snaps a ±ulp threshold to the same 1e-6 grid point the
    * quality values live on.
    */
  val qQualityFilter: Q = (s, dir) => {
    // persist the slim (doc_id, quality) table across the two jobs — the
    // percentile pass and the filter would otherwise each run the full
    // text kernel; at 8 bytes + a double per doc this caches fine at any
    // corpus size (and Spark spills/evicts it, it's an optimization only)
    val q = QueriesLlm.qQuality(s, dir).persist()
    // one scalar to the driver (like LangModel's V). Exact percentile here
    // because the oracle's quantile_cont interpolates; the production
    // sketch path is the same call with exact = false
    // (Profile.percentileThreshold; ProfileSpec pins both paths to the
    // same 6-dp grid point on this distribution)
    val thr = graft.operators.Profile.percentileThreshold(
      q, col("quality"), 0.75, exact = true)
    q.where(col("quality") >= thr).orderBy("doc_id")
  }

  val qQualityFilterSql: String = {
    val qualityCte = QueriesLlm.qQualitySql.replace("ORDER BY doc_id", "")
    s"""WITH qual AS ($qualityCte),
      |thr AS (SELECT round(quantile_cont(quality, 0.75), 6) AS t FROM qual)
      |SELECT doc_id, quality FROM qual, thr
      |WHERE quality >= t ORDER BY doc_id""".stripMargin
  }

  /** q_shuffle_order — deterministic corpus shuffle: a stable pseudo-
    * random training position per document (md5-keyed permutation, id
    * tie-break). The Spark plan is the two-pass distributed rank — no
    * global window; the oracle is the global-window row_number.
    */
  val qShuffleOrder: Q = (s, dir) =>
    graft.llm.Shuffle.order(Tables.documents(s, dir), col("doc_id"))
      .select(col("id").as("doc_id"), col("shuf_pos"))
      .orderBy("doc_id")

  val qShuffleOrderSql: String =
    """SELECT doc_id,
      |  row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1 AS shuf_pos
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q_cube_stats — corpus rollup over every (lang, source) margin in one
    * pass (GROUP BY CUBE): the dataset-card summary a curation pipeline
    * publishes. Spark's partial-aggregated cube expansion shuffles one
    * row per (group, margin) per partition. Subtotal rows surface as
    * '(all)' (no NULL group values exist in the corpus; engines disagree
    * on NULL sort order, so markers keep the output order portable).
    */
  val qCubeStats: Q = (s, dir) =>
    Tables.documents(s, dir)
      .cube("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .select(coalesce(col("lang"), lit("(all)")).as("lang"),
        coalesce(col("source"), lit("(all)")).as("source"),
        col("n"), col("chars"))
      .orderBy("lang", "source")

  val qCubeStatsSql: String =
    """SELECT coalesce(lang, '(all)') AS lang,
      |  coalesce(source, '(all)') AS source,
      |  count(*) AS n, sum(n_chars)::BIGINT AS chars
      |FROM documents GROUP BY CUBE(lang, source)
      |ORDER BY lang, source""".stripMargin

  /** q_bm25 — ranked retrieval for a fixed query over the corpus (top 20
    * by 4-dp score, id tie-break). The token stream is pruned to the
    * query terms before any shuffle; N and avgdl are the only corpus-
    * wide state (two scalars).
    */
  // lazy: QueriesLlm's initializer reads this while ITS initializer is
  // read by qQualityFilterSql below — entering the object graph from
  // QueriesCurate (as a spec may) would otherwise observe a null Seq
  lazy val Bm25Terms = Seq("spark", "window", "merge")

  val qBm25: Q = (s, dir) =>
    graft.llm.Bm25.topDocs(Tables.documents(s, dir), col("doc_id"),
      col("text"), Bm25Terms, topK = 20)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))

  val qBm25Sql: String = bm25OracleSql(Bm25Terms, 20)

  /** The BM25 oracle parametrized by query terms/k — shared verbatim by
    * q_bm25 (direct scoring), q_postings_topk (the persisted
    * inverted-index serving path), and q_index_incr (append ≡ rebuild),
    * because the layout must never change the answer. `docFilter`
    * restricts the corpus (q_index_delete's compacted-survivor oracle)
    * and `textExpr` rewrites it (q_index_upsert's post-merge oracle);
    * the defaults are the full unmodified corpus.
    */
  /** The BM25 oracle, parametrized for every serving mode: `docFilter`
    * narrows the CORPUS (stats and df move with it — the rebuilt-index
    * oracles), `candFilter` narrows only WHICH documents may score
    * (corpus stats intact — [[graft.llm.InvertedIndex.bm25TopKFiltered]]'s
    * Lucene filtered-query semantics), and `allMust` keeps only
    * documents containing every query term (the conjunctive
    * [[graft.llm.InvertedIndex.bm25TopKAnd]] mode). Scores are
    * identical across candidate modes by construction — the oracle
    * computes them once in `scored` and the modes only filter it.
    */
  private[graft] def bm25OracleSql(termSeq: Seq[String], topK: Int,
      docFilter: String = "TRUE", textExpr: String = "text",
      candFilter: String = "TRUE", allMust: Boolean = false): String = {
    val terms = termSeq.map(t => s"'$t'").mkString(", ")
    val mustWhere =
      if (allMust) s"nt = ${termSeq.distinct.size}" else "TRUE"
    s"""WITH dl AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim($textExpr)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(lower($textExpr)), '\\s+')) END::DOUBLE AS dl
      |  FROM documents WHERE $docFilter),
      |stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, count(*)::DOUBLE AS tf
      |  FROM (SELECT doc_id, unnest(list_filter(
      |          regexp_split_to_array(trim(lower($textExpr)), '\\s+'),
      |          x -> len(x) > 0)) AS tok
      |        FROM documents WHERE length(trim($textExpr)) > 0 AND $docFilter)
      |  WHERE tok IN ($terms) GROUP BY doc_id, tok),
      |dfq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
      |scored AS (
      |  SELECT tf.doc_id, round(sum(
      |      ln((n - df + 0.5) / (df + 0.5) + 1)
      |      * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score,
      |    count(DISTINCT tf.tok) AS nt
      |  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id), stats
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, score FROM scored
      |WHERE ($candFilter) AND ($mustWhere)
      |ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** q_split — deterministic train/val/test routing (80/10/10) by md5
    * hash-range: reproducible across engines, reruns, and layouts; a
    * pure narrow expression (the [[graft.llm.Mixing]] gate family).
    */
  val SplitBuckets: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  val qSplit: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.llm.Mixing.splitBucket(col("doc_id"), SplitBuckets).as("bucket"))
      .orderBy("doc_id")

  val qSplitSql: String = {
    val h8 = graft.llm.Mixing.rateToHex(0.8)
    val h9 = graft.llm.Mixing.rateToHex(0.9)
    val d = graft.llm.Mixing.HexDigits
    s"""SELECT doc_id,
      |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, $d) < '$h8' THEN 'train'
      |       WHEN substr(md5(doc_id::VARCHAR), 1, $d) < '$h9' THEN 'val'
      |       ELSE 'test' END AS bucket
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** q_leak_split — CONTAMINATION-SAFE train/val/test split: the routing
    * key is the near-dup COMPONENT label (q_dedup_components' graph, the
    * memoized fit), not the document id, so every member of a dup
    * cluster lands in the same bucket — a near-copy of a training doc
    * can never leak into the eval split, the failure mode a plain
    * per-doc hash split (q_split) cannot rule out. Singletons (no dup
    * edge) route by their own id — for them cluster == doc_id. Scale
    * shape: one join of the corpus against the (bounded) label relation,
    * then the same narrow hash-gate as q_split; the labels are the
    * propagation the dedup stage already ran.
    */
  val qLeakSplit: Q = (s, dir) => {
    val comps = QueriesLlm.componentsOf(s, dir)
      .select(col("id").as("doc_id"), col("comp"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster"))
      .withColumn("bucket",
        graft.llm.Mixing.splitBucket(col("cluster"), SplitBuckets))
      .orderBy("doc_id")
  }

  val qLeakSplitSql: String = {
    val h8 = graft.llm.Mixing.rateToHex(0.8)
    val h9 = graft.llm.Mixing.rateToHex(0.9)
    val d = graft.llm.Mixing.HexDigits
    s"""WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS s
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
      |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id)
      |SELECT d.doc_id,
      |  coalesce(c.component, d.doc_id) AS cluster,
      |  CASE WHEN substr(md5(coalesce(c.component, d.doc_id)::VARCHAR), 1, $d) < '$h8' THEN 'train'
      |       WHEN substr(md5(coalesce(c.component, d.doc_id)::VARCHAR), 1, $d) < '$h9' THEN 'val'
      |       ELSE 'test' END AS bucket
      |FROM documents d LEFT JOIN comp c USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin
  }

  /** q_seq_split — max-length training-sequence preparation: every
    * document split into consecutive 64-token sequences (narrow kernel
    * pass, no shuffle).
    */
  val SeqLen = 64

  val qSeqSplit: Q = (s, dir) =>
    graft.llm.ChunkDedup.sequences(Tables.documents(s, dir), col("doc_id"),
      col("text"), c = SeqLen)
      .select(col("id").as("doc_id"), col("seq_idx"), col("n_tok"), col("seq_md5"))
      .orderBy("doc_id", "seq_idx")

  val qSeqSplitSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |seqs AS (
      |  SELECT doc_id, j - 1 AS seq_idx,
      |    t[(j - 1) * $SeqLen + 1 : j * $SeqLen] AS s
      |  FROM (SELECT doc_id, t,
      |          unnest(range(1, ((len(t) + $SeqLen - 1) // $SeqLen) + 1)) AS j
      |        FROM toks WHERE len(t) > 0))
      |SELECT doc_id, seq_idx::BIGINT AS seq_idx, len(s)::BIGINT AS n_tok,
      |  md5(array_to_string(s, ' ')) AS seq_md5
      |FROM seqs ORDER BY doc_id, seq_idx""".stripMargin

  /** q_shuffle_pack — the loader pipeline end-to-end: shuffle the corpus
    * deterministically, then pack context windows by running token count
    * IN SHUFFLED ORDER. Composition of [[graft.llm.Shuffle.order]] and
    * [[graft.llm.Packing.assignBins]] — two two-pass distributed ranks,
    * still no global window anywhere; the oracle is the windowed cumsum
    * over the md5 order.
    */
  val qShufflePack: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pos = graft.llm.Shuffle.order(docs, col("doc_id"))
      .select(col("id").as("doc_id"), col("shuf_pos"))
    val toks = docs.select(col("doc_id"),
      graft.llm.TextStats.tokenCount(col("text")).cast("long").as("n_tok"))
    graft.llm.Packing.assignBins(pos.join(toks, "doc_id"),
      col("shuf_pos"), col("n_tok"), QueriesPipeline.PackBudget)
      .select(col("id").as("shuf_pos"), col("n_tok"), col("bin"))
      .join(pos, "shuf_pos")
      .select(col("doc_id"), col("shuf_pos"), col("n_tok"), col("bin"))
      .orderBy("doc_id")
  }

  val qShufflePackSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
      |    row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1 AS shuf_pos
      |  FROM documents)
      |SELECT doc_id, shuf_pos, n_tok,
      |  (coalesce(sum(n_tok) OVER (ORDER BY shuf_pos
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |   // ${QueriesPipeline.PackBudget})::BIGINT AS bin
      |FROM t ORDER BY doc_id""".stripMargin

  /** q_event_convert — view → same-user purchase within 1 hour (event
    * time): the batch run of the stream-stream interval join in
    * [[graft.streaming.EventStream.conversionPairs]]. Timestamps are
    * μs-aligned in the corpus, so μs (Spark) vs ns (DuckDB) precision
    * cannot split a boundary.
    */
  val qEventConvert: Q = (s, dir) =>
    graft.streaming.EventStream.conversionPairs(Tables.events(s, dir))
      .orderBy("view_id", "buy_id")

  val qEventConvertSql: String =
    """SELECT a.event_id AS view_id, b.event_id AS buy_id, a.user_id
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
      |WHERE a.event_type = 'view' AND b.event_type = 'purchase'
      |ORDER BY view_id, buy_id""".stripMargin

  /** q_fuzzy_pairs — fuzzy key dedup candidates: distinct keys (first
    * token + id-digit suffix, planting single-character neighbors) paired
    * at levenshtein ≤ 1. The Spark plan is the FastSS deletion-blocked
    * join; the oracle brute-forces all pairs (fine at oracle scale, the
    * exact thing the blocked plan avoids at corpus scale).
    */
  val qFuzzyPairs: Q = (s, dir) => {
    import graft.llm.TextStats
    val keyed = Tables.documents(s, dir)
      .where(length(trim(col("text"))) > 0)
      .select(concat(element_at(TextStats.tokens(col("text")), 1),
        pmod(col("doc_id"), lit(10)).cast("string")).as("k"))
    graft.llm.Fuzzy.keyPairs(keyed, col("k"))
      .orderBy("key_a", "key_b")
  }

  val qFuzzyPairsSql: String =
    """WITH keys AS (
      |  SELECT DISTINCT
      |    (list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> len(x) > 0))[1] || (doc_id % 10)::VARCHAR AS k
      |  FROM documents WHERE length(trim(text)) > 0)
      |SELECT a.k AS key_a, b.k AS key_b
      |FROM keys a JOIN keys b ON a.k < b.k AND levenshtein(a.k, b.k) <= 1
      |ORDER BY key_a, key_b""".stripMargin

  /** q_rolling — per-user 3-event moving average of event value (sliding
    * ROW frame over a keyed window): the smoothing/trend primitive.
    * Partitioned by user — per-group sort only, scales with group count.
    */
  val qRolling: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(-2, 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        round(avg("value").over(w), 6).as("mavg"))
      .orderBy("event_id")
  }

  val qRollingSql: String =
    """SELECT event_id, user_id,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
      |FROM events ORDER BY event_id""".stripMargin

  /** q_label_centroids — element-wise mean embedding per label (the
    * class-prototype primitive behind centroid classifiers and drift
    * checks): posexplode + partial-aggregated groupBy(label, pos) — the
    * shuffle carries labels × dims rows per partition, never vectors.
    */
  val qLabelCentroids: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(round(avg(col("x").cast("double")), 6).as("m"))
      .select(col("label"), col("pos").cast("long").as("pos"), col("m"))
      .orderBy("label", "pos")

  val qLabelCentroidsSql: String =
    """SELECT label, i - 1 AS pos, round(avg(embedding[i]::DOUBLE), 6) AS m
      |FROM (SELECT label, unnest(range(1, len(embedding) + 1)) AS i,
      |        embedding
      |      FROM embeddings)
      |GROUP BY label, i ORDER BY label, pos""".stripMargin

  /** q_hist — fixed-width histogram of document length (width 25 from
    * origin 0: purely arithmetic binning, no corpus scalars, so the
    * binning is a narrow map and the agg is one partial-agg'd shuffle).
    */
  val HistWidth = 25L

  val qHist: Q = (s, dir) =>
    Tables.documents(s, dir)
      .groupBy((col("n_chars") / HistWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")

  val qHistSql: String =
    s"""SELECT (n_chars // $HistWidth)::BIGINT AS bin, count(*) AS n
      |FROM documents GROUP BY bin ORDER BY bin""".stripMargin

  /** q_dsir — DSIR importance weights against the English slice as the
    * target domain: documents whose token mix looks like the target score
    * positive. See [[graft.llm.Dsir]] for the model and scale shape.
    */
  val qDsir: Q = (s, dir) =>
    graft.llm.Dsir.weights(Tables.documents(s, dir), col("doc_id"),
      col("text"), col("lang") === "en")
      .select(col("id").as("doc_id"), col("weight"))
      .orderBy("doc_id")

  val qDsirSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, list_filter(
      |    regexp_split_to_array(trim(lower(text)), '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |occ AS (SELECT doc_id, lang, unnest(t) AS w FROM toks),
      |cr AS (SELECT w, count(*) AS c FROM occ GROUP BY w),
      |ct AS (SELECT w, count(*) AS c FROM occ WHERE lang = 'en' GROUP BY w),
      |s AS (SELECT (SELECT count(*) FROM occ) AS nr,
      |             (SELECT count(*) FROM occ WHERE lang = 'en') AS nt,
      |             (SELECT count(*) FROM cr) AS v),
      |wt AS (
      |  SELECT cr.w,
      |    ln((coalesce(ct.c, 0) + 1)::DOUBLE / (nt + v))
      |      - ln((cr.c + 1)::DOUBLE / (nr + v)) AS lw
      |  FROM cr LEFT JOIN ct USING (w), s)
      |SELECT doc_id, round(avg(lw), 4) + 0 AS weight
      |FROM occ JOIN wt USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q_pipeline_e2e — the curation pipeline composed end-to-end: exact
    * dedup (keep first) → quality gate (≥ 0.86 on the 6-dp score) →
    * train/val/test split → per-bucket manifest (docs + tokens). Every
    * stage is an already-oracle-checked operator; the oracle here is the
    * same composition assembled from those queries' SQL fragments —
    * proving the pieces compose without semantic drift.
    */
  val PipelineQualityMin = 0.86

  val qPipelineE2e: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val deduped = graft.llm.Dedup.exact(docs, col("text"), col("doc_id"))
    val kept = deduped
      .join(QueriesLlm.qualityOf(deduped), "doc_id")
      .where(col("quality") >= PipelineQualityMin)
    kept.select(
        graft.llm.Mixing.splitBucket(col("doc_id"), SplitBuckets).as("bucket"),
        graft.llm.TextStats.tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("bucket")
  }

  val qPipelineE2eSql: String = {
    val qualityOnDedup = QueriesLlm.qQualitySql
      .replace("FROM documents", "FROM dedup")
      .replace("ORDER BY doc_id", "")
    val h8 = graft.llm.Mixing.rateToHex(0.8)
    val h9 = graft.llm.Mixing.rateToHex(0.9)
    val d = graft.llm.Mixing.HexDigits
    s"""WITH dedup AS (
      |  SELECT d.doc_id, d.text FROM documents d
      |  JOIN (SELECT md5(text) AS h, min(doc_id) AS keep
      |        FROM documents GROUP BY md5(text)) k
      |    ON md5(d.text) = k.h AND d.doc_id = k.keep),
      |qual AS ($qualityOnDedup),
      |kept AS (
      |  SELECT dedup.doc_id, dedup.text FROM dedup JOIN qual USING (doc_id)
      |  WHERE quality >= $PipelineQualityMin),
      |bt AS (
      |  SELECT
      |    CASE WHEN substr(md5(doc_id::VARCHAR), 1, $d) < '$h8' THEN 'train'
      |         WHEN substr(md5(doc_id::VARCHAR), 1, $d) < '$h9' THEN 'val'
      |         ELSE 'test' END AS bucket,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
      |  FROM kept)
      |SELECT bucket, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens
      |FROM bt GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** q_ctfidf — class-based TF-IDF (the BERTopic c-TF-IDF shape): the 5
    * most DISTINCTIVE terms per source, scored tf(t, source) · ln(1 + A /
    * f(t)) with f(t) the corpus term count and A the mean tokens per
    * source. Complements q_tfidf (per-document keywords) with per-GROUP
    * topic profiles. Two partial-aggregated counts + a broadcast term-
    * total join + a group-partitioned rank; one corpus scalar (A).
    */
  val qCtfidf: Q = (s, dir) => {
    import graft.llm.TextStats
    val occ = Tables.documents(s, dir)
      .select(col("source"), explode(TextStats.tokens(lower(col("text")))).as("term"))
    val tf = occ.groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val tot = tf.groupBy("term").agg(sum("tf").as("f"))
    // A (mean tokens per source) as a one-row broadcast INSIDE the plan
    // (round 14, guide §1.2): the r13 shape ran TWO extra driver actions
    // — a distinct-source count and a token count, each a whole
    // tokenize pass over the corpus — for one scalar the main job can
    // compute itself. Same arithmetic: count/countDistinct over occ
    // equals occ.count / distinct sources (tf groups occ's rows, so the
    // source sets agree), double division as before.
    val aDf = occ.agg((count(lit(1)).cast("double") /
      countDistinct("source").cast("double")).as("_a"))
    val scored = tf.join(broadcast(tot), "term")
      .crossJoin(broadcast(aDf))
      .withColumn("score",
        round(col("tf") * log(lit(1d) + col("_a") / col("f")), 6))
    graft.operators.TopK.perGroup(scored, col("source"), col("score"),
      col("term"), k = 5)
      .select(col("source"), col("rk").cast("long").as("rk"), col("term"),
        col("score"))
      .orderBy("source", "rk")
  }

  val qCtfidfSql: String =
    """WITH occ AS (
      |  SELECT source, unnest(list_filter(
      |    regexp_split_to_array(trim(lower(text)), '\s+'),
      |    x -> len(x) > 0)) AS term
      |  FROM documents WHERE length(trim(text)) > 0),
      |tf AS (SELECT source, term, count(*) AS tf FROM occ GROUP BY source, term),
      |tot AS (SELECT term, sum(tf)::BIGINT AS f FROM tf GROUP BY term),
      |a AS (SELECT (SELECT count(*) FROM occ)::DOUBLE
      |             / (SELECT count(DISTINCT source) FROM tf) AS a),
      |scored AS (
      |  SELECT source, term, round(tf * ln(1 + a.a / f), 6) AS score
      |  FROM tf JOIN tot USING (term), a)
      |SELECT source, rk, term, score FROM (
      |  SELECT source, term, score,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY score DESC, term) AS rk
      |  FROM scored)
      |WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  /** q_funnel — ordered-stage conversion funnel over event time: users
    * whose first view precedes a click precedes a purchase (strictly
    * increasing ns timestamps). Three keyed min-aggregations + two
    * same-key joins — every shuffle is on user_id, so the stages
    * co-partition and the funnel scales with user count. Times compared
    * in raw nanoseconds on both engines.
    */
  val qFunnel: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    def firstAfter(evType: String, prev: org.apache.spark.sql.DataFrame,
        prevTs: String, out: String) =
      ev.where(col("event_type") === evType)
        .join(prev, "user_id")
        .where(col("ts_ns") > col(prevTs))
        .groupBy("user_id").agg(min("ts_ns").as(out))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("t1"))
    val c = firstAfter("click", v, "t1", "t2")
    val p = firstAfter("purchase", c, "t2", "t3")
    val stages = Seq(("1_view", v), ("2_click", c), ("3_purchase", p))
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("stage"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("stage")
  }

  val qFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2
      |  GROUP BY e.user_id)
      |SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |UNION ALL SELECT '2_click', count(*) FROM c
      |UNION ALL SELECT '3_purchase', count(*) FROM p
      |ORDER BY stage""".stripMargin

  /** q_cohort — retention matrix: users grouped by first-activity day
    * (cohort), counted per day-offset of later activity. Day arithmetic
    * on raw ns epochs (86 400e9) keeps both engines on exact integer
    * math — no timezone or truncation semantics in play.
    */
  val qCohort: Q = (s, dir) => {
    // integral div — long `/` is double division and ns epochs exceed 2^53
    // (the Tables.normalizeEventTs precedent)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
    ev.join(first, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  val qCohortSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
      |cohorts AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id)
      |SELECT cohort, day - cohort AS day_offset, count(DISTINCT user_id) AS n_users
      |FROM ev JOIN cohorts USING (user_id)
      |GROUP BY cohort, day_offset ORDER BY cohort, day_offset""".stripMargin

  /** q_pagerank — join-based PageRank (3 damped power-iteration steps,
    * 9-dp rounding per update on both engines) over a deterministic
    * synthetic link graph: every document links to (id·13+7) mod N and
    * (id·29+1) mod N — two out-links each, ids 0..N−1 contiguous by
    * construction of the corpus. The oracle unrolls the same iterations.
    */
  val PrIters = 3
  val PrDamping = 0.85

  val qPagerank: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val nodes = docs.select(col("doc_id").as("id"))
    val edges = nodes.select(col("id").as("src"),
        pmod(col("id") * 13 + 7, lit(n)).as("dst"))
      .unionByName(nodes.select(col("id").as("src"),
        pmod(col("id") * 29 + 1, lit(n)).as("dst")))
    graft.operators.PageRank.run(nodes, edges, PrIters, PrDamping)
      .select(col("id").as("doc_id"), col("r").as("pr"))
      .orderBy("doc_id")
  }

  val qPagerankSql: String = {
    val iterBlocks = (1 to PrIters).map { t =>
      val p = s"r${t - 1}"
      s"""c$t AS (
         |  SELECT e.dst AS id, sum(r.r / e.deg) AS s
         |  FROM edges e JOIN $p r ON e.src = r.id GROUP BY e.dst),
         |r$t AS (
         |  SELECT n.id,
         |    round((1 - $PrDamping) / nn.n + $PrDamping * coalesce(c$t.s, 0), 9) AS r
         |  FROM nodes n LEFT JOIN c$t USING (id), nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
       |e0 AS (
       |  SELECT id AS src, (id * 13 + 7) % (SELECT count(*) FROM nodes) AS dst FROM nodes
       |  UNION ALL
       |  SELECT id, (id * 29 + 1) % (SELECT count(*) FROM nodes) FROM nodes),
       |deg AS (SELECT src, count(*)::DOUBLE AS deg FROM e0 GROUP BY src),
       |edges AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
       |r0 AS (SELECT id, round(1.0 / nn.n, 9) AS r FROM nodes, nn),
       |$iterBlocks
       |SELECT id AS doc_id, r AS pr FROM r$PrIters ORDER BY doc_id""".stripMargin
  }

  /** q_group_sample — exactly-k-per-stratum deterministic sample: rank
    * each source's documents by the md5 hash surrogate (the [[graft.llm
    * .Mixing]] uniform key) and keep the 10 smallest — fixed-size
    * per-group sampling that is reproducible across engines and layouts,
    * where rate-based gates ([[graft.llm.Mixing.stratifiedSample]]) give
    * binomial counts.
    */
  val qGroupSample: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("hp", "doc_id")
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        graft.llm.Mixing.hashPrefix(col("doc_id")).as("hp"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("source"), col("rk").cast("long").as("rk"), col("doc_id"))
      .orderBy("source", "rk")
  }

  val qGroupSampleSql: String = {
    val d = graft.llm.Mixing.HexDigits
    s"""SELECT source, rk, doc_id FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY substr(md5(doc_id::VARCHAR), 1, $d), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 10 ORDER BY source, rk""".stripMargin
  }

  /** q_dedup_rate — per-source duplication report: documents, distinct
    * texts, and duplicate fraction — the dataset-card statistic behind
    * "source X is 40% mirrors". Digest-grouped exact counts, partial-
    * aggregated; text never shuffles (md5 only).
    */
  val qDedupRate: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("source"), md5(col("text").cast("binary")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("h").as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        round((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs"), 6)
          .as("dup_frac"))
      .orderBy("source")

  val qDedupRateSql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(text)) AS n_distinct,
      |  round((count(*) - count(DISTINCT md5(text)))::DOUBLE / count(*), 6) AS dup_frac
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q_mix_weights — the training-mixture table: per-source doc/token
    * counts and the α = 0.5 temperature-scaled sampling weight
    * ([[Mixing.temperatureWeights]]). Weights round to 6 dp (the scalar
    * normalizer divides a sum whose accumulation order differs across
    * engines at the ulp level).
    */
  val qMixWeights: Q = (s, dir) =>
    Mixing.temperatureWeights(Tables.documents(s, dir), col("source"),
        size(graft.llm.TextStats.tokens(col("text"))), alpha = 0.5)
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("weight"), 6).as("weight"))
      .orderBy("stratum")

  val qMixWeightsSql: String =
    """WITH per AS (
      |  SELECT source AS stratum, count(*) AS n_docs,
      |    sum(CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::BIGINT AS n_tokens
      |  FROM documents GROUP BY source),
      |d AS (SELECT sum(pow(n_tokens, 0.5)) AS denom FROM per)
      |SELECT stratum, n_docs, n_tokens,
      |  round(pow(n_tokens, 0.5) / denom, 6) AS weight
      |FROM per, d ORDER BY stratum""".stripMargin

  /** q_zipf — Zipf head profile ([[Vocab.zipfProfile]]): top-50 tokens
    * with corpus share and cumulative share; rank/cum windows run over the
    * ≤ 50 post-limit rows.
    */
  val qZipf: Q = (s, dir) =>
    Vocab.zipfProfile(Tables.documents(s, dir), col("text"), 50)
      .select(col("rank").cast("long").as("rank"), col("token"), col("cnt"),
        round(col("share"), 6).as("share"),
        round(col("cum_share"), 6).as("cum_share"))
      .orderBy("rank")

  val qZipfSql: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |    x -> len(x) > 0)) AS token
      |  FROM documents WHERE length(trim(text)) > 0),
      |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
      |tot AS (SELECT sum(cnt)::DOUBLE AS t FROM c),
      |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 50)
      |SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank, token, cnt,
      |  round(cnt / t, 6) AS share,
      |  round(sum(cnt) OVER (ORDER BY cnt DESC, token
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t, 6) AS cum_share
      |FROM top, tot ORDER BY rank""".stripMargin

  /** q_bpe_merges — first-iteration BPE pair counts
    * ([[Vocab.bpePairCounts]]): top-20 adjacent character pairs by
    * occurrence-weighted corpus frequency (ties → pair asc).
    */
  val qBpeMerges: Q = (s, dir) =>
    Vocab.bpePairCounts(Tables.documents(s, dir), col("text"), 20)
      .orderBy(col("cnt").desc, col("pair"))

  val qBpeMergesSql: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |    x -> len(x) > 0)) AS token
      |  FROM documents WHERE length(trim(text)) > 0),
      |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
      |p AS (SELECT unnest(list_transform(range(1, length(token)),
      |        i -> substr(token, i, 2))) AS pair, cnt
      |      FROM c WHERE length(token) >= 2)
      |SELECT pair, sum(cnt)::BIGINT AS cnt FROM p GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  def all: Map[String, Q] = Map(
    "q_mix_weights" -> qMixWeights,
    "q_zipf" -> qZipf,
    "q_bpe_merges" -> qBpeMerges,
    "q_group_sample" -> qGroupSample,
    "q_dedup_rate" -> qDedupRate,
    "q_pagerank" -> qPagerank,
    "q_funnel" -> qFunnel,
    "q_cohort" -> qCohort,
    "q_ctfidf" -> qCtfidf,
    "q_pipeline_e2e" -> qPipelineE2e,
    "q_dsir" -> qDsir,
    "q_rolling" -> qRolling,
    "q_label_centroids" -> qLabelCentroids,
    "q_hist" -> qHist,
    "q_fuzzy_pairs" -> qFuzzyPairs,
    "q_event_convert" -> qEventConvert,
    "q_bm25" -> qBm25,
    "q_split" -> qSplit,
    "q_leak_split" -> qLeakSplit,
    "q_seq_split" -> qSeqSplit,
    "q_shuffle_pack" -> qShufflePack,
    "q_shuffle_order" -> qShuffleOrder,
    "q_cube_stats" -> qCubeStats,
    "q_vocab" -> qVocab,
    "q_token_ids" -> qTokenIds,
    "q_normalize" -> qNormalize,
    "q_snapshot_diff" -> qSnapshotDiff,
    "q_merge_upsert" -> qMergeUpsert,
    "q_skew_join" -> qSkewJoin,
    "q_top_per_group" -> qTopPerGroup,
    "q_quality_filter" -> qQualityFilter)

  def oracles: Map[String, String] = Map(
    "q_mix_weights" -> qMixWeightsSql,
    "q_zipf" -> qZipfSql,
    "q_bpe_merges" -> qBpeMergesSql,
    "q_group_sample" -> qGroupSampleSql,
    "q_dedup_rate" -> qDedupRateSql,
    "q_pagerank" -> qPagerankSql,
    "q_funnel" -> qFunnelSql,
    "q_cohort" -> qCohortSql,
    "q_ctfidf" -> qCtfidfSql,
    "q_pipeline_e2e" -> qPipelineE2eSql,
    "q_dsir" -> qDsirSql,
    "q_rolling" -> qRollingSql,
    "q_label_centroids" -> qLabelCentroidsSql,
    "q_hist" -> qHistSql,
    "q_fuzzy_pairs" -> qFuzzyPairsSql,
    "q_event_convert" -> qEventConvertSql,
    "q_bm25" -> qBm25Sql,
    "q_split" -> qSplitSql,
    "q_leak_split" -> qLeakSplitSql,
    "q_seq_split" -> qSeqSplitSql,
    "q_shuffle_pack" -> qShufflePackSql,
    "q_shuffle_order" -> qShuffleOrderSql,
    "q_cube_stats" -> qCubeStatsSql,
    "q_vocab" -> qVocabSql,
    "q_token_ids" -> qTokenIdsSql,
    "q_normalize" -> qNormalizeSql,
    "q_snapshot_diff" -> qSnapshotDiffSql,
    "q_merge_upsert" -> qMergeUpsertSql,
    "q_skew_join" -> qSkewJoinSql,
    "q_top_per_group" -> qTopPerGroupSql,
    "q_quality_filter" -> qQualityFilterSql)
}

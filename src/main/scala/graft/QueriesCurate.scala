package graft

import org.apache.spark.sql.functions._
import graft.llm.{Normalize, Snapshot, Vocab}
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
    * over the SAME 6-dp-rounded quality values (the q_quality contract),
    * so the threshold agrees; quality values sit on the 1e-6 grid, far
    * from the interpolated threshold's ulp noise.
    */
  val qQualityFilter: Q = (s, dir) => {
    val q = QueriesLlm.qQuality(s, dir)
    // one scalar to the driver (like LangModel's V)
    val thr = q.agg(expr("percentile(quality, 0.75)")).head.getDouble(0)
    q.where(col("quality") >= thr).orderBy("doc_id")
  }

  val qQualityFilterSql: String = {
    val qualityCte = QueriesLlm.qQualitySql.replace("ORDER BY doc_id", "")
    s"""WITH qual AS ($qualityCte),
      |thr AS (SELECT quantile_cont(quality, 0.75) AS t FROM qual)
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

  def all: Map[String, Q] = Map(
    "q_shuffle_order" -> qShuffleOrder,
    "q_cube_stats" -> qCubeStats,
    "q_vocab" -> qVocab,
    "q_token_ids" -> qTokenIds,
    "q_normalize" -> qNormalize,
    "q_snapshot_diff" -> qSnapshotDiff,
    "q_skew_join" -> qSkewJoin,
    "q_top_per_group" -> qTopPerGroup,
    "q_quality_filter" -> qQualityFilter)

  def oracles: Map[String, String] = Map(
    "q_shuffle_order" -> qShuffleOrderSql,
    "q_cube_stats" -> qCubeStatsSql,
    "q_vocab" -> qVocabSql,
    "q_token_ids" -> qTokenIdsSql,
    "q_normalize" -> qNormalizeSql,
    "q_snapshot_diff" -> qSnapshotDiffSql,
    "q_skew_join" -> qSkewJoinSql,
    "q_top_per_group" -> qTopPerGroupSql,
    "q_quality_filter" -> qQualityFilterSql)
}

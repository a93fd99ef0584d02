package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary construction and tokenize-to-ids — the
  * front half of every LM training pipeline: build a token vocabulary from
  * corpus frequencies, then map documents to bounded integer id sequences
  * with out-of-vocabulary tokens folded to a reserved id (0).
  *
  * Scale design: the count table is one partial-aggregated groupBy (slim
  * (token, count) rows); the top-n cut is a TakeOrdered (sort + limit —
  * no full sort materializes). Ranking runs AFTER the limit, over ≤ n rows
  * — the same post-limit global window q_embed_topk pins as benign. The
  * id-mapping join broadcasts the vocabulary (a few KB), so tokenization
  * is a map-side join: per-document cost independent of corpus size, no
  * shuffle except the per-document rollup.
  *
  * Token convention: lowercased whitespace split, empty tokens dropped
  * ([[Dedup.shingleSet]] / [[ChunkDedup]] semantics; the oracle replicates
  * with list_filter over regexp_split_to_array).
  */
object Vocab {

  /** Top-`n` tokens by (count desc, token asc): (rank, token, cnt) with
    * rank contiguous from 1.
    */
  def build(df: DataFrame, text: Column, n: Int): DataFrame = {
    val counts = df
      .select(explode(TextStats.tokens(lower(text))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(n)
    // rank over the ≤ n post-limit rows (driver-bounded, not data-sized)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .select("rank", "token", "cnt")
  }

  /** Zipf head profile: [[build]]'s top-`n` vocabulary extended with each
    * token's share of the total corpus token mass and the running
    * cumulative share — the concentration curve ("the top 50 tokens cover
    * X% of the corpus") that sizes vocabulary budgets and flags
    * template-dominated corpora (a healthy natural-language head follows
    * share ∝ 1/rank; a scraped-boilerplate corpus front-loads far harder).
    *
    * Scale shape: [[build]]'s count-table + TakeOrdered; the corpus total
    * is a one-row scalar collect over the count table; share math and the
    * cumulative window run over the ≤ n post-limit rows only.
    */
  def zipfProfile(df: DataFrame, text: Column, n: Int): DataFrame = {
    val counts = df
      .select(explode(TextStats.tokens(lower(text))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt")).head().getLong(0).toDouble
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.orderBy(col("cnt").desc, col("token")).limit(n)
      .withColumn("rank", row_number().over(w))
      .withColumn("share", col("cnt").cast("double") / total)
      .withColumn("cum_share",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") / total)
      .select("rank", "token", "cnt", "share", "cum_share")
  }

  /** First-iteration BPE pair statistics: total corpus frequency of every
    * adjacent character pair, weighted by token occurrence counts — the
    * count table whose argmax is byte-pair encoding's first merge, and
    * collectively the signal tokenizer-training data work reads to judge
    * corpus character health (alphabet mix, transliteration noise).
    *
    * Scale shape: the corpus-sized pass is the [[build]] token count (one
    * partial-aggregated groupBy of slim (token, cnt) rows); pair
    * explosion runs on the DISTINCT-token vocabulary — bounded by
    * vocabulary size, not corpus size — weighted by the counts, then one
    * tiny (pair, cnt) aggregate and a TakeOrdered head.
    */
  def bpePairCounts(df: DataFrame, text: Column, n: Int): DataFrame = {
    val counts = df
      .select(explode(TextStats.tokens(lower(text))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    counts
      .where(length(col("token")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), length(col("token")) - 1),
          i => col("token").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(n)
  }

  /** Map each document to its vocabulary-id sequence: (id, n_tok, n_oov,
    * ids_md5) where ids_md5 digests the comma-joined id sequence in token
    * order (OOV → 0) and is NULL for token-less documents.
    *
    * Single narrow pass: the vocabulary (driver-bounded by construction —
    * [[build]]'s top-n) is collected to a map and broadcast; each document
    * is tokenized, id-mapped, and digested in one kernel call. The
    * previous form (posexplode → broadcast-join → collect_list regroup)
    * was correct but shuffled O(corpus tokens) rows to regroup them; this
    * shuffles nothing — the per-document cost is independent of corpus
    * size and the output is one slim row per document.
    *
    * Tokenization parity with the column algebra is exact by using the
    * same primitives Spark's `lower`/`trim`/`split` evaluate to
    * (UTF8String case/space-trim semantics, regex split with limit -1);
    * VocabSpec pins kernel ≡ column-algebra on the corpus plus edge cases.
    */
  def tokenIds(df: DataFrame, id: Column, text: Column,
      vocab: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val vmap: Map[String, Int] = vocab.select(col("token"), col("rank"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val bc = sc.broadcast(vmap)
    val kernel = udf { (t: String) =>
      if (t == null) (0L, 0L, null: String)
      else {
        // exactly trim(lower(text)) in Spark semantics: UTF8String
        // lowercase + space-only (0x20) trim — NOT java.lang.String.trim,
        // which also strips control chars and would change tokenization
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(t)
          .toLowerCase.trim.toString
        if (s.isEmpty) (0L, 0L, null: String)
        else {
          // Spark's split(col, regex) is limit -1: trailing empty tokens
          // (text ending in non-space whitespace) are kept, like the
          // column form
          val toks = s.split("\\s+", -1)
          val m = bc.value
          var oov = 0L
          val sb = new java.lang.StringBuilder(toks.length * 3)
          var i = 0
          while (i < toks.length) {
            val tid = m.getOrElse(toks(i), 0)
            if (tid == 0) oov += 1
            if (i > 0) sb.append(',')
            sb.append(tid)
            i += 1
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val hex = new java.lang.StringBuilder(32)
          digest.foreach(b => hex.append(f"${b & 0xff}%02x"))
          (toks.length.toLong, oov, hex.toString)
        }
      }
    }
    df.select(id.as("id"), kernel(text).as("k"))
      .select(col("id"), col("k._1").as("n_tok"), col("k._2").as("n_oov"),
        col("k._3").as("ids_md5"))
  }
}

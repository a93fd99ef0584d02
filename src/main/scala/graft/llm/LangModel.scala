package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistical language-model quality signals. [[TextStats
  * .unigramLogProb]] scores a document by how typical its words are of the
  * corpus; the bigram form here scores how typical its word TRANSITIONS
  * are — garbled or shuffled text keeps a normal unigram profile but
  * collapses under a bigram model, which is why perplexity-style filters
  * (CCNet's KenLM stage) dominate quality pipelines.
  *
  * Model: add-one (Laplace) smoothed conditional bigram probability,
  *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V),
  * with c(·) corpus counts and V the distinct-unigram vocabulary size. The
  * per-document score is the mean log-probability over its bigrams.
  *
  * Scale design: two partial-aggregated groupBys build the model (unigram
  * and bigram count tables — slim (token[s], count) rows); scoring is one
  * sort-merge join of the document bigram stream against each table, then a
  * per-doc average. No vocabulary or model ever collects to the driver
  * except V itself (one scalar). Token arrays stay inside a per-document
  * zip_with — the quadratic-prone explode-then-self-join-on-position shape
  * is avoided.
  *
  * Tokenization = [[TextStats.tokens]] over lowercased text, exactly the
  * unigram scorer's convention (empty edge fields included — pinned by the
  * q_unigram_logprob oracle).
  */
object LangModel {

  /** Per-document mean smoothed bigram log-probability: (id, logprob).
    * Documents with fewer than two tokens have no bigrams and are omitted
    * (same contract as unigramLogProb on token-less documents).
    */
  def bigramLogProb(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tl = df.select(id.as("id"), TextStats.tokens(lower(text)).as("t"))
    val uni = tl.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    // V (distinct vocabulary size) as a one-row broadcast INSIDE the
    // plan (round 14, guide §1.2): the r13 shape ran uni.count() as a
    // separate driver action — a whole extra tokenize + aggregate pass
    // over the corpus per invocation — for one scalar the main job can
    // compute itself. Same double (count cast to double), same
    // arithmetic downstream.
    val vDf = uni.agg(count(lit(1)).cast("double").as("_v"))
    val bg = tl.where(size(col("t")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    bg.join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vDf))
      .groupBy("id")
      .agg(avg(log((col("cb") + 1).cast("double") / (col("cu") + col("_v"))))
        .as("logprob"))
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus — the scoring function behind
  * "find the training documents most relevant to this query", used for
  * targeted decontamination sweeps, eval-adjacent data audits, and
  * retrieval-based curation (DSIR-style importance sampling starts from
  * exactly this shape).
  *
  * Model (Lucene's BM25 variant, k1/b the standard 1.2/0.75):
  *   idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)
  *   score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Scale design: the token stream is FILTERED TO THE QUERY TERMS before
  * any aggregation — the tf table is |query terms| × |matching docs|
  * rows, not corpus-sized. Document length comes from the flat-string
  * token counter (no second explode). The only corpus-wide state is two
  * scalars (N, avgdl). Scores round to 4 dp before ranking (the
  * bigram-logprob convention: ln and summation order differ at the ulp
  * level across engines); ties break by id ascending.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Top-`topK` documents for `queryTerms`: (id, score), score 4-dp. */
  def topDocs(docs: DataFrame, id: Column, text: Column,
      queryTerms: Seq[String], topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = docs.select(id.as("id"),
      TextStats.tokens(lower(text)).as("t"),
      TextStats.tokenCount(text).cast("double").as("dl"))

    // two corpus scalars — the only driver-side state; avgdl averages over
    // ALL documents (token-less docs count as length 0)
    val Array(nDocs, avgdl) = {
      val r = base.agg(count(lit(1)).cast("double"), avg(col("dl"))).head
      Array(r.getDouble(0), r.getDouble(1))
    }

    val tf = base
      .select(col("id"), col("dl"), explode(col("t")).as("term"))
      .where(col("term").isin(queryTerms: _*)) // prune BEFORE the shuffle
      .groupBy("id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfTable = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))

    tf.join(broadcast(dfTable), "term")
      .withColumn("idf", log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("part",
        col("idf") * col("tf") * (K1 + 1) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / avgdl)))
      .groupBy("id").agg(round(sum("part"), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}

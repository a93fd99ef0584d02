package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the top-k terms of each document scored by
  * `tf · ln(N / df)` — the standard relevance signal for corpus topic
  * profiling, domain tagging, and quality triage in a training-data
  * pipeline.
  *
  * Scale design: the token table (one row per occurrence) exists only as
  * an exploded stream feeding a partial-aggregated `groupBy(id, term)` —
  * the map-side combine collapses per-document repeats before the one
  * unavoidable shuffle on (id, term). The document-frequency table is one
  * further partial-agg'd pass over the (already much smaller) tf table,
  * and joins back BROADCAST: a real-corpus vocabulary is millions of
  * terms × ~16 bytes — megabytes against a 100 TB corpus (callers with a
  * pathological vocabulary can disable the hint and let AQE pick). The
  * final per-document top-k is a window over the tf table partitioned by
  * id — same key as the tf shuffle, so AQE/exchange-reuse keeps it to the
  * one existing partitioning.
  *
  * Scores are rounded to 6 dp BEFORE ranking so the rank order is a pure
  * function of (tf, df) with sub-ulp libm differences rounded away —
  * which is what lets a DuckDB oracle replay the ranking exactly; ties on
  * the rounded score break by term ascending.
  */
object TfIdf {

  /** (id, term) token stream: lowercased, whitespace-split, empties
    * dropped. Null/blank documents produce no rows.
    */
  def tokens(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"),
        explode(split(trim(lower(text)), "\\s+")).as("term"))
      .where(length(col("term")) > 0)

  /** Top-`k` terms per document: (id, rk, term, tf, score), `rk` 1-based
    * by score descending then term ascending.
    */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val tf = tokens(docs, id, text)
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfTable), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("id", "rk", "term", "tf", "score")
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level n-gram document-frequency — the boilerplate detector: the
  * n-grams that appear in the most documents are headers, footers, cookie
  * banners, license blurbs, template chrome. The top of this table is what
  * a C4-style cleaning pass strips and what a curator eyeballs first.
  *
  * Scale design: each document emits its DISTINCT n-grams once (the same
  * single-pass JVM kernel the MinHash prepare and decontamination stages
  * use — document frequency needs distinct-per-doc, which the kernel
  * already guarantees, so no per-doc `countDistinct` expand). The count is
  * one partial-agg'd groupBy on the gram — map-side combine collapses each
  * partition's repeats before the shuffle — and the top-k is a
  * TakeOrdered over the aggregated (gram, count) table, never a global
  * sort of the gram stream.
  */
object Boilerplate {

  private def shinglesUdf(n: Int) =
    udf { (text: String) => Dedup.shingleSet(text, n) }

  /** (gram, n_docs): how many documents contain each word n-gram. */
  def gramDocFrequency(docs: DataFrame, text: Column, n: Int): DataFrame =
    docs.select(explode(shinglesUdf(n)(text)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))

  /** The `k` most document-frequent n-grams, ties broken by gram
    * ascending (deterministic across engines and partitionings).
    */
  def topGrams(docs: DataFrame, text: Column, n: Int, k: Int): DataFrame =
    gramDocFrequency(docs, text, n)
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(k)
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A persisted term-bucketed inverted index — the text-retrieval
  * counterpart of the IVF-PQ vector layout: pay one indexing pass at
  * write time, then serve every retrieval query reading only the
  * buckets its terms hash into.
  *
  * Layout: postings (term, doc_id, tf, dl) land in `bucket=…`
  * directories keyed by `pmod(xxhash64(term), nBuckets)`; the corpus
  * scalars BM25 needs (N, avgdl) plus the bucket count live in an
  * underscore-prefixed sidecar the partitioned reader ignores.
  *
  * Scale design: the build is ONE tokenize+explode pass, one
  * (term, doc) groupBy with map-side combine, and the partitioned write
  * (its hash shuffle on `bucket` is the layout cost, paid once). A
  * query's bucket ids are computed by a |terms|-row Spark job (the same
  * codegen'd xxhash64 the writer used — no hand-rolled driver hash to
  * drift out of sync), so the serving scan carries a `bucket IN (…)`
  * PartitionFilter: unprobed directories are never listed or read, and
  * the residual `term IN (…)` predicate prunes within-bucket postings
  * via dictionary/stats pushdown. Scoring matches [[Bm25.topDocs]]
  * exactly (same Lucene-variant formula, 4-dp rounding, id tie-break) —
  * the layout changes the COST of a query, never its answer.
  */
object InvertedIndex {

  /** Build the index under `path`. Returns (nDocs, avgdl) for callers
    * that want the stats without re-reading the sidecar.
    */
  def write(docs: DataFrame, id: Column, text: Column, path: String,
      nBuckets: Int): (Double, Double) = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val base = docs.select(id.as("doc_id"),
      TextStats.tokens(lower(text)).as("t"),
      TextStats.tokenCount(text).cast("double").as("dl"))
    base.select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    val st = base.agg(count(lit(1)).cast("double").as("n_docs"),
      coalesce(avg(col("dl")), lit(0.0)).as("avgdl")).head()
    val (nDocs, avgdl) = (st.getDouble(0), st.getDouble(1))
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((nDocs, avgdl, nBuckets)).toDF("n_docs", "avgdl", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    (nDocs, avgdl)
  }

  /** The writer's bucket function, as a column — shared by the serving
    * path so reader and writer can never disagree on a term's bucket.
    */
  def bucketCol(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong)).cast("int")

  /** BM25 top-`topK` for `queryTerms` over the persisted index, reading
    * only the terms' buckets. df comes from the probed postings (exact:
    * every posting of a query term lives in that term's bucket).
    */
  def bm25TopK(spark: SparkSession, path: String, queryTerms: Seq[String],
      topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val st = spark.read.parquet(s"$path/_stats").head()
    val (nDocs, avgdl) = (st.getAs[Double]("n_docs"), st.getAs[Double]("avgdl"))
    val nBuckets = st.getAs[Int]("n_buckets")
    // |terms| rows through the same codegen'd hash the writer used
    import spark.implicits._
    val buckets = queryTerms.toDF("term")
      .select(bucketCol(col("term"), nBuckets)).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val post = spark.read.parquet(path)
      .where(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms: _*))
    val dfTable = post.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    post.join(broadcast(dfTable), "term")
      .withColumn("idf",
        log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("part",
        col("idf") * col("tf") * (Bm25.K1 + 1) /
          (col("tf") + lit(Bm25.K1) *
            (lit(1 - Bm25.B) + lit(Bm25.B) * col("dl") / avgdl)))
      .groupBy(col("doc_id").as("id"))
      .agg(round(sum("part"), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}

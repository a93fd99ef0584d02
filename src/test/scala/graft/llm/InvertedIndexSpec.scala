package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted-index layout: the served BM25 must equal direct scoring
  * row-for-row, the bucket partitioning must actually prune the read,
  * and writer/reader bucket hashing must agree by construction.
  */
class InvertedIndexSpec extends SparkSpec {

  private val terms = Seq("scan", "filter", "vector")

  test("served BM25 over the persisted index equals direct Bm25.topDocs") {
    val docs = graft.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("invidx").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), out, nBuckets = 16)
    val served = InvertedIndex.bm25TopK(spark, out, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    val direct = Bm25.topDocs(docs, col("doc_id"), col("text"), terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    assert(served.toSeq === direct.toSeq)
  }

  test("the serving scan reads only the query terms' buckets") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("invidx_prune").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), out, nBuckets = 16)
    val allBuckets = spark.read.parquet(out)
      .select("bucket").distinct().count()
    assert(allBuckets > 3, s"fixture should populate many buckets, got $allBuckets")
    // one-term query → exactly one bucket directory may be touched; prove
    // it from the files the filtered scan actually reads
    val oneTermBucket = Seq("scan").toDF("term")
      .select(InvertedIndex.bucketCol(col("term"), 16)).head().getInt(0)
    val touched = spark.read.parquet(out)
      .where(col("bucket") === oneTermBucket && col("term") === "scan")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .flatMap(f => "bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .distinct
    assert(touched.toSeq === Seq(oneTermBucket),
      s"expected only bucket $oneTermBucket touched, got ${touched.toSeq}")
  }

  test("writer and reader share one bucket function column") {
    import spark.implicits._
    // same term → same bucket via the shared column, for any bucket count
    for (n <- Seq(1, 4, 16, 64)) {
      val b = Seq("scan", "scan").toDF("term")
        .select(InvertedIndex.bucketCol(col("term"), n))
        .collect().map(_.getInt(0)).toSeq
      assert(b.distinct.size === 1 && b.head >= 0 && b.head < n)
    }
  }
}

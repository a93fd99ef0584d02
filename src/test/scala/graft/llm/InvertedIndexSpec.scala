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

  test("single-pass build stats are exact: observe metrics equal a direct corpus aggregate") {
    val docs = graft.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("invidx_stats").toString
    val (n, avgdl) = InvertedIndex.write(docs, col("doc_id"), col("text"), out, nBuckets = 8)
    val direct = docs.select(
      count(lit(1)).cast("double"),
      sum(TextStats.tokenCount(col("text")).cast("double"))).head()
    assert(n === direct.getDouble(0))
    // (n_docs, sum_dl) are integer-valued doubles → the one avgdl
    // division must land on the identical double
    assert(avgdl === direct.getDouble(1) / direct.getDouble(0))
    val st = InvertedIndex.readStats(spark, out)
    assert(st.nDocs === n && st.sumDl === direct.getDouble(1))
  }

  test("append of a delta serves identically to a full rebuild") {
    val docs = graft.Tables.documents(spark, sf)
    val base = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val delta = docs.where(pmod(col("doc_id"), lit(7)) === 0)
    val incr = java.nio.file.Files.createTempDirectory("invidx_incr").toString
    val full = java.nio.file.Files.createTempDirectory("invidx_full").toString
    InvertedIndex.write(base, col("doc_id"), col("text"), incr, nBuckets = 16)
    InvertedIndex.append(delta, col("doc_id"), col("text"), incr)
    InvertedIndex.write(docs, col("doc_id"), col("text"), full, nBuckets = 16)
    // sidecars equal bit-for-bit (exact integer-double arithmetic)
    val (si, sf2) = (InvertedIndex.readStats(spark, incr), InvertedIndex.readStats(spark, full))
    assert(si === sf2)
    // served results equal row-for-row, scores included
    val a = InvertedIndex.bm25TopK(spark, incr, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val b = InvertedIndex.bm25TopK(spark, full, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(a === b)
  }

  test("append cost is delta-proportional: the delta write touches only delta postings") {
    val docs = graft.Tables.documents(spark, sf)
    val base = docs.where(col("doc_id") >= 10)
    val delta = docs.where(col("doc_id") < 10)
    val out = java.nio.file.Files.createTempDirectory("invidx_delta").toString
    InvertedIndex.write(base, col("doc_id"), col("text"), out, nBuckets = 16)
    val before = allDataFiles(out).toSet
    InvertedIndex.append(delta, col("doc_id"), col("text"), out)
    val added = allDataFiles(out).toSet -- before
    // every pre-existing postings file is untouched; the new files hold
    // exactly the delta's docs
    assert(allDataFiles(out).toSet.intersect(before) === before)
    val newDocs = spark.read.parquet(added.toSeq: _*)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(newDocs === delta.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  private def allDataFiles(root: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        if (!f.getName.startsWith("_")) f.listFiles().foreach(walk)
      } else if (f.getName.endsWith(".parquet")) b += f.getAbsolutePath
    walk(new java.io.File(root))
    b.result()
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

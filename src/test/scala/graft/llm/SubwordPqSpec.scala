package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy subword segmentation + product quantization (round 7). */
class SubwordPqSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++ Seq("sp", "ar", "park", "ba", "tch")

  test("greedy longest-prefix segmentation: hand cases") {
    assert(Subword.tokenizeWord("spark", vocab.toSet, 5) ===
      Seq("sp", "ar", "k")) // "spark" itself not in vocab; "park" not a prefix
    assert(Subword.tokenizeWord("park", vocab.toSet, 5) === Seq("park"))
    assert(Subword.tokenizeWord("batch", vocab.toSet, 5) ===
      Seq("ba", "tch"))
    // char not in vocab still emits (single-char fallback)
    assert(Subword.tokenizeWord("x9z", vocab.toSet, 5) === Seq("x", "9", "z"))
  }

  test("pieceCounts aggregates per-occurrence, not per-distinct-word") {
    val docs = Seq((1L, "spark spark park"), (2L, "batch")).toDF("id", "text")
    val out = Subword.pieceCounts(docs, col("text"), vocab, topN = 10)
      .as[(String, Long)].collect().toMap
    assert(out("sp") === 2L) // two "spark" occurrences
    assert(out("park") === 1L)
    assert(out("ba") === 1L && out("tch") === 1L)
  }

  test("pieceCounts tokenization matches the column-algebra token stream") {
    val docs = Seq((1L, "  SPARK\tpark  "), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Subword.pieceCounts(docs, col("text"), vocab, topN = 10)
      .as[(String, Long)].collect().toMap
    // lowercased, whitespace-split: SPARK → sp ar k, park → park
    assert(out === Map("sp" -> 1L, "ar" -> 1L, "k" -> 1L, "park" -> 1L))
  }

  test("pq: fit + encode reconstruct separable clusters") {
    // 3 obvious clusters in each 2-dim subspace (m=2, dim=4)
    val rows = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array(c * 10f, c * 10f, (2 - c) * 10f, (2 - c) * 10f)
      (i, base.map(_ + (i % 5) * 0.01f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = ProductQuant.fit(df, col("vec_id"), col("embedding"),
      m = 2, k = 3, iters = 3)
    assert(cents.length === 2 && cents.forall(_.length === 3))
    val query = rows.head._2.toArray.map(_.toDouble)
    val top = ProductQuant.adcTopK(df, col("vec_id"), col("embedding"),
      cents, query, topK = 10).collect()
    assert(top.length === 10)
    // nearest by ADC must share vec 0's cluster pattern (i % 3 == 0)
    val topIds = top.map(_.getAs[Long]("id")).take(5)
    assert(topIds.forall(_ % 3 == 0L),
      s"ADC top-5 should be cluster-0 vectors, got ${topIds.toSeq}")
    // adc ascending, deterministic codes string shape "c0-c1"
    val adcs = top.map(_.getAs[Double]("adc"))
    assert(adcs.sameElements(adcs.sorted))
    assert(top.head.getAs[String]("codes").matches("\\d+-\\d+"))
  }

  test("adcFromCodes over stored codes equals the on-the-fly adcTopK ranking") {
    val rows = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array(c * 10f, c * 10f, (2 - c) * 10f, (2 - c) * 10f)
      (i, base.map(_ + (i % 5) * 0.01f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = ProductQuant.fit(df, col("vec_id"), col("embedding"),
      m = 2, k = 3, iters = 3)
    val query = rows.head._2.toArray.map(_.toDouble)
    // persist codes (the IVF-PQ layout column), score them back — the
    // serving path must rank identically to scoring raw vectors
    val out = java.nio.file.Files.createTempDirectory("pq_codes").toString
    ProductQuant.encode(df, col("vec_id"), col("embedding"), cents)
      .write.mode("overwrite").parquet(out)
    val fromCodes = ProductQuant.adcFromCodes(spark.read.parquet(out),
        col("id"), col("codes"), cents, query, topK = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("adc")))
    val onTheFly = ProductQuant.adcTopK(df, col("vec_id"), col("embedding"),
        cents, query, topK = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("adc")))
    assert(fromCodes.toSeq === onTheFly.toSeq)
  }

  test("fertility by group: closed-form pieces-per-word") {
    val docs = Seq((1L, "spark spark", "en"), (2L, "batch", "de"))
      .toDF("id", "text", "lang")
    val out = Subword.fertilityByGroup(docs, col("lang"), col("text"), vocab)
      .orderBy("lang").collect()
    // "spark" → sp|ar|k (3 pieces) twice; "batch" → ba|tch (2 pieces)
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq ===
      Seq(("de", 1L, 2L, 2.0), ("en", 2L, 6L, 3.0)))
  }

  test("pq distortion: zero for vectors that ARE the codebook entries") {
    // 3 distinct vectors, k=3 codebooks per subspace, 0 iterations →
    // seeds are the raw vectors themselves → qerr must be exactly 0
    val rows = Seq(
      (0L, Seq(1f, 2f, 3f, 4f)),
      (1L, Seq(5f, 6f, 7f, 8f)),
      (2L, Seq(9f, 10f, 11f, 12f))).map { case (i, v) => (i, v, (i % 2).toInt) }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = ProductQuant.fit(df, col("vec_id"), col("embedding"),
      m = 2, k = 3, iters = 0)
    val out = ProductQuant.distortionByGroup(df, col("label"),
      col("embedding"), cents).orderBy("label").collect()
    assert(out.map(_.getAs[Double]("avg_qerr")).forall(_ === 0.0), out.toSeq.toString)
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(2L, 1L))
  }

  test("pq fit is deterministic across invocations") {
    val emb = graft.Tables.embeddings(spark, sf)
    val c1 = ProductQuant.fit(emb, col("vec_id"), col("embedding"), 4, 16, 2)
    val c2 = ProductQuant.fit(emb, col("vec_id"), col("embedding"), 4, 16, 2)
    assert(c1.flatten.flatten.toSeq === c2.flatten.flatten.toSeq)
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that share
  * a word n-gram with an evaluation/benchmark set — the standard guard
  * against test-set leakage in LLM training corpora (the GPT-3 appendix-C
  * recipe: any 8-to-13-gram collision with a benchmark example marks the
  * training document contaminated).
  *
  * Scale design (100 TB corpus, benchmark ≪ corpus): the benchmark n-gram
  * set is inherently small — benchmarks are thousands of examples, not
  * terabytes — so it is DISTINCT-ed and broadcast. The corpus side explodes
  * its n-grams once, map-side inner-joins against the broadcast set (no
  * shuffle of corpus data), and only the surviving HITS — (id, gram) pairs,
  * empty for every clean document — reach the one real shuffle, the per-doc
  * count. The flag join-back is left un-hinted: hits are tiny in the sane
  * case (AQE broadcasts them); if a pathological corpus overlaps the
  * benchmark everywhere, a shuffle join on id is the only correct plan
  * anyway and Spark falls back to it.
  */
object Decontaminate {

  /** Per-document contamination counts against `bench`: one row per corpus
    * document with the number of distinct benchmark n-grams it contains and
    * a 0/1 flag. Documents shorter than `n` tokens have no n-grams and are
    * always clean.
    */
  def contaminationCounts(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int = 8): DataFrame = {
    val hits = contaminationHits(docs, id, text, bench, benchText, n)
    docs.select(id.as("id"))
      .join(hits, col("id") === hits(HitId), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  /** Training set with contaminated documents removed (broadcast anti-join
    * against the hit ids — the shape that drops straight into a pipeline).
    */
  def removeContaminated(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int = 8): DataFrame = {
    val hits = contaminationHits(docs, id, text, bench, benchText, n)
    docs.join(hits, id === hits(HitId), "left_anti")
  }

  /** Collision-proof internal name for the hits-side id: callers' `docs`
    * routinely already carry an `id` column, and a bare `col("id")` join
    * condition would resolve against the wrong side (or ambiguously).
    */
  private val HitId = "_decon_id"

  /** Distinct word n-grams via the JVM kernel shared with the MinHash
    * prepare stage (Dedup.shingleSet): Spark's array higher-order functions
    * evaluate interpreted at ~1 ms per ~100-token document — at corpus
    * scale the gram pass must be a primitive-typed scan, not a
    * sequence/transform/slice chain.
    */
  private def shinglesUdf(n: Int) =
    udf { (text: String) => Dedup.shingleSet(text, n) }

  /** Embedding-space decontamination: for every corpus vector, its maximum
    * cosine similarity against a small benchmark/eval vector set, plus a
    * 0/1 contamination flag at `threshold` — the semantic complement of
    * the n-gram path above (paraphrased or re-worded benchmark leakage
    * shares no 8-gram but sits close in embedding space; SemDeDup-style
    * pipelines run both).
    *
    * Scale shape: the benchmark set is collected and broadcast (BOUNDED BY
    * CONTRACT — benchmarks are thousands of vectors, the same smallness
    * assumption the n-gram path's broadcast join makes; the collect is the
    * [[Similarity.assignClusters]] centroid pattern). The corpus side is
    * then a NARROW map — one kernel per row, no join, no shuffle of
    * anything: cost n·|bench| multiply-adds, embarrassingly parallel at
    * any corpus size. Similarities are rounded to 6 dp inside the kernel
    * (BigDecimal HALF_UP — bit-identical to Spark's and DuckDB's round())
    * BEFORE the max/threshold, the cross-engine argmax discipline.
    */
  /** Hard ceiling on the broadcast benchmark-vector collect below: the
    * set is small BY CONTRACT (benchmarks are thousands of examples),
    * and this bound turns a misuse (pointing `bench` at a corpus-sized
    * relation) into a loud error instead of a driver OOM — the
    * [[Similarity.DefaultMaxAnchors]] discipline. Override with a
    * conscious `graft.decontaminate.maxBenchRows` spark conf when a
    * genuinely larger eval set is intended.
    */
  val DefaultMaxBenchRows = 100000

  def embeddingContamination(corpus: DataFrame, id: Column, vec: Column,
      bench: DataFrame, benchVec: Column, threshold: Double): DataFrame = {
    import graft.llm.Similarity
    val maxRows = corpus.sparkSession.conf
      .getOption("graft.decontaminate.maxBenchRows")
      .map(_.toInt).getOrElse(DefaultMaxBenchRows)
    val benchVecs: Array[Array[Double]] = bench
      .select(Similarity.normalized(benchVec).as("bv"))
      .limit(maxRows + 1)
      .collect().map(_.getSeq[Double](0).toArray)
    require(benchVecs.length <= maxRows,
      s"embeddingContamination: benchmark set exceeds $maxRows rows — the " +
        "bench side is a request-sized eval set, not a corpus; raise " +
        "graft.decontaminate.maxBenchRows only if that scale is intended")
    require(benchVecs.nonEmpty, "embeddingContamination: empty benchmark set")
    val bc = corpus.sparkSession.sparkContext.broadcast(benchVecs)
    val maxSim = udf { (v: Seq[Double]) =>
      val bs = bc.value
      // raw max first, ONE rounding after (round 14): the 6-dp HALF_UP
      // snap is monotone non-decreasing, so max(round(x_i)) ==
      // round(max(x_i)) — the r13 kernel allocated a BigDecimal per
      // (corpus row × bench vector) pair; this allocates one per row.
      // Same BigDecimal.decimal semantics, bit-identical output.
      var best = Double.NegativeInfinity
      var i = 0
      while (i < bs.length) {
        val b = bs(i)
        var d = 0d
        var j = 0
        val m = math.min(b.length, v.length)
        while (j < m) { d += v(j) * b(j); j += 1 }
        if (d > best) best = d
        i += 1
      }
      BigDecimal.decimal(best)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    corpus.select(id.as("id"), Similarity.normalized(vec).as("_v"))
      .withColumn("max_sim", maxSim(col("_v")))
      .select(col("id"), col("max_sim"),
        (col("max_sim") > threshold).cast("long").as("contaminated"))
  }

  /** (_decon_id, n_hits) for contaminated documents only. The kernel emits
    * DISTINCT n-grams per document, so the post-join count is already a
    * distinct-gram count without a `countDistinct` expand.
    */
  private def contaminationHits(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(shinglesUdf(n)(benchText)).as("gram"))
      .distinct()
    docs.select(id.as(HitId), explode(shinglesUdf(n)(text)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(HitId).agg(count(lit(1)).as("n_hits"))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The LONG-POSTINGS latency benchmark (VERDICT r11 item 1): measure
  * plain [[graft.llm.InvertedIndex.bm25TopK]] against
  * [[graft.llm.InvertedIndex.bm25TopKMaxScore]] on a corpus whose query
  * terms' posting lists GROW with scale — the regime MaxScore exists
  * for, which the regular scaling corpus deliberately avoids (ScaleData
  * suffixes words per copy so posting lengths stay flat; its
  * `--shared-vocab` mode removes the suffix so every term's df scales
  * ×factor).
  *
  * `LongPostBench <corpusDir> [artifactPath]`: builds + compacts an
  * index over `<corpusDir>/documents.parquet` (outside the timing),
  * picks the query deterministically FROM the corpus — the rarest term
  * with df ≥ 3k as the MaxScore seed plus the two most document-frequent
  * terms (the rare+common mix where essential/non-essential pruning has
  * work to do) — asserts plain ≡ MaxScore row-for-row on that corpus
  * (the equality contract, re-checked at every scale point), then
  * reports steal-resampled p50/p95 per serve and the terms' dfs. One
  * JSON line on stdout; optionally written to `artifactPath`.
  */
object LongPostBench {

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val artifact = args.lift(1)
    val reps = sys.env.getOrElse("SPARK_GRAFT_LAT_REPS", "15").toInt
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{InvertedIndex, TextStats}

    val docs = graft.Tables.documents(spark, corpusDir)
    val idx = graft.TempDirs.create("longpost_idx")
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx,
      nBuckets = graft.QueriesQuality.PostingsBuckets)
    // serve against compacted segments (the r11 methodology finding:
    // otherwise task counts measure build parallelism, not the layout)
    InvertedIndex.compact(spark, idx)

    // deterministic term pick from the corpus df table (true document
    // frequency: distinct tokens per doc before the count)
    val byDf = docs
      .select(explode(array_distinct(
        TextStats.tokens(lower(col("text"))))).as("t"))
      .groupBy("t").count().orderBy(desc("count"), col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val k = 20
    val common = byDf.take(2).map(_._1).toSeq
    val rare = byDf.reverse.find(_._2 >= 3L * k)
      .getOrElse(sys.error(s"no term with df >= ${3 * k} in $corpusDir"))
    val terms = rare._1 +: common
    val dfs = byDf.toMap

    // the equality contract, re-checked at this scale point
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val want = rows(InvertedIndex.bm25TopK(spark, idx, terms, topK = k))
    val got = rows(InvertedIndex.bm25TopKMaxScore(spark, idx, terms, topK = k))
    require(got == want, s"MaxScore != plain on $corpusDir for $terms")

    // steal-resampled latency reps (Bench's discipline via LatSampling)
    val lat = new LatSampling()
    def sampled(f: => Double): Double = lat.sampled(f)
    def runMs(df: => org.apache.spark.sql.DataFrame): Double = lat.runMs(df)
    def pct(sorted: IndexedSeq[Double], p: Double): Double = lat.pct(sorted, p)
    // warm both paths (JIT + caches) before measuring
    (1 to 2).foreach { _ =>
      runMs(InvertedIndex.bm25TopK(spark, idx, terms, topK = k))
      runMs(InvertedIndex.bm25TopKMaxScore(spark, idx, terms, topK = k))
    }
    val plain = (1 to reps).map(_ => sampled(runMs(
      InvertedIndex.bm25TopK(spark, idx, terms, topK = k)))).sorted
    val wand = (1 to reps).map(_ => sampled(runMs(
      InvertedIndex.bm25TopKMaxScore(spark, idx, terms, topK = k)))).sorted
    // the AUTO pick's row: its p50 should track whichever branch is
    // cheaper at this scale point — the measured validation of the
    // default crossover threshold
    val auto = (1 to reps).map(_ => sampled(runMs(
      InvertedIndex.bm25TopKAuto(spark, idx, terms, topK = k)))).sorted
    // which branch auto took (recomputed from the same stats it reads)
    val nonSeedMass = terms.map(t => dfs(t).toDouble).sorted.drop(1).sum
    val autoPick = if (nonSeedMass >= 100000.0) "maxscore" else "plain"

    val nDocs = InvertedIndex.readStats(spark, idx).nDocs.toLong
    def f(d: Double) = BigDecimal(d).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    val dfStr = terms.map(t => s""""$t":${dfs(t)}""").mkString("{", ",", "}")
    val line =
      s"""{${Provenance.jsonFields},"metric":"longpost","n_docs":$nDocs,"terms_df":$dfStr,"seed":"${rare._1}","plain_p50_ms":${f(pct(plain, 0.5))},"plain_p95_ms":${f(pct(plain, 0.95))},"maxscore_p50_ms":${f(pct(wand, 0.5))},"maxscore_p95_ms":${f(pct(wand, 0.95))},"auto_p50_ms":${f(pct(auto, 0.5))},"auto_pick":"$autoPick","ratio_p50":${f(pct(wand, 0.5) / pct(plain, 0.5) * 100).toDouble / 100},"reps":$reps,"steal_retries":${lat.retries},"cpus":$cpus,"corpus":"$corpusDir"}"""
    println(line)
    artifact.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
    sys.exit(0)
  }
}

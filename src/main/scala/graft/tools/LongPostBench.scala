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
  * reports steal-resampled p50/p95 per serve. Round-13 methodology
  * fixes: a bounded [[QuietGate]] holds the start until the host reads
  * quiet; the plain/MaxScore/auto reps INTERLEAVE round-robin so every
  * strategy's percentile sees the same cache/JIT state (the r12
  * artifact measured auto last, and it looked faster than the branch it
  * delegates to); `auto_pick` comes from the engine's own
  * [[graft.llm.InvertedIndex.pickStrategy]] rather than a re-derived
  * threshold; and a BATCH row pins that the batched endpoint takes the
  * picked branch too (forced-plain vs auto, per-request ms). One JSON
  * line on stdout; optionally written to `artifactPath`.
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
    import spark.implicits._

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
      .getOrElse(sys.error(s"no term with df >= ${3 * k} in $corpusDir"))._1
    val terms = rare +: common
    val dfs = byDf.toMap

    // the equality contract, re-checked at this scale point
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val want = rows(InvertedIndex.bm25TopK(spark, idx, terms, topK = k))
    val got = rows(InvertedIndex.bm25TopKMaxScore(spark, idx, terms, topK = k))
    require(got == want, s"MaxScore != plain on $corpusDir for $terms")

    // the BATCH endpoints under measurement: every member is the
    // long-postings shape (the shared rare seed with varying common
    // terms — the corpus's shared-vocab construction leaves only one
    // rare band, so seeds can't vary; the commons can)
    val commons4 = byDf.take(4).map(_._1).toSeq
    require(commons4.size >= 4, s"need >= 4 common terms in $corpusDir")
    val batch = Seq(
      ("q0", Seq(rare, commons4(0), commons4(1))),
      ("q1", Seq(rare, commons4(2), commons4(3))),
      ("q2", Seq(rare, commons4(0), commons4(2))))
    val queriesDf = batch.toDF("qid", "terms")
    def batchDf(minPrune: Double) =
      InvertedIndex.bm25TopKBatch(spark, idx, queriesDf, col("qid"),
        col("terms"), topK = k, minPruneRows = minPrune)
    // batch equality contract: forced-plain ≡ auto-routed, per member
    def brows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("qid"), r.getAs[Long]("id"),
        r.getAs[Double]("score"))).sorted.toSeq
    require(brows(batchDf(Double.MaxValue)) ==
      brows(batchDf(InvertedIndex.DefaultMinPruneRows)),
      s"strategy-routed batch != plain batch on $corpusDir")

    // which branch the ENGINE picks (ADVICE r12: read the decision from
    // the same sidecar source the serve routes on, not a re-derived
    // threshold over a corpus df table)
    val autoPick = InvertedIndex.pickStrategy(spark, idx, terms)

    // hold the start until the host reads quiet (bounded; readings are
    // stamped in the artifact either way) — builds above are untimed
    val quiet = QuietGate.await()

    // steal-resampled latency reps (Bench's discipline via LatSampling)
    val lat = new LatSampling()
    def sampled(f: => Double): Double = lat.sampled(f)
    def runMs(df: => org.apache.spark.sql.DataFrame): Double = lat.runMs(df)
    def pct(sorted: IndexedSeq[Double], p: Double): Double = lat.pct(sorted, p)
    def plainOnce() = InvertedIndex.bm25TopK(spark, idx, terms, topK = k)
    def wandOnce() = InvertedIndex.bm25TopKMaxScore(spark, idx, terms, topK = k)
    def autoOnce() = InvertedIndex.bm25TopKAuto(spark, idx, terms, topK = k)
    // warm every path (JIT + caches) before measuring
    (1 to 2).foreach { _ =>
      runMs(plainOnce()); runMs(wandOnce()); runMs(autoOnce())
      runMs(batchDf(Double.MaxValue))
      runMs(batchDf(InvertedIndex.DefaultMinPruneRows))
    }
    // INTERLEAVED reps with a ROTATING order: each rep measures every
    // strategy back to back so all percentiles see the same cache
    // state, and the starting strategy rotates per rep so adjacency
    // warm-up (running right after a sibling leaves its broadcast/
    // codegen hot) spreads evenly instead of always favoring whichever
    // runs last
    val plainS = collection.mutable.ArrayBuffer.empty[Double]
    val wandS = collection.mutable.ArrayBuffer.empty[Double]
    val autoS = collection.mutable.ArrayBuffer.empty[Double]
    val bPlainS = collection.mutable.ArrayBuffer.empty[Double]
    val bAutoS = collection.mutable.ArrayBuffer.empty[Double]
    val singles: Vector[() => Unit] = Vector(
      () => plainS += sampled(runMs(plainOnce())),
      () => wandS += sampled(runMs(wandOnce())),
      () => autoS += sampled(runMs(autoOnce())))
    val batches: Vector[() => Unit] = Vector(
      () => bPlainS += sampled(runMs(batchDf(Double.MaxValue))) / batch.size,
      () => bAutoS += sampled(runMs(
        batchDf(InvertedIndex.DefaultMinPruneRows))) / batch.size)
    (0 until reps).foreach { i =>
      (0 until 3).foreach(j => singles((i + j) % 3)())
      (0 until 2).foreach(j => batches((i + j) % 2)())
    }
    val plain = plainS.sorted.toIndexedSeq
    val wand = wandS.sorted.toIndexedSeq
    val auto = autoS.sorted.toIndexedSeq
    val bPlain = bPlainS.sorted.toIndexedSeq
    val bAuto = bAutoS.sorted.toIndexedSeq

    val nDocs = InvertedIndex.readStats(spark, idx).nDocs.toLong
    def f(d: Double) = BigDecimal(d).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    def ratio(a: Double, b: Double) =
      BigDecimal(a / b).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val dfStr = terms.map(t => s""""$t":${dfs(t)}""").mkString("{", ",", "}")
    val line =
      s"""{${Provenance.jsonFields},${quiet.jsonFields},"metric":"longpost","n_docs":$nDocs,"terms_df":$dfStr,"seed":"$rare","plain_p50_ms":${f(pct(plain, 0.5))},"plain_p95_ms":${f(pct(plain, 0.95))},"maxscore_p50_ms":${f(pct(wand, 0.5))},"maxscore_p95_ms":${f(pct(wand, 0.95))},"auto_p50_ms":${f(pct(auto, 0.5))},"auto_pick":"$autoPick","ratio_p50":${ratio(pct(wand, 0.5), pct(plain, 0.5))},"batch_n":${batch.size},"batch_plain_ms_per_req_p50":${f(pct(bPlain, 0.5))},"batch_auto_ms_per_req_p50":${f(pct(bAuto, 0.5))},"batch_ratio_p50":${ratio(pct(bAuto, 0.5), pct(bPlain, 0.5))},"reps":$reps,"steal_retries":${lat.retries},"steal_discard_ms":${f(lat.discardMs)},"cpus":$cpus,"corpus":"$corpusDir"}"""
    println(line)
    artifact.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
    sys.exit(0)
  }
}

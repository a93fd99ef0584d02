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
      .config("spark.sql.optimizer.excludedRules", graft.SessionTuning.ExcludedRules)
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

    // SINGLE-DOMINANT-TERM serve (round 14): the purest block-max shape —
    // one long list whose impact head alone decides the top-k. The
    // pruned plan is scan→project→TakeOrdered with the θ-derived tf
    // floor PUSHED into parquet (row-group/page skips over the low-tf
    // tail); plain pays the full-list aggregation + shuffle.
    val domTerm = byDf.head._1
    require(rows(InvertedIndex.bm25TopKMaxScore(spark, idx, Seq(domTerm),
        topK = k)) ==
      rows(InvertedIndex.bm25TopK(spark, idx, Seq(domTerm), topK = k)),
      s"single-term pruned serve != plain on $corpusDir for $domTerm")
    val domPick = InvertedIndex.pickStrategy(spark, idx, Seq(domTerm))

    // AND-semantics serve (VERDICT r13 item 5): rarest-list candidacy —
    // the rare seed's list is a complete candidate superset, so the
    // pruned aggregation is |rarest|-bounded instead of Σdf-bounded
    def andRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    require(andRows(InvertedIndex.bm25TopKAnd(spark, idx, terms, topK = k,
        minPruneRows = 0.0)) ==
      andRows(InvertedIndex.bm25TopKAnd(spark, idx, terms, topK = k,
        minPruneRows = Double.MaxValue)),
      s"AND rarest-list candidacy != plain on $corpusDir for $terms")

    // FILTERED serving crossover (VERDICT r13 item 6): the filtered
    // MaxScore path pays a probe action the unfiltered path no longer
    // has — measure the auto pick against forced-plain under a
    // SELECTIVE (5%) and a PERMISSIVE (90%) allowed set, single and
    // batch. Allowed sets are prebuilt dimensions (written outside the
    // timing — at scale an ACL table, not a corpus scan).
    val filters: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      ("selective", docs.where(pmod(col("doc_id"), lit(20)) === 0)),
      ("permissive", docs.where(pmod(col("doc_id"), lit(10)) =!= 0))
    ).map { case (label, d) =>
      val dir = graft.TempDirs.create(s"longpost_acl_$label")
      d.select("doc_id").coalesce(1).write.mode("overwrite").parquet(dir)
      label -> spark.read.parquet(dir)
    }
    def filtOnce(ok: org.apache.spark.sql.DataFrame, minPrune: Double) =
      InvertedIndex.bm25TopKFiltered(spark, idx, terms, ok, col("doc_id"),
        topK = k, minPruneRows = minPrune)
    filters.foreach { case (label, ok) =>
      require(rows(filtOnce(ok, InvertedIndex.DefaultMinPruneRows)) ==
        rows(filtOnce(ok, Double.MaxValue)),
        s"filtered auto serve != plain under $label filter on $corpusDir")
    }

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
    def domPlainOnce() = InvertedIndex.bm25TopK(spark, idx, Seq(domTerm), topK = k)
    def domPrunedOnce() =
      InvertedIndex.bm25TopKMaxScore(spark, idx, Seq(domTerm), topK = k)
    def andPlainOnce() = InvertedIndex.bm25TopKAnd(spark, idx, terms, topK = k,
      minPruneRows = Double.MaxValue)
    def andPrunedOnce() = InvertedIndex.bm25TopKAnd(spark, idx, terms, topK = k)
    def fbatchDf(ok: org.apache.spark.sql.DataFrame, minPrune: Double) =
      InvertedIndex.bm25TopKFilteredBatch(spark, idx, queriesDf, col("qid"),
        col("terms"), ok, col("doc_id"), topK = k, minPruneRows = minPrune)
    // PHASE-ISOLATED interleaves (round 14): each comparison group
    // measures alone, its members interleaved round-robin with a
    // rotating start — the r13 discipline. A single global rotation
    // over every serve in the file (the first r14 cut) put ~15 heavy
    // foreign plans between two samples of the same series, and the
    // churn inflated the HEADLINE trio ~60% over its r13 readings while
    // leaving within-phase ratios meaningless across phases. Ratios are
    // only ever computed WITHIN a phase; phase A reproduces r13's exact
    // rotation so its numbers stay comparable across rounds.
    class Series { val buf = collection.mutable.ArrayBuffer.empty[Double]
      def sorted: IndexedSeq[Double] = buf.sorted.toIndexedSeq }
    val plainS = new Series; val wandS = new Series; val autoS = new Series
    val domPlainS = new Series; val domPrunedS = new Series
    val andPlainS = new Series; val andPrunedS = new Series
    val fPlainS = filters.map { case (l, _) => l -> new Series }.toMap
    val fAutoS = filters.map { case (l, _) => l -> new Series }.toMap
    val bPlainS = new Series; val bAutoS = new Series
    val fbPlainS = filters.map { case (l, _) => l -> new Series }.toMap
    val fbAutoS = filters.map { case (l, _) => l -> new Series }.toMap
    def phase(warm: Seq[() => Unit], series: Vector[() => Unit]): Unit = {
      (1 to 2).foreach(_ => warm.foreach(_.apply()))
      (0 until reps).foreach { i =>
        series.indices.foreach(j => series((i + j) % series.size)())
      }
    }
    // phase A — the r13-comparable headline, REP STRUCTURE IDENTICAL to
    // the r13 artifact's: per rep, the single trio rotates then the
    // batch pair rotates
    (1 to 2).foreach { _ =>
      runMs(plainOnce()); runMs(wandOnce()); runMs(autoOnce())
      runMs(batchDf(Double.MaxValue))
      runMs(batchDf(InvertedIndex.DefaultMinPruneRows))
    }
    val aSingles: Vector[() => Unit] = Vector(
      () => plainS.buf += sampled(runMs(plainOnce())),
      () => wandS.buf += sampled(runMs(wandOnce())),
      () => autoS.buf += sampled(runMs(autoOnce())))
    val aBatches: Vector[() => Unit] = Vector(
      () => bPlainS.buf += sampled(runMs(batchDf(Double.MaxValue))) / batch.size,
      () => bAutoS.buf += sampled(runMs(
        batchDf(InvertedIndex.DefaultMinPruneRows))) / batch.size)
    (0 until reps).foreach { i =>
      (0 until 3).foreach(j => aSingles((i + j) % 3)())
      (0 until 2).foreach(j => aBatches((i + j) % 2)())
    }
    // phase B — dominant single term and AND semantics
    phase(
      Seq(() => runMs(domPlainOnce()), () => runMs(domPrunedOnce()),
        () => runMs(andPlainOnce()), () => runMs(andPrunedOnce())),
      Vector(
        () => domPlainS.buf += sampled(runMs(domPlainOnce())),
        () => domPrunedS.buf += sampled(runMs(domPrunedOnce())),
        () => andPlainS.buf += sampled(runMs(andPlainOnce())),
        () => andPrunedS.buf += sampled(runMs(andPrunedOnce()))))
    // phase C — filtered crossover, one phase per filter (single + batch)
    filters.foreach { case (l, ok) =>
      phase(
        Seq(() => runMs(filtOnce(ok, Double.MaxValue)),
          () => runMs(filtOnce(ok, InvertedIndex.DefaultMinPruneRows)),
          () => runMs(fbatchDf(ok, Double.MaxValue)),
          () => runMs(fbatchDf(ok, InvertedIndex.DefaultMinPruneRows))),
        Vector(
          () => fPlainS(l).buf += sampled(runMs(filtOnce(ok, Double.MaxValue))),
          () => fAutoS(l).buf += sampled(runMs(
            filtOnce(ok, InvertedIndex.DefaultMinPruneRows))),
          () => fbPlainS(l).buf +=
            sampled(runMs(fbatchDf(ok, Double.MaxValue))) / batch.size,
          () => fbAutoS(l).buf += sampled(runMs(
            fbatchDf(ok, InvertedIndex.DefaultMinPruneRows))) / batch.size))
    }
    val plain = plainS.sorted
    val wand = wandS.sorted
    val auto = autoS.sorted
    val bPlain = bPlainS.sorted
    val bAuto = bAutoS.sorted

    val nDocs = InvertedIndex.readStats(spark, idx).nDocs.toLong
    def f(d: Double) = BigDecimal(d).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    def ratio(a: Double, b: Double) =
      BigDecimal(a / b).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val dfStr = terms.map(t => s""""$t":${dfs(t)}""").mkString("{", ",", "}")
    def p50(s: Series) = pct(s.sorted, 0.5)
    val domStr =
      s""""dominant":{"term":"$domTerm","df":${dfs(domTerm)},"pick":"$domPick","plain_p50_ms":${f(p50(domPlainS))},"pruned_p50_ms":${f(p50(domPrunedS))},"ratio_p50":${ratio(p50(domPrunedS), p50(domPlainS))}}"""
    val andStr =
      s""""and":{"plain_p50_ms":${f(p50(andPlainS))},"pruned_p50_ms":${f(p50(andPrunedS))},"ratio_p50":${ratio(p50(andPrunedS), p50(andPlainS))}}"""
    val filtStr = filters.map { case (l, _) =>
      s"""{"filter":"$l","plain_p50_ms":${f(p50(fPlainS(l)))},"auto_p50_ms":${f(p50(fAutoS(l)))},"ratio_p50":${ratio(p50(fAutoS(l)), p50(fPlainS(l)))},"batch_plain_ms_per_req_p50":${f(p50(fbPlainS(l)))},"batch_auto_ms_per_req_p50":${f(p50(fbAutoS(l)))},"batch_ratio_p50":${ratio(p50(fbAutoS(l)), p50(fbPlainS(l)))}}"""
    }.mkString("\"filtered\":[", ",", "]")
    val line =
      s"""{${Provenance.jsonFields},${quiet.jsonFields},"metric":"longpost","n_docs":$nDocs,"terms_df":$dfStr,"seed":"$rare","plain_p50_ms":${f(pct(plain, 0.5))},"plain_p95_ms":${f(pct(plain, 0.95))},"maxscore_p50_ms":${f(pct(wand, 0.5))},"maxscore_p95_ms":${f(pct(wand, 0.95))},"auto_p50_ms":${f(pct(auto, 0.5))},"auto_pick":"$autoPick","ratio_p50":${ratio(pct(wand, 0.5), pct(plain, 0.5))},$domStr,$andStr,$filtStr,"batch_n":${batch.size},"batch_plain_ms_per_req_p50":${f(pct(bPlain, 0.5))},"batch_auto_ms_per_req_p50":${f(pct(bAuto, 0.5))},"batch_ratio_p50":${ratio(pct(bAuto, 0.5), pct(bPlain, 0.5))},"reps":$reps,"steal_retries":${lat.retries},"steal_discard_ms":${f(lat.discardMs)},"cpus":$cpus,"corpus":"$corpusDir"}"""
    println(line)
    artifact.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
    sys.exit(0)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The IVF coarse-k SIZING datapoint (VERDICT r11 item 7): SCALING.md's
  * honesty note says ANN's flat latency curve at fixed k=8 measures the
  * overhead floor — the probed set is nProbe/k of the corpus, a constant
  * FRACTION, and the standard deployment lever is k ∝ √n so probed size
  * stays O(√n). This tool turns that claim into a measurement:
  * `IvfSizing <embDir> [artifactPath]` fits coarse quantizers at the
  * suite's fixed k and at ⌈√n⌉ over the SAME embeddings + frozen PQ
  * codebooks, builds + compacts one RAW-STORED index per k (outside the
  * timing), and reports per configuration the probed ROW COUNT, the ADC
  * serve p50 (steal-resampled, quiet-gated), and recall@20 vs the exact
  * scan — measured on BOTH serve tiers (VERDICT r12 item 1: the r12
  * artifact computed recall from the ADC-only serve, where raising
  * nProbe surfaces MORE PQ-distorted candidates that displace true
  * neighbors from the ADC top-20, so its recall column measured
  * quantization noise and CONTRADICTED the sizing story):
  *
  *   - `adc_recall`: the ADC-only top-20 — kept to show the distortion
  *     floor, NOT the sizing headline (it can fall as nProbe rises);
  *   - `rerank_recall`: after exact re-rank from the index's stored
  *     vectors ([[graft.llm.IvfPq.serveRerankedFromIndex]]) — the path
  *     every production verb actually serves (rerank/filtered/hybrid),
  *     where raising nProbe at √n-k buys recall back while still
  *     probing far fewer rows than fixed-k.
  */
object IvfSizing {

  def main(args: Array[String]): Unit = {
    val embDir = args(0)
    val artifact = args.lift(1)
    val reps = sys.env.getOrElse("SPARK_GRAFT_LAT_REPS", "15").toInt
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.optimizer.excludedRules", graft.SessionTuning.ExcludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a √n-sized coarse quantizer means >32 cluster directories, which
      // trips Spark's parallelPartitionDiscovery threshold: every serve's
      // file-index construction becomes a LISTING JOB. Serving tiers list
      // driver-side (the listing is one round of metadata calls, not a
      // distributed problem) — raise the threshold so the measurement
      // compares probed-row physics, not listing-job scheduling.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{Cluster, IvfPq, ProductQuant}
    import graft.QueriesQuality.{PqM, PqK, PqIters, PqTopK, PqAnchor, IvfRerankR}
    // the sweep serves at the suite's default probe breadth — the r13
    // finding is precisely that recall is flat in nProbe, so the sweep
    // varies the OTHER two levers at fixed probing
    val QueriesQualityProbe = graft.QueriesQuality.IvfNProbe

    val emb = graft.Tables.embeddings(spark, embDir)
    val n = emb.count()
    val sqrtK = math.ceil(math.sqrt(n.toDouble)).toInt
    // frozen PQ codebooks shared by every configuration (PQ is
    // independent of the coarse quantizer)
    val pqCents = ProductQuant.fit(emb, col("vec_id"), col("embedding"),
      m = PqM, k = PqK, iters = PqIters)
    val anchorV = emb.where(col("vec_id") === PqAnchor)
      .select("embedding").head().getSeq[Float](0).toArray.map(_.toDouble)
    val exact = ProductQuant.exactTopK(emb, col("vec_id"), col("embedding"),
        anchorV, topK = PqTopK)
      .collect().map(_.getAs[Long]("id")).toSet

    val configs = Seq(
      ("fixed_k", graft.QueriesPipeline.KmeansK, graft.QueriesQuality.IvfNProbe),
      ("sqrt_n_k", sqrtK, graft.QueriesQuality.IvfNProbe),
      ("sqrt_n_k_probe16", sqrtK, 16))
    // one fit + one index per DISTINCT k; configs differing only in
    // nProbe share them. Raw-stored: the rerank tier reads the index's
    // own vec column, never the corpus.
    val byK = configs.map(_._2).distinct.map { k =>
      val cents = Cluster.fitCentroids(
        emb.select(col("vec_id").as("id"), col("embedding").as("v")),
        k, graft.QueriesPipeline.KmeansIters)
      val idx = graft.TempDirs.create(s"ivfsizing_k$k")
      IvfPq.write(emb, col("vec_id"), col("embedding"), cents, pqCents, idx,
        storeRaw = true)
      IvfPq.compact(spark, idx)
      k -> (cents, idx)
    }.toMap

    // PQ DISTORTION × RERANK-DEPTH SWEEP (VERDICT r13 item 1): the r13
    // table exposed rerank recall stuck at 0.40 FLAT from nProbe 2 → 16,
    // which indicts the m-subquantizer shortlist ordering feeding a
    // fixed R — not probe breadth. Sweep m (codebooks refit per m; the
    // coarse quantizer and index assignment are m-independent, but the
    // stored codes aren't, so each m gets its own √n-k raw-stored
    // index) × rerank R at the √n-k default probe, measuring the
    // END-TO-END rerank tier: recall@20 and p50 per (m, R).
    val sweepMs = sys.env.getOrElse("SPARK_GRAFT_PQ_SWEEP_M", "4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val sweepRs = sys.env.getOrElse("SPARK_GRAFT_PQ_SWEEP_R", "50,100,200")
      .split(",").map(_.trim.toInt).toSeq
    val sqrtCents = byK(sqrtK)._1
    val byM = sweepMs.map { m =>
      val pq = if (m == PqM) pqCents
        else ProductQuant.fit(emb, col("vec_id"), col("embedding"),
          m = m, k = PqK, iters = PqIters)
      val idx =
        if (m == PqM) byK(sqrtK)._2
        else {
          val d = graft.TempDirs.create(s"ivfsizing_m$m")
          IvfPq.write(emb, col("vec_id"), col("embedding"), sqrtCents, pq, d,
            storeRaw = true)
          IvfPq.compact(spark, d)
          d
        }
      m -> (pq, idx)
    }.toMap

    // builds done — hold for a quiet host before the timed section
    val quiet = QuietGate.await()
    val lat = new LatSampling()
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getAs[Long]("id")).toSet
    val rows = configs.map { case (label, k, nProbe) =>
      val (cents, idx) = byK(k)
      val probedRows = IvfPq.probedCodes(spark, idx, cents, anchorV, nProbe)
        .count()
      val adcRecall = ids(IvfPq.serve(spark, idx, cents, pqCents, anchorV,
        nProbe, PqTopK)).intersect(exact).size.toDouble / PqTopK
      val rerankRecall = ids(IvfPq.serveRerankedFromIndex(spark, idx, cents,
          pqCents, anchorV, nProbe, IvfRerankR, PqTopK))
        .intersect(exact).size.toDouble / PqTopK
      (1 to 2).foreach(_ => lat.runMs(
        IvfPq.serve(spark, idx, cents, pqCents, anchorV, nProbe, PqTopK)))
      val samples = (1 to reps).map(_ => lat.sampled(lat.runMs(
        IvfPq.serve(spark, idx, cents, pqCents, anchorV, nProbe, PqTopK))))
        .sorted
      (label, k, nProbe, probedRows, lat.pct(samples, 0.5), adcRecall,
        rerankRecall)
    }
    val sweepReps = math.max(5, reps / 2)
    val sweep = for (m <- sweepMs; r <- sweepRs) yield {
      val (pq, idx) = byM(m)
      def serveOnce() = IvfPq.serveRerankedFromIndex(spark, idx, sqrtCents,
        pq, anchorV, QueriesQualityProbe, r, PqTopK)
      val recall = ids(serveOnce()).intersect(exact).size.toDouble / PqTopK
      (1 to 2).foreach(_ => lat.runMs(serveOnce()))
      val samples = (1 to sweepReps)
        .map(_ => lat.sampled(lat.runMs(serveOnce()))).sorted
      (m, r, recall, lat.pct(samples, 0.5))
    }
    def f(d: Double) = BigDecimal(d).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    def r2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rowsJson = rows.map { case (label, k, nProbe, pr, p50, adc, rr) =>
      s"""{"config":"$label","k":$k,"n_probe":$nProbe,"probed_rows":$pr,"ann_p50_ms":${f(p50)},"adc_recall_at_$PqTopK":${r2(adc)},"rerank_recall_at_$PqTopK":${r2(rr)}}"""
    }.mkString("[", ",", "]")
    val sweepJson = sweep.map { case (m, r, rec, p50) =>
      s"""{"pq_m":$m,"rerank_r":$r,"rerank_recall_at_$PqTopK":${r2(rec)},"rerank_p50_ms":${f(p50)}}"""
    }.mkString("[", ",", "]")
    val line =
      s"""{${Provenance.jsonFields},${quiet.jsonFields},"metric":"ivf_sizing","n_vectors":$n,"sqrt_n_k":$sqrtK,"rerank_r":$IvfRerankR,"rows":$rowsJson,"pq_sweep_k":$sqrtK,"pq_sweep_n_probe":$QueriesQualityProbe,"pq_sweep":$sweepJson,"reps":$reps,"sweep_reps":$sweepReps,"steal_retries":${lat.retries},"steal_discard_ms":${f(lat.discardMs)},"cpus":$cpus,"corpus":"$embDir"}"""
    println(line)
    artifact.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
    sys.exit(0)
  }
}

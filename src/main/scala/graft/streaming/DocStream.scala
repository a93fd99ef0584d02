package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection over a document stream: MinHash
  * signatures + LSH band-bucket state in `flatMapGroupsWithState`
  * (extension beyond the batch-only reference; same hashes as
  * [[graft.llm.Dedup.minhashNearDupPairs]], so batch and streaming agree
  * on candidate buckets).
  *
  * Shape: each incoming document maps to its signature + band keys (one
  * JVM-kernel pass); each (band key) group keeps the signatures previously
  * seen in that bucket as state; a new document whose estimated Jaccard
  * (matching MinHash components / numHashes) against any stored signature
  * clears the threshold emits a [[DocStream.DupFlag]] naming the earlier
  * document.
  *
  * Scale design: state per bucket is capped (`maxBucketSize` signatures —
  * degenerate hot buckets carry no near-dup signal, same cap as the batch
  * path), the shuffle carries (band key, id, signature) only — never text
  * or shingles — and a processing-time TTL expires buckets idle longer
  * than `stateTtlMs`, bounding total state by the active working set
  * (memory-note rule: stateful operators always set a timeout).
  */
object DocStream {

  final case class Doc(doc_id: Long, text: String)
  final case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)
  final case class BandedDoc(band_key: Long, doc_id: Long, sig: Array[Long])
  final case class BandedDocEvent(band_key: Long, doc_id: Long,
                                  sig: Array[Long], ts: java.sql.Timestamp)
  final case class DupFlag(doc_id: Long, dup_of: Long, est_jaccard: Double)
  final case class BucketState(ids: Array[Long], sigs: Array[Array[Long]])

  /** Estimated Jaccard of two MinHash signatures. */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Documents → (band key, id, signature) rows; short docs drop out. */
  def banded(docs: Dataset[Doc], shingleSize: Int, numHashes: Int, bands: Int)
            (implicit spark: SparkSession): Dataset[BandedDoc] = {
    import spark.implicits._
    docs.flatMap { d =>
      Dedup.signatureAndBandKeys(d.text, shingleSize, numHashes, bands) match {
        case Some((sig, keys)) => keys.iterator.map(k => BandedDoc(k, d.doc_id, sig))
        case None => Iterator.empty
      }
    }
  }

  /** Near-dup flags for a document stream. Works identically as one batch
    * (flatMapGroupsWithState runs with single-micro-batch semantics there),
    * which is how the spec asserts batch/streaming equivalence. A document
    * may be flagged once per agreeing band; distinct-ify downstream
    * (`flags.dropDuplicates("doc_id")` or a keep-first join).
    */
  /** Stateless streaming quality gate: score each arriving document with
    * the shared single-pass kernel ([[graft.llm.TextStats.qualityScore]],
    * oracle-pinned in batch by q_quality) and keep those at or above
    * `minQuality`. No state, no watermark, no shuffle — a pure streaming
    * map + filter whose throughput scales with ingest parallelism; the
    * natural first stage in front of the stateful near-dup flagger below.
    */
  def qualityGate(docs: DataFrame, minQuality: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    docs.withColumn("quality", graft.llm.TextStats.qualityScoreKernel(col("text")))
      .where(col("quality") >= minQuality)
  }

  /** Stateless streaming Gopher gate: the full rule vector
    * ([[graft.llm.Gopher.ruleColumns]], oracle-pinned in batch by
    * q_gopher_quality) evaluated on each arriving document, keeping rows
    * whose `keep` conjunction holds. Like [[qualityGate]]: no state, no
    * watermark, no shuffle — a narrow kernel map + filter, so ingest
    * parallelism is the only throughput bound.
    */
  def gopherGate(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val cols = docs.columns.map(col).toIndexedSeq ++
      graft.llm.Gopher.ruleColumns(col("text"))
    docs.select(cols: _*).where(col("keep") === 1)
  }

  /** Streaming index upkeep — the micro-batch twin of
    * [[graft.llm.InvertedIndex.append]]: a `foreachBatch` body that
    * merges each arriving batch of (doc_id, text) documents into the
    * persisted inverted index at `path`, so the index tracks a live
    * document stream without ever re-scanning the corpus (each batch
    * costs ∝ batch size). Batch and stream converge to the identical
    * index because append ≡ rebuild is exact (the sidecar's
    * integer-double stats arithmetic) and micro-batches are just a
    * partition of the delta.
    *
    * Replay safety: `foreachBatch` re-delivers a batch after a restart,
    * and a blind re-append would double its postings — so the sink
    * records each applied batchId as an `_applied/batch-N` marker
    * (through the index path's own Hadoop filesystem, not java.io — the
    * path may be s3a/gs/abfs) and skips batches already marked. The
    * marker lands AFTER the append: a crash in the window between the
    * two replays that one batch (at-least-once, the documented
    * `foreachBatch` contract); closing that window needs a
    * transactional commit protocol the plain-parquet layout doesn't
    * have — callers needing exactly-once put a [[graft.llm.Snapshot
    * .applyChanges]]-style dedupe in front instead.
    */
  def postingsDeltaSink(path: String): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.InvertedIndex.append(batch, col("doc_id"), col("text"), path)
    }

  /** One change-feed row for [[postingsFeedSink]]: `op` is "upsert" or
    * "delete" ([[graft.llm.InvertedIndex.applyChangeFeed]]'s contract).
    */
  final case class FeedOp(doc_id: Long, text: String, op: String)

  /** The CRUD streaming twin of [[postingsDeltaSink]]: each micro-batch
    * is a (doc_id, text, op) CHANGE FEED applied through
    * [[graft.llm.InvertedIndex.applyChangeFeed]] — upserts replace
    * their previous version via the generation ordering, deletes
    * tombstone, both delta-sized, no rebuild ever. The well-formed-feed
    * contract (at most one op per id) applies PER MICRO-BATCH; across
    * batches the generation ordering makes the last batch win, which is
    * exactly a CDC stream's semantics. Same `_applied` replay guard and
    * at-least-once caveat as [[postingsDeltaSink]].
    */
  def postingsFeedSink(path: String): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.InvertedIndex.applyChangeFeed(batch, col("doc_id"),
        col("text"), col("op"), path)
    }

  /** The vector-index twin of [[postingsDeltaSink]]: merge each
    * micro-batch of (vec_id, embedding) rows into a persisted IVF-PQ
    * layout via [[graft.llm.IvfPq.append]], encoding against the FROZEN
    * models (the artifact discipline that makes incremental encode
    * valid). Same `_applied` marker replay guard, same at-least-once
    * caveat as the postings sink.
    */
  def vectorDeltaSink(path: String, cents: Array[Array[Double]],
      pqCents: Array[Array[Array[Double]]]): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.IvfPq.append(batch, col("vec_id"), col("embedding"),
        cents, pqCents, path)
    }

  /** The payload-store twin of [[postingsDeltaSink]]: merge each
    * micro-batch of (media_id, payload, meta) rows into a persisted
    * media store via [[graft.llm.Multimodal.appendPayloads]] — the
    * ingest tier for multimodal corpora, delta-priced by construction
    * (IncrBench pins that append never pays the store's encode-bound
    * build cost). Same `_applied` marker replay guard and
    * at-least-once caveat as the index sinks.
    */
  def payloadDeltaSink(path: String): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.Multimodal.appendPayloads(batch, col("media_id"), path)
    }

  /** The CRUD streaming twin of [[payloadDeltaSink]]: each micro-batch
    * is a (media_id, payload, meta, op) change feed applied through
    * [[graft.llm.Multimodal.applyPayloadChangeFeed]] — upserts replace
    * payloads via the generation ordering, deletes tombstone. Same
    * per-micro-batch well-formed-feed contract and `_applied` guard as
    * [[postingsFeedSink]].
    */
  def payloadFeedSink(path: String): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.Multimodal.applyPayloadChangeFeed(batch, col("media_id"),
        col("op"), path)
    }

  /** Streaming sketch maintenance: each micro-batch's items are reduced
    * to their ≤ depth×width CMS cell table and APPENDED under `path` —
    * the log-structured twin of [[graft.llm.Sketches.cmsCells]], folded
    * back to the whole-stream sketch by [[graft.llm.Sketches.cmsRead]]
    * (cell-wise sums commute, so append order and batch boundaries are
    * irrelevant; batch ≡ stream is spec-pinned). Same `_applied` replay
    * guard and at-least-once caveat as the index sinks.
    */
  def cmsCellsSink(path: String, itemCol: String, depth: Int,
      width: Int): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.Sketches.cmsCells(batch, col(itemCol), depth, width)
        .write.mode("append").parquet(path)
    }

  /** [[cmsCellsSink]]'s Bloom twin: append each micro-batch's ≤ bits-row
    * lit-position relation; [[graft.llm.Sketches.bloomRead]] folds the
    * log by distinct-union. The streaming seen-key gate: the filter
    * stays fresh as the crawl streams in, with no rebuild and no
    * read-modify-write. Same `_applied` guard as the other sinks.
    */
  def bloomBitsSink(path: String, keyCol: String, hashes: Int,
      bits: Int): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.Sketches.bloomBits(batch, col(keyCol), hashes, bits)
        .write.mode("append").parquet(path)
    }

  /** The KMV twin of [[cmsCellsSink]]: append each micro-batch's
    * per-group k-minimum hash relation (≤ k rows per group);
    * [[graft.llm.Sketches.kmvRead]] folds by distinct-union + re-rank
    * (per-batch pruning never loses a global k-minimum). Streaming
    * cardinality tracking with bounded state per batch.
    */
  def kmvHashesSink(path: String, grpCol: String, valueCol: String,
      k: Int): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.Sketches.kmvHashes(batch, col(grpCol), col(valueCol), k)
        .write.mode("append").parquet(path)
    }

  /** [[kmvHashesSink]]'s HLL twin: append each micro-batch's ≤ 2^p-row
    * per-group register relation; [[graft.llm.Sketches.hllRead]] folds
    * the log by per-register MAX — commutative and idempotent, so append
    * order, batch boundaries, and even a replayed batch (beyond the
    * `_applied` guard) cannot change the folded sketch.
    */
  def hllRegistersSink(path: String, grpCol: String, valueCol: String,
      p: Int): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.Sketches.hllRegisters(batch, col(grpCol), col(valueCol), p)
        .write.mode("append").parquet(path)
    }

  /** [[cmsCellsSink]]'s histogram twin: append each micro-batch's
    * ≤ nBins-row fixed-grid cell relation over the caller-pinned
    * [lo, hi) domain; [[graft.llm.Sketches.binsRead]] folds the log by
    * bin-wise SUM, and [[graft.llm.Sketches.quantilesFromBins]] serves
    * live quantile dashboards from the fold — no read-modify-write on
    * the hot path, log growth bounded by nBins per batch.
    */
  def fixedBinsSink(path: String, valueCol: String, lo: Double, hi: Double,
      nBins: Int): (DataFrame, Long) => Unit =
    (batch, batchId) => appliedOnce(batch, path, batchId) {
      import org.apache.spark.sql.functions.col
      graft.llm.Sketches.fixedBins(batch, col(valueCol), lo, hi, nBins)
        .write.mode("append").parquet(path)
    }

  /** Replay guard shared by the index sinks: run `body` only if this
    * batchId has no `_applied` marker yet, then mark it — through the
    * index path's own Hadoop filesystem (the path may be
    * s3a/gs/abfs, never java.io).
    */
  private def appliedOnce(batch: DataFrame, path: String, batchId: Long)
      (body: => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val marker = new Path(path, s"_applied/batch-$batchId")
    val fs = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      body
      fs.mkdirs(marker.getParent)
      fs.create(marker, false).close()
    }
  }

  def nearDupFlags(docs: Dataset[Doc],
                   shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
                   threshold: Double = 0.5, maxBucketSize: Int = 200,
                   stateTtlMs: Long = 3600000L)
                  (implicit spark: SparkSession): Dataset[DupFlag] = {
    import spark.implicits._
    banded(docs, shingleSize, numHashes, bands)
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BucketState, DupFlag](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: Long, it: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // idle bucket: drop its signatures (documents arriving later
            // than the TTL can no longer be flagged against it — the
            // documented accuracy/state tradeoff)
            state.remove()
            Iterator.empty
          } else {
            val out = processBucket(it.map(d => (d.doc_id, d.sig)).toSeq,
              state, threshold, maxBucketSize)
            state.setTimeoutDuration(stateTtlMs)
            out
          }
      }
  }

  /** [[nearDupFlags]] with EVENT-time state expiry: buckets expire when the
    * watermark passes their newest document's event time + `stateTtlMs`.
    * Processing-time TTL misbehaves on backfill/replay — a historical
    * stream replayed faster than real time expires state by wall clock
    * while event time has barely advanced (or conversely keeps everything
    * alive during a slow replay). Event-time TTL makes dedup reach a
    * function of the DATA's clock: a late duplicate within the event-time
    * TTL is still flagged, replayed identically every run.
    *
    * The input must carry an event-time `ts`; the watermark is applied
    * here (`watermarkDelay` tolerance for out-of-order documents).
    */
  def nearDupFlagsEventTime(docs: Dataset[DocEvent],
                            shingleSize: Int = 3, numHashes: Int = 32,
                            bands: Int = 8, threshold: Double = 0.5,
                            maxBucketSize: Int = 200,
                            stateTtlMs: Long = 3600000L,
                            watermarkDelay: String = "10 minutes")
                           (implicit spark: SparkSession): Dataset[DupFlag] = {
    import spark.implicits._
    docs
      .flatMap { d =>
        Dedup.signatureAndBandKeys(d.text, shingleSize, numHashes, bands) match {
          case Some((sig, keys)) =>
            keys.iterator.map(k => BandedDocEvent(k, d.doc_id, sig, d.ts))
          case None => Iterator.empty
        }
      }
      // the watermark goes AFTER the typed flatMap: re-serialization drops
      // the event-time tag from the attribute, so tagging first would leave
      // the stateful operator without a watermarked input
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BucketState, DupFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[BandedDocEvent], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq
            val out = processBucket(rows.map(d => (d.doc_id, d.sig)),
              state, threshold, maxBucketSize)
            // expire when the watermark passes the bucket's newest event
            // time + TTL (the timestamp must sit above the current
            // watermark, which a late-but-accepted row's ts may not)
            val maxEventMs = rows.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxEventMs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  /** Shared bucket update: flag each new doc against the best earlier
    * stored signature, append to state up to the cap. Deterministic within
    * a micro-batch: earlier ids win.
    */
  private def processBucket(rows: Seq[(Long, Array[Long])],
                            state: GroupState[BucketState],
                            threshold: Double,
                            maxBucketSize: Int): Iterator[DupFlag] = {
    var ids = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
    var sigs = state.getOption.map(_.sigs).getOrElse(Array.empty[Array[Long]])
    val out = scala.collection.mutable.ArrayBuffer.empty[DupFlag]
    rows.sortBy(_._1).foreach { case (docId, sig) =>
      if (!ids.contains(docId)) {
        var bestId = -1L
        var bestEst = 0d
        var i = 0
        while (i < ids.length) {
          if (ids(i) < docId) {
            val est = estJaccard(sigs(i), sig)
            if (est >= threshold && (est > bestEst ||
                (est == bestEst && (bestId < 0 || ids(i) < bestId)))) {
              bestId = ids(i); bestEst = est
            }
          }
          i += 1
        }
        if (bestId >= 0) out += DupFlag(docId, bestId, bestEst)
        if (ids.length < maxBucketSize) {
          ids = ids :+ docId
          sigs = sigs :+ sig
        }
      }
    }
    state.update(BucketState(ids, sigs))
    out.iterator
  }
}

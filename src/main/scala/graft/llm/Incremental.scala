package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-ingest dedup: find the rows of a (small) delta batch whose
  * key does NOT already exist in a (huge) reference corpus — the daily
  * crawl-drop vs 100 TB training-corpus shape, where re-shuffling the
  * corpus per ingest is the thing that must never happen.
  *
  * Scale design: the corpus is touched by exactly two SCANS and zero
  * shuffles of its own rows.
  *
  *   1. BUILD — one corpus scan aggregates a Bloom filter over the 64-bit
  *      key hashes (`DataFrameStatFunctions.bloomFilter`: per-partition
  *      filters OR-merged on the driver; the filter, not the data, is the
  *      only thing collected — `expectedItems` at 1% fpp costs ~1.2 bytes
  *      per key, so even a billion-key corpus ships a ~GB filter, and a
  *      pre-built filter can be persisted and reused across ingests via
  *      the [[dedupAgainstFilter]] overload).
  *   2. PROBE — a narrow map-side filter on the delta keeps only keys the
  *      filter might contain: the true duplicates plus an fpp-sized sliver
  *      of false positives. Everything else is provably new and never
  *      shuffles anywhere.
  *   3. VERIFY — the surviving candidate keys (small) broadcast against a
  *      second corpus scan (`left_semi`, map-side) to drop the false
  *      positives; the confirmed-duplicate key set (≤ candidates) then
  *      broadcast-anti-joins the delta. Exactness therefore does not
  *      depend on the filter or the 64-bit hash: both are pre-filters, and
  *      the final verdict compares full keys.
  *
  * The output is exact — identical to `delta ANTI JOIN corpus ON key` —
  * which is what the DuckDB oracle (q_dedup_incr) checks.
  */
object Incremental {

  /** Delta rows whose `deltaKey` value appears nowhere in
    * `corpus.corpusKey`. Exact (Bloom + hash are pre-filters only; see
    * class doc). `expectedItems`/`fpp` size the filter — overestimating
    * `expectedItems` only wastes filter bits, underestimating only raises
    * the false-positive (= verify-join) traffic, never correctness.
    */
  def newRows(corpus: DataFrame, corpusKey: Column,
      delta: DataFrame, deltaKey: Column,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val corpusHashed = corpus.select(corpusKey.as("_ik"))
      .withColumn("_ih", xxhash64(col("_ik")))
    val filter = corpusHashed.stat.bloomFilter("_ih", expectedItems, fpp)
    dedupAgainstFilter(corpus, corpusKey, delta, deltaKey, filter)
  }

  /** Same as [[newRows]] but with a caller-supplied Bloom filter over
    * `xxhash64(corpusKey)` — the reuse path: build the filter once per
    * corpus version, keep it on the driver (or serialized beside the
    * corpus), and amortize the BUILD scan across many ingest batches.
    */
  def dedupAgainstFilter(corpus: DataFrame, corpusKey: Column,
      delta: DataFrame, deltaKey: Column,
      filter: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val spark = delta.sparkSession
    val bf = spark.sparkContext.broadcast(filter)
    val mightContain = udf { (h: Long) => bf.value.mightContainLong(h) }

    // PROBE: narrow filter; only maybe-duplicate keys survive.
    val candidates = delta.select(deltaKey.as("_ik"))
      .where(mightContain(xxhash64(col("_ik"))))
      .distinct()

    // VERIFY: corpus scanned once more, broadcast-probed by the candidate
    // set — output is the confirmed-duplicate keys (small). The distinct
    // shuffles only the corpus rows that matched a candidate.
    val confirmed = corpus.select(corpusKey.as("_ik"))
      .join(broadcast(candidates), Seq("_ik"), "left_semi")
      .distinct()

    delta.join(broadcast(confirmed), deltaKey === col("_ik"), "left_anti")
  }
}

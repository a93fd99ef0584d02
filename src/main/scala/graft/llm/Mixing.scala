package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data mixing: keep each
  * row with a per-stratum probability (e.g. downsample dominant languages /
  * sources to a target mixture) decided by a hash of the row's stable key —
  * NOT by `df.sample`, whose partition-seeded RNG changes membership when
  * the file layout, partition count, or task retries change.
  *
  * Hash-gate sampling is the shape that survives a 1000-executor cluster:
  * a pure narrow filter (no shuffle, no state, codegen'd), reproducible
  * across reruns and engines, and composable with pushdown — Parquet sees
  * `md5(key) < const` only after the cheap stratum column prune.
  *
  * The gate compares a hex PREFIX of md5(key) against a threshold string:
  * the first [[HexDigits]] nibbles of a cryptographic hash are uniform on
  * [0, 16^d), so `prefix < hex(rate · 16^d)` keeps each key independently
  * with probability `rate` (quantized to 1/16^d ≈ 6e-8). String comparison
  * on lowercase hex is identical in every engine — the same recipe is
  * replayed verbatim by the DuckDB oracle.
  */
object Mixing {

  val HexDigits = 6

  /** Lowercase hex threshold for a keep-rate in [0, 1]. */
  def rateToHex(rate: Double): String = {
    val space = 1L << (4 * HexDigits)
    val bound = math.max(0L, math.min(space, math.round(rate * space)))
    // a full-space bound compares above every prefix ("1000000" > "ffffff")
    if (bound == space) "g" * HexDigits
    else s"%0${HexDigits}x".format(bound)
  }

  /** The uniform [0,1)-surrogate: first [[HexDigits]] hex chars of md5 of
    * the key rendered as a string.
    */
  def hashPrefix(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, HexDigits)

  /** Keep-gate for one flat rate. */
  def sampleGate(key: Column, rate: Double): Column =
    hashPrefix(key) < lit(rateToHex(rate))

  /** Stratified keep-gate: per-stratum rates with a default for strata not
    * listed. Rates are data, not code — the CASE chain is a broadcast-free
    * literal fold (strata counts are small: languages, sources, buckets).
    */
  def stratifiedGate(key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): Column = {
    val threshold = rates.foldRight(lit(rateToHex(defaultRate)): Column) {
      case ((s, r), acc) => when(stratum === s, lit(rateToHex(r))).otherwise(acc)
    }
    hashPrefix(key) < threshold
  }

  /** The sampling stage: filter `df` to the target mixture. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame =
    df.where(stratifiedGate(key, stratum, rates, defaultRate))

  /** Deterministic disjoint split (train/val/test …): route each key to
    * the bucket whose cumulative hash range holds its prefix. Same
    * hash-gate guarantees as sampling — reproducible across engines,
    * reruns, and layouts; a pure narrow expression. Fractions must sum to
    * ~1 (the last bucket absorbs the hex-quantization remainder).
    */
  def splitBucket(key: Column, buckets: Seq[(String, Double)]): Column = {
    require(buckets.size >= 2, "need at least two buckets")
    require(math.abs(buckets.map(_._2).sum - 1.0) < 1e-9,
      "bucket fractions must sum to 1")
    val cum = buckets.map(_._2).scanLeft(0.0)(_ + _).tail
    val hp = hashPrefix(key)
    buckets.init.zip(cum).foldRight(lit(buckets.last._1): Column) {
      case (((name, _), c), acc) =>
        when(hp < lit(rateToHex(c)), name).otherwise(acc)
    }
  }

  /** Temperature-scaled sampling weights per stratum — the mixture table
    * every multi-source / multilingual training run starts from: a source
    * with nᵅ share of the α-tempered token mass gets weight
    * w_s = n_sᵅ / Σ_t n_tᵅ. α = 1 reproduces natural proportions; α → 0
    * flattens toward uniform; α ≈ 0.3–0.7 is the usual compromise that
    * up-weights small sources without drowning large ones.
    *
    * Scale shape: ONE partial-aggregated groupBy to per-stratum (n_docs,
    * n_tokens) — strata are languages/sources/domains, so the aggregate is
    * tiny regardless of corpus size; the normalizer is a one-row scalar
    * collect over it (the [[TextStats.unigramLogProb]] corpus-total
    * pattern, bounded by |strata|). The token counter is a narrow
    * `size(split)` — no explode, no token shuffle.
    */
  def temperatureWeights(df: DataFrame, stratum: Column, tokCount: Column,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1] (got $alpha)")
    val per = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(tokCount).as("n_tokens"))
    val denom = per
      .agg(sum(pow(col("n_tokens").cast("double"), alpha))).head().getDouble(0)
    per.select(col("stratum"), col("n_docs"), col("n_tokens"),
      (pow(col("n_tokens").cast("double"), alpha) / denom).as("weight"))
  }
}

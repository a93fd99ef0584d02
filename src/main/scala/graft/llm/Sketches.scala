package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable one-pass sketches: KMV distinct-count (+ pairwise
  * set overlap), HyperLogLog registers, Count-Min frequency, and Bloom
  * membership — the bounded-memory summaries a
  * 100-TB curation pipeline persists BESIDE a dataset (cardinality per
  * shard, heavy-hitter tokens, seen-URL gates) so later stages, possibly
  * running on a different engine, can probe them without rescanning the
  * corpus. [[SketchSidecar]] makes that literal: one cached scan writes
  * the whole family next to a snapshot, and the read-side folds below
  * treat a sidecar as a one-element log.
  *
  * Contrast with the transient gates the pipeline already uses
  * internally ([[Incremental]] builds `spark.util.sketch.BloomFilter`,
  * a JVM-private binary): everything here is defined over a PORTABLE
  * hash — the first 60 bits of `md5(value)` — so the identical sketch is
  * computable from ANSI SQL in any engine, which is also what lets the
  * DuckDB oracle pin the sketch arithmetic itself (estimates, collision
  * overcounts, false-positive verdicts), not just a downstream exact
  * result.
  *
  * Scale shape, per sketch:
  *  - KMV: one `distinct` on (group, hash) — map-side combined, shuffles
  *    64-bit hashes, never values — then a per-GROUP window over the
  *    distinct relation. Nothing global; estimate state is k longs/group.
  *  - CMS: a narrow map explodes each item into `depth` (seed, bucket)
  *    cells and ONE map-side-combined groupBy reduces to ≤ depth×width
  *    rows, independent of corpus size — the streaming-CMS update order
  *    never materializes per-item counts.
  *  - Bloom: build reduces keys to ≤ `bits` distinct positions (the bit
  *    set IS the relation — what you'd persist); probing broadcasts it.
  *    [[bloomProbeSet]] is the serving kernel: the bit set collected
  *    (bounded by `bits` by construction) into a broadcast BitSet and
  *    probed as a NARROW map — zero shuffle on the probe stream.
  */
object Sketches {

  /** Portable 60-bit hash: the first 15 hex chars of md5 over the
    * value's canonical STRING form (so integer columns hash identically
    * to the oracle's `x::VARCHAR`), as a non-negative long. DuckDB twin:
    * `('0x' || substr(md5(x::VARCHAR), 1, 15))::BIGINT`. Defined for
    * string and integer inputs; float canonical forms differ across
    * engines — stringify floats yourself before hashing.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** 2^60 as a double (exact): h60 / H60Denom is uniform on [0, 1). */
  val H60Denom: Double = 1152921504606846976.0d

  /** KMV (k-minimum-values) distinct-count estimate per group:
    * (grp, est_distinct). With n ≥ k distinct hashes the estimate is
    * (k−1)/r_k where r_k is the k-th smallest normalized hash; with
    * n < k the sketch holds every distinct hash and the estimate is
    * exactly n (the unsaturated branch). Standard error ≈ 1/√k.
    *
    * The k-th smallest hash is found in two ranking levels so that
    * parallelism never collapses to the GROUP count (a per-group window
    * over the full distinct relation serializes each group into one
    * task — measured 5× slower at sf1): first a rank within (group,
    * physical partition) keeps only k candidates per partition — the k
    * global minima always survive any partitioning — then the per-group
    * window ranks the ≤ k·P survivors. A production refresh loop would
    * additionally pre-filter `h < r_k_prev · slack` from the previous
    * epoch's sketch; correctness never depends on either prune.
    */
  def kmvDistinct(df: DataFrame, grp: Column, value: Column, k: Int): DataFrame =
    kmvFromHashes(df.select(grp.as("grp"), h60(value).as("h")).distinct(), k)

  /** [[kmvDistinct]]'s tail, reusable over any distinct (grp, h) hash
    * relation — in particular the distinct UNION of per-shard/per-batch
    * [[kmvHashes]] sketches (KMV merges exactly: a global k-minimum is a
    * k-minimum of whichever shard holds it, so per-shard top-k pruning
    * never loses one).
    */
  def kmvFromHashes(hashes: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val local = Window.partitionBy("grp", "_p").orderBy("h")
    val pruned = hashes
      .withColumn("_p", spark_partition_id())
      .withColumn("_lrk", row_number().over(local))
      .where(col("_lrk") <= k)
      .select(col("grp"), col("h"))
    // the survivor count stands in for the true distinct count on both
    // sides of the saturation test: below k nothing was pruned (each
    // partition held < k rows of the group), so _ns == n exactly; at or
    // above k at least the k global minima survive, so _ns >= k and only
    // the k-th hash matters
    pruned
      .select(col("grp"), col("h"),
        row_number().over(Window.partitionBy("grp").orderBy("h")).as("_rk"),
        count(lit(1)).over(Window.partitionBy("grp")).as("_ns"))
      .where(col("_rk") === least(lit(k), col("_ns")))
      .select(col("grp"),
        when(col("_ns") < k, col("_ns").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) /
            (col("h").cast("double") / lit(H60Denom)), 3))
          .as("est_distinct"))
  }

  /** The persistable KMV state: per group, the k smallest distinct
    * 60-bit value hashes — ≤ k rows per group, string group key for a
    * stable log schema. Sketch of a shard or micro-batch; fold shards
    * with distinct-union + [[kmvFromHashes]] (or [[kmvRead]] over a
    * [[graft.streaming.DocStream.kmvHashesSink]] log).
    */
  def kmvHashes(df: DataFrame, grp: Column, value: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashes = df.select(grp.cast("string").as("grp"), h60(value).as("h")).distinct()
    val local = Window.partitionBy("grp", "_p").orderBy("h")
    hashes
      .withColumn("_p", spark_partition_id())
      .withColumn("_lrk", row_number().over(local))
      .where(col("_lrk") <= k)
      .select(col("grp"), col("h"))
      .withColumn("_rk", row_number().over(Window.partitionBy("grp").orderBy("h")))
      .where(col("_rk") <= k)
      .select(col("grp"), col("h"))
  }

  /** Fold a log of appended per-batch [[kmvHashes]] relations into the
    * whole-stream estimate: distinct-union (a value seen in two batches
    * contributes one hash) then the shared tail. Absent layout → no
    * groups.
    */
  def kmvRead(spark: org.apache.spark.sql.SparkSession, path: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("grp", StringType), StructField("h", LongType)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else kmvFromHashes(spark.read.schema(schema).parquet(path).distinct(), k)
  }

  /** HyperLogLog register relation — (grp, reg, mx), ≤ 2^p rows per
    * group — the industry-standard register sketch beside [[kmvHashes]]:
    * the top p bits of the 60-bit portable hash pick a register, and the
    * register keeps the maximum rank (position of the highest set bit,
    * counted from the top) of the remaining 60−p bits. One map-side-
    * combined groupBy reduces the corpus to bounded state; registers
    * MERGE BY MAX — commutative and idempotent, so per-shard sketches,
    * streaming micro-batch logs, and replayed batches all fold to the
    * identical whole-corpus sketch.
    *
    * The rank is `(60−p+1) − bit_length(suffix)` via the binary-string
    * form `length(ltrim(bin(x), '0'))` — portable: Spark and DuckDB both
    * print minimal binary (no leading zeros), so the oracle reproduces
    * the register arithmetic exactly.
    */
  def hllRegisters(df: DataFrame, grp: Column, value: Column, p: Int): DataFrame = {
    require(p >= 7 && p <= 16, "HLL needs 7 <= p <= 16 (alpha formula assumes m >= 128)")
    val suffixBits = 60 - p
    df.select(grp.cast("string").as("grp"), h60(value).as("_h"))
      .select(col("grp"),
        shiftright(col("_h"), suffixBits).as("reg"),
        (col("_h") % (1L << suffixBits)).as("_sfx"))
      .select(col("grp"), col("reg"),
        when(col("_sfx") === 0, lit(suffixBits + 1))
          .otherwise(lit(suffixBits + 1) - length(ltrim(bin(col("_sfx")), "0")))
          .as("rho"))
      .groupBy("grp", "reg").agg(max("rho").as("mx"))
  }

  /** Estimate (grp, est_distinct) from a register relation — a direct
    * [[hllRegisters]] output or any unioned log of them (the leading
    * per-register max-fold makes both cases identical). The harmonic
    * mean runs in EXACT integer arithmetic — Σ 2^(S−M_j) as a long
    * (S = 60−p+1; ≤ 2^61, order-independent) — so the raw-branch double
    * is bit-identical across engines; the only transcendental is the
    * small-range linear-counting `ln`, whose 2^p−1 possible values were
    * checked ≥ 3.8e-7 from every 3-dp rounding boundary (cross-engine
    * ulp differences are ~1e-11). Standard error ≈ 1.04/√(2^p).
    */
  def hllFromRegisters(regs: DataFrame, p: Int): DataFrame = {
    require(p >= 7 && p <= 16, "HLL needs 7 <= p <= 16")
    val m = 1 << p
    val scale = 60 - p + 1
    val num = hllNumerator(p)
    regs.groupBy("grp", "reg").agg(max("mx").as("mx"))
      .groupBy("grp").agg(
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - mx)")) +
          (lit(m.toLong) - count(lit(1))) * lit(1L << scale)).as("_sum"),
        (lit(m.toLong) - count(lit(1))).as("_v"))
      .select(col("grp"),
        when(lit(num) / col("_sum").cast("double") <= lit(2.5 * m) && col("_v") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("_v").cast("double")), 3))
          .otherwise(round(lit(num) / col("_sum").cast("double"), 3))
          .as("est_distinct"))
  }

  /** α_m · m² · 2^(60−p+1): the raw-estimate numerator, computed ONCE
    * here so the Spark plan and any SQL oracle can inline the identical
    * double literal (shortest-roundtrip decimal re-parses exactly).
    */
  def hllNumerator(p: Int): Double = {
    val m = 1 << p
    0.7213 / (1 + 1.079 / m) * m * m * math.pow(2.0, 60 - p + 1)
  }

  /** Per-group HLL distinct-count estimate: (grp, est_distinct). */
  def hllDistinct(df: DataFrame, grp: Column, value: Column, p: Int): DataFrame =
    hllFromRegisters(hllRegisters(df, grp, value, p), p)

  /** Merge independently-built register relations (per-register max) —
    * same shard-merge contract as [[cmsMerge]]/[[bloomMerge]].
    */
  def hllMerge(regs: Seq[DataFrame]): DataFrame = {
    require(regs.nonEmpty, "nothing to merge")
    regs.reduce(_ unionByName _).groupBy("grp", "reg").agg(max("mx").as("mx"))
  }

  /** [[kmvRead]]'s HLL twin: fold a log of appended per-batch
    * [[hllRegisters]] relations
    * ([[graft.streaming.DocStream.hllRegistersSink]]) into whole-stream
    * estimates. Absent layout → no groups.
    */
  def hllRead(spark: org.apache.spark.sql.SparkSession, path: String,
      p: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("grp", StringType), StructField("reg", LongType),
      StructField("mx", IntegerType)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      hllFromRegisters(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), p)
    else hllFromRegisters(spark.read.schema(schema).parquet(path), p)
  }

  /** Pairwise Jaccard estimates between groups FROM THEIR KMV SKETCHES —
    * (src_a, src_b, est_jaccard) for every unordered group pair. The
    * union sketch of a pair is the k smallest hashes of the two sketches'
    * distinct union (a k-minimum of the union survives in at least one
    * side's sketch), and the estimate is the fraction of those union
    * minima present in BOTH sides — exact when both sketches are
    * unsaturated. This is the sketch-resident overlap matrix: cost is
    * pairs × k no matter the corpus size; the corpus is touched only by
    * the one scan that built `hashes` ([[kmvHashes]] — ≤ k rows/group).
    */
  def kmvOverlap(hashes: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val grps = hashes.select(col("grp")).distinct()
    val pairs = grps.as("ga").join(grps.as("gb"), col("ga.grp") < col("gb.grp"))
      .select(col("ga.grp").as("src_a"), col("gb.grp").as("src_b"))
    val la = broadcast(pairs).join(hashes.withColumnRenamed("grp", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val lb = broadcast(pairs).join(hashes.withColumnRenamed("grp", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    la.unionByName(lb)
      .groupBy("src_a", "src_b", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("src_a", "src_b").orderBy("h")))
      .where(col("_rk") <= k)
      .groupBy("src_a", "src_b")
      .agg(round(sum(col("in_a") * col("in_b")).cast("double") /
        count(lit(1)).cast("double"), 4).as("est_jaccard"))
  }

  /** Per-group Jaccard estimate between TWO snapshots' KMV sketches —
    * (grp, est_jaccard), one row per group present in either sketch
    * (one-sided groups estimate 0). Same estimator as [[kmvOverlap]] —
    * the k smallest of the two sketches' distinct union are the union's
    * own k-minima, and the estimate is the fraction present in both —
    * but paired by EQUAL group across relations rather than cross-group
    * within one. This is how snapshot-over-snapshot drift dashboards
    * (content churn per shard/language) run at 100 TB: each snapshot is
    * scanned once at ingest to persist its ≤ k-hash sketches, and every
    * later comparison folds sketches only.
    */
  def kmvJaccardAcross(hashesA: DataFrame, hashesB: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val ta = hashesA.select(col("grp"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
    val tb = hashesB.select(col("grp"), col("h"), lit(0).as("in_a"), lit(1).as("in_b"))
    ta.unionByName(tb)
      .groupBy("grp", "h").agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .withColumn("_rk", row_number().over(Window.partitionBy("grp").orderBy("h")))
      .where(col("_rk") <= k)
      .groupBy("grp")
      .agg(round(sum(col("in_a") * col("in_b")).cast("double") /
        count(lit(1)).cast("double"), 4).as("est_jaccard"))
  }

  /** Deterministic bottom-k-by-hash sample per group — KMV with payload:
    * the input rows whose key's portable hash ranks among the group's k
    * smallest. The SAMPLE IS A SKETCH: membership is a pure function of
    * the key, so the identical rows come back from any engine, any
    * partitioning, and any rerun; a global bottom-k is the bottom-k of
    * shard bottom-ks (mergeable — sample shards independently, fold);
    * and as the corpus grows a sampled row leaves only when k smaller
    * hashes arrive — the sticky property that keeps eval holdouts
    * reproducible across snapshots without persisting a sample list
    * (bottom-k of a subset ⊇ the superset's bottom-k restricted to it).
    * Two-level ranking as in [[kmvHashes]] keeps parallelism above the
    * group count. `key` must be unique within each group (use the
    * primary id): the rank's tie-break is the key's string form, so
    * uniqueness is what makes the order total and the per-partition
    * prune exact. Set spark.conf `graft.debug.checks=true` to ENFORCE
    * that precondition eagerly (one bounded count-vs-countDistinct
    * aggregation) — a duplicate key would otherwise make the
    * per-partition prune silently unstable across reruns.
    */
  def bottomKSample(df: DataFrame, grp: Column, key: Column, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    if (df.sparkSession.conf.getOption("graft.debug.checks").contains("true")) {
      val bad = df.groupBy(grp.as("_g"))
        .agg(count(key).as("_n"), countDistinct(key).as("_d"))
        .where(col("_n") =!= col("_d")).limit(1).collect()
      require(bad.isEmpty,
        s"bottomKSample: duplicate key within group ${bad.headOption.map(_.get(0))} — " +
          "the sample would be nondeterministic; pass a unique per-group key")
    }
    val keyed = df
      .withColumn("_bg", grp.cast("string"))
      .withColumn("_bh", h60(key))
      .withColumn("_bk", key.cast("string"))
      .withColumn("_p", spark_partition_id())
    val local = Window.partitionBy("_bg", "_p").orderBy("_bh", "_bk")
    keyed
      .withColumn("_lrk", row_number().over(local))
      .where(col("_lrk") <= k)
      .withColumn("_rk", row_number().over(
        Window.partitionBy("_bg").orderBy("_bh", "_bk")))
      .where(col("_rk") <= k)
      .drop("_bg", "_bh", "_bk", "_p", "_lrk", "_rk")
  }

  private def seedCol(seed: Column, item: Column): Column =
    h60(concat(seed.cast("string"), lit(":"), item))

  /** Count-Min cell table — (seed, bucket, total), ≤ depth×width rows —
    * from a stream of items. One narrow explode (×depth) plus one
    * map-side-combined aggregation; per-partition state is bounded by
    * the cell count, never the item cardinality.
    */
  def cmsCells(items: DataFrame, item: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "CMS needs depth >= 1, width >= 2")
    items
      .select(item.as("_it"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .select(col("seed"), (seedCol(col("seed"), col("_it")) % width).as("bucket"))
      .groupBy("seed", "bucket").agg(count(lit(1)).as("total"))
  }

  /** [[cmsCells]] from a pre-aggregated (item, count) relation: when a
    * frequency table already exists (an evaluation harness computes one
    * anyway), folding counts hashes each DISTINCT item `depth` times
    * instead of each occurrence — at sf0.1 that is 3.7 k md5 calls in
    * place of 1.6 M (the totals are identical by construction). Streams
    * with unbounded item cardinality should still use [[cmsCells]],
    * which never materializes per-item counts.
    */
  def cmsCellsFromCounts(counts: DataFrame, item: Column, cnt: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "CMS needs depth >= 1, width >= 2")
    counts
      .select(item.as("_it"), cnt.as("_c"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .select(col("seed"), (seedCol(col("seed"), col("_it")) % width).as("bucket"),
        col("_c"))
      .groupBy("seed", "bucket").agg(sum("_c").as("total"))
  }

  /** Point-query the sketch: each probe row gains `est_cnt` =
    * min over seeds of its cell counter — ≥ the true count always
    * (counters only ever overcount). `cells` is broadcast (≤ depth×width
    * rows); the probe relation is exploded ×depth then regrouped on its
    * key, so estimation cost scales with the probe set, not the corpus.
    * Probe ROWS must be distinct (the regroup is on all probe columns —
    * duplicate rows would collapse); same precondition for
    * [[bloomProbe]].
    */
  def cmsEstimate(probes: DataFrame, probe: Column, cells: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val keyed = probes.withColumn("_pk", probe)
    val pos = keyed
      .select(col("*"), explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .withColumn("bucket", seedCol(col("seed"), col("_pk")) % width)
    pos.join(broadcast(cells), Seq("seed", "bucket"))
      .groupBy(keyed.columns.map(col).toIndexedSeq: _*)
      .agg(min("total").as("est_cnt"))
      .drop("_pk")
  }

  /** Bloom bit set as a relation: the ≤ `bits` distinct positions lit by
    * `hashes` independent position functions over the build keys. This
    * IS the persistable artifact — m bits of portable state no matter
    * how many keys built it.
    */
  def bloomBits(keys: DataFrame, key: Column, hashes: Int, bits: Int): DataFrame = {
    require(hashes >= 1 && bits >= 2, "Bloom needs hashes >= 1, bits >= 2")
    keys
      .select(key.as("_bk"),
        explode(sequence(lit(0), lit(hashes - 1))).as("seed"))
      .select((seedCol(col("seed"), col("_bk")) % bits).as("pos"))
      .distinct()
  }

  /** Membership verdicts via a broadcast join against the bit relation:
    * each probe row gains `bloom_hit` — true iff all `hashes` positions
    * are lit (no false negatives, by construction). The probe stream is
    * exploded ×hashes and regrouped on its own columns; the bit relation
    * broadcasts.
    */
  def bloomProbe(probes: DataFrame, key: Column, bitsDf: DataFrame,
      hashes: Int, bits: Int): DataFrame = {
    val keyed = probes.withColumn("_pk", key)
    val pos = keyed
      .select(col("*"), explode(sequence(lit(0), lit(hashes - 1))).as("seed"))
      .withColumn("pos", seedCol(col("seed"), col("_pk")) % bits)
    pos.join(broadcast(bitsDf.withColumn("_lit", lit(1))), Seq("pos"), "left")
      .groupBy(keyed.columns.map(col).toIndexedSeq: _*)
      .agg((count(col("_lit")) === hashes).as("bloom_hit"))
      .drop("_pk")
  }

  /** Serving-path twin of [[bloomProbe]]: the bit relation — bounded by
    * `bits` BY CONSTRUCTION (bloomBits emits distinct positions modulo
    * `bits`), which is what justifies the collect — becomes a broadcast
    * BitSet probed in a narrow map: zero shuffle, zero explode, O(hashes)
    * per row. SketchSpec pins bit-identical verdicts against the
    * join formulation. The UDF is the right tool here: the kernel is six
    * BitSet lookups against broadcast state, and its algebra twin above
    * stays the oracle surface.
    */
  def bloomProbeSet(probes: DataFrame, key: Column, bitsDf: DataFrame,
      hashes: Int, bits: Int): DataFrame = {
    val spark = probes.sparkSession
    val lit0 = bitsDf.select(col("pos").cast("int")).collect().map(_.getInt(0))
    val bs = spark.sparkContext.broadcast(scala.collection.immutable.BitSet(lit0: _*))
    val hit = udf { (k: String) =>
      val set = bs.value
      (0 until hashes).forall { seed =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$k".getBytes("UTF-8"))
        // first 15 hex chars = high 60 bits of the first 8 digest bytes
        val h = java.lang.Long.parseUnsignedLong(
          d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
        set((h % bits).toInt)
      }
    }
    probes.withColumn("bloom_hit", hit(key.cast("string")))
  }

  /** Merge independently-built CMS cell tables (cell-wise sum) — the
    * property that makes the sketch usable at 100 TB: each shard
    * sketches its own slice, the ≤ depth×width cell tables union here,
    * and the merged sketch is IDENTICAL to one built over the whole
    * corpus (sums commute; SketchSpec pins it). Same contract for
    * [[bloomMerge]] (bit-set union) and KMV (union the per-shard
    * distinct-hash relations and re-rank — distinct-of-union is the
    * global distinct, so [[kmvDistinct]] over the union IS the merge).
    */
  def cmsMerge(cells: Seq[DataFrame]): DataFrame = {
    require(cells.nonEmpty, "nothing to merge")
    cells.reduce(_ unionByName _)
      .groupBy("seed", "bucket").agg(sum("total").as("total"))
  }

  /** Serve a log-structured CMS layout: streaming maintenance appends
    * each micro-batch's ≤ depth×width cell table under `path`
    * ([[graft.streaming.DocStream.cmsCellsSink]]), and the whole-stream
    * sketch is the cell-wise fold at read time — cmsMerge as a scan, no
    * read-modify-write cycle on the hot path, compaction-free because
    * the log grows by one bounded cell table per batch. Empty/absent
    * layout → empty cells (the sketch of nothing).
    */
  def cmsRead(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("seed", IntegerType), StructField("bucket", LongType),
      StructField("total", LongType)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(path)
      .groupBy("seed", "bucket").agg(sum("total").as("total"))
  }

  /** Merge Bloom bit relations built with the same (hashes, bits). */
  def bloomMerge(bitSets: Seq[DataFrame]): DataFrame = {
    require(bitSets.nonEmpty, "nothing to merge")
    bitSets.reduce(_ unionByName _).distinct()
  }

  /** [[cmsRead]]'s Bloom twin: fold a log of appended per-batch bit
    * relations ([[graft.streaming.DocStream.bloomBitsSink]]) into the
    * whole-stream bit set — distinct-union commutes, so append order
    * and batch boundaries are irrelevant. Absent layout → no bits lit.
    */
  def bloomRead(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("pos", LongType)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(path).distinct()
  }

  /** Binned quantile estimates — the two-aggregation sketch behind
    * "p50/p99 document length" dashboards at corpus scale: pass 1 is a
    * 3-scalar (min, max, n) aggregate; pass 2 reduces the corpus to
    * ≤ `nBins` equi-width bin counts (map-side combined); the quantile
    * arithmetic (cumulative counts + linear interpolation inside the
    * target bin) then runs on that bounded relation only. Estimate error
    * is bounded by one bin width. Output: (q, est_q) per requested
    * quantile, `est_q` rounded to 4 dp.
    *
    * The global cumulative window and the stats cross join both run over
    * bounded relations (≤ nBins rows; one row) — allowlisted in
    * PlanAudit with those size proofs.
    */
  def binnedQuantiles(df: DataFrame, value: Column, nBins: Int,
      qs: Seq[Double]): DataFrame = {
    require(nBins >= 2 && qs.nonEmpty, "need nBins >= 2 and at least one quantile")
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.agg(
      min(value).cast("double").as("mn"),
      max(value).cast("double").as("mx"),
      count(lit(1)).as("n"))
    val binned = df.crossJoin(broadcast(stats))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((value.cast("double") - col("mn")) /
              ((col("mx") - col("mn")) / nBins.toDouble)).cast("long"),
            lit((nBins - 1).toLong)))
          .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = binned.withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
    val qdf = qs.toDF("q")
    qdf.crossJoin(broadcast(stats))
      .join(cum,
        col("cum") >= col("q") * col("n").cast("double") &&
        (col("cum") - col("cnt")).cast("double") < col("q") * col("n").cast("double"))
      .select(col("q"),
        when(col("mx") === col("mn"), round(col("mn"), 4))
          .otherwise(round(
            col("mn") + ((col("mx") - col("mn")) / nBins.toDouble) *
              (col("bin").cast("double") +
                (col("q") * col("n").cast("double") -
                  (col("cum") - col("cnt")).cast("double")) /
                col("cnt").cast("double")), 4))
          .as("est_q"))
  }

  /** Fixed-grid histogram cells — (bin, cnt), ≤ nBins rows — over a
    * caller-pinned [lo, hi) domain, values clamped into the edge bins.
    * This is [[binnedQuantiles]]'s STREAMING form: because the bin edges
    * are pinned rather than derived from a global (min, max) pass, cells
    * MERGE BY SUM — per-shard histograms, micro-batch logs
    * ([[graft.streaming.DocStream.fixedBinsSink]]), and replayed reads
    * all fold to the whole-corpus histogram, the property the
    * data-dependent grid cannot have. Production pins the domain from
    * the first snapshot's stats (doc lengths, token counts — domains
    * that drift slowly); clamping makes outliers visible as edge-bin
    * mass rather than errors. NULL and NaN values are EXCLUDED (not
    * binned): without the filter, Spark's greatest/least null-skipping
    * would silently file nulls as hi-edge outlier mass, corrupting
    * quantile estimates and the PSI drift gate.
    */
  def fixedBins(df: DataFrame, value: Column, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, "need nBins >= 2 and hi > lo")
    val w = (hi - lo) / nBins
    val v = value.cast("double")
    df.where(v.isNotNull && !isnan(v))
      .select(
        greatest(lit(0L), least(lit((nBins - 1).toLong),
          floor((v - lo) / w).cast("long"))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** Merge independently-built fixed-grid cell relations (bin-wise sum)
    * — same shard-merge contract as [[cmsMerge]]. All inputs must share
    * the (lo, hi, nBins) grid.
    */
  def binsMerge(bins: Seq[DataFrame]): DataFrame = {
    require(bins.nonEmpty, "nothing to merge")
    bins.reduce(_ unionByName _).groupBy("bin").agg(sum("cnt").as("cnt"))
  }

  /** [[cmsRead]]'s histogram twin: fold a log of appended per-batch
    * [[fixedBins]] relations into the whole-stream histogram. Absent
    * layout → empty histogram.
    */
  def binsRead(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("bin", LongType), StructField("cnt", LongType)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(path)
      .groupBy("bin").agg(sum("cnt").as("cnt"))
  }

  /** Quantile estimates — (q, est_q), 4 dp — from a fixed-grid cell
    * relation (direct [[fixedBins]] output, a [[binsMerge]] fold, or a
    * [[binsRead]] log): cumulative counts plus linear interpolation
    * inside the target bin, the same arithmetic as [[binnedQuantiles]]'
    * tail. Error is bounded by one bin width PROVIDED the data lay
    * inside [lo, hi] (clamped outliers widen the edge bins' claim). All
    * relations here are bounded by nBins; no data → no rows.
    */
  def quantilesFromBins(binsRaw: DataFrame, lo: Double, hi: Double, nBins: Int,
      qs: Seq[Double]): DataFrame = {
    require(nBins >= 2 && hi > lo && qs.nonEmpty,
      "need nBins >= 2, hi > lo, and at least one quantile")
    // Defensive fold (bounded by nBins): accept raw appended sink logs
    // with duplicate bin rows, not just folded cell relations —
    // duplicates would otherwise inflate cumulative counts and emit
    // duplicate quantile rows.
    val bins = binsRaw.groupBy("bin").agg(sum("cnt").as("cnt"))
    val spark = bins.sparkSession
    import spark.implicits._
    val w = (hi - lo) / nBins
    val n = bins.agg(sum("cnt").as("n")).where(col("n").isNotNull)
    val cum = bins.withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
    qs.toDF("q").crossJoin(broadcast(n))
      .join(cum,
        col("cum") >= col("q") * col("n").cast("double") &&
        (col("cum") - col("cnt")).cast("double") < col("q") * col("n").cast("double"))
      .select(col("q"),
        round(lit(lo) + lit(w) *
          (col("bin").cast("double") +
            (col("q") * col("n").cast("double") -
              (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double")), 4)
          .as("est_q"))
  }

  /** Exact type-1 quantiles (the evaluation arm that grades the sketch):
    * value at rank ceil(q·n) via a cumulative window over the
    * DISTINCT-VALUE histogram — bounded by the value domain, not the
    * row count (document lengths, token counts and the like have
    * domains in the thousands at any corpus size). Output: (q, exact_q).
    */
  def exactQuantiles(df: DataFrame, value: Column, qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.agg(count(lit(1)).as("n"))
    val hv = df.groupBy(value.as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")))
    qs.toDF("q").crossJoin(broadcast(n))
      .join(hv, col("cum") >= ceil(col("q") * col("n").cast("double")))
      .groupBy("q").agg(min("v").as("exact_q"))
  }
}

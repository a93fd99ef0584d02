package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a narrow codegen'd map + TakeOrdered,
  * no shuffle of the corpus, scalable to any size (cost = one scan).
  * Scale path: random-hyperplane LSH bucketing so candidate generation
  * touches only matching buckets; planes are deterministic literals (seeded)
  * so signatures are reproducible across runs and engines.
  */
object Similarity {

  import org.apache.spark.sql.graftbridge.ColumnBridge
  import Dedup.cappedBuckets

  /** dot(a, b) in double via the native [[graft.functions.ArrayDot]]
    * expression — a primitive codegen loop; the zip_with+aggregate
    * equivalent evaluates interpreted per element.
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.ArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0d).otherwise(dot(a, b) / d)
  }

  def cosineToLiteral(vec: Column, query: Array[Float]): Column =
    cosine(vec, lit(query))

  /** Brute-force top-k by cosine to a literal query vector. */
  def topK(df: DataFrame, id: Column, vec: Column, query: Array[Float],
           k: Int): DataFrame =
    df.select(id.as("vec_id"), cosine(vec, lit(query)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)

  /** Batched brute-force cosine top-k — ONE corpus scan serves the whole
    * request batch (the dense twin of
    * [[InvertedIndex.bm25TopKBatch]]): each corpus row fans out to the
    * batch's (qid, query) pairs via a literal-struct explode
    * (request-sized by construction — a query batch is thousands of
    * vectors at most), and per-qid top-k goes through a rank window
    * whose `rk <= k` filter Spark rewrites to a WindowGroupLimit
    * per-partition prune, so only ≤ k rows per (partition, qid) ever
    * shuffle — never corpus × batch. Per query the rows are EXACTLY
    * [[topK]]'s (same ordering, same tie-break); batching changes the
    * cost, never an answer. Output: (qid, vec_id, sim).
    */
  def topKBatch(df: DataFrame, id: Column, vec: Column,
      queries: Seq[(String, Array[Float])], k: Int): DataFrame = {
    require(queries.nonEmpty, "topKBatch: empty query batch")
    require(k > 0, s"topKBatch: k must be positive (got $k)")
    import org.apache.spark.sql.expressions.Window
    val batch = array(queries.map { case (qid, qv) =>
      struct(lit(qid).as("qid"), lit(qv).as("qv")) }: _*)
    df.select(id.as("vec_id"), vec.as("_v"), explode(batch).as("_q"))
      .select(col("_q.qid").as("qid"), col("vec_id"),
        cosine(col("_v"), col("_q.qv")).as("sim"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("_rk") <= k).drop("_rk")
  }

  /** Exact near-dup pairs above a cosine threshold within an id-bounded
    * slice (the bounded slice keeps the quadratic candidate set fixed-size
    * at any scale factor; the unbounded scale path is [[annNearDupPairs]]).
    */
  /** Unit-normalize once so pair similarity is a bare dot product — norms
    * are computed N times instead of N² times in any pairwise stage.
    * Native codegen kernel ([[graft.functions.ArrayNormalize]]): the
    * column-algebra `transform(v, x -> x / sqrt(dot(v,v)))` re-evaluates
    * the norm per ELEMENT (no CSE across lambda bodies) — O(dim²)
    * interpreted per row vs one primitive O(dim) loop.
    */
  def normalized(vec: Column): Column =
    ColumnBridge.column(graft.functions.ArrayNormalize(
      ColumnBridge.expression(vec)))

  def neardupPairsExact(df: DataFrame, id: Column, vec: Column,
                        threshold: Double, maxId: Long): DataFrame = {
    val s = df.where(id < maxId).select(id.as("id"), normalized(vec).as("v"))
    val a = s.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = s.select(col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("v_a"), col("v_b")))
      .where(col("sim") > threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Deterministic random hyperplanes: `tables` tables × `bits` planes. */
  def hyperplanes(dim: Int, tables: Int, bits: Int, seed: Long = 42L)
      : Seq[Seq[Array[Double]]] = {
    val rnd = new Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Pack sign bits of plane dot products into one bucket key per table. */
  def signature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, lit(p)) > 0, lit(1L << i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF/LSH-bucketed ANN top-k: candidates = rows sharing any table's
    * bucket with the query, then exact cosine rank. At 100 TB the bucket
    * join replaces the full scan: each table's groupBy key is the bucket id,
    * and only matching buckets are read when the bucket column is used for
    * partitioning/Z-ordering at write time.
    */
  def annTopK(df: DataFrame, id: Column, vec: Column, query: Array[Float],
              k: Int, dim: Int = 64, tables: Int = 8, bits: Int = 12): DataFrame = {
    val planes = hyperplanes(dim, tables, bits)
    val queryCol = lit(query)
    val sigCols = planes.zipWithIndex.map { case (tp, t) =>
      signature(vec, tp).as(s"sig_$t")
    }
    // query signatures evaluated on a literal, per table
    val querySigs: Seq[(Int, Column)] = planes.zipWithIndex.map { case (tp, t) =>
      t -> signature(queryCol, tp)
    }
    val withSigs = df.select((Seq(id.as("vec_id"), vec.as("v")) ++ sigCols): _*)
    val candidate = querySigs.map { case (t, qs) => col(s"sig_$t") === qs }
      .reduce(_ || _)
    withSigs.where(candidate)
      .select(col("vec_id"), cosine(col("v"), queryCol).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) index: k-means coarse quantizer over the corpus;
    * every vector is assigned to its nearest centroid. At scale the
    * assignment column becomes the partitioning/bucketing key at write
    * time, so probing reads only nProbe/k of the data.
    */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  def ivfIndex(df: DataFrame, id: Column, vec: Column, k: Int,
               seed: Long = 42L, maxIter: Int = 10): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = df.select(id.as("vec_id"), normalized(vec).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(prepared.select("features"))
    val assigned = model.transform(prepared)
      .select(col("vec_id"), col("v"), col("prediction").as("centroid_id"))
    IvfIndex(model.clusterCenters.map(_.toArray), assigned)
  }

  /** IVF top-k: probe the `nProbe` centroids nearest to the query, exact
    * cosine rank within the probed cells only.
    */
  def ivfTopK(index: IvfIndex, query: Array[Float], k: Int, nProbe: Int): DataFrame = {
    val qn = {
      val n = math.sqrt(query.map(x => x.toDouble * x).sum)
      if (n == 0) query.map(_.toDouble) else query.map(_ / n)
    }
    val probes = index.centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(qn).map { case (a, b) => a * b }.sum
        (i, d)
      }
      .sortBy(-_._2).take(nProbe).map(_._1)
    index.assigned
      .where(col("centroid_id").isin(probes.toSeq: _*))
      .select(col("vec_id"), dot(col("v"), lit(qn)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Symmetric int8 scalar quantization of an embedding column: per-vector
    * scale = max|x| / 127, values rounded to [-127, 127] bytes — the
    * standard 4× storage/bandwidth cut for embedding corpora (at 100 TB
    * the shuffle and scan both shrink 4×, and dot products stay one
    * int-multiply kernel). Single JVM pass per vector; half-away-from-zero
    * rounding matches both Spark's ROUND and DuckDB's round().
    */
  val quantizeUdf = org.apache.spark.sql.functions.udf { (v: Seq[Float]) =>
    if (v == null) None
    else {
      var amax = 0d
      v.foreach { x => val a = math.abs(x.toDouble); if (a > amax) amax = a }
      val scale = if (amax == 0) 1d else amax / 127d
      val q = new Array[Byte](v.length)
      var i = 0
      while (i < v.length) {
        val r = math.min(127L, math.round(math.abs(v(i).toDouble) / scale))
        q(i) = (if (v(i) < 0) -r else r).toByte
        i += 1
      }
      Some((scale, q.toSeq))
    }
  }

  /** Reconstruct doubles from the quantized form: x ≈ q * scale. */
  def dequantize(scale: Column, q: Column): Column =
    transform(q, b => b.cast("double") * scale)

  /** Write an IVF-partitioned embedding layout: vectors land in
    * `centroid_id=…` directories (k-means coarse quantizer), centroids in
    * an underscore-prefixed sidecar the parquet reader ignores. This is
    * the 100 TB serving path: a probe query reads ~nProbe/k of the corpus
    * through directory-level PartitionFilters before any row is touched.
    */
  def writeIvfPartitioned(df: DataFrame, id: Column, vec: Column, k: Int,
                          path: String, seed: Long = 42L,
                          maxIter: Int = 10): IvfIndex = {
    val spark = df.sparkSession
    val index = ivfIndex(df, id, vec, k, seed, maxIter)
    index.assigned.write.mode("overwrite")
      .partitionBy("centroid_id").parquet(path)
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
    index
  }

  /** Probe-only top-k over the partitioned layout: rank within the
    * `nProbe` nearest centroid directories only (plain `centroid_id IN`
    * predicate → PartitionFilters, so unprobed directories are never
    * listed, scanned, or shuffled).
    */
  def ivfTopKFromDisk(spark: org.apache.spark.sql.SparkSession, path: String,
                      query: Array[Float], k: Int, nProbe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/_centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val qn = {
      val n = math.sqrt(query.map(x => x.toDouble * x).sum)
      if (n == 0) query.map(_.toDouble) else query.map(_ / n)
    }
    val probes = centroids
      .map { case (i, c) => (i, c.zip(qn).map { case (a, b) => a * b }.sum) }
      .sortBy(-_._2).take(nProbe).map(_._1)
    spark.read.parquet(path)
      .where(col("centroid_id").isin(probes.toSeq: _*))
      .select(col("vec_id"), dot(col("v"), lit(qn)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Sentinel for `bits`: derive the hyperplane count from the corpus
    * size so the mean bucket load stays ~[[AnnTargetBucketLoad]].
    */
  val AutoBits = 0

  /** Target mean vectors per LSH bucket for auto bit-width. */
  val AnnTargetBucketLoad = 8

  /** bits = ⌈log₂(n / target)⌉ clamped to [6, 22]. A FIXED bit-width is
    * the classic LSH scale bug this replaces: with b bits there are only
    * 2^b buckets per table, so the mean bucket load grows as n/2^b and
    * once every bucket saturates its cap the candidate volume is
    * tables·2^b·cap²/2 — at 100× the bench scale a pinned b=10 put ~200
    * vectors in EVERY bucket and the verify join shuffled tens of GB
    * (caught by the sf10 run, SCALING.md). Growing bits with log n keeps
    * the load — and so the candidate count per vector — constant, which
    * is the standard LSH discipline: collision probability must come from
    * similarity, not from bucket-space exhaustion. The recall cost of
    * wider signatures is recovered by raising `tables` (cost is linear in
    * tables), never by shrinking bits.
    */
  def annBitsFor(n: Long): Int = {
    val buckets = math.max(1.0, n.toDouble / AnnTargetBucketLoad)
    math.min(22, math.max(6, math.ceil(math.log(buckets) / math.log(2)).toInt))
  }

  /** ANN near-dup pairs: bucket grouping per table, verify cosine.
    *
    * Candidate generation shuffles (table, bucket, id) triples ONLY — the
    * full vectors would otherwise ride the explode ×tables copies through
    * the exchange. Buckets are built by groupBy + sorted collect_list and
    * pairs explode with plain column algebra, the same shape as
    * [[Dedup.minhashNearDupPairs]] — grouping instead of a bucket
    * self-join scans the signature lineage once, not twice. Oversized
    * buckets (near-zero or duplicated embeddings collapsing onto one
    * signature) are TRUNCATED to their first `maxBucketSize` sorted
    * members, the same skew guard every sibling LSH path carries: an
    * uncapped hot bucket is |bucket|² candidate rows — the classic
    * skewed-key scale-killer at 100 TB. Truncation (not dropping) keeps
    * recall on large exact-duplicate clusters — at corpus scale a
    * 10⁶-copy boilerplate page collapses onto one signature, and those
    * are the highest-value dedup targets; the first `cap` members still
    * pair with each other (and transitive closure over the shared members
    * collapses the cluster), while cost stays ≤ cap²/2 per bucket.
    * The cap is applied by a `row_number` window over the SAME
    * (table, bucket) partitioning the collect_list groupBy needs — Spark
    * reuses the exchange, and the aggregation buffer is bounded at `cap`
    * ids instead of materializing the full hot bucket before slicing.
    * Vectors are joined back by id exactly once for the verify, so
    * candidate cardinality ~ O(near-dups), not O(corpus²).
    */
  def annNearDupPairs(df: DataFrame, id: Column, vec: Column,
                      threshold: Double, dim: Int = 64, tables: Int = 6,
                      bits: Int = AutoBits, maxBucketSize: Int = 200): DataFrame = {
    require(maxBucketSize >= 2,
      s"maxBucketSize must be >= 2 (got $maxBucketSize) — a smaller cap silently yields no pairs")
    // auto bit-width from ONE column-pruned count (the semanticDedup
    // pattern); explicit bits pin the signature for fixture-stable tests
    val bitsEff = if (bits == AutoBits) annBitsFor(df.count()) else bits
    val planes = hyperplanes(dim, tables, bitsEff)
    val prepared = df.select(id.as("id"), normalized(vec).as("v"))
    val tagged = prepared.select(col("id"),
      posexplode(array(planes.map(tp => signature(col("v"), tp)): _*))
        .as(Seq("table_idx", "bucket")))
    val buckets = cappedBuckets(tagged, Seq("table_idx", "bucket"), "id", maxBucketSize)
    val candidates = buckets
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // single vector pass + single join (pairs explode to member ids, the
    // vector table joins once, the pair reassembles by grouping) — the
    // separate A/B projections would scan and shuffle the normalized
    // corpus twice
    val sides = candidates.select(col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as("id"))
    sides.join(prepared, "id")
      .groupBy("id_a", "id_b")
      .agg(
        first(when(col("id") === col("id_a"), col("v")), ignoreNulls = true).as("v_a"),
        first(when(col("id") === col("id_b"), col("v")), ignoreNulls = true).as("v_b"))
      .where(col("v_a").isNotNull && col("v_b").isNotNull)
      .withColumn("sim", dot(col("v_a"), col("v_b")))
      .where(col("sim") > threshold)
      .select("id_a", "id_b", "sim")
  }

  /** SemDeDup-style semantic dedup: cluster the corpus with a coarse
    * quantizer, then search near-duplicate pairs WITHIN each cluster only —
    * the cross-cluster pair space (the overwhelming majority at scale) is
    * never generated. Centroids here are the `k` smallest-id vectors — a
    * deterministic seed pick that both engines can replay, where a
    * production pipeline would plug in [[ivfIndex]]'s k-means centers; the
    * assignment is nearest-centroid by cosine (ties → smallest centroid id,
    * via strict-> over ascending centroid order).
    *
    * Scale shape: the assignment is a narrow map against k broadcast
    * centroids (no join) — a codegen'd literal-column argmax fold for
    * small k, a broadcast-array kernel past [[FoldAssignMaxK]] (Catalyst
    * analysis and codegen degrade with thousands of literal columns; the
    * kernel carries k only as broadcast data). The pair stage is the same
    * capped-bucket shape as the LSH paths: groupBy(cid) + sorted
    * collect_list + slice-explosion — ONE scan of the assignment lineage
    * (the previous a×b self-join on cid scanned it twice, plus a third
    * pass for the size gate), with the cluster cap applied structurally
    * by the shared row_number window. Cluster count governs both skew and
    * cost: k ~ √n gives cells of ~√n vectors, so the within-cluster pair
    * space is ~n total instead of n² — pass k ≤ 0 to derive it from a
    * cheap count ([[semanticDedupAutoK]]); past ~10⁵ centroids the
    * driver-collected seed table itself is the limit and the k-means
    * [[ivfIndex]] (distributed assignment, no id-seed collect) is the
    * production quantizer.
    *
    * `maxClusterSize` guards residual skew (much of a corpus collapsing
    * into one cell): oversized cells are TRUNCATED to their first
    * `maxClusterSize` sorted members before any pair is generated —
    * recall on giant duplicate clusters survives (see
    * [[Dedup.cappedBuckets]]), cost stays ≤ cap²/2 per cell. The default
    * [[AutoClusterCap]] derives a finite 10·√n cap from the same count —
    * an opt-in guard protects nobody at 100 TB; callers wanting the
    * unbounded pair space must say `Int.MaxValue` explicitly.
    */
  def semanticDedupAutoK(n: Long): Int =
    math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Sentinel for `maxClusterSize`: derive 10·√n from the corpus count. */
  val AutoClusterCap = 0

  def semanticDedupAutoClusterCap(n: Long): Int =
    math.max(64, 10 * math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Above this k the assignment switches from the literal-column argmax
    * fold to the broadcast-array kernel (PipelineOpsSpec pins the two
    * paths value-identical).
    */
  val FoldAssignMaxK = 64

  /** Nearest-centroid-by-cosine assignment of unit vectors `(id, v)`:
    * adds `cid`. Similarities are rounded to 6 dp BEFORE the argmax:
    * different engines (and summation orders) agree on cosine only to
    * ~1e-15, and an unrounded argmax would let an ulp flip cluster
    * assignment across engines — the same cross-engine discipline as
    * TfIdf's pre-rank rounding. Ties go to the earliest centroid (strict
    * `>` over ascending order) on both paths.
    */
  private[llm] def assignClusters(s: DataFrame,
      centroids: Array[(Long, Array[Double])], viaFold: Boolean): DataFrame = {
    if (viaFold) {
      // bind each centroid similarity once (the argmax fold then compares
      // attributes — same bound-column pattern as TextStats.withLangId)
      val simCols = centroids.zipWithIndex.map { case ((_, cv), i) =>
        round(dot(col("v"), lit(cv)), 6).as(s"_csim_$i")
      }
      val withSims = s.select(col("id") +: col("v") +: simCols: _*)
      // LINEAR argmax (round 15): the old when/otherwise foldLeft
      // referenced its accumulator twice per step (condition + otherwise),
      // so the expression tree — and the generated code — DOUBLED per
      // centroid: 2^k nodes, which at k = 20 cost the optimizer minutes
      // of TreeNode transforms per query (guide §7.3 "planning a huge
      // query") and blew past JIT code-size limits. greatest() over
      // (sim, -index, cid) structs is one k-child expression: struct
      // ordering compares sim first, then -index, so equal sims resolve
      // to the EARLIEST centroid — exactly the fold's strict-> tie-break
      // (spec-pinned value-identical against the broadcast kernel).
      val entries = centroids.zipWithIndex.map { case ((cid, _), i) =>
        struct(col(s"_csim_$i").as("sim"), lit(-i).as("_ord"),
          lit(cid).as("cid"))
      }
      val best =
        if (entries.length == 1) entries.head else greatest(entries.toIndexedSeq: _*)
      withSims.withColumn("cid", best.getField("cid"))
        .drop(centroids.indices.map(i => s"_csim_$i"): _*)
    } else {
      // broadcast-array kernel: k rides as data, not as plan width. The
      // rounding must be bit-identical to Spark's round() on the fold
      // path: Round on DoubleType goes through BigDecimal.decimal HALF_UP
      val bc = s.sparkSession.sparkContext.broadcast(centroids)
      val nearest = udf { (v: Seq[Double]) =>
        val cs = bc.value
        var bestCid = cs(0)._1
        var bestSim = Double.NegativeInfinity
        var i = 0
        while (i < cs.length) {
          val c = cs(i)._2
          var d = 0d
          var j = 0
          val m = math.min(c.length, v.length)
          while (j < m) { d += v(j) * c(j); j += 1 }
          val sim = BigDecimal.decimal(d)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (sim > bestSim) { bestSim = sim; bestCid = cs(i)._1 }
          i += 1
        }
        bestCid
      }
      s.withColumn("cid", nearest(col("v")))
    }
  }

  def semanticDedupPairs(df: DataFrame, id: Column, vec: Column, k: Int,
      threshold: Double, maxId: Long = Long.MaxValue,
      maxClusterSize: Int = AutoClusterCap): DataFrame = {
    require(maxClusterSize >= 0,
      s"maxClusterSize must be >= 1, or $AutoClusterCap for the 10·√n default (got $maxClusterSize)")
    val bounded = df.where(id < maxId)
    // auto parameters come from ONE count of the raw slice (column-pruned,
    // often metadata-only) — not of the normalized projection
    lazy val n = bounded.count()
    val kEff = if (k > 0) k else semanticDedupAutoK(n)
    val capEff =
      if (maxClusterSize == AutoClusterCap) semanticDedupAutoClusterCap(n)
      else maxClusterSize
    val s = bounded.select(id.as("id"), normalized(vec).as("v"))
    val centroids: Array[(Long, Array[Double])] = s.orderBy("id").limit(kEff)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(centroids.nonEmpty, "semanticDedupPairs: empty corpus slice")
    val assigned = assignClusters(s, centroids, viaFold = kEff <= FoldAssignMaxK)
    // ONE scan builds the (capped) cluster member lists; clusters are
    // disjoint so no cross-bucket pair dedup is needed
    val buckets = cappedBuckets(assigned.select("cid", "id"), Seq("cid"), "id", capEff)
    val candidates = buckets
      .select(col("cid"), col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("cid"), col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
    // verify: pairs explode to member ids, the vector table joins ONCE by
    // id, the pair reassembles by grouping (the minhash/ANN verify shape)
    val sides = candidates.select(col("cid"), col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as("id"))
    sides.join(s, "id")
      .groupBy("cid", "id_a", "id_b")
      .agg(
        first(when(col("id") === col("id_a"), col("v")), ignoreNulls = true).as("v_a"),
        first(when(col("id") === col("id_b"), col("v")), ignoreNulls = true).as("v_b"))
      .where(col("v_a").isNotNull && col("v_b").isNotNull)
      .where(round(dot(col("v_a"), col("v_b")), 6) > threshold)
      .select(col("id_a"), col("id_b"), col("cid"))
  }

  /** Hard-negative mining for contrastive / embedding-model training: for
    * each anchor vector, the `k` most-similar corpus vectors carrying a
    * DIFFERENT label — the "looks like the anchor but isn't" examples that
    * make the hardest training negatives.
    *
    * Scale shape: the anchor set is collected and broadcast (BOUNDED BY
    * CONTRACT — anchors are a probe set, thousands at most; the
    * [[Decontaminate.embeddingContamination]] bench pattern). The corpus
    * side is one narrow kernel pass emitting (anchor, sim) structs —
    * |anchors| fused multiply-adds per row, no join, no shuffle of
    * vectors — followed by [[graft.operators.TopK.perGroup]] on the
    * anchor id: ONE shuffle of slim (anchor, sim, id) triples, per-group
    * sort only. Similarities round to 6 dp inside the kernel (BigDecimal
    * HALF_UP, the cross-engine pre-rank discipline); ties break on the
    * corpus id.
    *
    * The kernel runs in a projection SEPARATE from the explode — a UDF in
    * the same select as a generator re-evaluates per generated element.
    */
  /** Hard ceiling on the broadcast anchor set: the collect below is
    * request-sized BY CONTRACT, and this bound turns a misuse (pointing
    * `anchors` at a corpus-sized relation) into a loud error instead of
    * a driver OOM. Override with a conscious
    * `graft.hardNegatives.maxAnchors` spark conf when a genuinely
    * larger probe set is intended.
    */
  val DefaultMaxAnchors = 100000

  def hardNegatives(corpus: DataFrame, id: Column, vec: Column,
      label: Column, anchors: DataFrame, anchorId: Column, anchorVec: Column,
      anchorLabel: Column, k: Int): DataFrame = {
    require(k > 0, s"hardNegatives: k must be positive (got $k)")
    val maxAnchors = corpus.sparkSession.conf
      .getOption("graft.hardNegatives.maxAnchors")
      .map(_.toInt).getOrElse(DefaultMaxAnchors)
    val anchorRows: Array[(Long, Long, Array[Double])] = anchors
      .select(anchorId.cast("long").as("aid"), anchorLabel.cast("long").as("albl"),
        normalized(anchorVec).as("av"))
      .limit(maxAnchors + 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    require(anchorRows.length <= maxAnchors,
      s"hardNegatives: anchor set exceeds $maxAnchors rows — anchors are a " +
        "request-sized probe set, not a corpus; raise " +
        "graft.hardNegatives.maxAnchors only if that scale is intended")
    require(anchorRows.nonEmpty, "hardNegatives: empty anchor set")
    val bc = corpus.sparkSession.sparkContext.broadcast(anchorRows)
    val sims = udf { (v: Seq[Double], lbl: Long) =>
      val as = bc.value
      val out = Array.newBuilder[(Long, Double)]
      var i = 0
      while (i < as.length) {
        val (aid, albl, av) = as(i)
        if (albl != lbl) {
          var d = 0d
          var j = 0
          val m = math.min(av.length, v.length)
          while (j < m) { d += v(j) * av(j); j += 1 }
          out += ((aid, BigDecimal.decimal(d)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
        i += 1
      }
      out.result()
    }
    val scored = corpus
      .select(id.as("id"), normalized(vec).as("_v"), label.cast("long").as("_l"))
      .select(col("id"), sims(col("_v"), col("_l")).as("_s"))
      .select(col("id"), explode(col("_s")).as("_e"))
      .select(col("_e._1").as("anchor_id"), col("id"), col("_e._2").as("sim"))
    graft.operators.TopK.perGroup(scored, col("anchor_id"), col("sim"),
        col("id"), k)
      .select(col("anchor_id"), col("rk").cast("long").as("rk"), col("id"),
        col("sim"))
  }
}

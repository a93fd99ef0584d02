package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed IVF-PQ index as an operator API — the standard 100-TB
  * ANN serving layout (Jégou et al. 2011; the IVFADC system shape):
  * a coarse k-means quantizer partitions the corpus into `cluster=…`
  * directories, each vector is stored as its m PQ code bytes, and a
  * query (a CLIENT-SUPPLIED float vector — serving never runs a Spark
  * job to obtain it, VERDICT r8 item 9) reads only its nProbe nearest
  * clusters' partitions and ADC-scores the stored codes against an
  * m × k broadcast distance table.
  *
  * Both models (coarse centroids, PQ codebooks) are FROZEN artifacts:
  * training happens once ([[Cluster.fitCentroids]] /
  * [[ProductQuant.fit]]); build, append, and serve all take the trained
  * arrays. A frozen model is exactly what makes incremental encode
  * valid — [[append]] encodes ONLY a delta snapshot (cost ∝ delta
  * size) and, because per-row encoding is deterministic and serving is
  * a set computation over stored rows, an appended index serves
  * bit-identically to a full rebuild.
  *
  * Serving refinement ([[serveReranked]], VERDICT r8 item 2): ADC
  * ranks by quantized distance, so its top-k loses recall to code
  * granularity. The production fix is a two-stage read — ADC top-R
  * (R ≫ k, still ≪ corpus) from code bytes only, then fetch just those
  * R raw vectors and re-rank by exact distance. Recall approaches the
  * exact scan's while raw-vector reads stay R/n of the corpus.
  */
object IvfPq {

  /** The nProbe cluster ids nearest to `query`: 6-dp-rounded squared L2
    * to each coarse centroid, ties to the lower cid — k driver-side
    * scalars, no Spark job ([[Cluster]]'s determinism discipline).
    */
  def probeOrder(cents: Array[Array[Double]], query: Array[Double],
      nProbe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var t = 0
      while (t < c.length) { val x = query(t) - c(t); d += x * x; t += 1 }
      (math.floor(d * 1e6 + 0.5) / 1e6, i)
    }.sortBy(p => (p._1, p._2)).take(nProbe).map(_._2).toSeq

  /** Encode `df`'s vectors against the frozen models and persist the
    * index under `path`: (id, codes, gen) rows in `cluster=…`
    * directories. One narrow encode/assign pass + the partitioned
    * write; by default the on-disk index holds code bytes only, never
    * raw vectors. `storeRaw = true` additionally stores each row's raw
    * vector in a `vec` column (FAISS's IndexRefineFlat / Lucene's
    * stored-vector shape): parquet column pruning keeps it OFF every
    * ADC serve's scan, and [[serveRerankedFromIndex]] reads it from
    * just the probed partitions — so the exact re-rank needs no corpus
    * table at serve time. `gen` is the maintenance generation
    * ([[graft.llm.InvertedIndex]]'s sequence-number discipline:
    * tombstones kill only older rows, so upsert = delete + append needs
    * no rebuild).
    */
  def write(df: DataFrame, id: Column, vec: Column,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      path: String, storeRaw: Boolean = false): Unit = {
    encoded(df, id, vec, cents, pqCents, storeRaw)
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    writeGen(df.sparkSession, path, 0L)
  }

  /** Whether the index stores raw vectors alongside its codes. */
  def hasRaw(spark: SparkSession, path: String): Boolean =
    readCached(spark, path).schema.fieldNames.contains("vec")

  /** Relation-cached read of the index ([[graft.llm.InvertedIndex]]'s
    * readCached discipline — Lucene's open-index-reader shape): an
    * uncached `spark.read.parquet` pays schema inference (a small Spark
    * job) AND a fresh file-index listing of every cluster directory on
    * EVERY call — at √n-sized coarse k that listing alone dominated a
    * serve's latency. The resolved DataFrame (schema + file index) is
    * memoized per (session, path) against the `_gen` sidecar's file
    * listing, which every maintenance verb rewrites ([[writeGen]]), so
    * a stale relation can never serve; a warm serve's construction makes
    * one single-directory listStatus call.
    */
  private val relationCache = new RelationCache()

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_gen")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sig = fs.listStatus(p).map(s =>
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")
    relationCache.getOrResolve(spark, path, sig)(spark.read.parquet(path))
  }

  /** Merge a delta snapshot into an existing index: encode ONLY the
    * delta against the same frozen models and append into the same
    * cluster directories — cost ∝ delta size, never corpus size.
    * Delta ids are NEW or upserts whose old versions a preceding
    * [[delete]] tombstoned; per-row encoding is deterministic, so
    * append ≡ rebuild for every serving read. The delta inherits the
    * index's layout: a raw-stored index stays raw-stored.
    */
  def append(df: DataFrame, id: Column, vec: Column,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      path: String): Unit = {
    val spark = df.sparkSession
    val gen = readGen(spark, path) + 1
    encoded(df, id, vec, cents, pqCents, hasRaw(spark, path))
      .withColumn("gen", lit(gen))
      .write.mode("append").partitionBy("cluster").parquet(path)
    writeGen(spark, path, gen)
  }

  /** Apply a (id, vector, op) change feed to a live vector index:
    * upsert re-embeds, delete removes — two delta-sized steps (see
    * [[graft.llm.InvertedIndex.applyChangeFeed]] for the generation
    * argument; [[compact]] makes the removal physical).
    */
  def applyChangeFeed(feed: DataFrame, id: Column, vec: Column,
      op: Column, path: String, cents: Array[Array[Double]],
      pqCents: Array[Array[Array[Double]]]): Unit = {
    val spark = feed.sparkSession
    delete(spark, path, feed.select(id.as("id")), col("id"))
    append(feed.where(op === "upsert"), id, vec, cents, pqCents, path)
  }

  private def writeGen(spark: SparkSession, path: String, gen: Long): Unit =
    // driver-direct one-row write (round 14): the generation pointer is
    // metadata; a Spark job per verb was pure scheduling overhead
    SidecarIO.writeRow(spark.sparkContext.hadoopConfiguration,
      s"$path/_gen", overwrite = true, Seq("gen" -> gen))

  /** The index's current generation (0 after a fresh write, compact, or
    * merge) — the [[graft.llm.InvertedIndex.readGen]] twin. Driver-direct
    * read: one tiny file, no Spark job.
    */
  def readGen(spark: SparkSession, path: String): Long =
    SidecarIO.readRows(spark.sparkContext.hadoopConfiguration,
      s"$path/_gen").head("gen").asInstanceOf[Long]

  private def encoded(df: DataFrame, id: Column, vec: Column,
      cents: Array[Array[Double]],
      pqCents: Array[Array[Array[Double]]],
      keepRaw: Boolean = false): DataFrame = {
    // ONE projection (round 14, guide §2.4): PQ codes, the coarse
    // cluster, and the optional raw vector are all per-row kernels over
    // the same row — the r13 shape computed them as separate relations
    // and re-stitched with two id joins, i.e. two corpus-wide exchanges
    // per build/append for values that never left the row. Kernels and
    // models are unchanged (same codes, same cluster, spec-pinned
    // append ≡ rebuild), so the written rows are identical.
    val m = pqCents.length
    val sub = pqCents(0)(0).length
    val bcPq = df.sparkSession.sparkContext.broadcast(pqCents)
    val codesU = udf { (v: Seq[Float]) =>
      Array.tabulate(m)(j =>
        Cluster.assign(v.slice(j * sub, (j + 1) * sub), bcPq.value(j))._1)
    }
    val clusterU = udf { (v: Seq[Float]) => Cluster.assign(v, cents)._1 }
    val cols = Seq(id.as("id"), codesU(vec).as("codes"),
      clusterU(vec).as("cluster")) ++
      (if (keepRaw) Seq(vec.as("vec")) else Seq.empty)
    df.select(cols: _*)
  }

  /** Lucene-style deletes for the vector index: an O(|delete|)
    * tombstone write ([[graft.llm.InvertedIndex.delete]]'s discipline)
    * makes the ids invisible to every serve immediately; [[compact]]
    * reclaims their code rows. Deleting an absent id is a no-op.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      id: Column): Unit = {
    val gen = readGen(spark, path) + 1
    ids.select(id.cast("long").as("id")).distinct()
      .withColumn("gen", lit(gen))
      .coalesce(1).write.mode("append").parquet(s"$path/_tombstones")
    writeGen(spark, path, gen)
  }

  private def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path, "_tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).distinct())
    else None
  }

  /** `rows` minus tombstoned ones — a row dies only to a strictly
    * newer-generation tombstone (broadcast anti-join, delete-sized).
    * With `asOfGen` set, the index is served AS OF that generation:
    * later rows and later tombstones don't exist yet (the vector twin
    * of [[graft.llm.InvertedIndex]]'s time travel; no corpus scalars to
    * version here, so row/tombstone visibility is the whole story).
    */
  private def liveRows(spark: SparkSession, path: String,
      rows: DataFrame, asOfGen: Option[Long] = None): DataFrame = {
    val visible = asOfGen.fold(rows)(g => rows.where(col("gen") <= g))
    tombstones(spark, path).map { t =>
      asOfGen.fold(t)(g => t.where(col("gen") <= g))
    } match {
      case Some(t) =>
        val dead = t.select(col("id").as("_t_id"), col("gen").as("_t_gen"))
        visible.join(broadcast(dead),
          visible("id") === col("_t_id") && visible("gen") < col("_t_gen"),
          "left_anti")
      case None => visible
    }
  }

  /** Rewrite the index without its tombstoned ids: one index-sized
    * (never corpus-sized) pass — anti-join the tombstones, repartition
    * by cluster (ONE file per cluster directory, healing [[append]]'s
    * small-file accumulation), delete-then-rename swap. Codes are
    * deterministic per row, so the compacted index is content-equal to
    * a fresh [[write]] over the survivors (spec-pinned).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    val survivors = liveRows(spark, path, spark.read.parquet(path))
    // generations reset: with the tombstones gone, history is spent.
    // Schema-preserving: a raw-stored index keeps its vectors.
    survivors
      .drop("gen").withColumn("gen", lit(0L))
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path)), s"rename $tmp -> $path failed")
    writeGen(spark, path, 0L)
  }

  /** Merge several vector indexes into one at `dst` — the vector twin
    * of [[graft.llm.InvertedIndex.merge]] (Lucene segment merging for
    * federated builds: per-source / per-day / per-tenant indexes
    * unified for serving). Index-sized, no corpus scan, no re-encode:
    * each source's LIVE rows (tombstones applied) union into one
    * cluster-partitioned rewrite, generations reset. Contract: sources
    * were encoded against the SAME frozen models (cluster ids and code
    * words are meaningless across different codebooks — same reason
    * [[InvertedIndex.merge]] requires equal bucket counts) and their id
    * sets are disjoint; raw-stored and code-only indexes don't mix.
    * Per-row encoding is deterministic, so the merged index serves
    * bit-identically to a fresh [[write]] over the union of the
    * surviving rows' source vectors (spec-pinned; q_ivfpq_merge
    * hash-checks it against the rebuilt oracle).
    */
  def merge(spark: SparkSession, sources: Seq[String], dst: String): Unit = {
    require(sources.nonEmpty, "need at least one source index")
    val raws = sources.map(hasRaw(spark, _))
    require(raws.distinct.size == 1,
      "cannot merge raw-stored and code-only indexes")
    val live = sources.map(p => liveRows(spark, p, spark.read.parquet(p)))
    live.reduce(_ unionByName _)
      .drop("gen").withColumn("gen", lit(0L))
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(dst)
    writeGen(spark, dst, 0L)
  }

  /** The probed partition scan for `query` — `cluster IN (…)` becomes
    * PartitionFilters, so unprobed directories are never listed or
    * read; tombstoned ids (if any [[delete]] ran since the last
    * [[compact]]) are anti-joined out before scoring. Shared by
    * [[serve]] and [[serveReranked]].
    */
  def probedCodes(spark: SparkSession, path: String,
      cents: Array[Array[Double]], query: Array[Double],
      nProbe: Int, asOfGen: Option[Long] = None): DataFrame = {
    val probes = probeOrder(cents, query, nProbe)
    liveRows(spark, path, readCached(spark, path)
      .where(col("cluster").isin(probes: _*)), asOfGen)
  }

  /** ADC top-`topK` for a client-supplied `query` vector: reads ONLY
    * the probed partitions' code bytes and scores them against the
    * broadcast m × k table ([[ProductQuant.adcFromCodes]]). No raw
    * vector is touched. `asOfGen` serves a past generation (back to the
    * last [[compact]]).
    */
  def serve(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      query: Array[Double], nProbe: Int, topK: Int,
      asOfGen: Option[Long] = None): DataFrame =
    ProductQuant.adcFromCodes(
      probedCodes(spark, path, cents, query, nProbe, asOfGen),
      col("id"), col("codes"), pqCents, query, topK)

  /** Filtered ANN serving — the RAG/ACL production case: top-`topK`
    * among ONLY the ids in `allowed` (a filtered dimension scan — by
    * label, tenant, licence, freshness…). The filter semi-joins the
    * probed code rows BEFORE any ADC scoring, so disallowed rows cost
    * a join probe, never a kernel evaluation, and Catalyst/AQE picks a
    * broadcast automatically when the allowed set is small. This is
    * post-filtering relative to the probe: a highly selective filter
    * can underfill k from nProbe clusters — the standard IVF tradeoff;
    * callers raise nProbe, exactly as they would in any ANN store.
    */
  def serveFiltered(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      query: Array[Double], nProbe: Int, topK: Int,
      allowed: DataFrame, id: Column,
      asOfGen: Option[Long] = None): DataFrame = {
    val ok = allowed.select(id.cast("long").as("id")).distinct()
    ProductQuant.adcFromCodes(
      probedCodes(spark, path, cents, query, nProbe, asOfGen)
        .join(ok, Seq("id"), "left_semi"),
      col("id"), col("codes"), pqCents, query, topK)
  }

  /** Batched ANN serving — the vector twin of
    * [[graft.llm.InvertedIndex.bm25TopKBatch]]: score a whole batch of
    * query vectors in ONE scan of the UNION of their probed clusters
    * instead of one scan per query. Each stored code row fans out only
    * to the queries whose probe set contains its cluster (a
    * batch-sized broadcast of (qid, ADC table, probe set) triples —
    * m × k doubles per query, request-sized by construction), scores
    * with the same 6-dp ADC arithmetic as [[serve]], and takes top-k
    * per query through a qid-partitioned rank window (each partition ≤
    * that query's candidate set, never the corpus). Per query the
    * results are EXACTLY [[serve]]'s — batching changes cost, never an
    * answer (spec-pinned). At 100 TB this is how an ANN endpoint
    * amortizes partition reads across concurrent queries.
    */
  def serveBatch(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      queries: Seq[(String, Array[Double])], nProbe: Int, topK: Int,
      asOfGen: Option[Long] = None): DataFrame =
    serveBatchCore(spark, path, cents, pqCents, queries, nProbe, topK,
      asOfGen, None)

  /** [[serveBatch]]'s body with an optional allowed-id semi-join applied
    * to the probed rows BEFORE the ADC kernel — shared by the filtered
    * batch serves so filtering stays a join probe, never a kernel
    * evaluation.
    */
  private def serveBatchCore(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      queries: Seq[(String, Array[Double])], nProbe: Int, topK: Int,
      asOfGen: Option[Long], allowedIds: Option[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "query batch must be non-empty")
    val m = pqCents.length
    val qinfo: Array[(String, Array[Array[Double]], Set[Int])] =
      queries.map { case (qid, q) =>
        (qid, ProductQuant.adcTable(q, pqCents),
          probeOrder(cents, q, nProbe).toSet)
      }.toArray
    val union = qinfo.flatMap(_._3).distinct.toSeq
    val bc = spark.sparkContext.broadcast(qinfo)
    val kernel = udf { (cluster: Int, cs: Seq[Int]) =>
      bc.value.iterator.filter(_._3.contains(cluster)).map {
        case (qid, t, _) =>
          var adc = 0.0
          var j = 0
          while (j < m) { adc += t(j)(cs(j)); j += 1 }
          (qid, math.floor(adc * 1e6 + 0.5) / 1e6)
      }.toSeq
    }
    val probed = liveRows(spark, path, readCached(spark, path)
      .where(col("cluster").isin(union: _*)), asOfGen)
    val rows = allowedIds.fold(probed)(ok =>
      probed.join(ok, Seq("id"), "left_semi"))
    rows
      .select(col("id"), explode(kernel(col("cluster"), col("codes"))).as("qa"))
      .select(col("qa._1").as("qid"), col("id"), col("qa._2").as("adc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc"), col("id"))))
      .where(col("rk") <= topK).drop("rk")
  }

  /** One-row segment-info describe of the vector index — the twin of
    * [[graft.llm.InvertedIndex.describe]]: stored code rows (a
    * metadata-only parquet count), populated cluster partitions (a
    * partition-column distinct, satisfied from the file listing),
    * current generation, tombstone debt. Driver-checked
    * (q_ivfpq_stats) against corpus arithmetic + the shared coarse
    * assignment CTEs.
    */
  def describe(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val idx = spark.read.parquet(path)
    val rows = idx.count()
    // populated clusters from ONE driver listing (round 15): the
    // partitionBy writer lands exactly one cluster=<v> directory per
    // populated cluster (and never an empty one), so distinct(cluster)
    // over stored rows equals the directory count — the old
    // distinct-scan job read every file's row-group metadata at scale
    // where a LIST answers the same question
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nClusters = fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("cluster=")).toLong
    val gen = readGen(spark, path)
    val dead = tombstones(spark, path)
      .map(_.select("id").distinct().count()).getOrElse(0L)
    Seq((rows, nClusters, gen, dead))
      .toDF("n_rows", "n_clusters", "gen", "n_tombstoned")
  }

  /** Tombstone-debt compaction policy, the vector twin of
    * [[graft.llm.InvertedIndex.compactIfNeeded]]: compact when
    * tombstoned ids reach `maxDeadFrac` of stored rows. The row count
    * is a metadata-only parquet count (row-group stats, no data pages);
    * the tombstone set is delete-sized. Returns true iff it compacted.
    */
  def compactIfNeeded(spark: SparkSession, path: String,
      maxDeadFrac: Double = 0.1): Boolean = {
    require(maxDeadFrac > 0 && maxDeadFrac <= 1,
      s"maxDeadFrac must be in (0, 1]: $maxDeadFrac")
    val total = spark.read.parquet(path).count()
    val dead = tombstones(spark, path)
      .map(_.select("id").distinct().count()).getOrElse(0L)
    val due = total > 0 && dead.toDouble / total >= maxDeadFrac
    if (due) compact(spark, path)
    due
  }

  /** Two-stage serve: ADC top-`rerankR` over the probed code bytes,
    * then exact re-rank of just those R raw vectors — the standard
    * IVF-PQ refinement. `raw` is the (rawId, rawVec) source of truth
    * for vectors (at scale: the raw table partitioned by the same
    * cluster key, or a point-lookup store); only the R ADC survivors
    * are fetched from it — the R-row side broadcasts, so the join adds
    * no shuffle of the raw table. Exact distances use the same
    * 6-dp-rounded squared L2 + id tie-break as [[ProductQuant
    * .exactTopK]], so re-ranked results are cross-engine deterministic.
    */
  def serveReranked(spark: SparkSession, path: String, raw: DataFrame,
      rawId: Column, rawVec: Column,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      query: Array[Double], nProbe: Int, rerankR: Int,
      topK: Int, asOfGen: Option[Long] = None): DataFrame = {
    val shortlist = ProductQuant.adcFromCodes(
      probedCodes(spark, path, cents, query, nProbe, asOfGen),
      col("id"), col("codes"), pqCents, query, rerankR)
      .select(col("id"))
    // join BEFORE the kernel: the exact distance runs on the R
    // survivors only, not on every raw row the scan probes past
    raw.select(rawId.as("id"), rawVec.as("_v"))
      .join(broadcast(shortlist), "id")
      .select(col("id"), exactD2(spark, query)(col("_v")).as("d2"))
      .orderBy(col("d2"), col("id"))
      .limit(topK)
  }

  /** The 6-dp-rounded exact squared-L2 kernel against a broadcast
    * query — shared by both re-rank paths so their doubles cannot
    * drift ([[ProductQuant.exactTopK]]'s arithmetic).
    */
  private def exactD2(spark: SparkSession,
      query: Array[Double]): org.apache.spark.sql.expressions
        .UserDefinedFunction = {
    val bcQ = spark.sparkContext.broadcast(query)
    udf { (v: Seq[Float]) =>
      val q = bcQ.value
      var d = 0.0
      var i = 0
      while (i < q.length) { val t = v(i).toDouble - q(i); d += t * t; i += 1 }
      math.floor(d * 1e6 + 0.5) / 1e6
    }
  }

  /** BATCHED two-stage serve with ZERO corpus tables — [[serveBatch]]'s
    * amortized union-probe scan for the ADC shortlists (top-`rerankR`
    * per query), then ONE pass over the union of the probed partitions'
    * stored vectors re-ranks every query's shortlist by exact distance
    * (a batch-sized broadcast of (qid, query) pairs; each fetched
    * vector evaluates only against the queries whose shortlist holds
    * it). Per query the results are EXACTLY
    * [[serveRerankedFromIndex]]'s (spec-pinned) — batching changes the
    * cost, never an answer.
    */
  def serveRerankedBatch(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      queries: Seq[(String, Array[Double])], nProbe: Int, rerankR: Int,
      topK: Int, asOfGen: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hasRaw(spark, path),
      s"$path stores no raw vectors (write with storeRaw = true)")
    val shortlists = serveBatch(spark, path, cents, pqCents, queries,
        nProbe, rerankR, asOfGen)
      .select(col("qid"), col("id"))
    val union = queries.flatMap { case (_, q) =>
      probeOrder(cents, q, nProbe) }.distinct
    val rows = liveRows(spark, path, readCached(spark, path)
      .where(col("cluster").isin(union: _*))
      .select(col("id"), col("vec")), asOfGen)
    val bcQ = spark.sparkContext.broadcast(queries.toMap)
    val kernel = udf { (qid: String, v: Seq[Float]) =>
      val q = bcQ.value(qid)
      var d = 0.0
      var i = 0
      while (i < q.length) { val t = v(i).toDouble - q(i); d += t * t; i += 1 }
      math.floor(d * 1e6 + 0.5) / 1e6
    }
    rows.join(broadcast(shortlists), "id")
      .select(col("qid"), col("id"), kernel(col("qid"), col("vec")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2"), col("id"))))
      .where(col("rk") <= topK).drop("rk")
  }

  /** Two-stage serve with ZERO corpus tables (VERDICT r10 item 1): ADC
    * top-`rerankR` over the probed code bytes, then the exact re-rank
    * reads the R raw vectors from the INDEX'S OWN `vec` column
    * ([[write]] with `storeRaw = true`) — the same probed,
    * partition-pruned rows, parquet column pruning paying for `vec`
    * only on this path. A hybrid-retrieval dense arm built on this
    * never scans an embeddings table per request: everything it touches
    * was paid for at index-write time. Results are EXACTLY
    * [[serveReranked]]'s for the same parameters (the stored vector is
    * the source vector verbatim; spec-pinned).
    */
  def serveRerankedFromIndex(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      query: Array[Double], nProbe: Int, rerankR: Int,
      topK: Int, asOfGen: Option[Long] = None): DataFrame = {
    require(hasRaw(spark, path),
      s"$path stores no raw vectors (write with storeRaw = true)")
    val probed = probedCodes(spark, path, cents, query, nProbe, asOfGen)
    val shortlist = ProductQuant.adcFromCodes(probed,
      col("id"), col("codes"), pqCents, query, rerankR)
      .select(col("id"))
    probed.select(col("id"), col("vec").as("_v"))
      .join(broadcast(shortlist), "id")
      .select(col("id"), exactD2(spark, query)(col("_v")).as("d2"))
      .orderBy(col("d2"), col("id"))
      .limit(topK)
  }

  /** FILTERED two-stage serve with zero corpus tables — the RAG/ACL
    * case at exact-re-rank quality (VERDICT r11 item 4): top-`topK`
    * among ONLY the ids in `allowed`, ADC-shortlisted then
    * exact-re-ranked from the index's own stored vectors. The allowed
    * set semi-joins the probed code rows BEFORE any ADC scoring
    * ([[serveFiltered]]'s discipline — disallowed rows cost a join
    * probe, never a kernel evaluation, and the filter adds no
    * corpus-proportional stage: every scan stays probe-partition-
    * pruned), the shortlist is therefore drawn from allowed rows only,
    * and the re-rank reads the ≤ `rerankR` stored vectors from the
    * same filtered probed rows. Same post-filtering-relative-to-probe
    * tradeoff as [[serveFiltered]]: a highly selective filter can
    * underfill k from nProbe clusters — callers raise nProbe.
    */
  def serveRerankedFiltered(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      query: Array[Double], nProbe: Int, rerankR: Int, topK: Int,
      allowed: DataFrame, id: Column,
      asOfGen: Option[Long] = None): DataFrame = {
    require(hasRaw(spark, path),
      s"$path stores no raw vectors (write with storeRaw = true)")
    val ok = allowed.select(id.cast("long").as("id")).distinct()
    val probed = probedCodes(spark, path, cents, query, nProbe, asOfGen)
      .join(ok, Seq("id"), "left_semi")
    val shortlist = ProductQuant.adcFromCodes(probed,
      col("id"), col("codes"), pqCents, query, rerankR)
      .select(col("id"))
    probed.select(col("id"), col("vec").as("_v"))
      .join(broadcast(shortlist), "id")
      .select(col("id"), exactD2(spark, query)(col("_v")).as("d2"))
      .orderBy(col("d2"), col("id"))
      .limit(topK)
  }

  /** BATCHED filtered two-stage serve — [[serveRerankedBatch]] under an
    * allowed-id set shared by the whole batch (the multi-tenant RAG
    * endpoint: many queries, one ACL snapshot). One union-probe ADC
    * scan draws each query's shortlist from allowed rows only, one
    * stored-vector pass re-ranks every shortlist exactly; per query the
    * rows are EXACTLY [[serveRerankedFiltered]]'s (spec-pinned —
    * batching changes cost, never an answer).
    */
  def serveRerankedFilteredBatch(spark: SparkSession, path: String,
      cents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      queries: Seq[(String, Array[Double])], nProbe: Int, rerankR: Int,
      topK: Int, allowed: DataFrame, id: Column,
      asOfGen: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hasRaw(spark, path),
      s"$path stores no raw vectors (write with storeRaw = true)")
    val ok = allowed.select(id.cast("long").as("id")).distinct()
    val shortlists = serveBatchCore(spark, path, cents, pqCents, queries,
        nProbe, rerankR, asOfGen, Some(ok))
      .select(col("qid"), col("id"))
    val union = queries.flatMap { case (_, q) =>
      probeOrder(cents, q, nProbe) }.distinct
    val rows = liveRows(spark, path, readCached(spark, path)
      .where(col("cluster").isin(union: _*))
      .select(col("id"), col("vec")), asOfGen)
    val bcQ = spark.sparkContext.broadcast(queries.toMap)
    val kernel = udf { (qid: String, v: Seq[Float]) =>
      val q = bcQ.value(qid)
      var d = 0.0
      var i = 0
      while (i < q.length) { val t = v(i).toDouble - q(i); d += t * t; i += 1 }
      math.floor(d * 1e6 + 0.5) / 1e6
    }
    // the shortlist is already ⊆ allowed, so the inner join keeps the
    // re-rank pass filter-correct without a second semi-join
    rows.join(broadcast(shortlists), "id")
      .select(col("qid"), col("id"), kernel(col("qid"), col("vec")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2"), col("id"))))
      .where(col("rk") <= topK).drop("rk")
  }
}

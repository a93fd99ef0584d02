package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted-index layout: the served BM25 must equal direct scoring
  * row-for-row, the bucket partitioning must actually prune the read,
  * and writer/reader bucket hashing must agree by construction.
  */
class InvertedIndexSpec extends SparkSpec {

  private val terms = Seq("scan", "filter", "vector")

  test("served BM25 over the persisted index equals direct Bm25.topDocs") {
    val docs = graft.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("invidx").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), out, nBuckets = 16)
    val served = InvertedIndex.bm25TopK(spark, out, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    val direct = Bm25.topDocs(docs, col("doc_id"), col("text"), terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    assert(served.toSeq === direct.toSeq)
  }

  test("the serving scan reads only the query terms' buckets") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("invidx_prune").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), out, nBuckets = 16)
    val allBuckets = spark.read.parquet(out)
      .select("bucket").distinct().count()
    assert(allBuckets > 3, s"fixture should populate many buckets, got $allBuckets")
    // one-term query → exactly one bucket directory may be touched; prove
    // it from the files the filtered scan actually reads
    val oneTermBucket = Seq("scan").toDF("term")
      .select(InvertedIndex.bucketCol(col("term"), 16)).head().getInt(0)
    val touched = spark.read.parquet(out)
      .where(col("bucket") === oneTermBucket && col("term") === "scan")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .flatMap(f => "bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .distinct
    assert(touched.toSeq === Seq(oneTermBucket),
      s"expected only bucket $oneTermBucket touched, got ${touched.toSeq}")
  }

  test("single-pass build stats are exact: observe metrics equal a direct corpus aggregate") {
    val docs = graft.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("invidx_stats").toString
    val (n, avgdl) = InvertedIndex.write(docs, col("doc_id"), col("text"), out, nBuckets = 8)
    val direct = docs.select(
      count(lit(1)).cast("double"),
      sum(TextStats.tokenCount(col("text")).cast("double"))).head()
    assert(n === direct.getDouble(0))
    // (n_docs, sum_dl) are integer-valued doubles → the one avgdl
    // division must land on the identical double
    assert(avgdl === direct.getDouble(1) / direct.getDouble(0))
    val st = InvertedIndex.readStats(spark, out)
    assert(st.nDocs === n && st.sumDl === direct.getDouble(1))
  }

  test("append of a delta serves identically to a full rebuild") {
    val docs = graft.Tables.documents(spark, sf)
    val base = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val delta = docs.where(pmod(col("doc_id"), lit(7)) === 0)
    val incr = java.nio.file.Files.createTempDirectory("invidx_incr").toString
    val full = java.nio.file.Files.createTempDirectory("invidx_full").toString
    InvertedIndex.write(base, col("doc_id"), col("text"), incr, nBuckets = 16)
    InvertedIndex.append(delta, col("doc_id"), col("text"), incr)
    InvertedIndex.write(docs, col("doc_id"), col("text"), full, nBuckets = 16)
    // sidecars equal bit-for-bit (exact integer-double arithmetic)
    val (si, sf2) = (InvertedIndex.readStats(spark, incr), InvertedIndex.readStats(spark, full))
    assert(si === sf2)
    // served results equal row-for-row, scores included
    val a = InvertedIndex.bm25TopK(spark, incr, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val b = InvertedIndex.bm25TopK(spark, full, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(a === b)
  }

  test("append cost is delta-proportional: the delta write touches only delta postings") {
    val docs = graft.Tables.documents(spark, sf)
    val base = docs.where(col("doc_id") >= 10)
    val delta = docs.where(col("doc_id") < 10)
    val out = java.nio.file.Files.createTempDirectory("invidx_delta").toString
    InvertedIndex.write(base, col("doc_id"), col("text"), out, nBuckets = 16)
    val before = allDataFiles(out).toSet
    InvertedIndex.append(delta, col("doc_id"), col("text"), out)
    val added = allDataFiles(out).toSet -- before
    // every pre-existing postings file is untouched; the new files hold
    // exactly the delta's docs
    assert(allDataFiles(out).toSet.intersect(before) === before)
    val newDocs = spark.read.parquet(added.toSeq: _*)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(newDocs === delta.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  private def allDataFiles(root: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        if (!f.getName.startsWith("_")) f.listFiles().foreach(walk)
      } else if (f.getName.endsWith(".parquet")) b += f.getAbsolutePath
    walk(new java.io.File(root))
    b.result()
  }

  test("delete tombstones serve-invisibly now; compact equals a rebuild on survivors") {
    import org.apache.spark.sql.functions.pmod
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_del").toString
    val reb = java.nio.file.Files.createTempDirectory("invidx_del_reb").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    val statsFull = InvertedIndex.readStats(spark, idx)
    val deadIds = docs.where(pmod(col("doc_id"), lit(4)) === 1)
    InvertedIndex.delete(spark, idx, deadIds.select("doc_id"), col("doc_id"))
    val dead = deadIds.select("doc_id").collect().map(_.getLong(0)).toSet
    // pre-compact: deleted docs can't appear in results, but the corpus
    // sidecar is intentionally stale (Lucene semantics)
    val preCompact = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(preCompact.nonEmpty && preCompact.forall(id => !dead(id)))
    assert(InvertedIndex.readStats(spark, idx) === statsFull)
    // compact ≡ fresh build over the survivors: stats bit-equal,
    // served rows equal, tombstones gone
    InvertedIndex.compact(spark, idx)
    val survivors = docs.where(pmod(col("doc_id"), lit(4)) =!= 1)
    InvertedIndex.write(survivors, col("doc_id"), col("text"), reb, nBuckets = 16)
    assert(InvertedIndex.readStats(spark, idx) ===
      InvertedIndex.readStats(spark, reb))
    def serve(p: String) = InvertedIndex.bm25TopK(spark, p, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(serve(idx) === serve(reb))
    assert(!new java.io.File(idx, "_tombstones").exists())
  }

  test("compact with no tombstones heals append's small files: one file per bucket, nothing changes") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_heal").toString
    InvertedIndex.write(docs.where(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), idx, nBuckets = 8)
    InvertedIndex.append(docs.where(col("doc_id") % 2 =!= 0),
      col("doc_id"), col("text"), idx)
    val statsBefore = InvertedIndex.readStats(spark, idx)
    val servedBefore = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val filesBefore = allDataFiles(idx).size
    InvertedIndex.compact(spark, idx)
    val buckets = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(buckets.nonEmpty)
    buckets.foreach { b =>
      val n = b.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n === 1, s"${b.getName} has $n files after compact")
    }
    assert(allDataFiles(idx).size < filesBefore)
    assert(InvertedIndex.readStats(spark, idx) === statsBefore)
    val servedAfter = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(servedAfter === servedBefore)
  }

  test("token-less docs survive the index round-trip: counted in stats, preserved by compact") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "),
      (4L, "alpha")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_empty").toString
    val (n, avgdl) = InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 4)
    assert(n === 4.0)            // empty docs count toward N
    assert(avgdl === 3.0 / 4.0)  // 2 + 0 + 0 + 1 tokens
    InvertedIndex.compact(spark, idx)
    // the sentinel rows carried the token-less docs through the rewrite
    assert(InvertedIndex.readStats(spark, idx) ===
      InvertedIndex.Stats(4.0, 3.0, 4))
    val served = InvertedIndex.bm25TopK(spark, idx, Seq("alpha"), topK = 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(served.toSet === Set(1L, 4L))
  }

  test("change feed upserts live through their own tombstone; compact equals rebuild on the merged corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.pmod
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_ups").toString
    val reb = java.nio.file.Files.createTempDirectory("invidx_ups_reb").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    val upserts = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" zupserted")).as("text"),
        lit("upsert").as("op"))
    val deletes = docs.where(pmod(col("doc_id"), lit(5)) === 1)
      .select(col("doc_id"), lit("").as("text"), lit("delete").as("op"))
    InvertedIndex.applyChangeFeed(upserts.unionByName(deletes),
      col("doc_id"), col("text"), col("op"), idx)
    // PRE-compact: upserted docs are searchable by their NEW token and
    // deleted docs are gone — the generation ordering at work
    val zHits = InvertedIndex.bm25TopK(spark, idx, Seq("zupserted"), topK = 1000)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(zHits === upserts.select("doc_id").collect().map(_.getLong(0)).toSet)
    val preIds = InvertedIndex.bm25TopK(spark, idx, terms, topK = 1000)
      .collect().map(_.getAs[Long]("id")).toSet
    val deadIds = deletes.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(preIds.intersect(deadIds).isEmpty)
    // POST-compact: bit-equal to a fresh build over the merged corpus
    InvertedIndex.compact(spark, idx)
    val merged = docs.where(pmod(col("doc_id"), lit(5)) =!= 1)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" zupserted")))
          .otherwise(col("text")).as("text"))
    InvertedIndex.write(merged, col("doc_id"), col("text"), reb, nBuckets = 16)
    assert(InvertedIndex.readStats(spark, idx) ===
      InvertedIndex.readStats(spark, reb))
    def serve(p: String, t: Seq[String]) =
      InvertedIndex.bm25TopK(spark, p, t, topK = 50)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(serve(idx, terms) === serve(reb, terms))
    assert(serve(idx, Seq("zupserted")) === serve(reb, Seq("zupserted")))
  }

  test("as-of-generation serving is exact time travel back to the last compact") {
    import org.apache.spark.sql.functions.pmod
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_asof").toString
    val orig = java.nio.file.Files.createTempDirectory("invidx_asof_orig").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    InvertedIndex.write(docs, col("doc_id"), col("text"), orig, nBuckets = 16)
    val upserts = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" zupserted")).as("text"),
        lit("upsert").as("op"))
    val deletes = docs.where(pmod(col("doc_id"), lit(5)) === 1)
      .select(col("doc_id"), lit("").as("text"), lit("delete").as("op"))
    InvertedIndex.applyChangeFeed(upserts.unionByName(deletes),
      col("doc_id"), col("text"), col("op"), idx)
    def serve(p: String, t: Seq[String], g: Option[Long]) =
      InvertedIndex.bm25TopK(spark, p, t, topK = 50, asOfGen = g)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    // gen 0 = pre-feed: equals a serve over the untouched twin index,
    // and the upsert token does not exist yet
    assert(serve(idx, terms, Some(0L)) === serve(orig, terms, None))
    assert(serve(idx, Seq("zupserted"), Some(0L)).isEmpty)
    // gen 1 = mid-feed (tombstones placed, re-appends not yet): every
    // touched id is invisible, stats still the write-time scalars
    val touched = upserts.unionByName(deletes)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(serve(idx, terms, Some(1L)).forall(p => !touched(p._1)))
    assert(InvertedIndex.readStats(spark, idx, Some(1L)) ===
      InvertedIndex.readStats(spark, orig))
    // asking for the current generation is the live serve
    val g = InvertedIndex.readGen(spark, idx)
    assert(serve(idx, terms, Some(g)) === serve(idx, terms, None))
    // compaction spends history: gens reset, as-of 0 is now the merged state
    InvertedIndex.compact(spark, idx)
    assert(InvertedIndex.readGen(spark, idx) === 0L)
    assert(serve(idx, terms, Some(0L)) === serve(idx, terms, None))
  }

  test("batched serving equals per-query serving and reads one probed scan") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_batch").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    val batch = Seq("a" -> Seq("scan", "filter"), "b" -> terms,
      "c" -> Seq("window", "merge")).toDF("qid", "terms")
    val got = InvertedIndex.bm25TopKBatch(spark, idx, batch,
      col("qid"), col("terms"), topK = 20)
      .collect()
      .map(r => (r.getAs[String]("qid"), r.getAs[Long]("id"),
        r.getAs[Double]("score")))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(p => (-p._2, p._1)).toSeq).toMap
    for ((qid, ts) <- Seq("a" -> Seq("scan", "filter"), "b" -> terms,
        "c" -> Seq("window", "merge"))) {
      val single = InvertedIndex.bm25TopK(spark, idx, ts, topK = 20)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
      assert(got(qid) === single, s"batch result for $qid drifted")
    }
    // the index scan count is a PLAN constant (the df pass + the scoring
    // pass), independent of batch size — batching amortizes, it never
    // multiplies scans per query — and the scans stay bucket-pruned
    def scans(b: org.apache.spark.sql.DataFrame) = {
      val plan = InvertedIndex.bm25TopKBatch(spark, idx, b,
        col("qid"), col("terms"), topK = 20)
        .queryExecution.executedPlan.toString()
      assert(plan.contains("PartitionFilters") && plan.contains("bucket"))
      "invidx_batch".r.findAllIn(plan).size
    }
    val one = Seq("a" -> Seq("scan", "filter")).toDF("qid", "terms")
    assert(scans(batch) === scans(one))
  }

  test("compactIfNeeded triggers only past the tombstone-debt threshold") {
    import org.apache.spark.sql.functions.pmod
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_policy").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 8)
    // delete 1% of docs: below a 10% threshold → no compaction
    InvertedIndex.delete(spark, idx,
      docs.where(pmod(col("doc_id"), lit(100)) === 0).select("doc_id"),
      col("doc_id"))
    assert(!InvertedIndex.compactIfNeeded(spark, idx, maxDeadFrac = 0.1))
    assert(new java.io.File(idx, "_tombstones").exists())
    // describe reflects the debt and the sidecar scalars without a scan
    val d = InvertedIndex.describe(spark, idx).head()
    assert(d.getAs[Long]("n_tombstoned") ===
      docs.where(pmod(col("doc_id"), lit(100)) === 0).count())
    assert(d.getAs[Double]("n_docs") === InvertedIndex.readStats(spark, idx).nDocs)
    assert(d.getAs[Long]("gen") === 1L)
    // delete another ~25%: past the threshold → compacts, clears debt
    InvertedIndex.delete(spark, idx,
      docs.where(pmod(col("doc_id"), lit(4)) === 1).select("doc_id"),
      col("doc_id"))
    assert(InvertedIndex.compactIfNeeded(spark, idx, maxDeadFrac = 0.1))
    assert(!new java.io.File(idx, "_tombstones").exists())
    // idempotent: debt is spent
    assert(!InvertedIndex.compactIfNeeded(spark, idx, maxDeadFrac = 0.1))
  }

  test("phrase search: overlaps, repeated terms, absence, and the positional guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),        // "a a" overlaps: starts 0,1 → tf 2
      (2L, "a b a b a b"),    // "a b" thrice
      (3L, "b a"),            // reversed — no "a b" unless wrapped
      (4L, "c c c")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_phrase").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx,
      nBuckets = 4, positions = true)
    def phrase(p: Seq[String]) =
      InvertedIndex.phraseTopK(spark, idx, p, topK = 10)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("tf"))).toSeq
    assert(phrase(Seq("a", "a")) === Seq((1L, 2.0)))          // overlapping counted
    assert(phrase(Seq("a", "b")) === Seq((2L, 3.0), (1L, 1.0)))
    assert(phrase(Seq("a", "b", "a")) === Seq((2L, 2.0)))     // overlap again
    assert(phrase(Seq("b", "a")) === Seq((2L, 2.0), (3L, 1.0)))
    assert(phrase(Seq("c")) === Seq((4L, 3.0)))               // 1-term = term tf
    assert(phrase(Seq("a", "c")).isEmpty)
    // a non-positional index refuses phrase queries loudly
    val plain = java.nio.file.Files.createTempDirectory("invidx_plain").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), plain, nBuckets = 4)
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseTopK(spark, plain, Seq("a", "b"))
    }
  }

  test("positional index: fixture phrase counts match a brute-force token sweep; positions survive append+compact") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_pos").toString
    InvertedIndex.write(docs.where(col("doc_id") % 2 === 0), col("doc_id"),
      col("text"), idx, nBuckets = 16, positions = true)
    InvertedIndex.append(docs.where(col("doc_id") % 2 =!= 0), col("doc_id"),
      col("text"), idx)
    assert(InvertedIndex.isPositional(spark, idx))
    // fixture-drift-proof: test the corpus's own most frequent trigram
    val p = docs.select(TextStats.tokens(lower(col("text"))).as("t"))
      .where(expr("size(t) >= 3"))
      .select(explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("g"))
      .groupBy("g").count().orderBy(desc("count"), col("g"))
      .head().getString(0).split(" ").toSeq
    def serve() = InvertedIndex.phraseTopK(spark, idx, p, topK = 100)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("tf"))).toSeq
    // brute force: count phrase starts by sliding over the token array
    val expected = docs
      .select(col("doc_id"), TextStats.tokens(lower(col("text"))).as("t"))
      .where(expr("size(t) >= 3"))
      .select(col("doc_id"), expr(
        s"size(filter(sequence(0, size(t) - 3), i -> " +
          s"t[i] = '${p(0)}' AND t[i+1] = '${p(1)}' AND t[i+2] = '${p(2)}'))")
        .cast("double").as("tf"))
      .where(col("tf") > 0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("tf")))
      .sortBy(x => (-x._2, x._1)).toSeq
    assert(serve() === expected && expected.nonEmpty)
    // compact preserves the positional layout and the answers
    InvertedIndex.compact(spark, idx)
    assert(InvertedIndex.isPositional(spark, idx))
    assert(serve() === expected)
  }

  test("merge of disjoint indexes equals a fresh build; source tombstones apply; guards hold") {
    import org.apache.spark.sql.functions.pmod
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val a = java.nio.file.Files.createTempDirectory("invidx_mrg_a").toString
    val b = java.nio.file.Files.createTempDirectory("invidx_mrg_b").toString
    val dst = java.nio.file.Files.createTempDirectory("invidx_mrg").toString
    val reb = java.nio.file.Files.createTempDirectory("invidx_mrg_reb").toString
    InvertedIndex.write(docs.where(pmod(col("doc_id"), lit(2)) === 0),
      col("doc_id"), col("text"), a, nBuckets = 8)
    InvertedIndex.write(docs.where(pmod(col("doc_id"), lit(2)) === 1),
      col("doc_id"), col("text"), b, nBuckets = 8)
    InvertedIndex.delete(spark, b,
      docs.where(pmod(col("doc_id"), lit(5)) === 1).select("doc_id"),
      col("doc_id"))
    InvertedIndex.merge(spark, Seq(a, b), dst)
    // ≡ fresh build over union minus B's applicable tombstones (odd %5=1)
    val survivors = docs.where(
      !(pmod(col("doc_id"), lit(5)) === 1 && pmod(col("doc_id"), lit(2)) === 1))
    InvertedIndex.write(survivors, col("doc_id"), col("text"), reb, nBuckets = 8)
    assert(InvertedIndex.readStats(spark, dst) ===
      InvertedIndex.readStats(spark, reb))
    def serve(p: String) = InvertedIndex.bm25TopK(spark, p, terms, topK = 50)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(serve(dst) === serve(reb))
    // guards: bucket-count mismatch and positional mixing refuse loudly
    val c16 = java.nio.file.Files.createTempDirectory("invidx_mrg_c").toString
    InvertedIndex.write(docs.limit(10), col("doc_id"), col("text"), c16, nBuckets = 16)
    intercept[IllegalArgumentException] {
      InvertedIndex.merge(spark, Seq(a, c16), dst + "_x")
    }
    val pos = java.nio.file.Files.createTempDirectory("invidx_mrg_p").toString
    InvertedIndex.write(docs.limit(10), col("doc_id"), col("text"), pos,
      nBuckets = 8, positions = true)
    intercept[IllegalArgumentException] {
      InvertedIndex.merge(spark, Seq(a, pos), dst + "_y")
    }
  }

  test("deletes-only change feed: the empty append half is a clean no-op") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_delonly").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 2)
    // a zero-task write never fires the Observation listener — the CDC
    // path must treat the missing metrics as the (0, 0) they mean
    val feed = Seq((1L, "", "delete")).toDF("doc_id", "text", "op")
    InvertedIndex.applyChangeFeed(feed, col("doc_id"), col("text"),
      col("op"), idx)
    val ids = InvertedIndex.bm25TopK(spark, idx, Seq("b"), topK = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(ids === Set(2L))
    // scalars stay Lucene-stale (no docs added, none subtracted yet)
    assert(InvertedIndex.readStats(spark, idx) === InvertedIndex.Stats(2.0, 4.0, 2))
    InvertedIndex.compact(spark, idx)
    assert(InvertedIndex.readStats(spark, idx) === InvertedIndex.Stats(1.0, 2.0, 2))
  }

  test("compacting an all-tombstoned index yields an empty index with (0, 0) stats") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_delall").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 2)
    InvertedIndex.delete(spark, idx, docs.select("doc_id"), col("doc_id"))
    // schema inference has no files to look at here; the explicit-schema
    // read makes count() = 0 the answer instead of an AnalysisException
    val (n, avg) = InvertedIndex.compact(spark, idx)
    assert(n === 0.0 && avg === 0.0)
    assert(InvertedIndex.readStats(spark, idx) === InvertedIndex.Stats(0.0, 0.0, 2))
  }

  test("writer and reader share one bucket function column") {
    import spark.implicits._
    // same term → same bucket via the shared column, for any bucket count
    for (n <- Seq(1, 4, 16, 64)) {
      val b = Seq("scan", "scan").toDF("term")
        .select(InvertedIndex.bucketCol(col("term"), n))
        .collect().map(_.getInt(0)).toSeq
      assert(b.distinct.size === 1 && b.head >= 0 && b.head < n)
    }
  }

  test("driver-side bucket hash equals the writer's codegen'd column on fuzzed terms") {
    import spark.implicits._
    // serving routes query terms to buckets WITHOUT a Spark job; the
    // local eval must match the plan's XxHash64 for arbitrary UTF-8
    // input or pruning would silently read the wrong bucket
    val rnd = new scala.util.Random(7)
    val terms = (Seq("", "scan", "naïve", "日本語", "a b", "\ttab") ++
      (1 to 200).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString) ++
      (1 to 50).map(_ => new String(Array.fill(1 + rnd.nextInt(6))(
        (0x20 + rnd.nextInt(0x2ff)).toChar)))).distinct
    for (n <- Seq(1, 7, 16, 64)) {
      val viaPlan = terms.toDF("term")
        .select(col("term"), InvertedIndex.bucketCol(col("term"), n).as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      terms.foreach { t =>
        assert(InvertedIndex.bucketOfLocal(t, n) === viaPlan(t),
          s"bucket mismatch for term '$t' at nBuckets=$n")
      }
    }
  }

  test("filtered serving = unfiltered scores, candidacy narrowed; AND = all-terms docs only") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_modes").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    // ground truth: score EVERYTHING once in OR mode (topK >> corpus)
    val all = InvertedIndex.bm25TopK(spark, idx, terms, topK = 1000000)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    // FILTERED ≡ filter the full ranking, scores untouched (Lucene
    // semantics: corpus-level stats whoever may read)
    val allowed = docs.where(col("lang") === "de").select("doc_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val filtered = InvertedIndex.bm25TopKFiltered(spark, idx, terms,
        allowed, col("doc_id"), topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    val expectFiltered = all.toSeq.filter { case (id, _) => allowedIds(id) }
      .sortBy { case (id, sc) => (-sc, id) }.take(20)
    assert(filtered.toSeq === expectFiltered)
    // AND ≡ docs containing every term, scores = OR-mode scores
    val andHits = InvertedIndex.bm25TopKAnd(spark, idx, terms, topK = 1000000)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    assert(andHits.nonEmpty, "fixture should contain all-terms docs")
    val withAllTerms = docs
      .select(col("doc_id"), explode(TextStats.tokens(lower(col("text")))).as("t"))
      .where(col("t").isin(terms: _*))
      .groupBy("doc_id").agg(countDistinct("t").as("n"))
      .where(col("n") === terms.size)
      .collect().map(_.getLong(0)).toSet
    assert(andHits.map(_._1).toSet === withAllTerms)
    andHits.foreach { case (id, sc) => assert(all(id) === sc,
      s"AND-mode score for doc $id must equal its OR-mode score") }
  }

  test("snippets window the first occurrence of every present term from stored offsets") {
    import spark.implicits._
    //                 0 1 2    3 4    5 6 7 8 9 10   11
    val docs = Seq(
      (1L, "x y scan z w filter a b c d e vector"),
      (2L, "scan only here"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_snip").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx,
      nBuckets = 4, positions = true)
    val out = InvertedIndex.snippetTopK(spark, idx, docs, col("doc_id"),
        col("text"), terms, topK = 10, pad = 1, maxSpan = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("lo"), r.getAs[Int]("hi"), r.getAs[String]("snippet"))))
      .toMap
    // doc 1: first occurrences scan@2, filter@5, vector@11 → lo0=2,
    // hi0=11 truncated to lo0+5=7, pad 1 → [1, 8]
    assert(out(1L) === ((1, 8, "y scan z w filter a b c")))
    // doc 2: single term at 0 → window [0-1→0, 0+1] = tokens 0..1
    assert(out(2L) === ((0, 1, "scan only")))
    // doc 3 has no query term: not a hit at all
    assert(!out.contains(3L))
    // a non-positional index refuses loudly
    val flat = java.nio.file.Files.createTempDirectory("invidx_snipflat").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), flat, nBuckets = 4)
    intercept[IllegalArgumentException] {
      InvertedIndex.snippetTopK(spark, flat, docs, col("doc_id"),
        col("text"), terms, topK = 5)
    }
  }

  test("stored-field snippets equal corpus snippets and scan no corpus table") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_snipstore").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx,
      nBuckets = 16, positions = true, storedFields = true)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id"), r.getAs[Double]("score"), r.getAs[Int]("lo"),
        r.getAs[Int]("hi"), r.getAs[String]("snippet"))
    val stored = InvertedIndex.snippetTopKStored(spark, idx, terms,
      topK = 20, pad = 2, maxSpan = 8).collect().map(key).sortBy(_._1).toSeq
    val corpus = InvertedIndex.snippetTopK(spark, idx, docs, col("doc_id"),
      col("text"), terms, topK = 20, pad = 2, maxSpan = 8)
      .collect().map(key).sortBy(_._1).toSeq
    assert(stored === corpus && stored.nonEmpty)
    // the fetch phase reads ONLY index-owned storage: no documents scan
    val plan = InvertedIndex.snippetTopKStored(spark, idx, terms,
      topK = 20, pad = 2, maxSpan = 8).queryExecution.executedPlan.toString()
    assert(!plan.contains("documents.parquet"),
      s"stored-field snippets must not scan the corpus:\n$plan")
    // guards: positional-only and plain indexes refuse loudly
    val noStore = java.nio.file.Files.createTempDirectory("invidx_nostore").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), noStore,
      nBuckets = 16, positions = true)
    intercept[IllegalArgumentException] {
      InvertedIndex.snippetTopKStored(spark, noStore, terms)
    }
  }

  test("batched stored snippets equal the single-request form per member") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_snipbatch").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx,
      nBuckets = 16, positions = true, storedFields = true)
    // overlapping term sets (shared bucket probes), plus one member
    // whose terms hit nothing — it must contribute zero rows, not fail
    val members = Seq(
      "qa" -> terms,
      "qb" -> Seq("scan", "data"),
      "qc" -> Seq("zzzznothing"))
    val queriesDf = members.toDF("qid", "terms")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id"), r.getAs[Double]("score"), r.getAs[Int]("lo"),
        r.getAs[Int]("hi"), r.getAs[String]("snippet"))
    val batched = InvertedIndex.snippetTopKStoredBatch(spark, idx,
        queriesDf, col("qid"), col("terms"), topK = 10, pad = 2, maxSpan = 8)
      .collect().groupBy(_.getAs[String]("qid"))
      .map { case (q, rs) => q -> rs.map(key).sortBy(_._1).toSeq }
    members.foreach { case (q, ts) =>
      val single = InvertedIndex.snippetTopKStored(spark, idx, ts,
          topK = 10, pad = 2, maxSpan = 8)
        .collect().map(key).sortBy(_._1).toSeq
      assert(batched.getOrElse(q, Seq.empty) === single,
        s"batch member $q must equal its single-request serve")
    }
    assert(batched.contains("qa") && batched("qa").nonEmpty)
    assert(!batched.contains("qc"), "a hitless member contributes no rows")
    // still index-only: the batched fetch scans no corpus table
    val plan = InvertedIndex.snippetTopKStoredBatch(spark, idx,
        queriesDf, col("qid"), col("terms"), topK = 10, pad = 2, maxSpan = 8)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("documents.parquet"),
      s"batched stored snippets must not scan the corpus:\n$plan")
  }

  test("stored fields follow the change feed: upserted text serves, deleted text dies, compact preserves") {
    import spark.implicits._
    val docs = Seq(
      (1L, "scan alpha beta"), (2L, "scan gamma"), (3L, "scan delta"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_storecdc").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx,
      nBuckets = 4, positions = true, storedFields = true)
    val feed = Seq(
      (1L, "scan updated words", "upsert"),
      (3L, "", "delete")).toDF("doc_id", "text", "op")
    InvertedIndex.applyChangeFeed(feed, col("doc_id"), col("text"),
      col("op"), idx)
    def snips() = InvertedIndex.snippetTopKStored(spark, idx, Seq("scan"),
        topK = 10, pad = 10, maxSpan = 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("snippet")).toMap
    val pre = snips()
    assert(pre(1L) === "scan updated words", "upsert must serve NEW stored text")
    assert(pre(2L) === "scan gamma")
    assert(!pre.contains(3L), "deleted doc must vanish from the fetch")
    // time travel: as of gen 0 the ORIGINAL stored text serves and the
    // deleted doc is still alive — stored fields honor the generation
    // ordering exactly like postings
    val asOf = InvertedIndex.snippetTopKStored(spark, idx, Seq("scan"),
        topK = 10, pad = 10, maxSpan = 10, asOfGen = Some(0L))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("snippet")).toMap
    assert(asOf === Map(1L -> "scan alpha beta", 2L -> "scan gamma",
      3L -> "scan delta"))
    InvertedIndex.compact(spark, idx)
    assert(snips() === pre)
  }

  test("df from the terms sidecar: one postings scan per serve, scores equal the live-df fallback") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_dfsc").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    assert(InvertedIndex.hasTermStats(spark, idx))
    val clean = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    // single-pass plan: the probed postings are scanned ONCE (the old
    // plan scanned them twice — a df aggregation pass plus the scoring
    // pass); the df side is a request-sized local relation
    val plan = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
      .queryExecution.executedPlan.toString()
    assert("invidx_dfsc".r.findAllIn(plan).size === 1,
      s"serve must scan the postings once:\n$plan")
    // force the exact live-postings fallback (a tombstone for an id the
    // index never held changes NO df) — scores must be identical, which
    // pins sidecar df == live df on a clean index
    InvertedIndex.delete(spark, idx,
      Seq(999999999L).toDF("doc_id"), col("doc_id"))
    val fallback = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(fallback === clean)
  }

  test("warm serve routes with O(1) driver metadata: no _terms listing, no Spark jobs") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_meta").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    // first serve warms the stats + term caches (and pays their reads)
    InvertedIndex.bm25TopK(spark, idx, terms, topK = 20).collect()
    // a WARM serve's routing (stats, df, buckets) must launch zero Spark
    // jobs and make O(1) metadata calls: the term cache is keyed on the
    // flat one-file-per-generation `_stats` listing, never a recursive
    // walk of the bucket-partitioned `_terms` sidecar (VERDICT r11
    // item 3 — object stores price LIST on the serving hot path)
    spark.sparkContext.setJobGroup("warm_serve_probe", "warm serve routing")
    val l0 = InvertedIndex.FsMetaOps.listStatus.get()
    val served = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
    val listed = InvertedIndex.FsMetaOps.listStatus.get() - l0
    val jobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup("warm_serve_probe")
    spark.sparkContext.clearJobGroup()
    assert(jobs.isEmpty, s"warm-serve construction launched jobs: ${jobs.toSeq}")
    assert(listed <= 3, s"warm serve made $listed listStatus calls (want <= 3: stats log + term-cache key + schema-cache key)")
    assert(served.limit(1).collect().nonEmpty)
  }

  test("MaxScore serving equals bm25TopK row-for-row across term mixes and maintenance states") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_wand").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    // corpus-derived term mixes: the most and least document-frequent
    // tokens plus the fixed serving terms — rare+common is where the
    // essential/non-essential split actually prunes
    val byDf = docs
      .select(explode(TextStats.tokens(lower(col("text")))).as("t"))
      .groupBy("t").count().orderBy(desc("count"), col("t"))
      .collect().map(_.getString(0))
    val mixes = Seq(
      terms,
      Seq(byDf.head, byDf.last, "scan"),
      byDf.take(3).toSeq,
      Seq(byDf.head, byDf(1), byDf.last, "window", "merge"))
    for (ts <- mixes) {
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
      val want = pairs(InvertedIndex.bm25TopK(spark, idx, ts, topK = 20))
      val got = pairs(InvertedIndex.bm25TopKMaxScore(spark, idx, ts, topK = 20))
      assert(got === want, s"MaxScore drifted for terms $ts")
    }
    // with tombstones pending it must fall back and stay exact
    InvertedIndex.delete(spark, idx,
      docs.where(pmod(col("doc_id"), lit(4)) === 1).select("doc_id"),
      col("doc_id"))
    val want = InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val got = InvertedIndex.bm25TopKMaxScore(spark, idx, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(got === want)
  }

  test("auto serve picks a strategy from sidecar stats and never changes an answer") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_auto").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    // both branches are exact, so the pick can never change an answer —
    // force each branch via the threshold and compare to the plain serve
    val want = pairs(InvertedIndex.bm25TopK(spark, idx, terms, topK = 20))
    assert(pairs(InvertedIndex.bm25TopKAuto(spark, idx, terms, topK = 20,
      minPruneRows = 0.0)) === want)       // forces the MaxScore branch
    assert(pairs(InvertedIndex.bm25TopKAuto(spark, idx, terms, topK = 20,
      minPruneRows = 1e12)) === want)      // forces the plain branch
    // the decision variable is the NON-SEED posting mass (the rows the
    // pruned aggregation can actually avoid), from cached stats alone
    assert(!InvertedIndex.maxScoreWorthwhile(Seq(250.0), 100.0),
      "single term has nothing to prune")
    assert(!InvertedIndex.maxScoreWorthwhile(Seq(250.0, 3900.0, 3900.0), 100000.0),
      "7.8k prunable rows sit below the measured crossover")
    assert(InvertedIndex.maxScoreWorthwhile(Seq(25000.0, 392300.0, 392100.0), 100000.0),
      "784k prunable rows sit past the crossover")
    // tombstones pending -> plain fallback, still exact
    InvertedIndex.delete(spark, idx, Seq(1L).toDF("doc_id"), col("doc_id"))
    val after = pairs(InvertedIndex.bm25TopKAuto(spark, idx, terms, topK = 20,
      minPruneRows = 0.0))
    assert(after === pairs(InvertedIndex.bm25TopK(spark, idx, terms, topK = 20)))
  }

  test("filtered batch serving equals per-query bm25TopKFiltered under a shared filter") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_fbatch").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    val allowed = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
      .select("doc_id")
    val batch = Seq(("qa", terms), ("qb", Seq("window", "scan", "merge")))
    val queriesDf = batch.toDF("qid", "terms")
    val got = InvertedIndex.bm25TopKFilteredBatch(spark, idx, queriesDf,
        col("qid"), col("terms"), allowed, col("doc_id"), topK = 20)
      .collect()
      .map(r => (r.getAs[String]("qid"), r.getAs[Long]("id"),
        r.getAs[Double]("score")))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(p => (-p._2, p._1)).toSeq)
      .toMap
    batch.foreach { case (q, ts) =>
      val single = InvertedIndex.bm25TopKFiltered(spark, idx, ts, allowed,
          col("doc_id"), topK = 20)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
        .toSeq
      assert(got(q) === single, s"$q: filtered batch drifted")
      assert(single.forall(_._1 % 3 != 0), s"$q: disallowed id leaked")
    }
  }

  test("stats sidecar cache never serves stale values across maintenance verbs") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c d")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("invidx_cache").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 2)
    // prime the cache, then mutate through every verb and re-read: the
    // file-signature invalidation must surface each write immediately
    assert(InvertedIndex.readStats(spark, idx) === InvertedIndex.Stats(2.0, 5.0, 2))
    assert(InvertedIndex.readGen(spark, idx) === 0L)
    InvertedIndex.append(
      Seq((3L, "e f")).toDF("doc_id", "text"), col("doc_id"), col("text"), idx)
    assert(InvertedIndex.readStats(spark, idx) === InvertedIndex.Stats(3.0, 7.0, 2))
    assert(InvertedIndex.readGen(spark, idx) === 1L)
    // time travel reads THROUGH the cache: the log is cached whole
    assert(InvertedIndex.readStats(spark, idx, asOfGen = Some(0L)) ===
      InvertedIndex.Stats(2.0, 5.0, 2))
    InvertedIndex.delete(spark, idx, Seq(1L).toDF("doc_id"), col("doc_id"))
    InvertedIndex.compact(spark, idx)
    assert(InvertedIndex.readStats(spark, idx) === InvertedIndex.Stats(2.0, 5.0, 2))
    assert(InvertedIndex.readGen(spark, idx) === 0L)
    // an index REPLACED wholesale at the same path (an external writer
    // the session never saw) must also invalidate via the signature
    val docs2 = Seq((9L, "x")).toDF("doc_id", "text")
    InvertedIndex.write(docs2, col("doc_id"), col("text"), idx, nBuckets = 2)
    assert(InvertedIndex.readStats(spark, idx) === InvertedIndex.Stats(1.0, 1.0, 2))
  }

  // ---- round-13 strategy routing: batch/filtered serves pick per query ----

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq

  test("warm MaxScore routing launches zero Spark jobs at construction (jobless θ from stored impacts)") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_theta").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    // high-df terms with small k: the sidecar's stored impact pairs must
    // cover k, so θ derives on the driver and the old per-request
    // θ-probe ACTION is gone — a regression to the probe would collect
    // during construction and fail the zero-jobs pin below
    val byDf = docs
      .select(explode(TextStats.tokens(lower(col("text")))).as("t"))
      .groupBy("t").count().orderBy(desc("count"))
      .limit(3).collect().map(_.getString(0)).toSeq
    val k = 5
    // warm every cache (stats log, term stats, relation)
    val want = pairsOf(InvertedIndex.bm25TopK(spark, idx, byDf, topK = k))
    assert(pairsOf(InvertedIndex.bm25TopKMaxScore(spark, idx, byDf,
      topK = k)) === want)
    spark.sparkContext.setJobGroup("ms_construct", "warm MaxScore construction")
    val plan = InvertedIndex.bm25TopKMaxScore(spark, idx, byDf, topK = k)
    val jobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup("ms_construct")
    spark.sparkContext.clearJobGroup()
    assert(jobs.isEmpty,
      s"warm MaxScore construction launched jobs (θ-probe regression?): ${jobs.toSeq}")
    assert(pairsOf(plan) === want)
  }

  test("MaxScore θ folds stored impacts across append generations and stays exact") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_topsgen").toString
    InvertedIndex.write(docs.where(pmod(col("doc_id"), lit(2)) === 0),
      col("doc_id"), col("text"), idx, nBuckets = 16)
    InvertedIndex.append(docs.where(pmod(col("doc_id"), lit(2)) === 1),
      col("doc_id"), col("text"), idx)
    for (k <- Seq(5, 20)) {
      val want = pairsOf(InvertedIndex.bm25TopK(spark, idx, terms, topK = k))
      assert(pairsOf(InvertedIndex.bm25TopKMaxScore(spark, idx, terms,
        topK = k)) === want, s"k=$k drifted after append")
    }
  }

  test("batch serving routed onto MaxScore equals per-query auto rows exactly") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_msbatch").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    val byDf = docs
      .select(explode(TextStats.tokens(lower(col("text")))).as("t"))
      .groupBy("t").count().orderBy(desc("count"), col("t"))
      .collect().map(_.getString(0))
    val batch = Seq(
      ("qa", terms),                                  // serving mix
      ("qb", Seq(byDf.head, byDf(1), byDf.last)),     // common+common+rare
      ("qc", Seq(byDf.last)),                         // single term: always plain
      ("qd", Seq("no_such_term_x", byDf.head, "scan")))
    val queriesDf = batch.toDF("qid", "terms")
    // force the MaxScore branch everywhere the decision allows: per
    // query the batch must return EXACTLY the single-query auto rows
    for (mpr <- Seq(0.0, InvertedIndex.DefaultMinPruneRows)) {
      val got = InvertedIndex.bm25TopKBatch(spark, idx, queriesDf,
          col("qid"), col("terms"), topK = 20, minPruneRows = mpr)
        .collect()
        .map(r => (r.getAs[String]("qid"), r.getAs[Long]("id"),
          r.getAs[Double]("score")))
        .groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3)).sortBy(p => (-p._2, p._1)).toSeq)
        .toMap
      batch.foreach { case (q, ts) =>
        val single = pairsOf(InvertedIndex.bm25TopKAuto(spark, idx, ts,
          topK = 20, minPruneRows = mpr))
        assert(got.getOrElse(q, Seq.empty) === single,
          s"$q drifted from single-query auto at minPruneRows=$mpr")
      }
    }
  }

  test("filtered serving routed onto MaxScore stays exact under the allowed-set probe") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_msfilt").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    // several selectivities, including one tight enough that the allowed
    // probe underfills k and the serve must fall back plain — exactness
    // is the contract either way
    for (m <- Seq(2, 3, 50)) {
      val allowed = docs.where(pmod(col("doc_id"), lit(m)) =!= 0)
        .select("doc_id")
      val want = pairsOf(InvertedIndex.bm25TopKFiltered(spark, idx, terms,
        allowed, col("doc_id"), topK = 20,
        minPruneRows = 1e12))                          // plain branch
      val got = pairsOf(InvertedIndex.bm25TopKFiltered(spark, idx, terms,
        allowed, col("doc_id"), topK = 20,
        minPruneRows = 0.0))                           // MaxScore branch
      assert(got === want, s"filtered MaxScore drifted at selectivity 1/$m")
      assert(want.forall(_._1 % m != 0), "disallowed id leaked")
    }
    // batched filtered, forced onto MaxScore: per query ≡ single filtered
    val allowed = docs.where(pmod(col("doc_id"), lit(3)) =!= 0).select("doc_id")
    val batch = Seq(("qa", terms), ("qb", Seq("window", "scan", "merge")))
    val got = InvertedIndex.bm25TopKFilteredBatch(spark, idx,
        batch.toDF("qid", "terms"), col("qid"), col("terms"), allowed,
        col("doc_id"), topK = 20, minPruneRows = 0.0)
      .collect()
      .map(r => (r.getAs[String]("qid"), r.getAs[Long]("id"),
        r.getAs[Double]("score")))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(p => (-p._2, p._1)).toSeq)
      .toMap
    batch.foreach { case (q, ts) =>
      val single = pairsOf(InvertedIndex.bm25TopKFiltered(spark, idx, ts,
        allowed, col("doc_id"), topK = 20))
      assert(got.getOrElse(q, Seq.empty) === single,
        s"$q: forced-MaxScore filtered batch drifted")
    }
  }

  test("pickStrategy reads the engine's own sidecar decision, net profit included") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_pick").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    // the regime's shape: a rare term (df >= k so θ derives joblessly)
    // plus the two most common terms — pruned mass (the commons) far
    // exceeds the candidate build (the rare term's postings)
    val byDf = docs
      .select(explode(array_distinct(
        TextStats.tokens(lower(col("text"))))).as("t"))
      .groupBy("t").count().orderBy(desc("count"), col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rare = byDf.reverse.find(_._2 >= 20L).get._1
    val mix = Seq(rare, byDf(0)._1, byDf(1)._1)
    assert(InvertedIndex.pickStrategy(spark, idx, mix,
      minPruneRows = 0.0) === "maxscore")
    assert(InvertedIndex.pickStrategy(spark, idx, mix,
      minPruneRows = 1e12) === "plain")
    // all-common mix: one term may be "prunable" under θ but the
    // essential mass dwarfs it — the net-profit gate must serve plain
    // (the sv10 measurement: routing this shape cost 1.6× plain)
    val commons = byDf.take(3).map(_._1).toSeq
    assert(InvertedIndex.pickStrategy(spark, idx, commons,
      minPruneRows = 1.0) === "plain")
    // single present term: the impact-pruned plan may route (round 14),
    // but never under a mass threshold the list can't clear
    assert(InvertedIndex.pickStrategy(spark, idx, Seq("scan"),
      minPruneRows = 1e12) === "plain")
    // tombstones pending: the sidecar is unusable, the pick must say so
    InvertedIndex.delete(spark, idx, Seq(1L).toDF("doc_id"), col("doc_id"))
    assert(InvertedIndex.pickStrategy(spark, idx, mix,
      minPruneRows = 0.0) === "plain")
  }

  /** A long-postings fixture built for STORAGE-LEVEL pruning: one
    * dominant term whose tf spreads 1..9 at constant dl (so partials
    * strictly order by tf), plus two universal companions whose UB is
    * ~zero (df = corpus size → idf ≈ 1e-4) — the regime where θ exceeds
    * the other terms' summed bounds and [[InvertedIndex]]'s tfCutoffs
    * can fire. dl is held constant by doc-unique filler tokens.
    */
  private def dominantFixture(n: Int = 3600) = {
    import spark.implicits._
    // dom lives in HALF the docs (df = n/2 keeps idf ≈ ln 2 — a
    // universal dom would shrink every partial under the 4-dp output
    // grid and blunt θ); u1/u2 are universal so their UB ≈ 1e-4
    (0 until n).map { i =>
      val tf = 1 + (i % 9)
      val text =
        if (i % 2 == 0)
          (Seq.fill(tf)("dom") ++ Seq("u1", "u2") ++
            Seq.fill(10 - tf)(s"f$i")).mkString(" ")
        else (Seq("u1", "u2") ++ Seq.fill(10)(s"f$i")).mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("single-term serve: impact-pruned plan is exact, shuffle-free, and pushes the tf floor") {
    val docs = dominantFixture()
    val idx = java.nio.file.Files.createTempDirectory("invidx_single").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    val want = pairs(InvertedIndex.bm25TopK(spark, idx, Seq("dom"), topK = 20))
    val served = InvertedIndex.bm25TopKMaxScore(spark, idx, Seq("dom"), topK = 20)
    assert(pairs(served) === want, "single-term impact-pruned serve drifted")
    // the routing agrees it's worth it (3600-row list, cutoff exists)
    assert(InvertedIndex.pickStrategy(spark, idx, Seq("dom"),
      minPruneRows = 1000.0) === "maxscore")
    // plan shape: no exchange anywhere (scan → project → TakeOrdered)
    // and the θ-derived tf floor reached the parquet source
    val planStr = served.queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange"),
      s"single-term plan should be shuffle-free:\n$planStr")
    assert(planStr.contains("GreaterThanOrEqual(tf,"),
      s"tf floor missing from PushedFilters:\n$planStr")
    // the floor actually prunes: the scan may emit only the impact head,
    // never the full 3600-row list (top-20 are the tf-9 docs; the floor
    // sits strictly above tf 8)
    val cut = "GreaterThanOrEqual\\(tf,([0-9.Ee+]+)\\)".r
      .findFirstMatchIn(planStr).get.group(1).toDouble
    assert(cut > 8.0 && cut <= 9.0, s"unexpected cutoff $cut")
    // absent term + single-term mix falls back gracefully
    val mixWant = pairs(InvertedIndex.bm25TopK(spark, idx,
      Seq("dom", "zznothere"), topK = 20))
    assert(pairs(InvertedIndex.bm25TopKMaxScore(spark, idx,
      Seq("dom", "zznothere"), topK = 20)) === mixWant)
  }

  test("block-max scan skip: θ-derived tf floor skips parquet row groups on a long list") {
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 8 * 1024)
    hc.setInt("parquet.page.size", 2 * 1024)
    val idx =
      try {
        val out = java.nio.file.Files.createTempDirectory("invidx_rgskip").toString
        InvertedIndex.write(dominantFixture(), col("doc_id"), col("text"),
          out, nBuckets = 1)
        out
      } finally {
        if (oldBlock == null) hc.unset("parquet.block.size")
        else hc.set("parquet.block.size", oldBlock)
        if (oldPage == null) hc.unset("parquet.page.size")
        else hc.set("parquet.page.size", oldPage)
      }
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    // the dominant+universals mix: θ (from dom's stored impacts) exceeds
    // ΣUB(u1, u2) ≈ 1e-4, so dom's own list gets a pushed floor while
    // the universals keep every row — and the answer stays exact
    val ts = Seq("dom", "u1", "u2")
    val want = pairs(InvertedIndex.bm25TopK(spark, idx, ts, topK = 20))
    val served = InvertedIndex.bm25TopKMaxScore(spark, idx, ts, topK = 20)
    assert(pairs(served) === want, "dominant-mix MaxScore drifted")
    val planStr = served.queryExecution.executedPlan.toString
    val cut = "GreaterThanOrEqual\\(tf,([0-9.Ee+]+)\\)".r
      .findFirstMatchIn(planStr)
      .getOrElse(fail(s"no pushed tf floor in:\n$planStr")).group(1).toDouble
    assert(cut > 1.0, s"cutoff $cut cannot prune")
    // the filter_test.go discipline applied to postings: open the bucket
    // files with the SAME predicate the plan pushed and count the row
    // groups parquet's stats filter keeps — the impact-ordered layout
    // (term, tf desc) must let most of the dominant list's groups skip
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    val pred = FilterApi.and(
      FilterApi.eq(FilterApi.binaryColumn("term"), Binary.fromString("dom")),
      FilterApi.gtEq(FilterApi.doubleColumn("tf"),
        java.lang.Double.valueOf(cut)))
    val files = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    var total = 0
    var kept = 0
    files.foreach { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), hc)
      val rAll = ParquetFileReader.open(in,
        org.apache.parquet.HadoopReadOptions.builder(hc).build())
      try total += rAll.getRowGroups.size finally rAll.close()
      val rF = ParquetFileReader.open(in,
        org.apache.parquet.HadoopReadOptions.builder(hc)
          .withRecordFilter(FilterCompat.get(pred)).build())
      try kept += rF.getRowGroups.size finally rF.close()
    }
    assert(total >= 8, s"fixture too small to split row groups: $total")
    // dom is 3600 of ~10800 postings rows and only its tf-9 ninth
    // survives the floor: the stats filter must drop most groups
    assert(kept < total / 2,
      s"row-group skip did not engage: kept $kept of $total")
  }

  test("AND serving: rarest-list candidacy is exact across thresholds and tombstones") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("invidx_and").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), idx, nBuckets = 16)
    val byDf = docs
      .select(explode(array_distinct(
        TextStats.tokens(lower(col("text"))))).as("t"))
      .groupBy("t").count().orderBy(desc("count"), col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mixes = Seq(
      Seq(byDf.reverse.find(_._2 >= 5L).get._1, byDf(0)._1, byDf(1)._1),
      byDf.take(3).map(_._1).toSeq,
      Seq(byDf(0)._1, "zzabsent"),       // absent term → empty result
      Seq(byDf(0)._1))                   // single term
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    for (ts <- mixes) {
      val plain = pairs(InvertedIndex.bm25TopKAnd(spark, idx, ts, topK = 20,
        minPruneRows = 1e12))              // forces the un-pruned plan
      val pruned = pairs(InvertedIndex.bm25TopKAnd(spark, idx, ts, topK = 20,
        minPruneRows = 0.0))               // forces rarest-list candidacy
    assert(pruned === plain, s"AND candidacy drifted for $ts")
    }
    // sanity: the all-commons mix returns rows, and the absent mix none
    assert(pairs(InvertedIndex.bm25TopKAnd(spark, idx, mixes(1), topK = 20,
      minPruneRows = 0.0)).nonEmpty)
    assert(pairs(InvertedIndex.bm25TopKAnd(spark, idx, mixes(2), topK = 20,
      minPruneRows = 0.0)).isEmpty)
    // tombstones pending: candidacy is containment, not a score
    // argument, so the prune stays exact through the delete window
    InvertedIndex.delete(spark, idx,
      docs.where(pmod(col("doc_id"), lit(5)) === 2).select("doc_id"),
      col("doc_id"))
    val plainDel = pairs(InvertedIndex.bm25TopKAnd(spark, idx, mixes.head,
      topK = 20, minPruneRows = 1e12))
    val prunedDel = pairs(InvertedIndex.bm25TopKAnd(spark, idx, mixes.head,
      topK = 20, minPruneRows = 0.0))
    assert(prunedDel === plainDel, "AND candidacy drifted under tombstones")
  }

  test("postings tf kernel equals the groupBy shape row-for-row (plain and positional)") {
    import spark.implicits._
    // fixture corpus + hand edge cases: token-less docs (sentinel row),
    // null text, repeated tokens, mixed whitespace
    val edge = Seq((900001L, "alpha beta alpha alpha"), (900002L, ""),
      (900003L, null.asInstanceOf[String]), (900004L, "beta  beta\tgamma"))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).unionByName(edge)
    def build(shape: String, positional: Boolean) = {
      val out = java.nio.file.Files
        .createTempDirectory(s"invidx_shape_$shape").toString
      spark.conf.set("spark.graft.postingsShape", shape)
      try InvertedIndex.write(docs, col("doc_id"), col("text"), out,
        nBuckets = 8, positions = positional)
      finally spark.conf.unset("spark.graft.postingsShape")
      spark.read.parquet(out)
    }
    for (positional <- Seq(false, true)) {
      val a = build("shuffle", positional)
      val b = build("kernel", positional)
      assert(a.schema.fieldNames.sorted.toSeq === b.schema.fieldNames.sorted.toSeq)
      val cols = a.schema.fieldNames.sorted.map(col).toIndexedSeq
      assert(a.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
        b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty,
        s"postings shapes diverged (positional=$positional)")
    }
  }
}

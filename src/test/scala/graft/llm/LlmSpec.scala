package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (3L, "completely different content about databases and distributed query engines"),
      (4L, "el gato esta en la casa y el perro es de la calle"),
      (5L, ""),
      (6L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps first by order") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("exactGroups reports duplicate-key groups") {
    val groups = Dedup.exactGroups(docs, col("text")).collect()
    assert(groups.length == 1 && groups.head.getLong(1) == 2L) // docs 1 and 6
  }

  test("minhash LSH finds the planted near-dup pair and not unrelated docs") {
    val pairs = Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
      shingleSize = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(pairs.contains((1L, 6L)) && pairs.contains((2L, 6L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) })
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("connected components labels transitive chains with the min id") {
    import spark.implicits._
    // two components: a chain 1-2-3-4 (transitive, never all pairwise)
    // and a pair 10-11; isolated nodes don't appear in pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components converges on string-keyed long chains") {
    import spark.implicits._
    // a 9-node transitive chain of STRING ids: the old decimal label-sum
    // convergence check null-casts string labels and declared convergence
    // after one round, silently under-merging exactly this shape
    val ids = ('a' to 'i').map(_.toString)
    val pairs = ids.sliding(2).map(p => (p(1), p(0))).toSeq.toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(comp.keySet == ids.toSet)
    assert(comp.values.toSet == Set("a"), s"under-merged: $comp")
  }

  test("connected components of an empty pair set is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("cross-snapshot near-dup join finds batch-vs-corpus dups only") {
    import spark.implicits._
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different corpus content with many unique words here"),
      (3L, "a third unrelated document about spark and scala engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog tonight extra"), // near-dup of 1
      (102L, "nothing in common with anything stored before at all")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashNearDupJoin(batch, col("doc_id"), col("text"),
      old, col("doc_id"), col("text"),
      shingleSize = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((101L, 1L)), s"missing planted cross pair: $got")
    // no old×old or new×new pairs can exist by construction
    assert(got.forall { case (n, o) => n >= 100L && o < 100L }, s"bad sides: $got")
    assert(!got.exists(_._1 == 102L), "unrelated batch doc must not match")
    // degenerate bucket: identical texts on both sides, cap truncates each
    // side so candidates stay <= cap^2 per band key
    val sameOld = (0L until 300L).map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    val sameNew = (1000L until 1300L).map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    val capped = Dedup.minhashNearDupJoin(sameNew, col("doc_id"), col("text"),
      sameOld, col("doc_id"), col("text"),
      shingleSize = 2, numHashes = 32, bands = 16, threshold = 0.5, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.length == 100, s"cap 10 per side → 10×10 pairs, got ${capped.length}")
    assert(capped.forall { case (n, o) => n < 1010L && o < 10L })
  }

  test("canonicalPick keeps the highest-scored member, ties to smallest id") {
    import spark.implicits._
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val scored = Seq((1L, 0.4), (2L, 0.9), (3L, 0.9), (10L, 0.5), (11L, 0.5))
      .toDF("id", "score")
    val got = Dedup.canonicalPick(comps, scored)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    // comp 1: 2 and 3 tie at 0.9 → smallest id 2; comp 10: tie → 10
    assert(got.toSeq == Seq((1L, 2L, 0.9, 3L), (10L, 10L, 0.5, 2L)))
  }

  test("dedupByPairs removes higher-id near-dups") {
    val pairs = Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
      shingleSize = 2, numHashes = 32, bands = 16, threshold = 0.5)
    val kept = Dedup.dedupByPairs(docs, col("doc_id"), pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("simhash: identical texts same hash; near-dups within small hamming") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(6L))
    val hamming12 = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val hamming13 = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(hamming12 < hamming13, s"near-dup hamming $hamming12 !< unrelated $hamming13")
    val pairs = Dedup.simhashNearDupPairs(docs, col("doc_id"), col("text"),
      maxHamming = hamming12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 6L)))
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash hot-bucket cap truncates identical-signature clusters") {
    import spark.implicits._
    // 500 copies of one text → one signature → ALL 4 chunk buckets are the
    // same 500-member set. Uncapped that is 4 · C(500,2) candidate slots;
    // the cap truncates each bucket to its first 40 sorted ids, so exactly
    // C(40,2) pairs survive (all hamming 0) and they cover ids 0..39.
    val df = (0L until 500L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, col("doc_id"), col("text"),
      maxHamming = 3, maxBucketSize = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 40 * 39 / 2, s"got ${pairs.length} pairs")
    assert(pairs.forall { case (a, b) => a < 40 && b < 40 })
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(df, col("doc_id"), col("text"), maxBucketSize = 1)
    }
  }

  test("ArrayNormalize kernel matches the column-algebra form bit for bit") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)), // zero vector passes through
      (3L, Array(-1.5f, 2.5f, 0.25f))
    ).toDF("id", "v")
    val n = Similarity.norm(col("v"))
    val oldForm = when(n === 0, transform(col("v"), x => x.cast("double")))
      .otherwise(transform(col("v"), x => x.cast("double") / n))
    df.select(Similarity.normalized(col("v")).as("a"), oldForm.as("b"))
      .collect().foreach { r =>
        assert(r.getSeq[Double](0) == r.getSeq[Double](1), s"row $r")
      }
    val nul = Seq((1L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    assert(nul.select(Similarity.normalized(col("v"))).head.isNullAt(0))
    // double input is accepted too
    val dbl = Seq((1L, Array(1.0, 1.0))).toDF("id", "v")
    val got = dbl.select(Similarity.normalized(col("v"))).head.getSeq[Double](0)
    assert(got == Seq(1 / math.sqrt(2), 1 / math.sqrt(2)))
  }

  test("ann auto bit-width grows with corpus size, clamped") {
    assert(Similarity.annBitsFor(1L) == 6)
    assert(Similarity.annBitsFor(500L) == 6)          // 500/8 → 2^6
    assert(Similarity.annBitsFor(2000L) == 8)         // bench sf0.1 corpus
    assert(Similarity.annBitsFor(200000L) == 15)      // sf10 corpus
    assert(Similarity.annBitsFor(Long.MaxValue) == 22) // clamp
    // auto path finds planted dups exactly like a sane explicit width
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val dup = (200L until 210L).map(i => (i, base((i - 200).toInt)._2.map(x => x * 1.001f)))
    val df = (base ++ dup).toDF("vec_id", "embedding")
    val pairs = Similarity.annNearDupPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.99, dim = 16, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, (i + 200).toLong)), s"missing pair $i")
    }
  }

  test("jaccard column function") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).head.getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
    assert(empty.select(Dedup.jaccard(col("x"), col("y"))).head.getDouble(0) == 0d)
  }

  test("cosine and topK") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(-1f, 0f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.topK(vecs, col("vec_id"), col("embedding"),
      Array(1f, 0f, 0f), 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("ann topK finds the exact match and respects k") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val query = rows(5)._2
    val res = Similarity.annTopK(df, col("vec_id"), col("embedding"), query,
      k = 5, dim = 16, tables = 8, bits = 8).collect()
    assert(res.nonEmpty && res.length <= 5)
    // the identical vector shares every bucket, so it must be rank 1
    assert(res.head.getLong(0) == 5L)
    assert(math.abs(res.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("ivf index + probing topK finds the exact match; recall grows with probes") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val index = Similarity.ivfIndex(df, col("vec_id"), col("embedding"), k = 8)
    assert(index.centroids.length == 8)
    val query = rows(42)._2
    // the identical vector lives in the probed cell containing the query
    val res = Similarity.ivfTopK(index, query, k = 3, nProbe = 1).collect()
    assert(res.head.getLong(0) == 42L)
    assert(math.abs(res.head.getDouble(1) - 1.0) < 1e-9)
    // probing all cells = brute force
    val all = Similarity.ivfTopK(index, query, k = 5, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    val brute = Similarity.topK(df, col("vec_id"), col("embedding"), query, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(all == brute)
  }

  test("IVF-partitioned layout: probe reads prune directories and find the match") {
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivfpart").toString + "/emb"
    Similarity.writeIvfPartitioned(emb, col("vec_id"), col("embedding"), k = 8, dir)
    val query = emb.where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val top = Similarity.ivfTopKFromDisk(spark, dir, query, k = 5, nProbe = 3)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"expected directory pruning on centroid_id:\n$plan")
    // the exact vector lives in some probed cell's top ranks
    val ids = top.collect().map(_.getLong(0))
    assert(ids.head == 0L, s"expected vec 0 as its own nearest, got ${ids.toSeq}")
    // unprobed directories are not read: partition count in the scan < k
    val scanned = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(!scanned.isEmpty)
  }

  test("int8 quantization: bounded reconstruction error, 127 at the max component") {
    val emb = graft.Tables.embeddings(spark, sf).limit(100)
    val q = emb.withColumn("_q", Similarity.quantizeUdf(col("embedding")))
      .withColumn("deq", Similarity.dequantize(col("_q._1"), col("_q._2")))
      .select(col("vec_id"), col("embedding"), col("_q._1").as("scale"),
        col("_q._2").as("qv"), col("deq"))
      .collect()
    q.foreach { r =>
      val orig = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val qv = r.getSeq[Byte](3)
      val deq = r.getSeq[Double](4)
      assert(qv.length == orig.length)
      // error bounded by half a quantization step
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o.toDouble - d) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: |$o - $d| > ${scale / 2}")
      }
      // the max-magnitude component maps to ±127
      assert(qv.map(b => math.abs(b.toInt)).max == 127)
    }
  }

  test("ann near-dup pairs finds planted duplicate vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val dup = (100L until 110L).map(i => (i, base((i - 100).toInt)._2.map(x => x * 1.001f)))
    val df = (base ++ dup).toDF("vec_id", "embedding")
    val pairs = Similarity.annNearDupPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.99, dim = 16, tables = 6, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, (i + 100).toLong)), s"missing pair $i")
    }
  }

  test("ann near-dup hot-bucket cap bounds degenerate-embedding candidates") {
    import spark.implicits._
    // 1,000 identical vectors: every table hashes them all into ONE bucket.
    // Uncapped that is 1000·999/2 ≈ 500k candidate pairs; the cap TRUNCATES
    // each oversized bucket to its first 50 sorted members, so the giant
    // exact-duplicate cluster is still flagged (the first 50 ids pair with
    // each other — transitively collapsible) while the pair count is
    // bounded by cap²/2 per bucket regardless of corpus size.
    val one = Array.fill(16)(1.0f)
    val df = (0L until 1000L).map(i => (i, one)).toDF("vec_id", "embedding")
    val capped = Similarity.annNearDupPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.99, dim = 16, tables = 6, bits = 8, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.length == 50 * 49 / 2,
      s"truncated bucket must yield exactly cap·(cap-1)/2 pairs, got ${capped.length}")
    assert(capped.forall { case (a, b) => a < 50 && b < 50 },
      "pairs must come from the first cap sorted members only")
    intercept[IllegalArgumentException] {
      Similarity.annNearDupPairs(df, col("vec_id"), col("embedding"),
        threshold = 0.99, dim = 16, tables = 6, bits = 8, maxBucketSize = 1)
    }
    // and a mixed corpus keeps its small-bucket signal: plant 10 dups among
    // 1,000 identical decoys — the dup pairs still surface because their
    // buckets are small once the degenerate bucket is excluded
    val rnd = new scala.util.Random(7)
    val planted = (1000L until 1010L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val dups = planted.map { case (i, v) => (i + 10, v.map(_ * 1.001f)) }
    val mixed = ((0L until 1000L).map(i => (i, one)) ++ planted ++ dups)
      .toDF("vec_id", "embedding")
    val pairs = Similarity.annNearDupPairs(mixed, col("vec_id"), col("embedding"),
      threshold = 0.99, dim = 16, tables = 6, bits = 8, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1000L until 1010L).foreach { i =>
      assert(pairs.contains((i, i + 10)), s"missing planted pair $i under cap")
    }
  }

  test("text stats basics") {
    import spark.implicits._
    val df = Seq("one two  three", "", "  ").toDF("text")
    val counts = df.select(TextStats.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(3, 0, 0))
    val lang = Seq("the cat and the dog of it", "el gato y la casa de un es")
      .toDF("text").select(TextStats.langId(col("text"))).collect().map(_.getString(0))
    assert(lang.toSeq == Seq("en", "es"))
    val fp = Seq("A  B", "a b").toDF("text")
      .select(TextStats.fingerprintMd5(col("text"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1)) // normalization: case + whitespace
    val roll = Seq("abc").toDF("text")
      .select(TextStats.fingerprintRolling(col("text"))).head.getLong(0)
    assert(roll == (((('a'.toLong * 31) + 'b') * 31) + 'c') % 1000000007L)
  }

  test("langId kernel UDF matches the bound-column regex form on real docs") {
    // the fast single-pass kernel must be byte-identical to the
    // regexp_count argmax it replaces (which the DuckDB oracle pins)
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val both = TextStats.withLangId(docs, col("text"), "lang_regex")
      .withColumn("lang_fast", TextStats.langIdUdf(col("text")))
    val diff = both.where(col("lang_regex") =!= col("lang_fast")).collect()
    assert(diff.isEmpty, s"kernel/regex mismatch on ${diff.length} docs, e.g. ${diff.take(3).mkString}")
    // edge cases: empty, punctuation-adjacent markers, CJK, tie-break order
    import spark.implicits._
    val edge = Seq("", "the, and; of!", "sand theory android", "的是了",
      "the el the el").toDF("text")
    val pairs = TextStats.withLangId(edge, col("text"), "r")
      .withColumn("f", TextStats.langIdUdf(col("text")))
      .collect().map(r => (r.getAs[String]("r"), r.getAs[String]("f")))
    pairs.foreach { case (r, f) => assert(r == f, s"edge mismatch: $r vs $f") }
  }

  test("quality-stats kernel UDF matches the column-algebra form on real docs") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .union(Seq((9000001L, ""), (9000002L, "   "), (9000003L, "a.b,c!"),
        (9000004L, "the\tand\nof")).toDF("doc_id", "text"))
    val t = col("text")
    val both = docs
      .withColumn("_qs", TextStats.qualityStatsUdf(t))
      .withColumn("_c", TextStats.collapsed(t))
      .withColumn("_tc",
        when(length(col("_c")) === 0, 0).otherwise(regexp_count(col("_c"), lit(" ")) + 1))
      .withColumn("r_pr", when(length(t) === 0, 0d)
        .otherwise(regexp_count(t, lit("\\p{Punct}")).cast("double") / length(t)))
      .withColumn("r_mwl", when(col("_tc") === 0, 0d)
        .otherwise((length(col("_c")) - (col("_tc") - 1)).cast("double") / col("_tc")))
      .withColumn("r_sr", when(col("_tc") === 0, 0d)
        .otherwise(regexp_count(lower(t),
          lit(TextStats.markerPattern(TextStats.StopwordsEn))).cast("double") / col("_tc")))
    val diff = both.where(
      col("_qs._1") =!= length(t) || col("_qs._2") =!= col("r_pr") ||
      col("_qs._3") =!= col("r_sr") || col("_qs._4") =!= col("r_mwl")).collect()
    assert(diff.isEmpty, s"kernel/column mismatch on ${diff.length} docs, e.g. ${diff.take(2).mkString}")
  }

  test("text-stats kernel UDF matches the column-algebra form on real docs") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .union(Seq((9000001L, ""), (9000002L, "   "), (9000003L, "a.b,c!:; ?"),
        (9000004L, " x\ty \n z ")).toDF("doc_id", "text"))
    val t = col("text")
    val both = docs
      .withColumn("_ts", TextStats.textStatsUdf(t))
      .withColumn("r_c", TextStats.collapsed(t))
      .withColumn("r_tc",
        when(length(col("r_c")) === 0, 0).otherwise(regexp_count(col("r_c"), lit(" ")) + 1))
      .withColumn("r_punct", regexp_count(t, lit("[.,!?;:]")))
      .withColumn("r_mwl", when(col("r_tc") === 0, 0d)
        .otherwise((length(col("r_c")) - (col("r_tc") - 1)).cast("double") / col("r_tc")))
    val diff = both.where(
      col("_ts._1") =!= col("r_tc") || col("_ts._2") =!= col("r_punct") ||
      col("_ts._3") =!= col("r_mwl") || col("_ts._4") =!= col("r_c")).collect()
    assert(diff.isEmpty, s"kernel/column mismatch on ${diff.length} docs, e.g. ${diff.take(2).mkString}")
  }

  test("text-stats md5 kernel matches md5(lower(collapsed)) and the stats form") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .union(Seq((9000001L, ""), (9000002L, "   "), (9000003L, "A.b,C!:; ?"),
        (9000004L, " X\tY \n z "), (9000005L, "ÄÖÜ Straße İstanbul"))
        .toDF("doc_id", "text"))
    val t = col("text")
    val both = docs
      .withColumn("_tm", TextStats.textStatsMd5Udf(t))
      .withColumn("_ts", TextStats.textStatsUdf(t))
      .withColumn("r_md5", md5(lower(TextStats.collapsed(t))))
    val diff = both.where(
      col("_tm._1") =!= col("_ts._1") || col("_tm._2") =!= col("_ts._2") ||
      col("_tm._3") =!= col("_ts._3") || col("_tm._4") =!= col("r_md5")).collect()
    assert(diff.isEmpty, s"md5-kernel mismatch on ${diff.length} docs, e.g. ${diff.take(2).mkString}")
  }

  test("unigram logprob scores common-token docs above rare-token docs") {
    import spark.implicits._
    val docs = (Seq.fill(20)("the cat sat on the mat").zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    } :+ (100L, "zxqv wvzk qqjx plmw")).toDF("doc_id", "text")
    val scored = TextStats.unigramLogProb(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(0L) > scored(100L),
      s"common-token doc ${scored(0L)} should beat rare-token doc ${scored(100L)}")
    assert(scored.values.forall(_ < 0d)) // log of probabilities < 1
  }

  test("multimodal decode: real PNG/WAV/frame bytes round-trip the recipe") {
    import spark.implicits._
    // ids picked to cover each modality: 3·k → PNG, 3·k+1 → WAV, 3·k+2 → FSEQ
    val src = (0L until 30L).map(Tuple1(_)).toDF("doc_id")
    val media = Multimodal.syntheticMedia(src, col("doc_id")).persist()
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)

    // the payloads are REAL containers: PNG magic / RIFF magic / FSEQ magic
    val magics = media.select(col("media_id"), substring(col("payload"), 1, 4))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(magics(0L).drop(1).sameElements("PNG".getBytes), "PNG signature")
    assert(magics(1L).sameElements("RIFF".getBytes), "RIFF/WAVE signature")
    assert(magics(2L).sameElements("FSEQ".getBytes), "frame-container magic")

    // image: javax.imageio must recover the gradient recipe exactly.
    // m=6: w=10, h=10, rb=6, gb=18, blue=42; mean_r = 6 + 4.5, mean_g = 22.5
    val m = 6L
    val png = media.where(col("media_id") === m).select("payload")
      .head.getAs[Array[Byte]](0)
    val Some((w, h, mr, mg, mb)) = Multimodal.decodeImageJvm(png)
    assert((w, h) == (Multimodal.pngWidth(m), Multimodal.pngHeight(m)))
    assert(mr == Multimodal.pngRBase(m) + (w - 1) / 2.0, s"mean_r $mr")
    assert(mg == Multimodal.pngGBase(m) + (h - 1) / 2.0, s"mean_g $mg")
    assert(mb == Multimodal.pngBlue(m).toDouble, s"mean_b $mb")

    // audio: javax.sound.sampled must recover the PCM recipe exactly
    val ma = 7L
    val wav = media.where(col("media_id") === ma).select("payload")
      .head.getAs[Array[Byte]](0)
    val Some((n, mean, vmin, vmax)) = Multimodal.decodeAudioJvm(wav)
    val ref = (0 until Multimodal.wavSamples(ma)).map(Multimodal.wavSample(ma, _))
    assert(n == ref.length.toLong)
    assert(mean == ref.sum.toDouble / ref.length)
    assert(vmin == ref.min && vmax == ref.max)

    // video: every frame decodes; means follow the per-frame recipe
    val mv = 8L
    val seq = media.where(col("media_id") === mv).select("payload")
      .head.getAs[Array[Byte]](0)
    val Some((nf, fw, fh, fmr)) = Multimodal.decodeFramesJvm(seq)
    assert(nf == Multimodal.seqFrames(mv) && fw == 8 && fh == 8)
    val refMr = (0 until nf).map(Multimodal.seqFrameRed(mv, _)).sum.toDouble / nf
    assert(fmr == refMr)

    // cross-modality garbage is rejected as null, not mis-decoded
    assert(Multimodal.decodeImageJvm(wav).isEmpty)
    assert(Multimodal.decodeAudioJvm(png).isEmpty)
    assert(Multimodal.decodeFramesJvm(png).isEmpty)

    // distributed feature stage: one row per media row, kind-specific dims
    val feats = Multimodal.extractFeatures(media, col("payload"), col("meta.mime"))
      .select(col("media_id"), col("meta.mime").as("mime"), col("features"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[Double](2))).toList
    assert(feats.length == 30)
    feats.foreach { case (id, mime, f) =>
      if (mime.startsWith("image/")) assert(f.length == 5, s"$id")
      else assert(f.length == 4, s"$id")
      assert(f.forall(v => !v.isNaN))
    }
    // determinism: same id → same features
    val f1 = feats.find(_._1 == 6L).get._3
    val again = Multimodal.extractFeatures(media, col("payload"), col("meta.mime"))
      .where(col("media_id") === 6L).select("features").head.getSeq[Double](0)
    assert(f1 == again)

    // resize math caps dims, audio stays 0×0
    val resized = Multimodal.resizeMeta(media, 32)
    val dims = resized.select(greatest(col("meta.width"), col("meta.height")))
      .collect().map(_.getInt(0))
    assert(dims.forall(_ <= 32))

    // frame sampling: one row per DECODED frame with recipe-true means
    val frames = Multimodal.sampleFrames(media)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val expectFrames = (0L until 30L).filter(_ % 3 == 2)
      .map(Multimodal.seqFrames).sum
    assert(frames.length == expectFrames, "one row per contained frame")
    frames.filter(_._1 == mv).foreach { case (_, idx, ts, meanR) =>
      assert(ts == idx * Multimodal.FrameMs)
      assert(meanR == Multimodal.seqFrameRed(mv, idx).toDouble)
    }
    media.unpersist()
  }

  test("payload store: fetch returns the stored bytes and touches only the routed bucket directories") {
    import spark.implicits._
    val src = (0L until 60L).map(Tuple1(_)).toDF("doc_id")
    val media = Multimodal.syntheticMedia(src, col("doc_id")).persist()
    val store = java.nio.file.Files.createTempDirectory("media_store").toString
    Multimodal.writePayloadStore(media, col("media_id"), store, nBuckets = 8)
    assert(Multimodal.payloadStoreBuckets(spark, store) === 8)
    val ids = Seq(3L, 17L, 41L)
    // fetched payloads are byte-identical to the written ones
    val want = media.where(col("media_id").isin(ids: _*))
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val got = Multimodal.fetchPayloads(spark, store, ids)
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(got === want)
    // bucket pruning: the scan reads ONLY the driver-routed directories
    val routed = ids.map(InvertedIndex.docBucketOfLocal(_, 8)).distinct.sorted
    val touched = Multimodal.fetchPayloads(spark, store, ids)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .flatMap(f => "mbucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .distinct.sorted.toSeq
    assert(touched === routed,
      s"expected only buckets $routed touched, got $touched")
    // and the store populates more buckets than the fetch routed
    val all = spark.read.parquet(store).select("mbucket").distinct().count()
    assert(all > routed.size)
    media.unpersist()
  }

  test("payload store maintenance: upserts surface past their tombstone, deletes vanish, compact equals a rebuild") {
    import spark.implicits._
    val src = (0L until 40L).map(Tuple1(_)).toDF("doc_id")
    val media = Multimodal.syntheticMedia(src, col("doc_id")).persist()
    val store = java.nio.file.Files.createTempDirectory("media_maint").toString
    Multimodal.writePayloadStore(media, col("media_id"), store, nBuckets = 8)
    // change feed: upsert ids 3 and 5 with DIFFERENT payloads (the
    // recipe of id+100), delete id 7
    val replacements = Multimodal.syntheticMedia(
        Seq(103L, 105L).toDF("doc_id"), col("doc_id"))
      .select((col("media_id") - 100L).as("media_id"), col("payload"),
        col("meta"), lit("upsert").as("op"))
    val feed = replacements.unionByName(
      Multimodal.syntheticMedia(Seq(7L).toDF("doc_id"), col("doc_id"))
        .select(col("media_id"), col("payload"), col("meta"),
          lit("delete").as("op")))
    Multimodal.applyPayloadChangeFeed(feed, col("media_id"), col("op"), store)
    def fetched(ids: Seq[Long]) = Multimodal.fetchPayloads(spark, store, ids)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val got = fetched(Seq(3L, 5L, 7L, 11L))
    assert(!got.contains(7L), "deleted id still fetchable")
    val want103 = Multimodal.syntheticMedia(Seq(103L).toDF("doc_id"),
      col("doc_id")).select("payload").head.getAs[Array[Byte]](0).toSeq
    assert(got(3L) === want103, "upsert did not replace the payload")
    val want11 = media.where(col("media_id") === 11L).select("payload")
      .head.getAs[Array[Byte]](0).toSeq
    assert(got(11L) === want11, "untouched id changed")
    // compact makes the removal physical and equals a rebuild over the
    // live rows: same fetches, tombstones gone, generation reset
    Multimodal.compactPayloads(spark, store)
    assert(Multimodal.payloadStoreGen(spark, store) === 0L)
    assert(fetched(Seq(3L, 5L, 7L, 11L)) === got)
    assert(spark.read.parquet(store).where(col("media_id") === 7L).count() === 0L,
      "compact left dead bytes")
    media.unpersist()
  }

  test("payload store describe + tombstone-debt policy: sidecar-sized Lucene-stale counts, debt-priced trigger") {
    import spark.implicits._
    val src = (0L until 40L).map(Tuple1(_)).toDF("doc_id")
    val media = Multimodal.syntheticMedia(src, col("doc_id"))
    val store = java.nio.file.Files.createTempDirectory("media_desc").toString
    Multimodal.writePayloadStore(media, col("media_id"), store, nBuckets = 8)
    def d(): (Long, Int, Long, Long) = {
      val r = Multimodal.describePayloadStore(spark, store).head()
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
    }
    assert(d() === ((40L, 8, 0L, 0L)))
    Multimodal.appendPayloads(
      Multimodal.syntheticMedia((100L until 105L).map(Tuple1(_)).toDF("doc_id"),
        col("doc_id")), col("media_id"), store)
    assert(d() === ((45L, 8, 1L, 0L)))
    // logical deletes: n_rows stays Lucene-stale, debt surfaces
    Multimodal.deletePayloads(spark, store,
      Seq(1L, 2L).toDF("media_id"), col("media_id"))
    assert(d() === ((45L, 8, 2L, 2L)))
    // 2/45 < 10% -> below the debt threshold: a no-op (gen untouched)
    assert(!Multimodal.compactPayloadsIfNeeded(spark, store, maxDeadFrac = 0.1))
    assert(d() === ((45L, 8, 2L, 2L)))
    // push debt past the threshold -> compacts: exact survivor count,
    // generations reset, debt spent
    Multimodal.deletePayloads(spark, store,
      Seq(3L, 4L, 5L).toDF("media_id"), col("media_id"))
    assert(Multimodal.compactPayloadsIfNeeded(spark, store, maxDeadFrac = 0.1))
    assert(d() === ((40L, 8, 0L, 0L)))
    // and the compacted store still serves: deleted gone, survivors intact
    val got = Multimodal.fetchPayloads(spark, store, Seq(1L, 6L, 100L))
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(6L, 100L))
  }

  test("rrf fuses ranked lists: overlap sums, misses contribute nothing") {
    import spark.implicits._
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val sem = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("id", "rank")
    val out = Fusion.rrf(Seq(lex, sem), "id", "rank", k = 60)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    def c(r: Int) = 1.0 / (60 + r)
    assert(math.abs(out(2L)._1 - (c(2) + c(1))) < 1e-12 && out(2L)._2 == 2L)
    assert(math.abs(out(1L)._1 - c(1)) < 1e-12 && out(1L)._2 == 1L)
    assert(math.abs(out(3L)._1 - (c(3) + c(2))) < 1e-12)
    assert(math.abs(out(4L)._1 - c(3)) < 1e-12 && out(4L)._2 == 1L)
    // the doc ranked mid-list in BOTH lists beats a top-of-one-list doc
    assert(out(2L)._1 > out(1L)._1 && out(3L)._1 > out(4L)._1)
    intercept[IllegalArgumentException](Fusion.rrf(Nil, "id", "rank"))
    intercept[IllegalArgumentException](Fusion.rrf(Seq(lex), "id", "rank", k = 0))
  }

  test("hard negatives: same-label excluded, ranked by similarity, k respected") {
    import spark.implicits._
    val corpus = Seq(
      (10L, 0, Array(1f, 0f)),     // same label as anchor — excluded even at sim 1
      (11L, 1, Array(0.9f, 0.1f)), // hardest cross-label negative
      (12L, 1, Array(0f, 1f)),     // orthogonal
      (13L, 2, Array(1f, 0.05f))   // near-identical, different label
    ).toDF("vec_id", "label", "embedding")
    val anchors = Seq((0L, 0, Array(1f, 0f))).toDF("vec_id", "label", "embedding")
    val out = Similarity.hardNegatives(corpus, col("vec_id"), col("embedding"),
        col("label"), anchors, col("vec_id"), col("embedding"), col("label"), k = 2)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._3).toSeq == Seq(13L, 11L), s"got ${out.toSeq}")
    assert(out.forall(_._1 == 0L) && out.map(_._2).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r._4 > 0.9 && r._4 <= 1.0))
    intercept[IllegalArgumentException](
      Similarity.hardNegatives(corpus, col("vec_id"), col("embedding"),
        col("label"), anchors, col("vec_id"), col("embedding"), col("label"), k = 0))
  }

  test("cosine topKBatch: per query identical to topK; one scan serves the batch") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
    val qs = Seq(0L, 7L).map { vid =>
      s"q$vid" -> emb.where(col("vec_id") === vid)
        .select("embedding").head().getSeq[Float](0).toArray
    }
    val batched = Similarity.topKBatch(emb, col("vec_id"), col("embedding"),
        qs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(t => (t._2, t._3)).toSet }
    qs.foreach { case (qid, qv) =>
      val single = Similarity.topK(emb, col("vec_id"), col("embedding"), qv, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batched(qid) === single, s"$qid: batch result diverged from topK")
    }
    intercept[IllegalArgumentException](
      Similarity.topKBatch(emb, col("vec_id"), col("embedding"), Nil, 5))
    // the scale claim: the rank filter compiles to a WindowGroupLimit
    // per-partition prune, so ≤ k rows per (partition, qid) shuffle —
    // never corpus × batch (sparkPlan: the pre-AQE physical plan, so
    // the node is visible without unwrapping AdaptiveSparkPlanExec)
    val plan = Similarity.topKBatch(emb, col("vec_id"), col("embedding"),
      qs, k = 10).queryExecution.sparkPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }.nonEmpty, "topKBatch rank filter did not plan a WindowGroupLimit prune")
  }

  test("hard negatives: corpus-sized anchor misuse fails loudly, bound is tunable") {
    import spark.implicits._
    val corpus = Seq((10L, 0, Array(1f, 0f))).toDF("vec_id", "label", "embedding")
    val many = (1L to 5L).map(i => (i, 1, Array(1f, 0f)))
      .toDF("vec_id", "label", "embedding")
    spark.conf.set("graft.hardNegatives.maxAnchors", "3")
    try {
      val e = intercept[IllegalArgumentException] {
        Similarity.hardNegatives(corpus, col("vec_id"), col("embedding"),
          col("label"), many, col("vec_id"), col("embedding"), col("label"), k = 1)
      }
      assert(e.getMessage.contains("anchor set exceeds 3"))
      spark.conf.set("graft.hardNegatives.maxAnchors", "5")
      assert(Similarity.hardNegatives(corpus, col("vec_id"), col("embedding"),
        col("label"), many, col("vec_id"), col("embedding"), col("label"), k = 1)
        .count() === 5)
    } finally spark.conf.unset("graft.hardNegatives.maxAnchors")
  }

  test("dup shingle fraction: exact dups 1.0, near-dup partial, unique 0.0") {
    val out = Dedup.dupShingleFraction(docs, col("doc_id"), col("text"), n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // docs 1 and 6 are identical 14-token docs → 11 grams, all shared
    assert(out(1L) == ((11L, 1.0)) && out(6L) == ((11L, 1.0)))
    // doc 2 differs only in the last token: the 10 grams not touching it
    // are shared with 1/6, the final gram is unique → 10/11
    assert(out(2L)._1 == 11L)
    assert(math.abs(out(2L)._2 - math.floor(10.0 / 11 * 1e6 + 0.5) / 1e6) < 1e-12)
    // singleton-content docs share nothing; the empty doc has no grams
    assert(out(3L) == ((6L, 0.0)) && out(4L) == ((10L, 0.0)))
    assert(out(5L) == ((0L, 0.0)))
  }

  test("source overlap: shared distinct grams and Jaccard per source pair") {
    import spark.implicits._
    val df = Seq(
      ("sA", "a b c"),   // {a b, b c}
      ("sA", "b c d"),   // {b c, c d} → sA = {a b, b c, c d}
      ("sB", "a b c d"), // {a b, b c, c d}
      ("sB", "x y"),     // {x y}      → sB = {a b, b c, c d, x y}
      ("sC", "p q")      // {p q}      → no overlap with anyone
    ).toDF("source", "text")
    val out = Dedup.sourceOverlap(df, col("source"), col("text"), n = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // zero-overlap pairs (sA,sC), (sB,sC) produce no row at all
    assert(out.toSeq == Seq(("sA", "sB", 3L, 4L, 3L, 0.75)))
  }

  test("source overlap: duplicate docs collapse via distinct, no fan-out") {
    import spark.implicits._
    // 500 identical docs per source: the distinct (source, gram) projection
    // must collapse them BEFORE the self-join — output is one exact row,
    // not 500² join matches
    val df = ((1 to 500).map(_ => ("s1", "w1 w2 w3"))
      ++ (1 to 500).map(_ => ("s2", "w1 w2 w3"))).toDF("source", "text")
    val out = Dedup.sourceOverlap(df, col("source"), col("text"), n = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(("s1", "s2", 2L, 2L, 2L, 1.0)))
  }

  test("shared span pairs: counts verbatim runs, maxDf drops boilerplate") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"), // abc bcd cde
      (2L, "a b c d x"), // abc bcd cdx
      (3L, "z z z"),     // zzz (df=1, never paired)
      (4L, "a b c q r")  // abc
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpanPairs(df, col("doc_id"), col("text"), n = 3,
        maxDf = 50)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 2L), (1L, 4L, 1L), (2L, 4L, 1L)))
    // maxDf=2 drops "a b c" (df=3): only the bcd pair survives
    val capped = Dedup.sharedSpanPairs(df, col("doc_id"), col("text"), n = 3,
        maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq == Seq((1L, 2L, 1L)))
    intercept[IllegalArgumentException](
      Dedup.sharedSpanPairs(df, col("doc_id"), col("text"), n = 1))
    intercept[IllegalArgumentException](
      Dedup.sharedSpanPairs(df, col("doc_id"), col("text"), maxDf = 1))
  }

  test("kl divergence: corpus-typical doc near 0, skewed doc higher") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = TextStats.klDivergence(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // corpus: a=2 b=2 (q=0.5 each); doc1 p=(2/3,1/3); doc2 p_b=1
    val kl1 = 2.0 / 3 * math.log((2.0 / 3) / 0.5) +
      1.0 / 3 * math.log((1.0 / 3) / 0.5)
    assert(math.abs(out(1L) - kl1) < 1e-12)
    assert(math.abs(out(2L) - math.log(2)) < 1e-12)
    assert(out(2L) > out(1L))
  }
}

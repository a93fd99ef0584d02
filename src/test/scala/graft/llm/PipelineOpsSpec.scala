package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 pipeline operators: decontamination, PII scrub, repetition
  * signals, stratified sampling, semantic dedup.
  */
class PipelineOpsSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta unrelated tail words here"), // shares 4-gram with 1
      (3L, "completely different content with no overlap at all"),
      (4L, "short text"),
      (5L, "")
    ).toDF("doc_id", "text")
  }

  test("embedding contamination: max cosine vs benchmark, no join in plan") {
    import spark.implicits._
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vid", "v")
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // exact copy of bench 100 → 1.0
      (2L, Array(0.6f, 0.8f, 0.0f, 0.0f)),   // 0.8 vs bench 101
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vid", "v") // orthogonal → 0
    val out = Decontaminate.embeddingContamination(corpus, col("vid"), col("v"),
      bench, col("v"), threshold = 0.9)
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got(1L) == (1.0, 1L))
    assert(math.abs(got(2L)._1 - 0.8) < 1e-6 && got(2L)._2 == 0L)
    assert(got(3L) == (0.0, 0L))
    // the corpus side must be a narrow map: no join, no shuffle exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"corpus side must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"corpus side must not shuffle:\n$plan")
    intercept[IllegalArgumentException] {
      Decontaminate.embeddingContamination(corpus, col("vid"), col("v"),
        bench.where(col("vid") < 0), col("v"), threshold = 0.9)
    }
  }

  test("embedding contamination: corpus-sized bench misuse fails loudly, bound tunable") {
    import spark.implicits._
    val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("vid", "v")
    val many = (100L to 104L).map(i => (i, Array(1.0f, 0.0f))).toDF("vid", "v")
    spark.conf.set("graft.decontaminate.maxBenchRows", "3")
    try {
      val e = intercept[IllegalArgumentException] {
        Decontaminate.embeddingContamination(corpus, col("vid"), col("v"),
          many, col("v"), threshold = 0.9)
      }
      assert(e.getMessage.contains("benchmark set exceeds 3"))
      spark.conf.set("graft.decontaminate.maxBenchRows", "5")
      assert(Decontaminate.embeddingContamination(corpus, col("vid"), col("v"),
        many, col("v"), threshold = 0.9).count() === 1)
    } finally spark.conf.unset("graft.decontaminate.maxBenchRows")
  }

  test("decontamination flags docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("bid", "btext")
    val out = Decontaminate.contaminationCounts(docs, col("doc_id"), col("text"),
      bench, col("btext"), n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 1L), "doc 1 contains the benchmark 4-gram")
    assert(out(2L) == (1L, 1L), "doc 2 contains the benchmark 4-gram")
    assert(out(3L) == (0L, 0L) && out(4L) == (0L, 0L) && out(5L) == (0L, 0L))
    assert(out.size == 5, "one row per corpus document")
  }

  test("removeContaminated drops exactly the flagged docs") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("bid", "btext")
    val kept = Decontaminate.removeContaminated(docs, col("doc_id"), col("text"),
      bench, col("btext"), n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("docs shorter than n tokens are never contaminated") {
    import spark.implicits._
    val bench = Seq((100L, "short text padding tokens")).toDF("bid", "btext")
    val out = Decontaminate.contaminationCounts(docs, col("doc_id"), col("text"),
      bench, col("btext"), n = 4)
      .where(col("id") === 4L).head()
    assert(out.getLong(1) == 0L, "2-token doc has no 4-grams")
  }

  test("decontamination joins survive a docs-side `id` column (ADVICE r3)") {
    import spark.implicits._
    // the caller's DataFrame already has a column literally named `id` —
    // the internal hits join must not resolve against it
    val withId = docs.withColumn("id", col("doc_id") * 10)
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("bid", "btext")
    val kept = Decontaminate.removeContaminated(withId, col("doc_id"), col("text"),
      bench, col("btext"), n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L), "anti-join keyed on the caller's id column")
    val counts = Decontaminate.contaminationCounts(withId, col("doc_id"), col("text"),
      bench, col("btext"), n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("pii scrub counts and redacts emails, phones, IPv4s") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or 555-0123 from 192.168.0.1"),
      (2L, "no pii here, just text with numbers 12 and 3.14"),
      (3L, "two mails: a@b.co c.d@e-f.org and ip 10.0.0.255")
    ).toDF("id", "text")
    val out = Pii.scrub(df, col("text"))
      .select("id", "n_email", "n_phone", "n_ip", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "reach me at [EMAIL] or [PHONE] from [IP]")
    assert(out(2L) == (0L, 0L, 0L, "no pii here, just text with numbers 12 and 3.14"))
    assert(out(3L)._1 == 2 && out(3L)._3 == 1)
    assert(out(3L)._4 == "two mails: [EMAIL] [EMAIL] and ip [IP]")
  }

  test("pii injection recipe is deterministic and detected in full") {
    import spark.implicits._
    val df = (0L to 100L).map(i => (i, s"doc $i body")).toDF("id", "text")
    val scrubbed = Pii.scrub(
      df.withColumn("t", Pii.injected(col("text"), col("id"))), col("t"))
    val sums = scrubbed.agg(sum("n_email"), sum("n_phone"), sum("n_ip")).head()
    assert(sums.getLong(0) == (0L to 100L).count(_ % 5 == 0))
    assert(sums.getLong(1) == (0L to 100L).count(_ % 7 == 0))
    assert(sums.getLong(2) == (0L to 100L).count(_ % 11 == 0))
  }

  /** Plain-Scala reference for the repetition kernel. */
  private def repRef(text: String): (Double, Double) = {
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) (0d, 0d)
    else {
      val top = toks.groupBy(identity).values.map(_.length).max.toDouble / toks.length
      val dup =
        if (toks.length < 2) 0d
        else {
          val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
          1d - bgs.distinct.length.toDouble / bgs.length
        }
      (top, dup)
    }
  }

  test("repetition kernel matches the reference on golden cases") {
    import spark.implicits._
    val cases = Seq(
      "spam spam spam spam",                       // one word: twf=1, all bigrams equal
      "a b a b a b a b",                           // alternating: dup bigrams
      "all words here are completely distinct",    // no repetition
      "Mixed CASE mixed case MIXED case",          // lowercase folding
      "single",
      "",
      "  \t leading and trailing \n ",
      "\tfoo",                                     // edge tab: empty fields dropped
      "\t",                                        // non-space whitespace only
      "a\u000Bb a\u000Bb")                   // vertical tab is a separator
    val out = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .withColumn("r", TextStats.repetitionUdf(col("text")))
      .orderBy("id")
      .collect().map(r => (r.getStruct(2).getDouble(0), r.getStruct(2).getDouble(1)))
    cases.zip(out).foreach { case (t, (gotTop, gotDup)) =>
      val (refTop, refDup) = repRef(t)
      assert(math.abs(gotTop - refTop) < 1e-12, s"top-word frac for '$t'")
      assert(math.abs(gotDup - refDup) < 1e-12, s"dup-bigram frac for '$t'")
    }
  }

  test("repetition kernel matches the reference on the corpus sample") {
    val sample = graft.Tables.documents(spark, sf).limit(50)
    val got = sample
      .withColumn("r", TextStats.repetitionUdf(col("text")))
      .select(col("doc_id"), col("text"), col("r._1"), col("r._2"))
      .collect()
    got.foreach { r =>
      val (refTop, refDup) = repRef(r.getString(1))
      assert(math.abs(r.getDouble(2) - refTop) < 1e-12)
      assert(math.abs(r.getDouble(3) - refDup) < 1e-12)
    }
  }

  test("rateToHex boundaries and monotonicity") {
    assert(Mixing.rateToHex(0.0) == "000000")
    assert(Mixing.rateToHex(0.5) == "800000")
    assert(Mixing.rateToHex(1.0) == "gggggg", "full rate compares above every hex prefix")
    assert(Mixing.rateToHex(0.25) == "400000")
    val hexes = Seq(0.1, 0.2, 0.4, 0.8).map(Mixing.rateToHex)
    assert(hexes == hexes.sorted)
  }

  test("stratified sampling is deterministic, rate-accurate, and nested") {
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val rates = Map("a" -> 0.5, "b" -> 0.1)
    val once = Mixing.stratifiedSample(df, col("id"), col("stratum"), rates)
      .collect().map(_.getLong(0)).toSet
    val twice = Mixing.stratifiedSample(df, col("id"), col("stratum"), rates)
      .collect().map(_.getLong(0)).toSet
    assert(once == twice, "same membership on re-run")
    val aKept = once.count(_ % 2 == 0).toDouble / 2000
    val bKept = once.count(_ % 2 == 1).toDouble / 2000
    assert(math.abs(aKept - 0.5) < 0.05, s"a-rate $aKept")
    assert(math.abs(bKept - 0.1) < 0.03, s"b-rate $bKept")
    // hash-gate nesting: a lower rate selects a SUBSET of a higher rate —
    // the property that makes sample sizes tunable without resampling
    val lower = Mixing.stratifiedSample(df, col("id"), col("stratum"),
      Map("a" -> 0.2, "b" -> 0.02)).collect().map(_.getLong(0)).toSet
    assert(lower.subsetOf(once))
    // rate 1.0 keeps everything (the "gggggg" threshold)
    val all = Mixing.stratifiedSample(df, col("id"), col("stratum"),
      Map("a" -> 1.0, "b" -> 1.0))
    assert(all.count() == 4000)
  }

  test("subword kernel matches the regex column forms exactly") {
    import spark.implicits._
    val goldens = Seq(
      "the quick brown fox", "abcdefghij run of letters", "digits 12345 mix3d",
      "punct!!! and, (parens) [brackets]", "", "   ", "\tfoo", " foo\t ",
      "a", "ñé unicode glyphs ß", "x  double  spaces", "tab\tinner\nnewline")
    val df = (goldens ++ graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val cmp = df.select(
      col("id"),
      TextStats.subwordStatsUdf(col("text")).as("k"),
      TextStats.subwordCount(col("text")).as("rs"),
      TextStats.tokenCount(col("text")).as("rt"))
      .collect()
    cmp.foreach { r =>
      val k = r.getStruct(1)
      assert(k.getInt(0) == r.getInt(2), s"subwords mismatch on id ${r.getLong(0)}")
      assert(k.getInt(1) == r.getInt(3), s"tokens mismatch on id ${r.getLong(0)}")
    }
  }

  test("semantic dedup pairs near-dups within clusters only") {
    import spark.implicits._
    // two well-separated clusters on orthogonal axes; ids 0/1 become the
    // centroids (k=2). 0,2,4 cluster on +x; 1,3 on +y. Planted near-dups:
    // (0,2) same direction, (1,3) same direction; 4 is x-ish but rotated
    // beyond the 0.9 threshold.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f)),
      (2L, Array(0.99f, 0.1f, 0f)),
      (3L, Array(0.05f, 0.99f, 0f)),
      (4L, Array(0.8f, 0.55f, 0.2f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDedupPairs(vecs, col("vec_id"),
      col("embedding"), k = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), s"x-cluster near-dup in $pairs")
    assert(pairs.contains((1L, 3L)), s"y-cluster near-dup in $pairs")
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) },
      "4 is not a near-dup of anything at 0.9")
    assert(!pairs.contains((0L, 1L)), "centroids are orthogonal")
  }

  test("semantic dedup never emits cross-cluster pairs") {
    import spark.implicits._
    // 0 and 1 orthogonal centroids; 2 sits at 45° — lands in exactly one
    // cluster (tie-break smallest cid at exact ties; here slightly x-ward)
    val vecs = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0f, 1f)),
      (2L, Array(0.72f, 0.7f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupPairs(vecs, col("vec_id"),
      col("embedding"), k = 2, threshold = -1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    // with threshold -1 every same-cluster pair appears; 2 is x-clustered,
    // so (0,2) appears and (1,2) must not
    val pairSet = out.map(_._1).toSet
    assert(pairSet.contains((0L, 2L)))
    assert(!pairSet.contains((1L, 2L)), "cross-cluster pair leaked")
  }

  test("semantic dedup auto-k and skewed-cluster cap") {
    import spark.implicits._
    // k ≤ 0 derives k = max(8, ceil(sqrt(n)))
    assert(Similarity.semanticDedupAutoK(4L) == 8)
    assert(Similarity.semanticDedupAutoK(10000L) == 100)
    assert(Similarity.semanticDedupAutoK(10001L) == 101)
    // skewed corpus: 200 copies of +x collapse into one cell, plus a small
    // +y cell with a planted near-dup. The cap TRUNCATES the degenerate
    // cell to its first 50 sorted members (which would be ~20k pairs
    // uncapped; the duplicate cluster is still flagged) and keeps the
    // small cell's pair untouched.
    val skew = (2L until 200L).map(i => (i, Array(1f, 0f, 0f)))
    val vecs = (Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f)),
      (200L, Array(0f, 0.99f, 0.1f))) ++ skew).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDedupPairs(vecs, col("vec_id"),
      col("embedding"), k = 2, threshold = 0.9, maxClusterSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 200L)), s"small cell's pair lost: $pairs")
    // x cell sorted ids are 0,2,3..50 (id 1 lives in the y cell): exactly
    // the first 50 members pair up, nothing beyond the truncation point
    val xPairs = pairs - ((1L, 200L))
    assert(xPairs.size == 50 * 49 / 2,
      s"truncated cell must yield cap·(cap-1)/2 pairs, got ${xPairs.size}")
    assert(xPairs.forall { case (a, b) => a <= 50 && b <= 50 },
      s"pairs beyond the truncated membership: $xPairs")
    // auto-k end-to-end: k ≤ 0 still returns the planted pair (n=201 → k=15)
    val auto = Similarity.semanticDedupPairs(vecs, col("vec_id"),
      col("embedding"), k = 0, threshold = 0.9, maxClusterSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.contains((1L, 200L)), s"auto-k lost the planted pair: $auto")
    // the default cap is FINITE (10·√n) — opt-in guards protect nobody
    assert(Similarity.semanticDedupAutoClusterCap(10000L) == 1000)
    assert(Similarity.semanticDedupAutoClusterCap(4L) == 64)
  }

  test("cluster assignment: literal-fold and broadcast-kernel paths agree") {
    import spark.implicits._
    // the two assignment paths (codegen'd argmax fold for small k,
    // broadcast-array kernel past FoldAssignMaxK) must be value-identical
    // — same 6-dp rounding, same strict-> earliest-centroid tie-break
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 300L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val s = vecs.select(col("vec_id").as("id"),
      Similarity.normalized(col("embedding")).as("v"))
    val centroids = s.orderBy("id").limit(20)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val fold = Similarity.assignClusters(s, centroids, viaFold = true)
      .select("id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val kernel = Similarity.assignClusters(s, centroids, viaFold = false)
      .select("id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fold == kernel, "assignment paths diverged")
    // exact ties (duplicated vectors among the centroids) break the same way
    val dupVecs = (0L until 50L).map(i => (i, Array(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val sd = dupVecs.select(col("vec_id").as("id"),
      Similarity.normalized(col("embedding")).as("v"))
    val dupCentroids = sd.orderBy("id").limit(10)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val foldD = Similarity.assignClusters(sd, dupCentroids, viaFold = true)
      .select("cid").collect().map(_.getLong(0)).toSet
    val kernelD = Similarity.assignClusters(sd, dupCentroids, viaFold = false)
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(foldD == Set(0L) && kernelD == Set(0L),
      s"ties must resolve to the earliest centroid: fold=$foldD kernel=$kernelD")
  }
}

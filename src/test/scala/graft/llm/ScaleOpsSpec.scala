package graft.llm

import graft.SparkSpec
import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Round-4 scale operators: winnowing fingerprints, chunk-level passage
  * dedup, bigram LM scoring, sequence packing, per-group profiling.
  */
class ScaleOpsSpec extends SparkSpec {

  // ---------------------------------------------------------------- winnow

  /** Naive O(grams × w) winnowing reference. */
  private def winnowRef(text: String, k: Int, w: Int): Set[String] = {
    if (text == null || text.length < k + w - 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (0 to text.length - k).map { i =>
      md.reset()
      md.digest(text.substring(i, i + k).getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString
    }
    grams.sliding(w).map(_.min).toSet
  }

  test("winnow kernel matches the naive reference") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",            // all grams identical
      "abcdefghij",                       // exactly one full window at k=8,w=3
      "abcdefghijk",
      "short",                            // below k
      "exactlyk",                         // == k but < k+w-1
      "")
    for (t <- cases; (k, w) <- Seq((8, 4), (5, 3), (4, 2))) {
      val got = Fingerprint.winnow(t, k, w).toSet
      assert(got == winnowRef(t, k, w), s"k=$k w=$w on '$t'")
    }
    // corpus sample
    graft.Tables.documents(spark, sf).limit(30)
      .select("text").collect().map(_.getString(0)).foreach { t =>
        assert(Fingerprint.winnow(t, 8, 4).toSet == winnowRef(t, 8, 4))
      }
  }

  test("winnowing guarantee: shared substring >= k+w-1 shares a fingerprint") {
    val k = 8; val w = 4
    val shared = "this exact passage is lifted verbatim between documents"
    assert(shared.length >= k + w - 1)
    val a = "prefix words before the theft " + shared + " and an a-side tail"
    val b = "totally different opening here " + shared + " other closing text"
    val fa = Fingerprint.winnow(a, k, w).toSet
    val fb = Fingerprint.winnow(b, k, w).toSet
    assert((fa & fb).nonEmpty, "lifted passage must leave a common fingerprint")
    // and two unrelated texts share none
    val c = Fingerprint.winnow(
      "completely unrelated content with zero overlap anywhere at all", k, w).toSet
    assert((fa & c).isEmpty)
  }

  test("overlapPairs surfaces the planted partial overlap only") {
    import spark.implicits._
    val shared = "one identical boilerplate sentence repeated across both pages"
    val docs = Seq(
      (1L, "first document unique opening " + shared + " first unique close"),
      (2L, "second page different start " + shared + " second ending words"),
      (3L, "third document has absolutely nothing in common with others here"),
      (4L, "fourth one likewise completely distinct text body start to end")
    ).toDF("id", "text")
    val pairs = Fingerprint.overlapPairs(docs, col("id"), col("text"),
      minShared = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  // ----------------------------------------------------------- chunk dedup

  test("chunk kernel: consecutive chunks, trailing partial kept") {
    val words = (1 to 37).map(i => s"w$i").mkString(" ")
    val got = ChunkDedup.chunks(words, 16)
    assert(got.length == 3)
    assert(got(0) == (1 to 16).map(i => s"w$i").mkString(" "))
    assert(got(2) == (33 to 37).map(i => s"w$i").mkString(" "))
    assert(ChunkDedup.chunks("", 16).isEmpty)
    assert(ChunkDedup.chunks("  \t ", 16).isEmpty)
    assert(ChunkDedup.chunks("a b", 16).sameElements(Array("a b")))
  }

  test("chunk dedup stats flag exactly the cross-document chunks") {
    import spark.implicits._
    val c16 = (1 to 16).map(i => s"tok$i").mkString(" ") // one full shared chunk
    val docs = Seq(
      (1L, c16 + " " + (100 to 110).map(i => s"ua$i").mkString(" ")),
      (2L, c16 + " " + (200 to 210).map(i => s"ub$i").mkString(" ")),
      (3L, (300 to 330).map(i => s"uc$i").mkString(" ")),
      (4L, "")
    ).toDF("id", "text")
    val out = ChunkDedup.stats(docs, col("id"), col("text"), c = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (2L, 1L, 0.5), "first chunk shared, unique tail not")
    assert(out(2L) == (2L, 1L, 0.5))
    assert(out(3L) == (2L, 0L, 0.0))
    assert(out(4L) == (0L, 0L, 0.0), "empty doc scores zero, still present")
  }

  test("removeDupChunks keeps the first occurrence and reassembles in order") {
    import spark.implicits._
    val c16 = (1 to 16).map(i => s"tok$i").mkString(" ")
    val tailA = (1 to 16).map(i => s"ua$i").mkString(" ")
    val docs = Seq(
      (1L, c16 + " " + tailA),
      (2L, c16 + " " + (1 to 16).map(i => s"ub$i").mkString(" "))
    ).toDF("id", "text")
    val out = ChunkDedup.removeDupChunks(docs, col("id"), col("text"), c = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == c16 + " " + tailA, "doc 1 keeps the shared chunk")
    assert(out(2L) == (1 to 16).map(i => s"ub$i").mkString(" "),
      "doc 2 loses the later duplicate, keeps its unique chunk")
  }

  // ------------------------------------------------------------- bigram LM

  test("bigram logprob: smoothing and hand-computed values") {
    import spark.implicits._
    // corpus: "a b" x2 and "a c". V=3 (a,b,c); c(a)=3, c(a b)=2, c(a c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("id", "text")
    val out = LangModel.bigramLogProb(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val v = 4.0 // vocab: a, b, c, solo
    val pAB = math.log((2.0 + 1) / (3.0 + v))
    val pAC = math.log((1.0 + 1) / (3.0 + v))
    assert(math.abs(out(1L) - pAB) < 1e-12)
    assert(math.abs(out(2L) - pAB) < 1e-12)
    assert(math.abs(out(3L) - pAC) < 1e-12)
    assert(!out.contains(4L), "single-token doc has no bigrams")
    assert(out(1L) > out(3L), "frequent transition scores higher")
  }

  test("bigram logprob separates natural from shuffled transitions") {
    // same unigram profile, scrambled transitions → lower bigram score
    import spark.implicits._
    val base = "the cat sat on the mat and the dog sat on the rug"
    val shuffled = "mat the on dog sat the and rug cat the on sat the"
    val corpus = (1L to 20L).map(i => (i, base)) :+ (99L, shuffled)
    val out = LangModel.bigramLogProb(corpus.toDF("id", "text"),
      col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(99L), "shuffled doc must score lower")
  }

  // --------------------------------------------------------------- packing

  test("packing matches the sequential reference at any partition count") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 500L).map(i => (i, 1L + rng.nextInt(400)))
    val budget = 2048L
    // sequential reference
    val ref = rows.sortBy(_._1)
      .scanLeft((-1L, 0L, 0L)) { case ((_, _, cum), (id, tok)) =>
        (id, cum / budget, cum + tok)
      }.drop(1).map { case (id, bin, _) => id -> bin }.toMap
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("id", "n_tok").repartition(parts)
      val got = Packing.assignBins(df, col("id"), col("n_tok"), budget,
        numPartitions = parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == ref, s"partition count $parts")
    }
  }

  test("token-budget selection matches the sequential greedy reference") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val rows = (0L until 400L).map(i =>
      (i, math.floor(rng.nextDouble() * 100) / 100, 1L + rng.nextInt(200)))
    val budget = 5000L
    // sequential reference: score desc, id asc, cumulative (inclusive) <= budget
    val ref = rows.sortBy { case (id, sc, _) => (-sc, id) }
      .scanLeft((-1L, 0L)) { case ((_, cum), (id, _, tok)) => (id, cum + tok) }
      .drop(1).takeWhile(_._2 <= budget).map { case (id, cum) => id -> cum }.toMap
    for (parts <- Seq(1, 4, 16)) {
      val df = rows.toDF("id", "score", "n_tok").repartition(parts)
      val got = Packing.tokenBudgetSelect(df, col("id"), col("score"),
        col("n_tok"), budget, numPartitions = parts)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == ref, s"partition count $parts")
    }
    // no unpartitioned window in the plan
    val plan = Packing.tokenBudgetSelect(rows.toDF("id", "score", "n_tok"),
      col("id"), col("score"), col("n_tok"), budget)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "prefix sum must not plan a global window")
    intercept[IllegalArgumentException] {
      Packing.tokenBudgetSelect(rows.toDF("id", "score", "n_tok"),
        col("id"), col("score"), col("n_tok"), 0L)
    }
  }

  test("packing plan has no global window and bins respect the budget") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, 100L)).toDF("id", "n_tok")
    val out = Packing.assignBins(df, col("id"), col("n_tok"), 1000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "prefix sum must not plan a global window")
    val manifest = Packing.binManifest(df, col("id"), col("n_tok"), 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 100-token docs into 1000-token bins: exactly 10 docs per bin
    assert(manifest.forall { case (_, nDocs, nTok) => nDocs == 10 && nTok == 1000 })
    assert(manifest.length == 30)
  }

  // --------------------------------------------------------------- profile

  test("profile exact matches hand stats; approx tracks exact") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10), ("b", 30))
      .toDF("g", "v")
    val got = Profile.exact(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(5), r.getDouble(4))).toMap
    assert(got("a")._1 == 4L)
    assert(math.abs(got("a")._2 - 2.5) < 1e-9, "mean")
    assert(math.abs(got("a")._3 - 2.5) < 1e-9, "interpolated median of 1,2,3,4")
    assert(got("b")._1 == 2L && math.abs(got("b")._3 - 20.0) < 1e-9)
    val approx = Profile.approx(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    // percentile_approx returns an observed value, not an interpolation —
    // within the group's span is the contract
    assert(approx("a") >= 1.0 && approx("a") <= 4.0)
    assert(approx("b") >= 10.0 && approx("b") <= 30.0)
  }

  test("percentile threshold: sketch path tracks the exact path") {
    import spark.implicits._
    // On a heavily-duplicated grid distribution (the quality-score shape at
    // corpus scale: many docs per banded value) the exact interpolated
    // percentile lands ON a data value — the same value the
    // percentile_approx sketch returns, so swapping `exact = false` in
    // does not move the filter boundary at all.
    // p chosen so p·(n−1) falls strictly INSIDE a 50-wide band — at an
    // exact band edge the interpolation legitimately mixes two bands and
    // no single data value equals it (not the duplication contract)
    val banded = (0 until 1000).map(i => (i % 20) * 0.05).toDF("v")
    for (p <- Seq(0.26, 0.53, 0.77, 0.91)) {
      val ex = Profile.percentileThreshold(banded, col("v"), p, exact = true)
      val ap = Profile.percentileThreshold(banded, col("v"), p, exact = false)
      assert(ex == ap, s"banded p=$p: exact=$ex approx=$ap")
    }
    // On the real (tiny, duplication-free at this sf) corpus the exact
    // percentile may interpolate BETWEEN two adjacent order statistics;
    // the sketch then returns one of those two — no third data value may
    // sit between the two thresholds (the filter boundary moves by at
    // most the boundary docs themselves).
    val q = graft.QueriesLlm.qQuality(spark, sf).persist()
    try {
      for (p <- Seq(0.5, 0.75, 0.9)) {
        val ex = Profile.percentileThreshold(q, col("quality"), p, exact = true)
        val ap = Profile.percentileThreshold(q, col("quality"), p, exact = false)
        val between = q.where(col("quality") > math.min(ex, ap) &&
          col("quality") < math.max(ex, ap)).count()
        assert(between == 0,
          s"p=$p: $between values strictly between exact=$ex and approx=$ap")
      }
    } finally { q.unpersist() }
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (the MOSS algorithm, Schleimer/Wilkerson/
  * Aiken SIGMOD'03): hash every character k-gram, slide a window of `w`
  * consecutive gram hashes, keep the minimum of each window, distinct the
  * selections. The guarantee: any substring match of length ≥ k + w − 1
  * between two documents shares at least one selected fingerprint — so
  * fingerprint-set intersection detects partial plagiarism/boilerplate
  * overlap that whole-document hashing (TextStats.fingerprintMd5 /
  * fingerprintRolling) misses, at ~1/w the storage of the full gram set.
  *
  * Scale design: selection is a narrow per-document map (single kernel pass,
  * no shuffle, no gram table materialized). Downstream overlap detection
  * explodes only the SELECTED fingerprints — (fp, id) pairs at ~2/w density
  * of the gram stream — into a groupBy, the same slim-shuffle shape as the
  * MinHash band join ([[Dedup.minhashNearDupPairs]]).
  *
  * Gram hash = first 16 hex chars of md5, compared as a string: md5 is the
  * one hash both verification engines share, and hex strings order like the
  * underlying bytes. A production corpus run would swap in xxhash64 via the
  * same kernel shape (one line); the selection logic is hash-agnostic.
  *
  * Positions are Java char offsets (UTF-16 code units); parity with
  * character-addressed engines holds for BMP text. Documents with fewer
  * than k + w − 1 chars (no full window) have no fingerprints.
  */
object Fingerprint {

  /** Distinct winnowed fingerprints for one document, sorted — a
    * single-pass monotonic-deque sliding minimum (O(grams), not
    * O(grams × w)).
    */
  private[graft] def winnow(text: String, k: Int, w: Int): Array[String] = {
    if (text == null || text.length < k + w - 1) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = text.length - k + 1 // gram count
    val grams = new Array[String](m)
    var i = 0
    while (i < m) {
      val d = md.digest(text.substring(i, i + k).getBytes("UTF-8"))
      val sb = new java.lang.StringBuilder(16)
      var b = 0
      while (b < 8) { // 16 hex chars = 8 bytes
        sb.append(Character.forDigit((d(b) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(b) & 0xf, 16))
        b += 1
      }
      grams(i) = sb.toString
      md.reset()
      i += 1
    }
    // monotonic deque of indices: head is the window minimum (leftmost on
    // ties — `<` keeps the earlier index; ties are identical strings so the
    // distinct SET is tie-break-independent either way)
    val sel = new scala.collection.mutable.TreeSet[String]
    val deque = new java.util.ArrayDeque[Int]
    var j = 0
    while (j < m) {
      while (!deque.isEmpty && grams(deque.peekLast) >= grams(j)) deque.pollLast()
      deque.addLast(j)
      if (deque.peekFirst <= j - w) deque.pollFirst()
      if (j >= w - 1) sel += grams(deque.peekFirst)
      j += 1
    }
    sel.toArray
  }

  private def winnowUdf(k: Int, w: Int) =
    udf { (text: String) => winnow(text, k, w) }

  /** Per-document fingerprint column (sorted distinct selected hashes). */
  def fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    winnowUdf(k, w)(text)

  /** Per-document fingerprint summary: selection count plus an md5 over the
    * sorted selection (a stable set digest two engines can agree on). Docs
    * too short for a full window get (0, NULL).
    */
  def summary(df: DataFrame, id: Column, text: Column,
      k: Int = 8, w: Int = 4): DataFrame =
    df.select(id.as("id"), fingerprints(text, k, w).as("_fps"))
      .select(col("id"),
        size(col("_fps")).cast("long").as("n_fp"),
        when(size(col("_fps")) > 0,
          md5(array_join(col("_fps"), ",").cast("binary"))).as("fp_md5"))

  /** Document pairs sharing ≥ `minShared` fingerprints — the overlap
    * detector. Shuffle carries (fp, id) pairs only; fingerprint buckets are
    * capped like LSH buckets (a fingerprint shared by half the corpus is
    * boilerplate, not plagiarism — it belongs to [[Boilerplate]], and the
    * quadratic pair explosion it would cause belongs to nobody).
    */
  def overlapPairs(df: DataFrame, id: Column, text: Column,
      k: Int = 8, w: Int = 4, minShared: Int = 2,
      maxBucket: Int = 200): DataFrame = {
    val fps = df.select(id.as("id"), explode(fingerprints(text, k, w)).as("fp"))
    val buckets = fps.groupBy("fp")
      .agg(sort_array(collect_list("id")).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a AS id_a, b AS id_b))))"))
        .as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}

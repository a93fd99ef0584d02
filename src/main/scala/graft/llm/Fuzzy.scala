package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy key matching at edit distance ≤ 1 — the dedup primitive for
  * near-identical titles, URLs, and entity names that exact hashing
  * misses by one typo. The all-pairs levenshtein comparison is
  * quadratic in the key count and dead on arrival at corpus scale; this
  * uses FastSS deletion-neighborhood blocking instead:
  *
  * two strings at levenshtein distance ≤ 1 ALWAYS share a member of
  * their deletion-≤1 neighborhoods (equal → the string itself; one
  * insertion → deleting the inserted char; one substitution → deleting
  * the differing position from both), so candidate pairs only need to
  * form inside neighborhood buckets. The shuffle carries (variant, key)
  * pairs — O(len) per key, never the corpus — and a final levenshtein
  * gate removes the distance-2 false candidates (two different
  * deletions landing on the same variant).
  */
object Fuzzy {

  /** The string itself plus every single-character deletion (distinct —
    * runs of equal chars collapse).
    */
  private[graft] def del1(s: String): Array[String] = {
    val out = new Array[String](s.length + 1)
    out(0) = s
    var i = 0
    while (i < s.length) {
      out(i + 1) = s.substring(0, i) + s.substring(i + 1)
      i += 1
    }
    out.distinct
  }

  private val del1Udf = udf { (s: String) => del1(s) }

  /** Distinct unordered pairs (key_a < key_b) of `key` values at
    * levenshtein distance ≤ 1.
    *
    * `maxBucket` caps each variant bucket at its N smallest keys (the
    * MinHash hot-bucket discipline): a pathological variant shared by
    * millions of keys — single characters, the empty string from
    * length-1 keys — would otherwise go quadratic. The cap trades recall
    * ONLY inside oversized buckets, deterministically (smallest keys
    * win); at the driver's corpus scales no bucket approaches the
    * default, so q_fuzzy_pairs' brute-force oracle is exact.
    */
  def keyPairs(df: DataFrame, key: Column,
      maxBucket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = df.select(key.as("k")).where(col("k").isNotNull).distinct()
    val buckets = keys.select(col("k"), explode(del1Udf(col("k"))).as("v"))
      .withColumn("_r", row_number().over(
        Window.partitionBy("v").orderBy("k")))
      .where(col("_r") <= maxBucket)
      .drop("_r")
    buckets.as("x").join(buckets.as("y"),
        col("x.v") === col("y.v") && col("x.k") < col("y.k"))
      .select(col("x.k").as("key_a"), col("y.k").as("key_b"))
      .distinct()
      .where(levenshtein(col("key_a"), col("key_b")) <= 1)
  }
}

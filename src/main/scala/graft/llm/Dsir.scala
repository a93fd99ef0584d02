package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Data Selection via Importance
  * Resampling, Xie et al. 2023): score every document by how much more
  * likely its tokens are under a TARGET-domain bag-of-words model than
  * under the raw-corpus model,
  *
  *   weight(d) = mean_w [ ln p_target(w) − ln p_raw(w) ],
  *
  * with both models add-one smoothed over the shared corpus vocabulary.
  * Documents with positive weight look like the target domain; selection
  * (top fraction / hash-gated resampling) composes downstream exactly
  * like q_quality_filter.
  *
  * Scale design: two partial-aggregated token-count tables (slim (token,
  * count) rows — at production scale DSIR hashes tokens into 2^k buckets
  * to bound this table; with a bounded vocabulary the raw-token table IS
  * the bounded table), joined once into a per-token log-ratio table that
  * broadcasts (vocabulary-sized); scoring is then a map-side join over
  * the token stream plus one per-doc rollup. Corpus-wide state: three
  * scalars (target tokens, raw tokens, vocabulary size).
  *
  * Weights round to 4 dp (the bigram-logprob convention: libm ln and avg
  * summation order differ at the ulp level across engines).
  */
object Dsir {

  /** (id, weight): mean per-occurrence log-ratio for every document with
    * at least one token. `isTarget` marks rows belonging to the target
    * domain (they stay in the raw model too — DSIR contrasts target
    * against the full corpus, not its complement).
    */
  def weights(df: DataFrame, id: Column, text: Column,
      isTarget: Column): DataFrame = {
    val occ = df.select(id.as("id"), isTarget.as("tgt"),
      explode(TextStats.tokens(lower(text))).as("w"))
    val raw = occ.groupBy("w").agg(count(lit(1)).as("cr"))
    val tgt = occ.where(col("tgt")).groupBy("w").agg(count(lit(1)).as("ct"))
    val totals = occ.agg(count(lit(1)),
      sum(when(col("tgt"), 1L).otherwise(0L))).head
    val nRaw = totals.getLong(0)
    val nTgt = totals.getLong(1)
    val v = raw.count() // shared vocabulary size
    val logRatio = raw.join(tgt, Seq("w"), "left").select(col("w"),
      (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
          lit((nTgt + v).toDouble))
        - log((col("cr") + 1).cast("double") / lit((nRaw + v).toDouble)))
        .as("lw"))
    // + 0.0 canonicalizes IEEE -0.0 (a tiny negative mean rounds to zero;
    // engines disagree on the sign of that zero, and the driver's value
    // hash renders "-0" vs "0")
    occ.join(broadcast(logRatio), "w")
      .groupBy("id").agg((round(avg("lw"), 4) + lit(0.0)).as("weight"))
  }
}

package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** FastText-style hashed linear classifier APPLY — the learned-quality-
  * gate step of a CC-scale curation pipeline (CCNet/LLaMA-style quality
  * filters score every document with a linear model over hashed token
  * features and keep by threshold).
  *
  * Features use the hashing trick: token → md5-derived bucket in
  * [0, D) — the WeightedSample md5-parity derivation, so the oracle
  * replays it exactly. The weight TABLE is a deterministic placeholder
  * (w(b) spread over [-1, 1) by a Knuth-multiplicative mix) because no
  * model artifact can ship in this container; swapping in real learned
  * weights is a broadcast lookup in the same kernel shape. What's real
  * and load-bearing: the hashing-trick featurization, the fully NARROW
  * scoring kernel (a higher-order `aggregate` over the token array —
  * no explode, no shuffle, whole-stage codegen), and the rounded-
  * threshold keep gate (both engines threshold the same 6-dp value, so
  * a borderline score can't flip the flag in one engine only).
  */
object HashClassifier {

  val Buckets = 4096
  /** Knuth multiplicative constant spreading bucket ids over weights. */
  val Mix = 2654435761L
  val WeightMod = 100000L

  /** Mean hashed-feature weight over the doc's tokens (0 for an empty
    * doc): one codegen'd projection, array-order summation (identical
    * fold order to the oracle's list_sum).
    */
  def featMean(tokens: Column): Column = {
    val sum = aggregate(
      transform(tokens, t =>
        (conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("bigint")
          % Buckets * Mix % WeightMod).cast("double")
          / WeightMod * 2 - 1),
      lit(0.0), (acc, x) => acc + x)
    when(size(tokens) > 0, sum / size(tokens)).otherwise(lit(0.0))
  }

  /** Logistic score in (0, 1): sigmoid(3 · featMean). */
  def prob(tokens: Column): Column =
    lit(1.0) / (lit(1.0) + exp(featMean(tokens) * -3))
}

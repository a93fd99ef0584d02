package graft

/** Session-level optimizer tuning shared by every entry point that
  * builds its own SparkSession (Bench, Verify, the tools, the test
  * session). Library operators never mutate a caller's session conf —
  * production deployments apply the same settings at session build.
  */
object SessionTuning {

  /** Excluded optimizer rules, as one comma-joined conf value for
    * `spark.sql.optimizer.excludedRules`.
    *
    * InferFiltersFromGenerate (round 15, guide §4.4's duplication in
    * rule form): for `explode(f(x))` it synthesizes
    * `isnotnull(f(x)) AND size(f(x)) > 0` as a Filter below the
    * Generate — evaluating f a SECOND time per input row. The generator
    * already skips null/empty inputs, so the filter only pays off when
    * it can push further down to a cheap storage predicate — never the
    * case in this engine, where explode inputs are computed in the same
    * stage (shingle/MinHash kernels, regex token splits, sliding
    * windows): plan-verified, the rule doubled the per-row kernel cost
    * of every UDF- or split-fed explode (q_minhash_pairs, q_dedup_*,
    * the token-stats family). Rows are identical with the rule off.
    */
  val ExcludedRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-group numeric column summaries — the first query
  * a curator runs against a new corpus drop (row counts, central tendency,
  * spread, exact quantiles) and the input to drift checks between ingests.
  *
  * Two quantile paths, deliberately:
  *   - [[exact]] uses `percentile` (a full sort per group) — the
  *     verification-grade form, hash-comparable across engines. Fine for
  *     bounded-cardinality groups at test scale; at 100 TB a per-group sort
  *     of a hot group is the bottleneck.
  *   - [[approx]] swaps in `percentile_approx` (a mergeable KLL-style
  *     sketch: partial-aggregated, single shuffle of sketch state, no
  *     sort) — the production path. ProfileSpec bounds its error against
  *     the exact form.
  */
object Profile {

  private def summaryCols(value: Column, exactQuantile: Boolean,
      accuracy: Int): Seq[Column] = {
    val v = value.cast("double")
    val median =
      if (exactQuantile) percentile(v, lit(0.5))
      else percentile_approx(v, lit(0.5), lit(accuracy))
    Seq(
      count(lit(1)).as("n"),
      round(avg(v), 6).as("mean"),
      round(stddev(v), 6).as("std"),
      min(v).as("min"),
      round(median, 6).as("median"),
      max(v).as("max"))
  }

  /** (group, n, mean, std, min, median, max) with an exact interpolated
    * median — one shuffle on the group key.
    */
  def exact(df: DataFrame, group: Column, value: Column): DataFrame = {
    val cols = summaryCols(value, exactQuantile = true, 0)
    df.groupBy(group.as("grp")).agg(cols.head, cols.tail: _*)
  }

  /** Same shape with a sketch median (`percentile_approx`) — the form that
    * survives skewed groups at corpus scale.
    */
  def approx(df: DataFrame, group: Column, value: Column,
      accuracy: Int = 10000): DataFrame = {
    val cols = summaryCols(value, exactQuantile = false, accuracy)
    df.groupBy(group.as("grp")).agg(cols.head, cols.tail: _*)
  }

  /** Corpus-level percentile threshold as ONE driver scalar, snapped to the
    * `dp` grid the values live on (a ±ulp threshold at a duplicated
    * boundary value would otherwise flip every boundary row — the
    * q_quality_filter contract).
    *
    * `exact = true` uses `percentile` (interpolated, full value map on the
    * final aggregator — verification grade, bounded only when the value
    * domain is, e.g. dp-rounded scores). `exact = false` uses
    * `percentile_approx` (mergeable KLL-style sketch, O(accuracy) state,
    * no value map) — the 100 TB path: the sketch returns an actual data
    * value, which on a dp-grid-duplicated distribution is the same grid
    * point the exact interpolation lands on (ProfileSpec pins the
    * equivalence on the corpus quality distribution).
    */
  def percentileThreshold(df: DataFrame, value: Column, p: Double,
      exact: Boolean = true, accuracy: Int = 10000, dp: Int = 6): Double = {
    val v = value.cast("double")
    val agg = if (exact) percentile(v, lit(p))
              else percentile_approx(v, lit(p), lit(accuracy))
    val raw = df.agg(agg).head.getDouble(0)
    val scale = math.pow(10, dp)
    math.floor(raw * scale + 0.5) / scale // DuckDB round() semantics
  }
}

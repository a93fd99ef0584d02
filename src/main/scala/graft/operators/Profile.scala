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
}

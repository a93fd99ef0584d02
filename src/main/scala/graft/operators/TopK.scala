package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k selection — the curation primitive behind "keep the k
  * best documents per domain/source/cluster". A ranked window partitioned
  * by the group key: one shuffle on the group key, per-group sort only
  * (never a global sort), so it scales to any number of groups. For
  * skewed group sizes at extreme scale, pre-filter with an approximate
  * per-group threshold before ranking; at normal cardinalities the plain
  * window is the right plan.
  */
object TopK {

  /** Rows ranked ≤ k within their group by (ord desc, tie asc); emits the
    * input columns plus the 1-based `rk` rank.
    */
  def perGroup(df: DataFrame, grp: Column, ord: Column, tie: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("rk",
      row_number().over(Window.partitionBy(grp).orderBy(ord.desc, tie.asc)))
      .where(col("rk") <= k)
  }
}

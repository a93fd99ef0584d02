package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based PageRank — the canonical-document selector for dedup
  * graphs: given near-dup / link edges, rank nodes by stationary visit
  * probability and keep the highest-ranked member of each group (the
  * "which copy do we keep" policy that min-id tie-breaks approximate).
  *
  * Each iteration is the classic two-shuffle plan: contributions join
  * ranks to edges on src (shuffle 1), partial-aggregate per dst
  * (shuffle 2, map-side combined), then a left join back onto the node
  * set so rankless nodes keep the teleport floor. Rank rows are slim
  * (id, double); nothing collects to the driver but N (one scalar).
  * Iteration count is fixed (power iteration converges geometrically at
  * `damping`), so the plan is O(iters) stages — no data-dependent loop.
  *
  * Cross-engine determinism: ranks round to 9 dp after every update
  * (contribution sums are order-sensitive at the ulp level; the q_pagerank
  * oracle unrolls the same iterations in SQL over the same rounding).
  */
object PageRank {

  /** (id, rank) after `iters` damped power-iteration steps from the
    * uniform start. `edges` must be (src, dst) rows; nodes with no
    * out-links simply contribute nothing (their mass re-enters via the
    * teleport term, the standard simple treatment).
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val n = nodes.count()
    require(n > 0, "empty node set")
    val teleport = (1 - damping) / n
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(outdeg, "src")
    var ranks = nodes.select(col("id"), round(lit(1.0 / n), 9).as("r"))
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks = nodes.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          round(lit(teleport) + lit(damping) * coalesce(col("s"), lit(0d)), 9)
            .as("r"))
    }
    ranks
  }
}

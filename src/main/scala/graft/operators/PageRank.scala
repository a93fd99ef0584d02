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
    *
    * `tol > 0` turns `iters` into a CAP and adds a delta short-circuit:
    * after each step the max |Δrank| is aggregated (one scalar to the
    * driver) and iteration stops once it falls to ≤ tol — the same
    * convergence discipline as [[graft.llm.Dedup.connectedComponents]].
    * At a 100×-scale ranking pass the fixed-iters form either under-
    * converges or burns stages past convergence; the delta form pays one
    * slim max-aggregation per round to stop exactly on time. Each
    * converging round is `localCheckpoint`ed so the lineage stays O(1)
    * instead of growing by two joins per iteration. tol = 0 (default)
    * preserves the exact fixed-iteration plan and q_pagerank's oracle,
    * which unrolls the same `iters` rounds in SQL.
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85, tol: Double = 0.0): DataFrame = {
    val n = nodes.count()
    require(n > 0, "empty node set")
    val teleport = (1 - damping) / n
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(outdeg, "src")
    var ranks = nodes.select(col("id"), round(lit(1.0 / n), 9).as("r"))
    if (tol > 0) ranks = ranks.localCheckpoint(false)
    var converged = false
    var iter = 0
    while (!converged && iter < iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      val next = nodes.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          round(lit(teleport) + lit(damping) * coalesce(col("s"), lit(0d)), 9)
            .as("r"))
      if (tol > 0) {
        val checkpointed = next.localCheckpoint(false)
        val delta = checkpointed
          .join(ranks.withColumnRenamed("r", "r_prev"), "id")
          .agg(max(abs(col("r") - col("r_prev"))).as("d"))
          .head.getDouble(0)
        ranks = checkpointed
        converged = delta <= tol
      } else {
        ranks = next
      }
      iter += 1
    }
    ranks
  }
}

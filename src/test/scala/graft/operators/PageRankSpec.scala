package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank: fixed-iteration determinism (the q_pagerank oracle contract)
  * and the tol-based convergence short-circuit.
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def ring(n: Int) = {
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    (nodes, edges)
  }

  test("fixed iterations: deterministic and mass-conserving") {
    val (nodes, edges) = ring(10)
    val r1 = PageRank.run(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r2 = PageRank.run(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r1 == r2, "fixed-iteration path must be bit-deterministic")
    // a ring is symmetric: every node keeps the uniform rank, total mass 1
    assert(r1.values.forall(v => math.abs(v - 0.1) < 1e-8))
  }

  test("tol short-circuit stops early and converges to the fixed-point") {
    val (nodes, edges) = ring(8)
    // a huge tol converges after the FIRST round: the result must equal
    // the 1-iteration fixed run, proving the short-circuit actually fires
    // (a broken delta check would run all 10 rounds)
    val oneRound = PageRank.run(nodes, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val early = PageRank.run(nodes, edges, iters = 10, tol = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(early == oneRound, "tol=0.5 must stop after the first round")
    // a tight tol on an asymmetric graph: converged ranks agree with a
    // long fixed run to within the tolerance window
    val chainNodes = (0L until 6L).toDF("id")
    val chainEdges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 0L), (0L, 2L), (2L, 4L)).toDF("src", "dst")
    val tolRun = PageRank.run(chainNodes, chainEdges, iters = 200, tol = 1e-9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val longRun = PageRank.run(chainNodes, chainEdges, iters = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    tolRun.foreach { case (id, v) =>
      assert(math.abs(v - longRun(id)) < 1e-6, s"node $id: $v vs ${longRun(id)}")
    }
  }
}

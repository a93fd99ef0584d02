package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed k-means (llm/Cluster.scala): planted-cluster recovery,
  * empty-cluster centroid retention, determinism, and the assignment
  * kernel's tie-break / rounding contract.
  */
class ClusterSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  /** Three well-separated planted clusters must be recovered exactly. */
  test("kmeans recovers planted clusters") {
    val centers = Seq(Seq(0f, 0f), Seq(10f, 10f), Seq(-10f, 5f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 20
    } yield ((ci * 100 + j).toLong,
      Seq(c(0) + (j % 5) * 0.01f, c(1) + (j % 3) * 0.01f))
    // seed rows: ids 0,1,2 are NOT one per planted cluster (all cluster 0),
    // so recovery requires the Lloyd updates to actually move centroids —
    // except they can't split from identical seeds; plant the seeds apart.
    val seeded = rows.filterNot(r => r._1 < 3) ++
      Seq((0L, Seq(0.02f, 0.01f)), (1L, Seq(10.02f, 10.01f)),
        (2L, Seq(-9.98f, 5.01f)))
    val got = Cluster.kmeans(vecDf(seeded), col("id"), col("v"),
      k = 3, iters = 3).collect()
    // plant of a row: seeds 0/1/2 sit in plants 0/1/2; others encode it
    // in the id's hundreds digit
    val byPlant = got.groupBy { r =>
      val id = r.getLong(0); if (id < 3) id else id / 100
    }
    for ((_, rs) <- byPlant)
      assert(rs.map(_.getInt(1)).distinct.length == 1,
        "a planted cluster split across kmeans clusters")
    assert(got.map(_.getInt(1)).distinct.length == 3)
  }

  /** Identical seed vectors: cid 1 loses the first-round tie (break to
    * the lower cid), goes empty, and must keep its centroid — from which
    * it legitimately re-acquires the exact-match points next round once
    * cid 0's centroid has moved toward (1.1, 0.9). The update step must
    * not crash on the empty cluster and every point stays validly
    * assigned, with both (1,1) points landing together.
    */
  test("empty cluster keeps its centroid and assignments stay valid") {
    val rows = Seq(
      (0L, Seq(1f, 1f)), (1L, Seq(1f, 1f)), // duplicate seeds -> cid 1 empty
      (2L, Seq(5f, 5f)),
      (3L, Seq(1.1f, 0.9f)), (4L, Seq(5.1f, 4.9f)))
    val got = Cluster.kmeans(vecDf(rows), col("id"), col("v"),
      k = 3, iters = 2).collect().sortBy(_.getLong(0))
    assert(got.length == 5)
    assert(got.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 3))
    assert(got(0).getInt(1) == got(1).getInt(1), "identical points must co-cluster")
    assert(got(2).getInt(1) == got(4).getInt(1), "the (5,5) plant must co-cluster")
  }

  test("kmeans is deterministic run-to-run") {
    val emb = graft.Tables.embeddings(spark, sf)
    val a = Cluster.kmeans(emb, col("vec_id"), col("embedding"), 4, 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val b = Cluster.kmeans(emb, col("vec_id"), col("embedding"), 4, 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(a.sameElements(b))
  }

  /** Kernel contract: sequential-order squared distance, 6 dp half-up
    * rounding BEFORE the argmin, ties to the lower cid.
    */
  test("assign kernel rounds before comparing and tie-breaks low") {
    // exact tie: equidistant point between two centroids
    val (cid, d) = Cluster.assign(Seq(1f, 0f),
      Array(Array(0.0, 0.0), Array(2.0, 0.0)))
    assert(cid == 0 && d == 1.0)
    // sub-6dp difference rounds equal -> still the lower cid
    val (cid2, _) = Cluster.assign(Seq(0f),
      Array(Array(1.0000000001), Array(-1.0)))
    assert(cid2 == 0)
    // above-rounding difference picks the true nearest
    val (cid3, d3) = Cluster.assign(Seq(0f),
      Array(Array(1.1), Array(-1.0)))
    assert(cid3 == 1 && d3 == 1.0)
  }

  /** The fixed-k query shape on the real table: every row assigned, dist
    * non-negative, cluster ids within range, and the per-cluster mean
    * distance is finite (sanity against degenerate collapse).
    */
  test("kmeans on the embeddings table") {
    val emb = graft.Tables.embeddings(spark, sf)
    val n = emb.count()
    val got = Cluster.kmeans(emb, col("vec_id"), col("embedding"), 8, 2)
    assert(got.count() == n)
    val bad = got.where(col("cluster") < 0 || col("cluster") >= 8 ||
      col("dist") < 0).count()
    assert(bad == 0)
  }

  /** kmeansWithCentroids must be the same fit as kmeans (shared Lloyd
    * loop), and its probed IVF cells must cover only a fraction of the
    * corpus — the read-reduction the coarse quantizer exists for.
    */
  test("kmeansWithCentroids matches kmeans and bounds the probed fraction") {
    val emb = graft.Tables.embeddings(spark, sf)
    val (assigned, cents) = Cluster.kmeansWithCentroids(emb, col("vec_id"),
      col("embedding"), k = 8, iters = 2)
    assert(cents.length == 8 && cents.forall(_.length == 64))
    val viaKmeans = Cluster.kmeans(emb, col("vec_id"), col("embedding"), 8, 2)
    assert(assigned.exceptAll(viaKmeans).isEmpty &&
      viaKmeans.exceptAll(assigned).isEmpty)
    // any 2-cluster probe set reads well under the whole corpus
    val n = emb.count()
    val biggestTwo = assigned.groupBy("cluster").count()
      .orderBy(col("count").desc).limit(2)
      .agg(sum("count")).head().getLong(0)
    assert(biggestTwo < n, s"2 of 8 cells cover the entire corpus ($n rows)")
  }
}

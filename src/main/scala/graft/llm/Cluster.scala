package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column (Lloyd's algorithm) — the
  * clustering stage of semantic data curation: topic balancing, cluster-
  * based mixing weights, and SemDeDup-style pruning all start from a
  * k-means partition of the corpus embedding space.
  *
  * Scale design: centroids are the ONLY driver-side state (k × dim doubles
  * — bytes, not data). Each Lloyd iteration is (1) a narrow assignment map
  * over the corpus with the centroid array broadcast in the UDF closure —
  * no join, no shuffle; (2) a mean update via posexplode + groupBy(cid,
  * pos) with map-side partial aggregation, so the shuffle carries at most
  * k × dim rows PER PARTITION regardless of corpus size. Nothing data-
  * sized ever collects: `collect()` pulls exactly k × dim (cid, pos, mean)
  * rows per iteration.
  *
  * Cross-engine determinism (the q_kmeans oracle replays Lloyd's in SQL):
  * initial centroids are the raw vectors of the k smallest ids (float →
  * double is exact, no rounding needed); every updated centroid component
  * is rounded to 6 dp on both engines, which absorbs the ~1e-12 summation-
  * order noise of avg(); squared distances are likewise rounded to 6 dp
  * before the argmin, with ties broken toward the lower cluster id — the
  * rounding-before-comparison discipline q_tfidf/q_semantic_dedup pinned
  * after ADVICE r3.
  */
object Cluster {

  /** JVM kernel: nearest centroid by 6-dp-rounded squared euclidean
    * distance, ties to the lower cluster id. Sequential i=0..dim-1 sum in
    * double — the same left-to-right order the oracle's list_sum walks, so
    * the two engines agree bit-for-bit before rounding even applies.
    */
  private[graft] def assign(
      v: Seq[Float], cents: Array[Array[Double]]): (Int, Double) = {
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0.0
      var i = 0
      while (i < ct.length) {
        val t = v(i).toDouble - ct(i)
        d += t * t
        i += 1
      }
      // half-away-from-zero at 6 dp via scaled floor (d >= 0 always) —
      // the same scaled-double round DuckDB applies, and allocation-free
      val dr = math.floor(d * 1e6 + 0.5) / 1e6
      if (dr < bestD) { bestD = dr; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** Lloyd's k-means: `iters` centroid updates from a deterministic seed
    * (the vectors of the k smallest ids), then a final assignment.
    * Returns (id, cluster, dist) with dist the 6-dp squared euclidean
    * distance to the winning centroid. A cluster that loses all members
    * keeps its previous centroid (it can re-acquire points later).
    */
  def kmeans(df: DataFrame, id: Column, vec: Column, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val base = df.select(id.as("id"), vec.as("v"))
    val fin = fitCentroids(base, k, iters)
    val finalU = udf { (v: Seq[Float]) => assign(v, fin) }
    base.select(col("id"), finalU(col("v")).as("a"))
      .select(col("id"), col("a._1").as("cluster"), col("a._2").as("dist"))
  }

  /** The Lloyd loop alone: final centroids for callers that need them as
    * driver-side state (IVF probe ordering, label naming). `base` must be
    * (id, v) as produced inside [[kmeans]]; identical math/rounding, so
    * kmeans(df,…) ≡ assign-against-fitCentroids(df,…).
    */
  private[graft] def fitCentroids(base: DataFrame, k: Int,
      iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = base.orderBy("id").limit(k).collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(cents.length == k, s"need >= $k rows to seed $k clusters")

    for (_ <- 1 to iters) {
      val cur = cents
      val assignU = udf { (v: Seq[Float]) => assign(v, cur)._1 }
      // assign BEFORE the explode (its own projection under the Generate)
      // so the kernel runs once per row, not once per generated element;
      // k × dim tiny rows to the driver, shuffle partial-aggregated
      val means = base
        .withColumn("cid", assignU(col("v")))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(round(avg(col("x").cast("double")), 6).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) }
      cents = next
    }
    cents
  }

  /** k-means assignments AND the fitted centroids in one call (one Lloyd
    * fit shared by both) — the IVF shape: the centroid array is the
    * driver-side coarse quantizer, the assignment column the
    * partition/bucket key.
    */
  def kmeansWithCentroids(df: DataFrame, id: Column, vec: Column, k: Int,
      iters: Int): (DataFrame, Array[Array[Double]]) = {
    val base = df.select(id.as("id"), vec.as("v"))
    val fin = fitCentroids(base, k, iters)
    (assignWith(df, id, vec, fin), fin)
  }

  /** Assignment against ALREADY-FITTED centroids — the serving half:
    * callers holding a trained quantizer (a persisted model artifact, or
    * the per-session memo the query suite shares) get (id, cluster,
    * dist) from one narrow kernel pass, no Lloyd jobs. Identical
    * math/rounding to [[kmeans]]'s final step by construction.
    */
  def assignWith(df: DataFrame, id: Column, vec: Column,
      cents: Array[Array[Double]]): DataFrame = {
    val finalU = udf { (v: Seq[Float]) => assign(v, cents) }
    df.select(id.as("id"), finalU(vec).as("a"))
      .select(col("id"), col("a._1").as("cluster"), col("a._2").as("dist"))
  }
}

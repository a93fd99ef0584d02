package graft

import org.apache.spark.sql.functions._

/** q_leak_split's contract: the split key is the near-dup component, so
  * no dup cluster ever straddles two buckets — and the fixture actually
  * exercises that (multi-member clusters exist), so the guarantee is
  * non-vacuous.
  */
class LeakSplitSpec extends SparkSpec {

  test("no near-dup cluster straddles buckets; multi-member clusters exist") {
    val out = QueriesCurate.qLeakSplit(spark, sf)
    val perCluster = out.groupBy("cluster").agg(
      countDistinct("bucket").as("n_buckets"),
      count(lit(1)).as("n_members"))
    val rows = perCluster.collect()
    assert(rows.forall(_.getAs[Long]("n_buckets") == 1L),
      "a cluster was split across buckets — leakage")
    assert(rows.exists(_.getAs[Long]("n_members") > 1L),
      "fixture has no multi-member clusters; the test is vacuous")
    val buckets = out.select("bucket").distinct().collect().map(_.getString(0)).toSet
    assert(buckets.subsetOf(Set("train", "val", "test")))
  }

  test("every document is routed exactly once") {
    val docs = Tables.documents(spark, sf).count()
    assert(QueriesCurate.qLeakSplit(spark, sf).count() === docs)
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle (llm/Shuffle.scala). */
class ShuffleSpec extends SparkSpec {

  import spark.implicits._

  test("order is a permutation of 0..n-1") {
    val docs = graft.Tables.documents(spark, sf)
    val n = docs.count()
    val pos = Shuffle.order(docs, col("doc_id"))
      .select("shuf_pos").collect().map(_.getLong(0)).sorted
    assert(pos.sameElements(0L until n))
  }

  test("order is deterministic and partition-count invariant") {
    val docs = graft.Tables.documents(spark, sf)
    def run(p: Int) = Shuffle.order(docs, col("doc_id"), p)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = run(2)
    val b = run(7)
    val c = run(2)
    assert(a.sameElements(b), "partition count changed the permutation")
    assert(a.sameElements(c), "rerun changed the permutation")
  }

  test("order actually permutes (not identity) and matches the md5 key") {
    val df = (1L to 100L).toDF("id")
    val got = Shuffle.order(df, col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 100L).exists(i => got(i) != i - 1), "identity permutation")
    // reference: sort ids by (md5(id), id) — position must match
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = {
      md.reset()
      md.digest(i.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    val expect = (1L to 100L).sortBy(i => (h(i), i)).zipWithIndex
      .map { case (i, p) => (i, p.toLong) }.toMap
    assert(got == expect)
  }

  test("no global window in the plan") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = Shuffle.order(docs, col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window leaked into:\n$plan")
  }
}

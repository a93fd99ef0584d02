package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("as-of join picks the most recent prior right row per key, inclusive ties") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u1", 100L), // after r@50 → 5.0
      (2L, "u1", 50L),  // tie with r@50 → inclusive → 5.0
      (3L, "u1", 49L),  // before any right → null
      (4L, "u2", 10L),  // u2 has no right rows → null
      (5L, "u1", 300L)  // after r@200 → 7.0
    ).toDF("id", "user", "ts")
    val right = Seq(
      ("u1", 50L, 5.0),
      ("u1", 200L, 7.0),
      ("u3", 1L, 9.0)
    ).toDF("user", "ts", "v")
    val out = AsOf.join(left, right, Seq("user"), "ts", "ts", Seq("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(5.0)), (2L, Some(5.0)), (3L, None), (4L, None), (5L, Some(7.0))))
  }

  test("a matched right row with NULL value yields NULL, not an older value") {
    // DuckDB ASOF returns the matched ROW's value even when it is NULL; a
    // per-column ignoreNulls fill would skip back to r@10's 1.0
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u1", 100L)).toDF("id", "user", "ts")
    val right = Seq(
      ("u1", 10L, Some(1.0)),
      ("u1", 50L, None) // the as-of match, value genuinely NULL
    ).toDF("user", "ts", "v")
    val out = AsOf.join(left, right, Seq("user"), "ts", "ts", Seq("v")).collect()
    assert(out.length == 1 && out.head.isNullAt(3),
      s"expected NULL from the matched row, got ${out.head.get(3)}")
  }

  test("left columns and row count are preserved") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u1", 10L, "x")).toDF("id", "user", "ts", "tag")
    val right = Seq(("u1", 5L, 1.5)).toDF("user", "ts", "v")
    val out = AsOf.join(left, right, Seq("user"), "ts", "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "user", "ts", "tag", "asof_v"))
    assert(out.count() == 1)
  }
}

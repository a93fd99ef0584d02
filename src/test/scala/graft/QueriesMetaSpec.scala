package graft

import org.apache.spark.sql.functions._

/** Driver-visible metadata queries (round 8): the validator report and
  * footer describe as oracle-checked relations. These pin the repo-side
  * invariants the literal-row oracles rely on.
  */
class QueriesMetaSpec extends SparkSpec {

  test("q_validate_report: valid GeoParquet passes all 20 rules; plain parquet short-circuits at rule 1") {
    val rows = QueriesMeta.qValidateReport(spark, sf).collect()
    assert(rows.length === 40)
    val geo = rows.filter(_.getString(0) == "geoparquet")
    assert(geo.length === 20)
    assert(geo.forall(r => r.getAs[Int]("run") == 1 && r.getAs[Int]("passed") == 1),
      geo.filter(_.getAs[Int]("passed") == 0).mkString(","))
    val plain = rows.filter(_.getString(0) == "plain")
    assert(plain.count(_.getAs[Int]("run") == 1) === 1)
    assert(plain.forall(_.getAs[Int]("passed") == 0))
    // rule ids 1..20 in order, titles exactly the reference's
    assert(geo.map(_.getAs[Int]("rule_id")).toSeq === (1 to 20))
    assert(geo.map(_.getAs[String]("title")).toSeq ===
      graft.operators.Validate.titles)
  }

  test("q_describe: fixture schema walk emits parquet-format vocabulary") {
    val rows = QueriesMeta.qDescribe(spark, sf).collect()
    val byName = rows.map(r => r.getAs[String]("column") ->
      (r.getAs[String]("ptype"), r.getAs[String]("annotation"))).toMap
    assert(byName("geometry") === ("BYTE_ARRAY", null))
    assert(byName("name") === ("BYTE_ARRAY", "string"))
    assert(byName("pop_est")._1 === "DOUBLE")
    assert(byName("bbox")._1 === "group")
    assert(rows.forall(r => r.getAs[Long]("n_rows") === 5L &&
      r.getAs[Long]("n_groups") === 1L))
  }

  test("q_ivfpq_recall: one row, candidates a strict subset, sane fractions") {
    val r = QueriesQuality.qIvfPqRecall(spark, sf).head()
    val n = Tables.embeddings(spark, sf).count()
    val cand = r.getAs[Long]("n_candidates")
    assert(cand > 0 && cand < n, s"candidates $cand of $n")
    val recall = r.getAs[Double]("recall")
    assert(recall >= 0.0 && recall <= 1.0)
    assert(r.getAs[Double]("code_bytes_frac") > 0.0 &&
      r.getAs[Double]("code_bytes_frac") < 1.0)
  }
}

package graft.plans

import graft.SparkSpec
import graft.functions.GeoFunctions
import graft.geo.Bbox
import org.apache.spark.sql.SparkSession

class PushBboxFilterSpec extends SparkSpec {

  val cases = "src/test/resources/cases"
  val tanzania = Bbox(34, -7, 36, -6)

  test("naive envelope filter is rewritten onto the bbox column and pushed") {
    // withExtensions only applies at first session creation; in a shared
    // test session the rule goes in via experimental.extraOptimizations
    // (the same Rule instance GraftExtensions would inject)
    val s = spark
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ PushBboxFilter

    val df = s.read.parquet(s"$cases/example-v1.1.0-partitioned.parquet")
      .where(GeoFunctions.st_envelope_intersects(
        org.apache.spark.sql.functions.col("geometry"), tanzania))
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bbox.xmin"),
      s"expected rewritten+pushed bbox predicate:\n$plan")
    assert(!plan.toLowerCase.contains("envelopeintersects"),
      s"expected EnvelopeIntersects to be rewritten away:\n$plan")
  }

  test("without a bbox column the expression evaluates itself") {
    val s = spark
    val df = s.read.parquet(s"$cases/example-v1.0.0.parquet")
      .where(GeoFunctions.st_envelope_intersects(
        org.apache.spark.sql.functions.col("geometry"), tanzania))
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("envelopeintersects"))
  }

  test("antimeridian: rewritten predicate still finds Fiji") {
    val s = spark
    val df = s.read.parquet(s"$cases/example-v1.1.0.parquet")
      .where(GeoFunctions.st_envelope_intersects(
        org.apache.spark.sql.functions.col("geometry"), Bbox(-180, -20, -179, -15)))
    // NOTE: with the rule active, membership is decided by the covering
    // bbox column (reference semantics) — Fiji's bbox crosses the
    // antimeridian and must still match
    val names = df.collect().map(_.getAs[String]("name")).toSet
    assert(names == Set("Fiji"))
  }
}

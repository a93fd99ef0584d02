package graft.plans

import graft.SparkSpec
import graft.functions.GeoFunctions
import graft.geo.Bbox
import graft.sources.GeoParquet
import org.apache.spark.sql.functions.col

class PushBboxFilterSpec extends SparkSpec {

  val cases = "src/test/resources/cases"
  val tanzania = Bbox(34, -7, 36, -6)

  private def withRule[T](body: => T): T = {
    // withExtensions only applies at first session creation; in a shared
    // test session the rule goes in via experimental.extraOptimizations
    // (the same Rule instance GraftExtensions would inject)
    val s = spark
    if (!s.experimental.extraOptimizations.contains(PushBboxFilter))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ PushBboxFilter
    body
  }

  test("naive envelope filter is rewritten onto the bbox column and pushed") {
    withRule {
      val df = GeoParquet.read(spark, s"$cases/example-v1.1.0-partitioned.parquet").df
        .where(GeoFunctions.st_envelope_intersects(col("geometry"), tanzania))
      val rows = df.collect()
      assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("bbox.xmin"),
        s"expected rewritten+pushed bbox predicate:\n$plan")
    }
  }

  test("plain spark.read with a bbox column is NOT rewritten (provenance gate)") {
    withRule {
      // same file, but read outside the GeoParquet context: the rule must
      // not trust an untagged column merely named "bbox"
      val df = spark.read.parquet(s"$cases/example-v1.1.0-partitioned.parquet")
        .where(GeoFunctions.st_envelope_intersects(col("geometry"), tanzania))
      val rows = df.collect()
      assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("envelopeintersects"),
        s"expected the decode path on an untagged frame:\n$plan")
    }
  }

  test("without a bbox column the expression evaluates itself") {
    val df = spark.read.parquet(s"$cases/example-v1.0.0.parquet")
      .where(GeoFunctions.st_envelope_intersects(col("geometry"), tanzania))
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("envelopeintersects"))
  }

  test("antimeridian: rewritten predicate still finds Fiji") {
    withRule {
      val df = GeoParquet.read(spark, s"$cases/example-v1.1.0.parquet").df
        .where(GeoFunctions.st_envelope_intersects(col("geometry"), Bbox(-180, -20, -179, -15)))
      // NOTE: with the rule active, membership is decided by the covering
      // bbox column (reference semantics) — Fiji's bbox crosses the
      // antimeridian and must still match
      val names = df.collect().map(_.getAs[String]("name")).toSet
      assert(names == Set("Fiji"))
    }
  }

  test("null bbox falls back to the decode path instead of dropping the row") {
    withRule {
      val s = spark
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("nullbbox").toString
      val rows = Seq(
        (1L, 35.0, -6.5, false), // inside the box, bbox present
        (2L, 35.0, -6.5, true),  // inside the box, bbox NULL → decode must save it
        (3L, 100.0, 50.0, false) // outside the box
      ).toDF("id", "lon", "lat", "null_bbox")
      val src = rows
        .withColumn("geometry", GeoFunctions.st_point(col("lon"), col("lat")))
        .withColumn("bbox",
          org.apache.spark.sql.functions.when(!col("null_bbox"),
            org.apache.spark.sql.functions.struct(
              (col("lon") - 0.1).as("xmin"), (col("lat") - 0.1).as("ymin"),
              (col("lon") + 0.1).as("xmax"), (col("lat") + 0.1).as("ymax"))))
        .drop("lon", "lat", "null_bbox")
      GeoParquet.write(src, s"$dir/t.parquet")
      val df = GeoParquet.read(spark, s"$dir/t.parquet").df
        .where(GeoFunctions.st_envelope_intersects(col("geometry"), tanzania))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("bbox.xmin"), s"expected the rewrite to fire:\n$plan")
      val ids = df.collect().map(_.getAs[Long]("id")).toSet
      assert(ids == Set(1L, 2L), s"expected null-bbox row 2 kept, got $ids")
    }
  }
}

package graft.sources

import graft.SparkSpec
import graft.functions.GeoFunctions
import graft.geo.Bbox
import graft.operators.Extract
import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** Write-time covering generation (beyond-reference extension): a source
  * without any bbox column gains a GeoParquet 1.1 covering on write, and
  * every downstream bbox extract then runs the row-group-pruned path.
  */
class CoveringSpec extends SparkSpec {

  val cases = "src/test/resources/cases"
  val tanzania = Bbox(34, -7, 36, -6)

  test("write with covering=true materializes bbox + declares covering") {
    val dir = Files.createTempDirectory("covering").toString + "/out"
    // v1.0.0 fixture has geometry but NO bbox column
    val src = GeoParquet.read(spark, s"$cases/example-v1.0.0.parquet")
    assert(!src.df.columns.contains("bbox"))
    val written = GeoParquet.write(src.df, dir, meta = src.meta, covering = true)
    assert(written.primary.get.covering.isDefined)
    assert(written.primary.get.covering.get.xmin == Seq("bbox", "xmin"))

    val back = GeoParquet.read(spark, dir)
    assert(back.df.columns.contains("bbox"))
    assert(back.meta.get.primary.get.covering.isDefined)

    // extract now takes the pushed bbox-column path
    val extracted = Extract.filterByBbox(back.df, back.meta, "geometry", tanzania)
    val plan = extracted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bbox.xmin"),
      s"expected pushed bbox predicate:\n$plan")
    val rows = extracted.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")

    // and the session-wide envelope rewrite trusts the tagged column too
    val s = spark
    if (!s.experimental.extraOptimizations.contains(graft.plans.PushBboxFilter))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.PushBboxFilter
    val viaRule = back.df.where(
      GeoFunctions.st_envelope_intersects(col("geometry"), tanzania))
    val rulePlan = viaRule.queryExecution.executedPlan.toString
    assert(rulePlan.contains("bbox.xmin"), s"expected rewrite onto covering:\n$rulePlan")
    assert(viaRule.collect().map(_.getAs[String]("name")).toSeq == Seq("Tanzania"))
  }

  test("covering is a no-op when a bbox column already exists") {
    val dir = Files.createTempDirectory("covering2").toString + "/out"
    val src = GeoParquet.read(spark, s"$cases/example-v1.1.0.parquet")
    assert(src.df.columns.contains("bbox"))
    val written = GeoParquet.write(src.df, dir, meta = src.meta, covering = true)
    val back = GeoParquet.read(spark, dir)
    assert(back.df.columns.count(_ == "bbox") == 1)
    assert(back.df.count() == 5)
  }
}

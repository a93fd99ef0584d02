package graft.sources

import graft.SparkSpec
import graft.geo.Bbox
import graft.meta.FooterIO
import graft.operators.Extract
import java.nio.file.Files

/** Grid-partitioned GeoParquet layout: directory-level pruning for bbox
  * queries on top of row-group pruning.
  */
class PartitionedSpec extends SparkSpec {

  val cases = "src/test/resources/cases"

  test("partitioned write + extract prunes directories and stays correct") {
    val dir = Files.createTempDirectory("geopart").toString + "/grid"
    val src = GeoParquet.read(spark, s"$cases/example-v1.1.0.parquet")
    val meta = GeoParquet.writePartitioned(src.df.drop("bbox"), dir,
      cellDeg = 30.0, meta = src.meta)
    assert(meta.primary.get.geometryTypes.get.nonEmpty)
    assert(GeoParquet.gridSize(dir).contains(30.0))

    // footer metadata present on leaf files under cell dirs
    assert(FooterIO.readGeoMetadata(dir).isDefined)

    // Tanzania query: correct result through the partitioned layout
    val gf = Extract(spark, dir, Extract.Options(bbox = Some(Bbox(34, -7, 36, -6))))
    val rows = gf.df.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")

    // partition filters appear in the plan (cell_x/cell_y are partition
    // columns, so the predicate prunes directories, not just row groups)
    val plan = gf.df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_x"),
      s"expected cell partition filters in plan:\n$plan")

    // Fiji (antimeridian-crossing geometry) goes to the escape cell and is
    // still found by an eastern query box
    val fiji = Extract(spark, dir, Extract.Options(bbox = Some(Bbox(-180, -20, -179, -15))))
    assert(fiji.df.collect().map(_.getAs[String]("name")).toSet == Set("Fiji"))

    // whole-globe query returns everything
    val all = Extract(spark, dir, Extract.Options(bbox = Some(Bbox(-180, -90, 180, 90))))
    assert(all.df.count() == 5)
  }

  test("antimeridian-crossing query box probes both grid edges") {
    val dir = Files.createTempDirectory("geopart2").toString + "/grid"
    val src = GeoParquet.read(spark, s"$cases/example-v1.1.0.parquet")
    GeoParquet.writePartitioned(src.df.drop("bbox"), dir, cellDeg = 30.0, meta = src.meta)
    val gf = Extract(spark, dir,
      Extract.Options(bbox = Some(Bbox(170, -20, -170, 20))))
    val names = gf.df.collect().map(_.getAs[String]("name")).toSet
    assert(names.contains("Fiji"))
  }
}

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

  test("wide-envelope geometries are never partition-pruned") {
    import spark.implicits._
    import graft.functions.GeoFunctions
    import org.apache.spark.sql.functions.col
    // a polygon spanning 5 cells (50 deg at cellDeg=10): centroid-cell
    // routing would lose it for queries near its edges
    val dir = Files.createTempDirectory("geopart3").toString + "/grid"
    val df = Seq(
      (1L, "POLYGON ((0 0, 50 0, 50 5, 0 5, 0 0))"),   // wide
      (2L, "POLYGON ((100 40, 101 40, 101 41, 100 41, 100 40))")) // small
      .toDF("id", "wkt")
      .select(col("id"), GeoFunctions.wkt_to_wkb(col("wkt")).as("geometry"))
    GeoParquet.writePartitioned(df, dir, cellDeg = 10.0)
    // query only the eastern edge of the wide polygon
    val gf = Extract(spark, dir, Extract.Options(bbox = Some(Bbox(48, 0, 49, 5))))
    assert(gf.df.collect().map(_.getLong(0)).toSet == Set(1L))
    // tall geometry: same guard on latitude
    val dir2 = Files.createTempDirectory("geopart4").toString + "/grid"
    val tall = Seq((3L, "POLYGON ((0 -40, 5 -40, 5 40, 0 40, 0 -40))"))
      .toDF("id", "wkt")
      .select(col("id"), GeoFunctions.wkt_to_wkb(col("wkt")).as("geometry"))
    GeoParquet.writePartitioned(tall, dir2, cellDeg = 10.0)
    val gf2 = Extract(spark, dir2, Extract.Options(bbox = Some(Bbox(0, 35, 5, 39))))
    assert(gf2.df.collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("z-order layout: one directory level, same pruning as the x/y grid") {
    import org.apache.spark.sql.DataFrame
    // files actually READ by a query (post partition pruning): the scan
    // node's numFiles metric after execution
    def filesRead(df: DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val src = GeoParquet.read(spark, s"$cases/example-v1.1.0.parquet")
    val xyDir = Files.createTempDirectory("geopart-xy").toString + "/grid"
    val zDir = Files.createTempDirectory("geopart-z").toString + "/grid"
    GeoParquet.writePartitioned(src.df.drop("bbox"), xyDir, cellDeg = 30.0, meta = src.meta)
    GeoParquet.writePartitioned(src.df.drop("bbox"), zDir, cellDeg = 30.0,
      meta = src.meta, zOrder = true)

    // single-level layout: every partition dir is cell_z=N at the root
    val dirs = new java.io.File(zDir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell_z=")), dirs.toSeq.mkString(","))

    // same queries, same answers, and the z IN-list prunes to the SAME
    // file count as the x/y conjunction (z loses nothing on rectangles)
    for (box <- Seq(Bbox(34, -7, 36, -6), Bbox(-180, -20, -179, -15),
                    Bbox(-180, -90, 180, 90), Bbox(170, -20, -170, 20))) {
      val xy = Extract(spark, xyDir, Extract.Options(bbox = Some(box)))
      val z = Extract(spark, zDir, Extract.Options(bbox = Some(box)))
      val (xyRows, zRows) = (
        xy.df.collect().map(_.getAs[String]("name")).toSet,
        z.df.collect().map(_.getAs[String]("name")).toSet)
      assert(zRows == xyRows, s"$box: z=$zRows xy=$xyRows")
      assert(filesRead(z.df) == filesRead(xy.df),
        s"$box: z layout read ${filesRead(z.df)} files vs xy ${filesRead(xy.df)}")
    }
    // the plan prunes on the single z partition column
    val gf = Extract(spark, zDir, Extract.Options(bbox = Some(Bbox(34, -7, 36, -6))))
    val plan = gf.df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_z"), plan)
  }

  test("z-order key interleaves locality: quad blocks share prefixes") {
    // Morton property: the 2x2 cell block (2i,2j),(2i+1,2j),(2i,2j+1),
    // (2i+1,2j+1) maps to 4 consecutive z values — spatial neighbors land
    // in adjacent directories instead of x-major-distant ones
    for (i <- -4 to 3; j <- -4 to 3) {
      val base = GeoParquet.zEncode(2 * i, 2 * j)
      val quad = Seq(
        GeoParquet.zEncode(2 * i, 2 * j), GeoParquet.zEncode(2 * i + 1, 2 * j),
        GeoParquet.zEncode(2 * i, 2 * j + 1), GeoParquet.zEncode(2 * i + 1, 2 * j + 1))
      assert(quad.sorted == Seq(base, base + 1, base + 2, base + 3), s"($i,$j): $quad")
    }
    // escape routing
    assert(GeoParquet.zEncode(9999, 3) == GeoParquet.ZEscape)
    assert(GeoParquet.zEncode(3, 9999) == GeoParquet.ZEscape)
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

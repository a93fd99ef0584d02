package graft.operators

import graft.SparkSpec
import graft.geo.Bbox
import graft.meta.FooterIO
import graft.sources.GeoParquet
import java.nio.file.Files

/** Ports the reference's extract acceptance cases
  * (cmd/gpq/command/extract_test.go:11-152).
  */
class ExtractSpec extends SparkSpec {

  val cases = "src/test/resources/cases"
  val tanzania = Bbox(34, -7, 36, -6)

  test("bbox-column path: Tanzania query on v1.1.0") {
    val gf = Extract(spark, s"$cases/example-v1.1.0.parquet",
      Extract.Options(bbox = Some(tanzania)))
    val rows = gf.df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "Tanzania")
  }

  test("on-the-fly WKB path: Tanzania query on v1.0.0 (no bbox column)") {
    val gf = Extract(spark, s"$cases/example-v1.0.0.parquet",
      Extract.Options(bbox = Some(tanzania)))
    val rows = gf.df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "Tanzania")
  }

  test("covering path: Tanzania query on v1.1.0-covering (geometry_bbox col)") {
    val gf = Extract(spark, s"$cases/example-v1.1.0-covering.parquet",
      Extract.Options(bbox = Some(tanzania)))
    val rows = gf.df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "Tanzania")
  }

  test("partitioned fixture: row-group stats prune + correct result") {
    val gf = Extract(spark, s"$cases/example-v1.1.0-partitioned.parquet",
      Extract.Options(bbox = Some(tanzania)))
    val rows = gf.df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "Tanzania")
    // the predicate must reach the scan as pushed filters on bbox leaves
    val plan = gf.df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bbox.xmin"),
      s"expected pushed bbox filters in plan:\n$plan")
    // and actually prune: the fixture has 2 row groups (1 + 3 rows); the
    // scan must emit fewer than all 4 rows (reference filter_test.go:43-67
    // reads 1 of 2 groups)
    val scans = gf.df.queryExecution.executedPlan.collectLeaves()
    val scanRows = scans.flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    assert(scanRows < 4, s"expected row-group pruning, scan emitted $scanRows rows")
  }

  test("whole-globe bbox returns all 5 countries") {
    val gf = Extract(spark, s"$cases/example-v1.1.0.parquet",
      Extract.Options(bbox = Some(Bbox(-180, -90, 180, 90))))
    assert(gf.df.count() == 5)
  }

  test("fiji: antimeridian-crossing country matches an eastern box") {
    // Fiji's bbox crosses the antimeridian (xmin 177.28, xmax -179.79)
    val gf = Extract(spark, s"$cases/example-v1.1.0.parquet",
      Extract.Options(bbox = Some(Bbox(-180, -20, -179, -15))))
    val names = gf.df.collect().map(_.getAs[String]("name")).toSet
    assert(names == Set("Fiji"))
  }

  test("keep-only / drop projections with primary guard") {
    val keep = Extract(spark, s"$cases/example-v1.1.0.parquet",
      Extract.Options(keepOnlyCols = Seq("name", "geometry")))
    assert(keep.df.columns.toSet == Set("name", "geometry", "bbox"))

    val drop = Extract(spark, s"$cases/example-v1.1.0.parquet",
      Extract.Options(dropCols = Seq("pop_est", "iso_a3")))
    assert(drop.df.columns.toSet ==
      Set("continent", "name", "gdp_md_est", "geometry", "bbox"))

    intercept[IllegalArgumentException] {
      Extract(spark, s"$cases/example-v1.1.0.parquet",
        Extract.Options(keepOnlyCols = Seq("name")))
    }
    intercept[IllegalArgumentException] {
      Extract(spark, s"$cases/example-v1.1.0.parquet",
        Extract.Options(dropCols = Seq("geometry")))
    }
    intercept[IllegalArgumentException] {
      Extract(spark, s"$cases/example-v1.1.0.parquet",
        Extract.Options(dropCols = Seq("a"), keepOnlyCols = Seq("b")))
    }
  }

  test("keep-only retains the covering bbox column under its custom name") {
    val keep = Extract(spark, s"$cases/example-v1.1.0-covering.parquet",
      Extract.Options(keepOnlyCols = Seq("name", "geometry")))
    assert(keep.df.columns.toSet == Set("name", "geometry", "geometry_bbox"))
    // and the bbox path still filters through it
    val tz = Extract(spark, s"$cases/example-v1.1.0-covering.parquet",
      Extract.Options(keepOnlyCols = Seq("name", "geometry"), bbox = Some(tanzania)))
    val rows = tz.df.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
  }

  test("extract run writes through the input metadata") {
    val out = Files.createTempDirectory("extract").toString + "/out"
    Extract.run(spark, s"$cases/example-v1.1.0.parquet", out,
      Extract.Options(bbox = Some(tanzania)))
    val meta = FooterIO.readGeoMetadata(out).get
    assert(meta.version.contains("1.1.0"))
    assert(meta.primaryColumn == "geometry")
    val back = spark.read.parquet(out).collect()
    assert(back.length == 1 && back.head.getAs[String]("name") == "Tanzania")
  }

  test("geoparquet write computes stats metadata") {
    val out = Files.createTempDirectory("gpqwrite").toString + "/out"
    val src = GeoParquet.read(spark, s"$cases/example-v1.1.0.parquet")
    val meta = GeoParquet.write(src.df.drop("bbox"), out, meta = src.meta)
    val geom = meta.primary.get
    assert(geom.geometryTypes.get.toSet == Set("Polygon", "MultiPolygon"))
    val b = geom.bounds.get
    assert(b.length == 4 && b(0) == -180.0 && b(2) == 180.0)
    // written metadata is readable from the files
    val again = FooterIO.readGeoMetadata(out).get
    assert(again.primary.get.bounds.get == b)
  }

  test("extract reads geo metadata through a file:// Hadoop FS URI") {
    val uri = "file://" + new java.io.File(s"$cases/example-v1.1.0.parquet").getAbsolutePath
    val gf = Extract(spark, uri, Extract.Options(bbox = Some(tanzania)))
    assert(gf.meta.isDefined && gf.meta.get.primaryColumn == "geometry")
    val rows = gf.df.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
  }
}

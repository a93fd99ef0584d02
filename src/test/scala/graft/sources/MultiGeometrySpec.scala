package graft.sources

import graft.SparkSpec
import graft.functions.GeoFunctions
import graft.meta.{FooterIO, GeoMetadata}
import graft.operators.Validate
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multiple geometry columns per dataset (the reference's metadata model
  * is a map of columns; SURVEY §2.1 S9: non-primary geometry columns land
  * in GeoJSON properties).
  */
class MultiGeometrySpec extends SparkSpec {

  private def twoGeomMeta: GeoMetadata = GeoMetadata.parse(
    """{"version":"1.0.0","primary_column":"geometry","columns":{
      |"geometry":{"encoding":"WKB","geometry_types":[]},
      |"centroid":{"encoding":"WKB","geometry_types":[]}}}""".stripMargin)

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POINT (2 2)"),
      (2L, "POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))", "POINT (12 12)"))
      .toDF("id", "wkt", "cwkt")
      .select(col("id"),
        GeoFunctions.wkt_to_wkb(col("wkt")).as("geometry"),
        GeoFunctions.wkt_to_wkb(col("cwkt")).as("centroid"))
  }

  test("write computes stats for every geometry column; validate passes") {
    val out = Files.createTempDirectory("multigeom").toString + "/out"
    val meta = GeoParquet.write(df, out, meta = Some(twoGeomMeta))
    assert(meta.column("geometry").get.bounds.get == Seq(0.0, 0.0, 14.0, 14.0))
    assert(meta.column("centroid").get.bounds.get == Seq(2.0, 2.0, 12.0, 12.0))
    assert(meta.column("centroid").get.geometryTypes.get == Seq("Point"))
    val report = Validate.report(spark, out)
    assert(!report.failed, report.toJson)
  }

  test("multi-geometry data rules run in ONE scan") {
    val out = Files.createTempDirectory("multigeom4").toString + "/out"
    GeoParquet.write(df, out, meta = Some(twoGeomMeta))
    val read = spark.read.parquet(out)
    val frame = Validate.dataRulesFrame(read, twoGeomMeta, Seq("geometry", "centroid"))
    // both columns' rule slots come from a single pass over the file
    // (string count: AdaptiveSparkPlanExec hides its physical tree from
    // TreeNode.collect until execution)
    val plan = frame.queryExecution.executedPlan.toString
    val scans = "FileScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
    // and the aggregate is all-null on a valid file (8 slots, 2 cols x 4 rules)
    val row = frame.head()
    assert(row.length == 8 && (0 until 8).forall(row.isNullAt))
  }

  test("geojson sink puts the secondary geometry into properties") {
    val out = Files.createTempDirectory("multigeom2").toString + "/out"
    GeoParquet.write(df, out, meta = Some(twoGeomMeta))
    val gf = GeoParquet.read(spark, out)
    val file = Files.createTempDirectory("multigeom3").toString + "/out.geojson"
    GeoJson.writeFeatureCollection(gf.df, file, gf.meta)
    val it = new FeatureIterator(new java.io.BufferedReader(new java.io.FileReader(file)))
    val features = try it.toList finally it.close()
    assert(features.length == 2)
    val f = features.find(_.properties.get("id").asDouble() == 1.0).get
    assert(f.geometry.getGeometryType == "Polygon")
    val centroidNode = f.properties.get("centroid")
    assert(centroidNode != null && centroidNode.get("type").asText() == "Point")
    val c = graft.geo.GeoJsonCodec.fromNode(centroidNode)
    assert(c.equalsExact(graft.geo.GeoCodec.decodeWkt("POINT (2 2)")))
  }
}

package graft.operators

import graft.SparkSpec
import graft.geo.GeoCodec
import graft.meta.FooterIO
import graft.sources.{GeoJson, GeoParquet}
import java.nio.file.Files

/** Ports convert-path cases (cmd/gpq/command/convert_test.go,
  * internal/geoparquet/geoparquet_test.go WKT/WKB cases).
  */
class ConvertSpec extends SparkSpec {

  val gj = "src/test/resources/geojson"
  val cases = "src/test/resources/cases"

  test("format detection by extension") {
    import Convert._
    assert(detectFormat("a.gpq").contains(GeoParquetFormat))
    assert(detectFormat("a.geoparquet").contains(GeoParquetFormat))
    assert(detectFormat("a.parquet").contains(ParquetFormat))
    assert(detectFormat("a.pq").contains(ParquetFormat))
    assert(detectFormat("a.geojson").contains(GeoJsonFormat))
    assert(detectFormat("a.ndjson").contains(GeoJsonFormat))
    assert(detectFormat("a.bin").isEmpty)
  }

  test("geojson -> geoparquet embeds stats metadata") {
    val out = Files.createTempDirectory("cv").toString + "/example.parquet"
    Convert.run(spark, s"$gj/example.geojson", out)
    val meta = FooterIO.readGeoMetadata(out).get
    assert(meta.version.contains("1.0.0"))
    val geomCol = meta.primary.get
    assert(geomCol.encoding == "WKB")
    assert(geomCol.geometryTypes.get.toSet == Set("Polygon", "MultiPolygon"))
    val b = geomCol.bounds.get
    assert(b(0) == -180.0 && b(2) == 180.0)
    val df = spark.read.parquet(out)
    assert(df.count() == 5)
    assert(df.columns.toSeq ==
      Seq("continent", "gdp_md_est", "iso_a3", "name", "pop_est", "geometry"))
  }

  test("geoparquet -> geojson -> geoparquet round-trip preserves data") {
    val dir = Files.createTempDirectory("cv2").toString
    Convert.run(spark, s"$cases/example-v1.0.0.parquet", s"$dir/out.geojson")
    Convert.run(spark, s"$dir/out.geojson", s"$dir/back.parquet")
    val orig = spark.read.parquet(s"$cases/example-v1.0.0.parquet")
      .selectExpr("name", "pop_est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val back = spark.read.parquet(s"$dir/back.parquet")
      .selectExpr("name", "pop_est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(back == orig)
  }

  test("parquet with WKT string geometry transcodes to WKB") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cv3").toString
    val src = Seq(
      ("a", "POINT (1 2)"),
      ("b", "LINESTRING (0 0, 3 4)")).toDF("name", "geometry")
    src.write.parquet(s"$dir/wkt.parquet")
    Convert.run(spark, s"$dir/wkt.parquet", s"$dir/wkb.parquet")
    val out = spark.read.parquet(s"$dir/wkb.parquet")
    assert(out.schema("geometry").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val geoms = out.collect().map(r =>
      r.getAs[String]("name") -> GeoCodec.decodeWkb(r.getAs[Array[Byte]]("geometry")))
    assert(geoms.toMap.apply("a").equalsExact(GeoCodec.decodeWkt("POINT (1 2)")))
    val meta = FooterIO.readGeoMetadata(s"$dir/wkb.parquet").get
    assert(meta.primary.get.geometryTypes.get.toSet == Set("Point", "LineString"))
    assert(meta.primary.get.bounds.get == Seq(0.0, 0.0, 3.0, 4.0))
  }

  test("missing geometry column errors with guidance") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cv4").toString
    Seq((1, "x")).toDF("id", "label").write.parquet(s"$dir/plain.parquet")
    val e = intercept[IllegalArgumentException] {
      Convert.run(spark, s"$dir/plain.parquet", s"$dir/out.parquet")
    }
    assert(e.getMessage.contains("input-primary-column"))
  }

  test("input primary column override") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cv5").toString
    Seq(("a", "POINT (5 6)")).toDF("name", "geom_wkt")
      .write.parquet(s"$dir/alt.parquet")
    Convert.run(spark, s"$dir/alt.parquet", s"$dir/out.parquet",
      Convert.Options(inputPrimaryColumn = Some("geom_wkt")))
    val meta = FooterIO.readGeoMetadata(s"$dir/out.parquet").get
    assert(meta.primaryColumn == "geom_wkt")
    assert(meta.primary.get.bounds.get == Seq(5.0, 6.0, 5.0, 6.0))
  }

  test("geojson to geojson is rejected") {
    intercept[IllegalArgumentException] {
      Convert.run(spark, s"$gj/example.geojson", "/tmp/never.geojson")
    }
  }
}

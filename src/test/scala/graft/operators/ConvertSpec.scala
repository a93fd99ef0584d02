package graft.operators

import graft.SparkSpec
import graft.geo.GeoCodec
import graft.meta.FooterIO
import graft.sources.{GeoJson, GeoParquet}
import java.nio.file.Files
import scala.jdk.CollectionConverters._

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

  test("parquet -> geojson matches the reference golden example.geojson") {
    // reference asserts convert(example parquet) == example.geojson
    // (internal/geojson/geojson_test.go:41-106); compare semantically
    import graft.sources.{FeatureIterator, RawFeature}
    val dir = Files.createTempDirectory("golden").toString
    Convert.run(spark, s"$cases/example-v1.0.0.parquet", s"$dir/out.geojson")
    def load(p: String): Map[String, RawFeature] = {
      val it = new FeatureIterator(new java.io.BufferedReader(new java.io.FileReader(p)))
      try it.toList.map(f => f.properties.get("name").asText() -> f).toMap
      finally it.close()
    }
    val got = load(s"$dir/out.geojson")
    val exp = load(s"$gj/example.geojson")
    assert(got.keySet == exp.keySet)
    exp.foreach { case (name, e) =>
      val g = got(name)
      assert(g.geometry.equalsExact(e.geometry), s"$name geometry differs")
      assert(g.properties.get("pop_est").asDouble() == e.properties.get("pop_est").asDouble())
      assert(g.properties.get("gdp_md_est").asDouble() == e.properties.get("gdp_md_est").asDouble())
      assert(g.properties.get("continent").asText() == e.properties.get("continent").asText())
      assert(g.properties.get("iso_a3").asText() == e.properties.get("iso_a3").asText())
    }
  }

  test("row-group length option produces EXACT row-group counts") {
    // the reference's matrix (geojson_test.go:108-142): 10 features with
    // RowGroupLength 3 → 4 groups, RowGroupLength 5 → 2 groups
    import spark.implicits._
    val dir = Files.createTempDirectory("rgl").toString
    val df = (0 until 10).map(i => (i.toLong, s"row $i")).toDF("id", "payload")
    def groupsWith(n: Int, out: String): Seq[Int] = {
      graft.sources.GeoParquet.write(df.coalesce(1), out,
        computeStats = false, rowGroupRows = Some(n))
      graft.meta.FooterIO.dataFiles(out)
        .map(f => graft.meta.FooterIO.readFooter(f).getBlocks.size().toInt)
    }
    assert(groupsWith(3, s"$dir/a.parquet").sum == 4)
    assert(groupsWith(5, s"$dir/b.parquet").sum == 2)
    // group row counts are exact, not approximate
    val sizes = graft.meta.FooterIO.dataFiles(s"$dir/a.parquet")
      .flatMap(f => graft.meta.FooterIO.readFooter(f).getBlocks.asScala.map(_.getRowCount))
    assert(sizes == Seq(3L, 3L, 3L, 1L), s"got $sizes")
  }

  test("geo functions are SQL-registered") {
    graft.functions.GeoFunctions.register(spark)
    val wkt = spark.sql("SELECT wkb_to_wkt(wkt_to_wkb('POINT (1 2)')) AS w")
      .head.getString(0)
    assert(graft.geo.GeoCodec.decodeWkt(wkt)
      .equalsExact(graft.geo.GeoCodec.decodeWkt("POINT (1 2)")))
    assert(spark.sql("SELECT st_geometry_type(wkt_to_wkb('POINT (1 2)')) t")
      .head.getString(0) == "Point")
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

package graft.meta

import graft.SparkSpec
import java.nio.file.Files

class FooterIOSpec extends SparkSpec {

  val cases = "src/test/resources/cases"

  test("reads geo metadata from the v1.1.0 example") {
    val meta = FooterIO.readGeoMetadata(s"$cases/example-v1.1.0.parquet").get
    assert(meta.version.contains("1.1.0"))
    assert(meta.primaryColumn == "geometry")
    val geom = meta.primary.get
    assert(geom.encoding == "WKB")
    assert(geom.geometryTypes.get.toSet == Set("Polygon", "MultiPolygon"))
    assert(geom.bounds.get.length == 4)
    assert(geom.bounds.get.head == -180.0)
  }

  test("legacy v0.4.0 geometry_type key is surfaced") {
    val meta = FooterIO.readGeoMetadata(s"$cases/example-v0.4.0.parquet").get
    assert(meta.version.contains("0.4.0"))
    val geom = meta.primary.get
    assert(geom.geometryTypes.isDefined)
    assert(geom.geometryTypes.get.nonEmpty)
  }

  test("covering metadata resolves paths on the covering example") {
    val meta = FooterIO.readGeoMetadata(s"$cases/example-v1.1.0-covering.parquet").get
    val cov = meta.primary.get.covering.get
    assert(cov.xmin.length == 2)
    assert(cov.xmin(1) == "xmin")
  }

  test("plain parquet has no geo metadata") {
    assert(FooterIO.readGeoMetadata(s"$sf/lineitem.parquet").isEmpty)
  }

  test("footer rewrite injects geo metadata and keeps the file readable") {
    val dir = Files.createTempDirectory("footer").toString + "/out"
    spark.read.parquet(s"$sf/region.parquet").write.parquet(dir)
    assert(FooterIO.readGeoMetadata(dir).isEmpty)
    val meta = GeoMetadata.default("geometry")
    FooterIO.writeGeoMetadata(dir, meta)
    // still readable by Spark, same contents
    val back = spark.read.parquet(dir)
    assert(back.count() == 5)
    assert(back.columns.toSet == Set("r_regionkey", "r_name"))
    // metadata round-trips
    val got = FooterIO.readGeoMetadata(dir).get
    assert(got.version.contains(GeoMetadata.Version))
    assert(got.primaryColumn == "geometry")
    assert(got.primary.get.encoding == "WKB")
    // and a second rewrite replaces rather than duplicates
    FooterIO.writeGeoMetadata(dir, GeoMetadata.default("geom2"))
    assert(FooterIO.readGeoMetadata(dir).get.primaryColumn == "geom2")
  }

  test("footer rewrite through a file:// Hadoop FS URI round-trips") {
    // exercises the Hadoop FileSystem code path end-to-end: list, read
    // footer, rewrite, re-read — all through the scheme-resolved FS
    val dir = "file://" + Files.createTempDirectory("footerfs").toString + "/out"
    spark.read.parquet(s"$sf/region.parquet").write.parquet(dir)
    assert(FooterIO.readGeoMetadata(dir).isEmpty)
    FooterIO.writeGeoMetadata(dir, GeoMetadata.default("geometry"))
    assert(FooterIO.readGeoMetadata(dir).get.primaryColumn == "geometry")
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("rewrite-by-copy path (object-store strategy) produces a valid file") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("footercopy").toString + "/out"
    spark.read.parquet(s"$sf/region.parquet").write.parquet(dir)
    val p = FooterIO.dataFiles(dir).head
    val fs = p.getFileSystem(new Configuration())
    val entries = Map(GeoMetadata.MetadataKey -> GeoMetadata.default("geometry").json)
    val footerBytes = FooterIO.footerWithEntries(FooterIO.readFooter(p), entries)
    // drive the copy strategy directly (what s3a/gs/abfs paths take)
    FooterIO.appendByCopy(fs, p, footerBytes)
    // no temp residue, metadata present, file still readable by Spark
    assert(!fs.exists(new Path(p.getParent, s".${p.getName}.graft.tmp")))
    assert(FooterIO.readGeoMetadata(dir).get.primaryColumn == "geometry")
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("unreadable scheme degrades to no metadata, not a failure") {
    assert(FooterIO.readGeoMetadata("https://example.invalid/x.parquet").isEmpty)
  }

  test("session hadoop settings reach metadata IO confs") {
    // spark.hadoop.* (e.g. s3a credentials) must flow into footer
    // reads/rewrites; a bare new Configuration() would drop them
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "42")
    try {
      assert(FooterIO.hadoopConf(Some(spark)).get("graft.test.marker") == "42")
      // and via the active session when no session is passed explicitly
      assert(FooterIO.hadoopConf(None).get("graft.test.marker") == "42")
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.marker")
  }

  test("crs display string") {
    val m = GeoMetadata.parse(
      """{"version":"1.0.0","primary_column":"geometry","columns":{"geometry":{
        |"encoding":"WKB","geometry_types":[],
        |"crs":{"name":"WGS 84 (CRS84)","id":{"authority":"OGC","code":"CRS84"}}}}}""".stripMargin)
    assert(m.primary.get.crsString == "WGS 84 (CRS84)")
    val m2 = GeoMetadata.parse(
      """{"columns":{"geometry":{"crs":{"id":{"authority":"EPSG","code":4326}}}}}""")
    assert(m2.primary.get.crsString == "EPSG:4326")
    val m3 = GeoMetadata.parse("""{"columns":{"geometry":{}}}""")
    assert(m3.primary.get.crsString == "Unknown")
  }
}

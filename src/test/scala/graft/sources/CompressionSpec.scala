package graft.sources

import graft.SparkSpec
import graft.meta.FooterIO
import java.nio.file.Files

/** All six codecs from the reference's compression matrix round-trip
  * (internal/pqutil/compression.go:9-26; geojson_test.go:688-768).
  */
class CompressionSpec extends SparkSpec {

  val codecs = Seq("uncompressed", "snappy", "gzip", "zstd", "lz4")

  test("geoparquet write round-trips under every codec") {
    val src = GeoParquet.read(spark, "src/test/resources/cases/example-v1.1.0.parquet")
    codecs.foreach { codec =>
      val out = Files.createTempDirectory(s"codec-$codec").toString + "/out"
      GeoParquet.write(src.df, out, meta = src.meta, compression = codec)
      val back = spark.read.parquet(out)
      assert(back.count() == 5, s"codec $codec lost rows")
      assert(FooterIO.readGeoMetadata(out).isDefined, s"codec $codec lost metadata")
      // the footer records the requested codec for data columns
      val footer = FooterIO.readFooter(FooterIO.dataFiles(out).head)
      val codecName = footer.getBlocks.get(0).getColumns.get(0).getCodec.name().toLowerCase
      val expected = if (codec == "uncompressed") "uncompressed" else codec
      assert(codecName == expected, s"expected $expected got $codecName")
    }
  }

  test("convert with compression=None retains the input's per-column codecs") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("retain").toString
    // gzip input (≠ the zstd default, so retention is observable)
    val src = GeoParquet.read(spark, "src/test/resources/cases/example-v1.1.0.parquet")
    GeoParquet.write(src.df, s"$dir/in.parquet", meta = src.meta, compression = "gzip")
    graft.operators.Convert.run(spark, s"$dir/in.parquet", s"$dir/out.parquet",
      graft.operators.Convert.Options(compression = None))
    // every column chunk keeps gzip (verbatim copy), metadata restamped
    val footer = FooterIO.readFooter(FooterIO.dataFiles(s"$dir/out.parquet").head)
    val outCodecs = footer.getBlocks.asScala
      .flatMap(_.getColumns.asScala.map(_.getCodec.name())).toSet
    assert(outCodecs == Set("GZIP"), s"expected gzip retained, got $outCodecs")
    val meta = FooterIO.readGeoMetadata(s"$dir/out.parquet")
    assert(meta.isDefined && meta.get.primaryColumn == "geometry")
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 5)
  }

  test("retention falls back to rewrite for partitioned inputs (no flat copy)") {
    val dir = Files.createTempDirectory("retainpart").toString
    val src = GeoParquet.read(spark, "src/test/resources/cases/example-v1.1.0.parquet")
    // a partitioned tree: values live in directory names — a verbatim
    // flat copy would lose them
    GeoParquet.writePartitioned(src.df, s"$dir/in.parquet", cellDeg = 60.0)
    graft.operators.Convert.run(spark, s"$dir/in.parquet", s"$dir/out.parquet",
      graft.operators.Convert.Options(compression = None))
    val back = spark.read.parquet(s"$dir/out.parquet")
    assert(back.count() == 5)
    // partition-column values survived (via the rewrite path)
    assert(back.columns.contains("cell_x"))
    assert(back.select("cell_x").distinct().count() > 1)
  }

  test("convert with an explicit codec recompresses") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("recompress").toString
    val src = GeoParquet.read(spark, "src/test/resources/cases/example-v1.1.0.parquet")
    GeoParquet.write(src.df, s"$dir/in.parquet", meta = src.meta, compression = "gzip")
    graft.operators.Convert.run(spark, s"$dir/in.parquet", s"$dir/out.parquet",
      graft.operators.Convert.Options(compression = Some("snappy")))
    val footer = FooterIO.readFooter(FooterIO.dataFiles(s"$dir/out.parquet").head)
    val outCodecs = footer.getBlocks.asScala
      .flatMap(_.getColumns.asScala.map(_.getCodec.name())).toSet
    assert(outCodecs == Set("SNAPPY"), s"expected snappy, got $outCodecs")
  }

  test("brotli is rejected by spark (documented deviation)") {
    // the reference supports brotli (compression.go:9-26); Spark ships no
    // brotli codec by default — the write must fail loudly, not silently
    val src = GeoParquet.read(spark, "src/test/resources/cases/example-v1.1.0.parquet")
    val out = Files.createTempDirectory("codec-brotli").toString + "/out"
    intercept[Exception] {
      GeoParquet.write(src.df, out, meta = src.meta, compression = "brotli")
    }
  }
}

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

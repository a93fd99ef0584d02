package graft.sources

import graft.SparkSpec
import graft.meta.FooterIO
import org.apache.spark.sql.functions.col
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

  test("WKT transform keeps each column's own codec (chunk-level rewrite)") {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("chunktranscode").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    // deterministic single-partition frame: two writes produce identical
    // row order, so chunks can be mixed across the two files
    val df = Seq(
      (1L, "alpha", "POINT (1 2)"),
      (2L, "beta", null.asInstanceOf[String]),
      (3L, "gamma", "LINESTRING (0 0, 10 10)"))
      .toDF("id", "name", "geometry").coalesce(1).sortWithinPartitions("id")
    df.write.option("compression", "gzip").parquet(s"$dir/a.parquet")
    df.write.option("compression", "zstd").parquet(s"$dir/b.parquet")
    def onlyFile(p: String): Path = graft.meta.FooterIO.dataFiles(p).head
    val (fa, fb) = (onlyFile(s"$dir/a.parquet"), onlyFile(s"$dir/b.parquet"))
    // assemble the mixed-codec input: id+name chunks from the gzip file,
    // the WKT geometry chunk from the zstd file
    val ra = ParquetFileReader.open(HadoopInputFile.fromPath(fa, conf))
    val rb = ParquetFileReader.open(HadoopInputFile.fromPath(fb, conf))
    val mixed = new Path(s"$dir/mixed.parquet")
    try {
      val schema = ra.getFooter.getFileMetaData.getSchema
      val w = new ParquetFileWriter(HadoopOutputFile.fromPath(mixed, conf),
        schema, ParquetFileWriter.Mode.OVERWRITE, 128L * 1024 * 1024, 8 * 1024 * 1024)
      w.start()
      val (ba, bb) = (ra.getFooter.getBlocks.get(0), rb.getFooter.getBlocks.get(0))
      assert(ba.getRowCount == bb.getRowCount)
      w.startBlock(ba.getRowCount)
      val sa = HadoopInputFile.fromPath(fa, conf).newStream()
      val sb = HadoopInputFile.fromPath(fb, conf).newStream()
      try {
        schema.getFields.asScala.foreach { f =>
          val (r, st, blk) =
            if (f.getName == "geometry") (rb, sb, bb) else (ra, sa, ba)
          val chunk = blk.getColumns.asScala
            .find(_.getPath.toDotString == f.getName).get
          w.appendColumnChunk(schema.getColumnDescription(chunk.getPath.toArray),
            st, chunk, r.readBloomFilter(chunk), r.readColumnIndex(chunk),
            r.readOffsetIndex(chunk))
        }
      } finally { sa.close(); sb.close() }
      w.endBlock()
      w.end(ra.getFooter.getFileMetaData.getKeyValueMetaData)
    } finally { ra.close(); rb.close() }
    val inCodecs = ChunkRewriter.columnCodecs(mixed, conf).map {
      case (k, v) => k -> v.name()
    }
    assert(inCodecs == Map("id" -> "GZIP", "name" -> "GZIP", "geometry" -> "ZSTD"), inCodecs)

    // convert with codec retention: geometry WKT->WKB
    graft.operators.Convert.run(spark, s"$dir/mixed.parquet", s"$dir/out.parquet",
      graft.operators.Convert.Options(compression = None,
        from = Some(graft.operators.Convert.ParquetFormat)))
    val outFile = onlyFile(s"$dir/out.parquet")
    val outCodecs = ChunkRewriter.columnCodecs(outFile, conf).map {
      case (k, v) => k -> v.name()
    }
    assert(outCodecs == Map("id" -> "GZIP", "name" -> "GZIP", "geometry" -> "ZSTD"),
      s"per-column codecs not retained through the transform: $outCodecs")

    // untouched chunks are byte-verbatim: identical compressed size
    val rm = ParquetFileReader.open(HadoopInputFile.fromPath(mixed, conf))
    val ro = ParquetFileReader.open(HadoopInputFile.fromPath(outFile, conf))
    try {
      def sizes(r: ParquetFileReader) = r.getFooter.getBlocks.get(0).getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getTotalSize).toMap
      val (sm, so) = (sizes(rm), sizes(ro))
      assert(sm("id") == so("id") && sm("name") == so("name"),
        s"property chunks were re-encoded: $sm vs $so")
    } finally { rm.close(); ro.close() }

    // values survived: WKB decodes, null stays null, properties intact
    val back = spark.read.parquet(s"$dir/out.parquet")
      .select(col("id"), col("name"),
        graft.functions.GeoFunctions.st_geometry_type(col("geometry")).as("t"))
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getAs[String]("t"))).toSeq ==
      Seq((1L, "alpha", "Point"), (2L, "beta", null), (3L, "gamma", "LineString")))
    // and the geo metadata was stamped with recomputed WKB stats
    val meta = graft.meta.FooterIO.readGeoMetadata(s"$dir/out.parquet")
    assert(meta.isDefined &&
      meta.get.column("geometry").get.bounds.get == Seq(0.0, 0.0, 10.0, 10.0))
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

package graft.operators

import graft.functions.GeoFunctions
import graft.meta.{FooterIO, GeoMetadata}
import graft.sources.{GeoJson, GeoParquet}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** `gpq convert` (SURVEY.md §3.1, cmd/gpq/command/convert.go): GeoJSON ⇄
  * GeoParquet ⇄ Parquet with format auto-detection by extension
  * (convert.go:68-101) and WKT→WKB geometry transcoding for string-typed
  * geometry columns (internal/geoparquet/geoparquet.go:65-156).
  */
object Convert {

  sealed trait Format
  case object GeoParquetFormat extends Format
  case object ParquetFormat extends Format
  case object GeoJsonFormat extends Format

  /** Extension-based format detection (convert.go:68-101). */
  def detectFormat(path: String): Option[Format] = {
    val base = path.toLowerCase.stripSuffix("/")
    if (base.endsWith(".gpq") || base.endsWith(".geoparquet")) Some(GeoParquetFormat)
    else if (base.endsWith(".pq") || base.endsWith(".parquet")) Some(ParquetFormat)
    else if (base.endsWith(".geojson") || base.endsWith(".json") ||
             base.endsWith(".ndjson") || base.endsWith(".ndgeojson") ||
             base.endsWith(".geojsonl")) Some(GeoJsonFormat)
    else None
  }

  /** @param compression Some(codec) to recompress; None retains the
    *                     input's per-column codecs (reference
    *                     transform.go:36-52 — its CLI always passes a
    *                     codec, default zstd; retention is the
    *                     programmatic-path behavior)
    */
  final case class Options(
      from: Option[Format] = None,
      to: Option[Format] = None,
      inputPrimaryColumn: Option[String] = None,
      compression: Option[String] = Some("zstd"),
      minFeatures: Int = 10,
      maxFeatures: Int = 100,
      rowGroupRows: Option[Int] = None,
      covering: Boolean = false)

  def run(spark: SparkSession, in: String, out: String,
          opts: Options = Options()): Unit = {
    val from = opts.from.orElse(detectFormat(in)).getOrElse(
      throw new IllegalArgumentException(s"could not determine input format for $in"))
    val to = opts.to.orElse(detectFormat(out)).getOrElse(
      throw new IllegalArgumentException(s"could not determine output format for $out"))

    (from, to) match {
      case (GeoJsonFormat, ParquetFormat) | (GeoJsonFormat, GeoParquetFormat) =>
        val df = GeoJson.read(spark, in, opts.minFeatures, opts.maxFeatures)
        // no input codecs to retain for JSON input: None falls back to the
        // reference's default write codec (zstd, convert.go:36)
        GeoParquet.write(df, out, compression = opts.compression.getOrElse("zstd"),
          rowGroupRows = opts.rowGroupRows, covering = opts.covering)
      case (GeoJsonFormat, GeoJsonFormat) =>
        throw new IllegalArgumentException(
          "GeoJSON input can only be converted to GeoParquet")
      case (_, GeoJsonFormat) =>
        val gf = GeoParquet.read(spark, in)
        if (GeoJson.isNdPath(out)) GeoJson.writeNdjson(gf.df, out, gf.meta)
        else GeoJson.writeFeatureCollection(gf.df, out, gf.meta)
      case (_, ParquetFormat) | (_, GeoParquetFormat) =>
        parquetToGeoParquet(spark, in, out, opts)
    }
  }

  /** Parquet/GeoParquet → GeoParquet: establish metadata (footer geo JSON or
    * defaults with the input primary column, geoparquet.go:29-48), require
    * every metadata geometry column to exist, transcode string (WKT)
    * geometry columns to WKB binary, recompute stats, stamp metadata.
    */
  def parquetToGeoParquet(spark: SparkSession, in: String, out: String,
                          opts: Options): Unit = {
    val df = spark.read.parquet(in)
    val primaryOpt = opts.inputPrimaryColumn
    val meta0 = FooterIO.readGeoMetadata(in).getOrElse(
      GeoMetadata.default(primaryOpt.getOrElse(GeoMetadata.DefaultGeometryColumn)))
    val meta =
      primaryOpt.filter(_ != meta0.primaryColumn) match {
        case Some(p) =>
          val root = meta0.raw.deepCopy()
          root.put("primary_column", p)
          new GeoMetadata(root)
        case None => meta0
      }

    meta.columnNames.foreach { name =>
      require(df.columns.contains(name),
        s"""expected a geometry column named "$name", use the --input-primary-column to supply a different primary geometry""")
    }

    val stringCols = meta.columnNames.filter { name =>
      df.schema(name).dataType == StringType
    }.toSet

    // compression = None → retain the input's per-column codecs (reference
    // transform.go:36-52). When no column values change and no re-grouping
    // is requested, the data pages are copied VERBATIM (exact per-column
    // retention — stronger than the reference's row-group-0 sampling) and
    // only the footer is restamped. When a WKT→WKB transform is needed,
    // ChunkRewriter re-encodes ONLY the geometry chunks (each with its own
    // original codec) and appends every other column chunk verbatim.
    if (opts.compression.isEmpty && opts.rowGroupRows.isEmpty &&
        !(opts.covering && !df.columns.contains("bbox")) && isFlat(in)) {
      if (stringCols.isEmpty) copyDataFiles(in, out)
      else transcodeDataFiles(in, out, stringCols)
      // stats read the OUTPUT (post-transcode geometry is WKB)
      val outDf = spark.read.parquet(out)
      val geomCols = meta.columnNames.filter(outDf.columns.contains)
      val stamped =
        if (geomCols.nonEmpty) meta.withStats(GeoParquet.geometryStats(outDf, geomCols))
        else meta
      FooterIO.writeGeoMetadata(out, stamped, Some(spark))
      return
    }

    val transformed =
      if (stringCols.isEmpty) df
      else df.columns.foldLeft(df) { (acc, c) =>
        if (stringCols.contains(c))
          acc.withColumn(c, GeoFunctions.wkt_to_wkb(col(c)))
        else acc
      }
    val codec = opts.compression.getOrElse(dominantCodec(in))
    GeoParquet.write(transformed, out, meta = Some(meta),
      compression = codec, rowGroupRows = opts.rowGroupRows,
      covering = opts.covering)
  }

  /** Verbatim copy is only sound for a single file or a flat directory of
    * parts: partitioned trees (`cell_x=…/part…`) carry values in directory
    * names that a flat copy would lose, so they take the rewrite path.
    */
  private def isFlat(in: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.hadoop.conf.Configuration()
    graft.sources.Remote.install(conf)
    val p = new Path(in)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    !st.isDirectory || fs.listStatus(p).forall { s =>
      !s.isDirectory || s.getPath.getName.startsWith(".") || s.getPath.getName.startsWith("_")
    }
  }

  /** Chunk-level WKT→WKB transcode of every data file into `out`: geometry
    * chunks re-encoded with their own codecs, everything else verbatim.
    */
  private def transcodeDataFiles(in: String, out: String, wktCols: Set[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.hadoop.conf.Configuration()
    graft.sources.Remote.install(conf)
    val outPath = new Path(out)
    val outFs = outPath.getFileSystem(conf)
    outFs.delete(outPath, true)
    outFs.mkdirs(outPath)
    FooterIO.dataFiles(in).foreach { src =>
      graft.sources.ChunkRewriter.transcodeFile(
        src, new Path(outPath, src.getName), wktCols, conf)
    }
  }

  /** Byte-copy every data file of a parquet path into `out`, preserving
    * relative names (single file → single part). Runs over Hadoop FS so
    * any scheme works.
    */
  private def copyDataFiles(in: String, out: String): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.hadoop.conf.Configuration()
    graft.sources.Remote.install(conf)
    val outPath = new Path(out)
    val outFs = outPath.getFileSystem(conf)
    outFs.delete(outPath, true)
    outFs.mkdirs(outPath)
    FooterIO.dataFiles(in).foreach { src =>
      val fs = src.getFileSystem(conf)
      val dst = new Path(outPath, src.getName)
      val is = fs.open(src)
      try {
        val os = outFs.create(dst, true)
        try is.transferTo(os) finally os.close()
      } finally is.close()
    }
  }

  /** The most common non-uncompressed codec of the input's first row
    * group (the reference samples row group 0 the same way,
    * transform.go:36-52), as a spark write-option name.
    */
  private def dominantCodec(in: String): String = {
    import scala.jdk.CollectionConverters._
    val files = FooterIO.dataFiles(in)
    val codecs = for {
      f <- files.headOption.toSeq
      block <- FooterIO.readFooter(f).getBlocks.asScala.headOption.toSeq
      chunk <- block.getColumns.asScala
      c = chunk.getCodec.name()
      if c != "UNCOMPRESSED"
    } yield c
    if (codecs.isEmpty) "uncompressed"
    else codecs.groupBy(identity).maxBy(_._2.size)._1.toLowerCase
  }
}

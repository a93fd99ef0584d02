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

  final case class Options(
      from: Option[Format] = None,
      to: Option[Format] = None,
      inputPrimaryColumn: Option[String] = None,
      compression: String = "zstd",
      minFeatures: Int = 10,
      maxFeatures: Int = 100,
      rowGroupRows: Option[Int] = None)

  def run(spark: SparkSession, in: String, out: String,
          opts: Options = Options()): Unit = {
    val from = opts.from.orElse(detectFormat(in)).getOrElse(
      throw new IllegalArgumentException(s"could not determine input format for $in"))
    val to = opts.to.orElse(detectFormat(out)).getOrElse(
      throw new IllegalArgumentException(s"could not determine output format for $out"))

    (from, to) match {
      case (GeoJsonFormat, ParquetFormat) | (GeoJsonFormat, GeoParquetFormat) =>
        val df = GeoJson.read(spark, in, opts.minFeatures, opts.maxFeatures)
        GeoParquet.write(df, out, compression = opts.compression,
          rowGroupRows = opts.rowGroupRows)
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
    val transformed =
      if (stringCols.isEmpty) df
      else df.columns.foldLeft(df) { (acc, c) =>
        if (stringCols.contains(c))
          acc.withColumn(c, GeoFunctions.wkt_to_wkb(col(c)))
        else acc
      }
    GeoParquet.write(transformed, out, meta = Some(meta),
      compression = opts.compression, rowGroupRows = opts.rowGroupRows)
  }
}

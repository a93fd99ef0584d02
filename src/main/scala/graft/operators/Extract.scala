package graft.operators

import graft.functions.GeoFunctions
import graft.geo.Bbox
import graft.meta.GeoMetadata
import graft.sources.GeoParquet
import graft.sources.GeoParquet.GeoFrame
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The reference's query path: `gpq extract` (SURVEY.md §3.2,
  * cmd/gpq/command/extract.go).
  *
  * Column keep/drop projection (P1/P2) with the primary-geometry retention
  * guard (P3) and keep-xor-drop guard (P4), plus the two bbox filter paths:
  *
  *  - bbox-column path (P5): the filter expands to plain comparisons on the
  *    bbox struct leaves, so Catalyst pushes them to parquet row-group
  *    stats — the Spark-native equivalent of the reference's concurrent
  *    row-group pruning (filter.go:115-212);
  *  - on-the-fly path (P6): no bbox column → decode the primary geometry
  *    per row and intersect envelopes, exactly like the reference's
  *    full-scan fallback (filter.go:271-296).
  */
object Extract {

  final case class Options(
      bbox: Option[Bbox] = None,
      dropCols: Seq[String] = Nil,
      keepOnlyCols: Seq[String] = Nil)

  def apply(spark: SparkSession, inPath: String, opts: Options): GeoFrame = {
    require(opts.dropCols.isEmpty || opts.keepOnlyCols.isEmpty,
      "--drop-cols and --keep-only-cols are mutually exclusive")
    val gf = GeoParquet.read(spark, inPath)
    val primary = gf.primaryColumn

    // projection with primary-geometry retention (recordreader.go:81-117)
    var df = gf.df
    if (opts.keepOnlyCols.nonEmpty) {
      require(opts.keepOnlyCols.contains(primary),
        s"projection must include the primary geometry column $primary")
      val keep = df.columns.filter(c =>
        opts.keepOnlyCols.contains(c) ||
        c == bboxColumnName(df, gf.meta).orNull)
      df = df.select(keep.map(col).toSeq: _*)
    } else if (opts.dropCols.nonEmpty) {
      require(!opts.dropCols.contains(primary),
        s"cannot drop the primary geometry column $primary")
      df = df.drop(opts.dropCols: _*)
    }

    opts.bbox.foreach { box =>
      // spatially-partitioned layouts prune whole cell directories first
      // (PartitionFilters), then the row-group/residual filter applies
      if (df.columns.contains("cell_z")) {
        val grid = GeoParquet.gridSize(inPath).getOrElse(10.0)
        df = df.where(GeoParquet.cellPredicateZ(box, grid))
      } else if (df.columns.contains("cell_x") && df.columns.contains("cell_y")) {
        val grid = GeoParquet.gridSize(inPath).getOrElse(10.0)
        df = df.where(GeoParquet.cellPredicate(box, grid))
      }
      df = filterByBbox(df, gf.meta, primary, box)
    }
    GeoFrame(df, gf.meta)
  }

  /** Locate the bbox covering column: a top-level field named "bbox", else
    * the column referenced by covering metadata (GetBboxColumn,
    * geoparquet.go:233-254); field names default to xmin/ymin/xmax/ymax or
    * come from the covering paths (geoparquet.go:200-218).
    */
  def bboxColumnName(df: DataFrame, meta: Option[GeoMetadata]): Option[String] =
    GeoParquet.coveringColumnName(df, meta)

  def bboxFieldNames(meta: Option[GeoMetadata]): (String, String, String, String) = {
    val cov = meta.flatMap(_.primary).flatMap(_.covering)
    cov match {
      case Some(c) if c.xmin.length == 2 =>
        (c.xmin(1), c.ymin(1), c.xmax(1), c.ymax(1))
      case _ => ("xmin", "ymin", "xmax", "ymax")
    }
  }

  def filterByBbox(df: DataFrame, meta: Option[GeoMetadata], primary: String,
                   box: Bbox): DataFrame =
    bboxColumnName(df, meta) match {
      case Some(bboxCol) =>
        val (xf, yf, xxf, yxf) = bboxFieldNames(meta)
        df.where(GeoFunctions.bbox_intersects_struct(col(bboxCol), box, xf, yf, xxf, yxf))
      case None =>
        val encoding = meta.flatMap(_.primary).map(_.encoding)
          .getOrElse(GeoMetadata.DefaultGeometryEncoding)
        val geomWkb =
          if (encoding == "WKT") GeoFunctions.wkt_to_wkb(col(primary))
          else col(primary)
        df.where(GeoFunctions.st_envelope_intersects(geomWkb, box))
    }

  /** extract → write-through with the input's metadata (extract.go:144-179). */
  def run(spark: SparkSession, inPath: String, outPath: String, opts: Options,
          compression: String = "zstd"): Unit = {
    val gf = apply(spark, inPath, opts)
    GeoParquet.write(gf.df, outPath, meta = gf.meta, computeStats = false,
      compression = compression)
  }
}

package graft.sources

import graft.functions.GeoFunctions
import graft.meta.{FooterIO, GeoMetadata}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** GeoParquet read/write on top of the stock parquet datasource
  * (SURVEY.md §2.1 S2/S7/S8, §7.4).
  *
  * Reads are plain `spark.read.parquet` — column pruning, filter pushdown
  * and row-group pruning come from Catalyst — plus a footer `geo` metadata
  * attach. Writes are `df.write.parquet` followed by a distributed-safe
  * footer rewrite stamping the `geo` entry (with dataset stats computed in
  * one aggregate pass) onto every part file.
  */
object GeoParquet {

  /** A DataFrame with its parsed `geo` footer metadata (None for plain
    * parquet inputs).
    */
  final case class GeoFrame(df: DataFrame, meta: Option[GeoMetadata]) {
    def primaryColumn: String =
      meta.map(_.primaryColumn).getOrElse(GeoMetadata.DefaultGeometryColumn)
  }

  def read(spark: SparkSession, path: String): GeoFrame = {
    // plain-http(s) inputs need the ranged-GET FileSystems on the session
    // conf before spark.read can open them
    if (path.startsWith("http://") || path.startsWith("https://"))
      Remote.install(spark.sparkContext.hadoopConfiguration)
    val meta = FooterIO.readGeoMetadata(path)
    val raw = spark.read.parquet(path)
    GeoFrame(tagCovering(spark, path, raw, meta), meta)
  }

  /** The covering bbox column for this frame: a top-level "bbox" field,
    * else the column the covering metadata names (reference GetBboxColumn,
    * geoparquet.go:233-254).
    */
  def coveringColumnName(df: DataFrame, meta: Option[GeoMetadata]): Option[String] = {
    if (df.columns.contains("bbox")) return Some("bbox")
    for {
      m <- meta
      p <- m.primary
      cov <- p.covering
      name <- cov.xmin.headOption
      if df.columns.contains(name)
    } yield name
  }

  /** Stamp the covering bbox column with attribute metadata naming the
    * geometry column it covers. The session-wide [[graft.plans.PushBboxFilter]]
    * rewrite only trusts columns carrying this tag — i.e. bbox columns that
    * came from a GeoParquet read context, mirroring the reference which
    * only consults bbox within a GeoParquet file (geoparquet.go:233-254) —
    * never an arbitrary plan that happens to have a column named "bbox".
    * Only standard xmin/ymin/xmax/ymax double leaves qualify (non-standard
    * covering field names go through Extract's explicit filter instead).
    *
    * The tag goes into the *read schema* (not a projection alias) so the
    * relation's own output attributes carry it — a filter pushed down to
    * sit directly above the scan still sees a tagged child, regardless of
    * where the optimizer places our rewrite relative to predicate pushdown.
    */
  private def tagCovering(spark: SparkSession, path: String, raw: DataFrame,
                          meta: Option[GeoMetadata]): DataFrame = {
    import org.apache.spark.sql.types.{MetadataBuilder, StructType}
    (for {
      m <- meta
      bboxCol <- coveringColumnName(raw, meta)
      if graft.plans.PushBboxFilter.isBboxStruct(raw.schema(bboxCol).dataType)
    } yield {
      val tagged = StructType(raw.schema.fields.map { f =>
        if (f.name == bboxCol)
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(graft.plans.PushBboxFilter.CoveringTag, m.primaryColumn)
            .build())
        else f
      })
      spark.read.schema(tagged).parquet(path)
    }).getOrElse(raw)
  }

  /** One-pass dataset statistics for the given WKB geometry columns:
    * bounds union + distinct GeoJSON type names (reference
    * featurewriter.go:250-307; geo.go:198-247). Types are sorted for
    * deterministic metadata. At scale this is a single partial-aggregated
    * reduce to one row — no shuffle of data rows.
    */
  def geometryStats(df: DataFrame, geomCols: Seq[String])
      : Map[String, (Seq[Double], Seq[String])] = {
    if (geomCols.isEmpty) return Map.empty
    val aggs: Seq[Column] = geomCols.flatMap { c =>
      val env = GeoFunctions.st_envelope(col(c))
      Seq(
        min(env.getField("xmin")).as(s"${c}__xmin"),
        min(env.getField("ymin")).as(s"${c}__ymin"),
        max(env.getField("xmax")).as(s"${c}__xmax"),
        max(env.getField("ymax")).as(s"${c}__ymax"),
        array_sort(collect_set(GeoFunctions.st_geometry_type(col(c)))).as(s"${c}__types"))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    geomCols.map { c =>
      val bounds =
        if (row.isNullAt(row.fieldIndex(s"${c}__xmin"))) Seq.empty[Double]
        else Seq(
          row.getDouble(row.fieldIndex(s"${c}__xmin")),
          row.getDouble(row.fieldIndex(s"${c}__ymin")),
          row.getDouble(row.fieldIndex(s"${c}__xmax")),
          row.getDouble(row.fieldIndex(s"${c}__ymax")))
      val types = row.getSeq[String](row.fieldIndex(s"${c}__types"))
      c -> (bounds, types)
    }.toMap
  }

  /** Write a GeoParquet dataset.
    *
    * @param meta base metadata; defaults to the spec default for
    *             `primaryColumn`. Computed stats overwrite its per-column
    *             bbox + geometry_types unless `computeStats` is false.
    * @param compression parquet codec (reference CLI default zstd,
    *                    convert.go:36)
    * @param rowGroupRows exact rows per row group within each part file,
    *                     via parquet-hadoop's `parquet.block.row.count.limit`
    *                     (the writer flushes a group every N rows, matching
    *                     the reference's chunked NextBatch(RowGroupLength),
    *                     transform.go:119-164; the byte-based
    *                     `parquet.block.size` remains as the safety cap)
    * @param covering materialize a GeoParquet 1.1 `bbox` struct column
    *                 from the primary geometry's envelope and declare it
    *                 as the covering (beyond-reference extension: sources
    *                 written this way get row-group pruning on every
    *                 downstream bbox extract, even when the input shipped
    *                 no bbox). No-op when a `bbox` column already exists.
    */
  def write(
      df: DataFrame,
      path: String,
      meta: Option[GeoMetadata] = None,
      primaryColumn: String = GeoMetadata.DefaultGeometryColumn,
      compression: String = "zstd",
      computeStats: Boolean = true,
      rowGroupRows: Option[Int] = None,
      covering: Boolean = false): GeoMetadata = {
    val base0 = meta.getOrElse(GeoMetadata.default(primaryColumn))
    val (df1, base) =
      if (covering && df.columns.contains(base0.primaryColumn) &&
          !df.columns.contains("bbox")) {
        val env = GeoFunctions.st_envelope(col(base0.primaryColumn))
        // null geometry → null bbox (query-time decode fallback handles it)
        val bboxCol = when(env.isNotNull, struct(
          env.getField("xmin").as("xmin"), env.getField("ymin").as("ymin"),
          env.getField("xmax").as("xmax"), env.getField("ymax").as("ymax")))
        (df.withColumn("bbox", bboxCol), base0.withCovering("bbox"))
      } else (df, base0)
    val geomCols = base.columnNames.filter(df1.columns.contains)
    val finalMeta =
      if (computeStats && geomCols.nonEmpty)
        base.withStats(geometryStats(df1, geomCols))
      else base

    var writer = df1.write.mode("overwrite").option("compression", compression)
    rowGroupRows.foreach { n =>
      writer = writer.option("parquet.block.row.count.limit", n.toString)
    }
    writer.parquet(path)
    FooterIO.writeGeoMetadata(path, finalMeta, Some(df.sparkSession))
    finalMeta
  }

  /** Spatially-partitioned layout for large datasets: rows land in
    * `cell_x=…/cell_y=…` directories keyed by the envelope centroid on a
    * `cellDeg`-degree grid. A bbox query then prunes whole directories
    * (Catalyst PartitionFilters) before row-group stats are even read —
    * the directory tier of pruning the single-file reference cannot have.
    * Null/empty geometries land in the (9999, 9999) cell so they are never
    * dropped by partition pruning.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      primaryColumn: String = GeoMetadata.DefaultGeometryColumn,
      cellDeg: Double = 10.0,
      meta: Option[GeoMetadata] = None,
      compression: String = "zstd",
      zOrder: Boolean = false): GeoMetadata = {
    if (zOrder) require(cellDeg * ZOffset >= 180.0,
      s"z-order layout supports cellDeg >= ${180.0 / ZOffset} (cell ids must fit ${ZBits} bits)")
    val env = GeoFunctions.st_envelope(col(primaryColumn))
    // The cell predicate's ±1-cell margin is only sound for envelopes no
    // larger than one cell: route anything spanning more than cellDeg in
    // either axis (incl. antimeridian-crossing world-spanning envelopes)
    // plus null geometries to the always-scanned escape cell — false
    // pruning is correctness loss, a hot escape cell is only performance.
    val wide =
      (env.getField("xmax") - env.getField("xmin")) > cellDeg ||
      (env.getField("ymax") - env.getField("ymin")) > cellDeg
    val cx = when(wide, 9999).otherwise(
      floor(((env.getField("xmin") + env.getField("xmax")) / 2) / cellDeg).cast("int"))
    val cy = when(wide, 9999).otherwise(
      floor(((env.getField("ymin") + env.getField("ymax")) / 2) / cellDeg).cast("int"))
    val partitioned =
      if (zOrder)
        df.withColumn("cell_z",
          zEncodeUdf(coalesce(cx, lit(9999)), coalesce(cy, lit(9999))))
      else df
        .withColumn("cell_x", coalesce(cx, lit(9999)))
        .withColumn("cell_y", coalesce(cy, lit(9999)))
    val base = meta.getOrElse(GeoMetadata.default(primaryColumn))
    val geomCols = base.columnNames.filter(df.columns.contains)
    val finalMeta =
      if (geomCols.nonEmpty) base.withStats(geometryStats(df, geomCols)) else base
    val partCols = if (zOrder) Seq("cell_z") else Seq("cell_x", "cell_y")
    // co-locate each cell into one task before the partitioned write:
    // without this every upstream task opens a writer in every cell
    // directory it touches — tasks × cells part files (the classic
    // small-files explosion at cluster scale, and footer stamping below
    // walks every one of them). One hash shuffle on the cell key buys one
    // file per cell; a pathologically hot cell (e.g. the 9999 escape
    // cell) serializes into its single writer, which is a throughput
    // trade, not a correctness one — callers with known-hot grids can
    // pre-split with a finer cellDeg.
    partitioned.repartition(partCols.map(col): _*)
      .write.mode("overwrite")
      .option("compression", compression)
      .partitionBy(partCols: _*)
      .parquet(path)
    // stamp geo metadata + the grid size on every leaf part file (the grid
    // KV lets readers rebuild the partition predicate)
    FooterIO.dataFiles(path).foreach(f => FooterIO.appendKeyValue(f,
      Map(GeoMetadata.MetadataKey -> finalMeta.json, GridKey -> cellDeg.toString) ++
        (if (zOrder) Map(LayoutKey -> "z") else Map.empty)))
    finalMeta
  }

  /** Footer KV key carrying the spatial-partition grid size in degrees. */
  val GridKey = "graft:grid_deg"

  /** Footer KV key naming the partition layout ("z"; absent → x/y grid). */
  val LayoutKey = "graft:grid_layout"

  def gridSize(path: String): Option[Double] =
    if (FooterIO.isNonLocal(path)) None
    else FooterIO.keyValueMetadata(path).get(GridKey).map(_.toDouble)

  // ---------------- Z-order (Morton) cell key ----------------
  // One interleaved partition column instead of the two-level
  // cell_x=…/cell_y=… tree: directory listing is one level, and
  // lexicographically-close z values are spatially close, so a rectangular
  // query's matched directories cluster instead of scattering across the
  // x-major tree. Same cells → same leaf files read; what improves is the
  // layout's locality and listing depth.

  private[sources] val ZBits = 13
  private[sources] val ZOffset = 1 << (ZBits - 1) // 4096: cells in ±4096
  private[sources] val ZEscape = -1L              // wide/null escape cell

  /** Interleave two (offset) cell ids into a Morton key. */
  private[sources] def zEncode(cx: Int, cy: Int): Long = {
    if (cx == 9999 || cy == 9999) return ZEscape
    val x = cx + ZOffset
    val y = cy + ZOffset
    require(x >= 0 && x < (1 << ZBits) && y >= 0 && y < (1 << ZBits),
      s"cell ($cx,$cy) out of z-order range")
    var z = 0L
    var i = 0
    while (i < ZBits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private val zEncodeUdf = udf((cx: Int, cy: Int) => zEncode(cx, cy))

  /** Partition predicate for the z layout: enumerate the (±1-margin) cell
    * rectangle's z keys as an IN list over the single partition column,
    * plus the escape cell. Partition values are a tiny driver-side set, so
    * an IN list of a few hundred keys prunes exactly like the x/y
    * conjunction; degenerate huge enumerations (global box on a sub-degree
    * grid) fall back to scanning all cells rather than building a
    * million-entry list.
    */
  def cellPredicateZ(box: graft.geo.Bbox, cellDeg: Double = 10.0): org.apache.spark.sql.Column = {
    def cellOf(v: Double): Int = math.floor(v / cellDeg).toInt
    val cys = (cellOf(box.ymin) - 1) to (cellOf(box.ymax) + 1)
    val lonLo = cellOf(-180.0) - 1
    val lonHi = cellOf(180.0) + 1
    val cxs: Seq[Int] =
      if (box.crossesAntimeridian)
        ((cellOf(box.xmin) - 1) to lonHi) ++ (lonLo to (cellOf(box.xmax) + 1))
      else (cellOf(box.xmin) - 1) to (cellOf(box.xmax) + 1)
    if (cxs.size.toLong * cys.size > 100000) lit(true)
    else {
      val zs = for { cx <- cxs; cy <- cys } yield zEncode(cx, cy)
      col("cell_z").isin(zs: _*) || col("cell_z") === ZEscape
    }
  }

  /** Partition-pruning predicate for a bbox query over the grid layout:
    * keep cells whose range can intersect the (unwrapped) query box, plus
    * the null-geometry cell. Plain int comparisons → PartitionFilters.
    */
  def cellPredicate(box: graft.geo.Bbox, cellDeg: Double = 10.0): org.apache.spark.sql.Column = {
    def cellOf(v: Double): Int = math.floor(v / cellDeg).toInt
    val cyLo = cellOf(box.ymin) - 1
    val cyHi = cellOf(box.ymax) + 1
    val latOk = col("cell_y").between(cyLo, cyHi)
    val lonOk =
      if (box.crossesAntimeridian) {
        // two ranges: [xmin, 180] and [-180, xmax]
        col("cell_x") >= cellOf(box.xmin) - 1 || col("cell_x") <= cellOf(box.xmax) + 1
      } else
        col("cell_x").between(cellOf(box.xmin) - 1, cellOf(box.xmax) + 1)
    (latOk && lonOk) || (col("cell_x") === 9999 && col("cell_y") === 9999)
  }
}

package graft.functions

import graft.geo.{Bbox, GeoCodec, GeoJsonCodec}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-facing geometry functions (SURVEY.md §2.8 / §2.10).
  *
  * Scalar codecs are Scala UDFs over the JTS-backed [[graft.geo.GeoCodec]];
  * the bbox intersection predicate is deliberately NOT a UDF — it expands to
  * plain column comparisons so Catalyst pushes it into the Parquet scan and
  * prunes row groups on bbox leaf-field statistics, replicating the
  * reference's row-group pruning (internal/geoparquet/filter.go:115-212)
  * with zero custom physical code.
  */
object GeoFunctions {

  // ---- scalar codec UDFs (reference internal/geo/geo.go:102-145) ----

  val wktToWkbUdf = udf((s: String) => Option(GeoCodec.encodeWkb(GeoCodec.decodeWkt(s))))
  val wkbToWktUdf = udf((b: Array[Byte]) => Option(GeoCodec.encodeWkt(GeoCodec.decodeWkb(b))))
  val wkbToGeoJsonUdf = udf { (b: Array[Byte]) =>
    val g = GeoCodec.decodeWkb(b)
    if (g == null) None else Some(GeoJsonCodec.toJsonString(g))
  }
  val geoJsonToWkbUdf = udf { (s: String) =>
    if (s == null || s.isEmpty) None
    else Option(GeoCodec.encodeWkb(GeoJsonCodec.parse(s)))
  }
  val stPointUdf = udf { (x: Double, y: Double) =>
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    GeoCodec.encodeWkb(gf.createPoint(new org.locationtech.jts.geom.Coordinate(x, y)))
  }

  // envelope of a WKB geometry as struct(xmin,ymin,xmax,ymax); null-safe.
  // (UDF form kept for spark.udf.register; the Column API below uses the
  // native Catalyst expressions in WkbExpressions.scala.)
  val stEnvelopeUdf = udf { (b: Array[Byte]) =>
    Option(GeoCodec.envelope(GeoCodec.decodeWkb(b)))
      .map(e => (e.xmin, e.ymin, e.xmax, e.ymax))
  }

  val stGeometryTypeUdf = udf((b: Array[Byte]) => Option(GeoCodec.geoJsonType(GeoCodec.decodeWkb(b))))

  private def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  val stIsValidWkbUdf = udf { (b: Array[Byte]) =>
    if (b == null || b.isEmpty) true
    else try { GeoCodec.decodeWkb(b); true } catch { case _: Exception => false }
  }

  val stCorrectlyOrientedUdf = udf { (b: Array[Byte]) =>
    GeoCodec.correctlyOriented(GeoCodec.decodeWkb(b))
  }

  /** WKB-decode fallback bbox filter (reference filter.go:271-296): decode,
    * envelope, antimeridian-aware intersect. Null geometries drop out.
    * Native expression; with [[graft.plans.GraftExtensions]] installed the
    * optimizer rewrites it onto a covering bbox column when one exists.
    */
  def stEnvelopeIntersectsUdf(box: Bbox) = udf { (b: Array[Byte]) =>
    val env = GeoCodec.envelope(GeoCodec.decodeWkb(b))
    env != null && env.intersects(box)
  }

  // ---- Column API ----

  def wkt_to_wkb(c: Column): Column = wktToWkbUdf(c)
  def wkb_to_wkt(c: Column): Column = wkbToWktUdf(c)
  def wkb_to_geojson(c: Column): Column = wkbToGeoJsonUdf(c)
  def geojson_to_wkb(c: Column): Column = geoJsonToWkbUdf(c)
  def st_point(x: Column, y: Column): Column = stPointUdf(x, y)
  def st_envelope(c: Column): Column = exprColumn(WkbEnvelope(exprOf(c)))
  def st_xmin(c: Column): Column = st_envelope(c).getField("xmin")
  def st_ymin(c: Column): Column = st_envelope(c).getField("ymin")
  def st_xmax(c: Column): Column = st_envelope(c).getField("xmax")
  def st_ymax(c: Column): Column = st_envelope(c).getField("ymax")
  def st_geometry_type(c: Column): Column = exprColumn(WkbGeometryType(exprOf(c)))
  def st_envelope_intersects(c: Column, box: Bbox): Column =
    exprColumn(graft.plans.EnvelopeIntersects(exprOf(c), box))

  /** Antimeridian-aware bbox-vs-bbox intersection over four leaf columns,
    * expanded to column arithmetic (reference geo.go:349-372).
    *
    * The exact predicate needs a conditional unwrap of the data box's xmin
    * (`CASE WHEN xmin > 0 AND xmax < 0 THEN xmin - 360`), which Parquet
    * cannot evaluate against row-group stats. So the returned predicate is
    * `exact AND pushableSuperset` where the superset uses only plain
    * comparisons — Catalyst ships the superset conjuncts to the scan
    * (row-group pruning) and keeps the exact test as the residual filter,
    * the same two-phase shape as the reference's extract path.
    */
  def bbox_intersects(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
                      query: Bbox): Column = {
    val qxmin = query.unwrappedXmin
    // unwrap the data box when it crosses the antimeridian
    val dataCrosses = xmin > 0d && xmax < 0d
    val axmin = when(dataCrosses, xmin - 360d).otherwise(xmin)
    val latOverlap = ymax >= query.ymin && ymin <= query.ymax
    val exact = latOverlap && xmax >= qxmin && axmin <= query.xmax
    // pushable superset: axmin <= q.xmax is implied by
    // (xmin <= q.xmax OR data box crosses). All conjuncts are plain
    // comparisons on leaf columns → Parquet PushedFilters.
    val pushable = latOverlap && xmax >= qxmin &&
      (xmin <= query.xmax || (xmin > 0d && xmax < 0d))
    exact && pushable
  }

  /** Same predicate over a bbox struct column (xmin/ymin/xmax/ymax fields,
    * arbitrary field naming via the covering metadata).
    */
  def bbox_intersects_struct(bboxCol: Column, query: Bbox,
      xminField: String = "xmin", yminField: String = "ymin",
      xmaxField: String = "xmax", ymaxField: String = "ymax"): Column =
    bbox_intersects(bboxCol.getField(xminField), bboxCol.getField(yminField),
      bboxCol.getField(xmaxField), bboxCol.getField(ymaxField), query)

  /** Register the SQL-callable subset. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("wkt_to_wkb", wktToWkbUdf)
    spark.udf.register("wkb_to_wkt", wkbToWktUdf)
    spark.udf.register("wkb_to_geojson", wkbToGeoJsonUdf)
    spark.udf.register("geojson_to_wkb", geoJsonToWkbUdf)
    spark.udf.register("st_point", stPointUdf)
    spark.udf.register("st_envelope", stEnvelopeUdf)
    spark.udf.register("st_geometry_type", stGeometryTypeUdf)
    spark.udf.register("st_is_valid_wkb", stIsValidWkbUdf)
    spark.udf.register("st_correctly_oriented", stCorrectlyOrientedUdf)
  }
}

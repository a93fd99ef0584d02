package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** The GeoParquet `geo` footer metadata model
  * (reference internal/geoparquet/metadata.go:39-199).
  *
  * Parsed leniently from the footer JSON: the raw tree is retained both for
  * lossless passthrough (extract/convert re-emit the input metadata) and for
  * the validator's raw-shape checks; typed accessors mirror the reference's
  * accessors including the legacy v0.4 `geometry_type` fallback
  * (metadata.go:116-146).
  */
object GeoMetadata {
  val Version = "1.0.0"
  val MetadataKey = "geo"
  val EdgesPlanar = "planar"
  val EdgesSpherical = "spherical"
  val OrientationCounterClockwise = "counterclockwise"
  val DefaultGeometryColumn = "geometry"
  val DefaultGeometryEncoding = "WKB"

  val GeometryTypes: Seq[String] = Seq(
    "Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
    "MultiPolygon", "GeometryCollection",
    "Point Z", "LineString Z", "Polygon Z", "MultiPoint Z",
    "MultiLineString Z", "MultiPolygon Z", "GeometryCollection Z")

  private[meta] val mapper = new ObjectMapper()

  def parse(json: String): GeoMetadata = {
    val node =
      try mapper.readTree(json)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"unable to parse $MetadataKey metadata: ${e.getMessage}")
      }
    require(node != null && node.isObject, s"unable to parse $MetadataKey metadata")
    new GeoMetadata(node.asInstanceOf[ObjectNode])
  }

  /** Default metadata for a fresh write (metadata.go:155-163). */
  def default(primaryColumn: String = DefaultGeometryColumn): GeoMetadata = {
    val root = mapper.createObjectNode()
    root.put("version", Version)
    root.put("primary_column", primaryColumn)
    val cols = root.putObject("columns")
    val col = cols.putObject(primaryColumn)
    col.put("encoding", DefaultGeometryEncoding)
    col.putArray("geometry_types")
    new GeoMetadata(root)
  }
}

final class GeoMetadata(val raw: ObjectNode) {
  import GeoMetadata._

  private def strField(node: JsonNode, name: String): Option[String] =
    Option(node.get(name)).filter(_.isTextual).map(_.asText())

  def version: Option[String] = strField(raw, "version")
  def primaryColumn: String =
    strField(raw, "primary_column").getOrElse(DefaultGeometryColumn)
  def columnsNode: Option[JsonNode] = Option(raw.get("columns")).filter(_.isObject)

  def columnNames: Seq[String] =
    columnsNode.map(_.fieldNames().asScala.toSeq).getOrElse(Nil)

  def column(name: String): Option[GeometryColumn] =
    columnsNode.flatMap(c => Option(c.get(name))).filter(_.isObject)
      .map(n => new GeometryColumn(name, n.asInstanceOf[ObjectNode]))

  def primary: Option[GeometryColumn] = column(primaryColumn)

  def json: String = mapper.writeValueAsString(raw)

  /** Copy with per-column computed bounds + geometry types embedded
    * (write path, reference featurewriter.go:277-307).
    */
  def withStats(stats: Map[String, (Seq[Double], Seq[String])]): GeoMetadata = {
    val root = raw.deepCopy()
    val cols =
      if (root.has("columns") && root.get("columns").isObject)
        root.get("columns").asInstanceOf[ObjectNode]
      else root.putObject("columns")
    stats.foreach { case (name, (bounds, types)) =>
      val col =
        if (cols.has(name) && cols.get(name).isObject) cols.get(name).asInstanceOf[ObjectNode]
        else { val c = cols.putObject(name); c.put("encoding", DefaultGeometryEncoding); c }
      if (bounds.nonEmpty) {
        val b = col.putArray("bbox")
        bounds.foreach(b.add)
      }
      val t = col.putArray("geometry_types")
      types.foreach(t.add)
    }
    new GeoMetadata(root)
  }

  /** Copy with a covering declaration on the primary column: GeoParquet
    * 1.1 `covering.bbox` corner paths (metadata.go:83-92) pointing at the
    * named bbox struct column.
    */
  def withCovering(bboxColumn: String): GeoMetadata = {
    val root = raw.deepCopy()
    val cols =
      if (root.has("columns") && root.get("columns").isObject)
        root.get("columns").asInstanceOf[ObjectNode]
      else root.putObject("columns")
    val name = primaryColumn
    val col =
      if (cols.has(name) && cols.get(name).isObject) cols.get(name).asInstanceOf[ObjectNode]
      else { val c = cols.putObject(name); c.put("encoding", DefaultGeometryEncoding); c }
    val bbox = col.putObject("covering").putObject("bbox")
    Seq("xmin", "ymin", "xmax", "ymax").foreach { corner =>
      val a = bbox.putArray(corner)
      a.add(bboxColumn); a.add(corner)
    }
    new GeoMetadata(root)
  }

  override def toString: String = json
}

final class GeometryColumn(val name: String, val raw: ObjectNode) {
  import GeoMetadata._

  private def str(field: String): Option[String] =
    Option(raw.get(field)).filter(_.isTextual).map(_.asText())

  def encoding: String = str("encoding").getOrElse(DefaultGeometryEncoding)
  def encodingRaw: Option[JsonNode] = Option(raw.get("encoding"))
  def edges: Option[String] = str("edges")
  def orientation: Option[String] = str("orientation")
  def epoch: Option[Double] =
    Option(raw.get("epoch")).filter(_.isNumber).map(_.asDouble())
  def crs: Option[JsonNode] = Option(raw.get("crs")).filter(!_.isNull)

  def bounds: Option[Seq[Double]] =
    Option(raw.get("bbox")).filter(_.isArray).map { a =>
      (0 until a.size()).map(i => a.get(i).asDouble())
    }

  def boundsRaw: Option[JsonNode] = Option(raw.get("bbox"))
  def geometryTypesRaw: Option[JsonNode] = Option(raw.get("geometry_types"))
  def legacyGeometryTypeRaw: Option[JsonNode] = Option(raw.get("geometry_type"))

  /** Typed geometry-types accessor with the legacy v0.4 `geometry_type`
    * fallback; returns None when values are not all strings
    * (metadata.go:116-146 returns nil in that case).
    */
  def geometryTypes: Option[Seq[String]] = {
    def strings(n: JsonNode): Option[Seq[String]] =
      if (!n.isArray) None
      else {
        val vals = (0 until n.size()).map(n.get)
        if (vals.forall(_.isTextual)) Some(vals.map(_.asText())) else None
      }
    geometryTypesRaw match {
      case Some(n) if n.isArray => strings(n)
      case _ =>
        legacyGeometryTypeRaw match {
          case Some(n) if n.isTextual => Some(Seq(n.asText()))
          case Some(n) if n.isArray => strings(n)
          case _ => None
        }
    }
  }

  /** Covering bbox paths: (column, field) pairs for each corner
    * (metadata.go:83-92, geoparquet.go:200-254).
    */
  def covering: Option[CoveringBbox] =
    for {
      cov <- Option(raw.get("covering")).filter(_.isObject)
      bbox <- Option(cov.get("bbox")).filter(_.isObject)
      xmin <- path(bbox, "xmin"); ymin <- path(bbox, "ymin")
      xmax <- path(bbox, "xmax"); ymax <- path(bbox, "ymax")
    } yield CoveringBbox(xmin, ymin, xmax, ymax)

  private def path(bbox: JsonNode, corner: String): Option[Seq[String]] =
    Option(bbox.get(corner)).filter(_.isArray).map { a =>
      (0 until a.size()).map(i => a.get(i).asText())
    }

  /** CRS display string (metadata.go:65-81). */
  def crsString: String = crs match {
    case None => "Unknown"
    case Some(c) =>
      val name = Option(c.get("name")).filter(_.isTextual).map(_.asText()).getOrElse("")
      val id = Option(c.get("id")).filter(_.isObject).flatMap { idNode =>
        val auth = Option(idNode.get("authority")).filter(_.isTextual).map(_.asText())
        val code = Option(idNode.get("code"))
        (auth, code) match {
          case (Some(a), Some(cd)) if cd.isTextual => Some(s"$a:${cd.asText()}")
          case (Some(a), Some(cd)) if cd.isNumber =>
            val d = cd.asDouble()
            val s = if (d == math.floor(d) && !d.isInfinite) cd.asLong().toString else d.toString
            Some(s"$a:$s")
          case _ => None
        }
      }.getOrElse("")
      if (name.nonEmpty) name else if (id.nonEmpty) id else "Unknown"
  }
}

/** Resolved bbox covering field paths; (bboxColumn, fieldName) per corner. */
final case class CoveringBbox(
    xmin: Seq[String], ymin: Seq[String], xmax: Seq[String], ymax: Seq[String])

package graft.geo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.locationtech.jts.geom._

/** GeoJSON geometry object ↔ JTS geometry (reference uses paulmach/orb's
  * geojson codec; internal/geojson/featurereader.go:90-95,
  * recordwriter.go:59). Hand-rolled coordinates walker over Jackson since
  * jts-core ships no GeoJSON IO.
  *
  * All seven GeoJSON geometry types are supported, with optional Z
  * ordinates. Unknown `type` values are errors.
  */
object GeoJsonCodec {

  private val mapper = new ObjectMapper()
  private val gf = new GeometryFactory()

  // ---- decode ----

  def parse(json: String): Geometry = fromNode(mapper.readTree(json))

  def fromNode(node: JsonNode): Geometry = {
    require(node != null && node.isObject, "expected a GeoJSON geometry object")
    val typ = Option(node.get("type")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("missing geometry type"))
    if (typ == "GeometryCollection") {
      val geoms = Option(node.get("geometries")).getOrElse(
        throw new IllegalArgumentException("missing geometries"))
      val parts = (0 until geoms.size()).map(i => fromNode(geoms.get(i))).toArray
      return gf.createGeometryCollection(parts)
    }
    val coords = Option(node.get("coordinates")).getOrElse(
      throw new IllegalArgumentException(s"missing coordinates for $typ"))
    // empty coordinates arrays are valid GeoJSON empties
    typ match {
      case "Point"           =>
        if (coords.isArray && coords.size() == 0) gf.createPoint()
        else gf.createPoint(coord(coords))
      case "MultiPoint"      => gf.createMultiPoint(coordSeq(coords).map(gf.createPoint))
      case "LineString"      => gf.createLineString(coordSeq(coords))
      case "MultiLineString" =>
        gf.createMultiLineString(arr(coords).map(c => gf.createLineString(coordSeq(c))).toArray)
      case "Polygon"         => polygon(coords)
      case "MultiPolygon"    =>
        gf.createMultiPolygon(arr(coords).map(polygon).toArray)
      case other => throw new IllegalArgumentException(s"unsupported geometry type: $other")
    }
  }

  private def arr(n: JsonNode): Seq[JsonNode] = {
    require(n.isArray, "expected a coordinates array")
    (0 until n.size()).map(n.get)
  }

  private def coord(n: JsonNode): Coordinate = {
    val parts = arr(n)
    require(parts.length >= 2, "coordinate needs at least 2 ordinates")
    if (parts.length >= 3)
      new Coordinate(parts(0).asDouble(), parts(1).asDouble(), parts(2).asDouble())
    else new Coordinate(parts(0).asDouble(), parts(1).asDouble())
  }

  private def coordSeq(n: JsonNode): Array[Coordinate] = arr(n).map(coord).toArray

  private def polygon(n: JsonNode): Polygon = {
    val rings = arr(n).map(r => gf.createLinearRing(coordSeq(r)))
    if (rings.isEmpty) gf.createPolygon()
    else gf.createPolygon(rings.head, rings.tail.toArray)
  }

  // ---- encode ----

  def toJsonString(geom: Geometry): String =
    mapper.writeValueAsString(toNode(geom))

  def toNode(geom: Geometry): ObjectNode = {
    val node = mapper.createObjectNode()
    geom match {
      case g: GeometryCollection if g.getGeometryType == "GeometryCollection" =>
        node.put("type", "GeometryCollection")
        val parts = node.putArray("geometries")
        (0 until g.getNumGeometries).foreach(i => parts.add(toNode(g.getGeometryN(i))))
      case _ =>
        node.put("type", geom.getGeometryType)
        node.set[JsonNode]("coordinates", coordinatesNode(geom))
    }
    node
  }

  private def coordinatesNode(geom: Geometry): ArrayNode = geom match {
    // empty geometries encode as "coordinates": [] — an empty Point has no
    // coordinate (NPE), and a WKB POINT EMPTY decodes to NaN ordinates
    // which Jackson would serialize as invalid JSON NaN tokens
    case g if g.isEmpty     => mapper.createArrayNode()
    case p: Point if p.getCoordinate == null ||
        java.lang.Double.isNaN(p.getCoordinate.getX) ||
        java.lang.Double.isNaN(p.getCoordinate.getY) => mapper.createArrayNode()
    case p: Point           => pointArr(p.getCoordinate)
    case mp: MultiPoint     => nest((0 until mp.getNumGeometries)
      .map(i => pointArr(mp.getGeometryN(i).asInstanceOf[Point].getCoordinate)))
    case l: LineString      => lineArr(l)
    case ml: MultiLineString => nest((0 until ml.getNumGeometries)
      .map(i => lineArr(ml.getGeometryN(i).asInstanceOf[LineString])))
    case p: Polygon         => polyArr(p)
    case mp: MultiPolygon   => nest((0 until mp.getNumGeometries)
      .map(i => polyArr(mp.getGeometryN(i).asInstanceOf[Polygon])))
    case other => throw new IllegalArgumentException(s"cannot encode ${other.getGeometryType}")
  }

  private def nest(children: Seq[ArrayNode]): ArrayNode = {
    val a = mapper.createArrayNode()
    children.foreach(a.add)
    a
  }

  private def pointArr(c: Coordinate): ArrayNode = {
    val a = mapper.createArrayNode()
    a.add(c.getX); a.add(c.getY)
    if (!java.lang.Double.isNaN(c.getZ)) a.add(c.getZ)
    a
  }

  private def lineArr(l: LineString): ArrayNode =
    nest(l.getCoordinates.toSeq.map(pointArr))

  private def polyArr(p: Polygon): ArrayNode = {
    val rings = Seq(p.getExteriorRing) ++
      (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
    nest(rings.map(lineArr))
  }
}

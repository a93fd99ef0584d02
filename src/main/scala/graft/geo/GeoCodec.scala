package graft.geo

import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom._
import org.locationtech.jts.io.{ByteOrderValues, WKBReader, WKBWriter, WKTReader, WKTWriter}

/** Geometry codecs (WKB / WKT) and scalar geometry helpers, built on JTS.
  *
  * Mirrors the reference's codec surface (internal/geo/geo.go:102-145):
  * null / empty byte input decodes to null; unknown encodings are errors;
  * encoding is sniffed from the runtime type when not declared (bytes→WKB,
  * string→WKT). The reference's geometry model (paulmach/orb) is strictly
  * 2D, so WKB output is XY little-endian; the reader tolerates Z/M inputs.
  *
  * JTS readers/writers are not thread-safe — everything here goes through
  * ThreadLocals so the same helpers are usable inside executor tasks.
  */
object GeoCodec {

  val WkbEncoding = "WKB"
  val WktEncoding = "WKT"

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader())
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader())
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](
    () => new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN))
  private val wkbWriter3 = ThreadLocal.withInitial[WKBWriter](
    () => new WKBWriter(3, ByteOrderValues.LITTLE_ENDIAN))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())
  private val wktWriter3 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(3))

  /** null or empty bytes → null (reference geo.go:119-125). */
  def decodeWkb(bytes: Array[Byte]): Geometry =
    if (bytes == null || bytes.isEmpty) null
    else wkbReader.get().read(bytes)

  def decodeWkt(text: String): Geometry =
    if (text == null || text.isEmpty) null
    else wktReader.get().read(text)

  /** Type-sniffing decode with reference-exact error classification
    * (geo.go:107-144): wrong value type for a declared encoding and
    * unknown encodings are distinct errors.
    */
  def decode(value: Any, encoding: String = ""): Geometry = {
    if (value == null) return null
    val enc =
      if (encoding.nonEmpty) encoding
      else value match {
        case _: Array[Byte] => WkbEncoding
        case _: String => WktEncoding
        case _ => ""
      }
    enc match {
      case WkbEncoding => value match {
        case b: Array[Byte] => decodeWkb(b)
        case other => throw new IllegalArgumentException(
          s"expected bytes for wkb geometry, got ${typeName(other)}")
      }
      case WktEncoding => value match {
        case s: String => decodeWkt(s)
        case other => throw new IllegalArgumentException(
          s"expected string for wkt geometry, got ${typeName(other)}")
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported encoding: $other")
    }
  }

  private def typeName(v: Any): String = v match {
    case _: Array[Byte] => "bytes"
    case _: String => "string"
    case other => other.getClass.getSimpleName
  }

  def encodeWkb(geom: Geometry): Array[Byte] =
    if (geom == null) null
    else if (hasZ(geom)) wkbWriter3.get().write(geom)
    else wkbWriter.get().write(geom)

  def encodeWkt(geom: Geometry): String =
    if (geom == null) null
    else if (hasZ(geom)) wktWriter3.get().write(geom)
    else wktWriter.get().write(geom)

  def hasZ(geom: Geometry): Boolean = {
    if (geom == null || geom.isEmpty) return false
    val c = geom.getCoordinate
    c != null && !java.lang.Double.isNaN(c.getZ)
  }

  /** GeoJSON type name, " Z"-suffixed for 3D geometries
    * (reference metadata.go:22-37, validator rules.go:551-558).
    */
  def geoJsonType(geom: Geometry): String =
    if (geom == null) null
    else if (hasZ(geom)) geom.getGeometryType + " Z"
    else geom.getGeometryType

  /** Envelope as a Bbox; null/empty geometry → null. */
  def envelope(geom: Geometry): Bbox = {
    if (geom == null || geom.isEmpty) return null
    val e = geom.getEnvelopeInternal
    Bbox(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }

  /** Exterior-ring-CCW / interior-rings-CW test over every polygon in the
    * geometry (reference validator rules.go:583-602). Non-polygonal
    * geometries are vacuously true.
    */
  def correctlyOriented(geom: Geometry): Boolean = geom match {
    case null => true
    case p: Polygon =>
      if (p.isEmpty) true
      else {
        val shellOk = Orientation.isCCW(p.getExteriorRing.getCoordinateSequence)
        shellOk && (0 until p.getNumInteriorRing).forall { i =>
          !Orientation.isCCW(p.getInteriorRingN(i).getCoordinateSequence)
        }
      }
    case g: GeometryCollection =>
      (0 until g.getNumGeometries).forall(i => correctlyOriented(g.getGeometryN(i)))
    case _ => true
  }
}

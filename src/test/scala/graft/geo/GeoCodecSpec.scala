package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeoCodecSpec extends AnyFunSuite {

  private val samples = Seq(
    "POINT (1 2)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
    "MULTIPOINT ((0 0), (1 1))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")

  test("WKT -> geometry -> WKB -> geometry round-trips") {
    samples.foreach { wkt =>
      val g = GeoCodec.decodeWkt(wkt)
      val bytes = GeoCodec.encodeWkb(g)
      val back = GeoCodec.decodeWkb(bytes)
      assert(back.equalsExact(g), s"round-trip mismatch for $wkt")
    }
  }

  test("null and empty inputs decode to null") {
    assert(GeoCodec.decodeWkb(null) == null)
    assert(GeoCodec.decodeWkb(Array.emptyByteArray) == null)
    assert(GeoCodec.decodeWkt(null) == null)
    assert(GeoCodec.decodeWkt("") == null)
    assert(GeoCodec.encodeWkb(null) == null)
  }

  test("type-sniffing decode dispatches on runtime type") {
    val g = GeoCodec.decodeWkt("POINT (3 4)")
    assert(GeoCodec.decode(GeoCodec.encodeWkb(g)).equalsExact(g))
    assert(GeoCodec.decode("POINT (3 4)").equalsExact(g))
    intercept[IllegalArgumentException](GeoCodec.decode(42))
  }

  test("invalid WKB raises") {
    intercept[Exception](GeoCodec.decodeWkb(Array[Byte](9, 9, 9, 9)))
  }

  test("geoJsonType names with Z suffix") {
    assert(GeoCodec.geoJsonType(GeoCodec.decodeWkt("POINT (1 2)")) == "Point")
    assert(GeoCodec.geoJsonType(GeoCodec.decodeWkt("POINT Z (1 2 3)")) == "Point Z")
    assert(GeoCodec.geoJsonType(GeoCodec.decodeWkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")) == "MultiPolygon")
    assert(GeoCodec.geoJsonType(null) == null)
  }

  test("Z geometries round-trip through WKB") {
    val g = GeoCodec.decodeWkt("LINESTRING Z (0 0 1, 1 1 2)")
    val back = GeoCodec.decodeWkb(GeoCodec.encodeWkb(g))
    assert(GeoCodec.geoJsonType(back) == "LineString Z")
  }

  test("envelope") {
    val e = GeoCodec.envelope(GeoCodec.decodeWkt("LINESTRING (0 5, 10 -5)"))
    assert(e == Bbox(0, -5, 10, 5))
    assert(GeoCodec.envelope(GeoCodec.decodeWkt("POLYGON EMPTY")) == null)
    assert(GeoCodec.envelope(null) == null)
  }

  test("ring orientation: CCW shell + CW holes is correct") {
    val ccw = GeoCodec.decodeWkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val cw = GeoCodec.decodeWkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    assert(GeoCodec.correctlyOriented(ccw))
    assert(!GeoCodec.correctlyOriented(cw))
    val withCcwHole = GeoCodec.decodeWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(!GeoCodec.correctlyOriented(withCcwHole))
    val withCwHole = GeoCodec.decodeWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    assert(GeoCodec.correctlyOriented(withCwHole))
    // non-polygonal geometries are vacuously fine
    assert(GeoCodec.correctlyOriented(GeoCodec.decodeWkt("POINT (0 0)")))
    assert(GeoCodec.correctlyOriented(null))
  }
}

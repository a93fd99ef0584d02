package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeoJsonCodecSpec extends AnyFunSuite {

  private val cases = Seq(
    """{"type":"Point","coordinates":[1.0,2.0]}""",
    """{"type":"MultiPoint","coordinates":[[0.0,0.0],[1.0,1.0]]}""",
    """{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0],[2.0,0.0]]}""",
    """{"type":"MultiLineString","coordinates":[[[0.0,0.0],[1.0,1.0]],[[2.0,2.0],[3.0,3.0]]]}""",
    """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,1.0],[0.0,0.0]]]}""",
    """{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]]}""",
    """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1.0,2.0]}]}""")

  test("all seven types round-trip") {
    cases.foreach { json =>
      val g = GeoJsonCodec.parse(json)
      val again = GeoJsonCodec.parse(GeoJsonCodec.toJsonString(g))
      assert(again.equalsExact(g), s"round-trip mismatch for $json")
    }
  }

  test("key order does not matter") {
    val g = GeoJsonCodec.parse("""{"coordinates":[1.0,2.0],"type":"Point"}""")
    assert(g.getGeometryType == "Point")
    assert(g.getCoordinate.getX == 1.0 && g.getCoordinate.getY == 2.0)
  }

  test("Z ordinates survive") {
    val g = GeoJsonCodec.parse("""{"type":"Point","coordinates":[1.0,2.0,3.0]}""")
    assert(GeoCodec.geoJsonType(g) == "Point Z")
    assert(GeoJsonCodec.toJsonString(g).contains("3.0"))
  }

  test("unknown type errors") {
    intercept[IllegalArgumentException](
      GeoJsonCodec.parse("""{"type":"Circle","coordinates":[0,0]}"""))
  }

  test("geojson -> wkb -> geojson preserves geometry") {
    val g = GeoJsonCodec.parse(cases(4))
    val viaWkb = GeoCodec.decodeWkb(GeoCodec.encodeWkb(g))
    assert(GeoJsonCodec.parse(GeoJsonCodec.toJsonString(viaWkb)).equalsExact(g))
  }
}

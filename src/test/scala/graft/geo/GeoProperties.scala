package graft.geo

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** Property-style coverage (reference test strategy layer 3, SURVEY §5):
  * codec round-trips and bbox algebra over generated inputs.
  */
object GeoProperties extends Properties("geo") {

  private val gf = new GeometryFactory()

  private val coordGen: Gen[Coordinate] = for {
    x <- Gen.chooseNum(-180d, 180d)
    y <- Gen.chooseNum(-90d, 90d)
  } yield new Coordinate(x, y)

  private val pointGen = coordGen.map(gf.createPoint)

  private val lineGen = for {
    n <- Gen.chooseNum(2, 20)
    cs <- Gen.listOfN(n, coordGen)
  } yield gf.createLineString(cs.toArray)

  private val polyGen = for {
    cx <- Gen.chooseNum(-170d, 170d)
    cy <- Gen.chooseNum(-80d, 80d)
    r <- Gen.chooseNum(0.1d, 9d)
    n <- Gen.chooseNum(3, 12)
  } yield {
    val pts = (0 to n).map { i =>
      val a = 2 * math.Pi * i / n
      new Coordinate(cx + r * math.cos(a), cy + r * math.sin(a))
    }
    gf.createPolygon((pts.init :+ pts.head).toArray)
  }

  private val geomGen = Gen.oneOf(pointGen, lineGen, polyGen)

  property("wkb round-trip") = forAll(geomGen) { g =>
    GeoCodec.decodeWkb(GeoCodec.encodeWkb(g)).equalsExact(g)
  }

  property("wkt round-trip preserves topology") = forAll(geomGen) { g =>
    // WKT text has finite precision; round-trip must stay ~identical
    GeoCodec.decodeWkt(GeoCodec.encodeWkt(g)).equalsExact(g, 1e-9)
  }

  property("geojson round-trip") = forAll(geomGen) { g =>
    GeoJsonCodec.parse(GeoJsonCodec.toJsonString(g)).equalsExact(g)
  }

  property("envelope contains every coordinate") = forAll(geomGen) { g =>
    val e = GeoCodec.envelope(g)
    g.getCoordinates.forall(c =>
      c.x >= e.xmin && c.x <= e.xmax && c.y >= e.ymin && c.y <= e.ymax)
  }

  private val boxGen: Gen[Bbox] = for {
    x1 <- Gen.chooseNum(-180d, 180d); x2 <- Gen.chooseNum(-180d, 180d)
    y1 <- Gen.chooseNum(-90d, 90d); y2 <- Gen.chooseNum(-90d, 90d)
  } yield Bbox(math.min(x1, x2), math.min(y1, y2), math.max(x1, x2), math.max(y1, y2))

  property("bbox intersects is symmetric") = forAll(boxGen, boxGen) { (a, b) =>
    a.intersects(b) == b.intersects(a)
  }

  property("bbox intersection matches interval algebra for normalized boxes") =
    forAll(boxGen, boxGen) { (a, b) =>
      val expected = a.xmin <= b.xmax && b.xmin <= a.xmax &&
        a.ymin <= b.ymax && b.ymin <= a.ymax
      a.intersects(b) == expected
    }

  property("envelope of an intersecting geometry intersects the geometry's own bbox") =
    forAll(geomGen) { g =>
      val e = GeoCodec.envelope(g)
      e.intersects(e) && e.intersects(Bbox(-180, -90, 180, 90))
    }
}

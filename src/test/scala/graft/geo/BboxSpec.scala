package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Ports the reference's bbox cases (internal/geo/geo_test.go:10-160). */
class BboxSpec extends AnyFunSuite {

  test("intersects true") {
    assert(Bbox(10, 20, 30, 40).intersects(Bbox(25, 35, 45, 55)))
  }

  test("intersects false") {
    assert(!Bbox(-10, 20, -5, 40).intersects(Bbox(-1, 50, 0, 70)))
  }

  test("touching edges intersect") {
    assert(Bbox(10, 20, 30, 40).intersects(Bbox(30, 20, 40, 40)))
  }

  test("whole globe intersects") {
    assert(Bbox(-180, -90, 180, 90).intersects(Bbox(10, 10, 30, 30)))
  }

  test("containment intersects") {
    assert(Bbox(10, 10, 30, 30).intersects(Bbox(0, 0, 40, 40)))
  }

  test("antimeridian crossing box intersects box on the west side") {
    assert(Bbox(170, -10, -165, 10).intersects(Bbox(-180, -5, -170, 15)))
  }

  test("non-crossing box near antimeridian does not reach across") {
    assert(!Bbox(170, -10, 180, 10).intersects(Bbox(-160, -5, -150, 15)))
  }

  test("fromString parses 4 floats") {
    assert(Bbox.fromString("-160,-5,-150,15") == Bbox(-160, -5, -150, 15))
  }

  test("fromString rejects wrong arity") {
    val e = intercept[IllegalArgumentException](Bbox.fromString("-160,-5,-150"))
    assert(e.getMessage.contains("please provide 4"))
  }

  test("fromString rejects non-numeric") {
    val e = intercept[IllegalArgumentException](Bbox.fromString("foo,-5,-150,15"))
    assert(e.getMessage.toLowerCase.contains("float"))
  }

  private def randomBox(r: Random): Bbox = {
    val x1 = r.between(-180d, 180d); val x2 = r.between(-180d, 180d)
    val y1 = r.between(-90d, 90d); val y2 = r.between(-90d, 90d)
    Bbox(math.min(x1, x2), math.min(y1, y2), math.max(x1, x2), math.max(y1, y2))
  }

  test("property: symmetric, reflexive, globe-intersecting for normalized boxes") {
    val r = new Random(42)
    (1 to 500).foreach { _ =>
      val a = randomBox(r); val b = randomBox(r)
      assert(a.intersects(b) == b.intersects(a))
      assert(a.intersects(a))
      assert(a.intersects(Bbox(-180, -90, 180, 90)))
    }
  }
}

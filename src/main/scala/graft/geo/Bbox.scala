package graft.geo

/** Axis-aligned bounding box with antimeridian-aware intersection.
  *
  * Semantics follow the reference (internal/geo/geo.go:341-372): a box whose
  * `xmin > 0 && xmax < 0` is taken to cross the antimeridian in the
  * -180/180 coordinate range, and its xmin is unwrapped to `-180-(180-xmin)`
  * before the standard overlap test. Touching edges count as intersecting.
  */
final case class Bbox(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {

  def crossesAntimeridian: Boolean = xmin > 0 && xmax < 0

  /** xmin unwrapped below -180 when the box crosses the antimeridian. */
  def unwrappedXmin: Double =
    if (crossesAntimeridian) -180d - (180d - xmin) else xmin

  def intersects(other: Bbox): Boolean = {
    // latitude overlap (never affected by the antimeridian)
    if (ymax < other.ymin || other.ymax < ymin) return false
    val x1 = unwrappedXmin
    val x2 = other.unwrappedXmin
    // longitude overlap on unwrapped coordinates
    !(xmax < x2 || other.xmax < x1)
  }

  def expand(other: Bbox): Bbox = Bbox(
    math.min(xmin, other.xmin), math.min(ymin, other.ymin),
    math.max(xmax, other.xmax), math.max(ymax, other.ymax))

  def toSeq: Seq[Double] = Seq(xmin, ymin, xmax, ymax)
}

object Bbox {

  /** Parse "xmin,ymin,xmax,ymax" (reference geo.go:375-411). */
  def fromString(bounds: String): Bbox = {
    val parts = bounds.split(",", -1)
    require(parts.length == 4,
      "please provide 4 comma-separated values (xmin,ymin,xmax,ymax) as a bbox")
    def num(s: String, name: String): Double =
      try s.trim.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"trouble parsing $name input as float64: $s")
      }
    Bbox(num(parts(0), "xmin"), num(parts(1), "ymin"),
         num(parts(2), "xmax"), num(parts(3), "ymax"))
  }

  /** Identity element for bounds union (reference geo.go:160-168). */
  val empty: Bbox = Bbox(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
}

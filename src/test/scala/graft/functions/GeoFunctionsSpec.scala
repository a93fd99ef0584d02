package graft.functions

import graft.SparkSpec
import graft.geo.{Bbox, GeoCodec}
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {
  import GeoFunctions._

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, "POINT (35 -6.5)"),          // inside the Tanzania-style box
      (2L, "POINT (-13 27)"),           // outside
      (3L, "LINESTRING (30 -10, 40 0)"),// envelope overlaps
      (4L, "POINT (170 0)"),            // far east
      (5L, null.asInstanceOf[String])   // null geometry
    ).toDF("id", "wkt").withColumn("geometry", wkt_to_wkb($"wkt"))
  }

  test("wkt_to_wkb / wkb_to_wkt round-trip") {
    import spark.implicits._
    val back = df.where($"wkt".isNotNull)
      .select($"wkt", wkb_to_wkt($"geometry").as("wkt2"))
      .collect()
    back.foreach { r =>
      val a = GeoCodec.decodeWkt(r.getString(0))
      val b = GeoCodec.decodeWkt(r.getString(1))
      assert(a.equalsExact(b))
    }
    assert(df.where($"wkt".isNull).select($"geometry").head.isNullAt(0))
  }

  test("st_envelope + accessors") {
    import spark.implicits._
    val row = df.where($"id" === 3)
      .select(st_xmin($"geometry"), st_ymin($"geometry"),
              st_xmax($"geometry"), st_ymax($"geometry")).head
    assert(row.getDouble(0) == 30 && row.getDouble(1) == -10)
    assert(row.getDouble(2) == 40 && row.getDouble(3) == 0)
  }

  test("st_geometry_type") {
    import spark.implicits._
    val types = df.where($"id".isin(1, 3))
      .select($"id", st_geometry_type($"geometry")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(types == Map(1L -> "Point", 3L -> "LineString"))
  }

  test("st_envelope_intersects fallback filter") {
    import spark.implicits._
    val box = Bbox(34, -7, 36, -6)
    val ids = df.where(st_envelope_intersects($"geometry", box))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
  }

  test("bbox_intersects over leaf columns incl. antimeridian unwrap") {
    import spark.implicits._
    val boxes = Seq(
      (1L, 10d, 20d, 30d, 40d),    // plain box
      (2L, 170d, -10d, -165d, 10d),// crosses antimeridian
      (3L, 170d, -10d, 180d, 10d)  // east strip, does not cross
    ).toDF("id", "xmin", "ymin", "xmax", "ymax")
    def q(b: Bbox): Set[Long] =
      boxes.where(bbox_intersects($"xmin", $"ymin", $"xmax", $"ymax", b))
        .select($"id").collect().map(_.getLong(0)).toSet
    assert(q(Bbox(25, 35, 45, 55)) == Set(1L))
    assert(q(Bbox(-180, -5, -170, 15)) == Set(2L))   // reaches across only via AM box
    assert(q(Bbox(-160, -5, -150, 15)) == Set.empty) // reference geo_test: no reach
    // Reference semantics (geo.go:349-372) are deliberately pinned here even
    // where geographically lossy: an AM-crossing data box is unwrapped to
    // [-190,-165], so its eastern half no longer matches non-crossing
    // queries near +180 — the reference would return false too.
    assert(q(Bbox(171, -1, 172, 1)) == Set(3L))
    // query box itself crossing the antimeridian: unwrapped to [-185,-179];
    // matches the unwrapped data box but not the +170..+180 strip.
    assert(q(Bbox(175, -1, -179, 1)) == Set(2L))
  }

  test("st_point/geojson codecs") {
    import spark.implicits._
    val r = spark.range(1).select(
      wkb_to_geojson(st_point(lit(1.5), lit(2.5))).as("gj")).head
    assert(r.getString(0) == """{"type":"Point","coordinates":[1.5,2.5]}""")
    val back = spark.range(1).select(
      wkb_to_wkt(geojson_to_wkb(lit("""{"type":"Point","coordinates":[3.0,4.0]}"""))))
      .head.getString(0)
    assert(GeoCodec.decodeWkt(back).equalsExact(GeoCodec.decodeWkt("POINT (3 4)")))
  }
}

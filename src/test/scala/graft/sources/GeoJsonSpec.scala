package graft.sources

import graft.SparkSpec
import graft.geo.GeoCodec
import org.apache.spark.sql.types._

/** Ports the reference's GeoJSON reader/convert cases
  * (internal/geojson/featurereader_test.go, geojson_test.go).
  */
class GeoJsonSpec extends SparkSpec {

  val gj = "src/test/resources/geojson"

  private def features(file: String): Seq[RawFeature] = {
    val it = new FeatureIterator(new java.io.BufferedReader(new java.io.FileReader(s"$gj/$file")))
    try it.toList finally it.close()
  }

  test("feature collection with any key order (example.geojson)") {
    val fs = features("example.geojson")
    assert(fs.length == 5)
    assert(fs.map(_.properties.get("name").asText()).toSet
      .contains("Tanzania"))
    assert(fs.forall(_.geometry != null))
  }

  test("single feature file") {
    val fs = features("feature.geojson")
    assert(fs.length == 1)
    assert(fs.head.geometry.getGeometryType == "Point")
    assert(fs.head.properties.get("name").asText() == "test")
  }

  test("bare geometry with coordinates before type") {
    val fs = features("point-geometry.geojson")
    assert(fs.length == 1)
    assert(fs.head.geometry.getGeometryType == "Point")
    assert(fs.head.properties.size() == 0)
  }

  test("ndjson yields one feature per line") {
    val fs = features("new-line-delimited.ndgeojson")
    assert(fs.length == 5)
  }

  test("ids: string and number ok; boolean/array/object rejected") {
    assert(features("string-id.geojson").head.id.contains("feature-1"))
    assert(features("number-id.geojson").head.id.isDefined)
    Seq("boolean-id.geojson", "array-id.geojson", "object-id.geojson").foreach { f =>
      val e = intercept[Exception](features(f))
      assert(e.getMessage.contains("expected id to be a string or number"),
        s"$f: ${e.getMessage}")
    }
  }

  test("unknown keys (arrays/objects) are skipped") {
    assert(features("extra-array.geojson").length == 1)
    assert(features("extra-object.geojson").length == 1)
  }

  test("not-geojson and bad collections error") {
    val e = intercept[Exception](features("not-geojson.json"))
    assert(e.getMessage.contains("expected a FeatureCollection"))
    intercept[Exception](features("bad-collection.geojson"))
  }

  test("empty collection yields no features") {
    assert(features("empty-collection.geojson").isEmpty)
  }

  test("null geometry features parse") {
    val fs = features("null-geom.geojson")
    assert(fs.length == 2)
    assert(fs(1).geometry == null)
  }

  // ---- Spark read path ----

  test("read example.geojson infers sorted schema + geometry column") {
    val df = GeoJson.read(spark, s"$gj/example.geojson")
    assert(df.columns.toSeq ==
      Seq("continent", "gdp_md_est", "iso_a3", "name", "pop_est", "geometry"))
    assert(df.schema("gdp_md_est").dataType == DoubleType)
    assert(df.schema("geometry").dataType == BinaryType)
    assert(df.count() == 5)
    val tz = df.where(df("name") === "Tanzania").head
    val wkb = tz.getAs[Array[Byte]]("geometry")
    assert(GeoCodec.decodeWkb(wkb).getGeometryType == "Polygon")
  }

  test("read ndjson (distributed line path) matches collection read") {
    val nd = GeoJson.read(spark, s"$gj/new-line-delimited.ndgeojson")
    assert(nd.count() == 5)
    assert(nd.columns.contains("geometry"))
  }

  test("nested props become structs with sorted keys") {
    val df = GeoJson.read(spark, s"$gj/nested-props.geojson")
    val nested = df.schema("nested").dataType.asInstanceOf[StructType]
    assert(nested.fieldNames.toSeq == Seq("salad", "soup"))
    assert(df.select("nested.soup").collect().map(_.getString(0)).toSet ==
      Set("chicken", "tomato"))
  }

  test("repeated props become arrays") {
    val df = GeoJson.read(spark, s"$gj/repeated-props.geojson")
    assert(df.schema("numbers").dataType == ArrayType(DoubleType))
    assert(df.schema("strings").dataType == ArrayType(StringType))
  }

  test("sparse properties infer from later features and fill nulls") {
    val df = GeoJson.read(spark, s"$gj/sparse-properties.geojson")
    assert(df.columns.toSeq == Seq("first", "second", "third", "geometry"))
    assert(df.count() == 3)
    assert(df.where(df("second").isNull).count() == 2)
  }

  test("properties appearing within the min-features window join the schema") {
    // feature 1 is fully typed; feature 2 introduces a new property.
    // Locking the schema at the first ready feature would drop "b"
    // (reference buffers through MinFeatures, geojson.go:148-157).
    val dir = java.nio.file.Files.createTempDirectory("minbuf").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.ndjson"),
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[0,0]},"properties":{"a":1}}
        |{"type":"Feature","geometry":{"type":"Point","coordinates":[1,1]},"properties":{"a":2,"b":"x"}}
        |""".stripMargin)
    val df = GeoJson.read(spark, s"$dir/in.ndjson", minFeatures = 10)
    assert(df.columns.toSeq == Seq("a", "b", "geometry"))
    assert(df.where(df("b").isNotNull).count() == 1)
  }

  test("lang markers: CJK stopwords are countable (no \\b around non-ASCII)") {
    import graft.llm.TextStats
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val zh = Seq("我是的在和有了不").toDF("text")
    val c = zh.select(TextStats.stopwordCount(col("text"), TextStats.StopwordsZh)).head.getInt(0)
    assert(c == 8, s"expected all 8 zh markers counted, got $c")
    assert(zh.select(TextStats.langId(col("text"))).head.getString(0) == "zh")
  }

  test("mismatched types error instead of coercing") {
    val e = intercept[Exception] {
      GeoJson.read(spark, s"$gj/mismatched-types.geojson").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: messages(t.getCause)
    assert(messages(e).exists(_.contains("""expected "stringProperty" to be a string, got 42""")),
      s"got: ${messages(e)}")
  }

  test("write ndjson round-trips through the reader") {
    val dir = java.nio.file.Files.createTempDirectory("gj").toString
    val df = GeoJson.read(spark, s"$gj/example.geojson")
    GeoJson.writeNdjson(df, s"$dir/out.ndjson")
    // rename part files so the reader treats them as ndjson
    val files = new java.io.File(s"$dir/out.ndjson").listFiles()
      .filter(f => f.getName.startsWith("part-"))
    val renamed = files.zipWithIndex.map { case (f, i) =>
      val t = new java.io.File(f.getParent, s"p$i.ndjson"); f.renameTo(t); t
    }
    val back = GeoJson.read(spark, s"$dir/out.ndjson")
    assert(back.count() == 5)
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("write single FeatureCollection file round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("gj2").toString
    val df = GeoJson.read(spark, s"$gj/example.geojson")
    GeoJson.writeFeatureCollection(df, s"$dir/out.geojson")
    val back = GeoJson.read(spark, s"$dir/out.geojson")
    assert(back.count() == 5)
    val names = back.collect().map(_.getAs[String]("name")).toSet
    assert(names.contains("Fiji") && names.contains("Tanzania"))
  }
}

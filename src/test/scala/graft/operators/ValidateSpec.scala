package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.meta.FooterIO
import graft.sources.{GeoJson, GeoParquet}
import java.nio.file.{Files, Paths}

/** Replays the reference's 29 golden validator cases
  * (internal/validator/testdata/<case>/{input.json,expected.json};
  * validator_test.go:74-124): build a GeoParquet file from the case's
  * GeoJSON data, stamp the case's metadata verbatim into the footer, run the
  * validator, and compare each check's (title, run, passed) against the
  * expected report. Messages are engine-specific wording and are not
  * compared byte-for-byte.
  */
class ValidateSpec extends SparkSpec {

  val mapper = new ObjectMapper()
  val casesDir = "src/test/resources/validator"

  private def buildCase(name: String): String = {
    val input = mapper.readTree(
      Files.readString(Paths.get(s"$casesDir/$name/input.json")))
    val dataJson = input.get("data")
    val metadataNode = input.get("metadata")

    val dir = Files.createTempDirectory(s"vcase-$name").toString
    val geojsonPath = s"$dir/data.geojson"
    Files.writeString(Paths.get(geojsonPath), mapper.writeValueAsString(dataJson))
    val df = GeoJson.read(spark, geojsonPath)
    val out = s"$dir/case.parquet"
    // write WITHOUT stats/default metadata, then stamp the verbatim case metadata
    df.coalesce(1).write.parquet(out)
    FooterIO.dataFiles(out).foreach { f =>
      FooterIO.appendKeyValue(f, Map("geo" -> mapper.writeValueAsString(metadataNode)))
    }
    out
  }

  private def runCase(name: String): Unit = {
    val path = buildCase(name)
    val report = Validate.report(spark, path, metadataOnly = false)
    val expected = mapper.readTree(
      Files.readString(Paths.get(s"$casesDir/$name/expected.json")))
    val expChecks = expected.get("checks")
    assert(report.checks.length == expChecks.size(),
      s"$name: check count ${report.checks.length} vs ${expChecks.size()}")
    report.checks.zipWithIndex.foreach { case (c, i) =>
      val e = expChecks.get(i)
      assert(c.title == e.get("title").asText(),
        s"$name[$i]: title '${c.title}' vs '${e.get("title").asText()}'")
      assert(c.run == e.get("run").asBoolean(),
        s"$name[$i] '${c.title}': run ${c.run} vs ${e.get("run").asBoolean()} (msg=${c.message})")
      assert(c.passed == e.get("passed").asBoolean(),
        s"$name[$i] '${c.title}': passed ${c.passed} vs ${e.get("passed").asBoolean()} (msg=${c.message})")
      if (e.has("message")) {
        assert(c.message.contains(e.get("message").asText()),
          s"$name[$i] '${c.title}': message '${c.message.orNull}' vs '${e.get("message").asText()}'")
      }
    }
    assert(report.metadataOnly == expected.get("metadataOnly").asBoolean())
  }

  val allCases = Seq(
    "all-pass", "all-pass-minimal", "complex-types",
    "bad-metadata-type", "missing-version", "missing-primary-column",
    "missing-columns", "missing-encoding", "missing-geometry-types",
    "bad-primary-column", "bad-encoding", "bad-geometry-types",
    "bad-crs", "bad-crs-type", "bad-crs-schema", "bad-orientation", "bad-edges",
    "bad-bbox-type", "bad-bbox-item-type", "bad-bbox-length", "bad-epoch",
    "geometry-type-not-in-list", "geometry-correctly-oriented",
    "geometry-incorrectly-oriented", "geometry-outside-bbox",
    "geometry-inside-antimeridian-spanning-bbox",
    "geometry-outside-antimeridian-spanning-bbox",
    "with-empty-geometry", "with-null-geometry")

  allCases.foreach { name =>
    test(s"golden case: $name") { runCase(name) }
  }

  test("golden case: all-pass-meta (metadata-only)") {
    val path = buildCase("all-pass-meta")
    val report = Validate.report(spark, path, metadataOnly = true)
    val expected = mapper.readTree(
      Files.readString(Paths.get(s"$casesDir/all-pass-meta/expected.json")))
    assert(report.metadataOnly && expected.get("metadataOnly").asBoolean())
    assert(report.checks.length == expected.get("checks").size())
    assert(report.checks.forall(c => c.run && c.passed))
  }

  test("validate exit semantics: failed report") {
    val path = buildCase("geometry-outside-bbox")
    assert(Validate.report(spark, path).failed)
    val ok = buildCase("all-pass")
    assert(!Validate.report(spark, ok).failed)
  }
}

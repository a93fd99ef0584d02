package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec

class DescribeSpec extends SparkSpec {

  val mapper = new ObjectMapper()
  val cases = "src/test/resources/cases"

  test("describe v1.1.0 example") {
    val info = mapper.readTree(Describe.json(spark, s"$cases/example-v1.1.0.parquet"))
    assert(info.get("rows").asLong() == 5L)
    assert(info.get("groups").asLong() == 1L)
    assert(info.get("issues").size() == 0)
    assert(info.get("metadata").get("primary_column").asText() == "geometry")
    val fields = info.get("schema").get("fields")
    val byName = (0 until fields.size()).map(fields.get)
      .map(f => f.get("name").asText() -> f).toMap
    assert(byName("geometry").get("type").asText() == "binary")
    assert(byName("pop_est").get("type").asText() == "double")
    assert(byName("gdp_md_est").get("type").asText() == "int64")
    assert(byName("name").get("annotation").asText() == "string")
    assert(byName("bbox").get("annotation").asText() == "group")
    assert(byName("bbox").get("fields").size() == 4)
  }

  test("describe partitioned example counts 2 row groups") {
    val info = mapper.readTree(Describe.json(spark, s"$cases/example-v1.1.0-partitioned.parquet"))
    assert(info.get("rows").asLong() == 4L)
    assert(info.get("groups").asLong() == 2L)
  }

  test("describe plain parquet flags missing geo metadata") {
    val info = mapper.readTree(Describe.json(spark, s"$sf/lineitem.parquet"))
    assert(info.get("metadata").isNull)
    assert(info.get("issues").size() == 1)
    assert(info.get("issues").get(0).asText().contains("missing the \"geo\" metadata key"))
  }

  test("metadata-only returns the raw footer value") {
    val raw = Describe.metadataOnly(s"$cases/example-v1.1.0.parquet")
    assert(raw.contains("\"primary_column\""))
    intercept[IllegalArgumentException](Describe.metadataOnly(s"$sf/lineitem.parquet"))
  }

  test("compression is reported from row group 0") {
    val info = mapper.readTree(Describe.json(spark, s"$cases/example-v1.1.0.parquet"))
    val fields = info.get("schema").get("fields")
    val geom = (0 until fields.size()).map(fields.get)
      .find(_.get("name").asText() == "geometry").get
    assert(geom.has("compression"))
  }
}

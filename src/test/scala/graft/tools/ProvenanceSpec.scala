package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Artifact provenance stamps: the commit must be a real 40-hex hash when
  * running inside the repo, the timestamp a parseable UTC instant, and
  * the JSON fragment spliceable into an object literal.
  */
class ProvenanceSpec extends AnyFunSuite {

  test("commit is a 40-hex hash (or the explicit unknown sentinel)") {
    val c = Provenance.commit
    assert(c == "unknown" || c.matches("[0-9a-f]{40}"), c)
  }

  test("generatedAtUtc parses as an Instant") {
    val t = Provenance.generatedAtUtc
    assert(java.time.Instant.parse(t).toEpochMilli > 0)
  }

  test("jsonFields splices into a parseable object with non-empty values") {
    val json = s"{${Provenance.jsonFields}}"
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("_commit").asText().nonEmpty)
    assert(node.get("_generated_at_utc").asText().nonEmpty)
  }
}

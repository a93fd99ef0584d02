package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Minimal JSON-Schema (draft-07 subset) validator, sized to the PROJJSON
  * schemas the reference vendors and compiles (internal/validator/
  * rules.go:305-339; schemas from proj.org, spec data vendored under
  * src/main/resources/projjson/). Supported keywords — the complete set
  * those schemas use: `$ref` (internal pointers), `type`, `enum`,
  * `required`, `properties`, `additionalProperties`, `items`, `minimum`,
  * `maximum`, `allOf`, `anyOf`, `oneOf`, `not`.
  *
  * Error reporting mirrors the reference's jsonschema library closely
  * enough that `simplifiedMessage` (descend the first cause chain to its
  * leaf — rules.go:293-304) reproduces the reference's report text for the
  * golden cases.
  */
object JsonSchema {

  /** A validation error: JSON-pointer location of the failing instance
    * node, a keyword message, and nested causes (subschema failures).
    */
  final case class Err(location: String, message: String, causes: Seq[Err] = Nil)

  private val mapper = new ObjectMapper()

  private val urlToResource: Map[String, String] = Map(
    "https://proj.org/schemas/v0.4/projjson.schema.json" -> "/projjson/v0.4.projjson.schema.json",
    "https://proj.org/schemas/v0.5/projjson.schema.json" -> "/projjson/v0.5.projjson.schema.json",
    "https://proj.org/schemas/v0.6/projjson.schema.json" -> "/projjson/v0.6.projjson.schema.json")

  /** Compile a schema by its canonical URL (resolved against the vendored
    * copies — offline, like the reference's test loader swap,
    * validator_test.go:44-55). Unknown URLs fail to compile.
    */
  def compile(url: String): JsonSchema = {
    val res = urlToResource.getOrElse(url,
      throw new IllegalArgumentException(s"no vendored schema for $url"))
    val in = getClass.getResourceAsStream(res)
    require(in != null, s"missing schema resource $res")
    try new JsonSchema(mapper.readTree(in)) finally in.close()
  }

  /** The reference's simplified message: walk the first-cause chain to its
    * leaf, report `<location> is invalid: <message>` with "" → "input".
    */
  def simplifiedMessage(err: Err): String = {
    var leaf = err
    while (leaf.causes.nonEmpty) leaf = leaf.causes.head
    val location = if (leaf.location.isEmpty) "input" else leaf.location
    s"$location is invalid: ${leaf.message}"
  }
}

final class JsonSchema private[meta] (root: JsonNode) {
  import JsonSchema.Err

  /** None when valid; the top-level error (with cause tree) otherwise. */
  def validate(instance: JsonNode): Option[Err] =
    check(root, instance, "") match {
      case Nil => None
      case errs => Some(errs.head)
    }

  private def resolveRef(ref: String): JsonNode = {
    require(ref.startsWith("#/"), s"unsupported external $$ref: $ref")
    ref.drop(2).split('/').foldLeft(root) { (n, part) =>
      val key = part.replace("~1", "/").replace("~0", "~")
      val next = n.get(key)
      require(next != null, s"dangling $$ref: $ref")
      next
    }
  }

  private def typeName(n: JsonNode): String =
    if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isBoolean) "boolean"
    else if (n.isNull) "null"
    else if (n.isIntegralNumber) "integer"
    else "number"

  private def typeMatches(want: String, n: JsonNode): Boolean = want match {
    case "number"  => n.isNumber
    case "integer" => n.isIntegralNumber || (n.isNumber && n.asDouble().isWhole)
    case other     => typeName(n) == other
  }

  /** Errors in evaluation order: type, enum, required, properties,
    * additionalProperties, items, bounds, then the combinators — the same
    * ordering that makes the first-cause leaf match the reference's
    * simplified messages.
    */
  private def check(schema: JsonNode, inst: JsonNode, loc: String): List[Err] = {
    if (schema.isBoolean)
      return if (schema.asBoolean) Nil else List(Err(loc, "schema is always invalid"))
    if (!schema.isObject) return Nil

    // draft-07: $ref replaces its siblings
    val refNode = schema.get("$ref")
    if (refNode != null) return check(resolveRef(refNode.asText()), inst, loc)

    val errs = List.newBuilder[Err]

    Option(schema.get("type")).foreach { t =>
      val wants = if (t.isArray) t.elements().asScala.map(_.asText()).toSeq
                  else Seq(t.asText())
      if (!wants.exists(typeMatches(_, inst)))
        errs += Err(loc, s"expected ${wants.mkString(" or ")}, but got ${typeName(inst)}")
    }

    Option(schema.get("enum")).foreach { e =>
      val values = e.elements().asScala.toSeq
      if (!values.exists(_.equals(inst))) {
        val rendered = values.map(_.toString)
        val msg =
          if (rendered.length == 1) s"value must be ${rendered.head}"
          else s"value must be one of ${rendered.mkString(", ")}"
        errs += Err(loc, msg)
      }
    }

    if (inst.isObject) {
      Option(schema.get("required")).foreach { req =>
        val missing = req.elements().asScala.map(_.asText()).filter(f => !inst.has(f)).toSeq
        if (missing.nonEmpty)
          errs += Err(loc, s"missing properties: ${missing.map(m => s"'$m'").mkString(", ")}")
      }
      val props = Option(schema.get("properties"))
      props.foreach { p =>
        p.properties().asScala.foreach { entry =>
          val name = entry.getKey
          if (inst.has(name))
            errs ++= check(entry.getValue, inst.get(name), s"$loc/$name")
        }
      }
      Option(schema.get("additionalProperties")).foreach { ap =>
        val declared = props.map(_.fieldNames().asScala.toSet).getOrElse(Set.empty)
        val extra = inst.fieldNames().asScala.filterNot(declared).toSeq
        if (ap.isBoolean && !ap.asBoolean) {
          if (extra.nonEmpty)
            errs += Err(loc,
              s"additionalProperties ${extra.map(e => s"'$e'").mkString(", ")} not allowed")
        } else if (ap.isObject) {
          extra.foreach(name => errs ++= check(ap, inst.get(name), s"$loc/$name"))
        }
      }
    }

    if (inst.isArray) {
      Option(schema.get("items")).foreach { itemSchema =>
        if (itemSchema.isObject || itemSchema.isBoolean) {
          var i = 0
          inst.elements().asScala.foreach { el =>
            errs ++= check(itemSchema, el, s"$loc/$i")
            i += 1
          }
        }
      }
    }

    if (inst.isNumber) {
      Option(schema.get("minimum")).foreach { m =>
        if (inst.asDouble() < m.asDouble())
          errs += Err(loc, s"must be >= ${m.asText()} but found ${inst.asText()}")
      }
      Option(schema.get("maximum")).foreach { m =>
        if (inst.asDouble() > m.asDouble())
          errs += Err(loc, s"must be <= ${m.asText()} but found ${inst.asText()}")
      }
    }

    Option(schema.get("allOf")).foreach { all =>
      all.elements().asScala.zipWithIndex.foreach { case (sub, i) =>
        val subErrs = check(sub, inst, loc)
        if (subErrs.nonEmpty)
          errs += Err(loc, s"allOf failed at index $i", subErrs)
      }
    }

    Option(schema.get("anyOf")).foreach { any =>
      val branches = any.elements().asScala.toSeq.map(sub => check(sub, inst, loc))
      if (!branches.exists(_.isEmpty))
        errs += Err(loc, "anyOf failed", branches.flatten)
    }

    Option(schema.get("oneOf")).foreach { one =>
      val branches = one.elements().asScala.toSeq.map(sub => check(sub, inst, loc))
      val valid = branches.zipWithIndex.filter(_._1.isEmpty).map(_._2)
      if (valid.isEmpty)
        errs += Err(loc, "oneOf failed", branches.flatten)
      else if (valid.length > 1)
        errs += Err(loc, s"valid against schemas at indexes ${valid.mkString(" and ")}")
    }

    Option(schema.get("not")).foreach { sub =>
      if (check(sub, inst, loc).isEmpty) errs += Err(loc, "not failed")
    }

    errs.result()
  }
}

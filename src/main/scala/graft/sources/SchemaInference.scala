package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** GeoJSON property schema inference + JSON→Row conversion, mirroring the
  * reference's ArrowSchemaBuilder (internal/pqutil/arrow.go:42-188) and
  * FeatureWriter type checks (internal/geoparquet/featurewriter.go:115-201).
  *
  * GeoJSON numbers are always inferred as double (the reference decodes Go
  * JSON numbers to float64); nulls, empty arrays, and empty objects defer
  * typing until a later feature supplies a value; list element types must be
  * uniform; nested objects become structs with name-sorted fields; type
  * mismatches at row-build time are errors, never coercions.
  */
object SchemaInference {

  /** Incremental schema builder; `None` field value = type not yet known. */
  final class Builder {
    private val fields = scala.collection.mutable.LinkedHashMap.empty[String, Option[DataType]]

    def add(props: ObjectNode): Unit = {
      if (props == null) return
      props.fields().asScala.foreach { e =>
        val name = e.getKey
        if (!fields.get(name).exists(_.isDefined)) {
          fields(name) = typeOf(e.getValue)
        }
      }
    }

    def ready: Boolean = fields.nonEmpty && fields.values.forall(_.isDefined)

    /** Name-sorted property fields (arrow.go:167-188). */
    def schema(): StructType = {
      val undecided = fields.collect { case (n, None) => n }
      if (undecided.nonEmpty)
        throw new IllegalArgumentException(
          s"could not derive type for field: ${undecided.head}")
      StructType(fields.toSeq.sortBy(_._1).map { case (n, t) =>
        StructField(n, t.get, nullable = true)
      })
    }

    def observedFieldCount: Int = fields.size
  }

  /** Infer one value's Spark type; None = deferred (arrow.go:67-120). */
  def typeOf(node: JsonNode): Option[DataType] = node match {
    case n if n == null || n.isNull => None
    case n if n.isBoolean => Some(BooleanType)
    case n if n.isNumber => Some(DoubleType)
    case n if n.isTextual => Some(StringType)
    case n if n.isArray =>
      if (n.size() == 0) None
      else {
        assertUniform(n)
        typeOf(n.get(0)).map(ArrayType(_, containsNull = true))
      }
    case n if n.isObject =>
      if (n.size() == 0) None
      else {
        val kids = n.fields().asScala.toSeq.sortBy(_.getKey)
        val types = kids.map(e => typeOf(e.getValue))
        if (types.exists(_.isEmpty)) None
        else Some(StructType(kids.zip(types).map { case (e, t) =>
          StructField(e.getKey, t.get, nullable = true)
        }))
      }
    case other =>
      throw new IllegalArgumentException(s"cannot convert value: $other")
  }

  private def assertUniform(arr: JsonNode): Unit = {
    def kind(n: JsonNode): String =
      if (n.isBoolean) "bool" else if (n.isNumber) "number"
      else if (n.isTextual) "string" else if (n.isArray) "array"
      else if (n.isObject) "object" else "null"
    val k = kind(arr.get(0))
    (1 until arr.size()).foreach { i =>
      if (kind(arr.get(i)) != k)
        throw new IllegalArgumentException("slices must be of all the same type")
    }
  }

  /** Convert one properties object into Row values for `schema`, erroring on
    * type mismatches with the reference's message shape
    * (featurewriter.go:115-201; geojson_test.go:144-151).
    */
  def toRowValues(props: ObjectNode, schema: StructType): Array[Any] =
    schema.fields.map { f =>
      val v = if (props == null) null else props.get(f.name)
      convert(v, f.dataType, f.name)
    }

  def convert(node: JsonNode, dt: DataType, name: String): Any = {
    if (node == null || node.isNull) return null
    dt match {
      case BooleanType =>
        if (!node.isBoolean) mismatch(name, "boolean", node) else node.asBoolean()
      case DoubleType =>
        if (!node.isNumber) mismatch(name, "number", node) else node.asDouble()
      case StringType =>
        if (!node.isTextual) mismatch(name, "string", node) else node.asText()
      case ArrayType(elem, _) =>
        if (!node.isArray) mismatch(name, "list", node)
        else (0 until node.size()).map(i => convert(node.get(i), elem, name))
      case st: StructType =>
        if (!node.isObject) mismatch(name, "object", node)
        else Row.fromSeq(st.fields.toSeq.map(f => convert(node.get(f.name), f.dataType, f.name)))
      case other =>
        throw new IllegalArgumentException(s"unsupported type $other for $name")
    }
  }

  private def mismatch(name: String, expected: String, node: JsonNode): Nothing =
    throw new IllegalArgumentException(
      s"""expected "$name" to be a $expected, got $node""")
}

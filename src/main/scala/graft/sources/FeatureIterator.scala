package graft.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.geo.GeoJsonCodec
import org.locationtech.jts.geom.Geometry

/** One parsed GeoJSON feature: optional id (string or number only),
  * nullable geometry, nullable properties object.
  */
final case class RawFeature(id: Option[Any], geometry: Geometry, properties: ObjectNode)

/** Incremental token-level GeoJSON feature reader (reference
  * internal/geojson/featurereader.go:25-276).
  *
  * Accepts a FeatureCollection, a single Feature, a bare Geometry (with
  * `type`/`coordinates` in any key order), a GeometryCollection, and
  * newline-delimited sequences of Features; skips unknown keys (including
  * nested objects/arrays); rejects non-string/number ids and duplicate
  * geometry/properties/type keys. Token-streaming: memory is bounded by one
  * feature, not the file.
  */
final class FeatureIterator(parser: JsonParser)
    extends Iterator[RawFeature] with AutoCloseable {

  def this(reader: java.io.Reader) =
    this(new JsonFactory(FeatureIterator.mapper).createParser(reader))
  def this(text: String) =
    this(new JsonFactory(FeatureIterator.mapper).createParser(text))

  import FeatureIterator._

  // states
  private var inFeatures = false // consuming a features array
  private var finished = false   // a non-resumable value was consumed
  private var pending: RawFeature = _
  private var hasPending = false

  override def hasNext: Boolean = {
    if (!hasPending && !finished) advance()
    hasPending
  }

  override def next(): RawFeature = {
    if (!hasNext) throw new NoSuchElementException("no more features")
    hasPending = false
    pending
  }

  override def close(): Unit = parser.close()

  private def advance(): Unit =
    if (inFeatures) advanceInFeatures() else advanceTopLevel()

  private def advanceInFeatures(): Unit = {
    val t = parser.nextToken()
    if (t == JsonToken.END_ARRAY) { finished = true; return }
    if (t == null) { finished = true; return }
    require(t == JsonToken.START_OBJECT, s"expected a feature object, got $t")
    emit(featureFromNode(mapper.readTree[JsonNode](parser)))
  }

  private def emit(f: RawFeature): Unit = { pending = f; hasPending = true }

  /** Mirror of the reference's top-level token loop
    * (featurereader.go:25-205).
    */
  private def advanceTopLevel(): Unit = {
    val start = parser.nextToken()
    if (start == null) { finished = true; return }
    require(start == JsonToken.START_OBJECT, s"expected a JSON object, got $start")

    var parsedType: String = null
    var geom: Geometry = null
    var geomSet = false
    var props: ObjectNode = null
    var propsSet = false
    var id: Option[Any] = None
    var idSet = false
    var coords: JsonNode = null
    var isFeature = false

    while (true) {
      val kt = parser.nextToken()
      if (kt == null) {
        if (!isFeature) { finished = true; return }
        emit(RawFeature(id, geom, props)); finished = true; return
      }
      if (kt == JsonToken.END_OBJECT) {
        // complete top-level object; further values → NDJSON mode
        if (!isFeature)
          throw new IllegalArgumentException(
            "expected a FeatureCollection, a Feature, or a Geometry object")
        emit(RawFeature(id, geom, props))
        return
      }
      val key = parser.currentName()
      parser.nextToken() // move to the value
      key match {
        case "geometry" =>
          require(!geomSet, "found duplicate geometry")
          isFeature = true; geomSet = true
          val n = mapper.readTree[JsonNode](parser)
          geom = if (n == null || n.isNull) null else GeoJsonCodec.fromNode(n)
        case "properties" =>
          require(!propsSet, "found duplicate properties")
          isFeature = true; propsSet = true
          val n = mapper.readTree[JsonNode](parser)
          props = if (n == null || n.isNull) null else {
            require(n.isObject, "expected properties to be an object")
            n.asInstanceOf[ObjectNode]
          }
        case "coordinates" =>
          require(coords == null, "found duplicate coordinates")
          require(!geomSet, "found unexpected coordinates")
          isFeature = true
          coords = mapper.readTree[JsonNode](parser)
          if (parsedType != null) { emitFromCoordinates(parsedType, coords); finished = true; return }
        case "type" =>
          require(parsedType == null, "found duplicate type")
          require(parser.currentToken() == JsonToken.VALUE_STRING,
            s"unexpected type: ${parser.getText}")
          parsedType = parser.getText
          if (coords != null) { emitFromCoordinates(parsedType, coords); finished = true; return }
        case "features" =>
          require(parsedType == null || parsedType == "FeatureCollection",
            s"""found features in unexpected "$parsedType" type""")
          require(parser.currentToken() == JsonToken.START_ARRAY,
            "expected an array of features")
          inFeatures = true
          advanceInFeatures()
          return
        case "geometries" =>
          require(parsedType == null || parsedType == "GeometryCollection",
            s"""found geometries in unexpected "$parsedType" type""")
          require(parser.currentToken() == JsonToken.START_ARRAY,
            "expected an array of geometries")
          emitGeometryCollection()
          finished = true
          return
        case "id" =>
          require(!idSet, "found duplicate id")
          isFeature = true; idSet = true
          val t = parser.currentToken()
          id = t match {
            case JsonToken.VALUE_STRING => Some(parser.getText)
            case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
              Some(parser.getDoubleValue)
            case other =>
              throw new IllegalArgumentException(
                s"expected id to be a string or number, got: ${parser.getText}")
          }
        case _ =>
          // skip unknown values, including whole nested objects/arrays
          val t = parser.currentToken()
          if (t == JsonToken.START_ARRAY || t == JsonToken.START_OBJECT)
            parser.skipChildren()
      }
    }
  }

  private def emitFromCoordinates(geometryType: String, coords: JsonNode): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", geometryType)
    node.set[JsonNode]("coordinates", coords)
    emit(RawFeature(None, GeoJsonCodec.fromNode(node), mapper.createObjectNode()))
  }

  private def emitGeometryCollection(): Unit = {
    val geoms = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    var t = parser.nextToken()
    while (t != JsonToken.END_ARRAY && t != null) {
      require(t == JsonToken.START_OBJECT, "expected a geometry object")
      geoms += GeoJsonCodec.fromNode(mapper.readTree[JsonNode](parser))
      t = parser.nextToken()
    }
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    emit(RawFeature(None, gf.createGeometryCollection(geoms.toArray),
      mapper.createObjectNode()))
  }

  private def featureFromNode(node: JsonNode): RawFeature = {
    require(node.isObject, "expected a feature object")
    val id = Option(node.get("id")).filterNot(_.isNull).map { n =>
      if (n.isTextual) n.asText()
      else if (n.isNumber) n.asDouble()
      else throw new IllegalArgumentException(
        s"expected id to be a string or number, got: $n")
    }
    val geom = Option(node.get("geometry")).filterNot(_.isNull)
      .map(GeoJsonCodec.fromNode).orNull
    val props = Option(node.get("properties")).filterNot(_.isNull).map { p =>
      require(p.isObject, "expected properties to be an object")
      p.asInstanceOf[ObjectNode]
    }.orNull
    RawFeature(id, geom, props)
  }
}

object FeatureIterator {
  private[sources] val mapper = new ObjectMapper()
}

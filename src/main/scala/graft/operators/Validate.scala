package graft.operators

import com.fasterxml.jackson.databind.JsonNode
import graft.geo.{Bbox, GeoCodec}
import graft.meta.{FooterIO, GeoMetadata}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import scala.jdk.CollectionConverters._

/** The 20-rule GeoParquet spec validator (SURVEY.md §3.3,
  * internal/validator/validator.go + rules.go).
  *
  * Phases mirror the reference's typed rule groups: file rules, raw
  * metadata rules, column metadata rules, schema rules, then the four
  * data-scanning rules. The data scan is ONE distributed pass computing the
  * first violation per rule via conditional aggregation — the Spark
  * equivalent of the reference's sticky-failure accumulators
  * (rules.go:86-112) — so validation cost is a single scan regardless of
  * how many rules run, and `--metadata-only` reads no data pages at all.
  */
object Validate {

  final class Check(val title: String) {
    var run: Boolean = false
    var passed: Boolean = false
    var message: Option[String] = None
  }

  final class Report(val checks: Seq[Check], val metadataOnly: Boolean) {
    def failed: Boolean = checks.exists(c => c.run && !c.passed)
    def toJson: String = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      val arr = root.putArray("checks")
      checks.foreach { c =>
        val n = arr.addObject()
        n.put("title", c.title)
        n.put("run", c.run)
        n.put("passed", c.passed)
        c.message.foreach(n.put("message", _))
      }
      root.put("metadataOnly", metadataOnly)
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    }
  }

  private case class Fatal(message: String) extends Exception(message)
  private def fatal(msg: String): Nothing = throw Fatal(msg)
  private def q(s: String): String = "\"" + s + "\""

  private def jsonType(n: JsonNode): String =
    if (n.isBoolean) "boolean" else if (n.isNumber) "number"
    else if (n.isTextual) "string" else if (n.isObject) "object"
    else if (n.isArray) "list" else if (n.isNull) "null" else n.getNodeType.toString

  val titles: Seq[String] = Seq(
    s"""file must include a ${q(GeoMetadata.MetadataKey)} metadata key""",
    "metadata must be a JSON object",
    """metadata must include a "version" string""",
    """metadata must include a "primary_column" string""",
    """metadata must include a "columns" object""",
    """column metadata must include the "primary_column" name""",
    """column metadata must include a valid "encoding" string""",
    """column metadata must include a "geometry_types" list""",
    """optional "crs" must be null or a PROJJSON object""",
    """optional "orientation" must be a valid string""",
    """optional "edges" must be a valid string""",
    """optional "bbox" must be an array of 4 or 6 numbers""",
    """optional "epoch" must be a number""",
    "geometry columns must not be grouped",
    "geometry columns must be stored using the BYTE_ARRAY parquet type",
    "geometry columns must be required or optional, not repeated",
    """all geometry values match the "encoding" metadata""",
    """all geometry types must be included in the "geometry_types" metadata (if not empty)""",
    """all polygon geometries must follow the "orientation" metadata (if present)""",
    """all geometries must fall within the "bbox" metadata (if present)""")

  // indices of the rule groups, in the reference's execution order
  private val fileRules = Seq(0, 1)
  private val metadataRules = Seq(2, 3, 4)
  private val columnRules = Seq(6, 7, 8, 9, 10, 11, 12)
  private val fileInfoRules = Seq(5, 13, 14, 15)
  private val dataRules = Seq(16, 17, 18, 19)

  def report(spark: SparkSession, path: String, metadataOnly: Boolean = false): Report = {
    val nRules = if (metadataOnly) 16 else 20
    val checks = titles.take(nRules).map(new Check(_))
    val rep = new Report(checks, metadataOnly)

    def group(indices: Seq[Int])(rule: Int => Unit): Boolean = {
      // returns false if a fatal error stopped the report
      var ok = true
      val it = indices.iterator
      while (ok && it.hasNext) {
        val i = it.next()
        val c = checks(i)
        c.run = true
        try { rule(i); c.passed = true }
        catch {
          case Fatal(m) => c.message = Some(m); ok = false
          case e: Exception => c.message = Some(e.getMessage)
        }
      }
      ok
    }

    val kv = FooterIO.keyValueMetadata(path)
    val rawGeo: Option[String] = kv.get(GeoMetadata.MetadataKey)

    // --- file rules ---
    var meta: GeoMetadata = null
    val okFile = group(fileRules) {
      case 0 =>
        if (rawGeo.isEmpty) fatal(s"missing ${q(GeoMetadata.MetadataKey)} metadata key")
      case 1 =>
        try meta = GeoMetadata.parse(rawGeo.get)
        catch { case _: Exception => fatal("failed to parse file metadata as a JSON object") }
        if (!meta.raw.isObject) fatal("failed to parse file metadata as a JSON object")
    }
    if (!okFile) return rep

    val root = meta.raw

    // --- raw metadata rules ---
    val okMeta = group(metadataRules) {
      case 2 =>
        val v = root.get("version")
        if (v == null) throw new Exception("""missing "version" in metadata""")
        if (!v.isTextual) throw new Exception(s"""expected "version" to be a string, got $v""")
        if (v.asText().isEmpty) throw new Exception("""expected "version" to be a non-empty string""")
      case 3 =>
        val v = root.get("primary_column")
        if (v == null) throw new Exception("""missing "primary_column" in metadata""")
        if (!v.isTextual) throw new Exception(s"""expected "primary_column" to be a string, got $v""")
      case 4 =>
        val v = root.get("columns")
        if (v == null) fatal("""missing "columns" in metadata""")
        if (!v.isObject) fatal(s"""expected "columns" to be an object, got $v""")
        v.properties().asScala.foreach { e =>
          if (!e.getValue.isObject)
            fatal(s"""expected column ${q(e.getKey)} to be an object, got ${e.getValue}""")
        }
    }
    if (!okMeta) return rep

    val columns: Seq[(String, JsonNode)] =
      root.get("columns").properties().asScala.map(e => e.getKey -> e.getValue).toSeq

    // --- column metadata rules ---
    val okCols = group(columnRules) {
      case 6 => columns.foreach { case (name, col) =>
        val v = col.get("encoding")
        if (v == null) throw new Exception(s"""missing "encoding" for column ${q(name)}""")
        if (!v.isTextual) throw new Exception(
          s"""expected "encoding" for column ${q(name)} to be a string, got $v""")
        if (v.asText() != GeoMetadata.DefaultGeometryEncoding) throw new Exception(
          s"unsupported encoding ${q(v.asText())} for column ${q(name)}")
      }
      case 7 => columns.foreach { case (name, col) =>
        val v = col.get("geometry_types")
        if (v == null) throw new Exception(s"""missing "geometry_types" for column ${q(name)}""")
        if (!v.isArray) throw new Exception(
          s"""expected "geometry_types" for column ${q(name)} to be a list, got $v""")
        v.elements().asScala.foreach { t =>
          if (!t.isTextual) throw new Exception(
            s"""expected "geometry_types" for column ${q(name)} to be a list of strings, got $v""")
          if (!GeoMetadata.GeometryTypes.contains(t.asText())) throw new Exception(
            s"unsupported geometry type ${q(t.asText())} for column ${q(name)}")
        }
      }
      case 8 => columns.foreach { case (name, col) =>
        val v = col.get("crs")
        if (v != null && !v.isNull) {
          if (!v.isObject) fatal(
            s"""expected "crs" for column ${q(name)} to be an object, got a ${jsonType(v)}: $v""")
          validateProjJson(v)
        }
      }
      case 9 => columns.foreach { case (name, col) =>
        val v = col.get("orientation")
        if (v != null) {
          if (!v.isTextual) fatal(
            s"""expected "orientation" for column ${q(name)} to be a string, got a ${jsonType(v)}: $v""")
          if (v.asText() != GeoMetadata.OrientationCounterClockwise) throw new Exception(
            s"unsupported orientation ${q(v.asText())} for column ${q(name)}, expected ${q(GeoMetadata.OrientationCounterClockwise)}")
        }
      }
      case 10 => columns.foreach { case (name, col) =>
        val v = col.get("edges")
        if (v != null) {
          if (!v.isTextual) fatal(
            s"""expected "edges" for column ${q(name)} to be a string, got a ${jsonType(v)}: $v""")
          if (v.asText() != GeoMetadata.EdgesPlanar && v.asText() != GeoMetadata.EdgesSpherical)
            throw new Exception(
              s"unsupported edges ${q(v.asText())} for column ${q(name)}, expected ${q(GeoMetadata.EdgesPlanar)} or ${q(GeoMetadata.EdgesSpherical)}")
        }
      }
      case 11 => columns.foreach { case (name, col) =>
        val v = col.get("bbox")
        if (v != null) {
          if (!v.isArray) fatal(
            s"""expected "bbox" for column ${q(name)} to be a list, got a ${jsonType(v)}: $v""")
          if (v.size() != 4 && v.size() != 6) throw new Exception(
            s"""expected "bbox" for column ${q(name)} to be a list of 4 or 6 numbers, got $v""")
          v.elements().asScala.foreach { e =>
            if (!e.isNumber) fatal(
              s"""expected "bbox" for column ${q(name)} to be a list of numbers, got $v""")
          }
        }
      }
      case 12 => columns.foreach { case (name, col) =>
        val v = col.get("epoch")
        if (v != null && !v.isNumber) fatal(
          s"""expected "epoch" for column ${q(name)} to be a number, got a ${jsonType(v)}: $v""")
      }
    }
    if (!okCols) return rep

    // --- schema (FileInfo) rules ---
    val files = FooterIO.dataFiles(path)
    val schemaRoot = FooterIO.readFooter(files.head).getFileMetaData.getSchema
    def field(name: String): Option[org.apache.parquet.schema.Type] =
      if (schemaRoot.containsField(name))
        Some(schemaRoot.getFields.get(schemaRoot.getFieldIndex(name)))
      else None

    val okInfo = group(fileInfoRules) {
      case 5 =>
        // the literal value: a missing primary_column is "" here, like the
        // reference's Go zero value (rules.go:432-444), not the default
        val primaryLiteral = Option(root.get("primary_column"))
          .filter(_.isTextual).map(_.asText()).getOrElse("")
        if (!columns.exists(_._1 == primaryLiteral)) throw new Exception(
          s"the ${q(primaryLiteral)} column is not included in the column metadata")
      case 13 => columns.foreach { case (name, _) =>
        val f = field(name).getOrElse(fatal(s"missing geometry column ${q(name)}"))
        if (!f.isPrimitive) throw new Exception(s"column ${q(name)} must not be a group")
      }
      case 14 => columns.foreach { case (name, _) =>
        val f = field(name).getOrElse(fatal(s"missing geometry column ${q(name)}"))
        if (!f.isPrimitive) fatal(s"expected primitive column for ${q(name)}")
        val pt = f.asPrimitiveType().getPrimitiveTypeName
        if (pt != org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BINARY)
          fatal(s"unexpected type for column ${q(name)}, got $pt")
      }
      case 15 => columns.foreach { case (name, _) =>
        val f = field(name).getOrElse(fatal(s"missing geometry column ${q(name)}"))
        if (f.isRepetition(org.apache.parquet.schema.Type.Repetition.REPEATED))
          throw new Exception(s"column ${q(name)} must not be repeated")
      }
    }
    if (!okInfo || metadataOnly) return rep

    // --- data-scanning rules: one distributed pass ---
    runDataRules(spark, path, meta, checks)
    rep
  }

  /** Full PROJJSON validation against the vendored proj.org JSON schemas
    * (the reference compiles the same schemas, rules.go:305-339; the
    * simplified first-cause-leaf message mirrors rules.go:293-304).
    */
  private def validateProjJson(crs: JsonNode): Unit = {
    val schemaUrl = Option(crs.get("$schema")).filter(_.isTextual).map(_.asText())
      .getOrElse("https://proj.org/schemas/v0.6/projjson.schema.json")
    val schema =
      try graft.meta.JsonSchema.compile(schemaUrl)
      catch {
        case e: Exception =>
          throw new Exception(s"failed to compile PROJJSON schema: ${e.getMessage}")
      }
    schema.validate(crs).foreach { err =>
      throw new Exception(s"validation failed against $schemaUrl: " +
        graft.meta.JsonSchema.simplifiedMessage(err))
    }
  }

  /** Per-row rule evaluation + first-violation aggregation. Returns errors
    * indexed by data-rule offset (0=encoding fatal, 1=types, 2=orientation,
    * 3=bounds).
    */
  private def runDataRules(spark: SparkSession, path: String,
                           meta: GeoMetadata, checks: Seq[Check]): Unit = {
    val df = spark.read.parquet(path)
    val geomCols = meta.columnNames.filter(df.columns.contains)
    if (geomCols.isEmpty) return

    var fatalEncoding: Option[String] = None
    val firstErrors = Array.ofDim[String](4)

    // ONE scan for ALL geometry columns (the reference validates every
    // column in its single pass, validator.go; a scan per column would pay
    // N reads on multi-geometry files): every column contributes its own
    // 4-slot error array, and one aggregate computes min_by(rid)
    // independently for each (column, rule) slot — per-RULE first
    // violation, since rules violate on different rows and a single
    // first-violating-row read would mask later rules.
    val frame = dataRulesFrame(df, meta, geomCols)
    val row = frame.head()
    geomCols.indices.foreach { ci =>
      (0 until 4).foreach { i =>
        val idx = ci * 4 + i
        if (!row.isNullAt(idx)) {
          val e = row.getString(idx)
          if (i == 0 && fatalEncoding.isEmpty) fatalEncoding = Some(e)
          if (firstErrors(i) == null) firstErrors(i) = e
        }
      }
    }

    fatalEncoding match {
      case Some(msg) =>
        // encoding failures are fatal: the encoding check reports, the
        // decoded-geometry checks stay un-run (validator.go:229-249)
        val c = checks(16); c.run = true; c.message = Some(msg)
      case None =>
        (0 until 4).foreach { i =>
          val c = checks(16 + i)
          c.run = true
          if (firstErrors(i) == null) c.passed = true
          else c.message = Some(firstErrors(i))
        }
    }
  }

  /** The single-scan data-rule aggregate: one row, 4×|geomCols| string
    * slots ordered (col0 rule0..3, col1 rule0..3, …). Package-visible so
    * the spec can assert the plan contains exactly one scan.
    */
  private[graft] def dataRulesFrame(df: org.apache.spark.sql.DataFrame,
      meta: GeoMetadata,
      geomCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val withId = df.select(geomCols.map(col): _*)
      .withColumn("_rid", monotonically_increasing_id())
    val withErrs = geomCols.zipWithIndex.foldLeft(withId) { case (d, (name, ci)) =>
      val colMeta = meta.column(name).get
      val encoding = colMeta.encoding
      val types = colMeta.geometryTypes.getOrElse(Nil)
      val orientation = colMeta.orientation
      val bounds = colMeta.bounds.getOrElse(Nil)
      val errCol =
        if (df.schema(name).dataType == BinaryType) {
          val u = udf((value: Array[Byte]) =>
            rowErrors(value, encoding, types, orientation, bounds, name))
          u(col(name).cast(BinaryType))
        } else {
          val u = udf((value: String) =>
            rowErrors(value, encoding, types, orientation, bounds, name))
          u(col(name).cast(StringType))
        }
      d.withColumn(s"_errs_$ci", errCol)
    }
    val anyError = geomCols.indices
      .map(ci => exists(col(s"_errs_$ci"), e => e.isNotNull))
      .reduce(_ || _)
    val aggs = for { ci <- geomCols.indices; i <- 0 until 4 } yield
      min_by(col(s"_errs_$ci").getItem(i),
        when(col(s"_errs_$ci").getItem(i).isNotNull, col("_rid"))
          .otherwise(lit(Long.MaxValue))).as(s"e${ci}_$i")
    withErrs.where(anyError).agg(aggs.head, aggs.tail: _*)
  }

  /** The four data rules evaluated on one geometry value
    * (rules.go:520-670). Array slots are null when the rule passes.
    */
  def rowErrors(value: Any, encoding: String, geometryTypes: Seq[String],
                orientation: Option[String], bounds: Seq[Double],
                name: String): Array[String] = {
    val errs = Array.ofDim[String](4)
    val geom =
      try GeoCodec.decode(value, encoding)
      catch { case e: Exception =>
        errs(0) = s"invalid geometry in column ${q(name)}: ${e.getMessage}"
        return errs
      }
    if (geom == null) return errs

    // geometry_types (Z-insensitive actual name, rules.go:538-566)
    if (geometryTypes.nonEmpty) {
      val actual = geom.getGeometryType
      if (!geometryTypes.contains(actual) && !geometryTypes.contains(actual + " Z"))
        errs(1) = s"unexpected geometry type ${q(actual)} for column ${q(name)}"
    }

    // orientation (rules.go:568-607)
    orientation.foreach { o =>
      if (o != GeoMetadata.OrientationCounterClockwise)
        errs(2) = s"unsupported orientation ${q(o)} for column ${q(name)}"
      else geom match {
        case p: org.locationtech.jts.geom.Polygon if !p.isEmpty =>
          if (!org.locationtech.jts.algorithm.Orientation.isCCW(
              p.getExteriorRing.getCoordinateSequence))
            errs(2) = s"invalid orientation for exterior ring in column ${q(name)}"
          else {
            val badInterior = (0 until p.getNumInteriorRing).exists { i =>
              org.locationtech.jts.algorithm.Orientation.isCCW(
                p.getInteriorRingN(i).getCoordinateSequence)
            }
            if (badInterior)
              errs(2) = s"invalid orientation for interior ring in column ${q(name)}"
          }
        case _ =>
      }
    }

    // bounds containment with antimeridian split (rules.go:609-670)
    if (bounds.nonEmpty && !geom.isEmpty) {
      if (bounds.length != 4 && bounds.length != 6) {
        errs(3) = s"invalid bbox length for column ${q(name)}"
        return errs
      }
      val (x0, y0, x1, y1) = bounds.length match {
        case 4 => (bounds(0), bounds(1), bounds(2), bounds(3))
        case _ => (bounds(0), bounds(1), bounds(3), bounds(4))
      }
      if (bounds.length == 4 || bounds.length == 6) {
        val env = geom.getEnvelopeInternal
        if (x0 <= x1) {
          if (env.getMinX < x0)
            errs(3) = f"geometry in column ${q(name)} extends to ${env.getMinX}%f, west of the bbox"
          else if (env.getMaxX > x1)
            errs(3) = f"geometry in column ${q(name)} extends to ${env.getMaxX}%f, east of the bbox"
        } else {
          if (env.getMaxX > x1 && env.getMaxX < x0)
            errs(3) = f"geometry in column ${q(name)} extends to ${env.getMaxX}%f, outside of the bbox"
          else if (env.getMinX < x0 && env.getMinX > x1)
            errs(3) = f"geometry in column ${q(name)} extends to ${env.getMinX}%f, outside of the bbox"
        }
        if (errs(3) == null) {
          if (env.getMinY < y0)
            errs(3) = f"geometry in column ${q(name)} extends to ${env.getMinY}%f, south of the bbox"
          else if (env.getMaxY > y1)
            errs(3) = f"geometry in column ${q(name)} extends to ${env.getMaxY}%f, north of the bbox"
        }
      }
    }
    errs
  }
}

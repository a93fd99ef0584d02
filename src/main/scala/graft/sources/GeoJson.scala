package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.geo.{GeoCodec, GeoJsonCodec}
import graft.meta.GeoMetadata
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** GeoJSON source and sink (SURVEY.md §2.1 S1/S9).
  *
  * Read: driver-side schema inference over the first `maxFeatures` features
  * (reference Min/Max buffering, geojson.go:129-163), then a distributed
  * parse — NDJSON inputs go through `spark.read.text` (line-splittable, so
  * a single large file still fans out across tasks); FeatureCollection
  * files parse one file per task via the streaming [[FeatureIterator]]
  * (memory bounded per feature, parallelism = #files, matching the
  * reference's single-stream behavior per file).
  *
  * Write: one JSON feature per row via a row→JSON builder; NDJSON output is
  * fully distributed (`text` sink); single-FeatureCollection output streams
  * through the driver (CLI parity for modest results).
  */
object GeoJson {

  val GeometryColumn: String = GeoMetadata.DefaultGeometryColumn
  private val ndExtensions = Seq(".ndjson", ".ndgeojson", ".geojsonl")

  def isNdPath(path: String): Boolean =
    ndExtensions.exists(path.toLowerCase.endsWith)

  // ---------------- read ----------------

  def read(spark: SparkSession, path: String,
           minFeatures: Int = 10, maxFeatures: Int = 100): DataFrame = {
    val files = listFiles(path)
    require(files.nonEmpty, s"no input files at $path")
    val propSchema = inferSchema(files, minFeatures, maxFeatures)
    val fullSchema = StructType(propSchema.fields :+
      StructField(GeometryColumn, BinaryType, nullable = true))

    val rowsRdd =
      if (files.forall(f => isNdPath(f))) {
        // line-delimited: splittable within files (textFile handles any
        // Hadoop scheme on its own)
        spark.read.textFile(files: _*).rdd
          .filter(_.trim.nonEmpty)
          .map { line =>
            val it = new FeatureIterator(line)
            val f = if (it.hasNext) it.next() else null
            require(f != null, s"invalid NDJSON line")
            featureToRow(f, propSchema)
          }
      } else {
        // whole-file FeatureCollections: one task per file, opened through
        // the Hadoop FileSystem of the file's scheme so s3a://, hdfs://
        // and http(s):// inputs read without local staging; the driver's
        // Hadoop settings ride along as a serializable property list
        val confProps = graft.meta.FooterIO.confProps(
          graft.meta.FooterIO.hadoopConf(Some(spark)))
        spark.sparkContext.parallelize(files, math.max(1, files.length))
          .flatMap { file =>
            val it = new FeatureIterator(openReader(file, confProps))
            it.map(featureToRow(_, propSchema))
          }
      }
    spark.createDataFrame(rowsRdd, fullSchema)
  }

  /** Open any Hadoop-scheme path as a UTF-8 reader. */
  private def openReader(file: String, confProps: Seq[(String, String)]): BufferedReader = {
    val conf = graft.meta.FooterIO.confFrom(confProps)
    graft.sources.Remote.install(conf)
    val p = new org.apache.hadoop.fs.Path(file)
    new BufferedReader(new InputStreamReader(
      p.getFileSystem(conf).open(p), StandardCharsets.UTF_8))
  }

  private def featureToRow(f: RawFeature, propSchema: StructType): Row = {
    val props = SchemaInference.toRowValues(f.properties, propSchema)
    Row.fromSeq(props.toSeq :+ GeoCodec.encodeWkb(f.geometry))
  }

  private[sources] def listFiles(path: String): Seq[String] = {
    val conf = graft.meta.FooterIO.hadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) Seq(st.getPath.toString)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString).sorted
  }

  /** Stream features from the head of the input until the schema is ready
    * AND at least `minFeatures` features were observed (the reference
    * keeps feeding the builder through its Min buffer, geojson.go:138-163,
    * so properties first appearing within the buffer window still make the
    * schema); fail after `maxFeatures` features without a complete schema.
    */
  private[sources] def inferSchema(files: Seq[String], minFeatures: Int,
                                   maxFeatures: Int): StructType = {
    val builder = new SchemaInference.Builder
    var read = 0
    def done: Boolean = builder.ready && read >= minFeatures
    val fileIt = files.iterator
    while (fileIt.hasNext && read < maxFeatures && !done) {
      val it = new FeatureIterator(openSchemaReader(fileIt.next()))
      try {
        while (it.hasNext && read < maxFeatures && !done) {
          builder.add(it.next().properties)
          read += 1
        }
      } finally it.close()
    }
    if (!builder.ready && builder.observedFieldCount > 0)
      throw new IllegalArgumentException(
        s"failed to create parquet schema after reading $read features")
    if (builder.observedFieldCount == 0) new StructType() else builder.schema()
  }

  /** Driver-side reader for schema inference (same Hadoop-FS opening as
    * the distributed read, session conf included).
    */
  private def openSchemaReader(file: String): BufferedReader = {
    val conf = graft.meta.FooterIO.hadoopConf()
    val p = new org.apache.hadoop.fs.Path(file)
    new BufferedReader(new InputStreamReader(
      p.getFileSystem(conf).open(p), StandardCharsets.UTF_8))
  }

  // ---------------- write ----------------

  /** Serialize one row as a GeoJSON Feature string. Non-primary geometry
    * columns are decoded into the properties (reference
    * recordwriter.go:58-69).
    */
  def featureJson(row: Row, schema: StructType, primary: String,
                  geomCols: Set[String]): String = {
    val mapper = FeatureIterator.mapper
    val feature = mapper.createObjectNode()
    feature.put("type", "Feature")
    val props = feature.putObject("properties")
    var geometryNode: JsonNode = null
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val value = if (row.isNullAt(i)) null else row.get(i)
      if (f.name == primary) {
        geometryNode =
          if (value == null) null
          else GeoJsonCodec.toNode(GeoCodec.decode(value))
      } else if (geomCols.contains(f.name)) {
        props.set[JsonNode](f.name,
          if (value == null) mapper.nullNode()
          else GeoJsonCodec.toNode(GeoCodec.decode(value)))
      } else {
        props.set[JsonNode](f.name, valueToNode(value, mapper))
      }
    }
    feature.set[JsonNode]("geometry", geometryNode)
    mapper.writeValueAsString(feature)
  }

  private def valueToNode(v: Any, mapper: com.fasterxml.jackson.databind.ObjectMapper): JsonNode = v match {
    case null => mapper.nullNode()
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case f: Float => mapper.getNodeFactory.numberNode(f)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case d: java.math.BigDecimal => mapper.getNodeFactory.numberNode(d)
    case s: String => mapper.getNodeFactory.textNode(s)
    case b: Array[Byte] => mapper.getNodeFactory.binaryNode(b)
    case t: java.sql.Timestamp => mapper.getNodeFactory.textNode(t.toInstant.toString)
    case d: java.sql.Date => mapper.getNodeFactory.textNode(d.toString)
    case seq: scala.collection.Seq[_] =>
      val a: ArrayNode = mapper.createArrayNode()
      seq.foreach(x => a.add(valueToNode(x, mapper)))
      a
    case m: scala.collection.Map[_, _] =>
      val o: ObjectNode = mapper.createObjectNode()
      m.foreach { case (k, x) => o.set[JsonNode](String.valueOf(k), valueToNode(x, mapper)) }
      o
    case r: Row =>
      val o: ObjectNode = mapper.createObjectNode()
      r.schema.fields.zipWithIndex.foreach { case (f, i) =>
        o.set[JsonNode](f.name, valueToNode(if (r.isNullAt(i)) null else r.get(i), mapper))
      }
      o
    case other => mapper.getNodeFactory.textNode(other.toString)
  }

  private def featureStrings(df: DataFrame, meta: Option[GeoMetadata]) = {
    val primary = meta.map(_.primaryColumn).getOrElse(GeometryColumn)
    val geomCols = meta.map(_.columnNames.toSet).getOrElse(Set(GeometryColumn))
    val schema = df.schema
    df.rdd.map(row => featureJson(row, schema, primary, geomCols))
  }

  /** Distributed NDJSON write: one feature per line. */
  def writeNdjson(df: DataFrame, path: String, meta: Option[GeoMetadata] = None): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    featureStrings(df, meta).toDF("value").write.mode("overwrite").text(path)
  }

  /** Single-file FeatureCollection write, streamed through the driver. */
  def writeFeatureCollection(df: DataFrame, file: String,
                             meta: Option[GeoMetadata] = None): Unit = {
    val conf = graft.meta.FooterIO.hadoopConf(Some(df.sparkSession))
    val outP = new org.apache.hadoop.fs.Path(file)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      outP.getFileSystem(conf).create(outP, true), StandardCharsets.UTF_8))
    try {
      out.write("""{"type":"FeatureCollection","features":[""")
      var first = true
      featureStrings(df, meta).toLocalIterator.foreach { s =>
        if (!first) out.write(",")
        out.write(s)
        first = false
      }
      out.write("]}")
    } finally out.close()
  }
}

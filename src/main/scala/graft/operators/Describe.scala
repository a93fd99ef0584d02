package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.meta.{FooterIO, GeoMetadata}
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.schema.{GroupType, PrimitiveType, Type}
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** `gpq describe` (SURVEY.md §3.3 footnote, cmd/gpq/command/describe.go):
  * footer-only schema walk with physical/logical type names, row and
  * row-group counts, row-group-0 compression, parsed geo metadata, and
  * validity issues. Reads no data pages.
  */
object Describe {

  def json(spark: SparkSession, path: String): String = {
    val files = FooterIO.dataFiles(path)
    require(files.nonEmpty, s"no parquet files at $path")
    val footers = files.map(f => FooterIO.readFooter(f))
    val head = footers.head

    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.set[ObjectNode]("schema",
      schemaNode(mapper, head, "", head.getFileMetaData.getSchema))
    // dataset-level counts aggregate across part files (a directory write is
    // one logical file to the reference's single-file describe)
    root.put("rows", footers.map(_.getBlocks.asScala.map(_.getRowCount).sum).sum)
    root.put("groups", footers.map(_.getBlocks.size().toLong).sum)

    val kv = head.getFileMetaData.getKeyValueMetaData.asScala
    kv.get(GeoMetadata.MetadataKey) match {
      case None =>
        root.putNull("metadata")
        root.putArray("issues").add(
          s"""Not a valid GeoParquet file (missing the "geo" metadata key). Run convert to try to convert it to GeoParquet.""")
      case Some(value) =>
        try {
          val meta = GeoMetadata.parse(value)
          root.set[ObjectNode]("metadata", meta.raw)
          root.putArray("issues")
        } catch {
          case _: Exception =>
            root.putNull("metadata")
            root.putArray("issues").add(
              s"""Not a valid GeoParquet file (invalid "geo" metadata). Run describe with the --metadata-only flag to see the "geo" metadata value. Run validate for more detail on validation issues.""")
        }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Raw `geo` metadata value (describe --metadata-only). */
  def metadataOnly(path: String): String =
    FooterIO.readGeoJson(path).getOrElse(
      throw new IllegalArgumentException("""missing "geo" metadata key"""))

  private def schemaNode(mapper: ObjectMapper, footer: ParquetMetadata,
                         name: String, node: Type, path: String = ""): ObjectNode = {
    val n = mapper.createObjectNode()
    if (name.nonEmpty) n.put("name", name)
    node.getRepetition match {
      case Type.Repetition.OPTIONAL => n.put("optional", true)
      case Type.Repetition.REPEATED => n.put("repeated", true)
      case _ =>
    }
    node match {
      case p: PrimitiveType =>
        n.put("type", physicalName(p))
        annotation(p).foreach(n.put("annotation", _))
        compression(footer, path).foreach(n.put("compression", _))
      case g: GroupType =>
        if (name.nonEmpty) n.put("annotation", "group")
        val fields = n.putArray("fields")
        g.getFields.asScala.foreach { f =>
          fields.add(schemaNode(mapper, footer, f.getName, f,
            if (path.isEmpty) f.getName else s"$path.${f.getName}"))
        }
    }
    n
  }

  /** Physical type display names (describe.go:312-334). */
  private def physicalName(p: PrimitiveType): String = {
    import PrimitiveType.PrimitiveTypeName._
    p.getPrimitiveTypeName match {
      case BOOLEAN => "boolean"
      case INT32 => "int32"
      case INT64 => "int64"
      case INT96 => "int96"
      case FLOAT => "float"
      case DOUBLE => "double"
      case BINARY => "binary"
      case FIXED_LEN_BYTE_ARRAY => s"fixed_len_byte_array(${p.getTypeLength})"
      case other => other.toString.toLowerCase
    }
  }

  private def annotation(p: PrimitiveType): Option[String] =
    Option(p.getLogicalTypeAnnotation).map(_.toString.toLowerCase)

  /** Compression of the column in row group 0 (describe.go:266-283),
    * matched by the exact dotted path (suffix matching would confuse
    * same-named leaves under different parents).
    */
  private def compression(footer: ParquetMetadata, path: String): Option[String] = {
    val blocks = footer.getBlocks
    if (blocks.isEmpty) return Some("unknown")
    blocks.get(0).getColumns.asScala
      .find(c => c.getPath.toDotString == path)
      .map(_.getCodec.name().toLowerCase)
  }
}

package graft.sources

import graft.geo.GeoCodec

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import scala.jdk.CollectionConverters._

/** Column-chunk-level WKT→WKB transcoding with per-column codec retention
  * (reference transform.go:36-52 keeps each column's codec through its
  * column-wise transform pipeline).
  *
  * parquet-mr's high-level writer compresses every column with ONE codec,
  * so a whole-file rewrite loses mixed codecs. This rewriter instead walks
  * the file row group by row group and, per column:
  *
  *  - untouched columns: `appendColumnChunk` copies the chunk bytes
  *    VERBATIM — codec, encodings, dictionary pages, statistics, column
  *    and offset indexes, bloom filters all survive untouched;
  *  - each transcoded (string WKT) geometry column: values are decoded,
  *    transcoded with the same [[GeoCodec]] the distributed path uses, and
  *    re-encoded into a fresh chunk compressed with that column's OWN
  *    original codec.
  *
  * Driver-local per file (footer surgery-adjacent, like [[graft.meta.FooterIO]]);
  * a many-file dataset can fan the per-file calls out across executors.
  */
object ChunkRewriter {

  /** Rewrite `in` → `out`, transcoding `wktCols` (top-level string columns)
    * to WKB binary and copying every other column chunk verbatim.
    */
  def transcodeFile(in: Path, out: Path, wktCols: Set[String],
                    conf: Configuration): Unit = {
    require(wktCols.nonEmpty, "no columns to transcode — use a verbatim copy")
    val inFile = HadoopInputFile.fromPath(in, conf)
    val reader = ParquetFileReader.open(inFile)
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      wktCols.foreach { c =>
        val t = if (schema.containsField(c)) Some(schema.getType(Seq(c): _*)) else None
        require(t.exists(f => f.isPrimitive &&
          f.asPrimitiveType().getPrimitiveTypeName == PrimitiveTypeName.BINARY),
          s"expected a top-level binary(string) column named $c")
      }
      val outSchema = new MessageType(schema.getName,
        schema.getFields.asScala.map { f =>
          if (wktCols.contains(f.getName))
            // WKB: plain binary, the string annotation dropped
            Types.primitive(PrimitiveTypeName.BINARY, f.getRepetition)
              .named(f.getName): Type
          else f
        }.toSeq.asJava)

      // second reader cursor for the transcoded columns' values only
      val valueReader = ParquetFileReader.open(inFile)
      val writer = new ParquetFileWriter(HadoopOutputFile.fromPath(out, conf),
        outSchema, ParquetFileWriter.Mode.OVERWRITE,
        128L * 1024 * 1024, 8 * 1024 * 1024)
      val copyStream = inFile.newStream()
      try {
        val prunedSchema = new MessageType("pruned",
          schema.getFields.asScala.filter(f => wktCols.contains(f.getName)).toSeq.asJava)
        valueReader.setRequestedSchema(prunedSchema)
        writer.start()
        val tmpDir = java.nio.file.Files.createTempDirectory("chunkrewrite")
        footer.getBlocks.asScala.zipWithIndex.foreach { case (block, bi) =>
          val rows = block.getRowCount
          // decode this row group's WKT values (pruned read: only the
          // transcoded columns' pages are materialized)
          val pages = valueReader.readNextRowGroup()
          val io = new ColumnIOFactory().getColumnIO(prunedSchema)
          val rr = io.getRecordReader(pages, new GroupRecordConverter(prunedSchema))
          val wktNames = prunedSchema.getFields.asScala.map(_.getName).toArray
          val values = wktNames.map(_ => Array.ofDim[Array[Byte]](rows.toInt))
          var r = 0
          while (r < rows) {
            val g = rr.read()
            var ci = 0
            while (ci < wktNames.length) {
              if (g.getFieldRepetitionCount(ci) > 0) {
                val wkt = g.getBinary(ci, 0).toStringUsingUTF8
                values(ci)(r) = GeoCodec.encodeWkb(GeoCodec.decodeWkt(wkt))
              }
              ci += 1
            }
            r += 1
          }

          writer.startBlock(rows)
          schema.getFields.asScala.foreach { f =>
            val name = f.getName
            val chunk = block.getColumns.asScala
              .find(_.getPath.toDotString == name)
              .getOrElse(throw new IllegalStateException(
                s"no chunk for column $name in row group $bi (nested columns unsupported)"))
            if (wktCols.contains(name)) {
              // fresh chunk, same codec as the original column chunk
              val tmp = new Path(tmpDir.resolve(s"g${bi}_$name.parquet").toString)
              val colSchema = new MessageType("g",
                Types.primitive(PrimitiveTypeName.BINARY, f.getRepetition).named(name))
              val w = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(tmp, conf))
                .withType(colSchema)
                .withConf(conf)
                .withCompressionCodec(chunk.getCodec)
                .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
                .withRowGroupSize(Long.MaxValue)
                .build()
              try {
                val ci = wktNames.indexOf(name)
                values(ci).foreach { wkb =>
                  val g = new SimpleGroup(colSchema)
                  if (wkb != null) g.add(0, Binary.fromConstantByteArray(wkb))
                  else require(f.getRepetition != Type.Repetition.REQUIRED,
                    s"null geometry in required column $name")
                  w.write(g)
                }
              } finally w.close()
              val tr = ParquetFileReader.open(HadoopInputFile.fromPath(tmp, conf))
              try {
                val tblocks = tr.getFooter.getBlocks
                require(tblocks.size == 1,
                  s"transcoded chunk split into ${tblocks.size} row groups")
                val tchunk = tblocks.get(0).getColumns.get(0)
                val tstream = HadoopInputFile.fromPath(tmp, conf).newStream()
                try writer.appendColumnChunk(
                  outSchema.getColumnDescription(Array(name)), tstream, tchunk,
                  tr.readBloomFilter(tchunk), tr.readColumnIndex(tchunk),
                  tr.readOffsetIndex(tchunk))
                finally tstream.close()
              } finally {
                tr.close()
                // the Hadoop local FS leaves a .crc sidecar next to the temp
                java.nio.file.Files.deleteIfExists(tmpDir.resolve(s"g${bi}_$name.parquet"))
                java.nio.file.Files.deleteIfExists(tmpDir.resolve(s".g${bi}_$name.parquet.crc"))
              }
            } else {
              writer.appendColumnChunk(
                outSchema.getColumnDescription(chunk.getPath.toArray),
                copyStream, chunk, reader.readBloomFilter(chunk),
                reader.readColumnIndex(chunk), reader.readOffsetIndex(chunk))
            }
          }
          writer.endBlock()
        }
        // clear any stragglers (.crc sidecars) before removing the dir
        java.nio.file.Files.list(tmpDir).iterator().asScala
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        java.nio.file.Files.deleteIfExists(tmpDir)
        // Spark trusts its row.metadata KV over the parquet schema on read;
        // the input's copy still types the transcoded column as string, so
        // keeping it would corrupt reads of the now-binary chunk — drop it
        // and let readers infer from the (correct) parquet schema
        val kv = footer.getFileMetaData.getKeyValueMetaData.asScala
          .filter { case (k, _) => k != "org.apache.spark.sql.parquet.row.metadata" }
        writer.end(kv.asJava)
      } finally {
        copyStream.close()
        valueReader.close()
      }
    } finally reader.close()
  }

  /** The per-column codecs of a file's first row group, for specs. */
  def columnCodecs(p: Path, conf: Configuration): Map[String, CompressionCodecName] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try reader.getFooter.getBlocks.get(0).getColumns.asScala
      .map(c => c.getPath.toDotString -> c.getCodec).toMap
    finally reader.close()
  }
}

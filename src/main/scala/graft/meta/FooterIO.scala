package graft.meta

import java.io.{ByteArrayOutputStream, File, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.Util
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.metadata.{FileMetaData, ParquetMetadata}
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.jdk.CollectionConverters._

/** Parquet footer key-value metadata surgery (SURVEY.md §7 hard part #1).
  *
  * Spark's DataFrameWriter has no hook for file-level KV metadata, so the
  * `geo` entry is attached *after* the write by rewriting each part file's
  * footer in place: the footer thrift blob sits at the tail of the file
  * (`[data][footer][len:4 LE]["PAR1"]`), so appending a KV pair only
  * rewrites the tail — data pages are untouched, making the operation O(1)
  * in file size and trivially parallelizable across part files.
  *
  * Read side mirrors reference GetMetadata (metadata.go:168-199).
  */
object FooterIO {

  private val Magic = "PAR1".getBytes(StandardCharsets.US_ASCII)

  /** List the data files of a parquet path (single file, directory of part
    * files, or a partitioned directory tree), sorted for determinism.
    */
  def dataFiles(path: String): Seq[File] = {
    def walk(dir: File): Seq[File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { p =>
        if (p.isDirectory && !p.getName.startsWith(".") && !p.getName.startsWith("_"))
          walk(p)
        else if (p.isFile && p.getName.endsWith(".parquet") && !p.getName.startsWith("."))
          Seq(p)
        else Nil
      }
    val f = new File(path)
    val files = if (f.isFile) Seq(f) else walk(f)
    files.sortBy(_.getPath)
  }

  def readFooter(file: File): ParquetMetadata = {
    val in = HadoopInputFile.fromPath(new Path(file.toURI), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  /** Raw KV map of the first data file (all parts carry identical `geo`). */
  def keyValueMetadata(path: String): Map[String, String] = {
    val files = dataFiles(path)
    require(files.nonEmpty, s"no parquet data files under $path")
    readFooter(files.head).getFileMetaData.getKeyValueMetaData.asScala.toMap
  }

  /** True when the path is a non-local URI (hadoop scheme): footer
    * surgery here is java.io-based and local-only — data reads still work
    * through Spark, but metadata attach/read degrades gracefully
    * (COVERAGE.md deviations).
    */
  def isNonLocal(path: String): Boolean = {
    val scheme = Option(java.net.URI.create(
      path.replace(" ", "%20")).getScheme).getOrElse("")
    scheme.nonEmpty && scheme != "file"
  }

  def readGeoJson(path: String): Option[String] =
    if (isNonLocal(path)) None
    else keyValueMetadata(path).get(GeoMetadata.MetadataKey)

  def readGeoMetadata(path: String): Option[GeoMetadata] =
    readGeoJson(path).map(GeoMetadata.parse)

  /** Append/replace KV entries in one file's footer, in place. */
  def appendKeyValue(file: File, entries: Map[String, String]): Unit = {
    val footer = readFooter(file)
    val fmd = footer.getFileMetaData
    val kv = new java.util.LinkedHashMap[String, String](fmd.getKeyValueMetaData)
    entries.foreach { case (k, v) => kv.put(k, v) }
    val newFooter = new ParquetMetadata(
      new FileMetaData(fmd.getSchema, kv, fmd.getCreatedBy), footer.getBlocks)
    val thrift = new ParquetMetadataConverter()
      .toParquetMetadata(ParquetFileWriter.CURRENT_VERSION, newFooter)
    val baos = new ByteArrayOutputStream()
    Util.writeFileMetaData(thrift, baos)
    val footerBytes = baos.toByteArray

    val raf = new RandomAccessFile(file, "rw")
    try {
      val len = raf.length()
      require(len > 12, s"$file is not a parquet file")
      // trailing 8 bytes: [footerLen:4 LE]["PAR1"]
      raf.seek(len - 8)
      val lenBytes = new Array[Byte](4)
      raf.readFully(lenBytes)
      val oldFooterLen =
        (lenBytes(0) & 0xff) | ((lenBytes(1) & 0xff) << 8) |
        ((lenBytes(2) & 0xff) << 16) | ((lenBytes(3) & 0xff) << 24)
      val magic = new Array[Byte](4)
      raf.readFully(magic)
      require(magic.sameElements(Magic), s"$file is not a parquet file (bad magic)")
      val footerStart = len - 8 - oldFooterLen
      raf.setLength(footerStart)
      raf.seek(footerStart)
      raf.write(footerBytes)
      val n = footerBytes.length
      raf.write(Array[Byte](
        (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
      raf.write(Magic)
    } finally raf.close()
    // Hadoop's LocalFileSystem keeps a .crc sidecar per file; the rewritten
    // tail invalidates it, so remove it (checksum verification would
    // otherwise fail the next read).
    val crc = new File(file.getParentFile, s".${file.getName}.crc")
    if (crc.exists()) crc.delete()
  }

  /** Attach the `geo` metadata to every part file of a written dataset.
    * With many part files and a SparkSession the O(1)-per-file footer
    * rewrites fan out across executors (each task touches only its file);
    * small outputs stay on the driver.
    */
  def writeGeoMetadata(path: String, meta: GeoMetadata,
                       spark: Option[org.apache.spark.sql.SparkSession] = None): Unit = {
    val json = meta.json
    val files = dataFiles(path)
    spark match {
      case Some(s) if files.length > 8 =>
        val paths = files.map(_.getAbsolutePath)
        s.sparkContext.parallelize(paths, math.min(paths.length, 64))
          .foreach(p => appendKeyValue(new File(p), Map(GeoMetadata.MetadataKey -> json)))
      case _ =>
        files.foreach(f => appendKeyValue(f, Map(GeoMetadata.MetadataKey -> json)))
    }
  }
}

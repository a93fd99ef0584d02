package graft.meta

import java.io.{ByteArrayOutputStream, File, IOException, RandomAccessFile}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * footer: the footer thrift blob sits at the tail of the file
  * (`[data][footer][len:4 LE]["PAR1"]`), so appending a KV pair only
  * touches the tail — data pages are untouched.
  *
  * All IO goes through `org.apache.hadoop.fs.FileSystem`, so `geo`
  * metadata survives on any Hadoop scheme (s3a://, gs://, abfs://,
  * hdfs://, file://) — matching the reference, whose storage layer reads
  * and writes every blob store (internal/storage/blob.go:25-107,
  * storage.go:23-39). Two write strategies:
  *
  *  - local files: in-place tail rewrite via RandomAccessFile — O(1) in
  *    file size;
  *  - everything else: rewrite-by-copy on the same FileSystem (object
  *    stores have no truncate/append) — stream the data region to a
  *    dot-prefixed temp file, append the new footer, delete + rename.
  *    O(file size) IO but no local staging, and parallelizable across
  *    part files.
  *
  * Read side mirrors reference GetMetadata (metadata.go:168-199).
  */
object FooterIO {

  private val Magic = "PAR1".getBytes(StandardCharsets.US_ASCII)

  /** Hadoop conf for metadata IO: a copy of the active SparkSession's
    * `hadoopConfiguration` when one exists — so `spark.hadoop.*` settings
    * (s3a credentials, endpoints, timeouts) reach footer reads and
    * rewrites — else a bare Configuration. Either way the lazy ranged-GET
    * http(s) FileSystems are installed (describe on a remote file reads
    * KBs, not the file). The copy keeps Remote.install from mutating the
    * session's own conf.
    */
  private[graft] def hadoopConf(
      spark: Option[org.apache.spark.sql.SparkSession] = None): Configuration = {
    val c = spark.orElse(org.apache.spark.sql.SparkSession.getActiveSession)
      .map(s => new Configuration(s.sparkContext.hadoopConfiguration))
      .getOrElse(new Configuration())
    graft.sources.Remote.install(c)
    c
  }

  /** A Configuration's explicit entries as a serializable list, and back —
    * for shipping the driver's Hadoop settings to executor-side footer
    * rewrites (Configuration itself is not serializable).
    */
  private[graft] def confProps(c: Configuration): Seq[(String, String)] =
    c.iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
  private[graft] def confFrom(props: Seq[(String, String)]): Configuration = {
    val c = new Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def fsFor(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  /** List the data files of a parquet path (single file, directory of part
    * files, or a partitioned directory tree) on whatever FileSystem the
    * path's scheme names, sorted for determinism.
    */
  def dataFiles(path: String, conf: Configuration = hadoopConf()): Seq[Path] = {
    val root = new Path(path)
    val fs = fsFor(root, conf)
    def walk(dir: Path): Seq[Path] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith(".") || name.startsWith("_")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) Seq(st.getPath)
        else Nil
      }
    val files =
      if (fs.getFileStatus(root).isDirectory) walk(root) else Seq(root)
    files.sortBy(_.toString)
  }

  def readFooter(p: Path, conf: Configuration = hadoopConf()): ParquetMetadata = {
    val in = HadoopInputFile.fromPath(p, conf)
    val r = ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  /** Raw KV map of the first data file (all parts carry identical `geo`). */
  def keyValueMetadata(path: String): Map[String, String] = {
    val conf = hadoopConf()
    val files = dataFiles(path, conf)
    require(files.nonEmpty, s"no parquet data files under $path")
    readFooter(files.head, conf).getFileMetaData.getKeyValueMetaData.asScala.toMap
  }

  /** True when the path has a non-file URI scheme. Metadata IO itself now
    * works on any Hadoop scheme; this remains for callers that want to
    * skip footer reads on schemes Hadoop may not serve (e.g. https).
    */
  def isNonLocal(path: String): Boolean = {
    val scheme = Option(java.net.URI.create(
      path.replace(" ", "%20")).getScheme).getOrElse("")
    scheme.nonEmpty && scheme != "file"
  }

  /** The `geo` footer JSON, or None when absent — including when the
    * path's scheme has no FileSystem implementation (plain https) or the
    * footer is unreadable: a missing metadata attach degrades to plain
    * parquet, never to a read failure.
    */
  def readGeoJson(path: String): Option[String] =
    try keyValueMetadata(path).get(GeoMetadata.MetadataKey)
    catch {
      case _: IOException | _: IllegalArgumentException |
           _: UnsupportedOperationException => None
    }

  def readGeoMetadata(path: String): Option[GeoMetadata] =
    readGeoJson(path).map(GeoMetadata.parse)

  /** Serialize a footer with `entries` merged into its KV metadata. */
  private[meta] def footerWithEntries(footer: ParquetMetadata,
                                entries: Map[String, String]): Array[Byte] = {
    val fmd = footer.getFileMetaData
    val kv = new java.util.LinkedHashMap[String, String](fmd.getKeyValueMetaData)
    entries.foreach { case (k, v) => kv.put(k, v) }
    val newFooter = new ParquetMetadata(
      new FileMetaData(fmd.getSchema, kv, fmd.getCreatedBy), footer.getBlocks)
    val thrift = new ParquetMetadataConverter()
      .toParquetMetadata(ParquetFileWriter.CURRENT_VERSION, newFooter)
    val baos = new ByteArrayOutputStream()
    Util.writeFileMetaData(thrift, baos)
    baos.toByteArray
  }

  private def lenLE(n: Int): Array[Byte] = Array[Byte](
    (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
    ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)

  /** Where the current footer starts: validate the trailing
    * `[len:4 LE]["PAR1"]` and compute `fileLen - 8 - footerLen`.
    */
  private def footerStart(readFully: (Long, Array[Byte]) => Unit,
                          fileLen: Long, what: String): Long = {
    require(fileLen > 12, s"$what is not a parquet file")
    val tail = new Array[Byte](8)
    readFully(fileLen - 8, tail)
    require(tail.drop(4).sameElements(Magic), s"$what is not a parquet file (bad magic)")
    val oldFooterLen =
      (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
      ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
    fileLen - 8 - oldFooterLen
  }

  /** Append/replace KV entries in one file's footer. */
  def appendKeyValue(p: Path, entries: Map[String, String],
                     conf: Configuration = hadoopConf()): Unit = {
    val fs = fsFor(p, conf)
    val footerBytes = footerWithEntries(readFooter(p, conf), entries)
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    if (scheme == "file") appendLocal(new File(p.toUri.getPath), footerBytes)
    else appendByCopy(fs, p, footerBytes)
  }

  /** Local fast path: truncate at the old footer and write the new tail in
    * place — O(1) in file size.
    */
  private def appendLocal(file: File, footerBytes: Array[Byte]): Unit = {
    val raf = new RandomAccessFile(file, "rw")
    try {
      val start = footerStart((pos, buf) => { raf.seek(pos); raf.readFully(buf) },
        raf.length(), file.toString)
      raf.setLength(start)
      raf.seek(start)
      raf.write(footerBytes)
      raf.write(lenLE(footerBytes.length))
      raf.write(Magic)
    } finally raf.close()
    // Hadoop's LocalFileSystem keeps a .crc sidecar per file; the rewritten
    // tail invalidates it, so remove it (checksum verification would
    // otherwise fail the next read).
    val crc = new File(file.getParentFile, s".${file.getName}.crc")
    if (crc.exists()) crc.delete()
  }

  /** Object-store path: no truncate/append, so stream the data region to a
    * temp object on the same FileSystem, append the new footer, and swap.
    * The delete+rename pair is not atomic — a crash between the two leaves
    * the temp file next to the original; re-running the attach repairs it.
    */
  private[meta] def appendByCopy(fs: FileSystem, p: Path, footerBytes: Array[Byte]): Unit = {
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    val start =
      try footerStart((pos, buf) => in.readFully(pos, buf), fileLen, p.toString)
      catch { case e: Throwable => in.close(); throw e }
    val tmp = new Path(p.getParent, s".${p.getName}.graft.tmp")
    try {
      val out = fs.create(tmp, true)
      try {
        in.seek(0)
        val buf = new Array[Byte](1 << 20)
        var remaining = start
        while (remaining > 0) {
          val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          if (n <= 0) throw new IOException(s"unexpected EOF copying $p")
          out.write(buf, 0, n)
          remaining -= n
        }
        out.write(footerBytes)
        out.write(lenLE(footerBytes.length))
        out.write(Magic)
      } finally out.close()
    } finally in.close()
    if (!fs.delete(p, false)) throw new IOException(s"cannot delete $p for footer swap")
    if (!fs.rename(tmp, p)) throw new IOException(s"cannot rename $tmp over $p")
  }

  /** Attach the `geo` metadata to every part file of a written dataset.
    * With many part files and a SparkSession the per-file footer rewrites
    * fan out across executors (each task touches only its file); small
    * outputs stay on the driver.
    */
  def writeGeoMetadata(path: String, meta: GeoMetadata,
                       spark: Option[org.apache.spark.sql.SparkSession] = None): Unit = {
    val json = meta.json
    val conf = hadoopConf(spark)
    val files = dataFiles(path, conf)
    spark match {
      case Some(s) if files.length > 8 =>
        val paths = files.map(_.toString)
        // ship the driver's Hadoop settings with the task: executors build
        // their Configuration from this list, so s3a credentials etc.
        // reach the per-file rewrites
        val props = confProps(conf)
        s.sparkContext.parallelize(paths, math.min(paths.length, 64))
          .foreach { p =>
            appendKeyValue(new Path(p), Map(GeoMetadata.MetadataKey -> json),
              confFrom(props))
          }
      case _ =>
        files.foreach(f => appendKeyValue(f, Map(GeoMetadata.MetadataKey -> json), conf))
    }
  }
}

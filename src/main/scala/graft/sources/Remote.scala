package graft.sources

import java.io.{BufferedInputStream, FileOutputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path}

/** Remote input dispatch (SURVEY.md §2.1 S4/S5, reference
  * internal/storage/storage.go:23-39).
  *
  * Cloud/blob schemes (s3a, gs, abfs, hdfs, file) are Hadoop filesystems —
  * `spark.read.parquet("s3a://…")` already streams with range reads and
  * split parallelism, so those pass through untouched. Plain http(s) gets
  * the lazy ranged-GET [[HttpFileSystem]] (reference storage/http.go) for
  * parquet inputs — describe/extract on a remote file read a few KB, not
  * the whole file. GeoJSON http inputs still download once: the streaming
  * feature parser is a sequential full read anyway.
  */
object Remote {

  val hadoopSchemes: Set[String] = Set("s3a", "s3", "gs", "abfs", "abfss", "wasb", "hdfs", "file")

  private val parquetExtensions =
    Seq(".parquet", ".geoparquet", ".gpq", ".pq")

  private def parquetLike(uri: String): Boolean = {
    val path = Option(URI.create(uri).getPath).getOrElse("").toLowerCase
    parquetExtensions.exists(path.endsWith)
  }

  /** Register the lazy http(s) FileSystems on a Hadoop configuration. */
  def install(conf: org.apache.hadoop.conf.Configuration): Unit = {
    conf.setIfUnset("fs.http.impl", classOf[HttpFileSystem].getName)
    conf.setIfUnset("fs.https.impl", classOf[HttpsFileSystem].getName)
  }

  /** Resolve any supported URI to a Spark-readable path. With a session,
    * parquet http(s) URLs stay remote (lazy range reads through
    * [[HttpFileSystem]], installed on the session's Hadoop conf); other
    * http(s) resources download once to a driver temp file.
    */
  def resolve(uri: String, spark: Option[org.apache.spark.sql.SparkSession] = None): String = {
    val scheme = Option(URI.create(uri).getScheme).getOrElse("")
    scheme match {
      case "" => uri // local path
      case s if hadoopSchemes.contains(s) => uri
      case "http" | "https" if parquetLike(uri) && spark.isDefined =>
        install(spark.get.sparkContext.hadoopConfiguration)
        uri
      case "http" | "https" => fetchHttp(uri).toString
      case other => throw new IllegalArgumentException(s"unsupported scheme: $other")
    }
  }

  /** Download an http(s) resource to a temp file (suffix preserved so
    * format auto-detection by extension still works).
    */
  def fetchHttp(url: String): Path = {
    val name = url.split("/").last
    val dot = name.lastIndexOf('.')
    val suffix = if (dot >= 0) name.substring(dot) else ".bin"
    val tmp = Files.createTempFile("graft-remote", suffix)
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setInstanceFollowRedirects(true)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    if (code / 100 != 2)
      throw new java.io.IOException(s"failed to fetch $url: HTTP $code")
    val in = new BufferedInputStream(conn.getInputStream)
    val out = new FileOutputStream(tmp.toFile)
    try in.transferTo(out) finally { in.close(); out.close() }
    tmp
  }
}

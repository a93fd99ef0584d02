package graft.sources

import java.io.{BufferedInputStream, FileOutputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path}

/** Remote input dispatch (SURVEY.md §2.1 S4/S5, reference
  * internal/storage/storage.go:23-39).
  *
  * Cloud/blob schemes (s3a, gs, abfs, hdfs, file) are Hadoop filesystems —
  * `spark.read.parquet("s3a://…")` already streams with range reads and
  * split parallelism, so those pass through untouched. Plain http(s) has no
  * Hadoop FS by default; the reference does lazy ranged GETs
  * (storage/http.go) — here the shim fetches once to a local temp file on
  * the driver and hands Spark the local path (correct for the CLI-scale
  * use; a cluster deployment would publish to an object store instead).
  */
object Remote {

  val hadoopSchemes: Set[String] = Set("s3a", "s3", "gs", "abfs", "abfss", "wasb", "hdfs", "file")

  /** Resolve any supported URI to a Spark-readable path. */
  def resolve(uri: String): String = {
    val scheme = Option(URI.create(uri).getScheme).getOrElse("")
    scheme match {
      case "" => uri // local path
      case s if hadoopSchemes.contains(s) => uri
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

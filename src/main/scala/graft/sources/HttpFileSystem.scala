package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.net.{HttpURLConnection, URI}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Lazy HTTP(S) range reader (reference internal/storage/http.go:17-181):
  * a 512 B initial probe discovers the resource size via `Content-Range`,
  * subsequent reads issue ranged GETs of at least 1 KB, and an `If-Range`
  * validator (strong ETag, else Last-Modified) makes a changed resource
  * fail loudly instead of serving mixed bytes. Servers that ignore Range
  * (status 200) degrade to a whole-body fetch buffered in memory —
  * equivalent to the old download shim, still correct.
  *
  * Describe on a 50 GB remote file touches a few KB of traffic: the tail
  * probe plus the footer GET, never the data pages.
  */
final class HttpRangeReader(url: String) {

  import HttpRangeReader._

  private var buffer: Array[Byte] = Array.empty
  private var bufferOffset: Long = 0L
  private var validator: String = ""
  private var rangeSupported = false
  private[sources] var requestCount = 0

  val size: Long = init()

  private def init(): Long = {
    val (status, body, headers) = get(s"bytes=0-${InitialRequestSize - 1}", withValidator = false)
    if (status / 100 != 2) throw new IOException(s"unexpected response from $url: $status")
    buffer = body
    bufferOffset = 0
    val contentRange = headers.getOrElse("Content-Range", "")
    if (contentRange.contains("/")) {
      rangeSupported = true
      validator = {
        val etag = headers.getOrElse("ETag", "")
        if (etag.startsWith("\"")) etag else headers.getOrElse("Last-Modified", "")
      }
      try contentRange.split("/")(1).trim.toLong
      catch {
        case _: NumberFormatException =>
          throw new IOException(s"invalid content-range header from $url: $contentRange")
      }
    } else body.length.toLong // no range support: body is the whole file
  }

  private def get(range: String, withValidator: Boolean): (Int, Array[Byte], Map[String, String]) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setInstanceFollowRedirects(true)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    conn.setRequestProperty("Range", range)
    if (withValidator && validator.nonEmpty)
      conn.setRequestProperty("If-Range", validator)
    requestCount += 1
    val status = conn.getResponseCode
    val body =
      if (status / 100 == 2) {
        val in = conn.getInputStream
        try in.readAllBytes() finally in.close()
      } else Array.empty[Byte]
    val headers = Seq("Content-Range", "ETag", "Last-Modified")
      .flatMap(h => Option(conn.getHeaderField(h)).map(h -> _)).toMap
    (status, body, headers)
  }

  /** Read up to `len` bytes at `pos`; -1 at EOF. Serves from the current
    * buffer when possible, else issues one ranged GET of
    * `max(len, 1 KB)` bytes.
    */
  def readAt(pos: Long, dst: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= size) return -1
    if (len == 0) return 0
    if (pos < bufferOffset || pos >= bufferOffset + buffer.length) {
      if (!rangeSupported)
        throw new IOException(s"read past buffered body of non-range server at $url")
      val want = math.max(len.toLong, MinRequestSize.toLong)
      val end = math.min(pos + want, size) - 1
      val (status, body, headers) = get(s"bytes=$pos-$end", withValidator = true)
      // follow-ups MUST be partial content: a 200 here means the server
      // ignored Range or the If-Range validator no longer matches (the
      // resource changed) — either way the body starts at offset 0, and
      // storing it at bufferOffset = pos would silently serve bytes from
      // the wrong position
      if (status != HttpURLConnection.HTTP_PARTIAL)
        throw new IOException(
          s"expected 206 partial content from $url at $pos, got $status " +
            "(resource changed since open, or server stopped honoring Range)")
      // when the server echoes Content-Range, cross-check its start offset
      for (cr <- headers.get("Content-Range")) {
        val start = cr.stripPrefix("bytes").trim.takeWhile(_ != '-')
        if (start.nonEmpty && scala.util.Try(start.toLong).toOption.exists(_ != pos))
          throw new IOException(s"content-range mismatch from $url: asked $pos, got $cr")
      }
      buffer = body
      bufferOffset = pos
      if (body.isEmpty) throw new EOFException(s"empty range response from $url at $pos")
    }
    val avail = (bufferOffset + buffer.length - pos).toInt
    val n = math.min(len, avail)
    System.arraycopy(buffer, (pos - bufferOffset).toInt, dst, off, n)
    n
  }
}

object HttpRangeReader {
  val InitialRequestSize = 512
  val MinRequestSize = 1024
}

/** The seekable stream Hadoop wraps in FSDataInputStream. */
private[sources] final class HttpSeekableStream(reader: HttpRangeReader)
    extends InputStream with Seekable with PositionedReadable {

  private var pos = 0L

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val n = reader.readAt(pos, b, off, len)
    if (n > 0) pos += n
    n
  }

  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int =
    reader.readAt(position, buffer, offset, length)

  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    var done = 0
    while (done < length) {
      val n = reader.readAt(position + done, buffer, offset + done, length - done)
      if (n < 0) throw new EOFException("EOF during readFully")
      done += n
    }
  }

  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)

  override def seek(newPos: Long): Unit = pos = newPos
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false
}

/** Minimal read-only Hadoop FileSystem for plain http:// URLs, backed by
  * [[HttpRangeReader]] — registers via
  * `fs.http.impl = graft.sources.HttpFileSystem` (see [[Remote.install]]),
  * after which `spark.read.parquet("http://…")`, footer metadata reads and
  * describe/extract all work with lazy ranged GETs instead of whole-file
  * downloads. Mutating operations are unsupported (the reference's HTTP
  * storage is read-only too).
  */
class HttpFileSystem extends FileSystem {

  private var fsUri: URI = _

  protected def scheme: String = "http"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"$scheme://${name.getAuthority}")
  }

  override def getScheme: String = scheme
  override def getUri: URI = fsUri

  private def urlOf(f: Path): String = f.toUri.toString

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    new FSDataInputStream(new HttpSeekableStream(new HttpRangeReader(urlOf(f))))

  override def getFileStatus(f: Path): FileStatus = {
    val reader = new HttpRangeReader(urlOf(f))
    new FileStatus(reader.size, false, 1, 128L * 1024 * 1024, 0L, f)
  }

  override def listStatus(f: Path): Array[FileStatus] = Array(getFileStatus(f))

  private def readOnly = throw new IOException(s"$scheme filesystem is read-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly
  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream = readOnly
  override def rename(src: Path, dst: Path): Boolean = readOnly
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly

  private var workingDir = new Path("/")
  override def setWorkingDirectory(dir: Path): Unit = workingDir = dir
  override def getWorkingDirectory: Path = workingDir
}

/** Same, for https:// (`fs.https.impl`). */
class HttpsFileSystem extends HttpFileSystem {
  override protected def scheme: String = "https"
}

package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

/** Lazily-started per-JVM loopback HTTP server for the driver-visible
  * remote-source query (q_remote_extract): serves registered local files
  * with HTTP Range support so the lazy ranged-GET path
  * ([[HttpFileSystem]], SURVEY §2.1 S4) is exercised end-to-end by Verify
  * and Bench, not only by RemoteSpec. Lives in main (not test) because
  * `SparkEntry.queries` must be constructible by the driver.
  *
  * The server starts on first `serve` call and lives for the JVM (daemon
  * threads) — Bench re-executes a query's plan for several reps after the
  * constructing call returns, so per-query servers would be torn down too
  * early. File bytes are cached at registration: fixtures are small and
  * each Range request then costs no disk I/O.
  */
object FixtureServer {

  private lazy val server: HttpServer = {
    // create+start from a DAEMON thread: HttpServer.start spawns a
    // non-daemon dispatcher thread that inherits the creating thread's
    // daemon flag — started from main it keeps the (forked) Verify/Bench
    // JVM alive forever after main returns
    @volatile var built: HttpServer = null
    val starter = new Thread(new Runnable {
      override def run(): Unit = {
        val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
        s.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
          new java.util.concurrent.ThreadFactory {
            override def newThread(r: Runnable): Thread = {
              val t = new Thread(r, "graft-fixture-http")
              t.setDaemon(true)
              t
            }
          }))
        s.start()
        built = s
      }
    }, "graft-fixture-http-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    require(built != null, "fixture http server failed to start")
    built
  }

  private val registered = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Serve `localPath` at `/<basename>`; returns the full URL. Repeat
    * registrations of the same path are idempotent; a basename collision
    * between different paths is a caller bug and throws.
    */
  def serve(localPath: String): String = synchronized {
    val name = Paths.get(localPath).getFileName.toString
    registered.get(name) match {
      case Some(existing) =>
        require(existing == localPath,
          s"/$name already serves $existing, cannot also serve $localPath")
      case None =>
        val bytes = Files.readAllBytes(Paths.get(localPath))
        server.createContext(s"/$name", rangeHandler(bytes))
        registered.put(name, localPath)
    }
    s"http://127.0.0.1:${server.getAddress.getPort}/$name"
  }

  /** Serves the byte array with 206 partial-content for `Range: bytes=a-b`
    * requests and 200 full-body otherwise — the minimal contract
    * [[HttpRangeReader]] needs (probe + ranged GETs).
    */
  private def rangeHandler(bytes: Array[Byte]): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      try {
        Option(ex.getRequestHeaders.getFirst("Range")) match {
          case Some(r) if r.startsWith("bytes=") =>
            val parts = r.stripPrefix("bytes=").split("-", 2)
            val start = parts(0).toLong
            val end =
              if (parts.length < 2 || parts(1).isEmpty) bytes.length - 1L
              else math.min(parts(1).toLong, bytes.length - 1L)
            if (start > end || start >= bytes.length) {
              ex.getResponseHeaders.set("Content-Range", s"bytes */${bytes.length}")
              ex.sendResponseHeaders(416, -1)
            } else {
              val n = (end - start + 1).toInt
              ex.getResponseHeaders.set("Content-Range",
                s"bytes $start-$end/${bytes.length}")
              ex.getResponseHeaders.set("Accept-Ranges", "bytes")
              ex.sendResponseHeaders(206, n)
              ex.getResponseBody.write(bytes, start.toInt, n)
            }
          case _ =>
            ex.getResponseHeaders.set("Accept-Ranges", "bytes")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    }
  }
}

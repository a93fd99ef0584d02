package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkSpec
import graft.geo.Bbox
import graft.operators.Extract
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

/** URL-input coverage (reference serves its testdata over httptest,
  * cmd/gpq/command/command_test.go:22-37): a local HTTP server serves the
  * example fixture; extract must work against the URL.
  */
class RemoteSpec extends SparkSpec {

  test("scheme dispatch") {
    assert(Remote.resolve("/x/y.parquet") == "/x/y.parquet")
    assert(Remote.resolve("file:///x/y.parquet") == "file:///x/y.parquet")
    assert(Remote.resolve("s3a://bucket/key.parquet") == "s3a://bucket/key.parquet")
    intercept[IllegalArgumentException](Remote.resolve("ftp://x/y"))
  }

  test("http fetch + extract over a local server") {
    val bytes = Files.readAllBytes(
      Paths.get("src/test/resources/cases/example-v1.1.0.parquet"))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/example.parquet", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/example.parquet"
      val local = Remote.resolve(url)
      assert(local.endsWith(".parquet"))
      val gf = Extract(spark, local, Extract.Options(bbox = Some(Bbox(34, -7, 36, -6))))
      val rows = gf.df.collect()
      assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
    } finally server.stop(0)
  }

  test("lazy range reads: describe/extract issue partial-content requests") {
    val bytes = Files.readAllBytes(
      Paths.get("src/test/resources/cases/example-v1.1.0.parquet"))
    val rangeRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    val servedBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ranged.parquet", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val range = Option(ex.getRequestHeaders.getFirst("Range"))
        range match {
          case Some(r) if r.startsWith("bytes=") =>
            rangeRequests.incrementAndGet()
            val parts = r.stripPrefix("bytes=").split("-", 2)
            val start = parts(0).toLong
            val end = math.min(parts(1).toLong, bytes.length - 1L)
            val n = (end - start + 1).toInt
            servedBytes.addAndGet(n)
            ex.getResponseHeaders.set("Content-Range", s"bytes $start-$end/${bytes.length}")
            ex.getResponseHeaders.set("ETag", "\"fixture-v1\"")
            ex.sendResponseHeaders(206, n)
            ex.getResponseBody.write(bytes, start.toInt, n)
            ex.close()
          case _ =>
            servedBytes.addAndGet(bytes.length)
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
        }
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/ranged.parquet"
      // resolve keeps the URL remote and installs the http FileSystem
      assert(Remote.resolve(url, Some(spark)) == url)

      // footer-only read (describe shape): a few KB, never the data pages
      val meta = graft.meta.FooterIO.readGeoMetadata(url)
      assert(meta.isDefined && meta.get.primaryColumn == "geometry")
      assert(rangeRequests.get() > 0, "expected ranged GETs, saw none")
      assert(servedBytes.get() < bytes.length,
        s"footer read fetched ${servedBytes.get()} of ${bytes.length} bytes — not lazy")

      // full extract over http still answers correctly
      val gf = Extract(spark, url, Extract.Options(bbox = Some(Bbox(34, -7, 36, -6))))
      val rows = gf.df.collect()
      assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")
    } finally server.stop(0)
  }

  test("range reader probes size and reads at offsets") {
    val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/blob.bin", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val r = Option(ex.getRequestHeaders.getFirst("Range")).getOrElse("")
        val parts = r.stripPrefix("bytes=").split("-", 2)
        val start = parts(0).toLong
        val end = math.min(parts(1).toLong, payload.length - 1L)
        val n = (end - start + 1).toInt
        ex.getResponseHeaders.set("Content-Range", s"bytes $start-$end/${payload.length}")
        ex.sendResponseHeaders(206, n)
        ex.getResponseBody.write(payload, start.toInt, n)
        ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/blob.bin"
      val reader = new HttpRangeReader(url)
      assert(reader.size == payload.length)
      val dst = new Array[Byte](100)
      // read within the probe buffer (first 512 bytes): no extra request
      val before = reader.requestCount
      assert(reader.readAt(100, dst, 0, 100) == 100)
      assert(dst.toSeq == payload.slice(100, 200).toSeq)
      assert(reader.requestCount == before)
      // read past the buffer: exactly one >=1KB ranged GET
      assert(reader.readAt(3000, dst, 0, 100) == 100)
      assert(dst.toSeq == payload.slice(3000, 3100).toSeq)
      assert(reader.requestCount == before + 1)
      // EOF
      assert(reader.readAt(4096, dst, 0, 1) == -1)
    } finally server.stop(0)
  }

  test("follow-up GET answered 200 fails loudly instead of mis-offsetting") {
    // a server that honors Range on the probe but then stops (equivalently:
    // an If-Range validator mismatch after the resource changed) — the
    // 200 body starts at offset 0, so serving it as if at `pos` would
    // corrupt reads; the reader must throw
    val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    val served = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/flaky.bin", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (served.getAndIncrement() == 0) {
          val r = Option(ex.getRequestHeaders.getFirst("Range")).getOrElse("")
          val parts = r.stripPrefix("bytes=").split("-", 2)
          val start = parts(0).toLong
          val end = math.min(parts(1).toLong, payload.length - 1L)
          val n = (end - start + 1).toInt
          ex.getResponseHeaders.set("Content-Range", s"bytes $start-$end/${payload.length}")
          ex.sendResponseHeaders(206, n)
          ex.getResponseBody.write(payload, start.toInt, n)
        } else {
          ex.sendResponseHeaders(200, payload.length)
          ex.getResponseBody.write(payload)
        }
        ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/flaky.bin"
      val reader = new HttpRangeReader(url)
      assert(reader.size == payload.length)
      val dst = new Array[Byte](100)
      val e = intercept[java.io.IOException](reader.readAt(3000, dst, 0, 100))
      assert(e.getMessage.contains("206"), e.getMessage)
    } finally server.stop(0)
  }

  test("geojson reads through a non-local Hadoop FileSystem (http)") {
    // the GeoJSON source opens inputs via FileSystem.open, so a remote
    // FeatureCollection converts without local staging
    val json =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"one","v":1},
        | "geometry":{"type":"Point","coordinates":[1,2]}},
        |{"type":"Feature","properties":{"name":"two","v":2},
        | "geometry":{"type":"Point","coordinates":[3,4]}}]}""".stripMargin
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fc.geojson", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/fc.geojson"
      val df = GeoJson.read(spark, url, minFeatures = 1)
      val rows = df.orderBy("name").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[String]("name")).toSeq == Seq("one", "two"))
      assert(rows.forall(r => r.getAs[Array[Byte]]("geometry") != null))
    } finally server.stop(0)
  }

  test("http error surfaces") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/missing.parquet", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(404, -1); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/missing.parquet"
      val e = intercept[java.io.IOException](Remote.resolve(url))
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }
}

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

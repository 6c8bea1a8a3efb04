package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class HttpObjectFileSystemSpec extends AnyFunSuite {

  private def withServer[A](payload: Array[Byte])(body: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/obj", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod == "HEAD") {
            ex.getResponseHeaders.set("Content-Length", payload.length.toString)
            ex.sendResponseHeaders(200, -1L)
          } else {
            ex.sendResponseHeaders(200, payload.length.toLong)
            ex.getResponseBody.write(payload)
          }
        } finally ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/obj")
    finally server.stop(0)
  }

  private def fsFor(url: String): HttpObjectFileSystem = {
    val fs = new HttpObjectFileSystem
    fs.initialize(java.net.URI.create(url), new Configuration())
    fs
  }

  test("getFileStatus reports the true object length via HEAD") {
    val bytes = "hello, bucket".getBytes("UTF-8")
    withServer(bytes) { url =>
      val st = fsFor(url).getFileStatus(new Path(url))
      assert(st.getLen == bytes.length)
      assert(!st.isDirectory)
    }
  }

  test("listStatus of an object is the object itself") {
    withServer("x".getBytes) { url =>
      val ls = fsFor(url).listStatus(new Path(url))
      assert(ls.length == 1 && ls.head.getLen == 1)
    }
  }

  test("stream supports forward skip and backward reopen seeks") {
    val bytes = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
      .getBytes("UTF-8")
    withServer(bytes) { url =>
      val in = fsFor(url).open(new Path(url), 4096)
      in.seek(0L)
      assert(in.read() == bytes(0))
      in.seek(50L)                       // forward: skip
      assert(in.getPos == 50L && in.read() == bytes(50))
      in.seek(10L)                       // backward: reopen
      assert(in.getPos == 10L && in.read() == bytes(10))
      val buf = new Array[Byte](20)
      assert(in.read(buf, 0, 20) > 0)
      in.close()
    }
  }

  test("missing object surfaces as FileNotFoundException") {
    withServer("x".getBytes) { url =>
      val bad = url.replace("/obj", "/nope")
      intercept[java.io.FileNotFoundException] {
        fsFor(url).getFileStatus(new Path(bad))
      }
    }
  }
}
// Columnar formats drive the seek path hard (parquet reads its footer
// first — a backward seek on a stream opened at zero): prove the
// connector serves them correctly, not just sequential CSV.
class HttpParquetSpec extends graft.SparkSpec {
  import spark.implicits._

  test("parquet reads correctly through the seek-emulating http connector") {
    val dir = graft.Gate.tmpDir("http_parquet_")
    val data = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "s")
    data.coalesce(1).write.mode("overwrite").parquet(dir)
    val part = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.parquet",
      new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit =
          try {
            if (ex.getRequestMethod == "HEAD") {
              ex.getResponseHeaders.set("Content-Length",
                bytes.length.toString)
              ex.sendResponseHeaders(200, -1L)
            } else {
              ex.sendResponseHeaders(200, bytes.length.toLong)
              ex.getResponseBody.write(bytes)
            }
          } finally ex.close()
      })
    server.start()
    try {
      spark.sparkContext.hadoopConfiguration.set("fs.http.impl",
        "graft.sources.HttpObjectFileSystem")
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.parquet"
      val back = spark.read.parquet(url).as[(Long, String)].collect().sorted
      assert(back.toSeq == (1L to 100L).map(i => (i, s"row$i")))
    } finally server.stop(0)
  }
}

package graft.billing

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** S7 download-with-HTTP-fallback, mirrored on the reference's test
  * coverage (ref `tests/pipeline/test_s3_utils.py:159-213`) but against a
  * real loopback HTTP stub instead of mocks — no network egress.
  */
class FetchSpec extends AnyFunSuite {

  test("parseUrl splits protocol/domain/path like the reference") {
    assert(Fetch.parseUrl("https://example.com/data") ==
      ("https", "example.com", "data"))
    assert(Fetch.parseUrl("example.com/data/x") ==
      ("https", "example.com", "data/x"))
    assert(Fetch.parseUrl("s3://bucket/base") == ("s3", "bucket", "base"))
    assert(Fetch.parseUrl("") == ("https", "", ""))
    assert(Fetch.parseUrl(null) == ("https", "", ""))
  }

  test("resolveHttpUrl reconstructs public URLs for connector paths") {
    val bucket = "https://example.com/data"
    // already-HTTP passes through untouched
    assert(Fetch.resolveHttpUrl("https://x.org/a.csv", bucket) ==
      "https://x.org/a.csv")
    // domain-bearing path keeps its domain, gains the protocol
    assert(Fetch.resolveHttpUrl(
      "example.com/data/year=2025/month=04/day=23/billing.csv", bucket) ==
      "https://example.com/data/year=2025/month=04/day=23/billing.csv")
    // s3:// prefix stripped, bucket domain prepended
    assert(Fetch.resolveHttpUrl("s3://other/data/b.csv",
      "https://example.com/data") == "https://example.com/other/data/b.csv")
    // relative path gets domain prepended
    assert(Fetch.resolveHttpUrl("data/b.csv", bucket) ==
      "https://example.com/data/b.csv")
  }

  private def withStub(body: String)(f: (Int, () => Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var hits = 0
    server.createContext("/", { exchange =>
      hits += 1
      if (exchange.getRequestURI.getPath.endsWith("missing.csv")) {
        exchange.sendResponseHeaders(404, -1)
      } else {
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      }
      exchange.close()
    })
    server.start()
    try f(server.getAddress.getPort, () => hits)
    finally server.stop(0)
  }

  test("downloadPartition falls back to HTTP when the connector fails") {
    withStub("test data") { (port, hits) =>
      val dir = Files.createTempDirectory("fetch_spec").toFile
      val bucket = s"http://127.0.0.1:$port/data"
      val part = Fetch.HivePartition("2025", "04", "23",
        s"127.0.0.1:$port/data/year=2025/month=04/day=23",
        Seq(s"127.0.0.1:$port/data/year=2025/month=04/day=23/billing.csv"))
      var primaryCalls = 0
      val failingPrimary = (_: String, _: File) => {
        primaryCalls += 1
        throw new RuntimeException("S3 download failed")
      }
      val got = Fetch.downloadPartition(part, dir, bucket, failingPrimary)
      assert(primaryCalls == 1)
      assert(hits() == 1)
      assert(got.length == 1)
      assert(got.head.viaFallback)
      assert(got.head.file.getName == "billing-2025-04-23-billing.csv")
      assert(new String(Files.readAllBytes(got.head.file.toPath),
        StandardCharsets.UTF_8) == "test data")
    }
  }

  test("primary connector success skips the HTTP fallback") {
    withStub("unused") { (port, hits) =>
      val dir = Files.createTempDirectory("fetch_spec").toFile
      val part = Fetch.HivePartition("2025", "04", "23", "p",
        Seq(s"127.0.0.1:$port/data/year=2025/month=04/day=23/billing.csv"))
      val workingPrimary = (_: String, dest: File) => {
        Files.write(dest.toPath, "via connector".getBytes(StandardCharsets.UTF_8))
        ()
      }
      val got = Fetch.downloadPartition(part, dir,
        s"http://127.0.0.1:$port/data", workingPrimary)
      assert(hits() == 0)
      assert(got.length == 1)
      assert(!got.head.viaFallback)
      assert(new String(Files.readAllBytes(got.head.file.toPath),
        StandardCharsets.UTF_8) == "via connector")
    }
  }

  test("per-file failures are collected, not thrown") {
    withStub("ok") { (port, _) =>
      val dir = Files.createTempDirectory("fetch_spec").toFile
      val bucket = s"http://127.0.0.1:$port/data"
      // first file 404s on fallback too; second succeeds — the reference
      // logs-and-continues (s3_utils.py:244-246)
      val part = Fetch.HivePartition("2025", "04", "23", "p", Seq(
        s"127.0.0.1:$port/data/missing.csv",
        s"127.0.0.1:$port/data/billing.csv"))
      val failingPrimary = (_: String, _: File) =>
        throw new RuntimeException("connector down")
      val got = Fetch.downloadPartition(part, dir, bucket, failingPrimary)
      assert(got.length == 1)
      assert(got.head.file.getName == "billing-2025-04-23-billing.csv")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.Security

/** URL/filename security checks — the reference's
  * tests/unit/various/test_security.py matrix over
  * mindsdb/utilities/security.py. */
class SecuritySpec extends AnyFunSuite {

  test("validate_urls: origin matching is exact on (scheme, netloc)") {
    // allowed
    assert(Security.validateUrls(Seq("https://site.com/file"), Seq("https://site.com")))
    // scheme mismatch is NOT allowed
    assert(!Security.validateUrls(Seq("http://site.com/file"), Seq("https://site.com")))
    // different host
    assert(!Security.validateUrls(Seq("https://site.com/file"), Seq("https://example.com")))
    // subdomain is a different origin
    assert(!Security.validateUrls(Seq("https://sub.site.com/f"), Seq("https://site.com")))
    // multiple allowed origins
    assert(Security.validateUrls(Seq("https://b.com/f"),
      Seq("https://a.com", "https://b.com")))
    // port is part of the origin
    assert(!Security.validateUrls(Seq("https://site.com:8080/f"), Seq("https://site.com")))
    assert(Security.validateUrls(Seq("https://site.com:8080/f"),
      Seq("https://site.com:8080")))
  }

  test("validate_urls: disallowed list filters even when the allow list is empty") {
    // empty allow list → everything passes except the disallowed
    assert(Security.validateUrls(Seq("https://any.com/f"), Nil, Nil))
    assert(!Security.validateUrls(Seq("https://bad.com/f"), Nil, Seq("https://bad.com")))
    assert(Security.validateUrls(Seq("https://ok.com/f"), Nil, Seq("https://bad.com")))
    // allowed AND disallowed: disallowed wins
    assert(!Security.validateUrls(Seq("https://site.com/f"),
      Seq("https://site.com"), Seq("https://site.com")))
    // multiple urls: one disallowed fails the batch
    assert(!Security.validateUrls(Seq("https://ok.com/a", "https://bad.com/b"),
      Nil, Seq("https://bad.com")))
  }

  test("validate_urls: schemeless or hostless URLs raise, never pass") {
    intercept[Exception](Security.validateUrls(Seq("site.com/file"), Seq("https://site.com")))
    // malformed ALLOWED entries raise too (misconfiguration must be loud)
    intercept[Exception](Security.validateUrls(Seq("https://site.com/f"), Seq("site.com")))
    intercept[Exception](Security.validateUrls(Seq("https://site.com/f"), Nil, Seq("bad.com")))
  }

  test("clear_filename strips path-injection characters") {
    assert(Security.clearFilename("""a\/:*?"<>|b.csv""") === "ab.csv")
    assert(Security.clearFilename("../../etc/passwd") === "....etcpasswd")
    assert(Security.clearFilename("plain.csv") === "plain.csv")
    assert(Security.clearFilename(null) === null)
  }

  test("is_private_url flags loopback and unresolvable hosts") {
    assert(Security.isPrivateUrl("http://127.0.0.1:8080/x"))
    assert(Security.isPrivateUrl("http://localhost/x"))
    assert(Security.isPrivateUrl("not a url"))
  }

  // ---- passthrough transport guards (redirects + response cap) -------
  // A minimal JDK HttpServer stands in for the upstream: the guards
  // under test are transport-level, so they need a REAL HTTP exchange,
  // not a mock of the client.

  private def withStub(routes: Map[String, com.sun.net.httpserver.HttpExchange => Unit])
      (body: Int => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      srv.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) =>
        try h(ex) finally ex.close())
    }
    srv.start()
    try body(srv.getAddress.getPort) finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
      body: Array[Byte], headers: (String, String)* ): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) { ex.getResponseBody.write(body); ex.getResponseBody.flush() }
  }

  private def ptParams(port: Int): Map[String, String] = Map(
    "base_url" -> s"http://127.0.0.1:$port",
    "api_key" -> "sk-redirect-test-secret", "allowed_hosts" -> "*")

  private def ptGet(port: Int, path: String) =
    graft.server.Passthrough.call(ptParams(port),
      graft.server.Passthrough.Request("GET", path, Map.empty, Map.empty, None))

  test("passthrough follows same-host redirects, refuses cross-host ones") {
    import graft.server.Passthrough.PassthroughException
    withStub(Map(
      "/hop" -> (ex => respond(ex, 302, Array.emptyByteArray,
        "Location" -> "/target")),
      "/target" -> (ex => respond(ex, 200, "landed".getBytes("UTF-8"))),
      "/cross" -> (ex => respond(ex, 302, Array.emptyByteArray,
        // the SSRF-via-redirect shape: allowlisted upstream bounces the
        // credentialed request toward a link-local metadata address
        "Location" -> "http://169.254.169.254/latest/meta-data")),
      "/loop" -> (ex => respond(ex, 302, Array.emptyByteArray,
        "Location" -> "/loop")),
      "/bare" -> (ex => respond(ex, 302, Array.emptyByteArray))
    )) { port =>
      // same-host redirect is followed transparently
      val ok = ptGet(port, "/hop")
      assert(ok.statusCode === 200 && ok.body === graft.server.Json.Str("landed"))
      // cross-host redirect refused BEFORE any second request is sent
      val e = intercept[PassthroughException](ptGet(port, "/cross"))
      assert(e.errorCode === "host_not_allowed")
      assert(e.getMessage.contains("cross-host"))
      // redirect cycles bound at MaxRedirects
      val loop = intercept[PassthroughException](ptGet(port, "/loop"))
      assert(loop.getMessage.contains("redirects"))
      // a 3xx without Location is a legitimate upstream answer, returned
      val bare = ptGet(port, "/bare")
      assert(bare.statusCode === 302)
    }
  }

  test("passthrough refuses same-host cross-port and cross-scheme redirects") {
    import graft.server.Passthrough.PassthroughException
    withStub(Map(
      "/port" -> (ex => respond(ex, 302, Array.emptyByteArray,
        // same host, DIFFERENT port: the bearer token must not be
        // re-sent to a different service that happens to share the host
        "Location" -> s"http://127.0.0.1:${ex.getLocalAddress.getPort + 1}/x")),
      "/scheme" -> (ex => respond(ex, 302, Array.emptyByteArray,
        // https target from an http origin is a scheme change too — the
        // guard is symmetric, covering the https→http downgrade class
        // (CVE-2018-18074) without needing a TLS stub
        "Location" -> s"https://127.0.0.1:${ex.getLocalAddress.getPort}/x"))
    )) { port =>
      val ep = intercept[PassthroughException](ptGet(port, "/port"))
      assert(ep.errorCode === "host_not_allowed")
      assert(ep.getMessage.contains("ports"))
      val es = intercept[PassthroughException](ptGet(port, "/scheme"))
      assert(es.errorCode === "host_not_allowed")
      assert(es.getMessage.contains("schemes"))
    }
  }

  test("passthrough response cap: exactly 10 MiB passes, one byte more aborts") {
    import graft.server.Passthrough.{MaxResponseBytes, PassthroughException}
    val atCap = new Array[Byte](MaxResponseBytes)
    java.util.Arrays.fill(atCap, 'x'.toByte)
    val overCap = new Array[Byte](MaxResponseBytes + 1)
    java.util.Arrays.fill(overCap, 'x'.toByte)
    withStub(Map(
      "/at" -> (ex => respond(ex, 200, atCap)),
      "/over" -> (ex => respond(ex, 200, overCap))
    )) { port =>
      val ok = ptGet(port, "/at")
      assert(ok.statusCode === 200)
      assert(ok.body.asInstanceOf[graft.server.Json.Str].s.length === MaxResponseBytes)
      val e = intercept[PassthroughException](ptGet(port, "/over"))
      assert(e.errorCode === "invalid_request")
      assert(e.getMessage.contains(s"$MaxResponseBytes"))
    }
  }
}

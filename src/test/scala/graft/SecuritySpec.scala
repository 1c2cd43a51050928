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
}

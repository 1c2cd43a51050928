package graft.server

/** URL/filename security checks guarding inbound file sources — the
  * reference's mindsdb/utilities/security.py (validate_urls:55,
  * clear_filename:21, is_private_url:6), exercised by its
  * tests/unit/various/test_security.py matrix. Origin = lowercased
  * (scheme, netloc): `http://site.com` and `https://site.com` are
  * DIFFERENT origins, and a URL without scheme or host is an error,
  * never a pass.
  */
object Security {

  /** (scheme, netloc) of a URL, lowercased; netloc keeps port and
    * userinfo like python's urlparse. Throws when either is absent —
    * "URL must include protocol and host name". */
  def splitUrl(url: String): (String, String) = {
    val u = new java.net.URI(url)
    val scheme = Option(u.getScheme).getOrElse("")
    val netloc = Option(u.getRawAuthority).getOrElse("")
    require(scheme.nonEmpty && netloc.nonEmpty,
      s"URL must include protocol and host name: $url")
    (scheme.toLowerCase, netloc.toLowerCase)
  }

  /** True when every URL's origin is inside `allowed` (when non-empty)
    * and outside `disallowed`. Malformed URLs on ANY side throw. */
  def validateUrls(urls: Seq[String], allowed: Seq[String],
      disallowed: Seq[String] = Nil): Boolean = {
    val allowedO = allowed.map(splitUrl)
    val disallowedO = disallowed.map(splitUrl).toSet
    val origins = urls.map(splitUrl)
    (allowedO.isEmpty || origins.forall(allowedO.contains)) &&
      origins.forall(!disallowedO.contains(_))
  }

  /** Strip path-injection characters from a filename (security.py:21);
    * `..` is harmless after separators are gone. */
  def clearFilename(name: String): String =
    if (name == null) name
    else name.filterNot("\\/:*?\"<>|".contains(_))

  /** True when the URL's host resolves to a private/loopback/link-local
    * address (SSRF guard on cloud deployments) — or cannot resolve. */
  def isPrivateUrl(url: String): Boolean =
    try {
      val host = new java.net.URI(url).getHost
      if (host == null) true
      else {
        val a = java.net.InetAddress.getByName(host)
        a.isLoopbackAddress || a.isSiteLocalAddress || a.isLinkLocalAddress ||
          a.isAnyLocalAddress
      }
    } catch { case _: Exception => true }
}

package graft.server

import Json.{Arr, Bool, Null, Num, Obj, Str, Value, num, obj, str}

/** REST API passthrough for integration datasources — the reference's
  * `PassthroughMixin` (integrations/libs/passthrough.py) +
  * request/response types (libs/passthrough_types.py) re-expressed for
  * the JVM: a caller POSTs `{method, path, query, headers, body}` to
  * `/api/integrations/<name>/passthrough` and the engine forwards the
  * request to the datasource's upstream API with the stored credentials
  * injected, under the same guardrails the reference enforces:
  *
  *   - method allowlist (GET/POST/PUT/PATCH/DELETE) + optional per-
  *     datasource `allowed_methods` narrowing (405 on others)
  *   - caller headers filtered (no Authorization/Host/Cookie/
  *     Content-Length/Connection, no `proxy-*`)
  *   - the upstream hostname must match the datasource allowlist;
  *     private/loopback IP literals refuse unless allowed_hosts='*'
  *     (SSRF guard, passthrough.py:53-68,185-200)
  *   - request 1 MiB / response 10 MiB caps
  *   - stored secrets scrubbed out of response headers and body
  *     ([REDACTED_API_KEY]), hop-by-hop response headers stripped
  *
  * A datasource opts in by carrying `base_url` in its connection params
  * (the reference's structural `PassthroughProtocol` check); `api_key`
  * is the bearer secret. Connection params live in the same flat
  * string map `CREATE DATABASE … PARAMETERS` writes, so list-ish params
  * (`allowed_hosts`, `allowed_methods`) are comma-separated strings and
  * `default_headers` is the `{'k': 'v'}` dict spelling. */
object Passthrough {

  val AllowedMethods: Set[String] = Set("GET", "POST", "PUT", "PATCH", "DELETE")
  val ForbiddenRequestHeaders: Set[String] =
    Set("authorization", "host", "cookie", "content-length", "connection")
  val HopByHopResponseHeaders: Set[String] =
    Set("connection", "keep-alive", "proxy-authenticate", "proxy-authorization",
      "te", "trailers", "transfer-encoding", "upgrade", "content-length")
  val RedactedSentinel = "[REDACTED_API_KEY]"
  val MaxRequestBytes: Int = 1 * 1024 * 1024
  val MaxResponseBytes: Int = 10 * 1024 * 1024
  val TimeoutSeconds: Int = 30
  val MaxRedirects: Int = 5

  final case class Request(method: String, path: String,
      query: Map[String, String], headers: Map[String, String],
      body: Option[Value])

  final case class Response(statusCode: Int, headers: Map[String, String],
      body: Value, contentType: Option[String])

  /** Typed failure with the reference's error envelope
    * (`{error_code, message}` at `http_status`). */
  final class PassthroughException(message: String, val errorCode: String,
      val httpStatus: Int) extends RuntimeException(message)

  def validationError(msg: String) =
    new PassthroughException(msg, "invalid_request", 400)
  def configError(msg: String) =
    new PassthroughException(msg, "config_error", 500)
  def hostNotAllowed(msg: String) =
    new PassthroughException(msg, "host_not_allowed", 400)
  def notSupported(msg: String) =
    new PassthroughException(msg, "passthrough_not_supported", 501)

  /** The structural opt-in check (the reference's `isinstance(handler,
    * PassthroughProtocol)`): a datasource supports passthrough iff its
    * params carry the connection shape the mixin needs. */
  def supports(params: Map[String, String]): Boolean =
    params.contains("base_url")

  /** passthrough_types.py `_parse_passthrough_request`: validate the raw
    * JSON payload into a typed request. */
  def parseRequest(payload: Value): Request = {
    val o = payload match {
      case o: Obj => o
      case _ => throw validationError("request body must be a JSON object")
    }
    val method = o.fields.get("method").collect { case Str(s) => s }
      .map(_.toUpperCase).getOrElse("")
    if (!AllowedMethods.contains(method))
      throw validationError(
        s"'method' must be one of ${AllowedMethods.toSeq.sorted.mkString("[", ", ", "]")}")
    val path = o.fields.get("path").collect { case Str(s) => s }.getOrElse("")
    if (!path.startsWith("/"))
      throw validationError("'path' must be a string starting with '/'")
    def strMap(key: String): Map[String, String] = o.fields.get(key) match {
      case None | Some(Null) => Map.empty
      case Some(Obj(fs)) => fs.map { case (k, v) => k -> (v match {
        case Str(s) => s
        case Num(_, raw) => raw
        case Bool(b) => b.toString
        case other => Json.write(other)
      }) }
      case Some(_) => throw validationError(s"'$key' must be an object")
    }
    val headers = strMap("headers")
    headers.keys.foreach { h =>
      val lo = h.toLowerCase
      if (ForbiddenRequestHeaders.contains(lo) || lo.startsWith("proxy-"))
        throw validationError(s"header '$h' is not allowed in passthrough requests")
    }
    Request(method, path, strMap("query"), headers, o.fields.get("body"))
  }

  /** `{'k': 'v'}` dict param spelling → Map (the same tokenizer the
    * KB model dicts use). */
  private def dictParam(s: String): Map[String, String] = {
    def unq(x: String) = x.trim.stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
    graft.sqlx.Commands.splitTop(s.trim.stripPrefix("{").stripSuffix("}"), ',')
      .flatMap(_.split(":", 2) match {
        case Array(k, v) => Some(unq(k) -> unq(v))
        case _ => None
      }).toMap
  }

  private def listParam(params: Map[String, String], key: String): Seq[String] =
    params.get(key).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** passthrough.py:53-68 `_is_private_host`: IP LITERALS only — DNS is
    * deliberately not resolved (internal DNS names are the operator's
    * call via allowed_hosts). */
  private[server] def isPrivateHost(host: String): Boolean =
    try {
      // only literal forms count; getByName would resolve DNS, so gate
      // on the literal syntax first
      val isLiteral = host.matches("\\d{1,3}(\\.\\d{1,3}){3}") ||
        host.contains(":")
      if (!isLiteral) false
      else {
        val ip = java.net.InetAddress.getByName(host)
        ip.isLoopbackAddress || ip.isSiteLocalAddress || ip.isLinkLocalAddress ||
          ip.isMulticastAddress || ip.isAnyLocalAddress
      }
    } catch { case _: Exception => false }

  private def resolveUrl(params: Map[String, String], path: String): (String, String) = {
    val base = params.get("base_url").map(_.stripSuffix("/")).getOrElse(
      throw configError("base_url is not configured for this datasource"))
    val url = s"$base$path"
    val parsed = try new java.net.URI(url) catch {
      case _: Exception => throw validationError(s"resolved URL is not valid: $url")
    }
    if (parsed.getScheme != "http" && parsed.getScheme != "https")
      throw validationError(s"resolved URL is not valid: $url")
    val host = Option(parsed.getHost).getOrElse(
      throw validationError(s"resolved URL is not valid: $url"))
    (url, host)
  }

  private def checkHostAllowed(params: Map[String, String], host: String): Unit = {
    val allow = listParam(params, "allowed_hosts") match {
      case Nil => Seq(host)
      case l => l
    }
    if (allow == Seq("*")) return
    if (!allow.exists(_.equalsIgnoreCase(host)))
      throw hostNotAllowed(s"host '$host' is not in the datasource allowlist")
    if (isPrivateHost(host))
      throw hostNotAllowed(s"host '$host' resolves to a private/loopback " +
        "address; set allowed_hosts='*' to bypass this check (explicit " +
        "listing is ignored for private IPs)")
  }

  private def bearerToken(params: Map[String, String]): String =
    params.getOrElse("api_key",
      throw configError("bearer token ('api_key') is missing from connection_data"))

  private def secretsToScrub(params: Map[String, String]): Seq[String] = {
    val defaults = params.get("default_headers").map(dictParam).getOrElse(Map.empty)
    (params.get("api_key").toSeq ++
      defaults.values.filter(_.length >= 16)).filter(_.nonEmpty)
  }

  private def scrub(text: String, secrets: Seq[String]): String =
    secrets.foldLeft(text)((t, s) => t.replace(s, RedactedSentinel))

  /** The mixin's `api_passthrough`: validate → resolve → guard → forward
    * with credential injection → filter/scrub the response. */
  def call(params: Map[String, String], req: Request): Response = {
    // per-datasource method narrowing (allowed_methods connection param)
    val cfgMethods = listParam(params, "allowed_methods").map(_.toUpperCase)
    if (cfgMethods.nonEmpty) {
      val unknown = cfgMethods.filterNot(AllowedMethods)
      if (unknown.nonEmpty)
        throw configError(s"'allowed_methods' contains unsupported verbs: " +
          s"${unknown.sorted.mkString("[", ", ", "]")}. " +
          s"Allowed: ${AllowedMethods.toSeq.sorted.mkString("[", ", ", "]")}")
      if (!cfgMethods.contains(req.method))
        throw new PassthroughException(
          s"method '${req.method}' is not permitted by this datasource",
          "method_not_allowed", 405)
    }
    val bodyStr = req.body.filterNot(_ == Null).map {
      case Str(s) => s
      case v => Json.write(v)
    }
    bodyStr.foreach { b =>
      if (b.getBytes("UTF-8").length > MaxRequestBytes)
        throw validationError(s"request body exceeded $MaxRequestBytes bytes")
    }
    val (url0, host) = resolveUrl(params, req.path)
    checkHostAllowed(params, host)
    val token = bearerToken(params)

    // outgoing headers: defaults + filtered caller headers + auth + marker
    val defaults = params.get("default_headers").map(dictParam).getOrElse(Map.empty)
    val authName = params.getOrElse("auth_header_name", "Authorization")
    val authFormat = params.getOrElse("auth_header_format", "Bearer {token}")
    val outHeaders = defaults ++
      req.headers.filterNot { case (k, _) =>
        val lo = k.toLowerCase
        ForbiddenRequestHeaders.contains(lo) || lo.startsWith("proxy-")
      } +
      (authName -> authFormat.replace("{token}", token)) +
      ("X-Minds-Passthrough" -> "1")

    val qs = if (req.query.isEmpty) ""
      else req.query.toSeq.sortBy(_._1).map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString(if (url0.contains("?")) "&" else "?", "&", "")

    val jsonBody = req.body.exists(v => v != Null && !v.isInstanceOf[Str])
    def buildReq(uri: String, method: String, withBody: Boolean)
        : java.net.http.HttpRequest = {
      val builder = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(uri))
        .timeout(java.time.Duration.ofSeconds(TimeoutSeconds.toLong))
      outHeaders.foreach { case (k, v) =>
        try builder.header(k, v)
        catch { case _: IllegalArgumentException =>
          throw validationError(s"header '$k' is not allowed in passthrough requests") }
      }
      val publisher = bodyStr.filter(_ => withBody) match {
        case Some(b) => java.net.http.HttpRequest.BodyPublishers.ofString(b)
        case None => java.net.http.HttpRequest.BodyPublishers.noBody()
      }
      if (jsonBody && withBody &&
          !outHeaders.keys.exists(_.equalsIgnoreCase("content-type")))
        builder.header("Content-Type", "application/json")
      builder.method(method, publisher).build()
    }
    // redirects are followed MANUALLY (client policy NEVER): an
    // allowlisted upstream 302ing to another host (the classic
    // SSRF-via-redirect hole — e.g. a metadata service) must not
    // receive the injected bearer token. Same-host redirects follow up
    // to MaxRedirects; 303 downgrades to a body-less GET per RFC 9110.
    val http = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
      .connectTimeout(java.time.Duration.ofSeconds(TimeoutSeconds.toLong)).build()
    val redirectCodes = Set(301, 302, 303, 307, 308)
    var curUri = url0 + qs
    var curMethod = req.method
    var withBody = bodyStr.isDefined
    var resp = http.send(buildReq(curUri, curMethod, withBody),
      java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    var hops = 0
    var following = true
    while (following && redirectCodes.contains(resp.statusCode())) {
      val loc = resp.headers().firstValue("Location")
      if (!loc.isPresent) following = false // no target: hand the 3xx back
      else {
        try resp.body().close() catch { case _: Exception => () }
        if (hops >= MaxRedirects)
          throw validationError(s"upstream exceeded $MaxRedirects redirects")
        val target = java.net.URI.create(curUri).resolve(loc.get)
        val tScheme = Option(target.getScheme).map(_.toLowerCase)
        if (!tScheme.contains("http") && !tScheme.contains("https"))
          throw hostNotAllowed(s"upstream redirected to non-HTTP URL '$target'")
        val tHost = Option(target.getHost).getOrElse(
          throw hostNotAllowed(s"upstream redirect target is not resolvable: '$target'"))
        if (!tHost.equalsIgnoreCase(host))
          throw hostNotAllowed(s"upstream redirected to '$tHost' — " +
            "cross-host redirects are not followed")
        // scheme + effective port must ALSO match: a same-host
        // https→http (or cross-port) redirect would re-send the injected
        // bearer token over cleartext / to a different service — the
        // CVE-2018-18074 class the reference transport guards by
        // stripping auth on downgrade; here the credentialed request is
        // simply not followed.
        val cur = java.net.URI.create(curUri)
        def effPort(u: java.net.URI): Int =
          if (u.getPort >= 0) u.getPort
          else if (Option(u.getScheme).exists(_.equalsIgnoreCase("https"))) 443
          else 80
        if (!tScheme.exists(s0 => Option(cur.getScheme).exists(_.equalsIgnoreCase(s0))))
          throw hostNotAllowed(s"upstream redirected across schemes " +
            s"('${cur.getScheme}' → '${tScheme.getOrElse("")}') — credentialed " +
            "redirects must stay on the original scheme")
        if (effPort(target) != effPort(cur))
          throw hostNotAllowed(s"upstream redirected across ports " +
            s"(${effPort(cur)} → ${effPort(target)}) — credentialed " +
            "redirects must stay on the original port")
        if (resp.statusCode() == 303) { curMethod = "GET"; withBody = false }
        curUri = target.toString
        hops += 1
        resp = http.send(buildReq(curUri, curMethod, withBody),
          java.net.http.HttpResponse.BodyHandlers.ofInputStream())
      }
    }

    // streamed, capped read (the reference's _read_capped_body, 64 KiB
    // chunks): the cap aborts the TRANSFER, never buffers an oversized
    // body first — ofByteArray() would OOM on a hostile upstream before
    // any length check ran
    val raw = {
      val in = resp.body()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      try {
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size() + n > MaxResponseBytes)
            throw validationError(s"response body exceeded $MaxResponseBytes bytes")
          out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally in.close()
      out.toByteArray
    }
    val secrets = secretsToScrub(params)
    val contentType = Option(resp.headers().firstValue("Content-Type").orElse(""))
      .filter(_.nonEmpty)
    val text = scrub(new String(raw, "UTF-8"), secrets)
    val body: Value =
      if (contentType.exists(_.toLowerCase.contains("application/json")) && text.nonEmpty)
        try Json.parse(text) catch { case _: Exception => Str(text) }
      else Str(text)
    val outRespHeaders = {
      import scala.jdk.CollectionConverters._
      resp.headers().map().asScala.collect {
        case (k, vs) if !HopByHopResponseHeaders.contains(k.toLowerCase) &&
            k != ":status" =>
          k -> scrub(vs.asScala.mkString(", "), secrets)
      }.toMap
    }
    Response(resp.statusCode(), outRespHeaders, body,
      contentType.map(_.split(";", 2).head.trim).filter(_.nonEmpty))
  }

  /** The mixin's `test_passthrough` (passthrough.py:422-470): run the
    * datasource's canonical sanity-check request (`test_path` param) and
    * classify the outcome. */
  def test(params: Map[String, String]): Obj = {
    params.get("test_path") match {
      case None =>
        obj("ok" -> Bool(false), "error_code" -> str("not_implemented"),
          "message" -> str("this handler does not define a passthrough test request"))
      case Some(path) =>
        val start = System.nanoTime()
        try {
          val resp = call(params, Request("GET", path, Map.empty, Map.empty, None))
          val latency = ((System.nanoTime() - start) / 1e6).toInt
          val host = try Some(resolveUrl(params, path)._2) catch { case _: Exception => None }
          val base = Seq[(String, Value)](
            "status_code" -> num(resp.statusCode.toLong),
            "host" -> host.map(str).getOrElse(Null),
            "latency_ms" -> num(latency.toLong))
          if (resp.statusCode >= 200 && resp.statusCode < 300)
            Obj((Seq[(String, Value)]("ok" -> Bool(true)) ++ base).toMap)
          else if (resp.statusCode == 401 || resp.statusCode == 403)
            Obj((Seq[(String, Value)]("ok" -> Bool(false),
              "error_code" -> str("auth_failed"),
              "message" -> str("upstream rejected credentials; base URL and allowlist look correct"))
              ++ base).toMap)
          else
            Obj((Seq[(String, Value)]("ok" -> Bool(false),
              "error_code" -> str("upstream_error"),
              "message" -> str(s"upstream answered ${resp.statusCode}"))
              ++ base).toMap)
        } catch {
          case e: PassthroughException =>
            obj("ok" -> Bool(false), "error_code" -> str(e.errorCode),
              "message" -> str(e.getMessage))
          case e: java.net.ConnectException =>
            obj("ok" -> Bool(false), "error_code" -> str("network"),
              "message" -> str(Option(e.getMessage).getOrElse("connection failed")))
          case e: java.net.http.HttpTimeoutException =>
            obj("ok" -> Bool(false), "error_code" -> str("timeout"),
              "message" -> str(Option(e.getMessage).getOrElse("timed out")))
          case e: Exception =>
            obj("ok" -> Bool(false), "error_code" -> str("unknown"),
              "message" -> str(Option(e.getMessage).getOrElse(e.toString)))
        }
    }
  }

  /** Response → the wire envelope (`_serialize_response`). */
  def serialize(resp: Response): Obj =
    obj("status_code" -> num(resp.statusCode.toLong),
      "headers" -> Obj(resp.headers.map { case (k, v) => k -> str(v) }),
      "body" -> resp.body,
      "content_type" -> resp.contentType.map(str).getOrElse(Null))
}

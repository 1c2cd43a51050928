package graft.server

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sqlx.Commands
import graft.catalog.{Catalog, Warehouse}
import Json._

/** HTTP REST entry point — the reference's second access path
  * (mindsdb/api/http/namespaces/sql.py:39-130 `POST /api/sql/query`),
  * plus the MCP `query` tool (mindsdb/api/mcp/tools/query.py:30) as a
  * JSON-RPC route on the same server.
  *
  * Response envelope matches the reference's SQLAnswer.dump_http_response
  * (api/executor/data_types/sql_answer.py):
  *  - `{"type":"ok","affected_rows":N,"context":{}}`
  *  - `{"type":"table","data":[[...],...],"column_names":[...],"context":{}}`
  *  - `{"type":"error","error_code":0,"error_message":"...","context":{}}`
  * with `response_format: "jsonlines" | "sse"` streaming variants
  * (stream_http_response_jsonlines/_sse: a column_names header line,
  * then one JSON array per row chunk).
  *
  * Built on the JDK's HttpServer — no framework, zero egress; all state
  * lives in the shared catalog/warehouse exactly like [[MysqlServer]].
  */
final class HttpApi(spark: SparkSession, sfDir: String, port: Int = 0) {

  private val catalog = new Catalog(spark, sfDir)
  private val warehouse = Warehouse.temp(spark)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 50)
  // one Commands per request would lose PREPARE state; the reference's
  // FakeMysqlProxy is also constructed per request but shares the
  // server-side controllers — our shared catalog/warehouse is that seam
  private def session() = new Commands(spark, catalog, warehouse)

  server.createContext("/api/sql/query", (ex: HttpExchange) => handleSql(ex))
  server.createContext("/api/status", (ex: HttpExchange) => handleStatus(ex))
  server.createContext("/mcp", (ex: HttpExchange) => handleMcp(ex))
  // daemon worker threads so an un-stopped server can never pin the JVM
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "http-api"); t.setDaemon(true); t })
  server.setExecutor(pool)

  def boundPort: Int = server.getAddress.getPort
  def start(): HttpApi = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  // ------------------------------------------------------------------

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  private def reply(ex: HttpExchange, status: Int, body: String,
                    contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handleStatus(ex: HttpExchange): Unit =
    reply(ex, 200, write(obj(
      "mindsdb_version" -> str("graft-spark"),
      "environment" -> str("local"))))

  private def handleSql(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "POST") {
        reply(ex, 405, write(errorEnvelope("use POST"))); return
      }
      val body = Json.parse(readBody(ex))
      val sqlOpt = body.get("query")
      sqlOpt match {
        case Some(Str(sql)) =>
          val format = body.get("response_format").collect { case Str(f) => f }
            .getOrElse("default")
          if (!Set("default", "jsonlines", "sse").contains(format)) {
            // reference: invalid stream format → HTTP 400
            reply(ex, 400, write(errorEnvelope("Invalid stream format")))
            return
          }
          runSql(sql) match {
            case env @ Obj(_) if format == "default" =>
              reply(ex, 200, write(env))
            case env => streamRows(ex, env, sse = format == "sse")
          }
        case _ =>
          // reference: missing/invalid "query" → HTTP 400 "Wrong arguments"
          reply(ex, 400, write(errorEnvelope(
            "Wrong arguments: please provide \"query\" with the request.")))
      }
    } catch {
      case e: Throwable =>
        try reply(ex, 500, write(errorEnvelope(
          Option(e.getMessage).getOrElse(e.toString))))
        catch { case _: Throwable => }
    }

  /** Execute and build the single-piece envelope. */
  private def runSql(sql: String): Obj =
    try {
      val df = session().execute(sql)
      val names = df.schema.fieldNames.toSeq
      if (names == Seq("status", "message") ||
          names == Seq("status", "message", "affected_rows")) {
        val row = df.collect().headOption
        val affected = row.filter(_.length > 2).map(_.getLong(2)).getOrElse(0L)
        obj("type" -> str("ok"), "affected_rows" -> num(affected),
          "context" -> obj())
      } else {
        val fields = df.schema.fields
        val data = df.collect().toSeq.map(r => rowJson(r, fields))
        obj("type" -> str("table"),
          "data" -> Arr(data),
          "column_names" -> Arr(fields.map(f => str(f.name)).toSeq),
          "context" -> obj())
      }
    } catch {
      case e: Throwable => errorEnvelope(Option(e.getMessage).getOrElse(e.toString))
    }

  private def errorEnvelope(msg: String): Obj =
    obj("type" -> str("error"), "error_code" -> num(0L),
      "error_message" -> str(msg), "context" -> obj())

  /** jsonlines / SSE: header line with column_names, then one JSON array
    * per row — matching stream_http_response_jsonlines. Errors/OK dump
    * their single envelope as the only line. */
  private def streamRows(ex: HttpExchange, env: Obj, sse: Boolean): Unit = {
    val mime = if (sse) "text/event-stream" else "application/jsonlines"
    def line(s: String): String = if (sse) s"data: $s\n" else s + "\n"
    val out = new StringBuilder
    env.fields("type") match {
      case Str("table") =>
        out.append(line(write(obj("type" -> str("table"),
          "column_names" -> env.fields("column_names")))))
        env.fields("data").asArray.foreach(row => out.append(line(write(row))))
      case _ => out.append(line(write(env)))
    }
    reply(ex, 200, out.toString, mime)
  }

  // ------------------------------------------------------------------
  // MCP: minimal JSON-RPC 2.0 — initialize / tools/list / tools/call
  // (mindsdb/api/mcp/tools/query.py: the `query` tool returns the same
  // envelope dump_http_response produces)
  // ------------------------------------------------------------------

  private def handleMcp(ex: HttpExchange): Unit =
    try {
      val req = Json.parse(readBody(ex))
      val id = req.get("id").getOrElse(Null)
      def rpcResult(result: Value): String =
        write(obj("jsonrpc" -> str("2.0"), "id" -> id, "result" -> result))
      def rpcError(code: Long, msg: String): String =
        write(obj("jsonrpc" -> str("2.0"), "id" -> id,
          "error" -> obj("code" -> num(code), "message" -> str(msg))))
      req.get("method").collect { case Str(m) => m } match {
        case Some("initialize") =>
          reply(ex, 200, rpcResult(obj(
            "protocolVersion" -> str("2024-11-05"),
            "serverInfo" -> obj("name" -> str("graft"), "version" -> str("0.1")),
            "capabilities" -> obj("tools" -> obj()))))
        case Some("tools/list") =>
          reply(ex, 200, rpcResult(obj("tools" -> arr(obj(
            "name" -> str("query"),
            "description" -> str("Execute a SQL query against the engine"),
            "inputSchema" -> obj(
              "type" -> str("object"),
              "properties" -> obj("query" -> obj("type" -> str("string"))),
              "required" -> arr(str("query"))))))))
        case Some("tools/call") =>
          val params = req.get("params").getOrElse(obj())
          val toolName = params.get("name").collect { case Str(n) => n }
          if (!toolName.contains("query"))
            reply(ex, 200, rpcError(-32602, s"unknown tool: ${toolName.getOrElse("?")}"))
          else {
            val sql = params.get("arguments").flatMap(_.get("query"))
              .collect { case Str(s) => s }
            sql match {
              case None => reply(ex, 200, rpcError(-32602, "missing arguments.query"))
              case Some(q) =>
                val env = runSql(q)
                val isError = env.fields("type") == Str("error")
                reply(ex, 200, rpcResult(obj(
                  "content" -> arr(obj("type" -> str("text"),
                    "text" -> str(write(env)))),
                  "isError" -> Bool(isError))))
            }
          }
        case other =>
          reply(ex, 200, rpcError(-32601, s"method not found: ${other.getOrElse("?")}"))
      }
    } catch {
      case e: Throwable =>
        try reply(ex, 500, write(obj("jsonrpc" -> str("2.0"), "id" -> Null,
          "error" -> obj("code" -> num(-32700L),
            "message" -> str(Option(e.getMessage).getOrElse(e.toString))))))
        catch { case _: Throwable => }
    }

  // ------------------------------------------------------------------

  /** JSON-safe row: numbers stay numeric, dates/timestamps ISO text —
    * the reference's to_lists(json_types=True). */
  private def rowJson(row: Row, fields: Array[StructField]): Arr = {
    val vals = fields.indices.map { i =>
      if (row.isNullAt(i)) Null else valueJson(row.get(i), fields(i).dataType)
    }
    Arr(vals)
  }

  private def valueJson(v: Any, dt: DataType): Value = dt match {
    case BooleanType => Bool(v.asInstanceOf[Boolean])
    case ByteType | ShortType | IntegerType | LongType =>
      num(v.asInstanceOf[Number].longValue())
    case FloatType | DoubleType =>
      val d = v.asInstanceOf[Number].doubleValue()
      if (d.isNaN || d.isInfinite) Null else num(d)
    case _: DecimalType => Num(0, v match {
      case bd: java.math.BigDecimal => bd.toPlainString
      case bd: BigDecimal => bd.bigDecimal.toPlainString
      case other => other.toString
    })
    case BinaryType =>
      str(java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
    case ArrayType(et, _) =>
      Arr(v.asInstanceOf[collection.Seq[Any]].toSeq.map(x =>
        if (x == null) Null else valueJson(x, et)))
    case st: StructType =>
      val r = v.asInstanceOf[Row]
      Obj(st.fields.zipWithIndex.map { case (f, i) =>
        f.name -> (if (r.isNullAt(i)) Null else valueJson(r.get(i), f.dataType))
      }.toMap)
    case MapType(_, vt, _) =>
      Obj(v.asInstanceOf[collection.Map[Any, Any]].map { case (k, x) =>
        String.valueOf(k) -> (if (x == null) Null else valueJson(x, vt))
      }.toMap)
    case _ => str(MysqlServer.textOf(v))
  }
}

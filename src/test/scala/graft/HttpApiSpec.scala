package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.server.{HttpApi, Json}

/** HTTP REST entry point: POST /api/sql/query envelopes (table/ok/error),
  * jsonlines/SSE streaming, and the MCP JSON-RPC query tool — real HTTP
  * requests against a live loopback server. */
class HttpApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.engine.Session.build("http-spec")
  val dir = "/root/testdata/sf0.001"

  private var api: HttpApi = _
  private val http = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    api = new HttpApi(spark, dir).start()
  }

  override def afterAll(): Unit = if (api != null) api.stop()

  private def post(path: String, body: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${api.boundPort}$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def sqlQuery(sql: String): Json.Value = {
    val resp = post("/api/sql/query",
      Json.write(Json.obj("query" -> Json.str(sql))))
    assert(resp.statusCode() === 200)
    Json.parse(resp.body())
  }

  test("SELECT returns the table envelope with typed JSON values") {
    val env = sqlQuery(
      """SELECT n_regionkey, COUNT(*) AS n FROM nation
         GROUP BY n_regionkey ORDER BY n_regionkey""")
    assert(env("type").asString === "table")
    assert(env("column_names").asArray.map(_.asString) === Seq("n_regionkey", "n"))
    val data = env("data").asArray
    assert(data.size === 5)
    // numbers arrive as JSON numbers, not strings
    assert(data.head.asArray.head.isInstanceOf[Json.Num])
    val counts = data.map(_.asArray(1) match { case Json.Num(n, _) => n.toLong; case v => fail(s"$v") })
    assert(counts.sum === 25)
  }

  test("DDL/DML returns the ok envelope with affected_rows") {
    val env = sqlQuery("CREATE TABLE http_t1 AS SELECT id FROM range(0, 5)")
    assert(env("type").asString === "ok")
    val env2 = sqlQuery("INSERT INTO http_t1 VALUES (99)")
    assert(env2("type").asString === "ok")
    assert(env2("affected_rows") === Json.num(1L))
    sqlQuery("DROP TABLE http_t1")
  }

  test("a bad query returns the error envelope (HTTP 200, like the reference)") {
    val env = sqlQuery("SELECT * FROM definitely_missing_table")
    assert(env("type").asString === "error")
    assert(env("error_message").asString.nonEmpty)
    assert(env("error_code") === Json.num(0L))
  }

  test("missing query field is a 400 with Wrong arguments") {
    val resp = post("/api/sql/query", """{"not_query": 1}""")
    assert(resp.statusCode() === 400)
    assert(Json.parse(resp.body())("error_message").asString.toLowerCase
      .contains("wrong arguments"))
  }

  test("invalid response_format is a 400") {
    val resp = post("/api/sql/query",
      """{"query": "SELECT 1", "response_format": "msgpack"}""")
    assert(resp.statusCode() === 400)
  }

  test("NULLs, dates and doubles serialize JSON-safe") {
    val env = sqlQuery(
      """SELECT CAST(NULL AS STRING) AS missing, DATE '2024-01-31' AS d,
         CAST(2.5 AS DOUBLE) AS x, true AS b""")
    val row = env("data").asArray.head.asArray
    assert(row(0) === Json.Null)
    assert(row(1).asString === "2024-01-31")
    assert(row(2) === Json.num(2.5))
    assert(row(3) === Json.Bool(true))
  }

  test("jsonlines format streams a header line then row arrays") {
    val resp = post("/api/sql/query", Json.write(Json.obj(
      "query" -> Json.str("SELECT r_regionkey FROM region ORDER BY r_regionkey"),
      "response_format" -> Json.str("jsonlines"))))
    assert(resp.statusCode() === 200)
    assert(resp.headers().firstValue("Content-Type").orElse("")
      .contains("jsonlines"))
    val lines = resp.body().trim.split("\n").toSeq
    val header = Json.parse(lines.head)
    assert(header("type").asString === "table")
    assert(header("column_names").asArray.map(_.asString) === Seq("r_regionkey"))
    assert(lines.tail.map(l => Json.parse(l).asArray.head) ===
      (0 to 4).map(i => Json.num(i.toLong)))
  }

  test("sse format prefixes every line with data:") {
    val resp = post("/api/sql/query", Json.write(Json.obj(
      "query" -> Json.str("SELECT 1 AS one"),
      "response_format" -> Json.str("sse"))))
    assert(resp.headers().firstValue("Content-Type").orElse("")
      .contains("text/event-stream"))
    assert(resp.body().linesIterator.forall(l => l.isEmpty || l.startsWith("data: ")))
  }

  test("GET /api/status reports the server") {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/status")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() === 200)
    assert(Json.parse(resp.body())("mindsdb_version").asString.nonEmpty)
  }

  // ---------------------------------------------------------- MCP

  private def rpc(method: String, params: Json.Value = Json.obj()): Json.Value = {
    val resp = post("/mcp", Json.write(Json.obj(
      "jsonrpc" -> Json.str("2.0"), "id" -> Json.num(1L),
      "method" -> Json.str(method), "params" -> params)))
    assert(resp.statusCode() === 200)
    Json.parse(resp.body())
  }

  test("MCP initialize + tools/list expose the query tool") {
    val init = rpc("initialize")
    assert(init("result")("serverInfo")("name").asString === "graft")
    val tools = rpc("tools/list")("result")("tools").asArray
    assert(tools.map(_("name").asString) === Seq("query"))
    assert(tools.head("inputSchema")("required").asArray.map(_.asString) === Seq("query"))
  }

  test("MCP tools/call query runs SQL and wraps the table envelope") {
    val res = rpc("tools/call", Json.obj(
      "name" -> Json.str("query"),
      "arguments" -> Json.obj("query" ->
        Json.str("SELECT COUNT(*) AS n FROM region"))))
    assert(res("result")("isError") === Json.Bool(false))
    val text = res("result")("content").asArray.head("text").asString
    val env = Json.parse(text)
    assert(env("type").asString === "table")
    assert(env("data").asArray.head.asArray.head === Json.num(5L))
  }

  test("MCP tools/call with a broken query sets isError") {
    val res = rpc("tools/call", Json.obj(
      "name" -> Json.str("query"),
      "arguments" -> Json.obj("query" -> Json.str("SELECT * FROM nope_mcp"))))
    assert(res("result")("isError") === Json.Bool(true))
  }

  test("MCP unknown method returns a JSON-RPC error") {
    val res = rpc("sampling/createMessage")
    assert(res("error")("code") === Json.num(-32601L))
  }

  test("MCP resources: list, templates, and schema:// reads (api/mcp/resources/schema.py)") {
    val listed = rpc("resources/list")("result")("resources").asArray
    assert(listed.map(_("uri").asString) ===
      Seq("schema://databases", "schema://knowledge_bases"))
    val templates = rpc("resources/templates/list")("result")(
      "resourceTemplates").asArray
    assert(templates.exists(_("uriTemplate").asString
      == "schema://databases/{database_name}/tables"))
    // databases resource carries the live catalog list as JSON text
    val dbs = rpc("resources/read", Json.obj(
      "uri" -> Json.str("schema://databases")))("result")("contents").asArray.head
    assert(dbs("mimeType").asString === "application/json")
    assert(Json.parse(dbs("text").asString).asArray.map(_.asString).contains("graft"))
    // table columns resource resolves through information_schema
    val cols = rpc("resources/read", Json.obj("uri" ->
      Json.str("schema://databases/graft/tables/region/columns")))(
      "result")("contents").asArray.head
    val parsed = Json.parse(cols("text").asString).asArray
    assert(parsed.map(_("COLUMN_NAME").asString).contains("r_name"))
    // unknown resource → invalid-params error
    assert(rpc("resources/read", Json.obj("uri" -> Json.str("schema://nope")))(
      "error")("code") === Json.num(-32602L))
  }

  test("MCP ping and completion/complete (api/mcp/completions.py)") {
    assert(rpc("ping")("result") === Json.obj())
    val comp = rpc("completion/complete", Json.obj(
      "ref" -> Json.obj("type" -> Json.str("ref/prompt"),
        "name" -> Json.str("sample_table")),
      "argument" -> Json.obj("name" -> Json.str("table_name"),
        "value" -> Json.str("reg"))))("result")("completion")
    assert(comp("values").asArray.map(_.asString).contains("region"))
    assert(comp("hasMore") === Json.Bool(false))
    val dbc = rpc("completion/complete", Json.obj(
      "argument" -> Json.obj("name" -> Json.str("database_name"),
        "value" -> Json.str("gra"))))("result")("completion")
    assert(dbc("values").asArray.map(_.asString).contains("graft"))
  }

  test("MCP prompts: sample_table lists and renders with its arguments") {
    val prompts = rpc("prompts/list")("result")("prompts").asArray
    assert(prompts.map(_("name").asString) === Seq("sample_table"))
    val got = rpc("prompts/get", Json.obj(
      "name" -> Json.str("sample_table"),
      "arguments" -> Json.obj("database_name" -> Json.str("graft"),
        "table_name" -> Json.str("region"))))
    val text = got("result")("messages").asArray.head("content")("text").asString
    assert(text.contains("SELECT * FROM `graft`.`region` LIMIT 5;"))
  }

  // ------------------------------------------------- CRUD namespaces

  private def get(path: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${api.boundPort}$path"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())

  private def delete(path: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${api.boundPort}$path"))
        .DELETE().build(), HttpResponse.BodyHandlers.ofString())

  test("databases CRUD: list, create with parameters, delete") {
    val before = Json.parse(get("/api/databases").body()).asArray
    assert(before.exists(_("name").asString == "graft"))
    val resp = post("/api/databases",
      """{"database": {"name": "httpdb", "engine": "mem"}}""")
    assert(resp.statusCode() === 201)
    val after = Json.parse(get("/api/databases").body()).asArray
    assert(after.exists(_("name").asString == "httpdb"))
    assert(delete("/api/databases/httpdb").statusCode() === 204)
    val gone = Json.parse(get("/api/databases").body()).asArray
    assert(!gone.exists(_("name").asString == "httpdb"))
  }

  test("databases GET-one and PUT update-or-create") {
    def put(path: String, body: String): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${api.boundPort}$path"))
          .header("Content-Type", "application/json")
          .PUT(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    // PUT on a missing name without an engine → 400; with one → 201
    assert(put("/api/databases/putdb", """{"database": {}}""").statusCode() === 400)
    assert(put("/api/databases/putdb",
      """{"database": {"engine": "mem", "parameters": {"host": "h1"}}}""")
      .statusCode() === 201)
    try {
      val one = Json.parse(get("/api/databases/putdb").body())
      assert(one("engine").asString === "mem")
      assert(get("/api/databases/no_db_here").statusCode() === 404)
      // PUT on an existing name updates parameters (200)
      assert(put("/api/databases/putdb",
        """{"database": {"parameters": {"host": "h2"}}}""").statusCode() === 200)
      val params = sqlQuery(
        "SELECT connection_data FROM mindsdb.databases WHERE name='putdb'")
      assert(params("data").asArray.head.asArray.head.asString.contains("host=h2"))
    } finally assert(delete("/api/databases/putdb").statusCode() === 204)
  }

  test("databases POST validates name/engine like the reference") {
    assert(post("/api/databases", """{"nope": 1}""").statusCode() === 400)
    val noEngine = post("/api/databases", """{"database": {"name": "x1"}}""")
    assert(noEngine.statusCode() === 400)
    assert(Json.parse(noEngine.body())("detail").asString.contains("engine"))
  }

  test("projects list + model lifecycle over REST") {
    val projects = Json.parse(get("/api/projects").body()).asArray
    assert(projects.exists(_("name").asString == "graft"))
    assert(get("/api/projects/no_such_project_x").statusCode() === 404)
    // train via POST {query}, predict via POST {data}, then delete
    val create = post("/api/projects/graft/models", Json.write(Json.obj(
      "query" -> Json.str(
        """CREATE MODEL http_model FROM (SELECT l_quantity, l_extendedprice
           FROM lineitem) PREDICT l_extendedprice
           USING features='l_quantity', score_column='prediction'"""))))
    assert(create.statusCode() === 201)
    val models = Json.parse(get("/api/projects/graft/models").body()).asArray
    assert(models.exists(_("name").asString == "http_model"))
    val preds = post("/api/projects/graft/models/http_model/predict",
      """{"data": [{"l_quantity": 1.0}, {"l_quantity": 5.0}]}""")
    assert(preds.statusCode() === 200)
    val rows = Json.parse(preds.body()).asArray
    assert(rows.size === 2)
    assert(rows.forall(_.get("prediction").exists(_.isInstanceOf[Json.Num])))
    assert(delete("/api/projects/graft/models/http_model").statusCode() === 204)
    val bad = post("/api/projects/graft/models", """{"query": "SELECT 1"}""")
    assert(bad.statusCode() === 400)
  }

  test("knowledge-base CRUD over REST") {
    val create = post("/api/projects/graft/knowledge_bases",
      """{"knowledge_base": {"name": "http_kb"}}""")
    assert(create.statusCode() === 201)
    val kbs = Json.parse(get("/api/projects/graft/knowledge_bases").body()).asArray
    assert(kbs.exists(_("name").asString == "http_kb"))
    assert(delete("/api/projects/graft/knowledge_bases/http_kb").statusCode() === 204)
  }

  test("file upload is immediately queryable as files.<name>") {
    val csv = "city,pop\nparis,2100000\nlyon,520000\n"
    val up = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/files/cities.csv"))
        .PUT(HttpRequest.BodyPublishers.ofString(csv)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(up.statusCode() === 201)
    val listed = Json.parse(get("/api/files").body()).asArray
    assert(listed.exists(_("file").asString == "cities.csv"))
    val env = sqlQuery("SELECT city, pop FROM files.cities ORDER BY pop DESC")
    assert(env("type").asString === "table")
    assert(env("data").asArray.head.asArray.head.asString === "paris")
    assert(delete("/api/files/cities.csv").statusCode() === 204)
    assert(delete("/api/files/cities.csv").statusCode() === 404)
  }

  test("/api/analysis/query returns per-column insights with histograms; /data analyzes raw rows") {
    val resp = post("/api/analysis/query", Json.write(Json.obj(
      "query" -> Json.str("SELECT n_nationkey, n_name FROM nation"),
      "limit" -> Json.num(20L))))
    assert(resp.statusCode() === 200)
    val env = Json.parse(resp.body())
    assert(env("row_count") === Json.num(20L))
    assert(env("tables").asArray.map(_.asString) === Seq("nation"))
    val cols = env("analysis")("columns")
    val nk = cols("n_nationkey")
    assert(nk("distinct") === Json.num(20L))
    assert(nk("missing")("count") === Json.num(0L))
    // numeric column carries min/max/mean + a 10-bucket histogram whose
    // counts sum to the row count
    assert(nk("min") === Json.num(0.0) && nk("max") === Json.num(19.0))
    val ys = nk("histogram")("y").asArray.map {
      case Json.Num(n, _) => n.toLong; case v => fail(s"bad bucket $v")
    }
    assert(ys.size === 10 && ys.sum === 20L)
    // string column: stats but no histogram
    val nn = cols("n_name")
    assert(nn("distinct") === Json.num(20L))
    assert(!nn.asObject.contains("histogram"))
    // /data route over raw rows
    val dresp = post("/api/analysis/data", Json.write(Json.obj(
      "column_names" -> Json.arr(Json.str("x"), Json.str("s")),
      "data" -> Json.arr(
        Json.arr(Json.num(1L), Json.str("a")),
        Json.arr(Json.num(2L), Json.str("b")),
        Json.arr(Json.Null, Json.str("a"))))))
    val denv = Json.parse(dresp.body())
    assert(denv("analysis")("nr_rows") === Json.num(3L))
    assert(denv("analysis")("columns")("x")("missing")("count") === Json.num(1L))
    assert(denv("analysis")("columns")("s")("distinct") === Json.num(2L))
    // missing query → 400 envelope (http_error "Missed query")
    assert(post("/api/analysis/query", "{}").statusCode() === 400)
  }

  test("/api/util health probes: ping, readiness, ping_native, ml_task_queue, update-gui") {
    val ping = get("/api/util/ping")
    assert(ping.statusCode() === 200)
    assert(Json.parse(ping.body())("status").asString === "ok")
    // idle server is ready; active-task map reports all-false
    assert(get("/api/util/readiness").statusCode() === 200)
    val tasks = Json.parse(get("/api/util/ping_native").body())
    assert(tasks("learn") === Json.Bool(false))
    assert(tasks("analyse") === Json.Bool(false))
    // no separate ML task-queue consumer in this build → 404 (reference
    // answers 404 when the consumer process mark is absent)
    assert(get("/api/util/ping/ml_task_queue").statusCode() === 404)
    assert(get("/api/util/update-gui").statusCode() === 200)
  }

  test("file upload by URL: origin-validated fetch lands in files.* (namespaces/file.py url source)") {
    // a local origin server stands in for the remote host (loopback —
    // real sockets, no egress)
    val origin = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    origin.createContext("/data.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      val b = "town,n\nghent,7\nbruges,3\n".getBytes("UTF-8")
      x.sendResponseHeaders(200, b.length.toLong)
      x.getResponseBody.write(b); x.close()
    })
    origin.start()
    def put(path: String, body: String,
        contentType: String = "application/json"): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${api.boundPort}$path"))
          .header("Content-Type", contentType)
          .PUT(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val base = s"http://127.0.0.1:${origin.getAddress.getPort}"
      // allow only the local origin
      assert(put("/api/config", Json.write(Json.obj("url_file_upload" -> Json.obj(
        "enabled" -> Json.Bool(true),
        "allowed_origins" -> Json.arr(Json.str(base)),
        "disallowed_origins" -> Json.arr())))).statusCode() === 200)
      val up = put("/api/files/towns.csv", Json.write(Json.obj(
        "source_type" -> Json.str("url"),
        "source" -> Json.str(s"$base/data.csv"))))
      assert(up.statusCode() === 201, up.body())
      val env = sqlQuery("SELECT town, n FROM files.towns ORDER BY n DESC")
      assert(env("data").asArray.head.asArray.head.asString === "ghent")
      // a non-allowed origin is refused with the security envelope
      val bad = put("/api/files/evil.csv", Json.write(Json.obj(
        "source_type" -> Json.str("url"),
        "source" -> Json.str("http://93.184.216.34/x.csv"))))
      assert(bad.statusCode() === 400)
      assert(bad.body().contains("not allowed for security reasons"))
      // malformed URL is an error, not a fetch
      val malformed = put("/api/files/m.csv", Json.write(Json.obj(
        "source_type" -> Json.str("url"), "source" -> Json.str("site.com/x"))))
      assert(malformed.statusCode() === 400)
    } finally origin.stop(0)
  }

  // ------------------------------------------------- A2A

  test("a2a tasks/send answers through an agent") {
    sqlQuery("CREATE AGENT a2a_agent USING model='default'")
    val resp = post("/a2a", Json.write(Json.obj(
      "jsonrpc" -> Json.str("2.0"), "id" -> Json.str("req-1"),
      "method" -> Json.str("tasks/send"),
      "params" -> Json.obj(
        "id" -> Json.str("task-1"),
        "message" -> Json.obj(
          "role" -> Json.str("user"),
          "parts" -> Json.arr(Json.obj("type" -> Json.str("text"),
            "text" -> Json.str("what is a shuffle"))),
          "metadata" -> Json.obj("agentName" -> Json.str("a2a_agent")))))))
    assert(resp.statusCode() === 200)
    val result = Json.parse(resp.body())("result")
    assert(result("status")("state").asString === "completed")
    val answer = result("artifacts").asArray.head("parts").asArray.head("text").asString
    assert(answer.nonEmpty)
  }

  test("a2a tasks/sendSubscribe streams SSE ending with is_task_complete") {
    val resp = post("/a2a", Json.write(Json.obj(
      "jsonrpc" -> Json.str("2.0"), "id" -> Json.str("req-2"),
      "method" -> Json.str("tasks/sendSubscribe"),
      "params" -> Json.obj(
        "message" -> Json.obj(
          "parts" -> Json.arr(Json.obj("text" -> Json.str("what is a join"))),
          "metadata" -> Json.obj("agent_name" -> Json.str("a2a_agent")))))))
    assert(resp.headers().firstValue("Content-Type").orElse("")
      .contains("text/event-stream"))
    val lines = resp.body().trim.linesIterator.filter(_.startsWith("data: ")).toSeq
    val last = Json.parse(lines.last.stripPrefix("data: "))
    assert(last("is_task_complete") === Json.Bool(true))
    assert(last("content").asString.nonEmpty)
  }

  test("a2a task lifecycle: send -> get (history trim) -> pushNotification set/get -> cancel -> errors") {
    def rpc(method: String, params: Json.Value): Json.Value = {
      val resp = post("/a2a", Json.write(Json.obj(
        "jsonrpc" -> Json.str("2.0"), "id" -> Json.str("lc-1"),
        "method" -> Json.str(method), "params" -> params)))
      assert(resp.statusCode() === 200)
      Json.parse(resp.body())
    }
    // send persists the task under its id
    val sent = rpc("tasks/send", Json.obj(
      "id" -> Json.str("task-lc"), "sessionId" -> Json.str("sess-1"),
      "message" -> Json.obj(
        "role" -> Json.str("user"),
        "parts" -> Json.arr(Json.obj("type" -> Json.str("text"),
          "text" -> Json.str("what is a broadcast"))),
        "metadata" -> Json.obj("agentName" -> Json.str("a2a_agent")))))
    assert(sent("result")("status")("state").asString === "completed")
    // get: default historyLength omits history (append_task_history)
    val got = rpc("tasks/get", Json.obj("id" -> Json.str("task-lc")))
    assert(got("result")("id").asString === "task-lc")
    assert(got("result")("sessionId").asString === "sess-1")
    assert(got("result")("status")("state").asString === "completed")
    assert(got("result")("history").asArray.isEmpty)
    // historyLength > 0 returns the trailing messages
    val got2 = rpc("tasks/get", Json.obj("id" -> Json.str("task-lc"),
      "historyLength" -> Json.num(5L)))
    assert(got2("result")("history").asArray.size === 1)
    // push-notification config round-trip
    val cfg = Json.obj("url" -> Json.str("http://127.0.0.1:9/cb"),
      "token" -> Json.str("t0k"))
    val setR = rpc("tasks/pushNotification/set", Json.obj(
      "id" -> Json.str("task-lc"), "pushNotificationConfig" -> cfg))
    assert(setR("result")("pushNotificationConfig")("token").asString === "t0k")
    val getR = rpc("tasks/pushNotification/get", Json.obj("id" -> Json.str("task-lc")))
    assert(getR("result")("pushNotificationConfig")("url").asString
      === "http://127.0.0.1:9/cb")
    // a completed task is not cancelable (TaskNotCancelableError)
    val cancel = rpc("tasks/cancel", Json.obj("id" -> Json.str("task-lc")))
    assert(cancel("error")("code") === Json.num(-32002L))
    // unknown ids: TaskNotFoundError on get/cancel, InternalError on
    // push-notification routes (the reference's exact envelopes)
    assert(rpc("tasks/get", Json.obj("id" -> Json.str("nope")))("error")("code")
      === Json.num(-32001L))
    assert(rpc("tasks/cancel", Json.obj("id" -> Json.str("nope")))("error")("code")
      === Json.num(-32001L))
    assert(rpc("tasks/pushNotification/get", Json.obj("id" -> Json.str("nope")))(
      "error")("code") === Json.num(-32603L))
    assert(rpc("tasks/resubscribe", Json.obj("id" -> Json.str("task-lc")))(
      "error")("code") === Json.num(-32004L))
  }

  test("a2a message/stream answers one final TaskStatusUpdateEvent over SSE") {
    val resp = post("/a2a", Json.write(Json.obj(
      "jsonrpc" -> Json.str("2.0"), "id" -> Json.str("ms-1"),
      "method" -> Json.str("message/stream"),
      "params" -> Json.obj(
        "sessionId" -> Json.str("sess-ms"),
        "message" -> Json.obj(
          "role" -> Json.str("user"),
          "parts" -> Json.arr(Json.obj("type" -> Json.str("text"),
            "text" -> Json.str("what is a partition"))),
          "metadata" -> Json.obj("agent_name" -> Json.str("a2a_agent")))))))
    assert(resp.headers().firstValue("Content-Type").orElse("")
      .contains("text/event-stream"))
    val events = resp.body().trim.linesIterator
      .filter(_.startsWith("data: ")).toSeq
    assert(events.size === 1)
    val ev = Json.parse(events.head.stripPrefix("data: "))("result")
    assert(ev("final") === Json.Bool(true))
    assert(ev("taskId").asString === "msg_stream_sess-ms_ms-1")
    assert(ev("contextId").asString === "ctx_sess-ms")
    assert(ev("status")("state").asString === "completed")
    assert(ev("status")("message")("parts").asArray.head("text").asString.nonEmpty)
  }

  test("a2a without an agent name is a JSON-RPC param error") {
    val resp = post("/a2a", Json.write(Json.obj(
      "jsonrpc" -> Json.str("2.0"), "id" -> Json.num(9L),
      "method" -> Json.str("tasks/send"),
      "params" -> Json.obj("message" -> Json.obj(
        "parts" -> Json.arr(Json.obj("text" -> Json.str("hi"))))))))
    assert(Json.parse(resp.body())("error")("code") === Json.num(-32602L))
  }

  // ------------------------------------------- round-12 namespaces

  test("per-database table listing is scoped; unknown database is 404") {
    // the global SHOW TABLES must NOT leak into a named database's
    // listing (reference: per-db listing; ADVICE r11)
    sqlQuery("CREATE DATABASE scoped_db WITH ENGINE='mem'")
    try {
      val resp = get("/api/databases/scoped_db/tables")
      assert(resp.statusCode() === 200)
      assert(get("/api/databases/no_such_db_xyz/tables").statusCode() === 404)
    } finally sqlQuery("DROP DATABASE scoped_db")
  }

  test("per-db table CRUD: create-from-select, get-one, conflict, replace, delete (tables_test.py matrix)") {
    graft.federation.JdbcDb.seedFromParquet(spark, dir, "region")
    sqlQuery("CREATE DATABASE tcrud_db WITH ENGINE='derby', " +
      s"PARAMETERS = database='${graft.federation.JdbcDb.dbName(dir)}'")
    def postTable(body: Json.Value): HttpResponse[String] =
      post("/api/databases/tcrud_db/tables", Json.write(body))
    def tbl(name: String, select: String, replace: Boolean) = Json.obj(
      "table" -> Json.obj("name" -> Json.str(name),
        "select" -> Json.str(select), "replace" -> Json.Bool(replace)))
    try {
      // create lands IN the database and answers 201 {name, type}
      val created = postTable(tbl("HTTP_T", "SELECT r_regionkey, r_name FROM region", replace = false))
      assert(created.statusCode() === 201, created.body())
      assert(Json.parse(created.body())("type").asString === "data")
      // the scoped listing and GET-one see it
      val listed = Json.parse(get("/api/databases/tcrud_db/tables").body()).asArray
      assert(listed.exists(_("table_name").asString == "HTTP_T"))
      assert(get("/api/databases/tcrud_db/tables/HTTP_T").statusCode() === 200)
      assert(get("/api/databases/tcrud_db/tables/NOPE_T").statusCode() === 404)
      // and the data is queryable through the federated name
      val env = sqlQuery("SELECT COUNT(*) AS n FROM tcrud_db.APP.HTTP_T")
      assert(env("data").asArray.head.asArray.head === Json.num(5L))
      // duplicate without replace → 409; with replace → 201
      assert(postTable(tbl("HTTP_T", "SELECT r_name FROM region", replace = false))
        .statusCode() === 409)
      assert(postTable(tbl("HTTP_T", "SELECT r_name FROM region", replace = true))
        .statusCode() === 201)
      // validation envelope: missing table/name/select → 400; a project
      // database refuses table CRUD → 400
      assert(post("/api/databases/tcrud_db/tables",
        """{"name": "x", "select": "SELECT 1"}""").statusCode() === 400)
      assert(postTable(Json.obj("table" -> Json.obj(
        "select" -> Json.str("SELECT 1")))).statusCode() === 400)
      assert(postTable(Json.obj("table" -> Json.obj(
        "name" -> Json.str("x")))).statusCode() === 400)
      assert(post("/api/databases/graft/tables", Json.write(
        tbl("x", "SELECT 1", replace = false))).statusCode() === 400)
      // delete: 204 then 404
      assert(delete("/api/databases/tcrud_db/tables/HTTP_T").statusCode() === 204)
      assert(delete("/api/databases/tcrud_db/tables/HTTP_T").statusCode() === 404)
    } finally sqlQuery("DROP DATABASE tcrud_db")
  }

  test("table envelope refuses results past the row cap, steering to streaming") {
    val small = new HttpApi(spark, dir, maxTableRows = 10).start()
    try {
      val resp = http.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${small.boundPort}/api/sql/query"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(Json.write(Json.obj(
            "query" -> Json.str("SELECT o_orderkey FROM orders"))))).build(),
        HttpResponse.BodyHandlers.ofString())
      val env = Json.parse(resp.body())
      assert(env("type").asString === "error")
      assert(env("error_message").asString.contains("jsonlines"))
      // same query under the cap passes
      val ok = http.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${small.boundPort}/api/sql/query"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(Json.write(Json.obj(
            "query" -> Json.str("SELECT o_orderkey FROM orders LIMIT 5"))))).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(Json.parse(ok.body())("type").asString === "table")
    } finally small.stop()
  }

  test("agents namespace: CRUD lifecycle + conflict and 404 envelopes") {
    val create = post("/api/projects/graft/agents",
      """{"agent": {"name": "rest_agent", "model_name": "default",
           "prompt_template": "answer briefly"}}""")
    assert(create.statusCode() === 201)
    assert(Json.parse(create.body())("name").asString === "rest_agent")
    // duplicate name → 409 (reference: HTTPStatus.CONFLICT)
    assert(post("/api/projects/graft/agents",
      """{"agent": {"name": "rest_agent"}}""").statusCode() === 409)
    // missing body param shapes
    assert(post("/api/projects/graft/agents", """{"nope": 1}""").statusCode() === 400)
    assert(post("/api/projects/graft/agents", """{"agent": {}}""").statusCode() === 400)
    val listed = Json.parse(get("/api/projects/graft/agents").body()).asArray
    assert(listed.exists(_("name").asString == "rest_agent"))
    val one = Json.parse(get("/api/projects/graft/agents/rest_agent").body())
    assert(one("model_name").asString === "default")
    assert(one("params")("prompt_template").asString === "answer briefly")
    // PUT updates; PUT on a missing agent refuses creation (reference)
    val put = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/projects/graft/agents/rest_agent"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"agent": {"prompt_template": "be verbose"}}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(put.statusCode() === 200)
    assert(Json.parse(put.body())("params")("prompt_template").asString === "be verbose")
    val putMissing = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/projects/graft/agents/ghost_agent"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString("""{"agent": {}}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(putMissing.statusCode() === 400)
    // completions through the REST shape (agents.py AgentCompletions)
    val comp = post("/api/projects/graft/agents/rest_agent/completions",
      """{"messages": [{"role": "user", "content": "what is spark"}]}""")
    assert(comp.statusCode() === 200)
    val msg = Json.parse(comp.body())("message")
    assert(msg("role").asString === "assistant")
    assert(msg("content").asString.nonEmpty)
    assert(post("/api/projects/graft/agents/rest_agent/completions",
      """{"not_messages": 1}""").statusCode() === 400)
    // streaming completions end with an end event
    val stream = post("/api/projects/graft/agents/rest_agent/completions/stream",
      """{"messages": [{"role": "user", "content": "what is a join"}]}""")
    assert(stream.headers().firstValue("Content-Type").orElse("")
      .contains("text/event-stream"))
    val events = stream.body().linesIterator.filter(_.startsWith("data: "))
      .map(l => Json.parse(l.stripPrefix("data: "))).toSeq
    assert(events.head("type").asString === "start")
    assert(events.exists(_("type").asString == "output"))
    assert(events.last("type").asString === "end")
    assert(delete("/api/projects/graft/agents/rest_agent").statusCode() === 204)
    assert(get("/api/projects/graft/agents/rest_agent").statusCode() === 404)
    assert(delete("/api/projects/graft/agents/rest_agent").statusCode() === 404)
  }

  test("jobs namespace: create with schedule/IF, get, history, delete") {
    sqlQuery("CREATE TABLE job_rest_t AS SELECT id FROM range(0, 3)")
    try {
      val create = post("/api/projects/graft/jobs",
        """{"job": {"name": "rest_job",
             "query": "INSERT INTO job_rest_t VALUES (99)",
             "if_query": "SELECT 1",
             "schedule_str": "every 1 day",
             "start_at": "2024-01-01 00:00:00", "end_at": null}}""")
      assert(create.statusCode() === 200)
      val job = Json.parse(create.body())
      assert(job("name").asString === "rest_job")
      assert(job("schedule_str").asString === "every 1 day")
      assert(job("query").asString.contains("INSERT INTO job_rest_t"))
      assert(job("if_query").asString === "SELECT 1")
      assert(job("start_at").asString.startsWith("2024-01-01"))
      val listed = Json.parse(get("/api/projects/graft/jobs").body()).asArray
      assert(listed.exists(_("name").asString == "rest_job"))
      assert(get("/api/projects/graft/jobs/ghost_job").statusCode() === 404)
      // history fills once the daemon ticks; kick it via SQL tick is not
      // exposed — history for a never-run job is just empty
      val hist = Json.parse(get("/api/projects/graft/jobs/rest_job/history").body())
      assert(hist.asArray.isEmpty || hist.asArray.forall(_("name").asString == "rest_job"))
      assert(delete("/api/projects/graft/jobs/rest_job").statusCode() === 204)
      assert(get("/api/projects/graft/jobs/rest_job").statusCode() === 404)
    } finally sqlQuery("DROP TABLE job_rest_t")
  }

  test("views namespace: create, read back the stored query, update, delete") {
    val create = post("/api/projects/graft/views",
      """{"view": {"name": "rest_view",
           "query": "SELECT r_name FROM region ORDER BY r_name"}}""")
    assert(create.statusCode() === 201)
    assert(Json.parse(create.body())("query").asString.contains("FROM region"))
    // conflict on re-create
    assert(post("/api/projects/graft/views",
      """{"view": {"name": "rest_view", "query": "SELECT 1"}}""").statusCode() === 409)
    val listed = Json.parse(get("/api/projects/graft/views").body()).asArray
    assert(listed.exists(_("name").asString == "rest_view"))
    // the view answers through SQL
    val rows = sqlQuery("SELECT * FROM rest_view LIMIT 1")("data").asArray
    assert(rows.nonEmpty)
    // PUT replaces the query; PUT on a missing view with a query creates (201)
    val put = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/projects/graft/views/rest_view"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"view": {"query": "SELECT n_name FROM nation ORDER BY n_name"}}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(put.statusCode() === 200)
    assert(Json.parse(put.body())("query").asString.contains("FROM nation"))
    val put2 = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/projects/graft/views/rest_view2"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"view": {"query": "SELECT 1 AS one"}}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(put2.statusCode() === 201)
    assert(delete("/api/projects/graft/views/rest_view").statusCode() === 204)
    assert(delete("/api/projects/graft/views/rest_view2").statusCode() === 204)
    assert(delete("/api/projects/graft/views/rest_view").statusCode() === 404)
  }

  test("chatbots namespace: create over an agent, read, delete") {
    sqlQuery("CREATE DATABASE chat_conn WITH ENGINE='mem'")
    sqlQuery("CREATE AGENT chat_rest_agent USING model='default'")
    try {
      val create = post("/api/projects/graft/chatbots",
        """{"chatbot": {"name": "rest_bot", "database_name": "chat_conn",
             "agent_name": "chat_rest_agent"}}""")
      assert(create.statusCode() === 201, create.body())
      val bot = Json.parse(create.body())
      assert(bot("database").asString === "chat_conn")
      assert(bot("agent_name").asString === "chat_rest_agent")
      assert(post("/api/projects/graft/chatbots",
        """{"chatbot": {"name": "rest_bot", "database_name": "chat_conn",
             "agent_name": "chat_rest_agent"}}""").statusCode() === 409)
      val one = Json.parse(get("/api/projects/graft/chatbots/rest_bot").body())
      assert(one("name").asString === "rest_bot")
      assert(get("/api/projects/graft/chatbots/ghost_bot").statusCode() === 404)
      assert(delete("/api/projects/graft/chatbots/rest_bot").statusCode() === 204)
    } finally {
      sqlQuery("DROP AGENT chat_rest_agent")
      sqlQuery("DROP DATABASE chat_conn")
    }
  }

  // ------------------------------------------- OpenAI-compatible chat

  test("chat/completions answers with the OpenAI envelope") {
    sqlQuery("CREATE AGENT oai_agent USING model='default'")
    try {
      val resp = post("/v1/chat/completions",
        """{"model": "oai_agent",
           "messages": [{"role": "system", "content": "be brief"},
                        {"role": "user", "content": "what is a shuffle"}]}""")
      assert(resp.statusCode() === 200)
      val env = Json.parse(resp.body())
      assert(env("object").asString === "chat.completion")
      assert(env("model").asString === "oai_agent")
      val choice = env("choices").asArray.head
      assert(choice("message")("role").asString === "assistant")
      assert(choice("message")("content").asString.nonEmpty)
      assert(choice("finish_reason").asString === "stop")
      val usage = env("usage")
      val p = usage("prompt_tokens").asInstanceOf[Json.Num].n
      val c = usage("completion_tokens").asInstanceOf[Json.Num].n
      assert(usage("total_tokens").asInstanceOf[Json.Num].n === p + c)
      // project-qualified model names resolve to the agent
      val qual = post("/chat/completions",
        """{"model": "graft.oai_agent",
           "messages": [{"role": "user", "content": "hi"}]}""")
      assert(Json.parse(qual.body())("object").asString === "chat.completion")
    } finally sqlQuery("DROP AGENT oai_agent")
  }

  test("chat/completions streams chunks and terminates with [DONE]") {
    sqlQuery("CREATE AGENT oai_stream_agent USING model='default'")
    try {
      val resp = post("/v1/chat/completions",
        """{"model": "oai_stream_agent", "stream": true,
           "messages": [{"role": "user", "content": "what is a broadcast join"}]}""")
      assert(resp.headers().firstValue("Content-Type").orElse("")
        .contains("text/event-stream"))
      val lines = resp.body().linesIterator.filter(_.startsWith("data: "))
        .map(_.stripPrefix("data: ")).toSeq
      assert(lines.last === "[DONE]")
      val chunks = lines.init.map(Json.parse)
      assert(chunks.forall(_("object").asString == "chat.completion.chunk"))
      assert(chunks.head("choices").asArray.head("delta")("role").asString === "assistant")
      val content = chunks.flatMap(_("choices").asArray.head("delta")
        .get("content").collect { case Json.Str(s) => s }).mkString
      assert(content.nonEmpty)
      assert(chunks.last("choices").asArray.head("finish_reason").asString === "stop")
    } finally sqlQuery("DROP AGENT oai_stream_agent")
  }

  test("company-id header scopes every route to its tenant") {
    def tenantPost(tenant: String, path: String, body: String): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${api.boundPort}$path"))
          .header("Content-Type", "application/json")
          .header("company-id", tenant)
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    def tenantSql(tenant: String, sql: String): Json.Value =
      Json.parse(tenantPost(tenant, "/api/sql/query",
        Json.write(Json.obj("query" -> Json.str(sql)))).body())
    // same-named agent under two tenants, different models
    assert(tenantPost("acme", "/api/projects/graft/agents",
      """{"agent": {"name": "hdr_agent", "model_name": "acme_m"}}""").statusCode() === 201)
    assert(tenantPost("globex", "/api/projects/graft/agents",
      """{"agent": {"name": "hdr_agent", "model_name": "globex_m"}}""").statusCode() === 201)
    val ma = tenantSql("acme",
      "SELECT model_name FROM mindsdb.agents WHERE name='hdr_agent'")
    assert(ma("data").asArray.head.asArray.head.asString === "acme_m")
    val mb = tenantSql("globex",
      "SELECT model_name FROM mindsdb.agents WHERE name='hdr_agent'")
    assert(mb("data").asArray.head.asArray.head.asString === "globex_m")
    // warehouse isolation through SQL with the header
    tenantSql("acme", "CREATE TABLE hdr_t AS SELECT * FROM region")
    val leak = tenantSql("globex", "SELECT COUNT(*) AS n FROM hdr_t")
    assert(leak("type").asString === "error")
    // the un-headered default tenant sees neither agent
    val none = sqlQuery("SELECT COUNT(*) AS n FROM mindsdb.agents WHERE name='hdr_agent'")
    assert(none("data").asArray.head.asArray.head === Json.num(0L))
  }

  test("HTTP auth: login issues a session, routes gate on it, logout revokes") {
    val authed = new HttpApi(spark, dir, httpAuth = Some(("admin", "pw123"))).start()
    try {
      def p(path: String, body: String, hdrs: (String, String)*): HttpResponse[String] = {
        val b = HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${authed.boundPort}$path"))
          .header("Content-Type", "application/json")
        hdrs.foreach { case (k, v) => b.header(k, v) }
        http.send(b.POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      }
      // unauthenticated query → 401
      val denied = p("/api/sql/query", """{"query": "SELECT 1"}""")
      assert(denied.statusCode() === 401)
      // status stays open and reports auth required / unconfirmed
      val st = Json.parse(http.send(HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${authed.boundPort}/api/status")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body())
      assert(st("auth")("required") === Json.Bool(true))
      assert(st("auth")("confirmed") === Json.Bool(false))
      // bad shapes and bad credentials (default.py LoginRoute contract)
      assert(p("/api/login", """{"username": "admin"}""").statusCode() === 400)
      assert(p("/api/login",
        """{"username": "admin", "password": "nope"}""").statusCode() === 401)
      // good login → token; bearer authorizes queries
      val login = p("/api/login", """{"username": "admin", "password": "pw123"}""")
      assert(login.statusCode() === 200)
      val token = Json.parse(login.body())("token").asString
      assert(token.nonEmpty)
      assert(login.headers().firstValue("Set-Cookie").orElse("").contains("session="))
      val ok = p("/api/sql/query", """{"query": "SELECT 1 AS one"}""",
        "Authorization" -> s"Bearer $token")
      assert(Json.parse(ok.body())("type").asString === "table")
      // cookie spelling authorizes too
      val okCookie = p("/api/sql/query", """{"query": "SELECT 1 AS one"}""",
        "Cookie" -> s"session=$token")
      assert(Json.parse(okCookie.body())("type").asString === "table")
      // logout revokes the token
      assert(p("/api/logout", "", "Authorization" -> s"Bearer $token")
        .statusCode() === 200)
      assert(p("/api/sql/query", """{"query": "SELECT 1"}""",
        "Authorization" -> s"Bearer $token").statusCode() === 401)
    } finally authed.stop()
  }

  test("config and handlers namespaces") {
    // GET config reports auth off for the open spec server
    val conf = Json.parse(get("/api/config").body())
    assert(conf("auth")("http_auth_enabled") === Json.Bool(false))
    // PUT validates argument names, stores the defaults slice
    val put = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/config"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"default_llm": "stub-llm"}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(put.statusCode() === 200)
    assert(Json.parse(get("/api/config").body())("default_llm").asString === "stub-llm")
    val bad = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/config"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString("""{"nope": 1}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(bad.statusCode() === 400)
    // handlers listing mirrors the mindsdb.handlers meta-table
    val handlers = Json.parse(get("/api/handlers").body()).asArray
    assert(handlers.map(_("name").asString).toSet === Set("byom", "fit", "files", "mem"))
    assert(handlers.forall(_("import_success") === Json.Bool(true)))
  }

  test("tree namespace: root lists databases, leaves list tables/models/views") {
    sqlQuery("CREATE DATABASE tree_db WITH ENGINE='mem'")
    sqlQuery("CREATE VIEW tree_view AS SELECT r_name FROM region")
    try {
      val root = Json.parse(get("/api/tree").body()).asArray
      assert(root.exists(n => n("name").asString == "graft" &&
        n("type").asString == "project"))
      assert(root.exists(n => n("name").asString == "tree_db" &&
        n("class").asString == "db"))
      val proj = Json.parse(get("/api/tree/graft").body()).asArray
      assert(proj.exists(n => n("name").asString == "tree_view" &&
        n("type").asString == "view"))
      assert(get("/api/tree/no_such_db_zz").statusCode() === 400)
    } finally {
      sqlQuery("DROP VIEW tree_view")
      sqlQuery("DROP DATABASE tree_db")
    }
  }

  test("tab namespace: editor tabs CRUD with meta envelopes") {
    val created = post("/api/tab",
      """{"name": "query 1", "content": "SELECT 1"}""")
    assert(created.statusCode() === 200)
    val id = Json.parse(created.body())("tab_meta")("id")
      .asInstanceOf[Json.Num].n.toLong
    // invalid field set → 400 (tab.py _is_request_valid)
    assert(post("/api/tab", """{"nope": 1}""").statusCode() === 400)
    val one = Json.parse(get(s"/api/tab/$id").body())
    assert(one("name").asString === "query 1" &&
      one("content").asString === "SELECT 1")
    val put = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${api.boundPort}/api/tab/$id"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"content": "SELECT 2"}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(put.statusCode() === 200)
    assert(Json.parse(get(s"/api/tab/$id").body())("content").asString === "SELECT 2")
    assert(Json.parse(get("/api/tab").body()).asArray
      .exists(_("id") === Json.num(id)))
    assert(delete(s"/api/tab/$id").statusCode() === 200)
    assert(get(s"/api/tab/$id").statusCode() === 404)
  }

  test("chatbot webhook: token routes a message through the bot and keeps history") {
    sqlQuery("CREATE DATABASE hook_conn WITH ENGINE='mem'")
    sqlQuery("CREATE AGENT hook_agent USING model='default'")
    sqlQuery("""CREATE CHATBOT hook_bot USING database='hook_conn',
      agent='hook_agent', webhook_token='tok123'""")
    try {
      val r1 = post("/api/webhooks/chatbots/tok123",
        """{"text": "what is a partition", "chat_id": "c1"}""")
      assert(r1.statusCode() === 200, r1.body())
      val env1 = Json.parse(r1.body())
      assert(env1("success") === Json.Bool(true))
      assert(env1("answer").asString.nonEmpty)
      assert(env1("history_length") === Json.num(2L))
      // same chat grows its memory; a different chat starts fresh
      val r2 = Json.parse(post("/api/webhooks/chatbots/tok123",
        """{"text": "and a shuffle?", "chat_id": "c1"}""").body())
      assert(r2("history_length") === Json.num(4L))
      val r3 = Json.parse(post("/api/webhooks/chatbots/tok123",
        """{"message": {"text": "hello"}, "chat_id": "c2"}""").body())
      assert(r3("history_length") === Json.num(2L))
      // unknown token → 404
      assert(post("/api/webhooks/chatbots/badtok",
        """{"text": "x"}""").statusCode() === 404)
    } finally {
      sqlQuery("DROP CHATBOT hook_bot")
      sqlQuery("DROP AGENT hook_agent")
      sqlQuery("DROP DATABASE hook_conn")
    }
  }

  test("concurrent requests from different tenants never cross-contaminate") {
    // 4 tenants × parallel agent-create + meta-read cycles over the
    // 8-thread pool: the execute-time ThreadLocal rebinding must keep
    // every response inside its own tenant even when pool threads are
    // reused across tenants mid-flight
    def tenantSql(tenant: String, sql: String): Json.Value = {
      val resp = http.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${api.boundPort}/api/sql/query"))
          .header("Content-Type", "application/json")
          .header("company-id", tenant)
          .POST(HttpRequest.BodyPublishers.ofString(
            Json.write(Json.obj("query" -> Json.str(sql))))).build(),
        HttpResponse.BodyHandlers.ofString())
      Json.parse(resp.body())
    }
    val tenants = Seq("par_a", "par_b", "par_c", "par_d")
    tenants.foreach(t =>
      tenantSql(t, s"CREATE AGENT par_agent USING model='model_$t'"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 16).map { i =>
      val t = tenants(i % 4)
      new Thread(() => {
        try {
          (1 to 5).foreach { _ =>
            val env = tenantSql(t,
              "SELECT model_name FROM mindsdb.agents WHERE name='par_agent'")
            val got = env("data").asArray.head.asArray.head.asString
            if (got != s"model_$t") errors.add(s"tenant $t saw $got")
          }
        } catch { case e: Throwable => errors.add(s"$t: $e") }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(errors.isEmpty, errors.toArray.mkString("; "))
    tenants.foreach(t => tenantSql(t, "DROP AGENT par_agent"))
  }

  test("chat/completions error envelopes: unknown model 404, bad args 400") {
    val missing = post("/v1/chat/completions",
      """{"model": "no_such_agent_x", "messages": [{"role": "user", "content": "hi"}]}""")
    assert(missing.statusCode() === 404)
    assert(Json.parse(missing.body())("error")("type").asString === "invalid_request_error")
    assert(post("/v1/chat/completions", """{"model": "x"}""").statusCode() === 400)
  }

  private def put(path: String, body: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${api.boundPort}$path"))
        .header("Content-Type", "application/json")
        .PUT(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("BYOM upload round-trip: disabled 403, upload, model trains+predicts, versioning") {
    // disabled by default like the reference (config.py:286 enabled=False)
    val blocked = put("/api/handlers/byom/rest_eng", """{"code": "def predict(): ..."}""")
    assert(blocked.statusCode() === 403)
    assert(Json.parse(blocked.body())("title").asString === "BYOM is disabled")
    // enable over the config surface (MINDSDB_BYOM_ENABLED analog)
    assert(put("/api/config", """{"byom": {"enabled": true}}""").statusCode() === 200)
    try {
      val up = put("/api/handlers/byom/rest_eng",
        """{"code": "def predict(df): return df", "modules": "pandas"}""")
      assert(up.statusCode() === 200)
      // duplicate name is a 409 (EntityExistsError envelope)
      val dup = put("/api/handlers/byom/rest_eng", """{"code": "x"}""")
      assert(dup.statusCode() === 409)
      assert(Json.parse(dup.body())("title").asString === "Engine already exists")
      // the uploaded engine trains a model that predicts through workers
      sqlQuery("""CREATE MODEL rest_bm FROM
        (SELECT l_quantity, l_extendedprice FROM lineitem)
        PREDICT l_extendedprice USING engine='rest_eng', features='l_quantity',
        score_column='p'""")
      val env = sqlQuery("""SELECT l_quantity, p FROM
        (SELECT l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 4) t
        JOIN rest_bm m""")
      assert(env("type").asString === "table")
      assert(env("data").asArray.size === 4)
      // POST = new engine version (handlers.py:252-290)
      val v2 = post("/api/handlers/byom/rest_eng",
        """{"code": "def predict(df): return df * 2"}""")
      assert(v2.statusCode() === 200)
      val vResp = Json.parse(v2.body())
      assert(vResp("last_engine_version") === Json.num(2L))
      assert(vResp("engine_versions").asArray.size === 2)
      sqlQuery("DROP MODEL rest_bm")
      sqlQuery("DROP ML_ENGINE rest_eng")
    } finally put("/api/config", """{"byom": {"enabled": false}}""")
  }

  test("A2A agent-card discovery: well-known card, live skills, advertised endpoint works") {
    sqlQuery("CREATE MODEL card_m PREDICT score USING features='x', weights='2.0', bias=0.0")
    sqlQuery("CREATE AGENT card_agent USING model='card_m'")
    try {
      for (name <- Seq("agent.json", "agent-card.json")) {
        val card = Json.parse(get(s"/a2a/.well-known/$name").body())
        assert(card("name").asString === "Graft Agent Connector")
        assert(card("capabilities")("streaming") === Json.Bool(true))
        assert(card("url").asString.endsWith("/a2a/"))
        val skills = card("skills").asArray
        assert(skills.exists(_("id").asString == "mindsdb_query"))
        // the live registry surfaces each agent as a skill
        assert(skills.exists(_("id").asString == "agent_card_agent"))
      }
      // status probe
      val st = Json.parse(get("/a2a/status").body())
      assert(st("status").asString === "ok" && st("service").asString === "mindsdb-a2a")
      // the card's advertised endpoint answers tasks/send for the
      // advertised agent skill
      val sent = post("/a2a", Json.write(Json.obj(
        "jsonrpc" -> Json.str("2.0"), "id" -> Json.num(7L),
        "method" -> Json.str("tasks/send"),
        "params" -> Json.obj("message" -> Json.obj(
          "metadata" -> Json.obj("agentName" -> Json.str("card_agent")),
          "parts" -> Json.arr(Json.obj("text" -> Json.str("hello"))))))))
      assert(sent.statusCode() === 200)
      assert(Json.parse(sent.body())("result")("status")("state").asString === "completed")
    } finally {
      sqlQuery("DROP AGENT card_agent"); sqlQuery("DROP MODEL card_m")
    }
  }

  test("integrations passthrough: guarded forward with credential injection") {
    // a passthrough-capable datasource whose upstream is THIS server —
    // a real HTTP round-trip without egress
    sqlQuery(s"""CREATE DATABASE pt_db WITH ENGINE 'rest', PARAMETERS =
      base_url='http://127.0.0.1:${api.boundPort}', api_key='sk-passthru-secret-1234',
      allowed_hosts='*', test_path='/api/status'""")
    try {
      // plain GET forwarded; envelope carries upstream status + parsed body
      val ok = post("/api/integrations/pt_db/passthrough",
        """{"method": "GET", "path": "/api/status"}""")
      assert(ok.statusCode() === 200)
      val env = Json.parse(ok.body())
      assert(env("status_code") === Json.num(200L))
      assert(env("content_type").asString === "application/json")
      assert(env("body")("mindsdb_version").asString.nonEmpty)
      // forbidden caller header is rejected before any network call
      val badHeader = post("/api/integrations/pt_db/passthrough",
        """{"method": "GET", "path": "/api/status", "headers": {"Cookie": "x=1"}}""")
      assert(badHeader.statusCode() === 400)
      assert(Json.parse(badHeader.body())("error_code").asString === "invalid_request")
      // bad method is a validation error
      val badMethod = post("/api/integrations/pt_db/passthrough",
        """{"method": "TRACE", "path": "/x"}""")
      assert(badMethod.statusCode() === 400)
      // per-datasource allowed_methods narrows to 405
      sqlQuery("ALTER DATABASE pt_db PARAMETERS = allowed_methods='GET'")
      val narrowed = post("/api/integrations/pt_db/passthrough",
        """{"method": "POST", "path": "/api/status", "body": {"a": 1}}""")
      assert(narrowed.statusCode() === 405)
      assert(Json.parse(narrowed.body())("error_code").asString === "method_not_allowed")
      // test endpoint classifies the canonical probe as ok
      val probe = post("/api/integrations/pt_db/passthrough/test", "{}")
      assert(probe.statusCode() === 200)
      val pr = Json.parse(probe.body())
      assert(pr("ok") === Json.Bool(true))
      assert(pr("status_code") === Json.num(200L))
      assert(pr("host").asString === "127.0.0.1")
      // capabilities lists the passthrough-capable engine
      val caps = Json.parse(get("/api/integrations/capabilities").body())
      assert(caps("bearer_passthrough").asArray.map(_.asString).contains("rest"))
      assert(caps("handlers")("rest")("operations").asArray.map(_.asString) === Seq("passthrough"))
      // DESCRIBE DATABASE surfaces the live probe outcome + masked params
      val desc = sqlQuery("DESCRIBE DATABASE pt_db")
      val dRows = desc("data").asArray.map(_.asArray.map(_.asString))
        .map(r => r(0) -> r(1)).toMap
      assert(dRows("engine") === "rest")
      assert(dRows("api_key") === "******", "api_key must be masked in DESCRIBE")
      assert(dRows("passthrough_ok") === "true", s"probe not ok: $dRows")
      assert(dRows("passthrough_test").contains("\"status_code\""))
    } finally sqlQuery("DROP DATABASE pt_db")
  }

  test("integrations passthrough: SSRF and support guards") {
    // a datasource without the passthrough connection shape → 501
    sqlQuery("CREATE DATABASE pt_nosup WITH ENGINE 'pg', PARAMETERS = host='h'")
    // loopback upstream WITHOUT the explicit '*' bypass → host_not_allowed
    sqlQuery(s"""CREATE DATABASE pt_priv WITH ENGINE 'rest', PARAMETERS =
      base_url='http://127.0.0.1:${api.boundPort}', api_key='k-very-secret-123'""")
    try {
      val unsupported = post("/api/integrations/pt_nosup/passthrough",
        """{"method": "GET", "path": "/x"}""")
      assert(unsupported.statusCode() === 501)
      assert(Json.parse(unsupported.body())("error_code").asString === "passthrough_not_supported")
      val unknown = post("/api/integrations/no_such_db/passthrough",
        """{"method": "GET", "path": "/x"}""")
      assert(unknown.statusCode() === 501)
      val priv = post("/api/integrations/pt_priv/passthrough",
        """{"method": "GET", "path": "/api/status"}""")
      assert(priv.statusCode() === 400)
      assert(Json.parse(priv.body())("error_code").asString === "host_not_allowed")
    } finally {
      sqlQuery("DROP DATABASE pt_nosup"); sqlQuery("DROP DATABASE pt_priv")
    }
  }

  test("handler metadata routes: info, icon, readme envelopes") {
    val info = Json.parse(get("/api/handlers/byom").body())
    assert(info("name").asString === "byom" && info("type").asString === "ml")
    assert(get("/api/handlers/no_such").statusCode() === 404)
    val icon = get("/api/handlers/fit/icon")
    assert(icon.statusCode() === 200)
    assert(icon.headers().firstValue("Content-Type").orElse("").startsWith("image/svg"))
    assert(icon.body().contains("<svg"))
    assert(get("/api/handlers/no_such/icon").statusCode() === 404)
    val readme = Json.parse(get("/api/handlers/files/readme").body())
    assert(readme("readme").asString.startsWith("# files"))
    assert(readme("error_message") === Json.Null)
    // unknown name keeps the 200 envelope with error_message set
    val missing = Json.parse(get("/api/handlers/nope/readme").body())
    assert(missing("readme") === Json.Null)
    assert(missing("error_message").asString.contains("not found"))
    // install (handlers.py:165): JVM-native handlers are always
    // import-successful → "Installed" 200; unknown handler → 400
    val inst = post("/api/handlers/fit/install", "")
    assert(inst.statusCode() === 200 && inst.body().contains("Installed"))
    assert(post("/api/handlers/no_such/install", "").statusCode() === 400)
  }
}

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
    val res = rpc("prompts/list")
    assert(res("error")("code") === Json.num(-32601L))
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

  test("a2a without an agent name is a JSON-RPC param error") {
    val resp = post("/a2a", Json.write(Json.obj(
      "jsonrpc" -> Json.str("2.0"), "id" -> Json.num(9L),
      "method" -> Json.str("tasks/send"),
      "params" -> Json.obj("message" -> Json.obj(
        "parts" -> Json.arr(Json.obj("text" -> Json.str("hi"))))))))
    assert(Json.parse(resp.body())("error")("code") === Json.num(-32602L))
  }
}

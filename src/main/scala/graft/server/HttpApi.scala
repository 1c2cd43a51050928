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
object HttpApi {
  /** Request-unique suffix for predict input views (see handleProjects). */
  private val predictSeq = new java.util.concurrent.atomic.AtomicLong(0L)
}

final class HttpApi(spark: SparkSession, sfDir: String, port: Int = 0,
                    maxTableRows: Int = 100000,
                    /** HTTP auth config (reference config["auth"]:
                      * http_auth_enabled + username/password,
                      * namespaces/default.py LoginRoute). None keeps the
                      * reference's default open access. */
                    httpAuth: Option[(String, String)] = None) {

  private val catalog = new Catalog(spark, sfDir)
  private val warehouse = Warehouse.temp(spark)
  // llm/to_markdown/doc_hash scalar stubs — the webhook completion path
  // for model-backed chatbots calls llm() directly (idempotent)
  graft.functions.AiFunctions.register(spark)
  // ONE Jobs store across requests (the reference's jobs_controller is
  // server-global): a job created over REST or SQL must survive into the
  // next request, and the scheduler daemon ticks it between requests
  private val jobs = new graft.incremental.Jobs
  // per-tenant namespaces keyed by the `company-id` request header (the
  // reference's HTTP middleware reads the same header into ctx.company_id;
  // no header → the shared default state, single-tenant path unchanged)
  private val tenants = new graft.catalog.Tenants(spark, sfDir,
    graft.catalog.Tenants.State(catalog, warehouse, jobs))
  // ONE daemon ticking EVERY tenant's jobs store (the reference
  // scheduler checks all companies each pass) — a job created under a
  // company-id header must execute, not merely list
  private val jobsDaemon =
    new graft.incremental.JobsDaemon(() => tenants.allStates().map(_.jobs))
  private val currentTenant = new ThreadLocal[String]
  private def tenantState(): graft.catalog.Tenants.State = {
    val id = Option(currentTenant.get).getOrElse("")
    if (id.trim.isEmpty) tenants.default else tenants.of(id)
  }
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 50)
  // one Commands per request would lose PREPARE state; the reference's
  // FakeMysqlProxy is also constructed per request but shares the
  // server-side controllers — our shared catalog/warehouse/jobs is that
  // seam (or the tenant's triple when the request carries company-id)
  private def session() = {
    val st = tenantState()
    new Commands(spark, st.catalog, st.warehouse, st.jobs)
  }

  // live session tokens (cookie value == bearer token value; the
  // reference's SESSION_OR_TOKEN mode accepts either spelling)
  private val authTokens = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def bearerOf(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer ").trim)
      .filter(_.nonEmpty)

  private def cookieOf(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Cookie")).flatMap(
      _.split(";").map(_.trim).collectFirst {
        case c if c.startsWith("session=") => c.stripPrefix("session=")
      })

  private def authorized(ex: HttpExchange): Boolean = httpAuth.isEmpty ||
    (bearerOf(ex) ++ cookieOf(ex)).exists(authTokens.contains)

  /** every route reads the tenant header before its handler runs and
    * clears it after — the pool thread is reused across tenants. When
    * auth is configured, routes other than login/logout/status require a
    * live session cookie or bearer token (initialize.py before_request). */
  private def route(path: String, open: Boolean = false)(h: HttpExchange => Unit): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      currentTenant.set(Option(ex.getRequestHeaders.getFirst("company-id")).getOrElse(""))
      try {
        if (!open && !authorized(ex))
          reply(ex, 401, write(obj("title" -> str("Unauthorized"),
            "detail" -> str("Authorization required"))))
        else h(ex)
      } finally currentTenant.remove()
    })

  route("/api/login", open = true)(handleLogin)
  route("/api/logout", open = true)(handleLogout)
  route("/api/sql/query")(handleSql)
  route("/api/status", open = true)(handleStatus)
  route("/api/config")(handleConfig)
  route("/api/handlers")(handleHandlers)
  route("/api/tree")(handleTree)
  route("/api/tab")(handleTabs)
  // OPEN like the reference (webhooks_ns is excluded from
  // protected_namespaces): external chat platforms cannot carry a
  // session cookie — the per-chatbot webhook token in the path IS the
  // authentication
  route("/api/webhooks/chatbots", open = true)(handleChatbotWebhook)
  route("/mcp")(handleMcp)
  route("/api/analysis")(handleAnalysis)
  route("/api/util")(handleUtil)
  route("/api/databases")(handleDatabases)
  route("/api/projects")(handleProjects)
  route("/api/integrations")(handleIntegrations)
  route("/a2a")(handleA2a)
  // agent-card discovery is OPEN by protocol: an A2A client fetches the
  // card to learn the endpoint and capabilities BEFORE it can present
  // credentials (a2a/common/server/server.py:46-48 serves both names
  // plus /status unauthenticated)
  route("/a2a/.well-known", open = true)(handleA2aCard)
  route("/a2a/status", open = true)(handleA2aStatus)
  route("/api/files")(handleFiles)
  // OpenAI-compatible chat endpoint over an agent (the reference's
  // litellm server, api/litellm/start.py: model = agent name)
  route("/v1/chat/completions")(handleChatCompletions)
  route("/chat/completions")(handleChatCompletions)
  // daemon worker threads so an un-stopped server can never pin the JVM
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "http-api"); t.setDaemon(true); t })
  server.setExecutor(pool)

  def boundPort: Int = server.getAddress.getPort
  def start(): HttpApi = { server.start(); jobsDaemon.start(); this }
  def stop(): Unit = { jobsDaemon.stop(); server.stop(0); pool.shutdownNow() }

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

  // ------------------------------------------------------------------
  // /api/analysis — per-column dataset insights (namespaces/analysis.py:
  // QueryAnalysis posts a query, DataAnalysis posts raw rows; both
  // return {"analysis": ..., "timestamp": ...} envelopes). The
  // reference delegates to dataprep_ml's analyze_dataset over an
  // in-memory pandas frame; here the insights compute as TWO combinable
  // Spark aggregation passes (stats, then histograms over the measured
  // ranges) — same numbers, but the scan distributes, so the endpoint
  // also holds when the posted query covers a large table.
  // ------------------------------------------------------------------

  private def handleAnalysis(ex: HttpExchange): Unit =
    try {
      import org.apache.spark.sql.functions._
      val parts = tail(ex, "/api/analysis")
      def now(): Value = num(System.currentTimeMillis() / 1000.0)
      (ex.getRequestMethod, parts) match {
        case ("POST", Seq("query")) =>
          val body = Json.parse(readBody(ex))
          val query = body.get("query").collect { case Str(s) => s }
          val limit = body.get("limit").collect { case Num(n, _) => n.toInt }
          query.map(_.trim).filter(_.nonEmpty) match {
            case None => crudError(ex, 400, "Need provide query to analyze")
            case Some(q) =>
              val df0 = session().execute(q)
              // persist for the duration of the request: the stats and
              // histogram passes must see the SAME rows (LIMIT without
              // ORDER BY is not deterministic across executions), and a
              // heavy posted query must not re-execute per pass
              val df = limit.fold(df0)(df0.limit)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              try {
                // tables named in the query (get_query_tables analog)
                val tabs = "(?i)\\b(?:from|join)\\s+([A-Za-z_][\\w.]*)".r
                  .findAllMatchIn(q).map(_.group(1)).toSeq.distinct
                val analysis = analyzeDf(df)
                // row_count IS the analysis's nr_rows — never a third pass
                val rowCount = analysis.get("nr_rows").getOrElse(num(0L))
                reply(ex, 200, write(obj(
                  "analysis" -> analysis,
                  "column_names" -> Arr(df.schema.fieldNames.toSeq.map(str)),
                  "row_count" -> rowCount,
                  "timestamp" -> now(),
                  "tables" -> Arr(tabs.map(str)))))
              } finally df.unpersist()
          }
        case ("POST", Seq("data")) =>
          val body = Json.parse(readBody(ex))
          val names = body.get("column_names").map(_.asArray).getOrElse(Seq.empty)
            .collect { case Str(s) => s }
          val data = body.get("data").map(_.asArray).getOrElse(Seq.empty)
          if (names.isEmpty) crudError(ex, 400, "column_names required")
          else {
            // column is numeric when every non-null value is a number
            val colVals = names.indices.map(i => data.map(_.asArray.lift(i)))
            val numeric = colVals.map(_.forall {
              case Some(Num(_, _)) | Some(Null) | None => true; case _ => false
            })
            val schema = StructType(names.zipWithIndex.map { case (nm, i) =>
              StructField(nm, if (numeric(i)) DoubleType else StringType)
            })
            val rows = data.map { r =>
              Row.fromSeq(names.indices.map { i =>
                r.asArray.lift(i) match {
                  case Some(Num(n, _)) if numeric(i) => n
                  case Some(Null) | None => null
                  case Some(Str(s)) => s
                  case Some(v) => Json.write(v)
                }
              })
            }
            val df = spark.createDataFrame(
              spark.sparkContext.parallelize(rows.toSeq, 1), schema)
            reply(ex, 200, write(obj(
              "analysis" -> analyzeDf(df), "timestamp" -> now())))
          }
        case _ => crudError(ex, 405,
          s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable =>
        // analysis errors surface in the envelope, not as HTTP failures
        // (DataAnalysis.post swallows analysis exceptions the same way)
        reply(ex, 200, write(obj("analysis" -> obj(),
          "timestamp" -> num(System.currentTimeMillis() / 1000.0),
          "error" -> str(Option(e.getMessage).getOrElse(e.toString)))))
    }

  /** Per-column insights: dtype, missing count/share, exact distinct
    * count, and for numerics min/max/mean + a 10-bucket histogram. Pass
    * 1 is ONE multi-aggregate (plans as a single scan); pass 2 buckets
    * numerics against the measured ranges — both map-side combinable. */
  private def analyzeDf(df: DataFrame): Value = {
    import org.apache.spark.sql.functions._
    val fields = df.schema.fields
    if (fields.isEmpty) return obj()
    def isNum(dt: DataType): Boolean = dt.isInstanceOf[NumericType]
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(count(col(f.name)).as(s"__c$i"),
        countDistinct(col(f.name)).as(s"__d$i")) ++
        (if (isNum(f.dataType)) Seq(
          min(col(f.name)).cast(DoubleType).as(s"__mn$i"),
          max(col(f.name)).cast(DoubleType).as(s"__mx$i"),
          avg(col(f.name).cast(DoubleType)).as(s"__av$i"))
        else Nil)
    } :+ count(lit(1)).as("__n")
    val r = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val n = r.getAs[Long]("__n")
    // histogram pass: 10 equal-width buckets over [min, max] per
    // numeric column with a non-degenerate range
    val histCols = fields.zipWithIndex.filter { case (f, i) =>
      isNum(f.dataType) && !r.isNullAt(r.fieldIndex(s"__mn$i")) &&
        r.getAs[Double](s"__mn$i") < r.getAs[Double](s"__mx$i")
    }
    val histRow = if (histCols.isEmpty || n == 0) None else {
      val hAggs = histCols.flatMap { case (f, i) =>
        val mn = r.getAs[Double](s"__mn$i"); val mx = r.getAs[Double](s"__mx$i")
        val bucket = least(lit(9), floor(
          (col(f.name).cast(DoubleType) - lit(mn)) / lit(mx - mn) * 10))
        (0 until 10).map(b => sum(when(bucket === b, 1L).otherwise(0L))
          .as(s"__h${i}_$b"))
      }
      Some(df.agg(hAggs.head, hAggs.tail.toIndexedSeq: _*).head())
    }
    val colsJson = fields.zipWithIndex.map { case (f, i) =>
      val nonNull = r.getAs[Long](s"__c$i")
      val base = Seq[(String, Value)](
        "dtype" -> str(f.dataType.sql),
        "missing" -> obj("count" -> num(n - nonNull),
          "share" -> (if (n == 0) num(0.0) else num((n - nonNull).toDouble / n))),
        "distinct" -> num(r.getAs[Long](s"__d$i")))
      val nums = if (isNum(f.dataType) && !r.isNullAt(r.fieldIndex(s"__mn$i")))
        Seq[(String, Value)](
          "min" -> num(r.getAs[Double](s"__mn$i")),
          "max" -> num(r.getAs[Double](s"__mx$i")),
          "mean" -> num(r.getAs[Double](s"__av$i")))
      else Nil
      val hist = histRow.flatMap { h =>
        if (histCols.exists(_._2 == i)) {
          val mn = r.getAs[Double](s"__mn$i"); val mx = r.getAs[Double](s"__mx$i")
          val w = (mx - mn) / 10
          Some("histogram" -> obj(
            "x" -> Arr((0 until 10).map(b => num(mn + b * w))),
            "y" -> Arr((0 until 10).map(b => num(h.getAs[Long](s"__h${i}_$b"))))))
        } else None
      }
      f.name -> Obj((base ++ nums ++ hist).toMap)
    }
    obj("nr_rows" -> num(n), "columns" -> Obj(colsJson.toMap))
  }

  // /api/util — the deployment health-probe namespace (namespaces/
  // util.py): ping, readiness (503 while a learn/analyse task runs),
  // ping_native (the active-task map), ml_task_queue (404 — this build
  // runs ML in-process, no separate consumer), update-gui (no-op 200).
  private def handleUtil(ex: HttpExchange): Unit =
    try {
      import org.apache.spark.sql.functions.col
      def activeTasks(): Map[String, Boolean] = {
        // derived from the live processlist (the reference reads
        // process-mark files of its forked learn/analyse workers; this
        // build's equivalent evidence is the running-statement log)
        val running = session().execute("SHOW PROCESSLIST")
          .filter(col("State") === "running")
          .select(col("Info")).collect().map(_.getString(0).toUpperCase).toSeq
        Map(
          "learn" -> running.exists(s => s.startsWith("CREATE MODEL") ||
            s.startsWith("RETRAIN") || s.startsWith("FINETUNE")),
          "predict" -> false,
          "analyse" -> running.exists(_.startsWith("ANALYZE")))
      }
      (ex.getRequestMethod, tail(ex, "/api/util")) match {
        case ("GET", Seq("ping")) =>
          reply(ex, 200, write(obj("status" -> str("ok"))))
        case ("GET", Seq("ping", "ml_task_queue")) => reply(ex, 404, "")
        case ("GET", Seq("readiness")) =>
          if (activeTasks().values.exists(identity))
            crudError(ex, 503, "not ready")
          else reply(ex, 200, "")
        case ("GET", Seq("ping_native")) =>
          reply(ex, 200, write(Obj(activeTasks().map {
            case (k, v) => k -> Bool(v)
          })))
        case ("GET", Seq("update-gui")) => reply(ex, 200, "")
        case _ => crudError(ex, 405,
          s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable =>
        crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  private def handleStatus(ex: HttpExchange): Unit =
    reply(ex, 200, write(obj(
      "mindsdb_version" -> str("graft-spark"),
      "environment" -> str("local"),
      "auth" -> obj(
        "confirmed" -> Bool(authorized(ex)),
        "required" -> Bool(httpAuth.isDefined),
        "provider" -> str("local")))))

  /** POST /api/login {username, password} → session cookie + bearer
    * token (namespaces/default.py LoginRoute, SESSION_OR_TOKEN mode:
    * the response carries the token AND Set-Cookie installs the
    * session). Wrong shape → 400; wrong credentials → 401. */
  private def handleLogin(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "POST") {
        reply(ex, 405, write(obj("title" -> str("Error"), "detail" -> str("use POST"))))
        return
      }
      val body = Json.parse(readBody(ex))
      val username = body.get("username").collect { case Str(s) => s }.getOrElse("")
      val password = body.get("password").collect { case Str(s) => s }.getOrElse("")
      if (username.isEmpty || password.isEmpty) {
        reply(ex, 400, write(obj("title" -> str("Error in username or password"),
          "detail" -> str("Username and password should be string"))))
        return
      }
      httpAuth match {
        case Some((u, p)) if u == username && p == password =>
          val token = java.util.UUID.randomUUID().toString.replace("-", "")
          authTokens.add(token)
          ex.getResponseHeaders.add("Set-Cookie", s"session=$token; HttpOnly; Path=/")
          reply(ex, 200, write(obj("token" -> str(token))))
        case Some(_) =>
          reply(ex, 401, write(obj("title" -> str("Forbidden"),
            "detail" -> str("Invalid username or password"))))
        case None =>
          // auth disabled: login is a no-op success (open server)
          reply(ex, 200, write(obj()))
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable =>
        try reply(ex, 400, write(obj("title" -> str("Error"),
          "detail" -> str(Option(e.getMessage).getOrElse(e.toString)))))
        catch { case _: Throwable => }
    }

  /** POST /api/logout: revokes the cookie session and/or bearer token
    * (default.py LogoutRoute). */
  private def handleLogout(ex: HttpExchange): Unit = {
    (bearerOf(ex) ++ cookieOf(ex)).foreach(authTokens.remove)
    ex.getResponseHeaders.add("Set-Cookie", "session=; Max-Age=0; Path=/")
    reply(ex, 200, "\"\"")
  }

  /** server config the UI/SDK reads and the PUT-updatable slice of it
    * (namespaces/config.py GetConfig: auth + default_* models; unknown
    * argument names are a 400). */
  private val mutableConfig =
    new java.util.concurrent.ConcurrentHashMap[String, Value]()

  private def handleConfig(ex: HttpExchange): Unit =
    try {
      ex.getRequestMethod match {
        case "GET" =>
          val defaults = Seq("default_llm", "default_embedding_model",
            "default_reranking_model").flatMap(k =>
            Option(mutableConfig.get(k)).map(k -> _))
          reply(ex, 200, write(Obj(Map(
            "auth" -> obj("http_auth_enabled" -> Bool(httpAuth.isDefined)),
            "api" -> obj("http" -> obj("running" -> Bool(true)))) ++ defaults)))
        case "PUT" =>
          val data = Json.parse(readBody(ex)).asObject
          val allowed = Set("auth", "default_llm", "default_embedding_model",
            "default_reranking_model", "knowledge_bases", "url_file_upload",
            "byom")
          val unknown = data.keys.filterNot(allowed)
          if (unknown.nonEmpty)
            crudError(ex, 400, s"Unknown arguments: ${unknown.mkString(", ")}")
          else {
            data.foreach { case (k, v) => mutableConfig.put(k, v) }
            reply(ex, 200, write(obj()))
          }
        case other => crudError(ex, 405, s"unsupported $other /api/config")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** GET /api/tree[/<db>]: the object tree the editor UI renders
    * (namespaces/tree.py — root lists databases, a leaf lists the
    * database's tables; projects list their models and views). */
  private def handleTree(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "GET") {
        crudError(ex, 405, s"unsupported ${ex.getRequestMethod} /api/tree"); return
      }
      val parts = tail(ex, "/api/tree")
      val dbs = session().execute(
        "SELECT name, engine, type FROM mindsdb.databases").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      parts match {
        case Seq() =>
          reply(ex, 200, write(Arr(dbs.toSeq.map { case (n, e, t) =>
            obj("name" -> str(n), "class" -> str("db"), "type" -> str(t),
              "engine" -> str(e),
              "deletable" -> Bool(t == "data"),
              "visible" -> Bool(n != "information_schema"))
          })))
        case Seq(db) =>
          dbs.find(_._1.equalsIgnoreCase(db)) match {
            case None => crudError(ex, 400, s"There is no element with name '$db'")
            case Some((_, _, "project")) =>
              val cat = tenantState().catalog
              val models = session().execute("SHOW MODELS").collect()
                .map(_.getString(0)).distinct.toSeq.map(m =>
                  obj("name" -> str(m), "class" -> str("table"),
                    "type" -> str("model"), "deletable" -> Bool(true)))
              val views = cat.listViews().sorted.map(v =>
                obj("name" -> str(v), "class" -> str("table"),
                  "type" -> str("view"), "deletable" -> Bool(true)))
              reply(ex, 200, write(Arr(models ++ views)))
            case Some((name, _, _)) =>
              val tables = session().execute(
                s"SHOW TABLES FROM ${sqlIdent(name)}").collect()
                .map(_.getString(0)).toSeq.map(t =>
                  obj("name" -> str(t), "class" -> str("table"),
                    "type" -> str("table"), "deletable" -> Bool(false)))
              reply(ex, 200, write(Arr(tables)))
          }
        case _ => crudError(ex, 405, "unsupported tree path")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** Editor tabs (namespaces/tab.py "new" mode): an in-memory
    * id-keyed store of {index, name, content}; POST/PUT answer
    * {tab_meta, tabs_meta} like the reference's tabs_controller. */
  private val tabsStore =
    new java.util.concurrent.ConcurrentHashMap[Long, (Long, String, String)]()
  private val tabSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def tabMeta(id: Long): Obj = Option(tabsStore.get(id)) match {
    // a concurrent DELETE between snapshot and read leaves just the id
    case Some((index, name, _)) =>
      obj("id" -> num(id), "index" -> num(index), "name" -> str(name))
    case None => obj("id" -> num(id))
  }
  private def tabsMeta(): Arr = {
    import scala.jdk.CollectionConverters._
    Arr(tabsStore.keySet.asScala.toSeq.sorted
      .filter(tabsStore.containsKey(_)).map(tabMeta))
  }

  private def handleTabs(ex: HttpExchange): Unit =
    try {
      val parts = tail(ex, "/api/tab")
      def fields(v: Value): Option[(Option[Long], Option[String], Option[String])] = {
        val keys = v.asObject.keySet
        if (keys.isEmpty || (keys -- Set("index", "name", "content")).nonEmpty) None
        else Some((
          v.get("index").collect { case Num(n, _) => n.toLong },
          v.get("name").collect { case Str(s) => s },
          v.get("content").collect { case Str(s) => s }))
      }
      (ex.getRequestMethod, parts) match {
        case ("GET", Seq()) =>
          import scala.jdk.CollectionConverters._
          // Option-guarded: a concurrent DELETE between the keySet
          // snapshot and the read must drop the row, not NPE the listing
          reply(ex, 200, write(Arr(tabsStore.keySet.asScala.toSeq.sorted.flatMap { id =>
            Option(tabsStore.get(id)).map { case (index, name, content) =>
              obj("id" -> num(id), "index" -> num(index), "name" -> str(name),
                "content" -> str(content))
            }
          })))
        case ("POST", Seq()) =>
          fields(Json.parse(readBody(ex))) match {
            case None => crudError(ex, 400, "Invalid parameters")
            case Some((index, name, content)) =>
              val id = tabSeq.incrementAndGet()
              tabsStore.put(id, (index.getOrElse(id), name.getOrElse(s"Tab $id"),
                content.getOrElse("")))
              reply(ex, 200, write(obj(
                "tab_meta" -> tabMeta(id), "tabs_meta" -> tabsMeta())))
          }
        case ("GET", Seq(id)) =>
          Option(tabsStore.get(id.toLong)) match {
            case None => crudError(ex, 404, "The tab does not exist")
            case Some((index, name, content)) =>
              reply(ex, 200, write(obj("id" -> num(id.toLong),
                "index" -> num(index), "name" -> str(name),
                "content" -> str(content))))
          }
        case ("PUT", Seq(id)) =>
          if (!tabsStore.containsKey(id.toLong))
            crudError(ex, 404, "The tab does not exist")
          else fields(Json.parse(readBody(ex))) match {
            case None => crudError(ex, 400, "Invalid parameters")
            case Some((index, name, content)) =>
              val (i0, n0, c0) = tabsStore.get(id.toLong)
              tabsStore.put(id.toLong,
                (index.getOrElse(i0), name.getOrElse(n0), content.getOrElse(c0)))
              reply(ex, 200, write(obj(
                "tab_meta" -> tabMeta(id.toLong), "tabs_meta" -> tabsMeta())))
          }
        case ("DELETE", Seq(id)) =>
          if (tabsStore.remove(id.toLong) == null)
            crudError(ex, 404, "The tab does not exist")
          else reply(ex, 200, "\"\"")
        case _ => crudError(ex, 405, s"unsupported ${ex.getRequestMethod} /api/tab")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** POST /api/webhooks/chatbots/<token>: the inbound message receiver
    * (namespaces/webhooks.py → chatbot_controller.on_webhook). The token
    * is the chatbot's `webhook_token` param; the message text completes
    * through the bot's agent (or the plain llm stub for model-backed
    * bots) and the per-(token, chat_id) history is kept server-side like
    * the reference's chat_bot_memory. */
  private val webhookMemory =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.util.ArrayList[(String, String)]]()

  private def handleChatbotWebhook(ex: HttpExchange): Unit =
    try {
      val parts = tail(ex, "/api/webhooks/chatbots")
      (ex.getRequestMethod, parts) match {
        case ("POST", Seq(token)) =>
          val cat = tenantState().catalog
          val bot = cat.listChatbots().flatMap(cat.chatbot)
            .find(_.params.get("webhook_token").contains(token))
          bot match {
            case None => crudError(ex, 404, s"No chatbot registered for webhook token $token")
            case Some(ent) =>
              val body = Json.parse(readBody(ex))
              val text = body.get("text")
                .orElse(body.get("message").flatMap(_.get("text")))
                .collect { case Str(s) => s }
              val chatId = body.get("chat_id").collect {
                case Str(s) => s; case Num(_, raw) => raw
              }.getOrElse("default")
              text match {
                case None => crudError(ex, 400, "Missing message text")
                case Some(t) =>
                  val answer = ent.agent match {
                    case Some(agent) => askAgent(agent, t)
                    case None =>
                      val q = sqlStr(t)
                      session().execute(s"SELECT llm('$q') AS answer")
                        .collect().head.getString(0)
                  }
                  val hist = webhookMemory.computeIfAbsent((token, chatId),
                    _ => new java.util.ArrayList[(String, String)]())
                  hist.synchronized {
                    hist.add(("user", t)); hist.add(("assistant", answer))
                  }
                  reply(ex, 200, write(obj("success" -> Bool(true),
                    "answer" -> str(answer),
                    "chat_id" -> str(chatId),
                    "history_length" -> num(hist.size.toLong))))
              }
          }
        case _ => crudError(ex, 405,
          s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** Per-handler metadata the icon/readme/info routes serve
    * (namespaces/handlers.py:68-127 reads them from each handler
    * package's folder; this build ships them inline — same shapes, no
    * filesystem walk). */
  private val handlerMeta: Map[String, (String, String)] = Map(
    "fit" -> ("ml", "Built-in least-squares trainer: CREATE MODEL ... PREDICT <target> USING features='...'."),
    "files" -> ("data", "Uploaded-file storage: PUT /api/files/<name>, query as files.<name> (csv/json/parquet/xlsx/pdf/txt sniffed)."),
    "mem" -> ("data", "In-memory DSv2 datasource used to exercise the federated pushdown contract (filters/prune/limit/topN/agg)."),
    "byom" -> ("ml", "Bring-your-own-model: upload code via PUT /api/handlers/byom/<name>, then CREATE MODEL ... USING engine='<name>'. Models train and predict in forked worker processes."))

  /** Handlers namespace (namespaces/handlers.py): the installed engine
    * handlers plus per-handler info/icon/readme and the BYOM
    * code-upload routes. */
  private def handleHandlers(ex: HttpExchange): Unit =
    try {
      val parts = tail(ex, "/api/handlers")
      def byomEnabled: Boolean = Option(mutableConfig.get("byom"))
        .flatMap(_.get("enabled")).contains(Bool(true))
      def byomDisabledError(): Unit =
        // the reference's 403 envelope (handlers.py:257-267), including
        // the remediation hint
        reply(ex, 403, write(obj("title" -> str("BYOM is disabled"),
          "detail" -> str("BYOM is disabled on this server. To enable " +
            "this feature, set the environment variable " +
            "MINDSDB_BYOM_ENABLED=true, or change the value in the " +
            "configuration file config['byom']['enabled'] = True"))))
      (ex.getRequestMethod, parts) match {
        case ("GET", Seq()) =>
          reply(ex, 200, write(records(
            session().execute("SELECT name, type, import_success FROM mindsdb.handlers"))))
        case ("GET", Seq(name)) =>
          handlerMeta.get(name) match {
            case Some((tpe, _)) => reply(ex, 200, write(obj(
              "name" -> str(name), "type" -> str(tpe),
              "import_success" -> Bool(true))))
            case None => crudError(ex, 404, s"Handler '$name' not found")
          }
        case ("GET", Seq(name, "icon")) =>
          // send_file analog: a deterministic per-handler SVG
          if (!handlerMeta.contains(name))
            crudError(ex, 404, s"Icon for '$name' not found")
          else reply(ex, 200,
            s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 24 24">""" +
              s"""<title>$name</title><rect width="24" height="24" rx="4"/>""" +
              s"""<text x="12" y="16" text-anchor="middle" fill="#fff">""" +
              s"""${name.take(2).toUpperCase}</text></svg>""",
            contentType = "image/svg+xml")
        case ("POST", Seq(name, "install")) =>
          // handlers.py:165-195 InstallDependencies: unknown handler →
          // 400; an already-imported handler (or one with no
          // dependencies) answers "Installed" 200 without touching pip.
          // Every handler in this engine is JVM-native and always
          // import-successful, so the short-circuit branch IS the
          // complete behavior — the pip path is unreachable by
          // construction, not stubbed
          if (!handlerMeta.contains(name))
            reply(ex, 400, write(str(s"Unknown handler: $name")))
          else reply(ex, 200, write(str("Installed")))
        case ("GET", Seq(name, "readme")) =>
          // handlers.py:115-160 answers the envelope even for unknown
          // names (error_message set, HTTP 200)
          handlerMeta.get(name) match {
            case Some((_, readme)) => reply(ex, 200, write(obj(
              "name" -> str(name), "readme" -> str(s"# $name\n\n$readme"),
              "error_message" -> Null)))
            case None => reply(ex, 200, write(obj(
              "name" -> str(name), "readme" -> Null,
              "error_message" -> str(s"Handler '$name' not found"))))
          }
        // BYOM code upload (handlers.py:252-341): PUT registers a new
        // engine from the posted code, POST uploads a new VERSION of an
        // existing engine. The reference takes multipart form-data
        // (code/modules files); this server takes the same fields as a
        // JSON body — storage contract and engine lifecycle identical.
        case ("PUT", Seq("byom", name)) =>
          if (!byomEnabled) { byomDisabledError(); return }
          val body = Json.parse(readBody(ex))
          val code = body.get("code").collect { case Str(s) => s }.getOrElse(
            throw new IllegalArgumentException("""missing "code" field"""))
          val modules = body.get("modules").collect { case Str(s) => s }.getOrElse("")
          val tpe = body.get("type").collect { case Str(s) => s }
          val st = tenantState()
          if (st.catalog.mlEngine(name).isDefined)
            reply(ex, 409, write(obj("title" -> str("Engine already exists"),
              "detail" -> str(s"""Engine "$name" already exists"""))))
          else {
            st.catalog.createMlEngine(name, "byom",
              Map("code" -> code, "modules" -> modules, "versions" -> "1") ++
                tpe.map("type" -> _))
            reply(ex, 200, "\"\"")
          }
        case ("POST", Seq("byom", name)) =>
          if (!byomEnabled) { byomDisabledError(); return }
          val body = Json.parse(readBody(ex))
          val code = body.get("code").collect { case Str(s) => s }.getOrElse(
            throw new IllegalArgumentException("""missing "code" field"""))
          val modules = body.get("modules").collect { case Str(s) => s }.getOrElse("")
          val st = tenantState()
          if (st.catalog.mlEngine(name).isEmpty)
            crudError(ex, 404, s"ML engine $name does not exist")
          else {
            val updated = st.catalog.updateMlEngine(name,
              Map("code" -> code, "modules" -> modules))
            val versions = updated.params("versions").split(",").map(_.trim.toInt).toSeq
            reply(ex, 200, write(obj(
              "last_engine_version" -> num(versions.max.toLong),
              "engine_versions" -> Arr(versions.map(v => num(v.toLong))))))
          }
        case _ => crudError(ex, 405,
          s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** Integrations namespace (namespaces/integrations.py): REST
    * passthrough to a datasource's upstream API with stored-credential
    * injection, plus the capabilities listing. */
  private def handleIntegrations(ex: HttpExchange): Unit =
    try {
      val parts = tail(ex, "/api/integrations")
      def passthroughError(e: Passthrough.PassthroughException): Unit =
        reply(ex, e.httpStatus, write(obj(
          "error_code" -> str(e.errorCode), "message" -> str(e.getMessage))))
      def dbParams(name: String): Map[String, String] = {
        val st = tenantState()
        st.catalog.database(name) match {
          case Some(d) =>
            if (!Passthrough.supports(d.params))
              throw Passthrough.notSupported(
                s"datasource '$name' does not support REST passthrough")
            d.params
          case None => throw Passthrough.notSupported(
            s"datasource '$name' does not support REST passthrough")
        }
      }
      (ex.getRequestMethod, parts) match {
        case ("POST", Seq(name, "passthrough")) =>
          try {
            val req = Passthrough.parseRequest(Json.parse(readBody(ex)))
            val resp = Passthrough.call(dbParams(name), req)
            reply(ex, 200, write(Passthrough.serialize(resp)))
          } catch {
            case e: Passthrough.PassthroughException => passthroughError(e)
          }
        case ("POST", Seq(name, "passthrough", "test")) =>
          try reply(ex, 200, write(Passthrough.test(dbParams(name))))
          catch { case e: Passthrough.PassthroughException => passthroughError(e) }
        case ("GET", Seq("capabilities")) =>
          // integrations.py:137-185: structured per-handler passthrough
          // capabilities + the legacy flat bearer list
          val st = tenantState()
          val capable = st.catalog.listDatabases()
            .flatMap(n => st.catalog.database(n))
            .filter(d => Passthrough.supports(d.params))
            .map(_.engine).distinct.sorted
          reply(ex, 200, write(obj(
            "handlers" -> Obj(capable.map(e => e -> (obj(
              "auth_modes" -> arr(str("bearer")),
              "operations" -> arr(str("passthrough"))): Value)).toMap),
            "bearer_passthrough" -> Arr(capable.map(str)))))
        case _ => crudError(ex, 405,
          s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

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
          if (format == "default") reply(ex, 200, write(runSql(sql)))
          else streamSql(ex, sql, sse = format == "sse")
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

  /** Execute and build the single-piece envelope. The table envelope is
    * driver-materialized BY CONTRACT (the reference's to_lists()), so it
    * carries a row cap: a result past the cap answers with an error
    * steering the client to the streaming formats instead of OOMing the
    * server on an accidental `SELECT * FROM lineitem` — the analog of
    * the reference's max-packet guard. limit(cap+1) keeps the probe
    * itself bounded (Catalyst plans a GlobalLimit, never a full collect). */
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
        val capped = df.limit(maxTableRows + 1).collect().toSeq
        if (capped.length > maxTableRows)
          errorEnvelope(s"Result exceeds $maxTableRows rows; re-run with " +
            "\"response_format\": \"jsonlines\" or \"sse\" to stream large results.")
        else {
          val data = capped.map(r => rowJson(r, fields))
          obj("type" -> str("table"),
            "data" -> Arr(data),
            "column_names" -> Arr(fields.map(f => str(f.name)).toSeq),
            "context" -> obj())
        }
      }
    } catch {
      case e: Throwable => errorEnvelope(Option(e.getMessage).getOrElse(e.toString))
    }

  private def errorEnvelope(msg: String): Obj =
    obj("type" -> str("error"), "error_code" -> num(0L),
      "error_message" -> str(msg), "context" -> obj())

  /** jsonlines / SSE: header line with column_names, then one JSON array
    * per row, written INCREMENTALLY from toLocalIterator over a chunked
    * response — matching stream_http_response_jsonlines, and the reason
    * the streaming formats exist: the full result never materializes
    * server-side (only one partition is resident at a time). Errors/OK
    * dump their single envelope as the only line. */
  private def streamSql(ex: HttpExchange, sql: String, sse: Boolean): Unit = {
    val mime = if (sse) "text/event-stream" else "application/jsonlines"
    def line(s: String): String = if (sse) s"data: $s\n" else s + "\n"
    val dfOrEnv =
      try {
        val df = session().execute(sql)
        val names = df.schema.fieldNames.toSeq
        if (names == Seq("status", "message") ||
            names == Seq("status", "message", "affected_rows")) {
          val row = df.collect().headOption
          val affected = row.filter(_.length > 2).map(_.getLong(2)).getOrElse(0L)
          Left(obj("type" -> str("ok"), "affected_rows" -> num(affected),
            "context" -> obj()))
        } else Right(df)
      } catch {
        case e: Throwable =>
          Left(errorEnvelope(Option(e.getMessage).getOrElse(e.toString)))
      }
    ex.getResponseHeaders.set("Content-Type", mime)
    ex.sendResponseHeaders(200, 0) // chunked transfer
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(ex.getResponseBody, "UTF-8"))
    try dfOrEnv match {
      case Left(env) => out.write(line(write(env)))
      case Right(df) =>
        val fields = df.schema.fields
        out.write(line(write(obj("type" -> str("table"),
          "column_names" -> Arr(fields.map(f => str(f.name)).toSeq)))))
        val it = df.toLocalIterator()
        var n = 0
        while (it.hasNext) {
          out.write(line(write(rowJson(it.next(), fields))))
          n += 1
          if (n % 1000 == 0) out.flush()
        }
    } finally {
      try out.close() catch { case _: Throwable => }
      ex.close()
    }
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
            "capabilities" -> obj("tools" -> obj(),
              "resources" -> obj(), "prompts" -> obj()))))
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
        // ---- MCP resources (api/mcp/resources/schema.py): cached
        // schema snapshots a client can read without the query tool
        case Some("resources/list") =>
          reply(ex, 200, rpcResult(obj("resources" -> arr(
            obj("uri" -> str("schema://databases"),
              "name" -> str("databases"),
              "mimeType" -> str("application/json"),
              "description" -> str(
                "Initial list of connected data source names available for querying")),
            obj("uri" -> str("schema://knowledge_bases"),
              "name" -> str("knowledge_bases"),
              "mimeType" -> str("application/json"),
              "description" -> str(
                "Initial list of knowledge bases with their column configuration"))))))
        case Some("resources/templates/list") =>
          reply(ex, 200, rpcResult(obj("resourceTemplates" -> arr(
            obj("uriTemplate" -> str("schema://databases/{database_name}/tables"),
              "name" -> str("db_tables"),
              "mimeType" -> str("application/json"),
              "description" -> str("Initial list of tables in the specified database")),
            obj("uriTemplate" -> str(
              "schema://databases/{database_name}/tables/{table_name}/columns"),
              "name" -> str("db_table_columns"),
              "mimeType" -> str("application/json"),
              "description" -> str("Initial column names and types for a table"))))))
        case Some("resources/read") =>
          val uri = req.get("params").flatMap(_.get("uri"))
            .collect { case Str(u) => u }.getOrElse("")
          def contents(v: Value): String = rpcResult(obj("contents" -> arr(obj(
            "uri" -> str(uri), "mimeType" -> str("application/json"),
            "text" -> str(write(v))))))
          val TablesUri = "schema://databases/([\\w.]+)/tables".r
          val ColumnsUri = "schema://databases/([\\w.]+)/tables/([\\w.]+)/columns".r
          uri match {
            case "schema://databases" =>
              val names = session().execute("SHOW DATABASES")
                .collect().map(_.getString(0)).toSeq
              reply(ex, 200, contents(Arr(names.map(str))))
            case "schema://knowledge_bases" =>
              val st = tenantState()
              reply(ex, 200, contents(Arr(st.catalog.listKbs().map { n =>
                val p = st.catalog.kb(n).map(_.params).getOrElse(Map.empty)
                obj("name" -> str(n), "project" -> str("graft"),
                  "metadata_columns" -> Arr(p.get("metadata_columns").toSeq
                    .flatMap(_.split(",")).map(s => str(s.trim))),
                  "content_columns" -> Arr(p.get("content_columns").toSeq
                    .flatMap(_.split(",")).map(s => str(s.trim))),
                  "id_column" -> p.get("id_column").map(str).getOrElse(Null))
              })))
            case TablesUri(db) =>
              // honor the {database_name} segment: the SCOPED listing
              // (like the REST per-db route), -32602 for an unknown db —
              // never the global list stamped with the requested name
              val known = session().execute("SHOW DATABASES").collect()
                .exists(_.getString(0).equalsIgnoreCase(db))
              if (!known)
                reply(ex, 200, rpcError(-32602, s"unknown database: $db"))
              else {
                val rows = session().execute(
                  s"SHOW TABLES FROM ${sqlIdent(db)}").collect().toSeq
                reply(ex, 200, contents(Arr(rows.map(r => obj(
                  "TABLE_NAME" -> str(r.getString(0)),
                  "TABLE_TYPE" -> str(if (r.length > 1) r.getString(1)
                                      else "BASE TABLE"),
                  "TABLE_SCHEMA" -> str(db))))))
              }
            case ColumnsUri(_, table) =>
              val rows = session().execute(
                s"""SELECT column_name, data_type FROM information_schema.columns
                    WHERE table_name = '${sqlStr(table)}'""").collect().toSeq
              if (rows.isEmpty)
                reply(ex, 200, rpcError(-32602, s"unknown table: $table"))
              else reply(ex, 200, contents(Arr(rows.map(r => obj(
                "COLUMN_NAME" -> str(r.getString(0)),
                "MYSQL_DATA_TYPE" -> str(r.getString(1)))))))
            case other0 =>
              reply(ex, 200, rpcError(-32602, s"unknown resource: $other0"))
          }
        // protocol ping (MCP spec utility method)
        case Some("ping") => reply(ex, 200, rpcResult(obj()))
        // argument autocompletion for prompt/resource-template args
        // (api/mcp/completions.py): database_name completes from the
        // live catalog, table_name from information_schema, both
        // prefix-filtered on the typed value
        case Some("completion/complete") =>
          val params = req.get("params").getOrElse(obj())
          val argName = params.get("argument").flatMap(_.get("name"))
            .collect { case Str(s) => s }.getOrElse("")
          val argValue = params.get("argument").flatMap(_.get("value"))
            .collect { case Str(s) => s }.getOrElse("")
          val values: Seq[String] = argName match {
            case "database_name" =>
              session().execute("SHOW DATABASES").collect()
                .map(_.getString(0)).toSeq.filter(_.startsWith(argValue))
            case "table_name" =>
              session().execute(
                "SELECT table_name FROM information_schema.tables").collect()
                .map(_.getString(0)).toSeq.filter(_.startsWith(argValue))
            case _ => Seq.empty
          }
          reply(ex, 200, rpcResult(obj("completion" -> obj(
            "values" -> Arr(values.map(str)),
            "total" -> num(values.size.toLong),
            "hasMore" -> Bool(false)))))
        // ---- MCP prompts (api/mcp/prompts/sample_table.py)
        case Some("prompts/list") =>
          reply(ex, 200, rpcResult(obj("prompts" -> arr(obj(
            "name" -> str("sample_table"),
            "description" -> str(
              "Fetch 5 sample rows from a table and describe its structure."),
            "arguments" -> arr(
              obj("name" -> str("database_name"), "required" -> Bool(true)),
              obj("name" -> str("table_name"), "required" -> Bool(true))))))))
        case Some("prompts/get") =>
          val params = req.get("params").getOrElse(obj())
          val name = params.get("name").collect { case Str(n) => n }
          if (!name.contains("sample_table"))
            reply(ex, 200, rpcError(-32602, s"unknown prompt: ${name.getOrElse("?")}"))
          else {
            val args = params.get("arguments").getOrElse(obj())
            val db = args.get("database_name").collect { case Str(s) => s }.getOrElse("graft")
            val table = args.get("table_name").collect { case Str(s) => s }.getOrElse("")
            val text =
              s"Use the `query` tool to fetch 5 sample rows from the table `$table` " +
                s"in database `$db`:\n\n```sql\nSELECT * FROM `$db`.`$table` LIMIT 5;\n```\n\n" +
                "After getting the results, briefly describe the table structure " +
                "and what kind of data it contains."
            reply(ex, 200, rpcResult(obj("messages" -> arr(obj(
              "role" -> str("user"),
              "content" -> obj("type" -> str("text"), "text" -> str(text)))))))
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
  // CRUD namespaces (api/http/namespaces/databases.py, models.py,
  // knowledge_bases.py, projects.py — the most-used of the reference's
  // 22 CRUD modules), each a thin REST shape over the SQL router
  // ------------------------------------------------------------------

  /** DataFrame → list of {column: value} records (the reference's
    * to_dict("records") response shape). */
  private def records(df: DataFrame): Arr = {
    val fields = df.schema.fields
    Arr(df.collect().toSeq.map { row =>
      Obj(fields.zipWithIndex.map { case (f, i) =>
        f.name -> (if (row.isNullAt(i)) Null else valueJson(row.get(i), f.dataType))
      }.toMap)
    })
  }

  private def crudError(ex: HttpExchange, status: Int, msg: String): Unit =
    reply(ex, status, write(obj("title" -> str("Error"), "detail" -> str(msg))))

  /** Path segments after the context prefix, e.g.
    * /api/databases/db1/tables → Seq(db1, tables). */
  private def tail(ex: HttpExchange, prefix: String): Seq[String] =
    ex.getRequestURI.getPath.stripPrefix(prefix)
      .split("/").toSeq.filter(_.nonEmpty)

  private def sqlIdent(s: String): String = {
    require(s.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid identifier: $s")
    s
  }

  /** Escape untrusted text for splicing into a single-quoted SQL
    * literal. Backslashes double FIRST — Spark's default parser honors
    * backslash escapes, so escaping only quotes would let a trailing
    * `\'` in the input neutralize the escape and break out of the
    * string (injection from webhook senders). Quotes then double (`''`),
    * the spelling both Spark and the router's quote-toggling scanners
    * parse as a literal quote. */
  private def sqlStr(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  private def handleDatabases(ex: HttpExchange): Unit =
    try {
      val parts = tail(ex, "/api/databases")
      (ex.getRequestMethod, parts) match {
        case ("GET", Seq()) =>
          reply(ex, 200, write(records(session().execute("SHOW DATABASES"))))
        case ("POST", Seq()) =>
          val body = Json.parse(readBody(ex))
          body.get("database") match {
            case None =>
              crudError(ex, 400, "Must provide \"database\" parameter in POST body")
            case Some(db) =>
              (db.get("name"), db.get("engine")) match {
                case (None, _) => crudError(ex, 400, "Missing \"name\" field for database")
                case (_, None) => crudError(ex, 400,
                  "Missing \"engine\" field for database. If you want to create a project instead, use the /api/projects endpoint.")
                case (Some(Str(name)), Some(Str(engine))) =>
                  // engine + parameter keys are attacker-controlled JSON:
                  // keys must be bare identifiers, values escape quotes
                  val params = db.get("parameters").map(_.asObject).getOrElse(Map.empty)
                    .collect { case (k, Str(v)) => s"${sqlIdent(k)}='${v.replace("'", "''")}'"
                               case (k, Num(_, raw)) => s"${sqlIdent(k)}='$raw'" }
                  val withClause =
                    if (params.isEmpty) "" else s", PARAMETERS = ${params.mkString(", ")}"
                  session().execute(
                    s"CREATE DATABASE ${sqlIdent(name)} WITH ENGINE='${engine.replace("'", "''")}'$withClause")
                  reply(ex, 201, write(obj("name" -> str(name), "engine" -> str(engine))))
                case _ => crudError(ex, 400, "name and engine must be strings")
              }
          }
        case ("GET", Seq(name)) =>
          val row = session().execute(
            "SELECT name, engine, type FROM mindsdb.databases").collect()
            .find(_.getString(0).equalsIgnoreCase(name))
          row match {
            case Some(r) => reply(ex, 200, write(obj(
              "name" -> str(r.getString(0)), "engine" -> str(r.getString(1)),
              "type" -> str(r.getString(2)))))
            case None => crudError(ex, 404, s"Database $name does not exist")
          }
        case ("PUT", Seq(name)) =>
          // update-or-create (databases.py put): parameters modify an
          // existing connection; a new name needs an engine
          val body = Json.parse(readBody(ex))
          val db = body.get("database")
            .getOrElse { crudError(ex, 400, "Must provide \"database\" parameter in PUT body"); return }
          val params = db.get("parameters").map(_.asObject).getOrElse(Map.empty)
            .collect { case (k, Str(v)) => s"${sqlIdent(k)}='${v.replace("'", "''")}'"
                       case (k, Num(_, raw)) => s"${sqlIdent(k)}='$raw'" }
          val exists = session().execute("SHOW DATABASES").collect()
            .exists(_.getString(0).equalsIgnoreCase(name))
          if (!exists) {
            db.get("engine") match {
              case Some(Str(engine)) =>
                val withClause =
                  if (params.isEmpty) "" else s", PARAMETERS = ${params.mkString(", ")}"
                session().execute(s"CREATE DATABASE ${sqlIdent(name)} WITH " +
                  s"ENGINE='${engine.replace("'", "''")}'$withClause")
                reply(ex, 201, write(obj("name" -> str(name), "engine" -> str(engine))))
              case _ => crudError(ex, 400,
                "Missing \"engine\" field for new database. If you want to create a project instead, use the POST /api/projects endpoint.")
            }
          } else {
            if (params.nonEmpty)
              session().execute(
                s"ALTER DATABASE ${sqlIdent(name)} PARAMETERS = ${params.mkString(", ")}")
            reply(ex, 200, write(obj("name" -> str(name))))
          }
        case ("DELETE", Seq(name)) =>
          session().execute(s"DROP DATABASE ${sqlIdent(name)}")
          reply(ex, 204, "")
        case ("GET", Seq(db, "tables")) =>
          // scope to the named database like the reference's per-db
          // listing; an unknown database is a 404, not the global list
          val known = session().execute("SHOW DATABASES").collect()
            .exists(_.getString(0).equalsIgnoreCase(db))
          if (!known) crudError(ex, 404, s"Database name $db does not exist")
          else reply(ex, 200,
            write(records(session().execute(s"SHOW TABLES FROM ${sqlIdent(db)}"))))
        // table CRUD under a database (databases.py:257-380 + the
        // tables_test.py status-code matrix: 201/400/404/409)
        case ("GET", Seq(db, "tables", t)) =>
          // database existence first (tables_test.py matrix: unknown db
          // is a 404 even when t matches some globally-visible table)
          if (!session().execute("SHOW DATABASES").collect()
              .exists(_.getString(0).equalsIgnoreCase(db)))
            crudError(ex, 404, s"Database with name $db not found")
          else if (!dbTables(db).exists(_.equalsIgnoreCase(t)))
            crudError(ex, 404, s"Table with name $t not found")
          else reply(ex, 200, write(obj("name" -> str(t), "type" -> str("data"))))
        case ("POST", Seq(db, "tables")) =>
          val body = Json.parse(readBody(ex))
          body.get("table") match {
            case None => crudError(ex, 400,
              """Must provide "table" parameter in POST body""")
            case Some(table) =>
              val name = table.get("name").collect { case Str(s) => s }
              val select = table.get("select").collect { case Str(s) => s }
              val replace = table.get("replace").contains(Bool(true))
              if (name.isEmpty) crudError(ex, 400, """Missing "name" field for table""")
              else if (select.isEmpty)
                crudError(ex, 400, """Missing "select" field for table""")
              else if (isProject(db)) crudError(ex, 400,
                s"Database $db is a project. Use the projects/$db/models or " +
                  s"projects/$db/views endpoints instead.")
              else if (!session().execute("SHOW DATABASES").collect()
                  .exists(_.getString(0).equalsIgnoreCase(db)))
                crudError(ex, 404, s"Database with name $db does not exist")
              else if (dbTables(db).exists(_.equalsIgnoreCase(name.get)) && !replace)
                crudError(ex, 409, s"Table with name ${name.get} already exists")
              else {
                // replace = drop-then-create (REPLACE TABLE needs a
                // staging catalog, which JDBC sources don't offer)
                if (replace) session().execute(
                  s"DROP TABLE IF EXISTS ${qualifiedTable(db, name.get)}")
                session().execute(
                  s"CREATE TABLE ${qualifiedTable(db, name.get)} AS (${select.get})")
                reply(ex, 201, write(obj(
                  "name" -> str(name.get), "type" -> str("data"))))
              }
          }
        case ("DELETE", Seq(db, "tables", t)) =>
          if (isProject(db)) crudError(ex, 400,
            s"Database $db is a project. Use the projects/$db/models or " +
              s"projects/$db/views endpoints instead.")
          else if (!session().execute("SHOW DATABASES").collect()
              .exists(_.getString(0).equalsIgnoreCase(db)))
            crudError(ex, 404, s"Database with name $db not found")
          else if (!dbTables(db).exists(_.equalsIgnoreCase(t)))
            crudError(ex, 404, s"Table with name $t not found")
          else {
            session().execute(s"DROP TABLE ${qualifiedTable(db, t)}")
            reply(ex, 204, "")
          }
        case _ => crudError(ex, 405, s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e // non-local return after reply
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** table names of one database, via the scoped SHOW listing. */
  private def dbTables(db: String): Seq[String] =
    session().execute(s"SHOW TABLES FROM ${sqlIdent(db)}")
      .collect().map(_.getString(0)).toSeq

  /** true when `db` names a PROJECT (table CRUD must refuse those —
    * models/views live under /api/projects). */
  private def isProject(db: String): Boolean =
    session().execute("SHOW PROJECTS").collect()
      .exists(_.getString(0).equalsIgnoreCase(db))

  /** qualified table name inside a data database; JDBC engines address
    * their user schema (Derby: APP) explicitly. */
  private def qualifiedTable(db: String, t: String): String = {
    val engine = session().execute("SHOW DATABASES").collect()
      .find(_.getString(0).equalsIgnoreCase(db)).map(_.getString(1)).getOrElse("")
    if (Set("derby", "jdbc").contains(engine.toLowerCase))
      s"${sqlIdent(db)}.APP.${sqlIdent(t)}"
    else s"${sqlIdent(db)}.${sqlIdent(t)}"
  }

  private def handleProjects(ex: HttpExchange): Unit =
    try {
      val parts = tail(ex, "/api/projects")
      (ex.getRequestMethod, parts) match {
        case ("GET", Seq()) =>
          reply(ex, 200, write(records(session().execute("SHOW PROJECTS"))))
        case ("GET", Seq(p)) =>
          val found = session().execute("SHOW PROJECTS").collect()
            .exists(_.getString(0).equalsIgnoreCase(p))
          if (found) reply(ex, 200, write(obj("name" -> str(p))))
          else crudError(ex, 404, s"Project name $p does not exist")
        case ("GET", Seq(_, "models")) =>
          reply(ex, 200, write(records(session().execute("SHOW MODELS"))))
        case ("POST", Seq(_, "models")) =>
          val body = Json.parse(readBody(ex))
          body.get("query") match {
            case Some(Str(q)) if q.trim.toUpperCase.startsWith("CREATE") =>
              session().execute(q)
              reply(ex, 201, write(obj("status" -> str("complete"))))
            case Some(Str(q)) =>
              crudError(ex, 400, s"SQL CREATE statement is invalid: $q")
            case _ => crudError(ex, 400, "Missing \"query\" SQL statement")
          }
        case ("DELETE", Seq(_, "models", m)) =>
          session().execute(s"DROP MODEL ${sqlIdent(m)}")
          reply(ex, 204, "")
        case ("GET", Seq(_, "models", m, "describe")) =>
          reply(ex, 200, write(records(session().execute(s"DESCRIBE MODEL ${sqlIdent(m)}"))))
        case ("POST", Seq(_, "models", m, "predict")) =>
          val body = Json.parse(readBody(ex))
          val data = body("data").asArray.map(_.asObject)
          require(data.nonEmpty, "empty data")
          val cols = data.head.keys.toSeq.sorted
          val schema = StructType(cols.map { c =>
            StructField(c, data.head(c) match {
              case Num(_, _) => DoubleType
              case Bool(_) => BooleanType
              case _ => StringType
            })
          })
          val rows = data.map { rec =>
            Row.fromSeq(cols.map(c => rec.get(c) match {
              case Some(Num(n, _)) => n
              case Some(Bool(b)) => b
              case Some(Str(s)) => s
              case _ => null
            }))
          }
          val df = spark.createDataFrame(
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
          // unique per request: concurrent predicts on the same model
          // over the shared SparkSession must not overwrite each other's
          // input view between registration and execution
          val view = s"__http_predict_${HttpApi.predictSeq.incrementAndGet()}"
          df.createOrReplaceTempView(view)
          try {
            val preds = session().execute(s"SELECT * FROM $view JOIN ${sqlIdent(m)}")
            reply(ex, 200, write(records(preds)))
          } finally spark.catalog.dropTempView(view)
        // ---------------- agents namespace (api/http/namespaces/agents.py)
        case ("GET", Seq(_, "agents")) =>
          reply(ex, 200, write(Arr(listAgents().map(agentJson))))
        case ("POST", Seq(_, "agents")) =>
          val body = Json.parse(readBody(ex))
          body.get("agent") match {
            case None => crudError(ex, 400, "Must provide \"agent\" parameter in POST body")
            case Some(agent) =>
              agentName(agent) match {
                case None => crudError(ex, 400, "Missing \"name\" field for agent")
                case Some(name) if tenantState().catalog.agent(name).isDefined =>
                  crudError(ex, 409, s"Agent with name $name already exists. Please choose a different one.")
                case Some(name) =>
                  tenantState().catalog.createAgent(sqlIdent(name), agentModel(agent), agentExtraParams(agent))
                  reply(ex, 201, write(agentJson(tenantState().catalog.agent(name).get)))
              }
          }
        case ("GET", Seq(_, "agents", a)) =>
          tenantState().catalog.agent(a) match {
            case Some(ent) => reply(ex, 200, write(agentJson(ent)))
            case None => crudError(ex, 404, s"Agent with name $a does not exist")
          }
        case ("PUT", Seq(_, "agents", a)) =>
          val body = Json.parse(readBody(ex))
          body.get("agent") match {
            case None => crudError(ex, 400, "Must provide \"agent\" parameter in PUT body")
            case Some(_) if tenantState().catalog.agent(a).isEmpty =>
              // reference: PUT cannot create (agents.py "Creation is not allowed")
              crudError(ex, 400, "Creation of an agent using the PUT method is not allowed.")
            case Some(agent) =>
              tenantState().catalog.updateAgent(a,
                agentExtraParams(agent) ++ Map("model" -> agentModel(agent)))
              reply(ex, 200, write(agentJson(tenantState().catalog.agent(a).get)))
          }
        case ("DELETE", Seq(_, "agents", a)) =>
          if (tenantState().catalog.agent(a).isEmpty)
            crudError(ex, 404, s"Agent with name $a does not exist")
          else { tenantState().catalog.dropAgent(a); reply(ex, 204, "") }
        case ("POST", Seq(_, "agents", a, "completions")) =>
          if (tenantState().catalog.agent(a).isEmpty)
            crudError(ex, 404, s"Agent with name $a does not exist")
          else {
            val messages = Json.parse(readBody(ex)).get("messages").map(_.asArray)
            messages match {
              case None => crudError(ex, 400, "Must provide \"messages\" parameter in POST body")
              case Some(ms) =>
                val answer = askAgent(a, lastUserContent(ms))
                reply(ex, 200, write(obj("message" -> obj(
                  "content" -> str(answer), "role" -> str("assistant")))))
            }
          }
        case ("POST", Seq(_, "agents", a, "completions", "stream")) =>
          if (tenantState().catalog.agent(a).isEmpty)
            crudError(ex, 404, s"Agent with name $a does not exist")
          else {
            val ms = Json.parse(readBody(ex)).get("messages").map(_.asArray)
              .getOrElse { crudError(ex, 400, "Must provide \"messages\" parameter in POST body"); return }
            val answer = askAgent(a, lastUserContent(ms))
            // the reference streams per-chunk agent events; the
            // deterministic stand-in streams the completed answer as one
            // output chunk after a started event
            val lines = Seq(
              write(obj("type" -> str("start"), "agent" -> str(a))),
              write(obj("type" -> str("output"), "content" -> str(answer))),
              write(obj("type" -> str("end"))))
            // blank line terminates each SSE event — without it a
            // spec-compliant EventSource never dispatches anything
            reply(ex, 200, lines.map(l => s"data: $l\n\n").mkString, "text/event-stream")
          }

        // ---------------- jobs namespace (api/http/namespaces/jobs.py)
        case ("GET", Seq(p, "jobs")) =>
          reply(ex, 200, write(Arr(tenantState().jobs.list().map(j => jobJson(j, p)))))
        case ("POST", Seq(p, "jobs")) =>
          val body = Json.parse(readBody(ex))
          body.get("job") match {
            case None => crudError(ex, 400, "Must provide \"job\" parameter in POST body")
            case Some(job) =>
              val name = job.get("name").collect { case Str(s) => s }
                .getOrElse { crudError(ex, 400, "Missing \"name\" field for job"); return }
              val query = job.get("query").collect { case Str(s) => s }
                .getOrElse { crudError(ex, 400, "Missing \"query\" field for job"); return }
              val sched = job.get("schedule_str").collect { case Str(s) => s }
                .map(_.toLowerCase.stripPrefix("every").trim).getOrElse("1 day")
              def dateClause(k: String, kw: String) = job.get(k)
                .collect { case Str(s) => s" $kw '$s'" }.getOrElse("")
              val ifClause = job.get("if_query")
                .collect { case Str(s) => s" IF ($s)" }.getOrElse("")
              session().execute(
                s"CREATE JOB ${sqlIdent(name)} AS ($query) EVERY $sched" +
                dateClause("start_at", "START") + dateClause("end_at", "END") + ifClause)
              reply(ex, 200, write(jobJson(tenantState().jobs.get(name).get, p)))
          }
        case ("GET", Seq(p, "jobs", j)) =>
          tenantState().jobs.get(j) match {
            case Some(job) => reply(ex, 200, write(jobJson(job, p)))
            case None => crudError(ex, 404, s"Job with name $j does not exist")
          }
        case ("DELETE", Seq(_, "jobs", j)) =>
          if (tenantState().jobs.get(j).isEmpty) crudError(ex, 404, s"Job with name $j does not exist")
          else { tenantState().jobs.drop(j); reply(ex, 204, "") }
        case ("GET", Seq(_, "jobs", j, "history")) =>
          // reads go through Jobs' synchronized snapshot accessors — the
          // daemon thread appends to history concurrently
          if (tenantState().jobs.get(j).isEmpty && !tenantState().jobs.hasHistory(j))
            crudError(ex, 404, s"Job with name $j does not exist")
          else reply(ex, 200, write(Arr(
            tenantState().jobs.historyOf(j).map(r => obj(
              "name" -> str(r.job),
              "run_at" -> str(MysqlServer.textOf(java.sql.Timestamp.from(r.at))),
              "ok" -> Bool(r.ok),
              "error" -> r.error.map(str).getOrElse(Null))))))

        // ---------------- views namespace (api/http/namespaces/views.py)
        case ("GET", Seq(_, "views")) =>
          reply(ex, 200, write(Arr(
            tenantState().catalog.listViews().sorted.map(viewJson))))
        case ("POST", Seq(_, "views")) =>
          val view = Json.parse(readBody(ex)).get("view")
            .getOrElse { crudError(ex, 400, "Must provide \"view\" parameter in POST body"); return }
          val name = view.get("name").collect { case Str(s) => s }
            .getOrElse { crudError(ex, 400, "Missing \"name\" field for view"); return }
          val query = view.get("query").collect { case Str(s) => s }
            .getOrElse { crudError(ex, 400, "Missing \"query\" field for view"); return }
          if (tenantState().catalog.listViews().contains(name.toLowerCase))
            crudError(ex, 409, s"View with name $name already exists.")
          else {
            session().execute(s"CREATE VIEW ${sqlIdent(name)} AS $query")
            reply(ex, 201, write(viewJson(name.toLowerCase)))
          }
        case ("GET", Seq(_, "views", v)) =>
          if (!tenantState().catalog.listViews().contains(v.toLowerCase))
            crudError(ex, 404, s"View with name $v does not exist")
          else reply(ex, 200, write(viewJson(v.toLowerCase)))
        case ("PUT", Seq(_, "views", v)) =>
          val view = Json.parse(readBody(ex)).get("view")
            .getOrElse { crudError(ex, 400, "Must provide \"view\" parameter in PUT body"); return }
          val query = view.get("query").collect { case Str(s) => s }
          val exists = tenantState().catalog.listViews().contains(v.toLowerCase)
          if (!exists && query.isEmpty)
            crudError(ex, 400, "Missing \"query\" field for new view")
          else {
            // PUT updates, or creates when absent (views.py put: 201)
            query.foreach(q =>
              session().execute(s"CREATE OR REPLACE VIEW ${sqlIdent(v)} AS $q"))
            reply(ex, if (exists) 200 else 201, write(viewJson(v.toLowerCase)))
          }
        case ("DELETE", Seq(_, "views", v)) =>
          if (!tenantState().catalog.listViews().contains(v.toLowerCase))
            crudError(ex, 404, s"View with name $v does not exist")
          else { session().execute(s"DROP VIEW ${sqlIdent(v)}"); reply(ex, 204, "") }

        // ---------------- chatbots namespace (api/http/namespaces/chatbots.py)
        case ("GET", Seq(_, "chatbots")) =>
          reply(ex, 200, write(records(session().execute("SHOW CHATBOTS"))))
        case ("POST", Seq(_, "chatbots")) =>
          val bot = Json.parse(readBody(ex)).get("chatbot")
            .getOrElse { crudError(ex, 400, "Must provide \"chatbot\" parameter in POST body"); return }
          val name = bot.get("name").collect { case Str(s) => s }
            .getOrElse { crudError(ex, 400, "Missing \"name\" field for chatbot"); return }
          if (tenantState().catalog.chatbot(name).isDefined)
            crudError(ex, 409, s"Chatbot with name $name already exists.")
          else {
            val db = bot.get("database_name").orElse(bot.get("database"))
              .collect { case Str(s) => s }
              .getOrElse { crudError(ex, 400, "Missing \"database_name\" field for chatbot"); return }
            val engine = bot.get("agent_name").collect { case Str(s) => s"agent='${sqlIdent(s)}'" }
              .orElse(bot.get("model_name").collect { case Str(s) => s"model='${sqlIdent(s)}'" })
              .getOrElse { crudError(ex, 400, "Missing \"agent_name\" or \"model_name\" field for chatbot"); return }
            session().execute(
              s"CREATE CHATBOT ${sqlIdent(name)} USING database='${sqlIdent(db)}', $engine")
            reply(ex, 201, write(chatbotJson(tenantState().catalog.chatbot(name).get)))
          }
        case ("GET", Seq(_, "chatbots", b)) =>
          tenantState().catalog.chatbot(b) match {
            case Some(ent) => reply(ex, 200, write(chatbotJson(ent)))
            case None => crudError(ex, 404, s"Chatbot with name $b does not exist")
          }
        case ("DELETE", Seq(_, "chatbots", b)) =>
          if (tenantState().catalog.chatbot(b).isEmpty)
            crudError(ex, 404, s"Chatbot with name $b does not exist")
          else { session().execute(s"DROP CHATBOT ${sqlIdent(b)}"); reply(ex, 204, "") }

        case ("GET", Seq(_, "knowledge_bases")) =>
          reply(ex, 200, write(records(session().execute("SHOW KNOWLEDGE_BASES"))))
        case ("POST", Seq(_, "knowledge_bases")) =>
          val body = Json.parse(readBody(ex))
          body.get("knowledge_base").flatMap(_.get("name")) match {
            case Some(Str(name)) =>
              session().execute(s"CREATE KNOWLEDGE BASE ${sqlIdent(name)}")
              reply(ex, 201, write(obj("name" -> str(name))))
            case _ => crudError(ex, 400, "Missing \"knowledge_base\".\"name\"")
          }
        case ("DELETE", Seq(_, "knowledge_bases", k)) =>
          session().execute(s"DROP KNOWLEDGE BASE ${sqlIdent(k)}")
          reply(ex, 204, "")
        case _ => crudError(ex, 405, s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e // non-local return after reply
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** Files namespace (api/http/namespaces/file.py `put_file`): an
    * uploaded file lands in the warehouse `.files` area and is
    * immediately queryable as `files.<name>` (format-sniffed distributed
    * scan). The reference accepts multipart form-data; this server takes
    * the file as the raw PUT body with the extension carried by the
    * path — the storage contract and SQL namespace are identical. */
  private def handleFiles(ex: HttpExchange): Unit =
    try {
      val parts = tail(ex, "/api/files")
      val filesDir = java.nio.file.Paths.get(s"${tenantState().warehouse.dir}/.files")
      (ex.getRequestMethod, parts) match {
        case ("GET", Seq()) =>
          val names =
            if (!java.nio.file.Files.isDirectory(filesDir)) Seq.empty[String]
            else {
              val s = java.nio.file.Files.list(filesDir)
              try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path]
                .getFileName.toString).sorted
              finally s.close()
            }
          reply(ex, 200, write(Arr(names.map(n =>
            obj("name" -> str(n.replaceAll("\\.[^.]+$", "")), "file" -> str(n))))))
        // URL source (namespaces/file.py:153-231): JSON body
        // {source_type:'url', source:<url>} fetches the file server-side,
        // gated by the url_file_upload config (enabled + allowed/
        // disallowed origins through Security.validateUrls)
        case ("PUT", Seq(name)) if Option(ex.getRequestHeaders
            .getFirst("Content-Type")).exists(_.startsWith("application/json")) =>
          require(name.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"), s"bad file name: $name")
          val body = Json.parse(readBody(ex))
          val sourceType = body.get("source_type")
            .collect { case Str(s) => s }.getOrElse("file")
          if (sourceType != "url")
            crudError(ex, 400, s"""Only "url" supported as JSON file source, got "$sourceType"""")
          else body.get("source").collect { case Str(s) => s } match {
            case None => crudError(ex, 400,
              """If the file's source type is URL, the "source" field should be specified.""")
            case Some(url) =>
              val cfg = Option(mutableConfig.get("url_file_upload"))
              def strsOf(k: String): Seq[String] = cfg.toSeq.flatMap(
                _.get(k).map(_.asArray).getOrElse(Seq.empty)
                  .collect { case Str(s) => s })
              val enabled = cfg.flatMap(_.get("enabled"))
                .forall(_ == Bool(true))
              if (!enabled) crudError(ex, 400, "URL file upload is disabled.")
              else if (scala.util.Try(Security.splitUrl(url)).isFailure)
                crudError(ex, 400, s"The URL is not valid: $url")
              else if (!Security.validateUrls(Seq(url),
                  strsOf("allowed_origins"), strsOf("disallowed_origins")))
                crudError(ex, 400,
                  "URL is not allowed for security reasons. Allowed hosts are: " +
                    (if (strsOf("allowed_origins").nonEmpty)
                      strsOf("allowed_origins").mkString(", ")
                    else "not specified") + ".")
              else {
                val http = java.net.http.HttpClient.newHttpClient()
                val resp = http.send(
                  java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
                    .timeout(java.time.Duration.ofSeconds(30)).build(),
                  java.net.http.HttpResponse.BodyHandlers.ofByteArray())
                if (resp.statusCode() != 200)
                  crudError(ex, 400, s"Error getting file: got status code: ${resp.statusCode()}")
                else {
                  java.nio.file.Files.createDirectories(filesDir)
                  java.nio.file.Files.write(
                    filesDir.resolve(Security.clearFilename(name)), resp.body())
                  reply(ex, 201, write(obj("name" -> str(name))))
                }
              }
          }
        case ("PUT", Seq(name)) =>
          require(name.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"), s"bad file name: $name")
          java.nio.file.Files.createDirectories(filesDir)
          val bytes = ex.getRequestBody.readAllBytes()
          require(bytes.nonEmpty, "empty file body")
          java.nio.file.Files.write(filesDir.resolve(name), bytes)
          reply(ex, 201, write(obj("name" -> str(name))))
        case ("DELETE", Seq(name)) =>
          require(name.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"), s"bad file name: $name")
          val deleted = java.nio.file.Files.deleteIfExists(filesDir.resolve(name))
          if (deleted) reply(ex, 204, "")
          else crudError(ex, 404, s"file $name not found")
        case _ => crudError(ex, 405, s"unsupported ${ex.getRequestMethod} ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e // non-local return after reply
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  // ------------------------------------------------------------------
  // agents / jobs / views / chatbots helpers + the OpenAI-compatible
  // chat endpoint
  // ------------------------------------------------------------------

  /** Route one question through the agents-as-tables SQL path — the
    * single completion seam shared by A2A, the agents namespace, and
    * /v1/chat/completions (reference: agents_controller.get_completion). */
  private def askAgent(agent: String, question: String): String = {
    val q = sqlStr(question)
    session().execute(
      s"SELECT answer FROM ${sqlIdent(agent)} WHERE question = '$q'")
      .collect().headOption.map(_.getString(0)).getOrElse("")
  }

  /** Content of the last user-role message (OpenAI messages contract);
    * falls back to the last message of any role. */
  private def lastUserContent(messages: Seq[Value]): String = {
    val texts = messages.flatMap { m =>
      val role = m.get("role").collect { case Str(r) => r }.getOrElse("user")
      m.get("content").collect { case Str(c) => (role, c) }
    }
    texts.reverseIterator.collectFirst { case ("user", c) => c }
      .orElse(texts.lastOption.map(_._2)).getOrElse("")
  }

  private def agentName(agent: Value): Option[String] =
    agent.get("name").collect { case Str(s) => s }

  /** model from the REST body: `model` (string or {model_name,...} dict)
    * or flat `model_name` (agents.py create_agent). */
  private def agentModel(agent: Value): String =
    agent.get("model").flatMap {
      case Str(s) => Some(s)
      case o: Obj => o.get("model_name").collect { case Str(s) => s }
      case _ => None
    }.orElse(agent.get("model_name").collect { case Str(s) => s })
      .getOrElse("default")

  /** params/data/prompt_template flattened into the catalog's string
    * param map (non-string JSON values keep their JSON spelling). */
  private def agentExtraParams(agent: Value): Map[String, String] = {
    def flat(v: Value): String = v match {
      case Str(s) => s
      case other => write(other)
    }
    val base = agent.get("params").collect { case Obj(fs) => fs }
      .getOrElse(Map.empty).map { case (k, v) => k -> flat(v) }
    base ++
      agent.get("prompt_template").collect { case Str(s) => "prompt_template" -> s } ++
      agent.get("data").map(d => "data" -> flat(d))
  }

  private def agentJson(name: String): Value =
    tenantState().catalog.agent(name).map(agentJson).getOrElse(Null)

  private def agentJson(ent: Catalog.AgentEntity): Value =
    obj("name" -> str(ent.name), "model_name" -> str(ent.model),
      "params" -> Obj(ent.params.map { case (k, v) => k -> str(v) }))

  private def listAgents(): Seq[Catalog.AgentEntity] =
    tenantState().catalog.listAgents().sorted.flatMap(tenantState().catalog.agent)

  private def jobJson(j: graft.incremental.Jobs.Job, project: String): Value = {
    def ts(i: Option[java.time.Instant]): Value = i match {
      case Some(t) if t != java.time.Instant.EPOCH =>
        str(MysqlServer.textOf(java.sql.Timestamp.from(t)))
      case _ => Null
    }
    obj("id" -> num(j.id), "name" -> str(j.name), "project" -> str(project),
      "start_at" -> ts(j.start), "end_at" -> ts(j.end),
      "next_run_at" -> ts(Some(j.nextRun)),
      "last_run_at" -> ts(tenantState().jobs.lastRunAt(j.name)),
      "schedule_str" -> str(j.schedule),
      "query" -> str(j.queryText),
      "if_query" -> (if (j.ifQueryText.isEmpty) Null else str(j.ifQueryText)))
  }

  private def viewJson(name: String): Value =
    obj("id" -> num((name.hashCode.toLong & 0x7fffffffL)),
      "name" -> str(name),
      "query" -> str(tenantState().catalog.viewSql(name).getOrElse("")))

  private def chatbotJson(ent: Catalog.ChatbotEntity): Value =
    obj("name" -> str(ent.name), "database" -> str(ent.database),
      "model_name" -> ent.model.map(str).getOrElse(Null),
      "agent_name" -> ent.agent.map(str).getOrElse(Null),
      "is_running" -> Bool(ent.isRunning))

  /** OpenAI-compatible `/v1/chat/completions` over an agent (the
    * reference's litellm server, api/litellm/start.py: `model` names the
    * agent, optionally project-qualified). Non-stream answers one
    * chat.completion object; `stream: true` answers SSE
    * chat.completion.chunk deltas ending with `data: [DONE]` — the
    * standard contract every OpenAI-client library speaks. */
  private def handleChatCompletions(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "POST") {
        reply(ex, 405, write(openAiError("use POST"))); return
      }
      val body = Json.parse(readBody(ex))
      val model = body.get("model").collect { case Str(s) => s }.getOrElse("")
      // accept "project.agent" (litellm model naming) — the catalog is
      // project-flat, the last segment is the agent
      val agent = model.split("\\.").last
      val messages = body.get("messages").map(_.asArray).getOrElse(Seq.empty)
      if (model.isEmpty || messages.isEmpty) {
        reply(ex, 400, write(openAiError("\"model\" and \"messages\" are required")))
        return
      }
      if (tenantState().catalog.agent(agent).isEmpty) {
        reply(ex, 404, write(openAiError(s"The model '$model' does not exist")))
        return
      }
      val question = lastUserContent(messages)
      val answer = askAgent(agent, question)
      val created = System.currentTimeMillis() / 1000
      val id = s"chatcmpl-${HttpApi.predictSeq.incrementAndGet()}"
      def tokens(s: String): Long = s.split("\\s+").count(_.nonEmpty).toLong
      val stream = body.get("stream").contains(Bool(true))
      if (!stream) {
        reply(ex, 200, write(obj(
          "id" -> str(id), "object" -> str("chat.completion"),
          "created" -> num(created), "model" -> str(model),
          "choices" -> arr(obj(
            "index" -> num(0L),
            "message" -> obj("role" -> str("assistant"), "content" -> str(answer)),
            "finish_reason" -> str("stop"))),
          "usage" -> obj(
            "prompt_tokens" -> num(tokens(question)),
            "completion_tokens" -> num(tokens(answer)),
            "total_tokens" -> num(tokens(question) + tokens(answer))))))
      } else {
        def chunk(delta: Obj, finish: Value): String =
          write(obj("id" -> str(id), "object" -> str("chat.completion.chunk"),
            "created" -> num(created), "model" -> str(model),
            "choices" -> arr(obj("index" -> num(0L), "delta" -> delta,
              "finish_reason" -> finish))))
        // deterministic chunking: the role delta, the answer split into
        // whitespace-preserving pieces, the stop delta, then [DONE]
        val pieces = answer.split("(?<= )").toSeq.filter(_.nonEmpty)
        val lines =
          Seq(chunk(obj("role" -> str("assistant")), Null)) ++
          pieces.map(p => chunk(obj("content" -> str(p)), Null)) ++
          Seq(chunk(obj(), str("stop")), "[DONE]")
        reply(ex, 200, lines.map(l => s"data: $l\n\n").mkString, "text/event-stream")
      }
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable =>
        try reply(ex, 500, write(openAiError(
          Option(e.getMessage).getOrElse(e.toString))))
        catch { case _: Throwable => }
    }

  private def openAiError(msg: String): Obj =
    obj("error" -> obj("message" -> str(msg),
      "type" -> str("invalid_request_error"), "code" -> Null))

  // ------------------------------------------------------------------
  // A2A (api/a2a/README.md protocol shape): JSON-RPC tasks/send answers
  // synchronously; tasks/sendSubscribe streams SSE chunks ending in
  // {"is_task_complete": true}. The agent comes from
  // params.message.metadata.agentName and answers through the
  // agents-as-tables SQL route.
  // ------------------------------------------------------------------

  // A2A task store (reference InMemoryTaskManager, common/server/
  // task_manager.py:84-88): tasks persist from tasks/send so tasks/get,
  // tasks/cancel, and the push-notification config routes can serve the
  // lifecycle; process-scoped like the reference's in-memory manager,
  // but BOUNDED (insertion-order eviction at 1000 entries — the
  // reference's dict grows forever, the same leak this repo capped for
  // job history): evicting a task also drops its push config
  private val a2aTasks = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Obj]() {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Obj]): Boolean = {
        val evict = size() > 1000
        if (evict) a2aPush.remove(e.getKey)
        evict
      }
    })
  private val a2aPush = new java.util.concurrent.ConcurrentHashMap[String, Value]()

  private val a2aStartNanos = System.nanoTime()

  /** The A2A agent card (api/a2a/__init__.py:33-49 assembles name/url/
    * capabilities/skills; common/server/server.py:46-47 serves it under
    * both well-known names). The static query skill is the reference's
    * `mindsdb_query`; every agent registered in the live catalog is
    * additionally advertised as its own skill, so a spec-compliant A2A
    * client can discover WHICH agents this server fronts, not just that
    * agents exist. */
  private def agentCard(ex: HttpExchange): Obj = {
    val contentTypes = arr(str("text"), str("text/plain"), str("application/json"))
    val st = tenantState()
    val agentSkills = st.catalog.listAgents().sorted.map { a =>
      obj("id" -> str(s"agent_$a"), "name" -> str(a),
        "description" -> str(s"Routes messages to agent '$a' (set message.metadata.agentName)"),
        "tags" -> arr(str("agent")),
        "inputModes" -> contentTypes, "outputModes" -> contentTypes): Value
    }
    val host = Option(ex.getRequestHeaders.getFirst("Host"))
      .getOrElse(s"127.0.0.1:$boundPort")
    obj(
      "name" -> str("Graft Agent Connector"),
      "description" -> str(
        "A2A connector that proxies requests to agents in project 'graft'."),
      "url" -> str(s"http://$host/a2a/"),
      "version" -> str("1.0.0"),
      "defaultInputModes" -> contentTypes,
      "defaultOutputModes" -> contentTypes,
      "capabilities" -> obj("streaming" -> Bool(true)),
      "skills" -> Arr(
        (obj("id" -> str("mindsdb_query"), "name" -> str("MindsDB Query"),
          "description" -> str("Executes natural-language queries via agents."),
          "tags" -> arr(str("database"), str("mindsdb"), str("query"), str("analytics")),
          "examples" -> arr(
            str("What trends exist in my sales data?"),
            str("Generate insights from the support tickets dataset.")),
          "inputModes" -> contentTypes,
          "outputModes" -> contentTypes): Value) +: agentSkills))
  }

  private def handleA2aCard(ex: HttpExchange): Unit =
    try {
      val p = ex.getRequestURI.getPath
      if (ex.getRequestMethod == "GET" &&
          (p.endsWith("/agent.json") || p.endsWith("/agent-card.json")))
        reply(ex, 200, write(agentCard(ex)))
      else crudError(ex, 404, s"unknown resource $p")
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  /** GET /a2a/status (server.py:64-80): liveness probe the UI polls. */
  private def handleA2aStatus(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "GET") {
        crudError(ex, 405, s"unsupported ${ex.getRequestMethod} /a2a/status"); return
      }
      reply(ex, 200, write(obj(
        "status" -> str("ok"), "service" -> str("mindsdb-a2a"),
        "uptime_seconds" -> num((System.nanoTime() - a2aStartNanos) / 1e9),
        "agent_name" -> str("Graft Agent Connector"),
        "version" -> str("1.0.0"))))
    } catch {
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable => crudError(ex, 400, Option(e.getMessage).getOrElse(e.toString))
    }

  private def handleA2a(ex: HttpExchange): Unit =
    try {
      val req = Json.parse(readBody(ex))
      val id = req.get("id").getOrElse(Null)
      val params = req.get("params").getOrElse(obj())
      val msg = params.get("message").getOrElse(obj())
      val agent = msg.get("metadata")
        .flatMap(md => md.get("agentName").orElse(md.get("agent_name")))
        .collect { case Str(s) => s }
      val text = msg.get("parts").map(_.asArray).getOrElse(Seq.empty)
        .flatMap(_.get("text")).collectFirst { case Str(t) => t }
      def rpc(result: Value): String =
        write(obj("jsonrpc" -> str("2.0"), "id" -> id, "result" -> result))
      req.get("method").collect { case Str(m) => m } match {
        case Some(m) if m == "tasks/send" || m == "tasks/sendSubscribe" =>
          if (agent.isEmpty || text.isEmpty) {
            reply(ex, 200, write(obj("jsonrpc" -> str("2.0"), "id" -> id,
              "error" -> obj("code" -> num(-32602L), "message" ->
                str("message.metadata.agentName and a text part are required")))))
          } else {
            val answer = askAgent(agent.get, text.get)
            // persist the completed task (upsert_task + update_store):
            // history holds the inbound message, artifacts the answer
            val taskId = params.get("id").collect { case Str(s) => s }
              .getOrElse(java.util.UUID.randomUUID().toString)
            a2aTasks.put(taskId, obj(
              "id" -> str(taskId),
              "sessionId" -> params.get("sessionId").getOrElse(Null),
              "status" -> obj("state" -> str("completed")),
              "artifacts" -> arr(obj("parts" -> arr(obj(
                "type" -> str("text"), "text" -> str(answer))))),
              "history" -> arr(msg)))
            if (m == "tasks/send") {
              // the result echoes the STORED task id (a generated id
              // must reach the caller or the stored task is orphaned)
              reply(ex, 200, rpc(obj(
                "id" -> str(taskId),
                "status" -> obj("state" -> str("completed")),
                "artifacts" -> arr(obj("parts" -> arr(obj(
                  "type" -> str("text"), "text" -> str(answer))))))))
            } else {
              val lines = Seq(
                write(obj("is_task_complete" -> Bool(false),
                  "content" -> str("working"), "metadata" -> obj())),
                write(obj("is_task_complete" -> Bool(true),
                  "content" -> str(answer), "metadata" -> obj())))
              reply(ex, 200, lines.map(l => s"data: $l\n\n").mkString,
                "text/event-stream")
            }
          }
        // message/stream (task_manager.py:531-570): one SSE event — a
        // SendStreamingMessageSuccessResponse carrying the FINAL
        // TaskStatusUpdateEvent whose status.message is the completed
        // agent answer, with the reference's exact id spellings
        case Some("message/stream") =>
          if (agent.isEmpty || text.isEmpty) {
            reply(ex, 200, rpcError(id, -32602,
              "message.metadata.agentName and a text part are required"))
          } else {
            val answer = askAgent(agent.get, text.get)
            val sessionId = params.get("sessionId")
              .collect { case Str(s) => s }.getOrElse("default")
            val reqId = id match {
              case Str(s) => s; case Num(_, raw) => raw; case _ => "0"
            }
            val taskId = s"msg_stream_${sessionId}_$reqId"
            // streaming sends upsert their task too (task_manager.py
            // upsert_task runs for every send variant) — the advertised
            // taskId must answer tasks/get afterwards
            a2aTasks.put(taskId, obj(
              "id" -> str(taskId),
              "sessionId" -> str(sessionId),
              "status" -> obj("state" -> str("completed")),
              "artifacts" -> arr(obj("parts" -> arr(obj(
                "type" -> str("text"), "text" -> str(answer))))),
              "history" -> arr(msg)))
            val event = obj(
              "id" -> str(taskId), "taskId" -> str(taskId),
              "contextId" -> str(s"ctx_$sessionId"),
              "final" -> Bool(true),
              "metadata" -> obj("message_stream" -> Bool(true)),
              "status" -> obj("state" -> str("completed"),
                "message" -> obj("role" -> str("agent"),
                  "messageId" -> str(s"msg_$reqId"),
                  "parts" -> arr(obj("type" -> str("text"), "text" -> str(answer))),
                  "metadata" -> obj())))
            reply(ex, 200, s"data: ${rpc(event)}\n\n", "text/event-stream")
          }
        // ---- task lifecycle (task_manager.py:43-67, 94-105) ----
        case Some("tasks/get") =>
          val tid = params.get("id").collect { case Str(s) => s }
          tid.flatMap(t => Option(a2aTasks.get(t))) match {
            case None => reply(ex, 200, rpcError(id, -32001, "Task not found"))
            case Some(task) =>
              // append_task_history: last historyLength messages, or []
              // when absent/non-positive (task_manager.py:234-240)
              val hist = task.get("history").map(_.asArray).getOrElse(Seq.empty)
              val hl = params.get("historyLength").collect { case Num(n, _) => n.toInt }
              val trimmed = hl.filter(_ > 0).map(hist.takeRight).getOrElse(Seq.empty)
              reply(ex, 200, rpc(Obj(task.fields + ("history" -> Arr(trimmed)))))
          }
        case Some("tasks/cancel") =>
          val tid = params.get("id").collect { case Str(s) => s }
          tid.flatMap(t => Option(a2aTasks.get(t))) match {
            case None => reply(ex, 200, rpcError(id, -32001, "Task not found"))
            // completed synchronous tasks are never cancelable — the
            // reference's InMemoryTaskManager answers the same for every
            // stored task (task_manager.py:104-112)
            case Some(_) =>
              reply(ex, 200, rpcError(id, -32002, "Task cannot be canceled"))
          }
        case Some("tasks/pushNotification/set") =>
          val tid = params.get("id").collect { case Str(s) => s }
          val cfg = params.get("pushNotificationConfig")
          if (tid.exists(a2aTasks.containsKey) && cfg.isDefined) {
            a2aPush.put(tid.get, cfg.get)
            reply(ex, 200, rpc(obj("id" -> str(tid.get),
              "pushNotificationConfig" -> cfg.get)))
          } else reply(ex, 200, rpcError(id, -32603,
            "An error occurred while setting push notification info"))
        case Some("tasks/pushNotification/get") =>
          val tid = params.get("id").collect { case Str(s) => s }
          tid.flatMap(t => Option(a2aPush.get(t))) match {
            case Some(cfg) => reply(ex, 200, rpc(obj("id" -> str(tid.get),
              "pushNotificationConfig" -> cfg)))
            case None => reply(ex, 200, rpcError(id, -32603,
              "An error occurred while getting push notification info"))
          }
        case Some("tasks/resubscribe") =>
          reply(ex, 200, rpcError(id, -32004, "This operation is not supported"))
        case other =>
          reply(ex, 200, write(obj("jsonrpc" -> str("2.0"), "id" -> id,
            "error" -> obj("code" -> num(-32601L),
              "message" -> str(s"method not found: ${other.getOrElse("?")}")))))
      }
    } catch {
      case e: Throwable =>
        try crudError(ex, 500, Option(e.getMessage).getOrElse(e.toString))
        catch { case _: Throwable => }
    }

  /** JSON-RPC error envelope (common/types.py error classes). */
  private def rpcError(id: Value, code: Long, message: String): String =
    write(obj("jsonrpc" -> str("2.0"), "id" -> id,
      "error" -> obj("code" -> num(code), "message" -> str(message))))

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

package graft.sqlx

import graft.catalog.{Catalog, Warehouse}
import graft.incremental.Jobs
import graft.ml.LinearModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Statement router for the MindsDB-style DDL surface (SURVEY §2.13;
  * reference `ExecuteCommands.execute_command` dispatch,
  * command_executor.py:245 — CREATE/DROP VIEW :1350-1425, CREATE MODEL
  * :1532, CREATE JOB :750, CREATE KNOWLEDGE BASE :1427, SHOW :1577-1953,
  * DESCRIBE :882).
  *
  * Standard SQL routes untouched to `spark.sql` (Catalyst owns the
  * relational dialect — the reference delegates the same way to DuckDB);
  * only the engine-object DDL needs this small dispatcher. Statements
  * are recognized by anchored regexes, mirroring the reference's
  * statement-class dispatch table.
  */
final class Commands(
    val spark: SparkSession,
    val catalog: Catalog,
    val warehouse: Warehouse,
    val jobs: Jobs = new Jobs) {

  private val CreateView =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+)""".r
  private val DropView = """(?is)\s*DROP\s+VIEW\s+(\w+)\s*""".r
  private val CreateModel =
    """(?is)\s*CREATE\s+MODEL\s+(\w+)\s+PREDICT\s+(\w+)\s+USING\s+features\s*=\s*'([^']+)'\s*,\s*weights\s*=\s*'([^']+)'\s*,\s*bias\s*=\s*([-\d.]+)\s*""".r
  private val CreateJob =
    """(?is)\s*CREATE\s+JOB\s+(\w+)\s+AS\s*\(\s*(.+?)\s*\)\s+EVERY\s+(.+?)\s*""".r
  private val DropJob = """(?is)\s*DROP\s+JOB\s+(\w+)\s*""".r
  private val ShowStmt = """(?is)\s*SHOW\s+(TABLES|VIEWS|MODELS|JOBS)\s*""".r
  private val ExplainStmt = """(?is)\s*EXPLAIN\s+(.+)""".r
  private val SetStmt = """(?is)\s*SET\s+([\w.]+)\s*=\s*(.+?)\s*""".r
  private val UseStmt = """(?is)\s*USE\s+(\w+)\s*""".r
  private val DescribeStmt = """(?is)\s*DESCRIBE\s+(\w+)\s*""".r
  private val DropTable = """(?is)\s*DROP\s+TABLE\s+(\w+)\s*""".r
  private val Ctas = """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(\w+)\s+AS\s+(.+)""".r

  /** Execute one statement; DDL returns a status frame, queries return
    * their result. */
  def execute(sql: String): DataFrame = sql match {
    case CreateView(name, body) =>
      // resolve the body ONCE, against the namespace as it stands now —
      // a self-referential `CREATE VIEW t AS ... FROM t` therefore reads
      // the base table (and can't recurse). Execution stays lazy: only
      // the plan is captured.
      val df = run(body)
      catalog.createView(name, df)
      ok(s"view $name created")
    case DropView(name) =>
      catalog.dropView(name); ok(s"view $name dropped")
    case CreateModel(name, target, feats, weights, bias) =>
      catalog.createModel(LinearModel(name,
        feats.split(",").map(_.trim).toSeq,
        weights.split(",").map(_.trim.toDouble).toSeq,
        bias.toDouble, scoreCol = target))
      ok(s"model $name created")
    case CreateJob(name, body, schedule) =>
      jobs.create(Jobs.Job(name, s"every $schedule", () => { run(body).count(); () }))
      ok(s"job $name created")
    case DropJob(name) =>
      jobs.drop(name); ok(s"job $name dropped")
    case Ctas(_, name, body) =>
      warehouse.createTableAs(name, run(body), overwrite = true)
      ok(s"table $name created")
    case DropTable(name) =>
      warehouse.dropTable(name); ok(s"table $name dropped")
    case ShowStmt(what) => what.toUpperCase match {
      case "TABLES" => catalog.showTables(Some(warehouse))
      case "VIEWS" => list("view_name", catalog.listViews())
      case "MODELS" => list("model_name", catalog.listModels())
      case "JOBS" => list("job_name", jobs.list().map(_.name))
    }
    case DescribeStmt(name) => catalog.describe(name)
    case ExplainStmt(body) =>
      // EXPLAIN (command_executor.py EXPLAIN dispatch): the optimized +
      // physical plan as a one-row frame
      val qe = run(body).queryExecution
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(qe.optimizedPlan.toString,
          qe.executedPlan.toString)), 1),
        StructType(Seq(StructField("optimized_plan", StringType),
          StructField("physical_plan", StringType))))
    case SetStmt(key, value) =>
      // SET (no-op pass-through to session conf, like the reference's
      // server-variable handling)
      spark.conf.set(key, value.stripPrefix("'").stripSuffix("'"))
      ok(s"set $key")
    case UseStmt(db) =>
      // USE: single-namespace engine — accepted for wire compatibility
      ok(s"using $db")
    case other => run(other)
  }

  /** Multi-statement script execution (jobs hold SQL scripts,
    * jobs_controller.py; split on top-level semicolons, quote-aware).
    * Returns the last statement's result. */
  def executeScript(script: String): DataFrame = {
    val stmts = splitStatements(script)
    require(stmts.nonEmpty, "empty script")
    stmts.map(execute).last
  }

  /** Split on semicolons outside single/double quotes. */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Option[Char] = None
    script.foreach { c =>
      quote match {
        case Some(q) =>
          cur.append(c)
          if (c == q) quote = None
        case None => c match {
          case '\'' | '"' => quote = Some(c); cur.append(c)
          case ';' =>
            if (cur.toString.trim.nonEmpty) out += cur.toString.trim
            cur.clear()
          case _ => cur.append(c)
        }
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  /** Parameterized execution — the prepared-statement surface
    * (reference PreparedStatementPlanner, planner/query_prepare.py):
    * named `:param` markers bind server-side, no string splicing. */
  def execute(sql: String, params: Map[String, Any]): DataFrame = {
    registerRelations()
    spark.sql(sql, params)
  }

  /** Run a SELECT with catalog resolution: every known relation
    * (base table, warehouse table, view) is registered as a temp view
    * first, so views shadow tables exactly as in [[Catalog.resolve]]. */
  private def run(sql: String): DataFrame = {
    registerRelations()
    spark.sql(sql)
  }

  private def registerRelations(): Unit = {
    graft.engine.Tables.names.foreach { n =>
      catalog.resolve(n, Some(warehouse)).createOrReplaceTempView(n)
    }
    warehouse.listTables().foreach { n =>
      catalog.resolve(n, Some(warehouse)).createOrReplaceTempView(n)
    }
    catalog.listViews().foreach { n =>
      catalog.resolve(n, Some(warehouse)).createOrReplaceTempView(n)
    }
  }

  private def ok(msg: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("ok", msg)), 1),
      StructType(Seq(StructField("status", StringType), StructField("message", StringType))))

  private def list(colName: String, names: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(names.map(Row(_)), 1),
      StructType(Seq(StructField(colName, StringType))))
}

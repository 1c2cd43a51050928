package graft.sqlx

import graft.catalog.{Catalog, Warehouse}
import graft.incremental.Jobs
import graft.kb.Kb
import graft.ml.{Fit, LinearModel}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Statement router for the MindsDB-style DDL surface (SURVEY §2.13;
  * reference `ExecuteCommands.execute_command` dispatch,
  * command_executor.py:245 — CREATE DATABASE :1260, CREATE/DROP VIEW
  * :1350-1425, CREATE KNOWLEDGE BASE :1427, DROP KB :1472, AGENTS
  * :1484-1514, TRIGGERS :666-741, CREATE MODEL :1532, RETRAIN :1042,
  * FINETUNE :1078, DROP MODEL :1963, EVALUATE KB :975, SHOW :1577-1953,
  * DESCRIBE :882).
  *
  * Standard SQL routes untouched to `spark.sql` (Catalyst owns the
  * relational dialect — the reference delegates the same way to DuckDB);
  * only the engine-object DDL needs this dispatcher. Statements are
  * recognized by anchored regexes, mirroring the reference's
  * statement-class dispatch table. Every engine behind a route already
  * exists as a Scala API (Kb, Fit, Jobs, Triggers, Agents, MemCatalog) —
  * this layer is the user-facing SQL spelling.
  */
object Commands {
  /** Every relation name any session has registered as a temp view.
    * Temp views are SparkSession-global while catalogs/warehouses are
    * per-session (and per-tenant), so before a statement resolves, names
    * managed by OTHER sessions but absent from this one must be dropped
    * — otherwise tenant A's warehouse table lingers as a resolvable view
    * inside tenant B (cross-tenant leak). */
  private[sqlx] val managedRelations =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Shared ML task-queue runtimes, one per transport mode
    * (ml_exec_base.py:73 builds ONE producer per executor process;
    * consumers are JVM-wide here too). */
  private val queueRuntimes =
    scala.collection.concurrent.TrieMap.empty[String, graft.ml.TaskQueue.Runtime]
  private[graft] def queueRuntime(mode: String): graft.ml.TaskQueue.Runtime =
    queueRuntimes.getOrElseUpdate(mode, mode match {
      case "memory" =>
        new graft.ml.TaskQueue.Runtime(new graft.ml.TaskQueue.InMemoryTransport)
      case "spool" =>
        new graft.ml.TaskQueue.Runtime(new graft.ml.TaskQueue.SpoolTransport(
          java.nio.file.Files.createTempDirectory("graft_mlq").toString))
      case other => throw new IllegalArgumentException(
        s"ml_task_queue must be 'memory', 'spool', or 'off' (got '$other')")
    })

  /** Serializes register-relations + analysis: the temp-view namespace
    * is shared across sessions, so the registration of THIS statement's
    * world and its (eager, ms-scale) analysis form one atomic window —
    * without it, a concurrent session's registration of a same-named
    * relation could swap the view mid-resolve. Execution is unaffected:
    * the analyzed plan is already bound to its files. */
  private[sqlx] val analysisLock = new Object

  /** Top-level split on `sep`, respecting quotes and (){}[] nesting —
    * the one dict/list tokenizer shared by the SQL router and the
    * catalog's model-param parser (a naive split(",") corrupts values
    * containing commas, e.g. model_name = 'a,b'). */
  private[graft] def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Option[Char] = None
    var depth = 0
    s.foreach { c =>
      quote match {
        case Some(q) =>
          cur.append(c)
          if (c == q) quote = None
        case None => c match {
          case '\'' | '"' => quote = Some(c); cur.append(c)
          case '(' | '{' | '[' => depth += 1; cur.append(c)
          case ')' | '}' | ']' => depth = math.max(0, depth - 1); cur.append(c)
          case `sep` if depth == 0 =>
            if (cur.toString.trim.nonEmpty) out += cur.toString.trim
            cur.clear()
          case _ => cur.append(c)
        }
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }
}

final class Commands(
    val spark: SparkSession,
    val catalog: Catalog,
    val warehouse: Warehouse,
    val jobs: Jobs = new Jobs) {

  // `information_schema.<table>` resolves through a live DSv2 catalog
  // bound to this session's catalog/warehouse/jobs state; the returned
  // maps re-assert the binding at every execute (tenant sessions may
  // interleave on one thread — see InfoSchema.setLocal)
  private val infoBinding =
    graft.catalog.InfoSchema.bind(spark, catalog, warehouse, Some(jobs))
  // `mindsdb.<table>` — the project meta-tables (models, databases,
  // ml_engines, jobs, …, queries) as SELECT-able relations that
  // JOIN/WHERE through Spark's multi-catalog path
  // (datahub/datanodes/mindsdb_tables.py:42-430)
  private val mindsdbBinding = graft.catalog.MindsdbTables.bind(spark, catalog, jobs,
    () => queriesFrame(), () => mvs.list())
  // cosine_sim / dot_product / vec_l2 in spark.sql — the targets of the
  // pgvector operator rewrite (idempotent temp-function registration)
  graft.functions.VectorFunctions.register(spark)
  // CBO staleness guard: every warehouse write refreshes that table's
  // planner statistics to the exact parquet-footer row count (column
  // stats drop until re-ANALYZE) — Catalog.refreshCboStatsAfterWrite
  warehouse.addMutationListener("cbo-stats") { n =>
    catalog.refreshCboStatsAfterWrite(n,
      if (warehouse.exists(n)) warehouse.rowCount(n) else 0L)
  }

  private val CreateView =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+)""".r
  private val CreateMv =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+TRACK\s+([\w.]+)\s+AS\s+(.+)""".r
  private val RefreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*""".r
  private val DropMv =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val DropView = """(?is)\s*DROP\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val CreateTsModel =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MODEL\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s+FROM\s+\((.+)\)\s+PREDICT\s+(\w+)\s+ORDER\s+BY\s+([\w.]+)\s+(?:GROUP\s+BY\s+([\w.]+)\s+)?WINDOW\s+(\d+)\s+HORIZON\s+(\d+)\s*(?:USING\s+(.+?))?\s*""".r
  private val CreateModelFit =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MODEL\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s+FROM\s+\((.+)\)\s+PREDICT\s+(\w+)\s+USING\s+(.+?)\s*""".r
  private val CreateModel =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MODEL\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s+PREDICT\s+(\w+)\s+USING\s+features\s*=\s*'([^']+)'\s*,\s*weights\s*=\s*'([^']+)'\s*,\s*bias\s*=\s*([-\d.]+)\s*""".r
  private val RetrainStmt = """(?is)\s*RETRAIN\s+(?:MODEL\s+)?(\w+)\s*""".r
  private val FinetuneStmt =
    """(?is)\s*FINETUNE\s+(?:MODEL\s+)?(\w+)\s+FROM\s+\((.+)\)\s*""".r
  private val DropModel = """(?is)\s*DROP\s+MODEL\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r
  private val CreateJob =
    """(?is)\s*CREATE\s+JOB\s+(\w+)\s+AS\s*\(\s*(.+?)\s*\)\s+EVERY\s+([\w ]+?)(?:\s+START\s+'([^']+)')?(?:\s+END\s+'([^']+)')?(?:\s+IF\s*\(\s*(.+?)\s*\))?\s*""".r
  private val DropJob = """(?is)\s*DROP\s+JOB\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val CreateKb =
    """(?is)\s*CREATE\s+KNOWLEDGE\s+BASE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*(?:USING\s+(.+?))?\s*""".r
  private val DropKb =
    """(?is)\s*DROP\s+KNOWLEDGE\s+BASE\s+(IF\s+EXISTS\s+)?(\w+)\s*""".r
  private val EvaluateKb =
    """(?is)\s*EVALUATE\s+KNOWLEDGE[_ ]BASE\s+(\w+)\s+USING\s+(.+?)\s*""".r
  private val EvaluateMetric =
    """(?is)\s*EVALUATE\s+(\w+)\s+FROM\s*\((.+)\)\s*(?:USING\s+(.+?))?\s*""".r
  private val CreateFunction =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?FUNCTION\s+(\w+)\s*\(([^)]*)\)\s+RETURNS\s+([\w()<>, ]+?)\s+RETURN\s+(.+?)\s*""".r
  private val DropFunction =
    """(?is)\s*DROP\s+(?:TEMPORARY\s+)?FUNCTION\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val CreateAgent =
    """(?is)\s*CREATE\s+AGENT\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+USING\s+(.+?)\s*""".r
  // UPDATE AGENT and ALTER AGENT are the same verb (the reference accepts
  // both spellings; test_agent_new_syntax uses ALTER)
  private val UpdateAgent =
    """(?is)\s*(?:UPDATE|ALTER)\s+AGENT\s+(\w+)\s+USING\s+(.+?)\s*""".r
  private val DropAgent = """(?is)\s*DROP\s+AGENT\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val CreateSkill =
    """(?is)\s*CREATE\s+SKILL\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+USING\s+(.+?)\s*""".r
  private val UpdateSkill = """(?is)\s*UPDATE\s+SKILL\s+(\w+)\s+SET\s+(.+?)\s*""".r
  private val DropSkill = """(?is)\s*DROP\s+SKILL\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val CreateTrigger =
    """(?is)\s*CREATE\s+TRIGGER\s+(\w+)\s+ON\s+([\w.]+)\s*\(\s*(.+)\s*\)\s*""".r
  private val DropTrigger = """(?is)\s*DROP\s+TRIGGER\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val CreateDatabase =
    """(?is)\s*CREATE\s+DATABASE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+(?:WITH\s+)?ENGINE\s*=?\s*'([^']+)'\s*(?:,\s*PARAMETERS\s*=\s*(.+))?\s*""".r
  private val DropDatabase = """(?is)\s*DROP\s+DATABASE\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*""".r
  private val CreateProject =
    """(?is)\s*CREATE\s+PROJECT\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*""".r
  private val DropProject = """(?is)\s*DROP\s+PROJECT\s+(\w+)\s*""".r
  private val InsertStmt =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([\w\s,]+)\))?\s*(\(?\s*(?:SELECT|VALUES|WITH).+)""".r
  private val InsertOverwriteStmt =
    """(?is)\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?(\w+)\s+(\(?\s*(?:SELECT|VALUES|WITH).+)""".r
  // the MySQL service-request surface (integration flow test_mysql_api
  // test_service_requests): SESSION/GLOBAL modifiers, SCHEMAS as an
  // alias for DATABASES, [FULL] TABLES FROM|IN <db>, FUNCTION/PROCEDURE
  // STATUS, and a WHERE tail filtering the meta frame (show models where
  // name = '...')
  private val ShowStmt =
    """(?is)\s*SHOW\s+(?:FULL\s+)?(?:SESSION\s+|GLOBAL\s+)?(TABLES|VIEWS|MODELS|JOBS|DATABASES|SCHEMAS|PROJECTS|KNOWLEDGE[_ ]BASES|AGENTS|SKILLS|TRIGGERS|CHATBOTS|ML[_ ]ENGINES|HANDLERS|VARIABLES|TABLE\s+STATUS|FUNCTION\s+STATUS|PROCEDURE\s+STATUS|STATUS|ENGINES|CHARACTER\s+SET|CHARSET|COLLATION|WARNINGS|MATERIALIZED\s+VIEWS|PROCESSLIST)\s*(?:(?:FROM|IN)\s+(\w+))?\s*(?:LIKE\s+'([^']*)')?\s*(?:WHERE\s+(.+?))?\s*""".r
  private val ShowColumns =
    """(?is)\s*SHOW\s+(?:FULL\s+)?COLUMNS\s+FROM\s+(\w+)\s*""".r
  private val ShowCreate = """(?is)\s*SHOW\s+CREATE\s+TABLE\s+(\w+)\s*""".r
  private val ShowKeys =
    """(?is)\s*SHOW\s+(?:KEYS|INDEX|INDEXES)\s+(?:FROM|IN)\s+`?(?:\w+`?\.`?)?(\w+)`?\s*""".r
  private val AnalyzeStmt =
    """(?is)\s*ANALYZE\s+TABLE\s+([\w.]+)(?:\s+COMPUTE\s+STATISTICS)?\s*""".r
  private val ExplainStmt = """(?is)\s*EXPLAIN\s+(.+)""".r
  private val SetStmt = """(?is)\s*SET\s+(?:SESSION\s+)?(@?@?)([\w.]+)\s*=\s*(.+?)\s*""".r
  private val SetNames =
    """(?is)\s*SET\s+NAMES\s+'?(\w+)'?(?:\s+COLLATE\s+'?\w+'?)?\s*""".r
  // any SET with a body; the match arm's guard requires >1 comma-split
  // assignment, so single SETs (incl. SET ACTIVE) fall through
  private val SetMulti = """(?is)\s*SET\s+(.+?)\s*""".r
  // `SELECT … FROM <db> (<native sql>) [alias] [clauses]` — the
  // reference's raw-SQL-in-FROM passthrough (planner FetchDataframeStep
  // over a native query; tests test_subselect_1row_aggregate). The lazy
  // inner + anchored tail finds the true closing paren even when the
  // native statement nests parens; only registered databases match (the
  // arm's guard), so `FROM range(10)` still reaches Catalyst.
  private val NativeFromQuery =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(\w+)\s*\(\s*(.+?)\s*\)\s*(?:(?:AS\s+)?(\w+)\s*)?((?:WHERE|GROUP|ORDER|LIMIT|HAVING)\b.*)?""".r
  private val UseStmt = """(?is)\s*USE\s+(\w+)\s*""".r
  // MODEL keyword optional and a project qualifier accepted: the MySQL
  // flow issues `describe mindsdb.<predictor>.<attr>` (test_mysql_api
  // test_describe_predictor_attrs); non-model names fall through to the
  // plain DESCRIBE route via the match guard
  private val DescribeModel =
    """(?is)\s*DESCRIBE\s+(?:MODEL\s+)?(?:MINDSDB\.|GRAFT\.)?(\w+)(?:\.(\d+))?(?:\.(\w+))?\s*""".r
  private val DescribeHistory = """(?is)\s*DESCRIBE\s+HISTORY\s+(\w+)\s*""".r
  private val OptimizeStmt =
    """(?is)\s*OPTIMIZE\s+(?:TABLE\s+)?(\w+)\s*(?:INTO\s+(\d+)\s+FILES?)?\s*""".r
  private val OptimizeZorderStmt =
    """(?is)\s*OPTIMIZE\s+(?:TABLE\s+)?(\w+)\s+ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\)\s*(?:INTO\s+(\d+)\s+FILES?)?\s*""".r
  private val VacuumStmt =
    """(?is)\s*VACUUM\s+(\w+)\s*(?:RETAIN\s+(\d+)\s+VERSIONS?)?\s*""".r
  private val DescribeKb =
    """(?is)\s*DESCRIBE\s+KNOWLEDGE[_ ]BASE\s+(\w+)\s*""".r
  private val DescribeAgent = """(?is)\s*DESCRIBE\s+AGENT\s+(\w+)\s*""".r
  private val DescribeDatabase = """(?is)\s*DESCRIBE\s+DATABASE\s+(\w+)\s*""".r
  private val DescribeStmt = """(?is)\s*DESCRIBE\s+(\w+)\s*""".r
  private val DropTable = """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r
  private val ExportStmt =
    """(?is)\s*EXPORT\s+(?:TABLE\s+(\w+)|\((.+)\))\s+TO\s+'([^']+)'(?:\s+FORMAT\s+(\w+))?(?:\s+SHARD\s+ROWS\s+(\d+))?\s*""".r
  private val UpdateStmt =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*""".r
  private val UpdateNoWhere =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s*""".r
  private val UpdateFromStmt =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+FROM\s+\((.+)\)\s+(?:AS\s+)?(\w+)\s+WHERE\s+(.+?)\s*""".r
  private val MergeStmt =
    """(?is)\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+(?:(\w+)|\((.+)\))(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.+?)\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.+?)\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*(WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE\s*)?""".r
  private val DeleteStmt =
    """(?is)\s*DELETE\s+FROM\s+(\w+)\s*(?:WHERE\s+(.+?))?\s*""".r
  private val CloneStmt =
    """(?is)\s*CREATE\s+TABLE\s+(\w+)\s+(?:SHALLOW\s+)?CLONE\s+(\w+)\s*""".r
  private val CtasBucketed =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(\w+)\s+CLUSTERED\s+BY\s*\(\s*(\w+)\s*\)\s+INTO\s+(\d+)\s+BUCKETS\s+AS\s+(.+)""".r
  private val Ctas =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(\w+)\s+(?:PARTITIONED\s+BY\s*\(\s*([\w\s,]+?)\s*\)\s+)?AS\s+(.+)""".r
  private val CreateTableCols =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\(\s*(.+)\s*\)\s*""".r
  private val CreateTableLike =
    """(?is)\s*CREATE\s+TABLE\s+(\w+)\s+LIKE\s+(\w+)\s*""".r
  private val ShowPartitions =
    """(?is)\s*SHOW\s+PARTITIONS\s+(\w+)\s*""".r
  private val CopyInto =
    """(?is)\s*COPY\s+INTO\s+(\w+)\s+FROM\s+'([^']+)'\s*""".r
  private val TruncateStmt =
    """(?is)\s*TRUNCATE\s+TABLE\s+(\w+)\s*""".r
  private val KillStmt = """(?is)\s*KILL\s+(?:QUERY\s+)?(\d+)\s*""".r
  private val LogHistoryQuery =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+log\.jobs_history\b\s*(.*)""".r
  private val LogQueriesQuery =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+log\.queries\b\s*(.*)""".r
  private val LastQuery =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(\w+)\s+WHERE\s+([\w.]+)\s*>\s*LAST\b\s*(.*)""".r
  private val LastCoalesceQuery =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(\w+)\s+WHERE\s+([\w.]+)\s*>\s*COALESCE\s*\(\s*LAST\s*,\s*(.+?)\s*\)\s*(.*)""".r
  private val KbQuery =
    """(?is)\s*SELECT\s+\*\s+FROM\s+(\w+)\s+WHERE\s+(.+?)(?:\s+LIMIT\s+(\d+))?\s*""".r
  private val ModelJoin =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(?:(\w+)|\((.+)\))(?:\s+(?:AS\s+)?(\w+))?\s+JOIN\s+(\w+)(?:\.(\d+))?(?:\s+(?:AS\s+)?(\w+))?(?:\s+ON\s+(.+?))?(?:\s+USING\s+partition_size\s*=\s*(\d+))?\s*((?:WHERE|GROUP|ORDER|LIMIT).*)?""".r
  private val AsofJoinStmt =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(\w+)(?:\s+(?:AS\s+)?(?!ASOF\b)(\w+))?\s+ASOF\s+(?:LEFT\s+)?JOIN\s+(\w+)(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.+?)\s*((?:WHERE|GROUP|ORDER|LIMIT).*)?""".r
  private val AsofCond = """(?is)\s*([\w.]+)\s*(=|>=|<=)\s*([\w.]+)\s*""".r
  private val ObjQuery =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*""".r
  private val SysVarQuery =
    """(?is)\s*SELECT\s+(@@[\w.]+(?:\s+AS\s+\w+)?(?:\s*,\s*@@[\w.]+(?:\s+AS\s+\w+)?)*)\s*(?:LIMIT\s+\d+\s*)?""".r
  private val UserVarQuery =
    """(?is)\s*SELECT\s+(@[\w.]+(?:\s+AS\s+\w+)?(?:\s*,\s*@[\w.]+(?:\s+AS\s+\w+)?)*)\s*(?:LIMIT\s+\d+\s*)?""".r
  private val TxnStmt =
    """(?is)\s*(START\s+TRANSACTION|BEGIN|COMMIT|ROLLBACK)\s*""".r
  private val AlterView =
    """(?is)\s*ALTER\s+VIEW\s+(\w+)\s+AS\s+(.+)""".r
  private val AlterAddCol =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*(?:DEFAULT\s+(.+?))?\s*""".r
  private val AlterRenameCol =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val AlterDropCol =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*""".r
  private val AlterDatabase =
    """(?is)\s*ALTER\s+DATABASE\s+(\w+)\s+(?:PARAMETERS\s*=\s*|USING\s+|SET\s+)?(.+?)\s*""".r
  private val AlterKb =
    """(?is)\s*ALTER\s+KNOWLEDGE[_ ]BASE\s+(\w+)\s+USING\s+(.+?)\s*""".r
  private val CreateChatbot =
    """(?is)\s*CREATE\s+CHATBOT\s+(\w+)\s+USING\s+(.+?)\s*""".r
  private val UpdateChatbot =
    """(?is)\s*UPDATE\s+CHATBOT\s+(\w+)\s+SET\s+(.+?)\s*""".r
  private val DropChatbot = """(?is)\s*DROP\s+CHATBOT\s+(\w+)\s*""".r
  private val AskChatbot =
    """(?is)\s*ASK\s+(\w+)\s+'([^']*)'(?:\s+SESSION\s+'([^']*)')?\s*""".r
  private val LogChatHistoryQuery =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+log\.chatbot_history\b\s*(.*)""".r
  private val CreateMlEngine =
    """(?is)\s*CREATE\s+ML_ENGINE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+FROM\s+(\w+)\s*(?:USING\s+(.+?))?\s*""".r
  private val DropMlEngine = """(?is)\s*DROP\s+ML_ENGINE\s+(\w+)\s*""".r
  private val SetActive =
    """(?is)\s*SET\s+ACTIVE\s+(\w+)\.(\d+)\s*""".r
  private val CreateKbIndex =
    """(?is)\s*CREATE\s+INDEX\s+ON\s+KNOWLEDGE[_ ]BASE\s+(\w+)\s*(?:WITH\s*\(\s*(.+?)\s*\))?\s*""".r
  private val PrepareStmt = """(?is)\s*PREPARE\s+(\w+)\s+FROM\s+'(.+)'\s*""".r
  private val ExecuteStmt = """(?is)\s*EXECUTE\s+(\w+)\s*(?:USING\s+(.+?))?\s*""".r
  private val DeallocateStmt =
    """(?is)\s*DEALLOCATE\s+(?:PREPARE\s+)?(\w+)\s*""".r

  /** user variables: `SET @x = …` / `SELECT @x`
    * (interfaces/variables/variables_controller.py) */
  private val userVars = scala.collection.mutable.LinkedHashMap[String, String]()

  /** split a SET body on commas OUTSIDE single quotes: each part is one
    * `[SESSION] [@[@]]name = value` assignment; an assignment whose value
    * quotes a comma (`SET @a = 'x,y'`) stays whole. */
  private def splitAssignments(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ',' if !inQuote => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(p => p.nonEmpty && p.contains("="))
  }

  /** `LAST` watermark store for incremental SQL, persisted beside the
    * warehouse (same `.state` area as trigger checkpoints) so job
    * restarts resume where they left off. */
  private lazy val watermarks =
    new graft.incremental.Watermarks(s"${warehouse.dir}/.state/watermarks")

  /** incrementally-maintained materialized views, stored beside the
    * warehouse in the same `.state` area as watermarks/checkpoints. */
  private lazy val mvs = new graft.incremental.MaterializedViews(
    spark, s"${warehouse.dir}/.state/mv", run)

  /** prepared-statement store (planner/query_prepare.py lifecycle:
    * prepare → execute-with-params → deallocate). Binding is server-side
    * positional `?` markers through Spark's parameterized sql — no
    * string splicing. */
  private val prepared = scala.collection.mutable.LinkedHashMap[String, String]()

  /** session variables surfaced by SHOW VARIABLES (the reference answers
    * these from its mysql-proxy server-variable table). SET overlays. */
  private val vars = scala.collection.mutable.LinkedHashMap[String, String](
    "autocommit" -> "1",
    "character_set_client" -> "utf8mb4",
    "character_set_connection" -> "utf8mb4",
    "character_set_results" -> "utf8mb4",
    "max_allowed_packet" -> "16777216",
    "sql_mode" -> "ONLY_FULL_GROUP_BY,STRICT_TRANS_TABLES,NO_ZERO_IN_DATE,NO_ZERO_DATE,ERROR_FOR_DIVISION_BY_ZERO,NO_ENGINE_SUBSTITUTION",
    "auto_increment_increment" -> "1",
    "version" -> "8.0.17-graft",
    "version_comment" -> "graft spark-native engine")

  /** `SET ml_task_queue = 'memory'|'spool'` — the reference's executor
    * swap (ml_exec_base.py:73: process_cache → MLTaskProducer when the
    * queue is configured). Training then routes: producer enqueues a
    * learn task carrying the full descriptor (fetch_data_query + USING
    * params), a consumer claims and executes it with a PROCESSING
    * heartbeat, and this caller blocks on the Future-like Task — same
    * synchronous CREATE MODEL semantics, queue-mediated execution. */
  private def runTrainer(name: String, trainSql: String,
      using: Map[String, String],
      trainer: () => (graft.ml.Model, Option[Fit.Stats]))
      : (graft.ml.Model, Option[Fit.Stats]) =
    vars.getOrElse("ml_task_queue", "off") match {
      case "off" => trainer()
      case mode =>
        val box = new java.util.concurrent.atomic.AtomicReference[
          (graft.ml.Model, Option[Fit.Stats])]()
        val task = Commands.queueRuntime(mode).submit("learn", "",
          Map("model" -> name, "fetch_data_query" -> trainSql) ++ using) {
          box.set(trainer())
        }
        task.result()
        box.get()
    }


  /** One statement's lifecycle row — the reference's QUERIES meta table
    * / processlist entry (mindsdb_tables.py:430). Registered at START
    * (state `running`, so KILL and `mindsdb.queries` see in-flight
    * statements), finalized at completion. */
  private final class QueryRec(
      val id: Long, val kind: String, val statement: String,
      val startedAt: java.sql.Timestamp) {
    @volatile var state: String = "running"
    @volatile var error: String = _
    @volatile var finishedAt: java.sql.Timestamp = _
  }

  /** Executed-statement log backing `log.queries` and `mindsdb.queries`.
    * Driver-side, metadata-sized; bounded so a long-lived session cannot
    * grow it without limit. */
  private val queryLog = scala.collection.mutable.LinkedHashMap[Long, QueryRec]()
  private val MaxQueryLog = 1024
  private var queryCounter = 0L

  /** Job-group tag for one statement — what `KILL <id>` cancels. */
  private def jobGroupOf(id: Long) = s"graft-query-$id"

  /** Execute one statement; DDL returns a status frame, queries return
    * their result. Every statement — including ones dispatched
    * recursively (model-join data sides, job bodies) — records into
    * [[queryLog]] at dispatch start and finalizes at completion, so a
    * nested statement completes before its parent. While a statement
    * runs, its Spark jobs carry the [[jobGroupOf]] tag (thread-local, so
    * concurrent sessions don't cross), which is how KILL reaches a
    * statement mid-flight via `cancelJobGroup`. */
  def execute(sql: String): DataFrame = {
    // this session's meta-table frames become the thread's binding for
    // the statement (analysis resolves information_schema./mindsdb.*
    // through it) — cheap ThreadLocal set, correct under interleaving
    graft.catalog.InfoSchema.setLocal(infoBinding)
    graft.catalog.MindsdbTables.setLocal(mindsdbBinding)
    val norm = sql.trim.replaceAll("\\s+", " ")
    val kind = norm.split("\\s+", 2).head.toUpperCase
    val rec = queryLog.synchronized {
      queryCounter += 1
      val r = new QueryRec(queryCounter, kind, norm,
        new java.sql.Timestamp(System.currentTimeMillis()))
      queryLog(r.id) = r
      while (queryLog.size > MaxQueryLog) queryLog.remove(queryLog.head._1)
      r
    }
    val sc = spark.sparkContext
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    sc.setJobGroup(jobGroupOf(rec.id), rec.statement.take(200),
      interruptOnCancel = true)
    try {
      val out = dispatch(sql)
      rec.finishedAt = new java.sql.Timestamp(System.currentTimeMillis())
      if (rec.state == "running") rec.state = "ok"
      out
    } catch { case e: Throwable =>
      rec.finishedAt = new java.sql.Timestamp(System.currentTimeMillis())
      if (rec.state == "running") rec.state = "error"
      rec.error = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
      throw e
    } finally {
      // restore the ENCLOSING statement's group (recursive dispatch), or
      // clear it so the caller's later lazy actions aren't tagged
      if (prevGroup != null) sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      else sc.clearJobGroup()
    }
  }

  /** `KILL <id>`: cancel a running statement's Spark jobs by its group
    * tag and mark it killed (the reference serves KILL via the MySQL
    * proxy against its running-queries table). Idempotent; returns
    * whether a running statement was found. */
  def kill(id: Long): Boolean = {
    val found = queryLog.synchronized {
      queryLog.get(id).filter(_.state == "running").map { r =>
        r.state = "killed"; r
      }
    }
    found.foreach(_ => spark.sparkContext.cancelJobGroup(jobGroupOf(id)))
    found.isDefined
  }

  /** The full processlist frame behind `mindsdb.queries` — includes
    * running statements (unlike the completed-only `log.queries` route,
    * whose shape predates this table and is oracle-pinned). */
  private def queriesFrame(): DataFrame = {
    val rows = queryLog.synchronized {
      queryLog.values.map(r => Row(r.id, r.kind, r.statement, r.state,
        r.error, r.startedAt, r.finishedAt)).toSeq
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("query_id", org.apache.spark.sql.types.LongType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("statement", StringType, nullable = false),
        StructField("state", StringType, nullable = false),
        StructField("error", StringType),
        StructField("started_at", org.apache.spark.sql.types.TimestampType, nullable = false),
        StructField("finished_at", org.apache.spark.sql.types.TimestampType))))
  }

  /** `<table> FOR VERSION AS OF <n>` — time travel over the warehouse's
    * hard-linked snapshot history (Delta/Iceberg-style `VERSION AS OF`;
    * the reference has no table history at all). Rewritten BEFORE route
    * matching so the clause works anywhere a relation can appear —
    * subqueries, UNION branches, CTE bodies — with each occurrence bound
    * to a registered snapshot view. */
  private val ForVersion =
    """(?is)(\w+)\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private def rewriteTimeTravel(sql: String): String =
    if (!sql.matches("(?is).*FOR\\s+VERSION\\s+AS\\s+OF.*")) sql
    else ForVersion.replaceAllIn(sql, m => {
      val (name, v) = (m.group(1), m.group(2).toInt)
      val tv = s"__${name}_v$v"
      warehouse.tableVersion(name, v).createOrReplaceTempView(tv)
      tv
    })

  /** First top-level (outside parens and string literals) occurrence of
    * word `kw`, case-insensitive; -1 if absent. */
  private def topLevelKeyword(s: String, kw: String): Int = {
    var depth = 0; var i = 0; var inStr = false
    val n = s.length; val k = kw.length
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < n) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && i + k <= n && s.regionMatches(true, i, kw, 0, k) &&
          (i == 0 || !isWordChar(s.charAt(i - 1))) &&
          (i + k == n || !isWordChar(s.charAt(i + k)))) return i
      i += 1
    }
    -1
  }

  /** `QUALIFY <pred>` (Snowflake/DuckDB/BigQuery) — filter on window
    * results without spelling the subquery. Spark has no QUALIFY, so the
    * statement rewrites to the standard wrap: project the predicate over
    * the query's output, filter on it, drop the helper column. The
    * predicate may reference any column of the query's OUTPUT (exactly
    * the wrap's semantics — the common form for top-k-per-group). */
  private def rewriteQualify(sql: String): String =
    if (!sql.matches("(?is)\\s*(SELECT|WITH)\\b.*")) sql
    else {
      val idx = topLevelKeyword(sql, "QUALIFY")
      if (idx < 0) sql
      else {
        val pre = sql.substring(0, idx)
        val rest = sql.substring(idx + "QUALIFY".length)
        val stops = Seq("ORDER", "LIMIT").map(topLevelKeyword(rest, _)).filter(_ >= 0)
        val predEnd = if (stops.isEmpty) rest.length else stops.min
        val pred = rest.substring(0, predEnd)
        val tail = rest.substring(predEnd)
        s"SELECT * EXCEPT(__q) FROM (SELECT *, ($pred) AS __q FROM ($pre)) WHERE __q $tail"
      }
    }

  /** pgvector distance-operator sugar (reference
    * vectordatabase_handler.py:51-54): `a <-> b` → L2 distance,
    * `a <#> b` → negative inner product, `a <=> b` → cosine distance —
    * each rewritten to the codegen'd native expressions. `<=>` doubles
    * as SQL null-safe equality, so it only takes the vector meaning when
    * one operand is a pgvector `'[…]'` literal; `<->`/`<#>` have no SQL
    * meaning and always rewrite. Operands may be (qualified)
    * identifiers, function calls, parenthesized expressions, or `'[…]'`
    * vector literals (which become typed array constructors). */
  private def rewriteVectorOps(sql: String): String = {
    if (!sql.contains("<->") && !sql.contains("<#>") && !sql.contains("<=>")) return sql
    def isIdentChar(c: Char) = Character.isLetterOrDigit(c) || c == '_' || c == '.'
    // find next operator at or after `from`, outside string literals
    def findOp(s: String, from: Int): Option[(Int, String)] = {
      var i = 0; var inStr = false
      while (i < s.length - 2) {
        val c = s.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (i >= from && c == '<' && i + 2 < s.length && s.charAt(i + 2) == '>' &&
                 (s.charAt(i + 1) == '-' || s.charAt(i + 1) == '#' || s.charAt(i + 1) == '='))
          return Some((i, s.substring(i, i + 3)))
        i += 1
      }
      None
    }
    // left operand: [start, end) scanning backward from the operator
    def leftOperand(s: String, opIdx: Int): Int = {
      var j = opIdx - 1
      while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
      if (j < 0) return opIdx
      s.charAt(j) match {
        case '\'' =>
          var k = j - 1
          while (k >= 0 && s.charAt(k) != '\'') k -= 1
          k
        case ')' =>
          var depth = 0; var k = j
          while (k >= 0 && { val c = s.charAt(k)
            if (c == ')') depth += 1 else if (c == '(') depth -= 1; depth != 0 }) k -= 1
          k -= 1 // include a preceding function name if present
          while (k >= 0 && isIdentChar(s.charAt(k))) k -= 1
          k + 1
        case _ =>
          var k = j
          while (k >= 0 && isIdentChar(s.charAt(k))) k -= 1
          k + 1
      }
    }
    // right operand: (start, end] scanning forward from after the operator
    def rightOperand(s: String, afterOp: Int): Int = {
      var j = afterOp
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (j >= s.length) return afterOp
      s.charAt(j) match {
        case '\'' =>
          var k = j + 1
          while (k < s.length && s.charAt(k) != '\'') k += 1
          k + 1
        case '(' =>
          var depth = 0; var k = j
          while (k < s.length && { val c = s.charAt(k)
            if (c == '(') depth += 1 else if (c == ')') depth -= 1; depth != 0 }) k += 1
          k + 1
        case _ =>
          var k = j
          while (k < s.length && isIdentChar(s.charAt(k))) k += 1
          if (k < s.length && s.charAt(k) == '(') { // function call
            var depth = 0
            while (k < s.length && { val c = s.charAt(k)
              if (c == '(') depth += 1 else if (c == ')') depth -= 1; depth != 0 }) k += 1
            k += 1
          }
          k
      }
    }
    val VecLit = """(?s)\s*'\s*\[(.*)\]\s*'\s*""".r
    def operandSql(raw: String): (String, Boolean) = raw match {
      case VecLit(items) =>
        (s"CAST(array($items) AS ARRAY<DOUBLE>)", true)
      case other => (other.trim, false)
    }
    var s = sql
    var searchFrom = 0
    var found = findOp(s, searchFrom)
    while (found.isDefined) {
      val (idx, op) = found.get
      val lStart = leftOperand(s, idx)
      val rEnd = rightOperand(s, idx + 3)
      val (l, lIsVec) = operandSql(s.substring(lStart, idx))
      val (r, rIsVec) = operandSql(s.substring(idx + 3, rEnd))
      if (op == "<=>" && !lIsVec && !rIsVec) {
        searchFrom = idx + 3 // genuine null-safe equality: leave it alone
      } else {
        val call = op match {
          case "<->" => s"vec_l2($l, $r)"
          case "<#>" => s"(- dot_product($l, $r))"
          case _ => s"(1.0 - cosine_sim($l, $r))"
        }
        s = s.substring(0, lStart) + call + s.substring(rEnd)
        searchFrom = lStart + call.length
      }
      found = findOp(s, searchFrom)
    }
    s
  }

  /** MySQL-client handshake functions in table-less SELECTs
    * (`select version()`, `select session_user`, `select database()`,
    * `connection_id()` — reference test_select_without_table; the proxy
    * answers these itself): rewritten to the server's literals so any
    * client library's connection probe succeeds. Only applies when the
    * statement has no FROM — inside real queries Spark's own functions
    * keep their meaning. */
  private def rewriteHandshakeFns(sql: String): String = {
    if (!sql.matches("(?is)\\s*SELECT\\b.*") || topLevelKeyword(sql, "FROM") >= 0)
      return sql
    // (bare-call pattern, replacement literal, default alias). The AS
    // alias is only valid when the call IS the whole select item —
    // injecting it inside a larger expression (`upper(version())`)
    // produces unparseable SQL, so nested occurrences get the bare
    // literal and keep their enclosing expression's own aliasing.
    val fns = Seq(
      ("""version\s*\(\s*\)""", "'8.0.17-graft'", "version()"),
      ("""(?:database|schema)\s*\(\s*\)""", "'graft'", "database()"),
      ("""connection_id\s*\(\s*\)""", "1", "connection_id()"),
      ("""(?:session_user|system_user)(?:\s*\(\s*\))?""",
        "CAST(NULL AS STRING)", "session_user"))
    val m = "(?is)^(\\s*SELECT\\s+)(.*)$".r.findFirstMatchIn(sql).get
    val prefix = m.group(1)
    val rest = m.group(2)
    // WHERE/LIMIT/ORDER tails stay outside the select-list rewrite
    val tailIdx = Seq("WHERE", "LIMIT", "ORDER")
      .map(k => topLevelKeyword(rest, k)).filter(_ >= 0)
      .minOption
    val (list, tailStr) = tailIdx match {
      case Some(i) => (rest.substring(0, i), " " + rest.substring(i))
      case None => (rest, "")
    }
    val items = splitTop(list, ',').map { item =>
      fns.collectFirst {
        case (pat, lit, alias) if item.matches("(?is)" + pat) =>
          s"$lit AS `$alias`"
      }.getOrElse {
        // nested: bare literal; skip occurrences the user aliased
        // themselves (`version() AS v` keeps Spark's own function, the
        // pre-round-12 behavior)
        fns.foldLeft(item) { case (acc, (pat, lit, _)) =>
          acc.replaceAll("(?i)\\b" + pat + "(?!\\s+AS)(?!\\s*\\()", lit)
        }
      }
    }
    prefix + items.mkString(", ") + tailStr
  }

  /** Execute `inner` VERBATIM in database `db`'s engine and return the
    * result as a frame (the native-passthrough primitive shared by the
    * top-level and nested `db (select …)` routes). */
  private def runNativeQuery(db: String, inner: String): DataFrame = {
    val ent = catalog.database(db).get
    ent.engine match {
      case "derby" | "jdbc" =>
        graft.federation.JdbcDb.nativeQuery(spark,
          ent.params.getOrElse("database", db), inner)
      case "mem" =>
        val tables = graft.federation.MemTables.registry.keys.toSeq
          .filter(t => inner.toLowerCase.contains(t.toLowerCase))
        val (schema, rows) = graft.federation.MemEngine
          .runWithSchema(inner, tables)
        spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      case other => throw new IllegalArgumentException(
        s"database $db (engine $other) does not accept native queries")
    }
  }

  /** Balanced parens outside quotes — the guard that keeps the lazy/
    * greedy regex captures of the native-query route from accepting a
    * NESTED native call (which the rewrite route handles instead). */
  private def parenBalanced(s: String): Boolean = {
    var depth = 0
    var ok = true
    s.replaceAll("'[^']*'", "''").foreach {
      case '(' => depth += 1
      case ')' => depth -= 1; if (depth < 0) ok = false
      case _ =>
    }
    ok && depth == 0
  }

  /** First `db ( select … )` occurrence where `db` is a registered
    * database: (start, openParenIdx). None when absent. */
  private def nativeSubqueryAt(s: String): Option[(Int, Int)] =
    """(?is)\b(\w+)\s*\(""".r.findAllMatchIn(s).collectFirst {
      case m if catalog.database(m.group(1)).isDefined &&
        s.substring(m.end).dropWhile(_.isWhitespace)
          .take(6).equalsIgnoreCase("select") =>
        (m.start, m.end - 1)
    }

  private def rewriteNativeSubqueries(sql: String): String = {
    var s = sql
    var at = nativeSubqueryAt(s)
    while (at.isDefined) {
      val (start, open) = at.get
      var depth = 0
      var i = open
      while (i < s.length && { val c = s.charAt(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        depth != 0 }) i += 1
      require(i < s.length, s"unbalanced native subquery in: $sql")
      val db = s.substring(start, open).trim
      val inner = s.substring(open + 1, i)
      val tv = "__native_" + Integer.toHexString(inner.hashCode)
      runNativeQuery(db, inner).createOrReplaceTempView(tv)
      s = s.substring(0, start) + tv + s.substring(i + 1)
      at = nativeSubqueryAt(s)
    }
    s
  }

  private def dispatch(sql0: String): DataFrame = {
    val sql = rewriteQualify(rewriteTimeTravel(rewriteVectorOps(
      rewriteHandshakeFns(sql0)))); sql match {
    case CreateView(name, body) =>
      // validate the body now (spark.sql analyzes eagerly), but store the
      // SQL TEXT and re-expand at every resolution: a view over a
      // warehouse table must see the table as it stands at READ time —
      // capturing the plan once would pin the old snapshot's file listing,
      // which UPDATE/DELETE's copy-on-write swap deletes. Self-reference
      // stays non-recursive: while expanding view v, only views created
      // BEFORE v are registered, so `FROM v` inside v's body resolves to
      // the base/warehouse table.
      val probe = run(body)
      // the reference REFUSES a view whose output has ambiguous column
      // names (test_view_duplicated_cols — e.g. `SELECT *` over a join
      // where both sides carry `id`): every later reference to that
      // column would be unresolvable, so fail at CREATE, loudly
      locally {
        val dups = probe.columns.map(_.toLowerCase)
          .groupBy(identity).collect { case (c, hits) if hits.length > 1 => c }
        require(dups.isEmpty,
          s"view $name has duplicated column(s): ${dups.mkString(", ")} — " +
            "alias them in the view body")
      }
      catalog.createView(name, {
        registerBase()
        registerViews(before = Some(name))
        spark.sql(body)
      })
      catalog.recordViewSql(name, body.trim)
      ok(s"view $name created")
    case DropView(ifEx, name) =>
      if (catalog.listViews().contains(name.toLowerCase)) { catalog.dropView(name); ok(s"view $name dropped") }
      else { require(ifEx != null, s"view $name does not exist"); ok(s"view $name does not exist") }

    case CreateMv(name, tsCol, body) =>
      // CREATE MATERIALIZED VIEW <name> TRACK <ts> AS (SELECT … GROUP BY …)
      // — the engine-native spelling of the reference's incremental-job
      // aggregate (jobs + `WHERE ts > LAST`, jobs_controller.py:104 +
      // context_controller.py:293-344); see [[MaterializedViews]]
      mvs.create(name, tsCol, stripParens(body))
      ok(s"materialized view $name created")
    case RefreshMv(name) =>
      val (groups, wm) = mvs.refresh(name)
      ok(s"materialized view $name refreshed: $groups groups, watermark ${wm.getOrElse(-1L)}")
    case DropMv(ifEx, name) =>
      if (mvs.exists(name)) { mvs.drop(name); ok(s"materialized view $name dropped") }
      else {
        require(ifEx != null, s"materialized view $name does not exist")
        ok(s"materialized view $name does not exist")
      }

    case CreateTsModel(orReplace, ifNot, name, trainSql, target, tsCol,
        groupCol, window, horizon, using) =>
      // the reference's TS DDL (`… PREDICT v ORDER BY ts [GROUP BY g]
      // WINDOW n HORIZON h`, sql_query.py:181-205): the settings store
      // on the model; applying = joining data against it
      if (catalog.listModels().contains(name.toLowerCase)) {
        if (ifNot != null) return ok(s"model $name already exists")
        require(orReplace != null, s"model $name already exists")
        catalog.dropModel(name)
      }
      run(trainSql) // validate the training query eagerly, like CREATE MODEL
      val tsParams = parseUsing(Option(using).getOrElse(""))
      catalog.createModel(graft.ml.TimeSeries.TsModel(name, target, tsCol,
        Option(groupCol), window.toInt, horizon.toInt,
        tsParams.getOrElse("engine", "mean"), tsParams), using = tsParams)
      ok(s"model $name created")
    case CreateModelFit(orReplace, ifNot, name, trainSql, target, using) =>
      // CREATE [OR REPLACE] MODEL [IF NOT EXISTS]: replace retrains in
      // place, if-not-exists is a no-op on conflict, bare CREATE on an
      // existing name errors (reference model lifecycle)
      if (catalog.listModels().contains(name.toLowerCase)) {
        if (ifNot != null) return ok(s"model $name already exists")
        require(orReplace != null, s"model $name already exists")
        catalog.dropModel(name)
      }
      val p = parseUsing(using)
      p.get("engine") match {
        case Some("kmeans") =>
          // clustering engine: PREDICT names the assignment column
          // contract (always emitted as `cell`); features names the
          // vector column, id_column the deterministic-init key
          val vecCol = p.getOrElse("features", "embedding").split(",").head.trim
          val idCol = p.getOrElse("id_column", "vec_id")
          val k = p.getOrElse("k", "8").toInt
          val iters = p.getOrElse("iterations", "2").toInt
          val trainer = () => {
            val m = graft.ml.KMeans.trained(name, run(trainSql), idCol, vecCol, k, iters)
            (m: graft.ml.Model, Option.empty[Fit.Stats])
          }
          val (m, st) = runTrainer(name, trainSql, p, trainer)
          catalog.createModel(m, st, Some(trainer), None, using = p)
          ok(s"model $name trained (version 1)")
        case Some("anomaly") =>
          // anomaly-detection engine: per-group z-scores of the feature;
          // PREDICT names the flag contract (always emitted as
          // score/is_anomaly), group_by keys the stats, threshold
          // defaults to the 3σ rule
          val featCol = p.getOrElse("features", target).split(",").head.trim
          val gCol = p.get("group_by").map(_.trim)
          val thr = p.getOrElse("threshold", "3.0").toDouble
          val trainer = () => {
            val m = graft.ml.Anomaly.trained(name, run(trainSql), featCol, gCol, thr)
            (m: graft.ml.Model, Option.empty[Fit.Stats])
          }
          val (m, st) = runTrainer(name, trainSql, p, trainer)
          catalog.createModel(m, st, Some(trainer), None, using = p)
          ok(s"model $name trained (version 1)")
        case Some("ridge") =>
          // regularized-regression engine: OLS's additive sufficient
          // statistics with λ on the feature diagonal at solve time
          // (engine variety via USING engine=…, like the reference's
          // ml_handler selection). RETRAIN re-runs the stored trainer;
          // FINETUNE is not offered (it would silently re-solve
          // unpenalized), so the spec is not stored.
          val features = p.getOrElse("features",
            throw new IllegalArgumentException("engine='ridge' needs features='c1,c2'"))
            .split(",").map(_.trim).toSeq
          val lambda = p.getOrElse("lambda", "1.0").toDouble
          val spec = Fit.FitSpec(features, target, p.getOrElse("score_column", "score"))
          val trainer = () => {
            val (m, st) = Fit.fitRidge(name, run(trainSql), spec, lambda)
            (m: graft.ml.Model, Option(st))
          }
          val (m, st) = runTrainer(name, trainSql, p, trainer)
          catalog.createModel(m, st, Some(trainer), None, using = p)
          ok(s"model $name trained (version 1)")
        case Some(engName) if catalog.mlEngine(engName)
            .exists(_.handler == "byom") =>
          // an engine uploaded over REST (PUT /api/handlers/byom/<name>;
          // namespaces/handlers.py:292-330): training and inference run
          // in forked BYOM worker processes — the out-of-process seam,
          // never user code in the server JVM. Single-feature OLS is the
          // shipped worker's model; the uploaded code rides along as
          // engine params (env-blocked from actually exec'ing python).
          val feat = p.getOrElse("features",
            throw new IllegalArgumentException(
              s"engine='$engName' needs features='<column>'"))
            .split(",").head.trim
          val scoreCol = p.getOrElse("score_column", "score")
          val trainer = () => {
            val rows = run(trainSql)
              .select(col(feat).cast("double"), col(target).cast("double"))
              .na.drop()
              .limit(graft.ml.ByomModel.MaxTrainingRows + 1).collect()
            require(rows.length <= graft.ml.ByomModel.MaxTrainingRows,
              s"BYOM training set exceeds ${graft.ml.ByomModel.MaxTrainingRows} rows")
            val training = rows.toSeq.map(r => (r.getDouble(0), r.getDouble(1)))
            // train once through a worker NOW so bad engine code fails the
            // CREATE (the reference's learn process), then retain the
            // payload for per-partition replay at predict time
            val probe = new graft.ml.ByomProcessEngine
            try probe.create(training) finally probe.close()
            val m = graft.ml.ByomModel(name, Seq(feat), scoreCol, training)
            (m: graft.ml.Model, Option.empty[Fit.Stats])
          }
          val (m, st) = runTrainer(name, trainSql, p, trainer)
          catalog.createModel(m, st, Some(trainer), None, using = p)
          ok(s"model $name trained (version 1)")
        case Some("naive_bayes") =>
          // classification engine: CREATE MODEL … PREDICT <label> USING
          // engine='naive_bayes', features='<text column>' — the
          // reference's multi-engine model lifecycle (ml_handlers
          // selection via USING engine=…)
          val textCol = p.getOrElse("features", "text").split(",").head.trim
          val trainer = () => {
            val m = graft.ml.NaiveBayes.trained(name, run(trainSql), textCol, target)
            (m: graft.ml.Model, Option.empty[Fit.Stats])
          }
          val (m, st) = runTrainer(name, trainSql, p, trainer)
          catalog.createModel(m, st, Some(trainer), None, using = p)
          ok(s"model $name trained (version 1)")
        case _ =>
          val features = p.getOrElse("features",
            throw new IllegalArgumentException("CREATE MODEL ... FROM needs features='c1,c2'"))
            .split(",").map(_.trim).toSeq
          val spec = Fit.FitSpec(features, target, p.getOrElse("score_column", "score"))
          val trainer = () => {
            val (m, st) = Fit.fit(name, run(trainSql), spec)
            (m: graft.ml.Model, Option(st))
          }
          val (m, st) = runTrainer(name, trainSql, p, trainer)
          catalog.createModel(m, st, Some(trainer), Some(spec), using = p)
          ok(s"model $name trained (version 1)")
      }
    case CreateModel(orReplace, ifNot, name, target, feats, weights, bias) =>
      if (catalog.listModels().contains(name.toLowerCase)) {
        if (ifNot != null) return ok(s"model $name already exists")
        require(orReplace != null, s"model $name already exists")
        catalog.dropModel(name)
      }
      catalog.createModel(LinearModel(name,
        feats.split(",").map(_.trim).toSeq,
        weights.split(",").map(_.trim.toDouble).toSeq,
        bias.toDouble, scoreCol = target))
      ok(s"model $name created")
    case RetrainStmt(name) =>
      val v = catalog.retrain(name)
      ok(s"model $name retrained (version $v active)")
    case FinetuneStmt(name, dataSql) =>
      val v = catalog.finetune(name, run(dataSql))
      ok(s"model $name finetuned (version $v active)")
    case DropModel(name) =>
      catalog.dropModel(name); ok(s"model $name dropped")

    case CreateJob(name, body, schedule, startAt, endAt, ifQuery) =>
      // START/END bound the job's execution window (jobs_controller.py
      // start_at/end_at: first run not before START, deactivate past END)
      def ts(s: String): java.time.Instant =
        java.time.LocalDateTime.parse(s.trim.replace(" ", "T"))
          .toInstant(java.time.ZoneOffset.UTC)
      // job bodies route through the statement router (executeScript →
      // execute), NOT bare spark.sql: the reference's primary use of a
      // job body is incremental `WHERE ts > LAST`, and multi-statement
      // bodies separated by ';' are legal (jobs_controller query lists)
      //
      // IF (query): the job body runs only when the gate query returns
      // rows (jobs executor: `if_query_str` rows gate each call)
      jobs.create(Jobs.Job(name, s"every $schedule",
        () => { executeScript(body).count(); () },
        ifCondition = Option(ifQuery)
          .map(q => () => execute(q).limit(1).count() > 0)
          .getOrElse(() => true),
        start = Option(startAt).map(ts), end = Option(endAt).map(ts),
        queryText = body, ifQueryText = Option(ifQuery).getOrElse("")))
      ok(s"job $name created")
    case DropJob(ifEx, name) =>
      if (jobs.list().exists(_.name == name)) { jobs.drop(name); ok(s"job $name dropped") }
      else { require(ifEx != null, s"job $name does not exist"); ok(s"job $name does not exist") }

    case CreateKb(ifNot, name, using) =>
      catalog.createKb(name, parseUsing(Option(using).getOrElse("")), ifNot != null)
      ok(s"knowledge base $name created")
    case DropKb(ifEx, name) =>
      catalog.kb(name).foreach(k =>
        if (warehouse.exists(k.storage)) warehouse.dropTable(k.storage))
      catalog.dropKb(name, ifEx != null)
      ok(s"knowledge base $name dropped")
    case EvaluateKb(name, using) =>
      val p = parseUsing(using)
      val k = catalog.kb(name).getOrElse(
        throw new NoSuchElementException(s"knowledge base $name does not exist"))
      val test = run(s"SELECT * FROM ${p.getOrElse("test_table",
        throw new IllegalArgumentException("EVALUATE KNOWLEDGE_BASE needs test_table=..."))}")
      Kb.evaluate(warehouse.table(k.storage), test,
        p.get("k").map(_.toInt).getOrElse(Kb.DefaultLimit))
    case EvaluateMetric(metric, dataSql, using) =>
      // EVALUATE <metric> FROM (query) [USING n_decimals = k]
      // (command_executor.py:846 answer_evaluate_metric): the nested
      // query must yield `actual` and `prediction`; the metric is one
      // aggregation pass over it
      val p = Option(using).map(parseUsing).getOrElse(Map.empty)
      graft.ml.Metrics.evaluate(run(dataSql), metric,
        p.get("n_decimals").map(_.toInt).getOrElse(3))

    case CreateFunction(orReplace, name, args, retType, body) =>
      // CREATE [OR REPLACE] FUNCTION name(args) RETURNS type RETURN expr
      // — a SQL-defined scalar function (the in-engine sibling of the
      // reference's BYOM UDF surface; SQL-body UDFs stay inside
      // whole-stage codegen, unlike external ones). Registered as a
      // Spark SQL UDF and surfaced through information_schema.routines.
      require(orReplace != null ||
        !graft.functions.AiFunctions.userRoutines.exists(_._1 == name.toLowerCase),
        s"function $name already exists")
      spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $name($args) " +
        s"RETURNS $retType RETURN $body")
      graft.functions.AiFunctions.addUserRoutine(
        name.toLowerCase, retType.trim.toLowerCase, body.trim)
      ok(s"function $name created")
    case DropFunction(ifEx, name) =>
      try spark.sql(s"DROP TEMPORARY FUNCTION $name")
      catch { case e: Exception => if (ifEx == null) throw e }
      graft.functions.AiFunctions.dropUserRoutine(name)
      ok(s"function $name dropped")

    case CreateAgent(name, using) =>
      val p = agentParams(parseUsing(using))
      catalog.createAgent(name, p.getOrElse("model", "default"), p - "model")
      ok(s"agent $name created")
    case UpdateAgent(name, using) =>
      catalog.updateAgent(name, agentParams(parseUsing(using)))
      ok(s"agent $name updated")
    case DropAgent(ifEx, name) =>
      if (catalog.agent(name).isDefined) { catalog.dropAgent(name); ok(s"agent $name dropped") }
      else { require(ifEx != null, s"agent $name does not exist"); ok(s"agent $name does not exist") }

    // CREATE/UPDATE/DROP SKILL (skills table db.py:434; agent linkage via
    // the agent's skills=… param — agent_skills association db.py:423)
    case CreateSkill(name, using) =>
      val p = parseUsing(using)
      catalog.createSkill(name, p.getOrElse("type", "text2sql"), p - "type")
      ok(s"skill $name created")
    case UpdateSkill(name, set) =>
      catalog.updateSkill(name, parseUsing(set)); ok(s"skill $name updated")
    case DropSkill(ifEx, name) =>
      if (catalog.skill(name).isDefined) { catalog.dropSkill(name); ok(s"skill $name dropped") }
      else { require(ifEx != null, s"skill $name does not exist"); ok(s"skill $name does not exist") }

    case CreateTrigger(name, table, body) =>
      catalog.createTrigger(name, table, body)
      ok(s"trigger $name created")
    case DropTrigger(ifEx, name) =>
      if (catalog.trigger(name).isDefined) { catalog.dropTrigger(name); ok(s"trigger $name dropped") }
      else { require(ifEx != null, s"trigger $name does not exist"); ok(s"trigger $name does not exist") }

    case TxnStmt(verb) =>
      // Real multi-statement transactions over the warehouse snapshot
      // log (beyond the reference, whose command_executor.py
      // StartTransaction/Commit/Rollback dispatch is a no-op): BEGIN
      // records pre-image versions at first touch, ROLLBACK restores
      // them by hard link, COMMIT forgets the record. O(metadata) per
      // touched table at any data size.
      verb.trim.toUpperCase.replaceAll("\\s+", " ") match {
        case "BEGIN" | "START TRANSACTION" =>
          warehouse.begin(); ok("transaction started")
        case "COMMIT" =>
          warehouse.commitTxn(); ok("committed")
        case _ =>
          val actions = warehouse.rollbackTxn()
          ok(if (actions.isEmpty) "rolled back (nothing touched)"
             else s"rolled back: ${actions.mkString("; ")}")
      }

    case AlterView(name, body) =>
      // ALTER VIEW … AS (command_executor.py:633 → answer_alter_view):
      // redefinition replaces the stored query text, same late-binding
      // semantics as CREATE VIEW
      require(catalog.listViews().contains(name.toLowerCase), s"view $name does not exist")
      run(body)
      catalog.createView(name, {
        registerBase()
        registerViews(before = Some(name))
        spark.sql(body)
      })
      ok(s"view $name altered")
    // ALTER TABLE schema evolution (metadata-only; Warehouse evolog)
    case AlterAddCol(name, column, typ, dflt) =>
      warehouse.addColumn(name, column, typ, Option(dflt))
      ok(s"column $column added to $name")
    case AlterRenameCol(name, from, to) =>
      warehouse.renameColumn(name, from, to)
      ok(s"column $from renamed to $to in $name")
    case AlterDropCol(name, column) =>
      warehouse.dropColumn(name, column)
      ok(s"column $column dropped from $name")

    case AlterKb(name, using) =>
      catalog.updateKb(name, parseUsing(using))
      ok(s"knowledge base $name altered")

    case CreateChatbot(name, using) =>
      val p = parseUsing(using)
      catalog.createChatbot(name,
        p.getOrElse("database",
          throw new IllegalArgumentException("CREATE CHATBOT needs database = '…'")),
        p.get("model"), p.get("agent"),
        p.get("is_running").forall(_.toBoolean),
        p -- Seq("database", "model", "agent", "is_running"))
      ok(s"chatbot $name created")
    case UpdateChatbot(name, setList) =>
      catalog.updateChatbot(name, parseUsing(setList))
      ok(s"chatbot $name updated")
    case DropChatbot(name) =>
      catalog.dropChatbot(name); ok(s"chatbot $name dropped")

    case CreateMlEngine(ifNot, name, handler, using) =>
      catalog.createMlEngine(name, handler,
        Option(using).map(parseUsing).getOrElse(Map.empty), ifNot != null)
      ok(s"ml engine $name created")
    case DropMlEngine(name) =>
      catalog.dropMlEngine(name); ok(s"ml engine $name dropped")

    case SetActive(name, version) =>
      // SET ACTIVE <model>.<version> (command_executor.py:1963
      // answer_update_model_version → set_model_active_version)
      catalog.setActiveVersion(name, version.toInt)
      ok(s"model $name version $version active")

    case CreateKbIndex(name, withParams) =>
      // CREATE INDEX ON KNOWLEDGE_BASE (command_executor.py:968
      // answer_create_kb_index → kb_controller.create_index): build the
      // IVF coarse index over the ingested chunk store. The cell column
      // becomes the chunk table's PARTITION column, so a probed search
      // prunes whole partition directories — at 100 TB the query lists
      // and reads ~nProbe/nlist of the files, not just rows.
      val k = catalog.kb(name).getOrElse(
        throw new NoSuchElementException(s"knowledge base $name does not exist"))
      require(warehouse.exists(k.storage),
        s"knowledge base $name has no ingested chunks to index")
      val p = Option(withParams).map(parseUsing).getOrElse(Map.empty)
      val nlist = p.get("nlist").map(_.toInt).getOrElse(8)
      val nprobe = p.get("nprobe").map(_.toInt).getOrElse(math.max(1, nlist / 4))
      // trained=true swaps the lexicographic stand-in codebook for two
      // Lloyd rounds of k-means over the chunk embeddings
      val (indexed, cents) =
        if (p.get("trained").exists(_.toBoolean))
          Kb.ivfIndexTrained(warehouse.table(k.storage), nlist)
        else Kb.ivfIndex(warehouse.table(k.storage), nlist)
      if (warehouse.exists(s"${k.storage}_cents")) warehouse.dropTable(s"${k.storage}_cents")
      warehouse.createTableAs(s"${k.storage}_cents", cents)
      warehouse.replace(k.storage, indexed, partitionBy = Seq("cell"))
      catalog.updateKb(name,
        Map("ivf_nlist" -> nlist.toString, "ivf_nprobe" -> nprobe.toString))
      ok(s"index created on knowledge base $name ($nlist cells)")

    case CreateDatabase(name, engine, params) =>
      val p = Option(params).map(parseUsing).getOrElse(Map.empty)
      catalog.createDatabase(name, engine.toLowerCase, p)
      // a JDBC engine binds a LIVE catalog: `SELECT … FROM <name>.APP.<t>`
      // resolves through Spark's JDBCTableCatalog with filter/agg/join/
      // limit pushdown — the reference's CREATE DATABASE … WITH ENGINE=
      // 'postgres' PARAMETERS={…} lifecycle (command_executor.py:1260),
      // served in-sandbox by embedded Derby on the same code path
      if (Set("derby", "jdbc").contains(engine.toLowerCase))
        graft.federation.JdbcDb.ensureCatalog(spark,
          p.getOrElse("database", name), catalog = name)
      ok(s"database $name created (engine $engine)")
    case DropDatabase(ifEx, name) =>
      if (catalog.listDatabases().contains(name.toLowerCase)) {
        catalog.dropDatabase(name); ok(s"database $name dropped")
      } else {
        require(ifEx != null, s"database $name does not exist")
        ok(s"database $name does not exist")
      }
    case AlterDatabase(name, params) =>
      catalog.updateDatabase(name, parseUsing(params))
      ok(s"database $name altered")

    case CreateProject(name) =>
      // projects are mindsdb-engine databases (databases_controller
      // project handling; command_executor.py:895 lists PROJECTS as a
      // global object class)
      catalog.createDatabase(name, "mindsdb")
      ok(s"project $name created")
    case DropProject(name) =>
      catalog.dropDatabase(name); ok(s"project $name dropped")

    case CloneStmt(dst, src) =>
      // CREATE TABLE dst [SHALLOW] CLONE src — zero-copy clone via hard
      // links (Delta's SHALLOW CLONE). Copy-on-write DML means the two
      // tables diverge safely on first write to either.
      warehouse.cloneTable(src, dst)
      ok(s"table $dst cloned from $src")

    case CtasBucketed(name, bucketCol, n, body) =>
      // CREATE TABLE … CLUSTERED BY (col) INTO n BUCKETS AS …: the
      // co-located-join layout (same bucket count + key on both sides →
      // exchange-free sort-merge joins)
      warehouse.createBucketedTableAs(name, run(body), bucketCol, n.toInt)
      ok(s"bucketed table $name created ($n buckets on $bucketCol)")

    case Ctas(name, partCols, body) =>
      warehouse.createTableAs(name, run(body), overwrite = true,
        partitionBy = Option(partCols).toSeq.flatMap(_.split(",")).map(_.trim))
      ok(s"table $name created")
    // TRUNCATE TABLE: empty the table, keep the schema — snapshot-logged
    // so time travel / ROLLBACK recovers the pre-image
    case TruncateStmt(name) =>
      require(warehouse.exists(name), s"TRUNCATE: table $name does not exist")
      warehouse.truncate(name)
      ok(s"truncated $name")

    // COPY INTO t FROM '<path>' (Snowflake/Delta's bulk-load verb): the
    // file is format-sniffed (FileSource — csv/json/parquet/xlsx/txt),
    // read distributed, and appended through INSERT's name/position
    // conform rule — the files-upload ingest path as one statement
    case CopyInto(name, path) =>
      require(warehouse.exists(name), s"COPY INTO: table $name does not exist")
      warehouse.insertInto(name,
        graft.federation.FileSource.read(catalog.spark, path))
      ok(s"copied $path into $name")

    // SHOW PARTITIONS t (Hive/Spark DDL): one combinable count per
    // partition value — partition metadata at any table size
    case ShowPartitions(name) =>
      val pc = warehouse.partitionColumn(name).getOrElse(
        throw new IllegalArgumentException(s"SHOW PARTITIONS: table $name is not partitioned"))
      warehouse.table(name)
        .groupBy(col(pc).cast(StringType).as("partition_value"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(pc).as("partition_column"), col("partition_value"), col("n_rows"))
        .orderBy(col("partition_value"))

    case CreateTableLike(name, src) =>
      // CREATE TABLE dst LIKE src (MySQL/Hive): empty table carrying the
      // source's schema. Physical layout (partitions/buckets) is NOT
      // copied — matching MySQL's behavior of cloning structure only;
      // CLONE is the verb that shares data+layout.
      require(warehouse.exists(src) || catalog.spark.catalog.tableExists(src),
        s"table $src does not exist")
      warehouse.createTable(name,
        (if (warehouse.exists(src)) warehouse.table(src)
         else catalog.spark.table(src)).schema)
      ok(s"table $name created like $src")
    case CreateTableCols(name, colDefs) =>
      // CREATE TABLE t (a BIGINT, b STRING, …) — empty table carrying the
      // declared schema (steps.py:255, command_executor.py:1955)
      warehouse.createTable(name, StructType.fromDDL(colDefs))
      ok(s"table $name created")
    case DropTable(name) =>
      warehouse.dropTable(name); ok(s"table $name dropped")
    case ExportStmt(nameO, subO, path, fmtO, shardO) =>
      // EXPORT TABLE t | (query) TO '<path>' [FORMAT jsonl|csv|parquet]
      // [SHARD ROWS n] — the training-data hand-off: size-bounded shard
      // files (maxRecordsPerFile caps rows per file WITHOUT a
      // repartition — each write task rolls files as it fills them, so
      // sharding is free at any scale) plus a _manifest.json the
      // downstream loader trusts instead of re-listing/recounting.
      val df = Option(nameO).map(n => run(s"SELECT * FROM $n"))
        .getOrElse(run(subO))
      val fmt = Option(fmtO).map(_.toLowerCase).getOrElse("jsonl")
      val shardRows = Option(shardO).map(_.toLong)
      val w0 = df.write.mode("overwrite")
      val w = shardRows.fold(w0)(n => w0.option("maxRecordsPerFile", n))
      fmt match {
        case "jsonl" | "json" => w.json(path)
        case "csv" => w.option("header", "true").csv(path)
        case "parquet" => w.parquet(path)
        case other => throw new IllegalArgumentException(
          s"EXPORT FORMAT $other not supported (jsonl, csv, parquet)")
      }
      val ext = if (fmt == "parquet") ".parquet" else if (fmt == "csv") ".csv" else ".json"
      val shards = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(path))
        try s.filter(p => p.getFileName.toString.endsWith(ext)).count()
        finally s.close()
      }
      val rows = spark.read.format(if (fmt == "csv") "csv" else if (fmt == "parquet") "parquet" else "json")
        .option("header", "true").load(path).count()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, "_manifest.json"),
        s"""{"format":"$fmt","rows":$rows,"shards":$shards""" +
          shardRows.map(n => s""","shard_rows":$n""").getOrElse("") + "}")
      import spark.implicits._
      Seq((path, fmt, rows, shards)).toDF("path", "format", "n_rows", "n_shards")
    case MergeStmt(name, tAliasOpt, srcName, srcSub, sAliasOpt, onCond, setList, bySourceDelete) =>
      // MERGE INTO <table> [t] USING <src> [s] ON cond
      // WHEN MATCHED THEN UPDATE SET … WHEN NOT MATCHED THEN INSERT *
      // [WHEN NOT MATCHED BY SOURCE THEN DELETE] — the upsert verb (the
      // last clause makes it a full sync); the source side routes
      // through run() so views, warehouse tables, and base tables all
      // work as USING sources
      require(warehouse.exists(name), s"table $name does not exist")
      val tAlias = Option(tAliasOpt).getOrElse(name)
      val source = if (srcName != null) run(s"SELECT * FROM $srcName") else run(srcSub)
      val sAlias = Option(sAliasOpt).getOrElse(if (srcName != null) srcName else "s")
      val sets = splitTop(setList, ',').map { a =>
        val kv = a.split("=", 2)
        require(kv.length == 2, s"bad assignment: $a")
        val lhs = kv(0).trim
        (if (lhs.toLowerCase.startsWith(s"${tAlias.toLowerCase}."))
          lhs.substring(tAlias.length + 1) else lhs) -> kv(1).trim
      }
      warehouse.merge(name, tAlias, source, sAlias, onCond, sets,
        deleteUnmatchedTarget = bySourceDelete != null)
      ok(s"merged into $name")

    case UpdateFromStmt(name, assigns, srcSub, sAlias, where)
        if !name.equalsIgnoreCase("AGENT") && cleanSetList(assigns) =>
      // UPDATE <tbl> SET a = df.x, … FROM (<subquery>) AS df WHERE <match
      // cond> (test_update_from_select — the subquery may join a model;
      // the model-aware route handles that). Matched rows take the SETs,
      // others pass through — MERGE's matched side without the insert side.
      require(warehouse.exists(name), s"table $name does not exist")
      val source = modelAwareRun(srcSub)
      val sets = splitTop(assigns, ',').map { a =>
        val kv = a.split("=", 2)
        require(kv.length == 2, s"bad assignment: $a")
        val lhs = kv(0).trim
        (if (lhs.toLowerCase.startsWith(s"${name.toLowerCase}."))
          lhs.substring(name.length + 1) else lhs) -> kv(1).trim
      }
      warehouse.updateFrom(name, name, source, sAlias, where, sets)
      ok(s"updated $name")

    case UpdateStmt(name, assigns, where)
        if !name.equalsIgnoreCase("AGENT") && catalog.kb(name).isDefined =>
      // UPDATE <kb> SET … WHERE cond — chunk-level update; updating
      // `content` re-embeds it, exactly the reference's update_query
      // (controller.py:580-608 adds the embeddings column when content
      // is among the update columns)
      val k = catalog.kb(name).get
      require(warehouse.exists(k.storage),
        s"knowledge base $name has no ingested data")
      val m0 = splitTop(assigns, ',').map { a =>
        val kv = a.split("=", 2)
        require(kv.length == 2, s"bad assignment: $a")
        kv(0).trim -> expr(kv(1).trim)
      }.toMap
      val m = m0.get("content").fold(m0)(c => m0 + ("emb" -> graft.kb.Kb.embed(c)))
      warehouse.update(k.storage, m, expr(where))
      ok(s"updated knowledge base $name")
    case UpdateStmt(name, assigns, where) if !name.equalsIgnoreCase("AGENT") =>
      // UPDATE <warehouse table> SET a = e, … WHERE cond (update_step.py)
      require(warehouse.exists(name), s"table $name does not exist")
      val m = splitTop(assigns, ',').map { a =>
        val kv = a.split("=", 2)
        require(kv.length == 2, s"bad assignment: $a")
        kv(0).trim -> expr(kv(1).trim)
      }.toMap
      // MySQL affected-rows contract: the count of rows matching the
      // predicate — a column-pruned scan of the predicate columns only
      val affected = warehouse.table(name).filter(expr(where)).count()
      warehouse.update(name, m, expr(where))
      ok(s"updated $name", affected)
    case UpdateNoWhere(name, assigns)
        if !Set("AGENT", "SKILL", "CHATBOT", "MODEL").contains(name.toUpperCase) &&
          warehouse.exists(name) =>
      // WHERE-less UPDATE touches every row (MySQL semantics,
      // test_affected_rows updates the whole table)
      val m = splitTop(assigns, ',').map { a =>
        val kv = a.split("=", 2)
        require(kv.length == 2, s"bad assignment: $a")
        kv(0).trim -> expr(kv(1).trim)
      }.toMap
      val affected = tableRows(name)
      warehouse.update(name, m, lit(true))
      ok(s"updated $name", affected)
    case DeleteStmt(name, where) => catalog.kb(name) match {
      case Some(k) =>
        // DELETE FROM <kb> [WHERE cond] — chunk-level delete against the
        // KB storage (controller.py:622 delete_query; bare DELETE is
        // clear(), :640); predicates address chunk metadata columns
        require(warehouse.exists(k.storage),
          s"knowledge base $name has no ingested data")
        warehouse.delete(k.storage, Option(where).map(expr).getOrElse(lit(true)))
        ok(s"deleted from knowledge base $name")
      case None =>
        // DELETE FROM <warehouse table> [WHERE cond] (delete_step.py);
        // affected = before − after, two footer-metadata counts
        require(warehouse.exists(name), s"table $name does not exist")
        val before = tableRows(name)
        warehouse.delete(name, Option(where).map(expr).getOrElse(lit(true)))
        ok(s"deleted from $name", before - tableRows(name))
    }

    // dynamic partition overwrite (Hive/Delta partitionOverwriteMode=
    // dynamic): replaces exactly the partitions the query produces
    case InsertOverwriteStmt(name, body) =>
      require(warehouse.exists(name), s"table $name does not exist")
      warehouse.insertOverwritePartitions(name, run(stripParens(body)))
      ok(s"overwrote partitions of $name")

    case InsertStmt(name, colList, body) => catalog.kb(name) match {
      case Some(k) =>
        // INSERT INTO <kb> [(id, content, meta…)] SELECT|VALUES … =
        // chunk + embed ingest (controller.py:680-740); a column list
        // names the VALUES columns — `content` is the content column and
        // everything else rides along as metadata
        // (test_select_allowed_columns inserts ad-hoc metadata this way)
        val src0a =
          if (colList != null)
            run(s"SELECT * FROM (${stripParens(body)}) AS __ins($colList)")
          else run(stripParens(body))
        // source column names map case-insensitively (the reference
        // lowercases identifiers; test_kb_uppercase_source_columns
        // ingests SELECT ID, CONTENT …)
        val src0 = src0a.toDF(src0a.columns.map(_.toLowerCase): _*)
        // reference insert contract: `id` names the document, `content`
        // the text, anything else is metadata; the chunker keys on
        // doc_id and derives its own `content`, so both get mapped
        val src1 =
          if (src0.columns.contains("doc_id")) src0
          else if (src0.columns.contains("id"))
            src0.withColumnRenamed("id", "doc_id")
          else {
            // no id at all: the reference derives a deterministic 16-char
            // md5-of-content document id (knowledge_base/utils.py
            // generate_document_id) — same content, same id, idempotent
            val cc = k.params.getOrElse("content_columns",
              if (src0.columns.contains("content")) "content" else "text")
            src0.withColumn("doc_id",
              expr(s"substring(md5(cast($cc AS STRING)), 1, 16)"))
          }
        val cc0 = k.params.get("content_columns") match {
          // the generic `content` name always works on insert even when
          // the KB declares another content column (the reference's
          // _adapt_column_names maps it, controller.py:758)
          case Some(cc) if src1.columns.contains(cc) => cc
          case Some(_) if src1.columns.contains("content") => "content"
          case Some(cc) => cc // fail loudly downstream with the real name
          case None =>
            if (src1.columns.contains("content")) "content" else "text"
        }
        val (src, contentCol) =
          if (cc0 == "content")
            (src1.withColumnRenamed("content", "__kb_content_src"), "__kb_content_src")
          else (src1, cc0)
        // preprocessor selection (preprocessing_config — text chunking is
        // the default; contextual and JSON chunkers opt in per KB)
        val chunked = k.params.get("preprocessor") match {
          case Some("contextual") => Kb.contextualChunk(src, contentCol)
          case Some("json") => Kb.chunkJson(src, contentCol)
          case _ => Kb.chunk(src, contentCol)
        }
        // embedding provider: `embedding_model = {'provider': 'byom'}`
        // routes every chunk through the out-of-process worker (one
        // sidecar per partition); anything else embeds with the in-JVM
        // deterministic stand-in. The PROVIDER key decides — a model
        // NAME merely containing "byom" under another provider must not
        // fork workers.
        val chunks =
          if (k.params.get("embedding_model").exists(m =>
              catalog.parseModelDict(m).get("provider")
                .exists(_.equalsIgnoreCase("byom"))))
            Kb.embedThroughWorker(chunked)
          else chunked.withColumn("emb", Kb.embed(col("content")))
        val toWrite =
          if (warehouse.exists(k.storage) &&
              k.params.get("kb_skip_existing").exists(_.toBoolean))
            Kb.skipExisting(chunks, warehouse.table(k.storage))
          else chunks
        // an indexed KB keeps its IVF cell layout across ingests: new
        // chunks are assigned to the existing centroids on the way in
        val withCells =
          if (warehouse.exists(s"${k.storage}_cents"))
            Kb.ivfAssign(toWrite, warehouse.table(s"${k.storage}_cents"))
          else toWrite
        if (warehouse.exists(k.storage)) {
          // default re-ingest contract (test_duplicated_ids): an id that
          // already exists REPLACES all its stored chunks — drop them
          // with one anti-join delete before the append. kb_skip_existing
          // inverts the preference (stored wins) and already filtered the
          // incoming side above, so nothing to drop here.
          if (!k.params.get("kb_skip_existing").exists(_.toBoolean)) {
            // materialize the chunk/embedding plan ONCE (it is reused for
            // the overlap probe and the append), and skip the
            // copy-on-write rewrite entirely when no incoming doc_id is
            // already stored — the common append-only ingest path
            val cells = withCells.localCheckpoint()
            val overlaps = !warehouse.table(k.storage).select("doc_id")
              .join(cells.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
              .isEmpty
            if (overlaps)
              warehouse.deleteMatching(k.storage, cells.select("doc_id"), "doc_id")
            warehouse.insertInto(k.storage, cells)
          } else warehouse.insertInto(k.storage, withCells)
        } else warehouse.createTableAs(k.storage, withCells)
        // index-build-time corpus stats: one aggregation per ingest, so
        // BM25 search never pays a full-corpus scan per query
        catalog.setKbStats(name, Kb.corpusStats(warehouse.table(k.storage)))
        ok(s"ingested into knowledge base $name")
      case None =>
        require(warehouse.exists(name), s"table $name does not exist")
        val df =
          if (colList != null)
            run(s"SELECT * FROM (${stripParens(body)}) AS __ins($colList)")
          else run(stripParens(body))
        val before = tableRows(name)
        warehouse.insertInto(name, df)
        ok(s"inserted into $name", tableRows(name) - before)
    }

    case ShowStmt(what, fromDb, like, whereTail) =>
      val likeFilter: DataFrame => DataFrame = df => {
        val liked = Option(like).fold(df)(p => df.filter(
          col(df.columns.head).rlike(likeToRegex(p))))
        Option(whereTail).fold(liked)(w => liked.filter(expr(w)))
      }
      // each SHOW returns its meta-table schema (mindsdb_tables.py:42-430),
      // not an ad-hoc one-column list
      likeFilter(what.toUpperCase.replace('_', ' ').replaceAll("\\s+", " ") match {
        // SHOW TABLES FROM <db> scopes to THAT database's tables (MySQL
        // semantics; the reference routes through the named datanode's
        // get_tables) — listed from the registered DSv2 catalog across
        // its namespaces, so federated sources answer their own content.
        // The virtual namespaces answer their OWN content (files = the
        // uploaded-file storage area; log = the reference's two log
        // tables, interfaces/database/log.py:85,148); an unregistered
        // name errors like MySQL/the reference datanode route — it must
        // never fall through to the global listing.
        case "TABLES" if fromDb != null =>
          val d = fromDb.toLowerCase
          if (d == "graft" || d == "mindsdb") catalog.showTables(Some(warehouse))
          else if (d == "files") {
            val dirPath = java.nio.file.Paths.get(s"${warehouse.dir}/.files")
            val names =
              if (!java.nio.file.Files.isDirectory(dirPath)) Seq.empty[String]
              else {
                val s = java.nio.file.Files.list(dirPath)
                try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path]
                  .getFileName.toString)
                  .map(fn => fn.stripSuffix(
                    fn.split('.').lastOption.fold("")("." + _)))
                finally s.close()
              }
            kv("table_name", "table_type",
              names.distinct.sorted.map(_ -> "BASE TABLE"))
          } else if (d == "log")
            kv("table_name", "table_type",
              Seq("jobs_history" -> "BASE TABLE", "llm_log" -> "BASE TABLE"))
          else if (catalog.listDatabases().contains(d))
            catalog.showDbTables(fromDb)
          else throw new NoSuchElementException(s"Unknown database $fromDb")
        case "TABLES" => catalog.showTables(Some(warehouse))
        case "VIEWS" => catalog.metaViews()
        case "MATERIALIZED VIEWS" => kv("name", "type",
          mvs.list().map(_ -> "materialized"))
        case "MODELS" => catalog.metaModels()
        case "JOBS" => catalog.metaJobs(jobs)
        case "DATABASES" | "SCHEMAS" => catalog.metaDatabases()
        case "PROJECTS" => catalog.metaProjects()
        case "KNOWLEDGE BASES" => catalog.metaKnowledgeBases()
        case "AGENTS" => catalog.metaAgents()
        case "SKILLS" => catalog.metaSkills()
        case "TRIGGERS" => catalog.metaTriggers()
        case "VARIABLES" => kv("variable_name", "value", vars.toSeq)
        case "STATUS" => kv("variable_name", "value",
          // the variables BI clients and JDBC connectors actually probe
          // (SHOW [GLOBAL|SESSION] STATUS [LIKE …]); values are honest
          // constants for a single-process engine
          Seq("Uptime" -> "0", "Threads_connected" -> "1",
            "Threads_running" -> "1", "Queries" -> "0",
            "Questions" -> "0", "Slow_queries" -> "0",
            "Opened_tables" -> "0", "Open_tables" -> "0",
            "Flush_commands" -> "1", "Max_used_connections" -> "1",
            "Ssl_cipher" -> "", "Ssl_version" -> "",
            "Com_select" -> "0", "Connections" -> "1"))
        case "ENGINES" => kv("engine", "support",
          Seq("graft-spark" -> "DEFAULT"))
        case "CHATBOTS" => catalog.metaChatbots()
        case "ML ENGINES" => catalog.metaMlEngines()
        case "HANDLERS" => kv("name", "type",
          Seq("byom" -> "ml", "fit" -> "ml", "files" -> "data",
            "mem" -> "data"))
        case "TABLE STATUS" => kv("name", "engine",
          catalog.showTables(Some(warehouse)).collect()
            .map(r => r.getString(0) -> "parquet").toSeq)
        case "CHARACTER SET" | "CHARSET" => kv("charset", "default_collation",
          Seq("binary" -> "binary", "utf8mb4" -> "utf8mb4_general_ci"))
        case "COLLATION" => kv("collation", "charset",
          Seq("binary" -> "binary", "utf8mb4_general_ci" -> "utf8mb4"))
        case "WARNINGS" => kv("level", "message", Nil)
        // stored routines: none exist — empty frames with the MySQL shape
        case "FUNCTION STATUS" | "PROCEDURE STATUS" => kv("db", "name", Nil)
        case "PROCESSLIST" =>
          // the MySQL-proxy processlist over the same statement log that
          // backs mindsdb.queries and KILL (mysql proxy answers SHOW
          // [FULL] PROCESSLIST; mindsdb_tables.py:430)
          val rows = queryLog.synchronized {
            queryLog.values.toSeq.map(r => Row(
              r.id, "mindsdb", "localhost", "mindsdb", r.kind,
              ((Option(r.finishedAt).map(_.getTime)
                .getOrElse(System.currentTimeMillis()) -
                r.startedAt.getTime) / 1000).toInt,
              r.state, r.statement.take(100)))
          }
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            StructType(Seq(
              StructField("Id", LongType), StructField("User", StringType),
              StructField("Host", StringType), StructField("db", StringType),
              StructField("Command", StringType), StructField("Time", IntegerType),
              StructField("State", StringType), StructField("Info", StringType))))
      })
    case ShowKeys(name) =>
      // SHOW KEYS/INDEX FROM t (reference test_mysql_queries: clients
      // issue it against meta tables) — rows only for layouts that carry
      // an index-like structure (bucket spec); plain tables answer empty
      val rows = warehouse.bucketSpec(name) match {
        case Some((cols, n)) => cols.zipWithIndex.map { case (c0, i) =>
          Row(name, 1, s"bucket_$n", i + 1, c0, null)
        }
        case None => Seq.empty[Row]
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("table", StringType), StructField("non_unique", IntegerType),
          StructField("key_name", StringType), StructField("seq_in_index", IntegerType),
          StructField("column_name", StringType), StructField("cardinality", LongType))))
    case ShowColumns(name) =>
      val fields = catalog.resolve(name, Some(warehouse)).schema.fields
      spark.createDataFrame(
        spark.sparkContext.parallelize(fields.toSeq.map(f =>
          Row(f.name, f.dataType.sql, if (f.nullable) "YES" else "NO", "", null, "")), 1),
        StructType(Seq(
          StructField("field", StringType), StructField("type", StringType),
          StructField("null", StringType), StructField("key", StringType),
          StructField("default", StringType), StructField("extra", StringType))))
    case ShowCreate(name) =>
      // SHOW CREATE TABLE: reproducible DDL rendered from the physical
      // layout — schema (evolution log applied), hive partition column,
      // bucket spec; non-warehouse relations fall back to schema-only.
      val bs = warehouse.bucketSpec(name)
      require(warehouse.exists(name) || bs.isDefined ||
        (try { catalog.resolve(name, Some(warehouse)); true }
         catch { case _: Exception => false }), s"table $name does not exist")
      val schema =
        if (bs.isDefined) warehouse.bucketedTable(spark, name).schema
        else if (warehouse.exists(name)) warehouse.table(name).schema
        else catalog.resolve(name, Some(warehouse)).schema
      val ddl = schema.fields.map(f => s"  `${f.name}` ${f.dataType.sql}").mkString(",\n")
      val pc = if (bs.isDefined || !warehouse.exists(name)) None
        else warehouse.partitionColumn(name)
      val stmt = s"CREATE TABLE `$name` (\n$ddl\n)" +
        pc.map(p => s"\nPARTITIONED BY (`$p`)").getOrElse("") +
        bs.map { case (cs, n) =>
          s"\nCLUSTERED BY (${cs.map(c => s"`$c`").mkString(", ")}) INTO $n BUCKETS"
        }.getOrElse("")
      kv("tbl", "create_stmt", Seq(name -> stmt))

    case DescribeModel(name, versionO, attrO)
        if catalog.listModels().contains(name.toLowerCase) =>
      // DESCRIBE [MODEL] [project.]name[.version][.attribute] — attribute
      // access per the reference's describe_model (command_executor.py:
      // 931-966, model_controller.describe_model): info / features / model
      val m = Option(versionO).fold(catalog.model(name))(v => catalog.model(name, v.toInt))
      def two(rows: Seq[(String, String)]): DataFrame = kv("part", "value", rows)
      Option(attrO).map(_.toLowerCase) match {
        case None => catalog.metaModels().filter(col("name") === name)
        case Some("info") => two(Seq(
          "name" -> name,
          "engine" -> (m match {
            case _: graft.ml.NaiveBayes.NbModel => "naive_bayes"
            case _: graft.ml.KMeans.KmModel => "kmeans"
            case ts: graft.ml.TimeSeries.TsModel => ts.engine
            case _: graft.ml.Anomaly.AnomalyModel => "anomaly"
            case _ => "fit"
          }),
          "active_version" -> catalog.activeVersion(name).toString,
          "n_versions" -> catalog.modelVersions(name).length.toString,
          "predict" -> m.outputSchema.fields.map(_.name).mkString(",")))
        case Some("features") => kv("column_name", "role",
          m.featureCols.map(_ -> "feature") ++
            m.outputSchema.fields.map(_.name -> "target"))
        case Some("model") => m match {
          case lm: LinearModel => two(
            lm.featureCols.zip(lm.weights).map { case (f, w) => s"weight_$f" -> w.toString } :+
              ("bias" -> lm.bias.toString))
          case nb: graft.ml.NaiveBayes.NbModel => two(Seq(
            "classes" -> nb.priorRows.map(_.getString(0)).sorted.mkString(","),
            "vocab_terms" -> nb.llRows.map(_.getString(1)).distinct.length.toString,
            "text_column" -> nb.textCol))
          case km: graft.ml.KMeans.KmModel => two(Seq(
            "k" -> km.centRows.length.toString,
            "dims" -> km.centRows.headOption
              .map(_.getSeq[Long](1).length.toString).getOrElse("0"),
            "vector_column" -> km.vecCol))
          case ts: graft.ml.TimeSeries.TsModel => two(Seq(
            "engine" -> ts.engine,
            "order_by" -> ts.tsCol,
            "group_by" -> ts.groupCol.getOrElse(""),
            "window" -> ts.window.toString,
            "horizon" -> ts.horizon.toString))
          case an: graft.ml.Anomaly.AnomalyModel => two(Seq(
            "feature" -> an.featureCol,
            "group_by" -> an.groupCol.getOrElse(""),
            "threshold" -> an.threshold.toString,
            "n_groups" -> an.stats.length.toString))
          case other => two(Seq("engine_model" -> other.getClass.getSimpleName))
        }
        case Some(a) =>
          throw new IllegalArgumentException(s"unknown describe attribute: $a")
      }
    case DescribeHistory(name) =>
      // version history, newest first (DESCRIBE HISTORY, Delta-style)
      val cur = warehouse.currentVersion(name)
      val rows = (Seq(cur -> "current") ++
        warehouse.versions(name).reverse.map(_ -> "snapshot"))
        .map { case (v, kind) => Row(v.toLong, kind) }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("version", org.apache.spark.sql.types.LongType),
          StructField("kind", StringType))))
    case OptimizeZorderStmt(name, colList, filesO) =>
      val (before, after) = warehouse.optimizeZorder(name,
        colList.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        Option(filesO).map(_.toInt).getOrElse(8))
      ok(s"zordered $name: $before -> $after files")
    case OptimizeStmt(name, filesO) =>
      val (before, after) =
        warehouse.optimize(name, Option(filesO).map(_.toInt).getOrElse(1))
      ok(s"optimized $name: $before -> $after files")
    case VacuumStmt(name, retainO) =>
      val dropped = warehouse.vacuum(name, Option(retainO).map(_.toInt).getOrElse(0))
      ok(s"vacuumed $name: $dropped snapshot(s) removed")
    case DescribeKb(name) =>
      // DESCRIBE KNOWLEDGE_BASE (kb_controller describe): params plus
      // the ingest-time corpus stats and storage location
      val k = catalog.kb(name).getOrElse(
        throw new NoSuchElementException(s"knowledge base $name does not exist"))
      val base = Seq(
        "name" -> k.name, "storage_table" -> k.storage,
        "n_chunks" -> k.stats.map(_._1.toString).getOrElse("0"),
        "avg_chunk_len" -> k.stats.map(s => f"${s._2}%.2f").getOrElse("0"))
      kv("param", "value", base ++ k.params.toSeq.sortBy(_._1))

    case DescribeAgent(name) =>
      val a = catalog.agent(name).getOrElse(
        throw new NoSuchElementException(s"agent $name does not exist"))
      kv("param", "value",
        Seq("name" -> a.name, "model" -> a.model) ++ a.params.toSeq.sortBy(_._1))

    case DescribeDatabase(name) =>
      // connection card (params masked like every meta-table) + for a
      // passthrough-capable datasource, the canonical live probe outcome
      // (passthrough.py test_passthrough surfaced through DESCRIBE)
      val db = catalog.database(name).getOrElse(
        throw new NoSuchElementException(s"database $name does not exist"))
      val pt =
        if (!graft.server.Passthrough.supports(db.params)) Nil
        else {
          val t = graft.server.Passthrough.test(db.params)
          Seq("passthrough_ok" ->
              t.fields.get("ok").map(graft.server.Json.write).getOrElse("false"),
            "passthrough_test" -> graft.server.Json.write(t))
        }
      kv("param", "value",
        Seq("name" -> db.name, "engine" -> db.engine) ++
          catalog.maskedParams(db.params) ++ pt)

    case DescribeStmt(name) => catalog.describe(name, Some(warehouse))
    case AnalyzeStmt(name) if name.contains(".") =>
      // qualified name = usually a remote table behind a registered JDBC
      // catalog (`rdb.APP.SUPPLIER`): one pushed COUNT records
      // rowCount/size in the DSv2 stats registry so broadcast/build-side
      // selection sees the remote table's real cardinality instead of
      // defaultSizeInBytes (GraftJdbcStats.Attach). A qualified name
      // that is NOT JDBC-backed (or not resolvable as a Spark table at
      // all) falls back to the data-catalog ANALYZE path instead of
      // erroring — dotted names are legal for warehouse tables too.
      val remote =
        try org.apache.spark.sql.execution.datasources.v2.jdbc.GraftJdbcStats
          .analyze(spark.table(name))
        catch { case _: Exception => None }
      remote match {
        case Some(n) =>
          kv("param", "value", Seq("table" -> name, "row_count" -> n.toString))
        case None => catalog.analyzeTable(name, Some(warehouse))
      }
    case AnalyzeStmt(name) =>
      // data-catalog statistics (interfaces/data_catalog/, base.py:178-341):
      // one exact aggregation pass, stored on the catalog, queryable via
      // information_schema.column_statistics
      catalog.analyzeTable(name, Some(warehouse))
    case ExplainStmt(body) =>
      // EXPLAIN (command_executor.py EXPLAIN dispatch): the optimized +
      // physical plan as a one-row frame
      val qe = run(body).queryExecution
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(qe.optimizedPlan.toString,
          qe.executedPlan.toString)), 1),
        StructType(Seq(StructField("optimized_plan", StringType),
          StructField("physical_plan", StringType))))
    case SysVarQuery(list) =>
      // `SELECT @@var [AS alias], …` — the reference's mysql proxy
      // answers these from its server-variable table (mysql_proxy.py
      // SERVER_VARIABLES); SET overlays are visible. Unknown vars → NULL,
      // as MySQL does for unrecognized session vars.
      val items = splitTop(list, ',').map { item =>
        val parts = item.split("(?i)\\s+AS\\s+", 2).map(_.trim)
        // `@@session.x` / `@@global.x` address the same variable table
        // (reference SERVER_VARIABLES lists both spellings)
        val name = parts(0).stripPrefix("@@").toLowerCase
          .stripPrefix("session.").stripPrefix("global.")
        val alias = if (parts.length == 2) parts(1) else parts(0)
        (alias, vars.get(name).orNull)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(items.map(_._2): _*)), 1),
        StructType(items.map(i => StructField(i._1, StringType))))
    case UserVarQuery(list) =>
      // `SELECT @var [AS alias], …` — user variables set with SET @var
      // (interfaces/variables/variables_controller.py); unset → NULL
      val items = splitTop(list, ',').map { item =>
        val parts = item.split("(?i)\\s+AS\\s+", 2).map(_.trim)
        val name = parts(0).stripPrefix("@")
        val alias = if (parts.length == 2) parts(1) else parts(0)
        (alias, userVars.get(name.toLowerCase).orNull)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(items.map(_._2): _*)), 1),
        StructType(items.map(i => StructField(i._1, StringType))))
    case PrepareStmt(name, body) =>
      prepared(name) = body
      ok(s"statement $name prepared")
    case ExecuteStmt(name, argsStr) =>
      val body = prepared.getOrElse(name,
        throw new NoSuchElementException(s"no prepared statement $name"))
      registerRelations()
      val args = Option(argsStr)
        .map(splitTop(_, ',').map(parseLiteral))
        .getOrElse(Seq.empty)
      spark.sql(body, args.toArray[Any])
    case DeallocateStmt(name) =>
      if (prepared.remove(name).isEmpty)
        throw new NoSuchElementException(s"no prepared statement $name")
      ok(s"statement $name deallocated")

    case NativeFromQuery(sel, db, inner, aliasO, restO)
        if catalog.database(db).isDefined && parenBalanced(inner) &&
          parenBalanced(sel) =>
      // raw-SQL passthrough: the inner statement executes VERBATIM in the
      // bound engine (live JDBC for derby/jdbc, the isolated-session
      // stand-in for mem) and only its result enters the Spark plan —
      // exactly the reference's `SELECT … FROM pg (select …)` route
      val result = runNativeQuery(db, inner)
      val tv = Option(aliasO).getOrElse(
        "__native_" + Integer.toHexString(sql.hashCode))
      result.createOrReplaceTempView(tv)
      spark.sql(s"SELECT $sel FROM $tv ${Option(restO).getOrElse("")}")

    case sel if nativeSubqueryAt(sel).isDefined =>
      // a native call NESTED inside a larger statement (reference
      // test_subselect_1row_aggregate: `select count(*) from (select *
      // from pg (select …))`): execute each `db (inner)` occurrence
      // verbatim in its engine, splice the registered result view into
      // the text, and dispatch the rewritten statement normally
      dispatch(rewriteNativeSubqueries(sel))

    case SetMulti(assignments) if splitAssignments(assignments).length > 1 =>
      // multi-assignment SET (reference test_multy_set:
      // `set @@var = ON, session var = 0`) — each comma-separated
      // assignment routes through the single-SET path, SESSION scope
      // keyword and all
      val parts = splitAssignments(assignments)
      parts.foreach(p => execute(s"SET ${p.trim}"))
      ok(s"set ${parts.length} variables")

    case SetNames(cs) =>
      // SET NAMES <charset> [COLLATE …]: the client-charset triple moves
      // together (MySQL semantics; issued by every connector after the
      // handshake and by the wire server's charset negotiation)
      Seq("character_set_client", "character_set_connection",
        "character_set_results").foreach(k => vars(k) = cs.toLowerCase)
      ok(s"set names ${cs.toLowerCase}")

    case SetStmt(prefix, key, value) =>
      // SET: `@var` = user variables (variables_controller), bare or
      // `@@var` = server variables recorded for SHOW VARIABLES and passed
      // through to the session conf
      val v = value.stripPrefix("'").stripSuffix("'")
      if (prefix == "@") userVars(key.toLowerCase) = v
      else {
        vars(key.toLowerCase) = v; spark.conf.set(key, v)
        // `SET show_secrets = true` reveals credential values in every
        // meta-table (test_hide_secrets)
        if (key.equalsIgnoreCase("show_secrets"))
          catalog.showSecrets = v.toBoolean
      }
      ok(s"set $prefix$key")
    case UseStmt(db) =>
      // USE: single-namespace engine — accepted for wire compatibility
      ok(s"using $db")

    case KillStmt(id) =>
      // KILL [QUERY] <id>: cancel the statement's tagged job group (the
      // reference serves KILL via its MySQL proxy over the running-
      // queries table, mindsdb_tables.py:430)
      if (kill(id.toLong)) ok(s"query $id killed")
      else ok(s"query $id is not running")

    case AskChatbot(bot, message, sessionO) =>
      // ASK <bot> '<message>' [SESSION '<id>'] — the chat turn flow the
      // reference runs off a polled channel (chatbot_task replays the
      // conversation to the agent; ChatBotsHistory persists turns).
      // Multi-turn memory is REAL: the last 3 turns stitch into the
      // completion prompt, so the same question answers differently in
      // different conversation states — observable with the
      // deterministic stub, same contract for a live model.
      val cb = catalog.chatbot(bot).getOrElse(
        throw new NoSuchElementException(s"chatbot $bot does not exist"))
      require(cb.isRunning, s"chatbot $bot is not running")
      val session = Option(sessionO).getOrElse("default")
      val history = catalog.chatHistory(bot, session)
      val turn = catalog.appendChat(bot, session, "user", message)
      val ctx = history.takeRight(3).map(_._3).mkString(" | ")
      val prompt = if (ctx.isEmpty) message else s"$ctx || $message"
      val answer = {
        import spark.implicits._
        Seq(prompt).toDF("prompt")
          .select(graft.functions.AiFunctions.llm(col("prompt")).as("answer"))
          .first().getString(0)
      }
      catalog.appendChat(bot, session, "assistant", answer)
      import spark.implicits._
      Seq((bot, session, turn, answer)).toDF("chatbot", "session", "turn", "answer")

    case LogChatHistoryQuery(sel, rest) =>
      // `SELECT … FROM log.chatbot_history` — the queryable turn log
      // (db.py ChatBotsHistory)
      val rows = catalog.allChatHistory()
        .map { case (b, s2, t, r, c) => Row(b, s2, t, r, c) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("chatbot", StringType, nullable = false),
          StructField("session", StringType, nullable = false),
          StructField("turn", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("role", StringType, nullable = false),
          StructField("content", StringType, nullable = false))))
      val ctv = "__chatbot_history"
      df.createOrReplaceTempView(ctv)
      spark.sql(s"SELECT $sel FROM $ctv ${Option(rest).getOrElse("")}")

    case LogHistoryQuery(sel, rest) =>
      // `SELECT … FROM log.jobs_history` (jobs_controller.py:330-353):
      // per-run rows from the scheduler's history buffer
      val rows = jobs.history.map(r => Row(r.job,
        java.sql.Timestamp.from(r.at), r.ok, r.error.orNull)).toSeq
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("run_at", org.apache.spark.sql.types.TimestampType, nullable = false),
          StructField("ok", org.apache.spark.sql.types.BooleanType, nullable = false),
          StructField("error", StringType))))
      val tv = "__jobs_history"
      df.createOrReplaceTempView(tv)
      spark.sql(s"SELECT $sel FROM $tv ${Option(rest).getOrElse("")}")

    case LogQueriesQuery(sel, rest) =>
      // `SELECT … FROM log.queries` (QUERIES meta table,
      // mindsdb_tables.py:430): the session's executed-statement log,
      // completed statements only (so the running query never lists
      // itself — `mindsdb.queries` is the live processlist view).
      val rows = queryLog.synchronized {
        queryLog.values.filter(_.state != "running")
          .map(r => Row(r.id, r.kind, r.statement, r.state, r.error)).toSeq
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("query_id", org.apache.spark.sql.types.LongType, nullable = false),
          StructField("kind", StringType, nullable = false),
          StructField("statement", StringType, nullable = false),
          StructField("status", StringType, nullable = false),
          StructField("error", StringType))))
      val tv = "__query_log"
      df.createOrReplaceTempView(tv)
      spark.sql(s"SELECT $sel FROM $tv ${Option(rest).getOrElse("")}")

    case LastCoalesceQuery(sel, table, tsCol, default, rest) =>
      // `WHERE <ts> > COALESCE(LAST, <default>)` — the reference's
      // coalesce override (test_last_coalesce): the FIRST run filters
      // past the given default (it returns rows immediately instead of
      // initializing to current-max), then the watermark advances from
      // results exactly like plain LAST
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(sql.trim.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val inc = watermarks.applyLastDefault(
        catalog.resolve(table, Some(warehouse)), tsCol, key,
        firstRun = _.filter(expr(s"$tsCol > $default"))).localCheckpoint()
      val tv = s"__lastc_$key"
      inc.createOrReplaceTempView(tv)
      val out = spark.sql(s"SELECT $sel FROM $tv ${Option(rest).getOrElse("")}")
      watermarks.advance(inc, tsCol, key)
      out

    case LastQuery(sel, table, tsCol, rest) =>
      // incremental `WHERE <ts> > LAST` (context_controller.py:293-344):
      // first sight of a query initializes the watermark to the current
      // max and yields the empty increment; later runs read strictly past
      // the stored value and advance it. The context key is the
      // normalized statement text, so each distinct query keeps its own
      // watermark — the reference keys its query context the same way.
      // Works inside CREATE JOB bodies (the job tick routes through
      // executeScript → execute), which is the reference's primary use.
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(sql.trim.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      // materialize the increment ONCE (eager localCheckpoint): the
      // advance below and the caller's later consumption then see the
      // SAME snapshot — advancing from the lazy plan would re-scan, and
      // rows landing between advance and consumption would be delivered
      // twice (the reference advances via a result callback)
      val inc = watermarks.applyLast(
        catalog.resolve(table, Some(warehouse)), tsCol, key).localCheckpoint()
      val tv = s"__last_$key"
      inc.createOrReplaceTempView(tv)
      val out = spark.sql(s"SELECT $sel FROM $tv ${Option(rest).getOrElse("")}")
      watermarks.advance(inc, tsCol, key)
      out

    case KbQuery(name, where, lim) if catalog.kb(name).isDefined =>
      // SELECT * FROM <kb> WHERE <condition tree> — full boolean algebra
      // plus relevance/hybrid/rerank params (executor.py:28-395,
      // controller.py:286-342), compiled by [[KbSql]]
      val k = catalog.kb(name).get
      val index = for {
        nprobe <- k.params.get("ivf_nprobe")
        if warehouse.exists(s"${k.storage}_cents")
      } yield (warehouse.table(s"${k.storage}_cents"), nprobe.toInt)
      KbSql.run(spark, warehouse.table(k.storage), where, Option(lim).map(_.toInt), index)

    case ObjQuery(sel, name, where) if catalog.listModels().contains(name.toLowerCase) =>
      // ApplyPredictorRowStep as SQL (steps.py:172): SELECT ... FROM
      // <model> WHERE feature = literal [AND ...] — predict one row from
      // the WHERE values
      val values = where.split("(?i)\\s+AND\\s+").map { a =>
        val kv = a.split("=", 2)
        require(kv.length == 2, s"model row query needs feature = value conditions, got: $a")
        kv(0).trim -> kv(1).trim.toDouble
      }.toMap
      val df = graft.ml.Predict.applyRow(spark, catalog.model(name), values)
      val tv = s"__model_row_$name"
      df.createOrReplaceTempView(tv)
      spark.sql(s"SELECT $sel FROM $tv")

    case ObjQuery(sel, name, where) if catalog.agent(name).isDefined =>
      // agent-as-table as SQL (sql_query.py:150-161): SELECT ... FROM
      // <agent> WHERE question = '...' completes the question
      // the literal accepts '' quote-doubling and backslash escapes
      // (the spellings HttpApi.sqlStr emits and MySQL clients send);
      // both unescape before the text reaches the completion
      val q = """(?is)\s*question\s*=\s*'((?:[^'\\]|\\.|'')*)'\s*""".r
      where match {
        case q(raw) =>
          val text = raw.replace("''", "'")
            .replaceAll("""\\(.)""", "$1")
          val questions = spark.range(1).select(lit(text).as("question"))
          // an agent linked to a knowledge base answers retrieval-
          // augmented (agents data={knowledge_bases:[…]}); others
          // complete directly
          val params = catalog.agent(name).get.params
          // skill dispatch (agent_skills association, db.py:423): a
          // text2sql skill answers from its table allowlist; a
          // knowledge_base skill (or the knowledge_bases param) answers
          // retrieval-augmented; no skill → plain completion
          val namedSkills = params.get("skills").toSeq
            .flatMap(_.split(",").map(_.trim)).flatMap(catalog.skill(_).toSeq)
          val textSkill = namedSkills.find(_.skillType == "text2sql")
          val kbLink = params.get("knowledge_bases")
            .flatMap(kbName => catalog.kb(kbName.split(",").head.trim))
            .orElse(namedSkills.find(_.skillType == "knowledge_base")
              .flatMap(sk => sk.params.get("source").flatMap(catalog.kb(_))))
          // ≥2 skills → ORDERED multi-skill dispatch in the declared
          // `skills=` order, first-capable-answers (agent_skills
          // association db.py:423 — one agent composes several skills)
          def asSkill(sk: graft.catalog.Catalog.SkillEntity): Option[graft.ml.Agents.AgentSkill] =
            sk.skillType match {
              case "text2sql" =>
                val allow = sk.params.get("tables").toSeq
                  .flatMap(_.split(",").map(_.trim)).filter(_.nonEmpty)
                Some(graft.ml.Agents.TextToSqlSkill(
                  allow.map(t => t -> catalog.resolve(t, Some(warehouse)))))
              case "knowledge_base" =>
                sk.params.get("source").flatMap(catalog.kb(_))
                  .filter(k => warehouse.exists(k.storage))
                  .map(k => graft.ml.Agents.KbSkill(warehouse.table(k.storage),
                    sk.params.get("relevance").map(_.toDouble).getOrElse(0.0)))
              case _ => None
            }
          val ordered = namedSkills.flatMap(asSkill(_).toSeq)
          // "new syntax" exposure allowlist (test_agent_new_syntax):
          // data={tables:[…]} exposes tables the same way a text2sql
          // skill's allowlist does — objects NOT listed stay invisible
          // to the agent (the reference answers "`x` not found" when the
          // LLM strays outside the exposed set)
          val dataTables = params.get("tables").toSeq
            .flatMap(_.split(",").map(_.trim)).filter(_.nonEmpty)
          val template = params.get("prompt_template")
          val df =
            if (ordered.size >= 2)
              graft.ml.Agents.answerMultiSkill(questions, "question", ordered)
            else (textSkill, kbLink) match {
              case (Some(sk), _) =>
                val allow = sk.params.get("tables").toSeq
                  .flatMap(_.split(",").map(_.trim)).filter(_.nonEmpty)
                graft.ml.Agents.answerTextToSql(questions, "question",
                  allow.map(t => t -> catalog.resolve(t, Some(warehouse))))
              case (_, Some(k)) if warehouse.exists(k.storage) && dataTables.nonEmpty =>
                // KB + table exposure on one agent: ordered dispatch,
                // retrieval first (the reference's planner explores the
                // exposed set in declared order)
                graft.ml.Agents.answerMultiSkill(questions, "question", Seq(
                  graft.ml.Agents.KbSkill(warehouse.table(k.storage)),
                  graft.ml.Agents.TextToSqlSkill(
                    dataTables.map(t => t -> catalog.resolve(t, Some(warehouse))))))
              case (_, Some(k)) if warehouse.exists(k.storage) =>
                graft.ml.Agents.answerWithKb(questions, "question",
                  warehouse.table(k.storage), promptTemplate = template)
              case _ if dataTables.nonEmpty =>
                graft.ml.Agents.answerTextToSql(questions, "question",
                  dataTables.map(t => t -> catalog.resolve(t, Some(warehouse))),
                  promptTemplate = template)
              case _ =>
                graft.ml.Agents.answer(questions, "question", promptTemplate = template)
            }
          val tv = s"__agent_$name"
          df.createOrReplaceTempView(tv)
          spark.sql(s"SELECT $sel FROM $tv")
        case _ => throw new IllegalArgumentException(
          s"agent query needs question = '...', got: $where")
      }

    case AsofJoinStmt(sel, lName, lAliasO, rName, rAliasO, onConds, rest) =>
      // SELECT … FROM l ASOF [LEFT] JOIN r ON l.k = r.k AND l.t >= r.t —
      // DuckDB-style ASOF spelling over [[graft.engine.TimeJoins]]. The
      // ON tree is equi conjuncts plus exactly one backward time
      // inequality; execution is the union/carry-forward plan (ONE
      // shuffle on the keys), never a range cross-product.
      val lAlias = Option(lAliasO).getOrElse(lName).toLowerCase
      val rAlias = Option(rAliasO).getOrElse(rName).toLowerCase
      val leftDf = run(s"SELECT * FROM $lName")
      val rightDf = run(s"SELECT * FROM $rName")
      def ref(x: String): (String, String) = x.split("\\.", 2) match {
        case Array(q, c) => (q.toLowerCase, c)
        case Array(c) => ("", c)
      }
      var keys = Seq.empty[(String, String)] // (left col, right col)
      var time: Option[(String, String)] = None // (left time, right time)
      onConds.split("(?i)\\s+AND\\s+").foreach {
        case AsofCond(a, op, b) =>
          val ((qa, ca), (qb, cb)) = (ref(a), ref(b))
          // orient the condition left-side-first; flip the operator if
          // it was written right-side-first (r.t <= l.t)
          val (lc, rc, o) =
            if (qa == lAlias && qb == rAlias) (ca, cb, op)
            else if (qa == rAlias && qb == lAlias)
              (cb, ca, op match { case ">=" => "<="; case "<=" => ">="; case e => e })
            else throw new IllegalArgumentException(
              s"ASOF JOIN ON condition must reference both sides, got: $a $op $b")
          o match {
            case "=" => keys :+= ((lc, rc))
            case ">=" =>
              require(time.isEmpty, "ASOF JOIN takes exactly one time inequality")
              time = Some((lc, rc))
            case "<=" => throw new IllegalArgumentException(
              "only backward ASOF (left.time >= right.time) is supported")
          }
        case other => throw new IllegalArgumentException(s"bad ASOF condition: $other")
      }
      require(keys.nonEmpty, "ASOF JOIN needs at least one equality key")
      val (leftTime, rightTime) = time.getOrElse(throw new IllegalArgumentException(
        "ASOF JOIN needs a time inequality (left.time >= right.time)"))
      // align right key names with the left's (TimeJoins keys are shared)
      val alignedRight = keys.foldLeft(rightDf) { case (df, (lc, rc)) =>
        if (lc == rc) df else df.withColumnRenamed(rc, lc)
      }
      val keyNames = keys.map(_._1)
      val payload = alignedRight.columns.toSeq.filterNot(keyNames.contains)
      val clash = payload.intersect(leftDf.columns.toSeq.filterNot(keyNames.contains))
      require(clash.isEmpty,
        s"ASOF JOIN payload columns collide with the left side: ${clash.mkString(", ")}")
      // deterministic tie-break at equal right times: the remaining right
      // columns, lexicographic (largest wins); right rows are expected
      // unique per (keys, time)
      val tieBreak = payload.filterNot(_ == rightTime).sorted
      val joined = graft.engine.TimeJoins.asofBackward(
        leftDf, alignedRight, keyNames, leftTime, rightTime, tieBreak, "")
      val tv = "__asof_join"
      joined.createOrReplaceTempView(tv)
      spark.sql(s"SELECT $sel FROM $tv ${Option(rest).getOrElse("")}")

    case ModelJoin(sel, tbl, sub, dataAlias, modelName, version, modelAlias,
        onCond, partitionSize, rest)
        if catalog.listModels().contains(modelName.toLowerCase) =>
      // SELECT ... FROM <data> JOIN <model>[.<version>]: joining a model
      // applies it (plan_join.py:357-401 — the reference swaps the join
      // for an ApplyPredictor step over the data side; a `.N` suffix
      // addresses a specific stored version); every data column plus the
      // model outputs are in scope for the select list. The data side
      // recurses through execute(), not plain spark.sql: the reference
      // planner walks arbitrary join trees, so a nested model join
      // (chained predictors) must route the same way the top level did
      val model = Option(version).fold(catalog.model(modelName))(v =>
        catalog.model(modelName, v.toInt))
      // `WHERE <ts> BETWEEN 'a' AND 'b'` on a TS model join is the
      // reference's windowed-forecast spelling (plan_join_ts.py:244-265
      // plans TWO fetches — the last `window` rows BEFORE the range as
      // context, plus the range — then post-filters predictor output to
      // the window, bounds inclusive). Here: the data side restricts to
      // history strictly before the range start (the TS transform takes
      // its per-group context window from that), and the BETWEEN
      // predicate re-targets the forecast timestamps.
      val tsBetween = model match {
        case m: graft.ml.TimeSeries.TsModel =>
          Option(rest).flatMap { r =>
            ("(?is)\\b[\\w.]*" + java.util.regex.Pattern.quote(m.tsCol) +
              "\\s+BETWEEN\\s+'([^']+)'\\s+AND\\s+'([^']+)'").r
              .findFirstMatchIn(r).map(mm => (mm.group(1), mm.group(2)))
          }
        case _ => None
      }
      val rawData = execute(if (tbl != null) s"SELECT * FROM $tbl" else sub)
      val data = (model, tsBetween) match {
        case (m: graft.ml.TimeSeries.TsModel, Some((from, _))) =>
          rawData.filter(org.apache.spark.sql.functions.col(m.tsCol) <
            org.apache.spark.sql.functions.lit(from))
        case _ => rawData
      }
      // model column MAPPING from the join's ON clause (reference
      // test_model_column_maping; apply_predictor maps input columns
      // through join conditions): `JOIN pred m ON m.input = t.a` feeds
      // the data's `a` to the model's `input` feature. The side
      // qualified by the model's alias/name names the FEATURE; the
      // mapped column is ADDED, so the original stays selectable.
      val mapped = Option(onCond).fold(data) { cond =>
        val mAlias = Option(modelAlias).getOrElse(modelName).toLowerCase
        cond.split("(?i)\\s+AND\\s+").foldLeft(data) { (df, pair) =>
          pair.split("=") match {
            case Array(l, r) =>
              def part(s: String): (Option[String], String) = {
                val p = s.trim.split("\\.")
                if (p.length == 2) (Some(p(0).toLowerCase), p(1)) else (None, p(0))
              }
              val (lq, lc) = part(l); val (rq, rc) = part(r)
              val (feature, dataCol) =
                if (lq.contains(mAlias) || lq.contains(modelName.toLowerCase)) (lc, rc)
                else if (rq.contains(mAlias) || rq.contains(modelName.toLowerCase)) (rc, lc)
                else (lc, rc)
              df.withColumn(feature, org.apache.spark.sql.functions.col(dataCol))
            case _ => df
          }
        }
      }
      // `USING partition_size=N` (reference test_predict_partition:
      // ApplyPredictorStep batches the data side N rows at a time) —
      // Spark-side, batch size IS partition size: repartition so each
      // task's batch holds at most N rows, then predict per partition
      val batched = Option(partitionSize).fold(mapped) { n =>
        val rows = mapped.count()
        mapped.repartition(math.max(1, math.ceil(rows.toDouble / n.toLong).toInt))
      }
      val applied = graft.ml.Predict.applyModel(batched, model)
      val tv = s"__model_join_$modelName"
      applied.createOrReplaceTempView(tv)
      // `WHERE <ts> > LATEST` on a TS model join is the reference's
      // only-future spelling (apply_predictor_step.py:145-151); our TS
      // transform already emits exclusively beyond-max forecast rows,
      // so the predicate neutralizes rather than failing to resolve
      val restAdj = Option(rest).map { r =>
        if (model.isInstanceOf[graft.ml.TimeSeries.TsModel]) {
          val r1 = r.replaceAll("(?i)\\b[\\w.]+\\s*>\\s*LATEST\\b", "1 = 1")
          tsBetween.fold(r1) { case (from, to) =>
            r1.replaceAll(
              "(?i)\\b[\\w.]+\\s+BETWEEN\\s+'" +
                java.util.regex.Pattern.quote(from) + "'\\s+AND\\s+'" +
                java.util.regex.Pattern.quote(to) + "'",
              s"forecast_date BETWEEN '$from' AND '$to'")
          }
        } else r
      }
      spark.sql(s"SELECT $sel FROM $tv ${restAdj.getOrElse("")}")

    case other => modelAwareRun(other)
  } }

  /** One-parse model-relation routing (reference plan_join.py:357-401
    * handles arbitrary join trees): parse the statement ONCE with the
    * Catalyst parser, inline top-level CTE definitions, and swap every
    * bare `JOIN <model>` — aliased, CTE-nested, or inside a subquery —
    * for the applied predictor over the join's data side. The regex
    * fast-path above still catches the simple spellings (and version
    * suffixes, which don't parse as identifiers); this route catches
    * everything the regexes can't see. Statements without a model join
    * run unchanged. */
  private def modelAwareRun(sql: String): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, SubqueryAlias, UnresolvedWith}
    import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
    val models = catalog.listModels().toSet
    val kbs = catalog.listKbs().toSet
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case _: Exception => return run(sql) }

    def namedRel(p: LogicalPlan, names: Set[String]): Option[(String, String)] = p match {
      case SubqueryAlias(id, u: UnresolvedRelation)
          if u.multipartIdentifier.size == 1 && names(u.multipartIdentifier.head) =>
        Some((u.multipartIdentifier.head, id.name))
      case u: UnresolvedRelation
          if u.multipartIdentifier.size == 1 && names(u.multipartIdentifier.head) =>
        Some((u.multipartIdentifier.head, u.multipartIdentifier.head))
      case _ => None
    }
    def modelRel(p: LogicalPlan): Option[(String, String)] = namedRel(p, models)
    def kbRel(p: LogicalPlan): Option[(String, String)] = namedRel(p, kbs)
    def substitute(plan: LogicalPlan, defs: Map[String, LogicalPlan]): LogicalPlan =
      plan.transformUp {
        case u: UnresolvedRelation if u.multipartIdentifier.size == 1 &&
            defs.contains(u.multipartIdentifier.head.toLowerCase) =>
          SubqueryAlias(u.multipartIdentifier.head,
            defs(u.multipartIdentifier.head.toLowerCase))
      }
    // CTE inlining makes a CTE-nested model join visible to the Join
    // rewrite below AND lets the data side resolve without WITH context
    def inlineCtes(plan: LogicalPlan): LogicalPlan = plan match {
      case w: UnresolvedWith =>
        val defs = w.cteRelations.foldLeft(Map.empty[String, LogicalPlan]) {
          case (acc, (name, body, _)) =>
            acc + (name.toLowerCase -> substitute(inlineCtes(body), acc))
        }
        substitute(inlineCtes(w.child), defs)
      case p => p
    }
    def fileRel(p: LogicalPlan): Option[(String, String, Option[String])] = p match {
      case SubqueryAlias(id, u: UnresolvedRelation)
          if u.multipartIdentifier.size == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("files") =>
        Some((u.multipartIdentifier(1), id.name, None))
      case u: UnresolvedRelation
          if u.multipartIdentifier.size == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("files") =>
        Some((u.multipartIdentifier(1), u.multipartIdentifier(1), None))
      // files.<name>.<page> — one page of a multipage workbook
      // (reference test_multipage: `select * from files.test.<sheet>`)
      case SubqueryAlias(id, u: UnresolvedRelation)
          if u.multipartIdentifier.size == 3 &&
            u.multipartIdentifier.head.equalsIgnoreCase("files") =>
        Some((u.multipartIdentifier(1), id.name, Some(u.multipartIdentifier(2))))
      case u: UnresolvedRelation
          if u.multipartIdentifier.size == 3 &&
            u.multipartIdentifier.head.equalsIgnoreCase("files") =>
        Some((u.multipartIdentifier(1), u.multipartIdentifier(2),
          Some(u.multipartIdentifier(2))))
      case _ => None
    }
    val inlined = inlineCtes(parsed)
    val needsRewrite = inlined.collectFirst {
      case Join(l, r, _, _, _) if modelRel(r).isDefined || modelRel(l).isDefined => ()
      case Filter(_, rel) if kbRel(rel).isDefined => ()
      case Filter(_, Join(l, r, _, _, _))
          if kbRel(l).isDefined || kbRel(r).isDefined => ()
      case rel if fileRel(rel).isDefined => ()
    }.isDefined
    if (!needsRewrite) return run(sql)
    registerRelations()
    // `JOIN model m ON m.feature = t.col` maps the data column onto the
    // model's input feature (test_model_column_maping) — the ON clause is
    // a column mapping, not a filter; the mapped column is ADDED so the
    // original stays selectable
    def mapOnCond(data: DataFrame, c: org.apache.spark.sql.catalyst.expressions.Expression,
        modelName: String, alias: String): DataFrame = {
      import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq}
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute => UAttr}
      def conj(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
        case CAnd(a, b) => conj(a) ++ conj(b)
        case x => Seq(x)
      }
      val names = Set(alias.toLowerCase, modelName.toLowerCase)
      conj(c).foldLeft(data) {
        case (df, CEq(l: UAttr, r: UAttr)) =>
          def qual(u: UAttr) =
            if (u.nameParts.size > 1) Some(u.nameParts.head.toLowerCase) else None
          val (feature, dataCol) =
            if (qual(l).exists(names)) (l.nameParts.last, r.nameParts.last)
            else if (qual(r).exists(names)) (r.nameParts.last, l.nameParts.last)
            else (l.nameParts.last, r.nameParts.last)
          df.withColumn(feature, org.apache.spark.sql.functions.col(dataCol))
        case (df, _) => df
      }
    }
    val rewritten = inlined.transformUp {
      // joining a model applies it over the data side — EITHER side, the
      // way the reference planner picks whichever relation is a
      // predictor (plan_join.py:357-380); the alias scopes both the
      // data columns and the model outputs
      case Join(left, right, Inner | Cross, cond, _)
          if modelRel(right).isDefined && modelRel(left).isEmpty =>
        val (m, alias) = modelRel(right).get
        val data0 = org.apache.spark.sql.GraftColumnBridge.ofRows(spark, left)
        val data = cond.fold(data0)(mapOnCond(data0, _, m, alias))
        val applied = graft.ml.Predict.applyModel(data, catalog.model(m))
        SubqueryAlias(alias, applied.queryExecution.analyzed)
      case Join(left, right, Inner | Cross, cond, _)
          if modelRel(left).isDefined && modelRel(right).isEmpty =>
        val (m, alias) = modelRel(left).get
        val data0 = org.apache.spark.sql.GraftColumnBridge.ofRows(spark, right)
        val data = cond.fold(data0)(mapOnCond(data0, _, m, alias))
        val applied = graft.ml.Predict.applyModel(data, catalog.model(m))
        SubqueryAlias(alias, applied.queryExecution.analyzed)
      // `FROM <kb> WHERE <cond>` anywhere in the tree — aliased or
      // CTE-nested — runs the knowledge-base search semantics, not a
      // plain chunk filter (executor.py compiles the WHERE tree into
      // set operations over per-condition searches)
      case Filter(cond, rel) if kbRel(rel).isDefined =>
        val (name, alias) = kbRel(rel).get
        val k = catalog.kb(name).get
        val index = for {
          nprobe <- k.params.get("ivf_nprobe")
          if warehouse.exists(s"${k.storage}_cents")
        } yield (warehouse.table(s"${k.storage}_cents"), nprobe.toInt)
        val out = KbSql.runParsed(spark, warehouse.table(k.storage), cond, None, index)
        SubqueryAlias(alias, out.queryExecution.analyzed)

      // JOIN a KB against a table (reference test_join_kb_table:
      // `FROM kb k JOIN t ON t.x = k.id WHERE k.content = '…'`): the
      // WHERE sits above the Join, so split its conjuncts — those
      // naming the KB's alias (or the KB-only columns content/
      // relevance/search params) drive the semantic search, the rest
      // stay as a post-join filter; the searched result replaces the
      // KB leaf with an extra `id` alias for the reference's public
      // column name
      case Filter(cond, Join(l, r, jt, jcond, hint))
          if kbRel(l).isDefined || kbRel(r).isDefined =>
        val kbOnLeft = kbRel(l).isDefined
        val (name, alias) = kbRel(if (kbOnLeft) l else r).get
        val k = catalog.kb(name).get
        def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
            : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
          case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
            conjuncts(a) ++ conjuncts(b)
          case other => Seq(other)
        }
        val kbOwn = Set("content", "relevance", "id", "chunk_id",
          "chunk_content", "doc_id", "distance",
          "hybrid_search", "hybrid_search_alpha", "reranking")
        val (kbConds, rest) = conjuncts(cond).partition { c =>
          val attrs = c.collect {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u }
          attrs.nonEmpty && attrs.forall(u =>
            (u.nameParts.size > 1 && u.nameParts.head.equalsIgnoreCase(alias)) ||
              (u.nameParts.size == 1 && kbOwn(u.nameParts.head.toLowerCase)))
        }
        require(kbConds.nonEmpty,
          s"KB join needs at least one search condition on $alias")
        val searchCond = kbConds.reduce(
          org.apache.spark.sql.catalyst.expressions.And(_, _))
        val index = for {
          nprobe <- k.params.get("ivf_nprobe")
          if warehouse.exists(s"${k.storage}_cents")
        } yield (warehouse.table(s"${k.storage}_cents"), nprobe.toInt)
        val searched = KbSql
          .runParsed(spark, warehouse.table(k.storage), searchCond, None, index)
          .withColumn("id", org.apache.spark.sql.functions.col("doc_id"))
        val kbPlan: LogicalPlan =
          SubqueryAlias(alias, searched.queryExecution.analyzed)
        val joined =
          if (kbOnLeft) Join(kbPlan, r, jt, jcond, hint)
          else Join(l, kbPlan, jt, jcond, hint)
        rest.reduceOption(
          org.apache.spark.sql.catalyst.expressions.And(_, _))
          .fold(joined: LogicalPlan)(f => Filter(f, joined))
      // `FROM files.<name>` — the reference's files integration as a SQL
      // namespace: the name resolves against the warehouse `.files`
      // area, format-sniffed by FileSource (csv/json/parquet/xlsx/pdf/
      // txt) into a DISTRIBUTED scan, never a driver-side read
      case rel if fileRel(rel).isDefined =>
        val (name, alias, page) = fileRel(rel).get
        val dirPath = java.nio.file.Paths.get(s"${warehouse.dir}/.files")
        val candidates =
          if (!java.nio.file.Files.isDirectory(dirPath)) Seq.empty
          else {
            val s = java.nio.file.Files.list(dirPath)
            try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
              .filter { p =>
                val fn = p.getFileName.toString
                fn == name || fn.stripSuffix(
                  fn.split('.').lastOption.fold("")("." + _)) == name
              }
            finally s.close()
          }
        require(candidates.nonEmpty, s"file $name not found in files storage")
        val df = page match {
          case Some(p) => graft.federation.FileSource
            .readXlsx(spark, candidates.head.toString, Some(p))
          case None =>
            graft.federation.FileSource.read(spark, candidates.head.toString)
        }
        SubqueryAlias(alias, df.queryExecution.analyzed)
    }
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, rewritten)
  }

  /** `key = value [, key = value …]` (USING / PARAMETERS clauses). Values
    * may be 'quoted', numeric, or bare words; keys lowercase. */
  /** Agent "new syntax" params (tests/unit/executor/test_agent.py
    * test_agent_new_syntax): `model = {provider, model_name, api_key}`
    * flattens into the agent's model + model_* params, and
    * `data = {"knowledge_bases": [...], "tables": [...]}` flattens into
    * the exposure allowlists the query route enforces. ALTER AGENT with
    * a new dict REPLACES the flattened keys wholesale (param overwrite),
    * exactly the reference's replace-on-alter contract. */
  private def agentParams(p0: Map[String, String]): Map[String, String] = {
    val withModel = p0.get("model").filter(_.trim.startsWith("{")).map { md =>
      val d = parseFlatDict(md)
      (p0 - "model") ++
        d.get("model_name").map("model" -> _) ++
        d.get("provider").map("model_provider" -> _) ++
        d.get("api_key").map("model_api_key" -> _)
    }.getOrElse(p0)
    withModel.get("data").filter(_.trim.startsWith("{")).map { dd =>
      val d = parseFlatDict(dd)
      (withModel - "data") ++
        d.get("knowledge_bases").map("knowledge_bases" -> _) ++
        d.get("tables").map("tables" -> _)
    }.getOrElse(withModel)
  }

  /** `{'k': 'v', "k2": ["a", "b"]}` → Map(k -> v, k2 -> "a,b"): the
    * USING-dict shape; list values flatten comma-separated. */
  private[sqlx] def parseFlatDict(s: String): Map[String, String] = {
    def unq(x: String) = x.trim.stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
    splitTop(s.trim.stripPrefix("{").stripSuffix("}"), ',').flatMap { kv =>
      kv.split(":", 2) match {
        case Array(k, v0) =>
          val v = v0.trim
          val value =
            if (v.startsWith("[") && v.endsWith("]"))
              splitTop(v.stripPrefix("[").stripSuffix("]"), ',')
                .map(unq).filter(_.nonEmpty).mkString(",")
            else unq(v)
          Some(unq(k).toLowerCase -> value)
        case _ => None
      }
    }.toMap
  }

  def parseUsing(s: String): Map[String, String] =
    splitTop(s, ',').flatMap { item =>
      item.split("=", 2) match {
        case Array(k, v0) =>
          val v = v0.trim
          // `USING a=1 b=2` (missing comma) must error loudly, not parse
          // b=2 into a's value (reference test_wrong_using raises
          // "Syntax error"); a value that is ONE quoted string or ONE
          // braced dict may contain anything
          val wholeQuoted = v.matches("""(?s)'[^']*'""") ||
            v.matches("""(?s)"[^"]*"""") ||
            (v.startsWith("{") && v.endsWith("}")) ||
            (v.startsWith("[") && v.endsWith("]"))
          if (!wholeQuoted && v.matches("""(?s).*\s+\S+\s*=.*"""))
            throw new IllegalArgumentException(
              s"Syntax error in USING near '${item.trim}': missing comma between assignments?")
          Some(k.trim.toLowerCase -> v.stripPrefix("'").stripSuffix("'"))
        case _ => None
      }
    }.toMap

  /** LIKE pattern → anchored regex: % becomes ".*", _ becomes "." and
    * every literal segment is regex-quoted (a pattern containing dots,
    * parens, plus signs etc. must match literally, not as
    * metacharacters). */
  private[sqlx] def likeToRegex(p: String): String =
    "^" + p.split("(?=[%_])|(?<=[%_])", -1).map {
      case "%" => ".*"
      case "_" => "."
      case seg if seg.nonEmpty => java.util.regex.Pattern.quote(seg)
      case _ => ""
    }.mkString + "$"

  /** SQL literal → value for positional binding: quoted strings,
    * booleans, integers, decimals. */
  private def parseLiteral(s: String): Any = {
    val t = s.trim
    // SQL-escaped '' inside a quoted literal unescapes to a single quote
    // (binding is typed, so the value never re-enters SQL text)
    if (t.startsWith("'") && t.endsWith("'"))
      t.drop(1).dropRight(1).replace("''", "'")
    else if (t.equalsIgnoreCase("true")) true
    else if (t.equalsIgnoreCase("false")) false
    else if (t.equalsIgnoreCase("null")) null
    else if (t.matches("-?\\d+")) t.toLong
    else t.toDouble
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.drop(1).dropRight(1) else t
  }

  /** Fire a trigger once, synchronously: drain pending file changes of
    * the watched warehouse table through Structured Streaming
    * (AvailableNow), exposing each micro-batch as TABLE_DELTA to the
    * trigger's SQL (trigger_task.py:29-88). Exactly-once across restarts
    * via the per-trigger checkpoint. */
  def fireTrigger(name: String): Unit = {
    val t = catalog.trigger(name).getOrElse(
      throw new NoSuchElementException(s"trigger $name does not exist"))
    // a DOTTED table name is an external DSv2 source (e.g. mem.<table>):
    // those can't stream from a directory, so the trigger polls the
    // source snapshot and key-diffs (subscribe() semantics,
    // dummy_data_handler.py:102); the first column is the delivery key
    if (t.tableName.contains(".")) {
      graft.incremental.Triggers.pollExternal(spark,
        () => spark.table(t.tableName),
        spark.table(t.tableName).schema.fields.head.name,
        s"${warehouse.dir}/.state/poll_trigger_$name",
        (delta, _) => {
          delta.createOrReplaceTempView("TABLE_DELTA")
          executeScript(t.sql)
          ()
        })
      return
    }
    val schema = warehouse.table(t.tableName).schema
    // checkpoints live under the dot-prefixed `.state` sibling (never
    // listed as a table by Warehouse.listTables, so registerRelations
    // can't trip over a non-parquet dir)
    val q = graft.incremental.Triggers.onTableChanges(spark,
      s"${warehouse.dir}/${t.tableName}", schema,
      s"${warehouse.dir}/.state/ckpt_trigger_$name",
      (delta, _) => {
        // foreachBatch hands a frame bound to a CLONED session — register
        // the delta in OUR session's temp catalog or executeScript (which
        // runs on `spark`) can't see it
        spark.createDataFrame(delta.rdd, delta.schema)
          .createOrReplaceTempView("TABLE_DELTA")
        executeScript(t.sql)
        ()
      })
    graft.incremental.Triggers.drain(q)
  }

  /** Chatbot transport stand-in: one poll of the bot's message channel
    * (the reference chatbot_task.py loop — poll the messaging
    * integration, answer each new message, post the reply). The channel
    * is a `mem.<table>` DSv2 table with (message_id, session, content);
    * delivery is the e13 keyset-diff protocol ([[graft.incremental
    * .Triggers.pollExternal]]), so a message is answered exactly once
    * across polls and restarts. Replies land in a warehouse reply table
    * (message_id, session, batch, answer) — the queryable stand-in for
    * the posted message. Each reply runs through the SAME multi-turn
    * memory as ASK (last 3 turns stitch into the prompt), so a session's
    * second poll answers in context. The per-message loop is
    * conversation-sized by definition (a chat channel's delta is human
    * traffic, not corpus scale) — same bound as the turn log itself.
    *
    * @return number of new messages answered this poll */
  def pollChatbotChannel(bot: String): Long = {
    val cb = catalog.chatbot(bot).getOrElse(
      throw new NoSuchElementException(s"chatbot $bot does not exist"))
    require(cb.isRunning, s"chatbot $bot is not running")
    val tableName = cb.params.getOrElse("table", "messages")
    val replyTable = cb.params.getOrElse("reply_table", s"${bot}_replies")
    if (!warehouse.exists(replyTable))
      warehouse.createTable(replyTable, StructType(Seq(
        StructField("message_id", org.apache.spark.sql.types.LongType, nullable = false),
        StructField("session", StringType, nullable = false),
        StructField("batch", org.apache.spark.sql.types.LongType, nullable = false),
        StructField("answer", StringType, nullable = false))))
    graft.incremental.Triggers.pollExternal(spark,
      () => spark.table(s"mem.$tableName"), "message_id",
      s"${warehouse.dir}/.state/chatbot_$bot",
      (delta, batchId) => {
        import spark.implicits._
        val replies = delta.select("message_id", "session", "content").collect()
          .sortBy(_.getLong(0)).map { r =>
            val (mid, session, message) = (r.getLong(0), r.getString(1), r.getString(2))
            val history = catalog.chatHistory(bot, session)
            catalog.appendChat(bot, session, "user", message)
            val ctx = history.takeRight(3).map(_._3).mkString(" | ")
            val prompt = if (ctx.isEmpty) message else s"$ctx || $message"
            val answer = graft.functions.AiFunctions.llmLocal(prompt)
            catalog.appendChat(bot, session, "assistant", answer)
            (mid, session, batchId, answer)
          }
        warehouse.insertInto(replyTable,
          replies.toSeq.toDF("message_id", "session", "batch", "answer"))
      })
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
  def splitStatements(script: String): Seq[String] = splitTop(script, ';')

  /** Split on `sep` outside single/double quotes AND outside parens
    * (an assignment like `x = concat(a, ',')` must stay whole); trims,
    * drops empties. */
  private def splitTop(s: String, sep: Char): Seq[String] =
    Commands.splitTop(s, sep)

  /** True when `s` is a plausible SET list: balanced parens and no
    * top-level WHERE keyword. Guards the UPDATE…FROM route against
    * over-matching a plain UPDATE whose WHERE clause contains a
    * parenthesized subquery with FROM inside (e.g. `UPDATE t SET a = 1
    * WHERE x IN (SELECT b FROM (…) z WHERE c > 1)`), which would
    * otherwise capture `a = 1 WHERE x IN (SELECT b` as the SET list. */
  private def cleanSetList(s: String): Boolean = {
    val noQuotes = s.replaceAll("'[^']*'", "''").replaceAll("\"[^\"]*\"", "\"\"")
    val top = new StringBuilder
    var depth = 0
    var balanced = true
    noQuotes.foreach {
      case '(' => depth += 1
      case ')' => depth -= 1; if (depth < 0) balanced = false
      case c => if (depth == 0) top.append(c)
    }
    balanced && depth == 0 &&
      !top.toString.toUpperCase.matches("(?s).*\\bWHERE\\b.*")
  }

  /** Parameterized execution — the prepared-statement surface
    * (reference PreparedStatementPlanner, planner/query_prepare.py):
    * named `:param` markers bind server-side, no string splicing. */
  def execute(sql: String, params: Map[String, Any]): DataFrame = {
    registerRelations()
    spark.sql(sql, params)
  }

  /** Positional `?` binding — the binary-protocol prepared-statement
    * surface (COM_STMT_EXECUTE): typed params bind server-side onto the
    * same parameterized route EXECUTE…USING takes. */
  def executePositional(sql: String, args: Seq[Any]): DataFrame = {
    registerRelations()
    spark.sql(sql, args.toArray[Any])
  }

  /** Run a SELECT with catalog resolution: every known relation
    * (base table, warehouse table, view, KB chunk store) is registered
    * as a temp view first, so views shadow tables exactly as in
    * [[Catalog.resolve]]. */
  private def run(sql: String): DataFrame = Commands.analysisLock.synchronized {
    registerRelations()
    spark.sql(sql)
  }

  private def registerRelations(): Unit = {
    // drop temp views registered by OTHER sessions for names this
    // session does not own — see Commands.managedRelations
    val mine = (graft.engine.Tables.names ++
      warehouse.listTables().filterNot(_.startsWith("__kb_")) ++
      catalog.listKbs() ++ mvs.list() ++ catalog.listViews()).toSet
    Commands.managedRelations.forEach { n =>
      if (!mine.contains(n)) { try spark.catalog.dropTempView(n) catch { case _: Throwable => } }
    }
    registerBase()
    registerViews(before = None)
    mine.foreach(Commands.managedRelations.add)
  }

  /** Register every non-view relation: base tables, warehouse tables, and
    * KB chunk stores (a KB is queryable as a table of its chunks —
    * project_datanode view). */
  private def registerBase(): Unit = {
    // resolve base/warehouse tables DIRECTLY (not via catalog.resolve,
    // which checks views first — a view shadowing a base table would
    // recurse through its own registration)
    graft.engine.Tables.names.foreach { n =>
      // ANALYZEd tables register with their exact statistics attached,
      // so CBO join reorder / broadcast decisions see them
      catalog.attachCboStats(n,
        graft.engine.Tables.table(spark, catalog.sfDir, n))
        .createOrReplaceTempView(n)
    }
    warehouse.listTables().filterNot(_.startsWith("__kb_")).foreach { n =>
      // a bucketed table lives in the session catalog (bucket metadata
      // only exists there); a path-based temp view would shadow it and
      // silently drop the bucket layout ("default" scoping skips temp
      // views so plain tables still refresh their registration). Skip
      // ONLY when the catalog entry is OURS (location under this
      // warehouse) — a same-named entry from another Commands instance
      // sharing the SparkSession must not shadow this warehouse's table
      if (!spark.catalog.tableExists("default", n) ||
          !warehouse.catalogLocationUnderDir(n))
        catalog.attachCboStats(n, warehouse.table(n)).createOrReplaceTempView(n)
    }
    catalog.listKbs().foreach { n =>
      catalog.kb(n).filter(k => warehouse.exists(k.storage)).foreach { k =>
        warehouse.table(k.storage).createOrReplaceTempView(n)
      }
    }
    // a materialized view reads as its finalized partials (no source
    // scan); one mid-initial-refresh (version 0) is not yet readable
    mvs.list().filter(mvs.isReadable).foreach { n =>
      mvs.read(n).createOrReplaceTempView(n)
    }
  }

  /** Register views in creation order, stopping before `before` — the
    * expansion set a view's own body may see (earlier views only, so
    * expansion terminates and self-reference reads the base table). */
  private def registerViews(before: Option[String]): Unit = {
    val names = catalog.listViews()
    // listings report canonical lowercase names; the sentinel may carry
    // the user's original case — compare case-insensitively, or the view
    // being defined would register itself and expand forever
    before.fold(names)(b => names.takeWhile(!_.equalsIgnoreCase(b))).foreach { n =>
      catalog.resolve(n, Some(warehouse)).createOrReplaceTempView(n)
    }
  }

  private def ok(msg: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("ok", msg)), 1),
      StructType(Seq(StructField("status", StringType), StructField("message", StringType))))

  /** DML acknowledgement carrying the MySQL-contract affected-row count
    * (reference ExecuteAnswer.affected_rows, test_affected_rows). */
  private def ok(msg: String, affected: Long): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("ok", msg, affected)), 1),
      StructType(Seq(StructField("status", StringType),
        StructField("message", StringType),
        StructField("affected_rows", LongType))))

  /** Row count of a warehouse table — a driver-side parquet-footer walk
    * (Warehouse.rowCount), NOT a Spark job, so the before/after diffs
    * backing INSERT/DELETE affected_rows cost milliseconds at any scale
    * (an extra count job per DML statement measurably slowed
    * trigger-protocol queries). */
  private def tableRows(name: String): Long = warehouse.rowCount(name)

  private def kv(k: String, v: String, pairs: Seq[(String, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map(p => Row(p._1, p._2)), 1),
      StructType(Seq(StructField(k, StringType), StructField(v, StringType))))
}

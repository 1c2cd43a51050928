package graft.catalog

import graft.engine.Tables
import graft.ml.Fit
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** AI-object + relational catalog: named views, versioned models,
  * knowledge bases, agents, triggers, integrations ("databases"), jobs —
  * the namespace the reference keeps per "project"
  * (interfaces/database/projects.py) — plus the `information_schema` /
  * meta-table surface (datahub/datanodes/system_tables.py:48-543,
  * mindsdb_tables.py:42-430).
  *
  * Views are stored as DataFrame-producing thunks and expanded at
  * resolution time (command_executor.py:1350-1388 → expansion in
  * project_datanode.py:103-173): querying a view IS querying its
  * definition — Catalyst inlines it, so filters/prunes push through the
  * view boundary into the underlying scans.
  *
  * Models are VERSIONED (reference model-version semantics,
  * command_executor.py:1042 RETRAIN / :1078 FINETUNE / :1963 DROP):
  * every retrain/finetune appends a version and makes it active; older
  * versions stay addressable (`USING version = n`).
  */
final class Catalog(val spark: SparkSession, val sfDir: String) {

  /** Object registry keyed CASE-INSENSITIVELY: the reference's parser
    * lowercases unquoted identifiers, so `MyModel` and `mymodel` name
    * the same object for every object kind
    * (tests/unit/executor/test_lowercase.py pins this for views,
    * projects, ml_engines, models, agents, KBs, jobs, chatbots,
    * databases, and triggers). Keys store lowercase; listings therefore
    * report the reference's canonical lowercase names. */
  private[catalog] final class Registry[V] {
    private val m = scala.collection.mutable.LinkedHashMap[String, V]()
    private def k(n: String) = n.toLowerCase
    def apply(n: String): V = m.getOrElse(k(n),
      throw new NoSuchElementException(s"key not found: ${k(n)}"))
    def get(n: String): Option[V] = m.get(k(n))
    def update(n: String, v: V): Unit = m.update(k(n), v)
    def remove(n: String): Option[V] = m.remove(k(n))
    def contains(n: String): Boolean = m.contains(k(n))
    def getOrElse(n: String, default: => V): V = m.getOrElse(k(n), default)
    def getOrElseUpdate(n: String, v: => V): V = m.getOrElseUpdate(k(n), v)
    def keys: Iterable[String] = m.keys
    def values: Iterable[V] = m.values
    def toSeq: Seq[(String, V)] = m.toSeq
  }

  private val views = new Registry[() => DataFrame]()

  /** One registered model: its versions (1-based), per-version fit stats
    * (for FINETUNE), the training thunk (for RETRAIN), and the active
    * version index. */
  final class ModelEntry(
      var versions: Vector[(graft.ml.Model, Option[Fit.Stats])],
      var trainer: Option[() => (graft.ml.Model, Option[Fit.Stats])],
      var spec: Option[Fit.FitSpec],
      var active: Int,
      /** raw CREATE MODEL … USING params — surfaced (masked) as the
        * models meta-table's training_options */
      var using: Map[String, String] = Map.empty)

  private val models = new Registry[ModelEntry]()

  import Catalog.{AgentEntity, ChatbotEntity, DbEntity, KbEntity, MlEngineEntity, TriggerEntity}

  private val kbs = new Registry[KbEntity]()
  private val agents = new Registry[AgentEntity]()
  private val databases = new Registry[DbEntity]()
  private val triggers = new Registry[TriggerEntity]()
  private val chatbots = new Registry[ChatbotEntity]()
  private val mlEngines = new Registry[MlEngineEntity]()
  private val skills = new Registry[Catalog.SkillEntity]()

  // ------------------------------------------------------------ resolution

  /** Resolve a table name: warehouse and views shadow base tables. */
  def resolve(name: String, wh: Option[Warehouse] = None): DataFrame =
    views.get(name).map(_.apply())
      .orElse(wh.filter(_.exists(name)).map(_.table(name)))
      .getOrElse(Tables.table(spark, sfDir, name))

  // ---------------------------------------------------------------- views

  def createView(name: String, df: => DataFrame): Unit = views(name) = () => df
  def dropView(name: String): Unit = { views.remove(name); viewSqls.remove(name) }
  def listViews(): Seq[String] = views.keys.toSeq
  /** source text of a SQL-defined view (REST views namespace returns the
    * stored query verbatim, views.py get_view); programmatically created
    * views have none. */
  private val viewSqls = new Registry[String]()
  def recordViewSql(name: String, sql: String): Unit = viewSqls(name) = sql
  def viewSql(name: String): Option[String] = viewSqls.get(name)

  // --------------------------------------------------------------- models

  def createModel(m: graft.ml.Model,
      stats: Option[Fit.Stats] = None,
      trainer: Option[() => (graft.ml.Model, Option[Fit.Stats])] = None,
      spec: Option[Fit.FitSpec] = None,
      using: Map[String, String] = Map.empty): Unit =
    models(m.name) = new ModelEntry(Vector((m, stats)), trainer, spec,
      active = 1, using = using)

  def model(name: String): graft.ml.Model = {
    val e = models(name); e.versions(e.active - 1)._1
  }
  def model(name: String, version: Int): graft.ml.Model =
    models(name).versions(version - 1)._1
  def listModels(): Seq[String] = models.keys.toSeq
  def dropModel(name: String): Unit = models.remove(name)
  def modelVersions(name: String): Seq[Int] = models(name).versions.indices.map(_ + 1)
  def activeVersion(name: String): Int = models(name).active
  def setActiveVersion(name: String, v: Int): Unit = {
    val e = models(name)
    require(v >= 1 && v <= e.versions.length, s"no version $v of model $name")
    e.active = v
  }

  /** RETRAIN (command_executor.py:1042): re-run the stored trainer on
    * CURRENT data; the result becomes a new active version. */
  def retrain(name: String): Int = {
    val e = models(name)
    val t = e.trainer.getOrElse(
      throw new IllegalStateException(s"model $name has no stored training query"))
    e.versions :+= t()
    e.active = e.versions.length
    e.active
  }

  /** FINETUNE (command_executor.py:1078): exact incremental OLS — add the
    * new batch's sufficient statistics to the active version's and
    * re-solve; new active version. */
  def finetune(name: String, newData: DataFrame): Int = {
    val e = models(name)
    val spec = e.spec.getOrElse(
      throw new IllegalStateException(s"model $name was not created from a fit"))
    val prev = e.versions(e.active - 1)._2.getOrElse(
      throw new IllegalStateException(s"active version of $name carries no fit stats"))
    val (m, st) = Fit.finetune(name, prev, newData, spec)
    e.versions :+= ((m, Some(st)))
    e.active = e.versions.length
    e.active
  }

  // ---------------------------------------------- KBs / agents / databases

  def createKb(name: String, params: Map[String, String] = Map.empty,
      ifNotExists: Boolean = false): KbEntity = {
    if (kbs.contains(name) && !ifNotExists)
      throw new IllegalStateException(s"knowledge base $name already exists")
    kbs.getOrElseUpdate(name, KbEntity(name, params))
  }
  def dropKb(name: String, ifExists: Boolean = false): Unit =
    if (kbs.remove(name).isEmpty && !ifExists)
      throw new NoSuchElementException(s"knowledge base $name does not exist")
  def kb(name: String): Option[KbEntity] = kbs.get(name)
  def listKbs(): Seq[String] = kbs.keys.toSeq
  /** record index-time corpus stats on the KB entity (ingest path). */
  def setKbStats(name: String, stats: (Long, Double)): Unit =
    kbs.get(name).foreach(k => kbs(name) = k.copy(stats = Some(stats)))

  def createAgent(name: String, model: String, params: Map[String, String] = Map.empty): Unit =
    agents(name) = AgentEntity(name, model, params)
  def updateAgent(name: String, params: Map[String, String]): Unit = {
    val cur = agents(name)
    agents(name) = cur.copy(
      model = params.getOrElse("model", cur.model),
      params = cur.params ++ (params - "model"))
  }
  def dropAgent(name: String): Unit =
    if (agents.remove(name).isEmpty)
      throw new NoSuchElementException(s"agent $name does not exist")
  def agent(name: String): Option[AgentEntity] = agents.get(name)
  def listAgents(): Seq[String] = agents.keys.toSeq

  // --------------------------------------------------------------- skills

  /** CREATE SKILL (reference skills table, interfaces/storage/db.py:434:
    * name + type + JSON params; types `text2sql` — database/tables
    * restriction — and `knowledge_base`). Skills attach to agents via the
    * agent's `skills` param (agent_skills association, db.py:423). */
  def createSkill(name: String, skillType: String,
      params: Map[String, String] = Map.empty): Unit =
    skills(name) = Catalog.SkillEntity(name, skillType, params)
  def updateSkill(name: String, params: Map[String, String]): Unit = {
    val cur = skills.getOrElse(name,
      throw new NoSuchElementException(s"skill $name does not exist"))
    skills(name) = cur.copy(
      skillType = params.getOrElse("type", cur.skillType),
      params = cur.params ++ (params - "type"))
  }
  def dropSkill(name: String): Unit =
    if (skills.remove(name).isEmpty)
      throw new NoSuchElementException(s"skill $name does not exist")
  def skill(name: String): Option[Catalog.SkillEntity] = skills.get(name)
  def listSkills(): Seq[String] = skills.keys.toSeq

  /** ALTER KNOWLEDGE BASE (command_executor.py:1455-1468 answer_alter_kb
    * → kb_controller.update; nested-param contract proven by
    * tests/unit/executor/test_knowledge_base.py test_alter_kb): plain
    * params overwrite; the `embedding_model` / `reranking_model` dicts
    * MERGE key-by-key when the provider stays the same, are REPLACED
    * wholesale when the provider changes, and `reranking_model = false`
    * clears the dict. Changing the embedding model or provider of a KB
    * with existing vectors is refused — stored embeddings would no
    * longer be comparable. */
  def updateKb(name: String, params: Map[String, String]): Unit = {
    val cur = kbs.getOrElse(name,
      throw new NoSuchElementException(s"knowledge base $name does not exist"))
    val merged = params.foldLeft(cur.params) { case (acc, (k, v)) =>
      k match {
        case "reranking_model" if v.trim.equalsIgnoreCase("false") =>
          acc + (k -> "{}")
        case "embedding_model" if v.trim.equalsIgnoreCase("false") =>
          throw new IllegalArgumentException(
            "embedding_model cannot be disabled on a knowledge base")
        case "embedding_model" | "reranking_model" =>
          val old = parseModelDict(acc.getOrElse(k, "{}"))
          val nw = parseModelDict(v)
          def changes(key: String) =
            nw.get(key).exists(x => old.nonEmpty && !old.get(key).contains(x))
          if (k == "embedding_model" && (changes("provider") || changes("model_name")))
            throw new IllegalArgumentException(
              "embedding model of an existing knowledge base cannot be changed")
          // different reranking provider: the old params no longer apply
          val out = if (k == "reranking_model" && changes("provider")) nw
                    else old ++ nw
          acc + (k -> renderModelDict(out))
        case _ => acc + (k -> v)
      }
    }
    kbs(name) = cur.copy(params = merged)
  }

  /** `{'provider': 'x', 'api_key': 'y'}` → Map — the USING-dict shape the
    * reference passes for KB model params. Public: the SQL router reads
    * the provider key to select the embedding path. */
  def parseModelDict(s: String): Map[String, String] = {
    def unq(x: String) = x.trim.stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
    // quote/nesting-aware tokenizer shared with the SQL router: a naive
    // split(",") would corrupt values containing commas
    graft.sqlx.Commands.splitTop(
        s.trim.stripPrefix("{").stripSuffix("}"), ',')
      .flatMap { kv =>
        kv.split(":", 2) match {
          case Array(k2, v2) => Some(unq(k2).toLowerCase -> unq(v2))
          case _ => None
        }
      }.toMap
  }

  private def renderModelDict(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"'$k': '$v'" }
      .mkString("{", ", ", "}")

  // ------------------------------------------------- chatbots / ml engines

  /** CREATE CHATBOT (command_executor.py:774-802): a chatbot binds a chat
    * database (the message channel) to a model OR an agent. The reference
    * requires the database to exist (:781-786). */
  def createChatbot(name: String, database: String, model: Option[String],
      agent: Option[String], isRunning: Boolean = true,
      params: Map[String, String] = Map.empty): Unit = {
    require(databases.contains(database),
      s"Database not found: $database")
    require(model.isDefined || agent.isDefined,
      "chatbot needs model = '…' or agent = '…'")
    chatbots(name) = ChatbotEntity(name, database, model, agent, isRunning, params)
  }
  /** UPDATE CHATBOT … SET (command_executor.py:805-836): partial update;
    * unknown chatbot is an error, like the reference's :833. */
  def updateChatbot(name: String, params: Map[String, String]): Unit = {
    val cur = chatbots.getOrElse(name,
      throw new NoSuchElementException(s"Chatbot with name $name not found"))
    params.get("database").foreach(d => require(databases.contains(d),
      s"Database with name $d not found"))
    chatbots(name) = cur.copy(
      database = params.getOrElse("database", cur.database),
      model = params.get("model").orElse(cur.model),
      agent = params.get("agent").orElse(cur.agent),
      isRunning = params.get("is_running").map(_.toBoolean).getOrElse(cur.isRunning),
      params = cur.params ++ (params -- Seq("database", "model", "agent", "is_running")))
  }
  def dropChatbot(name: String): Unit = {
    if (chatbots.remove(name).isEmpty)
      throw new NoSuchElementException(s"chatbot $name does not exist")
    chatTurns.filterInPlace { case ((b, _), _) => b != name }
  }
  def chatbot(name: String): Option[ChatbotEntity] = chatbots.get(name)
  def listChatbots(): Seq[String] = chatbots.keys.toSeq

  // ------------------------------------------------- conversation memory
  // Per-(chatbot, session) turn history — the reference persists chat
  // turns so multi-turn context survives (db.py ChatBotsHistory;
  // chatbot_task polls the channel and replays context). Memory-resident
  // here, like the other session-scoped meta state; conversation context
  // is conversation-sized by definition.

  private val chatTurns = scala.collection.mutable.LinkedHashMap[
    (String, String), scala.collection.mutable.ArrayBuffer[(Int, String, String)]]()

  /** Append a turn; returns its 1-based turn number within the session. */
  def appendChat(bot: String, session: String, role: String, content: String): Int = {
    val buf = chatTurns.getOrElseUpdate((bot, session),
      scala.collection.mutable.ArrayBuffer.empty)
    val turn = buf.size + 1
    buf += ((turn, role, content))
    turn
  }

  /** Turns for one (bot, session), oldest first: (turn, role, content). */
  def chatHistory(bot: String, session: String): Seq[(Int, String, String)] =
    chatTurns.getOrElse((bot, session), Nil).toSeq

  /** Every turn across bots/sessions: (bot, session, turn, role, content). */
  def allChatHistory(): Seq[(String, String, Int, String, String)] =
    chatTurns.toSeq.flatMap { case ((b, s), buf) =>
      buf.map { case (t, r, c) => (b, s, t, r, c) }
    }

  /** CREATE ML_ENGINE (command_executor.py:1171-1233): registers a named
    * instance of a handler with connection params. In this environment the
    * engine is metadata (the one live trainer is the built-in OLS Fit). */
  def createMlEngine(name: String, handler: String,
      params: Map[String, String] = Map.empty, ifNotExists: Boolean = false): Unit = {
    if (mlEngines.contains(name) && !ifNotExists)
      throw new IllegalStateException(s"ML engine $name already exists")
    mlEngines.getOrElseUpdate(name, MlEngineEntity(name, handler, params))
  }
  def dropMlEngine(name: String): Unit =
    if (mlEngines.remove(name).isEmpty)
      throw new NoSuchElementException(s"ML engine $name does not exist")
  def listMlEngines(): Seq[String] = mlEngines.keys.toSeq
  def mlEngine(name: String): Option[MlEngineEntity] = mlEngines.get(name)
  /** BYOM REST upload (namespaces/handlers.py:252-290 POST = new engine
    * VERSION): merge params and append the version number. */
  def updateMlEngine(name: String, params: Map[String, String]): MlEngineEntity = {
    val cur = mlEngines.get(name).getOrElse(
      throw new NoSuchElementException(s"ML engine $name does not exist"))
    val versions = cur.params.get("versions").map(_.split(",").toSeq)
      .getOrElse(Seq("1"))
    val next = versions.map(_.trim.toInt).max + 1
    val out = cur.copy(params = cur.params ++ params +
      ("versions" -> (versions :+ next.toString).mkString(",")))
    mlEngines.update(name, out)
    out
  }

  /** CREATE DATABASE = integration registration (command_executor.py:
    * 1260-1307). engine 'mem' wires the DSv2 MemCatalog under the given
    * name, so `SELECT … FROM <name>.<table>` resolves through Spark's
    * multi-catalog namespace exactly like a remote source. */
  def createDatabase(name: String, engine: String, params: Map[String, String] = Map.empty): Unit = {
    require(name != "spark_catalog" && name != "information_schema" && name != "graft",
      s"$name is a reserved catalog name")
    engine match {
      case "mem" =>
        // refuse to clobber a catalog conf we didn't register ourselves
        require(databases.contains(name) ||
          spark.conf.getOption(s"spark.sql.catalog.$name").forall(
            _ == classOf[graft.federation.MemCatalog].getName),
          s"catalog name $name is already bound to a different catalog")
        spark.conf.set(s"spark.sql.catalog.$name",
          classOf[graft.federation.MemCatalog].getName)
      case _ => () // metadata-only registration (no live connector in this env)
    }
    databases(name) = DbEntity(name, engine, params)
  }
  def dropDatabase(name: String): Unit =
    databases.remove(name) match {
      case Some(d) =>
        // unbind the catalog conf so the dropped integration is no longer
        // addressable via <name>.<table>
        if (d.engine == "mem") spark.conf.unset(s"spark.sql.catalog.$name")
      case None =>
        throw new NoSuchElementException(s"database $name does not exist")
    }
  def listDatabases(): Seq[String] = databases.keys.toSeq

  /** ALTER DATABASE (command_executor.py:1308-1313 answer_alter_database →
    * database_controller.update): merge new connection params. */
  def updateDatabase(name: String, params: Map[String, String]): Unit = {
    val cur = databases.getOrElse(name,
      throw new NoSuchElementException(s"database $name does not exist"))
    databases(name) = cur.copy(params = cur.params ++ params)
  }
  def database(name: String): Option[DbEntity] = databases.get(name)

  def createTrigger(name: String, tableName: String, sql: String): Unit =
    triggers(name) = TriggerEntity(name, tableName, sql)
  def dropTrigger(name: String): Unit =
    if (triggers.remove(name).isEmpty)
      throw new NoSuchElementException(s"trigger $name does not exist")
  def trigger(name: String): Option[TriggerEntity] = triggers.get(name)
  def listTriggers(): Seq[String] = triggers.keys.toSeq

  // ----------------------------------------------------- information_schema

  private def frame(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  /** information_schema.tables (system_tables.py:67). */
  def infoTables(wh: Option[Warehouse] = None): DataFrame = {
    val base = Tables.names.map(n => Row(n, "BASE TABLE"))
    val v = views.keys.map(n => Row(n.toString, "VIEW")).toSeq
    val w = wh.map(_.listTables().filterNot(_.startsWith("__kb_"))
      .map(n => Row(n, "BASE TABLE"))).getOrElse(Nil)
    frame(StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("table_type", StringType, nullable = false))),
      base ++ v ++ w).orderBy("table_name")
  }

  /** information_schema.columns (system_tables.py:280): name + 1-based
    * ordinal + Spark SQL type per column of every resolvable table. */
  def infoColumns(tables: Seq[String] = Tables.names, wh: Option[Warehouse] = None): DataFrame = {
    val rows = tables.flatMap { t =>
      resolve(t, wh).schema.fields.zipWithIndex.map { case (f, i) =>
        Row(t, f.name, i + 1, f.dataType.sql)
      }
    }
    frame(StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("ordinal_position", IntegerType, nullable = false),
      StructField("data_type", StringType, nullable = false))), rows)
      .orderBy("table_name", "ordinal_position")
  }

  /** information_schema.schemata (system_tables.py SCHEMATA): the fixed
    * system schemas plus one row per registered integration. */
  def infoSchemata(): DataFrame =
    frame(StructType(Seq(
      StructField("catalog_name", StringType, nullable = false),
      StructField("schema_name", StringType, nullable = false))),
      Seq(Row("def", "information_schema"), Row("def", "graft")) ++
        databases.keys.map(n => Row("def", n.toString)).toSeq)
      .orderBy("schema_name")

  /** Per-column table statistics — the data-catalog surface
    * (reference: interfaces/data_catalog/, MetaDatabaseHandler
    * `meta_get_column_statistics`, integrations/libs/base.py:178-341).
    * Computed by [[analyzeTable]], stored per table, served through
    * `information_schema.column_statistics`. */
  private val columnStats = scala.collection.mutable.LinkedHashMap[String, Seq[Row]]()

  private val columnStatsSchema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("ordinal_position", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_value", StringType),
    StructField("max_value", StringType)))

  /** ANALYZE TABLE: exact per-column statistics (row count, nulls,
    * distinct count, min/max as strings) in ONE aggregation pass — the
    * multi-distinct agg plans as a single Expand over the scan, so at
    * 100 TB this is one full-table pass, never per-column rescans.
    * Results persist in the catalog and re-ANALYZE overwrites. */
  def analyzeTable(name: String, wh: Option[Warehouse] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max, min}
    val df = resolve(name, wh)
    val fields = df.schema.fields
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(count(col(f.name)).as(s"__c$i"),
        countDistinct(col(f.name)).as(s"__d$i"),
        min(col(f.name)).cast(StringType).as(s"__mn$i"),
        max(col(f.name)).cast(StringType).as(s"__mx$i"))
    } :+ count(lit(1)).as("__n")
    val r = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val n = r.getAs[Long]("__n")
    columnStats(name) = fields.zipWithIndex.toSeq.map { case (f, i) =>
      Row(name, f.name, i + 1, n, n - r.getAs[Long](s"__c$i"),
        r.getAs[Long](s"__d$i"), r.getAs[String](s"__mn$i"), r.getAs[String](s"__mx$i"))
    }
    // the SAME exact numbers, in the shape Catalyst's cost-based
    // optimizer consumes (CatalogStatistics → toPlanStats):
    // registerBase attaches them to the relation on the next statement,
    // so CostBasedJoinReorder and broadcast decisions see real
    // rowCount/NDV/min-max instead of file-size guesses
    cboStatistics(name) = buildCboStats(n, fields.zipWithIndex.toSeq.map {
      case (f, i) => (f, n - r.getAs[Long](s"__c$i"), r.getAs[Long](s"__d$i"),
        Option(r.getAs[String](s"__mn$i")), Option(r.getAs[String](s"__mx$i")))
    })
    infoColumnStatistics(Some(name))
  }

  private val cboStatistics =
    new Registry[org.apache.spark.sql.catalyst.catalog.CatalogStatistics]()

  private def buildCboStats(rowCount: Long,
      cols: Seq[(StructField, Long, Long, Option[String], Option[String])])
      : org.apache.spark.sql.catalyst.catalog.CatalogStatistics = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
    import org.apache.spark.sql.types._
    val colStats = cols.map { case (f, nulls, ndv, mn, mx) =>
      // min/max only for types whose external-string form Catalyst
      // parses back losslessly; strings/binary/nested keep NDV+nulls
      val comparable = f.dataType match {
        case _: NumericType | BooleanType | DateType => true
        case _ => false
      }
      val len = f.dataType match {
        case StringType => 20L // Spark's own default string width
        case BinaryType => 100L
        case dt => dt.defaultSize.toLong
      }
      f.name -> CatalogColumnStat(
        distinctCount = Some(BigInt(ndv)),
        min = if (comparable) mn else None,
        max = if (comparable) mx else None,
        nullCount = Some(BigInt(nulls)),
        avgLen = Some(len), maxLen = Some(len))
    }.toMap
    val rowWidth = cols.map { case (f, _, _, _, _) => f.dataType match {
      case StringType => 20L + 8L
      case dt => dt.defaultSize.toLong
    }}.sum.max(8L)
    CatalogStatistics(
      sizeInBytes = BigInt(rowCount) * rowWidth,
      rowCount = Some(BigInt(rowCount)),
      colStats = colStats)
  }

  /** Attach this table's ANALYZE statistics to a DataFrame's scan
    * relation, if it has been ANALYZEd — a no-op otherwise. Catalyst's
    * `LogicalRelation.computeStats` prefers `catalogTable.stats` when
    * CBO is on, so wrapping the relation in a minimal CatalogTable is
    * the plan-level seam that feeds the exact engine-computed
    * statistics into join reordering and broadcast thresholds. */
  def attachCboStats(name: String, df: DataFrame): DataFrame =
    cboStatistics.get(name) match {
      case None => df
      case Some(stats) =>
        import org.apache.spark.sql.catalyst.TableIdentifier
        import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
        import org.apache.spark.sql.execution.datasources.LogicalRelation
        val plan = df.queryExecution.analyzed.transform {
          case lr: LogicalRelation if lr.catalogTable.isEmpty =>
            lr.copy(catalogTable = Some(CatalogTable(
              identifier = TableIdentifier(name),
              tableType = CatalogTableType.EXTERNAL,
              storage = CatalogStorageFormat.empty,
              schema = lr.schema,
              provider = Some("parquet"),
              stats = Some(stats))))
        }
        org.apache.spark.sql.GraftColumnBridge.ofRows(spark, plan)
    }

  /** DML staleness guard (wired to Warehouse.addMutationListener by the
    * session layer): after a write, ANALYZE-time column statistics no
    * longer describe the data — a table can double under INSERT/MERGE
    * while CBO still plans on the old rowCount, holding a broadcast
    * past its real size. Keep the cheap exact cardinality (parquet
    * footer count — a driver-side metadata walk) so join reorder and
    * broadcast selection still see real sizes, but drop NDV/min-max
    * until the next ANALYZE. Only refreshes tables that HAVE statistics:
    * un-ANALYZEd tables keep Catalyst's size-based estimates. */
  def refreshCboStatsAfterWrite(name: String, exactRows: => Long): Unit =
    cboStatistics.get(name).foreach { st =>
      val n = exactRows
      if (n <= 0L) { cboStatistics.remove(name); columnStats.remove(name) }
      else {
        val perRow = st.rowCount.filter(_ > 0)
          .map(r => (st.sizeInBytes / r).max(BigInt(8))).getOrElse(BigInt(8))
        cboStatistics(name) = org.apache.spark.sql.catalyst.catalog.CatalogStatistics(
          sizeInBytes = BigInt(n) * perRow,
          rowCount = Some(BigInt(n)), colStats = Map.empty)
      }
    }

  /** information_schema.column_statistics: every ANALYZEd table's stats
    * (optionally one table's). */
  def infoColumnStatistics(table: Option[String] = None): DataFrame =
    frame(columnStatsSchema,
      table.fold(columnStats.values.flatten.toSeq)(t => columnStats.getOrElse(t, Nil)))
      .orderBy("table_name", "ordinal_position")

  /** information_schema.META_TABLES (system_tables.py:515 — the
    * data-catalog add-on table): one row per ANALYZEd table, the
    * reference's "tables with loaded data-catalog records" scope, with
    * ROW_COUNT from the stored statistics. Metadata-sized at any corpus
    * scale — reads only catalog state. */
  def metaTables(wh: Option[Warehouse] = None): DataFrame =
    frame(StructType(Seq(
      StructField("TABLE_CATALOG", StringType, nullable = false),
      StructField("TABLE_SCHEMA", StringType, nullable = false),
      StructField("TABLE_NAME", StringType, nullable = false),
      StructField("TABLE_TYPE", StringType, nullable = false),
      StructField("TABLE_DESCRIPTION", StringType),
      StructField("ROW_COUNT", LongType))),
      columnStats.toSeq
        // stale catalog records of since-dropped tables are skipped, not
        // thrown: one DROP TABLE must never break the whole listing
        .filter { case (t, _) => scala.util.Try(resolve(t, wh)).isSuccess }
        .map { case (t, rows) =>
          val tpe = if (views.contains(t)) "VIEW" else "BASE TABLE"
          Row("def", "graft", t, tpe, null,
            rows.headOption.map(_.getAs[Long](3)).orNull)
        }).orderBy("TABLE_NAME")

  /** information_schema.META_COLUMNS (system_tables.py:543): per-column
    * data-catalog records of the ANALYZEd tables — type + nullability
    * from the live schema, reference column set. */
  def metaColumns(wh: Option[Warehouse] = None): DataFrame =
    frame(StructType(Seq(
      StructField("TABLE_CATALOG", StringType, nullable = false),
      StructField("TABLE_SCHEMA", StringType, nullable = false),
      StructField("TABLE_NAME", StringType, nullable = false),
      StructField("COLUMN_NAME", StringType, nullable = false),
      StructField("DATA_TYPE", StringType, nullable = false),
      StructField("COLUMN_DESCRIPTION", StringType),
      StructField("COLUMN_DEFAULT", StringType),
      StructField("IS_NULLABLE", StringType, nullable = false))),
      columnStats.keys.toSeq.flatMap { t =>
        // skip since-dropped tables (see metaTables)
        scala.util.Try(resolve(t, wh)).toOption.toSeq.flatMap(
          _.schema.fields.map(f =>
            Row("def", "graft", t, f.name, f.dataType.sql, null, null,
              if (f.nullable) "YES" else "NO")))
      }).orderBy("TABLE_NAME", "COLUMN_NAME")

  /** Data-catalog metadata rendered as one string for LLM/agent context
    * (DataCatalogRetriever.retrieve_metadata_as_string,
    * data_catalog_retriever.py:46-72): per table a header plus one line
    * per column with type and, when ANALYZEd, its statistics. Reads only
    * catalog state + schemas — no data scan beyond what ANALYZE stored. */
  def dataCatalogString(tables: Seq[String], wh: Option[Warehouse] = None): String = {
    val sections = tables.map { t =>
      val stats = columnStats.getOrElse(t, Nil)
        .map(r => r.getString(1) -> r).toMap
      val nRows = stats.values.headOption.map(_.getAs[Long](3))
      val header = s"Table: $t" + nRows.fold("")(n => s" ($n rows)")
      val cols = resolve(t, wh).schema.fields.map { f =>
        val base = s"  - ${f.name} ${f.dataType.sql}"
        stats.get(f.name).fold(base) { r =>
          base + s", distinct=${r.getAs[Long](5)}, nulls=${r.getAs[Long](4)}" +
            s", range=[${r.getAs[String](6)} .. ${r.getAs[String](7)}]"
        }
      }
      (header +: cols.toSeq).mkString("\n")
    }
    ("Data Catalog:" +: sections).mkString("\n\n")
  }

  /** information_schema.statistics — the index-layout surface
    * (system_tables.py:441 STATISTICS): one row per physical access
    * structure a table carries. For a parquet-backed warehouse that
    * means hive-style partition layouts, session-catalog bucket specs
    * (the co-located-join primitive), and KB IVF coarse indexes.
    * `cardinality` is filled from ANALYZE statistics when present
    * (partition/bucket columns) or the trained cell count (IVF). */
  def infoStatistics(wh: Option[Warehouse] = None): DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    def card(t: String, c: String): Any =
      columnStats.getOrElse(t, Nil).find(_.getString(1) == c)
        .map(_.getAs[Long](5)).orNull
    wh.foreach { w =>
      w.listTables().filterNot(_.startsWith("__kb_")).foreach { t =>
        w.partitionColumn(t).foreach { pc =>
          rows += Row(t, "partition", pc, 1, card(t, pc))
        }
        w.bucketSpec(t).foreach { case (cols, n) =>
          cols.zipWithIndex.foreach { case (bc, i) =>
            rows += Row(t, s"bucket_$n", bc, i + 1, card(t, bc))
          }
        }
      }
      listKbs().foreach { kb =>
        this.kb(kb).filter(k => w.exists(s"${k.storage}_cents")).foreach { k =>
          rows += Row(kb, "ivf", "embedding", 1, w.table(s"${k.storage}_cents").count())
        }
      }
    }
    frame(StructType(Seq(
      StructField("table_name", StringType), StructField("index_name", StringType),
      StructField("column_name", StringType), StructField("seq_in_index", IntegerType),
      StructField("cardinality", LongType))),
      rows.toSeq).orderBy("table_name", "index_name", "seq_in_index")
  }

  /** information_schema.key_column_usage (system_tables.py:423): the
    * layout-defining key columns as constraint rows — bucket and
    * partition columns are the engine's co-location "keys". */
  def infoKeyColumnUsage(wh: Option[Warehouse] = None): DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    wh.foreach { w =>
      w.listTables().filterNot(_.startsWith("__kb_")).foreach { t =>
        w.partitionColumn(t).foreach(pc => rows += Row(s"partition_$t", t, pc, 1))
        w.bucketSpec(t).foreach { case (cols, _) =>
          cols.zipWithIndex.foreach { case (bc, i) =>
            rows += Row(s"bucket_$t", t, bc, i + 1)
          }
        }
      }
    }
    frame(StructType(Seq(
      StructField("constraint_name", StringType), StructField("table_name", StringType),
      StructField("column_name", StringType), StructField("ordinal_position", IntegerType))),
      rows.toSeq).orderBy("constraint_name", "ordinal_position")
  }

  // ----------------------------------------------------------- meta tables
  // (the MindsDB-side tables: mindsdb_tables.py MODELS :42, DATABASES
  // :141, JOBS :236, TRIGGERS :300, KNOWLEDGE_BASES :360, AGENTS :430)

  /** Engine label for the models meta-table (the reference's MODELS rows
    * carry the ml-engine used to train them, mindsdb_tables.py:42). */
  private def engineOf(m: graft.ml.Model): String = m match {
    case t: graft.ml.TimeSeries.TsModel => t.engine
    case _: graft.ml.KMeans.KmModel => "kmeans"
    case _: graft.ml.Anomaly.AnomalyModel => "anomaly"
    case _: graft.ml.NaiveBayes.NbModel => "nb"
    case _ => "fit"
  }

  /** Secret masking (test_hide_secrets; the reference hides credential
    * values in every meta-table until `SET show_secrets = true`). The
    * flag is session state: the SET handler flips it here so every
    * meta-frame built afterwards reflects it. */
  @volatile var showSecrets: Boolean = false
  private val SecretKeys =
    Set("password", "api_key", "secret", "token", "access_key")
  private def maskVal(k: String, v: String): String =
    if (!showSecrets && SecretKeys.contains(k.toLowerCase)) "******" else v
  private def renderParams(params: Map[String, String]): String =
    params.toSeq.sorted.map { case (a, b) => s"$a=${maskVal(a, b)}" }.mkString(",")

  /** Param map with secrets masked under the session flag — the same
    * rule the meta-tables apply, for verbs that surface params as rows
    * (DESCRIBE DATABASE). */
  def maskedParams(params: Map[String, String]): Seq[(String, String)] =
    params.toSeq.sortBy(_._1).map { case (k, v) => k -> maskVal(k, v) }

  def metaModels(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", IntegerType, nullable = false),
      StructField("active", BooleanType, nullable = false),
      StructField("predict", StringType, nullable = false),
      StructField("features", StringType, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("engine", StringType, nullable = false),
      StructField("training_options", StringType, nullable = false))),
      models.toSeq.flatMap { case (n, e) =>
        e.versions.zipWithIndex.map { case ((m, _), i) =>
          Row(n, i + 1, i + 1 == e.active, m.outputSchema.fieldNames.mkString(","),
            m.featureCols.mkString(","), "complete", engineOf(m),
            renderParams(e.using))
        }
      }).orderBy("name", "version")

  def metaDatabases(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("engine", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("connection_data", StringType, nullable = false))),
      // the reference's always-present databases (database.py:54-63):
      // information_schema + log are system, files is the builtin
      // upload-storage integration
      Seq(Row("information_schema", "information_schema", "system", ""),
        Row("log", "log", "system", ""),
        Row("files", "files", "data", ""),
        Row("graft", "graft", "project", "")) ++
        databases.values.map(d => Row(d.name, d.engine,
          if (d.engine == "mindsdb") "project" else "data",
          renderParams(d.params))).toSeq)
      .orderBy("name")

  /** Projects = the default project plus every mindsdb-engine database
    * (reference: projects are databases with engine `mindsdb`;
    * `SHOW PROJECTS` filters the database list to that class). */
  def metaProjects(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false))),
      Row("graft") +:
        databases.values.filter(_.engine == "mindsdb").map(d => Row(d.name)).toSeq)
      .orderBy("name")

  def metaJobs(jobs: graft.incremental.Jobs): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("schedule", StringType, nullable = false),
      StructField("active", BooleanType, nullable = false),
      StructField("query", StringType, nullable = false),
      StructField("if_query", StringType),
      StructField("next_run_at", TimestampType),
      StructField("last_run_at", TimestampType))),
      jobs.list().map(j => Row(j.name, j.schedule, j.active,
        j.queryText, if (j.ifQueryText.isEmpty) null else j.ifQueryText,
        if (j.nextRun == java.time.Instant.EPOCH) null
        else java.sql.Timestamp.from(j.nextRun),
        jobs.lastRunAt(j.name).map(java.sql.Timestamp.from).orNull)))
      .orderBy("name")

  def metaKnowledgeBases(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("storage", StringType, nullable = false),
      StructField("params", StringType, nullable = false))),
      kbs.values.map(k => Row(k.name, k.storage,
        k.params.toSeq.sorted.map { case (a, b) => s"$a=$b" }.mkString(","))).toSeq)
      .orderBy("name")

  def metaAgents(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("model_name", StringType, nullable = false))),
      agents.values.map(a => Row(a.name, a.model)).toSeq)
      .orderBy("name")

  def metaSkills(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("params", StringType, nullable = false))),
      skills.values.map(sk => Row(sk.name, sk.skillType,
        sk.params.toSeq.sorted.map { case (a, b) => s"$a=$b" }.mkString(","))).toSeq)
      .orderBy("name")

  def metaTriggers(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("query", StringType, nullable = false))),
      triggers.values.map(t => Row(t.name, t.tableName, t.sql)).toSeq)
      .orderBy("name")

  def metaChatbots(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("database", StringType, nullable = false),
      StructField("model_name", StringType),
      StructField("agent_name", StringType),
      StructField("is_running", BooleanType, nullable = false))),
      chatbots.values.map(c =>
        Row(c.name, c.database, c.model.orNull, c.agent.orNull, c.isRunning)).toSeq)
      .orderBy("name")

  def metaMlEngines(): DataFrame =
    frame(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("connection_data", StringType, nullable = false))),
      mlEngines.values.map(e => Row(e.name, e.handler,
        renderParams(e.params))).toSeq)
      .orderBy("name")

  def metaViews(): DataFrame =
    frame(StructType(Seq(StructField("name", StringType, nullable = false))),
      views.keys.map(n => Row(n.toString)).toSeq).orderBy("name")

  /** SHOW TABLES / DESCRIBE surface (command_executor.py:1577-1953, :882). */
  def showTables(wh: Option[Warehouse] = None): DataFrame = infoTables(wh)

  /** `SHOW TABLES FROM <db>` scoped to ONE registered database: listed
    * live from its DSv2 catalog across its namespaces (engine-system
    * schemas filtered), so a federated source answers its own current
    * content — never the global catalog (MySQL semantics; the reference
    * routes through the named datanode's get_tables). */
  def showDbTables(db: String): DataFrame = {
    require(databases.contains(db.toLowerCase),
      s"database $db does not exist")
    import org.apache.spark.sql.connector.catalog.{SupportsNamespaces, TableCatalog}
    val cat =
      try spark.sessionState.catalogManager.catalog(db)
      catch { case _: Exception => null }
    val names: Seq[String] = cat match {
      case t: TableCatalog =>
        val nss: Seq[Array[String]] = cat match {
          case s: SupportsNamespaces =>
            val l = try s.listNamespaces().toSeq catch { case _: Exception => Seq.empty }
            // engine system schemas (Derby SYS*/SQLJ/NULLID) are not
            // user content
            val user = l.filterNot(ns => ns.headOption.exists(h =>
              h.toUpperCase.startsWith("SYS") ||
                Set("SQLJ", "NULLID").contains(h.toUpperCase)))
            if (user.isEmpty) Seq(Array.empty[String]) else user
          case _ => Seq(Array.empty[String])
        }
        nss.flatMap(ns =>
          try t.listTables(ns).toSeq.map(_.name)
          catch { case _: Exception => Seq.empty })
      case _ => Seq.empty
    }
    frame(StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("table_type", StringType, nullable = false))),
      names.distinct.sorted.map(n => Row(n, "BASE TABLE")))
  }
  def describe(name: String, wh: Option[Warehouse] = None): DataFrame =
    infoColumns(Seq(name), wh)
}

object Catalog {
  final case class KbEntity(name: String, params: Map[String, String],
      /** BM25 corpus stats (N, avgdl) computed at ingest time — the
        * index-build-time aggregate that must never run per query. */
      stats: Option[(Long, Double)] = None) {
    /** chunk-storage table name inside the session warehouse. */
    def storage: String = s"__kb_$name"
  }
  final case class AgentEntity(name: String, model: String, params: Map[String, String])
  /** One skill (db.py:434 Skills: name/type/params). `tables` in params
    * is the text2sql table allowlist, comma-separated in declared order. */
  final case class SkillEntity(name: String, skillType: String, params: Map[String, String])
  final case class DbEntity(name: String, engine: String, params: Map[String, String])
  final case class TriggerEntity(name: String, tableName: String, sql: String)
  final case class ChatbotEntity(name: String, database: String,
      model: Option[String], agent: Option[String], isRunning: Boolean,
      params: Map[String, String])
  final case class MlEngineEntity(name: String, handler: String, params: Map[String, String])
}

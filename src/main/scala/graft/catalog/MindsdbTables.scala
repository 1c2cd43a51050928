package graft.catalog

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `mindsdb` project namespace as a real SQL catalog: MODELS,
  * DATABASES, ML_ENGINES, HANDLERS, JOBS, TRIGGERS, CHATBOTS,
  * KNOWLEDGE_BASES, AGENTS, SKILLS, VIEWS and QUERIES are SELECT-able
  * tables that JOIN/WHERE like any other relation — the reference serves
  * the same set from its project datanode
  * (datahub/datanodes/mindsdb_tables.py:42-430), which is what lets
  * scripts and BI tools introspect the server with plain SQL instead of
  * SHOW verbs.
  *
  * Same design as [[InfoSchema]]: a read-only DSv2 catalog whose tables
  * are live thunks over the session [[Catalog]] state, evaluated at
  * `loadTable` time so every query sees current metadata. All frames are
  * catalog-row-sized (∝ number of registered objects, never data rows),
  * so the driver-side materialization is trivially small at any scale.
  */
object MindsdbTables {
  /** table name → live frame producer; process-wide FALLBACK (last bind
    * wins). Sessions resolve through [[lookup]], which prefers the
    * THREAD-LOCAL binding set at [[graft.sqlx.Commands]] construction —
    * concurrent sessions over different catalogs (tenant isolation) must
    * each see their own meta-tables; see [[InfoSchema]] for the
    * analysis-thread reasoning. */
  val providers: TrieMap[String, () => DataFrame] = TrieMap.empty
  private val localProviders =
    new ThreadLocal[scala.collection.Map[String, () => DataFrame]]

  private[catalog] def lookup(name: String): Option[() => DataFrame] =
    Option(localProviders.get).flatMap(_.get(name)).orElse(providers.get(name))
  private[catalog] def boundNames: Iterable[String] =
    Option(localProviders.get).map(_.keys).getOrElse(providers.keys)

  /** Re-assert a session's binding on the current thread (see
    * [[InfoSchema.setLocal]]). */
  def setLocal(m: scala.collection.Map[String, () => DataFrame]): Unit =
    localProviders.set(m)

  val CatalogName = "mindsdb"

  /** Bind the project meta-tables to a session's catalog state and
    * register the DSv2 catalog under `mindsdb`. */
  def bind(spark: org.apache.spark.sql.SparkSession, cat: Catalog,
      jobs: graft.incremental.Jobs,
      queries: () => DataFrame,
      mviews: () => Seq[String])
      : scala.collection.Map[String, () => DataFrame] = {
    // shadow the object field: assignments land in THIS session's map,
    // merged into the global fallback at the end
    val providers = TrieMap.empty[String, () => DataFrame]
    providers("models") = () => cat.metaModels()
    providers("databases") = () => cat.metaDatabases()
    providers("projects") = () => cat.metaProjects()
    providers("ml_engines") = () => cat.metaMlEngines()
    providers("jobs") = () => cat.metaJobs(jobs)
    providers("triggers") = () => cat.metaTriggers()
    providers("chatbots") = () => cat.metaChatbots()
    providers("knowledge_bases") = () => cat.metaKnowledgeBases()
    providers("agents") = () => cat.metaAgents()
    providers("skills") = () => cat.metaSkills()
    providers("queries") = queries

    // handlers: the pluggable engines this build ships (the reference
    // lists its installed integration/ML handlers, mindsdb_tables.py:202)
    providers("handlers") = () => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("byom", "ml", true), Row("fit", "ml", true),
          Row("files", "data", true), Row("mem", "data", true)), 1),
        StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("type", StringType, nullable = false),
          StructField("import_success", BooleanType, nullable = false))))
    }

    // views: plain + materialized in one table (mindsdb_tables.py keeps
    // them distinct classes; a `type` column captures both)
    providers("views") = () => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val rows = cat.listViews().map(n => Row(n, "view")) ++
        mviews().map(n => Row(n, "materialized"))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("type", StringType, nullable = false))))
    }

    MindsdbTables.providers ++= providers // process-wide fallback
    localProviders.set(providers) // tenant-correct for this session's thread
    spark.conf.set(s"spark.sql.catalog.$CatalogName",
      classOf[MindsdbCatalog].getName)
    providers
  }
}

class MindsdbCatalog extends TableCatalog {
  private var catalogName = MindsdbTables.CatalogName
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MindsdbTables.boundNames.map(n => Identifier.of(namespace, n)).toArray

  override def loadTable(ident: Identifier): Table =
    MindsdbTables.lookup(ident.name().toLowerCase) match {
      case Some(thunk) =>
        val df = thunk()
        new graft.federation.MemTable(ident.name(), df.schema, df.collect().toSeq)
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq(catalogName, ident.name()))
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("mindsdb meta-tables are read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("mindsdb meta-tables are read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("mindsdb meta-tables are read-only")
}

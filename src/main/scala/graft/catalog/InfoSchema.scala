package graft.catalog

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `information_schema` as a real SQL namespace: a read-only DSv2 catalog
  * whose tables are produced live from the session [[Catalog]] /
  * [[Warehouse]] state, so `SELECT * FROM information_schema.columns`
  * resolves through Spark's standard multi-catalog path (reference:
  * datahub/datanodes/system_tables.py:48-543 — the reference serves the
  * same tables from its information_schema datanode).
  *
  * Providers are thunks evaluated at `loadTable` time — every query sees
  * the namespace as it stands, including warehouse tables created a
  * statement ago. The frames are catalog metadata (rows ∝ number of
  * tables × columns), so the driver-side collect is trivially small at
  * any data scale.
  */
object InfoSchema {
  /** table name → live frame producer; process-wide FALLBACK (last bind
    * wins). Sessions resolve through [[lookup]], which prefers the
    * THREAD-LOCAL binding set at [[graft.sqlx.Commands]] construction —
    * concurrent sessions over different catalogs (tenant isolation, one
    * per server connection/request) must each see THEIR OWN meta-tables,
    * and DSv2 loadTable runs at analysis time on the session's thread. */
  val providers: TrieMap[String, () => DataFrame] = TrieMap.empty
  private val localProviders =
    new ThreadLocal[scala.collection.Map[String, () => DataFrame]]

  private[catalog] def lookup(name: String): Option[() => DataFrame] =
    Option(localProviders.get).flatMap(_.get(name)).orElse(providers.get(name))
  private[catalog] def boundNames: Iterable[String] =
    Option(localProviders.get).map(_.keys).getOrElse(providers.keys)

  /** Re-assert a session's binding on the current thread — called at
    * every Commands.execute so two sessions over different tenants can
    * interleave on one thread. */
  def setLocal(m: scala.collection.Map[String, () => DataFrame]): Unit =
    localProviders.set(m)

  val CatalogName = "information_schema"

  /** Bind the info-schema tables to a session's catalog state and
    * register the DSv2 catalog under `information_schema`. */
  def bind(spark: org.apache.spark.sql.SparkSession, cat: Catalog, wh: Warehouse,
      jobs: Option[graft.incremental.Jobs] = None)
      : scala.collection.Map[String, () => DataFrame] = {
    // shadow the object field: assignments below land in THIS session's
    // map, merged into the global fallback at the end
    val providers = TrieMap.empty[String, () => DataFrame]
    providers("tables") = () => cat.infoTables(Some(wh))
    providers("columns") = () => {
      val names = graft.engine.Tables.names ++
        wh.listTables().filterNot(_.startsWith("__kb_")) ++ cat.listViews()
      cat.infoColumns(names, Some(wh))
    }
    providers("schemata") = () => cat.infoSchemata()
    providers("statistics") = () => cat.infoStatistics(Some(wh))
    providers("column_statistics") = () => cat.infoColumnStatistics()
    providers("key_column_usage") = () => cat.infoKeyColumnUsage(Some(wh))
    // data-catalog add-on tables (system_tables.py:515,543): the
    // ANALYZE-populated catalog state as SELECT-able tables
    providers("meta_tables") = () => cat.metaTables(Some(wh))
    providers("meta_columns") = () => cat.metaColumns(Some(wh))

    // ---- MySQL-compat catalog tables (system_tables.py:346-543): BI
    // tools introspect THESE as SQL tables, not just the SHOW verbs.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def const(schema: StructType, rows: Seq[Row]): () => DataFrame =
      () => spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)

    providers("engines") = const(
      StructType(Seq(
        StructField("engine", StringType), StructField("support", StringType),
        StructField("comment", StringType), StructField("transactions", StringType),
        StructField("xa", StringType), StructField("savepoints", StringType))),
      Seq(Row("InnoDB", "DEFAULT",
        "Supports transactions, row-level locking, and foreign keys",
        "YES", "YES", "YES")))

    providers("character_sets") = const(
      StructType(Seq(
        StructField("character_set_name", StringType),
        StructField("default_collate_name", StringType),
        StructField("description", StringType),
        StructField("maxlen", IntegerType))),
      // values per COLUMN semantics (the reference's data rows swap
      // collate/description against its own column list — a bug not
      // worth replicating, like the EXCEPT fix)
      Seq(Row("utf8", "utf8_general_ci", "UTF-8 Unicode", 3),
        Row("latin1", "latin1_swedish_ci", "cp1252 West European", 1),
        Row("utf8mb4", "utf8mb4_general_ci", "UTF-8 Unicode", 4)))

    providers("collations") = const(
      StructType(Seq(
        StructField("collation_name", StringType),
        StructField("character_set_name", StringType),
        StructField("id", LongType), StructField("is_default", StringType),
        StructField("is_compiled", StringType), StructField("sortlen", LongType),
        StructField("pad_attribute", StringType))),
      Seq(Row("utf8_general_ci", "utf8", 33L, "Yes", "Yes", 1L, "PAD SPACE"),
        Row("latin1_swedish_ci", "latin1", 8L, "Yes", "Yes", 1L, "PAD SPACE")))

    providers("plugins") = const(
      StructType(Seq(
        StructField("plugin_name", StringType), StructField("plugin_version", StringType),
        StructField("plugin_status", StringType), StructField("plugin_type", StringType),
        StructField("plugin_library", StringType), StructField("plugin_license", StringType),
        StructField("load_option", StringType))),
      // the rows MySQL-protocol clients actually probe for
      Seq(Row("InnoDB", "8.0", "ACTIVE", "STORAGE ENGINE", null, "GPL", "ON"),
        Row("mysql_native_password", "1.0", "ACTIVE", "AUTHENTICATION", null, "GPL", "ON")))

    // EVENTS is LIVE: one row per scheduled job (the MySQL event
    // scheduler analog of CREATE JOB — system_tables.py:315-343)
    providers("events") = () => {
      val schema = StructType(Seq(
        StructField("event_catalog", StringType), StructField("event_schema", StringType),
        StructField("event_name", StringType), StructField("event_body", StringType),
        StructField("event_definition", StringType), StructField("event_type", StringType),
        StructField("interval_value", StringType), StructField("interval_field", StringType),
        StructField("starts", StringType), StructField("ends", StringType),
        StructField("status", StringType), StructField("on_completion", StringType)))
      val rows = jobs.toSeq.flatMap(_.list()).map { j =>
        // schedule text is "every [N] unit" (Jobs.parseSchedule); a bare
        // unit means every 1 of it
        val parts = j.schedule.trim.toLowerCase.stripPrefix("every")
          .trim.split("\\s+") match {
          case Array(p) => Array("1", p)
          case other => other
        }
        Row("def", "graft", j.name, "SQL", j.schedule, "RECURRING",
          parts(0),
          if (parts.length > 1) parts(1).toUpperCase else null,
          j.start.map(_.toString).orNull, j.end.map(_.toString).orNull,
          if (j.active) "ENABLED" else "DISABLED", "NOT PRESERVE")
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    }

    // ROUTINES: the session-registered SQL functions (AiFunctions +
    // custom aggregates), i.e. what a BI tool may call in queries
    val routinesSchema = StructType(Seq(
      StructField("specific_name", StringType), StructField("routine_catalog", StringType),
      StructField("routine_schema", StringType), StructField("routine_name", StringType),
      StructField("routine_type", StringType), StructField("data_type", StringType),
      StructField("routine_body", StringType), StructField("routine_definition", StringType),
      StructField("is_deterministic", StringType), StructField("sql_data_access", StringType)))
    // rebuilt per read: CREATE FUNCTION appends to userRoutines live
    providers("routines") = () => spark.createDataFrame(
      spark.sparkContext.parallelize(
        graft.functions.AiFunctions.routineRows.map { case (n, t, defn) =>
          Row(n, "def", "graft", n, "FUNCTION", t, "EXTERNAL", defn, "YES", "NO SQL")
        } ++ graft.functions.AiFunctions.userRoutines.map { case (n, t, defn) =>
          Row(n, "def", "graft", n, "FUNCTION", t, "SQL", defn, "YES", "CONTAINS SQL")
        }, 1), routinesSchema)

    InfoSchema.providers ++= providers // process-wide fallback
    localProviders.set(providers) // tenant-correct for this session's thread
    spark.conf.set(s"spark.sql.catalog.$CatalogName", classOf[InfoSchemaCatalog].getName)
    providers
  }
}

class InfoSchemaCatalog extends TableCatalog {
  private var catalogName = InfoSchema.CatalogName
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    InfoSchema.boundNames.map(n => Identifier.of(namespace, n)).toArray

  override def loadTable(ident: Identifier): Table =
    InfoSchema.lookup(ident.name().toLowerCase) match {
      case Some(thunk) =>
        val df = thunk()
        new graft.federation.MemTable(ident.name(), df.schema, df.collect().toSeq)
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq(catalogName, ident.name()))
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("information_schema is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("information_schema is read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("information_schema is read-only")
}

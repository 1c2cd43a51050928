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
  /** table name → live frame producer; (re)bound by [[graft.sqlx.Commands]]. */
  val providers: TrieMap[String, () => DataFrame] = TrieMap.empty

  val CatalogName = "information_schema"

  /** Bind the info-schema tables to a session's catalog state and
    * register the DSv2 catalog under `information_schema`. */
  def bind(spark: org.apache.spark.sql.SparkSession, cat: Catalog, wh: Warehouse): Unit = {
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
    spark.conf.set(s"spark.sql.catalog.$CatalogName", classOf[InfoSchemaCatalog].getName)
  }
}

class InfoSchemaCatalog extends TableCatalog {
  private var catalogName = InfoSchema.CatalogName
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    InfoSchema.providers.keys.map(n => Identifier.of(namespace, n)).toArray

  override def loadTable(ident: Identifier): Table =
    InfoSchema.providers.get(ident.name().toLowerCase) match {
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

package graft.catalog

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** AI-object + relational catalog: named views, registered models,
  * knowledge bases, jobs — the namespace the reference keeps per
  * "project" (interfaces/database/projects.py) — plus the
  * `information_schema` surface (datahub/datanodes/system_tables.py:48-543,
  * mindsdb_tables.py:42-430).
  *
  * Views are stored as DataFrame-producing thunks and expanded at
  * resolution time (command_executor.py:1350-1388 → expansion in
  * project_datanode.py:103-173): querying a view IS querying its
  * definition — Catalyst inlines it, so filters/prunes push through the
  * view boundary into the underlying scans.
  */
final class Catalog(val spark: SparkSession, val sfDir: String) {

  private val views = scala.collection.mutable.LinkedHashMap[String, () => DataFrame]()
  private val models = scala.collection.mutable.LinkedHashMap[String, graft.ml.Model]()

  // ------------------------------------------------------------ resolution

  /** Resolve a table name: warehouse and views shadow base tables. */
  def resolve(name: String, wh: Option[Warehouse] = None): DataFrame =
    views.get(name).map(_.apply())
      .orElse(wh.filter(_.exists(name)).map(_.table(name)))
      .getOrElse(Tables.table(spark, sfDir, name))

  // ---------------------------------------------------------------- views

  def createView(name: String, df: => DataFrame): Unit = views(name) = () => df
  def dropView(name: String): Unit = views.remove(name)
  def listViews(): Seq[String] = views.keys.toSeq

  // --------------------------------------------------------------- models

  def createModel(m: graft.ml.Model): Unit = models(m.name) = m
  def model(name: String): graft.ml.Model = models(name)
  def listModels(): Seq[String] = models.keys.toSeq

  // ----------------------------------------------------- information_schema

  /** information_schema.tables (system_tables.py:67). */
  def infoTables(wh: Option[Warehouse] = None): DataFrame = {
    val base = Tables.names.map(n => Row(n, "BASE TABLE"))
    val v = views.keys.map(n => Row(n.toString, "VIEW")).toSeq
    val w = wh.map(_.listTables().map(n => Row(n, "BASE TABLE"))).getOrElse(Nil)
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("table_type", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ v ++ w, 1), schema)
      .orderBy("table_name")
  }

  /** information_schema.columns (system_tables.py:280): name + 1-based
    * ordinal + Spark SQL type per column of every resolvable table. */
  def infoColumns(tables: Seq[String] = Tables.names): DataFrame = {
    val rows = tables.flatMap { t =>
      resolve(t).schema.fields.zipWithIndex.map { case (f, i) =>
        Row(t, f.name, i + 1, f.dataType.sql)
      }
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("ordinal_position", IntegerType, nullable = false),
      StructField("data_type", StringType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("table_name", "ordinal_position")
  }

  /** SHOW TABLES / DESCRIBE surface (command_executor.py:1577-1953, :882). */
  def showTables(wh: Option[Warehouse] = None): DataFrame = infoTables(wh)
  def describe(name: String): DataFrame = infoColumns(Seq(name))
}

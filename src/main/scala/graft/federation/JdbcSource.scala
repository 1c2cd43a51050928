package graft.federation

import java.sql.{Connection, DriverManager}
import scala.collection.concurrent.TrieMap
import scala.util.Using
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.jdbc.{GraftDerbyDialect, JdbcDialects}
import org.apache.spark.sql.types.StringType

/** A LIVE remote-database handler over embedded Apache Derby — the real
  * JDBC seam the rest of the federation layer was designed around.
  *
  * The reference's core integration surface is a database handler with
  * connect / native_query / query / get_tables / get_columns / insert
  * (postgres_handler/postgres_handler.py:152-513). This is that handler
  * built Spark-first against a REAL SQL engine reachable without network
  * egress: Derby ships in Spark's own jar directory (it backs the Hive
  * metastore), runs embedded over `jdbc:derby:memory:`, and speaks ANSI
  * SQL through the standard JDBC driver. Every Spark-side code path here
  * — `spark.read.jdbc` scans with filter/column/aggregate/join/limit
  * pushdown, `df.write.jdbc` writes, `option("query", …)` raw-SQL
  * passthrough, `JDBCTableCatalog` multi-catalog resolution — is
  * byte-for-byte what a networked Postgres/MySQL handler uses; only the
  * URL changes when egress unblocks.
  *
  * At 100 TB the division of labor is the reference's: the remote engine
  * holds dimension/operational tables and receives pushed predicates,
  * aggregates, joins, and top-k (|result| rows cross the wire, not the
  * table); Spark holds the fact-scale data. A real cluster points the
  * same options at a warehouse URL with `partitionColumn`/`numPartitions`
  * for parallel range fetches ([[PartitionedFetch]] covers the resumable
  * keyset variant).
  */
object JdbcDb {

  /** catalog name used for the SQL-visible Derby catalog */
  val CatalogName = "rdb"

  private val dialectRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Prepend [[GraftDerbyDialect]] so every `jdbc:derby:` URL gets V2
    * join/limit pushdown (idempotent; process-wide). */
  def ensureDialect(): Unit =
    if (dialectRegistered.compareAndSet(false, true))
      JdbcDialects.registerDialect(GraftDerbyDialect())

  /** One in-memory database per dataset dir, named by content hash so a
    * rewritten dir gets a fresh database (same invalidation stance as
    * GraphOps.sharedGraphs). */
  def dbName(dir: String): String =
    "graftdb_" + java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10)

  def url(db: String): String = s"jdbc:derby:memory:$db;create=true"

  /** connect (reference: postgres_handler.connect :203) */
  def connection(db: String): Connection = DriverManager.getConnection(url(db))

  /** Server-side statement execution with no result — DDL/DML passthrough
    * (reference: native_query's OkResponse arm :306-335). */
  def executeUpdate(db: String, sql: String): Unit = {
    Using.resource(connection(db)) { c =>
      Using.resource(c.createStatement())(_.executeUpdate(sql))
    }
    // raw DML may have grown/shrunk any table behind this connection —
    // drop its ANALYZE stats so joins never plan on a pre-write COUNT
    org.apache.spark.sql.execution.datasources.v2.jdbc.GraftJdbcStats
      .invalidateUrl(url(db))
  }

  /** get_tables (reference :489) via JDBC metadata — the APP schema is
    * Derby's default user schema. */
  def tables(db: String): Seq[String] =
    Using.resource(connection(db)) { c =>
      val rs = c.getMetaData.getTables(null, "APP", "%", Array("TABLE"))
      Iterator.continually(rs).takeWhile(_.next()).map(_.getString("TABLE_NAME")).toList
    }

  // ---- Spark-side handler surface ------------------------------------

  private def reader(s: SparkSession, db: String) = {
    ensureDialect()
    s.read.format("jdbc").option("url", url(db))
  }

  /** Full-table scan as a DataFrame — filters/pruning/aggregates Spark
    * pushes ride the JDBC options (reference: query :473, which renders
    * the AST and delegates to native_query). */
  def readTable(s: SparkSession, db: String, table: String): DataFrame =
    reader(s, db).option("dbtable", table).load()

  /** Raw SQL passthrough — the statement executes verbatim in the remote
    * engine and the result streams back through the JDBC scan
    * (reference: native_query :306). Derby dialect: double-quoted
    * identifiers, `FETCH FIRST n ROWS ONLY`. */
  def nativeQuery(s: SparkSession, db: String, sql: String): DataFrame =
    reader(s, db).option("query", sql).load()

  /** PARALLEL range-partitioned scan — N concurrent JDBC connections,
    * each fetching `WHERE part_col ∈ [lo_i, hi_i)` (first/last stride
    * unbounded, so rows outside [lower, upper) are still read). This is
    * the 100 TB ingest shape: fetch bandwidth scales with executors
    * instead of serializing through one cursor (the reference's batched
    * track-column fetch, fetch_dataframe_partition.py:27-200, is the
    * sequential-resumable cousin — [[PartitionedFetch]]). */
  def partitionedRead(s: SparkSession, db: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    reader(s, db).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** insert (reference :436): append a DataFrame into a remote table. */
  def insert(df: DataFrame, db: String, table: String): Unit = {
    ensureDialect()
    df.write.format("jdbc").option("url", url(db))
      .option("dbtable", table).mode("append").save()
    // the remote table grew: its ANALYZE rowCount is stale — drop it so
    // broadcast decisions fall back to the conservative default until
    // the next ANALYZE (mirror of Catalog.refreshCboStatsAfterWrite)
    org.apache.spark.sql.execution.datasources.v2.jdbc.GraftJdbcStats
      .invalidate(url(db), table)
  }

  /** CREATE TABLE + load from a DataFrame. String columns map to
    * VARCHAR explicitly — Spark's Derby type mapping picks CLOB, which
    * Derby refuses in predicates, GROUP BY, and DISTINCT, so a seeded
    * CLOB table would silently disable every pushdown the seam exists to
    * prove. */
  def createAndLoad(df: DataFrame, db: String, table: String,
      varcharLen: Int = 1024): Unit = {
    ensureDialect()
    val varchars = df.schema.fields.collect {
      case f if f.dataType == StringType => s"${f.name} VARCHAR($varcharLen)"
    }.mkString(", ")
    val w = df.write.format("jdbc").option("url", url(db))
      .option("dbtable", table).mode("overwrite")
    (if (varchars.nonEmpty) w.option("createTableColumnTypes", varchars) else w).save()
    org.apache.spark.sql.execution.datasources.v2.jdbc.GraftJdbcStats
      .invalidate(url(db), table)
  }

  /** (db, table, sourceDir) already seeded in this JVM */
  private val seeded = TrieMap.empty[(String, String), String]

  /** Idempotently mirror a parquet table into the embedded engine —
    * the test-fixture stand-in for data that natively LIVES in the
    * remote database. Per-JVM cache keyed by dataset dir. */
  def seedFromParquet(s: SparkSession, dir: String, table: String): String = {
    val db = dbName(dir)
    seeded.synchronized {
      if (!seeded.get((db, table.toUpperCase)).contains(dir)) {
        val df = graft.engine.Tables.table(s, dir, table)
        createAndLoad(df, db, table.toUpperCase)
        seeded((db, table.toUpperCase)) = dir
      }
    }
    db
  }

  /** Register the Derby database as a SQL-visible DSv2 catalog with every
    * pushdown enabled — multi-catalog names (`rdb.APP.<table>`) resolve
    * through Spark's JDBCTableCatalog exactly as they would against a
    * warehouse URL. The reference's `CREATE DATABASE … WITH ENGINE=…`
    * lands here (executor: command_executor.py answer_create_database). */
  def ensureCatalog(s: SparkSession, db: String,
      catalog: String = CatalogName): Unit = {
    ensureDialect()
    // foreign sessions (driver-owned) get the stats rule the first time
    // the JDBC path is used, same late binding as the join-pushdown rule
    org.apache.spark.sql.execution.datasources.v2.jdbc.GraftJdbcStats.ensure(s)
    s.conf.set(s"spark.sql.catalog.$catalog",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    s.conf.set(s"spark.sql.catalog.$catalog.url", url(db))
    s.conf.set(s"spark.sql.catalog.$catalog.pushDownAggregate", "true")
    s.conf.set(s"spark.sql.catalog.$catalog.pushDownLimit", "true")
    s.conf.set(s"spark.sql.catalog.$catalog.pushDownJoin", "true")
    s.conf.set(
      org.apache.spark.sql.internal.SQLConf.DATA_SOURCE_V2_JOIN_PUSHDOWN.key, "true")
  }
}

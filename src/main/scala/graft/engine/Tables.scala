package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * In the reference, every query resolves tables through per-integration
  * handlers (mindsdb/api/executor/datahub/datanodes/integration_datanode.py);
  * here the Spark parquet reader is the scan operator — schema pruning and
  * predicate pushdown reach the parquet footer via Catalyst, so a
  * 2-column projection reads 2 columns, not the whole table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Base-table plans memoized per (session, dir, table): the test data
    * is immutable, and re-deriving the relation re-reads the parquet
    * footer on the driver — measurable when a statement router registers
    * all ten tables per statement. */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Read one table. Path layout fixed by TESTDATA.md.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL); read it as raw nanos and
    * convert losslessly (values are µs-precision) to TimestampType.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name),
      if (name == "events") {
        Session.ensureEventConfig(spark)
        spark.read.parquet(s"$dir/$name.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } else {
        spark.read.parquet(s"$dir/$name.parquet")
      })

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}

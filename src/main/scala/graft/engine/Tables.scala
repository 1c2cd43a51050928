package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

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

  /** Normalize `events.ts` to session-TZ TimestampType regardless of how
    * the generator wrote it. Historically the driver wrote parquet
    * TIMESTAMP(NANOS) — readable only as a raw nanos long
    * (`nanosAsLong`) needing an explicit µs conversion; current test data
    * writes timestamp[us] (read as TIMESTAMP or TIMESTAMP_NTZ). Branching
    * on the OBSERVED dtype keeps both generations working instead of
    * hard-coding either era's workaround.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType)      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampType) => df
      case Some(_)             => df.withColumn("ts", col("ts").cast(TimestampType))
      case None                => df
    }

  /** Read one table. Path layout fixed by TESTDATA.md. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name),
      if (name == "events") {
        Session.ensureEventConfig(spark)
        normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
      } else {
        spark.read.parquet(s"$dir/$name.parquet")
      })

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}

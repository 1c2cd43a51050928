package graft.engine

import org.apache.spark.sql.SparkSession

/** One place to build correctly-configured sessions (Verify, Bench, specs).
  *
  * Config set once here — not mutated per-read inside table loaders
  * (a session-wide `conf.set` buried in a scan is a race under concurrent
  * use). Notable settings:
  *  - `shuffle.partitions` sized to the local core count, not 200: at
  *    test scale 200 partitions means 200 near-empty reducers per
  *    exchange; on a real cluster this is tuned to cores×(2..4).
  *  - `nanosAsLong`: some generations of the driver-generated
  *    `events.ts` are parquet TIMESTAMP(NANOS), which the vectorized
  *    reader otherwise rejects; harmless when the file is timestamp[us]
  *    (Tables.normalizeEventTs handles either dtype at read time).
  *  - UTC session timezone so timestamp arithmetic matches the DuckDB
  *    oracle run.
  */
object Session {
  def build(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // cost-based optimization ON: relations carrying ANALYZE-produced
      // catalog statistics (Catalog.attachCboStats) feed
      // CostBasedJoinReorder and broadcast-threshold decisions exact
      // rowCount/NDV/min-max instead of file-size guesses. Without
      // attached stats Catalyst falls back to the size-only estimates,
      // so un-ANALYZEd plans are unchanged.
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.federation.SingleSourceJoinPushdown.ensure(spark)
    // ANALYZEd remote JDBC tables report their real cardinality to
    // build-side/broadcast selection (GraftJdbcStats.Attach rewraps the
    // pushed scan with SupportsReportStatistics). No-op without ANALYZE.
    org.apache.spark.sql.execution.datasources.v2.jdbc.GraftJdbcStats.ensure(spark)
    spark
  }

  /** Defensive re-assert for sessions we did not build (the driver may
    * hand `SparkEntry.queries` its own session): set only when absent so
    * an events read cannot fail on a foreign session, without repeatedly
    * mutating config on ours. */
  def ensureEventConfig(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming twins of the batch event operators (SURVEY
  * §2.11 — the reference has no streaming engine; this is the
  * beyond-reference capability the north star asks for). Each twin
  * shares semantics with its batch counterpart in
  * graft.queries.Events, verified by StreamingSpec.
  *
  * All twins read the events table as a file stream and drain with
  * `Trigger.AvailableNow` into a memory sink — swap source/sink/trigger
  * for a production deployment; the transform is identical.
  */
/** flat per-user state record for [[StreamingOps.userProfiles]] */
final case class UserProfile(n: Long, total: Double, lastTs: Long)

/** last event seen per user, for [[StreamingOps.transitions]] */
final case class LastEvent(ts: Long, id: Long, tpe: String)

object StreamingOps {

  /** `sourceDir` must be a DIRECTORY of parquet files (file-stream
    * contract) carrying the raw events schema; `ts` normalization is
    * shared with the batch loader (schema-aware — nanos-long or native
    * timestamp), so both eras of generated test data stream. */
  private def stream(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame =
    graft.engine.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(sourceDir))

  /** e01 twin: tumbling daily counts per event type, 1-day watermark for
    * late data. */
  def tumblingDaily(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame =
    stream(spark, sourceDir, schema)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day"), col("event_type"), col("n"))

  /** e06 twin: 3-day sliding windows advancing 1 day. */
  def slidingWindow(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame =
    stream(spark, sourceDir, schema)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "3 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))

  /** e02 twin: gap-based sessionization via session_window (30 min). */
  def sessionize(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame =
    stream(spark, sourceDir, schema)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"))

  /** e07 twin: exactly-once delivery from an at-least-once source —
    * `dropDuplicatesWithinWatermark` on event_id keeps dedup state only
    * for the watermark horizon, so state size is bounded by the event
    * rate × delay (unbounded-state `dropDuplicates` would OOM a 100 TB
    * stream). */
  def dedupEvents(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame =
    stream(spark, sourceDir, schema)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: clicks joined to the same user's
    * purchases within the following hour. Both sides carry watermarks and
    * the join condition bounds event time in BOTH directions, so Spark
    * can expire join state — the shape that holds on an unbounded 100 TB
    * stream (an unbounded-state stream join would grow forever). The
    * batch twin is the identical join condition on the static table
    * (StreamingSpec asserts equality). */
  def clickToPurchase(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame = {
    val src = stream(spark, sourceDir, schema)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Stream-static enrichment join: every streaming event looks up a
    * STATIC dimension frame (here a per-user profile) — the
    * feature-lookup shape of a serving pipeline. Stream-static joins
    * are STATELESS: no watermark bookkeeping, the static side joins
    * (broadcast when small) against each micro-batch, so the operator
    * adds zero state-store growth on an unbounded stream. The batch
    * twin is the identical left join on the static table
    * (StreamingSpec asserts equality). */
  def enrichStatic(spark: SparkSession, sourceDir: String, schema: StructType,
      dim: DataFrame): DataFrame =
    stream(spark, sourceDir, schema)
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("hist_n"), col("hist_total"))

  /** Custom per-key state via flatMapGroupsWithState: a running per-user
    * profile (event count, total value, last-seen micros) maintained as
    * explicit GroupState — the escape hatch for state machines windowed
    * aggregation can't express. Emits the updated profile once per user
    * per micro-batch; state lives keyed by user, so at 100 TB the state
    * store scales with |users|, not |events|, and the state class is a
    * flat case class (compact, codegen-friendly encoder). Event-time
    * timeout would bound state for churned keys in a production deploy;
    * the batch twin (plain groupBy) is asserted equal by StreamingSpec. */
  def userProfiles(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val src = stream(spark, sourceDir, schema)
      .select(col("user_id").as[Long], unix_micros(col("ts")).as[Long],
        col("value").as[Double])
    src.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, rows: Iterator[(Long, Long, Double)],
            state: GroupState[UserProfile]) => {
          val prev = state.getOption.getOrElse(UserProfile(0L, 0.0, Long.MinValue))
          var n = prev.n; var total = prev.total; var lastTs = prev.lastTs
          rows.foreach { case (_, ts, v) =>
            n += 1L
            total += v
            if (ts > lastTs) lastTs = ts
          }
          val next = UserProfile(n, total, lastTs)
          state.update(next)
          Iterator((user, next.n, next.total, next.lastTs))
        })
      .toDF("user_id", "n_events", "total_value", "last_seen_us")
  }

  /** Streaming twin of e19's event-transition matrix: the per-user LAST
    * event rides as GroupState; each micro-batch sorts its per-user
    * slice by event time and emits one (from, to) row per consecutive
    * pair, stitching across batches through the stored last event —
    * so the incremental union of emissions equals the batch lead()
    * pairing. State is one flat record per user (O(|users|) at any
    * event volume); the per-batch sort is bounded by that user's slice
    * of ONE micro-batch, never the full history. Assumes event-time
    * ordering across micro-batches per user (true for replayed logs;
    * a production deploy would add a watermark + reorder buffer). */
  def transitions(spark: SparkSession, sourceDir: String, schema: StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val src = stream(spark, sourceDir, schema)
      .select(col("user_id").as[Long], unix_micros(col("ts")).as[Long],
        col("event_id").as[Long], col("event_type").as[String])
    src.as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[LastEvent]) => {
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var prev = state.getOption
          val out = Seq.newBuilder[(String, String)]
          sorted.foreach { r =>
            prev.foreach(p => out += ((p.tpe, r._4)))
            prev = Some(LastEvent(r._2, r._3, r._4))
          }
          prev.foreach(state.update)
          out.result().iterator
        })
      .toDF("from_type", "to_type")
  }

  /** Run a streaming frame to completion into an in-memory table and
    * return the materialized result. */
  def drainToMemory(df: DataFrame, name: String,
      outputMode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}

package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Triggers (SURVEY §2.11; reference interfaces/triggers/
  * trigger_task.py:29-88): `CREATE TRIGGER ON db.table (sql)` fires the
  * SQL once per changed row, with the delta injected as a `TABLE_DELTA`
  * relation.
  *
  * Spark-native: Structured Streaming over the table's directory with
  * `foreachBatch` — the micro-batch DataFrame IS the TABLE_DELTA. The
  * checkpoint makes delivery exactly-once across restarts (the
  * reference's subscribe() callback has no such guarantee), and
  * `Trigger.AvailableNow` drains pending changes then stops, which is
  * the batch-drive mode the specs and jobs use.
  */
object Triggers {

  /** Fire `handler(delta)` for every new file batch landing in `path`. */
  def onTableChanges(
      spark: SparkSession,
      path: String,
      schema: StructType,
      checkpoint: String,
      handler: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(path)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (delta: DataFrame, batchId: Long) =>
        handler(delta, batchId)
      }
      .start()

  /** Drain all pending changes synchronously (one AvailableNow cycle). */
  def drain(q: StreamingQuery): Unit = q.awaitTermination()
}

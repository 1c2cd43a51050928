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

  /** Poll an EXTERNAL DSv2 source table for new rows — the reference's
    * subscribe() polling contract (dummy_data_handler.py:102,
    * trigger_task.py:29-56) for sources that are not warehouse
    * directories and so can't stream. One poll: read the CURRENT
    * snapshot through the source's reader, anti-join against the
    * persisted set of already-delivered keys, hand the new rows to
    * `handler` as the TABLE_DELTA batch, then atomically swap in the
    * enlarged key set. Per-key delivery is exactly-once across restarts
    * (state swaps AFTER the handler returns; a crash in between
    * re-delivers that one batch — the same at-least-once side-effect
    * contract foreachBatch gives the streaming trigger).
    *
    * Scale: only the KEY column is persisted, and the diff is an
    * equi-anti-join on it — the snapshot scan prunes to the key column
    * plus whatever the handler's delta needs. A source with a real
    * change log (CDC cursor, sequence id) would replace the key set
    * with the cursor; this is the sourceless fallback the reference's
    * dummy handler implements the same way.
    *
    * @return number of new rows delivered (0 = handler not invoked) */
  def pollExternal(
      spark: SparkSession,
      snapshot: () => DataFrame,
      keyCol: String,
      stateDir: String,
      handler: (DataFrame, Long) => Unit): Long = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.col
    Files.createDirectories(Paths.get(stateDir))
    val seen = Paths.get(stateDir, "seen")
    val batchFile = Paths.get(stateDir, "batch")
    val batchId =
      if (Files.exists(batchFile)) Files.readString(batchFile).trim.toLong + 1 else 0L
    def seenNonEmpty = Files.exists(seen) && {
      val s = Files.list(seen)
      try s.filter(_.toString.endsWith(".parquet")).findFirst().isPresent
      finally s.close()
    }
    val cur = snapshot()
    val delta =
      (if (seenNonEmpty)
        cur.join(spark.read.parquet(seen.toString), Seq(keyCol), "left_anti")
      else cur).localCheckpoint()
    val n = delta.count()
    if (n > 0) {
      handler(delta, batchId)
      // append-only key log: each poll ADDS its delta's keys as a new
      // parquet file — O(delta) state write per poll, never an
      // O(total-keys) rewrite; the next poll's anti-join reads all
      // appended files. Spark's append commits files atomically (crash
      // debris stays under _temporary, which the reader ignores), so
      // the exactly-once-per-key contract survives without a swap.
      delta.select(col(keyCol)).distinct()
        .write.mode("append").parquet(seen.toString)
      Files.writeString(batchFile, batchId.toString)
    }
    n
  }
}

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
    Files.createDirectories(Paths.get(stateDir))
    val seen = Paths.get(stateDir, "seen")
    val tmp = Paths.get(stateDir, "seen__tmp")
    val old = Paths.get(stateDir, "seen__old")
    // crash recovery: a finished-but-unswapped tmp (old was removed)
    // promotes; an unfinished tmp beside a live seen dir is discarded
    if (Files.exists(tmp) && !Files.exists(seen)) Files.move(tmp, seen)
    else if (Files.exists(tmp)) rmTree(tmp)
    if (Files.exists(old)) rmTree(old)
    val batchFile = Paths.get(stateDir, "batch")
    val batchId =
      if (Files.exists(batchFile)) Files.readString(batchFile).trim.toLong + 1 else 0L
    val cur = snapshot()
    val delta =
      (if (Files.exists(seen))
        cur.join(spark.read.parquet(seen.toString), Seq(keyCol), "left_anti")
      else cur).localCheckpoint()
    val n = delta.count()
    if (n > 0) {
      handler(delta, batchId)
      val newSeen =
        if (Files.exists(seen))
          spark.read.parquet(seen.toString)
            .union(delta.select(org.apache.spark.sql.functions.col(keyCol))).distinct()
        else delta.select(org.apache.spark.sql.functions.col(keyCol)).distinct()
      newSeen.write.parquet(tmp.toString)
      if (Files.exists(seen)) Files.move(seen, old)
      Files.move(tmp, seen)
      if (Files.exists(old)) rmTree(old)
      Files.writeString(batchFile, batchId.toString)
    }
    n
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }
  }
}

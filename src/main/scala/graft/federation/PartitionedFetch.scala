package graft.federation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyset-paginated, resumable fetch — FetchDataframeStepPartition
  * (steps.py:123; executor fetch_dataframe_partition.py:27-200). The
  * reference wraps the source query as
  * `select * from (q) where track_col > $last order by track_col limit
  * batch_size` and loops, persisting `$last` so an interrupted ingest
  * resumes where it stopped.
  *
  * Spark analog: each batch is a distributed read with the keyset
  * predicate pushed into the scan (parquet row-group pruning / DSv2
  * filter pushdown both apply); only the per-batch max key crosses the
  * driver. Used for sources that cap result sizes (REST handlers) or
  * for checkpointed long ingests — NOT for plain parquet scans, which
  * should read in one pass.
  */
final class FetchState {
  @volatile var lastKey: Option[Long] = None
  @volatile var batches: Int = 0
  @volatile var done: Boolean = false
}

object PartitionedFetch {

  /** Batches per compacted segment: every this-many batches, the pending
    * batches union into ONE eagerly `localCheckpoint`ed segment and their
    * caches release. Each row is materialized exactly once (segments are
    * disjoint — no prefix re-copying), the block manager holds
    * ⌈batches/16⌉ segments instead of one cache per batch, and the
    * returned plan is a ⌈batches/16⌉-way union of LogicalRDDs instead of
    * an unbounded unionByName chain. */
  val CheckpointEvery = 16

  /** Fetch `src` in keyset batches over a unique numeric `trackCol`.
    * Returns the union of all batches fetched from `state` onward;
    * `maxBatches` bounds one call (resume by calling again with the
    * same state). */
  def keysetFetch(
      src: () => DataFrame,
      trackCol: String,
      batchSize: Int,
      state: FetchState = new FetchState,
      maxBatches: Int = Int.MaxValue): DataFrame = {
    require(batchSize > 0)
    var segments = Vector.empty[DataFrame]
    val pending = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def compact(): Unit = if (pending.nonEmpty) {
      segments :+= pending.reduce(_ unionByName _).localCheckpoint(true)
      pending.foreach(_.unpersist())
      pending.clear()
    }
    var n = 0
    while (!state.done && n < maxBatches) {
      val pred: Column = state.lastKey.map(k => col(trackCol) > k).getOrElse(lit(true))
      val batch = src().filter(pred).orderBy(col(trackCol)).limit(batchSize).cache()
      val stats = batch.agg(count(lit(1)), max(col(trackCol))).first()
      val got = stats.getLong(0)
      if (got == 0) { state.done = true; batch.unpersist() }
      else {
        state.lastKey = Some(stats.getLong(1))
        state.batches += 1
        pending += batch
        if (got < batchSize) state.done = true
        n += 1
        if (pending.size >= CheckpointEvery) compact()
      }
    }
    compact()
    segments.reduceOption(_ unionByName _).getOrElse(src().limit(0))
  }
}

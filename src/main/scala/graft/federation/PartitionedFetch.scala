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

  /** Threaded partitioned fetch+process — the reference's optional
    * `threads=N` USING param (fetch_dataframe_partition.py:77-98,
    * 216-264 fetch_threads): the keyset WALK stays serial (batch k+1's
    * predicate window starts at batch k's max key, a real data
    * dependency), while each fetched batch's PROCESSING (the
    * reference's exec_sub_steps) runs on a worker pool, overlapping
    * with the next fetch.
    *
    * The resume contract is preserved by an in-order commit:
    * `state.lastKey` advances to a batch's max key only once that batch
    * AND every earlier batch processed successfully — a failure leaves
    * the state pointing at the last fully-committed batch, so calling
    * again with the same state refetches exactly the uncommitted
    * window (the reference's RunningQuery progress tracking). With
    * `onError = "skip"` a failed batch logs, drops out of the result,
    * and commits anyway, like the reference's error='skip'.
    *
    * Returns the processed batches unioned in keyset order. */
  def fetchThreads(
      src: () => DataFrame,
      trackCol: String,
      batchSize: Int,
      process: DataFrame => DataFrame,
      threads: Int,
      state: FetchState = new FetchState,
      maxBatches: Int = Int.MaxValue,
      onError: String = "raise"): DataFrame = {
    require(batchSize > 0 && threads >= 1)
    require(onError == "raise" || onError == "skip",
      s"error param must be raise|skip, got $onError")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads,
      (r: Runnable) => {
        val t = new Thread(r, "partitioned-fetch"); t.setDaemon(true); t
      })
    // (future of processed+checkpointed batch, that batch's max key)
    val inFlight = scala.collection.mutable.Queue
      .empty[(java.util.concurrent.Future[DataFrame], Long)]
    val doneSegs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var failure: Option[Throwable] = None

    def commitOne(): Unit = {
      val (fut, maxKey) = inFlight.dequeue()
      try {
        val seg = fut.get()
        // a batch AFTER a raise-mode failure materialized fine but must
        // not commit — the resume window starts at the failed batch
        if (failure.isEmpty) {
          doneSegs += seg
          state.lastKey = Some(maxKey); state.batches += 1
        } else seg.unpersist()
      } catch {
        case e: java.util.concurrent.ExecutionException =>
          if (onError == "skip" && failure.isEmpty) {
            state.lastKey = Some(maxKey); state.batches += 1
          } else if (failure.isEmpty) failure = Some(e.getCause)
      }
    }

    try {
      var walkKey = state.lastKey // the serial keyset cursor (fetch side)
      var exhausted = false
      var n = 0
      while (!exhausted && n < maxBatches && failure.isEmpty) {
        val pred: Column = walkKey.map(k => col(trackCol) > k).getOrElse(lit(true))
        val batch = src().filter(pred).orderBy(col(trackCol)).limit(batchSize).cache()
        val stats = batch.agg(count(lit(1)), max(col(trackCol))).first()
        val got = stats.getLong(0)
        if (got == 0) { exhausted = true; batch.unpersist() }
        else {
          walkKey = Some(stats.getLong(1))
          n += 1
          if (got < batchSize) exhausted = true
          // hand the batch to a worker: process + eager localCheckpoint
          // materializes OFF the fetch thread, so the next window's
          // fetch overlaps with this batch's processing
          inFlight.enqueue((pool.submit(() =>
            try process(batch).localCheckpoint(true)
            finally batch.unpersist()), stats.getLong(1)))
          // bound the pipeline: never more than `threads` uncommitted
          // batches in flight (backpressure = the reference's bounded
          // worker pool)
          while (inFlight.size > threads) commitOne()
        }
      }
      while (inFlight.nonEmpty) commitOne()
      if (exhausted && failure.isEmpty) state.done = true
      failure.foreach(throw _)
      doneSegs.reduceOption(_ unionByName _)
        .getOrElse(process(src().limit(0)))
    } finally pool.shutdown()
  }
}

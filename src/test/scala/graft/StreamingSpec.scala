package graft

import graft.engine.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream equivalence: the streaming twins must agree with the
  * oracle-checked batch operators on the same data. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("streaming-spec")
  val dir = "/root/testdata/sf0.001"

  private lazy val rawSchema =
    spark.read.parquet(s"$dir/events.parquet").schema

  /** file-stream sources need a directory — stage the single parquet
    * file into one */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events_part0.parquet"))
    d.toString
  }

  test("streaming tumbling daily == batch e01 counts") {
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.tumblingDaily(spark, streamDir, rawSchema), "s_e01")
      .select(col("day"), col("event_type"), col("n"))
    val batch = Tables.table(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming sliding window == batch e06 counts") {
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.slidingWindow(spark, streamDir, rawSchema), "s_e06")
    val batch = Tables.table(spark, dir, "events")
      .groupBy(window(col("ts"), "3 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming session_window session count == batch gap sessionization") {
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.sessionize(spark, streamDir, rawSchema), "s_e02")
    val batchSessions = graft.queries.Events
      .queries("e02_sessionize")(spark, dir)
    // same number of sessions and same total events per user
    val a = streamed.groupBy("user_id")
      .agg(count(lit(1)).as("n_sess"), sum("n_events").as("n_ev"))
    val b = batchSessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sess"), sum("n_events").as("n_ev"))
    assert(a.join(b, Seq("user_id"))
      .filter(a("n_sess") =!= b("n_sess") || a("n_ev") =!= b("n_ev"))
      .count() === 0)
    assert(a.count() === b.count())
  }

  test("stream-static enrichment join == batch e17 (stateless lookup)") {
    val ev = Tables.table(spark, dir, "events")
    val cutoff = to_timestamp(lit("2024-01-25 00:00:00"))
    val dim = ev.filter(col("ts") < cutoff)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("hist_n"),
        graft.queries.Parity.dsum(col("value")).as("hist_total"))
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.enrichStatic(spark, streamDir, rawSchema, dim),
      "s_e17", "append")
      .filter(col("event_id").isNotNull) // full stream enriched; compare on the twin's slice
    val batch = graft.queries.Events.queries("e17_stream_enrich")(spark, dir)
    val streamedSlice = streamed
      .join(batch.select(col("event_id")), Seq("event_id"), "left_semi")
    assert(streamedSlice.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamedSlice).count() === 0)
  }

  test("stream-stream interval join == batch e11 banded range join") {
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.clickToPurchase(spark, streamDir, rawSchema), "s_join", "append")
    val batch = graft.queries.Events.queries("e11_stream_join")(spark, dir)
    assert(batch.count() > 0, "test data must produce at least one join pair")
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("flatMapGroupsWithState user profiles == batch per-user aggregates") {
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.userProfiles(spark, streamDir, rawSchema), "s_prof", "append")
    val batch = Tables.table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"),
        max(unix_micros(col("ts"))).as("last_seen_us"))
    assert(streamed.count() === batch.count())
    val j = streamed.alias("s").join(batch.alias("b"), "user_id")
    assert(j.filter(col("s.n_events") =!= col("b.n_events") ||
      col("s.last_seen_us") =!= col("b.last_seen_us")).count() === 0)
    // double totals: same addends in different order → compare rounded
    assert(j.filter(
      abs(col("s.total_value") - col("b.total_value")) > 1e-6).count() === 0)
  }

  test("stateful streaming transitions == batch e19 lead() pair counts") {
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.transitions(spark, streamDir, rawSchema), "s_trans", "append")
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = Tables.table(spark, dir, "events")
      .withColumn("to_type", org.apache.spark.sql.functions.lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() === batch.count())
    assert(streamed.join(batch, Seq("from_type", "to_type", "n"), "left_anti").count() === 0,
      "streaming transition counts differ from the batch lead() pairing")
  }

  test("streaming dedup of a replayed source emits each event_id exactly once") {
    import spark.implicits._
    // stage the events file TWICE — an at-least-once source where every
    // event is delivered again
    val d = java.nio.file.Files.createTempDirectory("events_replay")
    Seq("a", "b").foreach { suffix =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        d.resolve(s"events_$suffix.parquet"))
    }
    val streamed = StreamingOps.drainToMemory(
      StreamingOps.dedupEvents(spark, d.toString, rawSchema), "s_e07", "append")
    val batchIds = Tables.table(spark, dir, "events")
      .select("event_id").distinct()
    assert(streamed.count() === batchIds.count())
    assert(streamed.select("event_id").distinct().count() === streamed.count())
    assert(streamed.select("event_id").exceptAll(batchIds).count() === 0)
  }

  test("streaming HLL sketch maintenance: per-batch register merge == one-shot estimate") {
    import org.apache.spark.sql.functions._
    import graft.functions.Hll
    // events arrive as three micro-batches; each batch folds into a
    // per-day sketch table (merge = hll_union over old + new registers);
    // at the end, the maintained table's union must BIT-match sketching
    // all events at once — the incremental-analytics contract
    val ev = Tables.table(spark, dir, "events").select(
      date_trunc("day", col("ts")).as("day"), col("user_id"), col("event_id"))
    val d = java.nio.file.Files.createTempDirectory("ev_sketch_stream")
    (0 until 3).foreach { i =>
      ev.filter(pmod(col("event_id"), lit(3)) === i).coalesce(1)
        .write.parquet(s"$d/part_$i")
      val f = new java.io.File(s"$d/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath, d.resolve(s"ev_$i.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$d/part_$i"))
    }
    var sketchTable: org.apache.spark.sql.DataFrame = null
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val newSketches = batch.groupBy(col("day"))
          .agg(Hll.hllRegisters(col("user_id")).as("sk"))
        sketchTable = Option(sketchTable).fold(newSketches) { prev =>
          // fold the batch's sketches into the stored ones WITHOUT
          // leaving register space (merge = elementwise max)
          prev.unionByName(newSketches)
            .groupBy(col("day"))
            .agg(Hll.hllUnionRegisters(col("sk")).as("sk"))
        }
        sketchTable = sketchTable.localCheckpoint()
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    val streamed = sketchTable
      .agg(Hll.hllUnionEstimate(col("sk"))).first().getDouble(0)
    val direct = ev.agg(Hll.hllEstimate(col("user_id"))).first().getDouble(0)
    assert(streamed == direct,
      s"incrementally maintained sketches ($streamed) != one-shot estimate ($direct)")
  }

  test("streaming quantile-sketch maintenance: per-batch count merge == one-shot sketch") {
    import org.apache.spark.sql.functions._
    import graft.queries.Dedup
    // documents arrive as micro-batches; each batch's (source, bucket)
    // counts ADD into the stored sketch (the d25 lifecycle, maintained
    // under streaming ingest); the final quantiles must equal sketching
    // the whole corpus at once — count addition is associative, so the
    // identity is exact, not approximate
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val d = java.nio.file.Files.createTempDirectory("doc_qsketch_stream")
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i).coalesce(1)
        .write.parquet(s"$d/part_$i")
      val f = new java.io.File(s"$d/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath, d.resolve(s"doc_$i.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$d/part_$i"))
    }
    var sketch: org.apache.spark.sql.DataFrame = null
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.createOrReplaceTempView("qs_batch")
        // the batch frame lives in the micro-batch's own session
        val newSk = batch.sparkSession.sql(
          s"WITH ${Dedup.logqBuildSql("qs_batch", Dedup.sparkQ)} SELECT * FROM sk")
        sketch = Option(sketch).fold(newSk) { prev =>
          prev.unionByName(newSk).groupBy(col("source"), col("bkt"))
            .agg(sum(col("cnt")).as("cnt"))
        }
        sketch = sketch.localCheckpoint()
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    sketch.createOrReplaceTempView("qs_maintained")
    // the maintained frame lives in the last micro-batch's session clone
    val streamed = sketch.sparkSession.sql(s"""
      WITH m AS (SELECT source, bkt, cnt FROM qs_maintained),
      ${Dedup.logqFromSketchSql("m", Dedup.sparkQ)}
      SELECT source, p50, p90, p99 FROM q ORDER BY source""").collect().toSeq
    docs.createOrReplaceTempView("qs_all")
    val direct = spark.sql(s"""
      WITH ${Dedup.logqBuildSql("qs_all", Dedup.sparkQ)},
      ${Dedup.logqFromSketchSql("sk", Dedup.sparkQ)}
      SELECT source, p50, p90, p99 FROM q ORDER BY source""").collect().toSeq
    assert(streamed === direct,
      "incrementally maintained quantile sketch diverged from the one-shot sketch")
  }

  test("streaming incremental dedup (foreachBatch vs standing index) == batch d18") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the standing corpus index (built once, reused every micro-batch)
    val corpusBands = graft.queries.Dedup
      .bandIndex(docs.filter(col("doc_id") % 10 =!= 0)).cache()
    // stage the delta (the day's crawl) as THREE files → three
    // micro-batches with maxFilesPerTrigger=1
    val d = java.nio.file.Files.createTempDirectory("docs_delta")
    val delta = docs.filter(col("doc_id") % 10 === 0)
    (0 until 3).foreach { i =>
      delta.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$d/part_$i")
      val f = new java.io.File(s"$d/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath, d.resolve(s"delta_$i.parquet"))
    }
    (0 until 3).foreach(i =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$d/part_$i")))
    val results = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        results.synchronized {
          results ++= graft.queries.Dedup
            .incrementalDedup(corpusBands, batch).collect()
        }; ()
      }.start()
    q.processAllAvailable(); q.stop()
    val batchResult = graft.queries.Dedup
      .queries("d18_incremental_dedup")(spark, dir).collect()
    assert(results.sortBy(r => (r.getLong(0), r.getLong(1))) ===
      batchResult.toSeq.sortBy(r => (r.getLong(0), r.getLong(1))),
      "streamed micro-batch dedup differs from the one-shot batch result")
  }
}

package graft

import graft.engine.Session
import org.apache.spark.sql.DataFrame

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Protocol per BASELINE.md §2: one warm-up pass (excluded), then 3 timed
  * runs per query, median reported. Queries are forced with a noop-format
  * write — every operator executes and every output row is produced, but
  * Catalyst cannot prune projections or eliminate sorts the way a bare
  * `.count()` allows. Failures rethrow: a broken query must fail the
  * bench, not register as fast.
  */
object Bench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeOne(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    force(df)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build("graft-bench")
    // optional comma-separated name-prefix filter for targeted timing
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.exists(n.startsWith)) }
    // warm-up: JVM/codegen/parquet-footer caches; excluded from numbers.
    // Cached frames clear BETWEEN queries (queries that .cache()
    // internally still benefit within their own runs): accumulated
    // caches from 150+ earlier queries otherwise build memory pressure
    // that slows late-alphabet queries by 30%+ — measured s07 drifting
    // 1.18→1.58 s purely from suite growth.
    queries.foreach { case (_, fn) =>
      force(fn(spark, sfDir)); spark.catalog.clearCache()
    }
    val results = queries.map { case (name, fn) =>
      val ts = Seq.fill(3)(timeOne(fn(spark, sfDir))).sorted
      spark.catalog.clearCache()
      name -> ts(1) // median of 3
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver keeps only a ~2KB stdout tail (and sbt appends its own
    // [success] line after us), so a 300-query JSON line gets truncated
    // and fails the driver's parse. Persist the full per-query JSON to a
    // file, echo it for humans, and make the FINAL stdout line a compact
    // JSON that always fits the tail: total + the slowest queries.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullJson)
    println(fullJson)
    val slowest = results.sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + (math.round(v * 1000) / 1000.0) }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries_file":"$outFile","slowest":$slowest}""")
  }
}

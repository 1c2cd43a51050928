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
  *
  * Self-defending measurement (round 12): driver-box contention during the
  * canonical run has produced phantom 2-8x "regressions" on queries whose
  * code did not change (VERDICT r11 adjudicated 14 such). After the timed
  * suite, any query whose median exceeds 1.5x its recorded baseline
  * (tools/bench_baseline.json, the r11 clean-protocol numbers) is
  * re-measured in isolation — fresh 3 runs, caches cleared — and BOTH
  * numbers ship in the artifact (`"remeasured":{name:[suite,isolated]}`).
  * A genuine regression survives the re-measure; a contention phantom
  * doesn't, and the artifact now says so by itself.
  */
object Bench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeOne(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    force(df)
    (System.nanoTime() - t0) / 1e9
  }

  /** Recorded per-query baselines; empty map when the file is absent
    * (fresh checkouts still bench, just without the re-measure pass).
    */
  private def loadBaseline(): Map[String, Double] = {
    val p = java.nio.file.Paths.get("tools/bench_baseline.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    import graft.server.Json
    val v = Json.parse(java.nio.file.Files.readString(p))
    v.get("queries") match {
      case Some(Json.Obj(fields)) =>
        fields.collect { case (k, Json.Num(n, _)) => k -> n }
      case _ => Map.empty
    }
  }

  /** The baseline's scale-factor tag ("sf0.1"); re-measure only applies
    * when benching the same SF — at sf1 every query is honestly slower
    * than the sf0.1 record and a blanket re-run would double the suite.
    */
  private def baselineSf(): Option[String] = {
    val p = java.nio.file.Paths.get("tools/bench_baseline.json")
    if (!java.nio.file.Files.exists(p)) return None
    import graft.server.Json
    Json.parse(java.nio.file.Files.readString(p)).get("sf") match {
      case Some(Json.Str(s)) => Some(s)
      case _ => None
    }
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
    def median3(fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): Double = {
      val ts = Seq.fill(3)(timeOne(fn(spark, sfDir))).sorted
      spark.catalog.clearCache()
      ts(1)
    }
    // stream each median to stderr as it lands: long rehearsal runs
    // (sf1/sf10) are otherwise a multi-hour silent gap, and a killed run
    // loses nothing — stdout stays reserved for the final JSON lines
    val results = queries.map { case (name, fn) =>
      val m = median3(fn)
      System.err.println(f"[bench] $name $m%.3f s")
      name -> m
    }
    // Re-measure pass: isolate suspected regressions after the suite so a
    // transient load spike during their slot doesn't masquerade as a plan
    // regression. Only queries >1.5x their recorded baseline re-run.
    val baseline =
      if (baselineSf().exists(tag => sfDir.stripSuffix("/").endsWith(tag)))
        loadBaseline()
      else Map.empty[String, Double]
    val remeasured = results.flatMap { case (name, t) =>
      baseline.get(name).filter(b => b > 0 && t > 1.5 * b).map { _ =>
        name -> (t, median3(queries.find(_._1 == name).get._2))
      }
    }
    def fmt(v: Double): Double = math.round(v * 1000) / 1000.0
    val remeasJson = remeasured
      .map { case (k, (a, b)) => "\"" + k + "\":[" + fmt(a) + "," + fmt(b) + "]" }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"remeasured":$remeasJson,"sf":"$sfDir"}"""
    // The driver keeps only a ~2KB stdout tail, so a 300-query JSON line
    // gets truncated and fails the driver's parse. Persist the full
    // per-query JSON to a file, echo it for humans, and make the FINAL
    // stdout line a compact JSON that always fits the tail: total + the
    // slowest queries + the re-measure verdicts (capped at 8 entries so
    // a pathological run can't blow the tail either).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullJson)
    println(fullJson)
    val slowest = results.sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val remeasCompact = remeasured.sortBy { case (_, (a, b)) => -(a / math.max(b, 1e-9)) }
      .take(8)
      .map { case (k, (a, b)) => "\"" + k + "\":[" + fmt(a) + "," + fmt(b) + "]" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries_file":"$outFile","slowest":$slowest,"remeasured":$remeasCompact}""")
  }
}

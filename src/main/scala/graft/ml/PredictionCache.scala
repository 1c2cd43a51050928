package graft.ml

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prediction cache (apply_predictor_step.py:177-183): predictions keyed
  * by model name + input-frame checksum, persisted as parquet under a
  * warehouse directory.
  *
  * The checksum is an order-insensitive fold (xor of per-row xxhash64
  * over all columns) so it is stable under partition reordering — the
  * reference's pandas checksum is order-sensitive but its inputs are
  * single-threaded; a distributed input has no canonical row order.
  * Cached rows carry their FEATURE VALUES (`__feat_*` columns) and are
  * rejoined on them — hits stay correct under any repartitioning or
  * reordering of a content-equal input (see Predict.applyModel).
  */
final class PredictionCache(dir: String, maxSize: Int = 64) {
  Files.createDirectories(Paths.get(dir))

  @volatile var hits: Long = 0
  @volatile var misses: Long = 0

  private def checksum(df: DataFrame): String = {
    // xor-fold (not sum): order-insensitive AND overflow-free under ANSI
    val r = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("n")).first()
    if (r.isNullAt(0)) "empty"
    else java.lang.Long.toHexString(r.getLong(0)) + "_" + r.getLong(1)
  }

  private def path(model: Model, input: DataFrame): String =
    s"$dir/${model.name}_${checksum(input)}"

  def get(model: Model, input: DataFrame): Option[DataFrame] = {
    val p = path(model, input)
    if (Files.exists(Paths.get(p))) {
      hits += 1
      Some(input.sparkSession.read.parquet(p))
    } else { misses += 1; None }
  }

  def put(model: Model, input: DataFrame, preds: DataFrame): Unit = {
    preds.write.mode("overwrite").parquet(path(model, input))
    evict()
  }

  /** Bounded like the reference's FileCache (utilities/cache.py
    * max_size): keep the `maxSize` most recently WRITTEN entries, drop
    * the rest oldest-first. An unbounded prediction cache in a
    * long-lived service grows without limit — the reference caps it and
    * so does this. Reads don't refresh recency (write-ordered eviction,
    * matching FileCache). */
  private def evict(): Unit = {
    val s = Files.list(Paths.get(dir))
    val entries =
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(Files.isDirectory(_))
      finally s.close()
    entries.sortBy(p => Files.getLastModifiedTime(p).toMillis)
      .dropRight(maxSize)
      .foreach { p =>
        val w = Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally w.close()
      }
  }

  /** cached entry count (for specs and capacity monitoring). */
  def size: Int = {
    val s = Files.list(Paths.get(dir))
    try s.toArray.count(p =>
      Files.isDirectory(p.asInstanceOf[java.nio.file.Path]))
    finally s.close()
  }
}

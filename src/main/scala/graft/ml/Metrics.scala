package graft.ml

import graft.queries.Parity.{dsum, dsum2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** `EVALUATE <metric> FROM (query)` — model-accuracy metrics over an
  * (actual, prediction) frame (reference command_executor.py:846
  * `answer_evaluate_metric`, which delegates to sklearn-style metric
  * names via `mindsdb_evaluator.accuracy.general.evaluate_accuracy`).
  *
  * Every metric is ONE aggregation pass (partial/final split, no
  * collect): the needed sufficient statistics — counts, decimal-exact
  * sums of values/squares/errors, and the binary confusion matrix — are
  * computed together, and the metric is a scalar expression over that
  * single row. At 100 TB this is a map-side-combined scan, nothing else.
  *
  * Floating-point parity: sums go through the same DECIMAL(18,4) cast
  * discipline as the query packs ([[graft.queries.Parity]]), so the
  * result is associative and hash-matches a single-threaded engine run.
  * Classification counts are exact integers. The reference rounds to
  * `n_decimals` (default 3, command_executor.py:873); so do we.
  */
object Metrics {

  val supported: Set[String] = Set(
    "r2_score", "mean_absolute_error", "mean_squared_error",
    "root_mean_squared_error", "accuracy_score", "balanced_accuracy_score",
    "precision_score", "recall_score", "f1_score")

  /** Canonical metric name: lowercase, sklearn `_score`/`_error` suffix
    * optional for the common spellings (`r2`, `accuracy`, `f1`, …). */
  def canonical(name: String): String = {
    val n = name.trim.toLowerCase
    if (supported(n)) n
    else if (supported(s"${n}_score")) s"${n}_score"
    else if (supported(s"${n}_error")) s"${n}_error"
    else if (n == "rmse") "root_mean_squared_error"
    else if (n == "mse") "mean_squared_error"
    else if (n == "mae") "mean_absolute_error"
    else throw new IllegalArgumentException(
      s"unknown metric '$name' (supported: ${supported.toSeq.sorted.mkString(", ")})")
  }

  /** Compute one metric over a frame with `actual` and `prediction`
    * columns; returns a single-row frame whose only column is named by
    * the metric. Missing values in either column raise, as the reference
    * asserts (command_executor.py:861-863) — checked inside the same
    * pass, not with a separate scan. */
  def evaluate(data: DataFrame, metric: String, nDecimals: Int = 3): DataFrame = {
    val m = canonical(metric)
    require(data.columns.contains("actual"),
      "`actual` column was not provided, please try again.")
    require(data.columns.contains("prediction"),
      "`prediction` column was not provided, please try again.")
    val a = col("actual").cast(DoubleType)
    val p = col("prediction").cast(DoubleType)
    val err = a - p

    val stats = data.agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(when(a.isNull.or(p.isNull), 1L).otherwise(0L)).as("n_missing"),
      dsum(a).as("sum_a"),
      dsum2(a, a).as("sum_a2"),
      dsum2(err, err).as("ss_res"),
      dsum(abs(err)).as("abs_err"),
      // binary confusion matrix (labels 0/1, as the sklearn defaults
      // the reference forwards to expect)
      sum(when(a === 1d && p === 1d, 1L).otherwise(0L)).cast(DoubleType).as("tp"),
      sum(when(a === 0d && p === 1d, 1L).otherwise(0L)).cast(DoubleType).as("fp"),
      sum(when(a === 1d && p === 0d, 1L).otherwise(0L)).cast(DoubleType).as("fn"),
      sum(when(a === 0d && p === 0d, 1L).otherwise(0L)).cast(DoubleType).as("tn"),
      sum(when(a === p, 1L).otherwise(0L)).cast(DoubleType).as("eq"))

    val value = m match {
      case "r2_score" =>
        lit(1.0) - col("ss_res") /
          (col("sum_a2") - col("sum_a") * col("sum_a") / col("n"))
      case "mean_absolute_error" => col("abs_err") / col("n")
      case "mean_squared_error" => col("ss_res") / col("n")
      case "root_mean_squared_error" => sqrt(col("ss_res") / col("n"))
      case "accuracy_score" => col("eq") / col("n")
      case "precision_score" => col("tp") / (col("tp") + col("fp"))
      case "recall_score" => col("tp") / (col("tp") + col("fn"))
      case "f1_score" =>
        lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn"))
      case "balanced_accuracy_score" =>
        (col("tp") / (col("tp") + col("fn")) +
          col("tn") / (col("tn") + col("fp"))) / lit(2.0)
    }

    stats.select(
      when(col("n_missing") > 0, raise_error(concat(lit(
        "There are missing values in the `actual`/`prediction` columns, " +
          "please try again. missing rows: "), col("n_missing"))).cast(DoubleType))
        .otherwise(round(value, nDecimals))
        .as(m))
  }
}

package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Linear-model training for CREATE MODEL ... FROM (query) — the
  * Spark-native analog of the reference's train-on-a-query flow
  * (command_executor.py:1532 CREATE MODEL, :1042 RETRAIN, :1078
  * FINETUNE; the reference delegates fitting to an ML handler).
  *
  * Ordinary least squares via ADDITIVE sufficient statistics: one
  * aggregation pass computes Z'Z and Z'y (Z = [1 | features]); the
  * normal equations solve on the driver (k ≤ a few dozen → trivial).
  * This is the 100 TB shape: the scan is embarrassingly parallel and
  * only k² doubles cross the driver. Because the statistics ADD,
  * FINETUNE on new data is EXACT incremental learning — combine the
  * stored stats with the new batch's stats and re-solve; no replay of
  * the original training data.
  *
  * Coefficients round to 6 decimals at solve time so a DuckDB oracle
  * computing the same regression (regr_slope/regr_intercept or explicit
  * sums) lands on identical doubles despite summation-order drift.
  */
object Fit {

  /** What to fit: feature columns, target column, and the name of the
    * model's output column. */
  final case class FitSpec(features: Seq[String], target: String, scoreCol: String = "score")

  /** Additive OLS sufficient statistics over design rows z = (1, x…). */
  final case class Stats(n: Long, ztz: Array[Array[Double]], zty: Array[Double]) {
    def add(o: Stats): Stats = {
      val k = zty.length
      require(o.zty.length == k, "stats dimensionality mismatch")
      Stats(n + o.n,
        Array.tabulate(k, k)((i, j) => ztz(i)(j) + o.ztz(i)(j)),
        Array.tabulate(k)(i => zty(i) + o.zty(i)))
    }
  }

  /** One-pass statistics: k(k+1)/2 + k + 1 sums in a single agg. */
  def stats(df: DataFrame, spec: FitSpec): Stats = {
    val k = spec.features.length + 1
    val z = lit(1.0) +: spec.features.map(f => col(f).cast(DoubleType))
    val y = col(spec.target).cast(DoubleType)
    val upper = for { i <- 0 until k; j <- i until k } yield sum(z(i) * z(j))
    val ySums = (0 until k).map(i => sum(z(i) * y))
    val aggs = count(lit(1)) +: (upper ++ ySums)
    val r = df.agg(aggs.head, aggs.tail: _*).first()
    val n = r.getLong(0)
    val ztz = Array.ofDim[Double](k, k)
    var ix = 1
    for { i <- 0 until k; j <- i until k } {
      val v = if (r.isNullAt(ix)) 0.0 else r.getDouble(ix)
      ztz(i)(j) = v; ztz(j)(i) = v
      ix += 1
    }
    val zty = Array.tabulate(k) { i =>
      val v = r.get(ix + i); if (v == null) 0.0 else v.asInstanceOf[Double]
    }
    Stats(n, ztz, zty)
  }

  /** Solve the normal equations (Gaussian elimination with partial
    * pivoting) → (weights, bias), each rounded to 6 decimals. */
  def solve(s: Stats): (Seq[Double], Double) = {
    val k = s.zty.length
    val a = Array.tabulate(k, k + 1)((i, j) => if (j < k) s.ztz(i)(j) else s.zty(i))
    for (p <- 0 until k) {
      val pivot = (p until k).maxBy(r => math.abs(a(r)(p)))
      require(math.abs(a(pivot)(p)) > 1e-12, "singular design matrix (collinear features?)")
      val tmp = a(p); a(p) = a(pivot); a(pivot) = tmp
      for (r <- p + 1 until k) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p to k) a(r)(c) -= f * a(p)(c)
      }
    }
    val x = new Array[Double](k)
    for (i <- (k - 1) to 0 by -1) {
      var acc = a(i)(k)
      for (j <- i + 1 until k) acc -= a(i)(j) * x(j)
      x(i) = acc / a(i)(i)
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (x.drop(1).map(r6).toSeq, r6(x(0)))
  }

  /** Fit a [[LinearModel]] on `df`, returning the model and its
    * sufficient statistics (keep them for FINETUNE). */
  def fit(name: String, df: DataFrame, spec: FitSpec): (LinearModel, Stats) = {
    val st = stats(df, spec)
    val (w, b) = solve(st)
    (LinearModel(name, spec.features, w, b, spec.scoreCol), st)
  }

  /** Exact incremental update: previous stats + new data → refit.
    * Equivalent to refitting on (old ∪ new) without replaying old. */
  def finetune(name: String, prev: Stats, newData: DataFrame, spec: FitSpec): (LinearModel, Stats) = {
    val combined = prev.add(stats(newData, spec))
    val (w, b) = solve(combined)
    (LinearModel(name, spec.features, w, b, spec.scoreCol), combined)
  }

  /** Ridge regression (Tikhonov; Hoerl & Kennard 1970): the SAME
    * additive sufficient statistics as OLS with λ added to the feature
    * diagonal of Z'Z at solve time — the intercept is conventionally
    * unpenalized. The 100 TB shape is unchanged: one embarrassingly
    * parallel scan, k² doubles to the driver, and since λ only enters
    * the solve, the statistics still ADD exactly. */
  def solveRidge(s: Stats, lambda: Double): (Seq[Double], Double) = {
    val k = s.zty.length
    val penalized = Stats(s.n,
      Array.tabulate(k, k)((i, j) =>
        s.ztz(i)(j) + (if (i == j && i > 0) lambda else 0.0)),
      s.zty)
    solve(penalized)
  }

  def fitRidge(name: String, df: DataFrame, spec: FitSpec,
      lambda: Double): (LinearModel, Stats) = {
    val st = stats(df, spec)
    val (w, b) = solveRidge(st, lambda)
    (LinearModel(name, spec.features, w, b, spec.scoreCol), st)
  }
}

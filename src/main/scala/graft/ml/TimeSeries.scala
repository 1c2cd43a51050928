package graft.ml

import graft.queries.Parity.davg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series predictor planning (SURVEY §2.9; reference
  * plan_join_ts.py:36-380, apply_predictor_step.py:214-381).
  *
  * The reference fetches per-group lookback context with one
  * `ORDER BY time DESC LIMIT window` query PER GROUP (a MapReduceStep
  * loop, plan_join_ts.py:348-380). Here the same context is ONE windowed
  * plan — `row_number() over (partition by group order by ts desc) <=
  * window` — a single shuffle on the group key regardless of group
  * count, which is the shape that survives 100 TB (the reference's
  * per-group loop is O(groups) round trips).
  *
  * Forecasting uses a deterministic mean-of-context model (the harness
  * stand-in for the model runtime, same role as LinearModel); horizon
  * rows are generated with `explode(sequence(...))` — no driver loop.
  */
object TimeSeries {

  /** Per-group lookback context: the last `window` rows by `ts` (ties
    * broken by `tieBreak` desc, mirroring the reference's stable fetch
    * order plan_join_ts.py:229-241). */
  def lookbackContext(data: DataFrame, groupCol: Column, ts: Column,
      tieBreak: Column, window: Int): DataFrame =
    data.withColumn("__rn",
        row_number().over(Window.partitionBy(groupCol).orderBy(ts.desc, tieBreak.desc)))
      .filter(col("__rn") <= window)
      .drop("__rn")

  /** Forecast `horizon` steps per group: value = exact-decimal mean of
    * the context window, timestamps advance `stepDays` per step from the
    * group's last seen date. Output: group, h (1-based step), forecast_date,
    * forecast, n_ctx. */
  def forecast(data: DataFrame, groupCol: Column, ts: Column, value: Column,
      tieBreak: Column, window: Int, horizon: Int, stepDays: Int): DataFrame = {
    val ctx = lookbackContext(data, groupCol, ts, tieBreak, window)
    ctx.groupBy(groupCol.as("group_key"))
      .agg(davg(value).as("base"), max(ts).as("last_ts"), count(lit(1)).as("n_ctx"))
      .withColumn("h", explode(sequence(lit(1), lit(horizon))))
      // TIMESTAMP (not DATE) output: DATE surfaces as python date objects
      // on one engine and datetime64 on the other in the oracle compare
      .withColumn("forecast_date",
        date_add(to_date(col("last_ts")), col("h") * stepDays).cast("timestamp"))
      .withColumn("forecast", round(col("base"), 4))
      .select(col("group_key"), col("h"), col("forecast_date"), col("forecast"), col("n_ctx"))
  }

  /** Linear-trend forecast: per-group OLS of value over time (x = days
    * since epoch) fitted on the context window, extrapolated `horizon`
    * steps — the shape a real TS handler produces where [[forecast]]
    * emits a flat mean. Still ONE aggregation pass: the five sufficient
    * sums (n, Σx, Σy, Σx², Σxy) aggregate per group and the line solves
    * in closed form per row — no per-group fitting loop, no driver math.
    * Degenerate windows (single point / zero x-variance) fall back to
    * the mean. Sums use exact decimal arithmetic so the DuckDB oracle
    * lands on identical doubles (see graft.queries.Parity). */
  def forecastTrend(data: DataFrame, groupCol: Column, ts: Column, value: Column,
      tieBreak: Column, window: Int, horizon: Int, stepDays: Int): DataFrame = {
    import graft.queries.Parity.{dsum, dsum2}
    val ctx = lookbackContext(data, groupCol, ts, tieBreak, window)
      .withColumn("__x", datediff(to_date(ts), to_date(lit("1970-01-01"))).cast("double"))
    val agg = ctx.groupBy(groupCol.as("group_key"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("__x")).as("sx"), // integral day counts: exact in double
        dsum(value).as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        dsum2(col("__x"), value).as("sxy"),
        max(ts).as("last_ts"),
        max(col("__x")).as("x_last"),
        count(lit(1)).as("n_ctx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    agg
      .withColumn("slope",
        when(den === 0.0, lit(0.0))
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy")) / den))
      .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / col("n"))
      .withColumn("h", explode(sequence(lit(1), lit(horizon))))
      .withColumn("forecast_date",
        date_add(to_date(col("last_ts")), col("h") * stepDays).cast("timestamp"))
      .withColumn("forecast",
        round(col("intercept") + col("slope") * (col("x_last") + col("h") * stepDays), 4))
      .select(col("group_key"), col("h"), col("forecast_date"), col("forecast"), col("n_ctx"))
  }

  /** Seasonal-naive forecast with residual-σ confidence bounds — the
    * third TS engine next to the flat mean ([[forecast]]) and the OLS
    * trend ([[forecastTrend]]), mirroring the reference's pluggable
    * `timeseries_settings` model variety (sql_query.py:181-205).
    *
    * Model: within each group's lookback window, context rows take a
    * phase = backward-offset mod `period`; the forecast for horizon step
    * h is the mean of context values in phase (-h mod period) — the
    * value the series took one/two/three seasons before the forecast
    * point. Bounds are forecast ± z·σ where σ is the RMS residual of the
    * phase-mean model on its own context (the seasonal-naive in-sample
    * error). A phase with no context rows (window < period) falls back
    * to the group mean.
    *
    * Scale shape: ONE window pass builds the context, then two
    * map-side-combinable aggregations (per group×phase, per group) and
    * joins keyed on the group — phase tables are groups×period rows,
    * never corpus-sized. All sums are exact-decimal (see Parity) so the
    * DuckDB oracle lands on identical doubles. */
  def forecastSeasonal(data: DataFrame, groupCol: Column, ts: Column, value: Column,
      tieBreak: Column, window: Int, horizon: Int, stepDays: Int, period: Int,
      z: Double = 1.96): DataFrame = {
    import graft.queries.Parity.dsum2
    val w = Window.partitionBy(groupCol).orderBy(ts.desc, tieBreak.desc)
    val ctx = data
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= window)
      .select(groupCol.as("gk"), ts.as("__ts"), value.as("__v"),
        (col("__rn") % period).as("__ph"))
    val phase = ctx.groupBy(col("gk"), col("__ph"))
      .agg(round(davg(col("__v")), 4).as("pm"))
    val grp = ctx.groupBy(col("gk"))
      .agg(round(davg(col("__v")), 4).as("gm"),
        max(col("__ts")).as("last_ts"), count(lit(1)).as("n_ctx"))
    val sig = ctx.join(phase, Seq("gk", "__ph"))
      .withColumn("__r", col("__v") - col("pm"))
      .groupBy(col("gk"))
      .agg(dsum2(col("__r"), col("__r")).as("ss"), count(lit(1)).as("n"))
      .select(col("gk"), round(sqrt(col("ss") / col("n")), 4).as("sigma"))
    grp.join(sig, Seq("gk"))
      .withColumn("h", explode(sequence(lit(1), lit(horizon))))
      .withColumn("__ph", (lit(period) - col("h") % period) % period)
      .join(phase, Seq("gk", "__ph"), "left")
      .withColumn("forecast", coalesce(col("pm"), col("gm")))
      .withColumn("forecast_date",
        date_add(to_date(col("last_ts")), col("h") * stepDays).cast("timestamp"))
      .withColumn("lower", round(col("forecast") - lit(z) * col("sigma"), 4))
      .withColumn("upper", round(col("forecast") + lit(z) * col("sigma"), 4))
      .select(col("gk").as("group_key"), col("h"), col("forecast_date"),
        col("forecast"), col("lower"), col("upper"), col("n_ctx"))
  }

  /** Exponentially-weighted moving average forecast (fourth TS engine):
    * s₁ = x₁, sₜ = α·xₜ + (1-α)·sₜ₋₁ over the context window in time
    * order; the flat forecast is the final smoothed level. The fold
    * runs INSIDE the aggregate over the per-group context array (≤
    * `window` elements by construction), so the shape is one window
    * pass + one combinable aggregation like every other engine — and
    * the strictly-sequential double arithmetic is order-pinned, which
    * makes the result bit-identical across engines and partitionings. */
  def forecastEwma(data: DataFrame, groupCol: Column, ts: Column, value: Column,
      tieBreak: Column, window: Int, horizon: Int, stepDays: Int,
      alpha: Double): DataFrame = {
    val ctx = lookbackContext(data, groupCol, ts, tieBreak, window)
    val agg = ctx.groupBy(groupCol.as("group_key"))
      .agg(array_sort(collect_list(struct(ts.as("t"), tieBreak.as("k"), value.as("v"))))
          .as("arr"),
        max(ts).as("last_ts"), count(lit(1)).as("n_ctx"))
      .withColumn("vals", transform(col("arr"), x => x.getField("v")))
      .withColumn("level", aggregate(
        slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
        element_at(col("vals"), 1),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc))
    agg
      .withColumn("h", explode(sequence(lit(1), lit(horizon))))
      .withColumn("forecast_date",
        date_add(to_date(col("last_ts")), col("h") * stepDays).cast("timestamp"))
      // floor(x·10⁴+0.5)/10⁴, not round(x,4): the fold can land exactly
      // on a .00005 tie, where engine tie-breaking (HALF_UP vs
      // half-even) diverges — this spelling is tie-independent given
      // the same double on both sides (levels are non-negative prices)
      .withColumn("forecast", floor(col("level") * 1e4 + 0.5) / 1e4)
      .select(col("group_key"), col("h"), col("forecast_date"), col("forecast"), col("n_ctx"))
  }

  /** Holt linear (double-exponential) forecast — fifth TS engine: the
    * EWMA level recurrence plus a smoothed trend, so the forecast is a
    * line, not a flat level. Seed (l₁,b₁) = (x₁, 0); then
    *   lₜ = α·xₜ + (1-α)(lₜ₋₁+bₜ₋₁),  bₜ = β(lₜ-lₜ₋₁) + (1-β)bₜ₋₁;
    * forecast(h) = l + h·b. Same shape as [[forecastEwma]]: the strictly
    * sequential fold runs inside the aggregate over the ≤`window`-element
    * per-group context array (a 2-element [level, trend] accumulator),
    * one window pass + one combinable aggregation — and the order-pinned
    * double arithmetic is bit-identical across engines/partitionings. */
  def forecastHolt(data: DataFrame, groupCol: Column, ts: Column, value: Column,
      tieBreak: Column, window: Int, horizon: Int, stepDays: Int,
      alpha: Double, beta: Double): DataFrame = {
    val ctx = lookbackContext(data, groupCol, ts, tieBreak, window)
    // new level inlined twice in the fold (no let-binding in the lambda);
    // the oracle SQL spells the identical duplicated expression so both
    // engines run the same double ops in the same order
    def newLevel(acc: Column, x: Column): Column =
      lit(alpha) * x + lit(1.0 - alpha) * (element_at(acc, 1) + element_at(acc, 2))
    val agg = ctx.groupBy(groupCol.as("group_key"))
      .agg(array_sort(collect_list(struct(ts.as("t"), tieBreak.as("k"), value.as("v"))))
          .as("arr"),
        max(ts).as("last_ts"), count(lit(1)).as("n_ctx"))
      .withColumn("vals", transform(col("arr"), x => x.getField("v")))
      .withColumn("lb", aggregate(
        slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
        array(element_at(col("vals"), 1), lit(0.0)),
        (acc, x) => array(
          newLevel(acc, x),
          lit(beta) * (newLevel(acc, x) - element_at(acc, 1)) +
            lit(1.0 - beta) * element_at(acc, 2))))
    agg
      .withColumn("h", explode(sequence(lit(1), lit(horizon))))
      .withColumn("forecast_date",
        date_add(to_date(col("last_ts")), col("h") * stepDays).cast("timestamp"))
      // tie-independent rounding, same rationale as forecastEwma
      .withColumn("forecast", floor(
        (element_at(col("lb"), 1) + col("h") * element_at(col("lb"), 2)) * 1e4 + 0.5) / 1e4)
      .select(col("group_key"), col("h"), col("forecast_date"), col("forecast"), col("n_ctx"))
  }

  /** Holt-Winters additive forecast (sixth TS engine): level + trend +
    * seasonality. Seasonal indices are fixed at their initial estimates
    * (phase mean − group mean over the lookback, the γ=0 variant of
    * additive Holt-Winters — Winters 1960 §3 with the seasonal update
    * switched off), then the [[forecastHolt]] level/trend recurrence
    * runs over the DESEASONALIZED series and the matching index is added
    * back at forecast time:
    *   forecast(h) = l + h·b + s[(−h) mod period].
    *
    * Determinism: indices derive from rounded exact-decimal means (same
    * spelling as [[forecastSeasonal]]); the fold is order-pinned inside
    * one aggregate; so results are bit-identical across engines and
    * partitionings. Scale shape: one window pass, two group(-×phase)
    * aggregations, joins keyed on the group — identical to the other
    * engines, no new shuffle class. */
  def forecastHoltWinters(data: DataFrame, groupCol: Column, ts: Column, value: Column,
      tieBreak: Column, window: Int, horizon: Int, stepDays: Int, period: Int,
      alpha: Double, beta: Double): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(ts.desc, tieBreak.desc)
    val ctx = data
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= window)
      .select(groupCol.as("gk"), ts.as("__ts"), tieBreak.as("__k"), value.as("__v"),
        (col("__rn") % period).as("__ph"))
    val phase = ctx.groupBy(col("gk"), col("__ph"))
      .agg(round(davg(col("__v")), 4).as("pm"))
    val grp = ctx.groupBy(col("gk"))
      .agg(round(davg(col("__v")), 4).as("gm"),
        max(col("__ts")).as("last_ts"), count(lit(1)).as("n_ctx"))
    // deseasonalize, then fold level+trend over the time-ordered array
    def newLevel(acc: Column, x: Column): Column =
      lit(alpha) * x + lit(1.0 - alpha) * (element_at(acc, 1) + element_at(acc, 2))
    val folded = ctx.join(phase, Seq("gk", "__ph")).join(grp.select(col("gk"), col("gm")), Seq("gk"))
      .withColumn("__d", col("__v") - (col("pm") - col("gm")))
      .groupBy(col("gk"))
      .agg(array_sort(collect_list(struct(col("__ts").as("t"), col("__k").as("k"),
        col("__d").as("v")))).as("arr"))
      .withColumn("vals", transform(col("arr"), x => x.getField("v")))
      .withColumn("lb", aggregate(
        slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
        array(element_at(col("vals"), 1), lit(0.0)),
        (acc, x) => array(
          newLevel(acc, x),
          lit(beta) * (newLevel(acc, x) - element_at(acc, 1)) +
            lit(1.0 - beta) * element_at(acc, 2))))
      .select(col("gk"), col("lb"))
    grp.join(folded, Seq("gk"))
      .withColumn("h", explode(sequence(lit(1), lit(horizon))))
      .withColumn("__ph", (lit(period) - col("h") % period) % period)
      .join(phase, Seq("gk", "__ph"), "left")
      .withColumn("forecast_date",
        date_add(to_date(col("last_ts")), col("h") * stepDays).cast("timestamp"))
      // tie-independent rounding, same rationale as forecastEwma
      .withColumn("forecast", floor(
        (element_at(col("lb"), 1) + col("h") * element_at(col("lb"), 2) +
          coalesce(col("pm") - col("gm"), lit(0.0))) * 1e4 + 0.5) / 1e4)
      .select(col("gk").as("group_key"), col("h"), col("forecast_date"),
        col("forecast"), col("n_ctx"))
  }

  /** Time-series model created by the reference's TS DDL —
    * `CREATE MODEL m FROM (q) PREDICT v ORDER BY ts [GROUP BY g]
    * WINDOW n HORIZON h [USING engine=…]` (sql_query.py:181-205
    * timeseries_settings). Applies as a whole-frame transform: joining
    * the model forecasts over the join's data side with the stored
    * settings. Engines: mean (default), trend, seasonal, ewma, holt. */
  final case class TsModel(
      name: String,
      target: String,
      tsCol: String,
      groupCol: Option[String],
      window: Int,
      horizon: Int,
      engine: String,
      params: Map[String, String]) extends graft.ml.FrameModel {
    import org.apache.spark.sql.types._
    override def featureCols: Seq[String] = tsCol +: groupCol.toSeq
    override def outputSchema: StructType = {
      val base = Seq(
        StructField(groupCol.getOrElse("group_key"), LongType),
        StructField("h", IntegerType),
        StructField("forecast_date", TimestampType),
        StructField("forecast", DoubleType))
      val bounds =
        if (engine == "seasonal")
          Seq(StructField("lower", DoubleType), StructField("upper", DoubleType))
        else Nil
      StructType(base ++ bounds :+ StructField("n_ctx", LongType))
    }
    override def transform(df: DataFrame): DataFrame = {
      val g = groupCol.map(col).getOrElse(lit(0L))
      val tie = col(params.getOrElse("tie_break", tsCol))
      val step = params.getOrElse("step_days", "30").toInt
      val out = engine match {
        case "trend" =>
          forecastTrend(df, g, col(tsCol), col(target), tie, window, horizon, step)
        case "seasonal" =>
          forecastSeasonal(df, g, col(tsCol), col(target), tie, window, horizon, step,
            period = params.getOrElse("period", "4").toInt)
        case "ewma" =>
          forecastEwma(df, g, col(tsCol), col(target), tie, window, horizon, step,
            alpha = params.getOrElse("alpha", "0.3").toDouble)
        case "holt" =>
          forecastHolt(df, g, col(tsCol), col(target), tie, window, horizon, step,
            alpha = params.getOrElse("alpha", "0.3").toDouble,
            beta = params.getOrElse("beta", "0.2").toDouble)
        case "holt_winters" =>
          forecastHoltWinters(df, g, col(tsCol), col(target), tie, window, horizon, step,
            period = params.getOrElse("period", "4").toInt,
            alpha = params.getOrElse("alpha", "0.3").toDouble,
            beta = params.getOrElse("beta", "0.2").toDouble)
        case _ =>
          forecast(df, g, col(tsCol), col(target), tie, window, horizon, step)
      }
      groupCol.fold(out)(gc => out.withColumnRenamed("group_key", gc))
    }
  }

  /** `> LATEST` semantics (apply_predictor_step.py:145-151 forecast
    * offset 1): one forecast row per group strictly beyond the group's
    * max seen timestamp. */
  def latest(data: DataFrame, groupCol: Column, ts: Column, value: Column,
      tieBreak: Column, window: Int, stepExpr: String): DataFrame = {
    val ctx = lookbackContext(data, groupCol, ts, tieBreak, window)
    ctx.groupBy(groupCol.as("group_key"))
      .agg(davg(value).as("base"), max(ts).as("last_ts"), count(lit(1)).as("n_ctx"))
      .withColumn("next_ts", col("last_ts") + expr(stepExpr))
      .withColumn("forecast", round(col("base"), 4))
      .select(col("group_key"), col("next_ts"), col("forecast"), col("n_ctx"))
  }
}

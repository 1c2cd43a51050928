package graft.queries

import graft.engine.Tables
import graft.ml.{LinearModel, Predict, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import Parity._

/** Model-as-table + time-series prediction pack (SURVEY §2.1
  * ApplyPredictor steps + GetPredictorColumns, §2.9 TS planning;
  * reference apply_predictor_step.py, plan_join_ts.py, map_reduce_step.py).
  *
  * The "model runtime" is a deterministic linear scorer driven through
  * the real apply path — row-id generation, batched mapPartitions
  * inference, row-id join-back — so the DuckDB oracle can recompute
  * every prediction exactly.
  */
object ModelPack extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** churn-ish scorer over lineitem features */
  private val scorer = LinearModel(
    name = "lineitem_scorer",
    featureCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
    weights = Seq(0.01, 0.0001, -2.0),
    bias = 0.5)

  // Round at 6 decimals, not 4: the features are 2-decimal money values
  // and the weights 2-to-4-decimal constants, so true scores sit exactly
  // on the 6-decimal grid — rounding there is drift-proof, while a
  // 4-decimal cut lands on exact .5 boundaries where Spark (shortest-
  // repr HALF_UP) and DuckDB (binary) disagree.
  /** Shared EWMA oracle: m18 (library call) and m19 (TS DDL) must
    * produce the identical frame. */
  private val ewmaOracle = """
      WITH ranked AS (
        SELECT o_custkey AS g, o_orderdate, o_orderkey, o_totalprice AS v,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders),
      per AS (
        SELECT g, list(v ORDER BY o_orderdate, o_orderkey) AS vals,
          MAX(o_orderdate) AS last_ts, COUNT(*) AS n_ctx
        FROM ranked WHERE rn <= 8 GROUP BY g)
      SELECT g AS o_custkey, CAST(h AS INTEGER) AS h,
        CAST(CAST(last_ts AS DATE) + CAST(h*30 AS INTEGER) AS TIMESTAMP) AS forecast_date,
        FLOOR(list_reduce(vals,
          (acc, x) -> CAST(0.3 AS DOUBLE)*x + CAST(0.7 AS DOUBLE)*acc) * 10000 + 0.5)
          / 10000 AS forecast,
        n_ctx
      FROM per, UNNEST(generate_series(1, 2)) AS t(h)
      ORDER BY o_custkey, h"""

  private val oScore =
    "ROUND(0.5 + 0.01*l_quantity + 0.0001*l_extendedprice + (-2.0)*l_discount, 6)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // data JOIN model with __row_id semantics (apply_predictor_step.py:112-200)
    "m01_model_join" -> ((s, dir) => {
      val data = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      Predict.applyModel(data, scorer)
        .withColumn("score", round(col("score"), 6))
        .withColumn("label", when(col("score") > 3.0, "high").otherwise("low"))
        .select(col("l_orderkey"), col("l_linenumber"), col("score"), col("label"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("score"))
    }),

    // ApplyPredictorRowStep: literal WHERE values → one-row predict
    "m02_model_row" -> ((s, dir) => {
      Predict.applyRow(s, scorer,
        Map("l_quantity" -> 30.0, "l_extendedprice" -> 45000.5, "l_discount" -> 0.05))
        .withColumn("score", round(col("score"), 6))
    }),

    // TS context + horizon forecast (plan_join_ts.py:244-334 collapsed
    // to one windowed plan)
    "m03_ts_forecast" -> ((s, dir) => {
      TimeSeries.forecast(t(s, dir, "orders"),
        col("o_custkey"), col("o_orderdate"), col("o_totalprice"), col("o_orderkey"),
        window = 4, horizon = 2, stepDays = 30)
        .withColumnRenamed("group_key", "o_custkey")
        .orderBy(col("o_custkey"), col("h"))
    }),

    // seasonal-naive TS forecast with residual-σ bounds: per-phase means
    // over the context window, forecast ± 1.96σ of the in-sample
    // residuals (the third engine of the pluggable TS variety,
    // sql_query.py:181-205)
    "m17_ts_seasonal" -> ((s, dir) => {
      TimeSeries.forecastSeasonal(t(s, dir, "orders"),
        col("o_custkey"), col("o_orderdate"), col("o_totalprice"), col("o_orderkey"),
        window = 12, horizon = 4, stepDays = 30, period = 4)
        .withColumnRenamed("group_key", "o_custkey")
        .orderBy(col("o_custkey"), col("h"))
    }),

    // the m18 semantics through the reference's TS DDL: CREATE MODEL …
    // PREDICT v ORDER BY ts GROUP BY g WINDOW n HORIZON h USING
    // engine='ewma', then applied by joining data against the model
    "m19_ts_ddl" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL ts19 FROM (SELECT * FROM orders)
        PREDICT o_totalprice ORDER BY o_orderdate GROUP BY o_custkey
        WINDOW 8 HORIZON 2
        USING engine='ewma', alpha=0.3, step_days=30, tie_break='o_orderkey'""")
      c.execute("""SELECT o_custkey, h, forecast_date, forecast, n_ctx
        FROM orders JOIN ts19 ORDER BY o_custkey, h""")
    }),

    // Holt linear (double-exponential) forecast: level + smoothed trend
    // fold over the context array, forecast(h) = level + h·trend — the
    // fifth TS engine, routed through the TS DDL to prove the USING
    // engine='holt' lifecycle end to end
    "m23_ts_holt" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL ts23 FROM (SELECT * FROM orders)
        PREDICT o_totalprice ORDER BY o_orderdate GROUP BY o_custkey
        WINDOW 8 HORIZON 3
        USING engine='holt', alpha=0.5, beta=0.3, step_days=30,
          tie_break='o_orderkey'""")
      c.execute("""SELECT o_custkey, h, forecast_date, forecast, n_ctx
        FROM orders JOIN ts23 ORDER BY o_custkey, h""")
    }),

    // Holt-Winters additive (sixth TS engine): fixed seasonal indices
    // (phase mean − group mean, the γ=0 additive variant) + the Holt
    // level/trend fold over the deseasonalized series, through the TS DDL
    "m24_ts_holt_winters" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL ts24 FROM (SELECT * FROM orders)
        PREDICT o_totalprice ORDER BY o_orderdate GROUP BY o_custkey
        WINDOW 12 HORIZON 4
        USING engine='holt_winters', alpha=0.5, beta=0.3, period=4,
          step_days=30, tie_break='o_orderkey'""")
      c.execute("""SELECT o_custkey, h, forecast_date, forecast, n_ctx
        FROM orders JOIN ts24 ORDER BY o_custkey, h""")
    }),

    // EWMA forecast: order-pinned fold over the context array — the
    // fourth TS engine (flat mean / OLS trend / seasonal / EWMA)
    "m18_ts_ewma" -> ((s, dir) => {
      TimeSeries.forecastEwma(t(s, dir, "orders"),
        col("o_custkey"), col("o_orderdate"), col("o_totalprice"), col("o_orderkey"),
        window = 8, horizon = 2, stepDays = 30, alpha = 0.3)
        .withColumnRenamed("group_key", "o_custkey")
        .orderBy(col("o_custkey"), col("h"))
    }),

    // linear-trend TS forecast: per-group OLS over the context window as
    // ONE aggregation pass (no per-group fitting loop)
    "m10_ts_trend" -> ((s, dir) => {
      TimeSeries.forecastTrend(t(s, dir, "orders"),
        col("o_custkey"), col("o_orderdate"), col("o_totalprice"), col("o_orderkey"),
        window = 6, horizon = 2, stepDays = 30)
        .withColumnRenamed("group_key", "o_custkey")
        .orderBy(col("o_custkey"), col("h"))
    }),

    // `WHERE ts BETWEEN a AND b` on a TS model join — the reference's
    // windowed-forecast plan (plan_join_ts.py:244-265): context = the
    // last `window` rows strictly BEFORE the range start, forecasts
    // post-filtered to the range, bounds inclusive
    "m34_ts_between" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL ts34 FROM (SELECT * FROM orders)
        PREDICT o_totalprice ORDER BY o_orderdate GROUP BY o_custkey
        WINDOW 4 HORIZON 4
        USING engine='mean', step_days=30, tie_break='o_orderkey'""")
      c.execute("""SELECT o_custkey, h, forecast_date, forecast, n_ctx
        FROM orders JOIN ts34
        WHERE o_orderdate BETWEEN '1995-06-01' AND '1995-09-30'
        ORDER BY o_custkey, h""")
    }),

    // `> LATEST`: one step beyond each group's max seen timestamp
    "m04_ts_latest" -> ((s, dir) => {
      TimeSeries.latest(t(s, dir, "events"),
        col("user_id"), col("ts"), col("value"), col("event_id"),
        window = 10, stepExpr = "INTERVAL 1 HOUR")
        .withColumnRenamed("group_key", "user_id")
        .orderBy(col("user_id"))
    }),

    // the m01 semantics as pure SQL through the statement router:
    // JOINing a registered model applies it (plan_join.py:357-401)
    "m08_model_join_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL li_scorer PREDICT score USING
        features='l_quantity,l_extendedprice,l_discount',
        weights='0.01,0.0001,-2.0', bias=0.5""")
      c.execute("""SELECT l_orderkey, l_linenumber, ROUND(score, 6) AS score,
          CASE WHEN ROUND(score, 6) > 3.0 THEN 'high' ELSE 'low' END AS label
        FROM (SELECT * FROM lineitem WHERE l_quantity >= 45) JOIN li_scorer
        ORDER BY l_orderkey, l_linenumber, score""")
    }),

    // ridge-regression engine through the SQL lifecycle: λ shrinks the
    // slope toward zero relative to m06's OLS (the oracle refits the
    // same penalized closed form from explicit sums). λ is large enough
    // that ridge and OLS disagree well above the 6dp coefficient round.
    "m26_ridge_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL ridge_m26 FROM
        (SELECT l_quantity, l_extendedprice FROM lineitem)
        PREDICT l_extendedprice USING engine='ridge', features='l_quantity',
        lambda=5000000.0, score_column='pred'""")
      c.execute("""SELECT l_orderkey, l_linenumber, ROUND(pred, 4) AS pred
        FROM (SELECT * FROM lineitem WHERE l_quantity >= 48) JOIN ridge_m26
        ORDER BY l_orderkey, l_linenumber""")
    }),

    // chained model application: one predictor's output column is the
    // next predictor's feature, in a single statement — the reference
    // planner walks arbitrary join trees applying every predictor
    // relation it meets (plan_join.py:357-401), so nesting the first
    // application as the data side of the second must route recursively
    "m21_model_chain_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL chain_score PREDICT score USING
        features='l_quantity,l_extendedprice,l_discount',
        weights='0.01,0.0001,-2.0', bias=0.5""")
      c.execute("""CREATE MODEL chain_risk PREDICT risk USING
        features='score', weights='2.0', bias=-1.0""")
      // score joins the sort as a tiebreak: the synthetic lineitem has
      // duplicate (orderkey, linenumber) pairs, and an untied ORDER BY
      // leaves the two engines free to disagree on tie order
      c.execute("""SELECT l_orderkey, l_linenumber, ROUND(score, 6) AS score,
          ROUND(risk, 6) AS risk
        FROM (SELECT * FROM
          (SELECT * FROM lineitem WHERE l_quantity >= 45) JOIN chain_score)
        JOIN chain_risk
        ORDER BY l_orderkey, l_linenumber, score""")
    }),

    // reliability diagram (calibration curve) over a model's scores:
    // per score bin, the mean score vs the observed positive rate — the
    // first chart anyone draws before trusting a scorer. One
    // model-apply map + one combinable rollup to |bins| rows; the mean
    // rides DECIMAL-exact sums of the 6dp-rounded score so bin means
    // are order-independent.
    "m33_reliability_diagram" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val scored = Predict.applyModel(t(s, dir, "lineitem"), scorer)
        .withColumn("score", round(col("score"), 6))
      scored.withColumn("bin", floor(col("score")).cast("int"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("score").cast(DecimalType(18, 6))).cast("double") /
            count(lit(1)), 6).as("mean_score"),
          round(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("pos_rate"))
        .orderBy(col("bin"))
    }),

    // split-conformal prediction intervals (Vovk et al. 2005; the
    // distribution-free uncertainty wrapper production ML serves): fit
    // OLS on a train split, take the ceil(0.9·n)-th smallest absolute
    // calibration residual as the 90% interval half-width, report
    // held-out coverage. Scale shape: the fit is ONE combinable
    // decimal-sum aggregate; the quantile is a window over the
    // CALIBRATION split only (a fraction of the data by construction —
    // at 100 TB the calibration set is sampled, not the corpus); the
    // coverage check is a broadcast of two scalars into a narrow map.
    // Floats: sums stay DECIMAL-exact, a/b and residuals are doubles
    // computed with the same parenthesization both engines; the
    // quantile VALUE is order-stable because ties in the rounded
    // residual all carry the same value.
    "m32_conformal_intervals" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      val train = li.filter(col("l_orderkey") <= 3000)
      // the fit is two scalars — collect them ONCE instead of
      // re-materializing the fit subquery inside both the calibration
      // and test plans (the r14 bench showed the duplicated broadcast
      // subquery dominating this query's constant factor)
      val fitRow = train.agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x").cast(DecimalType(18, 4))).cast("double").as("sx"),
          sum(col("y").cast(DecimalType(18, 4))).cast("double").as("sy"),
          sum((col("x").cast(DecimalType(18, 4)) * col("y").cast(DecimalType(18, 4)))).cast("double").as("sxy"),
          sum((col("x").cast(DecimalType(18, 4)) * col("x").cast(DecimalType(18, 4)))).cast("double").as("sxx"))
        .withColumn("b", (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
        .withColumn("a", (col("sy") - col("b") * col("sx")) / col("n"))
        .select(col("a"), col("b")).head()
      val aFit = if (fitRow.isNullAt(0)) Double.NaN else fitRow.getDouble(0)
      val bFit = if (fitRow.isNullAt(1)) Double.NaN else fitRow.getDouble(1)
      def resid(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("r",
          round(abs(col("y") - (lit(aFit) + lit(bFit) * col("x"))), 4))
      val cal = resid(li.filter(col("l_orderkey") > 3000 && col("l_orderkey") <= 4500))
        .persist()
      val nCal = cal.count()
      val k = math.ceil(0.9 * nCal).toLong
      // tiny SFs can leave the calibration key-slice empty (sf0.001 has
      // no orderkey in (3000,4500]); an empty calibration set means an
      // interval of width 0, not a crash. Below 10^6 calibration rows
      // the k-th smallest is ONE top-(n−k+1) heap (TakeOrdered on the
      // 10%-of-cal tail — never a global sort); only a calibration set
      // that outgrows a single heap falls back to q61's histogram walk
      // (≤4 map-side-combinable scans), so the path stays safe even if
      // the calibration set ever scales with the corpus instead of
      // staying a fixed sample
      val rtt = cal.select(round(col("r") * 10000).cast("long").as("r_tt"))
      val qHat =
        if (nCal == 0) 0.0
        else if (nCal <= 1000000L)
          rtt.orderBy(col("r_tt").desc).limit((nCal - k + 1).toInt)
            .agg(min(col("r_tt"))).head().getLong(0) / 10000.0
        else Relational.kthSmallest(rtt, "r_tt", k) / 10000.0
      cal.unpersist()
      val test = resid(li.filter(col("l_orderkey") > 4500 && col("l_orderkey") <= 6000))
      // grouped (not global) agg: an empty test slice yields zero rows,
      // matching the oracle's GROUP BY — the constants group to one row
      // whenever any test data exists
      test.withColumn("n_cal", lit(nCal)).withColumn("qh", lit(qHat))
        .groupBy(col("n_cal"), col("qh"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("r") <= col("qh"), 1L).otherwise(0L)).as("covered"))
        .select(col("n_cal"), round(col("qh"), 4).as("q_hat"), col("n_test"),
          col("covered"),
          round(col("covered").cast("double") / col("n_test"), 4).as("coverage"))
    }),

    // rolling-origin backtest — the standard TS cross-validation
    // (Hyndman & Athanasopoulos, "Forecasting" §5.10): fold k holds out
    // the k-th-newest point of every series and forecasts it with the
    // window-4 mean of the points strictly before it (m03's engine),
    // reporting per-fold MAE. One ranking window + one frame window —
    // no per-fold rescans; folds are rows of the same plan. Float
    // safety: the error stays DECIMAL as |4·actual − Σ4| (scaling by 4
    // avoids the /4 whose result is not a binary fraction); doubles
    // appear only in the final one-per-fold division.
    "m22_ts_backtest" -> ((s, dir) => {
      val wRank = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val ranked = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(wRank))
      val wNext = Window.partitionBy(col("o_custkey")).orderBy(col("rn"))
        .rowsBetween(1, 4)
      ranked
        .withColumn("s4", sum(col("o_totalprice").cast(DecimalType(18, 4))).over(wNext))
        .withColumn("n4", count(lit(1)).over(wNext))
        .filter(col("rn") <= 3 && col("n4") === 4)
        .withColumn("err4",
          abs(col("o_totalprice").cast(DecimalType(18, 4)) * 4 - col("s4")))
        .groupBy(col("rn").cast(LongType).as("fold"))
        .agg(count(lit(1)).as("n_series"),
          (sum(col("err4")).cast(DoubleType)
            / (count(lit(1)) * lit(4.0))).as("mae"))
        .orderBy(col("fold"))
    }),

    // the m02 semantics as pure SQL: SELECT FROM <model> WHERE literal
    // feature values (ApplyPredictorRowStep, steps.py:172)
    "m09_model_row_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL li_row PREDICT score USING
        features='l_quantity,l_extendedprice,l_discount',
        weights='0.01,0.0001,-2.0', bias=0.5""")
      c.execute("""SELECT l_quantity, l_extendedprice, l_discount,
          ROUND(score, 6) AS score
        FROM li_row
        WHERE l_quantity = 30.0 AND l_extendedprice = 45000.5 AND l_discount = 0.05""")
    }),

    // anomaly-detection engine in the SQL model lifecycle: per-group
    // z-scores, 2.5σ flag, applied by joining the data against the model
    // time-series gap-fill: regularize an irregular per-user daily series
    // onto a dense day spine (per-group min..max), forward-filling gaps
    // with the last observation — the reconciliation step every TS engine
    // needs before windowed training (the reference's timeseries_settings
    // assume a regular cadence; this op manufactures one). Scale shape:
    // the spine explode is linear in each group's day span, the fill is a
    // per-group ordered window (O(1) state, no corpus-wide ordering), and
    // the join is keyed (group, day). Values ride as exact integer cents
    // so both engines hash-match bit-for-bit.
    "m25_ts_gapfill" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("user_id") < 10 && col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")).as("actual_cents"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled_cents", last(col("actual_cents"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("actual_cents").isNull)
        .select(col("user_id"), col("day").cast("timestamp").as("day"),
          col("actual_cents"), col("filled_cents"), col("is_gap"))
        .orderBy(col("user_id"), col("day"))
    }),

    // STL-style seasonal decomposition (Cleveland 1990, moving-average
    // variant): trend = centered 7-row moving average per group, seasonal
    // = per-(group, day-of-week) mean of the detrended series, remainder
    // = the rest. All intermediates are EXACT integers — detrended rides
    // as 7·value − sum7 (no early division) and the seasonal index as
    // (Σdetr7, count) sufficient sums — so the final doubles derive from
    // exact integers in one deterministic expression on both engines.
    // Scale shape: one per-group ordered window (O(1) state), one
    // |groups|×7-sized combinable aggregation broadcast back via an
    // equi-join. No corpus-wide ordering anywhere.
    "m27_stl_decompose" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("value"))
      val w7 = Window.partitionBy(col("prio")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val tr = daily
        .withColumn("sum7", sum(col("value")).over(w7))
        .withColumn("n7", count(col("value")).over(w7))
        .filter(col("n7") === 7)
        .withColumn("detr7", col("value") * 7 - col("sum7"))
        .withColumn("dow", dayofweek(col("day")))
      val seas = tr.groupBy(col("prio"), col("dow"))
        .agg(sum(col("detr7")).as("ssum"), count(lit(1)).as("scnt"))
      tr.join(seas, Seq("prio", "dow"))
        .select(col("prio"), col("day").cast("timestamp").as("day"), col("value"),
          round(col("sum7") / 7.0, 6).as("trend"),
          round(col("ssum") / (col("scnt") * 7.0), 6).as("seasonal"),
          round(col("value") - col("sum7") / 7.0 - col("ssum") / (col("scnt") * 7.0), 6)
            .as("remainder"))
        .orderBy(col("prio"), col("day"))
    }),

    // hierarchical forecast reconciliation (Hyndman & Athanasopoulos
    // §10): per-group lookback-mean forecasts (bottom level) vs the
    // total split top-down by lookback share — the two classic
    // reconciliation paths, which disagree exactly when groups have
    // missing days in the lookback. ONE filtered aggregation feeds both
    // levels; the group and total stat tables are model-sized broadcast
    // scalars; divisions are deferred to the final deterministic
    // expression mirrored token-for-token in the oracle.
    "m28_hier_reconcile" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("v"))
      val maxDay = daily.groupBy().agg(max(col("day")).as("d1"))
      val look = daily.crossJoin(broadcast(maxDay))
        .filter(col("day") > date_sub(col("d1"), 28))
      val g = look.groupBy(col("prio"))
        .agg(sum(col("v")).as("gsum"), count(lit(1)).as("gdays"))
      val tot = look.groupBy()
        .agg(sum(col("v")).as("tsum"), countDistinct(col("day")).as("tdays"))
      g.crossJoin(broadcast(tot)).select(
        col("prio"),
        round(col("gsum").cast(DoubleType) / col("gdays"), 6).as("bottom_fc"),
        round((col("tsum").cast(DoubleType) / col("tdays")) *
          (col("gsum").cast(DoubleType) / col("tsum")), 6).as("topdown_fc"))
        .orderBy(col("prio"))
    }),

    // two-sample Kolmogorov-Smirnov drift statistic (binned, 1000 cells —
    // the distribution-shift alarm beside m12's PSI): D = max |F̂₁ − F̂₂|
    // over the shared equal-width binning. The CDF difference is kept as
    // the EXACT integer cross-product |c₁·n₂ − c₂·n₁| (one division at
    // output), bin counts are map-side combinable, and the only ordered
    // window runs over ≤1001 post-aggregation bins — model-sized, the
    // same deliberate exception as e27/e29. Binning (not per-value CDFs)
    // is the 100 TB choice: exact per-value KS needs a corpus-wide
    // ordered scan.
    "m30_ks_drift" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_returnflag").as("g"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("cents"))
      val mm = li.agg(min(col("cents")), max(col("cents"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val w = (hi - lo) / 1000 + 1
      val piv = li.groupBy(expr(s"(cents - $lo) div $w").as("bin"))
        .agg(sum(when(col("g") === "R", 1L).otherwise(0L)).as("nr"),
          sum(when(col("g") === "A", 1L).otherwise(0L)).as("na"))
      val tot = piv.groupBy().agg(sum(col("nr")).as("tr"), sum(col("na")).as("ta"))
      val wb = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
      piv.withColumn("cr", sum(col("nr")).over(wb))
        .withColumn("ca", sum(col("na")).over(wb))
        .crossJoin(broadcast(tot))
        .select(abs(col("cr") * col("ta") - col("ca") * col("tr")).as("num"),
          (col("tr") * col("ta")).as("den"))
        .groupBy(col("den")).agg(max(col("num")).as("ks_num"))
        .select(col("ks_num"), col("den"),
          round(col("ks_num").cast(DoubleType) / col("den"), 6).as("ks_d"))
    }),

    // Theil-Sen robust trend (Sen 1968 — the median of pairwise slopes,
    // immune to the outlier days OLS bends toward): the corpus collapses
    // to the |days| daily rollup FIRST, so the O(days²) pair join and the
    // median selection run at post-aggregation scale (~10³ pairs — the
    // e27/e29/m30 model-sized exception). Slopes divide exact integers;
    // the median uses q61's literal rank formula on the 6dp-rounded
    // slopes so both engines select the identical element.
    "m31_theilsen_trend" -> ((s, dir) => {
      // the daily rollup is |days| rows (dimension-sized, ~2.4k at
      // sf0.1): materialize it ONCE driver-side so the corpus is
      // scanned+aggregated a single time instead of once per join
      // branch, and the pair join runs over two local frames
      val dailyRows = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("v"))
        .select(datediff(col("day"), lit("1992-01-01")).cast(LongType).as("d"),
          col("v"))
        .collect().toSeq
      val daily = s.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(dailyRows).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("d", LongType),
          org.apache.spark.sql.types.StructField("v", LongType))))
      val a = daily.select(col("d").as("d1"), col("v").as("v1"))
      val b = daily.select(col("d").as("d2"), col("v").as("v2"))
      val slopes = a.join(b, col("d1") < col("d2"))
        .select(round((col("v2") - col("v1")).cast(DoubleType) /
          (col("d2") - col("d1")), 6).as("slope"))
      // median WITHOUT a global row_number over all O(days²) pairs (a
      // single-task sort of millions of rows, and a second full join
      // pass for the count): collapse to per-value counts first — the
      // heavy pair join aggregates map-side into |distinct slopes| rows
      // (6dp-rounded, bounded), computed ONCE for both the total and the
      // cumulative walk; the remaining window orders value-count rows
      // only
      val sc = slopes.groupBy(col("slope")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("slope"))
      // ONE pass, no persist: the total pair count rides along as a
      // whole-frame window sum, so the median rank threshold is a
      // per-row expression instead of a separate materializing
      // aggregation (a persist here either leaks cached blocks for the
      // session or, unpersisted, pays the pair join twice)
      sc.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
        .filter(col("cum") >= floor((col("n") - 1) * 0.5) + 1)
        .orderBy(col("slope")).limit(1)
        .select(col("slope").as("theil_sen_slope"), col("n").as("n_pairs"))
    }),

    "m20_anomaly_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL anom20 FROM (SELECT * FROM lineitem)
        PREDICT l_extendedprice USING engine='anomaly',
        features='l_extendedprice', group_by='l_returnflag', threshold=2.5""")
      c.execute("""SELECT l_orderkey, l_linenumber, l_returnflag, score, is_anomaly
        FROM lineitem JOIN anom20 ORDER BY l_orderkey, l_linenumber, score""")
    }),

    // m08 semantics through the ONE-PARSE router: the model join sits
    // inside a CTE and the model carries an alias — shapes the regex
    // fast-path can't see; the Catalyst-parse route (plan_join.py:357-401
    // handles arbitrary join trees) inlines the CTE and swaps the join
    "m16_model_join_cte" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL li_scorer16 PREDICT score USING
        features='l_quantity,l_extendedprice,l_discount',
        weights='0.01,0.0001,-2.0', bias=0.5""")
      c.execute("""WITH scored AS (
          SELECT l_orderkey, l_linenumber, ROUND(score, 6) AS score
          FROM (SELECT * FROM lineitem WHERE l_quantity >= 45) JOIN li_scorer16 AS m)
        SELECT l_orderkey, l_linenumber, score,
          CASE WHEN score > 3.0 THEN 'high' ELSE 'low' END AS label
        FROM scored ORDER BY l_orderkey, l_linenumber, score""")
    }),

    // RETRAIN (command_executor.py:1042): CREATE MODEL ... FROM (query)
    // fits by one-pass OLS sufficient stats; RETRAIN re-runs the stored
    // training query and activates the new version. The oracle recomputes
    // the same regression independently in DuckDB (regr_slope/intercept)
    // and checks both the predictions and the version bookkeeping.
    // model column MAPPING through the join's ON clause (reference
    // test_model_column_maping): the data table's `qty` feeds the
    // model's `l_quantity` feature via `ON m.l_quantity = t.qty` — no
    // renaming in the data, the mapping lives in the join condition
    "m35_model_column_mapping" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL price_m35 FROM
        (SELECT l_quantity, l_extendedprice FROM lineitem)
        PREDICT l_extendedprice USING features='l_quantity', score_column='pred'""")
      c.execute("""CREATE TABLE grid_m35 AS
        SELECT CAST(id*10 AS DOUBLE) AS qty FROM range(1, 4)""")
      c.execute("""SELECT qty, ROUND(pred, 6) AS pred
        FROM grid_m35 t JOIN price_m35 m ON m.l_quantity = t.qty
        ORDER BY qty""")
    }),

    "m06_retrain_version" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL price_m06 FROM
        (SELECT l_quantity, l_extendedprice FROM lineitem)
        PREDICT l_extendedprice USING features='l_quantity', score_column='pred'""")
      c.execute("RETRAIN price_m06")
      val grid = s.range(1, 4).select((col("id") * 10).cast("double").as("l_quantity"))
      Predict.applyModel(grid, c.catalog.model("price_m06"))
        .withColumn("pred", round(col("pred"), 6))
        .withColumn("active_version", lit(c.catalog.activeVersion("price_m06")))
        .withColumn("n_versions", lit(c.catalog.modelVersions("price_m06").length))
        .orderBy(col("l_quantity"))
    }),

    // FINETUNE (command_executor.py:1078): exact incremental OLS — train
    // on the even half, finetune with the odd half; the result must match
    // a single fit over the FULL table, which is what the oracle computes
    "m07_finetune_exact" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL inc_m07 FROM
        (SELECT l_quantity, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 0)
        PREDICT l_extendedprice USING features='l_quantity', score_column='pred'""")
      c.execute("""FINETUNE inc_m07 FROM
        (SELECT l_quantity, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 1)""")
      val grid = s.range(0, 4).select((col("id") * 10 + 5).cast("double").as("l_quantity"))
      Predict.applyModel(grid, c.catalog.model("inc_m07"))
        .withColumn("pred", round(col("pred"), 6))
        .withColumn("active_version", lit(c.catalog.activeVersion("inc_m07")))
        .orderBy(col("l_quantity"))
    }),

    // EVALUATE <metric> FROM (query) (command_executor.py:846
    // answer_evaluate_metric): sklearn-style metric names over an
    // (actual, prediction) frame, each ONE aggregation pass. The oracle
    // recomputes both metrics from the same definitions in DuckDB.
    "m11_evaluate_metric" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      val r2 = c.execute("""EVALUATE r2_score FROM (
          SELECT l_quantity AS actual,
                 l_quantity + 2 * l_discount AS prediction
          FROM lineitem) USING n_decimals = 6""")
      val f1 = c.execute("""EVALUATE f1_score FROM (
          SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS actual,
                 CASE WHEN l_extendedprice > 26000 THEN 1 ELSE 0 END AS prediction
          FROM lineitem) USING n_decimals = 6""")
      r2.crossJoin(f1)
    }),

    // ---- model monitoring: score-distribution drift between a
    // reference window and the current window, as the Population
    // Stability Index over fixed bins. ONE aggregation pass computes the
    // (bin × split) counts; the result is bins-sized (tiny) no matter
    // the corpus, so totals broadcast and every downstream step is
    // driver-trivial. Laplace smoothing (+0.5 per bin) keeps empty bins
    // finite on both engines; per-bin terms round to 6dp and the total
    // is a DECIMAL sum of the rounded terms — order-independent, so the
    // hash matches a single-threaded oracle run.
    "m12_drift_psi" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val binned = t(s, dir, "lineitem").select(
        least(lit(9L), floor(col("l_extendedprice") / 10000)).cast(LongType).as("bin"),
        (col("l_shipdate") < lit("1995-07-01")).as("is_ref"))
      val counts = binned.groupBy(col("bin"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      val tot = counts.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
      val terms = counts.crossJoin(broadcast(tot))
        .withColumn("p_ref", (col("n_ref") + 0.5) / (col("t_ref") + 5.0))
        .withColumn("p_cur", (col("n_cur") + 0.5) / (col("t_cur") + 5.0))
        .withColumn("psi_term",
          round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6))
      terms.select(col("bin"), col("n_ref"), col("n_cur"),
          round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
          col("psi_term"),
          sum(col("psi_term").cast(DecimalType(18, 6)))
            .over(Window.partitionBy(lit(1))).cast(DoubleType).as("psi_total"))
        .orderBy(col("bin"))
    }),

    // ---- classification model: multinomial Naive Bayes trained on a
    // labeled slice, scored on the rest, reported as a confusion matrix.
    // The count-based trainer makes the whole train→predict cycle
    // oracle-exact (see graft.ml.NaiveBayes scale notes: vocabulary-
    // bounded broadcast model, map-side scoring).
    "m13_naive_bayes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (priors, likelihoods) =
        graft.ml.NaiveBayes.train(docs.filter(col("doc_id") < 250), "text", "lang")
      graft.ml.NaiveBayes
        .predict(docs.filter(col("doc_id") >= 250), "text", "doc_id",
          priors, likelihoods, carryCols = Seq("lang"))
        .groupBy(col("lang"), col("pred_label").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang"))
    }),

    // per-class precision/recall/F1 over m13's confusion matrix — the
    // classification half of EVALUATE (m11 covers regression metrics).
    // Everything derives from the |classes|²-sized matrix: three tiny
    // aggregations + left joins, ratios in one deterministic expression
    // (F1 from the UNROUNDED precision/recall, rounded once at output).
    "m29_classification_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (priors, likelihoods) =
        graft.ml.NaiveBayes.train(docs.filter(col("doc_id") < 250), "text", "lang")
      val conf = graft.ml.NaiveBayes
        .predict(docs.filter(col("doc_id") >= 250), "text", "doc_id",
          priors, likelihoods, carryCols = Seq("lang"))
        .groupBy(col("lang"), col("pred_label").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val classes = conf.select(col("lang").as("cls"))
        .union(conf.select(col("pred_lang"))).distinct()
      val tp = conf.filter(col("lang") === col("pred_lang"))
        .select(col("lang").as("cls"), col("n").as("tp"))
      val act = conf.groupBy(col("lang").as("cls")).agg(sum(col("n")).as("actual"))
      val prd = conf.groupBy(col("pred_lang").as("cls")).agg(sum(col("n")).as("predicted"))
      val p = col("tp").cast(DoubleType) / col("predicted")
      val r = col("tp").cast(DoubleType) / col("actual")
      classes.join(tp, Seq("cls"), "left").join(act, Seq("cls"), "left")
        .join(prd, Seq("cls"), "left")
        .na.fill(0L, Seq("tp", "actual", "predicted"))
        .select(col("cls"), col("tp"), col("actual"), col("predicted"),
          round(when(col("predicted") > 0, p).otherwise(0.0), 6).as("prec"),
          round(when(col("actual") > 0, r).otherwise(0.0), 6).as("recall"),
          round(when(col("tp") > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6)
            .as("f1"))
        .orderBy(col("cls"))
    }),

    // the m13 classifier through the SQL model lifecycle: CREATE MODEL
    // with engine='naive_bayes', applied via SELECT … JOIN <model> — the
    // reference's multi-engine CREATE MODEL path
    "m14_nb_model_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL nb_m14 FROM (
          SELECT text, lang FROM documents WHERE doc_id < 250)
        PREDICT lang USING engine='naive_bayes', features='text'""")
      c.execute("""SELECT lang, pred_lang, COUNT(*) AS n
        FROM (SELECT doc_id, lang, text FROM documents WHERE doc_id >= 250)
        JOIN nb_m14
        GROUP BY lang, pred_lang ORDER BY lang, pred_lang""")
    }),

    // MapReduceStep analog (map_reduce_step.py:22-145): per-group
    // parameterized subplan — "top-2 customers per region" — as ONE
    // windowed plan, no per-group loop
    "m05_mapreduce_groups" -> ((s, dir) => {
      val spend = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("c_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
      spend.withColumn("rnk",
          row_number().over(Window.partitionBy(col("r_name"))
            .orderBy(col("spend").desc, col("c_custkey"))))
        .filter(col("rnk") <= 2)
        .select(col("r_name"), col("rnk"), col("c_custkey"), round(col("spend"), 4).as("spend"))
        .orderBy(col("r_name"), col("rnk"))
    })
  )

  /** add-one NB recomputed in DuckDB: 9dp log terms, DECIMAL sums,
    * (score DESC, label ASC) argmax tie-break. Shared by m13 (Scala API)
    * and m14 (SQL model lifecycle) — both must produce this matrix. */
  private val nbMatrixOracle = """
      WITH train_tok AS (
        SELECT lang AS label, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        FROM documents WHERE doc_id < 250),
      class_tok AS (SELECT label, tok, COUNT(*) AS cnt FROM train_tok GROUP BY 1, 2),
      class_tot AS (SELECT label, SUM(cnt) AS tot FROM class_tok GROUP BY 1),
      vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM class_tok),
      n_docs AS (SELECT lang AS label, COUNT(*) AS nd FROM documents
        WHERE doc_id < 250 GROUP BY 1),
      n_total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents WHERE doc_id < 250),
      priors AS (
        SELECT d.label,
          CAST(ROUND(ln(d.nd / t.n), 9) AS DECIMAL(28,10)) AS prior,
          ROUND(ln(1.0 / (ct.tot + v.v)), 9) AS unseen
        FROM n_docs d, n_total t, class_tot ct, vocab v WHERE d.label = ct.label),
      ll AS (
        SELECT ct.label, ct.tok,
          ROUND(ln((ct.cnt + 1.0) / (t.tot + v.v)), 9) AS ll
        FROM class_tok ct JOIN class_tot t USING (label), vocab v),
      dc AS (
        SELECT doc_id, lang, tok, COUNT(*) AS cnt
        FROM (SELECT doc_id, lang,
          unnest(regexp_extract_all(lower(text), '\S+')) AS tok
          FROM documents WHERE doc_id >= 250)
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT dc.doc_id, dc.lang, p.label,
          p.prior + SUM(CAST(dc.cnt * COALESCE(ll.ll, p.unseen) AS DECIMAL(28,10))) AS score
        FROM dc CROSS JOIN priors p
        LEFT JOIN ll ON ll.label = p.label AND ll.tok = dc.tok
        GROUP BY dc.doc_id, dc.lang, p.label, p.prior),
      best AS (
        SELECT doc_id, lang, label,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rk
        FROM scored)
      SELECT lang, label AS pred_lang, COUNT(*) AS n
      FROM best WHERE rk = 1
      GROUP BY lang, label ORDER BY lang, pred_lang"""

  /** the same NB scoring pipeline with the confusion matrix as a `conf`
    * CTE, for oracles that post-process the matrix (m29). */
  private val nbConfusionCtes =
    nbMatrixOracle.stripSuffix("""
      SELECT lang, label AS pred_lang, COUNT(*) AS n
      FROM best WHERE rk = 1
      GROUP BY lang, label ORDER BY lang, pred_lang""") + """,
      conf AS (
        SELECT lang, label AS pred_lang, COUNT(*) AS n
        FROM best WHERE rk = 1 GROUP BY lang, label)"""

  def oracles: Map[String, String] = Map(

    // same matrix, same tiny joins, F1 from unrounded ratios
    "m29_classification_report" -> s"""$nbConfusionCtes,
      classes AS (
        SELECT DISTINCT lang AS cls FROM conf
        UNION SELECT DISTINCT pred_lang FROM conf),
      tp AS (SELECT lang AS cls, n AS tp FROM conf WHERE lang = pred_lang),
      act AS (SELECT lang AS cls, SUM(n) AS actual FROM conf GROUP BY lang),
      prd AS (SELECT pred_lang AS cls, SUM(n) AS predicted FROM conf
              GROUP BY pred_lang)
      SELECT c.cls,
        CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
        CAST(COALESCE(act.actual, 0) AS BIGINT) AS actual,
        CAST(COALESCE(prd.predicted, 0) AS BIGINT) AS predicted,
        ROUND(CASE WHEN COALESCE(prd.predicted, 0) > 0
          THEN CAST(COALESCE(tp.tp, 0) AS DOUBLE) / prd.predicted
          ELSE 0.0 END, 6) AS prec,
        ROUND(CASE WHEN COALESCE(act.actual, 0) > 0
          THEN CAST(COALESCE(tp.tp, 0) AS DOUBLE) / act.actual
          ELSE 0.0 END, 6) AS recall,
        ROUND(CASE WHEN COALESCE(tp.tp, 0) > 0
          THEN 2.0 * (CAST(tp.tp AS DOUBLE) / prd.predicted) *
               (CAST(tp.tp AS DOUBLE) / act.actual) /
               ((CAST(tp.tp AS DOUBLE) / prd.predicted) +
                (CAST(tp.tp AS DOUBLE) / act.actual))
          ELSE 0.0 END, 6) AS f1
      FROM classes c
      LEFT JOIN tp ON tp.cls = c.cls
      LEFT JOIN act ON act.cls = c.cls
      LEFT JOIN prd ON prd.cls = c.cls
      ORDER BY c.cls""",

    "m14_nb_model_sql" -> nbMatrixOracle,
    "m13_naive_bayes" -> nbMatrixOracle,

    "m01_model_join" -> s"""
      SELECT l_orderkey, l_linenumber, score,
        CASE WHEN score > 3.0 THEN 'high' ELSE 'low' END AS label
      FROM (SELECT l_orderkey, l_linenumber, $oScore AS score
            FROM lineitem WHERE l_quantity >= 45)
      ORDER BY l_orderkey, l_linenumber, score""",

    "m02_model_row" -> """
      SELECT CAST(30.0 AS DOUBLE) AS l_quantity,
        CAST(45000.5 AS DOUBLE) AS l_extendedprice,
        CAST(0.05 AS DOUBLE) AS l_discount,
        ROUND(0.5 + 0.01*30.0 + 0.0001*45000.5 + (-2.0)*0.05, 6) AS score""",

    "m03_ts_forecast" -> s"""
      WITH ranked AS (
        SELECT o_custkey, o_orderdate, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders),
      per AS (
        SELECT o_custkey, ${oAvg("o_totalprice")} AS base,
          MAX(o_orderdate) AS last_ts, COUNT(*) AS n_ctx
        FROM ranked WHERE rn <= 4 GROUP BY o_custkey)
      SELECT o_custkey, CAST(h AS INTEGER) AS h,
        CAST(CAST(last_ts AS DATE) + CAST(h*30 AS INTEGER) AS TIMESTAMP) AS forecast_date,
        ROUND(base, 4) AS forecast, n_ctx
      FROM per, UNNEST(generate_series(1, 2)) AS t(h)
      ORDER BY o_custkey, h""",

    // same mean engine as m03, context restricted to history BEFORE the
    // range start, forecasts kept only inside the inclusive window
    "m34_ts_between" -> s"""
      WITH ranked AS (
        SELECT o_custkey, o_orderdate, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate < '1995-06-01'),
      per AS (
        SELECT o_custkey, ${oAvg("o_totalprice")} AS base,
          MAX(o_orderdate) AS last_ts, COUNT(*) AS n_ctx
        FROM ranked WHERE rn <= 4 GROUP BY o_custkey),
      fc AS (
        SELECT o_custkey, CAST(h AS INTEGER) AS h,
          CAST(CAST(last_ts AS DATE) + CAST(h*30 AS INTEGER) AS TIMESTAMP) AS forecast_date,
          ROUND(base, 4) AS forecast, n_ctx
        FROM per, UNNEST(generate_series(1, 4)) AS t(h))
      SELECT * FROM fc
      WHERE forecast_date BETWEEN '1995-06-01' AND '1995-09-30'
      ORDER BY o_custkey, h""",

    // the identical left fold (s1 = first value, then α·x + (1-α)·acc in
    // time order) — sequential double arithmetic is order-pinned, so no
    // decimal detour is needed
    "m18_ts_ewma" -> ewmaOracle,

    // the identical [level, trend] left fold (seed [x₁, 0], new level
    // spelled twice inside the lambda exactly as the Spark fold inlines
    // it — same double ops in the same order on both engines)
    "m23_ts_holt" -> """
      WITH ranked AS (
        SELECT o_custkey AS g, o_orderdate, o_orderkey, o_totalprice AS v,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders),
      per AS (
        SELECT g, list(v ORDER BY o_orderdate, o_orderkey) AS vals,
          MAX(o_orderdate) AS last_ts, COUNT(*) AS n_ctx
        FROM ranked WHERE rn <= 8 GROUP BY g),
      folded AS (
        SELECT g, last_ts, n_ctx,
          list_reduce(
            list_concat([[vals[1], CAST(0.0 AS DOUBLE)]],
              list_transform(vals[2:], x -> [x, CAST(0.0 AS DOUBLE)])),
            (acc, x) -> [
              CAST(0.5 AS DOUBLE)*x[1] + CAST(0.5 AS DOUBLE)*(acc[1] + acc[2]),
              CAST(0.3 AS DOUBLE)*(CAST(0.5 AS DOUBLE)*x[1]
                + CAST(0.5 AS DOUBLE)*(acc[1] + acc[2]) - acc[1])
                + CAST(0.7 AS DOUBLE)*acc[2]]) AS lb
        FROM per)
      SELECT g AS o_custkey, CAST(h AS INTEGER) AS h,
        CAST(CAST(last_ts AS DATE) + CAST(h*30 AS INTEGER) AS TIMESTAMP) AS forecast_date,
        FLOOR((lb[1] + h * lb[2]) * 10000 + 0.5) / 10000 AS forecast,
        n_ctx
      FROM folded, UNNEST(generate_series(1, 3)) AS t(h)
      ORDER BY o_custkey, h""",

    // the TS-DDL route produces exactly the m18 forecasts
    "m19_ts_ddl" -> ewmaOracle,

    // same decimal sufficient sums, same population σ, same floor-spelled
    // score rounding (tie-independent given identical doubles)
    "m25_ts_gapfill" -> """
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
          CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS actual_cents
        FROM events WHERE user_id < 10 AND event_type = 'purchase'
        GROUP BY user_id, CAST(ts AS DATE)),
      bounds AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
      spine AS (
        SELECT user_id, CAST(g AS DATE) AS day FROM (
          SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS g
          FROM bounds))
      SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day, d.actual_cents,
        last_value(d.actual_cents IGNORE NULLS)
          OVER (PARTITION BY s.user_id ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
        d.actual_cents IS NULL AS is_gap
      FROM spine s
      LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
      ORDER BY s.user_id, s.day""",

    // same pair construction, same rounded slopes, same literal rank
    "m31_theilsen_trend" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS v
        FROM orders GROUP BY 1),
      dd AS (
        SELECT CAST(datediff('day', DATE '1992-01-01', day) AS BIGINT) AS d, v
        FROM daily),
      slopes AS (
        SELECT ROUND(CAST(b.v - a.v AS DOUBLE) / (b.d - a.d), 6) AS slope
        FROM dd a JOIN dd b ON a.d < b.d),
      r AS (
        SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
          COUNT(*) OVER () AS n
        FROM slopes)
      SELECT slope AS theil_sen_slope, CAST(n AS BIGINT) AS n_pairs
      FROM r WHERE rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1""",

    // same binning, same exact cross-product numerator
    "m30_ks_drift" -> """
      WITH li AS (
        SELECT l_returnflag AS g,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM lineitem WHERE l_returnflag IN ('R', 'A')),
      mm AS (SELECT MIN(cents) AS lo,
               (MAX(cents) - MIN(cents)) // 1000 + 1 AS w FROM li),
      piv AS (
        SELECT (cents - lo) // w AS bin,
          SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS nr,
          SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS na
        FROM li, mm GROUP BY 1),
      tot AS (SELECT SUM(nr) AS tr, SUM(na) AS ta FROM piv),
      cdf AS (
        SELECT bin,
          SUM(nr) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cr,
          SUM(na) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ca
        FROM piv)
      SELECT CAST(MAX(ABS(cr * ta - ca * tr)) AS BIGINT) AS ks_num,
        CAST(tr * ta AS BIGINT) AS den,
        ROUND(CAST(MAX(ABS(cr * ta - ca * tr)) AS DOUBLE) / (tr * ta), 6) AS ks_d
      FROM cdf, tot GROUP BY tr, ta""",

    // same one-pass lookback stats, same deferred-division expression
    "m28_hier_reconcile" -> """
      WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
          COUNT(*) AS v
        FROM orders GROUP BY 1, 2),
      mx AS (SELECT MAX(day) AS d1 FROM daily),
      look AS (SELECT daily.* FROM daily, mx WHERE day > d1 - 28),
      g AS (SELECT prio, SUM(v) AS gsum, COUNT(*) AS gdays
            FROM look GROUP BY prio),
      tot AS (SELECT SUM(v) AS tsum, COUNT(DISTINCT day) AS tdays FROM look)
      SELECT prio,
        ROUND(CAST(gsum AS DOUBLE) / gdays, 6) AS bottom_fc,
        ROUND((CAST(tsum AS DOUBLE) / tdays) * (CAST(gsum AS DOUBLE) / tsum), 6)
          AS topdown_fc
      FROM g, tot ORDER BY prio""",

    // identical integer intermediates (sum7, 7·value − sum7, Σdetr7) and
    // the same left-to-right final double expression; DuckDB's
    // dayofweek is Spark's − 1
    "m27_stl_decompose" -> """
      WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
          COUNT(*) AS value
        FROM orders GROUP BY 1, 2),
      tr AS (
        SELECT prio, day, value,
          SUM(value) OVER w AS sum7,
          COUNT(value) OVER w AS n7
        FROM daily
        WINDOW w AS (PARTITION BY prio ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      t2 AS (
        SELECT prio, day, value, sum7, value * 7 - sum7 AS detr7,
          dayofweek(day) + 1 AS dow
        FROM tr WHERE n7 = 7),
      seas AS (
        SELECT prio, dow, SUM(detr7) AS ssum, COUNT(*) AS scnt
        FROM t2 GROUP BY prio, dow)
      SELECT t2.prio, CAST(t2.day AS TIMESTAMP) AS day,
        CAST(t2.value AS BIGINT) AS value,
        ROUND(t2.sum7 / 7.0, 6) AS trend,
        ROUND(seas.ssum / (seas.scnt * 7.0), 6) AS seasonal,
        ROUND(t2.value - t2.sum7 / 7.0 - seas.ssum / (seas.scnt * 7.0), 6)
          AS remainder
      FROM t2 JOIN seas ON seas.prio = t2.prio AND seas.dow = t2.dow
      ORDER BY t2.prio, t2.day""",

    "m20_anomaly_sql" -> """
      WITH st AS (
        SELECT l_returnflag AS g, CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
                   CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxx
        FROM lineitem GROUP BY 1),
      ms AS (SELECT g, sx/n AS mu,
          CASE WHEN (sxx - sx*sx/n)/n > 0
            THEN sqrt((sxx - sx*sx/n)/n) ELSE 1.0 END AS sigma
        FROM st)
      SELECT l_orderkey, l_linenumber, l_returnflag,
        FLOOR((l_extendedprice - mu)/sigma * 10000 + 0.5)/10000 AS score,
        ABS(FLOOR((l_extendedprice - mu)/sigma * 10000 + 0.5)/10000) > 2.5 AS is_anomaly
      FROM lineitem JOIN ms ON l_returnflag = ms.g
      ORDER BY l_orderkey, l_linenumber, score""",

    // same phases (backward-offset mod period), same decimal phase/group
    // means rounded at 4dp, same decimal residual sum-of-squares
    "m17_ts_seasonal" -> s"""
      WITH ranked AS (
        SELECT o_custkey AS g, o_orderdate, o_totalprice AS v,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders),
      ctx AS (SELECT g, o_orderdate, v, rn % 4 AS ph FROM ranked WHERE rn <= 12),
      phase AS (
        SELECT g, ph, ROUND(${oAvg("v")}, 4) AS pm FROM ctx GROUP BY g, ph),
      grp AS (
        SELECT g, ROUND(${oAvg("v")}, 4) AS gm,
          MAX(o_orderdate) AS last_ts, COUNT(*) AS n_ctx
        FROM ctx GROUP BY g),
      sig AS (
        SELECT c.g, ROUND(sqrt(CAST(SUM(
            CAST((c.v - p.pm) AS DECIMAL(19,4)) * CAST((c.v - p.pm) AS DECIMAL(19,4))
          ) AS DOUBLE) / COUNT(*)), 4) AS sigma
        FROM ctx c JOIN phase p ON c.g = p.g AND c.ph = p.ph GROUP BY c.g),
      steps AS (
        SELECT grp.g, gm, last_ts, n_ctx, sigma, h, (4 - h % 4) % 4 AS ph
        FROM grp JOIN sig ON grp.g = sig.g, UNNEST(generate_series(1, 4)) AS t(h))
      SELECT s.g AS o_custkey, CAST(h AS INTEGER) AS h,
        CAST(CAST(s.last_ts AS DATE) + CAST(h*30 AS INTEGER) AS TIMESTAMP) AS forecast_date,
        COALESCE(p.pm, s.gm) AS forecast,
        ROUND(COALESCE(p.pm, s.gm) - 1.96*s.sigma, 4) AS lower,
        ROUND(COALESCE(p.pm, s.gm) + 1.96*s.sigma, 4) AS upper,
        n_ctx
      FROM steps s LEFT JOIN phase p ON s.g = p.g AND s.ph = p.ph
      ORDER BY o_custkey, h""",

    // m17's phase/group means supply the fixed seasonal indices; m23's
    // list_reduce runs the identical level/trend fold over the
    // deseasonalized series (alpha=0.5, beta=0.3 → the same duplicated
    // new-level expression, spelled once per accumulator slot)
    "m24_ts_holt_winters" -> s"""
      WITH ranked AS (
        SELECT o_custkey AS g, o_orderdate, o_orderkey, o_totalprice AS v,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders),
      ctx AS (
        SELECT g, o_orderdate, o_orderkey, v, rn % 4 AS ph
        FROM ranked WHERE rn <= 12),
      phase AS (
        SELECT g, ph, ROUND(${oAvg("v")}, 4) AS pm FROM ctx GROUP BY g, ph),
      grp AS (
        SELECT g, ROUND(${oAvg("v")}, 4) AS gm,
          MAX(o_orderdate) AS last_ts, COUNT(*) AS n_ctx
        FROM ctx GROUP BY g),
      des AS (
        SELECT c.g, c.o_orderdate, c.o_orderkey, c.v - (p.pm - m.gm) AS d
        FROM ctx c
        JOIN phase p ON c.g = p.g AND c.ph = p.ph
        JOIN grp m ON c.g = m.g),
      per AS (
        SELECT g, list(d ORDER BY o_orderdate, o_orderkey) AS vals
        FROM des GROUP BY g),
      folded AS (
        SELECT g, list_reduce(
          list_concat([[vals[1], CAST(0.0 AS DOUBLE)]],
            list_transform(vals[2:], x -> [x, CAST(0.0 AS DOUBLE)])),
          (acc, x) -> [
            CAST(0.5 AS DOUBLE)*x[1] + CAST(0.5 AS DOUBLE)*(acc[1] + acc[2]),
            CAST(0.3 AS DOUBLE)*(CAST(0.5 AS DOUBLE)*x[1]
              + CAST(0.5 AS DOUBLE)*(acc[1] + acc[2]) - acc[1])
              + CAST(0.7 AS DOUBLE)*acc[2]]) AS lb
        FROM per),
      steps AS (
        SELECT f.g, lb, gm, last_ts, n_ctx, h, (4 - h % 4) % 4 AS ph
        FROM folded f JOIN grp ON f.g = grp.g,
          UNNEST(generate_series(1, 4)) AS t(h))
      SELECT s.g AS o_custkey, CAST(h AS INTEGER) AS h,
        CAST(CAST(s.last_ts AS DATE) + CAST(h*30 AS INTEGER) AS TIMESTAMP) AS forecast_date,
        FLOOR((lb[1] + h * lb[2] + COALESCE(p.pm - s.gm, 0.0)) * 10000 + 0.5) / 10000 AS forecast,
        n_ctx
      FROM steps s LEFT JOIN phase p ON s.g = p.g AND s.ph = p.ph
      ORDER BY o_custkey, h""",

    "m10_ts_trend" -> s"""
      WITH ranked AS (
        SELECT o_custkey, o_orderdate, o_totalprice, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders),
      ctx AS (
        SELECT o_custkey, o_totalprice, o_orderdate,
          CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS x
        FROM ranked WHERE rn <= 6),
      per AS (
        SELECT o_custkey,
          CAST(COUNT(*) AS DOUBLE) AS n,
          SUM(x) AS sx,
          ${oSum("o_totalprice")} AS sy,
          SUM(x*x) AS sxx,
          ${oSum2("x", "o_totalprice")} AS sxy,
          MAX(o_orderdate) AS last_ts,
          MAX(x) AS x_last,
          COUNT(*) AS n_ctx
        FROM ctx GROUP BY o_custkey),
      fit AS (SELECT *,
          CASE WHEN n*sxx - sx*sx = 0 THEN 0.0
            ELSE (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS slope
        FROM per),
      fin AS (SELECT *, (sy - slope*sx)/n AS intercept FROM fit)
      SELECT o_custkey, CAST(h AS INTEGER) AS h,
        CAST(CAST(last_ts AS DATE) + CAST(h*30 AS INTEGER) AS TIMESTAMP) AS forecast_date,
        ROUND(intercept + slope * (x_last + h*30), 4) AS forecast, n_ctx
      FROM fin, UNNEST(generate_series(1, 2)) AS t(h)
      ORDER BY o_custkey, h""",

    "m04_ts_latest" -> s"""
      WITH ranked AS (
        SELECT user_id, ts, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id,
        CAST(MAX(ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS next_ts,
        ROUND(${oAvg("value")}, 4) AS forecast, COUNT(*) AS n_ctx
      FROM ranked WHERE rn <= 10 GROUP BY user_id
      ORDER BY user_id""",

    "m08_model_join_sql" -> s"""
      SELECT l_orderkey, l_linenumber, score,
        CASE WHEN score > 3.0 THEN 'high' ELSE 'low' END AS label
      FROM (SELECT l_orderkey, l_linenumber, $oScore AS score
            FROM lineitem WHERE l_quantity >= 45)
      ORDER BY l_orderkey, l_linenumber, score""",

    "m16_model_join_cte" -> s"""
      SELECT l_orderkey, l_linenumber, score,
        CASE WHEN score > 3.0 THEN 'high' ELSE 'low' END AS label
      FROM (SELECT l_orderkey, l_linenumber, $oScore AS score
            FROM lineitem WHERE l_quantity >= 45)
      ORDER BY l_orderkey, l_linenumber, score""",

    // identical rank + frame windows; the error is exact decimal
    // |4·actual − Σ4|, doubles only at the final per-fold division
    "m33_reliability_diagram" -> s"""
      WITH scored AS (SELECT l_returnflag, $oScore AS score FROM lineitem),
      b AS (SELECT l_returnflag, score, CAST(FLOOR(score) AS INTEGER) AS bin FROM scored)
      SELECT bin, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_score,
        ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS pos_rate
      FROM b GROUP BY bin ORDER BY bin""",

    // same decimal-exact sums → same doubles → same quantile VALUE
    // (ties in the rounded residual all carry the value, so tie order
    // cannot change the selected q_hat)
    "m32_conformal_intervals" -> """
      WITH li AS (SELECT l_orderkey, l_quantity AS x, l_extendedprice AS y FROM lineitem),
      fit0 AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(x AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(x AS DECIMAL(18,4)) * CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sxx
        FROM li WHERE l_orderkey <= 3000),
      fitb AS (SELECT *, (n*sxy - sx*sy) / (n*sxx - sx*sx) AS b FROM fit0),
      fit AS (SELECT b, (sy - b*sx) / n AS a FROM fitb),
      cal AS (SELECT ROUND(ABS(y - (a + b*x)), 4) AS r
        FROM li, fit WHERE l_orderkey > 3000 AND l_orderkey <= 4500),
      ncal AS (SELECT COUNT(*) AS n_cal FROM cal),
      ranked AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn FROM cal),
      -- mirror the engine's empty-calibration branch: zero calibration
      -- rows mean one q row (n_cal=0, q_hat=0.0), not zero rows
      q AS (SELECT (SELECT n_cal FROM ncal) AS n_cal,
        COALESCE((SELECT r FROM ranked, ncal WHERE rn = CEIL(0.9 * n_cal)), 0.0) AS q_hat),
      test AS (SELECT ROUND(ABS(y - (a + b*x)), 4) AS r
        FROM li, fit WHERE l_orderkey > 4500 AND l_orderkey <= 6000)
      SELECT CAST(q.n_cal AS BIGINT) AS n_cal, ROUND(q.q_hat, 4) AS q_hat,
        CAST(COUNT(*) AS BIGINT) AS n_test,
        CAST(SUM(CASE WHEN r <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT) AS covered,
        ROUND(CAST(SUM(CASE WHEN r <= q.q_hat THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS coverage
      FROM test, q GROUP BY q.n_cal, q.q_hat""",

    "m22_ts_backtest" -> """
      WITH ranked AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders),
      wf AS (
        SELECT o_custkey, rn, o_totalprice,
          SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY rn
                  ROWS BETWEEN 1 FOLLOWING AND 4 FOLLOWING) AS s4,
          COUNT(*) OVER (PARTITION BY o_custkey ORDER BY rn
                  ROWS BETWEEN 1 FOLLOWING AND 4 FOLLOWING) AS n4
        FROM ranked)
      SELECT CAST(rn AS BIGINT) AS fold, CAST(COUNT(*) AS BIGINT) AS n_series,
        CAST(SUM(ABS(CAST(o_totalprice AS DECIMAL(18,4)) * 4 - s4)) AS DOUBLE)
          / (COUNT(*) * CAST(4.0 AS DOUBLE)) AS mae
      FROM wf WHERE rn <= 3 AND n4 = 4
      GROUP BY rn ORDER BY fold""",

    // risk chains off the UNROUNDED score (the second predictor sees the
    // first's raw double), so the oracle re-derives it inline; decimal
    // exactness keeps ROUND(...,6) an identity on the DuckDB side
    "m21_model_chain_sql" -> s"""
      SELECT l_orderkey, l_linenumber, $oScore AS score,
        ROUND(-1.0 + 2.0*(0.5 + 0.01*l_quantity + 0.0001*l_extendedprice
          + (-2.0)*l_discount), 6) AS risk
      FROM lineitem WHERE l_quantity >= 45
      ORDER BY l_orderkey, l_linenumber, score""",

    "m09_model_row_sql" -> """
      SELECT CAST(30.0 AS DOUBLE) AS l_quantity,
        CAST(45000.5 AS DOUBLE) AS l_extendedprice,
        CAST(0.05 AS DOUBLE) AS l_discount,
        ROUND(0.5 + 0.01*30.0 + 0.0001*45000.5 + (-2.0)*0.05, 6) AS score""",

    // Same fixed bins, same +0.5 Laplace smoothing, same 6dp-rounded
    // terms; the total sums the rounded terms (associative) on both
    // engines.
    "m12_drift_psi" -> """
      WITH binned AS (
        SELECT LEAST(9, CAST(FLOOR(l_extendedprice / 10000) AS BIGINT)) AS bin,
               l_shipdate < DATE '1995-07-01' AS is_ref
        FROM lineitem),
      counts AS (
        SELECT bin,
          CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
          CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        FROM binned GROUP BY bin),
      tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) t_ref, CAST(SUM(n_cur) AS BIGINT) t_cur
              FROM counts),
      terms AS (
        SELECT bin, n_ref, n_cur,
          (n_ref + 0.5) / (t_ref + 5.0) AS p_ref,
          (n_cur + 0.5) / (t_cur + 5.0) AS p_cur,
          ROUND(((n_cur + 0.5) / (t_cur + 5.0) - (n_ref + 0.5) / (t_ref + 5.0)) *
            LN(((n_cur + 0.5) / (t_cur + 5.0)) / ((n_ref + 0.5) / (t_ref + 5.0))), 6) AS psi_term
        FROM counts CROSS JOIN tot)
      SELECT bin, n_ref, n_cur,
        ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur, psi_term,
        CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS psi_total
      FROM terms ORDER BY bin""",

    "m11_evaluate_metric" -> s"""
      WITH r AS (
        SELECT CAST(l_quantity AS DOUBLE) AS a,
               l_quantity + 2 * l_discount AS p
        FROM lineitem),
      s1 AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               ${oSum("a")} AS sa,
               ${oSum2("a", "a")} AS sa2,
               ${oSum2("a-p", "a-p")} AS ssres
        FROM r),
      c AS (
        SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS a,
               CASE WHEN l_extendedprice > 26000 THEN 1 ELSE 0 END AS p
        FROM lineitem),
      s2 AS (
        SELECT CAST(SUM(CASE WHEN a = 1 AND p = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS tp,
               CAST(SUM(CASE WHEN a = 0 AND p = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS fp,
               CAST(SUM(CASE WHEN a = 1 AND p = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS fn
        FROM c)
      SELECT ROUND(1.0 - ssres / (sa2 - sa * sa / n), 6) AS r2_score,
             ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1_score
      FROM s1, s2""",

    // penalized closed form from explicit sums: the intercept is
    // unpenalized, so b = (Sy - w*Sx)/n with the shrunk w
    "m26_ridge_sql" -> """
      WITH s AS (
        SELECT COUNT(*) AS n,
          SUM(CAST(l_quantity AS DOUBLE)) AS sx,
          SUM(CAST(l_extendedprice AS DOUBLE)) AS sy,
          SUM(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sxx,
          SUM(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS sxy
        FROM lineitem),
      raw AS (
        SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n + 5000000.0) AS wr, sx, sy, n
        FROM s),
      fit AS (
        SELECT ROUND(wr, 6) AS w, ROUND((sy - wr * sx) / n, 6) AS b FROM raw)
      SELECT l_orderkey, l_linenumber,
        ROUND(b + w * l_quantity, 4) AS pred
      FROM lineitem, fit
      WHERE l_quantity >= 48
      ORDER BY l_orderkey, l_linenumber""",

    "m35_model_column_mapping" -> """
      WITH fit AS (
        SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS w,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS b
        FROM lineitem)
      SELECT CAST(q*10 AS DOUBLE) AS qty,
        ROUND(b + w * (q*10), 6) AS pred
      FROM fit, UNNEST(generate_series(1, 3)) AS t(q)
      ORDER BY qty""",

    "m06_retrain_version" -> """
      WITH fit AS (
        SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS w,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS b
        FROM lineitem)
      SELECT CAST(q*10 AS DOUBLE) AS l_quantity,
        ROUND(b + w * (q*10), 6) AS pred,
        2 AS active_version, 2 AS n_versions
      FROM fit, UNNEST(generate_series(1, 3)) AS t(q)
      ORDER BY l_quantity""",

    "m07_finetune_exact" -> """
      WITH fit AS (
        SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS w,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS b
        FROM lineitem)
      SELECT CAST(q*10 + 5 AS DOUBLE) AS l_quantity,
        ROUND(b + w * (q*10 + 5), 6) AS pred,
        2 AS active_version
      FROM fit, UNNEST(generate_series(0, 3)) AS t(q)
      ORDER BY l_quantity""",

    "m05_mapreduce_groups" -> s"""
      WITH spend AS (
        SELECT r_name, c_custkey, ${oSum("o_totalprice")} AS spend
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, c_custkey),
      ranked AS (
        SELECT r_name, c_custkey, spend,
          ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY spend DESC, c_custkey) AS rnk
        FROM spend)
      SELECT r_name, CAST(rnk AS INTEGER) AS rnk, c_custkey, ROUND(spend, 4) AS spend
      FROM ranked WHERE rnk <= 2 ORDER BY r_name, rnk"""
  )
}

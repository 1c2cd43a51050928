package graft

import graft.engine.Tables
import graft.ml.{LinearModel, Predict, PredictionCache, TimeSeries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-apply semantics not covered by the oracle gate: prediction
  * cache behavior, empty-schema steps, row-id join integrity. */
class MlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("ml-spec")
  val dir = "/root/testdata/sf0.001"

  val model: LinearModel = LinearModel("spec_model",
    Seq("l_quantity", "l_extendedprice", "l_discount"), Seq(0.01, 0.0001, -2.0), 0.5)

  test("applyModel preserves every input row exactly once (row-id join integrity)") {
    val data = Tables.table(spark, dir, "lineitem").filter(col("l_quantity") >= 40)
    val out = Predict.applyModel(data, model)
    assert(out.count() === data.count())
    assert(out.columns.contains("score"))
    assert(!out.columns.contains(Predict.RowIdCol))
    // same (orderkey, linenumber) multiset in and out (the synthetic data
    // has duplicate pairs — compare counts, don't assume uniqueness)
    val inCounts = data.groupBy(col("l_orderkey"), col("l_linenumber")).count()
      .withColumnRenamed("count", "n_in")
    val outCounts = out.groupBy(col("l_orderkey"), col("l_linenumber")).count()
      .withColumnRenamed("count", "n_out")
    assert(inCounts.join(outCounts, Seq("l_orderkey", "l_linenumber"), "full_outer")
      .filter(col("n_in").isNull || col("n_out").isNull || col("n_in") =!= col("n_out"))
      .count() === 0)
  }

  test("prediction cache: second apply on identical input is a hit with equal results") {
    val tmp = java.nio.file.Files.createTempDirectory("predcache").toString
    val cache = new PredictionCache(tmp)
    val data = Tables.table(spark, dir, "lineitem").filter(col("l_quantity") >= 48)
    val first = Predict.applyModel(data, model, Some(cache)).orderBy("l_orderkey", "l_linenumber").collect()
    assert(cache.misses === 1 && cache.hits === 0)
    val second = Predict.applyModel(data, model, Some(cache)).orderBy("l_orderkey", "l_linenumber").collect()
    assert(cache.hits === 1)
    assert(first.map(_.getDouble(first.head.fieldIndex("score"))).toSeq
      === second.map(_.getDouble(second.head.fieldIndex("score"))).toSeq)
    // different input → miss
    Predict.applyModel(data.limit(10), model, Some(cache))
    assert(cache.misses === 2)
  }

  test("prediction cache is bounded: writing past max_size evicts oldest-first (reference FileCache)") {
    val tmp = java.nio.file.Files.createTempDirectory("predcache_lru").toString
    val cache = new PredictionCache(tmp, maxSize = 2)
    val data = Tables.table(spark, dir, "lineitem")
    val inputs = Seq(
      data.filter(col("l_quantity") === 48),
      data.filter(col("l_quantity") === 49),
      data.filter(col("l_quantity") === 50))
    inputs.foreach { in =>
      Predict.applyModel(in, model, Some(cache)).count()
      Thread.sleep(1100) // mtime granularity: make write order unambiguous
    }
    assert(cache.size === 2, s"cache holds ${cache.size} entries, expected max_size=2")
    // the FIRST entry was evicted: re-applying it misses again
    val missesBefore = cache.misses
    Predict.applyModel(inputs.head, model, Some(cache)).count()
    assert(cache.misses === missesBefore + 1, "evicted entry must miss")
    // the NEWEST entry survived: re-applying it hits
    val hitsBefore = cache.hits
    Predict.applyModel(inputs.last, model, Some(cache)).count()
    assert(cache.hits === hitsBefore + 1, "newest entry must still hit")
  }

  test("prediction cache hit stays correct when the input is repartitioned between put and get") {
    val tmp = java.nio.file.Files.createTempDirectory("predcache_rp").toString
    val cache = new PredictionCache(tmp)
    val data = Tables.table(spark, dir, "lineitem").filter(col("l_quantity") >= 48)
    val direct = Predict.applyModel(data, model).orderBy("l_orderkey", "l_linenumber", "score")
      .select("l_orderkey", "l_linenumber", "score").collect().toSeq
    Predict.applyModel(data, model, Some(cache)).count() // put
    // same content, different physical layout: row ids would regenerate
    // in a different assignment — the content-keyed join must not care
    val reshuffled = data.repartition(7, col("l_partkey")).sortWithinPartitions("l_discount")
    val viaCache = Predict.applyModel(reshuffled, model, Some(cache))
      .orderBy("l_orderkey", "l_linenumber", "score")
      .select("l_orderkey", "l_linenumber", "score").collect().toSeq
    assert(cache.hits === 1)
    assert(viaCache === direct)
  }

  test("cache hit keeps rows with NULL features (null-safe rejoin)") {
    val tmp = java.nio.file.Files.createTempDirectory("predcache_null").toString
    val cache = new PredictionCache(tmp)
    val data = Tables.table(spark, dir, "lineitem").filter(col("l_quantity") >= 48)
      .withColumn("l_discount",
        when(col("l_linenumber") === 1, lit(null)).otherwise(col("l_discount")))
    val n = data.count()
    assert(data.filter(col("l_discount").isNull).count() > 0)
    val miss = Predict.applyModel(data, model, Some(cache)).count()
    val hit = Predict.applyModel(data, model, Some(cache)).count()
    assert(cache.hits === 1)
    // identical row counts on miss and hit — NULL feature tuples must not
    // be silently dropped by the cache rejoin (three-valued === would)
    assert(miss === n && hit === n)
  }

  test("GetPredictorColumns / GetTableColumns: empty frames with correct schema") {
    val pc = Predict.predictorColumns(spark, model)
    assert(pc.count() === 0 && pc.schema.fieldNames.toSeq === Seq("score"))
    val tc = Predict.tableColumns(Tables.table(spark, dir, "region"))
    assert(tc.count() === 0 && tc.schema.fieldNames.toSeq === Seq("r_regionkey", "r_name"))
  }

  test("Fit.fit recovers exact OLS coefficients (k=1 and k=2, hand-computed)") {
    import graft.ml.Fit
    val sp = spark
    import sp.implicits._
    // y = 2x + 1 exactly
    val d1 = Seq((0.0, 1.0), (1.0, 3.0), (2.0, 5.0)).toDF("x", "y")
    val (m1, st1) = Fit.fit("f1", d1, Fit.FitSpec(Seq("x"), "y"))
    assert(m1.weights === Seq(2.0) && m1.bias === 1.0)
    assert(st1.n === 3)
    // y = 1 + 2a + 3b exactly
    val pts = Seq((0.0, 0.0, 1.0), (1.0, 0.0, 3.0), (0.0, 1.0, 4.0),
      (1.0, 1.0, 6.0), (2.0, 1.0, 8.0))
    val (m2, _) = Fit.fit("f2", pts.toDF("a", "b", "y"), Fit.FitSpec(Seq("a", "b"), "y"))
    assert(m2.weights === Seq(2.0, 3.0) && m2.bias === 1.0)
    // collinear features → singular normal equations, explicit failure
    val bad = Seq((1.0, 2.0, 1.0), (2.0, 4.0, 2.0), (3.0, 6.0, 3.0)).toDF("a", "b", "y")
    intercept[IllegalArgumentException] {
      Fit.fit("f3", bad, Fit.FitSpec(Seq("a", "b"), "y"))
    }
  }

  test("Fit.fitRidge shrinks toward zero, matches the closed form, and λ=0 is OLS") {
    import graft.ml.Fit
    val sp = spark
    import sp.implicits._
    // symmetric design: x in {-1, 0, 1}, y = 2x → Sx = 0, so the
    // penalized closed form is exactly w = Sxy/(Sxx + λ), b = 0
    val d = Seq((-1.0, -2.0), (0.0, 0.0), (1.0, 2.0)).toDF("x", "y")
    val spec = Fit.FitSpec(Seq("x"), "y")
    val (m0, _) = Fit.fitRidge("r0", d, spec, 0.0)
    assert(m0.weights === Seq(2.0) && m0.bias === 0.0, "λ=0 must equal OLS")
    val (m2, _) = Fit.fitRidge("r2", d, spec, 2.0)
    // Sxy = 4, Sxx = 2 → w = 4/(2+2) = 1.0
    assert(m2.weights === Seq(1.0) && m2.bias === 0.0)
    val (m6, _) = Fit.fitRidge("r6", d, spec, 6.0)
    assert(m6.weights === Seq(0.5) && m6.bias === 0.0)
    // monotone shrinkage
    assert(m0.weights.head > m2.weights.head && m2.weights.head > m6.weights.head)
  }

  test("Fit.finetune(old, new) equals fit(old union new) exactly") {
    import graft.ml.Fit
    val sp = spark
    import sp.implicits._
    val all = Seq((0.0, 0.0, 1.0), (1.0, 0.0, 3.0), (0.0, 1.0, 4.0),
      (1.0, 1.0, 6.0), (2.0, 1.0, 8.5), (3.0, 2.0, 13.25))
    val (first, rest) = all.splitAt(3)
    val spec = Fit.FitSpec(Seq("a", "b"), "y")
    val (_, st) = Fit.fit("base", first.toDF("a", "b", "y"), spec)
    val (inc, incSt) = Fit.finetune("base", st, rest.toDF("a", "b", "y"), spec)
    val (direct, directSt) = Fit.fit("direct", all.toDF("a", "b", "y"), spec)
    assert(inc.weights === direct.weights && inc.bias === direct.bias)
    assert(incSt.n === directSt.n)
  }

  test("NaiveBayes recovers the generating class on a separable corpus") {
    import spark.implicits._
    // two classes with disjoint-ish vocabularies; prediction must recover
    // the class whose words dominate each doc
    val train = Seq(
      (1L, "apple banana apple fruit", "food"),
      (2L, "banana fruit apple apple", "food"),
      (3L, "gear motor piston engine", "tech"),
      (4L, "motor gear engine gear", "tech")).toDF("id", "text", "label")
    val (priors, ll) = graft.ml.NaiveBayes.train(train, "text", "label")
    val score = Seq(
      (10L, "apple banana"), (11L, "gear engine piston"),
      (12L, "fruit fruit motor")).toDF("id", "text")
    val pred = graft.ml.NaiveBayes.predict(score, "text", "id", priors, ll)
      .select("id", "pred_label").as[(Long, String)].collect().toMap
    assert(pred(10L) === "food")
    assert(pred(11L) === "tech")
    assert(pred(12L) === "food") // 2 food tokens vs 1 tech token
  }

  test("NaiveBayes priors shift prediction when likelihoods tie") {
    import spark.implicits._
    // identical token distributions per class; class weight 3:1 → the
    // prior term must decide, and ties in score break on label ascending
    val train = Seq(
      (1L, "x", "a"), (2L, "x", "a"), (3L, "x", "a"), (4L, "x", "b"))
      .toDF("id", "text", "label")
    val (priors, ll) = graft.ml.NaiveBayes.train(train, "text", "label")
    val pred = graft.ml.NaiveBayes.predict(
      Seq((9L, "x")).toDF("id", "text"), "text", "id", priors, ll)
      .select("pred_label").as[String].head()
    assert(pred === "a")
  }

  test("kmeans recovers planted well-separated clusters") {
    import spark.implicits._
    // three tight clusters around far-apart centers; after two Lloyd
    // rounds every planted cluster must be pure (one cell per cluster)
    val pts = (0 until 30).map { i =>
      val cluster = i % 3
      val base = Array.fill(8)(cluster * 10.0f)
      base(i % 8) += 0.01f * (i / 3) // small deterministic jitter
      (i.toLong, base.toSeq, cluster)
    }
    val df = pts.map { case (id, v, c) => (id, v, c) }.toDF("vec_id", "embedding", "planted")
    val (assigned, cents) = graft.ml.KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 2)
    val purity = assigned.join(df.select(col("vec_id"), col("planted")), "vec_id")
      .groupBy("planted").agg(countDistinct("cell").as("cells"))
    assert(purity.filter(col("cells") =!= 1).count() === 0, "planted cluster split across cells")
    // and the three cells are distinct
    assert(assigned.select("cell").distinct().count() === 3)
    assert(cents.count() === 3)
  }

  test("lookback context takes exactly min(window, group size) latest rows per group") {
    val ev = Tables.table(spark, dir, "events")
    val ctx = TimeSeries.lookbackContext(ev, col("user_id"), col("ts"), col("event_id"), 10)
    val sizes = ctx.groupBy("user_id").count()
    assert(sizes.filter(col("count") > 10).count() === 0)
    // context max ts == group max ts (it is the latest rows)
    val got = ctx.groupBy("user_id").agg(max("ts").as("ctx_max"))
    val want = ev.groupBy("user_id").agg(max("ts").as("all_max"))
    assert(got.join(want, "user_id").filter(col("ctx_max") =!= col("all_max")).count() === 0)
  }

  test("latest forecast is strictly beyond each group's max seen ts") {
    val ev = Tables.table(spark, dir, "events")
    val fc = TimeSeries.latest(ev, col("user_id"), col("ts"), col("value"), col("event_id"),
      10, "INTERVAL 1 HOUR")
    val mx = ev.groupBy(col("user_id").as("group_key")).agg(max("ts").as("mx"))
    assert(fc.join(mx, "group_key").filter(col("next_ts") <= col("mx")).count() === 0)
  }

  test("anomaly engine: hand-computed z-scores, grouped stats, zero-variance guard") {
    import spark.implicits._
    // group a: values 1,1,1,9 → μ=3, σ=sqrt((4+4+4+36)/4)=sqrt(12)
    // group b: constant 5 → σ guards to 1, all scores 0
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 9.0),
      ("b", 5.0), ("b", 5.0)).toDF("g", "x")
    val m = graft.ml.Anomaly.trained("anom", df, "x", Some("g"), threshold = 1.5)
    val out = graft.ml.Predict.applyModel(df, m).orderBy("g", "x").collect()
    val sig = math.sqrt(12.0)
    def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    assert(out.take(3).forall(_.getAs[Double]("score") === r4((1.0 - 3.0) / sig)))
    assert(out(3).getAs[Double]("score") === r4((9.0 - 3.0) / sig))
    // |−0.5774| < 1.5 not anomalous; 1.7321 > 1.5 anomalous
    assert(out.take(3).forall(!_.getAs[Boolean]("is_anomaly")))
    assert(out(3).getAs[Boolean]("is_anomaly"))
    assert(out.drop(4).forall(r =>
      r.getAs[Double]("score") === 0.0 && !r.getAs[Boolean]("is_anomaly")))
  }

  test("seasonal forecast: per-phase means and residual bounds, hand-computed") {
    import spark.implicits._
    // one group, a strict period-2 alternation 10,20,10,20: phase means
    // are exact, in-sample residuals are all zero
    val alt = Seq.tabulate(4)(i =>
        (1L, java.sql.Date.valueOf(s"2024-01-0${i + 1}"), if (i % 2 == 0) 10.0 else 20.0, i.toLong))
      .toDF("g", "d", "v", "k")
    val fc = TimeSeries.forecastSeasonal(alt, col("g"), col("d"), col("v"), col("k"),
      window = 4, horizon = 2, stepDays = 1, period = 2)
      .orderBy("h").collect()
    // last value is day4=20.0 (phase rn=1); h=1 forecasts phase (2-1)%2=1
    // = rows rn∈{1,3} = days {4,2} = 20.0; h=2 forecasts phase 0 =
    // rows rn∈{2,4} = days {3,1} = 10.0
    assert(fc.map(r => (r.getAs[Int]("h"), r.getAs[Double]("forecast"))).toSeq
      === Seq((1, 20.0), (2, 10.0)))
    // zero residuals → bounds collapse onto the forecast
    assert(fc.forall(r => r.getAs[Double]("lower") === r.getAs[Double]("forecast")
      && r.getAs[Double]("upper") === r.getAs[Double]("forecast")))

    // constant series with one outlier: sigma = sqrt(mean residual²)
    // computed by hand. window=4 covers values 10,10,10,22 (phase means:
    // ph1 {rn1,rn3}, ph0 {rn2,rn4}); period=2
    val out = Seq(
        (2L, java.sql.Date.valueOf("2024-01-01"), 22.0, 0L),
        (2L, java.sql.Date.valueOf("2024-01-02"), 10.0, 1L),
        (2L, java.sql.Date.valueOf("2024-01-03"), 10.0, 2L),
        (2L, java.sql.Date.valueOf("2024-01-04"), 10.0, 3L))
      .toDF("g", "d", "v", "k")
    val f2 = TimeSeries.forecastSeasonal(out, col("g"), col("d"), col("v"), col("k"),
      window = 4, horizon = 1, stepDays = 1, period = 2).collect().head
    // phases (backward offsets): rn1=day4 v10 ph1, rn2=day3 v10 ph0,
    // rn3=day2 v10 ph1, rn4=day1 v22 ph0 → pm(ph1)=10, pm(ph0)=16;
    // residuals: 0, -6, 0, 6 → sigma = sqrt(72/4) = 4.2426
    assert(f2.getAs[Double]("forecast") === 10.0) // h=1 → phase 1
    assert(math.abs(f2.getAs[Double]("lower") - (10.0 - 1.96 * 4.2426)) < 5e-5)
    assert(math.abs(f2.getAs[Double]("upper") - (10.0 + 1.96 * 4.2426)) < 5e-5)
  }

  test("holt-winters: pure seasonal alternation forecast repeats the season; constant series stays flat") {
    import spark.implicits._
    // strict period-2 alternation: deseasonalized series is constant, so
    // the Holt fold yields (level=mean, trend=0) and the forecast is the
    // seasonal index added back — the alternation continues exactly
    val alt = Seq.tabulate(4)(i =>
        (1L, java.sql.Date.valueOf(s"2024-01-0${i + 1}"), if (i % 2 == 0) 10.0 else 20.0, i.toLong))
      .toDF("g", "d", "v", "k")
    val fc = TimeSeries.forecastHoltWinters(alt, col("g"), col("d"), col("v"), col("k"),
      window = 4, horizon = 2, stepDays = 1, period = 2, alpha = 0.5, beta = 0.3)
      .orderBy("h").collect()
    assert(fc.map(r => (r.getAs[Int]("h"), r.getAs[Double]("forecast"))).toSeq
      === Seq((1, 20.0), (2, 10.0)))
    // constant series: all phase indices zero, level locks to the
    // constant, trend stays zero → flat forecast at every horizon
    val const = Seq.tabulate(6)(i =>
        (2L, java.sql.Date.valueOf(s"2024-01-0${i + 1}"), 7.5, i.toLong))
      .toDF("g", "d", "v", "k")
    val f2 = TimeSeries.forecastHoltWinters(const, col("g"), col("d"), col("v"), col("k"),
      window = 6, horizon = 3, stepDays = 1, period = 3, alpha = 0.4, beta = 0.2)
      .collect()
    assert(f2.length === 3 && f2.forall(_.getAs[Double]("forecast") === 7.5))
  }
}

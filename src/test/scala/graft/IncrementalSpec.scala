package graft

import java.time.Instant
import graft.engine.Tables
import graft.incremental.{Jobs, Triggers, Watermarks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental machinery: LAST watermark advance across runs, job
  * scheduling, trigger delivery. */
class IncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("incremental-spec")
  val dir = "/root/testdata/sf0.001"

  test("LAST watermark: init empty, advance across successive runs, survive reload") {
    val stateDir = java.nio.file.Files.createTempDirectory("wm").toString
    val store = new Watermarks(stateDir)
    val ev = Tables.table(spark, dir, "events")
    val day1 = ev.filter(col("ts") < to_timestamp(lit("2024-01-11 00:00:00")))
    val day2 = ev.filter(col("ts") < to_timestamp(lit("2024-01-21 00:00:00")))

    // run 1: first sight → watermark = max(day1), empty increment
    assert(store.applyLast(day1, "ts", "q").count() === 0)
    val wm1 = store.get("q").get

    // run 2: sees day2 → increment = rows in (max(day1), max(day2)]
    val inc2 = store.applyLast(day2, "ts", "q")
    val expected2 = day2.filter(unix_micros(col("ts")) > wm1).count()
    assert(inc2.count() === expected2 && expected2 > 0)
    store.advance(inc2, "ts", "q")
    val wm2 = store.get("q").get
    assert(wm2 > wm1)

    // state survives process restart (fresh store over the same dir)
    val reloaded = new Watermarks(stateDir)
    assert(reloaded.get("q").contains(wm2))

    // run 3: everything new past wm2
    val inc3 = reloaded.applyLast(ev, "ts", "q")
    assert(inc3.count() === ev.filter(unix_micros(col("ts")) > wm2).count())
    // no overlap with run 2's rows
    assert(inc3.filter(unix_micros(col("ts")) <= wm2).count() === 0)
  }

  test("materialized view: incremental refresh equals full recompute; LAST semantics") {
    val wh = graft.catalog.Warehouse.temp(spark)
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), wh)
    c.execute("""CREATE TABLE mvsrc AS
      SELECT * FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'""")
    c.execute("""CREATE MATERIALIZED VIEW mv_t TRACK ts AS (
      SELECT event_type, count(*) AS n, avg(value) AS avg_v, min(value) AS min_v
      FROM mvsrc WHERE value >= 0 GROUP BY event_type)""")

    def full() = c.execute("""SELECT event_type, count(*) AS n,
        avg(value) AS avg_v, min(value) AS min_v
      FROM mvsrc WHERE value >= 0 GROUP BY event_type
      ORDER BY event_type""").collect().toSeq
    def mv() = c.execute(
      "SELECT * FROM mv_t ORDER BY event_type").collect().toSeq

    // initial refresh (at CREATE) matches the full aggregate incl. the
    // avg finalization (sum/count) and the body's WHERE
    assert(mv() === full())

    // refresh with no new rows is a no-op (watermark unchanged, same rows)
    val before = mv()
    c.execute("REFRESH MATERIALIZED VIEW mv_t")
    assert(mv() === before)

    // delta refresh folds in only rows past the watermark
    c.execute("""INSERT INTO mvsrc
      SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'""")
    c.execute("REFRESH MATERIALIZED VIEW mv_t")
    assert(mv() === full())

    // LAST contract: a row arriving AT OR BELOW the high-water mark is
    // not picked up (same as the reference's LAST keyword)
    c.execute("""INSERT INTO mvsrc VALUES (999999, TIMESTAMP '2024-01-02 00:00:00',
      1, 'click', 5.0, '{}')""")
    val stale = mv()
    c.execute("REFRESH MATERIALIZED VIEW mv_t")
    assert(mv() === stale)

    // SHOW / DROP lifecycle
    assert(c.execute("SHOW MATERIALIZED VIEWS").collect().map(_.getString(0)).toSeq
      === Seq("mv_t"))
    c.execute("DROP MATERIALIZED VIEW mv_t")
    intercept[Exception] { c.execute("REFRESH MATERIALIZED VIEW mv_t") }
    c.execute("DROP MATERIALIZED VIEW IF EXISTS mv_t") // no-op with the clause
  }

  test("job schedule parsing and calendar months") {
    assert(Jobs.nextDate("every 2 hours", Instant.parse("2026-01-01T00:00:00Z"))
      === Instant.parse("2026-01-01T02:00:00Z"))
    assert(Jobs.nextDate("every day", Instant.parse("2026-01-01T00:00:00Z"))
      === Instant.parse("2026-01-02T00:00:00Z"))
    assert(Jobs.nextDate("every 1 month", Instant.parse("2026-01-31T00:00:00Z"))
      === Instant.parse("2026-02-28T00:00:00Z")) // calendar clamp
    intercept[IllegalArgumentException] { Jobs.parseSchedule("every 5 fortnights") }
    intercept[IllegalArgumentException] { Jobs.parseSchedule("at noon") }
  }

  test("jobs run when due, honor IF gates, and advance next_run") {
    val jobs = new Jobs
    var ran = 0
    var gate = false
    jobs.create(Jobs.Job("inc", "every 1 hour", () => ran += 1))
    jobs.create(Jobs.Job("gated", "every 1 hour", () => ran += 100, ifCondition = () => gate))

    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    jobs.tick(t0)
    assert(ran === 1) // gated skipped
    jobs.tick(t0.plusSeconds(60)) // not due yet
    assert(ran === 1)
    gate = true
    jobs.tick(t0.plusSeconds(3601))
    assert(ran === 102)
    assert(jobs.history.count(_.ok) === 4)
    assert(jobs.history.count(_.error.contains("skipped-if")) === 1)
  }

  test("scheduler daemon ticks EVERY tenant's jobs store, including ones created after start") {
    // the reference scheduler checks all companies' jobs each pass — a
    // job created under a company-id must execute, not merely list
    val tenants = new graft.catalog.Tenants(spark, dir,
      graft.catalog.Tenants.State(
        new graft.catalog.Catalog(spark, dir),
        graft.catalog.Warehouse.temp(spark), new graft.incremental.Jobs))
    val clock = new java.util.concurrent.atomic.AtomicReference(
      Instant.parse("2026-02-01T00:00:00Z"))
    val daemon = new graft.incremental.JobsDaemon(
      () => tenants.allStates().map(_.jobs), () => clock.get(),
      periodMillis = 3600000L)
    daemon.start()
    try {
      var ranDefault = 0
      var ranTenant = 0
      tenants.default.jobs.create(graft.incremental.Jobs.Job(
        "defjob", "EVERY 1 day", () => ranDefault += 1))
      daemon.kick()
      assert(ranDefault === 1)
      // the tenant store materializes AFTER the daemon started — the
      // stores() thunk must see it on the next tick
      val t = tenants.of("acme")
      t.jobs.create(graft.incremental.Jobs.Job(
        "acmejob", "EVERY 1 day", () => ranTenant += 1))
      clock.set(Instant.parse("2026-02-03T00:00:00Z"))
      daemon.kick()
      assert(ranTenant === 1)
      assert(t.jobs.historyOf("acmejob").nonEmpty)
      // isolation: the default store never saw the tenant job
      assert(tenants.default.jobs.get("acmejob").isEmpty)
    } finally daemon.stop()
  }

  test("scheduler daemon: injected clock, a LAST job runs twice with advancing state, no sleeps") {
    // the reference runs a ~30 s polling daemon (interfaces/jobs/
    // scheduler.py); here the clock is injected and kick() forces a tick
    // ON the daemon thread and waits — deterministic, zero Thread.sleep
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), graft.catalog.Warehouse.temp(spark))
    c.execute("""CREATE TABLE dlast AS
      SELECT * FROM (VALUES (1, TIMESTAMP '2024-01-01 00:00:00')) AS t(id, ts)""")
    val body = "SELECT id FROM dlast WHERE ts > LAST"
    c.execute(s"CREATE JOB djob AS ($body) EVERY 1 day")
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    val clock = new java.util.concurrent.atomic.AtomicReference(t0)
    val daemon = new graft.incremental.JobsDaemon(c.jobs, () => clock.get(),
      periodMillis = 3600000L) // period far beyond the test: only kick() ticks
    daemon.start()
    try {
      daemon.kick() // tick 1: due (fresh job), LAST initializes at row 1
      assert(c.jobs.history.size === 1 && c.jobs.history.head.ok)
      val next1 = c.jobs.get("djob").get.nextRun
      assert(next1 === t0.plus(java.time.Duration.ofDays(1)))
      c.execute("INSERT INTO dlast SELECT 2, TIMESTAMP '2024-01-02 00:00:00'")
      daemon.kick() // clock unchanged → not due, no run
      assert(c.jobs.history.size === 1)
      clock.set(t0.plus(java.time.Duration.ofDays(1)))
      daemon.kick() // tick 2: due again, ingests row 2, advances the watermark
      assert(c.jobs.history.size === 2 && c.jobs.history.forall(_.ok))
      assert(c.jobs.get("djob").get.nextRun.isAfter(next1))
      // the SAME query text now sees nothing: the job's second run
      // advanced the LAST watermark past row 2
      assert(c.execute(body).count() === 0)
      // meta surface carries the schedule state
      val meta = c.execute(
        "SELECT name, next_run_at, last_run_at FROM mindsdb.jobs").first()
      assert(meta.getString(0) === "djob" && !meta.isNullAt(1) && !meta.isNullAt(2))
    } finally daemon.stop()
  }

  test("no deadlock: ticking job SQL concurrent with mindsdb.jobs meta reads") {
    // the AB-BA hazard: a ticking job's SQL body takes
    // Commands.analysisLock while a meta-table query holds analysisLock
    // and reads the synchronized Jobs state — tick must NOT hold the
    // Jobs monitor across task execution (Jobs.tickLock doc)
    val cat = new graft.catalog.Catalog(spark, dir)
    val wh = graft.catalog.Warehouse.temp(spark)
    val c1 = new graft.sqlx.Commands(spark, cat, wh)
    c1.execute("CREATE TABLE ddlk_t AS SELECT id FROM range(0, 3)")
    c1.execute("CREATE JOB ddlk_job AS (SELECT COUNT(*) AS n FROM ddlk_t) EVERY 1 day")
    val c2 = new graft.sqlx.Commands(spark, cat, wh, c1.jobs) // same Jobs store
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val base = Instant.parse("2026-02-01T00:00:00Z")
    val ticker = new Thread(() => {
      try (1 to 5).foreach(i =>
        c1.jobs.tick(base.plusSeconds(i.toLong * 90000)))
      catch { case e: Throwable => errors.add(s"tick: $e") }
    })
    val reader = new Thread(() => {
      try (1 to 10).foreach { _ =>
        c2.execute("SELECT COUNT(*) AS n FROM mindsdb.jobs").collect()
        c2.execute("SELECT name FROM log.jobs_history").collect()
      } catch { case e: Throwable => errors.add(s"read: $e") }
    })
    ticker.start(); reader.start()
    ticker.join(60000); reader.join(60000)
    assert(!ticker.isAlive && !reader.isAlive,
      "deadlock: tick and meta-read did not finish inside 60s")
    assert(errors.isEmpty, errors.toArray.mkString("; "))
    assert(c1.jobs.historyOf("ddlk_job").size === 5)
    assert(c1.jobs.historyOf("ddlk_job").forall(_.ok))
    c1.execute("DROP JOB ddlk_job")
    c1.execute("DROP TABLE ddlk_t")
  }

  test("job that throws records a failed run and keeps scheduling") {
    val jobs = new Jobs
    jobs.create(Jobs.Job("bad", "every 1 min", () => throw new RuntimeException("boom")))
    val t0 = Instant.now()
    jobs.tick(t0)
    assert(jobs.history.last.ok === false && jobs.history.last.error.contains("boom"))
    assert(jobs.list().head.nextRun.isAfter(t0))
  }

  test("trigger fires per delta batch and is exactly-once across restarts") {
    val tableDir = java.nio.file.Files.createTempDirectory("trig_tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("trig_ckpt").toString
    val ev = Tables.table(spark, dir, "events").limit(100).cache()
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    val slim = ev.select(col("event_id"))
    slim.limit(40).write.mode("append").parquet(tableDir)

    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    Triggers.drain(Triggers.onTableChanges(spark, tableDir, schema, ckpt,
      (delta, _) => seen.addAndGet(delta.count())))
    assert(seen.get() === 40)

    // new rows land; restart with the same checkpoint → only the delta fires
    slim.limit(100).write.mode("append").parquet(tableDir)
    Triggers.drain(Triggers.onTableChanges(spark, tableDir, schema, ckpt,
      (delta, _) => seen.addAndGet(delta.count())))
    assert(seen.get() === 140)
  }

  test("streaming CDC apply: delta batches MERGE into the warehouse, exactly-once") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val srcDir = java.nio.file.Files.createTempDirectory("cdc_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    val wh = graft.catalog.Warehouse.temp(spark)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    def frame(rows: Seq[(Long, Long)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 1), schema)
    wh.createTableAs("cdc_tgt", frame((1L to 5L).map(i => (i, 0L))), overwrite = true)

    def applyCdc(): Unit = Triggers.drain(Triggers.onTableChanges(
      spark, srcDir, schema, ckpt,
      (delta: org.apache.spark.sql.DataFrame, _: Long) =>
        wh.merge("cdc_tgt", "t", delta, "s", "t.id = s.id", Seq("v" -> "s.v"))))

    // batch 1: upsert ids 3..7 — 3 updates + 2 inserts
    frame((3L to 7L).map(i => (i, i * 10))).write.mode("append").parquet(srcDir)
    applyCdc()
    val after1 = wh.table("cdc_tgt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after1 === Map(1L -> 0L, 2L -> 0L, 3L -> 30L, 4L -> 40L, 5L -> 50L,
      6L -> 60L, 7L -> 70L))

    // batch 2 after "restart" (same checkpoint): ONLY the new file applies
    frame(Seq((7L, 700L), (8L, 800L))).write.mode("append").parquet(srcDir)
    applyCdc()
    val after2 = wh.table("cdc_tgt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after2(7L) === 700L && after2(8L) === 800L && after2.size === 8)
    // untouched keys kept their values — the merge never re-read old deltas
    assert(after2(3L) === 30L && after2(1L) === 0L)
  }

  test("polling trigger on an external DSv2 table: key-diff batches, state survives restart") {
    import graft.federation.{MemCatalog, MemTables}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    if (!spark.conf.getOption("spark.sql.catalog.mem")
        .contains(classOf[MemCatalog].getName))
      spark.conf.set("spark.sql.catalog.mem", classOf[MemCatalog].getName)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    def rows(n: Int) = (1 to n).map(i => Row(i.toLong, i.toLong * 10))
    MemTables.register("poll_src", schema, rows(3))
    val stateDir = java.nio.file.Files.createTempDirectory("poll_state").toString

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def poll(): Long = Triggers.pollExternal(spark,
      () => spark.table("mem.poll_src"), "id", stateDir,
      (delta, batch) => got ++= delta.collect().map(r => (batch, r.getLong(0))))

    assert(poll() === 3 && got.map(_._2).sorted === Seq(1L, 2L, 3L))
    // nothing new → handler not invoked, batch id not consumed
    assert(poll() === 0 && got.size === 3)
    // source grows; only the NEW keys deliver, in the next batch
    MemTables.register("poll_src", schema, rows(5))
    assert(poll() === 2)
    assert(got.collect { case (b, id) if b == 1L => id }.sorted === Seq(4L, 5L))
    // state survives "restart" (same state dir, fresh call chain)
    MemTables.register("poll_src", schema, rows(6))
    assert(poll() === 1 && got.map(_._2).sorted === (1L to 6L))
  }

  test("external polling trigger through CREATE TRIGGER / fireTrigger accumulates deltas") {
    import graft.federation.{MemCatalog, MemTables}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    if (!spark.conf.getOption("spark.sql.catalog.mem")
        .contains(classOf[MemCatalog].getName))
      spark.conf.set("spark.sql.catalog.mem", classOf[MemCatalog].getName)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", LongType)))
    MemTables.register("ext_orders", schema, (1 to 4).map(i => Row(i.toLong, i.toLong)))
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), graft.catalog.Warehouse.temp(spark))
    c.execute("CREATE TABLE poll_acc (id BIGINT, amount BIGINT)")
    c.execute("CREATE TRIGGER pt ON mem.ext_orders " +
      "(INSERT INTO poll_acc SELECT id, amount FROM TABLE_DELTA)")
    c.fireTrigger("pt")
    assert(c.execute("SELECT count(*) AS n FROM poll_acc").first().getLong(0) === 4)
    c.fireTrigger("pt") // no new keys → no duplicate delivery
    assert(c.execute("SELECT count(*) AS n FROM poll_acc").first().getLong(0) === 4)
    MemTables.register("ext_orders", schema, (1 to 6).map(i => Row(i.toLong, i.toLong)))
    c.fireTrigger("pt")
    assert(c.execute("SELECT sum(amount) AS s FROM poll_acc").first().getLong(0) === 21)
  }
}

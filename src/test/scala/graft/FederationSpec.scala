package graft

import graft.engine.Tables
import graft.federation._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape tests for the federation layer: predicates/prunes/limits
  * must actually reach the DSv2 source (the reference's planner golden
  * tests assert the same on rendered FetchDataframeStep queries). */
class FederationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = graft.engine.Session.build("federation-spec")
    s.conf.set("spark.sql.catalog.mem", classOf[MemCatalog].getName)
    s
  }
  val dir = "/root/testdata/sf0.001"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  private val rows = (1L to 100L).map(i => Row(i, s"name$i", i * 0.5))

  test("filter pushdown reaches the mem source and results are correct") {
    MemTables.register("people", schema, rows)
    val df = spark.table("mem.people").filter(col("id") > 90 && col("score") <= 49.0)
    val out = df.collect()
    assert(out.map(_.getLong(0)).sorted.toSeq === (91L to 98L))
    val pushed = MemTables.pushed("people")
    assert(pushed.nonEmpty, "no filters reached the source")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || pushed.size >= 2)
  }

  test("column pruning reaches the source (ReadSchema excludes unused columns)") {
    MemTables.register("people", schema, rows)
    val df = spark.table("mem.people").select("name")
    val scanSchema = df.queryExecution.executedPlan.collectLeaves().head
      .toString
    assert(scanSchema.contains("name") && !scanSchema.contains("score"),
      s"scan not pruned: $scanSchema")
    assert(df.count() === 100)
  }

  test("limit pushdown reaches the source") {
    MemTables.register("people", schema, rows)
    val df = spark.table("mem.people").limit(7)
    assert(df.count() === 7)
  }

  test("aggregate pushdown: MIN/MAX/SUM/COUNT group-by evaluates source-side") {
    MemTables.register("metrics", StructType(Seq(
      StructField("grp", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("n", LongType, nullable = false))),
      (1L to 90L).map(i => Row(s"g${i % 3}", i * 0.5, i)))
    val df = spark.table("mem.metrics").groupBy("grp")
      .agg(count(lit(1)).as("c"), max(col("score")).as("mx"), sum(col("n")).as("s"))
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(rows("g0") === ((30L, 45.0, (3L to 90L by 3).sum)))
    assert(rows("g1") === ((30L, 44.0, (1L to 88L by 3).sum)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation") || !plan.contains("HashAggregate"),
      s"aggregate not pushed:\n$plan")
  }

  test("pushed SUM keeps SQL NULL semantics: all-NULL group sums to NULL, not 0") {
    MemTables.register("nullable", StructType(Seq(
      StructField("grp", StringType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("d", DoubleType, nullable = true))),
      Seq(Row("a", 1L, 1.5), Row("a", null, null), Row("b", null, null), Row("b", null, null)))
    val df = spark.table("mem.nullable").groupBy("grp")
      .agg(sum(col("v")).as("sv"), sum(col("d")).as("sd"))
    val byGrp = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byGrp("a").getLong(1) === 1L && byGrp("a").getDouble(2) === 1.5)
    assert(byGrp("b").isNullAt(1), "SUM over all-NULL group must be NULL with pushdown")
    assert(byGrp("b").isNullAt(2))
    // filter semantics: col = NULL matches nothing (three-valued logic)
    assert(spark.table("mem.nullable").filter(col("v") === lit(null).cast(LongType)).count() === 0)
  }

  test("whole-tree pushdown renders ONE dialect SQL statement with the pushed filters in it") {
    SingleSourceJoinPushdown.ensure(spark)
    MemTables.register("people", schema, rows)
    val deptSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dept", StringType, nullable = false)))
    MemTables.register("depts", deptSchema,
      (1L to 40L).map(i => Row(i, if (i % 2 == 0) "eng" else "ops")))
    MemTables.renderedSql.clear()

    val df = spark.table("mem.people").filter(col("score") > 10.0)
      .join(spark.table("mem.depts"), Seq("id"), "left")
      .select(col("id"), col("name"), col("dept"))
    val out = df.collect()

    // correctness of the engine round trip, incl. LEFT null extension
    assert(out.length === 80) // score > 10 ⇔ id > 20
    assert(out.filter(_.isNullAt(2)).map(_.getLong(0)).min === 41L)

    // the wire format: one statement, source dialect, filter re-expressed
    val sql = MemTables.renderedSql.toSeq
    assert(sql.size === 1, s"expected exactly one rendered statement, got $sql")
    val s0 = sql.head
    assert(s0.matches(
      """SELECT t0\.`id` AS c0.*FROM \(SELECT .*FROM `people` WHERE .*\) t0 LEFT JOIN `depts` t1 ON t0\.`id` = t1\.`id`"""),
      s"rendered SQL shape unexpected:\n$s0")
    assert(s0.contains("`score` > 10.0"), s"pushed filter missing from render:\n$s0")
    // no Join survives in the Spark plan — the source answered the tree
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "join should have been evaluated source-side")
  }

  test("EXPLAIN over a pushed tree is pure: no remote execution, no telemetry") {
    SingleSourceJoinPushdown.ensure(spark)
    MemTables.register("people", schema, rows)
    MemTables.register("depts", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dept", StringType, nullable = false))),
      (1L to 40L).map(i => Row(i, if (i % 2 == 0) "eng" else "ops")))
    MemTables.renderedSql.clear()
    MemTables.pushedJoins.clear()

    val df = spark.table("mem.people")
      .join(spark.table("mem.depts"), Seq("id"))
      .select(col("id"), col("name"), col("dept"))
    // force every plan stage EXPLAIN walks — optimization included —
    // without an action
    df.explain(true)
    df.queryExecution.optimizedPlan.toString
    df.queryExecution.executedPlan.toString
    assert(MemTables.renderedSql.isEmpty,
      s"EXPLAIN executed the remote statement: ${MemTables.renderedSql}")
    assert(MemTables.pushedJoins.isEmpty,
      "EXPLAIN recorded join telemetry without executing")
    // the pushed statement is visible in the plan TEXT (the scan node's
    // description) even though nothing ran
    assert(df.queryExecution.executedPlan.toString.contains("RenderedSqlScan"),
      "plan does not show the rendered-sql scan node")
    assert(df.queryExecution.executedPlan.toString.contains("[SELECT"),
      "plan does not show the rendered statement text")

    // first action: executes exactly once and records
    df.collect()
    assert(MemTables.renderedSql.size === 1,
      s"expected one recorded statement, got ${MemTables.renderedSql}")
  }

  test("bushy-tree telemetry records true join edges, not adjacent leaves") {
    SingleSourceJoinPushdown.ensure(spark)
    MemTables.register("people", schema, rows)
    MemTables.register("depts", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dept", StringType, nullable = false))),
      (1L to 40L).map(i => Row(i, if (i % 2 == 0) "eng" else "ops")))
    MemTables.register("sites", StructType(Seq(
      StructField("dept", StringType, nullable = false),
      StructField("site", StringType, nullable = false))),
      Seq(Row("eng", "sfo"), Row("ops", "nyc")))
    MemTables.pushedJoins.clear()

    // people ⋈ (depts ⋈ sites): people joins the SUBTREE {depts,sites},
    // never depts alone in leaf order
    val dimside = spark.table("mem.depts").join(spark.table("mem.sites"), Seq("dept"))
    val df = spark.table("mem.people").join(dimside, Seq("id"))
      .select(col("id"), col("site"))
    df.collect()
    val edges = MemTables.pushedJoins.toSet
    assert(edges.contains(("depts", "sites")), s"inner bushy edge missing: $edges")
    assert(edges.contains(("people", "depts")) && edges.contains(("people", "sites")),
      s"outer edge should span the whole right subtree: $edges")
  }

  test("aggregate over a pushed join ships whole: GROUP BY in the render, no agg in the plan") {
    SingleSourceJoinPushdown.ensure(spark)
    MemTables.register("people", schema, rows)
    MemTables.register("depts", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dept", StringType, nullable = false))),
      (1L to 40L).map(i => Row(i, if (i % 2 == 0) "eng" else "ops")))
    MemTables.renderedSql.clear()

    val df = spark.table("mem.people")
      .join(spark.table("mem.depts"), Seq("id"))
      .groupBy(col("dept"))
      .agg(count(lit(1)).as("n"), sum(col("score")).as("total"))
      .orderBy(col("dept"))
    val out = df.collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("eng", 20L), ("ops", 20L)))

    val sql = MemTables.renderedSql.toSeq
    assert(sql.size === 1, s"expected one rendered statement, got $sql")
    assert(sql.head.contains("COUNT(*)") && sql.head.contains("SUM(") &&
      sql.head.contains("GROUP BY"), s"aggregate not in the render:\n${sql.head}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"join/aggregate survived in Spark — the source should have answered:\n$plan")
  }

  test("ORDER BY + LIMIT over a pushed join ships whole: k rows cross, no Spark sort of the join") {
    SingleSourceJoinPushdown.ensure(spark)
    MemTables.register("people", schema, rows)
    MemTables.register("depts", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dept", StringType, nullable = false))),
      (1L to 40L).map(i => Row(i, if (i % 2 == 0) "eng" else "ops")))
    MemTables.renderedSql.clear()

    val df = spark.table("mem.people")
      .join(spark.table("mem.depts"), Seq("id"))
      .orderBy(col("score").desc, col("id"))
      .limit(5)
      .select(col("id"), col("dept"))
    val out = df.collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(40L, 39L, 38L, 37L, 36L))

    val sql = MemTables.renderedSql.toSeq
    assert(sql.size === 1 && sql.head.contains("ORDER BY") && sql.head.contains("LIMIT 5"),
      s"top-k not in the render: $sql\nplan:\n${df.queryExecution.optimizedPlan}")
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "join survived — the source should have answered the whole top-k")
  }

  test("bushy join tree pushes whole: right-side sub-join renders parenthesized") {
    SingleSourceJoinPushdown.ensure(spark)
    MemTables.register("people", schema, rows)
    MemTables.register("depts", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dept", StringType, nullable = false))),
      (1L to 40L).map(i => Row(i, if (i % 2 == 0) "eng" else "ops")))
    MemTables.register("sites", StructType(Seq(
      StructField("dept", StringType, nullable = false),
      StructField("site", StringType, nullable = false))),
      Seq(Row("eng", "sfo"), Row("ops", "nyc")))
    MemTables.renderedSql.clear()

    // people ⋈ (depts ⋈ sites): the right side is itself a join — the
    // reference flattens arbitrary trees (plan_join.py:185); one
    // statement must ship, with the sub-join parenthesized
    val dimside = spark.table("mem.depts")
      .join(spark.table("mem.sites"), Seq("dept"))
    val df = spark.table("mem.people")
      .join(dimside, Seq("id"))
      .groupBy(col("site")).agg(count(lit(1)).as("n"))
      .orderBy(col("site"))
    val out = df.collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("nyc", 20L), ("sfo", 20L)))

    val sql = MemTables.renderedSql.toSeq
    assert(sql.size === 1, s"expected one statement for the bushy tree, got $sql")
    assert(sql.head.contains("JOIN (") && sql.head.contains("GROUP BY"),
      s"bushy right side not parenthesized in:\n${sql.head}")
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "bushy tree was not pushed whole")
  }

  test("semi/anti joins ship as correlated [NOT] EXISTS subqueries") {
    SingleSourceJoinPushdown.ensure(spark)
    MemTables.register("people", schema, rows)
    MemTables.register("depts", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dept", StringType, nullable = false))),
      (1L to 40L).map(i => Row(i, if (i % 2 == 0) "eng" else "ops")))
    MemTables.renderedSql.clear()

    val p = spark.table("mem.people")
    val dd = spark.table("mem.depts")
    val semi = p.join(dd, p("id") === dd("id"), "left_semi")
    val anti = p.join(dd, p("id") === dd("id"), "left_anti")
    assert(semi.count() === 40 && anti.count() === 60)

    val sql = MemTables.renderedSql.toSeq
    assert(sql.exists(_.contains("WHERE EXISTS (SELECT 1 FROM")), s"semi not shipped: $sql")
    assert(sql.exists(_.contains("WHERE NOT EXISTS (SELECT 1 FROM")), s"anti not shipped: $sql")
    assert(!semi.queryExecution.executedPlan.toString.contains("Join"),
      "semi join survived in Spark")
  }

  test("SQL renderer: dialect quoting, literal escaping, filter round-trip") {
    import org.apache.spark.sql.sources
    import SqlRender.Dialect
    assert(SqlRender.filterSql(sources.EqualTo("na`me", "O'Neil"), Dialect.spark)
      === "`na``me` = 'O''Neil'")
    assert(SqlRender.filterSql(sources.EqualTo("a", "x"), Dialect.ansi) === "\"a\" = 'x'")
    assert(SqlRender.filterSql(
      sources.And(sources.GreaterThanOrEqual("a", 5L), sources.In("b", Array("p", "q"))),
      Dialect.ansi) === "(\"a\" >= 5 AND \"b\" IN ('p', 'q'))")
    assert(SqlRender.filterSql(sources.IsNull("c"), Dialect.ansi) === "\"c\" IS NULL")
    assert(SqlRender.filterSql(
      sources.Not(sources.EqualNullSafe("d", null)), Dialect.ansi)
      === "(NOT \"d\" IS NOT DISTINCT FROM NULL)")
    // unrenderable syntax must throw — the rule treats that as "don't push"
    intercept[UnsupportedOperationException](
      SqlRender.filterSql(sources.StringContains("e", "z"), Dialect.ansi))
  }

  test("cross-catalog join resolves both namespaces") {
    MemTables.register("dim", StructType(Seq(
      StructField("r_regionkey", LongType, nullable = false),
      StructField("tag", StringType, nullable = false))),
      (0L to 4L).map(i => Row(i, s"tag$i")))
    val joined = Tables.table(spark, dir, "region")
      .join(spark.table("mem.dim"), "r_regionkey")
    assert(joined.count() === 5)
    assert(joined.columns.contains("tag") && joined.columns.contains("r_name"))
  }

  test("keyset fetch is resumable and loses nothing") {
    val orders = Tables.table(spark, dir, "orders")
    val total = orders.count()
    val st = new FetchState
    val part1 = PartitionedFetch.keysetFetch(() => orders, "o_orderkey", 600, st, maxBatches = 1)
    assert(st.batches === 1 && !st.done)
    val n1 = part1.count()
    assert(n1 === 600)
    val part2 = PartitionedFetch.keysetFetch(() => orders, "o_orderkey", 600, st)
    assert(st.done)
    assert(n1 + part2.count() === total)
    // no overlap
    assert(part1.join(part2, Seq("o_orderkey"), "left_semi").count() === 0)
  }

  test("threaded fetch overlaps batch processing with the next fetch; result identical") {
    val orders = Tables.table(spark, dir, "orders")
    import org.apache.spark.sql.functions.{col => fcol}
    val proc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.select(fcol("o_orderkey"), fcol("o_totalprice"))
    // sequential reference result
    val seqSt = new FetchState
    val seqOut = PartitionedFetch.keysetFetch(() => orders, "o_orderkey", 400, seqSt)
    val expected = proc(seqOut).collect().map(_.getLong(0)).sorted.toSeq
    // injectable latency: every batch's processing sleeps, and each
    // call logs its (start, end) wall-clock window
    val windows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]())
    val slowProc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df => {
      val s = System.nanoTime(); Thread.sleep(120)
      val out = proc(df); windows.add((s, System.nanoTime())); out
    }
    val st = new FetchState
    val out = PartitionedFetch.fetchThreads(
      () => orders, "o_orderkey", 400, slowProc, threads = 4, st)
    assert(st.done)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === expected)
    // overlap proof: at least two processing windows intersect in time
    val ws = windows.toArray(Array.empty[(Long, Long)]).toSeq
    assert(ws.size >= 3)
    val overlapping = ws.combinations(2).exists {
      case Seq((s1, e1), (s2, e2)) => s1 < e2 && s2 < e1
      case _ => false
    }
    assert(overlapping, "batch processing never overlapped — pipeline is serial")
  }

  test("threaded fetch resume contract: failure commits nothing past the failed batch") {
    val orders = Tables.table(spark, dir, "orders")
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val failing: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df => {
      if (calls.incrementAndGet() == 3) sys.error("batch 3 exploded")
      df
    }
    val st = new FetchState
    val e = intercept[RuntimeException](
      PartitionedFetch.fetchThreads(
        () => orders, "o_orderkey", 500, failing, threads = 2, st))
    assert(e.getMessage.contains("exploded"))
    // in-order commit: batches 1-2 are committed, nothing at or past 3
    assert(st.batches === 2 && !st.done)
    // resuming with the SAME state refetches exactly the uncommitted
    // window and completes with nothing lost
    val rest = PartitionedFetch.fetchThreads(
      () => orders, "o_orderkey", 500, df => df, threads = 2, st)
    assert(st.done)
    assert(1000L + rest.count() === orders.count())
    // skip mode: a failed batch drops out but the walk continues
    val st2 = new FetchState
    val calls2 = new java.util.concurrent.atomic.AtomicInteger(0)
    val skip = PartitionedFetch.fetchThreads(
      () => orders, "o_orderkey", 500, df => {
        if (calls2.incrementAndGet() == 2) sys.error("skipped")
        df
      }, threads = 2, st2, onError = "skip")
    assert(st2.done)
    assert(skip.count() === orders.count() - 500)
  }

  test("keyset fetch over many batches keeps a flat plan and releases consumed caches") {
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val orders = Tables.table(spark, dir, "orders").limit(1200)
    val st = new FetchState
    // 1200 rows / 10 per batch = 120 driver round trips — the shape that
    // previously pinned 120 caches and built a 120-way union plan
    val out = PartitionedFetch.keysetFetch(() => orders, "o_orderkey", 10, st)
    assert(out.count() === 1200)
    assert(st.batches === 120)
    // 120 batches compact into ceil(120/16) = 8 checkpointed segments;
    // the 120 per-batch caches must all be released
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(persistedAfter - persistedBefore <= 10,
      s"caches leaked: $persistedBefore -> $persistedAfter")
    // lineage is checkpoint-truncated: the plan is an 8-way union of
    // LogicalRDDs, not a 120-deep unionByName chain
    assert(out.queryExecution.optimizedPlan.toString.linesIterator.size < 40)
  }

  test("xlsx reader: shared strings, inline strings, booleans, blanks, typing") {
    import graft.federation.FileSource
    val tmp = java.nio.file.Files.createTempDirectory("xlsx_spec").toString
    // writer path (inline strings + numeric cells)
    FileSource.writeXlsx(s"$tmp/t.xlsx", Seq("name", "qty", "note"),
      Seq(Seq("alpha", 1.5, "x&<y>"), Seq("beta", 2L, null), Seq("gamma", 3, "plain")))
    val df = FileSource.read(spark, s"$tmp/t.xlsx")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq
      === Seq(("name", "string"), ("qty", "double"), ("note", "string")))
    val rows = df.orderBy("qty").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("alpha", "beta", "gamma"))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.5, 2.0, 3.0))
    assert(rows(0).getString(2) === "x&<y>" && rows(1).isNullAt(2))
    // hand-built workbook exercising the sharedStrings + boolean paths
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$tmp/s.xlsx")))
    def entry(n: String, c: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(n)); out.write(c.getBytes("UTF-8")); out.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<sst><si><t>col_a</t></si><si><t>col_b</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="b"><v>1</v></c></row>
        </sheetData></worksheet>""")
    out.close()
    val sdf = FileSource.read(spark, s"$tmp/s.xlsx")
    assert(sdf.columns.toSeq === Seq("col_a", "col_b"))
    val r = sdf.collect().head
    assert(r.getString(0) === "rich" && r.getString(1) === "true")
  }

  test("multipage workbook: bare name lists pages; files.<f>.<page> reads one (reference test_multipage)") {
    import graft.federation.FileSource
    val tmp = java.nio.file.Files.createTempDirectory("xlsx_pages").toString
    FileSource.writeXlsxPages(s"$tmp/book.xlsx", Seq(
      ("Alpha", Seq("a", "b", "c", "d"), Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8))),
      ("Beta", Seq("x", "y"), Seq(Seq("u", "v")))))
    // bare read → the page list, like the reference's files handler
    val pages = FileSource.read(spark, s"$tmp/book.xlsx")
      .collect().map(_.getString(0)).toSeq
    assert(pages === Seq("Alpha", "Beta"))
    // page addressing through the SQL namespace
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), graft.catalog.Warehouse.temp(spark))
    val filesDir = java.nio.file.Paths.get(s"${c.warehouse.dir}/.files")
    java.nio.file.Files.createDirectories(filesDir)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$tmp/book.xlsx"),
      filesDir.resolve("book.xlsx"))
    assert(c.execute("SELECT * FROM files.book").collect()
      .map(_.getString(0)).toSeq === Seq("Alpha", "Beta"))
    assert(c.execute("SELECT * FROM files.book.Alpha").columns.length === 4)
    assert(c.execute("SELECT * FROM files.book.Beta").columns.toSeq === Seq("x", "y"))
  }

  test("pdf reader: Flate stream, escapes, nested parens, line structure") {
    import graft.federation.FileSource
    val tmp = java.nio.file.Files.createTempDirectory("pdf_spec").toString
    FileSource.writePdf(s"$tmp/t.pdf",
      Seq("first line", "with (parens) and \\backslash", "third"))
    val rows = FileSource.read(spark, s"$tmp/t.pdf").collect()
    assert(rows.nonEmpty)
    val text = rows.map(_.getString(0)).mkString
    assert(text === "first line\nwith (parens) and \\backslash\nthird")
    assert(rows.head.getString(1) === "t.pdf" && rows.head.getString(2) === "pdf")
  }

  test("file format detection: extension and content sniffing") {
    val tmp = java.nio.file.Files.createTempDirectory("sniff")
    assert(FileSource.detectFormat("x.csv") === "csv")
    assert(FileSource.detectFormat("x.tsv") === "csv")
    assert(FileSource.detectFormat("x.json") === "json")
    assert(FileSource.detectFormat("x.parquet") === "parquet")
    assert(FileSource.detectFormat("x.xls") === "xlsx")
    val j = tmp.resolve("noext_json")
    java.nio.file.Files.writeString(j, """[{"a": 1}]""")
    assert(FileSource.detectFormat(j.toString) === "json")
    val c = tmp.resolve("noext_csv")
    java.nio.file.Files.writeString(c, "a,b,c\n1,2,3\n")
    assert(FileSource.detectFormat(c.toString) === "csv")
    val t = tmp.resolve("noext_txt")
    java.nio.file.Files.writeString(t, "plain text here\nmore\n")
    assert(FileSource.detectFormat(t.toString) === "txt")
    // xlsx and pdf now read for real — a missing file is a file error,
    // not an unsupported format
    intercept[java.io.IOException] { FileSource.read(spark, "x.pdf") }
    intercept[java.io.IOException] { FileSource.read(spark, "x.xlsx") }
  }

  // ---- live JDBC handler (embedded Derby) ----------------------------

  test("JDBC handler: get_tables lists seeded tables; native DDL executes") {
    val db = JdbcDb.seedFromParquet(spark, dir, "supplier")
    JdbcDb.seedFromParquet(spark, dir, "nation")
    val ts = JdbcDb.tables(db)
    assert(ts.contains("SUPPLIER") && ts.contains("NATION"), s"tables: $ts")
    // server-side DDL passthrough: an index the engine can use
    JdbcDb.executeUpdate(db,
      """CREATE INDEX supp_nk_idx ON APP.SUPPLIER ("s_nationkey")""")
    JdbcDb.executeUpdate(db, "DROP INDEX supp_nk_idx")
  }

  test("JDBC filter pushdown: the WHERE reaches the engine as SQL") {
    val df = graft.queries.FederationPack.queries("f16_jdbc_fetch")(spark, dir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("s_acctbal > 5000.0"),
      s"filter not pushed:\n$scan")
  }

  test("JDBC whole-query pushdown: join AND aggregate ship as one statement") {
    val df = graft.queries.FederationPack.queries("f17_jdbc_join_pushdown")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the joined+aggregated statement executes inside Derby: the Spark
    // plan keeps ONE JDBC scan and zero join/aggregate-input nodes
    assert(plan.contains("PushedJoins"), s"join not pushed:\n$plan")
    assert(plan.contains("PushedAggregates"), s"aggregate not pushed:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"a Spark-side join survived:\n$plan")
  }

  test("JDBC aggregate pushdown: finished groups cross the boundary") {
    val df = graft.queries.FederationPack.queries("f18_jdbc_agg_pushdown")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") && plan.contains("PushedGroupByExpressions"),
      s"aggregate not pushed:\n$plan")
    assert(!plan.contains("HashAggregate"), s"Spark re-aggregated:\n$plan")
  }

  test("JDBC limit pushdown: FETCH FIRST renders through the Derby dialect") {
    val db = JdbcDb.seedFromParquet(spark, dir, "supplier")
    JdbcDb.ensureCatalog(spark, db)
    val df = spark.table("rdb.APP.SUPPLIER")
      .select(col("s_suppkey"), col("s_name")).limit(4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit"), s"limit not pushed:\n$plan")
    assert(df.count() === 4)
  }

  test("JDBC top-k pushdown: ORDER BY + LIMIT ship as one FETCH FIRST statement") {
    val df = graft.queries.FederationPack.queries("f21_jdbc_topn_pushdown")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN") || plan.contains("PushedLimit"),
      s"top-k not pushed:\n$plan")
    assert(df.count() === 6)
  }

  test("JDBC partitioned read: N range-predicated partitions fetch in parallel") {
    val db = JdbcDb.seedFromParquet(spark, dir, "supplier")
    val df = JdbcDb.partitionedRead(spark, db, "SUPPLIER", "\"s_suppkey\"",
      lower = 1L, upper = 100L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4, "expected 4 JDBC range partitions")
    // stride predicates partition, never filter: every supplier row
    // arrives exactly once even though upper < max(s_suppkey) elsewhere
    assert(df.count() ===
      Tables.table(spark, dir, "supplier").count())
  }

  test("remote DDL/DML through the live JDBC catalog: CREATE TABLE, INSERT, SELECT, DROP") {
    val db = JdbcDb.seedFromParquet(spark, dir, "supplier")
    JdbcDb.ensureCatalog(spark, db)
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), graft.catalog.Warehouse.temp(spark))
    // the reference's `create table pg.table1 (a DATE, b INTEGER)` shape
    // (test_create_empty_table): dotted names fall through the warehouse
    // DDL routes to Catalyst, which drives Derby via JDBCTableCatalog
    c.execute("DROP TABLE IF EXISTS rdb.APP.REMOTE_T")
    c.execute("CREATE TABLE rdb.APP.REMOTE_T (a INT, b STRING)")
    c.execute("INSERT INTO rdb.APP.REMOTE_T VALUES (1, 'x'), (2, 'y')")
    assert(c.execute("SELECT count(*) AS n FROM rdb.APP.REMOTE_T").first().getLong(0) === 2L)
    // the table exists in the ENGINE, not just Spark's view of it
    assert(JdbcDb.tables(db).contains("REMOTE_T"))
    c.execute("DROP TABLE rdb.APP.REMOTE_T")
    assert(!JdbcDb.tables(db).contains("REMOTE_T"))
  }

  test("JDBC write-back round trip preserves values and types") {
    val db = JdbcDb.dbName(dir)
    import spark.implicits._
    val src = Seq((1L, "a", 1.5), (2L, "b", -2.25), (3L, "c", 0.0))
      .toDF("id", "tag", "v")
    JdbcDb.createAndLoad(src, db, "ROUNDTRIP_SPEC")
    val back = JdbcDb.readTable(spark, db, "ROUNDTRIP_SPEC").orderBy("id")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      Seq(("id", LongType), ("tag", StringType), ("v", DoubleType)))
    assert(back.collect().toSeq === Seq(Row(1L, "a", 1.5), Row(2L, "b", -2.25), Row(3L, "c", 0.0)))
    // append path (reference handler.insert)
    JdbcDb.insert(Seq((4L, "d", 9.75)).toDF("id", "tag", "v"), db, "ROUNDTRIP_SPEC")
    assert(JdbcDb.readTable(spark, db, "ROUNDTRIP_SPEC").count() === 4)
  }
}

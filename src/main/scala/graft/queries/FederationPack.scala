package graft.queries

import graft.engine.Tables
import graft.federation.{FileSource, JdbcDb, MemCatalog, MemTables, PartitionedFetch}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Parity._

/** Federation pack (SURVEY §2.1 FetchDataframe / FetchDataframePartition,
  * §2.2 remote + API + file sources): multi-catalog resolution with a
  * DSv2 in-memory source, cross-source joins, keyset-paginated resumable
  * fetch, and file-format round trips.
  */
object FederationPack extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** the "remote" dimension living in the mem catalog */
  private val weightSchema = StructType(Seq(
    StructField("o_orderpriority", StringType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))
  private val weightRows = Seq(
    Row("1-URGENT", 1.5), Row("2-HIGH", 1.2), Row("3-MEDIUM", 1.0),
    Row("4-NOT SPECIFIED", 0.8), Row("5-LOW", 0.5))

  /** second "remote" dimension, joinable to priority_weight */
  private val labelSchema = StructType(Seq(
    StructField("o_orderpriority", StringType, nullable = false),
    StructField("label", StringType, nullable = false)))
  private val labelRows = Seq(
    Row("1-URGENT", "expedite"), Row("2-HIGH", "expedite"), Row("3-MEDIUM", "standard"),
    Row("4-NOT SPECIFIED", "standard"), Row("5-LOW", "deferred"))

  /** third "remote" dimension covering only SOME priorities — the LEFT
    * side of the pushed outer join exercises source-side null extension */
  private val noteSchema = StructType(Seq(
    StructField("o_orderpriority", StringType, nullable = false),
    StructField("note", StringType, nullable = false)))
  private val noteRows = Seq(
    Row("1-URGENT", "sla-4h"), Row("2-HIGH", "sla-24h"), Row("5-LOW", "batch"))

  private def memCatalog(s: SparkSession): Unit = {
    MemTables.register("priority_weight", weightSchema, weightRows)
    MemTables.register("status_label", labelSchema, labelRows)
    MemTables.register("priority_note", noteSchema, noteRows)
    if (!s.conf.getOption("spark.sql.catalog.mem").contains(classOf[MemCatalog].getName))
      s.conf.set("spark.sql.catalog.mem", classOf[MemCatalog].getName)
    graft.federation.SingleSourceJoinPushdown.ensure(s)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // cross-source join: parquet fact × mem-catalog dim, resolved through
    // the multi-catalog namespace (query_planner.py:787-807 planning
    // across integrations; plan_join.py:61-94)
    "f01_cross_source_join" -> ((s, dir) => {
      memCatalog(s)
      val weights = s.table("mem.priority_weight")
      t(s, dir, "orders")
        .join(broadcast(weights), Seq("o_orderpriority"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum2(col("weight"), col("o_totalprice")).as("weighted"))
        .orderBy(col("o_orderstatus"))
    }),

    // resumable keyset-paginated fetch: union of batches == full table
    "f02_partitioned_fetch" -> ((s, dir) => {
      val fetched = PartitionedFetch.keysetFetch(
        () => t(s, dir, "orders"), "o_orderkey", batchSize = 8000)
      fetched.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // threaded partitioned fetch (fetch_dataframe_partition.py:77-98
    // `threads` USING param): the keyset walk stays serial, each batch's
    // processing runs on a worker pool overlapping the next fetch;
    // in-order commit preserves the resume contract
    "f25_threaded_fetch" -> ((s, dir) => {
      val fetched = PartitionedFetch.fetchThreads(
        () => t(s, dir, "orders"), "o_orderkey", batchSize = 8000,
        process = df => df.filter(col("o_totalprice") > 1000.0), threads = 4)
      fetched.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // whole-join pushdown: both dims live in ONE mem catalog, so their
    // join evaluates source-side (SingleSourceJoinPushdown) — the Spark
    // plan joins orders against a LocalRelation, not against two remote
    // scans (query_planner.py:787-807)
    "f04_whole_join_pushdown" -> ((s, dir) => {
      memCatalog(s)
      val dims = s.table("mem.priority_weight")
        .join(s.table("mem.status_label"), "o_orderpriority")
      t(s, dir, "orders")
        .join(broadcast(dims), Seq("o_orderpriority"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), dsum2(col("weight"), col("o_totalprice")).as("weighted"))
        .orderBy(col("label"))
    }),

    // xlsx round trip: write a workbook from orders (driver-side — one
    // workbook is one file), read back through format detection, aggregate
    "f05_xlsx_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
      val slim = t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
      FileSource.writeXlsx(s"$tmp/orders.xlsx",
        Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
        slim.collect().toSeq.map(_.toSeq))
      FileSource.read(s, s"$tmp/orders.xlsx")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // pdf round trip: write a one-page PDF of region names, extract the
    // text layer, chunk through the KB splitter (the reference's exact
    // read_pdf contract: content rows + source metadata)
    "f06_pdf_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_pdf").toString
      val names = t(s, dir, "region").orderBy(col("r_regionkey"))
        .collect().map(_.getString(1)).toSeq
      FileSource.writePdf(s"$tmp/regions.pdf", Seq.fill(8)(names).flatten)
      FileSource.read(s, s"$tmp/regions.pdf")
    }),

    // the files integration as a SQL namespace: `FROM files.<name>`
    // resolves against the warehouse .files area, format-sniffed into a
    // distributed scan (the reference's uploaded-files surface)
    "f07_files_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      val filesDir = java.nio.file.Paths.get(s"${c.warehouse.dir}/.files")
      java.nio.file.Files.createDirectories(filesDir)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true")
        .csv(filesDir.resolve("orders_f07.csv").toString)
      c.execute("""SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM files.orders_f07 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // whole-AGGREGATE pushdown (SupportsPushDownAggregates): COUNT/SUM/
    // MIN/MAX GROUP BY evaluate inside the source; Spark's scan output IS
    // the finished groups (the DSv2-native form of shipping an aggregate
    // query to a remote handler — at 100 TB the network carries |groups|
    // rows, not the table). The sum column is integral so source-side and
    // oracle summation orders cannot disagree; min/max are order-free.
    "f08_agg_pushdown" -> ((s, dir) => {
      memCatalog(s)
      val slim = t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_returnflag"), col("l_quantity").cast(LongType).as("qty"),
          col("l_extendedprice"))
      MemTables.register("remote_li_f08",
        StructType(Seq(
          StructField("l_returnflag", StringType),
          StructField("qty", LongType),
          StructField("l_extendedprice", DoubleType))),
        slim.collect().toSeq)
      s.table("mem.remote_li_f08")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy(col("l_returnflag"))
    }),

    // ORDER BY … LIMIT k pushed WHOLE into the DSv2 source: the source
    // returns the finished top-k and Spark's own Sort+Limit disappear —
    // k rows cross the boundary, not the table (the reference ships
    // ORDER BY/LIMIT to the remote handler the same way)
    "f09_topn_pushdown" -> ((s, dir) => {
      memCatalog(s)
      val slim = t(s, dir, "orders").filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      MemTables.register("remote_ord_f09",
        StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType))),
        slim.collect().toSeq)
      s.table("mem.remote_ord_f09")
        .filter(col("o_orderstatus") === "O")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(7)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // MULTI-WAY single-catalog pushdown with an OUTER join: a left-deep
    // tree of THREE mem-catalog scans (weight ⋈ label ⟕ note) flattens,
    // renders to one SQL statement, and executes inside the source — the
    // Spark plan joins orders against ONE LocalRelation; zero dim-dim
    // join nodes survive (plan_join.py:185-223 flattening + :61-94
    // single-source shipping)
    "f10_multiway_pushdown" -> ((s, dir) => {
      memCatalog(s)
      val dims = s.table("mem.priority_weight")
        .join(s.table("mem.status_label"), "o_orderpriority")
        .join(s.table("mem.priority_note"), Seq("o_orderpriority"), "left")
      t(s, dir, "orders")
        .join(broadcast(dims), Seq("o_orderpriority"))
        .groupBy(col("label"), coalesce(col("note"), lit("none")).as("note"))
        .agg(count(lit(1)).as("n"), dsum2(col("weight"), col("o_totalprice")).as("weighted"))
        .orderBy(col("label"), col("note"))
    }),

    // the rendered-SQL wire format made visible: the pushed three-way
    // join IS the query result — what comes back is exactly what the
    // remote engine computed from the rendered statement
    // (sqlalchemy_render.py:112 equivalent; FederationSpec asserts the
    // SQL text shape)
    "f11_pushdown_sql_render" -> ((s, dir) => {
      memCatalog(s)
      s.table("mem.priority_weight")
        .join(s.table("mem.status_label"), "o_orderpriority")
        .join(s.table("mem.priority_note"), Seq("o_orderpriority"), "left")
        .select(col("o_orderpriority"), col("weight"), col("label"),
          coalesce(col("note"), lit("none")).as("note"))
        .orderBy(col("o_orderpriority"))
    }),

    // the WHOLE SELECT ships: GROUP BY over the three-way single-catalog
    // join renders as one GROUP BY statement and the source returns
    // finished groups — neither the join nor the aggregate survives in
    // the Spark plan (query_planner.py:787-807 whole-query shipping; at
    // 100 TB only |groups| rows cross the wire). COUNT(note) counts the
    // outer join's non-null extensions source-side.
    "f12_agg_over_pushed_join" -> ((s, dir) => {
      memCatalog(s)
      s.table("mem.priority_weight")
        .join(s.table("mem.status_label"), "o_orderpriority")
        .join(s.table("mem.priority_note"), Seq("o_orderpriority"), "left")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("weight")).as("w_sum"),
          count(col("note")).as("n_note"), avg(col("weight")).as("w_avg"))
        .orderBy(col("label"))
    }),

    // ORDER BY + LIMIT over the pushed join tree ships whole: the
    // source sorts and returns k rows — the join, sort, and limit all
    // leave the Spark plan (the join analog of f09's leaf TopN pushdown)
    "f13_topn_over_pushed_join" -> ((s, dir) => {
      memCatalog(s)
      s.table("mem.priority_weight")
        .join(s.table("mem.status_label"), "o_orderpriority")
        .join(s.table("mem.priority_note"), Seq("o_orderpriority"), "left")
        .select(col("o_orderpriority"), col("weight"), col("label"))
        .orderBy(col("weight").desc, col("o_orderpriority"))
        .limit(3)
    }),

    // DISTINCT over the pushed join rides the same whole-query path:
    // Catalyst rewrites Distinct to a group-by-all-columns Aggregate,
    // which renders as SELECT … GROUP BY — the dedup happens in the
    // source, |distinct| rows cross the wire
    "f14_distinct_over_pushed_join" -> ((s, dir) => {
      memCatalog(s)
      s.table("mem.priority_weight")
        .join(s.table("mem.status_label"), "o_orderpriority")
        .join(s.table("mem.priority_note"), Seq("o_orderpriority"), "left")
        .select(col("label"), col("note")).distinct()
        .select(col("label"), coalesce(col("note"), lit("none")).as("note"))
        .orderBy(col("label"), col("note"))
    }),

    // semi + anti joins over one catalog ship as correlated EXISTS /
    // NOT EXISTS subqueries — the IN/NOT-IN predicate shape planners
    // send to the source instead of fetching both tables
    "f15_semi_anti_pushdown" -> ((s, dir) => {
      memCatalog(s)
      val w = s.table("mem.priority_weight")
      val n = s.table("mem.priority_note")
      val semi = w.join(n, w("o_orderpriority") === n("o_orderpriority"), "left_semi")
        .select(col("o_orderpriority"), col("weight"), lit("has_note").as("kind"))
      val anti = w.join(n, w("o_orderpriority") === n("o_orderpriority"), "left_anti")
        .select(col("o_orderpriority"), col("weight"), lit("no_note").as("kind"))
      semi.unionByName(anti).orderBy(col("kind"), col("o_orderpriority"))
    }),

    // LIVE JDBC fetch: suppliers live in an embedded Derby database and
    // arrive through spark.read.jdbc — the real remote-handler read path
    // (postgres_handler.query :473), with the WHERE pushed into the
    // engine as SQL (explain shows PushedFilters on the JDBC scan; only
    // matching rows cross the JDBC boundary)
    "f16_jdbc_fetch" -> ((s, dir) => {
      val db = JdbcDb.seedFromParquet(s, dir, "supplier")
      JdbcDb.ensureCatalog(s, db)
      s.table("rdb.APP.SUPPLIER")
        .filter(col("s_acctbal") > 5000.0)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_suppkey"))
    }),

    // LIVE JDBC whole-join pushdown: supplier ⋈ nation both live in the
    // Derby catalog, and Spark's DSv2 join pushdown (enabled by
    // GraftDerbyDialect.supportsJoin) ships the JOIN as one statement —
    // the Spark plan has ONE JDBC scan and zero join nodes (FederationSpec
    // asserts). The aggregate stays in Spark on purpose (decimal-exact
    // sum), isolating the join seam. At 100 TB: the joined row set
    // crosses the wire once, not two tables.
    "f17_jdbc_join_pushdown" -> ((s, dir) => {
      val db = JdbcDb.seedFromParquet(s, dir, "supplier")
      JdbcDb.seedFromParquet(s, dir, "nation")
      JdbcDb.ensureCatalog(s, db)
      s.table("rdb.APP.SUPPLIER")
        .join(s.table("rdb.APP.NATION"),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total"))
        .orderBy(col("n_name"))
    }),

    // LIVE JDBC aggregate pushdown: COUNT/MIN/MAX GROUP BY evaluate
    // inside Derby (explain shows PushedAggregates/PushedGroupBy on the
    // scan); |groups| rows cross the JDBC boundary. min/max/count are
    // order-free, so engine-side evaluation is bit-identical to the
    // oracle's.
    "f18_jdbc_agg_pushdown" -> ((s, dir) => {
      val db = JdbcDb.seedFromParquet(s, dir, "supplier")
      JdbcDb.ensureCatalog(s, db)
      s.table("rdb.APP.SUPPLIER")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), min(col("s_acctbal")).as("mn"),
          max(col("s_acctbal")).as("mx"))
        .orderBy(col("s_nationkey"))
    }),

    // LIVE JDBC write-back + read-back: an aggregate computed from the
    // warehouse lands in the remote database via df.write.jdbc
    // (postgres_handler.insert :436) and is read back through the scan —
    // the INSERT INTO remote_db.table SELECT … round trip.
    "f19_jdbc_writeback" -> ((s, dir) => {
      val db = JdbcDb.dbName(dir)
      val summary = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      JdbcDb.createAndLoad(summary, db, "ORDERS_SUMMARY_F19")
      JdbcDb.readTable(s, db, "ORDERS_SUMMARY_F19")
        .orderBy(col("o_orderstatus"))
    }),

    // LIVE JDBC native_query passthrough (postgres_handler.native_query
    // :306): a Derby-dialect statement — double-quoted identifiers,
    // FETCH FIRST instead of LIMIT — executes verbatim in the engine;
    // Spark only carries the finished top-k back.
    "f20_jdbc_native_topk" -> ((s, dir) => {
      val db = JdbcDb.seedFromParquet(s, dir, "supplier")
      JdbcDb.seedFromParquet(s, dir, "nation")
      JdbcDb.nativeQuery(s, db,
        """SELECT n."n_name" AS "n_name", CAST(COUNT(*) AS BIGINT) AS "n", MAX(s."s_acctbal") AS "mx"
          FROM APP.SUPPLIER s JOIN APP.NATION n
            ON s."s_nationkey" = n."n_nationkey"
          GROUP BY n."n_name"
          ORDER BY 3 DESC, 1 FETCH FIRST 5 ROWS ONLY""")
    }),

    // LIVE JDBC top-k pushdown: ORDER BY … LIMIT ships as one Derby
    // statement (`… ORDER BY "s_acctbal" DESC FETCH FIRST 6 ROWS ONLY`)
    // through SupportsPushDownTopN + GraftDerbyDialect — k rows cross
    // the JDBC boundary, not the table
    "f21_jdbc_topn_pushdown" -> ((s, dir) => {
      val db = JdbcDb.seedFromParquet(s, dir, "supplier")
      JdbcDb.ensureCatalog(s, db)
      s.table("rdb.APP.SUPPLIER")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        .limit(6)
    }),

    // PARALLEL partitioned JDBC read — the 100 TB fetch path: N
    // executors each issue their own range-predicated statement
    // (`WHERE s_suppkey >= lo AND < hi`) against the remote engine
    // concurrently, the exact spark.read.jdbc partitionColumn contract a
    // networked warehouse uses (reference: fetch_dataframe_partition.py
    // :27-200 batches on a track column; Spark's native form is range
    // partitions). FederationSpec asserts the scan really has 4 input
    // partitions.
    "f22_jdbc_partitioned_read" -> ((s, dir) => {
      val db = JdbcDb.seedFromParquet(s, dir, "supplier")
      JdbcDb.partitionedRead(s, db, "SUPPLIER", "\"s_suppkey\"",
        lower = 1L, upper = 10000L, numPartitions = 4)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total"))
        .orderBy(col("s_nationkey"))
    }),

    // the reference's raw-SQL-in-FROM syntax on the statement surface:
    // `SELECT … FROM <db> (<native sql>) ORDER BY …` — the inner Derby-
    // dialect statement executes verbatim in the live engine and only
    // its finished result enters the Spark plan (sql_query.py routes
    // this to FetchDataframeStep over a native query)
    "f23_native_from_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      JdbcDb.seedFromParquet(s, dir, "nation")
      c.execute("CREATE DATABASE extdb_f23 WITH ENGINE='derby', " +
        s"PARAMETERS = database='${JdbcDb.dbName(dir)}'")
      c.execute("""SELECT n_regionkey, n FROM extdb_f23 (
        SELECT t."n_regionkey" AS "n_regionkey", CAST(COUNT(*) AS BIGINT) AS "n"
        FROM APP.NATION t GROUP BY t."n_regionkey") ORDER BY n_regionkey""")
    }),

    // multipage workbook through the SQL namespace (reference
    // test_multipage): page 1 holds regions, page 2 nations; the bare
    // name lists pages, `files.<f>.<page>` reads one — UNION'd so one
    // oracle pins both behaviors
    "f24_multipage_xlsx" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      val filesDir = java.nio.file.Paths.get(s"${c.warehouse.dir}/.files")
      java.nio.file.Files.createDirectories(filesDir)
      def lv(r: Row, i: Int): Long = r.get(i).asInstanceOf[Number].longValue
      val regions = t(s, dir, "region").orderBy(col("r_regionkey"))
        .collect().map(r => Seq[Any](lv(r, 0), r.getString(1)))
      val nations = t(s, dir, "nation").orderBy(col("n_nationkey"))
        .collect().map(r => Seq[Any](lv(r, 0), r.getString(1), lv(r, 2)))
      FileSource.writeXlsxPages(filesDir.resolve("geo.xlsx").toString, Seq(
        ("Regions", Seq("r_regionkey", "r_name"), regions.toSeq),
        ("Nations", Seq("n_nationkey", "n_name", "n_regionkey"), nations.toSeq)))
      c.execute("""
        SELECT 'page' AS kind, page AS name, CAST(-1 AS BIGINT) AS key
        FROM files.geo
        UNION ALL
        SELECT 'nation', n_name, CAST(n_nationkey AS BIGINT)
        FROM files.geo.Nations WHERE n_regionkey = 2
        UNION ALL
        SELECT 'region', r_name, CAST(r_regionkey AS BIGINT)
        FROM files.geo.Regions
        ORDER BY kind, key, name""")
    }),

    // file sources: csv + json round trips through format sniffing
    "f03_file_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_files").toString
      val slim = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      slim.write.mode("overwrite").option("header", "true").csv(s"$tmp/orders.csv")
      slim.write.mode("overwrite").json(s"$tmp/orders.json")
      def agg(fmt: String): DataFrame =
        FileSource.read(s, s"$tmp/orders.$fmt")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .select(lit(fmt).as("format"), col("n"), col("total"))
      agg("csv").unionByName(agg("json")).orderBy(col("format"))
    })
  )

  private val oWeights =
    "(VALUES ('1-URGENT', 1.5), ('2-HIGH', 1.2), ('3-MEDIUM', 1.0), " +
      "('4-NOT SPECIFIED', 0.8), ('5-LOW', 0.5)) AS w(o_orderpriority, weight)"

  def oracles: Map[String, String] = Map(

    "f01_cross_source_join" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum2("weight", "o_totalprice")} AS weighted
      FROM orders JOIN $oWeights USING (o_orderpriority)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "f02_partitioned_fetch" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "f25_threaded_fetch" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders WHERE o_totalprice > 1000.0
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "f04_whole_join_pushdown" -> s"""
      WITH lab AS (SELECT * FROM (VALUES
        ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'), ('3-MEDIUM', 'standard'),
        ('4-NOT SPECIFIED', 'standard'), ('5-LOW', 'deferred')) AS l(o_orderpriority, label))
      SELECT label, COUNT(*) AS n, ${oSum2("weight", "o_totalprice")} AS weighted
      FROM orders
      JOIN $oWeights USING (o_orderpriority)
      JOIN lab USING (o_orderpriority)
      GROUP BY label ORDER BY label""",

    "f05_xlsx_roundtrip" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders WHERE o_orderkey < 500
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "f06_pdf_roundtrip" -> """
      WITH names AS (SELECT string_agg(r_name, chr(10) ORDER BY r_regionkey) AS blk FROM region),
      doc AS (SELECT substr(repeat(blk || chr(10), 8), 1, 8 * (length(blk) + 1) - 1) AS t FROM names),
      d AS (SELECT t, length(t) AS len FROM doc),
      nch AS (SELECT *, CASE WHEN len <= 120 THEN CAST(1 AS BIGINT)
        ELSE CAST(CEIL((len - 120.0) / 96.0) AS BIGINT) + 1 END AS n FROM d),
      chunks AS (SELECT i, substr(t, CAST(i * 96 + 1 AS INT), 120) AS content
        FROM nch, UNNEST(generate_series(0, n - 1)) AS u(i))
      SELECT content, 'regions.pdf' AS source_file, 'pdf' AS file_format
      FROM chunks ORDER BY i""",

    "f07_files_sql" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "f09_topn_pushdown" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_orderkey < 3000 AND o_orderstatus = 'O'
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 7""",

    "f08_agg_pushdown" -> """
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
      FROM lineitem WHERE l_orderkey < 2000
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "f10_multiway_pushdown" -> s"""
      WITH lab AS (SELECT * FROM (VALUES
        ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'), ('3-MEDIUM', 'standard'),
        ('4-NOT SPECIFIED', 'standard'), ('5-LOW', 'deferred')) AS l(o_orderpriority, label)),
      nt AS (SELECT * FROM (VALUES
        ('1-URGENT', 'sla-4h'), ('2-HIGH', 'sla-24h'), ('5-LOW', 'batch'))
        AS x(o_orderpriority, note))
      SELECT label, COALESCE(nt.note, 'none') AS note, COUNT(*) AS n,
        ${oSum2("weight", "o_totalprice")} AS weighted
      FROM orders
      JOIN $oWeights USING (o_orderpriority)
      JOIN lab USING (o_orderpriority)
      LEFT JOIN nt USING (o_orderpriority)
      GROUP BY label, COALESCE(nt.note, 'none') ORDER BY label, note""",

    "f11_pushdown_sql_render" -> s"""
      WITH lab AS (SELECT * FROM (VALUES
        ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'), ('3-MEDIUM', 'standard'),
        ('4-NOT SPECIFIED', 'standard'), ('5-LOW', 'deferred')) AS l(o_orderpriority, label)),
      nt AS (SELECT * FROM (VALUES
        ('1-URGENT', 'sla-4h'), ('2-HIGH', 'sla-24h'), ('5-LOW', 'batch'))
        AS x(o_orderpriority, note))
      SELECT w.o_orderpriority, weight, label, COALESCE(nt.note, 'none') AS note
      FROM $oWeights
      JOIN lab USING (o_orderpriority)
      LEFT JOIN nt USING (o_orderpriority)
      ORDER BY w.o_orderpriority""",

    "f12_agg_over_pushed_join" -> s"""
      WITH lab AS (SELECT * FROM (VALUES
        ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'), ('3-MEDIUM', 'standard'),
        ('4-NOT SPECIFIED', 'standard'), ('5-LOW', 'deferred')) AS l(o_orderpriority, label)),
      nt AS (SELECT * FROM (VALUES
        ('1-URGENT', 'sla-4h'), ('2-HIGH', 'sla-24h'), ('5-LOW', 'batch'))
        AS x(o_orderpriority, note))
      SELECT label, COUNT(*) AS n, SUM(weight) AS w_sum,
        COUNT(nt.note) AS n_note, AVG(weight) AS w_avg
      FROM $oWeights
      JOIN lab USING (o_orderpriority)
      LEFT JOIN nt USING (o_orderpriority)
      GROUP BY label ORDER BY label""",

    "f13_topn_over_pushed_join" -> s"""
      WITH lab AS (SELECT * FROM (VALUES
        ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'), ('3-MEDIUM', 'standard'),
        ('4-NOT SPECIFIED', 'standard'), ('5-LOW', 'deferred')) AS l(o_orderpriority, label))
      SELECT w.o_orderpriority, weight, label
      FROM $oWeights
      JOIN lab USING (o_orderpriority)
      ORDER BY weight DESC, w.o_orderpriority LIMIT 3""",

    "f14_distinct_over_pushed_join" -> s"""
      WITH lab AS (SELECT * FROM (VALUES
        ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'), ('3-MEDIUM', 'standard'),
        ('4-NOT SPECIFIED', 'standard'), ('5-LOW', 'deferred')) AS l(o_orderpriority, label)),
      nt AS (SELECT * FROM (VALUES
        ('1-URGENT', 'sla-4h'), ('2-HIGH', 'sla-24h'), ('5-LOW', 'batch'))
        AS x(o_orderpriority, note)),
      d AS (SELECT DISTINCT label, nt.note
        FROM $oWeights
        JOIN lab USING (o_orderpriority)
        LEFT JOIN nt USING (o_orderpriority))
      SELECT label, COALESCE(note, 'none') AS note FROM d
      ORDER BY label, note""",

    "f15_semi_anti_pushdown" -> s"""
      WITH nt AS (SELECT * FROM (VALUES
        ('1-URGENT', 'sla-4h'), ('2-HIGH', 'sla-24h'), ('5-LOW', 'batch'))
        AS x(o_orderpriority, note))
      SELECT o_orderpriority, weight, 'has_note' AS kind
      FROM $oWeights
      WHERE EXISTS (SELECT 1 FROM nt WHERE nt.o_orderpriority = w.o_orderpriority)
      UNION ALL
      SELECT o_orderpriority, weight, 'no_note' AS kind
      FROM $oWeights
      WHERE NOT EXISTS (SELECT 1 FROM nt WHERE nt.o_orderpriority = w.o_orderpriority)
      ORDER BY kind, o_orderpriority""",

    "f16_jdbc_fetch" -> """
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      WHERE s_acctbal > 5000.0 ORDER BY s_suppkey""",

    "f17_jdbc_join_pushdown" -> s"""
      SELECT n_name, COUNT(*) AS n, ${oSum("s_acctbal")} AS total
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",

    "f18_jdbc_agg_pushdown" -> """
      SELECT s_nationkey, COUNT(*) AS n, MIN(s_acctbal) AS mn, MAX(s_acctbal) AS mx
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",

    "f19_jdbc_writeback" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "f20_jdbc_native_topk" -> """
      SELECT n_name, COUNT(*) AS n, MAX(s_acctbal) AS mx
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY mx DESC, n_name LIMIT 5""",

    "f21_jdbc_topn_pushdown" -> """
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      ORDER BY s_acctbal DESC, s_suppkey LIMIT 6""",

    "f22_jdbc_partitioned_read" -> s"""
      SELECT s_nationkey, COUNT(*) AS n, ${oSum("s_acctbal")} AS total
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",

    "f23_native_from_sql" -> """
      SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "f24_multipage_xlsx" -> """
      SELECT 'page' AS kind, name, CAST(-1 AS BIGINT) AS key
      FROM (VALUES ('Regions'), ('Nations')) t(name)
      UNION ALL
      SELECT 'nation', n_name, CAST(n_nationkey AS BIGINT)
      FROM nation WHERE n_regionkey = 2
      UNION ALL
      SELECT 'region', r_name, CAST(r_regionkey AS BIGINT) FROM region
      ORDER BY kind, key, name""",

    "f03_file_roundtrip" -> s"""
      WITH base AS (
        SELECT COUNT(*) AS n, ${oSum("o_totalprice")} AS total FROM orders)
      SELECT 'csv' AS format, n, total FROM base
      UNION ALL
      SELECT 'json' AS format, n, total FROM base
      ORDER BY format"""
  )
}

package graft

import graft.catalog.{Catalog, Warehouse}
import graft.sqlx.Commands
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DDL statement routing: the engine-object surface as SQL strings. */
class CommandsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("commands-spec")
  val dir = "/root/testdata/sf0.001"

  private def fresh(): Commands =
    new Commands(spark, new Catalog(spark, dir), Warehouse.temp(spark))

  test("KB metadata columns from inserts filter and validate (test_select_allowed_columns)") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kbcols USING content_columns='content'")
    c.execute("INSERT INTO kbcols (doc_id, content, col1) VALUES (1, 'first content words', 'val1')")
    val hit = c.execute("SELECT * FROM kbcols WHERE content = 'first' AND col1 = 'val1'")
    assert(hit.count() >= 1)
    val miss = c.execute("SELECT * FROM kbcols WHERE content = 'first' AND col1 = 'no such'")
    assert(miss.count() === 0)
    // a column never ingested must error, not silently return rows
    assertThrows[Exception](
      c.execute("SELECT * FROM kbcols WHERE content = 'first' AND col9 = 'x'").collect())
    c.execute("DROP KNOWLEDGE BASE kbcols")
  }

  test("two models join in one query (test_complex_queries multi-model shape)") {
    val c = fresh()
    c.execute("""CREATE MODEL mm1 FROM (SELECT l_quantity, l_extendedprice FROM lineitem)
      PREDICT l_extendedprice USING features='l_quantity', score_column='p1'""")
    c.execute("""CREATE MODEL mm2 FROM (SELECT l_quantity, l_tax FROM lineitem)
      PREDICT l_tax USING features='l_quantity', score_column='p2'""")
    val r = c.execute("""
      SELECT l_quantity, p1, p2 FROM
        (SELECT l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 4) t
        JOIN mm1 m1
        JOIN mm2 m2""")
    assert(r.count() === 4)
    assert(r.columns.toSeq === Seq("l_quantity", "p1", "p2"))
    assert(r.collect().forall(row => !row.isNullAt(1) && !row.isNullAt(2)))
    c.execute("DROP MODEL mm1")
    c.execute("DROP MODEL mm2")
  }

  test("native query nested inside a subselect (test_subselect_1row_aggregate)") {
    val c = fresh()
    c.execute("CREATE DATABASE nq_db WITH ENGINE='mem'")
    val r = c.execute(
      """SELECT COUNT(*) AS result FROM (
           SELECT * FROM nq_db (select 'content' AS c)
         ) t""").first()
    assert(r.getLong(0) === 1L)
    // two nested native calls in one statement
    val r2 = c.execute(
      """SELECT a.c1, b.c2 FROM
           (SELECT * FROM nq_db (select 1 AS c1)) a
           CROSS JOIN (SELECT * FROM nq_db (select 2 AS c2)) b""").first()
    assert((r2.get(0).toString, r2.get(1).toString) === (("1", "2")))
    c.execute("DROP DATABASE nq_db")
  }

  test("MySQL client handshake queries: SHOW KEYS, @@session vars, table-less functions") {
    val c = fresh()
    // test_select_without_table: the proxy answers these itself
    val v = c.execute("SELECT version()").first()
    assert(v.getString(0) === "8.0.17-graft")
    val su = c.execute("SELECT session_user").first()
    assert(su.isNullAt(0), "session_user answers NULL like the reference")
    assert(c.execute("SELECT database()").first().getString(0) === "graft")
    assert(c.execute("SELECT 1").first().get(0).toString === "1")
    // inside a real query, version() keeps Spark's meaning
    assert(c.execute("SELECT version() AS sv FROM region LIMIT 1")
      .first().getString(0) !== "8.0.17-graft")
    // test_system_vars: @@session./@@global. prefixes resolve
    val sv = c.execute(
      "SELECT @@session.auto_increment_increment, @@character_set_client").first()
    assert(sv.getString(0) === "1")
    assert(sv.getString(1).startsWith("utf8"))
    // test_mysql_queries: SHOW KEYS answers (rows only for bucketed layouts)
    assert(c.execute("SHOW KEYS FROM region").count() === 0)
    c.execute("CREATE TABLE keyed_t CLUSTERED BY (r_regionkey) INTO 4 BUCKETS AS SELECT * FROM region")
    val keys = c.execute("SHOW INDEX FROM keyed_t").collect()
    assert(keys.length === 1 && keys(0).getString(4) === "r_regionkey")
    c.execute("DROP TABLE keyed_t")
    c.execute("SHOW FULL TABLES FROM files")
    c.execute("SHOW FULL COLUMNS FROM region")
  }

  test("tenant isolation: same-named objects under two tenants never cross-resolve") {
    // the reference threads company_id through every controller
    // (test_company_independent.py); here each tenant owns a
    // catalog/warehouse/jobs triple and the meta-table providers rebind
    // per statement, so two sessions interleaved on ONE thread stay apart
    val tenants = new graft.catalog.Tenants(spark, dir,
      graft.catalog.Tenants.State(new Catalog(spark, dir),
        Warehouse.temp(spark), new graft.incremental.Jobs))
    val a = tenants.of("acme")
    val b = tenants.of("globex")
    val ca = new Commands(spark, a.catalog, a.warehouse, a.jobs)
    val cb = new Commands(spark, b.catalog, b.warehouse, b.jobs)
    // same-named warehouse table, different content per tenant
    ca.execute("CREATE TABLE ten_t AS SELECT * FROM region")
    // before B creates its own, A's table must NOT leak into B
    intercept[Exception] { cb.execute("SELECT * FROM ten_t").collect() }
    cb.execute("CREATE TABLE ten_t AS SELECT * FROM nation")
    assert(ca.execute("SELECT COUNT(*) AS n FROM ten_t").first().getLong(0) === 5)
    assert(cb.execute("SELECT COUNT(*) AS n FROM ten_t").first().getLong(0) === 25)
    // same-named agents with different models; meta-tables interleave
    // correctly on one thread (the execute-time provider rebind)
    ca.execute("CREATE AGENT ten_agent USING model='model_a'")
    cb.execute("CREATE AGENT ten_agent USING model='model_b'")
    assert(ca.execute("SELECT model_name FROM mindsdb.agents WHERE name='ten_agent'")
      .first().getString(0) === "model_a")
    assert(cb.execute("SELECT model_name FROM mindsdb.agents WHERE name='ten_agent'")
      .first().getString(0) === "model_b")
    // databases + jobs are tenant-scoped too
    ca.execute("CREATE DATABASE ten_db WITH ENGINE='mem'")
    assert(cb.execute("SELECT name FROM mindsdb.databases WHERE name='ten_db'")
      .count() === 0)
    ca.execute("CREATE JOB ten_job AS (SELECT 1) EVERY 1 day")
    assert(cb.execute("SHOW JOBS").collect().map(_.getString(0)).toSeq
      .forall(_ != "ten_job"))
    // the default tenant sees none of either
    val cd = new Commands(spark, tenants.default.catalog,
      tenants.default.warehouse, tenants.default.jobs)
    assert(cd.execute("SELECT COUNT(*) AS n FROM mindsdb.agents WHERE name='ten_agent'")
      .first().getLong(0) === 0)
    intercept[Exception] { cd.execute("SELECT * FROM ten_t").collect() }
  }

  test("handshake functions nested inside expressions rewrite to bare literals") {
    val c = fresh()
    // ADVICE r11: `upper(version())` must stay parseable — the AS alias
    // only applies when the call IS the whole select item
    assert(c.execute("SELECT upper(version())").first().getString(0)
      === "8.0.17-GRAFT")
    assert(c.execute("SELECT concat(database(), '/', version()) AS loc").first()
      .getString(0) === "graft/8.0.17-graft")
    // mixed list: one bare item keeps its canonical alias, the nested
    // occurrence inlines
    val r = c.execute("SELECT version(), upper(database()) AS up").first()
    assert(r.getString(0) === "8.0.17-graft" && r.getString(1) === "GRAFT")
    // user-aliased bare calls keep Spark's own function (pre-r12 contract)
    assert(c.execute("SELECT version() AS sv").first().getString(0)
      !== "8.0.17-graft")
  }

  test("CREATE JOB ... IF (query): the gate must return rows for the body to run") {
    val c = fresh()
    c.execute("CREATE TABLE ifjob_t AS SELECT id FROM range(0, 1)")
    c.execute("""CREATE JOB gated AS (INSERT INTO ifjob_t VALUES (99))
      EVERY 1 day IF (SELECT * FROM ifjob_t WHERE id = 12345)""")
    // gate empty → skipped (history records the skip, body not run)
    c.jobs.tick(java.time.Instant.now())
    assert(c.execute("SELECT COUNT(*) AS n FROM ifjob_t WHERE id = 99")
      .first().getLong(0) === 0)
    // make the gate pass → next due tick runs the body
    c.execute("INSERT INTO ifjob_t VALUES (12345)")
    c.jobs.tick(java.time.Instant.now().plusSeconds(90000))
    assert(c.execute("SELECT COUNT(*) AS n FROM ifjob_t WHERE id = 99")
      .first().getLong(0) === 1)
    c.execute("DROP JOB gated")
    c.execute("DROP TABLE ifjob_t")
  }

  test("tableau-header query shapes: backticked space aliases + global HAVING over a model join") {
    // reference test_predictor_tableau_header / _alias: BI tools emit
    // subqueries aliased with backticked names containing spaces, and a
    // HAVING with no GROUP BY over the aggregate
    val c = fresh()
    c.execute("""CREATE MODEL tab_model FROM
      (SELECT l_quantity, l_extendedprice FROM lineitem)
      PREDICT l_extendedprice USING features='l_quantity', score_column='p'""")
    val r = c.execute("""
      SELECT
        SUM(1) AS `cnt__0B4A4E8BD11C48FF_ok`,
        sum(`Custom SQL Query`.`l_quantity`) AS `sum_height_ok`,
        max(`Custom SQL Query`.`p`) AS `sum_length1_ok`
      FROM (
        SELECT l_quantity, p
        FROM (SELECT l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3) source
        JOIN tab_model AS res
      ) `Custom SQL Query`
      HAVING (COUNT(1) > 0)""").first()
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(2) > 0.0, "max prediction must come from the model join")
    // alias variant: the same source column under two aliases
    val r2 = c.execute("""
      SELECT max(a1) AS a1, min(a2) AS a2
      FROM (
        SELECT l_quantity AS a1, l_quantity AS a2
        FROM (SELECT l_quantity FROM lineitem LIMIT 5) source
        JOIN tab_model AS res
      ) t1
      HAVING (COUNT(1) > 0)""").first()
    assert(r2.getDouble(0) >= r2.getDouble(1))
    c.execute("DROP MODEL tab_model")
  }

  test("pgvector operators rewrite to native distances; <=> keeps null-safe equality") {
    val c = fresh()
    // operator sugar over vector literals and parenthesized expressions
    val r = c.execute(
      """SELECT ROUND('[3.0,0.0]' <-> '[0.0,4.0]', 4) AS l2,
         ROUND('[1.0,2.0]' <#> '[3.0,4.0]', 4) AS nip,
         ROUND('[1.0,0.0]' <=> '[0.0,1.0]', 4) AS cos_d""").first()
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === -11.0)
    assert(r.getDouble(2) === 1.0)
    // <=> with non-vector operands must stay SQL null-safe equality
    val eq = c.execute(
      "SELECT 1 <=> 1 AS a, NULL <=> NULL AS b, 1 <=> NULL AS c").first()
    assert(eq.getBoolean(0) === true)
    assert(eq.getBoolean(1) === true)
    assert(eq.getBoolean(2) === false)
    // column operands against a literal, through a real table scan
    val top = c.execute(
      """SELECT vec_id FROM embeddings
         ORDER BY CAST(embedding AS ARRAY<DOUBLE>) <-> '[0.0]' LIMIT 3""")
    assert(top.count() === 3)
  }

  test("object names are case-insensitive across kinds (reference lowercases identifiers)") {
    val c = fresh()
    // view: created MixedCase, read lowercase, dropped UPPER
    c.execute("CREATE VIEW BigOrders AS SELECT * FROM orders WHERE o_totalprice > 100000")
    assert(c.execute("SELECT count(*) AS n FROM bigorders").first().getLong(0) > 0)
    assert(c.catalog.listViews() === Seq("bigorders"),
      "listing must report the canonical lowercase name")
    c.execute("DROP VIEW BIGORDERS")
    assert(c.catalog.listViews().isEmpty)
    // warehouse table: CTAS MixedCase, INSERT lowercase, SELECT UPPER
    c.execute("CREATE TABLE CaseTbl AS SELECT 1 AS a")
    c.execute("INSERT INTO casetbl VALUES (2)")
    assert(c.execute("SELECT count(*) AS n FROM CASETBL").first().getLong(0) === 2L)
    c.execute("DROP TABLE CaseTbl")
    // database + ml_engine + job round-trip through different cases
    c.execute("CREATE DATABASE CaseDb WITH ENGINE='mem'")
    assert(c.catalog.listDatabases().contains("casedb"))
    c.execute("DROP DATABASE CASEDB")
    c.execute("CREATE JOB CaseJob AS (SELECT 1) EVERY 1 hour")
    c.execute("DROP JOB casejob")
  }

  test("CREATE VIEW with ambiguous output columns is refused at CREATE") {
    val c = fresh()
    val e = intercept[IllegalArgumentException] {
      c.execute("""CREATE VIEW dup_v AS
        SELECT * FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey,
          LATERAL (SELECT n.n_name AS r_name) x""")
    }
    assert(e.getMessage.contains("duplicated column"))
    assert(c.catalog.listViews().isEmpty, "the refused view must not register")
  }

  test("model join honors USING partition_size=N (batched prediction)") {
    val c = fresh()
    c.execute("""CREATE MODEL ps_model FROM
      (SELECT l_quantity, l_extendedprice FROM lineitem)
      PREDICT l_extendedprice USING features='l_quantity', score_column='pred'""")
    c.execute("CREATE TABLE ps_grid AS SELECT CAST(id AS DOUBLE) AS l_quantity FROM range(0, 6)")
    val out = c.execute(
      "SELECT l_quantity, pred FROM ps_grid JOIN ps_model USING partition_size=2")
    assert(out.count() === 6, "all rows must survive batching")
    assert(out.rdd.getNumPartitions === 3, "6 rows / batch 2 = 3 partitions")
  }

  test("SHOW PROCESSLIST reports the statement log incl. the running statement") {
    val c = fresh()
    c.execute("SELECT count(*) AS n FROM region")
    val pl = c.execute("SHOW FULL PROCESSLIST").collect()
    assert(pl.length >= 2, "expects at least the SELECT and the SHOW itself")
    assert(pl.exists(r => r.getString(4) == "SELECT" && r.getString(6) == "ok"))
    // the SHOW statement itself is in-flight while it answers
    assert(pl.exists(r => r.getString(4) == "SHOW" && r.getString(6) == "running"))
  }

  test("KB column-list VALUES insert: id/content map, extras become searchable metadata") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kbcols")
    c.execute("INSERT INTO kbcols (id, content, col1) VALUES " +
      "(1, 'alpha beta gamma', 'val1'), (2, 'delta epsilon zeta', 'val2')")
    val hit = c.execute("SELECT * FROM kbcols WHERE col1 = 'val1'")
    assert(hit.count() === 1)
    assert(hit.first().getAs[String]("content").startsWith("alpha"))
    assert(c.execute("SELECT * FROM kbcols WHERE col1 = 'nope'").count() === 0)
    // unknown metadata column errors loudly (reference raises ValueError)
    intercept[Exception] {
      c.execute("SELECT * FROM kbcols WHERE col9 = 'x'").collect()
    }
  }

  test("KB insert without id derives the reference's deterministic md5-16 doc id") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kbnoid")
    c.execute("INSERT INTO kbnoid (content) VALUES ('stable content here')")
    c.execute("INSERT INTO kbnoid (content) VALUES ('stable content here')")
    val ids = c.execute("SELECT * FROM kbnoid WHERE content LIKE '%stable%'")
      .select("doc_id").collect().map(_.getString(0)).distinct
    // same content → same generated id (generate_document_id: md5[:16])
    assert(ids.length === 1 && ids.head.length === 16)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("stable content here".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(ids.head === md)
  }

  test("DESCRIBE KNOWLEDGE_BASE and DESCRIBE AGENT report params and stats") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kdesc USING content_columns='text'")
    c.execute("INSERT INTO kdesc (id, content) VALUES (1, 'hello world')")
    val kb = c.execute("DESCRIBE KNOWLEDGE_BASE kdesc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kb("name") === "kdesc" && kb("storage_table") === "__kb_kdesc")
    assert(kb("n_chunks").toLong >= 1L)
    c.execute("CREATE AGENT adesc USING model='default', mode='rag'")
    val ag = c.execute("DESCRIBE AGENT adesc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ag("name") === "adesc" && ag("model") === "default" && ag("mode") === "rag")
  }

  test("KB joins a table; id operators =, !=, IN, NOT IN work (reference test_join_kb_table)") {
    val c = fresh()
    c.execute("CREATE TABLE ral_t AS SELECT * FROM VALUES " +
      "(1000, 'green beige', 'beige verdastro'), (1004, 'golden yellow', 'giallo oro'), " +
      "(9016, 'traffic white', 'bianco traffico'), (9023, 'perl dark grey', 'grigio scuro perla') " +
      "AS t(ral, english, italian)")
    c.execute("CREATE KNOWLEDGE BASE kb_ral")
    c.execute("INSERT INTO kb_ral SELECT ral AS id, english AS content FROM ral_t")
    // KB ⋈ table with the search condition in the outer WHERE
    val j = c.execute("""SELECT t.italian, k.id, t.ral FROM kb_ral k
      JOIN ral_t t ON t.ral = k.id
      WHERE k.content = 'white' LIMIT 2""").collect()
    assert(j.length === 2)
    assert(j.forall(r =>
      r.get(1).asInstanceOf[Number].longValue === r.get(2).asInstanceOf[Number].longValue),
      "joined ids must match the table's keys")
    // id operators route as metadata conditions with the public name
    assert(c.execute("SELECT * FROM kb_ral WHERE id = '1000'").count() === 1)
    assert(c.execute("SELECT * FROM kb_ral WHERE id != '1000'").count() === 3)
    assert(c.execute("SELECT * FROM kb_ral WHERE id IN ('1000', '1004')").count() === 2)
    assert(c.execute("SELECT * FROM kb_ral WHERE id NOT IN ('1000', '1004')").count() === 2)
  }

  test("native-FROM route never hijacks Catalyst table-valued or derived-table FROMs") {
    val c = fresh()
    // `range(10)` is a TVF, not a database — must reach Catalyst
    assert(c.execute("SELECT count(*) AS n FROM range(10)").first().getLong(0) === 10L)
    // derived table with column aliases
    assert(c.execute("SELECT a FROM (VALUES (7)) AS t(a)").first().getInt(0) === 7)
    // a registered database named like a function still routes native SQL
    c.execute("CREATE DATABASE memnat ENGINE 'mem'")
    val msgSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    graft.federation.MemTables.register("memnat_t", msgSchema,
      Seq(org.apache.spark.sql.Row(1L), org.apache.spark.sql.Row(2L)))
    val out = c.execute(
      "SELECT s AS total FROM memnat (SELECT SUM(v) AS s FROM memnat_t)")
    assert(out.first().getLong(0) === 3L)
  }

  test("multi-assignment SET routes each part; quoted commas stay whole") {
    val c = fresh()
    c.execute("SET @@autocommit = ON, SESSION sql_select_limit = 5, @u = 'a,b'")
    assert(c.execute("SELECT @@autocommit AS v").first().getString(0) === "ON")
    assert(c.execute("SELECT @@sql_select_limit AS v").first().getString(0) === "5")
    assert(c.execute("SELECT @u AS v").first().getString(0) === "a,b")
  }

  test("CREATE VIEW / query through it / DROP VIEW") {
    val c = fresh()
    c.execute("CREATE VIEW big_orders AS SELECT * FROM orders WHERE o_totalprice > 100000")
    val n = c.execute("SELECT count(*) AS n FROM big_orders").first().getLong(0)
    val direct = c.execute(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > 100000").first().getLong(0)
    assert(n === direct && n > 0)
    c.execute("DROP VIEW big_orders")
    assert(c.catalog.listViews().isEmpty)
  }

  test("views shadow base tables in SQL resolution") {
    val c = fresh()
    c.execute("CREATE VIEW region AS SELECT * FROM region WHERE r_regionkey < 2")
    // note: view body captured the base table before shadowing
    assert(c.execute("SELECT count(*) AS n FROM region").first().getLong(0) === 2)
  }

  test("MERGE INTO upserts; partitioned target keeps its layout") {
    val c = fresh()
    c.execute("""CREATE TABLE mrg PARTITIONED BY (o_orderstatus) AS
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey <= 20""")
    c.execute("""MERGE INTO mrg t USING (
        SELECT o_orderkey, o_totalprice + 5.00 AS o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey BETWEEN 11 AND 30) s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
      WHEN NOT MATCHED THEN INSERT *""")
    val out = c.execute("SELECT count(*) AS n FROM mrg").first().getLong(0)
    assert(out === 31) // keys 0..30
    // matched rows took the source value, untouched rows kept theirs
    val base = c.execute(
      """SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s FROM orders
         WHERE o_orderkey <= 30""").first().getDecimal(0)
    val merged = c.execute(
      "SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s FROM mrg")
      .first().getDecimal(0)
    assert(merged.subtract(base) === new java.math.BigDecimal("100.00")) // 20 rows x 5.00
    // the hive partition layout survived the copy-on-write merge
    val whDir = c.warehouse.dir
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$whDir/mrg"))
      .toArray.map(_.toString)
    assert(dirs.exists(_.contains("o_orderstatus=")), s"lost partition layout: ${dirs.toSeq}")
    // idempotence: re-running the same MERGE only re-applies the update
    c.execute("""MERGE INTO mrg t USING (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey BETWEEN 11 AND 30) s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
      WHEN NOT MATCHED THEN INSERT *""")
    assert(c.execute("SELECT count(*) AS n FROM mrg").first().getLong(0) === 31)
  }

  test("CREATE MODEL registers a scorer; SHOW MODELS lists it") {
    val c = fresh()
    c.execute("""CREATE MODEL scorer PREDICT score USING
      features='l_quantity,l_discount', weights='0.1,2.0', bias=1.0""")
    assert(c.catalog.listModels() === Seq("scorer"))
    assert(c.execute("SHOW MODELS").collect().map(_.getString(0)).toSeq === Seq("scorer"))
    val m = c.catalog.model("scorer")
    assert(m.featureCols === Seq("l_quantity", "l_discount"))
  }

  test("CREATE JOB parses schedule and runs on tick") {
    val c = fresh()
    c.execute("CREATE JOB countr AS (SELECT count(*) FROM region) EVERY 1 hour")
    val ran = c.jobs.tick(java.time.Instant.now())
    assert(ran.size === 1 && ran.head.ok)
    c.execute("DROP JOB countr")
    assert(c.jobs.list().isEmpty)
    intercept[IllegalArgumentException] {
      c.execute("CREATE JOB bad AS (SELECT 1) EVERY 3 eons")
    }
  }

  test("multi-statement scripts split quote-aware and run in order") {
    val c = fresh()
    val last = c.executeScript(
      """CREATE TABLE t1 AS SELECT * FROM region WHERE r_name <> 'A;B';
         CREATE VIEW v1 AS SELECT r_regionkey FROM t1;
         SELECT count(*) AS n FROM v1""")
    assert(last.first().getLong(0) === 5)
    assert(c.warehouse.exists("t1") && c.catalog.listViews() === Seq("v1"))
    // quoted semicolon must not split
    assert(c.splitStatements("SELECT ';' AS x; SELECT 1").size === 2)
    // neither must separators nested inside parens
    assert(c.splitStatements("SELECT concat('a', 'b'); SELECT 2").size === 2)
  }

  test("UPDATE assignments keep commas inside function calls whole") {
    val c = fresh()
    c.execute("CREATE TABLE upd_t AS SELECT r_regionkey, r_name FROM region")
    c.execute("UPDATE upd_t SET r_name = concat(r_name, ',', 'x') WHERE r_regionkey = 0")
    assert(c.execute("SELECT r_name FROM upd_t WHERE r_regionkey = 0")
      .first().getString(0).endsWith(",x"))
  }

  test("EXPLAIN / SET / USE dispatch") {
    val c = fresh()
    val ex = c.execute("EXPLAIN SELECT count(*) FROM region").first()
    assert(ex.getString(0).contains("Aggregate") && ex.getString(1).nonEmpty)
    c.execute("SET spark.sql.cbo.enabled = 'false'")
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false")
    // restore: later tests assert rowCount-bearing plan statistics,
    // which LogicalRelation only reports while CBO is on
    c.execute("SET spark.sql.cbo.enabled = 'true'")
    assert(c.execute("USE graft").first().getString(0) === "ok")
  }

  test("PREPARE / EXECUTE USING / DEALLOCATE lifecycle") {
    val c = fresh()
    c.execute("PREPARE topord FROM 'SELECT count(*) AS n FROM orders WHERE o_totalprice > ? AND o_orderstatus = ?'")
    val n = c.execute("EXECUTE topord USING 100000, 'O'").first().getLong(0)
    val direct = c.execute(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > 100000 AND o_orderstatus = 'O'")
      .first().getLong(0)
    assert(n === direct && n > 0)
    // re-execution with different params rebinds
    val n2 = c.execute("EXECUTE topord USING 200000, 'F'").first().getLong(0)
    assert(n2 !== n)
    // re-prepare replaces; deallocate removes
    c.execute("PREPARE topord FROM 'SELECT 1 AS one'")
    assert(c.execute("EXECUTE topord").first().getInt(0) === 1)
    c.execute("DEALLOCATE PREPARE topord")
    intercept[NoSuchElementException] { c.execute("EXECUTE topord") }
  }

  test("parameterized queries bind named params server-side") {
    val c = fresh()
    val n = c.execute(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > :minp AND o_orderstatus = :st",
      Map("minp" -> 100000, "st" -> "O")).first().getLong(0)
    val direct = c.execute(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > 100000 AND o_orderstatus = 'O'")
      .first().getLong(0)
    assert(n === direct && n > 0)
  }

  test("KB DDL round-trip: create, ingest via INSERT, query, drop") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kbx USING content_columns='text'")
    assert(c.catalog.listKbs() === Seq("kbx"))
    c.execute("INSERT INTO kbx SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 20")
    val hits = c.execute("SELECT * FROM kbx WHERE content = 'table scan filter' LIMIT 5")
    assert(hits.columns.toSeq === Seq("chunk_id", "doc_id", "content", "distance", "relevance"))
    assert(hits.count() === 5)
    // the KB is also queryable as a plain chunk table
    assert(c.execute("SELECT count(*) AS n FROM kbx").first().getLong(0) > 0)
    c.execute("DROP KNOWLEDGE BASE kbx")
    assert(c.catalog.listKbs().isEmpty && !c.warehouse.exists("__kb_kbx"))
    intercept[NoSuchElementException] { c.execute("DROP KNOWLEDGE BASE kbx") }
    c.execute("DROP KNOWLEDGE BASE IF EXISTS kbx") // tolerated
  }

  test("EVALUATE KNOWLEDGE_BASE routes to Kb.evaluate") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kbe USING content_columns='text'")
    c.execute("INSERT INTO kbe SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 30")
    c.execute("""CREATE TABLE testset AS SELECT doc_id AS query_id,
      substring(text, 1, 60) AS query_text, doc_id AS gold_doc_id
      FROM documents WHERE doc_id < 5""")
    val ev = c.execute("EVALUATE KNOWLEDGE_BASE kbe USING test_table=testset, k=5")
    assert(ev.columns.toSeq === Seq("query_id", "n_rel", "hit1", "hit5", "ndcg5"))
    assert(ev.count() === 5)
  }

  test("AGENT DDL round-trip; SHOW AGENTS uses the meta schema") {
    val c = fresh()
    c.execute("CREATE AGENT ag USING model='m1', temperature='0'")
    assert(c.execute("SHOW AGENTS").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("ag", "m1")))
    c.execute("UPDATE AGENT ag USING model='m2'")
    assert(c.catalog.agent("ag").get.model === "m2")
    c.execute("DROP AGENT ag")
    assert(c.catalog.listAgents().isEmpty)
    intercept[IllegalArgumentException] { c.execute("DROP AGENT ag") }
  }

  test("uploaded byom engine: CREATE MODEL trains and predicts through forked workers") {
    val c = fresh()
    // the engine an HTTP upload registers (handler byom, code as params)
    c.execute("CREATE ML_ENGINE up_eng FROM byom USING code='def predict...', modules='numpy'")
    c.execute("""CREATE MODEL bm FROM (SELECT l_quantity, l_extendedprice FROM lineitem)
      PREDICT l_extendedprice USING engine='up_eng', features='l_quantity', score_column='p'""")
    val r = c.execute("""SELECT l_quantity, p FROM
      (SELECT l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3) t JOIN bm m""")
      .collect()
    assert(r.length === 3)
    // OLS through the worker returns finite predictions on real features
    assert(r.forall(row => !row.isNullAt(1) && !row.getDouble(1).isNaN))
    // RETRAIN re-runs the stored worker trainer
    c.execute("RETRAIN bm")
    c.execute("DROP MODEL bm")
    c.execute("DROP ML_ENGINE up_eng")
  }

  test("SHOW TABLES FROM scopes virtual namespaces and errors on unknown dbs") {
    val c = fresh()
    // unknown database: MySQL/the reference datanode route both error —
    // never the global listing
    val e = intercept[Exception](
      c.execute("SHOW TABLES FROM no_such_db_xyz").collect())
    assert(e.getMessage.toLowerCase.contains("unknown database"))
    // log: the reference's two system log tables (log.py:85,148)
    assert(c.execute("SHOW TABLES FROM log").collect().map(_.getString(0)).toSeq
      === Seq("jobs_history", "llm_log"))
    // files: the upload-storage area, empty on a fresh warehouse —
    // crucially NOT the global table list
    assert(c.execute("SHOW TABLES FROM files").collect().isEmpty)
    // the default project keeps the global listing
    assert(c.execute("SHOW TABLES FROM graft").collect().nonEmpty)
    // log/files surface in SHOW DATABASES like the reference's
    // always-present entries (database.py:54-63)
    val dbs = c.execute("SHOW DATABASES").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(dbs("log") === "system" && dbs("files") === "data")
  }

  test("DATABASE DDL round-trip; SHOW DATABASES uses the meta schema") {
    val c = fresh()
    c.execute("CREATE DATABASE pgx WITH ENGINE 'pg', PARAMETERS = host='h', port='5432'")
    val rows = c.execute("SHOW DATABASES").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.contains(("pgx", "pg", "data")))
    assert(rows.contains(("graft", "graft", "project")))
    assert(rows.contains(("information_schema", "information_schema", "system")))
    c.execute("DROP DATABASE pgx")
    assert(!c.execute("SHOW DATABASES").collect().map(_.getString(0)).contains("pgx"))
  }

  test("RETRAIN / FINETUNE bump and activate model versions") {
    val c = fresh()
    c.execute("""CREATE MODEL fitm FROM
      (SELECT l_quantity, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 0)
      PREDICT l_extendedprice USING features='l_quantity', score_column='pred'""")
    assert(c.catalog.activeVersion("fitm") === 1)
    c.execute("RETRAIN fitm")
    assert(c.catalog.activeVersion("fitm") === 2)
    assert(c.catalog.modelVersions("fitm") === Seq(1, 2))
    // static data → retrain reproduces the same coefficients
    val v1 = c.catalog.model("fitm", 1).asInstanceOf[graft.ml.LinearModel]
    val v2 = c.catalog.model("fitm", 2).asInstanceOf[graft.ml.LinearModel]
    assert(v1.weights === v2.weights && v1.bias === v2.bias)
    c.execute("""FINETUNE fitm FROM
      (SELECT l_quantity, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 1)""")
    assert(c.catalog.activeVersion("fitm") === 3)
    // exact incremental learning: finetune(half1, half2) == fit(full)
    val full = graft.ml.Fit.fit("ref",
      c.execute("SELECT l_quantity, l_extendedprice FROM lineitem"),
      graft.ml.Fit.FitSpec(Seq("l_quantity"), "l_extendedprice", "pred"))._1
    val v3 = c.catalog.model("fitm").asInstanceOf[graft.ml.LinearModel]
    assert(v3.weights === full.weights && v3.bias === full.bias)
    // older versions stay addressable and re-activatable
    c.catalog.setActiveVersion("fitm", 1)
    assert(c.catalog.model("fitm") === v1)
    // SHOW MODELS lists every version with the active flag on 1
    val vers = c.execute("SHOW MODELS").collect()
      .map(r => (r.getInt(1), r.getBoolean(2))).toSeq
    assert(vers === Seq((1, true), (2, false), (3, false)))
    // a `.N` suffix in a model JOIN addresses that stored version
    val viaV3 = c.execute(
      "SELECT pred FROM (SELECT * FROM lineitem WHERE l_orderkey = 1) JOIN fitm.3 LIMIT 1")
      .first().getDouble(0)
    val viaActive = c.execute(
      "SELECT pred FROM (SELECT * FROM lineitem WHERE l_orderkey = 1) JOIN fitm.1 LIMIT 1")
      .first().getDouble(0)
    assert(viaV3 != viaActive || v1.weights == v3.weights)
  }

  test("SELECT FROM model/agent with WHERE literals routes to row predict / completion") {
    val c = fresh()
    c.execute("""CREATE MODEL scorer2 PREDICT score USING
      features='l_quantity,l_discount', weights='0.1,2.0', bias=1.0""")
    val r = c.execute(
      "SELECT score FROM scorer2 WHERE l_quantity = 30 AND l_discount = 0.1").first()
    assert(math.abs(r.getDouble(0) - (1.0 + 0.1 * 30 + 2.0 * 0.1)) < 1e-9)
    c.execute("CREATE AGENT helper USING model='scorer2'")
    val a = c.execute(
      "SELECT answer FROM helper WHERE question = 'what is spark'").first()
    assert(a.getString(0).startsWith("LLM[") && a.getString(0).contains("WHAT IS SPARK"))
    // a plain table named neither kb/model/agent still routes to spark.sql
    assert(c.execute("SELECT count(*) AS n FROM region WHERE r_regionkey < 2")
      .first().getLong(0) === 2)
  }

  test("information_schema namespace resolves through SQL") {
    val c = fresh()
    c.execute("CREATE TABLE wtx AS SELECT * FROM region")
    val tbl = c.execute(
      "SELECT table_name FROM information_schema.tables WHERE table_type = 'BASE TABLE'")
      .collect().map(_.getString(0))
    assert(tbl.contains("wtx") && tbl.contains("lineitem"))
    val cols = c.execute(
      "SELECT column_name FROM information_schema.columns WHERE table_name = 'wtx' ORDER BY ordinal_position")
      .collect().map(_.getString(0)).toSeq
    assert(cols === Seq("r_regionkey", "r_name"))
    assert(c.execute("SELECT * FROM information_schema.schemata").count() >= 2)
    assert(c.execute("SELECT * FROM information_schema.statistics").count() === 0)
    assert(c.execute("SELECT * FROM information_schema.key_column_usage").count() === 0)
  }

  test("SQL still runs after fireTrigger (checkpoint dir is not a table)") {
    val c = fresh()
    c.execute("CREATE TABLE evts AS SELECT * FROM region")
    c.execute("CREATE TRIGGER trg ON evts (CREATE TABLE delta_copy AS SELECT * FROM TABLE_DELTA)")
    c.fireTrigger("trg")
    // the trigger's own SQL saw TABLE_DELTA and ran …
    assert(c.warehouse.exists("delta_copy"))
    assert(c.execute("SELECT count(*) AS n FROM delta_copy").first().getLong(0) === 5)
    // … and the namespace stays fully queryable afterwards (the streaming
    // checkpoint must not surface as a warehouse table)
    assert(c.execute("SELECT count(*) AS n FROM region").first().getLong(0) === 5)
    assert(!c.warehouse.listTables().exists(_.startsWith(".")))
  }

  test("SHOW ... LIKE treats regex metacharacters literally") {
    val c = fresh()
    c.execute("CREATE TABLE like_t1 AS SELECT * FROM region")
    // '.' is a literal dot, not any-char — must NOT match like_t1
    assert(c.execute("SHOW TABLES LIKE 'like.t1'").count() === 0)
    assert(c.execute("SHOW TABLES LIKE 'like_t1'").count() === 1) // _ wildcard
    assert(c.execute("SHOW TABLES LIKE 'like%'").collect().map(_.getString(0)).toSeq
      === Seq("like_t1"))
    // unbalanced metachars would throw PatternSyntaxException if unquoted
    assert(c.execute("SHOW TABLES LIKE '(+'").count() === 0)
  }

  test("view over a warehouse table reflects UPDATE/DELETE (no stale snapshot)") {
    val c = fresh()
    c.execute("CREATE TABLE ords AS SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 200")
    c.execute("CREATE VIEW pricey AS SELECT * FROM ords WHERE o_totalprice > 0")
    assert(c.execute("SELECT count(*) AS n FROM pricey").first().getLong(0) > 0)
    // copy-on-write rewrite replaces the table directory entirely — the
    // view must re-resolve, not hold the old snapshot's file listing
    c.execute("UPDATE ords SET o_totalprice = -1.0 WHERE o_orderkey < 1000000")
    assert(c.execute("SELECT count(*) AS n FROM pricey").first().getLong(0) === 0)
    c.execute("DELETE FROM ords WHERE o_totalprice < 0")
    assert(c.execute("SELECT count(*) AS n FROM ords").first().getLong(0) === 0)
  }

  test("ANALYZE TABLE: exact null/distinct/min-max stats; re-analyze overwrites") {
    val c = fresh()
    c.execute("""CREATE TABLE at_t AS
      SELECT * FROM (VALUES (1, 'a'), (2, CAST(NULL AS STRING)), (2, 'b')) AS t(x, y)""")
    val st = c.execute("ANALYZE TABLE at_t").collect()
      .map(r => r.getString(1) -> r).toMap
    val x = st("x"); val y = st("y")
    assert((x.getLong(3), x.getLong(4), x.getLong(5), x.getString(6), x.getString(7))
      === ((3L, 0L, 2L, "1", "2")))
    assert((y.getLong(3), y.getLong(4), y.getLong(5), y.getString(6), y.getString(7))
      === ((3L, 1L, 2L, "a", "b")))
    // stats are queryable through the information_schema namespace
    assert(c.execute("""SELECT count(*) AS n FROM information_schema.column_statistics
      WHERE table_name = 'at_t'""").first().getLong(0) === 2)
    // re-analyze after a write reflects the new state (no stale rows)
    c.execute("INSERT INTO at_t SELECT * FROM (VALUES (9, 'z')) AS t(x, y)")
    val st2 = c.execute("ANALYZE TABLE at_t").collect()
      .map(r => r.getString(1) -> r).toMap
    assert(st2("x").getLong(3) === 4L && st2("x").getString(7) === "9")
  }

  test("CBO staleness: DML refreshes ANALYZE stats so a grown table stops broadcasting") {
    val c = fresh()
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val cbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      c.execute("CREATE TABLE stale_t AS SELECT o_orderkey FROM orders WHERE o_orderkey <= 40")
      c.execute("ANALYZE TABLE stale_t")
      def q = c.execute(
        "SELECT count(*) AS n FROM lineitem JOIN stale_t ON l_orderkey = o_orderkey")
      val small = c.execute("SELECT * FROM stale_t").queryExecution.optimizedPlan.stats
      assert(small.rowCount.exists(_ <= 50), s"ANALYZE rowCount missing: $small")
      assert(q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "tiny ANALYZEd table should broadcast")
      // the table grows ~600x under INSERT — withOUT re-ANALYZE the old
      // rowCount would keep the broadcast; the mutation listener refreshes
      // it to the exact footer count and drops the stale column stats
      c.execute("INSERT INTO stale_t SELECT o_orderkey FROM orders")
      val grown = c.execute("SELECT * FROM stale_t").queryExecution.optimizedPlan.stats
      val realN = c.execute("SELECT count(*) AS n FROM stale_t").first().getLong(0)
      assert(grown.rowCount.contains(BigInt(realN)),
        s"stats not refreshed after INSERT: $grown (real $realN)")
      assert(!q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "grown table must no longer broadcast on stale stats")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      spark.conf.set("spark.sql.cbo.enabled", cbo)
    }
  }

  test("CTAS into warehouse + SHOW TABLES + DESCRIBE + DROP TABLE") {
    val c = fresh()
    c.execute("CREATE TABLE top_r AS SELECT * FROM region WHERE r_regionkey < 3")
    assert(c.execute("SELECT count(*) AS n FROM top_r").first().getLong(0) === 3)
    val tables = c.execute("SHOW TABLES").collect().map(_.getString(0))
    assert(tables.contains("top_r") && tables.contains("lineitem"))
    assert(c.execute("DESCRIBE region").collect().map(_.getString(1)).toSeq
      === Seq("r_regionkey", "r_name"))
    c.execute("DROP TABLE top_r")
    assert(!c.warehouse.exists("top_r"))
  }

  test("transactions are accepted no-ops; statements still run between them") {
    val c = fresh()
    c.execute("START TRANSACTION")
    c.execute("CREATE TABLE tx_t AS SELECT * FROM region")
    c.execute("COMMIT")
    c.execute("BEGIN")
    assert(c.execute("SELECT count(*) AS n FROM tx_t").first().getLong(0) === 5)
    c.execute("ROLLBACK")
    // no transactional storage: the write persists regardless (reference
    // behavior — its transaction commands are wire-compat no-ops too)
    assert(c.warehouse.exists("tx_t"))
  }

  test("CHATBOT lifecycle: create requires database, update patches, drop removes") {
    val c = fresh()
    intercept[IllegalArgumentException] {
      c.execute("CREATE CHATBOT cb USING database='nope', agent='a1'")
    }
    c.execute("CREATE DATABASE chatdb ENGINE 'pg'")
    c.execute("CREATE AGENT a1 USING model='m'")
    c.execute("CREATE CHATBOT cb USING database='chatdb', agent='a1'")
    val row = c.execute("SHOW CHATBOTS").first()
    assert(row.getString(0) === "cb" && row.getString(1) === "chatdb"
      && row.getString(3) === "a1" && row.getBoolean(4))
    c.execute("UPDATE CHATBOT cb SET model='m2', is_running='false'")
    val row2 = c.execute("SHOW CHATBOTS").first()
    assert(row2.getString(2) === "m2" && !row2.getBoolean(4))
    c.execute("DROP CHATBOT cb")
    assert(c.execute("SHOW CHATBOTS").count() === 0)
    intercept[NoSuchElementException] { c.execute("DROP CHATBOT cb") }
  }

  test("ML_ENGINE lifecycle with IF NOT EXISTS") {
    val c = fresh()
    c.execute("CREATE ML_ENGINE eng1 FROM fit USING task='regression'")
    assert(c.execute("SHOW ML_ENGINES").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSeq
      === Seq(("eng1", "fit", "task=regression")))
    intercept[IllegalStateException] { c.execute("CREATE ML_ENGINE eng1 FROM fit") }
    c.execute("CREATE ML_ENGINE IF NOT EXISTS eng1 FROM fit")
    c.execute("DROP ML_ENGINE eng1")
    assert(c.execute("SHOW ML_ENGINES").count() === 0)
  }

  test("ALTER VIEW redefines; ALTER DATABASE / ALTER KB merge params") {
    val c = fresh()
    c.execute("CREATE VIEW av AS SELECT r_name FROM region WHERE r_regionkey < 2")
    assert(c.execute("SELECT count(*) AS n FROM av").first().getLong(0) === 2)
    c.execute("ALTER VIEW av AS SELECT r_name FROM region WHERE r_regionkey >= 2")
    assert(c.execute("SELECT count(*) AS n FROM av").first().getLong(0) === 3)
    intercept[IllegalArgumentException] {
      c.execute("ALTER VIEW missing AS SELECT 1")
    }
    c.execute("CREATE DATABASE adb ENGINE 'pg', PARAMETERS = host='h1'")
    c.execute("ALTER DATABASE adb port='5432'")
    assert(c.catalog.database("adb").get.params
      === Map("host" -> "h1", "port" -> "5432"))
    c.execute("CREATE KNOWLEDGE BASE akb USING content_columns='text'")
    c.execute("ALTER KNOWLEDGE BASE akb USING chunk_size='300'")
    assert(c.catalog.kb("akb").get.params
      === Map("content_columns" -> "text", "chunk_size" -> "300"))
  }

  test("ALTER KB model dicts: same-provider merge, provider-change replace, false clears, embedding change refused (test_alter_kb)") {
    val c = fresh()
    c.execute("""CREATE KNOWLEDGE BASE nkb USING
      embedding_model = {'provider': 'bedrock', 'model_name': 'dummy_model', 'api_key': 'embed-key-1'},
      reranking_model = {'provider': 'openai', 'model_name': 'gpt-3', 'api_key': 'rerank-key-1'}""")
    c.execute("""ALTER KNOWLEDGE BASE nkb USING
      reranking_model = {'api_key': 'rerank-key-2'},
      embedding_model = {'api_key': 'embed-key-2'},
      id_column = 'my_id'""")
    val p = c.catalog.kb("nkb").get.params
    assert(p("id_column") === "my_id")
    // same provider: key-by-key merge, untouched keys survive
    assert(p("reranking_model").contains("'model_name': 'gpt-3'"))
    assert(p("reranking_model").contains("'api_key': 'rerank-key-2'"))
    assert(p("embedding_model").contains("'api_key': 'embed-key-2'"))
    assert(p("embedding_model").contains("'model_name': 'dummy_model'"))
    // the embedding model of an existing KB cannot change
    intercept[IllegalArgumentException] {
      c.execute("ALTER KNOWLEDGE BASE nkb USING embedding_model = {'model_name': 'my_model'}")
    }
    intercept[IllegalArgumentException] {
      c.execute("ALTER KNOWLEDGE BASE nkb USING embedding_model = {'provider': 'ollama'}")
    }
    // different reranking provider: params replaced, old api_key gone
    c.execute("ALTER KNOWLEDGE BASE nkb USING reranking_model = {'provider': 'ollama', 'model_name': 'mistral'}")
    val p2 = c.catalog.kb("nkb").get.params
    assert(p2("reranking_model").contains("'provider': 'ollama'"))
    assert(!p2("reranking_model").contains("api_key"))
    // disable: config cleared
    c.execute("ALTER KNOWLEDGE BASE nkb USING reranking_model = false")
    assert(c.catalog.kb("nkb").get.params("reranking_model") === "{}")
  }

  test("UPDATE … FROM (SELECT …) with a model join updates matched rows only (test_update_from_select)") {
    val c = fresh()
    c.execute("""CREATE MODEL uf_model FROM
      (SELECT l_quantity, l_extendedprice FROM lineitem)
      PREDICT l_extendedprice USING features='l_quantity', score_column='pred'""")
    c.execute("CREATE TABLE uf_t AS SELECT CAST(id AS DOUBLE) AS qty, CAST(0.0 AS DOUBLE) AS price FROM range(0, 8)")
    // reference shape: the subquery joins a model; its output columns are
    // addressed through the model alias / unqualified (test_update_from_select
    // selects model.a, model.p from the joined result)
    c.execute("""UPDATE uf_t SET price = df.pred FROM (
        SELECT qty, m.pred AS pred
        FROM (SELECT CAST(id AS DOUBLE) AS l_quantity, CAST(id AS DOUBLE) AS qty
              FROM range(0, 4)) t
        JOIN uf_model m ON m.l_quantity = t.l_quantity) AS df
      WHERE uf_t.qty = df.qty""")
    val rows = c.execute("SELECT qty, price FROM uf_t ORDER BY qty").collect()
    assert(rows.length === 8)
    // matched rows (qty < 4) took the model's prediction, others kept 0.0
    assert(rows.filter(_.getDouble(0) < 4).forall(_.getDouble(1) !== 0.0))
    assert(rows.filter(_.getDouble(0) >= 4).forall(_.getDouble(1) === 0.0))
  }

  test("KB insert maps uppercase source columns (test_kb_uppercase_source_columns)") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE ukb USING content_columns='content'")
    c.execute("""INSERT INTO ukb SELECT doc_id AS ID, substr(text, 1, 30) AS CONTENT
      FROM documents WHERE doc_id < 5""")
    val rows = c.execute("SELECT count(*) AS n FROM ukb GROUP BY doc_id").collect()
    assert(rows.length === 5)
  }

  test("KB re-insert of an existing id replaces its chunks (test_duplicated_ids)") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE dkb USING content_columns='content'")
    // long content chunks into > 1 chunk
    c.execute(s"INSERT INTO dkb (id, content) VALUES (1, '${"my content " * 30}')")
    c.execute("INSERT INTO dkb (id, content) VALUES (2, 'content2')")
    def n(id: Int) = c.execute(s"SELECT count(*) AS n FROM dkb WHERE id = $id")
      .first().getLong(0)
    assert(n(1) > 1, "long doc must be chunked")
    assert(n(2) === 1)
    // re-insert id 1 with short content: old chunks must disappear
    c.execute("INSERT INTO dkb (id, content) VALUES (1, 'content')")
    assert(n(1) === 1, "re-ingest must replace all previous chunks of the id")
    assert(n(2) === 1, "other ids untouched")
  }

  test("CREATE FUNCTION registers a SQL UDF, lists in routines, bare re-create errors, DROP removes") {
    val c = fresh()
    c.execute("CREATE FUNCTION cf_sq(x BIGINT) RETURNS BIGINT RETURN x * x")
    assert(c.execute("SELECT cf_sq(7) AS v").first().getLong(0) === 49L)
    assert(c.execute("""SELECT routine_definition FROM information_schema.routines
      WHERE routine_name = 'cf_sq'""").first().getString(0) === "x * x")
    intercept[IllegalArgumentException] {
      c.execute("CREATE FUNCTION cf_sq(x BIGINT) RETURNS BIGINT RETURN x + 1")
    }
    // OR REPLACE swaps the body
    c.execute("CREATE OR REPLACE FUNCTION cf_sq(x BIGINT) RETURNS BIGINT RETURN x + 1")
    assert(c.execute("SELECT cf_sq(7) AS v").first().getLong(0) === 8L)
    c.execute("DROP FUNCTION cf_sq")
    assert(c.execute("""SELECT count(*) AS n FROM information_schema.routines
      WHERE routine_name = 'cf_sq'""").first().getLong(0) === 0L)
    c.execute("DROP FUNCTION IF EXISTS cf_sq") // no-op, no error
  }

  test("MySQL service-request SHOW variants all answer (test_service_requests)") {
    val c = fresh()
    val stmts = Seq(
      "show databases", "show schemas", "show tables", "show tables from mindsdb",
      "show tables in mindsdb", "show full tables from mindsdb",
      "show full tables in mindsdb", "show variables", "show session status",
      "show global variables", "show engines", "show warnings", "show charset",
      "show collation", "show models",
      "show function status where db = 'mindsdb'",
      "show procedure status where db = 'mindsdb'")
    stmts.foreach(s => c.execute(s).collect()) // none may throw
    // SHOW ... WHERE filters the meta frame
    c.execute("""CREATE MODEL wm_show PREDICT s USING
      features='l_quantity', weights='1.0', bias=0.0""")
    assert(c.execute("show models where name = 'wm_show'").count() === 1)
    assert(c.execute("show models where name = 'nope'").count() === 0)
    // describe <project>.<model>.<attr> (test_describe_predictor_attrs)
    assert(c.execute("describe mindsdb.wm_show.features").count() > 0)
    assert(c.execute("describe wm_show.info").count() > 0)
  }

  test("secrets are masked in meta-tables until SET show_secrets=true (test_hide_secrets)") {
    val c = fresh()
    c.execute("CREATE ML_ENGINE ml_sec FROM fit USING api_key='123456'")
    c.execute("CREATE DATABASE db_sec WITH ENGINE='pg', PARAMETERS = host='h1', password='hunter2'")
    c.execute("""CREATE MODEL mdl_sec FROM (SELECT l_quantity, l_extendedprice FROM lineitem)
      PREDICT l_extendedprice USING features='l_quantity', api_key='654321'""")
    def engRow() = c.execute(
      "SELECT connection_data FROM mindsdb.ml_engines WHERE name = 'ml_sec'").first().getString(0)
    def dbRow() = c.execute(
      "SELECT connection_data FROM mindsdb.databases WHERE name = 'db_sec'").first().getString(0)
    def mdlRow() = c.execute(
      "SELECT training_options FROM mindsdb.models WHERE name = 'mdl_sec'").first().getString(0)
    assert(engRow() === "api_key=******")
    assert(dbRow() === "host=h1,password=******")
    assert(mdlRow().contains("api_key=******"))
    assert(!mdlRow().contains("654321"))
    // reveal, then hide again
    c.execute("SET show_secrets = true")
    assert(engRow() === "api_key=123456")
    assert(dbRow() === "host=h1,password=hunter2")
    assert(mdlRow().contains("api_key=654321"))
    c.execute("SET show_secrets = false")
    assert(engRow() === "api_key=******")
  }

  test("agent new syntax: model/data dicts, exposure allowlist, ALTER replaces (test_agent_new_syntax)") {
    val c = fresh()
    c.execute("CREATE TABLE ag_t1 AS SELECT * FROM region")
    c.execute("CREATE TABLE ag_t2 AS SELECT * FROM nation")
    c.execute("""CREATE AGENT my_agent USING
      model = {'provider': 'openai', 'model_name': 'gpt-42', 'api_key': '-secret-'},
      data = {'knowledge_bases': [], 'tables': ['ag_t1']},
      prompt_template = 'instruction 42'""")
    val a = c.catalog.agent("my_agent").get
    assert(a.model === "gpt-42")
    assert(a.params("tables") === "ag_t1")
    assert(a.params("model_api_key") === "-secret-")
    // exposed table answers; unexposed table does NOT
    def ask(q: String) = c.execute(s"SELECT answer FROM my_agent WHERE question = '$q'")
      .first().getString(0)
    assert(ask("how many rows in ag_t1") === "ag_t1 has 5 rows")
    assert(!ask("how many rows in ag_t2").contains("ag_t2 has"),
      "unexposed table must stay invisible to the agent")
    // prompt_template participates in the completion prompt
    assert(ask("hello there").toUpperCase.contains("INSTRUCTION 42"))
    // ALTER AGENT replaces the exposure wholesale
    c.execute("""ALTER AGENT my_agent USING
      model = {'provider': 'openai', 'model_name': 'gpt-18', 'api_key': '-almost-'},
      data = {'tables': ['ag_t2']}""")
    val a2 = c.catalog.agent("my_agent").get
    assert(a2.model === "gpt-18")
    assert(a2.params("tables") === "ag_t2")
    assert(ask("how many rows in ag_t2") === "ag_t2 has 25 rows")
    assert(!ask("how many rows in ag_t1").contains("ag_t1 has"))
  }

  test("DML acks carry affected_rows: insert / update / delete (test_affected_rows)") {
    val c = fresh()
    c.execute("CREATE TABLE ar_t AS SELECT CAST(id AS BIGINT) AS a FROM range(0, 3)")
    def affected(df: org.apache.spark.sql.DataFrame): Long =
      df.select("affected_rows").first().getLong(0)
    assert(affected(c.execute("DELETE FROM ar_t WHERE a = 2")) === 1L)
    assert(affected(c.execute("INSERT INTO ar_t VALUES (3), (4)")) === 2L)
    // WHERE-less update touches every row (MySQL semantics): 0,1,3,4
    assert(affected(c.execute("UPDATE ar_t SET a = 0")) === 4L)
    assert(affected(c.execute("UPDATE ar_t SET a = 9 WHERE a = 0")) === 4L)
    assert(c.execute("SELECT count(*) AS n FROM ar_t WHERE a = 9").first().getLong(0) === 4L)
  }

  test("USING with a missing comma errors loudly (test_wrong_using)") {
    val c = fresh()
    val e = intercept[IllegalArgumentException] {
      c.execute("""CREATE MODEL bad_using FROM (SELECT l_quantity, l_extendedprice FROM lineitem)
        PREDICT l_extendedprice USING features='l_quantity' api_key='x'""")
    }
    assert(e.getMessage.toLowerCase.contains("syntax error"))
    // quoted and braced values may still contain '=' and spaces
    val p = c.parseUsing("prompt='a = b c = d', cfg={'x': '1'}, n=2")
    assert(p("prompt") === "a = b c = d")
    assert(p("n") === "2")
  }

  test("SET ACTIVE pins a model version; bad version rejected") {
    val c = fresh()
    c.execute("""CREATE MODEL sam FROM (
      SELECT l_quantity, l_extendedprice AS y FROM lineitem LIMIT 200
      ) PREDICT y USING features='l_quantity'""")
    c.execute("RETRAIN sam")
    assert(c.catalog.activeVersion("sam") === 2)
    c.execute("SET ACTIVE sam.1")
    assert(c.catalog.activeVersion("sam") === 1)
    intercept[IllegalArgumentException] { c.execute("SET ACTIVE sam.9") }
  }

  test("CREATE INDEX ON KNOWLEDGE_BASE: cell-partitioned store, probed search, ingest keeps layout") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE ikb USING content_columns='text'")
    c.execute("INSERT INTO ikb SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 60")
    val preCols = c.warehouse.table("__kb_ikb").columns.toSet
    assert(!preCols.contains("cell"))
    c.execute("CREATE INDEX ON KNOWLEDGE_BASE ikb WITH (nlist=4, nprobe=2)")
    // the chunk store is now laid out hive-style by cell: probes prune dirs
    assert(c.warehouse.partitionColumn("__kb_ikb") === Some("cell"))
    assert(c.warehouse.exists("__kb_ikb_cents"))
    assert(c.catalog.kb("ikb").get.params("ivf_nprobe") === "2")
    val hits = c.execute("SELECT * FROM ikb WHERE content = 'data pipeline' LIMIT 5").collect()
    assert(hits.length === 5)
    // ingest after index: new chunks get cells assigned on the way in
    c.execute("INSERT INTO ikb SELECT doc_id, text, lang, source FROM documents WHERE doc_id BETWEEN 60 AND 79")
    assert(c.warehouse.partitionColumn("__kb_ikb") === Some("cell"))
    val cells = c.warehouse.table("__kb_ikb").select("cell").distinct().count()
    assert(cells <= 4 && cells >= 1)
    // indexing a KB with no chunks is an error
    c.execute("CREATE KNOWLEDGE BASE empty_kb")
    intercept[IllegalArgumentException] {
      c.execute("CREATE INDEX ON KNOWLEDGE_BASE empty_kb")
    }
  }

  test("CREATE INDEX WITH (trained=true): k-means centroids, search still exact on self-query") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE tkb USING content_columns='text'")
    c.execute("INSERT INTO tkb SELECT doc_id, text FROM documents WHERE doc_id < 60")
    c.execute("CREATE INDEX ON KNOWLEDGE_BASE tkb WITH (nlist=4, nprobe=2, trained=true)")
    assert(c.warehouse.partitionColumn("__kb_tkb") === Some("cell"))
    // trained centroids: every chunk assigned, cells within nlist
    val cells = c.warehouse.table("__kb_tkb").select("cell").distinct().count()
    assert(cells >= 1 && cells <= 4)
    // a verbatim chunk text query must find its own chunk in the probed cells
    val text = c.warehouse.table("__kb_tkb").select("chunk_id", "content")
      .orderBy("chunk_id").first().getString(1).replace("'", "")
    val hits = c.execute(s"SELECT * FROM tkb WHERE content = '$text' LIMIT 3").collect()
    assert(hits.nonEmpty)
  }

  test("SHOW breadth: warnings empty, charset/collation/handlers/table status populated") {
    val c = fresh()
    assert(c.execute("SHOW WARNINGS").count() === 0)
    assert(c.execute("SHOW CHARSET").collect().map(_.getString(0)).toSeq
      === Seq("binary", "utf8mb4"))
    assert(c.execute("SHOW CHARACTER SET").count() === 2)
    assert(c.execute("SHOW COLLATION").collect().map(_.getString(0)).toSeq
      === Seq("binary", "utf8mb4_general_ci"))
    assert(c.execute("SHOW HANDLERS").collect().map(_.getString(0)).toSeq
      === Seq("byom", "fit", "files", "mem"))
    c.execute("CREATE TABLE st_t AS SELECT * FROM region")
    val st = c.execute("SHOW TABLE STATUS LIKE 'st%'").collect()
    assert(st.map(_.getString(0)).toSeq === Seq("st_t") && st.head.getString(1) === "parquet")
  }

  test("ASOF JOIN SQL: key/time parsing, flipped spelling, error paths") {
    val c = fresh()
    c.execute("CREATE TABLE asof_l AS SELECT * FROM (VALUES " +
      "(1, 10, TIMESTAMP '2024-01-01 00:10:00'), " +
      "(2, 10, TIMESTAMP '2024-01-01 00:05:00'), " +
      "(3, 20, TIMESTAMP '2024-01-01 00:10:00')) AS t(id, k, t)")
    c.execute("CREATE TABLE asof_r AS SELECT * FROM (VALUES " +
      "(10, TIMESTAMP '2024-01-01 00:07:00', 'a'), " +
      "(10, TIMESTAMP '2024-01-01 00:09:00', 'b'), " +
      "(20, TIMESTAMP '2024-01-01 00:20:00', 'c')) AS t(rk, rt, tag)")
    val got = c.execute("""SELECT id, tag FROM asof_l l ASOF LEFT JOIN asof_r r
        ON l.k = r.rk AND l.t >= r.rt ORDER BY id""").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    // id 1 sees latest click at 00:09 → b; id 2 only 00:07? no — 00:05 < both → null
    assert(got === Seq((1, "b"), (2, null), (3, null)))
    // flipped inequality spelling (r.rt <= l.t) parses to the same join
    val flipped = c.execute("""SELECT id, tag FROM asof_l l ASOF JOIN asof_r r
        ON r.rt <= l.t AND l.k = r.rk ORDER BY id""").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(flipped === got)
    intercept[IllegalArgumentException] { // forward as-of unsupported
      c.execute("SELECT id FROM asof_l l ASOF JOIN asof_r r ON l.k = r.rk AND l.t <= r.rt")
    }
    intercept[IllegalArgumentException] { // no equality key
      c.execute("SELECT id FROM asof_l l ASOF JOIN asof_r r ON l.t >= r.rt")
    }
    intercept[IllegalArgumentException] { // no time inequality
      c.execute("SELECT id FROM asof_l l ASOF JOIN asof_r r ON l.k = r.rk")
    }
  }

  test("EVALUATE <metric> FROM (query): hand-computed values, aliases, errors") {
    val c = fresh()
    // regression frame: actual (1,2,3,4), prediction (1,2,3,8)
    // mae = 4/4 = 1; mse = 16/4 = 4; rmse = 2
    // r2 = 1 - 16/5 = -2.2 (ss_tot = (2.25+0.25+0.25+2.25)=5)
    val reg = "(SELECT * FROM (VALUES (1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 8.0))" +
      " AS t(actual, prediction))"
    def one(sql: String): Double = c.execute(sql).first().getDouble(0)
    assert(one(s"EVALUATE mean_absolute_error FROM $reg") === 1.0)
    assert(one(s"EVALUATE mse FROM $reg") === 4.0)
    assert(one(s"EVALUATE rmse FROM $reg") === 2.0)
    assert(one(s"EVALUATE r2 FROM $reg USING n_decimals = 4") === -2.2)
    // binary frame: a=(1,1,1,0,0,0), p=(1,1,0,1,0,0) → tp=2 fp=1 fn=1 tn=2
    // precision = recall = f1 = accuracy = balanced_accuracy = 2/3
    val cls = "(SELECT * FROM (VALUES (1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0))" +
      " AS t(actual, prediction))"
    val twoThirds = 0.667
    assert(one(s"EVALUATE precision_score FROM $cls") === twoThirds)
    assert(one(s"EVALUATE recall FROM $cls") === twoThirds)
    assert(one(s"EVALUATE f1_score FROM $cls") === twoThirds)
    assert(one(s"EVALUATE accuracy FROM $cls") === twoThirds)
    assert(one(s"EVALUATE balanced_accuracy FROM $cls") === twoThirds)
    // reference asserts: unknown metric, missing column, NULLs all raise
    intercept[IllegalArgumentException] { one(s"EVALUATE not_a_metric FROM $reg") }
    intercept[IllegalArgumentException] {
      one("EVALUATE r2_score FROM (SELECT 1.0 AS actual, 2.0 AS other)")
    }
    intercept[Exception] {
      one("EVALUATE r2_score FROM (SELECT * FROM (VALUES (1.0, CAST(NULL AS DOUBLE)))" +
        " AS t(actual, prediction))")
    }
  }

  test("CREATE MODEL engine='naive_bayes': train, SQL apply, null-text row kept, retrain") {
    val c = fresh()
    c.execute("""CREATE MODEL nbspec FROM (
        SELECT text, lang FROM documents WHERE doc_id < 100)
      PREDICT lang USING engine='naive_bayes', features='text'""")
    assert(c.catalog.listModels().contains("nbspec"))
    val applied = c.execute("""SELECT doc_id, lang, pred_lang
      FROM (SELECT doc_id, lang, text FROM documents WHERE doc_id >= 100 AND doc_id < 120)
      JOIN nbspec ORDER BY doc_id""")
    assert(applied.count() === 20) // row coverage: every input row predicted
    assert(applied.filter(applied("pred_lang").isNull).count() === 0)
    // predictions come from the trained label set
    val langs = applied.select("pred_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
    // RETRAIN re-runs the stored trainer and bumps the version
    c.execute("RETRAIN nbspec")
    assert(c.catalog.activeVersion("nbspec") === 2)
  }

  test("CREATE MODEL conflict semantics: bare errors, IF NOT EXISTS skips, OR REPLACE retrains") {
    val c = fresh()
    c.execute("CREATE MODEL cm PREDICT s USING features='l_quantity', weights='1.0', bias=0.0")
    intercept[IllegalArgumentException] {
      c.execute("CREATE MODEL cm PREDICT s USING features='l_quantity', weights='9.0', bias=9.0")
    }
    c.execute("CREATE MODEL IF NOT EXISTS cm PREDICT s USING features='l_quantity', weights='9.0', bias=9.0")
    assert(c.catalog.model("cm").asInstanceOf[graft.ml.LinearModel].bias === 0.0) // unchanged
    c.execute("CREATE OR REPLACE MODEL cm PREDICT s USING features='l_quantity', weights='9.0', bias=9.0")
    assert(c.catalog.model("cm").asInstanceOf[graft.ml.LinearModel].bias === 9.0) // replaced
  }

  test("CREATE JOB START/END bounds: not due before START, deactivates past END") {
    val c = fresh()
    c.execute("""CREATE JOB bounded AS (SELECT 1) EVERY 1 hour
      START '2030-01-01 00:00:00' END '2030-01-02 00:00:00'""")
    def at(s: String) = java.time.LocalDateTime.parse(s.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC)
    // before START: nothing due
    assert(c.jobs.tick(at("2029-12-31 23:00:00")).isEmpty)
    // inside the window: runs
    val ran = c.jobs.tick(at("2030-01-01 00:30:00"))
    assert(ran.map(_.job) === Seq("bounded") && ran.head.ok)
    // past END: expires and deactivates
    val expired = c.jobs.tick(at("2030-01-03 00:00:00"))
    assert(expired.headOption.flatMap(_.error).contains("expired"))
    assert(c.jobs.tick(at("2030-01-04 00:00:00")).isEmpty)
  }

  test("log.jobs_history: per-run rows queryable with WHERE/ORDER") {
    val c = fresh()
    c.execute("CREATE JOB hjob AS (SELECT count(*) FROM region) EVERY 1 hour")
    c.execute("CREATE JOB hbad AS (SELECT * FROM no_such_table_xyz) EVERY 1 hour")
    c.jobs.tick(java.time.Instant.now())
    val all = c.execute("SELECT name, ok FROM log.jobs_history ORDER BY name").collect()
    assert(all.map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
      Seq(("hbad", false), ("hjob", true)))
    assert(c.execute(
      "SELECT error FROM log.jobs_history WHERE name = 'hbad'").first().getString(0) != null)
  }

  test("DESCRIBE MODEL attributes: info/features/model, NB engine, version addressing, errors") {
    val c = fresh()
    c.execute("""CREATE MODEL dmod PREDICT s USING
      features='l_quantity', weights='0.5', bias=1.0""")
    assert(c.execute("DESCRIBE MODEL dmod.info").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap.apply("engine") === "fit")
    assert(c.execute("DESCRIBE MODEL dmod.features").count() === 2) // feature + target
    assert(c.execute("DESCRIBE MODEL dmod.1.model").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap.apply("bias") === "1.0")
    c.execute("""CREATE MODEL dnb FROM (
        SELECT text, lang FROM documents WHERE doc_id < 50)
      PREDICT lang USING engine='naive_bayes', features='text'""")
    val nbInfo = c.execute("DESCRIBE MODEL dnb.info").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nbInfo("engine") === "naive_bayes" && nbInfo("predict") === "pred_lang")
    val nbModel = c.execute("DESCRIBE MODEL dnb.model").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nbModel("classes").split(",").toSet.subsetOf(Set("en", "de", "fr", "es", "zh")))
    intercept[IllegalArgumentException] { c.execute("DESCRIBE MODEL dmod.nope") }
    intercept[Exception] { c.execute("DESCRIBE MODEL missing_model.info") }
  }

  test("WHERE ts > LAST: init swallows history, later runs see only new rows") {
    val c = fresh()
    c.execute("""CREATE TABLE lastt AS
      SELECT * FROM (VALUES (1, TIMESTAMP '2024-01-01 00:00:00'),
                            (2, TIMESTAMP '2024-01-02 00:00:00')) AS t(id, ts)""")
    val q = "SELECT id, ts FROM lastt WHERE ts > LAST ORDER BY id"
    // run 1: watermark initializes to the current max → empty increment
    assert(c.execute(q).count() === 0)
    // run 2 with no new data: still empty
    assert(c.execute(q).count() === 0)
    c.execute("INSERT INTO lastt SELECT 3, TIMESTAMP '2024-01-03 00:00:00'")
    val r3 = c.execute(q).collect()
    assert(r3.map(_.getInt(0)).toSeq === Seq(3)) // only the new row
    // run 4: the advance from run 3 hides row 3 now
    assert(c.execute(q).count() === 0)
    // a DIFFERENT query text keeps its own watermark context
    assert(c.execute("SELECT id FROM lastt WHERE ts > LAST").count() === 0)
  }

  test("user variables: SET @x / SELECT @x, separate from server vars") {
    val c = fresh()
    c.execute("SET @x = 'abc'")
    c.execute("SET @x = 'def'")
    val r = c.execute("SELECT @x AS x, @y AS y").first()
    assert(r.getString(0) === "def" && r.getString(1) === null)
    // server-variable namespace untouched by @ writes
    assert(c.execute("SELECT @@x AS x").first().getString(0) === null)
    c.execute("SET @@srv = '1'")
    assert(c.execute("SELECT @srv AS s").first().getString(0) === null)
  }

  test("WHERE ts > LAST works inside a CREATE JOB body (job ticks route the statement router)") {
    val c = fresh()
    c.execute("""CREATE TABLE jlast AS
      SELECT * FROM (VALUES (1, TIMESTAMP '2024-01-01 00:00:00')) AS t(id, ts)""")
    c.execute(
      "CREATE JOB incjob AS (SELECT id FROM jlast WHERE ts > LAST) EVERY 1 hour")
    // tick 1: LAST initializes — must NOT fail with an unresolved column
    val r1 = c.jobs.tick(java.time.Instant.now())
    assert(r1.size === 1 && r1.head.ok, s"job tick failed: ${r1.head.error}")
    c.execute("INSERT INTO jlast SELECT 2, TIMESTAMP '2024-01-02 00:00:00'")
    val r2 = c.jobs.tick(java.time.Instant.now().plusSeconds(3700))
    assert(r2.size === 1 && r2.head.ok, s"job tick failed: ${r2.head.error}")
    assert(c.jobs.history.forall(_.error.isEmpty))
  }

  test("EXECUTE binds a string parameter containing a quote (typed, no splicing)") {
    val c = fresh()
    c.execute("PREPARE echoq FROM 'SELECT ? AS v'")
    assert(c.execute("EXECUTE echoq USING 'it''s'").first().getString(0) === "it's")
    // a classic injection shape stays a plain value under typed binding
    c.execute("PREPARE cntq FROM 'SELECT count(*) AS n FROM region WHERE r_name = ?'")
    assert(c.execute("EXECUTE cntq USING ''' OR ''1''=''1'").first().getLong(0) === 0)
  }

  test("log.jobs_history does not swallow prefixed table names") {
    val c = fresh()
    intercept[Exception] { c.execute("SELECT name FROM log.jobs_history_old").collect() }
    // the real route still answers
    assert(c.execute("SELECT name FROM log.jobs_history").count() === 0)
  }

  test("DROP of a bucketed table clears its session-catalog entry; name is reusable") {
    val c = fresh()
    c.execute("CREATE TABLE bdrop CLUSTERED BY (r_regionkey) INTO 2 BUCKETS AS " +
      "SELECT r_regionkey, r_name FROM region")
    assert(spark.catalog.tableExists("default", "bdrop"))
    c.execute("DROP TABLE bdrop")
    assert(!spark.catalog.tableExists("default", "bdrop"),
      "stale session-catalog entry would shadow a future warehouse table")
    // same name, plain table, different schema: must resolve to the NEW data
    c.execute("CREATE TABLE bdrop AS SELECT 42 AS answer")
    assert(c.execute("SELECT answer FROM bdrop").first().getInt(0) === 42)
  }

  test("model joins route through the one-parse rewrite: aliased, CTE-nested, subquery-nested") {
    val c = fresh()
    c.execute("""CREATE MODEL rs PREDICT score USING
      features='r_regionkey', weights='2.0', bias=1.0""")
    // aliased model (regex fast-path can't see the alias)
    val a = c.execute(
      "SELECT r_name, score FROM region JOIN rs AS m ORDER BY r_name").collect()
    assert(a.length === 5 && a.forall(r => r.getDouble(1) >= 1.0))
    // CTE-nested + aliased
    val b = c.execute("""WITH sc AS (SELECT r_regionkey, score FROM region JOIN rs AS m)
      SELECT count(*) AS n FROM sc WHERE score > 1.0""").first().getLong(0)
    assert(b === 4) // r_regionkey 1..4 score 3,5,7,9; key 0 scores exactly 1.0
    // nested inside a subquery in the FROM clause
    val d = c.execute("""SELECT max(score) AS mx FROM
      (SELECT score FROM (SELECT * FROM region WHERE r_regionkey < 3) JOIN rs)""")
      .first().getDouble(0)
    assert(d === 5.0)
    // model on the LEFT side applies the same way (reference planner
    // picks whichever relation is a predictor)
    val f = c.execute(
      "SELECT r_name, score FROM rs JOIN region ORDER BY r_name").collect()
    assert(f.length === 5 && f.map(_.getDouble(1)).max === 9.0)
    // a plain join of two real tables is untouched by the rewrite
    val e = c.execute("""SELECT count(*) AS n FROM nation
      JOIN region ON n_regionkey = r_regionkey""").first().getLong(0)
    assert(e === 25)
  }

  test("DELETE FROM knowledge base: predicate chunk delete, bare DELETE clears") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kbd USING content_columns='text'")
    c.execute("INSERT INTO kbd SELECT doc_id, text, lang, source FROM documents")
    val total = c.execute("SELECT count(*) AS n FROM kbd").first().getLong(0)
    assert(total > 0)
    val low = c.execute("SELECT count(*) AS n FROM kbd WHERE doc_id < 10").first().getLong(0)
    assert(low > 0)
    c.execute("DELETE FROM kbd WHERE doc_id < 10")
    assert(c.execute("SELECT count(*) AS n FROM kbd").first().getLong(0) === total - low)
    // search still works over the surviving chunks
    assert(c.execute("SELECT * FROM kbd WHERE content = 'scan' LIMIT 5").count() === 5)
    c.execute("DELETE FROM kbd") // clear()
    assert(c.execute("SELECT count(*) AS n FROM kbd").first().getLong(0) === 0)
  }

  test("UPDATE knowledge base: content update re-embeds the chunk") {
    val c = fresh()
    c.execute("CREATE KNOWLEDGE BASE kbu USING content_columns='text'")
    c.execute("INSERT INTO kbu SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 20")
    val target = c.execute("SELECT chunk_id FROM kbu LIMIT 1").first().getString(0)
    c.execute(s"UPDATE kbu SET content = 'zebra quantum haiku' WHERE chunk_id = '$target'")
    // the updated chunk must now be the TOP hit for its new content
    val top = c.execute("SELECT * FROM kbu WHERE content = 'zebra quantum haiku' LIMIT 1")
      .first().getAs[String]("chunk_id")
    assert(top === target, "embedding not recomputed on content update")
    // metadata-only update leaves the embedding usable
    c.execute(s"UPDATE kbu SET lang = 'xx' WHERE chunk_id = '$target'")
    assert(c.execute(s"SELECT * FROM kbu WHERE content = 'zebra quantum haiku' LIMIT 1")
      .first().getAs[String]("chunk_id") === target)
  }

  test("files.<name> SQL namespace: format-sniffed reads from the warehouse files area") {
    val c = fresh()
    val filesDir = java.nio.file.Paths.get(s"${c.warehouse.dir}/.files")
    java.nio.file.Files.createDirectories(filesDir)
    java.nio.file.Files.writeString(filesDir.resolve("prices.csv"),
      "item,price\napple,1.5\npear,2.0\n")
    val r = c.execute(
      "SELECT item, price FROM files.prices ORDER BY item").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("apple", "pear"))
    // joins with regular tables and aliases compose
    val n = c.execute("""SELECT count(*) AS n FROM files.prices AS p
      JOIN region ON r_regionkey >= 0""").first().getLong(0)
    assert(n === 10)
    intercept[Exception] { c.execute("SELECT * FROM files.missing").collect() }
  }

  test("TS model DDL: ORDER BY/GROUP BY/WINDOW/HORIZON clauses, engines apply via join") {
    val c = fresh()
    c.execute("""CREATE MODEL tsq FROM (SELECT * FROM orders)
      PREDICT o_totalprice ORDER BY o_orderdate GROUP BY o_custkey
      WINDOW 6 HORIZON 3 USING engine='seasonal', period=3, tie_break='o_orderkey'""")
    assert(c.catalog.listModels().contains("tsq"))
    val out = c.execute("SELECT * FROM orders JOIN tsq")
    assert(out.columns.toSeq.contains("lower") && out.columns.toSeq.contains("upper"))
    // 3 horizon rows per group present in the data side
    val groups = c.execute("SELECT count(DISTINCT o_custkey) AS n FROM orders")
      .first().getLong(0)
    assert(out.count() === groups * 3)
    // bare re-create errors; IF NOT EXISTS is a no-op
    intercept[IllegalArgumentException] { c.execute(
      """CREATE MODEL tsq FROM (SELECT * FROM orders) PREDICT o_totalprice
        ORDER BY o_orderdate WINDOW 2 HORIZON 1""") }
    c.execute("""CREATE MODEL IF NOT EXISTS tsq FROM (SELECT * FROM orders)
      PREDICT o_totalprice ORDER BY o_orderdate WINDOW 2 HORIZON 1""")
    // ungrouped spelling works too (single global series)
    c.execute("""CREATE MODEL tsg FROM (SELECT * FROM orders)
      PREDICT o_totalprice ORDER BY o_orderdate WINDOW 4 HORIZON 2
      USING tie_break='o_orderkey'""")
    assert(c.execute("SELECT * FROM orders JOIN tsg").count() === 2)
    // the reference's only-future spelling composes on a TS join
    assert(c.execute(
      "SELECT * FROM orders JOIN tsg WHERE o_orderdate > LATEST").count() === 2)
    // DESCRIBE MODEL reports the TS settings
    val info = c.execute("DESCRIBE MODEL tsq.model").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(info("engine") === "seasonal" && info("window") === "6"
      && info("horizon") === "3" && info("group_by") === "o_custkey")
  }

  test("DROP … IF EXISTS: missing objects no-op with the clause, error without") {
    val c = fresh()
    for (kind <- Seq("VIEW", "JOB", "AGENT", "TRIGGER", "DATABASE")) {
      assert(c.execute(s"DROP $kind IF EXISTS ghost_$kind").first().getString(0) === "ok")
      intercept[IllegalArgumentException] { c.execute(s"DROP $kind ghost_$kind") }
    }
    // existing objects still drop with the clause present
    c.execute("CREATE VIEW dv AS SELECT 1 AS one")
    c.execute("DROP VIEW IF EXISTS dv")
    assert(!c.catalog.listViews().contains("dv"))
  }

  test("SHALLOW CLONE: zero-copy via hard links, fully divergent after DML") {
    val c = fresh()
    c.execute("CREATE TABLE clsrc AS SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 100")
    c.execute("CREATE TABLE cldst SHALLOW CLONE clsrc")
    // clone shares inodes with the source (zero bytes copied)
    val srcFile = java.nio.file.Files.walk(java.nio.file.Paths.get(s"${c.warehouse.dir}/clsrc"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    assert(java.nio.file.Files.getAttribute(srcFile, "unix:nlink").asInstanceOf[Int] >= 2,
      "clone did not hard-link the source's data files")
    // mutate both sides differently; neither sees the other's change
    c.execute("UPDATE clsrc SET o_totalprice = 0 WHERE o_orderkey <= 50")
    c.execute("DELETE FROM cldst WHERE o_orderkey > 90")
    val srcZero = c.execute("SELECT count(*) AS n FROM clsrc WHERE o_totalprice = 0").first().getLong(0)
    val dstZero = c.execute("SELECT count(*) AS n FROM cldst WHERE o_totalprice = 0").first().getLong(0)
    val dstN = c.execute("SELECT count(*) AS n FROM cldst").first().getLong(0)
    val srcN = c.execute("SELECT count(*) AS n FROM clsrc").first().getLong(0)
    assert(srcZero > 0 && dstZero === 0L, "clone saw the source's UPDATE")
    assert(dstN < srcN, "source saw the clone's DELETE")
    // cloning onto an existing table is an error
    intercept[IllegalArgumentException](c.execute("CREATE TABLE cldst CLONE clsrc"))
  }

  test("chatbot conversation memory: multi-turn context changes answers; history queryable per session") {
    val c = fresh()
    c.execute("CREATE DATABASE chatdb_cs ENGINE 'pg'")
    c.execute("CREATE MODEL m_cs PREDICT score USING features='l_quantity', weights='1.0', bias=0.0")
    c.execute("CREATE CHATBOT bot_cs USING database = 'chatdb_cs', model = 'm_cs'")
    val a1 = c.execute("ASK bot_cs 'what is spark' SESSION 's1'").first()
    assert(a1.getString(0) === "bot_cs" && a1.getInt(2) === 1)
    // same question, same session → different answer (context grew)
    val a2 = c.execute("ASK bot_cs 'what is spark' SESSION 's1'").first()
    assert(a2.getInt(2) === 3, "assistant turns must also advance the counter")
    assert(a1.getString(3) !== a2.getString(3), "multi-turn context did not change the answer")
    // same question in a FRESH session → the turn-1 answer again
    val b1 = c.execute("ASK bot_cs 'what is spark' SESSION 's2'").first()
    assert(b1.getString(3) === a1.getString(3), "sessions must be isolated")
    // history is queryable and ordered
    val hist = c.execute(
      "SELECT session, turn, role FROM log.chatbot_history WHERE chatbot = 'bot_cs' ORDER BY session, turn")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(hist.count(_._1 == "s1") === 4 && hist.count(_._1 == "s2") === 2)
    assert(hist.filter(_._1 == "s1").map(_._3).toSeq === Seq("user", "assistant", "user", "assistant"))
    // unknown bot errors; DROP clears its history
    intercept[NoSuchElementException](c.execute("ASK nobody_cs 'hi'"))
    c.execute("DROP CHATBOT bot_cs")
    assert(c.execute("SELECT count(*) AS n FROM log.chatbot_history").first().getLong(0) === 0L)
  }

  test("SHOW CREATE TABLE: bucket spec and evolved columns render; missing table errors") {
    val c = fresh()
    c.execute("CREATE TABLE scb CLUSTERED BY (o_orderkey) INTO 4 BUCKETS AS " +
      "SELECT o_orderkey, o_totalprice FROM orders")
    val b = c.execute("SHOW CREATE TABLE scb").first().getString(1)
    assert(b.contains("CLUSTERED BY (`o_orderkey`) INTO 4 BUCKETS"), b)
    c.execute("CREATE TABLE scp AS SELECT r_regionkey, r_name FROM region")
    c.execute("ALTER TABLE scp ADD COLUMN note STRING DEFAULT 'x'")
    val p = c.execute("SHOW CREATE TABLE scp").first().getString(1)
    assert(p.contains("`note` STRING"), s"evolved column missing from:\n$p")
    intercept[IllegalArgumentException](c.execute("SHOW CREATE TABLE nope_missing"))
  }

  test("EXPORT: sharded jsonl with manifest; csv and query forms round-trip") {
    val c = fresh()
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    val res = c.execute(
      s"EXPORT (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 500) " +
        s"TO '$out/j' FORMAT jsonl SHARD ROWS 50").first()
    val (rows, shards) = (res.getLong(2), res.getLong(3))
    assert(rows > 100 && shards >= rows / 50,
      s"expected >=${rows / 50} shards for $rows rows, got $shards")
    // every shard respects the row cap; the manifest agrees with reality
    val back = spark.read.json(s"$out/j")
    assert(back.count() === rows)
    import org.apache.spark.sql.functions.{col, input_file_name, count => cnt, lit, max => mx}
    val maxPerFile = back.groupBy(input_file_name()).agg(cnt(lit(1)).as("n"))
      .agg(mx(col("n"))).first().getLong(0)
    assert(maxPerFile <= 50, s"a shard holds $maxPerFile rows (cap 50)")
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/j/_manifest.json")), "UTF-8")
    assert(manifest.contains(s""""rows":$rows""") && manifest.contains(s""""shards":$shards"""))
    // csv + named-table form
    c.execute("CREATE TABLE exp_t AS SELECT r_regionkey, r_name FROM region")
    val res2 = c.execute(s"EXPORT TABLE exp_t TO '$out/c' FORMAT csv").first()
    assert(res2.getLong(2) === 5L)
    assert(spark.read.option("header", "true").csv(s"$out/c").count() === 5L)
  }

  test("TRANSACTIONS: rollback undoes DML and drops tables created inside; commit persists") {
    val c = fresh()
    c.execute("CREATE TABLE tx1 AS SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 100")
    val before = c.execute("SELECT count(*) AS n, sum(o_orderkey) AS s FROM tx1").first()
    c.execute("BEGIN")
    c.execute("UPDATE tx1 SET o_totalprice = 0 WHERE o_orderkey <= 50")
    c.execute("DELETE FROM tx1 WHERE o_orderkey > 90")
    c.execute("CREATE TABLE tx_new AS SELECT 1 AS x")
    assert(c.warehouse.exists("tx_new"))
    c.execute("ROLLBACK")
    val after = c.execute("SELECT count(*) AS n, sum(o_orderkey) AS s FROM tx1").first()
    assert(after === before, "rollback did not restore the pre-transaction state")
    assert(!c.warehouse.exists("tx_new"), "rollback did not drop the table created inside")
    assert(c.execute("SELECT count(*) AS n FROM tx1 WHERE o_totalprice = 0")
      .first().getLong(0) === 0L)
    // committed work persists
    c.execute("START TRANSACTION")
    c.execute("UPDATE tx1 SET o_totalprice = -1 WHERE o_orderkey = 1")
    c.execute("COMMIT")
    assert(c.execute("SELECT count(*) AS n FROM tx1 WHERE o_totalprice = -1")
      .first().getLong(0) === 1L)
    // guards: no nested BEGIN; COMMIT/ROLLBACK require an open txn;
    // history-destroying DDL refused inside a transaction
    c.execute("BEGIN")
    intercept[IllegalArgumentException](c.execute("BEGIN"))
    intercept[IllegalArgumentException](c.execute("DROP TABLE tx1"))
    c.execute("ROLLBACK")
    intercept[IllegalArgumentException](c.execute("COMMIT"))
    assert(c.warehouse.exists("tx1"))
  }

  test("QUALIFY rewrites to the window-filter wrap; literals containing the word survive") {
    val c = fresh()
    val top = c.execute("""SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        ORDER BY o_totalprice DESC, o_orderkey) <= 2
      ORDER BY o_orderstatus, o_totalprice DESC""").collect()
    assert(top.length === 2 * top.map(_.getString(0)).distinct.length,
      "expected exactly 2 rows per status")
    assert(!top.map(_.schema.fieldNames.toSeq).head.contains("__q"),
      "helper column leaked into the output")
    // per-group maxima really are the kept rows
    val best = c.execute("""SELECT max(o_totalprice) AS m FROM orders
      WHERE o_orderstatus = 'F'""").first().getDouble(0)
    assert(top.filter(_.getString(0) == "F").map(_.getDouble(2)).max === best)
    // the keyword inside a string literal must NOT trigger the rewrite
    val lit = c.execute("SELECT 'do not qualify me' AS s").first().getString(0)
    assert(lit === "do not qualify me")
  }

  test("SKILL lifecycle: create, show, update, drop; text2sql agent dispatch") {
    val c = fresh()
    c.execute("CREATE SKILL t2s USING type='text2sql', database='graft', tables='orders,customer'")
    c.execute("CREATE SKILL kbsk USING type='knowledge_base', source='nokb'")
    val shown = c.execute("SHOW SKILLS").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown === Map("t2s" -> "text2sql", "kbsk" -> "knowledge_base"))
    // agent with the skill answers by aggregating over the allowlisted table
    c.execute("CREATE AGENT sqa USING model='default', skills='t2s'")
    val ans = c.execute("SELECT answer FROM sqa WHERE question = 'count rows in orders please'")
      .first().getString(0)
    val n = c.execute("SELECT count(*) AS n FROM orders").first().getLong(0)
    assert(ans === s"orders has $n rows")
    // question naming no allowlisted table falls through to the completion stub
    val fb = c.execute("SELECT answer FROM sqa WHERE question = 'what is the weather'")
      .first().getString(0)
    assert(fb.startsWith("LLM["), s"expected completion fallback, got: $fb")
    // allowlist order breaks ties: both tables named -> first declared wins
    val both = c.execute("SELECT answer FROM sqa WHERE question = 'orders or customer?'")
      .first().getString(0)
    assert(both.startsWith("orders has "))
    // UPDATE SKILL merges params; DROP removes; IF EXISTS tolerates absence
    c.execute("UPDATE SKILL t2s SET tables='region'")
    val reg = c.execute("SELECT answer FROM sqa WHERE question = 'size of region'")
      .first().getString(0)
    assert(reg === "region has 5 rows")
    c.execute("DROP SKILL kbsk")
    intercept[Exception](c.execute("DROP SKILL kbsk"))
    c.execute("DROP SKILL IF EXISTS kbsk")
    assert(c.execute("SHOW SKILLS").count() === 1L)
  }

  test("PROJECT lifecycle: create, show, typed database row, drop") {
    val c = fresh()
    c.execute("CREATE PROJECT p1")
    c.execute("CREATE PROJECT IF NOT EXISTS p2")
    c.execute("CREATE DATABASE ext ENGINE 'pg'")
    val projects = c.execute("SHOW PROJECTS").collect().map(_.getString(0)).toSeq
    assert(projects === Seq("graft", "p1", "p2"))
    // projects surface in SHOW DATABASES with type 'project'
    val types = c.execute("SHOW DATABASES").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(types("p1") === "project" && types("ext") === "data")
    c.execute("DROP PROJECT p1")
    assert(!c.execute("SHOW PROJECTS").collect().map(_.getString(0)).contains("p1"))
    // LIKE filter applies to projects too
    assert(c.execute("SHOW PROJECTS LIKE 'p%'").collect().map(_.getString(0)).toSeq
      === Seq("p2"))
  }

  test("COPY INTO bulk-loads a sniffed file through INSERT's conform rule") {
    val c = fresh()
    val dir = java.nio.file.Files.createTempDirectory("copyinto").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/load.csv"),
      "id,name\n1,alpha\n2,beta\n3,gamma\n")
    c.execute("CREATE TABLE cpy (id BIGINT, name STRING)")
    c.execute(s"COPY INTO cpy FROM '$dir/load.csv'")
    val rows = c.execute("SELECT * FROM cpy ORDER BY id").collect()
    assert(rows.length === 3 && rows.head.getLong(0) === 1L
      && rows.head.getString(1) === "alpha")
    // appends, not replaces
    c.execute(s"COPY INTO cpy FROM '$dir/load.csv'")
    assert(c.execute("SELECT * FROM cpy").count() === 6L)
    intercept[Exception](c.execute(s"COPY INTO no_such FROM '$dir/load.csv'"))
  }

  test("e24's lag-based sessionization agrees with Spark's session_window aggregation") {
    // cross-validation: the same 30-min gap rule expressed two ways must
    // produce the identical multiset of (user, events-per-session)
    val dir = "/root/testdata/sf0.001"
    val ev = graft.engine.Tables.table(spark, dir, "events")
    import org.apache.spark.sql.functions._
    val viaWindow = ev.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"), col("n")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val viaLag = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess", when(col("prev_ts").isNull ||
        expr("unix_micros(ts) - unix_micros(prev_ts)") > 1800L * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_no")).agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"), col("n")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaWindow === viaLag)
  }

  test("TRUNCATE TABLE empties but keeps schema; the pre-image is a recoverable version") {
    val c = fresh()
    c.execute("CREATE TABLE trunc AS SELECT n_nationkey, n_name FROM nation")
    c.execute("TRUNCATE TABLE trunc")
    val after = c.execute("SELECT * FROM trunc")
    assert(after.count() === 0L)
    assert(after.columns.toSeq === Seq("n_nationkey", "n_name"))
    // still insertable, and the truncate is a time-travelable commit
    c.execute("INSERT INTO trunc VALUES (99, 'X')")
    assert(c.execute("SELECT * FROM trunc").count() === 1L)
    assert(c.execute("SELECT * FROM trunc FOR VERSION AS OF 0").count() === 25L)
    intercept[Exception](c.execute("TRUNCATE TABLE no_such"))
  }

  test("CREATE TABLE LIKE clones structure only: empty, same schema, no data link") {
    val c = fresh()
    c.execute("CREATE TABLE ctl_src AS SELECT n_nationkey, n_name FROM nation")
    c.execute("CREATE TABLE ctl_dst LIKE ctl_src")
    val src = c.execute("SELECT * FROM ctl_src")
    val dst = c.execute("SELECT * FROM ctl_dst")
    assert(dst.count() === 0L)
    assert(dst.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // the clone is structurally independent: inserts land only in dst
    c.execute("INSERT INTO ctl_dst VALUES (99, 'X')")
    assert(c.execute("SELECT * FROM ctl_dst").count() === 1L)
    assert(c.execute("SELECT * FROM ctl_src").count() === 25L)
    intercept[Exception](c.execute("CREATE TABLE ctl_bad LIKE no_such_table"))
  }

  test("mindsdb.* meta-tables are SELECT-able relations, JOINable with WHERE") {
    val c = fresh()
    c.execute("CREATE ML_ENGINE fit FROM fit")
    c.execute("""CREATE MODEL meta_m1 PREDICT score USING
      features='l_quantity', weights='2.0', bias=0.0""")
    c.execute("CREATE JOB meta_j1 AS (SELECT 1) EVERY 1 day")
    val joined = c.execute("""SELECT m.name, e.handler
      FROM mindsdb.models m JOIN mindsdb.ml_engines e ON m.engine = e.name
      WHERE m.active""").collect()
    assert(joined.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("meta_m1", "fit")))
    assert(c.execute("SELECT name FROM mindsdb.jobs").first().getString(0) === "meta_j1")
    // read-only namespace
    intercept[Exception](c.execute("INSERT INTO mindsdb.models VALUES ('x')"))
  }

  test("KILL cancels a long-running statement via its tagged job group") {
    val c = fresh()
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    // a statement whose execution cannot finish in test time: a triple
    // cartesian of lineitem (~6k rows → 2×10^11 combinations)
    val fut = Future {
      intercept[Exception] {
        c.execute("""CREATE TABLE kill_never AS
          SELECT COUNT(*) AS n
          FROM lineitem a CROSS JOIN lineitem b CROSS JOIN lineitem c""")
      }
    }
    // wait for it to register as running, then KILL by id
    val deadline = System.currentTimeMillis() + 30000
    var id = -1L
    while (id < 0 && System.currentTimeMillis() < deadline) {
      val running = c.execute(
        "SELECT query_id FROM mindsdb.queries WHERE state = 'running' AND kind = 'CREATE'")
        .collect()
      if (running.nonEmpty) id = running.head.getLong(0) else Thread.sleep(100)
    }
    assert(id > 0, "CTAS never registered as running")
    c.execute(s"KILL $id")
    // the statement's Spark jobs are cancelled and the thread unblocks
    Await.result(fut, 60.seconds)
    val st = c.execute(s"SELECT state FROM mindsdb.queries WHERE query_id = $id")
      .first().getString(0)
    assert(st === "killed")
    // KILL of a completed id is a no-op answer, not an error
    val again = c.execute(s"KILL $id").first().getString(1)
    assert(again.contains("not running"))
  }
}

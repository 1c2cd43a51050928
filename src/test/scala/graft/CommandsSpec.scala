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
  }

  test("EXPLAIN / SET / USE dispatch") {
    val c = fresh()
    val ex = c.execute("EXPLAIN SELECT count(*) FROM region").first()
    assert(ex.getString(0).contains("Aggregate") && ex.getString(1).nonEmpty)
    c.execute("SET spark.sql.cbo.enabled = 'false'")
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false")
    assert(c.execute("USE graft").first().getString(0) === "ok")
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
}

package graft.queries

import graft.catalog.{Catalog, Warehouse}
import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Parity._

/** DML writes + views + information_schema pack (SURVEY §2.1 SaveToTable/
  * InsertToTable/UpdateToTable/DeleteStep/DataStep, §2.13 DDL surface;
  * reference insert_step.py, update_step.py, delete_step.py,
  * command_executor.py:1350-1425/:1577-1953, system_tables.py:48-543).
  *
  * Each query materializes into a FRESH temp warehouse, runs the real
  * write path (parquet write → read-back), and returns an
  * oracle-checkable aggregate of the final table state — so the oracle
  * verifies the write semantics, not just the plan.
  */
object WritesPack extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CTAS → read back (SaveToTable round trip)
    "w01_ctas_roundtrip" -> ((s, dir) => {
      val wh = Warehouse.temp(s)
      wh.createTableAs("big_orders",
        t(s, dir, "orders").filter(col("o_totalprice") > 200000), overwrite = true)
      wh.table("big_orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // UPDATE + DELETE as copy-on-write rewrites, then aggregate final state
    "w02_update_delete" -> ((s, dir) => {
      val wh = Warehouse.temp(s)
      wh.createTableAs("ord", t(s, dir, "orders"), overwrite = true)
      wh.update("ord",
        Map("o_totalprice" -> (col("o_totalprice") * 1.1)),
        col("o_orderstatus") === "O")
      wh.delete("ord", col("o_orderpriority") === "5-LOW")
      wh.table("ord")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // INSERT from select + INSERT literal VALUES (DataStep), then verify
    "w03_insert_append" -> ((s, dir) => {
      val wh = Warehouse.temp(s)
      val orders = t(s, dir, "orders")
      wh.createTableAs("ord", orders.filter(year(col("o_orderdate")) < 2000), overwrite = true)
      wh.insertInto("ord", orders.filter(year(col("o_orderdate")) >= 2000))
      // DataStep: literal VALUES → frame (sql_steps.py:34-41)
      val literals = s.createDataFrame(
        s.sparkContext.parallelize(Seq(
          Row(9000001L, 1L, "X", 111.5, java.sql.Timestamp.valueOf("2002-01-01 00:00:00"), "1-URGENT"),
          Row(9000002L, 2L, "X", 222.5, java.sql.Timestamp.valueOf("2002-06-01 00:00:00"), "2-HIGH")), 1),
        StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
          StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))))
      wh.insertInto("ord", literals)
      wh.table("ord")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("yr"))
    }),

    // partition-pruned UPDATE/DELETE: the table is laid out hive-style by
    // o_orderstatus; the predicates touch one partition each, so only
    // those directories rewrite (untouched-file proof in CatalogSpec)
    "w05_partitioned_dml" -> ((s, dir) => {
      val wh = Warehouse.temp(s)
      wh.createTableAs("pord", t(s, dir, "orders"), overwrite = true,
        partitionBy = Seq("o_orderstatus"))
      wh.update("pord",
        Map("o_totalprice" -> (col("o_totalprice") * 1.1)),
        col("o_orderstatus") === "O")
      wh.delete("pord", col("o_orderstatus") === "F" && col("o_orderpriority") === "5-LOW")
      wh.table("pord")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // CREATE TABLE with an explicit column list + literal VALUES inserts,
    // incl. a reordered column list (steps.py:243-255)
    "w04_create_table_cols" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE TABLE wt_w04 (k BIGINT, name STRING, price DOUBLE)")
      c.execute("INSERT INTO wt_w04 VALUES (1, 'alpha', 10.5), (2, 'beta', 20.25)")
      c.execute("INSERT INTO wt_w04 (name, k, price) VALUES ('gamma', 3, 30.125)")
      c.execute("SELECT k, name, price FROM wt_w04 ORDER BY k")
    }),

    // CREATE VIEW → query through it (filters push through the boundary)
    "v01_view_expand" -> ((s, dir) => {
      val cat = new Catalog(s, dir)
      cat.createView("customer_orders",
        t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey")))
      cat.resolve("customer_orders")
        .filter(col("c_mktsegment") === "BUILDING")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("c_nationkey"))
    }),

    // information_schema.columns over every base table
    "i01_info_columns" -> ((s, dir) => {
      new Catalog(s, dir).infoColumns()
        .select(col("table_name"), col("column_name"), col("ordinal_position"))
        .orderBy(col("table_name"), col("ordinal_position"))
    }),

    // SHOW TABLES (static catalog surface)
    "c01_show_tables" -> ((s, dir) => {
      new Catalog(s, dir).infoTables()
        .orderBy(col("table_name"))
    }),

    // information_schema as a SQL namespace: `FROM information_schema.tables`
    // resolves through the DSv2 catalog and sees warehouse tables + views
    // created a statement earlier (system_tables.py:48-543)
    "i02_info_schema_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE TABLE wt_i02 AS SELECT * FROM region")
      c.execute("CREATE VIEW v_i02 AS SELECT r_name FROM region")
      c.execute("""SELECT table_name, table_type FROM information_schema.tables
        ORDER BY table_name""")
    }),

    // SHOW breadth: every object-DDL route round-trips and surfaces in its
    // SHOW meta table (command_executor.py:1577-1953, mindsdb_tables.py)
    "c03_show_objects" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE DATABASE extdb_c03 ENGINE 'pg'")
      c.execute("""CREATE MODEL m_c03 PREDICT score USING
        features='l_quantity', weights='0.5', bias=1.0""")
      c.execute("CREATE KNOWLEDGE BASE kb_c03")
      c.execute("CREATE AGENT ag_c03 USING model='m_c03'")
      c.execute("CREATE TABLE wt_c03 AS SELECT * FROM region")
      c.execute("CREATE TRIGGER tr_c03 ON wt_c03 (SELECT 1)")
      c.execute("CREATE JOB j_c03 AS (SELECT 1) EVERY 1 day")
      c.execute("CREATE VIEW v_c03 AS SELECT r_name FROM region")
      val kinds = Seq(
        "agents" -> "SHOW AGENTS", "databases" -> "SHOW DATABASES",
        "engines" -> "SHOW ENGINES", "jobs" -> "SHOW JOBS",
        "knowledge_bases" -> "SHOW KNOWLEDGE BASES", "models" -> "SHOW MODELS",
        "triggers" -> "SHOW TRIGGERS", "views" -> "SHOW VIEWS")
      val rows = kinds.flatMap { case (kind, sql) =>
        c.execute(sql).collect().map(r => Row(kind, r.getString(0)))
      }
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("kind", StringType, nullable = false),
          StructField("name", StringType, nullable = false))))
        .orderBy(col("kind"), col("name"))
    }),

    // ANALYZE TABLE → data-catalog column statistics, served through the
    // information_schema namespace (interfaces/data_catalog/,
    // MetaDatabaseHandler meta_get_* at integrations/libs/base.py:178-341)
    "i03_analyze_stats" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("ANALYZE TABLE nation")
      c.execute("ANALYZE TABLE region")
      c.execute("""SELECT * FROM information_schema.column_statistics
        ORDER BY table_name, ordinal_position""")
    }),

    // information_schema.statistics / key_column_usage populated from
    // the physical layouts (system_tables.py:441, :423): partition
    // columns, bucket specs, and ANALYZE-filled cardinality, joined to
    // information_schema.columns for ordinal positions
    "i04_stats_layout" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE part_i04 PARTITIONED BY (o_orderstatus) AS
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders""")
      c.execute("""CREATE TABLE buck_i04 CLUSTERED BY (o_orderkey) INTO 4 BUCKETS AS
        SELECT o_orderkey, o_totalprice FROM orders""")
      c.execute("ANALYZE TABLE buck_i04")
      c.execute("""SELECT s.table_name, s.index_name, s.column_name, s.seq_in_index,
          s.cardinality, k.constraint_name, c.ordinal_position
        FROM information_schema.statistics s
        JOIN information_schema.key_column_usage k
          ON s.table_name = k.table_name AND s.column_name = k.column_name
        JOIN information_schema.columns c
          ON s.table_name = c.table_name AND s.column_name = c.column_name
        ORDER BY s.table_name, s.index_name, s.seq_in_index""")
    }),

    // equi-width histogram profiling — the distribution sketch behind the
    // data catalog's column statistics (the reference surfaces
    // most_common_values per column; an equi-width histogram is the form
    // that still works when the domain is continuous). Scale shape: one
    // min/max pass per column (map-side combinable) broadcast back, then
    // one combinable bucket count — two narrow aggregations, no sort, no
    // window, any corpus size.
    "i05_histogram" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def histOf(cn: String): DataFrame = {
        val b = li.agg(min(col(cn)).cast(DoubleType).as("mn"),
          max(col(cn)).cast(DoubleType).as("mx"))
        li.select(col(cn).cast(DoubleType).as("x")).crossJoin(broadcast(b))
          .select(least(floor((col("x") - col("mn")) * 10 / (col("mx") - col("mn"))),
            lit(9.0)).cast(LongType).as("bucket"), col("mn"), col("mx"))
          .groupBy(col("bucket"), col("mn"), col("mx")).agg(count(lit(1)).as("n"))
          .select(lit(cn).as("col_name"), col("bucket"),
            round(col("mn") + col("bucket") * (col("mx") - col("mn")) / 10, 4).as("lo"),
            round(col("mn") + (col("bucket") + 1) * (col("mx") - col("mn")) / 10, 4).as("hi"),
            col("n"))
      }
      histOf("l_quantity").union(histOf("l_extendedprice"))
        .orderBy(col("col_name"), col("bucket"))
    }),

    // SHOW PARTITIONS over a hive-layout warehouse table: the partition
    // inventory every engine exposes; one combinable count per value
    "i07_show_partitions" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE part_i07 PARTITIONED BY (o_orderstatus) AS
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders""")
      c.execute("SHOW PARTITIONS part_i07")
    }),

    // MySQL-compat catalog tables as SQL-queryable information_schema
    // members (system_tables.py:315-543): BI tools introspect ENGINES/
    // CHARACTER_SETS/COLLATIONS/EVENTS/ROUTINES via SELECT, not SHOW.
    // EVENTS is live off the job scheduler; ROUTINES lists the
    // registered SQL functions; the charset row joins its collation.
    "i08_mysql_catalog_tables" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE JOB ev_i08a AS (SELECT 1) EVERY 1 day")
      c.execute("CREATE JOB ev_i08b AS (SELECT 1) EVERY 2 hours")
      c.execute("""
        SELECT 'event' AS kind, event_name AS name, interval_field AS detail,
               status AS extra
        FROM information_schema.events
        UNION ALL
        SELECT 'routine', routine_name, data_type, is_deterministic
        FROM information_schema.routines
        UNION ALL
        SELECT 'engine', engine, support, transactions
        FROM information_schema.engines
        UNION ALL
        SELECT 'charset', cs.character_set_name, co.collation_name,
               CAST(cs.maxlen AS STRING)
        FROM information_schema.character_sets cs
        JOIN information_schema.collations co
          ON co.character_set_name = cs.character_set_name
        ORDER BY kind, name""")
    }),

    // information_schema.plugins (system_tables.py:383 PluginsTable):
    // the rows MySQL-protocol clients probe before anything else
    "i09_plugins" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""SELECT plugin_name, plugin_type, plugin_status, plugin_license
        FROM information_schema.plugins ORDER BY plugin_name""")
    }),

    // information_schema.META_TABLES / META_COLUMNS — the data-catalog
    // add-on tables (system_tables.py:515,543): ANALYZE loads the
    // catalog records, then both tables SELECT and JOIN against the
    // base information_schema namespace (reference column sets,
    // ROW_COUNT/type/nullability from the stored state + live schema)
    "i10_meta_catalog" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("ANALYZE TABLE nation")
      c.execute("ANALYZE TABLE region")
      c.execute("""SELECT m.TABLE_NAME AS table_name, m.TABLE_TYPE AS table_type,
          m.ROW_COUNT AS row_count, t.table_type AS info_type,
          c.COLUMN_NAME AS column_name, c.DATA_TYPE AS data_type,
          c.IS_NULLABLE AS is_nullable
        FROM information_schema.meta_tables m
        JOIN information_schema.tables t ON m.TABLE_NAME = t.table_name
        JOIN information_schema.meta_columns c ON m.TABLE_NAME = c.TABLE_NAME
        ORDER BY table_name, column_name""")
    }),

    // dynamic partition overwrite (Hive partitionOverwriteMode=dynamic):
    // refresh exactly the partitions the query produces — the daily-drop
    // re-ingest shape. Every untouched partition keeps its files
    // byte-for-byte (CatalogSpec proves the inode sharing); the oracle
    // states the expected post-state ('O' repriced, the rest original).
    "w16_dynamic_overwrite" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE dow16 PARTITIONED BY (o_orderstatus) AS
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders""")
      c.execute("""INSERT OVERWRITE dow16
        SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
        FROM orders WHERE o_orderstatus = 'O'""")
      c.execute("""SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM dow16 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // data-quality expectations report (Great-Expectations-style CHECK
    // suite — the validation gate a training pipeline runs before
    // ingesting a new drop): every scalar rule (nulls, ranges,
    // positivity) rides ONE conditional-aggregation scan of lineitem;
    // uniqueness of the (orderkey, linenumber) PK is an exact distinct
    // on the same aggregation tree; referential integrity is ONE
    // equi anti-join on the key (AQE-skew-safe shuffle — never a
    // broadcast of the 100 TB fact side, never a per-rule re-scan).
    "i06_dq_expectations" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val scalars = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("qty_null"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("qty_range"),
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("price_pos"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("ship_null"),
        (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
          .as("pk_dup"))
      val orphans = li.select(col("l_orderkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("fk_orphans"))
      scalars.crossJoin(orphans)
        .select(
          struct(lit("l_quantity_not_null").as("rule"), col("qty_null").as("v")).as("r1"),
          struct(lit("l_quantity_in_1_50").as("rule"), col("qty_range").as("v")).as("r2"),
          struct(lit("l_extendedprice_positive").as("rule"), col("price_pos").as("v")).as("r3"),
          struct(lit("l_shipdate_not_null").as("rule"), col("ship_null").as("v")).as("r4"),
          struct(lit("pk_orderkey_linenumber_unique").as("rule"), col("pk_dup").as("v")).as("r5"),
          struct(lit("fk_orderkey_in_orders").as("rule"), col("fk_orphans").as("v")).as("r6"),
          col("n"))
        .select(explode(array(col("r1"), col("r2"), col("r3"), col("r4"),
          col("r5"), col("r6"))).as("r"), col("n"))
        .select(col("r.rule").as("rule"), col("n").as("n_checked"),
          col("r.v").as("n_violations"),
          (col("r.v") === 0L).as("passed"))
        .orderBy(col("rule"))
    }),

    // Bucketed co-located join: both sides bucketed on the join key with
    // the same bucket count → the sort-merge join needs NO exchange on
    // either side (PlanShapeSpec asserts the plan). THE shuffle
    // eliminator for repeated big-big joins at 100 TB.
    "w06_bucketed_join" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE orders_b CLUSTERED BY (o_orderkey) INTO 8 BUCKETS AS
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""")
      c.execute("""CREATE TABLE lineitem_b CLUSTERED BY (l_orderkey) INTO 8 BUCKETS AS
        SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem""")
      s.table("orders_b")
        .join(s.table("lineitem_b").hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          Parity.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderstatus"))
    }),

    // MERGE INTO (upsert) — the DML verb the reference's INSERT/UPDATE/
    // DELETE trio lacks: matched keys take the SET assignment, unmatched
    // source rows insert. One join-based copy-on-write rewrite
    // (Warehouse.merge); +1000.00 keeps the arithmetic scale-exact so
    // neither engine rounds.
    "w07_merge_upsert" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE mt7 AS
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 100""")
      c.execute("""MERGE INTO mt7 t USING (
          SELECT o_orderkey, o_totalprice + 1000.00 AS o_totalprice, o_orderstatus
          FROM orders WHERE o_orderkey BETWEEN 51 AND 150) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT *""")
      c.execute(s"""SELECT CASE WHEN o_orderkey <= 50 THEN 'untouched'
            WHEN o_orderkey <= 100 THEN 'updated' ELSE 'inserted' END AS band,
          COUNT(*) AS n, ${Parity.oSum("o_totalprice")} AS total
        FROM mt7 GROUP BY 1 ORDER BY band""")
    }),

    // MERGE as a FULL SYNC (Delta's WHEN NOT MATCHED BY SOURCE THEN
    // DELETE): one statement reconciles the target to the source —
    // matched rows update, new rows insert, rows the source no longer
    // has are deleted. All three paths ride the same two joins as plain
    // MERGE (no extra scan for the delete side).
    "w17_merge_full_sync" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE ms17 AS
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 400""")
      c.execute("""MERGE INTO ms17 t USING (
          SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
          FROM orders WHERE o_orderkey > 200 AND o_orderkey <= 600) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      c.execute(s"""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
          ${Parity.oSum("o_totalprice")} AS total
        FROM ms17 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // UPDATE … FROM (SELECT …) — the reference's join-update form
    // (tests/unit/executor/test_executor.py test_update_from_select: SET
    // references the subquery alias, WHERE is the target↔source match).
    // Runs through the SQL route so the parse + the left-join
    // copy-on-write rewrite are both on the oracle path.
    "w18_update_from_select" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE uf18 AS
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders""")
      c.execute("""UPDATE uf18 SET o_totalprice = df.item_total FROM (
          SELECT l_orderkey,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS item_total
          FROM lineitem GROUP BY l_orderkey) AS df
        WHERE uf18.o_orderkey = df.l_orderkey""")
      c.execute(s"""SELECT o_orderstatus, COUNT(*) AS n,
          ${Parity.oSum("o_totalprice")} AS total
        FROM uf18 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // Incremental materialized view (jobs + `WHERE ts > LAST` composed
    // into one engine object, jobs_controller.py:104 +
    // context_controller.py:293-344): CREATE runs the initial full
    // refresh; the REFRESH after the insert scans ONLY rows past the
    // stored watermark and merges map-side-combinable partials
    // (count+count, sum+sum, max(max) — MaterializedViews). The final
    // state must equal the oracle's full recompute over all events.
    "w08_incremental_mv" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE ev_w08 AS
        SELECT * FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'""")
      c.execute("""CREATE MATERIALIZED VIEW mv_w08 TRACK ts AS (
        SELECT event_type, date_trunc('DAY', ts) AS day,
          count(*) AS n_events,
          sum(CAST(value AS DECIMAL(18,4))) AS total_value,
          max(value) AS max_value
        FROM ev_w08 GROUP BY event_type, day)""")
      c.execute("""INSERT INTO ev_w08
        SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'""")
      c.execute("REFRESH MATERIALIZED VIEW mv_w08")
      c.execute("""SELECT event_type, day, n_events,
          CAST(total_value AS DOUBLE) AS total_value, max_value
        FROM mv_w08 ORDER BY event_type, day""")
    }),

    // Time travel over the warehouse's hard-linked snapshot history
    // (Delta/Iceberg `VERSION AS OF`; the reference has no table
    // history): three commits — CTAS (v0 state), UPDATE (v1), DELETE
    // (v2 = live) — then one statement reads all three versions side by
    // side. Snapshots share untouched file inodes with the live copy
    // (hard links), so history is metadata-priced, not byte-priced.
    "w09_time_travel" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE tt9 AS
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 300""")
      c.execute("UPDATE tt9 SET o_totalprice = o_totalprice * 2 WHERE o_orderstatus = 'O'")
      c.execute("DELETE FROM tt9 WHERE o_orderkey % 3 = 0")
      c.execute(s"""SELECT v, COUNT(*) AS n, ${Parity.oSum("o_totalprice")} AS total
        FROM (SELECT 0 AS v, o_totalprice FROM tt9 FOR VERSION AS OF 0
          UNION ALL SELECT 1 AS v, o_totalprice FROM tt9 FOR VERSION AS OF 1
          UNION ALL SELECT 2 AS v, o_totalprice FROM tt9)
        GROUP BY v ORDER BY v""")
    }),

    // Zero-copy SHALLOW CLONE (Delta-style): the clone materializes as
    // hard links in metadata time — no bytes move at any table size.
    // Both sides then mutate DIFFERENTLY; the final read proves full
    // divergence (copy-on-write DML never touches a shared inode).
    "w12_shallow_clone" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE cl12 AS
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 300""")
      c.execute("CREATE TABLE cl12c SHALLOW CLONE cl12")
      c.execute("UPDATE cl12 SET o_totalprice = o_totalprice * 2 WHERE o_orderstatus = 'O'")
      c.execute("DELETE FROM cl12c WHERE o_orderkey % 2 = 0")
      c.execute(s"""SELECT side, COUNT(*) AS n, ${Parity.oSum("o_totalprice")} AS total
        FROM (SELECT 'src' AS side, o_totalprice FROM cl12
          UNION ALL SELECT 'clone' AS side, o_totalprice FROM cl12c)
        GROUP BY side ORDER BY side""")
    }),

    // SHOW CREATE TABLE: reproducible DDL rendered from the physical
    // layout (schema + hive partition column), MySQL result shape —
    // the oracle states the expected DDL literally
    "c12_show_create" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE sc12 PARTITIONED BY (o_orderstatus) AS
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders""")
      c.execute("SHOW CREATE TABLE sc12")
    }),

    // Multi-statement TRANSACTIONS over the snapshot log (beyond the
    // reference, whose BEGIN/COMMIT/ROLLBACK dispatch is a no-op): the
    // first transaction's UPDATE + DELETE are ROLLED BACK — the final
    // read must show no trace of them; the second transaction COMMITs.
    // Rollback restores pre-image versions by hard link — O(metadata)
    // per touched table at any size, zero data copied.
    "w15_transactions" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE txn15 AS
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 400""")
      c.execute("BEGIN")
      c.execute("UPDATE txn15 SET o_totalprice = o_totalprice * 10 WHERE o_orderstatus = 'F'")
      c.execute("DELETE FROM txn15 WHERE o_orderkey % 2 = 0")
      c.execute("ROLLBACK")
      c.execute("BEGIN")
      c.execute("UPDATE txn15 SET o_totalprice = o_totalprice * 2 WHERE o_orderstatus = 'O'")
      c.execute("COMMIT")
      c.execute(s"""SELECT o_orderstatus, COUNT(*) AS n,
          ${Parity.oSum("o_totalprice")} AS total
        FROM txn15 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // SCD Type-2 history build (Kimball dimension versioning; beyond the
    // reference's plain INSERT/UPDATE writeback): each user's event_type
    // run becomes one version row with valid_from/valid_to/is_current —
    // re-observations of an unchanged state do NOT open versions, so
    // history scales with changes, not observations. Aggregated per
    // event_type for the oracle.
    "w10_scd2_history" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      graft.engine.Scd.history(ev, col("user_id"), col("ts"), col("event_id"),
          Seq(col("event_type")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"),
          countDistinct(col("key")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // OPTIMIZE compaction (Delta OPTIMIZE analog): a partitioned table
    // fed by four small appends accumulates task-count files per
    // partition; compaction coalesces each partition directory to one
    // file WITHOUT changing contents — the oracle recomputes the same
    // aggregate straight from orders, proving content preservation. The
    // file-count drop itself is asserted in CatalogSpec.
    "w11_optimize_compact" -> ((s, dir) => {
      val wh = Warehouse.temp(s)
      val orders = t(s, dir, "orders")
      wh.createTableAs("opt", orders.filter(year(col("o_orderdate")) < 1996),
        overwrite = true, partitionBy = Seq("o_orderstatus"))
      (1996 to 1998).foreach(y =>
        wh.insertInto("opt", orders.filter(year(col("o_orderdate")) === y)))
      wh.insertInto("opt", orders.filter(year(col("o_orderdate")) > 1998))
      wh.optimize("opt")
      wh.table("opt")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // Data catalog: the reference's DataCatalogRetriever assembles
    // tables + columns + column statistics into one metadata view for
    // LLM/agent consumption (data_catalog_retriever.py:46-72). Here the
    // same join composes in SQL over the live information_schema
    // namespace after ANALYZE populates the stats.
    "c08_data_catalog" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("ANALYZE TABLE nation")
      c.execute("ANALYZE TABLE region")
      c.execute("""SELECT c.table_name, c.column_name, c.ordinal_position,
          c.data_type, s.n_rows, s.n_nulls, s.n_distinct, s.min_value, s.max_value
        FROM information_schema.columns c
        JOIN information_schema.column_statistics s
          ON c.table_name = s.table_name AND c.column_name = s.column_name
        ORDER BY c.table_name, c.ordinal_position""")
    }),

    // Chatbot + ML-engine DDL surface with transaction no-ops
    // (command_executor.py:774-838 chatbots, :1171-1236 ml engines,
    // StartTransaction/Commit/Rollback no-op dispatch)
    "c05_chatbot_mlengine" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("START TRANSACTION")
      c.execute("CREATE DATABASE chatdb_c05 ENGINE 'pg'")
      c.execute("CREATE ML_ENGINE eng_c05 FROM fit USING task='regression'")
      c.execute("CREATE AGENT ag_c05 USING model='m'")
      c.execute("CREATE CHATBOT cb_c05 USING database='chatdb_c05', agent='ag_c05'")
      c.execute("UPDATE CHATBOT cb_c05 SET model='m2'")
      c.execute("COMMIT")
      val bots = c.execute("SHOW CHATBOTS").collect().map(r => Row("chatbot",
        r.getString(0), Seq(r.getString(1), r.getString(2), r.getString(3),
          r.getBoolean(4).toString).mkString("|")))
      val engines = c.execute("SHOW ML_ENGINES").collect().map(r =>
        Row("ml_engine", r.getString(0), Seq(r.getString(1), r.getString(2)).mkString("|")))
      val handlers = c.execute("SHOW HANDLERS").collect().map(r =>
        Row("handler", r.getString(0), r.getString(1)))
      val warnings = Seq(Row("warnings", "count",
        c.execute("SHOW WARNINGS").count().toString))
      s.createDataFrame(
        s.sparkContext.parallelize((bots ++ engines ++ handlers ++ warnings).toSeq, 1),
        StructType(Seq(StructField("kind", StringType, nullable = false),
          StructField("name", StringType, nullable = false),
          StructField("detail", StringType, nullable = false))))
        .orderBy(col("kind"), col("name"))
    }),

    // ALTER breadth: view redefinition, database + KB param merges
    // (command_executor.py:633 AlterView, :1308 AlterDatabase,
    // :1455 answer_alter_kb)
    "c06_alter_surface" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE VIEW v_c06 AS SELECT r_name FROM region WHERE r_regionkey < 2")
      c.execute("ALTER VIEW v_c06 AS SELECT r_name FROM region WHERE r_regionkey >= 2")
      c.execute("CREATE DATABASE db_c06 ENGINE 'pg', PARAMETERS = host='h1'")
      c.execute("ALTER DATABASE db_c06 port='5432'")
      c.execute("CREATE KNOWLEDGE BASE kb_c06 USING content_columns='text'")
      c.execute("ALTER KNOWLEDGE BASE kb_c06 USING chunk_size='300'")
      val viewRows = c.execute("SELECT r_name FROM v_c06").collect()
        .map(r => Row("view_row", r.getString(0)))
      val dbParams = Seq(Row("db_param",
        c.catalog.database("db_c06").get.params.toSeq.sorted
          .map { case (k, v) => s"$k=$v" }.mkString(",")))
      val kbParams = c.execute("SHOW KNOWLEDGE_BASES").collect()
        .map(r => Row("kb_param", r.getString(2)))
      s.createDataFrame(
        s.sparkContext.parallelize((viewRows ++ dbParams ++ kbParams).toSeq, 1),
        StructType(Seq(StructField("kind", StringType, nullable = false),
          StructField("value", StringType, nullable = false))))
        .orderBy(col("kind"), col("value"))
    }),

    // Projects: mindsdb-engine databases with their own SHOW verb
    // (command_executor.py:895 global objects; databases_controller
    // projects = databases WHERE engine = 'mindsdb')
    "c07_projects" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE PROJECT proj_c07")
      c.execute("CREATE DATABASE extdb_c07 ENGINE 'pg'")
      val projects = c.execute("SHOW PROJECTS").collect()
        .map(r => Row("project", r.getString(0)))
      val dbs = c.execute("SHOW DATABASES").collect()
        .map(r => Row("database", s"${r.getString(0)}|${r.getString(2)}"))
      c.execute("DROP PROJECT proj_c07")
      val after = c.execute("SHOW PROJECTS").collect()
        .map(r => Row("after_drop", r.getString(0)))
      s.createDataFrame(
        s.sparkContext.parallelize((projects ++ dbs ++ after).toSeq, 1),
        StructType(Seq(StructField("kind", StringType, nullable = false),
          StructField("name", StringType, nullable = false))))
        .orderBy(col("kind"), col("name"))
    }),

    // DESCRIBE MODEL attribute access (command_executor.py:931-966):
    // .info / .features / .model each return their deterministic frame
    "c09_describe_model" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE MODEL dm_c09 PREDICT score USING
        features='l_quantity,l_discount', weights='0.5,2.0', bias=1.25""")
      val rows =
        c.execute("DESCRIBE MODEL dm_c09.info").collect()
          .map(r => Row("info", r.getString(0), r.getString(1))) ++
        c.execute("DESCRIBE MODEL dm_c09.features").collect()
          .map(r => Row("features", r.getString(0), r.getString(1))) ++
        c.execute("DESCRIBE MODEL dm_c09.1.model").collect()
          .map(r => Row("model", r.getString(0), r.getString(1)))
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toSeq, 1),
        StructType(Seq(StructField("attr", StringType, nullable = false),
          StructField("part", StringType, nullable = false),
          StructField("value", StringType, nullable = false))))
        .orderBy(col("attr"), col("part"), col("value"))
    }),

    // OPTIMIZE … ZORDER BY: rows re-clustered along a Morton curve so
    // every file covers a small hyper-rectangle of (custkey, totalprice)
    // — selective predicates on EITHER column prune files via parquet
    // min/max stats (CatalogSpec proves the two-dimensional pruning);
    // the oracle verifies the rewrite preserved content exactly
    "w14_zorder" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE zt14 AS
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders""")
      c.execute("OPTIMIZE zt14 ZORDER BY (o_custkey, o_totalprice) INTO 8 FILES")
      c.execute(s"""SELECT COUNT(*) AS n,
          CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
          CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
          ${Parity.oSum("o_totalprice")} AS total
        FROM zt14""")
    }),

    // Schema evolution as metadata-only ALTERs (Delta/Iceberg model —
    // no data file rewritten at any table size): ADD COLUMN surfaces its
    // DEFAULT for pre-ALTER files, RENAME coalesces old-name files into
    // the new name, DROP projects away; post-ALTER inserts carry the
    // evolved schema and read back merged
    "w13_schema_evolution" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE TABLE ev13 AS
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 200""")
      c.execute("ALTER TABLE ev13 ADD COLUMN channel STRING DEFAULT 'web'")
      c.execute("INSERT INTO ev13 VALUES (9000001, 123.5, 'O', 'store')")
      c.execute("ALTER TABLE ev13 RENAME COLUMN o_totalprice TO price")
      c.execute("ALTER TABLE ev13 DROP COLUMN o_orderstatus")
      c.execute(s"""SELECT channel, COUNT(*) AS n, ${Parity.oSum("price")} AS total
        FROM ev13 GROUP BY channel ORDER BY channel""")
    }),

    // Text2SQL-skill agent (Skills table db.py:434, agent_skills
    // db.py:423): the skill restricts the agent to an allowlist of
    // tables; the question resolves against the allowlist and the answer
    // is computed by a real aggregation over the named table. The
    // per-table profile is ONE broadcast row per table — question rows
    // never scan the data tables.
    "a04_skill_text2sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("""CREATE SKILL sk_a04 USING type='text2sql',
        database='graft', tables='orders,customer'""")
      c.execute("CREATE AGENT sqa_a04 USING model='default', skills='sk_a04'")
      c.execute("SELECT question, answer FROM sqa_a04 WHERE question = 'how many rows are in customer?'")
    }),

    // SHOW SKILLS after a create/update/drop lifecycle
    "c11_show_skills" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE SKILL sk1_c11 USING type='text2sql', database='graft', tables='orders'")
      c.execute("CREATE SKILL sk2_c11 USING type='knowledge_base', source='kbx'")
      c.execute("CREATE SKILL sk3_c11 USING type='text2sql', tables='region'")
      c.execute("UPDATE SKILL sk1_c11 SET tables='orders,lineitem'")
      c.execute("DROP SKILL sk3_c11")
      c.execute("SHOW SKILLS")
    }),

    // The session's executed-statement log as a queryable table —
    // the reference's QUERIES meta table (mindsdb_tables.py:430):
    // every statement routed through execute() records id, kind,
    // normalized text, and ok/error status; errors carry the message
    "c10_query_log" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE TABLE wt_c10 AS SELECT * FROM region")
      c.execute("SELECT COUNT(*) AS n FROM wt_c10")
      try c.execute("DROP VIEW nope_c10")
      catch { case _: Exception => () }
      c.execute("""SELECT query_id, kind, statement, status, error
        FROM log.queries ORDER BY query_id""")
    }),

    // the mindsdb.* meta-tables as REAL relations (mindsdb_tables.py:
    // 42-430): models × ml_engines JOINed with a WHERE through Spark's
    // multi-catalog resolution — what BI tools and scripts do, beyond
    // the SHOW verbs
    "c13_meta_tables_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE ML_ENGINE fit FROM fit USING runtime='native'")
      c.execute("CREATE ML_ENGINE anomaly FROM anomaly")
      c.execute("""CREATE MODEL mdl_c13a PREDICT score USING
        features='l_quantity', weights='0.5', bias=1.0""")
      c.execute("""CREATE MODEL mdl_c13b FROM (SELECT l_quantity, l_discount
        FROM lineitem) PREDICT l_discount USING engine='anomaly',
        features='l_discount'""")
      c.execute("""SELECT m.name, m.engine, e.handler
        FROM mindsdb.models m JOIN mindsdb.ml_engines e ON m.engine = e.name
        WHERE m.active ORDER BY m.name""")
    }),

    // the live processlist (mindsdb.queries + KILL, mindsdb_tables.py:
    // 430): per-statement lifecycle rows; the running SELECT itself is
    // excluded by its state, completed rows are deterministic
    "c14_query_processlist" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE TABLE wt_c14 AS SELECT * FROM region")
      c.execute("SELECT COUNT(*) AS n FROM wt_c14")
      try c.execute("DROP VIEW nope_c14")
      catch { case _: Exception => () }
      c.execute("""SELECT query_id, kind, state FROM mindsdb.queries
        WHERE state <> 'running' ORDER BY query_id""")
    }),

    // CREATE DATABASE … ENGINE='derby' binds a LIVE JDBC catalog: the
    // reference's external-database lifecycle (command_executor.py:1260 →
    // postgres_handler), with embedded Derby as the engine — the GROUP BY
    // below executes INSIDE the remote database (aggregate pushdown)
    "c15_jdbc_database_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      graft.federation.JdbcDb.seedFromParquet(s, dir, "nation")
      c.execute("CREATE DATABASE extdb_c15 WITH ENGINE='derby', " +
        s"PARAMETERS = database='${graft.federation.JdbcDb.dbName(dir)}'")
      c.execute("""SELECT n_regionkey, COUNT(*) AS n
        FROM extdb_c15.APP.NATION GROUP BY n_regionkey ORDER BY n_regionkey""")
    }),

    // the MySQL wire-protocol entry point END-TO-END: a live loopback
    // socket server (the reference's primary interface —
    // mysql_proxy.py:594), a raw-packet client handshake, COM_QUERY over
    // the text protocol, and the decoded result re-typed into a frame.
    // Every value in this result crossed the wire as MySQL packets.
    "c16_mysql_wire" -> ((s, dir) => {
      val srv = new graft.server.MysqlServer(s, dir).start()
      try {
        val cl = new graft.server.MysqlClient("127.0.0.1", srv.boundPort)
        try {
          val Right(rs) = cl.query(
            """SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
               FROM lineitem GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus"""): @unchecked
          val sp = s; import sp.implicits._
          rs.rows.map(r => (r(0), r(1), r(2).toLong, r(3).toDouble))
            .toDF("l_returnflag", "l_linestatus", "n", "sum_qty")
        } finally cl.close()
      } finally srv.stop()
    }),

    // the binary prepared-statement protocol END-TO-END: COM_STMT_PREPARE
    // + COM_STMT_EXECUTE with typed params (double + string), binary
    // result rows decoded back — the reference's planner/query_prepare.py
    // surface over the socket
    "c18_mysql_stmt" -> ((s, dir) => {
      val srv = new graft.server.MysqlServer(s, dir).start()
      try {
        val cl = new graft.server.MysqlClient("127.0.0.1", srv.boundPort)
        try {
          val id = cl.prepare(
            """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
               FROM orders WHERE o_totalprice > ? AND o_orderpriority = ?
               GROUP BY o_orderstatus ORDER BY o_orderstatus""")
          val Right(rs) = cl.executePrepared(id,
            Seq(100000.0, "1-URGENT")): @unchecked
          cl.closeStatement(id)
          val sp = s; import sp.implicits._
          rs.rows.map(r => (r(0), r(1).toLong, r(2).toDouble))
            .toDF("o_orderstatus", "n", "total")
        } finally cl.close()
      } finally srv.stop()
    }),

    // the HTTP REST entry point END-TO-END: a live JDK HttpServer, a
    // real POST /api/sql/query request, and the reference's JSON table
    // envelope (sql.py:39-130 / sql_answer.py dump_http_response) parsed
    // back into a frame — every value crossed HTTP as JSON
    "c17_http_sql" -> ((s, dir) => {
      val api = new graft.server.HttpApi(s, dir).start()
      try {
        val http = java.net.http.HttpClient.newHttpClient()
        val sql = """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
          FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""
        val resp = http.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"http://127.0.0.1:${api.boundPort}/api/sql/query"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              graft.server.Json.write(graft.server.Json.obj(
                "query" -> graft.server.Json.str(sql))))).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200, s"http ${resp.statusCode()}")
        val env = graft.server.Json.parse(resp.body())
        require(env("type").asString == "table", resp.body().take(200))
        val rows = env("data").asArray.map { r =>
          val a = r.asArray
          (a(0).asString,
            a(1).asInstanceOf[graft.server.Json.Num].n.toLong,
            a(2).asInstanceOf[graft.server.Json.Num].n)
        }
        val sp = s; import sp.implicits._
        rows.toDF("c_mktsegment", "n", "total_bal")
      } finally api.stop()
    }),

    // /api/analysis/query end-to-end (namespaces/analysis.py:44-98):
    // the per-column insight envelope computed by the endpoint over a
    // posted query, reconstructed as rows and hash-matched against the
    // oracle's own stats — nr_rows, missing, exact distinct, min/max
    // all route through the live HTTP server
    "c21_http_analysis" -> ((s, dir) => {
      val api = new graft.server.HttpApi(s, dir).start()
      try {
        val http = java.net.http.HttpClient.newHttpClient()
        val q = "SELECT l_quantity, l_discount, l_returnflag FROM lineitem"
        val resp = http.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"http://127.0.0.1:${api.boundPort}/api/analysis/query"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              graft.server.Json.write(graft.server.Json.obj(
                "query" -> graft.server.Json.str(q))))).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200, s"http ${resp.statusCode()}")
        val env = graft.server.Json.parse(resp.body())
        val analysis = env("analysis")
        val nr = analysis("nr_rows").asInstanceOf[graft.server.Json.Num].n.toLong
        require(env("tables").asArray.map(_.asString) == Seq("lineitem"))
        val cols = analysis("columns")
        val rows = Seq("l_quantity", "l_discount", "l_returnflag").map { cn =>
          val c = cols(cn)
          def numOf(v: graft.server.Json.Value): Double =
            v.asInstanceOf[graft.server.Json.Num].n
          val mnmx: Option[(Double, Double)] = c match {
            case o: graft.server.Json.Obj if o.fields.contains("min") =>
              Some((numOf(c("min")), numOf(c("max"))))
            case _ => None
          }
          (cn, nr, numOf(c("missing")("count")).toLong,
            numOf(c("distinct")).toLong,
            mnmx.map(x => math.rint(x._1 * 10000) / 10000),
            mnmx.map(x => math.rint(x._2 * 10000) / 10000))
        }
        val sp = s; import sp.implicits._
        rows.toDF("column_name", "nr_rows", "n_missing", "n_distinct",
          "min_v", "max_v").orderBy(col("column_name"))
      } finally api.stop()
    }),

    // OpenAI-compatible /v1/chat/completions end-to-end: the litellm
    // entry point (api/litellm/start.py: model = agent name) over a
    // text2sql-skilled agent — the completion's grounding aggregate
    // (row count of the named table) hash-matches the oracle, proving
    // the HTTP envelope, the agent dispatch, and the skill's real
    // aggregation in one pass
    "c19_chat_completions" -> ((s, dir) => {
      val api = new graft.server.HttpApi(s, dir).start()
      try {
        val http = java.net.http.HttpClient.newHttpClient()
        def post(path: String, body: String) = http.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"http://127.0.0.1:${api.boundPort}$path"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        def sql(q: String): Unit = {
          val r = post("/api/sql/query", graft.server.Json.write(
            graft.server.Json.obj("query" -> graft.server.Json.str(q))))
          require(r.statusCode() == 200, r.body().take(200))
        }
        sql("""CREATE SKILL sk_c19 USING type='text2sql',
          database='graft', tables='orders,customer'""")
        sql("CREATE AGENT chat_c19 USING model='default', skills='sk_c19'")
        val question = "how many rows are in customer?"
        val resp = post("/v1/chat/completions", graft.server.Json.write(
          graft.server.Json.obj(
            "model" -> graft.server.Json.str("chat_c19"),
            "messages" -> graft.server.Json.arr(graft.server.Json.obj(
              "role" -> graft.server.Json.str("user"),
              "content" -> graft.server.Json.str(question))))))
        require(resp.statusCode() == 200, resp.body().take(200))
        val env = graft.server.Json.parse(resp.body())
        val choice = env("choices").asArray.head
        val sp = s; import sp.implicits._
        Seq((question,
          choice("message")("content").asString,
          choice("finish_reason").asString,
          env("object").asString))
          .toDF("question", "answer", "finish_reason", "obj")
      } finally api.stop()
    }),

    // Tenant isolation (company boundary): same-named databases created
    // under two tenants, each tenant's mindsdb.databases listing scoped
    // to its own catalog — the reference's company_id independence
    // (test_company_independent.py), here by per-tenant catalog triples
    // with execute-time meta-table rebinding
    "c20_tenant_isolation" -> ((s, dir) => {
      val tenants = new graft.catalog.Tenants(s, dir,
        graft.catalog.Tenants.State(new Catalog(s, dir),
          Warehouse.temp(s), new graft.incremental.Jobs))
      val a = tenants.of("acme")
      val b = tenants.of("globex")
      val ca = new graft.sqlx.Commands(s, a.catalog, a.warehouse, a.jobs)
      val cb = new graft.sqlx.Commands(s, b.catalog, b.warehouse, b.jobs)
      ca.execute("CREATE DATABASE conn_shared WITH ENGINE='mem'")
      ca.execute("CREATE DATABASE conn_acme WITH ENGINE='mem'")
      cb.execute("CREATE DATABASE conn_shared WITH ENGINE='mem'")
      cb.execute("CREATE DATABASE conn_globex WITH ENGINE='mem'")
      import org.apache.spark.sql.functions.lit
      val da = ca.execute(
        "SELECT name, engine FROM mindsdb.databases WHERE name LIKE 'conn_%'")
      val db2 = cb.execute(
        "SELECT name, engine FROM mindsdb.databases WHERE name LIKE 'conn_%'")
      da.withColumn("tenant", lit("acme"))
        .unionAll(db2.withColumn("tenant", lit("globex")))
        .select("tenant", "name", "engine")
        .orderBy("tenant", "name")
    }),

    // information_schema.columns through SQL, covering a warehouse table
    "c04_info_columns_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s, new Catalog(s, dir), Warehouse.temp(s))
      c.execute("CREATE TABLE wt_c04 AS SELECT * FROM region")
      c.execute("""SELECT table_name, column_name, ordinal_position
        FROM information_schema.columns
        WHERE table_name IN ('region', 'nation', 'wt_c04')
        ORDER BY table_name, ordinal_position""")
    })
  )

  def oracles: Map[String, String] = Map(

    // same bucket arithmetic, literally: identical expression text means
    // identical IEEE operation order, so bucket edges agree bit-for-bit
    "i05_histogram" -> """
      WITH b1 AS (SELECT CAST(MIN(l_quantity) AS DOUBLE) AS mn,
                         CAST(MAX(l_quantity) AS DOUBLE) AS mx FROM lineitem),
      b2 AS (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS mn,
                    CAST(MAX(l_extendedprice) AS DOUBLE) AS mx FROM lineitem),
      h1 AS (
        SELECT col_name, bucket, mn, mx, COUNT(*) AS n FROM (
          SELECT 'l_quantity' AS col_name,
            CAST(LEAST(FLOOR(((CAST(l_quantity AS DOUBLE) - mn) * 10) / (mx - mn)), 9) AS BIGINT) AS bucket,
            mn, mx
          FROM lineitem, b1)
        GROUP BY col_name, bucket, mn, mx),
      h2 AS (
        SELECT col_name, bucket, mn, mx, COUNT(*) AS n FROM (
          SELECT 'l_extendedprice' AS col_name,
            CAST(LEAST(FLOOR(((CAST(l_extendedprice AS DOUBLE) - mn) * 10) / (mx - mn)), 9) AS BIGINT) AS bucket,
            mn, mx
          FROM lineitem, b2)
        GROUP BY col_name, bucket, mn, mx)
      SELECT col_name, bucket,
        ROUND(mn + bucket * (mx - mn) / 10, 4) AS lo,
        ROUND(mn + (bucket + 1) * (mx - mn) / 10, 4) AS hi, n
      FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
      ORDER BY col_name, bucket""",

    "i07_show_partitions" -> """
      SELECT 'o_orderstatus' AS partition_column,
        CAST(o_orderstatus AS VARCHAR) AS partition_value,
        COUNT(*) AS n_rows
      FROM orders GROUP BY o_orderstatus ORDER BY partition_value""",

    // the MySQL-compat catalog rows are deterministic by construction
    "i08_mysql_catalog_tables" -> """
      SELECT * FROM (VALUES
        ('charset', 'latin1', 'latin1_swedish_ci', '1'),
        ('charset', 'utf8', 'utf8_general_ci', '3'),
        ('engine', 'InnoDB', 'DEFAULT', 'YES'),
        ('event', 'ev_i08a', 'DAY', 'ENABLED'),
        ('event', 'ev_i08b', 'HOURS', 'ENABLED'),
        ('routine', 'doc_hash', 'varchar', 'YES'),
        ('routine', 'hll_estimate', 'double', 'YES'),
        ('routine', 'hll_registers', 'binary', 'YES'),
        ('routine', 'hll_union_estimate', 'double', 'YES'),
        ('routine', 'llm', 'varchar', 'YES'),
        ('routine', 'to_markdown', 'varchar', 'YES'),
        ('routine', 'topk_pairs', 'array<struct<key:bigint,payload:bigint>>', 'YES')
      ) AS t(kind, name, detail, extra)
      ORDER BY kind, name""",

    // row counts computed live from the same parquet; types/nullability
    // are the fixed schema facts of the test tables
    "i10_meta_catalog" -> """
      WITH m AS (
        SELECT 'nation' AS tn, CAST(COUNT(*) AS BIGINT) AS rc FROM nation
        UNION ALL
        SELECT 'region' AS tn, CAST(COUNT(*) AS BIGINT) AS rc FROM region),
      cols(tn, column_name, data_type) AS (VALUES
        ('nation', 'n_nationkey', 'INT'),
        ('nation', 'n_name', 'STRING'),
        ('nation', 'n_regionkey', 'INT'),
        ('region', 'r_regionkey', 'INT'),
        ('region', 'r_name', 'STRING'))
      SELECT m.tn AS table_name, 'BASE TABLE' AS table_type, m.rc AS row_count,
        'BASE TABLE' AS info_type, c.column_name, c.data_type,
        'YES' AS is_nullable
      FROM m JOIN cols c ON m.tn = c.tn
      ORDER BY table_name, column_name""",

    "i09_plugins" -> """
      SELECT * FROM (VALUES
        ('InnoDB', 'STORAGE ENGINE', 'ACTIVE', 'GPL'),
        ('mysql_native_password', 'AUTHENTICATION', 'ACTIVE', 'GPL')
      ) AS t(plugin_name, plugin_type, plugin_status, plugin_license)
      ORDER BY plugin_name""",

    // post-state after replacing only the 'O' partition
    "w16_dynamic_overwrite" -> """
      WITH t AS (
        SELECT o_orderkey,
          CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice,
          o_orderstatus
        FROM orders)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // one conditional-aggregation pass + one anti-join, same rules
    "i06_dq_expectations" -> """
      WITH s AS (
        SELECT COUNT(*) AS n,
          SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS qty_null,
          SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS qty_range,
          SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS price_pos,
          SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS ship_null,
          COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS pk_dup
        FROM lineitem),
      o AS (
        SELECT COUNT(*) AS fk_orphans FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      r AS (
        SELECT 'l_quantity_not_null' AS rule, CAST(qty_null AS BIGINT) AS v, n FROM s
        UNION ALL SELECT 'l_quantity_in_1_50', CAST(qty_range AS BIGINT), n FROM s
        UNION ALL SELECT 'l_extendedprice_positive', CAST(price_pos AS BIGINT), n FROM s
        UNION ALL SELECT 'l_shipdate_not_null', CAST(ship_null AS BIGINT), n FROM s
        UNION ALL SELECT 'pk_orderkey_linenumber_unique', CAST(pk_dup AS BIGINT), n FROM s
        UNION ALL SELECT 'fk_orderkey_in_orders', CAST(fk_orphans AS BIGINT), n
          FROM o, s)
      SELECT rule, CAST(n AS BIGINT) AS n_checked, v AS n_violations,
        v = 0 AS passed
      FROM r ORDER BY rule""",

    "c12_show_create" -> """
      SELECT 'sc12' AS tbl,
        'CREATE TABLE `sc12` (' || chr(10) ||
        '  `o_orderkey` BIGINT,' || chr(10) ||
        '  `o_totalprice` DOUBLE,' || chr(10) ||
        '  `o_orderstatus` STRING' || chr(10) ||
        ')' || chr(10) ||
        'PARTITIONED BY (`o_orderstatus`)' AS create_stmt""",

    // only the COMMITTED update survives: the rolled-back ×10/delete
    // must leave no trace
    "w15_transactions" -> s"""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 400),
      fin AS (
        SELECT o_orderstatus,
          CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice
        FROM base)
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // each version recomputed straight from orders: v0 = the CTAS
    // subset, v1 = after the doubled-O update, v2 = after the delete
    "w12_shallow_clone" -> s"""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 300),
      src AS (
        SELECT CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice
        FROM base),
      cl AS (SELECT o_totalprice FROM base WHERE o_orderkey % 2 <> 0)
      SELECT side, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM (SELECT 'src' AS side, o_totalprice FROM src
        UNION ALL SELECT 'clone' AS side, o_totalprice FROM cl)
      GROUP BY side ORDER BY side""",

    "w09_time_travel" -> s"""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 300),
      v1 AS (
        SELECT o_orderkey,
          CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice
        FROM base),
      v2 AS (SELECT * FROM v1 WHERE o_orderkey % 3 <> 0)
      SELECT v, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM (SELECT 0 AS v, o_totalprice FROM base
        UNION ALL SELECT 1 AS v, o_totalprice FROM v1
        UNION ALL SELECT 2 AS v, o_totalprice FROM v2)
      GROUP BY v ORDER BY v""",

    "w01_ctas_roundtrip" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders WHERE o_totalprice > 200000
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "w11_optimize_compact" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "w10_scd2_history" -> """
      WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
      runs AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM ordered WHERE prev_type IS NULL OR event_type <> prev_type),
      hist AS (
        SELECT user_id, event_type, valid_from,
          LEAD(valid_from) OVER (PARTITION BY user_id
            ORDER BY valid_from, event_id) AS valid_to
        FROM runs)
      SELECT event_type, COUNT(*) AS n_versions,
        CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
        COUNT(DISTINCT user_id) AS n_users
      FROM hist GROUP BY event_type ORDER BY event_type""",

    "w02_update_delete" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n,
        ${oSum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1 ELSE o_totalprice END")} AS total
      FROM orders WHERE o_orderpriority <> '5-LOW'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "w03_insert_append" -> s"""
      WITH full_t AS (
        SELECT o_orderdate, o_totalprice FROM orders
        UNION ALL
        SELECT TIMESTAMP '2002-01-01 00:00:00', 111.5
        UNION ALL
        SELECT TIMESTAMP '2002-06-01 00:00:00', 222.5)
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n,
        ${oSum("o_totalprice")} AS total
      FROM full_t GROUP BY yr ORDER BY yr""",

    "w05_partitioned_dml" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n,
        ${oSum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1 ELSE o_totalprice END")} AS total
      FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // the incrementally-maintained view recomputed in full: the merge of
    // (initial full refresh over ts <= Jan 20) with (delta refresh over
    // ts > Jan 20) must equal one aggregation over ALL events
    "w08_incremental_mv" -> """
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        MAX(value) AS max_value
      FROM events GROUP BY event_type, day
      ORDER BY event_type, day""",

    // the merged table recomputed straight from orders: keys <= 100
    // existed, 51-150 got the +1000.00 source value (51-100 via MATCHED
    // update, 101-150 via NOT MATCHED insert)
    // post-state of the full sync: exactly the source rows (201..600,
    // doubled price) — matched updated, new inserted, stale deleted
    // final state: orders with lineitems take the per-order lineitem
    // total; orders without keep o_totalprice
    "w18_update_from_select" -> s"""
      WITH src AS (SELECT l_orderkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS item_total
        FROM lineitem GROUP BY l_orderkey)
      SELECT o_orderstatus, COUNT(*) AS n,
        ${oSum("CASE WHEN src.l_orderkey IS NOT NULL THEN src.item_total ELSE o_totalprice END")} AS total
      FROM orders LEFT JOIN src ON orders.o_orderkey = src.l_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "w17_merge_full_sync" -> s"""
      WITH t AS (
        SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey > 200 AND o_orderkey <= 600)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        ${Parity.oSum("o_totalprice")} AS total
      FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "w07_merge_upsert" -> s"""
      WITH merged AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey BETWEEN 51 AND 150
               THEN o_totalprice + 1000.00 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey <= 150)
      SELECT CASE WHEN o_orderkey <= 50 THEN 'untouched'
          WHEN o_orderkey <= 100 THEN 'updated' ELSE 'inserted' END AS band,
        COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM merged GROUP BY 1 ORDER BY band""",

    "w04_create_table_cols" -> """
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'alpha', CAST(10.5 AS DOUBLE)),
        (CAST(2 AS BIGINT), 'beta', CAST(20.25 AS DOUBLE)),
        (CAST(3 AS BIGINT), 'gamma', CAST(30.125 AS DOUBLE)))
        AS t(k, name, price)
      ORDER BY k""",

    // the log contents are fully deterministic: three statements in
    // order, the DROP VIEW failing with the router's require message
    "c10_query_log" -> """
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'CREATE', 'CREATE TABLE wt_c10 AS SELECT * FROM region',
          'ok', CAST(NULL AS VARCHAR)),
        (CAST(2 AS BIGINT), 'SELECT', 'SELECT COUNT(*) AS n FROM wt_c10',
          'ok', CAST(NULL AS VARCHAR)),
        (CAST(3 AS BIGINT), 'DROP', 'DROP VIEW nope_c10',
          'error', 'requirement failed: view nope_c10 does not exist'))
        AS t(query_id, kind, statement, status, error)
      ORDER BY query_id""",

    "c13_meta_tables_sql" -> """
      SELECT * FROM (VALUES
        ('mdl_c13a', 'fit', 'fit'),
        ('mdl_c13b', 'anomaly', 'anomaly'))
        AS t(name, engine, handler)
      ORDER BY name""",

    "c15_jdbc_database_sql" -> """
      SELECT n_regionkey, COUNT(*) AS n FROM nation
      GROUP BY n_regionkey ORDER BY n_regionkey""",

    "c16_mysql_wire" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "c18_mysql_stmt" -> """
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders WHERE o_totalprice > 100000.0 AND o_orderpriority = '1-URGENT'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "c19_chat_completions" -> """
      SELECT 'how many rows are in customer?' AS question,
        'customer has ' || (SELECT COUNT(*) FROM customer) || ' rows' AS answer,
        'stop' AS finish_reason, 'chat.completion' AS obj""",

    "c20_tenant_isolation" -> """
      SELECT * FROM (VALUES
        ('acme', 'conn_acme', 'mem'), ('acme', 'conn_shared', 'mem'),
        ('globex', 'conn_globex', 'mem'), ('globex', 'conn_shared', 'mem'))
        AS t(tenant, name, engine)
      ORDER BY tenant, name""",

    // per-column stats of the posted query, computed directly — the
    // endpoint's envelope must carry the identical numbers
    "c21_http_analysis" -> """
      SELECT * FROM (
        SELECT 'l_quantity' AS column_name, CAST(COUNT(*) AS BIGINT) AS nr_rows,
          CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_missing,
          CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
          ROUND(CAST(MIN(l_quantity) AS DOUBLE), 4) AS min_v,
          ROUND(CAST(MAX(l_quantity) AS DOUBLE), 4) AS max_v
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
          COUNT(DISTINCT l_discount),
          ROUND(CAST(MIN(l_discount) AS DOUBLE), 4),
          ROUND(CAST(MAX(l_discount) AS DOUBLE), 4)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
          COUNT(DISTINCT l_returnflag), NULL, NULL
        FROM lineitem)
      ORDER BY column_name""",

    "c17_http_sql" -> """
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "c14_query_processlist" -> """
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'CREATE', 'ok'),
        (CAST(2 AS BIGINT), 'SELECT', 'ok'),
        (CAST(3 AS BIGINT), 'DROP', 'error'))
        AS t(query_id, kind, state)
      ORDER BY query_id""",

    "v01_view_expand" -> s"""
      SELECT c_nationkey, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "i01_info_columns" -> """
      SELECT table_name, column_name, CAST(ordinal_position AS INTEGER) AS ordinal_position
      FROM information_schema.columns
      WHERE table_name IN ('region','nation','customer','supplier','part',
        'orders','lineitem','events','documents','embeddings')
      ORDER BY table_name, ordinal_position""",

    "c01_show_tables" -> """
      SELECT * FROM (VALUES
        ('customer','BASE TABLE'),('documents','BASE TABLE'),('embeddings','BASE TABLE'),
        ('events','BASE TABLE'),('lineitem','BASE TABLE'),('nation','BASE TABLE'),
        ('orders','BASE TABLE'),('part','BASE TABLE'),('region','BASE TABLE'),
        ('supplier','BASE TABLE')) AS t(table_name, table_type)
      ORDER BY table_name""",

    "i02_info_schema_sql" -> """
      SELECT * FROM (VALUES
        ('customer','BASE TABLE'),('documents','BASE TABLE'),('embeddings','BASE TABLE'),
        ('events','BASE TABLE'),('lineitem','BASE TABLE'),('nation','BASE TABLE'),
        ('orders','BASE TABLE'),('part','BASE TABLE'),('region','BASE TABLE'),
        ('supplier','BASE TABLE'),('v_i02','VIEW'),('wt_i02','BASE TABLE'))
        AS t(table_name, table_type)
      ORDER BY table_name""",

    // expected layout rows recomputed: bucket cardinality = the exact
    // distinct key count ANALYZE stores; the un-ANALYZEd partition
    // column has NULL cardinality; ordinal 3 = partition column read
    // back LAST from the hive layout
    "i04_stats_layout" -> """
      SELECT * FROM (
        SELECT 'buck_i04' AS table_name, 'bucket_4' AS index_name,
          'o_orderkey' AS column_name, 1 AS seq_in_index,
          CAST((SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) AS cardinality,
          'bucket_buck_i04' AS constraint_name, 1 AS ordinal_position
        UNION ALL
        SELECT 'part_i04', 'partition', 'o_orderstatus', 1,
          CAST(NULL AS BIGINT), 'partition_part_i04', 3)
      ORDER BY table_name, index_name, seq_in_index""",

    "c03_show_objects" -> """
      SELECT * FROM (VALUES
        ('agents','ag_c03'),
        ('databases','extdb_c03'),('databases','files'),('databases','graft'),
        ('databases','information_schema'),('databases','log'),
        ('engines','graft-spark'),
        ('jobs','j_c03'),
        ('knowledge_bases','kb_c03'),
        ('models','m_c03'),
        ('triggers','tr_c03'),
        ('views','v_c03')) AS t(kind, name)
      ORDER BY kind, name""",

    "c05_chatbot_mlengine" -> """
      SELECT * FROM (VALUES
        ('chatbot','cb_c05','chatdb_c05|m2|ag_c05|true'),
        ('handler','byom','ml'),
        ('handler','files','data'),
        ('handler','fit','ml'),
        ('handler','mem','data'),
        ('ml_engine','eng_c05','fit|task=regression'),
        ('warnings','count','0')) AS t(kind, name, detail)
      ORDER BY kind, name""",

    "w14_zorder" -> s"""
      SELECT COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
        ${oSum("o_totalprice")} AS total
      FROM orders""",

    "w13_schema_evolution" -> s"""
      WITH base AS (
        SELECT o_totalprice AS price, 'web' AS channel
        FROM orders WHERE o_orderkey <= 200
        UNION ALL SELECT 123.5, 'store')
      SELECT channel, COUNT(*) AS n, ${oSum("price")} AS total
      FROM base GROUP BY channel ORDER BY channel""",

    "a04_skill_text2sql" -> """
      SELECT 'how many rows are in customer?' AS question,
        'customer has ' || (SELECT COUNT(*) FROM customer) || ' rows' AS answer""",

    "c11_show_skills" -> """
      SELECT * FROM (VALUES
        ('sk1_c11', 'text2sql', 'database=graft,tables=orders,lineitem'),
        ('sk2_c11', 'knowledge_base', 'source=kbx')) AS t(name, type, params)
      ORDER BY name""",

    "c06_alter_surface" -> """
      SELECT * FROM (
        SELECT 'view_row' AS kind, r_name AS value FROM region WHERE r_regionkey >= 2
        UNION ALL SELECT 'db_param', 'host=h1,port=5432'
        UNION ALL SELECT 'kb_param', 'chunk_size=300,content_columns=text')
      ORDER BY kind, value""",

    "c07_projects" -> """
      SELECT * FROM (VALUES
        ('after_drop','graft'),
        ('database','extdb_c07|data'),('database','files|data'),
        ('database','graft|project'),('database','information_schema|system'),
        ('database','log|system'),('database','proj_c07|project'),
        ('project','graft'),('project','proj_c07')) AS t(kind, name)
      ORDER BY kind, name""",

    "w06_bucketed_join" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n_lines,
        ${oSum("l_extendedprice")} AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "c09_describe_model" -> """
      SELECT * FROM (VALUES
        ('features','l_discount','feature'),
        ('features','l_quantity','feature'),
        ('features','score','target'),
        ('info','active_version','1'),
        ('info','engine','fit'),
        ('info','n_versions','1'),
        ('info','name','dm_c09'),
        ('info','predict','score'),
        ('model','bias','1.25'),
        ('model','weight_l_discount','2.0'),
        ('model','weight_l_quantity','0.5')) AS t(attr, part, value)
      ORDER BY attr, part, value""",

    "c04_info_columns_sql" -> """
      SELECT * FROM (VALUES
        ('nation','n_nationkey',1),('nation','n_name',2),
        ('nation','n_regionkey',3),
        ('region','r_regionkey',1),('region','r_name',2),
        ('wt_c04','r_regionkey',1),('wt_c04','r_name',2))
        AS t(table_name, column_name, ordinal_position)
      ORDER BY table_name, ordinal_position""",

    "c08_data_catalog" -> {
      def arms(table: String, cols: Seq[(String, String)]): Seq[String] =
        cols.zipWithIndex.map { case ((cName, cType), i) => s"""
          SELECT '$table' AS table_name, '$cName' AS column_name,
            ${i + 1} AS ordinal_position, '$cType' AS data_type,
            count(*) AS n_rows, count(*) - count($cName) AS n_nulls,
            count(DISTINCT $cName) AS n_distinct,
            CAST(min($cName) AS VARCHAR) AS min_value,
            CAST(max($cName) AS VARCHAR) AS max_value
          FROM $table""" }
      val all = arms("nation", Seq("n_nationkey" -> "INT",
        "n_name" -> "STRING", "n_regionkey" -> "INT")) ++
        arms("region", Seq("r_regionkey" -> "INT", "r_name" -> "STRING"))
      s"""
      WITH cat AS (${all.mkString(" UNION ALL ")})
      SELECT table_name, column_name,
        CAST(ordinal_position AS INTEGER) AS ordinal_position, data_type,
        CAST(n_rows AS BIGINT) AS n_rows, CAST(n_nulls AS BIGINT) AS n_nulls,
        CAST(n_distinct AS BIGINT) AS n_distinct, min_value, max_value
      FROM cat ORDER BY table_name, ordinal_position"""
    },

    "i03_analyze_stats" -> {
      def colStats(table: String, cols: Seq[String]): Seq[String] =
        cols.zipWithIndex.map { case (c, i) => s"""
          SELECT '$table' AS table_name, '$c' AS column_name,
            ${i + 1} AS ordinal_position,
            count(*) AS n_rows, count(*) - count($c) AS n_nulls,
            count(DISTINCT $c) AS n_distinct,
            CAST(min($c) AS VARCHAR) AS min_value,
            CAST(max($c) AS VARCHAR) AS max_value
          FROM $table""" }
      val arms = colStats("nation", Seq("n_nationkey", "n_name", "n_regionkey")) ++
        colStats("region", Seq("r_regionkey", "r_name"))
      s"""
      WITH stats AS (${arms.mkString(" UNION ALL ")})
      SELECT table_name, column_name,
        CAST(ordinal_position AS INTEGER) AS ordinal_position,
        CAST(n_rows AS BIGINT) AS n_rows, CAST(n_nulls AS BIGINT) AS n_nulls,
        CAST(n_distinct AS BIGINT) AS n_distinct, min_value, max_value
      FROM stats ORDER BY table_name, ordinal_position"""
    }
  )
}

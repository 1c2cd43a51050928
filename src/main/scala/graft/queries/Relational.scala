package graft.queries

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}
import Parity._

/** Relational operator inventory (SURVEY.md §2.1, §2.3–§2.8): projection,
  * filter, joins (inner/outer/semi/anti/cross), aggregation (group/rollup/
  * cube/grouping sets/having/distinct/conditional), window functions, set
  * ops (incl. EXCEPT, which the reference mis-executes as UNION — see
  * SURVEY §2.1 UnionStep; implemented correctly here), sorts/limits/offset,
  * CTEs, scalar/date/JSON functions, subqueries (scalar/semi/anti).
  *
  * Each query is declarative DataFrame code — Catalyst handles pushdown,
  * pruning, join strategy (small dims broadcast automatically under AQE),
  * and partial aggregation. At 100 TB the same plans hold: scans prune to
  * referenced columns, filters reach parquet, aggregates combine map-side.
  */
object Relational extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** Exact k-th smallest (1-based rank) of a LongType column by iterative
    * histogram refinement: each round counts 4096 equal-width buckets over
    * the surviving value range (ONE map-side-combinable aggregation), the
    * driver walks the 4096-row histogram (model-sized, not data-sized) to
    * pick the bucket holding rank k, and the range narrows 4096×. Integer
    * cents spanning 2^40 resolve in ≤4 rounds — ≤4 scans total, versus a
    * global sort whose single ordered partition is the classic one-task
    * pin (q46's `percentile` aggregate likewise buffers every value of a
    * group in one aggregation buffer; fine per-group, not corpus-wide).
    * This is the scale path for EXACT corpus-level quantiles at 100 TB.
    */
  private[queries] def kthSmallest(df: DataFrame, c: String, k0: Long): Long = {
    val mm = df.agg(min(col(c)), max(col(c))).head()
    // empty input (min/max NULL): no rank exists — callers treat 0 as
    // "no calibration data" rather than crashing on getLong(NULL)
    if (mm.isNullAt(0)) return 0L
    var lo = mm.getLong(0); var hi = mm.getLong(1)
    var k = k0
    var cur = df
    while (lo < hi) {
      val w = (hi - lo) / 4096 + 1
      cur = cur.filter(col(c) >= lo && col(c) <= hi)
      val counts = cur
        .groupBy(expr(s"($c - $lo) div $w").as("b"))
        .agg(count(lit(1)).as("n")).orderBy(col("b")).collect()
      var cum = 0L; var i = 0; var found = false
      while (i < counts.length && !found) {
        val b = counts(i).getLong(0); val n = counts(i).getLong(1)
        if (cum + n >= k) {
          k -= cum
          hi = math.min(hi, lo + (b + 1) * w - 1)
          lo = lo + b * w
          found = true
        } else { cum += n; i += 1 }
      }
    }
    lo
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact corpus-level p50/p90/p99 WITHOUT a global sort — see
    // kthSmallest above. Rank convention k = floor((n-1)·q) + 1 is spelled
    // out literally in the oracle (row_number against the same rank), so
    // no engine's quantile interpolation flavor is trusted.
    "q61_exact_quantiles" -> ((s, dir) => {
      import s.implicits._
      val cents = t(s, dir, "lineitem")
        .select((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"))
        .persist()
      val n = cents.count()
      val out = Seq(0.5, 0.9, 0.99)
        .map(q => (q, kthSmallest(cents, "cents", math.floor((n - 1) * q).toLong + 1)))
      cents.unpersist()
      out.toDF("q", "cents")
    }),

    // ---- aggregation ----------------------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_filter_topn" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    "q03_join_agg_topn" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    }),

    "q04_multijoin_region" -> ((s, dir) => {
      // 5-table star join: region/nation broadcast-join against the fact
      // chain customer→orders→lineitem; only the ASIA branch is scanned.
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      broadcast(r).join(n, r("r_regionkey") === n("n_regionkey"))
        .join(c, n("n_nationkey") === c("c_nationkey"))
        .join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("n_name"))
        .agg(dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q05_broadcast_dim" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("n_name"))
    }),

    // ---- outer / semi / anti joins -------------------------------------
    "q06_left_join_zero" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    "q07_full_outer" -> ((s, dir) => {
      val cs = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val ss = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      cs.join(ss, Seq("nk"), "full_outer")
        .select(col("nk").cast(IntegerType).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nk"))
    }),

    "q08_semi_join" -> ((s, dir) => {
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      t(s, dir, "orders")
        .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "q09_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"))
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- set operations -------------------------------------------------
    "q10_union_all" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("k"), lit("big_order").as("src"))
      val b = t(s, dir, "lineitem").filter(col("l_quantity") >= 50)
        .select(col("l_orderkey").as("k"), lit("max_qty").as("src"))
      a.unionByName(b).orderBy(col("src"), col("k"))
    }),

    "q11_union_distinct" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k"))
      a.union(b).distinct().orderBy(col("k"))
    }),

    "q12_intersect" -> ((s, dir) => {
      val f = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k"))
      f.intersect(o).orderBy(col("k"))
    }),

    "q13_except" -> ((s, dir) => {
      // The reference silently executes EXCEPT as UNION
      // (union_step.py:36-40); correct set difference here.
      val all = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val wo = t(s, dir, "orders").select(col("o_custkey").as("k"))
      all.except(wo).orderBy(col("k"))
    }),

    // ---- window functions ----------------------------------------------
    "q14_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"), col("rnk"), col("drnk"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q15_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("running_total",
          sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("running_total"), col("prev_price"), col("next_price"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    "q16_window_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val frame = w.rowsBetween(-3, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("mov_sum",
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(frame).cast(DoubleType))
        .withColumn("mov_n", count(lit(1)).over(frame))
        .withColumn("first_price", first(col("o_totalprice")).over(frame))
        .withColumn("ntile4", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("mov_sum"), col("mov_n"),
          col("first_price"), col("ntile4"), col("pct_rank"), col("cume"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- grouped-aggregation variants ----------------------------------
    "q17_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("spend").desc, col("o_custkey"))
    }),

    "q18_rollup" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val c = t(s, dir, "customer")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          grouping(col("r_name")).cast(IntegerType).as("g_region"),
          grouping(col("n_name")).cast(IntegerType).as("g_nation"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    "q19_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "q20_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    }),

    "q21_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // SQL UDTF surface: LATERAL VIEW explode (≡ the reference backends'
    // unnest table functions) — generator output joins its source row,
    // then aggregates; the generate runs inside the scan stage
    "q47_lateral_view" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        FROM documents
        LATERAL VIEW explode(split(lower(text), '\\s+')) t AS word
        WHERE word != '' AND doc_id < 100
        GROUP BY word
        HAVING COUNT(*) >= 50
        ORDER BY n DESC, word
      """)
    }),

    // multiset set operations: INTERSECT ALL / EXCEPT ALL keep
    // duplicate multiplicities (min / difference counts), completing the §2.7 trio
    // beyond the distinct variants of q12/q13
    "q48_set_ops_all" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT op, k FROM (
          SELECT 'intersect_all' AS op, k FROM (
            SELECT c_nationkey AS k FROM customer
            INTERSECT ALL
            SELECT s_nationkey AS k FROM supplier)
          UNION ALL
          SELECT 'except_all' AS op, k FROM (
            SELECT c_nationkey AS k FROM customer
            EXCEPT ALL
            SELECT s_nationkey AS k FROM supplier))
        ORDER BY op, k
      """)
    }),

    // UNPIVOT — the inverse of q44's PIVOT: wide per-status counts fold
    // back to (metric, value) rows. Runs as an Expand over the
    // aggregated (5-row) side, so the melt never touches fact-table
    // scale data
    "q49_unpivot" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority, metric, val
        FROM (SELECT o_orderpriority,
                CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
              FROM orders GROUP BY o_orderpriority)
        UNPIVOT (val FOR metric IN (n_f, n_o, n_p))
        ORDER BY o_orderpriority, metric
      """)
    }),

    // GROUP BY ALL (DuckDB/Snowflake/Spark 3.4+ shorthand): every
    // non-aggregate select item becomes a grouping key — the resolved
    // plan is identical to the explicit-keys spelling
    "q53_group_by_all" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(s"""
        SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_yr,
          CAST(COUNT(*) AS BIGINT) AS n, ${Parity.oSum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus, ship_yr
      """)
    }),

    // LISTAGG ... WITHIN GROUP (SQL:2016, Spark 4.0+): ordered string
    // aggregation; the per-group order is total so the result is
    // deterministic on any partitioning
    // calendar-function breadth beyond q27: month-end snapping, month
    // arithmetic with end-of-month clamping, ISO week/quarter extracts —
    // all map-side scalar work
    "q58_date_breadth" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey,
          CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
          CAST(add_months(CAST(o_orderdate AS DATE), 2) AS TIMESTAMP) AS plus2m,
          CAST(quarter(o_orderdate) AS INT) AS qtr,
          CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
          CAST(dayofweek(o_orderdate) AS INT) AS dow
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
      """)
    }),

    // window navigation breadth beyond q14-q16: nth_value, first/last
    // over an explicit frame, lead with a default — one per-customer
    // partitioning shared by every function
    "q59_window_nav" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_custkey, o_orderkey,
          first_value(o_totalprice) OVER w AS first_price,
          nth_value(o_totalprice, 2) OVER w AS second_price,
          last_value(o_totalprice) OVER
            (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
          lead(o_totalprice, 1, -1.0) OVER w AS next_or_neg1
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        ORDER BY o_custkey, o_orderkey
      """)
    }),

    // top-3 suppliers by revenue per nation WITHOUT a window: revenue
    // rolls up per (nation, supplier) — map-side combinable — then
    // graft's TopKPairs TypedImperativeAggregate keeps only k pairs per
    // partial buffer, so the second shuffle carries ≤ k rows per
    // (nation, partition) instead of every supplier row into one sorted
    // window task (a hot group pins a single task under the row_number
    // spelling, and AQE cannot split a window partition). posexplode
    // turns the per-nation array back into ranked rows. `.explain`:
    // ObjectHashAggregate with partial aggregation, zero Window —
    // PlanShapeSpec asserts it.
    "q60_topk_per_group" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      val rev = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_nationkey"), col("s_suppkey"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("cents"))
      rev.groupBy(col("s_nationkey"))
        .agg(graft.functions.TopK.topk(col("cents"), col("s_suppkey").cast("long"), 3).as("top"))
        .select(col("s_nationkey"), posexplode(col("top")))
        .select(
          col("s_nationkey"),
          (col("pos") + 1).cast("int").as("rank"),
          col("col.payload").as("s_suppkey"),
          (col("col.key").cast("double") / 100).as("revenue"))
        .orderBy(col("s_nationkey"), col("rank"))
    }),

    // lateral column aliases (Spark 3.4+/DuckDB: a SELECT item referencing
    // an alias defined earlier in the same list) — pure projection rewrite
    // SQL-defined scalar functions (CREATE FUNCTION … RETURN expr —
    // Spark 4 SQL UDFs, the in-engine sibling of the reference's BYOM
    // surface; the body inlines into whole-stage codegen, so calling one
    // costs the same as writing the expression): two functions compose
    // in one aggregation, surfaced in information_schema.routines
    "q66_sql_udf" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE OR REPLACE FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)""")
      c.execute("""CREATE OR REPLACE FUNCTION price_band(p DOUBLE) RETURNS STRING
        RETURN CASE WHEN p < 20000 THEN 'low' WHEN p < 40000 THEN 'mid' ELSE 'high' END""")
      c.execute(s"""SELECT price_band(l_extendedprice) AS band,
          COUNT(*) AS n,
          ${Parity.oSum("disc_price(l_extendedprice, l_discount)")} AS revenue
        FROM lineitem GROUP BY band ORDER BY band""")
    }),

    "q65_lateral_alias" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey,
          o_totalprice * 0.9 AS discounted,
          discounted * 1.1 AS with_tax
        FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
      """)
    }),

    // by-NAME union (DataFrame unionByName ≡ DuckDB UNION ALL BY NAME):
    // the second input's columns arrive in a different order — a
    // positional UNION would silently sum keys into prices. Resolution
    // is by name, then one combinable rollup proves the alignment.
    "q64_union_by_name" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val x = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"))
      val y = o.filter(col("o_orderstatus") === "O")
        .select(col("o_totalprice"), col("o_orderkey"))
      x.unionByName(y)
        .groupBy().agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"),
          sum(col("o_orderkey")).as("key_sum"))
    }),

    // relational division ("customers active in ALL priority classes" —
    // Codd's ÷). The textbook double-NOT-EXISTS spelling re-scans the
    // divisor per row; the scale-correct plan is ONE combinable
    // count-distinct aggregation compared against a broadcast scalar —
    // which is what both engines execute here.
    "q63_relational_division" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_custkey
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(DISTINCT o_orderpriority) =
          (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
        ORDER BY o_custkey
      """)
    }),

    // SQL:2003 FILTER clause on aggregates (conditional aggregation
    // without CASE wrapping) — runs inside the same partial/final
    // aggregation as the unfiltered count, zero extra scans
    "q62_filter_clause" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag,
          COUNT(*) AS n_all,
          COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)
    }),

    // correlated LATERAL subquery with per-row ORDER BY + LIMIT (SQL:1999
    // lateral derived tables; DuckDB/Postgres spelling) — top-2
    // customers per nation. Catalyst decorrelates this into a ranked
    // window under the hood, so it scales as one partitioned window,
    // not a per-nation re-scan.
    "q57_lateral_topk" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n_name, c.c_name, c.c_acctbal
        FROM nation, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        ORDER BY n_name, c.c_acctbal DESC, c.c_name
      """)
    }),

    // regex scalar-function breadth (extract / extract_all / replace /
    // RLIKE): all map-side, codegen'd, zero shuffles beyond the output
    // sort — DuckDB's RE2 and Java's regex agree on this (lookaround-
    // free) pattern subset
    "q56_regex_funcs" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT doc_id,
          CAST(length(regexp_replace(text, '[^0-9]', '')) AS INT) AS n_digits,
          CAST(size(regexp_extract_all(text, '\\b[A-Z][a-z]+\\b', 0)) AS INT) AS n_cap_words,
          regexp_extract(text, '([0-9]+)', 1) AS first_num,
          text RLIKE 'https?://' AS has_url
        FROM documents ORDER BY doc_id
      """)
    }),

    // higher-order array functions (SQL lambda surface): per-order
    // quantity arrays built with an order-pinned sort (collect_list order
    // is partitioning-dependent; array_sort makes it total), then
    // transform / filter / aggregate lambdas reduce them back to scalars.
    // The lambdas run inside the per-row projection — codegen'd, zero
    // extra shuffles beyond the one groupBy.
    "q55_array_lambdas" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey,
          CAST(size(qs) AS INT) AS n_items,
          aggregate(qs, 0L, (acc, x) -> acc + x) AS sum_q,
          CAST(size(filter(qs, x -> x > 25)) AS INT) AS n_big,
          CAST(size(array_distinct(qs)) AS INT) AS n_distinct,
          aggregate(transform(qs, x -> x * x), 0L, (acc, x) -> acc + x) AS sum_sq
        FROM (
          SELECT o_orderkey,
            array_sort(collect_list(CAST(l_quantity AS BIGINT))) AS qs
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderkey <= 2000
          GROUP BY o_orderkey)
        ORDER BY o_orderkey
      """)
    }),

    "q54_listagg" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n_regionkey,
          listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
      """)
    }),

    // GROUPING()/super-aggregate introspection over ROLLUP: the flags
    // distinguish a real NULL group key from a rollup subtotal row —
    // the part of the cube surface q18-q20 don't exercise
    "q50_grouping_funcs" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
          CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_prio,
          o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
      """)
    }),

    // statistical aggregates — variance/stddev/correlation derived from
    // exact-decimal sufficient sums (n, Σx, Σy, Σx², Σy², Σxy), the same
    // engine-exact route m10's OLS takes: the summation order of a
    // native stddev/corr differs between engines at the last ulp, the
    // decimal sums do not. Map-side combinable like any sum.
    "q45_stat_aggs" -> ((s, dir) => {
      import graft.queries.Parity.dsum2
      val li = t(s, dir, "lineitem")
      val agg = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum2(col("l_quantity"), col("l_quantity")).as("sxx"),
          dsum2(col("l_extendedprice"), col("l_extendedprice")).as("syy"),
          dsum2(col("l_quantity"), col("l_extendedprice")).as("sxy"))
      agg.select(col("l_returnflag"),
          col("n").cast(LongType).as("n_rows"),
          round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 4)
            .as("var_qty"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 4)
            .as("stddev_qty"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 4).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // exact interpolated percentiles (sort-based `percentile`, the
    // quantile_cont definition both engines share — deterministic under
    // any partitioning because the aggregate sorts its group)
    "q46_percentiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy(col("o_orderpriority"))
    }),

    "q22_conditional_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast(LongType).as("n_finished"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast(LongType).as("n_open"),
          dsum(when(col("o_totalprice") > 200000, col("o_totalprice")).otherwise(lit(0.0))).as("big_spend"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- subqueries / CTE ----------------------------------------------
    "q23_scalar_subquery" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val avgPrice = p.agg(davg(col("p_retailprice")).as("ap"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("ap"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    "q24_cte_two_level" -> ((s, dir) => {
      // avg order value per segment; exact decimal arithmetic end-to-end
      // so the two aggregation levels hash-match the oracle.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val perCust = o.groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DecimalType(18, 4)).as("cust_total"))
      c.join(perCust, c("c_custkey") === perCust("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg((sum(col("cust_total")).cast(DoubleType) / count(lit(1))).as("avg_cust_spend"),
          count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // WITH RECURSIVE — native Catalyst recursion (UnionLoop/UnionLoopExec,
    // Spark 4): a 12-month calendar spine generated by the recursive
    // member, left-joined to monthly order aggregates so months past the
    // data's end (orders stop 2001-08) zero-fill — the standard
    // gap-filling spine for time-series completeness. Each recursion
    // step is a distributed plan; the loop's per-iteration output is
    // tiny (one row), the join side is the aggregated table.
    "q51_recursive_cte" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""
        WITH RECURSIVE months(mon) AS (
          SELECT DATE '2001-01-01'
          UNION ALL
          SELECT add_months(mon, 1) FROM months WHERE mon < DATE '2001-12-01'
        )
        SELECT CAST(m.mon AS TIMESTAMP) AS mon, COALESCE(o.n, 0) AS n_orders,
          COALESCE(o.total, CAST(0.0 AS DOUBLE)) AS total
        FROM months m LEFT JOIN (
          SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS mon,
            COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
          FROM orders WHERE year(o_orderdate) = 2001 GROUP BY 1) o
        ON m.mon = o.mon
        ORDER BY m.mon""")
    }),

    "q25_correlated_exists" -> ((s, dir) => {
      val maxed = t(s, dir, "lineitem").filter(col("l_quantity") === 50)
        .select(col("l_orderkey")).distinct()
      t(s, dir, "orders")
        .join(maxed, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- scalar functions ----------------------------------------------
    "q26_case_strings" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).as("name_len"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
          when(col("c_acctbal") < 0, "debt")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high").as("tier"))
        .orderBy(col("c_custkey"))
    }),

    "q27_datetime" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("yr"), col("mo"))
    }),

    "q28_date_trunc" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        .orderBy(col("hr"), col("event_type"))
    }),

    "q29_json_extract" -> ((s, dir) => {
      // JSON props: stringly-nested in the reference (SURVEY §1.2 — nested
      // values serialized to JSON text); first-class extraction here.
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"))
        .groupBy(col("event_type"))
        .agg(count(col("k_val")).as("n_with_k"),
          sum(col("k_val")).cast(LongType).as("sum_k"))
        .orderBy(col("event_type"))
    }),

    "q30_math" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          round(col("p_retailprice").cast(DecimalType(18, 4)), 2).cast(DoubleType).as("rounded"),
          floor(col("p_retailprice")).cast(LongType).as("fl"),
          ceil(col("p_retailprice")).cast(LongType).as("ce"),
          abs(col("p_size") - 25).as("sz_dist"),
          pmod(col("p_partkey"), lit(7)).as("k_mod7"))
        .orderBy(col("p_partkey"))
    }),

    // ---- sorts / limits / distinct / cross -----------------------------
    "q31_limit_offset" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 50
      """)
    }),

    "q32_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    "q33_cross_join" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_name"))
      val f = t(s, dir, "lineitem").select(col("l_returnflag")).distinct()
      r.crossJoin(f).orderBy(col("r_name"), col("l_returnflag"))
    }),

    "q34_in_list" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY") && col("c_acctbal").between(0, 5000))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    "q35_like_null" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_type").like("%AN%") || col("p_name").like("part_1%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"),
          coalesce(col("p_brand"), lit("none")).as("brand"),
          col("p_brand").isNull.cast(IntegerType).as("brand_missing"))
        .orderBy(col("p_partkey"))
    }),

    "q43_window_dist" -> ((s, dir) => {
      // distribution window functions: ntile / percent_rank / cume_dist /
      // lead-lag deltas per priority partition, ordered by a UNIQUE key
      // pair so ranks are engine-independent
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          round(col("o_totalprice") -
            coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 4).as("delta_prev"))
        .orderBy(col("o_orderkey"))
    }),

    "q44_pivot" -> ((s, dir) => {
      // PIVOT: per-user event counts spread across event-type columns
      // (Spark relational pivot; plans as ONE aggregation pass with
      // map-side combine — never per-column rescans)
      t(s, dir, "events").filter(col("user_id") < 40)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase", "view", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    }),

    "q41_waiting_supplier" -> ((s, dir) => {
      // TPC-H Q21 shape ("suppliers who kept orders waiting"): for
      // multi-supplier orders, find late lines whose supplier is the ONLY
      // late supplier on the order. The textbook plan is two correlated
      // self-joins of lineitem (EXISTS + NOT EXISTS); here both collapse
      // into ONE per-order aggregation joined back — at 100 TB that is
      // one shuffle of (orderkey, two counts) instead of two extra
      // corpus-sized self-join shuffles. "Late" = shipped >90 days after
      // the order date.
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late", col("l_shipdate") > date_add(col("o_orderdate"), 90))
      // two-level agg instead of two count-distincts: the distinct pairs
      // collapse first (map-side combinable), so no Expand doubles the
      // joined lineitem
      val perOrder = li.groupBy(col("l_orderkey").as("g_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("supp_late"))
        .groupBy(col("g_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supp"))
      li.filter(col("late"))
        .join(perOrder, col("l_orderkey") === col("g_orderkey"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(countDistinct(col("l_orderkey")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    "q36_theta_join" -> ((s, dir) => {
      // non-equi (range) join: suppliers paired with richer suppliers
      val a = t(s, dir, "supplier").select(col("s_suppkey").as("a_key"), col("s_acctbal").as("a_bal"))
      val b = t(s, dir, "supplier").select(col("s_suppkey").as("b_key"), col("s_acctbal").as("b_bal"))
      a.join(b, col("a_bal") < col("b_bal") && col("a_key") =!= col("b_key"))
        .select(col("a_key"), col("b_key"))
        .orderBy(col("a_key"), col("b_key"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${oSum("l_quantity")} AS sum_qty,
        ${oSum("l_extendedprice")} AS sum_base_price,
        ${oSum2("l_extendedprice", "(1.0 - l_discount)")} AS sum_disc_price,
        ${oAvg("l_quantity")} AS avg_qty,
        ${oAvg("l_extendedprice")} AS avg_price,
        ${oAvg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_topn" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity FROM lineitem
      WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",

    "q03_join_agg_topn" -> s"""
      SELECT o_orderkey, o_orderdate,
        ${oSum2("l_extendedprice", "(1.0 - l_discount)")} AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 20""",

    "q04_multijoin_region" -> s"""
      SELECT n_name,
        ${oSum2("l_extendedprice", "(1.0 - l_discount)")} AS revenue,
        COUNT(*) AS n_items
      FROM region JOIN nation ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q05_broadcast_dim" -> s"""
      SELECT n_name, COUNT(*) AS n_customers, ${oSum("c_acctbal")} AS total_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",

    "q06_left_join_zero" -> """
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",

    "q07_full_outer" -> """
      SELECT CAST(COALESCE(c.nk, s.nk) AS INTEGER) AS nk,
        COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk ORDER BY nk""",

    "q08_semi_join" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      ORDER BY o_orderkey""",

    "q09_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q10_union_all" -> """
      SELECT * FROM (
        SELECT o_orderkey AS k, 'big_order' AS src FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT l_orderkey AS k, 'max_qty' AS src FROM lineitem WHERE l_quantity >= 50
      ) ORDER BY src, k""",

    "q11_union_distinct" -> """
      SELECT * FROM (
        SELECT o_custkey AS k FROM orders
        UNION
        SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
      ) ORDER BY k""",

    "q12_intersect" -> """
      SELECT * FROM (
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
      ) ORDER BY k""",

    "q13_except" -> """
      SELECT * FROM (
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT o_custkey AS k FROM orders
      ) ORDER BY k""",

    "q14_window_topk" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ) WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q15_window_running" -> """
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "q16_window_frames" -> """
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER f AS DOUBLE) AS mov_sum,
        COUNT(*) OVER f AS mov_n,
        FIRST_VALUE(o_totalprice) OVER f AS first_price,
        NTILE(4) OVER w AS ntile4,
        PERCENT_RANK() OVER w AS pct_rank,
        CUME_DIST() OVER w AS cume
      FROM orders
      WINDOW
        f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "q17_having" -> s"""
      SELECT o_custkey, COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS spend
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
      ORDER BY spend DESC, o_custkey""",

    "q18_rollup" -> """
      SELECT r_name, n_name, COUNT(*) AS n_cust,
        CAST(GROUPING(r_name) AS INTEGER) AS g_region,
        CAST(GROUPING(n_name) AS INTEGER) AS g_nation
      FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",

    "q19_cube" -> s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${oSum("l_quantity")} AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q20_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "q21_count_distinct" -> """
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q22_conditional_agg" -> s"""
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        ${oSum("(CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0.0 END)")} AS big_spend
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q48_set_ops_all" -> """
      SELECT op, k FROM (
        SELECT 'intersect_all' AS op, k FROM (
          SELECT c_nationkey AS k FROM customer
          INTERSECT ALL
          SELECT s_nationkey AS k FROM supplier)
        UNION ALL
        SELECT 'except_all' AS op, k FROM (
          SELECT c_nationkey AS k FROM customer
          EXCEPT ALL
          SELECT s_nationkey AS k FROM supplier))
      ORDER BY op, k""",

    "q47_lateral_view" -> """
      SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
            FROM documents)
      WHERE word != '' AND doc_id < 100
      GROUP BY word
      HAVING COUNT(*) >= 50
      ORDER BY n DESC, word""",

    // the melt spelled as UNION ALL — engine-neutral, same multiset
    "q49_unpivot" -> """
      WITH agg AS (
        SELECT o_orderpriority,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
          CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
          CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, metric, val FROM (
        SELECT o_orderpriority, 'n_f' AS metric, n_f AS val FROM agg
        UNION ALL SELECT o_orderpriority, 'n_o', n_o FROM agg
        UNION ALL SELECT o_orderpriority, 'n_p', n_p FROM agg)
      ORDER BY o_orderpriority, metric""",

    "q53_group_by_all" -> s"""
      SELECT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INTEGER) AS ship_yr,
        COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY ALL
      ORDER BY l_returnflag, l_linestatus, ship_yr""",

    // DuckDB's dayofweek is 0-based Sunday, Spark's is 1-based — the +1
    // aligns them; interval month addition clamps to month end in both
    "q58_date_breadth" -> """
      SELECT o_orderkey,
        CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS plus2m,
        CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""",

    "q59_window_nav" -> """
      SELECT o_custkey, o_orderkey,
        first_value(o_totalprice) OVER w AS first_price,
        nth_value(o_totalprice, 2) OVER w AS second_price,
        last_value(o_totalprice) OVER
          (PARTITION BY o_custkey ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        lead(o_totalprice, 1, -1.0) OVER w AS next_or_neg1
      FROM orders WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    // the rank formula is written out literally — no quantile_disc /
    // percentile flavor dependence on either engine
    "q61_exact_quantiles" -> """
      WITH c AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM lineitem),
      r AS (
        SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
          COUNT(*) OVER () AS n
        FROM c)
      SELECT CAST(0.5 AS DOUBLE) AS q, cents FROM r
        WHERE rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE), cents FROM r
        WHERE rn = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE), cents FROM r
        WHERE rn = CAST(floor((n - 1) * 0.99) AS BIGINT) + 1
      ORDER BY q""",

    // the oracle spells top-k the classic window way; graft's aggregate
    // must agree row-for-row under the same (cents DESC, suppkey ASC)
    // total tie order
    "q60_topk_per_group" -> """
      WITH rev AS (
        SELECT s_nationkey, s_suppkey,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, s_suppkey),
      rk AS (
        SELECT s_nationkey, s_suppkey, cents,
          row_number() OVER (
            PARTITION BY s_nationkey ORDER BY cents DESC, s_suppkey) AS rn
        FROM rev)
      SELECT s_nationkey, CAST(rn AS INTEGER) AS rank,
        CAST(s_suppkey AS BIGINT) AS s_suppkey,
        CAST(cents AS DOUBLE) / 100 AS revenue
      FROM rk WHERE rn <= 3 ORDER BY s_nationkey, rank""",

    // the oracle inlines the function bodies — equality proves the SQL
    // UDF route computes exactly its declared expression
    "q66_sql_udf" -> s"""
      SELECT CASE WHEN l_extendedprice < 20000 THEN 'low'
          WHEN l_extendedprice < 40000 THEN 'mid' ELSE 'high' END AS band,
        COUNT(*) AS n,
        ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem GROUP BY band ORDER BY band""",

    "q65_lateral_alias" -> """
      SELECT o_orderkey,
        o_totalprice * 0.9 AS discounted,
        discounted * 1.1 AS with_tax
      FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",

    "q64_union_by_name" -> s"""
      WITH u AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        UNION ALL BY NAME
        SELECT o_totalprice, o_orderkey FROM orders WHERE o_orderstatus = 'O')
      SELECT COUNT(*) AS n, ${oSum("o_totalprice")} AS total,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM u""",

    "q63_relational_division" -> """
      SELECT o_custkey
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(DISTINCT o_orderpriority) =
        (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
      ORDER BY o_custkey""",

    "q62_filter_clause" -> """
      SELECT l_returnflag,
        COUNT(*) AS n_all,
        COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
          FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q57_lateral_topk" -> """
      SELECT n_name, c.c_name, c.c_acctbal
      FROM nation, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      ORDER BY n_name, c.c_acctbal DESC, c.c_name""",

    "q56_regex_funcs" -> """
      SELECT doc_id,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER) AS n_digits,
        CAST(len(regexp_extract_all(text, '\b[A-Z][a-z]+\b')) AS INTEGER) AS n_cap_words,
        regexp_extract(text, '([0-9]+)', 1) AS first_num,
        regexp_matches(text, 'https?://') AS has_url
      FROM documents ORDER BY doc_id""",

    // DuckDB's list lambdas mirror Spark's higher-order functions;
    // integer elements make every reduction exact
    "q55_array_lambdas" -> """
      SELECT o_orderkey,
        CAST(len(qs) AS INTEGER) AS n_items,
        CAST(list_sum(qs) AS BIGINT) AS sum_q,
        CAST(len(list_filter(qs, x -> x > 25)) AS INTEGER) AS n_big,
        CAST(len(list_distinct(qs)) AS INTEGER) AS n_distinct,
        CAST(list_sum(list_transform(qs, x -> x * x)) AS BIGINT) AS sum_sq
      FROM (
        SELECT o_orderkey,
          list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderkey <= 2000
        GROUP BY o_orderkey)
      ORDER BY o_orderkey""",

    "q54_listagg" -> """
      SELECT n_regionkey,
        string_agg(n_name, ',' ORDER BY n_name) AS members,
        COUNT(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "q50_grouping_funcs" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY g_status, g_prio,
        o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    // DECIMAL(19,4) factor casts: DuckDB multiplies DECIMAL(18)s at
    // width 18 and overflows on price*price; 19+19 promotes to a
    // DECIMAL(38,8) product — values are exact either way
    "q45_stat_aggs" -> {
      def dsq(a: String, b: String) =
        s"CAST(SUM(CAST($a AS DECIMAL(19,4)) * CAST($b AS DECIMAL(19,4))) AS DOUBLE)"
      s"""
      WITH suff AS (
        SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
          ${oSum("l_quantity")} AS sx, ${oSum("l_extendedprice")} AS sy,
          ${dsq("l_quantity", "l_quantity")} AS sxx,
          ${dsq("l_extendedprice", "l_extendedprice")} AS syy,
          ${dsq("l_quantity", "l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        ROUND((sxx - sx*sx/n) / (n - 1), 4) AS var_qty,
        ROUND(sqrt((sxx - sx*sx/n) / (n - 1)), 4) AS stddev_qty,
        ROUND((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 4)
          AS corr_qty_price
      FROM suff ORDER BY l_returnflag"""
    },

    "q46_percentiles" -> """
      SELECT o_orderpriority, COUNT(*) AS n,
        ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q23_scalar_subquery" -> s"""
      SELECT p_partkey, p_name, p_retailprice FROM part
      WHERE p_retailprice > (SELECT ${oAvg("p_retailprice")} FROM part)
      ORDER BY p_partkey""",

    "q24_cte_two_level" -> """
      WITH per_cust AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS cust_total
        FROM orders GROUP BY o_custkey)
      SELECT c_mktsegment,
        CAST(SUM(cust_total) AS DOUBLE) / COUNT(*) AS avg_cust_spend,
        COUNT(*) AS n_cust
      FROM customer JOIN per_cust ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // DuckDB runs the same recursive spine natively
    "q51_recursive_cte" -> """
      WITH RECURSIVE months(mon) AS (
        SELECT DATE '2001-01-01'
        UNION ALL
        SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE mon < DATE '2001-12-01')
      SELECT CAST(mon AS TIMESTAMP) AS mon, COALESCE(n, 0) AS n_orders,
        COALESCE(total, CAST(0.0 AS DOUBLE)) AS total
      FROM months LEFT JOIN (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders WHERE year(o_orderdate) = 2001 GROUP BY 1) agg
      ON mon = agg.m
      ORDER BY mon""",

    "q25_correlated_exists" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity = 50)
      ORDER BY o_orderkey""",

    "q26_case_strings" -> """
      SELECT c_custkey, UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
        SUBSTRING(c_name, 1, 8) AS prefix, CAST(LENGTH(c_name) AS INTEGER) AS name_len,
        c_mktsegment || '|' || c_name AS tagged,
        CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'low'
          ELSE 'high' END AS tier
      FROM customer ORDER BY c_custkey""",

    "q27_datetime" -> s"""
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr, CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
        COUNT(*) AS n, ${oSum("o_totalprice")} AS total
      FROM orders GROUP BY 1, 2 ORDER BY yr, mo""",

    "q28_date_trunc" -> s"""
      SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr, event_type, COUNT(*) AS n, ${oSum("value")} AS v
      FROM events GROUP BY 1, 2 ORDER BY hr, event_type""",

    "q29_json_extract" -> """
      SELECT event_type, COUNT(k_val) AS n_with_k, CAST(SUM(k_val) AS BIGINT) AS sum_k
      FROM (SELECT event_type, CAST(props->>'$.k' AS INTEGER) AS k_val FROM events)
      GROUP BY event_type ORDER BY event_type""",

    "q30_math" -> """
      SELECT p_partkey,
        CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS rounded,
        CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
        CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
        CAST(ABS(p_size - 25) AS INTEGER) AS sz_dist,
        CAST(p_partkey % 7 AS BIGINT) AS k_mod7
      FROM part ORDER BY p_partkey""",

    "q31_limit_offset" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 50""",

    "q32_distinct" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority""",

    "q33_cross_join" -> """
      SELECT r_name, l_returnflag FROM region
      CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem)
      ORDER BY r_name, l_returnflag""",

    "q34_in_list" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal BETWEEN 0 AND 5000
      ORDER BY c_custkey""",

    "q35_like_null" -> """
      SELECT p_partkey, p_name, p_type, COALESCE(p_brand, 'none') AS brand,
        CAST(p_brand IS NULL AS INTEGER) AS brand_missing
      FROM part WHERE p_type LIKE '%AN%' OR p_name LIKE 'part_1%'
      ORDER BY p_partkey""",

    "q36_theta_join" -> """
      SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key
      FROM supplier a JOIN supplier b
        ON a.s_acctbal < b.s_acctbal AND a.s_suppkey <> b.s_suppkey
      ORDER BY a_key, b_key""",

    "q43_window_dist" -> """
      SELECT o_orderkey, o_orderpriority, o_totalprice,
        CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        ROUND(CUME_DIST() OVER w, 6) AS cume,
        ROUND(o_totalprice - COALESCE(LAG(o_totalprice, 1) OVER w, 0.0), 4) AS delta_prev
      FROM orders WHERE o_orderkey < 2000
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""",

    "q44_pivot" -> """
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events WHERE user_id < 40
      GROUP BY user_id ORDER BY user_id""",

    // the oracle keeps the textbook EXISTS / NOT EXISTS formulation — if
    // the agg-join-back rewrite ever diverges from Q21 semantics, the
    // hash breaks
    "q41_waiting_supplier" -> """
      WITH li AS (
        SELECT l.l_orderkey, l.l_suppkey,
          l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
      FROM li l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM li l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.late)
      GROUP BY s.s_name
      ORDER BY numwait DESC, s.s_name LIMIT 20"""
  )
}

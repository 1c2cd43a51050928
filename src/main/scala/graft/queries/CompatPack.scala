package graft.queries

import graft.engine.Tables
import graft.functions.{AiFunctions, MySqlCompat}
import graft.ml.Agents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MySQL-compat shims, AI scalar functions, and agents-as-table
  * (SURVEY §2.8; reference mysql_to_duckdb_functions.py:681-712,
  * functions/controller.py:131-190, agents_controller.py:70).
  */
object CompatPack extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MySQL spellings through spark.sql after shim registration
    "q37_mysql_compat" -> ((s, dir) => {
      MySqlCompat.register(s)
      t(s, dir, "orders").filter(col("o_orderkey") < 1000)
        .createOrReplaceTempView("orders_q37")
      s.sql("""
        SELECT o_orderkey,
          mysql_date_format(o_orderdate, '%Y-%m (%W)') AS ym,
          dayname(o_orderdate) AS dname,
          dayofyear(o_orderdate) AS doy,
          dayofweek(o_orderdate) AS dow,
          substring_index(o_orderpriority, '-', 1) AS prio_num,
          locate('URGENT', o_orderpriority) AS loc_urgent,
          datediff(TIMESTAMP '2002-01-01 00:00:00', o_orderdate) AS days_to_2002,
          sha2(o_orderpriority, 256) AS prio_sha,
          char(65 + o_custkey % 26) AS cust_char,
          to_days(o_orderdate) AS td
        FROM orders_q37 ORDER BY o_orderkey""")
    }),

    // every name in the reference's MySQL-function rewrite map
    // (mysql_to_duckdb_functions.py:681-712) in one query — shim or
    // Spark built-in, each must produce the DuckDB-matched value.
    // curdate/curtime are clock-dependent: asserted as stable derived
    // booleans so the oracle can't race the wall clock.
    "q39_mysql_full_shims" -> ((s, dir) => {
      MySqlCompat.register(s)
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .createOrReplaceTempView("orders_q39")
      s.sql("""
        SELECT o_orderkey,
          char(65 + o_custkey % 26)                                   AS f_char,
          locate('URGENT', o_orderpriority)                           AS f_locate,
          instr(o_orderpriority, '-')                                 AS f_instr,
          decode(unhex('4A4B'), 'UTF-8')                              AS f_unhex,
          mysql_format(o_totalprice, 2)                               AS f_format,
          sha2(o_orderpriority, 256)                                  AS f_sha2,
          length(o_orderpriority)                                     AS f_length,
          regexp_substr_mysql(o_orderpriority, '[A-Z]+')              AS f_regexp_substr,
          substring_index(o_orderpriority, '-', 1)                    AS f_substring_index,
          length(curtime()) = 8                                       AS f_curtime_ok,
          timestampdiff(DAY, o_orderdate, TIMESTAMP '2002-01-01')     AS f_timestampdiff,
          extract(YEAR FROM o_orderdate)                              AS f_extract,
          get_format('date', 'iso')                                   AS f_get_format,
          mysql_date_format(o_orderdate, '%Y/%m/%d')                  AS f_date_format,
          from_unixtime(1000000000)                                   AS f_from_unixtime,
          CAST(from_days(730000) AS TIMESTAMP)                        AS f_from_days,
          dayofyear(o_orderdate)                                      AS f_dayofyear,
          dayofweek(o_orderdate)                                      AS f_dayofweek,
          day(o_orderdate)                                            AS f_day,
          dayofmonth(o_orderdate)                                     AS f_dayofmonth,
          dayname(o_orderdate)                                        AS f_dayname,
          year(curdate()) >= 2026                                     AS f_curdate_ok,
          datediff(TIMESTAMP '2002-01-01', o_orderdate)               AS f_datediff,
          CAST(adddate(o_orderdate, 5) AS TIMESTAMP)                  AS f_adddate,
          CAST(date_sub(CAST(o_orderdate AS DATE), 3) AS TIMESTAMP)   AS f_date_sub,
          CAST(date_add(CAST(o_orderdate AS DATE), 3) AS TIMESTAMP)   AS f_date_add,
          addtime(o_orderdate, 90)                                    AS f_addtime,
          convert_tz(o_orderdate, 'UTC', 'America/New_York')          AS f_convert_tz,
          to_days(o_orderdate)                                        AS f_to_days
        FROM orders_q39 ORDER BY o_orderkey""")
    }),

    // llm / to_markdown / hash scalar functions
    "q38_ai_functions" -> ((s, dir) => {
      AiFunctions.register(s)
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .createOrReplaceTempView("docs_q38")
      s.sql("""
        SELECT doc_id,
          doc_hash(text) AS h,
          llm(concat('sum: ', substring(text, 1, 30))) AS llm_out,
          to_markdown(substring(text, 1, 40)) AS md
        FROM docs_q38 ORDER BY doc_id""")
    }),

    // `SELECT @@var` handshake queries (mysql_proxy SERVER_VARIABLES)
    // + SET overlay visibility
    "q40_system_vars" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("SET @@session_marker = 'r5'")
      c.execute("""SELECT @@version AS version, @@autocommit AS autocommit,
        @@max_allowed_packet AS map, @@session_marker AS marker,
        @@no_such_variable AS missing""")
    }),

    // user variables: SET @var / SELECT @var, kept separate from the
    // server-variable namespace (variables_controller.py)
    "q42_user_vars" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("SET @greeting = 'hello'")
      c.execute("SET @n = 42")
      c.execute("SET @n = 43") // reassignment wins
      c.execute("SET @@sysmarker = 'sys'") // server var, must NOT leak into @
      c.execute("""SELECT @greeting AS greeting, @n AS n,
        @unset AS missing, @sysmarker AS not_a_user_var""")
    }),

    // QUALIFY (Snowflake/DuckDB/BigQuery): filter on window results
    // without the subquery — the router rewrites to the standard wrap
    // (project predicate → filter → drop); top-3 orders per status here
    "q52_qualify" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""SELECT o_orderstatus, o_orderkey, o_totalprice
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_orderstatus
          ORDER BY o_totalprice DESC, o_orderkey) <= 3
        ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""")
    }),

    // agent-as-table through SQL: WHERE question = '...' completes it
    "a02_agent_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE AGENT aga USING model='default'")
      c.execute("SELECT question, answer FROM aga WHERE question = 'what is a shuffle'")
    }),

    // "new syntax" agent (test_agent_new_syntax): model/data dicts +
    // prompt_template; data={tables:[…]} is the exposure allowlist — a
    // question naming an exposed table answers from it, one naming an
    // unexposed table falls back to plain (templated) completion, so the
    // unexposed object's contents never reach the answer
    "a06_agent_data_exposure" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE AGENT agx USING
        model = {'provider': 'openai', 'model_name': 'gpt-42', 'api_key': 'k'},
        data = {'tables': ['region', 'nation']},
        prompt_template = 'sys'""")
      val q1 = c.execute("SELECT question, answer FROM agx WHERE question = 'how many rows in region'")
      val q2 = c.execute("SELECT question, answer FROM agx WHERE question = 'how many rows in orders'")
      q1.unionByName(q2).orderBy(col("question"))
    }),

    // agent completes each question row into an `answer` column
    "a01_agent_table" -> ((s, dir) => {
      val questions = t(s, dir, "documents").filter(col("doc_id") < 5)
        .select(col("doc_id"),
          concat(lit("what is "), substring(col("text"), 1, 20)).as("question"))
      Agents.answer(questions, "question")
        .orderBy(col("doc_id"))
    })
  )

  private val oLlm = (p: String) =>
    s"'LLM[' || substr(md5($p), 1, 8) || ']: ' || upper(substr($p, 1, 24))"

  def oracles: Map[String, String] = Map(

    // DuckDB has native QUALIFY — the oracle uses it directly
    "q52_qualify" -> """
      SELECT o_orderstatus, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        ORDER BY o_totalprice DESC, o_orderkey) <= 3
      ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""",

    "q40_system_vars" -> """
      SELECT '8.0.17-graft' AS version, '1' AS autocommit,
        '16777216' AS map, 'r5' AS marker, CAST(NULL AS VARCHAR) AS missing""",

    "q42_user_vars" -> """
      SELECT 'hello' AS greeting, '43' AS n,
        CAST(NULL AS VARCHAR) AS missing,
        CAST(NULL AS VARCHAR) AS not_a_user_var""",

    "q37_mysql_compat" -> """
      SELECT o_orderkey,
        strftime(o_orderdate, '%Y-%m (') || dayname(o_orderdate) || ')' AS ym,
        dayname(o_orderdate) AS dname,
        CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        split_part(o_orderpriority, '-', 1) AS prio_num,
        CAST(strpos(o_orderpriority, 'URGENT') AS INTEGER) AS loc_urgent,
        CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002,
        sha256(o_orderpriority) AS prio_sha,
        chr(CAST(65 + o_custkey % 26 AS INTEGER)) AS cust_char,
        CAST(date_diff('day', DATE '0001-01-01', CAST(o_orderdate AS DATE)) + 366 AS INTEGER) AS td
      FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",

    "q39_mysql_full_shims" -> """
      SELECT o_orderkey,
        chr(CAST(65 + o_custkey % 26 AS INTEGER)) AS f_char,
        CAST(strpos(o_orderpriority, 'URGENT') AS INTEGER) AS f_locate,
        CAST(strpos(o_orderpriority, '-') AS INTEGER) AS f_instr,
        decode(unhex('4A4B')) AS f_unhex,
        format('{:,}', CAST(FLOOR(o_totalprice) AS BIGINT)) || '.' ||
          lpad(CAST(CAST(ROUND((o_totalprice - FLOOR(o_totalprice)) * 100, 0) AS INTEGER) AS VARCHAR), 2, '0') AS f_format,
        sha256(o_orderpriority) AS f_sha2,
        CAST(length(o_orderpriority) AS INTEGER) AS f_length,
        regexp_extract(o_orderpriority, '[A-Z]+') AS f_regexp_substr,
        split_part(o_orderpriority, '-', 1) AS f_substring_index,
        TRUE AS f_curtime_ok,
        CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS f_timestampdiff,
        CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS f_extract,
        '%Y-%m-%d' AS f_get_format,
        strftime(o_orderdate, '%Y/%m/%d') AS f_date_format,
        strftime(timezone('UTC', to_timestamp(1000000000)), '%Y-%m-%d %H:%M:%S') AS f_from_unixtime,
        CAST(DATE '0001-01-01' + CAST(730000 - 366 AS INTEGER) AS TIMESTAMP) AS f_from_days,
        CAST(dayofyear(o_orderdate) AS INTEGER) AS f_dayofyear,
        CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS f_dayofweek,
        CAST(day(o_orderdate) AS INTEGER) AS f_day,
        CAST(day(o_orderdate) AS INTEGER) AS f_dayofmonth,
        dayname(o_orderdate) AS f_dayname,
        TRUE AS f_curdate_ok,
        CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS f_datediff,
        CAST(CAST(o_orderdate AS DATE) + 5 AS TIMESTAMP) AS f_adddate,
        CAST(CAST(o_orderdate AS DATE) - 3 AS TIMESTAMP) AS f_date_sub,
        CAST(CAST(o_orderdate AS DATE) + 3 AS TIMESTAMP) AS f_date_add,
        timezone('UTC', to_timestamp(epoch(o_orderdate) + 90)) AS f_addtime,
        timezone('America/New_York', timezone('UTC', o_orderdate)) AS f_convert_tz,
        CAST(date_diff('day', DATE '0001-01-01', CAST(o_orderdate AS DATE)) + 366 AS INTEGER) AS f_to_days
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""",

    "q38_ai_functions" -> s"""
      SELECT doc_id,
        md5(text) AS h,
        ${oLlm("'sum: ' || substr(text, 1, 30)")} AS llm_out,
        '# Document' || chr(10) || chr(10) || substr(text, 1, 40) AS md
      FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    "a02_agent_sql" -> s"""
      SELECT 'what is a shuffle' AS question,
        ${oLlm("'what is a shuffle'")} AS answer""",

    "a01_agent_table" -> s"""
      SELECT doc_id, 'what is ' || substr(text, 1, 20) AS question,
        ${oLlm("'what is ' || substr(text, 1, 20)")} AS answer
      FROM documents WHERE doc_id < 5 ORDER BY doc_id""",

    // exposed table → row-count answer from the live table; unexposed →
    // templated completion (prompt = 'sys :: ' || question)
    "a06_agent_data_exposure" -> s"""
      SELECT question, answer FROM (
        SELECT 'how many rows in region' AS question,
          'region has ' || (SELECT COUNT(*) FROM region) || ' rows' AS answer
        UNION ALL
        SELECT 'how many rows in orders' AS question,
          ${oLlm("'sys :: how many rows in orders'")} AS answer)
      ORDER BY question"""
  )
}

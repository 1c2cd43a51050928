package graft.queries

import graft.engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import Parity._

/** Event-stream analytics over the `events` table: tumbling windows,
  * sessionization (gap-based), incremental `LAST` reads backed by the
  * persistent graft.incremental.Watermarks store (reference: SURVEY
  * §2.11 — `WHERE ts > LAST`,
  * mindsdb/interfaces/query_context/context_controller.py:293-344), and
  * funnel-ish per-user aggregation. e01/e02 have Structured Streaming
  * twins in graft.streaming.StreamingOps (equivalence asserted by
  * StreamingSpec); these batch forms are the oracle-checkable semantics.
  */
object Events extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "e01_tumbling_daily" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day"), col("event_type"))
    }),

    "e02_sessionize" -> ((s, dir) => {
      // gap-based sessionization (30 min): lag + cumulative new-session
      // flags. One shuffle on user_id; window state is O(1) per row —
      // holds at 100 TB (and has a streaming twin via session_window).
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapped = t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      gapped.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
          dsum(col("value")).as("sess_value"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    "e03_last_watermark" -> ((s, dir) => {
      // Real `LAST` mechanics against a fresh graft.incremental.Watermarks
      // store: run 1 sees only the data before the split date — first
      // sight initializes the watermark to that increment's max ts
      // (reference init semantics, context_controller.py:311-330); run 2
      // sees the full table and reads strictly past the stored value,
      // then the result callback advances it. Deterministic because the
      // split is fixed; WatermarkSpec drives the multi-run advance.
      val store = new graft.incremental.Watermarks(
        java.nio.file.Files.createTempDirectory("graft_wm").toString)
      val ev = t(s, dir, "events")
      store.applyLast(
        ev.filter(col("ts") < to_timestamp(lit("2024-01-16 00:00:00"))), "ts", "e03")
      val run2 = store.applyLast(ev, "ts", "e03")
      store.advance(run2, "ts", "e03")
      run2.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_new"), min(col("ts")).as("first_new"),
          max(col("ts")).as("last_new"))
        .orderBy(col("event_type"))
    }),

    "e04_user_funnel" -> ((s, dir) => {
      // per-user event-type pivot: conditional counts + conversion flag
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "view", 1).otherwise(0)).cast(LongType).as("n_view"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).cast(LongType).as("n_click"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast(LongType).as("n_purchase"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).cast(IntegerType).as("converted"))
        .orderBy(col("user_id"))
    }),

    "e06_sliding_window" -> ((s, dir) => {
      // sliding 3-day windows advancing 1 day (window() assigns each
      // event to 3 overlapping windows — an in-plan explode, no self
      // join); completes the tumbling/sliding/session trio
      t(s, dir, "events")
        .groupBy(window(col("ts"), "3 days", "1 day").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("w.start").as("window_start"), col("n"), col("total_value"))
        .orderBy(col("window_start"))
    }),

    "e07_event_dedup" -> ((s, dir) => {
      // exact dedup of an at-least-once event stream (20% replay):
      // one shuffle on event_id, keep earliest arrival + arrival count.
      // The streaming twin (StreamingOps.dedupEvents) does the same with
      // dropDuplicatesWithinWatermark state.
      val ev = t(s, dir, "events")
      ev.unionByName(ev.filter(col("event_id") % 5 === 0))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_seen"), min(col("ts")).as("ts"))
        .orderBy(col("event_id"))
    }),

    "e08_asof_join" -> ((s, dir) => {
      // as-of attribution: each purchase joined to the latest click at or
      // before it by the same user (ties: largest click id). One shuffle
      // on user_id via the union/carry-forward TimeJoins.asofBackward —
      // no range cross-product, so the plan is the same at 100 TB.
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      graft.engine.TimeJoins.asofBackward(
          purchases, clicks, Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts",
          tieBreak = Seq("click_id"), rightPrefix = "")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"),
          col("click_id"), col("click_ts"))
        .orderBy(col("event_id"))
    }),

    "e09_range_join" -> ((s, dir) => {
      // interval attribution: per purchase, the user's clicks inside the
      // preceding hour. TimeJoins.pointInInterval bands time into 1-hour
      // buckets so the containment predicate runs as an equi-join on
      // (user_id, bucket) — never a nested-loop range join.
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("win_start"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      val pairs = graft.engine.TimeJoins.pointInInterval(
        clicks, purchases, Seq("user_id"),
        pointCol = "ts", startCol = "win_start", endCol = "ts",
        bucketSeconds = 3600L, pointPrefix = "c_")
      val counts = pairs.groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_clicks_1h"), dsum(col("c_value")).as("click_value_1h"))
      purchases.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("ts"), col("user_id"),
          coalesce(col("n_clicks_1h"), lit(0L)).as("n_clicks_1h"),
          coalesce(col("click_value_1h"), lit(0.0)).as("click_value_1h"))
        .orderBy(col("event_id"))
    }),

    "e10_asof_sql" -> ((s, dir) => {
      // the e08 semantics as pure SQL through the statement router:
      // DuckDB-style `ASOF LEFT JOIN` lowered to the same carry-forward
      // TimeJoins plan (Commands routes the spelling; the oracle runs
      // DuckDB's native ASOF JOIN)
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE VIEW asof_purch AS SELECT event_id, ts, user_id, value
        FROM events WHERE event_type = 'purchase'""")
      c.execute("""CREATE VIEW asof_clicks AS SELECT user_id,
        event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'""")
      c.execute("""SELECT event_id, ts, user_id, value, click_id, click_ts
        FROM asof_purch p ASOF LEFT JOIN asof_clicks c
        ON p.user_id = c.user_id AND p.ts >= c.click_ts
        ORDER BY event_id""")
    }),

    "e11_stream_join" -> ((s, dir) => {
      // batch twin of StreamingOps.clickToPurchase (stream-stream
      // interval join with expirable state): every (click, purchase)
      // pair of the same user with the purchase in the hour after the
      // click. Same banded equi-join shape as e09 — the containment
      // predicate runs on (user_id, hour-bucket), never a nested loop.
      // StreamingSpec asserts the streaming execution emits exactly
      // these rows.
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("win_end"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.engine.TimeJoins.pointInInterval(
        purchases, clicks, Seq("user_id"),
        pointCol = "ts", startCol = "click_ts", endCol = "win_end",
        bucketSeconds = 3600L, pointPrefix = "p_")
        .select(col("click_id"), col("user_id"),
          col("p_event_id").as("purchase_id"),
          col("click_ts"), col("p_ts").as("purchase_ts"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    // the e03 LAST mechanics as pure SQL through the statement router
    // (`WHERE ts > LAST` — context_controller.py:293-344): run 1 inits
    // the watermark on the pre-split table, an INSERT lands the
    // post-split rows, run 2 reads exactly the new increment
    "e12_last_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE TABLE ev12 AS SELECT event_id, ts, event_type
        FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'""")
      val q = "SELECT event_id, ts, event_type FROM ev12 WHERE ts > LAST"
      c.execute(q) // init: swallows history
      c.execute("""INSERT INTO ev12 SELECT event_id, ts, event_type
        FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""")
      c.execute(q)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_new"), min(col("ts")).as("first_new"))
        .orderBy(col("event_type"))
    }),

    // `COALESCE(LAST, <default>)`: the reference's override of LAST's
    // init-to-max (tests/unit/executor/test_base_queires.py
    // test_last_coalesce) — the FIRST run returns rows past the given
    // default instead of swallowing history; the watermark then advances
    // from results, so the second run sees only what arrived since
    "e35_last_coalesce_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE TABLE ev35 AS SELECT event_id, ts, event_type
        FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'""")
      val q = """SELECT event_id, ts, event_type FROM ev35
        WHERE ts > COALESCE(LAST, TIMESTAMP '2024-01-16 00:00:00')"""
      val run1 = c.execute(q) // first run: rows in (Jan 16, Jan 20)
      c.execute("""INSERT INTO ev35 SELECT event_id, ts, event_type
        FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'""")
      val run2 = c.execute(q) // second run: only the new arrivals
      def sum1(df: DataFrame, run: Int) = df
        .groupBy(lit(run).cast(IntegerType).as("run"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("first_ts"))
      sum1(run1, 1).unionByName(sum1(run2, 2))
        .orderBy(col("run"), col("event_type"))
    }),

    // external-source polling trigger end-to-end (subscribe() semantics,
    // dummy_data_handler.py:102): a DSv2 mem table grows between two
    // fires; each fire key-diffs the snapshot and the trigger SQL
    // aggregates ONLY the delta into the accumulator — so the per-batch
    // counts prove no row was re-delivered
    "e13_poll_trigger" -> ((s, dir) => {
      import graft.federation.{MemCatalog, MemTables}
      if (!s.conf.getOption("spark.sql.catalog.mem")
          .contains(classOf[MemCatalog].getName))
        s.conf.set("spark.sql.catalog.mem", classOf[MemCatalog].getName)
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      val src = t(s, dir, "events").select(col("event_id"), col("event_type"))
      def slice(maxId: Long) = MemTables.register("e13_src",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType))),
        src.filter(col("event_id") <= maxId).collect().toSeq)
      c.execute("CREATE TABLE e13_acc (event_type STRING, n BIGINT)")
      c.execute("""CREATE TRIGGER e13t ON mem.e13_src
        (INSERT INTO e13_acc SELECT event_type, count(*) AS n
         FROM TABLE_DELTA GROUP BY event_type)""")
      slice(1000); c.fireTrigger("e13t")
      c.fireTrigger("e13t") // no new keys: must not re-deliver
      slice(2000); c.fireTrigger("e13t")
      c.execute("""SELECT event_type, count(*) AS n_batches,
          sum(n) AS n_events, min(n) AS min_batch, max(n) AS max_batch
        FROM e13_acc GROUP BY event_type ORDER BY event_type""")
    }),

    // chatbot TRANSPORT stand-in end-to-end (chatbot_task.py poll loop):
    // the bot binds to a mem-catalog message table; each poll key-diffs
    // the channel (exactly-once, the e13 protocol), answers every new
    // message THROUGH the session turn memory, and posts replies into a
    // warehouse reply table. Two polls, interleaved sessions: the second
    // batch's answers embed first-batch context, proving the memory
    // crossed polls; the middle no-op poll proves no re-delivery.
    "e33_chatbot_channel" -> ((s, dir) => {
      import graft.federation.{MemCatalog, MemTables}
      if (!s.conf.getOption("spark.sql.catalog.mem")
          .contains(classOf[MemCatalog].getName))
        s.conf.set("spark.sql.catalog.mem", classOf[MemCatalog].getName)
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      val msgSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("message_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("session",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.StringType)))
      val all = Seq(
        org.apache.spark.sql.Row(1L, "s1", "hello there spark"),
        org.apache.spark.sql.Row(2L, "s2", "what is a join"),
        org.apache.spark.sql.Row(3L, "s1", "tell me more"),
        org.apache.spark.sql.Row(4L, "s2", "and a shuffle too"))
      def channel(n: Int) = MemTables.register("chan33_msgs", msgSchema, all.take(n))
      c.execute("CREATE DATABASE chan33 ENGINE 'mem'")
      c.execute("""CREATE CHATBOT tb33 USING database='chan33', model='default',
        table='chan33_msgs', reply_table='tb33_replies'""")
      channel(2); c.pollChatbotChannel("tb33")
      c.pollChatbotChannel("tb33") // no new messages: must answer nothing
      channel(4); c.pollChatbotChannel("tb33")
      c.execute("""SELECT message_id, session, batch, answer
        FROM tb33_replies ORDER BY message_id""")
    }),

    // ---- multi-touch attribution: credit each purchase to the
    // campaign (props.k) of the user's touchpoints — last-touch within
    // a 7-day lookback (the industry default), first-touch ever, and
    // last-touch revenue. ONE user-partitioned ordered window does the
    // carry-forward (last_camp and last_ts share the SAME not-null
    // condition, so the pair cannot desync); the lookback compares
    // timestamps with exact INTERVAL arithmetic. At 100 TB the only
    // data-scale shuffle is the per-user timeline partition — skew is
    // bounded by one user's activity — then a |campaigns| rollup.
    "e34_attribution" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val touched = t(s, dir, "events")
        .withColumn("camp",
          when(col("event_type").isin("click", "view"),
            get_json_object(col("props"), "$.k").cast(LongType)))
        .withColumn("last_camp", last(col("camp"), ignoreNulls = true).over(byUser))
        .withColumn("last_ts",
          last(when(col("camp").isNotNull, col("ts")), ignoreNulls = true).over(byUser))
        .withColumn("first_camp", first(col("camp"), ignoreNulls = true).over(byUser))
      val conv = touched
        .filter(col("event_type") === "purchase" && col("last_camp").isNotNull)
        .select(col("last_camp"), col("first_camp"), col("value"),
          (col("ts") <= col("last_ts") + expr("INTERVAL 7 DAYS")).as("in_window"))
      // ONE pass: unpivot each purchase into its credit rows (last-touch
      // only when in the lookback window; first-touch always), then a
      // single |campaigns| rollup — the two-groupings + full-outer-join
      // spelling consumed the windowed timeline twice (two exchanges of
      // the event corpus; PlanShapeSpec pins this to one)
      val lastCredit = struct(lit("last").as("kind"),
        col("last_camp").as("campaign"), col("value").as("v"))
      val firstCredit = struct(lit("first").as("kind"),
        col("first_camp").as("campaign"), lit(null).cast(DoubleType).as("v"))
      conv
        .select(explode(when(col("in_window"), array(lastCredit, firstCredit))
          .otherwise(array(firstCredit))).as("c"))
        .select(col("c.kind"), col("c.campaign"), col("c.v"))
        .groupBy(col("campaign"))
        .agg(
          sum(when(col("kind") === "last", 1L).otherwise(0L)).as("conv_last"),
          coalesce(dsum(when(col("kind") === "last", col("v"))), lit(0.0)).as("rev_last"),
          sum(when(col("kind") === "first", 1L).otherwise(0L)).as("conv_first"))
        .orderBy(col("campaign"))
    }),

    // ---- assist analysis: per campaign, conversions it CLOSED
    // (last touch) vs conversions it only ASSISTED (first touch of a
    // journey another campaign closed) — the report that keeps
    // exponential-decay engagement score (the feature-store recency
    // weighting behind churn/LTV features): each event contributes
    // value · 2^(−age_days/7), ages anchored to the corpus max day. The
    // decay weights come from a ≤367-row BROADCAST lookup precomputed
    // once in exact decimals (never a per-row float pow — engines
    // disagree in pow's last ulp), so the whole op is one broadcast
    // join + a map-side-combinable decimal sum per user — no window, no
    // shuffle beyond the user rollup. 100 TB shape: the lookup is
    // constant-size at any corpus.
    "e38_decay_engagement" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      val ev = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val mx = ev.agg(max(col("day")).as("mx"))
      val decay = decayRows.toDF("age", "w")
      // LEFT join: events older than the 366-day lookup horizon decay to
      // weight 0 but still count in n_events — an inner join would drop
      // them (and users with only old events) from the output entirely
      ev.crossJoin(broadcast(mx))
        .withColumn("age", datediff(col("mx"), col("day")))
        .join(broadcast(decay), Seq("age"), "left")
        .withColumn("w", coalesce(col("w"), lit(0.0)))
        .groupBy(col("user_id"))
        .agg(Parity.dsum2(col("value"), col("w")).as("eng"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), round(col("eng"), 4).as("engagement"),
          col("n_events"))
        .orderBy(col("user_id"))
    }),

    // last-touch attribution from starving upper-funnel campaigns. Same
    // one-pass credit unpivot as e34.
    "e37_campaign_assists" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val touched = t(s, dir, "events")
        .withColumn("camp",
          when(col("event_type").isin("click", "view"),
            get_json_object(col("props"), "$.k").cast(LongType)))
        .withColumn("last_camp", last(col("camp"), ignoreNulls = true).over(byUser))
        .withColumn("first_camp", first(col("camp"), ignoreNulls = true).over(byUser))
      val conv = touched
        .filter(col("event_type") === "purchase" && col("last_camp").isNotNull)
        .select(col("last_camp"), col("first_camp"))
      val closeCredit = struct(lit("close").as("kind"),
        col("last_camp").as("campaign"))
      val assistCredit = struct(lit("assist").as("kind"),
        col("first_camp").as("campaign"))
      conv
        .select(explode(when(col("first_camp") =!= col("last_camp"),
          array(closeCredit, assistCredit)).otherwise(array(closeCredit))).as("c"))
        .select(col("c.kind"), col("c.campaign"))
        .groupBy(col("campaign"))
        .agg(
          sum(when(col("kind") === "close", 1L).otherwise(0L)).as("n_closed"),
          sum(when(col("kind") === "assist", 1L).otherwise(0L)).as("n_assisted"))
        .orderBy(col("campaign"))
    }),

    // ---- conversion lag: how long after the last touch do purchases
    // land? Same carry-forward timeline as e34, then an exact integer
    // day-bucket histogram per lag with revenue — the report that sizes
    // attribution lookback windows (is 7 days enough?). One user
    // partition + one |lags| rollup.
    "e36_conversion_lag" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val touched = t(s, dir, "events")
        .withColumn("camp",
          when(col("event_type").isin("click", "view"),
            get_json_object(col("props"), "$.k").cast(LongType)))
        .withColumn("last_ts",
          last(when(col("camp").isNotNull, col("ts")), ignoreNulls = true).over(byUser))
      touched
        .filter(col("event_type") === "purchase" && col("last_ts").isNotNull)
        .select(floor((unix_micros(col("ts")) - unix_micros(col("last_ts")))
          / lit(86400000000L)).as("lag_days"), col("value"))
        .groupBy(col("lag_days"))
        .agg(count(lit(1)).as("n_conversions"), dsum(col("value")).as("revenue"))
        .orderBy(col("lag_days"))
    }),

    // Spark 4 VARIANT as the semi-structured column path (the
    // reference's JSON columns story): parse once into the binary
    // variant encoding, extract typed fields with variant_get — the
    // open-format analog of a struct-typed shredded read, and the form
    // Photon-class engines vectorize; json string re-parsing per access
    // is the anti-pattern this replaces
    "e14_variant_props" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // IGNORE NULLS window navigation: per-user carry-forward of the last
    // purchase amount (gap-filling a sparse signal along an event
    // timeline) — lag/last_value with null skipping, the SQL spelling of
    // a forward-fill. One shuffle on user_id, O(1) state per row.
    // batch twin of StreamingOps.enrichStatic (stream-static feature
    // lookup): events from the last week enriched with each user's
    // PRIOR lifetime profile (count + exact-decimal spend before the
    // cutoff). The dim side is |users|-sized → broadcast; the stream
    // side never keys state, so the streaming twin is stateless.
    "e17_stream_enrich" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cutoff = to_timestamp(lit("2024-01-25 00:00:00"))
      val dim = ev.filter(col("ts") < cutoff)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("hist_n"), dsum(col("value")).as("hist_total"))
      ev.filter(col("ts") >= cutoff)
        .join(broadcast(dim), Seq("user_id"), "left")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("hist_n"), col("hist_total"))
        .orderBy(col("event_id"))
    }),

    "e15_carry_forward" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT event_id, user_id, event_type, purchase_val,
          lag(purchase_val) IGNORE NULLS
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase,
          last_value(purchase_val) IGNORE NULLS
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM (SELECT event_id, user_id, ts, event_type,
                CASE WHEN event_type = 'purchase' THEN value END AS purchase_val
              FROM events WHERE user_id < 20)
        ORDER BY user_id, event_id
      """)
    }),

    // RANGE-interval window frames: trailing 24h activity per user,
    // ordered by event time — the time-based frame spelling (vs q16's
    // row-based frames). The value sum runs in exact integer cents:
    // a double SUM over a RANGE frame is summation-order-sensitive and
    // two engines may disagree in the last ulp; cents cannot.
    "e16_range_frame" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT event_id, user_id,
          CAST(SUM(1) OVER w AS BIGINT) AS n_24h,
          SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
            / CAST(100.0 AS DOUBLE) AS val_24h
        FROM events WHERE user_id < 10
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
      """)
    }),

    // retention cohort matrix: users grouped by first-seen day, activity
    // counted at each day offset — the standard growth-analytics read on
    // an event log. Two shuffles total: one per-user min (map-side
    // combinable), one (cohort_day, offset) count with the per-user
    // first-day broadcast back via join on user_id; distinct-user counts
    // are exact. At 100 TB the cohort table is |users|-sized — the join
    // is the only wide op and AQE handles its skew.
    "e18_retention_cohort" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val firstDay = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
      ev.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
        .join(firstDay, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast(LongType).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // event-type transition matrix (first-order Markov view of user
    // journeys): per-user lead() pairs each event with its successor,
    // then one count per (from, to) cell plus the row-normalized
    // probability. O(1) window state per row, one shuffle on user_id,
    // one |types|²-sized aggregate — scale-safe at any corpus size.
    "e19_event_transitions" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
      val cells = pairs.groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val byFrom = Window.partitionBy(col("from_type"))
      cells
        .withColumn("p", round(col("n") / sum(col("n")).over(byFrom), 6))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // strict-order funnel (view → click-after-view → purchase-after-
    // click): each stage's first timestamp must follow the previous
    // stage's. Three filtered window-mins share ONE partitioning on
    // user_id (Catalyst reuses the exchange), then a |cohorts|-sized
    // rollup — no per-stage re-scan, no self-joins. Unlike e04's
    // unordered counts, a click before the first view does NOT convert.
    "e20_funnel_strict" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      val staged = t(s, dir, "events")
        .withColumn("first_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("first_click",
          min(when(col("event_type") === "click" && col("ts") > col("first_view"),
            col("ts"))).over(w))
        .withColumn("first_purchase",
          min(when(col("event_type") === "purchase" && col("ts") > col("first_click"),
            col("ts"))).over(w))
      staged.groupBy(col("user_id"))
        .agg(min(col("first_view")).as("v"), min(col("first_click")).as("c"),
          min(col("first_purchase")).as("p"))
        .filter(col("v").isNotNull)
        .groupBy(date_trunc("day", col("v")).as("cohort_day"))
        .agg(count(lit(1)).as("n_view"),
          sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_click"),
          sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
        .orderBy(col("cohort_day"))
    }),

    // RFM segmentation (recency/frequency/monetary): per-user metrics in
    // one aggregation, quintile boundaries from ONE exact-percentile
    // pass (a 1-row frame, broadcast), buckets by comparison against the
    // broadcast boundaries — no global ntile window (a corpus-wide
    // ordered window would pin all users to one task at 100 TB).
    "e21_rfm_segments" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
          dsum(col("value")).as("monetary"))
      val anchor = perUser.groupBy().agg(max(col("last_ts")).as("anchor"))
      val metrics = perUser.crossJoin(broadcast(anchor))
        .withColumn("recency",
          expr("(unix_micros(anchor) - unix_micros(last_ts)) div 86400000000"))
      val bounds = metrics.groupBy().agg(
        expr("percentile(recency, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rb"),
        expr("percentile(freq, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fb"),
        expr("percentile(monetary, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mb"))
      def bucket(m: Column, b: Column, inverted: Boolean): Column = {
        val raw = (0 until 4).map(i => when(m > b.getItem(i), 1).otherwise(0))
          .reduce(_ + _) + lit(1)
        if (inverted) lit(6) - raw else raw // recent = high score
      }
      metrics.crossJoin(broadcast(bounds))
        .withColumn("r", bucket(col("recency").cast(DoubleType), col("rb"), inverted = true))
        .withColumn("f", bucket(col("freq").cast(DoubleType), col("fb"), inverted = false))
        .withColumn("m", bucket(col("monetary"), col("mb"), inverted = false))
        .groupBy(col("r"), col("f"), col("m"))
        .agg(count(lit(1)).as("n_users"), dsum(col("monetary")).as("total_value"))
        .orderBy(col("r"), col("f"), col("m"))
    }),

    // most-common 3-step user paths (the path-mining read behind funnel
    // DISCOVERY — e20 checks a KNOWN funnel; this surfaces the paths
    // worth checking): two leads over ONE per-user ordered partitioning
    // (O(1) window state), a |types|³-bounded count, total tie order.
    "e23_common_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(10)
    }),

    // rolling 7-day distinct active users (DAU + trailing WAU): exact
    // distinct counts over a sliding window. COUNT(DISTINCT) cannot ride
    // a window frame, and a corpus-wide ordered window would pin one
    // task — instead each (user, day) fans out to the ≤7 report days it
    // supports (a constant-factor map-side explode), then ONE distinct
    // aggregation keyed on report day does all the work. Report days are
    // semi-joined to days that actually occur, so the fan-out adds no
    // phantom tail days.
    "e22_rolling_dau" -> ((s, dir) => {
      val du = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = du.select(col("day")).distinct()
      val contrib = du
        .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("off"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
      val wau = contrib.join(days, Seq("day"), "left_semi")
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau7"))
      val dau = du.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      dau.join(wau, Seq("day"))
        .select(col("day").cast("timestamp").as("day"), col("dau"), col("wau7"))
        .orderBy(col("day"))
    }),

    // gap-based sessionization (30-min inactivity cut — the batch twin of
    // e06's streaming session windows): lag() over the per-user ordered
    // partitioning marks session starts, a running sum over the SAME
    // partitioning numbers them (Catalyst reuses one exchange + sort for
    // both windows), then one aggregation per (user, session) and a
    // combinable histogram by session length. Per-user window state is
    // O(1) and partitions are user-sized — no global sort anywhere, the
    // canonical sessionize plan at any corpus size.
    "e24_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapped = t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            expr("unix_micros(ts) - unix_micros(prev_ts)") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_no", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      gapped.groupBy(col("user_id"), col("sess_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("st"), max(col("ts")).as("en"))
        .groupBy(col("n_events"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(expr("(unix_micros(en) - unix_micros(st)) div 1000000"))
            .as("total_duration_s"))
        .orderBy(col("n_events"))
    }),

    // MATCH_RECOGNIZE-lite row-pattern matching (SQL:2016 ch. 12's core
    // use): each user's ordered event-type sequence renders to a letter
    // string — one ordered array_sort over a per-user collected struct
    // array, bounded by that user's own activity (the per-entity bound
    // every sessionizer accepts) — and a regex counts non-overlapping
    // view→clicks→purchase runs. The regex subset (literal letters,
    // greedy *) matches identically in Java and RE2-family engines.
    "e25_pattern_match" -> ((s, dir) => {
      val letter = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p").otherwise("x")
      t(s, dir, "events")
        .withColumn("l", letter)
        .groupBy(col("user_id"))
        .agg(concat_ws("",
          expr("transform(array_sort(collect_list(struct(ts, event_id, l))), x -> x.l)"))
          .as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast(LongType).as("seq_len"),
          size(expr("regexp_extract_all(seq, 'vc*p', 0)")).cast(LongType).as("n_funnels"))
        .filter(col("user_id") < 200)
        .orderBy(col("user_id"))
    }),

    // A/B experiment readout (two-proportion pooled z-test): variant =
    // user_id parity, conversion = "user ever purchased". The whole
    // readout is two combinable aggregations (per-user flag → per-arm
    // counts) and a 1×1 join of the two arm rows — the z-score derives
    // from four exact integers in ONE deterministic double expression,
    // mirrored token-for-token in the oracle (IEEE ops on identical
    // inputs in identical order ⇒ identical bits).
    "e26_ab_test" -> ((s, dir) => {
      // conversion = a high-value purchase (plain "ever purchased" is ~1.0
      // in this data — a degenerate pooled variance divides by zero)
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150, 1L)
          .otherwise(0L)).as("conv"))
        .withColumn("variant", (col("user_id") % 2).cast("int"))
      val arms = perUser.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      val a = arms.filter(col("variant") === 0)
        .select(col("n_users").as("n0"), col("n_conv").as("c0"))
      val b = arms.filter(col("variant") === 1)
        .select(col("n_users").as("n1"), col("n_conv").as("c1"))
      val pPool = (col("c0") + col("c1")).cast(DoubleType) / (col("n0") + col("n1"))
      a.crossJoin(b).select(
        col("n0"), col("c0"), col("n1"), col("c1"),
        round(col("c0").cast(DoubleType) / col("n0"), 6).as("p0"),
        round(col("c1").cast(DoubleType) / col("n1"), 6).as("p1"),
        round(
          when(pPool > 0 && pPool < 1,
            (col("c1").cast(DoubleType) / col("n1") - col("c0").cast(DoubleType) / col("n0")) /
              sqrt(pPool * (lit(1.0) - pPool) *
                (lit(1.0) / col("n0") + lit(1.0) / col("n1"))))
            .otherwise(lit(0.0)), 6).as("z"))
    }),

    // survival-analysis hazard table (the Kaplan-Meier ingredient set —
    // time-to-convert from first view, right-censored at the observation
    // edge): per-user spans from ONE aggregation, then the life table is
    // a |days|-sized rollup — n_at_risk derives from a cumulative sum
    // over that post-aggregation table (model-sized; the only ordered
    // window runs on ≤ observation-days rows, never the corpus). The
    // KM product itself is left to the reader because exp/ln are not
    // cross-libm bit-stable; every emitted column is exact-integer or a
    // single rounded division.
    "e27_survival_hazard" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val perUser = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("v"),
        min(when(col("event_type") === "purchase" && col("value") > 150, col("ts"))).as("p"))
        .filter(col("v").isNotNull)
      val maxTs = ev.groupBy().agg(max(col("ts")).as("mx"))
      val spans = perUser.crossJoin(broadcast(maxTs))
        .withColumn("conv", col("p").isNotNull && col("p") >= col("v"))
        .withColumn("off",
          when(col("conv"), datediff(to_date(col("p")), to_date(col("v"))))
            .otherwise(datediff(to_date(col("mx")), to_date(col("v")))).cast(LongType))
      val byOff = spans.groupBy(col("off")).agg(
        sum(when(col("conv"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("conv"), 1L).otherwise(0L)).as("c"))
      val w = Window.orderBy(col("off"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byOff
        .withColumn("removed_before", coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
        .crossJoin(broadcast(spans.groupBy().agg(count(lit(1)).as("n_total"))))
        .select(col("off"),
          (col("n_total") - col("removed_before")).as("n_at_risk"),
          col("d").as("n_events"), col("c").as("n_censored"),
          round(col("d").cast(DoubleType) /
            (col("n_total") - col("removed_before")), 6).as("hazard"))
        .orderBy(col("off"))
    }),

    // robust outlier days by median absolute deviation (the 3-MAD rule —
    // Hampel's robust alternative to z-scores, immune to the outliers it
    // hunts): the corpus collapses to a |days|-sized daily rollup FIRST,
    // so the two global median windows run on post-aggregation rows only
    // (model-sized — the same deliberate exception as e27's life table).
    // Medians use q61's literal rank formula k = floor((n−1)/2)+1 on both
    // engines; every column is exact-integer.
    "e29_mad_outlier_days" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")).as("cents"))
      def medianOf(df: DataFrame, c: String): DataFrame = {
        val w = Window.orderBy(col(c))
        df.withColumn("rn", row_number().over(w))
          .crossJoin(broadcast(df.groupBy().agg(count(lit(1)).as("n"))))
          .filter(col("rn") === expr("CAST(floor((n - 1) * 0.5) AS BIGINT) + 1"))
          .select(col(c).as(s"med_$c"))
      }
      val dev = daily.crossJoin(broadcast(medianOf(daily, "cents")))
        .withColumn("adev", abs(col("cents") - col("med_cents")))
      dev.crossJoin(broadcast(medianOf(dev.select(col("adev")), "adev")))
        .select(col("day").cast("timestamp").as("day"), col("cents"),
          col("med_cents").as("med"), col("adev"),
          col("med_adev").as("mad"),
          (col("adev") > lit(3) * col("med_adev")).as("is_outlier"))
        .orderBy(col("day"))
    }),

    // cohort LTV curve (cumulative revenue per signup cohort by day
    // offset — e18's retention matrix with money instead of presence):
    // revenue rolls up per (cohort, offset) combinably, the cumulative
    // sum runs per-cohort over post-aggregation rows, cohort sizes join
    // back dimension-sized; exact integer cents, one deterministic
    // division chain at output.
    "e31_cohort_ltv" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val firstDay = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      val rev = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .join(firstDay, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast(LongType).as("day_offset"))
        .agg(sum(col("cents")).as("cents"))
      val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val sizes = firstDay.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("cohort_users"))
      rev.withColumn("cum_cents", sum(col("cents")).over(w))
        .join(sizes, Seq("cohort_day"))
        .select(col("cohort_day").cast("timestamp").as("cohort_day"),
          col("day_offset"), col("cents"), col("cum_cents"), col("cohort_users"),
          round(col("cum_cents").cast(DoubleType) / col("cohort_users") / 100.0, 6)
            .as("ltv_per_user"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // DAU/MAU stickiness ratio (the engagement KPI): trailing-30-day MAU
    // by the same constant-factor fan-out as e22 (each (user, day)
    // supports its ≤30 report days, then ONE exact distinct aggregation)
    // — no corpus window, no per-day rescan; the ratio is one rounded
    // division of two exact counts.
    "e32_stickiness" -> ((s, dir) => {
      // DAU / 30-day-MAU stickiness. The r14 plan exploded 30 offsets
      // per user-day into a corpus-sized countDistinct — 30·|user-days|
      // shuffled rows, the e-pack's worst factor-100 ratio (85.9x).
      // The production shape is a SWEEP-LINE: each user's active days
      // merge into disjoint coverage intervals [day, day+29] (one
      // windowed pass over |user-days|, partitioned by user), intervals
      // become ±1 boundary deltas, and a CALENDAR-sized running sum
      // yields the exact 30-day active-user count per day — a user
      // covers a day iff it falls in one of their merged intervals, so
      // the values are identical while nothing corpus-sized is
      // exploded or distinct-aggregated. The single-partition final
      // window runs over span+30 calendar days, invariant in the
      // corpus.
      val du = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = du.select(col("day")).distinct()
      val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val seg = du
        .withColumn("pend", max(date_add(col("day"), 29))
          .over(wU.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("newseg",
          (col("pend").isNull || col("day") > col("pend")).cast("int"))
        .withColumn("seg", sum(col("newseg")).over(wU))
        .groupBy(col("user_id"), col("seg"))
        .agg(min(col("day")).as("s"), max(date_add(col("day"), 29)).as("e"))
      val deltas = seg.select(col("s").as("day"), lit(1L).as("d"))
        .unionAll(seg.select(date_add(col("e"), 1).as("day"), lit(-1L).as("d")))
        .unionAll(days.select(col("day"), lit(0L).as("d")))
        .groupBy(col("day")).agg(sum(col("d")).as("d"))
      val wCal = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val mau = deltas.withColumn("mau30", sum(col("d")).over(wCal))
        .join(days, Seq("day"), "left_semi")
        .select(col("day"), col("mau30"))
      // du is already (user, day)-distinct: DAU is a plain count
      val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      dau.join(mau, Seq("day"))
        .select(col("day").cast("timestamp").as("day"), col("dau"), col("mau30"),
          round(col("dau").cast(DoubleType) / col("mau30"), 6).as("stickiness"))
        .orderBy(col("day"))
    }),

    "e05_hourly_active" -> ((s, dir) => {
      // distinct active users per hour + top event type, exercising
      // count-distinct + window-over-aggregate composition
      val hourly = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      // top type per hour via map-side-combinable min_by on the total
      // order (-n, event_type) — same (n desc, type asc) winner the
      // previous per-hr window produced, one less Exchange+Sort
      hourly.groupBy(col("hr"))
        .agg(min_by(struct(col("event_type"), col("n")),
          struct(negate(col("n")), col("event_type"))).as("__b"))
        .select(col("hr"), col("__b.event_type").as("top_type"),
          col("__b.n").as("top_n"))
        .orderBy(col("hr"))
    })
  )

  /** e38's decay lookup: 2^(−age/7) at 4dp, one literal table shared
    * verbatim by the Spark frame and the oracle VALUES list — no engine
    * evaluates a float pow per row. */
  private lazy val decayRows: Seq[(Int, Double)] =
    (0 to 366).map(a => a -> BigDecimal(math.pow(0.5, a / 7.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

  def oracles: Map[String, String] = Map(

    "e38_decay_engagement" -> {
      val values = decayRows.map { case (a, w) => s"($a, $w)" }.mkString(", ")
      s"""WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS m FROM events),
      d AS (SELECT * FROM (VALUES $values) AS v(age, w))
      SELECT user_id,
        ROUND(${Parity.oSum2("value", "COALESCE(d.w, 0)")}, 4) AS engagement,
        COUNT(*) AS n_events
      FROM events CROSS JOIN mx
      LEFT JOIN d ON datediff('day', CAST(ts AS DATE), mx.m) = d.age
      GROUP BY user_id ORDER BY user_id"""
    },
    // typed json_extract is DuckDB's native equivalent of variant_get
    "e14_variant_props" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",

    // DuckDB spells null skipping inside the call parens
    "e17_stream_enrich" -> s"""
      WITH dim AS (
        SELECT user_id, COUNT(*) AS hist_n, ${oSum("value")} AS hist_total
        FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
        GROUP BY user_id)
      SELECT e.event_id, e.user_id, e.event_type, e.value,
        dim.hist_n, dim.hist_total
      FROM events e LEFT JOIN dim USING (user_id)
      WHERE e.ts >= TIMESTAMP '2024-01-25 00:00:00'
      ORDER BY e.event_id""",

    "e23_common_paths" -> """
      WITH seq AS (
        SELECT event_type AS step1,
          lead(event_type, 1) OVER w AS step2,
          lead(event_type, 2) OVER w AS step3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT step1, step2, step3, COUNT(*) AS n
      FROM seq WHERE step3 IS NOT NULL
      GROUP BY step1, step2, step3
      ORDER BY n DESC, step1, step2, step3
      LIMIT 10""",

    // e22's fan-out shape with a 30-day support window
    "e32_stickiness" -> """
      WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      days AS (SELECT DISTINCT day FROM du),
      contrib AS (
        SELECT du.user_id, du.day + CAST(o.off AS INTEGER) AS day
        FROM du CROSS JOIN (SELECT range AS off FROM range(0, 30)) o),
      mau AS (
        SELECT c.day, COUNT(DISTINCT c.user_id) AS mau30
        FROM contrib c
        WHERE c.day IN (SELECT day FROM days)
        GROUP BY c.day),
      dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day)
      SELECT CAST(dau.day AS TIMESTAMP) AS day,
        CAST(dau.dau AS BIGINT) AS dau, CAST(mau.mau30 AS BIGINT) AS mau30,
        ROUND(CAST(dau.dau AS DOUBLE) / mau.mau30, 6) AS stickiness
      FROM dau JOIN mau ON mau.day = dau.day
      ORDER BY dau.day""",

    // same rollup, same per-cohort running sum, same division order
    "e31_cohort_ltv" -> """
      WITH fd AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id),
      rev AS (
        SELECT fd.cohort_day,
          CAST(datediff('day', fd.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
            AS day_offset,
          CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events e JOIN fd ON fd.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
      cum AS (
        SELECT cohort_day, day_offset, cents,
          SUM(cents) OVER (PARTITION BY cohort_day ORDER BY day_offset
            ROWS UNBOUNDED PRECEDING) AS cum_cents
        FROM rev),
      sz AS (SELECT cohort_day, COUNT(*) AS cohort_users FROM fd GROUP BY 1)
      SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day, c.day_offset,
        c.cents, CAST(c.cum_cents AS BIGINT) AS cum_cents,
        CAST(sz.cohort_users AS BIGINT) AS cohort_users,
        ROUND(CAST(c.cum_cents AS DOUBLE) / sz.cohort_users / 100.0, 6)
          AS ltv_per_user
      FROM cum c JOIN sz ON sz.cohort_day = c.cohort_day
      ORDER BY c.cohort_day, c.day_offset""",

    // same daily rollup, same literal-rank medians
    "e29_mad_outlier_days" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
          CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1),
      r1 AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
               COUNT(*) OVER () AS n FROM daily),
      med AS (SELECT cents AS med FROM r1
              WHERE rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1),
      dev AS (SELECT day, cents, med, abs(cents - med) AS adev FROM daily, med),
      r2 AS (SELECT adev, row_number() OVER (ORDER BY adev) AS rn,
               COUNT(*) OVER () AS n FROM dev),
      mad AS (SELECT adev AS mad FROM r2
              WHERE rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1)
      SELECT CAST(day AS TIMESTAMP) AS day, cents, med, adev, mad,
        adev > 3 * mad AS is_outlier
      FROM dev, mad ORDER BY day""",

    // same span derivation, same |days|-sized cumulative risk table
    "e27_survival_hazard" -> """
      WITH pu AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS v,
          MIN(CASE WHEN event_type = 'purchase' AND value > 150 THEN ts END) AS p
        FROM events GROUP BY user_id),
      mx AS (SELECT MAX(ts) AS mx FROM events),
      spans AS (
        SELECT user_id, p IS NOT NULL AND p >= v AS conv,
          CASE WHEN p IS NOT NULL AND p >= v
               THEN datediff('day', CAST(v AS DATE), CAST(p AS DATE))
               ELSE datediff('day', CAST(v AS DATE), CAST(mx.mx AS DATE)) END AS off
        FROM pu, mx WHERE v IS NOT NULL),
      byoff AS (
        SELECT off,
          SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS d,
          SUM(CASE WHEN NOT conv THEN 1 ELSE 0 END) AS c
        FROM spans GROUP BY off),
      tot AS (SELECT COUNT(*) AS n_total FROM spans),
      lifet AS (
        SELECT off, d, c,
          COALESCE(SUM(d + c) OVER (
            ORDER BY off ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS removed_before
        FROM byoff)
      SELECT CAST(off AS BIGINT) AS off,
        CAST(n_total - removed_before AS BIGINT) AS n_at_risk,
        CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
        ROUND(CAST(d AS DOUBLE) / (n_total - removed_before), 6) AS hazard
      FROM lifet, tot ORDER BY off""",

    // the same four integers through the token-identical z expression
    "e26_ab_test" -> """
      WITH pu AS (
        SELECT user_id,
          MAX(CASE WHEN event_type = 'purchase' AND value > 150
              THEN 1 ELSE 0 END) AS conv,
          CAST(user_id % 2 AS INTEGER) AS variant
        FROM events GROUP BY user_id),
      arms AS (
        SELECT variant, COUNT(*) AS n_users, SUM(conv) AS n_conv
        FROM pu GROUP BY variant),
      a AS (SELECT n_users AS n0, n_conv AS c0 FROM arms WHERE variant = 0),
      b AS (SELECT n_users AS n1, n_conv AS c1 FROM arms WHERE variant = 1)
      SELECT CAST(n0 AS BIGINT) AS n0, CAST(c0 AS BIGINT) AS c0,
        CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
        ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
        ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
        ROUND(
          CASE WHEN CAST(c0 + c1 AS DOUBLE) / (n0 + n1) > 0
                AND CAST(c0 + c1 AS DOUBLE) / (n0 + n1) < 1
            THEN (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
              sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
                   (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
                   (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1))
            ELSE 0.0 END, 6) AS z
      FROM a, b""",

    // ordered string_agg ≡ ordered collect+transform+concat; both
    // regex engines count non-overlapping greedy matches left-to-right
    "e25_pattern_match" -> """
      WITH s AS (
        SELECT user_id,
          string_agg(
            CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
              WHEN 'purchase' THEN 'p' ELSE 'x' END,
            '' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id)
      SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels
      FROM s WHERE user_id < 200 ORDER BY user_id""",

    // DuckDB's epoch_us and // floor division mirror Spark's unix_micros
    // and div; both running sums use explicit ROWS UNBOUNDED PRECEDING
    "e24_sessionize" -> """
      WITH g AS (
        SELECT user_id, ts, event_id,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      f AS (
        SELECT user_id, ts, event_id,
          CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
               THEN 1 ELSE 0 END AS new_sess
        FROM g),
      n AS (
        SELECT user_id, ts,
          SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM f),
      sess AS (
        SELECT user_id, sess_no, COUNT(*) AS n_events,
          min(ts) AS st, max(ts) AS en
        FROM n GROUP BY user_id, sess_no)
      SELECT CAST(n_events AS BIGINT) AS n_events,
        CAST(COUNT(*) AS BIGINT) AS n_sessions,
        CAST(SUM((epoch_us(en) - epoch_us(st)) // 1000000) AS BIGINT)
          AS total_duration_s
      FROM sess GROUP BY n_events ORDER BY n_events""",

    "e22_rolling_dau" -> """
      WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      days AS (SELECT DISTINCT day FROM du),
      contrib AS (
        SELECT du.user_id, du.day + CAST(o.off AS INTEGER) AS day
        FROM du CROSS JOIN (SELECT range AS off FROM range(0, 7)) o),
      wau AS (
        SELECT c.day, COUNT(DISTINCT c.user_id) AS wau7
        FROM contrib c
        WHERE c.day IN (SELECT day FROM days)
        GROUP BY c.day),
      dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day)
      SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, wau.wau7
      FROM dau JOIN wau ON wau.day = dau.day
      ORDER BY dau.day""",

    "e15_carry_forward" -> """
      SELECT event_id, user_id, event_type, purchase_val,
        lag(purchase_val IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase,
        last_value(purchase_val IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM (SELECT event_id, user_id, ts, event_type,
              CASE WHEN event_type = 'purchase' THEN value END AS purchase_val
            FROM events WHERE user_id < 20)
      ORDER BY user_id, event_id""",

    "e16_range_frame" -> """
      SELECT event_id, user_id,
        CAST(SUM(1) OVER w AS BIGINT) AS n_24h,
        CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
          / CAST(100.0 AS DOUBLE) AS val_24h
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",

    // the two delta batches recomputed directly from the id slices: the
    // accumulator must hold batch-1 counts (ids <= 1000) and batch-2
    // counts (1000 < ids <= 2000) — nothing else, nothing twice
    "e13_poll_trigger" -> """
      WITH b1 AS (
        SELECT event_type, COUNT(*) AS n FROM events
        WHERE event_id <= 1000 GROUP BY event_type),
      b2 AS (
        SELECT event_type, COUNT(*) AS n FROM events
        WHERE event_id > 1000 AND event_id <= 2000 GROUP BY event_type),
      acc AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      SELECT event_type, COUNT(*) AS n_batches,
        CAST(SUM(n) AS BIGINT) AS n_events,
        CAST(MIN(n) AS BIGINT) AS min_batch, CAST(MAX(n) AS BIGINT) AS max_batch
      FROM acc GROUP BY event_type ORDER BY event_type""",

    // replies re-derived turn by turn: batch-0 answers are the plain
    // stub; batch-1 prompts stitch the session's batch-0 turns (user
    // message + assistant answer) before the new message — the empty
    // middle poll contributes nothing, so exactly 4 rows in 2 batches
    "e33_chatbot_channel" -> """
      WITH b0 AS (
        SELECT CAST(1 AS BIGINT) AS message_id, 's1' AS session,
               'hello there spark' AS prompt
        UNION ALL
        SELECT CAST(2 AS BIGINT), 's2', 'what is a join'),
      r0 AS (
        SELECT message_id, session, CAST(0 AS BIGINT) AS batch, prompt,
          'LLM[' || substr(md5(prompt), 1, 8) || ']: ' || upper(substr(prompt, 1, 24)) AS answer
        FROM b0),
      b1 AS (
        SELECT CAST(3 AS BIGINT) AS message_id, 's1' AS session,
          (SELECT prompt || ' | ' || answer FROM r0 WHERE session = 's1')
            || ' || tell me more' AS prompt
        UNION ALL
        SELECT CAST(4 AS BIGINT), 's2',
          (SELECT prompt || ' | ' || answer FROM r0 WHERE session = 's2')
            || ' || and a shuffle too'),
      r1 AS (
        SELECT message_id, session, CAST(1 AS BIGINT) AS batch,
          'LLM[' || substr(md5(prompt), 1, 8) || ']: ' || upper(substr(prompt, 1, 24)) AS answer
        FROM b1)
      SELECT message_id, session, batch, answer FROM r0
      UNION ALL SELECT message_id, session, batch, answer FROM r1
      ORDER BY message_id""",

    // same shared-condition carry-forward: last_camp/last_ts both ignore
    // rows where camp IS NULL, so they always come from the same touch
    "e34_attribution" -> s"""
      WITH ev AS (
        SELECT event_id, ts, user_id, event_type, value,
          CASE WHEN event_type IN ('click', 'view')
               THEN CAST(json_extract_string(props, '$$.k') AS BIGINT) END AS camp
        FROM events),
      w AS (
        SELECT *,
          last_value(camp IGNORE NULLS) OVER uw AS last_camp,
          last_value(CASE WHEN camp IS NOT NULL THEN ts END IGNORE NULLS)
            OVER uw AS last_ts,
          first_value(camp IGNORE NULLS) OVER uw AS first_camp
        FROM ev
        WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      conv AS (
        SELECT last_camp, first_camp, value,
          ts <= last_ts + INTERVAL 7 DAY AS in_window
        FROM w WHERE event_type = 'purchase' AND last_camp IS NOT NULL),
      by_last AS (
        SELECT last_camp AS campaign, CAST(COUNT(*) AS BIGINT) AS conv_last,
          ${oSum("value")} AS rev_last
        FROM conv WHERE in_window GROUP BY 1),
      by_first AS (
        SELECT first_camp AS campaign, CAST(COUNT(*) AS BIGINT) AS conv_first
        FROM conv GROUP BY 1)
      SELECT campaign,
        COALESCE(conv_last, 0) AS conv_last,
        COALESCE(rev_last, 0.0) AS rev_last,
        COALESCE(conv_first, 0) AS conv_first
      FROM by_last FULL OUTER JOIN by_first USING (campaign)
      ORDER BY campaign""",

    "e12_last_sql" -> """
      SELECT event_type, COUNT(*) AS n_new,
        CAST(MIN(ts) AS TIMESTAMP) AS first_new
      FROM events
      WHERE ts > (SELECT MAX(ts) FROM events
                  WHERE ts < TIMESTAMP '2024-01-16 00:00:00')
      GROUP BY event_type ORDER BY event_type""",

    "e37_campaign_assists" -> s"""
      WITH ev AS (
        SELECT event_id, ts, user_id, event_type,
          CASE WHEN event_type IN ('click', 'view')
               THEN CAST(json_extract_string(props, '$$.k') AS BIGINT) END AS camp
        FROM events),
      w AS (
        SELECT *,
          last_value(camp IGNORE NULLS) OVER uw AS last_camp,
          first_value(camp IGNORE NULLS) OVER uw AS first_camp
        FROM ev
        WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      conv AS (SELECT last_camp, first_camp FROM w
        WHERE event_type = 'purchase' AND last_camp IS NOT NULL)
      SELECT campaign,
        CAST(SUM(CASE WHEN kind = 'close' THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
        CAST(SUM(CASE WHEN kind = 'assist' THEN 1 ELSE 0 END) AS BIGINT) AS n_assisted
      FROM (
        SELECT 'close' AS kind, last_camp AS campaign FROM conv
        UNION ALL
        SELECT 'assist', first_camp FROM conv WHERE first_camp <> last_camp)
      GROUP BY campaign ORDER BY campaign""",

    // integer-microsecond lag arithmetic on both sides — epoch_us diff,
    // floor-divided by a day of microseconds, exact at every boundary
    "e36_conversion_lag" -> s"""
      WITH ev AS (
        SELECT event_id, ts, user_id, event_type, value,
          CASE WHEN event_type IN ('click', 'view')
               THEN CAST(json_extract_string(props, '$$.k') AS BIGINT) END AS camp
        FROM events),
      w AS (
        SELECT *,
          last_value(CASE WHEN camp IS NOT NULL THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ts
        FROM ev)
      SELECT CAST(FLOOR((epoch_us(ts) - epoch_us(last_ts)) / 86400000000) AS BIGINT)
          AS lag_days,
        CAST(COUNT(*) AS BIGINT) AS n_conversions,
        ${oSum("value")} AS revenue
      FROM w WHERE event_type = 'purchase' AND last_ts IS NOT NULL
      GROUP BY 1 ORDER BY 1""",

    // run 1 = (default, Jan 20); run 2 = past run 1's max ts, which is
    // the last event before Jan 20 — i.e. everything from Jan 20 on
    "e35_last_coalesce_sql" -> """
      SELECT CAST(1 AS INTEGER) AS run, event_type,
        CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(ts) AS TIMESTAMP) AS first_ts
      FROM events
      WHERE ts > TIMESTAMP '2024-01-16 00:00:00'
        AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY event_type
      UNION ALL
      SELECT CAST(2 AS INTEGER), event_type,
        CAST(COUNT(*) AS BIGINT), CAST(MIN(ts) AS TIMESTAMP)
      FROM events
      WHERE ts > (SELECT MAX(ts) FROM events
                  WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
      GROUP BY event_type
      ORDER BY run, event_type""",

    "e11_stream_join" -> """
      WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'),
      p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase')
      SELECT c.click_id, c.user_id, p.purchase_id,
        CAST(c.click_ts AS TIMESTAMP) AS click_ts,
        CAST(p.purchase_ts AS TIMESTAMP) AS purchase_ts
      FROM c JOIN p ON c.user_id = p.user_id
        AND p.purchase_ts BETWEEN c.click_ts AND c.click_ts + INTERVAL 1 HOUR
      ORDER BY c.click_id, p.purchase_id""",

    "e01_tumbling_daily" -> s"""
      SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n,
        ${oSum("value")} AS total_value, COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "e02_sessionize" -> s"""
      WITH gapped AS (
        SELECT user_id, event_id, ts, value,
          LAG(ts) OVER w AS prev_ts,
          CASE WHEN LAG(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, event_id, ts, value,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM gapped)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        CAST(MIN(ts) AS TIMESTAMP) AS sess_start, CAST(MAX(ts) AS TIMESTAMP) AS sess_end, ${oSum("value")} AS sess_value
      FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",

    "e08_asof_join" -> """
      WITH p AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, event_id AS click_id, ts AS click_ts FROM events WHERE event_type = 'click'),
      j AS (
        SELECT p.event_id, p.ts, p.user_id, p.value, c.click_id, c.click_ts,
          ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
        FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.click_ts <= p.ts)
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value,
        click_id, CAST(click_ts AS TIMESTAMP) AS click_ts
      FROM j WHERE rn = 1 ORDER BY event_id""",

    "e10_asof_sql" -> """
      WITH p AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, event_id AS click_id, ts AS click_ts FROM events WHERE event_type = 'click')
      SELECT p.event_id, CAST(p.ts AS TIMESTAMP) AS ts, p.user_id, p.value,
        c.click_id, CAST(c.click_ts AS TIMESTAMP) AS click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY p.event_id""",

    "e09_range_join" -> s"""
      WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS cts, value AS cval FROM events WHERE event_type = 'click')
      SELECT p.event_id, CAST(p.ts AS TIMESTAMP) AS ts, p.user_id,
        COUNT(c.cts) AS n_clicks_1h,
        COALESCE(${oSum("c.cval")}, 0) AS click_value_1h
      FROM p LEFT JOIN c
        ON p.user_id = c.user_id AND c.cts <= p.ts AND c.cts >= p.ts - INTERVAL 1 HOUR
      GROUP BY 1, 2, 3 ORDER BY event_id""",

    "e03_last_watermark" -> """
      SELECT event_type, COUNT(*) AS n_new, CAST(MIN(ts) AS TIMESTAMP) AS first_new, CAST(MAX(ts) AS TIMESTAMP) AS last_new
      FROM events
      WHERE ts > (SELECT MAX(ts) FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00')
      GROUP BY event_type ORDER BY event_type""",

    "e04_user_funnel" -> """
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INTEGER) AS converted
      FROM events GROUP BY user_id ORDER BY user_id""",

    "e06_sliding_window" -> s"""
      SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) - INTERVAL (k) DAY AS window_start,
        COUNT(*) AS n, ${oSum("value")} AS total_value
      FROM events, UNNEST(generate_series(0, 2)) AS t(k)
      GROUP BY 1 ORDER BY window_start""",

    "e07_event_dedup" -> """
      WITH replayed AS (
        SELECT * FROM events
        UNION ALL SELECT * FROM events WHERE event_id % 5 = 0)
      SELECT event_id, COUNT(*) AS n_seen, CAST(MIN(ts) AS TIMESTAMP) AS ts
      FROM replayed GROUP BY event_id ORDER BY event_id""",

    "e18_retention_cohort" -> """
      WITH first_day AS (
        SELECT user_id, MIN(DATE_TRUNC('day', ts)) AS cohort_day
        FROM events GROUP BY user_id),
      active AS (
        SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day FROM events)
      SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
        CAST(DATEDIFF('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
        COUNT(DISTINCT a.user_id) AS n_users
      FROM active a JOIN first_day f USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_day, day_offset""",

    "e20_funnel_strict" -> """
      WITH s1 AS (
        SELECT user_id, ts, event_type,
          MIN(CASE WHEN event_type = 'view' THEN ts END)
            OVER (PARTITION BY user_id) AS fv
        FROM events),
      s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > fv THEN ts END)
          OVER (PARTITION BY user_id) AS fc
        FROM s1),
      s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > fc THEN ts END)
          OVER (PARTITION BY user_id) AS fp
        FROM s2),
      pu AS (
        SELECT user_id, MIN(fv) AS v, MIN(fc) AS c, MIN(fp) AS p
        FROM s3 GROUP BY user_id)
      SELECT CAST(DATE_TRUNC('day', v) AS TIMESTAMP) AS cohort_day,
        COUNT(*) AS n_view,
        CAST(SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
      FROM pu WHERE v IS NOT NULL
      GROUP BY 1 ORDER BY cohort_day""",

    "e21_rfm_segments" -> s"""
      WITH per_user AS (
        SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS freq,
          ${oSum("value")} AS monetary
        FROM events GROUP BY user_id),
      anch AS (SELECT MAX(last_ts) AS anchor FROM per_user),
      metrics AS (
        SELECT user_id, freq, monetary,
          (epoch_us(anchor) - epoch_us(last_ts)) // 86400000000 AS recency
        FROM per_user, anch),
      bounds AS (
        SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rb,
          quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
          quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb
        FROM metrics),
      scored AS (
        SELECT user_id, monetary,
          6 - (1 + (CASE WHEN CAST(recency AS DOUBLE) > rb[1] THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(recency AS DOUBLE) > rb[2] THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(recency AS DOUBLE) > rb[3] THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(recency AS DOUBLE) > rb[4] THEN 1 ELSE 0 END)) AS r,
          1 + (CASE WHEN CAST(freq AS DOUBLE) > fb[1] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(freq AS DOUBLE) > fb[2] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(freq AS DOUBLE) > fb[3] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(freq AS DOUBLE) > fb[4] THEN 1 ELSE 0 END) AS f,
          1 + (CASE WHEN monetary > mb[1] THEN 1 ELSE 0 END)
            + (CASE WHEN monetary > mb[2] THEN 1 ELSE 0 END)
            + (CASE WHEN monetary > mb[3] THEN 1 ELSE 0 END)
            + (CASE WHEN monetary > mb[4] THEN 1 ELSE 0 END) AS m
        FROM metrics, bounds)
      SELECT r, f, m, COUNT(*) AS n_users,
        CAST(SUM(CAST(monetary AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM scored GROUP BY r, f, m ORDER BY r, f, m""",

    "e19_event_transitions" -> """
      WITH pairs AS (
        SELECT event_type AS from_type,
          LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events),
      cells AS (
        SELECT from_type, to_type, COUNT(*) AS n FROM pairs
        WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      SELECT from_type, to_type, n,
        ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
      FROM cells ORDER BY from_type, to_type""",

    "e05_hourly_active" -> """
      WITH hourly AS (
        SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      ranked AS (
        SELECT hr, event_type, n,
          ROW_NUMBER() OVER (PARTITION BY hr ORDER BY n DESC, event_type) AS rnk
        FROM hourly)
      SELECT hr, event_type AS top_type, n AS top_n FROM ranked
      WHERE rnk = 1 ORDER BY hr"""
  )
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Golden plan-shape tests — the Catalyst analog of the reference's
  * planner golden tests (tests/unit/planner/: expected step lists; here,
  * expected physical-plan properties). These catch silent regressions
  * the value oracle can't see: a filter that stops reaching the scan, a
  * broadcast that degrades to shuffle, a projection that stops pruning.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("planshape-spec")
  val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("q02 filter + projection reach the parquet scan") {
    val plan = executedPlan("q02_filter_topn")
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
    assert(plan.contains("GreaterThan") || plan.contains("IsNotNull"),
      "expected predicate in PushedFilters")
    // pruned read: the scan schema must not include every lineitem column
    assert(!plan.contains("l_comment"), "projection not pruned")
  }

  test("q05 small dimension joins broadcast, not shuffle") {
    val plan = executedPlan("q05_broadcast_dim")
    assert(plan.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$plan")
  }

  test("q01 aggregates split partial/final (map-side combine)") {
    val plan = executedPlan("q01_pricing_summary")
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("s11 pgvector operators stay a scan -> project -> top-k plan") {
    val plan = executedPlan("s11_pgvector_ops")
    assert(plan.contains("TakeOrderedAndProject"),
      s"operator rewrite must not lose the top-k shape:\n$plan")
    // all three rewritten distances are native codegen'd expressions
    assert(plan.contains("l2distance") || plan.contains("L2Distance"),
      s"<-> did not lower to the native expression:\n$plan")
    assert(!plan.contains("Window"), "no window in a top-k distance scan")
  }

  test("s12 PQ: codebook and ADC LUT broadcast; candidate ranking is TakeOrdered") {
    val df = SparkEntry.queries("s12_pq_topk")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the per-query lookup table must reach candidates as a broadcast —
    // a shuffled LUT join would serialize the whole point of ADC
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"PQ LUT/codebook must broadcast:\n${plan.take(4000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must be TakeOrdered, not a global sort/window over the corpus:\n${plan.take(4000)}")
  }

  test("m31 is a single pass: no persist, no InMemoryRelation") {
    val df = SparkEntry.queries("m31_theilsen_trend")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"),
      s"m31 must not rely on cached intermediate state:\n$plan")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty ||
      !plan.contains("InMemoryRelation"),
      "the r10 persist leak must stay fixed")
  }

  test("k07 evaluate reads the shared chunk store (checkpointed RDD scan)") {
    val df = SparkEntry.queries("k07_kb_evaluate")(spark, dir)
    df.collect()
    val logical = df.queryExecution.analyzed.toString
    // the shared store serves as a materialized LogicalRDD, so the
    // chunk+embed pipeline is absent from every consumer's plan
    assert(logical.contains("LogicalRDD") || logical.contains("ExistingRDD"),
      s"k07 is re-deriving the chunk store instead of sharing it:\n${logical.take(2000)}")
  }

  test("k02 semantic search is scan -> project -> top-k (no shuffle before TakeOrdered)") {
    val plan = executedPlan("k02_kb_semantic_search")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not a TakeOrdered:\n$plan")
  }

  test("m01 model apply joins back without a wide shuffle of the payload") {
    val plan = executedPlan("m01_model_join")
    // row-id join over co-partitioned mapPartitions output: no
    // BroadcastNestedLoop / Cartesian anywhere
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"degenerate join in model apply:\n$plan")
  }

  test("s04 signature stage has no exchange before banding") {
    val df = SparkEntry.queries("s04_ann_lsh")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    // the old shape had Aggregate(vec_id) over a plane crossJoin before
    // the band join — both must be gone
    assert(!plan.toLowerCase.contains("aggregate [vec_id"),
      s"full-vector reshuffle is back:\n$plan")
  }

  test("f04 same-catalog dim join evaluates source-side, not in Spark") {
    graft.federation.MemTables.pushedJoins.clear()
    val df = SparkEntry.queries("f04_whole_join_pushdown")(spark, dir)
    df.collect()
    assert(graft.federation.MemTables.pushedJoins.exists {
      case (l, r) => Set(l, r) == Set("priority_weight", "status_label")
    }, "join was not pushed to the mem source")
    val plan = df.queryExecution.optimizedPlan.toString
    // exactly ONE join survives: orders against the pushed statement's
    // lazy scan; the dim-dim join is gone
    assert(plan.sliding(5).count(_ == "Join ") === 1, s"dim join not pushed:\n$plan")
    // the pushed query is a SCAN node (lazy, executor-partitioned), not
    // a driver-side LocalRelation literal
    assert(plan.contains("RenderedSqlScan"), s"no rendered-sql scan:\n$plan")
    assert(!plan.contains("LocalRelation"), s"driver-side literal result:\n$plan")
  }

  test("f10 three-way single-catalog tree (incl. LEFT) pushes whole; zero dim joins survive") {
    graft.federation.MemTables.pushedJoins.clear()
    graft.federation.MemTables.renderedSql.clear()
    val df = SparkEntry.queries("f10_multiway_pushdown")(spark, dir)
    df.collect()
    val plan = df.queryExecution.optimizedPlan.toString
    // the dims tree had TWO joins (weight⋈label⟕note); both must be gone —
    // only orders × the pushed statement's scan remains
    assert(plan.sliding(5).count(_ == "Join ") === 1,
      s"multi-way dim tree not pushed whole:\n$plan")
    assert(plan.contains("RenderedSqlScan"), s"no source-side scan:\n$plan")
    assert(!plan.contains("LocalRelation"), s"driver-side literal result:\n$plan")
    assert(graft.federation.MemTables.pushedJoins.exists {
      case (l, r) => Set(l, r) == Set("status_label", "priority_note")
    }, "outer edge of the flattened tree was not recorded")
    // and the wire format was ONE rendered statement covering all 3 tables
    val sql = graft.federation.MemTables.renderedSql.toSeq
    assert(sql.exists(s => s.contains("priority_weight") && s.contains("status_label") &&
      s.contains("priority_note")), s"no single-statement render recorded: $sql")
  }

  test("f14 DISTINCT over pushed join: the dedup happens in the source, not Spark") {
    val df = SparkEntry.queries("f14_distinct_over_pushed_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"distinct/join survived in Spark:\n$plan")
  }

  test("s09 hard negatives: query side broadcasts, corpus never sort-merges") {
    val plan = executedPlan("s09_hard_negatives")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query side did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"corpus side shuffled for a tiny query set:\n$plan")
  }

  test("t29 mixture manifest: one corpus rollup with map-side combine; normalizers broadcast") {
    val plan = executedPlan("t29_mixture_manifest")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"per-source rollup not map-side combinable:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dimension-sized normalizer join degraded to a shuffle join:\n$plan")
  }

  test("e08 as-of join is carry-forward, not a range join: one window, zero join nodes") {
    val plan = executedPlan("e08_asof_join")
    assert(!plan.contains("Join"), s"as-of should not plan any join node:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      "expected the carry-forward window")
  }

  test("e09 range join runs as equi-join on (key, bucket) — no nested loop") {
    val plan = executedPlan("e09_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degraded to nested loop:\n$plan")
  }

  test("d06 decontamination: benchmark side broadcasts into a semi join") {
    val plan = executedPlan("d06_decontaminate")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark semi join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus grams should never shuffle for the join:\n$plan")
  }

  test("t12 perplexity: the bigram LM broadcasts into the scoring join") {
    val plan = executedPlan("t12_ngram_perplexity")
    assert(plan.contains("BroadcastHashJoin"), s"LM join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side scoring should never sort-merge:\n$plan")
  }

  test("d07 span dedup: first-occurrence is a partial aggregate, never a Window over h") {
    val plan = executedPlan("d07_span_dedup")
    // a row_number window over span hashes funnels every occurrence of a
    // hot span into one unsplittable task; min(struct) partial-aggregates
    // map-side and the join-back is AQE-skew-splittable
    assert(!plan.contains("Window"), s"hot-key window over span hash is back:\n$plan")
    assert(plan.contains("partial_"), s"first-occurrence must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"span dedup must stay equi-keyed:\n$plan")
  }

  test("e34 attribution: all three carry-forward windows share ONE user-timeline exchange") {
    val plan = executedPlan("e34_attribution")
    // last_camp/last_ts/first_camp use the same partition+order, so
    // Catalyst must plan a single Window over a single hashpartitioning
    // exchange of the timeline — N windows over N exchanges would scan
    // the event corpus repeatedly at 100 TB
    assert(plan.contains("Window"), s"no window in attribution plan:\n$plan")
    val exchanges = plan.split("\n").count(_.contains("hashpartitioning(user_id"))
    assert(exchanges == 1,
      s"expected ONE user_id exchange for the timeline, found $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in attribution:\n$plan")
  }

  test("d18 incremental dedup: the delta's bands broadcast; the corpus index never shuffles to it") {
    val plan = executedPlan("d18_incremental_dedup")
    // production ingest shape: the day's batch (GBs) broadcasts against
    // the in-place corpus band index (100 TB side) — a sort-merge here
    // would reshuffle the whole corpus per ingest batch
    assert(plan.contains("BroadcastHashJoin"), s"delta not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus band index must not shuffle against the delta:\n$plan")
  }

  test("d27 semdedup scale tier: only sub-linear frames broadcast; centroid join shuffles") {
    // AQE + auto-broadcast off so the static plan shows exactly the
    // broadcasts the QUERY asks for (hints), not what the test-SF data
    // size happens to permit — that is the 100 TB shape under test
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("d27_semdedup_scaled")(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val bcasts = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b }
      assert(bcasts.nonEmpty, s"coarse codebook should broadcast:\n$plan")
      // every broadcast subtree must be built from the sub-linear √k
      // coarse frame (scan with the vec_id < kc pushed filter; the coA
      // variant also folds in the max(cd) radius rollup) — a broadcast
      // of the full corpus or of the k-centroid table (both linear in n
      // at fixed cell size) is the scale bug this test pins down
      bcasts.foreach { b =>
        val sub = b.toString
        assert(sub.contains("LessThan(vec_id") || sub.contains("max(cd"),
          s"a linear-size frame is broadcast:\n$sub")
      }
      // the shortlist -> centroid join on the coarse-cell key must be a
      // shuffle join (repartition-based; both sides grow with the corpus)
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledJoin => j }
      assert(smj.exists(_.leftKeys.exists(_.toString.contains("co_id"))),
        s"centroid assignment join must shuffle on co_id, not broadcast:\n$plan")
      // the r15 defect under test: the kc-EXPANDED frame (rows carrying
      // a coarse cell per corpus vector — recognizable by cov/qd/rad
      // attributes in flight) must never hit an Exchange. Linear
      // shuffles are allowed: the ub reduction exchanges n aggregated
      // 16-byte rows and the ub rejoin repartitions the corpus once —
      // neither carries expansion columns. Walk every streamed-side
      // shuffle below the co_id join and assert none ships the
      // expansion.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
      def streamedShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
        case _: BroadcastExchangeExec => Nil
        case s: ShuffleExchangeExec => Seq(s) ++ s.children.flatMap(streamedShuffles)
        case other => other.children.flatMap(streamedShuffles)
      }
      // only the shortlist⋈centIdx join (its output carries vec_id) —
      // the kc×kc coarse⋈radius rollup inside the broadcast branch also
      // shuffles on co_id, legitimately (sub-linear frame)
      val coJoins = smj.filter(j => j.leftKeys.exists(_.toString.contains("co_id")) &&
        j.output.exists(_.name == "vec_id"))
      assert(coJoins.nonEmpty, s"co_id shortlist join missing:\n$plan")
      coJoins.foreach { j =>
        val offenders = j.children.flatMap {
          case ex: ShuffleExchangeExec => streamedShuffles(ex.child)
          case other => streamedShuffles(other)
        }.filter(ex => ex.output.exists(a =>
          a.name == "cov" || a.name == "qd" || a.name == "rad" || a.name == "qdr"))
        assert(offenders.isEmpty,
          s"the kc-expanded frame hit an Exchange below the shortlist join:\n${offenders.mkString("\n")}")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("f17 remote stats: ANALYZEd JDBC table flips the join to broadcast-build") {
    import org.apache.spark.sql.functions.{col, count, lit}
    import org.apache.spark.sql.execution.datasources.v2.jdbc.GraftJdbcStats
    val db = graft.federation.JdbcDb.seedFromParquet(spark, dir, "supplier")
    graft.federation.JdbcDb.ensureCatalog(spark, db)
    GraftJdbcStats.clear()
    // static-plan decision under test (AQE would also fix it at runtime,
    // but only AFTER materializing the shuffle — the point of remote
    // stats is to never shuffle the fact side in the first place);
    // threshold sized between the remote dim's true size and the
    // parquet fact's file size
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    try {
      def joinPlan: String = {
        val li = graft.engine.Tables.table(spark, dir, "lineitem")
        li.join(spark.table("rdb.APP.SUPPLIER"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
          .queryExecution.executedPlan.toString
      }
      // un-ANALYZEd: the remote scan reports defaultSizeInBytes
      // ("infinite") — the fact table must shuffle
      assert(joinPlan.contains("SortMergeJoin"),
        s"remote join without stats should sort-merge:\n$joinPlan")
      // one pushed COUNT records the remote cardinality...
      val n = GraftJdbcStats.analyze(spark.table("rdb.APP.SUPPLIER"))
      assert(n.exists(_ > 0), s"analyze found no JDBC relation: $n")
      // ...and the same join now builds a broadcast from the remote dim
      val after = joinPlan
      assert(after.contains("BroadcastHashJoin") && after.contains("BuildRight"),
        s"ANALYZEd remote dim should be the broadcast build side:\n$after")
      // write-back staleness (the warehouse analyze→grow→no-broadcast
      // guarantee, mirrored for remote tables): growing the remote table
      // drops its recorded stats, so the join stops planning on the
      // pre-write COUNT and falls back to the conservative sort-merge.
      // Negative keys so the seeded table restores exactly afterwards
      // (the Derby db is shared across suites in this JVM).
      graft.federation.JdbcDb.insert(
        spark.table("rdb.APP.SUPPLIER").limit(5)
          .withColumn("s_suppkey", -col("s_suppkey") - 1), db, "SUPPLIER")
      try {
        val grown = joinPlan
        assert(grown.contains("SortMergeJoin"),
          s"stale remote stats must not survive a write-back:\n$grown")
      } finally graft.federation.JdbcDb.executeUpdate(db,
        "DELETE FROM SUPPLIER WHERE \"s_suppkey\" < 0")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      GraftJdbcStats.clear()
    }
  }

  test("g06 doulion: sampling filters the edge list before any join; equi-joins only") {
    val plan = executedPlan("g06_triangle_doulion")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in sampled triangle count:\n$plan")
    // the md5 sample must prune edges at the SOURCE of the wedge
    // pipeline — degrees, orientation, and wedges all run on the sample
    assert(plan.contains("pmod") || plan.contains("% 2") || plan.contains("conv("),
      s"edge-sampling filter missing from the plan:\n$plan")
  }

  test("d22 entity resolution: deletion-neighborhood blocking is an equi-join, never name x name") {
    val plan = executedPlan("d22_entity_resolution")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"fuzzy linkage went quadratic:\n$plan")
    assert(plan.contains("Join"), s"no join in linkage plan:\n$plan")
  }

  test("s06 quantized knn: scale scalar broadcasts, ranking is TakeOrdered") {
    val plan = executedPlan("s06_quantized_knn")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing corpus-sized may shuffle for the scale/query join:\n$plan")
  }

  test("m12 drift PSI: one aggregation pass with map-side combine") {
    val plan = executedPlan("m12_drift_psi")
    assert(plan.contains("partial_"), s"bin counts must partial-aggregate:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"totals must broadcast, not shuffle:\n$plan")
  }

  test("t09 repetition stats: narrow scan, no exchange before the output sort") {
    val df = SparkEntry.queries("t09_repetition_stats")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
    // per-row higher-order functions only: the single exchange allowed is
    // the rangepartitioning for the final ORDER BY
    assert(!plan.contains("Exchange hashpartitioning"),
      s"repetition stats must not shuffle by any key:\n$plan")
  }

  test("t14 segment dedup: segment counts partial-aggregate; joins stay equi-keyed") {
    val plan = executedPlan("t14_segment_dedup")
    assert(plan.contains("partial_"), s"segment counts must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"segment dedup must stay hash-keyed:\n$plan")
  }

  test("t15 DSIR: the bucket log-ratio table broadcasts into doc scoring") {
    val plan = executedPlan("t15_dsir_weights")
    assert(plan.contains("BroadcastHashJoin"), s"llr join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"nothing corpus-sized may cross:\n$plan")
  }

  test("m13 naive bayes: the model table broadcasts; corpus never sort-merges") {
    val plan = executedPlan("m13_naive_bayes")
    assert(plan.contains("BroadcastHashJoin"), s"likelihood join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side scoring must join map-side:\n$plan")
  }

  test("s07 kmeans: corpus assignment never sort-merges (centroids broadcast)") {
    val plan = executedPlan("s07_kmeans")
    assert(!plan.contains("SortMergeJoin"),
      s"assignment must join against broadcast centroids:\n$plan")
    assert(plan.contains("partial_"),
      s"update step must map-side combine the dim sums:\n$plan")
  }

  test("q41 waiting-supplier: two-level agg, no Expand over the join") {
    val plan = executedPlan("q41_waiting_supplier")
    assert(!plan.contains("Expand"),
      s"count-distinct Expand is back — use the two-level aggregation:\n$plan")
    assert(plan.contains("partial_"), s"per-order counts must map-side combine:\n$plan")
  }

  test("t17 vocab stats: token counts partial-aggregate, top-k is TakeOrdered") {
    val plan = executedPlan("t17_vocab_stats")
    assert(plan.contains("partial_"), s"token counts must map-side combine:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-10 must be TakeOrdered:\n$plan")
  }

  test("w06 bucketed join: sort-merge with ZERO exchange on either side") {
    val plan = executedPlan("w06_bucketed_join")
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    // the only exchange allowed is the post-join aggregation shuffle;
    // neither JOIN INPUT may re-shuffle — bucket layout carries the
    // partitioning. SMJ inputs appear before the join node reads its
    // children, so assert no hashpartitioning on the join keys at all.
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not re-shuffle its inputs:\n$plan")
  }

  test("q45 statistical sums split partial/final; no join at all") {
    val plan = executedPlan("q45_stat_aggs")
    assert(plan.contains("partial_"), s"sufficient sums must map-side combine:\n$plan")
    assert(!plan.contains("Join"), s"stat aggs are one aggregation pass:\n$plan")
  }

  test("m17 seasonal forecast: phase/group stats partial-aggregate, joins stay equi-keyed") {
    val plan = executedPlan("m17_ts_seasonal")
    assert(plan.contains("partial_"), s"phase means must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"seasonal joins must stay group-keyed:\n$plan")
  }

  test("m18 EWMA: the fold stays inside one aggregation, no degenerate join") {
    val plan = executedPlan("m18_ts_ewma")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"EWMA must not cross anything:\n$plan")
  }

  test("d08 HLL sketch: registers partial-aggregate; no join anywhere") {
    val plan = executedPlan("d08_hll_cardinality")
    // the whole point of the sketch at scale: every task folds rows into
    // <= 1024 register cells before any exchange, and the exact-distinct
    // companion rides the same aggregation tree instead of a second scan
    assert(plan.contains("partial_"), s"registers must map-side combine:\n$plan")
    assert(!plan.contains("Join"), s"sketch + truth are one aggregation tree:\n$plan")
  }

  test("t21 weighted sample: pure map + one combinable rollup, no join, no window") {
    val plan = executedPlan("t21_weighted_sample")
    assert(plan.contains("partial_"), s"per-language rollup must map-side combine:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"inclusion is a per-row integer test — nothing may shuffle for it:\n$plan")
  }

  test("d13 bloom decontamination: map-side bloom filter BEFORE a shuffled (not broadcast) confirm join") {
    val plan = executedPlan("d13_bloom_decontaminate")
    // the confirm join models an eval set too big to broadcast
    assert(plan.contains("ShuffledHashJoin"), s"confirm join not shuffled-hash:\n$plan")
    // the bloom probe runs in the scan-side filter, before any exchange:
    // the UDF shows up as a filter condition in the probe stage
    val firstJoin = plan.indexOf("ShuffledHashJoin")
    assert(plan.substring(firstJoin).contains("Filter"), // probe side below the join
      s"no map-side filter under the confirm join:\n$plan")
  }

  test("q51 recursive CTE executes as a native UnionLoop, then a broadcast spine join") {
    val df = SparkEntry.queries("q51_recursive_cte")(spark, dir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("UnionLoop"), s"recursion not a native UnionLoop:\n$opt")
    // the 12-row spine must be the BUILD side, never shuffle the aggregate
    val plan = executedPlan("q51_recursive_cte")
    assert(plan.contains("BroadcastHashJoin"), s"spine join not broadcast:\n$plan")
  }

  test("m23 Holt fold stays inside one aggregation over the context window") {
    val plan = executedPlan("m23_ts_holt")
    assert(plan.contains("partial_"), s"context agg not partial/final:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"degenerate join in holt apply:\n$plan")
  }

  test("g01 pagerank: edge list persisted and reused across supersteps, equi-joins only") {
    val plan = executedPlan("g01_pagerank")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"degenerate join in pagerank superstep:\n$plan")
    // final superstep reads the checkpointed prior ranks, not a 5-deep
    // re-derivation (lineage is cut every iteration)
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      s"superstep did not read checkpointed ranks:\n$plan")
  }

  test("f08 whole aggregate pushes into the DSv2 source") {
    val plan = executedPlan("f08_agg_pushdown")
    assert(plan.contains("PushedAggregation") || !plan.contains("HashAggregate"),
      s"aggregate not pushed into the mem source:\n$plan")
  }

  test("f09 ORDER BY+LIMIT pushes whole into the DSv2 source (no Spark-side sort)") {
    graft.federation.MemTables.pushedTopN.remove("remote_ord_f09")
    val plan = executedPlan("f09_topn_pushdown")
    assert(graft.federation.MemTables.pushedTopN.get("remote_ord_f09").contains(7),
      s"source never saw the top-k pushdown:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject"),
      s"Spark still plans its own global top-k:\n$plan")
  }

  test("g02 triangle counting: equi-joins only, no nested-loop anywhere") {
    val plan = executedPlan("g02_triangle_count")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle join degenerated to a nested loop:\n$plan")
  }

  test("e18 retention cohort: per-user first-day aggregates partially before its exchange") {
    val plan = executedPlan("e18_retention_cohort")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"no partial aggregation before shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in cohort plan:\n$plan")
  }

  test("d15 frequent pairs: basket self-join is an equi-join; counts aggregate partially") {
    val plan = executedPlan("d15_frequent_pairs")
    assert(!plan.contains("CartesianProduct"), s"cartesian in basket join:\n$plan")
    assert(plan.contains("partial_"), s"pair count not map-side combinable:\n$plan")
  }

  test("e22 rolling DAU: explode fan-out feeds a partial aggregate, no global window") {
    val plan = executedPlan("e22_rolling_dau")
    assert(plan.contains("Generate"), s"no explode fan-out:\n$plan")
    assert(plan.contains("partial_"), s"distinct count not partially aggregated:\n$plan")
    assert(!plan.contains("Window"), s"rolling distinct fell back to a window:\n$plan")
  }

  test("g03 k-core peeling: equi-joins only across all rounds") {
    val plan = executedPlan("g03_kcore")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"peeling join degenerated:\n$plan")
  }

  test("i05 histogram: one broadcast bounds pass + combinable bucket counts, no sort before output") {
    val plan = executedPlan("i05_histogram")
    assert(plan.contains("partial_"), s"bucket count not map-side combinable:\n$plan")
    assert(!plan.contains("Window"), s"histogram should not need a window:\n$plan")
  }

  test("k07 evaluate: two-phase sharded windows, never one corpus-wide window per query") {
    val plan = executedPlan("k07_kb_evaluate")
    val windows = plan.sliding("Window".length).count(_ == "Window")
    assert(windows >= 2, s"expected the sharded two-phase window pair:\n$plan")
    assert(plan.contains("pmod") && plan.contains("xxhash64"),
      s"phase-1 window is not sharded — one task would hold the whole corpus per query:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in evaluate:\n$plan")
  }

  test("a03 agent retrieval: sharded two-phase ranking, never one corpus-wide window per question") {
    val plan = executedPlan("a03_agent_rag")
    val windows = plan.sliding("Window".length).count(_ == "Window")
    assert(windows >= 2, s"expected the sharded two-phase window pair:\n$plan")
    assert(plan.contains("pmod") && plan.contains("xxhash64"),
      s"phase-1 window is not sharded — one task would hold the whole corpus per question:\n$plan")
  }

  // the whole s-pack per-query top-k family ranks through the SAME
  // two-phase sharded shape as k07/k17 — a flat
  // Window.partitionBy(q_id) pins one task per query holding the whole
  // corpus(-fraction) score list, the one shape AQE cannot split
  for (q <- Seq("s02_knn_batch", "s04_ann_lsh", "s05_ann_ivf",
      "s09_hard_negatives", "s14_ivf_pq", "s15_pq_stored",
      "s16_ivfpq_trained", "s18_pq16x8_topk"))
    test(s"$q ranks via sharded two-phase top-k, never one corpus window per query") {
      // structural check (plan STRINGS truncate wide projections, which
      // would hide the pmod shard key): the optimized logical plan must
      // hold ≥2 Window operators (the two phases) and a pmod(xxhash64)
      // shard expression feeding phase 1
      val lp = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan
      val windows = lp.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.size >= 2, s"expected the sharded two-phase window pair:\n$lp")
      val hasShard = lp.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Pmod])))
      assert(hasShard,
        s"phase-1 window is not sharded — one task would hold a corpus slice per query:\n$lp")
    }

  test("k17 batch retrieval: two-phase ranked windows, query table broadcasts") {
    val plan = executedPlan("k17_kb_batch_search")
    val windows = plan.sliding("Window".length).count(_ == "Window")
    assert(windows >= 2, s"expected the sharded two-phase window pair:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query table did not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in batch retrieval:\n$plan")
  }

  test("q57 LATERAL top-k decorrelates to a ranked window, no per-row re-scan") {
    val plan = executedPlan("q57_lateral_topk")
    assert(plan.contains("Window"), s"lateral not decorrelated to a window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in lateral plan:\n$plan")
  }

  test("t25 BPE tokenization: corpus word counts aggregate partially; merges apply to the vocab side") {
    val plan = executedPlan("t25_bpe_tokenize")
    assert(plan.contains("partial_"), s"word count not map-side combinable:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in tokenize plan:\n$plan")
  }

  test("s08 embedding stats: one explode into a combinable aggregation, no join") {
    val plan = executedPlan("s08_embedding_stats")
    assert(plan.contains("Generate"), s"no posexplode:\n$plan")
    assert(plan.contains("partial_"), s"component sums not partially aggregated:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  test("q60 top-k per group is a mergeable aggregate: ObjectHashAggregate with partials, zero Window") {
    val plan = executedPlan("q60_topk_per_group")
    assert(plan.contains("ObjectHashAggregate"),
      s"TopKPairs not planned as ObjectHashAggregate:\n$plan")
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into the top-k plan:\n$plan")
  }

  test("e24 sessionize: both windows share ONE user_id exchange (lag + running sum, one sort)") {
    val plan = executedPlan("e24_sessionize")
    val n = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(n == 1, s"expected exactly 1 user_id exchange, saw $n:\n$plan")
  }

  test("g04 item similarity: basket pair join stays equi-keyed, no nested loop") {
    val plan = executedPlan("g04_item_similarity")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"degenerate join in similarity plan:\n$plan")
    assert(plan.contains("partial_"), s"co-occurrence counts not map-side combined:\n$plan")
  }

  test("i06 dq report: all scalar rules ride one lineitem scan + one anti-join") {
    val plan = executedPlan("i06_dq_expectations")
    val scans = "Scan parquet|FileScan parquet".r.findAllIn(plan).length
    assert(scans <= 3, s"expected <=3 scans (lineitem x2 + orders), saw $scans:\n$plan")
    assert(plan.contains("LeftAnti"), s"referential check not an anti-join:\n$plan")
  }

  test("t26 funnel: scalar stages partial-aggregate; dedup stage is agg + semi-join, no window") {
    val plan = executedPlan("t26_filter_funnel")
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into the funnel plan:\n$plan")
    assert(plan.contains("LeftSemi"), s"dedup stage not a semi-join:\n$plan")
  }

  test("m27 STL: combinable seasonal aggregation, joins stay equi-keyed") {
    val plan = executedPlan("m27_stl_decompose")
    assert(plan.contains("partial_"), s"seasonal sums not map-side combined:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"degenerate join in STL plan:\n$plan")
  }

  test("g05 label propagation: equi-joins only; argmax is an aggregate, never a window") {
    val plan = executedPlan("g05_label_propagation")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"degenerate join in LPA plan:\n$plan")
    assert(!plan.contains("Window"), s"window in LPA plan:\n$plan")
  }

  test("d16 source dup rate: first-occurrence is a partial aggregate, join stays equi-keyed") {
    val plan = executedPlan("d16_source_dup_rate")
    assert(plan.contains("partial_"), s"min-per-hash not map-side combined:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"degenerate join in dup-rate plan:\n$plan")
    assert(!plan.contains("Window"), s"window in dup-rate plan:\n$plan")
  }

  test("m30 KS drift: bin counts partial-aggregate; only the 1001-bin CDF window sorts") {
    val plan = executedPlan("m30_ks_drift")
    assert(plan.contains("partial_"), s"bin counts not map-side combined:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in KS plan:\n$plan")
  }

  test("e31 cohort LTV: rollup partial-aggregates; running sum is per-cohort, not global") {
    val plan = executedPlan("e31_cohort_ltv")
    assert(plan.contains("partial_"), s"revenue rollup not map-side combined:\n$plan")
    assert(plan.contains("hashpartitioning(cohort_day"),
      s"LTV window not partitioned by cohort:\n$plan")
  }

  test("ANALYZE feeds CBO: the 3-table star reorders its joins once stats exist") {
    import graft.catalog.{Catalog, Warehouse}
    // fresh Commands = fresh Catalog = no statistics yet
    val c = new graft.sqlx.Commands(spark,
      new Catalog(spark, dir), Warehouse.temp(spark))
    val star = """
      SELECT c_mktsegment, COUNT(*) AS n
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment"""
    // order of leaf relations in the optimized join tree, left to right
    def leafOrder(): Seq[String] = {
      val plan = c.execute(star).queryExecution.optimizedPlan
      import org.apache.spark.sql.execution.datasources.LogicalRelation
      plan.collect { case lr: LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.head.getName.stripSuffix(".parquet")
      }
    }
    val before = leafOrder()
    // without statistics the syntactic order survives: lineitem first
    assert(before.head === "lineitem", s"unexpected pre-stats order: $before")
    // exact stats for all three relations (CostBasedJoinReorder requires
    // rowCount on EVERY join input before it will touch the tree)
    Seq("lineitem", "orders", "customer").foreach(t =>
      c.execute(s"ANALYZE TABLE $t"))
    val after = leafOrder()
    assert(after !== before,
      s"stats did not change the join order: $after")
    // the cost-based order starts from the SMALL end of the star
    // (orders x customer ~ |orders| rows, vs lineitem x orders ~
    // |lineitem| rows), so lineitem must no longer lead the tree
    assert(after.head !== "lineitem",
      s"CBO still joins the fact table first: $after")
    // same values either way — the reorder is plan-only
    val vals = c.execute(star).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vals.values.sum === c.execute("SELECT COUNT(*) AS n FROM lineitem")
      .collect().head.getLong(0))
  }

  test("no main-path query plans a CartesianProduct except deliberate broadcast scalars") {
    val allowed = Set("q23_scalar_subquery", "q33_cross_join", "s01_knn_brute",
      "k02_kb_semantic_search", "k03_kb_meta_threshold", "k04_kb_bool_algebra",
      "k05_kb_hybrid", "k07_kb_evaluate")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allowed)
      .filter { name =>
        val plan = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan.toString
        plan.contains("CartesianProduct")
      }
    assert(offenders.isEmpty, s"unexpected cartesian products in: $offenders")
  }

  // ---- round-16 optimization shapes ---------------------------------

  test("g02 triangles: Bloom pre-filter drops wedges BEFORE the closing join") {
    val plan = executedPlan("g02_triangle_count")
    // the wedge side must carry the mightContainLong probe (a UDF over
    // xxhash64(x, y)) so ~95% of wedges die map-side, not in the join
    assert(plan.contains("UDF(xxhash64("),
      s"bloom pre-filter missing from the wedge side:\n$plan")
  }

  test("d12 CMS: sketch and exact rider share ONE corpus scan (ReusedExchange)") {
    val plan = executedPlan("d12_cms_heavy_hitters")
    assert(plan.contains("ReusedExchange"),
      s"the per-hash count exchange must be computed once and reused:\n$plan")
  }

  test("k05/k12 hybrid search: single-pass least(), zero exchanges") {
    for (name <- Seq("k05_kb_hybrid", "k12_kb_hybrid_sql")) {
      val plan = executedPlan(name)
      assert(!plan.contains("Exchange"),
        s"$name: hybrid blend must not shuffle (both arms score the same row):\n$plan")
      assert(!plan.contains("Window"),
        s"$name: no per-chunk window after the single-pass rewrite:\n$plan")
    }
  }

  test("s12 PQ encoding: argmin is an inline codegen loop, no window, no code exchange") {
    val plan = executedPlan("s12_pq_topk")
    assert(plan.contains("argminroundeddist2cells"),
      s"codes argmin must be the codegen codebook loop:\n$plan")
    assert(!plan.contains("Window"),
      s"no window may rank the PQ codes:\n$plan")
  }

  test("t06 lang-id: per-doc argmax partial-aggregates; text never shuffles") {
    val plan = executedPlan("t06_lang_id")
    assert(plan.contains("partial_min"),
      s"per-doc argmax must partial-aggregate map-side:\n$plan")
  }

  test("e05 hourly top type: min_by aggregate, no per-hour window") {
    val plan = executedPlan("e05_hourly_active")
    assert(plan.contains("min_by") && !plan.contains("Window"),
      s"top-type-per-hour must be a combinable min_by:\n$plan")
  }

  test("d05 semdedup: assignment is inline over the broadcast codebook (no argmax exchange)") {
    val plan = executedPlan("d05_semdedup")
    assert(plan.contains("topcosinecells"),
      s"assignment must be the inline codegen argmax over the codebook array:\n$plan")
    assert(!plan.contains("Window"),
      s"no corpus window may survive in d05:\n$plan")
  }
}

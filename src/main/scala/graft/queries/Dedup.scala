package graft.queries

import graft.engine.Tables
import graft.functions.VectorFunctions.simhash64
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Near-duplicate detection for training-data pipelines: exact n-gram
  * Jaccard (inverted-index join — the oracle-checkable ground truth),
  * MinHash+LSH (the 100 TB path: signature shuffle is O(docs × k), band
  * join touches only colliding buckets), and SimHash (one 64-bit
  * fingerprint per doc via a native Catalyst expression, banded hamming
  * join).
  *
  * Word-trigram shingles: unigrams don't discriminate on small
  * vocabularies (measured: 71k false pairs at τ=0.6 unigram vs 25 true
  * near-dup pairs at τ=0.5 trigram on the test corpus).
  */
object Dedup extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** doc_id + distinct word-trigram shingles (docs with >= 3 tokens). */
  private def shingledOf(docs: DataFrame): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))
        )).as("shingles"))
  }

  private def shingled(s: SparkSession, dir: String): DataFrame =
    shingledOf(t(s, dir, "documents"))

  // MinHash parameters: 32 permutations = 8 bands x 4 rows; universal
  // hashing h_i(x) = (a_i*x + b_i) mod p over xxhash64 shingle hashes.
  private val MinhashK = 32
  private val Bands = 8
  private val RowsPerBand = MinhashK / Bands
  // 31-bit inputs x 31-bit multipliers keep a*x+b < 2^63: no long overflow
  // under ANSI arithmetic (Spark 4 default).
  private val Prime = (1L << 61) - 1
  private val rng = new scala.util.Random(42)
  private val hashA: Array[Long] = Array.fill(MinhashK)(rng.nextInt(Int.MaxValue).toLong | 1L)
  private val hashB: Array[Long] = Array.fill(MinhashK)(rng.nextInt(Int.MaxValue).toLong)

  /** (doc_id, sig, band, bkey) — the standing MinHash band index a corpus
    * maintains for incremental dedup. `sig` rides along so candidate
    * verification needs no join back to the corpus. */
  def bandIndex(docs: DataFrame): DataFrame = {
    val sig = shingledOf(docs).select(col("doc_id"),
      graft.functions.VectorFunctions.minhashSig(
        col("shingles"), hashA.toSeq, hashB.toSeq, Prime, md5Hash = true).as("sig"))
    sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map(b =>
        slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)): _*)).as(Seq("band", "bkey")))
  }

  /** Dedup a new ingest batch against a standing [[bandIndex]]: the
    * batch's bands BROADCAST (a day's crawl is GBs), the corpus index
    * never moves, candidates verify at candidate scale by signature
    * agreement. Returns (new_doc, dup_of, est_jaccard >= 0.5). Also the
    * streaming-ingest shape: call per micro-batch from foreachBatch
    * (StreamingSpec proves batch ≡ stream). */
  def incrementalDedup(corpusBands: DataFrame, newDocs: DataFrame): DataFrame = {
    val delta = bandIndex(newDocs)
    corpusBands.as("c")
      .join(broadcast(delta.as("d")),
        col("c.band") === col("d.band") && col("c.bkey") === col("d.bkey"))
      .select(col("d.doc_id").as("new_doc"), col("c.doc_id").as("dup_of"),
        col("d.sig").as("sig_d"), col("c.sig").as("sig_c"))
      .dropDuplicates("new_doc", "dup_of")
      .select(col("new_doc"), col("dup_of"),
        (size(filter(zip_with(col("sig_d"), col("sig_c"), (a, b) => a === b), x => x))
          .cast(DoubleType) / MinhashK).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- exact trigram jaccard, AllPairs-style prefix filtering --------
    // Naive inverted-index join is quadratic in shingle document
    // frequency; with τ = 0.5, only each doc's (n - ceil(τn) + 1)
    // globally-rarest shingles need indexing (prefix filter: any pair
    // with jac >= τ must share one of them), plus the length filter
    // τ·na <= nb. Candidates then verify by exact intersection. Cuts the
    // candidate join from all-shared-token pairs to rare-token pairs —
    // the published AllPairs/PPJoin bound — and is the plan that holds
    // at 100 TB (df-sorted prefix index is one extra shuffle).
    "d01_jaccard_pairs" -> ((s, dir) => {
      val Tau = 0.5
      // ONE narrow pass computes + caches the per-doc hashed-shingle
      // ARRAY (regexp + trigram pipeline runs once total); sizes come
      // from size(arr) carried through the explode — no per-doc groupBy
      // shuffle and no sizes join. 64-bit hashed shingles make the joins
      // long-keyed instead of string-keyed.
      val tokArr = shingled(s, dir).select(col("doc_id"),
        transform(col("shingles"), t => xxhash64(t)).as("arr")).cache()
      val toks = tokArr.select(col("doc_id"),
        size(col("arr")).cast(LongType).as("n"), explode(col("arr")).as("tok"))
      // document frequency via count-over-window: ONE exchange on tok
      // (the groupBy+join formulation shuffles the exploded set twice);
      // the rank window then re-partitions by doc once. The small prefix
      // index is cached so its self-join doesn't recompute both windows.
      val wTok = Window.partitionBy(col("tok"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
      val prefix = toks
        .withColumn("df", count(lit(1)).over(wTok))
        .withColumn("rk", row_number().over(wDoc))
        .filter(col("rk") <= col("n") - ceil(col("n") * Tau) + 1)
        .select(col("doc_id"), col("tok"), col("n"))
        .cache()
      val cands = prefix.as("a")
        .join(prefix.as("b"), col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * Tau <= col("a.n") && col("a.n") * Tau <= col("b.n"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .dropDuplicates("doc_a", "doc_b")
      // verify: candidates join the cached one-row-per-doc array table
      // twice and intersect in-row — replaces the exploded-token re-join
      // (two wide shuffles of n-tokens-per-doc rows + a count groupBy)
      val inter = cands
        .join(tokArr.select(col("doc_id").as("_ida"), col("arr").as("arr_a")),
          col("doc_a") === col("_ida"))
        .join(tokArr.select(col("doc_id").as("_idb"), col("arr").as("arr_b")),
          col("doc_b") === col("_idb"))
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          size(array_intersect(col("arr_a"), col("arr_b"))).cast(LongType).as("i"))
      inter
        .select(col("doc_a"), col("doc_b"),
          (col("i").cast(DoubleType) / (col("na") + col("nb") - col("i"))).as("jac"))
        .filter(col("jac") >= Tau)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ---- MinHash + LSH banding (scale path; oracle-exact end-to-end)
    "d02_minhash_lsh" -> ((s, dir) => {
      // signature = ONE narrow MinHashSig pass inside the scan stage
      // (replaces explode + 32-way min-agg shuffle); md5 shingle hash so
      // DuckDB reproduces every signature value bit-for-bit
      val sig = shingled(s, dir).select(col("doc_id"),
        graft.functions.VectorFunctions.minhashSig(
          col("shingles"), hashA.toSeq, hashB.toSeq, Prime, md5Hash = true).as("sig"))
      // band key = the raw RowsPerBand-value signature slice (array equi-
      // join): exactly the collision classes the formula defines — no
      // hash-collision noise, and the DuckDB oracle reproduces it 1:1
      val bands = sig.select(col("doc_id"), col("sig"),
        posexplode(array((0 until Bands).map(b =>
          slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)): _*)).as(Seq("band", "bkey")))
      val cands = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
        .dropDuplicates("doc_a", "doc_b")
      cands
        .select(col("doc_a"), col("doc_b"),
          (size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b), x => x))
            .cast(DoubleType) / MinhashK).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ---- SimHash fingerprints + banded hamming join (scale path;
    // md5 token hash → oracle-exact)
    "d03_simhash_pairs" -> ((s, dir) =>
      simhashPairs(t(s, dir, "documents"), maxHamming = 8, md5Hash = true)
        .orderBy(col("doc_a"), col("doc_b"))),

    // ---- simhash near-dup, the SCALE banding tier ---------------------
    // d03's 4×16 banding has a birthday floor: ANY two of n docs share a
    // given 16-bit band with p = 2^-16, so random (non-near) band pairs
    // grow as 4·n²/2^17 — 7.6M at n=500k, all popcount-checked before
    // the hamming filter kills them (measured: 112M band-join rows at
    // factor 100, §BASELINE round-15). Naively widening the bands
    // (2×32) collapses recall: P(one fixed half untouched by 8 spread
    // flips) ≈ 2·2⁻⁸ (measured 11 of 193 oracle pairs). The production
    // geometry is Manku et al. 2007 §3's COMBINATION banding on a wider
    // fingerprint: a 128-bit simhash (md5 bytes 0-7 and 8-15 give two
    // independent 64-bit prints from the one digest), split into eight
    // 16-bit chunks, banded on all C(8,2)=28 ordered chunk PAIRS — each
    // key is 32 bits, so the random floor drops to 28·n²/2^33 (~10⁴×
    // below d03's), while recall at the same relative threshold
    // (16/128 = 8/64) holds: a near-dup pair needs only SOME two of its
    // eight chunks clean, P ≈ 1−(1−(1−δ)^32)^28 ≈ 0.32 at the threshold
    // edge and ≳0.98 for the hamming≲4-equivalent mass real dup
    // clusters sit in. Work per doc is 28 band rows — constant — and
    // the verify stays one popcount pair. Output contract as d03 with
    // hamming on the 128-bit print.
    "d28_simhash_banded_scaled" -> ((s, dir) =>
      combinationBandedPairs(t(s, dir, "documents"))
        .orderBy(col("doc_a"), col("doc_b"))),

    // ---- duplicate GROUPS: connected components over the near-dup pair
    // graph (the canonicalization step after any pairwise dedup — LSH
    // emits pairs, the pipeline needs one keep-doc per transitive
    // cluster). Min-label propagation to fixpoint; the oracle walks the
    // same graph with a recursive CTE.
    "d04_dup_groups" -> ((s, dir) => {
      ccLabels(s, dir).orderBy(col("doc_id"))
    }),

    // dup-cluster size distribution (dedup observability beside d16's
    // per-source rate): how many clusters of each size the near-dup
    // graph contains — the report that catches a degenerate giant
    // cluster (threshold too loose) before a dedup pass eats the
    // corpus. Reuses d04's CC labels; the histogram is two combinable
    // rollups over |clusters| rows, nothing corpus-sized after CC.
    "d17_dup_cluster_sizes" -> ((s, dir) => {
      ccLabels(s, dir)
        .groupBy(col("dup_group")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("n_clusters") * col("cluster_size"))
        .orderBy(col("cluster_size"))
    }),

    // ---- INCREMENTAL dedup: a new ingest batch (doc_id ≡ 0 mod 10
    // plays the day's crawl) dedups against the ALREADY-INDEXED corpus
    // without recomputing corpus² — the production shape for continuous
    // ingestion (the same banded MinHash index d02 builds, queried
    // instead of self-joined). Scale story: the corpus's band index
    // stays partitioned in place; only the DELTA's bands broadcast, so
    // the whole pass is one map-side join over the index + candidate-
    // scale signature verification. At 100 TB the daily batch is GBs —
    // broadcastable — while the corpus never moves.
    "d18_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      incrementalDedup(bandIndex(docs.filter(col("doc_id") % 10 =!= 0)),
        docs.filter(col("doc_id") % 10 === 0))
        .orderBy(col("new_doc"), col("dup_of"))
    }),

    // ---- dedup QUALITY audit: precision/recall of the end-to-end
    // MinHash+LSH detector (d02: banded candidates + signature estimate
    // ≥ τ) against the exact trigram-Jaccard ground truth (d01). The
    // tuning loop every production dedup needs — did shrinking bands/k
    // cost recall? — expressed as ONE full-outer join of the two pair
    // sets and a confusion-count rollup. At 100 TB both inputs are
    // pair-scale (≪ corpus), so the audit costs what the detectors cost.
    "d19_lsh_quality" -> ((s, dir) => {
      val exact = queries("d01_jaccard_pairs")(s, dir)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("in_e"))
      val pred = queries("d02_minhash_lsh")(s, dir)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("in_p"))
      val conf = exact.join(pred, Seq("doc_a", "doc_b"), "full_outer")
        .agg(
          sum(when(col("in_e").isNotNull && col("in_p").isNotNull, 1L)
            .otherwise(0L)).cast(LongType).as("tp"),
          sum(when(col("in_e").isNull, 1L).otherwise(0L)).cast(LongType).as("fp"),
          sum(when(col("in_p").isNull, 1L).otherwise(0L)).cast(LongType).as("fn"))
      conf.select(col("tp"), col("fp"), col("fn"),
        round(col("tp").cast(DoubleType) / (col("tp") + col("fp")), 4).as("prec"),
        round(col("tp").cast(DoubleType) / (col("tp") + col("fn")), 4).as("rec"))
    }),

    // ---- per-group HLL distinct counts through the custom mergeable
    // aggregate (functions/Hll.scala, SQL-registered as hll_estimate):
    // ONE 1 KiB register buffer per group that map-side combines and
    // merges by elementwise max — "distinct users per segment" at 100 TB
    // without d08's |groups|×1024-row bucket shuffle. The exact distinct
    // rides along only to report rel_err (a sketch audit, like d19).
    "d20_hll_groups" -> ((s, dir) => {
      graft.functions.AiFunctions.register(s)
      t(s, dir, "events").createOrReplaceTempView("events_d20")
      t(s, dir, "orders").createOrReplaceTempView("orders_d20")
      s.sql("""
        SELECT grp, n_exact, ROUND(est, 4) AS hll_est,
          ROUND(est / n_exact - 1.0, 4) AS rel_err
        FROM (
          SELECT CONCAT('events.', event_type) AS grp,
            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
            hll_estimate(user_id) AS est
          FROM events_d20 GROUP BY event_type
          UNION ALL
          SELECT CONCAT('orders.', o_orderstatus) AS grp,
            CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
            hll_estimate(o_custkey) AS est
          FROM orders_d20 GROUP BY o_orderstatus)
        ORDER BY grp""")
    }),

    // ---- the SKETCH LIFECYCLE: per-day HLL register arrays materialize
    // to a parquet sketch table (1 KiB binary per (day, type) — KB-scale
    // rows standing in for 100 TB of raw history), then the rollup reads
    // STORED sketches and unions registers. Overlap safety is the point:
    // the same user active on many days/types counts once, because union
    // is elementwise register max, not addition. "Distinct users this
    // quarter" becomes a scan of 90 sketch rows.
    "d21_hll_sketch_rollup" -> ((s, dir) => {
      graft.functions.AiFunctions.register(s)
      t(s, dir, "events").createOrReplaceTempView("events_d21")
      val sketchDir = java.nio.file.Files
        .createTempDirectory("graft_sketches").toString
      s.sql("""
        SELECT date_trunc('DAY', ts) AS day, event_type,
          hll_registers(user_id) AS sketch
        FROM events_d21 GROUP BY 1, 2""")
        .write.mode("overwrite").parquet(sketchDir)
      s.read.parquet(sketchDir).createOrReplaceTempView("sketches_d21")
      s.sql("""
        SELECT event_type, n_sketches, ROUND(est, 4) AS users_est
        FROM (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sketches,
            hll_union_estimate(sketch) AS est
          FROM sketches_d21 GROUP BY event_type
          UNION ALL
          SELECT 'ALL', CAST(COUNT(*) AS BIGINT),
            hll_union_estimate(sketch)
          FROM sketches_d21)
        ORDER BY event_type""")
    }),

    // ---- threshold tuning table: the distribution of estimated Jaccard
    // over ALL banded candidates (no τ filter) — the curve an operator
    // reads to place the dedup threshold (where does candidate mass thin
    // out?). est values are exact multiples of 1/32, so the histogram
    // needs no binning. Candidate-scale input, |distinct estimates| rows.
    "d23_threshold_sweep" -> ((s, dir) => {
      val sig = shingled(s, dir).select(col("doc_id"),
        graft.functions.VectorFunctions.minhashSig(
          col("shingles"), hashA.toSeq, hashB.toSeq, Prime, md5Hash = true).as("sig"))
      val bands = sig.select(col("doc_id"), col("sig"),
        posexplode(array((0 until Bands).map(b =>
          slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)): _*)).as(Seq("band", "bkey")))
      bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.sig").as("sa"), col("y.sig").as("sb"))
        .dropDuplicates("a", "b")
        .select((size(filter(zip_with(col("sa"), col("sb"), (p, q) => p === q), x => x))
          .cast(DoubleType) / MinhashK).as("est_jaccard"))
        .groupBy(col("est_jaccard"))
        .agg(count(lit(1)).as("n_candidate_pairs"))
        .orderBy(col("est_jaccard"))
    }),

    // ---- LSH parameter PLANNER (the design-time companion to d23's
    // measured sweep): for every (bands, rows) factorization of the
    // 32-hash signature, the banding detection probability
    // 1 − (1 − s^r)^b over a similarity grid — the S-curve table an
    // operator reads to pick the banding for a target τ BEFORE paying a
    // corpus pass (Leskovec/Rajaraman/Ullman ch.3). Pure closed form:
    // |factorizations|×|grid| rows, zero data scanned; probabilities
    // computed ONCE in exact BigInt rationals (no float pow — engines
    // disagree in the last ulp of pow) and emitted as literals.
    "d26_lsh_planner" -> ((s, dir) => {
      val rows = lshPlannerRows.map { case (b, r, sTenths, p) =>
        Row(b.toLong, r.toLong, sTenths / 10.0, p) }
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("bands", LongType, nullable = false),
          StructField("rows_per_band", LongType, nullable = false),
          StructField("similarity", DoubleType, nullable = false),
          StructField("p_detect", DoubleType, nullable = false))))
        .orderBy(col("bands"), col("similarity"))
    }),

    // ---- mergeable QUANTILE sketch (log-histogram, the DDSketch idea —
    // Masson et al., VLDB 2019 — in engine-exact integer arithmetic):
    // value → octave (integer log2 via the binary-string length) → 16
    // linear sub-buckets per octave; the sketch is (group, bucket,
    // count) rows. Counts SUM under merge, so the shuffle per group is
    // O(|buckets|) regardless of corpus size — the quantile analog of
    // d08's HLL and d12's CMS, completing the sketch trio every 100 TB
    // pipeline carries. Relative error is bounded by the sub-bucket
    // width (≤ 1/16 per octave). The EXACT per-source quantile runs
    // alongside purely to report the sketch's error — at scale that
    // sort-based branch is the one you drop (same contract as d08).
    "d24_logq_quantiles" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("docs_d24")
      s.sql(logqQuantileSql("docs_d24", sparkQ))
    }),

    // ---- the STORED quantile-sketch lifecycle (the d21 shape for
    // quantiles): sketch each ingest half separately, PERSIST the
    // (group, bucket, count) rows to a parquet sketch table, then roll
    // the stored halves up by summing counts — the merged quantiles must
    // be IDENTICAL to sketching the whole corpus at once (count addition
    // is associative; nothing else in the sketch is data-dependent).
    // This is what lets a 100 TB pipeline keep per-day sketch rows and
    // answer any-window quantiles without touching raw data again.
    "d25_logq_sketch_rollup" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("docs_d25")
      val sketchDir = java.nio.file.Files
        .createTempDirectory("graft_sketches_q").toString
      s.sql(s"""
        WITH vals AS (SELECT source, doc_id % 2 AS half, CAST(n_chars AS BIGINT) AS v
          FROM docs_d25 WHERE n_chars >= 1),
        k AS (SELECT source, half, v, ${sparkPow2("length(bin(v)) - 1")} AS p,
          length(bin(v)) - 1 AS oct FROM vals)
        SELECT source, half, oct * 16 + ((v - p) * 16) DIV p AS bkt,
          COUNT(*) AS cnt
        FROM k GROUP BY source, half, bkt""")
        .write.mode("overwrite").parquet(sketchDir)
      s.read.parquet(sketchDir).createOrReplaceTempView("qsketch_d25")
      s.sql(s"""
        WITH merged AS (SELECT source, bkt, SUM(cnt) AS cnt
          FROM qsketch_d25 GROUP BY source, bkt),
        ${logqFromSketchSql("merged", sparkQ)}
        SELECT source, CAST(n AS BIGINT) AS n_docs, p50, p90, p99,
          CAST(2 AS BIGINT) AS n_parts_merged
        FROM q ORDER BY source""")
    }),

    // ---- entity resolution / fuzzy record linkage, SymSpell-style:
    // a dirty mirror of the customer table (one digit DELETED from each
    // name, position = c_custkey mod 9) links back to the master via
    // DELETION-NEIGHBORHOOD blocking (Garbe's symmetric delete): each
    // master name emits its 9 drop-one-digit variants, the dirty name IS
    // such a variant, so candidate generation is one equi-join on the
    // variant key — never name×name. Levenshtein verifies at candidate
    // scale; best match = (lev, custkey) min with a deterministic
    // tie-break; the report groups by ambiguity (candidate count), the
    // signal a production linkage pipeline monitors. At 100 TB: variants
    // are 9× the master (generated in the scan stage), the join is
    // hash-partitioned on short keys, and nothing quadratic exists.
    "d22_entity_resolution" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      // dirty side: drop the digit at (c_custkey % 9) of the 9-digit tail
      val p = (col("c_custkey") % 9).cast("int") // 0-based digit position
      val dirty = cust.select(col("c_custkey").as("dirty_key"),
        concat(substring(col("c_name"), lit(1), p + 9),
          col("c_name").substr(p + 11, lit(9))).as("dirty_name"))
      // master side: all 9 deletion variants per name
      val variants = cust
        .select(col("c_custkey").as("master_key"), col("c_name"),
          explode(sequence(lit(0), lit(8))).as("i"))
        .select(col("master_key"), col("c_name"),
          concat(substring(col("c_name"), lit(1), col("i") + 9),
            col("c_name").substr(col("i") + 11, lit(9))).as("vkey"))
      val cands = dirty.join(variants, col("dirty_name") === col("vkey"))
        .select(col("dirty_key"), col("dirty_name"), col("master_key"), col("c_name"))
        .dropDuplicates("dirty_key", "master_key")
        .filter(levenshtein(col("dirty_name"), col("c_name")) === 1)
      val best = cands
        .groupBy(col("dirty_key"))
        .agg(count(lit(1)).as("n_candidates"), min(col("master_key")).as("best_match"))
      best
        .groupBy(col("n_candidates"))
        .agg(count(lit(1)).as("n_dirty"),
          sum(when(col("best_match") === col("dirty_key"), 1L).otherwise(0L))
            .as("n_correct"))
        .orderBy(col("n_candidates"))
    }),

    // ---- benchmark decontamination: flag any training document that
    // shares a 13-token n-gram with the eval/benchmark set (the GPT-3
    // appendix-C contamination rule). The benchmark side is SMALL (eval
    // sets are MBs) → distinct gram hashes BROADCAST; the corpus side
    // generates grams in the scan stage and left-semi joins map-side, so
    // nothing corpus-sized ever shuffles. The only shuffle is the final
    // per-doc count of hits — at 100 TB this is a broadcast-filtered
    // scan, the same shape at any corpus size. Grams travel as 60-bit
    // bigints (md5-prefix conv — 8-byte keys instead of 32-byte hex
    // strings, DuckDB-reproducible), not 13-token strings.
    "d06_decontaminate" -> ((s, dir) => {
      val n = 13
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val docs = t(s, dir, "documents").select(col("doc_id"), toks.as("tk"))
      // simulated eval-set leakage, deterministic for the oracle: the
      // benchmark is one 13-token window (tokens 6..18) lifted from
      // every 20th document
      val gram = (x: Column) => conv(substring(md5(x), 1, 15), 16, 10).cast(LongType)
      val bench = docs.filter(col("doc_id") % 20 === 0)
        .filter(size(col("tk")) >= n + 5)
        .select(gram(array_join(slice(col("tk"), 6, n), " ")).as("g"))
        .distinct()
      val grams = docs.filter(size(col("tk")) >= n)
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.VectorFunctions.md5SpanHashes(col("tk"), n))).as("g"))
      grams.join(broadcast(bench), Seq("g"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hit_grams"))
        .orderBy(col("doc_id"))
    }),

    // ---- Bloom-pre-filtered decontamination: the scale path when the
    // benchmark set is too large to broadcast as a hash-join relation
    // (a Bloom filter is ~10 bits/item at 1% fpp vs hundreds for a
    // broadcast hash table). The probe stream drops non-matching grams
    // MAP-SIDE before the shuffle of the exact confirming join, which
    // then removes the Bloom's false positives — same answer as the
    // exact semi-join (the oracle computes it exactly), a fraction of
    // the shuffled bytes. Spark's own runtime bloom-join optimization
    // applies the identical pattern; here it is explicit and testable.
    "d13_bloom_decontaminate" -> ((s, dir) => {
      val n = 8
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val docs = t(s, dir, "documents").select(col("doc_id"), toks.as("tk"))
      val gram = (x: Column) => conv(substring(md5(x), 1, 15), 16, 10).cast(LongType)
      // simulated eval set: one 8-token window (tokens 3..10) from every
      // 25th document
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .filter(size(col("tk")) >= n + 2)
        .select(gram(array_join(slice(col("tk"), 3, n), " ")).as("g"))
        .distinct()
      val bloom = bench.stat.bloomFilter("g", 1000L, 0.01)
      val bloomB = s.sparkContext.broadcast(bloom)
      val mightContain = udf((g: Long) => bloomB.value.mightContainLong(g))
      val grams = docs.filter(size(col("tk")) >= n)
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.VectorFunctions.md5SpanHashes(col("tk"), n))).as("g"))
      grams.filter(mightContain(col("g")))
        // shuffle_hash (not broadcast): models the eval set that cannot
        // broadcast; the Bloom already cut the probe side
        .join(bench.hint("shuffle_hash"), Seq("g"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hit_grams"))
        .orderBy(col("doc_id"))
    }),

    // ---- cross-SOURCE contamination matrix: pairwise 13-gram overlap
    // between corpus sources (the dataset-level view of d06's doc-level
    // decontamination — "how much does source A leak into source B",
    // the audit a training-data curator runs before mixing corpora).
    // Scale shape: ONE distinct (gram, source) table feeds both sides;
    // the gram-keyed self-join fans out at most S² rows per gram (S =
    // source count, single digits), so intersection size is gram-count
    // work, never corpus²; per-source totals are one combinable agg.
    // Gram keys are 60-bit md5-prefix bigints (8-byte shuffle keys),
    // same as d06/d07.
    "d14_source_overlap" -> ((s, dir) => {
      val n = 13
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val grams = t(s, dir, "documents")
        .select(col("source"), toks.as("tk"))
        .filter(size(col("tk")) >= n)
        .select(col("source"), explode(array_distinct(
          graft.functions.VectorFunctions.md5SpanHashes(col("tk"), n))).as("g"))
        .distinct()
      val per = grams.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
      val inter = grams.as("a").join(grams.as("b"), "g")
        .filter(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_common"))
      inter
        .join(per.select(col("source").as("src_a"), col("n_grams").as("na")), Seq("src_a"))
        .join(per.select(col("source").as("src_b"), col("n_grams").as("nb")), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_common"), col("na"), col("nb"),
          round(col("n_common").cast(DoubleType) /
            (col("na") + col("nb") - col("n_common")), 6).as("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // ---- frequent-pair mining (association rules, Agrawal et al. 1993):
    // parts co-ordered in the same order, with support, confidence and
    // lift. Scale shape: the pair self-join is keyed on the order id and
    // bounded by basket size (≤7 lines per TPC-H order — per-order work
    // is O(basket²), never O(catalog²)); pair counting is a map-side-
    // combinable aggregation; item counts join back on the part keys
    // (dimension-sized, broadcastable); the single global scalar (basket
    // count) rides a broadcast cross join. Ratios are one double
    // division each — deterministic across engines.
    // per-source exact-dup rate (the dedup-observability readout every
    // curation run reports next to the dedup itself): first-occurrence =
    // combinable min(doc_id) per content hash (the d07 shape), everything
    // after that key'd min is one |sources|-sized rollup — dup share and
    // the bytes a dedup pass would reclaim, by ingest source.
    "d16_source_dup_rate" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), length(col("text")).as("len"),
          md5(col("text")).as("h"))
      val first = d.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
      d.join(first, Seq("h"))
        .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"),
          sum(when(col("is_dup"), col("len").cast("long")).otherwise(0L))
            .as("dup_bytes"))
        .select(col("source"), col("n_docs"), col("n_dups"), col("dup_bytes"),
          round(col("n_dups").cast("double") / col("n_docs"), 6).as("dup_rate"))
        .orderBy(col("source"))
    }),

    "d15_frequent_pairs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val nBaskets = li.agg(countDistinct(col("ok")).as("n_baskets"))
      val a = li.select(col("ok"), col("pk").as("p1"))
      val b = li.select(col("ok"), col("pk").as("p2"))
      val pairs = a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
      val item = li.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
      pairs
        .join(item.select(col("pk").as("p1"), col("cnt").as("n_p1")), Seq("p1"))
        .join(item.select(col("pk").as("p2"), col("cnt").as("n_p2")), Seq("p2"))
        .crossJoin(broadcast(nBaskets))
        .select(col("p1"), col("p2"), col("support"), col("n_p1"), col("n_p2"),
          round(col("support").cast(DoubleType) / col("n_p1"), 6).as("confidence"),
          round(col("support").cast(DoubleType) * col("n_baskets") /
            (col("n_p1") * col("n_p2")), 6).as("lift"))
        .orderBy(col("support").desc, col("p1"), col("p2"))
        .limit(50)
    }),

    // ---- exact SPAN dedup (the "exact substring deduplication" rule of
    // RefinedWeb/Lee et al. 2022, in distributed shingle form): every
    // 10-token window is hashed; an occurrence is a duplicate span when
    // the same window appeared at any earlier (doc_id, pos). Per doc:
    // span count, duplicated-span count, duplicated fraction, and the
    // keep/drop decision. First occurrence per span hash is a map-side-
    // combinable min(struct(doc_id, pos)) aggregate — NOT a row_number
    // window, which would funnel every occurrence of one hot span hash
    // (a boilerplate 10-gram at 100 TB) into a single unsplittable task.
    // The join-back on h is an equi-join AQE's skew handling can split.
    // Spans travel as 60-bit bigints (conv of the md5 prefix — fixed
    // 8-byte shuffle keys, DuckDB-reproducible), never as hex strings
    // or 10-token strings.
    "d07_span_dedup" -> ((s, dir) => {
      val k = 10
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val docs = t(s, dir, "documents").select(col("doc_id"), toks.as("tk"))
      // native Md5SpanHashes: one buffer-reusing pass per row computes
      // every window's 60-bit md5-prefix key — same values as the
      // conv(substring(md5(array_join(slice(…))))) pipeline, without a
      // UTF8String build + hex/decimal text round-trip per window
      val occ = docs.filter(size(col("tk")) >= k)
        .select(col("doc_id"), posexplode(
          graft.functions.VectorFunctions.md5SpanHashes(col("tk"), k)).as(Seq("pos", "h")))
      val first = occ.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("first_occ"))
      val perDoc = occ.join(first, Seq("h"))
        .withColumn("dup", struct(col("doc_id"), col("pos")) =!= col("first_occ"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("dup").cast(LongType)).as("n_dup_spans"))
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
        .withColumn("dup_frac", when(col("n_spans") > 0,
          round(col("n_dup_spans").cast(DoubleType) / col("n_spans"), 4)).otherwise(lit(0.0)))
        .withColumn("keep", col("dup_frac") <= 0.2)
        .orderBy(col("doc_id"))
    }),

    // SemDedup (Abbas et al. 2023): embedding-space near-dup removal —
    // cluster the corpus, compare pairs only WITHIN a cluster, drop every
    // vector that has a higher-similarity-than-threshold neighbor with a
    // smaller id. Cluster blocking bounds the pairwise work to
    // sum(cell²) instead of corpus²; at 100 TB cells are k-means
    // partitions and each cell's pair join is shuffle-local.
    "d05_semdedup" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosineSim
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // deterministic codebook: first 8 vectors stand in for trained
      // k-means centers (same convention as s05/k14). Assignment argmax
      // is computed INLINE over the codebook shipped as ONE broadcast
      // row of array<struct<cent_id,cv>> with ZERO shuffle; r17 moves
      // the per-entry loop from the interpreted array_min/transform
      // lambda into the codegen ArgMinCentroids.topCosineCells loop —
      // same (round(cc,4) desc, cent_id asc) winner, whole-stage
      // codegen. The quadratic-by-design cost of this baseline tier is
      // the within-cell pair join below, not the assignment.
      val centsA = broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
        .agg(collect_list(struct(col("cent_id"), col("cv"))).as("__ca")))
      val assigned = e.crossJoin(centsA)
        .withColumn("cell", element_at(
          graft.functions.ArgMinCentroids.topCosineCells(col("v"), col("__ca"), 1), 1))
        .select(col("cell"), col("vec_id"), col("v"))
      // pair-block decomposition: the cell key has only 8 distinct
      // values, so a plain self-join on `cell` runs ≤8 reducer tasks no
      // matter the cluster — at 100x data that is the whole wall-clock.
      // Salting the A side into 16 hash blocks and replicating the B
      // side across them turns the same all-pairs product into
      // 8·16 = 128 independent tasks with identical per-pair arithmetic
      // (results bit-for-bit unchanged; only the partitioning changes).
      val nBlk = 16
      val a = assigned.select(col("cell"), col("vec_id").as("ai"), col("v").as("va"))
        .withColumn("blk", pmod(hash(col("ai")), lit(nBlk)))
      val b = assigned.select(col("cell"), col("vec_id").as("bi"), col("v").as("vb"))
        .withColumn("blk", explode(array((0 until nBlk).map(lit(_)): _*)))
      a.join(b, Seq("cell", "blk"))
        .filter(col("ai") < col("bi"))
        .withColumn("c", cosineSim(col("va"), col("vb")))
        .filter(col("c") >= 0.35)
        .groupBy(col("cell"), col("bi"))
        .agg(min(col("ai")).as("kept_id"), count(lit(1)).as("n_near"),
          round(max(col("c")), 4).as("max_sim"))
        .select(col("cell").cast(LongType).as("cell"), col("bi").as("removed_id"),
          col("kept_id"), col("n_near"), col("max_sim"))
        .orderBy(col("cell"), col("removed_id"))
    }),

    // ---- semdedup, the SCALE path ------------------------------------
    // d05's fixed 8-cell codebook is cluster-size-quadratic by
    // construction: cell population grows with the corpus, so within-cell
    // all-pairs work grows as n²/8 (measured 222x wall at 100x data —
    // the honest cost of the baseline tier, like s03 for ANN). The
    // production shape (SemDeDup, Abbas et al. 2023 §3: k-means with k
    // chosen so clusters stay small) sizes the codebook WITH the corpus:
    // k = ⌈n/250⌉ cells keeps expected cell size ~250 constant, so pair
    // work is n·250 — linear. The n·k assignment term is killed by the
    // IVF two-level shape (s14): a coarse codebook of ⌈√k⌉ centers is
    // the only frame that touches every row, broadcast as kc rows
    // (sub-linear: √(n/250) entries) whose nested-loop expansion
    // computes every coarse distance in WHOLE-STAGE CODEGEN — twice:
    // once projected NARROW (vec_id, qd+rad) to reduce the scalar
    // Elkan/Hamerly bound ub = min_j(qd_j + rad_j) with a map-side-
    // combining HashAggregate, once after rejoining ub to evaluate the
    // shortlist filter. The expanded n·√k frame NEVER hits an Exchange
    // (the r15 shape windowed it: an n^1.5·d shuffle, ~1000× more bytes
    // at 100× data); every exchange here is linear — n 16-byte ub rows
    // plus one plain n·d corpus repartition for the rejoin. The bound is EXACT, not approximate: for unit-normalized
    // vectors d² = 2−2·cos, so any centroid in coarse cell j has
    // distance ≥ d(q,co_j) − rad_j; cells whose best possible cosine is
    // below the guaranteed-achievable best (min over cells of
    // d(q,co_j)+rad_j) minus the 1e-4 rounding granularity can never
    // hold the (round(cos,4) desc, cent_id) winner — output is
    // bit-identical to the full argmax. Work: n·√k coarse distances +
    // n·E[shortlist] exact ones instead of n·k; the centroid join is a
    // shuffle join on the coarse-cell key, never a linear-size
    // broadcast, and the final argmax is a map-side-combinable max_by
    // (n narrow final-shuffle rows, not a window over the scan frame).
    // Same verdict schema as d05.
    "d27_semdedup_scaled" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosineSim
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val k = (e.count() + 249) / 250
      val kc = math.max(1L, math.ceil(math.sqrt(k.toDouble)).toLong)
      val cents = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val coarseRaw = e.filter(col("vec_id") < kc)
        .select(col("vec_id").as("co_id"), col("v").as("cov"))
      // normalized-space distance d(u,v) = sqrt(2 − 2·cos(u,v)) — now
      // computed inside the ArgMinCentroids codegen loops below
      // the √k coarse codebook as ONE row holding a struct array —
      // crossJoin(broadcast(·)) of a 1-row frame is a map-side column
      // append, after which every coarse computation is a row-local
      // codegen loop over the array
      val coA0 = broadcast(coarseRaw.agg(
        collect_list(struct(col("co_id"), col("cov"))).as("co")))
      // level 1: each centroid registers under its nearest coarse center
      // (k·√k distance FLOPs, zero shuffle) — r17 moves the argmin from
      // the interpreted array_min/transform lambda into the codegen
      // ArgMinCentroids.nearestNDist loop, same (cd asc, co_id asc)
      // tie-break; cells carry a covering radius (√k-row rollup)
      val centIdx = cents.crossJoin(coA0)
        .withColumn("best",
          graft.functions.ArgMinCentroids.nearestNDist(col("cv"), col("co")))
        .select(col("best.id").as("co_id"), col("cent_id"), col("cv"),
          col("best.cd").as("cd"))
      val rads = centIdx.groupBy(col("co_id")).agg(max(col("cd")).as("rad"))
      // level 2: per query, keep a coarse cell only if its best possible
      // cosine (1 − lb²/2) can still reach the guaranteed-achievable
      // best (1 − ub²/2) within the 4-dp rounding granularity. r17: the
      // whole Elkan/Hamerly reduction runs in ONE codegen pass per row
      // (ArgMinCentroids.coarseShortlist): qd_j over the broadcast
      // struct-array codebook, ub = min(qd_j + rad_j), and the filter —
      // the exact expressions of the r16 two-pass shape, which needed a
      // second expansion plus TWO corpus-scale exchanges (the n 16-byte
      // ub HashAggregate reduction and an n·d rejoin repartition) only
      // because the r16-era inline shape would have run the custom
      // cosine through interpreted HOF-lambda eval. With the loop
      // codegen'd, the inline shape is both zero-shuffle AND
      // locally-fastest: the n·√k frame never materializes anywhere —
      // each row scans the codebook once and explodes only its
      // surviving co_ids. The shortlist set is bit-identical (same
      // arithmetic, same 2e-4 guard band).
      val coA = broadcast(coarseRaw.join(rads, Seq("co_id")).agg(
        collect_list(struct(col("co_id"), col("cov"), col("rad"))).as("__co")))
      val shortlist = e.crossJoin(coA)
        .select(explode(graft.functions.ArgMinCentroids.coarseShortlist(
          col("v"), col("__co"))).as("co_id"), col("vec_id"), col("v"))
      // exact argmax over the shortlisted cells' centroids: shuffle join
      // on the coarse-cell key, then a declarative max_by — partial
      // aggregation combines map-side, so the final exchange carries n
      // narrow winner rows instead of windowing the n·E[scan] frame
      val assigned = shortlist
        .join(centIdx.select(col("co_id"), col("cent_id"), col("cv")), Seq("co_id"))
        .withColumn("cc", round(cosineSim(col("v"), col("cv")), 4))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cent_id"), struct(col("cc"), negate(col("cent_id")))).as("cell"),
          first(col("v")).as("v"))
        .select(col("cell"), col("vec_id"), col("v"))
      // k cells = k-way join parallelism; no pair-block salt needed
      val a = assigned.select(col("cell"), col("vec_id").as("ai"), col("v").as("va"))
      val b = assigned.select(col("cell"), col("vec_id").as("bi"), col("v").as("vb"))
      a.join(b, Seq("cell"))
        .filter(col("ai") < col("bi"))
        .withColumn("c", cosineSim(col("va"), col("vb")))
        .filter(col("c") >= 0.35)
        .groupBy(col("cell"), col("bi"))
        .agg(min(col("ai")).as("kept_id"), count(lit(1)).as("n_near"),
          round(max(col("c")), 4).as("max_sim"))
        .select(col("cell").cast(LongType).as("cell"), col("bi").as("removed_id"),
          col("kept_id"), col("n_near"), col("max_sim"))
        .orderBy(col("cell"), col("removed_id"))
    }),

    // ---- count-min sketch heavy hitters (Cormode & Muthukrishnan 2005)
    // The frequency companion to d08's cardinality sketch: 4 salted hash
    // rows × 512 buckets; a value's estimate is the MIN of its 4 cell
    // counts (only ever an overcount). Cells are map-side combinable and
    // the sketch is 2048 cells regardless of corpus size — the shape
    // that finds boilerplate tokens/spans at 100 TB without shuffling
    // every distinct value. Exact counts ride along for the top-10 to
    // report the sketch's overcount (zero here: heavy hitters dominate
    // their buckets). Same 60-bit md5 keys, pure integer arithmetic —
    // engine-exact.
    "d12_cms_heavy_hitters" -> ((s, dir) => {
      val occ = t(s, dir, "documents")
        .select(explode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))).as("tok"))
        .select(conv(substring(md5(col("tok")), 1, 15), 16, 10).cast(LongType).as("h"))
      val rows4 = array((0 until 4).map(lit(_)): _*)
      def bucket(r: Column, h: Column): Column =
        conv(substring(md5(concat(r.cast("string"), lit("_"), h.cast("string"))), 1, 15),
          16, 10).cast(LongType) % 512
      // ONE corpus pass feeds both the sketch and the exact rider: the
      // query already pays the per-distinct-hash exact count for its
      // top-10 truth, so the sketch cells roll up from those counts
      // (sum(cnt) per cell ≡ count of occurrences — identical values)
      // instead of re-scanning and re-hashing every occurrence. This
      // cuts the md5 work from 6 per OCCURRENCE (1 key + 4 bucket salts
      // in the cells branch + 1 key in the exact branch) to 1 per
      // occurrence + 4 per DISTINCT hash, and the two consumers share
      // the same groupBy(h) exchange (ReuseExchange), so the corpus is
      // scanned once, not twice. The sketch update itself stays map-side
      // combinable; in a sketch-only deployment (no exact rider) the
      // direct per-occurrence cell aggregation remains the right shape.
      val hc = occ.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      val cells = hc.select(col("h"), col("cnt"), explode(rows4).as("r"))
        .withColumn("bucket", bucket(col("r"), col("h")))
        .groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      val top = hc.select(col("h"), col("cnt").as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("h")).limit(10)
      top.select(col("h"), col("true_cnt"), explode(rows4).as("r"))
        .withColumn("bucket", bucket(col("r"), col("h")))
        .join(broadcast(cells), Seq("r", "bucket"))
        .groupBy(col("h"), col("true_cnt"))
        .agg(min(col("cnt")).as("cms_est"))
        .withColumn("overcount", col("cms_est") - col("true_cnt"))
        .orderBy(col("true_cnt").desc, col("h"))
    }),

    // ---- canonical-representative selection ("which copy to keep") ----
    // After grouping near-duplicates (d04's components), a real pipeline
    // keeps ONE document per group: the longest (best-quality proxy),
    // ties to the smallest doc_id. The argmax is min(struct(-len, id))
    // per group — map-side combinable — and the join-back is
    // group-keyed, so the step scales with the dup graph like d04, never
    // corpus². Emits keep/drop per doc: the actionable dedup verdict.
    "d09_dup_representative" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val comps = ccLabels(s, dir)
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val reps = comps.groupBy(col("dup_group"))
        .agg(min(struct((-col("n_chars")).as("negq"), col("doc_id"))).as("best"))
        .select(col("dup_group"), col("best.doc_id").as("rep_id"))
      comps.join(reps, Seq("dup_group"))
        .select(col("doc_id"), col("dup_group"), col("rep_id"),
          (col("doc_id") === col("rep_id")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // ---- edit-distance-verified near-dups -----------------------------
    // The precision tier above fingerprint methods: SimHash bands
    // propose candidates (recall, corpus-scale), Levenshtein verifies
    // them exactly (precision, pair-scale). The O(n·m) verify runs ONLY
    // on banded candidates — never all pairs — so corpus size bounds the
    // band join and candidate count bounds the expensive step. Text is
    // normalized to ASCII ('#' per non-ASCII codepoint) first: the
    // oracle engine computes byte-based distances, Spark codepoint-based
    // — after normalization the two are the same function.
    "d11_edit_distance_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cands = simhashPairs(docs, maxHamming = 16, md5Hash = true)
        .select(col("doc_a"), col("doc_b"))
      val norm = docs.select(col("doc_id"),
        regexp_replace(col("text"), "[^\\x00-\\x7F]", "#").as("nt"))
      // Verification cost control — the full-text Levenshtein DP is the
      // expensive step (O(n²) per pair; unbounded it was 59% of the
      // whole bench), so three RESULT-PRESERVING prunes bound it, each
      // a valid lower bound on the edit distance (the filter-verify
      // cascade of the similarity-join literature, cf. Gravano 2001
      // count filtering / PassJoin):
      //  1. length gap: lev ≥ |len(a)−len(b)|;
      //  2. threshold-bounded levenshtein (banded O(n·k) DP, early
      //     exit): the global bound k = ⌊0.25·max corpus len⌋ dominates
      //     every per-pair bound ⌊0.25·max_len⌋, so every pair the
      //     exact filter would keep still gets its exact distance;
      //     pairs cut off at -1 are exactly those the filter drops.
      val maxLen = norm.agg(max(length(col("nt")))).first().getInt(0)
      val normF = norm.withColumn("ln", length(col("nt")))
      // persisted: three DP branches below share this candidate set —
      // without it each union branch would recompute the simhash join
      val joined = cands
        .join(normF.select(col("doc_id").as("doc_a"), col("nt").as("ta"),
          col("ln").as("la")), Seq("doc_a"))
        .join(normF.select(col("doc_id").as("doc_b"), col("nt").as("tb"),
          col("ln").as("lb")), Seq("doc_b"))
        .withColumn("max_len", greatest(col("la"), col("lb")))
        .filter(abs(col("la") - col("lb")) <= col("max_len") * 0.25)
        .persist()
      // The threshold argument must be a literal, but a tight threshold
      // is what makes the early exit bite — so pairs split into max_len
      // buckets, each DP bounded by ⌈0.25·bucket-upper⌉ ≥ its per-pair
      // bound (results identical; the -1 cutoffs are exactly the pairs
      // the exact filter drops). Disjoint filters on the same frame: no
      // pair is evaluated twice.
      val cuts = Seq(0, maxLen / 2, maxLen * 3 / 4, maxLen + 1)
      val dp = cuts.sliding(2).map { case Seq(lo, hi) =>
        joined.filter(col("max_len") >= lo && col("max_len") < hi)
          .withColumn("lev",
            levenshtein(col("ta"), col("tb"), ((hi - 1) * 0.25).toInt.max(1)))
      }.reduce(_ union _)
      dp.filter(col("lev") >= 0 && col("lev") <= col("max_len") * 0.25)
        .select(col("doc_a"), col("doc_b"), col("lev").cast(LongType).as("lev"),
          col("max_len").cast(LongType).as("max_len"),
          (floor(col("lev").cast(DoubleType) / col("max_len") * lit(1e4) + lit(0.5))
            / lit(1e4)).as("rel_dist"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ---- leakage-safe train/val/test split ----------------------------
    // Splitting by doc hash lets near-duplicates straddle train and
    // test — the classic eval-contamination bug (Dodge et al. 2021
    // document the C4/benchmark overlap version). The fix: assign the
    // split to the duplicate GROUP (d04's components), so every
    // near-dup lands on the same side by construction. The split key is
    // the group label's 60-bit md5 — deterministic, partition-invariant
    // — and n_leaky_groups (groups spanning >1 split) is emitted as the
    // checkable invariant: it must be 0.
    "d10_leakage_safe_split" -> ((s, dir) => {
      val u = conv(substring(md5(col("dup_group").cast("string")), 1, 15), 16, 10)
        .cast(LongType) % 10
      val assigned = ccLabels(s, dir)
        .withColumn("split", when(u < 8, "train").when(u === 8, "val").otherwise("test"))
      val leaky = assigned.groupBy(col("dup_group"))
        .agg(count_distinct(col("split")).as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assigned.groupBy(col("split"))
        .agg(count_distinct(col("dup_group")).as("n_groups"),
          count(lit(1)).as("n_docs"))
        .withColumn("n_leaky_groups", lit(leaky))
        .orderBy(col("split"))
    }),

    // ---- HLL cardinality sketch (Flajolet et al. 2007, m=1024) --------
    // Distinct-count planning for dedup at 100 TB: registers are
    // mergeable partial aggregates — every task folds its rows into at
    // most 1024 (bucket, max-rank) cells map-side, so the shuffle is
    // O(m) per column regardless of corpus size, where exact
    // count-distinct shuffles every distinct value. The sketch is
    // engine-exact end to end: bucket/rank/register-sum stay in 64-bit
    // integers (rank terms sum as 2^(51-rank), exactly representable),
    // floats appear only in the final one-row estimate. Exact distinct
    // runs alongside purely to report the sketch's relative error — at
    // scale that branch is the one you drop.
    "d08_hll_cardinality" -> ((s, dir) => {
      def hllOne(df: DataFrame, c: String, name: String): DataFrame = {
        val hashed = df.select(col(c).cast("string").as("v"))
          .select(col("v"),
            conv(substring(md5(col("v")), 1, 15), 16, 10).cast(LongType).as("h60"))
        // every distinct value hashes into exactly one bucket, so the
        // per-bucket distinct counts sum to the global exact distinct —
        // one aggregation tree carries both the sketch and its truth,
        // no second scan, no join
        val reg = hashed
          .select(shiftright(col("h60"), 50).as("bucket"), col("v"),
            col("h60").bitwiseAND(lit((1L << 50) - 1)).as("w"))
          .groupBy(col("bucket"))
          .agg(max(when(col("w") === 0, lit(51))
            .otherwise(lit(51) - length(bin(col("w"))))).as("rnk"),
            count_distinct(col("v")).as("nd"))
        reg.agg(count(lit(1)).as("nz"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - rnk AS INT))")).as("sum_int"),
          sum(col("nd")).as("n_exact"))
          // alpha_m * m^2 * 2^51 / (register sum scaled by 2^51); the
          // small-range branch is Flajolet's linear-counting correction.
          // All float literals via lit(Double), never SQL text — a bare
          // 0.7213 parses as DECIMAL on both engines with DIFFERENT
          // division rules; doubles make both sides the same IEEE ops
          .withColumn("raw",
            lit(0.7213) / (lit(1.0) + lit(1.079) / lit(1024.0))
              * lit(1048576.0) * lit(2251799813685248.0)
              / expr("CAST(sum_int + (1024 - nz) * shiftleft(CAST(1 AS BIGINT), 51) AS DOUBLE)"))
          .withColumn("est", when(col("raw") <= 2560.0 && col("nz") < 1024,
            lit(1024.0) * log(lit(1024.0) / (lit(1024) - col("nz")))).otherwise(col("raw")))
          .select(lit(name).as("col_name"), col("n_exact").cast(LongType).as("n_exact"),
            col("nz").cast(LongType).as("nz_buckets"),
            round(col("est"), 4).as("hll_est"),
            round(col("est") / col("n_exact") - 1.0, 4).as("rel_err"))
      }
      hllOne(t(s, dir, "lineitem"), "l_partkey", "lineitem.l_partkey")
        .union(hllOne(t(s, dir, "orders"), "o_custkey", "orders.o_custkey"))
        .union(hllOne(t(s, dir, "events"), "user_id", "events.user_id"))
        .orderBy(col("col_name"))
    })
  )

  /** Connected components by min-label propagation: every node starts
    * labeled with its own id; each round labels flow across edges and
    * every node keeps the minimum seen; fixpoint when the global label
    * sum stops changing (labels only decrease, so the sum is a strictly
    * decreasing convergence witness — one scalar per round, the
    * unavoidable driver-side part of any iterative fixpoint).
    *
    * Scale shape: each round is one shuffle-join (edges ⋈ labels on src)
    * plus one min-aggregate — the standard label-propagation round. Rounds
    * = component diameter, and near-dup clusters from banded LSH are
    * clique-dense (diameter 1-3), so the loop is short in practice;
    * `localCheckpoint` truncates lineage every round so plan depth stays
    * constant. A cap guards against adversarial path graphs.
    *
    * @param nodes DataFrame(id: long)
    * @param pairs DataFrame(doc_a, doc_b) undirected edges
    */
  /** Shared near-dup component labels (doc_id, dup_group) — d04, d09,
    * d10 and d17 all consume the SAME simhash-banded connected
    * components; a production pipeline materializes the labels once per
    * corpus snapshot and every downstream step (representative pick,
    * split assignment, cluster histogram) reads the derived table. Same
    * cache contract as the g-pack's shared edge lists
    * ([[graft.engine.SharedFrames]]): fingerprint-keyed on the documents
    * parquet, evicted+unpersisted on staleness, session-scoped. */
  private def ccLabels(s: SparkSession, dir: String): DataFrame =
    graft.engine.SharedFrames.shared("dedup_cc", s, dir, Seq("documents.parquet")) {
      val docs = t(s, dir, "documents")
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val nodes = docs.select(col("doc_id"), toks.as("tk"))
        .filter(size(col("tk")) >= 1).select(col("doc_id").as("id"))
      val pairs = simhashPairs(docs, maxHamming = 8, md5Hash = true)
        .select(col("doc_a"), col("doc_b"))
      connectedComponents(nodes, pairs)
        .select(col("id").as("doc_id"), col("lbl").as("dup_group"))
    }

  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    // the fixpoint iterates ONLY over edge-touched nodes: the dup graph
    // is orders of magnitude smaller than the corpus (isolated docs are
    // their own component by definition and never need a round), so the
    // per-round join/agg scales with near-dup volume, not corpus size
    val touched = edges.select(col("src").as("id")).distinct().localCheckpoint()
    // decimal(38,0) sum: id sums would overflow a long well below 100 TB
    // cardinalities; null (empty node set) folds to 0
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var labels = touched.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val prop = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val merged = labels.union(prop)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      // pointer jumping: relabel to the label's own label (path
      // compression). Plain propagation needs diameter rounds — measured
      // 12 on the sf0.1 near-dup graph; compression converges in
      // O(log diameter) (4 there). Labels still only decrease, so the
      // decimal-sum convergence witness is unchanged.
      val parents = merged.select(col("id").as("pid"), col("lbl").as("plbl"))
      labels = merged.join(parents, merged("lbl") === parents("pid"), "left")
        .select(merged("id"), coalesce(col("plbl"), merged("lbl")).as("lbl"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    val isolated = nodes.join(touched, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("lbl"))
    labels.join(nodes.select(col("id")), Seq("id"), "left_semi")
      .union(isolated)
  }

  /** SimHash near-dup pairs over (doc_id, text): one 64-bit fingerprint
    * per doc (narrow scan), 4 bands of 16 bits — near-identical
    * fingerprints collide in >= 1 band — then exact hamming verify on
    * candidates. Docs with zero tokens are excluded (no signal; also
    * keeps the oracle's unnest-based formulation aligned). Recall on
    * planted near-dups asserted in DedupSpec. */
  /** d28's engine: 128-bit simhash (md5 digest bytes 0-7 / 8-15 per
    * token), eight 16-bit chunks banded on all C(8,2)=28 chunk pairs
    * (32-bit keys), hamming over the full 128 bits, threshold 16 — the
    * Manku et al. 2007 combination-banding geometry (see the d28 entry
    * for the floor/recall math). Exposed for the DedupSpec invariants
    * (planted exact duplicates share all 28 bands by construction). */
  def combinationBandedPairs(docs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.simhash64
    val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
    val fp = docs
      .select(col("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) >= 1)
      .select(col("doc_id"),
        simhash64(col("tk"), md5Hash = true).as("f1"),
        simhash64(col("tk"), md5Hash = true, md5Second = true).as("f2"))
    def chunk(k: Int): Column =
      if (k < 4) shiftrightunsigned(col("f1"), k * 16).bitwiseAND(lit(0xFFFFL))
      else shiftrightunsigned(col("f2"), (k - 4) * 16).bitwiseAND(lit(0xFFFFL))
    val pairKeys = for { i <- 0 until 8; j <- (i + 1) until 8 }
      yield chunk(i) * lit(65536L) + chunk(j)
    val bands = fp.select(col("doc_id"), col("f1"), col("f2"),
      posexplode(array(pairKeys: _*)).as(Seq("band", "bkey")))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (bit_count(col("x.f1").bitwiseXOR(col("y.f1"))) +
          bit_count(col("x.f2").bitwiseXOR(col("y.f2")))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 16)
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int, md5Hash: Boolean = false): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
    val fp = docs.select(col("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) >= 1)
      .select(col("doc_id"), simhash64(col("tk"), md5Hash).as("fp"))
    val bands = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "bkey")))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** The d26 planner table, exact: p = 1 − (1 − (i/10)^r)^b as a BigInt
    * rational over den = 10^(r·b) = 10^32, rounded HALF_UP to 6dp once
    * here — both the Spark frame and the DuckDB oracle read these same
    * literals, so no engine ever evaluates a float pow. */
  private[graft] lazy val lshPlannerRows: Seq[(Int, Int, Int, Double)] = {
    val k = MinhashK
    for {
      r <- Seq(1, 2, 4, 8, 16, 32)
      b = k / r
      i <- 1 to 9
    } yield {
      val den = BigInt(10).pow(k)
      val miss = (BigInt(10).pow(r) - BigInt(i).pow(r)).pow(b) *
        BigInt(10).pow(k - r * b)
      val p = BigDecimal(den - miss, java.math.MathContext.UNLIMITED) /
        BigDecimal(den)
      (b, r, i, p.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  // ------------------------------------------------- log-quantile sketch
  // One SQL template, two engine spellings (bitshift / integer division
  // differ; every other token is shared), so Spark and the oracle compute
  // bit-identical integer arithmetic — the same parity discipline as the
  // KB oracle prefix.
  private[graft] final case class QEng(pow2: String => String, idiv: (String, String) => String)
  private[graft] val sparkQ = QEng(
    x => s"shiftleft(CAST(1 AS BIGINT), CAST(($x) AS INT))",
    (a, b) => s"(($a) DIV ($b))")
  private val duckQ = QEng(
    x => s"(CAST(1 AS BIGINT) << CAST(($x) AS INT))",
    (a, b) => s"(($a) // ($b))")
  private def sparkPow2(x: String): String = sparkQ.pow2(x)

  /** vals/k/sk CTEs: value → (octave via binary-string length, 16 linear
    * sub-buckets) → (source, bkt, cnt) sketch rows. */
  private[graft] def logqBuildSql(table: String, e: QEng): String = s"""
    vals AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM $table WHERE n_chars >= 1),
    k AS (SELECT source, v, length(bin(v)) - 1 AS oct,
        ${e.pow2("length(bin(v)) - 1")} AS p FROM vals),
    sk AS (SELECT source, oct * 16 + ${e.idiv("(v - p) * 16", "p")} AS bkt,
        COUNT(*) AS cnt
      FROM k GROUP BY 1, 2)"""

  /** lows/tot/cum/q CTEs: sketch rows → per-source p50/p90/p99 (bucket
    * lower bounds at the ceil(q·n) rank; all-integer). */
  private[graft] def logqFromSketchSql(rel: String, e: QEng): String = s"""
    lows AS (SELECT source, bkt, cnt,
        ${e.pow2(e.idiv("bkt", "16"))} +
        ${e.idiv(s"(bkt % 16) * ${e.pow2(e.idiv("bkt", "16"))}", "16")} AS low
      FROM $rel),
    tot AS (SELECT source, SUM(cnt) AS n FROM $rel GROUP BY source),
    cum AS (SELECT source, bkt, low,
        SUM(cnt) OVER (PARTITION BY source ORDER BY bkt) AS c FROM lows),
    q AS (SELECT cum.source, MAX(tot.n) AS n,
        MIN(CASE WHEN cum.c >= ${e.idiv("tot.n + 1", "2")} THEN cum.low END) AS p50,
        MIN(CASE WHEN cum.c >= ${e.idiv("9 * tot.n + 9", "10")} THEN cum.low END) AS p90,
        MIN(CASE WHEN cum.c >= ${e.idiv("99 * tot.n + 99", "100")} THEN cum.low END) AS p99
      FROM cum JOIN tot ON cum.source = tot.source GROUP BY cum.source)"""

  /** d24 full statement: sketch quantiles + the exact-rank audit. */
  private[graft] def logqQuantileSql(table: String, e: QEng): String = s"""
    WITH ${logqBuildSql(table, e)},
    ${logqFromSketchSql("sk", e)},
    ex AS (SELECT source, v,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS rn FROM vals),
    exq AS (SELECT ex.source,
        MIN(CASE WHEN ex.rn = ${e.idiv("tot.n + 1", "2")} THEN ex.v END) AS p50_exact,
        MIN(CASE WHEN ex.rn = ${e.idiv("9 * tot.n + 9", "10")} THEN ex.v END) AS p90_exact,
        MIN(CASE WHEN ex.rn = ${e.idiv("99 * tot.n + 99", "100")} THEN ex.v END) AS p99_exact
      FROM ex JOIN tot ON ex.source = tot.source GROUP BY ex.source)
    SELECT q.source, CAST(q.n AS BIGINT) AS n_docs, q.p50, q.p90, q.p99,
      exq.p50_exact, exq.p90_exact, exq.p99_exact,
      ROUND(ABS(q.p99 - exq.p99_exact) / exq.p99_exact, 4) AS p99_rel_err
    FROM q JOIN exq ON q.source = exq.source ORDER BY q.source"""

  def oracles: Map[String, String] = Map(

    "d24_logq_quantiles" -> logqQuantileSql("documents", duckQ),

    "d26_lsh_planner" -> {
      val values = lshPlannerRows.map { case (b, r, i, p) =>
        s"($b, $r, ${i / 10.0}, $p)" }.mkString(", ")
      s"""SELECT CAST(bands AS BIGINT) AS bands,
        CAST(rows_per_band AS BIGINT) AS rows_per_band,
        similarity, p_detect
      FROM (VALUES $values) AS t(bands, rows_per_band, similarity, p_detect)
      ORDER BY bands, similarity"""
    },

    // merge-of-stored-halves ≡ whole-corpus sketch (count addition is
    // associative), so the oracle sketches the whole corpus directly
    "d25_logq_sketch_rollup" -> s"""
      WITH ${logqBuildSql("documents", duckQ)},
      merged AS (SELECT source, bkt, cnt FROM sk),
      ${logqFromSketchSql("merged", duckQ)}
      SELECT source, CAST(n AS BIGINT) AS n_docs, p50, p90, p99,
        CAST(2 AS BIGINT) AS n_parts_merged
      FROM q ORDER BY source""",
    // same simhash candidate CTE as d03/d04, byte==codepoint after the
    // ASCII normalization, same floor-spelled ratio
    "d11_edit_distance_pairs" -> """
      WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM documents),
      hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT hv FROM toks),
      votes AS (
        SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        FROM hs CROSS JOIN range(0, 64) t(j) GROUP BY 1, 2),
      fp AS (
        SELECT doc_id,
          bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f
        FROM votes GROUP BY 1),
      bands AS (SELECT doc_id, f, b, (f >> (b*16)) & 65535 bkey
                FROM fp CROSS JOIN range(0, 4) t(b)),
      cands AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.f, y.f)) <= 16),
      norm AS (
        SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '#', 'g') AS nt
        FROM documents)
      SELECT c.doc_a, c.doc_b,
        CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS lev,
        CAST(GREATEST(length(a.nt), length(b.nt)) AS BIGINT) AS max_len,
        FLOOR(CAST(levenshtein(a.nt, b.nt) AS DOUBLE)
          / GREATEST(length(a.nt), length(b.nt)) * 1e4 + 0.5) / 1e4 AS rel_dist
      FROM cands c JOIN norm a ON c.doc_a = a.doc_id JOIN norm b ON c.doc_b = b.doc_id
      WHERE levenshtein(a.nt, b.nt) <= GREATEST(length(a.nt), length(b.nt)) * 0.25
      ORDER BY c.doc_a, c.doc_b""",

    // same salted 60-bit row hashes, same min-of-cells estimate
    "d12_cms_heavy_hitters" -> """
      WITH occ AS (
        SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT h
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) tok
              FROM documents)),
      cells AS (
        SELECT r,
          ('0x'||substr(md5(CAST(r AS VARCHAR)||'_'||CAST(h AS VARCHAR)),1,15))::BIGINT
            % 512 AS bucket,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM occ CROSS JOIN range(0, 4) t2(r) GROUP BY 1, 2),
      top AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM occ
        GROUP BY h ORDER BY true_cnt DESC, h LIMIT 10),
      est AS (
        SELECT t.h, t.true_cnt, MIN(c.cnt) AS cms_est
        FROM top t CROSS JOIN range(0, 4) t3(r)
        JOIN cells c ON c.r = t3.r
          AND c.bucket =
            ('0x'||substr(md5(CAST(t3.r AS VARCHAR)||'_'||CAST(t.h AS VARCHAR)),1,15))::BIGINT
              % 512
        GROUP BY 1, 2)
      SELECT h, true_cnt, cms_est, cms_est - true_cnt AS overcount
      FROM est ORDER BY true_cnt DESC, h""",

    // d04's recursive-CTE components, extended with the keep-policy:
    // longest doc (ties to smallest id) represents its group
    "d09_dup_representative" -> """
      WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM documents),
      hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT hv FROM toks),
      votes AS (
        SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        FROM hs CROSS JOIN range(0, 64) t(j) GROUP BY 1, 2),
      fp AS (
        SELECT doc_id,
          bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f
        FROM votes GROUP BY 1),
      bands AS (SELECT doc_id, f, b, (f >> (b*16)) & 65535 bkey
                FROM fp CROSS JOIN range(0, 4) t(b)),
      pairs AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.f, y.f)) <= 8),
      edges AS (SELECT doc_a a, doc_b b FROM pairs
                UNION SELECT doc_b a, doc_a b FROM pairs),
      nodes AS (
        SELECT doc_id FROM documents
        WHERE len(regexp_extract_all(lower(text), '\S+')) >= 1),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comps AS (
        SELECT reach.id AS doc_id, CAST(min(r) AS BIGINT) AS dup_group,
          any_value(d.n_chars) AS n_chars
        FROM reach JOIN documents d ON reach.id = d.doc_id
        GROUP BY reach.id),
      reps AS (
        SELECT dup_group, doc_id AS rep_id FROM (
          SELECT dup_group, doc_id,
            ROW_NUMBER() OVER (PARTITION BY dup_group
              ORDER BY n_chars DESC, doc_id) AS rn
          FROM comps)
        WHERE rn = 1)
      SELECT c.doc_id, c.dup_group, r.rep_id, c.doc_id = r.rep_id AS keep
      FROM comps c JOIN reps r USING (dup_group)
      ORDER BY c.doc_id""",

    // d04's components + the group-keyed split; the leak count is the
    // invariant the whole design exists to force to zero
    "d10_leakage_safe_split" -> """
      WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM documents),
      hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT hv FROM toks),
      votes AS (
        SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        FROM hs CROSS JOIN range(0, 64) t(j) GROUP BY 1, 2),
      fp AS (
        SELECT doc_id,
          bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f
        FROM votes GROUP BY 1),
      bands AS (SELECT doc_id, f, b, (f >> (b*16)) & 65535 bkey
                FROM fp CROSS JOIN range(0, 4) t(b)),
      pairs AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.f, y.f)) <= 8),
      edges AS (SELECT doc_a a, doc_b b FROM pairs
                UNION SELECT doc_b a, doc_a b FROM pairs),
      nodes AS (
        SELECT doc_id FROM documents
        WHERE len(regexp_extract_all(lower(text), '\S+')) >= 1),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comps AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS dup_group
                FROM reach GROUP BY id),
      assigned AS (
        SELECT doc_id, dup_group,
          CASE WHEN ('0x'||substr(md5(CAST(dup_group AS VARCHAR)),1,15))::BIGINT % 10 < 8
               THEN 'train'
               WHEN ('0x'||substr(md5(CAST(dup_group AS VARCHAR)),1,15))::BIGINT % 10 = 8
               THEN 'val'
               ELSE 'test' END AS split
        FROM comps)
      SELECT split, CAST(COUNT(DISTINCT dup_group) AS BIGINT) AS n_groups,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST((SELECT COUNT(*) FROM (SELECT dup_group FROM assigned
              GROUP BY dup_group HAVING COUNT(DISTINCT split) > 1)) AS BIGINT)
          AS n_leaky_groups
      FROM assigned GROUP BY split ORDER BY split""",

    // Same 60-bit md5-prefix key, same integer register arithmetic; the
    // two engines' floats meet only in the final one-row estimate, where
    // every operand is an exact integer (identical IEEE rounding).
    "d08_hll_cardinality" -> {
      def one(table: String, c: String, name: String) = s"""
        SELECT '$name' AS col_name, n_exact, nz_buckets,
          ROUND(est, 4) AS hll_est, ROUND(est / n_exact - 1.0, 4) AS rel_err
        FROM (
          SELECT n_exact, nz AS nz_buckets,
            CASE WHEN raw <= 2560.0 AND nz < 1024
                 THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / (1024 - nz))
                 ELSE raw END AS est
          FROM (
            SELECT SUM(nd) AS n_exact,
              COUNT(*) AS nz,
              CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+CAST(1.079 AS DOUBLE)/CAST(1024.0 AS DOUBLE))
                * CAST(1048576.0 AS DOUBLE) * CAST(2251799813685248.0 AS DOUBLE)
                / CAST(SUM(1::BIGINT << (51 - rnk))
                       + (1024 - COUNT(*)) * (1::BIGINT << 51) AS DOUBLE) AS raw
            FROM (
              SELECT h60 >> 50 AS bucket,
                MAX(CASE WHEN (h60 & ((1::BIGINT << 50) - 1)) = 0 THEN 51
                         ELSE 51 - length(bin(h60 & ((1::BIGINT << 50) - 1))) END) AS rnk,
                COUNT(DISTINCT v) AS nd
              FROM (SELECT v, ('0x'||substr(md5(v),1,15))::BIGINT AS h60
                    FROM (SELECT CAST($c AS VARCHAR) AS v FROM $table))
              GROUP BY 1)))"""
      s"""
      SELECT CAST(col_name AS VARCHAR) AS col_name, CAST(n_exact AS BIGINT) AS n_exact,
        CAST(nz_buckets AS BIGINT) AS nz_buckets, hll_est, rel_err
      FROM (
        ${one("lineitem", "l_partkey", "lineitem.l_partkey")}
        UNION ALL
        ${one("orders", "o_custkey", "orders.o_custkey")}
        UNION ALL
        ${one("events", "user_id", "events.user_id")})
      ORDER BY col_name"""
    },
    // The md5 shingle hash makes the whole MinHash pipeline DuckDB-
    // reproducible: h = first-32-bits-of-md5, sig_i = min((a_i·h+b_i) mod p)
    // with the Scala-side (a, b) constants inlined below; band keys are the
    // raw 4-value signature slices (Spark buckets on hash(slice, band) —
    // same collision classes); est_jaccard is an exact multiple of 1/32,
    // so no rounding is needed on either side.
    "d02_minhash_lsh" -> d02OracleSql,

    // d08's per-bucket register math with a GROUP BY prepended: the
    // custom aggregate's buffer is bit-identical to these grouped
    // register maxima, and the estimate arithmetic runs the same IEEE
    // sequence (doubles, left-to-right)
    "d20_hll_groups" -> {
      def one(table: String, grp: String, prefix: String, c: String) = s"""
        SELECT '$prefix' || $grp AS grp, n_exact, nz,
          CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+CAST(1.079 AS DOUBLE)/CAST(1024.0 AS DOUBLE))
            * CAST(1048576.0 AS DOUBLE) * CAST(2251799813685248.0 AS DOUBLE)
            / CAST(sum_int + (1024 - nz) * (1::BIGINT << 51) AS DOUBLE) AS raw
        FROM (
          SELECT $grp, SUM(nd) AS n_exact, COUNT(*) AS nz,
            SUM(1::BIGINT << (51 - rnk)) AS sum_int
          FROM (
            SELECT $grp, h60 >> 50 AS bucket,
              MAX(CASE WHEN (h60 & ((1::BIGINT << 50) - 1)) = 0 THEN 51
                       ELSE 51 - length(bin(h60 & ((1::BIGINT << 50) - 1))) END) AS rnk,
              COUNT(DISTINCT v) AS nd
            FROM (SELECT $grp, CAST($c AS VARCHAR) AS v,
                    ('0x'||substr(md5(CAST($c AS VARCHAR)),1,15))::BIGINT AS h60
                  FROM $table)
            GROUP BY 1, 2)
          GROUP BY 1)"""
      s"""
      SELECT grp, CAST(n_exact AS BIGINT) AS n_exact,
        ROUND(est, 4) AS hll_est, ROUND(est / n_exact - 1.0, 4) AS rel_err
      FROM (
        SELECT grp, n_exact,
          CASE WHEN raw <= 2560.0 AND nz < 1024
               THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / (1024 - nz))
               ELSE raw END AS est
        FROM (${one("events", "event_type", "events.", "user_id")}
              UNION ALL
              ${one("orders", "o_orderstatus", "orders.", "o_custkey")}))
      ORDER BY grp"""
    },

    // union-of-stored-sketches == sketch-of-raw-union: the oracle never
    // sees the sketch table — it runs the register math straight over
    // the raw rows each rollup group covers, which is exactly what the
    // elementwise-max union must reproduce
    "d21_hll_sketch_rollup" -> {
      def est(grp: String, nSketches: String, filter: String) = s"""
        SELECT $grp AS event_type, $nSketches AS n_sketches, nz,
          CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+CAST(1.079 AS DOUBLE)/CAST(1024.0 AS DOUBLE))
            * CAST(1048576.0 AS DOUBLE) * CAST(2251799813685248.0 AS DOUBLE)
            / CAST(sum_int + (1024 - nz) * (1::BIGINT << 51) AS DOUBLE) AS raw
        FROM (
          SELECT ${if (grp == "'ALL'") "" else grp + ","} COUNT(*) AS nz,
            SUM(1::BIGINT << (51 - rnk)) AS sum_int
          FROM (
            SELECT ${if (grp == "'ALL'") "" else grp + ","} h60 >> 50 AS bucket,
              MAX(CASE WHEN (h60 & ((1::BIGINT << 50) - 1)) = 0 THEN 51
                       ELSE 51 - length(bin(h60 & ((1::BIGINT << 50) - 1))) END) AS rnk
            FROM (SELECT event_type, date_trunc('day', ts) AS day,
                    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h60
                  FROM events $filter)
            GROUP BY ${if (grp == "'ALL'") "bucket" else grp + ", bucket"})
          ${if (grp == "'ALL'") "" else "GROUP BY " + grp})"""
      s"""
      WITH per_type AS (
        ${est("event_type",
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT event_type AS et, date_trunc('day', ts) FROM events) WHERE et = event_type)",
          "")}),
      all_row AS (
        ${est("'ALL'",
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT event_type, date_trunc('day', ts) FROM events))",
          "")})
      SELECT event_type, n_sketches,
        ROUND(CASE WHEN raw <= 2560.0 AND nz < 1024
                   THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / (1024 - nz))
                   ELSE raw END, 4) AS users_est
      FROM (SELECT * FROM per_type UNION ALL SELECT * FROM all_row)
      ORDER BY event_type"""
    },

    // d02's candidate generation without the τ filter, rolled up by the
    // exact 1/32-multiple estimate
    "d23_threshold_sweep" -> {
      val perms = hashA.zip(hashB).zipWithIndex
        .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")
      s"""
      WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(tl)-1),
          i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])) sl
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') tl FROM documents)
        WHERE len(tl) >= 3),
      toks AS (SELECT doc_id, unnest(sl) tok FROM sh),
      h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT hv FROM toks),
      perm(i, a, b) AS (VALUES $perms),
      sig AS (SELECT doc_id, i, min((hv * a + b) % ${Prime}) m
              FROM h CROSS JOIN perm GROUP BY 1, 2),
      sigl AS (SELECT doc_id, list(m ORDER BY i) sig FROM sig GROUP BY 1),
      bands AS (SELECT doc_id, sig, b, sig[b*4+1 : b*4+4] bkey
                FROM sigl CROSS JOIN range(0, ${Bands}) t(b)),
      cands AS (
        SELECT DISTINCT x.doc_id a, y.doc_id b, x.sig sa, y.sig sb
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT len(list_filter(range(1, ${MinhashK + 1}), i -> sa[i] = sb[i])) / ${MinhashK}.0
          AS est_jaccard,
        CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs
      FROM cands GROUP BY 1 ORDER BY 1"""
    },

    // same deletion-variant construction in SQL: string slicing is
    // byte-identical, levenshtein is the same DP distance in both engines
    "d22_entity_resolution" -> """
      WITH dirty AS (
        SELECT c_custkey AS dirty_key,
          c_name[1 : 9 + (c_custkey % 9)] || c_name[11 + (c_custkey % 9) :]
            AS dirty_name
        FROM customer),
      variants AS (
        SELECT c_custkey AS master_key, c_name,
          c_name[1 : 9 + i] || c_name[11 + i :] AS vkey
        FROM customer CROSS JOIN range(0, 9) t(i)),
      cands AS (
        SELECT DISTINCT dirty_key, dirty_name, master_key, c_name
        FROM dirty JOIN variants ON dirty_name = vkey
        WHERE levenshtein(dirty_name, c_name) = 1),
      best AS (
        SELECT dirty_key, CAST(COUNT(*) AS BIGINT) AS n_candidates,
          MIN(master_key) AS best_match
        FROM cands GROUP BY dirty_key)
      SELECT n_candidates, CAST(COUNT(*) AS BIGINT) AS n_dirty,
        CAST(SUM(CASE WHEN best_match = dirty_key THEN 1 ELSE 0 END) AS BIGINT)
          AS n_correct
      FROM best GROUP BY n_candidates ORDER BY n_candidates""",

    // Same MinHash replication as d02, split corpus (doc_id % 10 != 0)
    // vs delta (doc_id % 10 == 0): the incremental shape is corpus-bands
    // JOIN delta-bands instead of a self-join.
    "d18_incremental_dedup" -> {
      val perms = hashA.zip(hashB).zipWithIndex
        .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")
      s"""
      WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(tl)-1),
          i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])) sl
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') tl FROM documents)
        WHERE len(tl) >= 3),
      toks AS (SELECT doc_id, unnest(sl) tok FROM sh),
      h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT hv FROM toks),
      perm(i, a, b) AS (VALUES $perms),
      sig AS (SELECT doc_id, i, min((hv * a + b) % ${Prime}) m
              FROM h CROSS JOIN perm GROUP BY 1, 2),
      sigl AS (SELECT doc_id, list(m ORDER BY i) sig FROM sig GROUP BY 1),
      bands AS (SELECT doc_id, sig, b, sig[b*4+1 : b*4+4] bkey
                FROM sigl CROSS JOIN range(0, ${Bands}) t(b)),
      cands AS (
        SELECT DISTINCT d.doc_id new_doc, c.doc_id dup_of, d.sig sd, c.sig sc
        FROM bands c JOIN bands d
          ON c.b = d.b AND c.bkey = d.bkey
        WHERE c.doc_id % 10 <> 0 AND d.doc_id % 10 = 0)
      SELECT new_doc, dup_of,
        len(list_filter(range(1, ${MinhashK + 1}), i -> sd[i] = sc[i])) / ${MinhashK}.0
          AS est_jaccard
      FROM cands
      WHERE len(list_filter(range(1, ${MinhashK + 1}), i -> sd[i] = sc[i])) / ${MinhashK}.0 >= 0.5
      ORDER BY new_doc, dup_of"""
    },

    // SimHash: h = first-64-bits-of-md5 (UBIGINT ≡ the signed-long bit
    // pattern Spark holds), ±1 vote per bit, sign → fingerprint; 4 bands
    // of 16 bits generate candidates; hamming verified by bit_count(xor).
    "d03_simhash_pairs" -> """
      WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM documents),
      hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT hv FROM toks),
      votes AS (
        SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        FROM hs CROSS JOIN range(0, 64) t(j) GROUP BY 1, 2),
      fp AS (
        SELECT doc_id,
          bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f
        FROM votes GROUP BY 1),
      bands AS (SELECT doc_id, f, b, (f >> (b*16)) & 65535 bkey
                FROM fp CROSS JOIN range(0, 4) t(b)),
      cands AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b,
          CAST(bit_count(xor(x.f, y.f)) AS INTEGER) hamming
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b, hamming FROM cands
      WHERE hamming <= 8 ORDER BY doc_a, doc_b""",

    // 128-bit fingerprint (md5 bytes 0-7 / 8-15), Manku combination
    // banding on all C(8,2)=28 chunk pairs, hamming over both halves
    "d28_simhash_banded_scaled" -> """
      WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM documents),
      hs AS (SELECT doc_id,
        ('0x' || substr(md5(tok), 1, 16))::UBIGINT hv1,
        ('0x' || substr(md5(tok), 17, 16))::UBIGINT hv2 FROM toks),
      votes AS (
        SELECT doc_id, j,
          sum(CASE WHEN (hv1 >> j) & 1 = 1 THEN 1 ELSE -1 END) v1,
          sum(CASE WHEN (hv2 >> j) & 1 = 1 THEN 1 ELSE -1 END) v2
        FROM hs CROSS JOIN range(0, 64) t(j) GROUP BY 1, 2),
      fp AS (
        SELECT doc_id,
          bit_or(CASE WHEN v1 > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f1,
          bit_or(CASE WHEN v2 > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f2
        FROM votes GROUP BY 1),
      chunks AS (
        SELECT doc_id, f1, f2, k,
          CASE WHEN k < 4 THEN (f1 >> (k*16)) & 65535
               ELSE (f2 >> ((k-4)*16)) & 65535 END ck
        FROM fp CROSS JOIN range(0, 8) t(k)),
      bands AS (
        SELECT a.doc_id, a.f1, a.f2, a.k * 8 + b.k AS band,
          a.ck * 65536 + b.ck AS bkey
        FROM chunks a JOIN chunks b ON a.doc_id = b.doc_id AND a.k < b.k),
      cands AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b,
          CAST(bit_count(xor(x.f1, y.f1)) + bit_count(xor(x.f2, y.f2)) AS INTEGER) hamming
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b, hamming FROM cands
      WHERE hamming <= 16 ORDER BY doc_a, doc_b""",

    // Connected components over the d03 pair graph: transitive closure by
    // recursive CTE (UNION dedups, so it terminates), min reachable id =
    // the group label — exactly the fixpoint min-label propagation
    // computes.
    "d04_dup_groups" -> """
      WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM documents),
      hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT hv FROM toks),
      votes AS (
        SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        FROM hs CROSS JOIN range(0, 64) t(j) GROUP BY 1, 2),
      fp AS (
        SELECT doc_id,
          bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f
        FROM votes GROUP BY 1),
      bands AS (SELECT doc_id, f, b, (f >> (b*16)) & 65535 bkey
                FROM fp CROSS JOIN range(0, 4) t(b)),
      pairs AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.f, y.f)) <= 8),
      edges AS (SELECT doc_a a, doc_b b FROM pairs
                UNION SELECT doc_b a, doc_a b FROM pairs),
      nodes AS (
        SELECT doc_id FROM documents
        WHERE len(regexp_extract_all(lower(text), '\S+')) >= 1),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a)
      SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS dup_group
      FROM reach GROUP BY id ORDER BY doc_id""",

    // d04's CC chain + two rollups: per-cluster size, then the histogram
    "d17_dup_cluster_sizes" -> """
      WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM documents),
      hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT hv FROM toks),
      votes AS (
        SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        FROM hs CROSS JOIN range(0, 64) t(j) GROUP BY 1, 2),
      fp AS (
        SELECT doc_id,
          bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) f
        FROM votes GROUP BY 1),
      bands AS (SELECT doc_id, f, b, (f >> (b*16)) & 65535 bkey
                FROM fp CROSS JOIN range(0, 4) t(b)),
      pairs AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.f, y.f)) <= 8),
      edges AS (SELECT doc_a a, doc_b b FROM pairs
                UNION SELECT doc_b a, doc_a b FROM pairs),
      nodes AS (
        SELECT doc_id FROM documents
        WHERE len(regexp_extract_all(lower(text), '\S+')) >= 1),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id, min(r) AS lbl FROM reach GROUP BY id),
      sizes AS (SELECT lbl, COUNT(*) AS cluster_size FROM comp GROUP BY lbl)
      SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        COUNT(*) AS n_clusters,
        CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
      FROM sizes GROUP BY cluster_size ORDER BY cluster_size""",

    // same min-per-hash first occurrence, same |sources| rollup
    "d16_source_dup_rate" -> """
      WITH d AS (
        SELECT doc_id, source, length(text) AS len, md5(text) AS h
        FROM documents),
      fst AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h)
      SELECT d.source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN d.doc_id <> fst.keep_id THEN 1 ELSE 0 END)
          AS BIGINT) AS n_dups,
        CAST(SUM(CASE WHEN d.doc_id <> fst.keep_id THEN d.len ELSE 0 END)
          AS BIGINT) AS dup_bytes,
        ROUND(CAST(SUM(CASE WHEN d.doc_id <> fst.keep_id THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*), 6) AS dup_rate
      FROM d JOIN fst ON fst.h = d.h
      GROUP BY d.source ORDER BY d.source""",

    "d15_frequent_pairs" -> """
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      nb AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM li),
      pairs AS (
        SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS support
        FROM li a JOIN li b ON a.ok = b.ok
        WHERE a.pk < b.pk
        GROUP BY a.pk, b.pk
        HAVING COUNT(*) >= 2),
      item AS (SELECT pk, COUNT(*) AS cnt FROM li GROUP BY pk)
      SELECT p.p1, p.p2, p.support, i1.cnt AS n_p1, i2.cnt AS n_p2,
        ROUND(CAST(p.support AS DOUBLE) / i1.cnt, 6) AS confidence,
        ROUND(CAST(p.support AS DOUBLE) * nb.n_baskets / (i1.cnt * i2.cnt), 6) AS lift
      FROM pairs p
      JOIN item i1 ON i1.pk = p.p1
      JOIN item i2 ON i2.pk = p.p2
      CROSS JOIN nb
      ORDER BY p.support DESC, p.p1, p.p2
      LIMIT 50""",

    "d14_source_overlap" -> """
      WITH tok AS (
        SELECT source, regexp_extract_all(lower(text), '\S+') AS tk FROM documents),
      grams AS (
        SELECT DISTINCT source,
          ('0x' || substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 15))::BIGINT AS g
        FROM tok, UNNEST(generate_series(1, len(tk) - 12)) AS t(i)
        WHERE len(tk) >= 13),
      per AS (SELECT source, COUNT(*) AS n_grams FROM grams GROUP BY source),
      inter AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
        FROM grams a JOIN grams b USING (g)
        WHERE a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, n_common, pa.n_grams AS na, pb.n_grams AS nb,
        ROUND(CAST(n_common AS DOUBLE) / (pa.n_grams + pb.n_grams - n_common), 6) AS jaccard
      FROM inter
      JOIN per pa ON pa.source = src_a
      JOIN per pb ON pb.source = src_b
      ORDER BY src_a, src_b""",

    // 13-gram contamination rule recomputed verbatim: same tokenizer,
    // same window slice, same 60-bit md5-prefix gram key
    "d06_decontaminate" -> """
      WITH tok AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents),
      bench AS (
        SELECT DISTINCT ('0x' || substr(md5(array_to_string(tk[6:18], ' ')), 1, 15))::BIGINT AS g
        FROM tok WHERE doc_id % 20 = 0 AND len(tk) >= 18),
      grams AS (
        SELECT DISTINCT doc_id,
          ('0x' || substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 15))::BIGINT AS g
        FROM tok, UNNEST(generate_series(1, len(tk) - 12)) AS t(i)
        WHERE len(tk) >= 13)
      SELECT doc_id, COUNT(*) AS n_hit_grams
      FROM grams WHERE g IN (SELECT g FROM bench)
      GROUP BY doc_id ORDER BY doc_id""",

    // the Bloom filter changes no answers (false positives die in the
    // confirming join), so the oracle is the exact computation
    "d13_bloom_decontaminate" -> """
      WITH tok AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents),
      bench AS (
        SELECT DISTINCT ('0x' || substr(md5(array_to_string(tk[3:10], ' ')), 1, 15))::BIGINT AS g
        FROM tok WHERE doc_id % 25 = 0 AND len(tk) >= 10),
      grams AS (
        SELECT DISTINCT doc_id,
          ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))::BIGINT AS g
        FROM tok, UNNEST(generate_series(1, len(tk) - 7)) AS t(i)
        WHERE len(tk) >= 8)
      SELECT doc_id, COUNT(*) AS n_hit_grams
      FROM grams WHERE g IN (SELECT g FROM bench)
      GROUP BY doc_id ORDER BY doc_id""",

    // Mirrors the Spark plan: first-8 codebook, rounded-cosine argmax
    // cell assignment, in-cell pairwise cosine, drop-if-smaller-neighbor
    "d05_semdedup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
      assigned AS (SELECT cell, vec_id, v FROM (
          SELECT c.cent_id AS cell, e.vec_id, e.v,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
              ROUND(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*c.cv[i])) /
                (sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) *
                 sqrt(list_sum(list_transform(range(1, len(c.cv)+1), i -> c.cv[i]*c.cv[i])))), 4)
              DESC, c.cent_id) AS rk
          FROM e CROSS JOIN cents c)
        WHERE rk = 1),
      sims AS (
        SELECT a.cell, a.vec_id AS ai, b.vec_id AS bi,
          list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) /
            (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i]))) *
             sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))) AS c
        FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
      SELECT CAST(cell AS BIGINT) AS cell, bi AS removed_id,
        CAST(MIN(ai) AS BIGINT) AS kept_id, COUNT(*) AS n_near,
        ROUND(MAX(c), 4) AS max_sim
      FROM sims WHERE c >= 0.35
      GROUP BY cell, bi ORDER BY cell, removed_id""",

    // d05 with a corpus-proportional codebook: k = ceil(n/250) cells
    "d27_semdedup_scaled" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
        WHERE vec_id < (SELECT CAST(CEIL(COUNT(*) / 250.0) AS BIGINT) FROM e)),
      assigned AS (SELECT cell, vec_id, v FROM (
          SELECT c.cent_id AS cell, e.vec_id, e.v,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
              ROUND(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*c.cv[i])) /
                (sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) *
                 sqrt(list_sum(list_transform(range(1, len(c.cv)+1), i -> c.cv[i]*c.cv[i])))), 4)
              DESC, c.cent_id) AS rk
          FROM e CROSS JOIN cents c)
        WHERE rk = 1),
      sims AS (
        SELECT a.cell, a.vec_id AS ai, b.vec_id AS bi,
          list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) /
            (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i]))) *
             sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))) AS c
        FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
      SELECT CAST(cell AS BIGINT) AS cell, bi AS removed_id,
        CAST(MIN(ai) AS BIGINT) AS kept_id, COUNT(*) AS n_near,
        ROUND(MAX(c), 4) AS max_sim
      FROM sims WHERE c >= 0.35
      GROUP BY cell, bi ORDER BY cell, removed_id""",

    // Same 10-token windows, same 60-bit bigint span keys (md5-prefix
    // conv), same first-occurrence rule (min (doc_id, pos) per span);
    // short docs fold in with zero spans via the left join.
    "d07_span_dedup" -> """
      WITH tok AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') tk FROM documents),
      occ AS (
        SELECT doc_id, i AS pos,
          ('0x' || substr(md5(array_to_string(tk[i:i+9], ' ')), 1, 15))::BIGINT h
        FROM tok, UNNEST(generate_series(1, len(tk) - 9)) t(i)
        WHERE len(tk) >= 10),
      firsts AS (
        SELECT h, doc_id fd, pos fp FROM (
          SELECT h, doc_id, pos,
            ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) rn
          FROM occ) WHERE rn = 1),
      marked AS (
        SELECT o.doc_id, (o.doc_id, o.pos) <> (fs.fd, fs.fp) AS dup
        FROM occ o JOIN firsts fs ON o.h = fs.h),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_spans,
          CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        FROM marked GROUP BY doc_id)
      SELECT tok.doc_id,
        COALESCE(a.n_spans, 0) AS n_spans,
        COALESCE(a.n_dup_spans, 0) AS n_dup_spans,
        CASE WHEN COALESCE(a.n_spans, 0) > 0
          THEN ROUND(CAST(a.n_dup_spans AS DOUBLE) / a.n_spans, 4) ELSE 0.0 END AS dup_frac,
        (CASE WHEN COALESCE(a.n_spans, 0) > 0
          THEN ROUND(CAST(a.n_dup_spans AS DOUBLE) / a.n_spans, 4) ELSE 0.0 END) <= 0.2 AS keep
      FROM tok LEFT JOIN agg a ON tok.doc_id = a.doc_id
      ORDER BY tok.doc_id""",

    // DuckDB computes the same trigram-shingle jaccard; integer
    // intersection/union + one double division = engine-exact.
    "d01_jaccard_pairs" -> d01OracleSql,

    // precision/recall of the end-to-end MinHash detector (d02) against
    // the exact trigram-Jaccard ground truth (d01): both pipelines are
    // bit-reproduced in DuckDB above, so the confusion counts are exact
    "d19_lsh_quality" -> s"""
      WITH exact_pairs AS ($d01OracleSql),
      pred_pairs AS ($d02OracleSql),
      conf AS (
        SELECT
          CAST(SUM(CASE WHEN e.doc_a IS NOT NULL AND p.doc_a IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN e.doc_a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN p.doc_a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM exact_pairs e FULL OUTER JOIN pred_pairs p
          ON e.doc_a = p.doc_a AND e.doc_b = p.doc_b)
      SELECT tp, fp, fn,
        ROUND(CAST(tp AS DOUBLE) / (tp + fp), 4) AS prec,
        ROUND(CAST(tp AS DOUBLE) / (tp + fn), 4) AS rec
      FROM conf"""
  )

  /** d02's oracle, reusable as a CTE body (d19 audits it against d01). */
  private lazy val d02OracleSql: String = {
    val perms = hashA.zip(hashB).zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    s"""
      WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(tl)-1),
          i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])) sl
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') tl FROM documents)
        WHERE len(tl) >= 3),
      toks AS (SELECT doc_id, unnest(sl) tok FROM sh),
      h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT hv FROM toks),
      perm(i, a, b) AS (VALUES $perms),
      sig AS (SELECT doc_id, i, min((hv * a + b) % ${Prime}) m
              FROM h CROSS JOIN perm GROUP BY 1, 2),
      sigl AS (SELECT doc_id, list(m ORDER BY i) sig FROM sig GROUP BY 1),
      bands AS (SELECT doc_id, sig, b, sig[b*4+1 : b*4+4] bkey
                FROM sigl CROSS JOIN range(0, ${Bands}) t(b)),
      cands AS (
        SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b, x.sig sa, y.sig sb
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b,
        len(list_filter(range(1, ${MinhashK + 1}), i -> sa[i] = sb[i])) / ${MinhashK}.0
          AS est_jaccard
      FROM cands
      WHERE len(list_filter(range(1, ${MinhashK + 1}), i -> sa[i] = sb[i])) / ${MinhashK}.0 >= 0.5
      ORDER BY doc_a, doc_b"""
  }

  /** d01's oracle, reusable as a CTE body (d19 audits d02 against it). */
  private lazy val d01OracleSql: String = """
      WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(tl)-1),
          i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])) sl
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') tl FROM documents)
        WHERE len(tl) >= 3),
      toks AS (SELECT doc_id, unnest(sl) tok FROM sh),
      sizes AS (SELECT doc_id, len(sl) n FROM sh),
      inter AS (
        SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) i
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM (
        SELECT doc_a, doc_b,
          CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
        FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id)
      WHERE jac >= 0.5 ORDER BY doc_a, doc_b"""
}

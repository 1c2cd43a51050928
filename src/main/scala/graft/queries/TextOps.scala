package graft.queries

import graft.engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Text-analysis operators for training-data pipelines (builder-prompt
  * north star; reference analog: KB preprocessing at
  * mindsdb/interfaces/knowledge_base/preprocessing/document_preprocessor.py):
  * token counting (whitespace + BPE-ish regex), quality scoring
  * (length/punctuation/stopword ratios), language distribution, exact
  * fingerprinting (md5).
  *
  * All single-pass narrow transforms + one aggregation — at 100 TB these
  * are embarrassingly parallel scans; no shuffle except final group/sort.
  */
object TextOps extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** Oracle-side BPE training CTE chain (words → v0 → p/m/v rounds 1-3),
    * shared verbatim by the t23 and t25 oracles. MATERIALIZED throughout:
    * each round references its predecessor several times and DuckDB
    * would otherwise inline the chain exponentially. */
  private val bpeTrainCtes: String = {
    def round(r: Int): String = s"""
      p$r AS MATERIALIZED (
        SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS weight FROM (
          SELECT tk[i] AS a, tk[i + 1] AS b, cnt FROM (
            SELECT tk, cnt, unnest(range(1, len(tk))) AS i
            FROM (SELECT string_split(seq, ' ') AS tk, cnt FROM v${r - 1})))
        GROUP BY a, b),
      m$r AS MATERIALIZED (SELECT a, b, weight FROM p$r ORDER BY weight DESC, a, b LIMIT 1),
      v$r AS MATERIALIZED (
        SELECT trim(replace(' ' || seq || ' ',
          ' ' || m.a || ' ' || m.b || ' ', ' ' || m.a || m.b || ' ')) AS seq, cnt
        FROM v${r - 1}, m$r m)"""
    s"""WITH words AS MATERIALIZED (
        SELECT w, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
          FROM documents)
        WHERE LENGTH(w) >= 2
        GROUP BY w ORDER BY cnt DESC, w LIMIT 200),
      v0 AS MATERIALIZED (
        SELECT array_to_string(string_split(w, ''), ' ') || ' </w>' AS seq, cnt
        FROM words),
      ${(1 to 3).map(round).mkString(",")}"""
  }

  /** BPE merge training shared by t23 (the merge table) and t25 (corpus
    * tokenization): one corpus-scale word-count pass, then 3 merge
    * rounds over the top-200 word-frequency vocab. The learned merge is
    * a model artifact — driver-sized by definition. Returns
    * (round, left, right, weight) in learned order. */
  private def bpeMerges(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    val words = t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(200)
    var vocab = words.select(
      concat(concat_ws(" ", filter(split(col("w"), ""), x => x =!= "")),
        lit(" </w>")).as("seq"),
      col("cnt")).persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to 3) {
      val best = vocab
        .select(col("cnt"), split(col("seq"), " ").as("tk"))
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(tk)-2), i -> struct(tk[i] AS a, tk[i+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("a"), col("b")).limit(1)
        .collect()(0)
      val (a, b) = (best.getString(0), best.getString(1))
      merges += ((r, a, b, best.getLong(2)))
      val next = vocab.select(
        expr(s"trim(replace(concat(' ', seq, ' '), ' $a $b ', ' $a$b '))").as("seq"),
        col("cnt")).persist()
      vocab.unpersist()
      vocab = next
    }
    vocab.unpersist()
    merges.toSeq
  }

  private val stopwords = Seq("the", "a", "of", "and", "or", "is", "in", "to")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "t01_lang_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"),
          (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
        .orderBy(col("lang"))
    }),

    "t02_token_count" -> ((s, dir) => {
      // whitespace tokens + BPE-ish subword tokens (letter runs / digit
      // runs / single punctuation) — the two standard cheap token counters.
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .as("bpe_tokens"),
          length(col("text")).as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // training-mixture manifest (the static-mixing artifact a Pile-style
    // corpus build emits): per-source token counts vs TARGET mixture
    // weights → per-source sampling rates, normalized so the most
    // upsampled source samples at 1.0 (no silent repetition). Scale
    // shape: ONE combinable rollup of the corpus to |sources| rows; the
    // two normalizers are aggregates OF THAT ROLLUP broadcast back —
    // the corpus is scanned once, everything after is dimension-sized.
    "t29_mixture_manifest" -> ((s, dir) => {
      val stats = t(s, dir, "documents")
        .select(col("source"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long").as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
        // deterministic target weights from the source id (stands in for
        // the mixture config a pipeline would broadcast)
        .withColumn("w", regexp_extract(col("source"), "\\d+", 0).cast("long") + 1)
      val tot = stats.agg(sum(col("tokens")).cast("double").as("tot_toks"),
        sum(col("w")).cast("double").as("tot_w"))
      val scored = stats.crossJoin(broadcast(tot))
        .withColumn("token_share", col("tokens").cast("double") / col("tot_toks"))
        .withColumn("target_share", col("w").cast("double") / col("tot_w"))
        .withColumn("raw_rate", col("target_share") / col("token_share"))
      val mx = scored.agg(max(col("raw_rate")).as("mx"))
      scored.crossJoin(broadcast(mx))
        // expected_tokens derives from the ALREADY-ROUNDED rate: the 6dp
        // round pins both engines to the identical double before the
        // multiply, so the final 1dp round cannot straddle a boundary
        .withColumn("rate", round(col("raw_rate") / col("mx"), 6))
        .select(col("source"), col("n_docs"), col("tokens"),
          round(col("target_share"), 6).as("target_share"),
          col("rate").as("sampling_rate"),
          round(col("tokens") * col("rate"), 1).as("expected_tokens"))
        .orderBy(col("source"))
    }),

    "t03_quality_score" -> ((s, dir) => {
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val stopArr = array(stopwords.map(lit): _*)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          toks.as("toks"),
          length(col("text")).as("n_chars"),
          length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).as("n_punct"),
          length(regexp_replace(col("text"), "\\s", "")).as("n_nonspace"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("toks")).as("n_tokens"),
          (col("n_punct").cast(DoubleType) / col("n_chars")).as("punct_ratio"),
          (size(filter(col("toks"), x => array_contains(stopArr, x))).cast(DoubleType) /
            size(col("toks"))).as("stopword_ratio"),
          (col("n_nonspace").cast(DoubleType) /
            size(col("toks"))).as("avg_token_len"))
        .orderBy(col("doc_id"))
    }),

    "t04_fingerprint_md5" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("fp"),
          md5(concat_ws(" ", col("lang"), col("source"), col("text"))).as("keyed_fp"))
        .orderBy(col("doc_id"))
    }),

    "t05_exact_dedup" -> ((s, dir) => {
      // exact dedup: hash-groupBy on content fingerprint, keep min doc_id.
      // At scale: one shuffle on the 128-bit hash, no text comparison.
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_doc_id"))
    }),

    // ---- per-source TOKEN BUDGET: the capacity report a pipeline owner
    // reads before mixing sources — raw docs/tokens per source and what
    // survives exact dedup, with the duplicated-token rate. First
    // occurrence is d07's map-side-combinable min(struct) per content
    // hash (never a window over hot hashes); two combinable rollups +
    // one |sources| join.
    "t30_token_budget" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        md5(col("text")).as("h"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast(LongType).as("ntok"))
      val raw = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      val kept = d
        .groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("source"), col("ntok"))).as("keep"))
        .select(col("keep.source").as("source"), col("keep.ntok").as("ntok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_unique_docs"), sum(col("ntok")).as("n_unique_tokens"))
      raw.join(kept, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_unique_docs"), col("n_unique_tokens"),
          round(lit(1.0) - col("n_unique_tokens").cast(DoubleType) / col("n_tokens"), 4)
            .as("dup_token_rate"))
        .orderBy(col("source"))
    }),

    "t07_winnowing" -> ((s, dir) => {
      // MOSS-style winnowing fingerprint: 5-gram polynomial rolling hash
      // (base 31, exact in 64-bit — no modulus needed at this k) → min
      // hash per 4-window → distinct sorted set is the fingerprint. All
      // narrow per-row array ops; the only shuffle is the final sort.
      // Output keeps the set as an md5 signature (array columns don't
      // hash-compare cleanly across engines).
      // one O(n) rolling pass per row (RollingHashGrams), bit-identical
      // to the oracle's per-gram polynomial sum; window minima via the
      // O(n) monotonic-deque SlidingWindowMin (short arrays pass through,
      // matching the oracle's CASE len >= 4 branch)
      val hashes = graft.functions.VectorFunctions.rollingHashGrams(col("text"), 5, 31L)
      val mins = array_sort(array_distinct(
        graft.functions.VectorFunctions.slidingWindowMin(col("hashes"), 4)))
      t(s, dir, "documents")
        .withColumn("hashes", hashes)
        .withColumn("fp", mins)
        .select(col("doc_id"),
          size(col("hashes")).as("n_grams"),
          size(col("fp")).as("n_fp"),
          md5(array_join(transform(col("fp"), _.cast("string")), ",")).as("fp_sig"))
        .orderBy(col("doc_id"))
    }),

    "t08_prep_pipeline" -> ((s, dir) => {
      // the canonical training-data prep DAG, end to end: language +
      // quality gate (narrow scan) → exact dedup (one hash shuffle) →
      // near-dup keep-smallest over SimHash pairs (banded join among
      // survivors only) → deterministic hash sampling (narrow) → corpus
      // stats. Every stage is the scale shape already proven by its
      // standalone operator (t05, d03); composing them shares one scan.
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val filtered = t(s, dir, "documents")
        .withColumn("n_tokens", size(toks).cast(LongType))
        .filter(col("lang").isin("en", "de", "fr") && col("n_tokens") >= 30)
      val keepExact = filtered
        .groupBy(md5(col("text")).as("fp")).agg(min(col("doc_id")).as("doc_id"))
      val exact = filtered.join(keepExact.select("doc_id"), Seq("doc_id"), "left_semi")
      // keep-smallest near-dup policy: any doc paired with a smaller id drops
      val dropped = graft.queries.Dedup
        .simhashPairs(exact.select(col("doc_id"), col("text")), maxHamming = 8, md5Hash = true)
        .select(col("doc_b").as("doc_id")).distinct()
      val canonical = exact.join(dropped, Seq("doc_id"), "left_anti")
      val sampled = canonical.filter(
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast(LongType) % 10 < 8)
      sampled.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"))
        .orderBy(col("lang"))
    }),

    "t09_repetition_stats" -> ((s, dir) => {
      // Gopher-style repetition filters (Rae et al. 2021 §A1.1): fraction
      // of tokens taken by the most frequent word, duplicate-2gram
      // fraction, top-2gram fraction. All per-row array work — a narrow
      // scan with NO shuffle (the corpus-wide groupBy-explode
      // formulation shuffles every token; per-row higher-order functions
      // keep it embarrassingly parallel, the 100 TB shape). The top
      // count is a run-length fold over the SORTED array — O(n log n)
      // per row (the transform-filter-per-distinct-token formulation is
      // O(n·distinct) and measured 4x slower at sf0.1).
      def maxRun(sortedArr: Column): Column =
        aggregate(sortedArr,
          struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (st, x) => {
            val run = when(x === st.getField("prev"), st.getField("run") + 1L)
              .otherwise(lit(1L))
            struct(x.as("prev"), run.as("run"),
              greatest(st.getField("best"), run).as("best"))
          },
          st => st.getField("best"))
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      t(s, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("toks"),
          size(col("toks")).as("n_tokens"),
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1))).as("g2"))
        .select(col("doc_id"), col("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          maxRun(array_sort(col("toks"))).as("top_word_n"),
          size(col("g2")).as("n_2grams"),
          size(array_distinct(col("g2"))).as("n_distinct_2grams"),
          maxRun(array_sort(col("g2"))).as("top_2gram_n"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(col("top_word_n").cast(DoubleType) / col("n_tokens"), 4)
            .as("top_word_frac"),
          round(lit(1.0) - col("n_distinct_2grams").cast(DoubleType) / col("n_2grams"), 4)
            .as("dup_2gram_frac"),
          round(col("top_2gram_n").cast(DoubleType) / col("n_2grams"), 4)
            .as("top_2gram_frac"))
        .withColumn("repetitive",
          col("top_word_frac") > 0.2 || col("dup_2gram_frac") > 0.6)
        .orderBy(col("doc_id"))
    }),

    "t10_pii_redact" -> ((s, dir) => {
      // PII detection + redaction over a deterministically-augmented
      // corpus (the synthetic docs carry no PII, so each doc gets a
      // derived email/phone/IP appended — both engines build the same
      // string). Three regex passes, counts before redaction, fingerprint
      // after. Narrow scan, no shuffle.
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1 [0-9]{3}-[0-9]{4}"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com call +1 555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".0.77")).as("aug"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(phone), lit(0))).as("n_phones"),
          size(regexp_extract_all(col("aug"), lit(ip), lit(0))).as("n_ips"),
          md5(regexp_replace(regexp_replace(regexp_replace(col("aug"),
            email, "[EMAIL]"), phone, "[PHONE]"), ip, "[IP]")).as("redacted_fp"))
        .orderBy(col("doc_id"))
    }),

    "t11_sequence_packing" -> ((s, dir) => {
      // Sequence packing for LLM training: docs concatenated in doc_id
      // order and split at a fixed token budget; each doc belongs to the
      // bin where it STARTS. The cumulative token offset is a distributed
      // two-level prefix sum — per-bucket window partials plus a
      // driver-small bucket-offset frame joined back broadcast — NOT one
      // global unpartitioned window (which would funnel 100 TB through a
      // single task).
      val budget = 2048L
      val w = org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents").select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast(LongType).as("n_tok"),
        (col("doc_id") / 100).cast(LongType).as("bucket"))
      val wIn = w.partitionBy(col("bucket")).orderBy(col("doc_id"))
      val partial = d.withColumn("cum_in", sum(col("n_tok")).over(wIn))
      // one row per bucket — broadcast scale regardless of corpus size
      val offsets = d.groupBy(col("bucket")).agg(sum(col("n_tok")).as("btok"))
        .withColumn("offset", coalesce(sum(col("btok")).over(
          w.orderBy(col("bucket")).rowsBetween(Long.MinValue, -1)), lit(0L)))
        .select(col("bucket"), col("offset"))
      partial.join(broadcast(offsets), Seq("bucket"))
        .withColumn("start_tok", col("offset") + col("cum_in") - col("n_tok"))
        .withColumn("bin_id", floor(col("start_tok") / budget))
        .groupBy(col("bin_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("bin_id"))
    }),

    // CCNet-style LM quality scoring (Wenzek et al. 2020 uses a KenLM
    // 5-gram; same pipeline shape here with a char-bigram LM trained
    // on the corpus itself): (1) ONE aggregation pass builds the
    // add-one-smoothed bigram model — the model is at most |alphabet|²
    // rows no matter the corpus size, so it BROADCASTS; (2) a second
    // pass scores every document against it map-side; the only
    // corpus-sized shuffle is the per-doc (doc_id, bigram) partial-agg
    // combine. Perplexity = exp(avg −ln P(c2|c1)). Per-term nll is
    // rounded at 9dp and summed as DECIMAL so the float sum is
    // order-independent and the oracle hash-matches.
    "t12_ngram_perplexity" -> ((s, dir) => {
      import graft.functions.VectorFunctions.charNGrams
      import org.apache.spark.sql.types.DecimalType
      val norm = regexp_replace(lower(col("text")), "\\s+", " ")
      val dc = t(s, dir, "documents")
        .select(col("doc_id"), explode(charNGrams(norm, 2)).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      val lm = dc.groupBy(col("bg")).agg(sum(col("cnt")).as("n"))
      val ctx = lm.groupBy(substring(col("bg"), 1, 1).as("c1")).agg(sum(col("n")).as("nc"))
      val v = ctx.agg(count(lit(1)).cast(DoubleType).as("v"))
      val p = lm.withColumn("c1", substring(col("bg"), 1, 1))
        .join(ctx, "c1").crossJoin(broadcast(v))
        .select(col("bg"),
          round(-log((col("n") + 1.0) / (col("nc") + col("v"))), 9).as("nll"))
      dc.join(broadcast(p), Seq("bg"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).cast(LongType).as("n_bigrams"),
          sum((col("cnt") * col("nll")).cast(DecimalType(28, 10))).as("tot"))
        .select(col("doc_id"), col("n_bigrams"),
          round(exp(col("tot").cast(DoubleType) / col("n_bigrams")), 4).as("ppl"))
        .orderBy(col("doc_id"))
    }),

    // Temperature-based domain mixing (the multilingual-corpus
    // reweighting rule, α = 0.5: sample shares ∝ √size, flattening head
    // domains and boosting tail ones), executed as DETERMINISTIC hash
    // sampling: per-stratum keep-rates become integer md5 thresholds, so
    // the same doc set is chosen on every run, every engine, and every
    // cluster size — no RNG state, no seed-per-partition coupling. The
    // stratum table is a tiny aggregate that BROADCASTS; the corpus pass
    // is a map-side filter. √-weights are summed as DECIMAL so the
    // normalizer is order-independent.
    "t13_domain_mix" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val docs = t(s, dir, "documents")
      val strata = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", sqrt(col("n_docs").cast(DoubleType)).cast(DecimalType(18, 6)))
      val tot = strata.agg(sum(col("w")).as("tw"))
      val rates = strata.crossJoin(broadcast(tot))
        .withColumn("rate",
          least(lit(1.0), lit(300.0) * (col("w").cast(DoubleType) / col("tw").cast(DoubleType))
            / col("n_docs")))
        .withColumn("thr", floor(col("rate") * 1000).cast(LongType))
        .select(col("source"), col("n_docs"), col("thr"))
      val hash = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast(LongType) % 1000
      val sampled = docs.join(broadcast(rates.select("source", "thr")), Seq("source"))
        .filter(hash < col("thr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sampled_chars"))
      rates.join(sampled, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("thr"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("sampled_chars"), lit(0L)).as("sampled_chars"))
        .orderBy(col("source"))
    }),

    // CCNet-style duplicated-segment removal (Wenzek et al. 2020 dedup
    // paragraphs by hash across shards; C4 drops any three-sentence span
    // seen twice). Docs here are single-line, so the "paragraph" unit is
    // a non-overlapping 10-token segment. Shape: explode segments → ONE
    // shuffle on the segment hash to count distinct docs → inner join
    // marks duplicated segments (NOT a broadcast — at 100 TB the dup set
    // is corpus-sized) → per-doc reassembly keyed by segment index. The
    // kept-text fingerprint makes the removal content-verifiable.
    "t14_segment_dedup" -> ((s, dir) => {
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      // size>0 guard: sequence(0, -1) would default to step -1 and emit
      // two phantom segments for a zero-token doc (DuckDB's
      // generate_series(0,-1) is empty — results would diverge)
      val segs = t(s, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), ceil(size(col("toks")) / lit(10.0)).cast(IntegerType) - 1),
            i => concat_ws(" ", slice(col("toks"), i * 10 + 1, lit(10))))))
        .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
        .withColumn("h", conv(substring(md5(col("seg")), 1, 15), 16, 10).cast(LongType))
      val counts = segs.select(col("h"), col("doc_id")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      segs.join(counts, Seq("h"))
        .withColumn("dup", col("n_docs") >= 2)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast(LongType).as("n_segs"),
          sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_segs"),
          md5(array_join(transform(
            array_sort(collect_list(when(!col("dup"),
              struct(col("seg_idx"), col("seg"))))),
            st => st.getField("seg")), " ")).as("kept_fp"))
        .orderBy(col("doc_id"))
    }),

    // DSIR data selection (Xie et al. 2023): importance weight of each
    // document = sum over tokens of the log-ratio between a TARGET
    // hashed-unigram distribution (here: docs from src0) and the RAW
    // corpus distribution, both add-one smoothed over 1024 hash buckets.
    // Scale shape: the two bucket tables are ≤1024 rows regardless of
    // corpus size → broadcast; scoring is a map-side join over per-doc
    // bucket counts (partial-agg combine is the only corpus shuffle).
    // Per-token log-ratios are rounded at 9dp and summed as DECIMAL so
    // the result is order-independent and hash-matches the oracle.
    "t15_dsir_weights" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val bucket = (c: Column) =>
        conv(substring(md5(c), 1, 8), 16, 10).cast(LongType) % 1024
      val tokTable = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), explode(toks).as("tok"))
        .select(col("doc_id"), col("source"), bucket(col("tok")).as("b"))
      val dc = tokTable.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
      val tgt = tokTable.filter(col("source") === "src0")
        .groupBy(col("b")).agg(count(lit(1)).as("ct"))
      val raw = tokTable.groupBy(col("b")).agg(count(lit(1)).as("cr"))
      val tTot = tgt.agg(sum(col("ct")).as("nt"))
      val rTot = raw.agg(sum(col("cr")).as("nr"))
      val llr = raw.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
        .select(col("b"), round(
          log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("nt") + 1024.0)) -
            log((col("cr") + 1.0) / (col("nr") + 1024.0)), 9).as("llr"))
      dc.join(broadcast(llr), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).cast(LongType).as("n_tok"),
          sum((col("cnt") * col("llr")).cast(DecimalType(28, 10))).as("w"))
        .select(col("doc_id"), col("n_tok"),
          round(col("w").cast(DoubleType) / col("n_tok"), 6).as("avg_llr"))
        .withColumn("keep", col("avg_llr") > 0)
        .orderBy(col("doc_id"))
    }),

    // C4-style heuristic quality filters (Raffel et al. 2020 §2.2,
    // adapted to this corpus): per-doc rule flags — bad-word blocklist
    // hits, boilerplate markers (lorem ipsum / braces), minimum token
    // count, terminal punctuation — plus the keep verdict and per-source
    // keep rates. Pure narrow scan; the only shuffle is the final
    // per-source rollup, so the filter is a map-side gate at any corpus
    // size (the C4 pipeline shape).
    "t16_c4_filters" -> ((s, dir) => {
      val badwords = array(Seq("slow", "error").map(lit): _*)
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val flags = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), toks.as("toks"), col("text"))
        .select(col("doc_id"), col("source"),
          size(col("toks")).as("n_tokens"),
          size(filter(col("toks"), x => array_contains(badwords, x)))
            .as("badword_hits"),
          col("text").contains("lorem ipsum").as("has_lorem"),
          col("text").contains("{").as("has_brace"),
          col("text").rlike("[.!?\"]$").as("terminal_punct"))
        .withColumn("keep",
          col("n_tokens") >= 20 && col("badword_hits") <= 2 &&
            !col("has_lorem") && !col("has_brace"))
      flags.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("badword_hits").cast(LongType)).as("total_badwords"),
          sum(when(col("terminal_punct"), 1L).otherwise(0L)).as("n_terminal"))
        .orderBy(col("source"))
    }),

    // Corpus vocabulary statistics: the token-frequency pass every LM
    // data pipeline runs before tokenizer training / Zipf sanity checks.
    // One explode + one hash aggregation (map-side combinable); the
    // result is vocabulary-sized. Reports the top-10 tokens with ranks
    // plus corpus-level type/token counts and the hapax (frequency-1)
    // share of the vocabulary.
    // TF-IDF keyword extraction: corpus document frequencies from the
    // same (doc, term) aggregate that feeds per-doc TF (one explode, two
    // map-side-combinable aggregations), doc count as a broadcast
    // scalar, top-3 terms per doc by score with a total tie order. The
    // per-doc window partitions by doc_id — bounded by document length,
    // never corpus size.
    // Per-source distribution shift: KL(source ‖ corpus) over unigram
    // distributions — the domain-drift / mixture-health metric a
    // training-data pipeline tracks per ingest source (the corpus-level
    // sibling of m12's feature-drift PSI). One explode + two combinable
    // aggregations; source totals and the corpus scalar broadcast back;
    // per-term contributions round at 9dp and sum as DECIMAL (t12's
    // order-independence rule) so the hash matches at any partitioning.
    // lexical diversity by source (type-token ratio — the vocabulary-
    // richness signal next to t24's KL drift): one tokenizing explode,
    // then a per-source exact distinct + count; the division is one
    // rounded ratio of two exact integers.
    "t28_type_token_ratio" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      toks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_types"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast(DoubleType) / col("n_tokens"), 6).as("ttr"))
        .orderBy(col("source"))
    }),

    // canary-string decontamination scan (the GPT-3 App.C / canary-token
    // approach beside d06's 13-gram matching: known sentinel strings
    // grep'd verbatim): the canary list broadcasts as literals, matching
    // is map-side substring containment, counts combine — one scan for
    // the whole list at any corpus size.
    "t27_canary_scan" -> ((s, dir) => {
      val canaries = Seq("spark batch window", "filter join scan", "canary-zzz-000")
      val d = t(s, dir, "documents")
      val flags = canaries.zipWithIndex.map { case (c, i) =>
        sum(when(col("text").contains(c), 1L).otherwise(0L)).as(s"c$i")
      }
      d.agg(flags.head, flags.tail: _*)
        .select(explode(array(canaries.zipWithIndex.map { case (c, i) =>
          struct(lit(c).as("canary"), col(s"c$i").as("n_docs"))
        }: _*)).as("r"))
        .select(col("r.canary").as("canary"), col("r.n_docs").as("n_docs"))
        .orderBy(col("canary"))
    }),

    // filter-funnel waterfall (the ablation table every corpus paper
    // publishes — RefinedWeb Tab.2 / Gopher App.A shape): sequential
    // survival counts through length → digit-ratio → uppercase-ratio →
    // exact-dedup stages. All scalar rules are map-side flags summed in
    // ONE conditional aggregation; the dedup stage is the combinable
    // min-per-hash + semi-join shape (d07's skew-safe first-occurrence),
    // so no stage re-scans the corpus.
    "t26_filter_funnel" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("len", length(col("text")))
        .withColumn("f1", col("len") >= 100)
        .withColumn("f2",
          length(regexp_replace(col("text"), "[^0-9]", "")).cast(DoubleType) /
            col("len") < 0.2)
        .withColumn("f3",
          length(regexp_replace(col("text"), "[^A-Z]", "")).cast(DoubleType) /
            col("len") < 0.5)
      val s3 = d.filter(col("f1") && col("f2") && col("f3"))
        .withColumn("h", md5(col("text")))
      val first = s3.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
      val survivors = s3.join(first,
        s3("h") === first("h") && s3("doc_id") === first("keep_id"), "left_semi")
      val counts = d.agg(
        count(lit(1)).as("n0"),
        sum(when(col("f1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("f1") && col("f2") && col("f3"), 1L).otherwise(0L)).as("n3"))
      counts.crossJoin(survivors.agg(count(lit(1)).as("n4")))
        .select(explode(array(
          struct(lit(1).as("stage_no"), lit("input").as("stage"), col("n0").as("n")),
          struct(lit(2).as("stage_no"), lit("min_length").as("stage"), col("n1").as("n")),
          struct(lit(3).as("stage_no"), lit("digit_ratio").as("stage"), col("n2").as("n")),
          struct(lit(4).as("stage_no"), lit("uppercase_ratio").as("stage"), col("n3").as("n")),
          struct(lit(5).as("stage_no"), lit("exact_dedup").as("stage"), col("n4").as("n"))))
          .as("r"))
        .select(col("r.stage_no").cast(IntegerType).as("stage_no"),
          col("r.stage").as("stage"), col("r.n").as("n_surviving"))
        .orderBy(col("stage_no"))
    }),

    "t24_source_divergence" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val tf = t(s, dir, "documents")
        .select(col("source"), explode(toks).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      val srcTot = tf.groupBy(col("source")).agg(sum(col("n")).as("ns"))
      val corp = tf.groupBy(col("tok")).agg(sum(col("n")).as("nc"))
      val corpTot = corp.agg(sum(col("nc")).as("nt"))
      tf.join(srcTot, Seq("source")).join(corp, Seq("tok"))
        .crossJoin(broadcast(corpTot))
        .select(col("source"), col("ns"),
          round((col("n") / col("ns")) *
            log((col("n") * col("nt")) / (col("ns") * col("nc"))), 9).as("contrib"))
        .groupBy(col("source"))
        .agg(max(col("ns")).cast(LongType).as("n_tokens"),
          sum(col("contrib").cast(DecimalType(28, 10))).as("tot"))
        .select(col("source"), col("n_tokens"),
          round(col("tot").cast(DoubleType), 6).as("kl"))
        .orderBy(col("source"))
    }),

    // BPE tokenizer-merge training (Sennrich et al. 2016), distributed
    // form: ONE corpus-scale pass builds the word-frequency table, then
    // every merge round runs on the model-sized vocab (top-200 words
    // under a total order) — pair counting is an explode + map-side-
    // combinable weighted count, the argmax merge rule is the learned
    // artifact (driver-sized by definition), and merge application is a
    // literal token-boundary replace. At 100 TB only the first pass
    // touches the corpus; rounds never do. Merge application is
    // left-to-right non-overlapping (Java/DuckDB replace semantics —
    // immediately-adjacent repeats of the just-merged pair defer to the
    // next round); both engines share those semantics exactly.
    "t23_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      bpeMerges(s, dir).toDF("round", "a", "b", "weight").orderBy(col("round"))
    }),

    // BPE APPLICATION (the other half of t23's training): tokenize the
    // whole corpus with the learned merges and report per-source
    // compression. The scale trick is the same one training uses: merges
    // apply per DISTINCT (source, word) — vocabulary-sized work — and
    // occurrence counts weight the totals, so the corpus is touched by
    // exactly one word-count pass regardless of merge count.
    "t25_bpe_tokenize" -> ((s, dir) => {
      val merges = bpeMerges(s, dir)
      val words = t(s, dir, "documents")
        .select(col("source"), explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("s", concat(
          concat_ws(" ", filter(split(col("w"), ""), x => x =!= "")), lit(" </w>")))
      val applied = merges.foldLeft(words) { case (df, (_, a, b, _)) =>
        df.withColumn("s",
          expr(s"trim(replace(concat(' ', s, ' '), ' $a $b ', ' $a$b '))"))
      }
      applied.groupBy(col("source")).agg(
          sum(col("cnt")).cast(LongType).as("n_words"),
          sum((length(col("w")) + 1) * col("cnt")).cast(LongType).as("n_char_tokens"),
          sum(size(split(col("s"), " ")) * col("cnt")).cast(LongType).as("n_bpe_tokens"))
        .select(col("source"), col("n_words"), col("n_char_tokens"), col("n_bpe_tokens"),
          round(col("n_char_tokens").cast(DoubleType) / col("n_bpe_tokens"), 6)
            .as("compression"))
        .orderBy(col("source"))
    }),

    "t22_tfidf_keywords" -> ((s, dir) => {
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(toks).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = t(s, dir, "documents").groupBy().agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf").cast(DoubleType) *
            log(col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), round(col("score"), 4).as("score"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    "t17_vocab_stats" -> ((s, dir) => {
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val tf = t(s, dir, "documents")
        .select(explode(toks).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      val totals = tf.agg(
        sum(col("tf")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
      val top = tf.orderBy(col("tf").desc, col("tok")).limit(10)
        .withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("tf").desc, col("tok"))))
      top.crossJoin(broadcast(totals))
        .select(col("rank"), col("tok"), col("tf"),
          round(col("tf").cast(DoubleType) / col("n_tokens"), 6).as("tok_share"),
          col("n_tokens"), col("n_types"), col("n_hapax"),
          round(col("n_hapax").cast(DoubleType) / col("n_types"), 6).as("hapax_ratio"))
        .orderBy(col("rank"))
    }),

    // Stratified train/val/test split: within each language stratum,
    // docs land in 80/10/10 splits by deterministic md5-hash thresholds —
    // the same doc goes to the same split on every run, engine, and
    // cluster size (no RNG state, the t13 sampling discipline). Narrow
    // map + one rollup shuffle; the split column composes with any
    // downstream pipeline stage.
    "t18_stratified_split" -> ((s, dir) => {
      val h = conv(substring(md5(concat(col("lang"), lit(":"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast(LongType) % 100
      t(s, dir, "documents")
        .withColumn("split",
          when(h < 80, "train").when(h < 90, "val").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("split"))
    }),

    // Length-bucketed batching efficiency: docs bucket to the next
    // power-of-two token length (the standard padded-batch discipline);
    // per bucket: doc count, real tokens, padded tokens (n_docs ×
    // bucket size), and the padding-waste share — the number a training
    // pipeline reads to pick bucket boundaries. Pure map + one
    // combinable rollup; no shuffle beyond the aggregation.
    "t20_padding_waste" -> ((s, dir) => {
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val n = size(toks).cast(LongType)
      // next power of two ≥ n via the bin-string bit trick (1 <<
      // bitlength(n-1)) — integer-exact on both engines, where a
      // float 2^ceil(log2(n)) risks an ulp tie on exact powers of two
      t(s, dir, "documents")
        .select(col("doc_id"), n.as("n_tok"))
        .withColumn("bucket", when(col("n_tok") <= 1, col("n_tok"))
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n_tok - 1)) AS INT))")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("real_tokens"),
          (count(lit(1)) * first(col("bucket"))).as("padded_tokens"))
        .withColumn("waste_frac", when(col("padded_tokens") > 0,
          round(lit(1.0) - col("real_tokens").cast(DoubleType) / col("padded_tokens"), 4))
          .otherwise(0.0))
        .orderBy(col("bucket"))
    }),

    // Deterministic weighted sampling for training-data mixing: Poisson
    // (per-doc Bernoulli) inclusion with probability ∝ min(n_chars, 512)
    // × a per-language upweight (en 1×, zh 8×, others 4× — the
    // low-resource upsampling knob; probabilities ≥ 1 saturate to
    // always-include), decided by an exact integer test on the doc's
    // 60-bit md5 key. No RNG state, no floats in the selection: the
    // Efraimidis–Spirakis u^(1/w) key was rejected because pow() ulp
    // differences across engines can flip a marginal selection, while
    // an integer compare cannot. Inclusion is a pure per-row map —
    // deterministic under any partitioning, re-runnable byte-for-byte,
    // and the only shuffle is the final combinable per-language rollup.
    "t21_weighted_sample" -> ((s, dir) => {
      val h60 = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast(LongType)
      val mult = when(col("lang") === "en", 1L)
        .when(col("lang") === "zh", 8L).otherwise(4L)
      t(s, dir, "documents")
        .select(col("lang"), col("n_chars"),
          ((h60 % 2048) < least(col("n_chars"), lit(512L)) * mult).as("picked"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("picked"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("picked"), col("n_chars")).otherwise(0L)).as("sampled_chars"),
          // tie-safe rounding spelling (exact rational n/d can land on a
          // .00005 boundary, where HALF_UP and half-even disagree)
          (floor(sum(when(col("picked"), 1L).otherwise(0L)) * lit(1.0)
            / count(lit(1)) * lit(1e4) + lit(0.5)) / lit(1e4)).as("frac"))
        .orderBy(col("lang"))
    }),

    // Novelty / memorization profiling: per doc, the fraction of its
    // 8-gram spans already seen in any EARLIER doc (doc_id order = the
    // ingestion order). High repeat share = memorized/boilerplate
    // content — the complement of d07's span dedup, reported as a score
    // instead of a drop set. Shape: explode spans → min-doc per span
    // hash (one map-side-combinable shuffle) → join back on the hash →
    // per-doc reagg. Spans travel as 60-bit bigints (md5-prefix conv —
    // 8-byte shuffle keys, not 32-byte hex strings), never strings.
    "t19_novelty_scan" -> ((s, dir) => {
      val n = 8
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      val spans = t(s, dir, "documents")
        .select(col("doc_id"), toks.as("tk"))
        .filter(size(col("tk")) >= n)
        .select(col("doc_id"), explode(
          graft.functions.VectorFunctions.md5SpanHashes(col("tk"), n)).as("h"))
      val firstSeen = spans.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      spans.join(firstSeen, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast(LongType).as("n_spans"),
          sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_repeated"))
        .select(col("doc_id"), col("n_spans"), col("n_repeated"),
          round(lit(1.0) - col("n_repeated").cast(DoubleType) / col("n_spans"), 6)
            .as("novelty"))
        .orderBy(col("doc_id"))
    }),

    "t06_lang_id" -> ((s, dir) => {
      // n-gram language-ID: character-trigram profiles built from a
      // labeled slice (top-20 trigrams per language — a SMALL aggregate),
      // broadcast against a narrow scoring scan over the rest; prediction
      // = argmax profile overlap. The scale shape: profile build touches
      // the training slice once, scoring is an embarrassingly parallel
      // map with a 5-row broadcast. Output = confusion matrix vs labels.
      // (On this synthetic corpus text is language-independent, so the
      // matrix shows near-uniform confusion — the operator contract is
      // the deterministic scoring, verified by the oracle.)
      val docs = t(s, dir, "documents")
      // native CharNGrams: one pass per row (the transform+substr
      // formulation re-reads the string once per position); empty for
      // length<3, matching DuckDB's end-exclusive range
      val tris = (c: org.apache.spark.sql.Column) =>
        graft.functions.VectorFunctions.charNGrams(c, 3)
      val train = docs.filter(col("doc_id") < 250)
        .select(col("lang"), explode(tris(lower(col("text")))).as("tri"))
        .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("n"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("tri"))
      val profiles = train
        .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= 20)
        .groupBy(col("lang").as("plang"))
        .agg(sort_array(collect_list(col("tri"))).as("profile"))
      // per-doc argmax via a map-side-combinable min(struct(-score,
      // plang)) — the same (score desc, plang asc) winner the previous
      // per-doc_id window produced. The |langs|-way broadcast expansion
      // stays whole-stage-codegen (array_intersect loses its codegen
      // inside higher-order-function lambdas — the inline-array variant
      // measured ~1.4× slower); partial aggregation collapses the n×5
      // scored rows to one per doc BEFORE the exchange, and the rows are
      // narrow (ids + score — the text never rides), so the shuffle is
      // a fraction of the window shape's sorted n×5 exchange.
      val scored = docs.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("lang"),
          array_distinct(tris(lower(col("text")))).as("dtris"))
        .crossJoin(broadcast(profiles))
        .select(col("doc_id"), col("lang"),
          struct(negate(size(array_intersect(col("dtris"), col("profile")))).as("ns"),
            col("plang")).as("sc"))
      scored.groupBy(col("doc_id"), col("lang"))
        .agg(min(col("sc")).getField("plang").as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang"))
    })
  )

  def oracles: Map[String, String] = Map(
    "t19_novelty_scan" -> """
      WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents),
      spans AS (
        SELECT doc_id, ('0x' || substr(md5(array_to_string(tk[i:(i+7)], ' ')), 1, 15))::BIGINT AS h
        FROM base, UNNEST(generate_series(1, LEN(tk) - 7)) AS u(i)
        WHERE LEN(tk) >= 8),
      first_seen AS (SELECT h, MIN(doc_id) AS first_doc FROM spans GROUP BY h)
      SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
        ROUND(1.0 - CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS novelty
      FROM spans s JOIN first_seen f USING (h)
      GROUP BY s.doc_id ORDER BY s.doc_id""",

    // same bit-trick buckets, same integer token counts
    "t20_padding_waste" -> """
      WITH toks AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tok
        FROM documents),
      bucketed AS (
        SELECT doc_id, n_tok,
          CASE WHEN n_tok <= 1 THEN n_tok
            ELSE CAST(1 << length(bin(n_tok - 1)) AS BIGINT) END AS bucket
        FROM toks)
      SELECT bucket, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
        CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
        CASE WHEN COUNT(*) * bucket > 0
          THEN ROUND(1.0 - CAST(SUM(n_tok) AS DOUBLE) / (COUNT(*) * bucket), 4)
          ELSE 0.0 END AS waste_frac
      FROM bucketed GROUP BY bucket ORDER BY bucket""",

    // same 60-bit md5 key, same integer inclusion test, same saturating
    // per-language multipliers; frac uses the tie-safe floor spelling
    "t21_weighted_sample" -> """
      WITH d AS (
        SELECT doc_id, lang, n_chars,
          ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h60,
          CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 8 ELSE 4 END AS mult
        FROM documents),
      s AS (
        SELECT *, ((h60 % 2048) < LEAST(n_chars, 512) * mult) AS picked FROM d)
      SELECT lang,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        CAST(SUM(CASE WHEN picked THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars,
        FLOOR(CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*) * 1e4 + 0.5) / 1e4 AS frac
      FROM s GROUP BY lang ORDER BY lang""",

    "t18_stratified_split" -> """
      WITH s AS (
        SELECT lang, doc_id, n_chars,
          CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT lang, doc_id, n_chars,
          ('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS h
          FROM documents))
      SELECT lang, split, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM s GROUP BY lang, split ORDER BY lang, split""",

    // same expression text → same IEEE op order → same doubles; the
    // 9dp-round + DECIMAL sum makes the total order-independent
    // the NB-proven tokenizer parity: regexp '\\S+' ≡ split-on-\\s+
    "t28_type_token_ratio" -> """
      WITH toks AS (
        SELECT source,
          unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        FROM documents)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types,
        ROUND(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 6) AS ttr
      FROM toks GROUP BY source ORDER BY source""",

    // LIKE '%…%' on wildcard-free canaries ≡ contains()
    "t27_canary_scan" -> """
      WITH c AS (
        SELECT
          SUM(CASE WHEN text LIKE '%spark batch window%' THEN 1 ELSE 0 END) AS c0,
          SUM(CASE WHEN text LIKE '%filter join scan%' THEN 1 ELSE 0 END) AS c1,
          SUM(CASE WHEN text LIKE '%canary-zzz-000%' THEN 1 ELSE 0 END) AS c2
        FROM documents)
      SELECT canary, CAST(n_docs AS BIGINT) AS n_docs FROM (
        SELECT 'spark batch window' AS canary, c0 AS n_docs FROM c
        UNION ALL SELECT 'filter join scan', c1 FROM c
        UNION ALL SELECT 'canary-zzz-000', c2 FROM c)
      ORDER BY canary""",

    // same flags, same single-pass sums, same min-per-hash dedup stage
    "t26_filter_funnel" -> """
      WITH d AS (
        SELECT doc_id, text, length(text) AS len,
          length(regexp_replace(text, '[^0-9]', '', 'g')) AS ndig,
          length(regexp_replace(text, '[^A-Z]', '', 'g')) AS nup
        FROM documents),
      f AS (
        SELECT doc_id, text,
          len >= 100 AS f1,
          CAST(ndig AS DOUBLE) / len < 0.2 AS f2,
          CAST(nup AS DOUBLE) / len < 0.5 AS f3
        FROM d),
      s3 AS (SELECT doc_id, md5(text) AS h FROM f WHERE f1 AND f2 AND f3),
      fst AS (SELECT h, MIN(doc_id) AS keep_id FROM s3 GROUP BY h),
      n4v AS (
        SELECT COUNT(*) AS n4 FROM s3
        JOIN fst ON s3.h = fst.h AND s3.doc_id = fst.keep_id),
      c AS (
        SELECT COUNT(*) AS n0,
          SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS n1,
          SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS n2,
          SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS n3
        FROM f)
      SELECT CAST(stage_no AS INTEGER) AS stage_no, stage,
        CAST(n AS BIGINT) AS n_surviving
      FROM (
        SELECT 1 AS stage_no, 'input' AS stage, n0 AS n FROM c
        UNION ALL SELECT 2, 'min_length', n1 FROM c
        UNION ALL SELECT 3, 'digit_ratio', n2 FROM c
        UNION ALL SELECT 4, 'uppercase_ratio', n3 FROM c
        UNION ALL SELECT 5, 'exact_dedup', n4 FROM n4v)
      ORDER BY stage_no""",

    "t24_source_divergence" -> """
      WITH tf AS (
        SELECT source, tok, COUNT(*) AS n FROM (
          SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
          FROM documents)
        GROUP BY source, tok),
      st AS (SELECT source, SUM(n) AS ns FROM tf GROUP BY source),
      corp AS (SELECT tok, SUM(n) AS nc FROM tf GROUP BY tok),
      ct AS (SELECT SUM(nc) AS nt FROM corp),
      contribs AS (
        SELECT tf.source, st.ns,
          ROUND((tf.n / st.ns) * ln((tf.n * ct.nt) / (st.ns * corp.nc)), 9) AS contrib
        FROM tf JOIN st USING (source) JOIN corp USING (tok), ct)
      SELECT source, CAST(MAX(ns) AS BIGINT) AS n_tokens,
        ROUND(CAST(SUM(CAST(contrib AS DECIMAL(28,10))) AS DOUBLE), 6) AS kl
      FROM contribs GROUP BY source ORDER BY source""",

    // the same three merge rounds unrolled; DuckDB's replace shares
    // Java's left-to-right non-overlapping semantics (verified), so
    // vocab states agree exactly at every round. MATERIALIZED prevents
    // exponential CTE inlining of the round chain.
    "t23_bpe_merges" -> s"""
      $bpeTrainCtes
      SELECT CAST(1 AS INTEGER) AS round, a, b, weight FROM m1
      UNION ALL SELECT CAST(2 AS INTEGER), a, b, weight FROM m2
      UNION ALL SELECT CAST(3 AS INTEGER), a, b, weight FROM m3
      ORDER BY round""",

    // training CTEs shared with t23, then per-DISTINCT-word application
    // weighted by occurrence counts — the identical replace chain
    "t25_bpe_tokenize" -> s"""
      $bpeTrainCtes,
      aw AS MATERIALIZED (
        SELECT source, w, COUNT(*) AS cnt FROM (
          SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
          FROM documents)
        WHERE w <> ''
        GROUP BY source, w),
      a0 AS (
        SELECT source, cnt, LENGTH(w) AS wlen,
          array_to_string(string_split(w, ''), ' ') || ' </w>' AS s0
        FROM aw),
      a1 AS (SELECT source, cnt, wlen, trim(replace(' ' || s0 || ' ',
        ' ' || m.a || ' ' || m.b || ' ', ' ' || m.a || m.b || ' ')) AS s0
        FROM a0, m1 m),
      a2 AS (SELECT source, cnt, wlen, trim(replace(' ' || s0 || ' ',
        ' ' || m.a || ' ' || m.b || ' ', ' ' || m.a || m.b || ' ')) AS s0
        FROM a1, m2 m),
      a3 AS (SELECT source, cnt, wlen, trim(replace(' ' || s0 || ' ',
        ' ' || m.a || ' ' || m.b || ' ', ' ' || m.a || m.b || ' ')) AS s0
        FROM a2, m3 m)
      SELECT source,
        CAST(SUM(cnt) AS BIGINT) AS n_words,
        CAST(SUM((wlen + 1) * cnt) AS BIGINT) AS n_char_tokens,
        CAST(SUM(len(string_split(s0, ' ')) * cnt) AS BIGINT) AS n_bpe_tokens,
        ROUND(CAST(SUM((wlen + 1) * cnt) AS DOUBLE) /
          CAST(SUM(len(string_split(s0, ' ')) * cnt) AS BIGINT), 6) AS compression
      FROM a3 GROUP BY source ORDER BY source""",

    "t22_tfidf_keywords" -> """
      WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
          FROM documents)
        GROUP BY doc_id, term),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
          CAST(tf.tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
        FROM tf JOIN dfreq USING (term), nd),
      ranked AS (
        SELECT doc_id, term, score,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, ROUND(score, 4) AS score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",

    "t17_vocab_stats" -> """
      WITH tf AS (
        SELECT tok, COUNT(*) AS tf FROM (
          SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
          FROM documents)
        GROUP BY tok),
      totals AS (
        SELECT CAST(SUM(tf) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
          CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        FROM tf),
      top AS (
        SELECT tok, tf, ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS rank
        FROM tf ORDER BY tf DESC, tok LIMIT 10)
      SELECT CAST(rank AS INTEGER) AS rank, tok, tf,
        ROUND(CAST(tf AS DOUBLE) / n_tokens, 6) AS tok_share,
        n_tokens, n_types, n_hapax,
        ROUND(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_ratio
      FROM top, totals ORDER BY rank""",

    "t16_c4_filters" -> """
      WITH flags AS (
        SELECT doc_id, source,
          LEN(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
          LEN(list_filter(regexp_extract_all(lower(text), '\S+'),
            x -> list_contains(['slow', 'error'], x))) AS badword_hits,
          contains(text, 'lorem ipsum') AS has_lorem,
          contains(text, '{') AS has_brace,
          regexp_matches(text, '[.!?"]$') AS terminal_punct
        FROM documents),
      kept AS (
        SELECT *, (n_tokens >= 20 AND badword_hits <= 2
          AND NOT has_lorem AND NOT has_brace) AS keep
        FROM flags)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(badword_hits) AS BIGINT) AS total_badwords,
        CAST(SUM(CASE WHEN terminal_punct THEN 1 ELSE 0 END) AS BIGINT) AS n_terminal
      FROM kept GROUP BY source ORDER BY source""",

    // same 10-token segments, corpus-wide distinct-doc counts, ordered
    // kept-segment reassembly
    "t14_segment_dedup" -> """
      WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
      segs AS (
        SELECT doc_id, i AS seg_idx,
          array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS seg
        FROM base, UNNEST(generate_series(0,
          CAST(ceil(LEN(toks) / 10.0) AS INT) - 1)) AS u(i)),
      counts AS (
        SELECT ('0x' || substr(md5(seg), 1, 15))::BIGINT AS h, COUNT(DISTINCT doc_id) AS n_docs
        FROM segs GROUP BY 1)
      SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
        md5(COALESCE(string_agg(CASE WHEN c.n_docs < 2 THEN s.seg END,
          ' ' ORDER BY s.seg_idx), '')) AS kept_fp
      FROM segs s JOIN counts c ON ('0x' || substr(md5(s.seg), 1, 15))::BIGINT = c.h
      GROUP BY s.doc_id ORDER BY s.doc_id""",

    // same 1024-bucket hashed unigrams, add-one smoothing, 9dp log-ratio
    // terms, DECIMAL sums
    "t15_dsir_weights" -> """
      WITH tb AS (
        SELECT doc_id, source,
          ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
        FROM (SELECT doc_id, source,
          unnest(regexp_extract_all(lower(text), '\S+')) AS tok FROM documents)),
      dc AS (SELECT doc_id, b, COUNT(*) AS cnt FROM tb GROUP BY 1, 2),
      tgt AS (SELECT b, COUNT(*) AS ct FROM tb WHERE source = 'src0' GROUP BY 1),
      raw AS (SELECT b, COUNT(*) AS cr FROM tb GROUP BY 1),
      tot AS (SELECT (SELECT SUM(ct) FROM tgt) AS nt, (SELECT SUM(cr) FROM raw) AS nr),
      llr AS (
        SELECT raw.b,
          ROUND(ln((COALESCE(ct, 0) + 1.0) / (nt + 1024.0))
              - ln((cr + 1.0) / (nr + 1024.0)), 9) AS llr
        FROM raw LEFT JOIN tgt USING (b), tot),
      scored AS (
        SELECT dc.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tok,
          ROUND(CAST(SUM(CAST(cnt * llr AS DECIMAL(28,10))) AS DOUBLE)
            / CAST(SUM(cnt) AS BIGINT), 6) AS avg_llr
        FROM dc JOIN llr USING (b) GROUP BY dc.doc_id)
      SELECT doc_id, n_tok, avg_llr, avg_llr > 0 AS keep
      FROM scored ORDER BY doc_id""",

    // same √-temperature shares, decimal normalizer, md5 thresholds
    "t13_domain_mix" -> """
      WITH strata AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      w AS (SELECT source, n_docs,
              CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(18,6)) AS w FROM strata),
      tot AS (SELECT SUM(w) AS tw FROM w),
      rates AS (SELECT source, n_docs,
          CAST(FLOOR(LEAST(1.0,
            300.0 * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)) / n_docs) * 1000) AS BIGINT) AS thr
        FROM w, tot),
      sampled AS (
        SELECT d.source, COUNT(*) AS n_sampled,
               CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
        FROM documents d JOIN rates r USING (source)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 < r.thr
        GROUP BY 1)
      SELECT r.source, r.n_docs, r.thr,
        COALESCE(s.n_sampled, 0) AS n_sampled,
        COALESCE(s.sampled_chars, 0) AS sampled_chars
      FROM rates r LEFT JOIN sampled s USING (source)
      ORDER BY r.source""",

    // same add-one bigram LM recomputed in DuckDB: 9dp-rounded per-term
    // nll, DECIMAL term sums, identical division/exp order
    "t12_ngram_perplexity" -> """
      WITH norm AS (
        SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t FROM documents),
      dbg AS (
        SELECT doc_id, substr(t, i, 2) AS bg
        FROM norm, UNNEST(generate_series(1, length(t) - 1)) AS u(i)
        WHERE length(t) >= 2),
      dc AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM dbg GROUP BY 1, 2),
      lm AS (SELECT bg, SUM(cnt) AS n FROM dc GROUP BY 1),
      ctx AS (SELECT substr(bg, 1, 1) AS c1, SUM(n) AS nc FROM lm GROUP BY 1),
      v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM ctx),
      p AS (
        SELECT bg, ROUND(-ln((lm.n + 1.0) / (ctx.nc + v.v)), 9) AS nll
        FROM lm JOIN ctx ON substr(lm.bg, 1, 1) = ctx.c1, v)
      SELECT dc.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        ROUND(EXP(CAST(SUM(CAST(cnt * nll AS DECIMAL(28,10))) AS DOUBLE)
          / CAST(SUM(cnt) AS BIGINT)), 4) AS ppl
      FROM dc JOIN p USING (bg)
      GROUP BY dc.doc_id ORDER BY doc_id""",

    "t01_lang_stats" -> """
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents GROUP BY lang ORDER BY lang""",

    "t02_token_count" -> """
      SELECT doc_id,
        CAST(LEN(regexp_extract_all(text, '\S+')) AS INTEGER) AS ws_tokens,
        CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens,
        CAST(LENGTH(text) AS INTEGER) AS n_chars
      FROM documents ORDER BY doc_id""",

    "t29_mixture_manifest" -> """
      WITH stats AS (
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(LEN(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens,
          CAST(regexp_extract(source, '\d+') AS BIGINT) + 1 AS w
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS tot_toks,
                     CAST(SUM(w) AS DOUBLE) AS tot_w FROM stats),
      scored AS (
        SELECT s.*, CAST(s.tokens AS DOUBLE) / t.tot_toks AS token_share,
               CAST(s.w AS DOUBLE) / t.tot_w AS target_share
        FROM stats s, tot t),
      sc2 AS (SELECT *, target_share / token_share AS raw_rate FROM scored),
      mx AS (SELECT MAX(raw_rate) AS mx FROM sc2),
      rated AS (SELECT *, ROUND(raw_rate / mx, 6) AS rate FROM sc2, mx)
      SELECT source, n_docs, tokens,
        ROUND(target_share, 6) AS target_share,
        rate AS sampling_rate,
        ROUND(tokens * rate, 1) AS expected_tokens
      FROM rated ORDER BY source""",

    "t03_quality_score" -> """
      WITH base AS (
        SELECT doc_id, lang, regexp_extract_all(LOWER(text), '\S+') AS toks,
          CAST(LENGTH(text) AS INTEGER) AS n_chars,
          LENGTH(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
          LENGTH(regexp_replace(text, '\s', '', 'g')) AS n_nonspace
        FROM documents)
      SELECT doc_id, lang, n_chars,
        CAST(LEN(toks) AS INTEGER) AS n_tokens,
        CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
        CAST(LEN(list_filter(toks, x -> list_contains(['the','a','of','and','or','is','in','to'], x))) AS DOUBLE)
          / LEN(toks) AS stopword_ratio,
        CAST(n_nonspace AS DOUBLE) / LEN(toks) AS avg_token_len
      FROM base ORDER BY doc_id""",

    "t04_fingerprint_md5" -> """
      SELECT doc_id, MD5(text) AS fp,
        MD5(lang || ' ' || source || ' ' || text) AS keyed_fp
      FROM documents ORDER BY doc_id""",

    "t05_exact_dedup" -> """
      SELECT MD5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id, COUNT(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY keep_doc_id""",

    // first occurrence by min doc_id per content hash, same as the Spark
    // min(struct) — doc_id leads the struct, so min picks it
    "t30_token_budget" -> """
      WITH d AS (
        SELECT source, doc_id, MD5(text) AS h,
          CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ntok
        FROM documents),
      raw AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(ntok) AS BIGINT) AS n_tokens
        FROM d GROUP BY source),
      firsts AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h),
      kept AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_unique_docs,
          CAST(SUM(d.ntok) AS BIGINT) AS n_unique_tokens
        FROM d JOIN firsts f ON d.doc_id = f.keep_id
        GROUP BY d.source)
      SELECT source, n_docs, n_tokens, n_unique_docs, n_unique_tokens,
        ROUND(1.0 - CAST(n_unique_tokens AS DOUBLE) / n_tokens, 4) AS dup_token_rate
      FROM raw JOIN kept USING (source) ORDER BY source""",

    "t07_winnowing" -> """
      WITH grams AS (
        SELECT doc_id,
          list_transform(range(1, length(text) - 3),
            i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) * 923521
               + ascii(substr(text, CAST(i+1 AS INT), 1)) * 29791
               + ascii(substr(text, CAST(i+2 AS INT), 1)) * 961
               + ascii(substr(text, CAST(i+3 AS INT), 1)) * 31
               + ascii(substr(text, CAST(i+4 AS INT), 1))) AS hashes
        FROM documents),
      fps AS (
        SELECT doc_id, len(hashes) AS n_grams,
          CASE WHEN len(hashes) >= 4 THEN
            list_sort(list_distinct(list_transform(range(0, len(hashes) - 3),
              i -> list_min(hashes[CAST(i+1 AS INT):CAST(i+4 AS INT)]))))
          ELSE list_sort(list_distinct(hashes)) END AS fp
        FROM grams)
      SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams,
        CAST(len(fp) AS INTEGER) AS n_fp,
        md5(array_to_string(fp, ',')) AS fp_sig
      FROM fps ORDER BY doc_id""",

    "t08_prep_pipeline" -> """
      WITH base AS (
        SELECT doc_id, lang, text,
          CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tokens
        FROM documents),
      filtered AS (SELECT * FROM base
        WHERE lang IN ('en', 'de', 'fr') AND n_tokens >= 30),
      keep_exact AS (SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)),
      exact AS (SELECT * FROM filtered
        WHERE doc_id IN (SELECT doc_id FROM keep_exact)),
      toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) tok
        FROM exact),
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
      dropped AS (
        SELECT DISTINCT y.doc_id
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.f, y.f)) <= 8),
      canonical AS (SELECT * FROM exact
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
      sampled AS (SELECT * FROM canonical
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 < 8)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        ROUND(AVG(n_tokens), 4) AS avg_tokens
      FROM sampled GROUP BY lang ORDER BY lang""",

    "t09_repetition_stats" -> """
      WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
        FROM documents WHERE LEN(regexp_extract_all(lower(text), '\S+')) >= 2),
      feats AS (
        SELECT doc_id, toks, LEN(toks) AS n_tokens,
          list_distinct(toks) AS dt,
          list_transform(range(1, LEN(toks)), i -> toks[i] || ' ' || toks[i+1]) AS g2
        FROM base),
      counted AS (
        SELECT doc_id,
          CAST(n_tokens AS INTEGER) AS n_tokens,
          CAST(LEN(dt) AS INTEGER) AS n_distinct,
          list_aggregate(list_transform(dt,
            d -> LEN(list_filter(toks, x -> x = d))), 'max') AS top_word_n,
          LEN(g2) AS n_2grams,
          LEN(list_distinct(g2)) AS n_distinct_2grams,
          list_aggregate(list_transform(list_distinct(g2),
            g -> LEN(list_filter(g2, x -> x = g))), 'max') AS top_2gram_n
        FROM feats)
      SELECT doc_id, n_tokens, n_distinct,
        ROUND(CAST(top_word_n AS DOUBLE) / n_tokens, 4) AS top_word_frac,
        ROUND(1.0 - CAST(n_distinct_2grams AS DOUBLE) / n_2grams, 4) AS dup_2gram_frac,
        ROUND(CAST(top_2gram_n AS DOUBLE) / n_2grams, 4) AS top_2gram_frac,
        (ROUND(CAST(top_word_n AS DOUBLE) / n_tokens, 4) > 0.2 OR
         ROUND(1.0 - CAST(n_distinct_2grams AS DOUBLE) / n_2grams, 4) > 0.6) AS repetitive
      FROM counted ORDER BY doc_id""",

    "t10_pii_redact" -> """
      WITH aug AS (
        SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
          '@mail.example.com call +1 555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
          ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.77' AS a
        FROM documents)
      SELECT doc_id,
        CAST(LEN(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        CAST(LEN(regexp_extract_all(a, '\+1 [0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
        CAST(LEN(regexp_extract_all(a, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INTEGER) AS n_ips,
        MD5(regexp_replace(regexp_replace(regexp_replace(a,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\+1 [0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
          '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g')) AS redacted_fp
      FROM aug ORDER BY doc_id""",

    "t11_sequence_packing" -> """
      WITH d AS (
        SELECT doc_id,
          CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, n_tok,
          SUM(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_tok
        FROM d)
      SELECT CAST(FLOOR(CAST(start_tok AS DOUBLE) / 2048) AS BIGINT) AS bin_id,
        COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
        CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        CAST(MAX(doc_id) AS BIGINT) AS last_doc
      FROM c GROUP BY 1 ORDER BY 1""",

    "t06_lang_id" -> """
      WITH tri_train AS (
        SELECT lang, unnest(list_transform(range(1, length(lower(text)) - 1),
          i -> substr(lower(text), CAST(i AS INT), 3))) AS tri
        FROM documents WHERE doc_id < 250),
      counts AS (SELECT lang, tri, COUNT(*) AS n FROM tri_train GROUP BY lang, tri),
      ranked AS (SELECT lang, tri,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tri) AS rk
        FROM counts),
      profiles AS (SELECT lang AS plang, list_sort(list(tri)) AS profile
        FROM ranked WHERE rk <= 20 GROUP BY lang),
      scored AS (
        SELECT d.doc_id, d.lang, p.plang,
          len(list_intersect(
            list_distinct(list_transform(range(1, length(lower(d.text)) - 1),
              i -> substr(lower(d.text), CAST(i AS INT), 3))),
            p.profile)) AS score
        FROM documents d CROSS JOIN profiles p WHERE d.doc_id >= 250),
      best AS (SELECT doc_id, lang, plang,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rk
        FROM scored)
      SELECT lang, plang AS pred_lang, COUNT(*) AS n
      FROM best WHERE rk = 1 GROUP BY lang, plang ORDER BY lang, pred_lang"""
  )
}

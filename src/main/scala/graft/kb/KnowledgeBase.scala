package graft.kb

import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** Knowledge-base engine: chunked ingest, deterministic stub embeddings,
  * semantic search with metadata filters, boolean set algebra, hybrid
  * keyword blend, and retrieval evaluation — the Spark-native rebuild of
  * the reference's KB stack
  * (mindsdb/interfaces/knowledge_base/controller.py:168-760,
  * executor.py:28-395, preprocessing/document_preprocessor.py:265).
  *
  * Everything is a narrow DataFrame transform until the final top-k sort:
  * chunking is one `explode` over a per-doc `sequence` (no shuffle),
  * embeddings are per-row expressions (codegen'd md5), search is a
  * broadcast of one query vector over a pruned scan. At 100 TB the only
  * wide stages are the boolean-algebra joins on `chunk_id` — key-only
  * semi/anti joins.
  *
  * The embedder is a deterministic md5 hash-projection so the DuckDB
  * oracle can reproduce every float bit-for-bit (`conv(substr(md5 …))` ≡
  * `('0x' || substr(md5 …))::BIGINT`). Swapping in a real model is a
  * one-line change: replace [[Kb.embed]] with a batched `mapPartitions`
  * encoder — everything downstream operates on `array<double>` columns.
  */
object Kb {

  /** Chunking parameters (reference: TextChunkingPreprocessor config,
    * document_preprocessor.py:265-347). Fixed-size character windows
    * with overlap; step = size - overlap. */
  val ChunkSize = 120
  val Overlap = 24
  val Step: Int = ChunkSize - Overlap
  /** Stub-embedding dimensionality. */
  val Dim = 8

  /** Search limits (controller.py:354-368): default 10, hard cap 100. */
  val DefaultLimit = 10
  val MaxLimit = 100

  /** Negative-content handling (executor.py:34-35): `content != q`
    * excludes the top [[NegativeSetSize]] ids with relevance >=
    * [[NegativeSetThreshold]] for q. */
  val NegativeSetSize = 100
  val NegativeSetThreshold = 0.5

  // ---------------------------------------------------------------- ingest

  /** Split documents into overlapping character chunks.
    *
    * Input must carry `doc_id` and a text column; all other columns pass
    * through as chunk metadata (reference carries base_metadata per chunk,
    * controller.py:680-705). Chunk ids follow the reference format
    * `<doc_id>:<content_column>:<N>of<T>:<start>to<end>`
    * (document_preprocessor.py:73-94).
    */
  def chunk(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val len = length(col(contentCol)).cast(LongType)
    docs
      .withColumn("len", len)
      .withColumn("n_chunks",
        when(col("len") <= ChunkSize, lit(1L))
          .otherwise(ceil((col("len") - ChunkSize).cast("double") / Step).cast(LongType) + 1L))
      .withColumn("chunk_ix", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_c", col("chunk_ix") * Step)
      .withColumn("end_c", least(col("start_c") + ChunkSize, col("len")))
      .withColumn("content", col(contentCol).substr(col("start_c") + 1, lit(ChunkSize)))
      .withColumn("chunk_id", concat(
        col("doc_id"), lit(s":$contentCol:"), col("chunk_ix") + 1, lit("of"),
        col("n_chunks"), lit(":"), col("start_c"), lit("to"), col("end_c")))
      .drop(contentCol)
  }

  /** Contextual-chunk prompt template (document_preprocessor.py:122-129
    * DEFAULT_CONTEXT_TEMPLATE), split at the two insertion points so the
    * DuckDB oracle can reuse the exact same bytes. */
  val CtxPromptPrefix = "<document>\n"
  val CtxPromptMid = "\n</document>\nHere is the chunk we want to situate within the whole document\n<chunk>\n"
  val CtxPromptSuffix = "\n</chunk>\nPlease give a short succinct context to situate this chunk " +
    "within the overall document for the purposes of improving search retrieval of the chunk. " +
    "Answer only with the succinct context and nothing else."

  /** ContextualPreprocessor (document_preprocessor.py:118-250): split the
    * document, then situate every chunk within its WHOLE document via an
    * LLM prompt — context prepends to the chunk content (`summarize=true`
    * replaces it). `<document>`/`<chunk>` tags inside either text are
    * entity-escaped before templating, as in the reference
    * (:149-160). The LLM is the session's deterministic stub; swapping a
    * real model in is the same one-line change as for [[embed]].
    *
    * Plan shape: chunking explodes per document and the prompt is a
    * per-row concat — the whole-document column rides along the explode
    * (no join back), so the stage stays narrow at any scale.
    */
  def contextualChunk(docs: DataFrame, contentCol: String = "text",
      summarize: Boolean = false): DataFrame = {
    val esc: Column => Column = c =>
      regexp_replace(c, "(?i)<(/?)(document|chunk)>", "&lt;$1$2&gt;")
    val chunked = chunk(
      docs.filter(trim(col(contentCol)) =!= "").withColumn("_doc", col(contentCol)),
      contentCol)
      .filter(trim(col("content")) =!= "")
    val prompt = concat(
      lit(CtxPromptPrefix), esc(col("_doc")), lit(CtxPromptMid),
      esc(col("content")), lit(CtxPromptSuffix))
    val context = graft.functions.AiFunctions.llm(prompt)
    chunked
      .withColumn("content",
        if (summarize) context else concat(context, lit("\n\n"), col("content")))
      .drop("_doc")
  }

  /** JSON chunking (preprocessing/json_chunker.py): one chunk per FIELD
    * of a JSON-object document (json_chunker.py:142-188 `_process_json_
    * dict`), with one-level flattening of nested objects into
    * `parent.child: value` lines ('.' delimiter, `_flatten_dict` +
    * `_dict_to_text`) and primitive fields as `key: value`. Chunk ids
    * follow the shared `<doc_id>:<col>:<N>of<T>:<start>to<end>` format;
    * `field_name` rides as chunk metadata for filtering. Documents that
    * fail to parse yield one `<doc_id>_error` chunk instead of vanishing
    * (json_chunker.py:40-45).
    *
    * Everything is a narrow per-row transform (from_json + posexplode) —
    * no shuffle, scales with the scan.
    */
  def chunkJson(docs: DataFrame, jsonCol: String = "j"): DataFrame = {
    val entries = MapType(StringType, StringType)
    val nested = from_json(col("_raw"), entries)
    val flatLines = array_join(
      transform(map_entries(nested), e =>
        concat(col("field_name"), lit("."), e.getField("key"), lit(": "), e.getField("value"))),
      "\n")
    docs
      .withColumn("_m", from_json(col(jsonCol), entries))
      .select(col("*"), posexplode_outer(col("_m")).as(Seq("_pos", "field_name", "_raw")))
      .withColumn("n_chunks", coalesce(size(col("_m")), lit(1)).cast(LongType))
      .withColumn("chunk_ix", coalesce(col("_pos") + 1, lit(1)).cast(LongType))
      .withColumn("content",
        when(col("field_name").isNull,
          lit("Error processing document: Content is neither valid JSON nor a valid Python literal."))
          .when(col("_raw").rlike("^\\s*\\{"), flatLines)
          .otherwise(concat(col("field_name"), lit(": "), col("_raw"))))
      .withColumn("chunk_id",
        when(col("field_name").isNull, concat(col("doc_id"), lit("_error")))
          .otherwise(concat(
            col("doc_id"), lit(s":$jsonCol:"), col("chunk_ix"), lit("of"),
            col("n_chunks"), lit(":0to"), length(col("content")))))
      .drop("_m", "_pos", "_raw", jsonCol)
  }

  /** Deterministic stub embedding of a string column: component j =
    * first-32-bits-of-md5(s + ":" + j) scaled to [-1, 1). Exactly
    * reproducible in the oracle; stands in for the KB's embedding model
    * (controller.py:331-338 `_content_to_embeddings`). */
  def embed(c: Column, dim: Int = Dim): Column =
    array((0 until dim).map { j =>
      conv(substring(md5(concat(c, lit(s":$j"))), 1, 8), 16, 10)
        .cast(LongType) / lit(2147483648.0) - lit(1.0)
    }: _*)

  /** Oracle-side (DuckDB) spelling of [[embed]]. */
  def oEmbed(x: String, dim: Int = Dim): String =
    s"list_transform(generate_series(0, ${dim - 1}), j -> ('0x' || substr(md5($x || ':' || j), 1, 8))::BIGINT / 2147483648.0 - 1.0)"

  /** chunk + embed: the full ingest pipeline (minus the real model). */
  def ingest(docs: DataFrame, contentCol: String = "text"): DataFrame =
    chunk(docs, contentCol).withColumn("emb", embed(col("content")))

  /** Chunk embedding through the OUT-OF-PROCESS BYOM worker
    * (`embedding_model = {'provider': 'byom'}` — the reference runs
    * embedding providers behind exactly this process boundary,
    * ml_exec_base.py learn/predict processes). Scale design: ONE worker
    * process per PARTITION, spawned inside the task and closed at task
    * end — on a 1000-executor cluster each task streams its slice
    * through a local sidecar in 64-row batches, so no chunk text ever
    * funnels through the driver and worker crashes respawn per the
    * [[graft.ml.ByomProcessEngine]] retry contract. The shipped worker
    * model is the deterministic md5 projection (numerically ≡ [[embed]],
    * keeping the DuckDB oracle valid); a real LLM provider is a worker
    * swap, not an architecture change. */
  def embedThroughWorker(chunks: DataFrame): DataFrame = {
    val spark = chunks.sparkSession
    val schema = chunks.schema.add("emb",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))
    val rdd = chunks.rdd.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val eng = new graft.ml.ByomProcessEngine
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => eng.close()))
        it.grouped(64).flatMap { batch =>
          val embs = eng.embedTexts(batch.map(_.getAs[String]("content")), Dim)
          batch.lazyZip(embs).map((r, e) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ e))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partitioned ingest (query_planner.py:918-978): the reference
    * auto-rewrites `INSERT INTO kb SELECT …` into a batched, resumable
    * fetch plan. Composes keyset pagination (each batch a bounded
    * pushed-down scan, resumable via FetchState) with the chunk+embed
    * pipeline. */
  def partitionedIngest(
      src: () => DataFrame,
      trackCol: String,
      batchSize: Int,
      state: graft.federation.FetchState = new graft.federation.FetchState,
      contentCol: String = "text"): DataFrame =
    ingest(graft.federation.PartitionedFetch.keysetFetch(src, trackCol, batchSize, state),
      contentCol)

  /** Streaming ingest: watch a directory of document parquet files and
    * maintain the chunk store incrementally — the Structured Streaming
    * form of the reference's job-driven periodic `INSERT INTO kb SELECT
    * … WHERE id > LAST` pattern (jobs + KB, query_planner.py:918-978).
    * chunk+embed is the same narrow pipeline as batch ingest (explode +
    * per-row expressions — valid in append mode, no state), the sink is
    * the KB's parquet storage dir, and the checkpoint makes delivery
    * exactly-once across restarts. `AvailableNow` drains pending files
    * then stops, so callers can drive it batch-style. */
  def streamingIngest(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      storageDir: String,
      checkpoint: String,
      contentCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    ingest(spark.readStream.schema(schema).parquet(srcDir), contentCol)
      .writeStream
      .format("parquet")
      .option("path", storageDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** `kb_skip_existing` semantics (controller.py:728-740): drop incoming
    * chunks whose chunk_id is already present. Key-only left_anti — the
    * scale-correct shape (no payload shuffle of the existing side). */
  def skipExisting(incoming: DataFrame, existing: DataFrame): DataFrame =
    incoming.join(existing.select("chunk_id"), Seq("chunk_id"), "left_anti")

  /** Default re-ingest semantics (controller.py insert path, proven by
    * tests/unit/executor/test_knowledge_base.py test_duplicated_ids):
    * re-inserting a document id REPLACES all its stored chunks — the old
    * chunking disappears entirely, even when the new content yields
    * fewer chunks. Key-only left_anti on doc_id (no payload shuffle of
    * the incoming side), then a union — never a per-doc loop. */
  def replaceDocs(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.join(incoming.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .unionByName(incoming)

  /** Upsert diff (vectordatabase_handler.py:295-443): classify incoming
    * chunks vs the stored table by chunk_id + content hash. Returns the
    * incoming rows tagged `_op` in {insert, update, unchanged}. */
  def upsertDiff(incoming: DataFrame, existing: DataFrame): DataFrame = {
    val ex = existing.select(col("chunk_id"), md5(col("content")).as("_ex_hash"))
    incoming
      .withColumn("_in_hash", md5(col("content")))
      .join(ex, Seq("chunk_id"), "left_outer")
      .withColumn("_op",
        when(col("_ex_hash").isNull, lit("insert"))
          .when(col("_ex_hash") =!= col("_in_hash"), lit("update"))
          .otherwise(lit("unchanged")))
      .drop("_ex_hash", "_in_hash")
  }

  // ---------------------------------------------------------------- search

  /** relevance = 1 / (1 + distance), distance = cosine distance
    * (controller.py:489-494). Rounded to 4 decimals so ordering and
    * thresholding are engine-stable (see graft.queries.Parity). */
  def relevanceOf(dist: Column): Column = round(lit(1.0) / (lit(1.0) + dist), 4)

  /** Two-phase sharded ranked top-k — the scale-safe replacement for one
    * corpus-wide window per partition value: phase 1 ranks within
    * (partition, `shards`-way hash shard of `shardKey`) so no single
    * task ever holds a whole corpus slice per query; phase 2 ranks only
    * the ≤ shards×k shard winners. Results are IDENTICAL to the flat
    * window (any global top-k row is necessarily in its shard's top-k),
    * the ordering must be total (tie-break on a unique key) for that
    * equivalence to hold. Shared by k17 batch retrieval and
    * [[evaluate]]. */
  def shardedTopK(df: DataFrame, part: Column, order: Seq[Column], k: Int,
      rankCol: String, shardKey: Column, shards: Int = 64): DataFrame = {
    val w1 = Window.partitionBy(part, pmod(xxhash64(shardKey), lit(shards)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(part).orderBy(order: _*)
    df.withColumn("__shard_rank", row_number().over(w1))
      .filter(col("__shard_rank") <= k).drop("__shard_rank")
      .withColumn(rankCol, row_number().over(w2)).filter(col(rankCol) <= k)
  }

  /** Reranker contract (controller.py:446-487): given the query text and
    * an over-fetched result page, replace `relevance` with reranked
    * scores; results under [[filteringThreshold]] drop. The reference
    * calls an LLM listwise reranker here — any deterministic scorer with
    * the same shape plugs in. */
  trait Reranker extends Serializable {
    def filteringThreshold: Double = 0.0
    def rerank(queryText: String, results: DataFrame): DataFrame
  }

  /** Deterministic reranker stub: blend vector relevance with query-token
    * overlap — stands in for the LLM scorer, oracle-reproducible. */
  final class KeywordBoostReranker extends Reranker {
    def rerank(queryText: String, results: DataFrame): DataFrame = {
      val toks: Column => Column =
        c => array_distinct(regexp_extract_all(lower(c), lit("\\S+"), lit(0)))
      val qn = queryText.trim.toLowerCase.split("\\s+").distinct.length
      results.withColumn("relevance",
        round(col("relevance") * 0.5 +
          size(array_intersect(toks(col("content")), toks(lit(queryText))))
            .cast("double") / qn * 0.5, 4))
    }
  }

  /** Vector search: score every chunk passing `metaFilter` against the
    * query text, attach distance + relevance, keep top `limit`.
    *
    * One pruned scan + one narrow projection + one top-k sort; the query
    * vector is a constant-folded literal (no broadcast join needed for a
    * single query). Limit defaults/caps per controller.py:354-368; with a
    * reranker the fetch over-expands to min(limit×2, limit+30) before
    * reranking, then cuts back to `limit` (controller.py:362-368).
    */
  def vectorSearch(
      chunks: DataFrame,
      queryText: String,
      metaFilter: Column = lit(true),
      limit: Int = DefaultLimit,
      minRelevance: Option[Double] = None,
      reranker: Option[Reranker] = None): DataFrame = {
    val k = math.min(if (limit <= 0) DefaultLimit else limit, MaxLimit)
    val fetchK = reranker.fold(k)(_ => math.min(k * 2, k + 30))
    val scored = chunks
      .filter(metaFilter)
      .withColumn("distance", round(lit(1.0) - cosineSim(col("emb"), embed(lit(queryText))), 4))
      .withColumn("relevance", relevanceOf(col("distance")))
    val thresholded = minRelevance match {
      case Some(t) => scored.filter(col("relevance") > t)
      case None => scored
    }
    val page = thresholded
      .orderBy(col("relevance").desc, col("chunk_id"))
      .limit(fetchK)
    reranker match {
      case None => page
      case Some(rr) =>
        rr.rerank(queryText, page)
          .filter(col("relevance") >= rr.filteringThreshold)
          .orderBy(col("relevance").desc, col("chunk_id"))
          .limit(k)
    }
  }

  /** IVF coarse index over the chunk store — the scale path for KB
    * semantic search: [[vectorSearch]] scores every chunk per query,
    * which at 100 TB is a full-corpus scan; with an inverted-file index
    * the query probes `nProbe` of `nCent` cells and scores only those
    * lists (~nProbe/nCent of the corpus). Built at INGEST time, like the
    * BM25 corpus stats: assignment is one broadcast of nCent centroids +
    * a narrow per-row argmax, and the `cell` column persists with the
    * chunk store (a partition column in a real deployment, so probing
    * prunes file listings, not just rows).
    *
    * Centroids are deterministic — the embeddings of the nCent
    * lexicographically-first chunk ids (standing in for trained k-means
    * centers, same convention as the s05 IVF operator; swapping in
    * trained centers changes recall, not the plan shape).
    *
    * @return (chunks with `cell`, centroids(cent_id, cv))
    */
  def ivfIndex(chunks: DataFrame, nCent: Int): (DataFrame, DataFrame) = {
    val cents = broadcast(
      chunks.orderBy(col("chunk_id")).limit(nCent)
        .select(col("chunk_id"), col("emb"))
        .withColumn("cent_id",
          row_number().over(Window.orderBy(col("chunk_id"))))
        .select(col("cent_id"), col("emb").as("cv")))
    (ivfAssign(chunks, cents), cents)
  }

  /** IVF with TRAINED centroids: two Lloyd rounds of graft.ml.KMeans over
    * the chunk embeddings replace the lexicographic stand-in codebook.
    * Same assignment/probe plan shape, tighter cells → better recall at
    * the same nProbe. The quantized centroids scale back to the embedding
    * range for the cosine assignment path. */
  def ivfIndexTrained(chunks: DataFrame, nCent: Int): (DataFrame, DataFrame) = {
    val (_, qCents) = graft.ml.KMeans.fit(
      chunks.select(col("chunk_id"), col("emb")), "chunk_id", "emb", nCent, iters = 2)
    val cents = broadcast(qCents
      .select(col("cell").as("cent_id"),
        transform(col("cv"),
          x => x.cast(org.apache.spark.sql.types.DoubleType) / 1e7).as("cv")))
    (ivfAssign(chunks, cents), cents)
  }

  /** Assign each chunk to its nearest centroid — the ingest-time step of
    * the IVF index. Used by [[ivfIndex]] at build time AND by subsequent
    * ingests into an indexed KB, so new chunks land in the same cell
    * layout without a full re-index. */
  def ivfAssign(chunks: DataFrame, cents: DataFrame): DataFrame = {
    // argmax INLINE over the centroid table shipped as ONE broadcast row
    // of array<struct<cent_id,cv>>: same (round(cc,4) desc, cent_id asc)
    // winner the previous per-chunk_id window produced — with ZERO
    // shuffle, and (r17) the per-entry loop in whole-stage codegen via
    // ArgMinCentroids.topCosineCells instead of the interpreted
    // array_min/transform lambda. The isNotNull filter keeps the old
    // empty-centroid-table behavior (zero rows ingested, not null cells
    // — agg-on-empty yields one empty-array row).
    val ca = broadcast(cents.agg(
      collect_list(struct(col("cent_id"), col("cv"))).as("__ca")))
    chunks.crossJoin(ca)
      .withColumn("cell", element_at(
        graft.functions.ArgMinCentroids.topCosineCells(col("emb"), col("__ca"), 1), 1))
      .filter(col("cell").isNotNull)
      .drop("__ca")
  }

  /** ANN semantic search over an [[ivfIndex]]ed chunk store: rank the
    * centroid table (nCent rows — a driver-sized frame) against the query
    * embedding, keep the `nProbe` nearest cells, then score ONLY the
    * chunks assigned to those cells — the candidate join is a broadcast
    * semi-join on `cell`, so the scan prunes to ~nProbe/nCent of the
    * corpus before any distance work. Scoring/threshold/top-k semantics
    * are identical to [[vectorSearch]]. */
  def vectorSearchIvf(
      indexed: DataFrame,
      cents: DataFrame,
      queryText: String,
      nProbe: Int,
      limit: Int = DefaultLimit,
      minRelevance: Option[Double] = None): DataFrame = {
    val k = math.min(if (limit <= 0) DefaultLimit else limit, MaxLimit)
    val probes = cents
      .withColumn("qc", round(cosineSim(col("cv"), embed(lit(queryText))), 4))
      .withColumn("prk",
        row_number().over(Window.orderBy(col("qc").desc, col("cent_id"))))
      .filter(col("prk") <= nProbe)
      .select(col("cent_id").as("cell"))
    val scored = indexed.join(broadcast(probes), Seq("cell"), "left_semi")
      .withColumn("distance", round(lit(1.0) - cosineSim(col("emb"), embed(lit(queryText))), 4))
      .withColumn("relevance", relevanceOf(col("distance")))
    minRelevance.fold(scored)(t => scored.filter(col("relevance") > t))
      .orderBy(col("relevance").desc, col("chunk_id"))
      .limit(k)
  }

  /** Boolean search algebra (executor.py:28-395). The reference compiles
    * WHERE into set operations over per-condition searches:
    *   AND → intersect on chunk_id; positive contents string-AND-joined
    *         into ONE search (executor.py:349-355); negative contents
    *         become an id-exclusion set (top-100 @ relevance>=0.5);
    *   OR  → union with dedup on chunk_id.
    */
  sealed trait Cond
  /** positive semantic condition: content = / LIKE q */
  final case class ContentIs(q: String) extends Cond
  /** negative semantic condition: content != / NOT LIKE q */
  final case class ContentNot(q: String) extends Cond
  /** plain metadata predicate over chunk columns */
  final case class Meta(filter: Column) extends Cond
  final case class And(items: Seq[Cond]) extends Cond
  final case class Or(items: Seq[Cond]) extends Cond

  /** Execute a condition tree; returns scored chunks (with distance /
    * relevance from the content search that admitted each row). */
  def search(chunks: DataFrame, cond: Cond, limit: Int = DefaultLimit): DataFrame =
    cond match {
      case ContentIs(q) => vectorSearch(chunks, q, limit = limit)
      case ContentNot(q) =>
        // standalone negation = everything except the q-similar set;
        // as in the reference this only occurs inside AND blocks with
        // other conditions, but keep it total:
        chunks.join(negativeSet(chunks, q, lit(true)), Seq("chunk_id"), "left_anti")
      case Meta(f) => chunks.filter(f)
      case Or(items) =>
        // union dedup on chunk_id (executor.py:93-101); first writer wins.
        // Arms may differ in schema (a meta-only arm carries no
        // distance/relevance) — align with allowMissingColumns.
        val w = Window.partitionBy(col("chunk_id")).orderBy(col("_arm"))
        items.zipWithIndex
          .map { case (c, i) => search(chunks, c, limit).withColumn("_arm", lit(i)) }
          .reduce(_.unionByName(_, allowMissingColumns = true))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", "_arm")
      case And(items) =>
        val metas = items.collect { case Meta(f) => f }
        val metaFilter = metas.foldLeft(lit(true))(_ && _)
        val positives = items.collect { case ContentIs(q) => q }
        val negatives = items.collect { case ContentNot(q) => q }
        val blocks = items.collect { case b @ (Or(_) | And(_)) => b }
        // negative contents → excluded-id set (executor.py:255-296)
        val excluded = negatives.map(q => negativeSet(chunks, q, metaFilter))
          .reduceOption(_ unionByName _)
        def minusExcluded(df: DataFrame) =
          excluded.fold(df)(ex => df.join(ex, Seq("chunk_id"), "left_anti"))
        // positive contents string-AND-joined into one search
        val contentResult =
          if (positives.nonEmpty)
            Some(vectorSearch(minusExcluded(chunks), positives.mkString(" AND "), metaFilter, limit))
          else None
        val base: Option[DataFrame] = contentResult match {
          case some @ Some(_) => some
          case None if metas.nonEmpty || negatives.nonEmpty =>
            Some(minusExcluded(chunks.filter(metaFilter)))
          case None => None
        }
        val all = base.toSeq ++ blocks.map(b => search(chunks, b, limit))
        // intersect on chunk_id (executor.py:103-114): keep first result's
        // rows, semi-join against the rest — key-only exchanges.
        all.reduce((a, b) => a.join(b.select("chunk_id"), Seq("chunk_id"), "left_semi"))
    }

  /** Top-[[NegativeSetSize]] chunk ids with relevance >= 0.5 for q —
    * the exclusion set for a negative content condition. */
  private def negativeSet(chunks: DataFrame, q: String, metaFilter: Column): DataFrame =
    vectorSearch(chunks, q, metaFilter, NegativeSetSize)
      .filter(col("relevance") >= NegativeSetThreshold)
      .select("chunk_id")

  // ---------------------------------------------------------------- hybrid

  /** Hybrid search (controller.py:372-424): blend the vector arm with a
    * keyword arm. Keyword distance = 1 - |query∩content tokens|/|query
    * tokens| (a deterministic overlap score standing in for BM25 — the
    * reference delegates keyword scoring to the vector store's
    * KeywordSearchBase). Vector distances scale by (1-alpha), keyword by
    * alpha; union, keep min blended distance per chunk (vector arm wins
    * ties, matching the reference's stable concat-then-dedup), top-k by
    * blended relevance.
    */
  def hybridSearch(
      chunks: DataFrame,
      queryText: String,
      alpha: Double = 0.5,
      metaFilter: Column = lit(true),
      limit: Int = DefaultLimit): DataFrame = {
    val toks: Column => Column = c => array_distinct(regexp_extract_all(lower(c), lit("\\S+"), lit(0)))
    val qn = queryText.trim.toLowerCase.split("\\s+").distinct.length
    val base = chunks.filter(metaFilter)
    // both arms score the SAME chunk row, so the union + per-chunk_id
    // window the previous shape used (which shuffled 2× the corpus with
    // full content+embedding payloads just to take the per-chunk min)
    // collapses to ONE map-side least(): min((vd,0),(kd,1)) lexicographic
    // = least(vd, kd) — ties pick the same distance value either way, so
    // results are identical and nothing shuffles before the final top-k.
    val vd = round((lit(1.0) - cosineSim(col("emb"), embed(lit(queryText)))) * (1.0 - alpha), 4)
    val kd = round((lit(1.0) - size(array_intersect(toks(col("content")), toks(lit(queryText))))
      .cast("double") / qn) * alpha, 4)
    base
      .withColumn("distance", least(vd, kd))
      .withColumn("relevance", relevanceOf(col("distance")))
      .orderBy(col("relevance").desc, col("chunk_id"))
      .limit(math.min(limit, MaxLimit))
  }

  /** BM25 keyword scoring over the chunk corpus — the real form of the
    * hybrid keyword arm (the reference delegates to the vector store's
    * KeywordSearchBase, typically BM25;
    * integrations/libs/keyword_search_base.py).
    *
    * Classic Okapi parameters (k1=1.2, b=0.75);
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)). Postings build is one
    * explode + groupBy on (chunk, term); document frequencies are
    * computed ONLY for the query's terms (a handful of rows, broadcast),
    * so at 100 TB the score is a semi-join-pruned scan over the postings
    * of the query terms — never the full index.
    */
  /** Corpus stats (N, avgdl) for BM25 — compute ONCE at index-build time
    * and pass into [[bm25Score]]: at 100 TB the stats are a full-corpus
    * scan, which must not run per query. */
  def corpusStats(chunks: DataFrame): (Long, Double) = {
    val toks: Column => Column = c => regexp_extract_all(lower(c), lit("\\S+"), lit(0))
    val r = chunks.agg(count(lit(1)), sum(size(toks(col("content"))))).first()
    val n = r.getLong(0)
    (n, if (n == 0) 0.0 else r.getLong(1).toDouble / n)
  }

  def bm25Score(
      chunks: DataFrame,
      queryText: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      stats: Option[(Long, Double)] = None): DataFrame = {
    val toks: Column => Column = c => regexp_extract_all(lower(c), lit("\\S+"), lit(0))
    val qTerms = queryText.trim.toLowerCase.split("\\s+").distinct.toSeq
    val base = chunks.select(col("chunk_id"), col("doc_id"), toks(col("content")).as("terms"))
    // precomputed (index-time) stats preferred; the inline fallback is a
    // full-corpus action per call — fine for specs, wrong at scale
    val (n, avgdl) = stats.getOrElse(corpusStats(chunks))
    if (n == 0) {
      // empty (or fully meta-filtered) corpus: no scores, not a crash
      val spark = chunks.sparkSession
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("chunk_id", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("doc_id", chunks.schema("doc_id").dataType),
          org.apache.spark.sql.types.StructField("bm25", org.apache.spark.sql.types.DoubleType))))
    }
    val postings = base
      .select(col("chunk_id"), col("doc_id"), size(col("terms")).as("dl"),
        explode(col("terms")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("chunk_id"), col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfTerm = broadcast(postings.groupBy(col("term"))
      .agg(countDistinct(col("chunk_id")).cast("double").as("df")))
    postings.join(dfTerm, "term")
      .withColumn("idf", log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      // sorted sequential fold, NOT sum(): a shuffled partial sum of
      // doubles is order-nondeterministic across engines
      .groupBy(col("chunk_id"), col("doc_id"))
      .agg(sort_array(collect_list(col("contrib"))).as("cs"))
      .select(col("chunk_id"), col("doc_id"),
        round(expr("aggregate(cs, cast(0.0 as double), (acc, x) -> acc + x)"), 4).as("bm25"))
  }

  /** Hybrid search with the BM25 keyword arm: weighted blend of vector
    * distance and BM25-derived keyword distance (1/(1+bm25); chunks
    * containing no query term take the max keyword distance 1.0).
    * `alpha` weighs the keyword arm, as in [[hybridSearch]]. */
  def hybridSearchBm25(
      chunks: DataFrame,
      queryText: String,
      alpha: Double = 0.5,
      metaFilter: Column = lit(true),
      limit: Int = DefaultLimit,
      stats: Option[(Long, Double)] = None): DataFrame = {
    val base = chunks.filter(metaFilter)
    val kw = bm25Score(base, queryText, stats = stats)
      .select(col("chunk_id"), round(lit(1.0) / (lit(1.0) + col("bm25")), 4).as("kw_dist"))
    base
      .join(kw, Seq("chunk_id"), "left_outer")
      .withColumn("kw_dist", coalesce(col("kw_dist"), lit(1.0)))
      .withColumn("vec_dist", round(lit(1.0) - cosineSim(col("emb"), embed(lit(queryText))), 4))
      .withColumn("distance",
        round(col("vec_dist") * (1.0 - alpha) + col("kw_dist") * alpha, 4))
      .withColumn("relevance", relevanceOf(col("distance")))
      .orderBy(col("relevance").desc, col("chunk_id"))
      .limit(math.min(limit, MaxLimit))
  }

  // -------------------------------------------------------------- evaluate

  /** Retrieval evaluation (EVALUATE KNOWLEDGE_BASE,
    * knowledge_base/evaluate.py:82-520): for each (query_id, queryText,
    * goldDocId) run top-k search and compute hit@1, hit@k and NDCG@k with
    * binary chunk relevance (chunk relevant ⇔ its doc_id == goldDocId).
    * IDCG uses min(#relevant chunks in corpus, k) ideal positions
    * (dcg at evaluate.py:417).
    *
    * Executes as ONE plan: queries broadcast against the chunk table,
    * ranked per query by the two-phase sharded window ([[shardedTopK]])
    * — no per-query loop, and no task ever holds corpus×queries rows.
    */
  /** Deterministic EVALUATE-KB test-set generation — the reference
    * generates a Q/A test set from sampled documents before scoring
    * (knowledge_base/evaluate.py:82-520, LLM-backed there; here a
    * deterministic keyword extractor behind the same shape, so the LLM
    * generator drops in when egress unblocks): sample n chunks in
    * md5(chunk_id) order (reproducible in any engine), take the first 3
    * words longer than 4 chars as the query text, gold = the chunk's
    * source doc. One narrow plan: sort + limit + per-row expressions. */
  def generateTestSet(chunks: DataFrame, n: Int): DataFrame =
    chunks
      .orderBy(md5(col("chunk_id")), col("chunk_id"))
      .limit(n)
      .select(
        col("chunk_id").as("query_id"),
        array_join(
          slice(filter(split(col("content"), " "), w => length(w) > 4), 1, 3),
          " ").as("query_text"),
        col("doc_id").as("gold_doc_id"))

  /** The reference's remaining retrieval metrics beside hit@k/NDCG
    * (knowledge_base/evaluate.py:330-470 mean_mrr /
    * avg_first_relevant_position, :499-560 EvaluateDocID's
    * total_found / accurate_in_top_10 / cumulative recall curve): one
    * summary row over the same one-plan ranked retrieval as [[evaluate]].
    * Positions are 0-based like the reference's doc_position;
    * reciprocal ranks are rounded to 4dp and summed as exact decimals so
    * the mean is order-insensitive across partitions. */
  def evaluateRetrievalSummary(chunks: DataFrame, queries: DataFrame,
                               k: Int = 20): DataFrame = {
    val q = broadcast(queries
      .withColumn("qv", embed(col("query_text")))
      .select(col("query_id"), col("qv"), col("gold_doc_id")))
    val scored = chunks.crossJoin(q)
      .withColumn("relevance", relevanceOf(round(lit(1.0) - cosineSim(col("emb"), col("qv")), 4)))
    val ranked = shardedTopK(scored, col("query_id"),
        Seq(col("relevance").desc, col("chunk_id")), k, "pos", col("chunk_id"))
      .withColumn("rel", when(col("doc_id") === col("gold_doc_id"), 1).otherwise(0))
    val perQuery = ranked.groupBy(col("query_id"))
      .agg(min(when(col("rel") === 1, col("pos"))).as("first_pos")) // 1-based, null = not found
      .withColumn("rr", round(when(col("first_pos").isNotNull,
        lit(1.0) / col("first_pos")).otherwise(0.0), 4))
    perQuery.agg(
      count(lit(1)).as("total_questions"),
      sum(when(col("first_pos").isNotNull, 1L).otherwise(0L)).as("total_found"),
      sum(when(col("first_pos") <= 10, 1L).otherwise(0L)).as("accurate_in_top_10"),
      round(sum(when(col("first_pos").isNotNull, col("first_pos") - 1))
          .cast("double") /
        sum(when(col("first_pos").isNotNull, 1L).otherwise(0L)), 4)
        .as("avg_first_relevant_position"),
      round(sum(col("rr").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .cast("double") / count(lit(1)), 4).as("mean_mrr"),
      round(sum(when(col("first_pos") <= 1, 1.0).otherwise(0.0)) / count(lit(1)), 4)
        .as("recall_at_1"),
      round(sum(when(col("first_pos") <= 5, 1.0).otherwise(0.0)) / count(lit(1)), 4)
        .as("recall_at_5"),
      round(sum(when(col("first_pos") <= 10, 1.0).otherwise(0.0)) / count(lit(1)), 4)
        .as("recall_at_10"))
  }

  def evaluate(chunks: DataFrame, queries: DataFrame, k: Int = DefaultLimit): DataFrame = {
    val q = broadcast(queries
      .withColumn("qv", embed(col("query_text")))
      .select(col("query_id"), col("qv"), col("gold_doc_id")))
    val scored = chunks.crossJoin(q)
      .withColumn("relevance", relevanceOf(round(lit(1.0) - cosineSim(col("emb"), col("qv")), 4)))
    val ranked = shardedTopK(scored, col("query_id"),
        Seq(col("relevance").desc, col("chunk_id")), k, "pos", col("chunk_id"))
      .withColumn("rel", when(col("doc_id") === col("gold_doc_id"), 1).otherwise(0))
    val perQuery = ranked.groupBy(col("query_id"))
      .agg(
        max(when(col("pos") === 1, col("rel")).otherwise(0)).as("hit1"),
        max(col("rel")).as(s"hit$k"),
        sum(col("rel").cast("double") / log2(col("pos") + 1)).as("dcg"))
    val corpusRel = chunks.join(
        broadcast(queries.select(col("query_id"), col("gold_doc_id"))),
        col("doc_id") === col("gold_doc_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    perQuery.join(corpusRel, Seq("query_id"), "left_outer")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("idcg", expr(
        s"aggregate(sequence(1, int(least(n_rel, $k))), cast(0.0 as double), (acc, i) -> acc + 1.0 / log2(i + 1))"))
      .withColumn(s"ndcg$k",
        when(col("idcg") > 0, round(col("dcg") / col("idcg"), 4)).otherwise(lit(0.0)))
      .select(col("query_id"), col("n_rel"), col("hit1"), col(s"hit$k"), col(s"ndcg$k"))
      .orderBy(col("query_id"))
  }
}

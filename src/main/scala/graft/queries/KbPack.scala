package graft.queries

import graft.engine.Tables
import graft.kb.Kb
import graft.kb.Kb._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knowledge-base operator pack (SURVEY §2.10): chunked ingest, semantic
  * search with metadata filters + relevance thresholds, boolean set
  * algebra, skip-existing ingest, hybrid keyword blend, and EVALUATE
  * metrics — each with a DuckDB oracle reproducing the deterministic
  * md5 stub embedder bit-for-bit.
  *
  * Reference: mindsdb/interfaces/knowledge_base/controller.py:168-760,
  * executor.py:28-395, evaluate.py:82-520.
  */
object KbPack extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  // the chunk+embedding store is the derived table a production engine
  // materializes once per corpus snapshot (exactly the g-pack edge-list /
  // d-pack CC contract): fingerprint-keyed, rebuilt when documents.parquet
  // changes, shared by every k-query instead of re-chunking per query
  private def kb(s: SparkSession, dir: String): DataFrame =
    graft.engine.SharedFrames.shared("kb_chunks", s, dir,
      Seq("documents.parquet"))(Kb.ingest(docs(s, dir)))

  // query strings drawn from the corpus vocabulary (keyword arm needs overlap)
  private val QueryA = "table scan filter join"
  private val QueryB = "window agg spark batch"
  private val QueryNeg = "slow value row"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "k01_kb_chunk_ingest" -> ((s, dir) => {
      Kb.chunk(docs(s, dir))
        .select(col("chunk_id"), col("doc_id"), col("chunk_ix"), col("n_chunks"),
          col("start_c"), col("end_c"), col("content"), col("lang"), col("source"))
        .orderBy(col("doc_id"), col("chunk_ix"))
    }),

    "k02_kb_semantic_search" -> ((s, dir) => {
      vectorSearch(kb(s, dir), QueryA, limit = 10)
        .select(col("chunk_id"), col("doc_id"), col("relevance"))
        .orderBy(col("relevance").desc, col("chunk_id"))
    }),

    // faceted search (the vector-store sidebar every retrieval UI
    // renders): top-100 semantic hits, then counts per metadata field —
    // the facet rollup runs on the ALREADY-LIMITED result set, so its
    // cost is O(limit), not corpus-sized, at any scale
    "k19_kb_facets" -> ((s, dir) => {
      val res = vectorSearch(kb(s, dir), QueryA, limit = 100)
      val langF = res.groupBy(col("lang").as("value")).agg(count(lit(1)).as("n"))
        .select(lit("lang").as("facet"), col("value"), col("n"))
      val srcF = res.groupBy(col("source").as("value")).agg(count(lit(1)).as("n"))
        .select(lit("source").as("facet"), col("value"), col("n"))
      langF.unionByName(srcF).orderBy(col("facet"), col("value"))
    }),

    "k03_kb_meta_threshold" -> ((s, dir) => {
      vectorSearch(kb(s, dir), QueryA,
        metaFilter = col("lang") === "en" && col("source").isin("src1", "src7", "src12"),
        limit = 100, minRelevance = Some(0.62))
        .select(col("chunk_id"), col("doc_id"), col("source"), col("relevance"))
        .orderBy(col("relevance").desc, col("chunk_id"))
    }),

    "k04_kb_bool_algebra" -> ((s, dir) => {
      // (content=A AND content!=Neg AND lang='en') OR (content=B AND source='src7')
      val cond = Or(Seq(
        And(Seq(ContentIs(QueryA), ContentNot(QueryNeg), Meta(col("lang") === "en"))),
        And(Seq(ContentIs(QueryB), Meta(col("source") === "src7")))))
      Kb.search(kb(s, dir), cond, limit = 10)
        .select(col("chunk_id"), col("doc_id"), col("relevance"))
        .orderBy(col("chunk_id"))
    }),

    "k05_kb_hybrid" -> ((s, dir) => {
      hybridSearch(kb(s, dir), QueryA, alpha = 0.5, limit = 10)
        .select(col("chunk_id"), col("doc_id"), col("distance"), col("relevance"))
        .orderBy(col("relevance").desc, col("chunk_id"))
    }),

    "k06_kb_skip_existing" -> ((s, dir) => {
      val all = kb(s, dir)
      val existing = Kb.ingest(docs(s, dir).filter(col("doc_id") < 250))
      skipExisting(all, existing)
        .select(col("chunk_id"), col("doc_id"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // batch retrieval (the RAG-at-scale read: MANY questions against one
    // KB in a single plan, not a per-question loop): the query table
    // broadcasts, scoring is map-side over the chunk store, and top-3
    // per query is a TWO-PHASE ranked window — phase 1 partitions by
    // (query, 64-way chunk shard) so no task ever holds corpus×query
    // rows, phase 2 ranks the ≤ 64×3 shard winners per query. A single
    // window keyed only on query_id would pin one whole-corpus task per
    // question at 100 TB.
    "k17_kb_batch_search" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosineSim
      val sp = s
      import sp.implicits._
      val qs = Seq((1L, QueryA), (2L, QueryB), (3L, QueryNeg)).toDF("query_id", "qtext")
        .withColumn("qv", Kb.embed(col("qtext"))).select(col("query_id"), col("qv"))
      val scored = kb(s, dir).crossJoin(broadcast(qs))
        .withColumn("distance", round(lit(1.0) - cosineSim(col("emb"), col("qv")), 4))
        .withColumn("relevance", Kb.relevanceOf(col("distance")))
      Kb.shardedTopK(scored, col("query_id"),
          Seq(col("relevance").desc, col("chunk_id")), 3, "rank", col("chunk_id"))
        .select(col("query_id"), col("rank"), col("chunk_id"), col("doc_id"), col("relevance"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // MMR diversity rerank (Carbonell & Goldstein 1998) — the RAG
    // answer-diversity pass beside k08's relevance-boost reranker:
    // distributed ranked retrieval over-fetches the top-8, then the
    // greedy λ·rel − (1−λ)·maxSim selection runs on the CANDIDATE set
    // only (8 rows on the driver — model-sized; the corpus never leaves
    // the executors, the same shape as k08's rerank window). Every pair
    // similarity and every MMR score rounds to 4dp BEFORE each argmax,
    // and the penalty weight is the literal 0.3 (not 1−0.7, which is
    // 0.30000000000000004 in IEEE), so both engines walk the identical
    // (score DESC, chunk_id) greedy path.
    "k18_kb_mmr" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosineSim
      val base = kb(s, dir)
        .withColumn("qv", Kb.embed(lit(QueryA)))
        .withColumn("distance", round(lit(1.0) - cosineSim(col("emb"), col("qv")), 4))
        .withColumn("relevance", Kb.relevanceOf(col("distance")))
      val cands = base.orderBy(col("relevance").desc, col("chunk_id")).limit(8)
        .select(col("chunk_id"), col("relevance"), col("emb")).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val byId = cands.map(c => c._1 -> c._3).toMap
      val first = cands.minBy { case (id, rel, _) => (-rel, id) }
      val selected = scala.collection.mutable.ArrayBuffer(
        (first._1, r4(0.7 * first._2)))
      var remaining = cands.toVector.filterNot(_._1 == first._1)
      while (selected.size < 4 && remaining.nonEmpty) {
        val scored = remaining.map { case (id, rel, v) =>
          val penalty = selected.map(sel => r4(cos(v, byId(sel._1)))).max
          (id, r4(0.7 * rel - 0.3 * penalty))
        }
        val best = scored.minBy { case (id, sc) => (-sc, id) }
        selected += best
        remaining = remaining.filterNot(_._1 == best._1)
      }
      val sp = s
      import sp.implicits._
      selected.toSeq.zipWithIndex
        .map { case ((id, sc), i) => (i + 1, id, sc) }
        .toDF("rank", "chunk_id", "mmr_score")
    }),

    "k08_kb_rerank" -> ((s, dir) => {
      // over-fetch ×2 → rerank (keyword-boost stub standing in for the
      // LLM listwise reranker) → cut back to limit
      vectorSearch(kb(s, dir), QueryA, limit = 10,
        reranker = Some(new KeywordBoostReranker))
        .select(col("chunk_id"), col("doc_id"), col("relevance"))
        .orderBy(col("relevance").desc, col("chunk_id"))
    }),

    "k09_kb_bm25" -> ((s, dir) => {
      // stats computed once at index-build time (here: once per query
      // build), then passed in — the search plan contains no corpus agg
      val chunks = kb(s, dir)
      bm25Score(chunks, QueryA, stats = Some(corpusStats(chunks)))
        .orderBy(col("bm25").desc, col("chunk_id"))
        .limit(10)
        .select(col("chunk_id"), col("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("chunk_id"))
    }),

    // ContextualPreprocessor (document_preprocessor.py:118): every chunk
    // carries an LLM-situated context prepended to its content
    "k13_contextual_chunks" -> ((s, dir) => {
      Kb.contextualChunk(docs(s, dir).filter(col("doc_id") < 50))
        .select(col("chunk_id"), col("doc_id"), col("chunk_ix"), col("content"))
        .orderBy(col("doc_id"), col("chunk_ix"))
    }),

    // JSON chunker (preprocessing/json_chunker.py): per-field chunks with
    // one-level flattening. The JSON column is built from document
    // columns, so the oracle can state the expected chunks independently
    // without parsing JSON itself.
    "k10_json_chunks" -> ((s, dir) => {
      val jdocs = docs(s, dir).select(col("doc_id"), to_json(struct(
        col("lang"), col("source"),
        struct(col("doc_id").as("id"), length(col("text")).as("len")).as("meta"))).as("j"))
      Kb.chunkJson(jdocs)
        .select(col("chunk_id"), col("doc_id"), col("chunk_ix"), col("n_chunks"),
          col("field_name"), col("content"))
        .orderBy(col("doc_id"), col("chunk_ix"))
    }),

    // k04's boolean algebra as pure SQL through the statement router:
    // the WHERE tree compiles to the same condition objects (KbSql)
    "k11_kb_bool_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE kbq USING content_columns='text'")
      c.execute("INSERT INTO kbq SELECT doc_id, text, lang, source FROM documents")
      c.execute(s"""SELECT * FROM kbq WHERE
          (content = '$QueryA' AND content != '$QueryNeg' AND lang = 'en')
          OR (content = '$QueryB' AND source = 'src7') LIMIT 10""")
        .select(col("chunk_id"), col("doc_id"), col("relevance"))
        .orderBy(col("chunk_id"))
    }),

    // KB search nested in a CTE with an ALIASED kb relation — the shape
    // only the one-parse route sees (the regex route needs a bare
    // top-level `SELECT * FROM <kb> WHERE`); same executor semantics
    "k16_kb_cte_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE kbc USING content_columns='text'")
      c.execute("INSERT INTO kbc SELECT doc_id, text, lang, source FROM documents")
      c.execute(s"""WITH hits AS (
          SELECT chunk_id, doc_id, relevance FROM kbc AS kb
          WHERE content = '$QueryA' AND lang = 'en')
        SELECT chunk_id, doc_id, relevance FROM hits ORDER BY chunk_id""")
    }),

    // KB ⋈ table on the statement surface (reference test_join_kb_table:
    // `FROM kb k JOIN t ON t.x = k.id WHERE k.content = …`): the
    // search conditions split out of the WHERE, the semantic top-k
    // replaces the KB leaf, and the table joins the |k| result — so the
    // join cost is k×table-lookup, never corpus×table
    "k21_kb_join_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE kbj USING content_columns='text'")
      c.execute("INSERT INTO kbj SELECT doc_id, text, lang, source FROM documents")
      c.execute(s"""SELECT d.lang, d.source, k.chunk_id, k.id, k.relevance
        FROM kbj k JOIN documents d ON d.doc_id = k.id
        WHERE k.content = '$QueryA' AND k.relevance > 0.6
        ORDER BY k.relevance DESC, k.chunk_id""")
    }),

    // re-ingest REPLACES a document's stored chunks (controller.py insert
    // path, test_duplicated_ids): docs < 100 are re-inserted with
    // truncated 1-chunk content — their old multi-chunk layout must
    // disappear entirely; docs >= 100 keep theirs. The drop is one
    // anti-join delete (Warehouse.deleteMatching), never an id loop.
    "k22_kb_reingest_replace" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE kbrr USING content_columns='text'")
      c.execute("INSERT INTO kbrr SELECT doc_id, text, lang, source FROM documents")
      c.execute("""INSERT INTO kbrr SELECT doc_id, substr(text, 1, 50) AS text,
        lang, source FROM documents WHERE doc_id < 100""")
      c.execute("""SELECT doc_id < 100 AS reingested, COUNT(*) AS n_chunks,
        COUNT(DISTINCT doc_id) AS n_docs
        FROM kbrr GROUP BY doc_id < 100 ORDER BY reingested""")
    }),

    // k05's hybrid blend as pure SQL: mode switches ride in the WHERE
    // clause as params (controller.py:286-342)
    "k12_kb_hybrid_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE kbh USING content_columns='text'")
      c.execute("INSERT INTO kbh SELECT doc_id, text, lang, source FROM documents")
      c.execute(s"""SELECT * FROM kbh WHERE content = '$QueryA'
          AND hybrid_search = true AND hybrid_search_alpha = 0.5 LIMIT 10""")
        .select(col("chunk_id"), col("doc_id"), col("distance"), col("relevance"))
        .orderBy(col("relevance").desc, col("chunk_id"))
    }),

    // full KB lifecycle through DDL: create with kb_skip_existing, ingest
    // a subset, re-ingest everything (dupes skipped), inventory per doc
    "c02_ddl_kb_roundtrip" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE KNOWLEDGE BASE kbr USING
        content_columns='text', kb_skip_existing='true'""")
      c.execute("INSERT INTO kbr SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 250")
      c.execute("INSERT INTO kbr SELECT doc_id, text, lang, source FROM documents")
      c.execute("SELECT doc_id, count(*) AS n_chunks FROM kbr GROUP BY doc_id ORDER BY doc_id")
    }),

    // IVF-indexed semantic search: the 100 TB path — cell assignment at
    // ingest, query probes 2 of 8 cells and scores only those lists
    "k14_kb_ivf_search" -> ((s, dir) => {
      val (indexed, cents) = Kb.ivfIndex(kb(s, dir), nCent = 8)
      Kb.vectorSearchIvf(indexed, cents, QueryA, nProbe = 2, limit = 10)
        .select(col("chunk_id"), col("doc_id"), col("cell"), col("relevance"))
        .orderBy(col("relevance").desc, col("chunk_id"))
    }),

    "k07_kb_evaluate" -> ((s, dir) => {
      val queries = docs(s, dir).filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"),
          col("text").substr(lit(1), lit(ChunkSize)).as("query_text"),
          col("doc_id").as("gold_doc_id"))
      Kb.evaluate(kb(s, dir), queries, k = 10)
    }),

    // EVALUATE KB metric breadth (evaluate.py:330-470 + :499-560): the
    // summary row with mean MRR, doc-id hit-rate breakdown
    // (total_found / accurate_in_top_10), average first-relevant
    // position, and the cumulative recall curve at 1/5/10 — same
    // one-plan ranked retrieval, hand-computable on the deterministic
    // test set
    "k23_kb_evaluate_metrics" -> ((s, dir) => {
      val queries = docs(s, dir).filter(col("doc_id") < 12)
        .select(col("doc_id").as("query_id"),
          col("text").substr(lit(1), lit(ChunkSize)).as("query_text"),
          col("doc_id").as("gold_doc_id"))
      Kb.evaluateRetrievalSummary(kb(s, dir), queries, k = 20)
    }),

    // EVALUATE KB with a GENERATED test set (evaluate.py:82-520 first
    // builds Q/A pairs from sampled documents, then scores): the
    // deterministic generator samples 8 chunks in md5 order, extracts a
    // keyword query from each (gold = its source doc), and the same
    // hit@k/NDCG scoring runs over them — generation + scoring in ONE
    // plan, no driver loop
    "k20_kb_evaluate_generated" -> ((s, dir) => {
      val chunks = kb(s, dir)
      Kb.evaluate(chunks, Kb.generateTestSet(chunks, 8), k = 10)
    }),

    // CREATE INDEX ON KNOWLEDGE_BASE through SQL: ingest, build the IVF
    // index (chunk store re-laid-out hive-style by cell), search through
    // the probed path (command_executor.py:968 answer_create_kb_index)
    "k15_kb_index_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE kbx USING content_columns='text'")
      c.execute("INSERT INTO kbx SELECT doc_id, text, lang, source FROM documents")
      c.execute("CREATE INDEX ON KNOWLEDGE_BASE kbx WITH (nlist=8, nprobe=2)")
      c.execute(s"SELECT * FROM kbx WHERE content = '$QueryA' LIMIT 10")
        .select(col("chunk_id"), col("doc_id"), col("relevance"))
        .orderBy(col("relevance").desc, col("chunk_id"))
    }),

    // retrieval-augmented agent: CREATE AGENT linked to a KB answers
    // from its top retrieved chunk (agents data={knowledge_bases:[…]},
    // agents_controller.py:33-52)
    "a03_agent_rag" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE ragkb USING content_columns='text'")
      c.execute("""INSERT INTO ragkb SELECT doc_id, text, lang, source
        FROM documents WHERE doc_id < 20""")
      c.execute("CREATE AGENT raga USING model='default', knowledge_bases='ragkb'")
      c.execute("SELECT question, answer FROM raga WHERE question = 'table scan strategy'")
    }),

    // MULTI-SKILL agent, ordered first-capable-answers dispatch
    // (agent_skills association db.py:423/434: one agent composes a KB
    // retrieval skill AND a text2sql skill). The KB skill answers only
    // when its top chunk is lexically grounded in the question; the
    // row-count question shares no terms with the corpus, so it falls
    // through to the text2sql skill's allowlisted aggregation — both
    // skills exercised in one session.
    "a05_agent_multiskill" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("CREATE KNOWLEDGE BASE mskb USING content_columns='text'")
      c.execute("""INSERT INTO mskb SELECT doc_id, text, lang, source
        FROM documents WHERE doc_id < 20""")
      c.execute("CREATE SKILL ksk_a05 USING type='knowledge_base', source='mskb'")
      c.execute("CREATE SKILL ssk_a05 USING type='text2sql', database='graft', tables='orders,customer'")
      c.execute("CREATE AGENT msag USING model='default', skills='ksk_a05,ssk_a05'")
      val r1 = c.execute(
        "SELECT question, answer FROM msag WHERE question = 'explain the hash merge window strategy'")
      val r2 = c.execute(
        "SELECT question, answer FROM msag WHERE question = 'how many rows are in orders?'")
      r1.unionByName(r2).orderBy(col("question"))
    })
  )

  // ------------------------------------------------------------- oracles

  /** DuckDB spelling of the chunk + embed pipeline (shared CTE prefix);
    * `where` filters the source documents. */
  private def oPrefixWhere(where: String) = s"""
    WITH docsrc AS (SELECT doc_id, text, lang, source, length(text) AS len FROM documents $where),
    nch AS (SELECT *, CASE WHEN len <= $ChunkSize THEN CAST(1 AS BIGINT)
      ELSE CAST(CEIL((len - $ChunkSize.0)/$Step.0) AS BIGINT) + 1 END AS n_chunks FROM docsrc),
    chunks AS (
      SELECT doc_id, lang, source, n_chunks, i AS chunk_ix, i*$Step AS start_c,
        LEAST(i*$Step+$ChunkSize, len) AS end_c,
        substr(text, CAST(i*$Step+1 AS INT), $ChunkSize) AS content,
        doc_id || ':text:' || (i+1) || 'of' || n_chunks || ':' || (i*$Step) || 'to' ||
          LEAST(i*$Step+$ChunkSize, len) AS chunk_id
      FROM nch, UNNEST(generate_series(0, n_chunks - 1)) AS t(i)),
    emb AS (SELECT *, ${oEmbed("content")} AS v FROM chunks)"""

  private val oPrefix = oPrefixWhere("")

  /** cosine(v, q) with the same sequential-fold shape as CosineSimilarity */
  private def oCos(q: String) =
    s"""list_sum(list_transform(range(1, ${Dim + 1}), i -> v[i]*$q[i])) /
       (sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> v[i]*v[i]))) *
        sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> $q[i]*$q[i]))))"""

  private def oRel(q: String) = s"ROUND(1.0/(1.0+ROUND(1.0-(${oCos(q)}),4)),4)"

  /** SQL string literal quoting for oracle text. */
  private def sq(s: String) = "'" + s.replace("'", "''") + "'"

  def oracles: Map[String, String] = Map(
    "a03_agent_rag" -> s"""${oPrefixWhere("WHERE doc_id < 20")},
      qv AS (SELECT ${oEmbed(sq("table scan strategy"))} AS q),
      scored AS (SELECT chunk_id, content,
        ROUND(1.0-(${oCos("q")}), 4) AS dist FROM emb, qv),
      top1 AS (SELECT content FROM scored ORDER BY dist, chunk_id LIMIT 1),
      p AS (SELECT 'table scan strategy ctx: ' || content AS prompt FROM top1)
      SELECT 'table scan strategy' AS question,
        'LLM[' || substr(md5(prompt), 1, 8) || ']: ' || upper(substr(prompt, 1, 24)) AS answer
      FROM p""",

    // q1 routes to the KB skill (top chunk shares 'merge'/'the' with the
    // question); q2 shares no ≥3-char token with its top chunk, so the
    // text2sql skill answers from the allowlist — the oracle re-derives
    // the KB answer and states the aggregation answer
    "a05_agent_multiskill" -> s"""${oPrefixWhere("WHERE doc_id < 20")},
      qv AS (SELECT ${oEmbed(sq("explain the hash merge window strategy"))} AS q),
      scored AS (SELECT chunk_id, content,
        ROUND(1.0-(${oCos("q")}), 4) AS dist FROM emb, qv),
      top1 AS (SELECT content FROM scored ORDER BY dist, chunk_id LIMIT 1),
      p AS (SELECT 'explain the hash merge window strategy ctx: ' || content AS prompt FROM top1)
      SELECT question, answer FROM (
        SELECT 'explain the hash merge window strategy' AS question,
          'LLM[' || substr(md5(prompt), 1, 8) || ']: ' || upper(substr(prompt, 1, 24)) AS answer
        FROM p
        UNION ALL
        SELECT 'how many rows are in orders?' AS question,
          'orders has ' || (SELECT COUNT(*) FROM orders) || ' rows' AS answer
      ) ORDER BY question""",


    "k01_kb_chunk_ingest" -> s"""$oPrefix
      SELECT chunk_id, doc_id, chunk_ix, n_chunks, start_c, end_c, content, lang, source
      FROM chunks ORDER BY doc_id, chunk_ix""",

    // one flat window suffices in DuckDB — the two-phase shard ranking
    // on the Spark side selects the identical top-3 (a global top-3 is
    // always within its shard's top-3)
    "k17_kb_batch_search" -> s"""$oPrefix,
      qs AS (
        SELECT CAST(1 AS BIGINT) AS query_id, ${oEmbed(sq(QueryA))} AS q
        UNION ALL SELECT 2, ${oEmbed(sq(QueryB))}
        UNION ALL SELECT 3, ${oEmbed(sq(QueryNeg))}),
      scored AS (
        SELECT query_id, chunk_id, doc_id, ${oRel("q")} AS relevance FROM emb, qs),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY relevance DESC, chunk_id) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, chunk_id, doc_id, relevance
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",

    // the same greedy unrolled: pairwise 4dp-rounded similarities, the
    // literal 0.3 penalty weight, (score DESC, chunk_id) argmax per round
    "k18_kb_mmr" -> {
      def selSet(r: Int) =
        (1 to r).map(i => s"SELECT chunk_id FROM s$i").mkString(" UNION ALL ")
      def mmrRound(r: Int): String = s"""
        r$r AS (
          SELECT c.chunk_id,
            ROUND(CAST(0.7 AS DOUBLE) * c.relevance - CAST(0.3 AS DOUBLE) *
              (SELECT MAX(s) FROM sim
               WHERE ci = c.chunk_id AND cj IN (${selSet(r - 1)})), 4) AS score
          FROM cand c WHERE c.chunk_id NOT IN (${selSet(r - 1)})),
        s$r AS (SELECT chunk_id, score FROM r$r ORDER BY score DESC, chunk_id LIMIT 1)"""
      s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      scored AS (SELECT chunk_id, ${oRel("q")} AS relevance, v FROM emb, qv),
      cand AS MATERIALIZED (
        SELECT * FROM scored ORDER BY relevance DESC, chunk_id LIMIT 8),
      sim AS MATERIALIZED (
        SELECT a.chunk_id AS ci, b.chunk_id AS cj,
          ROUND(list_sum(list_transform(range(1, ${Dim + 1}), i -> a.v[i]*b.v[i])) /
            (sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> a.v[i]*a.v[i]))) *
             sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> b.v[i]*b.v[i])))), 4) AS s
        FROM cand a, cand b WHERE a.chunk_id <> b.chunk_id),
      s1 AS (SELECT chunk_id, ROUND(CAST(0.7 AS DOUBLE) * relevance, 4) AS score
             FROM cand ORDER BY relevance DESC, chunk_id LIMIT 1),
      ${(2 to 4).map(mmrRound).mkString(",")}
      SELECT * FROM (
        SELECT CAST(1 AS INTEGER) AS rank, chunk_id, score AS mmr_score FROM s1
        UNION ALL SELECT 2, chunk_id, score FROM s2
        UNION ALL SELECT 3, chunk_id, score FROM s3
        UNION ALL SELECT 4, chunk_id, score FROM s4)
      ORDER BY rank"""
    },

    "k02_kb_semantic_search" -> s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      scored AS (SELECT chunk_id, doc_id, ${oRel("q")} AS relevance FROM emb, qv)
      SELECT * FROM (SELECT * FROM scored ORDER BY relevance DESC, chunk_id LIMIT 10)
      ORDER BY relevance DESC, chunk_id""",

    "k19_kb_facets" -> s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      scored AS (SELECT chunk_id, lang, source, ${oRel("q")} AS relevance FROM emb, qv),
      top AS (SELECT * FROM scored ORDER BY relevance DESC, chunk_id LIMIT 100)
      SELECT facet, value, n FROM (
        SELECT 'lang' AS facet, lang AS value, COUNT(*) AS n FROM top GROUP BY lang
        UNION ALL
        SELECT 'source', source, COUNT(*) FROM top GROUP BY source)
      ORDER BY facet, value""",

    "k03_kb_meta_threshold" -> s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      scored AS (SELECT chunk_id, doc_id, source, ${oRel("q")} AS relevance FROM emb, qv
        WHERE lang = 'en' AND source IN ('src1', 'src7', 'src12'))
      SELECT * FROM (SELECT * FROM scored WHERE relevance > 0.62
        ORDER BY relevance DESC, chunk_id LIMIT 100)
      ORDER BY relevance DESC, chunk_id""",

    "k04_kb_bool_algebra" -> s"""$oPrefix,
      qa AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      qb AS (SELECT ${oEmbed(sq(QueryB))} AS q),
      qn AS (SELECT ${oEmbed(sq(QueryNeg))} AS q),
      excl AS (SELECT chunk_id FROM (
          SELECT chunk_id, ${oRel("q")} AS relevance FROM emb, qn WHERE lang = 'en'
          ORDER BY relevance DESC, chunk_id LIMIT $NegativeSetSize)
        WHERE relevance >= $NegativeSetThreshold),
      arm1 AS (SELECT * FROM (
        SELECT chunk_id, doc_id, ${oRel("q")} AS relevance FROM emb, qa
        WHERE lang = 'en' AND chunk_id NOT IN (SELECT chunk_id FROM excl)
        ORDER BY relevance DESC, chunk_id LIMIT 10)),
      arm2 AS (SELECT * FROM (
        SELECT chunk_id, doc_id, ${oRel("q")} AS relevance FROM emb, qb
        WHERE source = 'src7'
        ORDER BY relevance DESC, chunk_id LIMIT 10))
      SELECT * FROM (
        SELECT * FROM arm1
        UNION ALL
        SELECT * FROM arm2 WHERE chunk_id NOT IN (SELECT chunk_id FROM arm1))
      ORDER BY chunk_id""",

    "k05_kb_hybrid" -> {
      val qn = QueryA.trim.toLowerCase.split("\\s+").distinct.length
      s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      qt AS (SELECT list_distinct(regexp_extract_all(lower(${sq(QueryA)}), '\\S+')) AS qtoks),
      vec AS (SELECT chunk_id, doc_id,
          ROUND((1.0-(${oCos("q")}))*0.5, 4) AS arm_distance, 0 AS arm FROM emb, qv),
      kw AS (SELECT chunk_id, doc_id,
          ROUND((1.0 - len(list_intersect(list_distinct(regexp_extract_all(lower(content), '\\S+')), qtoks))/$qn.0)*0.5, 4) AS arm_distance,
          1 AS arm FROM chunks, qt),
      merged AS (SELECT chunk_id, doc_id, arm_distance,
          ROW_NUMBER() OVER (PARTITION BY chunk_id ORDER BY arm_distance, arm) AS rn
        FROM (SELECT * FROM vec UNION ALL SELECT * FROM kw)),
      blended AS (SELECT chunk_id, doc_id, arm_distance AS distance,
          ROUND(1.0/(1.0+arm_distance), 4) AS relevance FROM merged WHERE rn = 1)
      SELECT * FROM (SELECT * FROM blended ORDER BY relevance DESC, chunk_id LIMIT 10)
      ORDER BY relevance DESC, chunk_id"""
    },

    "k06_kb_skip_existing" -> s"""$oPrefix
      SELECT chunk_id, doc_id FROM chunks
      WHERE chunk_id NOT IN (SELECT chunk_id FROM chunks WHERE doc_id < 250)
      ORDER BY doc_id, chunk_id""",

    "k08_kb_rerank" -> {
      val qn = QueryA.trim.toLowerCase.split("\\s+").distinct.length
      s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      qt AS (SELECT list_distinct(regexp_extract_all(lower(${sq(QueryA)}), '\\S+')) AS qtoks),
      page AS (SELECT * FROM (
        SELECT chunk_id, doc_id, content, ${oRel("q")} AS relevance FROM emb, qv
        ORDER BY relevance DESC, chunk_id LIMIT 20)),
      reranked AS (SELECT chunk_id, doc_id,
          ROUND(relevance * 0.5 +
            CAST(len(list_intersect(list_distinct(regexp_extract_all(lower(content), '\\S+')), qtoks)) AS DOUBLE) / $qn * 0.5, 4) AS relevance
        FROM page, qt)
      SELECT * FROM (SELECT * FROM reranked WHERE relevance >= 0.0
        ORDER BY relevance DESC, chunk_id LIMIT 10)
      ORDER BY relevance DESC, chunk_id"""
    },

    "k09_kb_bm25" -> {
      val terms = QueryA.trim.toLowerCase.split("\\s+").distinct
        .map(t => s"'$t'").mkString(", ")
      s"""$oPrefix,
      base AS (SELECT chunk_id, doc_id,
          regexp_extract_all(lower(content), '\\S+') AS terms FROM chunks),
      stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(len(terms)) AS DOUBLE) / COUNT(*) AS avgdl FROM base),
      posts AS (SELECT chunk_id, doc_id, len(terms) AS dl, unnest(terms) AS term FROM base),
      tf AS (SELECT chunk_id, doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM posts WHERE term IN ($terms) GROUP BY chunk_id, doc_id, dl, term),
      dfx AS (SELECT term, CAST(COUNT(DISTINCT chunk_id) AS DOUBLE) AS df FROM tf GROUP BY term),
      contribs AS (SELECT chunk_id, doc_id,
          ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
            (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS contrib
        FROM tf JOIN dfx USING (term), stats),
      scored AS (SELECT chunk_id, doc_id,
          ROUND(list_sum(list_sort(list(contrib))), 4) AS bm25
        FROM contribs GROUP BY chunk_id, doc_id)
      SELECT * FROM (SELECT * FROM scored ORDER BY bm25 DESC, chunk_id LIMIT 10)
      ORDER BY bm25 DESC, chunk_id"""
    },

    "k13_contextual_chunks" -> s"""${oPrefixWhere("WHERE doc_id < 50")},
      withdoc AS (SELECT c.chunk_id, c.doc_id, c.chunk_ix, c.content, d.text
        FROM chunks c JOIN documents d USING (doc_id)),
      prompts AS (SELECT chunk_id, doc_id, chunk_ix, content,
          ${sq(Kb.CtxPromptPrefix)} || text || ${sq(Kb.CtxPromptMid)} ||
          content || ${sq(Kb.CtxPromptSuffix)} AS p
        FROM withdoc)
      SELECT chunk_id, doc_id, chunk_ix,
        'LLM[' || substr(md5(p), 1, 8) || ']: ' || upper(substr(p, 1, 24)) ||
          chr(10) || chr(10) || content AS content
      FROM prompts ORDER BY doc_id, chunk_ix""",

    "k10_json_chunks" -> """
      WITH fields AS (
        SELECT doc_id, 1 AS chunk_ix, 'lang' AS field_name,
          'lang: ' || lang AS content FROM documents
        UNION ALL
        SELECT doc_id, 2, 'source', 'source: ' || source FROM documents
        UNION ALL
        SELECT doc_id, 3, 'meta',
          'meta.id: ' || doc_id || chr(10) || 'meta.len: ' || length(text)
        FROM documents)
      SELECT doc_id || ':j:' || chunk_ix || 'of3:0to' || length(content) AS chunk_id,
        doc_id, CAST(chunk_ix AS BIGINT) AS chunk_ix, CAST(3 AS BIGINT) AS n_chunks,
        field_name, content
      FROM fields ORDER BY doc_id, chunk_ix""",

    "k11_kb_bool_sql" -> s"""$oPrefix,
      qa AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      qb AS (SELECT ${oEmbed(sq(QueryB))} AS q),
      qn AS (SELECT ${oEmbed(sq(QueryNeg))} AS q),
      excl AS (SELECT chunk_id FROM (
          SELECT chunk_id, ${oRel("q")} AS relevance FROM emb, qn WHERE lang = 'en'
          ORDER BY relevance DESC, chunk_id LIMIT $NegativeSetSize)
        WHERE relevance >= $NegativeSetThreshold),
      arm1 AS (SELECT * FROM (
        SELECT chunk_id, doc_id, ${oRel("q")} AS relevance FROM emb, qa
        WHERE lang = 'en' AND chunk_id NOT IN (SELECT chunk_id FROM excl)
        ORDER BY relevance DESC, chunk_id LIMIT 10)),
      arm2 AS (SELECT * FROM (
        SELECT chunk_id, doc_id, ${oRel("q")} AS relevance FROM emb, qb
        WHERE source = 'src7'
        ORDER BY relevance DESC, chunk_id LIMIT 10))
      SELECT * FROM (
        SELECT * FROM arm1
        UNION ALL
        SELECT * FROM arm2 WHERE chunk_id NOT IN (SELECT chunk_id FROM arm1))
      ORDER BY chunk_id""",

    // same semantic search + metadata filter, DefaultLimit(10) top-k
    "k16_kb_cte_sql" -> s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      scored AS (SELECT chunk_id, doc_id, ${oRel("q")} AS relevance
        FROM emb, qv WHERE lang = 'en')
      SELECT * FROM (SELECT * FROM scored ORDER BY relevance DESC, chunk_id LIMIT 10)
      ORDER BY chunk_id""",

    "k21_kb_join_sql" -> s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      scored AS (SELECT chunk_id, doc_id, ${oRel("q")} AS relevance FROM emb, qv),
      top AS (SELECT * FROM (SELECT * FROM scored WHERE relevance > 0.6
        ORDER BY relevance DESC, chunk_id LIMIT 10))
      SELECT d.lang, d.source, t.chunk_id, t.doc_id AS id, t.relevance
      FROM top t JOIN documents d ON d.doc_id = t.doc_id
      ORDER BY t.relevance DESC, t.chunk_id""",

    // replaced docs (< 100, truncated to ≤ 50 chars) contribute exactly
    // one chunk each; untouched docs keep their original chunking
    "k22_kb_reingest_replace" -> s"""${oPrefixWhere("WHERE doc_id >= 100")}
      SELECT reingested, n_chunks, n_docs FROM (
        SELECT FALSE AS reingested, COUNT(*) AS n_chunks,
          COUNT(DISTINCT doc_id) AS n_docs FROM chunks
        UNION ALL
        SELECT TRUE AS reingested, COUNT(*) AS n_chunks,
          COUNT(DISTINCT doc_id) AS n_docs FROM documents WHERE doc_id < 100)
      ORDER BY reingested""",

    "k12_kb_hybrid_sql" -> {
      val qn = QueryA.trim.toLowerCase.split("\\s+").distinct.length
      s"""$oPrefix,
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      qt AS (SELECT list_distinct(regexp_extract_all(lower(${sq(QueryA)}), '\\S+')) AS qtoks),
      vec AS (SELECT chunk_id, doc_id,
          ROUND((1.0-(${oCos("q")}))*0.5, 4) AS arm_distance, 0 AS arm FROM emb, qv),
      kw AS (SELECT chunk_id, doc_id,
          ROUND((1.0 - len(list_intersect(list_distinct(regexp_extract_all(lower(content), '\\S+')), qtoks))/$qn.0)*0.5, 4) AS arm_distance,
          1 AS arm FROM chunks, qt),
      merged AS (SELECT chunk_id, doc_id, arm_distance,
          ROW_NUMBER() OVER (PARTITION BY chunk_id ORDER BY arm_distance, arm) AS rn
        FROM (SELECT * FROM vec UNION ALL SELECT * FROM kw)),
      blended AS (SELECT chunk_id, doc_id, arm_distance AS distance,
          ROUND(1.0/(1.0+arm_distance), 4) AS relevance FROM merged WHERE rn = 1)
      SELECT * FROM (SELECT * FROM blended ORDER BY relevance DESC, chunk_id LIMIT 10)
      ORDER BY relevance DESC, chunk_id"""
    },

    "c02_ddl_kb_roundtrip" -> s"""$oPrefix
      SELECT doc_id, count(*) AS n_chunks FROM chunks
      GROUP BY doc_id ORDER BY doc_id""",

    // Mirrors the Spark plan 1:1: centroids = first-8 chunk ids'
    // embeddings, rounded-cosine argmax assignment, 2 probe cells,
    // score only the probed lists.
    "k14_kb_ivf_search" -> {
      def cosOf(x: String, y: String) =
        s"""list_sum(list_transform(range(1, ${Dim + 1}), i -> $x[i]*$y[i])) /
           (sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> $x[i]*$x[i]))) *
            sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> $y[i]*$y[i]))))"""
      s"""$oPrefix,
      cents AS (SELECT ROW_NUMBER() OVER (ORDER BY chunk_id) AS cent_id, v AS cv
                FROM (SELECT chunk_id, v FROM emb ORDER BY chunk_id LIMIT 8)),
      assigned AS (SELECT chunk_id, doc_id, v, cent_id AS cell FROM (
          SELECT e.chunk_id, e.doc_id, e.v, c.cent_id,
            ROW_NUMBER() OVER (PARTITION BY e.chunk_id
              ORDER BY ROUND(${cosOf("e.v", "c.cv")}, 4) DESC, c.cent_id) AS crk
          FROM emb e CROSS JOIN cents c)
        WHERE crk = 1),
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      probes AS (SELECT cent_id AS cell FROM (
          SELECT c.cent_id FROM cents c, qv
          ORDER BY ROUND(${cosOf("c.cv", "q")}, 4) DESC, c.cent_id LIMIT 2)),
      scored AS (SELECT a.chunk_id, a.doc_id, CAST(a.cell AS INTEGER) AS cell,
          ROUND(1.0/(1.0+ROUND(1.0-(${cosOf("a.v", "q")}),4)),4) AS relevance
        FROM assigned a JOIN probes USING (cell), qv)
      SELECT * FROM (SELECT * FROM scored ORDER BY relevance DESC, chunk_id LIMIT 10)
      ORDER BY relevance DESC, chunk_id"""
    },

    // Same IVF plan as k14 exercised through the DDL/SQL surface; the
    // standard search projection drops the cell column.
    "k15_kb_index_sql" -> {
      def cosOf(x: String, y: String) =
        s"""list_sum(list_transform(range(1, ${Dim + 1}), i -> $x[i]*$y[i])) /
           (sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> $x[i]*$x[i]))) *
            sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> $y[i]*$y[i]))))"""
      s"""$oPrefix,
      cents AS (SELECT ROW_NUMBER() OVER (ORDER BY chunk_id) AS cent_id, v AS cv
                FROM (SELECT chunk_id, v FROM emb ORDER BY chunk_id LIMIT 8)),
      assigned AS (SELECT chunk_id, doc_id, v, cent_id AS cell FROM (
          SELECT e.chunk_id, e.doc_id, e.v, c.cent_id,
            ROW_NUMBER() OVER (PARTITION BY e.chunk_id
              ORDER BY ROUND(${cosOf("e.v", "c.cv")}, 4) DESC, c.cent_id) AS crk
          FROM emb e CROSS JOIN cents c)
        WHERE crk = 1),
      qv AS (SELECT ${oEmbed(sq(QueryA))} AS q),
      probes AS (SELECT cent_id AS cell FROM (
          SELECT c.cent_id FROM cents c, qv
          ORDER BY ROUND(${cosOf("c.cv", "q")}, 4) DESC, c.cent_id LIMIT 2)),
      scored AS (SELECT a.chunk_id, a.doc_id,
          ROUND(1.0/(1.0+ROUND(1.0-(${cosOf("a.v", "q")}),4)),4) AS relevance
        FROM assigned a JOIN probes USING (cell), qv)
      SELECT * FROM (SELECT * FROM scored ORDER BY relevance DESC, chunk_id LIMIT 10)
      ORDER BY relevance DESC, chunk_id"""
    },

    "k07_kb_evaluate" -> s"""$oPrefix,
      queries AS (SELECT doc_id AS query_id, substr(text, 1, $ChunkSize) AS query_text,
          doc_id AS gold_doc_id FROM documents WHERE doc_id < 10),
      qe AS (SELECT query_id, gold_doc_id, ${oEmbed("query_text")} AS q FROM queries),
      ranked AS (SELECT query_id, gold_doc_id, chunk_id, doc_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ${oRel("q")} DESC, chunk_id) AS pos
        FROM emb, qe),
      top AS (SELECT query_id,
          CASE WHEN doc_id = gold_doc_id THEN 1 ELSE 0 END AS rel, pos
        FROM ranked WHERE pos <= 10),
      perq AS (SELECT query_id,
          MAX(CASE WHEN pos = 1 THEN rel ELSE 0 END) AS hit1,
          MAX(rel) AS hit10,
          SUM(rel / log2(pos + 1.0)) AS dcg
        FROM top GROUP BY query_id),
      nrel AS (SELECT query_id, COUNT(*) AS n_rel
        FROM chunks JOIN queries ON chunks.doc_id = queries.gold_doc_id
        GROUP BY query_id)
      SELECT p.query_id, COALESCE(n.n_rel, 0) AS n_rel,
        CAST(p.hit1 AS INTEGER) AS hit1, CAST(p.hit10 AS INTEGER) AS hit10,
        CASE WHEN n.n_rel > 0 THEN ROUND(p.dcg / list_sum(list_transform(
            generate_series(1, CAST(LEAST(n.n_rel, 10) AS INT)), i -> 1.0/log2(i + 1.0))), 4)
          ELSE 0.0 END AS ndcg10
      FROM perq p LEFT JOIN nrel n ON p.query_id = n.query_id
      ORDER BY p.query_id""",

    "k23_kb_evaluate_metrics" -> s"""$oPrefix,
      queries AS (SELECT doc_id AS query_id, substr(text, 1, $ChunkSize) AS query_text,
          doc_id AS gold_doc_id FROM documents WHERE doc_id < 12),
      qe AS (SELECT query_id, gold_doc_id, ${oEmbed("query_text")} AS q FROM queries),
      ranked AS (SELECT query_id, gold_doc_id, chunk_id, doc_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ${oRel("q")} DESC, chunk_id) AS pos
        FROM emb, qe),
      top AS (SELECT query_id,
          CASE WHEN doc_id = gold_doc_id THEN 1 ELSE 0 END AS rel, pos
        FROM ranked WHERE pos <= 20),
      perq AS (SELECT query_id,
          MIN(CASE WHEN rel = 1 THEN pos END) AS first_pos
        FROM top GROUP BY query_id),
      rrq AS (SELECT query_id, first_pos,
          ROUND(CASE WHEN first_pos IS NOT NULL THEN 1.0 / first_pos ELSE 0.0 END, 4) AS rr
        FROM perq)
      SELECT CAST(COUNT(*) AS BIGINT) AS total_questions,
        CAST(SUM(CASE WHEN first_pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS total_found,
        CAST(SUM(CASE WHEN first_pos <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS accurate_in_top_10,
        ROUND(CAST(SUM(CASE WHEN first_pos IS NOT NULL THEN first_pos - 1 END) AS DOUBLE)
          / SUM(CASE WHEN first_pos IS NOT NULL THEN 1 ELSE 0 END), 4)
          AS avg_first_relevant_position,
        ROUND(CAST(SUM(CAST(rr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS mean_mrr,
        ROUND(SUM(CASE WHEN first_pos <= 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS recall_at_1,
        ROUND(SUM(CASE WHEN first_pos <= 5 THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS recall_at_5,
        ROUND(SUM(CASE WHEN first_pos <= 10 THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS recall_at_10
      FROM rrq""",

    "k20_kb_evaluate_generated" -> s"""$oPrefix,
      tests AS (SELECT chunk_id AS query_id,
          array_to_string(list_slice(list_filter(string_split(content, ' '),
            w -> length(w) > 4), 1, 3), ' ') AS query_text,
          doc_id AS gold_doc_id
        FROM chunks ORDER BY md5(chunk_id), chunk_id LIMIT 8),
      qe AS (SELECT query_id, gold_doc_id, ${oEmbed("query_text")} AS q FROM tests),
      ranked AS (SELECT qe.query_id, qe.gold_doc_id, emb.chunk_id, emb.doc_id,
          ROW_NUMBER() OVER (PARTITION BY qe.query_id
            ORDER BY ${oRel("q")} DESC, emb.chunk_id) AS pos
        FROM emb, qe),
      top AS (SELECT query_id,
          CASE WHEN doc_id = gold_doc_id THEN 1 ELSE 0 END AS rel, pos
        FROM ranked WHERE pos <= 10),
      perq AS (SELECT query_id,
          MAX(CASE WHEN pos = 1 THEN rel ELSE 0 END) AS hit1,
          MAX(rel) AS hit10,
          SUM(rel / log2(pos + 1.0)) AS dcg
        FROM top GROUP BY query_id),
      nrel AS (SELECT t.query_id, COUNT(*) AS n_rel
        FROM chunks c JOIN tests t ON c.doc_id = t.gold_doc_id
        GROUP BY t.query_id)
      SELECT p.query_id, COALESCE(n.n_rel, 0) AS n_rel,
        CAST(p.hit1 AS INTEGER) AS hit1, CAST(p.hit10 AS INTEGER) AS hit10,
        CASE WHEN n.n_rel > 0 THEN ROUND(p.dcg / list_sum(list_transform(
            generate_series(1, CAST(LEAST(n.n_rel, 10) AS INT)), i -> 1.0/log2(i + 1.0))), 4)
          ELSE 0.0 END AS ndcg10
      FROM perq p LEFT JOIN nrel n ON p.query_id = n.query_id
      ORDER BY p.query_id"""
  )
}

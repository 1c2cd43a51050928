package graft

import graft.engine.Tables
import graft.kb.Kb
import graft.kb.Kb._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Knowledge-base semantics not visible to the DuckDB oracle gate:
  * upsert diff classification, skip-existing idempotence, boolean-algebra
  * laws over the chunk_id sets, evaluate self-retrieval.
  */
class KbSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("kb-spec")
  val dir = "/root/testdata/sf0.001"

  lazy val docs: DataFrame = Tables.table(spark, dir, "documents")

  test("streaming ingest maintains the chunk store incrementally, exactly-once") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("kb_stream_src").toString
    val store = Files.createTempDirectory("kb_stream_store").toString + "/chunks"
    val ckpt = Files.createTempDirectory("kb_stream_ckpt").toString
    val batch1 = docs.filter(col("doc_id") < 20)
    val batch2 = docs.filter(col("doc_id") >= 20 && col("doc_id") < 35)
    val schema = batch1.schema
    def drain(): Unit =
      Kb.streamingIngest(spark, src, schema, store, ckpt).awaitTermination()
    batch1.write.mode("append").parquet(src)
    drain()
    assert(spark.read.parquet(store).count() === Kb.ingest(batch1).count())
    // new files → only their chunks append
    batch2.write.mode("append").parquet(src)
    drain()
    val expected = Kb.ingest(docs.filter(col("doc_id") < 35)).count()
    assert(spark.read.parquet(store).count() === expected)
    // restart with the same checkpoint and no new files → no duplicates
    drain()
    assert(spark.read.parquet(store).count() === expected)
    // streamed chunks are the SAME rows batch ingest produces
    val streamed = spark.read.parquet(store).select("chunk_id", "content")
    val direct = Kb.ingest(docs.filter(col("doc_id") < 35)).select("chunk_id", "content")
    assert(streamed.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(streamed).count() === 0)
  }

  test("JSON chunker: per-field chunks, one-level flatten, error chunk on bad input") {
    val sp = spark
    import sp.implicits._
    val jdocs = Seq(
      (1L, """{"title": "alpha", "nested": {"a": "1", "b": "2"}}"""),
      (2L, """{"only": "x"}"""),
      (3L, """not json at all""")).toDF("doc_id", "j")
    val out = Kb.chunkJson(jdocs).orderBy("doc_id", "chunk_ix").collect()
    assert(out.length === 4)
    val c1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(c1.map(_.getAs[String]("field_name")).toSeq === Seq("title", "nested"))
    assert(c1(0).getAs[String]("content") === "title: alpha")
    assert(c1(1).getAs[String]("content") === "nested.a: 1\nnested.b: 2")
    assert(c1(0).getAs[String]("chunk_id") === "1:j:1of2:0to12")
    val c3 = out.filter(_.getAs[Long]("doc_id") == 3L)
    assert(c3.length === 1 && c3(0).getAs[String]("chunk_id") === "3_error")
    assert(c3(0).getAs[String]("content").startsWith("Error processing document"))
    // chunks feed the standard embed/search pipeline unchanged
    val emb = Kb.chunkJson(jdocs).withColumn("emb", Kb.embed(col("content")))
    assert(Kb.vectorSearch(emb, "alpha", limit = 2).count() === 2)
  }

  test("contextual chunker situates chunks; tag escaping; preprocessor param routes") {
    val sp = spark
    import sp.implicits._
    val d = Seq((1L, "alpha beta <chunk> gamma " + ("word " * 60))).toDF("doc_id", "text")
    val out = Kb.contextualChunk(d).orderBy("chunk_ix").collect()
    assert(out.length > 1) // long doc → several chunks
    // every chunk: LLM-context header, blank line, then the original slice
    assert(out.forall(_.getAs[String]("content").startsWith("LLM[")))
    assert(out.forall(_.getAs[String]("content").contains("\n\n")))
    // the <chunk> tag inside the document was escaped in the prompt, so
    // the echoed prompt head contains the entity, not the raw tag
    val summarized = Kb.contextualChunk(d, summarize = true).collect()
    assert(summarized.forall(r => r.getAs[String]("content").startsWith("LLM[") &&
      !r.getAs[String]("content").contains("\n\n")))
    // empty/whitespace documents are skipped, as in the reference
    val empty = Seq((2L, "   ")).toDF("doc_id", "text")
    assert(Kb.contextualChunk(empty).count() === 0)
    // the preprocessor KB param routes ingest through the contextual path
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), graft.catalog.Warehouse.temp(spark))
    c.execute("CREATE KNOWLEDGE BASE kbctx USING content_columns='text', preprocessor='contextual'")
    c.execute("INSERT INTO kbctx SELECT doc_id, text FROM documents WHERE doc_id < 5")
    val stored = c.warehouse.table(c.catalog.kb("kbctx").get.storage)
    assert(stored.count() > 0)
    assert(stored.select("content").collect().forall(_.getString(0).startsWith("LLM[")))
    // contextual chunks are searchable like any others
    assert(c.execute("SELECT * FROM kbctx WHERE content = 'alpha' LIMIT 3").count() === 3)
  }

  test("BM25 stats: computed at ingest, threaded into search, never recomputed") {
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), graft.catalog.Warehouse.temp(spark))
    c.execute("CREATE KNOWLEDGE BASE kbst USING content_columns='text'")
    c.execute("INSERT INTO kbst SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 50")
    val ent = c.catalog.kb("kbst").get
    assert(ent.stats.isDefined)
    val stored = c.warehouse.table(ent.storage)
    assert(ent.stats.get === Kb.corpusStats(stored))
    // the stats parameter is authoritative: fake stats shift the scores,
    // proving bm25Score does NOT silently rerun the corpus aggregation
    val real = Kb.bm25Score(stored, "table scan", stats = ent.stats)
      .orderBy("chunk_id").collect().map(_.getDouble(2)).toSeq
    val fake = Kb.bm25Score(stored, "table scan", stats = Some((7L, 3.0)))
      .orderBy("chunk_id").collect().map(_.getDouble(2)).toSeq
    assert(real.nonEmpty && real != fake)
    // and the index-time stats reproduce the inline-fallback scores
    val inline = Kb.bm25Score(stored, "table scan")
      .orderBy("chunk_id").collect().map(_.getDouble(2)).toSeq
    assert(real === inline)
    // hybrid arm threads the same stats
    val h1 = Kb.hybridSearchBm25(stored, "table scan", stats = ent.stats)
      .select("chunk_id", "relevance").collect().toSeq
    val h2 = Kb.hybridSearchBm25(stored, "table scan")
      .select("chunk_id", "relevance").collect().toSeq
    assert(h1 === h2)
    // re-ingest refreshes the stats to the grown corpus
    c.execute("INSERT INTO kbst SELECT doc_id, text, lang, source FROM documents WHERE doc_id >= 50 AND doc_id < 80")
    val ent2 = c.catalog.kb("kbst").get
    assert(ent2.stats.get._1 > ent.stats.get._1)
  }
  lazy val chunks: DataFrame = Kb.ingest(docs).cache()

  test("chunking covers every document end-to-end with correct overlap") {
    val bad = Kb.chunk(docs)
      .groupBy(col("doc_id"), col("len"))
      .agg(max(col("end_c")).as("max_end"), count(lit(1)).as("n"),
        max(col("n_chunks")).as("n_chunks"))
      .filter(col("max_end") =!= col("len") || col("n") =!= col("n_chunks"))
      .count()
    assert(bad === 0)
  }

  test("skipExisting is an anti-join: existing ∩ result = ∅, existing ∪ result = all") {
    val existing = Kb.ingest(docs.filter(col("doc_id") % 2 === 0))
    val res = skipExisting(chunks, existing)
    assert(res.join(existing, Seq("chunk_id"), "left_semi").count() === 0)
    assert(res.count() + existing.count() === chunks.count())
  }

  test("upsertDiff classifies insert/update/unchanged") {
    val stored = chunks.filter(col("doc_id") < 30)
      .withColumn("content",
        when(col("doc_id") < 15, concat(col("content"), lit(" EDITED"))).otherwise(col("content")))
    val diff = upsertDiff(chunks.filter(col("doc_id") < 60), stored)
    val byOp = diff.groupBy(col("_op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocLt15 = chunks.filter(col("doc_id") < 15).count()
    val nDoc15to30 = chunks.filter(col("doc_id") >= 15 && col("doc_id") < 30).count()
    val nDoc30to60 = chunks.filter(col("doc_id") >= 30 && col("doc_id") < 60).count()
    assert(byOp("update") === nDocLt15)      // stored content diverged
    assert(byOp("unchanged") === nDoc15to30) // identical
    assert(byOp("insert") === nDoc30to60)    // not stored
  }

  test("byom embedding provider: KB ingest routes chunks through the worker process, search works") {
    val wh = graft.catalog.Warehouse.temp(spark)
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, dir), wh)
    c.execute("""CREATE KNOWLEDGE BASE kb_byom USING
      embedding_model = {'provider': 'byom', 'model_name': 'md5-projection'}""")
    c.execute("""INSERT INTO kb_byom
      SELECT doc_id AS id, text AS content FROM documents WHERE doc_id < 12""")
    // the worker's deterministic model is numerically identical to the
    // in-JVM stub, so worker-embedded chunks must equal Kb.embed of the
    // same content — proving every chunk actually crossed the process
    // boundary AND that the oracle contract is preserved
    val stored = wh.table("__kb_kb_byom")
      .withColumn("expected", Kb.embed(col("content")))
    assert(stored.count() > 0)
    val mismatched = stored.filter(
      expr("exists(zip_with(emb, expected, (a, b) -> abs(a - b) > 1e-12), x -> x)"))
    assert(mismatched.count() === 0)
    // search over the worker-embedded store behaves like any other KB
    val hits = c.execute("SELECT * FROM kb_byom WHERE content = 'data' LIMIT 5")
    assert(hits.count() > 0)
  }

  test("byom embedding worker: crash mid-batch respawns and finishes the embedding") {
    val eng = new graft.ml.ByomProcessEngine
    try {
      val e1 = eng.embedTexts(Seq("alpha", "beta"))
      assert(e1.length === 2 && e1.head.length === Kb.Dim)
      // kill the worker between batches — the next call must respawn
      eng.injectCrash()
      val e2 = eng.embedTexts(Seq("alpha"))
      assert(eng.respawnCount === 1)
      assert(e2.head === e1.head) // deterministic across respawns
      // and the numbers match the in-JVM stub exactly
      val viaStub = spark.range(1).select(
        Kb.embed(lit("alpha")).as("e")).head().getSeq[Double](0)
      assert(e2.head === viaStub)
    } finally eng.close()
  }

  test("OR is a union (dedup on chunk_id); AND with meta is a filtered search") {
    val a = Kb.search(chunks, ContentIs("table scan"), 20)
    val b = Kb.search(chunks, Meta(col("lang") === "en"))
    val or = Kb.search(chunks, Or(Seq(ContentIs("table scan"), Meta(col("lang") === "en"))), 20)
    val unionIds = a.select("chunk_id").union(b.select("chunk_id")).distinct().count()
    assert(or.count() === unionIds)
    assert(or.select("chunk_id").distinct().count() === or.count(), "OR must dedup")

    val and = Kb.search(chunks, And(Seq(ContentIs("table scan"), Meta(col("lang") === "en"))), 20)
    val direct = vectorSearch(chunks, "table scan", col("lang") === "en", 20)
    assert(and.select("chunk_id").collect().map(_.getString(0)).sorted
      === direct.select("chunk_id").collect().map(_.getString(0)).sorted)
  }

  test("negative content excludes its own top matches") {
    val q = "table scan filter join"
    val top = vectorSearch(chunks, q, limit = 5).select("chunk_id")
    val res = Kb.search(chunks, And(Seq(ContentIs(q), ContentNot(q))), 10)
    // excluding the query's own high-relevance set removes its top hits
    assert(res.join(top, Seq("chunk_id"), "left_semi").count() === 0)
  }

  test("partitioned ingest equals direct ingest and resumes mid-way") {
    val st = new graft.federation.FetchState
    val part1 = Kb.partitionedIngest(() => docs, "doc_id", 20, st, "text")
    // interrupted? no — drain fully; compare chunk-id sets with direct
    val direct = chunks
    assert(part1.select("chunk_id").exceptAll(direct.select("chunk_id")).count() === 0)
    assert(direct.select("chunk_id").exceptAll(part1.select("chunk_id")).count() === 0)

    // resume path: one batch, then the rest
    val st2 = new graft.federation.FetchState
    val firstBatch = graft.federation.PartitionedFetch
      .keysetFetch(() => docs, "doc_id", 20, st2, maxBatches = 1)
    val rest = Kb.partitionedIngest(() => docs, "doc_id", 20, st2, "text")
    assert(Kb.ingest(firstBatch).count() + rest.count() === direct.count())
  }

  test("reranker over-fetch admits keyword matches the vector page missed") {
    val rr = new KeywordBoostReranker
    val base = vectorSearch(chunks, "table scan filter join", limit = 10)
    val reranked = vectorSearch(chunks, "table scan filter join", limit = 10,
      reranker = Some(rr))
    // deterministic both ways, same cardinality, order generally differs
    assert(reranked.count() === 10 && base.count() === 10)
    val a = base.select("chunk_id").collect().map(_.getString(0)).toSeq
    val b = reranked.select("chunk_id").collect().map(_.getString(0)).toSeq
    assert(a.toSet != b.toSet || a != b, "reranker had no observable effect")
  }

  test("BM25 hybrid arm: deterministic, bounded, and keyword-sensitive") {
    val q = "table scan filter join"
    val a = Kb.hybridSearchBm25(chunks, q, alpha = 0.5, limit = 10)
      .select("chunk_id").collect().map(_.getString(0)).toSeq
    val b = Kb.hybridSearchBm25(chunks, q, alpha = 0.5, limit = 10)
      .select("chunk_id").collect().map(_.getString(0)).toSeq
    assert(a === b && a.size === 10)
    // alpha=0 degenerates to pure vector ranking
    val vecOnly = Kb.hybridSearchBm25(chunks, q, alpha = 0.0, limit = 10)
      .select("chunk_id").collect().map(_.getString(0)).toSeq
    val pureVec = vectorSearch(chunks, q, limit = 10)
      .select("chunk_id").collect().map(_.getString(0)).toSeq
    assert(vecOnly === pureVec)
    // keyword arm moves the ranking
    assert(a !== pureVec)
    // every top hit with alpha=1 contains at least one query token
    val kwOnly = Kb.hybridSearchBm25(chunks, q, alpha = 1.0, limit = 5)
    val toks = q.split(" ").toSet
    kwOnly.select("content").collect().foreach { r =>
      assert(toks.exists(r.getString(0).toLowerCase.contains))
    }
  }

  test("bm25: precomputed stats give identical scores; empty corpus returns empty, not NPE") {
    val q = "the data model"
    val inline = Kb.bm25Score(chunks, q).orderBy("chunk_id").collect().toSeq
    val stats = Kb.corpusStats(chunks)
    assert(stats._1 > 0 && stats._2 > 0)
    val precomputed = Kb.bm25Score(chunks, q, stats = Some(stats))
      .orderBy("chunk_id").collect().toSeq
    assert(precomputed === inline)
    // a fully meta-filtered base must not NPE on the null corpus stats
    val empty = Kb.bm25Score(chunks.filter(lit(false)), q)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("chunk_id", "doc_id", "bm25"))
    assert(Kb.hybridSearchBm25(chunks, q, metaFilter = lit(false)).count() === 0)
  }

  test("IVF index: cells partition the corpus, probed search prunes and scores exactly") {
    import spark.implicits._
    val chunks = Kb.ingest(docs)
    val (indexed, cents) = Kb.ivfIndex(chunks, nCent = 8)
    // every chunk lands in exactly one cell; cell ids are centroid ids
    assert(indexed.count() === chunks.count())
    val cellIds = indexed.select("cell").distinct().as[Int].collect().toSet
    assert(cellIds.subsetOf((1 to 8).toSet))
    // probed search scores candidates with EXACTLY vectorSearch's formula:
    // every returned (chunk_id, relevance) appears identically in the
    // brute-force ranking
    val q = "table scan filter join"
    val ivf = Kb.vectorSearchIvf(indexed, cents, q, nProbe = 2, limit = 10)
      .select("chunk_id", "relevance").as[(String, Double)].collect().toMap
    val brute = vectorSearch(chunks, q, limit = MaxLimit)
      .select("chunk_id", "relevance").as[(String, Double)].collect().toMap
    ivf.foreach { case (id, rel) =>
      assert(brute.get(id).contains(rel), s"ivf relevance for $id diverges from brute force")
    }
    // pruning is real: the probed candidate set is a strict subset
    val probed = indexed.join(
      cents.withColumn("qc", round(graft.functions.VectorFunctions.cosineSim(
        col("cv"), Kb.embed(lit(q))), 4))
        .orderBy(col("qc").desc, col("cent_id")).limit(2)
        .select(col("cent_id").as("cell")), Seq("cell"), "left_semi").count()
    assert(probed < chunks.count())
    assert(probed >= 10)
  }

  test("evaluate: exact-chunk queries retrieve their own doc at rank 1") {
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        col("text").substr(lit(1), lit(ChunkSize)).as("query_text"),
        col("doc_id").as("gold_doc_id"))
    val ev = Kb.evaluate(chunks, queries, k = 10)
    // query text == first chunk content → cosine 1 with its own chunk → hit@1
    assert(ev.filter(col("hit1") === 1).count() === 5)
    assert(ev.filter(col("ndcg10") > 0).count() === 5)
  }
}

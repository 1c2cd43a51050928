package graft.queries

import graft.engine.Tables
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over the embeddings table (SURVEY §2.2 vector
  * stores; reference distance ops `<->`,`<#>`,`<=>` at
  * mindsdb/integrations/libs/vectordatabase_handler.py:51-54).
  *
  * Brute-force cosine top-k is the correctness baseline (query-vs-all is
  * a broadcast + narrow map even at 100 TB: one pass over N vectors).
  * The scale path for all-pairs work is random-hyperplane LSH bucketing
  * (s04): signature computation is a narrow transform; the join touches
  * only bucket-colliding pairs instead of N².
  *
  * Cosine runs through a native Catalyst expression (CosineSimilarity)
  * whose sequential fold matches the oracle's list_sum formula
  * bit-for-bit; outputs are rounded to 4 decimals and re-sorted on the
  * rounded value so the final ordering is engine-stable.
  */
object Similarity extends QueryPack {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "s01_knn_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), cosineSim(col("v"), col("qv")).as("c"))
        .orderBy(col("c").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("label"), round(col("c"), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
    }),

    "s02_knn_batch" -> ((s, dir) => {
      // knn-join: 10 query vectors against all, top-5 each. The ranking
      // is SHARDED two-phase (Kb.shardedTopK): a flat
      // Window.partitionBy(q_id) would pin one task per query holding
      // the WHOLE corpus's scores — the exact single-partition shape AQE
      // cannot split at 100 TB. Phase 1 ranks within (q_id, 64-way
      // vec_id shard); phase 2 ranks only the ≤64×5 shard winners.
      // Ordering is total (c DESC, vec_id), so results are identical.
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), cosineSim(col("v"), col("qv")).as("c"))
      graft.kb.Kb.shardedTopK(scored, col("q_id"),
          Seq(col("c").desc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"), col("rnk"), round(col("c"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // per-label embedding diagnostics: class centroids and within-class
    // variance per dimension — the separability / collapse report run
    // before training on labeled embeddings (a degenerate dimension or
    // overlapping centroids show up here first). One posexplode + one
    // map-side-combinable aggregation; output is |labels|×dims rows —
    // model-sized at any corpus scale. Component sums ride DECIMAL so
    // the means are order-independent and hash-exact.
    "s08_embedding_stats" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      emb(s, dir)
        .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(28, 12))).as("sx"),
          sum((col("x") * col("x")).cast(DecimalType(28, 12))).as("sxx"))
        .withColumn("mu", col("sx").cast(DoubleType) / col("n"))
        .select(col("label"), col("dim"), col("n"),
          round(col("mu"), 6).as("centroid"),
          round(col("sxx").cast(DoubleType) / col("n") - col("mu") * col("mu"), 6)
            .as("variance"))
        .orderBy(col("label"), col("dim"))
    }),

    // hard-negative mining for contrastive training (the in-batch-
    // negative upgrade every embedding-model pipeline runs): for each
    // query vector, the top-k most-similar vectors with a DIFFERENT
    // label — semantically close, semantically wrong, exactly what the
    // loss needs. Scale shape = s02's: the query side is small and
    // BROADCAST, the corpus side streams once; the label constraint
    // rides the join condition so same-label rows never materialize.
    // Ranking on the bit-stable native cosine, rounded after ranking.
    "s09_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"), col("v").as("qv"))
      val scored = e.join(broadcast(q), col("label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
          cosineSim(col("v"), col("qv")).as("c"))
      // sharded two-phase top-k (see s02): no corpus-sized window task
      graft.kb.Kb.shardedTopK(scored, col("q_id"),
          Seq(col("c").desc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("q_label"), col("rnk"),
          col("vec_id").as("neg_id"), col("label").as("neg_label"),
          round(col("c"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    "s03_cosine_near_pairs" -> ((s, dir) => {
      // embedding-cosine near-dup: blocked on label (the natural join key
      // here; at scale the blocking key comes from LSH, see s04).
      val e = emb(s, dir)
      val a = e.select(col("vec_id").as("ai"), col("label"), col("v").as("va"))
      val b = e.select(col("vec_id").as("bi"), col("label"), col("v").as("vb"))
      a.join(b, Seq("label"))
        .filter(col("ai") < col("bi"))
        .select(col("label"), col("ai"), col("bi"), cosineSim(col("va"), col("vb")).as("c"))
        .filter(col("c") >= 0.35)
        .select(col("label"), col("ai"), col("bi"), round(col("c"), 4).as("cos_sim"))
        .orderBy(col("ai"), col("bi"))
    }),

    "s04_ann_lsh" -> ((s, dir) =>
      annTopK(s, emb(s, dir), col("vec_id") < 20, k = 3)
        .orderBy(col("q_id"), col("rnk"))),

    // pgvector's operator spellings `<->` / `<#>` / `<=>`
    // (vectordatabase_handler.py:51-54) as SQL-level syntax through the
    // router, rewritten to the same codegen'd native distance
    // expressions the functional spelling uses — one scan, three
    // distances, no shuffle before the top-k
    "s11_pgvector_ops" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      val lit = queryVecLiteral(s, dir)
      c.execute(s"""
        SELECT vec_id, label,
          ROUND(CAST(embedding AS ARRAY<DOUBLE>) <-> '$lit', 4) AS l2,
          ROUND(CAST(embedding AS ARRAY<DOUBLE>) <#> '$lit', 4) AS nip,
          ROUND(CAST(embedding AS ARRAY<DOUBLE>) <=> '$lit', 4) AS cos_d
        FROM embeddings WHERE vec_id <> 0
        ORDER BY l2, vec_id LIMIT 20""")
    }),

    // ---- ANN QUALITY audit: recall@5 of the IVF index (s05) against
    // the exact brute-force top-5 (s02 — same queries, same k). The
    // tuning loop every vector index needs (nProbe/nCent vs recall),
    // closing the measured-quality set: LSH dedup has d19, sketches have
    // d21's bit-exactness, ANN gets this. Costs what the two retrievals
    // cost; the audit join is |queries|×k rows.
    "s10_ann_recall" -> ((s, dir) => {
      val exact = queries("s02_knn_batch")(s, dir).select(col("q_id"), col("vec_id"))
      val approx = queries("s05_ann_ivf")(s, dir)
        .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("q_id", "vec_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast(DoubleType) / 5)
          .as("recall_at_5"))
        .orderBy(col("q_id"))
    }),

    "s05_ann_ivf" -> ((s, dir) =>
      ivfTopK(emb(s, dir), col("vec_id") < 10, k = 5, nCent = 8, nProbe = 2)
        .orderBy(col("q_id"), col("rnk"))),

    // ---- int8 scalar-quantized kNN (the memory-scale path: a 64-dim
    // float32 vector is 256 bytes; int8 quantization stores it in 64 —
    // the standard SQ8 trick large ANN indexes apply before IVF/PQ).
    // SYMMETRIC quantization with ONE global scale, q = floor(x/S·128)
    // clamped to int8: a single scale keeps the quantized dot product
    // proportional to the true dot product (per-dimension affine scales
    // would reweight dimensions and corrupt the cosine ranking).
    // Two passes: (1) the global max-|x| is one aggregate → a BROADCAST
    // scalar at any corpus size; (2) quantization + integer dot/norms
    // against the query is a narrow map, ranking is TakeOrdered. Every
    // ranking input is an exact integer (dot and both norms) — the final
    // cosine division is a deterministic function of exact ints, so no
    // float-sum ordering hazard exists anywhere.
    // Trained k-means clustering (graft.ml.KMeans Lloyd rounds on the
    // 1e-7 integer grid — exact 64-bit arithmetic end to end, so the
    // unrolled DuckDB oracle reproduces every centroid and assignment
    // bit-for-bit). Supplies the trained-centroid path the IVF
    // operators' stand-in codebooks document.
    "s07_kmeans" -> ((s, dir) => {
      val e = graft.engine.Tables.table(s, dir, "embeddings")
      val (assigned, _) =
        graft.ml.KMeans.fit(e, "vec_id", "embedding", k = 8, iters = 2)
      assigned.join(e.select(col("vec_id"), col("label")), "vec_id")
        .select(col("vec_id"), col("label"), col("cell"), col("d2"))
        .orderBy(col("vec_id"))
    }),

    // the s07 clustering through the SQL model lifecycle: CREATE MODEL
    // engine='kmeans', applied via SELECT … JOIN <model> — trained
    // centroids collected once, assignment broadcast per apply
    "m15_kmeans_sql" -> ((s, dir) => {
      val c = new graft.sqlx.Commands(s,
        new graft.catalog.Catalog(s, dir), graft.catalog.Warehouse.temp(s))
      c.execute("""CREATE MODEL km15 FROM (
          SELECT vec_id, embedding FROM embeddings)
        PREDICT cell USING engine='kmeans', features='embedding',
          id_column='vec_id', k='8', iterations='2'""")
      c.execute("""SELECT vec_id, label, cell
        FROM (SELECT vec_id, label, embedding FROM embeddings)
        JOIN km15 ORDER BY vec_id""")
    }),

    // ---- Product quantization (PQ) with asymmetric distance — THE
    // standard large-scale embedding compression (FAISS IVF-PQ): the
    // 64-dim vector splits into m=16 subvectors of 4 dims, each encoded
    // as its nearest of ks=16 per-subspace centroids, so a vector stores
    // as 16 bytes instead of 256. Query time is table-lookup only: the
    // query precomputes its 16×16 subspace-distance table (ADC), and a
    // candidate's estimated distance is the sum of 16 looked-up entries
    // — no float vector math per candidate. Scale shape: the codebook
    // and the per-query LUT are BROADCAST scalars (256 rows each);
    // encoding is a narrow per-vector map; ranking sums 16 DECIMAL-cast
    // rounded entries per candidate (order-independent → hash-exact) and
    // TakeOrdereds. Codebooks are stand-ins from the corpus head, same
    // convention as ivfTopK (s07 supplies the trained path).
    "s12_pq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      // geometry (m=16 subspaces × 4 dims, ks=16) lives in pqIndex
      val (codes, lutOf) = pqIndex(e)
      val lut = lutOf(col("vec_id") === 0)
      codes.filter(col("vec_id") =!= 0)
        .join(lut, Seq("sub", "cent_id"))
        .groupBy(col("vec_id"))
        .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .as("est"))
        .join(e.select(col("vec_id"), col("label")), "vec_id")
        .select(col("vec_id"), col("label"),
          col("est").cast(DoubleType).as("est_d2"))
        // TakeOrdered top-10 FIRST (scales: no global window over the
        // corpus), then rank the 10 survivors
        .orderBy(col("est_d2").asc, col("vec_id"))
        .limit(10)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("est_d2").asc, col("vec_id"))))
        .select(col("vec_id"), col("label"), round(col("est_d2"), 4).as("est_d2"),
          col("rnk"))
        .orderBy(col("rnk"))
    }),

    // PQ quality audit (the s10 pattern): recall@5 of the ADC ranking
    // against the exact L2 top-5, 10 queries. The compression is lossy
    // BY DESIGN — this is the measurement that says how lossy, and the
    // number a production index tunes m/ks against.
    "s13_pq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      def d2full(a: Column, b: Column): Column =
        round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), 4)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val wx = Window.partitionBy(col("q_id")).orderBy(col("d").asc, col("vec_id"))
      val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), d2full(col("v"), col("qv")).as("d"))
        .withColumn("rnk", row_number().over(wx)).filter(col("rnk") <= 5)
        .select(col("q_id"), col("vec_id"))
      val (codes, lutOf) = pqIndex(e)
      val lut = lutOf(col("vec_id") < 10)
      val wa = Window.partitionBy(col("q_id")).orderBy(col("est").asc, col("vec_id"))
      val approx = codes.join(lut, Seq("sub", "cent_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(DoubleType).as("est"))
        .withColumn("rnk", row_number().over(wa)).filter(col("rnk") <= 5)
        .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("q_id", "vec_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast(DoubleType) / 5)
          .as("recall_at_5"))
        .orderBy(col("q_id"))
    }),

    // ---- IVF-PQ: the production composition (FAISS's default index
    // family) — the IVF coarse quantizer prunes the corpus to the probed
    // inverted lists, PQ's ADC ranks ONLY those candidates from 16-byte
    // codes. At 100 TB the scan cost is nProbe/nCent of the corpus and
    // the ranking cost is a LUT-sum per surviving candidate; no float
    // vector math touches a candidate anywhere. Shares ivfCells with s05
    // and pqIndex with s12, so the oracle composes the two proven CTE
    // pyramids unchanged.
    "s14_ivf_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      val (assigned, probes) = ivfCells(e, col("vec_id") < 10, nCent = 8, nProbe = 2)
      val cands = probes.select(col("q_id"), col("cell"))
        .join(assigned.select(col("vec_id"), col("cell")), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"))
      val (codes, lutOf) = pqIndex(e)
      val lut = lutOf(col("vec_id") < 10)
      val est = cands.join(codes, Seq("vec_id"))
        .join(lut, Seq("q_id", "sub", "cent_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(DoubleType).as("est"))
      // sharded two-phase top-k (see s02): even the IVF-pruned candidate
      // set is ~nProbe/nCent of the corpus per query — still a
      // corpus-fraction-sized single window task at scale
      graft.kb.Kb.shardedTopK(est, col("q_id"),
          Seq(col("est").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"), col("rnk"),
          round(col("est"), 4).as("est_d2"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // ---- STORED index lifecycle (the d25 sketch-lifecycle analog for
    // ANN): the IVF cells and PQ codes persist to parquet at build time
    // — 16 bytes + one cell id per vector — and the query phase reads
    // ONLY the stored artifacts plus the query vectors; no re-encoding,
    // no touch of the raw corpus embeddings. This is the production
    // separation: index build is one batch job, queries are served from
    // the compact index. Result ≡ s14 (same oracle SQL), which is the
    // round-trip proof.
    "s15_pq_stored" -> ((s, dir) => {
      val e = emb(s, dir)
      // ONE stable per-JVM location, overwritten per run — a fresh
      // createTempDirectory per invocation would leak parquet garbage
      // across the bench's 4+ runs of this query
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_pq_idx"
      // build phase: persist cells + codes
      val (assigned, probesLive) = ivfCells(e, col("vec_id") < 10, nCent = 8, nProbe = 2)
      assigned.select(col("vec_id"), col("cell"))
        .write.mode("overwrite").parquet(s"$tmp/cells")
      val (codes, lutOf) = pqIndex(e)
      codes.write.mode("overwrite").parquet(s"$tmp/codes")
      // query phase: stored cells + stored codes + live query LUT only
      val cells2 = s.read.parquet(s"$tmp/cells")
      val codes2 = s.read.parquet(s"$tmp/codes")
      val lut = lutOf(col("vec_id") < 10)
      val cands = probesLive.select(col("q_id"), col("cell"))
        .join(cells2, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"))
      val est = cands.join(codes2, Seq("vec_id"))
        .join(lut, Seq("q_id", "sub", "cent_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(DoubleType).as("est"))
      // sharded two-phase top-k (see s14) over the stored-index route
      graft.kb.Kb.shardedTopK(est, col("q_id"),
          Seq(col("est").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"), col("rnk"),
          round(col("est"), 4).as("est_d2"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // ---- TRAINED residual IVF-PQ — the production-grade path (FAISS
    // IndexIVFPQ): the coarse quantizer is the s07 integer-grid k-means
    // (k=8, 2 Lloyd rounds), vectors encode their RESIDUAL vs their
    // coarse centroid (residuals have ~half the variance of raw
    // vectors, which is where PQ recall comes from), and each of the
    // m=16 sub-codebooks is TRAINED by a grouped per-subspace k-means
    // (PqTrainer) instead of the corpus-head stand-ins of s12/s14.
    // Query time stays pure ADC: per probed cell the query's residual
    // LUT broadcasts, a candidate costs 16 integer lookups + a sum.
    // Everything rides the 1e-7 integer grid — exact 64-bit arithmetic,
    // so the DuckDB oracle reproduces training, encoding, and ranking
    // bit-for-bit. Index build materializes once through SharedFrames
    // (the s15 build/query separation); queries touch only the compact
    // artifacts (cells + 16-byte codes + codebooks).
    "s16_ivfpq_trained" -> ((s, dir) => {
      val (vq, coarse, cents, cb, codes) = trainedPqIndex(s, dir)
      val q = vq.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      // probe ranking: 8 rows per query — bounded by the codebook, not
      // the corpus (same exemption as ivfCells' per-vector argmin)
      val wp = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("cell"))
      val probes = q.crossJoin(broadcast(cents))
        .select(col("q_id"), col("qv"), col("cell"), d2l(col("qv"), col("cv")).as("d2"))
        .withColumn("crk", row_number().over(wp)).filter(col("crk") <= 2)
        .select(col("q_id"), col("qv"), col("cell"))
      val lut = trainedLut(probes, cents, cb)
      val cands = probes.select(col("q_id"), col("cell"))
        .join(coarse.select(col("vec_id"), col("cell")), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
      val est = cands.join(codes, Seq("vec_id"))
        .join(lut, Seq("q_id", "cell", "sub", "scell"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd2")).as("est_d2"))
      graft.kb.Kb.shardedTopK(est, col("q_id"),
          Seq(col("est_d2").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"), col("rnk"), col("est_d2"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // trained-PQ quality audit (the s13 pattern, SAME m=16/ks=16, same
    // corpus, same k): recall@5 of the trained-residual ADC ranking vs
    // the exact integer-grid L2 top-5 — the number that says what
    // residual encoding + Lloyd training buy over s13's 0.4 stand-in
    // recall. No IVF pruning on the approx arm, so the measurement
    // isolates ENCODING quality exactly as s13 does.
    "s17_pq_trained_recall" -> ((s, dir) => {
      val (vq, coarse, cents, cb, codes) = trainedPqIndex(s, dir)
      val q = vq.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val exactScored = vq.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), d2l(col("v"), col("qv")).as("d"))
      val exact = graft.kb.Kb.shardedTopK(exactScored, col("q_id"),
          Seq(col("d").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"))
      // every (query, cell) LUT — candidates score via their OWN cell
      val allPairs = q.crossJoin(broadcast(cents))
        .select(col("q_id"), col("qv"), col("cell"))
      val lut = trainedLut(allPairs, cents, cb)
      val est = coarse.select(col("vec_id"), col("cell"))
        .crossJoin(broadcast(q.select(col("q_id"))))
        .filter(col("vec_id") =!= col("q_id"))
        .join(codes, Seq("vec_id"))
        .join(lut, Seq("q_id", "cell", "sub", "scell"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd2")).as("est"))
      val approx = graft.kb.Kb.shardedTopK(est, col("q_id"),
          Seq(col("est").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("q_id", "vec_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast(DoubleType) / 5)
          .as("recall_at_5"))
        .orderBy(col("q_id"))
    }),

    // ---- TRAINED PQ16×8 — the PRODUCTION configuration (FAISS's
    // default PQ: m=16 subquantizers × 8 bits = ks=256 centroids per
    // subspace, still a 16-BYTE code per vector). The m/ks sweep that
    // motivated this: on this corpus (iid-uniform embeddings, the
    // adversarial case) recall@5 at ks=16 is rate-limited at ~0.4 no
    // matter how hard the codebooks train (s13 stand-in 0.4, s17
    // trained residual 0.36, offline 50-round Lloyd 0.40) — 64-bit
    // codes simply can't separate neighbors whose distance is 0.71× the
    // corpus median. At ks=256 the SAME 16 bytes measure 0.60 untrained
    // and 0.80 after 4 grouped Lloyd rounds (s19 is the in-repo gate of
    // that number) — training contributes +0.20, the rate the rest.
    // Raw encoding, no residual: k=8 coarse centroids of uniform data
    // all sit near the centre, so residuals are a translation that buys
    // nothing here (measured: 0.68 residual vs 0.80 raw at ks=256).
    "s18_pq16x8_topk" -> ((s, dir) => {
      val (vq, cb, codes) = trainedPq256Index(s, dir)
      val q = vq.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val lut = pq256Lut(q, cb)
      val est = codes.crossJoin(broadcast(q.select(col("q_id"))))
        .filter(col("vec_id") =!= col("q_id"))
        .join(lut, Seq("q_id", "sub", "scell"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd2")).as("est_d2"))
      graft.kb.Kb.shardedTopK(est, col("q_id"),
          Seq(col("est_d2").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"), col("rnk"), col("est_d2"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // recall@5 of trained PQ16×8 vs exact integer-grid L2 — the gate on
    // the 0.80 production number (same corpus/queries/k as s13/s17)
    "s19_pq16x8_recall" -> ((s, dir) => {
      val (vq, cb, codes) = trainedPq256Index(s, dir)
      val q = vq.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val exactScored = vq.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), d2l(col("v"), col("qv")).as("d"))
      val exact = graft.kb.Kb.shardedTopK(exactScored, col("q_id"),
          Seq(col("d").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"))
      val lut = pq256Lut(q, cb)
      val est = codes.crossJoin(broadcast(q.select(col("q_id"))))
        .filter(col("vec_id") =!= col("q_id"))
        .join(lut, Seq("q_id", "sub", "scell"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd2")).as("est"))
      val approx = graft.kb.Kb.shardedTopK(est, col("q_id"),
          Seq(col("est").asc, col("vec_id")), k = 5, "rnk", col("vec_id"))
        .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("q_id", "vec_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast(DoubleType) / 5)
          .as("recall_at_5"))
        .orderBy(col("q_id"))
    }),

    "s06_quantized_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val scale = broadcast(e.agg(
        max(greatest(abs(array_max(col("v"))), abs(array_min(col("v"))))).as("s")))
      def sqnorm(c: Column): Column =
        aggregate(c, lit(0L), (acc, x) => acc + x * x)
      val q = e.crossJoin(scale)
        .select(col("vec_id"), col("label"),
          transform(col("v"), x => greatest(lit(-128), least(lit(127),
            floor(x / col("s") * 128))).cast("int")).as("qv"))
      val query = q.filter(col("vec_id") === 0)
        .select(col("qv").as("quv"), sqnorm(col("qv")).as("qnb"))
      q.crossJoin(broadcast(query))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"),
          aggregate(zip_with(col("qv"), col("quv"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("qdot"),
          sqnorm(col("qv")).as("qna"), col("qnb"))
        .withColumn("qc", col("qdot").cast(DoubleType) /
          sqrt(col("qna").cast(DoubleType) * col("qnb").cast(DoubleType)))
        .orderBy(col("qc").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("label"), col("qdot"), round(col("qc"), 4).as("qcos"))
    })
  )

  /** IVF-style ANN: a fixed coarse codebook (here: the first `nCent`
    * vectors stand in for trained centroids), every vector assigned to
    * its nearest cell (one broadcast of nCent rows + a narrow argmax —
    * the inverted lists partition the corpus), queries probe their
    * `nProbe` nearest cells and brute-force only those lists. At 100 TB
    * the candidate join touches ~nProbe/nCent of the corpus instead of
    * all of it; the codebook scan is a narrow map either way.
    */
  def ivfTopK(e: DataFrame, isQuery: Column, k: Int, nCent: Int, nProbe: Int): DataFrame = {
    val (assigned, probes) = ivfCells(e, isQuery, nCent, nProbe)
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), round(cosineSim(col("v"), col("qv")), 4).as("c"))
      .dropDuplicates("q_id", "vec_id")
    // sharded two-phase top-k (see s02): the probed inverted lists are
    // still a corpus fraction per query — never one window task
    graft.kb.Kb.shardedTopK(scored, col("q_id"),
        Seq(col("c").desc, col("vec_id")), k, "rnk", col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("rnk"), col("c").as("cos_sim"))
  }

  /** The IVF coarse structure alone — (inverted lists `(vec_id, v,
    * cell)`, query probes `(q_id, qv, cell)`) — shared by the flat IVF
    * ranking (s05) and the IVF-PQ composition (s14). */
  def ivfCells(e: DataFrame, isQuery: Column, nCent: Int, nProbe: Int)
      : (DataFrame, DataFrame) = {
    // r17: the r16 three-way comparison kept a cached window shape only
    // because the inline argmin ran CosineSimilarity through interpreted
    // higher-order-function eval (1.7-1.9×) and the groupBy alternative
    // fell into ObjectHashAggregate. The codegen
    // ArgMinCentroids.topCosineCells loop computes the full (round(cc,4)
    // desc, cent_id asc) ranking per row in whole-stage codegen over the
    // codebook shipped as ONE broadcast row — zero Exchange. The cache
    // stays (both the inverted lists and the probes read the ranking,
    // and the consumers join them — uncached, each side re-scans the
    // corpus; measured s05 0.35→0.72 s without it), but it now holds ONE
    // narrow row per vector (vec_id, v, is_q, top-nProbe ids) instead of
    // the nCent-expanded frame the r16 window shape cached.
    val ca = broadcast(e.filter(col("vec_id") < nCent)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      .agg(collect_list(struct(col("cent_id"), col("cv"))).as("__ca")))
    val ranked = e.crossJoin(ca)
      .select(col("vec_id"), col("v"), isQuery.as("is_q"),
        graft.functions.ArgMinCentroids.topCosineCells(col("v"), col("__ca"), nProbe)
          .as("__top"))
      .cache()
    val assigned = ranked
      .select(col("vec_id"), col("v"), element_at(col("__top"), 1).as("cell"))
    val probes = ranked.filter(col("is_q"))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(col("__top")).as("cell"))
    (assigned, probes)
  }

  /** PQ index pieces: per-vector subspace codes and the per-query ADC
    * lookup tables. m=16 subspaces × 4 dims, ks=16 centroids per
    * subspace — 16 bytes per vector vs 256 float bytes (the corpus-head
    * stand-in codebook convention of [[ivfTopK]]; s07/m15 supply the
    * trained-centroid path). The m/ks point came from a measured sweep:
    * on THIS corpus (uniform-random embeddings — the adversarial case
    * for PQ, no cluster structure to exploit) recall@5 runs 0.2 at
    * m=4/ks=8 and 0.4 at m=16/ks=16; s13 exists precisely to measure
    * that loss, the way d19 measures LSH precision. The full measured
    * ladder (all hash-gated in-repo): ks=16 stand-in 0.4 (s13), ks=16
    * trained residual 0.36 (s17 — 64-bit codes are RATE-limited here,
    * training cannot fix them; offline 50-round Lloyd also plateaus at
    * 0.40), ks=256 trained at the SAME 16-byte code 0.80 (s19, with
    * training itself contributing +0.20 over head-init 0.60) — which is
    * why s18's PQ16×8 is the production configuration. Every subspace
    * distance rounds to 4 decimals before argmin/summation and ties
    * break on cent_id, so the encoding is engine-stable and the DuckDB
    * oracle reproduces it bit-for-bit. The codebook (256 rows) and each
    * LUT (|queries|×256 rows) broadcast; encoding is a narrow
    * per-vector map — nothing here grows super-linearly with the corpus.
    */
  def pqIndex(e: DataFrame): (DataFrame, Column => DataFrame) = {
    def d2(a: Column, b: Column): Column =
      round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x), 4)
    // ONE corpus scan explodes all m subvectors per row (the previous
    // 16-way unionAll re-scanned the embeddings once per subspace —
    // guide §6: the scan count is part of the I/O bill)
    val subs = e.select(col("vec_id"), explode(array((0 until 16).map(j =>
        struct(lit(j).as("sub"), slice(col("v"), j * 4 + 1, 4).as("sv"))): _*)).as("__s"))
      .select(col("vec_id"), col("__s.sub").as("sub"), col("__s.sv").as("sv"))
    val cb = broadcast(subs.filter(col("vec_id") < 16)
      .select(col("sub"), col("vec_id").as("cent_id"), col("sv").as("cv")))
    // r17 encoding argmin: the r16 min(struct) groupBy collapsed the
    // N·m·ks expansion map-side but still exchanged N·m code rows. The
    // codegen ArgMinCentroids.argMinRoundedDist2 loop computes the same
    // (round(d2,4) asc, cent_id asc) winner per (vec_id, sub) row over
    // the per-sub codebook array — ZERO exchange, no expansion at all:
    // the ks entries are scanned inside one generated loop.
    val cbBySub = broadcast(subs.filter(col("vec_id") < 16)
      .groupBy(col("sub"))
      .agg(collect_list(struct(col("vec_id").as("cent_id"), col("sv").as("cv")))
        .as("__cb")))
    val codes = subs.join(cbBySub, Seq("sub"))
      .select(col("vec_id"), col("sub"),
        graft.functions.ArgMinCentroids.argMinRoundedDist2(col("sv"), col("__cb"))
          .getField("cell").as("cent_id"))
    val lutOf: Column => DataFrame = isQuery => broadcast(
      subs.filter(isQuery)
        .select(col("vec_id").as("q_id"), col("sub"), col("sv").as("qsv"))
        .join(cb, Seq("sub"))
        .select(col("q_id"), col("sub"), col("cent_id"),
          d2(col("qsv"), col("cv")).as("qd2")))
    (codes, lutOf)
  }

  /** integer squared L2 over array<long> columns — the ONE shared fold
    * ([[graft.ml.KMeans.dist2]]); oracle bit-exactness depends on every
    * site using it. */
  private def d2l(a: Column, b: Column): Column = graft.ml.KMeans.dist2(a, b)

  /** Trained residual IVF-PQ index pieces on the 1e-7 integer grid:
    * (vq(vec_id, v), coarse(vec_id, cell, d2), cents(cell, cv),
    * cb(sub, scell, cv), codes(vec_id, sub, scell)). The coarse stage
    * is [[graft.ml.KMeans]] (k=8, 2 Lloyd rounds — the s07 pyramid);
    * residuals slice into m=16 4-dim subvectors; sub-codebooks train
    * via [[graft.ml.PqTrainer]] (ks=16, 2 grouped Lloyd rounds). Each
    * stage materializes ONCE per dataset through SharedFrames — the
    * index build is a batch job, queries read the compact artifacts. */
  def trainedPqIndex(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.engine.SharedFrames
    val in = Seq("embeddings.parquet")
    val vq = SharedFrames.shared("pqt_vq", s, dir, in) {
      Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), graft.ml.KMeans.quantize(col("embedding")).as("v"))
    }
    val cents = SharedFrames.shared("pqt_cents", s, dir, in) {
      graft.ml.KMeans.fit(
        Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2)._2
    }
    val coarse = SharedFrames.shared("pqt_cells", s, dir, in) {
      graft.ml.KMeans.assign(vq, cents).drop("v")
    }
    val subs = SharedFrames.shared("pqt_subs", s, dir, in) {
      val resid = vq.join(coarse.select(col("vec_id"), col("cell")), "vec_id")
        .join(broadcast(cents), "cell")
        .select(col("vec_id"), zip_with(col("v"), col("cv"), _ - _).as("rv"))
      // one residual pass explodes all m subvectors (the previous 16-way
      // unionAll recomputed the residual join per subspace)
      resid.select(col("vec_id"), explode(array((0 until 16).map(j =>
          struct(lit(j).as("sub"), slice(col("rv"), j * 4 + 1, 4).as("rv"))): _*)).as("__s"))
        .select(col("vec_id"), col("__s.sub").as("sub"), col("__s.rv").as("rv"))
    }
    val cb = SharedFrames.shared("pqt_cb", s, dir, in) {
      graft.ml.PqTrainer.train(subs, ks = 16, iters = 2)
    }
    val codes = SharedFrames.shared("pqt_codes", s, dir, in) {
      graft.ml.PqTrainer.assign(subs, cb)
        .select(col("vec_id"), col("sub"), col("scell"))
    }
    (vq, coarse, cents, cb, codes)
  }

  /** Trained PQ16×8 index pieces on the 1e-7 integer grid (raw
    * encoding, ks=256, 4 grouped Lloyd rounds — the configuration the
    * s18 scaladoc's measured sweep selected): (vq, cb(sub, scell, cv),
    * codes(vec_id, sub, scell)). SharedFrames-materialized like
    * [[trainedPqIndex]]. */
  def trainedPq256Index(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.engine.SharedFrames
    val in = Seq("embeddings.parquet")
    val vq = SharedFrames.shared("pqt_vq", s, dir, in) {
      Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), graft.ml.KMeans.quantize(col("embedding")).as("v"))
    }
    val subs = SharedFrames.shared("pq8_subs", s, dir, in) {
      (0 until 16).map(j => vq.select(col("vec_id"), lit(j).as("sub"),
        slice(col("v"), j * 4 + 1, 4).as("rv"))).reduce(_.unionAll(_))
    }
    val cb = SharedFrames.shared("pq8_cb", s, dir, in) {
      graft.ml.PqTrainer.train(subs, ks = 256, iters = 4)
    }
    val codes = SharedFrames.shared("pq8_codes", s, dir, in) {
      graft.ml.PqTrainer.assign(subs, cb)
        .select(col("vec_id"), col("sub"), col("scell"))
    }
    (vq, cb, codes)
  }

  /** per-query ADC lookup table for the raw-encoded PQ16×8 index:
    * |queries|×m×ks rows, BROADCAST. */
  private def pq256Lut(q: DataFrame, cb: DataFrame): DataFrame = {
    val qslices = (0 until 16).map(j => q.select(col("q_id"),
      lit(j).as("sub"), slice(col("qv"), j * 4 + 1, 4).as("qsv"))).reduce(_.unionAll(_))
    broadcast(qslices.join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("sub"), col("scell"),
        d2l(col("qsv"), col("cv")).as("qd2")))
  }

  /** per-(query, probed-cell) residual ADC lookup table: the query's
    * residual vs that cell's centroid, sliced per subspace, scored
    * against every sub-centroid — |pairs|×m×ks rows, BROADCAST. */
  private def trainedLut(pairs: DataFrame, cents: DataFrame, cb: DataFrame): DataFrame = {
    val qres = pairs.join(broadcast(cents), "cell")
      .select(col("q_id"), col("cell"), zip_with(col("qv"), col("cv"), _ - _).as("rq"))
    val qslices = (0 until 16).map(j => qres.select(col("q_id"), col("cell"),
      lit(j).as("sub"), slice(col("rq"), j * 4 + 1, 4).as("qsv"))).reduce(_.unionAll(_))
    broadcast(qslices.join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("cell"), col("sub"), col("scell"),
        d2l(col("qsv"), col("cv")).as("qd2")))
  }

  /** Approximate top-k via random-hyperplane LSH: 16 signed projections →
    * 4 bands of 4 bits; vectors sharing any band are candidates
    * (multi-probe style OR). 4-bit bands trade selectivity for recall —
    * right for corpora without true near-duplicates; at 100 TB with real
    * near-dups, wider bands (8-16 bits) restore selectivity. Deterministic
    * planes from a fixed-seed RNG.
    *
    * The 16-bit signature is ONE narrow HyperplaneSig expression inside
    * the scan stage — no plane crossJoin, no full-vector reshuffle (the
    * round-1 shuffle-amplified shape). The only wide exchange left is
    * the band-bucket candidate join itself.
    *
    * @param e DataFrame(vec_id: long, label, v: array<double>)
    * @param isQuery predicate over e's columns selecting query vectors
    */
  def annTopK(s: SparkSession, e: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val sigs = e.select(col("vec_id"), col("v"), isQuery.as("is_q"),
      graft.functions.VectorFunctions.hyperplaneSig(col("v"), hyperplanes).as("sig"))
    val banded = sigs.select(col("vec_id"), col("v"), col("is_q"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 4).bitwiseAND(lit(0xFL))): _*)).as(Seq("band", "bkey")))
    val q = banded.filter(col("is_q"))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("band"), col("bkey"))
    val scored = q.join(banded, Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosineSim(col("v"), col("qv")).as("c"))
      .dropDuplicates("q_id", "vec_id")
    // sharded two-phase top-k (see s02): LSH candidate lists grow with
    // the corpus — ranking them must not collapse to one task per query
    graft.kb.Kb.shardedTopK(scored, col("q_id"),
        Seq(col("c").desc, col("vec_id")), k, "rnk", col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("rnk"), round(col("c"), 4).as("cos_sim"))
  }

  /** 16 fixed pseudo-random hyperplanes over 64 dims (seeded, reproducible). */
  lazy val hyperplanes: Seq[Seq[Double]] = {
    val r = new scala.util.Random(7)
    Seq.fill(16)(Seq.fill(64)(r.nextGaussian()))
  }

  /** Vector 0 as a pgvector-style `[…]` literal (shortest-round-trip
    * doubles, so both engines parse back identical bits). */
  private def queryVecLiteral(s: SparkSession, dir: String): String =
    emb(s, dir).filter(col("vec_id") === 0).select(col("v"))
      .first().getSeq[Double](0).map(_.toString).mkString("[", ",", "]")

  private val cosExpr =
    """list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) /
       (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i]))) *
        sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i]))))"""

  /** one Lloyd round in DuckDB on the same integer grid: assign to the
    * given centroid CTE, then per-(cell, dim) rounded integer means */
  private def oKmeansRound(centCte: String, assignName: String, centName: String): String = s"""
      $assignName AS (
        SELECT vec_id, v, cell, d2 FROM (
          SELECT vec_id, v, cell, d2,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
          FROM (SELECT t.vec_id, t.v, c.cell,
              CAST(list_sum(list_transform(generate_series(1, 64),
                i -> (t.v[i] - c.cv[i]) * (t.v[i] - c.cv[i]))) AS BIGINT) AS d2
            FROM v t CROSS JOIN $centCte c))
        WHERE rk = 1),
      $centName AS (
        SELECT cell, list(m ORDER BY i) AS cv FROM (
          SELECT cell, i,
            CAST(floor(CAST(SUM(v[i]) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
          FROM $assignName, UNNEST(generate_series(1, 64)) AS t(i)
          GROUP BY cell, i)
        GROUP BY cell)"""

  /** one grouped Lloyd round over the m=16 residual subspaces in DuckDB
    * on the same integer grid as [[graft.ml.PqTrainer]]: assign every
    * (vec_id, sub) subvector to the given codebook CTE, then
    * per-(sub, scell, dim) rounded integer means. */
  private def oPqTrainRound(cbCte: String, assignName: String, cbName: String): String = s"""
      $assignName AS (
        SELECT vec_id, sub, rsv, scell FROM (
          SELECT vec_id, sub, rsv, scell,
            ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, scell) AS rk
          FROM (SELECT s.vec_id, s.sub, s.rsv, c.scell,
              CAST(list_sum(list_transform(generate_series(1, 4),
                i -> (s.rsv[i] - c.cv[i]) * (s.rsv[i] - c.cv[i]))) AS BIGINT) AS d2
            FROM subs s JOIN $cbCte c USING (sub)))
        WHERE rk = 1),
      $cbName AS (
        SELECT sub, scell, list(m ORDER BY i) AS cv FROM (
          SELECT sub, scell, i,
            CAST(floor(CAST(SUM(rsv[i]) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
          FROM $assignName, UNNEST(generate_series(1, 4)) AS t(i)
          GROUP BY sub, scell, i)
        GROUP BY sub, scell)"""

  /** the trained-residual-PQ pyramid shared by s16 and s17: integer
    * grid, coarse k-means (the s07 rounds), residual subvectors,
    * 2 grouped Lloyd rounds per subspace, final codes. Mirrors
    * [[trainedPqIndex]] clause for clause. */
  private lazy val oTrainedPqBase: String = s"""
      v AS (
        SELECT vec_id, label,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS v
        FROM embeddings),
      c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cell, v AS cv
        FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 8)),
      ${oKmeansRound("c0", "a0", "c1")},
      ${oKmeansRound("c1", "a1", "c2")},
      ${oKmeansRound("c2", "a2", "c3")},
      resid AS (
        SELECT a.vec_id,
          list_transform(generate_series(1, 64), i -> a.v[i] - c.cv[i]) AS rv
        FROM a2 a JOIN c2 c ON a.cell = c.cell),
      subs AS (SELECT vec_id, j AS sub, list_slice(rv, j*4+1, j*4+4) AS rsv
        FROM resid CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS j)),
      cb0 AS (SELECT sub, CAST(vec_id + 1 AS INTEGER) AS scell, rsv AS cv
        FROM subs WHERE vec_id < 16),
      ${oPqTrainRound("cb0", "pa0", "cb1")},
      ${oPqTrainRound("cb1", "pa1", "cb2")},
      codes AS (
        SELECT vec_id, sub, scell FROM (
          SELECT s.vec_id, s.sub, c.scell,
            ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
              CAST(list_sum(list_transform(generate_series(1, 4),
                i -> (s.rsv[i] - c.cv[i]) * (s.rsv[i] - c.cv[i]))) AS BIGINT),
              c.scell) AS rk
          FROM subs s JOIN cb2 c USING (sub))
        WHERE rk = 1)"""

  /** the trained-PQ16×8 pyramid shared by s18 and s19: integer grid,
    * raw subvector slices, 4 grouped Lloyd rounds at ks=256, final
    * codes + per-query LUT. Mirrors [[trainedPq256Index]]. */
  private lazy val oPq256Base: String = s"""
      v AS (
        SELECT vec_id, label,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS v
        FROM embeddings),
      subs AS (SELECT vec_id, j AS sub, list_slice(v, j*4+1, j*4+4) AS rsv
        FROM v CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS j)),
      cb0 AS (SELECT sub, CAST(vec_id + 1 AS INTEGER) AS scell, rsv AS cv
        FROM subs WHERE vec_id < 256),
      ${oPqTrainRound("cb0", "pb0", "cb1")},
      ${oPqTrainRound("cb1", "pb1", "cb2")},
      ${oPqTrainRound("cb2", "pb2", "cb3")},
      ${oPqTrainRound("cb3", "pb3", "cb4")},
      codes AS (
        SELECT vec_id, sub, scell FROM (
          SELECT s.vec_id, s.sub, c.scell,
            ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
              CAST(list_sum(list_transform(generate_series(1, 4),
                i -> (s.rsv[i] - c.cv[i]) * (s.rsv[i] - c.cv[i]))) AS BIGINT),
              c.scell) AS rk
          FROM subs s JOIN cb4 c USING (sub))
        WHERE rk = 1),
      lut AS (
        SELECT s.vec_id AS q_id, s.sub, c.scell,
          CAST(list_sum(list_transform(generate_series(1, 4),
            i -> (s.rsv[i] - c.cv[i]) * (s.rsv[i] - c.cv[i]))) AS BIGINT) AS qd2
        FROM subs s JOIN cb4 c USING (sub) WHERE s.vec_id < 10),
      est AS (
        SELECT l.q_id, cd.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS est_d2
        FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.scell = cd.scell
        WHERE cd.vec_id <> l.q_id
        GROUP BY l.q_id, cd.vec_id)"""

  /** 4-dim subspace squared L2 between subs alias `s` and codebook
    * alias `c`, rounded like the Spark side (pqIndex.d2). */
  private val pqD2 =
    """ROUND(list_sum(list_transform(range(1, 5),
       i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))), 4)"""

  /** the IVF-PQ composition replicated in SQL — shared by s14 (in-
    * memory) and s15 (stored-index round-trip): one oracle, two routes. */
  private lazy val ivfPqSql: String = {
      def cosOf(x: String, y: String) =
        s"""list_sum(list_transform(range(1, len($x)+1), i -> $x[i]*$y[i])) /
           (sqrt(list_sum(list_transform(range(1, len($x)+1), i -> $x[i]*$x[i]))) *
            sqrt(list_sum(list_transform(range(1, len($y)+1), i -> $y[i]*$y[i]))))"""
      s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
      cscored AS (
        SELECT e.vec_id, e.v, e.vec_id < 10 AS is_q, c.cent_id,
          ROUND(${cosOf("e.v", "c.cv")}, 4) AS cc
        FROM e CROSS JOIN cents c),
      cranked AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY cc DESC, cent_id) AS crk FROM cscored),
      assigned AS (SELECT vec_id, cent_id AS cell FROM cranked WHERE crk = 1),
      probes AS (SELECT vec_id AS q_id, cent_id AS cell
        FROM cranked WHERE is_q AND crk <= 2),
      cands AS (SELECT p.q_id, a.vec_id
        FROM probes p JOIN assigned a USING (cell) WHERE a.vec_id <> p.q_id),
      subs AS (SELECT vec_id, j AS sub, list_slice(v, j*4+1, j*4+4) AS sv
        FROM e CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS j)),
      cb AS (SELECT sub, vec_id AS cent_id, sv AS cv FROM subs WHERE vec_id < 16),
      enc AS (SELECT s.vec_id, s.sub, c.cent_id, $pqD2 AS cd2
        FROM subs s JOIN cb c USING (sub)),
      codes AS (SELECT vec_id, sub, cent_id FROM (
        SELECT enc.*, ROW_NUMBER() OVER (
          PARTITION BY vec_id, sub ORDER BY cd2 ASC, cent_id) AS rk FROM enc)
        WHERE rk = 1),
      lut AS (SELECT s.vec_id AS q_id, s.sub, c.cent_id, $pqD2 AS qd2
        FROM subs s JOIN cb c USING (sub) WHERE s.vec_id < 10),
      est AS (SELECT cn.q_id, cn.vec_id,
          CAST(SUM(CAST(l.qd2 AS DECIMAL(18,4))) AS DOUBLE) AS est
        FROM cands cn JOIN codes cd ON cd.vec_id = cn.vec_id
        JOIN lut l ON l.q_id = cn.q_id AND l.sub = cd.sub AND l.cent_id = cd.cent_id
        GROUP BY cn.q_id, cn.vec_id),
      topk AS (SELECT q_id, vec_id, est,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY est ASC, vec_id) AS rnk
        FROM est)
      SELECT q_id, vec_id, CAST(rnk AS INTEGER) AS rnk, ROUND(est, 4) AS est_d2
      FROM topk WHERE rnk <= 5 ORDER BY q_id, rnk"""
    }

  def oracles: Map[String, String] = Map(

    // functional spelling of the three pgvector operators; the Spark
    // side ran the operator sugar through the router — identical folds,
    // identical bits
    "s11_pgvector_ops" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id, e.label,
          ROUND(sqrt(list_sum(list_transform(range(1, len(e.v)+1),
            i -> (e.v[i]-q.qv[i])*(e.v[i]-q.qv[i])))), 4) AS l2,
          ROUND(-list_sum(list_transform(range(1, len(e.v)+1),
            i -> e.v[i]*q.qv[i])), 4) AS nip,
          ROUND(1.0 - list_sum(list_transform(range(1, len(e.v)+1),
              i -> e.v[i]*q.qv[i])) /
            (sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) *
             sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*q.qv[i])))), 4) AS cos_d
        FROM e CROSS JOIN q WHERE e.vec_id <> 0)
      SELECT * FROM scored ORDER BY l2, vec_id LIMIT 20""",

    // the same unrolled Lloyd rounds as s07; the SQL lifecycle must land
    // every vector in the identical cell
    "m15_kmeans_sql" -> s"""
      WITH v AS (
        SELECT vec_id, label,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS v
        FROM embeddings),
      c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cell, v AS cv
        FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 8)),
      ${oKmeansRound("c0", "a0", "c1")},
      ${oKmeansRound("c1", "a1", "c2")},
      ${oKmeansRound("c2", "a2", "c3")}
      SELECT a2.vec_id, v.label, CAST(a2.cell AS INTEGER) AS cell
      FROM a2 JOIN v USING (vec_id)
      ORDER BY a2.vec_id""",

    "s07_kmeans" -> s"""
      WITH v AS (
        SELECT vec_id, label,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS v
        FROM embeddings),
      c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cell, v AS cv
        FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 8)),
      ${oKmeansRound("c0", "a0", "c1")},
      ${oKmeansRound("c1", "a1", "c2")},
      ${oKmeansRound("c2", "a2", "c3")}
      SELECT a2.vec_id, v.label, CAST(a2.cell AS INTEGER) AS cell, a2.d2
      FROM a2 JOIN v USING (vec_id)
      ORDER BY a2.vec_id""",

    // dims enumerated 0..63 (the embedding width of the test corpus);
    // identical double arithmetic order after exact DECIMAL sums
    "s08_embedding_stats" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      px AS (
        SELECT label, d.dim, v[d.dim + 1] AS x
        FROM e, (SELECT CAST(range AS INTEGER) AS dim FROM range(0, 64)) d),
      agg AS (
        SELECT label, dim, COUNT(*) AS n,
          SUM(CAST(x AS DECIMAL(28,12))) AS sx,
          SUM(CAST(x * x AS DECIMAL(28,12))) AS sxx
        FROM px GROUP BY label, dim),
      m AS (SELECT *, CAST(sx AS DOUBLE) / n AS mu FROM agg)
      SELECT label, dim, n, ROUND(mu, 6) AS centroid,
        ROUND(CAST(sxx AS DOUBLE) / n - mu * mu, 6) AS variance
      FROM m ORDER BY label, dim""",

    "s01_knn_brute" -> s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      scored AS (
        SELECT a.vec_id, a.label, $cosExpr AS c
        FROM e a CROSS JOIN (SELECT v FROM e WHERE vec_id = 0) b
        WHERE a.vec_id <> 0),
      top AS (SELECT vec_id, label, ROUND(c, 4) AS cos_sim FROM scored
              ORDER BY c DESC, vec_id LIMIT 10)
      SELECT * FROM top ORDER BY cos_sim DESC, vec_id""",

    "s02_knn_batch" -> s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      scored AS (
        SELECT b.vec_id AS q_id, a.vec_id, $cosExpr AS c
        FROM e a JOIN e b ON b.vec_id < 10 AND a.vec_id <> b.vec_id),
      ranked AS (SELECT q_id, vec_id, c,
        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rnk FROM scored)
      SELECT q_id, vec_id, CAST(rnk AS INTEGER) AS rnk, ROUND(c, 4) AS cos_sim
      FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""",

    "s09_hard_negatives" -> s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      scored AS (
        SELECT b.vec_id AS q_id, CAST(b.label AS INTEGER) AS q_label,
               a.vec_id, CAST(a.label AS INTEGER) AS label, $cosExpr AS c
        FROM e a JOIN e b ON b.vec_id < 10 AND a.label <> b.label),
      ranked AS (SELECT *, ROW_NUMBER() OVER
        (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rnk FROM scored)
      SELECT q_id, q_label, CAST(rnk AS INTEGER) AS rnk,
        vec_id AS neg_id, label AS neg_label, ROUND(c, 4) AS cos_sim
      FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""",

    "s03_cosine_near_pairs" -> s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings)
      SELECT label, ai, bi, ROUND(c, 4) AS cos_sim FROM (
        SELECT CAST(a.label AS INTEGER) AS label, a.vec_id AS ai, b.vec_id AS bi, $cosExpr AS c
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
      WHERE c >= 0.35 ORDER BY ai, bi""",

    // The fixed-seed hyperplanes inline as literals; sign bits, 4-bit
    // bands, and the candidate join replicate the Spark plan 1:1. Ranking
    // uses the unrounded cosine (bit-identical fold), rounded on output.
    "s04_ann_lsh" -> {
      val planeRows = hyperplanes.zipWithIndex
        .map { case (p, i) => s"($i, [${p.mkString(", ")}]::DOUBLE[])" }
        .mkString(",\n        ")
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v, vec_id < 20 AS is_q
                 FROM embeddings),
      planes(p, pv) AS (VALUES $planeRows),
      bits AS (
        SELECT vec_id, is_q, p,
          CASE WHEN list_sum(list_transform(range(1, len(v)+1), i -> v[i] * pv[i])) > 0
            THEN (1::BIGINT << p) ELSE 0::BIGINT END bt
        FROM e CROSS JOIN planes),
      sig AS (SELECT vec_id, is_q, sum(bt)::BIGINT s FROM bits GROUP BY 1, 2),
      bands AS (SELECT vec_id, is_q, b, (s >> (b*4)) & 15 bkey
                FROM sig CROSS JOIN range(0, 4) t(b)),
      qb AS (SELECT vec_id q_id, b, bkey FROM bands WHERE is_q),
      cands AS (
        SELECT DISTINCT qb.q_id, x.vec_id
        FROM qb JOIN bands x ON qb.b = x.b AND qb.bkey = x.bkey AND x.vec_id <> qb.q_id),
      scored AS (
        SELECT cd.q_id, cd.vec_id, $cosExpr AS c
        FROM cands cd JOIN e a ON a.vec_id = cd.vec_id JOIN e b ON b.vec_id = cd.q_id),
      ranked AS (SELECT q_id, vec_id, c,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rnk
        FROM scored)
      SELECT q_id, vec_id, CAST(rnk AS INTEGER) AS rnk, ROUND(c, 4) AS cos_sim
      FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk"""
    },

    // the exact arm re-states s02's ranking, the approximate arm s05's
    // probe pipeline; recall joins the two k-sized sets
    "s10_ann_recall" -> {
      def cosOf(x: String, y: String) =
        s"""list_sum(list_transform(range(1, len($x)+1), i -> $x[i]*$y[i])) /
           (sqrt(list_sum(list_transform(range(1, len($x)+1), i -> $x[i]*$x[i]))) *
            sqrt(list_sum(list_transform(range(1, len($y)+1), i -> $y[i]*$y[i]))))"""
      s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      scored AS (SELECT b.vec_id AS q_id, a.vec_id, $cosExpr AS c
        FROM e a JOIN e b ON b.vec_id < 10 AND a.vec_id <> b.vec_id),
      exact AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rnk
        FROM scored) WHERE rnk <= 5),
      cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
      cscored AS (
        SELECT e.vec_id, e.v, e.vec_id < 10 AS is_q, c.cent_id,
          ROUND(${cosOf("e.v", "c.cv")}, 4) AS cc
        FROM e CROSS JOIN cents c),
      cranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id) AS crk
        FROM cscored),
      assigned AS (SELECT vec_id, v, cent_id AS cell FROM cranked WHERE crk = 1),
      probes AS (SELECT vec_id AS q_id, v AS qv, cent_id AS cell FROM cranked WHERE is_q AND crk <= 2),
      cands AS (SELECT DISTINCT p.q_id, a.vec_id, ROUND(${cosOf("a.v", "p.qv")}, 4) AS c
        FROM probes p JOIN assigned a USING (cell) WHERE a.vec_id <> p.q_id),
      approx AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rnk
        FROM cands) WHERE rnk <= 5)
      SELECT x.q_id,
        CAST(SUM(CASE WHEN a2.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 5
          AS recall_at_5
      FROM exact x LEFT JOIN approx a2 ON x.q_id = a2.q_id AND x.vec_id = a2.vec_id
      GROUP BY x.q_id ORDER BY x.q_id"""
    },

    "s05_ann_ivf" -> {
      def cosOf(x: String, y: String) =
        s"""list_sum(list_transform(range(1, len($x)+1), i -> $x[i]*$y[i])) /
           (sqrt(list_sum(list_transform(range(1, len($x)+1), i -> $x[i]*$x[i]))) *
            sqrt(list_sum(list_transform(range(1, len($y)+1), i -> $y[i]*$y[i]))))"""
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
      scored AS (
        SELECT e.vec_id, e.v, e.vec_id < 10 AS is_q, c.cent_id,
          ROUND(${cosOf("e.v", "c.cv")}, 4) AS cc
        FROM e CROSS JOIN cents c),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id) AS crk
        FROM scored),
      assigned AS (SELECT vec_id, v, cent_id AS cell FROM ranked WHERE crk = 1),
      probes AS (SELECT vec_id AS q_id, v AS qv, cent_id AS cell FROM ranked WHERE is_q AND crk <= 2),
      cands AS (SELECT DISTINCT p.q_id, a.vec_id, ROUND(${cosOf("a.v", "p.qv")}, 4) AS c
        FROM probes p JOIN assigned a USING (cell) WHERE a.vec_id <> p.q_id),
      topk AS (SELECT q_id, vec_id, c,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rnk
        FROM cands)
      SELECT q_id, vec_id, CAST(rnk AS INTEGER) AS rnk, c AS cos_sim
      FROM topk WHERE rnk <= 5 ORDER BY q_id, rnk"""
    },

    // Same global max-|x| scale, same floor(x/S*128) int8 quantizer
    // (identical operation order keeps the doubles bit-equal), same
    // integer dot/norms — the ranking cosine is a deterministic function
    // of exact integers on both engines.
    // PQ encode/ADC replicated clause-for-clause: same subspace slices,
    // same rounded subspace distances, same cent_id tiebreak, same
    // DECIMAL summation of the 4 looked-up entries
    "s12_pq_topk" -> s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      subs AS (SELECT vec_id, j AS sub, list_slice(v, j*4+1, j*4+4) AS sv
        FROM e CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS j)),
      cb AS (SELECT sub, vec_id AS cent_id, sv AS cv FROM subs WHERE vec_id < 16),
      enc AS (SELECT s.vec_id, s.sub, c.cent_id, $pqD2 AS cd2
        FROM subs s JOIN cb c USING (sub)),
      codes AS (SELECT vec_id, sub, cent_id FROM (
        SELECT enc.*, ROW_NUMBER() OVER (
          PARTITION BY vec_id, sub ORDER BY cd2 ASC, cent_id) AS rk FROM enc)
        WHERE rk = 1),
      lut AS (SELECT s.sub, c.cent_id, $pqD2 AS qd2
        FROM subs s JOIN cb c USING (sub) WHERE s.vec_id = 0),
      est AS (SELECT cd.vec_id,
          CAST(SUM(CAST(l.qd2 AS DECIMAL(18,4))) AS DOUBLE) AS est_d2
        FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.cent_id = cd.cent_id
        WHERE cd.vec_id <> 0 GROUP BY cd.vec_id),
      ranked AS (SELECT vec_id, est_d2,
          ROW_NUMBER() OVER (ORDER BY est_d2 ASC, vec_id) AS rnk FROM est)
      SELECT r.vec_id, e.label, ROUND(r.est_d2, 4) AS est_d2,
        CAST(r.rnk AS INTEGER) AS rnk
      FROM ranked r JOIN e USING (vec_id) WHERE rnk <= 10 ORDER BY rnk""",

    "s13_pq_recall" -> s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
      exact AS (SELECT q_id, vec_id FROM (
        SELECT q.q_id, e.vec_id,
          ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
            ROUND(list_sum(list_transform(range(1, len(e.v)+1),
              i -> (e.v[i]-q.qv[i])*(e.v[i]-q.qv[i]))), 4) ASC, e.vec_id) AS rnk
        FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) WHERE rnk <= 5),
      subs AS (SELECT vec_id, j AS sub, list_slice(v, j*4+1, j*4+4) AS sv
        FROM e CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS j)),
      cb AS (SELECT sub, vec_id AS cent_id, sv AS cv FROM subs WHERE vec_id < 16),
      enc AS (SELECT s.vec_id, s.sub, c.cent_id, $pqD2 AS cd2
        FROM subs s JOIN cb c USING (sub)),
      codes AS (SELECT vec_id, sub, cent_id FROM (
        SELECT enc.*, ROW_NUMBER() OVER (
          PARTITION BY vec_id, sub ORDER BY cd2 ASC, cent_id) AS rk FROM enc)
        WHERE rk = 1),
      lut AS (SELECT s.vec_id AS q_id, s.sub, c.cent_id, $pqD2 AS qd2
        FROM subs s JOIN cb c USING (sub) WHERE s.vec_id < 10),
      est AS (SELECT l.q_id, cd.vec_id,
          CAST(SUM(CAST(l.qd2 AS DECIMAL(18,4))) AS DOUBLE) AS est
        FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.cent_id = cd.cent_id
        WHERE cd.vec_id <> l.q_id GROUP BY l.q_id, cd.vec_id),
      approx AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY est ASC, vec_id) AS rnk
        FROM est) WHERE rnk <= 5)
      SELECT x.q_id,
        CAST(SUM(CASE WHEN a2.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 5
          AS recall_at_5
      FROM exact x LEFT JOIN approx a2 ON x.q_id = a2.q_id AND x.vec_id = a2.vec_id
      GROUP BY x.q_id ORDER BY x.q_id""",

    // the s05 coarse pyramid feeding the s12 ADC pyramid, candidates
    // restricted to probed cells
    "s14_ivf_pq" -> ivfPqSql,

    // the stored-index round-trip must answer exactly what the in-memory
    // composition answers — one oracle, two routes
    "s15_pq_stored" -> ivfPqSql,

    // trained residual IVF-PQ: the coarse/train/encode pyramid
    // (oTrainedPqBase) feeding probes → per-cell residual LUT → ADC sum
    // over probed candidates — exact integer arithmetic end to end
    "s16_ivfpq_trained" -> s"""
      WITH $oTrainedPqBase,
      pqd AS (
        SELECT q.vec_id AS q_id, c.cell,
          CAST(list_sum(list_transform(generate_series(1, 64),
            i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))) AS BIGINT) AS d2
        FROM v q CROSS JOIN c2 c WHERE q.vec_id < 10),
      probes AS (SELECT q_id, cell FROM (
          SELECT q_id, cell,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d2, cell) AS crk
          FROM pqd) WHERE crk <= 2),
      qres AS (
        SELECT p.q_id, p.cell,
          list_transform(generate_series(1, 64), i -> q.v[i] - c.cv[i]) AS rq
        FROM probes p JOIN v q ON q.vec_id = p.q_id JOIN c2 c ON c.cell = p.cell),
      qsubs AS (SELECT q_id, cell, j AS sub, list_slice(rq, j*4+1, j*4+4) AS qsv
        FROM qres CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS j)),
      lut AS (
        SELECT s.q_id, s.cell, s.sub, c.scell,
          CAST(list_sum(list_transform(generate_series(1, 4),
            i -> (s.qsv[i] - c.cv[i]) * (s.qsv[i] - c.cv[i]))) AS BIGINT) AS qd2
        FROM qsubs s JOIN cb2 c USING (sub)),
      cands AS (SELECT p.q_id, p.cell, a.vec_id
        FROM probes p JOIN a2 a USING (cell) WHERE a.vec_id <> p.q_id),
      est AS (
        SELECT cn.q_id, cn.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS est_d2
        FROM cands cn JOIN codes cd ON cd.vec_id = cn.vec_id
        JOIN lut l ON l.q_id = cn.q_id AND l.cell = cn.cell
          AND l.sub = cd.sub AND l.scell = cd.scell
        GROUP BY cn.q_id, cn.vec_id),
      topk AS (SELECT q_id, vec_id, est_d2,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY est_d2, vec_id) AS rnk
        FROM est)
      SELECT q_id, vec_id, CAST(rnk AS INTEGER) AS rnk, est_d2
      FROM topk WHERE rnk <= 5 ORDER BY q_id, rnk""",

    // recall@5 of the trained path: exact integer-grid L2 top-5 vs the
    // all-candidate residual-ADC top-5 (same m/ks/corpus/k as s13)
    "s17_pq_trained_recall" -> s"""
      WITH $oTrainedPqBase,
      exact AS (SELECT q_id, vec_id FROM (
          SELECT q.vec_id AS q_id, e.vec_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              CAST(list_sum(list_transform(generate_series(1, 64),
                i -> (e.v[i] - q.v[i]) * (e.v[i] - q.v[i]))) AS BIGINT),
              e.vec_id) AS rnk
          FROM v e CROSS JOIN v q
          WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id) WHERE rnk <= 5),
      qres AS (
        SELECT q.vec_id AS q_id, c.cell,
          list_transform(generate_series(1, 64), i -> q.v[i] - c.cv[i]) AS rq
        FROM v q CROSS JOIN c2 c WHERE q.vec_id < 10),
      qsubs AS (SELECT q_id, cell, j AS sub, list_slice(rq, j*4+1, j*4+4) AS qsv
        FROM qres CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS j)),
      lut AS (
        SELECT s.q_id, s.cell, s.sub, c.scell,
          CAST(list_sum(list_transform(generate_series(1, 4),
            i -> (s.qsv[i] - c.cv[i]) * (s.qsv[i] - c.cv[i]))) AS BIGINT) AS qd2
        FROM qsubs s JOIN cb2 c USING (sub)),
      est AS (
        SELECT q.vec_id AS q_id, a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS est
        FROM a2 a CROSS JOIN (SELECT vec_id FROM v WHERE vec_id < 10) q
        JOIN codes cd ON cd.vec_id = a.vec_id
        JOIN lut l ON l.q_id = q.vec_id AND l.cell = a.cell
          AND l.sub = cd.sub AND l.scell = cd.scell
        WHERE a.vec_id <> q.vec_id
        GROUP BY q.vec_id, a.vec_id),
      approx AS (SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY est, vec_id) AS rnk
          FROM est) WHERE rnk <= 5)
      SELECT x.q_id,
        CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 5
          AS recall_at_5
      FROM exact x LEFT JOIN approx ap ON x.q_id = ap.q_id AND x.vec_id = ap.vec_id
      GROUP BY x.q_id ORDER BY x.q_id""",

    // trained PQ16×8 ADC ranking — codebooks after 4 grouped Lloyd
    // rounds at ks=256, exact integer arithmetic end to end
    "s18_pq16x8_topk" -> s"""
      WITH $oPq256Base,
      topk AS (SELECT q_id, vec_id, est_d2,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY est_d2, vec_id) AS rnk
        FROM est)
      SELECT q_id, vec_id, CAST(rnk AS INTEGER) AS rnk, est_d2
      FROM topk WHERE rnk <= 5 ORDER BY q_id, rnk""",

    // the production recall gate: trained PQ16×8 vs exact integer L2
    "s19_pq16x8_recall" -> s"""
      WITH $oPq256Base,
      exact AS (SELECT q_id, vec_id FROM (
          SELECT q.vec_id AS q_id, e.vec_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              CAST(list_sum(list_transform(generate_series(1, 64),
                i -> (e.v[i] - q.v[i]) * (e.v[i] - q.v[i]))) AS BIGINT),
              e.vec_id) AS rnk
          FROM v e CROSS JOIN v q
          WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id) WHERE rnk <= 5),
      approx AS (SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY est_d2, vec_id) AS rnk
          FROM est) WHERE rnk <= 5)
      SELECT x.q_id,
        CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 5
          AS recall_at_5
      FROM exact x LEFT JOIN approx ap ON x.q_id = ap.q_id AND x.vec_id = ap.vec_id
      GROUP BY x.q_id ORDER BY x.q_id""",

    "s06_quantized_knn" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      s AS (SELECT MAX(GREATEST(ABS(list_max(v)), ABS(list_min(v)))) s FROM e),
      q AS (
        SELECT vec_id, label,
          list_transform(v, x -> CAST(GREATEST(-128, LEAST(127,
            FLOOR(x / s * 128))) AS INTEGER)) qv
        FROM e CROSS JOIN s),
      qq AS (SELECT qv AS quv,
        CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) qnb
        FROM q WHERE vec_id = 0),
      scored AS (
        SELECT vec_id, label,
          CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * quv[i])) AS BIGINT) qdot,
          CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) qna, qnb
        FROM q CROSS JOIN qq WHERE vec_id <> 0)
      SELECT vec_id, label, qdot,
        ROUND(CAST(qdot AS DOUBLE) / SQRT(CAST(qna AS DOUBLE) * CAST(qnb AS DOUBLE)), 4) qcos
      FROM scored
      ORDER BY CAST(qdot AS DOUBLE) / SQRT(CAST(qna AS DOUBLE) * CAST(qnb AS DOUBLE)) DESC, vec_id
      LIMIT 10"""
  )
}

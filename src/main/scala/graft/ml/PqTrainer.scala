package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Grouped per-subspace k-means for product quantization — the codebook
  * TRAINING step FAISS runs inside IVF-PQ (faiss/IndexIVFPQ.cpp trains
  * one k-means per subquantizer on coarse-cell residuals; the reference
  * consumes such indexes through its vector-store handlers,
  * mindsdb/integrations/libs/vectordatabase_handler.py). All m subspaces
  * train in ONE grouped Lloyd iteration: the group key `sub` rides every
  * aggregation, so adding subspaces adds rows, not jobs.
  *
  * Scale design (100 TB): assignment joins the N×m subvector rows
  * against a BROADCAST m×ks codebook (bounded by codebook size, never
  * by the corpus) and argmins inside a (vec_id, sub) window of exactly
  * ks rows; the update shuffles only (sub, scell, dim, partial-sum) —
  * m×ks×subDim rows after map-side combine regardless of corpus size.
  *
  * Determinism: inputs are residuals on [[KMeans]]'s 1e-7 integer grid,
  * so distances/sums/rounded means are exact 64-bit arithmetic with
  * scell-ascending tie-breaks — the DuckDB oracle unrolls the identical
  * rounds bit-for-bit (graft.queries.Similarity oPqTrainRound).
  */
object PqTrainer {

  /** nearest sub-centroid per (vec_id, sub): adds (scell, d2). `cb` must
    * be m×ks rows of (sub, scell, cv) — broadcast by construction.
    *
    * LEFT ALONE after a measured comparison (r16): the fully-inline
    * array_min-over-broadcast-array variant (zero shuffle) forces
    * KMeans.dist2 through the interpreted higher-order-function path per
    * codebook entry — s16-s19 measured 1.2-2× of this window shape,
    * whose exchange is bounded by ks (a constant ≤256) × the subvector
    * frame and stays whole-stage-codegen up to the sort. */
  def assign(subs: DataFrame, cb: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d2"), col("scell"))
    subs.join(broadcast(cb), Seq("sub"))
      .withColumn("d2", KMeans.dist2(col("rv"), col("cv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("sub"), col("rv"), col("scell"), col("d2"))
  }

  /** grouped Lloyd update: per-(sub, scell, dim) integer mean,
    * reassembled in dim order. One shuffle, m×ks×subDim rows out. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("sub"), col("scell"), posexplode(col("rv")))
      .groupBy(col("sub"), col("scell"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .withColumn("m",
        floor(col("s").cast(DoubleType) / col("n") + 0.5).cast(LongType))
      .groupBy(col("sub"), col("scell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        st => st.getField("m")).as("cv"))

  /** Train m sub-codebooks of `ks` centroids each over residual
    * subvectors (vec_id, sub, rv: array<long>), initialized from the ks
    * lexicographically-first vec_ids (scell = vec_id + 1, the
    * [[KMeans.fit]] convention). @return (sub, scell, cv). */
  def train(subs: DataFrame, ks: Int, iters: Int): DataFrame = {
    var cb = subs.filter(col("vec_id") < ks)
      .select(col("sub"), (col("vec_id") + 1).cast("int").as("scell"),
        col("rv").as("cv"))
    var i = 0
    while (i < iters) { cb = update(assign(subs, cb)); i += 1 }
    cb
  }
}

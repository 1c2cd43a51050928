package graft.ml

import org.apache.spark.sql.DataFrame
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
    * r17: the r16 comparison kept a window shape only because the inline
    * argmin ran KMeans.dist2 through interpreted higher-order-function
    * eval. With the codegen [[graft.functions.ArgMinCentroids.argMinDist2]]
    * loop the zero-shuffle shape wins: the codebook pre-groups to m rows
    * of (sub, array<struct<scell,cv>>) — a build-side-only aggregation of
    * a 256-row frame — and the broadcast hash join on `sub` appends each
    * row's ks-entry array, argmin'd per row in whole-stage codegen with
    * the window's exact (d2 asc, scell asc) winner. The subvector frame
    * never hits an Exchange. */
  def assign(subs: DataFrame, cb: DataFrame): DataFrame = {
    val cbBySub = broadcast(cb.groupBy(col("sub"))
      .agg(collect_list(struct(col("scell"), col("cv"))).as("__cb")))
    subs.join(cbBySub, Seq("sub"))
      .withColumn("__best",
        graft.functions.ArgMinCentroids.argMinDist2(col("rv"), col("__cb")))
      .select(col("vec_id"), col("sub"), col("rv"),
        col("__best.cell").as("scell"), col("__best.d2").as("d2"))
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

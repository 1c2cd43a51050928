package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed Lloyd's k-means over an embedding column — the
  * trained-centroid companion to the IVF operators (s05/k14 use
  * deterministic stand-in codebooks; this supplies real centers with the
  * same plan shape: broadcast centroids, narrow argmin assignment).
  *
  * Scale design (100 TB):
  *   - assignment never shuffles the corpus: k centroids broadcast, the
  *     argmin is a per-row array fold;
  *   - the update step shuffles only (cell, dim, partial sum) — k×d rows
  *     after map-side combine, regardless of corpus size;
  *   - iterations are a driver loop over lazy plans (k-means is
  *     inherently synchronous per round).
  *
  * Determinism: vectors are quantized to a 1e-7 integer grid (same
  * spirit as the s06 SQ8 operator), so distances, sums, and rounded
  * means are EXACT 64-bit integer arithmetic — bit-identical across
  * engines and partition orders, with cell-ascending tie-breaks. The
  * DuckDB oracle unrolls the same iterations on the same grid.
  * Magnitude check: |component| ≤ ~200 on this grid is 2e9; a squared
  * diff is ≤ 4e18 / dims — with unit-norm-ish embeddings the 64-dim
  * fold stays far inside Long range.
  */
object KMeans {

  /** quantize: float component → scaled long on the 1e-7 grid
    * (floor(x·1e7 + 0.5) = round-half-up, identical in any engine). */
  def quantize(vecCol: Column): Column =
    transform(vecCol, x => floor(x.cast(DoubleType) * 1e7 + 0.5).cast(LongType))

  /** integer squared L2 over array<long> columns (exact 64-bit fold) —
    * THE one spelling shared by k-means, PQ training, and the trained-PQ
    * query pack: the DuckDB oracles' bit-for-bit contract depends on
    * every site folding identically. */
  def dist2(a: Column, c: Column): Column =
    aggregate(zip_with(a, c, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** nearest-centroid assignment: (vec_id, v, cell). `cents` must be
    * k rows of (cell, cv) — broadcast by construction.
    *
    * r17: the r16 three-way comparison (window / inline HOF argmin /
    * min(struct) groupBy) kept the window only because the inline shape
    * ran dist2 through interpreted higher-order-function eval. The
    * codegen [[graft.functions.ArgMinCentroids.argMinDist2]] loop makes
    * the zero-shuffle inline shape also the fastest one: the codebook
    * ships as ONE broadcast row of array<struct<cell,cv>> and the
    * (d2 asc, cell asc) winner — the exact integer fold and tie-break
    * the window ordered by — is computed per row in whole-stage codegen.
    * No Exchange touches the corpus. */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val ca = broadcast(cents.agg(
      collect_list(struct(col("cell"), col("cv"))).as("__cb")))
    vecs.crossJoin(ca)
      .withColumn("__best",
        graft.functions.ArgMinCentroids.argMinDist2(col("v"), col("__cb")))
      .select(col("vec_id"), col("v"),
        col("__best.cell").as("cell"), col("__best.d2").as("d2"))
  }

  /** Lloyd update: per-(cell, dim) integer mean, reassembled in dim
    * order. One shuffle, k×d rows out. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("v")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .withColumn("m",
        floor(col("s").cast(DoubleType) / col("n") + 0.5).cast(LongType))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        st => st.getField("m")).as("cv"))

  /** @return (assignments(vec_id, cell, d2), centroids(cell, cv)) after
    *         `iters` Lloyd rounds from the k lexicographically-first ids. */
  def fit(raw: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame) = {
    val vecs = raw.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("v"))
    var cents = vecs.orderBy(col("vec_id")).limit(k)
      .withColumn("cell", row_number().over(Window.orderBy(col("vec_id"))))
      .select(col("cell"), col("v").as("cv"))
    var i = 0
    while (i < iters) { cents = update(assign(vecs, cents)); i += 1 }
    (assign(vecs, cents).drop("v"), cents)
  }

  /** Train and package as a catalog model (`CREATE MODEL … USING
    * engine='kmeans'`): centroids collect at train time (k×d longs —
    * driver-safe by construction) and rebuild as a broadcast frame per
    * apply. */
  def trained(name: String, train: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): KmModel = {
    val (_, cents) = fit(train, idCol, vecCol, k, iters)
    KmModel(name, vecCol, cents.collect().toSeq)
  }

  private val centSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("cv",
      org.apache.spark.sql.types.ArrayType(LongType))))

  /** Trained k-means in the model catalog: applying the model assigns
    * each row's vector to its nearest centroid (`cell` column). Same
    * row-id join-back discipline as the other FrameModels. */
  final case class KmModel(
      name: String,
      vecCol: String,
      centRows: Seq[org.apache.spark.sql.Row]) extends FrameModel {
    def featureCols: Seq[String] = Seq(vecCol)
    def outputSchema: org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType)))
    def transform(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val cents = spark.createDataFrame(
        spark.sparkContext.parallelize(centRows, 1), centSchema)
      val rid = Predict.RowIdCol
      val withId = df.withColumn(rid, monotonically_increasing_id())
      val assigned = KMeans.assign(
        withId.select(col(rid).as("vec_id"), quantize(col(vecCol)).as("v")), cents)
        .select(col("vec_id").as(rid), col("cell"))
      withId.join(assigned, Seq(rid), "left").drop(rid)
    }
  }
}

package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-as-table: the reference's ApplyPredictorStep re-expressed
  * Spark-first (apply_predictor_step.py:112-200; planner join semantics
  * plan_join.py:367-368).
  *
  * The reference materializes the input, appends `__mindsdb_row_id`,
  * sends the frame to an out-of-process model runtime, and joins the
  * predictions back on the row id. Here the same contract is:
  * `monotonically_increasing_id` → batched `mapPartitions` inference →
  * row-id equi-join. The row id is generated per-partition (no global
  * counter, no driver round-trip) and the join is co-partitioned with
  * the input, so the whole apply is shuffle-free until the user's own
  * downstream operators.
  */
trait Model {
  def name: String
  /** Model output schema, minus the row id (GetPredictorColumns,
    * steps.py:183 — empty frame with this schema). */
  def outputSchema: StructType
  /** Feature columns the model consumes, in order. */
  def featureCols: Seq[String]
  /** Batched inference over feature rows: one Seq[Double] per input row,
    * one output Row per input row (order-preserving within the batch). */
  def predictBatch(batch: Seq[Array[Double]]): Seq[Row]
}

/** Models that apply as a whole-DataFrame transform rather than a
  * numeric row batch — text classifiers and other models whose features
  * are not fixed-width doubles. `Predict.applyModel` dispatches here
  * before the batched numeric path. */
trait FrameModel extends Model {
  def transform(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame
  final def predictBatch(batch: Seq[Array[Double]]): Seq[Row] =
    throw new UnsupportedOperationException(s"$name applies via transform, not numeric batches")
}

/** Deterministic linear scorer — the test-harness stand-in for a real
  * model runtime (the reference's dummy ML engine predicts a constant;
  * tests/unit/dummy_ml_handler). Score is a plain left-to-right affine
  * fold so the DuckDB oracle reproduces it bit-for-bit. */
final case class LinearModel(
    name: String,
    featureCols: Seq[String],
    weights: Seq[Double],
    bias: Double,
    scoreCol: String = "score") extends Model {
  require(weights.length == featureCols.length)
  def outputSchema: StructType = StructType(Seq(StructField(scoreCol, DoubleType)))
  def predictBatch(batch: Seq[Array[Double]]): Seq[Row] = batch.map { fs =>
    var acc = bias
    var i = 0
    while (i < weights.length) { acc += weights(i) * fs(i); i += 1 }
    Row(acc)
  }
}

object Predict {

  val RowIdCol = "__graft_row_id"
  /** Inference batch size (reference batches model input frames;
    * partition_size USING param, plan_join.py:820-852). */
  val BatchSize = 1024

  /** Apply a model to a frame with row-id join semantics.
    *
    * Returns the input columns plus the model's output columns. The
    * prediction side carries ONLY (row_id, outputs) — joining keys and
    * payload stay on the input side, so nothing wide is duplicated
    * through the join.
    */
  def applyModel(data: DataFrame, model: Model, cache: Option[PredictionCache] = None): DataFrame = model match {
    case fm: FrameModel => fm.transform(data)
    case _ => applyNumeric(data, model, cache)
  }

  private def applyNumeric(data: DataFrame, model: Model, cache: Option[PredictionCache]): DataFrame = {
    val spark = data.sparkSession
    cache.flatMap(_.get(model, data)) match {
      case Some(hit) =>
        // content-keyed rejoin: a deterministic model's prediction is a
        // function of the feature tuple alone, so cached rows (deduped
        // per tuple at put time) join back on the feature VALUES — valid
        // under any repartitioning of `data`, unlike a regenerated
        // monotonically_increasing_id (whose assignment depends on the
        // physical partition layout of the run that wrote the cache).
        // null-safe equality: a NULL feature tuple must rejoin its cached
        // prediction exactly like the miss path emitted it (plain === is
        // three-valued and silently drops such rows on a hit)
        val cond = model.featureCols
          .map(f => col(f).cast(DoubleType) <=> hit(s"__feat_$f"))
          .reduce(_ && _)
        model.featureCols.foldLeft(data.join(hit, cond)) {
          (df, f) => df.drop(s"__feat_$f")
        }
      case None =>
        val withId = data.withColumn(RowIdCol, monotonically_increasing_id())
        val featIdx = model.featureCols.zipWithIndex.map(_._2 + 1) // after row id
        val inputs = withId.select(
          (col(RowIdCol) +: model.featureCols.map(c => col(c).cast(DoubleType))): _*)
        val outSchema = StructType(StructField(RowIdCol, LongType) +: model.outputSchema.fields)
        val enc = RowEncoder.encoderFor(outSchema)
        val preds = inputs.mapPartitions { it =>
          it.grouped(BatchSize).flatMap { chunk =>
            // a NULL feature reads as NaN (not a crash): the prediction
            // propagates NaN, and the row survives the apply like any other
            val feats = chunk.map(r =>
              featIdx.map(i => if (r.isNullAt(i)) Double.NaN else r.getDouble(i)).toArray)
            val ids = chunk.map(_.getLong(0))
            model.predictBatch(feats).zip(ids).map { case (out, id) =>
              Row.fromSeq(id +: out.toSeq)
            }
          }
        }(enc)
        cache.foreach { c =>
          // persist (feature tuple → outputs), one row per distinct tuple
          val keyed = inputs.join(preds, Seq(RowIdCol)).drop(RowIdCol)
            .dropDuplicates(model.featureCols)
          c.put(model, data, model.featureCols.foldLeft(keyed) {
            (df, f) => df.withColumnRenamed(f, s"__feat_$f")
          })
        }
        // within one run the regenerated-id join is exact: both sides
        // derive from the same withId plan evaluated under one action
        withId.join(preds, Seq(RowIdCol)).drop(RowIdCol)
    }
  }

  /** ApplyPredictorRowStep (steps.py:172): predict for literal WHERE
    * values — a one-row frame through the same apply path. */
  def applyRow(spark: SparkSession, model: Model, values: Map[String, Double]): DataFrame = {
    val row = spark.range(1).select(
      model.featureCols.map(c => lit(values(c)).as(c)): _*)
    applyModel(row, model)
  }

  /** GetPredictorColumns (steps.py:183): empty frame with the model's
    * output schema. */
  def predictorColumns(spark: SparkSession, model: Model): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], model.outputSchema)

  /** GetTableColumns (steps.py:192): empty frame with a table's schema. */
  def tableColumns(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.sparkSession.sparkContext.emptyRDD[Row], df.schema)
}

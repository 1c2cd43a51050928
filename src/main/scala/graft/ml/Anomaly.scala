package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-score anomaly detection engine — `CREATE MODEL … USING
  * engine='anomaly', features='<col>' [, group_by='<col>'] [, threshold=k]`
  * (the reference's anomaly-detection ML-engine slot in the same
  * multi-engine lifecycle as OLS / Naive Bayes / k-means).
  *
  * Train: per-group mean and population σ of the feature from ONE
  * aggregation pass over exact-decimal sufficient sums (n, Σx, Σx²) —
  * the group stats are model-sized (|groups| rows, like NB's vocabulary)
  * and collect to the driver as the model state. Apply: stats broadcast
  * back, score = (x − μ)/σ per row, flagged when |score| > threshold —
  * a map-side join + narrow projection at any corpus size.
  *
  * Determinism: μ and σ derive from decimal sums (order-independent);
  * the score rounds via floor(z·10⁴+0.5)/10⁴, which two engines compute
  * identically on the same double regardless of tie-breaking rules.
  */
object Anomaly {

  final case class GroupStats(key: Option[String], mean: Double, std: Double)

  final case class AnomalyModel(
      name: String,
      featureCol: String,
      groupCol: Option[String],
      threshold: Double,
      stats: Seq[GroupStats]) extends FrameModel {
    override def featureCols: Seq[String] = featureCol +: groupCol.toSeq
    override def outputSchema: StructType = StructType(Seq(
      StructField("score", DoubleType), StructField("is_anomaly", BooleanType)))

    override def transform(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val statsDf = broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(
          stats.map(s => Row(s.key.orNull, s.mean, s.std)), 1),
        StructType(Seq(
          StructField("__g", StringType),
          StructField("__mu", DoubleType, nullable = false),
          StructField("__sigma", DoubleType, nullable = false)))))
      val joined = groupCol match {
        case Some(g) => df.join(statsDf, col(g).cast(StringType) <=> col("__g"), "left")
        case None => df.crossJoin(statsDf)
      }
      joined
        .withColumn("score", floor(
          (col(featureCol) - col("__mu")) / col("__sigma") * 1e4 + 0.5) / 1e4)
        .withColumn("is_anomaly", abs(col("score")) > threshold)
        .drop("__g", "__mu", "__sigma")
    }
  }

  /** One-pass exact-decimal train. Population σ (the reference's z-score
    * convention); zero-variance groups get σ=1 so constant series score 0. */
  def trained(name: String, data: DataFrame, featureCol: String,
      groupCol: Option[String], threshold: Double): AnomalyModel = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(19, 4))
    val x = col(featureCol)
    val gb = groupCol.map(g => data.groupBy(col(g).cast(StringType).as("__g")))
      .getOrElse(data.groupBy(lit(null).cast(StringType).as("__g")))
    val rows = gb.agg(
        count(x).cast(DoubleType).as("n"),
        sum(dec(x)).cast(DoubleType).as("sx"),
        sum(dec(x) * dec(x)).cast(DoubleType).as("sxx"))
      .collect()
    val stats = rows.toSeq.map { r =>
      val n = r.getDouble(1); val sx = r.getDouble(2); val sxx = r.getDouble(3)
      val mu = sx / n
      val variance = (sxx - sx * sx / n) / n
      GroupStats(Option(r.getString(0)), mu, if (variance > 0) math.sqrt(variance) else 1.0)
    }
    AnomalyModel(name, featureCol, groupCol, threshold, stats)
  }
}

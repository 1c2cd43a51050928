package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Multinomial Naive Bayes over token features — a count-based classifier
  * whose training IS two aggregations, so the full train→predict cycle is
  * exactly verifiable against a SQL oracle (gradient-trained models are
  * not). Fills the classification slot next to [[Fit]]'s OLS regression in
  * the reference's model surface (`CREATE MODEL … PREDICT <label>`;
  * reference model lifecycle at
  * mindsdb/interfaces/model/model_controller.py).
  *
  * Scale design:
  *   - train: one explode + two hash aggregations; the model table is
  *     |vocab| × |classes| rows — vocabulary-bounded, NOT corpus-bounded,
  *     so it BROADCASTS at any corpus size.
  *   - predict: per-doc token counts (the only corpus-sized shuffle is the
  *     partial-agg combine) joined map-side against the broadcast model;
  *     argmax via a per-doc window.
  *   - determinism: every log term is rounded at 9dp and products are
  *     summed as DECIMAL(28,10), making scores independent of partition
  *     order and bit-identical across engines; argmax ties break on class
  *     name ascending.
  */
object NaiveBayes {

  /** add-one-smoothed model tables from labeled docs.
    * @return (priors: label|prior|floor, likelihoods: label|tok|ll)
    *         — `floor` is the unseen-token log-probability ln(1/(tot+V)). */
  def train(docs: DataFrame, textCol: String, labelCol: String): (DataFrame, DataFrame) = {
    val toks = explode(tokens(col(textCol))).as("tok")
    val tokTable = docs.select(col(labelCol).as("label"), toks)
    val classTok = tokTable.groupBy(col("label"), col("tok")).agg(count(lit(1)).as("cnt"))
    val classTotals = classTok.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
    val vocab = classTok.select(col("tok")).distinct()
      .agg(count(lit(1)).cast(DoubleType).as("v"))
    val nDocs = docs.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_docs"))
    val nTotal = docs.agg(count(lit(1)).cast(DoubleType).as("n"))
    val priors = nDocs.crossJoin(broadcast(nTotal))
      .join(classTotals, Seq("label")).crossJoin(broadcast(vocab))
      .select(col("label"),
        round(log(col("n_docs") / col("n")), 9).cast(DecimalType(28, 10)).as("prior"),
        round(log(lit(1.0) / (col("tot") + col("v"))), 9).as("floor"))
    val likelihoods = classTok.join(classTotals, Seq("label"))
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("tok"),
        round(log((col("cnt") + 1.0) / (col("tot") + col("v"))), 9).as("ll"))
    (priors, likelihoods)
  }

  /** per-row argmax prediction; returns (idCol, label columns…, pred_label,
    * score) with one row per input doc. */
  def predict(docs: DataFrame, textCol: String, idCol: String,
      priors: DataFrame, likelihoods: DataFrame,
      carryCols: Seq[String] = Nil): DataFrame = {
    val dc = docs
      .select(col(idCol) +: carryCols.map(col) :+ explode(tokens(col(textCol))).as("tok"): _*)
      .groupBy(col(idCol) +: carryCols.map(col) :+ col("tok"): _*)
      .agg(count(lit(1)).as("cnt"))
    val scored = dc
      .crossJoin(broadcast(priors))
      .join(broadcast(likelihoods), Seq("label", "tok"), "left")
      .groupBy(col(idCol) +: carryCols.map(col) :+ col("label") : _*)
      .agg(first(col("prior")).as("prior"),
        sum((col("cnt") * coalesce(col("ll"), col("floor")))
          .cast(DecimalType(28, 10))).as("s"))
      .withColumn("score", col("prior") + col("s"))
    // argmax kept as a window AFTER a measured r16 comparison: the
    // map-side-combinable min_by(struct, struct(-score, label)) variant
    // is plan-identical in values but runs through ObjectHashAggregate
    // (struct-typed buffers) — m13/m14/m29 measured 1.1-1.3× of this
    // shape. The window frame is (id, label, score) — |classes| narrow
    // rows per doc, no text payload — so its exchange is bounded by
    // |classes| × ids, not the corpus width.
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("label"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col(idCol) +: carryCols.map(col) :+
        col("label").as("pred_label") :+ col("score"): _*)
  }

  private def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("\\S+"), lit(0))

  private val priorSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("prior", DecimalType(28, 10)),
    org.apache.spark.sql.types.StructField("floor", DoubleType)))
  private val llSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tok", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ll", DoubleType)))

  /** Train and package as a catalog model (`CREATE MODEL … USING
    * engine='naive_bayes'`). The model tables are |vocab|×|classes| rows
    * BY DESIGN, so collecting them at train time is driver-safe at any
    * corpus size; they rebuild as broadcast frames at apply time. */
  def trained(name: String, train: org.apache.spark.sql.DataFrame,
      textCol: String, labelCol: String): NbModel = {
    val (p, l) = NaiveBayes.train(train, textCol, labelCol)
    NbModel(name, textCol, labelCol, p.collect().toSeq, l.collect().toSeq)
  }

  /** A trained NB classifier in the model catalog. Applies as a
    * whole-frame transform with the same row-id join-back discipline as
    * the numeric path: only (row_id, prediction) travels through the
    * token shuffle, the payload joins back narrow. The prediction column
    * is `pred_<target>` (the data side usually still carries the ground-
    * truth target column; an unprefixed name would collide). */
  final case class NbModel(
      name: String,
      textCol: String,
      labelCol: String,
      priorRows: Seq[org.apache.spark.sql.Row],
      llRows: Seq[org.apache.spark.sql.Row]) extends FrameModel {
    def featureCols: Seq[String] = Seq(textCol)
    def outputSchema: org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(s"pred_$labelCol",
          org.apache.spark.sql.types.StringType)))
    def transform(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val spark = df.sparkSession
      val priors = spark.createDataFrame(
        spark.sparkContext.parallelize(priorRows, 1), priorSchema)
      val lls = spark.createDataFrame(
        spark.sparkContext.parallelize(llRows, 1), llSchema)
      val rid = Predict.RowIdCol
      val withId = df.withColumn(rid, monotonically_increasing_id())
      val preds = NaiveBayes
        .predict(withId.select(col(rid), col(textCol)), textCol, rid, priors, lls)
        .select(col(rid), col("pred_label").as(s"pred_$labelCol"))
      // left join: rows whose text yields no tokens keep a NULL
      // prediction instead of vanishing (row-coverage parity with the
      // numeric apply path)
      withId.join(preds, Seq(rid), "left").drop(rid)
    }
  }
}

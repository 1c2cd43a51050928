package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

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
    * score) with one row per input doc.
    *
    * r17 (VERDICT item 4): scoring is MAP-ONLY. The model tables are
    * |vocab|×|classes| rows by design (driver-safe at any corpus size —
    * the same bound that let them broadcast before), so they collect
    * into one token→per-class-log-likelihood map, broadcast once, and
    * every document scores inside a single expression over its token
    * array: no (doc, token) explode shuffle, no per-(doc, class)
    * aggregation exchange, no per-doc argmax window — the r16 shape paid
    * three corpus-keyed Exchanges between the token explode and the
    * argmax. Arithmetic is replicated exactly: per DISTINCT token,
    * term = cast(cnt·coalesce(ll, floor) as DECIMAL(28,10)) (Spark's
    * double→decimal HALF_UP cast), terms summed exactly as decimals,
    * score = prior + Σ (DECIMAL(38,10) — the old sum/add result type),
    * argmax ties on label ascending. Docs with zero tokens drop, as the
    * explode dropped them (`rlike("\\S")` ⟺ at least one \S+ token). */
  def predict(docs: DataFrame, textCol: String, idCol: String,
      priors: DataFrame, likelihoods: DataFrame,
      carryCols: Seq[String] = Nil): DataFrame = {
    val pr = priors.collect()
    val labels = pr.map(_.getString(0)).sorted
    if (labels.isEmpty) {
      // empty model: the old crossJoin(priors) produced zero rows
      return docs.filter(lit(false))
        .select(col(idCol) +: carryCols.map(col) :+
          lit(null).cast(StringType).as("pred_label") :+
          lit(null).cast(DecimalType(38, 10)).as("score"): _*)
    }
    val idx = labels.zipWithIndex.toMap
    val priorArr = new Array[java.math.BigDecimal](labels.length)
    val floorArr = new Array[Double](labels.length)
    pr.foreach { r =>
      val i = idx(r.getString(0))
      priorArr(i) = r.getDecimal(1); floorArr(i) = r.getDouble(2)
    }
    val tokMap = new java.util.HashMap[String, Array[Double]]()
    likelihoods.collect().foreach { r =>
      val a = tokMap.computeIfAbsent(r.getString(1), _ => floorArr.clone())
      a(idx(r.getString(0))) = r.getDouble(2)
    }
    val bc = docs.sparkSession.sparkContext.broadcast(tokMap)
    val nb = GraftColumnBridge.column(NbScoreDoc(
      GraftColumnBridge.expression(tokens(col(textCol))), labels, priorArr, floorArr, bc))
    docs.filter(col(textCol).rlike("\\S"))
      .select(col(idCol) +: carryCols.map(col) :+ nb.as("__nb"): _*)
      .select(col(idCol) +: carryCols.map(col) :+
        col("__nb.pred_label").as("pred_label") :+ col("__nb.score").as("score"): _*)
  }

  private def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("\\S+"), lit(0))

  /** Whole-document NB scoring over the broadcast model: counts the
    * row's distinct tokens, accumulates the exact decimal score per
    * class, and returns struct(pred_label, score) — the (score desc,
    * label asc) winner. Value-identical to the join/aggregate/window
    * chain it replaces (see [[predict]]). Interpreted eval: the work is
    * string-hash-dominated, not expression-dispatch-dominated, and the
    * surrounding scan/filter stages keep their own codegen. */
  final case class NbScoreDoc(
      child: Expression,
      labels: Array[String],
      priors: Array[java.math.BigDecimal],
      floors: Array[Double],
      model: org.apache.spark.broadcast.Broadcast[java.util.HashMap[String, Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    override def nullable: Boolean = true
    override def dataType: DataType = StructType(Seq(
      StructField("pred_label", StringType, nullable = false),
      StructField("score", DecimalType(38, 10), nullable = false)))
    @transient private lazy val utf8Labels: Array[UTF8String] =
      labels.map(UTF8String.fromString)

    override def nullSafeEval(toksAny: Any): Any = {
      val arr = toksAny.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      val counts = new java.util.HashMap[String, java.lang.Long]()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          counts.merge(arr.getUTF8String(i).toString, 1L,
            (a: java.lang.Long, b: java.lang.Long) => a + b)
        i += 1
      }
      val nL = labels.length
      val sums = Array.fill(nL)(java.math.BigDecimal.ZERO)
      val m = model.value
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val lls = m.getOrDefault(e.getKey, floors)
        val cnt = e.getValue.toDouble
        var j = 0
        while (j < nL) {
          // exactly cast(cnt * coalesce(ll, floor) AS DECIMAL(28,10));
          // overflow → null term, which the old sum skipped
          val t = Decimal(cnt * lls(j))
          if (t.changePrecision(28, 10)) sums(j) = sums(j).add(t.toJavaBigDecimal)
          j += 1
        }
      }
      var best = 0
      var bestScore = priors(0).add(sums(0))
      var j = 1
      while (j < nL) {
        val s = priors(j).add(sums(j))
        if (s.compareTo(bestScore) > 0) { best = j; bestScore = s }
        j += 1
      }
      val out = Decimal(bestScore)
      out.changePrecision(38, 10)
      new GenericInternalRow(Array[Any](utf8Labels(best), out))
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector/text expressions (SURVEY §2.2 vector stores → Spark
  * mapping; reference distance ops at
  * mindsdb/integrations/libs/vectordatabase_handler.py:51-54).
  *
  * Implemented as Catalyst expressions rather than Scala UDFs: no
  * serialization boundary, primitive-array access, one tight loop per row.
  * Evaluation order inside the loop is the plain sequential fold, which
  * keeps results bit-identical to a single-threaded oracle computing the
  * same formula.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over double arrays — same sequential-fold contract. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    var dot = 0.0; var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { dot += x(i) * y(i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an array of string tokens: per-token xxhash64, ±1
  * vote per bit, sign → fingerprint bit. One pass, O(64) state — suitable
  * for a 100 TB scan (narrow transform, no shuffle).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  private def ex(c: Column) = GraftColumnBridge.expression(c)
  def cosineSim(a: Column, b: Column): Column = GraftColumnBridge.column(CosineSimilarity(ex(a), ex(b)))
  def dotProduct(a: Column, b: Column): Column = GraftColumnBridge.column(DotProduct(ex(a), ex(b)))
  def simhash64(c: Column): Column = GraftColumnBridge.column(SimHash64(ex(c)))

  /** SQL registration: cosine_sim / dot_product / simhash64 usable in spark.sql. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
  }
}

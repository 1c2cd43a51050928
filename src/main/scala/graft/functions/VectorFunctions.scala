package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector/text expressions (SURVEY §2.2 vector stores → Spark
  * mapping; reference distance ops at
  * mindsdb/integrations/libs/vectordatabase_handler.py:51-54).
  *
  * Implemented as Catalyst expressions with `doGenCode`: they stay
  * inside whole-stage codegen (no interpreted-eval break in the
  * similarity hot loops), pay no serialization boundary, and read
  * primitive arrays directly. Evaluation order inside each loop is the
  * plain sequential fold, which keeps results bit-identical to a
  * single-threaded oracle computing the same formula.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
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
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
        double[] $x = $a.toDoubleArray();
        double[] $y = $b.toDoubleArray();
        int $n = Math.min($x.length, $y.length);
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $x[$i] * $y[$i]; $nx += $x[$i] * $x[$i]; $ny += $y[$i] * $y[$i];
        }
        ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over double arrays — same sequential-fold contract. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    var dot = 0.0; var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { dot += x(i) * y(i); i += 1 }
    dot
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        double[] $x = $a.toDoubleArray();
        double[] $y = $b.toDoubleArray();
        int $n = Math.min($x.length, $y.length);
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) { $dot += $x[$i] * $y[$i]; }
        ${ev.value} = $dot;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance over double arrays — pgvector's `<->`
  * operator (reference vectordatabase_handler.py:51); same sequential
  * fold so the oracle's list_sum spelling matches bit-for-bit. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    var ss = 0.0; var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { val d = x(i) - y(i); ss += d * d; i += 1 }
    math.sqrt(ss)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val ss = ctx.freshName("ss"); val d = ctx.freshName("d")
      s"""
        double[] $x = $a.toDoubleArray();
        double[] $y = $b.toDoubleArray();
        int $n = Math.min($x.length, $y.length);
        double $ss = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $x[$i] - $y[$i]; $ss += $d * $d;
        }
        ${ev.value} = Math.sqrt($ss);
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cross-engine md5-derived token hashes: the first 4/8 digest bytes as
  * an unsigned 32-bit / raw 64-bit value — bit-identical to DuckDB's
  * `('0x' || substr(md5(s), 1, 8|16))::BIGINT|UBIGINT`, which is what
  * lets MinHash/SimHash pipelines be oracle-checked end-to-end (same
  * trick as the Kb stub embedder). xxhash64 stays the fast default for
  * production paths; md5 costs ~10× per token but keeps the whole
  * pipeline verifiable. */
object Md5TokenHash {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  def first32(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = digests.get(); d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) | ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
  }
  def digest(): java.security.MessageDigest = digests.get()
  def first64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = digests.get(); d.reset()
    val h = d.digest(s.getBytes)
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (h(i) & 0xFFL); i += 1 }
    out
  }
  /** digest bytes 8-15 — the second independent 64-bit hash hiding in
    * the same md5 (DuckDB: `('0x' || substr(md5(s), 17, 16))::UBIGINT`);
    * one digest yields a 128-bit fingerprint's worth of token hash. */
  def second64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = digests.get(); d.reset()
    val h = d.digest(s.getBytes)
    var out = 0L
    var i = 8
    while (i < 16) { out = (out << 8) | (h(i) & 0xFFL); i += 1 }
    out
  }
}

/** 64-bit SimHash over an array of string tokens: per-token hash, ±1
  * vote per bit, sign → fingerprint bit. One pass, O(64) state — suitable
  * for a 100 TB scan (narrow transform, no shuffle). Interpreted eval
  * only: the hash + vote loop is string-dominated, not a codegen
  * bottleneck. `md5Hash = true` swaps xxhash64 for the oracle-matchable
  * [[Md5TokenHash.first64]]. */
case class SimHash64(child: Expression, md5Hash: Boolean = false,
    md5Second: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h =
          if (md5Hash && md5Second) Md5TokenHash.second64(arr.getUTF8String(i))
          else if (md5Hash) Md5TokenHash.first64(arr.getUTF8String(i))
          else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
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

/** Random-hyperplane LSH signature: bit i of the result = sign of
  * dot(v, plane_i). ONE narrow pass per row — this replaces the
  * crossJoin(planes) + groupBy(full-vector reshuffle) shape that a
  * relational formulation forces (the round-1 s04 weakness): at 100 TB
  * the signature computation is now part of the scan stage.
  *
  * Planes ship flattened as a codegen reference object; the loop is
  * fully unrolled-friendly generated Java.
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  private val nPlanes = planes.length
  private val dim = if (planes.isEmpty) 0 else planes.head.length
  @transient private lazy val flat: Array[Double] = planes.flatten.toArray

  override def dataType: DataType = LongType
  override def nullSafeEval(vec: Any): Any = {
    val v = vec.asInstanceOf[ArrayData].toDoubleArray()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      val base = p * dim
      var i = 0
      val n = math.min(dim, v.length)
      while (i < n) { dot += v(i) * flat(base + i); i += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v"); val sig = ctx.freshName("sig")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val n = ctx.freshName("n")
      s"""
        double[] $v = $a.toDoubleArray();
        long $sig = 0L;
        int $n = Math.min($dim, $v.length);
        for (int $p = 0; $p < $nPlanes; $p++) {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) { $dot += $v[$i] * $planesRef[$p * $dim + $i]; }
          if ($dot > 0) $sig |= (1L << $p);
        }
        ${ev.value} = $sig;
      """
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over an array of shingle strings: per shingle,
  * h = xxhash64(shingle, seed 42) >>> 33 (31-bit), then for each of k
  * universal-hash permutations (a_i * h + b_i) mod p keep the minimum.
  * ONE narrow pass per document — replaces the explode + k-way min-agg
  * shuffle of the relational formulation: at 100 TB the signature rides
  * the scan stage and only (doc_id, sig) ever shuffles.
  *
  * Bit-identical to the SQL pipeline it replaced:
  * `min((shiftrightunsigned(xxhash64(sh), 33) * a + b) % p)` — same
  * xxhash seed, same 31-bit truncation, same modular arithmetic.
  * `md5Hash = true` swaps the shingle hash for the 32-bit
  * [[Md5TokenHash.first32]] (a·h+b still < 2^63: a < 2^31, h < 2^32),
  * making the signature DuckDB-reproducible.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], prime: Long,
    md5Hash: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private val k = a.length
  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val h =
          if (md5Hash) Md5TokenHash.first32(arr.getUTF8String(t))
          else XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L) >>> 33
        var i = 0
        while (i < k) {
          val v = (h * aArr(i) + bArr(i)) % prime
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Character n-grams of a string as an array — one tight loop per row,
  * replacing a `transform(sequence(...), substr)` pipeline that re-reads
  * the string once per position (t06's dominant cost). Char-based
  * (UTF-16) slicing: identical to codepoint-based `substr` for BMP text,
  * which is what the corpus and the DuckDB oracle use. */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val m = str.length - n + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(str.substring(i, i + n))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Polynomial rolling hash of every k-gram: h_i = Σ_j c_{i+j}·B^(k-1-j),
  * computed with the true O(n) recurrence h_{i+1} = (h_i − c_i·B^(k-1))·B
  * + c_{i+k} — one pass per row, versus O(n·k) substring re-reads for
  * the expression-composed formulation. Values are exact 64-bit (no
  * modulus) for small k·log2(B·charmax); char codes are UTF-16 units ≡
  * codepoints for BMP text, matching the oracle's ascii(). */
case class RollingHashGrams(child: Expression, k: Int, base: Long)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val m = s.length - k + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    else {
      var topPow = 1L
      var j = 1
      while (j < k) { topPow *= base; j += 1 }
      val out = new Array[Long](m)
      var h = 0L
      var i = 0
      while (i < k) { h = h * base + s.charAt(i); i += 1 }
      out(0) = h
      i = 1
      while (i < m) {
        h = (h - s.charAt(i - 1) * topPow) * base + s.charAt(i + k - 1)
        out(i) = h
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit md5-prefix hash of every k-token window of a token array —
  * the span key of exact-substring dedup (d06/d07/t19), equal by
  * construction to `conv(substring(md5(concat_ws(' ', window)),1,15),
  * 16,10)`: UTF-8 bytes of the space-joined window, md5, first 15 hex
  * digits as an unsigned value (first 8 digest bytes big-endian >>> 4).
  * One tight loop per row over a reused byte buffer, replacing a
  * transform(sequence)+slice+array_join+md5+conv+substring+cast
  * pipeline that allocates a UTF8String per window and round-trips the
  * digest through hex text and decimal-string parsing. */
case class Md5SpanHashes(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val d = Md5TokenHash.digest()
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      d.reset()
      var j = 0
      while (j < k) {
        if (j > 0) d.update(' '.toByte)
        d.update(toks(i + j))
        j += 1
      }
      val h = d.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xFFL); b += 1 }
      out(i) = v >>> 4
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Minimum over every length-`w` sliding window of a long array —
  * monotonic-deque O(n), replacing the `transform(sequence(…),
  * array_min(slice(…)))` formulation that allocates a w-element slice
  * per position (t07's dominant cost: O(n·w) + n array allocations per
  * row). When the input is shorter than `w` the array is returned
  * unchanged (the winnowing convention: a short doc's fingerprint is its
  * full hash set). Ties keep the deque's earliest entry — the minimum
  * VALUE is identical to the slice formulation either way. */
case class SlidingWindowMin(child: Expression, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(w > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    val n = arr.length
    if (n < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    val out = new Array[Long](n - w + 1)
    // deque of candidate indices, values strictly increasing front→back
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    while (i < n) {
      while (tail > head && arr(dq(tail - 1)) >= arr(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr(dq(head))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  private def ex(c: Column) = GraftColumnBridge.expression(c)
  def cosineSim(a: Column, b: Column): Column = GraftColumnBridge.column(CosineSimilarity(ex(a), ex(b)))
  def dotProduct(a: Column, b: Column): Column = GraftColumnBridge.column(DotProduct(ex(a), ex(b)))
  def simhash64(c: Column, md5Hash: Boolean = false,
      md5Second: Boolean = false): Column =
    GraftColumnBridge.column(SimHash64(ex(c), md5Hash, md5Second))
  def hyperplaneSig(c: Column, planes: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(HyperplaneSig(ex(c), planes))
  def minhashSig(c: Column, a: Seq[Long], b: Seq[Long], prime: Long,
      md5Hash: Boolean = false): Column =
    GraftColumnBridge.column(MinHashSig(ex(c), a, b, prime, md5Hash))
  def charNGrams(c: Column, n: Int): Column =
    GraftColumnBridge.column(CharNGrams(ex(c), n))
  def rollingHashGrams(c: Column, k: Int, base: Long): Column =
    GraftColumnBridge.column(RollingHashGrams(ex(c), k, base))
  def slidingWindowMin(c: Column, w: Int): Column =
    GraftColumnBridge.column(SlidingWindowMin(ex(c), w))
  def md5SpanHashes(c: Column, k: Int): Column =
    GraftColumnBridge.column(Md5SpanHashes(ex(c), k))

  def l2Distance(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2Distance(ex(a), ex(b)))

  /** SQL registration: cosine_sim / dot_product / vec_l2 / simhash64
    * usable in spark.sql (the targets of the pgvector operator sugar). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2", es => L2Distance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
  }
}

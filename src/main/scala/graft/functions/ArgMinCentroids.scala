package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen argmin/argmax over a BROADCAST codebook array — the r17
  * answer to the interpreted-HOF tax (VERDICT r16 item 1).
  *
  * Round 16 measured, at every per-vector centroid-assignment site, that
  * the zero-shuffle "inline argmin over a broadcast struct array" shape
  * (array_min over transform(codebook, …)) loses to a window+Exchange
  * shape locally because custom codegen expressions (CosineSimilarity,
  * the dist2 fold) fall back to INTERPRETED eval inside higher-order-
  * function lambdas, and Catalyst may re-evaluate the array expression.
  * These expressions run the whole codebook loop inside whole-stage
  * codegen: one generated Java loop per row, no per-entry struct
  * allocation, no lambda, no Exchange. That makes the zero-shuffle shape
  * also the locally-fastest one, retiring the window/groupBy compromises
  * in KMeans.assign / PqTrainer.assign / ivfCells / ivfAssign and d27's
  * duplicate expansion pass.
  *
  * Value contract (oracle bit-exactness): each expression reproduces the
  * exact arithmetic of the expression chain it replaces —
  *  - cosine: the [[CosineSimilarity]] sequential fold;
  *  - round(·, 4): Spark's RoundBase double path
  *    (BigDecimal.valueOf(x).setScale(4, HALF_UP), NaN/Inf passthrough);
  *  - dist2: the exact 64-bit integer fold of [[graft.ml.KMeans.dist2]];
  *  - normalized distance: sqrt(max(0, 2 − 2·cos)) as in d27.
  * Tie-breaks are lexicographic on (score, id) exactly as the struct
  * orderings they replace; NaN scores never win (the array_min-over-
  * struct semantics — NaN sorts last ascending). A −0.0 rounded cosine
  * normalizes to +0.0 before comparison, matching UnsafeRow float
  * normalization on the shapes these replace.
  */
object ArgMinCentroids {
  private def ex(c: Column) = GraftColumnBridge.expression(c)

  /** ids of the `n` nearest centroids by (round(cos(v,cv),4) desc, id
    * asc). codebook: array<struct<id:int|long, cv:array<double>>>. */
  def topCosineCells(vec: Column, codebook: Column, n: Int): Column =
    GraftColumnBridge.column(TopCosineCells(ex(vec), ex(codebook), n))

  /** struct(cell, d2): nearest centroid by exact integer squared L2
    * (KMeans.dist2) with (d2 asc, cell asc) tie-break.
    * codebook: array<struct<cell:int|long, cv:array<long>>>. */
  def argMinDist2(vec: Column, codebook: Column): Column =
    GraftColumnBridge.column(ArgMinDist2Cells(ex(vec), ex(codebook)))

  /** struct(cd, id): nearest centroid by normalized-space distance
    * sqrt(max(0, 2−2·cos)) with (cd asc, id asc) tie-break.
    * codebook: array<struct<id:long, cov:array<double>>>. */
  def nearestNDist(vec: Column, codebook: Column): Column =
    GraftColumnBridge.column(NearestNDist(ex(vec), ex(codebook)))

  /** struct(cell, d2): nearest centroid by round(Σ(x−y)², 4) over double
    * arrays (the pqIndex sequential fold), (d2 asc, cell asc) tie-break.
    * codebook: array<struct<cell:int|long, cv:array<double>>>. */
  def argMinRoundedDist2(vec: Column, codebook: Column): Column =
    GraftColumnBridge.column(ArgMinRoundedDist2Cells(ex(vec), ex(codebook)))

  /** d27's Elkan/Hamerly coarse-cell shortlist in ONE pass: co_ids of
    * every coarse cell whose best possible cosine can still reach the
    * guaranteed-achievable best (ub = min(qd+rad)) within the 1e-4
    * rounding granularity. coarse: array<struct<co_id:long,
    * cov:array<double>, rad:double>>. */
  def coarseShortlist(vec: Column, coarse: Column): Column =
    GraftColumnBridge.column(CoarseShortlistCells(ex(vec), ex(coarse)))
}

private[functions] trait CodebookExpression extends BinaryExpression {
  /** element struct type of the codebook array */
  protected lazy val entryType: StructType =
    right.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  /** id field (position 0) of a codebook entry */
  protected lazy val idType: DataType = entryType.fields(0).dataType
  protected def idIsLong: Boolean = idType == LongType
  /** read entry id as Long regardless of physical int/long */
  protected def entryId(e: InternalRow): Long =
    if (idIsLong) e.getLong(0) else e.getInt(0).toLong
}

/** Top-`n` centroid ids by (round(cosine, 4) desc, id asc) — the
  * ivfCells/ivfAssign/d05 assignment loop in whole-stage codegen. */
case class TopCosineCells(left: Expression, right: Expression, n: Int)
    extends CodebookExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(idType, containsNull = false)

  override def nullSafeEval(vecAny: Any, cbAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData].toDoubleArray()
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = cb.numElements()
    val keep = math.min(n, m)
    val bcc = new Array[Double](keep)
    val bid = new Array[Long](keep)
    var filled = 0
    var j = 0
    while (j < m) {
      val e = cb.getStruct(j, 2)
      val cv = e.getArray(1).toDoubleArray()
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val d = math.min(v.length, cv.length)
      while (i < d) {
        dot += v(i) * cv(i); nx += v(i) * v(i); ny += cv(i) * cv(i); i += 1
      }
      var cc = dot / (math.sqrt(nx) * math.sqrt(ny))
      if (!(java.lang.Double.isNaN(cc) || java.lang.Double.isInfinite(cc)))
        cc = java.math.BigDecimal.valueOf(cc)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      if (cc == 0.0) cc = 0.0 // normalize -0.0
      val id = entryId(e)
      // insertion into the (cc desc, id asc) top-n slots; NaN never wins
      var p = filled
      while (p > 0 && !java.lang.Double.isNaN(cc) &&
        (java.lang.Double.isNaN(bcc(p - 1)) || cc > bcc(p - 1) ||
          (cc == bcc(p - 1) && id < bid(p - 1)))) p -= 1
      if (p < keep) {
        val last = math.min(filled, keep - 1)
        var q = last
        while (q > p) { bcc(q) = bcc(q - 1); bid(q) = bid(q - 1); q -= 1 }
        bcc(p) = cc; bid(p) = id
        if (filled < keep) filled += 1
      }
      j += 1
    }
    if (idIsLong) new GenericArrayData(java.util.Arrays.copyOf(bid, filled))
    else {
      val out = new Array[Int](filled)
      var i = 0
      while (i < filled) { out(i) = bid(i).toInt; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecT, cbT) => {
      val v = ctx.freshName("v"); val m = ctx.freshName("m")
      val keep = ctx.freshName("keep"); val bcc = ctx.freshName("bcc")
      val bid = ctx.freshName("bid"); val filled = ctx.freshName("filled")
      val j = ctx.freshName("j"); val e = ctx.freshName("e")
      val cv = ctx.freshName("cv"); val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val cc = ctx.freshName("cc"); val id = ctx.freshName("id")
      val p = ctx.freshName("p"); val q = ctx.freshName("q")
      val last = ctx.freshName("last"); val out = ctx.freshName("out")
      val idRead = if (idIsLong) s"$e.getLong(0)" else s"(long) $e.getInt(0)"
      val outBuild =
        if (idIsLong)
          s"""long[] $out = new long[$filled];
              for (int $q = 0; $q < $filled; $q++) { $out[$q] = $bid[$q]; }"""
        else
          s"""int[] $out = new int[$filled];
              for (int $q = 0; $q < $filled; $q++) { $out[$q] = (int) $bid[$q]; }"""
      s"""
        double[] $v = $vecT.toDoubleArray();
        int $m = $cbT.numElements();
        int $keep = java.lang.Math.min($n, $m);
        double[] $bcc = new double[$keep];
        long[] $bid = new long[$keep];
        int $filled = 0;
        for (int $j = 0; $j < $m; $j++) {
          org.apache.spark.sql.catalyst.InternalRow $e = $cbT.getStruct($j, 2);
          double[] $cv = $e.getArray(1).toDoubleArray();
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          int $d = java.lang.Math.min($v.length, $cv.length);
          for (int $i = 0; $i < $d; $i++) {
            $dot += $v[$i] * $cv[$i]; $nx += $v[$i] * $v[$i]; $ny += $cv[$i] * $cv[$i];
          }
          double $cc = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
          if (!(java.lang.Double.isNaN($cc) || java.lang.Double.isInfinite($cc))) {
            $cc = java.math.BigDecimal.valueOf($cc)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
          }
          if ($cc == 0.0) $cc = 0.0;
          long $id = $idRead;
          int $p = $filled;
          while ($p > 0 && !java.lang.Double.isNaN($cc) &&
              (java.lang.Double.isNaN($bcc[$p - 1]) || $cc > $bcc[$p - 1] ||
               ($cc == $bcc[$p - 1] && $id < $bid[$p - 1]))) { $p--; }
          if ($p < $keep) {
            int $last = java.lang.Math.min($filled, $keep - 1);
            for (int $q = $last; $q > $p; $q--) {
              $bcc[$q] = $bcc[$q - 1]; $bid[$q] = $bid[$q - 1];
            }
            $bcc[$p] = $cc; $bid[$p] = $id;
            if ($filled < $keep) $filled++;
          }
        }
        $outBuild
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Nearest centroid by the exact integer squared-L2 fold
  * ([[graft.ml.KMeans.dist2]] semantics over the shared min-length),
  * tie-break (d2 asc, cell asc) — returns struct(cell, d2). */
case class ArgMinDist2Cells(left: Expression, right: Expression)
    extends CodebookExpression {
  // null on an empty codebook, even with non-nullable inputs
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("cell", idType, nullable = false),
    StructField("d2", LongType, nullable = false)))

  override def nullSafeEval(vecAny: Any, cbAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData].toLongArray()
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = cb.numElements()
    if (m == 0) return null
    var bestD2 = Long.MaxValue; var bestId = Long.MaxValue; var found = false
    var j = 0
    while (j < m) {
      val e = cb.getStruct(j, 2)
      val cv = e.getArray(1).toLongArray()
      var d2 = 0L
      var i = 0
      val d = math.min(v.length, cv.length)
      while (i < d) { val x = v(i) - cv(i); d2 += x * x; i += 1 }
      val id = entryId(e)
      if (!found || d2 < bestD2 || (d2 == bestD2 && id < bestId)) {
        bestD2 = d2; bestId = id; found = true
      }
      j += 1
    }
    val idVal: Any = if (idIsLong) bestId else bestId.toInt
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](idVal, bestD2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecT, cbT) => {
      val v = ctx.freshName("v"); val m = ctx.freshName("m")
      val j = ctx.freshName("j"); val e = ctx.freshName("e")
      val cv = ctx.freshName("cv"); val d2 = ctx.freshName("d2")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val id = ctx.freshName("id")
      val bestD2 = ctx.freshName("bestD2"); val bestId = ctx.freshName("bestId")
      val found = ctx.freshName("found")
      val idRead = if (idIsLong) s"$e.getLong(0)" else s"(long) $e.getInt(0)"
      val idBox =
        if (idIsLong) s"java.lang.Long.valueOf($bestId)"
        else s"java.lang.Integer.valueOf((int) $bestId)"
      s"""
        long[] $v = $vecT.toLongArray();
        int $m = $cbT.numElements();
        long $bestD2 = Long.MAX_VALUE; long $bestId = Long.MAX_VALUE;
        boolean $found = false;
        for (int $j = 0; $j < $m; $j++) {
          org.apache.spark.sql.catalyst.InternalRow $e = $cbT.getStruct($j, 2);
          long[] $cv = $e.getArray(1).toLongArray();
          long $d2 = 0L;
          int $d = java.lang.Math.min($v.length, $cv.length);
          for (int $i = 0; $i < $d; $i++) {
            long $x = $v[$i] - $cv[$i]; $d2 += $x * $x;
          }
          long $id = $idRead;
          if (!$found || $d2 < $bestD2 || ($d2 == $bestD2 && $id < $bestId)) {
            $bestD2 = $d2; $bestId = $id; $found = true;
          }
        }
        if (!$found) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[]{ $idBox, java.lang.Long.valueOf($bestD2) });
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Nearest centroid by the ROUNDED double squared-L2 fold — the pqIndex
  * encoding distance: d2 = round(Σ(x−y)², 4) with Spark's RoundBase
  * double semantics, sequential fold order, tie-break (d2 asc, cell
  * asc), NaN never wins — returns struct(cell, d2). */
case class ArgMinRoundedDist2Cells(left: Expression, right: Expression)
    extends CodebookExpression {
  // null on an empty codebook, even with non-nullable inputs
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("cell", idType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))

  override def nullSafeEval(vecAny: Any, cbAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData].toDoubleArray()
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = cb.numElements()
    if (m == 0) return null
    var bestD2 = Double.NaN; var bestId = Long.MaxValue; var found = false
    var j = 0
    while (j < m) {
      val e = cb.getStruct(j, 2)
      val cv = e.getArray(1).toDoubleArray()
      var ss = 0.0
      var i = 0
      val d = math.min(v.length, cv.length)
      while (i < d) { val x = v(i) - cv(i); ss += x * x; i += 1 }
      if (!(java.lang.Double.isNaN(ss) || java.lang.Double.isInfinite(ss)))
        ss = java.math.BigDecimal.valueOf(ss)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      if (ss == 0.0) ss = 0.0
      val id = entryId(e)
      val better = !found ||
        (!java.lang.Double.isNaN(ss) && (java.lang.Double.isNaN(bestD2) ||
          ss < bestD2 || (ss == bestD2 && id < bestId)))
      if (better) { bestD2 = ss; bestId = id; found = true }
      j += 1
    }
    val idVal: Any = if (idIsLong) bestId else bestId.toInt
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](idVal, bestD2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecT, cbT) => {
      val v = ctx.freshName("v"); val m = ctx.freshName("m")
      val j = ctx.freshName("j"); val e = ctx.freshName("e")
      val cv = ctx.freshName("cv"); val ss = ctx.freshName("ss")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val id = ctx.freshName("id")
      val bestD2 = ctx.freshName("bestD2"); val bestId = ctx.freshName("bestId")
      val found = ctx.freshName("found"); val better = ctx.freshName("better")
      val idRead = if (idIsLong) s"$e.getLong(0)" else s"(long) $e.getInt(0)"
      val idBox =
        if (idIsLong) s"java.lang.Long.valueOf($bestId)"
        else s"java.lang.Integer.valueOf((int) $bestId)"
      s"""
        double[] $v = $vecT.toDoubleArray();
        int $m = $cbT.numElements();
        double $bestD2 = Double.NaN; long $bestId = Long.MAX_VALUE;
        boolean $found = false;
        for (int $j = 0; $j < $m; $j++) {
          org.apache.spark.sql.catalyst.InternalRow $e = $cbT.getStruct($j, 2);
          double[] $cv = $e.getArray(1).toDoubleArray();
          double $ss = 0.0;
          int $d = java.lang.Math.min($v.length, $cv.length);
          for (int $i = 0; $i < $d; $i++) {
            double $x = $v[$i] - $cv[$i]; $ss += $x * $x;
          }
          if (!(java.lang.Double.isNaN($ss) || java.lang.Double.isInfinite($ss))) {
            $ss = java.math.BigDecimal.valueOf($ss)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
          }
          if ($ss == 0.0) $ss = 0.0;
          long $id = $idRead;
          boolean $better = !$found ||
            (!java.lang.Double.isNaN($ss) && (java.lang.Double.isNaN($bestD2) ||
              $ss < $bestD2 || ($ss == $bestD2 && $id < $bestId)));
          if ($better) { $bestD2 = $ss; $bestId = $id; $found = true; }
        }
        if (!$found) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[]{ $idBox, java.lang.Double.valueOf($bestD2) });
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Nearest centroid by normalized-space distance sqrt(max(0, 2−2·cos)),
  * tie-break (cd asc, id asc), NaN never wins — returns struct(cd, id).
  * The d27 level-1 registration loop in whole-stage codegen. */
case class NearestNDist(left: Expression, right: Expression)
    extends CodebookExpression {
  // null on an empty codebook, even with non-nullable inputs
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("cd", DoubleType, nullable = false),
    StructField("id", idType, nullable = false)))

  override def nullSafeEval(vecAny: Any, cbAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData].toDoubleArray()
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = cb.numElements()
    if (m == 0) return null
    var bestCd = Double.NaN; var bestId = Long.MaxValue; var found = false
    var j = 0
    while (j < m) {
      val e = cb.getStruct(j, 2)
      val cv = e.getArray(1).toDoubleArray()
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val d = math.min(v.length, cv.length)
      while (i < d) {
        dot += v(i) * cv(i); nx += v(i) * v(i); ny += cv(i) * cv(i); i += 1
      }
      val cd = math.sqrt(math.max(0.0, 2.0 - 2.0 * (dot / (math.sqrt(nx) * math.sqrt(ny)))))
      val id = entryId(e)
      val better = !found ||
        (!java.lang.Double.isNaN(cd) && (java.lang.Double.isNaN(bestCd) ||
          cd < bestCd || (cd == bestCd && id < bestId)))
      if (better) { bestCd = cd; bestId = id; found = true }
      j += 1
    }
    val idVal: Any = if (idIsLong) bestId else bestId.toInt
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCd, idVal))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecT, cbT) => {
      val v = ctx.freshName("v"); val m = ctx.freshName("m")
      val j = ctx.freshName("j"); val e = ctx.freshName("e")
      val cv = ctx.freshName("cv"); val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val cd = ctx.freshName("cd"); val id = ctx.freshName("id")
      val bestCd = ctx.freshName("bestCd"); val bestId = ctx.freshName("bestId")
      val found = ctx.freshName("found"); val better = ctx.freshName("better")
      val idRead = if (idIsLong) s"$e.getLong(0)" else s"(long) $e.getInt(0)"
      val idBox =
        if (idIsLong) s"java.lang.Long.valueOf($bestId)"
        else s"java.lang.Integer.valueOf((int) $bestId)"
      s"""
        double[] $v = $vecT.toDoubleArray();
        int $m = $cbT.numElements();
        double $bestCd = Double.NaN; long $bestId = Long.MAX_VALUE;
        boolean $found = false;
        for (int $j = 0; $j < $m; $j++) {
          org.apache.spark.sql.catalyst.InternalRow $e = $cbT.getStruct($j, 2);
          double[] $cv = $e.getArray(1).toDoubleArray();
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          int $d = java.lang.Math.min($v.length, $cv.length);
          for (int $i = 0; $i < $d; $i++) {
            $dot += $v[$i] * $cv[$i]; $nx += $v[$i] * $v[$i]; $ny += $cv[$i] * $cv[$i];
          }
          double $cd = java.lang.Math.sqrt(java.lang.Math.max(0.0,
            2.0 - 2.0 * ($dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny)))));
          long $id = $idRead;
          boolean $better = !$found ||
            (!java.lang.Double.isNaN($cd) && (java.lang.Double.isNaN($bestCd) ||
              $cd < $bestCd || ($cd == $bestCd && $id < $bestId)));
          if ($better) { $bestCd = $cd; $bestId = $id; $found = true; }
        }
        if (!$found) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[]{ java.lang.Double.valueOf($bestCd), $idBox });
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** d27's coarse-cell shortlist in one codegen pass per row: compute
  * every qd_j = sqrt(max(0, 2−2·cos(v, cov_j))), reduce
  * ub = min_j(qd_j + rad_j), and emit the co_ids of cells passing
  *   1 − max(0, qd_j − rad_j)² / 2  >=  1 − ub²/2 − 2e-4
  * — exactly the expressions of the r16 two-pass shape (whose ub was a
  * HashAggregate over a narrow expansion plus an n·d rejoin), so the
  * shortlist set is bit-identical, with ZERO shuffle and ONE expansion.
  * coarse: array<struct<co_id:long, cov:array<double>, rad:double>>. */
case class CoarseShortlistCells(left: Expression, right: Expression)
    extends CodebookExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(vecAny: Any, cbAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData].toDoubleArray()
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = cb.numElements()
    val qd = new Array[Double](m)
    var ub = Double.PositiveInfinity
    var j = 0
    while (j < m) {
      val e = cb.getStruct(j, 3)
      val cv = e.getArray(1).toDoubleArray()
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val d = math.min(v.length, cv.length)
      while (i < d) {
        dot += v(i) * cv(i); nx += v(i) * v(i); ny += cv(i) * cv(i); i += 1
      }
      qd(j) = math.sqrt(math.max(0.0, 2.0 - 2.0 * (dot / (math.sqrt(nx) * math.sqrt(ny)))))
      val qdr = qd(j) + e.getDouble(2)
      // min() aggregate semantics: NaN never below a non-NaN minimum
      if (qdr < ub) ub = qdr
      j += 1
    }
    val rhs = 1.0 - ub * ub / 2.0 - 2.0e-4
    val out = new Array[Long](m)
    var k = 0
    j = 0
    while (j < m) {
      val e = cb.getStruct(j, 3)
      val lhs = 1.0 - math.pow(math.max(0.0, qd(j) - e.getDouble(2)), 2.0) / 2.0
      if (lhs >= rhs) { out(k) = e.getLong(0); k += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecT, cbT) => {
      val v = ctx.freshName("v"); val m = ctx.freshName("m")
      val j = ctx.freshName("j"); val e = ctx.freshName("e")
      val cv = ctx.freshName("cv"); val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val qd = ctx.freshName("qd"); val ub = ctx.freshName("ub")
      val qdr = ctx.freshName("qdr"); val rhs = ctx.freshName("rhs")
      val lhs = ctx.freshName("lhs"); val out = ctx.freshName("out")
      val k = ctx.freshName("k"); val trimmed = ctx.freshName("trimmed")
      s"""
        double[] $v = $vecT.toDoubleArray();
        int $m = $cbT.numElements();
        double[] $qd = new double[$m];
        double $ub = Double.POSITIVE_INFINITY;
        for (int $j = 0; $j < $m; $j++) {
          org.apache.spark.sql.catalyst.InternalRow $e = $cbT.getStruct($j, 3);
          double[] $cv = $e.getArray(1).toDoubleArray();
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          int $d = java.lang.Math.min($v.length, $cv.length);
          for (int $i = 0; $i < $d; $i++) {
            $dot += $v[$i] * $cv[$i]; $nx += $v[$i] * $v[$i]; $ny += $cv[$i] * $cv[$i];
          }
          $qd[$j] = java.lang.Math.sqrt(java.lang.Math.max(0.0,
            2.0 - 2.0 * ($dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny)))));
          double $qdr = $qd[$j] + $e.getDouble(2);
          if ($qdr < $ub) { $ub = $qdr; }
        }
        double $rhs = 1.0 - $ub * $ub / 2.0 - 2.0e-4;
        long[] $out = new long[$m];
        int $k = 0;
        for (int $j = 0; $j < $m; $j++) {
          org.apache.spark.sql.catalyst.InternalRow $e = $cbT.getStruct($j, 3);
          double $lhs = 1.0 - java.lang.Math.pow(
            java.lang.Math.max(0.0, $qd[$j] - $e.getDouble(2)), 2.0) / 2.0;
          if ($lhs >= $rhs) { $out[$k] = $e.getLong(0); $k++; }
        }
        long[] $trimmed = java.util.Arrays.copyOf($out, $k);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($trimmed);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count as a mergeable per-group AGGREGATE.
  *
  * d08 proved the register math (m=1024, md5-60-bit hash, Flajolet
  * alpha + linear-counting small-range correction) DuckDB-reproducible,
  * but spelled it as a two-level groupBy — fine for a corpus-wide count,
  * wrong shape for "distinct users per segment" over many groups, where
  * the bucket-level intermediate is |groups|×1024 rows through a
  * shuffle. This aggregate carries ONE 1 KiB register array per group
  * per partial buffer, map-side combines like `max`, and merges by
  * elementwise register max — the mergeable-sketch pattern (cf. Spark's
  * own HyperLogLogPlusPlus, approx_count_distinct) with the d08 hash so
  * the DuckDB oracle reproduces every register and the final estimate.
  *
  * Hash parity with d08/DuckDB: h60 = first-15-hex-chars of md5(CAST(v
  * AS STRING)) = top 60 bits of the digest's first 8 bytes; bucket =
  * h60 >> 50 (m=1024); rank = 51 - bitlength(h60 & (2^50-1)), 51 when
  * the tail is zero. Estimate = alpha_m · m² · 2^51 / Σ 2^(51-rank)
  * with empty registers contributing 2^51, linear counting below the
  * 2.5m threshold — float ops in the exact left-to-right order of the
  * d08 oracle so both engines run the same IEEE sequence.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val M = 1024

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val d = md5.get(); d.reset()
      val dig = d.digest(bytes)
      // big-endian first 8 bytes >>> 4 == first 15 hex nibbles (60 bits)
      var h64 = 0L
      var i = 0
      while (i < 8) { h64 = (h64 << 8) | (dig(i) & 0xffL); i += 1 }
      val h60 = h64 >>> 4
      val bucket = (h60 >>> 50).toInt
      val w = h60 & ((1L << 50) - 1)
      val rank = if (w == 0L) 51 else 51 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var nz = 0
    var sumInt = 0L
    var i = 0
    while (i < M) {
      if (buf(i) > 0) { nz += 1; sumInt += 1L << (51 - buf(i)) }
      i += 1
    }
    val denom = sumInt + (M.toLong - nz) * (1L << 51)
    val raw = 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 *
      2251799813685248.0 / denom.toDouble
    if (raw <= 2560.0 && nz < M) 1024.0 * math.log(1024.0 / (M - nz))
    else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_estimate"
}

/** [[HllSketch]] that evals to its raw 1 KiB register array instead of
  * the estimate — the STORABLE form. A pipeline materializes per-window
  * sketches (a daily `GROUP BY day` table), and later rollups union the
  * stored registers with [[HllUnion]] instead of rescanning history:
  * the incremental-analytics shape at 100 TB, where "distinct users this
  * quarter" reads 90 KiB-scale sketch rows, not 90 days of raw events. */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val inner = HllSketch(child)

  override def createAggregationBuffer(): Array[Byte] =
    inner.createAggregationBuffer()
  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] =
    inner.update(buf, row)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    inner.merge(a, b)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_registers"
}

/** Union of STORED [[HllRegisters]] sketches: input rows are binary
  * register arrays; merging is elementwise max (set union of the
  * underlying hash draws, so re-unioned overlaps never double-count);
  * eval is the same estimate arithmetic as [[HllSketch]] — unioning
  * stored daily sketches is bit-identical to sketching the raw union. */
case class HllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val M = 1024
  private val estimator = HllSketch(child)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == M, s"hll_union_estimate: expected $M registers, got ${regs.length}")
      var i = 0
      while (i < M) { if (regs(i) > buf(i)) buf(i) = regs(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = estimator.eval(buf)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): HllUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllUnion =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_union_estimate"
}

/** [[HllUnion]] that evals back to the merged REGISTERS instead of the
  * estimate — the incremental-maintenance form: a sketch table folds new
  * per-window sketches into stored ones (merge = elementwise max) without
  * ever leaving register space, so maintenance never loses precision. */
case class HllUnionRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val inner = HllUnion(child)

  override def createAggregationBuffer(): Array[Byte] =
    inner.createAggregationBuffer()
  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] =
    inner.update(buf, row)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    inner.merge(a, b)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): HllUnionRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnionRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllUnionRegisters =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_union_registers"
}

object Hll {
  /** Column API: HLL distinct estimate of `c` (hashed as its string
    * form, matching the d08 oracle convention). */
  def hllEstimate(c: Column): Column =
    GraftColumnBridge.column(
      HllSketch(Cast(GraftColumnBridge.expression(c), StringType))
        .toAggregateExpression())

  /** Column API: the storable 1 KiB register array for `c`. */
  def hllRegisters(c: Column): Column =
    GraftColumnBridge.column(
      HllRegisters(Cast(GraftColumnBridge.expression(c), StringType))
        .toAggregateExpression())

  /** Column API: estimate from unioned stored register arrays. */
  def hllUnionEstimate(sketch: Column): Column =
    GraftColumnBridge.column(
      HllUnion(GraftColumnBridge.expression(sketch))
        .toAggregateExpression())

  /** Column API: merged registers from stored register arrays (the
    * incremental sketch-table maintenance aggregate). */
  def hllUnionRegisters(sketch: Column): Column =
    GraftColumnBridge.column(
      HllUnionRegisters(GraftColumnBridge.expression(sketch))
        .toAggregateExpression())
}

package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable relative-error quantile sketch over POSITIVE integer values
  * (DDSketch family: Masson/Rim/Lee, "DDSketch: a fast and fully-
  * mergeable quantile sketch with relative-error guarantees", VLDB 2019)
  * with the bucket function chosen for cross-engine exactness: instead
  * of ⌈log_γ v⌉ (float log, boundary-rounding hazards), a value buckets
  * by its most-significant-bit position plus the next three bits —
  *
  *   msb = 63 − numberOfLeadingZeros(v)
  *   sub = (v >> max(0, msb−3)) & 7
  *   idx = msb·8 + sub
  *
  * i.e. base-2 exponent with 8 sub-buckets per octave, γ = 2^(1/8) ≈
  * 1.09: any quantile is answered within ~9% relative error from at
  * most 512 buckets, all in INTEGER ops any engine reproduces bit-
  * exactly (the DuckDB oracle rebuilds idx with printf('%b') + shifts).
  * The bucket's exact lower bound inverts as
  *
  *   lower(idx) = idx < 24 ? value itself : (8 + sub) << (msb − 3)
  *
  * (below msb 3 every positive value owns its own bucket, so the sketch
  * is EXACT for v < 8).
  *
  * Why a TypedImperativeAggregate: the buffer is a bounded 512-slot
  * count array per GROUP, so map-side partial aggregation collapses
  * each partition to ≤ 512 longs before the exchange and merge is
  * element-wise addition — the same shuffle shape as the weighted
  * histogram (WeightedHistogramAgg), but over an unbounded value domain
  * with relative rather than absolute resolution. The exact-quantile
  * alternatives (a18/a24) sort or window the full data; at 100 TB the
  * sketch is the only single-pass option.
  *
  * Nulls and non-positive values are skipped (count them separately if
  * they matter — same contract as DDSketch's positive store).
  */
case class LogQuantileSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](512)

  @inline private def bucket(v: Long): Int = {
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val sub = ((v >>> math.max(0, msb - 3)) & 7L).toInt
    msb * 8 + sub
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x > 0L) buf(bucket(x)) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 512) { b1(i) += b2(i); i += 1 }
    b1
  }

  /** map<int, bigint> of occupied buckets only. */
  override def eval(buf: Array[Long]): Any = {
    var n = 0
    var i = 0
    while (i < 512) { if (buf(i) != 0L) n += 1; i += 1 }
    val ks = new Array[Int](n)
    val vs = new Array[Long](n)
    var j = 0
    i = 0
    while (i < 512) {
      if (buf(i) != 0L) { ks(j) = i; vs(j) = buf(i); j += 1 }
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    // sparse pairs: partial buffers usually occupy a handful of buckets
    var n = 0
    var i = 0
    while (i < 512) { if (buf(i) != 0L) n += 1; i += 1 }
    val bb = ByteBuffer.allocate(4 + n * 10)
    bb.putInt(n)
    i = 0
    while (i < 512) {
      if (buf(i) != 0L) { bb.putShort(i.toShort); bb.putLong(buf(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](512)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf(bb.getShort.toInt) += bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): LogQuantileSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LogQuantileSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): LogQuantileSketch =
    copy(child = newChild)

  override def prettyName: String = "qsketch_buckets"
}

object LogQuantileSketch {
  /** Exact lower bound of bucket idx — the sketch's quantile answer.
    * Below msb 3 the shift is zero, so sub IS the value's low 3 bits and
    * every v < 8 owns its own bucket: lower(idx) = idx % 8 exactly. */
  def lowerBound(idx: Int): Long = {
    val msb = idx / 8
    val sub = idx % 8
    if (msb < 3) (idx % 8).toLong else (8L + sub) << (msb - 3)
  }
}

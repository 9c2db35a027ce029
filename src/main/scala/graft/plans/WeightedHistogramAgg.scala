package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass weighted histogram aggregate (SURVEY.md §2.7: "the one
  * high-value custom UDAF").
  *
  * The groupBy(width_bucket) baseline (graft.agg.Histogrammer) shuffles
  * one row per (group, bin); this aggregate carries the whole (n+2)-bin
  * (value, sumw2) vector in its buffer, so the shuffle carries one row
  * per GROUP regardless of bin count — at 100 TB with dozens of
  * systematic variations that is the difference between a bins×groups
  * exchange and a groups-only exchange. Mirrors the reference's 5-axis
  * `hist.Hist` Double storage (stage2/histogrammer.py:29-53).
  *
  * Buffer layout: [value(0..n+1) ++ sumw2(0..n+1)]; bins 0 / n+1 are
  * under/overflow, matching Histogrammer.bucket.
  */
case class WeightedHistogramAgg(
    left: Expression, // value
    right: Expression, // weight
    lo: Double,
    hi: Double,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with BinaryLike[Expression]
  with ImplicitCastInputTypes {

  // decimal/int inputs are coerced to double by the analyzer
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  private val width = nBins + 2

  override def createAggregationBuffer(): Array[Double] = new Array[Double](2 * width)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val vAny = left.eval(input)
    val wAny = right.eval(input)
    if (vAny != null && wAny != null) {
      val v = vAny.asInstanceOf[Number].doubleValue()
      val w = wAny.asInstanceOf[Number].doubleValue()
      val bin =
        if (v < lo) 0
        else if (v >= hi) nBins + 1
        else math.floor((v - lo) * nBins / (hi - lo)).toInt + 1
      buf(bin) += w
      buf(width + bin) += w * w
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(Array.tabulate[Any](width) { i =>
      new GenericInternalRow(Array[Any](i.toLong, buf(i), buf(width + i)))
    })

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(2 * width)(bb.getDouble)
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bin", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("sumw2", DoubleType, nullable = false))))

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): WeightedHistogramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): WeightedHistogramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedHistogramAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "weighted_histogram"
}

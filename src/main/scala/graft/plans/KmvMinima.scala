package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch: keeps the k smallest DISTINCT
  * hash values seen (Bar-Yossef et al. 2002, "Counting distinct elements
  * in a data stream"). The estimator `(k-1) * M / h_k` (hashes uniform on
  * [0, M)) lives in the query layer, where it stays oracle-checkable;
  * this aggregate delivers the minima array itself.
  *
  * Why a TypedImperativeAggregate and not a window/top-k query: the
  * buffer is bounded at k longs per GROUP regardless of input size, and
  * merge is a set-union-then-trim — so map-side partial aggregation
  * reduces each partition to ≤ k values before the exchange. At 100 TB
  * the shuffle carries groups × k longs, where the window form
  * (row_number over hash) shuffles every input row. Distinctness is part
  * of the sketch contract: duplicate hashes must collapse or the
  * estimator is biased, hence a sorted set, not a heap of all values.
  *
  * Reference behavior mirrored: the per-dataset cardinality summaries of
  * copperhead's pre-scan stage (stage1/preprocessor.py sample tables) —
  * re-expressed as a mergeable sketch instead of an exact count so the
  * same query scales past exact-count memory.
  */
case class KmvMinima(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0, s"kmv_minima: k must be positive, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values already >= the current kth minimum: no growth, no churn
    if (buf.size() < k || v < buf.last()) {
      buf.add(v)
      if (buf.size() > k) buf.remove(buf.last())
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size())
    var i = 0
    val it = buf.iterator() // ascending — minima already sorted
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * 8)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): KmvMinima =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMinima =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinima =
    copy(child = newChild)

  override def prettyName: String = "kmv_minima"
}

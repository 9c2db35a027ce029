package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: keeps the k largest (sort, payload)
  * pairs per group under the total order (sort DESC, payload ASC) and
  * returns them as an array of structs in rank order.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY v DESC) <= k` — the reference's leading-objects extraction
  * shape (`stage1/processor.py:289-299`, two highest-pt muons per event;
  * `:656-667`, two leading jets) — shuffles and SORTS every input row to
  * keep k of them. This aggregate's state is bounded at k pairs per
  * group, update is an O(log k) bounded-set insert that rejects
  * non-qualifying rows with ONE comparison against the current kth, and
  * merge is union-and-trim — so map-side partial aggregation reduces
  * every partition to ≤ k pairs per group before the exchange, and no
  * sort of the full input ever happens. At 100 TB the shuffle carries
  * groups × k pairs instead of every row: the same state-bounding
  * argument as KmvMinima, applied to ranking instead of distinctness.
  *
  * The (sort DESC, payload ASC) order is total, so results are
  * deterministic whatever the partitioning — callers pass a unique
  * payload (row id) as the tie-break, the same contract as the repo's
  * window queries. Long sort keys keep the comparison exact; callers
  * quantize float measures (the repo's milli/centi discipline).
  */
case class TopKPairs(
    sortExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0, s"topk_max: k must be positive, got $k")

  override def left: Expression = sortExpr
  override def right: Expression = payloadExpr

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  // rank order: highest sort first, then smallest payload — buffer
  // iterates in rank order and `last` is the weakest element
  private object RankOrdering extends Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](RankOrdering)

  private def add(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size() < k) { buf.add(p); () }
    else if (RankOrdering.compare(p, buf.last()) < 0) {
      buf.add(p)
      if (buf.size() > k) buf.remove(buf.last())
    }
  }

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val s = sortExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null)
      add(buf, (s.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(
      b1: java.util.TreeSet[(Long, Long)],
      b2: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val rows = new Array[Any](buf.size())
    var i = 0
    val it = buf.iterator() // already rank-ordered
    while (it.hasNext) {
      val (s, p) = it.next()
      rows(i) = InternalRow(s, p)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * 16)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val (s, p) = it.next(); bb.putLong(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sort", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(sortExpr = newLeft, payloadExpr = newRight)

  override def prettyName: String = "topk_max"
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register vector (Flajolet et al. 2007): m = 2^p byte
  * registers, register j = max over inputs hashing to bucket j of
  * (1 + position of the first set bit in the remaining hash bits).
  * The ESTIMATOR stays in the query layer (one array fold — where the
  * DuckDB oracle can mirror it term-for-term); this aggregate delivers
  * the registers themselves, byte-comparable across engines.
  *
  * Contract with the oracle: inputs are the repo's 31-bit mixed hashes
  * (non-negative, < 2^31). Bucket j = hash % m (NOT the high bits —
  * `%` is the one spelling both engines share), remaining value
  * w = hash div m lies in [0, 2^(31-p)); rho(w) = (31-p) - floor(log2(w))
  * computed with INTEGER compares (Long.numberOfLeadingZeros here, a
  * generated CASE ladder in SQL — no float log2, whose edge-of-power
  * rounding could differ per libm), and rho(0) = 32-p.
  *
  * Why TypedImperativeAggregate: the buffer is m bytes per group no
  * matter how many rows stream through, merge is an element-wise max —
  * map-side partial aggregation reduces every partition to one register
  * vector before the exchange, the property that makes HLL the
  * industry-standard distributed distinct count (vs KMV's k-longs
  * buffer, also in this repo — k04).
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 16, s"hll_registers: p must be in [4,16], got $p")
  private val m = 1 << p

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) 32 - p
        else (31 - p) - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  /** Wire format (what rides the shuffle between partial and final
    * aggregation — the cost that matters when grouping by a
    * high-cardinality key, where dense vectors are millions × m bytes
    * through the exchange). The public HLL++ refinement (Heule,
    * Nunkesser, Hall, EDBT 2013): below m/4 occupancy most registers
    * are zero, so ship only the set ones.
    *   tag 0: dense  — [0, r_0 .. r_{m-1}]            (1 + m bytes)
    *   tag 1: sparse — [1, (idx_hi, idx_lo, rho)...]  (1 + 3·occ bytes)
    * p ≤ 16 keeps every index in two bytes. The in-memory buffer stays
    * a dense m-byte array either way (update/merge are O(1)/O(m) array
    * ops on 512 B — sparsifying those would cost more than it saves);
    * only serialize/deserialize translate. */
  override def serialize(buf: Array[Byte]): Array[Byte] = {
    var occ = 0
    var i = 0
    while (i < m) { if (buf(i) != 0) occ += 1; i += 1 }
    if (occ >= m / 4) {
      val out = new Array[Byte](1 + m)
      out(0) = 0
      System.arraycopy(buf, 0, out, 1, m)
      out
    } else {
      val out = new Array[Byte](1 + 3 * occ)
      out(0) = 1
      var k = 1
      i = 0
      while (i < m) {
        if (buf(i) != 0) {
          out(k) = ((i >> 8) & 0xff).toByte
          out(k + 1) = (i & 0xff).toByte
          out(k + 2) = buf(i)
          k += 3
        }
        i += 1
      }
      out
    }
  }

  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    val buf = new Array[Byte](m)
    if (bytes(0) == 0) {
      System.arraycopy(bytes, 1, buf, 0, m)
    } else {
      var k = 1
      while (k + 3 <= bytes.length) {
        val idx = ((bytes(k) & 0xff) << 8) | (bytes(k + 1) & 0xff)
        buf(idx) = bytes(k + 2)
        k += 3
      }
    }
    buf
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): HllRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)

  override def prettyName: String = "hll_registers"
}

package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic generator table as a full DataSource V2 connector.
  *
  * The reference materializes synthetic/control samples by writing
  * files and re-reading them (`/root/reference/tests/test_stage1.py`
  * builds fixture inputs on disk); Spark's connector API lets the same
  * role be a first-class table instead — `spark.read.format(...)` with
  * the whole pushdown surface a file scan gets:
  *
  *  - column pruning  (`SupportsPushDownRequiredColumns`)
  *  - `id`-range filter pushdown → PARTITION pruning: a bound that
  *    excludes a slice's id range drops the slice before any task runs
  *  - limit pushdown (per-partition cap; Spark keeps the global limit)
  *  - reported statistics so the planner can pick a broadcast join when
  *    the generated side is small
  *
  * Row content is pure integer hash math on the row id, so a scan is
  * reproducible from (rows, slices) alone — any engine can rebuild the
  * exact table (the DuckDB oracle does, from `range(n)`), and a reader
  * never allocates more than one row.
  *
  * Columns: id BIGINT, bucket INT, v DOUBLE, tag STRING where
  *   h      = (id * 1103515245 + 12345) mod 2^31      (LCG constants)
  *   bucket = h mod 50
  *   v      = h / 2^31  — an integer multiple of 2^-31, so partial sums
  *            up to ~2^53·2^-31 are EXACT in IEEE double and any
  *            aggregation order gives the identical bits (oracle-safe)
  *   tag    = 't' + (h mod 7)
  */
object GenSource {
  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31

  def hash(id: Long): Long = (id * A + C) % M

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    GenTable(
      rows = properties.asScala.getOrElse("rows", "1000").toLong,
      slices = properties.asScala.getOrElse("slices", "8").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

case class GenTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    GenScanBuilder(rows, slices)
}

case class GenScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = GenSource.schema
  private var lo: Long = 0L            // inclusive id lower bound
  private var hi: Long = Long.MaxValue // exclusive id upper bound
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var aggSpec: Seq[String] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark passes the pruned projection; empty (count-only) is legal.
    // After an aggregate push the read schema IS the agg schema — the
    // late pruning callback must not clobber it.
    if (aggSpec.isEmpty) required = requiredSchema

  /** Global aggregates over `id` have closed forms on a contiguous id
    * range, so each partition answers COUNT/MIN/MAX/SUM in O(1) without
    * generating a single row; Spark's final aggregation merges the
    * per-partition rows (partial pushdown — `supportCompletePushDown`
    * stays false so the merge semantics are Spark's own). */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case f: NamedReference => f.fieldNames.toSeq == Seq("id")
        case _ => false
      }
    if (agg.groupByExpressions.nonEmpty || limit >= 0) return false
    val spec = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => "count"
      case c: Count if !c.isDistinct && isId(c.column) => "count" // id is non-null
      case m: Min if isId(m.column) => "min"
      case m: Max if isId(m.column) => "max"
      case s: Sum if !s.isDistinct && isId(s.column) => "sum"
      case _ => return false
    }
    aggSpec = spec
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", _: Number) => true
      case GreaterThan("id", _: Number) => true
      case GreaterThanOrEqual("id", _: Number) => true
      case LessThan("id", _: Number) => true
      case LessThanOrEqual("id", _: Number) => true
      case IsNotNull("id") => true // no-op: id is non-nullable
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", n: Number) =>
        lo = math.max(lo, n.longValue()); hi = math.min(hi, n.longValue() + 1)
      case GreaterThan("id", n: Number) => lo = math.max(lo, n.longValue() + 1)
      case GreaterThanOrEqual("id", n: Number) => lo = math.max(lo, n.longValue())
      case LessThan("id", n: Number) => hi = math.min(hi, n.longValue())
      case LessThanOrEqual("id", n: Number) => hi = math.min(hi, n.longValue() + 1)
      case _ => ()
    }
    pushed = accepted
    // accepted bounds are honored EXACTLY by the readers, so Spark need
    // not re-evaluate them: only the rejected ones stay post-scan
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean =
    if (aggSpec.nonEmpty) false else { limit = l; true }
  override def isPartiallyPushed(): Boolean = true // per-partition cap only

  override def build(): Scan =
    GenScan(rows, slices, required, math.max(lo, 0L), math.min(hi, rows), limit,
      pushed, aggSpec)
}

case class GenScan(rows: Long, slices: Int, required: StructType,
                   lo: Long, hi: Long, limit: Int, pushed: Array[Filter],
                   aggSpec: Seq[String] = Nil)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType =
    if (aggSpec.isEmpty) required
    // positional contract: Spark zips the scan output with the pushed
    // aggregate expressions in order; all id aggregates are LONG
    else StructType(aggSpec.zipWithIndex.map { case (a, i) =>
      StructField(s"${a}_$i", LongType, nullable = false)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_gen rows=$rows bounds=[$lo,$hi) limit=$limit " +
      s"pushed=[${pushed.mkString(", ")}] aggs=[${aggSpec.mkString(",")}] " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    GenMicroBatchStream(slices, required, lo, hi)

  /** Slice the FULL [0, rows) grid, then clip each slice against the
    * pushed bounds — slices fully outside the bounds vanish here, at
    * planning time: that is partition pruning, visible as a smaller
    * `planInputPartitions` result, not as skipped work inside tasks. */
  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map { i =>
        val s = i * span
        val e = math.min(rows, s + span)
        GenPartition(math.max(s, lo), math.min(e, hi))
      }
      .filter(p => p.start < p.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (aggSpec.isEmpty) GenReaderFactory(required, limit)
    else GenAggReaderFactory(aggSpec)

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, math.min(hi, rows) - lo)
    override def sizeInBytes(): OptionalLong = OptionalLong.of(n * 32L)
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }
}

case class GenPartition(start: Long, end: Long) extends InputPartition

case class GenReaderFactory(required: StructType, limit: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    new GenReader(gp.start, gp.end, required, limit)
  }
}

class GenReader(start: Long, end: Long, required: StructType, limit: Int)
    extends PartitionReader[InternalRow] {
  private var id = start - 1
  private var emitted = 0
  // resolve the projection once; the per-row loop is index arithmetic
  private val cols: Array[Int] = required.fieldNames.map {
    case "id" => 0
    case "bucket" => 1
    case "v" => 2
    case "tag" => 3
  }
  private val row = new GenericInternalRow(cols.length)

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    id += 1
    emitted += 1
    id < end
  }

  override def get(): InternalRow = {
    val h = GenSource.hash(id)
    var i = 0
    while (i < cols.length) {
      cols(i) match {
        case 0 => row.update(i, id)
        case 1 => row.update(i, (h % 50L).toInt)
        case 2 => row.update(i, h.toDouble / GenSource.M.toDouble)
        case 3 => row.update(i, UTF8String.fromString("t" + (h % 7L)))
      }
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}

/** One closed-form row per partition: COUNT/MIN/MAX/SUM over a
  * contiguous id range need no row generation at all. */
case class GenAggReaderFactory(aggSpec: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = {
        val n = gp.end - gp.start
        val vals: Seq[Long] = aggSpec.map {
          case "count" => n
          case "min" => gp.start
          case "max" => gp.end - 1
          case "sum" => // arithmetic series; n*(first+last)/2 with /2 first
            if (n % 2 == 0) (n / 2) * (gp.start + gp.end - 1)
            else n * ((gp.start + gp.end - 1) / 2)
        }
        new GenericInternalRow(vals.toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}

/** Micro-batch replay of the same deterministic table: offsets are row
  * ids, one batch covers [startOffset, latest). The streaming result of
  * any aggregation therefore converges to the batch read's — asserted
  * in GenSourceSpec. */
case class GenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

case class GenMicroBatchStream(slices: Int, required: StructType,
                               lo: Long, hi: Long) extends MicroBatchStream {
  override def initialOffset(): Offset = GenOffset(lo)
  override def latestOffset(): Offset = GenOffset(hi)
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s0, e0) = (start.asInstanceOf[GenOffset].pos, end.asInstanceOf[GenOffset].pos)
    val n = math.max(0L, e0 - s0)
    if (n == 0) return Array.empty
    val span = math.max(1L, (n + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => GenPartition(s0 + i * span, math.min(e0, s0 + (i + 1) * span)))
      .filter(p => p.start < p.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GenReaderFactory(required, -1)
}

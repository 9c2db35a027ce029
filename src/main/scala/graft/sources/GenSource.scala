package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    GenScanBuilder(rows, slices)
}

case class GenScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {

  private var required: StructType = GenSource.schema
  private var lo: Long = 0L            // inclusive id lower bound
  private var hi: Long = Long.MaxValue // exclusive id upper bound
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark passes the pruned projection; empty (count-only) is legal
    required = requiredSchema

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

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true // per-partition cap only

  override def build(): Scan =
    GenScan(rows, slices, required, math.max(lo, 0L), math.min(hi, rows), limit, pushed)
}

case class GenScan(rows: Long, slices: Int, required: StructType,
                   lo: Long, hi: Long, limit: Int, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_gen rows=$rows bounds=[$lo,$hi) limit=$limit " +
      s"pushed=[${pushed.mkString(", ")}] cols=${required.fieldNames.mkString(",")}"

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
    GenReaderFactory(required, limit)

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

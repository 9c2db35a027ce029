package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Metrics-collecting DSv2 write target ("blackhole with an audit
  * trail"): rows are counted, not stored, and the two-phase commit
  * protocol is exercised for real — per-task `DataWriter`s report row
  * counts through `WriterCommitMessage`s, and ONLY driver-committed
  * messages reach the audit registry, so speculative/retried task
  * attempts are counted exactly once. The streaming path implements
  * `StreamingWrite` with per-epoch commits (idempotent on epoch replay,
  * the contract a restarted query depends on).
  *
  * The registry is keyed by the `name` option. This is the sink to put
  * at the end of a pipeline under test: it answers "how many rows
  * REALLY came out, across retries" without writing bytes anywhere —
  * the same role Spark's `noop` sink plays, plus the audit counters
  * that make commit semantics assertable (AuditSinkSpec injects a task
  * failure and proves the count is still exact).
  *
  * Failure injection: `failFirstAttemptOfTask` = partition id whose
  * FIRST attempt throws after emitting half its rows; Spark's retry
  * must discard the failed attempt's counts.
  */
object AuditSink {
  final class Stats {
    val rows = new AtomicLong(0)
    val taskCommits = new AtomicLong(0)
    val jobCommits = new AtomicLong(0)
    val epochs = new ConcurrentHashMap[Long, java.lang.Long]() // epoch -> rows
    val aborts = new AtomicLong(0)
  }
  val registry = new ConcurrentHashMap[String, Stats]()
  def stats(name: String): Stats =
    registry.computeIfAbsent(name, _ => new Stats)
  def reset(name: String): Unit = registry.remove(name)

  // test hook: (sinkName, partitionId) attempts that have already failed
  private[sources] val failedOnce = new ConcurrentHashMap[(String, Int), AtomicBoolean]()
}

class AuditSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the query
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    AuditTable(
      properties.asScala.getOrElse("name", "default"),
      properties.asScala.get("failFirstAttemptOfTask").map(_.toInt))
}

case class AuditTable(name: String, failTask: Option[Int])
    extends Table with SupportsWrite {
  override def schema(): StructType = new StructType()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // nothing stored: truncate = no-op
      override def build(): Write = AuditWrite(name, failTask)
    }
}

case class AuditWrite(name: String, failTask: Option[Int]) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      AuditWriterFactory(name, failTask)
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val st = AuditSink.stats(name)
      messages.foreach { case AuditCommit(n) =>
        st.rows.addAndGet(n)
        st.taskCommits.incrementAndGet()
      }
      st.jobCommits.incrementAndGet()
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      AuditSink.stats(name).aborts.incrementAndGet()
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      AuditWriterFactory(name, failTask)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val st = AuditSink.stats(name)
      val n = messages.map { case AuditCommit(c) => c }.sum
      // idempotent on epoch replay: a re-committed epoch overwrites, so
      // totals derived from the epoch map never double-count
      st.epochs.put(epochId, n)
      st.jobCommits.incrementAndGet()
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      AuditSink.stats(name).aborts.incrementAndGet()
  }
}

case class AuditCommit(rows: Long) extends WriterCommitMessage

case class AuditWriterFactory(name: String, failTask: Option[Int])
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditWriter(name, failTask, partitionId)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new AuditWriter(name, failTask, partitionId)
}

class AuditWriter(name: String, failTask: Option[Int], partitionId: Int)
    extends DataWriter[InternalRow] {
  private var n = 0L
  override def write(row: InternalRow): Unit = {
    n += 1
    if (failTask.contains(partitionId) && n == 8) {
      val flag = AuditSink.failedOnce
        .computeIfAbsent((name, partitionId), _ => new AtomicBoolean(false))
      if (flag.compareAndSet(false, true))
        throw new RuntimeException(
          s"audit-sink injected failure: task $partitionId first attempt")
    }
  }
  override def commit(): WriterCommitMessage = AuditCommit(n)
  override def abort(): Unit = () // nothing staged, nothing to clean
  override def close(): Unit = ()
}

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Accumulates task-level execution metrics between snapshots so Bench
  * and Verify can attribute shuffle-write bytes, spill (memory+disk),
  * and peak execution memory to the query running at the time. Task-end
  * events arrive on the listener bus slightly after the action returns,
  * so [[snapshot]] is taken after a short bus drain (see call sites);
  * the attribution is per-query exact in the sequential, single-query
  * execution model both mains use. */
private[graft] final class ExecMetricsListener extends SparkListener {
  private val shuffleWrite = new AtomicLong
  private val spillMem = new AtomicLong
  private val spillDisk = new AtomicLong
  private val peakMem = new AtomicLong
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
      peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
    }
  }
  /** Returns (shuffleWriteBytes, spillMemBytes, spillDiskBytes,
    * peakExecMemBytes) since the last snapshot, then resets. */
  def snapshot(): (Long, Long, Long, Long) = {
    val r = (shuffleWrite.getAndSet(0L), spillMem.getAndSet(0L),
      spillDisk.getAndSet(0L), peakMem.getAndSet(0L))
    r
  }
}

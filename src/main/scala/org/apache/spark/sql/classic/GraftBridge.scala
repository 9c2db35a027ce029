package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{Column, DataFrame}

/** The one file graft places inside Spark's namespace: `Dataset.ofRows`
  * (LogicalPlan → DataFrame) and `ExpressionUtils.expression` (Column →
  * Expression) are `private[sql]`, and both are required to expose a
  * custom logical operator (graft.plans.AsOfJoinPlan) through a
  * DataFrame-returning API. Every Spark-extension library that adds
  * whole-plan operators ships the same few-line bridge; no Spark
  * internals are modified or shadowed here.
  */
object GraftBridge {
  def ofRows(session: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(session.asInstanceOf[SparkSession], plan)

  // eagerly converts the Column's node tree to a catalyst Expression
  // (ExpressionUtils.expression alone returns a lazy ColumnNodeExpression
  // wrapper that only the analyzer's converter unwraps)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  // the reverse direction: wrap a catalyst Expression as a Column, so
  // expressions the public API cannot spell (e.g. a Cast carrying an
  // explicit timeZoneId) can enter a DataFrame projection
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Block until all queued listener-bus events are dispatched (or the
    * timeout passes). `LiveListenerBus.waitUntilEmpty` is
    * `private[spark]`; Bench uses it to attribute task metrics to the
    * query that just ran before snapshotting its metrics listener. */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => }

  /** Current value of the session's sequential broadcast-id counter.
    * Broadcast ids are allocated from one AtomicLong, so a [before,
    * after) snapshot around a unit of work identifies exactly the
    * broadcasts that work created — including the per-stage task-binary
    * broadcasts whose torrent blocks otherwise sit in the MemoryStore
    * until the async ContextCleaner notices their weak refs were GC'd.
    * The counter accessor is private; read reflectively (spark-core is
    * classpath/unnamed-module, so setAccessible is permitted). */
  def currentBroadcastId(sc: org.apache.spark.SparkContext): Long = {
    val bm = org.apache.spark.SparkEnv.get.broadcastManager
    val m = bm.getClass.getDeclaredMethod("nextBroadcastId")
    m.setAccessible(true)
    m.invoke(bm).asInstanceOf[java.util.concurrent.atomic.AtomicLong].get()
  }

  /** Synchronously drop every broadcast in [fromId, toId): driver and
    * executor blocks, blocking until removed. Public `unbroadcast` —
    * the same call the ContextCleaner makes, minus the wait for a GC
    * to enqueue the weak reference. Safe when the callers' plans for
    * that id range are dead (Bench's warm pass discards its result). */
  def removeBroadcasts(sc: org.apache.spark.SparkContext,
      fromId: Long, toId: Long): Unit = {
    val bm = org.apache.spark.SparkEnv.get.broadcastManager
    var i = fromId
    while (i < toId) {
      try bm.unbroadcast(i, true, true)
      catch { case _: Throwable => } // already cleaned is fine
      i += 1
    }
  }
}

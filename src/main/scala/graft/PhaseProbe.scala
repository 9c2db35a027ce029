package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only diagnostic main (not part of the driver contract): splits a
  * registered query's wall time into BUILD (the fn() call — includes any
  * driver-loop jobs like localCheckpoint/Newton steps), PLAN (force
  * executedPlan), and EXEC (count()), over three consecutive runs in one
  * JVM, with the Janino codegen-compile counters and the scheduled-job
  * count per run. Run 1 vs run 2+ separates codegen/JIT compile cost
  * (janino caches on identical generated source) from steady planning +
  * execution, which is exactly the attribution the optimization round
  * needs for the zero-shuffle 2 s class.
  *
  * usage: graft.PhaseProbe <q1,q2,...> [sfDir] [reps]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val jobs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def cgCount: Long = cg.METRIC_COMPILATION_TIME.getCount
    def cgMeanMs: Double = cg.METRIC_COMPILATION_TIME.getSnapshot.getMean

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        org.apache.spark.sql.classic.GraftBridge
          .drainListenerBus(spark.sparkContext, 2000L)
        val j0 = jobs.get; val c0 = cgCount
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        org.apache.spark.sql.classic.GraftBridge
          .drainListenerBus(spark.sparkContext, 2000L)
        val j1 = jobs.get; val c1 = cgCount
        println(f"PROBE $name%-26s run$i total ${(t3 - t0) / 1e9}%6.3f  " +
          f"build ${(t1 - t0) / 1e9}%6.3f  plan ${(t2 - t1) / 1e9}%6.3f  " +
          f"exec ${(t3 - t2) / 1e9}%6.3f  jobs ${j1 - j0}%3d  " +
          f"cgComp ${c1 - c0}%3d (mean ${cgMeanMs}%5.1f ms)")
      }
    }
    spark.stop()
  }
}

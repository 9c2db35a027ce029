package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only diagnostic main (not part of the driver contract): times a
  * registered query like [[PhaseProbe]] but with arbitrary session confs
  * applied first, so a conf hypothesis ("the loop's per-job cost is the
  * 32-wide tiny shuffles") can be A/B'd without touching the query.
  *
  * usage: graft.ConfProbe <q1,q2,...> <sfDir> <reps> [k=v ...]
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = args(1)
    val reps = args(2).toInt
    val confs = args.drop(3).map { kv =>
      val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // match Bench's session (r15): without this the default 100-entry
      // compiled-class cache evicts mid-run and run-2+ "steady" numbers
      // re-pay janino for compile-heavy queries
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val jobs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def cgCount: Long = cg.METRIC_COMPILATION_TIME.getCount

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        org.apache.spark.sql.classic.GraftBridge
          .drainListenerBus(spark.sparkContext, 2000L)
        val j0 = jobs.get; val c0 = cgCount
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        org.apache.spark.sql.classic.GraftBridge
          .drainListenerBus(spark.sparkContext, 2000L)
        println(f"CPROBE $name%-26s run$i total ${(t2 - t0) / 1e9}%6.3f  " +
          f"build ${(t1 - t0) / 1e9}%6.3f  exec ${(t2 - t1) / 1e9}%6.3f  " +
          f"jobs ${jobs.get - j0}%3d  cgComp ${cgCount - c0}%3d")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only diagnostic main (not part of the driver contract): runs one
  * streaming query-family fn and prints every micro-batch's
  * durationMs breakdown (queryPlanning, addBatch, getBatch, walCommit,
  * commitOffsets, triggerExecution) from the StreamingQueryListener —
  * the attribution the n-family optimization needs.
  *
  * usage: graft.StreamProbe <q1,q2,...> [sfDir] [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"SPROBE started ${e.name} at ${System.nanoTime() / 1000000}ms")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"SPROBE batch ${p.batchId} rows=${p.numInputRows} $d")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"SPROBE terminated at ${System.nanoTime() / 1000000}ms")
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        // listener events are async; give them a beat to flush
        Thread.sleep(500)
        println(f"SPROBE $name run$i total ${(System.nanoTime() - t0) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}

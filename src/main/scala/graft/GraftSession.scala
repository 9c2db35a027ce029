package graft

import org.apache.spark.sql.SparkSession
import graft.plans.{GraftExtensions, GraftFunctions}

/** Library entry point for users: a SparkSession builder with graft's
  * recommended configuration and native functions pre-registered.
  *
  *   val spark = GraftSession.local(cores = 32)
  *   // or attach to an existing session:
  *   GraftSession.attach(spark)
  *
  * Config choices (and why they matter at cluster scale):
  *  - shuffle partitions sized to cores, not Spark's 200 default —
  *    partition count should track parallelism, AQE coalesces up;
  *  - AQE on: runtime partition coalescing and skew-join splitting;
  *  - parquet nanos-as-long: NanoAOD-era files carry TIMESTAMP(NANOS);
  *  - nested schema pruning: jagged event tables must prune struct
  *    fields into the scan, not read whole collections.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    attach(s)
    s
  }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  /** Register graft's native functions on an existing session (the
    * withExtensions path is ignored by getOrCreate when a session
    * already exists). Idempotent. */
  def attach(s: SparkSession): Unit = GraftFunctions.register(s)
}

package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AuditSinkSpec extends SparkSpec {

  test("batch write commits exact row counts through the 2PC protocol") {
    AuditSink.reset("t_batch")
    spark.range(0, 10000, 1, 6).select(col("id"), (col("id") % 7).as("m"))
      .write.format("graft.sources.AuditSink")
      .option("name", "t_batch").mode("append").save()
    val st = AuditSink.stats("t_batch")
    assert(st.rows.get() === 10000L)
    assert(st.taskCommits.get() === 6L)
    assert(st.jobCommits.get() === 1L)
    assert(st.aborts.get() === 0L)
  }

  test("a retried task attempt is counted exactly once") {
    AuditSink.reset("t_retry")
    // partition 2's first attempt dies mid-write; Spark retries the task
    // and only the successful attempt's commit message reaches the driver
    spark.range(0, 5000, 1, 4)
      .write.format("graft.sources.AuditSink")
      .option("name", "t_retry")
      .option("failFirstAttemptOfTask", "2")
      .mode("append").save()
    assert(AuditSink.stats("t_retry").rows.get() === 5000L)
    assert(AuditSink.stats("t_retry").taskCommits.get() === 4L)
  }

  test("streaming epochs commit idempotently and sum to the source total") {
    AuditSink.reset("t_stream")
    val tmp = java.nio.file.Files.createTempDirectory("audit-stream").toString
    val q = spark.readStream.format("graft.sources.GenSource")
      .option("rows", 4000).option("slices", 4).load()
      .writeStream.format("graft.sources.AuditSink")
      .option("name", "t_stream")
      .option("checkpointLocation", tmp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val st = AuditSink.stats("t_stream")
    val total = st.epochs.values().stream().mapToLong(_.longValue()).sum()
    assert(total === 4000L)
    assert(st.aborts.get() === 0L)
  }
}

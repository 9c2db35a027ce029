package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GenSourceSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def read(rows: Long, slices: Int = 8) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows).option("slices", slices).load()

  private def genScan(df: org.apache.spark.sql.DataFrame): GenScan = {
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    scans.head.asInstanceOf[GenScan]
  }

  test("generates the deterministic hash table") {
    val rows = read(1000, 4).collect()
    assert(rows.length === 1000)
    val r7 = rows.find(_.getLong(0) == 7L).get
    val h = GenSource.hash(7L)
    assert(r7.getInt(1) === (h % 50).toInt)
    assert(r7.getDouble(2) === h.toDouble / GenSource.M)
    assert(r7.getString(3) === "t" + (h % 7))
  }

  test("column pruning reaches the scan") {
    val df = read(100).select("bucket")
    assert(genScan(df).readSchema().fieldNames.toSeq === Seq("bucket"))
    assert(df.distinct().count() === 50)
  }

  test("id-range filter pushdown prunes whole partitions") {
    // 1000 rows / 10 slices = 100-row slices; [250, 450) covers 3 slices
    val df = read(1000, 10).filter(col("id") >= 250 && col("id") < 450)
    val scan = genScan(df)
    assert(scan.lo === 250 && scan.hi === 450)
    assert(scan.planInputPartitions().length === 3)
    assert(df.count() === 200)
    // the bound is honored exactly, not re-filtered: ids match closed form
    assert(df.agg(min("id"), max("id")).collect().head.toSeq === Seq(250L, 449L))
  }

  test("contradictory bounds plan zero partitions") {
    val df = read(1000, 10).filter(col("id") > 5000)
    assert(genScan(df).planInputPartitions().length === 0)
    assert(df.count() === 0)
  }

  test("limit pushdown caps the per-partition reader") {
    val df = read(100000, 4).limit(5)
    assert(genScan(df).limit === 5)
    assert(df.collect().length === 5)
  }

  test("reported statistics let the planner broadcast the generated side") {
    val dim = read(100, 1).select(col("bucket").as("b"), col("v"))
    val fact = spark.range(20000).select((col("id") % 50).cast("int").as("b"))
    val joined = fact.join(dim, "b")
    val bhj = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "expected BroadcastHashJoin off reported stats:\n" +
      joined.queryExecution.executedPlan.toString)
    assert(joined.count() === 40000) // 2 gen rows per bucket on average
  }

  test("aggregate pushdown answers COUNT/MIN/MAX/SUM without generating rows") {
    // a BILLION-row table: only closed-form per-partition answers can
    // return quickly — generating rows would take minutes
    val rows = 1000000000L
    val df = read(rows, 8).agg(
      count(lit(1)).as("n"), min("id").as("mn"),
      max("id").as("mx"), sum("id").as("s"))
    val scan = genScan(df)
    assert(scan.aggSpec.nonEmpty, s"aggregates not pushed: ${scan.description()}")
    val r = df.collect().head
    assert(r.getLong(0) === rows)
    assert(r.getLong(1) === 0L && r.getLong(2) === rows - 1)
    assert(r.getLong(3) === rows * ((rows - 1) / 2) + (rows / 2) * ((rows - 1) % 2))
  }

  test("aggregate pushdown composes with filter pushdown bounds") {
    val df = read(1000000000L, 8)
      .filter(col("id") >= 10 && col("id") < 1000010)
      .agg(count(lit(1)).as("n"), sum("id").as("s"))
    assert(genScan(df).aggSpec === Seq("count", "sum"))
    val r = df.collect().head
    assert(r.getLong(0) === 1000000L)
    // sum of [10, 1000010) = sum[0,1000010) - sum[0,10)
    assert(r.getLong(1) === 1000009L * 1000010L / 2 - 45L)
  }

  test("grouped aggregation is NOT pushed and still computes correctly") {
    val df = read(1000, 4).groupBy("bucket").agg(count(lit(1)).as("n"))
    assert(genScan(df).aggSpec.isEmpty)
    assert(df.agg(sum("n")).collect().head.getLong(0) === 1000L)
  }

  test("micro-batch stream replays the same table as the batch read") {
    val tmp = java.nio.file.Files.createTempDirectory("gen-stream").toString
    val stream = spark.readStream.format("graft.sources.GenSource")
      .option("rows", 5000).option("slices", 4).load()
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val q = stream.writeStream.format("memory").queryName("gen_stream_agg")
      .outputMode("complete")
      .option("checkpointLocation", tmp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("gen_stream_agg")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = read(5000, 4).groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want) // v sums are bit-exact by construction
  }

  test("non-id predicates stay post-scan and still evaluate correctly") {
    val df = read(1000, 4).filter(col("bucket") === 3)
    val scan = genScan(df)
    assert(scan.lo === 0 && scan.hi === 1000) // not pushed into bounds
    val expect = (0L until 1000L).count(i => GenSource.hash(i) % 50 == 3)
    assert(df.count() === expect)
  }
}

package graft.report

import java.nio.file.Files
import graft.SparkSpec
import graft.queries.StageQueries
import org.apache.spark.sql.functions._

/** Sink-side behavior: the partitioned parquet sink (S4) must
  * round-trip with partition pruning, and the datacard text sink (S9)
  * must render the yields table. */
class SinksSpec extends SparkSpec {

  test("partitionBy sink round-trips and prunes partitions on read") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = StageQueries.queries("s01_stage1_pipeline")(spark, sf("sf0.001"))
    df.write.mode("overwrite").partitionBy("region").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    // region filter must prune to the one partition directory
    val pruned = back.filter(col("region") === "z-peak")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(region"),
      s"no partition pruning:\n$plan")
    assert(pruned.count() ==
      df.filter(col("region") === "z-peak").count())
  }

  test("datacard renders yields with one column per channel") {
    val yields = StageQueries.queries("s04_stage3_templates")(spark, sf("sf0.001"))
    val cards = Datacards.renderAll(yields)
    assert(cards.nonEmpty)
    cards.foreach { case (region, text) =>
      assert(text.contains(s"# Datacard for region $region"))
      assert(text.contains("imax 1"))
      assert(text.contains("rate"))
      assert(text.contains("jes lnN"))
    }
  }
}

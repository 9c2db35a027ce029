package graft.physics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boundary semantics of the labelers — the golden values depend on
  * exact open/closed interval edges (reference
  * stage1/processor.py:471-478, stage2/categorizer.py:1-23). */
class SelectionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def regions(masses: Seq[Double]): Seq[String] = {
    import spark.implicits._
    masses.toDF("m").select(Selections.regionLabel(col("m")).as("r"))
      .collect().map(_.getString(0)).toSeq
  }

  test("region boundaries: z-peak open, h-peak closed, sidebands open") {
    assert(regions(Seq(76.0)) == Seq("none"))       // open lower z edge
    assert(regions(Seq(76.0001)) == Seq("z-peak"))
    assert(regions(Seq(106.0)) == Seq("none"))      // open upper z edge
    assert(regions(Seq(110.0)) == Seq("none"))      // open sideband edge
    assert(regions(Seq(112.0)) == Seq("h-sidebands"))
    assert(regions(Seq(115.03)) == Seq("h-peak"))   // closed h-peak edge
    assert(regions(Seq(135.03)) == Seq("h-peak"))
    assert(regions(Seq(135.031)) == Seq("h-sidebands"))
    assert(regions(Seq(150.0)) == Seq("none"))
  }

  test("channel cascade priority: btag beats vbf beats jet count") {
    import spark.implicits._
    val df = Seq(
      (2L, 500.0, 3.0, 40.0, 3L),  // btag wins though vbf would match
      (0L, 500.0, 3.0, 40.0, 3L),  // vbf
      (0L, 100.0, 3.0, 40.0, 0L),  // ggh_0jets
      (0L, 100.0, 3.0, 40.0, 1L),  // ggh_1jet
      (0L, 100.0, 3.0, 40.0, 5L)   // ggh_2orMoreJets
    ).toDF("nbtag", "jjmass", "deta", "leadpt", "njets")
    val got = df.select(Selections.channelLabel(col("nbtag"), col("jjmass"),
      col("deta"), col("leadpt"), col("njets")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("ttHorVH", "vbf", "ggh_0jets", "ggh_1jet", "ggh_2orMoreJets"))
  }

  test("flag AND treats missing as false, trigger OR tolerates missing") {
    import spark.implicits._
    val df = Seq((true, true), (true, false)).toDF("f1", "f2")
    val missing = lit(null).cast("boolean")
    val andRes = df.select(Selections.allFlags(Seq(col("f1"), col("f2"), missing)))
      .collect().map(_.getBoolean(0)).toSeq
    assert(andRes == Seq(false, false))
    val orRes = df.select(Selections.anyTrigger(Seq(col("f1"), col("f2"), missing)))
      .collect().map(_.getBoolean(0)).toSeq
    assert(orRes == Seq(true, true))
  }
}

package graft.physics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event/object selection predicates and categorical labelers as pure
  * `Column`s — the reference's boolean-mask pipeline re-expressed so
  * Catalyst can push them into the Parquet scan.
  */
object Selections {

  /** AND of named flag columns, reference `stage1/processor.py:234-235`
    * (product of bools > 0). Missing columns tolerated via coalesce. */
  def allFlags(flags: Seq[Column]): Column =
    flags.map(f => coalesce(f, lit(false))).reduce(_ && _)

  /** OR of trigger columns, tolerant of missing branches
    * (`stage1/processor.py:151-156`). */
  def anyTrigger(triggers: Seq[Column]): Column =
    triggers.map(t => coalesce(t, lit(false))).reduce(_ || _)

  /** Mass-region labeler (`stage1/processor.py:471-478`): piecewise label
    * from the dimuon-mass analog. Boundaries parameterized. */
  def regionLabel(mass: Column,
                  zLo: Double = 76.0, zHi: Double = 106.0,
                  sbLo: Double = 110.0, peakLo: Double = 115.03,
                  peakHi: Double = 135.03, sbHi: Double = 150.0): Column =
    when(mass > zLo && mass < zHi, "z-peak")
      .when((mass > sbLo && mass < peakLo) || (mass > peakHi && mass < sbHi), "h-sidebands")
      .when(mass >= peakLo && mass <= peakHi, "h-peak")
      .otherwise("none")

  /** Channel labeler (`stage2/categorizer.py:1-23`): priority cascade —
    * order of the `when`s is semantic. */
  def channelLabel(nBtag: Column, compositeMass: Column, dEta: Column,
                   leadPt: Column, nJets: Column): Column =
    when(nBtag > 1, "ttHorVH")
      .when(compositeMass > 400.0 && dEta > 2.5 && leadPt > 35.0, "vbf")
      .when(nJets === 0, "ggh_0jets")
      .when(nJets === 1, "ggh_1jet")
      .otherwise("ggh_2orMoreJets")
}

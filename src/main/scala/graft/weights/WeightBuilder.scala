package graft.weights

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multiplicative weight accumulator with systematic variations.
  *
  * Re-expresses the reference's `Weights` fold
  * (`/root/reference/stage1/weights.py:5-71`): `nominal *= w` per added
  * weight, spawning `<name>_up`, `<name>_down` and `<name>_off` columns
  * that capture the varied / pre-multiplication states. In Spark these
  * are just derived columns in one projection — a single codegen stage,
  * no state, no extra pass per variation.
  */
final case class WeightBuilder(entries: Seq[(String, Column, Option[(Column, Column)])] = Nil) {

  /** Add a weight with optional up/down variations. */
  def add(name: String, w: Column): WeightBuilder =
    copy(entries = entries :+ ((name, w, None)))

  def add(name: String, w: Column, up: Column, down: Column): WeightBuilder =
    copy(entries = entries :+ ((name, w, Some((up, down)))))

  /** nominal = product of all weights. */
  def nominal: Column =
    entries.map(_._2).reduceOption(_ * _).getOrElse(lit(1.0))

  /** All output (name, unaliased column) pairs: wgt_nominal plus, per
    * varied weight, wgt_<name>_up / _down (variation substituted into the
    * product) and wgt_<name>_off (weight removed), matching
    * `weights.py:30-64`. Callers alias (and optionally cast) by name. */
  def named: Seq[(String, Column)] = {
    val nom = ("wgt_nominal", nominal)
    val varied = entries.flatMap {
      case (name, _, vs) =>
        val others = entries.filter(_._1 != name).map(_._2)
          .reduceOption(_ * _).getOrElse(lit(1.0))
        val off = (s"wgt_${name}_off", others)
        vs match {
          case Some((up, down)) =>
            Seq((s"wgt_${name}_up", others * up),
                (s"wgt_${name}_down", others * down), off)
          case None => Seq(off)
        }
    }
    nom +: varied
  }

  /** Aliased column list (no cast). */
  def columns: Seq[Column] = named.map { case (n, c) => c.as(n) }
}

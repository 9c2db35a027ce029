package graft.physics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-`Column` kinematics library.
  *
  * Re-expresses the reference's NumPy four-vector math
  * (`/root/reference/python/math_tools.py:5-42,220-224`) as Catalyst
  * column expressions so the whole computation stays inside whole-stage
  * codegen — no UDFs, no row loops.
  *
  * Portability note: hyperbolic functions are expanded to `exp`/`ln`
  * forms (rather than Spark's built-in `sinh` etc.) so the DuckDB
  * correctness oracle can evaluate the *same* floating-point expression
  * tree; outputs are expected to be cast to float32 by callers to absorb
  * last-ulp differences from differing summation orders.
  */
object Kinematics {

  val Pi: Double = math.Pi

  // -- portable hyperbolics ------------------------------------------------
  def sinhP(x: Column): Column = (exp(x) - exp(negate(x))) / lit(2.0)
  def coshP(x: Column): Column = (exp(x) + exp(negate(x))) / lit(2.0)
  def tanhP(x: Column): Column = { val e = exp(x * lit(2.0)); (e - lit(1.0)) / (e + lit(1.0)) }
  def asinhP(x: Column): Column = log(x + sqrt(x * x + lit(1.0)))

  /** positive modulus — both Spark and DuckDB `%` take the dividend sign,
    * so `((x % m) + m) % m` is portable. */
  def pmodP(x: Column, m: Column): Column = ((x % m) + m) % m

  // -- four-vector components (pt, eta, phi, mass parametrization) --------
  def px(pt: Column, phi: Column): Column = pt * cos(phi)
  def py(pt: Column, phi: Column): Column = pt * sin(phi)
  def pz(pt: Column, eta: Column): Column = pt * sinhP(eta)

  /** E = sqrt(pt^2 + pz^2 + m^2) (massless-transverse form). */
  def energy(pt: Column, eta: Column, m: Column): Column =
    sqrt(pt * pt + pz(pt, eta) * pz(pt, eta) + m * m)

  /** Composite of two (pt,eta,phi,m) four-vectors: returns the named
    * component of the sum. Mirrors `math_tools.py:5-26` (p4_sum).
    * Components: pt, eta, phi, mass, rap. */
  def p4SumPt(pt1: Column, phi1: Column, pt2: Column, phi2: Column): Column = {
    val sx = px(pt1, phi1) + px(pt2, phi2)
    val sy = py(pt1, phi1) + py(pt2, phi2)
    sqrt(sx * sx + sy * sy)
  }

  def p4SumPhi(pt1: Column, phi1: Column, pt2: Column, phi2: Column): Column = {
    val sx = px(pt1, phi1) + px(pt2, phi2)
    val sy = py(pt1, phi1) + py(pt2, phi2)
    atan2(sy, sx)
  }

  def p4SumEta(pt1: Column, eta1: Column, phi1: Column,
               pt2: Column, eta2: Column, phi2: Column): Column = {
    val sz = pz(pt1, eta1) + pz(pt2, eta2)
    val spt = p4SumPt(pt1, phi1, pt2, phi2)
    asinhP(sz / spt)
  }

  def p4SumMass(pt1: Column, eta1: Column, phi1: Column, m1: Column,
                pt2: Column, eta2: Column, phi2: Column, m2: Column): Column = {
    val sx = px(pt1, phi1) + px(pt2, phi2)
    val sy = py(pt1, phi1) + py(pt2, phi2)
    val sz = pz(pt1, eta1) + pz(pt2, eta2)
    val se = energy(pt1, eta1, m1) + energy(pt2, eta2, m2)
    val m2c = se * se - sx * sx - sy * sy - sz * sz
    sqrt(greatest(m2c, lit(0.0)))
  }

  /** Rapidity of the composite: 0.5 ln((E+pz)/(E-pz)) (`math_tools.py:29-35`). */
  def p4SumRap(pt1: Column, eta1: Column, phi1: Column, m1: Column,
               pt2: Column, eta2: Column, phi2: Column, m2: Column): Column = {
    val sz = pz(pt1, eta1) + pz(pt2, eta2)
    val se = energy(pt1, eta1, m1) + energy(pt2, eta2, m2)
    lit(0.5) * log((se + sz) / (se - sz))
  }

  // -- angular separations (`math_tools.py:220-224`) -----------------------
  def deltaEta(eta1: Column, eta2: Column): Column = abs(eta1 - eta2)

  def deltaPhi(phi1: Column, phi2: Column): Column =
    abs(pmodP(phi1 - phi2 + lit(Pi), lit(2.0 * Pi)) - lit(Pi))

  def deltaR(eta1: Column, phi1: Column, eta2: Column, phi2: Column): Column = {
    val de = deltaEta(eta1, eta2)
    val dp = deltaPhi(phi1, phi2)
    sqrt(de * de + dp * dp)
  }

  // -- Collins–Soper frame angles, simple form (`math_tools.py:38-42`) -----
  def cosThetaCS(eta1: Column, eta2: Column): Column =
    tanhP((eta1 - eta2) / lit(2.0))

  def phiCS(eta1: Column, phi1: Column, eta2: Column, phi2: Column): Column = {
    val ct = cosThetaCS(eta1, eta2)
    val st = sqrt(greatest(lit(1.0) - ct * ct, lit(0.0)))
    tan((lit(Pi) - deltaPhi(phi1, phi2)) / lit(2.0)) * st
  }

  /** Zeppenfeld variable: eta* = eta_ll - (eta_j1 + eta_j2)/2
    * (`stage1/jets.py:115-120`). */
  def zeppenfeld(etaLL: Column, etaJ1: Column, etaJ2: Column): Column =
    etaLL - (etaJ1 + etaJ2) / lit(2.0)

  /** R(pT): pT-balance ratio |pt_mmjj| / (pt_mm + pt_j1 + pt_j2)
    * (`stage1/jets.py:125-133`). */
  def rPt(ptMMJJ: Column, ptMM: Column, ptJ1: Column, ptJ2: Column): Column =
    ptMMJJ / (ptMM + ptJ1 + ptJ2)
}

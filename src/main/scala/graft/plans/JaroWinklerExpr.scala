package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990, the string-comparator of the
  * Fellegi–Sunter record-linkage model) as a native expression —
  * Spark ships `levenshtein` but no Jaro–Winkler, and a record-linkage
  * verify join evaluates this millions of times.
  *
  * Exact textbook semantics, byte-for-byte the convention DuckDB's
  * `jaro_winkler_similarity` implements (verified empirically, see
  * StringSimSpec): match window ⌊max(|a|,|b|)/2⌋−1, transpositions =
  * ⌊out-of-order matched positions / 2⌋, Winkler boost p = 0.1 on a
  * common prefix capped at 4 applied only when jaro > 0.7, and empty
  * input (either side) → 0.0. Operates on raw UTF-8 bytes — identical
  * to character semantics for ASCII keys, which is what linkage
  * blocking keys are.
  *
  * The per-pair loop lives in [[StringSim.jaroWinkler]]; codegen emits a
  * single static-style call so the expression stays inside
  * whole-stage codegen (the `levenshtein` pattern).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two string arguments")

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.StringSim.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

/** Static home for string-similarity kernels callable from generated
  * code (`graft.plans.StringSim.jaroWinkler(...)` resolves to this
  * object's static forwarder). */
object StringSim {

  /** Standard Jaro–Winkler on UTF-8 bytes; see [[JaroWinklerExpr]]. */
  def jaroWinkler(l: UTF8String, r: UTF8String): Double = {
    val a = l.getBytes
    val b = r.getBytes
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val aMatch = new Array[Boolean](n)
    val bMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars of both strings in order.
    // NOTE the INTEGER halving (t = ⌊k/2⌋): that is what DuckDB's C++
    // implementation computes (`t /= 2` on an integer), verified
    // bitwise over the full part-name pair matrix — the fractional
    // `k/2.0` textbook variant differs whenever k is odd.
    var k = 0
    var half = 0
    i = 0
    while (i < n) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) half += 1
        k += 1
      }
      i += 1
    }
    val mf = matches.toDouble
    val jaro = (mf / n + mf / m + (mf - (half / 2).toDouble) / mf) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(n, m))
    while (prefix < pMax && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

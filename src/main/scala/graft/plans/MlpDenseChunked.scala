package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One dense neural-network layer `out_j = act(Σᵢ inᵢ·W[i][j] + b_j)` as a
  * single generated loop nest over a literal weight matrix.
  *
  * The reference evaluates its MLP (`stage2/mva_evaluators.py:141-195`,
  * 128/64/32 hidden dims) inside PyTorch; the Spark-first form is column
  * math, but spelling each neuron as its own expression tree makes the
  * whole-stage-codegen method ~11k expression nodes, and the one-off
  * Janino compile dominates wall time (~8 s measured in the round-2
  * driver bench). This expression keeps the math inside codegen while
  * emitting O(1) source: the weights live in a referenced `double[]` and
  * the multiply-adds are a loop, so compile cost is independent of layer
  * width and per-row cost drops (array loads instead of thousands of
  * codegen locals).
  *
  * Accumulation order is the repo's cross-engine chunk-16 fold (see
  * MLQueries.chunkSum / chunkSumS): terms are summed left-to-right in
  * groups of 16, then the group sums are summed left-to-right, then the
  * bias is added LAST — bit-identical to the DuckDB oracle's
  * parenthesized SQL, which chunks to stay under DuckDB's 128-deep
  * binder recursion cap. tanh is the same exp-expansion both engines
  * use: (e-1)/(e+1) with e = exp(2z).
  *
  * `weights` is row-major (input-index major): W[i][j] = weights(i*nOut+j).
  */
case class MlpDenseChunked(child: Expression, weights: Seq[Double],
                           bias: Seq[Double], activateTanh: Boolean)
  extends UnaryExpression {

  private val nOut: Int = bias.length
  private val nIn: Int = if (nOut == 0) 0 else weights.length / nOut
  private val nChunks: Int = (nIn + 15) / 16
  @transient private lazy val wArr: Array[Double] = weights.toArray
  @transient private lazy val bArr: Array[Double] = bias.toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nOut > 0 && weights.length == nIn * nOut =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName weight count ${weights.length} is not a multiple of bias count $nOut")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<double> input, got $other")
  }

  // mlp_dense is registered as a general SQL function, so defend the
  // unchecked getDouble reads: a too-short input would otherwise throw a
  // bare ArrayIndexOutOfBoundsException mid-job, and a null element would
  // silently read as 0.0. The null scan is emitted only when the input
  // type says elements CAN be null, so the hot path pays nothing.
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    if (in.numElements() < nIn) throw new IllegalArgumentException(
      s"mlp_dense input has ${in.numElements()} elements, layer needs $nIn")
    if (elemNullable) {
      var i = 0
      while (i < nIn) {
        if (in.isNullAt(i)) throw new IllegalArgumentException(
          s"mlp_dense input element $i is NULL; inputs must be non-null doubles")
        i += 1
      }
    }
    val out = new Array[Double](nOut)
    var j = 0
    while (j < nOut) {
      var acc = 0.0
      var c = 0
      while (c < nChunks) {
        val start = c * 16
        val end = math.min(start + 16, nIn)
        var g = in.getDouble(start) * wArr(start * nOut + j)
        var i = start + 1
        while (i < end) { g += in.getDouble(i) * wArr(i * nOut + j); i += 1 }
        acc = if (c == 0) g else acc + g
        c += 1
      }
      val z = acc + bArr(j)
      out(j) =
        if (activateTanh) {
          // clamp before the exp expansion: identical to the SQL
          // LEAST(GREATEST(z, -20), 20) both engines use — exactly ±1.0
          // at and past the clamp, bit-unchanged below it (see
          // MLQueries.tanhS)
          val zc = if (z > 20.0) 20.0 else if (z < -20.0) -20.0 else z
          val e = math.exp(zc * 2.0); (e - 1.0) / (e + 1.0)
        } else z
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val w = ctx.addReferenceObj("mlpWeights", wArr, "double[]")
      val b = ctx.addReferenceObj("mlpBias", bArr, "double[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val st = ctx.freshName("st")
      val en = ctx.freshName("en"); val acc = ctx.freshName("acc")
      val g = ctx.freshName("g"); val z = ctx.freshName("z")
      val e = ctx.freshName("e")
      val zc = ctx.freshName("zc")
      val activate =
        if (activateTanh)
          s"""double $zc = $z > 20.0 ? 20.0 : ($z < -20.0 ? -20.0 : $z);
             double $e = Math.exp($zc * 2.0); $out[$j] = ($e - 1.0) / ($e + 1.0);"""
        else s"$out[$j] = $z;"
      val nv = ctx.freshName("nv")
      val nullGuard =
        if (elemNullable)
          s"""for (int $nv = 0; $nv < $nIn; $nv++) {
            if ($in.isNullAt($nv)) throw new IllegalArgumentException(
              "mlp_dense input element " + $nv + " is NULL; inputs must be non-null doubles");
          }"""
        else ""
      s"""
        if ($in.numElements() < $nIn) throw new IllegalArgumentException(
          "mlp_dense input has " + $in.numElements() + " elements, layer needs $nIn");
        $nullGuard
        double[] $out = new double[$nOut];
        for (int $j = 0; $j < $nOut; $j++) {
          double $acc = 0.0;
          for (int $c = 0; $c < $nChunks; $c++) {
            int $st = $c * 16;
            int $en = Math.min($st + 16, $nIn);
            double $g = $in.getDouble($st) * $w[$st * $nOut + $j];
            for (int $i = $st + 1; $i < $en; $i++) {
              $g += $in.getDouble($i) * $w[$i * $nOut + $j];
            }
            $acc = ($c == 0) ? $g : ($acc + $g);
          }
          double $z = $acc + $b[$j];
          $activate
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MlpDenseChunked =
    copy(child = newChild)

  override def prettyName: String = "mlp_dense"
}

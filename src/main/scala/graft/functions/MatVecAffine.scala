package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd affine map + activation over an ARRAY<DOUBLE> column with
  * LITERAL weights: out(k) = act(b(k) + Σ_m z(m)·w(m)(k)).
  *
  * This is the per-edge/per-node hot loop of the CGConv forward pass
  * ([[graft.graphs.GnnInference]]). The composable form
  * (`transform(sequence(...), k -> b[k] + aggregate(zip_with(z,
  * transform(w, row -> row[k]), ...)))`) is correct but every
  * higher-order function in it is CodegenFallback — scoring one edge
  * pays F interpreted lambda chains, each allocating an intermediate
  * array, and the surrounding operator falls out of whole-stage
  * codegen. Here the weight matrix is a compile-time reference
  * (model sizes are KBs), the double loop fuses into generated Java,
  * and one output array is allocated per call.
  *
  * Bit-identical to the HOF form (asserted element-for-element in
  * MatVecAffineSpec, including its null quirks): the inner sum folds
  * ascending m from 0.0 exactly like `aggregate`; the OUTER transform
  * iterates `sequence(0, F-1)`, so the result array is never null —
  * a null input array, a null ELEMENT, or a length mismatch all null
  * every per-k sum instead (each k consumes all of z), after which
  * the activation sees null — and Spark's `greatest(null, 0.0)` is
  * 0.0, so "relu" maps the null sums to 0.0 while
  * "sigmoid"/"softplus"/"linear" propagate null. Activations use the
  * same scalar formulas (StrictMath exp/ln, like Spark's Exp/Log):
  * relu = greatest(v, 0), sigmoid = 1/(1+e^-v), softplus =
  * greatest(v, 0) + ln(1 + e^-|v|) (the overflow-guarded form).
  */
case class MatVecAffine(
    child: Expression,
    w: Seq[Seq[Double]],
    b: Seq[Double],
    act: String)
    extends UnaryExpression {

  private val rows: Int = w.size
  private val cols: Int = b.size
  require(w.forall(_.size == cols),
    s"every weight row must have ${cols} outputs")
  require(Set("relu", "sigmoid", "softplus", "linear")(act), s"unknown activation $act")

  // row-major flat copy the generated code indexes as w[m*cols + k]
  private lazy val wFlat: Array[Double] = {
    val a = new Array[Double](rows * cols)
    var m = 0
    while (m < rows) {
      var k = 0
      while (k < cols) { a(m * cols + k) = w(m)(k); k += 1 }
      m += 1
    }
    a
  }
  private lazy val bArr: Array[Double] = b.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<DOUBLE>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "matvec_affine"

  // the value "relu" gives a null pre-activation sum (greatest(null, 0.0))
  private def actNull: Any = if (act == "relu") java.lang.Double.valueOf(0.0) else null

  // StrictMath for exp/ln — Spark's Exp/Log expressions evaluate via
  // StrictMath, and bit parity with the HOF fold requires the same
  // libm (Math.exp differs in the last ulp on some inputs)
  private def applyAct(v: Double): Double = act match {
    case "relu" => math.max(v, 0.0)
    case "sigmoid" => 1.0 / (1.0 + java.lang.StrictMath.exp(-v))
    case "softplus" =>
      math.max(v, 0.0) + java.lang.StrictMath.log(1.0 + java.lang.StrictMath.exp(-math.abs(v)))
    case _ => v
  }

  // the result array itself is never null — the HOF form's outer
  // transform iterates sequence(0, F-1) regardless of z
  override def nullable: Boolean = false

  private def badArray: GenericArrayData = {
    val out = new Array[Any](cols)
    var k = 0
    while (k < cols) { out(k) = actNull; k += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val zv = child.eval(input)
    if (zv == null) return badArray
    val z = zv.asInstanceOf[ArrayData]
    var bad = z.numElements() != rows
    if (!bad) {
      var m = 0
      while (m < rows && !bad) { if (z.isNullAt(m)) bad = true; m += 1 }
    }
    if (bad) return badArray
    val za = z.toDoubleArray()
    val out = new Array[Any](cols)
    var k = 0
    while (k < cols) {
      var s = 0.0
      var m = 0
      while (m < rows) { s += za(m) * wFlat(m * cols + k); m += 1 }
      out(k) = java.lang.Double.valueOf(applyAct(bArr(k) + s))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("wFlat", wFlat, "double[]")
    val bRef = ctx.addReferenceObj("bArr", bArr, "double[]")
    val out = ctx.freshName("out")
    val bad = ctx.freshName("bad")
    val za = ctx.freshName("za")
    val s = ctx.freshName("s")
    val v = ctx.freshName("v")
    val m = ctx.freshName("m")
    val k = ctx.freshName("k")
    val actNullJava = if (act == "relu") "java.lang.Double.valueOf(0.0)" else "null"
    val actApply = act match {
      case "relu" => s"java.lang.Math.max($v, 0.0)"
      case "sigmoid" => s"1.0 / (1.0 + java.lang.StrictMath.exp(-$v))"
      case "softplus" =>
        s"java.lang.Math.max($v, 0.0) + " +
          s"java.lang.StrictMath.log(1.0 + java.lang.StrictMath.exp(-java.lang.Math.abs($v)))"
      case _ => v
    }
    val body =
      code"""
         |${c.code}
         |Object[] $out = new Object[$cols];
         |boolean $bad = ${c.isNull} || ${c.value}.numElements() != $rows;
         |if (!$bad) {
         |  for (int $m = 0; $m < $rows; $m++) {
         |    if (${c.value}.isNullAt($m)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  for (int $k = 0; $k < $cols; $k++) { $out[$k] = $actNullJava; }
         |} else {
         |  double[] $za = ${c.value}.toDoubleArray();
         |  for (int $k = 0; $k < $cols; $k++) {
         |    double $s = 0.0;
         |    for (int $m = 0; $m < $rows; $m++) {
         |      $s += $za[$m] * $wRef[$m * $cols + $k];
         |    }
         |    double $v = $bRef[$k] + $s;
         |    $out[$k] = java.lang.Double.valueOf($actApply);
         |  }
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(code = body, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecAffine {

  /** Codegen'd out(k) = act(b(k) + Σ_m z(m)·w(m)(k)) over an
    * ARRAY<DOUBLE> column, weights baked into the generated code. */
  def affineNative(z: Column, w: Seq[Seq[Double]], b: Seq[Double], act: String): Column =
    ColumnShim.column(MatVecAffine(ColumnShim.expression(z), w, b, act))
}

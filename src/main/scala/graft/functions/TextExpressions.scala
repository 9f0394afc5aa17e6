package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial string hash: `fold(codePoints, 0, (acc, cp) =>
  * (acc*31 + cp) % 1000000007)`.
  *
  * Same value as the composable form in [[graft.llm.TextHash.polyHashFold]]
  * (`aggregate(transform(filter(split(s, "")...)))`), but that chain is
  * four interpreted array passes plus an allocation per string, and
  * every higher-order function is CodegenFallback. The hash is the inner
  * loop of the whole dedup family (one evaluation per shingle/token —
  * billions at corpus scale), so it gets the same treatment as
  * [[DotProduct]]: a fused primitive loop with `doGenCode`, keeping the
  * surrounding operator inside whole-stage codegen.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  final val Prime: Long = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Prime
      i += Character.charCount(cp)
    }
    acc
  }
}

object TextExpressions {

  /** Codegen'd polynomial hash of a STRING column. */
  def polyHashNative(c: Column): Column =
    ColumnShim.column(PolyHash(ColumnShim.expression(c)))
}

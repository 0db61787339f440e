package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scalar form of the positional polynomial fingerprint
  * ([[graft.operators.TextPipeline.fingerprint]] semantics): per-character
  * rolling hash `sum(code(c_i) * ((i * 2654435761) % 1000003)) % 1000000007`
  * with 1-based positions, computed in one pass per row.
  *
  * The composed form posexplodes the text into ONE ROW PER CHARACTER and
  * re-aggregates — a shuffle whose width scales with corpus characters,
  * the worst shuffle shape in the text family at 100 TB. Per-document
  * state is a single long, so this is scalar work by construction.
  * Exact-integer math, so the DuckDB oracle needs no change. Character
  * codes are UTF-16 code units (identical to `ascii(split(text, ''))` on
  * the BMP text this pipeline normalizes to).
  */
case class Fingerprint64Expr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Fingerprint64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Fingerprint64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64Expr =
    copy(child = newChild)

  override def prettyName: String = "fingerprint64"
}

object Fingerprint64Expr {
  def compute(text: UTF8String): Long = {
    val s = text.toString
    var sum = 0L
    var i = 0
    while (i < s.length) {
      sum += s.charAt(i).toLong * (((i + 1).toLong * 2654435761L) % 1000003L)
      i += 1
    }
    sum % 1000000007L
  }
}

package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scalar form of the 64-bit SimHash
  * ([[graft.operators.TextPipeline.simhash64]] is the composed DataFrame
  * form): `simhash64(text)` -> struct<sim0..sim3: int>, the four 16-bit
  * band values, in ONE pass over the row.
  *
  * Rationale (SURVEY.md §4.1 policy — custom Catalyst only where it pays):
  * the DataFrame form explodes tokens x16 digit positions and runs two
  * hash aggregations, i.e. a shuffle whose width scales with corpus token
  * count — fine for oracle-checkable composition, wasteful at 100 TB. The
  * fingerprint is per-document state of 64 counters, so a scalar
  * expression computes it with zero shuffle, inside the scan's
  * WholeStageCodegen span (the generated code calls the static
  * [[SimHash64Expr.compute]] — same fused-pipeline effect as inlining,
  * without a page of generated Java).
  *
  * Semantics are BIT-IDENTICAL to the DataFrame form and its DuckDB
  * oracle: distinct whitespace tokens (split keeps trailing empties,
  * matching `split(text, ' ')`), each token votes ±1 on all 64 bit
  * positions of md5(token) (hex digit p carries bits 4p..4p+3, high
  * nibble first), sign of the vote sum becomes the output bit —
  * `SimHashSkewSpec` pins the exact equality.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = SimHash64Expr.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64Expr {

  val schema: StructType =
    StructType((0 until 4).map(k => StructField(s"sim$k", IntegerType, nullable = false)))

  // MessageDigest is stateful and not thread-safe; digest() resets it, so a
  // per-thread instance is reusable across rows with no per-row allocation
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val votes = new Array[Int](64)
    val md = md5.get()
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (seen.add(tok)) {
        val digest = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        var p = 0
        while (p < 16) {
          val b = digest(p >> 1) & 0xff
          val v = if ((p & 1) == 0) b >>> 4 else b & 0xf
          val base = p * 4
          votes(base) += ((v & 1) << 1) - 1
          votes(base + 1) += (((v >> 1) & 1) << 1) - 1
          votes(base + 2) += (((v >> 2) & 1) << 1) - 1
          votes(base + 3) += (((v >> 3) & 1) << 1) - 1
          p += 1
        }
      }
      t += 1
    }
    val sims = new Array[Any](4)
    var k = 0
    while (k < 4) {
      var sim = 0
      var p = 0
      while (p < 4) {
        val digit = 4 * k + p
        var nib = 0
        var j = 0
        while (j < 4) {
          if (votes(digit * 4 + j) > 0) nib |= 1 << j
          j += 1
        }
        sim |= nib << (p * 4)
        p += 1
      }
      sims(k) = sim
      k += 1
    }
    new GenericInternalRow(sims)
  }
}

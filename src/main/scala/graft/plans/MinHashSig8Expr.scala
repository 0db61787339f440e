package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scalar form of the 8-hash MinHash signature over word
  * 3-shingles: `minhash_sig8(text)` -> struct<h0..h7: string> (the seeded
  * md5-min hex strings), or NULL for documents shorter than 3 tokens —
  * exactly the rows the composed form
  * (shingle explode -> [[graft.operators.TextPipeline.minhashSignature]])
  * produces, per row instead of per shingle.
  *
  * Rationale: the composed pipeline explodes one row PER SHINGLE and
  * aggregates 8 mins back per document — the signature stage of every
  * dedup pipeline (e4/d6/d7) pays a corpus-wide shuffle for what is
  * per-document state of 8 running minima. The scalar form does the same
  * md5 work with zero shuffle and feeds the band join directly.
  *
  * Exact equivalence details the spec pins: seeded hash input is
  * `"{seed}:{shingle}"` (same bytes as `md5(concat_ws(":", seed,
  * shingle))`); hex-string comparison equals unsigned digest-byte
  * comparison, so minima are tracked on raw digests and rendered once;
  * duplicate shingles cannot change a min, so no dedup pass is needed.
  */
case class MinHashSig8Expr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = MinHashSig8Expr.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig8 expects string, got ${other.simpleString}")
  }

  // a <3-token doc has no shingles and therefore no signature: NULL out
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig8Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("mhRow")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $out =
         |  graft.plans.MinHashSig8Expr.compute($c);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig8Expr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig8"
}

object MinHashSig8Expr {

  val NumHashes = 8
  val ShingleK = 3

  val schema: StructType =
    StructType((0 until NumHashes).map(k => StructField(s"h$k", StringType, nullable = false)))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) & 0xff) >>> 4)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < ShingleK) return null
    val mins = new Array[Array[Byte]](NumHashes)
    val md = md5.get()
    var i = 0
    while (i <= toks.length - ShingleK) {
      val shingle = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      val sb = shingle.getBytes(StandardCharsets.UTF_8)
      // seeded input "{seed}:{shingle}" — seeds 0..7 are single digits, so
      // one buffer is reused with only its first byte rewritten per seed
      val buf = new Array[Byte](sb.length + 2)
      buf(1) = ':'
      System.arraycopy(sb, 0, buf, 2, sb.length)
      var seed = 0
      while (seed < NumHashes) {
        buf(0) = ('0' + seed).toByte
        val digest = md.digest(buf)
        if (mins(seed) == null || unsignedLess(digest, mins(seed))) mins(seed) = digest
        seed += 1
      }
      i += 1
    }
    new GenericInternalRow(
      mins.map(d => UTF8String.fromString(hex(d)).asInstanceOf[Any]))
  }
}

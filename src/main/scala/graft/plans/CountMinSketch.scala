package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch: a fixed-size mergeable frequency summary —
  * `cms_sketch(item, depth, width)` builds the `depth x width` counter grid
  * in one pass; `cms_estimate(sketch, item, depth, width)` answers point
  * frequency queries from it.
  *
  * This is the complementary 100 TB frequency shape to the Misra–Gries
  * heavy-hitter summary ([[ApproxTopK]]): MG answers "which items are
  * frequent", CMS answers "how often did THIS item occur" for arbitrary
  * later point queries, with the same bounded-state contract — every task
  * holds exactly `depth * width` longs regardless of input size or key
  * cardinality, partials combine map-side (pointwise sum — CMS is a linear
  * sketch, so merge is exact, not lossy), and only the fixed-size grid
  * crosses the exchange. A full `groupBy(item)` materializes one row per
  * distinct key — unbounded for URL / token / n-gram domains.
  *
  * Guarantees (classic CMS, deterministic given the row-seeded hashes):
  *  - `est(x) >= true(x)` always (counters only ever add),
  *  - `est(x) <= true(x) + eps * N` with probability `1 - delta` for
  *    `width = ceil(e / eps)`, `depth = ceil(ln(1 / delta))`.
  *
  * When the hash rows happen to isolate every queried item in at least one
  * row (ample width vs domain size — deterministic and checkable, since the
  * hashes are fixed), estimates are EXACT: the correctness gate
  * (`a20_cms_freq`) pins that window against DuckDB exact counts;
  * `CountMinSketchSpec` pins the never-undercount bound under width
  * pressure where no SQL twin exists.
  *
  * Hashing: Scala-stdlib MurmurHash3 over the item's UTF-8 bytes, seeded by
  * the sketch row index — stable across JVMs, shared by build and query
  * sides.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, s"need depth > 0 and width > 0, got depth=$depth width=$width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  // reject misuse at analysis time (a non-string item would otherwise be a
  // runtime ClassCastException inside executors)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a STRING item column, got ${other.simpleString}; " +
        "cast the item to string (the sketch hashes its UTF-8 bytes)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinSketch.bucket(bytes, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "cms_sketch"
}

/** Point-frequency estimate from a [[CmsSketch]] grid: the minimum of the
  * item's counter across the `depth` hash rows. Evaluated per queried item
  * (a bounded list), not per corpus row, so interpreted eval is fine.
  */
case class CmsEstimate(
    sketch: Expression,
    item: Expression,
    depth: Int,
    width: Int)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, item)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (sketch.dataType, item.dataType) match {
    case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (ARRAY<BIGINT> sketch, STRING item), " +
        s"got (${s.simpleString}, ${i.simpleString})")
  }

  override def eval(input: InternalRow): Any = {
    val sk = sketch.eval(input)
    val it = item.eval(input)
    if (sk == null || it == null) null
    else {
      val grid = sk.asInstanceOf[ArrayData]
      require(grid.numElements() == depth * width,
        s"cms_estimate: sketch has ${grid.numElements()} cells, expected ${depth * width}")
      val bytes = it.asInstanceOf[UTF8String].getBytes
      var min = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = grid.getLong(d * width + CountMinSketch.bucket(bytes, d, width))
        if (c < min) min = c
        d += 1
      }
      min
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsEstimate =
    copy(sketch = newChildren(0), item = newChildren(1))

  override def prettyName: String = "cms_estimate"
}

object CountMinSketch {

  /** Row-`d` bucket for an item's UTF-8 bytes: stdlib MurmurHash3 with the
    * row index as seed, folded to `[0, width)`. */
  private[plans] def bucket(bytes: Array[Byte], d: Int, width: Int): Int =
    (MurmurHash3.bytesHash(bytes, 0x9747b28c + d) & 0x7fffffff) % width

  private def lit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => sys.error(s"$what must be an integer literal, got $other")
  }

  /** Expression builders shared by [[register]] and the
    * `GraftExtensions` session-build injection. */
  def buildSketch(exprs: Seq[Expression]): Expression =
    CmsSketch(exprs.head, lit(exprs(1), "cms_sketch depth"), lit(exprs(2), "cms_sketch width"))
      .toAggregateExpression()

  def buildEstimate(exprs: Seq[Expression]): Expression =
    CmsEstimate(exprs(0), exprs(1),
      lit(exprs(2), "cms_estimate depth"), lit(exprs(3), "cms_estimate width"))

  /** Registers `cms_sketch(item, depth, width)` and
    * `cms_estimate(sketch, item, depth, width)` on the session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch", buildSketch, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate", buildEstimate, "scala_udf")
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over `array<float>`
  * or `array<double>` (independently per side — a float corpus can score
  * against double-precision trained centroids without a lossy cast).
  *
  * Rationale (SURVEY.md §4.1 policy — custom Catalyst only where it pays):
  * the brute-force similarity path evaluates the dot product once per
  * (query, candidate) pair, i.e. O(|Q|·N·d) times per job — the single
  * hottest scalar in the engine at 100 TB. The higher-order-function
  * formulation (`aggregate(zip_with(...))`) allocates an intermediate array
  * per row pair; this expression generates a single fused loop in
  * whole-stage codegen (one pass, three accumulators, no allocation).
  *
  * Semantics match `VectorSearch.cosine` exactly: accumulate in double,
  * left-to-right, cos = dot / (sqrt(na) * sqrt(nb)); float elements widen
  * to double per element, exactly as an explicit cast would.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float>|array<double> on each side, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  private def leftIsFloat: Boolean = elemType(left.dataType).contains(FloatType)
  private def rightIsFloat: Boolean = elemType(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = leftIsFloat
    val rf = rightIsFloat
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : CosineSimilarity = copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Registry hook: makes `cosine_sim(a, b)` resolvable in any query on the
  * session (callable from `expr("cosine_sim(...)")` and SQL text). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig8", exprs => MinHashSig8Expr(exprs.head), "scala_udf")
  }
}

/** `SparkSessionExtensions` entry point so deployments can pre-install the
  * engine's native functions at session build time:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * (Queries inside this library call [[GraftFunctions.register]] directly,
  * which works on an already-built session; this hook is for external SQL
  * users.) */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getCanonicalName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64Expr].getCanonicalName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64Expr(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fingerprint64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Fingerprint64Expr].getCanonicalName, "fingerprint64"),
      (exprs: Seq[Expression]) => Fingerprint64Expr(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig8"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSig8Expr].getCanonicalName, "minhash_sig8"),
      (exprs: Seq[Expression]) => MinHashSig8Expr(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("approx_top_k"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ApproxTopK].getCanonicalName, "approx_top_k"),
      (exprs: Seq[Expression]) => ApproxTopK.build(exprs)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cms_sketch"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CmsSketch].getCanonicalName, "cms_sketch"),
      (exprs: Seq[Expression]) => CountMinSketch.buildSketch(exprs)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cms_estimate"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CmsEstimate].getCanonicalName, "cms_estimate"),
      (exprs: Seq[Expression]) => CountMinSketch.buildEstimate(exprs)))
    // table-valued: the change data feed with its window in the SQL text
    ext.injectTableFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        graft.sources.TableChanges.getClass.getCanonicalName, "table_changes"),
      graft.sources.TableChanges.builder))
    ext.injectPlannerStrategy(_ => MergeBoxesStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughMergeBoxes)
    ext.injectOptimizerRule(_ => SpatialJoinRewrite)
  }
}

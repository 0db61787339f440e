package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

import graft.functions.GeoPortable

/** The portable UTM->WGS84 inverse as native Catalyst expressions — the
  * third backend of the [[GeoPortable]] DAG. `doGenCode` renders the same
  * IEEE operation tree as Java source, so the whole-stage-codegen path,
  * the interpreted path, and the oracle's DuckDB SQL all produce identical
  * bits; the flagship pipeline keeps its geodesy inside a codegen span
  * instead of dropping to a Scala UDF (extension-policy tier (b) over (d)).
  *
  * Two scalar expressions (lat / lon) rather than one struct-valued one:
  * struct results fall out of whole-stage codegen paths and block
  * vectorized consumers; the duplicated arithmetic is ~60 flops per call,
  * far below the scan cost either side of it.
  */
abstract class UtmToWgs84Base extends TernaryExpression {
  def e: Expression
  def n: Expression
  def zone: Expression
  /** true -> latitude, false -> longitude */
  protected def emitLat: Boolean

  override def first: Expression = e
  override def second: Expression = n
  override def third: Expression = zone
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (e.dataType, n.dataType, zone.dataType) match {
      case (DoubleType, DoubleType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, double, int), got $other")
    }

  override protected def nullSafeEval(ev: Any, nv: Any, zv: Any): Any = {
    val ll = GeoPortable.inverse(
      ev.asInstanceOf[Double], nv.asInstanceOf[Double], zv.asInstanceOf[Int])
    if (emitLat) ll._1 else ll._2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (eV, nV, zV) => {
      val p = ctx.freshName("geo")
      val (body, latVar, lonVar) = GeoPortable.javaBody(p, eV, nV, zV)
      s"""$body
         |${ev.value} = ${if (emitLat) latVar else lonVar};""".stripMargin
    })
}

case class UtmToWgs84Lat(e: Expression, n: Expression, zone: Expression)
    extends UtmToWgs84Base {
  override protected def emitLat: Boolean = true
  override def prettyName: String = "utm_lat"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(e = newFirst, n = newSecond, zone = newThird)
}

case class UtmToWgs84Lon(e: Expression, n: Expression, zone: Expression)
    extends UtmToWgs84Base {
  override protected def emitLat: Boolean = false
  override def prettyName: String = "utm_lon"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(e = newFirst, n = newSecond, zone = newThird)
}

object GeoFunctions {
  /** Idempotent session registration (same pattern as cosine_sim). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "utm_lat", exprs => UtmToWgs84Lat(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "utm_lon", exprs => UtmToWgs84Lon(exprs(0), exprs(1), exprs(2)), "scala_udf")
  }
}

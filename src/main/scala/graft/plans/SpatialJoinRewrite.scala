package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SpatialOps

/** `wkt_envelope(wkt)` -> struct<minx,miny,maxx,maxy: double> — the
  * geometry's axis-aligned bounding box, parsed ONCE per row through
  * [[SpatialOps]]' per-thread geometry cache. [[SpatialJoinRewrite]]
  * projects this below a spatial join so the cheap interval-overlap
  * prefilter runs on materialized doubles while the exact JTS predicate
  * only sees surviving pairs. */
case class WktEnvelopeExpr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = WktEnvelopeExpr.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wkt_envelope expects a WKT string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WktEnvelopeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WktEnvelopeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WktEnvelopeExpr =
    copy(child = newChild)

  override def prettyName: String = "wkt_envelope"
}

object WktEnvelopeExpr {
  val schema: StructType = StructType(Seq(
    StructField("minx", DoubleType, nullable = false),
    StructField("miny", DoubleType, nullable = false),
    StructField("maxx", DoubleType, nullable = false),
    StructField("maxy", DoubleType, nullable = false)))

  def compute(wkt: UTF8String): GenericInternalRow = {
    val e = SpatialOps.envelopeOf(wkt.toString)
    new GenericInternalRow(Array[Any](e(0), e(1), e(2), e(3)))
  }
}

/** The optional optimizer rule from SURVEY §4.1: a user who writes the
  * NAIVE declarative spatial join —
  *
  * {{{
  *   tanks.join(counties, SpatialOps.intersectsOrContains($"tank_wkt", $"county_wkt"))
  * }}}
  *
  * — gets the hand-optimized plan shape of `j8_spatial_argmax`
  * automatically: per-row envelopes projected below the join (one WKT
  * parse per ROW instead of per PAIR), an inclusive bbox interval-overlap
  * conjunct PREPENDED to the join condition (`And` short-circuits in the
  * generated predicate, so the JTS test runs only on pairs whose boxes
  * meet), and a broadcast hint on a side the optimizer's statistics say
  * fits (so the non-equi join plans as `BroadcastNestedLoopJoin`, never a
  * cartesian shuffle). At 100 TB the prefilter is what bounds the
  * candidate-pair count; without it every pair pays a prepared-geometry
  * probe even when bboxes are disjoint.
  *
  * Soundness: both recognized predicates (`st_intersects_or_contains`,
  * `st_intersection_area > 0`) imply envelope overlap — JTS `intersects`/
  * `contains`/`within` and a positive overlay area all require it — so the
  * inclusive-bounds conjunct never drops a qualifying pair and the rewrite
  * is result-invariant (`j8_naive_argmax` hash-shares the `j8` oracle).
  *
  * Install via `spark.experimental.extraOptimizations` (library sessions)
  * or `spark.sql.extensions=graft.plans.GraftExtensions` (external SQL
  * users — [[GraftExtensions]] injects it). Inner joins only: for outer
  * joins a strengthened join condition changes null-extension semantics.
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val EnvPrefix = "__graft_env"

  /** Has this join already been rewritten? (The rule runs to fixpoint.) */
  def rewritten(plan: LogicalPlan): Boolean = plan.exists {
    case j: Join => j.condition.exists(_.exists {
      case a: AttributeReference => a.name.startsWith(EnvPrefix)
      case _ => false
    })
    case _ => false
  }

  /** Boolean spatial predicate through a `PreparedGeometry` — cheap
    * relative to an overlay. */
  private def isPreparedPredicate(conjunct: Expression): Boolean = conjunct match {
    case u: ScalaUDF => u.udfName.contains("st_intersects_or_contains")
    case _ => false
  }

  /** Overlay-backed area threshold — the expensive spatial conjunct. */
  private def isAreaThreshold(conjunct: Expression): Boolean = conjunct match {
    case GreaterThan(u: ScalaUDF, Literal(v, _)) =>
      u.udfName.contains("st_intersection_area") && v == 0.0
    case LessThan(Literal(v, _), u: ScalaUDF) =>
      u.udfName.contains("st_intersection_area") && v == 0.0
    case _ => false
  }

  /** The (leftWkt, rightWkt) children of a recognized spatial predicate
    * conjunct, or None. */
  private def spatialArgs(conjunct: Expression): Option[(Expression, Expression)] =
    conjunct match {
      case u: ScalaUDF if isPreparedPredicate(conjunct) =>
        Some((u.children(0), u.children(1)))
      case GreaterThan(u: ScalaUDF, _) if isAreaThreshold(conjunct) =>
        Some((u.children(0), u.children(1)))
      case LessThan(_, u: ScalaUDF) if isAreaThreshold(conjunct) =>
        Some((u.children(0), u.children(1)))
      case _ => None
    }

  /** The bbox-prefiltered join with area thresholds pulled OUT of the join
    * condition: `areaAliases` are `__graft_area` projections of each
    * distinct overlay UDF (to evaluate once, above the join) and
    * `areaPreds` the `> 0` predicates over their attributes. */
  private case class Rewritten(
      join: Join, areaAliases: Seq[Alias], areaPreds: Seq[Expression])

  private def rewriteJoin(j: Join): Option[Rewritten] = j match {
    case Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val args = conjuncts.iterator
        .flatMap(spatialArgs)
        .flatMap { case (a, b) =>
          // bind each WKT expression to its side (either order)
          if (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet)) Some((a, b))
          else if (b.references.subsetOf(left.outputSet) &&
                   a.references.subsetOf(right.outputSet)) Some((b, a))
          else None
        }
        .nextOption()
      args.map { case (lWkt, rWkt) =>
        val envL = Alias(WktEnvelopeExpr(lWkt), s"${EnvPrefix}_l")()
        val envR = Alias(WktEnvelopeExpr(rWkt), s"${EnvPrefix}_r")()
        val leftP = Project(left.output :+ envL, left)
        val rightP = Project(right.output :+ envR, right)
        val l = envL.toAttribute
        val r = envR.toAttribute
        def fld(att: Attribute, i: Int): Expression =
          GetStructField(att, i, Some(WktEnvelopeExpr.schema(i).name))
        // inclusive interval overlap on both axes: touching envelopes can
        // still intersect, so the bounds must not be strict
        val prefilter = And(
          And(LessThanOrEqual(fld(l, 0), fld(r, 2)),
              GreaterThanOrEqual(fld(l, 2), fld(r, 0))),
          And(LessThanOrEqual(fld(l, 1), fld(r, 3)),
              GreaterThanOrEqual(fld(l, 3), fld(r, 1))))
        // a statistics-small side gets an explicit broadcast hint so the
        // non-equi join deterministically plans nested-loop-broadcast
        // rather than depending on a runtime re-plan
        val threshold = conf.autoBroadcastJoinThreshold
        val newHint =
          if (hint.leftHint.isDefined || hint.rightHint.isDefined || threshold < 0) hint
          else if (right.stats.sizeInBytes <= threshold)
            JoinHint(None, Some(HintInfo(Some(BROADCAST))))
          else if (left.stats.sizeInBytes <= threshold)
            JoinHint(Some(HintInfo(Some(BROADCAST))), None)
          else hint
        // expensive-predicate ordering: prepared-geometry booleans are an
        // indexed probe (evaluated after the prefilter, so with the
        // left-to-right short-circuit they only see bbox-overlapping pairs).
        // Overlay-backed area thresholds are costlier still AND their value
        // is usually re-projected downstream (the argmax overlap), so they
        // leave the join condition entirely: each distinct overlay becomes
        // ONE `__graft_area` projection above the join and the threshold a
        // Filter over that attribute — the caller substitutes the same
        // attribute into its parent projection, so the overlay runs once
        // per bbox-surviving pair instead of once in the condition plus
        // once per surviving row in the projection.
        val (areaConjs, nonArea) = conjuncts.partition(isAreaThreshold)
        val (preparedConjs, otherConjs) = nonArea.partition(isPreparedPredicate)
        val ordered = (prefilter +: (otherConjs ++ preparedConjs)).reduceLeft(And)
        val areaUdfs = areaConjs
          .collect { case c => spatialUdfOf(c) }.flatten
          .foldLeft(Vector.empty[ScalaUDF]) { (acc, u) =>
            if (acc.exists(_.canonicalized == u.canonicalized)) acc else acc :+ u
          }
        val aliases = areaUdfs.map(u => Alias(u, s"${EnvPrefix.stripSuffix("env")}area")())
        val preds: Seq[Expression] = aliases.map(a =>
          GreaterThan(a.toAttribute, Literal(0.0)))
        Rewritten(Join(leftP, rightP, Inner, Some(ordered), newHint), aliases, preds)
      }
    case _ => None
  }

  /** The overlay UDF inside a recognized area-threshold conjunct. */
  private def spatialUdfOf(conjunct: Expression): Option[ScalaUDF] = conjunct match {
    case GreaterThan(u: ScalaUDF, _) if isAreaThreshold(conjunct) => Some(u)
    case LessThan(_, u: ScalaUDF) if isAreaThreshold(conjunct) => Some(u)
    case _ => None
  }

  private def eligible(j: Join): Boolean =
    j.resolved && j.joinType == Inner && j.condition.isDefined && !rewritten(j)

  /** Assemble `Filter(area > 0, Project(out :+ __graft_area, join))` when
    * area thresholds were extracted; plain restore otherwise. */
  private def assemble(j: Join, rw: Rewritten): LogicalPlan =
    if (rw.areaAliases.isEmpty) Project(j.output, rw.join)
    else Filter(rw.areaPreds.reduceLeft(And),
      Project(j.output ++ rw.areaAliases, rw.join))

  /** Session-scoped kill switch. The rewrite must be ACTIVE at the
    * optimization that feeds execution — a terminal action (`count`,
    * `write`) builds a fresh QueryExecution from the logical plan, so
    * installing the rule, forcing `optimizedPlan`, then uninstalling
    * rewrites a plan that never runs (the round-7 gate timed exactly that
    * mistake). Leaving the rule installed and toggling this flag lets a
    * caller that hand-built its own prefilter opt out deterministically
    * without a session-global install/uninstall race. */
  val EnabledKey = "spark.graft.spatialJoinRewrite"

  // transformDown so the Project-over-Join case wins before the bare-Join
  // case sees the child (transformUp would rewrite the join first and the
  // parent projection could never reuse the extracted overlay)
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else applyEnabled(plan)

  private def applyEnabled(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // a projection directly above the join (the optimized-plan shape of
    // "join, compute overlap, argmax it" after CollapseProject +
    // PushPredicateThroughJoin): substitute the extracted `__graft_area`
    // attribute for semantically-equal overlay calls in the projection, so
    // the plan carries exactly ONE overlay evaluation per surviving pair
    case p @ Project(projList, j: Join) if eligible(j) =>
      rewriteJoin(j) match {
        case None => p
        case Some(rw) if rw.areaAliases.isEmpty => p.copy(child = assemble(j, rw))
        case Some(rw) =>
          val byCanon = rw.areaAliases
            .map(a => a.child.canonicalized -> a.toAttribute).toMap
          val newList = projList.map(_.transformDown {
            case e if byCanon.contains(e.canonicalized) => byCanon(e.canonicalized)
          }.asInstanceOf[NamedExpression])
          Project(newList, assemble(j, rw))
      }
    // any other consumer: restore the join's original output above the
    // Filter so the extracted attribute never leaks into the plan schema
    case j: Join if eligible(j) =>
      rewriteJoin(j) match {
        case None => j
        case Some(rw) => Project(j.output, assemble(j, rw))
      }
  }
}

package graft

import org.scalacheck.{Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** ScalaTest ⇄ ScalaCheck bridge (SURVEY §5.3's property-based tests):
  * runs a `Prop` with a FIXED initial seed so failures reproduce across
  * runs and machines, and surfaces ScalaCheck's shrunk counterexample in
  * the assertion message. Raw ScalaCheck (declared in build.sbt) — no
  * scalatestplus adapter needed. */
object PropCheck {

  def apply(prop: Prop, minTests: Int = 200, seed: Long = 42L): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minTests)
      .withInitialSeed(Seed(seed))
    val result = SCTest.check(params, prop)
    if (!result.passed) {
      val detail = result.status match {
        case SCTest.Failed(args, labels) =>
          s"falsified with args=${args.map(_.arg).mkString("[", ", ", "]")}" +
            (if (labels.nonEmpty) s" labels=${labels.mkString(",")}" else "")
        case SCTest.PropException(args, e, _) =>
          s"threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
            s"at args=${args.map(_.arg).mkString("[", ", ", "]")}"
        case other => other.toString
      }
      throw new AssertionError(s"property failed after ${result.succeeded} passes: $detail")
    }
  }
}

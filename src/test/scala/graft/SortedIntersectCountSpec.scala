package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.plans.SortedIntersectCount

/** The triangle-count hot-loop expression: the allocation-free two-pointer
  * walk must agree with set semantics (`size(array_intersect)`) on every
  * pair of sorted-distinct arrays — generator-swept, then cross-checked
  * against Spark's own builtin through a DataFrame batch (codegen path). */
class SortedIntersectCountSpec extends SparkSpec {

  private val genSortedDistinct: org.scalacheck.Gen[Seq[Long]] = for {
    n <- org.scalacheck.Gen.choose(0, 40)
    xs <- org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.choose(0L, 60L))
  } yield xs.distinct.sorted

  test("forAll: two-pointer count == set-intersection cardinality (interpreted eval)") {
    PropCheck(org.scalacheck.Prop.forAll(genSortedDistinct, genSortedDistinct) { (a, b) =>
      val e = SortedIntersectCount(
        Literal.create(a, ArrayType(LongType, containsNull = false)),
        Literal.create(b, ArrayType(LongType, containsNull = false)))
      e.eval(InternalRow.empty) == a.toSet.intersect(b.toSet).size.toLong
    }, minTests = 500)
  }

  test("generated batch agrees with size(array_intersect) through codegen") {
    import spark.implicits._
    graft.plans.SortedIntersectCount.register(spark)
    // one DataFrame of generated pairs -> ONE Spark job exercising the
    // doGenCode path against the builtin's set semantics
    val rng = new scala.util.Random(42)
    val pairs = (1 to 300).map { _ =>
      def arr() = Seq.fill(rng.nextInt(40))(rng.nextInt(60).toLong).distinct.sorted
      (arr(), arr())
    }
    val mismatches = pairs.toDF("a", "b")
      .select(
        expr("sorted_intersect_count(a, b)").as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .filter(col("fast") =!= col("builtin"))
      .count()
    assert(mismatches == 0L)
  }
}

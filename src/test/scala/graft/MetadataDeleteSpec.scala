package graft.sources

import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.scalacheck.{Gen, Prop}

import graft.PropCheck

/** Property sweep over [[graft.sources.MetadataDelete.exactRegion]] — the
  * proof core of the metadata-only DELETE. The obligation is EXACTNESS,
  * not safety: when `exactRegion` returns a region, a row must satisfy
  * the filter conjunction IF AND ONLY IF every bounded column is non-null
  * and inside its range (an under- OR over-approximation would delete the
  * wrong rows, not just miss an optimization). The property checks the
  * equivalence against a brute-force v1-filter evaluator over random
  * conjunctions — including strict bounds at ±1 edges, Long.Min/Max
  * literals, duplicate columns intersecting, bare and accompanied
  * IsNotNull — and random rows biased toward the generated bounds. */
class MetadataDeleteSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val cols = Seq("k", "j")

  private val litGen: Gen[Long] = Gen.frequency(
    6 -> Gen.choose(-10L, 10L),
    2 -> Gen.oneOf(Long.MinValue, Long.MaxValue, Long.MinValue + 1, Long.MaxValue - 1),
    2 -> Gen.choose(Long.MinValue, Long.MaxValue))

  private val leafGen: Gen[Filter] = for {
    c <- Gen.oneOf(cols)
    v <- litGen
    f <- Gen.oneOf[Filter](
      sources.EqualTo(c, v), sources.GreaterThan(c, v),
      sources.GreaterThanOrEqual(c, v), sources.LessThan(c, v),
      sources.LessThanOrEqual(c, v), sources.IsNotNull(c))
  } yield f

  private def filtersGen: Gen[List[Filter]] = for {
    n <- Gen.choose(1, 4)
    leaves <- Gen.listOfN(n, leafGen)
    // sometimes fold a pair into an And to exercise the recursive case
    folded <- Gen.oneOf(true, false)
  } yield
    if (folded && leaves.length >= 2)
      sources.And(leaves.head, leaves(1)) :: leaves.drop(2)
    else leaves

  /** Ground truth: SQL three-valued logic collapsed to "is the row
    * selected" (NULL comparisons are not-true, i.e. not deleted). */
  private def rowMatches(f: Filter, row: Map[String, Option[Long]]): Boolean = f match {
    case sources.EqualTo(c, v)            => row(c).exists(_ == v.asInstanceOf[Long])
    case sources.GreaterThan(c, v)        => row(c).exists(_ > v.asInstanceOf[Long])
    case sources.GreaterThanOrEqual(c, v) => row(c).exists(_ >= v.asInstanceOf[Long])
    case sources.LessThan(c, v)           => row(c).exists(_ < v.asInstanceOf[Long])
    case sources.LessThanOrEqual(c, v)    => row(c).exists(_ <= v.asInstanceOf[Long])
    case sources.IsNotNull(c)             => row(c).isDefined
    case sources.And(l, r)                => rowMatches(l, row) && rowMatches(r, row)
    case other => fail(s"generator produced an unexpected filter $other")
  }

  private def rowGen(filters: Seq[Filter]): Gen[Map[String, Option[Long]]] = {
    // bias row values toward the literals in play so bound edges get hit
    def lits(f: Filter): Seq[Long] = f match {
      case sources.EqualTo(_, v: java.lang.Long)            => Seq(v)
      case sources.GreaterThan(_, v: java.lang.Long)        => Seq(v)
      case sources.GreaterThanOrEqual(_, v: java.lang.Long) => Seq(v)
      case sources.LessThan(_, v: java.lang.Long)           => Seq(v)
      case sources.LessThanOrEqual(_, v: java.lang.Long)    => Seq(v)
      case sources.And(l, r)                                => lits(l) ++ lits(r)
      case _                                                => Seq.empty
    }
    val anchors = filters.flatMap(lits) :+ 0L
    val near: Gen[Long] = for {
      a <- Gen.oneOf(anchors)
      d <- Gen.choose(-2L, 2L)
    } yield {
      val shifted = BigInt(a) + d
      if (shifted > Long.MaxValue) Long.MaxValue
      else if (shifted < Long.MinValue) Long.MinValue
      else shifted.toLong
    }
    val value: Gen[Option[Long]] = Gen.frequency(
      6 -> near.map(Some(_)), 2 -> litGen.map(Some(_)), 2 -> Gen.const(None))
    for (vs <- Gen.sequence[List[Option[Long]], Option[Long]](cols.map(_ => value).toList))
      yield cols.zip(vs).toMap
  }

  test("exactRegion is an EXACT characterization of the conjunction") {
    PropCheck(Prop.forAll(filtersGen) { filters =>
      MetadataDelete.exactRegion(filters) match {
        case None => Prop.passed // declined: no proof claimed, nothing to check
        case Some(region) =>
          Prop.forAll(rowGen(filters)) { row =>
            val byFilter = filters.forall(rowMatches(_, row))
            val byRegion = region.forall { case (c, (lo, hi)) =>
              row(c.toLowerCase).exists(v => v >= lo && v <= hi)
            }
            Prop(byFilter == byRegion) :| s"filters=$filters region=$region row=$row"
          }
      }
    }, minTests = 300)
  }

  test("shapes outside the vocabulary decline the whole proof") {
    assert(MetadataDelete.exactRegion(Seq(sources.EqualTo("k", "text"))).isEmpty)
    assert(MetadataDelete.exactRegion(Seq(
      sources.Or(sources.EqualTo("k", 1L), sources.EqualTo("k", 3L)))).isEmpty)
    assert(MetadataDelete.exactRegion(Seq(sources.IsNull("k"))).isEmpty)
    assert(MetadataDelete.exactRegion(Seq(sources.IsNotNull("k"))).isEmpty,
      "bare IsNotNull asserts 'all non-null rows' — not provable from ranges")
    // but IsNotNull alongside a real bound is absorbed exactly
    assert(MetadataDelete.exactRegion(Seq(
      sources.IsNotNull("k"), sources.LessThanOrEqual("k", 5L)))
      .contains(Map("k" -> (Long.MinValue, 5L))))
  }
}

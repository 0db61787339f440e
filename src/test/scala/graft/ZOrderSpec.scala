package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Morton-key correctness and the locality property the G4 layout gate
  * relies on. */
class ZOrderSpec extends SparkSpec {

  private def z(x: Int, y: Int): Long = {
    import spark.implicits._
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.morton(col("x"), col("y")).as("z"))
      .head().getLong(0)
  }

  test("known interleavings") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)                      // x bits on even positions
    assert(z(0, 1) == 2L)                      // y bits on odd positions
    assert(z(3, 5) == 39L)                     // 11 ⋈ 101 = 100111
    assert(z(65535, 0) == 0x55555555L)
    assert(z(0, 65535) == 0xAAAAAAAAL)
    assert(z(65535, 65535) == 0xFFFFFFFFL)     // full 32-bit key space
  }

  test("reference implementation agreement on a coordinate sweep") {
    def slowMorton(x: Int, y: Int): Long =
      (0 until 16).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1).toLong << (2 * b)) | (((y >> b) & 1).toLong << (2 * b + 1))
      }
    import spark.implicits._
    val pts = for (x <- 0 until 48 by 5; y <- 0 until 48 by 7) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == slowMorton(x, y), s"($x,$y)")
    }
  }

  test("every 4x4 block is one zkey-div-16 bucket — the locality property") {
    import spark.implicits._
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val buckets = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        (ZOrder.morton(col("x"), col("y")) / 16).cast("long").as("bucket"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    buckets.groupBy(_._3).foreach { case (_, members) =>
      assert(members.size == 16)
      val xs = members.map(_._1); val ys = members.map(_._2)
      assert(xs.max - xs.min == 3 && ys.max - ys.min == 3,
        s"bucket not a 4x4 block: $members")
    }
  }

  test("scalar morton mirrors the Column expression") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(ZOrder.morton(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pts.map { case (x, y) => ZOrder.mortonScalar(x, y) })
  }

  test("full-depth box decomposition is EXACT: intervals hold precisely the box's z-values") {
    val (xmin, xmax, ymin, ymax) = (5L, 19L, 9L, 13L)
    val ranges = ZOrder.zRangesForBox(xmin, xmax, ymin, ymax, maxRanges = Int.MaxValue)
    val inBox = (for (x <- xmin to xmax; y <- ymin to ymax)
      yield ZOrder.mortonScalar(x, y)).toSet
    // every box point is covered
    inBox.foreach(z => assert(ranges.exists(r => r._1 <= z && z <= r._2), s"uncovered z=$z"))
    // and nothing else is: total interval mass equals the box size
    val mass = ranges.map(r => r._2 - r._1 + 1).sum
    assert(mass == inBox.size.toLong,
      s"exact decomposition must not over-cover: mass=$mass box=${inBox.size}")
    // intervals are sorted and disjoint
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1, s"overlap/disorder: $a $b")
      case _ =>
    }
  }

  test("forAll: exact decomposition == brute-force z-set on generated boxes") {
    // random boxes (degenerate single-row/column/point boxes included, and
    // boxes straddling high-bit quad boundaries where the recursion splits
    // deepest) — the full-depth interval union must hold EXACTLY the box's
    // morton codes: covered, no over-coverage, sorted, disjoint
    val genBox = for {
      xmin <- org.scalacheck.Gen.frequency(
        8 -> org.scalacheck.Gen.choose(0L, 65500L),
        2 -> org.scalacheck.Gen.oneOf(0L, 32767L, 32768L, 65535L))
      ymin <- org.scalacheck.Gen.frequency(
        8 -> org.scalacheck.Gen.choose(0L, 65500L),
        2 -> org.scalacheck.Gen.oneOf(0L, 32767L, 32768L, 65535L))
      w <- org.scalacheck.Gen.choose(0L, 40L)
      h <- org.scalacheck.Gen.choose(0L, 40L)
    } yield (xmin, math.min(xmin + w, 65535L), ymin, math.min(ymin + h, 65535L))
    PropCheck(org.scalacheck.Prop.forAll(genBox) { case (xmin, xmax, ymin, ymax) =>
      val ranges = ZOrder.zRangesForBox(xmin, xmax, ymin, ymax, maxRanges = Int.MaxValue)
      val inBox = (for (x <- xmin to xmax; y <- ymin to ymax)
        yield ZOrder.mortonScalar(x, y)).toSet
      val covered = inBox.forall(z => ranges.exists(r => r._1 <= z && z <= r._2))
      val mass = ranges.map(r => r._2 - r._1 + 1).sum
      val sortedDisjoint = ranges.sliding(2).forall {
        case Seq(a, b) => a._2 < b._1
        case _ => true
      }
      covered && mass == inBox.size.toLong && sortedDisjoint
    }, minTests = 150)
  }

  test("forAll: coarsened decomposition stays a sorted superset within any cap") {
    val genCase = for {
      xmin <- org.scalacheck.Gen.choose(0L, 65000L)
      ymin <- org.scalacheck.Gen.choose(0L, 65000L)
      w <- org.scalacheck.Gen.choose(0L, 300L)
      h <- org.scalacheck.Gen.choose(0L, 300L)
      cap <- org.scalacheck.Gen.choose(1, 16)
    } yield (xmin, math.min(xmin + w, 65535L), ymin, math.min(ymin + h, 65535L), cap)
    PropCheck(org.scalacheck.Prop.forAll(genCase) { case (xmin, xmax, ymin, ymax, cap) =>
      val exact = ZOrder.zRangesForBox(xmin, xmax, ymin, ymax, maxRanges = Int.MaxValue)
      val coarse = ZOrder.zRangesForBox(xmin, xmax, ymin, ymax, maxRanges = cap)
      coarse.length <= cap &&
        exact.forall(e => coarse.exists(c => c._1 <= e._1 && e._2 <= c._2)) &&
        coarse.sliding(2).forall {
          case Seq(a, b) => a._2 < b._1
          case _ => true
        }
    }, minTests = 150)
  }

  test("budget-coarsened decomposition is a superset within the range cap") {
    val (xmin, xmax, ymin, ymax) = (100L, 180L, 200L, 260L)
    val exact = ZOrder.zRangesForBox(xmin, xmax, ymin, ymax, maxRanges = Int.MaxValue)
    val coarse = ZOrder.zRangesForBox(xmin, xmax, ymin, ymax, maxRanges = 8)
    assert(coarse.length <= 8, s"cap violated: ${coarse.length}")
    assert(coarse.length < exact.length, "coarsening should reduce the interval count")
    // superset: every exact interval lies inside some coarse interval
    exact.foreach { e =>
      assert(coarse.exists(c => c._1 <= e._1 && e._2 <= c._2),
        s"exact interval $e escaped the coarse cover")
    }
  }

  // ------------------------------------------------------------ 3-D (tl34)
  test("3-D morton: Column and scalar forms agree; 2-D stays bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y", "w")
      .select(ZOrder.mortonN(Seq(col("x"), col("y"), col("w"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pts.map { case (x, y, w) => ZOrder.mortonScalarN(Seq(x, y, w)) })
    // every 3-D zkey stays in the positive 48-bit range
    assert(got.forall(z => z >= 0L && z < (1L << 48)))
    // bit-by-bit reference: dimension d's bit b lands at position 3b+d
    def slow(x: Long, y: Long, w: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (3 * b)) |
          (((y >> b) & 1L) << (3 * b + 1)) | (((w >> b) & 1L) << (3 * b + 2))
      }
    pts.foreach { case (x, y, w) =>
      assert(ZOrder.mortonScalarN(Seq(x, y, w)) == slow(x, y, w)) }
    // 2-D through the N form == the classic pairwise form
    pts.foreach { case (x, y, _) =>
      assert(ZOrder.mortonScalarN(Seq(x, y)) == ZOrder.mortonScalar(x, y)) }
  }

  test("3-D box decomposition: cover is exact-or-superset, never misses") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 60) {
      val lo = Seq.fill(3)(rnd.nextInt(200).toLong)
      val box = lo.map(l => (l, l + rnd.nextInt(24).toLong))
      val ivs = ZOrder.zRangesForBoxN(box, maxRanges = Int.MaxValue)
      // sorted, disjoint
      assert(ivs.sliding(2).forall {
        case Seq(a, b) => a._2 < b._1
        case _ => true
      })
      // brute force: every point's zkey is covered (no false skips), and
      // for these small boxes the cover is EXACT (no point outside the
      // box lands in any interval — full-depth descent)
      val inside = for {
        x <- box(0)._1 to box(0)._2
        y <- box(1)._1 to box(1)._2
        w <- box(2)._1 to box(2)._2
      } yield ZOrder.mortonScalarN(Seq(x, y, w))
      val insideSet = inside.toSet
      assert(insideSet.forall(z => ivs.exists(iv => iv._1 <= z && z <= iv._2)),
        s"a box point escaped the cover: $box")
      val covered = ivs.map(iv => iv._2 - iv._1 + 1).sum
      assert(covered == insideSet.size.toLong,
        s"small-box cover must be exact: covered $covered vs ${insideSet.size}")
    }
  }

  test("a huge 3-D box stays bounded (adaptive descent floor, still a superset)") {
    val box = Seq((0L, 60000L), (0L, 60000L), (0L, 60000L))
    val ivs = ZOrder.zRangesForBoxN(box, maxRanges = 64)
    assert(ivs.length <= 64)
    // spot-check coverage of random interior points
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 500) {
      val p = Seq.fill(3)(rnd.nextInt(60001).toLong)
      val z = ZOrder.mortonScalarN(p)
      assert(ivs.exists(iv => iv._1 <= z && z <= iv._2), s"point $p escaped")
    }
  }

  test("4+ dimensions refuse loudly with the documented reason") {
    val e = intercept[RuntimeException] {
      ZOrder.mortonScalarN(Seq(1L, 2L, 3L, 4L))
    }
    assert(e.getMessage.contains("2 or 3 dimensions") &&
      e.getMessage.contains("sign bit"), e.getMessage)
    val e2 = intercept[RuntimeException] {
      ZOrder.zRangesForBoxN(Seq((0L, 1L), (0L, 1L), (0L, 1L), (0L, 1L)))
    }
    assert(e2.getMessage.contains("2 or 3 dimensions"), e2.getMessage)
  }
}

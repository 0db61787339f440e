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
}

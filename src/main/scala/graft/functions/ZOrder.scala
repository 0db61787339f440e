package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for spatial data layout.
  *
  * At 100 TB the dominant spatial-join cost is how tiles are laid out in
  * storage: sorting/range-partitioning a tile table by Morton key puts
  * spatial neighbors in the same Parquet files, so a bbox predicate prunes
  * to a handful of files and a grid-bucketed join (`j8_grid_join`) reads
  * co-located partitions (the technique behind Delta/Iceberg Z-ORDER
  * clustering, public since the DB classic by Orenstein & Merrett 1984).
  *
  * The interleave is the classic masked-shift bit spread — plain 64-bit
  * integer arithmetic, codegen-friendly, and bit-identical in any engine,
  * so the oracle replays it verbatim ([[spreadSqlCtes]] renders the same
  * steps as SQL). Inputs are grid coordinates in [0, 2^16).
  */
object ZOrder {

  private val Masks = Seq(
    (8, 0x00FF00FFL),
    (4, 0x0F0F0F0FL),
    (2, 0x33333333L),
    (1, 0x55555555L))

  /** Spreads the low 16 bits of `c` so bit i lands at even position 2i. */
  def spread16(c: Column): Column =
    Masks.foldLeft(c.cast("long")) { case (s, (sh, mask)) =>
      (s.bitwiseOR(shiftleft(s, sh))).bitwiseAND(lit(mask))
    }

  /** Morton key: x bits on even positions, y bits on odd. */
  def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Scalar mirror of [[spread16]] (same masked shifts, plain Scala). */
  private def spreadScalar(v: Long): Long =
    Masks.foldLeft(v & 0xFFFFL) { case (s, (sh, mask)) => (s | (s << sh)) & mask }

  /** Scalar mirror of [[morton]]; agreement with the Column form is
    * spec-pinned. */
  def mortonScalar(x: Long, y: Long): Long =
    spreadScalar(x) | (spreadScalar(y) << 1)

  /** Z-order range decomposition: the set of zkey intervals covering the
    * axis-aligned box `[xmin..xmax] x [ymin..ymax]` (inclusive, 16-bit
    * coords) — the missing half of Z-ORDER clustering. The layout makes
    * neighbors contiguous in zkey; THIS turns a 2-D box predicate into a
    * short list of 1-D zkey ranges that drive interval indexes (the
    * commit log's zone maps, parquet min/max, any sorted layout), the
    * Tropf–Herzog (BIGMIN) query technique expressed as quadtree descent:
    * recurse the z-space quadtree, emit fully-covered cells as whole
    * intervals (an aligned quad cell is CONTIGUOUS in zkey), split
    * partially-covered ones, then merge zkey-adjacent results. At full
    * depth the decomposition is EXACT — the union of intervals contains
    * precisely the box's z-values. `maxRanges` then coarsens by bridging
    * the smallest inter-interval gaps (over-approximation: still a
    * superset, so pruning stays CORRECT and the residual row filter does
    * the rest — the same contract as every other prefilter here). */
  def zRangesForBox(xmin: Long, xmax: Long, ymin: Long, ymax: Long,
                    maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(0 <= xmin && xmin <= xmax && xmax < 65536 &&
      0 <= ymin && ymin <= ymax && ymax < 65536, "16-bit box required")
    require(maxRanges >= 1, "need at least one range")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // children visited in (x, y) bit order = ascending zkey, so `out`
    // is emitted sorted
    def go(cx: Long, cy: Long, level: Int): Unit = {
      val x0 = cx << level; val x1 = x0 + (1L << level) - 1
      val y0 = cy << level; val y1 = y0 + (1L << level) - 1
      if (x1 < xmin || x0 > xmax || y1 < ymin || y0 > ymax) ()
      else if (x0 >= xmin && x1 <= xmax && y0 >= ymin && y1 <= ymax) {
        val z0 = mortonScalar(x0, y0)
        out += ((z0, z0 + (1L << (2 * level)) - 1))
      } else {
        val l = level - 1
        go(cx * 2, cy * 2, l); go(cx * 2 + 1, cy * 2, l)
        go(cx * 2, cy * 2 + 1, l); go(cx * 2 + 1, cy * 2 + 1, l)
      }
    }
    go(0, 0, 16)
    // merge zkey-adjacent intervals (free: no over-coverage added)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out.foreach { iv =>
      if (merged.nonEmpty && iv._1 <= merged.last._2 + 1) {
        val last = merged.remove(merged.length - 1)
        merged += ((last._1, math.max(last._2, iv._2)))
      } else merged += iv
    }
    // coarsen to the budget by bridging the smallest gap each time
    // (leftmost on ties — deterministic)
    while (merged.length > maxRanges) {
      var best = 1; var bestGap = Long.MaxValue
      var i = 1
      while (i < merged.length) {
        val gap = merged(i)._1 - merged(i - 1)._2
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val a = merged(best - 1); val b = merged(best)
      merged.remove(best)
      merged(best - 1) = (a._1, b._2)
    }
    merged.toSeq
  }

  /** The same spread pipeline as DuckDB SQL: CTE chunks deriving
    * `<out>` from `<in>` via columns `<out>_s1.._s3`; used inline in a
    * SELECT as nested expressions would be unreadable, so this renders
    * sequential CTE stages over relation `src` carrying `carry` columns. */
  def mortonSqlCtes(src: String, carry: Seq[String],
                    xCol: String, yCol: String, out: String): String = {
    def step(in: String, sh: Int, mask: Long, alias: String) =
      s"($in | ($in << $sh)) & $mask AS $alias"
    val stages = Masks.zipWithIndex.map { case ((sh, mask), i) =>
      val inX = if (i == 0) xCol else s"xs$i"
      val inY = if (i == 0) yCol else s"ys$i"
      s"""z${i + 1} AS (SELECT ${(carry :+ xCol :+ yCol).mkString(", ")},
         |  ${step(inX, sh, mask, s"xs${i + 1}")},
         |  ${step(inY, sh, mask, s"ys${i + 1}")}
         |  FROM ${if (i == 0) src else s"z$i"})""".stripMargin
    }
    (stages :+
      s"""zf AS (SELECT ${(carry :+ xCol :+ yCol).mkString(", ")},
         |  xs4 | (ys4 << 1) AS $out FROM z4)""".stripMargin).mkString(",\n")
  }
}

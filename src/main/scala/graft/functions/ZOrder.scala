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

  // ---------------------------------------------------------------- n-dim
  /** 3-way bit spread (bit i → position 3i) for 16-bit inputs — the
    * standard 64-bit masked-shift sequence (valid through 21-bit
    * inputs). */
  private val Masks3 = Seq(
    (32, 0x1F00000000FFFFL),
    (16, 0x1F0000FF0000FFL),
    (8, 0x100F00F00F00F00FL),
    (4, 0x10C30C30C30C30C3L),
    (2, 0x1249249249249249L))

  private def steps(dims: Int): Seq[(Int, Long)] = dims match {
    case 2 => Masks
    case 3 => Masks3
    case d => sys.error(s"z-order supports 2 or 3 dimensions, got $d: at 16 " +
      "bits per coordinate a 4th dimension would need the sign bit of the " +
      "64-bit zkey (zone ranges compare SIGNED) — reduce dimensions or " +
      "quantize coarser")
  }

  /** Spreads the low 16 bits of `c` so bit i lands at position `dims`*i. */
  def spreadN(c: Column, dims: Int): Column =
    steps(dims).foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (s, (sh, mask)) => (s.bitwiseOR(shiftleft(s, sh))).bitwiseAND(lit(mask))
    }

  private def spreadScalarN(v: Long, dims: Int): Long =
    steps(dims).foldLeft(v & 0xFFFFL) { case (s, (sh, mask)) => (s | (s << sh)) & mask }

  /** n-dimensional Morton key: dimension d's bits land at positions
    * d, d+n, d+2n, … — 2-D is bit-identical to [[morton]]. */
  def mortonN(cols: Seq[Column]): Column = {
    val n = cols.length
    steps(n) // validates the dimension count loudly
    cols.zipWithIndex.map { case (c, d) => shiftleft(spreadN(c, n), d) }
      .reduce(_ bitwiseOR _)
  }

  /** Scalar mirror of [[mortonN]]; agreement is spec-pinned. */
  def mortonScalarN(coords: Seq[Long]): Long = {
    val n = coords.length
    steps(n)
    coords.zipWithIndex.map { case (v, d) => spreadScalarN(v, n) << d }
      .reduce(_ | _)
  }

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
                    maxRanges: Int = 64): Seq[(Long, Long)] =
    zRangesForBoxN(Seq((xmin, xmax), (ymin, ymax)), maxRanges)

  /** n-dimensional form of [[zRangesForBox]]: the zkey intervals covering
    * an axis-aligned box in 2 or 3 (16-bit) dimensions — the same
    * 2^n-tree descent (emit fully-covered cells, split partial ones),
    * children visited in ascending-zkey order, merged and coarsened to
    * `maxRanges` by bridging the smallest gaps (always a SUPERSET, so
    * pruning stays correct). */
  def zRangesForBoxN(bounds: Seq[(Long, Long)],
                     maxRanges: Int = 64): Seq[(Long, Long)] = {
    val n = bounds.length
    steps(n) // validates the dimension count loudly
    bounds.foreach { case (lo, hi) =>
      require(0 <= lo && lo <= hi && hi < 65536, s"16-bit box required: [$lo, $hi]")
    }
    require(maxRanges >= 1, "need at least one range")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // Descent floor: partially-covered cells live on the box SURFACE, and
    // in 3-D a full-depth descent of a large box would emit O(side²)
    // intervals before coarsening could act. Stop splitting at the
    // smallest level whose estimated boundary-cell count fits the budget
    // and emit those partial cells WHOLE — an over-approximation, so the
    // cover stays a superset (pruning stays correct) and the interval
    // count stays bounded at any box size. Small boxes get level 0 =
    // the exact decomposition.
    val budget = math.max(4096.0, 4.0 * maxRanges)
    def boundaryEstimate(level: Int): Double = {
      val sides = bounds.map { case (lo, hi) =>
        math.max(1.0, (hi - lo + 1).toDouble / (1L << level)) }
      2.0 * sides.indices.map(d =>
        sides.indices.filterNot(_ == d).map(sides).product).sum + (1 << n)
    }
    val stopLevel = (0 to 16).find(l => boundaryEstimate(l) <= budget).getOrElse(16)
    // children visited in ascending child-index order c, where dimension
    // d contributes bit d of c — exactly ascending zkey (dimension d's
    // bits sit at positions d, d+n, …), so `out` is emitted sorted
    def go(cell: Array[Long], level: Int): Unit = {
      val lo = cell.map(_ << level)
      val hi = lo.map(_ + (1L << level) - 1)
      val disjoint = bounds.indices.exists(d =>
        hi(d) < bounds(d)._1 || lo(d) > bounds(d)._2)
      if (disjoint) ()
      else if (level <= stopLevel || bounds.indices.forall(d =>
          lo(d) >= bounds(d)._1 && hi(d) <= bounds(d)._2)) {
        val z0 = mortonScalarN(lo.toIndexedSeq)
        out += ((z0, z0 + (1L << (n * level)) - 1))
      } else {
        val l = level - 1
        var c = 0
        while (c < (1 << n)) {
          go(Array.tabulate(n)(d => cell(d) * 2 + ((c >> d) & 1)), l)
          c += 1
        }
      }
    }
    go(Array.fill(n)(0L), 16)
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

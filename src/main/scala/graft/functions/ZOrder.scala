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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression library re-expressing the reference's string/path/bbox
  * scalar logic as codegen-friendly Catalyst expressions (no UDFs).
  *
  * Reference sites: URL path parsing `src/az_proc.py:236-243`, URL build
  * `src/az_proc.py:255-266,304-336`, tile/chip name grammar
  * `src/form_calcs.py:146-162,496-498`, bbox clamp `src/form_calcs.py:686-694`,
  * label map `src/form_calcs.py:322-334`, box-similarity predicate
  * `src/form_calcs.py:716-750`, diameter `src/form_calcs.py:795-809`.
  */
object ColumnOps {

  // ---------------------------------------------------------------- P1: URL path parse
  /** Split a blob URL `.../v002/al/2021/al_60cm_2021/30085/m_3008501_ne_16_060_20211203.tif`
    * into its catalog columns (ref `src/az_proc.py:236-243`). */
  def parseTileUrl(url: Column): Array[(String, Column)] = {
    val parts = split(url, "/")
    Array(
      "version"        -> element_at(parts, -6),
      "state"          -> element_at(parts, -5),
      "year"           -> element_at(parts, -4).cast("int"),
      "state_res_year" -> element_at(parts, -3),
      "quad"           -> element_at(parts, -2),
      "tile_name"      -> regexp_replace(element_at(parts, -1), "\\.tif$", ""),
      "resolution"     -> regexp_extract(element_at(parts, -3), "_(\\d*cm)_", 1)
    )
  }

  // ---------------------------------------------------------------- P3: chip-name grammar
  /** chip `tile_05_07` -> tile name (everything before the trailing `_row_col`);
    * ref `src/form_calcs.py:146-162` (`rsplit("_", 2)`). */
  def chipToTile(chip: Column): Column =
    regexp_replace(chip, "_\\d+_\\d+$", "")

  /** chip -> grid row index (second-to-last `_NN`); ref `src/form_calcs.py:496-498`. */
  def chipRow(chip: Column): Column =
    regexp_extract(chip, "_(\\d+)_(\\d+)$", 1).cast("int")

  /** chip -> grid col index (last `_NN`). */
  def chipCol(chip: Column): Column =
    regexp_extract(chip, "_(\\d+)_(\\d+)$", 2).cast("int")

  /** tile name chars [2,12) = quad id; ref `tile-level-annotation.py:98`. */
  def quadId(tile: Column): Column = substring(tile, 3, 10)

  /** trailing `_YYYYMMDD` = capture date; ref `tile-level-annotation.py:99`. */
  def captureDate(tile: Column): Column =
    to_date(substring_index(tile, "_", -1), "yyyyMMdd")

  /** zero-padded 2-digit grid index `f"{i:02}"`; ref `src/az_proc.py:522`. */
  def pad2(i: Column): Column = lpad(i.cast("string"), 2, "0")

  /** chip name from tile + grid position; ref `src/az_proc.py:517-525`. */
  def chipName(tile: Column, row: Column, col: Column): Column =
    concat_ws("_", tile, pad2(row), pad2(col))

  // ---------------------------------------------------------------- P12: label standardization
  /** The reference's misspelling->canonical map, verbatim from
    * `src/form_calcs.py:322-334`; unknown labels route to `undefined_object`
    * instead of raising (intended-semantics divergence, SURVEY.md §2.11.5). */
  val labelMap: Map[String, String] = Map(
    "closed_roof_tank"         -> "closed_roof_tank",
    "closed_roof_tanks"        -> "closed_roof_tank",
    "closed roof tank"         -> "closed_roof_tank",
    "narrow_closed_roof_tank"  -> "narrow_closed_roof_tank",
    "narrow_closed_roof_tanks" -> "narrow_closed_roof_tank",
    "external_floating_roof_tank"  -> "external_floating_roof_tank",
    "external_floating_roof_tanks" -> "external_floating_roof_tank",
    "external floating roof tank"  -> "external_floating_roof_tank",
    "sedimentation_tank"       -> "sedimentation_tank",
    "sedimentation_tanks"      -> "sedimentation_tank",
    "water_treatment_tank"     -> "water_treatment_tank",
    "water_treatment_tanks"    -> "water_treatment_tank",
    "water_tower"              -> "water_tower",
    "water_towers"             -> "water_tower",
    "spherical_tank"           -> "spherical_tank",
    "spherical_tanks"          -> "spherical_tank",
    "undefined_object"         -> "undefined_object"
  )

  val canonicalClasses: Seq[String] = Seq(
    "closed_roof_tank", "narrow_closed_roof_tank", "external_floating_roof_tank",
    "sedimentation_tank", "water_treatment_tank", "water_tower", "spherical_tank")

  /** Normalize a raw label column via a constant-foldable CASE chain. */
  def standardizeLabel(raw: Column): Column =
    labelMap.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(lower(trim(raw)) === k, lit(v)).otherwise(acc)
    } match {
      case c => coalesce(c, lit("undefined_object"))
    }

  // ---------------------------------------------------------------- P10/G3: bbox math
  /** Clamp a coordinate into [0, limit]; ref `src/form_calcs.py:686-694` plus
    * the >=0 clamp the reference omits (SURVEY.md §2.11.4). */
  def clamp(c: Column, limit: Column): Column = greatest(lit(0), least(c, limit))

  /** Translate a chip-frame x/y into the tile frame: + 512 * grid index
    * (ref `src/form_calcs.py:672-685`). */
  def toTileFrame(px: Column, gridIdx: Column): Column = px + gridIdx * lit(512)

  /** Tank diameter in metres = min(w, h) * resolution (0.6 m);
    * ref `src/form_calcs.py:795-809`. */
  def diameter(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
               metresPerPx: Double = 0.6): Column =
    least(xmax - xmin, ymax - ymin) * lit(metresPerPx)

  // ---------------------------------------------------------------- J10: calc_sim predicate
  /** Box-pair merge predicate, re-expressed from `src/form_calcs.py:716-750`:
    * containment in either direction, OR a gap of <= `gap` px on one axis while
    * the other axis' interval covers the counterpart's.
    * Pure column arithmetic -> usable in a self-join or inside per-tile merge. */
  def boxesSimilar(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
                   bx1: Column, by1: Column, bx2: Column, by2: Column,
                   gap: Int = 5): Column = {
    val aContainsB = ax1 <= bx1 && ay1 <= by1 && ax2 >= bx2 && ay2 >= by2
    val bContainsA = bx1 <= ax1 && by1 <= ay1 && bx2 >= ax2 && by2 >= ay2
    // horizontal adjacency: x-intervals within `gap` px, y-interval covers
    val xGap = greatest(ax1, bx1) - least(ax2, bx2)
    val yGap = greatest(ay1, by1) - least(ay2, by2)
    val yCovers = (ay1 <= by1 && ay2 >= by2) || (by1 <= ay1 && by2 >= ay2)
    val xCovers = (ax1 <= bx1 && ax2 >= bx2) || (bx1 <= ax1 && bx2 >= ax2)
    aContainsB || bContainsA ||
      (xGap <= gap && yCovers) || (yGap <= gap && xCovers)
  }

  // ---------------------------------------------------------------- rect geometry
  /** Intersection area of two axis-aligned rectangles (0 when disjoint);
    * re-expresses `intersection(..).area` for the bbox case
    * (ref `src/form_calcs.py:1011-1024`). */
  def rectOverlapArea(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
                      bx1: Column, by1: Column, bx2: Column, by2: Column): Column =
    greatest(lit(0.0), least(ax2, bx2) - greatest(ax1, bx1)) *
      greatest(lit(0.0), least(ay2, by2) - greatest(ay1, by1))

  /** Point-in-rect containment (ref `src/az_proc.py:169-182` rtree+contains). */
  def pointInRect(px: Column, py: Column,
                  x1: Column, y1: Column, x2: Column, y2: Column): Column =
    px >= x1 && px <= x2 && py >= y1 && py <= y2
}

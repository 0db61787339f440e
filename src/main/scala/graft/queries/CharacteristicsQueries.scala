package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoPortable
import graft.io.Tables

/** D4 — the two characteristics tables the reference assembles while
  * chipping tiles (`src/form_calcs.py:528-543`): a 13-column per-tile table
  * and a 17-column per-chip ("image") table, each carrying pixel geometry,
  * UTM corner coordinates, and WGS84 corner coordinates.
  *
  * Tile geometry mirrors the S8/G1 synthetic fixtures (same height/width/
  * band formulas), on a 5x5 UTM zone-16 grid. Every UTM column is exact
  * integer-times-0.6 arithmetic and every lat/lon column goes through the
  * portable kernel, so the DuckDB oracle reproduces all 13/17 columns
  * bit-for-bit — including both corners' WGS84 coordinates (NW + SE
  * stacked transforms with distinct column prefixes).
  */
object CharacteristicsQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ shared tile frame
  /** (n, tile_name, tile_height, tile_width, tile_bands, zone, nw/se UTM).
    *
    * The UTM zone is PER TILE (the same n%3 split the S8 GeoTIFF fixtures
    * encode in their GeoKeyDirectory) — the reference reads each raster's
    * CRS from the file (`form_calcs.py:279-287`), so a second zone in the
    * corpus must flow through the projection string AND the WGS84 inverse
    * transform, not be assumed constant. */
  private def tiles(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(
      col("n_nationkey").as("n"),
      concat(lit("tile_"), col("n_nationkey")).as("tile_name"),
      (lit(5000) + col("n_nationkey") * 613 % 3000).cast("int").as("tile_height"),
      (lit(6000) + col("n_nationkey") * 389 % 2600).cast("int").as("tile_width"),
      when(col("n_nationkey") % 2 === 0, 3).otherwise(4).as("tile_bands"),
      when(col("n_nationkey") % 3 === 0, 17).otherwise(16).as("zone"))
      .withColumn("nw_x", (lit(300000) + (col("n") % 5) * 5000).cast("double"))
      .withColumn("nw_y", (lit(3600000) + floor(col("n") / 5) * 5000).cast("double"))
      .withColumn("se_x", col("nw_x") + col("tile_width") * 0.6)
      .withColumn("se_y", col("nw_y") - col("tile_height") * 0.6)

  private def projCol = concat(lit("EPSG:326"), col("zone"))
  private val projSql = "'EPSG:326' || CAST(zone AS VARCHAR)"

  private val tilesSql =
    """tiles AS (
      |  SELECT n_nationkey AS n,
      |    'tile_' || CAST(n_nationkey AS VARCHAR) AS tile_name,
      |    CAST(5000 + n_nationkey * 613 % 3000 AS INTEGER) AS tile_height,
      |    CAST(6000 + n_nationkey * 389 % 2600 AS INTEGER) AS tile_width,
      |    CASE WHEN n_nationkey % 2 = 0 THEN 3 ELSE 4 END AS tile_bands,
      |    CASE WHEN n_nationkey % 3 = 0 THEN 17 ELSE 16 END AS zone,
      |    CAST(300000 + (n_nationkey % 5) * 5000 AS DOUBLE) AS nw_x,
      |    CAST(3600000 + (n_nationkey // 5) * 5000 AS DOUBLE) AS nw_y
      |  FROM nation),
      |tiles2 AS (
      |  SELECT *, nw_x + tile_width * CAST(0.6 AS DOUBLE) AS se_x,
      |    nw_y - tile_height * CAST(0.6 AS DOUBLE) AS se_y
      |  FROM tiles)""".stripMargin

  // ------------------------------------------------------------------ D4a: tile characteristics (13 cols)
  private val d4TileChars: Q = (spark, dir) => {
    graft.plans.GeoFunctions.register(spark)
    val t = tiles(spark, dir)
      .withColumn("nw_lat", expr("utm_lat(nw_x, nw_y, zone)"))
      .withColumn("nw_lon", expr("utm_lon(nw_x, nw_y, zone)"))
      .withColumn("se_lat", expr("utm_lat(se_x, se_y, zone)"))
      .withColumn("se_lon", expr("utm_lon(se_x, se_y, zone)"))
    t.select(
      col("tile_name"), col("tile_height"), col("tile_width"), col("tile_bands"),
      col("zone").as("utm_zone"), projCol.as("utm_projection"),
      col("nw_x").as("nw_x_utm_tile_coord"), col("nw_y").as("nw_y_utm_tile_coord"),
      col("se_x").as("se_x_utm_tile_coord"), col("se_y").as("se_y_utm_tile_coord"),
      col("nw_lat").as("nw_lat_tile_coord"), col("nw_lon").as("nw_lon_tile_coord"),
      col("se_lat").as("se_lat_tile_coord"), col("se_lon").as("se_lon_tile_coord"))
      .orderBy("tile_name")
  }

  private val d4TileCharsSql = {
    val nw = GeoPortable.inverseSql("SELECT * FROM tiles2", "nw_x", "nw_y", "zone", "nwp")
    val both = GeoPortable.inverseSql(nw, "se_x", "se_y", "zone", "sep")
    s"""WITH $tilesSql
       |SELECT tile_name, tile_height, tile_width, tile_bands,
       |  zone AS utm_zone, $projSql AS utm_projection,
       |  nw_x AS nw_x_utm_tile_coord, nw_y AS nw_y_utm_tile_coord,
       |  se_x AS se_x_utm_tile_coord, se_y AS se_y_utm_tile_coord,
       |  nwp_lat AS nw_lat_tile_coord, nwp_lon AS nw_lon_tile_coord,
       |  sep_lat AS se_lat_tile_coord, sep_lon AS se_lon_tile_coord
       |FROM ($both)
       |ORDER BY tile_name""".stripMargin
  }

  // ------------------------------------------------------------------ D4b: image characteristics (17 cols)
  private val d4ImageChars: Q = (spark, dir) => {
    graft.plans.GeoFunctions.register(spark)
    val chips = tiles(spark, dir)
      .withColumn("row_index",
        explode(sequence(lit(0), ceil(col("tile_height") / lit(512.0)).cast("int") - 1)))
      .withColumn("col_index",
        explode(sequence(lit(0), ceil(col("tile_width") / lit(512.0)).cast("int") - 1)))
      .withColumn("nw_x_px", col("col_index") * 512)
      .withColumn("nw_y_px", col("row_index") * 512)
      .withColumn("se_x_px", least((col("col_index") + 1) * 512, col("tile_width")))
      .withColumn("se_y_px", least((col("row_index") + 1) * 512, col("tile_height")))
      .withColumn("nw_x_img", col("nw_x") + col("nw_x_px") * 0.6)
      .withColumn("nw_y_img", col("nw_y") - col("nw_y_px") * 0.6)
      .withColumn("se_x_img", col("nw_x") + col("se_x_px") * 0.6)
      .withColumn("se_y_img", col("nw_y") - col("se_y_px") * 0.6)
      .withColumn("nw_lat", expr("utm_lat(nw_x_img, nw_y_img, zone)"))
      .withColumn("nw_lon", expr("utm_lon(nw_x_img, nw_y_img, zone)"))
      .withColumn("se_lat", expr("utm_lat(se_x_img, se_y_img, zone)"))
      .withColumn("se_lon", expr("utm_lon(se_x_img, se_y_img, zone)"))
    chips.select(
      concat(col("tile_name"), lit("_"), col("row_index"), lit("_"), col("col_index"))
        .as("image_name"),
      col("tile_name"), col("row_index"), col("col_index"),
      col("nw_x_px").as("nw_x_pixel_image_coord"), col("nw_y_px").as("nw_y_pixel_image_coord"),
      col("se_x_px").as("se_x_pixel_image_coord"), col("se_y_px").as("se_y_pixel_image_coord"),
      col("zone").as("utm_zone"), projCol.as("utm_projection"),
      col("nw_x_img").as("nw_x_utm_image_coord"), col("nw_y_img").as("nw_y_utm_image_coord"),
      col("se_x_img").as("se_x_utm_image_coord"), col("se_y_img").as("se_y_utm_image_coord"),
      col("nw_lat").as("nw_lat_image_coord"), col("nw_lon").as("nw_lon_image_coord"),
      col("se_lat").as("se_lat_image_coord"), col("se_lon").as("se_lon_image_coord"))
      .orderBy("image_name")
  }

  private val d4ImageCharsSql = {
    val chipsSql =
      s"""WITH $tilesSql,
         |chips AS (
         |  SELECT t.*, CAST(r.r AS INTEGER) AS row_index, CAST(c.c AS INTEGER) AS col_index,
         |    CAST(c.c * 512 AS INTEGER) AS nw_x_px,
         |    CAST(r.r * 512 AS INTEGER) AS nw_y_px,
         |    CAST(least((c.c + 1) * 512, tile_width) AS INTEGER) AS se_x_px,
         |    CAST(least((r.r + 1) * 512, tile_height) AS INTEGER) AS se_y_px
         |  FROM tiles2 t, generate_series(0, 31) r(r), generate_series(0, 31) c(c)
         |  WHERE r.r < CAST(ceil(tile_height / 512.0) AS INTEGER)
         |    AND c.c < CAST(ceil(tile_width / 512.0) AS INTEGER)),
         |chips2 AS (
         |  SELECT *,
         |    nw_x + nw_x_px * CAST(0.6 AS DOUBLE) AS nw_x_img,
         |    nw_y - nw_y_px * CAST(0.6 AS DOUBLE) AS nw_y_img,
         |    nw_x + se_x_px * CAST(0.6 AS DOUBLE) AS se_x_img,
         |    nw_y - se_y_px * CAST(0.6 AS DOUBLE) AS se_y_img
         |  FROM chips)
         |SELECT * FROM chips2""".stripMargin
    val nw = GeoPortable.inverseSql(chipsSql, "nw_x_img", "nw_y_img", "zone", "nwp")
    val both = GeoPortable.inverseSql(nw, "se_x_img", "se_y_img", "zone", "sep")
    s"""SELECT
       |  tile_name || '_' || CAST(row_index AS VARCHAR) || '_' || CAST(col_index AS VARCHAR) AS image_name,
       |  tile_name, row_index, col_index,
       |  nw_x_px AS nw_x_pixel_image_coord, nw_y_px AS nw_y_pixel_image_coord,
       |  se_x_px AS se_x_pixel_image_coord, se_y_px AS se_y_pixel_image_coord,
       |  zone AS utm_zone, $projSql AS utm_projection,
       |  nw_x_img AS nw_x_utm_image_coord, nw_y_img AS nw_y_utm_image_coord,
       |  se_x_img AS se_x_utm_image_coord, se_y_img AS se_y_utm_image_coord,
       |  nwp_lat AS nw_lat_image_coord, nwp_lon AS nw_lon_image_coord,
       |  sep_lat AS se_lat_image_coord, sep_lon AS se_lon_image_coord
       |FROM ($both)
       |ORDER BY image_name""".stripMargin
  }

  // ------------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "d4_tile_chars" -> d4TileChars,
    "d4_image_chars" -> d4ImageChars)

  val oracle: Map[String, String] = Map(
    "d4_tile_chars" -> d4TileCharsSql,
    "d4_image_chars" -> d4ImageCharsSql)
}

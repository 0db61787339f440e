package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.functions.ColumnOps

/** Label-cleaning, string-scalar, and generator/translation operators
  * (SURVEY.md §2.2 P11–P14, §2.7 string family, §2.8 G2/G3).
  * The oracle CASE chain for label standardization is *generated from the
  * same Scala map* the Spark expression uses, so the two can never drift. */
object LabelGeomQueries {

  type Q = (SparkSession, String) => DataFrame

  // deterministic misspelling feed: known variants + one unknown, indexed by key
  private val variants: Seq[String] =
    ColumnOps.labelMap.keys.toSeq.sorted :+ "mystery_tank"

  // ------------------------------------------------------------------ P12: label standardization
  /** Dictionary-normalize label variants -> 7 canonical classes; unknowns
    * route to undefined_object (`src/form_calcs.py:315-351`, divergence
    * SURVEY.md §2.11.5). */
  private val p12LabelStandardize: Q = (spark, dir) => {
    val p = Tables.part(spark, dir)
    val arr = array(variants.map(lit): _*)
    p.select(col("p_partkey"),
        element_at(arr, (col("p_partkey") % variants.length).cast("int") + 1).as("raw_label"))
      .withColumn("object_class", ColumnOps.standardizeLabel(col("raw_label")))
      .orderBy("p_partkey")
  }

  private val p12LabelStandardizeSql = {
    val list = variants.map(v => s"'$v'").mkString("[", ", ", "]")
    val cases = ColumnOps.labelMap.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN lower(trim(raw_label)) = '$k' THEN '$v'" }
      .mkString("\n    ")
    s"""WITH feed AS (
       |  SELECT p_partkey,
       |    $list[CAST(p_partkey % ${variants.length} AS INTEGER) + 1] AS raw_label
       |  FROM part)
       |SELECT p_partkey, raw_label,
       |  CASE
       |    $cases
       |    ELSE 'undefined_object' END AS object_class
       |FROM feed ORDER BY p_partkey""".stripMargin
  }

  // ------------------------------------------------------------------ P11: size reclassification
  /** closed_roof_tank <-> narrow_closed_roof_tank by min(w,h) <= 15 px, only
    * when neither difficult nor truncated (`src/form_calcs.py:387-415`; the
    * reference computes but never persists this — we apply the intent,
    * SURVEY.md §2.11.1). */
  private val p11Reclassify: Q = (spark, dir) => {
    val p = Tables.part(spark, dir)
    val base = p.select(col("p_partkey"),
      when(col("p_partkey") % 2 === 0, "closed_roof_tank")
        .otherwise("narrow_closed_roof_tank").as("object_class"),
      (col("p_size")).as("width"),
      ((col("p_partkey") % 25) + 3).cast("int").as("height"),
      (col("p_partkey") % 7 === 0).as("difficult"),
      (col("p_partkey") % 11 === 0).as("truncated"))
    base.withColumn("reclassified",
        when(!col("difficult") && !col("truncated") &&
            col("object_class").isin("closed_roof_tank", "narrow_closed_roof_tank"),
          when(least(col("width"), col("height")) <= 15, "narrow_closed_roof_tank")
            .otherwise("closed_roof_tank"))
          .otherwise(col("object_class")))
      .orderBy("p_partkey")
  }

  private val p11ReclassifySql =
    """WITH base AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 2 = 0 THEN 'closed_roof_tank'
      |         ELSE 'narrow_closed_roof_tank' END AS object_class,
      |    p_size AS width,
      |    CAST(p_partkey % 25 + 3 AS INTEGER) AS height,
      |    p_partkey % 7 = 0 AS difficult,
      |    p_partkey % 11 = 0 AS truncated
      |  FROM part)
      |SELECT *,
      |  CASE WHEN NOT difficult AND NOT truncated
      |            AND object_class IN ('closed_roof_tank', 'narrow_closed_roof_tank')
      |       THEN CASE WHEN least(width, height) <= 15
      |                 THEN 'narrow_closed_roof_tank' ELSE 'closed_roof_tank' END
      |       ELSE object_class END AS reclassified
      |FROM base ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------------ P13: flag coupling
  /** truncated/difficult coupling: either flag set -> both set
    * (`src/form_calcs.py:345-350`) via greatest. */
  private val p13FlagCoupling: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    l.select(col("l_orderkey"), col("l_linenumber"),
        (col("l_linenumber") % 2).cast("int").as("truncated"),
        (col("l_orderkey") % 2).cast("int").as("difficult"))
      .withColumn("truncated_out", greatest(col("truncated"), col("difficult")))
      .withColumn("difficult_out", greatest(col("truncated"), col("difficult")))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val p13FlagCouplingSql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_linenumber % 2 AS INTEGER) AS truncated,
      |  CAST(l_orderkey % 2 AS INTEGER) AS difficult,
      |  greatest(CAST(l_linenumber % 2 AS INTEGER), CAST(l_orderkey % 2 AS INTEGER)) AS truncated_out,
      |  greatest(CAST(l_linenumber % 2 AS INTEGER), CAST(l_orderkey % 2 AS INTEGER)) AS difficult_out
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------------------------------ string scalar surface
  /** String-function surface (§2.7): split/substring/pad/case/regex over
    * customer names (`Customer#000000123` grammar). `capitalize` is emulated
    * portably as upper(first) || lower(rest). */
  private val fStringOps: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    c.select(col("c_custkey"),
        regexp_extract(col("c_name"), "#(\\d+)$", 1).cast("long").as("parsed_id"),
        substring_index(col("c_name"), "#", 1).as("name_stem"),
        concat(upper(substring(col("c_mktsegment"), 1, 1)),
          lower(substring(col("c_mktsegment"), 2, 100))).as("segment_cap"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        regexp_replace(col("c_name"), "\\d", "x").as("masked_name"))
      .withColumn("id_matches", col("parsed_id") === col("c_custkey"))
      .orderBy("c_custkey")
  }

  private val fStringOpsSql =
    """SELECT c_custkey,
      |  CAST(regexp_extract(c_name, '#(\d+)$', 1) AS BIGINT) AS parsed_id,
      |  string_split(c_name, '#')[1] AS name_stem,
      |  upper(substring(c_mktsegment, 1, 1)) || lower(substring(c_mktsegment, 2, 100)) AS segment_cap,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
      |  regexp_replace(c_name, '\d', 'x', 'g') AS masked_name,
      |  CAST(regexp_extract(c_name, '#(\d+)$', 1) AS BIGINT) = c_custkey AS id_matches
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------ G2: array explode w/ ordinality
  /** One row per `<object>` per file (`src/form_calcs.py:863-879`) -> here,
    * one row per word per part name via posexplode. */
  private val g2ObjectExplode: Q = (spark, dir) => {
    val p = Tables.part(spark, dir)
    p.select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
      .select(col("p_partkey"), (col("pos") + 1).cast("int").as("ord"), col("col").as("word"))
      .orderBy("p_partkey", "ord")
  }

  private val g2ObjectExplodeSql =
    """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
      |SELECT p_partkey, CAST(i.i AS INTEGER) AS ord, words[CAST(i.i AS INTEGER)] AS word
      |FROM w, generate_series(1, 8) i(i)
      |WHERE i.i <= len(words)
      |ORDER BY p_partkey, ord""".stripMargin

  // ------------------------------------------------------------------ G3 + P10: frame translation & clamp
  /** Chip-frame -> tile-frame bbox translation (+512*grid) with edge clamping
    * (`src/form_calcs.py:672-694` + the >=0 clamp of SURVEY.md §2.11.4). */
  private val g3FrameTranslate: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    val base = l.select(col("l_orderkey"), col("l_linenumber"),
      (col("l_partkey") % 12).cast("int").as("grid_col"),
      (col("l_suppkey") % 10).cast("int").as("grid_row"),
      (col("l_partkey") * 7 % 512).cast("int").as("cx1"),
      (col("l_suppkey") * 11 % 512).cast("int").as("cy1"))
      .withColumn("cx2", col("cx1") + 40)
      .withColumn("cy2", col("cy1") + 40)
      .withColumn("tile_w", lit(6000)).withColumn("tile_h", lit(5000))
    base.select(col("l_orderkey"), col("l_linenumber"),
        ColumnOps.clamp(ColumnOps.toTileFrame(col("cx1"), col("grid_col")), col("tile_w")).as("tx1"),
        ColumnOps.clamp(ColumnOps.toTileFrame(col("cy1"), col("grid_row")), col("tile_h")).as("ty1"),
        ColumnOps.clamp(ColumnOps.toTileFrame(col("cx2"), col("grid_col")), col("tile_w")).as("tx2"),
        ColumnOps.clamp(ColumnOps.toTileFrame(col("cy2"), col("grid_row")), col("tile_h")).as("ty2"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val g3FrameTranslateSql =
    """SELECT l_orderkey, l_linenumber,
      |  greatest(0, least(CAST(l_partkey * 7 % 512 AS INTEGER) + CAST(l_partkey % 12 AS INTEGER) * 512, 6000)) AS tx1,
      |  greatest(0, least(CAST(l_suppkey * 11 % 512 AS INTEGER) + CAST(l_suppkey % 10 AS INTEGER) * 512, 5000)) AS ty1,
      |  greatest(0, least(CAST(l_partkey * 7 % 512 AS INTEGER) + 40 + CAST(l_partkey % 12 AS INTEGER) * 512, 6000)) AS tx2,
      |  greatest(0, least(CAST(l_suppkey * 11 % 512 AS INTEGER) + 40 + CAST(l_suppkey % 10 AS INTEGER) * 512, 5000)) AS ty2
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------------------------------ registry
  // ------------------------------------------------------------------ G4: z-order spatial layout
  /** Z-order data layout for the tile grid ([[graft.functions.ZOrder]]):
    * Morton keys interleave (x, y), so contiguous key ranges are compact
    * spatial blocks — the layout that makes bbox predicates prune files
    * instead of scanning the full tile table at 100 TB. The gate groups
    * tiles by `zkey div 16` (16 curve cells = one 4x4 block) and checks
    * every bucket's spatial extent: x_span/y_span ≤ 3 everywhere is the
    * locality property itself, hash-verified — a row-major layout would
    * put 16-tile runs spanning the full 40-tile grid width in one bucket.
    * The bit spread is plain 64-bit integer arithmetic on both engines. */
  private val g4ZorderLayout: Q = (spark, dir) => {
    val tiles = graft.io.Tables.lineitem(spark, dir)
      .select((col("l_orderkey") % 1000).cast("long").as("tile_id")).distinct()
      .withColumn("x", col("tile_id") % 40)
      .withColumn("y", expr("tile_id div 40"))
      .withColumn("zkey", graft.functions.ZOrder.morton(col("x"), col("y")))
    tiles.withColumn("bucket", expr("zkey div 16"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tiles"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .withColumn("x_span", col("max_x") - col("min_x"))
      .withColumn("y_span", col("max_y") - col("min_y"))
      .orderBy("bucket")
  }

  private val g4ZorderLayoutSql =
    s"""WITH tiles AS (SELECT DISTINCT l_orderkey % 1000 AS tile_id FROM lineitem),
       |xy AS (SELECT tile_id, tile_id % 40 AS x, tile_id // 40 AS y FROM tiles),
       |${graft.functions.ZOrder.mortonSqlCtes("xy", Seq("tile_id"), "x", "y", "zkey")}
       |SELECT zkey // 16 AS bucket, count(*) AS n_tiles,
       |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
       |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
       |FROM zf GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "p11_reclassify" -> p11Reclassify,
    "p12_label_standardize" -> p12LabelStandardize,
    "p13_flag_coupling" -> p13FlagCoupling,
    "f_string_ops" -> fStringOps,
    "g2_object_explode" -> g2ObjectExplode,
    "g3_frame_translate" -> g3FrameTranslate,
    "g4_zorder_layout" -> g4ZorderLayout
  )

  val oracle: Map[String, String] = Map(
    "p11_reclassify" -> p11ReclassifySql,
    "p12_label_standardize" -> p12LabelStandardizeSql,
    "p13_flag_coupling" -> p13FlagCouplingSql,
    "f_string_ops" -> fStringOpsSql,
    "g2_object_explode" -> g2ObjectExplodeSql,
    "g3_frame_translate" -> g3FrameTranslateSql,
    "g4_zorder_layout" -> g4ZorderLayoutSql
  )
}

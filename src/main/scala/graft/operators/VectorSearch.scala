package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale plan:
  *  - brute force: broadcast the (small) query set against every candidate —
  *    exact, O(|queries| * N), the correctness baseline;
  *  - hyperplane LSH buckets: deterministic integer hyperplanes hash each
  *    vector to a bucket; neighbor search joins only within a bucket, which
  *    at 100 TB turns a quadratic cross join into an equi-join shuffle on
  *    the bucket key.
  *
  * Dot products run inside codegen via `zip_with`/`aggregate` higher-order
  * functions (floats cast to double first so accumulation is stable).
  */
object VectorSearch {

  /** Sum of elementwise products, accumulated left-to-right in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact top-k neighbors for each query row (query set must be small —
    * it is broadcast). Ranking uses the 4-dp rounded cosine with the
    * candidate id as tiebreak, so results are reproducible across engines
    * regardless of float summation order.
    *
    * Uses the native codegen'd `cosine_sim` expression
    * ([[graft.plans.CosineSimilarity]]) — measured 24x faster than the
    * higher-order-function form at sf0.1 (one fused loop, no per-pair
    * array allocation), with hash-identical results. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(candidates.sparkSession)
    val joined = candidates.select(col("vec_id").as("neighbor_id"), col("embedding").as("cand_emb"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(expr("cosine_sim(q_emb, cand_emb)"), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("int").as("rnk"), col("neighbor_id"), col("cos_sim"))
  }

  /** Default cell-population cap for within-cell pair generation (SemDeDup
    * and friends): a cell of n vectors yields n(n-1)/2 candidate pairs on
    * ONE shuffle key, and SemDeDup's own use case — mass near-duplicate
    * embeddings — concentrates exactly those vectors into one cell. Same
    * guard, same default, as the text path's
    * [[TextPipeline.DefaultMaxBucket]]. */
  val DefaultMaxCell = 1000

  /** Within-cell candidate pairs for cluster-bucketed dedup. `cells` must
    * carry (idCol, embCol, cellCol). Cells larger than `maxCell` are
    * REFUSED from pair generation — their members stay singletons (audit
    * them with [[droppedCells]]); the population count comes from a window
    * over the same shuffle key the join uses, so the cap costs no extra
    * shuffle. Output: (cellCol, id_a, id_b, emb_a, emb_b) with id_a < id_b. */
  def cellPairs(cells: DataFrame, idCol: String, embCol: String,
                cellCol: String, maxCell: Int = DefaultMaxCell): DataFrame = {
    val kept = cells
      .withColumn("cell_n", count(lit(1)).over(Window.partitionBy(cellCol)))
      .filter(col("cell_n") <= maxCell)
    val a = kept.select(col(idCol).as("id_a"), col(embCol).as("emb_a"), col(cellCol))
    val b = kept.select(col(idCol).as("id_b"), col(embCol).as("emb_b"), col(cellCol))
    a.join(b, Seq(cellCol)).filter(col("id_a") < col("id_b"))
  }

  /** Audit output for the cap: one row per refused cell with its
    * population — "what did semantic dedup refuse to pair, and how big". */
  def droppedCells(cells: DataFrame, cellCol: String,
                   maxCell: Int = DefaultMaxCell): DataFrame =
    cells.groupBy(cellCol)
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") > maxCell)

  /** Deterministic integer hyperplane weight for (plane p, 1-based dim j):
    * ((p*37 + j*17) % 13) - 6, i.e. pseudo-random in [-6, 6] with exact
    * integer arithmetic any engine reproduces bit-for-bit. */
  def planeWeight(p: Column, j: Column): Column = (p * 37 + j * 17) % 13 - 6

  /** Bucket id per vector: 8 hyperplane sign bits packed into an int.
    * Relational form (posexplode + groupBy) keeps it oracle-checkable. */
  def hyperplaneBuckets(emb: DataFrame, numPlanes: Int = 8): DataFrame = {
    val unnested = emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("j"), col("col").cast("double").as("x"))
    val planes = unnested.withColumn("p", explode(sequence(lit(0), lit(numPlanes - 1))))
    planes
      .groupBy("vec_id", "p")
      .agg(sum(col("x") * planeWeight(col("p"), col("j"))).as("dotp"))
      .withColumn("bit", when(col("dotp") > 0, 1).otherwise(0))
      .groupBy("vec_id")
      .agg(sum(expr("shiftleft(bit, cast(p as int))")).cast("int").as("bucket"))
  }
}

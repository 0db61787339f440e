package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration damped PageRank over an edge list — the
  * Pregel-on-DataFrames shape with integer-exact arithmetic.
  *
  * Each iteration is ONE shuffled equi-join of the rank table onto the
  * edge list (contribution = rank div out-degree) plus ONE keyed
  * aggregation on the destination — both linear in |edges|, both with
  * map-side partial aggregation. The driver only sequences the (bounded)
  * iterations; no vertex ever sees more than its neighborhood.
  *
  * Determinism contract: ranks are scaled integers (`base` = 1.0) and
  * every step is integer arithmetic — `div` for the degree split,
  * `(85 * inflow) div 100` for the 0.85 damping — so per-node inflow sums
  * are exact BIGINT sums (order-independent at any parallelism, where a
  * double sum is not) and the result is bit-identical across engines and
  * cluster layouts. Overflow headroom: total mass is `nodes * base`;
  * `85 * inflow(v)` must stay below 2^63, which holds through ~10^5 nodes
  * at the default base.
  *
  * Dangling nodes (no out-edges) would leak mass; callers wanting the
  * standard redistribute-dangling-mass variant should symmetrize or
  * self-loop the edge list first (the gate query mirrors every edge).
  */
object PageRank {

  /** Default rank scale: 1.0 == 10^12. */
  val DefaultBase = 1000000000000L

  /** `edges` must have string columns `src`, `dst`. Returns (node, rank)
    * for every node appearing as a source (with a mirrored edge list,
    * that is every node). */
  def ranks(edges: DataFrame, iterations: Int, base: Long = DefaultBase): DataFrame = {
    require(iterations >= 1, s"need >= 1 iteration, got $iterations")
    val e = edges.select("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node")).distinct()
    var r = nodes.withColumn("r", lit(base))
    for (_ <- 1 to iterations) {
      val inflow = e
        .join(deg, "src")
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      r = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (lit(base * 15 / 100) + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
    }
    r.select(col("node"), col("r").cast("long").as("rank"))
  }
}

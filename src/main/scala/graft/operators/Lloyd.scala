package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd k-means trainer — the index-build loop behind the
  * persisted IVF index. North-star training-data-pipeline surface (SURVEY
  * §7 step 8's ANN scale path), not reference surface: the standard coarse
  * quantizer build (Lloyd 1982; Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011, §III), distributed and
  * engine-exact.
  *
  * The `v10_kmeans_step` gate verifies ONE update step; this runs the real
  * loop: assign every quantized vector to its nearest centroid, recompute
  * centroids, repeat to a fixpoint (or `maxIters`). Everything is exact
  * integer arithmetic so the result is bit-stable across partitioning and
  * engines:
  *
  *  - vectors are int8-quantized (`qx` in [-127, 127]), centroids held at
  *    MILLI precision (`cm = round(1000 * mean)` as a long);
  *  - distances are `Σ (1000·qx − cm)²` — exact longs, order-independent;
  *  - ties break on the lower centroid id (deterministic argmin);
  *  - the centroid update is the exact rational round-half-up
  *    `floorDiv(2000·Σqx + n, 2n)` on the driver — no float summation
  *    anywhere, so reruns at any parallelism produce identical centroids;
  *  - an empty cluster keeps its previous centroid (standard Lloyd
  *    degenerate-case handling, and what keeps the map total).
  *
  * Convergence is a TRUE fixpoint: when an iteration leaves every `cm`
  * unchanged, the next assignment — a pure function of the centroids —
  * would repeat exactly, so stopping early equals running more iterations.
  * (That equivalence is what lets a fixed-depth unrolled SQL oracle check
  * a convergence-stopped run: surplus oracle iterations are no-ops.)
  *
  * Scale shape: per iteration, ONE narrow pass over the corpus (broadcast
  * k×d milli-centroid table, fused zip_with distance, argmin window keyed
  * by vec_id) and ONE (centroid, dim)-keyed aggregation of k·d cells with
  * map-side partials; the driver materializes only k·d longs per round.
  * No shuffle grows with corpus size. The `.collect()` is the k·d centroid
  * state (≤ a few thousand values) — the documented driver-side index-build
  * loop, not a data collect. */
object Lloyd {

  /** Final trainer state: centroid ids with their milli-precision
    * coordinates, the last round's per-(centroid, dim) assignment stats
    * (n, Σqx; (0,0) for a cluster that ended empty), and loop telemetry. */
  final case class Trained(
      centroidIds: Array[Long],
      centroidsMilli: Array[Array[Long]],
      lastUpdate: Map[(Long, Int), (Long, Long)],
      iterations: Int,
      converged: Boolean) {

    /** (centroid_id, dim, cm, n_assigned, sum_q) rows, ordered. */
    def rows: Seq[(Long, Int, Long, Long, Long)] =
      for {
        (id, c) <- centroidIds.zip(centroidsMilli).toSeq
        dim <- c.indices
      } yield {
        val (n, s) = lastUpdate.getOrElse((id, dim), (0L, 0L))
        (id, dim, c(dim), n, s)
      }

    /** Centroids as exact double arrays (`cm / 1000.0`) for cosine-space
      * serving, keyed like the sampled-centroid tables. */
    def centroidFrame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      centroidIds.zip(centroidsMilli)
        .map { case (id, c) => (id, c.map(_ / 1000.0).toSeq) }.toSeq
        .toDF("centroid_id", "c_emb")
    }
  }

  /** Train k centroids over `qvecs` (`vec_id: long`, `qvec: array<int>`).
    * Seeds are the qvecs of the k lowest `vec_id`s (scaled to milli) —
    * the same deterministic seeding the one-step gate uses. */
  def train(spark: SparkSession, qvecs: DataFrame, k: Int, maxIters: Int): Trained = {
    import spark.implicits._
    val seeds = qvecs.filter(col("vec_id") < k)
      .select(col("vec_id"), col("qvec"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    require(seeds.length == k,
      s"expected $k seed vectors with vec_id < $k, found ${seeds.length}")
    val ids = seeds.map(_._1)
    var cent: Array[Array[Long]] = seeds.map(_._2.map(_.toLong * 1000L).toArray)
    var lastUpd = Map.empty[(Long, Int), (Long, Long)]
    var it = 0
    var converged = false
    // Right-size the per-round shuffle: map-side partials collapse each
    // input partition to <= k·d cells, so the reduce side carries
    // (input partitions × k·d) tiny rows — width derived from the INPUT
    // partitioning (≈ one reduce task per 8 map partitions), never wider
    // than the session setting. A gate-scale coalesced corpus trains at
    // width 1 instead of paying the full session width per round; a
    // 10⁹-vector corpus keeps proportional width. Restored in finally.
    // SINGLE-THREADED-SESSION ASSUMPTION (ADVICE r15): Bench/Verify run
    // queries sequentially; a concurrent-query embedding should train
    // inside spark.newSession instead.
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partsKey)
    val loopParts = math.max(1, math.min(prevParts.toInt,
      qvecs.rdd.getNumPartitions / 8 + 1))
    spark.conf.set(partsKey, loopParts.toString)
    try {
    // NOTE on shape: each round is ONE narrow pass — the per-row argmin
    // runs inside whole-stage codegen via the native
    // [[graft.plans.NearestCentroidMilli]] expression (the centroid table
    // rides along as k·d longs of expression state), so nothing joins and
    // the only shuffle is the k·d-cell centroid update with map-side
    // partials. The earlier composed form (broadcast crossJoin +
    // interpreted HOF distance + groupBy(vec_id) argmin) re-shuffled the
    // WHOLE CORPUS once per round — vec_id is unique, so partial
    // aggregation collapsed nothing — which is a per-round corpus-sized
    // exchange at 10⁹ vectors and was 3× the gate cost at bench scale.
    // Assignment parallelism follows the input partitioning: a 10⁹-vector
    // corpus keeps its partitioning, gate-scale tables coalesce to one.
    while (it < maxIters && !converged) {
      val nearest = org.apache.spark.sql.GraftSqlShim.column(
        graft.plans.NearestCentroidMilli(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("qvec"), ids, cent))
      val upd = qvecs
        .select(nearest.getField("centroid_id").as("centroid_id"),
          posexplode(col("qvec")).as(Seq("dim", "qx")))
        .groupBy("centroid_id", "dim")
        .agg(count(lit(1)).as("n"), sum(col("qx").cast("long")).as("s"))
        .as[(Long, Int, Long, Long)].collect()
      lastUpd = upd.map { case (cid, dim, n, s) => (cid, dim) -> (n, s) }.toMap
      val next = ids.zip(cent).map { case (id, c) =>
        c.indices.map { dim =>
          lastUpd.get((id, dim)) match {
            // exact round-half-up of 1000·s/n: floor((2000s + n) / 2n)
            case Some((n, s)) => Math.floorDiv(2000L * s + n, 2L * n)
            case None => c(dim) // empty cluster: carry the old centroid
          }
        }.toArray
      }
      it += 1
      converged = next.zip(cent).forall { case (a, b) => java.util.Arrays.equals(a, b) }
      cent = next
    }
    } finally spark.conf.set(partsKey, prevParts)
    Trained(ids, cent, lastUpd, it, converged)
  }
}

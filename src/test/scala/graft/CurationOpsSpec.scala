package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the corpus-curation operators added alongside the
  * dedup family: decontamination (d10), exact-quota stratified sampling
  * (w8), and the integer-exact k-means update step (v10). The gate queries
  * hash-check them against DuckDB; these tests pin the properties the
  * hash can't express (planted leaks ARE caught, quotas ARE exact, every
  * vector is assigned exactly once).  */
class CurationOpsSpec extends SparkSpec {

  test("d10: planted verbatim leaks of eval docs are flagged contaminated") {
    val out = graft.queries.TextDedupQueries.queries("d10_decontaminate")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val leaks = out.filter { case (id, _) => id >= 30000 }
    assert(leaks.nonEmpty)
    // every planted leak shares all its 8-grams (minus the prefix edge)
    // with its eval source, so every one must be flagged
    assert(leaks.values.forall(identity), "a planted leak went undetected")
    // eval docs themselves are excluded from the report
    assert(!out.keySet.exists(id => id % 25 == 0 && id < 30000))
  }

  test("d11: verbatim copies of indexed docs are flagged with full agreement") {
    val rows = graft.queries.TextDedupQueries.queries("d11_incremental_dedup")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(3))).toMap
    val planted = rows.filter { case (id, _) => id >= 40000 }
    assert(planted.nonEmpty)
    planted.foreach { case (id, (agree, dup)) =>
      assert(agree == 8 && dup, s"planted copy $id: agree=$agree dup=$dup")
    }
    // the report covers only the incoming batch, never the index
    assert(rows.keySet.forall(_ >= 400))
  }

  test("w8: per-stratum sample sizes are exactly ceil(n/10)") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val expected = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> (r.getLong(1) + 9) / 10).toMap
    val got = graft.queries.TextDedupQueries.queries("w8_stratified_sample")(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("w8: the draw is deterministic across re-runs") {
    def ids = graft.queries.TextDedupQueries.queries("w8_stratified_sample")(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids)
  }

  test("v10: one update row per (centroid, dim); counts cover the corpus once") {
    val out = graft.queries.VectorQueries.queries("v10_kmeans_step")(spark, sf0001)
    val rows = out.collect()
    val k = rows.map(_.getLong(0)).distinct.length
    assert(rows.length == k * 64)
    // per-centroid count is constant across dims, and the counts sum to
    // the corpus size (every vector assigned exactly once)
    val perCentroid = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).distinct)
    assert(perCentroid.values.forall(_.length == 1))
    val total = perCentroid.values.map(_.head).sum
    val n = graft.io.Tables.embeddings(spark, sf0001).count()
    assert(total == n)
    // quantized-domain means stay inside the int8 range
    assert(rows.forall(r => math.abs(r.getDouble(4)) <= 127.0))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{BoxMerge, TextPipeline, VectorSearch}

/** Degenerate-input behaviour for the custom operators. */
class EdgeCaseSpec extends SparkSpec {

  test("BoxMerge on an empty dataset yields no clusters") {
    import spark.implicits._
    val empty = spark.emptyDataset[BoxMerge.Box]
    assert(BoxMerge.merge(empty).count() == 0)
  }

  test("BoxMerge single box is its own unmerged cluster") {
    import spark.implicits._
    val one = Seq(BoxMerge.Box("t", 1, 2, 3, 4, "water_tower")).toDS()
    val c = BoxMerge.merge(one).collect().head
    assert(!c.merged && c.n_boxes == 1 && c.cluster_id == 1)
    assert((c.minx, c.miny, c.maxx, c.maxy) == (1, 2, 3, 4))
  }

  test("shinglesFromTokens on short docs yields empty, not negative indices") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, ""), (3L, "a b c")).toDF("id", "text")
      .withColumn("toks", TextPipeline.tokens(col("text")))
      .select(col("id"), TextPipeline.shinglesFromTokens(col("toks"), 3).as("sh"))
    val sizes = df.orderBy("id").collect().map(r => r.getSeq[String](1).size).toSeq
    assert(sizes == Seq(0, 0, 1))
  }

  test("bruteForceTopK with an empty query set returns nothing") {
    import spark.implicits._
    val emb = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = VectorSearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 0), 3)
    assert(out.count() == 0)
  }

  test("quality metrics survive a minimal one-token document") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val m = TextPipeline.qualityMetrics(df, "text").collect().head
    assert(m.getAs[Long]("n_tokens") == 1L)
    assert(m.getAs[String]("quality_bucket") == "too_short")
  }

  test("allocation when n exceeds the pool allocates everything") {
    import graft.operators.Allocation
    val small = orders.limit(10)
    val (allocated, rest) = Allocation.allocate(
      small, "o_orderkey", Seq("o_orderdate", "o_orderkey"), 100, Seq("a"))
    assert(allocated.count() == 10 && rest.count() == 0)
  }

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select("o_orderkey", "o_orderdate")
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TextPipeline

/** The scalar one-pass minhash signature (`plans.MinHashSig8Expr`) must be
  * bit-identical to the composed shingle-explode form the oracles replay —
  * including which documents HAVE a signature (<3 tokens -> none). */
class MinHashScalarSpec extends SparkSpec {

  private def sigOfComposed(df: org.apache.spark.sql.DataFrame) =
    TextPipeline.minhashSignature(
      df.withColumn("toks", TextPipeline.tokens(col("text")))
        .select(col("doc_id"),
          explode(TextPipeline.shinglesFromTokens(col("toks"), 3)).as("shingle")),
      "doc_id", "shingle", 8)

  private def sigOfScalar(df: org.apache.spark.sql.DataFrame) = {
    graft.plans.GraftFunctions.register(spark)
    df.select(col("doc_id"), expr("minhash_sig8(text)").as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id") +: (0 until 8).map(k => col(s"s.h$k").as(s"h$k")): _*)
  }

  private def collectSigs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString).toVector).toMap

  test("scalar and composed signatures are bit-identical; short docs have none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),              // verbatim dup
      (3L, "alpha beta gamma delta epsilon zeta"),          // near dup
      (4L, "one two"),                                      // < 3 tokens: no signature
      (5L, "exactly three tokens"),                         // 1 shingle
      (6L, "repeated repeated repeated repeated repeated"), // duplicate shingles
      (7L, "trailing space two "),                          // split keeps empties
      (8L, "completely different content with many unique words in this line"))
      .toDF("doc_id", "text")
    val composed = collectSigs(sigOfComposed(docs))
    val scalar = collectSigs(sigOfScalar(docs))
    assert(scalar.keySet == composed.keySet)
    assert(!scalar.contains(4L))
    scalar.keys.foreach { id =>
      assert(scalar(id) == composed(id), s"doc $id")
    }
    // dup docs share signatures, near-dups share most hash positions
    assert(scalar(1L) == scalar(2L))
  }
}

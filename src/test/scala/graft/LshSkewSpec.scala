package graft

import org.apache.spark.sql.functions._

import graft.operators.TextPipeline

/** VERDICT "What's wrong" #2: an uncapped LSH band bucket goes quadratic
  * on one shuffle key when a corpus is boilerplate-heavy. The pathological
  * fixture here is the worst case — every document identical, so every
  * band bucket holds the whole corpus. */
class LshSkewSpec extends SparkSpec {

  private val NumHashes = 16
  private val Bands = 4

  /** n docs with identical signatures + m docs sharing a distinct near-dup
    * signature pair. */
  private def sig(identical: Int, pairs: Int) = {
    import spark.implicits._
    val boiler = (0 until identical).map(i => (s"boiler_$i", "same"))
    val dups = (0 until pairs * 2).map(i => (s"dup_${i / 2}_${i % 2}", s"group${i / 2}"))
    (boiler ++ dups).toDF("doc_id", "sig_seed")
      .select(col("doc_id") +:
        (0 until NumHashes).map(h => md5(concat_ws(":", lit(h), col("sig_seed"))).as(s"h$h")): _*)
  }

  test("identical-corpus bucket is dropped by the cap; audit reports it") {
    val s = sig(identical = 200, pairs = 3)
    val pairsDf = TextPipeline.lshCandidatePairs(s, "doc_id", NumHashes, Bands, maxBucket = 100)
    // the 200-doc boilerplate bucket is refused (would be 19 900 pairs on
    // one key); the small legitimate near-dup pairs still come through
    val out = pairsDf.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.size == 3, s"expected only the 3 near-dup pairs, got ${out.size}")
    assert(out.forall { case (a, b) => a.startsWith("dup_") && b.startsWith("dup_") })
    val dropped = TextPipeline.lshDroppedBuckets(s, "doc_id", NumHashes, Bands, maxBucket = 100)
      .collect()
    assert(dropped.length == Bands)            // one oversized bucket per band
    assert(dropped.forall(_.getAs[Long]("bucket_n") == 200L))
  }

  test("uncapped run on the same fixture is quadratic — the cap is load-bearing") {
    val s = sig(identical = 200, pairs = 0)
    val n = TextPipeline.lshCandidatePairs(s, "doc_id", NumHashes, Bands,
      maxBucket = Int.MaxValue).count()
    assert(n == 200L * 199 / 2)
  }

  test("cap does not change results on a skew-free corpus") {
    val s = sig(identical = 0, pairs = 40)
    val capped = TextPipeline.lshCandidatePairs(s, "doc_id", NumHashes, Bands, maxBucket = 100)
    val uncapped = TextPipeline.lshCandidatePairs(s, "doc_id", NumHashes, Bands,
      maxBucket = Int.MaxValue)
    assert(capped.exceptAll(uncapped).count() == 0)
    assert(uncapped.exceptAll(capped).count() == 0)
    assert(TextPipeline.lshDroppedBuckets(s, "doc_id", NumHashes, Bands, maxBucket = 100)
      .count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.multimodal.BinaryMedia
import graft.operators.{TextPipeline, VectorSearch}

class TextVectorSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  test("wordShingles produces n-k+1 shingles of k joined tokens") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val sh = df.select(explode(TextPipeline.wordShingles(col("text"), 3)).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("minhash signature of identical docs is identical, near-dup mostly agrees") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val df = Seq((1L, base), (2L, base), (3L, base + " tail")).toDF("doc_id", "text")
    val shingled = df.select(col("doc_id"),
      explode(TextPipeline.wordShingles(col("text"), 3)).as("shingle"))
    val sig = TextPipeline.minhashSignature(shingled, "doc_id", "shingle", 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    val agree = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    assert(agree >= 5, s"near-dup only agreed on $agree/8 hashes")
  }

  test("lsh candidate pairs contain exact duplicates") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val df = Seq((1L, base), (2L, base), (3L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val shingled = df.select(col("doc_id"),
      explode(TextPipeline.wordShingles(col("text"), 3)).as("shingle"))
    val sig = TextPipeline.minhashSignature(shingled, "doc_id", "shingle", 8)
    val pairs = TextPipeline.lshCandidatePairs(sig, "doc_id", 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val cs = df.select(round(VectorSearch.cosine(col("a"), col("b")), 6).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(cs == Seq(1.0, 0.0))
  }

  test("bruteForceTopK ranks the nearest vector first") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = VectorSearch.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 2)
      .orderBy("rnk").collect()
    assert(top.length == 2)
    assert(top(0).getAs[Long]("neighbor_id") == 1L)
  }

  test("hyperplane buckets are stable and in [0, 255]") {
    import spark.implicits._
    val emb = (0L until 20L).map(i =>
      (i, Array.tabulate(64)(j => ((i * 31 + j * 7) % 11).toFloat - 5f))).toDF("vec_id", "embedding")
    val b1 = VectorSearch.hyperplaneBuckets(emb).orderBy("vec_id").collect()
    val b2 = VectorSearch.hyperplaneBuckets(emb).orderBy("vec_id").collect()
    assert(b1.sameElements(b2))
    b1.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b <= 255)
    }
  }

  test("multi-probe LSH recalls at least as well as single-bucket search") {
    import graft.queries.VectorQueries
    def top1(name: String): Map[Long, Long] = {
      val df = VectorQueries.queries(name)(spark, sf0001)
      val t1 = if (df.columns.contains("rnk")) df.filter(col("rnk") === 1) else df
      t1.collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    }
    val exact = top1("v1_cosine_topk")
    val single = top1("v3_ann_bucket")
    val multi = top1("v6_multiprobe_ann")
    def recall(approx: Map[Long, Long]): Double =
      exact.count { case (q, n) => approx.get(q).contains(n) }.toDouble / exact.size
    assert(recall(multi) >= recall(single),
      s"multi-probe recall ${recall(multi)} < single-bucket ${recall(single)}")
    // multi-probe must cover at least every query single-bucket covered
    assert(single.keySet.subsetOf(multi.keySet))
  }

  test("media decode stub is deterministic and frame sampling covers n_frames") {
    import spark.implicits._
    val docs = Seq((7L, "hello world, a fake payload")).toDF("doc_id", "text")
    val meta = BinaryMedia.decodeMeta(BinaryMedia.fakePayloads(spark, docs)).toDF()
    val m = meta.collect().head
    assert(m.getAs[Long]("byte_len") == 27L)
    assert(m.getAs[Int]("n_frames") == 27 % 5 + 1)
    val frames = BinaryMedia.sampleFrames(meta).select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(frames == (0 until 27 % 5 + 1))
  }

  test("quality bucket thresholds") {
    import spark.implicits._
    val df = Seq(
      (1L, "short text"),
      (2L, ("the a of and to in is it " * 5).trim + " word word word word word word word word word word word word")
    ).toDF("doc_id", "text")
    val rows: Map[Long, Row] = TextPipeline.qualityMetrics(df, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[String]("quality_bucket") == "too_short")
    assert(rows(2L).getAs[String]("quality_bucket") == "boilerplate")
  }

  test("v14 IVF+PQ composed search recovers every planted neighbor (recall@3 = 1)") {
    val rows = graft.queries.VectorQueries.queries("v14_ivfpq_search")(spark, sf0001)
      .collect()
    assert(rows.length == 9)   // 3 queries x top-3
    // the full probe -> ADC -> shortlist -> rerank chain must surface all
    // three planted copies of each query at cosine 1.0
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_at_3") == 1.0, r.toString)
      assert(r.getAs[Double]("cos_sim") == 1.0, r.toString)
      assert(r.getAs[Long]("neighbor_id") % 10000 == r.getAs[Long]("q_id"), r.toString)
    }
  }

  test("BPE trainer: plan depth stays BOUNDED however many merge rounds run") {
    // the trainer chains one replace() per merge round; periodic
    // localCheckpoint truncation must keep the analyzed plan's depth
    // bounded by the checkpoint interval, or realistic 1k-32k-merge
    // vocabularies hit an analyzer/codegen cliff (VERDICT r10 #4)
    def planSize(df: org.apache.spark.sql.DataFrame): Int = {
      var n = 0
      df.queryExecution.logical.foreach(_ => n += 1)
      n
    }
    val at8 = planSize(graft.queries.TextDedupQueries.bpeVocab(spark, sf0001, 8))
    val at24 = planSize(graft.queries.TextDedupQueries.bpeVocab(spark, sf0001, 24))
    assert(at24 <= at8,
      s"24 rounds must not plan deeper than 8 (checkpoint interval bounds " +
        s"depth), got $at24 vs $at8")
    // and the production round count segments correctly: every word's
    // pieces re-concatenate to the word (merges never lose characters)
    val v = graft.queries.TextDedupQueries.bpeVocab(spark, sf0001)
    val broken = v.filter(
      expr("replace(syms, ' ', '') != word")).count()
    assert(broken == 0L, s"$broken words whose BPE pieces do not re-join")
  }

  test("BPE trainer: driver vocabulary collect is BOUNDED and fails loudly past the cap") {
    val e = intercept[IllegalArgumentException] {
      graft.queries.TextDedupQueries.bpeVocab(spark, sf0001, 1, maxVocab = 3)
    }
    assert(e.getMessage.contains("distinct word types"), e.getMessage)
    // and the production cap admits the real corpus unchanged
    assert(graft.queries.TextDedupQueries.bpeVocab(spark, sf0001, 1).count() > 3)
  }

  test("BPE syms0 matches the engines' rtrim on newline-bearing tokens") {
    // rtrim trims ' ' only and never sees through a trailing '\n'; Java's
    // " +$" would (its $ matches before a final line terminator)
    assert(graft.queries.TextDedupQueries.bpeSyms0("ab\n") == "a b \n")
    assert(graft.queries.TextDedupQueries.bpeSyms0("ab") == "a b")
    assert(graft.queries.TextDedupQueries.bpeSyms0("a\nb") == "a \nb")
  }
}

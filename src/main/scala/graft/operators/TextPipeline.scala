package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, shingling, minhash signatures, simhash, quality scoring,
  * language-ID heuristics, and document fingerprinting.
  *
  * Everything here is built from codegen'd Catalyst expressions (no UDFs):
  * at 100 TB these run inside WholeStageCodegen over the scan, shuffle only
  * at the final per-doc aggregation, and never materialize token lists
  * beyond the row being processed.
  */
object TextPipeline {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word k-shingles from a *materialized* token-array column (k consecutive
    * tokens joined). Docs shorter than k tokens yield an empty array
    * (`sequence(0, n-k)` would otherwise count DOWN and index out of range). */
  def shinglesFromTokens(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o + 1)): _*)))

  /** Word k-shingles straight from text. NOTE: prefer materializing the
    * token array in its own projection (`withColumn("toks", tokens(text))`)
    * and calling [[shinglesFromTokens]] — a lambda over `split(text)`
    * re-evaluates the split per element (O(tokens^2) per document), and
    * CollapseProject will NOT re-inline a non-cheap expression used many
    * times, so the two-step form evaluates the split once per row. */
  def wordShingles(text: Column, k: Int): Column =
    shinglesFromTokens(tokens(text), k)

  /** One deterministic minhash value: lexicographic min of seeded md5 over
    * the shingle set. Strings compare identically in every engine, which
    * keeps the signature oracle-checkable (no platform hash involved). */
  private def seededHash(seed: Int, shingle: Column): Column =
    md5(concat_ws(":", lit(seed), shingle))

  /** (id, shingle) pairs -> one row per id with h0..h{n-1} signature cols. */
  def minhashSignature(shingled: DataFrame, idCol: String, shingleCol: String,
                       numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(s =>
      min(seededHash(s, col(shingleCol))).as(s"h$s"))
    shingled.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** One row per (band, id, band_val) for a minhash signature frame.
    *
    * Single-pass posexplode over an array of per-band concats — NOT a
    * union of per-band projections: Spark does not reuse the exchange
    * between union branches here, so the union form recomputed the whole
    * shingle→minhash aggregation once per band. One generator over one
    * signature evaluation is the shape that survives wide banding
    * (16–32 bands at corpus scale = 16–32× saved signature passes). */
  private def bandedRows(sig: DataFrame, idCol: String,
                         numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandVals = (0 until bands).map { b =>
      concat_ws("|",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i")): _*)
    }
    sig.select(col(idCol), posexplode(array(bandVals: _*)).as(Seq("band", "band_val")))
  }

  /** Default bucket-size cap: a band bucket of b docs yields b(b-1)/2
    * candidate pairs on one shuffle key, so uncapped buckets turn heavy
    * boilerplate into a quadratic blow-up on a single task — the classic
    * dedup skew failure at corpus scale. 1000 docs -> ~500k pairs per
    * bucket, still a bounded task. */
  val DefaultMaxBucket = 1000

  /** LSH banding over a minhash signature: band value = concat of its rows.
    * Candidate pairs are ids sharing any band value — the classic
    * shingle -> minhash -> band -> bucket-join pipeline; each band join is
    * an equi-join on the band hash, so Spark shuffles on band value and
    * never compares documents across buckets.
    *
    * Buckets larger than `maxBucket` are DROPPED from pair generation (the
    * count comes from a window over the same shuffle key the join uses, so
    * the cap costs no extra shuffle). A bucket that big means the band
    * value is boilerplate, not signal; the dropped buckets are auditable
    * via [[lshDroppedBuckets]] with the same arguments. */
  def lshCandidatePairs(sig: DataFrame, idCol: String,
                        numHashes: Int, bands: Int,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = bandedRows(sig, idCol, numHashes, bands)
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_val")))
      .filter(col("bucket_n") <= maxBucket)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_val"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Audit output for the cap: one row per dropped (band, band_val) with
    * its size — "what did dedup refuse to pair, and how big was it". */
  def lshDroppedBuckets(sig: DataFrame, idCol: String,
                        numHashes: Int, bands: Int,
                        maxBucket: Int = DefaultMaxBucket): DataFrame =
    bandedRows(sig, idCol, numHashes, bands)
      .groupBy("band", "band_val")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Incremental (batch-vs-index) near-dup detection — the production
    * shape of dedup on a GROWING corpus: the already-indexed corpus is a
    * persisted band table; an incoming batch is flagged against it without
    * ever re-pairing the corpus with itself. One row per incoming doc
    * (with a signature): candidate count, best signature agreement, and
    * the ≥`minAgree`/`numHashes` duplicate verdict.
    *
    * Scale shape: at 100 TB the indexed band rows are a bucketed table
    * partitioned by (band, band_val) written once at index build, so this
    * join shuffles ONLY the incoming batch (or broadcasts it when small) —
    * the corpus-sized side never moves. The bucket cap is applied to the
    * INDEXED side (a boilerplate band value in the index would otherwise
    * glue every future batch to it); refused buckets are auditable via
    * [[lshDroppedBuckets]] over the indexed signatures. */
  def incrementalDupFlags(indexedSig: DataFrame, incomingSig: DataFrame,
                          idCol: String, numHashes: Int, bands: Int,
                          minAgree: Int,
                          maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val idxBands = bandedRows(indexedSig, idCol, numHashes, bands)
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_val")))
      .filter(col("bucket_n") <= maxBucket)
      .select(col(idCol).as("idx_id"), col("band"), col("band_val"))
    val incBands = bandedRows(incomingSig, idCol, numHashes, bands)
      .select(col(idCol).as("inc_id"), col("band"), col("band_val"))
    val cands = incBands.join(idxBands, Seq("band", "band_val"))
      .select("inc_id", "idx_id").distinct()
    val agree = (0 until numHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    val per = cands
      .join(incomingSig.as("a"), col("inc_id") === col(s"a.$idCol"))
      .join(indexedSig.as("b"), col("idx_id") === col(s"b.$idCol"))
      .select(col("inc_id"), agree.as("agree"))
      .groupBy("inc_id")
      .agg(count(lit(1)).as("n_candidates"), max("agree").as("best_agree"))
    incomingSig.select(col(idCol).as("inc_id"))
      .join(per, Seq("inc_id"), "left")
      .select(col("inc_id").as(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("best_agree"), lit(0)).as("best_agree"),
        (coalesce(col("best_agree"), lit(0)) >= minAgree).as("is_dup"))
  }

  // ------------------------------------------------------------------ simhash (64-bit)

  /** 64-bit SimHash per document, materialized as four 16-bit band columns
    * `sim0..sim3` (band k = md5 hex digits 4k..4k+3, i.e. bits 16k..16k+15
    * of the fingerprint). Each distinct token votes ±1 on all 64 bit
    * positions of md5(token); the sign of the vote sum becomes the output
    * bit.
    *
    * The band-column representation is deliberate: the four 16-bit ints ARE
    * the LSH band keys downstream (band-value cardinality 65,536 per band,
    * so buckets stay tiny at corpus scale — this replaces a 16-bit/4-bit
    * scheme whose 16 possible band values made every bucket 1/16th of the
    * corpus, a cross-product in disguise), and all arithmetic stays inside
    * 32-bit integers, which every engine shifts identically (no 64-bit
    * `1 << 63` sign traps in the oracle). Pure codegen expressions,
    * two map-side-combined aggregations — no UDF. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
    // one row per (doc, md5 hex digit position p in 0..15): digit value 0..15
    val digs = toks.withColumn("p", explode(sequence(lit(0), lit(15))))
      .withColumn("v",
        expr("locate(substring(md5(tok), cast(p as int) + 1, 1), '0123456789abcdef') - 1"))
    // the digit's 4 bit votes in one aggregation pass (explode is x16 per
    // token, not x64 — each row carries 4 of the 64 bit positions)
    val votes = digs.groupBy(col(idCol), col("p"))
      .agg(
        sum(expr("(v % 2) * 2 - 1")).as("s0"),
        sum(expr("(shiftright(v, 1) % 2) * 2 - 1")).as("s1"),
        sum(expr("(shiftright(v, 2) % 2) * 2 - 1")).as("s2"),
        sum(expr("(shiftright(v, 3) % 2) * 2 - 1")).as("s3"))
      .withColumn("nib",
        expr("if(s0 > 0, 1, 0) + 2 * if(s1 > 0, 1, 0) + 4 * if(s2 > 0, 1, 0) + 8 * if(s3 > 0, 1, 0)"))
    val bands = (0 until 4).map(k =>
      sum(when(col("p").between(k * 4, k * 4 + 3),
        expr("shiftleft(nib, cast((p % 4) * 4 as int))")).otherwise(0))
        .cast("int").as(s"sim$k"))
    votes.groupBy(idCol).agg(bands.head, bands.tail: _*)
  }

  /** One row per (band b in 0..3, band_val, id) for a [[simhash64]] frame. */
  def simhashBanded(sim: DataFrame, idCol: String): DataFrame =
    sim.withColumn("b", explode(sequence(lit(0), lit(3))))
      .withColumn("band_val", element_at(
        array(col("sim0"), col("sim1"), col("sim2"), col("sim3")), col("b") + 1))

  /** SimHash near-dup candidate pairs: equi-join per 16-bit band
    * (pigeonhole: hamming ≤ 3 over 64 bits ⟹ at least one of the 4 bands
    * identical), then exact hamming via bit_count per band part. One
    * shuffle on the band key; buckets larger than `maxBucket` are dropped
    * exactly like the MinHash path ([[lshCandidatePairs]]) — audit with
    * [[simhashDroppedBuckets]]. */
  def simhashPairs(sim: DataFrame, idCol: String, maxHamming: Int = 3,
                   maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = simhashBanded(sim, idCol)
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("b", "band_val")))
      .filter(col("bucket_n") <= maxBucket)
    val lhs = banded.select(col(idCol).as("id_a"), col("b"), col("band_val"),
      col("sim0").as("a0"), col("sim1").as("a1"), col("sim2").as("a2"), col("sim3").as("a3"))
    val rhs = banded.select(col(idCol).as("id_b"), col("b"), col("band_val"),
      col("sim0").as("b0"), col("sim1").as("b1"), col("sim2").as("b2"), col("sim3").as("b3"))
    lhs.join(rhs, Seq("b", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "a0", "a1", "a2", "a3", "b0", "b1", "b2", "b3")
      .distinct()
      .withColumn("hamming", expr(
        "cast(bit_count(a0 ^ b0) + bit_count(a1 ^ b1) + bit_count(a2 ^ b2) + bit_count(a3 ^ b3) as int)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Audit for the [[simhashPairs]] cap: one row per dropped (b, band_val)
    * with its size. */
  def simhashDroppedBuckets(sim: DataFrame, idCol: String,
                            maxBucket: Int = DefaultMaxBucket): DataFrame =
    simhashBanded(sim, idCol)
      .groupBy("b", "band_val")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Estimated jaccard from signature agreement of two joined signatures
    * (columns suffixed _a / _b). */
  def signatureAgreement(numHashes: Int): Column =
    round((0 until numHashes)
      .map(i => when(col(s"h${i}_a") === col(s"h${i}_b"), 1).otherwise(0))
      .reduce((x, y) => x + y).cast("double") / numHashes, 4)

  /** Stopword list shared by quality scoring and its oracle SQL. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality metrics (length / punctuation / stopword ratios) + bucket. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val stopCount = size(filter(toks, x => x.isInCollection(stopwords)))
    val punct = length(t) - length(regexp_replace(t, "[.!?,;:]", ""))
    df.withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("avg_token_len",
        round((length(t) - size(toks) + 1).cast("double") / size(toks), 4))
      .withColumn("punct_ratio", round(punct.cast("double") / length(t), 4))
      .withColumn("stopword_ratio", round(stopCount.cast("double") / size(toks), 4))
      .withColumn("quality_bucket",
        when(col("n_tokens") < 20, "too_short")
          .when(col("stopword_ratio") > 0.4, "boilerplate")
          .when(col("punct_ratio") > 0.1, "punct_heavy")
          .otherwise("ok"))
  }

  /** Marker-word language scores + argmax decision (n-gram heuristic in the
    * stopword sense; deterministic priority on ties). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "un", "une"))

  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang",
        size(filter(toks, x => x.isInCollection(markers))).cast("long"))
    }
    val Seq(en, es, de, fr) = Seq("en", "es", "de", "fr").map(l => col(s"score_$l"))
    scored.withColumn("predicted_lang",
      when(en + es + de + fr === 0, "und")
        .when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr"))
  }

  /** Positional polynomial fingerprint over characters: exact integer math,
    * reproducible in any engine (rolling-hash family, §builder prompt).
    * NOTE: this is the composed/explode form kept for oracle-checkable
    * composition; the production path is the one-pass scalar
    * [[graft.plans.Fingerprint64Expr]] (`fingerprint64(text)`) — this form
    * shuffles one row per CHARACTER, which is the wrong shape at scale. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "")))
      .select(col(idCol), (col("pos") + 1).as("i"), ascii(col("col")).as("cp"))
      .groupBy(idCol)
      .agg((sum(col("cp") * ((col("i") * 2654435761L) % 1000003)) % 1000000007L)
        .as("fingerprint"))
}

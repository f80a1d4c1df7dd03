package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text/set primitives for the data-pipeline operators
  * (dedup, fingerprinting, similarity). Everything is built from
  * codegen'd `org.apache.spark.sql.functions` (higher-order array
  * functions, xxhash64) — no UDFs in the hot path, so whole-stage
  * codegen spans hold.
  */
object TextOps {

  /** Whitespace tokens; trimmed first so no empty tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct n-word shingles; whole trimmed text if < n tokens.
    * Uses transform(sequence(...)) so the shingle loop runs inside
    * codegen rather than a UDF. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) < n, array(concat_ws(" ", t)))
        .otherwise(transform(
          sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n))))))
  }

  /** Distinct character n-grams; whole text if shorter than n. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) < n, array(text))
        .otherwise(transform(
          sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n)))))

  /** (id, shingle) ROWS — the scale formulation of `wordShingles`:
    * one split per document (posexplode) and a window lead pass build
    * the n-token windows entirely in codegen, where the
    * array-returning `transform(...slice...)` lambda evaluates
    * interpreted and re-derives the token array per element (~60×
    * slower measured). Documents shorter than n tokens contribute
    * their whole trimmed text. Rows may repeat (duplicate shingles);
    * downstream consumers are duplicate-insensitive (min-hash) or
    * dedup via collect_set — cheaper than a global distinct shuffle.
    */
  def wordShingleRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("_pos", "_tok")))
    if (n == 1) return toks.select(col(idCol), col("_tok").as("_el"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    val leads = (1 until n).map(j => lead(col("_tok"), j).over(w))
    val shingled = toks
      .select(col(idCol), concat_ws(" ", (col("_tok") +: leads): _*).as("_el"),
        leads.last.isNotNull.as("_full"))
      .filter(col("_full"))
      .select(col(idCol), col("_el"))
    // docs with < n tokens: fall back to the whole trimmed text
    // (computed narrowly from the source — no join back)
    val short = df
      .filter(size(tokens(col(textCol))) < n)
      .select(col(idCol), trim(col(textCol)).as("_el"))
    shingled.union(short)
  }

  /** (id, char n-gram) rows — explode positions, substring in codegen;
    * short texts yield themselves. May contain duplicates (see
    * wordShingleRows). */
  def charNgramRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      explode(sequence(lit(1), greatest(length(col(textCol)) - (n - 1), lit(1))))
        .as("_i"), col(textCol))
      .select(col(idCol), col(textCol).substr(col("_i"), lit(n)).as("_el"))

  /** MinHash-LSH candidate pairs.
    *
    * Pipeline (all distributed, one shuffle per stage):
    *   1. explode the set column → (id, element)
    *   2. one hash-aggregate computes all `numHashes` minhash values
    *      per id in a single pass (min(xxhash64(elem, seed_i)))
    *   3. band signatures = xxhash64 over each band's minhashes;
    *      explode to (id, band, bucket)
    *   4. self-equi-join on (band, bucket) with id< ordering → pairs
    *
    * Oversized buckets (degenerate content, e.g. empty docs) are
    * capped at `maxBucketSize` — the standard guard that keeps a
    * skewed bucket from producing O(bucket²) candidates at scale.
    * Candidates must still be verified with an exact measure
    * (`jaccardJoin`), so the cap costs recall only on pathological
    * buckets.
    */
  def lshCandidates(
      docs: DataFrame,
      idCol: String,
      setCol: String,
      numHashes: Int,
      rowsPerBand: Int,
      maxBucketSize: Int = 100): DataFrame =
    lshCandidatesFromRows(
      docs.select(col(idCol), explode(col(setCol)).as("_el")),
      idCol, numHashes, rowsPerBand, maxBucketSize)

  /** Same, from pre-exploded (id, _el) element rows (pairs with
    * wordShingleRows/charNgramRows so sets are never materialized as
    * arrays for the signature pass). */
  def lshCandidatesFromRows(
      rows: DataFrame,
      idCol: String,
      numHashes: Int,
      rowsPerBand: Int,
      maxBucketSize: Int): DataFrame =
    candidatesFromSignatures(
      signatures(rows, idCol, numHashes),
      idCol, numHashes, rowsPerBand, maxBucketSize)

  /** Per-id minhash signature row (`numHashes` `_mh<i>` columns).
    *
    * One strong hash per element, then numHashes cheap universal-hash
    * rehashes (odd-constant multiply-add on int64, wrapping): ~30×
    * fewer hash evaluations than hashing each element per seed, and
    * the multiply-adds stay inside codegen. Wrapping arithmetic needs
    * a custom expression because ANSI mode raises on long overflow.
    */
  private def signatures(rows: DataFrame, idCol: String,
      numHashes: Int): DataFrame = {
    graft.functions.HashOps.register(rows.sparkSession)
    val exploded = rows.select(col(idCol), xxhash64(col("_el")).as("_h"))
    def mixConst(i: Int, salt: Long): Long = {
      var z = i.toLong * 0x9e3779b97f4a7c15L + salt
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) | 1L // odd multiplier
    }
    val mhAggs = (0 until numHashes).map { i =>
      min(graft.functions.HashOps.mulAdd(col("_h"),
        mixConst(i, 0x51ab5f1cL), mixConst(i, 0x7e21))).as(s"_mh$i")
    }
    exploded.groupBy(col(idCol)).agg(mhAggs.head, mhAggs.tail: _*)
  }

  /** Banded-LSH candidate pairs from a signature frame. */
  private def candidatesFromSignatures(
      mh: DataFrame,
      idCol: String,
      numHashes: Int,
      rowsPerBand: Int,
      maxBucketSize: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val nBands = numHashes / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val bandHashInputs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"_mh$i")) :+ lit(b)
      struct(lit(b).as("band"), xxhash64(bandHashInputs: _*).as("bucket"))
    }
    val buckets = mh
      .select(col(idCol), explode(array(bandStructs: _*)).as("_bb"))
      .select(col(idCol), col("_bb.band").as("band"), col("_bb.bucket").as("bucket"))

    val sized = buckets
      .join(
        buckets.groupBy(col("band"), col("bucket")).count()
          .filter(col("count") <= maxBucketSize)
          .select(col("band"), col("bucket")),
        Seq("band", "bucket"))

    sized.as("x")
      .join(sized.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .distinct()
  }

  /** Wide (multi-word) SimHash near-dup pairs: `words`×64-bit
    * signatures, pigeonhole bucketing, exact Hamming verification.
    *
    * This is the scale path for dd04's collision math: Hamming ≤ r
    * needs r+1 chunks (r differing bits can touch at most r of them),
    * and chunk VALUE SPACE is what bounds false candidates — 9 chunks
    * of a 64-bit signature are only 7 bits wide (2⁷ values → ~9·n²/2⁷
    * candidate pairs), while 9 chunks of a 128-bit signature are 14
    * bits wide (2¹⁴ values → 128× fewer collisions for the same plan
    * shape). The per-token cost doubles (two xxhash seeds instead of
    * one); everything stays codegen.
    *
    * Returns (a_id, b_id, hamming) for pairs at Hamming ≤ radius over
    * the full `64·words`-bit signature. Bucketing is LOSSLESS (the
    * pigeonhole guarantee, asserted against brute force in ExtSpec).
    */
  /** Per-id `words`×64-bit SimHash signatures as `_sig0.._sigN`
    * columns — per-word token hashes from independent xxhash seeds,
    * all bit counters in ONE aggregation pass. */
  def simhashWideSignatures(
      tok: DataFrame, // (idCol, "tok") token rows
      idCol: String,
      words: Int): DataFrame = {
    require(words >= 1)
    val hashed = tok.select(col(idCol) +: (0 until words).map(w =>
      xxhash64(col("tok"), lit(w)).as(s"_h$w")): _*)
    val bitSums = for (w <- 0 until words; b <- 0 until 64) yield
      sum(when(expr(s"(_h$w >> $b) & 1") === 1, 1).otherwise(-1)).as(s"_w${w}b$b")
    hashed.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol) +: (0 until words).map { w =>
        (0 until 64).map(b => when(col(s"_w${w}b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as(s"_sig$w")
      }: _*)
  }

  def simhashWidePairs(
      tok: DataFrame, // (idCol, "tok") token rows
      idCol: String,
      words: Int,
      radius: Int): DataFrame = {
    require(words >= 1 && radius >= 0)
    val nBits = 64 * words
    val nChunks = radius + 1
    val sig = simhashWideSignatures(tok, idCol, words)
    // chunk boundaries partition [0, nBits); width nBits/nChunks with
    // the remainder spread over the leading chunks
    val base = nBits / nChunks
    val starts = (0 until nChunks).scanLeft(0) { (s, c) =>
      s + base + (if (c < nBits % nChunks) 1 else 0)
    }
    def chunkExpr(c: Int): Column = {
      val start = starts(c); val end = starts(c + 1); val width = end - start
      val loWord = start / 64; val hiWord = (end - 1) / 64
      val off = start % 64
      if (loWord == hiWord)
        expr(s"(_sig$loWord >> $off) & ${(1L << width) - 1}")
      else {
        // spans two words: low bits from loWord, high bits from hiWord
        val loBits = 64 - off
        expr(s"((_sig$loWord >> $off) & ${(1L << loBits) - 1}) | " +
          s"((_sig$hiWord & ${(1L << (width - loBits)) - 1}) << $loBits)")
      }
    }
    val chunks = sig.select(col(idCol) +: (0 until words).map(w => col(s"_sig$w")) :+
      explode(array((0 until nChunks).map(c =>
        struct(lit(c).as("c"), chunkExpr(c).as("v"))): _*)).as("ch"): _*)
      .select(col(idCol) +: (0 until words).map(w => col(s"_sig$w")) :+
        col("ch.c").as("c") :+ col("ch.v").as("v"): _*)
    val ham = (0 until words).map(w =>
      expr(s"bit_count(x._sig$w ^ y._sig$w)")).reduce(_ + _).cast("long")
    chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"),
        ham.as("hamming"))
      .filter(col("hamming") <= radius)
      .distinct()
  }

  /** A banded-LSH parameterization. */
  case class LshConfig(numHashes: Int, rowsPerBand: Int) {
    def bands: Int = numHashes / rowsPerBand
    /** P[some band collides] for a pair at Jaccard j: 1 − (1 − j^r)^b. */
    def recallAt(j: Double): Double =
      1.0 - math.pow(1.0 - math.pow(j, rowsPerBand), bands)
  }

  /** Auto-tune (numHashes, rowsPerBand) for a target Jaccard threshold.
    *
    * Two-stage: (1) the S-curve formula keeps only configs whose
    * THEORETICAL recall at the threshold clears `minRecall` — that part
    * is corpus-independent; (2) the surviving configs are probed on a
    * deterministic sample of the actual corpus and the one generating
    * the fewest candidate pairs wins (ties to fewer hashes). Stage 2 is
    * the candidate-rate feedback that fixed-formula tuning lacks: a
    * corpus with high background similarity (shared vocabulary) floods
    * loose bands with false candidates that exact verification then
    * pays for, so the cheapest config shifts with the data.
    *
    * Cost: |viable| probe runs over `sampleDocs` documents — O(sample)
    * each, independent of corpus size, so tuning at 100 TB costs the
    * same as tuning locally.
    */
  def tuneLsh(
      rows: DataFrame,
      idCol: String,
      threshNum: Int,
      threshDen: Int,
      minRecall: Double = 0.8,
      hashGrid: Seq[Int] = Seq(24, 36, 48),
      sampleDocs: Int = 500,
      maxBucketSize: Int = 100): LshConfig = {
    val j = threshNum.toDouble / threshDen
    val viable = for {
      h <- hashGrid
      r <- (2 to h).filter(h % _ == 0)
      cfg = LshConfig(h, r)
      if cfg.recallAt(j) >= minRecall
    } yield cfg
    require(viable.nonEmpty,
      s"no (hashes, rowsPerBand) config reaches recall $minRecall at j=$j")
    // deterministic pseudo-random doc sample: lowest salted hash of id
    val sampleIds = rows.select(col(idCol)).distinct()
      .orderBy(xxhash64(col(idCol), lit(7)), col(idCol))
      .limit(sampleDocs)
    val sample = rows.join(broadcast(sampleIds), Seq(idCol)).persist()
    try {
      sample.count()
      viable.minBy { cfg =>
        // probe UNCAPPED: the production bucket cap would silently drop
        // a flooding config's giant buckets, making it look cheap while
        // actually destroying its recall — the probe must see the true
        // candidate rate
        (lshCandidatesFromRows(sample, idCol, cfg.numHashes, cfg.rowsPerBand,
          maxBucketSize = Int.MaxValue).count(), cfg.numHashes.toLong)
      }
    } finally { sample.unpersist(false); () }
  }

  /** LSH near-dup end-to-end: banded candidates + exact Jaccard
    * verification (|∩|·den ≥ |∪|·num, integer-exact).
    *
    * Two single-purpose aggregations, NOT one combined pass: folding
    * collect_set into the signature groupBy forces the whole agg into
    * ObjectHashAggregate (collect_set has no codegen path), which
    * de-codegens the 36 minhash min-updates per element row — measured
    * ~2× slower end-to-end than paying a second, purely-object
    * collect_set pass while the minhash agg stays whole-stage-codegen.
    * The set agg's exchange is still reused across both verify-join
    * sides (AQE ReuseExchange). */
  def lshNearDupPairs(
      rows: DataFrame,
      idCol: String,
      numHashes: Int,
      rowsPerBand: Int,
      maxBucketSize: Int,
      threshNum: Int,
      threshDen: Int): DataFrame = {
    val sets = rows.groupBy(col(idCol)).agg(collect_set(col("_el")).as("_set"))
    val cand = lshCandidatesFromRows(rows, idCol, numHashes, rowsPerBand, maxBucketSize)
    jaccardJoin(cand, sets, idCol, "_set", threshNum, threshDen)
  }

  /** Attach both sides' sets to candidate pairs and keep pairs with
    * Jaccard ≥ threshNum/threshDen — the comparison is pure integer
    * arithmetic (|∩|·den ≥ |∪|·num), no float boundary issues.
    * Output: a_id, b_id, inter, uni. */
  def jaccardJoin(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      setCol: String,
      threshNum: Int,
      threshDen: Int): DataFrame = {
    val a = docs.select(col(idCol).as("a_id"), col(setCol).as("_sa"))
    val b = docs.select(col(idCol).as("b_id"), col(setCol).as("_sb"))
    pairs.join(a, "a_id").join(b, "b_id")
      .withColumn("inter", size(array_intersect(col("_sa"), col("_sb"))).cast("long"))
      .withColumn("uni", size(array_union(col("_sa"), col("_sb"))).cast("long"))
      .filter(col("inter") * threshDen >= col("uni") * threshNum)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"))
  }

}

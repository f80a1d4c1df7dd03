package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CatalogQuery
import graft.sources.Tables

/** Deduplication operators over the `documents` / `embeddings` tables —
  * the training-data-pipeline surface (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup).
  *
  * Design for 100 TB: every variant is candidate-generation (hash
  * bucketing, O(n) shuffle) followed by exact verification on candidate
  * pairs only — never an O(n²) cross join (the one brute-force variant,
  * dd06, is the small-side baseline; its scale path is dd12's LSH
  * bucketing). Thresholds compare in integer arithmetic so results are
  * reproducible under any partitioning.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** dd06's edge set, shared with dd08's clustering: all embedding pairs
    * with cosine ≥ 0.4 (unordered; callers sort). Engine-identical to the
    * DuckDB oracle because both sides normalize and dot in DOUBLE. */
  private def embeddingNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorOps.register(s)
    import graft.functions.VectorOps
    // normalize once per vector (O(n)), so each of the O(n²) pair
    // evaluations is a single codegen'd dot product
    val e = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"),
        VectorOps.normalize(col("embedding").cast("array<double>")).as("nv"))
    // guard: this baseline is quadratic BY DESIGN; refuse corpora
    // where the pair count would blow up instead of silently
    // burning a cluster (the scale path is dd12's LSH bucketing)
    val cap = s.conf.getOption("graft.ext.allPairsMaxRows")
      .map(_.toLong).getOrElse(200000L)
    val n = e.count()
    require(n <= cap,
      s"dd06_embedding_neardup is the O(n²) exact baseline: corpus has " +
        s"$n rows > cap $cap. Use dd12 (LSH bucketing) at scale, or raise " +
        "spark.conf graft.ext.allPairsMaxRows to override.")
    // the cosine test lives INSIDE the join condition: the
    // nested-loop join then evaluates it on the in-flight row pair
    // and only materializes output rows for true near-dups — with
    // it as a post-join filter, every one of the O(n²) pairs copies
    // two 64-double arrays into an output row first (the dominant
    // cost is that memory traffic, not the dot products)
    val cos = VectorOps.dot(col("a.nv"), col("b.nv"))
    e.as("a").join(e.as("b"),
        col("a.vec_id") < col("b.vec_id") && cos >= 0.4)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(cos * 1e6).cast("long").as("cos_e6"))
  }

  /** Shared DuckDB oracle for dd08 and dd16 — both compute min-id
    * component labels over the cosine ≥ 0.4 pair graph; the oracle's
    * recursive CTE materializes full reachability then takes the min
    * (fine at oracle scale; the Spark sides are the scale paths). */
  private val ccOracleSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id,
      |    CASE WHEN list_dot_product(v, v) = 0 THEN v
      |         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
      |    END AS nv
      |  FROM e),
      |p AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.nv, b.nv) >= 0.4),
      |ed AS (SELECT a_id AS s, b_id AS d FROM p
      |       UNION ALL SELECT b_id, a_id FROM p),
      |verts AS (SELECT DISTINCT s AS v FROM ed),
      |reach(v, x) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT r.v, ed.d FROM reach r JOIN ed ON ed.s = r.x)
      |SELECT v AS vec_id, CAST(min(x) AS BIGINT) AS component
      |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin

  /** One large-star round: for each node u of the undirected view,
    * m = min(N(u) ∪ {u}); rewire every strictly-larger neighbor to m.
    * Output edges satisfy u > v (child → smaller parent). */
  private def largeStar(e: DataFrame): DataFrame = {
    // repartition(u) BEFORE the two references (r17, guide §2.4): the
    // groupBy and the join both need `und` clustered by u; expressed as
    // two independent reads, each planned its own exchange and the und
    // subplan evaluated twice. One explicit repartition makes both
    // required distributions already-satisfied, so the shuffle is
    // planned once (ReusedExchange on the second reference) and the
    // union+project under it runs once.
    val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
    val mins = und.groupBy(col("u")).agg(min(col("v")).as("mn"))
    // No trailing distinct (r17): largeStar's output feeds ONLY
    // smallStar, whose groupBy-min is duplicate-insensitive and whose
    // own trailing distinct dedups the round's result — the result
    // relation is identical, and each round saves one full |E|-row
    // exchange + aggregation. Output volume stays <= |E| rows (one per
    // undirected edge), so nothing blows up between the stars.
    und.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
  }

  /** One small-star round over child→parent edges (u > v invariant):
    * for each u, m = min(parents(u)); rewire u and every non-min
    * parent to m. Preserves the u > v invariant. */
  private def smallStar(e: DataFrame): DataFrame = {
    // same repartition-for-reuse shape as largeStar: smallStar's input
    // is largeStar's (unmaterialized) output, which the groupBy and the
    // join would otherwise each recompute AND re-shuffle; clustering it
    // once by u makes the second reference a ReusedExchange.
    val ep = e.repartition(col("u"))
    val mins = ep.groupBy(col("u")).agg(min(col("v")).as("m"))
    ep.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Connected components by alternating large-star / small-star
    * contraction ("Connected Components in MapReduce and Beyond",
    * Kiveris et al. 2014) — the round-robust scale path next to
    * [[minLabelComponents]]. Min-label propagation needs rounds =
    * component DIAMETER: ideal for near-dup clusters (star-like,
    * diameter ≤ ~3), catastrophic for chain-shaped components
    * (co-reference chains, adversarial layouts — O(n) rounds). Star
    * contraction roughly halves tree heights every (large, small)
    * pair, converging in O(log n) rounds on ANY topology; each round
    * is one aggregation + one co-partitioned join per star, the same
    * per-round cost class as a propagation round. Convergence test =
    * (count, hash-sum) signature equality of the edge relation — one
    * tiny driver-side pair per round, never the edges themselves.
    * Returns (v, lbl = min id of v's component) over exactly the
    * vertex set of `pairs`, plus the round count (spec surface). */
  private[graft] def starComponentsWithRounds(
      pairs: DataFrame, what: String): (DataFrame, Int) = {
    var e = pairs.toDF("u", "v")
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    var prev = (-1L, 0L)
    var rounds = 0
    var converged = false
    var prevEdges: DataFrame = null
    // dev-only per-round forensics, same switch as minLabelComponents
    val ccLog = sys.env.contains("SPARK_GRAFT_CC_LOG")
    while (!converged && rounds < 30) {
      val t0 = if (ccLog) System.nanoTime() else 0L
      prevEdges = e
      // The (count, bit_xor-hash) convergence signature rides INSIDE
      // the checkpoint job as observed metrics (r17, same move as
      // minLabelComponents): the loop is per-job latency at sf0.1, and
      // a separate signature collect doubled the jobs per round. The
      // metrics aggregate exactly the rows the checkpoint materializes.
      // bit_xor, not sum: order-independent AND overflow-free under
      // ANSI mode (sum of 64-bit hashes throws ARITHMETIC_OVERFLOW).
      val obs = org.apache.spark.sql.Observation()
      e = smallStar(largeStar(e))
        .observe(obs, count(lit(1)).as("n"),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h"))
        .localCheckpoint(true)
      val m = obs.getAsJava
      val cur = (m.get("n").asInstanceOf[java.lang.Long].longValue(),
        m.get("h").asInstanceOf[java.lang.Long].longValue())
      converged = cur == prev
      prev = cur
      rounds += 1
      if (ccLog) println(f"[cc:$what] star round $rounds%2d: " +
        f"${cur._1}%8d edges, ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    require(converged,
      s"$what star contraction did not converge within $rounds rounds")
    // The signature is a (count, bit_xor-hash) pair — a collision
    // across rounds would declare convergence early and emit wrong
    // labels with no error. Confirm the fixpoint EXACTLY: at
    // convergence the edge relation is tiny relative to the input
    // (child→root stars), so one symmetric except() is cheap, and it
    // runs once, not per round.
    val drift = e.except(prevEdges).count() + prevEdges.except(e).count()
    require(drift == 0L,
      s"$what star contraction signature collision: relation still " +
        s"moving at declared fixpoint ($drift differing edges)")
    // at the fixpoint e is child→root star edges; roots never appear
    // as a child, so label = root where an edge exists, self otherwise
    val verts = pairs.select(col("a_id").as("x"))
      .union(pairs.select(col("b_id").as("x"))).distinct()
    val labels = verts.join(e, verts("x") === e("u"), "left")
      .select(col("x").as("v"), coalesce(e("v"), col("x")).as("lbl"))
    (labels, rounds)
  }

  /** Connected components over an undirected pair set (a_id, b_id) by
    * Pregel-style iterative min-label propagation; returns (v, lbl)
    * with lbl = min id reachable from v. Shared by dd08 (cosine pairs)
    * and dd10 (LSH-verified Jaccard pairs).
    *
    * Each propagation hop is one shuffle join edges⋈labels + one
    * aggregation; hops needed = component diameter, and near-dup
    * clusters are star-like (diameter ≤ ~3), so the driver loop runs
    * O(1) distributed passes — this is the standard distributed
    * connected-components shape at cluster scale, not a driver-side
    * algorithm. Since r18 each MATERIALIZED round runs two hops (see
    * the in-loop note): hop semantics and final labels are untouched,
    * but driver jobs, convergence counts and checkpoint writes halve.
    * localCheckpoint truncates the growing lineage each round (blocks
    * are context-cleaned when the round's RDD is dropped; Bench/driver
    * also clear caches per query). */
  private[graft] def minLabelComponents(pairs: DataFrame, what: String): DataFrame = {
    // undirected: propagate labels along both edge directions.
    // Deliberately cached UNPARTITIONED (r17): a hash(src)-pinned cache
    // would save the per-round edge exchange, but it also pins every
    // downstream stage to the pinned partition count, defeating AQE's
    // scale-adaptive coalescing — measured 1.8× WORSE at sf0.1/local[32]
    // (cc_loop 3.8 → 6.8 s) because each of the loop's tiny stages ran
    // at 32 tasks instead of the 1-2 AQE picks from actual bytes. With
    // two hops per materialized round (below) the edge exchange is
    // paid twice per checkpoint — half the rounds of the one-hop
    // shape for the same hop count; AQE sizes it from bytes at any
    // scale. (Full O(log n)-round robustness on chain graphs is
    // dd16's star-contraction engine, not this loop.)
    val edges = pairs
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .toDF("src", "dst").persist()
    try {
      // seed with the 1-hop minimum (one aggregation) rather than
      // identity labels: it is exactly identity-init plus the first
      // propagation round, so the loop starts a round ahead and the
      // identity-init distinct-shuffle disappears (every vertex
      // appears as dst because edges carry both directions)
      // Sub-phase attribution (OpMetrics, the ss03 lesson): the eager
      // seed checkpoint forces the ENTIRE upstream pair pipeline
      // (shingle → LSH → verify for dd10) plus the 1-hop minimum, and
      // the loop is pure propagation — two different cost stories a
      // single bench number conflates. "<what>_pairs_seed" /
      // "<what>_cc_loop" medians surface in Bench's decomp line, so an
      // episode names the phase it hit.
      var labels = graft.core.OpMetrics.timed(s"${what}_pairs_seed") {
        edges.groupBy(col("dst"))
          .agg(min(col("src")).as("mn"))
          .select(col("dst").as("v"), least(col("dst"), col("mn")).as("lbl"))
          .localCheckpoint(true)
      }
      var converged = false
      var iters = 0
      // dev-only per-round forensics (rounds vs time-per-round — the
      // two candidate costs of an iterative CC at scale); inert unless
      // SPARK_GRAFT_CC_LOG is set, which bench/verify never set
      val ccLog = sys.env.contains("SPARK_GRAFT_CC_LOG")
      graft.core.OpMetrics.timed(s"${what}_cc_loop") {
      while (!converged && iters < 25) {
        val t0 = if (ccLog) System.nanoTime() else 0L
        // TWO propagation hops per MATERIALIZED round (r18 — the r17
        // scaladoc promised this but the loop still checkpointed every
        // hop; ADVICE flagged the mismatch, this lands the change).
        // Labels are monotone non-increasing under least(), so fusing
        // two hops into one lineage segment changes nothing about the
        // fixpoint; what halves is the per-distance overhead that is
        // NOT the propagation itself: driver jobs (per-job latency
        // dominates at sf0.1 — the r17 lesson) and, at scale, the
        // eager localCheckpoint that copies the full |V|-row label
        // table to executor storage once per round instead of once
        // per two hops.
        // h1 is referenced twice below (hop-2 candidate source + merge
        // base); repartition(v) clusters it once so the second
        // reference is a ReusedExchange, not a recompute of hop 1
        // (the largeStar/smallStar r17 move).
        val h1 = {
          val cand1 = edges.join(labels, edges("src") === labels("v"))
            .groupBy(col("dst")).agg(min(col("lbl")).as("c1"))
          labels.join(cand1, labels("v") === cand1("dst"), "left")
            .select(labels("v"), labels("lbl").as("prev"),
              least(labels("lbl"), coalesce(col("c1"), labels("lbl")))
                .as("lbl"))
            .repartition(col("v"))
        }
        val cand2 = edges.join(h1, edges("src") === h1("v"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("c2"))
        // The convergence count rides INSIDE the checkpoint job as an
        // observed metric (r17), now spanning both hops: chg counts
        // labels that dropped across the round (final lbl < prev =
        // label before hop 1). Monotonicity makes chg == 0 equivalent
        // to "hop 1 changed nothing AND hop 2 changed nothing", so
        // the fixpoint test is exact.
        val obs = org.apache.spark.sql.Observation()
        val merged = h1.join(cand2, h1("v") === cand2("dst"), "left")
          .select(h1("v"), col("prev"),
            least(h1("lbl"), coalesce(col("c2"), h1("lbl"))).as("lbl"))
          .observe(obs, sum(when(col("lbl") < col("prev"), 1L)
            .otherwise(0L)).as("chg"))
          .localCheckpoint(true)
        val changed = obs.getAsJava.get("chg") match {
          case null => 0L // empty relation: no rows, no change
          case n: java.lang.Long => n.longValue()
        }
        labels = merged.select(col("v"), col("lbl"))
        converged = changed == 0
        iters += 1
        if (ccLog) println(f"[cc:$what] round $iters%2d (2 hops): " +
          f"$changed%8d changed, ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      }
      require(converged,
        s"$what label propagation did not converge within $iters rounds")
      labels
    } finally edges.unpersist(blocking = false)
  }

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "dd01_exact_dedup_summary",
      "Exact dedup summary: total docs vs distinct texts (hash-groupBy, map-side partial agg)",
      (s, dir) => {
        docs(s, dir).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("text"))).as("n_dupes"))
      },
      Some("""SELECT count(*) AS n_docs, count(DISTINCT text) AS n_distinct,
             |  count(*) - count(DISTINCT text) AS n_dupes
             |FROM documents""".stripMargin)),

    CatalogQuery(
      "dd02_exact_dedup_keep_first",
      "Exact dedup keeping lowest doc_id per text; one shuffle keyed by content hash",
      (s, dir) => {
        docs(s, dir)
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"))
          .orderBy(col("keep_id"))
      },
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents
             |GROUP BY text
             |ORDER BY keep_id""".stripMargin)),

    CatalogQuery(
      "dd03_minhash_lsh",
      "MinHash+LSH near-dup pairs (36 hashes, 6 bands × 6) verified with exact shingle Jaccard ≥ 0.8",
      (s, dir) => {
        // 6 rows/band: the fixture docs share a small vocabulary, so
        // background pair Jaccard is ~0.4 — r=4 bands collide on
        // ~0.4^4 of ALL pairs and verification dominates; r=6 cuts
        // false candidates ~40x for ~0.84 recall at the J=0.8 line.
        // Shingles are generated as rows (codegen) and only collected
        // into sets for the verify join. No persist(): the shingle pass
        // is codegen'd and cheap to recompute, and a persist inside a
        // catalog builder has no unpersist lifecycle — leaked blocks
        // would squat on executor memory for every later query.
        val rows = TextOps.wordShingleRows(docs(s, dir), "doc_id", "text", 3)
        TextOps.lshNearDupPairs(rows, "doc_id",
            numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
            threshNum = 8, threshDen = 10)
          .orderBy(col("a_id"), col("b_id"))
      },
      // Value oracle: minhash now derives from a 31-bit md5 segment with
      // (a·h+b) mod 2^31-1 rehashes and tuple-string buckets — every
      // stage engine-portable, so DuckDB reproduces candidates AND the
      // exact-Jaccard verification (TextOps.lshPairsOracleSql, generated
      // from the same parameters).
      Some(TextOps.lshPairsOracleSql(TextOps.wordShingleSql(3),
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
        threshNum = 8, threshDen = 10))),

    CatalogQuery(
      "dd04_simhash",
      "SimHash near-dup pairs: 64-bit md5-segment signatures, 9-chunk pigeonhole bucketing, Hamming ≤ 8 verification",
      (s, dir) => {
        // guard: 7-bit chunks have only 128 distinct values, so chunk
        // buckets hold ~n/128 docs each and candidates grow ~9n²/128
        // (SCALING.md) — refuse corpora where that quadratic term
        // dominates instead of silently burning a cluster. dd07's
        // 14-bit chunks (2^14 values) are the scale path.
        val simhashCap = s.conf.getOption("graft.ext.simhash64MaxDocs")
          .map(_.toLong).getOrElse(100000L)
        val nDocs = docs(s, dir).count()
        require(nDocs <= simhashCap,
          s"dd04_simhash buckets 64-bit signatures into 9 chunks of 7-8 " +
            s"bits (128-256 values each): at $nDocs docs > cap $simhashCap " +
            "the ~9n^2/128 candidate stream dominates. Use dd07_simhash_wide " +
            "(14-bit chunks) at scale, or raise spark.conf " +
            "graft.ext.simhash64MaxDocs to override.")
        val tok = TextOps.tokenRows(docs(s, dir), "doc_id", "text")
        TextOps.simhashPairs(tok, "doc_id", segments = 2, radius = 8)
          .orderBy(col("a_id"), col("b_id"))
      },
      // Value oracle: the signature bits come from md5 (engine-portable)
      // as 32-bit segments, so DuckDB reproduces signatures, chunk keys
      // and Hamming distances exactly; the SQL text is generated from
      // the same chunk geometry as the Spark plan (TextOps.simhashOracleSql).
      Some(TextOps.simhashOracleSql(segments = 2, radius = 8))),

    CatalogQuery(
      "dd05_ngram_jaccard",
      "Character-5-gram Jaccard near-dup (LSH candidates → exact n-gram set verification ≥ 0.8)",
      (s, dir) => {
        // 5-char grams: 3-grams over a small shared vocabulary are
        // near-identical across ALL documents, which floods LSH buckets
        // with false candidates; 5-grams straddle word boundaries and
        // discriminate
        // no persist() — same recompute-over-leak tradeoff as dd03
        val rows = TextOps.charNgramRows(docs(s, dir), "doc_id", "text", 5)
        TextOps.lshNearDupPairs(rows, "doc_id",
            numHashes = 36, rowsPerBand = 6, maxBucketSize = 50,
            threshNum = 8, threshDen = 10)
          .orderBy(col("a_id"), col("b_id"))
      },
      // same generated md5/mod-p oracle as dd03, over char 5-grams
      Some(TextOps.lshPairsOracleSql(TextOps.charNgramSql(5),
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 50,
        threshNum = 8, threshDen = 10))),

    CatalogQuery(
      "dd07_simhash_wide",
      "Wide SimHash near-dup: 128-bit signatures, 9 pigeonhole chunks of 14-15 bits - dd04's scale path (2^14-value chunks cut false candidates ~128x)",
      (s, dir) => {
        val tok = TextOps.tokenRows(docs(s, dir), "doc_id", "text")
        TextOps.simhashPairs(tok, "doc_id", segments = 4, radius = 8)
          .orderBy(col("a_id"), col("b_id"))
      },
      // Same generated md5-segment oracle as dd04, at 128 bits.
      Some(TextOps.simhashOracleSql(segments = 4, radius = 8))),

    CatalogQuery(
      "dd06_embedding_neardup",
      "Embedding-cosine near-dup pairs (cosine ≥ 0.4), brute-force baseline; dd12 is the LSH scale path",
      (s, dir) => embeddingNearDupPairs(s, dir).orderBy(col("a_id"), col("b_id")),
      // value-level DuckDB oracle: both engines normalize as
      // x / sqrt(dot(v,v)) and dot left-to-right in DOUBLE, so the
      // cosines are IEEE-identical and round(*1e6) compares exactly;
      // the CASE guard mirrors normalize()'s zero-vector behavior
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |n AS (
             |  SELECT vec_id,
             |    CASE WHEN list_dot_product(v, v) = 0 THEN v
             |         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
             |    END AS nv
             |  FROM e)
             |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |  CAST(round(list_dot_product(a.nv, b.nv) * 1e6) AS BIGINT) AS cos_e6
             |FROM n a JOIN n b ON a.vec_id < b.vec_id
             |WHERE list_dot_product(a.nv, b.nv) >= 0.4
             |ORDER BY a_id, b_id""".stripMargin)),

    CatalogQuery(
      "dd08_dedup_clusters",
      "Near-dup cluster assignment: connected components over dd06's cosine pairs (iterative min-label propagation; canonical = min vec_id)",
      (s, dir) => {
        // pair source is dd06's capped all-pairs baseline — fine up to
        // the cap; dd10 is the composed scale path (LSH candidates in,
        // same propagation loop)
        val pairs = embeddingNearDupPairs(s, dir).select(col("a_id"), col("b_id"))
        minLabelComponents(pairs, "dd08")
          .select(col("v").as("vec_id"), col("lbl").cast("long").as("component"))
          .orderBy(col("vec_id"))
      },
      // the recursive CTE materializes full reachability then takes the
      // min — fine at oracle scale; the Spark side is the scale path
      Some(ccOracleSql)),

    CatalogQuery(
      "dd09_chunk_dedup",
      "Paragraph-level exact dedup: corpus-wide keep-first over non-overlapping 20-token chunks (boilerplate removal)",
      (s, dir) => {
        // The paragraph-dedup stage of a web-corpus pipeline, reframed
        // over newline-free synthetic text as fixed 20-token chunks:
        // identical chunks across the corpus are boilerplate; only the
        // first occurrence (by doc_id, then position) survives. The
        // chunk loop is transform(sequence(...)) over the token array —
        // row-generation, not a UDF. Keep-first is a min-of-struct
        // AGGREGATION keyed by chunk content, deliberately NOT a
        // row_number() window: a window cannot partial-aggregate, so a
        // boilerplate chunk with millions of copies would funnel every
        // copy onto one reducer; min(struct) combines map-side and the
        // reducer sees one pre-folded row per content per map task —
        // skew-proof at any duplication factor.
        val arr = TextOps.tokens(col("text"))
        val chunks = docs(s, dir)
          .select(col("doc_id"), arr.as("arr"))
          // size(arr) >= 1 always (split(trim(..)) never yields an empty
          // array), but guard anyway: sequence(0, -1) would NOT be empty
          // (Spark steps DOWN, giving [0, -1] = two bogus chunks)
          .select(col("doc_id"), posexplode(expr(
            "CASE WHEN size(arr) > 0 THEN " +
              "transform(sequence(0, cast(ceil(size(arr) / 20.0) as int) - 1)," +
              " i -> concat_ws(' ', slice(arr, i * 20 + 1, 20))) " +
              "ELSE CAST(array() AS array<string>) END")))
          .select(col("doc_id"), col("pos").cast("long").as("chunk_pos"),
            col("col").as("chunk_text"))
        val winners = chunks
          .groupBy(col("chunk_text"))
          .agg(min(struct(col("doc_id"), col("chunk_pos"))).as("first"))
          .groupBy(col("first.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("n_kept"))
        // per-doc chunk totals need no explode at all: ceil(|tokens|/20)
        // straight off the base table, so the corpus is EXPLODED once
        // (the dominant cost), not twice with different groupings
        docs(s, dir)
          .select(col("doc_id"),
            ceil(size(arr) / 20.0).cast("long").as("n_chunks"))
          .join(winners, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chunks"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dupes"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
             |  FROM documents),
             |ch AS (
             |  SELECT doc_id, u.p AS chunk_pos, u.t AS chunk_text
             |  FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(0, CAST(ceil(len(arr) / 20.0) AS BIGINT)),
             |        i -> {'p': i, 't': array_to_string(arr[i*20+1 : i*20+20], ' ')})) AS u
             |    FROM tok)),
             |rk AS (
             |  SELECT doc_id, chunk_pos,
             |    row_number() OVER (PARTITION BY chunk_text
             |      ORDER BY doc_id, chunk_pos) AS rn
             |  FROM ch)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes
             |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dd10_dedup_clusters_lsh",
      "Scale-path dedup clustering: MinHash-LSH candidates -> exact Jaccard >= 0.8 verify -> connected components -> keep-min canonical (no all-pairs stage anywhere)",
      (s, dir) => {
        // The composed 100 TB dedup pipeline in one query: shingle →
        // banded MinHash LSH (linear candidate generation, dd03's exact
        // machinery) → exact Jaccard verification on candidates only →
        // min-label connected components (dd08's loop) → canonical =
        // min doc_id. Unlike dd08, whose pair source is the capped
        // quadratic all-pairs baseline, every stage here is linear in
        // corpus size (candidates are bucket-capped), so the clustering
        // is corpus-size-unbounded. Output lists only clustered docs
        // (a join-side table, not a corpus copy); keep=1 marks the
        // canonical member to retain.
        val rows = TextOps.wordShingleRows(docs(s, dir), "doc_id", "text", 3)
        val pairs = TextOps.lshNearDupPairs(rows, "doc_id",
            numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
            threshNum = 8, threshDen = 10)
          .select(col("a_id"), col("b_id"))
        minLabelComponents(pairs, "dd10")
          .select(col("v").as("doc_id"), col("lbl").cast("long").as("cluster"),
            (col("v") === col("lbl")).cast("long").as("keep"))
          .orderBy(col("doc_id"))
      },
      // Value oracle: recursive-CTE reachability over the SAME
      // engine-portable LSH pair chain as dd03's oracle. Parity is also
      // spec-gated twice in ExtSpec: the propagation output must equal
      // an independent union-find over the same verified pair set, and
      // on a planted-duplicate corpus every planted group must collapse
      // to one cluster with the min doc_id kept.
      Some(TextOps.lshClustersOracleSql(TextOps.wordShingleSql(3),
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
        threshNum = 8, threshDen = 10))),

    CatalogQuery(
      "dd19_best_rep_dedup",
      "Dedup keeping the BEST copy, not the first: dd10's LSH-verified clusters re-kept by quality argmax (tx20's integer diversity score, min-id tiebreak) — the curation choice a real pipeline makes when duplicates differ in quality",
      (s, dir) => {
        // dd02/dd10 keep the MIN-ID member — fine when copies are
        // byte-identical, wrong when a near-dup group mixes a clean
        // copy with a boilerplate-padded one (near-dup groups usually
        // do). Same linear chain as dd10 (shingle → banded LSH →
        // exact verify → min-label CC), then the keeper is the
        // per-cluster quality argmax, computed WITHOUT a ranking
        // window (the dd09/dd20 rule: a row_number partition
        // serializes the largest cluster into one task, and dd19's
        // target input — boilerplate-padded dup groups — is exactly
        // where one cluster goes mega). (score desc, doc_id asc) is
        // totally ordered as ONE packed long, (1e6 - score_e6) majors
        // over doc_id minors with radix 2^43 (dd20's documented
        // doc_id bound; score_e6 <= 1e6 < 2^20 by construction, so
        // the product stays under 2^63): min() of it map-combines on
        // any partitioning, and the keeper joins back 1:1 on cluster
        // (a |clusters|-row hashed join — same result as the window
        // under the same total order; the DuckDB oracle keeps its
        // row_number spelling, the VALUES agree). Score = tx20's
        // round(distinct/total*1e6) integers so the oracle reproduces
        // the argmax exactly.
        val d = docs(s, dir)
        val rows = TextOps.wordShingleRows(d, "doc_id", "text", 3)
        val pairs = TextOps.lshNearDupPairs(rows, "doc_id",
            numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
            threshNum = 8, threshDen = 10)
          .select(col("a_id"), col("b_id"))
        val cl = minLabelComponents(pairs, "dd19")
          .select(col("v").as("doc_id"), col("lbl").cast("long").as("cluster"))
        val toks = TextOps.tokens(col("text"))
        val scored = d.select(col("doc_id"),
          round(size(array_distinct(toks)) * lit(1e6) / size(toks))
            .cast("long").as("score_e6"))
        // doc_id must fit the 2^43 minor radix or min(bk) picks the
        // wrong keeper — per-row refusal, requirePackablePositions'
        // data-side twin (no conf bounds doc ids)
        val joined = TextOps.requirePackableDocIds(
          cl.join(scored, "doc_id"), "doc_id", "dd19")
        val radix = 8796093022208L // 2^43
        val best = joined.groupBy(col("cluster"))
          .agg(min((lit(1000000L) - col("score_e6")) * lit(radix)
            + col("doc_id")).as("bk"))
          .select(col("cluster"), pmod(col("bk"), lit(radix)).as("best_id"))
        joined.join(best, "cluster")
          .select(col("doc_id"), col("cluster"), col("score_e6"),
            (col("doc_id") === col("best_id")).cast("long").as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(TextOps.lshBestRepOracleSql(TextOps.wordShingleSql(3),
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
        threshNum = 8, threshDen = 10))),

    CatalogQuery(
      "dd20_span_removal",
      "Exact duplicated-span REMOVAL (the cut step of Lee et al. 2022 — dd15 only FLAGS): each cross-doc duplicated 8-token window keeps its first occurrence (min doc_id, then min pos); tokens covered by any later occurrence are cut and the doc reassembled, with an md5 of the kept text proving the surgery",
      (s, dir) => {
        // dd15 detects ExactSubstr duplication; this is the transform
        // the paper actually ships: CUT the later copies, keep the
        // first. Rule (deterministic under any partitioning): a token
        // position is removed iff it is covered by >= 1 occurrence of
        // a duplicated window that is NOT that window's group-first
        // occurrence, where group-first = min (doc_id, pos). Scale
        // shape mirrors dd15 — only 16-byte digests shuffle; the
        // group-first is a map-combining min(struct) aggregate, NOT a
        // per-digest window (a boilerplate window in a billion docs
        // would serialize a row_number partition; min(struct) folds it
        // map-side). The reassembly collect_list is per-doc and
        // bounded by the same graft.ext.maxDocTokens guard the shingle
        // pass enforces. Cut accounting explodes dup occurrences x k,
        // bounded exactly as dd15's span accounting.
        val k = 8
        val d = docs(s, dir)
        // NOT checkpointed, deliberately: the digest stream is
        // |corpus windows| rows (36.7M at the 500k headroom corpus)
        // and is read twice (group-first agg + cut join) —
        // materializing it through the block manager measured ~36 s,
        // more than BOTH lazy re-derivations together. The dd03
        // checkpoint lesson inverts here: checkpoint small reused
        // frames (signatures, cut sets), recompute wide streams.
        val grams = TextOps
          .wordShinglePosRows(d, "doc_id", "text", k)
          .select(col("doc_id"), col("_pos").cast("long").as("pos"),
            TextOps.windowKey1(col("_el")).as("h1"),
            TextOps.windowKey2(col("_el")).as("h2"))
        // dup definition (>= 2 distinct docs, dd15's) AND the
        // group-first owner in ONE pure-partial aggregation pass:
        // ">= 2 distinct docs" is exactly min(doc_id) != max(doc_id),
        // so no countDistinct (whose Expand doubles the shuffled
        // stream) and no separate distinct -> count join (whose
        // twice-referenced result re-ran a 36.7M-row shuffle per
        // reference — measured 107 s for the cut set alone at 500k
        // docs vs ~15 s single-pass). The lexicographic (doc_id, pos)
        // min is taken over ONE packed long — min(struct(...)) has no
        // mutable primitive buffer and demoted the whole 36.7M-row
        // pass to a SortAggregate over string keys (measured 10x dd15's
        // identically-shaped chain); pos < 2^20 is enforced by the
        // wordShinglePosRows maxDocTokens guard, so doc_id*2^20 + pos
        // orders exactly like the pair for doc_id < 2^43. The guard
        // only implies pos < 2^20 while the user-raisable cap itself
        // stays <= 2^20 — refuse an over-raised cap loudly here.
        TextOps.requirePackablePositions(s)
        val packed = col("doc_id") * lit(1048576L) + col("pos")
        // doc_id < 2^43 enforced per-row (the data-side bound the conf
        // guard can't see) — one codegen comparison on the agg input
        val perGh = TextOps.requirePackableDocIds(grams, "doc_id", "dd20")
          .groupBy(col("h1"), col("h2"))
          .agg(min(packed).as("fkey"), max(col("doc_id")).as("hi"))
          // `div`, not `/`: long / long is DOUBLE division in Spark,
          // and fkey ranges past 2^53 where doubles drop low bits
          .filter(expr("fkey div 1048576") =!= col("hi"))
          .select(col("h1"), col("h2"),
            expr("fkey div 1048576").as("fd"),
            pmod(col("fkey"), lit(1048576L)).as("fp"))
        // shuffle_hash: probe = the full window stream (SMJ would sort
        // it); build = duplicated keys only (dd15's bound note)
        val cut = grams.join(perGh.hint("shuffle_hash"), Seq("h1", "h2"))
          .filter(!(col("doc_id") === col("fd") && col("pos") === col("fp")))
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
          .distinct()
          .withColumn("rm", lit(1L))
          // read three times (dirty-doc set twice, token join once);
          // bounded by |dup occurrences| x k
          .localCheckpoint()
        val cutDocs = cut.select(col("doc_id")).distinct()
        // pay the token-level surgery ONLY where surgery happens: a
        // doc with no cut keeps its token stream verbatim, so its
        // kept_hash is one codegen'd projection (md5 of the tokens
        // re-joined) — no explode, no shuffle. On a typical corpus
        // the dirty set is a few percent; reassembling everything
        // measured 8x dd15's whole flag pass at 500k docs (54.9 s vs
        // 6.8 s); this split puts the clean 98% back on the scan.
        val toksCol = TextOps.tokens(col("text"))
        val clean = d.join(cutDocs, Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            size(toksCol).cast("long").as("n_tok"),
            lit(0L).as("n_removed"),
            size(toksCol).cast("long").as("n_kept"),
            md5(concat_ws(" ", toksCol)).as("kept_hash"))
        val dirtyToks = d.join(cutDocs, Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            posexplode(toksCol).as(Seq("p", "tok")))
          .select(col("doc_id"), col("p").cast("long").as("pos"), col("tok"))
        val dirty = dirtyToks.join(cut, Seq("doc_id", "pos"), "left")
          .na.fill(0L, Seq("rm"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"), sum(col("rm")).as("n_removed"),
            sort_array(collect_list(
              struct(col("pos"), col("rm"), col("tok")))).as("arr"))
          .select(col("doc_id"), col("n_tok"), col("n_removed"),
            (col("n_tok") - col("n_removed")).as("n_kept"),
            md5(concat_ws(" ",
              expr("transform(filter(arr, x -> x.rm = 0), x -> x.tok)")))
              .as("kept_hash"))
        clean.unionByName(dirty).orderBy(col("doc_id"))
      },
      // Same gram/digest chain as dd15's oracle; group-first via a
      // row_number window ((doc_id, pos) is unique, so it equals the
      // engine's min(struct)); string_agg skips the NULLed removed
      // tokens and coalesces to '' when everything was cut, matching
      // concat_ws over an empty array.
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tok
             |  FROM documents),
             |d AS (SELECT doc_id, len(tok) AS n_tok, tok FROM t),
             |g AS (
             |  SELECT doc_id, u['pos'] AS pos, md5(u['gram']) AS gh FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, n_tok - 6),
             |      i -> {'pos': i - 1,
             |            'gram': array_to_string(tok[i:i+7], ' ')})) AS u
             |    FROM d WHERE n_tok >= 8)),
             |df AS (SELECT gh FROM (
             |    SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh)
             |  WHERE nd >= 2),
             |occ AS (SELECT g.doc_id, g.pos, g.gh FROM g JOIN df USING (gh)),
             |fst AS (SELECT gh, doc_id AS fd, pos AS fp FROM (
             |    SELECT gh, doc_id, pos,
             |      row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos)
             |        AS rn
             |    FROM occ) WHERE rn = 1),
             |cut AS (SELECT DISTINCT o.doc_id, o.pos + unnest(range(0, 8))
             |          AS tp
             |        FROM occ o JOIN fst USING (gh)
             |        WHERE NOT (o.doc_id = fd AND o.pos = fp)),
             |tr AS (SELECT doc_id, u['p'] AS p, u['t'] AS tok FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, n_tok + 1),
             |      i -> {'p': i - 1, 't': tok[i]})) AS u FROM d)),
             |mk AS (SELECT tr.doc_id, tr.p, tr.tok,
             |         CASE WHEN cut.tp IS NULL THEN 0 ELSE 1 END AS rm
             |       FROM tr LEFT JOIN cut
             |         ON tr.doc_id = cut.doc_id AND tr.p = cut.tp)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |  CAST(sum(rm) AS BIGINT) AS n_removed,
             |  CAST(count(*) - sum(rm) AS BIGINT) AS n_kept,
             |  md5(coalesce(
             |    string_agg(CASE WHEN rm = 0 THEN tok END, ' ' ORDER BY p),
             |    '')) AS kept_hash
             |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dd21_dedup_impact",
      "Dedup impact report per source: dd10's LSH-verified keep-min clusters attributed to the source column — docs and TOKENS removed per source with e6 shares, the governance dashboard a curation run publishes before anyone trusts the dedup",
      (s, dir) => {
        // What did the dedup actually delete, and from whom — the
        // question asked in every curation review (a dedup that eats
        // 40% of one source is a licensing/provenance signal, not
        // just a space win). dd10's chain verbatim (shingle -> banded
        // LSH -> exact verify -> min-label CC -> keep-min), then one
        // 1:1 co-keyed join back to (source, n_tok) and ONE
        // map-combined groupBy on source — |sources| rows out at any
        // corpus size.
        val d = docs(s, dir).select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        val rows = TextOps.wordShingleRows(docs(s, dir), "doc_id", "text", 3)
        val pairs = TextOps.lshNearDupPairs(rows, "doc_id",
            numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
            threshNum = 8, threshDen = 10)
          .select(col("a_id"), col("b_id"))
        val cl = minLabelComponents(pairs, "dd21")
          .select(col("v").as("doc_id"),
            (col("v") === col("lbl")).cast("long").as("keep"))
        d.join(cl, Seq("doc_id"), "left")
          .select(col("source"), col("n_tok"),
            coalesce(col("keep"), lit(1L)).as("keep"),
            when(col("keep").isNotNull, 1L).otherwise(0L).as("clustered"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("clustered")).as("n_clustered"),
            sum(when(col("keep") === 0, 1L).otherwise(0L)).as("n_removed"),
            sum(col("n_tok")).as("tok_total"),
            sum(when(col("keep") === 0, col("n_tok")).otherwise(0L))
              .as("tok_removed"))
          .withColumn("removed_pct_e6",
            round(col("tok_removed") * lit(1e6) / col("tok_total"))
              .cast("long"))
          .orderBy(col("source"))
      },
      Some(s"""WITH cl AS (
             |  SELECT doc_id, keep FROM (
             |${TextOps.lshClustersOracleSql(TextOps.wordShingleSql(3),
                 numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
                 threshNum = 8, threshDen = 10).linesIterator
                 .map("    " + _).mkString("\n")}
             |  ) t),
             |d AS (SELECT doc_id, source,
             |    CAST(len(regexp_split_to_array(trim(text), '\\s+'))
             |      AS BIGINT) AS n_tok
             |  FROM documents),
             |j AS (SELECT d.source, d.n_tok,
             |    coalesce(cl.keep, 1) AS keep,
             |    CASE WHEN cl.doc_id IS NULL THEN 0 ELSE 1 END AS clustered
             |  FROM d LEFT JOIN cl ON cl.doc_id = d.doc_id)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(clustered) AS BIGINT) AS n_clustered,
             |  CAST(sum(CASE WHEN keep = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_removed,
             |  CAST(sum(n_tok) AS BIGINT) AS tok_total,
             |  CAST(sum(CASE WHEN keep = 0 THEN n_tok ELSE 0 END) AS BIGINT)
             |    AS tok_removed,
             |  CAST(round(sum(CASE WHEN keep = 0 THEN n_tok ELSE 0 END)
             |    * 1000000.0 / sum(n_tok)) AS BIGINT) AS removed_pct_e6
             |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    CatalogQuery(
      "dd22_threshold_sweep",
      "Dedup threshold sensitivity: dd03's verified candidate pairs re-counted at Jaccard cuts 0.80/0.85/0.90/0.95/1.00 (cross-multiplied integers) — the tuning curve read before committing a dedup threshold, over the SAME pair set production verifies",
      (s, dir) => {
        // Moving the dedup threshold is the highest-stakes knob in
        // curation (0.8 vs 0.9 can double the removed mass); this
        // reports how the verified pair count decays as the cut
        // tightens, ONE pass over dd03's (inter, uni) pairs — no new
        // corpus work, and every cut >= the LSH tuning point 0.8 so
        // candidate recall is dd03's (cuts BELOW the banding's design
        // threshold would undercount and are refused by omission).
        val rows = TextOps.wordShingleRows(docs(s, dir), "doc_id", "text", 3)
        val pairs = TextOps.lshNearDupPairs(rows, "doc_id",
          numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
          threshNum = 8, threshDen = 10)
        def atLeast(num: Int, den: Int) =
          sum(when(col("inter") * den >= col("uni") * num, 1L)
            .otherwise(0L))
        pairs.agg(
            atLeast(8, 10).as("t80"), atLeast(17, 20).as("t85"),
            atLeast(9, 10).as("t90"), atLeast(19, 20).as("t95"),
            atLeast(1, 1).as("t100"))
          .selectExpr("stack(5, 800000L, t80, 850000L, t85, 900000L, t90," +
            " 950000L, t95, 1000000L, t100) as (thresh_e6, n_pairs)")
          .orderBy(col("thresh_e6"))
      },
      Some(s"""WITH vp AS (
             |  SELECT inter, uni FROM (
             |${TextOps.lshPairsOracleSql(TextOps.wordShingleSql(3),
                 numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
                 threshNum = 8, threshDen = 10).linesIterator
                 .map("    " + _).mkString("\n")}
             |  ) t)
             |SELECT CAST(th AS BIGINT) AS thresh_e6, CAST(n AS BIGINT)
             |    AS n_pairs
             |FROM (
             |  SELECT 800000 AS th, (SELECT count(*) FROM vp
             |    WHERE inter * 10 >= uni * 8) AS n
             |  UNION ALL SELECT 850000, (SELECT count(*) FROM vp
             |    WHERE inter * 20 >= uni * 17)
             |  UNION ALL SELECT 900000, (SELECT count(*) FROM vp
             |    WHERE inter * 10 >= uni * 9)
             |  UNION ALL SELECT 950000, (SELECT count(*) FROM vp
             |    WHERE inter * 20 >= uni * 19)
             |  UNION ALL SELECT 1000000, (SELECT count(*) FROM vp
             |    WHERE inter >= uni))
             |ORDER BY thresh_e6""".stripMargin)),

    CatalogQuery(
      "dd23_substring_dup_estimate",
      "ExactSubstr duplicated-fraction ESTIMATOR — the estimate-vs-exact pairing (tx22-for-tx21, g10-for-g03) for the dd15/dd20/tx17 digest family: the 8-token window stream thinned 1/8 by a deterministic digest coin BEFORE anything shuffles; per-doc duplicated-WINDOW fraction estimated from the surviving sample",
      (s, dir) => {
        // dd15/dd20/tx17 each shuffle the FULL corpus window-digest
        // stream (36.7M rows at the 500k headroom corpus) — the most
        // expensive thing a curation run does at 100 TB, honestly
        // 70-100 s each at 500k under forced evaluation. This is the
        // family's petabyte path: a deterministic coin on the DIGEST
        // (first hex char < '2' — exactly 2/16 of md5 space) thins the
        // stream 1/8 inside the same codegen'd projection that computes
        // the md5, so only ~1/8 of the rows ever shuffle and the dup
        // join-back build side shrinks identically. Sampling BY DIGEST,
        // not by occurrence, keeps every occurrence of a window in or
        // out together, so each sampled window's duplicated-ness
        // (min(doc) != max(doc), dd15's test) is computed EXACTLY —
        // the only estimation error is which windows are observed: an
        // unbiased 1/8 sample of each doc's windows, stderr per doc
        // ~ sqrt(p(1-p)*8/n_win). The md5 coin makes reruns AND the
        // DuckDB oracle sample identically (g10's convention — the
        // estimator itself is value-checked, not just rows-checked),
        // and the calibration spec pins the estimate against exact
        // dd15 on a planted known-fraction corpus. Downstream use:
        // run dd23 to budget/triage (which sources carry duplication,
        // whether exact surgery is worth it), run dd15/dd20 only on
        // the slices that light up.
        val k = 8
        val d = docs(s, dir).select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        // the COIN stays md5 (the DuckDB oracle reproduces the exact
        // sampling); the downstream agg/join key is the two-long
        // windowKey — md5 prunes away right after the filter
        val samp = TextOps
          .wordShinglePosRows(docs(s, dir), "doc_id", "text", k)
          .select(col("doc_id"), md5(col("_el")).as("mh"),
            TextOps.windowKey1(col("_el")).as("h1"),
            TextOps.windowKey2(col("_el")).as("h2"))
          .filter(substring(col("mh"), 1, 1) < "2")
          .select(col("doc_id"), col("h1"), col("h2"))
        val dup = samp.groupBy(col("h1"), col("h2"))
          .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
          .filter(col("lo") =!= col("hi"))
          .select(col("h1"), col("h2"), lit(1L).as("isdup"))
        val perDoc = samp.join(dup.hint("shuffle_hash"),
            Seq("h1", "h2"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_samp"),
            sum(coalesce(col("isdup"), lit(0L))).as("n_dup_samp"))
        d.join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"),
            coalesce(col("n_samp"), lit(0L)).as("n_samp"),
            coalesce(col("n_dup_samp"), lit(0L)).as("n_dup_samp"))
          .withColumn("est_dup_win_pct_e6",
            when(col("n_samp") === 0, lit(-1L))
              .otherwise(round(col("n_dup_samp") * 1e6 / col("n_samp"))
                .cast("long")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tok
             |  FROM documents),
             |d AS (SELECT doc_id, len(tok) AS n_tok, tok FROM t),
             |g AS (
             |  SELECT doc_id, md5(array_to_string(tok[i:i+7], ' ')) AS gh
             |  FROM (
             |    SELECT doc_id, tok, unnest(range(1, len(tok) - 6)) AS i
             |    FROM d WHERE len(tok) >= 8)),
             |sm AS (SELECT doc_id, gh FROM g WHERE substr(gh, 1, 1) < '2'),
             |df AS (SELECT gh, CAST(1 AS BIGINT) AS isdup FROM (
             |    SELECT gh, min(doc_id) AS lo, max(doc_id) AS hi FROM sm
             |    GROUP BY gh)
             |  WHERE lo <> hi),
             |pd AS (SELECT sm.doc_id, count(*) AS n_samp,
             |    sum(coalesce(isdup, 0)) AS n_dup_samp
             |  FROM sm LEFT JOIN df USING (gh) GROUP BY sm.doc_id)
             |SELECT d.doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             |  CAST(coalesce(n_samp, 0) AS BIGINT) AS n_samp,
             |  CAST(coalesce(n_dup_samp, 0) AS BIGINT) AS n_dup_samp,
             |  CAST(CASE WHEN coalesce(n_samp, 0) = 0 THEN -1
             |    ELSE round(n_dup_samp * 1000000.0 / n_samp) END AS BIGINT)
             |    AS est_dup_win_pct_e6
             |FROM d LEFT JOIN pd USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dd24_dup_source_estimate",
      "Per-SOURCE duplicated-fraction triage from dd23's sampled digests: estimated duplicated-window share of each source's corpus slice — the drill-down that decides WHERE to run dd15/dd20's exact surgery (dd21's governance report, at estimator cost)",
      (s, dir) => {
        // dd23 answers "how much duplication"; a curation run acts per
        // SOURCE (drop a crawl slice, re-weight a feed), so the triage
        // report it actually reads is this one. Same 1/8 digest-coin
        // sample and corpus-WIDE dup test as dd23 (a window shared
        // across sources marks BOTH sources — cross-source boilerplate
        // is precisely what the report must surface), then dd21's
        // attribution shape: fold to doc level first (|docs| rows,
        // map-combined), one 1:1 hashed join to the source column, one
        // map-combined groupBy(source) — |sources| rows out at any
        // corpus size. Docs with no sampled window still count in
        // n_docs; a source with zero sampled windows reports est -1
        // (unknown), dd23's runt convention.
        val k = 8
        val d = docs(s, dir).select(col("doc_id"), col("source"))
        val samp = TextOps
          .wordShinglePosRows(docs(s, dir), "doc_id", "text", k)
          .select(col("doc_id"), md5(col("_el")).as("mh"),
            TextOps.windowKey1(col("_el")).as("h1"),
            TextOps.windowKey2(col("_el")).as("h2"))
          .filter(substring(col("mh"), 1, 1) < "2")
          .select(col("doc_id"), col("h1"), col("h2"))
        val dup = samp.groupBy(col("h1"), col("h2"))
          .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
          .filter(col("lo") =!= col("hi"))
          .select(col("h1"), col("h2"), lit(1L).as("isdup"))
        val perDoc = samp.join(dup.hint("shuffle_hash"),
            Seq("h1", "h2"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_samp"),
            sum(coalesce(col("isdup"), lit(0L))).as("n_dup_samp"))
        d.join(perDoc, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("n_samp"), lit(0L))).as("n_samp"),
            sum(coalesce(col("n_dup_samp"), lit(0L))).as("n_dup_samp"))
          .withColumn("est_dup_win_pct_e6",
            when(col("n_samp") === 0, lit(-1L))
              .otherwise(round(col("n_dup_samp") * 1e6 / col("n_samp"))
                .cast("long")))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tok
             |  FROM documents),
             |d AS (SELECT doc_id, len(tok) AS n_tok, tok FROM t),
             |g AS (
             |  SELECT doc_id, md5(array_to_string(tok[i:i+7], ' ')) AS gh
             |  FROM (
             |    SELECT doc_id, tok, unnest(range(1, len(tok) - 6)) AS i
             |    FROM d WHERE len(tok) >= 8)),
             |sm AS (SELECT doc_id, gh FROM g WHERE substr(gh, 1, 1) < '2'),
             |df AS (SELECT gh, CAST(1 AS BIGINT) AS isdup FROM (
             |    SELECT gh, min(doc_id) AS lo, max(doc_id) AS hi FROM sm
             |    GROUP BY gh)
             |  WHERE lo <> hi),
             |pd AS (SELECT sm.doc_id, count(*) AS n_samp,
             |    sum(coalesce(isdup, 0)) AS n_dup_samp
             |  FROM sm LEFT JOIN df USING (gh) GROUP BY sm.doc_id)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(coalesce(n_samp, 0)) AS BIGINT) AS n_samp,
             |  CAST(sum(coalesce(n_dup_samp, 0)) AS BIGINT) AS n_dup_samp,
             |  CAST(CASE WHEN sum(coalesce(n_samp, 0)) = 0 THEN -1
             |    ELSE round(sum(coalesce(n_dup_samp, 0)) * 1000000.0
             |      / sum(coalesce(n_samp, 0))) END AS BIGINT)
             |    AS est_dup_win_pct_e6
             |FROM documents LEFT JOIN pd USING (doc_id)
             |GROUP BY source
             |ORDER BY source""".stripMargin)),

    CatalogQuery(
      "dd25_incremental_substring",
      "Incremental ExactSubstr probe: the new batch's (doc_id % 5 = 4) 8-token windows probed against the STANDING corpus's window keys — per-batch-doc already-known-window fraction + keep flag; history is never re-paired with itself (dd11/dd17's ingestion convention applied to the suffix-dedup family)",
      (s, dir) => {
        // dd15 re-scans the whole corpus per run; an ingestion
        // pipeline runs suffix-dedup DAILY against what it already
        // holds. Shape: history folds ONCE into its distinct window
        // keys (at 100 TB that is a standing bucketed table maintained
        // by appending each accepted batch's keys — a REAL component
        // since round 16: SubstrIndex build/append/probe, value-parity
        // with this query spec-gated in SubstrIndexSpec; here derived
        // in-query so the oracle can mirror it, the dd11/dd17
        // precedent) — history-history windows are never compared. The batch signs ONLY itself (window cost
        // ∝ batch size), the probe join co-partitions on the two-long
        // window key, and the hinted shuffle-hash build side is the
        // BATCH's windows (the small side at any real batch:corpus
        // ratio). n_win is closed-form from the token count (the tx17
        // lesson); a window repeated inside the batch doc counts each
        // occurrence (span accounting, dd15's convention); keep mirrors
        // dd15's < 20 % cut on the known fraction.
        val k = 8
        val d = docs(s, dir)
        val isBatch = pmod(col("doc_id"), lit(5)) === 4
        def winKeys(df: DataFrame) = TextOps
          .wordShinglePosRows(df, "doc_id", "text", k)
          .select(col("doc_id"), TextOps.windowKey1(col("_el")).as("h1"),
            TextOps.windowKey2(col("_el")).as("h2"))
        val histKeys = winKeys(d.filter(!isBatch))
          .select(col("h1"), col("h2")).distinct()
        val known = histKeys
          .join(winKeys(d.filter(isBatch)).hint("shuffle_hash"),
            Seq("h1", "h2"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_known"))
        d.filter(isBatch)
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
          .join(known, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"),
            when(col("n_tok") >= k, col("n_tok") - (k - 1))
              .otherwise(0L).cast("long").as("n_win"),
            coalesce(col("n_known"), lit(0L)).as("n_known"))
          .withColumn("known_pct_e6",
            when(col("n_win") === 0, lit(0L))
              .otherwise(round(col("n_known") * 1e6 / col("n_win"))
                .cast("long")))
          .withColumn("keep", (col("known_pct_e6") < 200000).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tok
             |  FROM documents),
             |d AS (SELECT doc_id, len(tok) AS n_tok, tok FROM t),
             |g AS (
             |  SELECT doc_id, md5(array_to_string(tok[i:i+7], ' ')) AS gh
             |  FROM (
             |    SELECT doc_id, tok, unnest(range(1, len(tok) - 6)) AS i
             |    FROM d WHERE len(tok) >= 8)),
             |hk AS (SELECT DISTINCT gh FROM g WHERE doc_id % 5 <> 4),
             |kn AS (SELECT doc_id, count(*) AS n_known FROM g
             |  JOIN hk USING (gh) WHERE doc_id % 5 = 4 GROUP BY doc_id),
             |o AS (
             |  SELECT d.doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             |    CAST(CASE WHEN n_tok >= 8 THEN n_tok - 7 ELSE 0 END
             |      AS BIGINT) AS n_win,
             |    CAST(coalesce(n_known, 0) AS BIGINT) AS n_known
             |  FROM d LEFT JOIN kn USING (doc_id) WHERE d.doc_id % 5 = 4)
             |SELECT doc_id, n_tok, n_win, n_known,
             |  CAST(CASE WHEN n_win = 0 THEN 0
             |    ELSE round(n_known * 1000000.0 / n_win) END AS BIGINT)
             |    AS known_pct_e6,
             |  CAST(CASE WHEN (CASE WHEN n_win = 0 THEN 0
             |      ELSE round(n_known * 1000000.0 / n_win) END) < 200000
             |    THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM o
             |ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dd11_incremental_dedup",
      "Incremental ingestion dedup: new batch (doc_id % 5 = 4) probed against the standing corpus by content hash, then keep-first within the batch",
      (s, dir) => {
        // The ingestion-time shape of dd02: history is NEVER rescanned
        // against itself — it folds once into a (content-hash → min id)
        // index (at 100 TB that index is a standing bucketed table the
        // daily batch joins into; here it's derived in-query). Both
        // joins key on the content hash, so batch and index co-partition
        // on the same shuffle key and no broadcast assumption is needed
        // (an ingest batch can be arbitrarily large). Statuses:
        // dup_history (content already ingested), dup_batch (first copy
        // is earlier in this batch), new.
        val d = docs(s, dir).select(col("doc_id"), md5(col("text")).as("chash"))
        val batch = d.filter(pmod(col("doc_id"), lit(5)) === 4)
        val hist = d.filter(pmod(col("doc_id"), lit(5)) =!= 4)
          .groupBy(col("chash")).agg(min(col("doc_id")).as("hist_id"))
        val batchMin = batch
          .groupBy(col("chash")).agg(min(col("doc_id")).as("batch_min"))
        batch.join(hist, Seq("chash"), "left")
          .join(batchMin, Seq("chash"), "left")
          .select(col("doc_id"),
            when(col("hist_id").isNotNull, lit("dup_history"))
              .when(col("batch_min") < col("doc_id"), lit("dup_batch"))
              .otherwise(lit("new")).as("status"),
            when(col("hist_id").isNotNull, col("hist_id"))
              .when(col("batch_min") < col("doc_id"), col("batch_min"))
              .cast("long").as("dup_of"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, md5(text) AS chash FROM documents),
             |b AS (SELECT * FROM d WHERE doc_id % 5 = 4),
             |h AS (SELECT chash, min(doc_id) AS hist_id FROM d
             |      WHERE doc_id % 5 <> 4 GROUP BY chash),
             |bm AS (SELECT chash, min(doc_id) AS batch_min FROM b GROUP BY chash)
             |SELECT b.doc_id,
             |  CASE WHEN h.hist_id IS NOT NULL THEN 'dup_history'
             |       WHEN bm.batch_min < b.doc_id THEN 'dup_batch'
             |       ELSE 'new' END AS status,
             |  CAST(CASE WHEN h.hist_id IS NOT NULL THEN h.hist_id
             |       WHEN bm.batch_min < b.doc_id THEN bm.batch_min
             |       END AS BIGINT) AS dup_of
             |FROM b LEFT JOIN h USING (chash) LEFT JOIN bm USING (chash)
             |ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dd12_embedding_neardup_lsh",
      "Embedding near-dup pairs via hyperplane-LSH bucketing + exact-cosine verify - dd06's linear scale path (bits/table grow with log2(n); oversized buckets rep-chain)",
      (s, dir) => SimilarityQueries.neardupLshPairs(s, dir)
        .orderBy(col("a_id"), col("b_id")),
      Some(SimilarityQueries.dd12OracleSql)),

    CatalogQuery(
      "dd13_semdedup",
      "SemDeDup semantic dedup: fixed-centroid cluster assignment -> within-cluster cosine >= 0.4 components -> keep the member farthest from its centroid",
      (s, dir) => {
        // SemDeDup (Abbas et al. 2023): quantize embeddings to coarse
        // clusters, find semantic-duplicate groups WITHIN each cluster
        // only (never across the corpus), and keep one exemplar per
        // group — the member with the LOWEST centroid similarity, i.e.
        // the most atypical, preserving diversity. Here the quantizer
        // is ss03b's deterministic dyadic codebook (codegen'd IvfAssign
        // assignment), so the whole pipeline is value-oracle-able.
        //
        // Scale shape: pair generation is per-cluster all-pairs, so the
        // shuffle key is the cluster id and per-reducer work is
        // O(cluster²). Real deployments grow the codebook with the
        // corpus (k ≈ n / target_cluster_size keeps clusters ~constant
        // size, the paper uses k on the order of sqrt(n·d)); the plan
        // shape is IDENTICAL, only the codebook relation is larger.
        // With the fixture's FIXED 16 centroids the per-cluster work is
        // ~n²/16, so guard like dd06 rather than silently burn a
        // cluster on a corpus this codebook is too coarse for.
        val cap = s.conf.getOption("graft.ext.semdedupMaxRows")
          .map(_.toLong).getOrElse(200000L)
        val e = SimilarityQueries.embeddings(s, dir)
          .select(col("vec_id"), col("v"))
        val n = e.count()
        require(n <= cap,
          s"dd13_semdedup partitions pairs by a FIXED 16-centroid " +
            s"codebook: corpus has $n rows > cap $cap, so per-cluster " +
            "all-pairs work is quadratic at this codebook size. Grow the " +
            "codebook with the corpus (see scaladoc), or raise spark.conf " +
            "graft.ext.semdedupMaxRows to override.")
        import graft.functions.VectorOps
        val a = e.withColumn("bucket", SimilarityQueries.ivfAssignCol(s))
        // cosine test INSIDE the join condition (dd06's lesson: only
        // true near-dup rows materialize vector-carrying output)
        val cos = VectorOps.dot(col("x.v"), col("y.v"))
        val pairs = a.as("x").join(a.as("y"),
            col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id") && cos >= 0.4)
          .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
        // edges never cross buckets, so components are bucket-local;
        // the propagation loop is dd08's (rounds = group diameter, ~1-2
        // for epsilon-ball duplicate groups)
        val comp = minLabelComponents(pairs, "dd13")
          .select(col("v").as("vec_id"), col("lbl").cast("long").as("cluster"))
        // centroid similarity via a broadcast 16-row codebook join —
        // the centroid matrix rides once as data, never as literals
        val cent = SimilarityQueries.centroidFrame(s)
        val sim = a.join(broadcast(cent), "bucket")
          .select(col("vec_id"), col("bucket"),
            round(VectorOps.dot(col("v"), col("cent")) * 1e6)
              .cast("long").as("cent_e6"))
        val j = comp.join(sim, "vec_id")
        // keep rule as a min-of-struct AGGREGATION (partial-agg
        // combines map-side; a row_number window would sort whole
        // clusters on one reducer)
        val keepers = j.groupBy(col("cluster"))
          .agg(min(struct(col("cent_e6"), col("vec_id"))).as("k"))
          .select(col("cluster"), col("k.vec_id").as("keep_id"))
        j.join(keepers, "cluster")
          .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
            col("cluster"), col("cent_e6"),
            (col("vec_id") === col("keep_id")).cast("long").as("keep"))
          .orderBy(col("vec_id"))
      },
      Some(SimilarityQueries.dd13OracleSql)),

    CatalogQuery(
      "dd14_bloom_prefilter",
      "Bloom-filter pre-filter for incremental dedup: history content hashes folded into a compact md5-derived bit set, batch probed with k=4 positions before the exact index join",
      (s, dir) => {
        // dd11 joins EVERY batch row against the standing content-hash
        // index; at 100 TB that join is the expensive stage and most
        // batch rows are new. A Bloom pre-filter answers "definitely
        // not in history" from a compact bit set so only possible dups
        // reach the exact join. The filter is built PORTABLY: set bit
        // j of the classic array is row j of a distinct bit-position
        // relation; positions are (a_i·h + b_i) mod p mod m rehashes
        // of the 31-bit md5 segment (the minhash universal-hash
        // family, everything < 2^62), so DuckDB re-derives the
        // identical filter and the query is fully value-oracled.
        // The bit relation (≤ m rows, m = 65536 here) broadcasts; at
        // real scale m grows with |history| (m ≈ 10·n for ~1% fpp)
        // and the probe join co-partitions on the bit position
        // instead — same plan shape, bigger relation. Output per
        // batch doc: bloom verdict, exact-truth verdict, and the
        // false-positive marker. False NEGATIVES are impossible by
        // construction (a true dup shares the content hash, hence all
        // k positions) — spec-asserted.
        val k = 4; val m = 65536L
        val d = docs(s, dir).select(col("doc_id"),
          md5(col("text")).as("chash"),
          (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
            .bitwiseAND(lit(Int.MaxValue.toLong))).as("h"))
        val batch = d.filter(pmod(col("doc_id"), lit(5)) === 4)
        val hist = d.filter(pmod(col("doc_id"), lit(5)) =!= 4)
        def posArr = array((0 until k).map(i =>
          (col("h") * lit(TextOps.uhA(i)) + lit(TextOps.uhB(i)))
            % lit(2147483647L) % lit(m)): _*)
        val bits = hist.select(explode(posArr).as("bit")).distinct()
        // k probe rows per batch doc; count of matched rows = k iff
        // every position is set (duplicate positions match per-row)
        val probed = batch
          .select(col("doc_id"), col("chash"), explode(posArr).as("bit"))
          .join(bits.withColumn("_hit", lit(1)), Seq("bit"), "left")
          .groupBy(col("doc_id"), col("chash"))
          .agg((count(col("_hit")) === k).as("_bloom"))
        val histHashes = hist.select(col("chash")).distinct()
          .withColumn("_dup", lit(1))
        probed.join(histHashes, Seq("chash"), "left")
          .select(col("doc_id"),
            col("_bloom").cast("long").as("bloom_hit"),
            col("_dup").isNotNull.cast("long").as("is_dup"),
            (col("_bloom") && col("_dup").isNull).cast("long").as("false_pos"))
          .orderBy(col("doc_id"))
      },
      Some {
        val k = 4
        def posSql(src: String, cols: String): String =
          (0 until k).map(i =>
            s"SELECT $cols, (h * ${TextOps.uhA(i)} + ${TextOps.uhB(i)}) " +
              s"% 2147483647 % 65536 AS bit FROM $src")
            .mkString(" UNION ALL ")
        s"""WITH d AS (
           |  SELECT doc_id, md5(text) AS chash,
           |    ('0x' || substr(md5(text), 1, 8))::BIGINT & 2147483647 AS h
           |  FROM documents),
           |b AS (SELECT * FROM d WHERE doc_id % 5 = 4),
           |hs AS (SELECT * FROM d WHERE doc_id % 5 <> 4),
           |bits AS (SELECT DISTINCT bit FROM (${posSql("hs", "doc_id")})),
           |pr AS (${posSql("b", "doc_id, chash")}),
           |hit AS (SELECT pr.doc_id, pr.chash, count(bits.bit) AS nm
           |        FROM pr LEFT JOIN bits USING (bit)
           |        GROUP BY pr.doc_id, pr.chash),
           |hh AS (SELECT DISTINCT chash FROM hs)
           |SELECT hit.doc_id,
           |  CAST(CASE WHEN nm = $k THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit,
           |  CAST(CASE WHEN hh.chash IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           |    AS is_dup,
           |  CAST(CASE WHEN nm = $k AND hh.chash IS NULL THEN 1 ELSE 0 END
           |    AS BIGINT) AS false_pos
           |FROM hit LEFT JOIN hh USING (chash)
           |ORDER BY doc_id""".stripMargin
      }),

    CatalogQuery(
      "dd15_substring_dedup",
      "Exact repeated-substring detection (suffix-dedup shape, Lee et al. 2022 scaled to k=8 tokens): every 8-token window digested across the corpus, windows shared by >= 2 docs mark duplicated spans; per-doc duplicated-token fraction + keep flag",
      (s, dir) => {
        // The ExactSubstr dedup shape ("Deduplicating Training Data
        // Makes Language Models Better", Lee et al. 2022): any k-token
        // run appearing in two different documents is training-data
        // duplication even when the documents as wholes are unrelated
        // (license headers, quoted passages, syndicated paragraphs).
        // The paper's suffix array is a single-machine structure; the
        // distributed equivalent is stride-1 k-token windows — a
        // shared run of length L >= k yields matching windows at EVERY
        // alignment, so detection is exact for runs >= k regardless of
        // where the run sits in each doc (no winnowing/stride recall
        // loss). Costs, at 100 TB: window generation is the linear
        // shuffle-free sliding pass (wordShinglePosRows, guarded per
        // doc); only the 16-byte two-long window key of
        // each window shuffles, never the window text; doc-frequency
        // is a two-level aggregation whose (digest, doc) distinct
        // pre-aggregates map-side, so a boilerplate window present in
        // a billion docs arrives at its reducer already folded to one
        // row per upstream partition. Span accounting explodes dup
        // windows × k — bounded by k × corpus tokens only when the
        // ENTIRE corpus is duplicated; typically |dup windows| << |windows|.
        val k = 8
        val d = docs(s, dir).select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        val grams = TextOps
          .wordShinglePosRows(docs(s, dir), "doc_id", "text", k)
          .select(col("doc_id"), col("_pos").cast("long").as("pos"),
            TextOps.windowKey1(col("_el")).as("h1"),
            TextOps.windowKey2(col("_el")).as("h2"))
        // windows in >= 2 distinct docs, tested as min(doc_id) !=
        // max(doc_id) in ONE pure-partial aggregation — dd20's trick:
        // the distinct -> count spelling is a second full shuffle of
        // the near-unique digest stream and measured 52 s vs 35 s at
        // 500k docs (SCALING.md round 14; the dd07/tx14 no-raw-
        // countDistinct lesson still holds, this sidesteps the
        // distinct pass entirely)
        val dup = grams.groupBy(col("h1"), col("h2"))
          .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
          .filter(col("lo") =!= col("hi")).select(col("h1"), col("h2"))
        // shuffle_hash, not sort-merge: the probe side is the full
        // 36.7M-row window stream and SMJ would SORT it; the build
        // side is only the duplicated keys — bounded per partition
        // (|dup windows| / shuffle.partitions × 16 bytes) even on a
        // fully-duplicated corpus. Measured 52 s SMJ → 36 s SHJ at
        // 500k (Dd15StageProbe).
        // checkpointed: nDup and covered both read it, and each lazy
        // reference re-ran the digest stream AND the dup aggregation
        // (the dd03 small-frame checkpoint rule: dup windows are
        // |dup occurrences| rows — tiny next to their upstream)
        val dupWin = grams.join(dup.hint("shuffle_hash"), Seq("h1", "h2"))
          .select(col("doc_id"), col("pos"))
          .localCheckpoint()
        val nDup = dupWin.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_dup_win"))
        // exact covered-token count: overlapping windows union via
        // distinct positions (k rows per dup window, k is a constant)
        val covered = dupWin
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("tp"))
          .distinct()
          .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_tok"))
        d.join(nDup, Seq("doc_id"), "left")
          .join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"),
            when(col("n_tok") >= k, col("n_tok") - (k - 1))
              .otherwise(0L).cast("long").as("n_win"),
            coalesce(col("n_dup_win"), lit(0L)).as("n_dup_win"),
            coalesce(col("dup_tok"), lit(0L)).as("dup_tok"))
          .withColumn("dup_pct_e6",
            round(col("dup_tok") * 1e6 / col("n_tok")).cast("long"))
          .withColumn("keep", (col("dup_pct_e6") < 200000).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tok
             |  FROM documents),
             |d AS (SELECT doc_id, len(tok) AS n_tok, tok FROM t),
             |g AS (
             |  SELECT doc_id, u['pos'] AS pos, md5(u['gram']) AS gh FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, n_tok - 6),
             |      i -> {'pos': i - 1,
             |            'gram': array_to_string(tok[i:i+7], ' ')})) AS u
             |    FROM d WHERE n_tok >= 8)),
             |df AS (SELECT gh FROM (
             |    SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh)
             |  WHERE nd >= 2),
             |dw AS (SELECT g.doc_id, g.pos FROM g JOIN df USING (gh)),
             |nd AS (SELECT doc_id, count(*) AS n_dup_win FROM dw
             |       GROUP BY doc_id),
             |cov AS (SELECT doc_id, count(*) AS dup_tok FROM (
             |    SELECT DISTINCT doc_id, tp FROM (
             |      SELECT doc_id, pos + unnest(range(0, 8)) AS tp FROM dw))
             |  GROUP BY doc_id),
             |o AS (
             |  SELECT d.doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             |    CAST(CASE WHEN n_tok >= 8 THEN n_tok - 7 ELSE 0 END
             |      AS BIGINT) AS n_win,
             |    CAST(coalesce(n_dup_win, 0) AS BIGINT) AS n_dup_win,
             |    CAST(coalesce(dup_tok, 0) AS BIGINT) AS dup_tok,
             |    CAST(round(coalesce(dup_tok, 0) * 1000000.0 / n_tok)
             |      AS BIGINT) AS dup_pct_e6
             |  FROM d LEFT JOIN nd USING (doc_id) LEFT JOIN cov USING (doc_id))
             |SELECT doc_id, n_tok, n_win, n_dup_win, dup_tok, dup_pct_e6,
             |  CAST(CASE WHEN dup_pct_e6 < 200000 THEN 1 ELSE 0 END AS BIGINT)
             |    AS keep
             |FROM o
             |ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dd16_cc_star",
      "Connected components by alternating large/small-star contraction (O(log n) rounds on ANY topology — the chain-robust scale path to dd08's diameter-bound propagation); same cosine >= 0.4 edges, same min-id labels",
      (s, dir) => {
        // identical input graph and output contract as dd08, different
        // iteration engine: star contraction's round count is
        // O(log n) regardless of component shape, where min-label
        // propagation pays the component diameter. The spec proves
        // both engines agree label-for-label and that a planted
        // 200-node path (diameter 199 — propagation's worst case)
        // converges in a handful of contraction rounds.
        val pairs = embeddingNearDupPairs(s, dir).select(col("a_id"), col("b_id"))
        starComponentsWithRounds(pairs, "dd16")._1
          .select(col("v").as("vec_id"), col("lbl").cast("long").as("component"))
          .orderBy(col("vec_id"))
      },
      Some(ccOracleSql)),

    CatalogQuery(
      "dd17_incremental_minhash",
      "Incremental NEAR-dup probe: new batch (doc_id % 5 = 4) MinHash-signed and probed against the standing corpus's banded LSH index, exact-Jaccard verified — history is never re-paired with itself",
      (s, dir) => {
        // dd11's standing-index shape composed with dd03's signatures:
        // dd11 catches only EXACT re-ingestion (content hash); this is
        // the near-dup flavor real curation pipelines run daily. The
        // history side folds once into a (band, bucket) index — at
        // 100 TB a persisted bucketed table maintained by appending
        // each accepted batch's buckets, here derived in-query — the
        // batch signs ONLY itself (cost ∝ batch size), the probe join
        // co-partitions on (band, bucket), and history-history pairs
        // are never generated. Flooded history buckets collapse to
        // their min-id representative (bounded work per batch doc).
        // Same shingle/LSH/verify constants as dd03, so a pair this op
        // reports is exactly a dd03 pair that crosses the batch split.
        val d = docs(s, dir)
        val isBatch = pmod(col("doc_id"), lit(5)) === 4
        val histRows = TextOps.wordShingleRows(
          d.filter(!isBatch), "doc_id", "text", 3)
        val batchRows = TextOps.wordShingleRows(
          d.filter(isBatch), "doc_id", "text", 3)
        val roll = TextOps.lshProbePairs(histRows, batchRows, "doc_id",
            numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
            threshNum = 8, threshDen = 10)
          .groupBy(col("batch_id"))
          .agg(min(col("hist_id")).as("dup_of"),
            count(lit(1)).as("n_matches"))
        d.filter(isBatch).select(col("doc_id"))
          .join(roll, col("doc_id") === col("batch_id"), "left")
          .select(col("doc_id"),
            when(col("dup_of").isNotNull, lit("near_dup_history"))
              .otherwise(lit("new")).as("status"),
            col("dup_of").cast("long").as("dup_of"),
            coalesce(col("n_matches"), lit(0L)).as("n_matches"))
          .orderBy(col("doc_id"))
      },
      // generated from the identical constants as the Spark plan (same
      // md5-segment/mod-p chain as dd03's oracle, band join restricted
      // to batch -> capped history)
      Some(TextOps.lshProbeOracleSql(TextOps.wordShingleSql(3),
        batchPred = "doc_id % 5 = 4", histPred = "doc_id % 5 <> 4",
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
        threshNum = 8, threshDen = 10))),

    CatalogQuery(
      "dd18_sequential_admission",
      "Greedy sequential admission over the near-dup graph: id-ordered insert-then-probe semantics (admit iff no ADMITTED smaller doc matches) via bounded-round maximal-independent-set peeling — the online-index flavor dd10's CC keep-min is not",
      (s, dir) => {
        // dd10 answers \"which docs form a near-dup cluster, keep the
        // min\"; this answers what an ONLINE dedup index would have
        // done ingesting the same corpus in id order: A~B~C (A≁C)
        // keeps A under CC but admits A AND C here, because rejected B
        // was never inserted for C to match. Same LSH candidate/verify
        // chain as dd10 (bucket-capped, linear in corpus), then 4
        // rounds of MIS peeling — each round one co-partitioned join
        // over the (tiny) verified pair graph, localCheckpoint'd like
        // the dd08/dd16 loops; undecided residue past the bound falls
        // back to conservative rejection, so the bound caps work, never
        // correctness of admits.
        val rows = TextOps.wordShingleRows(docs(s, dir), "doc_id", "text", 3)
        val pairs = TextOps.lshNearDupPairs(rows, "doc_id",
            numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
            threshNum = 8, threshDen = 10)
          .select(col("a_id"), col("b_id"))
        TextOps.sequentialAdmit(pairs, rounds = 4)
          .orderBy(col("doc_id"))
      },
      // the same unrolled-round semantics in plain CTEs over dd10's
      // engine-portable pair chain
      Some(TextOps.sequentialAdmitOracleSql(TextOps.wordShingleSql(3),
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 100,
        threshNum = 8, threshDen = 10, rounds = 4))),

    CatalogQuery(
      "dd26_embed_incremental",
      "Incremental EMBEDDING near-dup probe: new batch (vec_id % 5 = 4) hyperplane-LSH-signed and probed against the standing corpus's flood-capped signature buckets, exact-cosine verified - dd17's daily shape in dd12's family",
      (s, dir) => {
        // dd17's incremental-probe shape for embeddings: the history
        // side folds once into flood-capped (t, sig) buckets — at
        // 100 TB a persisted EmbedIndex table maintained by promotion,
        // here derived in-query (graft.ext.EmbedIndex.probeVecs is the
        // shared twin; the EmbedStream admission runs this
        // continuously) — the batch signs ONLY itself, candidates
        // co-partition on the signature key, history-history pairs are
        // never generated, and verification is one codegen'd dot over
        // candidate-narrowed vectors the index rows already carry.
        val e = SimilarityQueries.embeddings(s, dir)
          .select(col("vec_id"), col("v"))
        val isBatch = pmod(col("vec_id"), lit(5)) === 4
        val roll = graft.ext.EmbedIndex.probeVecs(
            e.filter(!isBatch), e.filter(isBatch))
          .groupBy(col("batch_id"))
          .agg(min(col("hist_id")).as("dup_of"),
            count(lit(1)).as("n_matches"))
        e.filter(isBatch).select(col("vec_id"))
          .join(roll, col("vec_id") === col("batch_id"), "left")
          .select(col("vec_id"),
            when(col("dup_of").isNotNull, lit("near_dup_history"))
              .otherwise(lit("new")).as("status"),
            col("dup_of").cast("long").as("dup_of"),
            coalesce(col("n_matches"), lit(0L)).as("n_matches"))
          .orderBy(col("vec_id"))
      },
      // the probe flavor of dd12's CTE chain: bucket stats over
      // HISTORY sigs only, batch × kept candidates, dd17's roll
      Some(SimilarityQueries.embedProbeOracleSql(
        "vec_id % 5 = 4", "vec_id % 5 <> 4"))),
  )
}

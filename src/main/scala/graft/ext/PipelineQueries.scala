package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CatalogQuery
import graft.sources.Tables

/** Training-pipeline assembly operators: the steps between a cleaned
  * corpus and the tensors a trainer reads — sequence packing and
  * deterministic dataset splitting.
  *
  * Design for 100 TB: both operators are pure functions of (doc_id,
  * token count), so they need one scan and at most one window per hash
  * bucket — no global sort, no RNG, no driver state. Determinism is the
  * point: a resumable pipeline must assign the same doc to the same
  * chunk/split on every re-run, on any cluster size.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** dp02's deterministic split rule — THE one copy, shared with tx24
    * and ss12 (which measure drift "between dp02's splits" and must
    * therefore always use dp02's actual rule): membership is a pure
    * function of the id (md5 of a salted id; ~5% val, ~5% test).
    * Parameterized over the id column because ss12 keys it on vec_id;
    * [[splitCol]] is the documents-table instance. */
  def splitColFor(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = substring(md5(concat(lit("split:"), id.cast("string"))), 1, 2)
    when(h < "0d", lit("val")).when(h < "1a", lit("test")).otherwise(lit("train"))
  }

  val splitCol: org.apache.spark.sql.Column = splitColFor(col("doc_id"))

  /** The DuckDB rendering of [[splitColFor]], interpolated into every
    * oracle so the rule cannot drift between engines or queries. */
  def splitSqlFor(idExpr: String): String =
    s"""CASE WHEN substr(md5('split:' || CAST($idExpr AS VARCHAR)), 1, 2) < '0d' THEN 'val'
       |     WHEN substr(md5('split:' || CAST($idExpr AS VARCHAR)), 1, 2) < '1a' THEN 'test'
       |     ELSE 'train' END""".stripMargin

  val splitSql: String = splitSqlFor("doc_id")

  /** dp05's typed row: (doc, its hash bucket, its token count). */
  case class DocTok(doc_id: Long, bucket: Long, n_tok: Long)

  /** dp12's water-filling plan, unordered — shared by the dp12 entry
    * and dp17's plan-vs-actuals reconciliation. */
  private def budgetPlan(s: SparkSession, dir: String): DataFrame = {
        // The planning step BEFORE dp08's sampling executes: given a
        // total token budget, how many tokens come from each source?
        // Target shares ∝ avail · floor(2^19/sqrt(avail)) ≈ sqrt(avail)
        // (dp08's correctly-rounded-sqrt portability argument). A source
        // whose share exceeds its availability caps there and its
        // deficit redistributes over the others — water-filling. Rounds
        // are BOUNDED at 3 allocations (2 redistributions), the g07b/g09
        // convention that lets DuckDB unroll the loop exactly; a
        // deeper-than-2 saturation cascade leaves budget unspent rather
        // than over-drawing (final allocation clamps at avail). All
        // integer arithmetic: every div is a floor on non-negative
        // BIGINTs, so both engines agree bit-for-bit. Scale shape: one
        // corpus scan to per-source sums; the water-filling runs on the
        // #sources-row summary via 1-row aggregate cross-joins
        // (broadcast by construction) — never on the corpus.
        val d = docs(s, dir).select(col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        val st = d.groupBy(col("source"))
          .agg(sum(col("n_tok")).as("avail"))
          .withColumn("target", col("avail") *
            least(lit(524288L), floor(lit(524288.0) /
              sqrt(greatest(col("avail"), lit(1L)))).cast("long")))
        val g1 = st.agg(sum(col("target")).as("tot1"),
          expr("(sum(avail) * 6) div 10").as("budget"))
        val r1 = st.crossJoin(broadcast(g1))
          .withColumn("alloc1", expr("(budget * target) div nullif(tot1, 0)"))
          .withColumn("sat1", col("alloc1") >= col("avail"))
        val g2 = r1.agg(
          sum(when(col("sat1"), col("avail")).otherwise(0L)).as("satav1"),
          sum(when(col("sat1"), 0L).otherwise(col("target"))).as("tot2"))
        val r2 = r1.crossJoin(broadcast(g2))
          .withColumn("alloc2",
            expr("((budget - satav1) * target) div nullif(tot2, 0)"))
          .withColumn("sat2", col("sat1") || col("alloc2") >= col("avail"))
        val g3 = r2.agg(
          sum(when(col("sat2"), col("avail")).otherwise(0L)).as("satav2"),
          sum(when(col("sat2"), 0L).otherwise(col("target"))).as("tot3"))
        r2.crossJoin(broadcast(g3))
          .withColumn("alloc3",
            expr("((budget - satav2) * target) div nullif(tot3, 0)"))
          .select(col("source"), col("avail").as("n_tokens"), col("target"),
            col("budget"),
            when(col("sat2"), col("avail"))
              .otherwise(least(col("avail"), col("alloc3")))
              .as("planned_tokens"),
            when(col("sat2"), lit(1L)).otherwise(lit(0L)).as("saturated"))
  }

  /** The DuckDB CTE chain of [[budgetPlan]] (through r3) — THE one
    * copy, shared by dp12's oracle and dp17's reconciliation oracle so
    * the plan arithmetic cannot drift between them. */
  private val budgetPlanSqlCtes: String =
    """d AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |st AS (
      |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS avail,
      |    CAST(sum(n_tok) * least(524288, CAST(floor(524288.0
      |      / sqrt(greatest(sum(n_tok), 1))) AS BIGINT)) AS BIGINT)
      |      AS target
      |  FROM d GROUP BY source),
      |g1 AS (SELECT sum(target) AS tot1,
      |  CAST((sum(avail) * 6) // 10 AS BIGINT) AS budget FROM st),
      |r1 AS (SELECT st.*, g1.budget,
      |  (g1.budget * st.target) // nullif(g1.tot1, 0) AS alloc1
      |  FROM st, g1),
      |s1 AS (SELECT *, alloc1 >= avail AS sat1 FROM r1),
      |g2 AS (SELECT
      |  sum(CASE WHEN sat1 THEN avail ELSE 0 END) AS satav1,
      |  sum(CASE WHEN sat1 THEN 0 ELSE target END) AS tot2 FROM s1),
      |r2 AS (SELECT s1.*,
      |  ((s1.budget - g2.satav1) * s1.target)
      |    // nullif(g2.tot2, 0) AS alloc2
      |  FROM s1, g2),
      |s2 AS (SELECT *, sat1 OR alloc2 >= avail AS sat2 FROM r2),
      |g3 AS (SELECT
      |  sum(CASE WHEN sat2 THEN avail ELSE 0 END) AS satav2,
      |  sum(CASE WHEN sat2 THEN 0 ELSE target END) AS tot3 FROM s2),
      |r3 AS (SELECT s2.*,
      |  ((s2.budget - g3.satav2) * s2.target)
      |    // nullif(g3.tot3, 0) AS alloc3
      |  FROM s2, g3)""".stripMargin

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "dp01_concat_chunks",
      "Sequence packing, concat-then-chunk: per-bucket token cumsum maps each doc to its fixed-size (256-token) training-chunk span",
      (s, dir) => {
        // The pretraining packing model: docs are concatenated in a
        // deterministic order and the stream is cut every B tokens, so a
        // doc's chunk span is a closed-form function of its cumulative
        // offset — no bin-packing iteration, no state. Buckets bound the
        // window: cumsum partitions by doc_id % 8 (a cluster deployment
        // raises this to O(cores)), so no partition ever sees more than
        // corpus/8 rows and there is NO global sort.
        val b = 256L
        val t = docs(s, dir).select(
          col("doc_id"),
          (col("doc_id") % 8).as("bucket"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val off = (sum(col("n_tok")).over(w) - col("n_tok")).as("off")
        t.select(col("doc_id"), col("bucket"), col("n_tok"), off)
          .select(col("doc_id"), col("bucket"), col("n_tok"), col("off"),
            expr(s"off div $b").as("first_chunk"),
            expr(s"(off + n_tok - 1) div $b").as("last_chunk"),
            expr(s"(off + n_tok - 1) div $b - off div $b + 1").as("n_seqs"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS bucket,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, bucket, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
             |  FROM t)
             |SELECT doc_id, bucket, n_tok, off,
             |  CAST(off // 256 AS BIGINT) AS first_chunk,
             |  CAST((off + n_tok - 1) // 256 AS BIGINT) AS last_chunk,
             |  CAST((off + n_tok - 1) // 256 - off // 256 + 1 AS BIGINT) AS n_seqs
             |FROM o ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dp02_train_split",
      "Deterministic hash train/val/test split (md5 of doc_id: ~5% val, ~5% test) with per-split token totals",
      (s, dir) => {
        // membership is a pure function of doc_id (no RNG, no
        // sample()): re-runs and different partitionings yield the
        // identical split, and adding docs never reshuffles old ones —
        // the property that keeps a 100 TB eval set stable across
        // pipeline versions. One scan + one 3-group aggregate.
        docs(s, dir)
          .select(splitCol.as("split"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
            col("doc_id"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("total_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("split"))
      },
      Some(s"""WITH a AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok,
             |    $splitSql AS split
             |  FROM documents)
             |SELECT split,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |  CAST(min(doc_id) AS BIGINT) AS first_doc
             |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)),

    CatalogQuery(
      "dp03_curriculum_buckets",
      "Curriculum length-bucketing: fixed token-length boundaries (32/64/96) per source, with per-bucket token totals",
      (s, dir) => {
        // fixed boundaries, not ntile(): quantile bucketing needs a
        // global sort (or an approx-percentile pre-pass) and re-buckets
        // old docs whenever new data arrives; fixed thresholds are one
        // scan + one aggregate and stable across corpus versions —
        // what a resumable curriculum schedule actually wants.
        val nTok = size(TextOps.tokens(col("text"))).cast("long")
        val bucket = when(nTok < 32, "xs").when(nTok < 64, "s")
          .when(nTok < 96, "m").otherwise("l")
        docs(s, dir)
          .select(col("source"), bucket.as("bucket"), nTok.as("n_tok"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
            min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
          .orderBy(col("source"), col("bucket"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents)
             |SELECT source,
             |  CASE WHEN n_tok < 32 THEN 'xs' WHEN n_tok < 64 THEN 's'
             |       WHEN n_tok < 96 THEN 'm' ELSE 'l' END AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |  CAST(min(n_tok) AS BIGINT) AS min_tok,
             |  CAST(max(n_tok) AS BIGINT) AS max_tok
             |FROM t GROUP BY source, bucket ORDER BY source, bucket""".stripMargin)),

    CatalogQuery(
      "dp04_epoch_mixture",
      "Data-mixture up/down-weighting: per-tier epoch repeat factors (2.5x / 1x / 0.25x) via integer repeats + deterministic hash fraction",
      (s, dir) => {
        // Mixture weighting as a materialized epoch list: repeat factor
        // f = integer part + Bernoulli(frac) — but the Bernoulli draw is
        // `md5(doc_id) < threshold`, not an RNG, so every re-run (and
        // every engine) materializes the IDENTICAL epoch assignment.
        // tx07 is the downsampling half of mixture control; this is the
        // upsampling half. Row growth is the repeat factor itself (the
        // intended output), and the explode is row-generation inside
        // codegen — no shuffle until the final ORDER BY.
        val tier = substring(col("source"), 4, 10).cast("int") % 3
        val h = substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4)
        val frac = when(tier === 0, lit("8000"))   // +0.5
          .when(tier === 1, lit("0000"))           // +0
          .otherwise(lit("4000"))                  // +0.25
        val reps = when(tier === 0, 2).when(tier === 1, 1).otherwise(0) +
          when(frac > h, 1).otherwise(0)
        docs(s, dir)
          .select(col("doc_id"), col("source"), tier.cast("long").as("tier"),
            reps.as("reps"))
          .filter(col("reps") > 0)
          .select(col("doc_id"), col("source"), col("tier"),
            explode(sequence(lit(1), col("reps"))).as("epoch"))
          .select(col("doc_id"), col("source"), col("tier"),
            col("epoch").cast("long").as("epoch"))
          .orderBy(col("doc_id"), col("epoch"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, source, CAST(substr(source, 4) AS INT) % 3 AS tier,
             |    substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, source, tier,
             |    CASE tier WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END
             |      + CASE WHEN (CASE tier WHEN 0 THEN '8000' WHEN 1 THEN '0000'
             |          ELSE '4000' END) > h THEN 1 ELSE 0 END AS reps
             |  FROM a),
             |x AS (SELECT doc_id, source, tier, unnest(range(1, reps + 1)) AS epoch
             |      FROM r WHERE reps > 0)
             |SELECT doc_id, source, CAST(tier AS BIGINT) AS tier,
             |  CAST(epoch AS BIGINT) AS epoch
             |FROM x ORDER BY doc_id, epoch""".stripMargin)),

    CatalogQuery(
      "dp05_greedy_pack",
      "Doc-boundary bin packing: greedy sequential fill of 256-token bins per bucket (flatMapSortedGroups)",
      (s, dir) => {
        // dp01's concat-then-chunk SPLITS docs across chunk boundaries;
        // this variant respects them: docs fill a bin until the next
        // one would overflow, then a new bin starts (an over-capacity
        // doc gets its own bin). That carry-the-fill state is genuinely
        // sequential — the documented last-resort tier of the custom-op
        // ladder — so it runs as flatMapSortedGroups: one shuffle on
        // bucket, each group's iterator is SORTED by doc_id and
        // streamed (never materialized), state is two longs. Buckets
        // bound the sequential span exactly as in dp01; the packing is
        // deterministic, so DuckDB reproduces it with a recursive CTE.
        import s.implicits._
        val t = docs(s, dir)
          .select(col("doc_id"), (col("doc_id") % 8).as("bucket"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
          .as[DocTok]
        t.groupByKey(_.bucket)
          .flatMapSortedGroups(col("doc_id")) { (_, docsIt) =>
            var bin = 0L; var fill = 0L; var first = true
            docsIt.map { d =>
              if (first) { fill = d.n_tok; first = false }
              else if (fill + d.n_tok <= 256) fill += d.n_tok
              else { bin += 1; fill = d.n_tok }
              (d.doc_id, d.bucket, d.n_tok, bin)
            }
          }
          .toDF("doc_id", "bucket", "n_tok", "bin")
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT doc_id, doc_id % 8 AS bucket,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
             |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS idx
             |  FROM documents),
             |pk(bucket, idx, doc_id, n_tok, bin, fill) AS (
             |  SELECT bucket, idx, doc_id, n_tok, 0, n_tok FROM t WHERE idx = 1
             |  UNION ALL
             |  SELECT t.bucket, t.idx, t.doc_id, t.n_tok,
             |    CASE WHEN pk.fill + t.n_tok <= 256 THEN pk.bin ELSE pk.bin + 1 END,
             |    CASE WHEN pk.fill + t.n_tok <= 256 THEN pk.fill + t.n_tok ELSE t.n_tok END
             |  FROM pk JOIN t ON t.bucket = pk.bucket AND t.idx = pk.idx + 1)
             |SELECT doc_id, bucket, n_tok, CAST(bin AS BIGINT) AS bin
             |FROM pk ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dp06_epoch_shuffle",
      "Deterministic per-epoch corpus shuffle: md5-keyed shard assignment + sort-within-shard position (no global sort; shards are the parallelism unit)",
      (s, dir) => {
        // A training run needs a GLOBAL reshuffle of the corpus each
        // epoch, reproducible across restarts and partitionings. The
        // scale-correct shape is hash-range sharding: the shuffle key
        // is a pure function md5("epoch1:" + doc_id) (no RNG state),
        // the shard is its top byte's range, and the within-shard
        // position is a window partitioned BY SHARD — so each shard
        // sorts independently (one reducer per shard, shard count
        // scales with the cluster) and there is never a global
        // single-partition sort. Epoch 2 just changes the salt; old
        // epochs are reproducible forever.
        val h = md5(concat(lit("epoch1:"), col("doc_id").cast("string")))
        val shard = pmod(
          conv(substring(h, 1, 2), 16, 10).cast("int"), lit(8))
        docs(s, dir)
          .select(col("doc_id"), h.as("h"), shard.as("shard"))
          .withColumn("pos", row_number().over(
            Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
            .cast("long"))
          .select(col("shard").cast("long").as("shard"), col("pos"),
            col("doc_id"))
          .orderBy(col("shard"), col("pos"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, h,
             |    ('0x' || substr(h, 1, 2))::BIGINT % 8 AS shard
             |  FROM a)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
             |    AS BIGINT) AS pos,
             |  doc_id
             |FROM b ORDER BY shard, pos""".stripMargin)),

    CatalogQuery(
      "dp07_source_cap",
      "Per-source document cap (RefinedWeb-style per-domain limit): keep the 10 lowest-md5-priority docs per source via bounded top-k aggregation, no window",
      (s, dir) => {
        // Web curation caps every domain's contribution so no single
        // crawl host dominates the mixture. The kept set must be
        // deterministic (resumable pipeline), so priority is
        // md5("cap:" + doc_id) — not RNG — and the per-source winners
        // come from the bounded TopKByScore aggregation: each map task
        // ships ≤ cap rows per source, so a 100M-page domain pre-folds
        // map-side instead of funneling every row through one window
        // reducer (the same skew argument as dd09/ss01). Score is the
        // NEGATED 32-bit priority (exact in DOUBLE), so "top-k by
        // score" = "k smallest priorities", ties broken by doc_id —
        // exactly row_number() ORDER BY pr, doc_id in the oracle.
        val pr = conv(substring(md5(concat(lit("cap:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        val topk = udaf(new graft.functions.Aggregators.TopKByScore(10))
        docs(s, dir)
          .select(col("source"), col("doc_id"), pr.as("_pr"))
          .groupBy(col("source"))
          .agg(topk((-col("_pr")).cast("double"), col("doc_id")).as("top"))
          .select(col("source"), posexplode(col("top.items")))
          .select(col("source"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.id").as("doc_id"),
            (-col("col.score")).cast("long").as("priority"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""WITH p AS (
             |  SELECT source, doc_id,
             |    ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS pr
             |  FROM documents),
             |r AS (
             |  SELECT source, doc_id, pr,
             |    row_number() OVER (PARTITION BY source ORDER BY pr, doc_id) AS rk
             |  FROM p)
             |SELECT source, CAST(rk AS BIGINT) AS rank, doc_id,
             |  CAST(pr AS BIGINT) AS priority
             |FROM r WHERE rk <= 10
             |ORDER BY source, rank""".stripMargin)),

    CatalogQuery(
      "dp08_temperature_sample",
      "Count-adaptive temperature downsampling: per-source keep rate min(1, 8/sqrt(n_docs)) applied as a deterministic md5-fraction cut (sampled mass ∝ sqrt(source size))",
      (s, dir) => {
        // The data-driven half of mixture control: tx07 applies FIXED
        // per-tier rates, dp04 fixed repeat factors — here the rate is
        // derived from corpus statistics. Inverse-sqrt keep rates give
        // sampled counts ∝ sqrt(n_s): temperature-style flattening
        // (alpha = 0.5) that damps giant sources without starving small
        // ones. Portability is why sqrt: IEEE requires sqrt (and /) be
        // correctly rounded, so floor(524288 / sqrt(n)) is bit-exact in
        // any engine — unlike pow(n, alpha) (libm, ulp-divergent) or a
        // cross-source Σ n^alpha (fold-order-dependent). The keep test
        // h16 < thr is a pure function of doc_id: resumable, engine-
        // independent, and adding docs never flips old decisions within
        // an unchanged source count. Two scans (stats, then probe) with
        // the #sources-row stats relation broadcast — the scale shape;
        // a window-over-source one-scan variant would shuffle the whole
        // corpus by source and serialize giant sources (dp07's skew
        // argument).
        val d = docs(s, dir).select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
          conv(substring(md5(concat(lit("temp:"),
            col("doc_id").cast("string"))), 1, 4), 16, 10)
            .cast("long").as("h16"))
        val stats = d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("thr", least(lit(65536L),
            floor(lit(524288.0) / sqrt(col("n_docs"))).cast("long")))
        d.join(broadcast(stats), Seq("source"))
          .groupBy(col("source"))
          .agg(first(col("n_docs")).as("n_docs"),
            first(col("thr")).as("thr"),
            sum((col("h16") < col("thr")).cast("long")).as("n_kept"),
            sum(when(col("h16") < col("thr"), col("n_tok"))
              .otherwise(lit(0L))).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
             |    ('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS h16
             |  FROM documents),
             |st AS (
             |  SELECT source, count(*) AS n_docs,
             |    least(65536, CAST(floor(524288.0 / sqrt(count(*))) AS BIGINT)) AS thr
             |  FROM d GROUP BY source)
             |SELECT d.source,
             |  CAST(st.n_docs AS BIGINT) AS n_docs,
             |  CAST(st.thr AS BIGINT) AS thr,
             |  CAST(sum(CASE WHEN d.h16 < st.thr THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_kept,
             |  CAST(sum(CASE WHEN d.h16 < st.thr THEN d.n_tok ELSE 0 END)
             |    AS BIGINT) AS kept_tokens
             |FROM d JOIN st USING (source)
             |GROUP BY d.source, st.n_docs, st.thr
             |ORDER BY d.source""".stripMargin)),

    CatalogQuery(
      "dp09_pack_manifest",
      "Packed-batch manifest: dp01's chunk spans exploded to one row per (chunk, contributing doc) with in-doc token range and doc-start flag — the trainer-facing index of what is in every 256-token sequence",
      (s, dir) => {
        // dp01 answers "which chunks does doc d touch"; the trainer
        // needs the transpose — "which doc slices compose chunk c"
        // (attention-mask resets at doc boundaries, provenance audits,
        // replaying one bad batch). Same closed-form offsets, then one
        // explode over each doc's chunk span: output rows = Σ n_seqs ≈
        // corpus_tokens/B + n_docs, linear, generated map-side after
        // dp01's single per-bucket cumsum window. Rows come out keyed
        // by (bucket, chunk) — exactly the layout a bucketed manifest
        // write wants, no extra shuffle.
        val b = 256L
        val t = docs(s, dir).select(
          col("doc_id"),
          (col("doc_id") % 8).as("bucket"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val spans = t
          .withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
          .withColumn("chunk", explode(sequence(
            expr(s"off div $b"), expr(s"(off + n_tok - 1) div $b"))))
        spans.select(col("bucket"), col("chunk"), col("doc_id"),
            greatest(col("chunk") * b - col("off"), lit(0L)).as("tok_from"),
            (least(col("off") + col("n_tok"), (col("chunk") + 1) * b) -
              greatest(col("off"), col("chunk") * b)).as("n_tok_in_chunk"),
            (col("off") >= col("chunk") * b).cast("long").as("doc_start"))
          .orderBy(col("bucket"), col("chunk"), col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS bucket,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, bucket, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
             |  FROM t),
             |s AS (
             |  SELECT doc_id, bucket, n_tok, off,
             |    unnest(range(off // 256, (off + n_tok - 1) // 256 + 1)) AS chunk
             |  FROM o)
             |SELECT CAST(bucket AS BIGINT) AS bucket,
             |  CAST(chunk AS BIGINT) AS chunk, doc_id,
             |  CAST(greatest(chunk * 256 - off, 0) AS BIGINT) AS tok_from,
             |  CAST(least(off + n_tok, (chunk + 1) * 256) -
             |    greatest(off, chunk * 256) AS BIGINT) AS n_tok_in_chunk,
             |  CAST(CASE WHEN off >= chunk * 256 THEN 1 ELSE 0 END AS BIGINT)
             |    AS doc_start
             |FROM s ORDER BY bucket, chunk, doc_id""".stripMargin)),

    CatalogQuery(
      "dp10_curation_funnel",
      "Per-source curation funnel: exact-dedup keep-first -> quality gate -> eval decontamination, with surviving doc/token counts after each successive stage — the pipeline's attrition dashboard",
      (s, dir) => {
        // The report every curated-corpus release publishes (what
        // fraction survived dedup? what did decontamination cost per
        // source?). Each filter is the cheap inline form of a
        // full-strength sibling op (dd02 exact dedup, tx02 quality
        // metrics, tx08 eval-shingle decontamination); the funnel is
        // their successive AND, aggregated per source. Scale shape:
        // one corpus scan builds (hash, tokens, metrics); keep-first
        // is a content-hash min aggregation (map-side combining, the
        // dd02 shape); the contaminated-doc set comes from the
        // broadcast eval-shingle probe (KB-sized by construction) and
        // arrives as a LEFT join flag; the funnel itself is one
        // per-source aggregate. No window anywhere.
        val k = 4
        val base = docs(s, dir).filter(col("doc_id") >= 20)
        val toks = TextOps.tokens(col("text"))
        val c = base.select(col("doc_id"), col("source"),
          md5(trim(col("text"))).as("ch"),
          size(toks).cast("long").as("n_tok"),
          size(array_distinct(toks)).cast("long").as("n_dist"))
        val kf = c.groupBy(col("ch")).agg(min(col("doc_id")).as("kf"))
        val ev = TextOps.wordShingleRows(
            docs(s, dir).filter(col("doc_id") < 20), "doc_id", "text", k)
          .select(col("_el")).distinct()
        val contam = TextOps.wordShingleRows(base, "doc_id", "text", k)
          .join(broadcast(ev), "_el")
          .select(col("doc_id")).distinct()
          .withColumn("_c", lit(1))
        val flags = c.join(kf, "ch")
          .join(contam, Seq("doc_id"), "left")
          .withColumn("f_dedup", col("doc_id") === col("kf"))
          .withColumn("f_quality",
            col("n_tok") >= 20 && col("n_tok") <= 1000 &&
              col("n_dist") * 10 >= col("n_tok") * 3)
          .withColumn("f_decontam", col("_c").isNull)
        val keptAll = col("f_dedup") && col("f_quality") && col("f_decontam")
        flags.groupBy(col("source")).agg(
            count(lit(1)).as("n_total"),
            sum(col("f_dedup").cast("long")).as("n_after_dedup"),
            sum((col("f_dedup") && col("f_quality")).cast("long"))
              .as("n_after_quality"),
            sum(keptAll.cast("long")).as("n_kept"),
            sum(when(keptAll, col("n_tok")).otherwise(0L)).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, source, trim(text) AS tx,
             |    regexp_split_to_array(trim(text), '\\s+') AS tok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source, md5(tx) AS ch,
             |    CAST(len(tok) AS BIGINT) AS n_tok,
             |    CAST(len(list_distinct(tok)) AS BIGINT) AS n_dist
             |  FROM t WHERE doc_id >= 20),
             |kf AS (SELECT ch, min(doc_id) AS kf FROM c GROUP BY ch),
             |sh AS (${TextOps.wordShingleSql(4)}),
             |ev AS (SELECT DISTINCT el FROM sh WHERE doc_id < 20),
             |contam AS (
             |  SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (el)
             |  WHERE s.doc_id >= 20),
             |f AS (
             |  SELECT c.source, c.n_tok,
             |    (c.doc_id = kf.kf) AS f_dedup,
             |    (c.n_tok BETWEEN 20 AND 1000 AND c.n_dist * 10 >= c.n_tok * 3)
             |      AS f_quality,
             |    (contam.doc_id IS NULL) AS f_decontam
             |  FROM c JOIN kf USING (ch)
             |  LEFT JOIN contam ON contam.doc_id = c.doc_id)
             |SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_total,
             |  CAST(sum(CASE WHEN f_dedup THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_after_dedup,
             |  CAST(sum(CASE WHEN f_dedup AND f_quality THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_after_quality,
             |  CAST(sum(CASE WHEN f_dedup AND f_quality AND f_decontam
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN f_dedup AND f_quality AND f_decontam
             |    THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
             |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    CatalogQuery(
      "dp11_length_aware_packing",
      "Length-aware sequence packing (next-fit-decreasing): whole docs, LONGEST FIRST, greedily fill 512-token bins per hash bucket; one manifest row per (bucket, seq, doc) with its in-sequence offset emitted in the same pass",
      (s, dir) => {
        // dp05 packs in ARRIVAL order — simple, but a long doc arriving
        // after small ones strands capacity. The length-aware recipe
        // (the decreasing-first-fit family behind padding-efficient
        // trainer packing, Krell et al. 2021) sorts each bucket's docs
        // LONGEST FIRST before the greedy fill: big items place while
        // bins are empty, the small-doc tail caulks the gaps, and
        // measured padding drops vs dp05 on any long-tailed length
        // distribution. The fill itself is genuinely sequential (each
        // placement depends on the running bin fill — no window/cumsum
        // closed form), so: ONE shuffle co-locates each bucket
        // (doc_id % 8; a cluster raises bucket count with cores), the
        // in-partition sort orders by (n_tok DESC, doc_id), and
        // mapPartitions runs the O(1)-state shelf loop, resetting at
        // bucket boundaries. Unlike dp05 (bin ids only), the output IS
        // the trainer manifest — docs are whole, so one row per
        // (bucket, seq, doc) with its offset is dp09's transpose
        // without the explode. Oversize docs truncate to capacity and
        // flag; determinism is total (pure function of (doc_id,
        // n_tok), no RNG, any cluster size, ties broken by doc_id).
        import s.implicits._
        val cap = 512L
        val t = docs(s, dir).select(
            col("doc_id"), (col("doc_id") % 8).as("bucket"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
          .as[(Long, Long, Long)]
        t.repartition(col("bucket"))
          .sortWithinPartitions(col("bucket"), col("n_tok").desc, col("doc_id"))
          .mapPartitions { it =>
            var curBucket = Long.MinValue
            var seq = 0L
            var nextFree = 0L
            it.map { case (docId, bucket, nTok) =>
              val eff = math.min(nTok, cap)
              if (bucket != curBucket) {
                curBucket = bucket; seq = 0L; nextFree = 0L
              } else if (nextFree + eff > cap) {
                seq += 1; nextFree = 0L
              }
              val off = nextFree
              nextFree = off + eff
              (docId, bucket, nTok, eff, seq, off,
                if (nTok > cap) 1L else 0L)
            }
          }
          .toDF("doc_id", "bucket", "n_tok", "eff_tok", "seq",
            "off_in_seq", "truncated")
          .orderBy(col("doc_id"))
      },
      // The oracle replays the same greedy recurrence as a recursive
      // CTE over per-bucket row numbers in the SAME length-descending
      // order — pure integer state, so the sequential semantics
      // value-check exactly.
      Some("""WITH RECURSIVE t AS (
             |  SELECT doc_id, doc_id % 8 AS bucket,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
             |      AS BIGINT) AS n_tok,
             |    row_number() OVER (PARTITION BY doc_id % 8
             |      ORDER BY CAST(len(regexp_split_to_array(trim(text),
             |        '\s+')) AS BIGINT) DESC, doc_id) AS rn
             |  FROM documents),
             |g AS (
             |  SELECT bucket, rn, doc_id, n_tok,
             |    least(n_tok, 512) AS eff,
             |    CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS off
             |  FROM t WHERE rn = 1
             |  UNION ALL
             |  SELECT t.bucket, t.rn, t.doc_id, t.n_tok,
             |    least(t.n_tok, 512) AS eff,
             |    CASE WHEN g.off + g.eff + least(t.n_tok, 512) <= 512
             |      THEN g.seq ELSE g.seq + 1 END,
             |    CASE WHEN g.off + g.eff + least(t.n_tok, 512) <= 512
             |      THEN g.off + g.eff ELSE CAST(0 AS BIGINT) END
             |  FROM g JOIN t ON t.bucket = g.bucket AND t.rn = g.rn + 1)
             |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, n_tok,
             |  eff AS eff_tok, seq, off AS off_in_seq,
             |  CAST(CASE WHEN n_tok > 512 THEN 1 ELSE 0 END AS BIGINT)
             |    AS truncated
             |FROM g ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dp12_token_budget_plan",
      "Token-budget water-filling: plan a 60%-of-corpus token budget across sources at sqrt-temperature proportions, capping saturated sources at availability and redistributing their deficit (2 redistribution rounds)",
      (s, dir) => budgetPlan(s, dir).orderBy(col("source")),
      Some(s"""WITH $budgetPlanSqlCtes
             |SELECT source, avail AS n_tokens, target, budget,
             |  CAST(CASE WHEN sat2 THEN avail
             |    ELSE least(avail, alloc3) END AS BIGINT) AS planned_tokens,
             |  CAST(CASE WHEN sat2 THEN 1 ELSE 0 END AS BIGINT) AS saturated
             |FROM r3 ORDER BY source""".stripMargin)),

    CatalogQuery(
      "dp13_balanced_shards",
      "Skew-aware output-shard assignment: the heavy tail above a histogram-derived p90 token threshold snake-assigned by token rank so no shard collects two giants before every shard has one; the light mass hashed doc_id % 8 — per-doc shard manifest for balanced training-shard writers",
      (s, dir) => {
        // dp05/dp11 pack docs into SEQUENCES; this balances the level
        // above — which output SHARD (file/worker) each doc lands in,
        // the thing that decides whether shard 3's writer finishes an
        // hour after the rest. Pure hashing balances doc COUNTS but a
        // token giant still skews byte totals, so: the heavy tail gets
        // snake (boustrophedon) assignment over its token rank —
        // rank 1..S left-to-right, S+1..2S right-to-left, so the
        // biggest S docs spread one per shard and pairs of rows
        // counterbalance — and the light mass hashes. The global rank
        // windows ONLY the heavy subset, and the threshold is DERIVED,
        // not assumed (tx20's histogram-cumulative machinery): thr is
        // the smallest token count whose >=-cohort is at most 10% of
        // the corpus, so the ranked set is <= N/10 BY CONSTRUCTION on
        // any distribution — a uniform corpus (where a literal cut
        // would rank everything) yields no qualifying value, no thr,
        // and every doc takes the windowless hashed path. The cumsum
        // window runs over the token-count HISTOGRAM (cardinality =
        // distinct lengths, not docs), and the derivation executes as
        // its own bounded SINGLE-ROW job (the tx ratio-totals
        // precedent) rather than a 1-row cross join — referencing a
        // cross-joined thr from both union branches would recompute
        // the whole histogram subtree per branch. The (doc_id, n_tok)
        // frame is localCheckpoint'd (dd03's signature-frame rule:
        // two longs per doc, referenced by the threshold job AND both
        // union branches) so the text tokenizes exactly ONCE — without
        // it the 500k headroom run paid three full tokenize scans
        // (9.4 s vs ~3 s, SCALING.md round 14). Pure-integer
        // arithmetic throughout so the DuckDB oracle is exact.
        val nShards = 8L
        val t = docs(s, dir).select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
          .localCheckpoint()
        val n = t.agg(count(lit(1)).as("_n"))
        val hist = t.groupBy(col("n_tok")).agg(count(lit(1)).as("_c"))
        val cum = hist.withColumn("_cum",
          sum(col("_c")).over(Window.orderBy(col("n_tok").desc)))
        val thrRow = cum.crossJoin(n).filter(col("_cum") * 10 <= col("_n"))
          .agg(min(col("n_tok")).as("_thr")).head()
        val thrOpt = if (thrRow.isNullAt(0)) None else Some(thrRow.getLong(0))
        val w = Window.orderBy(col("n_tok").desc, col("doc_id"))
        val heavyAssigned = thrOpt.map { thr =>
          t.filter(col("n_tok") >= thr)
            .withColumn("r", row_number().over(w).cast("long") - 1)
            .withColumn("k", col("r") % (2 * nShards))
            .select(col("doc_id"), col("n_tok"), lit(1L).as("heavy"),
              when(col("k") < nShards, col("k"))
                .otherwise(lit(2 * nShards - 1) - col("k")).as("shard"))
        }
        val lightAssigned = thrOpt.map(thr => t.filter(col("n_tok") < thr))
          .getOrElse(t)
          .select(col("doc_id"), col("n_tok"), lit(0L).as("heavy"),
            pmod(col("doc_id"), lit(nShards)).as("shard"))
        heavyAssigned match {
          case Some(h) => h.unionByName(lightAssigned).orderBy(col("doc_id"))
          case None => lightAssigned.orderBy(col("doc_id"))
        }
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |n AS (SELECT count(*) AS n FROM t),
             |h AS (SELECT n_tok, count(*) AS c FROM t GROUP BY n_tok),
             |cum AS (SELECT n_tok, sum(c) OVER (ORDER BY n_tok DESC) AS cum
             |  FROM h),
             |thr AS (SELECT min(n_tok) AS thr FROM cum, n
             |  WHERE cum * 10 <= n.n),
             |hv AS (
             |  SELECT doc_id, n_tok,
             |    CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id) AS BIGINT) - 1 AS r
             |  FROM t, thr WHERE thr.thr IS NOT NULL AND t.n_tok >= thr.thr),
             |ha AS (
             |  SELECT doc_id, n_tok, 1 AS heavy,
             |    CASE WHEN r % 16 < 8 THEN r % 16 ELSE 15 - r % 16 END AS shard
             |  FROM hv),
             |la AS (
             |  SELECT doc_id, n_tok, 0 AS heavy, doc_id % 8 AS shard
             |  FROM t, thr WHERE thr.thr IS NULL OR t.n_tok < thr.thr)
             |SELECT doc_id, n_tok, CAST(heavy AS BIGINT) AS heavy,
             |  CAST(shard AS BIGINT) AS shard
             |FROM (SELECT * FROM ha UNION ALL SELECT * FROM la)
             |ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dp14_token_cap_admission",
      "Per-source token-budget PREFIX admission (BudgetStream.decide, zero prior consumption): docs admitted in id order until the source's budget is exhausted, every later doc of that source rejected — the batch twin of the streaming enforcement of dp12's plan",
      (s, dir) => {
        // The enforcement half of dp12's planning half, value-checked
        // on its batch form: per-source cumulative tokens in doc_id
        // order (window partitioned by source — in the streaming form
        // this window is additionally bounded by the batch), admit iff
        // the cumsum fits the budget. Prefix semantics on purpose: the
        // cut is a clean per-source id watermark, so the admission is
        // resumable and replay-reasonable; a source absent from the
        // budget plan admits nothing. BudgetStreamSpec drives the
        // SAME decide() across batches with storage-backed consumption.
        import s.implicits._
        val d = docs(s, dir)
        val budgets = d.select(col("source")).distinct()
          .select(col("source"), lit(1500L).as("budget_tokens"))
        val zero = Seq.empty[(String, Long)].toDF("source", "consumed")
        graft.streaming.BudgetStream.decide(budgets, zero,
            d.select(col("doc_id"), col("source"), col("text")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source, n_tok,
             |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t)
             |SELECT doc_id, source, n_tok,
             |  CAST(CASE WHEN cum <= 1500 THEN 1 ELSE 0 END AS BIGINT) AS admitted
             |FROM c ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dp15_bpe_pack",
      "Sequence packing on REAL tokenizer counts: dp01's closed-form concat-then-chunk keyed on tx25's BPE token count instead of the whitespace proxy — the packing manifest a pipeline actually ships once a tokenizer exists",
      (s, dir) => {
        // Every packing/budget operator up to here used whitespace
        // token counts as the stand-in; this is the production
        // composition — tx25's merge-table application supplies n_tok
        // (word markers excluded), dp01's bucketed cumsum supplies the
        // chunk spans. Same scale shape as both parents: a per-row
        // codegen'd string chain feeding a per-bucket (never global)
        // window. Chunks differ from dp01 exactly where BPE compresses
        // (merged pairs shrink a doc's footprint), which is the point:
        // chunk counts from proxy token counts misprice every batch.
        graft.functions.TextNorm.register(s)
        val b = 256L
        val body = TextOps.bpeBody(col("text"))
        val t = docs(s, dir)
          .select(col("doc_id"), body.as("_body"),
            TextOps.bpeEncode(body).as("_enc"))
          .select(col("doc_id"), (col("doc_id") % 8).as("bucket"),
            (length(col("_enc"))
              - length(replace(col("_enc"), lit("|"), lit(""))) - 1
              - (length(col("_body"))
                 - length(replace(col("_body"), lit("#"), lit("")))))
              .cast("long").as("n_tok"))
        val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val off = (sum(col("n_tok")).over(w) - col("n_tok")).as("off")
        t.select(col("doc_id"), col("bucket"), col("n_tok"), off)
          .select(col("doc_id"), col("bucket"), col("n_tok"), col("off"),
            expr(s"off div $b").as("first_chunk"),
            expr(s"(off + n_tok - 1) div $b").as("last_chunk"),
            expr(s"(off + n_tok - 1) div $b - off div $b + 1").as("n_seqs"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH b0 AS (
             |  SELECT doc_id, ${TextOps.bpeBodySql} AS body
             |  FROM documents),
             |e AS (SELECT doc_id, body,
             |    ${TextOps.bpeEncodeSql("body")} AS enc
             |  FROM b0),
             |t AS (
             |  SELECT doc_id, doc_id % 8 AS bucket,
             |    CAST(length(enc) - length(replace(enc, '|', '')) - 1
             |      - (length(body) - length(replace(body, '#', '')))
             |      AS BIGINT) AS n_tok
             |  FROM e),
             |o AS (
             |  SELECT doc_id, bucket, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
             |  FROM t)
             |SELECT doc_id, bucket, n_tok, off,
             |  CAST(off // 256 AS BIGINT) AS first_chunk,
             |  CAST((off + n_tok - 1) // 256 AS BIGINT) AS last_chunk,
             |  CAST((off + n_tok - 1) // 256 - off // 256 + 1 AS BIGINT) AS n_seqs
             |FROM o ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dp16_repack_invalidation",
      "Incremental-repack invalidation report: after retracting documents (takedown/dedup set doc_id % 17 = 3), which of dp01's packed 256-token chunks survive byte-identical — per bucket the first dirty chunk index and the reusable prefix, from the concat-packing PREFIX property (chunks strictly before the first retracted doc's offset are untouched)",
      (s, dir) => {
        // The cache-invalidation question every incremental pipeline
        // asks before re-tokenizing the world: a retraction shifts the
        // concat stream only FROM the retracted doc's offset onward,
        // so within a bucket every chunk below floor(min_retracted_off
        // / B) is byte-identical in the repack and can be served from
        // cache. One bucket-keyed cumsum window (dp01's) + one
        // map-combined per-bucket aggregate; output = |buckets| rows
        // at any corpus size. first_dirty_chunk is NULL (and the whole
        // v2 chunk range reusable) in a bucket with no retraction.
        val b = 256L
        val t = docs(s, dir).select(
          col("doc_id"),
          (col("doc_id") % 8).as("bucket"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
          (col("doc_id") % 17 === 3).as("del"))
        val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs_v1"),
            sum(when(!col("del"), 1L).otherwise(0L)).as("n_docs_v2"),
            sum(col("n_tok")).as("tokens_v1"),
            sum(when(!col("del"), col("n_tok")).otherwise(0L))
              .as("tokens_v2"),
            min(when(col("del"), col("off"))).as("del_off"))
          .select(col("bucket"), col("n_docs_v1"), col("n_docs_v2"),
            col("tokens_v1"), col("tokens_v2"),
            expr(s"(tokens_v1 + ${b - 1}) div $b").as("n_chunks_v1"),
            expr(s"(tokens_v2 + ${b - 1}) div $b").as("n_chunks_v2"),
            expr(s"del_off div $b").as("first_dirty_chunk"))
          .withColumn("n_reusable",
            coalesce(col("first_dirty_chunk"), col("n_chunks_v2")))
          .orderBy(col("bucket"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS bucket,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
             |      AS BIGINT) AS n_tok,
             |    doc_id % 17 = 3 AS del
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, bucket, n_tok, del,
             |    CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
             |  FROM t),
             |a AS (
             |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs_v1,
             |    CAST(sum(CASE WHEN NOT del THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_docs_v2,
             |    CAST(sum(n_tok) AS BIGINT) AS tokens_v1,
             |    CAST(sum(CASE WHEN NOT del THEN n_tok ELSE 0 END) AS BIGINT)
             |      AS tokens_v2,
             |    min(CASE WHEN del THEN off END) AS del_off
             |  FROM o GROUP BY bucket)
             |SELECT bucket, n_docs_v1, n_docs_v2, tokens_v1, tokens_v2,
             |  CAST((tokens_v1 + 255) // 256 AS BIGINT) AS n_chunks_v1,
             |  CAST((tokens_v2 + 255) // 256 AS BIGINT) AS n_chunks_v2,
             |  CAST(del_off // 256 AS BIGINT) AS first_dirty_chunk,
             |  CAST(coalesce(del_off // 256, (tokens_v2 + 255) // 256)
             |    AS BIGINT) AS n_reusable
             |FROM a ORDER BY bucket""".stripMargin)),

    CatalogQuery(
      "dp17_plan_reconciliation",
      "Plan-vs-actuals reconciliation: dp12's water-filled budgets fed through dp14's prefix admission, reporting per source the planned tokens, admitted tokens/docs, the id watermark the cut landed on, and e6 utilization — the closing report of the plan -> enforce -> reconcile loop",
      (s, dir) => {
        // The loop a budgeted ingestion actually runs: dp12 PLANS the
        // per-source token budgets, BudgetStream/dp14 ENFORCES them as
        // prefix admission, and this op answers the operator's
        // question afterwards — did each source fill its plan, and
        // where did the cut land? Utilization < 1e6 with admitted
        // docs < total docs is normal (the overflowing doc straddles
        // the budget; prefix semantics leave the remainder unspent);
        // utilization = 1e6 means the budget drained exactly. Costs:
        // dp12's plan is |sources| rows (broadcast), the admission is
        // dp14's one per-source cumsum window, the reconcile is one
        // map-combined groupBy — nothing new touches the corpus twice.
        import s.implicits._
        // checkpointed (r18): plan is read twice (the admission input
        // + the final reconcile join) and each lazy reference re-ran
        // the whole water-filling chain — its 3 unrolled rounds each
        // re-aggregate the corpus (JoinAudit: 20 parquet scans in the
        // final job, only 6 exchanges reused). The frame is |sources|
        // rows — the dd03 small-frame checkpoint rule.
        val plan = budgetPlan(s, dir)
          .select(col("source"), col("planned_tokens"))
          .localCheckpoint(true)
        val zero = Seq.empty[(String, Long)].toDF("source", "consumed")
        val dec = graft.streaming.BudgetStream.decide(
          plan.select(col("source"),
            col("planned_tokens").as("budget_tokens")),
          zero, docs(s, dir).select(col("doc_id"), col("source"), col("text")))
        val agg = dec.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("admitted")).as("n_admitted"),
            sum(when(col("admitted") === 1, col("n_tok")).otherwise(0L))
              .as("admitted_tokens"),
            max(when(col("admitted") === 1, col("doc_id")))
              .as("watermark_id"))
        plan.join(agg, Seq("source"))
          .withColumn("utilization_e6",
            expr("admitted_tokens * 1000000 div nullif(planned_tokens, 0)"))
          .select(col("source"), col("planned_tokens"), col("n_docs"),
            col("n_admitted"), col("admitted_tokens"), col("watermark_id"),
            col("utilization_e6"))
          .orderBy(col("source"))
      },
      Some(s"""WITH $budgetPlanSqlCtes,
             |plan AS (
             |  SELECT source,
             |    CAST(CASE WHEN sat2 THEN avail
             |      ELSE least(avail, alloc3) END AS BIGINT)
             |      AS planned_tokens
             |  FROM r3),
             |dt AS (SELECT doc_id, source,
             |    CAST(len(regexp_split_to_array(trim(text), '\\s+'))
             |      AS BIGINT) AS n_tok
             |  FROM documents),
             |cum AS (
             |  SELECT doc_id, source, n_tok,
             |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
             |  FROM dt),
             |dec AS (
             |  SELECT cum.doc_id, cum.source, cum.n_tok,
             |    CASE WHEN cum.c <= p.planned_tokens THEN 1 ELSE 0 END
             |      AS admitted
             |  FROM cum JOIN plan p ON p.source = cum.source),
             |agg AS (
             |  SELECT source, count(*) AS n_docs,
             |    sum(admitted) AS n_admitted,
             |    sum(CASE WHEN admitted = 1 THEN n_tok ELSE 0 END)
             |      AS admitted_tokens,
             |    max(CASE WHEN admitted = 1 THEN doc_id END)
             |      AS watermark_id
             |  FROM dec GROUP BY source)
             |SELECT p.source, p.planned_tokens,
             |  CAST(a.n_docs AS BIGINT) AS n_docs,
             |  CAST(a.n_admitted AS BIGINT) AS n_admitted,
             |  CAST(a.admitted_tokens AS BIGINT) AS admitted_tokens,
             |  CAST(a.watermark_id AS BIGINT) AS watermark_id,
             |  CAST(a.admitted_tokens * 1000000
             |    // nullif(p.planned_tokens, 0) AS BIGINT) AS utilization_e6
             |FROM plan p JOIN agg a ON a.source = p.source
             |ORDER BY p.source""".stripMargin)),
  )
}

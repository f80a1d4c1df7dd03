package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.DocsStream

/** Streaming near-dup admission: state accrual across micro-batches,
  * single-pass intra-batch semantics, and replay exclusion.
  *
  * Jaccard geometry of the planted texts (3-token shingles over 50
  * unique tokens, threshold 8/10): one isolated token change = 45/51 =
  * 0.88 (rejected as dup), two = 42/54 = 0.78 (admitted) — so a
  * doc can match a REJECTED doc's text while staying below threshold
  * against what that doc itself matched.
  */
class DocsStreamSpec extends SparkSpec {

  private val toks = (1 to 50).map(i => s"w$i")
  private def text(changes: (Int, String)*) =
    changes.foldLeft(toks) { case (t, (pos, w)) => t.updated(pos - 1, w) }
      .mkString(" ")
  private val aText = text()
  private val bText = text(25 -> "B25")              // J(A,B) = 0.88
  private val cText = text(25 -> "B25", 10 -> "C10") // J(B,C) = 0.88, J(A,C) = 0.78
  private val fText = (1 to 50).map(i => s"f$i").mkString(" ")
  private val gText = (1 to 50).map(i => s"g$i").mkString(" ")

  test("admission stream: history probe, intra-batch keep-min, state accrual, rejected docs stay out of state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("docs-stream").toString
    val corpus = Seq((0L, aText), (1L, "unrelated short text")).toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = DocsStream.nearDupAdmission(spark,
      ms.toDF().toDF("doc_id", "text"), corpus,
      s"$base/state", s"$base/decisions", s"$base/ck")
    try {
      // batch 0: B ~ corpus A (reject); F fresh (admit); F again
      // (intra-batch reject, smaller id wins)
      ms.addData((10L, bText), (11L, fText), (12L, fText))
      q.processAllAvailable()
      // batch 1: F again (matches doc 11 accepted in batch 0 — state
      // accrual); C ~ rejected B but NOT ~ corpus A (admit — rejected
      // docs must not pollute the standing state); G fresh
      ms.addData((20L, fText), (21L, cText), (22L, gText))
      q.processAllAvailable()
    } finally q.stop()

    val dec = spark.read.parquet(s"$base/decisions")
      .select("doc_id", "status", "dup_of").collect()
      .map(r => (r.getLong(0),
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(dec == Map(
      10L -> ("near_dup_history", 0L),
      11L -> ("new", -1L),
      12L -> ("near_dup_batch", 11L),
      20L -> ("near_dup_history", 11L),
      21L -> ("new", -1L),
      22L -> ("new", -1L)), s"got $dec")
    // the standing state holds exactly the admitted docs
    val state = spark.read.parquet(s"$base/state")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(state == Seq(11L, 21L, 22L))
  }

  test("intra-batch chain A~B~C rejects BOTH B and C (conservative CC-component semantics, as documented)") {
    // J(A,B) = J(B,C) = 0.88 >= 0.8, J(A,C) = 0.78 < 0.8: B bridges A
    // and C into one near-dup component. Like dd10's keep-min over the
    // component, only A survives — C is rejected via its match to the
    // (itself rejected) B, NOT admitted as a sequential index insert
    // would. dup_of records the direct match (B), not the component rep.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("docs-chain").toString
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = DocsStream.nearDupAdmission(spark,
      ms.toDF().toDF("doc_id", "text"), emptyCorpus,
      s"$base/state", s"$base/decisions", s"$base/ck")
    try {
      ms.addData((1L, aText), (2L, bText), (3L, cText))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$base/decisions")
      .select("doc_id", "status", "dup_of").collect()
      .map(r => (r.getLong(0),
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(dec == Map(
      1L -> ("new", -1L),
      2L -> ("near_dup_batch", 1L),
      3L -> ("near_dup_batch", 2L)), s"got $dec")
  }

  test("intra-batch chain A~B~C under intraSequential admits C (insert-then-probe semantics)") {
    // same planted geometry as the conservative chain test; the
    // sequential flavor rejects B (dup of admitted A) but ADMITS C —
    // B was never inserted, so C probes a clean index (J(A,C)=0.78 is
    // below threshold). The two flavors' documented divergence, pinned
    // from both sides.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("docs-seq").toString
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = DocsStream.nearDupAdmission(spark,
      ms.toDF().toDF("doc_id", "text"), emptyCorpus,
      s"$base/state", s"$base/decisions", s"$base/ck",
      intraSequential = true)
    try {
      ms.addData((1L, aText), (2L, bText), (3L, cText))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$base/decisions")
      .select("doc_id", "status", "dup_of").collect()
      .map(r => (r.getLong(0),
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(dec == Map(
      1L -> ("new", -1L),
      2L -> ("near_dup_batch", 1L),
      3L -> ("new", -1L)), s"got $dec")
    // the standing state holds BOTH admitted docs — later batches
    // dedupe against C too
    val state = spark.read.parquet(s"$base/state")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(state == Seq(1L, 3L))
  }

  test("acceptedState excludes the current batch id (replay safety)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("docs-state").toString
    Seq((1L, "one")).toDF("doc_id", "text")
      .write.parquet(s"$base/state/batch_id=0")
    Seq((2L, "two")).toDF("doc_id", "text")
      .write.parquet(s"$base/state/batch_id=1")
    val got = DocsStream.acceptedState(spark, s"$base/state", excludeBatchId = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
    // missing dir -> empty frame, not a throw
    assert(DocsStream.acceptedState(spark, s"$base/nope", 0).count() == 0)
  }

  // ------------- suffix-dedup (ExactSubstr) admission -------------

  test("substr admission, single batch: standing probe equals dd25 column-for-column") {
    // the §2.9 twin convention: same history/batch split as dd25
    // (doc_id % 5), ONE micro-batch — n_known_hist must equal dd25's
    // n_known on every doc, and keep must agree wherever intra-batch
    // accounting adds nothing (n_known_batch == 0; the batch-carrier
    // rule is the admission flavor's DOCUMENTED divergence, pinned in
    // the planted test below)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("substr-stream").toString
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    val hist = d.filter(pmod(col("doc_id"), lit(5)) =!= 4)
    val batchRows = d.filter(pmod(col("doc_id"), lit(5)) === 4)
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    val q = DocsStream.substrAdmission(spark,
      ms.toDF().toDF("doc_id", "text"), graft.ext.SubstrIndex.keySet(hist),
      s"$base/state", s"$base/decisions", s"$base/ck")
    try { ms.addData(batchRows); q.processAllAvailable() } finally q.stop()
    val got = spark.read.parquet(s"$base/decisions").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6))).toMap // n_tok, n_win, hist, batch, keep
    val want = run("dd25_incremental_substring").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5))).toMap // n_tok, n_win, n_known, keep
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nt, nw, kh, kb, keep)) =>
      val (wnt, wnw, wkn, wkeep) = want(id)
      assert((nt, nw, kh) == (wnt, wnw, wkn),
        s"doc $id: stream (n_tok=$nt, n_win=$nw, n_known_hist=$kh) != " +
          s"dd25 ($wnt, $wnw, $wkn)")
      if (kb == 0) assert(keep == wkeep,
        s"doc $id: keep=$keep != dd25 $wkeep with no batch-known windows")
    }
    assert(got.values.exists(_._3 > 0), "no hist-known doc — parity vacuous")
  }

  test("substr admission: intra-batch first-carrier, rejected keys stay out of state, state accrual, set property") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("substr-planted").toString
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val aText = words("a", 50).mkString(" ")          // corpus doc
    val fText = words("f", 50).mkString(" ")          // fresh
    val mText = (words("a", 40) ++ words("r", 10)).mkString(" ") // 77% known
    val rText = words("r", 10).mkString(" ")          // m's fresh tail
    val corpus = Seq((0L, aText)).toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = DocsStream.substrAdmission(spark,
      ms.toDF().toDF("doc_id", "text"), graft.ext.SubstrIndex.keySet(corpus),
      s"$base/state", s"$base/decisions", s"$base/ck")
    try {
      // batch 0: 10 = corpus copy (reject, all hist-known); 11 = fresh
      // (keep); 12 = SAME text as 11 — dd25 alone would admit both
      // (batch overlap un-counted); the admission's first-carrier rule
      // must reject it as batch-known; 13 = 77% corpus text + a fresh
      // tail (reject — and its fresh windows must NOT enter state)
      ms.addData((10L, aText), (11L, fText), (12L, fText), (13L, mText))
      q.processAllAvailable()
      // batch 1: 20 = 11's text (state accrual -> all hist-known);
      // 21 = exactly 13's fresh tail — 13 was REJECTED, so these
      // windows are unseen and 21 must keep
      ms.addData((20L, fText), (21L, rText))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$base/decisions").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(6)))
      .toMap // (n_known_hist, n_known_batch, keep)
    assert(dec == Map(
      10L -> ((43L, 0L, 0L)),
      11L -> ((0L, 0L, 1L)),
      12L -> ((0L, 43L, 0L)),
      13L -> ((33L, 0L, 0L)),
      20L -> ((43L, 0L, 0L)),
      21L -> ((0L, 0L, 1L))), s"got $dec")
    // state = exactly the accepted docs' keys: 11's 43 f-windows +
    // 21's 3 r-windows, all distinct, none already in the corpus
    val state = spark.read.parquet(s"$base/state").select("h1", "h2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(state.length == 46 && state.distinct.length == 46,
      s"state not a 46-key set: ${state.length}/${state.distinct.length}")
    val corpusKeys = graft.ext.SubstrIndex.keySet(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(state.forall(k => !corpusKeys.contains(k)),
      "an already-standing key was re-appended")
  }

  test("substr admission over a persisted SubstrIndex table (the deployment path) decides identically") {
    // initialKeys = spark.table(indexTable): the standing set reads as
    // the bucketed key scan instead of re-folding the corpus per batch
    // - same decisions, proven on the planted geometry's first batch
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("substr-idxstream").toString
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val aText = words("a", 50).mkString(" ")
    val fText = words("f", 50).mkString(" ")
    val corpus = Seq((0L, aText)).toDF("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS substr_idx_stream")
    // DROP alone leaves the physical dir behind when a previous JVM
    // created it; the create would then refuse LOCATION_ALREADY_EXISTS
    val loc = new java.io.File("spark-warehouse/substr_idx_stream")
    if (loc.exists) { loc.listFiles.foreach(_.delete()); loc.delete() }
    graft.ext.SubstrIndex.build(corpus, "substr_idx_stream")
    val ms = MemoryStream[(Long, String)]
    val q = DocsStream.substrAdmission(spark,
      ms.toDF().toDF("doc_id", "text"), spark.table("substr_idx_stream"),
      s"$base/state", s"$base/decisions", s"$base/ck")
    try {
      ms.addData((10L, aText), (11L, fText), (12L, fText))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$base/decisions").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(6)))
      .toMap
    assert(dec == Map(
      10L -> ((43L, 0L, 0L)),
      11L -> ((0L, 0L, 1L)),
      12L -> ((0L, 43L, 0L))), s"table-backed admission diverged: $dec")
  }

  test("keyState excludes the current batch id (replay safety)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("substr-state").toString
    Seq((1L, 10L)).toDF("h1", "h2")
      .write.parquet(s"$base/state/batch_id=0")
    Seq((2L, 20L)).toDF("h1", "h2")
      .write.parquet(s"$base/state/batch_id=1")
    val got = DocsStream.keyState(spark, s"$base/state", excludeBatchId = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L)))
    assert(DocsStream.keyState(spark, s"$base/nope", 0).count() == 0)
  }
}

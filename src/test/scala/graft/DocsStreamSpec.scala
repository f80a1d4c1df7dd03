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

  test("table-backed near-dup admission (DedupIndex + corpus table) decides identically; promotion preserves the standing side") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("neardup-table").toString
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    Seq("dedup_idx_stream_t", "dedup_corpus_stream_t").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists) rm(loc)
    }
    val corpus = Seq((0L, aText)).toDF("doc_id", "text")
    graft.ext.DedupIndex.build(corpus, "dedup_idx_stream_t")
    corpus.write.format("parquet").saveAsTable("dedup_corpus_stream_t")

    def runStream(useTable: Boolean, sub: String): Map[Long, (String, Any)] = {
      val ms = MemoryStream[(Long, String)]
      val q =
        if (useTable) DocsStream.nearDupAdmission(spark,
          ms.toDF().toDF("doc_id", "text"), "dedup_idx_stream_t",
          "dedup_corpus_stream_t", s"$base/$sub/state",
          s"$base/$sub/decisions", s"$base/$sub/ck", intraSequential = false)
        else DocsStream.nearDupAdmission(spark,
          ms.toDF().toDF("doc_id", "text"), corpus, s"$base/$sub/state",
          s"$base/$sub/decisions", s"$base/$sub/ck")
      try {
        // batch 0: 10 = near-dup of corpus A (J=0.88, reject);
        // 11 = fresh (keep)
        ms.addData((10L, bText), (11L, fText))
        q.processAllAvailable()
        // batch 1: 20 = exact copy of accepted 11 (reject via accrued
        // state); 21 = fresh (keep)
        ms.addData((20L, fText), (21L, gText))
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$base/$sub/decisions").collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2)): (String, Any))).toMap
    }
    val inQuery = runStream(useTable = false, "inq")
    val tabled = runStream(useTable = true, "tab")
    assert(inQuery == Map[Long, (String, Any)](
      10L -> (("near_dup_history", 0L)), 11L -> (("new", null)),
      20L -> (("near_dup_history", 11L)), 21L -> (("new", null))),
      s"in-query decisions off: $inQuery")
    assert(tabled == inQuery, s"table-backed diverged: $tabled")

    // promote batch 0 (newest is 1): 11 moves into index + corpus
    val idxBefore = spark.table("dedup_idx_stream_t").count()
    DocsStream.promoteNearDupState(spark, s"$base/tab/state",
      "dedup_idx_stream_t", "dedup_corpus_stream_t", uptoBatchId = 0)
    assert(new java.io.File(s"$base/tab/state").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq == Seq("batch_id=1"))
    assert(spark.table("dedup_corpus_stream_t").count() == 2L)
    val idxAfter = spark.table("dedup_idx_stream_t").count()
    assert(idxAfter > idxBefore, "promotion appended no bucket rows")
    // idempotent retry (crash between sinks re-run): nothing doubles
    DocsStream.promoteNearDupState(spark, s"$base/tab/state",
      "dedup_idx_stream_t", "dedup_corpus_stream_t", uptoBatchId = 0)
    assert(spark.table("dedup_idx_stream_t").count() == idxAfter &&
      spark.table("dedup_corpus_stream_t").count() == 2L,
      "retried promotion re-appended rows")

    // a fresh stream over the SAME state dir sees the identical
    // standing side: 30 matches promoted 11 (now table-side), 31
    // matches un-promoted 21 (still state-side)
    val ms2 = MemoryStream[(Long, String)]
    val q2 = DocsStream.nearDupAdmission(spark,
      ms2.toDF().toDF("doc_id", "text"), "dedup_idx_stream_t",
      "dedup_corpus_stream_t", s"$base/tab/state",
      s"$base/tab/decisions2", s"$base/tab/ck2", intraSequential = false)
    try { ms2.addData((30L, fText), (31L, gText)); q2.processAllAvailable() }
    finally q2.stop()
    val dec2 = spark.read.parquet(s"$base/tab/decisions2").collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)): (String, Any))).toMap
    assert(dec2 == Map[Long, (String, Any)](
      30L -> (("near_dup_history", 11L)), 31L -> (("near_dup_history", 21L))),
      s"post-promotion standing side diverged: $dec2")
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
    // (recursive: the pb= partition dirs nest one level down)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    val loc = new java.io.File("spark-warehouse/substr_idx_stream")
    if (loc.exists) rm(loc)
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

    // the TABLE-NAME overload (partition-pruned standing scan) must
    // decide identically and accrue the identical state
    val ms2 = MemoryStream[(Long, String)]
    val q2 = DocsStream.substrAdmission(spark,
      ms2.toDF().toDF("doc_id", "text"), "substr_idx_stream",
      s"$base/state2", s"$base/decisions2", s"$base/ck2")
    try {
      ms2.addData((10L, aText), (11L, fText), (12L, fText))
      q2.processAllAvailable()
    } finally q2.stop()
    val dec2 = spark.read.parquet(s"$base/decisions2").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(6)))
      .toMap
    assert(dec2 == dec, s"pruned table overload diverged: $dec2")
    def keysOf(dir: String) = spark.read.parquet(dir)
      .select("h1", "h2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keysOf(s"$base/state2") == keysOf(s"$base/state"),
      "pruned table overload accrued different state keys")
  }

  test("narrowStanding: the checkpointed frame is batch ∩ standing sized, decision-equivalent, duplicate-proof") {
    import spark.implicits._
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val aText = words("a", 50).mkString(" ")
    val zText = words("z", 50).mkString(" ") // standing-only: untouched by the batch
    val fText = words("f", 50).mkString(" ")
    val standing = graft.ext.SubstrIndex.keySet(
      Seq((0L, aText), (1L, zText)).toDF("doc_id", "text"))
    val batch = Seq((10L, aText), (11L, fText)).toDF("doc_id", "text")
    val bKeys = graft.ext.SubstrIndex.keySet(batch)
    // standing holds 86 keys (43 a- + 43 z-windows); the batch can
    // touch only the 43 a-keys — what the admission loop checkpoints
    // per batch must be that overlap, NOT the standing total
    assert(standing.count() == 86L)
    val nk = DocsStream.narrowStanding(standing, bKeys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nk.length == 43 && nk.distinct.length == 43,
      s"narrowed frame not the 43-key overlap set: ${nk.length}/${nk.distinct.length}")
    def dec(st: org.apache.spark.sql.DataFrame) =
      DocsStream.substrDecide(st, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val want = dec(standing)
    assert(want.nonEmpty && dec(DocsStream.narrowStanding(standing, bKeys)) == want,
      "narrowed standing changed decisions")
    // duplicate-proofing (probe AND narrowing): a standing frame
    // carrying every key twice must neither inflate known counts nor
    // leak duplicates into the checkpointed set
    assert(dec(standing.union(standing)) == want,
      "duplicate standing keys inflated the probe's known counts")
    val nkDup = DocsStream.narrowStanding(standing.union(standing), bKeys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nkDup.length == 43 && nkDup.distinct.length == 43,
      "duplicate standing keys leaked through narrowStanding")
  }

  test("promoteSubstrState folds accepted keys into the index table; standing union, decisions, and crash retry unchanged") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("substr-promote").toString
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val aText = words("a", 50).mkString(" ")
    val fText = words("f", 50).mkString(" ")
    val gText = words("g", 50).mkString(" ")
    val corpus = Seq((0L, aText)).toDF("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS substr_idx_promote")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    val loc = new java.io.File("spark-warehouse/substr_idx_promote")
    if (loc.exists) rm(loc)
    graft.ext.SubstrIndex.build(corpus, "substr_idx_promote")
    val ms = MemoryStream[(Long, String)]
    val q = DocsStream.substrAdmission(spark,
      ms.toDF().toDF("doc_id", "text"), spark.table("substr_idx_promote"),
      s"$base/state", s"$base/decisions", s"$base/ck")
    try {
      ms.addData((10L, fText)) // batch 0: fresh, kept -> 43 f-keys in state
      q.processAllAvailable()
      ms.addData((20L, gText)) // batch 1: fresh, kept -> 43 g-keys in state
      q.processAllAvailable()
    } finally q.stop()
    def standing() = spark.table("substr_idx_promote").select("h1", "h2")
      .union(DocsStream.keyState(spark, s"$base/state", excludeBatchId = 99))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def decide(batch: org.apache.spark.sql.DataFrame) =
      DocsStream.substrDecide(
        spark.table("substr_idx_promote").select(col("h1"), col("h2"))
          .union(DocsStream.keyState(spark, s"$base/state", 99)), batch)
        .collect().map(_.mkString("|")).toSet
    val probeBatch = Seq((30L, fText), (31L, gText),
      (32L, words("h", 50).mkString(" "))).toDF("doc_id", "text")
    val (standingBefore, decideBefore) = (standing(), decide(probeBatch))
    val tableBefore = spark.table("substr_idx_promote").count()
    // promote batch 0 only (batch 1 is the newest — replay contract)
    DocsStream.promoteSubstrState(spark, s"$base/state",
      "substr_idx_promote", uptoBatchId = 0)
    assert(new java.io.File(s"$base/state").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq == Seq("batch_id=1"))
    assert(spark.table("substr_idx_promote").count() == tableBefore + 43,
      "batch 0's 43 accepted keys did not land in the table")
    assert(standing() == standingBefore, "promotion changed the standing union")
    assert(decide(probeBatch) == decideBefore, "promotion changed decisions")
    // crash retry: append landed but delete didn't — keys on BOTH
    // sides must not inflate counts (duplicate-proof probe), and the
    // re-run appends nothing
    graft.ext.SubstrIndex.appendKeys(
      DocsStream.keyState(spark, s"$base/state", 99), "substr_idx_promote")
    assert(decide(probeBatch) == decideBefore,
      "keys on both table and state sides inflated the probe")
    val n1 = spark.table("substr_idx_promote").count()
    DocsStream.promoteSubstrState(spark, s"$base/state",
      "substr_idx_promote", uptoBatchId = 1)
    assert(spark.table("substr_idx_promote").count() == n1,
      "retried promotion re-appended standing keys")
    assert(new java.io.File(s"$base/state").listFiles
      .map(_.getName).count(_.startsWith("batch_id=")) == 0)
    assert(standing() == standingBefore && decide(probeBatch) == decideBefore)
  }

  test("state compaction folds committed batches into the base partition; standing view and replay exclusion unchanged") {
    import spark.implicits._
    import graft.streaming.StreamState
    val base = java.nio.file.Files.createTempDirectory("state-compact").toString
    Seq((1L, 10L), (2L, 20L)).toDF("h1", "h2")
      .write.parquet(s"$base/state/batch_id=0")
    Seq((3L, 30L)).toDF("h1", "h2").write.parquet(s"$base/state/batch_id=1")
    Seq((4L, 40L)).toDF("h1", "h2").write.parquet(s"$base/state/batch_id=2")
    def dirs() = new java.io.File(s"$base/state").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    def state(excl: Long) = DocsStream.keyState(spark, s"$base/state", excl)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = state(excl = 99)
    assert(all.size == 4)
    // fold batches 0 and 1 (committed history); 2 is the newest and
    // must keep its own id so a replay of it can still self-exclude
    StreamState.compact(spark, s"$base/state", uptoBatchId = 1)
    assert(dirs() == Set("batch_id=-1", "batch_id=2"), s"got ${dirs()}")
    assert(state(excl = 99) == all, "compaction changed the standing content")
    assert(state(excl = 2) == Set((1L, 10L), (2L, 20L), (3L, 30L)),
      "replay exclusion of the newest batch broke, or the base got excluded")
    // a later compaction folds the existing base together with batch 2
    StreamState.compact(spark, s"$base/state", uptoBatchId = 2)
    assert(dirs() == Set("batch_id=-1") && state(excl = 99) == all,
      s"re-compaction diverged: ${dirs()} / ${state(excl = 99)}")
    // no staging residue to confuse partition discovery
    assert(!new java.io.File(s"$base/state.__compact").exists)
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

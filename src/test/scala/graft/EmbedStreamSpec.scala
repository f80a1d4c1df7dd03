package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.EmbedIndex
import graft.streaming.EmbedStream

/** Streaming embedding near-dup admission: planted orthogonal-basis
  * geometry (exact copies cos = 1 ≥ 0.4, distinct basis vectors
  * cos = 0 < 0.4 — decisions are cosine-verified, so bucket
  * collisions between distinct vectors cannot flip them), in-query vs
  * table-backed parity, state accrual, intra-batch first-carrier, and
  * promotion into the persisted index. */
class EmbedStreamSpec extends SparkSpec {

  // unit basis vectors in the fixture's 64-dim space
  private def basis(i: Int): Seq[Double] =
    Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
  private val aVec = basis(0)
  private val fVec = basis(1)
  private val gVec = basis(2)

  test("embed admission: in-query and table-backed decide identically; promotion preserves the standing side") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("embed-adm").toString
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    spark.sql("DROP TABLE IF EXISTS embed_idx_stream_t")
    val loc = new java.io.File("spark-warehouse/embed_idx_stream_t")
    if (loc.exists) rm(loc)
    val corpus = EmbedIndex.normalized(
      Seq((0L, aVec)).toDF("vec_id", "embedding"))
    EmbedIndex.build(corpus, "embed_idx_stream_t")

    def runStream(useTable: Boolean, sub: String): Map[Long, (String, Any)] = {
      val ms = MemoryStream[(Long, Seq[Double])]
      val vecs = ms.toDF().toDF("vec_id", "embedding")
      val q =
        if (useTable) EmbedStream.admission(spark, vecs,
          "embed_idx_stream_t", s"$base/$sub/state",
          s"$base/$sub/decisions", s"$base/$sub/ck", intraSequential = false)
        else EmbedStream.admission(spark, vecs, corpus, s"$base/$sub/state",
          s"$base/$sub/decisions", s"$base/$sub/ck")
      try {
        // batch 0: 10 = copy of corpus vector 0 (reject); 11 = fresh
        // (keep); 12 = copy of 11 in the SAME batch (first-carrier:
        // exactly one of the two admits)
        ms.addData((10L, aVec), (11L, fVec), (12L, fVec))
        q.processAllAvailable()
        // batch 1: 20 = copy of accepted 11 (reject via accrued
        // state); 21 = fresh (keep)
        ms.addData((20L, fVec), (21L, gVec))
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
      12L -> (("near_dup_batch", 11L)),
      20L -> (("near_dup_history", 11L)), 21L -> (("new", null))),
      s"in-query decisions off: $inQuery")
    assert(tabled == inQuery, s"table-backed diverged: $tabled")

    // promote batch 0 (newest is 1): accepted 11 moves into the index
    val idxBefore = spark.table("embed_idx_stream_t").count()
    EmbedStream.promoteEmbedState(spark, s"$base/tab/state",
      "embed_idx_stream_t", uptoBatchId = 0)
    assert(new java.io.File(s"$base/tab/state").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq == Seq("batch_id=1"))
    val idxAfter = spark.table("embed_idx_stream_t").count()
    assert(idxAfter > idxBefore, "promotion appended no index rows")
    // idempotent retry (crash between append and delete re-run)
    EmbedStream.promoteEmbedState(spark, s"$base/tab/state",
      "embed_idx_stream_t", uptoBatchId = 0)
    assert(spark.table("embed_idx_stream_t").count() == idxAfter,
      "retried promotion re-appended rows")

    // a fresh stream over the SAME state dir sees the identical
    // standing side: 30 matches promoted 11 (now table-side), 31
    // matches un-promoted 21 (still state-side)
    val ms2 = MemoryStream[(Long, Seq[Double])]
    val q2 = EmbedStream.admission(spark,
      ms2.toDF().toDF("vec_id", "embedding"), "embed_idx_stream_t",
      s"$base/tab/state", s"$base/tab/decisions2", s"$base/tab/ck2",
      intraSequential = false)
    try { ms2.addData((30L, fVec), (31L, gVec)); q2.processAllAvailable() }
    finally q2.stop()
    val dec2 = spark.read.parquet(s"$base/tab/decisions2").collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)): (String, Any))).toMap
    assert(dec2 == Map[Long, (String, Any)](
      30L -> (("near_dup_history", 11L)), 31L -> (("near_dup_history", 21L))),
      s"post-promotion standing side diverged: $dec2")
  }
}

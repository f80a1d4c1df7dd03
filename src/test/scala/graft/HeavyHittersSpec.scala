package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.HeavyHittersStream
import graft.streaming.HeavyHittersStream.Summary

/** Misra-Gries heavy-hitter tracking: the MG invariants (est <= true
  * <= est + err, err*(k+1) <= n_seen, guaranteed survival above the
  * n/(k+1) frequency line), batch-order robustness, and replay-safe
  * state reads. */
class HeavyHittersSpec extends SparkSpec {

  /** items: (key, exact count) — expanded into individual rows. */
  private def runStream(batches: Seq[Seq[(Long, Int)]], k: Int)
      : (Summary, String) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("hh-stream").toString
    val ms = MemoryStream[Long]
    val q = HeavyHittersStream.heavyHitters(spark, ms.toDF().toDF("key"),
      "key", k, s"$base/state", s"$base/out", s"$base/ck")
    try {
      batches.foreach { b =>
        ms.addData(b.flatMap { case (key, n) => Seq.fill(n)(key) })
        q.processAllAvailable()
      }
    } finally q.stop()
    (HeavyHittersStream.readState(spark, s"$base/state", Long.MaxValue),
      base)
  }

  test("MG invariants hold over a 3-batch stream: bounds, error budget, guaranteed survivors") {
    // true totals: key 1 -> 40, key 2 -> 25, keys 10..29 -> 3 each
    // (n = 125); k = 4 so the guarantee line is n/(k+1) = 25: key 1
    // (40 > 25) MUST survive whatever the batching did
    val batches = Seq(
      Seq((1L, 20), (2L, 5)) ++ (10L to 19L).map((_, 2)),
      Seq((1L, 10), (2L, 10)) ++ (20L to 29L).map((_, 3)),
      Seq((1L, 10), (2L, 10)) ++ (10L to 19L).map((_, 1)))
    val truth = batches.flatten.groupBy(_._1)
      .map { case (key, vs) => key -> vs.map(_._2.toLong).sum }
    val n = truth.values.sum
    val (s, _) = runStream(batches, k = 4)
    assert(s.nSeen == n, s"n_seen ${s.nSeen} != $n")
    assert(s.err * 5 <= n, s"error budget blown: ${s.err} * 5 > $n")
    assert(s.counters.nonEmpty && s.counters.size <= 4)
    s.counters.foreach { case (key, est) =>
      val t = truth(key)
      assert(est <= t && t <= est + s.err,
        s"key $key: est $est not in [${t - s.err}, $t]")
    }
    assert(s.counters.exists(_._1 == 1L),
      s"key 1 (freq 40 > n/(k+1) = ${n / 5}) evicted: ${s.counters}")
  }

  test("survivors and bounds are batch-order-robust; single-batch equals the exact-compress twin") {
    val a = Seq((1L, 30), (2L, 6)) ++ (10L to 17L).map((_, 2))
    val b = (20L to 27L).map((_, 3)) ++ Seq((1L, 10))
    val (fwd, _) = runStream(Seq(a, b), k = 4)
    val (rev, _) = runStream(Seq(b, a), k = 4)
    for (s <- Seq(fwd, rev)) {
      assert(s.counters.exists(_._1 == 1L), s"heavy key lost: $s")
      assert(s.err * 5 <= s.nSeen)
      val est1 = s.counters.find(_._1 == 1L).get._2
      assert(est1 <= 40L && 40L <= est1 + s.err)
    }
    // one batch holding everything == compress of the exact histogram
    val (one, _) = runStream(Seq(a ++ b), k = 4)
    val merged = (a ++ b).groupBy(_._1)
      .map { case (key, vs) => (key, vs.map(_._2.toLong).sum) }.toSeq
    val exact = HeavyHittersStream.compress(merged, 4, 0L,
      merged.map(_._2).sum)
    assert(one.counters.toSet == exact.counters.toSet &&
      one.err == exact.err, s"$one != $exact")
  }

  test("replay safety: a batch reads the state BEFORE its own id, not its own prior attempt") {
    val base = java.nio.file.Files.createTempDirectory("hh-replay").toString
    HeavyHittersStream.writeState(spark,
      Summary(Seq((7L, 5L)), 1L, 20L), s"$base/batch_id=0")
    HeavyHittersStream.writeState(spark,
      Summary(Seq((7L, 9L)), 2L, 40L), s"$base/batch_id=1")
    // replaying batch 1 must see batch 0's summary only
    val seen = HeavyHittersStream.readState(spark, base, batchId = 1L)
    assert(seen == Summary(Seq((7L, 5L)), 1L, 20L), s"got $seen")
    // a fresh batch 2 sees the latest (batch 1)
    val next = HeavyHittersStream.readState(spark, base, batchId = 2L)
    assert(next == Summary(Seq((7L, 9L)), 2L, 40L), s"got $next")
    // nothing-survived batches still carry err/n_seen forward
    HeavyHittersStream.writeState(spark,
      Summary(Seq.empty, 3L, 50L), s"$base/batch_id=2")
    val empty = HeavyHittersStream.readState(spark, base, batchId = 3L)
    assert(empty == Summary(Seq.empty, 3L, 50L), s"got $empty")
  }

  test("compress: deterministic tie handling and the all-tied degenerate case") {
    // ranks 4 and 5 tie at count 3: the key order decides, and the
    // subtraction threshold equals the tied count
    val tied = HeavyHittersStream.compress(
      Seq((1L, 9L), (2L, 7L), (3L, 5L), (5L, 3L), (4L, 3L)), 4, 0L, 27L)
    assert(tied == Summary(Seq((1L, 6L), (2L, 4L), (3L, 2L)), 3L, 27L),
      s"got $tied")
    // all keys tied with > k distinct: everything cancels, err carries
    val flat = HeavyHittersStream.compress(
      (1L to 6L).map((_, 2L)), 4, 0L, 12L)
    assert(flat.counters.isEmpty && flat.err == 2L, s"got $flat")
  }

  test("e10 batch twin: bounds verified against exact counts; capacity guard refuses driver-unsafe k") {
    val got = run("e10_heavy_users").collect()
    val exact = graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(got.nonEmpty && got.length <= 8)
    got.foreach { r =>
      val (key, est, err) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(err * 9 <= n)
      assert(est <= exact(key) && exact(key) <= est + err,
        s"user $key: est $est err $err true ${exact(key)}")
    }
    val ex = intercept[IllegalArgumentException] {
      HeavyHittersStream.heavyHitters(spark,
        graft.sources.Tables.table(spark, sfDir, "events"),
        "user_id", 5000, "/tmp/x", "/tmp/y", "/tmp/z")
    }
    assert(ex.getMessage.contains("driver-resident"))
  }
}

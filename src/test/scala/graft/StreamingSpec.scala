package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStream
import graft.sources.Tables

/** Streaming semantics vs batch ground truth on the same fixture. */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window matches batch aggregation") {
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.tumblingCounts(stream), "tumbling_test", OutputMode.Append())
      .groupBy().agg(sum("n")).collect()(0).getLong(0)
    val batchN = Tables.events(spark, sfDir).count()
    // watermark closes all windows except possibly the last open ones;
    // with processAllAvailable on a finite source, append emits only
    // windows below the final watermark
    assert(got > 0 && got <= batchN)
  }

  test("streaming session windows produce keyed sessions") {
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.sessionWindows(stream), "session_test", OutputMode.Append())
    assert(got.count() > 0)
    assert(got.filter(col("n_events") <= 0).count() == 0)
  }

  test("streaming dedup emits each event_id at most once") {
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.dedupEvents(stream), "dedup_test", OutputMode.Append())
    val dupes = got.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dupes == 0)
  }

  test("stream-stream interval join matches the batch join") {
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.purchaseAttribution(stream), "attr_test", OutputMode.Append())
    val batch = Tables.events(spark, sfDir)
    val clicks = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = batch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val expected = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts")).count()
    assert(got.count() == expected)
    assert(expected > 0)
  }

  test("left-outer interval join: matched rows equal the inner join; null rows are real no-click purchases") {
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.purchaseAttributionOuter(stream), "attr_outer_test",
      OutputMode.Append()).cache()
    val batch = Tables.events(spark, sfDir)
    val clicks = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = batch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val cond = col("p_user") === col("c_user") &&
      col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
      col("click_ts") <= col("purchase_ts")
    // matched side must be EXACTLY the batch inner join
    val inner = purchases.join(clicks, cond).count()
    assert(got.filter(col("click_id").isNotNull).count() == inner)
    // every null-click emission must be a purchase the batch left join
    // also leaves unmatched (the watermark can withhold tail rows, but
    // must never FABRICATE an unmatched row)
    val batchUnmatched = purchases.join(clicks, cond, "left_outer")
      .filter(col("click_id").isNull)
      .select(col("purchase_id"))
    val fabricated = got.filter(col("click_id").isNull)
      .select(col("purchase_id"))
      .join(batchUnmatched, Seq("purchase_id"), "left_anti").count()
    assert(fabricated == 0,
      s"$fabricated null-click rows have a matching click in batch")
    // and some unmatched purchases must actually emit (the corpus is a
    // month long; the final watermark closes nearly every window)
    assert(got.filter(col("click_id").isNull).count() > 0,
      "no unmatched purchases emitted — outer semantics not exercised")
    got.unpersist()
  }

  test("stream-static enrichment matches the batch join, closed windows only") {
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.enrichedSegmentCounts(spark, stream, sfDir),
      "enrich_test", OutputMode.Append())
    // the batch twin over the same fixture; append mode withholds
    // windows the final watermark has not closed, so compare on the
    // windows the stream actually emitted — counts must agree exactly
    val dim = Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = Tables.events(spark, sfDir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("bn"))
      .select(col("window.start").as("hour_start"), col("c_mktsegment"), col("bn"))
    assert(got.count() > 0)
    // inner join + count equality: a left join would let a fabricated
    // window slip through (n =!= NULL is NULL, not true)
    val joined = got.join(batch, Seq("hour_start", "c_mktsegment"))
    assert(joined.count() == got.count(),
      "stream emitted a window the batch twin never produced")
    assert(joined.filter(col("n") =!= col("bn")).count() == 0)
  }

  test("mapGroupsWithState running totals equal batch per-user totals") {
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.userRunningTotals(spark, stream).toDF(),
      "state_test", OutputMode.Update())
    // final state per user (last update wins)
    val finalState = got.groupBy("user_id")
      .agg(max("n_events").as("n_events"))
    val batch = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_batch"))
    val mismatched = finalState.join(batch, "user_id")
      .filter(col("n_events") =!= col("n_batch")).count()
    assert(mismatched == 0)
  }

  test("streaming funnel equals e11's batch cascade on the fixture; order contract pinned on a disordered arrival") {
    // 1) fixture parity: final stage counts == e11's n_users
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.funnelStates(spark, stream).toDF(),
      "funnel_test", OutputMode.Update())
    val finalStage = got.groupBy("user_id")
      .agg(max("stage").as("stage"))
    val e11 = SparkEntry.queries("e11_attribution_window")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1L to 3L).foreach { k =>
      val streamed = finalStage.filter(col("stage") >= k).count()
      assert(streamed == e11(k),
        s"stage $k: streamed $streamed != batch ${e11(k)}")
    }
    // 2) the order contract: a click ARRIVING before its user's view
    // (event-time still after it) is gone by the time the view lands —
    // batch e11 over the same rows converts it; the stream must not.
    // u1 arrives in order across batches and must convert.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = EventsStream.funnelStates(spark,
        ms.toDF().toDF("event_id", "ts", "user_id", "event_type")).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_order").start()
    try {
      ms.addData((1L, t("2026-01-01 10:30:00"), 2L, "click"),
        (2L, t("2026-01-01 10:00:00"), 1L, "view"))
      q.processAllAvailable()
      ms.addData((3L, t("2026-01-01 10:00:00"), 2L, "view"),
        (4L, t("2026-01-01 10:30:00"), 1L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val states = spark.table("funnel_order").groupBy("user_id")
      .agg(max("stage").as("stage")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(states == Map(1L -> 2L, 2L -> 1L),
      s"order contract broken: $states")
  }

  test("funnel state TTL: eviction past the advance horizon; a re-appearing user starts a fresh funnel") {
    // u1 views then clicks (stage 2). The watermark is then driven far
    // past u1's advance horizon (v + 2*24h) by another user's events,
    // firing the event-time timeout: u1's frozen stage is emitted once
    // more (same values — pre-eviction results unchanged) and the
    // state freed. A u1 view arriving after that must open a FRESH
    // funnel — stage 1 with the NEW v_us; un-evicted state would have
    // ignored the view (v_us already set) and kept emitting stage 2.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = EventsStream.funnelStates(spark,
        ms.toDF().toDF("event_id", "ts", "user_id", "event_type")).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_ttl").start()
    try {
      ms.addData((1L, t("2026-01-01 10:00:00"), 1L, "view"),
        (2L, t("2026-01-01 10:30:00"), 1L, "click"))
      q.processAllAvailable()
      // push the watermark past u1's horizon (Jan 3 10:00), then one
      // more batch so the advanced watermark fires the timeout
      ms.addData((3L, t("2026-01-10 00:00:00"), 99L, "view"))
      q.processAllAvailable()
      ms.addData((4L, t("2026-01-10 00:01:00"), 99L, "click"))
      q.processAllAvailable()
      ms.addData((5L, t("2026-01-10 01:00:00"), 1L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("funnel_ttl").filter(col("user_id") === 1L)
      .select("stage", "v_us", "c_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pre-eviction rows (original v_us): stage 2, never mutated after
    val pre = u1.filter(_._2 != u1.map(_._2).max)
    assert(pre.nonEmpty && pre.forall(r => r._1 == 2L && r._3 > 0),
      s"pre-eviction funnel changed: ${u1.toSeq}")
    // the re-appearance row: a FRESH funnel — stage 1, new v_us, no click
    val fresh = u1.filter(_._2 == u1.map(_._2).max)
    assert(fresh.toSeq == Seq((1L, fresh.head._2, -1L)) &&
      fresh.head._2 > pre.head._2,
      s"re-appearance did not start a fresh funnel: ${u1.toSeq}")
  }

  test("funnel TTL anchor is monotone: a late batch of older events cannot pull a pre-view user's deadline backward") {
    // u7 never views, so its eviction anchor is event-time-based.
    // Batch 1: click at Jan 1 10:00 -> horizon Jan 3 10:00. Batch 2
    // arrives LATE with an OLDER click (Jan 1 09:00, inside the 24h
    // watermark delay): the documented horizon is LAST event + 2W, so
    // it must stay Jan 3 10:00 — the r15 defect recomputed it from the
    // current batch's max (Jan 3 09:00). Park the watermark BETWEEN
    // the two candidate horizons: a slid-back anchor evicts u7 here
    // (a third, timeout-emitted stage-0 row); the monotone anchor
    // must not. Then advance past the TRUE horizon and require the
    // eviction row — the anchor is monotone, not immortal.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = EventsStream.funnelStates(spark,
        ms.toDF().toDF("event_id", "ts", "user_id", "event_type")).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_anchor").start()
    def u7Rows() = spark.table("funnel_anchor")
      .filter(col("user_id") === 7L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    try {
      ms.addData((1L, t("2026-01-01 10:00:00"), 7L, "click"))
      q.processAllAvailable()
      ms.addData((2L, t("2026-01-01 09:00:00"), 7L, "click"))
      q.processAllAvailable()
      // watermark -> Jan 3 09:30 (between the slid-back horizon
      // Jan 3 09:00 and the true one Jan 3 10:00), + one batch so an
      // expired timeout would fire
      ms.addData((3L, t("2026-01-04 09:30:00"), 99L, "view"))
      q.processAllAvailable()
      ms.addData((4L, t("2026-01-04 09:31:00"), 99L, "view"))
      q.processAllAvailable()
      val before = u7Rows()
      assert(before.length == 2 && before.forall(_ == (0L, -1L, -1L, -1L)),
        s"u7 was evicted before its last-event+2W horizon (the anchor " +
          s"slid backward on the late batch): ${before.toSeq}")
      // now cross the true horizon: watermark -> Jan 3 11:00
      ms.addData((5L, t("2026-01-04 11:00:00"), 99L, "view"))
      q.processAllAvailable()
      ms.addData((6L, t("2026-01-04 11:01:00"), 99L, "view"))
      q.processAllAvailable()
      val after = u7Rows()
      assert(after.length == 3,
        s"u7 not evicted after the true horizon passed: ${after.toSeq}")
    } finally q.stop()
  }

  test("foreachBatch idempotent sink: replaying the stream never duplicates rows") {
    val out = java.nio.file.Files.createTempDirectory("graft-fb-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fb-ckpt").toString
    def runOnce(): Unit = {
      val q = EventsStream.runToIdempotentParquet(spark,
        EventsStream.readEvents(spark, sfDir), out, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val n1 = spark.read.parquet(out).count()
    val batchN = Tables.events(spark, sfDir).count()
    assert(n1 == batchN, s"sink holds $n1 rows, source has $batchN")
    // replay against a FRESH checkpoint (the failure-recovery shape:
    // the same batches re-fire) — overwrite-by-batchId must keep the
    // sink at exactly the source row count, never doubled
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-fb-ckpt2").toString
    val q2 = EventsStream.runToIdempotentParquet(spark,
      EventsStream.readEvents(spark, sfDir), out, ckpt2)
    try q2.processAllAvailable() finally q2.stop()
    val n2 = spark.read.parquet(out).count()
    assert(n2 == batchN, s"replay duplicated rows: $n2 != $batchN")
  }

  test("transformWithState running totals equal batch per-user totals (integer cents)") {
    val stream = EventsStream.readEvents(spark, sfDir)
    // userTotalsV2 requires (and refuses to set) the session-wide
    // RocksDB provider; configure it here and restore afterwards so
    // the other streaming tests keep the default provider.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, EventsStream.RocksDbProvider)
    val got = try {
      EventsStream.runToMemory(spark,
        EventsStream.userTotalsV2(spark, stream).toDF(),
        "tws_test", OutputMode.Update())
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // final state per user = the max emission (totals only grow)
    val finalState = got.groupBy("user_id")
      .agg(max("n_events").as("n_events"),
        max("total_cents").as("total_cents"))
    val batch = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_batch"),
        sum(round(col("value") * 100).cast("long")).as("cents_batch"))
    val mismatched = finalState.join(batch, "user_id")
      .filter(col("n_events") =!= col("n_batch") ||
        col("total_cents") =!= col("cents_batch")).count()
    assert(mismatched == 0)
    assert(finalState.count() == batch.count(),
      "transformWithState lost or invented a user key")
  }

  test("flatMapGroupsWithState closed sessions match batch sessionization exactly") {
    import org.apache.spark.sql.expressions.Window
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.closedSessions(spark, stream).toDF(),
      "fmgws_test", OutputMode.Append())
    assert(got.count() > 0, "no closed sessions emitted")
    // independent batch ground truth: e03's lag/cumsum sessionization,
    // extended with the session start and integer-cents value
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val sess = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_us").isNull ||
        col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("session_cents"))
      .select("user_id", "session_start_us", "n_events", "session_cents")
    // every emitted session is a real batch session, tuple-for-tuple
    val unmatched = got.join(sess,
      Seq("user_id", "session_start_us", "n_events", "session_cents"),
      "left_anti").count()
    assert(unmatched == 0,
      s"$unmatched streamed sessions have no batch counterpart")
    // and no session is emitted twice
    assert(got.distinct().count() == got.count())
  }

  test("streaming drift monitor emits rows value-identical to the batch twin for every closed window") {
    // the reference histogram is the batch global distribution (the
    // precomputed artifact a production monitor loads); each emitted
    // (day, type) cell must carry the SAME count and PSI contribution
    // the batch twin computes on the full fixture — drift arithmetic
    // may not depend on micro-batch boundaries
    val refCounts = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val stream = EventsStream.readEvents(spark, sfDir)
    val got = EventsStream.runToMemory(spark,
      EventsStream.driftContributions(stream, refCounts), "drift_test",
      OutputMode.Append()).cache()
    assert(got.count() > 0, "no window closed below the final watermark")
    val batch = SparkEntry.queries("e09_stream_drift")(spark, sfDir)
      .withColumnRenamed("n", "b_n")
      .withColumnRenamed("psi_contrib", "b_psi")
    val joined = got.join(batch, Seq("day_start", "event_type"), "left")
    assert(joined.filter(col("b_n").isNull).count() == 0,
      "streamed a (day, type) cell the batch twin does not have")
    val mismatched = joined.filter(
      col("n") =!= col("b_n") || col("psi_contrib") =!= col("b_psi")).count()
    assert(mismatched == 0, s"$mismatched cells diverge from the batch twin")
    // one row per (window, reference type) — no duplicate emission
    assert(got.groupBy("day_start", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }
}

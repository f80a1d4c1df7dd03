package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native DSv2 generator source (sources/GenSource): determinism
  * under repartitioning, honored options, column pruning reaching the
  * reader, and id-range filter pushdown narrowing the generated span. */
class GenSourceSpec extends SparkSpec {

  private def read(parts: Int, rows: Long = 10000L): DataFrame =
    spark.read.format("graft-gen")
      .option("rows", rows).option("seed", 7).option("partitions", parts)
      .load()

  private def checksum(df: DataFrame): Long =
    df.agg(expr("bit_xor(xxhash64(id, grp, val, tag))"))
      .collect()(0).getLong(0)

  test("graft-gen: deterministic content under any partitioning; options honored") {
    val a = read(3)
    val b = read(11)
    assert(a.count() == 10000 && b.count() == 10000)
    assert(a.rdd.getNumPartitions == 3 && b.rdd.getNumPartitions == 11)
    assert(checksum(a) == checksum(b),
      "partitioning changed generated content — the pure-hash contract is broken")
    // values in their documented ranges
    assert(a.filter(col("grp") < 0 || col("grp") >= 100).count() == 0)
    assert(a.select(countDistinct(col("tag"))).collect()(0).getLong(0) == 8)
  }

  test("graft-gen: column pruning reaches the reader") {
    val df = read(4).select("grp")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScan in the plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("grp"),
      s"reader not pruned: ${scans.head.scan.readSchema()}")
  }

  test("graft-gen: id-range pushdown narrows the span before partition planning") {
    val df = read(4).filter(col("id") >= 9000L && col("id") < 9500L)
    assert(df.count() == 500)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.description().contains("PushedIdRange: [9000, 9500)"),
      s"range not pushed: ${scans.head.scan.description()}")
    // pushdown must not change results vs post-scan filtering
    val viaPost = read(4).collect()
      .filter(r => r.getLong(0) >= 9000L && r.getLong(0) < 9500L)
      .map(_.toString).sorted.toSeq
    assert(df.collect().map(_.toString).sorted.toSeq == viaPost)
  }

  test("graft-gen: option keys are case-insensitive; bad configs fail loudly") {
    val df = spark.read.format("graft-gen")
      .option("Rows", 123).option("PARTITIONS", 2).load()
    assert(df.count() == 123, "differently-cased option silently ignored")
    intercept[IllegalArgumentException] {
      spark.read.format("graft-gen").option("rows", -1).load().count()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-gen").option("partitions", 0).load().count()
    }
  }

  test("graft-gen: complete aggregate pushdown (count/min/max of id), values match unpushed") {
    val df = read(4).agg(
      count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScan in the plan")
    assert(scans.head.scan.description().contains("PushedAggregates"),
      s"aggregates not pushed: ${scans.head.scan.description()}")
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10000L, 0L, 9999L)),
      s"pushed aggregate values wrong: $r")
    // composes with filter pushdown: the agg sees the narrowed span
    val f = read(4).filter(col("id") >= 9000L && col("id") < 9500L)
      .agg(count(lit(1)), min(col("id")), max(col("id"))).collect()(0)
    assert((f.getLong(0), f.getLong(1), f.getLong(2)) == ((500L, 9000L, 9499L)))
    // empty span: count 0, null extrema — matches post-scan semantics
    val e = read(4).filter(col("id") < 0L)
      .agg(count(lit(1)), min(col("id")), max(col("id"))).collect()(0)
    assert(e.getLong(0) == 0L && e.isNullAt(1) && e.isNullAt(2))
    // an aggregate that is NOT closed-form must stay post-scan and
    // still be correct (grp is a hash of id — the source must refuse)
    val g = read(4).agg(min(col("grp")), max(col("grp"))).collect()(0)
    val gPost = read(4).select("grp").collect().map(_.getLong(0))
    assert(g.getLong(0) == gPost.min && g.getLong(1) == gPost.max)
  }

  test("graft-gen: limit pushdown truncates the generated span exactly") {
    val df = read(4).limit(7)
    assert(df.count() == 7)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.description().contains("[0, 7)"),
      s"limit not pushed into the span: ${scans.head.scan.description()}")
    // composes with filter pushdown: limit truncates the narrowed span
    val lf = read(4).filter(col("id") >= 9000L).limit(5)
    assert(lf.collect().map(_.getLong(0)).toSeq == Seq(9000L, 9001L, 9002L, 9003L, 9004L))
  }

  test("graft-gen: reported statistics reach the optimizer post-pushdown") {
    // the V2 scan relation must expose the NARROWED span's row count,
    // so join planning sees the real scan output size
    val df = read(4).filter(col("id") >= 9000L && col("id") < 9500L)
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(rel.nonEmpty, "no V2 scan relation in the optimized plan")
    val stats = rel.head.stats
    assert(stats.rowCount.contains(BigInt(500)),
      s"stats row count should be the narrowed span (500): ${stats.rowCount}")
    assert(stats.sizeInBytes < 100000,
      s"narrowed scan should report a small size: ${stats.sizeInBytes}")
    // stats-driven broadcast: a filtered graft-gen side far below the
    // broadcast threshold must plan as the build side of a broadcast
    // join against a large table, with NO shuffle on the big side
    val big = read(8, 200000L)
    val dim = read(4).filter(col("id") >= 9990L) // 10 rows by stats
    val j = big.join(dim.select(col("id").as("k"), col("grp").as("dgrp")),
      col("id") === col("k"))
    // the AQE wrapper hides its children from collect(); the initial
    // plan's treeString shows the stats-driven join choice
    val planStr = j.queryExecution.executedPlan.treeString
    assert(planStr.contains("BroadcastHashJoin"),
      s"10-row-by-stats gen side did not broadcast:\n$planStr")
    assert(!planStr.contains("SortMergeJoin"),
      s"big gen side should not shuffle-sort:\n$planStr")
    assert(j.count() == 10)
  }

  test("graft-gen: runtime filter narrows the span before partition planning") {
    // direct contract check: an IN predicate on id narrows [lo, hi)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import graft.sources.{GenPartition, GenScan, GenScanBuilder}
    val sb = new GenScanBuilder(10000L, 7L, 8)
    val scan = sb.build().asInstanceOf[GenScan]
    assert(scan.planInputPartitions().length == 8)
    val in = new Predicate("IN",
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("id"),
        Expressions.literal(4000L), Expressions.literal(4010L),
        Expressions.literal(4005L)))
    scan.filter(Array(in))
    assert(scan.description().contains("[4000, 4011)"),
      s"IN-set did not narrow the span: ${scan.description()}")
    val spans = scan.planInputPartitions().map(_.asInstanceOf[GenPartition])
    assert(spans.head.start == 4000L && spans.last.end == 4011L,
      "partitions not re-planned over the narrowed span")
    // a range predicate narrows too; an unrecognized one is a no-op
    val sb2 = new GenScanBuilder(10000L, 7L, 4)
    val scan2 = sb2.build().asInstanceOf[GenScan]
    scan2.filter(Array(
      new Predicate(">=", Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("id"), Expressions.literal(9000L))),
      new Predicate("ENDS_WITH", Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("tag"), Expressions.literal("1")))))
    assert(scan2.description().contains("[9000, 10000)"),
      s"range runtime filter not applied: ${scan2.description()}")
    // and filterAttributes advertises id (the span-partitioned column)
    assert(scan2.filterAttributes().map(_.describe()).toSeq == Seq("id"))
  }

  test("graft-gen: micro-batch streaming read — bounded id feed, batch-sized triggers, batch parity") {
    import org.apache.spark.sql.functions._
    val sizes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-gen")
      .option("rows", 100).option("rowsPerBatch", 30).option("seed", 7)
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sizes.synchronized { sizes += ((id, b.count())) }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // 100 rows at 30/trigger: 30, 30, 30, 10 — bounded, then quiescent
    assert(sizes.sortBy(_._1).map(_._2).toSeq == Seq(30L, 30L, 30L, 10L),
      s"got $sizes")

    // content parity with the batch scan: same (id -> grp, val, tag)
    val streamed = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[org.apache.spark.sql.Row]]
      val q2 = spark.readStream.format("graft-gen")
        .option("rows", 100).option("rowsPerBatch", 64).option("seed", 7)
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf += b.collect() }; ()
        }
        .start()
      try q2.processAllAvailable() finally q2.stop()
      buf.flatten.map(_.toString).sorted.toSeq
    }
    val batch = spark.read.format("graft-gen")
      .option("rows", 100).option("seed", 7).load()
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch, "streamed rows diverge from the batch scan")
  }

  test("graft-gen streaming: maxRowsPerTrigger admission control caps batch sizes below rowsPerBatch") {
    // the source declares ReadLimit.maxRows via getDefaultReadLimit and
    // latestOffset must HONOR the engine's limit — rowsPerBatch says 40
    // but admission control tightens each trigger to 25
    val sizes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-gen")
      .option("rows", 100).option("rowsPerBatch", 40)
      .option("maxRowsPerTrigger", 25).option("seed", 7)
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sizes.synchronized { sizes += ((id, b.count())) }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(sizes.sortBy(_._1).map(_._2).toSeq == Seq(25L, 25L, 25L, 25L),
      s"admission control ignored: $sizes")
    // and a limit LOOSER than rowsPerBatch leaves the source's own
    // batch size in charge (min of the two)
    val sizes2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q2 = spark.readStream.format("graft-gen")
      .option("rows", 90).option("rowsPerBatch", 30)
      .option("maxRowsPerTrigger", 1000).option("seed", 7)
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sizes2.synchronized { sizes2 += ((id, b.count())) }; ()
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(sizes2.sortBy(_._1).map(_._2).toSeq == Seq(30L, 30L, 30L),
      s"got $sizes2")
  }

  test("graft-gen streaming: a composite ReadLimit contributes its tightest ReadMaxRows component") {
    // Trigger.AvailableNow can wrap limits in a CompositeReadLimit —
    // the max-rows bound inside it is still a hard row cap and must
    // not degrade to the configured batch size; components this source
    // can't honor (files) are ignored
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val s = new graft.sources.GenMicroBatchStream(
      lo = 0, hi = 1000, seed = 1, parts = 2, perBatch = 40,
      fields = Array("id"))
    def advance(l: ReadLimit): Long =
      s.latestOffset(s.initialOffset(), l)
        .asInstanceOf[graft.sources.GenOffset].endId
    assert(advance(ReadLimit.compositeLimit(Array(
      ReadLimit.maxFiles(3), ReadLimit.maxRows(25)))) == 25)
    assert(advance(ReadLimit.compositeLimit(Array(
      ReadLimit.maxRows(70), ReadLimit.maxRows(25)))) == 25)
    // a composite with no row component, or a looser-than-perBatch
    // row cap, leaves the source's own batch size in charge
    assert(advance(ReadLimit.compositeLimit(Array(
      ReadLimit.maxFiles(3)))) == 40)
    assert(advance(ReadLimit.compositeLimit(Array(
      ReadLimit.maxRows(500)))) == 40)
  }

  test("graft-gen streaming: restart from the checkpoint resumes at the committed offset") {
    // a fresh stream instance must restore its high-water mark from the
    // checkpointed offset (deserializeOffset/commit), not regress to lo
    // and re-plan already-committed ranges
    val base = java.nio.file.Files.createTempDirectory("gen-restart").toString
    def run(): Seq[(Long, Long)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = spark.readStream.format("graft-gen")
        .option("rows", 100).option("rowsPerBatch", 40).option("seed", 3)
        .load()
        .writeStream.option("checkpointLocation", s"$base/ck")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          buf.synchronized { buf += ((id, b.count())) }; ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      buf.toSeq
    }
    val first = run()
    assert(first.map(_._2).sum == 100, s"first run incomplete: $first")
    val second = run()
    assert(second.map(_._2).sum == 0,
      s"restart re-emitted committed rows: $second")
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{SubstrIndex, TextOps}

/** Dev probe: the ExactSubstr standing index's daily-run claim at the
  * headroom corpus — build once (cost ∝ corpus), then each probe pays
  * batch-window signing + one co-partitioned join against the
  * persisted 16-byte keys instead of dd25's per-run history fold
  * (wordShinglePosRows + distinct over the FULL corpus text). Two
  * batch sizes separate the ∝-batch component from the index
  * key-scan floor; the in-query dd25 shape on the same history/batch
  * is the baseline it replaces. Results in SCALING.md (round 16).
  *
  * Usage: runMain graft.tools.SubstrIndexProbe [nDocs]
  * (expects the PipelineHeadroom fixture at /tmp/graft-headroom-<n>)
  */
object SubstrIndexProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val dir = s"/tmp/graft-headroom-$n"
    require(new java.io.File(s"$dir/documents.parquet").exists(),
      s"fixture missing — run: runMain graft.tools.PipelineHeadroom $n")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SUBSTRIDX $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def force(df: DataFrame): Long =
      df.agg(count(lit(1)).as("rows"),
        bit_xor(xxhash64(struct(df.columns.map(col): _*))).as("sink"))
        .collect()(0).getLong(0)

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val histBound = n - n / 100 // 99% history
    val hist = d.filter(col("doc_id") < histBound)
    val batchBig = d.filter(col("doc_id") >= histBound) // 1% of corpus
    val batchSmall = d.filter(col("doc_id") >= n - n / 1000) // 0.1%

    // a previous JVM's run leaves the warehouse dir behind while the
    // fresh in-memory catalog forgets the table — recursive delete
    // (pb= partition dirs nest) or the create refuses
    def dropTable(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      val loc = new java.io.File(s"spark-warehouse/$name")
      if (loc.exists) rm(loc)
    }
    dropTable("substr_idx_headroom")
    time("build (once, ~corpus)") {
      SubstrIndex.build(hist, "substr_idx_headroom")
    }
    println(s"SUBSTRIDX index keys: " +
      spark.table("substr_idx_headroom").count())

    val rBig = time(s"probe batch=${n / 100}") {
      force(SubstrIndex.probe(spark, "substr_idx_headroom", batchBig))
    }
    val rSmall = time(s"probe batch=${n / 1000}") {
      force(SubstrIndex.probe(spark, "substr_idx_headroom", batchSmall))
    }
    println(s"SUBSTRIDX probe rows: big=$rBig small=$rSmall")

    // the baseline this replaces: dd25's in-query history fold — the
    // full corpus text re-signed and distinct-folded EVERY run
    def winKeys(df: DataFrame) = SubstrIndex.windowKeys(df)
    time("in-query dd25 shape (~corpus)") {
      val histKeys = winKeys(hist).select(col("h1"), col("h2")).distinct()
      val known = histKeys
        .join(winKeys(batchBig).hint("shuffle_hash"), Seq("h1", "h2"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_known"))
      force(known)
    }

    time(s"append batch=${n / 100}") {
      SubstrIndex.append(batchBig, "substr_idx_headroom")
    }
    // post-append probe of the accepted batch: fully known, still fast
    time("probe re-submitted batch") {
      force(SubstrIndex.probe(spark, "substr_idx_headroom", batchBig))
    }

    // plan receipt: no Exchange above the index scan in the probe join
    val plan = SubstrIndex.probe(spark, "substr_idx_headroom", batchSmall)
      .queryExecution.executedPlan.toString
    val joinLines = plan.linesIterator.filter(l =>
      l.contains("ShuffledHashJoin") || l.contains("Exchange") ||
        l.contains("Scan parquet")).map(_.trim.take(90)).mkString("\n  ")
    println(s"SUBSTRIDX probe plan:\n  $joinLines")

    // ---- round 17: partition-pruned probe at a fine pb layout ----
    // touched ≈ nParts·(1 − (1 − 1/nParts)^k) for k distinct batch
    // keys: pruning bites when k ≲ nParts (interactive / trickle
    // probes) and degrades to the full one-pass key scan for bulk
    // batches — both receipted here on the same table
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def idxScans(p: SparkPlan, t: String): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => idxScans(a.executedPlan, t)
      case q: QueryStageExec => idxScans(q.plan, t)
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == t) => Seq(f)
      case other => other.children.flatMap(idxScans(_, t))
    }
    def prunedProbe(label: String, batch: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val probed = SubstrIndex.probe(spark, "substr_idx_headroom_pb", batch)
      val nRows = force(probed)
      val secs = (System.nanoTime() - t0) / 1e9
      val parts = idxScans(probed.queryExecution.executedPlan,
        "substr_idx_headroom_pb").map(_.selectedPartitions.partitionCount)
      println(f"SUBSTRIDX $label%-28s $secs%.2f s  " +
        f"partitions=${parts.mkString("+")}/1024  rows=$nRows")
      probed
    }
    dropTable("substr_idx_headroom_pb")
    time("build pb=1024 (once)") {
      SubstrIndex.build(hist, "substr_idx_headroom_pb",
        nBuckets = 4, nParts = 1024)
    }
    prunedProbe(s"pruned probe batch=${n / 1000}", batchSmall)
    val oneDoc = d.filter(col("doc_id") === (n - 1))
    prunedProbe("pruned probe batch=1 doc", oneDoc)
    import spark.implicits._
    val tinyDoc = Seq((0L, (1 to 15).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    prunedProbe("pruned probe 8-window doc", tinyDoc)
    // parity: pruned path == plain key-frame probe on the same batch
    val gotP = SubstrIndex.probe(spark, "substr_idx_headroom_pb", oneDoc)
      .collect().map(_.mkString("|")).toSeq
    val wantP = SubstrIndex.probeKeys(
        spark.table("substr_idx_headroom_pb").select("h1", "h2"), oneDoc)
      .collect().map(_.mkString("|")).toSeq
    println(s"SUBSTRIDX pruned parity: ${gotP == wantP}")
    spark.stop()
  }
}

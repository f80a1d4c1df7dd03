package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{DedupIndex, TextOps}

/** Dev probe (round 17): the persisted LSH index at the headroom
  * corpus — build cost, the bulk-batch probe vs the in-query daily
  * re-sign it replaces, and the pb partition pruning's honest
  * envelope (6 buckets per doc, so pruning bites only while
  * 6·|batch| ≲ nParts: the interactive/trickle path; bulk batches
  * degrade to the full one-pass bucketed scan BY DESIGN — both sides
  * measured, with partitions-touched printed as the IO receipt).
  *
  * Usage: runMain graft.tools.DedupIndexProbe [nDocs]
  * (expects the PipelineHeadroom fixture — run that first)
  */
object DedupIndexProbe {
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
      println(f"DEDUPIDX $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def dropTable(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      val loc = new java.io.File(s"spark-warehouse/$name")
      if (loc.exists) rm(loc)
    }

    // the index scan's touched-partition count, from the executed plan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansIn(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
      case q: QueryStageExec => scansIn(q.plan)
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == "dedup_idx_headroom") => Seq(f)
      case other => other.children.flatMap(scansIn)
    }
    def partsTouched(df: DataFrame): String =
      scansIn(df.queryExecution.executedPlan).headOption
        .map(_.selectedPartitions.partitionCount.toString).getOrElse("?")

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val histBound = n - n / 100
    val hist = d.filter(col("doc_id") < histBound).localCheckpoint(true)
    val batchBulk = d.filter(col("doc_id") >= histBound)
      .localCheckpoint(true) // 1% of corpus
    val batchTrickle = d.filter(col("doc_id") >= n - 3)
      .localCheckpoint(true) // 3 docs — the interactive path

    dropTable("dedup_idx_headroom")
    time("build (once, ~corpus)") {
      DedupIndex.build(hist, "dedup_idx_headroom")
    }

    // the daily cost the index replaces: in-query LSH probe re-signs
    // the WHOLE history every run
    time("in-query probe (corpus re-sign)") {
      TextOps.lshProbePairs(
        TextOps.wordShingleRows(hist, "doc_id", "text", 3),
        TextOps.wordShingleRows(batchBulk, "doc_id", "text", 3),
        "doc_id", DedupIndex.Hashes, DedupIndex.RowsPerBand,
        100, 8, 10).count()
    }

    var lastParts = "?"
    def probe(label: String, batch: DataFrame): Unit = {
      val p = time(label) {
        val df = DedupIndex.probe(spark, "dedup_idx_headroom", batch, hist)
        df.count()
        df
      }
      lastParts = partsTouched(p)
      println(s"DEDUPIDX   partitions touched: $lastParts/64")
    }
    probe("index probe, bulk 1% batch", batchBulk)
    probe("index probe, bulk 1% batch (rpt)", batchBulk)
    probe("index probe, 3-doc trickle", batchTrickle)
    probe("index probe, 3-doc trickle (rpt)", batchTrickle)
    spark.stop()
  }
}

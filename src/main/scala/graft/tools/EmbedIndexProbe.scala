package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.EmbedIndex

/** Dev probe (round 17): the persisted embedding near-dup index at
  * headroom scale — build cost, the bulk probe vs the in-query
  * re-sign it replaces, and the pb pruning envelope (8 sig buckets
  * per vector → pruning bites for trickle probes, bulk degrades to
  * the one-pass bucketed scan by design; partitions-touched printed
  * as the IO receipt).
  *
  * The corpus is synthesized deterministically (no fixture carries
  * 500k embeddings): component j of vector i is a centered dyadic
  * value of xxhash64(j, i) — constant hashed FIRST, the independent-
  * lane rule — then normalized; the probe batches plant exact copies
  * of standing vectors so the expected pairs are guaranteed.
  *
  * Usage: runMain graft.tools.EmbedIndexProbe [nVecs]
  */
object EmbedIndexProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorOps.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"EMBEDIDX $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
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

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansIn(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
      case q: QueryStageExec => scansIn(q.plan)
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == "embed_idx_headroom") => Seq(f)
      case other => other.children.flatMap(scansIn)
    }
    def partsTouched(df: DataFrame): String =
      scansIn(df.queryExecution.executedPlan).headOption
        .map(_.selectedPartitions.partitionCount.toString).getOrElse("?")

    def vecsFor(ids: DataFrame): DataFrame =
      EmbedIndex.normalized(ids.select(col("vec_id"),
        array((0 until 64).map(j =>
          ((pmod(xxhash64(lit(j), col("src_id")), lit(2001L)) - 1000L)
            .cast("double") / 1000.0)): _*).as("embedding")))

    val hist = vecsFor(spark.range(n)
        .select(col("id").as("vec_id"), col("id").as("src_id")))
      .localCheckpoint(true)
    // probe batches: exact copies of LOW standing ids under fresh ids
    // (at this density every 8-bit bucket floods to its min-id rep —
    // dd12's stated envelope, bits grow with log2(n) — so only copies
    // of likely-rep vectors can verify; low ids are the likely reps)
    // plus fresh content
    def batchOf(size: Long): DataFrame = vecsFor(spark.range(size)
        .select((col("id") + n).as("vec_id"),
          when(col("id") % 2 === 0, col("id") * 7 % 64) // copy of low id
            .otherwise(col("id") + 7 * n).as("src_id"))) // fresh content
      .localCheckpoint(true)
    val batchBulk = batchOf(n / 100)
    val batchTrickle = batchOf(3)

    dropTable("embed_idx_headroom")
    time("build (once, ~corpus)") {
      EmbedIndex.build(hist, "embed_idx_headroom")
    }

    // the daily cost the index replaces: the in-query twin re-signs
    // the whole standing corpus every run
    val wantBulk = time("in-query probe (corpus re-sign)") {
      EmbedIndex.probeVecs(hist, batchBulk).count()
    }

    var got = 0L
    def probe(label: String, batch: DataFrame): Unit = {
      val p = time(label) {
        val df = EmbedIndex.probe(spark, "embed_idx_headroom", batch)
        got = df.count()
        df
      }
      println(s"EMBEDIDX   pairs=$got  partitions touched: " +
        s"${partsTouched(p)}/64")
    }
    probe("index probe, bulk 1% batch", batchBulk)
    probe("index probe, bulk 1% batch (rpt)", batchBulk)
    println(s"EMBEDIDX bulk parity: index=$got in-query=$wantBulk " +
      s"identical=${got == wantBulk}")
    probe("index probe, 3-vec trickle", batchTrickle)
    probe("index probe, 3-vec trickle (rpt)", batchTrickle)
    spark.stop()
  }
}

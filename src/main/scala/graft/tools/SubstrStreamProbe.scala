package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.SubstrIndex
import graft.streaming.DocsStream

/** Dev probe (round 17): the substrAdmission checkpoint narrowing at
  * the headroom corpus — the round's headline streaming fix,
  * receipted at scale. r16 localCheckpoint'd the FULL standing key
  * set per micro-batch; r17 checkpoints standing ∩ batch-keys. This
  * measures both shapes' checkpoint ROW COUNTS (the structural term —
  * what each micro-batch materializes) and the end-to-end decide cost
  * on each, against the persisted index as the standing side (the
  * deployment path).
  *
  * Usage: runMain graft.tools.SubstrStreamProbe [nDocs]
  * (expects the PipelineHeadroom fixture AND the substr_idx_headroom
  * table left by SubstrIndexProbe — run that first)
  */
object SubstrStreamProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val dir = s"/tmp/graft-headroom-$n"
    require(new java.io.File(s"$dir/documents.parquet").exists(),
      s"fixture missing — run: runMain graft.tools.PipelineHeadroom $n")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // a fresh JVM's in-memory catalog forgets the table; the files
    // survive — read the key set straight off the warehouse dir
    val idxDir = "spark-warehouse/substr_idx_headroom"
    require(new java.io.File(idxDir).exists(),
      "index missing — run: runMain graft.tools.SubstrIndexProbe")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SUBSTRSTREAM $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = d.filter(col("doc_id") >= n - n / 1000) // 0.1% micro-batch
      .localCheckpoint(true)
    val initial = spark.read.parquet(idxDir).select(col("h1"), col("h2"))

    // warm-up: force the batch signing path once, untimed
    SubstrIndex.keySet(batch).count()

    // r16 shape: the full standing union materialized per batch
    val fullCkpt = time("r16 full-standing checkpoint") {
      initial.localCheckpoint(true)
    }
    val fullRows = fullCkpt.count()
    val decideFull = time("decide on full checkpoint") {
      DocsStream.substrDecide(fullCkpt, batch).count()
    }

    // r17 shape: standing semi-joined to the batch's keys first
    val bKeys = SubstrIndex.keySet(batch).localCheckpoint(true)
    val narrowCkpt = time("r17 narrowed checkpoint") {
      DocsStream.narrowStanding(initial, bKeys).localCheckpoint(true)
    }
    val narrowRows = narrowCkpt.count()
    val decideNarrow = time("decide on narrowed checkpoint") {
      DocsStream.substrDecide(narrowCkpt, batch).count()
    }

    println(f"SUBSTRSTREAM checkpoint rows: full=$fullRows narrowed=" +
      f"$narrowRows (${100.0 * narrowRows / fullRows}%.2f%% of index)")
    println(s"SUBSTRSTREAM decide rows: full=$decideFull narrowed=$decideNarrow")
    // decisions value-identical on both shapes
    val a = DocsStream.substrDecide(fullCkpt, batch)
      .collect().map(_.mkString("|")).toSet
    val b = DocsStream.substrDecide(narrowCkpt, batch)
      .collect().map(_.mkString("|")).toSet
    println(s"SUBSTRSTREAM decisions identical: ${a == b}")
    spark.stop()
  }
}

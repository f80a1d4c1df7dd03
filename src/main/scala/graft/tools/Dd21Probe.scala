package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{DedupQueries, TextOps}

/** Dev probe (round 17): the r16 verdict's watch item — the LSH
  * verify-set narrowing was receipted on the PAIR chain at 500k
  * (25× set-shuffle mass cut), but dd21, the narrowing's heaviest
  * consumer (pairs → min-label CC → keep-min → per-source token
  * rollup), was only inferred from that receipt while its sf0.1
  * floor re-pinned UPWARD. This runs the FULL dd21 shape both ways
  * (un-narrowed vs prod-narrowed verify sets) at the headroom corpus,
  * alternating A/B twice in one session (single-shot readings carry
  * the documented ±30-50 % band; the first slot absorbs bring-up).
  * Everything downstream of the pair stage is the same code both
  * ways, so any delta is the narrowing's — and the rollups are
  * asserted value-identical.
  *
  * Usage: runMain graft.tools.Dd21Probe [nDocs]
  * (expects the PipelineHeadroom fixture at /tmp/graft-headroom-<n>)
  */
object Dd21Probe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val dir = s"/tmp/graft-headroom-$n"
    require(new java.io.File(s"$dir/documents.parquet").exists(),
      s"fixture missing — run: runMain graft.tools.PipelineHeadroom $n")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val rows3 = TextOps.wordShingleRows(d, "doc_id", "text", 3)
      .select(col("doc_id"), col("_el"))

    // dd21's pair stage, both shapes — prod (narrowed) is exactly
    // TextOps.lshNearDupPairs; un-narrowed folds a verify set for
    // EVERY corpus doc, the pre-r16 shape
    def pairsNarrowed: DataFrame =
      TextOps.lshNearDupPairs(rows3, "doc_id", 36, 6, 100, 8, 10)
        .select(col("a_id"), col("b_id"))
    def pairsUnNarrowed: DataFrame = {
      val sets = rows3.groupBy(col("doc_id"))
        .agg(collect_set(col("_el")).as("_set"))
      val cand = TextOps.lshCandidatesFromRows(rows3, "doc_id", 36, 6, 100)
      TextOps.jaccardJoin(cand, sets, "doc_id", "_set", 8, 10)
        .select(col("a_id"), col("b_id"))
    }

    // dd21's consumer tail, verbatim shape: CC → keep-min → source rollup
    def dd21(pairs: DataFrame, tag: String): DataFrame = {
      val dm = d.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      val cl = DedupQueries.minLabelComponents(pairs, s"dd21probe_$tag")
        .select(col("v").as("doc_id"),
          (col("v") === col("lbl")).cast("long").as("keep"))
      dm.join(cl, Seq("doc_id"), "left")
        .select(col("source"), col("n_tok"),
          coalesce(col("keep"), lit(1L)).as("keep"),
          when(col("keep").isNotNull, 1L).otherwise(0L).as("clustered"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("clustered")).as("n_clustered"),
          sum(when(col("keep") === 0, 1L).otherwise(0L)).as("n_removed"),
          sum(col("n_tok")).as("tok_total"),
          sum(when(col("keep") === 0, col("n_tok")).otherwise(0L))
            .as("tok_removed"))
        .orderBy(col("source"))
    }

    def run(label: String, pairs: => DataFrame, tag: String): Seq[String] = {
      val t0 = System.nanoTime()
      val out = dd21(pairs, tag).collect().map(_.mkString("|")).toSeq
      println(f"DD21PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }

    // warm-up (untimed): absorb session bring-up so slot 1 isn't taxed
    rows3.count()
    d.count()

    val b1 = run("full dd21, narrowed (prod)", pairsNarrowed, "n1")
    val a1 = run("full dd21, un-narrowed", pairsUnNarrowed, "u1")
    val a2 = run("full dd21, un-narrowed", pairsUnNarrowed, "u2")
    val b2 = run("full dd21, narrowed (prod)", pairsNarrowed, "n2")
    println(s"DD21PROBE rollups identical: ${b1 == a1 && a1 == a2 && a2 == b2} " +
      s"(${b1.size} sources)")
    spark.stop()
  }
}

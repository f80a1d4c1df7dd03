package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Dev probe (round 16): extend the flat-two-long window-key evidence
  * (Dd15StageProbe: string keys 2-4x slower to hash/sort through
  * aggregation and join) to the remaining string-keyed internal
  * exchanges the r15 verdict named — tx21's (source, shingle) distinct
  * + self-join, and the dd03/dd05/tx23 LSH chain's stages — at the
  * headroom corpus. A/Bs the tx21 key shape value-identically and
  * decomposes the LSH chain so only measured-hot stages get touched.
  *
  * Usage: runMain graft.tools.ShingleKeyProbe [nDocs]
  * (expects the PipelineHeadroom fixture at /tmp/graft-headroom-<n>)
  */
object ShingleKeyProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val dir = s"/tmp/graft-headroom-$n"
    require(new java.io.File(s"$dir/documents.parquet").exists(),
      s"fixture missing — run: runMain graft.tools.PipelineHeadroom $n")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SHINGLEKEY $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s  n=$r")
    }
    def force(df: DataFrame): Long =
      df.agg(count(lit(1)).as("rows"),
        bit_xor(xxhash64(struct(df.columns.map(col): _*))).as("sink"))
        .collect()(0).getLong(0)

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

    // ---- tx21 key-shape A/B (value identity asserted on the matrix) --
    def tx21Matrix(ss: DataFrame, keyCols: Seq[String]): DataFrame = {
      val sz = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val cond = keyCols.map(k => col(s"a.$k") === col(s"b.$k"))
        .reduce(_ && _) && col("a.source") < col("b.source")
      val inter = ss.as("a").join(ss.as("b"), cond)
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sz.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .join(sz.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          col("n_inter"))
    }
    val shingles = TextOps.wordShingleRows(d, "doc_id", "text", 3)
    val srcMap = d.select(col("doc_id"), col("source"))
    val ssStr = shingles.join(srcMap, "doc_id")
      .select(col("source"), col("_el").as("el")).distinct()
    val ssFlat = shingles
      .select(col("doc_id"), TextOps.windowKey1(col("_el")).as("h1"),
        TextOps.windowKey2(col("_el")).as("h2"))
      .join(srcMap, "doc_id")
      .select(col("source"), col("h1"), col("h2")).distinct()
    time("tx21 string-el matrix")(force(tx21Matrix(ssStr, Seq("el"))))
    time("tx21 flat-h1h2 matrix")(force(tx21Matrix(ssFlat, Seq("h1", "h2"))))
    val mStr = tx21Matrix(ssStr, Seq("el"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val mFlat = tx21Matrix(ssFlat, Seq("h1", "h2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    println(s"SHINGLEKEY tx21 matrices identical: ${mStr == mFlat} " +
      s"(cells=${mStr.size})")

    // ---- dd03/tx23 LSH chain stage decomposition (word 3-shingles) --
    val rows3 = shingles.select(col("doc_id"), col("_el"))
    time("lsh signatures (md5, fixed)") {
      force(TextOps.bandBucketRows(rows3, "doc_id", 36, 6)
        .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("c")))
    }
    time("verify sets collect_set(el)") {
      force(rows3.groupBy(col("doc_id"))
        .agg(size(collect_set(col("_el"))).as("sz")))
    }
    time("full lshNearDupPairs chain") {
      force(TextOps.lshNearDupPairs(rows3, "doc_id", 36, 6, 100, 8, 10))
    }
    // A/B the r16 candidate-narrowed verify sets against the old
    // full-corpus fold IN ONE SESSION (single-shot cross-session
    // readings carry a ±30-50% band), plus the structural receipt:
    // element rows entering the collect_set SHUFFLE each way — that
    // volume is ∝ corpus un-narrowed and ∝ candidate docs narrowed,
    // which is the part that matters at 100 TB whatever the local
    // wall-clock says
    def chainUnNarrowed = {
      val sets = rows3.groupBy(col("doc_id"))
        .agg(collect_set(col("_el")).as("_set"))
      val cand = TextOps.lshCandidatesFromRows(rows3, "doc_id", 36, 6, 100)
      TextOps.jaccardJoin(cand, sets, "doc_id", "_set", 8, 10)
    }
    time("chain, un-narrowed sets") { force(chainUnNarrowed) }
    time("chain, narrowed sets (prod)") {
      force(TextOps.lshNearDupPairs(rows3, "doc_id", 36, 6, 100, 8, 10))
    }
    val candA = TextOps.lshCandidatesFromRows(rows3, "doc_id", 36, 6, 100)
    val candIds = candA.select(col("a_id").as("doc_id"))
      .union(candA.select(col("b_id").as("doc_id"))).distinct()
    val allRows = rows3.count()
    val narrowedRows = rows3
      .join(candIds, Seq("doc_id"), "left_semi").count()
    println(f"SHINGLEKEY set-shuffle rows: all=$allRows narrowed=" +
      f"$narrowedRows (${100.0 * narrowedRows / allRows}%.1f%% of corpus)")
    // B side: verify sets over the two-lane hashed element instead of
    // the raw string — same candidates, jaccardJoin on struct arrays
    val rowsK = rows3.select(col("doc_id"),
      struct(TextOps.windowKey1(col("_el")).as("h1"),
        TextOps.windowKey2(col("_el")).as("h2")).as("_kel"))
    time("verify sets collect_set(struct)") {
      force(rowsK.groupBy(col("doc_id"))
        .agg(size(collect_set(col("_kel"))).as("sz")))
    }
    val chainStr = TextOps.lshNearDupPairs(rows3, "doc_id", 36, 6, 100, 8, 10)
    def chainK = {
      val setsK = rowsK.groupBy(col("doc_id"))
        .agg(collect_set(col("_kel")).as("_set"))
      val cand = TextOps.lshCandidatesFromRows(rows3, "doc_id", 36, 6, 100)
      TextOps.jaccardJoin(cand, setsK, "doc_id", "_set", 8, 10)
    }
    time("full chain, hashed-el sets") { force(chainK) }
    val pStr = chainStr.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    val pK = chainK.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    println(s"SHINGLEKEY lsh pair sets identical: ${pStr == pK} " +
      s"(pairs=${pStr.size})")
    spark.stop()
  }
}

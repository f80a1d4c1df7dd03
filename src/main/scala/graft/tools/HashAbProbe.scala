package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The md5_seg32-vs-conv A/B, isolated (SCALING.md round 11).
  *
  * Measures the digest spelling alone: the gram/token rows are
  * localCheckpoint'd FIRST so the explode/scan cost is excluded from
  * every timed pass, reps run warm (first rep discarded), and both the
  * single-segment shape (dd03/dd05 minhash base: one 32-bit segment)
  * and the 4-segment shape (dd04/dd07 SimHash: segments 0..3 of one
  * logical digest) are timed. The 4-segment case is where the designs
  * diverge: `conv(substring(md5(c), 8k+1, 8), 16, 10)` shares ONE md5
  * via Spark's subexpression elimination (+1 hex encode + 4 substring/
  * conv parses), while `md5_seg32(c, k)` runs k=4 SEPARATE digests —
  * there is no common subexpression to eliminate across different seg
  * literals.
  *
  * Usage: HashAbProbe [sfDir] [multiplier]
  * (multiplier replicates the gram rows to grow the corpus — the 500k+
  * row-count reading without regenerating testdata).
  */
object HashAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashOps.register(spark)
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val grams0 = graft.ext.TextOps.charNgramRows(docs, "doc_id", "text", 5)
    val grams = (if (mult > 1)
      (1 to mult).map(_ => grams0).reduce(_ union _).repartition(32)
    else grams0).localCheckpoint(true)
    val n = grams.count()
    println(s"HASHAB rows=$n mult=$mult dir=$dir")

    def timed(what: String, reps: Int = 7)(body: => Unit): Double = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted // warmed: discard rep 0
      val med = ts(ts.length / 2)
      println(f"HASHAB $what%-18s med=${med}%.3fs all=${ts.map(t => f"$t%.2f").mkString(",")}")
      med
    }
    def drain(df: DataFrame): Unit = { df.collect(); () }

    // single-segment (minhash base shape)
    val seg1New = timed("seg1_md5seg32")(drain(grams.select(
      graft.functions.HashOps.md5Seg32(col("_el"), 0).as("_h"))
      .agg(expr("bit_xor(_h)"))))
    val seg1Conv = timed("seg1_conv")(drain(grams.select(
      conv(substring(md5(col("_el")), 1, 8), 16, 10).cast("long").as("_h"))
      .agg(expr("bit_xor(_h)"))))

    // 4-segment (SimHash shape): all four 32-bit words of the digest
    def agg4(df: DataFrame) = df.agg(expr("bit_xor(_h0)"),
      expr("bit_xor(_h1)"), expr("bit_xor(_h2)"), expr("bit_xor(_h3)"))
    val seg4New = timed("seg4_md5seg32")(drain(agg4(grams.select(
      (0 to 3).map(k => graft.functions.HashOps.md5Seg32(col("_el"), k)
        .as(s"_h$k")): _*))))
    val seg4Conv = timed("seg4_conv")(drain(agg4(grams.select(
      (0 to 3).map(k => conv(substring(md5(col("_el")), 1 + 8 * k, 8), 16, 10)
        .cast("long").as(s"_h$k")): _*))))

    println(f"HASHAB SUMMARY rows=$n seg1 new/conv=${seg1New / seg1Conv}%.2f " +
      f"seg4 new/conv=${seg4New / seg4Conv}%.2f (<1 means md5_seg32 faster)")
    spark.stop()
  }
}

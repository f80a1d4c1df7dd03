package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for dd05's cost anatomy at sf0.1: times each stage of the
  * LSH near-dup pipeline in isolation and reports the char-5-gram
  * duplicate factor (rows vs distinct (id, gram)) to size the
  * pre-aggregate-before-digest A/B the dd07 lesson suggests. */
object Dd05Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorOps.register(spark)
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    def timed(what: String)(body: => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"DD05PROBE $what: ${med}%.2fs n=${times.head._2}")
    }
    val rows = graft.ext.TextOps.charNgramRows(docs, "doc_id", "text", 5)
    def mh(src: org.apache.spark.sql.DataFrame) = {
      // same universal-hash shape as TextOps.signatures (constants
      // re-derived locally: uhA/uhB are private[ext])
      def mix(i: Int, salt: Long): Long = {
        var z = i.toLong * 0x9e3779b97f4a7c15L + salt
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val p = 2147483647L
      val ex = src.select(col("doc_id"),
        (conv(substring(md5(col("_el")), 1, 8), 16, 10).cast("long")
          .bitwiseAND(lit(Int.MaxValue.toLong))).as("_h"))
      val aggs: Seq[org.apache.spark.sql.Column] = (0 until 36).map { i =>
        val a = (mix(i, 0x51ab5f1cL) & Long.MaxValue) % (p - 1) + 1
        val b = (mix(i, 0x7e21L) & Long.MaxValue) % p
        min((col("_h") * lit(a) + lit(b)) % lit(p)).as(s"_mh$i")
      }
      ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }
    timed("gram_rows")(rows.count())
    timed("gram_rows_distinct")(rows.distinct().count())
    // bit_xor forces every md5 to evaluate (no count-over-agg folding)
    timed("gram_md5")(rows.select(
      (conv(substring(md5(col("_el")), 1, 8), 16, 10).cast("long"))
        .as("_h")).agg(expr("bit_xor(_h)")).collect().length.toLong)
    graft.functions.HashOps.register(spark)
    timed("gram_md5seg32")(rows.select(
      graft.functions.HashOps.md5Seg32(col("_el"), 0).as("_h"))
      .agg(expr("bit_xor(_h)")).collect().length.toLong)
    timed("signatures")(mh(rows).agg(expr("bit_xor(_mh0)")).collect()
      .length.toLong)
    timed("signatures_distinct")(mh(rows.distinct())
      .agg(expr("bit_xor(_mh0)")).collect().length.toLong)
    timed("collect_set")(rows.groupBy(col("doc_id"))
      .agg(collect_set(col("_el")).as("_set")).count())
    timed("candidates")(graft.ext.TextOps.lshCandidatesFromRows(
      rows, "doc_id", 36, 6, 50).count())
    timed("full_dd05") {
      graft.ext.TextOps.lshNearDupPairs(rows, "doc_id",
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 50,
        threshNum = 8, threshDen = 10).count()
    }
    spark.stop()
  }
}

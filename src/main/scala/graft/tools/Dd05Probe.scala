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
    timed("gram_rows")(rows.count())
    timed("gram_rows_distinct")(rows.distinct().count())
    timed("gram_md5")(rows.select(col("doc_id"),
      (conv(substring(md5(col("_el")), 1, 8), 16, 10).cast("long")
        .bitwiseAND(lit(Int.MaxValue.toLong))).as("_h")).agg(sum("_h")).count())
    timed("distinct_then_md5")(rows.distinct().select(col("doc_id"),
      (conv(substring(md5(col("_el")), 1, 8), 16, 10).cast("long")
        .bitwiseAND(lit(Int.MaxValue.toLong))).as("_h")).agg(sum("_h")).count())
    timed("collect_set")(rows.groupBy(col("doc_id"))
      .agg(collect_set(col("_el")).as("_set")).count())
    timed("full_dd05") {
      graft.ext.TextOps.lshNearDupPairs(rows, "doc_id",
        numHashes = 36, rowsPerBand = 6, maxBucketSize = 50,
        threshNum = 8, threshDen = 10).count()
    }
    spark.stop()
  }
}

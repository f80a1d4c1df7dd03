package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The fanOut before/after receipt (SCALING.md round 11): a corpus
  * that is physically ONE small parquet file scans as one partition,
  * so every map-side expansion+digest downstream serializes on a
  * single core. This probe times the dd05-shaped gram-digest stage
  * with and without the [[graft.ext.TextOps.fanOut]] spread, same
  * session, same expressions — the delta is the spread alone. */
object FanOutProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashOps.register(spark)
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    println(s"FANOUT scan partitions=${docs.rdd.getNumPartitions} " +
      s"parallelism=${spark.sparkContext.defaultParallelism}")
    // the raw (un-spread) charNgramRows shape: explode + substr
    def grams(src: org.apache.spark.sql.DataFrame) =
      src.select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(col("text")) - 4, lit(1))))
          .as("_i"), col("text"))
        .select(col("doc_id"), col("text").substr(col("_i"), lit(5)).as("_el"))
    def digest(src: org.apache.spark.sql.DataFrame) =
      src.select(graft.functions.HashOps.md5Seg32(col("_el"), 0).as("_h"))
        .agg(expr("bit_xor(_h)")).collect()
    def timed(what: String)(body: => Unit): Unit = {
      val ts = (0 until 6).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"FANOUT $what%-14s med=${ts(ts.length / 2)}%.2fs " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    timed("serialized")(digest(grams(docs)))
    timed("spread")(digest(grams(graft.ext.TextOps.fanOut(docs))))
    spark.stop()
  }
}

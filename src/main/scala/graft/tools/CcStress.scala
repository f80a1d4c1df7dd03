package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: connected-components engines on adversarial topology at
  * scale. A path graph of N nodes is the propagation worst case
  * (diameter N−1, far past minLabelComponents' round guard) and the
  * shape the star-contraction engine exists for — this measures the
  * contraction's ACTUAL round count and wall time at corpus-scale N.
  *
  * Usage: runMain graft.tools.CcStress [nNodes]
  */
object CcStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // path 0-1-2-…-(n-1): one component, min label 0, diameter n-1
    val path = spark.range(n - 1)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val t0 = System.nanoTime()
    val (labels, rounds) =
      graft.ext.DedupQueries.starComponentsWithRounds(path, "cc-stress")
    val wrong = labels.filter(col("lbl") =!= 0L).count()
    val total = labels.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"CCSTRESS star-contraction path n=$n rounds=$rounds " +
      f"time=$dt%.1fs labeled=$total wrong=$wrong")
    require(wrong == 0 && total == n)
    spark.stop()
  }
}

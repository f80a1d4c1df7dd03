package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: median-of-3 wall timing for named catalog queries at each
  * fixture scale — the SCALING.md tri-scale receipt in one command.
  *
  *   runMain graft.tools.TimeQueries [-s sf0.001,sf0.01,sf0.1] <name>...
  *
  * Uses the Bench session shape (local[8], shuffle=8, GraftExtensions)
  * so readings are comparable to per-query board entries at the same
  * CPU count; one warm-up run per (scale, query) before the timed
  * three. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sIdx = args.indexOf("-s")
    val scales =
      if (sIdx >= 0) args(sIdx + 1).split(",").toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1")
    val names = args.zipWithIndex.collect {
      case (a, i) if a != "-s" && (sIdx < 0 || i != sIdx + 1) => a
    }.toSeq
    require(names.nonEmpty, "usage: TimeQueries [-s scales] <query>...")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (scale <- scales; name <- names) {
      val dir = s"/root/testdata/$scale"
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = Seq.fill(3)(once()).sorted
      println(f"TIME $scale $name: median=${ts(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}

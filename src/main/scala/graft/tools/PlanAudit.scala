package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print executed-plan reuse/scan statistics (and optionally
  * the full final plan with -v) for catalog queries named on the
  * command line, after running them so AQE's final plan is visible. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    // -d <dir>: audit against a different fixture dir (e.g. a
    // /tmp/graft-headroom-* corpus) instead of the sf0.001 smoke scale
    val dirIdx = args.indexOf("-d")
    val dir = if (dirIdx >= 0) args(dirIdx + 1) else "/root/testdata/sf0.001"
    val names = args.zipWithIndex.collect {
      // guard dirIdx >= 0: with no -d flag, dirIdx + 1 == 0 would
      // silently drop the FIRST query name
      case (a, i) if a != "-v" && a != "-d" &&
        (dirIdx < 0 || i != dirIdx + 1) => a
    }.toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).size
      println(f"AUDIT $name: time=$dt%.1fs scans=${n("Scan parquet")} reusedExchange=${n("ReusedExchange")} " +
        s"smj=${n("SortMergeJoin")} bhj=${n("BroadcastHashJoin")} reusedSubquery=${n("ReusedSubquery")}")
      if (verbose) println(plan)
    }
    spark.stop()
  }
}

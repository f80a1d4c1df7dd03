package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print executed-plan reuse/scan statistics (and optionally
  * the full final plan with -v) for catalog queries named on the
  * command line, after running them so AQE's final plan is visible. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val names = args.filterNot(_ == "-v")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).size
      println(s"AUDIT $name: scans=${n("Scan parquet")} reusedExchange=${n("ReusedExchange")} " +
        s"smj=${n("SortMergeJoin")} bhj=${n("BroadcastHashJoin")} reusedSubquery=${n("ReusedSubquery")}")
      if (verbose) println(plan)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up (untimed): JIT + codegen caches + parquet footers, so the
    // first measured query isn't charged session bring-up.
    spark.range(1000000).selectExpr("count(*)", "sum(id)").collect()
    sources.Tables.names.foreach { n =>
      sources.Tables.table(spark, sfDir, n).count()
    }

    val results = SparkEntry.catalog.map { q =>
      val t0 = System.nanoTime()
      val ok = try { q.build(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // Isolation between queries: any cache/persist a query created is
      // charged to that query and must not squat on executor memory for
      // the rest of the run (outside the timed window).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (q.name, dt, ok)
    }
    // Failed queries are reported as -1 AND listed in "failed" — a throw
    // must never masquerade as a fast success.
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

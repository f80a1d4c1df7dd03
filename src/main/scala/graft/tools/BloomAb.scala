package graft.tools
import org.apache.spark.sql.SparkSession
object BloomAb {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val names = Seq("dd17_incremental_minhash", "dd03_minhash_lsh",
      "dd05_ngram_jaccard", "dd22_threshold_sweep", "tx23_cross_source_neardup",
      "dd26_embed_incremental", "tpcds_q14a", "tpcds_q72")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up
    graft.sources.Tables.names.foreach(n => graft.sources.Tables.table(spark, dir, n).count())
    for (bloom <- Seq(true, false, true, false)) {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloom.toString)
      for (name <- names) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).collect()
        // stop the clock BEFORE cache cleanup (r18, ADVICE): clearCache/
        // unpersist are inter-query isolation, not part of the query
        // under test — timing them inside the window charged cleanup
        // cost to whichever bloom setting ran the query.
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        println(f"BLOOMAB bloom=$bloom $name $dt%.2f s")
      }
    }
    spark.stop()
  }
}

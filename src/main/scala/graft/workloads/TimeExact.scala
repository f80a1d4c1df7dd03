package graft.workloads
import org.apache.spark.sql.SparkSession
object TimeExact {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.datagen.RetailData.views(spark)
    for (n <- Seq("q4", "q11", "q31", "q74"); i <- 1 to 2) {
      val sql = TpcdsOracle.exactForm(TpcdsCatalog.byName(n))
      val t0 = System.nanoTime()
      spark.sql(sql).count()
      println(f"$n run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}

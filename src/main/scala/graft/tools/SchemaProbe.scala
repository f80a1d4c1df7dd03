package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe behind TpcdsOracle.emulatedScales: prints the result type
  * Spark derives for the growth-query decimal divisions, and a tie
  * value that distinguishes the rounding mode (HALF_UP rounds the
  * exact half 5e-13 up to 1E-12; HALF_EVEN would round to 0). Run with
  * `sbt "runMain graft.tools.SchemaProbe"` after a Spark upgrade and
  * re-tune the emulated scales if the output changes. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.sql(
      """SELECT
        |  CAST(1 AS DECIMAL(26,2)) / CAST(3 AS DECIMAL(26,2)) AS q4_q11_ratio,
        |  CAST(1 AS DECIMAL(25,2)) / CAST(3 AS DECIMAL(25,2)) AS q74_ratio,
        |  CAST(0.01 AS DECIMAL(26,2)) / CAST(20000000000.00 AS DECIMAL(26,2)) AS tie
        |""".stripMargin)
    println("SCHEMA=" + df.schema.map(f => f.name + ":" + f.dataType.sql).mkString(","))
    println("VALUES=" + df.collect().head.toSeq.mkString(","))
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-process generator scan (reference
  * `P/tpcds/Tables.scala:45-65`: one dsdgen child process per
  * partition, each emitting its shard of the table). The general
  * shape: `spark.range(0, parallelism, 1, parallelism)` — one row per
  * partition — piped through a per-partition command invocation, rows
  * parsed downstream. dsdgen itself isn't shipped here; any
  * deterministic generator command slots in.
  */
object PipeSource {

  /** One `command partitionIndex numPartitions` process per partition;
    * each emitted line becomes a row in the `value` column. */
  def perPartitionProcess(spark: SparkSession, command: String,
      parallelism: Int): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .range(0, parallelism.toLong, 1, parallelism)
      .pipe(Seq("/bin/sh", "-c",
        s"""read i; $command "$$i" $parallelism"""))
      .toDF("value")
  }

  /** Pipe each partition's rows through a filter/transform command
    * (generic `rdd.pipe` surface). */
  def pipeRows(df: DataFrame, command: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("concat_ws('|', *) AS line").as[String]
      .rdd.pipe(command).toDF("value")
  }
}

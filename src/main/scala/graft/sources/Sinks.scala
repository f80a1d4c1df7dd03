package graft.sources

import org.apache.spark.sql.DataFrame

/** Table materialization surfaces (reference §1.4:
  * `P/tpcds/Tables.scala:131-170`, `P/Benchmark.scala:355-374,446-452`):
  * partitioned writes, pre-clustered (DISTRIBUTE BY) writes, bucketed
  * managed tables, single-file outputs, format-parameterized sinks.
  *
  * Partitioning/bucketing choices here are what make downstream reads
  * scale: a partition column turns date filters into directory pruning;
  * bucketing pre-shuffles join keys so co-located joins skip the
  * exchange entirely.
  */
object Sinks {

  /** Partitioned parquet: one directory per value of each partition
    * column (date_sk-style layout enabling partition pruning). */
  def partitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Pre-clustered write: repartition by the cluster column first (the
    * DataFrame form of `DISTRIBUTE BY`), so each output file holds a
    * contiguous key range — reduces downstream shuffle. */
  def clustered(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit =
    df.repartition(numFiles, df.col(clusterCol))
      .write.mode("overwrite").parquet(path)

  /** Bucketed + sorted managed table: co-located joins on the bucket
    * column skip the shuffle exchange. */
  def bucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Single-file output for small results (reference results sink,
    * `P/Benchmark.scala:446-452`). */
  def singleFile(df: DataFrame, path: String, format: String = "json"): Unit =
    df.coalesce(1).write.mode("overwrite").format(format).save(path)

  /** Format-parameterized sink (`P/tpcds/Tables.scala:164-170`). */
  def write(df: DataFrame, path: String, format: String, mode: String): Unit =
    df.write.format(format).mode(mode).save(path)
}

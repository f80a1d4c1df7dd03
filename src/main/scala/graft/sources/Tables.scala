package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's notion of a named-table registry
  * (`Benchmark.scala:292-294` `case class Table(name, data)` in
  * summerDG/spark-sql-perf) re-expressed as a plain loader: tables are
  * `DataFrame`s registered as temp views; Catalyst sees parquet scans
  * directly so filter pushdown / column pruning reach the file source.
  */
object Tables {

  /** All fixture tables, in dependency-ish order (dims first). */
  val names: Seq[String] = Seq(
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to always broadcast in a join. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** One table as a DataFrame. Plain parquet scan — no caching here, so
    * every query re-derives a fresh plan (cf. reference `Query.scala:29-31`
    * by-name `buildDataFrame`).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(path(dir, name))

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long
    * (legacy conf) and convert to a microsecond timestamp — the same
    * truncation DuckDB applies, so oracle comparisons line up.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every fixture as a temp view so SQL-text queries resolve. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}

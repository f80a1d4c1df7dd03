package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites; one JVM-wide session (Spark reuses
  * via getOrCreate), sf0.001 fixtures. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  def run(name: String) = SparkEntry.queries(name)(spark, sfDir)
}

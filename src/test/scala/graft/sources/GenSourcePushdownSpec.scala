package graft.sources

import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, AggregateFunc}
import org.scalatest.funsuite.AnyFunSuite

/** Builder-level DSv2 contract test: a limit pushed ALONGSIDE a pushed
  * aggregate applies to the aggregated output (one row), never to the
  * pre-aggregate id span. Unreachable through SQL today only because
  * EliminateLimits drops Limit above a global aggregate — this pins
  * the contract without coupling to that optimizer internal. */
class GenSourcePushdownSpec extends AnyFunSuite {

  private def agg(fs: AggregateFunc*): Aggregation =
    new Aggregation(fs.toArray, Array.empty)

  test("pushed limit does not truncate the span of a pushed complete aggregate") {
    val b = new GenScanBuilder(rows = 10000L, seed = 42L, parts = 4)
    assert(b.pushAggregation(agg(new CountStar())))
    assert(b.pushLimit(7)) // Spark may still offer the limit
    val scan = b.build()
    assert(scan.isInstanceOf[GenAggScan], s"expected agg scan, got $scan")
    // one partition, one row, COUNT(*) = full span (NOT min(n, limit))
    val factory = scan.asInstanceOf[GenAggScan].createReaderFactory()
    val parts = scan.asInstanceOf[GenAggScan].planInputPartitions()
    assert(parts.length == 1)
    val reader = factory.createReader(parts(0))
    assert(reader.next())
    assert(reader.get().getLong(0) == 10000L,
      "COUNT(*) was truncated by a co-pushed limit")
    assert(!reader.next())
  }

  test("without an aggregate, the same pushed limit still truncates the span") {
    val b = new GenScanBuilder(rows = 10000L, seed = 42L, parts = 4)
    assert(b.pushLimit(7))
    val scan = b.build()
    assert(scan.description().contains("[0, 7)"),
      s"plain limit should narrow the span: ${scan.description()}")
  }
}

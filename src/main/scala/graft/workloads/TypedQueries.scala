package graft.workloads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CatalogQuery
import graft.functions.Aggregators
import graft.sources.Tables

/** Typed `Dataset[T]` API tier (reference `P/DatasetPerformance.scala`:
  * the same pipelines expressed as Dataset lambdas, DataFrame
  * expressions, and custom Aggregators — SURVEY §2.2 typed chains,
  * §2.4/§2.10 typed aggregator/UDAF).
  *
  * The typed-lambda queries deliberately run their filters/maps through
  * deserialized case classes (what the reference benchmarks); the
  * Aggregator queries show custom aggregation on the public API with
  * map-side partial aggregation intact.
  */
object TypedQueries {

  case class Order(o_orderkey: Long, o_orderstatus: String, o_totalprice: Double)
  case class Li(l_orderkey: Long, l_quantity: Double)

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "t01_typed_filter_map",
      "Typed Dataset lambda filter chain + map (DatasetPerformance 'ds filter/map' shape)",
      (s, dir) => {
        import s.implicits._
        val ds = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .as[Li]
        ds.filter(_.l_orderkey % 100 != 0)
          .filter(_.l_orderkey % 101 != 0)
          .filter(_.l_orderkey % 102 != 0)
          .map(l => Li(l.l_orderkey, l.l_quantity + 1.0))
          .toDF()
          .agg(count(lit(1)).as("n"), Parity.dsum(col("l_quantity"), 0).as("sum_qty"))
      },
      Some(s"""SELECT count(*) AS n, ${Parity.dsumSql("l_quantity + 1.0", 0)} AS sum_qty
             |FROM lineitem
             |WHERE l_orderkey % 100 <> 0
             |  AND l_orderkey % 101 <> 0
             |  AND l_orderkey % 102 <> 0""".stripMargin)),

    CatalogQuery(
      "t02_typed_aggregator",
      "Custom typed Aggregator[IN,BUF,OUT] average via groupByKey (DatasetPerformance D:102-128 shape)",
      (s, dir) => {
        import s.implicits._
        val ds = Tables.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .as[Order]
        // Fixed-point Long buffer: per-term cents are summed exactly, so
        // the result is identical under any partitioning (matches davgSql).
        ds.groupByKey(_.o_orderstatus)
          .mapValues(_.o_totalprice)
          .agg(new Aggregators.FixedPointSumCount(2).toColumn.name("sc"))
          .toDF("o_orderstatus", "sc")
          .select(col("o_orderstatus"),
            (col("sc.sum").cast("double") / (lit(1e2) * col("sc.count")))
              .as("avg_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus, ${Parity.davgSql("o_totalprice", 2)} AS avg_price
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    CatalogQuery(
      "t03_udaf_geomean",
      "Untyped UDAF surface via functions.udaf(Aggregator): geometric mean per segment (dashboard GeometricMean parity)",
      (s, dir) => {
        val gm = udaf(Aggregators.GeometricMean)
        Tables.table(s, dir, "customer")
          .filter(col("c_acctbal") > 0)
          .groupBy(col("c_mktsegment"))
          .agg(round(gm(col("c_acctbal")), 4).as("geo_acctbal"),
            count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, round(exp(avg(ln(c_acctbal))), 4) AS geo_acctbal,
             |  count(*) AS n
             |FROM customer
             |WHERE c_acctbal > 0
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    CatalogQuery(
      "t04_typed_map_chain",
      "Typed map chain ×4 then reduce-style agg (DatasetPerformance 'ds map' shape)",
      (s, dir) => {
        import s.implicits._
        val ds = Tables.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .as[Order]
        ds.map(o => o.copy(o_totalprice = o.o_totalprice + 1.0))
          .map(o => o.copy(o_totalprice = o.o_totalprice * 2.0))
          .map(o => o.copy(o_totalprice = o.o_totalprice - 2.0))
          .map(o => o.copy(o_totalprice = o.o_totalprice / 2.0))
          .toDF()
          .agg(Parity.dsum(col("o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
      },
      // (x+1)*2-2)/2 == x exactly in IEEE754, so the oracle sums the raw column
      Some(s"""SELECT ${Parity.dsumSql("o_totalprice", 2)} AS total,
             |  count(*) AS n
             |FROM orders""".stripMargin)),
  )
}

package graft.workloads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.CatalogQuery
import graft.sources.Tables

/** Remaining scalar/aggregate/window surface from SURVEY §2 not covered
  * by the main relational catalog: percentile/median, dense_rank +
  * first(), Scala UDF registration, payload-widening projections and
  * key-type-cast joins (JoinPerformance variations), approx distinct.
  */
object MiscQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  private def sqlQuery(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "q31_percentile",
      "Exact percentile / median aggregate (dashboard percentile parity)",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            percentile_approx(col("l_quantity"), lit(0.5), lit(100000)).as("approx_median"),
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_quantity, 0.95)").as("p95_qty"))
          .select(col("l_returnflag"), col("median_qty"), col("p95_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.95) AS p95_qty
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    CatalogQuery(
      "q32_dense_rank_first",
      "dense_rank() + first() over ordered partitions (dashboard run-id pattern)",
      (s, dir) => {
        val priced = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            (round(col("o_totalprice") * 100).cast("long")).as("price_c"))
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("price_c").desc, col("o_orderkey"))
        priced
          .withColumn("rk", dense_rank().over(w).cast("long"))
          .withColumn("best_order",
            first(col("o_orderkey")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("rk") <= 2 && col("o_custkey") <= 100)
          .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("best_order"))
          .orderBy(col("o_custkey"), col("rk"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, rk, o_orderkey, best_order FROM (
             |  SELECT o_custkey, o_orderkey,
             |    CAST(dense_rank() OVER w AS BIGINT) AS rk,
             |    first(o_orderkey) OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best_order
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey
             |    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey))
             |WHERE rk <= 2 AND o_custkey <= 100
             |ORDER BY o_custkey, rk, o_orderkey""".stripMargin)),

    CatalogQuery(
      "q33_scala_udf",
      "Registered Scala UDF in a projection (dashboard normalizeVersion parity)",
      (s, dir) => {
        val normalize = udf((seg: String) => seg.toLowerCase.stripSuffix("hold"))
        t(s, dir, "customer")
          .select(col("c_custkey"), normalize(col("c_mktsegment")).as("norm_seg"))
          .groupBy(col("norm_seg"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("norm_seg"))
      },
      Some("""SELECT CASE WHEN lower(c_mktsegment) LIKE '%hold'
             |         THEN substring(lower(c_mktsegment), 1, length(c_mktsegment) - 4)
             |         ELSE lower(c_mktsegment) END AS norm_seg,
             |  count(*) AS n
             |FROM customer
             |GROUP BY 1
             |ORDER BY norm_seg""".stripMargin)),

    CatalogQuery(
      "q34_payload_widening",
      "Payload-widening projection + join (JoinPerformance 1KB-row shape, `P/JoinPerformance.scala:50-55`)",
      (s, dir) => {
        val payload = t(s, dir, "supplier")
          .select(col("s_suppkey"), lit("*" * 256).as("data256"))
        t(s, dir, "lineitem")
          .join(broadcast(payload), col("l_suppkey") === col("s_suppkey"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("data256"))).as("payload_chars"))
      },
      Some("""SELECT count(*) AS n,
             |  CAST(sum(length(data256)) AS BIGINT) AS payload_chars
             |FROM lineitem
             |JOIN (SELECT s_suppkey, repeat('*', 256) AS data256 FROM supplier) p
             |  ON l_suppkey = s_suppkey""".stripMargin)),

    CatalogQuery(
      "q35_cast_key_join",
      "Key-type-cast join variation (String-typed keys, `P/JoinPerformance.scala:57-62`)",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").cast("string").as("ok_str"), col("o_orderpriority"))
        t(s, dir, "lineitem")
          .select(col("l_orderkey").cast("string").as("lk_str"))
          .join(o, col("lk_str") === col("ok_str"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM (SELECT CAST(l_orderkey AS VARCHAR) AS lk_str FROM lineitem) l
             |JOIN (SELECT CAST(o_orderkey AS VARCHAR) AS ok_str, o_orderpriority FROM orders) o
             |  ON lk_str = ok_str
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    CatalogQuery(
      "q37_rollup_rank",
      "rank() partitioned by grouping()-derived hierarchy over ROLLUP output (TPC-DS q36/q70/q86 signature)",
      sqlQuery("""SELECT lochierarchy, n_name, o_orderstatus, total, rk FROM (
                 |  SELECT lochierarchy, n_name, o_orderstatus, total,
                 |    CAST(rank() OVER (PARTITION BY lochierarchy ORDER BY total DESC, n_name NULLS FIRST, o_orderstatus NULLS FIRST) AS BIGINT) AS rk
                 |  FROM (
                 |    SELECT CAST(grouping(n_name) + grouping(o_orderstatus) AS BIGINT) AS lochierarchy,
                 |      n_name, o_orderstatus,
                 |      CAST(sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE) / 1e2 AS total
                 |    FROM orders
                 |    JOIN customer ON o_custkey = c_custkey
                 |    JOIN nation ON c_nationkey = n_nationkey
                 |    GROUP BY ROLLUP (n_name, o_orderstatus)))
                 |WHERE rk <= 3
                 |ORDER BY lochierarchy DESC, rk, n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
      Some("""SELECT lochierarchy, n_name, o_orderstatus, total, rk FROM (
             |  SELECT lochierarchy, n_name, o_orderstatus, total,
             |    CAST(rank() OVER (PARTITION BY lochierarchy ORDER BY total DESC, n_name NULLS FIRST, o_orderstatus NULLS FIRST) AS BIGINT) AS rk
             |  FROM (
             |    SELECT CAST(grouping(n_name) + grouping(o_orderstatus) AS BIGINT) AS lochierarchy,
             |      n_name, o_orderstatus,
             |      CAST(sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE) / 1e2 AS total
             |    FROM orders
             |    JOIN customer ON o_custkey = c_custkey
             |    JOIN nation ON c_nationkey = n_nationkey
             |    GROUP BY ROLLUP (n_name, o_orderstatus)))
             |WHERE rk <= 3
             |ORDER BY lochierarchy DESC, rk, n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    CatalogQuery(
      "q38_wide_agg",
      "Multi-aggregate wide row: 12 aggregates across 8 columns in one pass (TPC-DS qSsMax signature)",
      (s, dir) => {
        // max(l_returnflag) is a STRING max: its aggregation buffer is
        // not an UnsafeRow-mutable type, so keeping it in the same agg
        // as the three count(DISTINCT)s demoted the ENTIRE operator to
        // SortAggregate — a full sort of the 4-way-Expanded stream
        // (4x|lineitem| rows x 4 keys; 7.2 s at sf0.1, r17 baseline).
        // Split the one string max into its own 1-row aggregate and
        // cross-join it back: the wide agg stays HashAggregate over the
        // Expand, the string max is a plain partial-combined scan pass,
        // and the output row is value-identical (oracle unchanged).
        val li = t(s, dir, "lineitem")
        val wide = li.agg(
          count(lit(1)).as("n"),
          count(col("l_orderkey")).as("n_ok"),
          countDistinct(col("l_orderkey")).as("d_ok"),
          countDistinct(col("l_partkey")).as("d_pk"),
          countDistinct(col("l_suppkey")).as("d_sk"),
          max(col("l_orderkey")).as("max_ok"),
          max(col("l_partkey")).as("max_pk"),
          max(col("l_linenumber")).cast("long").as("max_ln"),
          round(max(col("l_quantity")), 2).as("max_qty"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          max(col("l_shipdate")).as("max_ship"))
        val rf = li.agg(max(col("l_returnflag")).as("max_rf"))
        wide.crossJoin(rf)
          .select(col("n"), col("n_ok"), col("d_ok"), col("d_pk"),
            col("d_sk"), col("max_ok"), col("max_pk"), col("max_ln"),
            col("max_qty"), col("max_price"), col("max_rf"),
            col("max_ship"))
      },
      Some("""SELECT count(*) AS n, count(l_orderkey) AS n_ok,
             |  count(DISTINCT l_orderkey) AS d_ok,
             |  count(DISTINCT l_partkey) AS d_pk,
             |  count(DISTINCT l_suppkey) AS d_sk,
             |  max(l_orderkey) AS max_ok, max(l_partkey) AS max_pk,
             |  CAST(max(l_linenumber) AS BIGINT) AS max_ln,
             |  round(max(l_quantity), 2) AS max_qty,
             |  round(max(l_extendedprice), 2) AS max_price,
             |  max(l_returnflag) AS max_rf, max(l_shipdate) AS max_ship
             |FROM lineitem""".stripMargin)),

    CatalogQuery(
      "q39_asof_join",
      "As-of (point-in-time) join: each event gets the user's latest order at event time (union + last-ignoring-nulls window; DuckDB ASOF JOIN oracle)",
      (s, dir) => {
        val events = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"))
        val lastOrders = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("last_orderkey"))
        graft.operators.AsOfJoin.asOf(
          events, lastOrders, key = "user_id",
          leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("last_orderkey"))
          .select(col("event_id"), col("user_id"), col("last_orderkey"))
          .orderBy(col("event_id"))
      },
      Some("""WITH r AS (
             |  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS last_orderkey
             |  FROM orders GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, r.last_orderkey
             |FROM events e
             |ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
             |ORDER BY e.event_id""".stripMargin)),

    CatalogQuery(
      "q36_approx_distinct",
      "HLL-sketch approx_count_distinct alongside exact (sketch family baseline)",
      (s, dir) => {
        // The sketch aggregates in its OWN ungrouped pass (r17): fused
        // with count(DISTINCT), Spark's single-distinct rewrite keys the
        // partial aggregate by l_partkey, materializing the rsd=0.01
        // HLL buffer (1536 longs) PER GROUP — ~200k x 12 KB of
        // aggregation buffer churned to merge sketches of single
        // values (plans/r17/q36_approx_distinct_before.txt). Split,
        // each pass keeps its natural shape (distinct two-phase;
        // one sketch buffer per task), and the joined 1-row output is
        // bit-identical — same sketch algorithm, same rsd, same data.
        val li = t(s, dir, "lineitem")
        val exact = li.agg(
          countDistinct(col("l_partkey")).as("exact_parts"))
        val approx = li.agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
        exact.crossJoin(approx)
          .select(col("exact_parts"),
            // approx value is engine-specific; assert sane bounds and
            // emit the exact value for the oracle comparison
            (col("approx_parts") >= col("exact_parts") * 0.9 &&
              col("approx_parts") <= col("exact_parts") * 1.1).as("approx_within_10pct"),
            col("exact_parts").as("n"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
             |  true AS approx_within_10pct,
             |  count(DISTINCT l_partkey) AS n
             |FROM lineitem""".stripMargin)),

    CatalogQuery(
      "q40_or_ranges",
      "Disjunctive partition-key predicate: chained OR of date ranges (the reference's OR-between partition filter pattern)",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate").between("1993-01-01", "1993-03-31") ||
            col("l_shipdate").between("1994-06-01", "1994-08-31") ||
            col("l_shipdate").between("1996-01-01", "1996-02-29"))
          .groupBy(year(col("l_shipdate")).cast("int").as("ship_year"))
          .agg(count(lit(1)).as("n"),
            Parity.dsum(col("l_quantity"), 2).as("sum_qty"))
          .orderBy(col("ship_year"))
      },
      Some(s"""SELECT CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS n,
             |  ${Parity.dsumSql("l_quantity", 2)} AS sum_qty
             |FROM lineitem
             |WHERE l_shipdate BETWEEN '1993-01-01' AND '1993-03-31'
             |   OR l_shipdate BETWEEN '1994-06-01' AND '1994-08-31'
             |   OR l_shipdate BETWEEN '1996-01-01' AND '1996-02-29'
             |GROUP BY 1
             |ORDER BY ship_year""".stripMargin)),

    CatalogQuery(
      "q41_range_join",
      "Pure range (point-in-interval) join via bin bucketing: orders against month-start audit windows — no equi key exists, the bin id supplies the hash-join key",
      (s, dir) => {
        val o = t(s, dir, "orders")
        // ~84 10-day audit windows, one per distinct order month; the
        // interval relation is DERIVED so the query stays pure-range
        // (a real deployment joins a points fact to an interval dim of
        // any size — RangeJoinSpec asserts the no-broadcast plan shape)
        val win = o
          .select(date_trunc("month", col("o_orderdate")).as("w_start"))
          .distinct()
          .withColumn("w_end", col("w_start") + expr("INTERVAL 9 DAYS"))
        val pts = o.select(col("o_orderdate"), col("o_totalprice"))
        graft.operators.RangeJoin
          .pointInInterval(pts, win, "o_orderdate", "w_start", "w_end",
            binWidth = 7L * 86400) // 7-day bins vs 9-day intervals
          .groupBy(col("w_start"))
          .agg(count(lit(1)).as("n_orders"),
            Parity.dsum(col("o_totalprice"), 2).as("sum_price"))
          .orderBy(col("w_start"))
      },
      Some(s"""WITH win AS (
             |  SELECT DISTINCT date_trunc('month', o_orderdate) AS w_start
             |  FROM orders),
             |w2 AS (SELECT w_start, w_start + INTERVAL 9 DAY AS w_end FROM win)
             |SELECT w_start, count(*) AS n_orders,
             |  ${Parity.dsumSql("o_totalprice", 2)} AS sum_price
             |FROM orders JOIN w2 ON o_orderdate BETWEEN w_start AND w_end
             |GROUP BY w_start
             |ORDER BY w_start""".stripMargin)),
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query in the engine's catalog.
  *
  * Mirrors the reference's `Query(name, buildDataFrame, description,
  * sqlText, executionMode)` (summerDG/spark-sql-perf `Query.scala:29-35`)
  * with the addition of an ANSI-SQL oracle used by the driver's DuckDB
  * correctness gate.
  *
  * Conventions (driver compare hashes values after sorting columns by
  * name, so both sides must agree exactly):
  *   - every floating-point output column is `round(x, n)` on BOTH sides;
  *   - every integer output column is cast to BIGINT on BOTH sides
  *     (DuckDB widens int sums to HUGEINT, Spark to LONG);
  *   - every query has a fully deterministic ORDER BY (ties broken by a
  *     key column); DuckDB defaults to NULLS LAST on ASC where Spark
  *     defaults to NULLS FIRST, so oracles spell out NULLS FIRST.
  *
  * @param build  by-name-ish builder: fresh plan per invocation
  *               (cf. reference `Query.scala:29-31`).
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None for ops not expressible in SQL (driver then runs a
  *               weaker rows-only check).
  */
final case class CatalogQuery(
    name: String,
    description: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

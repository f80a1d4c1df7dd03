package graft.workloads

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric parity helpers.
  *
  * Floating-point SUM is order-dependent, and Spark (BigDecimal HALF_UP)
  * and DuckDB (scaled-double) also round differently when a value sits
  * exactly on a rounding boundary — which 2-decimal money columns hit
  * constantly (e.g. avg = .91375). The driver's correctness gate hashes
  * values, so results must be bit-identical.
  *
  * Fix: fixed-point arithmetic. Scale each term to integer units
  * (exact: terms are within ~1e-4 of an integer after scaling), sum as
  * BIGINT — exact and ordering/partitioning-independent — then apply
  * the *same* float ops on both sides. Oracle SQL mirrors:
  *   CAST(sum(CAST(round(x * 1eS) AS BIGINT)) AS DOUBLE) / 1eS
  *
  * This is also the at-scale answer: integer partial aggregation is
  * deterministic under any shuffle/AQE re-plan, so checksum-based
  * regression comparison stays stable on a 1000-executor cluster.
  *
  * Scale choice: the smallest S where the true value is exact —
  * 2 for raw money columns, 4 for 2-factor products (price*(1-disc)),
  * 6 for 3-factor products. int64 overflows only past ~9e18/1e11 ≈
  * 8e7 rows/group at S=6.
  */
object Parity {

  /** Exact decimal sum of a column whose true values have ≤ `scale`
    * decimals: returns sum as double, bit-identical across engines. */
  def dsum(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")).cast("double") / lit(f)
  }

  /** Exact-decimal average: exact integer sum, single float division. */
  def davg(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")).cast("double") / (lit(f) * count(c))
  }

  /** Oracle-side SQL fragment for dsum. */
  def dsumSql(expr: String, scale: Int): String =
    s"CAST(sum(CAST(round(($expr) * 1e$scale) AS BIGINT)) AS DOUBLE) / 1e$scale"

  /** Oracle-side SQL fragment for davg. */
  def davgSql(expr: String, scale: Int): String =
    s"CAST(sum(CAST(round(($expr) * 1e$scale) AS BIGINT)) AS DOUBLE) / (1e$scale * count($expr))"
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range join: every left row carrying a point joins to
  * every right row whose `[lo, hi]` interval contains it (inclusive
  * ends, plus optional equi-keys).
  *
  * The reference has no range/interval join at all (SURVEY §2.3: range
  * predicates appear only as post-join filters); Spark plans a bare
  * `p BETWEEN lo AND hi` join condition as
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, and a plain
  * shuffle is impossible because no equality exists to hash on. The
  * production fix (the standard bin/bucket range-join optimization) is
  * to pick a bin width `w`, replicate each interval into every bin it
  * overlaps (`len/w + 1` copies), tag each point with its single bin,
  * equi-join on the bin id, and re-check the exact containment
  * predicate. Each (point, interval) pair meets in exactly ONE bin —
  * the point's — so no dedup pass is needed. Cost: one hash shuffle of
  * |L| + |R|·(avgLen/w + 1) rows, whole-stage-codegen'd, AQE-skew
  * splittable; the nested loop disappears. At 100 TB this is the
  * difference between a shuffle join and a plan that never finishes.
  *
  * Inputs: `point`, `lo`, `hi` name columns castable to BIGINT on a
  * shared scale (integers, or timestamps — Spark casts those to epoch
  * seconds); the exact predicate compares the ORIGINAL column values,
  * the cast is only for binning. Pick `binWidth` (in those units) near
  * the typical interval length: much smaller multiplies interval
  * copies, much larger degrades bin selectivity toward a within-bin
  * nested loop.
  */
object RangeJoin {

  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      point: String,
      lo: String,
      hi: String,
      binWidth: Long,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = (left.columns.toSet & right.columns.toSet) -- equiKeys
    require(clash.isEmpty, s"ambiguous non-key columns on both sides: $clash")

    // floor-division bin id, exact over the full BIGINT range: subtract
    // the (always non-negative) pmod first, then `div` — the quotient is
    // exact, so truncating and flooring division agree; no double math.
    def bin(c: String): Column = {
      val v = s"CAST($c AS BIGINT)"
      expr(s"($v - pmod($v, ${binWidth}L)) div ${binWidth}L")
    }

    val lBinned = left.withColumn("_rj_bin", bin(point))
    val rBinned = right.withColumn(
      "_rj_bin", explode(sequence(bin(lo), bin(hi))))
    lBinned
      .join(rBinned, equiKeys :+ "_rj_bin", "inner")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_rj_bin")
  }
}

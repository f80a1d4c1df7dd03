package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-pattern counting over any (src, tgt) edge DataFrame —
  * shared by the fixture-derived graph workload and SNAP-parsed
  * ego-network inputs.
  *
  * Where a pattern is acyclic and only counted, the count is an
  * aggregation of per-node degree products (O(V) after an O(E)
  * map-side-combined pass) instead of a path-materializing chain
  * join; cyclic patterns keep the genuine multi-way join.
  */
object GraphPatterns {

  private def degrees(e: DataFrame): (DataFrame, DataFrame) = (
    e.groupBy(col("src")).agg(count(lit(1)).as("outd")),
    e.groupBy(col("tgt")).agg(count(lit(1)).as("ind")))

  /** #{(a,b) : a.tgt = b.src} = Σ_v indeg(v)·outdeg(v). */
  def chainCount(edges: DataFrame): Long = {
    val (out, in) = degrees(edges)
    in.join(out, col("tgt") === col("src"))
      .agg(coalesce(sum(col("ind") * col("outd")), lit(0L)))
      .head().getLong(0)
  }

  /** #{(a,b,c) : a.tgt = b.src = c.src} = Σ_v indeg(v)·outdeg(v)². */
  def starCount(edges: DataFrame): Long = {
    val (out, in) = degrees(edges)
    in.join(out, col("tgt") === col("src"))
      .agg(coalesce(sum(col("ind") * col("outd") * col("outd")), lit(0L)))
      .head().getLong(0)
  }

  /** Ordered out-wedges: Σ outdeg² − |E| (distinct edges assumed). */
  def wedgeCount(edges: DataFrame): Long = {
    val out = edges.groupBy(col("src")).agg(count(lit(1)).as("outd"))
    val ss = out.agg(coalesce(sum(col("outd") * col("outd")), lit(0L))).head().getLong(0)
    ss - edges.count()
  }

  /** Directed closed triangles via the genuine 3-way self-join. */
  def triangleCount(edges: DataFrame): Long = {
    val a = edges.as("a"); val b = edges.as("b"); val c = edges.as("c")
    a.join(b, col("a.tgt") === col("b.src"))
      .join(c, col("b.tgt") === col("c.src") && col("c.tgt") === col("a.src"))
      .count()
  }
}

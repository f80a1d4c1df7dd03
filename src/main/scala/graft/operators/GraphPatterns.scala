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

  /** Bounded k-core peel: symmetrize the directed edge set (self-loops
    * dropped), then `rounds` times keep only nodes whose CURRENT
    * undirected degree is >= k and the edges between them. Returns the
    * surviving symmetric edge set (a, b). Bounded rounds, not a
    * fixpoint — a fixpoint caller loops with its own convergence check
    * and lineage checkpoints (cf. dd16's star contraction); per round
    * the cost is one map-combined O(E) aggregate plus two endpoint
    * semi-joins, each hashed on its key — the shape that survives a
    * 100 TB edge set. */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kcorePeelTrace(edges, k, rounds).last

  /** The surviving symmetric edge set after EACH round, index r-1 =
    * after r rounds — the peeling profile g09 reports. Every round is
    * localCheckpoint'd: each round reads the previous edge set TWICE
    * (degree agg + semi-join probe), so lazy lineage would re-evaluate
    * the whole prefix 2^rounds times (measured: 37.7 s vs 2.3 s for
    * the 4-round catalog entry at sf0.1) — the same fix dd16's
    * star-contraction loop uses. */
  def kcorePeelTrace(edges: DataFrame, k: Int, rounds: Int): Seq[DataFrame] = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1, got ($k, $rounds)")
    val e = edges.filter(col("src") =!= col("tgt"))
    val sym = e.select(col("src").as("a"), col("tgt").as("b"))
      .union(e.select(col("tgt").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint(true)
    (1 to rounds).scanLeft(sym) { (cur, _) =>
      val keep = cur.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("a")
      cur.join(keep, Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
        .localCheckpoint(true)
    }.tail
  }
}

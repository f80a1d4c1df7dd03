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

  /** DOULION-style sampled triangle estimate (Tsourakakis, Kang,
    * Miller & Faloutsos, KDD 2009): keep each edge iff an md5-derived
    * hash of the edge is 0 mod `m` (a deterministic 1/m Bernoulli
    * surrogate), count directed triangles EXACTLY on the sampled
    * graph, scale by m³. A triangle survives iff all 3 edges do
    * (probability 1/m³), so the scaled count is unbiased under random
    * sampling; the hash coin makes both engines — and reruns — sample
    * identically, which is what lets a DuckDB oracle value-check the
    * estimator itself. m = 1 keeps every edge and degenerates to the
    * exact count ([[triangleCount]]'s semantics).
    *
    * Scale shape: sampling cuts shuffle volume 1/m per edge and join
    * fanout 1/m² per wedge before the 3-way join ever runs — the
    * petabyte path for cyclic counting, with the exact forms (g03
    * catalog entry, HypercubeJoin g08) as calibration baselines, the
    * same estimate-vs-exact pairing as tx22-vs-tx21. Relative stderr
    * ≈ √((m³−1)/T) for T triangles (edge-sharing covariance adds a
    * lower-order term) — tight once T ≫ m³.
    *
    * Returns one row: (n_sampled, est_triangles). */
  def sampledTriangles(edges: DataFrame, m: Int): DataFrame = {
    require(m >= 1, s"sample modulus must be >= 1, got $m")
    graft.functions.HashOps.register(edges.sparkSession)
    val se =
      if (m == 1) edges
      else edges.filter(pmod(graft.functions.HashOps.md5Seg32(
        concat(col("src").cast("string"), lit("_"), col("tgt").cast("string")),
        0), lit(m.toLong)) === 0)
    val a = se.as("a"); val b = se.as("b"); val c = se.as("c")
    a.join(b, col("a.tgt") === col("b.src"))
      .join(c, col("b.tgt") === col("c.src") && col("c.tgt") === col("a.src"))
      .agg(count(lit(1)).as("n_sampled"),
        (count(lit(1)) * lit(m.toLong * m * m)).as("est_triangles"))
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

  /** Bounded breadth-first reachability: min-hop distance from a seed
    * set, `rounds` hops out, over the symmetrized edge set (self-loops
    * dropped). Returns (v, hops) for every node within `rounds` of a
    * seed (seeds at hops 0). Bounded rounds, not a fixpoint, for the
    * k-core/dd18 reason: a fixed unrolled depth is what a DuckDB
    * oracle mirrors exactly. Per round: one hashed join of the edge
    * set against the FRONTIER only (not the whole reached set) + one
    * anti-join dedup — the textbook distributed BFS. ONE checkpoint
    * per round (r18): the round's reached∪next union materializes
    * once and the next frontier is a hops==r FILTER of that
    * checkpointed frame — the old shape checkpointed `next` AND the
    * union separately, a second block-manager copy of the frontier
    * per hop for no reader that needed it. */
  def boundedReach(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"bounded reach wants 1..16 rounds, got $rounds")
    val e = edges.filter(col("src") =!= col("tgt"))
    val sym = e.select(col("src").as("a"), col("tgt").as("b"))
      .union(e.select(col("tgt").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint(true)
    var reached = seeds.select(col("v"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = reached.select(col("v"))
    for (r <- 1 to rounds) {
      val next = sym.join(frontier.withColumnRenamed("v", "a"), Seq("a"))
        .select(col("b").as("v")).distinct()
        .join(reached, Seq("v"), "left_anti")
        .select(col("v"), lit(r.toLong).as("hops"))
      reached = reached.unionByName(next).localCheckpoint(true)
      frontier = reached.filter(col("hops") === r).select(col("v"))
    }
    reached
  }

  /** Common-neighbor link prediction (triangle closing): every
    * non-adjacent node pair reachable through a wedge, scored by how
    * many neighbors it shares, top `k` by (score desc, u, v).
    *
    * Scale shape: wedge fanout is Σ deg(center)² — quadratic in hub
    * degree — so centers above `degCap` are EXCLUDED from serving as
    * the wedge middle (the mm08/mm04 flood-guard pattern; a hub's
    * wedges are also the weakest prediction signal, every pair of its
    * neighbors "shares" it). Per surviving center the fanout is
    * <= degCap², the pair count map-combines, the existing-edge
    * exclusion is one hashed anti-join, and the top-k is a bounded
    * TakeOrdered — never a global sort of the candidate set. */
  def commonNeighborLinks(edges: DataFrame, degCap: Int, k: Int): DataFrame = {
    require(degCap >= 1 && k >= 1,
      s"need degCap >= 1 and k >= 1, got ($degCap, $k)")
    val e = edges.filter(col("src") =!= col("tgt"))
    val sym = e.select(col("src").as("a"), col("tgt").as("b"))
      .union(e.select(col("tgt").as("a"), col("src").as("b")))
      .distinct()
      // read three times below (centers, wedges, exclusion) — same
      // re-derivation economics as the peel rounds above
      .localCheckpoint(true)
    val okCenter = sym.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= degCap).select(col("a").as("c"))
    val spokes = sym.select(col("b").as("c"), col("a").as("u"))
      .join(okCenter, "c")
    val cand = spokes.as("x").join(spokes.as("y"),
        col("x.c") === col("y.c") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("u"), col("y.u").as("v"))
      .agg(count(lit(1)).as("common_neighbors"))
    cand.join(sym, cand("u") === sym("a") && cand("v") === sym("b"),
        "left_anti")
      .orderBy(col("common_neighbors").desc, col("u"), col("v"))
      .limit(k)
  }
}

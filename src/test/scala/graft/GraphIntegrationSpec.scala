package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.GraphPatterns
import graft.sources.TextSources

/** End-to-end: SNAP ego-net files → parser → pattern counts, checked
  * against hand-computed ground truth on a tiny graph. */
class GraphIntegrationSpec extends SparkSpec {

  test("SNAP files drive the pattern counters with exact counts") {
    val dir = Files.createTempDirectory("graft-snapg").toFile
    // ego 0 with one 2-token line: edges (0,1),(0,2),(1,2)
    Files.writeString(new java.io.File(dir, "0.edges").toPath, "1 2\n")
    val edges = TextSources.snapEgoNet(spark, dir.getAbsolutePath)
      .toDF("src", "tgt").distinct()

    // chains (a.tgt=b.src): (0,1)->(1,2) = 1
    assert(GraphPatterns.chainCount(edges) == 1L)
    // stars (a.tgt = b.src = c.src): hub 1 has indeg 1, outdeg 1 -> 1
    assert(GraphPatterns.starCount(edges) == 1L)
    // wedges: out(0)=2 -> 4; out(1)=1 -> 1; total 5 - E(3) = 2
    assert(GraphPatterns.wedgeCount(edges) == 2L)
    // no directed cycle in {(0,1),(0,2),(1,2)}
    assert(GraphPatterns.triangleCount(edges) == 0L)

    // add the closing edge (2,0): one directed triangle, counted once
    // per rotation = 3
    Files.writeString(new java.io.File(dir, "5.edges").toPath, "")
    val withCycle = edges.union(
      spark.createDataFrame(Seq((2L, 0L))).toDF("src", "tgt"))
    assert(GraphPatterns.triangleCount(withCycle) == 3L)
  }

  test("kcorePeel: clique survives, pendant chain peels round 1, near-core node peels round 2") {
    import spark.implicits._
    // 6-clique {0..5} (undirected degree 5 each) + pendant chain
    // 5->6->7->8 + near-core node 10 wired to 0,1,2,3 and chain node 6:
    // round 1 removes {6,7,8} (deg 3/2/1); that drops node 10 to deg 4,
    // so round 2 removes it; rounds 3-4 are stable at the clique.
    // Self-loop and a reversed duplicate must not change anything.
    val clique = for (i <- 0 to 5; j <- 0 to 5 if i < j) yield (i.toLong, j.toLong)
    val extra = Seq((5L, 6L), (6L, 7L), (7L, 8L),
      (10L, 0L), (10L, 1L), (10L, 2L), (10L, 3L), (6L, 10L),
      (3L, 3L), (1L, 0L)) // self-loop + reversed dup
    val edges = (clique ++ extra).toDF("src", "tgt")
    val after1 = GraphPatterns.kcorePeel(edges, 5, 1)
    assert(after1.select("a").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L))
    val after4 = GraphPatterns.kcorePeel(edges, 5, 4)
    val got = after4.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (i <- 0 to 5; j <- 0 to 5 if i != j) yield (i.toLong, j.toLong)).toSet
    assert(got == want)
  }

  test("degree-product counts equal naive join counts on a generated graph") {
    val edges = graft.datagen.Generators.randomEdges(spark, 200, 2000)
      .toDF("src", "tgt").distinct().cache()
    val naiveChain = edges.as("a").join(edges.as("b"), col("a.tgt") === col("b.src")).count()
    assert(GraphPatterns.chainCount(edges) == naiveChain)
    val naiveWedge = edges.as("a").join(edges.as("b"),
      col("a.src") === col("b.src") && col("a.tgt") =!= col("b.tgt")).count()
    assert(GraphPatterns.wedgeCount(edges) == naiveWedge)
  }

  test("sampledTriangles: m=1 is exact; m=4 scales its own sample by 64; estimate calibrates against exact") {
    import spark.implicits._
    // m=1 keeps every edge: the estimator degenerates to the exact
    // count (the cycle graph from the SNAP test: 3 rotations)
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "tgt")
    val exact1 = GraphPatterns.sampledTriangles(tri, 1).head()
    assert((exact1.getLong(0), exact1.getLong(1)) == ((3L, 3L)))

    // pipeline parity at m=4: n_sampled equals the exact count over a
    // HAND-sampled edge set using the same md5 coin, and est is
    // exactly 64x that — pins the predicate and the scaling arithmetic
    val edges = graft.datagen.Generators.randomEdges(spark, 200, 2000)
      .toDF("src", "tgt").distinct().cache()
    graft.functions.HashOps.register(spark)
    val hand = edges.filter(pmod(graft.functions.HashOps.md5Seg32(
      concat(col("src").cast("string"), lit("_"), col("tgt").cast("string")),
      0), lit(4L)) === 0)
    val handCount = GraphPatterns.triangleCount(hand)
    val got = GraphPatterns.sampledTriangles(edges, 4).head()
    assert(got.getLong(0) == handCount, s"sample drift: ${got.getLong(0)} vs $handCount")
    assert(got.getLong(1) == handCount * 64)

    // calibration: the estimate tracks the exact count (T ~ 1000 here,
    // so relative stderr ~ sqrt(63/T) ~ 0.25; a 2.5x band is ~6 sigma
    // and the md5 sample is deterministic anyway)
    val exact = GraphPatterns.triangleCount(edges)
    assert(exact > 100, s"fixture too sparse for calibration: $exact")
    val est = got.getLong(1).toDouble
    assert(est > exact / 2.5 && est < exact * 2.5,
      s"estimate $est vs exact $exact outside the calibration band")
  }

  test("g07 pagerank: damping floor, decaying total mass, deterministic") {
    val run = () => SparkEntry.queries("g07_pagerank")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = run()
    assert(got.nonEmpty)
    // every node keeps at least the damping floor 0.15
    assert(got.forall(_._2 >= 150000L), s"below damping floor: " +
      got.filter(_._2 < 150000L).take(5).toSeq)
    // dangling-node leakage only DECAYS total mass (never creates it)
    val n = got.length.toLong
    assert(got.map(_._2).sum <= n * 1000000L,
      "total rank mass exceeds the initial distribution")
    // integer fixed-point arithmetic: bitwise reproducible run-to-run
    assert(run().toSeq == got.toSeq, "g07 not deterministic")
  }

  test("boundedReach: min-hop on a diamond, frontier stops at the round bound, reverse edges reach") {
    import spark.implicits._
    // path 0-1-2-3-4-5 plus diamond 0-1 / 0-2' / 1-3' / 2'-3' checks
    // min-hop (3' at 2 hops, not 3); edge 10 -> 0 is DIRECTED toward
    // the seed, so 10 must still be reached (symmetrized)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (0L, 20L), (1L, 30L), (20L, 30L), (10L, 0L)).toDF("src", "tgt")
    val seeds = Seq(0L).toDF("v")
    val got = GraphPatterns.boundedReach(edges, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 20L -> 1L, 10L -> 1L,
      2L -> 2L, 30L -> 2L, 3L -> 3L), s"got $got")
    // nodes 4, 5 are 4+ hops out: absent at rounds = 3, present at 5
    val deeper = GraphPatterns.boundedReach(edges, seeds, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deeper(4L) == 4L && deeper(5L) == 5L, s"got $deeper")
  }

  test("commonNeighborLinks: path closes, square diagonals score 2, existing edges excluded, hub centers voteless") {
    import spark.implicits._
    // path 1-2-3: predict (1,3) via center 2. square 10-11-12-13-10:
    // predict both diagonals (10,12) and (11,13) with TWO common
    // neighbors each. triangle 20-21-22: fully adjacent — nothing
    // predicted. hub 30 adjacent to 31..40 (degree 10 > cap 5): its
    // wedges are excluded, so no (31..40) pair appears.
    val edges = (Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (20L, 21L), (21L, 22L), (22L, 20L)) ++
      (31L to 40L).map((30L, _))).toDF("src", "tgt")
    val got = GraphPatterns.commonNeighborLinks(edges, degCap = 5, k = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == Map((10L, 12L) -> 2L, (11L, 13L) -> 2L, (1L, 3L) -> 1L),
      s"got $got")
    // raising the cap re-admits the hub's wedges: all 45 pairs of its
    // spokes (plus the three above) now predict through center 30
    val uncapped = GraphPatterns
      .commonNeighborLinks(edges, degCap = 100, k = 100).count()
    assert(uncapped == 45 + 3, s"got $uncapped")
    // top-k is deterministic under ties: k=2 keeps the two score-2
    // diagonals, ordered (u, v)
    val top2 = GraphPatterns.commonNeighborLinks(edges, degCap = 5, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top2 == Seq((10L, 12L), (11L, 13L)), s"got $top2")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join composition vs a brute-force correlated definition. */
class AsOfSpec extends SparkSpec {

  test("as-of join attaches the latest right row at or before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 5L, "e0"),
      (2L, 50L, "e3"), (3L, 7L, "e4")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 49L, "r49"),
      (2L, 51L, "r51")).toDF("k", "rt", "rv")
    val got = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("rv"))
      .select("k", "t", "ev", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3))))
      .toSet
    assert(got == Set(
      (1L, 10L, "e1", Some("r10")),  // inclusive <=
      (1L, 25L, "e2", Some("r20")),
      (1L, 5L, "e0", None),          // nothing at or before
      (2L, 50L, "e3", Some("r49")),  // ignores later r51
      (3L, 7L, "e4", None)))         // key absent on right
  }

  test("ss03 IVF ANN overlaps substantially with exact top-5") {
    val exact = run("ss01_ann_bruteforce").select("q_id", "neighbor_id")
    val ivf = run("ss03_ann_ivf").select("q_id", "neighbor_id")
    val nExact = exact.count()
    val overlap = exact.join(ivf, Seq("q_id", "neighbor_id"), "left_semi").count()
    // 4-of-16 probes on near-random vectors: expect meaningful recall
    assert(nExact == 50)
    assert(overlap >= 10, s"IVF recall too low: $overlap/$nExact")
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HypercubeJoin
import graft.operators.HypercubeJoin.Rel

/** Hypercube-vs-binary skew A/B (SCALING.md round 11): triangle count
  * on a HUB graph — one vertex h with K in-edges and K out-edges plus
  * a ring closure, so the binary plan's first join (a.tgt = b.src)
  * concentrates K² intermediate rows on the single key h, while the
  * hypercube splits that work across the other two attributes' cells.
  *
  * Usage: HypercubeStress [K] [P]  (default K=2000, P=27)
  */
object HypercubeStress {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 2000
    val p = if (args.length > 1) args(1).toInt else 27
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // the reference's own multi-join experiment config
      // (AUTO_BROADCASTJOIN_THRESHOLD=-1, RunBenchmark.scala:110):
      // with broadcast on, a tiny edge table broadcast-joins and no
      // shuffle key ever concentrates — the regime hypercube targets
      // is the SHUFFLE join a 100 TB edge table forces
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val h = 1000000L
    // K spokes in, K spokes out, ring closure z->x so every (x, h, z)
    // with z = x + k forms a triangle x->h->z->x; plus background edges
    val edges = spark.range(k).select(col("id").as("x"))
      .select(col("x"), lit(h).as("hub"))
      .select(col("x").as("src"), col("hub").as("tgt"))
      .union(spark.range(k).select(lit(h).as("src"), (col("id") + k).as("tgt")))
      .union(spark.range(k).select((col("id") + k).as("src"), col("id").as("tgt")))
      .localCheckpoint(true)
    println(s"HCSTRESS edges=${edges.count()} hub_in=$k hub_out=$k")

    def timed(what: String)(body: => Long): Unit = {
      val ts = (0 until 4).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }.drop(1)
      val med = ts.map(_._1).sorted.apply(ts.size / 2)
      println(f"HCSTRESS $what%-10s med=${med}%.2fs n=${ts.head._2} " +
        f"all=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    def binary(): Long = {
      val a = edges.as("a"); val b = edges.as("b"); val c = edges.as("c")
      a.join(b, col("a.tgt") === col("b.src"))
        .join(c, col("b.tgt") === col("c.src") && col("c.tgt") === col("a.src"))
        .count()
    }
    def cube(): Long = {
      val rels = Seq(
        Rel(edges.select(col("src").as("x"), col("tgt").as("y")), Seq("x", "y")),
        Rel(edges.select(col("src").as("y"), col("tgt").as("z")), Seq("y", "z")),
        Rel(edges.select(col("src").as("z"), col("tgt").as("x")), Seq("z", "x")))
      HypercubeJoin.join(rels,
        HypercubeJoin.shares(rels.map(r => (r.attrs, 1.0)), p)).count()
    }
    def cubeLocal(): Long = {
      val rels = Seq(
        Rel(edges.select(col("src").as("x"), col("tgt").as("y")), Seq("x", "y")),
        Rel(edges.select(col("src").as("y"), col("tgt").as("z")), Seq("y", "z")),
        Rel(edges.select(col("src").as("z"), col("tgt").as("x")), Seq("z", "x")))
      HypercubeJoin.joinLocal(rels,
        HypercubeJoin.shares(rels.map(r => (r.attrs, 1.0)), p)).count()
    }
    def cubePlanned(): Long = {
      spark.experimental.extraStrategies = Seq(graft.plans.HypercubeStrategy)
      val rels = Seq(
        Rel(edges.select(col("src").as("x"), col("tgt").as("y")), Seq("x", "y")),
        Rel(edges.select(col("src").as("y"), col("tgt").as("z")), Seq("y", "z")),
        Rel(edges.select(col("src").as("z"), col("tgt").as("x")), Seq("z", "x")))
      HypercubeJoin.joinPlanned(rels,
        HypercubeJoin.shares(rels.map(r => (r.attrs, 1.0)), p)).count()
    }
    timed("binary")(binary())
    timed("hypercube")(cube())
    timed("cube_local")(cubeLocal())
    timed("cube_planned")(cubePlanned())
    // and with AQE's skew mitigation off, the undiluted comparison
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed("binary_noskewfix")(binary())
    timed("cube_noskewfix")(cube())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B the two skew-join remedies the engine offers — manual
  * salting ([[graft.operators.SkewOps.saltedJoin]]) vs AQE's runtime
  * skew-partition splitting — on a planted hub-key join.
  *
  * Usage: runMain graft.tools.SkewJoinAb [nLarge] [hotPct]
  *        (defaults 20,000,000 rows, 30% on ONE hot key)
  *
  * Workload: `large` (nLarge rows, hotPct% sharing key 0, the rest
  * uniform over 1M keys) ⋈ `small` (1M keys) with broadcast DISABLED,
  * so every arm pays a real shuffle join — the shape where one reducer
  * owns the hub key and becomes the straggler. Four arms:
  *
  *   baseline   — AQE skew splitting OFF, plain join (the straggler)
  *   aqe        — AQE skew splitting ON (thresholds lowered so the
  *                hub partition qualifies at harness scale; production
  *                defaults are 256 MB / 5× median)
  *   salted     — SkewOps.saltedJoin 8-way, AQE skew OFF
  *   salted+aqe — both (do they compose or fight?)
  *
  * Every arm must produce the IDENTICAL aggregate (checked) — the arms
  * differ only in wall time and plan shape. `skew=true` in the final
  * adaptive plan confirms AQE's splitter actually fired rather than
  * the arm merely being permitted to use it. Findings land in
  * SCALING.md (round 13). */
object SkewJoinAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotPct = args.lift(1).map(_.toInt).getOrElse(30)
    val nKeys = 1000000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val large = spark.range(n).select(
      when(pmod(col("id"), lit(100)) < hotPct, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("key"),
      col("id").as("payload"))
    val small = spark.range(nKeys).select(col("id").as("key"),
      (col("id") * 7).as("attr"))

    def arm(aqeSkew: Boolean, salted: Boolean): (Double, Long, Boolean) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      // lower the qualify thresholds so the hub partition triggers the
      // splitter: BOTH gates must pass — bytes (default 256 MB) and
      // factor-over-median (default 5×; the hub partition here is only
      // ~4.4× the median at hotPct=30, so the default silently never
      // fires — aqe_skew_fired catches exactly that)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      def once(): (Double, Long, Boolean) = {
        val joined =
          if (salted) graft.operators.SkewOps.saltedJoin(large, small, "key", 8)
          else large.join(small, Seq("key"))
        val agg = joined.agg(sum(col("payload") + col("attr")).as("s"))
        val t0 = System.nanoTime()
        val v = agg.collect()(0).getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        val skewFired = agg.queryExecution.executedPlan.toString.contains("skew=true")
        (dt, v, skewFired)
      }
      val runs = Seq.fill(3)(once())
      val med = runs.map(_._1).sorted.apply(1)
      (med, runs.head._2, runs.exists(_._3))
    }

    val arms = Seq(
      ("baseline", false, false),
      ("aqe", true, false),
      ("salted", false, true),
      ("salted+aqe", true, true))
    val results = arms.map { case (l, a, s) => (l, arm(a, s)) }
    val sums = results.map(_._2._2).distinct
    require(sums.size == 1,
      s"arms disagree on the aggregate: ${results.map(r => r._1 -> r._2._2)}")
    val base = results.head._2._1
    results.foreach { case (l, (t, _, fired)) =>
      println(f"SKEWJOIN $l%-11s median=$t%6.2f s  speedup=${base / t}%4.2fx  aqe_skew_fired=$fired")
    }
    spark.stop()
  }
}

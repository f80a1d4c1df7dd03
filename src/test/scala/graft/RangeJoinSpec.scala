package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bin-bucketed range join vs the brute-force BETWEEN definition, plus
  * the plan-shape property the operator exists for: an equi hash join
  * on the bin id instead of a nested loop.
  */
class RangeJoinSpec extends SparkSpec {

  private def pts = {
    import spark.implicits._
    // negative points included: floor-division binning must not split
    // bins differently on either side of zero
    Seq((-13L, "a"), (-1L, "b"), (0L, "c"), (3L, "d"), (7L, "e"),
      (10L, "f"), (29L, "g"), (100L, "h")).toDF("p", "tag")
  }

  private def ivs = {
    import spark.implicits._
    // overlapping, nested, multi-bin-spanning, and empty-match intervals
    Seq((-20L, -10L, "I1"), (-2L, 4L, "I2"), (0L, 0L, "I3"),
      (5L, 30L, "I4"), (28L, 29L, "I5"), (200L, 300L, "I6"))
      .toDF("lo", "hi", "iv")
  }

  test("pointInInterval matches brute-force BETWEEN, exactly once, across bin widths") {
    val brute = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("tag", "iv").collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
    assert(brute.nonEmpty && brute.distinct == brute)
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", w)
        .select("tag", "iv").collect().map(r => (r.getString(0), r.getString(1)))
        .sorted.toSeq
      assert(got == brute, s"mismatch at binWidth=$w")
    }
  }

  test("equiKeys restrict matches to the same key") {
    import spark.implicits._
    val l = Seq((1L, 5L, "x"), (2L, 5L, "y")).toDF("k", "p", "tag")
    val r = Seq((1L, 0L, 10L, "I"), (2L, 6L, 10L, "J")).toDF("k", "lo", "hi", "iv")
    val got = RangeJoin.pointInInterval(l, r, "p", "lo", "hi", 4L, Seq("k"))
      .select("tag", "iv").collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == Set(("x", "I"))) // (y, J) fails the range; (x, J)/(y, I) fail the key
  }

  test("plan is an equi join on the bin id — no nested loop even with broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 7L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join fell back to a nested loop:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi join on the bin id:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("RangeJoinRule: SQL BETWEEN join rewrites to a binned equi join, values intact, both orientations") {
    val prevOpts = spark.experimental.extraOptimizations
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // brute-force truth BEFORE the rule is injected
    val brute = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("tag", "iv").collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
    try {
      spark.experimental.extraOptimizations = prevOpts :+ graft.plans.RangeJoinRule
      spark.conf.set("spark.graft.rangeJoin.binWidth", "7")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      pts.createOrReplaceTempView("rj_pts")
      ivs.createOrReplaceTempView("rj_ivs")
      for (sql <- Seq(
        "SELECT tag, iv FROM rj_pts JOIN rj_ivs ON p BETWEEN lo AND hi",
        "SELECT tag, iv FROM rj_ivs JOIN rj_pts ON p BETWEEN lo AND hi")) {
        val df = spark.sql(sql)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"rule did not fire for [$sql]:\n$plan")
        assert(plan.contains("Generate") &&
          (plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")),
          s"expected exploded bins + equi join for [$sql]:\n$plan")
        val got = df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
        assert(got == brute, s"values diverged for [$sql]")
      }
    } finally {
      spark.experimental.extraOptimizations = prevOpts
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }

  test("RangeJoinRule guards: no conf, equi-keyed, or non-inner joins pass through untouched") {
    val prevOpts = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prevOpts :+ graft.plans.RangeJoinRule
      // conf unset -> BETWEEN join keeps its nested-loop plan
      val noConf = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(!noConf.contains("Generate"))
      spark.conf.set("spark.graft.rangeJoin.binWidth", "7")
      // a cross-side equality means Spark already hashes: not rewritten
      import spark.implicits._
      val l = Seq((1L, 5L, "x")).toDF("k", "p", "tag")
      val r = Seq((1L, 0L, 10L, "I")).toDF("k", "lo", "hi", "iv")
      val keyedPlan = l.join(r,
          l("k") === r("k") && col("p") >= col("lo") && col("p") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(!keyedPlan.contains("Generate"), keyedPlan)
      // left-outer BETWEEN join: out of scope, untouched
      val outer = pts.join(ivs,
          col("p") >= col("lo") && col("p") <= col("hi"), "left")
        .queryExecution.executedPlan.toString
      assert(!outer.contains("Generate"), outer)
    } finally {
      spark.experimental.extraOptimizations = prevOpts
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }

  test("q41 catalog entry matches its brute-force twin on the fixture") {
    val got = run("q41_range_join").collect()
    val o = graft.sources.Tables.table(spark, sfDir, "orders")
    val win = o.select(date_trunc("month", col("o_orderdate")).as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + expr("INTERVAL 9 DAYS"))
    val brute = o.join(win,
        col("o_orderdate") >= col("w_start") && col("o_orderdate") <= col("w_end"))
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n_orders"),
        graft.workloads.Parity.dsum(col("o_totalprice"), 2).as("sum_price"))
      .orderBy(col("w_start")).collect()
    assert(got.nonEmpty && got.map(_.toString).toSeq == brute.map(_.toString).toSeq)
  }
}

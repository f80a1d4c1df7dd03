package graft

import org.apache.spark.sql.functions._
import graft.datagen.Generators
import graft.operators.SkewOps

/** Salted join/aggregation equals the unsalted result on skewed data. */
class SkewSpec extends SparkSpec {

  test("salted join equals plain join on skewed keys") {
    val large = Generators.skewedEdges(spark, 100, 20000)
      .select(col("source").as("k"), col("target").as("v"))
    val small = Generators.milints(spark, 100).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    val plain = large.join(small, "k")
    val salted = SkewOps.saltedJoin(large, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    // row-level equality via checksum of sorted projections
    def sig(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.selectExpr("sum(crc32(concat_ws(',', k, v, w))) AS c").head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    assert(sig(salted) == sig(plain))
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = Generators.skewedEdges(spark, 50, 20000)
      .select(col("source").as("k"), col("target").as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .orderBy("k").collect()
    val salted = SkewOps.saltedCountSum(df, "k", "v", 8)
      .orderBy("k").collect()
    assert(direct.length == salted.length)
    direct.zip(salted).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2))
    }
  }

  test("key histogram surfaces the hot keys") {
    val df = Generators.skewedEdges(spark, 100, 10000)
    val top = SkewOps.keyHistogram(df, "source", 5).collect()
    assert(top.length == 5)
    assert(top.head.getLong(1) >= top.last.getLong(1))
  }

  test("AQE skew-splitter canary: tuned gates fire skew=true on a planted hub join; production defaults silently do not") {
    // The SkewJoinAb A/B's finding (SCALING.md round 13), kept alive
    // as a gate: the engine's standing guidance is "leave skewed
    // equi-joins declarative and let AQE split" — which is only true
    // while the splitter actually FIRES. BOTH qualify gates must pass
    // (bytes AND factor-over-median); `skewJoin.enabled=true` alone
    // proves nothing. This spec goes red if a conf or Spark upgrade
    // makes the splitter silently stop firing under the tuned gates
    // the guidance depends on — and also red if the default-threshold
    // arm STARTS firing at this scale (the documented trap would be
    // gone and the guidance should be revisited).
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      // force a real shuffle join — the straggler shape
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val large = spark.range(400000).select(
        when(pmod(col("id"), lit(100)) < 70, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(1000L))).as("key"),
        col("id").as("payload"))
      val small = spark.range(1000).select(col("id").as("key"),
        (col("id") * 7).as("attr"))
      def fired(): Boolean = {
        val agg = large.join(small, Seq("key"))
          .agg(sum(col("payload") + col("attr")).as("s"))
        agg.collect()
        agg.queryExecution.executedPlan.toString.contains("skew=true")
      }
      // arm 1 — production defaults: the 70%-hot hub partition beats
      // the 5x-median FACTOR gate but not the 256 MB BYTES gate, so
      // nothing fires (the "enabled != fired" trap, pinned)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      assert(!fired(),
        "default AQE thresholds fired at harness scale — the documented trap no longer exists; revisit the skew guidance")
      // arm 2 — both gates tuned to the workload: the splitter MUST
      // fire, or the catalog's skewed joins just lost their remedy
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      assert(fired(),
        "AQE skew splitter did not fire with both gates tuned — the declarative-skew guidance is broken")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}

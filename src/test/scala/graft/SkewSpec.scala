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
}

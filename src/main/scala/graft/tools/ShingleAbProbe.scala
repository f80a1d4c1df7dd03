package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the k-token window GENERATORS feeding the
  * ExactSubstr digest family (dd15/dd20/tx17/dd23) at headroom scale.
  * The family's dominant cost is window generation, not the digest
  * shuffle (dd23's 1/8-shuffle estimator measured only 16% below exact
  * dd15 at 500k), so the generator shape is the family's biggest
  * single-node lever.
  *
  *   A: production wordShinglePosRows — posexplode + per-doc lead
  *      window (costs a full shuffle+sort of the token stream)
  *   B: transform(sequence, i -> array_join(slice(...))) on a
  *      pre-materialized token array — no shuffle, but higher-order
  *      lambdas evaluate interpreted (the ~60x wordShingles lesson)
  *   C: typed mapPartitions sliding buffer — no shuffle, no
  *      interpreted lambda; relies on posexplode emitting a doc's
  *      tokens consecutively within one partition
  *
  * Each variant is consumed as count + bit_xor(xxhash64(md5 digest
  * stream)) so values (not just row counts) must agree — the probe
  * refuses to report timings for variants that disagree.
  *
  * Usage: runMain graft.tools.ShingleAbProbe [nDocs]
  */
object ShingleAbProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("500000")
    val dir = s"/tmp/graft-headroom-$n"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val k = 8
    val d = spark.read.parquet(s"$dir/documents.parquet")

    def variantA: DataFrame = graft.ext.TextOps
      .wordShinglePosRows(d, "doc_id", "text", k)

    def tokArr: DataFrame = d
      .select(col("doc_id"), graft.ext.TextOps.tokens(col("text")).as("_t"))
      .filter(size(col("_t")) >= k)

    def variantB: DataFrame = tokArr
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(_t) - $k)," +
          s" i -> array_join(slice(_t, i + 1, $k), ' '))"))
        .as(Seq("_pos", "_el")))

    def variantC: DataFrame = tokArr
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.flatMap { case (id, t) =>
          // one pass, one StringBuilder per window; t.length >= k
          (0 to t.length - k).iterator.map { i =>
            val sb = new StringBuilder(t(i))
            var j = i + 1
            while (j < i + k) { sb.append(' ').append(t(j)); j += 1 }
            (id, i, sb.toString)
          }
        }
      }
      .toDF("doc_id", "_pos", "_el")

    def forced(df: DataFrame): (Long, Long, Double) = {
      val g = df.select(col("doc_id"), col("_pos").cast("long").as("pos"),
        md5(col("_el")).as("gh"))
      val t0 = System.nanoTime()
      val r = g.agg(count(lit(1)),
        bit_xor(xxhash64(struct(col("doc_id"), col("pos"), col("gh")))))
        .collect()(0)
      (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
    }

    val variants = Seq("A_leadwindow" -> (() => variantA),
      "B_slicelambda" -> (() => variantB),
      "C_mapPartitions" -> (() => variantC))
    val sigs = scala.collection.mutable.Map.empty[String, (Long, Long)]
    variants.foreach { case (name, v) =>
      forced(v()) // warm-up
      val runs = Seq.fill(3)(forced(v()))
      val med = runs.map(_._3).sorted.apply(1)
      sigs(name) = (runs.head._1, runs.head._2)
      println(f"SHINGLE_AB $name%-16s n=$n rows=${runs.head._1}%-9d " +
        f"sig=${runs.head._2}%d median=$med%.2f s " +
        runs.map(r => f"${r._3}%.2f").mkString("(", ", ", ")"))
    }
    val distinct = sigs.values.toSet
    println(s"SHINGLE_AB agreement: " +
      (if (distinct.size == 1) "ALL VARIANTS AGREE" else s"MISMATCH $sigs"))
    spark.stop()
  }
}

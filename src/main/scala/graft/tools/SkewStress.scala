package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: planted-skew stress for the dedup/text pipeline.
  *
  * Usage: runMain graft.tools.SkewStress [nDocs]   (default 100000)
  *
  * Generates TWO corpora of nDocs documents (pure hash content, no RNG
  * state, PipelineHeadroom's style) under /tmp/graft-skew-<n>/:
  *
  *   uniform/  — every doc independent (~30-130 tokens)
  *   skewed/   — same, except (a) 10% of docs form ONE near-dup
  *               mega-cluster (a shared 60-token base + 2 unique
  *               tokens per doc → pairwise Jaccard ≈ 0.94), and
  *               (b) the token "hotterm0" is appended to 10% of all
  *               docs (one hot key in every token aggregation).
  *
  * Then times dd10 (LSH dedup clustering: the mega-cluster floods one
  * LSH bucket per band — the rep-chain path — and makes the verify
  * join's a_id key hot) and tx10 (TF-IDF: hot token key in both
  * aggregations) on each corpus and reports the skewed/uniform wall
  * ratio plus whether AQE's skew-join handling fired anywhere in the
  * final adaptive plan. The claim under test: planted 10% skew costs
  * < 3× uniform wall time, because every skew-prone stage is either a
  * partial-aggregation (hot keys pre-fold map-side), a bucket-capped
  * candidate generator (quadratic regime impossible), or an AQE-
  * splittable shuffle join.
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val base = s"/tmp/graft-skew-$n"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "line", "sort",
      "window", "order", "data", "column", "join", "small", "customer",
      "query", "big", "group", "stream", "the", "a")
    val vocabArr = array(vocab.map(lit): _*)
    def bodyFor(id: org.apache.spark.sql.Column, len: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), len),
        i => element_at(vocabArr, (pmod(hash(id, i), lit(vocab.size)) + 1).cast("int"))))

    def gen(dir: String, skewed: Boolean): Unit = {
      if (new java.io.File(s"$dir/documents.parquet").exists()) return
      val uniformLen = (pmod(hash(col("doc_id"), lit("len")), lit(100)) + 30).cast("int")
      var docs = spark.range(n).toDF("doc_id")
        .withColumn("text", bodyFor(col("doc_id"), uniformLen))
      if (skewed) {
        // mega-cluster: doc_id % 10 == 0 docs share a fixed 60-token
        // base (seeded from id -1, same for all) + 2 member-unique
        // tokens → Jaccard ≈ 60/64 ≈ 0.94 for every pair; hot term:
        // doc_id % 10 == 5 docs get "hotterm0" appended
        val clusterBase = bodyFor(lit(-1L), lit(59))
        docs = docs.withColumn("text",
          when(pmod(col("doc_id"), lit(10)) === 0,
            concat_ws(" ", clusterBase,
              concat(lit("u"), col("doc_id").cast("string")),
              concat(lit("v"), col("doc_id").cast("string"))))
            .otherwise(col("text")))
          .withColumn("text",
            when(pmod(col("doc_id"), lit(10)) === 5,
              concat_ws(" ", col("text"), lit("hotterm0")))
              .otherwise(col("text")))
      }
      docs
        .withColumn("lang", element_at(array(Seq("en", "es", "de", "fr", "zh").map(lit): _*),
          (pmod(hash(col("doc_id"), lit("lang")), lit(5)) + 1).cast("int")))
        .withColumn("source", concat(lit("src"),
          pmod(hash(col("doc_id"), lit("src")), lit(10)).cast("string")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      println(s"GENERATED ${if (skewed) "skewed" else "uniform"} $n docs at $dir")
    }
    gen(s"$base/uniform", skewed = false)
    gen(s"$base/skewed", skewed = true)

    // The timer wraps CONSTRUCTION + count: dd10's iterative CC runs
    // its convergence actions while the DataFrame is being built, so
    // timing only the final count would miss nearly all its work.
    // Best-of-2 reps so JIT warmup doesn't penalize whichever corpus
    // runs first.
    def timeOnce(name: String, dir: String): (Double, Long, Boolean) = {
      val t0 = System.nanoTime()
      val df: DataFrame = graft.SparkEntry.queries(name)(spark, dir)
      val rows = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // AQE finalizes the adaptive plan after the action; skew-split
      // joins render as "skew=true" in the final plan string
      val skewSplit = df.queryExecution.executedPlan.toString.contains("skew=true")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (dt, rows, skewSplit)
    }
    def time(name: String, dir: String): (Double, Long, Boolean) = {
      val a = timeOnce(name, dir); val b = timeOnce(name, dir)
      (math.min(a._1, b._1), b._2, a._3 || b._3)
    }

    Seq("dd10_dedup_clusters_lsh", "tx10_tfidf_terms").foreach { q =>
      val (tu, ru, _) = time(q, s"$base/uniform")
      val (ts, rs, skewSplit) = time(q, s"$base/skewed")
      val ratio = ts / tu
      println(f"SKEW $q%-24s uniform=$tu%6.2f s ($ru rows)  " +
        f"skewed=$ts%6.2f s ($rs rows)  ratio=$ratio%.2f  " +
        s"aqe_skew_split=$skewSplit  ${if (ratio < 3.0) "OK" else "EXCEEDED 3x"}")
    }
    spark.stop()
  }
}

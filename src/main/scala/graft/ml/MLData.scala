package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.array_to_vector

/** Deterministic ML dataset generators (reference
  * `P/mllib/data/dataGeneration.scala:13-106`,
  * `P/mllib/data/RatingGenerator.scala`, `P/mllib/clustering/LDA.scala:21-45`
  * semantics, regenerated hash-based): every value is a pure function of
  * (row id, dimension, seed), so train/test splits and results are
  * reproducible on any cluster layout. Feature construction happens in
  * codegen'd expressions and becomes a Vector column only at the end
  * (`array_to_vector`).
  */
object MLData {

  /** True-model seed, fixed across datasets: train (seed) and test
    * (seed+1) must sample the SAME underlying model, only different
    * examples — otherwise test metrics measure a different ground
    * truth than the one fitted. */
  private val ModelSeed = 0x5eed5eedL

  /** Uniform double in [-1, 1) from (id, dim, seed). */
  private def u(id: org.apache.spark.sql.Column, dim: Any, seed: Long) =
    (pmod(xxhash64(id, lit(dim.toString), lit(seed)), lit(2000000L)).cast("double")
      / 1000000.0) - 1.0

  /** Deterministic true-model weight for dimension i. */
  def weight(i: Int, seed: Long): Double = {
    var z = i.toLong * 0x9e3779b97f4a7c15L + seed
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    ((z ^ (z >>> 27)) % 1000L).toDouble / 500.0 - 1.0
  }

  private def featureArray(numFeatures: Int, seed: Long) =
    array((0 until numFeatures).map(i => u(col("id"), i, seed)): _*)

  /** Continuous features + linear response w·x (+ bounded noise). */
  def regression(spark: SparkSession, numExamples: Long, numFeatures: Int,
      seed: Long, noise: Double = 0.1): DataFrame = {
    val fs = featureArray(numFeatures, seed)
    val label = (0 until numFeatures)
      .map(i => u(col("id"), i, seed) * weight(i, ModelSeed))
      .reduce(_ + _) + u(col("id"), "noise", seed) * noise
    spark.range(0, numExamples)
      .select(array_to_vector(fs).as("features"), label.as("label"))
  }

  /** Binary labels via the sign of the linear response (separable-ish). */
  def classification(spark: SparkSession, numExamples: Long, numFeatures: Int,
      seed: Long, noise: Double = 0.1): DataFrame = {
    val fs = featureArray(numFeatures, seed)
    val margin = (0 until numFeatures)
      .map(i => u(col("id"), i, seed) * weight(i, ModelSeed))
      .reduce(_ + _) + u(col("id"), "noise", seed) * noise
    spark.range(0, numExamples)
      .select(array_to_vector(fs).as("features"),
        when(margin > 0, 1.0).otherwise(0.0).as("label"))
  }

  /** k well-separated cluster centers + bounded jitter. */
  def clustering(spark: SparkSession, numExamples: Long, numFeatures: Int,
      k: Int, seed: Long): DataFrame = {
    val cluster = pmod(xxhash64(col("id"), lit("c"), lit(seed)), lit(k.toLong))
    val fs = array((0 until numFeatures).map { i =>
      // center coordinate: hash(cluster, i) scaled to +-5; jitter +-0.5
      ((pmod(xxhash64(cluster, lit(i), lit(ModelSeed)), lit(1000L)).cast("double") / 100.0) - 5.0) +
        u(col("id"), s"j$i", seed) * 0.5
    }: _*)
    spark.range(0, numExamples)
      .select(cluster.as("trueCluster"), array_to_vector(fs).as("features"))
  }

  /** Term-count documents from per-topic token distributions (LDA). */
  def corpus(spark: SparkSession, numDocs: Long, vocabSize: Int,
      numTopics: Int, seed: Long): DataFrame = {
    val topic = pmod(xxhash64(col("id"), lit("t"), lit(seed)), lit(numTopics.toLong))
    val counts = array((0 until vocabSize).map { w =>
      // topic-preferred words get higher counts
      val base = pmod(xxhash64(topic, lit(w), lit(ModelSeed)), lit(10L)).cast("double")
      val noise = pmod(xxhash64(col("id"), lit(s"n$w"), lit(seed)), lit(3L)).cast("double")
      base + noise
    }: _*)
    spark.range(0, numDocs)
      .select(col("id").as("docIndex"), array_to_vector(counts).as("features"))
  }

  /** (user, item, rating) with a low-rank-ish deterministic structure. */
  def ratings(spark: SparkSession, numUsers: Int, numItems: Int,
      numRatings: Long, seed: Long): DataFrame = {
    val user = pmod(xxhash64(col("id"), lit("u"), lit(seed)), lit(numUsers.toLong)).cast("int")
    val item = pmod(xxhash64(col("id"), lit("i"), lit(seed)), lit(numItems.toLong)).cast("int")
    // rating from user and item latent biases -> learnable structure
    val rating = ((pmod(xxhash64(user, lit(ModelSeed)), lit(3L)) +
      pmod(xxhash64(item, lit(ModelSeed + 1)), lit(3L))).cast("double") / 2.0) + 1.0
    spark.range(0, numRatings)
      .select(user.as("user"), item.as("item"), rating.cast("float").as("rating"))
      .dropDuplicates("user", "item")
  }
}

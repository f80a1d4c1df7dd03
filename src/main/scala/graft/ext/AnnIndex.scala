package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent ANN index: the ss02 hyperplane-LSH signature rows written
  * ONCE as a parquet table bucketed by signature, then queried by any
  * later session with bucket pruning — the read-side cost is
  * O(matched buckets), independent of corpus size, which is the actual
  * serving shape at 100 TB (build is a deliberate batch job; queries
  * must not re-sign, re-shuffle, or even re-scan the corpus).
  *
  * Index layout: one row per (vector × table) with a single combined
  * bucket key `tsig = t · 2^bits + sig`. Bucketing uses ONE column
  * because Spark's bucket pruning (FileSourceStrategy) only prunes on
  * single-column bucket specs with literal =/IN predicates — a
  * (t, sig) composite spec would disable pruning entirely.
  *
  * Query plan: probe signatures (exact + Hamming-1 flips per table)
  * are computed driver-side into a literal IN list — that is what lets
  * the scan skip non-matching buckets — then the tiny probe relation
  * broadcasts onto the pruned index rows, exact cosines re-rank, and
  * the bounded `TopKByScore` aggregation keeps ≤ k rows per query per
  * map task. The |Q|·L·(b+1) probe list is driver-side METADATA (like
  * partition-pruning values), not data — the corpus never reaches the
  * driver.
  */
object AnnIndex {

  import SimilarityQueries.{NTables, TableBits, sigRows, topNeighbors}

  private def tsig(t: Int, sig: Long): Long = (t.toLong << TableBits) + sig

  /** Build (or rebuild) the bucketed signature index as a managed
    * table. One narrow pass over the vectors; `nBuckets` should track
    * the cluster's target scan parallelism, not the corpus size. */
  def build(spark: SparkSession, vectors: DataFrame, table: String,
      nBuckets: Int = 64): Unit = {
    // a managed-table LOCATION can outlive its catalog entry (the
    // default catalog is per-session in-memory); saveAsTable refuses to
    // adopt an orphaned directory, so clear both halves explicitly
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    sigRows(vectors)
      .withColumn("tsig", (col("t") * lit(1L << TableBits)) + col("sig"))
      .select(col("vec_id"), col("v"), col("tsig"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "tsig").sortBy("tsig")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Top-k cosine neighbors for `queries` (vec_id, v) against a built
    * index, excluding self-matches. Output shape matches ss01/ss02. */
  def topK(spark: SparkSession, table: String, queries: DataFrame,
      k: Int = SimilarityQueries.K): DataFrame = {
    graft.functions.VectorOps.register(spark)
    // driver-side probe signatures: exact + all Hamming-1 flips, the
    // ss02 multi-probe recall recovery — (b+1) probes per table
    val probes = sigRows(queries.select(col("vec_id").cast("long").as("vec_id"),
        col("v")))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("t"), col("sig"))
      .collect()
      .flatMap { r =>
        val t = r.getAs[Int]("t"); val sig = r.getAs[Long]("sig")
        val id = r.getAs[Long]("q_id"); val qv = r.getSeq[Double](1)
        (tsig(t, sig) +: (0 until TableBits).map(b => tsig(t, sig ^ (1L << b))))
          .map(v => (id, qv, v))
      }.distinct.toSeq
    val probeValues = probes.map(_._3).distinct.sorted
    import spark.implicits._
    val probeDf = broadcast(spark.createDataset(probes).toDF("q_id", "qv", "tsig"))
    // literal IN list → FileSourceStrategy prunes non-matching buckets
    val idx = spark.table(table).filter(col("tsig").isin(probeValues: _*))
    topNeighbors(
      idx.join(probeDf, "tsig")
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.VectorOps.dot(col("qv"), col("v")).as("cos"))
        .distinct(),
      k)
  }
}

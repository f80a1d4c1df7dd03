package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted banded-LSH dedup index: the storage artifact dd17's probe
  * and [[graft.streaming.DocsStream]] describe in prose — the standing
  * corpus's (doc_id, band, bucket) rows as a BUCKETED managed table, so
  * that the daily probe's (band, bucket) equi-join reads the index side
  * pre-partitioned (Spark's bucketed-scan path: no Exchange above the
  * index scan) and appending an accepted batch preserves the bucketing.
  *
  * The index stores buckets only, not shingles: verification re-derives
  * shingle sets for exactly the CANDIDATE history docs (a semi-join
  * narrows the corpus read to the handful of ids the probe surfaced) —
  * at 100 TB the candidates are KBs while the corpus is the 100 TB, so
  * the index stays minhash-narrow and the text fetch is bounded by the
  * batch's match count.
  *
  * Same LSH constants as dd03/dd17 (36 hashes × 6 rows/band): a pair
  * this probe reports is exactly a dd17 pair — DedupIndexSpec proves
  * the persisted-index path emits the identical pair set.
  */
object DedupIndex {

  val Hashes = 36
  val RowsPerBand = 6

  private def writeBuckets(docs: DataFrame, table: String, nBuckets: Int,
      mode: String): Unit =
    TextOps.bandBucketRows(
        TextOps.wordShingleRows(docs, "doc_id", "text", 3),
        "doc_id", Hashes, RowsPerBand)
      .write.mode(mode).format("parquet")
      .bucketBy(nBuckets, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(table)

  /** Create/overwrite the index table from a corpus of (doc_id, text).
    * Bucketed AND sorted by (band, bucket): the probe join and the
    * bucket-size stats aggregate both run shuffle-free on the index
    * side. */
  def build(docs: DataFrame, table: String, nBuckets: Int = 8): Unit =
    writeBuckets(docs, table, nBuckets, "overwrite")

  /** Append an accepted batch's buckets (same bucket spec, so the
    * bucketed-join property survives ingestion — the DocsStream
    * admission loop's state-append as a table operation). */
  def append(docs: DataFrame, table: String, nBuckets: Int = 8): Unit =
    writeBuckets(docs, table, nBuckets, "append")

  /** Near-dup pairs of `batch` against the persisted index: banded
    * candidates (flooded index buckets collapse to their min-id
    * representative, dd17's bounded-work rule), then exact-Jaccard
    * verification against shingle sets re-derived from `corpus` for
    * candidate hist ids ONLY. Output: batch_id, hist_id, inter, uni. */
  def probe(
      spark: SparkSession,
      table: String,
      batch: DataFrame,
      corpus: DataFrame,
      maxBucketSize: Int = 100,
      threshNum: Int = 8,
      threshDen: Int = 10): DataFrame = {
    val idx = spark.table(table)
    val kept = TextOps.capFloodedBuckets(idx, "doc_id", maxBucketSize)
      .select(col("band"), col("bucket"), col("doc_id").as("hist_id"))
    val batchRows = TextOps.wordShingleRows(batch, "doc_id", "text", 3)
    val bb = TextOps.bandBucketRows(batchRows, "doc_id", Hashes, RowsPerBand)
      .select(col("band"), col("bucket"), col("doc_id").as("batch_id"))
    val cand = bb.join(kept, Seq("band", "bucket"))
      .select(col("batch_id").as("a_id"), col("hist_id").as("b_id"))
      .distinct()
    // verify sets: candidate hist docs only (semi-join-narrowed corpus
    // read) plus the batch itself
    val histDocs = corpus.join(
      cand.select(col("b_id").as("doc_id")).distinct(), Seq("doc_id"),
      "left_semi")
    val sets = TextOps.wordShingleRows(histDocs, "doc_id", "text", 3)
      .union(batchRows)
      .groupBy(col("doc_id")).agg(collect_set(col("_el")).as("_set"))
    TextOps.jaccardJoin(cand, sets, "doc_id", "_set", threshNum, threshDen)
      .select(col("a_id").as("batch_id"), col("b_id").as("hist_id"),
        col("inter"), col("uni"))
  }
}

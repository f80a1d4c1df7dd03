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

  /** The (doc_id, band, bucket) rows the index stores, derived from
    * (doc_id, text) docs — THE band/bucket derivation, shared by
    * build/append and by the streaming admission's state side so the
    * two can never disagree with the stored rows. */
  def bucketRows(docs: DataFrame): DataFrame =
    TextOps.bandBucketRows(
      TextOps.wordShingleRows(docs, "doc_id", "text", 3),
      "doc_id", Hashes, RowsPerBand)

  private def writeBuckets(docs: DataFrame, table: String, nBuckets: Int,
      mode: String): Unit =
    bucketRows(docs)
      .write.mode(mode).format("parquet")
      .bucketBy(nBuckets, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(table)

  /** Create/overwrite the index table from a corpus of (doc_id, text).
    * Bucketed AND sorted by (band, bucket): the probe join and the
    * bucket-size stats aggregate both run shuffle-free on the index
    * side. */
  def build(docs: DataFrame, table: String, nBuckets: Int = 8): Unit =
    writeBuckets(docs, table, nBuckets, "overwrite")

  /** Append an accepted batch's buckets (same bucket spec — read back
    * from the catalog so a mismatched parameter cannot silently break
    * the bucketed-join property — the DocsStream admission loop's
    * state-append as a table operation). */
  def append(docs: DataFrame, table: String, nBuckets: Int = 8): Unit = {
    val nB = docs.sparkSession.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(nBuckets)
    writeBuckets(docs, table, nB, "append")
  }

  /** Rewrite the table under its own bucket spec, folding the
    * one-file-set-per-append accumulation (each [[append]] adds up to
    * task-count × bucket-count files) back to one file per bucket
    * group — the lifecycle twin of [[graft.ext.SubstrIndex.compact]]:
    * file COUNT, not data size, is what years of daily acceptance
    * appends degrade. Pre-shuffling on Spark's own bucket id
    * (murmur3(band, bucket) mod n — the writer's function) makes the
    * staging write emit exactly one file per bucket. Content-identical
    * by construction; DedupIndexSpec pins rebuild equivalence, probe
    * parity, and the file-count bound. */
  def compact(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val nBuckets = meta.bucketSpec.map(_.numBuckets).getOrElse(8)
    val tmp = table + "__compact"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.table(table)
      .repartition(pmod(hash(col("band"), col("bucket")), lit(nBuckets)))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

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
      threshDen: Int = 10): DataFrame =
    probeBuckets(
      spark.table(table).select(col("doc_id"), col("band"), col("bucket")),
      batch, corpus, maxBucketSize, threshNum, threshDen)

  /** [[probe]] against any standing (doc_id, band, bucket) frame —
    * the persisted index scan, optionally unioned with bucket rows
    * derived from a not-yet-promoted streaming state
    * ([[bucketRows]]), so the flooded-bucket cap counts across the
    * WHOLE standing side exactly as the in-query fold would.
    * `corpus` must carry the text of every standing doc_id the frame
    * references (verification reads it candidate-narrowed). */
  def probeBuckets(
      standingBuckets: DataFrame,
      batch: DataFrame,
      corpus: DataFrame,
      maxBucketSize: Int = 100,
      threshNum: Int = 8,
      threshDen: Int = 10): DataFrame = {
    val idx = standingBuckets
    val kept = TextOps.capFloodedBuckets(idx, "doc_id", maxBucketSize)
      .select(col("band"), col("bucket"), col("doc_id").as("hist_id"))
    val batchRows = TextOps.wordShingleRows(batch, "doc_id", "text", 3)
    val bb = TextOps.bandBucketRows(batchRows, "doc_id", Hashes, RowsPerBand)
      .select(col("band"), col("bucket"), col("doc_id").as("batch_id"))
    val cand = bb.join(kept, Seq("band", "bucket"))
      .select(col("batch_id"), col("hist_id"))
      .distinct()
    // verify sets aggregate PER SIDE (a doc_id on both sides — a
    // re-submission — must compare batch-content vs history-content,
    // not a merged set): candidate hist docs only (semi-join-narrowed
    // corpus read) on one side, the batch itself on the other
    val histDocs = corpus.join(
      cand.select(col("hist_id").as("doc_id")).distinct(), Seq("doc_id"),
      "left_semi")
    val histSets = TextOps.wordShingleRows(histDocs, "doc_id", "text", 3)
      .groupBy(col("doc_id")).agg(collect_set(col("_el")).as("_sb"))
      .select(col("doc_id").as("hist_id"), col("_sb"))
    val batchSets = batchRows
      .groupBy(col("doc_id")).agg(collect_set(col("_el")).as("_sa"))
      .select(col("doc_id").as("batch_id"), col("_sa"))
    cand.join(batchSets, "batch_id").join(histSets, "hist_id")
      .withColumn("inter",
        size(array_intersect(col("_sa"), col("_sb"))).cast("long"))
      .withColumn("uni",
        size(array_union(col("_sa"), col("_sb"))).cast("long"))
      .filter(col("inter") * threshDen >= col("uni") * threshNum)
      .select(col("batch_id"), col("hist_id"), col("inter"), col("uni"))
  }
}

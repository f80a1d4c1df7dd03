package graft.ext

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted embedding near-dup index — the [[DedupIndex]] /
  * [[SubstrIndex]] lifecycle (build/append/probe/compact, partition-
  * pruned probes, streaming admission + promotion via
  * [[graft.streaming.EmbedStream]]) applied to dd12's hyperplane-LSH
  * family: one row per (vector × table) holding the NORMALIZED vector
  * and a combined bucket key `tsig = t·2^bits + sig`, bucketed AND
  * sorted on tsig so the daily probe's bucket join reads the index
  * side pre-partitioned, and additionally partitioned on
  * `pb = xxhash64(tsig) mod nParts` so a trickle batch's probe
  * partition-prunes the scan (each batch vector signs into exactly
  * [[SimilarityQueries.NdTables]] buckets, so pruning bites while
  * NdTables·|batch| ≲ nParts and degrades to the full one-pass
  * bucketed scan for bulk batches).
  *
  * Unlike [[DedupIndex]] the verification payload (the 64-dim
  * normalized vector, ~512 bytes) lives IN the index row — no side
  * corpus table, so candidate scoring never re-reads the corpus: the
  * probe is one pruned index pass + batch-sized joins. Same LSH
  * constants as dd12 (NdTables × NdBits at NdPlaneBase, bucket cap
  * NdMaxBucket, cosine ≥ NdThreshold): a pair this probe reports
  * against a standing corpus is exactly the pair dd12 would report
  * between the same two vectors; EmbedIndexSpec pins the parity.
  */
object EmbedIndex {

  import SimilarityQueries.{NdBits, NdTables, NdMaxBucket, ndSig}

  /** dd12's verification threshold, re-exported for the streaming
    * admission (the catalog constant is package-private). */
  val Threshold: Double = SimilarityQueries.NdThreshold

  /** Same table-property key as [[SubstrIndex.PbProp]]. */
  val PbProp: String = SubstrIndex.PbProp

  /** Normalize raw (vec_id, embedding) rows to the (vec_id, v) frame
    * every probe/build consumes — cosine thereafter is a plain dot. */
  def normalized(vecs: DataFrame): DataFrame = {
    graft.functions.VectorOps.register(vecs.sparkSession)
    vecs.select(col("vec_id").cast("long").as("vec_id"),
      graft.functions.VectorOps.normalize(
        col("embedding").cast("array<double>")).as("v"))
  }

  /** The (vec_id, v, tsig) rows the index stores — THE signature
    * derivation, shared by build/append, the in-query probe twin, and
    * the streaming admission's state side. */
  def sigRows(vecs: DataFrame): DataFrame = {
    val flat = vecs.select(col("vec_id") +: col("v") +:
      (0 until NdTables).map(t => ndSig(col("v"), t).as(s"_s$t")): _*)
    (0 until NdTables).map(t => flat.select(col("vec_id"), col("v"),
        ((lit(t.toLong) * lit(1L << NdBits)) + col(s"_s$t")).as("tsig")))
      .reduce(_ union _)
  }

  private def pbCol(nParts: Int) =
    pmod(xxhash64(col("tsig")), lit(nParts.toLong)).cast("int").as("pb")

  /** Spark's own bucket id (murmur3(tsig) mod n) — pre-shuffling on
    * (pb, bucket id) yields one file per (partition, bucket) group. */
  private def bucketIdCol(nBuckets: Int) =
    pmod(hash(col("tsig")), lit(nBuckets))

  private def write(rows: DataFrame, table: String, nBuckets: Int,
      nParts: Int, mode: String): Unit =
    rows.select(col("vec_id"), col("v"), col("tsig"), pbCol(nParts))
      .repartition(col("pb"), bucketIdCol(nBuckets))
      .write.mode(mode).format("parquet")
      .partitionBy("pb")
      .bucketBy(nBuckets, "tsig").sortBy("tsig")
      .saveAsTable(table)

  private def setPbProp(spark: SparkSession, table: String,
      nParts: Int): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('$PbProp' = '$nParts')")

  private[graft] def pbMod(spark: SparkSession, table: String): Option[Int] =
    spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).properties
      .get(PbProp).map(_.toInt)

  /** Create/overwrite the index from a (vec_id, v) corpus (normalized
    * — pass raw rows through [[normalized]] first). */
  def build(vecs: DataFrame, table: String, nBuckets: Int = 8,
      nParts: Int = 64): Unit = {
    write(sigRows(vecs), table, nBuckets, nParts, "overwrite")
    setPbProp(vecs.sparkSession, table, nParts)
  }

  /** Append an accepted batch's rows (partition/bucket spec read back
    * from the catalog). Idempotence lives one level up:
    * [[graft.streaming.EmbedStream.promoteEmbedState]] anti-joins on
    * vec_id against the table before calling this. */
  def append(vecs: DataFrame, table: String, nBuckets: Int = 8): Unit = {
    val spark = vecs.sparkSession
    val nB = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(nBuckets)
    write(sigRows(vecs), table, nB, pbMod(spark, table).getOrElse(64),
      "append")
  }

  /** Rewrite the table under its own partition/bucket spec — one file
    * per (pb, bucket) group, the [[SubstrIndex.compact]] lifecycle. */
  def compact(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      TableIdentifier(table))
    val nBuckets = meta.bucketSpec.map(_.numBuckets).getOrElse(8)
    val nParts = pbMod(spark, table).getOrElse(64)
    val tmp = table + "__compact"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    write(spark.table(table).select(col("vec_id"), col("v"), col("tsig")),
      tmp, nBuckets, nParts, "overwrite")
    setPbProp(spark, tmp, nParts)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.sql(s"MSCK REPAIR TABLE $table")
  }

  /** The standing scan narrowed to the pb partitions `batchSigs` can
    * hit (≤ nParts distinct values, a bounded driver list). Pruning
    * keeps whole tsig buckets, so the flood cap stays exact for every
    * bucket the batch can reach. Falls back for a pre-pb table. */
  private[graft] def prunedRows(spark: SparkSession, table: String,
      batchSigs: DataFrame): DataFrame = {
    val idx = spark.table(table)
    val out = pbMod(spark, table) match {
      case Some(nParts) if idx.columns.contains("pb") =>
        val pbs = batchSigs.select(pbCol(nParts)).distinct()
          .collect().map(_.getInt(0)).toSeq
        if (pbs.isEmpty) idx.where(lit(false))
        else if (pbs.size == nParts) idx
        else idx.where(col("pb").isin(pbs: _*))
      case _ => idx
    }
    out.select(col("vec_id"), col("v"), col("tsig"))
  }

  /** Near-dup pairs of `batch` (vec_id, v) against the persisted
    * index — partition-pruned to the batch's own pb values, with
    * `extraRows` (the streaming admission's days-sized un-promoted
    * state, as [[sigRows]]) joined UNPRUNED beside it so the flood cap
    * counts across the whole standing side. Output:
    * (batch_id, hist_id, cos_e6), cosine ≥ [[Threshold]]. */
  def probe(spark: SparkSession, table: String, batch: DataFrame,
      extraRows: Option[DataFrame] = None): DataFrame = {
    val bsig = sigRows(batch)
      .localCheckpoint(true) // read twice: pb collection + bucket join
    val standing = extraRows.foldLeft(prunedRows(spark, table, bsig)) {
      (idx, extra) =>
        idx.union(extra.select(col("vec_id"), col("v"), col("tsig")))
    }
    probeRows(standing, bsig, batch)
  }

  /** [[probe]] against any standing (vec_id, v, tsig) frame — the
    * in-query twin EmbedIndexSpec binds the persisted path against. */
  def probeVecs(standingVecs: DataFrame, batch: DataFrame): DataFrame =
    probeRows(sigRows(standingVecs), sigRows(batch), batch)

  private def probeRows(standingRows: DataFrame, batchSigs: DataFrame,
      batch: DataFrame): DataFrame = {
    graft.functions.VectorOps.register(batch.sparkSession)
    // flooded standing buckets collapse to their min-id representative
    // (dd12's bounded-work rule, counted across index ∪ extra)
    val stats = standingRows.groupBy(col("tsig"))
      .agg(count(lit(1)).as("_n"), min(col("vec_id")).as("_rep"))
    val kept = standingRows.join(stats, Seq("tsig"))
      .filter(col("_n") <= NdMaxBucket || col("vec_id") === col("_rep"))
      .select(col("tsig"), col("vec_id").as("hist_id"))
    val cand = batchSigs.select(col("tsig"), col("vec_id").as("batch_id"))
      .join(kept, Seq("tsig"))
      .select(col("batch_id"), col("hist_id"))
      .distinct()
      .localCheckpoint(true) // read twice: hist-vector narrowing + score
    // candidate-narrowed vector fetch (the r16 verify-set lesson): only
    // docs in candidate pairs ever carry their vectors into a join
    val histV = standingRows.select(col("vec_id"), col("v"))
      .join(cand.select(col("hist_id").as("vec_id")), Seq("vec_id"),
        "left_semi")
      .dropDuplicates("vec_id") // NdTables rows per standing vector
      .select(col("vec_id").as("hist_id"), col("v").as("_vh"))
    val batchV = batch
      .select(col("vec_id").as("batch_id"), col("v").as("_vb"))
    val cos = graft.functions.VectorOps.dot(col("_vb"), col("_vh"))
    cand.join(batchV, "batch_id").join(histV, "hist_id")
      .select(col("batch_id"), col("hist_id"), cos.as("cos"))
      .filter(col("cos") >= Threshold)
      .select(col("batch_id"), col("hist_id"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** dd12's exact intra-corpus rule over a (vec_id, v) frame —
    * candidates from shared buckets (cap + rep-chain), exact-cosine
    * verified: the streaming admission's intra-batch pair source, so
    * "near-dup within one micro-batch" is LITERALLY the dd12 relation
    * on that batch. Output: (a_id, b_id), a < b. */
  def pairsWithin(vecs: DataFrame): DataFrame =
    SimilarityQueries.scoreCandidates(
        SimilarityQueries.ndCandidates(vecs), vecs)
      .filter(col("cos") >= Threshold)
      .select(col("a_id"), col("b_id"))
}

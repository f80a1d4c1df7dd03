package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CatalogQuery
import graft.sources.Tables

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is the real thing — binary column + metadata
  * struct, `mapPartitions` batch processing with a case-class schema,
  * partition-count preserved — while the codec itself is a STUB
  * (`FakeCodec.decodeFeatures`): the container ships no image/audio
  * libraries, so decode is a deterministic byte-histogram stand-in.
  * Swapping in a real JNI/FFM decoder changes one function.
  */
object MultimodalQueries {

  /** Deterministic stand-in for an image/audio decoder. Real decode
    * (JPEG→pixels, PCM→frames) would plug in here. */
  object FakeCodec {
    val FeatureDim = 8
    /** "Decode" = 8-bucket byte histogram — deterministic, shaped like
      * a feature extractor (bytes in → fixed-width vector out). */
    def decodeFeatures(payload: Array[Byte]): Array[Long] = {
      val h = new Array[Long](FeatureDim)
      var i = 0
      while (i < payload.length) {
        h((payload(i) & 0xff) >>> 5) += 1
        i += 1
      }
      h
    }
  }

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class FeatureRow(doc_id: Long, width: Int, height: Int, n_bytes: Long,
      features: Array[Long])

  /** Synthesize a media table from documents: payload = UTF-8 bytes
    * (stand-in for image bytes), metadata derived deterministically.
    * Metadata hashes are md5-based (24 hex bits → int), not xxhash64:
    * engine-portable, so mm01/mm02 carry full DuckDB value oracles. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    def dim(seed: Column) =
      (pmod(conv(substring(md5(seed), 1, 6), 16, 10).cast("long"), lit(512)) + 64)
        .cast("int")
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        dim(col("doc_id").cast("string")).as("width"),
        dim(concat(col("doc_id").cast("string"), lit("|h"))).as("height"))
  }

  /** The one DuckDB rendering of `dim(seed)` above — interpolated into
    * BOTH mm oracles so the derivation can't drift between them and the
    * Scala column (the generate-from-one-geometry rule). */
  private def dimSql(seedSql: String): String =
    s"('0x' || substr(md5($seedSql), 1, 6))::BIGINT % 512 + 64"
  private val widthSql = dimSql("CAST(doc_id AS VARCHAR)")
  private val heightSql = dimSql("CAST(doc_id AS VARCHAR) || '|h'")

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "mm01_media_features",
      "Binary media column + metadata struct → per-partition batch feature extraction (stubbed codec)",
      (s, dir) => {
        import s.implicits._
        val media = mediaTable(s, dir).as[MediaRow]
        media.mapPartitions { rows =>
          // batch-shaped: one codec context per partition, not per row
          rows.map { r =>
            val f = FakeCodec.decodeFeatures(r.payload)
            FeatureRow(r.doc_id, r.width, r.height, r.payload.length.toLong, f)
          }
        }.toDF()
          .select(col("doc_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height"), col("n_bytes"),
            aggregate(col("features"), lit(0L), (a, x) => a + x).as("feature_mass"),
            concat_ws(",", col("features")).as("feature_csv"))
          .orderBy(col("doc_id"))
      },
      // Value oracle: the payload is the ASCII text's UTF-8 bytes (the
      // fixture is pinned ASCII-only in ExtSpec, so byte == char), the
      // codec stub is an 8-bucket byte histogram (bucket = code >> 5),
      // and the metadata dims are md5-derived — all reproducible in
      // DuckDB exactly.
      // the len(text)=0 guard matters: split('', '') is [''] in DuckDB
      // (ascii('')=0 → a phantom count in bucket 0) while a 0-byte Spark
      // payload histograms to all zeros
      Some(s"""WITH m AS (
             |  SELECT doc_id, text,
             |    $widthSql AS width,
             |    $heightSql AS height,
             |    CASE WHEN len(text) = 0 THEN [0, 0, 0, 0, 0, 0, 0, 0]
             |         ELSE list_transform(range(0, 8), b ->
             |           len(list_filter(split(text, ''), ch -> ascii(ch) // 32 = b)))
             |    END AS features
             |  FROM documents)
             |SELECT doc_id, width, height,
             |  CAST(len(text) AS BIGINT) AS n_bytes,
             |  CAST(list_sum(features) AS BIGINT) AS feature_mass,
             |  array_to_string(features, ',') AS feature_csv
             |FROM m ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "mm02_media_partition_stats",
      "Media metadata aggregation without decoding (column pruning: payload never read)",
      (s, dir) => {
        mediaTable(s, dir)
          .groupBy((col("width") > 300).as("wide"))
          .agg(count(lit(1)).as("n"),
            avg(col("height")).cast("double").as("avg_height"))
          .select(col("wide"), col("n"),
            round(col("avg_height"), 4).as("avg_height"))
          .orderBy(col("wide"))
      },
      // Same md5-derived dims as mm01; avg over exact small integers is
      // sum/count in double on both engines, IEEE-identical
      Some(s"""WITH m AS (
             |  SELECT
             |    $widthSql AS width,
             |    $heightSql AS height
             |  FROM documents)
             |SELECT width > 300 AS wide, CAST(count(*) AS BIGINT) AS n,
             |  round(avg(height), 4) AS avg_height
             |FROM m GROUP BY wide ORDER BY wide""".stripMargin)),

    CatalogQuery(
      "mm03_frame_sample",
      "Video-style frame sampling: 16-byte frames at stride 4, per-frame md5, per-doc dedup summary",
      (s, dir) => {
        // The frame-sample stage of a video pipeline over the opaque
        // payload: cut fixed-width frames, keep every 4th, hash each.
        // All binary slicing + hashing runs as row-generation inside
        // codegen (no UDF, no decode) — the stride means a 100 TB
        // corpus reads everything but HASHES only a quarter, and the
        // per-frame md5 is what a real pipeline stores for cross-video
        // frame dedup. md5-over-bytes is engine-portable, so unlike
        // mm01/mm02 (xxhash64 metadata) this one is value-oracled: the
        // payloads are ASCII text bytes, making Spark's binary substr
        // and DuckDB's VARCHAR substr slice identical bytes.
        mediaTable(s, dir)
          .withColumn("nf", floor(length(col("payload")) / lit(16)).cast("long"))
          .withColumn("fr", when(col("nf") > 0, expr(
            "transform(sequence(0, cast(nf as int) - 1, 4)," +
              " i -> md5(substr(payload, i * 16 + 1, 16)))"))
            .otherwise(array().cast("array<string>")))
          .select(col("doc_id"), col("nf").as("n_frames"),
            size(col("fr")).cast("long").as("n_sampled"),
            size(array_distinct(col("fr"))).cast("long").as("n_distinct"),
            // try_element_at, not element_at: under ANSI mode (Spark 4
            // default) element_at throws on the empty frame list of a
            // sub-16-byte payload; the oracle's fr[1] yields NULL there
            try_element_at(col("fr"), lit(1)).as("first_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CAST(floor(length(text) / 16) AS BIGINT) AS n_frames,
             |    CASE WHEN length(text) >= 16 THEN
             |      list_transform(range(0, CAST(floor(length(text) / 16) AS BIGINT), 4),
             |        i -> md5(substr(text, CAST(i*16+1 AS INT), 16)))
             |    ELSE [] END AS fr
             |  FROM documents)
             |SELECT doc_id, n_frames,
             |  CAST(len(fr) AS BIGINT) AS n_sampled,
             |  CAST(len(list_distinct(fr)) AS BIGINT) AS n_distinct,
             |  fr[1] AS first_md5
             |FROM f ORDER BY doc_id""".stripMargin)),
  )
}

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
  * partition-count preserved — and the codec (`MediaCodec`) now does a
  * REAL image decode for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio`, pure JVM, no native deps):
  * image payloads yield an 8-bucket luminance histogram over decoded
  * pixels. Non-image payloads (the synthetic fixtures are UTF-8 text
  * bytes, which never carry an image magic number) fall back to the
  * deterministic byte histogram, which is what the DuckDB value oracle
  * reproduces. Audio/video decode would slot into the same sniff →
  * decode → fixed-width-features shape.
  */
object MultimodalQueries {

  /** mm06's flooded-segment bound: a frame-shingle shared by more than
    * this many medias star-chains around its min-id representative
    * instead of emitting all K² pairs (the dd03 flooded-bucket rule).
    * Mirrored literally in mm06's DuckDB oracle — change both
    * together. */
  val MaxSegSpread = 20

  /** mm06's pair stage over DISTINCT (doc_id, seg) rows: pairs of docs
    * sharing a segment, counted per pair, with the [[MaxSegSpread]]
    * flooded-segment rule — segments spread over more than the bound
    * star-chain around their min-id representative (rep < member, so
    * the doc_a < doc_b orientation is preserved), bounding a viral
    * clip's fanout to O(K). Exposed for the planted-flood spec. */
  private[graft] def sharedSegmentPairs(segs: DataFrame): DataFrame = {
    // one aggregation yields both the size gate and the
    // representative; the join back is co-partitioned on seg
    val stats = segs.groupBy(col("seg"))
      .agg(count(lit(1)).as("_n"), min(col("doc_id")).as("_rep"))
    val tagged = segs.join(stats, Seq("seg"))
    val small = tagged.filter(col("_n") <= MaxSegSpread)
    val allPairs = small.as("a").join(small.as("b"),
        col("a.seg") === col("b.seg") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val chained = tagged
      .filter(col("_n") > MaxSegSpread && col("doc_id") =!= col("_rep"))
      .select(col("_rep").as("doc_a"), col("doc_id").as("doc_b"))
    allPairs.union(chained)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_segs"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Per-partition media decoder. Format is sniffed from magic bytes so
    * a mixed corpus (images + opaque blobs) takes the right path per
    * row without a schema-level format column. */
  object MediaCodec {
    val FeatureDim = 8

    private def isPng(p: Array[Byte]) = p.length >= 8 &&
      (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
    private def isJpeg(p: Array[Byte]) = p.length >= 3 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff
    private def isGif(p: Array[Byte]) = p.length >= 6 &&
      p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'
    private def isBmp(p: Array[Byte]) = p.length >= 14 &&
      p(0) == 'B' && p(1) == 'M'
    private def isImage(p: Array[Byte]) =
      isPng(p) || isJpeg(p) || isGif(p) || isBmp(p)

    /** Real decode for JDK-supported image formats: 8-bucket LUMINANCE
      * histogram over decoded pixels (ITU-R BT.601 integer luma,
      * bucket = luma >> 5). A corrupt image payload (magic matches,
      * body doesn't decode) falls back to the byte histogram rather
      * than failing the partition — at 100 TB some blobs WILL be
      * truncated, and a poison row must not kill the stage. */
    def decodeFeatures(payload: Array[Byte]): Array[Long] =
      if (isImage(payload)) decodeImage(payload).getOrElse(byteHistogram(payload))
      else byteHistogram(payload)

    private[graft] def decodeImage(payload: Array[Byte]): Option[Array[Long]] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val h = new Array[Long](FeatureDim)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val luma = (299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              h(luma >>> 5) += 1
              x += 1
            }
            y += 1
          }
          Some(h)
        }
      } catch { case _: java.io.IOException => None }

    /** Non-image fallback: 8-bucket byte histogram (bucket = byte >> 5)
      * — deterministic and DuckDB-reproducible, the oracle surface for
      * the text-byte fixtures. */
    private[graft] def byteHistogram(payload: Array[Byte]): Array[Long] = {
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

  /** The mm01 extraction stage, factored so specs can push REAL image
    * payloads through the identical distributed path the catalog query
    * uses (mapPartitions batch shape: one codec context per partition,
    * not per row). */
  def extractFeatures(media: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val f = MediaCodec.decodeFeatures(r.payload)
        FeatureRow(r.doc_id, r.width, r.height, r.payload.length.toLong, f)
      }
    }
  }

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
      "Binary media column + metadata struct → per-partition batch feature extraction (magic-sniffing codec: real javax.imageio decode for PNG/BMP/GIF/JPEG payloads, byte histogram for opaque blobs)",
      (s, dir) => {
        import s.implicits._
        val media = mediaTable(s, dir).as[MediaRow]
        extractFeatures(media).toDF()
          .select(col("doc_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height"), col("n_bytes"),
            aggregate(col("features"), lit(0L), (a, x) => a + x).as("feature_mass"),
            concat_ws(",", col("features")).as("feature_csv"))
          .orderBy(col("doc_id"))
      },
      // Value oracle: the payload is the ASCII text's UTF-8 bytes (the
      // fixture is pinned ASCII-only in ExtSpec, so byte == char), text
      // payloads take the codec's non-image path — an 8-bucket byte
      // histogram (bucket = code >> 5) — and the metadata dims are
      // md5-derived — all reproducible in DuckDB exactly. (Image
      // payloads would take the real-decode path, exercised in ExtSpec
      // with a generated PNG; the fixture has none by construction.)
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

    CatalogQuery(
      "mm04_media_neardup",
      "Near-duplicate media detection: quantized feature-histogram signature buckets + exact integer L1 verification (the pHash bucket-then-verify shape over codec features)",
      (s, dir) => {
        // Image dedup in a multimodal pipeline is perceptual-hash
        // bucketing: quantize decoded features to a coarse signature,
        // bucket on it (only plausible pairs ever meet), verify
        // candidates with an exact distance. Here the features are the
        // codec's 8-bucket histograms (mm01's real-decode path for
        // images, byte histogram for opaque blobs), the signature is
        // the per-bucket mass share quantized to eighths (integer
        // division — scale-invariant, so re-encoded/padded copies
        // still collide), and the verify is exact integer L1 with a
        // relative threshold (l1·10 ≤ massA+massB), cross-multiplied —
        // no floats anywhere. Oversized signature buckets rep-chain
        // through the bucket minimum (dd12's guard): candidates stay
        // O(bucket), never O(bucket²), at any duplication skew.
        import s.implicits._
        val media = mediaTable(s, dir).as[MediaRow]
        val feats = extractFeatures(media).toDF()
          .select(col("doc_id"), col("features"))
          .withColumn("total",
            aggregate(col("features"), lit(0L), (a, x) => a + x))
          .filter(col("total") > 0)
        val sigCols = (0 until MediaCodec.FeatureDim).map(b =>
          expr(s"element_at(features, ${b + 1}) * 8 div total"))
        val rows = feats.select(col("doc_id"),
          concat_ws(",", sigCols: _*).as("sig"))
        val stats = rows.groupBy(col("sig"))
          .agg(count(lit(1)).as("_n"), min(col("doc_id")).as("_rep"))
        val tagged = rows.join(stats, Seq("sig"))
        val small = tagged.filter(col("_n") <= 64)
        val allPairs = small.as("x").join(small.as("y"),
            col("x.sig") === col("y.sig") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        val chained = tagged.filter(col("_n") > 64 &&
            col("doc_id") =!= col("_rep"))
          .select(col("_rep").as("a_id"), col("doc_id").as("b_id"))
        // one signature per doc -> buckets are disjoint, pairs unique
        val pairs = allPairs.union(chained)
        val l1 = aggregate(
          zip_with(col("fa"), col("fb"), (p, q) => abs(p - q)),
          lit(0L), (a, x) => a + x)
        pairs
          .join(feats.select(col("doc_id").as("a_id"),
            col("features").as("fa"), col("total").as("ta")), "a_id")
          .join(feats.select(col("doc_id").as("b_id"),
            col("features").as("fb"), col("total").as("tb")), "b_id")
          .withColumn("l1", l1)
          .filter(col("l1") * 10 <= col("ta") + col("tb"))
          .select(col("a_id"), col("b_id"), col("l1"))
          .orderBy(col("a_id"), col("b_id"))
      },
      // Same histogram derivation as mm01's oracle (ASCII pin: byte ==
      // char), signature/threshold arithmetic all integer division and
      // cross-multiplication — bit-exact in both engines.
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CASE WHEN len(text) = 0 THEN [0, 0, 0, 0, 0, 0, 0, 0]
             |         ELSE list_transform(range(0, 8), b ->
             |           len(list_filter(split(text, ''), ch -> ascii(ch) // 32 = b)))
             |    END AS features
             |  FROM documents),
             |f AS (SELECT doc_id, features, list_sum(features) AS total
             |      FROM m WHERE list_sum(features) > 0),
             |s AS (SELECT doc_id,
             |        array_to_string(list_transform(range(0, 8),
             |          b -> features[b + 1] * 8 // total), ',') AS sig
             |      FROM f),
             |ct AS (SELECT sig, count(*) AS n, min(doc_id) AS rep
             |       FROM s GROUP BY sig),
             |t AS (SELECT s.*, ct.n, ct.rep FROM s JOIN ct USING (sig)),
             |cand AS (
             |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
             |  FROM t x JOIN t y ON x.sig = y.sig AND x.doc_id < y.doc_id
             |  WHERE x.n <= 64
             |  UNION ALL
             |  SELECT rep, doc_id FROM t WHERE n > 64 AND doc_id <> rep),
             |v AS (SELECT c.a_id, c.b_id,
             |        list_sum(list_transform(range(0, 8),
             |          i -> abs(fa.features[i + 1] - fb.features[i + 1]))) AS l1,
             |        fa.total AS ta, fb.total AS tb
             |      FROM cand c
             |      JOIN f fa ON fa.doc_id = c.a_id
             |      JOIN f fb ON fb.doc_id = c.b_id)
             |SELECT a_id, b_id, CAST(l1 AS BIGINT) AS l1
             |FROM v WHERE l1 * 10 <= ta + tb
             |ORDER BY a_id, b_id""".stripMargin)),

    CatalogQuery(
      "mm05_alignment_filter",
      "Text-media alignment filtering (LAION/CLIP-score shape): hashed bag-of-words text projection scored against the row's embedding by integer-exact cosine; keep pairs with alignment >= 0",
      (s, dir) => {
        // The multimodal-pair curation step: score how well a sample's
        // text matches its media embedding, keep aligned pairs (LAION
        // kept CLIP-score >= 0.28; the threshold here is 0 on a
        // synthetic corpus). The text encoder is a feature-hashed
        // bag-of-words projection into the embedding's 64 dims — a
        // stand-in with the IDENTICAL plan shape as scoring against a
        // real text-tower output (at scale that column arrives
        // precomputed, exactly like the image embedding does). All
        // alignment arithmetic is engine-exact: the projection is
        // integer token counts per dim, the embedding quantizes to e6
        // integers, so the cosine numerator is an exact LONG sum and
        // the norms/divide are IEEE correctly-rounded sqrt/div.
        // Shuffles: one (doc, dim) partial-agg, one (id, dim)
        // co-partitioned join against the 64-row-per-vector component
        // relation, one narrow per-vector norm agg — everything keyed,
        // nothing quadratic.
        val tok = TextOps.fanOut(Tables.table(s, dir, "documents"))
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        graft.functions.HashOps.register(s)
        val dim = (graft.functions.HashOps.md5Seg32(col("t"), 0)
          .bitwiseAND(lit(Int.MaxValue.toLong)) % 64).as("dim")
        val tc = tok.select(col("doc_id"), dim)
          .groupBy(col("doc_id"), col("dim")).agg(count(lit(1)).as("cnt"))
        val comp = Tables.table(s, dir, "embeddings")
          .select(col("vec_id"),
            posexplode(col("embedding").cast("array<double>"))
              .as(Seq("idx", "c")))
          .select(col("vec_id"), col("idx").cast("long").as("idx"),
            round(col("c") * 1e6).cast("long").as("c6"))
        val ni = comp.groupBy(col("vec_id"))
          .agg(sum(col("c6") * col("c6")).as("ni2"))
        val agg = tc.join(comp,
            tc("doc_id") === comp("vec_id") && tc("dim") === comp("idx"))
          .groupBy(tc("doc_id"))
          .agg(sum(col("cnt") * col("c6")).as("num"),
            sum(col("cnt") * col("cnt")).as("nt2"))
        agg.join(ni, agg("doc_id") === ni("vec_id"))
          .select(col("doc_id"), col("num"),
            when(col("ni2") === 0, lit(0L)).otherwise(
              round(col("num") / (sqrt(col("nt2")) * sqrt(col("ni2"))) * 1e6)
                .cast("long")).as("align_e6"))
          .withColumn("keep", (col("align_e6") >= 0).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t
             |  FROM documents),
             |tc AS (
             |  SELECT doc_id,
             |    (('0x' || substr(md5(t), 1, 8))::BIGINT & 2147483647) % 64
             |      AS dim,
             |    count(*) AS cnt
             |  FROM tok GROUP BY 1, 2),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
             |      FROM embeddings),
             |comp AS (
             |  SELECT vec_id, u['idx'] AS idx, u['c6'] AS c6 FROM (
             |    SELECT vec_id, unnest(list_transform(range(1, 65),
             |      i -> {'idx': i - 1,
             |            'c6': CAST(round(emb[i] * 1000000.0) AS BIGINT)})) AS u
             |    FROM e)),
             |ni AS (SELECT vec_id, sum(c6 * c6) AS ni2 FROM comp
             |       GROUP BY vec_id),
             |ag AS (
             |  SELECT tc.doc_id, sum(tc.cnt * comp.c6) AS num,
             |    sum(tc.cnt * tc.cnt) AS nt2
             |  FROM tc JOIN comp
             |    ON comp.vec_id = tc.doc_id AND comp.idx = tc.dim
             |  GROUP BY tc.doc_id)
             |SELECT ag.doc_id, CAST(num AS BIGINT) AS num,
             |  CAST(CASE WHEN ni2 = 0 THEN 0
             |    ELSE round(CAST(num AS DOUBLE) /
             |      (sqrt(CAST(nt2 AS DOUBLE)) * sqrt(CAST(ni2 AS DOUBLE)))
             |      * 1000000.0) END AS BIGINT) AS align_e6,
             |  CAST(CASE WHEN (CASE WHEN ni2 = 0 THEN 0
             |    ELSE round(CAST(num AS DOUBLE) /
             |      (sqrt(CAST(nt2 AS DOUBLE)) * sqrt(CAST(ni2 AS DOUBLE)))
             |      * 1000000.0) END) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM ag JOIN ni ON ni.vec_id = ag.doc_id
             |ORDER BY ag.doc_id""".stripMargin)),

    CatalogQuery(
      "mm06_segment_dedup",
      "Cross-video duplicated-segment detection: 3-frame shingles over mm03's sampled frame hashes, pairs of media sharing any >=3-frame run — the copied-clip report a video pipeline runs before training",
      (s, dir) => {
        // dd05's shingle idea lifted from tokens to FRAMES: mm03's
        // per-frame md5 sequence (stride-4 sampled, codegen'd binary
        // slicing, no decode) shingled 3-wide, so a match is a
        // contiguous >= 3-sampled-frame run copied between two medias —
        // byte-identical segments, the pre-embedding exact tier of
        // video dedup (near-dup segments are dd12's embedding path).
        // One shuffle hashed on the shingle; per-shingle fanout is the
        // segment's cross-corpus spread, CAPPED: a segment shared by
        // more than MaxSegSpread medias star-chains around its min-id
        // representative (dd03's flooded-bucket rule lifted to frame
        // shingles), so a viral clip in K videos costs O(K) pairs, not
        // K². Pair counts through a flooded segment degrade to
        // rep-anchored edges — same bounded-work/degraded-resolution
        // trade as TextOps' LSH buckets, and the fixtures (max spread
        // 4) are unaffected. Output is |matching pairs| rows.
        val frames = mediaTable(s, dir)
          .withColumn("nf", floor(length(col("payload")) / lit(16)).cast("long"))
          .withColumn("fr", when(col("nf") > 0, expr(
            "transform(sequence(0, cast(nf as int) - 1, 4)," +
              " i -> md5(substr(payload, i * 16 + 1, 16)))"))
            .otherwise(array().cast("array<string>")))
        val segs = frames
          .withColumn("seg", explode(when(size(col("fr")) >= 3, expr(
            "transform(sequence(0, size(fr) - 3)," +
              " i -> concat(fr[i], '|', fr[i+1], '|', fr[i+2]))"))
            .otherwise(array().cast("array<string>"))))
          .select(col("doc_id"), col("seg")).distinct()
        sharedSegmentPairs(segs)
      },
      // same construction over the documents' text bytes (the payloads
      // are ASCII, so VARCHAR substr slices identical bytes — mm03's
      // precedent); DuckDB arrays are 1-based where Spark subscripts
      // are 0-based, hence the shifted indices. The flood cap is
      // INTERPOLATED from MaxSegSpread (PipelineQueries.splitSql's
      // precedent) so the Spark helper and the oracle cannot drift.
      Some(s"""WITH f AS (
             |  SELECT doc_id,
             |    CASE WHEN length(text) >= 16 THEN
             |      list_transform(range(0, CAST(floor(length(text) / 16) AS BIGINT), 4),
             |        i -> md5(substr(text, CAST(i*16+1 AS INT), 16)))
             |    ELSE [] END AS fr
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, unnest(CASE WHEN len(fr) >= 3 THEN
             |    list_transform(range(1, len(fr) - 1),
             |      i -> fr[i] || '|' || fr[i+1] || '|' || fr[i+2])
             |    ELSE [] END) AS seg
             |  FROM f),
             |d AS (SELECT DISTINCT doc_id, seg FROM sh),
             |st AS (SELECT seg, count(*) AS n, min(doc_id) AS rep
             |       FROM d GROUP BY seg),
             |tg AS (SELECT d.doc_id, d.seg, st.n, st.rep
             |       FROM d JOIN st USING (seg)),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM tg a JOIN tg b
             |    ON a.seg = b.seg AND a.doc_id < b.doc_id
             |  WHERE a.n <= $MaxSegSpread
             |  UNION ALL
             |  SELECT rep AS doc_a, doc_id AS doc_b
             |  FROM tg WHERE n > $MaxSegSpread AND doc_id <> rep)
             |SELECT doc_a, doc_b, count(*) AS n_shared_segs
             |FROM pairs
             |GROUP BY 1, 2
             |ORDER BY doc_a, doc_b""".stripMargin)),

    CatalogQuery(
      "mm07_static_detection",
      "Frozen/static-video detection: run-lengths of IDENTICAL consecutive sampled frame hashes per media (gaps-and-islands over mm03's frame sequence) — the QC gate that drops stuck-camera / corrupt-encode clips before training",
      (s, dir) => {
        // mm06 finds segments copied ACROSS videos; this flags
        // degenerate repetition WITHIN one: a run of identical sampled
        // frames is a frozen/static stretch (stuck camera, encoder
        // failure, slideware) that contributes near-zero training
        // signal. Classic gaps-and-islands: change-points via lag,
        // run ids via a running sum, run lengths via one grouped
        // count — every window is partitioned by doc_id and a media's
        // sampled-frame list is bounded by its payload, so all three
        // stages are partition-local per media and the shape is flat
        // however many medias the corpus holds. keep = AT MOST half
        // the sampled frames sit in runs >= 3 (static*2 <= n, integer
        // arithmetic, no float threshold; the exactly-half boundary
        // keeps).
        import org.apache.spark.sql.expressions.Window
        val frames = mediaTable(s, dir)
          .withColumn("nf", floor(length(col("payload")) / lit(16)).cast("long"))
          .withColumn("fr", when(col("nf") > 0, expr(
            "transform(sequence(0, cast(nf as int) - 1, 4)," +
              " i -> md5(substr(payload, i * 16 + 1, 16)))"))
            .otherwise(array().cast("array<string>")))
        val pos = frames.select(col("doc_id"),
          posexplode(col("fr")).as(Seq("pos", "fh")))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val runs = pos
          .withColumn("chg", when(lag(col("fh"), 1).over(w).isNull ||
            lag(col("fh"), 1).over(w) =!= col("fh"), lit(1L)).otherwise(lit(0L)))
          .withColumn("run_id", sum(col("chg")).over(w))
          .groupBy(col("doc_id"), col("run_id"))
          .agg(count(lit(1)).as("run_len"))
        val perDoc = runs.groupBy(col("doc_id"))
          .agg(sum(col("run_len")).as("n_sampled"),
            max(col("run_len")).as("max_run"),
            coalesce(sum(when(col("run_len") >= 3, col("run_len"))), lit(0L))
              .as("static_frames"))
        // left join back so sub-16-byte payloads (zero sampled frames)
        // still report, trivially kept
        mediaTable(s, dir).select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
            coalesce(col("max_run"), lit(0L)).as("max_run"),
            coalesce(col("static_frames"), lit(0L)).as("static_frames"),
            when(coalesce(col("static_frames"), lit(0L)) * 2 <=
              coalesce(col("n_sampled"), lit(0L)), lit(1L)).otherwise(lit(0L))
              .as("keep"))
          .orderBy(col("doc_id"))
      },
      // same frame construction as mm03's oracle (ASCII payloads make
      // VARCHAR substr slice identical bytes); positions via the
      // struct-unnest idiom, windows mirror the Spark frames exactly
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CASE WHEN length(text) >= 16 THEN
             |      list_transform(range(0, CAST(floor(length(text) / 16) AS BIGINT), 4),
             |        i -> md5(substr(text, CAST(i*16+1 AS INT), 16)))
             |    ELSE [] END AS fr
             |  FROM documents),
             |p AS (SELECT doc_id, u['pos'] AS pos, u['fh'] AS fh FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(fr) + 1),
             |    i -> {'pos': i, 'fh': fr[i]})) AS u
             |  FROM f)),
             |r AS (SELECT doc_id, pos,
             |  CASE WHEN lag(fh) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
             |         OR lag(fh) OVER (PARTITION BY doc_id ORDER BY pos) <> fh
             |       THEN 1 ELSE 0 END AS chg
             |  FROM p),
             |ri AS (SELECT doc_id,
             |  sum(chg) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
             |  FROM r),
             |runs AS (SELECT doc_id, run_id, count(*) AS run_len
             |  FROM ri GROUP BY doc_id, run_id),
             |pd AS (SELECT doc_id, sum(run_len) AS n_sampled,
             |    max(run_len) AS max_run,
             |    coalesce(sum(CASE WHEN run_len >= 3 THEN run_len END), 0)
             |      AS static_frames
             |  FROM runs GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(pd.n_sampled, 0) AS BIGINT) AS n_sampled,
             |  CAST(coalesce(pd.max_run, 0) AS BIGINT) AS max_run,
             |  CAST(coalesce(pd.static_frames, 0) AS BIGINT) AS static_frames,
             |  CAST(CASE WHEN coalesce(pd.static_frames, 0) * 2 <=
             |    coalesce(pd.n_sampled, 0) THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    CatalogQuery(
      "mm08_video_offset_neardup",
      "Temporal-ALIGNMENT video near-dup: single sampled frames matched across media vote on a (pair, offset) cell; >= 3 frames agreeing on one offset flag a trimmed/intercut copy AND report the alignment itself — catches edits mm06's contiguous 3-frame shingle can't",
      (s, dir) => {
        // mm06 requires a CONTIGUOUS >= 3-frame run to survive its
        // shingle; a copy with interspersed edits (overlays, cutaways,
        // re-encoded stretches) matches frame-by-frame but never three
        // in a row. Offset voting is the standard fix: every matched
        // frame pair casts a vote for its temporal offset, and a pair
        // of media whose votes CONCENTRATE on one offset is an aligned
        // copy even when the matches are scattered. Returns the winning
        // offset (what downstream trimming/provenance consumes), in
        // sampled-frame units (x4 frames, x64 payload bytes).
        // Scale: two flood guards keep the fh self-join linear —
        // (1) only frames occurring ONCE within their media vote
        // (a frozen run — mm07's finding — would vote at every
        // self-alignment); (2) frames in > 32 media are dropped
        // (black/slate frames; mm04's MaxSegSpread precedent), so a
        // digest joins <= 32x31/2 pairs however big the corpus. The
        // (a,b,off) count map-combines; the per-pair argmax window is
        // bounded by a pair's offset fan, never global.
        import org.apache.spark.sql.expressions.Window
        val frames = mediaTable(s, dir)
          .withColumn("nf", floor(length(col("payload")) / lit(16)).cast("long"))
          .withColumn("fr", when(col("nf") > 0, expr(
            "transform(sequence(0, cast(nf as int) - 1, 4)," +
              " i -> md5(substr(payload, i * 16 + 1, 16)))"))
            .otherwise(array().cast("array<string>")))
          .select(col("doc_id"), posexplode(col("fr")).as(Seq("j", "fh")))
          .select(col("doc_id"), col("j").cast("long").as("j"), col("fh"))
        val solo = frames.groupBy(col("doc_id"), col("fh"))
          .agg(count(lit(1)).as("c"), min(col("j")).as("j"))
          .filter(col("c") === 1)
          .select(col("doc_id"), col("fh"), col("j"))
        val rare = solo.groupBy(col("fh")).agg(count(lit(1)).as("nd"))
          .filter(col("nd").between(2, 32)).select(col("fh"))
        val cand = solo.join(rare, "fh")
        val votes = cand.as("a").join(cand.as("b"),
            col("a.fh") === col("b.fh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            (col("b.j") - col("a.j")).as("off"))
          .groupBy(col("a_id"), col("b_id"), col("off"))
          .agg(count(lit(1)).as("n_aligned"))
          .filter(col("n_aligned") >= 3)
        val w = Window.partitionBy(col("a_id"), col("b_id"))
          .orderBy(col("n_aligned").desc, abs(col("off")), col("off"))
        votes.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("a_id"), col("b_id"), col("off"), col("n_aligned"))
          .orderBy(col("a_id"), col("b_id"))
      },
      // mm03's frame chain; the argmax tiebreak (max votes, then
      // smallest |offset|, then signed offset) is spelled identically
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CASE WHEN length(text) >= 16 THEN
             |      list_transform(range(0, CAST(floor(length(text) / 16) AS BIGINT), 4),
             |        i -> md5(substr(text, CAST(i*16+1 AS INT), 16)))
             |    ELSE [] END AS fr
             |  FROM documents),
             |fx AS (SELECT doc_id, u['j'] AS j, u['fh'] AS fh FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(fr) + 1),
             |    i -> {'j': i - 1, 'fh': fr[i]})) AS u FROM f)),
             |solo AS (SELECT doc_id, fh, min(j) AS j FROM fx
             |         GROUP BY doc_id, fh HAVING count(*) = 1),
             |rare AS (SELECT fh FROM (
             |    SELECT fh, count(*) AS nd FROM solo GROUP BY fh)
             |  WHERE nd BETWEEN 2 AND 32),
             |cand AS (SELECT solo.doc_id, solo.fh, solo.j
             |         FROM solo JOIN rare USING (fh)),
             |votes AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    b.j - a.j AS off, count(*) AS n_aligned
             |  FROM cand a JOIN cand b
             |    ON a.fh = b.fh AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3
             |  HAVING count(*) >= 3),
             |best AS (SELECT a_id, b_id, off, n_aligned,
             |    row_number() OVER (PARTITION BY a_id, b_id
             |      ORDER BY n_aligned DESC, abs(off), off) AS rn
             |  FROM votes)
             |SELECT a_id, b_id, CAST(off AS BIGINT) AS off,
             |  CAST(n_aligned AS BIGINT) AS n_aligned
             |FROM best WHERE rn = 1
             |ORDER BY a_id, b_id""".stripMargin)),
  )
}

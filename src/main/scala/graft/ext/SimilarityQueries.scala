package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.CatalogQuery
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * ss01 is the exact brute-force baseline: broadcast the (small) query
  * set against the corpus — O(|Q|·n) with no shuffle of the corpus,
  * the right plan when |Q| ≪ n even at 100 TB.
  *
  * ss02 is the scale path: random-hyperplane LSH. Signatures are a
  * deterministic function of the vector (hyperplanes derived from a
  * hash-mixed constant, not an RNG), so results are reproducible across
  * runs and cluster layouts. Probing widens to Hamming-≤1 signature
  * neighbors to recover recall lost to bucket boundaries.
  */
object SimilarityQueries {

  private val Dim = 64
  private val Planes = 12

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5). */
  private def planeVal(j: Int, i: Int): Double = {
    var h = (j.toLong * 1315423911L) ^ (i.toLong * 2654435761L)
    h ^= (h >>> 13); h *= 0x5bd1e9955bd1e995L; h ^= (h >>> 31)
    ((h & 0xffffL).toDouble / 65536.0) - 0.5
  }

  private def planeCol(j: Int): Column =
    array((0 until Dim).map(i => lit(planeVal(j, i))): _*)

  /** LSH signature: bit j = sign(v · plane_j). */
  private def signature(v: Column): Column =
    (0 until Planes).map { j =>
      val dot = graft.functions.VectorOps.dot(v, planeCol(j))
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Pre-normalized vectors: pair scoring becomes one codegen'd dot. */
  private def embeddings(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorOps.register(s)
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.VectorOps.normalize(col("embedding").cast("array<double>")).as("v"))
  }

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "ss01_ann_bruteforce",
      "Exact top-5 cosine neighbors for 10 query vectors — broadcast queries, no corpus shuffle",
      (s, dir) => {
        val e = embeddings(s, dir)
        val q = broadcast(e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv")))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
        q.join(e, col("vec_id") =!= col("q_id"))
          .withColumn("cos", graft.functions.VectorOps.dot(col("qv"), col("v")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
            round(col("cos") * 1e6).cast("long").as("cos_e6"))
          .orderBy(col("q_id"), col("rank"))
      },
      None),

    CatalogQuery(
      "ss02_ann_lsh",
      "LSH-bucketed ANN: random-hyperplane signatures, Hamming-≤1 multi-probe, exact re-rank in bucket",
      (s, dir) => {
        val e = embeddings(s, dir).withColumn("sig", signature(col("v")))
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sig").as("qsig"))
        // Multi-probe: each query also probes every signature at
        // Hamming distance 1 (flip one bit) — Planes+1 probes/query.
        val probes = broadcast(q.select(col("q_id"), col("qv"), col("qsig"),
          explode(array((lit(-1) +: (0 until Planes).map(lit(_))): _*)).as("flip"))
          .withColumn("probe_sig",
            when(col("flip") === -1, col("qsig"))
              .otherwise(expr(s"qsig ^ (1 << flip)")))
          .select(col("q_id"), col("qv"), col("probe_sig")))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
        probes.join(e, col("probe_sig") === col("sig") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("qv"), col("vec_id"), col("v")).distinct()
          .withColumn("cos", graft.functions.VectorOps.dot(col("qv"), col("v")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
            round(col("cos") * 1e6).cast("long").as("cos_e6"))
          .orderBy(col("q_id"), col("rank"))
      },
      None),

    CatalogQuery(
      "ss03_ann_ivf",
      "IVF ANN: KMeans coarse quantizer buckets the corpus; queries probe their 4 nearest centroids, exact re-rank inside",
      (s, dir) => {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
        val e = embeddings(s, dir).withColumn("fv", array_to_vector(col("v")))
        // few iterations + random init: the quantizer only needs stable
        // buckets, not converged centroids (re-rank inside the bucket is
        // exact), and kmeans|| init costs ~2 extra passes over the corpus
        // per round — at 100 TB the quantizer would be fit on a sample
        val km = new KMeans().setK(16).setMaxIter(5).setSeed(42)
          .setInitMode("random")
          .setFeaturesCol("fv").fit(e)
        val assigned = km.transform(e)
          .select(col("vec_id"), col("v"), col("prediction").as("bucket"))
        // centroid list is tiny (k rows): distribute it, probe by dot
        val centroids = s.createDataFrame(
          km.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) })
          .toDF("bucket", "centroid")
        val q = assigned.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        // probe ranking must use the quantizer's own metric: KMeans
        // assigns by Euclidean distance, and for unit queries the
        // Euclidean-nearest centroid is argmax(q·c − ‖c‖²/2) — raw dot
        // would favor long-norm centroids and probe the wrong buckets
        val wProbe = Window.partitionBy(col("q_id")).orderBy(col("cd").desc, col("bucket"))
        val probes = q.crossJoin(broadcast(centroids))
          .withColumn("cd",
            graft.functions.VectorOps.dot(col("qv"), col("centroid")) -
              graft.functions.VectorOps.dot(col("centroid"), col("centroid")) / 2.0)
          .withColumn("pr", row_number().over(wProbe))
          .filter(col("pr") <= 4)
          .select(col("q_id"), col("qv"), col("bucket"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
        probes.join(assigned, Seq("bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos", graft.functions.VectorOps.dot(col("qv"), col("v")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
            round(col("cos") * 1e6).cast("long").as("cos_e6"))
          .orderBy(col("q_id"), col("rank"))
      },
      None),
  )
}

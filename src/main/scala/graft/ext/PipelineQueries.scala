package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CatalogQuery
import graft.sources.Tables

/** Training-pipeline assembly operators: the steps between a cleaned
  * corpus and the tensors a trainer reads — sequence packing and
  * deterministic dataset splitting.
  *
  * Design for 100 TB: both operators are pure functions of (doc_id,
  * token count), so they need one scan and at most one window per hash
  * bucket — no global sort, no RNG, no driver state. Determinism is the
  * point: a resumable pipeline must assign the same doc to the same
  * chunk/split on every re-run, on any cluster size.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "dp01_concat_chunks",
      "Sequence packing, concat-then-chunk: per-bucket token cumsum maps each doc to its fixed-size (256-token) training-chunk span",
      (s, dir) => {
        // The pretraining packing model: docs are concatenated in a
        // deterministic order and the stream is cut every B tokens, so a
        // doc's chunk span is a closed-form function of its cumulative
        // offset — no bin-packing iteration, no state. Buckets bound the
        // window: cumsum partitions by doc_id % 8 (a cluster deployment
        // raises this to O(cores)), so no partition ever sees more than
        // corpus/8 rows and there is NO global sort.
        val b = 256L
        val t = docs(s, dir).select(
          col("doc_id"),
          (col("doc_id") % 8).as("bucket"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val off = (sum(col("n_tok")).over(w) - col("n_tok")).as("off")
        t.select(col("doc_id"), col("bucket"), col("n_tok"), off)
          .select(col("doc_id"), col("bucket"), col("n_tok"), col("off"),
            expr(s"off div $b").as("first_chunk"),
            expr(s"(off + n_tok - 1) div $b").as("last_chunk"),
            expr(s"(off + n_tok - 1) div $b - off div $b + 1").as("n_seqs"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS bucket,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, bucket, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
             |  FROM t)
             |SELECT doc_id, bucket, n_tok, off,
             |  CAST(off // 256 AS BIGINT) AS first_chunk,
             |  CAST((off + n_tok - 1) // 256 AS BIGINT) AS last_chunk,
             |  CAST((off + n_tok - 1) // 256 - off // 256 + 1 AS BIGINT) AS n_seqs
             |FROM o ORDER BY doc_id""".stripMargin)),

    CatalogQuery(
      "dp02_train_split",
      "Deterministic hash train/val/test split (md5 of doc_id: ~5% val, ~5% test) with per-split token totals",
      (s, dir) => {
        // membership is a pure function of doc_id (no RNG, no
        // sample()): re-runs and different partitionings yield the
        // identical split, and adding docs never reshuffles old ones —
        // the property that keeps a 100 TB eval set stable across
        // pipeline versions. One scan + one 3-group aggregate.
        val h = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2)
        val split = when(h < "0d", lit("val"))
          .when(h < "1a", lit("test"))
          .otherwise(lit("train"))
        docs(s, dir)
          .select(split.as("split"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
            col("doc_id"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("total_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("split"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
             |    substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
             |  FROM documents)
             |SELECT
             |  CASE WHEN h < '0d' THEN 'val' WHEN h < '1a' THEN 'test'
             |    ELSE 'train' END AS split,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |  CAST(min(doc_id) AS BIGINT) AS first_doc
             |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}

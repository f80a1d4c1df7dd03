package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one copy of the storage-backed streaming-state read idiom
  * shared by DocsStream and BudgetStream: state lives under
  * `dir/batch_id=N` (overwrite-by-batchId, so at-least-once replay is
  * idempotent), and a standing view must EXCLUDE the current batchId
  * so a replayed batch never reads its own previous attempt. */
private[streaming] object StreamState {

  /** The state directory as a DataFrame (batch_id partition column
    * included), or None when no batch has landed yet. Callers apply
    * their own exclusion filter + projection/aggregation so the
    * missing-dir handling cannot drift between streams. */
  def readDir(spark: SparkSession, dir: String): Option[DataFrame] =
    try Some(spark.read.option("basePath", dir).parquet(dir))
    catch { case _: org.apache.spark.sql.AnalysisException => None }
}

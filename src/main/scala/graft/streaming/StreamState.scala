package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The one copy of the storage-backed streaming-state read idiom
  * shared by DocsStream and BudgetStream: state lives under
  * `dir/batch_id=N` (overwrite-by-batchId, so at-least-once replay is
  * idempotent), and a standing view must EXCLUDE the current batchId
  * so a replayed batch never reads its own previous attempt. */
object StreamState {

  /** The folded-history partition [[compact]] writes. Real batch ids
    * are ≥ 0, so a standing view's `batch_id =!= currentBatch` filter
    * can never exclude the base — folded keys stay visible to every
    * future batch. */
  val BaseBatchId: Long = -1L

  /** Delete every `batch_id=N` partition with N ≤ `uptoBatchId` — the
    * promotion epilogue shared by the three index-backed admissions
    * (promoted state has moved into a persisted table; the partitions
    * are committed history). Idempotent: re-running after a crash
    * deletes nothing or finishes the interrupted delete. */
  def dropUpto(spark: SparkSession, dir: String, uptoBatchId: Long): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(base))
      fs.listStatus(base)
        .filter { st =>
          val nm = st.getPath.getName
          nm.startsWith("batch_id=") &&
            nm.stripPrefix("batch_id=").toLong <= uptoBatchId
        }
        .foreach(st => fs.delete(st.getPath, true))
  }

  /** The state directory as a DataFrame (batch_id partition column
    * included), or None when no batch has landed yet. Callers apply
    * their own exclusion filter + projection/aggregation so the
    * missing-dir handling cannot drift between streams. */
  def readDir(spark: SparkSession, dir: String): Option[DataFrame] =
    try Some(spark.read.option("basePath", dir).parquet(dir))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Fold every state partition with batch_id ≤ `uptoBatchId` (plus
    * any existing base) into the single base partition
    * `batch_id=-1` — the lifecycle operation a
    * one-file-set-per-micro-batch state layout needs: after months of
    * batches the standing read is file-count-bound, not data-bound.
    *
    * Replay contract: a restarted stream replays only its LAST
    * uncommitted batch, so callers must pass
    * `uptoBatchId < the newest landed batch` — the newest partition
    * keeps its own batch_id and the replay exclusion filter keeps
    * working. Folded batches are by definition committed history; a
    * base partition is never excluded (BaseBatchId is below every
    * real id). Content-identical by construction: the fold is a
    * straight read of the victim partitions written to a sibling
    * staging dir, swapped in only after the write completes. */
  def compact(spark: SparkSession, dir: String, uptoBatchId: Long): Unit =
    readDir(spark, dir).foreach { df =>
      val dataCols = df.columns.filterNot(_ == "batch_id").map(col(_))
      val victims = df.filter(col("batch_id") <= uptoBatchId)
      val staging = new Path(dir + ".__compact")
      val base = new Path(dir)
      val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
      // no coalesce(1): the scan already bins the many small batch
      // files into ~maxPartitionBytes tasks, so the folded base comes
      // out at ≈ data-size/128MB files — right at any scale
      victims.select(dataCols: _*)
        .write.mode("overwrite").parquet(staging.toString)
      fs.listStatus(base)
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLong <= uptoBatchId
        }
        .foreach(st => fs.delete(st.getPath, true))
      fs.rename(staging, new Path(base, s"batch_id=$BaseBatchId"))
      ()
    }
}

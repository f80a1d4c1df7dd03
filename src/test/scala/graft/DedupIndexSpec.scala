package graft

import org.apache.spark.sql.functions._
import graft.ext.{DedupIndex, TextOps}
import graft.sources.Tables

/** The persisted bucketed LSH index vs dd17's in-query probe. */
class DedupIndexSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists) { loc.listFiles.foreach(_.delete()); loc.delete() }
  }

  test("persisted-index probe emits exactly dd17's pair set; index side stays shuffle-free") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    dropTable("dedup_idx_test")
    val d = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val isBatch = pmod(col("doc_id"), lit(5)) === 4
    val hist = d.filter(!isBatch)
    val batch = d.filter(isBatch)
    DedupIndex.build(hist, "dedup_idx_test")

    val got = DedupIndex.probe(spark, "dedup_idx_test", batch, hist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = TextOps.lshProbePairs(
        TextOps.wordShingleRows(hist, "doc_id", "text", 3),
        TextOps.wordShingleRows(batch, "doc_id", "text", 3),
        "doc_id", DedupIndex.Hashes, DedupIndex.RowsPerBand, 100, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty && got == want,
      s"index probe diverged: extra=${got -- want}, missing=${want -- got}")

    // the storage property itself: grouping the index by its bucket key
    // is shuffle-free (bucketBy(band, bucket) pre-partitioned the data)
    val agg = spark.table("dedup_idx_test").groupBy(col("band"), col("bucket")).count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed index still shuffles on its own key:\n$plan")
  }

  test("build + append equals a from-scratch build over the union") {
    dropTable("dedup_idx_inc")
    dropTable("dedup_idx_all")
    val d = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val isBatch = pmod(col("doc_id"), lit(5)) === 4
    val hist = d.filter(!isBatch)
    val (h1, h2) = (hist.filter(col("doc_id") % 2 === 0),
      hist.filter(col("doc_id") % 2 =!= 0))
    DedupIndex.build(h1, "dedup_idx_inc")
    DedupIndex.append(h2, "dedup_idx_inc")
    DedupIndex.build(hist, "dedup_idx_all")
    val batch = d.filter(isBatch)
    def pairs(t: String) = DedupIndex.probe(spark, t, batch, hist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs("dedup_idx_inc") == pairs("dedup_idx_all"))
  }
}
